"""Runs the vendored toRdf fixture corpus with isomorphic comparison
(the reference's oracle semantics: jest-rdf toBeRdfIsomorphic)."""

from __future__ import annotations

import pytest

from jsonld_streaming_parser_js_spark.functions.isomorphism import (
    isomorphic, parse_nquads)
from jsonld_streaming_parser_js_spark.functions.parser import (
    ParserOptions, jsonld_to_quads)

from tests.fixtures_tordf import FIXTURES


@pytest.mark.parametrize("name,options,doc,expected_nq",
                         FIXTURES, ids=[f[0] for f in FIXTURES])
def test_tordf_fixture(name, options, doc, expected_nq):
    opts = ParserOptions(**options)
    got = jsonld_to_quads(doc, opts)
    expected = parse_nquads(expected_nq)
    assert isomorphic(got, expected), (
        f"{name}:\n got      {sorted(got)}\n expected {sorted(expected)}")


def test_isomorphism_helper_sanity():
    a = [("_:x", "<p>", '"v"', ""), ("_:x", "<q>", "_:y", "")]
    b = [("_:n1", "<p>", '"v"', ""), ("_:n1", "<q>", "_:n2", "")]
    c = [("_:n1", "<p>", '"v"', ""), ("_:n2", "<q>", "_:n1", "")]
    assert isomorphic(a, b)
    assert not isomorphic(a, c)
    assert not isomorphic(a, a[:1])
