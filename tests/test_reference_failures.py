"""The 11 W3C toRdf cases the REFERENCE does not pass (r7 verdict ask #4).

`/root/reference/spec/earl-tordf.ttl` marks exactly 11 assertions
`earl:inapplicable` (the BASELINE.md row "442 passed / 11 failed"):
t0118, te014, te026, te038, te071, te115, te116, ter02, ter03, ter24,
ter32. This module vendors one fixture per case — reconstructed from the
manifest title/description plus the W3C JSON-LD 1.1 API algorithms (the
W3C test files themselves are not vendored in the reference repo) — and
asserts THIS engine's behavior against the spec-mandated outcome. The
per-case pass/fail ledger lives in PARITY.md ("Reference-failure
conformance" table); every case passing here is conformance the port has
BEYOND the reference, not just parity with it.
"""

from __future__ import annotations

import pytest

from jsonld_streaming_parser_js_spark.functions.parser import (
    ParserOptions,
    jsonld_to_quads,
    parse_block,
)

S = "http://ex.org/s"


def quads(doc, **opt_kwargs):
    opts = ParserOptions(**opt_kwargs)
    return set(jsonld_to_quads(doc, opts))


def block_err(doc, **opt_kwargs):
    import json
    _, err = parse_block(json.dumps(doc), "https://f.example.org/page", 0,
                         parser_options=ParserOptions(**opt_kwargs))
    return err


# --- t0118 / te038: blank-node predicates vs produceGeneralizedRdf --------

_BNODE_PRED_DOC = {"@context": {"term": "_:pterm"},
                   "@id": S, "term": "termed",
                   "http://ex.org/keep": "kept"}


def test_t0118_generalized_rdf_flag_keeps_bnode_predicates():
    """toRdf-manifest#t0118: 'Triples with blank node predicates are not
    dropped if the produce generalized RDF flag is true.'"""
    got = quads(_BNODE_PRED_DOC, produce_generalized_rdf=True)
    bnode_pred = {q for q in got if q[1].startswith("_:")}
    assert len(bnode_pred) == 1
    (q,) = bnode_pred
    assert q[0] == f"<{S}>" and q[2] == '"termed"'
    assert (f"<{S}>", "<http://ex.org/keep>", '"kept"', "") in got


def test_te038_bnode_predicates_dropped_by_default():
    """toRdf-manifest#te038: 'Triples with blank node predicates are
    dropped by default.'"""
    got = quads(_BNODE_PRED_DOC)
    assert not any(q[1].startswith("_:") for q in got)
    assert (f"<{S}>", "<http://ex.org/keep>", '"kept"', "") in got


# --- te014: @set of @value objects with keyword aliases --------------------

def test_te014_set_of_value_objects_with_keyword_aliases():
    """toRdf-manifest#te014: '@set of @value objects with keyword
    aliases' — aliased @set unwraps; aliased @value/@language build the
    literals exactly as the unaliased keywords would."""
    doc = {"@context": {"myset": "@set", "myvalue": "@value",
                        "mylang": "@language"},
           "@id": S,
           "http://ex.org/p": {"myset": [
               {"myvalue": "v1", "mylang": "en"},
               {"myvalue": True}]}}
    assert quads(doc) == {
        (f"<{S}>", "<http://ex.org/p>", '"v1"@en', ""),
        (f"<{S}>", "<http://ex.org/p>",
         '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>', ""),
    }


# --- te026: term mapping to @type uses @type syntax ------------------------

def test_te026_term_mapped_to_type_uses_type_syntax():
    """toRdf-manifest#te026: a term whose IRI mapping is '@type' behaves
    exactly like @type — values are vocab-expanded IRIs, emitted as
    rdf:type triples (not string literals under a 'type' property)."""
    doc = {"@context": {"type": "@type",
                        "Foo": "http://example.org/Foo"},
           "@id": S, "type": ["Foo", "http://example.org/Bar"]}
    rdf_type = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
    assert quads(doc) == {
        (f"<{S}>", rdf_type, "<http://example.org/Foo>", ""),
        (f"<{S}>", rdf_type, "<http://example.org/Bar>", ""),
    }


# --- te071: redefine terms looking like compact IRIs ------------------------

def test_te071_redefine_terms_looking_like_compact_iris():
    """toRdf-manifest#te071: a term of the FORM prefix:suffix may be
    redefined to ADD behavior (here @type coercion) while keeping the
    compact-IRI expansion as its IRI mapping; undefined compact IRIs
    still expand through the prefix. (Changing the IRI itself is the
    'invalid IRI mapping' error per 1.1 create-term-definition 13.4.2 —
    separately asserted below.)"""
    doc = {"@context": {"ex": "http://example.org/vocab#",
                        "ex:contains": {"@type": "@id"}},
           "@id": S, "ex:contains": "http://example.org/item",
           "ex:other": "w"}
    assert quads(doc) == {
        (f"<{S}>", "<http://example.org/vocab#contains>",
         "<http://example.org/item>", ""),
        (f"<{S}>", "<http://example.org/vocab#other>", '"w"', ""),
    }
    # the forbidden variant: explicit @id that CONTRADICTS the compact
    # expansion must error (spec 13.4.2)
    bad = {"@context": {"ex": "http://example.org/",
                        "ex:foo": {"@id": "http://example.org/redef"}},
           "@id": S, "ex:foo": "v"}
    assert block_err(bad) == "invalid IRI mapping"


# --- te115 / te116: pathological @vocab in 1.0 mode -------------------------

def test_te115_empty_vocab_in_1_0_errors():
    """toRdf-manifest#te115: '@vocab: \"\" in 1.0' — the empty string is
    a 1.1-only vocab mapping (resolve-against-base); 1.0 requires an
    absolute IRI, so context processing must raise."""
    doc = {"@context": {"@vocab": ""},
           "@id": S, "rel": "v"}
    assert block_err(doc, processing_mode="json-ld-1.0",
                     base_iri="http://base.example.org/doc") \
        == "invalid vocab mapping"
    # the SAME document is valid 1.1: @vocab '' resolves document-
    # relative to the base itself, and terms CONCATENATE onto it
    got = quads(doc, processing_mode="json-ld-1.1",
                base_iri="http://base.example.org/doc")
    assert (f"<{S}>", "<http://base.example.org/docrel>", '"v"', "") in got


def test_te116_relative_vocab_in_1_0_errors():
    """toRdf-manifest#te116: relative @vocab in 1.0 mode errors (1.1
    resolves it against the base / existing vocab)."""
    doc = {"@context": {"@vocab": "rel/"},
           "@id": S, "p": "v"}
    assert block_err(doc, processing_mode="json-ld-1.0",
                     base_iri="http://base.example.org/dir/doc") \
        == "invalid vocab mapping"
    got = quads(doc, processing_mode="json-ld-1.1",
                base_iri="http://base.example.org/dir/doc")
    assert (f"<{S}>", "<http://base.example.org/dir/rel/p>", '"v"', "") \
        in got


# --- ter02 / ter03: recursive remote-context inclusion ----------------------

def test_ter02_direct_recursive_context_errors():
    """toRdf-manifest#ter02: a remote context referencing itself
    (directly) raises 'recursive context inclusion'."""
    cache = {"http://ctx.example.org/a":
             {"@context": "http://ctx.example.org/a"}}
    doc = {"@context": "http://ctx.example.org/a",
           "@id": S, "http://ex.org/p": "v"}
    assert block_err(doc, ctx_cache=cache) == "recursive context inclusion"


def test_ter03_indirect_recursive_context_errors():
    """toRdf-manifest#ter03: indirect recursion (A imports B imports A)
    raises the same coded error."""
    cache = {"http://ctx.example.org/a":
             {"@context": "http://ctx.example.org/b"},
             "http://ctx.example.org/b":
             {"@context": "http://ctx.example.org/a"}}
    doc = {"@context": "http://ctx.example.org/a",
           "@id": S, "http://ex.org/p": "v"}
    assert block_err(doc, ctx_cache=cache) == "recursive context inclusion"


# --- ter24 / ter32: list of lists in 1.0 mode -------------------------------

def test_ter24_list_of_lists_in_list_object_errors_in_1_0():
    """toRdf-manifest#ter24: a nested array inside an explicit @list is a
    'list of lists' error in 1.0 (legal nested lists in 1.1)."""
    doc = {"@id": S,
           "http://ex.org/p": {"@list": [["a", "b"]]}}
    assert block_err(doc, processing_mode="json-ld-1.0") == "list of lists"
    # 1.1 accepts it (nested rdf:List structure)
    got = quads(doc, processing_mode="json-ld-1.1")
    assert any("rdf-syntax-ns#first" in q[1] for q in got)


def test_ter32_list_of_lists_via_list_container_errors_in_1_0():
    """toRdf-manifest#ter32: the same error through an @container:@list
    term whose value is a nested array."""
    doc = {"@context": {"p": {"@id": "http://ex.org/p",
                              "@container": "@list"}},
           "@id": S, "p": [["x"]]}
    assert block_err(doc, processing_mode="json-ld-1.0") == "list of lists"
    got = quads(doc, processing_mode="json-ld-1.1")
    assert any("rdf-syntax-ns#first" in q[1] for q in got)


REFERENCE_FAILURE_CASES = [
    "t0118", "te014", "te026", "te038", "te071", "te115", "te116",
    "ter02", "ter03", "ter24", "ter32",
]


def test_all_eleven_reference_failures_are_covered():
    """Totality guard: one test per `earl:inapplicable` assertion in the
    reference's EARL report; if the list above drifts from the module's
    test functions, this fails."""
    import sys
    mod = sys.modules[__name__]
    for case in REFERENCE_FAILURE_CASES:
        assert any(name.startswith(f"test_{case}_")
                   for name in dir(mod)), f"no fixture for {case}"
