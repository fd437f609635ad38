"""Unit tests for the pure-Python JSON-LD kernel.

Fixture families mirror the reference's jest end-to-end suite
(/root/reference/test/JsonLdParser-test.ts — see FIXTURES.md section 3 for
the family -> reference-line mapping). Expected quads follow the W3C
JSON-LD 1.1 Transform-to-RDF output. No Spark needed here.
"""

from __future__ import annotations

import pytest

from jsonld_streaming_parser_js_spark.functions.parser import (
    ParserOptions,
    jsonld_to_quads,
)
from jsonld_streaming_parser_js_spark.functions import terms as T


def quads(doc, base=None, ctx_cache=None, rdf_direction=None):
    opts = ParserOptions(base_iri=base, ctx_cache=ctx_cache or {},
                         rdf_direction=rdf_direction)
    return set(jsonld_to_quads(doc, opts))


EX = "http://example.org/"


# --- single_triple family (ref test anchor :426) ---------------------------

def test_plain_literal():
    doc = {"@id": "http://ex.org/s", "http://ex.org/p": "abc"}
    assert quads(doc) == {("<http://ex.org/s>", "<http://ex.org/p>",
                           '"abc"', "")}


def test_typed_literal_via_value_object():
    doc = {"@id": "http://ex.org/s",
           "http://ex.org/p": {"@value": "2011-01-01",
                               "@type": "http://www.w3.org/2001/XMLSchema#date"}}
    assert quads(doc) == {
        ("<http://ex.org/s>", "<http://ex.org/p>",
         '"2011-01-01"^^<http://www.w3.org/2001/XMLSchema#date>', "")}


def test_language_literal():
    doc = {"@id": "http://ex.org/s",
           "http://ex.org/p": {"@value": "hallo", "@language": "DE"}}
    assert quads(doc) == {("<http://ex.org/s>", "<http://ex.org/p>",
                           '"hallo"@de', "")}


def test_relative_iri_against_base():
    doc = {"@id": "s", "http://ex.org/p": {"@id": "o"}}
    assert quads(doc, base="http://base.org/dir/doc") == {
        ("<http://base.org/dir/s>", "<http://ex.org/p>",
         "<http://base.org/dir/o>", "")}


def test_numbers_boolean_canonical_forms():
    doc = {"@id": "http://ex.org/s",
           "http://ex.org/int": 2,
           "http://ex.org/intfloat": 2.0,
           "http://ex.org/double": 2.5,
           "http://ex.org/big": 1e21,
           "http://ex.org/bool": True}
    got = quads(doc)
    assert ("<http://ex.org/s>", "<http://ex.org/int>",
            '"2"^^<http://www.w3.org/2001/XMLSchema#integer>', "") in got
    assert ("<http://ex.org/s>", "<http://ex.org/intfloat>",
            '"2"^^<http://www.w3.org/2001/XMLSchema#integer>', "") in got
    assert ("<http://ex.org/s>", "<http://ex.org/double>",
            '"2.5E0"^^<http://www.w3.org/2001/XMLSchema#double>', "") in got
    assert ("<http://ex.org/s>", "<http://ex.org/big>",
            '"1.0E21"^^<http://www.w3.org/2001/XMLSchema#double>', "") in got
    assert ("<http://ex.org/s>", "<http://ex.org/bool>",
            '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>', "") in got


def test_double_typed_integer_value():
    doc = {"@id": "http://ex.org/s",
           "http://ex.org/p": {
               "@value": 11,
               "@type": "http://www.w3.org/2001/XMLSchema#double"}}
    assert quads(doc) == {
        ("<http://ex.org/s>", "<http://ex.org/p>",
         '"1.1E1"^^<http://www.w3.org/2001/XMLSchema#double>', "")}


# --- free_floating family (ref :1863) ---------------------------------------

def test_free_floating_values_dropped():
    assert quads("just a string") == set()
    assert quads({"@value": "v", "@language": "en"}) == set()
    assert quads([{"@value": 5}]) == set()
    assert quads({"@id": "http://ex.org/s"}) == set()
    assert quads({"@list": [{"@id": "http://ex.org/a"}]}) == set()


def test_bnode_subject():
    doc = {"http://ex.org/p": "v"}
    got = quads(doc)
    assert len(got) == 1
    (s, p, o, g), = got
    assert s.startswith("_:") and o == '"v"' and g == ""


# --- contexts family (ref :4375-4956) ----------------------------------------

def test_context_term_and_vocab():
    doc = {"@context": {"name": "http://schema.org/name",
                        "@vocab": "http://vocab.org/"},
           "@id": "http://ex.org/s", "name": "Alice", "other": 1}
    got = quads(doc)
    assert ("<http://ex.org/s>", "<http://schema.org/name>", '"Alice"',
            "") in got
    assert ("<http://ex.org/s>", "<http://vocab.org/other>",
            '"1"^^<http://www.w3.org/2001/XMLSchema#integer>', "") in got


def test_context_prefix_expansion():
    doc = {"@context": {"ex": "http://ex.org/"},
           "@id": "ex:s", "ex:p": {"@id": "ex:o"}}
    assert quads(doc) == {("<http://ex.org/s>", "<http://ex.org/p>",
                           "<http://ex.org/o>", "")}


def test_context_type_coercion():
    doc = {"@context": {"p": {"@id": "http://ex.org/p", "@type": "@id"},
                        "q": {"@id": "http://ex.org/q",
                              "@type": "http://ex.org/dt"}},
           "@id": "http://ex.org/s", "p": "http://ex.org/o", "q": "val"}
    got = quads(doc)
    assert ("<http://ex.org/s>", "<http://ex.org/p>", "<http://ex.org/o>",
            "") in got
    assert ("<http://ex.org/s>", "<http://ex.org/q>",
            '"val"^^<http://ex.org/dt>', "") in got


def test_context_default_language_and_term_language():
    doc = {"@context": {"@language": "en",
                        "nolang": {"@id": "http://ex.org/n",
                                   "@language": None}},
           "@id": "http://ex.org/s",
           "http://ex.org/p": "hello", "nolang": "plain"}
    got = quads(doc)
    assert ("<http://ex.org/s>", "<http://ex.org/p>", '"hello"@en', "") in got
    assert ("<http://ex.org/s>", "<http://ex.org/n>", '"plain"', "") in got


def test_inner_context_overrides():
    doc = {"@context": {"p": "http://a.org/p"},
           "@id": "http://ex.org/s",
           "p": {"@context": {"p": "http://b.org/p"},
                 "@id": "http://ex.org/o", "p": "v"}}
    got = quads(doc)
    assert ("<http://ex.org/s>", "<http://a.org/p>", "<http://ex.org/o>",
            "") in got
    assert ("<http://ex.org/o>", "<http://b.org/p>", '"v"', "") in got


def test_remote_context_via_cache():
    cache = {"http://remote.org/ctx": {
        "@context": {"name": "http://schema.org/name"}}}
    doc = {"@context": "http://remote.org/ctx",
           "@id": "http://ex.org/s", "name": "Bob"}
    assert quads(doc, ctx_cache=cache) == {
        ("<http://ex.org/s>", "<http://schema.org/name>", '"Bob"', "")}


def test_base_in_context():
    doc = {"@context": {"@base": "http://base.org/"},
           "@id": "s", "http://ex.org/p": "v"}
    assert quads(doc) == {("<http://base.org/s>", "<http://ex.org/p>",
                           '"v"', "")}


# --- types family (ref :6023-6356) -------------------------------------------

def test_type_single_and_array():
    doc = {"@id": "http://ex.org/s",
           "@type": ["http://ex.org/T1", "http://ex.org/T2"]}
    rdf_type = "<" + T.RDF_TYPE + ">"
    assert quads(doc) == {
        ("<http://ex.org/s>", rdf_type, "<http://ex.org/T1>", ""),
        ("<http://ex.org/s>", rdf_type, "<http://ex.org/T2>", "")}


def test_type_keyword_alias():
    doc = {"@context": {"type": "@type"},
           "@id": "http://ex.org/s", "type": "http://ex.org/T"}
    assert quads(doc) == {("<http://ex.org/s>", "<" + T.RDF_TYPE + ">",
                           "<http://ex.org/T>", "")}


def test_type_vocab_expansion():
    doc = {"@context": {"@vocab": "http://voc.org/"},
           "@id": "http://ex.org/s", "@type": "Thing"}
    assert quads(doc) == {("<http://ex.org/s>", "<" + T.RDF_TYPE + ">",
                           "<http://voc.org/Thing>", "")}


# --- arrays_sets family (ref :1818, :11002) ----------------------------------

def test_array_values_and_set():
    doc = {"@id": "http://ex.org/s",
           "http://ex.org/p": ["a", {"@set": ["b", "c"]}]}
    assert quads(doc) == {
        ("<http://ex.org/s>", "<http://ex.org/p>", '"a"', ""),
        ("<http://ex.org/s>", "<http://ex.org/p>", '"b"', ""),
        ("<http://ex.org/s>", "<http://ex.org/p>", '"c"', "")}


# --- lists family (ref :2268-3271) -------------------------------------------

def _first(term):
    return ("<" + T.RDF_FIRST + ">")


def test_list_chain():
    doc = {"@id": "http://ex.org/s",
           "http://ex.org/p": {"@list": ["a", "b"]}}
    got = quads(doc)
    firsts = {q for q in got if q[1] == "<" + T.RDF_FIRST + ">"}
    rests = {q for q in got if q[1] == "<" + T.RDF_REST + ">"}
    assert len(firsts) == 2 and len(rests) == 2
    assert {q[2] for q in firsts} == {'"a"', '"b"'}
    assert "<" + T.RDF_NIL + ">" in {q[2] for q in rests}
    # head attached to subject
    heads = {q for q in got if q[0] == "<http://ex.org/s>"}
    assert len(heads) == 1 and heads.pop()[2].startswith("_:")


def test_empty_list_is_nil():
    doc = {"@id": "http://ex.org/s", "http://ex.org/p": {"@list": []}}
    assert quads(doc) == {("<http://ex.org/s>", "<http://ex.org/p>",
                           "<" + T.RDF_NIL + ">", "")}


def test_context_container_list():
    doc = {"@context": {"p": {"@id": "http://ex.org/p",
                              "@container": "@list"}},
           "@id": "http://ex.org/s", "p": ["x"]}
    got = quads(doc)
    assert len(got) == 3  # first, rest->nil, s->head
    assert ("<" + T.RDF_NIL + ">") in {q[2] for q in got}


def test_nested_list():
    doc = {"@id": "http://ex.org/s",
           "http://ex.org/p": {"@list": [{"@list": ["x"]}]}}
    got = quads(doc)
    # inner chain (2) + outer chain (2) + attachment (1)
    assert len(got) == 5


# --- graphs family (ref :3490-4374) -------------------------------------------

def test_named_graph():
    doc = {"@id": "http://ex.org/g",
           "@graph": {"@id": "http://ex.org/s", "http://ex.org/p": "v"}}
    assert quads(doc) == {("<http://ex.org/s>", "<http://ex.org/p>", '"v"',
                           "<http://ex.org/g>")}


def test_top_level_graph_keyword_default_graph():
    doc = {"@graph": [{"@id": "http://ex.org/s", "http://ex.org/p": "v"}]}
    assert quads(doc) == {("<http://ex.org/s>", "<http://ex.org/p>", '"v"',
                           "")}


def test_unnamed_graph_gets_bnode():
    doc = {"http://ex.org/meta": "m",
           "@graph": {"@id": "http://ex.org/s", "http://ex.org/p": "v"}}
    got = quads(doc)
    graph_quads = {q for q in got if q[3] != ""}
    assert len(graph_quads) == 1
    assert graph_quads.pop()[3].startswith("_:")


# --- reverse family (ref :1396-1765) ------------------------------------------

def test_reverse_keyword():
    doc = {"@id": "http://ex.org/o",
           "@reverse": {"http://ex.org/p": {"@id": "http://ex.org/s"}}}
    assert quads(doc) == {("<http://ex.org/s>", "<http://ex.org/p>",
                           "<http://ex.org/o>", "")}


def test_reverse_term_definition():
    doc = {"@context": {"children": {"@reverse": "http://ex.org/parent"}},
           "@id": "http://ex.org/dad",
           "children": [{"@id": "http://ex.org/kid"}]}
    assert quads(doc) == {("<http://ex.org/kid>", "<http://ex.org/parent>",
                           "<http://ex.org/dad>", "")}


def test_reverse_literal_value_invalid():
    from jsonld_streaming_parser_js_spark.functions.context import JsonLdError
    doc = {"@id": "http://ex.org/o",
           "@reverse": {"http://ex.org/p": "literal"}}
    with pytest.raises(JsonLdError):
        quads(doc)


# --- json_literal family (ref :6739) ------------------------------------------

def test_json_literal_canonicalized():
    doc = {"@context": {"p": {"@id": "http://ex.org/p", "@type": "@json"}},
           "@id": "http://ex.org/s",
           "p": {"b": 2, "a": [True, 1.5, None]}}
    assert quads(doc) == {
        ("<http://ex.org/s>", "<http://ex.org/p>",
         '"{\\"a\\":[true,1.5,null],\\"b\\":2}"^^<' + T.RDF_JSON + ">", "")}


# --- containers family (ref :6898-9414) ----------------------------------------

def test_language_container():
    doc = {"@context": {"label": {"@id": "http://ex.org/label",
                                  "@container": "@language"}},
           "@id": "http://ex.org/s",
           "label": {"en": "hi", "de": ["hallo"]}}
    assert quads(doc) == {
        ("<http://ex.org/s>", "<http://ex.org/label>", '"hi"@en', ""),
        ("<http://ex.org/s>", "<http://ex.org/label>", '"hallo"@de', "")}


def test_index_container_transparent():
    doc = {"@context": {"p": {"@id": "http://ex.org/p",
                              "@container": "@index"}},
           "@id": "http://ex.org/s",
           "p": {"i1": "a", "i2": "b"}}
    assert quads(doc) == {
        ("<http://ex.org/s>", "<http://ex.org/p>", '"a"', ""),
        ("<http://ex.org/s>", "<http://ex.org/p>", '"b"', "")}


def test_property_based_index_container():
    doc = {"@context": {"@base": "http://ex.org/",
                        "p": {"@id": "http://ex.org/p",
                              "@container": "@index",
                              "@index": "http://ex.org/prop"}},
           "@id": "http://ex.org/s",
           "p": {"idx1": {"@id": "v1"}}}
    got = quads(doc)
    assert ("<http://ex.org/s>", "<http://ex.org/p>", "<http://ex.org/v1>",
            "") in got
    assert ("<http://ex.org/v1>", "<http://ex.org/prop>", '"idx1"',
            "") in got


def test_id_container():
    doc = {"@context": {"@base": "http://ex.org/",
                        "p": {"@id": "http://ex.org/p",
                              "@container": "@id"}},
           "@id": "http://ex.org/s",
           "p": {"o1": {"http://ex.org/q": "v"}}}
    got = quads(doc)
    assert ("<http://ex.org/s>", "<http://ex.org/p>", "<http://ex.org/o1>",
            "") in got
    assert ("<http://ex.org/o1>", "<http://ex.org/q>", '"v"', "") in got


def test_type_container():
    doc = {"@context": {"@vocab": "http://voc.org/",
                        "p": {"@id": "http://ex.org/p",
                              "@container": "@type"}},
           "@id": "http://ex.org/s",
           "p": {"T": {"@id": "http://ex.org/o"}}}
    got = quads(doc)
    assert ("<http://ex.org/s>", "<http://ex.org/p>", "<http://ex.org/o>",
            "") in got
    assert ("<http://ex.org/o>", "<" + T.RDF_TYPE + ">",
            "<http://voc.org/T>", "") in got


def test_graph_container():
    doc = {"@context": {"p": {"@id": "http://ex.org/p",
                              "@container": "@graph"}},
           "@id": "http://ex.org/s",
           "p": {"http://ex.org/q": "v"}}
    got = quads(doc)
    # s -> fresh graph bnode; inner triple inside that named graph
    link = [q for q in got if q[0] == "<http://ex.org/s>"]
    inner = [q for q in got if q[1] == "<http://ex.org/q>"]
    assert len(link) == 1 and len(inner) == 1
    assert link[0][2] == inner[0][3]  # graph name == linked node
    assert inner[0][3].startswith("_:")


# --- nest_included family (ref :9415+) -----------------------------------------

def test_nest():
    doc = {"@context": {"meta": "@nest", "p": "http://ex.org/p"},
           "@id": "http://ex.org/s",
           "meta": {"p": "v"}}
    assert quads(doc) == {("<http://ex.org/s>", "<http://ex.org/p>", '"v"',
                           "")}


def test_included():
    doc = {"@id": "http://ex.org/s", "http://ex.org/p": "v",
           "@included": [{"@id": "http://ex.org/s2",
                          "http://ex.org/p2": "v2"}]}
    assert quads(doc) == {
        ("<http://ex.org/s>", "<http://ex.org/p>", '"v"', ""),
        ("<http://ex.org/s2>", "<http://ex.org/p2>", '"v2"', "")}


# --- scoped family (ref :9787-11001) --------------------------------------------

def test_property_scoped_context():
    doc = {"@context": {"p": {"@id": "http://ex.org/p",
                              "@context": {"q": "http://scoped.org/q"}}},
           "@id": "http://ex.org/s",
           "p": {"@id": "http://ex.org/o", "q": "v"}}
    got = quads(doc)
    assert ("<http://ex.org/o>", "<http://scoped.org/q>", '"v"', "") in got


def test_type_scoped_context():
    doc = {"@context": {"T": {"@id": "http://ex.org/T",
                              "@context": {"q": "http://typescoped.org/q"}}},
           "@id": "http://ex.org/s", "@type": "T", "q": "v"}
    got = quads(doc)
    assert ("<http://ex.org/s>", "<http://typescoped.org/q>", '"v"',
            "") in got
    assert ("<http://ex.org/s>", "<" + T.RDF_TYPE + ">", "<http://ex.org/T>",
            "") in got


def test_type_scoped_context_does_not_propagate():
    doc = {"@context": {
               "q": "http://outer.org/q",
               "T": {"@id": "http://ex.org/T",
                     "@context": {"q": "http://typescoped.org/q"}}},
           "@id": "http://ex.org/s", "@type": "T",
           "q": {"@id": "http://ex.org/o", "q": "v"}}
    got = quads(doc)
    # outer q under the type-scoped context
    assert ("<http://ex.org/s>", "<http://typescoped.org/q>",
            "<http://ex.org/o>", "") in got
    # nested node reverts to outer context (no propagation)
    assert ("<http://ex.org/o>", "<http://outer.org/q>", '"v"', "") in got


def test_protected_term_redefinition_fails():
    from jsonld_streaming_parser_js_spark.functions.context import JsonLdError
    doc = {"@context": [{"@protected": True, "p": "http://a.org/p"},
                        {"p": "http://b.org/p"}],
           "@id": "http://ex.org/s", "p": "v"}
    with pytest.raises(JsonLdError):
        quads(doc)


# --- direction family (ref :763-931, :2018) --------------------------------------

def test_direction_base_mode():
    doc = {"@context": {"@language": "en", "@direction": "rtl"},
           "@id": "http://ex.org/s", "http://ex.org/p": "v"}
    assert quads(doc, rdf_direction="base") == {
        ("<http://ex.org/s>", "<http://ex.org/p>", '"v"@en--rtl', "")}


def test_direction_i18n_datatype():
    doc = {"@context": {"@language": "en", "@direction": "rtl"},
           "@id": "http://ex.org/s", "http://ex.org/p": "v"}
    assert quads(doc, rdf_direction="i18n-datatype") == {
        ("<http://ex.org/s>", "<http://ex.org/p>",
         '"v"^^<https://www.w3.org/ns/i18n#en_rtl>', "")}


def test_direction_compound_literal():
    doc = {"@context": {"@language": "en", "@direction": "rtl"},
           "@id": "http://ex.org/s", "http://ex.org/p": "v"}
    got = quads(doc, rdf_direction="compound-literal")
    assert len(got) == 4
    preds = {q[1] for q in got}
    assert "<" + T.RDF_VALUE + ">" in preds
    assert "<" + T.RDF_LANGUAGE + ">" in preds
    assert "<" + T.RDF_DIRECTION + ">" in preds


def test_direction_disabled_drops_direction():
    doc = {"@context": {"@language": "en", "@direction": "rtl"},
           "@id": "http://ex.org/s", "http://ex.org/p": "v"}
    assert quads(doc, rdf_direction=None) == {
        ("<http://ex.org/s>", "<http://ex.org/p>", '"v"@en', "")}


# --- rdfstar family (ref :11038-12072) ---------------------------------------------

def test_rdfstar_embedded_subject():
    doc = {"@id": {"@id": "http://ex.org/s", "http://ex.org/p": "o"},
           "http://ex.org/certainty": 0.8}
    got = quads(doc)
    assert got == {
        ('<< <http://ex.org/s> <http://ex.org/p> "o" >>',
         "<http://ex.org/certainty>",
         '"8.0E-1"^^<http://www.w3.org/2001/XMLSchema#double>', "")}


def test_rdfstar_annotation():
    doc = {"@id": "http://ex.org/s",
           "http://ex.org/p": {"@id": "http://ex.org/o",
                               "@annotation": {"http://ex.org/certainty": 1}}}
    got = quads(doc)
    assert ("<http://ex.org/s>", "<http://ex.org/p>", "<http://ex.org/o>",
            "") in got
    assert ('<< <http://ex.org/s> <http://ex.org/p> <http://ex.org/o> >>',
            "<http://ex.org/certainty>",
            '"1"^^<http://www.w3.org/2001/XMLSchema#integer>', "") in got


# --- errors family (ref :12073-12440) ----------------------------------------------

def test_invalid_version():
    from jsonld_streaming_parser_js_spark.functions.context import JsonLdError
    with pytest.raises(JsonLdError):
        quads({"@context": {"@version": 1.0}, "http://ex.org/p": "v"})


def test_keyword_in_reverse_invalid():
    from jsonld_streaming_parser_js_spark.functions.context import JsonLdError
    with pytest.raises(JsonLdError):
        quads({"@id": "http://ex.org/s",
               "@reverse": {"@type": "http://ex.org/T"}})


# --- determinism ---------------------------------------------------------------

def test_deterministic_bnode_labels():
    doc = {"http://ex.org/p": [{"http://ex.org/q": "a"},
                               {"http://ex.org/q": "b"}],
           "http://ex.org/list": {"@list": ["x", "y"]}}
    a = jsonld_to_quads(doc)
    b = jsonld_to_quads(doc)
    assert a == b


def test_skolemization_deterministic_and_distinct():
    from jsonld_streaming_parser_js_spark.functions.parser import parse_block
    import json as _json
    block = _json.dumps({"http://ex.org/p": "v"})
    q1, e1 = parse_block(block, "http://site.org/page/1", 0)
    q2, _ = parse_block(block, "http://site.org/page/1", 0)
    q3, _ = parse_block(block, "http://site.org/page/2", 0)
    assert e1 is None and q1 == q2
    assert q1[0][0] != q3[0][0]
    assert q1[0][0].startswith("_:s")


def test_scheme_relative_base_keeps_document_scheme():
    # ADVICE r2: the inline-context memo's probe base must not leak its
    # scheme into a scheme-relative @base resolution (https doc -> https)
    import json as _json
    from jsonld_streaming_parser_js_spark.functions.parser import parse_block
    doc = _json.dumps({"@context": {"@base": "//other.example/d/"},
                       "@id": "x", "http://p/": "v"})
    for _ in range(2):  # second call exercises the memoized path
        quads, err = parse_block(doc, "https://site.example/page", 0)
        assert err is None
        assert quads[0][0] == "<https://other.example/d/x>"


def test_scheme_relative_vocab_keeps_document_scheme():
    import json as _json
    from jsonld_streaming_parser_js_spark.functions.parser import parse_block
    doc = _json.dumps({"@context": {"@vocab": "//v.example/ns#"},
                       "@id": "http://e/x", "name": "v"})
    for _ in range(2):
        quads, err = parse_block(doc, "https://site.example/page", 0)
        assert err is None
        assert quads[0][1] == "<https://v.example/ns#name>"


def test_default_graph_bnode_shared_across_documents():
    # ADVICE r2: a blank-node defaultGraph term is ONE graph for the whole
    # corpus (reference lib/JsonLdParser.ts:686-688), not per-document
    import json as _json
    from jsonld_streaming_parser_js_spark.functions.parser import parse_block
    doc = _json.dumps({"@id": "http://e/x", "http://p/": "v"})
    q1, _ = parse_block(doc, "http://a/", 0, default_graph="_:dg")
    q2, _ = parse_block(doc, "http://b/", 3, default_graph="_:dg")
    assert q1[0][3] == q2[0][3] == "_:dg"
    # document-local bnodes still skolemize per (url, blk)
    doc2 = _json.dumps({"http://p/": "v"})
    s1, _ = parse_block(doc2, "http://a/", 0, default_graph="_:dg")
    s2, _ = parse_block(doc2, "http://b/", 0, default_graph="_:dg")
    assert s1[0][0] != s2[0][0]


def test_invalid_node_ids_drop_not_crash():
    """Review regression guard: node ids '', '_', '_x' (invalid relative
    IRIs, not bnodes) must DROP leniently / error in strict mode — never
    IndexError out of the error channel."""
    from jsonld_streaming_parser_js_spark.functions.context import (
        JsonLdError)
    from jsonld_streaming_parser_js_spark.functions.parser import (
        ParserOptions, jsonld_to_quads)

    for bad in ("", "_", "_x"):
        assert jsonld_to_quads(
            {"@id": bad, "http://e/p": {"@id": "http://e/o"}},
            ParserOptions()) == []
        assert jsonld_to_quads(
            {"@id": "http://e/s", "@type": bad}, ParserOptions()) == []
        with pytest.raises(JsonLdError):
            jsonld_to_quads({"@id": bad, "http://e/p": "v"},
                            ParserOptions(strict_values=True))


def test_inline_ctx_memo_deep_and_key_soundness():
    """Review-2 regression guards for the inline-context memo key:
    (a) a deep inline scoped-context chain must still parse (serialization
    RecursionError falls back to no-memo, not a hard error); (b) an
    int-keyed context dict must behave identically cold and after the
    colliding string-key form warmed the memo (json.dumps coerces
    {1: x} and {"1": x} to the same text; the composite repr+dumps key
    keeps them distinct)."""
    from jsonld_streaming_parser_js_spark.functions.parser import (
        ParserOptions, jsonld_to_quads)

    deep_ctx = {"p": "http://e/p"}
    for _ in range(1200):
        # nest the CONTEXT itself so json.dumps in the memo-key path
        # genuinely raises RecursionError and the no-memo fallback fires
        deep_ctx = {"p": {"@id": "http://e/p", "@context": deep_ctx}}
    quads = jsonld_to_quads({"@context": deep_ctx,
                             "@id": "http://e/s", "p": "v"},
                            ParserOptions())
    assert quads == [("<http://e/s>", "<http://e/p>", '"v"', "")]

    # warm the memo with the string-key form...
    ok = jsonld_to_quads({"@context": {"1": "http://e/one"},
                          "@id": "http://e/s", "1": "x"}, ParserOptions())
    assert ok == [("<http://e/s>", "<http://e/one>", '"x"', "")]
    # ...then the int-key form must NOT silently reuse its result
    import pytest as _pytest
    with _pytest.raises(Exception):
        jsonld_to_quads({"@context": {1: "http://e/one"},
                         "@id": "http://e/s", "1": "x"}, ParserOptions())
