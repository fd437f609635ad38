"""Second kernel battery: trickier JSON-LD 1.1 toRdf semantics, mirroring
the harder reference test families (/root/reference/test/JsonLdParser-test.ts
and the W3C toRdf manifest behaviors the EARL reports cover)."""

from __future__ import annotations

import pytest

from jsonld_streaming_parser_js_spark.functions.context import JsonLdError
from jsonld_streaming_parser_js_spark.functions.parser import (
    ParserOptions, jsonld_to_quads)
from jsonld_streaming_parser_js_spark.functions import terms as T

RDF_TYPE = "<" + T.RDF_TYPE + ">"


def quads(doc, base=None, ctx_cache=None, rdf_direction=None,
          generalized=False, default_graph=None):
    opts = ParserOptions(base_iri=base, ctx_cache=ctx_cache or {},
                         rdf_direction=rdf_direction,
                         produce_generalized_rdf=generalized,
                         default_graph=default_graph)
    return set(jsonld_to_quads(doc, opts))


# --- context mechanics -------------------------------------------------------

def test_context_array_merge_and_null_reset():
    doc = {"@context": [{"a": "http://a.org/a"},
                        {"b": "http://b.org/b"}],
           "@id": "http://ex.org/s", "a": "1", "b": "2"}
    got = quads(doc)
    assert ("<http://ex.org/s>", "<http://a.org/a>", '"1"', "") in got
    assert ("<http://ex.org/s>", "<http://b.org/b>", '"2"', "") in got

    doc2 = {"@context": [{"a": "http://a.org/a"}, None],
            "@id": "http://ex.org/s", "a": "1"}
    assert quads(doc2) == set()  # context nullified -> 'a' not a property


def test_keyword_aliases():
    doc = {"@context": {"id": "@id", "graph": "@graph", "value": "@value",
                        "lang": "@language"},
           "id": "http://ex.org/g",
           "graph": {"id": "http://ex.org/s",
                     "http://ex.org/p": {"value": "v", "lang": "EN"}}}
    assert quads(doc) == {
        ("<http://ex.org/s>", "<http://ex.org/p>", '"v"@en',
         "<http://ex.org/g>")}


def test_vocab_empty_string_resolves_to_base():
    doc = {"@context": {"@vocab": ""},
           "@id": "http://base.org/doc", "term": "v"}
    assert quads(doc, base="http://base.org/doc") == {
        ("<http://base.org/doc>", "<http://base.org/docterm>", '"v"', "")}


def test_relative_vocab_concatenation():
    doc = {"@context": [{"@vocab": "http://voc.org/"},
                        {"@vocab": "sub/"}],
           "@id": "http://ex.org/s", "t": "v"}
    assert quads(doc) == {
        ("<http://ex.org/s>", "<http://voc.org/sub/t>", '"v"', "")}


def test_prefix_false_blocks_compact_iri():
    doc = {"@context": {"pfx": {"@id": "http://p.org/", "@prefix": False}},
           "@id": "http://ex.org/s", "pfx:x": "v"}
    # pfx may not be used as a prefix -> "pfx:x" stays as-is, which is
    # itself a valid absolute IRI with scheme "pfx" (jsonld.js behavior)
    assert quads(doc) == {("<http://ex.org/s>", "<pfx:x>", '"v"', "")}


def test_simple_term_not_ending_in_gen_delim_is_not_prefix():
    doc = {"@context": {"pfx": "http://p.org/path"},
           "@id": "http://ex.org/s", "pfx:x": "v"}
    # simple term not ending in a gen-delim is NOT a prefix (JSON-LD 1.1);
    # "pfx:x" is then kept verbatim as a scheme-ful IRI
    assert quads(doc) == {("<http://ex.org/s>", "<pfx:x>", '"v"', "")}


def test_term_choice_compact_iri_defined():
    doc = {"@context": {"ex": "http://ex.org/",
                        "ex:p": {"@type": "@id"}},
           "@id": "ex:s", "ex:p": "http://other.org/o"}
    assert quads(doc) == {("<http://ex.org/s>", "<http://ex.org/p>",
                           "<http://other.org/o>", "")}


def test_base_relative_chain():
    doc = {"@context": {"@base": "deep/"},
           "@id": "../x", "http://ex.org/p": "v"}
    got = quads(doc, base="http://b.org/a/b/doc")
    # base: http://b.org/a/b/deep/  ->  ../x = http://b.org/a/b/x
    assert got == {("<http://b.org/a/b/x>", "<http://ex.org/p>", '"v"', "")}


def test_scoped_context_with_propagate_true():
    doc = {"@context": {
               "T": {"@id": "http://ex.org/T",
                     "@context": {"@propagate": True,
                                  "q": "http://scoped.org/q"}}},
           "@id": "http://ex.org/s", "@type": "T",
           "q": {"@id": "http://ex.org/o", "q": "v"}}
    got = quads(doc)
    # with @propagate:true the type-scoped context survives into children
    assert ("<http://ex.org/o>", "<http://scoped.org/q>", '"v"', "") in got


def test_protected_term_overridable_by_property_scoped():
    doc = {"@context": {"@protected": True,
                        "p": {"@id": "http://a.org/p",
                              "@context": {"p": "http://b.org/p"}}},
           "@id": "http://ex.org/s",
           "p": {"@id": "http://ex.org/o", "p": "v"}}
    got = quads(doc)  # property-scoped overrides protected: allowed
    assert ("<http://ex.org/o>", "<http://b.org/p>", '"v"', "") in got


def test_import_context():
    cache = {"http://r.org/base": {"@context": {"a": "http://a.org/a"}}}
    doc = {"@context": {"@import": "http://r.org/base",
                        "b": "http://b.org/b"},
           "@id": "http://ex.org/s", "a": "1", "b": "2"}
    got = quads(doc, ctx_cache=cache)
    assert ("<http://ex.org/s>", "<http://a.org/a>", '"1"', "") in got
    assert ("<http://ex.org/s>", "<http://b.org/b>", '"2"', "") in got


# --- values / literals -------------------------------------------------------

def test_negative_zero_and_small_double():
    doc = {"@id": "http://ex.org/s",
           "http://ex.org/z": -0.0,
           "http://ex.org/small": 1e-7}
    got = quads(doc)
    assert ("<http://ex.org/s>", "<http://ex.org/z>",
            '"0"^^<' + T.XSD_INTEGER + ">", "") in got
    assert ("<http://ex.org/s>", "<http://ex.org/small>",
            '"1.0E-7"^^<' + T.XSD_DOUBLE + ">", "") in got


def test_null_value_dropped():
    doc = {"@id": "http://ex.org/s",
           "http://ex.org/p": None,
           "http://ex.org/q": {"@value": None},
           "http://ex.org/r": "keep"}
    assert quads(doc) == {
        ("<http://ex.org/s>", "<http://ex.org/r>", '"keep"', "")}


def test_json_literal_scalar_and_unicode_key_order():
    doc = {"@context": {"p": {"@id": "http://ex.org/p", "@type": "@json"}},
           "@id": "http://ex.org/s",
           "p": [True, {"é": 1, "e": 2}]}
    got = quads(doc)
    # the whole raw value (array included) is ONE rdf:JSON literal, with
    # JCS key order ("e" < "é" by code unit)
    assert got == {
        ("<http://ex.org/s>", "<http://ex.org/p>",
         '"[true,{\\"e\\":2,\\"é\\":1}]"^^<' + T.RDF_JSON + ">", "")}


def test_language_tag_lowercased():
    doc = {"@id": "http://ex.org/s",
           "http://ex.org/p": {"@value": "x", "@language": "en-US"}}
    assert quads(doc) == {("<http://ex.org/s>", "<http://ex.org/p>",
                           '"x"@en-us', "")}


def test_value_with_type_none_alias():
    doc = {"@context": {"none": "@none",
                        "p": {"@id": "http://ex.org/p",
                              "@container": "@language"}},
           "@id": "http://ex.org/s",
           "p": {"en": "hello", "none": "plain"}}
    got = quads(doc)
    assert ("<http://ex.org/s>", "<http://ex.org/p>", '"plain"', "") in got
    assert ("<http://ex.org/s>", "<http://ex.org/p>", '"hello"@en',
            "") in got


# --- nodes / graphs ----------------------------------------------------------

def test_blank_node_predicate_dropped_by_default():
    doc = {"@id": "http://ex.org/s", "_:p": "v",
           "http://ex.org/p": "keep"}
    assert quads(doc) == {
        ("<http://ex.org/s>", "<http://ex.org/p>", '"keep"', "")}


def test_blank_node_predicate_kept_generalized():
    doc = {"@id": "http://ex.org/s", "_:p": "v"}
    got = quads(doc, generalized=True)
    assert len(got) == 1 and next(iter(got))[1].startswith("_:")


def test_type_blank_node_object():
    doc = {"@id": "http://ex.org/s", "@type": "_:T"}
    got = quads(doc)
    (s, p, o, g), = got
    assert p == RDF_TYPE and o.startswith("_:")


def test_empty_named_graph():
    assert quads({"@id": "http://ex.org/g", "@graph": []}) == set()


def test_graph_nested_in_graph():
    doc = {"@id": "http://ex.org/g1",
           "@graph": {"@id": "http://ex.org/g2",
                      "@graph": {"@id": "http://ex.org/s",
                                 "http://ex.org/p": "v"},
                      "http://ex.org/q": "w"}}
    got = quads(doc)
    assert ("<http://ex.org/s>", "<http://ex.org/p>", '"v"',
            "<http://ex.org/g2>") in got
    assert ("<http://ex.org/g2>", "<http://ex.org/q>", '"w"',
            "<http://ex.org/g1>") in got


def test_graph_id_container():
    doc = {"@context": {"@base": "http://ex.org/",
                        "g": {"@id": "http://ex.org/g",
                              "@container": ["@graph", "@id"]}},
           "@id": "http://ex.org/s",
           "g": {"http://ex.org/named": {"http://ex.org/p": "v"}}}
    got = quads(doc)
    inner = [q for q in got if q[1] == "<http://ex.org/p>"]
    assert len(inner) == 1 and inner[0][3] == "<http://ex.org/named>"
    link = [q for q in got if q[0] == "<http://ex.org/s>"]
    assert len(link) == 1 and link[0][2] == "<http://ex.org/named>"


def test_graph_index_container():
    doc = {"@context": {"g": {"@id": "http://ex.org/g",
                              "@container": ["@graph", "@index"]}},
           "@id": "http://ex.org/s",
           "g": {"idx": {"http://ex.org/p": "v"}}}
    got = quads(doc)
    inner = [q for q in got if q[1] == "<http://ex.org/p>"]
    assert len(inner) == 1 and inner[0][3].startswith("_:")


def test_included_nested():
    doc = {"@id": "http://ex.org/s", "http://ex.org/p": "v",
           "@included": {"@id": "http://ex.org/s2",
                         "http://ex.org/p": "v2",
                         "@included": {"@id": "http://ex.org/s3",
                                       "http://ex.org/p": "v3"}}}
    got = quads(doc)
    assert len(got) == 3
    assert {q[0] for q in got} == {"<http://ex.org/s>",
                                   "<http://ex.org/s2>",
                                   "<http://ex.org/s3>"}


# --- lists -------------------------------------------------------------------

def test_list_container_nested_array_becomes_nested_list():
    """JSON-LD 1.1 expansion step 5.2.1: a nested array under a @list
    container is a nested list object (1.0's 'list of lists' error is
    gone). Full quad shape covered by fixture list_container_nested_arrays."""
    doc = {"@context": {"p": {"@id": "http://ex.org/p",
                              "@container": "@list"}},
           "@id": "http://ex.org/s",
           "p": [["a"]]}
    got = quads(doc)
    firsts = [q for q in got if q[1].endswith("#first>")]
    assert len(firsts) == 2  # outer list cell + inner list cell


def test_list_with_iri_items():
    doc = {"@context": {"p": {"@id": "http://ex.org/p",
                              "@container": "@list", "@type": "@id"}},
           "@id": "http://ex.org/s",
           "p": ["http://a.org/", "http://b.org/"]}
    got = quads(doc)
    firsts = sorted(q[2] for q in got if q[1] == "<" + T.RDF_FIRST + ">")
    assert firsts == ["<http://a.org/>", "<http://b.org/>"]


def test_list_object_preserves_index_transparency():
    doc = {"@id": "http://ex.org/s",
           "http://ex.org/p": {"@list": ["a"], "@index": "ignored"}}
    got = quads(doc)
    assert len(got) == 3


# --- reverse -----------------------------------------------------------------

def test_reverse_container_set():
    doc = {"@context": {"children": {"@reverse": "http://ex.org/parent",
                                     "@container": "@set"}},
           "@id": "http://ex.org/dad",
           "children": [{"@id": "http://ex.org/k1"},
                        {"@id": "http://ex.org/k2"}]}
    assert quads(doc) == {
        ("<http://ex.org/k1>", "<http://ex.org/parent>",
         "<http://ex.org/dad>", ""),
        ("<http://ex.org/k2>", "<http://ex.org/parent>",
         "<http://ex.org/dad>", "")}


def test_double_reverse_cancels():
    doc = {"@id": "http://ex.org/s",
           "@reverse": {"http://ex.org/p": {
               "@id": "http://ex.org/m",
               "@reverse": {"http://ex.org/q": {
                   "@id": "http://ex.org/o"}}}}}
    got = quads(doc)
    assert ("<http://ex.org/m>", "<http://ex.org/p>", "<http://ex.org/s>",
            "") in got
    assert ("<http://ex.org/o>", "<http://ex.org/q>", "<http://ex.org/m>",
            "") in got


def test_reverse_value_object_errors():
    doc = {"@context": {"rev": {"@reverse": "http://ex.org/p"}},
           "@id": "http://ex.org/o", "rev": "literal"}
    with pytest.raises(JsonLdError):
        quads(doc)


# --- nest --------------------------------------------------------------------

def test_nest_array_and_alias():
    doc = {"@context": {"meta": "@nest", "p": "http://ex.org/p",
                        "q": "http://ex.org/q"},
           "@id": "http://ex.org/s",
           "meta": [{"p": "1"}, {"q": "2"}]}
    got = quads(doc)
    assert ("<http://ex.org/s>", "<http://ex.org/p>", '"1"', "") in got
    assert ("<http://ex.org/s>", "<http://ex.org/q>", '"2"', "") in got


def test_nest_with_value_errors():
    doc = {"@context": {"meta": "@nest"},
           "@id": "http://ex.org/s",
           "meta": {"@value": "x"}}
    with pytest.raises(JsonLdError):
        quads(doc)


# --- errors ------------------------------------------------------------------

def test_colliding_keywords():
    doc = {"@context": {"id1": "@id", "id2": "@id"},
           "id1": "http://ex.org/a", "id2": "http://ex.org/b",
           "http://ex.org/p": "v"}
    with pytest.raises(JsonLdError):
        quads(doc)


def test_invalid_id_value():
    with pytest.raises(JsonLdError):
        quads({"@id": 5, "http://ex.org/p": "v"})


def test_invalid_language_value():
    with pytest.raises(JsonLdError):
        quads({"@id": "http://ex.org/s",
               "http://ex.org/p": {"@value": "x", "@language": 5}})


def test_value_with_extra_keys_errors():
    with pytest.raises(JsonLdError):
        quads({"@id": "http://ex.org/s",
               "http://ex.org/p": {"@value": "x",
                                   "http://ex.org/extra": "y"}})


def test_keyword_like_terms_ignored():
    doc = {"@id": "http://ex.org/s", "@ignoreMe": "x",
           "http://ex.org/p": "v"}
    assert quads(doc) == {
        ("<http://ex.org/s>", "<http://ex.org/p>", '"v"', "")}


# --- rdf-star extras ---------------------------------------------------------

def test_rdfstar_embedded_object_position():
    doc = {"@id": "http://ex.org/s",
           "http://ex.org/says": {
               "@id": {"@id": "http://ex.org/a",
                       "http://ex.org/b": {"@id": "http://ex.org/c"}}}}
    got = quads(doc)
    assert got == {
        ("<http://ex.org/s>", "<http://ex.org/says>",
         "<< <http://ex.org/a> <http://ex.org/b> <http://ex.org/c> >>",
         "")}


def test_rdfstar_nested_annotation():
    doc = {"@id": "http://ex.org/s",
           "http://ex.org/p": {
               "@id": "http://ex.org/o",
               "@annotation": {
                   "http://ex.org/certainty": {
                       "@value": "high",
                       "@annotation": {"http://ex.org/src": "me"}}}}}
    got = quads(doc)
    q1 = ("<http://ex.org/s>", "<http://ex.org/p>", "<http://ex.org/o>", "")
    assert q1 in got
    quoted1 = "<< <http://ex.org/s> <http://ex.org/p> <http://ex.org/o> >>"
    q2 = (quoted1, "<http://ex.org/certainty>", '"high"', "")
    assert q2 in got
    quoted2 = f'<< {quoted1} <http://ex.org/certainty> "high" >>'
    assert (quoted2, "<http://ex.org/src>", '"me"', "") in got


def test_rdfstar_embedded_multi_property_errors():
    doc = {"@id": {"@id": "http://ex.org/s", "http://ex.org/p": "a",
                   "http://ex.org/q": "b"},
           "http://ex.org/c": 1}
    with pytest.raises(JsonLdError):
        quads(doc)


# --- remote-context memo safety ------------------------------------------------

def test_remote_context_memo_not_base_contaminated():
    # a remote context with @vocab:"" is base-dependent: two documents with
    # different base IRIs must not share the memoized processing result
    cache = {"http://r.org/vocabctx": {"@context": {"@vocab": ""}}}
    doc = {"@context": "http://r.org/vocabctx", "t": "v"}
    got_a = quads(doc, base="http://a.org/x", ctx_cache=cache)
    got_b = quads(doc, base="http://b.org/y", ctx_cache=cache)
    assert got_a != got_b
    assert any("<http://a.org/xt>" == q[1] for q in got_a)
    assert any("<http://b.org/yt>" == q[1] for q in got_b)


def test_remote_context_memo_reuse_correct():
    cache = {"http://r.org/plain": {"@context": {"name": "http://s.org/n"}}}
    doc = {"@context": "http://r.org/plain",
           "@id": "http://ex.org/s", "name": "x"}
    expected = {("<http://ex.org/s>", "<http://s.org/n>", '"x"', "")}
    assert quads(doc, base="http://a.org/", ctx_cache=cache) == expected
    assert quads(doc, base="http://b.org/", ctx_cache=cache) == expected


def test_remote_memo_not_corrupted_by_inline_override():
    # doc A overrides a remote-context term with a later inline context in
    # the same @context array; doc B (same worker) must still see the
    # remote context's original mapping (memo must not be mutated)
    cache = {"http://m.org/ctx": {"@context": {"name": "http://schema.org/name"}}}
    doc_a = {"@context": ["http://m.org/ctx",
                          {"name": "http://other.org/name"}],
             "@id": "http://ex.org/a", "name": "A"}
    doc_b = {"@context": "http://m.org/ctx",
             "@id": "http://ex.org/b", "name": "B"}
    assert quads(doc_a, ctx_cache=cache) == {
        ("<http://ex.org/a>", "<http://other.org/name>", '"A"', "")}
    assert quads(doc_b, ctx_cache=cache) == {
        ("<http://ex.org/b>", "<http://schema.org/name>", '"B"', "")}


def test_no_stale_cache_from_context_processing():
    # the @index expansion during term definition must not poison the
    # expansion cache before prefix 'p' is defined
    doc = {"@context": {"t": {"@id": "http://e.org/t",
                              "@container": "@index",
                              "@index": "p:i"},
                        "p": {"@id": "http://pre.org/", "@prefix": True}},
           "@id": "http://ex.org/s",
           "p:i": "v"}
    got = quads(doc)
    assert ("<http://ex.org/s>", "<http://pre.org/i>", '"v"', "") in got


def test_large_realistic_context():
    # schema.org-scale remote context: ~600 terms incl. coercions and
    # containers; exercises the memo path at realistic size
    terms = {}
    for i in range(200):
        terms[f"prop{i}"] = f"http://schema.org/prop{i}"
    for i in range(200):
        terms[f"link{i}"] = {"@id": f"http://schema.org/link{i}",
                             "@type": "@id"}
    for i in range(100):
        terms[f"date{i}"] = {"@id": f"http://schema.org/date{i}",
                             "@type": "http://www.w3.org/2001/XMLSchema#date"}
    for i in range(100):
        terms[f"tags{i}"] = {"@id": f"http://schema.org/tags{i}",
                             "@container": "@set"}
    terms["@vocab"] = "http://schema.org/"
    cache = {"https://big.example.org/ctx": {"@context": terms}}

    import time
    doc = {"@context": "https://big.example.org/ctx",
           "@id": "http://ex.org/s",
           "prop5": "v", "link7": "http://ex.org/o",
           "date3": "2020-01-01", "tags9": ["a", "b"],
           "unmapped": 1}
    expected = {
        ("<http://ex.org/s>", "<http://schema.org/prop5>", '"v"', ""),
        ("<http://ex.org/s>", "<http://schema.org/link7>",
         "<http://ex.org/o>", ""),
        ("<http://ex.org/s>", "<http://schema.org/date3>",
         '"2020-01-01"^^<http://www.w3.org/2001/XMLSchema#date>', ""),
        ("<http://ex.org/s>", "<http://schema.org/tags9>", '"a"', ""),
        ("<http://ex.org/s>", "<http://schema.org/tags9>", '"b"', ""),
        ("<http://ex.org/s>", "<http://schema.org/unmapped>",
         '"1"^^<http://www.w3.org/2001/XMLSchema#integer>', ""),
    }
    assert quads(doc, ctx_cache=cache) == expected

    # memo effect: 500 parses of distinct docs must stay fast even though
    # the context has 600 terms (without the memo this is ~600 term
    # definitions per block). Loose bound to avoid flakiness on a noisy box.
    t0 = time.perf_counter()
    for i in range(500):
        quads({**doc, "@id": f"http://ex.org/s{i}"}, ctx_cache=cache)
    assert time.perf_counter() - t0 < 5.0


# --- review-found regressions (round-1 high review) ---------------------------

def test_memo_not_stale_across_fresh_caches():
    # a NEW ctx_cache dict whose id() happens to be reused must not serve
    # the previous cache's processed context
    for i in range(4):
        cache = {"http://m2.org/ctx": {"@context": {"@vocab": f"http://vocab{i}/"}}}
        got = quads({"@context": "http://m2.org/ctx",
                     "@id": "http://ex.org/s", "name": "x"},
                    ctx_cache=cache)
        assert got == {("<http://ex.org/s>", f"<http://vocab{i}/name>",
                        '"x"', "")}, f"stale memo at iter {i}"


def test_nan_in_json_literal_recoverable():
    from jsonld_streaming_parser_js_spark.functions.parser import parse_block
    block = ('{"@context":{"p":{"@id":"http://ex/p","@type":"@json"}},'
             '"p": NaN}')
    q, err = parse_block(block, "http://x.org/p", 0)
    assert q == [] and err is not None


def test_type_container_string_value():
    # string values under @container:@type are node references (type
    # mapping defaults to @id per CTD)
    doc = {"@context": {"@vocab": "http://v.org/",
                        "tmap": {"@id": "http://ex.org/p",
                                 "@container": "@type"}},
           "@id": "http://ex.org/s",
           "tmap": {"T1": "http://ex.org/obj"}}
    assert quads(doc) == {
        ("<http://ex.org/s>", "<http://ex.org/p>", "<http://ex.org/obj>",
         ""),
        ("<http://ex.org/obj>", RDF_TYPE, "<http://v.org/T1>", "")}


def test_annotation_bnode_coreference():
    # _:x used in the body AND inside an @annotation keeps ONE label
    doc = {"@id": "http://ex.org/s",
           "http://ex.org/q": {"@id": "_:x"},
           "http://ex.org/p": {
               "@id": "http://ex.org/o",
               "@annotation": {"http://ex.org/seenBy": {"@id": "_:x"}}}}
    got = quads(doc)
    body = [q for q in got if q[1] == "<http://ex.org/q>"]
    ann = [q for q in got if q[1] == "<http://ex.org/seenBy>"]
    assert len(body) == 1 and len(ann) == 1
    assert body[0][2] == ann[0][2]


def test_skolemize_does_not_touch_literal_content():
    from jsonld_streaming_parser_js_spark.functions.parser import parse_block
    import json as _json
    block = _json.dumps({
        "@id": {"@id": "http://ex.org/s",
                "http://ex.org/p": "note _:b0 here"},
        "http://ex.org/c": 1})
    q, err = parse_block(block, "http://x.org/p", 0)
    assert err is None and len(q) == 1
    assert '"note _:b0 here"' in q[0][0]


def test_large_negative_integral_double():
    doc = {"@id": "http://ex.org/s", "http://ex.org/p": -1e22}
    got = quads(doc)
    # reference semantics: integer gate has no abs(), lexical is JS
    # Number.toString -> "-1e+22"
    assert got == {("<http://ex.org/s>", "<http://ex.org/p>",
                    '"-1e+22"^^<' + T.XSD_INTEGER + ">", "")}


def test_two_char_terms_with_colon():
    doc = {"@context": {"a:": {"@id": "http://ex.org/x"},
                        ":b": {"@id": "http://ex.org/y"}},
           "@id": "http://ex.org/s", "a:": "1", ":b": "2"}
    got = quads(doc)
    assert ("<http://ex.org/s>", "<http://ex.org/x>", '"1"', "") in got
    assert ("<http://ex.org/s>", "<http://ex.org/y>", '"2"', "") in got


def test_index_without_index_container_errors():
    with pytest.raises(JsonLdError):
        quads({"@context": {"p": {"@id": "http://ex.org/p",
                                  "@index": "http://ex.org/i"}},
               "@id": "http://ex.org/s", "p": "v"})


def test_embedded_node_honors_rdf_direction():
    doc = {"@id": {"@id": "http://ex.org/s",
                   "http://ex.org/p": {"@value": "v", "@language": "en",
                                       "@direction": "ltr"}},
           "http://ex.org/c": 1}
    got = quads(doc, rdf_direction="i18n-datatype")
    (s, p, o, g), = got
    assert "i18n#en_ltr" in s


# --- negative battery: error codes for classic invalid documents -------------

NEGATIVE_CASES = [
    ("colliding keywords",
     {"@context": {"i1": "@id", "i2": "@id"},
      "i1": "http://e/a", "i2": "http://e/b", "http://e/p": "v"}),
    ("invalid @id value", {"@id": 5, "http://e/p": "v"}),
    ("invalid term definition",  # empty-string term (W3C: invalid)
     {"@context": {"": "http://e/x"}, "@id": "http://e/s",
      "http://e/p": "v"}),
    ("invalid type value",
     {"@id": "http://e/s", "@type": {"bad": "object"}}),
    ("invalid value object",
     {"@id": "http://e/s",
      "http://e/p": {"@value": "x", "http://e/extra": 1}}),
    ("invalid language-tagged value",
     {"@id": "http://e/s", "http://e/p": {"@value": 5, "@language": "en"}}),
    ("invalid base direction",
     {"@id": "http://e/s",
      "http://e/p": {"@value": "x", "@direction": "sideways"}}),
    ("invalid value object",  # @direction + @type (reference Util.ts:410)
     {"@id": "http://e/s",
      "http://e/p": {"@value": "x", "@direction": "rtl",
                     "@type": "http://e/T"}}),
    ("invalid value object",  # @direction needs string @value (Util.ts:378)
     {"@id": "http://e/s",
      "http://e/p": {"@value": 4, "@direction": "rtl"}}),
    ("invalid @index value",
     {"@id": "http://e/s", "http://e/p": {"@value": "x", "@index": 9}}),

    ("invalid container mapping",  # @list may not combine with @set
     {"@context": {"p": {"@id": "http://e/p",
                         "@container": ["@list", "@set"]}},
      "@id": "http://e/s", "p": ["a"]}),
    ("invalid reverse property map",
     {"@id": "http://e/s", "@reverse": {"@type": "http://e/T"}}),
    ("invalid @reverse value",
     {"@id": "http://e/s", "@reverse": "not-a-map"}),
    ("invalid @nest value",
     {"@context": {"n": "@nest"}, "@id": "http://e/s",
      "n": {"@value": "x"}}),
    ("invalid set or list object",
     {"@id": "http://e/s",
      "http://e/p": {"@list": ["x"], "@id": "http://e/o"}}),
    ("invalid set or list object",  # r7 probe: @annotation beside @list
     {"@id": "http://e/s",
      "http://e/p": {"@list": [1, 2], "@annotation": {"http://e/q": "v"}}}),
    ("keyword redefinition",
     {"@context": {"@id": "http://e/x"}, "http://e/p": "v"}),
    ("cyclic IRI mapping",
     {"@context": {"a": "b:x", "b": "a:y"}, "@id": "http://e/s",
      "a": "v"}),
    ("invalid container mapping",
     {"@context": {"p": {"@id": "http://e/p",
                         "@container": ["@list", "@set"]}},
      "@id": "http://e/s", "p": "v"}),
    ("invalid @propagate value",
     {"@context": {"@propagate": "yes", "p": "http://e/p"},
      "@id": "http://e/s", "p": "v"}),
    ("invalid @version value",
     {"@context": {"@version": 2.0}, "http://e/p": "v"}),
    # --- round-2 extension: full coverage of every code the kernel raises
    ("conflicting indexes",
     {"@id": "http://e/s",
      "http://e/p": [{"@id": "http://e/o", "@index": "a"}],
      "http://e/q": [{"@id": "http://e/o", "@index": "b"}]}),
    ("invalid @import value",
     {"@context": {"@import": 5}, "http://e/p": "v"}),
    ("invalid @included value",
     {"@id": "http://e/s", "@included": "str"}),
    ("invalid @included value",
     {"@id": "http://e/s", "@included": {"@value": "x"}}),
    ("invalid @prefix value",
     {"@context": {"t": {"@id": "http://e/t#", "@prefix": "yes"}},
      "@id": "http://e/s", "t:x": "v"}),
    ("invalid @protected value",
     {"@context": {"t": {"@id": "http://e/t", "@protected": "yes"}},
      "@id": "http://e/s", "t": "v"}),
    ("invalid IRI mapping",
     {"@context": {"a": "http://e/a#", "a:b": "http://e/direct"},
      "@id": "http://e/s", "a:b": "v"}),
    ("invalid annotation",
     {"@id": "http://e/s", "@annotation": {"http://e/q": "v"},
      "http://e/p": "x"}),
    ("invalid annotation",
     {"@id": "http://e/s",
      "http://e/p": {"@id": "http://e/o",
                     "@annotation": {"@id": "http://e/bad",
                                     "http://e/q": "v"}}}),
    ("invalid base IRI",
     {"@context": {"@base": 5}, "http://e/p": "v"}),
    ("invalid default language",
     {"@context": {"@language": 5}, "http://e/p": "v"}),
    ("invalid embedded node",
     {"@id": {"p": {"@id": {"@graph": [{"http://e/a": 1}]}}},
      "http://e/p2": "v"}),
    ("invalid keyword alias",
     {"@context": {"ctx": "@context"}, "@id": "http://e/s",
      "http://e/p": "v"}),
    ("invalid language map value",
     {"@context": {"p": {"@id": "http://e/p", "@container": "@language"}},
      "@id": "http://e/s", "p": {"en": 5}}),
    ("invalid language mapping",
     {"@context": {"p": {"@id": "http://e/p", "@language": 5}},
      "@id": "http://e/s", "p": "v"}),
    ("invalid language-tagged string",
     {"@id": "http://e/s", "http://e/p": {"@value": "x",
                                          "@language": None}}),
    ("invalid local context",
     {"@context": 5, "http://e/p": "v"}),
    ("invalid context nullification",  # W3C tpr14: null can't drop
     {"@context": [{"@protected": True, "p": "http://e/p"}, None,
                   {"p": "http://e/q"}],  # protected terms at top level
      "@id": "http://e/s", "p": "v"}),
    ("invalid context nullification",  # W3C tpr05: nor from an embedded
     {"@context": {"@protected": True, "p": "http://e/p"},  # node context
      "@id": "http://e/s",
      "p": {"@context": None, "@id": "http://e/o", "p": "w"}}),
    ("invalid reverse property",
     {"@context": {"r": {"@reverse": "http://e/p", "@container": "@list"}},
      "@id": "http://e/s", "r": {"@id": "http://e/o"}}),
    ("invalid reverse property value",
     {"@id": "http://e/s", "@reverse": {"http://e/p": "lit"}}),
    ("invalid scoped context",
     {"@context": {"T": {"@id": "http://e/T", "@context": 5}},
      "@id": "http://e/s", "@type": "T"}),
    ("invalid term definition",
     {"@context": {"": "http://e/empty"}, "@id": "http://e/s", "": "v"}),
    ("invalid type mapping",
     {"@context": {"p": {"@id": "http://e/p", "@type": 5}},
      "@id": "http://e/s", "p": "v"}),
    ("invalid typed value",
     {"@id": "http://e/s", "http://e/p": {"@value": "x",
                                          "@type": "not an iri"}}),
    ("invalid typed value",  # a literal datatype must be an IRI, not bnode
     {"@id": "http://e/s", "http://e/p": {"@value": "x", "@type": "_:b"}}),
    ("invalid value object value",
     {"@id": "http://e/s", "http://e/p": {"@value": {"a": 1}}}),
    ("invalid vocab mapping",
     {"@context": {"@vocab": 5}, "http://e/p": "v"}),
    ("protected term redefinition",
     {"@context": [{"@protected": True, "t": "http://e/t"},
                   {"t": "http://e/OTHER"}],
      "@id": "http://e/s", "t": "v"}),
    ("loading remote context failed",
     {"@context": "https://absent.example.org/ctx", "http://e/p": "v"}),
    ("invalid embedded node",  # exactly ONE triple required (got 2)
     {"@id": {"@id": "http://e/es", "http://e/p1": "a",
              "http://e/p2": "b"}, "http://e/q": "v"}),
    ("invalid embedded node",  # exactly ONE triple required (got 0)
     {"@id": {"@id": "http://e/es"}, "http://e/q": "v"}),
    ("invalid embedded node",  # reverse in embedded: error unless
     # rdfstar_reverse_in_embedded (reference rdfstarReverseInEmbedded)
     {"@id": {"@id": "http://e/rei",
              "@reverse": {"http://e/rel": {"@id": "http://e/value"}}},
      "http://e/prop": "v2"}),
    ("invalid value object",  # property-based index requires node values
     {"@context": {"p": {"@id": "http://e/p", "@container": "@index",
                         "@index": "http://e/prop"}},
      "@id": "http://e/s", "p": {"k": "plainstring"}}),
]

# codes that need a remote-context cache to trigger: (code, doc, ctx_cache)
_MAX = 33  # > context.MAX_REMOTE_CONTEXTS (32)
NEGATIVE_REMOTE_CASES = [
    ("recursive context inclusion",
     {"@context": "https://c/a", "http://e/p": "v"},
     {"https://c/a": {"@context": ["https://c/b"]},
      "https://c/b": {"@context": ["https://c/a"]}}),
    ("invalid remote context",
     {"@context": "https://c/bad", "http://e/p": "v"},
     {"https://c/bad": "not a context"}),
    ("invalid context entry",  # @import inside an imported context
     {"@context": {"@import": "https://c/i"}, "http://e/p": "v"},
     {"https://c/i": {"@context": {"@import": "https://c/j"}}}),
    ("invalid remote context",  # imported context must be a map, not array
     {"@context": {"@import": "https://c/i"}, "http://e/p": "v"},
     {"https://c/i": {"@context": [{"a": "http://e/a"}]}}),
    ("context overflow",
     {"@context": "https://c/0", "http://e/p": "v"},
     {**{f"https://c/{i}": {"@context": [f"https://c/{i+1}"]}
         for i in range(_MAX + 1)},
      f"https://c/{_MAX + 1}": {"@context": {"p": "http://e/p"}}}),
]


@pytest.mark.parametrize("expected_code,doc,cache", NEGATIVE_REMOTE_CASES,
                         ids=[c[0].replace(" ", "_")
                              for c in NEGATIVE_REMOTE_CASES])
def test_negative_remote_error_codes(expected_code, doc, cache):
    with pytest.raises(JsonLdError) as exc:
        quads(doc, ctx_cache=cache)
    assert exc.value.code == expected_code, (
        f"expected {expected_code!r}, got {exc.value.code!r}")


@pytest.mark.parametrize("expected_code,doc", NEGATIVE_CASES,
                         ids=[c[0].replace(" ", "_")
                              for c in NEGATIVE_CASES])
def test_negative_error_codes(expected_code, doc):
    with pytest.raises(JsonLdError) as exc:
        quads(doc)
    assert exc.value.code == expected_code, (
        f"expected {expected_code!r}, got {exc.value.code!r}")


def test_annotation_with_id_errors():
    doc = {"@id": "http://ex.org/s",
           "http://ex.org/p": {
               "@id": "http://ex.org/o",
               "@annotation": {"@id": "http://ex.org/bad",
                               "http://ex.org/q": "v"}}}
    with pytest.raises(JsonLdError):
        quads(doc)


def test_default_graph_option_renames_default():
    doc = {"@id": "http://e/s", "http://e/p": "v",
           "@graph": [{"@id": "http://e/n", "http://e/q": "w"}]}
    got = quads(doc, default_graph="<http://e/DG>")
    assert ("<http://e/s>", "<http://e/p>", '"v"', "<http://e/DG>") in got
    # quads already in a named graph keep their graph
    assert ("<http://e/n>", "<http://e/q>", '"w"', "<http://e/s>") in got


# --- processingMode: json-ld-1.0 (reference: lib/JsonLdParser.ts:652) --------

def quads10(doc, **kw):
    opts = ParserOptions(processing_mode="json-ld-1.0",
                         ctx_cache=kw.pop("ctx_cache", {}), **kw)
    return set(jsonld_to_quads(doc, opts))


MODE10_ERRORS = [
    ("processing mode conflict",
     {"@context": {"@version": 1.1, "p": "http://e/p"}, "p": "v"}),
    ("invalid context entry",
     {"@context": {"@import": "https://c/i"}, "http://e/p": "v"}),
    ("invalid context entry",
     {"@context": {"@propagate": True, "p": "http://e/p"}, "p": "v"}),
    ("invalid context entry",
     {"@context": {"@direction": "rtl"}, "http://e/p": "v"}),
    ("invalid term definition",  # scoped contexts are 1.1-only
     {"@context": {"p": {"@id": "http://e/p",
                         "@context": {"x": "http://e/x"}}},
      "@id": "http://e/s", "p": {"x": "v"}}),
    ("invalid term definition",  # @prefix is 1.1-only
     {"@context": {"t": {"@id": "http://e/t#", "@prefix": True}},
      "@id": "http://e/s", "t:x": "v"}),
    ("invalid term definition",  # @protected is 1.1-only
     {"@context": {"t": {"@id": "http://e/t", "@protected": True}},
      "@id": "http://e/s", "t": "v"}),
    ("invalid term definition",  # @nest is 1.1-only
     {"@context": {"t": {"@id": "http://e/t", "@nest": "@nest"}},
      "@id": "http://e/s", "t": "v"}),
    ("invalid type mapping",  # @type: @json is 1.1-only
     {"@context": {"t": {"@id": "http://e/t", "@type": "@json"}},
      "@id": "http://e/s", "t": {"a": 1}}),
    ("invalid type mapping",  # @type: @none is 1.1-only
     {"@context": {"t": {"@id": "http://e/t", "@type": "@none"}},
      "@id": "http://e/s", "t": "v"}),
    ("list of lists",
     {"@context": {"p": {"@id": "http://e/p", "@container": "@list"}},
      "@id": "http://e/s", "p": [["a"]]}),
    ("invalid context entry",  # top-level @protected is 1.1-only
     {"@context": {"@protected": True, "t": "http://e/t"},
      "@id": "http://e/s", "t": "v"}),
    ("invalid container mapping",  # @graph container is 1.1-only
     {"@context": {"g": {"@id": "http://e/g", "@container": "@graph"}},
      "@id": "http://e/s", "g": {"http://e/q": "v"}}),
    ("invalid container mapping",  # array containers are 1.1-only
     {"@context": {"p": {"@id": "http://e/p",
                         "@container": ["@set", "@index"]}},
      "@id": "http://e/s", "p": {"i": "v"}}),
]


@pytest.mark.parametrize("expected_code,doc", MODE10_ERRORS,
                         ids=[f"{c[0].replace(' ', '_')}_{i}"
                              for i, c in enumerate(MODE10_ERRORS)])
def test_json_ld_10_mode_rejects_11_features(expected_code, doc):
    with pytest.raises(JsonLdError) as exc:
        quads10(doc)
    assert exc.value.code == expected_code, (
        f"expected {expected_code!r}, got {exc.value.code!r}")


def test_json_ld_10_mode_still_parses_10_documents():
    doc = {"@context": {"p": "http://e/p",
                        "l": {"@id": "http://e/l", "@container": "@list"},
                        "t": {"@id": "http://e/t", "@type": "@id"}},
           "@id": "http://e/s", "p": "v", "l": ["a"],
           "t": "http://e/o"}
    got = quads10(doc)
    assert ("<http://e/s>", "<http://e/p>", '"v"', "") in got
    assert ("<http://e/s>", "<http://e/t>", "<http://e/o>", "") in got


def test_mode_does_not_leak_through_context_memo():
    """A 1.0-mode parse of an inline context must not poison (or be
    poisoned by) the worker-global memo shared with 1.1-mode parses."""
    ctx = {"p": {"@id": "http://e/p", "@context": {"x": "http://e/x"}}}
    doc = {"@context": ctx, "@id": "http://e/s", "p": {"x": "v"}}
    ok = quads(doc)  # 1.1: fine, scoped context applies
    assert ("<http://e/s>", "<http://e/p>", "_:b0", "") in ok or len(ok) == 2
    with pytest.raises(JsonLdError):
        quads10(doc)
    assert quads(doc) == ok  # 1.1 unaffected after the 1.0 failure


def test_inline_context_relative_import_resolves_against_document_base():
    """Regression: the inline-context memo probe must not break relative
    @import / scoped-context IRIs that resolve against the real base."""
    cache = {"http://d.org/dir/ctx.jsonld":
             {"@context": {"a": "http://e/a"}}}
    doc = {"@context": {"@import": "ctx.jsonld", "b": "http://e/b"},
           "@id": "http://e/s", "a": "1", "b": "2"}
    got = quads(doc, base="http://d.org/dir/doc", ctx_cache=cache)
    assert ("<http://e/s>", "<http://e/a>", '"1"', "") in got
    # and again (memo hit path must behave identically)
    assert quads(doc, base="http://d.org/dir/doc", ctx_cache=cache) == got


def test_json_ld_10_mode_drops_11_keywords_in_documents():
    """In 1.0 mode, 1.1-only document keywords (@included/@nest/@direction/
    @annotation) are unknown keyword-form entries -> silently dropped."""
    doc = {"@id": "http://e/s", "http://e/p": "v",
           "@included": [{"@id": "http://e/t", "http://e/q": "w"}],
           "@nest": {"http://e/r": "x"},
           "http://e/d": {"@value": "y", "@direction": "rtl",
                          "@language": "ar"}}
    got = quads10(doc)
    assert got == {
        ("<http://e/s>", "<http://e/p>", '"v"', ""),
        # @direction dropped from the value object -> plain lang literal
        ("<http://e/s>", "<http://e/d>", '"y"@ar', ""),
    }


def test_annotation_sentinel_collision_proof():
    """A crafted nested @id equal to the internal annotation marker must
    NOT be rewritten to the quoted triple."""
    doc = {"@id": "http://e/s",
           "http://e/p": {
               "@id": "http://e/o",
               "@annotation": {
                   "http://e/q": {"@id": "\x00annotated\x00"}}}}
    got = quads(doc)
    # the bogus @id is not a valid IRI term -> dropped, never the quoted
    # triple as object of http://e/q
    assert not any(o.startswith("<<") and p == "<http://e/q>"
                   for _, p, o, _ in got)


def test_validate_cache_tolerates_unused_chained_entry():
    """An extra cache entry chaining to an uncached IRI must not fail
    plan-build validation (the failure stays lazy, per-use)."""
    from jsonld_streaming_parser_js_spark.functions.context import (
        validate_context_cache)
    cache = {"https://c/extra": {"@context": "https://c/missing"},
             "https://c/used": {"@context": {"t": "http://e/t"}}}
    validate_context_cache(cache)  # must not raise
    got = quads({"@context": "https://c/used", "@id": "http://e/s",
                 "t": "v"}, ctx_cache=cache)
    assert got == {("<http://e/s>", "<http://e/t>", '"v"', "")}


def test_validate_cache_detects_entry_addition_after_validation():
    from jsonld_streaming_parser_js_spark.functions.context import (
        validate_context_cache)
    cache = {"https://c/ok": {"@context": {"t": "http://e/t"}}}
    validate_context_cache(cache)
    cache["https://c/bad"] = "not a context document"
    with pytest.raises(JsonLdError):
        validate_context_cache(cache)


ANNOTATION_ERRORS = [
    ("scalar annotation value",
     {"@id": "http://e/b",
      "http://e/knows": {"@id": "http://e/f", "@annotation": "abc"}}),
    ("value-object annotation",
     {"@id": "http://e/b",
      "http://e/knows": {"@id": "http://e/f",
                         "@annotation": {"@value": "abc"}}}),
    ("annotation inside a list",
     {"@id": "http://e/b",
      "http://e/knows": {"@list": [
          {"@id": "http://e/f", "@annotation": {"http://e/p": "v"}}]}}),
    ("annotation on top-level node",
     {"@id": "http://e/b", "http://e/name": "Bob",
      "@annotation": {"http://e/p": "v"}}),
    ("annotation inside embedded node",
     {"@id": "http://e/b",
      "http://e/claims": {"@id": {
          "@id": "http://e/f", "http://e/name": "Fred",
          "@annotation": {"http://e/c": 0.8}}}}),
]


@pytest.mark.parametrize("label,doc", ANNOTATION_ERRORS,
                         ids=[c[0].replace(" ", "_")
                              for c in ANNOTATION_ERRORS])
def test_annotation_error_variants(label, doc):
    """All five INVALID_ANNOTATION shapes the reference's suite rejects
    (test/JsonLdParser-test.ts:11914-12066)."""
    with pytest.raises(JsonLdError) as exc:
        quads(doc)
    assert exc.value.code == "invalid annotation"


def test_annotation_on_value_object_in_list_errors():
    with pytest.raises(JsonLdError) as exc:
        quads({"@id": "http://e/b",
               "http://e/knows": {"@list": [
                   {"@value": "x", "@annotation": {"http://e/p": "v"}}]}})
    assert exc.value.code == "invalid annotation"


def test_annotation_set_wrapped_value_object_errors():
    with pytest.raises(JsonLdError) as exc:
        quads({"@id": "http://e/b",
               "http://e/knows": {"@id": "http://e/f",
                                  "@annotation": {
                                      "@set": [{"@value": "abc"}]}}})
    assert exc.value.code == "invalid annotation"


def test_integer_beyond_double_range_is_infinity():
    """JS JSON.parse of a 400-digit int yields Infinity -> 'INF'^^xsd:double
    (and inside @json it is the NaN/Infinity recoverable error)."""
    got = quads({"@id": "http://e/s", "http://e/p": int("9" * 400)})
    assert ("<http://e/s>", "<http://e/p>",
            '"INF"^^<' + T.XSD_DOUBLE + ">", "") in got


def test_value_type_array_errors():
    with pytest.raises(JsonLdError) as exc:
        quads({"@id": "http://e/s",
               "http://e/p": {"@value": "x", "@type": ["http://e/dt"]}})
    assert exc.value.code == "invalid typed value"


def test_relative_vocab_rejected_in_10_mode():
    # relative @vocab (incl. '#') is a JSON-LD 1.1 feature; 1.0 rejects it
    doc = {"@context": {"@base": "http://example/document", "@vocab": "#"},
           "@id": "http://e/s", "name": "v"}
    opts = ParserOptions(processing_mode="json-ld-1.0")
    with pytest.raises(JsonLdError) as exc:
        jsonld_to_quads(doc, opts)
    assert exc.value.code == "invalid vocab mapping"


# --- IJsonLdParserOptions parity: the five round-3 behavior flags -------------

def _opt_quads(doc, **opts):
    return set(jsonld_to_quads(doc, ParserOptions(**opts)))


def test_strict_unknown_keyword_errors():
    # reference JsonLdParser-test.ts:12303
    with pytest.raises(JsonLdError) as exc:
        _opt_quads({"@unknown": "dummy"}, strict_values=True)
    assert exc.value.code == "invalid keyword"


def test_strict_invalid_predicate_errors():
    # reference :12312; lenient mode silently drops
    with pytest.raises(JsonLdError):
        _opt_quads({"bla": "dummy"}, strict_values=True)
    assert _opt_quads({"bla": "dummy"}) == set()


def test_strict_invalid_subject_and_object_error():
    # reference :12321, :12330
    with pytest.raises(JsonLdError):
        _opt_quads({"@id": "dummy", "http://e/p": "v"}, strict_values=True)
    with pytest.raises(JsonLdError):
        _opt_quads({"http://ex.org/pred": {"@id": "dummy"}},
                   strict_values=True)


def test_strict_invalid_type_errors():
    # reference :12339
    with pytest.raises(JsonLdError):
        _opt_quads({"@type": "http://ex.org/ abc"}, strict_values=True)
    assert _opt_quads({"@type": "http://ex.org/ abc"}) == set()


def test_strict_null_mapped_term_still_drops():
    # reference :12395/:12406 — explicit null mapping is deliberate
    got = _opt_quads({"@context": {"bla": None}, "@id": "http://e/s",
                      "bla": "x", "http://e/p": "v"}, strict_values=True)
    assert got == {("<http://e/s>", "<http://e/p>", '"v"', "")}


def test_rdfstar_disabled_ignores_annotations():
    # reference :11487
    got = _opt_quads({"@id": "ex:s", "ex:p": {"@id": "ex:o",
                      "@annotation": {"ex:a": "v"}}}, rdfstar=False)
    assert got == {("<ex:s>", "<ex:p>", "<ex:o>", "")}


def test_rdfstar_disabled_rejects_embedded_nodes():
    with pytest.raises(JsonLdError) as exc:
        _opt_quads({"@id": {"@id": "ex:s", "ex:p": "v"}, "ex:q": "w"},
                   rdfstar=False)
    assert exc.value.code == "invalid @id value"


def test_allow_subject_list():
    # reference :1695-1727
    doc = {"@context": {"term": {"@reverse": "http://example/reverse"}},
           "@id": "http://example/foo",
           "term": {"@list": ["http://example/bar"]}}
    with pytest.raises(JsonLdError) as exc:
        _opt_quads(doc)
    assert exc.value.code == "invalid reverse property value"
    got = _opt_quads(doc, allow_subject_list=True)
    assert got == {
        ("_:l0", "<http://example/reverse>", "<http://example/foo>", ""),
        ("_:l0", "<" + T.RDF + "first>", '"http://example/bar"', ""),
        ("_:l0", "<" + T.RDF + "rest>", "<" + T.RDF + "nil>", "")}


def test_normalize_language_tags_off_keeps_case():
    # reference :684 — default 1.1 runtime keeps 'en-US'
    got = _opt_quads({"@id": "http://e/s",
                      "http://e/p": {"@value": "x", "@language": "en-US"}},
                     normalize_language_tags=False)
    assert got == {("<http://e/s>", "<http://e/p>", '"x"@en-US', "")}


def test_normalize_language_tags_forced_in_10_mode():
    got = _opt_quads({"@id": "http://e/s",
                      "http://e/p": {"@value": "x", "@language": "en-US"}},
                     normalize_language_tags=False,
                     processing_mode="json-ld-1.0")
    assert got == {("<http://e/s>", "<http://e/p>", '"x"@en-us', "")}


def test_validate_value_indexes_off_is_lenient():
    # reference :12363-12394 (validateValueIndexes=false leniency)
    got = _opt_quads({"@id": "http://e/s",
                      "http://e/p": {"@value": "x", "@index": 9}},
                     validate_value_indexes=False)
    assert got == {("<http://e/s>", "<http://e/p>", '"x"', "")}
    docs = [{"@id": "http://e/s", "@index": "a", "http://e/p": "v"},
            {"@id": "http://e/s", "@index": "b", "http://e/q": "w"}]
    got = _opt_quads(docs, validate_value_indexes=False)
    assert len(got) == 2
    with pytest.raises(JsonLdError) as exc:
        _opt_quads(docs)
    assert exc.value.code == "conflicting indexes"


def test_flags_restored_after_parse():
    from jsonld_streaming_parser_js_spark.functions.context import FLAGS
    with pytest.raises(JsonLdError):
        _opt_quads({"bla": "x"}, strict_values=True, rdfstar=False)
    assert FLAGS.strict_values is False and FLAGS.rdfstar is True


def test_invalid_context_nullification_code():
    # nullifying a context that defined protected terms (W3C: invalid
    # context nullification; override only legal via property scope)
    doc = {"@context": [{"@protected": True, "p": "http://e/p"}, None],
           "@id": "http://e/s", "http://e/p": "v"}
    with pytest.raises(JsonLdError) as exc:
        quads(doc)
    assert exc.value.code == "invalid context nullification"


def test_strict_malformed_language_tag_errors_lenient_drops():
    doc = {"@id": "http://e/s",
           "http://e/p": {"@value": "x", "@language": "en_US"}}
    assert quads(doc) == set()  # lenient: dropped (never invalid N-Triples)
    with pytest.raises(JsonLdError) as exc:
        jsonld_to_quads(doc, ParserOptions(strict_values=True))
    assert exc.value.code == "invalid language-tagged string"
