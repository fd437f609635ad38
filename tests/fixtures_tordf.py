"""Vendored toRdf-style fixture corpus (FIXTURES.md section 3 shape).

Each fixture: (name, options, input JSON-LD document, expected N-Quads).
Expected output computed per the W3C JSON-LD 1.1 Transform-to-RDF algorithm;
comparison is dataset isomorphism (blank-node bijection), matching the
reference's oracle semantics.
"""

EX = "http://example.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

FIXTURES = [
    ("top_level_array", {}, [
        {"@id": "http://ex.org/a", "http://ex.org/p": "1"},
        {"@id": "http://ex.org/b", "http://ex.org/p": "2"},
    ], '''
<http://ex.org/a> <http://ex.org/p> "1" .
<http://ex.org/b> <http://ex.org/p> "2" .
'''),

    ("expanded_form_no_context", {}, {
        "@id": "http://ex.org/s",
        "http://ex.org/p": [{"@value": 4.3}],
        "http://ex.org/q": [{"@id": "http://ex.org/o"}],
    }, f'''
<http://ex.org/s> <http://ex.org/p> "4.3E0"^^<{XSD}double> .
<http://ex.org/s> <http://ex.org/q> <http://ex.org/o> .
'''),

    ("type_coercion_vocab", {}, {
        "@context": {"@vocab": "http://v.org/",
                     "knows": {"@type": "@vocab"}},
        "@id": "http://ex.org/s", "knows": "Bob",
    }, '''
<http://ex.org/s> <http://v.org/knows> <http://v.org/Bob> .
'''),

    ("base_null_blocks_relative", {"base_iri": "http://b.org/"}, {
        "@context": {"@base": None},
        "@id": "rel", "http://ex.org/p": "v",
    }, ''),  # relative @id unresolvable -> subject invalid -> no quads

    ("graph_with_props_and_contents", {}, {
        "@id": "http://ex.org/g",
        "http://ex.org/meta": "m",
        "@graph": {"@id": "http://ex.org/s", "http://ex.org/p": "v"},
    }, '''
<http://ex.org/g> <http://ex.org/meta> "m" .
<http://ex.org/s> <http://ex.org/p> "v" <http://ex.org/g> .
'''),

    ("graph_index_retains_default", {}, {
        "@context": {"g": {"@id": "http://ex.org/g",
                           "@container": ["@graph", "@index"]}},
        "@id": "http://ex.org/s",
        "g": {"i1": {"@id": "http://ex.org/n", "http://ex.org/p": "v"}},
    }, '''
<http://ex.org/s> <http://ex.org/g> _:g0 .
<http://ex.org/n> <http://ex.org/p> "v" _:g0 .
'''),

    ("list_in_list_explicit", {}, {
        "@id": "http://ex.org/s",
        "http://ex.org/p": {"@list": [{"@list": ["x"]}, "y"]},
    }, f'''
<http://ex.org/s> <http://ex.org/p> _:outer0 .
_:outer0 <{RDF}first> _:inner0 .
_:outer0 <{RDF}rest> _:outer1 .
_:inner0 <{RDF}first> "x" .
_:inner0 <{RDF}rest> <{RDF}nil> .
_:outer1 <{RDF}first> "y" .
_:outer1 <{RDF}rest> <{RDF}nil> .
'''),

    ("list_of_bnodes", {}, {
        "@id": "http://ex.org/s",
        "http://ex.org/p": {"@list": [{"http://ex.org/q": "a"}]},
    }, f'''
<http://ex.org/s> <http://ex.org/p> _:l0 .
_:l0 <{RDF}first> _:n0 .
_:l0 <{RDF}rest> <{RDF}nil> .
_:n0 <http://ex.org/q> "a" .
'''),

    ("reverse_multiple_objects", {}, {
        "@id": "http://ex.org/o",
        "@reverse": {"http://ex.org/p": [
            {"@id": "http://ex.org/s1"}, {"@id": "http://ex.org/s2"}]},
    }, '''
<http://ex.org/s1> <http://ex.org/p> <http://ex.org/o> .
<http://ex.org/s2> <http://ex.org/p> <http://ex.org/o> .
'''),

    ("value_object_with_index", {}, {
        "@id": "http://ex.org/s",
        "http://ex.org/p": {"@value": "v", "@index": "ignored"},
    }, '''
<http://ex.org/s> <http://ex.org/p> "v" .
'''),

    ("id_set_container", {}, {
        "@context": {"@base": "http://ex.org/",
                     "p": {"@id": "http://ex.org/p",
                           "@container": ["@id", "@set"]}},
        "@id": "http://ex.org/s",
        "p": {"o1": {"http://ex.org/q": "a"},
              "o2": {"http://ex.org/q": "b"}},
    }, '''
<http://ex.org/s> <http://ex.org/p> <http://ex.org/o1> .
<http://ex.org/s> <http://ex.org/p> <http://ex.org/o2> .
<http://ex.org/o1> <http://ex.org/q> "a" .
<http://ex.org/o2> <http://ex.org/q> "b" .
'''),

    ("language_map_with_array_and_none", {}, {
        "@context": {"label": {"@id": "http://ex.org/l",
                               "@container": "@language"}},
        "@id": "http://ex.org/s",
        "label": {"en": ["a", "b"], "@none": "plain"},
    }, '''
<http://ex.org/s> <http://ex.org/l> "a"@en .
<http://ex.org/s> <http://ex.org/l> "b"@en .
<http://ex.org/s> <http://ex.org/l> "plain" .
'''),

    ("shared_iri_node_merge", {}, {
        "@id": "http://ex.org/s",
        "http://ex.org/p": {"@id": "http://ex.org/o",
                            "http://ex.org/a": "1"},
        "http://ex.org/q": {"@id": "http://ex.org/o",
                            "http://ex.org/b": "2"},
    }, '''
<http://ex.org/s> <http://ex.org/p> <http://ex.org/o> .
<http://ex.org/s> <http://ex.org/q> <http://ex.org/o> .
<http://ex.org/o> <http://ex.org/a> "1" .
<http://ex.org/o> <http://ex.org/b> "2" .
'''),

    ("type_array_compact_iris", {}, {
        "@context": {"ex": "http://ex.org/"},
        "@id": "http://ex.org/s",
        "@type": ["ex:T1", "ex:T2"],
    }, f'''
<http://ex.org/s> <{RDF}type> <http://ex.org/T1> .
<http://ex.org/s> <{RDF}type> <http://ex.org/T2> .
'''),

    ("included_with_graph", {}, {
        "@id": "http://ex.org/s", "http://ex.org/p": "v",
        "@included": [{"@id": "http://ex.org/g",
                       "@graph": {"@id": "http://ex.org/n",
                                  "http://ex.org/q": "w"}}],
    }, '''
<http://ex.org/s> <http://ex.org/p> "v" .
<http://ex.org/n> <http://ex.org/q> "w" <http://ex.org/g> .
'''),

    ("i18n_direction_no_language", {"rdf_direction": "i18n-datatype"}, {
        "@context": {"@direction": "rtl"},
        "@id": "http://ex.org/s", "http://ex.org/p": "v",
    }, '''
<http://ex.org/s> <http://ex.org/p> "v"^^<https://www.w3.org/ns/i18n#_rtl> .
'''),

    ("doubles_in_list_canonical", {}, {
        "@id": "http://ex.org/s",
        "http://ex.org/p": {"@list": [1.5, 100000.0]},
    }, f'''
<http://ex.org/s> <http://ex.org/p> _:l0 .
_:l0 <{RDF}first> "1.5E0"^^<{XSD}double> .
_:l0 <{RDF}rest> _:l1 .
_:l1 <{RDF}first> "100000"^^<{XSD}integer> .
_:l1 <{RDF}rest> <{RDF}nil> .
'''),

    ("nested_nodes_two_bnodes", {}, {
        "http://ex.org/p": {"http://ex.org/q": {"http://ex.org/r": "v"}},
    }, '''
_:a <http://ex.org/p> _:b .
_:b <http://ex.org/q> _:c .
_:c <http://ex.org/r> "v" .
'''),

    ("property_index_container_keeps_existing", {}, {
        "@context": {"@base": "http://ex.org/",
                     "p": {"@id": "http://ex.org/p",
                           "@container": "@index",
                           "@index": "http://ex.org/prop"}},
        "@id": "http://ex.org/s",
        "p": {"i": {"@id": "o", "http://ex.org/prop": "existing"}},
    }, '''
<http://ex.org/s> <http://ex.org/p> <http://ex.org/o> .
<http://ex.org/o> <http://ex.org/prop> "i" .
<http://ex.org/o> <http://ex.org/prop> "existing" .
'''),

    ("scoped_context_on_compact_iri_term", {}, {
        "@context": {"ex": "http://ex.org/",
                     "ex:p": {"@context": {"q": "http://scoped.org/q"}}},
        "@id": "http://ex.org/s",
        "ex:p": {"@id": "http://ex.org/o", "q": "v"},
    }, '''
<http://ex.org/s> <http://ex.org/p> <http://ex.org/o> .
<http://ex.org/o> <http://scoped.org/q> "v" .
'''),

    ("null_term_definition_drops", {}, {
        "@context": {"p": None, "q": "http://ex.org/q"},
        "@id": "http://ex.org/s", "p": "dropped", "q": "kept",
    }, '''
<http://ex.org/s> <http://ex.org/q> "kept" .
'''),

    ("set_in_context_transparent", {}, {
        "@context": {"p": {"@id": "http://ex.org/p",
                           "@container": "@set"}},
        "@id": "http://ex.org/s",
        "p": "single",
    }, '''
<http://ex.org/s> <http://ex.org/p> "single" .
'''),

    ("graph_set_container", {}, {
        "@context": {"g": {"@id": "http://ex.org/g",
                           "@container": ["@graph", "@set"]}},
        "@id": "http://ex.org/s",
        "g": [{"http://ex.org/p": "v1"}, {"http://ex.org/p": "v2"}],
    }, '''
<http://ex.org/s> <http://ex.org/g> _:g1 .
<http://ex.org/s> <http://ex.org/g> _:g2 .
_:n1 <http://ex.org/p> "v1" _:g1 .
_:n2 <http://ex.org/p> "v2" _:g2 .
'''),

    ("rdfstar_annotation_on_iri_object", {}, {
        "@id": "http://ex.org/s",
        "http://ex.org/p": {
            "@id": "http://ex.org/o",
            "@annotation": {"http://ex.org/since": 2020}},
    }, f'''
<http://ex.org/s> <http://ex.org/p> <http://ex.org/o> .
<< <http://ex.org/s> <http://ex.org/p> <http://ex.org/o> >> <http://ex.org/since> "2020"^^<{XSD}integer> .
'''),

    ("free_floating_in_graph_dropped", {}, {
        "@id": "http://ex.org/g",
        "@graph": ["scalar", {"@value": "vo"},
                   {"@id": "http://ex.org/s", "http://ex.org/p": "keep"}],
    }, '''
<http://ex.org/s> <http://ex.org/p> "keep" <http://ex.org/g> .
'''),

    ("type_id_coercion_relative", {"base_iri": "http://b.org/dir/doc"}, {
        "@context": {"link": {"@id": "http://ex.org/link",
                              "@type": "@id"}},
        "@id": "http://b.org/dir/doc",
        "link": ["other", "/root", "../up", "#frag"],
    }, '''
<http://b.org/dir/doc> <http://ex.org/link> <http://b.org/dir/other> .
<http://b.org/dir/doc> <http://ex.org/link> <http://b.org/root> .
<http://b.org/dir/doc> <http://ex.org/link> <http://b.org/up> .
<http://b.org/dir/doc> <http://ex.org/link> <http://b.org/dir/doc#frag> .
'''),
]

# --- batch 2: interaction cases ---------------------------------------------

FIXTURES += [
    ("remote_context_mid_array", {"ctx_cache": {
        "http://r.org/mid": {"@context": {"b": "http://b.org/b"}}}}, {
        "@context": [{"a": "http://a.org/a"},
                     "http://r.org/mid",
                     {"c": "http://c.org/c"}],
        "@id": "http://ex.org/s", "a": "1", "b": "2", "c": "3",
    }, '''
<http://ex.org/s> <http://a.org/a> "1" .
<http://ex.org/s> <http://b.org/b> "2" .
<http://ex.org/s> <http://c.org/c> "3" .
'''),

    ("language_map_uppercase_keys", {}, {
        "@context": {"label": {"@id": "http://ex.org/l",
                               "@container": ["@language", "@set"]}},
        "@id": "http://ex.org/s",
        "label": {"EN-us": "hi"},
    }, '''
<http://ex.org/s> <http://ex.org/l> "hi"@en-us .
'''),

    ("reverse_with_index_container", {}, {
        "@context": {"kids": {"@reverse": "http://ex.org/parent",
                              "@container": "@index"}},
        "@id": "http://ex.org/dad",
        "kids": {"first": {"@id": "http://ex.org/k1"},
                 "second": {"@id": "http://ex.org/k2"}},
    }, '''
<http://ex.org/k1> <http://ex.org/parent> <http://ex.org/dad> .
<http://ex.org/k2> <http://ex.org/parent> <http://ex.org/dad> .
'''),

    ("term_via_other_term_prefix", {}, {
        "@context": {"ex": "http://ex.org/ns#",
                     "sub": "ex:sub/"},
        "@id": "http://ex.org/s",
        "ex:p": "1",
    }, '''
<http://ex.org/s> <http://ex.org/ns#p> "1" .
'''),

    ("bnode_vocab", {}, {
        "@context": {"@vocab": "_:"},
        "@id": "http://ex.org/s", "p": "v",
    }, ''),  # bnode predicates dropped without generalized RDF

    ("json_in_list", {}, {
        "@context": {"j": {"@id": "http://ex.org/j", "@type": "@json"}},
        "@id": "http://ex.org/s",
        "http://ex.org/l": {"@list": [{"@value": {"k": 1},
                                       "@type": "@json"}]},
    }, '''
<http://ex.org/s> <http://ex.org/l> _:l0 .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "{\\"k\\":1}"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON> .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
'''),

    ("chained_property_scoped", {}, {
        "@context": {"a": {"@id": "http://ex.org/a",
                           "@context": {"b": {"@id": "http://ex.org/b",
                                              "@context": {
                                                  "c": "http://deep.org/c"
                                              }}}}},
        "@id": "http://ex.org/s",
        "a": {"@id": "http://ex.org/m", "b": {"@id": "http://ex.org/n",
                                              "c": "v"}},
    }, '''
<http://ex.org/s> <http://ex.org/a> <http://ex.org/m> .
<http://ex.org/m> <http://ex.org/b> <http://ex.org/n> .
<http://ex.org/n> <http://deep.org/c> "v" .
'''),

    ("graph_alias_and_named_graph_props", {}, {
        "@context": {"g": "@graph", "n": "http://ex.org/name"},
        "@id": "http://ex.org/G", "n": "meta",
        "g": [{"@id": "http://ex.org/s", "n": "inner"}],
    }, '''
<http://ex.org/G> <http://ex.org/name> "meta" .
<http://ex.org/s> <http://ex.org/name> "inner" <http://ex.org/G> .
'''),

    ("index_on_node_object_ignored_in_rdf", {}, {
        "@id": "http://ex.org/s",
        "http://ex.org/p": {"@id": "http://ex.org/o", "@index": "idx",
                            "http://ex.org/q": "v"},
    }, '''
<http://ex.org/s> <http://ex.org/p> <http://ex.org/o> .
<http://ex.org/o> <http://ex.org/q> "v" .
'''),

    ("type_scoped_then_property_scoped", {}, {
        "@context": {
            "T": {"@id": "http://ex.org/T",
                  "@context": {"p": {"@id": "http://typed.org/p",
                                     "@context": {
                                         "q": "http://proped.org/q"}}}}},
        "@id": "http://ex.org/s", "@type": "T",
        "p": {"@id": "http://ex.org/o", "q": "v"},
    }, '''
<http://ex.org/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.org/T> .
<http://ex.org/s> <http://typed.org/p> <http://ex.org/o> .
<http://ex.org/o> <http://proped.org/q> "v" .
'''),

    ("set_of_value_objects_mixed", {}, {
        "@context": {"@language": "fr"},
        "@id": "http://ex.org/s",
        "http://ex.org/p": ["plain",
                            {"@value": "typed",
                             "@type": "http://ex.org/T"},
                            {"@value": "justvalue"},
                            42],
    }, '''
<http://ex.org/s> <http://ex.org/p> "plain"@fr .
<http://ex.org/s> <http://ex.org/p> "typed"^^<http://ex.org/T> .
<http://ex.org/s> <http://ex.org/p> "justvalue" .
<http://ex.org/s> <http://ex.org/p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
'''),

    ("keyword_aliased_reverse", {}, {
        "@context": {"rev": "@reverse"},
        "@id": "http://ex.org/o",
        "rev": {"http://ex.org/p": {"@id": "http://ex.org/s"}},
    }, '''
<http://ex.org/s> <http://ex.org/p> <http://ex.org/o> .
'''),

    ("context_propagate_false_top_level", {}, {
        "@context": {"@propagate": False, "p": "http://top.org/p"},
        "@id": "http://ex.org/s",
        "p": {"@id": "http://ex.org/o", "p": "inner"},
    }, '''
<http://ex.org/s> <http://top.org/p> <http://ex.org/o> .
'''),

    ("nested_graph_container_and_id", {}, {
        "@context": {"claims": {"@id": "http://ex.org/claims",
                                "@container": ["@graph", "@id", "@set"]}},
        "@id": "http://ex.org/s",
        "claims": {"http://ex.org/g1": {"http://ex.org/p": "a"},
                   "http://ex.org/g2": {"http://ex.org/p": "b"}},
    }, '''
<http://ex.org/s> <http://ex.org/claims> <http://ex.org/g1> .
<http://ex.org/s> <http://ex.org/claims> <http://ex.org/g2> .
_:n1 <http://ex.org/p> "a" <http://ex.org/g1> .
_:n2 <http://ex.org/p> "b" <http://ex.org/g2> .
'''),

    ("empty_string_values", {}, {
        "@id": "http://ex.org/s",
        "http://ex.org/p": "",
        "http://ex.org/q": {"@value": "", "@language": "en"},
    }, '''
<http://ex.org/s> <http://ex.org/p> "" .
<http://ex.org/s> <http://ex.org/q> ""@en .
'''),
]

# --- batch 3 ------------------------------------------------------------------

FIXTURES += [
    ("null_context_then_redefine", {}, {
        "@context": [{"p": "http://a.org/p"}, None,
                     {"p": "http://b.org/p"}],
        "@id": "http://ex.org/s", "p": "v",
    }, '''
<http://ex.org/s> <http://b.org/p> "v" .
'''),

    ("base_restored_after_null_context", {"base_iri": "http://doc.org/d"}, {
        "@context": [{"@base": "http://other.org/"}, None],
        "@id": "rel", "http://ex.org/p": "v",
    }, '''
<http://doc.org/rel> <http://ex.org/p> "v" .
'''),

    ("id_map_key_document_relative_not_term", {}, {
        # id-map keys IRI-expand document-relative with vocab=false, so the
        # term definition for "known" is NOT consulted (spec 13.8.3.7.4)
        "@context": {"@base": "http://ex.org/",
                     "p": {"@id": "http://ex.org/p", "@container": "@id"},
                     "known": "http://ex.org/known-entity"},
        "@id": "http://ex.org/s",
        "p": {"known": {"http://ex.org/q": "v"}},
    }, '''
<http://ex.org/s> <http://ex.org/p> <http://ex.org/known> .
<http://ex.org/known> <http://ex.org/q> "v" .
'''),

    ("list_container_null_entry", {}, {
        "@context": {"p": {"@id": "http://ex.org/p",
                           "@container": "@list"}},
        "@id": "http://ex.org/s",
        "p": ["a", None, "b"],
    }, '''
<http://ex.org/s> <http://ex.org/p> _:l0 .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "a" .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> _:l1 .
_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "b" .
_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
'''),

    ("vocab_term_maps_to_keyword_none_ignored_as_pred", {}, {
        "@context": {"skipme": "@none", "keep": "http://ex.org/keep"},
        "@id": "http://ex.org/s", "skipme": "x", "keep": "y",
    }, '''
<http://ex.org/s> <http://ex.org/keep> "y" .
'''),

    ("numeric_string_not_coerced", {}, {
        "@id": "http://ex.org/s",
        "http://ex.org/p": "42",
    }, '''
<http://ex.org/s> <http://ex.org/p> "42" .
'''),

    ("fragment_only_id", {"base_iri": "http://d.org/doc?q=1"}, {
        "@id": "#me", "http://ex.org/p": "v",
    }, '''
<http://d.org/doc?q=1#me> <http://ex.org/p> "v" .
'''),

    ("query_relative_id", {"base_iri": "http://d.org/doc"}, {
        "@id": "?x=2", "http://ex.org/p": "v",
    }, '''
<http://d.org/doc?x=2> <http://ex.org/p> "v" .
'''),

    ("protocol_relative_id", {"base_iri": "https://d.org/doc"}, {
        "@id": "//cdn.org/x", "http://ex.org/p": "v",
    }, '''
<https://cdn.org/x> <http://ex.org/p> "v" .
'''),
]
