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

    # -- round 2 additions -----------------------------------------------
    # Families mirror the W3C toRdf manifest groups the reference passes
    # (spec/earl-tordf.ttl): m* container maps, li* lists, e* expansion,
    # js* JSON literals, so* scoped contexts, pr* protected, in* included,
    # di* direction, c* context.

    # --- m-family: @container: @type maps --------------------------------
    ("type_map_basic", {}, {
        "@context": {"p": {"@id": "http://e/p", "@container": "@type"}},
        "@id": "http://e/s",
        "p": {"http://e/T": {"@id": "http://e/o"}},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
<http://e/o> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/T> .
'''),

    ("type_map_id_typed_strings", {}, {
        # @type map whose term is @type: @id -> string items are node refs
        "@context": {"p": {"@id": "http://e/p", "@container": "@type",
                           "@type": "@id"}},
        "@id": "http://e/s", "p": {"http://e/T": "http://e/o"},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
<http://e/o> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/T> .
'''),

    ("type_map_none_key_adds_no_type", {}, {
        "@context": {"p": {"@id": "http://e/p", "@container": "@type"}},
        "@id": "http://e/s",
        "p": {"@none": {"@id": "http://e/o", "http://e/q": "v"}},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
<http://e/o> <http://e/q> "v" .
'''),

    ("type_map_none_alias", {}, {
        "@context": {"none": "@none",
                     "p": {"@id": "http://e/p", "@container": "@type"}},
        "@id": "http://e/s",
        "p": {"none": {"@id": "http://e/o", "http://e/q": "v"}},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
<http://e/o> <http://e/q> "v" .
'''),

    ("type_map_key_term_scoped_ctx", {}, {
        # the map KEY's term definition carries a type-scoped context that
        # applies to the value (toRdf m-family / so-family interaction)
        "@context": {"p": {"@id": "http://e/p", "@container": "@type"},
                     "T": {"@id": "http://e/T",
                           "@context": {"inner": "http://e/inner"}}},
        "@id": "http://e/s",
        "p": {"T": {"@id": "http://e/o", "inner": "v"}},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
<http://e/o> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/T> .
<http://e/o> <http://e/inner> "v" .
'''),

    ("type_map_vocab_key_expansion", {}, {
        "@context": {"@vocab": "http://v/",
                     "p": {"@id": "http://e/p", "@container": "@type"}},
        "@id": "http://e/s", "p": {"T": {"@id": "http://e/o"}},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
<http://e/o> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://v/T> .
'''),

    # --- m-family: @container: @id maps ----------------------------------
    ("id_map_basic", {}, {
        "@context": {"p": {"@id": "http://e/p", "@container": "@id"}},
        "@id": "http://e/s",
        "p": {"http://e/o": {"http://e/q": "v"}},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
<http://e/o> <http://e/q> "v" .
'''),

    ("id_map_none_key_is_bnode", {}, {
        "@context": {"p": {"@id": "http://e/p", "@container": "@id"}},
        "@id": "http://e/s", "p": {"@none": {"http://e/q": "v"}},
    }, '''
<http://e/s> <http://e/p> _:b0 .
_:b0 <http://e/q> "v" .
'''),

    ("id_map_relative_keys", {"base_iri": "http://b.org/dir/doc"}, {
        "@context": {"p": {"@id": "http://e/p", "@container": "@id"}},
        "@id": "http://e/s", "p": {"item": {"http://e/q": "v"}},
    }, '''
<http://e/s> <http://e/p> <http://b.org/dir/item> .
<http://b.org/dir/item> <http://e/q> "v" .
'''),

    ("id_map_inner_id_wins_consistency", {}, {
        # key and inner @id refer to the same node -> merged
        "@context": {"p": {"@id": "http://e/p", "@container": "@id"}},
        "@id": "http://e/s",
        "p": {"http://e/o": {"@id": "http://e/o", "http://e/q": "v"}},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
<http://e/o> <http://e/q> "v" .
'''),

    # --- pi-family: property-based index --------------------------------
    ("property_index_emits_key_as_property", {}, {
        "@context": {"p": {"@id": "http://e/p", "@container": "@index",
                           "@index": "http://e/prop"}},
        "@id": "http://e/s", "p": {"k1": {"@id": "http://e/o1"}},
    }, '''
<http://e/s> <http://e/p> <http://e/o1> .
<http://e/o1> <http://e/prop> "k1" .
'''),

    ("plain_index_map_keys_dropped", {}, {
        "@context": {"p": {"@id": "http://e/p", "@container": "@index"}},
        "@id": "http://e/s",
        "p": {"i1": {"@id": "http://e/a"}, "i2": {"@id": "http://e/b"}},
    }, '''
<http://e/s> <http://e/p> <http://e/a> .
<http://e/s> <http://e/p> <http://e/b> .
'''),

    # --- language maps ---------------------------------------------------
    ("language_map_none_key_plain", {}, {
        "@context": {"p": {"@id": "http://e/p", "@container": "@language"}},
        "@id": "http://e/s", "p": {"en": "hi", "@none": "plain"},
    }, '''
<http://e/s> <http://e/p> "hi"@en .
<http://e/s> <http://e/p> "plain" .
'''),

    ("language_map_array_values", {}, {
        "@context": {"p": {"@id": "http://e/p", "@container": "@language"}},
        "@id": "http://e/s", "p": {"de": ["a", "b"]},
    }, '''
<http://e/s> <http://e/p> "a"@de .
<http://e/s> <http://e/p> "b"@de .
'''),

    # --- graph containers -------------------------------------------------
    ("graph_container_keeps_value_id", {}, {
        # @container: @graph wraps the node in a fresh bnode-named graph;
        # the node keeps its own @id
        "@context": {"g": {"@id": "http://e/g", "@container": "@graph"}},
        "@id": "http://e/s",
        "g": {"@id": "http://e/n", "http://e/q": "v"},
    }, '''
<http://e/s> <http://e/g> _:g .
<http://e/n> <http://e/q> "v" _:g .
'''),

    ("graph_index_container_drops_index", {}, {
        "@context": {"g": {"@id": "http://e/g",
                           "@container": ["@graph", "@index"]}},
        "@id": "http://e/s",
        "g": {"i1": {"@id": "http://e/n", "http://e/q": "v"}},
    }, '''
<http://e/s> <http://e/g> _:g .
<http://e/n> <http://e/q> "v" _:g .
'''),

    ("graph_id_container_named", {}, {
        "@context": {"g": {"@id": "http://e/g",
                           "@container": ["@graph", "@id"]}},
        "@id": "http://e/s",
        "g": {"http://e/G1": {"@id": "http://e/n", "http://e/q": "v"}},
    }, '''
<http://e/s> <http://e/g> <http://e/G1> .
<http://e/n> <http://e/q> "v" <http://e/G1> .
'''),

    ("graph_id_container_none_key", {}, {
        "@context": {"g": {"@id": "http://e/g",
                           "@container": ["@graph", "@id"]}},
        "@id": "http://e/s",
        "g": {"@none": {"@id": "http://e/n", "http://e/q": "v"}},
    }, '''
<http://e/s> <http://e/g> _:g .
<http://e/n> <http://e/q> "v" _:g .
'''),

    # --- li-family: lists -------------------------------------------------
    ("list_nested_lists", {}, {
        "@id": "http://e/s",
        "http://e/p": {"@list": [{"@list": ["a"]}]},
    }, '''
<http://e/s> <http://e/p> _:outer .
_:outer <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> _:inner .
_:outer <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
_:inner <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "a" .
_:inner <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
'''),

    ("list_empty_nested_is_nil_first", {}, {
        "@id": "http://e/s",
        "http://e/p": {"@list": [{"@list": []}]},
    }, '''
<http://e/s> <http://e/p> _:l .
_:l <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
_:l <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
'''),

    ("list_with_index_ignored", {}, {
        "@id": "http://e/s",
        "http://e/p": {"@list": ["a"], "@index": "i"},
    }, '''
<http://e/s> <http://e/p> _:l .
_:l <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "a" .
_:l <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
'''),

    ("list_container_nested_arrays", {}, {
        # @container: @list on term: outer array IS the list; a doubly
        # nested array makes a list of lists (JSON-LD 1.1)
        "@context": {"p": {"@id": "http://e/p", "@container": "@list"}},
        "@id": "http://e/s", "p": [["a"]],
    }, '''
<http://e/s> <http://e/p> _:outer .
_:outer <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> _:inner .
_:outer <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
_:inner <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "a" .
_:inner <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
'''),

    ("free_floating_list_in_graph_dropped", {}, {
        # expansion step 19: a map containing only @list is free-floating
        "@graph": [{"@list": ["v"]},
                   {"@id": "http://e/s", "http://e/p": "x"}],
    }, '''
<http://e/s> <http://e/p> "x" .
'''),

    ("list_of_node_objects", {}, {
        "@id": "http://e/s",
        "http://e/p": {"@list": [{"@id": "http://e/a", "http://e/q": "1"},
                                 {"@id": "http://e/b"}]},
    }, '''
<http://e/s> <http://e/p> _:l0 .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> <http://e/a> .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> _:l1 .
_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> <http://e/b> .
_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
<http://e/a> <http://e/q> "1" .
'''),

    # --- e-family: relative IRI resolution (RFC 3986 section 5.4) --------
    ("rfc3986_dot_segment", {"base_iri": "http://a/b/c/d;p?q"}, {
        "@id": "./g", "http://e/p": "v",
    }, '''
<http://a/b/c/g> <http://e/p> "v" .
'''),

    ("rfc3986_dotdot", {"base_iri": "http://a/b/c/d;p?q"}, {
        "@id": "../g", "http://e/p": "v",
    }, '''
<http://a/b/g> <http://e/p> "v" .
'''),

    ("rfc3986_excess_dotdots_clamp", {"base_iri": "http://a/b/c/d;p?q"}, {
        "@id": "../../../../g", "http://e/p": "v",
    }, '''
<http://a/g> <http://e/p> "v" .
'''),

    ("rfc3986_empty_ref_is_base", {"base_iri": "http://a/b/c/d;p?q"}, {
        "@id": "", "http://e/p": "v",
    }, '''
<http://a/b/c/d;p?q> <http://e/p> "v" .
'''),

    ("rfc3986_query_only", {"base_iri": "http://a/b/c/d;p?q"}, {
        "@id": "?y", "http://e/p": "v",
    }, '''
<http://a/b/c/d;p?y> <http://e/p> "v" .
'''),

    ("rfc3986_network_path", {"base_iri": "http://a/b/c/d;p?q"}, {
        "@id": "//g", "http://e/p": "v",
    }, '''
<http://g> <http://e/p> "v" .
'''),

    ("rfc3986_mid_dot_segments", {"base_iri": "http://a/b/c/d;p?q"}, {
        "@id": "g/./h", "http://e/p": "v",
    }, '''
<http://a/b/c/g/h> <http://e/p> "v" .
'''),

    ("rfc3986_mid_dotdot_segments", {"base_iri": "http://a/b/c/d;p?q"}, {
        "@id": "g/../h", "http://e/p": "v",
    }, '''
<http://a/b/c/h> <http://e/p> "v" .
'''),

    ("rfc3986_trailing_dot_name", {"base_iri": "http://a/b/c/d;p?q"}, {
        "@id": "g.", "http://e/p": "v",
    }, '''
<http://a/b/c/g.> <http://e/p> "v" .
'''),

    ("rfc3986_semicolon_params", {"base_iri": "http://a/b/c/d;p?q"}, {
        "@id": "g;x=1/./y", "http://e/p": "v",
    }, '''
<http://a/b/c/g;x=1/y> <http://e/p> "v" .
'''),

    ("base_in_context_with_query", {}, {
        "@context": {"@base": "http://x/y?q"},
        "@id": "z", "http://e/p": "v",
    }, '''
<http://x/z> <http://e/p> "v" .
'''),

    # --- js-family: @json literals (RFC 8785 canonicalization) -----------
    ("json_literal_sorted_keys", {}, {
        "@context": {"j": {"@id": "http://e/j", "@type": "@json"}},
        "@id": "http://e/s", "j": {"b": 2, "a": 1},
    }, '''
<http://e/s> <http://e/j> "{\\"a\\":1,\\"b\\":2}"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON> .
'''),

    ("json_literal_array_order_preserved", {}, {
        "@context": {"j": {"@id": "http://e/j", "@type": "@json"}},
        "@id": "http://e/s", "j": [2, 1],
    }, '''
<http://e/s> <http://e/j> "[2,1]"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON> .
'''),

    ("json_literal_scalars", {}, {
        "@context": {"j": {"@id": "http://e/j", "@type": "@json"}},
        "@id": "http://e/s",
        # tjs01/02/05/17: boolean true, boolean false, integer, string
        "j": [True, False, None, 42, "str", 1.5e10],
    }, '''
<http://e/s> <http://e/j> "[true,false,null,42,\\"str\\",15000000000]"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON> .
'''),

    ("json_literal_keywords_not_special", {}, {
        # inside an @json value, @id etc. are plain JSON keys
        "@context": {"j": {"@id": "http://e/j", "@type": "@json"}},
        "@id": "http://e/s", "j": {"@id": "not-an-iri"},
    }, '''
<http://e/s> <http://e/j> "{\\"@id\\":\\"not-an-iri\\"}"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON> .
'''),

    ("json_literal_via_value_type", {}, {
        "@id": "http://e/s",
        "http://e/j": {"@value": {"x": [1]}, "@type": "@json"},
    }, '''
<http://e/s> <http://e/j> "{\\"x\\":[1]}"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON> .
'''),

    # --- nt-family: native types ------------------------------------------
    ("native_double_e21_boundary", {}, {
        "@id": "http://e/s", "http://e/p": [1e21, 1e22],
    }, '''
<http://e/s> <http://e/p> "1.0E21"^^<http://www.w3.org/2001/XMLSchema#double> .
<http://e/s> <http://e/p> "1.0E22"^^<http://www.w3.org/2001/XMLSchema#double> .
'''),

    ("native_negative_zero_is_integer_zero", {}, {
        # reference Util.ts:545 — value % 1 === 0 -> integer; String(-0)='0'
        "@id": "http://e/s", "http://e/p": -0.0,
    }, '''
<http://e/s> <http://e/p> "0"^^<http://www.w3.org/2001/XMLSchema#integer> .
'''),

    ("native_integral_double_to_integer", {}, {
        # 1.1e1 is integral -> xsd:integer "11" (reference semantics)
        "@id": "http://e/s", "http://e/p": 1.1e1,
    }, '''
<http://e/s> <http://e/p> "11"^^<http://www.w3.org/2001/XMLSchema#integer> .
'''),

    ("native_int_coerced_double", {}, {
        "@id": "http://e/s",
        "http://e/p": {"@value": 1,
                       "@type": "http://www.w3.org/2001/XMLSchema#double"},
    }, '''
<http://e/s> <http://e/p> "1.0E0"^^<http://www.w3.org/2001/XMLSchema#double> .
'''),

    ("native_bool_coerced_integer_keeps_lexical", {}, {
        # explicit datatype wins; lexical form is the JSON lexical
        "@id": "http://e/s",
        "http://e/p": {"@value": True,
                       "@type": "http://e/dt"},
    }, '''
<http://e/s> <http://e/p> "true"^^<http://e/dt> .
'''),

    ("xsd_string_explicit_type_is_plain", {}, {
        # "v"^^xsd:string IS the plain literal term in RDF 1.1
        "@id": "http://e/s",
        "http://e/p": {"@value": "v",
                       "@type": "http://www.w3.org/2001/XMLSchema#string"},
    }, '''
<http://e/s> <http://e/p> "v" .
'''),

    # --- so-family: scoped contexts ---------------------------------------
    ("property_scoped_ctx_defines_terms", {}, {
        "@context": {"p": {"@id": "http://e/p",
                           "@context": {"inner": "http://e/inner"}}},
        "@id": "http://e/s", "p": {"inner": "v"},
    }, '''
<http://e/s> <http://e/p> _:b0 .
_:b0 <http://e/inner> "v" .
'''),

    ("property_scoped_ctx_propagates", {}, {
        # property-scoped contexts propagate to nested nodes (unlike
        # type-scoped ones)
        "@context": {"p": {"@id": "http://e/p",
                           "@context": {"inner": "http://e/inner"}}},
        "@id": "http://e/s",
        "p": {"inner": {"@id": "http://e/n", "inner": "deep"}},
    }, '''
<http://e/s> <http://e/p> _:b0 .
_:b0 <http://e/inner> <http://e/n> .
<http://e/n> <http://e/inner> "deep" .
'''),

    ("type_scoped_ctx_does_not_propagate", {}, {
        "@context": {"T": {"@id": "http://e/T",
                           "@context": {"x": "http://e/x"}},
                     "q": "http://e/q"},
        "@id": "http://e/s", "@type": "T", "x": "1",
        "q": {"@id": "http://e/n", "x": "2"},
    }, '''
<http://e/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/T> .
<http://e/s> <http://e/x> "1" .
<http://e/s> <http://e/q> <http://e/n> .
'''),

    ("type_scoped_lexicographic_order", {}, {
        # multiple types: scoped contexts applied in lexicographic order of
        # the ORIGINAL type strings; later overrides earlier
        "@context": {"A": {"@id": "http://e/A",
                           "@context": {"x": "http://e/xA"}},
                     "B": {"@id": "http://e/B",
                           "@context": {"x": "http://e/xB"}}},
        "@id": "http://e/s", "@type": ["B", "A"], "x": "v",
    }, '''
<http://e/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/A> .
<http://e/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/B> .
<http://e/s> <http://e/xB> "v" .
'''),

    ("type_scoped_null_ctx_resets", {}, {
        "@context": {"@vocab": "http://v/",
                     "T": {"@id": "http://v/T", "@context": None}},
        "@id": "http://e/s", "@type": "T", "p": "dropped",
    }, '''
<http://e/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://v/T> .
'''),

    ("property_scoped_overrides_protected", {}, {
        # the ONE place protected terms may be overridden: property-scoped
        # contexts (JSON-LD 1.1 section 4.1.11)
        "@context": {"@protected": True, "t": "http://e/t",
                     "p": {"@id": "http://e/p",
                           "@context": {"t": "http://e/t2"}}},
        "@id": "http://e/s", "p": {"t": "v"},
    }, '''
<http://e/s> <http://e/p> _:b0 .
_:b0 <http://e/t2> "v" .
'''),

    ("protected_redefinition_identical_ok", {}, {
        "@context": [{"@protected": True, "t": "http://e/t"},
                     {"t": "http://e/t"}],
        "@id": "http://e/s", "t": "v",
    }, '''
<http://e/s> <http://e/t> "v" .
'''),

    # --- c-family: @import -------------------------------------------------
    ("import_merges_local_wins", {"ctx_cache": {
        "https://c/i": {"@context": {"a": "http://e/a",
                                     "b": "http://e/WRONG"}}}}, {
        "@context": {"@import": "https://c/i", "b": "http://e/b"},
        "@id": "http://e/s", "a": "1", "b": "2",
    }, '''
<http://e/s> <http://e/a> "1" .
<http://e/s> <http://e/b> "2" .
'''),

    ("import_with_protected_wrapper", {"ctx_cache": {
        "https://c/i": {"@context": {"t": "http://e/t"}}}}, {
        # the @import use case: retrofit @protected onto an existing
        # remote context's terms
        "@context": {"@import": "https://c/i", "@protected": True},
        "@id": "http://e/s", "t": "v",
    }, '''
<http://e/s> <http://e/t> "v" .
'''),

    # --- in-family: @included ----------------------------------------------
    ("included_basic", {}, {
        "@id": "http://e/s", "http://e/p": "v",
        "@included": [{"@id": "http://e/t", "http://e/q": "w"}],
    }, '''
<http://e/s> <http://e/p> "v" .
<http://e/t> <http://e/q> "w" .
'''),

    ("included_nested", {}, {
        "@id": "http://e/s", "http://e/p": "v",
        "@included": {"@id": "http://e/t", "http://e/q": "w",
                      "@included": {"@id": "http://e/u",
                                    "http://e/r": "x"}},
    }, '''
<http://e/s> <http://e/p> "v" .
<http://e/t> <http://e/q> "w" .
<http://e/u> <http://e/r> "x" .
'''),

    ("included_alias", {}, {
        "@context": {"also": "@included"},
        "@id": "http://e/s", "http://e/p": "v",
        "also": {"@id": "http://e/t", "http://e/q": "w"},
    }, '''
<http://e/s> <http://e/p> "v" .
<http://e/t> <http://e/q> "w" .
'''),

    # --- value objects / language ------------------------------------------
    ("value_null_dropped", {}, {
        "@id": "http://e/s", "http://e/p": [{"@value": None}, "k"],
    }, '''
<http://e/s> <http://e/p> "k" .
'''),

    ("language_tag_case_preserved_lowercased", {}, {
        # toRdf emits language tags lowercase (well-formed literal rule)
        "@id": "http://e/s",
        "http://e/p": {"@value": "x", "@language": "EN-us"},
    }, '''
<http://e/s> <http://e/p> "x"@en-us .
'''),

    ("default_language_applies_to_strings", {}, {
        # NB: "@language": null inside a VALUE OBJECT is an error per
        # expansion step 13.4.6 (must be a string); null-suppression is
        # term-definition-only (see null_language_override_in_term)
        "@context": {"@language": "fr"},
        "@id": "http://e/s",
        "http://e/p": ["a", {"@value": 7}],
    }, '''
<http://e/s> <http://e/p> "a"@fr .
<http://e/s> <http://e/p> "7"^^<http://www.w3.org/2001/XMLSchema#integer> .
'''),

    ("null_language_override_in_term", {}, {
        "@context": {"@language": "fr",
                     "p": {"@id": "http://e/p", "@language": None}},
        "@id": "http://e/s", "p": "plain",
    }, '''
<http://e/s> <http://e/p> "plain" .
'''),

    # --- e-family: @reverse -------------------------------------------------
    ("reverse_term_definition", {}, {
        "@context": {"children": {"@reverse": "http://e/parent"}},
        "@id": "http://e/s",
        "children": [{"@id": "http://e/a"}, {"@id": "http://e/b"}],
    }, '''
<http://e/a> <http://e/parent> <http://e/s> .
<http://e/b> <http://e/parent> <http://e/s> .
'''),

    ("double_reverse_cancels_out", {}, {
        "@context": {"r": {"@reverse": "http://e/p"}},
        "@id": "http://e/s", "@reverse": {"r": {"@id": "http://e/o"}},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
'''),

    ("reverse_and_forward_same_node", {}, {
        "@id": "http://e/s", "http://e/p": {"@id": "http://e/o"},
        "@reverse": {"http://e/q": {"@id": "http://e/r"}},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
<http://e/r> <http://e/q> <http://e/s> .
'''),

    # --- n-family: @nest -----------------------------------------------------
    ("nest_alias_flattens", {}, {
        "@context": {"meta": "@nest", "p": "http://e/p"},
        "@id": "http://e/s", "meta": {"p": "v"},
    }, '''
<http://e/s> <http://e/p> "v" .
'''),

    ("nest_array_of_maps", {}, {
        "@context": {"p": "http://e/p"},
        "@id": "http://e/s", "@nest": [{"p": "1"}, {"p": "2"}],
    }, '''
<http://e/s> <http://e/p> "1" .
<http://e/s> <http://e/p> "2" .
'''),

    ("nest_nested_in_nest", {}, {
        "@context": {"meta": "@nest", "p": "http://e/p"},
        "@id": "http://e/s", "meta": {"meta": {"p": "v"}},
    }, '''
<http://e/s> <http://e/p> "v" .
'''),

    # --- wf-family: generalized RDF / bnode predicates ----------------------
    ("bnode_predicate_dropped_by_default", {}, {
        "@id": "http://e/s", "_:p": "v", "http://e/q": "k",
    }, '''
<http://e/s> <http://e/q> "k" .
'''),

    ("bnode_predicate_generalized_rdf", {"produce_generalized_rdf": True}, {
        "@id": "http://e/s", "_:p": "v",
    }, '''
<http://e/s> _:p "v" .
'''),

    # --- di-family: base direction -------------------------------------------
    ("direction_ignored_without_rdf_direction", {}, {
        "@id": "http://e/s",
        "http://e/p": {"@value": "x", "@language": "ar", "@direction": "rtl"},
    }, '''
<http://e/s> <http://e/p> "x"@ar .
'''),

    ("direction_i18n_no_language", {"rdf_direction": "i18n-datatype"}, {
        "@id": "http://e/s",
        "http://e/p": {"@value": "x", "@direction": "rtl"},
    }, '''
<http://e/s> <http://e/p> "x"^^<https://www.w3.org/ns/i18n#_rtl> .
'''),

    ("direction_context_defaults_i18n", {"rdf_direction": "i18n-datatype"}, {
        "@context": {"@direction": "rtl", "@language": "he"},
        "@id": "http://e/s", "http://e/p": "x",
    }, '''
<http://e/s> <http://e/p> "x"^^<https://www.w3.org/ns/i18n#he_rtl> .
'''),

    ("direction_compound_literal", {"rdf_direction": "compound-literal"}, {
        "@id": "http://e/s",
        "http://e/p": {"@value": "x", "@direction": "rtl"},
    }, '''
<http://e/s> <http://e/p> _:c .
_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#value> "x" .
_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#direction> "rtl" .
'''),

    # --- c-family: prefixes, term precedence, keyword aliases ----------------
    ("prefix_false_blocks_compact_iri", {}, {
        # term with @prefix: false may not be used as a compact-IRI prefix;
        # 'pre:x' then reads as an absolute IRI with scheme 'pre'
        "@context": {"pre": {"@id": "http://e/pre#", "@prefix": False},
                     "p": "http://e/p"},
        "@id": "http://e/s", "p": {"@id": "pre:x"},
    }, '''
<http://e/s> <http://e/p> <pre:x> .
'''),

    ("prefix_true_expands_compact_iri", {}, {
        "@context": {"pre": {"@id": "http://e/pre#", "@prefix": True}},
        "@id": "http://e/s", "pre:x": "v",
    }, '''
<http://e/s> <http://e/pre#x> "v" .
'''),

    ("undefined_prefix_kept_as_iri", {}, {
        # 'ex:p' with no matching term: scheme-bearing IRI, kept verbatim
        "@id": "http://e/s", "ex:p": "v",
    }, '''
<http://e/s> <ex:p> "v" .
'''),

    ("keyword_aliases_id_type", {}, {
        "@context": {"id": "@id", "type": "@type"},
        "id": "http://e/s", "type": "http://e/T",
    }, '''
<http://e/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/T> .
'''),

    ("keyword_alias_graph", {}, {
        "@context": {"g": "@graph"},
        "@id": "http://e/G",
        "g": {"@id": "http://e/s", "http://e/p": "v"},
    }, '''
<http://e/s> <http://e/p> "v" <http://e/G> .
'''),

    ("keyword_alias_value_language", {}, {
        "@context": {"v": "@value", "l": "@language"},
        "@id": "http://e/s", "http://e/p": {"v": "x", "l": "en"},
    }, '''
<http://e/s> <http://e/p> "x"@en .
'''),

    ("keyword_like_term_ignored_silently", {}, {
        # '@ignoreMe' has keyword form -> dropped, not an error
        "@context": {"p": "http://e/p"},
        "@id": "http://e/s", "@ignoreMe": "v", "p": "k",
    }, '''
<http://e/s> <http://e/p> "k" .
'''),

    ("vocab_and_absolute_term_coexist", {}, {
        "@context": {"@vocab": "http://v/", "p": {"@id": "http://e/p"}},
        "@id": "http://e/s", "p": "v", "other": "w",
    }, '''
<http://e/s> <http://e/p> "v" .
<http://e/s> <http://v/other> "w" .
'''),

    ("type_alias_with_set_container", {}, {
        "@context": {"type": {"@id": "@type", "@container": "@set"}},
        "@id": "http://e/s", "type": ["http://e/T"],
    }, '''
<http://e/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/T> .
'''),

    ("propagate_true_on_type_scoped", {}, {
        # @propagate: true makes a type-scoped context behave like a
        # property-scoped one (JSON-LD 1.1 section 4.1.8)
        "@context": {"T": {"@id": "http://e/T",
                           "@context": {"@propagate": True,
                                        "x": "http://e/x"}},
                     "q": "http://e/q"},
        "@id": "http://e/s", "@type": "T",
        "q": {"@id": "http://e/n", "x": "2"},
    }, '''
<http://e/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/T> .
<http://e/s> <http://e/q> <http://e/n> .
<http://e/n> <http://e/x> "2" .
'''),

    # --- value objects / @index --------------------------------------------
    ("node_index_dropped_in_tordf", {}, {
        "@id": "http://e/s",
        "http://e/p": {"@id": "http://e/o", "@index": "idx"},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
'''),

    ("set_with_index_unwraps", {}, {
        "@id": "http://e/s",
        "http://e/p": {"@set": ["a"], "@index": "i"},
    }, '''
<http://e/s> <http://e/p> "a" .
'''),

    ("graph_set_container_with_index", {}, {
        "@context": {"g": {"@id": "http://e/g",
                           "@container": ["@graph", "@set"]}},
        "@id": "http://e/s", "g": [{"http://e/q": "v"}],
    }, '''
<http://e/s> <http://e/g> _:g .
_:n <http://e/q> "v" _:g .
'''),

    ("empty_graph_no_quads", {}, {
        "@id": "http://e/s", "@graph": [],
    }, ''),

    # --- star-family: RDF-star embedded nodes / annotations ------------------
    ("star_annotation_on_iri_object", {}, {
        "@id": "http://e/s",
        "http://e/p": {"@id": "http://e/o",
                       "@annotation": {"http://e/certainty": 0.8}},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
<< <http://e/s> <http://e/p> <http://e/o> >> <http://e/certainty> "8.0E-1"^^<http://www.w3.org/2001/XMLSchema#double> .
'''),

    ("star_embedded_subject", {}, {
        "@id": {"@id": "http://e/s2", "http://e/p2": "v2"},
        "http://e/p": "v",
    }, '''
<< <http://e/s2> <http://e/p2> "v2" >> <http://e/p> "v" .
'''),

    # --- final batch: graphs, coercions, node-map merging ---------------------
    ("graph_in_graph_nesting", {}, {
        # inner @graph contents attributed to the INNER graph name; the
        # empty g2 node contributes no quads to g1
        "@id": "http://e/g1",
        "@graph": {"@id": "http://e/g2",
                   "@graph": {"@id": "http://e/s", "http://e/p": "v"}},
    }, '''
<http://e/s> <http://e/p> "v" <http://e/g2> .
'''),

    ("same_subject_merged_across_array", {}, [
        {"@id": "http://e/s", "http://e/p": "1"},
        {"@id": "http://e/s", "http://e/q": "2"},
    ], '''
<http://e/s> <http://e/p> "1" .
<http://e/s> <http://e/q> "2" .
'''),

    ("vocab_coercion_on_string", {}, {
        "@context": {"@vocab": "http://v/",
                     "p": {"@id": "http://e/p", "@type": "@vocab"}},
        "@id": "http://e/s", "p": "Bob",
    }, '''
<http://e/s> <http://e/p> <http://v/Bob> .
'''),

    ("id_coercion_resolves_relative", {"base_iri": "http://b/dir/doc"}, {
        "@context": {"p": {"@id": "http://e/p", "@type": "@id"}},
        "@id": "http://e/s", "p": "rel",
    }, '''
<http://e/s> <http://e/p> <http://b/dir/rel> .
'''),

    ("datatype_coercion_keeps_json_lexical", {}, {
        "@context": {"p": {"@id": "http://e/p", "@type": "http://e/dt"}},
        "@id": "http://e/s", "p": 5,
    }, '''
<http://e/s> <http://e/p> "5"^^<http://e/dt> .
'''),

    ("default_language_skips_non_strings", {}, {
        "@context": {"@language": "fr"},
        "@id": "http://e/s", "http://e/q": 5,
    }, '''
<http://e/s> <http://e/q> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .
'''),

    ("free_floating_bnode_with_props_kept", {}, {
        "@graph": [{"http://e/p": "v"}],
    }, '''
_:b0 <http://e/p> "v" .
'''),

    ("free_floating_id_only_node_dropped", {}, {
        "@graph": [{"@id": "http://e/lonely"},
                   {"@id": "http://e/s", "http://e/p": "x"}],
    }, '''
<http://e/s> <http://e/p> "x" .
'''),

    ("list_of_language_tagged_values", {}, {
        "@id": "http://e/s",
        "http://e/p": {"@list": [{"@value": "x", "@language": "de"}]},
    }, '''
<http://e/s> <http://e/p> _:l .
_:l <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "x"@de .
_:l <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
'''),

    ("set_inside_list_flattens", {}, {
        "@id": "http://e/s",
        "http://e/p": {"@list": [{"@set": ["a", "b"]}]},
    }, '''
<http://e/s> <http://e/p> _:l0 .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "a" .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> _:l1 .
_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "b" .
_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
'''),

    ("default_graph_option", {"default_graph": "<http://e/DG>"}, {
        "@id": "http://e/s", "http://e/p": "v",
        "@graph": [{"@id": "http://e/n", "http://e/q": "w"}],
    }, '''
<http://e/s> <http://e/p> "v" <http://e/DG> .
<http://e/n> <http://e/q> "w" <http://e/s> .
'''),

    ("malformed_bcp47_dropped_leniently", {}, {
        # not well-formed language tags: lenient mode warns and DROPS the
        # value (reference Util.ts:360-366 — emitting "@en_us" would be
        # invalid N-Triples); strict mode errors (negative battery)
        "@id": "http://e/s",
        "http://e/p": {"@value": "x", "@language": "en_US"},
    }, ''),

    ("list_of_nulls_is_nil", {}, {
        "@id": "http://e/s", "http://e/p": {"@list": [None, None]},
    }, '''
<http://e/s> <http://e/p> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
'''),

    ("explicit_boolean_datatype", {}, {
        "@id": "http://e/s",
        "http://e/p": {"@value": False,
                       "@type": "http://www.w3.org/2001/XMLSchema#boolean"},
    }, '''
<http://e/s> <http://e/p> "false"^^<http://www.w3.org/2001/XMLSchema#boolean> .
'''),

    ("list_inside_named_graph", {}, {
        "@id": "http://e/g",
        "@graph": [{"@id": "http://e/s", "http://e/p": {"@list": ["a"]}}],
    }, '''
<http://e/s> <http://e/p> _:l <http://e/g> .
_:l <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "a" <http://e/g> .
_:l <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> <http://e/g> .
'''),

    ("reverse_inside_named_graph", {}, {
        "@id": "http://e/g",
        "@graph": {"@id": "http://e/s",
                   "@reverse": {"http://e/p": {"@id": "http://e/o"}}},
    }, '''
<http://e/o> <http://e/p> <http://e/s> <http://e/g> .
'''),

    ("type_map_multiple_keys", {}, {
        "@context": {"p": {"@id": "http://e/p", "@container": "@type"}},
        "@id": "http://e/s",
        "p": {"http://e/A": {"@id": "http://e/x"},
              "http://e/B": {"@id": "http://e/y"}},
    }, '''
<http://e/s> <http://e/p> <http://e/x> .
<http://e/s> <http://e/p> <http://e/y> .
<http://e/x> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/A> .
<http://e/y> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/B> .
'''),

    ("fractional_double_canonicals", {}, {
        "@id": "http://e/s", "http://e/p": [0.5, 2.675],
    }, '''
<http://e/s> <http://e/p> "5.0E-1"^^<http://www.w3.org/2001/XMLSchema#double> .
<http://e/s> <http://e/p> "2.675E0"^^<http://www.w3.org/2001/XMLSchema#double> .
'''),

    ("annotation_on_reverse_edge", {}, {
        # @annotation on a node under @reverse asserts on the REVERSED
        # quad (the reference buffers annotations with the reverse flag,
        # EntryHandlerPredicate.ts:96-105)
        "@id": "http://e/a",
        "@reverse": {"http://e/p": {"@id": "http://e/b",
                                    "@annotation": {"http://e/c": 1}}},
    }, '''
<http://e/b> <http://e/p> <http://e/a> .
<< <http://e/b> <http://e/p> <http://e/a> >> <http://e/c> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .
'''),

    ("annotation_keyword_alias", {}, {
        "@context": {"note": "@annotation"},
        "@id": "http://e/s",
        "http://e/p": {"@id": "http://e/o", "note": {"http://e/q": "v"}},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
<< <http://e/s> <http://e/p> <http://e/o> >> <http://e/q> "v" .
'''),

    ("graph_id_set_container_combo", {}, {
        "@context": {"g": {"@id": "http://e/g",
                           "@container": ["@graph", "@id", "@set"]}},
        "@id": "http://e/s",
        "g": {"http://e/G": [{"http://e/q": "v"}]},
    }, '''
<http://e/s> <http://e/g> <http://e/G> .
_:n <http://e/q> "v" <http://e/G> .
'''),

    ("reverse_term_set_container", {}, {
        "@context": {"r": {"@reverse": "http://e/p", "@container": "@set"}},
        "@id": "http://e/s",
        "r": [{"@id": "http://e/o1"}, {"@id": "http://e/o2"}],
    }, '''
<http://e/o1> <http://e/p> <http://e/s> .
<http://e/o2> <http://e/p> <http://e/s> .
'''),

    ("duplicate_node_objects_collapse", {}, [
        {"@id": "http://e/s", "http://e/p": "v"},
        {"@id": "http://e/s", "http://e/p": "v"},
    ], '''
<http://e/s> <http://e/p> "v" .
'''),

    ("annotation_on_language_literal", {}, {
        "@id": "http://e/s",
        "http://e/p": {"@value": "x", "@language": "en",
                       "@annotation": {"http://e/q": "y"}},
    }, '''
<http://e/s> <http://e/p> "x"@en .
<< <http://e/s> <http://e/p> "x"@en >> <http://e/q> "y" .
'''),

    ("compound_literal_inside_graph_container",
     {"rdf_direction": "compound-literal"}, {
        "@context": {"g": {"@id": "http://e/g", "@container": "@graph"}},
        "@id": "http://e/s",
        "g": {"http://e/q": {"@value": "x", "@direction": "ltr"}},
    }, '''
<http://e/s> <http://e/g> _:g .
_:n <http://e/q> _:c _:g .
_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#value> "x" _:g .
_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#direction> "ltr" _:g .
'''),

    ("type_map_key_document_relative", {"base_iri": "http://b/z/doc"}, {
        # with no vocab, @type-map keys expand document-relative
        "@context": {"p": {"@id": "http://e/p", "@container": "@type",
                           "@type": "@id"}},
        "@id": "http://e/s", "p": {"T": "relobj"},
    }, '''
<http://e/s> <http://e/p> <http://b/z/relobj> .
<http://b/z/relobj> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://b/z/T> .
'''),

    ("included_node_carrying_graph", {}, {
        "@id": "http://e/s", "http://e/p": "v",
        "@included": [{"@id": "http://e/g1",
                       "@graph": [{"@id": "http://e/n",
                                   "http://e/q": "w"}]}],
    }, '''
<http://e/s> <http://e/p> "v" .
<http://e/n> <http://e/q> "w" <http://e/g1> .
'''),

    ("zero_and_false_are_distinct_values", {}, {
        # Python 0 == False must not collapse distinct JSON values
        "@id": "http://e/s", "http://e/p": [0, False, 1, True],
    }, '''
<http://e/s> <http://e/p> "0"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://e/s> <http://e/p> "false"^^<http://www.w3.org/2001/XMLSchema#boolean> .
<http://e/s> <http://e/p> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://e/s> <http://e/p> "true"^^<http://www.w3.org/2001/XMLSchema#boolean> .
'''),

    ("language_map_with_term_direction", {"rdf_direction": "i18n-datatype"},
     {
        "@context": {"p": {"@id": "http://e/p", "@container": "@language",
                           "@direction": "rtl"}},
        "@id": "http://e/s", "p": {"ar": "x"},
    }, '''
<http://e/s> <http://e/p> "x"^^<https://www.w3.org/ns/i18n#ar_rtl> .
'''),

    ("free_floating_value_object_dropped", {}, {
        "@value": "free", "@language": "en",
    }, ''),

    ("percent_encoded_iris_kept", {}, {
        "@id": "http://e/s%20x", "http://e/p%3A": "v",
    }, '''
<http://e/s%20x> <http://e/p%3A> "v" .
'''),

    ("compact_iri_prefix_chain", {}, {
        # prefix b itself defined via compact IRI a:sub/
        "@context": {"a": "http://e/", "b": "a:sub/"},
        "@id": "b:leaf", "http://e/p": "v",
    }, '''
<http://e/sub/leaf> <http://e/p> "v" .
'''),

    ("vocab_fragment_relative", {"base_iri": "http://doc.org/d"}, {
        "@context": {"@vocab": "#"},
        "@id": "http://e/s", "t": "v",
    }, '''
<http://e/s> <http://doc.org/d#t> "v" .
'''),

    ("nested_reverse_maps", {}, {
        "@id": "http://e/s",
        "@reverse": {"http://e/p": {
            "@id": "http://e/o",
            "@reverse": {"http://e/q": {"@id": "http://e/r"}}}},
    }, '''
<http://e/o> <http://e/p> <http://e/s> .
<http://e/r> <http://e/q> <http://e/o> .
'''),

    ("graph_id_map_relative_keys", {"base_iri": "http://b/dir/doc"}, {
        "@context": {"g": {"@id": "http://e/g",
                           "@container": ["@graph", "@id"]}},
        "@id": "http://e/s", "g": {"gname": {"http://e/q": "v"}},
    }, '''
<http://e/s> <http://e/g> <http://b/dir/gname> .
_:n <http://e/q> "v" <http://b/dir/gname> .
'''),

    ("type_map_vocab_coerced_strings", {}, {
        "@context": {"@vocab": "http://v/",
                     "p": {"@id": "http://e/p", "@container": "@type",
                           "@type": "@vocab"}},
        "@id": "http://e/s", "p": {"T": "Obj"},
    }, '''
<http://e/s> <http://e/p> <http://v/Obj> .
<http://v/Obj> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://v/T> .
'''),

    ("empty_string_literal", {}, {
        "@id": "http://e/s", "http://e/p": "",
    }, '''
<http://e/s> <http://e/p> "" .
'''),

    ("graph_container_nested_in_itself", {}, {
        "@context": {"g": {"@id": "http://e/g", "@container": "@graph"}},
        "@id": "http://e/s", "g": {"g": {"http://e/q": "v"}},
    }, '''
<http://e/s> <http://e/g> _:g1 .
_:inner <http://e/g> _:g2 _:g1 .
_:n <http://e/q> "v" _:g2 .
'''),

    ("base_authority_only", {"base_iri": "http://host"}, {
        "@id": "x", "http://e/p": "v",
    }, '''
<http://host/x> <http://e/p> "v" .
'''),

    ("base_userinfo_port_preserved", {"base_iri":
                                      "http://u:pw@host:8080/a/b"}, {
        "@id": "../y", "http://e/p": "v",
    }, '''
<http://u:pw@host:8080/y> <http://e/p> "v" .
'''),

    ("urn_base_opaque_path_merge", {"base_iri": "urn:isbn:123"}, {
        # RFC 3986 merge: base path has no '/' -> whole path replaced
        "@id": "frag", "http://e/p": "v",
    }, '''
<urn:frag> <http://e/p> "v" .
'''),

    ("empty_prefix_colon_term", {}, {
        "@context": {":x": "http://e/cx"},
        "@id": "http://e/s", ":x": "v",
    }, '''
<http://e/s> <http://e/cx> "v" .
'''),

    ("term_language_mapping", {}, {
        "@context": {"p": {"@id": "http://e/p", "@language": "de"}},
        "@id": "http://e/s", "p": "wort",
    }, '''
<http://e/s> <http://e/p> "wort"@de .
'''),

    ("included_inside_list_item_node", {}, {
        "@id": "http://e/s",
        "http://e/p": {"@list": [
            {"@id": "http://e/n", "http://e/r": "x",
             "@included": [{"@id": "http://e/t", "http://e/q": "w"}]}]},
    }, '''
<http://e/s> <http://e/p> _:l .
_:l <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> <http://e/n> .
_:l <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
<http://e/n> <http://e/r> "x" .
<http://e/t> <http://e/q> "w" .
'''),

    ("reverse_to_keyword_silently_dropped", {}, {
        # CTD step 13: @reverse value with keyword form -> term ignored
        # (spec says drop with a warning, not an error)
        "@context": {"r": {"@reverse": "@type"}},
        "@id": "http://e/s", "r": {"@id": "http://e/T"},
        "http://e/p": "keep",
    }, '''
<http://e/s> <http://e/p> "keep" .
'''),

    ("double_extremes_canonical", {}, {
        "@id": "http://e/s",
        "http://e/p": [1.7976931348623157e308, 5e-324],
    }, '''
<http://e/s> <http://e/p> "1.797693134862316E308"^^<http://www.w3.org/2001/XMLSchema#double> .
<http://e/s> <http://e/p> "4.940656458412465E-324"^^<http://www.w3.org/2001/XMLSchema#double> .
'''),

    ("index_property_vocab_expanded", {}, {
        "@context": {"@vocab": "http://v/",
                     "p": {"@id": "http://e/p", "@container": "@index",
                           "@index": "rank"}},
        "@id": "http://e/s", "p": {"1": {"@id": "http://e/o"}},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
<http://e/o> <http://v/rank> "1" .
'''),

    ("list_three_cell_chain", {}, {
        "@id": "http://e/s", "http://e/p": {"@list": ["a", "b", "c"]},
    }, '''
<http://e/s> <http://e/p> _:l0 .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "a" .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> _:l1 .
_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "b" .
_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> _:l2 .
_:l2 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "c" .
_:l2 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
'''),

    ("huge_integer_js_parse_semantics", {}, {
        # a JSON int beyond 2^53 loses precision at JSON.parse in JS: the
        # reference sees the nearest double, integral again -> xsd:integer
        # with ECMAScript shortest-digit decimal (NOT the exact int)
        "@id": "http://e/s", "http://e/p": 98765432109876543210,
    }, '''
<http://e/s> <http://e/p> "98765432109876540000"^^<http://www.w3.org/2001/XMLSchema#integer> .
'''),

    ("id_keyword_alias_in_nested_map", {}, {
        "@context": {"url": "@id"},
        "url": "http://e/s", "http://e/p": {"url": "http://e/o"},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
'''),

    ("multiple_types_multiple_quads", {}, {
        "@id": "http://e/s", "@type": ["http://e/A", "http://e/B"],
    }, '''
<http://e/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/A> .
<http://e/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/B> .
'''),

    ("index_alias_on_node", {}, {
        "@context": {"idx": "@index",
                     "p": {"@id": "http://e/p", "@container": "@index"}},
        "@id": "http://e/s",
        "p": {"k": {"@id": "http://e/o", "idx": "k"}},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
'''),

    ("same_index_twice_no_conflict", {}, {
        "@id": "http://e/s",
        "http://e/p": [{"@id": "http://e/o", "@index": "a"}],
        "http://e/q": [{"@id": "http://e/o", "@index": "a"}],
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
<http://e/s> <http://e/q> <http://e/o> .
'''),

    ("scoped_context_array", {}, {
        "@context": {"p": {"@id": "http://e/p",
                           "@context": [{"a": "http://e/a1"},
                                        {"b": "http://e/b1"}]}},
        "@id": "http://e/s", "p": {"a": "1", "b": "2"},
    }, '''
<http://e/s> <http://e/p> _:n .
_:n <http://e/a1> "1" .
_:n <http://e/b1> "2" .
'''),

    ("list_and_set_keyword_aliases", {}, {
        "@context": {"l": "@list", "many": "@set"},
        "@id": "http://e/s",
        "http://e/p": {"l": ["x"]},
        "http://e/q": {"many": ["y", "z"]},
    }, '''
<http://e/s> <http://e/p> _:l0 .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "x" .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
<http://e/s> <http://e/q> "y" .
<http://e/s> <http://e/q> "z" .
'''),

    ("numeric_string_stays_string", {}, {
        "@id": "http://e/s", "http://e/p": "42",
    }, '''
<http://e/s> <http://e/p> "42" .
'''),

    ("xsd_int_via_term_type", {}, {
        "@context": {"p": {"@id": "http://e/p",
                           "@type": "http://www.w3.org/2001/XMLSchema#int"}},
        "@id": "http://e/s", "p": 7,
    }, '''
<http://e/s> <http://e/p> "7"^^<http://www.w3.org/2001/XMLSchema#int> .
'''),

    ("protected_inside_scoped_ctx", {}, {
        "@context": {"T": {"@id": "http://e/T",
                           "@context": {"@protected": True,
                                        "x": "http://e/x"}}},
        "@id": "http://e/s", "@type": "T", "x": "v",
    }, '''
<http://e/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/T> .
<http://e/s> <http://e/x> "v" .
'''),

    ("graph_string_value_dropped", {}, {
        # @graph expands with active property @graph; a bare string is a
        # free-floating scalar -> dropped, no error
        "@id": "http://e/s", "@graph": "str", "http://e/p": "v",
    }, '''
<http://e/s> <http://e/p> "v" .
'''),

    ("unicode_iris_and_literals", {}, {
        # incl. tnt02's UTF-8 boundary family: 2-byte (é, \u07ff),
        # 3-byte (\u0800, ☃), 4-byte (\U0001F600) — all raw in N-Quads
        "@id": "http://e/sé", "http://e/pü": "v☃\u07ff\u0800\U0001F600",
    }, '''
<http://e/sé> <http://e/pü> "v☃\u07ff\u0800\U0001F600" .
'''),

    ("literal_escape_forms", {}, {
        # tnt09/tnt13/tnt15: REVERSE SOLIDUS mid and at END of literal,
        # CARRIAGE RETURN (must be ECHAR-escaped: raw 0x0D is forbidden
        # in STRING_LITERAL_QUOTE)
        "@id": "http://e/s",
        "http://e/p": "line1\nline2\t\"quoted\"\\back\rcr\\",
    }, '''
<http://e/s> <http://e/p> "line1\\nline2\\t\\"quoted\\"\\\\back\\rcr\\\\" .
'''),

    ("set_null_entries_removed", {}, {
        "@id": "http://e/s", "http://e/p": {"@set": ["a", None, "b"]},
    }, '''
<http://e/s> <http://e/p> "a" .
<http://e/s> <http://e/p> "b" .
'''),

    ("same_node_in_two_graphs", {}, {
        "@graph": [
            {"@id": "http://e/g1",
             "@graph": {"@id": "http://e/n", "http://e/p": "1"}},
            {"@id": "http://e/g2",
             "@graph": {"@id": "http://e/n", "http://e/p": "2"}}],
    }, '''
<http://e/n> <http://e/p> "1" <http://e/g1> .
<http://e/n> <http://e/p> "2" <http://e/g2> .
'''),

    ("null_id_term_decouples", {}, {
        # {"@id": null} term: explicitly decoupled, NOT vocab-expanded
        "@context": {"skip": {"@id": None}, "@vocab": "http://v/"},
        "@id": "http://e/s", "skip": "v", "keep": "w",
    }, '''
<http://e/s> <http://v/keep> "w" .
'''),

    ("vocab_for_predicate_base_for_subject", {"base_iri": "http://b/doc"}, {
        "@context": {"@vocab": "http://v/"},
        "@id": "relsub", "p": "v",
    }, '''
<http://b/relsub> <http://v/p> "v" .
'''),

    ("json_keyword_alias", {}, {
        "@context": {"json": "@json",
                     "p": {"@id": "http://e/p", "@type": "json"}},
        "@id": "http://e/s", "p": [1, 2],
    }, '''
<http://e/s> <http://e/p> "[1,2]"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON> .
'''),

    ("embedded_context_in_node", {}, {
        "@context": {"p": "http://e/p1"},
        "@id": "http://e/s",
        "p": {"@context": {"p": "http://e/p2"},
              "@id": "http://e/n", "p": "v"},
    }, '''
<http://e/s> <http://e/p1> <http://e/n> .
<http://e/n> <http://e/p2> "v" .
'''),

    ("bnode_label_coreference", {}, {
        "@graph": [{"@id": "_:x", "http://e/p": "1"},
                   {"@id": "http://e/s", "http://e/q": {"@id": "_:x"}}],
    }, '''
_:x <http://e/p> "1" .
<http://e/s> <http://e/q> _:x .
'''),

    ("bnode_graph_name", {}, {
        "@id": "_:g", "@graph": {"@id": "http://e/s", "http://e/p": "v"},
    }, '''
<http://e/s> <http://e/p> "v" _:g .
'''),

    ("list_items_coerced_and_resolved", {"base_iri": "http://b/x/doc"}, {
        "@context": {"p": {"@id": "http://e/p", "@container": "@list",
                           "@type": "@id"}},
        "@id": "http://e/s", "p": ["http://e/a", "rel"],
    }, '''
<http://e/s> <http://e/p> _:l0 .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> <http://e/a> .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> _:l1 .
_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> <http://b/x/rel> .
_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
'''),

    ("type_vocab_relative_concat", {}, {
        "@context": {"@vocab": "http://v/"},
        "@id": "http://e/s", "@type": "sub/T",
    }, '''
<http://e/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://v/sub/T> .
'''),

    ("value_index_no_rdf_effect", {}, {
        "@id": "http://e/s",
        "http://e/p": {"@value": "x", "@index": "i"},
    }, '''
<http://e/s> <http://e/p> "x" .
'''),

    ("context_inside_list_item", {}, {
        "@id": "http://e/s",
        "http://e/p": {"@list": [
            {"@context": {"q": "http://e/q"},
             "@id": "http://e/n", "q": "v"}]},
    }, '''
<http://e/s> <http://e/p> _:l .
_:l <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> <http://e/n> .
_:l <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
<http://e/n> <http://e/q> "v" .
'''),

    ("numbers_in_lists_canonical", {}, {
        "@id": "http://e/s",
        "http://e/p": {"@list": [2.5, 7]},
    }, '''
<http://e/s> <http://e/p> _:l0 .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "2.5E0"^^<http://www.w3.org/2001/XMLSchema#double> .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> _:l1 .
_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "7"^^<http://www.w3.org/2001/XMLSchema#integer> .
_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
'''),

    ("reverse_keyword_alias", {}, {
        "@context": {"rev": "@reverse"},
        "@id": "http://e/s", "rev": {"http://e/p": {"@id": "http://e/o"}},
    }, '''
<http://e/o> <http://e/p> <http://e/s> .
'''),

    ("top_level_graph_alias_is_default_graph", {}, {
        "@context": {"g": "@graph"},
        "g": [{"@id": "http://e/a", "http://e/p": "1"}],
    }, '''
<http://e/a> <http://e/p> "1" .
'''),

    ("empty_context_array_noop", {}, {
        "@context": [], "@id": "http://e/s", "http://e/p": "v",
    }, '''
<http://e/s> <http://e/p> "v" .
'''),

    ("type_alias_inside_value_object", {}, {
        "@context": {"type": "@type"},
        "@id": "http://e/s",
        "http://e/p": {"@value": "1", "type": "http://e/dt"},
    }, '''
<http://e/s> <http://e/p> "1"^^<http://e/dt> .
'''),

    ("type_scoped_ctx_restored_for_siblings", {}, {
        # @propagate:false (type-scoped default): the outer definition of x
        # is restored inside nested nodes
        "@context": {"T": {"@id": "http://e/T",
                           "@context": {"x": "http://e/xScoped"}},
                     "x": "http://e/xOuter", "q": "http://e/q"},
        "@id": "http://e/s", "@type": "T",
        "q": {"@id": "http://e/n", "x": "v"},
    }, '''
<http://e/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/T> .
<http://e/s> <http://e/q> <http://e/n> .
<http://e/n> <http://e/xOuter> "v" .
'''),

    ("remote_context_chain", {"ctx_cache": {
        "https://c/a": {"@context": ["https://c/b",
                                     {"t2": "http://e/t2"}]},
        "https://c/b": {"@context": {"t": "http://e/t"}}}}, {
        "@context": "https://c/a", "@id": "http://e/s", "t": "v",
    }, '''
<http://e/s> <http://e/t> "v" .
'''),

    ("remote_context_base_ignored", {"base_iri": "http://doc.org/d",
                                     "ctx_cache": {
        "https://c/a": {"@context": {"@base": "http://evil.org/"}}}}, {
        # @base in a REMOTE context is ignored (spec: processed only when
        # remote contexts is empty); relative ids resolve against the doc
        "@context": "https://c/a", "@id": "rel", "http://e/p": "v",
    }, '''
<http://doc.org/rel> <http://e/p> "v" .
'''),

    ("compact_iri_datatype", {}, {
        "@context": {"x": "http://x.org/"},
        "@id": "http://e/s",
        "http://e/p": {"@value": "v", "@type": "x:dt"},
    }, '''
<http://e/s> <http://e/p> "v"^^<http://x.org/dt> .
'''),

    ("graph_container_array_one_graph_each", {}, {
        "@context": {"g": {"@id": "http://e/g", "@container": "@graph"}},
        "@id": "http://e/s",
        "g": [{"http://e/q": "1"}, {"http://e/q": "2"}],
    }, '''
<http://e/s> <http://e/g> _:g1 .
<http://e/s> <http://e/g> _:g2 .
_:n1 <http://e/q> "1" _:g1 .
_:n2 <http://e/q> "2" _:g2 .
'''),

    ("index_set_container_arrays", {}, {
        "@context": {"p": {"@id": "http://e/p",
                           "@container": ["@index", "@set"]}},
        "@id": "http://e/s", "p": {"i": ["a", "b"]},
    }, '''
<http://e/s> <http://e/p> "a" .
<http://e/s> <http://e/p> "b" .
'''),

    ("reverse_term_with_index_container", {}, {
        "@context": {"r": {"@reverse": "http://e/p",
                           "@container": "@index"}},
        "@id": "http://e/s", "r": {"i": {"@id": "http://e/o"}},
    }, '''
<http://e/o> <http://e/p> <http://e/s> .
'''),

    ("language_map_key_lowercased", {}, {
        "@context": {"p": {"@id": "http://e/p", "@container": "@language"}},
        "@id": "http://e/s", "p": {"EN-US": "hi"},
    }, '''
<http://e/s> <http://e/p> "hi"@en-us .
'''),

    ("explicit_term_beats_vocab_for_type", {}, {
        "@context": {"@vocab": "http://v/",
                     "Agent": "http://special/Agent"},
        "@id": "http://e/s", "@type": "Agent",
    }, '''
<http://e/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://special/Agent> .
'''),

    ("star_annotation_with_reverse_term", {}, {
        # reverse property INSIDE the annotation: the quoted triple becomes
        # the OBJECT (reference test 'on nested node with @reverse',
        # lib/Util.ts:1111-1113)
        "@context": {"annotation": {"@reverse": "http://e/annotation",
                                    "@type": "@id"}},
        "@id": "http://e/s",
        "http://e/prop": {"@id": "http://e/o",
                          "@annotation": {
                              "annotation": "http://e/valueAnnotated"}},
    }, '''
<http://e/s> <http://e/prop> <http://e/o> .
<http://e/valueAnnotated> <http://e/annotation> << <http://e/s> <http://e/prop> <http://e/o> >> .
'''),

    ("star_reverse_in_embedded_opt_in", {"rdfstar_reverse_in_embedded": True},
     {
        "@id": {"@id": "http://e/rei",
                "@reverse": {"http://e/rel": {"@id": "http://e/value"}}},
        "http://e/prop": "v2",
    }, '''
<< <http://e/value> <http://e/rel> <http://e/rei> >> <http://e/prop> "v2" .
'''),

    ("property_index_id_typed_strings", {}, {
        # property-based index + @type:@id: string values are node refs
        # (ContainerHandlerIndex.ts:42-58), and the index key attaches
        "@context": {"p": {"@id": "http://e/p", "@container": "@index",
                           "@index": "http://e/prop", "@type": "@id"}},
        "@id": "http://e/s", "p": {"k": "http://e/o"},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
<http://e/o> <http://e/prop> "k" .
'''),

    ("type_map_array_values", {}, {
        "@context": {"p": {"@id": "http://e/p", "@container": "@type"}},
        "@id": "http://e/s",
        "p": {"http://e/T": [{"@id": "http://e/a"}, {"@id": "http://e/b"}]},
    }, '''
<http://e/s> <http://e/p> <http://e/a> .
<http://e/s> <http://e/p> <http://e/b> .
<http://e/a> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/T> .
<http://e/b> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/T> .
'''),

    # --- round-3 batch A: @direction x containers/terms ----------------------
    # (reference test anchors: JsonLdParser-test.ts:763-1035, :2018-2138;
    #  W3C toRdf tdi01-tdi12 family)

    ("dirA_term_direction_i18n", {"rdf_direction": "i18n-datatype"}, {
        "@context": {"p": {"@id": "http://e/p", "@direction": "rtl"}},
        "@id": "http://e/s", "p": "v",
    }, '''
<http://e/s> <http://e/p> "v"^^<https://www.w3.org/ns/i18n#_rtl> .
'''),

    ("dirA_default_dir_term_override", {"rdf_direction": "i18n-datatype"}, {
        "@context": {"@direction": "rtl",
                     "p": {"@id": "http://e/p", "@direction": "ltr"}},
        "@id": "http://e/s", "p": "v",
    }, '''
<http://e/s> <http://e/p> "v"^^<https://www.w3.org/ns/i18n#_ltr> .
'''),

    ("dirA_term_direction_null_unsets", {"rdf_direction": "i18n-datatype"}, {
        "@context": {"@direction": "rtl",
                     "p": {"@id": "http://e/p", "@direction": None}},
        "@id": "http://e/s", "p": "v",
    }, '''
<http://e/s> <http://e/p> "v" .
'''),

    ("dirA_term_dir_with_default_language",
     {"rdf_direction": "i18n-datatype"}, {
        "@context": {"@language": "AR",
                     "p": {"@id": "http://e/p", "@direction": "rtl"}},
        "@id": "http://e/s", "p": "v",
    }, '''
<http://e/s> <http://e/p> "v"^^<https://www.w3.org/ns/i18n#ar_rtl> .
'''),

    # rdfDirection unset: @direction is IGNORED in plain RDF output
    ("dirA_term_direction_ignored_when_disabled", {}, {
        "@context": {"@language": "ar",
                     "p": {"@id": "http://e/p", "@direction": "rtl"}},
        "@id": "http://e/s", "p": "v",
    }, '''
<http://e/s> <http://e/p> "v"@ar .
'''),

    ("dirA_language_container_default_dir",
     {"rdf_direction": "i18n-datatype"}, {
        "@context": {"@direction": "rtl",
                     "p": {"@id": "http://e/p", "@container": "@language"}},
        "@id": "http://e/s", "p": {"en": "hi", "he": "shalom"},
    }, '''
<http://e/s> <http://e/p> "hi"^^<https://www.w3.org/ns/i18n#en_rtl> .
<http://e/s> <http://e/p> "shalom"^^<https://www.w3.org/ns/i18n#he_rtl> .
'''),

    ("dirA_index_container_direction", {"rdf_direction": "i18n-datatype"}, {
        "@context": {"@direction": "rtl",
                     "p": {"@id": "http://e/p", "@container": "@index"}},
        "@id": "http://e/s", "p": {"i": "v"},
    }, '''
<http://e/s> <http://e/p> "v"^^<https://www.w3.org/ns/i18n#_rtl> .
'''),

    ("dirA_list_of_direction_literals", {"rdf_direction": "i18n-datatype"}, {
        "@context": {"@direction": "rtl"},
        "@id": "http://e/s", "http://e/p": {"@list": ["a", "b"]},
    }, '''
<http://e/s> <http://e/p> _:l0 .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "a"^^<https://www.w3.org/ns/i18n#_rtl> .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> _:l1 .
_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "b"^^<https://www.w3.org/ns/i18n#_rtl> .
_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
'''),

    ("dirA_set_container_direction", {"rdf_direction": "i18n-datatype"}, {
        "@context": {"@direction": "ltr",
                     "p": {"@id": "http://e/p", "@container": "@set"}},
        "@id": "http://e/s", "p": ["a"],
    }, '''
<http://e/s> <http://e/p> "a"^^<https://www.w3.org/ns/i18n#_ltr> .
'''),

    # term @type coercion wins over base direction (typed literal, no dir)
    ("dirA_type_coercion_beats_direction",
     {"rdf_direction": "i18n-datatype"}, {
        "@context": {"@direction": "rtl",
                     "p": {"@id": "http://e/p",
                           "@type": "http://www.w3.org/2001/XMLSchema#string"}},
        "@id": "http://e/s", "p": "v",
    }, '''
<http://e/s> <http://e/p> "v" .
'''),

    ("dirA_compound_language_lowercased",
     {"rdf_direction": "compound-literal"}, {
        "@id": "http://e/s",
        "http://e/p": {"@value": "x", "@language": "AR",
                       "@direction": "rtl"},
    }, '''
<http://e/s> <http://e/p> _:c .
_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#value> "x" .
_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#language> "ar" .
_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#direction> "rtl" .
'''),

    ("dirA_compound_in_language_container",
     {"rdf_direction": "compound-literal"}, {
        "@context": {"@direction": "rtl",
                     "p": {"@id": "http://e/p", "@container": "@language"}},
        "@id": "http://e/s", "p": {"en": "hi"},
    }, '''
<http://e/s> <http://e/p> _:c .
_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#value> "hi" .
_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#language> "en" .
_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#direction> "rtl" .
'''),

    ("dirA_id_container_direction", {"rdf_direction": "i18n-datatype"}, {
        "@context": {"@direction": "rtl",
                     "p": {"@id": "http://e/p", "@container": "@id"}},
        "@id": "http://e/s", "p": {"http://e/n": {"http://e/q": "v"}},
    }, '''
<http://e/s> <http://e/p> <http://e/n> .
<http://e/n> <http://e/q> "v"^^<https://www.w3.org/ns/i18n#_rtl> .
'''),

    ("dirA_graph_container_direction", {"rdf_direction": "i18n-datatype"}, {
        "@context": {"@direction": "rtl",
                     "p": {"@id": "http://e/p", "@container": "@graph"}},
        "@id": "http://e/s", "p": {"http://e/q": "v"},
    }, '''
<http://e/s> <http://e/p> _:g .
_:n <http://e/q> "v"^^<https://www.w3.org/ns/i18n#_rtl> _:g .
'''),

    ("dirA_scoped_ctx_sets_direction", {"rdf_direction": "i18n-datatype"}, {
        "@context": {"p": {"@id": "http://e/p",
                           "@context": {"@direction": "rtl"}}},
        "@id": "http://e/s", "p": {"http://e/q": "inner"},
    }, '''
<http://e/s> <http://e/p> _:n .
_:n <http://e/q> "inner"^^<https://www.w3.org/ns/i18n#_rtl> .
'''),

    ("dirA_direction_inherited_by_nested_node",
     {"rdf_direction": "i18n-datatype"}, {
        "@context": {"@direction": "rtl"},
        "@id": "http://e/s",
        "http://e/p": {"@id": "http://e/n", "http://e/q": "inner"},
    }, '''
<http://e/s> <http://e/p> <http://e/n> .
<http://e/n> <http://e/q> "inner"^^<https://www.w3.org/ns/i18n#_rtl> .
'''),

    ("dirA_i18n_language_lowercased", {"rdf_direction": "i18n-datatype"}, {
        "@id": "http://e/s",
        "http://e/p": {"@value": "x", "@language": "EN-Latn",
                       "@direction": "ltr"},
    }, '''
<http://e/s> <http://e/p> "x"^^<https://www.w3.org/ns/i18n#en-latn_ltr> .
'''),

    # @value: null with @direction expands to null -> no quads
    ("dirA_null_value_with_direction", {"rdf_direction": "i18n-datatype"}, {
        "@id": "http://e/s",
        "http://e/p": {"@value": None, "@direction": "rtl"},
    }, ''),

    # --- round-3 batch B: @annotation combinations ---------------------------
    # (reference test anchors: JsonLdParser-test.ts:11456-12072)

    ("annB_with_reverse_typed_id", {}, {
        # JsonLdParser-test.ts:11509 — reversed annotation edge
        "@context": {"annotation": {"@reverse": "ex:annotation",
                                    "@type": "@id"}},
        "@id": "ex:s",
        "ex:prop": {"@id": "ex:o", "@annotation": {"annotation": "ex:vA"}},
    }, '''
<ex:s> <ex:prop> <ex:o> .
<ex:vA> <ex:annotation> << <ex:s> <ex:prop> <ex:o> >> .
'''),

    ("annB_before_id_key_order", {}, {
        # JsonLdParser-test.ts:11540 — @annotation precedes @id lexically
        "@id": "ex:s",
        "ex:prop": {"@annotation": {"ex:annotation": "vA"}, "@id": "ex:o"},
    }, '''
<ex:s> <ex:prop> <ex:o> .
<< <ex:s> <ex:prop> <ex:o> >> <ex:annotation> "vA" .
'''),

    ("annB_type_inside_annotation", {}, {
        # JsonLdParser-test.ts:11570 — rdf:type edge on the quad term
        "@id": "ex:s",
        "ex:prop": {"@id": "ex:o", "@annotation": {"@type": "ex:vA"}},
    }, '''
<ex:s> <ex:prop> <ex:o> .
<< <ex:s> <ex:prop> <ex:o> >> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <ex:vA> .
'''),

    ("annB_sibling_property_not_annotated", {}, {
        # JsonLdParser-test.ts:11600 — other props attach to the node itself
        "@id": "ex:s",
        "ex:prop": {"@id": "ex:o", "ex:prop2": "value2",
                    "@annotation": {"ex:annotation": "vA"}},
    }, '''
<ex:s> <ex:prop> <ex:o> .
<ex:o> <ex:prop2> "value2" .
<< <ex:s> <ex:prop> <ex:o> >> <ex:annotation> "vA" .
'''),

    ("annB_two_annotations_array", {}, {
        # JsonLdParser-test.ts:11636
        "@id": "ex:s",
        "ex:prop": {"@id": "ex:o",
                    "@annotation": [{"ex:a1": "v1"}, {"ex:a2": "v2"}]},
    }, '''
<ex:s> <ex:prop> <ex:o> .
<< <ex:s> <ex:prop> <ex:o> >> <ex:a1> "v1" .
<< <ex:s> <ex:prop> <ex:o> >> <ex:a2> "v2" .
'''),

    ("annB_two_annotations_object", {}, {
        # JsonLdParser-test.ts:11676
        "@id": "ex:s",
        "ex:prop": {"@id": "ex:o",
                    "@annotation": {"ex:a1": "v1", "ex:a2": "v2"}},
    }, '''
<ex:s> <ex:prop> <ex:o> .
<< <ex:s> <ex:prop> <ex:o> >> <ex:a1> "v1" .
<< <ex:s> <ex:prop> <ex:o> >> <ex:a2> "v2" .
'''),

    ("annB_on_value_literal", {}, {
        # JsonLdParser-test.ts:11716 — annotated literal object
        "@id": "ex:s",
        "ex:prop": {"@value": "value",
                    "@annotation": {"ex:annotation": "vA"}},
    }, '''
<ex:s> <ex:prop> "value" .
<< <ex:s> <ex:prop> "value" >> <ex:annotation> "vA" .
'''),

    ("annB_nested_value_annotations", {}, {
        # JsonLdParser-test.ts:11777 — annotation-on-annotation chain
        "@id": "ex:s",
        "ex:prop": {"@value": "value", "@annotation": {
            "ex:a1": {"@value": "vA1",
                      "@annotation": {"ex:a2": "vA2"}}}},
    }, '''
<ex:s> <ex:prop> "value" .
<< <ex:s> <ex:prop> "value" >> <ex:a1> "vA1" .
<< << <ex:s> <ex:prop> "value" >> <ex:a1> "vA1" >> <ex:a2> "vA2" .
'''),

    ("annB_branched_nested_value", {}, {
        # JsonLdParser-test.ts:11825 — two independent annotation branches
        "@id": "ex:s",
        "ex:prop": {"@value": "value", "@annotation": [
            {"ex:a11": {"@value": "v11",
                        "@annotation": {"ex:a12": "v12"}}},
            {"ex:a21": {"@value": "v21",
                        "@annotation": {"ex:a22": "v22"}}}]},
    }, '''
<ex:s> <ex:prop> "value" .
<< <ex:s> <ex:prop> "value" >> <ex:a11> "v11" .
<< << <ex:s> <ex:prop> "value" >> <ex:a11> "v11" >> <ex:a12> "v12" .
<< <ex:s> <ex:prop> "value" >> <ex:a21> "v21" .
<< << <ex:s> <ex:prop> "value" >> <ex:a21> "v21" >> <ex:a22> "v22" .
'''),

    ("annB_embedded_node_as_annotation_value", {}, {
        # JsonLdParser-test.ts:11998 — node-in-annotation itself annotated
        "@context": {"@vocab": "ex:", "p1": {"@type": "@id"}},
        "@id": "ex:s",
        "p": {"@id": "ex:o", "@annotation": {
            "r": {"@id": "ex:s1", "@annotation": {"p1": "ex:o1"}}}},
    }, '''
<ex:s> <ex:p> <ex:o> .
<< <ex:s> <ex:p> <ex:o> >> <ex:r> <ex:s1> .
<< << <ex:s> <ex:p> <ex:o> >> <ex:r> <ex:s1> >> <ex:p1> <ex:o1> .
'''),

    # --- round-3 batch C: @propagate chains / @version / @import -------------
    # (reference anchors: JsonLdParser-test.ts:9738-9790, :9908-9990,
    #  :10289-10315, :5070-5129; W3C c021-c037 families)

    ("propC_inline_propagate_false_reverts_one_level_down", {}, {
        # JsonLdParser-test.ts:9738
        "@context": {"@vocab": "http://vocab.org/"},
        "@id": "http://ex.org/myid",
        "foo": {"@context": {"@propagate": False,
                             "@vocab": "http://vocab.1.org/"},
                "@id": "http://ex.org/i1",
                "bar": {"@id": "http://ex.org/i2", "baz": "buzz"}},
    }, '''
<http://ex.org/myid> <http://vocab.org/foo> <http://ex.org/i1> .
<http://ex.org/i1> <http://vocab.1.org/bar> <http://ex.org/i2> .
<http://ex.org/i2> <http://vocab.org/baz> "buzz" .
'''),

    ("propC_property_scoped_propagate_true", {}, {
        # JsonLdParser-test.ts:9908 — scoped ctx opts INTO propagation
        "@context": {"@vocab": "http://vocab.org/",
                     "foo": {"@context": {"@propagate": True,
                                          "@vocab": "http://ex.org/"}}},
        "@id": "http://ex.org/myid",
        "foo": {"@id": "http://ex.org/i1",
                "bar1": {"@id": "http://ex.org/i2", "bar2": "baz"}},
    }, '''
<http://ex.org/myid> <http://vocab.org/foo> <http://ex.org/i1> .
<http://ex.org/i1> <http://ex.org/bar1> <http://ex.org/i2> .
<http://ex.org/i2> <http://ex.org/bar2> "baz" .
'''),

    ("propC_property_scoped_default_no_propagate", {}, {
        # JsonLdParser-test.ts:9936 — property-scoped default is propagate:
        # false ONLY when explicit; default scoped ctx DOES propagate, the
        # explicit @propagate: false stops at the next level
        "@context": {"@vocab": "http://vocab.org/",
                     "foo": {"@context": {"@propagate": False,
                                          "@vocab": "http://ex.org/"}}},
        "@id": "http://ex.org/myid",
        "foo": {"@id": "http://ex.org/i1",
                "bar1": {"@id": "http://ex.org/i2", "bar2": "baz"}},
    }, '''
<http://ex.org/myid> <http://vocab.org/foo> <http://ex.org/i1> .
<http://ex.org/i1> <http://ex.org/bar1> <http://ex.org/i2> .
<http://ex.org/i2> <http://vocab.org/bar2> "baz" .
'''),

    ("propC_type_scoped_propagate_true", {}, {
        # JsonLdParser-test.ts:10289 — type-scoped default is NO propagation;
        # @propagate: true opts in
        "@context": {"@vocab": "http://vocab.org/",
                     "Foo": {"@id": "http://ex.org/Foo",
                             "@context": {"@propagate": True,
                                          "@vocab": "http://vocab.1.org/"}}},
        "@type": "Foo", "@id": "http://ex.org/myid",
        "bar": {"@id": "http://ex.org/i1", "baz": "buzz"},
    }, '''
<http://ex.org/myid> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.org/Foo> .
<http://ex.org/myid> <http://vocab.1.org/bar> <http://ex.org/i1> .
<http://ex.org/i1> <http://vocab.1.org/baz> "buzz" .
'''),

    ("propC_chain_reverts_to_outer_everywhere_below", {}, {
        "@context": {"@vocab": "http://v0.org/",
                     "foo": {"@context": {"@propagate": False,
                                          "@vocab": "http://v1.org/"}}},
        "@id": "http://ex.org/a",
        "foo": {"@id": "http://ex.org/b",
                "bar": {"@id": "http://ex.org/c",
                        "baz": {"@id": "http://ex.org/d", "qux": "v"}}},
    }, '''
<http://ex.org/a> <http://v0.org/foo> <http://ex.org/b> .
<http://ex.org/b> <http://v1.org/bar> <http://ex.org/c> .
<http://ex.org/c> <http://v0.org/baz> <http://ex.org/d> .
<http://ex.org/d> <http://v0.org/qux> "v" .
'''),

    ("propC_nonpropagating_language_still_applies_locally", {}, {
        "@context": {"@vocab": "http://v0.org/"},
        "@id": "http://ex.org/a",
        "foo": {"@context": {"@propagate": False, "@language": "en"},
                "@id": "http://ex.org/b", "bar": "direct",
                "deep": {"@id": "http://ex.org/c", "inner": "nested"}},
    }, '''
<http://ex.org/a> <http://v0.org/foo> <http://ex.org/b> .
<http://ex.org/b> <http://v0.org/bar> "direct"@en .
<http://ex.org/b> <http://v0.org/deep> <http://ex.org/c> .
<http://ex.org/c> <http://v0.org/inner> "nested" .
'''),

    ("verC_version_in_second_array_context", {}, {
        # JsonLdParser-test.ts:5070 — @version 1.1 in one member of a
        # context array is legal and scoped to that member
        "@context": [{"ex": "https://example.org/ns/"},
                     {"@version": 1.1,
                      "VC": {"@id": "https://w3.org/VC"}}],
        "@id": "ex:x", "@type": "VC",
    }, '''
<https://example.org/ns/x> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <https://w3.org/VC> .
'''),

    ("verC_version_in_scoped_context", {}, {
        "@context": {"@vocab": "http://v/",
                     "foo": {"@context": {"@version": 1.1,
                                          "bar": "http://b/bar"}}},
        "@id": "http://e/s", "foo": {"@id": "http://e/i", "bar": "z"},
    }, '''
<http://e/s> <http://v/foo> <http://e/i> .
<http://e/i> <http://b/bar> "z" .
'''),

    ("verC_version_with_protected_vc_pattern", {}, {
        # JsonLdParser-test.ts:5096 — the VC pattern: protected 1.1 context
        "@context": [{"ex": "https://example.org/ns/"},
                     {"@version": 1.1, "@protected": True,
                      "VC": {"@id": "https://w3.org/VC"}}],
        "@id": "ex:x", "@type": "VC",
    }, '''
<https://example.org/ns/x> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <https://w3.org/VC> .
'''),

    ("impC_relative_import_resolved_against_base", {
        "base_iri": "https://c/doc",
        "ctx_cache": {"https://c/i": {"@context": {"a": "http://e/a"}}}}, {
        "@context": {"@import": "i"},
        "@id": "http://e/s", "a": "v",
    }, '''
<http://e/s> <http://e/a> "v" .
'''),

    ("impC_imported_vocab_applies", {
        "ctx_cache": {"https://c/i":
                      {"@context": {"@vocab": "http://impv/"}}}}, {
        "@context": {"@import": "https://c/i"},
        "@id": "http://e/s", "p": "v",
    }, '''
<http://e/s> <http://impv/p> "v" .
'''),

    # --- round-3 batch D: exotic IRI forms ------------------------------------
    # (RFC 3986 sections 3.2.2 / 5.4; reference delegates to
    #  jsonld-context-parser isValidIri + relative-to-absolute-iri)

    ("iriD_ipv6_authority_id_pred_obj", {}, {
        "@id": "http://[2001:db8::7]/s",
        "http://[2001:db8::7]/p": {"@id": "http://[::1]:8080/o"},
    }, '''
<http://[2001:db8::7]/s> <http://[2001:db8::7]/p> <http://[::1]:8080/o> .
'''),

    ("iriD_ipv6_base_resolution", {"base_iri": "http://[2001:db8::7]/a/b"}, {
        "@id": "rel", "http://e/p": "v",
    }, '''
<http://[2001:db8::7]/a/rel> <http://e/p> "v" .
'''),

    ("iriD_urn_uuid_typed", {}, {
        "@id": "urn:uuid:6e8bc430-9c3a-11d9-9669-0800200c9a66",
        "@type": "urn:example:Type",
    }, '''
<urn:uuid:6e8bc430-9c3a-11d9-9669-0800200c9a66> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <urn:example:Type> .
'''),

    ("iriD_urn_base_query_reference",
     {"base_iri": "urn:example:animal:ferret:nose"}, {
        # a ?query reference against an opaque-path urn base (RFC 5.3)
        "@id": "?x", "http://e/p": "v",
    }, '''
<urn:example:animal:ferret:nose?x> <http://e/p> "v" .
'''),

    ("iriD_tag_scheme", {}, {
        "@id": "tag:ex.org,2024:x", "http://e/p": "v",
    }, '''
<tag:ex.org,2024:x> <http://e/p> "v" .
'''),

    ("iriD_percent_encoded_slash_segment_kept",
     {"base_iri": "http://e/a%2Fb/c"}, {
        "@id": "d", "http://e/p": "v",
    }, '''
<http://e/a%2Fb/d> <http://e/p> "v" .
'''),

    ("iriD_percent_encoded_unicode_ref", {"base_iri": "http://e/p/"}, {
        "@id": "%E2%82%AC", "http://e/p": "v",
    }, '''
<http://e/p/%E2%82%AC> <http://e/p> "v" .
'''),

    ("iriD_excess_dotdot_clamped_at_root", {"base_iri": "http://e/a/b"}, {
        "@id": "../../../x", "http://e/p": "v",
    }, '''
<http://e/x> <http://e/p> "v" .
'''),

    ("iriD_semicolon_params_with_dotseg", {"base_iri": "http://e/a/b"}, {
        "@id": "g;x=1/./y", "http://e/p": "v",
    }, '''
<http://e/a/g;x=1/y> <http://e/p> "v" .
'''),

    ("iriD_empty_ref_is_base_sans_fragment",
     {"base_iri": "http://e/a?q#f"}, {
        "@id": "", "http://e/p": "v",
    }, '''
<http://e/a?q> <http://e/p> "v" .
'''),

    ("iriD_exotic_scheme_chars", {}, {
        "@id": "x+y-z.1://h/p", "http://e/p": "v",
    }, '''
<x+y-z.1://h/p> <http://e/p> "v" .
'''),

    ("iriD_file_scheme_empty_authority", {"base_iri": "file:///a/b"}, {
        "@id": "c", "http://e/p": "v",
    }, '''
<file:///a/c> <http://e/p> "v" .
'''),

    # --- round-3 batch E: scoping-precedence combinations ---------------------
    # (reference anchors: JsonLdParser-test.ts:10537-10840)

    ("scopeE_type_scoping_beats_embedded_context", {}, {
        "@context": {"@vocab": "http://vocab.org/",
                     "Foo": {"@id": "http://ex.org/Foo",
                             "@context": {"@vocab": "http://vocab.1.org/"}}},
        "@id": "http://ex.org/myid",
        "prop": {"@context": {"@vocab": "http://vocab.ignored.org/"},
                 "@type": "Foo", "@id": "http://ex.org/i", "bar": "baz"},
    }, '''
<http://ex.org/myid> <http://vocab.org/prop> <http://ex.org/i> .
<http://ex.org/i> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.org/Foo> .
<http://ex.org/i> <http://vocab.1.org/bar> "baz" .
'''),

    ("scopeE_type_scoping_beats_property_scoping", {}, {
        "@context": {"@vocab": "http://vocab.org/",
                     "Foo": {"@id": "http://ex.org/Foo",
                             "@context": {"@vocab": "http://vocab.1.org/"}},
                     "prop": {"@context":
                              {"@vocab": "http://vocab.ignored.org/"}}},
        "@id": "http://ex.org/myid",
        "prop": {"@type": "Foo", "@id": "http://ex.org/i", "bar": "baz"},
    }, '''
<http://ex.org/myid> <http://vocab.org/prop> <http://ex.org/i> .
<http://ex.org/i> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.org/Foo> .
<http://ex.org/i> <http://vocab.1.org/bar> "baz" .
'''),

    ("scopeE_embedded_context_beats_property_scoping", {}, {
        "@context": {"@vocab": "http://vocab.org/",
                     "prop": {"@context":
                              {"@vocab": "http://vocab.ignored.org/"}}},
        "@id": "http://ex.org/myid",
        "prop": {"@context": {"@vocab": "http://vocab.1.org/"},
                 "@id": "http://ex.org/i", "bar": "baz"},
    }, '''
<http://ex.org/myid> <http://vocab.org/prop> <http://ex.org/i> .
<http://ex.org/i> <http://vocab.1.org/bar> "baz" .
'''),

    ("scopeE_nested_type_then_property_scopes", {}, {
        "@context": {"@vocab": "http://example/",
                     "Foo": {"@context": {"bar": {"@context":
                             {"baz": {"@type": "@vocab"}}}}}},
        "@type": "Foo", "@id": "http://ex.org/myid",
        "bar": {"baz": "buzz"},
    }, '''
<http://ex.org/myid> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://example/Foo> .
<http://ex.org/myid> <http://example/bar> _:b0 .
_:b0 <http://example/baz> <http://example/buzz> .
'''),

    ("scopeE_type_vocab_in_property_scope", {}, {
        "@context": {"@vocab": "http://vocab.org/",
                     "Inner": {"@context": {"foo": {"@type": "@vocab",
                               "@context": {"Foo": "ex:Foo"}}}}},
        "@id": "http://ex.org/myid",
        "nested": {"@type": "Inner", "@id": "http://ex.org/i",
                   "foo": "Foo"},
    }, '''
<http://ex.org/myid> <http://vocab.org/nested> <http://ex.org/i> .
<http://ex.org/i> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://vocab.org/Inner> .
<http://ex.org/i> <http://vocab.org/foo> <ex:Foo> .
'''),

    ("scopeE_double_type_scoping_chain", {}, {
        "@context": {"@vocab": "http://vocab.org/",
                     "Outer": {"@id": "ex:Outer",
                               "@context": {"nested": "ex:nested"}},
                     "Inner": {"@id": "ex:Inner",
                               "@context": {"foo": {"@id": "ex:foo",
                                            "@type": "@vocab",
                                            "@context": {"Foo": "ex:Foo"}}}}},
        "@type": "Outer", "@id": "http://ex.org/myid",
        "nested": {"@type": "Inner", "@id": "http://ex.org/i",
                   "foo": "Foo"},
    }, '''
<http://ex.org/myid> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <ex:Outer> .
<http://ex.org/myid> <ex:nested> <http://ex.org/i> .
<http://ex.org/i> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <ex:Inner> .
<http://ex.org/i> <ex:foo> <ex:Foo> .
'''),

    ("scopeE_double_type_scoping_no_vocab", {}, {
        "@context": {"Outer": {"@id": "ex:Outer",
                               "@context": {"nested": "ex:nested"}},
                     "Inner": {"@id": "ex:Inner",
                               "@context": {"foo": {"@id": "ex:foo",
                                            "@type": "@vocab",
                                            "@context": {"Foo": "ex:Foo"}}}}},
        "@type": "Outer", "@id": "http://ex.org/myid",
        "nested": {"@type": "Inner", "@id": "http://ex.org/i",
                   "foo": "Foo"},
    }, '''
<http://ex.org/myid> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <ex:Outer> .
<http://ex.org/myid> <ex:nested> <http://ex.org/i> .
<http://ex.org/i> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <ex:Inner> .
<http://ex.org/i> <ex:foo> <ex:Foo> .
'''),

    # --- round-3 batch F: @type-container previous-context semantics ----------
    # (W3C expansion 13.7.2; reference anchor: JsonLdParser-test.ts:9378 —
    #  found a real kernel bug: type-map values leaked the type-scoped ctx)

    ("typemapF_index_container_overridden_as_type_container", {}, {
        "@context": {"@vocab": "http://example/",
                     "prop": {"@container": "@index"},
                     "Outer": {"@context": {"prop":
                               {"@id": "http://example/outer-prop",
                                "@container": "@type"}}}},
        "@type": "Outer", "@id": "ex:outer",
        "prop": {"Inner": {"prop": {"bar": "baz"}}},
    }, '''
<ex:outer> <http://example/outer-prop> _:b0 .
<ex:outer> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://example/Outer> .
_:b0 <http://example/prop> "baz" .
_:b0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://example/Inner> .
'''),

    ("typemapF_key_scoped_ctx_applies_to_value", {}, {
        "@context": {"@vocab": "http://example/",
                     "p": {"@container": "@type"},
                     "T": {"@context": {"q": "http://scoped/q"}}},
        "@id": "ex:s", "p": {"T": {"q": "v"}},
    }, '''
<ex:s> <http://example/p> _:b0 .
_:b0 <http://scoped/q> "v" .
_:b0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://example/T> .
'''),

    ("typemapF_id_container_keeps_type_scoped_ctx", {}, {
        # previous-context reversion is @type-map-specific: @id maps under a
        # type-scope keep the scoped defs
        "@context": {"@vocab": "http://example/",
                     "Outer": {"@context": {"q": "http://scoped/q",
                               "idp": {"@id": "http://example/idp",
                                       "@container": "@id"}}}},
        "@type": "Outer", "@id": "ex:s",
        "idp": {"ex:n": {"q": "v"}},
    }, '''
<ex:s> <http://example/idp> <ex:n> .
<ex:s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://example/Outer> .
<ex:n> <http://scoped/q> "v" .
'''),

    # --- round-3 batch G: prefixes / @vocab forms / JSON literals -------------
    # (reference anchors: JsonLdParser-test.ts:4787-4956, :6739-6898)

    ("prefG_simple_term_non_gendelim_is_not_prefix", {}, {
        # 1.1: a simple term is only a prefix if its IRI ends in a gen-delim
        "@context": {"pre": "http://ex.org/suffix"},
        "@id": "http://e/s", "pre:x": "v",
    }, '''
<http://e/s> <pre:x> "v" .
'''),

    ("prefG_simple_term_gendelim_is_prefix", {}, {
        "@context": {"pre": "http://ex.org/ns#"},
        "@id": "http://e/s", "pre:x": "v",
    }, '''
<http://e/s> <http://ex.org/ns#x> "v" .
'''),

    ("prefG_explicit_prefix_true_non_gendelim", {}, {
        "@context": {"pre": {"@id": "http://ex.org/suffix",
                             "@prefix": True}},
        "@id": "http://e/s", "pre:x": "v",
    }, '''
<http://e/s> <http://ex.org/suffixx> "v" .
'''),

    ("prefG_expanded_term_def_is_not_prefix", {}, {
        # an expanded term definition (map form) is NOT a prefix unless
        # @prefix: true, even with a gen-delim IRI
        "@context": {"pre": {"@id": "http://ex.org/ns#"}},
        "@id": "http://e/s", "pre:x": "v",
    }, '''
<http://e/s> <pre:x> "v" .
'''),

    ("vocabG_hash_resolves_against_base", {}, {
        # JsonLdParser-test.ts:4788 — @vocab: "#" reuses the @base
        "@context": {"@base": "http://example/document", "@vocab": "#"},
        "@type": "Restaurant",
        "@id": "http://example.org/places#BrewEats",
        "name": "Brew Eats",
    }, '''
<http://example.org/places#BrewEats> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://example/document#Restaurant> .
<http://example.org/places#BrewEats> <http://example/document#name> "Brew Eats" .
'''),

    ("vocabG_relative_concat_onto_vocab", {}, {
        # 1.1: a second relative @vocab concatenates onto the current vocab
        "@context": [{"@vocab": "http://v/"}, {"@vocab": "sub/"}],
        "@id": "http://e/s", "p": "v",
    }, '''
<http://e/s> <http://v/sub/p> "v" .
'''),

    ("jsonG_array_value_is_single_literal", {}, {
        # JsonLdParser-test.ts:6830 — @json type: the ARRAY is the value,
        # no fan-out
        "@context": {"e": {"@id": "http://example.com/vocab/json",
                           "@type": "@json"}},
        "e": ["a", True],
    }, '''
_:b0 <http://example.com/vocab/json> "[\\"a\\",true]"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON> .
'''),

    ("jsonG_canonical_key_order_and_numbers", {}, {
        # RFC 8785: lexicographic keys, ES6 shortest-number forms
        "@context": {"e": {"@id": "http://example.com/vocab/json",
                           "@type": "@json"}},
        # tjs04: double-zero 0.0 canonicalizes to 0 (ES ToString)
        "e": {"zzz": "z", "b": 3, "a": True, "f": 2.5, "big": 1e21,
              "z0": 0.0},
    }, '''
_:b0 <http://example.com/vocab/json> "{\\"a\\":true,\\"b\\":3,\\"big\\":1e+21,\\"f\\":2.5,\\"z0\\":0,\\"zzz\\":\\"z\\"}"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON> .
'''),

    ("jsonG_null_value_kept", {}, {
        "@context": {"e": {"@id": "http://example.com/vocab/json",
                           "@type": "@json"}},
        "e": None,
    }, '''
_:b0 <http://example.com/vocab/json> "null"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON> .
'''),

    # --- round-3 batch H: @nest edge cases -------------------------------------
    # (reference anchors: JsonLdParser-test.ts:9416-9691)

    ("nestH_unaliased_keyword", {}, {
        "@context": {"@vocab": "http://example.org/"},
        "@id": "http://e/s", "@nest": {"p": "v"},
    }, '''
<http://e/s> <http://example.org/p> "v" .
'''),

    ("nestH_inner_node_with_id", {}, {
        # @id on a VALUE inside the nest attaches to that value node, not
        # the outer subject (only a direct @id inside @nest collides)
        "@context": {"@vocab": "http://example.org/", "n": "@nest"},
        "@id": "http://e/s",
        "n": {"p": {"@id": "http://e/inner", "q": "w"}},
    }, '''
<http://e/s> <http://example.org/p> <http://e/inner> .
<http://e/inner> <http://example.org/q> "w" .
'''),

    ("nestH_doubly_nested", {}, {
        # JsonLdParser-test.ts:9589
        "@context": {"@vocab": "http://example.org/", "n": "@nest",
                     "m": "@nest"},
        "@id": "http://e/s", "n": {"m": {"p": "v"}},
    }, '''
<http://e/s> <http://example.org/p> "v" .
'''),

    ("nestH_array_of_nests", {}, {
        # JsonLdParser-test.ts:9487
        "@context": {"@vocab": "http://example.org/", "n": "@nest"},
        "@id": "http://e/s", "n": [{"p": "v1"}, {"p": "v2"}],
    }, '''
<http://e/s> <http://example.org/p> "v1" .
<http://e/s> <http://example.org/p> "v2" .
'''),

    # --- round-3 batch I: free-floating + nested graphs ------------------------
    # (reference anchors: JsonLdParser-test.ts:1863-1935, :3946-4095)

    ("ffI_value_node_dropped", {}, {"@value": "free"}, ''),

    ("ffI_list_dropped", {}, {"@list": ["a"]}, ''),

    ("ffI_type_only_bnode_kept", {}, {"@type": "http://e/T"}, '''
_:b0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/T> .
'''),

    ("ffI_id_only_dropped", {}, {"@id": "http://e/s"}, ''),

    ("ffI_graph_of_scalars_dropped", {}, {
        "@graph": [{"@value": "x"}, "y"],
    }, ''),

    ("graphI_nested_quads_middle_id", {}, {
        # JsonLdParser-test.ts:3994 — inner triples land in the MIDDLE
        # graph name; graphs do not nest in RDF datasets
        "@id": "http://e/g1",
        "@graph": {"@id": "http://e/g2",
                   "@graph": {"@id": "http://e/s", "http://e/p": "v"}},
    }, '''
<http://e/s> <http://e/p> "v" <http://e/g2> .
'''),

    ("graphI_nested_quads_anonymous_middle", {}, {
        # JsonLdParser-test.ts:3947 — bnode graph label
        "@graph": {"@graph": {"@id": "http://e/s", "http://e/p": "v"}},
    }, '''
<http://e/s> <http://e/p> "v" _:g .
'''),

    ("graphI_node_props_outside_contents_inside", {}, {
        # JsonLdParser-test.ts:4095 — properties on the graph node go to
        # the default graph; @graph contents (incl. nested objects) get
        # the graph name
        "@id": "http://e/g", "http://e/meta": "m",
        "@graph": {"@id": "http://e/s",
                   "http://e/p": {"@id": "http://e/o",
                                  "http://e/q": "w"}},
    }, '''
<http://e/g> <http://e/meta> "m" .
<http://e/s> <http://e/p> <http://e/o> <http://e/g> .
<http://e/o> <http://e/q> "w" <http://e/g> .
'''),

    # --- round-3 batch J: protected terms + embedded contexts ------------------
    # (reference anchors: JsonLdParser-test.ts:10842-11001, :9691-9737)

    ("protJ_identical_redefinition_allowed", {}, {
        "@context": [{"@vocab": "http://vocab.org/", "@protected": True,
                      "foo": "http://ex.org/foo"},
                     {"foo": "http://ex.org/foo"}],
        "foo": "bar",
    }, '''
_:b0 <http://ex.org/foo> "bar" .
'''),

    ("protJ_property_scoped_override_allowed", {}, {
        # a property-scoped context overrides protected terms legally
        "@context": {"@vocab": "http://vocab.org/", "@protected": True,
                     "foo": "http://ex.org/foo",
                     "scope": {"@context": {"@protected": True,
                               "foo": "http://ex.2.org/foo"}}},
        "scope": {"foo": "bar"},
    }, '''
_:b0 <http://vocab.org/scope> _:b1 .
_:b1 <http://ex.2.org/foo> "bar" .
'''),

    ("protJ_null_scoped_context_clears_protection", {}, {
        # round-3 kernel fix: an explicit @context: null in a term
        # definition IS a scoped context (UNSET != null) — it resets the
        # context so an embedded redefinition is legal
        "@context": {"@protected": True, "foo": "http://ex.org/foo",
                     "scope": {"@id": "http://ex.org/scope",
                               "@context": None}},
        "scope": {"@context": {"foo": "http://ex.2.org/foo"},
                  "foo": "bar"},
    }, '''
_:b0 <http://ex.org/scope> _:b1 .
_:b1 <http://ex.2.org/foo> "bar" .
'''),

    ("protJ_compact_iri_same_target_allowed", {}, {
        "@context": {"@protected": True, "foo": "http://ex.org/foo",
                     "Type": {"@id": "http://ex.org/Type",
                              "@context": {"ex": "http://ex.org/",
                                           "foo": "ex:foo"}}},
        "@type": "Type", "foo": "value",
    }, '''
_:b0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.org/Type> .
_:b0 <http://ex.org/foo> "value" .
'''),

    ("embJ_embedded_context_propagates", {}, {
        "@context": {"@vocab": "http://vocab.org/"},
        "@id": "http://ex.org/myid",
        "foo": {"@context": {"@vocab": "http://vocab.1.org/"},
                "@id": "http://ex.org/i1",
                "bar": {"@id": "http://ex.org/i2", "baz": "buzz"}},
    }, '''
<http://ex.org/myid> <http://vocab.org/foo> <http://ex.org/i1> .
<http://ex.org/i1> <http://vocab.1.org/bar> <http://ex.org/i2> .
<http://ex.org/i2> <http://vocab.1.org/baz> "buzz" .
'''),

    # --- round-3 batch K: container/list/alias/number edge forms --------------
    # (reference anchors: JsonLdParser-test.ts:7112-8511 container families,
    #  :4962 out-of-order contexts, :1396 reverse, Util number forms)

    ('ctrK_idmap_none_key_gets_bnode', {}, {'@context': {'p': {'@id': 'http://e/p', '@container': '@id'}}, '@id': 'http://e/s', 'p': {'@none': {'http://e/q': 'v'}}}, '''
<http://e/s> <http://e/p> _:b0 .
_:b0 <http://e/q> "v" .
'''),

    ('ctrK_idmap_relative_key_document_resolved', {'base_iri': 'http://base/dir/doc'}, {'@context': {'p': {'@id': 'http://e/p', '@container': '@id'}}, '@id': 'http://e/s', 'p': {'rel': {'http://e/q': 'v'}}}, '''
<http://e/s> <http://e/p> <http://base/dir/rel> .
<http://base/dir/rel> <http://e/q> "v" .
'''),

    ('ctrK_idmap_inner_id_beats_key', {}, {'@context': {'p': {'@id': 'http://e/p', '@container': '@id'}}, '@id': 'http://e/s', 'p': {'http://e/k': {'@id': 'http://e/other', 'http://e/q': 'v'}}}, '''
<http://e/s> <http://e/p> <http://e/other> .
<http://e/other> <http://e/q> "v" .
'''),

    ('ctrK_indexmap_array_values_fan_out', {}, {'@context': {'p': {'@id': 'http://e/p', '@container': '@index'}}, '@id': 'http://e/s', 'p': {'i': ['a', 'b']}}, '''
<http://e/s> <http://e/p> "a" .
<http://e/s> <http://e/p> "b" .
'''),

    ('ctrK_indexmap_none_key', {}, {'@context': {'p': {'@id': 'http://e/p', '@container': '@index'}}, '@id': 'http://e/s', 'p': {'@none': 'a'}}, '''
<http://e/s> <http://e/p> "a" .
'''),

    ('ctrK_graph_id_container_names_graph', {}, {'@context': {'p': {'@id': 'http://e/p', '@container': ['@graph', '@id']}}, '@id': 'http://e/s', 'p': {'http://e/g1': {'http://e/q': 'v'}}}, '''
<http://e/s> <http://e/p> <http://e/g1> .
_:b0 <http://e/q> "v" <http://e/g1> .
'''),

    ('ctrK_graph_container_array_two_graphs', {}, {'@context': {'p': {'@id': 'http://e/p', '@container': '@graph'}}, '@id': 'http://e/s', 'p': [{'http://e/q': 'v1'}, {'http://e/q': 'v2'}]}, '''
<http://e/s> <http://e/p> _:g1 .
<http://e/s> <http://e/p> _:g2 .
_:n1 <http://e/q> "v1" _:g1 .
_:n2 <http://e/q> "v2" _:g2 .
'''),

    ('ctrK_graph_container_language_value', {}, {'@context': {'p': {'@id': 'http://e/p', '@container': '@graph'}}, '@id': 'http://e/s', 'p': {'http://e/q': {'@value': 'v', '@language': 'en'}}}, '''
<http://e/s> <http://e/p> _:g .
_:n <http://e/q> "v"@en _:g .
'''),

    ('oooK_top_level_context_after_data', {}, {'@id': 'http://e/s', 'name': 'v', '@context': {'name': 'http://e/name'}}, '''
<http://e/s> <http://e/name> "v" .
'''),

    ('ctrK_langmap_array_values_mixed_none', {}, {'@context': {'p': {'@id': 'http://e/p', '@container': '@language'}}, '@id': 'http://e/s', 'p': {'en': ['a', 'b'], '@none': ['c']}}, '''
<http://e/s> <http://e/p> "a"@en .
<http://e/s> <http://e/p> "b"@en .
<http://e/s> <http://e/p> "c" .
'''),

    ('listK_type_coerced_members', {}, {'@context': {'p': {'@id': 'http://e/p', '@container': '@list', '@type': 'http://www.w3.org/2001/XMLSchema#integer'}}, '@id': 'http://e/s', 'p': ['1', '2']}, '''
<http://e/s> <http://e/p> _:l0 .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> _:l1 .
_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "2"^^<http://www.w3.org/2001/XMLSchema#integer> .
_:l1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
'''),

    ('listK_nested_coordinates', {}, {'@context': {'c': {'@id': 'http://e/c', '@container': '@list'}}, '@id': 'http://e/s', 'c': [[1.1, 2.2]]}, '''
<http://e/s> <http://e/c> _:l0 .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> _:m0 .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
_:m0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "1.1E0"^^<http://www.w3.org/2001/XMLSchema#double> .
_:m0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> _:m1 .
_:m1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "2.2E0"^^<http://www.w3.org/2001/XMLSchema#double> .
_:m1 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
'''),

    ('revK_reverse_term_with_set_container', {}, {'@context': {'children': {'@reverse': 'http://e/parent', '@container': '@set'}}, '@id': 'http://e/s', 'children': [{'@id': 'http://e/c1'}, {'@id': 'http://e/c2'}]}, '''
<http://e/c1> <http://e/parent> <http://e/s> .
<http://e/c2> <http://e/parent> <http://e/s> .
'''),

    ('revK_reverse_keyword_alias', {}, {'@context': {'rev': '@reverse'}, '@id': 'http://e/o', 'rev': {'http://e/p': {'@id': 'http://e/s'}}}, '''
<http://e/s> <http://e/p> <http://e/o> .
'''),

    ('starK_embedded_node_as_object', {}, {'@id': 'http://e/s', 'http://e/claims': {'@id': {'@id': 'http://e/x', 'http://e/y': 'z'}}}, '''
<http://e/s> <http://e/claims> << <http://e/x> <http://e/y> "z" >> .
'''),

    ('aliasK_set_and_list_aliases', {}, {'@context': {'set': '@set', 'list': '@list'}, '@id': 'http://e/s', 'http://e/p': {'set': ['a']}, 'http://e/q': {'list': ['b']}}, '''
<http://e/s> <http://e/p> "a" .
<http://e/s> <http://e/q> _:l0 .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "b" .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
'''),

    ('numK_double_1e21_canonical', {}, {'@id': 'http://e/s', 'http://e/p': 1e+21}, '''
<http://e/s> <http://e/p> "1.0E21"^^<http://www.w3.org/2001/XMLSchema#double> .
'''),

    # --- round-3 batch L: misc coverage (generalized RDF, escapes, combos) ----

    ('miscL_graphmap_none_key_bnode_graph', {}, {'@context': {'p': {'@id': 'http://e/p', '@container': ['@graph', '@id']}}, '@id': 'http://e/s', 'p': {'@none': {'http://e/q': 'v'}}}, '''
<http://e/s> <http://e/p> _:g .
_:n <http://e/q> "v" _:g .
'''),

    ('miscL_json_literal_inside_list', {}, {'@context': {'j': {'@id': 'http://e/j', '@type': '@json'}}, '@id': 'http://e/s', 'http://e/p': {'@list': [{'@value': {'a': 1}, '@type': '@json'}]}}, '''
<http://e/s> <http://e/p> _:l0 .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "{\\"a\\":1}"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON> .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
'''),

    ('miscL_bnode_predicate_generalized_rdf', {'produce_generalized_rdf': True}, {'@id': 'http://e/s', '_:p': 'v'}, '''
<http://e/s> _:p "v" .
'''),

    ('miscL_bnode_predicate_dropped_by_default', {}, {'@id': 'http://e/s', '_:p': 'v'}, '''

'''),

    ('miscL_bool_and_int_type_coercion', {}, {'@context': {'b': {'@id': 'http://e/b', '@type': 'http://www.w3.org/2001/XMLSchema#boolean'}, 'i': {'@id': 'http://e/i', '@type': 'http://www.w3.org/2001/XMLSchema#integer'}}, '@id': 'http://e/s', 'b': True, 'i': 42}, '''
<http://e/s> <http://e/b> "true"^^<http://www.w3.org/2001/XMLSchema#boolean> .
<http://e/s> <http://e/i> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
'''),

    ('miscL_ntriples_escapes_in_literal', {},
     {'@id': 'http://e/s', 'http://e/p': 'line1\n"quoted"\tand\\slash'},
     r'''
<http://e/s> <http://e/p> "line1\n\"quoted\"\tand\\slash" .
'''),

    ('miscL_unknown_keyword_form_dropped', {}, {'@id': 'http://e/s', '@ignoreMe': 'x', 'http://e/p': 'v'}, '''
<http://e/s> <http://e/p> "v" .
'''),

    ('miscL_at_digit_key_vocab_expands', {}, {'@context': {'@vocab': 'http://v/'}, '@id': 'http://e/s', '@123': 'x', 'http://e/p': 'v'}, '''
<http://e/s> <http://e/p> "v" .
<http://e/s> <http://v/@123> "x" .
'''),

    ('miscL_set_with_index_unwraps_keeps_values', {}, {'@id': 'http://e/s', 'http://e/p': {'@set': ['a'], '@index': 'i'}}, '''
<http://e/s> <http://e/p> "a" .
'''),

    ('miscL_compound_literal_inside_list', {'rdf_direction': 'compound-literal'}, {'@context': {'@direction': 'rtl'}, '@id': 'http://e/s', 'http://e/p': {'@list': ['x']}}, '''
<http://e/s> <http://e/p> _:l0 .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> _:c .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#direction> "rtl" .
_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#value> "x" .
'''),

    ('miscL_relative_base_chain_in_ctx_array', {'base_iri': 'http://h.org/a/doc'}, {'@context': [{'@base': 'sub/'}, {'@base': 'deeper/'}], '@id': 'rel', 'http://e/p': 'v'}, '''
<http://h.org/a/sub/deeper/rel> <http://e/p> "v" .
'''),

    ('miscL_vocab_null_resets', {}, {'@context': [{'@vocab': 'http://v/'}, {'@vocab': None}], '@id': 'http://e/s', 'p': 'dropped', 'http://e/q': 'kept'}, '''
<http://e/s> <http://e/q> "kept" .
'''),

    ('miscL_term_language_null_unsets_default', {}, {'@context': {'@language': 'en', 'p': {'@id': 'http://e/p', '@language': None}}, '@id': 'http://e/s', 'p': 'plain'}, '''
<http://e/s> <http://e/p> "plain" .
'''),

    ('miscL_graph_index_set_combo_none_key', {}, {'@context': {'p': {'@id': 'http://e/p', '@container': ['@graph', '@index', '@set']}}, '@id': 'http://e/s', 'p': {'@none': {'http://e/q': 'v'}}}, '''
<http://e/s> <http://e/p> _:g .
_:n <http://e/q> "v" _:g .
'''),

    # --- round-3 batch M: datatype/number boundaries ---------------------------

    ("numM_bnode_type_object", {}, {
        "@id": "http://e/s", "@type": "_:T",
    }, '''
<http://e/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> _:b0 .
'''),

    ("numM_subnormal_double_toExponential15", {}, {
        # matches the reference's Number.toExponential(15) serialization
        # (lib/Util.ts double formatting) bit-for-bit
        "@id": "http://e/s", "http://e/p": 5e-324,
    }, '''
<http://e/s> <http://e/p> "4.940656458412465E-324"^^<http://www.w3.org/2001/XMLSchema#double> .
'''),

    ("numM_max_safe_integer", {}, {
        "@id": "http://e/s", "http://e/p": 9007199254740991,
    }, '''
<http://e/s> <http://e/p> "9007199254740991"^^<http://www.w3.org/2001/XMLSchema#integer> .
'''),

    ("numM_integral_float_is_integer", {}, {
        "@id": "http://e/s", "http://e/p": 3.0,
    }, '''
<http://e/s> <http://e/p> "3"^^<http://www.w3.org/2001/XMLSchema#integer> .
'''),

    ("numM_xsd_date_coercion", {}, {
        "@context": {"d": {"@id": "http://e/d", "@type": "http://www.w3.org/2001/XMLSchema#date"}},
        "@id": "http://e/s", "d": "2024-02-29",
    }, '''
<http://e/s> <http://e/d> "2024-02-29"^^<http://www.w3.org/2001/XMLSchema#date> .
'''),

    ("ctrM_idmap_with_vocab_type_coercion", {}, {
        "@context": {"@vocab": "http://v/",
                     "p": {"@id": "http://e/p", "@container": "@id",
                           "@type": "@vocab"}},
        "@id": "http://e/s", "p": {"http://e/k": "Term"},
    }, '''
<http://e/s> <http://e/p> <http://v/Term> .
'''),

    # --- round-3 batch N: cross-feature combinations ---------------------------
    # (probe-verified against reference semantics; anchors :7723-8051, :9415)

    ("comboN_nest_with_language_container", {}, {
        "@context": {"@vocab": "http://v/", "n": "@nest",
                     "p": {"@id": "http://e/p", "@container": "@language"}},
        "@id": "http://e/s", "n": {"p": {"en": "hi"}},
    }, '''
<http://e/s> <http://e/p> "hi"@en .
'''),

    ("comboN_included_inside_named_graph", {}, {
        "@id": "http://e/g",
        "@graph": {"@id": "http://e/s", "http://e/p": "v",
                   "@included": [{"@id": "http://e/t",
                                  "http://e/q": "w"}]},
    }, '''
<http://e/s> <http://e/p> "v" <http://e/g> .
<http://e/t> <http://e/q> "w" <http://e/g> .
'''),

    ("comboN_reverse_inside_graph_container", {}, {
        "@context": {"@vocab": "http://v/",
                     "g": {"@id": "http://e/g", "@container": "@graph"}},
        "@id": "http://e/s", "g": {"@reverse": {"r": {"@id": "http://e/c"}}},
    }, '''
<http://e/s> <http://e/g> _:g0 .
<http://e/c> <http://v/r> _:n0 _:g0 .
'''),

    ("comboN_json_literal_index_no_effect", {}, {
        "@context": {"j": {"@id": "http://e/j", "@type": "@json"}},
        "@id": "http://e/s",
        "http://e/p": {"@value": [1], "@type": "@json", "@index": "i"},
    }, '''
<http://e/s> <http://e/p> "[1]"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON> .
'''),

    ("comboN_annotation_on_json_literal", {}, {
        "@id": "ex:s",
        "ex:p": {"@value": {"k": 1}, "@type": "@json",
                 "@annotation": {"ex:a": "v"}},
    }, '''
<ex:s> <ex:p> "{\\"k\\":1}"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON> .
<< <ex:s> <ex:p> "{\\"k\\":1}"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON> >> <ex:a> "v" .
'''),

    ("comboN_annotation_inside_included", {}, {
        "@id": "ex:s", "ex:p": "v",
        "@included": [{"@id": "ex:t",
                       "ex:q": {"@id": "ex:o",
                                "@annotation": {"ex:a": "w"}}}],
    }, '''
<ex:s> <ex:p> "v" .
<ex:t> <ex:q> <ex:o> .
<< <ex:t> <ex:q> <ex:o> >> <ex:a> "w" .
'''),

    ("comboN_propagating_type_scope_reaches_depth_two", {}, {
        "@context": {"@vocab": "http://v/",
                     "T": {"@context": {"@propagate": True,
                                        "q": "http://scoped/q"}}},
        "@type": "T", "@id": "http://e/s",
        "g": {"@id": "http://e/n",
              "q": {"@id": "http://e/m", "q": "deep"}},
    }, '''
<http://e/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://v/T> .
<http://e/s> <http://v/g> <http://e/n> .
<http://e/n> <http://scoped/q> <http://e/m> .
<http://e/m> <http://scoped/q> "deep" .
'''),

    ("comboN_reverse_term_chained", {}, {
        "@context": {"@vocab": "http://v/",
                     "parent": {"@reverse": "child"}},
        "@id": "http://e/c",
        "parent": {"@id": "http://e/p2", "parent": {"@id": "http://e/gp"}},
    }, '''
<http://e/p2> <http://v/child> <http://e/c> .
<http://e/gp> <http://v/child> <http://e/p2> .
'''),

    ("comboN_graph_container_through_nest", {}, {
        "@context": {"@vocab": "http://v/", "n": "@nest",
                     "g": {"@id": "http://e/g", "@container": "@graph"}},
        "@id": "http://e/s", "n": {"g": {"q": "v"}},
    }, '''
<http://e/s> <http://e/g> _:g0 .
_:n0 <http://v/q> "v" _:g0 .
'''),

    ("comboN_embedded_star_inside_list", {}, {
        "@id": "ex:s",
        "ex:p": {"@list": [{"@id": {"@id": "ex:a", "ex:q": "v"}}]},
    }, '''
<ex:s> <ex:p> _:l0 .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> << <ex:a> <ex:q> "v" >> .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
'''),

    ("comboN_unresolvable_idmap_keys_drop_everything", {}, {
        # JsonLdParser-test.ts:7870 — relative keys with no base: []
        "@context": {"ex": "http://ex.org/",
                     "p": {"@id": "http://ex.org/pred1",
                           "@container": "@id"}},
        "@id": "http://ex.org/myid",
        "p": {"ignored/1/en": {"http://example.com/posts/body": "body 1"},
              "ignored/1/de": {"http://example.com/posts/body": "body 2"}},
    }, ''),

    # --- round-3 batch O: remote-context edge semantics ------------------------

    ("remO_base_in_remote_context_ignored", {
        "base_iri": "http://doc/",
        "ctx_cache": {"https://c/r": {"@context":
                      {"@base": "http://OTHER/", "p": "http://e/p"}}}}, {
        # W3C 4.1 step 5.7: @base only applies when remote contexts is
        # empty — a remote @base never changes the document base
        "@context": "https://c/r", "@id": "rel", "p": "v",
    }, '''
<http://doc/rel> <http://e/p> "v" .
'''),

    ("remO_version_in_remote_context", {
        "ctx_cache": {"https://c/r": {"@context":
                      {"@version": 1.1, "p": "http://e/p"}}}}, {
        "@context": "https://c/r", "@id": "http://e/s", "p": "v",
    }, '''
<http://e/s> <http://e/p> "v" .
'''),

    ("remO_remote_chain_with_inline_tail", {
        "ctx_cache": {
            "https://c/a": {"@context": ["https://c/b",
                                         {"x": "http://e/x"}]},
            "https://c/b": {"@context": {"y": "http://e/y"}}}}, {
        "@context": "https://c/a", "@id": "http://e/s", "x": "1", "y": "2",
    }, '''
<http://e/s> <http://e/x> "1" .
<http://e/s> <http://e/y> "2" .
'''),

    ("remO_empty_vocab_in_remote_uses_document_base", {
        "base_iri": "http://doc/page",
        "ctx_cache": {"https://c/r": {"@context": {"@vocab": ""}}}}, {
        "@context": "https://c/r", "@id": "http://e/s", "p": "v",
    }, '''
<http://e/s> <http://doc/pagep> "v" .
'''),

    ("remO_property_scoped_remote_context", {
        "ctx_cache": {"https://c/s": {"@context":
                      {"q": "http://scoped/q"}}}}, {
        "@context": {"@vocab": "http://v/",
                     "p": {"@context": "https://c/s"}},
        "@id": "http://e/s", "p": {"q": "v"},
    }, '''
<http://e/s> <http://v/p> _:b0 .
_:b0 <http://scoped/q> "v" .
'''),

    ("remO_same_remote_twice_sequential_ok", {
        "ctx_cache": {"https://c/r": {"@context":
                      {"p": "http://e/p"}}}}, {
        # recursion tracking is per-CHAIN; sequential repeats are legal
        "@context": ["https://c/r", "https://c/r"],
        "@id": "http://e/s", "p": "v",
    }, '''
<http://e/s> <http://e/p> "v" .
'''),

    # --- round-3 batch P: @json type interplay (Util-test.ts:581-604) ----------

    ("jsonP_ctx_type_wraps_inner_value_object", {}, {
        # a context-@json term turns even a {"@value": ...} map into RAW
        # JSON (input_type short-circuits value-object interpretation)
        "@context": {"key": {"@id": "http://e/k", "@type": "@json"}},
        "@id": "http://e/s", "key": {"@value": "abc"},
    }, '''
<http://e/s> <http://e/k> "{\\"@value\\":\\"abc\\"}"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON> .
'''),

    ("jsonP_aliased_json_type_in_value", {}, {
        "@context": {"json": {"@id": "@json"}},
        "@id": "http://e/s",
        "http://e/k": {"@value": {"v": "abc"}, "@type": "json"},
    }, '''
<http://e/s> <http://e/k> "{\\"v\\":\\"abc\\"}"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON> .
'''),

    ("jsonP_ctx_and_value_json_double_wrap", {}, {
        # context @json + literal "@type": "@json" in the map: the WHOLE
        # map (including @type/@value keys) is the JSON value
        # (Util-test.ts:598)
        "@context": {"key": {"@id": "http://e/k", "@type": "@json"}},
        "@id": "http://e/s",
        "key": {"@value": {"v": "abc"}, "@type": "@json"},
    }, '''
<http://e/s> <http://e/k> "{\\"@type\\":\\"@json\\",\\"@value\\":{\\"v\\":\\"abc\\"}}"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON> .
'''),

    # --- round-3 batch Q: vocab-bnode / keyword-alias / graph-alias edges ------

    ("edgeQ_vocab_bnode_generalized_only", {"produce_generalized_rdf": True},
     {"@context": {"@vocab": "_:v"}, "@id": "http://e/s", "p": "v"},
     '''
<http://e/s> _:p "v" .
'''),

    ("edgeQ_vocab_bnode_dropped_by_default", {},
     {"@context": {"@vocab": "_:v"}, "@id": "http://e/s", "p": "v"}, ""),

    ("edgeQ_term_aliased_to_graph_keyword", {},
     {"@context": {"g": "@graph"}, "@id": "http://e/s",
      "g": {"@id": "http://e/i", "http://e/p": "v"}},
     '''
<http://e/i> <http://e/p> "v" <http://e/s> .
'''),

    ("edgeQ_type_alias_with_set_container", {},
     {"@context": {"type": {"@id": "@type", "@container": "@set"}},
      "@id": "http://e/s", "type": ["http://e/T1", "http://e/T2"]},
     '''
<http://e/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/T1> .
<http://e/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/T2> .
'''),

    ("edgeQ_single_at_key_dropped", {},
     {"@id": "http://e/s", "@": "v", "http://e/p": "w"},
     '''
<http://e/s> <http://e/p> "w" .
'''),

    ("edgeQ_type_alias_and_keyword_merge", {},
     {"@context": {"type": "@type"}, "@id": "http://e/s",
      "type": "http://e/T1", "@type": "http://e/T2"},
     '''
<http://e/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/T1> .
<http://e/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/T2> .
'''),

    ("edgeQ_graph_alias_keeps_outer_props_default", {},
     {"@context": {"g": "@graph"},
      "@id": "http://e/outer", "http://e/meta": "m",
      "g": {"@id": "http://e/s", "http://e/p": "v"}},
     '''
<http://e/outer> <http://e/meta> "m" .
<http://e/s> <http://e/p> "v" <http://e/outer> .
'''),

    # --- round-3 batch R: @graph-container combination depth -------------------
    # (reference anchors: JsonLdParser-test.ts:8511-9378)

    ("graphR_index_map_two_graphs", {}, {
        "@context": {"p": {"@id": "http://e/p",
                           "@container": ["@graph", "@index"]}},
        "@id": "http://e/s",
        "p": {"i1": {"http://e/q": "v1"}, "i2": {"http://e/q": "v2"}},
    }, '''
<http://e/s> <http://e/p> _:g1 .
<http://e/s> <http://e/p> _:g2 .
_:n1 <http://e/q> "v1" _:g1 .
_:n2 <http://e/q> "v2" _:g2 .
'''),

    ("graphR_id_map_with_inner_graph_keyword", {}, {
        # the entry already IS a graph object: not double-wrapped; the @id
        # key names the graph
        "@context": {"p": {"@id": "http://e/p",
                           "@container": ["@graph", "@id"]}},
        "@id": "http://e/s",
        "p": {"http://e/g1": {"@graph": {"@id": "http://e/n",
                                         "http://e/q": "v"}}},
    }, '''
<http://e/s> <http://e/p> <http://e/g1> .
<http://e/n> <http://e/q> "v" <http://e/g1> .
'''),

    ("graphR_simple_container_array_values_one_graph", {}, {
        # a plain @graph container entry with an array property keeps ONE
        # graph for the whole entry
        "@context": {"p": {"@id": "http://e/p", "@container": "@graph"}},
        "@id": "http://e/s", "p": {"http://e/q": ["v1", "v2"]},
    }, '''
<http://e/s> <http://e/p> _:g .
_:n <http://e/q> "v1" _:g .
_:n <http://e/q> "v2" _:g .
'''),

    ("graphR_index_map_array_value_two_graphs", {}, {
        # an ARRAY under one index key still yields one graph per node
        "@context": {"p": {"@id": "http://e/p",
                           "@container": ["@graph", "@index"]}},
        "@id": "http://e/s",
        "p": {"i": [{"http://e/q": "v1"}, {"http://e/q": "v2"}]},
    }, '''
<http://e/s> <http://e/p> _:g1 .
<http://e/s> <http://e/p> _:g2 .
_:n1 <http://e/q> "v1" _:g1 .
_:n2 <http://e/q> "v2" _:g2 .
'''),

    # --- round-3 batch S: out-of-order / nesting / mixed arrays ----------------
    # (reference anchors: JsonLdParser-test.ts:5250, :3324, :4095, :11002)

    ("oooS_type_scoped_ctx_after_properties", {}, {
        # non-streaming semantics: @type LAST still re-scopes earlier keys
        "@context": {"@vocab": "http://v/",
                     "Foo": {"@id": "http://e/Foo",
                             "@context": {"bar": "http://scoped/bar"}}},
        "@id": "http://e/s", "bar": "baz", "@type": "Foo",
    }, '''
<http://e/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/Foo> .
<http://e/s> <http://scoped/bar> "baz" .
'''),

    ("nestS_two_levels_of_named_nodes", {}, {
        "@id": "http://e/a",
        "http://e/p": {"@id": "http://e/b",
                       "http://e/q": {"@id": "http://e/c",
                                      "http://e/r": "v"}},
    }, '''
<http://e/a> <http://e/p> <http://e/b> .
<http://e/b> <http://e/q> <http://e/c> .
<http://e/c> <http://e/r> "v" .
'''),

    ("graphS_bnode_child_inherits_graph", {}, {
        "@id": "http://e/g",
        "@graph": {"@id": "http://e/s",
                   "http://e/p": {"http://e/q": "v"}},
    }, '''
<http://e/s> <http://e/p> _:b0 <http://e/g> .
_:b0 <http://e/q> "v" <http://e/g> .
'''),

    ("arrS_raw_scalar_array_fan_out", {}, {
        "@id": "ex:id", "ex:p": [1, True, "x", 2.5],
    }, '''
<ex:id> <ex:p> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .
<ex:id> <ex:p> "true"^^<http://www.w3.org/2001/XMLSchema#boolean> .
<ex:id> <ex:p> "x" .
<ex:id> <ex:p> "2.5E0"^^<http://www.w3.org/2001/XMLSchema#double> .
'''),

    ("arrS_mixed_nodes_and_values", {}, {
        "@id": "http://e/s",
        "http://e/p": ["lit", {"@id": "http://e/o"}, {"@value": 5}],
    }, '''
<http://e/s> <http://e/p> "lit" .
<http://e/s> <http://e/p> <http://e/o> .
<http://e/s> <http://e/p> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .
'''),

    ("graphS_alternating_graph_node_graph", {}, {
        "@id": "http://e/g1",
        "@graph": {"@id": "http://e/s",
                   "http://e/p": {"@id": "http://e/g2",
                                  "@graph": {"@id": "http://e/t",
                                             "http://e/q": "v"}}},
    }, '''
<http://e/s> <http://e/p> <http://e/g2> <http://e/g1> .
<http://e/t> <http://e/q> "v" <http://e/g2> .
'''),

    # --- round-3 batch T: @included chains / node merge / compact-IRI edges ----

    ("incT_nested_included_chain", {}, {
        "@id": "http://e/a", "http://e/p": "v",
        "@included": {"@id": "http://e/b", "http://e/q": "w",
                      "@included": {"@id": "http://e/c",
                                    "http://e/r": "z"}},
    }, '''
<http://e/a> <http://e/p> "v" .
<http://e/b> <http://e/q> "w" .
<http://e/c> <http://e/r> "z" .
'''),

    ("incT_included_alias", {}, {
        "@context": {"inc": "@included"},
        "@id": "http://e/a", "http://e/p": "v",
        "inc": {"@id": "http://e/b", "http://e/q": "w"},
    }, '''
<http://e/a> <http://e/p> "v" .
<http://e/b> <http://e/q> "w" .
'''),

    ("mergeT_same_node_in_three_graphs", {}, [
        {"@id": "http://e/g1",
         "@graph": {"@id": "http://e/s", "http://e/p": "v1"}},
        {"@id": "http://e/g2",
         "@graph": {"@id": "http://e/s", "http://e/p": "v2"}},
        {"@id": "http://e/s", "http://e/p": "v0"},
    ], '''
<http://e/s> <http://e/p> "v0" .
<http://e/s> <http://e/p> "v1" <http://e/g1> .
<http://e/s> <http://e/p> "v2" <http://e/g2> .
'''),

    ("mergeT_shared_bnode_label_coreference", {}, [
        {"@id": "_:x", "http://e/p": "v1"},
        {"@id": "_:x", "http://e/q": "v2"},
    ], '''
_:x <http://e/p> "v1" .
_:x <http://e/q> "v2" .
'''),

    ("iriT_compact_iri_empty_suffix", {}, {
        "@context": {"pre": "http://e/ns#"},
        "@id": "http://e/s", "pre:": "v",
    }, '''
<http://e/s> <http://e/ns#> "v" .
'''),

    ("iriT_compact_iri_slashed_suffix", {}, {
        "@context": {"pre": "http://e/ns/"},
        "@id": "http://e/s", "pre:a/b": "v",
    }, '''
<http://e/s> <http://e/ns/a/b> "v" .
'''),

    ("starT_annotation_on_reverse_edge_in_graph", {}, {
        "@id": "http://e/g",
        "@graph": {"@context": {"r": {"@reverse": "http://e/p"}},
                   "@id": "http://e/o",
                   "r": {"@id": "http://e/s",
                         "@annotation": {"http://e/a": "v"}}},
    }, '''
<http://e/s> <http://e/p> <http://e/o> <http://e/g> .
<< <http://e/s> <http://e/p> <http://e/o> >> <http://e/a> "v" <http://e/g> .
'''),

    ("valT_zero_length_string_literal", {}, {
        "@id": "http://e/s", "http://e/p": "",
    }, '''
<http://e/s> <http://e/p> "" .
'''),

    ("valT_empty_language_means_no_language", {}, {
        # falsy-empty @language: PLAIN literal (reference Util.ts:
        # '' valueLanguage skips every language branch)
        "@id": "http://e/s",
        "http://e/p": {"@value": "x", "@language": ""},
    }, '''
<http://e/s> <http://e/p> "x" .
'''),

    # --- round-3 batch U: reverse-map ctx / property-index / set-of-lists ------
    # (reference anchors: JsonLdParser-test.ts:1730, :7330, :2269)

    ("revU_context_inside_reverse_map", {}, {
        # JsonLdParser-test.ts:1730 — @context embedded in the @reverse map
        "@id": "http://ex.org/obj1",
        "@reverse": {"@context": {"@vocab": "https://t.ttl#"},
                     "view": {"@id": "http://ex.org/obj2"}},
    }, '''
<http://ex.org/obj2> <https://t.ttl#view> <http://ex.org/obj1> .
'''),

    ("pidxU_property_index_array_values", {}, {
        "@context": {"p": {"@id": "http://e/p", "@container": "@index",
                           "@index": "http://e/prop"}},
        "@id": "http://e/s",
        "p": {"k": [{"@id": "http://e/a"}, {"@id": "http://e/b"}]},
    }, '''
<http://e/s> <http://e/p> <http://e/a> .
<http://e/s> <http://e/p> <http://e/b> .
<http://e/a> <http://e/prop> "k" .
<http://e/b> <http://e/prop> "k" .
'''),

    ("pidxU_property_index_merges_existing_values", {}, {
        "@context": {"p": {"@id": "http://e/p", "@container": "@index",
                           "@index": "http://e/prop"}},
        "@id": "http://e/s",
        "p": {"k": {"@id": "http://e/a", "http://e/prop": "pre"}},
    }, '''
<http://e/s> <http://e/p> <http://e/a> .
<http://e/a> <http://e/prop> "k" .
<http://e/a> <http://e/prop> "pre" .
'''),

    ("nodeU_index_entry_is_metadata_only", {}, {
        "@id": "http://e/s",
        "http://e/p": {"@id": "http://e/o", "@index": "i",
                       "http://e/q": "v"},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
<http://e/o> <http://e/q> "v" .
'''),

    ("protU_protected_inside_type_scoped_ok", {}, {
        "@context": {"@vocab": "http://v/",
                     "T": {"@context": {"@protected": True,
                                        "q": "http://scoped/q"}}},
        "@type": "T", "@id": "http://e/s", "q": "v",
    }, '''
<http://e/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://v/T> .
<http://e/s> <http://scoped/q> "v" .
'''),

    ("listU_set_of_two_lists", {}, {
        "@id": "http://e/s",
        "http://e/p": {"@set": [{"@list": ["a"]}, {"@list": ["b"]}]},
    }, '''
<http://e/s> <http://e/p> _:l0 .
<http://e/s> <http://e/p> _:m0 .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "a" .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
_:m0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "b" .
_:m0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
'''),

    ("graphU_keyword_array_contents", {}, {
        "@id": "http://e/g",
        "@graph": [{"@id": "http://e/s1", "http://e/p": "v1"},
                   {"@id": "http://e/s2", "http://e/p": "v2"}],
    }, '''
<http://e/s1> <http://e/p> "v1" <http://e/g> .
<http://e/s2> <http://e/p> "v2" <http://e/g> .
'''),

    ("revU_multiple_reverse_props_with_arrays", {}, {
        "@id": "http://e/o",
        "@reverse": {"http://e/p1": {"@id": "http://e/s1"},
                     "http://e/p2": [{"@id": "http://e/s2"},
                                     {"@id": "http://e/s3"}]},
    }, '''
<http://e/s1> <http://e/p1> <http://e/o> .
<http://e/s2> <http://e/p2> <http://e/o> .
<http://e/s3> <http://e/p2> <http://e/o> .
'''),

    ("setU_aliased_set_of_value_objects", {}, {
        "@context": {"theset": "@set"},
        "@id": "http://e/s",
        "http://e/p": {"theset": [{"@value": 1}, {"@value": 2}]},
    }, '''
<http://e/s> <http://e/p> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://e/s> <http://e/p> "2"^^<http://www.w3.org/2001/XMLSchema#integer> .
'''),

    # --- round-3 batch V: type-scoped context depth -----------------------------
    # (reference anchors: JsonLdParser-test.ts:10152-10537)

    ("tsV_two_types_lexicographic_override", {}, {
        # scoped ctxs apply in LEXICAL type order; last one wins the term
        "@context": {"@vocab": "http://vocab.org/",
                     "Foo1": {"@id": "http://ex.org/Foo1",
                              "@context": {"bar": "http://ex.1.org/bar"}},
                     "Foo2": {"@id": "http://ex.org/Foo2",
                              "@context": {"bar": "http://ex.2.org/bar"}}},
        "@type": ["Foo1", "Foo2"], "@id": "http://ex.org/myid",
        "bar": "baz",
    }, '''
<http://ex.org/myid> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.org/Foo1> .
<http://ex.org/myid> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.org/Foo2> .
<http://ex.org/myid> <http://ex.2.org/bar> "baz" .
'''),

    ("tsV_two_types_document_order_irrelevant", {}, {
        "@context": {"@vocab": "http://vocab.org/",
                     "Foo1": {"@id": "http://ex.org/Foo1",
                              "@context": {"bar": "http://ex.1.org/bar"}},
                     "Foo2": {"@id": "http://ex.org/Foo2",
                              "@context": {"bar": "http://ex.2.org/bar"}}},
        "@type": ["Foo2", "Foo1"], "@id": "http://ex.org/myid",
        "bar": "baz",
    }, '''
<http://ex.org/myid> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.org/Foo1> .
<http://ex.org/myid> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.org/Foo2> .
<http://ex.org/myid> <http://ex.2.org/bar> "baz" .
'''),

    ("tsV_type_scoped_base_rebases_id", {}, {
        # JsonLdParser-test.ts:10363 — a type-scoped @base applies to the
        # node's OWN @id
        "@context": {"@base": "http://example/base-base",
                     "@vocab": "http://example/",
                     "foo": "http://example/foo",
                     "Type": {"@context":
                              {"@base": "http://example/typed-base"}}},
        "@id": "#base-id",
        "p": {"@type": "Type", "@id": "#typed-id"},
    }, '''
<http://example/base-base#base-id> <http://example/p> <http://example/typed-base#typed-id> .
<http://example/typed-base#typed-id> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://example/Type> .
'''),

    ("tsV_value_alias_from_type_scope", {}, {
        # JsonLdParser-test.ts:10478 — a type-scoped @value alias applies
        # to child value nodes
        "@context": {"@vocab": "ex:",
                     "Type": {"@context": {"value": "@value"}}},
        "@id": "ex:outer",
        "prop": {"@type": "Type", "@id": "ex:inner",
                 "prop": {"value": "v2"}},
    }, '''
<ex:outer> <ex:prop> <ex:inner> .
<ex:inner> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <ex:Type> .
<ex:inner> <ex:prop> "v2" .
'''),

    ("tsV_type_scoped_datatype_coercion", {}, {
        "@context": {"@vocab": "http://vocab.org/",
                     "Foo": {"@id": "http://ex.org/Foo",
                             "@context": {"bar": {"@id": "http://ex.org/bar",
                                          "@type": "http://ex.org/dt"}}}},
        "@type": "Foo", "@id": "http://ex.org/myid", "bar": "baz",
    }, '''
<http://ex.org/myid> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.org/Foo> .
<http://ex.org/myid> <http://ex.org/bar> "baz"^^<http://ex.org/dt> .
'''),

    # --- round-3 batch W: @none multiplicity / free-floating reverse -----------

    ("noneW_idmap_keyword_and_alias_both_bnodes", {}, {
        # @none appearing twice (keyword + alias) yields TWO distinct bnodes
        "@context": {"p": {"@id": "http://e/p", "@container": "@id"},
                     "none": "@none"},
        "@id": "http://e/s",
        "p": {"@none": {"http://e/q": "a"}, "none": {"http://e/q": "b"}},
    }, '''
<http://e/s> <http://e/p> _:n1 .
<http://e/s> <http://e/p> _:n2 .
_:n1 <http://e/q> "a" .
_:n2 <http://e/q> "b" .
'''),

    ("revW_top_level_reverse_only_node", {}, {
        # a node with only @reverse is NOT free-floating: the reversed
        # triple keeps its bnode object
        "@reverse": {"http://e/p": {"@id": "http://e/o"}},
    }, '''
<http://e/o> <http://e/p> _:b0 .
'''),

    ("noneW_typemap_none_key_adds_no_type", {}, {
        "@context": {"p": {"@id": "http://e/p", "@container": "@type"}},
        "@id": "http://e/s",
        "p": {"@none": {"@id": "http://e/n", "http://e/q": "v"}},
    }, '''
<http://e/s> <http://e/p> <http://e/n> .
<http://e/n> <http://e/q> "v" .
'''),

    ("dirW_language_map_with_term_direction_compound", {
        "rdf_direction": "compound-literal"}, {
        "@context": {"p": {"@id": "http://e/p", "@container": "@language",
                           "@direction": "ltr"}},
        "@id": "http://e/s", "p": {"en": "hi"},
    }, '''
<http://e/s> <http://e/p> _:c .
_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#value> "hi" .
_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#language> "en" .
_:c <http://www.w3.org/1999/02/22-rdf-syntax-ns#direction> "ltr" .
'''),

    # --- round-3 batch X: RDF-star embedded-subject depth -----------------------
    # (reference anchors: JsonLdParser-test.ts:11055-11441)

    ("starX_embedded_subject_with_type_triple", {}, {
        # the embedded triple may be an rdf:type assertion (:11092)
        "@id": {"@id": "ex:es", "@type": "ex:T"}, "ex:p": "v",
    }, '''
<< <ex:es> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <ex:T> >> <ex:p> "v" .
'''),

    ("starX_nested_embedded_subject", {}, {
        # :11208 — embedded node inside an embedded node (subject side)
        "@id": {"@id": {"@id": "ex:in", "ex:ip": "iv"}, "ex:mp": "mv"},
        "ex:op": "ov",
    }, '''
<< << <ex:in> <ex:ip> "iv" >> <ex:mp> "mv" >> <ex:op> "ov" .
'''),

    ("starX_embedded_subject_inside_named_graph", {}, {
        # :11129 — the GRAPH applies to the asserting quad; quoted triples
        # never inherit a graph
        "@id": "ex:g",
        "@graph": {"@id": {"@id": "ex:es", "ex:ep": "ev"}, "ex:p": "v"},
    }, '''
<< <ex:es> <ex:ep> "ev" >> <ex:p> "v" <ex:g> .
'''),

    ("starX_nested_embedded_object_object", {}, {
        # :11324 — embedded node as object whose own object is embedded
        "@id": "ex:s",
        "ex:p": {"@id": {"@id": "ex:a",
                         "ex:q": {"@id": {"@id": "ex:b",
                                          "ex:r": "rv"}}}},
    }, '''
<ex:s> <ex:p> << <ex:a> <ex:q> << <ex:b> <ex:r> "rv" >> >> .
'''),

    ("starX_reverse_in_embedded_opt_in_ctx_term", {
        "rdfstar_reverse_in_embedded": True}, {
        # :11381 — context-reverse term inside an embedded node, opt-in
        "@context": {"rev": {"@reverse": "ex:p"}},
        "@id": {"@id": "ex:es", "rev": {"@id": "ex:other"}},
        "ex:q": "v",
    }, '''
<< <ex:other> <ex:p> <ex:es> >> <ex:q> "v" .
'''),

    # --- round-3 batch Y: keyword-alias chains / inner ctx in arrays -----------
    # (reference anchors: JsonLdParser-test.ts:6487-6739)

    ("aliasY_multilevel_id_chain", {}, {
        # an alias OF an alias still reaches @id (:6501)
        "@context": [{"id": "@id"}, {"url": "id"}],
        "url": "http://ex.org/myid",
        "http://xmlns.com/foaf/0.1/name": "Bob",
    }, '''
<http://ex.org/myid> <http://xmlns.com/foaf/0.1/name> "Bob" .
'''),

    ("aliasY_id_alias_resolves_relative", {"base_iri": "http://ex.org/"}, {
        "@context": {"url": "@id"},
        "url": "/myid",
        "http://xmlns.com/foaf/0.1/name": "Bob",
    }, '''
<http://ex.org/myid> <http://xmlns.com/foaf/0.1/name> "Bob" .
'''),

    ("aliasY_id_alias_via_expanded_def", {}, {
        "@context": {"url": {"@id": "@id"}},
        "url": "http://ex.org/myid",
        "http://xmlns.com/foaf/0.1/name": "Bob",
    }, '''
<http://ex.org/myid> <http://xmlns.com/foaf/0.1/name> "Bob" .
'''),

    ("aliasY_reverse_of_keyword_term_ignored", {}, {
        # W3C create-term-definition 13.4: @reverse of a keyword form is a
        # SHOULD-warn + term IGNORED (the reference hard-errors here —
        # this repo follows the W3C suite behavior, which its earl run
        # grades against)
        "@context": {"a": {"@reverse": "@type"}},
        "@id": "http://ex.org/myid", "a": "http://ex.org/bla",
    }, ''),

    ("ctxY_inner_context_scoped_to_array_member", {}, {
        # an embedded @context inside ONE array member does not leak to
        # its siblings (:6715)
        "@context": {"@vocab": "http://v/"},
        "@id": "http://e/s",
        "p": [{"@context": {"q": "http://inner/q"},
               "@id": "http://e/a", "q": "v1"},
              {"@id": "http://e/b", "q": "v2"}],
    }, '''
<http://e/s> <http://v/p> <http://e/a> .
<http://e/s> <http://v/p> <http://e/b> .
<http://e/a> <http://inner/q> "v1" .
<http://e/b> <http://v/q> "v2" .
'''),

    # --- round-3 batch Z: bnode-pred terms / coercion boundaries ----------------
    # (reference anchors: JsonLdParser-test.ts:6357-6485, :6183, :6693)

    ("bnZ_term_mapped_to_bnode_pred_generalized",
     {"produce_generalized_rdf": True}, {
        "@context": {"p": "_:bp"}, "@id": "http://e/s", "p": "v",
    }, '''
<http://e/s> _:bp "v" .
'''),

    ("bnZ_term_mapped_to_bnode_pred_dropped", {}, {
        "@context": {"p": "_:bp"}, "@id": "http://e/s", "p": "v",
    }, ""),

    ("ctxZ_full_iri_as_term_with_coercion", {}, {
        # a context may define a FULL IRI as a term to add coercion (:6183)
        "@context": {"http://e/knows": {"@type": "@id"}},
        "@id": "http://e/s", "http://e/knows": "http://e/o",
    }, '''
<http://e/s> <http://e/knows> <http://e/o> .
'''),

    ("ctxZ_inner_context_inside_graph_entry", {}, {
        # :6693 — quads with nested contexts
        "@id": "http://e/g",
        "@graph": {"@context": {"@vocab": "http://inner/"},
                   "@id": "http://e/s", "p": "v"},
    }, '''
<http://e/s> <http://inner/p> "v" <http://e/g> .
'''),

    ("coerZ_type_none_disables_coercion", {}, {
        "@context": {"p": {"@id": "http://e/p", "@type": "@none"}},
        "@id": "http://e/s", "p": "http://looks-like-iri/",
    }, '''
<http://e/s> <http://e/p> "http://looks-like-iri/" .
'''),

    ("coerZ_fractional_double_keeps_coerced_datatype", {}, {
        # non-integral numbers serialize in canonical double form but KEEP
        # the coerced datatype (W3C object-to-rdf)
        "@context": {"p": {"@id": "http://e/p",
                           "@type": "http://www.w3.org/2001/XMLSchema#integer"}},
        "@id": "http://e/s", "p": 3.2,
    }, '''
<http://e/s> <http://e/p> "3.2E0"^^<http://www.w3.org/2001/XMLSchema#integer> .
'''),

    ("coerZ_bool_with_string_coercion_plain", {}, {
        "@context": {"p": {"@id": "http://e/p",
                           "@type": "http://www.w3.org/2001/XMLSchema#string"}},
        "@id": "http://e/s", "p": True,
    }, '''
<http://e/s> <http://e/p> "true" .
'''),

    ("coerZ_default_language_never_tags_numbers", {}, {
        "@context": {"@language": "en"},
        "@id": "http://e/s", "http://e/p": 7,
    }, '''
<http://e/s> <http://e/p> "7"^^<http://www.w3.org/2001/XMLSchema#integer> .
'''),

    # --- round-3 final fill: BCP47 long forms / remote+inline arrays -----------

    ("bcpF_extlang_script_region", {}, {
        "@id": "http://e/s",
        "http://e/p": {"@value": "x", "@language": "zh-cmn-Hans-CN"},
    }, '''
<http://e/s> <http://e/p> "x"@zh-cmn-hans-cn .
'''),

    ("bcpF_singleton_extension", {}, {
        "@id": "http://e/s",
        "http://e/p": {"@value": "x", "@language": "de-DE-u-co-phonebk"},
    }, '''
<http://e/s> <http://e/p> "x"@de-de-u-co-phonebk .
'''),

    ("ctxF_remote_then_inline_override_in_array", {
        "ctx_cache": {"https://c/base": {"@context":
                      {"@vocab": "http://remote/",
                       "a": "http://remote/A"}}}}, {
        "@context": ["https://c/base", {"a": "http://local/A"}],
        "@id": "http://e/s", "a": "1", "b": "2",
    }, '''
<http://e/s> <http://local/A> "1" .
<http://e/s> <http://remote/b> "2" .
'''),

    ("setF_empty_set_drops_property", {}, {
        "@id": "http://e/s", "http://e/p": {"@set": []},
    }, ""),

    ("listF_null_members_filtered", {}, {
        "@id": "http://e/s", "http://e/p": {"@list": [None, "a", None]},
    }, '''
<http://e/s> <http://e/p> _:l0 .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> "a" .
_:l0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#rest> <http://www.w3.org/1999/02/22-rdf-syntax-ns#nil> .
'''),
]


# --- W3C EARL traceability batch (round 4): fixtures covering toRdf test
# behaviors that had no direct counterpart in the corpus. Each name cites
# the W3C toRdf-manifest id(s) it covers (see tests/w3c_earl_map.py).
W3C_GAP_FIXTURES = [
    ("w3c_t0032_ctx_order", {}, {
        # t0032/t0034: term definitions independent of @context key order
        # (a term referencing a prefix defined LATER in the same context)
        "@context": {"t": "pre:suffix", "pre": "http://e/ns/"},
        "@id": "http://e/s", "t": "v",
    }, '''
<http://e/s> <http://e/ns/suffix> "v" .
'''),

    ("w3c_t0033_id_not_first", {}, {
        # t0033/te074: @id after other properties (objects are unordered)
        "http://e/p": "v", "@id": "http://e/s",
    }, '''
<http://e/s> <http://e/p> "v" .
'''),

    ("w3c_tc008_aliased_type_scoped", {}, {
        # tc008: an ALIAS of @type still triggers type-scoped contexts
        "@context": {"type": "@type",
                     "T": {"@id": "http://e/T",
                           "@context": {"p": "http://e/scoped_p"}}},
        "@id": "http://e/s", "type": "T", "p": "v",
    }, f'''
<http://e/s> <{RDF}type> <http://e/T> .
<http://e/s> <http://e/scoped_p> "v" .
'''),

    ("w3c_tc016_type_scoped_vocab", {}, {
        # tc016: type-scoped context sets @vocab
        "@context": {"T": {"@id": "http://e/T",
                           "@context": {"@vocab": "http://v/"}}},
        "@id": "http://e/s", "@type": "T", "p": "v",
    }, f'''
<http://e/s> <{RDF}type> <http://e/T> .
<http://e/s> <http://v/p> "v" .
'''),

    ("w3c_tc018_prevctx_types", {}, {
        # tc018: multiple @type values expand against the PREVIOUS context,
        # not against contexts introduced by earlier type-scoped terms
        "@context": {"B": "http://outer/B",
                     "A": {"@id": "http://e/A",
                           "@context": {"B": "http://inner/B"}}},
        "@id": "http://e/s", "@type": ["A", "B"],
    }, f'''
<http://e/s> <{RDF}type> <http://e/A> .
<http://e/s> <{RDF}type> <http://outer/B> .
'''),

    ("w3c_tc025_type_scoped_graph_container", {}, {
        # tc025: type-scoped context defining an @graph container term
        "@context": {"T": {"@id": "http://e/T",
                           "@context": {"g": {"@id": "http://e/g",
                                              "@container": "@graph"}}}},
        "@id": "http://e/s", "@type": "T", "g": {"http://e/p": "v"},
    }, f'''
<http://e/s> <{RDF}type> <http://e/T> .
<http://e/s> <http://e/g> _:g0 .
_:n0 <http://e/p> "v" _:g0 .
'''),

    ("w3c_te027_list_dups", {}, {
        # te027: duplicates KEPT in @list cells; identical set triples
        # collapse under RDF dataset set-semantics
        "@id": "http://e/s",
        "http://e/l": {"@list": ["a", "a"]},
        "http://e/m": {"@set": ["b", "b"]},
    }, f'''
<http://e/s> <http://e/l> _:l0 .
_:l0 <{RDF}first> "a" .
_:l0 <{RDF}rest> _:l1 .
_:l1 <{RDF}first> "a" .
_:l1 <{RDF}rest> <{RDF}nil> .
<http://e/s> <http://e/m> "b" .
'''),

    ("w3c_te034_same_iri_props", {}, {
        # te034: multiple terms expanding to the same IRI merge values
        "@context": {"a": "http://e/p", "b": "http://e/p"},
        "@id": "http://e/s", "a": "x", "b": "y",
    }, '''
<http://e/s> <http://e/p> "x" .
<http://e/s> <http://e/p> "y" .
'''),

    ("w3c_te044_index_lang", {}, {
        # te044: index-container values use the term language mapping
        "@context": {"p": {"@id": "http://e/p", "@container": "@index",
                           "@language": "de"}},
        "@id": "http://e/s", "p": {"i1": "hallo"},
    }, '''
<http://e/s> <http://e/p> "hallo"@de .
'''),

    ("w3c_te048_term_in_id", {"base_iri": "http://base.org/"}, {
        # te048/t0048: terms are NOT used when expanding @id values —
        # "t" resolves as a document-relative IRI, not via the term
        "@context": {"t": "http://e/abs"},
        "@id": "t", "http://e/p": "v",
    }, '''
<http://base.org/t> <http://e/p> "v" .
'''),

    ("w3c_te049_reverse_id_strings", {}, {
        # te049: strings as values of a reverse property via @type: @id
        "@context": {"children": {"@reverse": "http://e/parent",
                                  "@type": "@id"}},
        "@id": "http://e/s", "children": "http://e/c",
    }, '''
<http://e/c> <http://e/parent> <http://e/s> .
'''),

    ("w3c_te113_js_names", {}, {
        # te113: JavaScript Object property names are ordinary terms
        "@context": {"@vocab": "http://v/"},
        "@id": "http://e/s", "constructor": "x", "toString": "y",
    }, '''
<http://e/s> <http://v/constructor> "x" .
<http://e/s> <http://v/toString> "y" .
'''),

    ("w3c_te117_colon_term", {}, {
        # te117: a term beginning with a colon is a term, not an IRI
        "@context": {":term": "http://e/colon"},
        "@id": "http://e/s", ":term": "v",
    }, '''
<http://e/s> <http://e/colon> "v" .
'''),

    ("w3c_te118_colon_value", {}, {
        # te118: a VALUE beginning with a colon expands via the term, and
        # is not treated as an absolute IRI
        "@context": {":v": "http://e/cv",
                     "p": {"@id": "http://e/p", "@type": "@vocab"}},
        "@id": "http://e/s", "p": ":v",
    }, '''
<http://e/s> <http://e/p> <http://e/cv> .
'''),

    ("w3c_te120_id_keyword_form", {}, {
        # te120: @id values in keyword form are ignored -> bnode subject
        "@id": "@bogus", "http://e/p": "v",
    }, '''
_:b0 <http://e/p> "v" .
'''),

    ("w3c_te126_recursive_scoped_direct", {"ctx_cache": {
        "https://c/self": {"@context": {
            "t": {"@id": "http://e/t", "@context": "https://c/self"}}}}}, {
        # te126: a scoped context may reference itself directly
        "@context": "https://c/self", "@id": "http://e/s", "t": {"t": "v"},
    }, '''
<http://e/s> <http://e/t> _:x .
_:x <http://e/t> "v" .
'''),

    ("w3c_te127_recursive_scoped_indirect", {"ctx_cache": {
        "https://c/a2": {"@context": {
            "t": {"@id": "http://e/t", "@context": "https://c/b2"}}},
        "https://c/b2": {"@context": {
            "u": {"@id": "http://e/u", "@context": "https://c/a2"}}}}}, {
        # te127: scoped contexts may reference each other in a cycle
        "@context": "https://c/a2", "@id": "http://e/s",
        "t": {"u": {"t": "v"}},
    }, '''
<http://e/s> <http://e/t> _:x .
_:x <http://e/u> _:y .
_:y <http://e/t> "v" .
'''),

    ("w3c_tjs09_jcs_strings", {}, {
        # tjs09: RFC 8785 string canonicalization — two-char escapes where
        # defined, \u00xx lowercase hex otherwise, literal non-ASCII
        "@context": {"p": {"@id": "http://e/p", "@type": "@json"}},
        "@id": "http://e/s", "p": {"s": "a\b\u000b\u00e9\"q\""},
    }, f'''
<http://e/s> <http://e/p> "{{\\"s\\":\\"a\\\\b\\\\u000b\u00e9\\\\\\"q\\\\\\"\\"}}"^^<{RDF}JSON> .
'''),

    ("w3c_tjs11_jcs_unicode", {}, {
        # tjs11: JCS sorts object keys by UTF-16 code units
        "@context": {"p": {"@id": "http://e/p", "@type": "@json"}},
        "@id": "http://e/s", "p": {"\u00e9": 1, "e": 2},
    }, f'''
<http://e/s> <http://e/p> "{{\\"e\\":2,\\"\u00e9\\":1}}"^^<{RDF}JSON> .
'''),

    ("w3c_tnt_controls", {}, {
        # tnt03-tnt16: N-Triples handling of control characters and quote
        # forms: \t as ECHAR, raw \b/\f (STRING_LITERAL_QUOTE only
        # forbids 0x22 0x5C 0x0A 0x0D), escaped dquote, literal squotes
        # tnt08: two consecutive dquotes ""u — each escaped separately
        "@id": "http://e/s",
        "http://e/p": "x'y''z\"w\"\"u\b\fq\tr",
    }, '''
<http://e/s> <http://e/p> "x'y''z\\"w\\"\\"u\b\fq\\tr" .
'''),

    ("w3c_tpi10_none", {}, {
        # tpi10: property-valued index emits NO property for @none keys
        "@context": {"p": {"@id": "http://e/p", "@container": "@index",
                           "@index": "http://e/prop"}},
        "@id": "http://e/s", "p": {"@none": {"@id": "http://e/o"}},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
'''),

    ("w3c_tpi11_graph_pindex", {}, {
        # tpi11: property-valued index adds the property to a graph object
        "@context": {"p": {"@id": "http://e/p",
                           "@container": ["@graph", "@index"],
                           "@index": "http://e/prop"}},
        "@id": "http://e/s", "p": {"i1": {"http://e/q": "v"}},
    }, '''
<http://e/s> <http://e/p> _:g0 .
_:g0 <http://e/prop> "i1" .
_:n0 <http://e/q> "v" _:g0 .
'''),

    ("w3c_tpr02_protected_false", {}, {
        # tpr02/tpr04/tpr13: @protected: false opts a term out of a
        # protected context; overriding it later is legal
        "@context": [{"@protected": True, "a": "http://e/a",
                      "b": {"@id": "http://e/b", "@protected": False}},
                     {"b": "http://e/b2"}],
        "@id": "http://e/s", "a": "x", "b": "y",
    }, '''
<http://e/s> <http://e/a> "x" .
<http://e/s> <http://e/b2> "y" .
'''),

    ("w3c_tpr30_protected_keyword", {}, {
        # tpr30: keyword aliases may be protected
        "@context": {"type": {"@id": "@type", "@protected": True}},
        "@id": "http://e/s", "type": "http://e/T",
    }, f'''
<http://e/s> <{RDF}type> <http://e/T> .
'''),

    ("w3c_tso05_import_propagate_type", {"ctx_cache": {
        "https://c/imp": {"@context": {"p": "http://e/p"}}}}, {
        # tso05: @import inside a type-scoped context with @propagate: true
        "@context": {"T": {"@id": "http://e/T",
                           "@context": {"@import": "https://c/imp",
                                        "@propagate": True}}},
        "@id": "http://e/s", "@type": "T",
        "http://e/child": {"@id": "http://e/c", "p": "v"},
    }, f'''
<http://e/s> <{RDF}type> <http://e/T> .
<http://e/s> <http://e/child> <http://e/c> .
<http://e/c> <http://e/p> "v" .
'''),

    ("w3c_tso06_import_propagate_prop", {"ctx_cache": {
        "https://c/imp": {"@context": {"p": "http://e/p"}}}}, {
        # tso06: @import inside a property-scoped context with
        # @propagate: false — applies one level, reverts below
        "@context": {"n": {"@id": "http://e/n",
                           "@context": {"@import": "https://c/imp",
                                        "@propagate": False}}},
        "@id": "http://e/s",
        "n": {"@id": "http://e/c", "p": "first",
              "http://e/child": {"@id": "http://e/d", "p": "deep"}},
    }, '''
<http://e/s> <http://e/n> <http://e/c> .
<http://e/c> <http://e/p> "first" .
<http://e/c> <http://e/child> <http://e/d> .
'''),

    ("w3c_twf_invalid_terms", {}, {
        # twf02/03/04/07: ill-formed triples are rejected, well-formed
        # siblings survive (invalid predicate IRI, invalid object IRI,
        # invalid type IRI, invalid graph name)
        "@graph": [
            {"@id": "http://e/s",
             "http://e/p": {"@id": "http://e/ sp"},
             "http://e/ badpred": "droppedvalue",
             "@type": "http://e/ bad",
             "http://e/q": "keep"},
            {"@id": "http://e/ gname",
             "@graph": [{"@id": "http://e/in", "http://e/r": "x"}]},
        ],
    }, '''
<http://e/s> <http://e/q> "keep" .
'''),

    ("w3c_tst02_annotation_ignored_no_rdfstar", {"rdfstar": False}, {
        # star tst02: node-object @annotation ignored without rdfstar
        "@id": "http://e/s",
        "http://e/p": {"@id": "http://e/o",
                       "@annotation": {"http://e/q": "v"}},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
'''),

    ("w3c_tst03_value_annotation_ignored", {"rdfstar": False}, {
        # star tst03: value-object @annotation ignored without rdfstar
        "@id": "http://e/s",
        "http://e/p": {"@value": "x", "@annotation": {"http://e/q": "v"}},
    }, '''
<http://e/s> <http://e/p> "x" .
'''),

    ("w3c_tst20b_empty_annotation", {}, {
        # star tst20b: an empty @annotation node object emits nothing
        "@id": "http://e/s",
        "http://e/p": {"@id": "http://e/o", "@annotation": {}},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
'''),

    ("w3c_tst28_annotation_with_embedded_subject", {}, {
        # star tst28/tst29: @annotation on an edge whose subject is an
        # embedded node — the annotated triple nests the quoted triple
        "@id": {"@id": "http://e/a", "http://e/p": {"@id": "http://e/b"}},
        "http://e/q": {"@id": "http://e/c",
                       "@annotation": {"http://e/m": "x"}},
    }, '''
<< <http://e/a> <http://e/p> <http://e/b> >> <http://e/q> <http://e/c> .
<< << <http://e/a> <http://e/p> <http://e/b> >> <http://e/q> <http://e/c> >> <http://e/m> "x" .
'''),

    ("w3c_tst36_id_alias_embedded", {}, {
        # star tst36: embedded node reached through an ALIAS of @id
        "@context": {"id": "@id"},
        "id": {"id": "http://e/a", "http://e/p": "v"},
        "http://e/q": "w",
    }, '''
<< <http://e/a> <http://e/p> "v" >> <http://e/q> "w" .
'''),

    ("w3c_te064_reverse_bnode_values", {}, {
        # te064: reverse property whose values are unlabeled blank nodes
        "@id": "http://e/o",
        "@reverse": {"http://e/p": [{"http://e/x": "1"}]},
    }, '''
_:b0 <http://e/p> <http://e/o> .
_:b0 <http://e/x> "1" .
'''),

    ("w3c_te081_graph_container_wraps_graph_value", {}, {
        # te081 "Creates an @graph container if value is a graph": a
        # SIMPLE @graph container wraps UNCONDITIONALLY — the edge points
        # at a fresh wrapper graph while the inner graph object keeps its
        # own (disconnected) graph. Reference test 'with @id and graph
        # map and @graph key' (JsonLdParser-test.ts:8785): myid->g1,
        # value triple in g2. Only [@graph,@id]/[@graph,@index] maps
        # carry the already-a-graph exception (te084 family).
        "@context": {"g": {"@id": "http://e/g", "@container": "@graph"}},
        "@id": "http://e/s",
        "g": {"@graph": [{"@id": "http://e/n", "http://e/p": "v"}]},
    }, '''
<http://e/s> <http://e/g> _:wrapper .
<http://e/n> <http://e/p> "v" _:inner .
'''),

    ("w3c_te104_graph_container_mixed", {}, {
        # te104: simple container, mixed graph-object and node values —
        # both wrapped; the graph object's triples stay in its own graph
        "@context": {"g": {"@id": "http://e/g", "@container": "@graph"}},
        "@id": "http://e/s",
        "g": [{"@graph": [{"@id": "http://e/n1", "http://e/p": "v1"}]},
              {"@id": "http://e/n2", "http://e/p": "v2"}],
    }, '''
<http://e/s> <http://e/g> _:w1 .
<http://e/s> <http://e/g> _:w2 .
<http://e/n1> <http://e/p> "v1" _:inner .
<http://e/n2> <http://e/p> "v2" _:w2 .
'''),

    ("w3c_tm004_type_map_prepends", {}, {
        # tm004: the type-map key is PREPENDED to an existing @type
        "@context": {"p": {"@id": "http://e/p", "@container": "@type"}},
        "@id": "http://e/s",
        "p": {"http://e/A": {"@id": "http://e/x",
                             "@type": "http://e/B"}},
    }, f'''
<http://e/s> <http://e/p> <http://e/x> .
<http://e/x> <{RDF}type> <http://e/A> .
<http://e/x> <{RDF}type> <http://e/B> .
'''),

    ("w3c_tin02_included_object", {}, {
        # tin02: @included whose value is a single node OBJECT (not array)
        "@id": "http://e/s", "http://e/p": "v",
        "@included": {"@id": "http://e/t", "http://e/q": "w"},
    }, '''
<http://e/s> <http://e/p> "v" .
<http://e/t> <http://e/q> "w" .
'''),

    ("w3c_tin05_included_in_property_value", {}, {
        # tin05: @included inside a node that is itself a property VALUE
        "@id": "http://e/s",
        "http://e/p": {"@id": "http://e/o", "http://e/r": "x",
                       "@included": [{"@id": "http://e/t",
                                      "http://e/q": "w"}]},
    }, '''
<http://e/s> <http://e/p> <http://e/o> .
<http://e/o> <http://e/r> "x" .
<http://e/t> <http://e/q> "w" .
'''),

    ("w3c_tc035_embedded_scope_vocab", {}, {
        # tc035: a term defined in an embedded context uses the @vocab of
        # its DEFINING scope, not the outer one
        "@context": {"@vocab": "http://outer/"},
        "@id": "http://e/s",
        "inner": {"@context": {"@vocab": "http://inner/", "t": "x"},
                  "@id": "http://e/c", "t": "v"},
    }, '''
<http://e/s> <http://outer/inner> <http://e/c> .
<http://e/c> <http://inner/x> "v" .
'''),

    ("probeR4_graph_container_named_graph_obj", {}, {
        # NAMED graph object under a simple @graph container: the
        # unconditional 13.8 wrap points the edge at a fresh wrapper
        # graph; the named inner graph keeps its own name (r5 audit
        # corrected this — the r4 no-rewrap behavior was wrong for the
        # simple container; cf. reference JsonLdParser-test.ts:8785)
        "@context": {"g": {"@id": "http://e/g", "@container": "@graph"}},
        "@id": "http://e/s",
        "g": {"@id": "http://e/gname",
              "@graph": [{"@id": "http://e/n", "http://e/p": "v"}]},
    }, '''
<http://e/s> <http://e/g> _:wrapper .
<http://e/n> <http://e/p> "v" <http://e/gname> .
'''),

    ("probeR4_typescope_array_remote", {"ctx_cache": {
        "https://c/r1": {"@context": {"b": "http://e/b"}}}}, {
        # round-4 probe: type-scoped context ARRAY mixing inline + remote
        "@context": {"T": {"@id": "http://e/T",
                           "@context": [{"a": "http://e/a"},
                                        "https://c/r1"]}},
        "@id": "http://e/s", "@type": "T", "a": "1", "b": "2",
    }, f'''
<http://e/s> <{RDF}type> <http://e/T> .
<http://e/s> <http://e/a> "1" .
<http://e/s> <http://e/b> "2" .
'''),

    ("probeR4_graph_object_in_list", {}, {
        # round-4 probe: a named graph object as a LIST member — the cell
        # references the graph name; contents land in that graph
        "@id": "http://e/s",
        "http://e/p": {"@list": [{"@id": "http://e/g",
                                  "@graph": [{"@id": "http://e/n",
                                              "http://e/q": "v"}]}]},
    }, f'''
<http://e/s> <http://e/p> _:l0 .
_:l0 <{RDF}first> <http://e/g> .
_:l0 <{RDF}rest> <{RDF}nil> .
<http://e/n> <http://e/q> "v" <http://e/g> .
'''),

    ("probeR4_vocab_via_term", {}, {
        # round-4 probe: 1.1 @vocab value expanded via a TERM of the
        # current context
        "@context": [{"base": "http://e/ns#"}, {"@vocab": "base"}],
        "@id": "http://e/s", "x": "v",
    }, '''
<http://e/s> <http://e/ns#x> "v" .
'''),

    ("w3c_tst06_embedded_bnode_id", {}, {
        # star tst06: embedded subject whose @id is a blank node
        "@id": {"@id": "_:x", "http://e/p": "v"}, "http://e/q": "w",
    }, '''
<< _:b0 <http://e/p> "v" >> <http://e/q> "w" .
'''),

    ("w3c_tst09_embedded_bnode_value", {}, {
        # star tst09: embedded subject whose triple OBJECT is a bnode
        "@id": {"@id": "http://e/a", "http://e/p": {"@id": "_:ob"}},
        "http://e/q": "w",
    }, '''
<< <http://e/a> <http://e/p> _:b0 >> <http://e/q> "w" .
'''),

    ("w3c_tpr36_term_to_keyword_form", {}, {
        # tpr36/tpr37: a term whose MAPPING is in the form of a keyword
        # is ignored (its uses drop); other terms unaffected
        "@context": {"t": "@ignoreMe", "p": "http://e/p"},
        "@id": "http://e/s", "t": "dropped", "p": "kept",
    }, '''
<http://e/s> <http://e/p> "kept" .
'''),

    ("w3c_te083_graph_index_set", {}, {
        # te083/te097: [@graph, @index, @set] container combo
        "@context": {"g": {"@id": "http://e/g",
                           "@container": ["@graph", "@index", "@set"]}},
        "@id": "http://e/s",
        "g": {"i1": [{"http://e/q": "v"}]},
    }, '''
<http://e/s> <http://e/g> _:g0 .
_:n0 <http://e/q> "v" _:g0 .
'''),
]

# Round-5 EARL-map fidelity audit (PARITY.md "audit round 2"): exact
# fixtures for many-to-one map entries whose shared fixture did not show
# the covered test's DISTINGUISHING behavior. Each authored from the
# vendored EARL title/description + the W3C algorithm, then cross-checked
# against the kernel (all agreed — no new kernel bugs this round).
W3C_AUDIT_R5_FIXTURES = [
    ("w3c_te084_098_gindex_graph_values", {}, {
        # te084/te098: [@graph, @index] container — values that are
        # ALREADY graph objects are not wrapped again (single + multiple
        # contained nodes)
        "@context": {"input": {"@id": "http://e/input",
                               "@container": ["@graph", "@index"]}},
        "@id": "http://e/s",
        "input": {"g1": {"@graph": [{"@id": "http://e/n1",
                                     "http://e/p": "v1"}]},
                  "g2": {"@graph": [{"@id": "http://e/n2",
                                     "http://e/p": "v2"},
                                    {"@id": "http://e/n3",
                                     "http://e/p": "v3"}]}},
    }, '''
<http://e/s> <http://e/input> _:gA .
<http://e/s> <http://e/input> _:gB .
<http://e/n1> <http://e/p> "v1" _:gA .
<http://e/n2> <http://e/p> "v2" _:gB .
<http://e/n3> <http://e/p> "v3" _:gB .
'''),

    ("w3c_te105_gindex_mixed_graph_and_object", {}, {
        # te105: mixed map — graph-object value kept as-is, plain node
        # value wrapped into a fresh graph
        "@context": {"input": {"@id": "http://e/input",
                               "@container": ["@graph", "@index"]}},
        "@id": "http://e/s",
        "input": {"g1": {"@graph": [{"@id": "http://e/n1",
                                     "http://e/p": "v1"}]},
                  "g2": {"@id": "http://e/n2", "http://e/p": "v2"}},
    }, '''
<http://e/s> <http://e/input> _:gA .
<http://e/s> <http://e/input> _:gB .
<http://e/n1> <http://e/p> "v1" _:gA .
<http://e/n2> <http://e/p> "v2" _:gB .
'''),

    ("w3c_te087_101_gid_graph_values", {}, {
        # te087/te101: [@graph, @id] container — map keys name the
        # graphs; graph-object values are not re-wrapped
        "@context": {"input": {"@id": "http://e/input",
                               "@container": ["@graph", "@id"]}},
        "@id": "http://e/s",
        "input": {"http://e/gA": {"@graph": [{"@id": "http://e/n1",
                                              "http://e/p": "v1"}]},
                  "http://e/gB": {"@graph": [{"@id": "http://e/n2",
                                              "http://e/p": "v2"},
                                             {"@id": "http://e/n3",
                                              "http://e/p": "v3"}]}},
    }, '''
<http://e/s> <http://e/input> <http://e/gA> .
<http://e/s> <http://e/input> <http://e/gB> .
<http://e/n1> <http://e/p> "v1" <http://e/gA> .
<http://e/n2> <http://e/p> "v2" <http://e/gB> .
<http://e/n3> <http://e/p> "v3" <http://e/gB> .
'''),

    ("w3c_te106_gid_mixed_graph_and_object", {}, {
        # te106: [@graph, @id] mixed — existing graph object keeps the
        # key as its name; plain object is wrapped under the key name
        "@context": {"input": {"@id": "http://e/input",
                               "@container": ["@graph", "@id"]}},
        "@id": "http://e/s",
        "input": {"http://e/gA": {"@graph": [{"@id": "http://e/n1",
                                              "http://e/p": "v1"}]},
                  "http://e/gB": {"@id": "http://e/n2",
                                  "http://e/p": "v2"}},
    }, '''
<http://e/s> <http://e/input> <http://e/gA> .
<http://e/s> <http://e/input> <http://e/gB> .
<http://e/n1> <http://e/p> "v1" <http://e/gA> .
<http://e/n2> <http://e/p> "v2" <http://e/gB> .
'''),

    ("w3c_te095_graph_container_multi", {}, {
        # te095 "Creates an @graph container if value is a graph
        # (multiple objects)": the simple container wraps the
        # already-a-graph value AGAIN — edge to the wrapper, inner
        # triples in the inner graph (disconnected)
        "@context": {"g": {"@id": "http://e/g", "@container": "@graph"}},
        "@id": "http://e/s",
        "g": {"@graph": [{"@id": "http://e/n1", "http://e/p": "v1"},
                         {"@id": "http://e/n2", "http://e/p": "v2"}]},
    }, '''
<http://e/s> <http://e/g> _:wrapper .
<http://e/n1> <http://e/p> "v1" _:inner .
<http://e/n2> <http://e/p> "v2" _:inner .
'''),

    ("w3c_t0013_empty_list_is_nil", {}, {
        # t0013: @list: [] is rdf:nil directly — no cons cell
        "@id": "http://e/s", "http://e/p": {"@list": []},
    }, f'''
<http://e/s> <http://e/p> <{RDF}nil> .
'''),

    ("w3c_tli04_coerced_empty_inner_list", {}, {
        # tli04: COERCED list (@container: @list) containing an empty
        # list — 1.1 list-of-lists, inner [] becomes nil in a cons cell
        "@context": {"p": {"@id": "http://e/p", "@container": "@list"}},
        "@id": "http://e/s", "p": [[]],
    }, f'''
<http://e/s> <http://e/p> _:l0 .
_:l0 <{RDF}first> <{RDF}nil> .
_:l0 <{RDF}rest> <{RDF}nil> .
'''),

    ("w3c_tli08_coerced_deep_empty_arrays", {}, {
        # tli08: coerced list with deeper empty-array nesting
        "@context": {"p": {"@id": "http://e/p", "@container": "@list"}},
        "@id": "http://e/s", "p": [[[]]],
    }, f'''
<http://e/s> <http://e/p> _:outer .
_:outer <{RDF}first> _:inner .
_:outer <{RDF}rest> <{RDF}nil> .
_:inner <{RDF}first> <{RDF}nil> .
_:inner <{RDF}rest> <{RDF}nil> .
'''),

    ("w3c_t0017_relative_id", {"base_iri": "http://b/dir/doc"}, {
        # t0017: a relative node @id expands against the document location
        "@id": "rel", "http://e/p": "v",
    }, '''
<http://b/dir/rel> <http://e/p> "v" .
'''),

    ("w3c_te089_empty_base_on_base_option", {"base_iri": "http://b/dir/doc"}, {
        # te089: @base: "" resolves to the base option itself (RFC 3986:
        # empty reference = base), so relative ids still resolve there
        "@context": {"@base": ""}, "@id": "rel", "http://e/p": "v",
    }, '''
<http://b/dir/rel> <http://e/p> "v" .
'''),

    ("w3c_te070_compact_iri_self_redefinition", {}, {
        # te070: redefining a compact IRI with itself is a no-op, not an
        # error or a cycle
        "@context": {"ex": "http://e/", "ex:foo": {"@id": "ex:foo"}},
        "@id": "http://e/s", "ex:foo": "v",
    }, '''
<http://e/s> <http://e/foo> "v" .
'''),

    ("w3c_te091_relative_and_absolute_base", {"base_iri": "http://h.org/a/doc"}, {
        # te091: absolute @base replaces the base option; a following
        # relative @base resolves against THAT, not the document
        "@context": [{"@base": "http://new.org/a/"},
                     {"@base": "deeper/"}],
        "@id": "rel", "http://e/p": "v",
    }, '''
<http://new.org/a/deeper/rel> <http://e/p> "v" .
'''),

    ("w3c_te110_112_pathological_vocab_relative_props", {}, {
        # te110-te112: relative @vocab concatenates onto the previous
        # vocab (twice chained here = te112's shape); relative property
        # IRIs then CONCATENATE onto the vocab — no RFC 3986 dot-segment
        # normalization for vocab-relative terms
        "@context": [{"@vocab": "http://v/"}, {"@vocab": "sub/"},
                     {"@vocab": "deep/"}],
        "@id": "http://e/s",
        "p": "v", "../up": "v2", "#frag": "v3", "./dot": "v4",
    }, '''
<http://e/s> <http://v/sub/deep/p> "v" .
<http://e/s> <http://v/sub/deep/../up> "v2" .
<http://e/s> <http://v/sub/deep/#frag> "v3" .
<http://e/s> <http://v/sub/deep/./dot> "v4" .
'''),

    ("w3c_tpr25_identical_scoped_redefinition", {}, {
        # tpr25: redefining a PROTECTED term whose definition carries a
        # scoped context is allowed when the new definition is identical
        "@context": [
            {"@protected": True,
             "t": {"@id": "http://e/t",
                   "@context": {"x": "http://e/x"}}},
            {"t": {"@id": "http://e/t",
                   "@context": {"x": "http://e/x"}}},
        ],
        "@id": "http://e/s",
        "t": {"@id": "http://e/o", "x": "v"},
    }, '''
<http://e/s> <http://e/t> <http://e/o> .
<http://e/o> <http://e/x> "v" .
'''),
    ("w3c_tjs22_expanded_form_json_null", {}, {
        # tjs22: a DOCUMENT-level expanded value object with @type @json
        # and @value null keeps null as the JSON literal (no value-object
        # null drop; contrast jsonG_null_value_kept's term-typed twin)
        "@id": "http://e/s",
        "http://e/j": {"@value": None, "@type": "@json"},
    }, '''
<http://e/s> <http://e/j> "null"^^<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON> .
'''),

    ("probeR5_gindex_graph_key_same_graph", {}, {
        # reference JsonLdParser-test.ts:8857 — [@graph,@index] with an
        # explicit @graph-key value: the MAP-path exception applies, edge
        # and triples share ONE graph (contrast the simple container)
        "@context": {"p": {"@id": "http://e/p",
                           "@container": ["@graph", "@index"]}},
        "@id": "http://e/s",
        "p": {"i0": {"@graph": {"@id": "http://e/n",
                                "http://e/v": "1539"}}},
    }, '''
<http://e/s> <http://e/p> _:g1 .
<http://e/n> <http://e/v> "1539" _:g1 .
'''),

    ("probeR5_graph_set_graph_value_double_wrap", {}, {
        # [@graph,@set] behaves like the SIMPLE container for wrapping:
        # an already-graph value still gets a fresh wrapper graph
        "@context": {"p": {"@id": "http://e/p",
                           "@container": ["@graph", "@set"]}},
        "@id": "http://e/s",
        "p": {"@graph": {"@id": "http://e/n", "http://e/v": "1539"}},
    }, '''
<http://e/s> <http://e/p> _:wrapper .
<http://e/n> <http://e/v> "1539" _:inner .
'''),

    ("probeR5_graph_container_nested_array_fanout", {}, {
        # reference JsonLdParser-test.ts:8583 — nested arrays flatten,
        # then EACH node wraps into its own graph
        "@context": {"p": {"@id": "http://e/p", "@container": "@graph"}},
        "@id": "http://e/s",
        "p": [[{"@id": "http://e/n1", "http://e/v": "123"},
               {"@id": "http://e/n2", "http://e/v": "234"}]],
    }, '''
<http://e/s> <http://e/p> _:g1 .
<http://e/s> <http://e/p> _:g2 .
<http://e/n1> <http://e/v> "123" _:g1 .
<http://e/n2> <http://e/v> "234" _:g2 .
'''),
]

FIXTURES = FIXTURES + W3C_GAP_FIXTURES + W3C_AUDIT_R5_FIXTURES
