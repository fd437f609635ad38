"""RDFS entailment (operators/inference.py) + BGP matching
(operators/bgp.py) unit tests on hand-built quad frames — exact row
assertions, independent of the synthetic corpus (the corpus-level value
check is the kg_rdfs_entailment / kg_bgp_query oracle lanes)."""

import pytest
from pyspark.sql import functions as F

from jsonld_streaming_parser_js_spark.operators import bgp, inference
from jsonld_streaming_parser_js_spark.operators.inference import (
    DEFAULT_ONTOLOGY,
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_LABEL,
    RDFS_SUBCLASS,
    rdfs_entailment,
    split_ontology,
    transitive_closure,
)

S = "http://schema.org/"
QUAD_SCHEMA = "subj string, pred string, obj string, graph string"


def _quads_df(spark, rows):
    return spark.createDataFrame(rows, schema=QUAD_SCHEMA)


HAND_QUADS = [
    (f"<a>", RDF_TYPE, f"<{S}Article>", ""),
    (f"<a>", f"<{S}author>", "<p1>", ""),
    ("<p1>", f"<{S}name>", '"P1"', ""),
    ("<x>", f"<{S}inLanguage>", '"en"', ""),
    # named graph: inferred label must stay in <g>
    ("<p1>", f"<{S}name>", '"G"@en', "<g>"),
]


def _entailed(spark, quads_rows=HAND_QUADS, ontology=DEFAULT_ONTOLOGY):
    df = rdfs_entailment(_quads_df(spark, quads_rows), ontology)
    return {(r.subj, r.pred, r.obj, r.graph): r.src for r in df.collect()}


# ---------------------------------------------------------------- closure

def test_transitive_closure_chain_and_cycle():
    assert transitive_closure([("a", "b"), ("b", "c"), ("c", "d")]) == {
        ("a", "b"), ("b", "c"), ("c", "d"),
        ("a", "c"), ("b", "d"), ("a", "d")}
    # cycle-safe: fixpoint terminates, includes the self-loops the
    # cycle entails
    cyc = transitive_closure([("a", "b"), ("b", "a")])
    assert cyc == {("a", "b"), ("b", "a"), ("a", "a"), ("b", "b")}


def test_split_ontology_rejects_instance_triples():
    with pytest.raises(ValueError, match="non-RDFS"):
        split_ontology([("<a>", RDF_TYPE, f"<{S}Article>")])


def test_split_ontology_rejects_rdf_type_meta_constraints():
    """Constraining rdf:type itself would feed inferred type triples
    back into the property rules — single-pass composition would
    silently under-entail, so the guard must raise."""
    from jsonld_streaming_parser_js_spark.operators.inference import (
        RDFS_RANGE, RDFS_SUBPROP)
    with pytest.raises(ValueError, match="rdf:type"):
        split_ontology([(RDF_TYPE, RDFS_SUBPROP, f"<{S}isA>")])
    with pytest.raises(ValueError, match="rdf:type"):
        split_ontology([(RDF_TYPE, RDFS_RANGE, f"<{S}Class>")])
    with pytest.raises(ValueError, match="rdf:type"):
        split_ontology([(RDF_TYPE, RDFS_DOMAIN, f"<{S}Thing>")])
    # the SAFE direction (p subPropertyOf rdf:type) stays allowed:
    # sp-lifted rows land in the subClassOf leg like asserted types
    parts = split_ontology([(f"<{S}isA>", RDFS_SUBPROP, RDF_TYPE)])
    assert parts["sp"] == {(f"<{S}isA>", RDF_TYPE)}


def test_sp_into_rdf_type_feeds_subclass_rule(spark):
    """(isA subPropertyOf rdf:type): isA assertions become type
    assertions, which must then flow through the subClassOf closure."""
    ont = [(f"<{S}isA>", "<http://www.w3.org/2000/01/rdf-schema#"
            "subPropertyOf>", RDF_TYPE),
           (f"<{S}Article>", RDFS_SUBCLASS, f"<{S}CreativeWork>")]
    rows = [("<a>", f"<{S}isA>", f"<{S}Article>", "")]
    got = _entailed(spark, rows, ont)
    assert got[("<a>", RDF_TYPE, f"<{S}Article>", "")] == "inferred"
    assert got[("<a>", RDF_TYPE, f"<{S}CreativeWork>", "")] == "inferred"


# ----------------------------------------------------------- entailment

def test_rdfs_rules_and_compositions(spark):
    got = _entailed(spark)
    # rdfs9 chain on the asserted type
    assert got[("<a>", RDF_TYPE, f"<{S}CreativeWork>", "")] == "inferred"
    assert got[("<a>", RDF_TYPE, f"<{S}Thing>", "")] == "inferred"
    # rdfs3 -> rdfs9 composition: range gives Person, closure lifts it
    assert got[("<p1>", RDF_TYPE, f"<{S}Person>", "")] == "inferred"
    assert got[("<p1>", RDF_TYPE, f"<{S}Agent>", "")] == "inferred"
    assert got[("<p1>", RDF_TYPE, f"<{S}Thing>", "")] == "inferred"
    # rdfs7 two-level property chain
    assert got[("<a>", f"<{S}contributor>", "<p1>", "")] == "inferred"
    assert got[("<a>", "<http://purl.org/dc/terms/contributor>",
                "<p1>", "")] == "inferred"
    # rdfs7 on name -> rdfs:label, graph attribution preserved
    assert got[("<p1>", RDFS_LABEL, '"P1"', "")] == "inferred"
    assert got[("<p1>", RDFS_LABEL, '"G"@en', "<g>")] == "inferred"
    # rdfs3 literal guard: inLanguage range must infer NOTHING
    assert not any(o == f"<{S}Language>" for (_, _, o, _) in got)
    # asserted facts keep their tag
    assert got[("<a>", RDF_TYPE, f"<{S}Article>", "")] == "asserted"
    # exact inventory: 5 asserted + 9 inferred
    assert len(got) == 14
    assert sum(1 for v in got.values() if v == "inferred") == 9


def test_provenance_min_tag_prefers_asserted(spark):
    rows = HAND_QUADS + [("<a>", RDF_TYPE, f"<{S}CreativeWork>", "")]
    got = _entailed(spark, rows)
    # derivable AND asserted -> asserted wins, exactly one row
    assert got[("<a>", RDF_TYPE, f"<{S}CreativeWork>", "")] == "asserted"
    assert len(got) == 15 - 1  # same fact set as before


def test_ontology_as_dataframe_and_bound_guard(spark):
    ont_df = spark.createDataFrame(
        list(DEFAULT_ONTOLOGY), schema="subj string, pred string, obj string")
    via_df = rdfs_entailment(_quads_df(spark, HAND_QUADS), ont_df)
    via_seq = rdfs_entailment(_quads_df(spark, HAND_QUADS),
                              DEFAULT_ONTOLOGY)
    assert (sorted(map(tuple, via_df.collect()))
            == sorted(map(tuple, via_seq.collect())))
    with pytest.raises(ValueError, match="max_ontology_rows"):
        rdfs_entailment(_quads_df(spark, HAND_QUADS), ont_df,
                        max_ontology_rows=2)


def test_empty_ontology_is_identity_all_asserted(spark):
    got = _entailed(spark, ontology=[])
    assert len(got) == len(HAND_QUADS)
    assert set(got.values()) == {"asserted"}


def test_duplicate_input_facts_collapse(spark):
    rows = HAND_QUADS + [HAND_QUADS[0]]  # same fact twice (two pages)
    got = _entailed(spark, rows)
    assert len(got) == 14  # output is a fact SET


# ------------------------------------------------------------------ BGP

BGP_QUADS = [
    ("<a1>", RDF_TYPE, f"<{S}Article>", ""),
    ("<a1>", f"<{S}author>", "<p1>", ""),
    ("<a2>", RDF_TYPE, f"<{S}Article>", ""),
    ("<a2>", f"<{S}author>", "<p1>", ""),
    ("<p1>", f"<{S}name>", '"P1"', ""),
    # distractors: wrong type, named-graph fact, self-loop
    ("<o1>", RDF_TYPE, f"<{S}Organization>", ""),
    ("<a3>", RDF_TYPE, f"<{S}Article>", "<g>"),
    ("<p1>", f"<{S}knows>", "<p1>", ""),
    ("<p1>", f"<{S}knows>", "<a1>", ""),
]


def test_bgp_three_pattern_conjunction(spark):
    out = bgp.bgp_match(_quads_df(spark, BGP_QUADS), [
        ("?a", RDF_TYPE, f"<{S}Article>"),
        ("?a", f"<{S}author>", "?p"),
        ("?p", f"<{S}name>", "?n"),
    ])
    rows = {(r.a, r.p, r.n) for r in out.collect()}
    assert rows == {("<a1>", "<p1>", '"P1"'),
                    ("<a2>", "<p1>", '"P1"')}


def test_bgp_repeated_variable_is_self_equality(spark):
    out = bgp.bgp_match(_quads_df(spark, BGP_QUADS),
                        [("?x", f"<{S}knows>", "?x")])
    assert [r.x for r in out.collect()] == ["<p1>"]


def test_bgp_graph_selection(spark):
    pat = [("?a", RDF_TYPE, f"<{S}Article>")]
    default_g = {r.a for r in
                 bgp.bgp_match(_quads_df(spark, BGP_QUADS), pat).collect()}
    assert default_g == {"<a1>", "<a2>"}
    union_g = {r.a for r in
               bgp.bgp_match(_quads_df(spark, BGP_QUADS), pat,
                             graph=None).collect()}
    assert union_g == {"<a1>", "<a2>", "<a3>"}


def test_bgp_disconnected_pattern_raises_unless_opted_in(spark):
    df = _quads_df(spark, BGP_QUADS)
    pats = [("?a", RDF_TYPE, f"<{S}Article>"),
            ("?x", f"<{S}name>", "?n")]
    with pytest.raises(ValueError, match="cartesian"):
        bgp.bgp_match(df, pats)
    out = bgp.bgp_match(df, pats, allow_product=True)
    assert out.count() == 2 * 1  # 2 articles x 1 name fact


def test_bgp_bag_vs_set_semantics(spark):
    # duplicated input fact -> the SAME binding twice under bag
    # semantics; distinct=True (and only it) collapses the duplicate
    df = _quads_df(spark, BGP_QUADS + [("<a1>", f"<{S}author>", "<p1>", "")])
    pats = [("?a", f"<{S}author>", "?p")]
    bag = sorted((r.a, r.p) for r in bgp.bgp_match(df, pats).collect())
    assert bag == [("<a1>", "<p1>"), ("<a1>", "<p1>"), ("<a2>", "<p1>")]
    dis = sorted((r.a, r.p) for r in
                 bgp.bgp_match(df, pats, distinct=True).collect())
    assert dis == [("<a1>", "<p1>"), ("<a2>", "<p1>")]


def test_bgp_ground_pattern_is_existence_filter(spark):
    """All-constant patterns are valid SPARQL: they gate the other
    bindings on the triple's existence (no cartesian opt-in needed),
    in any position in the pattern list."""
    df = _quads_df(spark, BGP_QUADS)
    hit = [("?a", RDF_TYPE, f"<{S}Article>"),
           ("<p1>", f"<{S}name>", '"P1"')]  # exists -> pass-through
    assert bgp.bgp_match(df, hit).count() == 2
    miss = [("?a", RDF_TYPE, f"<{S}Article>"),
            ("<p1>", f"<{S}name>", '"NOPE"')]  # absent -> empty
    assert bgp.bgp_match(df, miss).count() == 0
    # ground-first prefix then variables: same gating, columns intact
    first = bgp.bgp_match(df, [("<p1>", f"<{S}name>", '"P1"'),
                               ("?a", RDF_TYPE, f"<{S}Article>")])
    assert first.columns == ["a"] and first.count() == 2


def test_path_closure_chain_cycle_and_rounds(spark):
    """Iterated squaring: a depth-7 chain closes in ~log2(7) rounds,
    not 7; cycles terminate with the finite closure."""
    P = f"<{S}next>"
    chain = [(f"<n{i}>", P, f"<n{i+1}>", "") for i in range(7)]
    stats = {}
    clo = bgp.path_closure(_quads_df(spark, chain), P, stats=stats)
    pairs = {(r.src, r.dst) for r in clo.collect()}
    assert pairs == {(f"<n{i}>", f"<n{j}>")
                     for i in range(7) for j in range(i + 1, 8)}
    assert stats["pairs"] == 28
    # distance doubles per round: 7 hops within 3 doublings (+1
    # convergence-confirm round)
    assert stats["rounds"] <= 4
    cyc = [("<a>", P, "<b>", ""), ("<b>", P, "<a>", "")]
    got = {(r.src, r.dst)
           for r in bgp.path_closure(_quads_df(spark, cyc), P).collect()}
    assert got == {("<a>", "<b>"), ("<b>", "<a>"),
                   ("<a>", "<a>"), ("<b>", "<b>")}
    with pytest.raises(RuntimeError, match="did not converge"):
        bgp.path_closure(_quads_df(spark, chain), P, max_rounds=2)


def test_bgp_path_pattern_composes_with_regular_patterns(spark):
    """``?nav crumbs ?l . ?l rest+ ?m`` — the path leg joins the
    regular leg on the shared variable like any other leg."""
    R = f"<{S}rest>"
    rows = [("<nav>", f"<{S}crumbs>", "<l0>", ""),
            ("<l0>", R, "<l1>", ""),
            ("<l1>", R, "<nil>", ""),
            # distractor chain not reachable from a crumbs head
            ("<x0>", R, "<x1>", "")]
    out = bgp.bgp_match(_quads_df(spark, rows), [
        ("?nav", f"<{S}crumbs>", "?l"),
        ("?l", R + "+", "?m"),
    ])
    got = {(r.nav, r.l, r.m) for r in out.collect()}
    assert got == {("<nav>", "<l0>", "<l1>"), ("<nav>", "<l0>", "<nil>")}


def test_path_reachable_seeded_forward_reverse_and_depth_guard(spark):
    P = f"<{S}next>"
    rows = ([(f"<n{i}>", P, f"<n{i+1}>", "") for i in range(5)]
            # disjoint chain that a seeded walk must never touch
            + [("<x0>", P, "<x1>", ""), ("<x1>", P, "<x2>", "")])
    df = _quads_df(spark, rows)
    fwd = {r.dst for r in bgp.path_reachable(df, P, "<n2>").collect()}
    assert fwd == {"<n3>", "<n4>", "<n5>"}
    rev = {r.dst for r in
           bgp.path_reachable(df, P, "<n2>", reverse=True).collect()}
    assert rev == {"<n0>", "<n1>"}
    # absent seed -> empty, no error
    assert bgp.path_reachable(df, P, "<nope>").count() == 0
    with pytest.raises(RuntimeError, match="max_rounds"):
        bgp.path_reachable(df, P, "<n0>", max_rounds=2)


def test_bgp_seeded_path_patterns_dispatch(spark):
    """Constant-endpoint path patterns use the frontier walk, and both
    directions bind correctly inside a BGP."""
    R = f"<{S}rest>"
    rows = [("<nav>", f"<{S}crumbs>", "<l0>", ""),
            ("<l0>", R, "<l1>", ""),
            ("<l1>", R, "<nil>", ""),
            ("<x0>", R, "<x1>", "")]
    df = _quads_df(spark, rows)
    # constant source
    out = bgp.bgp_match(df, [("<l0>", R + "+", "?m")])
    assert {r.m for r in out.collect()} == {"<l1>", "<nil>"}
    # constant destination (reverse walk) composed with a regular leg
    out = bgp.bgp_match(df, [("?l", R + "+", "<nil>"),
                             ("?nav", f"<{S}crumbs>", "?l")])
    assert {(r.l, r.nav) for r in out.collect()} == {("<l0>", "<nav>")}
    # both endpoints constant: existence gate over the path
    hit = bgp.bgp_match(df, [("?nav", f"<{S}crumbs>", "?l"),
                             ("<l0>", R + "+", "<nil>")])
    assert hit.count() == 1
    miss = bgp.bgp_match(df, [("?nav", f"<{S}crumbs>", "?l"),
                              ("<l0>", R + "+", "<x1>")])
    assert miss.count() == 0


def test_bgp_validates_before_evaluating_path_legs(spark):
    """A malformed/disconnected pattern AFTER a path leg must raise
    without running the closure's Spark jobs (validate-then-evaluate)."""
    R = f"<{S}rest>"
    df = _quads_df(spark, [("<l0>", R, "<l1>", "")])
    calls = []
    orig = bgp.path_closure
    try:
        bgp.path_closure = lambda *a, **k: calls.append(1) or orig(*a, **k)
        with pytest.raises(ValueError, match="cartesian"):
            bgp.bgp_match(df, [("?a", R + "+", "?b"),
                               ("?x", f"<{S}name>", "?y")])
        with pytest.raises(ValueError, match="not a triple"):
            bgp.bgp_match(df, [("?a", R + "+", "?b"), ("?x", "?y")])
    finally:
        bgp.path_closure = orig
    assert calls == []  # no closure evaluated for invalid BGPs


def test_bgp_optional_left_join_semantics(spark):
    """OPTIONAL keeps bindings on non-match with null new vars; a
    matched optional binds them; chained optionals extend left-to-right."""
    rows = BGP_QUADS + [("<p1>", f"<{S}email>", '"p1@x"', "")]
    df = _quads_df(spark, rows)
    out = bgp.bgp_match(
        df,
        [("?a", f"<{S}author>", "?p")],
        optional=[("?p", f"<{S}email>", "?e"),
                  ("?p", f"<{S}phone>", "?t")])  # phone never matches
    got = {(r.a, r.p, r.e, r.t) for r in out.collect()}
    assert got == {("<a1>", "<p1>", '"p1@x"', None),
                   ("<a2>", "<p1>", '"p1@x"', None)}
    # validation: ground / disconnected optionals raise
    with pytest.raises(ValueError, match="ground"):
        bgp.bgp_match(df, [("?a", f"<{S}author>", "?p")],
                      optional=[("<p1>", f"<{S}email>", '"p1@x"')])
    with pytest.raises(ValueError, match="disconnected OPTIONAL"):
        bgp.bgp_match(df, [("?a", f"<{S}author>", "?p")],
                      optional=[("?x", f"<{S}email>", "?e")])
    # well-designed restriction: joining on a var a prior OPTIONAL
    # left nullable diverges from SPARQL LeftJoin -> must raise
    with pytest.raises(ValueError, match="well-designed"):
        bgp.bgp_match(df, [("?a", f"<{S}author>", "?p")],
                      optional=[("?p", f"<{S}email>", "?e"),
                                ("?e", f"<{S}mailbox>", "?x")])


def test_bgp_malformed_filter_fails_before_path_jobs(spark):
    df = _quads_df(spark, [("<l0>", f"<{S}rest>", "<l1>", "")])
    calls = []
    orig = bgp.path_closure
    try:
        bgp.path_closure = lambda *a, **k: calls.append(1) or orig(*a, **k)
        with pytest.raises(ValueError, match="invalid filter"):
            bgp.bgp_match(df, [("?a", f"<{S}rest>+", "?b")],
                          filters=["not valid sql (("])
        # referencing a variable the BGP never binds is also caught
        with pytest.raises(ValueError, match="invalid filter"):
            bgp.bgp_match(df, [("?a", f"<{S}rest>+", "?b")],
                          filters=["nosuchvar > ''"])
    finally:
        bgp.path_closure = orig
    assert calls == []


def test_bgp_filters_restrict_bindings(spark):
    df = _quads_df(spark, BGP_QUADS)
    out = bgp.bgp_match(
        df,
        [("?a", RDF_TYPE, f"<{S}Article>"),
         ("?a", f"<{S}author>", "?p")],
        filters=["a > '<a1>'"])
    assert {(r.a, r.p) for r in out.collect()} == {("<a2>", "<p1>")}
    # a filter over an optional variable sees its nulls (three-valued
    # logic: null comparison drops the row, the SPARQL FILTER behavior)
    out = bgp.bgp_match(
        df,
        [("?a", f"<{S}author>", "?p")],
        optional=[("?p", f"<{S}email>", "?e")],
        filters=["e IS NOT NULL"])
    assert out.count() == 0


def test_bgp_construct_reshapes_and_drops_null_slots(spark):
    """CONSTRUCT: bindings instantiate template quads; an unmatched
    OPTIONAL variable drops only the triples using it (SPARQL 16.2),
    and the output is a distinct quad frame."""
    rows = BGP_QUADS + [("<p1>", f"<{S}email>", '"p1@x"', "")]
    out = bgp.bgp_construct(
        _quads_df(spark, rows),
        [("?a", f"<{S}author>", "?p")],
        template=[("?p", f"<{S}wrote>", "?a"),
                  ("?p", f"<{S}contact>", "?e")],
        optional=[("?p", f"<{S}phone>", "?e")],  # never matches -> null
        graph_out="<g:out>")
    got = {(r.subj, r.pred, r.obj, r.graph) for r in out.collect()}
    # the ?e triple vanished (null slot); the ?p/?a triples dedup over
    # the two articles' shared author into two distinct facts
    assert got == {("<p1>", f"<{S}wrote>", "<a1>", "<g:out>"),
                   ("<p1>", f"<{S}wrote>", "<a2>", "<g:out>")}
    with pytest.raises(ValueError, match="never binds"):
        bgp.bgp_construct(_quads_df(spark, rows),
                          [("?a", f"<{S}author>", "?p")],
                          template=[("?a", f"<{S}x>", "?nope")])
    with pytest.raises(ValueError, match="at least one template"):
        bgp.bgp_construct(_quads_df(spark, rows),
                          [("?a", f"<{S}author>", "?p")], template=[])


def test_bgp_over_entailed_kg_composition(spark):
    """The serving story end-to-end: a query for CreativeWork finds
    nothing on the raw KG and finds the Articles after RDFS
    entailment — inference and query compose on the same quad frame."""
    df = _quads_df(spark, HAND_QUADS)
    pat = [("?x", RDF_TYPE, f"<{S}CreativeWork>")]
    assert bgp.bgp_match(df, pat).count() == 0
    ent = rdfs_entailment(df, DEFAULT_ONTOLOGY) \
        .select("subj", "pred", "obj", "graph")
    assert {r.x for r in bgp.bgp_match(ent, pat).collect()} == {"<a>"}


def test_optional_group_chain_anchored_through_group_triple(spark):
    """OPTIONAL { ?p hasAddr ?addr . ?addr street ?st }: the second
    triple anchors through ?addr (another GROUP triple's var), not a
    required var — a common well-designed shape that must evaluate."""
    rows = BGP_QUADS + [("<p1>", f"<{S}hasAddr>", "<ad1>", ""),
                        ("<ad1>", f"<{S}street>", '"Main St"', "")]
    df = _quads_df(spark, rows)
    out = bgp.bgp_match(
        df, [("?a", f"<{S}author>", "?p")],
        optional=[[("?p", f"<{S}hasAddr>", "?addr"),
                   ("?addr", f"<{S}street>", "?st")]])
    assert {(r.a, r.addr, r.st) for r in out.collect()} == {
        ("<a1>", "<ad1>", '"Main St"'), ("<a2>", "<ad1>", '"Main St"')}


def test_split_ontology_rejects_schema_predicate_sp_targets():
    """A property mapped ONTO an RDFS schema predicate would emit
    schema triples the driver-closed hierarchies never absorb — the
    guard must refuse (silent under-entailment otherwise)."""
    from jsonld_streaming_parser_js_spark.operators.inference import (
        RDFS_SUBCLASS, RDFS_SUBPROP)
    with pytest.raises(ValueError, match="schema predicate"):
        split_ontology([(f"<{S}subsumes>", RDFS_SUBPROP, RDFS_SUBCLASS)])
    with pytest.raises(ValueError, match="schema predicate"):
        # reaches the target through the CLOSURE, not just directly
        split_ontology([(f"<{S}a>", RDFS_SUBPROP, f"<{S}b>"),
                        (f"<{S}b>", RDFS_SUBPROP, RDFS_SUBPROP)])


def test_bgp_path_max_rounds_passthrough(spark):
    P = f"<{S}next>"
    chain = [(f"<n{i}>", P, f"<n{i+1}>", "") for i in range(7)]
    df = _quads_df(spark, chain)
    with pytest.raises(RuntimeError, match="did not converge"):
        bgp.bgp_match(df, [("?x", P + "+", "?y")], path_max_rounds=2)
    ok = bgp.bgp_match(df, [("?x", P + "+", "?y")], path_max_rounds=5)
    assert ok.count() == 28
    with pytest.raises(RuntimeError, match="max_rounds"):
        bgp.bgp_match(df, [("<n0>", P + "+", "?y")], path_max_rounds=2)


def test_bgp_filter_with_all_ground_pattern(spark):
    """A var-free BGP plus a constant filter must not crash the
    validation probe (empty schema string is itself a DDL error)."""
    df = _quads_df(spark, BGP_QUADS)
    hit = bgp.bgp_match(df, [("<p1>", f"<{S}name>", '"P1"')],
                        filters=["1 = 1"])
    assert hit.count() == 1
    miss = bgp.bgp_match(df, [("<p1>", f"<{S}name>", '"P1"')],
                         filters=["1 = 0"])
    assert miss.count() == 0


def test_entailment_distributes_over_union(spark):
    """Every rule has ONE data premise (the ontology is closed first),
    so entailment distributes over corpus unions — the property that
    makes incremental maintenance trivial: entail the new wave alone
    and merge by the same min-tag groupBy."""
    part_a = HAND_QUADS[:2]
    part_b = HAND_QUADS[2:]
    whole = _entailed(spark, HAND_QUADS)
    ent_a = _entailed(spark, part_a)
    ent_b = _entailed(spark, part_b)
    merged: dict = {}
    for d in (ent_a, ent_b):
        for k, v in d.items():
            # min-tag merge: asserted wins over inferred
            merged[k] = v if merged.get(k) != "asserted" else "asserted"
    assert merged == whole


def test_bgp_input_validation(spark):
    df = _quads_df(spark, BGP_QUADS)
    with pytest.raises(ValueError, match="at least one"):
        bgp.bgp_match(df, [])
    with pytest.raises(ValueError, match="not a triple"):
        bgp.bgp_match(df, [("?a", "?b")])


def test_bgp_constants_push_to_parquet_scan(spark, tmp_path):
    """Serving path: over a parquet-backed quad store, the pattern
    constants must reach the scan as PushedFilters (bracket-contents
    check, not substring-after-marker)."""
    store = str(tmp_path / "quads")
    _quads_df(spark, BGP_QUADS).write.parquet(store)
    out = bgp.bgp_match(spark.read.parquet(store), [
        ("?a", RDF_TYPE, f"<{S}Article>"),
        ("?a", f"<{S}author>", "?p"),
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    brackets = [s.split("]", 1)[0]
                for s in plan.split("PushedFilters: [")[1:]]
    # EVERY pattern leg's scan must carry its pred constant — checking
    # only the first bracket would let the second leg regress silently
    assert len(brackets) == 2
    assert all("pred" in b and "EqualTo" in b for b in brackets)
    rows = {(r.a, r.p) for r in out.collect()}
    assert rows == {("<a1>", "<p1>"), ("<a2>", "<p1>")}
