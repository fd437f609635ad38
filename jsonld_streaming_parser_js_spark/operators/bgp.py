"""Basic-graph-pattern (BGP) matching over the KG quad set.

The SPARQL-core serving path: a conjunction of triple patterns with
shared variables, compiled to filtered scans + equi-joins — i.e. the
query a KG consumer actually runs against the constructed graph
(``SELECT ?a ?p ?n WHERE { ?a rdf:type schema:Article . ?a schema:author
?p . ?p schema:name ?n }``).

Compilation model (declarative, Catalyst-friendly):

- each pattern becomes ONE filtered projection of the quad frame:
  constants turn into equality predicates (pushed to the scan —
  ``PushedFilters`` on a parquet-backed store, pytest-checked),
  variables turn into renamed columns;
- patterns join left-to-right on their shared variables. A pattern
  sharing no variable with the accumulated prefix would require a
  cartesian product — that is an ERROR by default (``allow_product``)
  rather than a silent 100 TB blow-up;
- repeated variables inside one pattern (e.g. ``(?x ?p ?x)``) become a
  self-equality predicate on that pattern's scan;
- a predicate written ``"<iri>+"`` is the SPARQL one-or-more property
  path: the leg becomes the predicate's transitive closure
  (``path_closure``, iterated squaring — O(log diameter) shuffle
  rounds) and composes with the other patterns like any leg.

Semantics: SPARQL BGP *bag* matching over the selected graph. The
default-graph selection (``graph=''``) mirrors the engine's convention
that top-level triples carry an empty graph label; ``graph=None``
matches across all graphs (the union graph). Named-graph patterns
(SPARQL ``GRAPH ?g { ... }``) ARE supported via ``graph_var``: the
graph label binds like a fourth slot on every pattern, joining the
legs so one solution's triples all come from the same named graph
(the default graph is excluded, per SPARQL).

Scale design (100 TB): no driver-side data movement at all; every
pattern is a predicate-pushed scan of the same store, so a
pred-partitioned or bucketed quad layout prunes to the touched
predicates. Join order is the caller's pattern order; AQE picks
broadcast vs shuffle per join at runtime (selective patterns — type +
constant — collapse to broadcast sides). Variable columns are term
strings (high-cardinality, uniform) so shuffle keys don't skew.

Reference scope note: the reference (jsonld-streaming-parser.js)
produces quads and stops; BGP querying is the downstream capability
that makes the constructed KG consumable. Pattern semantics follow
W3C SPARQL 1.1 section 18.3 (basic graph pattern matching).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POSITIONS = ("subj", "pred", "obj")


def is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?") and len(term) > 1


def is_path_plus(pred: str) -> bool:
    """SPARQL one-or-more property path: an IRI predicate suffixed with
    ``+`` (``"<http://...rest>+"``)."""
    return (isinstance(pred, str) and pred.endswith(">+")
            and pred.startswith("<"))


def path_closure(quads: DataFrame, pred: str, max_rounds: int = 20,
                 stats: dict | None = None) -> DataFrame:
    """Transitive closure (one or more steps) of ONE predicate's edge
    relation — the evaluation of the SPARQL property path ``pred+``.

    Returns (src, dst) pairs with SET semantics (SPARQL 18.4
    ALP/ZeroOrMorePath-style: paths are deduplicated, so cycles are
    safe — the closure of a finite relation is finite).

    Scale design: iterated squaring, not step-at-a-time walking — each
    round joins the closure with itself (``reach(a,c) if reach(a,b)
    and reach(b,c)``), so reachable DISTANCE doubles per round and a
    diameter-d relation closes in O(log d) shuffle rounds (the same
    reasoning as the large-star/small-star CC path,
    canonicalize.py). Per round: one equi-join + one distinct, both
    keyed on high-cardinality node terms; each round's closure is
    LAZILY localCheckpoint'd and materialized by the convergence count
    — one Spark job per round, flat plans (the CC loop idiom,
    canonicalize.py:201). Convergence is exact and cheap: closure
    growth is monotone over a distinct relation, so an unchanged COUNT
    is set equality (no signature needed). Detection costs one
    confirming round on top of the doublings, so ``max_rounds``
    GUARANTEES diameters up to 2^(max_rounds-1) (default 2^19);
    deeper relations raise instead of silently truncating. Pass a
    ``stats`` dict to read back ``stats['rounds']``.

    For a CONSTANT-seeded path (``<c> pred+ ?m``) use
    ``path_reachable`` instead — it walks only the reachable set; this
    function closes the predicate's WHOLE relation, the right shape
    only when both endpoints are variables (bgp_match dispatches
    accordingly).

    ``quads`` must already be restricted to the graph the caller wants
    (bgp_match passes its graph-filtered base).
    """
    e = (quads.where(F.col("pred") == pred)
         .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
         .distinct().localCheckpoint(eager=False))
    clo = e
    n = clo.count()  # materializes the lazy checkpoint
    rounds = 0
    for _ in range(max_rounds):
        step = (clo.alias("a")
                .join(clo.alias("b"), F.col("a.dst") == F.col("b.src"))
                .select(F.col("a.src").alias("src"),
                        F.col("b.dst").alias("dst")))
        nxt = clo.unionByName(step).distinct().localCheckpoint(eager=False)
        n_nxt = nxt.count()  # one job: materialize + converge-check
        rounds += 1
        if n_nxt == n:
            clo = nxt
            break
        clo, n = nxt, n_nxt
    else:
        raise RuntimeError(
            f"path_closure({pred}) did not converge in {max_rounds} "
            f"rounds (count-based detection needs ceil(log2 d)+1 "
            f"rounds, so diameter may exceed 2^{max_rounds - 1}); "
            "raise max_rounds if the graph is genuinely that deep")
    if stats is not None:
        stats["rounds"] = rounds
        stats["pairs"] = n
    return clo


def path_reachable(quads: DataFrame, pred: str, seed: str,
                   reverse: bool = False, max_rounds: int = 10_000,
                   stats: dict | None = None) -> DataFrame:
    """Terms reachable from constant ``seed`` in >= 1 ``pred`` steps —
    the constant-seeded evaluation of ``<seed> pred+ ?m`` (or, with
    ``reverse=True``, the terms that REACH the seed: ``?x pred+
    <seed>``). Returns a single column ``dst`` holding the reached
    (resp. reaching) terms, set semantics.

    Scale design: frontier BFS, NOT whole-relation squaring — each
    round joins only the current frontier against the edge relation
    and anti-joins the visited set, so per-round cost is proportional
    to the REACHABLE set (frontier x out-degree), never to the
    predicate's full closure (the review finding on single-source
    queries: closing every chain in a 100 TB store to answer one is a
    job-sized waste). O(depth) rounds — the right trade for seeded
    queries, where depth bounds the work anyway; variable-variable
    paths use ``path_closure``'s O(log d) squaring instead. Lazy
    localCheckpoint + count per round (one job), the CC loop idiom.
    """
    e = quads.where(F.col("pred") == pred).select(
        F.col("obj" if reverse else "subj").alias("src"),
        F.col("subj" if reverse else "obj").alias("dst")) \
        .distinct().localCheckpoint(eager=False)
    frontier = (e.where(F.col("src") == seed).select("dst")
                .distinct().localCheckpoint(eager=False))
    visited = frontier
    rounds = 1
    n_front = frontier.count()
    while n_front:
        if rounds >= max_rounds:
            raise RuntimeError(
                f"path_reachable({pred}) exceeded max_rounds="
                f"{max_rounds} (path depth from the seed is larger); "
                "raise max_rounds for genuinely deeper graphs")
        # string aliases: frontier/visited share e's lineage, so
        # unqualified column refs are ambiguous self-join columns
        frontier = (frontier.alias("f")
                    .join(e.alias("e"), F.col("f.dst") == F.col("e.src"))
                    .select(F.col("e.dst").alias("dst")).distinct()
                    .join(visited, on="dst", how="left_anti")
                    .localCheckpoint(eager=False))
        n_front = frontier.count()
        rounds += 1
        if n_front:
            visited = (visited.unionByName(frontier)
                       .localCheckpoint(eager=False))
    if stats is not None:
        stats["rounds"] = rounds
        stats["reached"] = None  # caller counts if needed
    return visited


def bgp_match(quads: DataFrame,
              patterns: Sequence[tuple[str, str, str]],
              graph: str | None = "",
              allow_product: bool = False,
              distinct: bool = False,
              optional: Sequence[tuple[str, str, str]] = (),
              filters: Sequence[str] = (),
              path_max_rounds: int | None = None,
              graph_var: str | None = None,
              minus: Sequence = ()) -> DataFrame:
    """Match a conjunction of triple patterns against the quad frame.

    ``patterns``: (s, p, o) tuples; elements starting with ``?`` are
    variables, everything else is a constant term in the engine's
    N-Triples lexical form (``<iri>``, ``_:b0``, ``"lit"...``).
    Returns one column per distinct variable, named without the ``?``.

    ``graph``: quad-graph label to match in ('' = default graph, the
    engine's top-level convention); None = union graph (all quads).
    ``allow_product``: permit VARIABLE-bearing patterns that share no
    variable with the prefix already joined (an explicit cartesian
    opt-in; default raises, because an accidental product at corpus
    scale is a job killer, not a query). Ground (all-constant)
    patterns never need the opt-in: they are existence filters whose
    match count (0/1 on a distinct fact set) multiplies the bindings —
    SPARQL bag semantics — via a bounded crossJoin.
    ``distinct``: apply set semantics to the final bindings (SPARQL
    SELECT DISTINCT); default is bag semantics like SPARQL SELECT.
    ``optional``: OPTIONAL blocks with SPARQL LeftJoin semantics —
    each entry is ONE triple pattern or a GROUP (list of triples). A
    group is evaluated jointly (its triples inner-join like a required
    block — ``OPTIONAL { A . B }`` matches all-or-nothing) and the
    result left-joined, so bindings survive a non-match with the
    block's new variables null. Each block must share at least one
    variable with the patterns before it (a disconnected OPTIONAL is a
    product; a ground OPTIONAL is a no-op — both raise), and every
    SHARED variable must be bound by the required block (the
    well-designed-pattern restriction: joining on a variable a prior
    OPTIONAL left nullable diverges from SPARQL LeftJoin compatibility,
    so that shape raises instead of silently mis-answering).
    ``filters``: SQL boolean expressions over the variable columns
    (SPARQL FILTER), applied before the DISTINCT projection; Catalyst
    pushes them into the scans where legal.
    ``path_max_rounds``: override the convergence budget of every
    path leg (path_closure's squaring rounds / path_reachable's BFS
    depth) — the escape hatch their convergence errors point at.
    ``minus``: SPARQL ``MINUS { ... }`` blocks (each a triple or a
    group like ``optional``): solutions compatible with some solution
    of the block on their SHARED variables are removed — a left-anti
    join on those variables. Restrictions that keep SQL anti-join
    semantics equal to SPARQL's: the shared variables must be bound
    by the REQUIRED block (a nullable shared var diverges, same as
    the OPTIONAL well-designed rule), and a block sharing NO variable
    raises (SPARQL defines it as a silent no-op — an error beats a
    silently useless negation).
    ``graph_var``: SPARQL ``GRAPH ?g { ... }`` semantics — bind the
    quad's graph label as variable ``graph_var`` on EVERY pattern
    (it joins the legs like any shared variable, so one solution's
    triples all come from the same graph). Requires ``graph=None``
    (a constant graph selection and a graph variable are mutually
    exclusive) and forbids property-path patterns (a closure would
    have to run per graph; filter to one graph first).
    """
    if not patterns:
        raise ValueError("bgp_match needs at least one triple pattern")
    base = quads.select("subj", "pred", "obj", "graph")
    if graph is not None:
        base = base.where(F.col("graph") == graph)
    elif graph_var is not None:
        # SPARQL GRAPH ?g ranges over NAMED graphs only — exclude the
        # default graph (the engine's '' label)
        base = base.where(F.col("graph") != "")

    # validate the WHOLE pattern list (and filters) before evaluating
    # any leg: a path leg runs Spark jobs at build time (its fixpoint
    # needs actions), and a later malformed/disconnected pattern or
    # unparseable filter must not discover its error after those jobs
    # already burned. One loop for required and optional patterns so
    # the variable-extraction rule cannot drift between them.
    # normalize optional/minus entries: a bare (s, p, o) triple is a
    # one-triple group; a list/tuple of triples is a joint group
    def _norm_groups(entries) -> list[list]:
        groups: list[list] = []
        for entry in entries:
            if (len(entry) == 3
                    and all(isinstance(t, str) for t in entry)):
                groups.append([tuple(entry)])
            else:
                groups.append([tuple(p) for p in entry])
        return groups

    opt_groups = _norm_groups(optional)
    minus_groups = _norm_groups(minus)

    def _group_vars(grp, label: str, required: set[str]) -> set[str]:
        """Shared by the OPTIONAL and MINUS validation paths (one
        variable-extraction + anchoring rule, no drift): returns the
        group's variable union after checking triple shape and —
        for multi-triple groups — that every triple is anchored to
        the required block or to ANOTHER group triple's vars."""
        vs: set[str] = set()
        per_triple: list[set[str]] = []
        for p3 in grp:
            if len(p3) != 3:
                raise ValueError(
                    f"{label} pattern is not a triple: {p3!r}")
            terms = (p3[0], p3[2]) if is_path_plus(p3[1]) else p3
            tv = {t[1:] for t in terms if is_var(t)}
            per_triple.append(tv)
            vs |= tv
        for i3, (p3, tv) in enumerate(zip(grp, per_triple)):
            others: set[str] = set()
            for j3, ov in enumerate(per_triple):
                if j3 != i3:
                    others |= ov
            if tv and len(per_triple) > 1 \
                    and not (tv & (required | others)):
                raise ValueError(
                    f"{label} triple {p3!r} shares no variable with "
                    "the required block or the rest of its group — "
                    "an unanchored product")
        return vs

    if graph_var is not None:
        if graph is not None:
            raise ValueError(
                "graph_var and a constant graph selection are "
                "mutually exclusive — pass graph=None with graph_var")
        if not is_var("?" + graph_var):
            # an invalid name would silently turn the graph slot into
            # a constant-term filter (zero rows, no error)
            raise ValueError(
                f"graph_var must be a variable name (got "
                f"{graph_var!r})")
        all_triples = (list(patterns)
                       + [t for g in opt_groups for t in g]
                       + [t for g in minus_groups for t in g])
        if any(is_path_plus(p[1]) for p in all_triples
               if len(p) == 3):
            raise ValueError(
                "property-path patterns inside GRAPH ?var blocks are "
                "unsupported (the closure would have to run per "
                "graph) — select a constant graph first")

    seen: set[str] = set()
    required_vars: set[str] = set()
    if graph_var is not None:
        # the graph var is bound by EVERY leg (required-bound for the
        # well-designed check, and a legal join key at eval), but it
        # deliberately does NOT count toward the pattern-connectivity
        # guards (it stays out of `seen` and each pattern's var set):
        # two patterns sharing only the graph label are still a
        # per-graph cross product — the job-killer the product check
        # exists to refuse
        required_vars.add(graph_var)
    flat: list[tuple[bool, tuple]] = [(False, p) for p in patterns]
    for grp in opt_groups:
        # a group validates as ONE unit: its triples' union var set
        flat.append((True, ("__group__", grp)))
    for kind_idx, (is_opt, pat) in enumerate(flat):
        label = ("optional pattern" if is_opt else "pattern")
        if is_opt:
            grp = pat[1]
            # one shared extraction + anchoring rule for OPTIONAL and
            # MINUS groups (_group_vars): every triple of a
            # multi-triple group must be anchored to the required
            # block or another group triple, so the group's internal
            # evaluation (allow_product=True, honoring SPARQL's
            # join-of-legs semantics) can never produce an unanchored
            # product. All required patterns precede groups in
            # `flat`, so required_vars is complete here.
            vs = _group_vars(grp, "OPTIONAL", required_vars)
            pat = grp[0] if len(grp) == 1 else tuple(grp)
        else:
            if len(pat) != 3:
                raise ValueError(
                    f"{label} {kind_idx} is not a triple: {pat!r}")
            terms = (pat[0], pat[2]) if is_path_plus(pat[1]) else pat
            vs = {t[1:] for t in terms if is_var(t)}
        if not is_opt:
            if (kind_idx and seen and vs and not (seen & vs)
                    and not allow_product):
                raise ValueError(
                    f"pattern {kind_idx} {pat!r} shares no variable "
                    "with the patterns before it — this is a cartesian "
                    "product; reorder the BGP or pass allow_product=True")
            required_vars |= vs
        else:
            if not vs:
                raise ValueError(
                    f"{label} {pat!r} is ground — OPTIONAL over an "
                    "all-constant pattern never changes any binding; "
                    "drop it or make it a required pattern")
            if not (seen & vs):
                raise ValueError(
                    f"{label} {pat!r} shares no variable with the "
                    "patterns before it — a disconnected OPTIONAL is a "
                    "product; bind at least one of its variables "
                    "earlier")
            nullable_keys = (seen & vs) - required_vars
            if nullable_keys:
                # well-designed-pattern restriction (Perez et al.): a
                # variable bound only by a PRIOR OPTIONAL is nullable,
                # and SQL equality on a null key never matches where
                # SPARQL's LeftJoin treats unbound as compatible-with-
                # anything — refuse rather than silently diverge
                raise ValueError(
                    f"{label} {pat!r} joins on {sorted(nullable_keys)} "
                    "bound only by a previous OPTIONAL — not a "
                    "well-designed pattern; a left join on a nullable "
                    "key diverges from SPARQL OPTIONAL semantics. "
                    "Restructure so every shared variable is bound by "
                    "the required block")
        seen |= vs
    # MINUS blocks: validate shared-variable keys before evaluating
    # anything (same placement rationale as the pattern pre-pass)
    minus_keys: list[list[str]] = []
    for grp in minus_groups:
        vs = _group_vars(grp, "MINUS", required_vars)
        shared = vs & seen
        if not shared:
            raise ValueError(
                f"MINUS group {grp!r} shares no variable with the "
                "query — SPARQL defines disjoint-domain MINUS as a "
                "silent no-op; an error beats a negation that removes "
                "nothing")
        nullable = shared - required_vars
        if nullable:
            raise ValueError(
                f"MINUS group {grp!r} joins on {sorted(nullable)} "
                "bound only by an OPTIONAL — an anti-join on a "
                "nullable key diverges from SPARQL compatibility; "
                "restructure so shared variables are required-bound")
        keys = sorted(shared)
        if graph_var is not None:
            keys = sorted(set(keys) | {graph_var})
        minus_keys.append(keys)

    if filters:
        # F.expr parses LAZILY (PySpark 4), so force driver-side
        # parse+analysis against an empty frame carrying every bound
        # variable — a malformed filter OR one referencing an unknown
        # variable fails here, before any path leg burns Spark jobs.
        # A var-free (all-ground) BGP still gets a one-column probe:
        # an empty schema string is itself a DDL parse error.
        probe_vars = seen | ({graph_var} if graph_var is not None
                             else set())
        probe_schema = (", ".join(f"`{v}` string"
                                  for v in sorted(probe_vars))
                        or "`__probe__` string")
        probe = quads.sparkSession.createDataFrame([], schema=probe_schema)
        for f in filters:
            try:
                probe.where(F.expr(f)).schema  # .schema forces analysis
            except Exception as ex:
                raise ValueError(
                    f"invalid filter {f!r} (must be a SQL boolean over "
                    f"the bound variables {sorted(probe_vars)}): "
                    f"{ex}") from ex

    markers: list[str] = []  # ground-pattern placeholder columns

    def build_leg(idx: int, pat) -> tuple[DataFrame, dict[str, str]]:
        """One pattern -> (projected leg, var->position map)."""
        if is_path_plus(pat[1]):
            # property path pred+: dispatch on which endpoints are
            # constant — a seeded path walks only the reachable set
            # (path_reachable), a variable-variable path needs the
            # whole relation's closure (path_closure)
            p_iri = pat[1][:-1]
            s_t, o_t = pat[0], pat[2]
            rounds_kw = ({} if path_max_rounds is None
                         else {"max_rounds": path_max_rounds})
            if is_var(s_t) and is_var(o_t):
                frame = path_closure(base, p_iri, **rounds_kw)
                slots = (("src", s_t), ("dst", o_t))
            elif not is_var(s_t):
                frame = path_reachable(base, p_iri, s_t, **rounds_kw)
                slots = (("dst", o_t),)
            else:  # variable subject, constant object: reverse walk
                frame = path_reachable(base, p_iri, o_t, reverse=True,
                                       **rounds_kw)
                slots = (("dst", s_t),)
        else:
            frame = base
            slots = tuple(zip(_POSITIONS, pat))
            if graph_var is not None:
                # GRAPH ?g: the graph label binds like a 4th slot and
                # joins the legs like any shared variable
                slots = slots + (("graph", "?" + graph_var),)
        cond = None
        var_cols: dict[str, str] = {}  # var name -> first position col
        for pos, term in slots:
            if is_var(term):
                name = term[1:]
                if name in var_cols:
                    # repeated variable inside one pattern: equality
                    # between the two positions of the same scan row
                    c = F.col(pos) == F.col(var_cols[name])
                    cond = c if cond is None else (cond & c)
                else:
                    var_cols[name] = pos
            else:
                c = F.col(pos) == F.lit(term)
                cond = c if cond is None else (cond & c)
        leg = frame.where(cond) if cond is not None else frame
        if not var_cols:
            # all-constant pattern: a highly selective existence
            # filter (bag semantics: k matching quads multiply the
            # bindings by k — 0 or 1 on a distinct fact set). A
            # placeholder column keeps the DataFrame non-degenerate;
            # it is dropped before returning.
            marker = f"__ground_{idx}"
            markers.append(marker)
            leg = leg.select(F.lit(True).alias(marker))
        else:
            leg = leg.select(
                *[F.col(pos).alias(name) for name, pos in var_cols.items()])
        return leg, var_cols

    out: DataFrame | None = None
    bound: set[str] = set()
    for idx, pat in enumerate(patterns):
        leg, var_cols = build_leg(idx, pat)
        if out is None:
            out, bound = leg, set(var_cols)
            continue
        keys = sorted(bound & set(var_cols))
        if keys:
            out = out.join(leg, on=keys, how="inner")
        elif not var_cols or not bound:
            # a ground leg (or a prefix that is ONLY ground legs) is a
            # bounded multiplier, not a data-sized product — no opt-in
            # needed
            out = out.crossJoin(leg)
        elif not allow_product:
            raise ValueError(
                f"pattern {idx} {pat!r} shares no variable with the "
                "patterns before it — this is a cartesian product; "
                "reorder the BGP or pass allow_product=True")
        else:
            out = out.crossJoin(leg)
        bound |= set(var_cols)

    # OPTIONAL blocks: SPARQL LeftJoin semantics — bindings survive
    # whether or not the block matches; its NEW variables are null on
    # non-match. A multi-triple group evaluates JOINTLY (a recursive
    # bgp_match over the same quads: all-or-nothing like SPARQL
    # ``OPTIONAL { A . B }``), then left-joins on its shared variables
    # (validated non-empty and required-bound above).
    for off, grp in enumerate(opt_groups):
        if len(grp) == 1:
            leg, var_cols = build_leg(len(patterns) + off, grp[0])
            leg_vars = set(var_cols)
        else:
            # allow_product=True HERE is deliberate: a group whose
            # triples connect only through REQUIRED vars (validated
            # anchored above) is legal SPARQL — its internal join is
            # a product that the subsequent left-join keys filter.
            # Scale caveat: that intermediate product is real work;
            # restructure such groups into separate OPTIONALs when
            # the legs are independent.
            leg = bgp_match(quads, grp, graph=graph,
                            allow_product=True,
                            path_max_rounds=path_max_rounds,
                            graph_var=graph_var)
            leg_vars = set(leg.columns)
        keys = sorted(bound & leg_vars)
        out = out.join(leg, on=keys, how="left")
        bound |= leg_vars

    # MINUS blocks: anti-join on the validated required-bound shared
    # keys — one shuffle-or-broadcast anti-join per block, never a
    # row-by-row existence probe
    for off, grp in enumerate(minus_groups):
        if len(grp) == 1:
            leg, _ = build_leg(
                len(patterns) + len(opt_groups) + off, grp[0])
        else:
            leg = bgp_match(quads, grp, graph=graph,
                            allow_product=True,
                            path_max_rounds=path_max_rounds,
                            graph_var=graph_var)
        out = out.join(leg, on=minus_keys[off], how="left_anti")

    # FILTER expressions (SQL boolean over the variable columns),
    # applied inside the group pattern like SPARQL FILTER — before
    # DISTINCT projection; Catalyst pushes them down where legal
    for f in filters:
        out = out.where(F.expr(f))

    out = out.drop(*markers) if markers else out
    return out.distinct() if distinct else out


def bgp_construct(quads: DataFrame,
                  patterns: Sequence[tuple[str, str, str]],
                  template: Sequence[tuple[str, str, str]],
                  graph_out: str = "",
                  **match_kwargs) -> DataFrame:
    """SPARQL CONSTRUCT: evaluate the pattern block, then instantiate
    ``template`` triples from each binding — the KG-transformation
    query (reshape, vocabulary mapping, view materialization).

    ``template``: (s, p, o) tuples over the matched variables and/or
    constant terms; each template triple yields one output quad per
    binding, in graph ``graph_out``. Rows where any template slot is
    null (an unmatched OPTIONAL variable) are dropped for that triple
    only — SPARQL 16.2's incomplete-instantiation rule. Output is the
    DISTINCT quad frame (subj, pred, obj, graph): CONSTRUCT builds a
    graph, and a graph is a fact set.

    Scale: one bgp_match evaluation feeds all template triples
    (union of narrow projections — no re-matching per triple), then
    one distinct shuffle; ``match_kwargs`` pass through to bgp_match
    (graph, optional, filters, ...).
    """
    if not template:
        raise ValueError("bgp_construct needs at least one template "
                         "triple")
    # lazy checkpoint: the union branches below would otherwise each
    # re-execute the whole match pipeline (Spark does not share
    # subtrees across union branches) — materialized once by the
    # first action, the shared-base rule
    bindings = bgp_match(quads, patterns,
                         **match_kwargs).localCheckpoint(eager=False)
    bound = set(bindings.columns)
    legs = []
    for idx, tpl in enumerate(template):
        if len(tpl) != 3:
            raise ValueError(
                f"template triple {idx} is not a triple: {tpl!r}")
        cols = []
        for term in tpl:
            if is_var(term):
                name = term[1:]
                if name not in bound:
                    raise ValueError(
                        f"template triple {idx} {tpl!r} uses ?{name}, "
                        f"which the pattern block never binds "
                        f"(bound: {sorted(bound)})")
                cols.append(F.col(name))
            else:
                cols.append(F.lit(term))
        leg = bindings.select(cols[0].alias("subj"),
                              cols[1].alias("pred"),
                              cols[2].alias("obj"),
                              F.lit(graph_out).alias("graph"))
        # incomplete instantiation: a null slot (unmatched OPTIONAL
        # var) drops the triple for that binding, not the whole row
        leg = leg.where(F.col("subj").isNotNull()
                        & F.col("pred").isNotNull()
                        & F.col("obj").isNotNull())
        legs.append(leg)
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.distinct()
