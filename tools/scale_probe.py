"""Scale probe for the two iterated operators (r7 verdict ask #7).

The EXPLAIN invariants argue the 100x story analytically; this tool
MEASURES it on the sandbox's closest stand-in: the same jobs at
amplified input sizes, recording wall time, total shuffle write bytes
(Spark REST API), and CC iteration counts.

  - ``fuzzy`` leg: the kg_canonical_fuzzy entity corpus amplified by
    replicating documents with disjoint doc_id ranges (every replica is
    a NEW 3-node A-B-C chain — entity count scales linearly, exactly how
    a bigger crawl behaves). amplify=100 at sf0.1 is 1.5M entities /
    18M feature rows (the lane's own 100x point; the pages-corpus
    "~40M quads" scale is covered by the memo leg below — at 1000x the
    FEATURE table would be 180M rows, past this box's one-probe budget).
  - ``memo`` leg: bench.memo_leg at amplify=1000 -> 5M block
    occurrences / 5k distinct (~40M quads through the plain side).

Usage: python tools/scale_probe.py [--fuzzy 1,30,100] [--memo 1000]
       [--decon 40,500] [--pagerank 1,10,50] [--ccchain 100000]
       [--hll 5000000] [--rdfs 1,10,50] [--bgp 1,10,50]
Every leg is opt-in (no defaults run), so a single-leg invocation
reproduces exactly the one BENCH.md table it names. Prints one JSON
line; BENCH.md quotes it.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _shuffle_write_bytes(spark) -> int:
    """Total shuffle write bytes across all retained stages (REST API),
    ANY status (a failed stage's partial shuffle writes are real bytes).
    Returns -1 when the UI is unreachable. Caveat: the UI retains only
    spark.ui.retainedStages stages (the probe session raises it to
    20000), so per-leg deltas are valid only while no eviction happened
    between the two samples — _delta() nulls a non-monotonic pair
    instead of reporting an undercount."""
    try:
        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages",
                                    timeout=10) as fh:
            stages = json.loads(fh.read())
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:  # noqa: BLE001 - metrics are best-effort
        return -1


def _delta(sw0: int, sw1: int) -> int | None:
    """sw1-sw0, or None when either sample failed or stage eviction made
    the pair non-monotonic (an undercount must not masquerade as data)."""
    return (sw1 - sw0) if 0 <= sw0 <= sw1 else None


def amplified_entity_quads(spark, sf_dir: str, amplify: int):
    """The _entity_quads corpus from __spark_entry__, amplified: replica
    r gets doc_id' = doc_id + r * 10_000_000, so every replica is a
    fresh disjoint A-B-C chain (linear entity growth, same topology)."""
    from pyspark.sql import functions as F
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id")
            .withColumn("rep", F.explode(
                F.sequence(F.lit(0), F.lit(amplify - 1))))
            .select((F.col("doc_id")
                     + F.col("rep") * F.lit(10_000_000)).alias("doc_id")))
    ent = (docs
           .select("doc_id",
                   F.explode(F.sequence(F.lit(0), F.lit(2))).alias("r"))
           .select("doc_id", "r",
                   F.explode(F.sequence(F.lit(0), F.lit(11))).alias("j")))
    return ent.select(
        F.lit("synthetic://entities").alias("url"),
        F.lit(0).alias("blk"),
        F.concat(F.lit("<http://auth.example.org/e"),
                 F.col("doc_id").cast("string"),
                 F.expr("substr('abc', r + 1, 1)"),
                 F.lit(">")).alias("subj"),
        F.lit("<http://ex.org/feat>").alias("pred"),
        F.concat(F.lit('"t'), F.col("doc_id").cast("string"), F.lit("_"),
                 (F.col("r") * 2 + F.col("j")).cast("string"),
                 F.lit('"')).alias("obj"),
        F.lit("").alias("graph"))


def fuzzy_leg(spark, amplify: int) -> dict:
    from jsonld_streaming_parser_js_spark.operators import (
        canonicalize as canon)
    sw0 = _shuffle_write_bytes(spark)
    cc_stats: dict = {}
    t0 = time.time()
    quads = amplified_entity_quads(spark, SF_DIR, amplify)
    mapping = canon.canonical_mapping_fuzzy(
        quads, min_jaccard=0.6, num_hashes=32, bands=16,
        cc_stats=cc_stats)
    n_mapped = mapping.count()
    wall = time.time() - t0
    sw1 = _shuffle_write_bytes(spark)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    return {"amplify": amplify,
            "n_feature_rows": n_docs * 36 * amplify,
            "n_entities": 3 * n_docs * amplify,
            "n_mapped": n_mapped,
            "cc_iterations": cc_stats.get("iterations"),
            "wall_sec": round(wall, 1),
            "shuffle_write_bytes": _delta(sw0, sw1)}


def decon_leg(spark, eval_amplify: int) -> dict:
    """Decontamination at a GROWN eval set (r7 ADVICE follow-up): the
    broadcast guard in contamination_flags exists for the eval set that
    did not stay tiny; this leg measures both sides of the bound.
    Replica r token-renames the eval text (every token gets a 'q<r>'
    suffix, one JVM regexp pass) so the DISTINCT gram count grows
    linearly — the worst case for the broadcast (no overlap collapses
    it). Records which join strategy the guard picked (from the
    physical plan: the only possible BroadcastHashJoin source here is
    the guarded hint when auto-broadcast is off), wall, and shuffle
    delta — evidence that past the bound the operator degrades to a
    bounded shuffle join instead of an executor/driver OOM."""
    from pyspark.sql import functions as F

    from jsonld_streaming_parser_js_spark.operators import textstats as ts
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
    base = docs.where(F.pmod("doc_id", F.lit(41)) == 0)
    ev = (base.withColumn("rep", F.explode(
              F.sequence(F.lit(0), F.lit(eval_amplify - 1))))
          .select((F.col("doc_id") * eval_amplify + F.col("rep"))
                  .alias("doc_id"),
                  F.when(F.col("rep") == 0, F.col("text"))
                  .otherwise(F.regexp_replace(
                      "text", F.lit("([a-z0-9]+)"),
                      F.concat(F.lit("$1q"), F.col("rep"))))
                  .alias("text")))
    n_eval_grams = (ts._token_ngrams(ev, 13).select("g").distinct()
                    .count())
    sw0 = _shuffle_write_bytes(spark)
    t0 = time.time()
    with ts.hint_only_broadcasts(spark):
        flags = ts.contamination_flags(docs, ev, n=13,
                                       broadcast_eval=None)
        n_contaminated = flags.where("contaminated").count()
        plan = flags._jdf.queryExecution().sparkPlan().toString()
    wall = time.time() - t0
    sw1 = _shuffle_write_bytes(spark)
    return {"eval_amplify": eval_amplify,
            "n_eval_grams": n_eval_grams,
            "guard_bound": ts.BROADCAST_EVAL_MAX_GRAMS,
            "broadcast_chosen": "BroadcastHashJoin" in plan,
            "n_contaminated": n_contaminated,
            "wall_sec": round(wall, 1),
            "shuffle_write_bytes": _delta(sw0, sw1)}


def pagerank_base_edges(spark):
    """The real KG edge list, parsed ONCE and deduped to the simple
    directed pairs pagerank actually iterates (graphalgo dedupes
    internally; counting pre-dedup rows would overstate B/edge).
    localCheckpoint'd so every probe leg amplifies the same
    materialization instead of re-running the parse."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry

    q = entry._quads(spark, SF_DIR)
    return (q.where(~F.col("obj").startswith('"'))
            .select(F.col("subj").alias("src"),
                    F.col("obj").alias("dst"))
            .dropDuplicates(["src", "dst"])
            .localCheckpoint())


def pagerank_leg(spark, amplify: int, base) -> dict:
    """PageRank at an amplified graph (probe rotation, r7): the real KG
    edge list is replicated with a per-replica node-suffix rename, so
    every replica is a disjoint copy of the real topology — node and
    edge counts grow linearly while degree distribution and diameter
    stay exactly the crawl's. 5 fixed iterations as in the lane; the
    scale claim under test is wall ~ O(edges) per iteration (each
    iteration is one equi-join + one groupBy on uniform node ids)."""
    from pyspark.sql import functions as F

    from jsonld_streaming_parser_js_spark.operators import graphalgo

    edges = (base.withColumn("rep", F.explode(
                 F.sequence(F.lit(0), F.lit(amplify - 1))))
             .select(F.concat("src", F.lit("#r"),
                              F.col("rep").cast("string")).alias("src"),
                     F.concat("dst", F.lit("#r"),
                              F.col("rep").cast("string")).alias("dst")))
    sw0 = _shuffle_write_bytes(spark)
    t0 = time.time()
    pr = graphalgo.pagerank(edges, iterations=5)
    n_nodes = pr.count()
    wall = time.time() - t0
    sw1 = _shuffle_write_bytes(spark)
    return {"amplify": amplify,
            "n_edges": base.count() * amplify,
            "n_nodes": n_nodes,
            "iterations": 5,
            "wall_sec": round(wall, 1),
            "shuffle_write_bytes": _delta(sw0, sw1)}


def _amplify_instance_terms(base, amplify: int):
    """Replicate a quad frame with a per-replica suffix on INSTANCE
    terms only — vocabulary IRIs (schema.org / w3.org), literals, and
    the default-graph label stay intact, so every replica matches the
    same rules/patterns independently. ONE keep-list shared by the
    rdfs and bgp legs (their linearity claims must amplify
    identically)."""
    from pyspark.sql import functions as F

    sfx = F.concat(F.lit("#r"), F.col("rep").cast("string"))

    def rename(col: str):
        keep = (F.col(col).startswith('"')
                | F.col(col).startswith("<http://schema.org/")
                | F.col(col).startswith("<http://www.w3.org")
                | (F.col(col) == F.lit("")))
        return F.when(keep, F.col(col)).otherwise(F.concat(F.col(col), sfx))

    rep = base.withColumn("rep", F.explode(
        F.sequence(F.lit(0), F.lit(amplify - 1))))
    return rep.select(rename("subj").alias("subj"), "pred",
                      rename("obj").alias("obj"),
                      rename("graph").alias("graph"))


def rdfs_leg(spark, amplify: int, base) -> dict:
    """RDFS entailment at an amplified KG: the real quad set is
    replicated with a per-replica suffix on INSTANCE terms only
    (subjects, bnodes, entity objects) while vocabulary IRIs
    (schema.org classes/properties, rdf:/rdfs: terms) and literals are
    left intact — every replica is a disjoint instance graph over the
    SAME ontology, so rule hits (and the inferred fact count) grow
    exactly linearly. The scale claim under test: wall ~ O(quads) —
    the rule legs are broadcast probes over one materialized base and
    the only shuffle is the final dedupe/provenance groupBy on uniform
    quad keys."""
    from jsonld_streaming_parser_js_spark.operators.inference import (
        DEFAULT_ONTOLOGY, rdfs_entailment)

    quads = _amplify_instance_terms(base, amplify)
    sw0 = _shuffle_write_bytes(spark)
    t0 = time.time()
    ent = rdfs_entailment(quads, DEFAULT_ONTOLOGY)
    by_src = dict(ent.groupBy("src").count().collect())
    wall = time.time() - t0
    sw1 = _shuffle_write_bytes(spark)
    return {"amplify": amplify,
            "n_quads_in": base.count() * amplify,
            "n_asserted": by_src.get("asserted", 0),
            "n_inferred": by_src.get("inferred", 0),
            "wall_sec": round(wall, 1),
            "shuffle_write_bytes": _delta(sw0, sw1)}


def bgp_leg(spark, amplify: int, base) -> dict:
    """The three-pattern author conjunction (kg_bgp_query
    shape='authors') at an amplified KG — same instance-term rename as
    rdfs_leg so every replica matches independently. Scale claim under
    test: bindings grow exactly linearly and wall ~ O(quads) — three
    predicate-filtered legs of one materialized store, variable
    equi-joins on uniform term keys (AQE picks the strategy)."""
    from jsonld_streaming_parser_js_spark.operators import bgp as bgpmod

    # DISTINCT like the lane: BGP bag semantics over repeated facts
    # (author names recur per page) would multiply bindings
    # superlinearly — the serving store is the fact SET
    kg = (_amplify_instance_terms(base, amplify)
          .distinct().localCheckpoint())
    sw0 = _shuffle_write_bytes(spark)
    t0 = time.time()
    out = bgpmod.bgp_match(kg, [
        ("?a", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
         "<http://schema.org/Article>"),
        ("?a", "<http://schema.org/author>", "?p"),
        ("?p", "<http://schema.org/name>", "?n"),
    ])
    n_bind = out.count()
    wall = time.time() - t0
    sw1 = _shuffle_write_bytes(spark)
    kg.unpersist()
    return {"amplify": amplify,
            "n_quads_in": base.count() * amplify,
            "n_bindings": n_bind,
            "wall_sec": round(wall, 1),
            "shuffle_write_bytes": _delta(sw0, sw1)}


def cc_chain_leg(spark, n_chain: int) -> dict:
    """Two-phase CC at pathological diameter (BENCH.md "diameter
    100,000" table): ONE n_chain-node chain (diameter = n_chain) plus
    10k disjoint 10-node chains. hash-min needs ~n_chain rounds here;
    large-star/small-star must stay O(log n). Component structure is
    exact-checked (count + the long chain's tail maps to its min)."""
    from pyspark.sql import functions as F

    from jsonld_streaming_parser_js_spark.operators.canonicalize import (
        connected_components_two_phase)

    if n_chain < 2:
        raise ValueError("--ccchain needs >= 2 (the long chain must "
                         "contribute at least one edge)")

    def chain(n, offset):
        return (spark.range(n - 1).select(
            F.format_string("n%012d", F.col("id") + offset).alias("src"),
            F.format_string("n%012d",
                            F.col("id") + offset + 1).alias("dst")))
    small = (spark.range(10_000)
             .select(F.explode(F.sequence(F.lit(0), F.lit(8)))
                     .alias("i"),
                     (F.col("id") * 10 + 2 * n_chain).alias("b"))
             .select(F.format_string("n%012d",
                                     F.col("b") + F.col("i")).alias("src"),
                     F.format_string("n%012d", F.col("b") + F.col("i") + 1)
                     .alias("dst")))
    edges = chain(n_chain, 0).union(small).localCheckpoint()
    n_edges = edges.count()
    stats: dict = {}
    t0 = time.time()
    cc = connected_components_two_phase(edges, max_iter=60, stats=stats)
    n_comp = cc.select("component").distinct().count()
    wall = time.time() - t0
    tail = cc.where(F.col("node") == F.format_string(
        "n%012d", F.lit(n_chain - 1))).first()
    return {"n_chain": n_chain, "n_edges": n_edges,
            "rounds": stats.get("iterations"),
            "components": n_comp,
            "components_ok": n_comp == 10_001,
            "tail_maps_to_min": tail["component"] == "n%012d" % 0,
            "wall_sec": round(wall, 1)}


def hll_leg(spark, n_distinct: int, dup: int = 3) -> dict:
    """md5-HLL error realization at high cardinality (BENCH.md "5M
    distinct" table). md5 is ONE fixed hash, so each population yields
    a single error draw, not an ensemble average — a ~2-sigma row is
    expected once per ~20 populations."""
    import math

    from pyspark.sql import functions as F

    from jsonld_streaming_parser_js_spark.operators.sketch import (
        hll_distinct)
    df = (spark.range(n_distinct * dup)
          .select(F.concat(F.lit("key"),
                           (F.col("id") % n_distinct).cast("string"))
                  .alias("k")))
    rows = []
    for b in (8, 10, 12):
        t0 = time.time()
        r = hll_distinct(df, "k", b=b).first()
        rows.append({
            "b": b, "m": r["m"], "exact": r["n_exact"],
            "estimate": round(r["hll_estimate"], 1),
            # the operator's own rel_error column — one definition
            "rel_err_pct": round(100.0 * r["rel_error"], 2),
            "expected_rsd_pct": round(104.0 / math.sqrt(1 << b), 2),
            "wall_sec": round(time.time() - t0, 1)})
    return {"n_distinct": n_distinct, "dup": dup, "rows": rows}


def main() -> None:
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--fuzzy", default="",
                   help="comma-separated amplify values, e.g. 1,30,100")
    p.add_argument("--memo", type=int, default=0,
                   help="memo-leg amplify, e.g. 1000")
    p.add_argument("--decon", default="",
                   help="comma-separated eval_amplify values, e.g. 40,500")
    p.add_argument("--pagerank", default="",
                   help="comma-separated amplify values, e.g. 1,10,50")
    p.add_argument("--rdfs", default="",
                   help="comma-separated amplify values, e.g. 1,10,50")
    p.add_argument("--bgp", default="",
                   help="comma-separated amplify values, e.g. 1,10,50")
    p.add_argument("--ccchain", type=int, default=0,
                   help="two-phase CC chain length, e.g. 100000")
    p.add_argument("--hll", type=int, default=0,
                   help="HLL distinct-key count, e.g. 5000000")
    args = p.parse_args()

    from jsonld_streaming_parser_js_spark.sources.session import get_spark
    import bench

    spark = get_spark(app="scale-probe",
                      extra_conf={"spark.ui.retainedStages": "20000"})
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"sf": SF_DIR, "fuzzy": [], "memo": None, "decon": [],
                 "pagerank": [],
                 "load_avg_1m": round(os.getloadavg()[0], 2)}
    for amp in [int(a) for a in args.fuzzy.split(",") if a]:
        leg = fuzzy_leg(spark, amp)
        out["fuzzy"].append(leg)
        print(f"# fuzzy x{amp}: {leg}", file=sys.stderr)

    for amp in [int(a) for a in args.decon.split(",") if a]:
        leg = decon_leg(spark, amp)
        out["decon"].append(leg)
        print(f"# decon x{amp}: {leg}", file=sys.stderr)

    pr_amps = [int(a) for a in args.pagerank.split(",") if a]
    if pr_amps:
        pr_base = pagerank_base_edges(spark)
        for amp in pr_amps:
            leg = pagerank_leg(spark, amp, pr_base)
            out["pagerank"].append(leg)
            print(f"# pagerank x{amp}: {leg}", file=sys.stderr)
        pr_base.unpersist()

    rdfs_amps = [int(a) for a in args.rdfs.split(",") if a]
    bgp_amps = [int(a) for a in args.bgp.split(",") if a]
    if rdfs_amps or bgp_amps:
        import __spark_entry__ as entry
        kg_base = (entry._quads(spark, SF_DIR)
                   .select("subj", "pred", "obj", "graph")
                   .localCheckpoint())
        if rdfs_amps:
            out["rdfs"] = []
            for amp in rdfs_amps:
                leg = rdfs_leg(spark, amp, kg_base)
                out["rdfs"].append(leg)
                print(f"# rdfs x{amp}: {leg}", file=sys.stderr)
        if bgp_amps:
            out["bgp"] = []
            for amp in bgp_amps:
                leg = bgp_leg(spark, amp, kg_base)
                out["bgp"].append(leg)
                print(f"# bgp x{amp}: {leg}", file=sys.stderr)
        kg_base.unpersist()

    if args.ccchain:
        out["cc_chain"] = cc_chain_leg(spark, args.ccchain)
        print(f"# cc_chain: {out['cc_chain']}", file=sys.stderr)

    if args.hll:
        out["hll"] = hll_leg(spark, args.hll)
        print(f"# hll: {out['hll']}", file=sys.stderr)

    if args.memo:
        sw0 = _shuffle_write_bytes(spark)
        t0 = time.time()
        memo = bench.memo_leg(spark, amplify=args.memo)
        memo["wall_sec_total"] = round(time.time() - t0, 1)
        sw1 = _shuffle_write_bytes(spark)
        memo["shuffle_write_bytes"] = _delta(sw0, sw1)
        out["memo"] = memo
        print(f"# memo x{args.memo}: {memo}", file=sys.stderr)

    out["load_avg_1m_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
