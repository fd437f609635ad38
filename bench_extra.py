"""Per-lane measurement harness for the optimization round (guide §1).

NOT the frozen driver bench (bench.py is untouched): this script isolates
individual declared queries with the noop sink so before/after deltas can
be measured cheaply and repeatedly, and captures .explain("formatted")
plans to plans/r08/.

Usage:
  python bench_extra.py time  [query ...] [--reps N]   # noop-sink timings
  python bench_extra.py plan  [query ...] [--suffix before|after]
  python bench_extra.py headline [--amplify N]         # parse-throughput leg

Timing methodology mirrors the frozen bench.py query loop exactly
(construction + noop write timed together, same session settings) so the
numbers are comparable with BENCH_r07.json bands.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = ["kg_quads", "kg_quads_by_predicate", "kg_canonical_clusters",
            "kg_canonical_fuzzy", "dedup_exact", "dedup_neardup",
            "sim_topk", "text_quality", "tpch_q1", "events_hourly",
            "pipeline_clean_corpus", "kg_skew_salted_join", "kg_pagerank",
            "text_decontaminate", "approx_distinct_hll",
            "kg_rdfs_entailment", "kg_bgp_query"]


def _session():
    from jsonld_streaming_parser_js_spark.sources.session import get_spark
    spark = get_spark(app="bench-extra", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 << 20))
    spark.conf.set("spark.sql.files.openCostInBytes", str(4 << 20))
    return spark


def cmd_time(names: list[str], reps: int) -> None:
    import __spark_entry__ as entry
    spark = _session()
    qs = entry.queries()
    out: dict[str, dict] = {}
    for name in names:
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        out[name] = {"samples": samples, "min": min(samples),
                     "load_1m": round(os.getloadavg()[0], 2)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": {k: v["min"] for k, v in out.items()}}))


def cmd_plan(names: list[str], suffix: str) -> None:
    import __spark_entry__ as entry
    spark = _session()
    qs = entry.queries()
    os.makedirs("plans/r08", exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = f"plans/r08/{name}_{suffix}.txt"
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        ex = plan.count("Exchange") - plan.count("ReusedExchange")
        print(f"{path}: Exchange~{ex} SMJ={plan.count('SortMergeJoin')} "
              f"BHJ={plan.count('BroadcastHashJoin')} "
              f"ArrowEval={plan.count('ArrowEval')} "
              f"MapInPandas={plan.count('MapInPandas')}")


def cmd_headline(amplify: int) -> None:
    """Parse-throughput leg, identical shape to bench.parse_throughput."""
    from jsonld_streaming_parser_js_spark.operators.parse import (
        pages_to_quads)
    from jsonld_streaming_parser_js_spark.sources.pages import CONTEXTS
    import bench
    spark = _session()
    path = bench.materialize_pages(spark, amplify)
    total_bytes = sum(os.path.getsize(os.path.join(path, f))
                      for f in os.listdir(path) if f.endswith(".parquet"))
    split = max(total_bytes // (CPUS * 8), 1 << 20)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    pages = spark.read.parquet(path)
    quads = pages_to_quads(pages, CONTEXTS)
    walls = []
    for i in range(5):
        t0 = time.time()
        n = quads.count()
        walls.append(round(time.time() - t0, 3))
        print(f"run {i}: wall={walls[-1]} n={n} "
              f"qps={n / walls[-1]:,.0f} load={os.getloadavg()[0]:.1f}",
              flush=True)
    print(json.dumps({"best_wall": min(walls), "n_quads": n,
                      "best_qps": round(n / min(walls), 1)}))


def main() -> None:
    args = sys.argv[1:]
    cmd = args[0] if args else "time"
    rest = args[1:]
    reps = 3
    suffix = "before"
    amplify = 200
    names: list[str] = []
    it = iter(rest)
    for a in it:
        if a == "--reps":
            reps = int(next(it))
        elif a == "--suffix":
            suffix = next(it)
        elif a == "--amplify":
            amplify = int(next(it))
        else:
            names.append(a)
    if not names:
        names = list(HEADLINE)
    if cmd == "time":
        cmd_time(names, reps)
    elif cmd == "plan":
        cmd_plan(names, suffix)
    elif cmd == "headline":
        cmd_headline(amplify)
    else:
        raise SystemExit(f"unknown command {cmd}")


if __name__ == "__main__":
    main()
