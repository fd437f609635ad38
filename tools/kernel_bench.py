"""Single-core pure-Python kernel benchmark over the REAL bench corpus.

Extracts the JSON-LD blocks exactly as the pipeline does (one Spark pass at
sf0.001), then times `parse_block` alone in this process — the number
BENCH.md quotes as "pure-Python kernel alone". Usage:

    taskset -c 0 python tools/kernel_bench.py [repeat]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def calibrate() -> float:
    """Fixed pure-Python workload (dict/str/list mix approximating the
    kernel's op profile) timed on the current core. This VM's wall clock
    swings ±20% from CPU-frequency steal that load average cannot see;
    printing the calibration next to the quads/s makes windows
    comparable: normalized q/s = q/s × (CAL_REF / cal_now). CAL_REF is
    the value recorded in BENCH.md alongside the window of record."""
    t0 = time.perf_counter()
    acc = 0
    for _ in range(120):
        d = {}
        for i in range(4000):
            k = "term%d" % (i % 97)
            v = d.get(k)
            d[k] = (v[0] + 1, k) if v else (1, k)
            if i % 7 == 0:
                s = "http://example.org/%s/%d" % (k, i)
                acc += len(s.rsplit("/", 1)[1])
        acc += sum(c for c, _ in d.values())
    dt = time.perf_counter() - t0
    assert acc == 735360, acc  # fixed workload, fixed answer
    return 1.0 / dt


def main() -> None:
    repeat = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from pyspark.sql import SparkSession
    from jsonld_streaming_parser_js_spark.functions.parser import parse_block
    from jsonld_streaming_parser_js_spark.operators.extract import (
        extract_blocks)
    from jsonld_streaming_parser_js_spark.sources.pages import (
        CONTEXTS, pages_from_documents)

    spark = (SparkSession.builder.master("local[2]")
             .config("spark.sql.shuffle.partitions", "4")
             .appName("kernel-bench").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    rows = (extract_blocks(pages_from_documents(spark,
                                                "/root/testdata/sf0.001"))
            .collect())
    blocks = [(r["block"], r["url"], r["blk"]) for r in rows]
    spark.stop()

    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        n_quads = 0
        for _ in range(repeat):
            for block, url, blk in blocks:
                quads, _err = parse_block(block, url, blk, CONTEXTS)
                n_quads += len(quads)
        dt = time.perf_counter() - t0
        best = max(best, n_quads / dt)
    # deterministic work proxy: wall time on this VM swings +/-20% from
    # CPU-frequency steal invisible to load average; total function calls
    # do not (round-4 kernel work tracked 2.58M -> 1.80M on this metric)
    import cProfile
    import pstats
    pr = cProfile.Profile()
    pr.enable()
    for block, url, blk in blocks:
        parse_block(block, url, blk, CONTEXTS)
    pr.disable()
    calls = pstats.Stats(pr).total_calls
    cal = max(calibrate() for _ in range(3))
    print(f"{len(blocks)} blocks x{repeat}: "
          f"{best / 1000:.1f}k quads/s single-core; "
          f"{calls} calls/corpus-pass (deterministic); "
          f"cal {cal:.2f} passes/s (window speed ref)")


if __name__ == "__main__":
    main()
