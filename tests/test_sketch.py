"""Deterministic md5-HyperLogLog (operators/sketch.py): accuracy within
theoretical bounds, partitioning invariance (mergeability), parameter
validation, and Spark/DuckDB twin equality on the same keys."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from jsonld_streaming_parser_js_spark.operators.sketch import (
    hll_distinct, hll_distinct_sql)


@pytest.mark.parametrize("n", [50, 500, 5000])
def test_hll_within_error_bound(spark, n):
    df = spark.range(n).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"))
    row = hll_distinct(df, "k", b=8).first()
    assert row["n_exact"] == n
    # 3 standard errors of the 1.04/sqrt(m) bound (plus linear-counting
    # regime at small n, which is tighter)
    assert row["rel_error"] <= 3 * 1.04 / (256 ** 0.5), row


def test_hll_partitioning_invariant(spark):
    """Registers are max-mergeable: the estimate must not depend on how
    the input is partitioned (the property that makes the sketch usable
    across 100 TB partial aggregations)."""
    df = spark.range(2000).select(
        F.concat(F.lit("p"), F.col("id")).alias("k"))
    a = hll_distinct(df.repartition(1), "k").first()
    b = hll_distinct(df.repartition(37, "k"), "k").first()
    assert a["hll_estimate"] == b["hll_estimate"]


def test_hll_duplicates_do_not_inflate(spark):
    base = spark.range(300).select(
        F.concat(F.lit("d"), F.col("id")).alias("k"))
    dup = base.union(base).union(base)
    assert (hll_distinct(dup, "k").first()["hll_estimate"]
            == hll_distinct(base, "k").first()["hll_estimate"])


def test_hll_rejects_bad_register_exponent(spark):
    df = spark.range(5).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError, match="register-count exponent"):
        hll_distinct(df, "k", b=2)


def test_hll_twin_equality_spark_vs_duckdb(spark):
    keys = [f"entity-{i}" for i in range(777)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = hll_distinct(df, "k", b=8).first()
    vals = ", ".join(f"('{k}')" for k in keys)
    want = duckdb.sql(hll_distinct_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(k)", "k", b=8)).fetchone()
    assert (got["n_exact"], got["hll_estimate"], got["m"],
            got["rel_error"]) == want
