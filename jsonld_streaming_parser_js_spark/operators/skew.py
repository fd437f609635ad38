"""Skew handling for hot-key joins (north-star: "salted repartitioning
plus AQE skew-join splitting" for hot predicates).

Web-scale KG fact tables are Zipf-skewed on ``pred``/``obj`` (rdf:type
alone is routinely ~half the quads). A plain shuffle join on such a key
puts the hot key's entire row set in ONE reducer partition — the straggler
that dominates the stage. Two mitigations, both here:

- **AQE skew-join splitting** (the default path): leave the join as a
  plain equi-join; AQE measures the real post-shuffle partition sizes at
  runtime and splits any partition above
  ``spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes`` into
  multiple reader-tasks, duplicating the matching partition of the other
  side. Zero code — but only fires for sort-merge joins, and only on the
  sizes AQE can see. ``aqe_skew_demo`` builds a corpus + config set that
  demonstrably triggers it (``SortMergeJoin(skew=true)`` in the final
  plan); tests/EXPLAIN.md machine-check the marker.
- **Explicit salting** (``salted_join``): when the skewed side must join a
  table too big to broadcast and AQE's byte heuristics can't help (e.g.
  the hot partition also skews the SORT, or the engine version lacks
  skew-AQE), split the hot key deterministically: the fact side gets a
  salt in ``[0, n_salts)`` hashed from the whole row, the dim side is
  exploded ``n_salts``-fold, and the join runs on ``(key, salt)`` — the
  hot key's rows now land in ``n_salts`` reducer partitions. Inner-join
  semantics are unchanged (every fact row still meets every matching dim
  row exactly once); the dim explosion costs ``n_salts x |dim|`` rows,
  the standard trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(fact: DataFrame, dim: DataFrame, on: str | list[str],
                n_salts: int = 16) -> DataFrame:
    """Inner equi-join with the fact side salt-split ``n_salts`` ways.

    The salt is ``pmod(xxhash64(all fact columns), n_salts)`` —
    deterministic per row (idempotent retries, unlike a random salt or
    ``monotonically_increasing_id``), and uniform over the hot key's rows
    as long as they differ in any column. The dim side is exploded with
    ``sequence`` (one JVM-side generator row per salt), so no Python and
    no driver loop. Output columns = fact columns + dim's non-key columns,
    exactly like ``fact.join(dim, on)``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if SALT_COL in fact.columns or SALT_COL in dim.columns:
        raise ValueError(
            f"salted_join reserves column name {SALT_COL!r}; rename it "
            "on the input first (it would be silently clobbered)")
    # xxhash64 rejects MapType anywhere in the column type (including
    # nested array<map<...>>/struct fields); hash every hashable column
    # (row-level determinism needs only enough columns to distinguish
    # rows — residual collisions just co-locate rows, never corrupt).
    # At least one NON-KEY column must be hashable: salting on the join
    # key alone yields one salt per key value, i.e. the hot key still
    # lands in a single reducer while paying the dim explosion.
    hashable = [c for c, t in fact.dtypes if "map<" not in t]
    if not [c for c in hashable if c not in keys]:
        raise ValueError(
            "salted_join: fact needs at least one non-key column without "
            "MapType to derive a row-level salt (a key-only salt is "
            "constant per key and defeats the split)")
    fact_salted = fact.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*hashable), F.lit(n_salts)))
    dim_salted = dim.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0).cast("long"),
                             F.lit(n_salts - 1).cast("long"))))
    return (fact_salted.join(dim_salted, keys + [SALT_COL])
            .drop(SALT_COL))


# Single source of truth for the skew-corpus shape: the DuckDB oracle in
# __spark_entry__ f-strings these SAME constants, so changing them can
# never desynchronize the lane from its oracle.
ROWS_PER_DOC = 40
SPREAD = 97


def skewed_pred_corpus(docs: DataFrame, rows_per_doc: int = ROWS_PER_DOC,
                       spread: int = SPREAD) -> DataFrame:
    """Deterministic hot-predicate fact table derived from ``documents``:
    each doc explodes into ``rows_per_doc`` rows; half of all rows carry
    the single hot predicate (schema.org/name — the rdf:type/label-style
    head of the real Zipf curve), the rest spread over ``spread`` cold
    predicates. Pure SQL string expressions, so the DuckDB oracle rebuilds
    the identical corpus with generate_series."""
    rows = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(rows_per_doc - 1))).alias("i"))
    hot = (F.col("doc_id") + F.col("i")) % 2 == 0
    cold = F.concat(
        F.lit("<http://ex.org/p"),
        F.pmod(F.col("doc_id") * rows_per_doc + F.col("i"),
               F.lit(spread)).cast("string"),
        F.lit(">"))
    return rows.select(
        "doc_id", "i",
        F.when(hot, F.lit("<http://schema.org/name>"))
        .otherwise(cold).alias("pred"))


def pred_dim(fact: DataFrame) -> DataFrame:
    """Tiny predicate-metadata dimension (one row per distinct pred) —
    the side a salted join explodes."""
    return (fact.select("pred").distinct()
            .select("pred",
                    F.substring(F.md5("pred"), 1, 8).alias("pred_tag")))


def aqe_skew_demo(spark: SparkSession, n_rows: int = 400_000,
                  n_keys: int = 997):
    """Synthetic hot-key join sized to trigger AQE skew-join splitting on
    a local session: ~50% of ``n_rows`` share key 0, broadcast is disabled
    and the skew thresholds lowered so the optimizer must split the hot
    post-shuffle partition. Returns (joined_df, configs) — the caller sets
    the configs, executes the df, and checks the final adaptive plan for
    ``SortMergeJoin(skew=true)``. Plan-shape evidence only; value
    correctness of skewed joins is covered by the oracle-checked
    kg_skew_salted_join lane."""
    fact = (spark.range(n_rows)
            .select(F.when(F.pmod("id", F.lit(2)) == 0, F.lit(0))
                    .otherwise(F.pmod("id", F.lit(n_keys))).alias("k"),
                    F.col("id").alias("v"),
                    F.md5(F.col("id").cast("string")).alias("pad")))
    dim = (spark.range(n_keys)
           .select(F.col("id").alias("k"),
                   F.md5(F.col("id").cast("string")).alias("attr")))
    joined = (fact.join(dim, "k")
              .groupBy().agg(F.count("*").alias("n"),
                             F.sum("v").alias("sum_v")))
    configs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    return joined, configs


def bloom_join_demo(spark: SparkSession, work_dir: str,
                    n_fact: int = 200_000, n_keys: int = 50_000):
    """Runtime Bloom-filter join pruning: a SELECTIVE dim predicate
    (tag == 3, ~1/7 of keys survive) makes Catalyst inject a
    ``bloom_filter_agg`` over the filtered dim keys and a
    ``might_contain`` filter on the FACT SCAN — ~6/7 of fact rows are
    dropped before the shuffle ever materializes them. At 100 TB this is
    the lever for fact-to-filtered-dim joins too large to broadcast:
    the shuffle shrinks by the dim predicate's selectivity at the cost
    of one tiny bloom build. Deterministic derivation from ``range`` so
    the expected join result is closed-form (tests value-check it and
    compare against the bloom-disabled twin).

    Returns (joined_df, configs); the caller sets the configs (broadcast
    off so a shuffle join is planned; creation/application thresholds
    opened so the local-scale tables qualify), executes, and checks the
    final plan for ``might_contain``. Tables are written to
    ``work_dir`` parquet first: the application side must be a file
    scan for the sizing check.
    """
    (spark.range(n_fact)
     .select(F.pmod("id", F.lit(n_keys)).alias("k"),
             F.col("id").alias("v"))
     .write.mode("overwrite").parquet(f"{work_dir}/fact"))
    (spark.range(n_keys)
     .select(F.col("id").alias("k"), F.pmod("id", F.lit(7)).alias("tag"))
     .write.mode("overwrite").parquet(f"{work_dir}/dim"))
    fact = spark.read.parquet(f"{work_dir}/fact")
    dim = spark.read.parquet(f"{work_dir}/dim").where(F.col("tag") == 3)
    joined = (fact.join(dim, "k")
              .groupBy().agg(F.count("*").alias("n_rows"),
                             F.sum("v").alias("sum_v")))
    configs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
    }
    return joined, configs
