"""Aggregations / joins over the quads table, written for hot-key scale.

The predicate column of a web-scale KG is pathologically skewed: rdf:type
and a handful of schema.org boilerplate predicates cover most rows
(north-star calls this out explicitly). Skew defenses, matched to where
skew actually bites:

1. **Algebraic counts (count/sum) are skew-immune already**: Spark's hash
   aggregate does map-side partial aggregation, so each task emits at most
   one partial row per predicate — the hot key never funnels raw rows to
   one reducer. Salting a plain count only adds work; these aggs stay
   un-salted on purpose.
2. **Holistic/high-state aggs** (count DISTINCT objects per predicate)
   are where the hot key hurts: the distinct-state for rdf:type is huge.
   ``distinct_objects_per_predicate`` two-phases it: shuffle on
   (pred, obj) first (uniform!), collapse to distincts, then count — the
   classic skew-safe distinct.
3. **Joins on skewed keys**: ``F.broadcast`` for small dims (join_labels)
   and AQE skew-join splitting (sources/session.py) for the rest; salting
   (pmod(xxhash64(subj), K) appended to join keys) is the fallback when
   neither applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F



def quads_by_predicate(quads: DataFrame) -> DataFrame:
    """Exact per-predicate counts. Map-side partial aggregation makes this
    skew-immune without salting (see module docstring, point 1)."""
    return (quads.groupBy("pred")
            .agg(F.count("*").alias("n_quads"))
            .orderBy(F.desc("n_quads"), F.asc("pred")))


def distinct_objects_per_predicate(quads: DataFrame) -> DataFrame:
    """Distinct-object counts per predicate, skew-safe two-phase: the
    (pred, obj) dedup shuffle is keyed on a uniform composite, so the hot
    predicate's distinct-state is spread across all partitions before the
    tiny per-pred count."""
    return (quads.select("pred", "obj").distinct()
            .groupBy("pred")
            .agg(F.count("*").alias("n_distinct_objects"))
            .orderBy(F.desc("n_distinct_objects"), F.asc("pred")))


def quads_by_predicate_and_type(quads: DataFrame) -> DataFrame:
    """Per-(predicate, rdf:type-object) counts: one algebraic groupBy
    that witnesses BOTH the per-predicate rollup (sum over rdf_type) and
    the instance-counts-per-type view (filter pred = rdf:type) — the r7
    merge of ``quads_by_predicate`` + ``type_counts``. Non-type
    predicates carry rdf_type = '' so their group is exactly the old
    per-predicate group. Map-side partials make it skew-immune (module
    docstring, point 1)."""
    rdf_type = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
    t = (F.when(F.col("pred") == rdf_type, F.col("obj"))
         .otherwise(F.lit("")))
    return (quads.groupBy("pred", t.alias("rdf_type"))
            .agg(F.count("*").alias("n_quads"))
            .orderBy(F.desc("n_quads"), F.asc("pred"), F.asc("rdf_type")))


def type_counts(quads: DataFrame) -> DataFrame:
    """Instance counts per rdf:type object (the classic hot-predicate
    filter + agg; the filter is pushed to the scan when quads land in
    parquet with predicate column stats)."""
    rdf_type = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
    return (quads.where(F.col("pred") == rdf_type)
            .groupBy(F.col("obj").alias("rdf_type"))
            .agg(F.count("*").alias("n_instances"))
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
    # full outer: a url whose EVERY block failed still gets a lineage row
    return (qsum.join(esum, "url", "full")
            .fillna(0, ["n_quads", "n_blocks", "bytes_checksum", "n_errors"])
            .orderBy("url"))
