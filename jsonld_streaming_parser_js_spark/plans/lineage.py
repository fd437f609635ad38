"""Per-partition lineage + checkpoint-resume (north_rule requirement).

Unit of recovery: a **url bucket** — ``bucket = pmod(xxhash64(url), B)``.
Deterministic (same url -> same bucket on any run/cluster), uniform (hash),
and independent of physical partitioning, so a resume after a mid-job
failure never re-emits quads for completed buckets and never misses a url.

Layout under ``out_dir``:
- ``quads/``    parquet partitioned by ``bucket`` (dynamic partition
                overwrite: re-running a bucket replaces exactly that bucket)
- ``lineage/``  one row per completed bucket: counts + an order-insensitive
                checksum (sum of xxhash64 over the quad tuple), written
                only AFTER the bucket's quads land — the commit record.

At 10^12 documents: B is sized so a bucket is a few GB (e.g. B = 2^17);
lineage stays tiny (B rows), and a resume is an anti-join of the pages scan
against B completed bucket ids — a broadcast anti-join, no shuffle of the
pages table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bucket_expr(col: str, buckets: int):
    """THE bucketing formula — every writer and reader must route
    through this one definition (a reader re-spelling it that later
    drifts silently returns empty lookups)."""
    return F.pmod(F.xxhash64(col), F.lit(buckets))


def with_bucket(df: DataFrame, buckets: int, col: str = "url") -> DataFrame:
    return df.withColumn("bucket", bucket_expr(col, buckets))


def bucket_lineage(parsed: DataFrame,
                   snapshot_id: str = "") -> DataFrame:
    """parsed rows (quads + error rows, with bucket col) -> lineage rows.

    ``snapshot_id`` identifies the input table version (an Iceberg snapshot
    id in production; any caller-provided tag here) so a resume can refuse
    to mix buckets produced from different input snapshots."""
    quad = F.col("error").isNull()
    return (parsed.groupBy("bucket").agg(
        F.lit(snapshot_id).alias("snapshot_id"),
        F.countDistinct("url").alias("n_urls"),
        F.countDistinct("url", "blk").alias("n_blocks"),
        F.sum(quad.cast("long")).alias("n_quads"),
        F.sum((~quad).cast("long")).alias("n_errors"),
        # xor-fold of per-quad hashes: order-insensitive and overflow-free
        # (a sum of xxhash64 longs overflows under ANSI mode)
        F.expr("bit_xor(CASE WHEN error IS NULL THEN "
               "xxhash64(subj, pred, obj, graph) ELSE 0 END)")
        .alias("checksum"),
    ))


def _read_lineage(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """Lineage table, or None ONLY when it does not exist yet (first run).

    Any other failure (corrupt files, schema drift such as a lineage dir
    written without a snapshot_id column) must raise: treating it as
    'first run' would silently disable the resume/snapshot guards."""
    try:
        return spark.read.parquet(f"{out_dir}/lineage")
    except Exception as exc:  # noqa: BLE001 — classify, re-raise the rest
        msg = str(exc)
        if ("PATH_NOT_FOUND" in msg or "Path does not exist" in msg
                or "UNABLE_TO_INFER_SCHEMA" in msg):
            return None
        raise


def completed_buckets(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """Buckets whose lineage row exists (i.e. committed)."""
    lineage = _read_lineage(spark, out_dir)
    if lineage is None:
        return None
    return lineage.select("bucket").distinct()


def parquet_quad_sink(sorted_quads: DataFrame, out_dir: str) -> None:
    """Default sink: parquet + dynamic partition overwrite (idempotent
    per-bucket re-runs). Stands in for Iceberg in this container — the
    spark-iceberg runtime jar is absent and cannot be vendored offline
    (PERMANENT constraint, documented in README/PARITY.md).

    Codec: zstd (default level 3) — measured 7.5x vs uncompressed on the
    (pred, subj)-clustered quads layout where snappy gets 4.6x, with
    equal-or-faster scans (tools/compression_sweep.py; BENCH.md). At
    100 TB that codec choice is ~40% of the stored bytes."""
    spark = sorted_quads.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (sorted_quads.write.mode("overwrite")
     .option("compression", "zstd")
     .partitionBy("bucket")
     .parquet(f"{out_dir}/quads"))


def iceberg_quad_sink(table: str):
    """Config-only Iceberg swap: ``overwritePartitions`` on a table
    ``PARTITIONED BY (bucket)`` has exactly the parquet sink's idempotent
    dynamic-overwrite semantics (same commit contract, plus real snapshot
    ids for ``snapshot_id``). Requires the iceberg-spark-runtime jar +
    catalog conf; unusable in this container, so the abstraction test
    drives ``write_bucketed`` through a recording sink instead."""
    def sink(sorted_quads: DataFrame, out_dir: str) -> None:
        sorted_quads.writeTo(table).overwritePartitions()
    return sink


def write_bucketed_table(df: DataFrame, table: str, buckets: int = 64,
                         key: str = "subj") -> None:
    """Hash-BUCKETED table sink (``bucketBy`` + ``sortBy`` on ``key``,
    ``saveAsTable``): the co-located-join storage layout. Any two tables
    bucketed on the same key with the same bucket count join with ZERO
    shuffle — the SortMergeJoin reads bucket i of each side directly
    (plan shows ``Bucketed: true`` scans and no Exchange). At 100 TB
    this is the difference between re-shuffling the quad corpus for
    every entity-centric join (canonical relabel, graph assembly,
    repeated analytics on subj) and paying the shuffle ONCE at write
    time. Evidence: tests/test_spark_pipeline.py::
    test_bucketed_tables_join_without_shuffle + EXPLAIN.md invariant.

    Distinct from ``write_bucketed`` below, which partitions by a
    derived url-bucket COLUMN for lineage/resume granularity — this one
    uses Spark's table-bucketing metadata, which is what join planning
    consumes."""
    (df.write.mode("overwrite")
     .bucketBy(buckets, key).sortBy(key)
     .saveAsTable(table))


def write_bucketed(parsed_with_bucket: DataFrame, out_dir: str,
                   snapshot_id: str = "", quad_sink=None) -> None:
    """Write quads (+error rows) partitioned by bucket, then commit lineage.

    Ordering is the crash-safety contract: quads land first (dynamic
    partition overwrite -> idempotent per bucket), lineage appends last.
    A crash between the two re-runs those buckets; dynamic overwrite makes
    the re-run idempotent.

    ``quad_sink(sorted_df, out_dir)`` is the ONLY format-specific step:
    parquet_quad_sink by default, iceberg_quad_sink(table) on a cluster
    with the Iceberg runtime — lineage, resume, and waves are
    sink-agnostic; verify_lineage takes ``quads=`` for non-parquet sinks.
    """
    cached = parsed_with_bucket.persist()
    try:
        # sortWithinPartitions (no shuffle): quads cluster by (pred, subj)
        # inside each file, so parquet dictionary/RLE encoding collapses the
        # boilerplate-heavy pred column — a large compression win at corpus
        # scale — and pred-filtered scans skip row groups via column stats
        # NB: "bucket" must lead the sort — the dynamic-partition writer
        # needs Sort(bucket) and the optimizer ELIMINATES any other
        # sortWithinPartitions beneath it (verified on PySpark 4.1.2)
        sorted_quads = cached.sortWithinPartitions("bucket", "pred", "subj")
        (quad_sink or parquet_quad_sink)(sorted_quads, out_dir)
        (bucket_lineage(cached, snapshot_id).write.mode("append")
         .parquet(f"{out_dir}/lineage"))
    finally:
        cached.unpersist()


def upsert_quads(base: DataFrame, wave: DataFrame,
                 key: str = "url",
                 wave_keys: DataFrame | None = None) -> DataFrame:
    """Declarative MERGE at document granularity: a re-crawl wave
    REPLACES every quad of the urls it contains (delete-then-insert —
    the semantics of `MERGE ... WHEN MATCHED DELETE+INSERT` keyed by
    url). left_anti + union keeps the whole expression oracle-checkable;
    the physical twin below rewrites only affected bucket partitions.

    ``wave_keys``: the CRAWLED url set (one ``key`` column). Pass it
    whenever the wave may contain pages that now yield ZERO quads (no
    JSON-LD blocks anymore, parse failure): deriving urls from the wave
    QUADS would silently keep such a page's stale quads in the store.
    Defaults to the wave quads' urls — sound only when every re-crawled
    page still emits quads."""
    keys = (wave_keys.select(key) if wave_keys is not None
            else wave.select(key)).distinct()
    return base.join(keys, key, "left_anti").unionByName(wave)


def wave_diff(base: DataFrame, wave: DataFrame,
              key: str = "url",
              wave_keys: DataFrame | None = None) -> DataFrame:
    """Crawl-to-crawl KG diff at document granularity: for the urls the
    wave re-crawled, which quads appeared and which disappeared?
    Returns quad rows tagged ``change`` in {'added', 'removed'} — the
    change feed a downstream incremental consumer (index refresh, cache
    invalidation, embedding re-compute) subscribes to instead of
    re-reading the store.

    ``wave_keys`` (the CRAWLED url set): pass it whenever a re-crawled
    page may now yield zero quads — such a page's old quads must emit
    as 'removed', but its url never appears in the wave QUADS, so the
    default (urls derived from wave) would silently drop the deletion
    from the feed and a subscriber would serve stale content forever.

    Scale design: base is first semi-joined to the wave's url set and
    the cut is localCheckpoint'd (both EXCEPT legs read it — without
    materialization the store scan would run twice per diff, per
    micro-batch in the continuous-feed pattern), so the multiset
    EXCEPTs cost O(wave), not O(store) — the same O(wave) principle as
    the physical upsert. Deterministic skolemization is what makes the
    diff MEANINGFUL: a re-crawled page's unchanged blocks reproduce
    byte-identical quads (blank-node labels included), so only real
    content changes surface."""
    # the cut is materialized ONCE (both EXCEPT legs read it); the
    # uncheckpointed expression is exposed as _wave_url_cut so the
    # EXPLAIN audit can assert the semi-join shape of the shipped query
    base_w = _wave_url_cut(base, wave, key, wave_keys).localCheckpoint()
    added = (wave.exceptAll(base_w)
             .withColumn("change", F.lit("added")))
    removed = (base_w.exceptAll(wave)
               .withColumn("change", F.lit("removed")))
    return added.unionByName(removed)


def _wave_url_cut(base: DataFrame, wave: DataFrame, key: str = "url",
                  wave_keys: DataFrame | None = None) -> DataFrame:
    """base restricted to the wave's (crawled or quad-derived) url set —
    the O(wave) cut wave_diff materializes; normalized to wave's column
    order so the multiset EXCEPTs operate on identical relations."""
    keys = (wave_keys.select(key) if wave_keys is not None
            else wave.select(key)).distinct()
    return base.join(keys, key, "left_semi").select(*wave.columns)


def upsert_wave(spark: SparkSession, out_dir: str,
                wave_parsed: DataFrame, buckets: int,
                snapshot_id: str = "", quad_sink=None,
                wave_keys: DataFrame | None = None) -> None:
    """Physical MERGE into the bucketed quad store: only the url-buckets
    the wave touches are recomputed and dynamically overwritten —
    untouched bucket partitions are NOT rewritten (asserted by file
    mtimes in tests). At 100 TB a crawl wave touches a small fraction of
    buckets, so the rewrite cost is O(wave), not O(store). New bucket
    content = (stored bucket minus wave urls) + wave rows; the affected
    buckets' lineage rows are REPLACED (compacted), not appended — this
    is the one writer that re-commits a committed bucket, and duplicate
    per-bucket rows would break verify_lineage and double-count resume
    stats.

    ``wave_keys``: the CRAWLED url set (one ``url`` column). Required
    for deletion-correctness when a re-crawled page can yield ZERO
    parsed rows (no JSON-LD blocks anymore — extract emits nothing for
    such a page, so its url is absent from ``wave_parsed`` and the
    default url derivation would leave its stale quads in the store)."""
    check_snapshot(spark, out_dir, snapshot_id)
    wave_b = with_bucket(wave_parsed, buckets).persist()
    try:
        keys = (wave_keys.select("url") if wave_keys is not None
                else wave_b.select("url")).distinct()
        affected = with_bucket(keys, buckets).select("bucket").distinct()
        cols = ["url", "blk", "subj", "pred", "obj", "graph", "error",
                "bucket"]
        stored = (spark.read.parquet(f"{out_dir}/quads")
                  .withColumn("bucket", F.col("bucket").cast("long"))
                  .select(*cols))
        keep = (stored
                .join(F.broadcast(affected), "bucket", "left_semi")
                .join(keys, "url", "left_anti"))
        # localCheckpoint (eager), NOT persist: the sink below OVERWRITES
        # the very parquet path `keep` reads from, so the plan must be
        # cut to a materialized RDD first — a mere cache can be evicted /
        # lost and the recompute would scan deleted files (and Spark's
        # self-overwrite detection would otherwise refuse the write).
        merged = keep.unionByName(wave_b.select(*cols)).localCheckpoint()
        # lineage compaction: old rows for unaffected buckets + fresh
        # rows for the wave's buckets. Tiny (<= total buckets rows);
        # checkpointed before the overwrite of its own source dir. A
        # crash between the two writes leaves quads newer than lineage —
        # the same idempotent-bucket re-run contract as write_bucketed.
        old_lineage = (spark.read.parquet(f"{out_dir}/lineage")
                       .join(F.broadcast(affected), "bucket", "left_anti"))
        compacted = (old_lineage
                     .unionByName(bucket_lineage(merged, snapshot_id))
                     .localCheckpoint())
        sorted_quads = merged.sortWithinPartitions("bucket", "pred",
                                                   "subj")
        (quad_sink or parquet_quad_sink)(sorted_quads, out_dir)
        compacted.write.mode("overwrite").parquet(f"{out_dir}/lineage")
    finally:
        wave_b.unpersist()


def read_url_quads(spark: SparkSession, out_dir: str, url: str,
                   buckets: int) -> DataFrame:
    """Point lookup: one url's quads WITHOUT scanning the store, with
    the store's canonical quad semantics (error rows filtered, quad
    columns, deduplicated — matching plans/pipeline.quads_table). The
    url's bucket is computed through the writer's OWN ``with_bucket``
    (one 1-row JVM job — a drift between reader and writer hashing
    would silently return empty lookups), then the read filters on the
    bucket PARTITION column + the url, so the scan touches exactly one
    ``bucket=k`` directory (partition pruning, plan-asserted) and
    parquet pushes the url predicate into it. At 100 TB with B buckets
    this reads ~1/B of the store's files — the access path a serving
    layer uses for per-document retrieval.

    ``buckets`` must be the writer's bucket count: it is validated
    against the store's lineage row count (one row per NON-EMPTY
    bucket — with url-hash bucketing every bucket is occupied beyond
    trivial store sizes, so a sparse toy store trips this guard
    loudly rather than a wrong modulus returning an empty result
    indistinguishable from "url absent")."""
    buckets_written = spark.read.parquet(f"{out_dir}/lineage").count()
    if buckets != buckets_written:
        raise ValueError(
            f"buckets={buckets} but the store's lineage records "
            f"{buckets_written} buckets — a mismatched modulus would "
            "silently return empty lookups")
    k = with_bucket(spark.createDataFrame([(url,)], "url string"),
                    buckets).first()["bucket"]
    from ..operators.parse import quads_only
    return (quads_only(
                spark.read.parquet(f"{out_dir}/quads")
                .where((F.col("bucket") == int(k))
                       & (F.col("url") == url)))
            .dropDuplicates(["url", "blk", "subj", "pred", "obj",
                             "graph"]))


def _store_fingerprint(spark: SparkSession, out_dir: str) -> str:
    """Cheap content identity of the committed store, derived from the
    lineage table (rows are REPLACED on upsert, so any mutation moves
    this): row count, xor of per-bucket checksums, total quads."""
    r = (spark.read.parquet(f"{out_dir}/lineage")
         .agg(F.count("*").alias("n"),
              F.expr("bit_xor(checksum)").alias("x"),
              F.sum("n_quads").alias("q")).first())
    return f"{r['n']}:{r['x']}:{r['q']}"


def write_subject_index(spark: SparkSession, out_dir: str,
                        buckets: int,
                        index_buckets: int | None = None) -> None:
    """Secondary index for ENTITY dereference: the quad store is
    bucketed by url (crawl-write locality), so "all quads about
    subject S" would otherwise scan every bucket. The index is a tiny
    (subj, url, bucket) table — distinct subject/document pairs —
    partitioned by ``sbucket`` (the shared :func:`bucket_expr` over
    subj), built with ONE pass over the store. Lookup is then two
    pruned point reads (index bucket -> url buckets), each O(1/B) of
    its table. Index size is O(distinct subject-document pairs):
    orders of magnitude under the quad count (subjects repeat per
    predicate).

    A meta row (index modulus + store fingerprint) is written beside
    the index; the reader derives its modulus from it and REFUSES a
    stale index (store mutated since the build) — both failure modes
    would otherwise be silent empty/incomplete dereferences."""
    idx_b = index_buckets or buckets
    quads = (spark.read.parquet(f"{out_dir}/quads")
             .where(F.col("error").isNull())
             .select("subj", "url", F.col("bucket").cast("long")
                     .alias("bucket")).distinct())
    idx = quads.withColumn("sbucket", bucket_expr("subj", idx_b))
    (idx.repartition("sbucket")
        .sortWithinPartitions("sbucket", "subj")
        .write.mode("overwrite").partitionBy("sbucket")
        .parquet(f"{out_dir}/subj_index"))
    (spark.createDataFrame(
        [(idx_b, _store_fingerprint(spark, out_dir))],
        "index_buckets long, store_fingerprint string")
     .write.mode("overwrite").parquet(f"{out_dir}/subj_index_meta"))


def read_subject_quads(spark: SparkSession, out_dir: str, subj: str,
                       max_fanout: int = 10_000) -> DataFrame:
    """Entity dereference via the subject index: prune ONE sbucket
    directory for the subject's (url, bucket) pairs (a driver collect
    bounded by ``max_fanout``), then read exactly those url-buckets
    with the subject predicate pushed down. Canonical quad semantics
    (error-filtered, deduplicated). Never scans the store; both reads
    are partition-pruned.

    The index modulus comes from the index's own meta row (never a
    caller guess — a wrong modulus would prune the wrong directory and
    return empty), and the meta's store fingerprint must match the
    current lineage: a store mutated after the index build (upsert
    wave, resume) raises STALE instead of silently omitting the new
    documents' quads.

    ``max_fanout`` guards the point-lookup shape: a hub entity
    referenced from more documents than this is not a point lookup any
    more (the IN-lists and pruning benefit both degrade), so the
    function raises with guidance instead of silently materializing a
    huge url list on the driver — dereference such subjects with a
    distributed join against the index (index.where(subj) ⋈ store)."""
    from ..operators.parse import quads_only

    meta = spark.read.parquet(f"{out_dir}/subj_index_meta").first()
    fp = _store_fingerprint(spark, out_dir)
    if meta["store_fingerprint"] != fp:
        raise ValueError(
            "subject index is STALE (store fingerprint "
            f"{fp} != indexed {meta['store_fingerprint']}) — rebuild "
            "with write_subject_index after mutating the store")
    idx_b = int(meta["index_buckets"])
    sb = with_bucket(spark.createDataFrame([(subj,)], "subj string"),
                     idx_b, col="subj").first()["bucket"]
    pruned = (spark.read.parquet(f"{out_dir}/subj_index")
              .where((F.col("sbucket") == int(sb))
                     & (F.col("subj") == subj))
              .select("url", "bucket"))
    hits = pruned.limit(max_fanout + 1).collect()
    if len(hits) > max_fanout:
        raise ValueError(
            f"subject {subj!r} appears in > {max_fanout} documents — "
            "a hub entity is not a point lookup; join the store "
            "against the pruned index instead")
    if not hits:
        return quads_only(
            spark.read.parquet(f"{out_dir}/quads").limit(0))
    bucket_set = sorted({int(r["bucket"]) for r in hits})
    url_set = sorted({r["url"] for r in hits})
    return (quads_only(
                spark.read.parquet(f"{out_dir}/quads")
                .where(F.col("bucket").isin(bucket_set)
                       & F.col("url").isin(url_set)
                       & (F.col("subj") == subj)))
            .dropDuplicates(["url", "blk", "subj", "pred", "obj",
                             "graph"]))


def check_snapshot(spark: SparkSession, out_dir: str,
                   snapshot_id: str) -> None:
    """Refuse to write alongside lineage from a different input snapshot.

    Mixing buckets produced from two table versions is silent corruption;
    every writer entry point (resume AND waves) must call this before its
    first commit."""
    if not snapshot_id:
        return
    lineage = _read_lineage(spark, out_dir)
    if lineage is None:
        return
    prior = lineage.select("snapshot_id").distinct().collect()
    prior_ids = {r["snapshot_id"] for r in prior} - {""}
    if prior_ids and prior_ids != {snapshot_id}:
        raise ValueError(
            f"resume refused: lineage records snapshot(s) "
            f"{sorted(prior_ids)} but this run is {snapshot_id!r}")


def run_with_resume(spark: SparkSession, pages: DataFrame, out_dir: str,
                    ctx_cache: dict, buckets: int = 64,
                    rdf_direction: str | None = None,
                    snapshot_id: str = "", quad_sink=None,
                    memo: bool | str = False) -> dict:
    """Process only urls in not-yet-committed buckets; returns stats.

    ``pages -> filter(uncommitted bucket) -> extract+parse -> write``.
    The filter is a broadcast anti-join on the bucket id (<= B rows), so
    resume adds zero shuffles to the happy path.

    ``memo=True`` parses via the distinct-block memo (operators/memo.py)
    — same output protocol including the error channel, one kernel call
    per distinct block; worth it when the crawl repeats site-template
    blocks (measured break-even ~50x duplication). ``memo='auto'``
    (r7) decides from the data: one cheap approx-distinct agg over the
    extracted blocks measures the duplication ratio and memoizes iff it
    clears the measured break-even — both regimes produce identical
    output (pytest: test_build_kg_memo_auto_*)."""
    from ..operators.parse import extract_and_parse

    pages_b = with_bucket(pages, buckets)
    check_snapshot(spark, out_dir, snapshot_id)
    done = completed_buckets(spark, out_dir)
    n_done = 0
    if done is not None:
        n_done = done.count()
        pages_b = pages_b.join(F.broadcast(done), "bucket", "left_anti")

    memo_ratio = None
    blocks = None
    if memo == "auto":
        from ..operators.extract import extract_blocks
        from ..operators.memo import should_memoize
        # extract ONCE: the pre-pass agg and the chosen parse path share
        # one materialized block table (localCheckpoint) instead of
        # running the extraction regex over the crawl twice
        blocks = extract_blocks(pages_b).localCheckpoint()
        memo, memo_ratio = should_memoize(blocks)
    if memo:
        from ..operators.extract import extract_blocks
        from ..operators.memo import parse_blocks_memo
        if blocks is None:
            blocks = extract_blocks(pages_b)
        parsed = parse_blocks_memo(blocks, ctx_cache, rdf_direction)
    elif blocks is not None:
        # auto decided against the memo: parse the already-materialized
        # blocks (same output protocol as the fused extract_and_parse)
        from ..operators.parse import parse_blocks
        parsed = parse_blocks(blocks, ctx_cache, rdf_direction)
    else:
        parsed = extract_and_parse(pages_b, ctx_cache, rdf_direction)
    parsed_b = with_bucket(parsed, buckets)
    write_bucketed(parsed_b, out_dir, snapshot_id, quad_sink=quad_sink)

    lineage = spark.read.parquet(f"{out_dir}/lineage")
    agg = lineage.agg(F.countDistinct("bucket").alias("b"),
                      F.sum("n_quads").alias("q"),
                      F.sum("n_errors").alias("e")).collect()[0]
    stats = {"buckets_total": buckets, "buckets_previously_done": n_done,
             "buckets_done": agg["b"], "n_quads": agg["q"],
             "n_errors": agg["e"], "memo_used": bool(memo)}
    if memo_ratio is not None:
        stats["memo_duplication_ratio"] = round(memo_ratio, 2)
    return stats


def run_in_waves(spark: SparkSession, pages: DataFrame, out_dir: str,
                 ctx_cache: dict, buckets: int = 64,
                 waves: int = 4,
                 rdf_direction: str | None = None,
                 snapshot_id: str = "", quad_sink=None) -> list[dict]:
    """Process the corpus in `waves` independently-committed bucket ranges.

    Each wave write+commit is atomic at the wave level, so a crash between
    waves leaves a committed prefix that the next invocation's
    ``run_with_resume`` skips — the operational checkpoint cadence for
    multi-day 100 TB backfills (waves ~ hours, recovery loses at most one
    wave).
    """
    from ..operators.parse import extract_and_parse

    stats = []
    pages_b = with_bucket(pages, buckets)
    per_wave = (buckets + waves - 1) // waves
    check_snapshot(spark, out_dir, snapshot_id)
    done = completed_buckets(spark, out_dir)
    for w in range(waves):
        lo, hi = w * per_wave, min((w + 1) * per_wave, buckets)
        wave_pages = pages_b.where(F.col("bucket").between(lo, hi - 1))
        if done is not None:
            wave_pages = wave_pages.join(F.broadcast(done), "bucket",
                                         "left_anti")
        parsed = with_bucket(
            extract_and_parse(wave_pages.drop("bucket"), ctx_cache,
                              rdf_direction), buckets)
        write_bucketed(parsed, out_dir, snapshot_id, quad_sink=quad_sink)
        stats.append({"wave": w, "buckets": [lo, hi]})
    return stats


def verify_lineage(spark: SparkSession, out_dir: str,
                   quads: DataFrame | None = None) -> DataFrame:
    """Recompute per-bucket stats from the quads table and diff against the
    lineage records — the audit every resume can run cheaply. Reads the
    default parquet layout; a non-parquet sink (Iceberg) passes its own
    ``quads`` DataFrame (e.g. ``spark.table('cat.db.quads')``)."""
    if quads is None:
        quads = spark.read.parquet(f"{out_dir}/quads")
    recomputed = bucket_lineage(quads).drop("snapshot_id")
    recorded = spark.read.parquet(f"{out_dir}/lineage")
    return (recomputed.alias("a")
            .join(recorded.alias("b"), "bucket", "full")
            .where(~F.col("a.n_quads").eqNullSafe(F.col("b.n_quads"))
                   | ~F.col("a.checksum").eqNullSafe(F.col("b.checksum"))
                   | ~F.col("a.n_errors").eqNullSafe(F.col("b.n_errors"))))
