"""The everyday corpus-cleaning pipeline, composed end to end:

    quality filter -> exact dedup -> MinHash near-dup drop -> PII gate

Each stage exists (and is oracle-checked) individually in
``textstats``/``dedup``; this module proves they COMPOSE without
re-reading the corpus per stage — the thing a real training-data run
cares about at 100 TB, where four separate scans of the corpus would
quadruple the dominant I/O cost.

Plan shape: stages 1 (quality), 2 (exact survivor) and 4 (PII) are one
narrow lineage over a single corpus scan — the exact-dedup survivor uses
a window-min over ``md5(text)`` instead of groupBy + self-join, so no
extra scan and one shuffle. Stage 3's LSH is inherently a self-join, so
the survivor set is cached once and both its uses (signature build, final
anti-join) read the cache; at production scale the cache is a persisted
parquet snapshot of the survivors (write once, read twice) — the
composition, not the storage tier, is what this module fixes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import dedup
from .textstats import pii_any_expr, punct_ratio_expr, token_count_expr


def clean_corpus(docs: DataFrame, min_tokens: int = 10,
                 max_punct: float = 0.2, near_threshold: float = 0.5,
                 num_hashes: int = dedup.NUM_HASHES,
                 bands: int = dedup.BANDS) -> DataFrame:
    """(doc_id, n_tokens, punct_ratio) of the documents that survive all
    four gates. Near-dup survivorship: for every MinHash-verified pair the
    LARGER doc_id is dropped (the standard keep-the-canonical-min rule;
    chains drop everything but the chain minimum's own survivors).

    Cache lifecycle: the survivor set (and the signature table inside
    minhash_lsh_pairs) stays cached for the session — Spark's
    CacheManager keys by analyzed plan, so repeated calls over the SAME
    input reuse one entry rather than accumulating; call
    ``spark.catalog.clearCache()`` to reclaim. At production scale the
    survivor snapshot is a persisted parquet table instead (write once,
    read twice), so no executor memory is pinned."""
    feats = docs.select("doc_id", "text",
                        token_count_expr().alias("n_tokens"),
                        punct_ratio_expr().alias("punct_ratio"))
    s1 = feats.where((F.col("n_tokens") >= min_tokens)
                     & (F.col("punct_ratio") <= max_punct))
    # exact-dedup survivor as a window-min: same lineage, no self-join
    w = Window.partitionBy(F.md5("text"))
    s2 = (s1.withColumn("_keep", F.min("doc_id").over(w))
          .where(F.col("doc_id") == F.col("_keep")).drop("_keep")
          .cache())
    pairs = dedup.minhash_lsh_pairs(s2, num_hashes=num_hashes, bands=bands,
                                    threshold=near_threshold)
    drops = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    s3 = s2.join(drops, "doc_id", "left_anti")
    return (s3.where(~pii_any_expr())
            .select("doc_id", "n_tokens", "punct_ratio"))
