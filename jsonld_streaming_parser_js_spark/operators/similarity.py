"""Similarity search over embedding columns (``array<float>``).

- ``brute_force_topk``: exact cosine top-k. The dot products run JVM-side
  via ``aggregate``/``zip_with`` (no Python), and the top-k is a window
  ``row_number`` over the per-query partition. Baseline / oracle-checkable.
- ``lsh_topk``: the 100 TB path — random-hyperplane LSH buckets vectors so
  each query only joins its own bucket(s); recall traded for a ~B-fold
  candidate reduction. Same final window top-k.

At scale the brute-force version is a broadcast nested-loop only when the
query side is tiny (broadcast the queries, scan the corpus once); we
explicitly ``F.broadcast`` the query side for that plan shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as ST


def _cosine(a: str, b: str):
    # CASTs force float64 multiplies (matching the DuckDB oracle exactly);
    # aggregate() is a left fold, as is DuckDB's list_reduce.
    dot = F.expr(f"aggregate(zip_with({a}, {b},"
                 " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
                 " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    na = F.expr(f"sqrt(aggregate({a}, CAST(0.0 AS DOUBLE),"
                " (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))")
    nb = F.expr(f"sqrt(aggregate({b}, CAST(0.0 AS DOUBLE),"
                " (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))")
    return dot / F.greatest(na * nb, F.lit(1e-12))


def brute_force_topk(embeddings: DataFrame, query_ids: list[int],
                     k: int = 5) -> DataFrame:
    """(query_id, neighbor_id, rank, cos_sim) exact top-k by cosine.

    Query side is broadcast (tiny), corpus scanned once — the canonical
    small-dim x huge-fact join shape.
    """
    queries = (embeddings
               .where(F.col("vec_id").isin(query_ids))
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_emb")))
    pairs = (embeddings.alias("c")
             .join(F.broadcast(queries),
                   F.col("vec_id") != F.col("query_id"))
             .select("query_id",
                     F.col("vec_id").alias("neighbor_id"),
                     F.round(_cosine("q_emb", "embedding"), 6)
                     .alias("cos_sim")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("cos_sim"), F.asc("neighbor_id")))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos_sim"))


def embedding_near_pairs(embeddings: DataFrame,
                         threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, all-pairs).

    The all-pairs form is the *verifier*; at corpus scale candidates come
    from `hyperplane_buckets` first and only candidates reach this cosine.
    Self-join keyed by id inequality; JVM-side float64 math.
    """
    a = embeddings.select(F.col("vec_id").alias("id_a"),
                          F.col("embedding").alias("emb_a"))
    b = embeddings.select(F.col("vec_id").alias("id_b"),
                          F.col("embedding").alias("emb_b"))
    return (a.join(b, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    F.round(_cosine("emb_a", "emb_b"), 6).alias("cos_sim"))
            .where(F.col("cos_sim") >= threshold))


def hyperplane_buckets(embeddings: DataFrame, n_planes: int = 8,
                       dim: int | None = None, seed: int = 42) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector (Arrow-batched NumPy)."""
    schema = ST.StructType([
        ST.StructField("vec_id", ST.LongType()),
        ST.StructField("bucket", ST.IntegerType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        for batch in batches:
            mat = np.array(list(batch["embedding"]), dtype=np.float64)
            if planes is None:
                rng = np.random.RandomState(seed)
                planes = rng.randn(mat.shape[1], n_planes)
            bits = (mat @ planes) > 0
            bucket = (bits * (1 << np.arange(n_planes))).sum(axis=1)
            yield pd.DataFrame({"vec_id": batch["vec_id"],
                                "bucket": bucket.astype(np.int32)})

    return embeddings.select("vec_id", "embedding").mapInPandas(run, schema)


def lsh_topk(embeddings: DataFrame, query_ids: list[int],
             k: int = 5, n_planes: int = 6) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    then exact cosine + window top-k. Recall < 1.0 by design (scale path)."""
    buckets = hyperplane_buckets(embeddings, n_planes)
    emb_b = embeddings.join(buckets, "vec_id")
    queries = (emb_b.where(F.col("vec_id").isin(query_ids))
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_emb"),
                       F.col("bucket").alias("q_bucket")))
    pairs = (emb_b.join(F.broadcast(queries),
                        (F.col("bucket") == F.col("q_bucket"))
                        & (F.col("vec_id") != F.col("query_id")))
             .select("query_id", F.col("vec_id").alias("neighbor_id"),
                     F.round(_cosine("q_emb", "embedding"), 6)
                     .alias("cos_sim")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("cos_sim"), F.asc("neighbor_id")))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos_sim"))
