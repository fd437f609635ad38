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

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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


def _query_side(embeddings: DataFrame, query_ids: list[int]) -> DataFrame:
    return (embeddings
            .where(F.col("vec_id").isin(query_ids))
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("q_emb")))


def _topk_epilogue(pairs: DataFrame, k: int) -> DataFrame:
    """Shared (query_id, neighbor_id, rank, cos_sim) top-k tail: rank on
    the ROUNDED cos_sim with neighbor_id tie-break — the single ordering
    every oracle mirrors (one copy, so the lanes cannot drift)."""
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("cos_sim"), F.asc("neighbor_id")))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos_sim"))


def brute_force_topk(embeddings: DataFrame, query_ids: list[int],
                     k: int = 5) -> DataFrame:
    """(query_id, neighbor_id, rank, cos_sim) exact top-k by cosine.

    Query side is broadcast (tiny), corpus scanned once — the canonical
    small-dim x huge-fact join shape.
    """
    pairs = (embeddings.alias("c")
             .join(F.broadcast(_query_side(embeddings, query_ids)),
                   F.col("vec_id") != F.col("query_id"))
             .select("query_id",
                     F.col("vec_id").alias("neighbor_id"),
                     F.round(_cosine("q_emb", "embedding"), 6)
                     .alias("cos_sim")))
    return _topk_epilogue(pairs, k)


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


# Named defaults shared with the DuckDB oracles in __spark_entry__ (r7
# drift sweep, verdict ask #8): the oracle SQL interpolates THESE names,
# so changing an operator default here cannot silently diverge from the
# oracle's hardcoded twin.
LSH_PAIR_PLANES = 4          # embedding_lsh_pairs hash tables
LSH_PAIR_SEEDS = (42, 7, 13, 99)
LSH_TOPK_PLANES = 6          # lsh_topk bucket width
LSH_SEED = 42                # default hyperplane seed
IVF_N_CENTROIDS = 16
IVF_NPROBE = 4


def lsh_planes(n_planes: int, dim: int, seed: int = LSH_SEED) -> list[list[float]]:
    """Deterministic random-hyperplane constants, shared by the Spark plan
    and the DuckDB oracle (both engines inline the same literals)."""
    rng = np.random.RandomState(seed)
    return [[float(v) for v in rng.randn(dim)] for _ in range(n_planes)]


def _f64_lit(v: float) -> str:
    """SQL literal that parses to this exact float64 in Spark AND DuckDB:
    repr() is shortest-round-trip; an exponent forces DOUBLE typing (a bare
    decimal literal is DECIMAL in both engines, which rounds differently)."""
    s = repr(v)
    return s if "e" in s or "inf" in s or "nan" in s else s + "e0"


def hyperplane_bucket_sql(planes: list[list[float]],
                          col: str = "embedding") -> str:
    """Bucket id as a pure SQL expression: bit j set iff the left-fold dot
    product with plane j is > 0. Identical text works in Spark SQL and
    (modulo array() -> list_value(), handled by the oracle builder) DuckDB,
    so the two engines agree bit-for-bit — the fold fixes the summation
    order, unlike a NumPy matmul."""
    terms = []
    dim = len(planes[0])
    for j, plane in enumerate(planes):
        arr = ", ".join(_f64_lit(v) for v in plane)
        dot = (f"aggregate(zip_with({col}, array({arr}),"
               f" (x, y) -> CAST(x AS DOUBLE) * y),"
               f" CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    # a dim mismatch would NULL-pad zip_with, send every vector to bucket 0,
    # and silently degenerate the candidate join to all-pairs — fail loudly
    return (f"IF(size({col}) = {dim}, "
            "CAST(" + " + ".join(terms) + " AS INT), "
            f"CAST(raise_error('embedding dim != {dim}; pass dim= to the "
            f"LSH operator') AS INT))")


def hyperplane_buckets(embeddings: DataFrame, n_planes: int = 8,
                       dim: int = 64, seed: int = LSH_SEED) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector.

    100% JVM-side (whole-stage-codegen'd fold over the array column — no
    Python crossing, unlike the previous NumPy version) and exactly
    reproducible by the DuckDB oracle via hyperplane_bucket_sql."""
    planes = lsh_planes(n_planes, dim, seed)
    # NULL embeddings are corrupt rows, not dim mismatches: drop them here
    # (never task-fatal on bad data); the dim guard then only fires on a
    # genuine width mismatch
    return (embeddings.where(F.col("embedding").isNotNull())
            .select("vec_id",
                    F.expr(hyperplane_bucket_sql(planes)).alias("bucket")))


def embedding_lsh_pairs(embeddings: DataFrame, threshold: float = 0.4,
                        n_planes: int = LSH_PAIR_PLANES, dim: int = 64,
                        seeds: tuple[int, ...] = LSH_PAIR_SEEDS) -> DataFrame:
    """Scale-shape embedding near-dup: bucket-restricted candidates ->
    exact float64 cosine verify. NEVER all-pairs — each hash table is an
    equi-join on the bucket id; multiple plane seeds union'd for recall
    (a pair missed by every table is a false negative, the LSH trade).
    ``embedding_near_pairs`` is the sf-scale oracle twin for recall audits.
    """
    cands = None
    emb = embeddings.select("vec_id", "embedding")
    for seed in seeds:
        b = emb.join(hyperplane_buckets(embeddings, n_planes, dim, seed),
                     "vec_id")
        x = b.select(F.col("vec_id").alias("id_a"),
                     F.col("embedding").alias("emb_a"), "bucket")
        y = b.select(F.col("vec_id").alias("id_b"),
                     F.col("embedding").alias("emb_b"), "bucket")
        c = (x.join(y, ["bucket"])
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "emb_a", "emb_b"))
        cands = c if cands is None else cands.unionByName(c)
    return (cands.dropDuplicates(["id_a", "id_b"])
            .select("id_a", "id_b",
                    F.round(_cosine("emb_a", "emb_b"), 6).alias("cos_sim"))
            .where(F.col("cos_sim") >= threshold))


def deterministic_id_sample(df: DataFrame, id_col: str = "vec_id",
                            mod: int = 4) -> DataFrame:
    """Keep rows whose md5(id) falls in stratum 0 of ``mod`` — the
    deterministic ~1/mod sample that makes the recall audit's exact
    all-pairs side scale-safe: O((n/mod)^2) instead of O(n^2), with an
    unbiased pair-level recall estimate (both pair endpoints sampled
    independently of their similarity). md5 (not xxhash64) so the DuckDB
    oracle computes the identical stratum with
    ``('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))::BIGINT % mod``
    (shared expression: operators/hashing.md5_stratum)."""
    from .hashing import md5_stratum
    return df.where(md5_stratum(F.col(id_col), mod) == 0)


def lsh_topk(embeddings: DataFrame, query_ids: list[int],
             k: int = 5, n_planes: int = LSH_TOPK_PLANES) -> DataFrame:
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
    return _topk_epilogue(pairs, k)


def ivf_centroids(embeddings: DataFrame,
                  n_centroids: int = IVF_N_CENTROIDS) -> DataFrame:
    """Deterministic IVF coarse quantizer: the ``n_centroids`` corpus
    vectors with the smallest ``md5(vec_id)`` are the centroids.

    Seed-free and exactly SQL-reproducible (the DuckDB oracle re-derives
    the same set), unlike k-means whose float-sum reduction order differs
    across engines/partitionings. The quantizer trades a few points of
    recall for cross-engine exactness; swapping in offline-trained
    centroid literals (the production norm: train once, ship constants)
    changes nothing downstream.
    """
    return (embeddings
            .withColumn("_m", F.md5(F.col("vec_id").cast("string")))
            .orderBy("_m").limit(n_centroids)
            .select(F.col("vec_id").alias("centroid_id"),
                    F.col("embedding").alias("c_emb")))


def _cos_sql(col: str, arr_sql: str) -> str:
    """Cosine between an array column and an inline DOUBLE array literal —
    identical zip_with/fold shape to _cosine, so values match the DuckDB
    oracle bit-for-bit."""
    dot = (f"aggregate(zip_with({col}, {arr_sql},"
           " (x, y) -> CAST(x AS DOUBLE) * y),"
           " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    na = (f"sqrt(aggregate({col}, CAST(0.0 AS DOUBLE),"
          " (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))")
    nb = (f"sqrt(aggregate({arr_sql}, CAST(0.0 AS DOUBLE),"
          " (acc, v) -> acc + v * v))")
    return f"(({dot}) / greatest(({na}) * ({nb}), 1e-12))"


def ivf_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5,
             n_centroids: int = IVF_N_CENTROIDS,
             nprobe: int = IVF_NPROBE) -> DataFrame:
    """IVF-flat approximate top-k: coarse-quantize the corpus into
    ``n_centroids`` inverted lists (nearest-centroid assignment), probe
    the ``nprobe`` nearest lists per query, exact cosine inside them.

    100 TB shape: the centroid vectors are COLLECTED once at plan-build
    (16 rows) and inlined as literals, so assignment is a pure narrow map
    — argmax over an inline struct array, zero shuffles, exactly the
    hyperplane_bucket_sql pattern; the inverted-list join broadcasts the
    tiny probe side (no corpus shuffle); in production `assigned` is
    written once partitioned by centroid_id and probed forever. NULL
    embeddings are corrupt rows and are dropped (hyperplane convention).
    """
    emb = embeddings.where(F.col("embedding").isNotNull())
    cents = [(r["centroid_id"], [float(v) for v in r["c_emb"]])
             for r in ivf_centroids(emb, n_centroids).collect()]

    def arr_lit(vec: list[float]) -> str:
        return "array(" + ",".join(_f64_lit(v) for v in vec) + ")"

    # argmax by max(struct(sim, -cid)): struct comparison is field-
    # lexicographic, so equal sims fall to the LARGEST -cid == smallest
    # centroid_id — identical to the oracle's ORDER BY sim DESC, cid ASC
    sim_structs = "array(" + ",".join(
        f"named_struct('sim', {_cos_sql('embedding', arr_lit(vec))},"
        f" 'ncid', {-cid}L)" for cid, vec in cents) + ")"
    assigned = emb.select(
        "vec_id", "embedding",
        (-F.expr(f"array_max({sim_structs}).ncid")).alias("centroid_id"))

    # probe side: nprobe best centroids per query (sort the same struct
    # array desc — sim DESC then -cid DESC == cid ASC, matching the
    # oracle's window ordering)
    q_structs = sim_structs.replace("aggregate(zip_with(embedding,",
                                    "aggregate(zip_with(q_emb,")         .replace("aggregate(embedding,", "aggregate(q_emb,")
    probes = (_query_side(emb, query_ids)
              .select("query_id", "q_emb",
                      F.explode(F.expr(
                          f"slice(reverse(array_sort({q_structs})),"
                          f" 1, {nprobe})")).alias("probe"))
              .select("query_id", "q_emb",
                      (-F.col("probe.ncid")).alias("centroid_id")))
    cand = (assigned.join(F.broadcast(probes), "centroid_id")
            .where(F.col("vec_id") != F.col("query_id"))
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    F.round(_cosine("q_emb", "embedding"), 6)
                    .alias("cos_sim")))
    return _topk_epilogue(cand, k)
