"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design notes (the whole point of these being Spark-native):

- **exact_dedup**: hash-groupBy on ``md5(text)`` — one shuffle keyed on a
  uniform hash, no skew by construction. At 100 TB this is the cheapest
  possible full-corpus dedup (shuffle size = one 32-char key + id per row).
- **minhash_lsh_pairs**: per-row signature (narrow, Arrow-batched NumPy) ->
  explode to (band, bucket) -> self-join *within buckets only*. The
  candidate join is an equi-join on (band, bucket-hash): Catalyst shuffles
  both sides on that key, AQE splits skewed buckets (boilerplate pages that
  share a signature band). Never an O(n^2) cross join.
- **simhash64**: 64-bit signature per doc via token-hash voting; near-dup
  = Hamming distance <= k, found by pigeonhole banding (split 64 bits into
  k+1 chunks; equal chunk -> candidate) — same bucketed-join shape.
- **ngram_jaccard_pairs**: exact verification used on candidate pairs (or,
  in the oracle-checked small-scale query, within cheap blocking keys).
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as ST

# -- exact --------------------------------------------------------------------


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Keep the minimum doc_id per exact text hash (canonical survivor)."""
    return (docs
            .groupBy(F.md5("text").alias("text_md5"))
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 F.count("*").alias("n_dups")))


# -- token shingles -----------------------------------------------------------


def tokens_col(col: str = "text"):
    """Distinct lowercase word tokens (sorted for determinism; empty
    strings from leading/trailing separators removed — they would inflate
    Jaccard)."""
    return F.array_remove(F.array_sort(F.array_distinct(
        F.split(F.lower(F.col(col)), r"[^a-z0-9]+"))), "")


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5,
                        prefix_chars: int = 32) -> DataFrame:
    """Near-dup pairs by unigram-set Jaccard within prefix blocks.

    Blocking on ``md5(substr(text,1,prefix_chars))`` keeps the self-join
    linear-ish; exact Jaccard verifies. SQL-oracle-expressible end to end.
    """
    from .parse import ensure_map_parallelism
    toks = (ensure_map_parallelism(docs.select("doc_id", "text"))
            .select("doc_id",
                    F.md5(F.substring("text", 1, prefix_chars))
                    .alias("blk_key"),
                    tokens_col().alias("toks")))
    a, b = toks.alias("a"), toks.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.array_union(F.col("a.toks"), F.col("b.toks")))
    return (a.join(b, (F.col("a.blk_key") == F.col("b.blk_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.round(inter / F.greatest(union, F.lit(1)), 6)
                    .alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


# -- MinHash + LSH ------------------------------------------------------------

# Mersenne prime 2^31-1. Two constraints pin this choice:
# (1) a, b, token hashes < 2^31 keep a*x + b < 2^62, fitting uint64/BIGINT
#     with NO wrap mod 2^64 (61-bit params silently wrapped the product,
#     which is not the universal hash family the banding math assumes);
# (2) the MODULUS must be ~ the hash range, not far above it: with 31-bit
#     inputs and modulus 2^61-1 the map a*x+b wraps at most twice, staying
#     piecewise-monotone in x, so set-minima track raw-hash minima and
#     MinHash agreement stops estimating Jaccard (measured 2/32 agreement
#     at true J=0.71). Mod 2^31-1 wraps ~2^31 times and mixes properly.
_MERSENNE = (1 << 31) - 1
_PARAM_MAX = _MERSENNE

# Named MinHash defaults shared with the DuckDB oracle builders in
# __spark_entry__ (r7 drift sweep): the oracle's /NUM_HASHES divisor and
# rows-per-band derive from THESE names, so an operator-default change
# cannot silently diverge from the oracle's replay.
NUM_HASHES = 64
BANDS = 16
SHINGLE = 3


def _hash_params(n: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = np.random.RandomState(seed)
    return [(int(rng.randint(1, _PARAM_MAX)), int(rng.randint(0, _PARAM_MAX)))
            for _ in range(n)]


def _token_hash(tok: str) -> int:
    """31-bit token hash (4 md5 bytes, sign bit cleared): see _PARAM_MAX."""
    return int.from_bytes(hashlib.md5(tok.encode()).digest()[:4],
                          "big") & 0x7FFFFFFF


# Tokenizer shared by MinHash/SimHash — deliberately regex-defined so the
# DuckDB value oracle reproduces it exactly: regexp_extract_all(lower(text),
# '[a-z0-9]+') is the same relation in both engines.
_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _words(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


def _token_hash64(tok: str) -> int:
    """Full 64-bit token hash — SimHash needs votes on all 64 bit lanes."""
    return int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")


def minhash_signatures(docs: DataFrame, num_hashes: int = NUM_HASHES,
                       shingle: int = SHINGLE) -> DataFrame:
    """(doc_id, sig: array<long>) — word-shingle MinHash, Arrow-batched.

    Implementation note (measured, sf0.1/32 cores): a pure-SQL expression
    pipeline (regexp tokenize -> transform/slice shingles -> md5 gram hash
    -> 64x array_min(transform(...))) is ~2x SLOWER than this NumPy
    version — Spark's higher-order-function lambdas are interpreted, not
    whole-stage-codegen'd, so 64 interpreted array passes lose to one
    Arrow crossing + vectorized (grams x hashes) NumPy. The algorithm is
    engine-portable regardless: the DuckDB oracle recomputes it in SQL.
    """
    params = _hash_params(num_hashes)

    schema = ST.StructType([
        ST.StructField("doc_id", ST.LongType()),
        ST.StructField("sig", ST.ArrayType(ST.LongType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        a = np.array([p[0] for p in params], dtype=np.uint64)
        b = np.array([p[1] for p in params], dtype=np.uint64)
        for batch in batches:
            sigs = []
            for text in batch["text"]:
                words = _words(text)
                grams = {" ".join(words[i:i + shingle])
                         for i in range(max(1, len(words) - shingle + 1))}
                hv = np.array([_token_hash(g) for g in grams],
                              dtype=np.uint64)
                # (a*x + b) mod p, vectorized over grams x hashes
                m = (hv[None, :] * a[:, None] + b[:, None]) % _MERSENNE
                sigs.append([int(x) for x in m.min(axis=1)])
            yield pd.DataFrame({"doc_id": batch["doc_id"], "sig": sigs})

    from .parse import ensure_map_parallelism
    return ensure_map_parallelism(
        docs.select("doc_id", "text")).mapInPandas(run, schema)


def minhash_lsh_pairs(docs: DataFrame, num_hashes: int = NUM_HASHES,
                      bands: int = BANDS, threshold: float = 0.7) -> DataFrame:
    """Candidate pairs via banded LSH, verified by signature similarity.

    rows/band = num_hashes/bands; est. Jaccard = fraction of matching
    minhash components. Bucket join is an equi-join on (band, bucket) —
    AQE skew-split handles pathological buckets.
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes).cache()
    banded = sigs.select(
        "doc_id",
        F.posexplode(F.array(*[
            F.md5(F.concat_ws(",", *[
                F.col("sig")[band * rows + r].cast("string")
                for r in range(rows)]))
            for band in range(bands)])).alias("band", "bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .dropDuplicates())
    sa = sigs.select(F.col("doc_id").alias("doc_a"),
                     F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"),
                     F.col("sig").alias("sig_b"))
    est = F.expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y),"
                 " v -> v)) / size(sig_a)")
    return (cand.join(sa, "doc_a").join(sb, "doc_b")
            .select("doc_a", "doc_b",
                    F.round(est, 6).alias("est_jaccard"))
            .where(F.col("est_jaccard") >= threshold))


# -- SimHash ------------------------------------------------------------------


def simhash64(docs: DataFrame) -> DataFrame:
    """64-bit SimHash over word tokens (Arrow-batched NumPy voting)."""
    schema = ST.StructType([
        ST.StructField("doc_id", ST.LongType()),
        ST.StructField("simhash", ST.LongType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_idx = np.arange(64, dtype=np.uint64)
        for batch in batches:
            out = []
            for text in batch["text"]:
                words = _words(text)
                if not words:
                    out.append(0)
                    continue
                hv = np.array([_token_hash64(w) for w in set(words)],
                              dtype=np.uint64)
                bits = ((hv[:, None] >> bit_idx[None, :]) & 1).astype(
                    np.int64)
                votes = (2 * bits - 1).sum(axis=0)
                sig = np.uint64(0)
                for i in range(64):
                    if votes[i] > 0:
                        sig |= np.uint64(1) << np.uint64(i)
                out.append(int(np.int64(sig)))  # store as signed long
            yield pd.DataFrame({"doc_id": batch["doc_id"], "simhash": out})

    from .parse import ensure_map_parallelism
    return ensure_map_parallelism(
        docs.select("doc_id", "text")).mapInPandas(run, schema)


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= k via pigeonhole banding:
    split 64 bits into k+1 chunks; any equal chunk -> candidate."""
    chunks = max_hamming + 1
    width = 64 // chunks
    sigs = simhash64(docs).cache()
    # (chunk_idx, chunk_value) rows built JVM-side with shiftrightunsigned
    parts = sigs.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("simhash"), i * width)
            .bitwiseAND(F.lit((1 << width) - 1)).alias(f"c{i}")
            for i in range(chunks)])).alias("chunk", "val"))
    a, b = parts.alias("a"), parts.alias("b")
    cand = (a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
                   & (F.col("a.val") == F.col("b.val"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"),
                    F.col("a.simhash").alias("sh_a"),
                    F.col("b.simhash").alias("sh_b"))
            .dropDuplicates(["doc_a", "doc_b"]))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.select("doc_a", "doc_b", hamming.alias("hamming"))
            .where(F.col("hamming") <= max_hamming))
