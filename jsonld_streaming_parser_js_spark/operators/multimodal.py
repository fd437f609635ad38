"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side architecture is fully real — schemas, Arrow-batched
``mapInPandas`` decode/feature stages, partition sizing — while the actual
codec calls are STUBBED behind deterministic fakes (``_decode_stub``):
image/audio libraries are not in this container. Swapping the stub for
PIL/torchaudio is a one-function change; nothing in the plan shape moves.

Scale notes: binary payloads dominate row size, so these stages (a) select
ONLY the binary column + key (column pruning keeps the scan lean), (b) cap
``maxRecordsPerBatch`` implicitly via byte-size-aware yield, and (c) never
shuffle the binary — features (small) shuffle instead.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as ST

MEDIA_SCHEMA = ST.StructType([
    ST.StructField("media_id", ST.LongType()),
    ST.StructField("kind", ST.StringType()),      # image | audio | video
    ST.StructField("payload", ST.BinaryType()),
    ST.StructField("mime", ST.StringType()),
    ST.StructField("meta", ST.MapType(ST.StringType(), ST.StringType())),
])


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/png", "audio": "audio/wav",
             "video": "video/mp4"}
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 7)
        rows.append((i, kind, payload, mimes[kind],
                     {"w": str(64 + i % 512)} if kind == "image"
                     else {"dur_ms": str(1000 + i * 37)}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_from_documents(spark, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from ``documents`` with pure SQL
    expressions (payload = UTF-8 bytes of text) so the DuckDB oracle can
    reproduce byte lengths AND the sha256-derived stub features exactly."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = (F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio")
            .otherwise("video"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.concat(kind, F.lit("/synthetic")).alias("mime"),
        F.create_map(F.lit("n_chars"),
                     F.col("n_chars").cast("string")).alias("meta"))


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic fake decode: payload bytes -> fixed-shape float array.

    REAL IMPLEMENTATION WOULD: image -> PIL.Image.open + resize;
    audio -> soundfile/torchaudio load + resample; video -> frame-sample
    via pyav. Deliberately NotImplemented for real codecs:
    """
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"unknown media kind: {kind}")
    h = np.frombuffer(hashlib.sha256(payload).digest(), dtype=np.uint8)
    return (h.astype(np.float32) / 255.0)[:16]


FEATURE_SCHEMA = ST.StructType([
    ST.StructField("media_id", ST.LongType()),
    ST.StructField("kind", ST.StringType()),
    ST.StructField("n_bytes", ST.IntegerType()),
    ST.StructField("feature", ST.ArrayType(ST.FloatType())),
])


def extract_features(media: DataFrame,
                     max_batch_bytes: int = 64 << 20) -> DataFrame:
    """media -> (media_id, kind, n_bytes, feature[16]) via Arrow batches.

    Batches re-chunk by payload bytes so one giant video can't blow worker
    memory — the binary-column analog of maxRecordsPerBatch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, kinds, sizes, feats = [], [], [], []
            acc = 0
            for mid, kind, payload in zip(batch["media_id"].tolist(),
                                          batch["kind"].tolist(),
                                          batch["payload"].tolist()):
                ids.append(mid)
                kinds.append(kind)
                sizes.append(len(payload))
                feats.append([float(x) for x in
                              _decode_stub(payload, kind)])
                acc += len(payload)
                if acc >= max_batch_bytes:
                    yield pd.DataFrame({"media_id": ids, "kind": kinds,
                                        "n_bytes": sizes, "feature": feats})
                    ids, kinds, sizes, feats, acc = [], [], [], [], 0
            if ids:
                yield pd.DataFrame({"media_id": ids, "kind": kinds,
                                    "n_bytes": sizes, "feature": feats})

    return (media.select("media_id", "kind", "payload")
            .mapInPandas(run, FEATURE_SCHEMA))


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata aggregation (no decode): bytes + counts by kind."""
    return (media.groupBy("kind")
            .agg(F.count("*").alias("n_items"),
                 F.sum(F.length("payload")).alias("total_bytes"),
                 F.round(F.avg(F.length("payload")), 2).alias("avg_bytes"))
            .orderBy("kind"))
