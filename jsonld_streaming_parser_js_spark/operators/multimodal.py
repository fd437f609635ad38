"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side architecture is fully real — schemas, Arrow-batched
``mapInPandas`` decode/feature stages, partition sizing. Codec status:

- audio/WAV: REAL decode (``decode_wav`` — RIFF/PCM via the stdlib
  ``wave`` module + NumPy), value-oracle-checked (mm_decode_wav).
- image/PPM: REAL decode (``decode_ppm`` — binary P6, header parse +
  NumPy), value-oracle-checked (mm_decode_ppm).
- image/PNG: REAL decode (``decode_png`` — chunk walk with CRC32
  verification, zlib inflate, full None/Sub/Up/Average/Paeth scanline
  unfiltering; stdlib-only), value-oracle-checked (mm_decode_png).
- JPEG/MP3/video: STUBBED behind deterministic fakes (``_decode_stub``):
  those codec libraries are not in this container (a permanent constraint
  documented in PARITY.md). Swapping the stub for PIL/torchaudio/pyav is a
  one-function change; nothing in the plan shape moves.

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

    # NOTE: deliberately NO ensure_map_parallelism here — the input
    # carries the binary payload column, and the mm lanes' scale
    # invariant is that payload bytes never cross a shuffle. The
    # *_stats_from_ids runners (bare-id inputs, payload synthesized
    # after the exchange) take the parallelism floor instead.
    return (media.select("media_id", "kind", "payload")
            .mapInPandas(run, FEATURE_SCHEMA))


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata aggregation (no decode): bytes + counts by kind."""
    return (media.groupBy("kind")
            .agg(F.count("*").alias("n_items"),
                 F.sum(F.length("payload")).alias("total_bytes"),
                 F.round(F.avg(F.length("payload")), 2).alias("avg_bytes"))
            .orderBy("kind"))


# ---------------------------------------------------------------------------
# REAL codecs: uncompressed WAV (RIFF/PCM, stdlib `wave`) and binary PPM
# (P6). Both are complete decoders for their formats; the synth_* twins
# build payloads whose DECODED statistics have closed-form integer
# definitions, so the DuckDB oracle can recompute them exactly — the
# decode path itself is real byte parsing, not a fake.
# ---------------------------------------------------------------------------

WAV_RATE = 16000


def synth_wav(media_id: int) -> bytes:
    """Real mono 16 kHz 16-bit PCM WAV whose samples follow the
    SQL-expressible pattern s_i = ((media_id*31 + i*7) % 65536) - 32768."""
    import io
    import wave as _wave

    n = 800 + (media_id % 5) * 160
    idx = np.arange(n, dtype=np.int64)
    samples = ((media_id * 31 + idx * 7) % 65536 - 32768).astype("<i2")
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(WAV_RATE)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """Parse RIFF/PCM WAV bytes -> exact-integer waveform statistics
    (REAL decode: header via stdlib `wave`, samples via NumPy)."""
    import io
    import wave as _wave

    with _wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2 or w.getcomptype() != "NONE":
            raise NotImplementedError(
                "only uncompressed 16-bit PCM WAV is decodable here")
        rate = w.getframerate()
        nchannels = w.getnchannels()
        frames = w.readframes(w.getnframes())
    samples = np.frombuffer(frames, dtype="<i2").astype(np.int64)
    if nchannels > 1:
        # integer downmix: floor-divide the channel sum (exact-integer
        # stats contract; float mean would truncate implementation-defined)
        samples = samples.reshape(-1, nchannels).sum(axis=1) // nchannels
    return {
        "n_samples": int(samples.size),
        "sample_rate": int(rate),
        "duration_ms": int(samples.size * 1000 // rate),
        "peak": int(samples.max()) if samples.size else 0,
        "sum_abs": int(np.abs(samples).sum()),
    }


def synth_ppm(media_id: int) -> bytes:
    """Real binary PPM (P6) whose pixel channels follow SQL-expressible
    integer patterns: r=(id+x)%256, g=(x*y)%256, b=(id*3+y)%256."""
    w = 8 + (media_id % 4) * 4
    h = 6 + (media_id % 3) * 2
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    img = np.stack([
        np.broadcast_to((media_id + x) % 256, (h, w)),
        (x * y) % 256,
        np.broadcast_to((media_id * 3 + y) % 256, (h, w)),
    ], axis=-1).astype(np.uint8)
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_ppm(payload: bytes) -> dict:
    """Parse binary PPM (P6) bytes -> (width, height, per-channel sums).
    REAL decode: tokenizing header parser (comments + arbitrary
    whitespace per the netpbm spec), NumPy pixel plane."""
    if payload[:2] != b"P6":
        raise NotImplementedError("only binary PPM (P6) is decodable here")
    # header = magic, width, height, maxval as whitespace-separated tokens,
    # with '#' comments running to end-of-line
    tokens: list[int] = []
    pos = 2
    while len(tokens) < 3:
        c = payload[pos:pos + 1]
        if c == b"#":
            pos = payload.index(b"\n", pos) + 1
        elif c.isspace():
            pos += 1
        elif c.isdigit():
            end = pos
            while payload[end:end + 1].isdigit():
                end += 1
            tokens.append(int(payload[pos:end]))
            pos = end
        else:
            raise ValueError(f"bad PPM header byte at {pos}: {c!r}")
    width, height, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    pos += 1  # single whitespace after maxval
    raster = np.frombuffer(payload, dtype=np.uint8,
                           count=width * height * 3, offset=pos)
    img = raster.reshape(height, width, 3).astype(np.int64)
    return {
        "width": int(width),
        "height": int(height),
        "sum_r": int(img[:, :, 0].sum()),
        "sum_g": int(img[:, :, 1].sum()),
        "sum_b": int(img[:, :, 2].sum()),
    }


WAV_STATS_SCHEMA = ST.StructType([
    ST.StructField("media_id", ST.LongType()),
    ST.StructField("n_samples", ST.IntegerType()),
    ST.StructField("sample_rate", ST.IntegerType()),
    ST.StructField("duration_ms", ST.IntegerType()),
    ST.StructField("peak", ST.IntegerType()),
    ST.StructField("sum_abs", ST.LongType()),
])

PPM_STATS_SCHEMA = ST.StructType([
    ST.StructField("media_id", ST.LongType()),
    ST.StructField("width", ST.IntegerType()),
    ST.StructField("height", ST.IntegerType()),
    ST.StructField("sum_r", ST.LongType()),
    ST.StructField("sum_g", ST.LongType()),
    ST.StructField("sum_b", ST.LongType()),
])


def wav_stats_from_ids(ids: DataFrame, id_col: str = "media_id",
                       max_batch_bytes: int = 64 << 20) -> DataFrame:
    """ids -> synth WAV payload -> REAL decode -> exact stats.

    Generation and decode run in the SAME Arrow batch so the (large)
    payload bytes never cross a shuffle — only the small stat rows do;
    with a stored media table, swap the generator for the payload column
    and keep the decode half unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows, acc = [], 0
            for mid in batch[id_col].tolist():
                payload = synth_wav(int(mid))
                acc += len(payload)
                rows.append({"media_id": int(mid),
                             **decode_wav(payload)})
                if acc >= max_batch_bytes:
                    yield pd.DataFrame(rows)
                    rows, acc = [], 0
            if rows:
                yield pd.DataFrame(rows)

    from .parse import ensure_map_parallelism
    return ensure_map_parallelism(
        ids.select(F.col(id_col))).mapInPandas(run, WAV_STATS_SCHEMA)


def ppm_stats_from_ids(ids: DataFrame, id_col: str = "media_id",
                       max_batch_bytes: int = 64 << 20) -> DataFrame:
    """ids -> synth PPM payload -> REAL decode -> exact stats (see
    wav_stats_from_ids for the batching/shuffle notes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows, acc = [], 0
            for mid in batch[id_col].tolist():
                payload = synth_ppm(int(mid))
                acc += len(payload)
                rows.append({"media_id": int(mid),
                             **decode_ppm(payload)})
                if acc >= max_batch_bytes:
                    yield pd.DataFrame(rows)
                    rows, acc = [], 0
            if rows:
                yield pd.DataFrame(rows)

    from .parse import ensure_map_parallelism
    return ensure_map_parallelism(
        ids.select(F.col(id_col))).mapInPandas(run, PPM_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# REAL compressed-image codec: PNG (RGB8). Pure stdlib zlib + NumPy — a
# complete decoder for non-interlaced 8-bit RGB PNGs: chunk walk with CRC
# verification, IDAT inflate, and full scanline UNFILTERING (None/Sub/Up/
# Average/Paeth). The synth twin deliberately filters each row with a
# different filter type (y % 5) so the decoder's filter inversion is
# genuinely exercised; pixel channels keep the PPM closed-form integers so
# the DuckDB oracle recomputes the decoded sums exactly.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib as _z
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def synth_png(media_id: int) -> bytes:
    """Real non-interlaced RGB8 PNG; pixels follow the same closed-form
    integer patterns as synth_ppm; row y is filtered with type y % 5."""
    import struct
    import zlib as _z

    w = 8 + (media_id % 4) * 4
    h = 6 + (media_id % 3) * 2
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    img = np.stack([
        np.broadcast_to((media_id + x) % 256, (h, w)),
        (x * y) % 256,
        np.broadcast_to((media_id * 3 + y) % 256, (h, w)),
    ], axis=-1).astype(np.uint8)
    bpp = 3
    raw = bytearray()
    prior = np.zeros(w * bpp, dtype=np.int64)
    for row_i in range(h):
        recon = img[row_i].reshape(-1).astype(np.int64)
        ftype = row_i % 5
        line = np.zeros(w * bpp, dtype=np.int64)
        for i in range(w * bpp):
            left = recon[i - bpp] if i >= bpp else 0
            up = prior[i]
            upleft = prior[i - bpp] if i >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                pred = _paeth(int(left), int(up), int(upleft))
            line[i] = (recon[i] - pred) % 256
        raw.append(ftype)
        raw.extend(int(v) for v in line)
        prior = recon
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # RGB8
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", _z.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> dict:
    """Parse PNG bytes -> (width, height, per-channel sums). REAL decode:
    signature + chunk walk with CRC32 verification, zlib inflate, and full
    None/Sub/Up/Average/Paeth unfiltering.

    ORACLE-LANE ONLY: the Sub/Average/Paeth inversions scan per-byte in
    Python (each byte depends on the previous reconstructed byte, so the
    inner loop doesn't vectorize without per-filter NumPy scans). Fine for
    the mm_decode_png correctness lane over tiny synthetic images; a
    production image path swaps this one function for a real codec lib
    (see _decode_stub and PARITY.md)."""
    import struct
    import zlib as _z

    if payload[:8] != _PNG_SIG:
        raise NotImplementedError("not a PNG")
    pos, width, height, idat = 8, None, None, bytearray()
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length:
                                             pos + 12 + length])
        if _z.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body)
            if (depth, ctype, comp, filt, ilace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "only non-interlaced 8-bit RGB PNG is decodable here")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = _z.decompress(bytes(idat))
    bpp, stride = 3, width * 3
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    img = np.zeros((height, stride), dtype=np.int64)
    prior = np.zeros(stride, dtype=np.int64)
    for row_i in range(height):
        off = row_i * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=off + 1).astype(np.int64)
        recon = np.zeros(stride, dtype=np.int64)
        for i in range(stride):
            left = recon[i - bpp] if i >= bpp else 0
            up = prior[i]
            upleft = prior[i - bpp] if i >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            elif ftype == 4:
                pred = _paeth(int(left), int(up), int(upleft))
            else:
                raise ValueError(f"bad PNG filter type {ftype}")
            recon[i] = (line[i] + pred) % 256
        img[row_i] = recon
        prior = recon
    pix = img.reshape(height, width, 3)
    return {
        "width": int(width),
        "height": int(height),
        "sum_r": int(pix[:, :, 0].sum()),
        "sum_g": int(pix[:, :, 1].sum()),
        "sum_b": int(pix[:, :, 2].sum()),
    }


def png_stats_from_ids(ids: DataFrame, id_col: str = "media_id",
                       max_batch_bytes: int = 64 << 20) -> DataFrame:
    """ids -> synth PNG payload -> REAL compressed decode -> exact stats
    (see wav_stats_from_ids for the batching/shuffle notes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows, acc = [], 0
            for mid in batch[id_col].tolist():
                payload = synth_png(int(mid))
                acc += len(payload)
                rows.append({"media_id": int(mid),
                             **decode_png(payload)})
                if acc >= max_batch_bytes:
                    yield pd.DataFrame(rows)
                    rows, acc = [], 0
            if rows:
                yield pd.DataFrame(rows)

    from .parse import ensure_map_parallelism
    return ensure_map_parallelism(
        ids.select(F.col(id_col))).mapInPandas(run, PPM_STATS_SCHEMA)
