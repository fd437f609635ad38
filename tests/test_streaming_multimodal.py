"""Structured Streaming + multimodal plumbing tests."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from jsonld_streaming_parser_js_spark.operators import multimodal as mm
from jsonld_streaming_parser_js_spark.operators.parse import pages_to_quads
from jsonld_streaming_parser_js_spark.sources.pages import (
    CONTEXTS, pages_from_documents)
from jsonld_streaming_parser_js_spark.streaming import stream as strm

SF = "/root/testdata/sf0.001"


def test_streaming_quads_incremental(spark):
    workdir = tempfile.mkdtemp(prefix="kg_stream_")
    pages_dir = f"{workdir}/pages"
    out_dir = f"{workdir}/quads"
    ckpt = f"{workdir}/ckpt"
    try:
        pages = pages_from_documents(spark, SF).cache()
        batch1 = pages.where(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
        batch2 = pages.where(F.pmod(F.xxhash64("url"), F.lit(2)) == 1)

        batch1.write.mode("append").parquet(pages_dir)
        q = strm.stream_pages_to_quads(
            strm.read_pages_stream(spark, pages_dir), CONTEXTS)
        assert q.isStreaming
        strm.start_quads_sink(q, out_dir, ckpt).awaitTermination(120)
        n1 = spark.read.parquet(out_dir).where("error IS NULL").count()
        assert n1 > 0

        # new crawl files land; restart drains ONLY the new files
        batch2.write.mode("append").parquet(pages_dir)
        q2 = strm.stream_pages_to_quads(
            strm.read_pages_stream(spark, pages_dir), CONTEXTS)
        strm.start_quads_sink(q2, out_dir, ckpt).awaitTermination(120)

        got = set(map(tuple,
                      spark.read.parquet(out_dir)
                      .where("error IS NULL")
                      .select("subj", "pred", "obj", "graph").collect()))
        want = set(map(tuple,
                       pages_to_quads(pages, CONTEXTS)
                       .select("subj", "pred", "obj", "graph").collect()))
        assert got == want  # exactly-once: no dupes, nothing missing
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_streaming_windowed_rates(spark):
    workdir = tempfile.mkdtemp(prefix="kg_rate_")
    try:
        pages = pages_from_documents(spark, SF)
        pages.write.mode("append").parquet(f"{workdir}/pages")
        stream = strm.read_pages_stream(spark, f"{workdir}/pages")
        rates = strm.windowed_quad_rates(
            stream.select("url", "warc_ts"), window="1 hour")
        sink = (rates.writeStream.format("memory")
                .queryName("rates").outputMode("append")
                .trigger(availableNow=True).start())
        sink.awaitTermination(120)
        # append mode only emits closed windows; with a 2h watermark over a
        # bounded backlog the final windows stay open -> just assert the
        # plan runs as a valid watermark+window streaming agg
        assert spark.table("rates").columns == ["window_start", "n_quads"]
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_multimodal_features(spark):
    media = mm.synth_media(spark, 48)
    feats = mm.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 48
    assert all(len(r["feature"]) == 16 for r in rows)
    # deterministic: same payload -> same feature
    again = {r["media_id"]: r["feature"] for r in feats.collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in rows)
    stats = mm.media_stats(media).collect()
    assert {r["kind"] for r in stats} == {"image", "audio", "video"}


def test_multimodal_unknown_kind_raises():
    with pytest.raises(NotImplementedError):
        mm._decode_stub(b"xx", "hologram")


def test_stateful_running_site_totals(spark):
    from jsonld_streaming_parser_js_spark.streaming import stateful
    workdir = tempfile.mkdtemp(prefix="kg_state_")
    try:
        pages = pages_from_documents(spark, SF).cache()
        b1 = pages.where(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
        b2 = pages.where(F.pmod(F.xxhash64("url"), F.lit(2)) == 1)
        b1.write.mode("append").parquet(f"{workdir}/pages")

        def drain():
            stream = strm.read_pages_stream(spark, f"{workdir}/pages")
            parsed = strm.stream_pages_to_quads(stream, CONTEXTS)
            totals = stateful.running_site_totals(parsed)
            # parquet sink only supports append; update-mode stateful
            # output goes through foreachBatch (the standard pattern)
            def write_batch(df, _epoch):
                df.write.mode("append").parquet(f"{workdir}/totals")

            sink = (totals.writeStream
                    .foreachBatch(write_batch)
                    .option("checkpointLocation", f"{workdir}/ckpt")
                    .outputMode("update")
                    .trigger(availableNow=True).start())
            sink.awaitTermination(120)

        drain()
        b2.write.mode("append").parquet(f"{workdir}/pages")
        drain()  # state recovered from checkpoint, counts accumulate

        latest = (spark.read.parquet(f"{workdir}/totals")
                  .groupBy("site")
                  .agg(F.max("pages_total").alias("pages_total"),
                       F.max("quads_total").alias("quads_total")))
        got = {r["site"]: (r["pages_total"], r["quads_total"])
               for r in latest.collect()}
        # 7 sites; totals must equal the batch ground truth per site
        assert len(got) == 7
        truth = (pages_to_quads(pages, CONTEXTS).groupBy(
                     F.regexp_extract("url", r"^https?://([^/]+)/", 1)
                     .alias("site"))
                 .agg(F.countDistinct("url").alias("p"),
                      F.count("*").alias("q")).collect())
        for r in truth:
            assert got[r["site"]][0] == r["p"]
            assert got[r["site"]][1] == r["q"]
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
