"""Distributed JSON-LD -> quads parse stage.

One ``mapInPandas`` UDTF applies the pure-Python kernel
(:mod:`..functions.parser`) to each extracted block: 1 block row in ->
n quad rows out (the reference's whole Transform-stream pipeline,
``/root/reference/lib/JsonLdParser.ts``, collapsed into a per-row kernel).

Scale design:
- **No shuffle**: extract -> parse is a narrow chain; Catalyst fuses it into
  one stage over the pages scan.
- **Broadcast context cache**: remote ``@context`` docs are prefetched on
  the driver and shipped once per executor via ``sparkContext.broadcast``
  (north-star requirement; reference fetches per-stream via
  IDocumentLoader, ``lib/JsonLdParser.ts:633-636``).
- **Arrow batches**: quad rows are yielded per input batch, bounding worker
  memory by batch size x max quads/doc, independent of partition size.
- **Error channel**: malformed blocks produce an ``error`` row with empty
  quad columns instead of failing the task (reference's strictValues=false
  analog) — at 10^12 documents, a 1e-6 malformation rate would otherwise
  kill every job.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as ST

from ..functions.parser import parse_block

QUAD_SCHEMA = ST.StructType([
    ST.StructField("url", ST.StringType()),
    ST.StructField("blk", ST.IntegerType()),
    ST.StructField("subj", ST.StringType()),
    ST.StructField("pred", ST.StringType()),
    ST.StructField("obj", ST.StringType()),
    ST.StructField("graph", ST.StringType()),
    ST.StructField("error", ST.StringType()),
])


def parse_blocks(blocks: DataFrame, ctx_cache: dict | None = None,
                 rdf_direction: str | None = None) -> DataFrame:
    """blocks(url, blk, block) -> raw rows(url, blk, subj, pred, obj, graph,
    error). Quad rows have error NULL; failed blocks yield exactly one row
    with error set and NULL terms."""
    spark = blocks.sparkSession
    bc = spark.sparkContext.broadcast(ctx_cache or {})

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache = bc.value
        for batch in batches:
            out: dict[str, list] = {k: [] for k in
                                    ("url", "blk", "subj", "pred", "obj",
                                     "graph", "error")}
            for url, blk, block in zip(batch["url"], batch["blk"],
                                       batch["block"]):
                quads, err = parse_block(block, url, int(blk), cache,
                                         rdf_direction)
                if err is not None:
                    out["url"].append(url)
                    out["blk"].append(blk)
                    out["subj"].append(None)
                    out["pred"].append(None)
                    out["obj"].append(None)
                    out["graph"].append(None)
                    out["error"].append(err)
                    continue
                for s, p, o, g in quads:
                    out["url"].append(url)
                    out["blk"].append(blk)
                    out["subj"].append(s)
                    out["pred"].append(p)
                    out["obj"].append(o)
                    out["graph"].append(g)
                    out["error"].append(None)
            yield pd.DataFrame(out)

    return blocks.mapInPandas(run, QUAD_SCHEMA)


def quads_only(parsed: DataFrame) -> DataFrame:
    return (parsed.where(F.col("error").isNull())
            .select("url", "blk", "subj", "pred", "obj", "graph"))


def errors_only(parsed: DataFrame) -> DataFrame:
    return (parsed.where(F.col("error").isNotNull())
            .select("url", "blk", "error"))


def pages_to_quads(pages: DataFrame, ctx_cache: dict | None = None,
                   rdf_direction: str | None = None) -> DataFrame:
    """pages -> deduplicated quads (JSON-LD set semantics: the W3C
    comparison is dataset isomorphism, so duplicate emissions collapse).

    The dropDuplicates shuffle hashes on all 6 columns — uniformly
    distributed (urls/subjects are high-cardinality), so no skew handling
    is needed here; hot-predicate skew only matters for *joins/aggs keyed
    on pred*, which use salting (see operators/stats.py).
    """
    from .extract import extract_blocks
    parsed = parse_blocks(extract_blocks(pages), ctx_cache, rdf_direction)
    return quads_only(parsed).dropDuplicates(
        ["url", "blk", "subj", "pred", "obj", "graph"])
