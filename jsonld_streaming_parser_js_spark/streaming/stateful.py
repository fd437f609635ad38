"""Custom stateful streaming operator via ``applyInPandasWithState``.

Running per-site extraction totals: as crawl files stream in, each site
(url host) keeps cumulative (pages, quads, errors) state and emits an
updated row per micro-batch. State lives in the state store (checkpointed,
recoverable), so totals survive restarts — the pattern for any custom
accumulator the built-in windowed aggs can't express (e.g. per-site quota
enforcement, adaptive crawl throttling).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as ST

OUTPUT_SCHEMA = ST.StructType([
    ST.StructField("site", ST.StringType()),
    ST.StructField("pages_total", ST.LongType()),
    ST.StructField("quads_total", ST.LongType()),
    ST.StructField("errors_total", ST.LongType()),
])

STATE_SCHEMA = ST.StructType([
    ST.StructField("pages", ST.LongType()),
    ST.StructField("quads", ST.LongType()),
    ST.StructField("errors", ST.LongType()),
])


def _update(key, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    pages, quads, errors = state.get if state.exists else (0, 0, 0)
    seen_urls: set = set()  # a url's rows can straddle Arrow chunks
    for pdf in pdfs:
        seen_urls.update(pdf["url"].tolist())
        quads += int(pdf["is_quad"].sum())
        errors += int((~pdf["is_quad"]).sum())
    pages += len(seen_urls)
    state.update((int(pages), int(quads), int(errors)))
    yield pd.DataFrame({"site": [key[0]], "pages_total": [pages],
                        "quads_total": [quads], "errors_total": [errors]})


def running_site_totals(parsed_stream: DataFrame) -> DataFrame:
    """parsed rows stream (url, ..., error) -> per-site cumulative totals.

    ``site`` = url host. Grouped state keyed by site: small key space, so
    the state store stays tiny no matter the corpus size.
    """
    keyed = parsed_stream.select(
        F.regexp_extract("url", r"^https?://([^/]+)/", 1).alias("site"),
        "url",
        F.col("error").isNull().alias("is_quad"))
    return keyed.groupBy("site").applyInPandasWithState(
        _update, OUTPUT_SCHEMA, STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout)
