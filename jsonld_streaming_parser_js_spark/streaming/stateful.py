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


# ---------------------------------------------------------------------------
# Stateful streaming sessionization — the streaming twin of the batch
# events_sessionize query (same 30-min-gap semantics, same output schema),
# value-oracle-checked by the driver against the same DuckDB SQL.
# ---------------------------------------------------------------------------

SESSION_SCHEMA = ST.StructType([
    ST.StructField("user_id", ST.LongType()),
    ST.StructField("session_seq", ST.LongType()),
    ST.StructField("n_events", ST.LongType()),
    ST.StructField("session_start", ST.StringType()),
    ST.StructField("sum_value", ST.DoubleType()),
])

_SESS_STATE_SCHEMA = ST.StructType([
    ST.StructField("last_epoch", ST.LongType()),
    ST.StructField("session_seq", ST.LongType()),
    ST.StructField("start", ST.StringType()),
    ST.StructField("n_events", ST.LongType()),
    ST.StructField("sum_value", ST.DoubleType()),
])

SESSION_GAP_S = 1800
# a sentinel row (event_id = -1) closes the user's open session at
# end-of-input — the bounded-input analog of a state timeout
_SENTINEL_EVENT = -1
# flush='timeout' watermark-advancer pseudo-user; its open session is
# never emitted (filtered from the result) and is the one state row a
# bounded run leaves behind
_ADVANCER_USER = -1


def _fold_sessions(key0, pdfs: Iterator[pd.DataFrame], st: tuple,
                   handle_sentinel: bool) -> tuple[list[tuple], tuple]:
    """Shared gap-fold over one group's batch rows: closes sessions on a
    > SESSION_GAP_S gap, accumulates (n, sum) on the open one. The ONLY
    semantic divergence between the two flush modes is the sentinel
    branch, gated by ``handle_sentinel`` — both update fns call this so
    gap/tie-break/accumulation logic cannot drift between them."""
    last_epoch, seq, start, n, sv = st
    closed: list[tuple] = []
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["epoch", "event_id"])
    for epoch, event_id, start_str, value in zip(
            rows["epoch"].tolist(), rows["event_id"].tolist(),
            rows["start_str"].tolist(), rows["value"].tolist()):
        if handle_sentinel and event_id == _SENTINEL_EVENT:
            if n:
                closed.append((key0, seq, n, start, sv))
            last_epoch, start, n, sv = None, None, 0, 0.0
            continue
        if last_epoch is None or epoch - last_epoch > SESSION_GAP_S:
            if n:
                closed.append((key0, seq, n, start, sv))
            seq += 1
            start, n, sv = start_str, 0, 0.0
        last_epoch = epoch
        n += 1
        sv += float(value)
    return closed, (last_epoch, seq, start, n, sv)


def _sess_update(key, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    st = state.get if state.exists else (None, 0, None, 0, 0.0)
    closed, (last_epoch, seq, start, n, sv) = _fold_sessions(
        key[0], pdfs, st, handle_sentinel=True)
    if n:
        state.update((int(last_epoch), int(seq), start, int(n), float(sv)))
    else:
        state.remove()
    yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA])


def _sess_update_timeout(key, pdfs: Iterator[pd.DataFrame],
                         state: GroupState) -> Iterator[pd.DataFrame]:
    """Session update with EVENT-TIME TIMEOUT eviction — the unbounded-
    stream form of ``_sess_update``. No sentinel rows exist: a user's
    open tail session is evicted by the state store when the watermark
    passes ``last_event + gap`` (the group is then invoked with
    ``state.hasTimedOut`` and an empty batch). This is the production
    pattern for an endless crawl stream — state size stays O(open
    sessions) regardless of stream length, and eviction needs no
    end-of-input knowledge.
    """
    cols = [f.name for f in SESSION_SCHEMA]
    if state.hasTimedOut:
        last_epoch, seq, start, n, sv = state.get
        state.remove()
        yield pd.DataFrame([(key[0], seq, n, start, sv)], columns=cols)
        return
    st = state.get if state.exists else (None, 0, None, 0, 0.0)
    closed, (last_epoch, seq, start, n, sv) = _fold_sessions(
        key[0], pdfs, st, handle_sentinel=False)
    # a group invoked with data always ends with an open session (n >= 1)
    state.update((int(last_epoch), int(seq), start, int(n), float(sv)))
    # evict once the watermark proves no event can extend this session.
    # last_epoch >= this batch's min event time > watermark (slices are
    # ordered + delay 0), so the +gap timestamp is always legal to set.
    state.setTimeoutTimestamp((int(last_epoch) + SESSION_GAP_S + 1) * 1000)
    yield pd.DataFrame(closed, columns=cols)


def streaming_sessionize(spark, events_path: str, work_dir: str,
                         n_slices: int = 4, flush: str = "sentinel"
                         ) -> "DataFrame":
    """Run the stateful sessionization as a REAL file-source streaming job
    over bounded input, returning the final session table.

    Input is sliced into ``n_slices`` disjoint, increasing epoch ranges —
    one file per slice with increasing mtimes, so the file source
    (maxFilesPerTrigger=1) feeds them as ordered micro-batches and sessions
    genuinely straddle batch boundaries through the state store. The
    epoch/start-string precompute runs JVM-side so no timestamp ever
    crosses into Python (timezone-proof; matches the batch twin's NTZ
    epoch math).

    ``flush`` picks how open tail sessions are finalized:

    - ``'sentinel'``: a final file carries one sentinel row PER USER
      (O(users) rows); the update fn closes the session on seeing it.
      Simple, but only expressible on bounded input.
    - ``'timeout'``: the production pattern for an UNBOUNDED stream —
      ``GroupStateTimeout.EventTimeTimeout`` + a watermark on event time.
      A session's timeout fires once the watermark passes
      ``last_event + gap``, so idle sessions are evicted by the state
      store itself with no end-of-input knowledge. Stream-end flush needs
      only ONE O(1) watermark-advancer row (a synthetic user whose own
      never-emitted session is the single state row left behind),
      vs O(users) sentinels — at web scale the sentinel set would itself
      be a corpus-sized shuffle.

    Both modes are value-hash-checked against the same DuckDB oracle.
    """
    import os

    if flush not in ("sentinel", "timeout"):
        raise ValueError(f"unknown flush mode: {flush!r}")
    ev = spark.read.parquet(events_path)
    epoch = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    # wts: event time for the watermark, rebuilt from the NTZ epoch so
    # watermark arithmetic (epoch-based internally) is timezone-proof
    base = ev.select("user_id", "event_id", epoch.alias("epoch"),
                     F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
                     .alias("start_str"), "value",
                     F.timestamp_seconds(epoch).alias("wts"))
    lo, hi, advancer_clash, sentinel_clash = base.agg(
        F.min("epoch"), F.max("epoch"),
        F.max(F.when(F.col("user_id") == _ADVANCER_USER, 1)
              .otherwise(0)),
        F.max(F.when(F.col("event_id") == _SENTINEL_EVENT, 1)
              .otherwise(0))).first()
    if lo is None:
        return spark.createDataFrame([], SESSION_SCHEMA)
    if flush == "timeout" and advancer_clash:
        # a real user_id equal to the advancer's would have its sessions
        # silently dropped by the result filter — fail loudly instead
        raise ValueError(
            f"events contain user_id == {_ADVANCER_USER}, which collides "
            "with the watermark-advancer pseudo-user of flush='timeout'")
    if flush == "sentinel" and sentinel_clash:
        # a real event_id equal to the sentinel's would silently close
        # its user's session mid-stream and discard the row's value
        raise ValueError(
            f"events contain event_id == {_SENTINEL_EVENT}, which "
            "collides with the flush='sentinel' end-of-input marker")
    from .filesource import write_ordered_slices

    step = max((hi - lo) // n_slices + 1, 1)
    in_dir = os.path.join(work_dir, "input")
    flush_epoch = F.lit(int(hi + SESSION_GAP_S + 2)).cast("long")
    if flush == "sentinel":
        tail = (base.select("user_id").distinct()
                .select("user_id",
                        F.lit(_SENTINEL_EVENT).cast("long")
                        .alias("event_id"),
                        flush_epoch.alias("epoch"),
                        F.lit("").alias("start_str"),
                        F.lit(0.0).alias("value"),
                        F.timestamp_seconds(flush_epoch).alias("wts")))
    else:
        # one advancer row pushes the watermark past every real
        # session's last_event + gap; the final no-data micro-batch then
        # fires all pending event-time timeouts
        tail = spark.range(1).select(
            F.lit(_ADVANCER_USER).cast("long").alias("user_id"),
            F.lit(0).cast("long").alias("event_id"),
            flush_epoch.alias("epoch"),
            F.lit("").alias("start_str"),
            F.lit(0.0).alias("value"),
            F.timestamp_seconds(flush_epoch).alias("wts"))
    write_ordered_slices(
        [base.where((F.col("epoch") >= lo + i * step)
                    & (F.col("epoch") < lo + (i + 1) * step))
         for i in range(n_slices)] + [tail],
        work_dir, in_dir)

    stream = (spark.readStream.schema(base.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(in_dir))
    if flush == "sentinel":
        sessions = stream.groupBy("user_id").applyInPandasWithState(
            _sess_update, SESSION_SCHEMA, _SESS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout)
    else:
        sessions = (stream.withWatermark("wts", "0 seconds")
                    .groupBy("user_id").applyInPandasWithState(
                        _sess_update_timeout, SESSION_SCHEMA,
                        _SESS_STATE_SCHEMA,
                        outputMode="update",
                        timeoutConf=GroupStateTimeout.EventTimeTimeout))
    out_dir = os.path.join(work_dir, "out")

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = (sessions.writeStream.foreachBatch(sink)
         .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
         .trigger(availableNow=True)
         .outputMode("update")
         .start())
    q.awaitTermination()
    # round in Spark SQL (HALF_UP), matching the batch twin's F.round and
    # the DuckDB oracle — Python round() is half-to-even and diverges at
    # .xx5 tie sums
    out = (spark.read.parquet(out_dir)
           .withColumn("sum_value", F.round("sum_value", 2)))
    if flush == "timeout":
        from pyspark.sql import Window

        # A mid-stream timeout removes the group's state, so the in-stream
        # seq counter restarts when an idle user returns — sessions are
        # therefore identified by (user_id, session_start), the natural
        # key on an unbounded stream, and the bounded harness assigns
        # session_seq from start order (unique per user: sessions are
        # disjoint time ranges). The advancer's session can never emit
        # (its timeout exceeds the final watermark) — the filter is
        # belt-and-braces.
        w = Window.partitionBy("user_id").orderBy("session_start")
        out = (out.where(F.col("user_id") != _ADVANCER_USER)
               .withColumn("session_seq",
                           F.row_number().over(w).cast("long")))
    return out
