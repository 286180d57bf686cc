"""Streaming event analytics: watermarked windows, sessionization,
custom stateful ops (SURVEY.md §2.9 extension).

These are the streaming twins of the batch queries in
``suite/relational.py`` (events_tumbling_window, events_sessionize) —
same aggregates, same session-gap semantics, expressed against an
unbounded source with late-data handling:

- tumbling window + watermark: state is bounded by the watermark
  horizon; late events inside the horizon update their window, later
  ones are dropped — the scale answer to "the batch job re-reads
  everything".
- session windows via the built-in ``session_window`` (gap-merged,
  watermark-evicted) — Spark's native form of the reference-era
  per-user gap logic.
- ``sessionize_with_state``: the same sessionization through
  ``applyInPandasWithState`` (GroupState) for when session output must
  be enriched beyond what session_window exposes — the template for
  custom stateful operators (timeout-based eviction, per-key state).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800  # matches suite/relational.py batch twin


def read_event_stream(
    spark, parquet_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over an events parquet directory (the test
    harness's stand-in for Kafka — swap ``format`` for a broker source
    in production; the downstream plans are source-agnostic)."""
    schema = spark.read.parquet(parquet_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(parquet_dir)
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window aggregation (append-able output).

    State per (window, event_type); bounded by the watermark horizon.
    """
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("sum_value_cents"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value_cents",
            "approx_users",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Built-in gap-based session windows per user (merged as events
    arrive, evicted past the watermark)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("session_id"),
        )
        .select(
            "user_id",
            "session_id",
            "n_events",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
        )
    )


_STATE_SCHEMA = "last_ts_s long, session_id long, n_events long, start_s long"
_OUT_SCHEMA = (
    "user_id long, session_id long, n_events long, duration_s long, closed boolean"
)


def _sessionize_fn(key, pdf_iter, state: GroupState, timeouts: bool = True):
    """Per-user session accumulator: emits a closed-session row when a
    gap > SESSION_GAP_S arrives or the state times out; otherwise
    keeps the open session in GroupState. ``timeouts=False`` skips
    timeout registration (required when timeoutConf is NoTimeout —
    Spark rejects setTimeoutDuration there)."""
    (user_id,) = key
    if state.hasTimedOut:
        last_ts, sid, n, start = state.get
        state.remove()
        yield pd.DataFrame(
            [[user_id, sid, n, last_ts - start, True]],
            columns=["user_id", "session_id", "n_events", "duration_s", "closed"],
        )
        return

    rows = []
    if state.exists:
        last_ts, sid, n, start = state.get
    else:
        last_ts = sid = n = start = None
    # Concatenate ALL Arrow chunks before sorting: the runtime splits a
    # group's micro-batch rows at arrow.maxRecordsPerBatch, and sorting
    # each chunk independently while last_ts carries across chunks
    # would gap-split on out-of-order chunk boundaries for users with
    # more events per batch than one chunk holds.
    chunks = [pdf for pdf in pdf_iter if not pdf.empty]
    if chunks:
        whole = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else chunks[0]
        ).sort_values(["ts_s", "event_id"])
        for ts_s, event_id in zip(whole["ts_s"], whole["event_id"]):
            ts_s = int(ts_s)
            if last_ts is None:
                sid, n, start = int(event_id), 1, ts_s
            elif ts_s - last_ts > SESSION_GAP_S:
                rows.append([user_id, sid, n, last_ts - start, True])
                sid, n, start = int(event_id), 1, ts_s
            else:
                n += 1
                # session id = MIN event id in the session (same rule
                # as the batch gaps-and-islands twin), not first-by-ts
                sid = min(sid, int(event_id))
            last_ts = ts_s
    if last_ts is not None:
        state.update((last_ts, sid, n, start))
        if timeouts:
            state.setTimeoutDuration(SESSION_GAP_S * 1000)
        rows.append([user_id, sid, n, last_ts - start, False])
    yield pd.DataFrame(
        rows, columns=["user_id", "session_id", "n_events", "duration_s", "closed"]
    )


def _sessionize_fn_no_timeout(key, pdf_iter, state: GroupState):
    """Module-level wrapper (NOT a closure/global: cloudpickle ships
    package functions by reference, so a driver-side flag would not
    reach the re-imported module on the Python workers)."""
    return _sessionize_fn(key, pdf_iter, state, timeouts=False)


def sessionize_with_state(
    events: DataFrame, timeouts: bool = True
) -> DataFrame:
    """Custom stateful sessionization via applyInPandasWithState.

    Input: streaming events(ts, event_id, user_id, ...). Output rows
    carry ``closed`` — False for in-progress snapshots (update mode),
    True when the 30-min gap or the processing-time timeout closes the
    session. Arrow-batched; state is one tuple per live user.

    ``timeouts=False`` skips processing-time timeout registration
    (GroupStateTimeout.NoTimeout). That is the right mode for an
    ``availableNow`` drain: a registered ProcessingTimeTimeout makes
    ``shouldRunAnotherBatch`` true until the timeout FIRES in real
    wall-clock time, so a drain whose final batch leaves any live
    state (e.g. the gated query's sentinel-started sessions) spins
    zero-row ~0.5 s micro-batches for SESSION_GAP_S = 30 min before
    terminating (measured r10: 500+ empty epochs; r9's ignored
    awaitTermination return masked it — results were complete, the
    query just never stopped). Continuous deployments keep
    ``timeouts=True`` so idle sessions close without a closing event.
    """
    from ..session import ship_package

    # cloudpickle serializes _sessionize_fn by module reference; the
    # Python workers must be able to import the package regardless of
    # the driver's cwd
    ship_package(events.sparkSession)
    prepared = events.select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("ts_s"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn if timeouts else _sessionize_fn_no_timeout,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeouts
            else GroupStateTimeout.NoTimeout
        ),
    )
