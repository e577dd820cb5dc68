"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState`` — the pattern for operators Spark's built-in
streaming aggregates can't express (session windows with per-key custom
logic, running feature state, online dedup caches).

State per user: (session_start_us, last_seen_us, n_events, total_value).
An event more than ``gap`` after last_seen closes the session and emits a
row; state timeout emits the trailing session when the user goes quiet.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("session_start_us", T.LongType(), False),
    T.StructField("session_end_us", T.LongType(), False),
    T.StructField("n_events", T.LongType(), False),
    T.StructField("total_value", T.DoubleType(), True),
])

STATE_SCHEMA = T.StructType([
    T.StructField("session_start_us", T.LongType(), True),
    T.StructField("last_seen_us", T.LongType(), True),
    T.StructField("n_events", T.LongType(), True),
    T.StructField("total_value", T.DoubleType(), True),
])

GAP_US_DEFAULT = 30 * 60 * 1_000_000  # 30 min


def _sessionize_fn(gap_us: int):
    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start, last, n, tot = state.get
                state.remove()
                yield pd.DataFrame([{
                    "user_id": user_id, "session_start_us": start,
                    "session_end_us": last, "n_events": n,
                    "total_value": tot}])
            return

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts_us")
        if state.exists:
            start, last, n, tot = state.get
        else:
            start = last = None
            n, tot = 0, 0.0

        out = []
        for ts_us, value in zip(rows["ts_us"], rows["value"]):
            ts_us = int(ts_us)
            if last is not None and ts_us - last > gap_us:
                out.append({"user_id": user_id, "session_start_us": start,
                            "session_end_us": last, "n_events": n,
                            "total_value": tot})
                start, n, tot = ts_us, 0, 0.0
            if start is None:
                start = ts_us
            last = ts_us
            n += 1
            tot += float(value) if value == value else 0.0  # NaN-safe

        state.update((start, last, n, tot))
        state.setTimeoutDuration(60_000)
        if out:
            yield pd.DataFrame(out)

    return fn


def sessionize_stream(events: DataFrame,
                      gap_us: int = GAP_US_DEFAULT) -> DataFrame:
    """Streaming sessionization: input stream needs user_id/ts_us/value.
    Emits closed sessions; open sessions flush on processing-time timeout."""
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_fn(gap_us),
                outputStructType=SESSION_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))


def sessionize_batch(events: DataFrame,
                     gap_us: int = GAP_US_DEFAULT) -> DataFrame:
    """Batch twin with identical semantics (closed + trailing sessions),
    expressed with window functions — used to cross-check the streaming
    operator and as the backfill path."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    w = Window.partitionBy("user_id").orderBy("ts_us")
    marked = events.withColumn(
        "new_session",
        (F.col("ts_us") - F.lag("ts_us").over(w) > gap_us).cast("int"))
    sessions = marked.withColumn(
        "session_id",
        F.sum(F.coalesce(F.col("new_session"), F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return (sessions.groupBy("user_id", "session_id")
            .agg(F.min("ts_us").alias("session_start_us"),
                 F.max("ts_us").alias("session_end_us"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("total_value"))
            .drop("session_id"))
