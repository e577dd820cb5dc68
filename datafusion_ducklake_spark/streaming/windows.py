"""Streaming windowed aggregation with watermarks over the events stream.

Batch twin: queries/events.events_hourly_rollup. The streaming variant
uses F.window tumbling windows + a watermark so late events are folded in
until the watermark passes, then state is evicted — the standard
Structured Streaming pattern sized for unbounded 100 TB/day streams
(state is bounded by (watermark horizon / window) x key cardinality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windows per event_type with late-data tolerance.
    ``events`` must be a streaming DataFrame with columns ts/event_type/
    value/user_id (e.g. from readStream on an events directory)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("total_value"),
                 F.approx_count_distinct("user_id").alias("approx_users"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n_events", "total_value", "approx_users"))
