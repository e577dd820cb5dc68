"""Streaming exact-dedup and stream-stream interval join.

Two Structured Streaming operators a streaming ingest pipeline needs on
top of the reference's (batch-only) surface; each has an oracle-checked
batch twin in the gated registry:

- ``dedup_stream``: exact dedup within the watermark horizon via
  ``dropDuplicatesWithinWatermark`` — state holds one entry per key only
  until the watermark passes (bounded, unlike plain dropDuplicates which
  keeps all keys forever). Batch twin: queries/events.events_dedup_summary.
- ``click_attribution_stream``: purchases joined to the same user's
  clicks in the preceding horizon — the canonical watermarked
  stream-stream interval join; both sides' state is evicted once the
  watermark clears the join range. Batch twin:
  queries/events.events_click_attribution.

At 100 TB/day both operators are the standard shapes: state is bounded
by (horizon x key arrival rate), and the join shuffles on user_id so
skewed users are the thing to watch (AQE skew handling applies on the
batch twin; for streams, salt the key upstream if one user dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEDUP_KEYS = ["user_id", "event_type", "ts"]


def dedup_stream(stream: DataFrame, keys: list[str] = None,
                 ts_col: str = "ts", watermark: str = "1 hour") -> DataFrame:
    """Drop duplicate events (same ``keys``) arriving within the watermark
    horizon of each other. Exactly-once *within horizon*: a duplicate
    arriving later than the watermark delay is passed through (the
    horizon IS the dedup guarantee — size it to the source's redelivery
    window)."""
    keys = DEDUP_KEYS if keys is None else keys
    return (stream.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(keys))


def click_attribution_stream(events: DataFrame, horizon: str = "1 hour",
                             watermark: str = "2 hours") -> DataFrame:
    """Join each purchase to the same user's clicks in the preceding
    ``horizon``. ``events`` is ONE streaming frame (event_id/ts/user_id/
    event_type/value); both sides derive from it by filter, so a single
    readStream feeds both. Output: one row per (purchase, click) pair —
    aggregation is left to the consumer (chaining a second stateful op
    onto a stream-stream join needs Spark's multi-stateful support and an
    end-to-end watermark; the batch twin aggregates)."""
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("purchase_id"),
                         F.col("user_id").alias("p_user"),
                         F.col("ts").alias("p_ts"))
                 .withWatermark("p_ts", watermark))
    clicks = (events.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"),
                      F.col("user_id").alias("c_user"),
                      F.col("ts").alias("c_ts"))
              .withWatermark("c_ts", watermark))
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {horizon}")))
    return (purchases.join(clicks, cond, "inner")
            .select("purchase_id", F.col("p_user").alias("user_id"),
                    "click_id"))
