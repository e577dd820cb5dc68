"""Time-series operators Spark lacks natively: as-of join and
time-bucket gap-fill (the hypertable-rollup pattern).

Neither exists in the reference engine either (DataFusion exposes no ASOF
JOIN operator; DuckDB's is used as the test oracle) — these are
Spark-first extensions for event/feature pipelines.

Scale notes:
- ``asof_join`` is the union-tag formulation: one shuffle on the join key,
  a single ordered window pass, NO range-explosion join. At 100 TB the
  alternative (inequality join + per-left max) explodes to |L|x|matches|
  intermediates; this stays |L|+|R| rows end to end. Skewed keys behave
  like any window partition (AQE-visible single shuffle).
- ``gap_fill`` generates buckets with ``sequence()`` per group — the
  bucket frame is |groups| x |buckets| rows, independent of input size,
  and the join back to the aggregate is an equi-join on (group, bucket).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ASOF_TS = "__asof_ts"          # matched right-side timestamp (kept for
#                                tolerance filtering / staleness features)
_TAG = "__asof_tag"
_ORD = "__asof_ord"


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str, right_ts: str,
              right_cols: Optional[list[str]] = None,
              direction: str = "backward",
              tolerance: Optional[Column] = None,
              how: str = "left") -> DataFrame:
    """For every left row, attach the single right row with the greatest
    ``right_ts <= left_ts`` (backward; inclusive) — or the smallest
    ``right_ts >= left_ts`` for ``direction="forward"`` — per equality
    key ``on``. The pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` contract.

    ``right_cols``: right payload columns to carry (default: all non-key,
    non-ts columns). If several right rows share one (key, right_ts), the
    carried values come from the row that sorts last by the payload tuple
    — pre-aggregate the right side if that tie matters.
    ``tolerance``: max allowed |left_ts - right_ts| as an INTERVAL Column
    (e.g. ``F.expr("INTERVAL 1 HOUR")``); staler matches become NULL.
    ``how="inner"`` drops left rows with no match (``left`` keeps them).

    Output: every left column, then ``right_cols``, then ``ASOF_TS``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: bad direction {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in on and c != right_ts]
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"asof_join: right columns {sorted(overlap)} "
                         "collide with left; alias them first")

    # union-tag: right rows sort before left rows at equal timestamps so
    # an exactly-simultaneous right row is visible (inclusive semantics)
    lt = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias(_ORD), F.lit(1).alias(_TAG),
        F.lit(None).cast("timestamp").alias(ASOF_TS),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_cols])
    rt = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on],
        *[F.col(k) for k in on],
        F.col(right_ts).alias(_ORD), F.lit(0).alias(_TAG),
        F.col(right_ts).alias(ASOF_TS),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols])
    both = lt.unionByName(rt)

    if direction == "backward":
        w = (Window.partitionBy(*on).orderBy(F.asc(_ORD), F.asc(_TAG))
             .rowsBetween(Window.unboundedPreceding, 0))
    else:
        w = (Window.partitionBy(*on).orderBy(F.desc(_ORD), F.asc(_TAG))
             .rowsBetween(Window.unboundedPreceding, 0))

    carried = [F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
               .alias(f"__m_{c}") for c in right_cols]
    matched_ts = F.last(F.col(ASOF_TS), ignorenulls=True).over(w)

    out = (both.select("*", *carried, matched_ts.alias("__m_ts"))
           .filter(F.col(_TAG) == 1))

    keep_ts = F.col("__m_ts")
    if tolerance is not None:
        in_tol = (F.col(_ORD) - tolerance <= F.col("__m_ts")
                  if direction == "backward"
                  else F.col("__m_ts") <= F.col(_ORD) + tolerance)
        carried_out = [F.when(in_tol, F.col(f"__m_{c}")).alias(c)
                       for c in right_cols]
        keep_ts = F.when(in_tol, F.col("__m_ts"))
    else:
        carried_out = [F.col(f"__m_{c}").alias(c) for c in right_cols]

    out = out.select(*[F.col(c) for c in left.columns],
                     *carried_out, keep_ts.alias(ASOF_TS))
    if how == "inner":
        out = out.filter(F.col(ASOF_TS).isNotNull())
    return out


def gap_fill(agg: DataFrame, group_cols: list[str], bucket_col: str,
             step: Column, fill: Optional[dict] = None,
             bounds: Optional[DataFrame] = None) -> DataFrame:
    """Densify a bucketed aggregate: emit one row per (group, bucket) for
    EVERY bucket in the range, filling absent buckets from ``fill``
    (column -> literal; unlisted columns stay NULL) — the hypertable /
    time_bucket_gapfill rollup shape.

    ``agg``: output of a groupBy(group..., bucket).agg(...) — already
    small relative to the input. ``bounds``: optional 1-row DataFrame with
    ``__lo``/``__hi`` bucket bounds; defaults to agg's global min/max (one
    tiny extra aggregate, no driver collect). Buckets come from
    ``sequence(lo, hi, step)`` exploded per group: |groups| x |buckets|
    rows regardless of fact-table size."""
    if bounds is None:
        bounds = agg.agg(F.min(bucket_col).alias("__lo"),
                         F.max(bucket_col).alias("__hi"))
    groups = agg.select(*group_cols).distinct()
    frame = (groups.crossJoin(F.broadcast(bounds))
             .select(*group_cols,
                     F.explode(F.sequence(F.col("__lo"), F.col("__hi"),
                                          step)).alias(bucket_col)))
    out = frame.join(agg, [*group_cols, bucket_col], "left")
    if fill:
        out = out.select(
            *group_cols, bucket_col,
            *[F.coalesce(F.col(c), F.lit(fill[c])).alias(c) if c in fill
              else F.col(c)
              for c in agg.columns
              if c not in group_cols and c != bucket_col])
    return out
