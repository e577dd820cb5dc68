"""Sequence packing for LLM pretraining pipelines.

Concat-and-chunk packing: documents are laid out end-to-end in a
deterministic global order and the token stream is cut into fixed-budget
training sequences (the standard pretraining data layout). Each document
gets its global token START offset; ``chunk_id = start // budget`` is the
training sequence its first token lands in, and a document *straddles*
when its last token falls in a later chunk.

Scale design: the global prefix sum is distributed — one range shuffle on
the order column (RangePartitioner assigns ascending key ranges to
ascending partition ids), a P-row per-partition-sum collect (P =
partition count, not row count), then a window cumsum per partition id
plus the broadcast partition offset. No global single-partition window,
no driver-side row loop; the only driver data is P longs. Verified plan
shape (.explain): range Exchange -> InMemoryRelation (one persist, two
passes: partial sums + main) -> hash Exchange on __pid -> Window. The
second exchange re-buckets by partition id because Catalyst cannot see
that range partitioning already aligns with __pid — it moves only the
narrow (order, tokens) projection, 16 bytes/row, with exactly P buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_offsets(df: DataFrame, token_col: str, order_col: str,
                        num_partitions: int = 32) -> DataFrame:
    """Add ``start`` — the exclusive global prefix sum of ``token_col``
    in ``order_col`` order. Distributed (see module docstring)."""
    d = (df.repartitionByRange(num_partitions, F.col(order_col))
           .withColumn("__pid", F.spark_partition_id())
           .persist())
    part = sorted(
        (r["__pid"], r["s"]) for r in
        d.groupBy("__pid").agg(F.sum(token_col).alias("s")).collect())
    offsets, running = {}, 0
    for pid, s in part:
        offsets[pid] = running
        running += int(s or 0)
    off_expr = F.coalesce(
        F.element_at(
            F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
            F.col("__pid")),
        F.lit(0)) if offsets else F.lit(0)
    w = (Window.partitionBy("__pid").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    return (d.withColumn(
                "start",
                (F.coalesce(F.sum(token_col).over(w), F.lit(0))
                 + off_expr).cast("long"))
            .drop("__pid"))


def pack_chunks(df: DataFrame, token_col: str, order_col: str,
                budget: int, num_partitions: int = 32) -> DataFrame:
    """Assign each document its training-sequence ``chunk_id`` (the chunk
    holding its first token) and a ``straddles`` flag (last token falls in
    a later chunk). ``budget`` = tokens per training sequence."""
    d = with_global_offsets(df, token_col, order_col, num_partitions)
    last = F.col("start") + F.greatest(F.col(token_col).cast("long"),
                                       F.lit(1)) - 1
    return (d.withColumn("chunk_id",
                         F.floor(F.col("start") / budget).cast("long"))
            .withColumn("straddles",
                        (F.floor(last / budget) > F.col("chunk_id"))
                        .cast("int")))
