"""Dense global row numbering at scale.

Training-data pipelines constantly need a dense 0..N-1 (or 1..N) row id —
for sharding, shuffle-free sample alignment, example indexing into packed
training files. The two obvious Spark spellings both break at 100 TB:
``monotonically_increasing_id`` is NOT dense (partition-striped gaps), and
``row_number() OVER (ORDER BY ...)`` with no PARTITION BY funnels the
entire table through ONE task.

:func:`dense_row_ids` is the distributed answer — the DataFrame analogue
of RDD ``zipWithIndex``: range-partition on the order key, number rows
locally per partition, then shift each partition by the total count of all
partitions before it. Total order comes from the range exchange; only the
per-partition COUNTS (``n_partitions`` longs) ever touch the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Above this many range partitions, per-partition offsets are shipped as a
# broadcast-joined frame instead of a create_map literal (which would be
# O(n_partitions) expression nodes on the driver).
_LITERAL_MAP_MAX_PARTITIONS = 4096


def dense_row_ids(
    df: DataFrame,
    order_cols: list[str],
    n_partitions: int | None = None,
    id_col: str = "row_id",
) -> DataFrame:
    """Assign a dense 1..N ``id_col`` equal to
    ``row_number() OVER (ORDER BY order_cols)`` — without a single-task
    global sort.

    Plan: ``repartitionByRange(order_cols)`` (the same sampled range
    exchange any global sort uses) + ``sortWithinPartitions``, pinned with
    ``localCheckpoint`` so the partition layout is frozen across the two
    passes; pass 1 collects per-partition row counts (bounded:
    ``n_partitions`` longs); pass 2 numbers rows with a PER-PARTITION
    window (each task handles exactly one bounded range partition — no
    global funnel) and adds the partition's cumulative offset via a
    literal map (small partition counts) or a broadcast-joined offsets
    frame (above ``_LITERAL_MAP_MAX_PARTITIONS``, keeping the driver-side
    expression tree bounded).

    ``order_cols`` should be a unique key for a deterministic result (ties
    are broken arbitrarily-but-consistently within the checkpointed
    layout). The id is exact and dense regardless of where the sampled
    range boundaries fell.
    """
    if not order_cols:
        raise ValueError("dense_row_ids needs at least one order column")
    parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()  # freeze sampled boundaries across the 2 passes
    )
    counts = sorted(
        (r["_pid"], r["n"])
        for r in parted.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    if len(offsets) > _LITERAL_MAP_MAX_PARTITIONS:
        # A create_map literal is O(n_partitions) expression nodes ON THE
        # DRIVER — at 100 TB with ~1e5 range partitions that is a ~2e5-node
        # tree through analysis/codegen. Above the threshold, ship the
        # offsets as a broadcast-joined two-column frame instead: same
        # result, bounded expression tree, one broadcast of n_partitions
        # longs.
        offsets_df = df.sparkSession.createDataFrame(
            list(offsets.items()), "_pid int, _offset long"
        )
        return (
            parted.withColumn("_rn", F.row_number().over(w))
            .join(F.broadcast(offsets_df), "_pid")
            .withColumn(id_col, (F.col("_rn") + F.col("_offset")).cast("long"))
            .drop("_pid", "_rn", "_offset")
        )
    offset_expr = F.coalesce(
        *(
            [
                F.create_map(
                    *[F.lit(x) for kv in offsets.items() for x in kv]
                )[F.col("_pid")].cast("long")
            ]
            if offsets
            else []
        ),
        F.lit(0).cast("long"),
    )
    return (
        parted.withColumn(
            id_col, (F.row_number().over(w) + offset_expr).cast("long")
        )
        .drop("_pid")
    )
