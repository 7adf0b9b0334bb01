"""Z-order data layout: multi-column clustering for scan pruning.

The engine-side answer to Delta's ``OPTIMIZE ... ZORDER BY`` (the
reference platform's data-layout tool; its notebooks inherit it from
the table format rather than calling it — see catalog.py for the other
format-contract pieces). Parquet scans prune row groups / files by
min-max statistics, but stats only help when each file covers a NARROW
range of the filtered column. A single-column sort gives that for one
column; Z-ordering interleaves the bits of several rank-normalized
columns so every file is a small hyper-rectangle in the combined key
space — a box filter on ANY subset of the clustered columns touches
few files.

Scale shape (100 TB posture):

- rank normalization is ``percent_rank`` per column — a global sort per
  clustering column. That IS the layout cost (any clustering job pays
  it); it runs once at write time, amortized over every later scan.
- the rewrite is ``repartitionByRange`` on the interleaved key (range
  exchange with sampled bounds — balanced output files) plus
  ``sortWithinPartitions`` so row groups inside each file are clustered
  too (row-group-level stats pruning, not just file-level).
- the key is pure codegen bit arithmetic (shiftleft/bitwiseOR) — no
  UDF, no Python.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Bits of rank resolution per clustered column. 16 bits ≈ 65k distinct
#: rank buckets — far finer than any realistic file count, so the
#: interleaved key never aliases files together.
ZORDER_BITS = 16


def zorder_key(df: DataFrame, cols: list[str]) -> Column:
    """The interleaved Z-address of ``cols`` as a bigint column.

    Each column is rank-normalized to [0, 2^16) with ``percent_rank``
    (distribution-free: skewed or non-numeric-range columns cluster
    just as well), then bit i of every column's bucket id is woven into
    the output so no single column dominates the high bits."""
    buckets = [
        (
            F.percent_rank().over(Window.orderBy(c))
            * F.lit((1 << ZORDER_BITS) - 1)
        )
        .cast("bigint")
        .alias(f"_zb_{c}")
        for c in cols
    ]
    n = len(cols)
    parts = []
    for j, b in enumerate(buckets):
        for i in range(ZORDER_BITS):
            # bit i of column j lands at interleaved position i*n + j
            parts.append(
                F.shiftleft(
                    F.shiftright(b, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return reduce(lambda a, x: a.bitwiseOR(x), parts).alias("_zorder")


def zorder_layout(df: DataFrame, cols: list[str], n_files: int) -> DataFrame:
    """``df`` re-laid-out into ``n_files`` Z-ordered output partitions.

    Write the result with a plain parquet writer; each task produces
    one file covering a compact hyper-rectangle of ``cols``. Filters on
    any clustered column then prune most files via parquet min-max
    stats (and row groups within the survivors, thanks to the
    within-partition sort)."""
    key = zorder_key(df, cols)
    return (
        df.withColumn("_zorder", key)
        .repartitionByRange(n_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
    )


# ---------------------------------------------------------------------------
# Bucketed tables — co-located joins and aggregations without a shuffle
# ---------------------------------------------------------------------------


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a BUCKETED session-catalog table: rows are
    hash-distributed into ``n_buckets`` files by ``key`` at write time,
    and the bucket spec is recorded in the catalog so every later read
    exposes ``HashPartitioning(key, n_buckets)`` to the planner.

    This is the other half of the engine's layout story (zorder above
    clusters for SCAN pruning; bucketing pre-partitions for JOIN/AGG
    locality): two tables bucketed the same way join with ZERO
    exchange — at 100 TB the difference between re-shuffling both fact
    tables on every run and never shuffling them again after ingest.
    ``sortBy`` additionally orders rows inside each bucket file so a
    single-file bucket feeds sort-merge join without even a local sort.

    Uses ``saveAsTable`` (not the path catalog): Spark only honors
    bucket metadata through the session catalog — a bare parquet path
    read cannot carry it. ``df`` is repartitioned to the bucket count
    first so each bucket lands in ONE file (multi-file buckets would
    reintroduce per-read local sorts under sort-merge join)."""
    writer = (
        df.repartition(n_buckets, F.col(key))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(name)
