"""Z-order layout (operators/layout.py): clustering quality + pruning.

The measurable promise of Z-ordering: after the rewrite, a box filter
on the clustered columns finds all its matches in FEW files, so parquet
min-max pruning skips the rest. Asserted two ways — matching rows
concentrate in a small fraction of files (vs. scattered everywhere in
an unclustered layout of the same file count), and the per-file min-max
spans of each clustered column shrink.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bc_proj3_spark.operators.layout import zorder_layout
from bc_proj3_spark.plans.tables import table

SF = "/root/testdata/sf0.01"
N_FILES = 16


def _files_with_matches(spark, path, predicate):
    df = spark.read.parquet(path).filter(predicate)
    return df.select(
        F.input_file_name().alias("f")
    ).distinct().count()


def test_box_filter_touches_few_files(spark, tmp_path):
    li = table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    naive = str(tmp_path / "naive")
    zord = str(tmp_path / "zorder")
    # naive: the arrival layout (round-robin of the scan order)
    li.repartition(N_FILES).write.mode("overwrite").parquet(naive)
    zorder_layout(li, ["l_partkey", "l_suppkey"], N_FILES).write.mode(
        "overwrite"
    ).parquet(zord)

    # same total rows either way
    assert (
        spark.read.parquet(zord).count() == spark.read.parquet(naive).count()
    )

    stats = li.agg(
        F.max("l_partkey").alias("mp"), F.max("l_suppkey").alias("ms")
    ).first()
    # ~10% box on each clustered dimension
    pred = (F.col("l_partkey") <= int(stats.mp * 0.1)) & (
        F.col("l_suppkey") <= int(stats.ms * 0.1)
    )

    n_naive = _files_with_matches(spark, naive, pred)
    n_zord = _files_with_matches(spark, zord, pred)
    # round-robin scatters matches across ~every file; z-order must
    # concentrate them into a small corner of the file grid
    assert n_naive >= N_FILES * 0.75, f"naive layout unexpectedly clustered ({n_naive})"
    assert n_zord <= math.ceil(N_FILES * 0.25), (
        f"z-order box filter touched {n_zord}/{N_FILES} files"
    )


def test_per_file_ranges_shrink(spark, tmp_path):
    li = table(spark, SF, "lineitem").select("l_partkey", "l_suppkey")
    zord = str(tmp_path / "zorder")
    zorder_layout(li, ["l_partkey", "l_suppkey"], N_FILES).write.mode(
        "overwrite"
    ).parquet(zord)

    spans = (
        spark.read.parquet(zord)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("l_partkey") - F.min("l_partkey")).alias("span_p"),
            (F.max("l_suppkey") - F.min("l_suppkey")).alias("span_s"),
        )
        .agg(F.avg("span_p").alias("ap"), F.avg("span_s").alias("as_"))
        .first()
    )
    full = li.agg(
        (F.max("l_partkey") - F.min("l_partkey")).alias("fp"),
        (F.max("l_suppkey") - F.min("l_suppkey")).alias("fs"),
    ).first()
    # each file should cover well under half of each dimension's range
    # (a 16-file 2-D Z-layout is a ~4x4 grid → ~1/4 span per dimension,
    # plus rank-vs-value nonlinearity slack)
    assert spans.ap < full.fp * 0.5
    assert spans.as_ < full.fs * 0.5
