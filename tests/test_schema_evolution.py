"""Schema evolution on the parquet warehouse: additive columns.

A long-lived table's schema grows (the reference's landing payloads
gain fields between API versions — e.g. the NYT multimedia columns its
bronze drops). Pin the engine's posture: old files stay readable, new
columns appear as NULL for old rows under mergeSchema, and the catalog
read path picks up the widened schema after an evolving append.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_ROWS = 50


def test_mergeschema_widens_and_backfills_null(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(SF_ROWS).select(
        F.col("id"), F.lit("a").alias("v")
    ).write.mode("overwrite").parquet(path)
    # additive evolution: later files carry an extra column
    spark.range(SF_ROWS, 2 * SF_ROWS).select(
        F.col("id"), F.lit("b").alias("v"), F.lit(1.5).alias("score")
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "v", "score"}
    assert merged.count() == 2 * SF_ROWS
    # old rows surface NULL for the new column; new rows keep values
    nulls = merged.filter(F.col("score").isNull()).count()
    assert nulls == SF_ROWS
    assert merged.filter(F.col("score") == 1.5).count() == SF_ROWS


def test_catalog_overwrite_adopts_new_schema(spark, tmp_path):
    from bc_proj3_spark.catalog import Catalog

    cat = Catalog(spark, warehouse_dir=str(tmp_path / "wh"))
    v1 = spark.range(10).select(F.col("id"), F.lit("x").alias("v"))
    cat.overwrite("silver", "evolving", v1)
    v2 = spark.range(10).select(
        F.col("id"), F.lit("y").alias("v"), F.lit(2).alias("extra")
    )
    cat.overwrite("silver", "evolving", v2)
    back = cat.read("silver", "evolving")
    assert set(back.columns) == {"id", "v", "extra"}
    assert back.filter(F.col("extra") == 2).count() == 10
