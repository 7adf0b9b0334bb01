"""salted_join: equivalence with the plain join + salt distribution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bc_proj3_spark.operators.skew import salted_join


@pytest.fixture()
def skewed(spark):
    # 90% of fact rows hit one key — the hot-key regime
    big = spark.range(2000).select(
        F.when(F.col("id") < 1800, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    small = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("label")
    )
    return big, small


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_inner_equals_plain(spark, skewed):
    big, small = skewed
    plain = big.join(small, "k")
    salted = salted_join(big, small, "k")
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


def test_salted_left_keeps_unmatched(spark, skewed):
    big, small = skewed
    small_half = small.filter(F.col("k") < 25)
    plain = big.join(small_half, "k", "left")
    salted = salted_join(big, small_half, "k", how="left")
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


def test_hot_key_scatters_across_salts(spark, skewed):
    big, _ = skewed
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(16))
    n_buckets = (
        big.filter(F.col("k") == 7)
        .select(salt.alias("s"))
        .distinct()
        .count()
    )
    assert n_buckets >= 12  # hot key spread over (nearly) all 16 buckets
