"""Skew mitigation: salted equi-join for hot keys.

AQE's skew-join splitting (session.py enables it) handles most skew by
splitting oversized shuffle partitions, but it only works for
sort-merge joins after stats exist. When a key is SO hot that a single
key's rows exceed an executor (the power-law reality of user_id /
domain / token keys in web-scale corpora), the classic fix is salting:
fan the small side out by a salt factor and scatter the big side's hot
rows across salt buckets, so no single (key, salt) partition exceeds
1/n of the hot key's volume.

Correctness does not depend on the salt assignment — any big-side row
may take any salt value because the small side is replicated for all of
them — so the salt here is a deterministic hash (stable plans, stable
tests) rather than rand().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt_buckets: int = DEFAULT_SALT,
) -> DataFrame:
    """Equi-join ``big ⨝ small`` on ``key``, salted against hot keys.

    The big side is scattered into ``salt_buckets`` sub-keys by hashing
    its full row; the small side is exploded ×salt_buckets so every
    (key, salt) bucket finds its match. Shuffle volume for the small
    side grows by the salt factor — use for genuinely skewed joins
    where the small side is cheap to replicate (dimension-sized), and
    keep AQE skew-join for the mild cases.

    Supported ``how``: inner / left (big side preserved).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")

    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    big_salted = big.withColumn("_salt", salt)
    small_exploded = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    joined = big_salted.join(small_exploded, on=[key, "_salt"], how=how)
    return joined.drop("_salt")


# ---------------------------------------------------------------------------
# sj1 — the salted join as a registered, oracle-verified query
# ---------------------------------------------------------------------------

from pyspark.sql import SparkSession  # noqa: E402

from bc_proj3_spark.functions.numeric import DECIMAL_T  # noqa: E402
from bc_proj3_spark.plans.tables import table  # noqa: E402
from bc_proj3_spark.registry import register  # noqa: E402

_SJ1_ORACLE = """
WITH tot AS (
  SELECT user_id,
         CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS user_total
  FROM events GROUP BY user_id
)
SELECT e.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(e.value / t.user_total, 9) AS DECIMAL(28,10)))
            AS DOUBLE) AS share_sum
FROM events e JOIN tot t USING (user_id)
WHERE t.user_total > 0
GROUP BY e.event_type
"""


@register("sj1_salted_user_join", _SJ1_ORACLE)
def sj1_salted_user_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event share of its user's lifetime value, aggregated by event
    type — routed through :func:`salted_join` so the driver's value gate
    covers the hot-key rewrite itself (the oracle is the PLAIN join:
    salting must be a pure physical transformation, invisible in the
    result). user_id is the canonical power-law key at 100 TB; the
    per-user totals dimension is cheap to replicate ×salt.

    Determinism: per-user totals accumulate in exact decimal; the share
    ratio divides identical doubles in both engines and rounds to 9
    before the exact-decimal final sum."""
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    tot = (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast(DECIMAL_T))
            .cast("double")
            .alias("user_total")
        )
        .filter(F.col("user_total") > 0)
    )
    joined = salted_join(ev, tot, "user_id")
    share = F.round(F.col("value") / F.col("user_total"), 9)
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(share.cast(DECIMAL_T)).cast("double").alias("share_sum"),
        )
    )
