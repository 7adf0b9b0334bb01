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
