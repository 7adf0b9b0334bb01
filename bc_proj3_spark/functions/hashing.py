"""Cross-engine deterministic hashing — paired Spark + DuckDB builders.

MinHash / SimHash / LSH bucketing all need a family of hash functions
that BOTH engines compute identically so the DuckDB oracle can verify
the Spark plan value-for-value. Spark's ``xxhash64``/``hash`` have no
DuckDB twin, so the family is derived from md5 (identical lowercase-hex
semantics in both engines): seed-prefix the input, take the first 8 hex
chars, parse as an unsigned 32-bit integer.

32 bits is deliberate: the value always fits a BIGINT in both engines
(no unsigned-overflow divergence), and for dedup/LSH bucketing the
collision rate at 2^32 is negligible relative to band sizes.

Scale note: md5 here is one JVM-side codegen'd expression per call — no
Python workers. A production variant would swap in ``xxhash64`` (same
plan shape, faster hash) once cross-engine verification is done.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash32(col: Column, seed: int = 0) -> Column:
    """Deterministic 32-bit hash of a string column (seeded family)."""
    seeded = F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(seeded), 1, 8), 16, 10).cast("bigint")


def sql_hash32(expr: str, seed: int = 0) -> str:
    """DuckDB twin of :func:`hash32` (same bytes, same value)."""
    return f"(('0x' || substr(md5('{seed}:' || {expr}), 1, 8))::BIGINT)"


def hash60(col: Column) -> Column:
    """Deterministic 60-bit hash (first 15 md5 hex chars) of a string.

    Used as the compact integer join key for shingle/n-gram indexes:
    15 hex chars always fit a signed BIGINT in both engines, the
    shuffle key is 8 bytes instead of a multi-word string, and
    collisions at 2^60 are negligible for dedup purposes."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def sql_hash60(expr: str) -> str:
    """DuckDB twin of :func:`hash60` (same bytes, same value)."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"
