"""Loaders for the driver-generated testdata tables.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``{sf_dir}/{name}.parquet``.

Reading is always a plain ``spark.read.parquet`` scan: column pruning and
predicate pushdown then reach the parquet reader for free (check via
``df.explain`` → ``ReadSchema`` / ``PushedFilters``). At 100 TB these
would be partitioned/bucketed tables registered in a real catalog; the
loader keeps the access path identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _normalize_event_ts(df)
    return df


def _normalize_event_ts(df: DataFrame) -> DataFrame:
    """events.parquet stores ``ts`` as INT64 TIMESTAMP(NANOS), which Spark 4
    cannot read as a timestamp (PARQUET_TYPE_ILLEGAL). With
    ``spark.sql.legacy.parquet.nanosAsLong=true`` (set by
    session.apply_runtime_conf) the column arrives as long nanoseconds;
    truncate to microseconds exactly like DuckDB does (``ts div 1000`` —
    integer floor division, then ``timestamp_micros``) so value hashes
    agree between both engines. A no-op if ``ts`` already reads as a
    timestamp (e.g. future Spark versions lifting the restriction)."""
    field = next((f for f in df.schema.fields if f.name == "ts"), None)
    if field is not None and isinstance(field.dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}
