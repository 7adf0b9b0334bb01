"""CSV ingest robustness: schema'd reads over malformed input.

The reference's extract layer lands clean JSONL; a production bronze
layer also meets malformed delimited files (truncated uploads, quoting
bugs, schema drift). These tests pin Spark's three malformed-record
contracts — PERMISSIVE (quarantine column), DROPMALFORMED (silent
skip), FAILFAST (hard error) — because a pipeline that switches mode
must know exactly what each does with the same bad file. All reads use
an explicit schema: schema inference over 100 TB of CSV is a full extra
scan, never acceptable at scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_GOOD = ["1,alpha,10", "2,beta,20", "4,delta,40"]
_BAD = ["3,gamma,notanumber", "5,epsilon"]  # type error; missing column


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "feed.csv"
    p.write_text("\n".join(_GOOD + _BAD) + "\n")
    return str(p)


def _schema(with_corrupt: bool = False) -> StructType:
    fields = [
        StructField("id", IntegerType()),
        StructField("name", StringType()),
        StructField("amount", IntegerType()),
    ]
    if with_corrupt:
        fields.append(StructField("_corrupt_record", StringType()))
    return StructType(fields)


def test_permissive_quarantines_malformed_rows(spark, csv_path):
    """PERMISSIVE keeps every input row; malformed ones carry their raw
    text in the corrupt-record column (the quarantine a bronze layer
    writes to a reject table for replay) and NULL out unparseable
    fields."""
    df = (
        spark.read.schema(_schema(with_corrupt=True))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(csv_path)
        .cache()
    )
    rows = {r["id"]: r for r in df.collect()}
    assert df.count() == 5
    bad = [r for r in df.collect() if r["_corrupt_record"] is not None]
    assert sorted(r["_corrupt_record"] for r in bad) == sorted(_BAD)
    assert rows[3]["amount"] is None  # unparseable field nulled
    assert rows[1]["amount"] == 10  # clean rows untouched
    df.unpersist()


def test_dropmalformed_keeps_only_clean_rows(spark, csv_path):
    df = (
        spark.read.schema(_schema())
        .option("mode", "DROPMALFORMED")
        .csv(csv_path)
    )
    got = sorted((r["id"], r["name"], r["amount"]) for r in df.collect())
    assert got == [(1, "alpha", 10), (2, "beta", 20), (4, "delta", 40)]


def test_failfast_raises_on_first_malformed_row(spark, csv_path):
    from pyspark.errors.exceptions.captured import SparkUpgradeException  # noqa: F401
    from py4j.protocol import Py4JJavaError  # noqa: F401

    df = spark.read.schema(_schema()).option("mode", "FAILFAST").csv(csv_path)
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)
