"""Python Data Source API wrapper over the connector transports.

Pins the Spark-native extract contract (io/pyds.py): partition-per-day
batch reads, run_date filter pushdown pruning fetch work, streaming
replay with one day per microbatch, and record parity with the landed
JSONL shape the bronze layer reads.
"""

from __future__ import annotations

import json

import pytest

from bc_proj3_spark.io import pyds, sources

DATES = ["20240101", "20240102", "20240103"]


@pytest.fixture(scope="module")
def feed(spark):
    pyds.register(spark)
    return spark


def _read(spark, source, dates=DATES):
    return (
        spark.read.format("bcproj3_feed")
        .option("source", source)
        .option("run_dates", ",".join(dates))
        .load()
    )


def test_batch_read_schema_and_rows(feed):
    df = _read(feed, "scholar")
    assert [f.name for f in df.schema.fields] == ["run_date", "stream", "position", "record"]
    rows = df.collect()
    # scholar: whole payload = ONE record per day (source.py:72-80 parity)
    assert len(rows) == len(DATES)
    assert {r.run_date for r in rows} == set(DATES)
    assert {r.stream for r in rows} == {"google_scholar"}


def test_partition_per_run_date(feed):
    # fetch parallelism = number of days: one input partition each
    df = _read(feed, "arxiv")
    assert df.rdd.getNumPartitions() == len(DATES)


def test_record_parity_with_transport(feed):
    df = _read(feed, "nyt", dates=["20240105"])
    got = sorted(json.loads(r.record)["_id"] for r in df.collect())
    want = sorted(d["_id"] for d in sources.nyt_transport("20240105")["docs"])
    assert got == want


def test_rundate_pushdown_prunes_partitions(feed):
    from pyspark.sql import functions as F

    df = _read(feed, "arxiv").filter(F.col("run_date") == "20240102")
    # pruning happens in pushFilters -> partitions(): ONE task, not three
    assert df.rdd.getNumPartitions() == 1
    assert {r.run_date for r in df.collect()} == {"20240102"}

    rng = _read(feed, "arxiv").filter(F.col("run_date") >= "20240102")
    assert rng.rdd.getNumPartitions() == 2

    isin = _read(feed, "arxiv").filter(F.col("run_date").isin("20240101", "20240103"))
    assert isin.rdd.getNumPartitions() == 2


def test_non_rundate_filters_still_apply(feed):
    from pyspark.sql import functions as F

    df = _read(feed, "arxiv").filter((F.col("run_date") == "20240102") & (F.col("position") < 2))
    rows = df.collect()
    assert {r.position for r in rows} == {0, 1}


def test_streaming_one_day_per_microbatch(feed, tmp_path):
    stream = (
        feed.readStream.format("bcproj3_feed")
        .option("source", "scholar")
        .option("run_dates", ",".join(DATES))
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_feed")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # one run_date per microbatch: drain until the replay is complete
    # (availableNow would stop at whatever the prefetch saw — one day)
    import time

    deadline = time.monotonic() + 120
    try:
        while time.monotonic() < deadline:
            n = feed.sql("SELECT COUNT(*) AS n FROM pyds_feed").first().n
            if n >= len(DATES):
                break
            time.sleep(0.5)
        got = feed.sql("SELECT run_date FROM pyds_feed ORDER BY run_date").collect()
        assert [r.run_date for r in got] == DATES
        # scholar emits ONE record per day, so per-batch input rows <= 1
        # pins the one-day-per-microbatch offset contract
        assert all(p["numInputRows"] <= 1 for p in q.recentProgress)
    finally:
        q.stop()


def test_register_falls_back_when_pushdown_conf_unsettable(feed):
    """VERDICT r6 item 6: Spark 4.1 hard-errors when a reader implements
    pushFilters on a session where spark.sql.python.filterPushdown.enabled
    is off. register() therefore chooses the reader class at
    registration time; when the conf cannot be set (simulated here by a
    session proxy whose conf.set raises, the locked-down-cluster case),
    the no-pushdown PlainConnectorDataSource must be registered under
    the same format name — degrading to unpruned reads, never to a
    read-time error."""
    registered = []

    class _LockedConf:
        def set(self, k, v):
            raise RuntimeError("conf is locked down")

    class _Registry:
        def register(self, cls):
            registered.append(cls)

    class _LockedSession:
        conf = _LockedConf()
        dataSource = _Registry()

    pyds.register(_LockedSession())
    assert registered == [pyds.PlainConnectorDataSource]


def test_plain_reader_reads_correctly_without_pruning(feed):
    """The degraded no-pushdown source must return exactly the same
    rows for a run_date-filtered read — the filter just runs post-scan
    (all partitions fetched) instead of pruning partitions(). Verified
    by registering the fallback class under the shared format name and
    diffing against the pushdown reader's result."""
    from pyspark.sql import functions as F

    want = sorted(
        map(tuple, _read(feed, "arxiv").filter(F.col("run_date") >= "20240102").collect())
    )
    feed.dataSource.register(pyds.PlainConnectorDataSource)
    try:
        df = _read(feed, "arxiv").filter(F.col("run_date") >= "20240102")
        # no pushFilters hook -> partitions() can't prune: all 3 scanned
        assert df.rdd.getNumPartitions() == len(DATES)
        assert sorted(map(tuple, df.collect())) == want
    finally:
        feed.dataSource.register(pyds.ConnectorDataSource)
