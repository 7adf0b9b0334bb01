"""Streaming state must evolve correctly ACROSS micro-batches.

Every registered st* query drains its backlog with AvailableNow over a
single input file — one micro-batch, which is the degenerate stream. A
real deployment sees state built incrementally: batch 3's aggregates
fold into state left by batches 1–2, and correctness bugs (lost state,
double-counted keys, watermark mishandling) only appear there. This
test splits the events table into multiple files and forces
one-file-per-trigger, so the same aggregation runs as a genuine
multi-batch stream — and must still equal the batch answer exactly.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"
N_FILES = 4


def test_stateful_agg_across_micro_batches(spark, tmp_path):
    from bc_proj3_spark.plans.tables import table

    src_dir = str(tmp_path / "events_split")
    ev = table(spark, SF, "events")
    # deterministic split: repartition by a pure row function
    ev.repartition(N_FILES, F.col("event_id") % N_FILES).write.parquet(src_dir)

    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    agg = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,10)"))
        .cast("double")
        .alias("total_value"),
    )
    sink = f"mb_sink_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory(prefix="mb-ckpt-") as ckpt:
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n_batches = len(q.recentProgress)
    # the point of the test: the drain really ran as MULTIPLE batches
    # (AvailableNow may coalesce or append a final empty trigger, so
    # require genuine multiplicity rather than exactly N_FILES)
    assert n_batches >= 2, f"only {n_batches} micro-batches ran"

    streamed = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.table(sink).collect()
    }
    batch = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.read.parquet(src_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("double")
            .alias("total_value"),
        )
        .collect()
    }
    assert streamed == batch
