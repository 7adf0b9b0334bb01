"""Round-13 pins: f1/d8 artifact seam parity (docs/benching.md).

f1_quality_filter and d8_incremental_dedup became artifact OWNERS this
round (pipe1/pipe2/pipe3/st13 consume via the ``*_artifact`` readers).
Pins: owners never restore their own result; consumer-restored values
are identical to a fresh no-seam run, end-to-end through pipe2 and the
st13 streaming drain.
"""

from __future__ import annotations

from bc_proj3_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def _reset(spark):
    from bc_proj3_spark.operators import artifacts, dedup

    spark.catalog.clearCache()
    dedup._DOC_INDEX_CACHE.clear()
    artifacts._ARTIFACT_CACHE.clear()


def test_f1_d8_artifact_seam_preserves_values(spark, tmp_path, monkeypatch):
    from bc_proj3_spark.operators import artifacts

    qs = all_queries()
    f1 = qs["f1_quality_filter"]
    d8 = qs["d8_incremental_dedup"]
    pipe2 = qs["pipe2_ingest_manifest"]
    st13 = qs["st13_stream_admission_ledger"]

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    _reset(spark)
    monkeypatch.delenv("SPARK_GRAFT_INDEX_SPILL_DIR", raising=False)
    base_f1 = rows(f1.builder(spark, SF))
    base_d8 = rows(d8.builder(spark, SF))
    base_p2 = rows(pipe2.builder(spark, SF))
    base_st = rows(st13.builder(spark, SF))

    _reset(spark)
    monkeypatch.setenv("SPARK_GRAFT_INDEX_SPILL_DIR", str(tmp_path))
    # Owners compute and publish; their results are unchanged.
    assert rows(f1.builder(spark, SF)) == base_f1
    assert rows(d8.builder(spark, SF)) == base_d8
    _reset(spark)  # evict: owners recompute, consumers restore

    # Re-running an owner must not populate the restore cache.
    assert rows(d8.builder(spark, SF)) == base_d8
    assert not artifacts._ARTIFACT_CACHE, "owner restored its own result"

    # Consumers produce identical ledgers from the restored artifacts.
    assert rows(pipe2.builder(spark, SF)) == base_p2
    assert artifacts._ARTIFACT_CACHE, "consumer did not restore"
    assert rows(st13.builder(spark, SF)) == base_st

    # The published artifacts restore the exact owner values.
    from bc_proj3_spark.operators.dedup import d8_admitted_artifact
    from bc_proj3_spark.operators.ranking import f1_passed_artifact

    assert rows(f1_passed_artifact(spark, SF)) == base_f1
    assert (
        sorted(r["doc_id"] for r in d8_admitted_artifact(spark, SF).collect())
        == sorted(r[0] for r in base_d8)
    )
