"""Round-12 hardening: degenerate-corpus pins for the ev2/ev3 fixes.

The r8 advisor found two cross-engine seams in operators/llmeval.py:

- ev3 built character 4-grams with ``sequence(1, greatest(len-3, 0))``;
  for texts shorter than CHR_N=4 Spark's ``sequence(1, 0)`` counts DOWN
  to [1, 0] and fabricates two phantom grams, while DuckDB's
  ``generate_series(1, 0)`` is empty — a short equal pair inflated clip
  on the Spark side only. Fixed with the shingles()/textstats length
  mask (CASE len >= CHR_N).
- ev2's zero-overlap corpus hit ``LOG(0)``: NULL on Spark, an
  OutOfRangeException on DuckDB; and a single-token corpus (hyp_bi = 0)
  divided by zero: NaN on Spark, NULL on DuckDB. Both now pinned with
  the SAME CASE on both engines (NULL for undefined precision/log-BLEU).

Each pin builds a synthetic documents table that lands in the seam and
asserts exact Spark<->DuckDB parity through the driver-grade comparator
— on the old expressions these inputs diverge or crash the oracle.
"""

from __future__ import annotations

import duckdb

from bc_proj3_spark.registry import all_queries
from conftest import strict_rows_key

SPECS = all_queries()


def _write_documents(tmp_path, values_sql: str) -> str:
    """Materialize a synthetic documents.parquet from a VALUES list of
    (doc_id, text) rows; lang/source/n_chars filled mechanically."""
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT CAST(doc_id AS BIGINT) AS doc_id, text, 'en' AS lang,
                 'synthetic' AS source,
                 CAST(length(text) AS BIGINT) AS n_chars
          FROM (VALUES {values_sql}) t(doc_id, text)
        ) TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(tmp_path)


def _run_vs_oracle(spark, spec, sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    try:
        sdf = spec.builder(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = list(sdf.columns)
        res = con.execute(spec.oracle)
        ocols = [d[0] for d in res.description]
        orows = [tuple(r) for r in res.fetchall()]
    finally:
        con.close()
    assert len(srows) == len(orows)
    assert sorted(scols) == sorted(ocols)
    skey, _ = strict_rows_key(scols, srows)
    okey, _ = strict_rows_key(ocols, orows)
    assert skey == okey, f"{spec.name}: engine divergence on the seam corpus"
    return srows, scols


def test_ev3_short_texts_fabricate_no_grams(spark, tmp_path):
    """Pair 0 is two 2-char texts (below CHR_N=4): the old Spark gram
    expression fabricated two phantom grams per side and inflated clip
    by 2 vs the oracle; pair 1 is a normal pair so totals stay
    non-degenerate. Must be exactly equal cross-engine now."""
    sf = _write_documents(
        tmp_path,
        "(0, 'ab'), (1, 'ab'), (2, 'abcdef'), (3, 'abcdef')",
    )
    rows, cols = _run_vs_oracle(spark, SPECS["ev3_chargram_fscore"], sf)
    row = dict(zip(cols, rows[0]))
    # only pair 1 contributes: 3 grams per side, all matching
    assert row["hyp_grams"] == 3 and row["ref_grams"] == 3
    assert row["clip"] == 3
    assert row["chrf2"] == 1.0


def test_ev3_all_short_corpus_parity(spark, tmp_path):
    """Every text below CHR_N: zero grams on both engines, NULL
    precision/recall, chrf2 pinned to 0 by the shared CASE."""
    sf = _write_documents(tmp_path, "(0, 'ab'), (1, 'xyz')")
    rows, cols = _run_vs_oracle(spark, SPECS["ev3_chargram_fscore"], sf)
    row = dict(zip(cols, rows[0]))
    assert row["hyp_grams"] == 0 and row["ref_grams"] == 0
    assert row["chr_precision"] is None and row["chr_recall"] is None
    assert row["chrf2"] == 0.0


def test_ev2_zero_overlap_corpus_parity(spark, tmp_path):
    """Disjoint vocabularies: clip1 = clip2 = 0. The old oracle raised
    OutOfRangeException on LN(0) while Spark emitted NULL; both now
    emit NULL log_bleu2 via the same CASE."""
    sf = _write_documents(
        tmp_path,
        "(0, 'aa aa aa'), (1, 'bb bb bb'), (2, 'cc dd'), (3, 'ee ff')",
    )
    rows, cols = _run_vs_oracle(spark, SPECS["ev2_bleu_corpus"], sf)
    row = dict(zip(cols, rows[0]))
    assert row["clip1"] == 0 and row["clip2"] == 0
    assert row["p1"] == 0.0 and row["p2"] == 0.0
    assert row["log_bleu2"] is None


def test_ev2_single_token_corpus_parity(spark, tmp_path):
    """Single-token documents: hyp_bi = 0, so p2 was NaN on Spark and
    NULL on DuckDB. Both engines must now agree on NULL p2 and NULL
    log_bleu2 (no bigram evidence exists either way)."""
    sf = _write_documents(tmp_path, "(0, 'aa'), (1, 'aa'), (2, 'bb'), (3, 'bb')")
    rows, cols = _run_vs_oracle(spark, SPECS["ev2_bleu_corpus"], sf)
    row = dict(zip(cols, rows[0]))
    assert row["p1"] == 1.0  # unigrams match perfectly
    assert row["p2"] is None
    assert row["log_bleu2"] is None


def test_shingle_index_spill_seam_preserves_values(spark, tmp_path, monkeypatch):
    """The SPARK_GRAFT_INDEX_SPILL_DIR seam (bench-only) must restore a
    cache-evicted shingle index from its write-once parquet with values
    identical to a fresh build — d4's pair list is the sharpest probe
    (any index drift changes candidate pairs and Jaccard values)."""
    import os as _os

    from bc_proj3_spark.operators import dedup

    sf = "/root/testdata/sf0.001"
    spec = all_queries()["d4_minhash_lsh_pairs"]

    def run():
        return sorted(tuple(r) for r in spec.builder(spark, sf).collect())

    def reset():
        spark.catalog.clearCache()
        dedup._DOC_INDEX_CACHE.clear()

    reset()
    monkeypatch.delenv("SPARK_GRAFT_INDEX_SPILL_DIR", raising=False)
    baseline = run()

    reset()
    monkeypatch.setenv("SPARK_GRAFT_INDEX_SPILL_DIR", str(tmp_path))
    first = run()  # builds the index and writes the parquet artifact
    spill_dirs = [p for p in _os.listdir(tmp_path) if p.startswith("shingle_index_")]
    assert spill_dirs, "seam did not materialize the index"

    reset()  # evict: the next call must restore from the artifact
    second = run()

    assert first == baseline
    assert second == baseline
