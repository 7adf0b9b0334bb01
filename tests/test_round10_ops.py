"""Round-10 additions: invariants the DuckDB oracles can't express —
ledger conservation for the quality gates, WoE/IV identities, the
IPW estimator's confounding-vs-stratification relationship, and AP@k's
coupling with the recall monitor.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# dq10 — corpus quality-gate ledger
# ---------------------------------------------------------------------------


def test_dq10_ledger_conservation(spark):
    """Per-group counts are conserved: n_pass <= n_docs, every fail
    count <= n_docs, n_pass + max(fail_*) <= n_docs (a doc failing any
    rule cannot pass), corpus totals equal the documents row count, and
    every rule has real variance (some group fails it, some passes)."""
    from bc_proj3_spark.operators.quality import dq10_quality_gates

    rows = dq10_quality_gates(spark, SF_DIR).collect()
    assert rows
    fails = ["fail_wordcount", "fail_wordlen", "fail_stopword",
             "fail_diversity", "fail_dominance"]
    n_docs_total = sum(r.n_docs for r in rows)
    expected = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert n_docs_total == expected
    for r in rows:
        assert 0 <= r.n_pass <= r.n_docs
        for f_ in fails:
            assert 0 <= r[f_] <= r.n_docs
            assert r.n_pass + r[f_] <= r.n_docs
        assert abs(r.pass_rate - r.n_pass / r.n_docs) == 0.0
    for f_ in fails:
        assert sum(r[f_] for r in rows) > 0, f"{f_} never trips"
    assert sum(r.n_pass for r in rows) > 0


def test_dq10_single_scan_no_explode(spark):
    """The per-doc features (including max token run length) fold
    map-side over the token array: exactly ONE documents FileScan and
    no Generate (explode) anywhere in the physical plan."""
    from bc_proj3_spark.operators.quality import dq10_quality_gates

    plan = _plan(dq10_quality_gates(spark, SF_DIR))
    assert plan.count("Scan parquet") == 1
    assert "Generate" not in plan


# ---------------------------------------------------------------------------
# fe5 — weight-of-evidence encoding
# ---------------------------------------------------------------------------


def test_fe5_woe_identities(spark):
    """WoE sign tracks the category's positive-rate vs the global rate;
    recomputing the smoothed log-odds in Python reproduces each woe on
    the 9-dp lattice; iv_total equals the sum of iv_terms and every
    iv_term is non-negative up to the lattice (p-q and WoE share sign
    by construction)."""
    from bc_proj3_spark.operators.quality import fe5_woe_encoding

    rows = fe5_woe_encoding(spark, SF_DIR).collect()
    assert len(rows) == 5  # TPC-H market segments
    p_tot = sum(r.n_pos for r in rows)
    n_tot = sum(r.n_neg for r in rows)
    for r in rows:
        x = ((2 * r.n_pos + 1) * n_tot) / ((2 * r.n_neg + 1) * p_tot)
        assert abs(r.woe - round(math.log(x), 9)) < 1e-12
        assert r.iv_term >= -1e-9
    iv = round(sum(round(
        (r.n_pos / p_tot - r.n_neg / n_tot)
        * r.woe, 9) for r in rows), 9)
    assert abs(rows[0].iv_total - iv) < 1e-9
    assert all(abs(r.iv_total - rows[0].iv_total) == 0.0 for r in rows)


# ---------------------------------------------------------------------------
# e26 — stratified IPW uplift
# ---------------------------------------------------------------------------


def test_e26_propensity_and_estimator_identities(spark):
    """Estimated propensities straddle the designed 25/50/75 % rates;
    the stratified ATE equals the population-share-weighted sum of the
    per-stratum gaps (recomputed in Python on the same lattice); the
    headline scalars are identical on every row; and the hash-coin
    design keeps every cell populated."""
    from bc_proj3_spark.plans.events import e26_ipw_uplift

    rows = sorted(e26_ipw_uplift(spark, SF_DIR).collect(),
                  key=lambda r: r.seg)
    assert [r.seg for r in rows] == [0, 1, 2]
    n_all = sum(r.n_events for r in rows)
    for r in rows:
        assert r.n_treated > 0
        assert r.n_events - r.n_treated > 0
        assert 0.05 < r.e_hat < 0.95
        assert abs(r.gap_cents - (r.mean_treated - r.mean_control)) == 0.0
    # the designed 25/50/75 % user-level rates survive event-weighting
    # as a strict ordering (150 users at sf0.01 — absolute rates are
    # noisy, the monotone design is not)
    assert rows[0].e_hat < rows[1].e_hat < rows[2].e_hat
    ate = sum(round(r.gap_cents * (r.n_events / n_all), 9) for r in rows)
    assert abs(rows[0].ate_ipw - ate) < 1e-9
    assert all(r.ate_ipw == rows[0].ate_ipw for r in rows)
    assert all(r.ate_naive == rows[0].ate_naive for r in rows)


def test_e26_single_events_scan(spark):
    """The events scan runs exactly once — at build time, into the
    K-row checkpointed aggregate. The returned plan therefore contains
    NO parquet scan at all: totals and both headline scalars are
    reductions of the checkpointed K rows, never a second pass."""
    from bc_proj3_spark.plans.events import e26_ipw_uplift

    plan = _plan(e26_ipw_uplift(spark, SF_DIR))
    assert plan.count("Scan parquet") == 0
    assert "ExistingRDD" in plan


# ---------------------------------------------------------------------------
# hs4 — MAP@k retrieval eval
# ---------------------------------------------------------------------------


def test_hs4_ap_bounds_and_recall_coupling(spark):
    """AP in [0, 1]; AP == 1 iff the ANN list's head is a perfect
    prefix of hits covering the whole relevant set; zero hits forces
    AP == 0; and hs4's n_rel_found equals s9's n_hits — the monitors
    agree on WHAT was found and differ only in how order is graded."""
    from bc_proj3_spark.operators.similarity import (
        hs4_map_eval,
        s9_ann_recall,
    )

    hs4 = {r.query_id: r for r in hs4_map_eval(spark, SF_DIR).collect()}
    spark.catalog.clearCache()
    s9 = {r.query_id: r for r in s9_ann_recall(spark, SF_DIR).collect()}
    assert set(hs4) == set(s9) and hs4
    for qid, r in hs4.items():
        assert -1e-12 <= r.ap <= 1.0 + 1e-9
        assert r.n_rel_found == s9[qid].n_hits
        if r.n_rel_found == 0:
            assert r.ap == 0.0
        if r.ap >= 1.0 - 1e-9:
            assert r.n_rel_found == r.n_rel


def test_hs4_weights_are_compile_time_literals(spark):
    """No division by the rank in either engine: the 1/i precision
    weights are baked as 9-dp decimal literals (hs3's discipline), so
    the AP numerator is an order-free exact decimal sum."""
    from bc_proj3_spark.operators.similarity import _MAP_W, _MAP_W_CASE

    assert len(_MAP_W) == 10
    assert _MAP_W[0] == "1.000000000"
    assert _MAP_W[2] == "0.333333333"
    assert "WHEN 10 THEN CAST(0.100000000" in _MAP_W_CASE


# ---------------------------------------------------------------------------
# ml1 — batch perceptron training trajectory
# ---------------------------------------------------------------------------


def test_ml1_trajectory_learns(spark):
    """Round 1 misclassifies everything (zero weights give margin 0 on
    every doc, counted as mistakes on both engines); the centered
    features then drop the error to its noise floor and it never
    returns to round-1 levels; weights stay exact integers."""
    from bc_proj3_spark.operators.mltrain import ml1_perceptron_train

    rows = sorted(ml1_perceptron_train(spark, SF_DIR).collect(),
                  key=lambda r: r.round)
    assert [r.round for r in rows] == [1, 2, 3, 4]
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert rows[0].n_mistakes == n_docs
    assert rows[0].error_rate == 1.0
    for r in rows[1:]:
        assert r.n_mistakes < n_docs // 2
        assert abs(r.error_rate - r.n_mistakes / n_docs) < 1e-15
    for r in rows:
        for w in (r.w0, r.w1, r.w2, r.w3):
            assert isinstance(w, int)


# ---------------------------------------------------------------------------
# bt1 — Bradley-Terry strength fit
# ---------------------------------------------------------------------------


def test_bt1_match_accounting_and_normalization(spark):
    """Every match has exactly one winner (total wins == total
    matches), each segment's wins never exceed its matches, strengths
    are positive and sum to the fixed-point scale up to K half-up
    roundings, and the display strength is the exact scaled division."""
    from bc_proj3_spark.operators.mltrain import BT_SCALE, bt1_bradley_terry

    rows = bt1_bradley_terry(spark, SF_DIR).collect()
    assert len(rows) == 5
    assert sum(r.n_wins for r in rows) * 2 == sum(r.n_matches for r in rows)
    for r in rows:
        assert 0 <= r.n_wins <= r.n_matches
        assert r.p_scaled > 0
        assert abs(r.strength - r.p_scaled / BT_SCALE) == 0.0
    assert abs(sum(r.p_scaled for r in rows) - BT_SCALE) <= len(rows)


# ---------------------------------------------------------------------------
# t28 — TextRank keywords
# ---------------------------------------------------------------------------


def test_t28_ranks_positive_and_totally_ordered(spark):
    """Exactly top-k rows, every rank positive and above the damping
    floor (0.15/N), the list sorted by (rank desc, word) — the total
    order both engines share — and rank the exact scaled division."""
    from bc_proj3_spark.operators.textstats import (
        TEXTRANK_SCALE,
        TEXTRANK_TOP_K,
        t28_textrank_keywords,
    )

    rows = t28_textrank_keywords(spark, SF_DIR).collect()
    assert len(rows) == TEXTRANK_TOP_K
    keys = [(-r.rank_scaled, r.word) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert r.rank_scaled > 0
        assert abs(r.rank - r.rank_scaled / TEXTRANK_SCALE) == 0.0


# ---------------------------------------------------------------------------
# adversarial scale: dq10/ml1 on a hot-key boilerplate corpus; bt1 spill
# ---------------------------------------------------------------------------


def test_dq10_ml1_exact_on_hotkey_boilerplate_corpus(spark):
    """A boilerplate sentence shared by 30% of a 2000-doc corpus (the
    license-header skew case, r9's template): the gate ledger's
    map-side array folds and the perceptron's batch updates must stay
    oracle-exact — neither path keys any shuffle on a token, so the hot
    token cannot skew either plan (asserted by exact values)."""
    import tempfile

    import duckdb

    from bc_proj3_spark import registry
    from tests.test_driver_parity import strict_digest

    boiler = "standard license header text applies to this file entirely"
    docs = []
    for i in range(1, 2001):
        body = f"uniq{i}a the uniq{i}b a uniq{i}c uniq{i}d uniq{i}e"
        text = (boiler + " " + body) if i % 10 < 3 else body
        docs.append((i, text, "en" if i % 3 else "de", f"s{i % 4}",
                     len(text) * (5 if i % 7 == 0 else 1)))
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).write.parquet(f"{tmp}/documents.parquet")
        con = duckdb.connect()
        try:
            con.execute(
                "CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp}/documents.parquet/*.parquet')"
            )
            for name in ("dq10_quality_gates", "ml1_perceptron_train"):
                spec = registry.all_queries()[name]
                df = spec.builder(spark, tmp)
                rows = [tuple(r) for r in df.collect()]
                res = con.execute(spec.oracle)
                ocols = [d[0] for d in res.description]
                orows = [tuple(r) for r in res.fetchall()]
                assert len(rows) == len(orows), name
                assert strict_digest(list(df.columns), rows) == strict_digest(
                    ocols, orows
                ), f"{name} diverged on the hot-key corpus"
                spark.catalog.clearCache()
        finally:
            con.close()


def test_bt1_identical_values_under_spill_pressure():
    """bt1's per-round keyed joins and the day-keyed match self-join
    must stay value-identical when the session is squeezed to 2 shuffle
    partitions with floor-level force-spill thresholds (the d13/w3/d14
    spill-gate discipline applied to the new MM-iteration path)."""
    import json
    import subprocess
    import sys

    prog = """
import json, sys
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .appName("spill-sim-bt1")
    .config("spark.ui.enabled", "false")
    .config("spark.shuffle.spill.numElementsForceSpillThreshold", "5000")
    .config("spark.sql.windowExecBufferSpillThreshold", "128")
    .getOrCreate()
)
import __spark_entry__ as E
from tests.test_driver_parity import strict_digest
df = E.queries()["bt1_bradley_terry"](spark, sys.argv[1])
rows = [tuple(r) for r in df.collect()]
print("SPILL_JSON:" + json.dumps([len(rows), strict_digest(list(df.columns), rows)]))
"""
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    env["SPARK_GRAFT_SHUFFLE"] = "2"
    proc = subprocess.run(
        [sys.executable, "-c", prog, SF_DIR],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd="/root/repo",
    )
    payload = None
    for line in proc.stdout.splitlines():
        if line.startswith("SPILL_JSON:"):
            payload = json.loads(line[len("SPILL_JSON:"):])
    assert payload is not None, (
        f"spill run produced no result (rc={proc.returncode})\n"
        f"stderr tail: {proc.stderr[-1500:]}"
    )
    n_rows, digest = payload

    import duckdb

    from bc_proj3_spark import registry
    from tests.test_driver_parity import strict_digest

    spec = registry.all_queries()["bt1_bradley_terry"]
    con = duckdb.connect()
    try:
        for t in ("orders", "customer"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')"
            )
        res = con.execute(spec.oracle)
        ocols = [d[0] for d in res.description]
        orows = [tuple(r) for r in res.fetchall()]
    finally:
        con.close()
    assert n_rows == len(orows)
    assert digest == strict_digest(ocols, orows), (
        "bt1 values diverged under spill pressure"
    )


# ---------------------------------------------------------------------------
# ml2 — naive Bayes confusion matrix
# ---------------------------------------------------------------------------


def test_ml2_confusion_accounting(spark):
    """Confusion counts cover exactly the documents with at least one
    content token; accuracy equals diagonal/total recomputed from the
    matrix and is identical on every row; the fit beats the majority-
    class prior on this corpus (the token mix genuinely encodes the
    language); every actual language appears."""
    from bc_proj3_spark.functions import text as T
    from bc_proj3_spark.operators.mltrain import ml2_naive_bayes_confusion

    rows = ml2_naive_bayes_confusion(spark, SF_DIR).collect()
    assert rows
    total = sum(r.n_docs for r in rows)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    scored = docs.select(
        F.size(T.tokenize(F.col("text"))).alias("n")
    ).filter(F.col("n") > 0).count()
    assert total == scored
    diag = sum(r.n_docs for r in rows if r.lang == r.predicted)
    assert abs(rows[0].accuracy - diag / total) < 1e-15
    assert all(r.accuracy == rows[0].accuracy for r in rows)
    by_actual = {}
    for r in rows:
        by_actual[r.lang] = by_actual.get(r.lang, 0) + r.n_docs
    majority = max(by_actual.values()) / total
    assert rows[0].accuracy > majority
    assert set(by_actual) == {"de", "en", "es", "fr", "zh"}


# ---------------------------------------------------------------------------
# g13 — HITS authorities
# ---------------------------------------------------------------------------


def test_g13_topk_order_and_normalization(spark):
    """Exactly top-k rows, sorted by (auth_scaled desc, part_key) — the
    shared total order; authorities positive; the top-k mass never
    exceeds the fixed-point scale (sum normalization); the display
    authority is the exact scaled division."""
    from bc_proj3_spark.operators.graph import (
        HITS_SCALE,
        HITS_TOP_K,
        g13_hits_authorities,
    )

    rows = g13_hits_authorities(spark, SF_DIR).collect()
    assert len(rows) == HITS_TOP_K
    keys = [(-r.auth_scaled, r.part_key) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert r.auth_scaled > 0
        assert abs(r.authority - r.auth_scaled / HITS_SCALE) == 0.0
    assert sum(r.auth_scaled for r in rows) <= HITS_SCALE + HITS_TOP_K


# ---------------------------------------------------------------------------
# ml3 — decision stump
# ---------------------------------------------------------------------------


def test_ml3_stump_accounting_and_lift(spark):
    """The two leaves partition the corpus; n_correct and accuracy are
    consistent; the fitted stump beats the majority-class prior (the
    length target is axis-aligned, so a depth-1 split captures it
    almost perfectly); the chosen feature is one of the candidates."""
    from bc_proj3_spark.operators.mltrain import (
        STUMP_LABEL_CHARS,
        ml3_decision_stump,
    )

    rows = ml3_decision_stump(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    n_pos = docs.filter(F.col("n_chars") >= STUMP_LABEL_CHARS).count()
    assert r.n_left + r.n_right == n_docs
    assert r.n_left > 0 and r.n_right > 0
    assert 0 < r.n_correct <= n_docs
    assert abs(r.accuracy - r.n_correct / n_docs) < 1e-15
    majority = max(n_pos, n_docs - n_pos) / n_docs
    assert r.accuracy > majority
    assert r.feature in ("n_words", "n_distinct")
    assert r.pred_left != r.pred_right  # a degenerate stump learned nothing


# ---------------------------------------------------------------------------
# degenerate inputs: every r10 op mirrors its oracle on an EMPTY corpus
# ---------------------------------------------------------------------------


def test_r10_ops_mirror_oracle_on_empty_tables(spark, tmp_path):
    """Zero-row inputs must produce the oracle's exact output, not a
    driver-side crash (r9's hardening discipline): the fits with
    Python-literal divisors (ml1) or SCALE // count initializers
    (bt1, t28, g13, ml2) guard explicitly; the rest degrade through
    empty frames. Spark 4's ANSI division THROWS where DuckDB yields
    NULL, so the guards mirror rows literally where the oracle still
    emits aggregates over the empty frame."""
    import duckdb

    from bc_proj3_spark import registry
    from bc_proj3_spark.plans.tables import TABLE_NAMES
    from tests.test_driver_parity import strict_digest

    tmp = str(tmp_path)
    con = duckdb.connect()
    for t in TABLE_NAMES:
        src = f"{SF_DIR}/{t}.parquet"
        if not os.path.exists(src):
            continue
        spark.read.parquet(src).limit(0).write.parquet(f"{tmp}/{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp}/{t}.parquet/*.parquet')"
        )
    names = [
        "dq10_quality_gates", "fe5_woe_encoding", "e26_ipw_uplift",
        "hs4_map_eval", "ml1_perceptron_train", "bt1_bradley_terry",
        "t28_textrank_keywords", "ml2_naive_bayes_confusion",
        "g13_hits_authorities", "ml3_decision_stump",
        # round-13 registrations (e28's empty-input NULL chain is the
        # guarded seam; the rest degrade through empty frames)
        "sp17_token_budget_mix", "a19_hhi_concentration",
        "prof4_column_entropy", "t31_term_burstiness",
        "m7_modality_balance", "e28_cuped_adjusted_ate",
        "t32_source_kl_drift", "e29_sample_size_mde",
        "mf1_als_user_factors",
    ]
    try:
        for name in names:
            spec = registry.all_queries()[name]
            df = spec.builder(spark, tmp)
            rows = [tuple(r) for r in df.collect()]
            res = con.execute(spec.oracle)
            ocols = [d[0] for d in res.description]
            orows = [tuple(r) for r in res.fetchall()]
            assert len(rows) == len(orows), (
                f"{name}: {len(rows)} spark rows vs {len(orows)} oracle"
            )
            assert strict_digest(list(df.columns), rows) == strict_digest(
                ocols, orows
            ), f"{name} diverged on the empty corpus"
            spark.catalog.clearCache()
    finally:
        con.close()
