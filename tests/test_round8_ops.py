"""Round-8 additions: invariants the DuckDB oracles can't express for
the eight new operators — conservation laws (PAV mass preservation,
padding ledgers, coverage accounting), ordering guarantees (isotone
fit, monotone peel), algebraic identities (U_A + U_B = n_a*n_b,
self-centroid zero error), and plan-shape pins (map-side argmin, one
scan per strategy fan-out).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# a16 — Gini / concentration
# ---------------------------------------------------------------------------


def test_a16_gini_bounds_and_decile_floor(spark):
    """0 <= gini < 1 on any real distribution, and the top decile can
    never hold LESS than a proportional share: top_decile_share >=
    (n DIV 10) / n with equality only under perfect equality."""
    from bc_proj3_spark.plans.aggfuncs import a16_gini_concentration

    rows = a16_gini_concentration(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.gini < 1.0
        floor = (r.n_customers // 10) / r.n_customers
        assert r.top_decile_share >= floor
        assert r.top_decile_share <= 1.0


# ---------------------------------------------------------------------------
# e22 — coverage gaps
# ---------------------------------------------------------------------------


def test_e22_coverage_accounting(spark):
    """active + missing hours must tile the span exactly, and the
    first-gap timestamp exists iff a gap exists."""
    from bc_proj3_spark.plans.events import e22_missing_hours

    rows = e22_missing_hours(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_active_hours + r.n_missing_hours == r.n_hours_span
        assert (r.first_gap_hour is None) == (r.n_missing_hours == 0)


# ---------------------------------------------------------------------------
# ts10 — Theil–Sen
# ---------------------------------------------------------------------------


def test_ts10_pair_count_is_triangular(spark):
    """Every unordered day pair contributes exactly one slope:
    n_pairs == n_days * (n_days - 1) / 2."""
    from bc_proj3_spark.plans.events import ts10_theil_sen

    rows = ts10_theil_sen(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_pairs == r.n_days * (r.n_days - 1) // 2


# ---------------------------------------------------------------------------
# stat5 — Mann–Whitney U
# ---------------------------------------------------------------------------


def test_stat5_u_identity_under_segment_swap(spark):
    """U_A + U_B = n_a * n_b (the rank-sum identity): recomputing with
    the segments swapped must yield u2_b = 2*n_a*n_b - u2_a, and the
    z statistics must be exact negations."""
    import bc_proj3_spark.plans.aggfuncs as AG

    base = AG.stat5_mann_whitney(spark, SF_DIR).collect()[0]
    assert 0 <= base.u2_a <= 2 * base.n_a * base.n_b
    orig_a, orig_b = AG.KS_SEG_A, AG.KS_SEG_B
    try:
        AG.KS_SEG_A, AG.KS_SEG_B = orig_b, orig_a
        swapped = AG.stat5_mann_whitney(spark, SF_DIR).collect()[0]
    finally:
        AG.KS_SEG_A, AG.KS_SEG_B = orig_a, orig_b
    assert swapped.n_a == base.n_b and swapped.n_b == base.n_a
    assert swapped.u2_a == 2 * base.n_a * base.n_b - base.u2_a
    assert abs(swapped.z + base.z) < 1e-12


# ---------------------------------------------------------------------------
# cal2 — isotonic (PAV)
# ---------------------------------------------------------------------------


def test_cal2_fit_is_isotone_and_mass_preserving(spark):
    """The PAV fit must be (a) non-decreasing in the bin order, (b)
    within [min raw, max raw], and (c) mass-preserving: sum(iso * w)
    equals sum of raw label counts (pooling averages never create or
    destroy positives)."""
    from bc_proj3_spark.operators.quality import cal2_isotonic_calibration

    rows = sorted(
        cal2_isotonic_calibration(spark, SF_DIR).collect(),
        key=lambda r: r.bin,
    )
    assert len(rows) >= 3
    for a, b in zip(rows, rows[1:]):
        assert a.iso_rate <= b.iso_rate + 1e-12
    lo = min(r.raw_rate for r in rows)
    hi = max(r.raw_rate for r in rows)
    assert all(lo - 1e-12 <= r.iso_rate <= hi + 1e-12 for r in rows)
    iso_mass = sum(r.iso_rate * r.n_docs for r in rows)
    raw_mass = sum(r.raw_rate * r.n_docs for r in rows)
    assert abs(iso_mass - raw_mass) < 1e-6


# ---------------------------------------------------------------------------
# sp15 — length bucketing
# ---------------------------------------------------------------------------


def test_sp15_sorted_wastes_no_more_than_random(spark):
    """The operator's raison d'etre: length-sorted batches pad at most
    as much as hash-random batches; both strategies see the identical
    corpus (same docs, same total tokens), and the padding ledger
    closes: padded = total + waste."""
    from bc_proj3_spark.operators.sampling import sp15_length_bucketing

    rows = {r.strategy: r for r in sp15_length_bucketing(spark, SF_DIR).collect()}
    assert set(rows) == {"sorted", "random"}
    s, r = rows["sorted"], rows["random"]
    assert s.n_docs == r.n_docs and s.total_tokens == r.total_tokens
    for x in (s, r):
        assert x.padded_tokens == x.total_tokens + x.waste_tokens
    assert s.waste_tokens <= r.waste_tokens


def test_sp15_single_scan_fanout(spark):
    """Both strategies ride ONE documents scan (map-side explode), not
    one scan per strategy — the r7 sp11 lesson, pinned the same way."""
    from bc_proj3_spark.operators.sampling import sp15_length_bucketing

    plan = _plan(sp15_length_bucketing(spark, SF_DIR))
    assert plan.count("FileScan") == 1, plan[:1200]


# ---------------------------------------------------------------------------
# s10 — product quantization
# ---------------------------------------------------------------------------


def test_s10_seed_vectors_reconstruct_exactly(spark):
    """vec_id < PQ_K are their own sub-centroids in every subspace, so
    their codes are (id, id, id, id) and recon_err is exactly 0.0;
    codes everywhere lie in [0, PQ_K)."""
    from bc_proj3_spark.operators.similarity import PQ_K, s10_pq_codes

    rows = s10_pq_codes(spark, SF_DIR).collect()
    byid = {r.vec_id: r for r in rows}
    for i in range(PQ_K):
        r = byid[i]
        assert (r.c0, r.c1, r.c2, r.c3) == (i, i, i, i)
        assert r.recon_err == 0.0
    for r in rows:
        for c in (r.c0, r.c1, r.c2, r.c3):
            assert 0 <= c < PQ_K
        assert r.recon_err >= 0.0


def test_s10_argmin_is_mapside_no_window(spark):
    """The per-(vector, subspace) argmin must compile to the
    combiner-absorbed struct-MIN aggregate, never a window rank — at a
    billion vectors the difference is a skinny one-row-per-group
    shuffle vs sorting 32x the corpus."""
    from bc_proj3_spark.operators.similarity import s10_pq_codes

    plan = _plan(s10_pq_codes(spark, SF_DIR))
    assert "Window" not in plan, plan[:1500]
    assert plan.count("FileScan") == 1, plan[:1200]


# ---------------------------------------------------------------------------
# g6 — k-core peeling
# ---------------------------------------------------------------------------


def test_g6_census_is_monotone_and_consistent(spark):
    """Peeling only removes: node and edge counts are non-increasing
    per round; a fixpoint (equal consecutive rows) stays fixed; and
    edges can never outnumber the triangular bound of the surviving
    node set."""
    from bc_proj3_spark.operators.graph import g6_kcore

    rows = sorted(g6_kcore(spark, SF_DIR).collect(), key=lambda r: r.round)
    assert rows[0].round == 0 and len(rows) >= 3
    fixed = False
    for a, b in zip(rows, rows[1:]):
        assert b.n_nodes <= a.n_nodes
        assert b.n_edges <= a.n_edges
        if fixed:
            assert (b.n_nodes, b.n_edges) == (a.n_nodes, a.n_edges)
        if (b.n_nodes, b.n_edges) == (a.n_nodes, a.n_edges):
            fixed = True
    for r in rows:
        assert r.n_edges <= r.n_nodes * (r.n_nodes - 1) // 2


# ---------------------------------------------------------------------------
# g7 — JL distortion
# ---------------------------------------------------------------------------


def test_g7_ratio_envelope_and_pair_count(spark):
    """Every non-anchor pair contributes one ratio (n_pairs = N - 1);
    ratios are positive with min <= mean <= max; the JL expectation
    E[ratio] = 1 holds loosely per anchor at k = 16."""
    from bc_proj3_spark.operators.linalg import g7_jl_distortion

    rows = g7_jl_distortion(spark, SF_DIR).collect()
    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert len(rows) == 5
    for r in rows:
        assert r.n_pairs == n - 1
        assert 0.0 < r.min_ratio <= r.mean_ratio <= r.max_ratio
        assert 0.5 < r.mean_ratio < 1.5
        assert 0.0 <= r.frac_in_band <= 1.0


# ---------------------------------------------------------------------------
# stat6 — permutation test
# ---------------------------------------------------------------------------


def test_stat6_pvalue_identity_and_floor(spark):
    """p_value must equal (1 + n_extreme) / (B + 1) exactly, sit in
    [1/(B+1), 1], and the group sizes must cover the joined base."""
    import bc_proj3_spark.plans.aggfuncs as AG

    r = AG.stat6_permutation_test(spark, SF_DIR).collect()[0]
    B = AG.PERM_B
    assert r.p_value == (1 + r.n_extreme) / (B + 1)
    assert 1 / (B + 1) <= r.p_value <= 1.0
    assert 0 <= r.n_extreme <= B
    assert r.n_a > 0 and r.n_b > 0


# ---------------------------------------------------------------------------
# pipe2 — steady-state ingest manifest
# ---------------------------------------------------------------------------


def test_pipe2_ledger_reconciles_with_stages(spark):
    """Every batch document gets exactly one outcome; 'admitted' rows
    are exactly the intersection of f1-passed and d8-admitted batch
    docs (stage reconciliation — the composition can't drift from the
    operators it audits); split is stamped iff admitted."""
    from bc_proj3_spark.operators.corpus import pipe2_ingest_manifest
    from bc_proj3_spark.operators.dedup import (
        D8_BATCH_MOD,
        D8_BATCH_REM,
        d8_incremental_dedup,
    )
    from bc_proj3_spark.operators.ranking import f1_quality_filter

    rows = pipe2_ingest_manifest(spark, SF_DIR).collect()
    n_batch = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") % D8_BATCH_MOD == D8_BATCH_REM)
        .count()
    )
    assert len(rows) == n_batch
    assert all((r.split is not None) == (r.outcome == "admitted") for r in rows)
    admitted = {r.doc_id for r in rows if r.outcome == "admitted"}
    f1_ids = {r.doc_id for r in f1_quality_filter(spark, SF_DIR).collect()}
    d8_ids = {r.doc_id for r in d8_incremental_dedup(spark, SF_DIR).collect()}
    batch_ids = {r.doc_id for r in rows}
    assert admitted == (f1_ids & d8_ids & batch_ids)


# ---------------------------------------------------------------------------
# t25 — Heaps'-law fit
# ---------------------------------------------------------------------------


def test_t25_fit_bounds_and_count_conservation(spark):
    """Natural-ish text grows vocabulary sublinearly (0 < beta < 1);
    the vocabulary can never exceed the token count; and n_docs must
    equal the documents row count (every doc contributes a point)."""
    from bc_proj3_spark.operators.textstats import t25_heaps_law
    from bc_proj3_spark.plans.tables import table

    row = t25_heaps_law(spark, SF_DIR).collect()[0]
    assert 0.0 < row.heaps_beta < 1.0
    assert row.vocab <= row.total_tokens
    assert row.n_docs == table(spark, SF_DIR, "documents").count()


# ---------------------------------------------------------------------------
# stat7 — Benjamini–Hochberg FDR
# ---------------------------------------------------------------------------


def test_stat7_rejections_are_a_rank_prefix(spark):
    """BH rejects a PREFIX of the p-ranked hypotheses: if rank i is
    rejected every rank < i is too; p-values are exact (1+k)/(B+1)
    rationals on [1/21, 1]; ranks are a permutation of 1..m."""
    from bc_proj3_spark.plans.aggfuncs import PERM_B, stat7_bh_fdr

    rows = sorted(
        stat7_bh_fdr(spark, SF_DIR).collect(), key=lambda r: r.bh_rank
    )
    assert [r.bh_rank for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert abs(r.p_value - (1 + r.n_extreme) / (PERM_B + 1)) < 1e-15
        assert 1 / (PERM_B + 1) <= r.p_value <= 1.0
    flags = [r.rejected for r in rows]
    assert flags == sorted(flags, reverse=True), "rejections not a prefix"


# ---------------------------------------------------------------------------
# d13 — multi-index Hamming pairs
# ---------------------------------------------------------------------------


def test_d13_banded_index_equals_brute_force(spark):
    """The pigeonhole guarantee, checked mechanically: the banded
    multi-index candidates + popcount verify find EXACTLY the pairs a
    brute-force O(n^2) self-join over the same signatures finds."""
    from bc_proj3_spark.operators.dedup import (
        HAM_R,
        _simhash60,
        d13_hamming_neardup_pairs,
    )

    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in d13_hamming_neardup_pairs(spark, SF_DIR).collect()
    }
    sigs = _simhash60(spark, SF_DIR)
    a, b = sigs.alias("a"), sigs.alias("b")
    brute = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            )
            .cast("bigint")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= HAM_R)
        .collect()
    }
    assert got == brute
    assert all(x < y for x, y, _ in got)


# ---------------------------------------------------------------------------
# e23 — Kaplan–Meier
# ---------------------------------------------------------------------------


def test_e23_km_accounting_and_monotonicity(spark):
    """Risk sets shrink monotonically by exactly the events+censorings
    that leave; log-survival is non-increasing; every risk set covers
    at least its own day's departures."""
    from bc_proj3_spark.plans.events import e23_kaplan_meier

    rows = sorted(
        e23_kaplan_meier(spark, SF_DIR).collect(), key=lambda r: r.dur_days
    )
    assert rows
    prev_log = 0.0
    for r in rows:
        assert r.n_at_risk >= r.n_events + r.n_censored
        assert r.n_events >= 1  # only event times are emitted
        if r.log_survival is not None:
            assert r.log_survival <= prev_log + 1e-12
            prev_log = r.log_survival
    for a, b in zip(rows, rows[1:]):
        assert b.n_at_risk <= a.n_at_risk - a.n_events - a.n_censored


# ---------------------------------------------------------------------------
# g9 — Adamic–Adar link prediction
# ---------------------------------------------------------------------------


def test_g9_predictions_are_nonedges_with_positive_score(spark):
    """Every predicted pair must be NON-adjacent in the supported
    co-purchase graph, have at least one common (capped) neighbor, and
    scores must arrive sorted desc with the (u, v) tiebreak."""
    from bc_proj3_spark.operators.graph import (
        AA_MIN_SUPPORT,
        g9_adamic_adar,
    )
    from bc_proj3_spark.plans.tables import table

    rows = g9_adamic_adar(spark, SF_DIR).collect()
    assert rows
    li = table(spark, SF_DIR, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    edges = {
        (r.u, r.v)
        for r in a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("s"))
        .filter(F.col("s") >= AA_MIN_SUPPORT)
        .collect()
    }
    keys = [(-r.aa_score, r.u, r.v) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert (r.u, r.v) not in edges
        assert r.n_common >= 1 and r.aa_score > 0


# ---------------------------------------------------------------------------
# hs2 — MMR diversified re-ranking
# ---------------------------------------------------------------------------


def test_hs2_mmr_structure_and_top1_agreement(spark):
    """Per query: exactly K distinct picks, all drawn from s1's
    candidate set; MMR rank 1 is s1's most-relevant hit (no redundancy
    penalty exists before anything is selected); later picks can never
    BEAT the rank-1 relevance."""
    from bc_proj3_spark.operators.similarity import (
        MMR_K,
        hs2_mmr_rerank,
        s1_knn_bruteforce,
    )

    rows = hs2_mmr_rerank(spark, SF_DIR).collect()
    s1 = s1_knn_bruteforce(spark, SF_DIR).collect()
    cand = {(r.query_id, r.vec_id) for r in s1}
    top1 = {}
    for r in s1:
        cur = top1.get(r.query_id)
        key = (-r.cosine, r.vec_id)
        if cur is None or key < cur[0]:
            top1[r.query_id] = (key, r.vec_id)
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
        assert (r.query_id, r.vec_id) in cand
    for q, picks in by_q.items():
        assert len(picks) == MMR_K
        assert len({p.vec_id for p in picks}) == MMR_K
        r1 = min(picks, key=lambda p: p.mmr_rank)
        assert r1.mmr_rank == 1 and r1.vec_id == top1[q][1]
        assert all(p.relevance <= r1.relevance + 1e-12 for p in picks)


# ---------------------------------------------------------------------------
# g10 — clustering coefficient
# ---------------------------------------------------------------------------


def test_g10_coefficient_bounds_and_ordering(spark):
    """0 <= c_v <= 1, triangles can never exceed C(deg, 2), and the
    top-k arrives sorted (coeff desc, node tiebreak)."""
    from bc_proj3_spark.operators.graph import g10_clustering_coefficient

    rows = g10_clustering_coefficient(spark, SF_DIR).collect()
    assert rows
    keys = [(-r.clustering_coeff, r.node) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert 0.0 <= r.clustering_coeff <= 1.0
        assert r.n_triangles <= r.degree * (r.degree - 1) // 2


# ---------------------------------------------------------------------------
# fe4 — feature hashing
# ---------------------------------------------------------------------------


def test_fe4_mass_conservation_against_token_counts(spark):
    """Each token contributes exactly one ±1 to one bucket, so per doc:
    sum_b |f_b| <= n_tokens and sum_b f_b has the token count's parity;
    every document appears exactly once."""
    from bc_proj3_spark.operators.quality import fe4_feature_hashing
    from bc_proj3_spark.operators.textstats import t5_token_count

    feats = {r.doc_id: r for r in fe4_feature_hashing(spark, SF_DIR).collect()}
    toks = {
        r.doc_id: r.n_ws_tokens
        for r in t5_token_count(spark, SF_DIR).collect()
    }
    assert set(feats) == set(toks)
    for doc_id, r in feats.items():
        vals = [r[f"f{b}"] for b in range(16)]
        assert sum(abs(v) for v in vals) <= toks[doc_id]
        assert (sum(vals) - toks[doc_id]) % 2 == 0


# ---------------------------------------------------------------------------
# s11 — greedy k-center coreset
# ---------------------------------------------------------------------------


def test_s11_radius_sequence_is_nonincreasing_and_centers_distinct(spark):
    """Farthest-point traversal guarantees the coverage radius never
    increases round over round; K distinct centers; rank 1 is the
    deterministic seed (lowest vec_id)."""
    from bc_proj3_spark.operators.similarity import (
        KCENTER_K,
        s11_kcenter_coreset,
    )

    rows = sorted(
        s11_kcenter_coreset(spark, SF_DIR).collect(),
        key=lambda r: r.center_rank,
    )
    assert len(rows) == KCENTER_K
    assert len({r.vec_id for r in rows}) == KCENTER_K
    assert rows[0].center_rank == 1 and rows[0].radius is None
    radii = [r.radius for r in rows[1:]]
    assert all(b <= a + 1e-12 for a, b in zip(radii, radii[1:]))
    assert all(r >= 0 for r in radii)


# ---------------------------------------------------------------------------
# e24 — Markov stationary distribution
# ---------------------------------------------------------------------------


def test_e24_mass_conservation_and_support(spark):
    """The iterated vector stays a (fixed-point) distribution: total
    mass drifts from 1.0 only by the bounded half-up rounding (at most
    ~0.5 ulp per matrix cell per round on the 1e-9 lattice); all
    entries non-negative; one row per event type."""
    from bc_proj3_spark.plans.events import (
        MARKOV_ROUNDS,
        MARKOV_SCALE,
        e24_markov_stationary,
    )

    rows = e24_markov_stationary(spark, SF_DIR).collect()
    assert len(rows) == 5
    total = sum(r.pi_scaled for r in rows)
    # 25 cells + 5 q-normalizations, 0.5 each, per round — loose bound
    assert abs(total - MARKOV_SCALE) <= 30 * MARKOV_ROUNDS
    for r in rows:
        assert r.pi_scaled >= 0
        assert abs(r.pi - r.pi_scaled / MARKOV_SCALE) < 1e-15


# ---------------------------------------------------------------------------
# sk13 — CountSketch
# ---------------------------------------------------------------------------


def test_sk13_unbiased_estimator_error_envelope(spark):
    """CountSketch errs on BOTH sides (unlike CMS's overcount-only) but
    the median read must stay within the collision mass: |est - exact|
    is bounded by the total token count (loose sanity) and the top-1
    token — which dominates its counters — estimates within a small
    relative band."""
    from bc_proj3_spark.operators.sketch import sk13_countsketch

    rows = sk13_countsketch(spark, SF_DIR).collect()
    assert len(rows) == 20
    total = sum(r.exact_cnt for r in rows)
    top = max(rows, key=lambda r: r.exact_cnt)
    assert abs(top.cs_est - top.exact_cnt) <= 0.5 * top.exact_cnt
    for r in rows:
        assert abs(r.cs_est - r.exact_cnt) < total


# ---------------------------------------------------------------------------
# d13 under adversarial band-bucket skew
# ---------------------------------------------------------------------------


def test_d13_values_hold_under_hot_band_skew(spark, tmp_path):
    """A template-flooded corpus concentrates identical SimHashes into
    ONE band bucket per band — the regime where the banded index pays
    its quadratic bucket cost. Values must still match the brute-force
    oracle exactly (the pigeonhole guarantee is corpus-independent),
    and the hot cluster must surface as distance-0 pairs."""
    import duckdb

    from bc_proj3_spark import registry
    from tests.conftest import strict_rows_key

    sf = str(tmp_path)
    template = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, template) for i in range(40)]  # 40 identical docs
    for i in range(40, 300):
        rows.append(
            (i, " ".join(f"w{i}x{j} tok{(i * 7 + j) % 997}" for j in range(12)))
        )
    spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(2).write.parquet(f"{sf}/documents.parquet")

    spec = registry.all_queries()["d13_hamming_neardup_pairs"]
    sdf = spec.builder(spark, sf)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    res = con.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = [tuple(r) for r in res.fetchall()]
    assert strict_rows_key(list(sdf.columns), srows) == strict_rows_key(
        ocols, orows
    ), "d13 diverged under hot-band skew"
    zero = {(a, b) for a, b, h in srows if h == 0}
    # all 40*39/2 template pairs are distance 0
    assert len(zero) >= 40 * 39 // 2


# ---------------------------------------------------------------------------
# o8 — Mahalanobis outliers
# ---------------------------------------------------------------------------


def test_o8_distance_properties(spark):
    """d² is non-negative, arrives sorted desc with the custkey
    tiebreak, the flag is exactly d² > 9, and the mean point can never
    out-rank genuinely extreme ones (top-1 d² must exceed 2 — sanity
    that the covariance whitening didn't degenerate)."""
    from bc_proj3_spark.operators.quality import (
        MAHA_T2,
        o8_mahalanobis_outliers,
    )

    rows = o8_mahalanobis_outliers(spark, SF_DIR).collect()
    assert len(rows) == 20
    keys = [(-r.d2, r.c_custkey) for r in rows]
    assert keys == sorted(keys)
    assert rows[0].d2 > 2.0
    for r in rows:
        assert r.d2 >= 0.0
        assert r.is_outlier == (1 if r.d2 > MAHA_T2 else 0)


# ---------------------------------------------------------------------------
# m6 — multimodal packing
# ---------------------------------------------------------------------------


def test_m6_pack_budget_and_reconciliation(spark):
    """Every pack except possibly each bucket's LAST starts within the
    window budget (greedy first-token rule: a pack's cumulative start
    is < WINDOW past its boundary), totals reconcile text + media, and
    the packed doc count equals the corpus."""
    from bc_proj3_spark.operators.multimodal import (
        m6_multimodal_packing,
    )
    from bc_proj3_spark.plans.tables import table

    rows = m6_multimodal_packing(spark, SF_DIR).collect()
    assert rows
    n_docs = table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.total_tokens == r.text_token_sum + r.media_token_sum
        assert r.pack_id >= 0 and r.n_docs >= 1


def test_m6_payload_never_read(spark):
    """m5's plan property holds here too: pricing is metadata-only, so
    the md5 payload chain must not appear in the physical plan."""
    from bc_proj3_spark.operators.multimodal import m6_multimodal_packing

    plan = _plan(m6_multimodal_packing(spark, SF_DIR))
    # the packing hash is md5-based, so check the payload CONSTRUCTION
    # (unhex of the md5 chain) instead — it must never be built
    assert "unhex" not in plan.lower()


# ---------------------------------------------------------------------------
# a17 — winsorized mean
# ---------------------------------------------------------------------------


def test_a17_winsorized_between_trim_bounds(spark):
    """The winsorized mean must lie within [lo, hi] (it averages
    clamped values), bounds must be ordered, and clamping must move
    the estimate TOWARD the median relative to the raw mean when the
    raw mean sits outside the clamp window."""
    from bc_proj3_spark.plans.aggfuncs import a17_winsorized_mean

    rows = a17_winsorized_mean(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.lo_cents <= r.hi_cents
        assert r.lo_cents / 100 <= r.winsorized_mean <= r.hi_cents / 100
        assert r.n > 0


# ---------------------------------------------------------------------------
# st11 — streaming CountSketch
# ---------------------------------------------------------------------------


def test_st11_state_is_bounded_and_rows_complete(spark):
    """The streaming sketch state is bounded at D rows of W cells, and
    every hash row must be present (tokens hash into all D rows)."""
    from bc_proj3_spark.operators.sketch import CS_DEPTH, CS_WIDTH
    from bc_proj3_spark.streaming.incremental import st11_stream_countsketch

    rows = st11_stream_countsketch(spark, SF_DIR).collect()
    assert 0 < len(rows) <= CS_DEPTH * CS_WIDTH
    assert {r.row_id for r in rows} == set(range(CS_DEPTH))
    assert all(0 <= r.col_id < CS_WIDTH for r in rows)


# ---------------------------------------------------------------------------
# t26 — coverage curve
# ---------------------------------------------------------------------------


def test_t26_coverage_is_monotone_and_bounded(spark):
    """Coverage must be non-decreasing in K, in (0, 1], and hit 1.0
    exactly when K >= vocab."""
    from bc_proj3_spark.operators.textstats import t26_ngram_coverage

    rows = sorted(
        t26_ngram_coverage(spark, SF_DIR).collect(), key=lambda r: r.k
    )
    assert len(rows) == 4
    cov = [r.coverage for r in rows]
    assert cov == sorted(cov)
    for r in rows:
        assert 0.0 < r.coverage <= 1.0
        assert r.covered_tokens <= r.total_tokens
        if r.k >= r.vocab:
            assert r.covered_tokens == r.total_tokens


# ---------------------------------------------------------------------------
# d13 under spill pressure (shuffle squeezed to 2 partitions)
# ---------------------------------------------------------------------------


def test_d13_identical_values_under_spill_pressure():
    """The banded Hamming self-join (the round's new hot-join family)
    must stay value-identical when the session is squeezed to 2
    shuffle partitions with floor-level force-spill thresholds — the
    w3 spill-gate discipline applied to the join/aggregate path."""
    import json
    import subprocess
    import sys

    prog = """
import json, sys
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .appName("spill-sim-d13")
    .config("spark.ui.enabled", "false")
    .config("spark.shuffle.spill.numElementsForceSpillThreshold", "5000")
    .getOrCreate()
)
import __spark_entry__ as E
from tests.test_driver_parity import strict_digest
df = E.queries()["d13_hamming_neardup_pairs"](spark, sys.argv[1])
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

    spec = registry.all_queries()["d13_hamming_neardup_pairs"]
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')"
        )
        res = con.execute(spec.oracle)
        ocols = [d[0] for d in res.description]
        orows = [tuple(r) for r in res.fetchall()]
    finally:
        con.close()
    assert n_rows == len(orows)
    assert digest == strict_digest(ocols, orows), (
        "d13 values diverged under spill pressure"
    )
