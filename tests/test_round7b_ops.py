"""Round-7 second-session additions: invariants the DuckDB oracles
can't express for the four new operators (ch3 content-defined
chunking, s8 hard-negative mining, sp14 epoch up-sampling, dq8
l-diversity) — edit locality, exclusion semantics, recipe arithmetic,
and plan-shape pins.
"""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


# ---------------------------------------------------------------------------
# ch3 — content-defined chunking
# ---------------------------------------------------------------------------


def test_ch3_roundtrip_reconstructs_document(spark):
    """Chunks partition the token stream: concatenating chunk_text in
    chunk_id order must reproduce every document verbatim (no token
    lost or duplicated at a boundary) — the lossless-cover guarantee
    ch1's overlapping windows deliberately do not make."""
    from bc_proj3_spark.operators.chunking import ch3_content_defined_chunks

    chunks = ch3_content_defined_chunks(spark, SF_DIR)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_id", "chunk_text"))
                ).getField("chunk_text"),
                " ",
            ).alias("rebuilt")
        )
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    bad = (
        rebuilt.join(docs, "doc_id")
        .filter(F.col("rebuilt") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_ch3_edit_locality(spark):
    """The content-defined promise: inserting one token near the head
    of a document leaves every chunk after the edited region
    hash-identical (only chunks overlapping the edit window change).
    Under ch1's fixed stride the same edit shifts EVERY downstream
    boundary. Crafted doc: long enough for several chunks; the edit
    lands in chunk 0."""
    from bc_proj3_spark.operators.chunking import cdc_chunks

    base_tokens = [f"tok{i * 7 % 97}x{i}" for i in range(400)]
    edited_tokens = base_tokens[:3] + ["INSERTED"] + base_tokens[3:]
    frame = spark.createDataFrame(
        [
            Row(doc_id=1, text=" ".join(base_tokens)),
            Row(doc_id=2, text=" ".join(edited_tokens)),
        ]
    )
    out = cdc_chunks(frame).select("doc_id", "chunk_hash").collect()
    h1 = {r.chunk_hash for r in out if r.doc_id == 1}
    h2 = {r.chunk_hash for r in out if r.doc_id == 2}
    assert len(h1) > 4, "crafted doc should split into several chunks"
    # all but the edited chunk(s) survive the insertion unchanged
    shared = h1 & h2
    assert len(shared) >= len(h1) - 2, (
        f"edit reshaped {len(h1) - len(shared)} of {len(h1)} chunks — "
        "boundaries are not content-defined"
    )


def test_ch3_plan_is_shuffle_free(spark):
    """ch3 is pure map-side codegen: no Exchange anywhere in the
    physical plan (fanout's round-robin repartition is exempt — it is
    the parallelism seed, not an operator shuffle — so the pin runs on
    the kernel over a pre-partitioned frame)."""
    from bc_proj3_spark.operators.chunking import cdc_chunks

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = (
        cdc_chunks(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


# ---------------------------------------------------------------------------
# s8 — hard-negative mining
# ---------------------------------------------------------------------------


def test_s8_exclusion_semantics(spark):
    """Every mined hard negative must be (a) a different vector than
    its anchor, (b) a different label (never a positive), and (c)
    strictly below the near-duplicate ceiling; at most HARD_NEG_K rows
    per anchor, ranked by cosine."""
    from bc_proj3_spark.operators.similarity import (
        HARD_NEG_CEIL,
        HARD_NEG_K,
        N_QUERIES,
        s8_hard_negatives,
    )

    rows = s8_hard_negatives(spark, SF_DIR).collect()
    emb = {
        r.vec_id: r.label
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    per_anchor: dict[int, int] = {}
    for r in rows:
        assert r.vec_id != r.query_id
        assert r.label != emb[r.query_id], "positive leaked into negatives"
        assert r.cosine < HARD_NEG_CEIL
        per_anchor[r.query_id] = per_anchor.get(r.query_id, 0) + 1
    assert set(per_anchor) <= set(range(N_QUERIES))
    assert all(v <= HARD_NEG_K for v in per_anchor.values())


# ---------------------------------------------------------------------------
# sp14 — fractional epoch up-sampling
# ---------------------------------------------------------------------------


def test_sp14_recipe_arithmetic(spark):
    """Full epochs are exact replicas (identical doc counts per epoch
    1..floor(pct/100)); the fractional epoch is a strict subset; langs
    outside the recipe never appear; epoch count never exceeds
    ceil(pct/100)."""
    from bc_proj3_spark.operators.sampling import EPOCH_PCT, sp14_epoch_upsample

    rows = sp14_epoch_upsample(spark, SF_DIR).collect()
    by_lang: dict[str, dict[int, int]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.epoch] = r.n_docs
    assert set(by_lang) <= set(EPOCH_PCT)
    for lang, epochs in by_lang.items():
        pct = EPOCH_PCT[lang]
        full, frac = pct // 100, pct % 100
        assert max(epochs) <= full + (1 if frac else 0)
        full_counts = {epochs[e] for e in range(1, full + 1) if e in epochs}
        assert len(full_counts) <= 1, f"{lang}: full epochs differ in size"
        if full and (full + 1) in epochs:
            assert epochs[full + 1] < epochs[full], (
                f"{lang}: fractional epoch not a strict subset"
            )


# ---------------------------------------------------------------------------
# dq8 — l-diversity
# ---------------------------------------------------------------------------


def test_dq8_flag_consistency(spark):
    """n_sensitive is bounded by the 3-value band domain and meets_l
    is exactly (n_sensitive >= L_DIVERSE) in every class."""
    from bc_proj3_spark.operators.quality import L_DIVERSE, dq8_l_diversity

    rows = dq8_l_diversity(spark, SF_DIR).collect()
    assert rows, "audit must be non-degenerate at sf0.01"
    for r in rows:
        assert 1 <= r.n_sensitive <= 3
        assert r.meets_l == (r.n_sensitive >= L_DIVERSE)
        assert r.n >= r.n_sensitive


# ---------------------------------------------------------------------------
# s9 — ANN recall monitor
# ---------------------------------------------------------------------------


def test_s9_metric_bounds(spark):
    """One row per query vector; n_hits <= n_exact <= TOP_K; recall is
    exactly n_hits/n_exact; reciprocal rank lives in [0, 1]; and the
    funnel isn't degenerate (LSH recovers at least one true neighbor
    somewhere, else the monitor itself is broken)."""
    from bc_proj3_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        s9_ann_recall,
    )

    rows = s9_ann_recall(spark, SF_DIR).collect()
    assert len(rows) == N_QUERIES
    for r in rows:
        assert 0 <= r.n_hits <= r.n_exact <= TOP_K
        assert abs(r.recall_at_k - r.n_hits / r.n_exact) == 0.0
        assert 0.0 <= r.rr_top1 <= 1.0
    assert sum(r.n_hits for r in rows) > 0


# ---------------------------------------------------------------------------
# dp1 — differentially-private counts
# ---------------------------------------------------------------------------


def test_dp1_noise_bounded_and_deterministic(spark):
    """Binomial(60, 1/2) - 30 noise is bounded by +/-DP_SHIFT around the
    true class count, is not identically zero across the release (the
    mechanism actually perturbs), and the seeded draw is reproducible
    run-to-run."""
    from bc_proj3_spark.operators.quality import DP_SHIFT, dp1_dp_counts

    truth = {
        (r.c_nationkey, r.c_mktsegment): r.n
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rows = dp1_dp_counts(spark, SF_DIR).collect()
    assert len(rows) == len(truth)
    noises = []
    for r in rows:
        noise = r.noisy_n - truth[(r.c_nationkey, r.c_mktsegment)]
        assert abs(noise) <= DP_SHIFT
        noises.append(noise)
    assert any(n != 0 for n in noises), "release must actually perturb"
    again = {
        (r.c_nationkey, r.c_mktsegment): r.noisy_n
        for r in dp1_dp_counts(spark, SF_DIR).collect()
    }
    assert again == {
        (r.c_nationkey, r.c_mktsegment): r.noisy_n for r in rows
    }


# ---------------------------------------------------------------------------
# ts5 — seasonal decomposition
# ---------------------------------------------------------------------------


def test_ts5_components_reconstruct_volume(spark):
    """Additive identity: overall mean + seasonal + residual must equal
    the day's observed volume (within the 1e-6 output rounding), and
    the nd-weighted seasonal profile sums to ~0 per event type — the
    defining constraints of the decomposition."""
    from collections import defaultdict

    from bc_proj3_spark.plans.events import ts5_seasonal_decompose

    rows = ts5_seasonal_decompose(spark, SF_DIR).collect()
    assert rows
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    for et, rs in by_type.items():
        mean = sum(r.n_events for r in rs) / len(rs)
        for r in rs:
            assert abs(mean + r.seasonal + r.residual - r.n_events) < 1e-4
        # nd-weighted seasonal sum: group days by dow, weight = group size
        dow_groups = defaultdict(int)
        seasonal_of = {}
        for r in rs:
            dow_groups[r.dow] += 1
            seasonal_of[r.dow] = r.seasonal
        wsum = sum(seasonal_of[d] * nd for d, nd in dow_groups.items())
        assert abs(wsum) < 1e-2


# ---------------------------------------------------------------------------
# lab3 — Cohen's kappa
# ---------------------------------------------------------------------------


def test_lab3_kappa_bounds_and_identity(spark):
    """po in [0,1]; kappa <= 1 always; kappa reconstructs from the
    integer cells (the common-denominator identity); agreement counts
    are consistent."""
    from bc_proj3_spark.operators.textstats import lab3_annotator_agreement

    rows = lab3_annotator_agreement(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_agree <= r.n_both
        assert 0.0 <= r.po <= 1.0
        assert r.kappa <= 1.0
        assert abs(r.po - r.n_agree / r.n_both) == 0.0


# ---------------------------------------------------------------------------
# g3 — degree assortativity
# ---------------------------------------------------------------------------


def test_g3_single_row_pearson_bounds(spark):
    """One row; assortativity is a Pearson correlation so it lives in
    [-1, 1]; the graph is non-degenerate at sf0.01."""
    from bc_proj3_spark.operators.graph import g3_degree_assortativity

    rows = g3_degree_assortativity(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_nodes > 0 and r.n_edges > 0
    assert -1.0 <= r.assortativity <= 1.0


# ---------------------------------------------------------------------------
# ts6 — autocorrelation
# ---------------------------------------------------------------------------


def test_ts6_lag_structure_and_bounds(spark):
    """Exactly MAX_ACF_LAG rows per event type; n_pairs = n_days - lag
    (clamped at 0); |acf| <= 1 by Cauchy-Schwarz (partial-pair
    numerator over the full-series denominator)."""
    from collections import defaultdict

    from bc_proj3_spark.plans.events import MAX_ACF_LAG, ts6_autocorrelation

    rows = ts6_autocorrelation(spark, SF_DIR).collect()
    assert rows
    by_type = defaultdict(dict)
    for r in rows:
        by_type[r.event_type][r.lag] = r
    for et, lags in by_type.items():
        assert sorted(lags) == list(range(1, MAX_ACF_LAG + 1))
        n_days = lags[1].n_pairs + 1
        for lag, r in lags.items():
            assert r.n_pairs == max(n_days - lag, 0)
            assert abs(r.acf) <= 1.0


# ---------------------------------------------------------------------------
# ts7 — OLS trend
# ---------------------------------------------------------------------------


def test_ts7_matches_direct_least_squares(spark):
    """slope/intercept/r2 agree with a NumPy least-squares fit over the
    same daily series (to float tolerance), and r2 lives in [0, 1]."""
    import numpy as np

    from bc_proj3_spark.plans.events import ts7_trend_slope
    from bc_proj3_spark.plans.tables import table

    rows = {r.event_type: r for r in ts7_trend_slope(spark, SF_DIR).collect()}
    assert rows
    daily = (
        table(spark, SF_DIR, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .count()
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day.toordinal(), r["count"]))
    for et, r in rows.items():
        pts = sorted(series[et])
        x = np.array([p[0] - pts[0][0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        assert r.n_days == len(pts)
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(r.slope_per_day - slope) < 1e-6 * max(1.0, abs(slope))
        assert abs(r.intercept - intercept) < 1e-6 * max(1.0, abs(intercept))
        corr = np.corrcoef(x, y)[0, 1]
        assert abs(r.r2 - corr * corr) < 1e-9
        assert 0.0 <= r.r2 <= 1.0


# ---------------------------------------------------------------------------
# ts8 — Fano factor
# ---------------------------------------------------------------------------


def test_ts8_moment_identities(spark):
    """fano = population variance / mean of the daily series, exactly;
    n_events reconciles with the series total."""
    from bc_proj3_spark.plans.events import ts8_dispersion
    from bc_proj3_spark.plans.tables import table

    rows = {r.event_type: r for r in ts8_dispersion(spark, SF_DIR).collect()}
    assert rows
    daily = (
        table(spark, SF_DIR, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .count()
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.event_type, []).append(r["count"])
    for et, r in rows.items():
        ys = series[et]
        n, s = len(ys), sum(ys)
        sxx = sum(v * v for v in ys)
        assert r.n_days == n and r.n_events == s
        assert r.mean_daily == s / n
        assert r.fano == (n * sxx - s * s) / (n * s)
        assert r.fano > 0.0


# ---------------------------------------------------------------------------
# stat3 — two-sample KS
# ---------------------------------------------------------------------------


def test_stat3_matches_exact_python_ks(spark):
    """d_scaled equals the exact integer KS statistic recomputed from
    the raw cents values in Python, and d is its single division."""
    from bc_proj3_spark.plans.aggfuncs import KS_SEG_A, KS_SEG_B, stat3_ks_test
    from bc_proj3_spark.plans.tables import table

    [r] = stat3_ks_test(spark, SF_DIR).collect()
    cust = (
        table(spark, SF_DIR, "customer")
        .filter(F.col("c_mktsegment").isin(KS_SEG_A, KS_SEG_B))
        .select(
            F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("v"),
            "c_mktsegment",
        )
        .collect()
    )
    a = sorted(x.v for x in cust if x.c_mktsegment == KS_SEG_A)
    b = sorted(x.v for x in cust if x.c_mktsegment == KS_SEG_B)
    na, nb = len(a), len(b)
    assert (r.n_a, r.n_b) == (na, nb)
    best, ca, cb = 0, 0, 0
    for v in sorted(set(a) | set(b)):
        while ca < na and a[ca] <= v:
            ca += 1
        while cb < nb and b[cb] <= v:
            cb += 1
        best = max(best, abs(nb * ca - na * cb))
    assert r.d_scaled == best
    assert r.d == best / (na * nb)
    assert 0.0 < r.d <= 1.0


# ---------------------------------------------------------------------------
# dq9 — t-closeness
# ---------------------------------------------------------------------------


def test_dq9_emd_bounds_and_flag_consistency(spark):
    """emd lives in [0, 1]; the integer meets_t flag agrees with the
    emd value against the 0.2 threshold (exact fractions, so the
    comparison can be replayed in Python rationals)."""
    from fractions import Fraction

    from bc_proj3_spark.operators.quality import dq9_t_closeness

    rows = dq9_t_closeness(spark, SF_DIR).collect()
    assert rows
    assert any(r.meets_t for r in rows)
    for r in rows:
        assert 0.0 <= r.emd <= 1.0
        # reconstruct the exact fraction from the double: emd is one
        # IEEE division of exact ints, so comparing the double to 0.2
        # only at a safe distance; the exact check is the flag itself
        if abs(r.emd - 0.2) > 1e-9:
            assert r.meets_t == (r.emd < 0.2)


# ---------------------------------------------------------------------------
# g4 — rich club
# ---------------------------------------------------------------------------


def test_g4_threshold_monotonicity_and_bounds(spark):
    """Raising k can only shrink the club: n_rich and n_edges_rich are
    non-increasing in k; phi is a density in (0, 1]; every emitted
    threshold has at least two rich nodes."""
    from bc_proj3_spark.operators.graph import g4_rich_club

    rows = sorted(g4_rich_club(spark, SF_DIR).collect(), key=lambda r: r.k)
    assert rows
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_rich <= prev.n_rich
        assert cur.n_edges_rich <= prev.n_edges_rich
    for r in rows:
        assert r.n_rich >= 2
        assert 0.0 <= r.phi <= 1.0
        assert r.phi == 2 * r.n_edges_rich / (r.n_rich * (r.n_rich - 1))


# ---------------------------------------------------------------------------
# t24 — lexical diversity
# ---------------------------------------------------------------------------


def test_t24_matches_python_token_census(spark):
    """vocab / token / hapax counts (and both ratios) replay exactly
    from a Python recount over the collected documents."""
    from collections import Counter

    from bc_proj3_spark.operators.textstats import t24_lexical_diversity
    from bc_proj3_spark.plans.tables import table

    rows = {r.lang: r for r in t24_lexical_diversity(spark, SF_DIR).collect()}
    assert rows
    docs = table(spark, SF_DIR, "documents").select("lang", "text").collect()
    by_lang = {}
    for d in docs:
        by_lang.setdefault(d.lang, Counter()).update(d.text.strip().split())
    assert set(rows) == set(by_lang)
    for lang, cf in by_lang.items():
        r = rows[lang]
        v, n_tok = len(cf), sum(cf.values())
        hapax = sum(1 for c in cf.values() if c == 1)
        assert (r.vocab, r.n_tokens, r.n_hapax) == (v, n_tok, hapax)
        assert r.ttr == v / n_tok
        assert r.hapax_frac == hapax / v


# ---------------------------------------------------------------------------
# stat4 — Poisson bootstrap
# ---------------------------------------------------------------------------


def test_stat4_full_python_replay(spark):
    """The entire bootstrap replays exactly in Python: md5-derived
    Poisson weights, per-resample means, and the order-statistic
    envelope — bit-for-bit, since every number is an exact-integer
    division. Also pins the envelope sanity (lo <= point <= hi)."""
    import hashlib

    from bc_proj3_spark.plans.aggfuncs import (
        _POIS_CUTS,
        BOOT_B,
        stat4_bootstrap_ci,
    )
    from bc_proj3_spark.plans.tables import table

    rows = {r.c_mktsegment: r for r in stat4_bootstrap_ci(spark, SF_DIR).collect()}
    assert rows

    orders = table(spark, SF_DIR, "orders")
    cust = table(spark, SF_DIR, "customer")
    j = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("cents"),
            "o_orderkey",
        )
        .collect()
    )

    def pois_w(key: int, b: int) -> int:
        h = int(hashlib.md5(f"stat4:{key}:{b}".encode()).hexdigest()[:15], 16)
        r = h % 10000
        for w, c in enumerate(_POIS_CUTS):
            if r < c:
                return w
        return len(_POIS_CUTS)

    segs = {}
    for row in j:
        segs.setdefault(row.seg, []).append((row.o_orderkey, row.cents))
    for seg, pts in segs.items():
        r = rows[seg]
        assert r.n_orders == len(pts)
        assert r.mean_price == sum(c for _, c in pts) / (100 * len(pts))
        means = []
        for b in range(BOOT_B):
            s = wsum = 0
            for key, cents in pts:
                w = pois_w(key, b)
                s += w * cents
                wsum += w
            means.append(s / (100 * wsum))
        assert r.ci_lo == min(means)
        assert r.ci_hi == max(means)
        assert r.ci_lo <= r.mean_price <= r.ci_hi


# ---------------------------------------------------------------------------
# e21 — peak concurrency
# ---------------------------------------------------------------------------


def test_e21_matches_python_sweep_over_e2_sessions(spark):
    """The sweep replays exactly in Python over e2's session intervals
    (same gap contract): session count, peak concurrency, and the
    first peak microsecond all match; the peak plan compiles to
    TakeOrderedAndProject (never a global sort)."""
    from bc_proj3_spark.plans.events import (
        e21_peak_concurrency,
        e2_sessionization,
    )

    df = e21_peak_concurrency(spark, SF_DIR)
    assert "TakeOrderedAndProject" in df._jdf.queryExecution().executedPlan().toString()
    [r] = df.collect()
    iv = [
        (s.session_start, s.session_end)
        for s in e2_sessionization(spark, SF_DIR).collect()
    ]
    assert r.n_sessions == len(iv)

    def us(ts):
        import calendar

        return calendar.timegm(ts.timetuple()) * 1_000_000 + ts.microsecond

    deltas = {}
    for s, e in iv:
        deltas[us(s)] = deltas.get(us(s), 0) + 1
        deltas[us(e) + 1] = deltas.get(us(e) + 1, 0) - 1
    cum, peak, peak_t = 0, 0, None
    for t in sorted(deltas):
        cum += deltas[t]
        if cum > peak:
            peak, peak_t = cum, t
    assert (r.peak_concurrent, r.first_peak_us) == (peak, peak_t)
    assert 1 <= r.peak_concurrent <= r.n_sessions


# ---------------------------------------------------------------------------
# two-level prefix sum — bucket width is a performance knob, not semantics
# ---------------------------------------------------------------------------


def test_stat3_bucket_width_invariance(spark, monkeypatch):
    """The KS statistic is identical under a radically different value
    bucketing (shift 16 -> 4): the two-level prefix sum is pure
    plumbing."""
    import bc_proj3_spark.plans.aggfuncs as A

    base = A.stat3_ks_test(spark, SF_DIR).collect()
    monkeypatch.setattr(A, "KS_BUCKET_SHIFT", 4)
    narrow = A.stat3_ks_test(spark, SF_DIR).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, narrow))


def test_e21_bucket_width_invariance(spark, monkeypatch):
    """Peak concurrency is identical under minute-wide sweep buckets
    (3600x more buckets than the hour default)."""
    import bc_proj3_spark.plans.events as E

    base = E.e21_peak_concurrency(spark, SF_DIR).collect()
    monkeypatch.setattr(E, "SWEEP_BUCKET_US", 60_000_000)
    narrow = E.e21_peak_concurrency(spark, SF_DIR).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, narrow))


# ---------------------------------------------------------------------------
# a14 — MAD outliers
# ---------------------------------------------------------------------------


def test_a14_matches_python_order_statistics(spark):
    """Median, MAD, and the outlier census replay exactly in Python
    from the raw cents values (statistics module median = the same
    two-middle-order-statistics rule)."""
    from statistics import median

    from bc_proj3_spark.plans.aggfuncs import MAD_K, a14_mad_outliers
    from bc_proj3_spark.plans.tables import table

    rows = {r.c_mktsegment: r for r in a14_mad_outliers(spark, SF_DIR).collect()}
    assert rows
    cust = (
        table(spark, SF_DIR, "customer")
        .select(
            "c_mktsegment",
            F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("v"),
        )
        .collect()
    )
    segs = {}
    for c in cust:
        segs.setdefault(c.c_mktsegment, []).append(c.v)
    assert set(rows) == set(segs)
    for seg, vs in segs.items():
        r = rows[seg]
        med = median(vs)
        devs = [abs(v - med) for v in vs]
        mad = median(devs)
        assert r.n == len(vs)
        assert r.median_bal == med / 100
        assert r.mad_bal == mad / 100
        assert r.n_outliers == sum(1 for d in devs if d > MAD_K * mad)
        # uniform balances can legitimately yield 0 outliers at 3*MAD
        assert 0 <= r.n_outliers < r.n


# ---------------------------------------------------------------------------
# g5 — effective rank
# ---------------------------------------------------------------------------


def test_g5_bounds_and_numpy_cross_check(spark):
    """1 <= PR <= GRAM_DIM always (Cauchy-Schwarz on the eigenvalue
    vector); the value agrees with a NumPy eigendecomposition of the
    exact Gram to float tolerance; n_vectors matches the table."""
    import numpy as np

    from bc_proj3_spark.operators.linalg import GRAM_DIM, g5_effective_rank
    from bc_proj3_spark.plans.tables import table

    [r] = g5_effective_rank(spark, SF_DIR).collect()
    emb = table(spark, SF_DIR, "embeddings").select("embedding").collect()
    X = np.array([e.embedding for e in emb], dtype=np.float64)
    assert r.n_vectors == X.shape[0]
    G = X.T @ X
    lam = np.linalg.eigvalsh(G)
    pr = lam.sum() ** 2 / (lam**2).sum()
    assert 1.0 <= r.effective_rank <= GRAM_DIM
    assert abs(r.trace - np.trace(G)) < 1e-3 * abs(np.trace(G))
    assert abs(r.effective_rank - pr) < 1e-4 * pr


# ---------------------------------------------------------------------------
# ts9 — cross-correlation
# ---------------------------------------------------------------------------


def test_ts9_matches_numpy_and_bounds(spark):
    """|xcorr| <= 1 at every lag; lag-0 (and every lag) agrees with a
    NumPy Pearson correlation over the same matched day pairs."""
    import numpy as np

    from bc_proj3_spark.plans.events import (
        MAX_XCORR_LAG,
        XCORR_LAG_TYPE,
        XCORR_LEAD,
        ts9_cross_correlation,
    )
    from bc_proj3_spark.plans.tables import table

    rows = {r.lag: r for r in ts9_cross_correlation(spark, SF_DIR).collect()}
    assert rows and set(rows) <= set(range(MAX_XCORR_LAG + 1))
    daily = (
        table(spark, SF_DIR, "events")
        .filter(F.col("event_type").isin(XCORR_LEAD, XCORR_LAG_TYPE))
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .count()
        .collect()
    )
    a, b = {}, {}
    for r in daily:
        (a if r.event_type == XCORR_LEAD else b)[r.day.toordinal()] = r["count"]
    for lag, r in rows.items():
        xs, ys = [], []
        for d, x in a.items():
            if d + lag in b:
                xs.append(x)
                ys.append(b[d + lag])
        assert r.n_pairs == len(xs)
        ref = np.corrcoef(xs, ys)[0, 1]
        assert abs(r.xcorr - ref) < 1e-9
        assert abs(r.xcorr) <= 1.0


# ---------------------------------------------------------------------------
# dp2 — DP mean
# ---------------------------------------------------------------------------


def test_dp2_noise_bounds_and_replay(spark):
    """The release replays exactly in Python (clamp, md5 popcount
    noise, one division); noise never exceeds the binomial mechanism's
    hard bounds (|noise_n| <= 30, |noise_s| <= 30 * DP_SUM_SCALE)."""
    import hashlib

    from bc_proj3_spark.operators.quality import (
        DP_CLAMP_HI,
        DP_CLAMP_LO,
        DP_SHIFT,
        DP_SUM_SCALE,
        dp2_dp_mean,
    )
    from bc_proj3_spark.plans.tables import table

    rows = {r.c_mktsegment: r for r in dp2_dp_mean(spark, SF_DIR).collect()}
    assert rows
    cust = (
        table(spark, SF_DIR, "customer")
        .select(
            "c_mktsegment",
            F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("v"),
        )
        .collect()
    )

    def noise(seed: str, seg: str) -> int:
        h = int(
            hashlib.md5(f"{seed}:{seg}".encode()).hexdigest()[:15], 16
        )
        return bin(h).count("1") - DP_SHIFT

    segs = {}
    for c in cust:
        segs.setdefault(c.c_mktsegment, []).append(
            min(max(c.v, DP_CLAMP_LO), DP_CLAMP_HI)
        )
    assert set(rows) == set(segs)
    for seg, vs in segs.items():
        r = rows[seg]
        nn = len(vs) + noise("dp2n", seg)
        ns = sum(vs) + noise("dp2s", seg) * DP_SUM_SCALE
        assert r.noisy_n == nn
        assert r.noisy_mean == ns / (100 * nn)
        assert abs(r.noisy_n - len(vs)) <= DP_SHIFT
        assert abs(ns - sum(vs)) <= DP_SHIFT * DP_SUM_SCALE
