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


# ---------------------------------------------------------------------------
# Round-13 registrations: invariants + independent replays
# ---------------------------------------------------------------------------


def _rows(spark, name, sf=SF):
    spec = all_queries()[name]
    cols = None
    out = []
    for r in spec.builder(spark, sf).collect():
        if cols is None:
            cols = list(r.asDict())
        out.append(r.asDict())
    return out


def test_sp17_budget_is_respected(spark):
    from bc_proj3_spark.operators.sampling import SP17_TOKEN_BUDGET

    for row in _rows(spark, "sp17_token_budget_mix"):
        assert row["n_admitted"] <= row["n_docs"]
        assert row["tokens_admitted"] <= SP17_TOKEN_BUDGET
        assert row["budget"] == SP17_TOKEN_BUDGET
        assert row["fill_rate"] == row["tokens_admitted"] / SP17_TOKEN_BUDGET


def test_a19_hhi_bounds(spark):
    for row in _rows(spark, "a19_hhi_concentration"):
        n = row["n_customers"]
        assert 1.0 / n <= row["hhi"] + 1e-12 and row["hhi"] <= 1.0
        assert row["effective_n"] <= n + 1e-9
        assert 0.0 < row["top_share"] <= 1.0
        # top firm share bounds HHI from below by its square
        assert row["hhi"] >= row["top_share"] ** 2 - 1e-12


def test_prof4_entropy_bounds(spark):
    import math

    for row in _rows(spark, "prof4_column_entropy"):
        assert row["n_distinct"] >= 1
        assert -1e-9 <= row["entropy_nats"] <= math.log(row["n_distinct"]) + 1e-6
        assert row["max_share"] >= 1.0 / row["n_distinct"] - 1e-12


def test_t31_vmr_matches_counter_replay(spark):
    """Third-implementation pin: recompute every term's dispersion from
    the raw parquet with collections.Counter and match the engine's
    top-k bit-for-bit (same integer moments, same single division)."""
    import re as _re
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    from bc_proj3_spark.operators.textstats import T31_DF_FLOOR, T31_TOP_K

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    n_docs = tbl.num_rows
    per_term = defaultdict(lambda: [0, 0, 0])  # df, t, s2
    for txt in tbl["text"].to_pylist():
        for term, c in Counter(_re.split(r"\s+", txt.strip())).items():
            st = per_term[term]
            st[0] += 1
            st[1] += c
            st[2] += c * c
    expect = []
    for term, (df, t, s2) in per_term.items():
        if df >= T31_DF_FLOOR:
            expect.append((float(n_docs * s2 - t * t) / float(n_docs * t),
                           term, df, t))
    expect.sort(key=lambda r: (-r[0], r[1]))
    expect = expect[:T31_TOP_K]
    got = [
        (row["vmr"], row["term"], row["df"], row["total_tf"])
        for row in _rows(spark, "t31_term_burstiness")
    ]
    assert got == expect


def test_m7_shares_reconcile_with_m5(spark):
    """Per-source shares sum to 1 and the media-token bill reconciles
    EXACTLY with m5's global per-modality totals."""
    from collections import defaultdict

    rows = _rows(spark, "m7_modality_balance")
    by_source = defaultdict(float)
    media_totals = defaultdict(int)
    for r in rows:
        by_source[r["source"]] += r["token_share"]
        if r["modality"] != "text":
            media_totals[r["modality"]] += r["token_sum"]
    for s, tot in by_source.items():
        assert abs(tot - 1.0) < 1e-9, (s, tot)
    m5 = {r["media_type"]: r["token_sum"] for r in _rows(spark, "m5_token_budget")}
    assert media_totals == m5


def test_e28_matches_pure_python_replay(spark):
    """Third-implementation pin: replay CUPED from the raw parquet —
    md5 arm coin, integer day lattice, exact integer moments, the same
    IEEE chain — and match the engine bit-for-bit."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts", "value"]
    )
    uids = tbl["user_id"].to_pylist()
    ts_us = tbl["ts"].cast(pa.int64()).to_pylist()
    vals = tbl["value"].to_pylist()
    days = [t // 86_400_000_000 for t in ts_us]
    cutover = (min(days) + max(days) + 1) // 2
    per_user = {}
    for uid, d, v in zip(uids, days, vals):
        h = int(hashlib.md5(f"cuped:{uid}".encode()).hexdigest()[:15], 16)
        treated = h % 2
        # F.round is HALF_UP on the double v*100; Python round() is
        # banker's — mirror HALF_UP explicitly (values are positive)
        import math as _m

        cents = _m.floor(v * 100 + 0.5)
        x, y = per_user.get(uid, (treated, 0, 0))[1:] if uid in per_user else (0, 0)
        if d < cutover:
            x += cents
        else:
            y += cents
        per_user[uid] = (treated, x, y)
    n = len(per_user)
    nt = sum(t for t, _, _ in per_user.values())
    sx = sum(x for _, x, _ in per_user.values())
    sy = sum(y for _, _, y in per_user.values())
    sxx = sum(x * x for _, x, _ in per_user.values())
    sxy = sum(x * y for _, x, y in per_user.values())
    sxt = sum(t * x for t, x, _ in per_user.values())
    syt = sum(t * y for t, _, y in per_user.values())
    theta = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    mean_x_all = float(sx) / n
    mean_x_t, mean_y_t = float(sxt) / nt, float(syt) / nt
    mean_x_c = float(sx - sxt) / (n - nt)
    mean_y_c = float(sy - syt) / (n - nt)
    ate_naive = mean_y_t - mean_y_c
    ate_cuped = (mean_y_t - theta * (mean_x_t - mean_x_all)) - (
        mean_y_c - theta * (mean_x_c - mean_x_all)
    )
    (row,) = _rows(spark, "e28_cuped_adjusted_ate")
    assert row["n_users"] == n and row["n_treated"] == nt
    assert row["theta"] == theta
    assert row["ate_naive_cents"] == ate_naive
    assert row["ate_cuped_cents"] == ate_cuped


def test_st14_matches_batch_totals(spark):
    """The streaming meter equals the batch bill: token_sum reconciles
    with t5's per-doc BPE counts summed by language."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    langs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    lang_by_doc = dict(
        zip(langs["doc_id"].to_pylist(), langs["lang"].to_pylist())
    )
    chars = defaultdict(int)
    for d, l, c in zip(
        langs["doc_id"].to_pylist(),
        langs["lang"].to_pylist(),
        langs["n_chars"].to_pylist(),
    ):
        chars[l] += c
    t5 = _rows(spark, "t5_token_count")
    toks = defaultdict(int)
    ndocs = defaultdict(int)
    for r in t5:
        lang = lang_by_doc[r["doc_id"]]
        toks[lang] += r["n_bpe_tokens"]
        ndocs[lang] += 1
    got = {
        r["lang"]: (r["n_docs"], r["token_sum"], r["char_sum"])
        for r in _rows(spark, "st14_stream_token_budget")
    }
    assert got == {
        lang: (ndocs[lang], toks[lang], chars[lang]) for lang in got
    }


def test_t32_kl_nonnegative_and_weighted_mean_zero_bound(spark):
    """KL(p_s || p) over the source's support can be slightly negative
    only through the 9-dp lattice (true KL >= 0 for full support; here
    p is the pooled mixture so p(w) > 0 wherever p_s(w) > 0 and the
    restriction keeps KL >= 0 up to lattice rounding)."""
    rows = _rows(spark, "t32_source_kl_drift")
    assert rows, "no sources"
    for r in rows:
        assert r["kl_nats"] >= -1e-6, r
        assert r["vocab"] <= r["n_tokens"]


def test_e29_mde_monotonicity(spark):
    """A bigger detectable lift needs fewer users: n_required is
    non-increasing in mde_pct within a segment, and the closed form
    replays exactly from the emitted mean/variance."""
    import math
    from collections import defaultdict

    rows = _rows(spark, "e29_sample_size_mde")
    by_seg = defaultdict(dict)
    for r in rows:
        by_seg[r["seg"]][r["mde_pct"]] = r
    for seg, d in by_seg.items():
        ns = [d[p]["n_required_per_arm"] for p in sorted(d)]
        assert ns == sorted(ns, reverse=True), (seg, ns)
        for p, r in d.items():
            mde = r["mean_cents"] * p / 100
            expect = math.ceil(2 * r["var_cents2"] * 7.848879739 / (mde * mde))
            assert r["n_required_per_arm"] == expect


def test_mf1_matches_numpy_replay(spark):
    """Third-implementation pin: re-solve every emitted user's ridge
    normal equations with numpy over the raw parquet and match the
    factors bit-for-bit (exact integer A/b, the same adjugate-form
    divisions)."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    orders = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust_by_order = dict(
        zip(orders["o_orderkey"].to_pylist(), orders["o_custkey"].to_pylist())
    )
    counts = defaultdict(int)
    for ok, pk in zip(li["l_orderkey"].to_pylist(), li["l_partkey"].to_pylist()):
        counts[(cust_by_order[ok], pk)] += 1
    ne = defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # n, a11, a12, a22, b1, b2
    for (cust, pk), c in counts.items():
        v1, v2 = 1 + pk % 7, 1 + pk % 11
        st = ne[cust]
        st[0] += 1
        st[1] += v1 * v1
        st[2] += v1 * v2
        st[3] += v2 * v2
        st[4] += c * v1
        st[5] += c * v2
    expect = []
    for cust, (n, a11, a12, a22, b1, b2) in ne.items():
        a11 += 1
        a22 += 1
        det = float(a11 * a22 - a12 * a12)
        u1 = float(a22 * b1 - a12 * b2) / det
        u2 = float(a11 * b2 - a12 * b1) / det
        expect.append((u1 * u1 + u2 * u2, cust, n, u1, u2))
    expect.sort(key=lambda r: (-r[0], r[1]))
    expect = [
        (c, n, u1, u2, norm) for norm, c, n, u1, u2 in expect[:20]
    ]
    got = [
        (r["custkey"], r["n_items"], r["u1"], r["u2"], r["factor_norm2"])
        for r in _rows(spark, "mf1_als_user_factors")
    ]
    assert got == expect
