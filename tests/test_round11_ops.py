"""Round-11 hardening: overflow-headroom pins for the ml2/ml3 fixes.

The r7 advisor found two silent arithmetic caps in operators/mltrain.py:

- ml3's purity-score numerator 2*(pl²+nl²)*10⁹ overflows int64 once a
  feature side accumulates ~6.8e4 positives — far below the claimed
  ~3e6 — so a 1e5-doc corpus errored (DuckDB) or wrapped (Spark
  non-ANSI). Fixed by carrying the numerator in HUGEINT (DuckDB) /
  DECIMAL(38,0) (Spark); the binding bound is now the BIGINT result
  ≈ p·10⁹ < 2⁶³, i.e. ~9.2e9 positives per feature.
- ml2 collapsed per-(doc, token) counts to DECIMAL(4,0) — a hard cap
  of 9,999 occurrences of one token in one document. Widened to
  DECIMAL(9,0), which keeps the (9,0)×(28,10) product at exactly
  precision 38 (no silent rescale).

Both pins build a synthetic documents table that sits ABOVE the old
cap and assert exact Spark↔DuckDB parity through the driver-grade
comparator — on the old arithmetic these inputs error/diverge.
"""

from __future__ import annotations

import duckdb
import pytest

from bc_proj3_spark.registry import all_queries
from conftest import strict_rows_key

SPECS = all_queries()


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
    assert skey == okey, f"{spec.name}: value drift above the old cap"
    return srows, scols


def test_ml3_purity_score_survives_70k_positives(spark, tmp_path):
    """70,001 positives on one split side: the old int64 numerator
    needs 2·(70001²)·10⁹ ≈ 9.8e18 > 2⁶³ and dies; the widened
    arithmetic must stay exact across both engines."""
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT i AS doc_id, 'aa bb cc' AS text, 'en' AS lang,
                 'synthetic' AS source, CAST(250 AS BIGINT) AS n_chars
          FROM range(70001) t(i)
          UNION ALL
          SELECT 70001 + i, 'aa bb', 'en', 'synthetic', CAST(10 AS BIGINT)
          FROM range(1000) t(i)
        ) TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()

    rows, cols = _run_vs_oracle(
        spark, SPECS["ml3_decision_stump"], str(tmp_path)
    )
    row = dict(zip(cols, rows[0]))
    # the 2-word/3-word split separates the classes perfectly
    assert row["threshold"] == 2
    assert row["n_correct"] == 71001
    assert row["accuracy"] == 1.0
    # and the score really exercised the >2^63 numerator region:
    # right side is the pure 70001-positive leaf, pl·S ≈ 7.0e13
    assert row["score_scaled"] > 70_000 * 10**9


def test_ml2_token_count_survives_10k_repeats(spark, tmp_path):
    """One document repeating a token 10,000 times: the old
    DECIMAL(4,0) cast errors (DuckDB) / nulls (Spark). The widened
    DECIMAL(9,0) path must agree exactly across engines."""
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT 1 AS doc_id, repeat('zzzz ', 10000) AS text,
                 'en' AS lang, 'synthetic' AS source,
                 CAST(50000 AS BIGINT) AS n_chars
          UNION ALL
          SELECT 2, 'zzzz wwww vvvv', 'en', 'synthetic', CAST(14 AS BIGINT)
          UNION ALL
          SELECT 3, 'qqqq rrrr qqqq', 'fr', 'synthetic', CAST(14 AS BIGINT)
          UNION ALL
          SELECT 4, 'rrrr qqqq wwww', 'fr', 'synthetic', CAST(14 AS BIGINT)
        ) TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()

    rows, cols = _run_vs_oracle(
        spark, SPECS["ml2_naive_bayes_confusion"], str(tmp_path)
    )
    conf = {
        (r[cols.index("lang")], r[cols.index("predicted")]): r[
            cols.index("n_docs")
        ]
        for r in rows
    }
    # the 10k-repeat doc dominates the 'en' class-conditional mass;
    # doc 1 must still classify (a NULLed count would drop its evidence)
    assert sum(conf.values()) == 4


def test_r11_ops_mirror_oracle_on_empty_tables(spark, tmp_path):
    """Zero-row inputs must produce the oracle's exact output for every
    r11 registration (the standing r9/r10 hardening discipline —
    Spark 4 ANSI division throws where DuckDB yields NULL, so empty
    frames are where driver-side guards break first)."""
    import os

    from bc_proj3_spark.plans.tables import TABLE_NAMES
    from tests.conftest import SF_DIR
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
        "pipe3_recipe_attrition",
        "hs5_mrr_eval",
        "cal3_expected_calibration_error",
        "ev1_pass_at_k",
        "ev2_bleu_corpus",
        "s13_dim_ablation_recall",
        "sp16_pack_efficiency",
        "ev3_chargram_fscore",
        "s14_pq_adc_recall",
        "ev4_brier_score",
        "d16_cross_split_leakage",
        "rag1_context_budget",
    ]
    try:
        for name in names:
            spec = SPECS[name]
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


def test_pipe3_ledger_is_internally_consistent(spark):
    """The attrition ledger must chain: stage N's docs_in equals stage
    N-1's docs_out, drops are non-negative, docs_out = in - dropped,
    and the token budget never grows through a stage."""
    rows = {
        r["stage_order"]: r.asDict()
        for r in SPECS["pipe3_recipe_attrition"]
        .builder(spark, "/root/testdata/sf0.01")
        .collect()
    }
    assert sorted(rows) == [1, 2, 3, 4, 5]
    prev_out = None
    prev_tok = None
    for i in range(1, 6):
        r = rows[i]
        assert r["docs_dropped"] >= 0
        assert r["docs_out"] == r["docs_in"] - r["docs_dropped"]
        if prev_out is not None:
            assert r["docs_in"] == prev_out
            assert r["tokens_out"] <= prev_tok
        prev_out, prev_tok = r["docs_out"], r["tokens_out"]
    assert rows[5]["n_packs"] >= 1
    # packing covers the surviving token budget: windows x capacity
    # must be able to hold the tokens that remain
    from bc_proj3_spark.operators.sampling import PACK_BUCKETS, PACK_WINDOW

    assert rows[5]["n_packs"] * PACK_WINDOW >= rows[5]["tokens_out"] - (
        PACK_BUCKETS * PACK_WINDOW
    )


def test_eval_metrics_live_in_their_ranges(spark):
    """Range/monotonicity pins the oracle compare can't express: pass@k
    dominates pass@1, recall and F-scores live in [0, 1]."""
    sf = "/root/testdata/sf0.01"
    ev1 = SPECS["ev1_pass_at_k"].builder(spark, sf).collect()
    assert ev1 and all(
        0.0 <= r["pass_at_1"] <= r["pass_at_10"] <= 1.0 for r in ev1
    )
    s13 = SPECS["s13_dim_ablation_recall"].builder(spark, sf).collect()
    assert s13 and all(0.0 <= r["recall"] <= 1.0 for r in s13)
    ev3 = SPECS["ev3_chargram_fscore"].builder(spark, sf).collect()[0]
    assert 0.0 <= ev3["chrf2"] <= 1.0
    assert 0.0 <= ev3["chr_precision"] <= 1.0
    assert 0.0 <= ev3["chr_recall"] <= 1.0
    hs5 = SPECS["hs5_mrr_eval"].builder(spark, sf).collect()
    assert hs5 and all(
        (r["first_rel_rank"] is None and r["rr"] == 0.0)
        or (1 <= r["first_rel_rank"] and 0.0 < r["rr"] <= 1.0)
        for r in hs5
    )


def test_ev1_falling_factorial_matches_comb_exactly(spark):
    """ev1's explicit 10-factor product must equal the textbook
    1 - C(n-c,k)/C(n,k) for EVERY possible success count, including
    the n-c < k region where the estimator must hit exactly 1. Built
    as a synthetic events table with one task per c in 0..20."""
    import math

    from bc_proj3_spark.operators.llmeval import N_SAMP, PASS_K

    rows = []
    eid = 0
    for c in range(N_SAMP + 1):
        for i in range(N_SAMP):
            rows.append(
                (eid, c, "purchase" if i < c else "view")
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        # events.parquet needs the full schema table() expects
        df.selectExpr(
            "event_id",
            "timestamp_micros(event_id) AS ts",
            "user_id",
            "event_type",
            "CAST(1.0 AS DOUBLE) AS value",
            "'{}' AS props",
        ).write.parquet(f"{tmp}/events.parquet")
        got = {
            r["task_id"]: (r["n_correct"], r[f"pass_at_{PASS_K}"])
            for r in SPECS["ev1_pass_at_k"].builder(spark, tmp).collect()
        }
    assert len(got) == N_SAMP + 1
    for c in range(N_SAMP + 1):
        n_correct, pk = got[c]
        assert n_correct == c
        want = 1.0 - (
            math.comb(N_SAMP - c, PASS_K) / math.comb(N_SAMP, PASS_K)
            if N_SAMP - c >= PASS_K
            else 0.0
        )
        assert pk == want, (c, pk, want)


SF001 = "/root/testdata/sf0.001"


def test_ev2_ev3_match_pure_python_counters(spark):
    """Third-implementation pin: the Spark builder and the DuckDB
    oracle could share a conceptual bug (both were written against the
    same design); an independent collections.Counter recompute over
    the raw parquet breaks that correlation for the clipped-count
    cores of ev2 (token n-grams) and ev3 (character n-grams)."""
    import re as _re
    from collections import Counter

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF001}/documents.parquet").to_pydict()
    docs = dict(zip(tbl["doc_id"], tbl["text"]))
    pairs = [
        (docs[i], docs[i + 1])
        for i in docs
        if i % 2 == 0 and (i + 1) in docs
    ]

    def toks(s):
        return _re.split(r"\s+", s.strip())

    def bigrams(ws):
        return [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    def chargrams(s, n=4):
        s = s.lower()
        return [s[i : i + n] for i in range(max(len(s) - n + 1, 0))]

    def clipped(h_items, r_items):
        hc, rc = Counter(h_items), Counter(r_items)
        return sum(min(c, rc[g]) for g, c in hc.items())

    want_c1 = sum(clipped(toks(h), toks(r)) for h, r in pairs)
    want_c2 = sum(
        clipped(bigrams(toks(h)), bigrams(toks(r))) for h, r in pairs
    )
    want_hyp = sum(len(toks(h)) for h, _ in pairs)
    want_chr = sum(clipped(chargrams(h), chargrams(r)) for h, r in pairs)

    ev2 = SPECS["ev2_bleu_corpus"].builder(spark, SF001).collect()[0]
    assert ev2["clip1"] == want_c1
    assert ev2["clip2"] == want_c2
    assert ev2["hyp_len"] == want_hyp
    ev3 = SPECS["ev3_chargram_fscore"].builder(spark, SF001).collect()[0]
    assert ev3["clip"] == want_chr


def test_s13_s14_match_numpy_ground_truth(spark):
    """Third-implementation pin for the retrieval evals: recompute both
    rankings with numpy (float64, same tiebreaks) and require the same
    overlap counts the engine reports."""
    import numpy as np
    import pyarrow.parquet as pq

    from bc_proj3_spark.operators.similarity import (
        ABLATE_DIM,
        N_QUERIES,
        PQ_K,
        PQ_M,
        PQ_SUB,
        TOP_K,
    )

    tbl = pq.read_table(f"{SF001}/embeddings.parquet").to_pydict()
    ids = np.array(tbl["vec_id"])
    order = np.argsort(ids)
    ids = ids[order]
    V = np.array(
        [np.array(v, dtype=np.float64) for v in tbl["embedding"]]
    )[order]

    def topk_cosine(M, qi):
        q = M[qi]
        sims = (M @ q) / (np.linalg.norm(M, axis=1) * np.linalg.norm(q))
        cand = [(-s, i) for i, s in zip(ids, sims) if i != ids[qi]]
        cand.sort()
        return {i for _, i in cand[:TOP_K]}

    # s13: full-width vs truncated cosine top-k overlap
    want13 = {}
    for qi in range(N_QUERIES):
        full = topk_cosine(V, qi)
        trunc = topk_cosine(V[:, :ABLATE_DIM], qi)
        want13[ids[qi]] = len(full & trunc)
    got13 = {
        r["query_id"]: r["n_overlap"]
        for r in SPECS["s13_dim_ablation_recall"]
        .builder(spark, SF001)
        .collect()
    }
    assert got13 == want13

    # s14: exact-L2 vs PQ-ADC top-k overlap
    def topk_l2(dist, qi):
        cand = [(d, i) for d, i in zip(dist, ids) if i != ids[qi]]
        cand.sort()
        return {i for _, i in cand[:TOP_K]}

    codebook = {
        (m, cid): V[cid, m * PQ_SUB : (m + 1) * PQ_SUB]
        for m in range(PQ_M)
        for cid in range(PQ_K)
    }
    assign = np.empty((len(ids), PQ_M), dtype=int)
    for m in range(PQ_M):
        sub = V[:, m * PQ_SUB : (m + 1) * PQ_SUB]
        d2 = np.array(
            [((sub - codebook[(m, c)]) ** 2).sum(axis=1) for c in range(PQ_K)]
        )  # (K, N)
        assign[:, m] = np.argmin(d2, axis=0)  # ties: lowest cid, argmin does
    want14 = {}
    for qi in range(N_QUERIES):
        exact = topk_l2(((V - V[qi]) ** 2).sum(axis=1), qi)
        adc = np.zeros(len(ids))
        for m in range(PQ_M):
            qsub = V[qi, m * PQ_SUB : (m + 1) * PQ_SUB]
            for x in range(len(ids)):
                adc[x] += ((qsub - codebook[(m, assign[x, m])]) ** 2).sum()
        want14[ids[qi]] = len(exact & topk_l2(adc, qi))
    got14 = {
        r["query_id"]: r["n_overlap"]
        for r in SPECS["s14_pq_adc_recall"].builder(spark, SF001).collect()
    }
    assert got14 == want14


def test_ml1_trajectory_matches_python_replay(spark):
    """Third-implementation pin for the r8 driver prefix's slot 1: the
    perceptron's integer trajectory replayed in pure Python over the
    raw parquet must match round for round."""
    import re as _re

    import pyarrow.parquet as pq

    from bc_proj3_spark.operators.mltrain import (
        PERCEPTRON_CENTER,
        PERCEPTRON_LABEL_CHARS,
        PERCEPTRON_ROUNDS,
    )

    tbl = pq.read_table(f"{SF001}/documents.parquet").to_pydict()
    c1, c2, c3 = PERCEPTRON_CENTER
    rows = []
    for text, n_chars in zip(tbl["text"], tbl["n_chars"]):
        toks = _re.split(r"\s+", text.strip())
        rows.append(
            (
                1,
                len(toks) - c1,
                sum(1 for t in toks if t in ("the", "a")) - c2,
                len(set(toks)) - c3,
                1 if n_chars >= PERCEPTRON_LABEL_CHARS else -1,
            )
        )
    w = [0, 0, 0, 0]
    want = []
    for _ in range(PERCEPTRON_ROUNDS):
        upd = [0, 0, 0, 0]
        mistakes = 0
        for x0, x1, x2, x3, y in rows:
            if y * (w[0] * x0 + w[1] * x1 + w[2] * x2 + w[3] * x3) <= 0:
                mistakes += 1
                for i, x in enumerate((x0, x1, x2, x3)):
                    upd[i] += y * x
        w = [a + b for a, b in zip(w, upd)]
        want.append((mistakes, tuple(w), mistakes / len(rows)))

    got = sorted(
        SPECS["ml1_perceptron_train"].builder(spark, SF001).collect(),
        key=lambda r: r["round"],
    )
    assert len(got) == PERCEPTRON_ROUNDS
    for r, (mk, wk, er) in zip(got, want):
        assert r["n_mistakes"] == mk
        assert (r["w0"], r["w1"], r["w2"], r["w3"]) == wk
        assert r["error_rate"] == er


def test_bt1_strengths_match_python_replay(spark):
    """Third-implementation pin for slot 4: Bradley-Terry's half-up
    scaled-integer MM walk replayed in pure Python (Decimal half-up
    cents, exact integer divisions) must match the engine bit for
    bit."""
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    import pyarrow.parquet as pq

    from bc_proj3_spark.operators.mltrain import BT_ROUNDS, BT_SCALE

    o = pq.read_table(f"{SF001}/orders.parquet").to_pydict()
    c = pq.read_table(f"{SF001}/customer.parquet").to_pydict()
    seg_of = dict(zip(c["c_custkey"], c["c_mktsegment"]))
    cells = defaultdict(int)
    for ck, day, price in zip(
        o["o_custkey"], o["o_orderdate"], o["o_totalprice"]
    ):
        # Spark/DuckDB ROUND(double*100, 0) rounds HALF_UP on the
        # shortest decimal repr — Decimal(repr(x)) replicates it
        cents = int(
            Decimal(repr(price * 100)).quantize(
                Decimal(1), rounding=ROUND_HALF_UP
            )
        )
        cells[(day, seg_of[ck])] += cents
    by_day = defaultdict(list)
    for (day, seg), cents in cells.items():
        by_day[day].append((seg, cents))
    n = defaultdict(int)
    wins = defaultdict(int)
    matches = defaultdict(int)
    for day, entries in by_day.items():
        entries.sort()
        for ai in range(len(entries)):
            for bi in range(ai + 1, len(entries)):
                (sa, ca), (sb, cb) = entries[ai], entries[bi]
                n[(sa, sb)] += 1
                winner = sb if cb > ca else sa
                wins[winner] += 1
                matches[sa] += 1
                matches[sb] += 1
    players = sorted(matches)
    assert players, "fixture must produce at least one duel"
    s = BT_SCALE

    def halfup(a, b):
        return (2 * a + b) // (2 * b)

    p = {i: s // len(players) for i in players}
    for _ in range(BT_ROUNDS):
        d = {
            i: sum(
                halfup(
                    n[(min(i, j), max(i, j))] * s * s, p[i] + p[j]
                )
                for j in players
                if j != i and n[(min(i, j), max(i, j))]
            )
            for i in players
        }
        u = {i: halfup(wins[i] * s * s, d[i]) for i in players}
        tot = sum(u.values())
        p = {i: halfup(u[i] * s, tot) for i in players}

    got = {
        r["seg"]: (r["n_wins"], r["n_matches"], r["p_scaled"], r["strength"])
        for r in SPECS["bt1_bradley_terry"].builder(spark, SF001).collect()
    }
    assert set(got) == set(players)
    for i in players:
        assert got[i] == (wins[i], matches[i], p[i], p[i] / s), (
            i,
            got[i],
            (wins[i], matches[i], p[i], p[i] / s),
        )


def test_g13_hits_matches_python_replay(spark):
    """Third-implementation pin for prefix slot 7: the HITS half-up
    scaled-integer walk (L1-normalized hub/authority rounds over the
    customer->part bipartite edges) replayed in pure Python must match
    the engine's top-k bit for bit."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    from bc_proj3_spark.operators.graph import (
        HITS_ROUNDS,
        HITS_SCALE,
        HITS_TOP_K,
    )

    o = pq.read_table(f"{SF001}/orders.parquet").to_pydict()
    li = pq.read_table(f"{SF001}/lineitem.parquet").to_pydict()
    cust_of = dict(zip(o["o_orderkey"], o["o_custkey"]))
    edges = {
        (cust_of[ok], pk)
        for ok, pk in zip(li["l_orderkey"], li["l_partkey"])
        if ok in cust_of
    }
    out_of = defaultdict(list)
    in_of = defaultdict(list)
    for u, v in edges:
        out_of[u].append(v)
        in_of[v].append(u)
    s = HITS_SCALE

    def halfup(num, den):
        return (2 * num + den) // (2 * den)

    h = {u: s // len(out_of) for u in out_of}
    a = {}
    for _ in range(HITS_ROUNDS):
        ar = {v: sum(h[u] for u in in_of[v]) for v in in_of}
        tot = sum(ar.values())
        a = {v: halfup(r * s, tot) for v, r in ar.items()}
        hr = {u: sum(a[v] for v in out_of[u]) for u in out_of}
        tot = sum(hr.values())
        h = {u: halfup(r * s, tot) for u, r in hr.items()}
    want = sorted(a.items(), key=lambda kv: (-kv[1], kv[0]))[:HITS_TOP_K]

    got = [
        (r["part_key"], r["auth_scaled"], r["authority"])
        for r in SPECS["g13_hits_authorities"].builder(spark, SF001).collect()
    ]
    assert got == [(v, av, av / s) for v, av in want]


def test_e24_markov_matches_python_replay(spark):
    """Third-implementation pin for prefix slot 8: the Markov-chain
    power iteration's half-up 1e-9 fixed-point walk replayed in pure
    Python over the raw events (DuckDB's microsecond truncation
    mirrors the engine's ts normalization) must match bit for bit."""
    from collections import defaultdict

    from bc_proj3_spark.plans.events import MARKOV_ROUNDS, MARKOV_SCALE

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, ts, event_id, event_type FROM "
        f"read_parquet('{SF001}/events.parquet') "
        f"ORDER BY user_id, ts, event_id"
    ).fetchall()
    con.close()
    by_user = defaultdict(list)
    for uid, _, _, et in rows:
        by_user[uid].append(et)
    cells = defaultdict(int)
    types = set()
    for seq in by_user.values():
        types.update(seq)
        for a, b in zip(seq, seq[1:]):
            cells[(a, b)] += 1
    s = MARKOV_SCALE

    def halfup(num, den):
        return (2 * num + den) // (2 * den)

    tot = defaultdict(int)
    for (a, _), n in cells.items():
        tot[a] += n
    q = {k: halfup(n * s, tot[k[0]]) for k, n in cells.items()}
    p = {t: s // len(types) for t in sorted(types)}
    for _ in range(MARKOV_ROUNDS):
        m = defaultdict(int)
        for (a, b), qv in q.items():
            m[b] += halfup(p[a] * qv, s)
        p = {t: m.get(t, 0) for t in types}

    got = {
        r["event_type"]: (r["pi_scaled"], r["pi"])
        for r in SPECS["e24_markov_stationary"].builder(spark, SF001).collect()
    }
    assert got == {t: (p[t], p[t] / s) for t in types}


def test_t28_textrank_matches_python_replay(spark):
    """Third-implementation pin for prefix slot 10: TextRank's damped
    half-up fixed-point walk over the symmetrized co-occurrence graph,
    replayed in pure Python from the raw text through the same
    tokenizer rules, must reproduce the engine's top-k exactly."""
    import re as _re
    from collections import defaultdict

    import pyarrow.parquet as pq

    from bc_proj3_spark.functions.text import (
        MIN_TOKEN_LEN,
        NON_ALNUM_RE,
        STOPWORDS,
        URL_RE,
        WS_RE,
    )
    from bc_proj3_spark.operators.textstats import (
        TEXTRANK_ROUNDS,
        TEXTRANK_SCALE,
        TEXTRANK_TOP_K,
    )

    stop = set(STOPWORDS)

    def tokenize(text):
        t = text.lower()
        t = _re.sub(URL_RE, " ", t)
        t = _re.sub(NON_ALNUM_RE, " ", t)
        return [
            x
            for x in _re.split(WS_RE, t)
            if len(x) > MIN_TOKEN_LEN and x not in stop
        ]

    tbl = pq.read_table(f"{SF001}/documents.parquet").to_pydict()
    sym = defaultdict(int)
    for text in tbl["text"]:
        w = tokenize(text)
        for a, b in zip(w, w[1:]):
            if a != b:
                sym[(a, b)] += 1
                sym[(b, a)] += 1
    s = TEXTRANK_SCALE

    def halfup(num, den):
        return (2 * num + den) // (2 * den)

    deg = defaultdict(int)
    for (u, _), n in sym.items():
        deg[u] += n
    q = {(u, v): halfup(n * s, deg[u]) for (u, v), n in sym.items()}
    nn = len(deg)
    base = (2 * 15 * s + 100 * nn) // (2 * 100 * nn)
    r = {u: s // nn for u in deg}
    for _ in range(TEXTRANK_ROUNDS):
        contrib = defaultdict(int)
        for (u, v), qv in q.items():
            contrib[v] += halfup(qv * r[u], s)
        r = {v: base + halfup(85 * c, 100) for v, c in contrib.items()}
    want = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[
        :TEXTRANK_TOP_K
    ]

    got = [
        (row["word"], row["rank_scaled"], row["rank"])
        for row in SPECS["t28_textrank_keywords"]
        .builder(spark, SF001)
        .collect()
    ]
    assert got == [(w, rv, rv / s) for w, rv in want]


def test_cal2_isotonic_matches_python_pav(spark):
    """Third-implementation pin for prefix slot 5: the max-min PAV
    characterization replayed in pure Python (exact integer pooled
    sums, one IEEE division per pooled rate) must match the engine's
    fitted monotone rates exactly."""
    from collections import defaultdict

    import pyarrow.parquet as pq

    from bc_proj3_spark.operators.quality import CAL2_BIN_CHARS

    tbl = pq.read_table(f"{SF001}/documents.parquet").to_pydict()
    w = defaultdict(int)
    s = defaultdict(int)
    for text, n_chars in zip(tbl["text"], tbl["n_chars"]):
        b = min(9, n_chars // CAL2_BIN_CHARS)
        w[b] += 1
        s[b] += 1 if "spark" in text else 0
    bins = sorted(w)

    def pooled(j, k):
        return sum(s[b] for b in bins if j <= b <= k) / sum(
            w[b] for b in bins if j <= b <= k
        )

    want = {}
    for i in bins:
        want[i] = max(
            min(pooled(j, k) for k in bins if k >= max(i, j))
            for j in bins
            if j <= i
        )
    # the fit must be monotone non-decreasing — PAV's defining property
    fitted = [want[b] for b in bins]
    assert fitted == sorted(fitted)

    got = {
        r["bin"]: (r["n_docs"], r["raw_rate"], r["iso_rate"])
        for r in SPECS["cal2_isotonic_calibration"]
        .builder(spark, SF001)
        .collect()
    }
    assert got == {
        b: (w[b], s[b] / w[b], want[b]) for b in bins
    }


def test_g11_label_propagation_matches_python_replay(spark):
    """Third-implementation pin for prefix slot 6: the synchronous
    label-propagation trajectory (count DESC, label ASC argmax over
    neighbor labels on the support-filtered co-purchase graph)
    replayed in pure Python must match the census round for round."""
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    from bc_proj3_spark.operators.graph import LP_MIN_SUPPORT, LP_ROUNDS

    li = pq.read_table(f"{SF001}/lineitem.parquet").to_pydict()
    items = defaultdict(set)
    for ok, pk in zip(li["l_orderkey"], li["l_partkey"]):
        items[ok].add(pk)
    support = Counter()
    for parts in items.values():
        ps = sorted(parts)
        for ai in range(len(ps)):
            for bi in range(ai + 1, len(ps)):
                support[(ps[ai], ps[bi])] += 1
    nbrs = defaultdict(list)
    for (u, v), c in support.items():
        if c >= LP_MIN_SUPPORT:
            nbrs[u].append(v)
            nbrs[v].append(u)
    lab = {n: n for n in nbrs}
    want = [(0, len(lab), 0)]
    for rnd in range(1, LP_ROUNDS + 1):
        new = {}
        for n in nbrs:
            counts = Counter(lab[m] for m in nbrs[n])
            new[n] = min(
                counts, key=lambda L: (-counts[L], L)
            )
        moved = sum(1 for n in nbrs if new[n] != lab[n])
        lab = new
        want.append((rnd, len(set(lab.values())), moved))

    got = sorted(
        (r["round"], r["n_communities"], r["n_moved"])
        for r in SPECS["g11_label_propagation"]
        .builder(spark, SF001)
        .collect()
    )
    assert got == want


def test_t27_bpe_matches_python_replay(spark):
    """Third-implementation pin for prefix slot 9: the BPE training
    trajectory (frequency-weighted pair counts, (count DESC, pair ASC)
    winner, greedy leftmost-non-overlapping merge) replayed in pure
    Python over the tokenizer's vocabulary must match every round's
    merge, count, changed-spelling count and symbol total."""
    import re as _re
    from collections import Counter

    import pyarrow.parquet as pq

    from bc_proj3_spark.functions.text import (
        MIN_TOKEN_LEN,
        NON_ALNUM_RE,
        STOPWORDS,
        URL_RE,
        WS_RE,
    )
    from bc_proj3_spark.operators.textstats import BPE_ROUNDS

    stop = set(STOPWORDS)

    def tokenize(text):
        t = text.lower()
        t = _re.sub(URL_RE, " ", t)
        t = _re.sub(NON_ALNUM_RE, " ", t)
        return [
            x
            for x in _re.split(WS_RE, t)
            if len(x) > MIN_TOKEN_LEN and x not in stop
        ]

    tbl = pq.read_table(f"{SF001}/documents.parquet").to_pydict()
    vocab = Counter()
    for text in tbl["text"]:
        vocab.update(tokenize(text))
    spell = {w: list(w) for w in vocab}
    want = []
    for _ in range(BPE_ROUNDS):
        pairs = Counter()
        for w, freq in vocab.items():
            a = spell[w]
            for i in range(len(a) - 1):
                pairs[(a[i], a[i + 1])] += freq
        (x, y), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        changed = 0
        total = 0
        for w in vocab:
            a = spell[w]
            out = []
            i = 0
            while i < len(a):
                if i + 1 < len(a) and a[i] == x and a[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(a[i])
                    i += 1
            if out != a:
                changed += 1
                spell[w] = out
            total += vocab[w] * len(spell[w])
        want.append((f"{x} {y}", cnt, changed, total))

    got = sorted(
        SPECS["t27_bpe_learn"].builder(spark, SF001).collect(),
        key=lambda r: r["round"],
    )
    assert len(got) == BPE_ROUNDS
    for r, (pair, cnt, changed, total) in zip(got, want):
        assert (
            r["merged_pair"],
            r["weighted_count"],
            r["n_spellings_changed"],
            r["total_symbols"],
        ) == (pair, cnt, changed, total)


def test_o3_take_n_display_samples(spark):
    """SURVEY §2 O3: the reference's notebook display verb is a plain
    bounded ``df.take(n)`` (silver_arxiv.py:105,
    gold_integrated_data_preNLP.py:75,111,147) — a driver-side fetch of
    n rows, never a full collect. Anchored here so every §2 row has a
    test."""
    from bc_proj3_spark.plans.tables import table

    rows = table(spark, "/root/testdata/sf0.001", "documents").take(5)
    assert len(rows) == 5 and {"doc_id", "text"} <= set(rows[0].asDict())
