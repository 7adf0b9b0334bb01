"""Round-9 additions: invariants the DuckDB oracles can't express for
the new operators — metric identities (nDCG vs recall coupling,
modularity bounded and consistent with its per-community terms),
conservation laws (span coverage never exceeds token count, hit counts
bounded by gram counts), trajectory laws (label-propagation communities
never increase), and cross-query consistency (d15's split replays sp1
exactly; g12's graph is g11's).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# hs3 — nDCG@k retrieval eval
# ---------------------------------------------------------------------------


def test_hs3_ndcg_bounds_and_recall_coupling(spark):
    """nDCG in [0, 1]; nDCG == 1 requires a perfect hit set; zero hits
    forces nDCG == 0; and hs3's n_rel_found must equal s9's n_hits —
    the two monitors must never disagree about WHAT was found, only
    grade HOW it was ordered."""
    from bc_proj3_spark.operators.similarity import (
        hs3_ndcg_eval,
        s9_ann_recall,
    )

    hs3 = {r.query_id: r for r in hs3_ndcg_eval(spark, SF_DIR).collect()}
    spark.catalog.clearCache()
    s9 = {r.query_id: r for r in s9_ann_recall(spark, SF_DIR).collect()}
    assert set(hs3) == set(s9) and hs3
    for qid, r in hs3.items():
        assert 0.0 <= r.ndcg <= 1.0 + 1e-12
        assert r.n_rel_found == s9[qid].n_hits
        if r.n_rel_found == 0:
            assert r.ndcg == 0.0
        if r.ndcg >= 1.0 - 1e-12:
            assert r.n_rel_found == 10


def test_hs3_dcg_weights_are_compile_time_literals(spark):
    """No log/ln of data anywhere in the physical plan: the discount
    lattice is baked as decimal literals (the whole point of the
    design — neither engine evaluates a transcendental)."""
    from bc_proj3_spark.operators.similarity import hs3_ndcg_eval

    plan = _plan(hs3_ndcg_eval(spark, SF_DIR))
    assert "LOG(" not in plan.upper().replace("LOGICAL", "")


# ---------------------------------------------------------------------------
# d14 — duplicated-span coverage
# ---------------------------------------------------------------------------


def test_d14_coverage_accounting(spark):
    """Covered tokens never exceed the doc's token count, never exceed
    SPAN_N * n_dup_grams (each gram covers at most SPAN_N tokens), and
    are at least SPAN_N when any duplicated gram exists (a span is
    never partially counted at its first occurrence)."""
    from bc_proj3_spark.operators.dedup import SPAN_N, d14_span_coverage

    rows = d14_span_coverage(spark, SF_DIR).collect()
    assert rows
    assert any(r.n_dup_grams > 0 for r in rows)
    for r in rows:
        assert 0 <= r.n_covered_tokens <= r.n_tokens
        assert r.n_covered_tokens <= SPAN_N * r.n_dup_grams
        if r.n_dup_grams:
            assert r.n_covered_tokens >= SPAN_N
        else:
            assert r.n_covered_tokens == 0 and r.dup_coverage == 0.0


def test_d14_single_documents_scan(spark):
    """The positional gram index is persisted once and ALL THREE
    consumers (the cross-doc frequency aggregate feeding the semi-join,
    the probe side, and the per-doc length roll-up) read the cache —
    no consumer re-derives the explode+hash from a fresh documents
    scan. (FileScan text inside an InMemoryRelation dump is the cache's
    stored BUILD plan, not an executed scan, so the pin counts cache
    readers, not FileScan strings.)"""
    from bc_proj3_spark.operators.dedup import d14_span_coverage

    df = d14_span_coverage(spark, SF_DIR)
    df.collect()
    plan = _plan(df)
    assert plan.count("InMemoryTableScan") >= 3, plan[:2000]
    spark.catalog.clearCache()


def test_d14_injected_duplicate_span_is_found(spark):
    """A synthetic corpus where doc B quotes a 5-token span of doc A
    (and everything else is unique) must report exactly the quoted
    span: 3 duplicated 3-grams covering 5 tokens on each side."""
    from bc_proj3_spark.operators.dedup import SPAN_N, d14_span_coverage
    import tempfile

    span = "alpha beta gamma delta epsilon"
    docs = [
        (1, span + " unique1a unique1b unique1c", "en", "t", 1),
        (2, "unique2a unique2b " + span + " unique2c", "en", "t", 1),
        (3, "wholly disjoint text third document here", "en", "t", 1),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{tmp}/documents.parquet")
        rows = {r.doc_id: r for r in d14_span_coverage(spark, tmp).collect()}
    spark.catalog.clearCache()
    assert rows[1].n_dup_grams == 3 and rows[1].n_covered_tokens == 5
    assert rows[2].n_dup_grams == 3 and rows[2].n_covered_tokens == 5
    assert rows[3].n_dup_grams == 0 and rows[3].n_covered_tokens == 0
    assert rows[1].n_tokens == 8 and rows[2].n_tokens == 8


# ---------------------------------------------------------------------------
# d15 — n-gram decontamination report
# ---------------------------------------------------------------------------


def test_d15_split_replays_sp1_and_bounds(spark):
    """Every reported doc must be an sp1 val/test doc with the SAME
    split tag (the report must never disagree with the split it
    audits); n_hit <= n_grams; contaminated == (n_hit > 0)."""
    from bc_proj3_spark.operators.dedup import d15_ngram_decontaminate
    from bc_proj3_spark.operators.sampling import sp1_split_assign

    rep = {r.doc_id: r for r in d15_ngram_decontaminate(spark, SF_DIR).collect()}
    spark.catalog.clearCache()
    splits = {
        r.doc_id: r.split for r in sp1_split_assign(spark, SF_DIR).collect()
    }
    assert rep
    for doc_id, r in rep.items():
        assert splits[doc_id] == r.split and r.split in ("val", "test")
        assert 0 <= r.n_hit <= r.n_grams
        assert r.contaminated == (r.n_hit > 0)


def test_d15_quoted_benchmark_answer_is_caught(spark):
    """Synthetic corpus: an eval doc quoting a 6-token train span is
    flagged; an eval doc with disjoint vocabulary is clean. doc_ids are
    chosen so sp1's content-addressed buckets put them in the right
    splits (computed below, not assumed)."""
    from bc_proj3_spark.operators.dedup import d15_ngram_decontaminate
    from bc_proj3_spark.operators.sampling import (
        TRAIN_PCT,
        _seeded,
    )
    from bc_proj3_spark.functions.hashing import hash60
    import tempfile

    # find train/eval doc_ids under sp1's real hash (no RNG, no luck)
    ids = (
        spark.range(1, 400)
        .select(
            F.col("id"),
            (hash60(_seeded("split", F.col("id").cast("string"))) % 100).alias(
                "b"
            ),
        )
        .collect()
    )
    train_id = next(r.id for r in ids if r.b < TRAIN_PCT)
    eval_ids = [r.id for r in ids if r.b >= TRAIN_PCT][:2]
    quote = "the quick brown fox jumps high"
    docs = [
        (train_id, quote + " plus train only padding words", "en", "t", 1),
        (eval_ids[0], "eval intro " + quote + " eval outro words", "en", "t", 1),
        (eval_ids[1], "completely different vocabulary nothing shared at all", "en", "t", 1),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{tmp}/documents.parquet")
        rows = {
            r.doc_id: r for r in d15_ngram_decontaminate(spark, tmp).collect()
        }
    spark.catalog.clearCache()
    assert rows[eval_ids[0]].contaminated and rows[eval_ids[0]].n_hit == 2
    assert not rows[eval_ids[1]].contaminated


# ---------------------------------------------------------------------------
# g11 — label propagation
# ---------------------------------------------------------------------------


def test_g11_trajectory_laws(spark):
    """Communities never increase round-over-round (labels only
    coalesce under mode adoption from a fixed node-id universe), round
    0 is the all-singletons state with zero moves, and every census
    quantity is a non-negative count bounded by n_nodes."""
    from bc_proj3_spark.operators.graph import g11_label_propagation

    rows = sorted(
        g11_label_propagation(spark, SF_DIR).collect(), key=lambda r: r.round
    )
    spark.catalog.clearCache()
    n_nodes = rows[0].n_communities
    assert rows[0].round == 0 and rows[0].n_moved == 0 and n_nodes > 0
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_communities <= prev.n_communities
        assert 0 <= cur.n_moved <= n_nodes


def test_g11_two_cliques_converge(spark):
    """Two disjoint triangles (each co-purchased >= 2 times) collapse
    to exactly 2 communities — and the labels are the min node id of
    each clique by the tiebreak rule."""
    from bc_proj3_spark.operators.graph import _lp_edges, _lp_iterate

    # lineitem stub: two orders per part-pair so support >= 2 holds
    rows = []
    okey = 0
    for clique in ([1, 2, 3], [10, 11, 12]):
        for rep in range(2):
            okey += 1
            for p in clique:
                rows.append((okey, p))
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "l_orderkey long, l_partkey long"
        ).write.parquet(f"{tmp}/lineitem.parquet")
        _edges, directed = _lp_edges(spark, tmp)
        final = _lp_iterate(directed)[-1].collect()
    spark.catalog.clearCache()
    labs = {r.node: r.lab for r in final}
    assert set(labs[n] for n in (1, 2, 3)) == {1}
    assert set(labs[n] for n in (10, 11, 12)) == {10}


# ---------------------------------------------------------------------------
# g12 — modularity
# ---------------------------------------------------------------------------


def test_g12_modularity_identities(spark):
    """Q is bounded in [-0.5, 1]; every row carries the same Q; each
    contribution equals (intra/m - (deg/2m)^2) recomputed from the
    row's own exact integers; and intra edges never exceed m."""
    from bc_proj3_spark.operators.graph import (
        g12_modularity,
        _lp_edges,
    )

    rows = g12_modularity(spark, SF_DIR).collect()
    m = _lp_edges(spark, SF_DIR)[0].count()
    spark.catalog.clearCache()
    assert rows and m > 0
    qs = {r.modularity for r in rows}
    assert len(qs) == 1
    q = qs.pop()
    assert -0.5 <= q <= 1.0
    for r in rows:
        assert 0 <= r.intra_edges <= m
        expect = (4 * m * r.intra_edges - r.degree_sum**2) / (4 * m * m)
        assert abs(r.contribution - expect) < 1e-15


# ---------------------------------------------------------------------------
# t27 — BPE learning
# ---------------------------------------------------------------------------


def test_t27_compression_trajectory(spark):
    """Merges must strictly help: every round's merged pair was applied
    at least once (n_spellings_changed >= 1), total weighted symbols
    strictly decrease, and each round's decrease equals at most the
    weighted count at selection (each application removes exactly one
    symbol, and overlap suppression can only reduce applications)."""
    from bc_proj3_spark.operators.textstats import t27_bpe_learn

    rows = sorted(t27_bpe_learn(spark, SF_DIR).collect(), key=lambda r: r.round)
    spark.catalog.clearCache()
    assert len(rows) == 4
    prev_total = None
    for r in rows:
        assert r.n_spellings_changed >= 1
        assert " " in r.merged_pair
        if prev_total is not None:
            shrink = prev_total - r.total_symbols
            assert 0 < shrink <= r.weighted_count
        prev_total = r.total_symbols
    # later merges never beat an earlier round's count at ITS selection
    # time on the same corpus trajectory (greedy argmax property holds
    # loosely: counts can interleave, but round 1 is the global max of
    # the initial pair distribution — nothing later can exceed it)
    assert all(rows[0].weighted_count >= r.weighted_count for r in rows[1:])


def test_t27_greedy_nonoverlap_on_runs(spark):
    """The parity rule on a run of identical symbols: merging (x, x)
    over 'xxxx' (spelled x x x x) must produce [xx, xx], and over
    'xxx' must produce [xx, x] — the classic BPE non-overlap cases,
    exercised through the REAL corpus machinery via a synthetic
    documents table where those words dominate."""
    from bc_proj3_spark.operators.textstats import _bpe_spellings
    import tempfile

    docs = [
        (1, "xxxx xxxx xxxx xxx xxx", "en", "t", 1),
        (2, "xxxx xxx zzq", "en", "t", 1),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).write.parquet(f"{tmp}/documents.parquet")
        frames, stats = _bpe_spellings(spark, tmp)
        # stats rows are (pair, cnt, n_changed, total_symbols) tuples
        # since the r10 optimization round (observe-folded trajectory)
        best1_pair = stats[0][0]
        v1 = {r.w: r.s for r in frames[1].collect()}
    spark.catalog.clearCache()
    assert best1_pair == "x x"
    assert v1["xxxx"] == "xx xx"
    assert v1["xxx"] == "xx x"


# ---------------------------------------------------------------------------
# s12 — centroid dendrogram
# ---------------------------------------------------------------------------


def test_s12_dendrogram_accounting(spark):
    """Member counts are conserved through merges (final kept-cluster
    sizes sum toward the corpus), every merged rep disappears from
    later rounds, kept < merged never violates the lower-id rule, and
    d2 >= 0."""
    from bc_proj3_spark.operators.similarity import (
        KMEANS_K,
        s12_centroid_dendrogram,
        s5_kmeans_assign,
    )

    rows = sorted(
        s12_centroid_dendrogram(spark, SF_DIR).collect(),
        key=lambda r: r.round,
    )
    spark.catalog.clearCache()
    n_corpus = s5_kmeans_assign(spark, SF_DIR).count()
    spark.catalog.clearCache()
    assert len(rows) == 4
    seen_merged = set()
    sizes = {}
    for r in rows:
        assert r.d2 >= 0.0
        assert r.rep_kept < r.rep_merged
        assert r.rep_merged not in seen_merged
        assert r.rep_kept not in seen_merged
        seen_merged.add(r.rep_merged)
        sizes[r.rep_kept] = r.n_members
        assert 0 < r.n_members <= n_corpus
    # after 4 merges the 4 surviving clusters partition the corpus:
    # kept sizes plus untouched seeds' sizes must total n_corpus
    from bc_proj3_spark.operators.similarity import s5_kmeans_assign as s5
    from pyspark.sql import functions as FF

    seed_sizes = {
        x["centroid_id"]: x["n"]
        for x in s5(spark, SF_DIR)
        .groupBy("centroid_id")
        .agg(FF.count(FF.lit(1)).alias("n"))
        .collect()
    }
    spark.catalog.clearCache()
    survivors = set(seed_sizes) - seen_merged
    total = sum(
        sizes.get(c, seed_sizes[c]) for c in survivors
    )
    assert total == n_corpus


# ---------------------------------------------------------------------------
# a18 — Theil decomposition
# ---------------------------------------------------------------------------


def test_a18_decomposition_identity(spark):
    """The whole point of Theil over Gini: total inequality must equal
    within + between. Exactly true in real arithmetic; the 9-dp log
    lattice perturbs below 1e-6. Also: every component non-negative
    (spend is a positive distribution), spend shares sum to 1."""
    from bc_proj3_spark.plans.aggfuncs import a18_theil_decomposition

    rows = a18_theil_decomposition(spark, SF_DIR).collect()
    spark.catalog.clearCache()
    assert rows
    t_between = rows[0].theil_between
    t_total = rows[0].theil_total
    assert all(
        r.theil_between == t_between and r.theil_total == t_total
        for r in rows
    )
    assert t_total >= 0 and t_between >= -1e-9
    assert abs(sum(r.spend_share for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert r.theil_within >= -1e-9
    within_mix = sum(r.spend_share * r.theil_within for r in rows)
    assert abs(t_total - (within_mix + t_between)) < 1e-6


# ---------------------------------------------------------------------------
# e25 — difference-in-differences
# ---------------------------------------------------------------------------


def test_e25_did_identity_and_cells(spark):
    """Exactly the 2×2 cells exist, every row carries the same DiD,
    and DiD recomputes from the cells' own exact integers; cell
    populations are non-trivial on the real corpus (the hash coin and
    the midpoint split both roughly bisect)."""
    from bc_proj3_spark.plans.events import e25_did_uplift

    rows = e25_did_uplift(spark, SF_DIR).collect()
    spark.catalog.clearCache()
    cells = {(r.treated, r.post): r for r in rows}
    assert set(cells) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    means = {k: v.sum_cents / v.n_events for k, v in cells.items()}
    expect = (means[1, 1] - means[1, 0]) - (means[0, 1] - means[0, 0])
    for r in rows:
        assert abs(r.did_cents - expect) < 1e-9
        assert r.n_events > 0
    n_total = sum(r.n_events for r in rows)
    for r in rows:
        assert r.n_events > n_total // 20  # no degenerate cell


# ---------------------------------------------------------------------------
# adversarial scale: hot boilerplate key through d14/d15; d14 under spill
# ---------------------------------------------------------------------------


def test_d14_d15_exact_on_hotkey_boilerplate_corpus(spark):
    """A boilerplate sentence shared by 30% of a 2000-doc corpus (the
    license-header skew case): both span-coverage and the
    decontamination report must stay oracle-exact — the hot gram fans
    out as a 1:1 semi-join probe, never a pair table, so skew cannot
    blow the plan up (asserted by the queries simply completing with
    exact values)."""
    import tempfile

    import duckdb

    from bc_proj3_spark import registry
    from tests.test_driver_parity import strict_digest

    boiler = "standard license header text applies to this file entirely"
    docs = []
    for i in range(1, 2001):
        body = f"uniq{i}a uniq{i}b uniq{i}c uniq{i}d uniq{i}e uniq{i}f"
        text = (boiler + " " + body) if i % 10 < 3 else body
        docs.append((i, text, "en", "t", len(text)))
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
            for name in ("d14_span_coverage", "d15_ngram_decontaminate"):
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


def test_d14_identical_values_under_spill_pressure():
    """d14's per-doc LAG window + gram semi-join must stay
    value-identical when the session is squeezed to 2 shuffle
    partitions with floor-level force-spill thresholds (the d13/w3
    spill-gate discipline applied to the round's new window+semi-join
    path)."""
    import json
    import subprocess
    import sys

    prog = """
import json, sys
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .appName("spill-sim-d14")
    .config("spark.ui.enabled", "false")
    .config("spark.shuffle.spill.numElementsForceSpillThreshold", "5000")
    .config("spark.sql.windowExecBufferSpillThreshold", "128")
    .getOrCreate()
)
import __spark_entry__ as E
from tests.test_driver_parity import strict_digest
df = E.queries()["d14_span_coverage"](spark, sys.argv[1])
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

    spec = registry.all_queries()["d14_span_coverage"]
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
        "d14 values diverged under spill pressure"
    )


# ---------------------------------------------------------------------------
# st12 — streaming decontamination
# ---------------------------------------------------------------------------


def test_st12_admits_exactly_the_clean_set(spark):
    """The streamed anti-join must admit exactly the docs whose
    fingerprint is not an eval fingerprint: totals reconcile against
    batch-side counts (admitted <= corpus; every eval doc rejected,
    since each matches its own fingerprint)."""
    from bc_proj3_spark.streaming.incremental import (
        st12_stream_decontaminate,
    )
    from bc_proj3_spark.operators.sampling import sp1_split_assign

    rows = st12_stream_decontaminate(spark, SF_DIR).collect()
    n_admitted = sum(r.n_admitted for r in rows)
    spark.catalog.clearCache()
    splits = sp1_split_assign(spark, SF_DIR).collect()
    n_total = len(splits)
    n_eval = sum(1 for r in splits if r.split != "train")
    spark.catalog.clearCache()
    assert 0 < n_admitted <= n_total - n_eval
