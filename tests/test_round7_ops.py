"""Round-7 hardening tests: adversarial-data and adversarial-scale
invariants for already-verified operator families (the r6 advisor +
judge brief). These do not add registry breadth — they pin behavior the
sf0.01/sf0.1 oracles cannot exercise: dirty parent keys, skewed hot
keys, and spill-pressure configurations.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


# ---------------------------------------------------------------------------
# dq2 under dirty (duplicated) parent keys — the advisor's fan-out finding
# ---------------------------------------------------------------------------


def test_dq2_duplicate_parent_keys_do_not_fan_out(spark, tmp_path):
    """A referential-integrity audit must stay correct on exactly the
    dirty data it exists to catch. Before the r7 fix, dq2's chained
    left joins assumed unique parent keys; a duplicated parent key
    fanned out the child rows and inflated both n_child and every
    orphan count sharing that child. The parents are now
    .distinct()-deduplicated, which preserves anti-join (NOT EXISTS)
    membership semantics regardless of parent data quality."""
    from bc_proj3_spark.operators.quality import dq2_referential_integrity

    sf = str(tmp_path)
    # customer: key 1 duplicated three times, key 2 once; 3 is absent
    spark.createDataFrame(
        [Row(c_custkey=1), Row(c_custkey=1), Row(c_custkey=1), Row(c_custkey=2)]
    ).write.parquet(f"{sf}/customer.parquet")
    # orders: two children hit the duplicated key, one orphan (3),
    # one NULL key (not an orphan by NOT-EXISTS semantics)
    spark.createDataFrame(
        [
            Row(o_orderkey=10, o_custkey=1),
            Row(o_orderkey=11, o_custkey=1),
            Row(o_orderkey=12, o_custkey=3),
            Row(o_orderkey=13, o_custkey=None),
        ]
    ).write.parquet(f"{sf}/orders.parquet")
    # lineitem: o_orderkey 10 duplicated parent-side is impossible
    # (orders is unique here) but lineitem's three FKs share one child
    # pass — keep them small and partially orphaned
    spark.createDataFrame(
        [
            Row(l_orderkey=10, l_partkey=100, l_suppkey=7),
            Row(l_orderkey=99, l_partkey=101, l_suppkey=8),
        ]
    ).write.parquet(f"{sf}/lineitem.parquet")
    spark.createDataFrame(
        [Row(p_partkey=100), Row(p_partkey=100)]  # duplicated part key
    ).write.parquet(f"{sf}/part.parquet")
    spark.createDataFrame([Row(s_suppkey=7)]).write.parquet(
        f"{sf}/supplier.parquet"
    )
    spark.createDataFrame(
        [Row(user_id=1), Row(user_id=5)]
    ).write.parquet(f"{sf}/events.parquet")

    got = {
        r["relationship"]: (r["n_child"], r["n_orphans"])
        for r in dq2_referential_integrity(spark, sf).collect()
    }
    assert got["orders.custkey->customer"] == (4, 1)  # only key 3
    assert got["lineitem.orderkey->orders"] == (2, 1)  # only key 99
    assert got["lineitem.partkey->part"] == (2, 1)  # dup part, no fan-out
    assert got["lineitem.suppkey->supplier"] == (2, 1)
    assert got["events.user_id->customer"] == (2, 1)  # only user 5


# ---------------------------------------------------------------------------
# skew robustness: hot-key corpus through the d4 → cc1 dedup funnel
# ---------------------------------------------------------------------------


def _skew_corpus_rows():
    """1000 docs. 100 (10%) share one hot 12-word phrase (its shingles'
    document frequency, 100, blows past the DF cap of max(1000/100, 20)
    = 20 — the web-boilerplate regime the cap exists for). 30 clusters
    of 3 near-duplicate docs (df=3, under the cap) carry the real
    pairing signal. The rest are unique filler."""
    rows = []
    hot = "the quick brown fox jumps over the lazy dog near riverbank today"
    for i in range(100):
        rows.append((i, f"{hot} tail{i} mark{i} end{i}"))
    # 30 base words + 1 unique suffix word → shingle Jaccard 28/30 ≈
    # 0.93 between cluster members, far enough above both the verify
    # threshold and the LSH band-collision knee that detection is
    # deterministic-certain (at 0.83 one pair sat on the band
    # probability knee and deterministically missed)
    for c in range(30):
        base = " ".join(f"cluster{c}word{j}" for j in range(30))
        for m in range(3):
            rows.append((100 + c * 3 + m, f"{base} unique{c}x{m}"))
    for i in range(190, 1000):
        rows.append((i, " ".join(f"solo{i}w{j}" for j in range(8))))
    return rows


@pytest.fixture(scope="module")
def skew_corpus_dir(spark, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("skew_corpus"))
    rows = _skew_corpus_rows()
    spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(4).write.parquet(f"{sf}/documents.parquet")
    return sf


def _oracle_on(sf_dir):
    import duckdb

    con = duckdb.connect()
    # Spark writes {dir}/documents.parquet as a directory of part files
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    return con


def test_d4_cc1_values_hold_under_hot_key_skew(spark, skew_corpus_dir):
    """The dedup funnel must stay oracle-exact on a corpus with a 10%
    hot key — the regime where a naive LSH implementation goes
    quadratic in one band bucket. Both engines run their own full
    pipeline over the same adversarial parquet, so this checks values,
    not just survival."""
    from bc_proj3_spark import registry
    from tests.conftest import strict_rows_key

    con = _oracle_on(skew_corpus_dir)
    specs = registry.all_queries()
    try:
        for name in ("d4_minhash_lsh_pairs", "cc1_dedup_components"):
            spec = specs[name]
            sdf = spec.builder(spark, skew_corpus_dir)
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(spec.oracle)
            ocols = [d[0] for d in res.description]
            orows = [tuple(r) for r in res.fetchall()]
            skey = strict_rows_key(list(sdf.columns), srows)
            okey = strict_rows_key(ocols, orows)
            assert skey == okey, f"{name} diverged under hot-key skew"
        # the 30 near-dup clusters must land as 30 components of size 3:
        # the DF cap removes the hot boilerplate shingles (by design —
        # the 100 hot docs stay singletons here; d1's exact-fingerprint
        # stage is what collapses identical text), but the cap must NOT
        # harm the under-cap pairing signal
        from collections import Counter

        labels = [
            r["component_id"]
            for r in specs["cc1_dedup_components"]
            .builder(spark, skew_corpus_dir)
            .collect()
        ]
        sizes = Counter(Counter(labels).values())
        assert sizes[3] == 30, f"near-dup clusters lost: {dict(sizes)}"
    finally:
        con.close()
        spark.catalog.clearCache()


def test_d4_plan_has_no_cartesian_under_skew(spark, skew_corpus_dir):
    """Under a 10% hot key the band self-join must stay a hash join on
    (band, key) — never a nested-loop/cartesian fallback — and the
    candidate set must stay bucket-local."""
    from bc_proj3_spark import registry

    try:
        df = registry.all_queries()["d4_minhash_lsh_pairs"].builder(
            spark, skew_corpus_dir
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
    finally:
        spark.catalog.clearCache()


def test_salted_join_values_hold_under_10pct_hot_key(spark):
    """sj1's salting contract re-checked at the 10%-hot-key mix the r6
    judge asked for (test_skew.py pins 90%; the milder mix exercises
    the many-distinct-keys + one-hot-key regime where salt buckets and
    AQE coexist)."""
    from pyspark.sql import functions as F

    from bc_proj3_spark.operators.skew import salted_join

    big = spark.range(20_000).select(
        F.when(F.col("id") % 10 == 0, F.lit(7))
        .otherwise(F.col("id") % 997)
        .alias("k"),
        (F.col("id") * 13).alias("payload"),
    )
    small = spark.range(997).select(
        F.col("id").alias("k"),
        F.concat(F.lit("dim_"), F.col("id")).alias("label"),
    )
    plain = big.join(small, "k")
    salted = salted_join(big, small, "k")
    assert sorted(map(tuple, salted.select(*plain.columns).collect())) == sorted(
        map(tuple, plain.collect())
    )


# ---------------------------------------------------------------------------
# sp12 — DSIR importance resampling invariants
# ---------------------------------------------------------------------------


def test_sp12_dsir_enriches_target_and_sizes_correctly(spark, oracle_con):
    """DSIR's contract: the selected set is (a) exactly ⌊n/keep_div⌋
    docs, (b) enriched toward the target language relative to the base
    rate (the likelihood-ratio weights must actually steer selection),
    and (c) deterministic — two runs pick identical doc_ids."""
    from bc_proj3_spark.operators.sampling import (
        DSIR_KEEP_DIV,
        DSIR_TARGET_LANG,
        sp12_dsir_select,
    )

    try:
        sel = sp12_dsir_select(spark, SF_DIR).collect()
        n_docs, n_target = oracle_con.execute(
            "SELECT COUNT(*), "
            f"count_if(lang = '{DSIR_TARGET_LANG}') FROM documents"
        ).fetchone()
        assert len(sel) == max(n_docs // DSIR_KEEP_DIV, 1)
        base_rate = n_target / n_docs
        sel_rate = sum(r["lang"] == DSIR_TARGET_LANG for r in sel) / len(sel)
        assert sel_rate > base_rate, (
            f"no target enrichment: selected {sel_rate:.2f} "
            f"vs base {base_rate:.2f}"
        )
        spark.catalog.clearCache()
        again = sp12_dsir_select(spark, SF_DIR).collect()
        assert sorted(r["doc_id"] for r in sel) == sorted(
            r["doc_id"] for r in again
        )
    finally:
        spark.catalog.clearCache()


def test_sp12_selection_is_takeordered_not_global_sort(spark):
    """The top-k must plan as TakeOrderedAndProject (distributed
    partial top-k), never a global Sort + Limit — the shape that
    funnels the corpus through one partition at 100 TB."""
    from bc_proj3_spark.operators.sampling import sp12_dsir_select

    try:
        df = sp12_dsir_select(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, plan[:2000]
    finally:
        spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# config-drift robustness: values invariant to AQE and shuffle width
# ---------------------------------------------------------------------------

#: one representative per hot plan family: multi-join aggregate,
#: event-time window, LSH dedup chain, sessionization, exact weighted
#: median (order-statistic), HLL sketch merge.
AQE_OFF_QUERIES = [
    "q9_product_profit",
    "w3_trailing_hour_range",
    "d4_minhash_lsh_pairs",
    "e2_sessionization",
    "a13_weighted_median",
    "sk4_hll_estimate",
    # r7 fourth-session plan families: the two-level bucketed prefix
    # sum (offsets are computed per-bucket then broadcast — partition
    # layout must not leak into the cumulative values) and the
    # explicit-width bootstrap fan-out (whose repartition exists
    # precisely because of AQE coalescing — values must be identical
    # with AQE off entirely)
    "stat3_ks_test",
    "stat4_bootstrap_ci",
    # r8: the two new two-level prefix-sum users (per-segment ranked
    # cumulative counts) and the permutation fan-out that reuses
    # stat4's explicit-width repartition
    "a16_gini_concentration",
    "stat5_mann_whitney",
    "stat6_permutation_test",
    # r8 second batch: the corpus-order prefix-sum user (Heaps fit)
    # and the m*(B+1) permutation-family fan-out behind BH
    "t25_heaps_law",
    "stat7_bh_fdr",
    # r8 third batch: the banded Hamming self-join family and the
    # 16-way conditional-sum fan-out
    "d13_hamming_neardup_pairs",
    "fe4_feature_hashing",
    # r9: the positional-gram window path (span coverage), the
    # split-bucketed semi-join probe (decontamination), and the
    # synchronous argmax rounds (label propagation) — values must be
    # identical with AQE off and an odd width
    "d14_span_coverage",
    "d15_ngram_decontaminate",
    "g11_label_propagation",
    # r10: the map-side sorted-array fold family (per-doc gate features
    # computed without explode — values must not depend on layout)
    "dq10_quality_gates",
]


def test_values_invariant_to_aqe_off_and_odd_shuffle_width(oracle_con):
    """A cluster operator may run under any AQE/shuffle configuration
    (the driver's posture differs from ours; ops teams flip AQE for
    incident triage). Values must not depend on either: replay one
    representative query per hot family in a fresh JVM with AQE fully
    OFF and a deliberately odd shuffle width (7), digest-compared to
    the DuckDB oracle at driver strictness. Catches partition-order /
    runtime-replan value dependence that the default-config suite
    can't see."""
    import subprocess
    import sys

    prog = """
import json, sys
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .appName("aqe-off-sim")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
    .config("spark.sql.adaptive.skewJoin.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as E
from tests.test_driver_parity import strict_digest
qs = E.queries()
out = {}
for name in json.loads(sys.argv[2]):
    try:
        df = qs[name](spark, sys.argv[1])
        # the builder's apply_runtime_conf re-asserts adaptive=true;
        # flip it back AFTER plan construction and BEFORE the action —
        # runtime SQL confs are read at execution, so this genuinely
        # executes the plan without AQE
        for kk in ("spark.sql.adaptive.enabled",
                   "spark.sql.adaptive.coalescePartitions.enabled",
                   "spark.sql.adaptive.skewJoin.enabled"):
            spark.conf.set(kk, "false")
        rows = [tuple(r) for r in df.collect()]
        out[name] = [len(rows), strict_digest(list(df.columns), rows)]
    except Exception as exc:
        out[name] = f"ERROR: {exc!r}"[:300]
    spark.catalog.clearCache()
print("AQEOFF_JSON:" + json.dumps(out))
"""
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    env["SPARK_GRAFT_SHUFFLE"] = "7"
    proc = subprocess.run(
        [sys.executable, "-c", prog, SF_DIR, json.dumps(AQE_OFF_QUERIES)],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd="/root/repo",
    )
    payload = None
    for line in proc.stdout.splitlines():
        if line.startswith("AQEOFF_JSON:"):
            payload = json.loads(line[len("AQEOFF_JSON:"):])
    assert payload is not None, (
        f"aqe-off run produced no result (rc={proc.returncode})\n"
        f"stderr tail: {proc.stderr[-1500:]}"
    )

    from bc_proj3_spark import registry
    from tests.test_driver_parity import strict_digest

    specs = registry.all_queries()
    for name in AQE_OFF_QUERIES:
        got = payload[name]
        assert not isinstance(got, str), f"{name}: {got}"
        n_rows, digest = got
        res = oracle_con.execute(specs[name].oracle)
        ocols = [d[0] for d in res.description]
        orows = [tuple(r) for r in res.fetchall()]
        assert n_rows == len(orows), f"{name}: rows {n_rows} != {len(orows)}"
        assert digest == strict_digest(ocols, orows), (
            f"{name}: values drifted under AQE-off / shuffle-width-7"
        )


# ---------------------------------------------------------------------------
# spill robustness: the largest window query under forced memory pressure
# ---------------------------------------------------------------------------


def test_w3_identical_values_under_spill_pressure(tmp_path):
    """w3 (trailing-hour range window — the suite's widest window
    state) must complete and stay value-identical when the session is
    squeezed: 2 shuffle partitions (each holds ~half the events table,
    forcing ExternalAppendOnlyUnsafeRowArray past its in-memory
    threshold) and a floor-level spill threshold so the window
    operator takes its disk path. Values are digest-compared against
    the unconstrained session's result at driver strictness."""
    import subprocess
    import sys

    prog = """
import json, sys
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .appName("spill-sim")
    .config("spark.ui.enabled", "false")
    # shuffle width is forced via SPARK_GRAFT_SHUFFLE=2 in the env —
    # apply_runtime_conf inside the builder re-asserts that conf, so a
    # builder-level setting here would be overwritten
    # force the window buffer to disk almost immediately
    .config("spark.sql.windowExec.buffer.spill.threshold", "128")
    .config("spark.sql.windowExec.buffer.in.memory.threshold", "128")
    .config("spark.shuffle.spill.numElementsForceSpillThreshold", "5000")
    .getOrCreate()
)
import __spark_entry__ as E
from tests.test_driver_parity import strict_digest
df = E.queries()["w3_trailing_hour_range"](spark, sys.argv[1])
rows = [tuple(r) for r in df.collect()]
print("SPILL_JSON:" + json.dumps([len(rows), strict_digest(list(df.columns), rows)]))
"""
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    env["SPARK_GRAFT_SHUFFLE"] = "2"
    sf = SF_DIR
    proc = subprocess.run(
        [sys.executable, "-c", prog, sf],
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
        f"spill-pressure run produced no result (rc={proc.returncode})\n"
        f"stderr tail: {proc.stderr[-1500:]}"
    )
    n_rows, digest = payload

    import duckdb

    from bc_proj3_spark import registry
    from tests.test_driver_parity import strict_digest

    spec = registry.all_queries()["w3_trailing_hour_range"]
    con = duckdb.connect()
    try:
        for t in (
            "region nation customer supplier part orders "
            "lineitem events documents embeddings".split()
        ):
            path = f"{sf}/{t}.parquet"
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
                )
        res = con.execute(spec.oracle)
        ocols = [d[0] for d in res.description]
        orows = [tuple(r) for r in res.fetchall()]
        assert n_rows == len(orows)
        assert digest == strict_digest(ocols, orows), (
            "w3 values drifted under spill pressure"
        )
    finally:
        con.close()
