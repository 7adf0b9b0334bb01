"""Registry-wide static lint of every DuckDB oracle's OUTPUT types.

The correctness driver's value-hash is type-tagged below the Python
level: an oracle output column typed HUGEINT (DuckDB's int128 result of
``SUM(BIGINT/INTEGER)``) or DECIMAL never hash-matches Spark, even when
every value is exactly equal — reproduced on all 9 red rows of
CORRECTNESS_r05, with zero counterexamples across five rounds. The
runtime harness cannot catch this because ``conftest._norm``
deliberately erases types (int -> float, Decimal -> str). This lint is
the static gate (VERDICT r5 item 3):

THE ORACLE OUTPUT-TYPE CONTRACT
  Allowed: BIGINT, INTEGER (and narrower ints), DOUBLE/FLOAT, VARCHAR,
  DATE, TIMESTAMP, BOOLEAN — and lists thereof. Never HUGEINT (always
  CAST(SUM(..) AS BIGINT)) and never DECIMAL (cast to DOUBLE or BIGINT).

  A DOUBLE column produced by an *aggregate over doubles* must be
  ROUND-wrapped (2 for money, 9 for ratios/means, per the repo float
  convention): double aggregation is where engines can legitimately
  disagree in the last ulp (decimal-cast grid snapping, association
  order). Deterministic scalar double arithmetic (same IEEE ops, same
  order on both engines) is exact and exempt via EXACT_DOUBLE_OK.

DESCRIBE binds the query without executing it, so this lint is fast and
also doubles as a parse/bind regression net for all registered oracles.
"""

from __future__ import annotations

import re

import pytest

from bc_proj3_spark.registry import all_queries

BANNED_TYPE_SUBSTRINGS = ("HUGEINT", "DECIMAL")

#: Aggregate functions whose DOUBLE result is sensitive to accumulation
#: order / decimal-grid snapping and therefore must be ROUND-wrapped.
_AGG_RE = re.compile(
    r"\b(SUM|AVG|STDDEV|STDDEV_SAMP|STDDEV_POP|VAR_SAMP|VAR_POP|VARIANCE"
    r"|CORR|COVAR_SAMP|COVAR_POP|REGR_SLOPE|REGR_INTERCEPT|PRODUCT"
    r"|GEOMEAN|MEDIAN|QUANTILE_CONT|QUANTILE_DISC)\s*\(",
    re.IGNORECASE,
)

#: (query, column) pairs whose DOUBLE output is exact WITHOUT a ROUND:
#: each is either a passthrough of stored values, a min/max (selection,
#: not accumulation), or a single deterministic scalar expression that
#: both engines evaluate with the identical IEEE operation sequence.
#: Audited against the r5 judge strict sweep: every query below matched
#: DuckDB exactly at sf0.01. Add to this list only with that evidence.
EXACT_DOUBLE_OK: set[tuple[str, str]] = {
    # integer-sum ratio: SUM(CASE 1/0) is exact int, / COUNT is one
    # deterministic IEEE division — identical on both engines
    ("e5_daily_retention", "retention_rate"),
    # SUM(price_d) where price_d is ALREADY DECIMAL(28,10) from an
    # upstream CTE cast — decimal-exact accumulation the per-alias
    # regex can't see (the cast is a different select item)
    ("sql2_top_order_per_customer", "cust_total"),
    # integer-sum ratios: SUM over exact ints is order-insensitive;
    # the single IEEE division of two exact integers is identical on
    # both engines, and leaving it UNROUNDED avoids the ROUND-tie
    # seam entirely (t5's chars_per_token precedent)
    ("t23_tokenizer_fertility", "fertility"),
    ("t23_tokenizer_fertility", "chars_per_bpe"),
    # integer-sum ratio (hits/k) and 1/rank reciprocal: single IEEE
    # divisions of exact small integers, identical on both engines
    ("s9_ann_recall", "recall_at_k"),
    ("s9_ann_recall", "rr_top1"),
    # round-12: single IEEE divisions of exact integer sums (t23/s9
    # class — deliberately unrounded, no ROUND-tie seam)
    ("t30_bpe_encode", "chars_per_symbol"),
    ("t30_bpe_encode", "symbols_per_word"),
    ("s15_ivf_recall_curve", "recall_at_k"),
    # integer-sum ratio: exact BIGINT token total over exact window
    # capacity (count x compile-time constant), one IEEE division
    ("sp16_pack_efficiency", "fill_rate"),
    # decimal-exact squared-error sum (lattice (11,10) terms) and an
    # integer-sum ratio — each ONE terminal IEEE division by COUNT(*)
    ("ev4_brier_score", "brier"),
    ("ev4_brier_score", "base_rate"),
    # integer-sum ratio: exact admitted-token total over the
    # compile-time budget constant, one IEEE division
    ("rag1_context_budget", "budget_fill"),
    ("sp17_token_budget_mix", "fill_rate"),
    # contingency-cell ratios on common denominators: exact BIGINT
    # numerator/denominator, one IEEE division
    ("lab3_annotator_agreement", "po"),
    ("lab3_annotator_agreement", "kappa"),
    # Newman assortativity without the sqrt (symmetrized form): exact
    # DECIMAL/HUGEINT moments, one IEEE division
    ("g3_degree_assortativity", "assortativity"),
    # n^2-scaled integer ACF moments, one IEEE division
    ("ts6_autocorrelation", "acf"),
    # OLS moments on the day-offset integer lattice: each statistic is
    # one IEEE division of exactly-computed integer moment products
    ("ts7_trend_slope", "slope_per_day"),
    ("ts7_trend_slope", "intercept"),
    ("ts7_trend_slope", "r2"),
    # exact integer daily-count moments, one IEEE division each
    ("ts8_dispersion", "mean_daily"),
    ("ts8_dispersion", "fano"),
    # KS distance: exact n_a*n_b-scaled integer ECDF gap, one division
    ("stat3_ks_test", "d"),
    # ordinal EMD on the 2*n_c*n-scaled integer lattice, one division
    ("dq9_t_closeness", "emd"),
    # rich-club density: exact integer counts, one IEEE division
    ("g4_rich_club", "phi"),
    # vocabulary-count ratios: exact BIGINTs, one IEEE division each
    ("t24_lexical_diversity", "ttr"),
    ("t24_lexical_diversity", "hapax_frac"),
    # each resample mean is one IEEE division of exact integer sums;
    # min/max over bit-identical doubles are bit-identical
    ("stat4_bootstrap_ci", "mean_price"),
    ("stat4_bootstrap_ci", "ci_lo"),
    ("stat4_bootstrap_ci", "ci_hi"),
    # doubled exact order statistics, one display division each
    ("a14_mad_outliers", "median_bal"),
    ("a14_mad_outliers", "mad_bal"),
    # exact decimal trace / Frobenius sums; deterministic IEEE
    # conversions, one square and one division over identical operands
    ("g5_effective_rank", "trace"),
    ("g5_effective_rank", "effective_rank"),
    # exact integer moments; num / sqrt(den) is a deterministic IEEE
    # chain (correctly-rounded sqrt + one division) on both engines
    ("ts9_cross_correlation", "xcorr"),
    # integer-exact DP release; one IEEE division
    ("dp2_dp_mean", "noisy_mean"),
    # exact BIGINT padded/waste token sums; one IEEE division
    ("sp15_length_bucketing", "waste_frac"),
    # exact integer extreme-count; one IEEE division by the literal B+1
    ("stat6_permutation_test", "p_value"),
    # decimal-exact lattice-LN accumulation (SUM over DECIMAL terms)
    # cast once to double — the sql2 class the per-alias regex can't
    # see; no float ever enters the accumulation
    ("e23_kaplan_meier", "log_survival"),
    # DCG: SUM of exact integer grades times compile-time 9-dp decimal
    # discount LITERALS (no transcendental, no float accumulation),
    # cast once to double; nDCG divides that identical double by a
    # shared per-geometry double literal — one IEEE division
    ("hs3_ndcg_eval", "dcg"),
    ("hs3_ndcg_eval", "ndcg"),
    # integer gate-count ratio: SUM of exact 0/1 products, one IEEE
    # division by COUNT(*) — identical on both engines
    ("dq10_quality_gates", "pass_rate"),
    # integer confusion-count ratio: exact BIGINT diagonal / total,
    # one IEEE division
    ("ml2_naive_bayes_confusion", "accuracy"),
}

#: Accumulation forms that are exact without ROUND:
#: - SUM(CAST(.. AS DECIMAL(p,s))): decimal addition is exact and
#:   associative, so any partial-aggregation order matches (the repo's
#:   dec_sum convention, functions/numeric.py). Residual hazard: the
#:   per-row double->decimal cast itself grid-snaps differently across
#:   engines for |value| above ~4.4e5 at scale 10 (ulp/2 > 0.5e-10) —
#:   that is why w2/r2 needed ROUND despite being decimal-exact sums;
#:   this static lint cannot see value magnitudes, so re-aggregations
#:   of aggregate outputs should be ROUND-wrapped by convention.
#: - quantile_cont/median: positional selection + one deterministic
#:   interpolation, no accumulation.
_EXACT_FORM_RE = re.compile(
    r"SUM\s*\(\s*CAST\s*\((?:[^()]|\([^()]*\))*\bAS\s+DECIMAL"
    r"|\b(QUANTILE_CONT|MEDIAN)\s*\(",
    re.IGNORECASE | re.DOTALL,
)


def _expr_for_alias(sql: str, col: str) -> str | None:
    """Best-effort: the select-list expression aliased ``AS col``.

    Walks backwards from ``AS col`` balancing parens until a comma or
    SELECT at depth 0 — good enough for lint attribution (oracles are
    generated strings, not adversarial SQL).
    """
    m = None
    for m in re.finditer(rf"\bAS\s+{re.escape(col)}\b", sql, re.IGNORECASE):
        pass  # keep the LAST definition (outermost query is last in text)
    if m is None:
        return None
    i = m.start() - 1
    depth = 0
    start = 0
    while i >= 0:
        ch = sql[i]
        if ch == ")":
            depth += 1
        elif ch == "(":
            if depth == 0:
                start = i + 1
                break
            depth -= 1
        elif ch == "," and depth == 0:
            start = i + 1
            break
        elif depth == 0 and sql[: i + 1].upper().endswith("SELECT"):
            start = i + 1
            break
        i -= 1
    return sql[start : m.start()].strip()


def _rounded(expr: str) -> bool:
    s = expr.strip().upper()
    # allow CAST(ROUND(..)..) and ROUND(..) heads
    while s.startswith("CAST"):
        s = s[4:].lstrip().lstrip("(").lstrip()
    return s.startswith("ROUND")


@pytest.fixture(scope="module")
def described():
    """DESCRIBE every registered oracle once; yield {name: [(col, typ)]}."""
    import duckdb

    from tests.conftest import SF_DIR
    from bc_proj3_spark.plans.tables import TABLE_NAMES

    con = duckdb.connect()
    import os

    for name in TABLE_NAMES:
        path = f"{SF_DIR}/{name}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    out = {}
    errors = {}
    for name, spec in all_queries(strict=True).items():
        if spec.oracle is None:
            continue
        try:
            rows = con.execute(f"DESCRIBE {spec.oracle}").fetchall()
        except Exception as exc:  # bind/parse failure is itself a red
            errors[name] = repr(exc)
            continue
        out[name] = [(r[0], r[1]) for r in rows]
    con.close()
    assert not errors, f"oracles failed to bind: {errors}"
    return out


def test_no_hugeint_or_decimal_outputs(described):
    bad = [
        (name, col, typ)
        for name, cols in described.items()
        for col, typ in cols
        if any(b in typ.upper() for b in BANNED_TYPE_SUBSTRINGS)
    ]
    assert not bad, (
        "oracle output columns typed HUGEINT/DECIMAL never pass the "
        "driver's type-tagged value hash — CAST(SUM(..) AS BIGINT) / "
        f"cast DECIMAL to DOUBLE or BIGINT: {bad}"
    )


def test_aggregated_doubles_are_round_wrapped(described):
    qs = all_queries()
    bad = []
    for name, cols in described.items():
        sql = qs[name].oracle
        for col, typ in cols:
            base = typ.upper().removesuffix("[]")
            if base not in ("DOUBLE", "FLOAT", "REAL"):
                continue
            if (name, col) in EXACT_DOUBLE_OK:
                continue
            expr = _expr_for_alias(sql, col)
            if expr is None:
                # bare passthrough of a stored/base column — exact
                continue
            if (
                _AGG_RE.search(expr)
                and not _rounded(expr)
                and not _EXACT_FORM_RE.search(expr)
            ):
                bad.append((name, col, expr[:80]))
    assert not bad, (
        "DOUBLE outputs built from double aggregates must be "
        f"ROUND-wrapped on both engines (or EXACT_DOUBLE_OK'd): {bad}"
    )


def test_exact_double_ok_entries_are_live(described):
    """Every EXACT_DOUBLE_OK exemption must name a registered query and
    one of its actual oracle output columns — a stale or misspelled
    entry would silently re-open the unrounded-aggregate lint hole for
    the column it was meant to cover."""
    stale = [
        (name, col)
        for name, col in EXACT_DOUBLE_OK
        if name not in described
        or col not in {c for c, _ in described[name]}
    ]
    assert not stale, f"EXACT_DOUBLE_OK entries match nothing: {stale}"
