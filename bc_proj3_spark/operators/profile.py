"""Table profiling: the ANALYZE/statistics-collection operator.

Every warehouse engine ships a stats collector (ANALYZE TABLE ...
COMPUTE STATISTICS; the reference gets per-write operation metrics from
Delta's DESCRIBE HISTORY, silver_arxiv.py:175-184, but has no column
profiler). Column-level NDV/null/min-max stats are what a cost-based
optimizer joins-orders with and what data-quality monitoring trends
over time — a first-class engine surface, so it is a registered,
oracle-checked query here, not a notebook helper.

Determinism notes: NDV is EXACT count distinct (the approximate path is
sk3/sk4's deterministic HLL — engine-native approx_count_distinct is
seed-dependent and can't face a value-hash oracle). Min/max are emitted
as DOUBLES with dates mapped to epoch days — cross-engine double→string
formatting is not canonical, numeric casting is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bc_proj3_spark.plans.tables import table
from bc_proj3_spark.registry import register

#: (column, kind) over orders; kind picks the min/max mapping.
#: Strings profile null-count + NDV only (no canonical numeric order).
PROFILE_COLS: tuple[tuple[str, str], ...] = (
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_totalprice", "num"),
    ("o_orderdate", "date"),
    ("o_orderstatus", "str"),
    ("o_orderpriority", "str"),
)

_EPOCH = "1970-01-01"


def _prof1_oracle() -> str:
    parts = []
    for col, kind in PROFILE_COLS:
        if kind == "num":
            mn = f"CAST(MIN({col}) AS DOUBLE)"
            mx = f"CAST(MAX({col}) AS DOUBLE)"
        elif kind == "date":
            mn = f"CAST(date_diff('day', DATE '{_EPOCH}', CAST(MIN({col}) AS DATE)) AS DOUBLE)"
            mx = f"CAST(date_diff('day', DATE '{_EPOCH}', CAST(MAX({col}) AS DATE)) AS DOUBLE)"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
        parts.append(
            f"SELECT '{col}' AS column_name, COUNT(*) AS n_rows, "
            f"COUNT(*) - COUNT({col}) AS n_nulls, "
            f"COUNT(DISTINCT {col}) AS n_distinct, "
            f"{mn} AS min_v, {mx} AS max_v FROM orders"
        )
    return " UNION ALL ".join(parts)


@register("prof1_table_stats", _prof1_oracle())
def prof1_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of ``orders``: rows, nulls, exact NDV, numeric
    min/max (dates as epoch days) — one output row per column.

    Plan: ONE aggregate computes every per-column statistic together —
    Spark rewrites multi-column COUNT(DISTINCT) into a single Expand +
    two-phase aggregate (one shuffle total), where the oracle's
    readable per-column UNION would rescan the table |columns| times.
    The 1-row wide aggregate then unpivots map-side (stack) into the
    per-column shape. At 100 TB: NDV via Expand multiplies the shuffle
    by the distinct-column count; when that bites, swap exact NDV for
    the mergeable HLL registers of sk3 per column — same output shape,
    sketch-width shuffle."""
    o = table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, kind in PROFILE_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(col)).alias(f"{col}__nulls"))
        aggs.append(F.count_distinct(F.col(col)).alias(f"{col}__ndv"))
        if kind == "num":
            aggs.append(F.min(col).cast("double").alias(f"{col}__min"))
            aggs.append(F.max(col).cast("double").alias(f"{col}__max"))
        elif kind == "date":
            aggs.append(
                F.datediff(F.min(col).cast("date"), F.lit(_EPOCH))
                .cast("double")
                .alias(f"{col}__min")
            )
            aggs.append(
                F.datediff(F.max(col).cast("date"), F.lit(_EPOCH))
                .cast("double")
                .alias(f"{col}__max")
            )
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{col}__min"))
            aggs.append(F.lit(None).cast("double").alias(f"{col}__max"))
    wide = o.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__ndv, {c}__min, {c}__max" for c, _ in PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(PROFILE_COLS)}, {stack})"
        " AS (column_name, n_nulls, n_distinct, min_v, max_v)",
        "n_rows",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_v", "max_v")


# ---------------------------------------------------------------------------
# prof2 — functional-dependency discovery (A → B candidate audit)
# ---------------------------------------------------------------------------

#: candidate determinant → dependent pairs over lineitem; real FD
#: miners enumerate the lattice — the per-candidate check below is the
#: primitive they repeat.
FD_CANDIDATES: tuple[tuple[str, str], ...] = (
    ("l_orderkey", "l_returnflag"),
    ("l_orderkey", "l_shipdate"),
    ("l_partkey", "l_returnflag"),
    ("l_suppkey", "l_linestatus"),
)


def _prof2_oracle() -> str:
    parts = []
    for a, b in FD_CANDIDATES:
        parts.append(f"""
SELECT '{a}' AS determinant, '{b}' AS dependent,
       COUNT(*) AS n_keys,
       CAST(SUM(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_keys,
       SUM(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds
FROM (SELECT {a}, COUNT(DISTINCT {b}) AS ndv FROM lineitem GROUP BY {a}) g
""")
    return " UNION ALL ".join(parts)


@register("prof2_functional_deps", _prof2_oracle())
def prof2_functional_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit: for each candidate A → B, how many
    A-groups carry more than one distinct B — zero violations means
    the dependency holds, and a dependency that HELD last month but
    breaks today is a schema-semantics regression no type check
    catches (the profiling complement to dq2's referential check; FD
    discovery is also how normalization candidates and denormalized
    duplication are found in a warehouse). Each candidate is one
    combiner-absorbed (A, distinct-B) aggregate folded to a single
    row; candidates union into a fixed-size report. Per-candidate cost
    is one key shuffle — the lattice miner repeats this primitive,
    it never gets worse than this per edge."""
    li = table(spark, sf_dir, "lineitem")
    outs = []
    for a, b in FD_CANDIDATES:
        g = li.groupBy(a).agg(F.count_distinct(b).alias("ndv"))
        viol = F.sum(F.when(F.col("ndv") > 1, 1).otherwise(0))
        outs.append(
            g.agg(
                F.count(F.lit(1)).alias("n_keys"),
                viol.alias("n_violating_keys"),
            ).select(
                F.lit(a).alias("determinant"),
                F.lit(b).alias("dependent"),
                "n_keys",
                "n_violating_keys",
                (F.col("n_violating_keys") == 0).alias("fd_holds"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


# ---------------------------------------------------------------------------
# mi1 — mutual information: value-bin × event-type dependence
# ---------------------------------------------------------------------------

MI_BINS = 8
MI_VALUE_WIDTH = 50.0


def _mi1_oracle() -> str:
    return f"""
WITH cells AS (
  SELECT LEAST({MI_BINS - 1},
               CAST(FLOOR(value / {MI_VALUE_WIDTH}) AS INTEGER)) AS bin,
         event_type,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
tot AS (SELECT SUM(c) AS n FROM cells),
margx AS (SELECT bin, SUM(c) AS cx FROM cells GROUP BY bin),
margy AS (SELECT event_type, SUM(c) AS cy FROM cells GROUP BY event_type)
SELECT cells.bin, cells.event_type, c,
       ROUND((CAST(c AS DOUBLE) / n)
             * LN((CAST(c AS DOUBLE) * n) / (CAST(cx AS DOUBLE) * cy)), 9)
         AS mi_contrib
FROM cells
JOIN margx USING (bin)
JOIN margy USING (event_type)
CROSS JOIN tot
"""


@register("mi1_mutual_information", _mi1_oracle())
def mi1_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between the binned value and the event type,
    reported per contingency cell (Σ mi_contrib is I(X;Y)) — the
    feature-selection statistic that catches NONLINEAR dependence
    where correlation (a8) sees nothing, and the information-theoretic
    sibling of stat1's chi-square on the same contingency shape. Fixed
    bins (no stats pre-pass), one cell aggregate, two tiny marginal
    aggregates rejoined on the cell table, one 1-row total crossed in
    — output is |bins|×|types| rows at any scale. Each contribution
    is one chain of double ops on exact integer counts, rounded at
    9."""
    ev = table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.least(
            F.lit(MI_BINS - 1),
            F.floor(F.col("value") / MI_VALUE_WIDTH).cast("int"),
        ).alias("bin"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("c"))
    tot = cells.agg(F.sum("c").alias("n"))
    margx = cells.groupBy("bin").agg(F.sum("c").alias("cx"))
    margy = cells.groupBy("event_type").agg(F.sum("c").alias("cy"))
    cd = F.col("c").cast("double")
    return (
        cells.join(margx, "bin")
        .join(margy, "event_type")
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "event_type",
            "c",
            F.round(
                (cd / F.col("n"))
                * F.log(
                    (cd * F.col("n"))
                    / (F.col("cx").cast("double") * F.col("cy"))
                ),
                9,
            ).alias("mi_contrib"),
        )
    )


# ---------------------------------------------------------------------------
# prof3 — corpus composition datasheet (doc + token shares by lang/source)
# ---------------------------------------------------------------------------


def _prof3_oracle() -> str:
    from bc_proj3_spark.operators.textstats import _T5_ORACLE

    return f"""
WITH tok AS (
{_T5_ORACLE}
),
base AS (
  SELECT d.lang, d.source, t.n_bpe_tokens
  FROM documents d JOIN tok t USING (doc_id)
),
g AS (
  SELECT lang, source, COUNT(*) AS n_docs,
         CAST(SUM(n_bpe_tokens) AS BIGINT) AS token_sum
  FROM base GROUP BY lang, source
),
tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS td,
         CAST(SUM(token_sum) AS BIGINT) AS tt
  FROM g
)
SELECT lang, source, n_docs, token_sum,
       ROUND(CAST(n_docs AS DOUBLE) / (SELECT td FROM tot), 9) AS doc_share,
       ROUND(CAST(token_sum AS DOUBLE) / (SELECT tt FROM tot), 9)
         AS token_share
FROM g
"""


@register("prof3_corpus_datasheet", _prof3_oracle())
def prof3_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus composition datasheet: per (language, source) cell,
    document count, BPE-token budget (t5's segmentation) and each
    cell's share of the whole corpus by docs and by tokens — the table
    every data-mixture decision (sp3 quotas, sp5 temperature weights)
    is made FROM, and the one a model card publishes. Token share and
    doc share diverge exactly where documents are longer/shorter than
    corpus average, which is the signal mixture tuning needs.

    Shape: one scan computes per-doc token counts (pure codegen), one
    (lang, source)-keyed aggregate — cells bounded by the vocabulary
    of (lang, source) pairs, never corpus-sized — and the 1-row totals
    broadcast back over the cell table."""
    from bc_proj3_spark.operators.textstats import t5_token_count

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    tok = t5_token_count(spark, sf_dir).select("doc_id", "n_bpe_tokens")
    g = (
        docs.join(tok, "doc_id")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bpe_tokens").cast("bigint").alias("token_sum"),
        )
    )
    # the (lang, source) cell table feeds both the totals and the final
    # share projection; the barrier stops the corpus token scan running
    # once per branch (cells are vocabulary-bounded — O(1) to hold)
    g = g.localCheckpoint(eager=True)
    tot = g.agg(
        F.sum("n_docs").cast("bigint").alias("td"),
        F.sum("token_sum").cast("bigint").alias("tt"),
    )
    return g.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "n_docs",
        "token_sum",
        F.round(F.col("n_docs").cast("double") / F.col("td"), 9).alias(
            "doc_share"
        ),
        F.round(F.col("token_sum").cast("double") / F.col("tt"), 9).alias(
            "token_share"
        ),
    )


# ---------------------------------------------------------------------------
# prof4 — per-column cardinality + entropy profile (the datasheet row
# a profiler prints for every categorical column)
# ---------------------------------------------------------------------------

#: categorical lineitem columns profiled — fixed set, so the output is
#: 4 rows at any corpus size.
PROF4_COLUMNS = ("l_linenumber", "l_linestatus", "l_quantity", "l_returnflag")


def _prof4_oracle() -> str:
    per_col = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS val FROM lineitem"
        for c in PROF4_COLUMNS
    )
    return f"""
WITH vals AS (
{per_col}
),
counts AS (
  SELECT col_name, val, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM vals GROUP BY col_name, val
),
lat AS (
  SELECT col_name, val, cnt,
         CAST(ROUND(LN(CAST(cnt AS DOUBLE)), 9) AS DECIMAL(13,9)) AS lncnt
  FROM counts
),
agg AS (
  SELECT col_name,
         CAST(SUM(cnt) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         SUM(CAST(cnt AS DECIMAL(20,0)) * lncnt) AS s,
         CAST(MAX(cnt) AS BIGINT) AS cmax
  FROM lat GROUP BY col_name
)
SELECT col_name, n_rows, n_distinct,
       CAST(CAST(ROUND(LN(CAST(n_rows AS DOUBLE)), 9) AS DECIMAL(13,9))
            AS DOUBLE)
         - CAST(s AS DOUBLE) / CAST(n_rows AS DOUBLE) AS entropy_nats,
       CAST(cmax AS DOUBLE) / CAST(n_rows AS DOUBLE) AS max_share
FROM agg
ORDER BY col_name
"""


@register("prof4_column_entropy", _prof4_oracle())
def prof4_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column value-distribution profile over lineitem's
    categorical columns: row count, distinct cardinality, Shannon
    entropy (nats) and the dominant value's share — the datasheet row
    every data profiler prints per column (prof1 profiles table-level
    counts, prof2 finds dependencies; this is the column-level
    distribution summary that flags near-constant columns, skewed
    enums, and identifier-like cardinality explosions before a join or
    encoding decision).

    Exactness: entropy uses the identity H = ln(N) - (Σ cnt·ln cnt)/N
    with every LN on the shared 9-dp decimal lattice (ROUND(LN(x),9),
    the t21/g9 discipline) and the Σ cnt·ln cnt carried as an
    order-free DECIMAL sum, so both engines compute bit-identical
    doubles from the same fixed chain; max_share is ONE IEEE division
    of exact integers.

    Scale shape: one lineitem scan fans all profiled columns out
    MAP-SIDE (stack → (col, val) pairs absorbed by a combiner-friendly
    groupBy); the second aggregate runs over the value histogram —
    vocabulary-bounded, never row-bounded. The output is
    len(PROF4_COLUMNS) rows at any corpus size."""
    li = table(spark, sf_dir, "lineitem").select(*PROF4_COLUMNS)
    stack_expr = "stack({n}, {args}) AS (col_name, val)".format(
        n=len(PROF4_COLUMNS),
        args=", ".join(
            f"'{c}', CAST({c} AS STRING)" for c in PROF4_COLUMNS
        ),
    )
    counts = (
        li.select(F.expr(stack_expr))
        .groupBy("col_name", "val")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    lncnt = F.round(F.log(F.col("cnt").cast("double")), 9).cast(
        "decimal(13,9)"
    )
    agg = counts.groupBy("col_name").agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(F.col("cnt").cast("decimal(20,0)") * lncnt).alias("s"),
        F.max("cnt").cast("bigint").alias("cmax"),
    )
    ln_n = F.round(F.log(F.col("n_rows").cast("double")), 9).cast(
        "decimal(13,9)"
    )
    return agg.select(
        "col_name",
        "n_rows",
        "n_distinct",
        (
            ln_n.cast("double")
            - F.col("s").cast("double") / F.col("n_rows").cast("double")
        ).alias("entropy_nats"),
        (F.col("cmax").cast("double") / F.col("n_rows").cast("double")).alias(
            "max_share"
        ),
    ).orderBy("col_name")
