"""Aggregate-function family: pivot, percentiles, ordered collections,
multi-distinct.

The reference's aggregate surface stops at count/max (SURVEY.md §2.4);
an engine replacing it needs the full aggregate toolbox. Each query
here exercises one family with a DuckDB oracle:

- pivot (crosstab) — Spark ``groupBy().pivot()``, oracle via CASE sums;
- exact interpolated percentiles — ``percentile()`` vs DuckDB's
  ``quantile_cont`` (both linear interpolation on the sorted set);
- ordered collection aggregates — ``sort_array(collect_list())`` /
  sorted ``concat_ws`` vs DuckDB ``list(... ORDER BY)`` /
  ``string_agg(... ORDER BY)``;
- several COUNT(DISTINCT) in one aggregation (expand-based plan).

Scale notes: pivot with an explicit value list compiles to one
aggregation with N conditional columns (no second pass to discover
values — always pass the list at scale); percentile is an exact
sort-based aggregate, the scale path swaps in approx_percentile
(t-digest sketch) — kept exact here because the oracle compares values;
multi-distinct plans via Expand (one shuffle carrying a distinct-set
tag column) rather than N separate scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bc_proj3_spark.functions.numeric import dec_sum, sql_dec_sum
from bc_proj3_spark.plans.tables import table
from bc_proj3_spark.registry import register

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")  # TESTDATA events


# ---------------------------------------------------------------------------
# a1 — pivot / crosstab: users × event types
# ---------------------------------------------------------------------------

_A1_ORACLE = f"""
SELECT
  user_id,
  {', '.join(f"CAST(COALESCE(SUM(CASE WHEN event_type = '{t}' THEN 1 END), 0) AS BIGINT) AS n_{t}" for t in EVENT_TYPES)}
FROM events
GROUP BY user_id
"""


@register("a1_pivot_event_matrix", _A1_ORACLE)
def a1_pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity matrix via groupBy().pivot() with an explicit
    value list — one aggregation pass, no value-discovery job. The
    null-fill keeps parity with the oracle's COALESCE."""
    ev = table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return out.select(
        "user_id", *[F.col(t).alias(f"n_{t}") for t in EVENT_TYPES]
    )


# ---------------------------------------------------------------------------
# a2 — exact interpolated percentiles per event type
# ---------------------------------------------------------------------------

_A2_ORACLE = """
SELECT
  event_type,
  quantile_cont(value, 0.5) AS p50,
  quantile_cont(value, 0.9) AS p90,
  MIN(value) AS v_min,
  MAX(value) AS v_max
FROM events
GROUP BY event_type
"""


@register("a2_value_percentiles", _A2_ORACLE)
def a2_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``). Exact percentile sorts within each
    group; at corpus scale swap in approx_percentile's t-digest — the
    exact form is kept here precisely so the oracle can value-match."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
    )


# ---------------------------------------------------------------------------
# a3 — ordered collection aggregates (array_agg / string_agg)
# ---------------------------------------------------------------------------

_A3_ORACLE = """
SELECT
  s_nationkey,
  string_agg(s_name, ',' ORDER BY s_name) AS supplier_csv,
  COUNT(*) AS n_suppliers
FROM supplier
GROUP BY s_nationkey
"""


@register("a3_ordered_collections", _A3_ORACLE)
def a3_ordered_collections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregates with a DETERMINISTIC order: collect_list
    gives arbitrary arrival order (partition race), so the engine's
    contract is sort-after-collect — the only way an array/string agg
    can be value-compared across engines (or across two of its own
    runs). The ordered array is built internally (sort_array over
    collect_list) but surfaced as its canonical CSV string: a raw
    array<string> column is not hashable by pandas-side comparators,
    and the joined string carries identical information."""
    supp = table(spark, sf_dir, "supplier")
    collected = F.sort_array(F.collect_list("s_name"))
    return supp.groupBy("s_nationkey").agg(
        F.array_join(collected, ",").alias("supplier_csv"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )


# ---------------------------------------------------------------------------
# a4 — several COUNT(DISTINCT) in one aggregation
# ---------------------------------------------------------------------------

_A4_ORACLE = f"""
SELECT
  o_orderpriority,
  COUNT(DISTINCT o_custkey) AS n_customers,
  COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_days,
  COUNT(*) AS n_orders,
  {sql_dec_sum("o_totalprice", "total_price")}
FROM orders
GROUP BY o_orderpriority
"""


@register("a4_multi_distinct", _A4_ORACLE)
def a4_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two COUNT(DISTINCT) plus plain aggregates in one groupBy: Spark
    plans this with a single Expand (distinct-set tag) — one shuffle,
    not one scan per distinct column."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct(F.col("o_orderdate").cast("date")).alias("n_days"),
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum("o_totalprice", "total_price"),
    )


# ---------------------------------------------------------------------------
# a6 — mergeable fixed-bin histogram quantiles (the sketch-shaped path
#      that a2's exact sort-based percentile swaps into at corpus scale)
# ---------------------------------------------------------------------------

HIST_BINS = 256

_A6_ORACLE = f"""
WITH rng AS (
  SELECT MIN(value) AS lo, MAX(value) AS hi FROM events
),
binned AS (
  SELECT event_type,
         least(CAST(floor((value - (SELECT lo FROM rng))
               / ((SELECT hi FROM rng) - (SELECT lo FROM rng))
               * {HIST_BINS}) AS BIGINT), {HIST_BINS - 1}) AS bin
  FROM events
),
hist AS (
  SELECT event_type, bin, COUNT(*) AS n FROM binned GROUP BY event_type, bin
),
cum AS (
  SELECT event_type, bin, n,
         SUM(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum_n,
         SUM(n) OVER (PARTITION BY event_type) AS total_n
  FROM hist
),
qs AS (
  SELECT event_type,
         MIN(CASE WHEN cum_n >= 0.5 * total_n THEN bin END) AS bin50,
         MIN(CASE WHEN cum_n >= 0.95 * total_n THEN bin END) AS bin95,
         MAX(total_n) AS n_events
  FROM cum GROUP BY event_type
)
SELECT event_type,
       (SELECT lo FROM rng) + bin50 * (((SELECT hi FROM rng) - (SELECT lo FROM rng)) / {HIST_BINS}) AS p50_approx,
       (SELECT lo FROM rng) + bin95 * (((SELECT hi FROM rng) - (SELECT lo FROM rng)) / {HIST_BINS}) AS p95_approx,
       CAST(n_events AS BIGINT) AS n_events
FROM qs
"""


@register("a6_histogram_quantiles", _A6_ORACLE)
def a6_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p95 per event type from a FIXED-width 256-bin
    histogram — the mergeable-sketch shape for quantiles at corpus
    scale (cf. sk1-sk4): per-partition histograms combine map-side
    (bin counts are plain sums), the final cumulative walk touches
    256 rows per group, and two shards' histograms merge by adding
    counts — none of which is true of a2's exact sort-based
    percentile. Error is bounded by one bin width; the bin edges
    derive from the exact global (min, max) 1-row aggregate, so both
    engines bin identically (floor on identical IEEE doubles) and the
    driver's value gate stays exact despite the operator being
    approximate — same strategy as the CMS/HLL family."""
    ev = table(spark, sf_dir, "events")
    rng = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(HIST_BINS)
    binned = ev.crossJoin(F.broadcast(rng)).select(
        "event_type",
        "lo",
        "hi",
        F.least(
            F.floor(
                (F.col("value") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * F.lit(HIST_BINS)
            ).cast("bigint"),
            F.lit(HIST_BINS - 1),
        ).alias("bin"),
    )
    hist = binned.groupBy("event_type", "lo", "hi", "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    from pyspark.sql.window import Window

    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "lo",
        "hi",
        "bin",
        F.sum("n").over(w_cum).alias("cum_n"),
        F.sum("n").over(w_all).alias("total_n"),
    )
    return cum.groupBy("event_type").agg(
        (
            F.first("lo")
            + F.min(
                F.when(
                    F.col("cum_n") >= F.lit(0.5) * F.col("total_n"),
                    F.col("bin"),
                )
            )
            * ((F.first("hi") - F.first("lo")) / F.lit(HIST_BINS))
        ).alias("p50_approx"),
        (
            F.first("lo")
            + F.min(
                F.when(
                    F.col("cum_n") >= F.lit(0.95) * F.col("total_n"),
                    F.col("bin"),
                )
            )
            * ((F.first("hi") - F.first("lo")) / F.lit(HIST_BINS))
        ).alias("p95_approx"),
        F.max("total_n").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# a7 — two-sided trimmed mean (robust aggregate)
# ---------------------------------------------------------------------------

#: fraction trimmed from EACH tail, as an exact integer divisor
#: (1/TRIM_DIV per side): k = floor(n / TRIM_DIV) rows drop per tail.
TRIM_DIV = 20

_A7_ORACLE = f"""
WITH ranked AS (
  SELECT c_mktsegment, c_acctbal,
         ROW_NUMBER() OVER (
           PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
         ) AS rn,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM customer
)
SELECT c_mktsegment,
       COUNT(*) AS n_kept,
       {sql_dec_sum('c_acctbal', 'kept_sum')},
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,10))) AS DOUBLE)
            / COUNT(*) AS DOUBLE) AS trimmed_mean
FROM ranked
WHERE rn > n // {TRIM_DIV} AND rn <= n - n // {TRIM_DIV}
GROUP BY c_mktsegment
"""


@register("a7_trimmed_mean", _A7_ORACLE)
def a7_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment 5%-per-tail trimmed mean of customer balance — the
    robust location estimate that survives the heavy-tailed outliers a
    plain AVG is dragged by. Exact semantics: rank rows within each
    group with a total order (value, then key), drop floor(n/20) rows
    from each tail, decimal-sum the rest.

    Plan: one shuffle on the group key feeds BOTH window functions
    (row_number + count share a partition) and the final aggregation —
    a single-exchange plan. At 100 TB the exact rank-trim becomes
    approx_percentile bounds + a filtered aggregate; kept exact here
    because the oracle compares values."""
    from pyspark.sql.window import Window

    cust = table(spark, sf_dir, "customer")
    w_rank = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    w_all = Window.partitionBy("c_mktsegment")
    ranked = cust.select(
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    trim_k = F.floor(F.col("n") / TRIM_DIV)
    return (
        ranked.filter(
            (F.col("rn") > trim_k) & (F.col("rn") <= F.col("n") - trim_k)
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            dec_sum("c_acctbal", "kept_sum"),
            (
                F.sum(F.col("c_acctbal").cast("decimal(28,10)")).cast("double")
                / F.count(F.lit(1))
            ).cast("double").alias("trimmed_mean"),
        )
    )


# ---------------------------------------------------------------------------
# a8 — Pearson correlation from exact decimal moments
# ---------------------------------------------------------------------------

_A8_ORACLE = """
WITH m AS (
  SELECT p_brand,
         COUNT(*) AS n,
         CAST(SUM(CAST(p_size AS DECIMAL(28,10))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(p_retailprice AS DECIMAL(28,10))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(p_size * p_size AS DECIMAL(28,10))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(p_retailprice * p_retailprice AS DECIMAL(28,10))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(p_size * p_retailprice AS DECIMAL(28,10))) AS DOUBLE) AS sxy
  FROM part
  GROUP BY p_brand
)
SELECT p_brand, n,
       ROUND((n * sxy - sx * sy)
             / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 9)
         AS corr_size_price
FROM m
"""


@register("a8_correlation", _A8_ORACLE)
def a8_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pearson correlation between part size and retail price,
    computed from the five exact-decimal moment sums rather than
    ``F.corr`` — Spark's ``corr`` accumulates co-moments in floating
    point in partition order, so its low bits are nondeterministic
    across runs and engines; moment sums in exact decimal are
    order-independent, and the final correlation formula is one double
    expression over identical operands in both engines (every double
    op correctly rounded → identical bits), rounded to 9 decimals.

    Plan shape: one map-side-combinable aggregation (the products are
    per-row projections) — the same single-exchange shape as AVG, no
    second pass, mergeable across shards by adding moments."""
    part = table(spark, sf_dir, "part")
    dec = "decimal(28,10)"
    m = part.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("p_size").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("p_retailprice").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("p_size") * F.col("p_size")).cast(dec))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("p_retailprice") * F.col("p_retailprice")).cast(dec))
        .cast("double")
        .alias("syy"),
        F.sum((F.col("p_size") * F.col("p_retailprice")).cast(dec))
        .cast("double")
        .alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        "p_brand", "n", F.round(num / den, 9).alias("corr_size_price")
    )


# ---------------------------------------------------------------------------
# a5 — unpivot (melt): wide matrix back to long form
# ---------------------------------------------------------------------------

_A5_ORACLE = f"""
WITH wide AS (
  SELECT
    user_id,
    {', '.join(f"CAST(COALESCE(SUM(CASE WHEN event_type = '{t}' THEN 1 END), 0) AS BIGINT) AS n_{t}" for t in EVENT_TYPES)}
  FROM events
  GROUP BY user_id
)
SELECT user_id, REPLACE(event_type, 'n_', '') AS event_type, n
FROM (
  SELECT user_id, event_type, n FROM wide
  UNPIVOT (n FOR event_type IN ({', '.join(f'n_{t}' for t in EVENT_TYPES)}))
  WHERE n > 0
)
"""


@register("a5_unpivot_melt", _A5_ORACLE)
def a5_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.unpivot`` (ANSI UNPIVOT / pandas melt): a1's wide
    user × event-type matrix back to long (user_id, event_type, n)
    rows, zero cells dropped — the wide↔long bridge every feature
    store crosses in both directions (a1 is the other half; composing
    them here pins the round trip against a DuckDB UNPIVOT oracle,
    restoring exactly the nonzero groupBy counts).

    unpivot is a zero-shuffle projection: each input row explodes to a
    fixed |columns| output rows map-side (Spark's Expand node, the same
    machinery grouping sets use). The only exchange in the plan is the
    a1 pivot aggregate it consumes. Column-name values arrive as the
    literal ``n_<type>`` labels; one regexp strips the prefix so the
    output speaks the domain vocabulary, not the matrix encoding."""
    wide = a1_pivot_event_matrix(spark, sf_dir)
    long = wide.unpivot(
        ids=["user_id"],
        values=[f"n_{t}" for t in EVENT_TYPES],
        variableColumnName="event_type",
        valueColumnName="n",
    )
    return long.filter(F.col("n") > 0).select(
        "user_id",
        F.regexp_replace("event_type", "^n_", "").alias("event_type"),
        "n",
    )


# ---------------------------------------------------------------------------
# stat1 — chi-square independence: event_type × day-of-week
# ---------------------------------------------------------------------------

#: day-of-week as (epoch_days % 7) — identical integer arithmetic in
#: both engines (Spark dayofweek() is 1=Sun..7, DuckDB dayofweek() is
#: 0=Sun..6: a dialect seam avoided entirely). 0 = Thursday (1970-01-01).
_STAT1_DOW_SPARK = "pmod(datediff(to_date(ts), DATE '1970-01-01'), 7)"
_STAT1_DOW_SQL = "((date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7) + 7) % 7"

_STAT1_ORACLE = f"""
WITH cells AS (
  SELECT event_type, {_STAT1_DOW_SQL} AS dow7, COUNT(*) AS n
  FROM events GROUP BY event_type, {_STAT1_DOW_SQL}
),
rows_ AS (SELECT event_type, SUM(n) AS rn FROM cells GROUP BY event_type),
cols_ AS (SELECT dow7, SUM(n) AS cn FROM cells GROUP BY dow7),
tot AS (SELECT SUM(n) AS t FROM cells)
SELECT c.event_type, c.dow7, c.n,
       ROUND(CAST(r.rn AS DOUBLE) * cn / (SELECT t FROM tot), 6) AS expected,
       ROUND(
         (c.n - CAST(r.rn AS DOUBLE) * cn / (SELECT t FROM tot))
         * (c.n - CAST(r.rn AS DOUBLE) * cn / (SELECT t FROM tot))
         / (CAST(r.rn AS DOUBLE) * cn / (SELECT t FROM tot)), 9) AS contrib
FROM cells c
JOIN rows_ r USING (event_type)
JOIN cols_ USING (dow7)
"""


@register("stat1_chi2_cells", _STAT1_ORACLE)
def stat1_chi2_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence screen for event_type × day-of-week:
    observed cell counts, expected counts under independence
    (row·col/N), and each cell's (O−E)²/E contribution — the
    contingency diagnostic behind "does behavior differ by weekday"
    (sum the contribs, compare to χ² at (R−1)(C−1) df; the per-cell
    rows localize WHICH cell drives the signal, which is what an
    analyst actually reads).

    One scan builds the cells; row/column margins are reductions OF the
    cell table (never a second scan) that broadcast back; the grand
    total rides a broadcast 1-row frame. Expected/contrib arithmetic is
    written with identical association in both engines, on exact
    integer margins cast once to double — only the division and
    multiply round, identically; outputs round at 6/9.

    Day-of-week is (epoch_days mod 7), sidestepping the engines'
    incompatible dayofweek() origins."""
    ev = table(spark, sf_dir, "events")
    dow = F.expr(_STAT1_DOW_SPARK).alias("dow7")
    cells = ev.groupBy("event_type", dow).agg(F.count(F.lit(1)).alias("n"))
    rows_ = cells.groupBy("event_type").agg(F.sum("n").alias("rn"))
    cols_ = cells.groupBy("dow7").agg(F.sum("n").alias("cn"))
    tot = cells.agg(F.sum("n").alias("t"))
    e = F.col("rn").cast("double") * F.col("cn") / F.col("t")
    return (
        cells.join(F.broadcast(rows_), "event_type")
        .join(F.broadcast(cols_), "dow7")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "dow7",
            "n",
            F.round(e, 6).alias("expected"),
            F.round((F.col("n") - e) * (F.col("n") - e) / e, 9).alias("contrib"),
        )
    )


# ---------------------------------------------------------------------------
# a9 — higher-order array functions over the embedding vectors
# ---------------------------------------------------------------------------

_A9_ORACLE = """
SELECT
  vec_id,
  len(embedding) AS dim,
  len(list_filter(embedding, x -> x > 0)) AS n_pos,
  ROUND(list_sum(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 6)
    AS l1_norm,
  ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS max_dim
FROM embeddings
"""


@register("a9_vector_hof", _A9_ORACLE)
def a9_vector_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions over array columns — the lambda surface
    (transform / filter / aggregate) that lets vector math stay inside
    whole-stage codegen instead of falling out to a Python UDF: per
    embedding, dimensionality, positive-dimension count, L1 norm (a
    left-fold — both engines reduce the list left-to-right, so the
    float sum associates identically), and max component. Everything is
    scan-side expression work: zero exchanges, zero Python workers, and
    the same lambdas DuckDB runs as list_transform/list_filter/
    list_sum. Elements are cast float→double BEFORE the fold in both
    engines so the accumulations happen in the same precision."""
    emb = table(spark, sf_dir, "embeddings")
    as_dbl = F.transform("embedding", lambda x: F.abs(x.cast("double")))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.aggregate(as_dbl, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("l1_norm"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_dim"),
    )


# ---------------------------------------------------------------------------
# mb1 — market-basket co-occurrence: top co-purchased part pairs
# ---------------------------------------------------------------------------

MB1_TOP_K = 50

_MB1_ORACLE = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT part_a, part_b, COUNT(*) AS n_orders
FROM pairs GROUP BY part_a, part_b
ORDER BY n_orders DESC, part_a, part_b
LIMIT {MB1_TOP_K}
"""


@register("mb1_copurchase_pairs", _MB1_ORACLE)
def mb1_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the most frequently co-purchased
    part pairs. Pair expansion on the basket key is the textbook
    quadratic trap; here it is safe BY DATA CONTRACT — baskets are
    bounded (TPC-H orders carry ≤7 lines), so per-key fan-out is ≤ 21
    pairs regardless of table size, and the expansion is map-side from
    each order's distinct part array, one lineitem scan, no self-join.
    (Unbounded baskets would need the d3-style hot-key cap
    first — the same pattern, which is why the shingle index caps
    document frequency.) collect_set first so quantity re-lines don't
    double-count; top-k through TakeOrderedAndProject, never a global
    sort. Deterministic tiebreak on the pair key."""
    from bc_proj3_spark.operators.graph import copurchase_pairs

    li = table(spark, sf_dir, "lineitem")
    # edge build: shared map-side pair expansion (graph.copurchase_pairs)
    pairs = copurchase_pairs(li).select(
        F.col("u").alias("part_a"), F.col("v").alias("part_b")
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(MB1_TOP_K)
    )


# ---------------------------------------------------------------------------
# a10 — map-column round trip (map_from_entries → explode → re-aggregate)
# ---------------------------------------------------------------------------

_A10_ORACLE = """
SELECT user_id, event_type, COUNT(*) AS n
FROM events
GROUP BY user_id, event_type
"""


@register("a10_map_roundtrip", _A10_ORACLE)
def a10_map_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MapType surface exercised end-to-end: per-user event-type
    counts are packed into ONE map column per user
    (map_from_entries over collect_list of structs — the "profile
    row" layout a serving store wants), then unpacked with explode
    back to relational rows. The oracle is the direct flat aggregate,
    so the value-hash gate proves the pack→unpack round trip is
    lossless — the property that lets a pipeline switch between
    row-per-fact and map-per-entity layouts without corruption. The
    map is bounded (≤ |event types| entries per user), so the packed
    row is small at any scale; one user-keyed shuffle builds it."""
    ev = table(spark, sf_dir, "events")
    flat = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    packed = flat.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("type_counts")
    )
    return packed.select(
        "user_id", F.explode("type_counts").alias("event_type", "n")
    )


# ---------------------------------------------------------------------------
# a12 — deterministic mode (modal value per group)
# ---------------------------------------------------------------------------

_A12_ORACLE = """
SELECT user_id, event_type AS modal_type, n
FROM (
  SELECT user_id, event_type, COUNT(*) AS n,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type
         ) AS rn
  FROM events GROUP BY user_id, event_type
) t WHERE rn = 1
"""


@register("a12_mode_per_group", _A12_ORACLE)
def a12_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's modal event type — the categorical summary behind
    modal imputation and segment labeling. Built as count + rank with
    a LEXICOGRAPHIC tiebreak rather than the engine's ``mode()``
    aggregate, because ANSI leaves mode's tie choice implementation-
    defined (Spark and DuckDB may disagree on the same data — the
    kind of nondeterminism a cross-engine result contract cannot
    contain). Two stages on one user-keyed exchange: the (user, type)
    count and the WindowGroupLimit top-1."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), "event_type"
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("modal_type"), "n")
    )


# ---------------------------------------------------------------------------
# a13 — exact weighted median per group
# ---------------------------------------------------------------------------

_A13_ORACLE = """
WITH wts AS (
  SELECT l_returnflag, l_extendedprice AS val,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY l_returnflag, l_extendedprice
),
cum AS (
  SELECT l_returnflag, val, w,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY val) AS cw,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM wts
)
SELECT l_returnflag,
       CAST(MAX(tw) AS BIGINT) AS total_weight,
       MIN(CASE WHEN 2 * cw >= tw THEN val END) AS weighted_median
FROM cum GROUP BY l_returnflag
"""


@register("a13_weighted_median", _A13_ORACLE)
def a13_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median of line price, weighted by quantity, per
    return flag — the robust center plain AVG and even the unweighted
    median get wrong when line sizes vary (the quantity-weighted median
    answers "the price of the MIDDLE UNIT shipped", the inventory-
    weighted view a reporting layer actually wants). Median is a
    SELECTION, so the result is an exact stored double — no rounding
    convention needed, cross-engine equality is by construction.

    Scale shape: the fact table collapses FIRST to (group, distinct
    value) weight sums — one map-side-combinable exchange — and the
    cumulative window runs over that collapsed table (distinct prices
    per flag, orders of magnitude smaller than line items; ties are
    gone after the collapse, so ROWS and RANGE frames agree). At a
    cardinality where even the distinct-value table overwhelms one
    partition, swap the window for a6-style fixed-bin histogram
    refinement — same two-scan budget."""
    from pyspark.sql.window import Window

    li = table(spark, sf_dir, "lineitem")
    wts = li.groupBy("l_returnflag", F.col("l_extendedprice").alias("val")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("w")
    )
    w_cum = Window.partitionBy("l_returnflag").orderBy("val")
    w_tot = Window.partitionBy("l_returnflag")
    cum = wts.select(
        "l_returnflag",
        "val",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_tot).alias("tw"),
    )
    return cum.groupBy("l_returnflag").agg(
        F.max("tw").cast("bigint").alias("total_weight"),
        F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("val"))).alias(
            "weighted_median"
        ),
    )


# ---------------------------------------------------------------------------
# stat2 — Welch's unequal-variance t-test between customer segments
# ---------------------------------------------------------------------------

_STAT2_ORACLE = """
WITH m AS (
  SELECT c_mktsegment AS seg,
         COUNT(*) AS n,
         CAST(SUM(pc) AS DOUBLE) AS sx,
         CAST(SUM(pc * pc) AS DOUBLE) AS sxx
  FROM (
    SELECT c_mktsegment,
           CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS pc
    FROM orders JOIN customer ON o_custkey = c_custkey
  ) j
  GROUP BY c_mktsegment
),
s AS (
  SELECT seg, n,
         sx / n AS mean,
         (sxx - sx * sx / n) / (n - 1) / n AS se2
  FROM m
)
SELECT a.seg AS seg_a, b.seg AS seg_b, a.n AS n_a, b.n AS n_b,
       ROUND((a.mean - b.mean) / SQRT(a.se2 + b.se2), 6) AS t_welch,
       ROUND((a.se2 + b.se2) * (a.se2 + b.se2)
             / (a.se2 * a.se2 / (a.n - 1) + b.se2 * b.se2 / (b.n - 1)), 3)
         AS df_welch
FROM s a JOIN s b ON a.seg < b.seg
"""


@register("stat2_welch_ttest", _STAT2_ORACLE)
def stat2_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic (and Welch–Satterthwaite
    degrees of freedom) for mean order value between every pair of
    customer market segments — the A/B-test read-out computed entirely
    from per-segment moments, never a row-level pairing.

    Determinism: moments accumulate over exact integer CENTS
    (ROUND(price·100) as BIGINT — prices are 2-dp quantities, so the
    cents value is unambiguous on both engines, sidestepping the
    double→DECIMAL grid-snap seam entirely); integer sums are exact in
    any order, and the t statistic is scale-invariant so cents cancel.
    The final formula is one double expression over identical operands
    in both engines, ROUND-wrapped per convention.

    Plan shape: one key-shuffle join (orders ⋈ customer), one
    map-side-combinable 5-row moment aggregate, then a 5×5 moment-row
    self-join — the pair stage costs nothing at any corpus scale, and
    the moments merge across shards by addition (the streaming/
    incremental form is the same aggregate)."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    dec38 = "decimal(38,0)"
    pc = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    j = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).select(F.col("c_mktsegment").alias("seg"), pc.alias("pc"))
    m = j.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("pc").cast(dec38)).cast("double").alias("sx"),
        F.sum((F.col("pc") * F.col("pc")).cast(dec38))
        .cast("double")
        .alias("sxx"),
    )
    # the 5-row moment table feeds BOTH sides of the pair self-join;
    # without a barrier Spark recomputes the full orders⋈customer
    # aggregate once per branch (no shared-subplan reuse) — at 100 TB
    # that is a double fact-table scan for a K-row intermediate.
    m = m.localCheckpoint(eager=True)
    s = m.select(
        "seg",
        "n",
        (F.col("sx") / F.col("n")).alias("mean"),
        (
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            / (F.col("n") - 1)
            / F.col("n")
        ).alias("se2"),
    )
    a, b = s.alias("a"), s.alias("b")
    se_sum = F.col("a.se2") + F.col("b.se2")
    return (
        # the moment table is bounded by #segments — broadcast the
        # right side so the non-equi pair join is a BNLJ over K rows,
        # never a shuffle cartesian
        a.join(F.broadcast(b), F.col("a.seg") < F.col("b.seg"))
        .select(
            F.col("a.seg").alias("seg_a"),
            F.col("b.seg").alias("seg_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            F.round(
                (F.col("a.mean") - F.col("b.mean")) / F.sqrt(se_sum), 6
            ).alias("t_welch"),
            F.round(
                se_sum
                * se_sum
                / (
                    F.col("a.se2") * F.col("a.se2") / (F.col("a.n") - 1)
                    + F.col("b.se2") * F.col("b.se2") / (F.col("b.n") - 1)
                ),
                3,
            ).alias("df_welch"),
        )
    )


# ---------------------------------------------------------------------------
# a15 — higher-moment distribution profile (skewness / kurtosis), exact
# ---------------------------------------------------------------------------

_A15_ORACLE = """
WITH m AS (
  SELECT source,
         COUNT(*) AS n,
         CAST(SUM(CAST(n_chars AS DECIMAL(10,0))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(n_chars AS DECIMAL(10,0))
                  * CAST(n_chars AS DECIMAL(10,0))) AS DOUBLE) AS s2,
         CAST(SUM(CAST(n_chars * n_chars AS DECIMAL(19,0))
                  * CAST(n_chars AS DECIMAL(10,0))) AS DOUBLE) AS s3,
         CAST(SUM(CAST(n_chars * n_chars AS DECIMAL(19,0))
                  * CAST(n_chars * n_chars AS DECIMAL(19,0))) AS DOUBLE)
           AS s4
  FROM documents
  GROUP BY source
),
c AS (
  SELECT source, n,
         s1 / n AS mu,
         s2 / n - (s1 / n) * (s1 / n) AS var_pop
  FROM m
)
SELECT c.source, c.n,
       ROUND(c.mu, 9) AS mean_chars,
       ROUND(SQRT(c.var_pop), 9) AS std_chars,
       ROUND((m.s3 / c.n - 3 * c.mu * m.s2 / c.n + 2 * c.mu * c.mu * c.mu)
             / (SQRT(c.var_pop) * SQRT(c.var_pop) * SQRT(c.var_pop)), 9)
         AS skewness,
       ROUND((m.s4 / c.n - 4 * c.mu * m.s3 / c.n
              + 6 * c.mu * c.mu * m.s2 / c.n
              - 3 * c.mu * c.mu * c.mu * c.mu)
             / (c.var_pop * c.var_pop) - 3, 9) AS excess_kurtosis
FROM c JOIN m USING (source)
"""


@register("a15_distribution_moments", _A15_ORACLE)
def a15_distribution_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length distribution profile: mean, standard
    deviation, skewness and excess kurtosis — the shape diagnostics a
    corpus datasheet reports (heavy right tails of document length are
    exactly where truncation losses and packing waste hide). Spark's
    built-in ``skewness``/``kurtosis`` accumulate central moments in
    floating point in partition order (nondeterministic low bits, no
    DuckDB twin), so the four RAW moments accumulate in exact
    DECIMAL(38,0) over the INTEGER length column — exact in any order
    at any scale, mergeable across shards — and the standardized
    moments are one double expression over identical operands in both
    engines, ROUND-wrapped. Exactness envelope: per-doc length ≤ 3.0e9
    chars and Σx⁴ < 10^38 per group (a billion 1M-char docs fits) —
    beyond that, shard the moment aggregate.

    Shape: one map-side-combinable aggregate (per-row integer powers),
    a grouped 5-row result; the moment vector is the streaming/
    incremental form for free (add the four sums)."""
    docs = table(spark, sf_dir, "documents")
    x = F.col("n_chars")
    # powers stay exact without int64 overflow: x as DECIMAL(10,0), x²
    # as a BIGINT product (exact for n_chars ≤ 3.0e9) widened to
    # DECIMAL(19,0), higher powers as decimal products whose precision
    # (20/29/38) never exceeds 38 — the naive (x*x*x*x).cast(decimal)
    # overflowed int64 at n_chars ≥ 55,109
    xd = x.cast("decimal(10,0)")
    x2d = (x * x).cast("decimal(19,0)")
    m = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("s1"),
        F.sum(xd * xd).cast("double").alias("s2"),
        F.sum(x2d * xd).cast("double").alias("s3"),
        F.sum(x2d * x2d).cast("double").alias("s4"),
    )
    mu = F.col("s1") / F.col("n")
    var_pop = F.col("s2") / F.col("n") - mu * mu
    c = m.select("source", "n", "s1", "s2", "s3", "s4",
                 mu.alias("mu"), var_pop.alias("var_pop"))
    sd = F.sqrt(F.col("var_pop"))
    mu_, n_ = F.col("mu"), F.col("n")
    skew = (
        F.col("s3") / n_ - 3 * mu_ * F.col("s2") / n_ + 2 * mu_ * mu_ * mu_
    ) / (sd * sd * sd)
    kurt = (
        F.col("s4") / n_
        - 4 * mu_ * F.col("s3") / n_
        + 6 * mu_ * mu_ * F.col("s2") / n_
        - 3 * mu_ * mu_ * mu_ * mu_
    ) / (F.col("var_pop") * F.col("var_pop")) - 3
    return c.select(
        "source",
        "n",
        F.round(F.col("mu"), 9).alias("mean_chars"),
        F.round(sd, 9).alias("std_chars"),
        F.round(skew, 9).alias("skewness"),
        F.round(kurt, 9).alias("excess_kurtosis"),
    )


# ---------------------------------------------------------------------------
# stat3 — two-sample Kolmogorov–Smirnov distance
# ---------------------------------------------------------------------------

#: the two customer segments whose balance distributions stat3 compares
KS_SEG_A = "BUILDING"
KS_SEG_B = "AUTOMOBILE"

#: value-bucket width (cents >> 16): the two-level prefix sum runs one
#: tiny bucket-offset window plus per-bucket windows — never one global
#: single-partition cumulative window over the whole value domain.
KS_BUCKET_SHIFT = 16

_STAT3_ORACLE = f"""
WITH pts AS (
  SELECT CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS v,
         CASE WHEN c_mktsegment = '{KS_SEG_A}' THEN 1 ELSE 0 END AS a,
         CASE WHEN c_mktsegment = '{KS_SEG_B}' THEN 1 ELSE 0 END AS b
  FROM customer
  WHERE c_mktsegment IN ('{KS_SEG_A}', '{KS_SEG_B}')
),
per_v AS (
  SELECT v, SUM(a) AS ca, SUM(b) AS cb FROM pts GROUP BY v
),
cum AS (
  SELECT SUM(ca) OVER (ORDER BY v) AS cum_a,
         SUM(cb) OVER (ORDER BY v) AS cum_b
  FROM per_v
),
n AS (
  SELECT CAST(SUM(ca) AS HUGEINT) AS na, CAST(SUM(cb) AS HUGEINT) AS nb
  FROM per_v
)
SELECT CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       CAST(MAX(ABS(nb * cum_a - na * cum_b)) AS BIGINT) AS d_scaled,
       CAST(MAX(ABS(nb * cum_a - na * cum_b)) AS DOUBLE)
         / CAST(na * nb AS DOUBLE) AS d
FROM cum, n
GROUP BY na, nb
"""


@register("stat3_ks_test", _STAT3_ORACLE)
def stat3_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the account-
    balance distributions of two customer segments: the whole-shape
    companion to stat2's mean test (a t-test is blind to equal-mean /
    different-shape drift, exactly what a training-data mixture shift
    looks like). D = sup_x |F_A(x) - F_B(x)|, evaluated at every
    observed distinct value.

    Exactness: balances are exact integer CENTS (stat2's convention);
    the ECDF gap is kept on the n_a*n_b-scaled integer lattice —
    d_scaled = max |n_b*cumA(v) - n_a*cumB(v)| is an exact integer
    (DECIMAL(38,0)/HUGEINT products, safe past 2^63 at any corpus
    size), and d is ONE IEEE division of two exact integers
    (EXACT_DOUBLE_OK).

    Scale shape: one segment-filtered scan collapses to the
    distinct-value table (combiner-absorbed; bounded by the cents
    domain, ~1.1M rows at ANY corpus size) which is localCheckpointed
    (it feeds the totals, the bucket offsets, and the cumulative pass —
    one FileScan, repo discipline). The running ECDF uses a TWO-LEVEL
    prefix sum: per-bucket totals (cents >> 16, <= ~17 buckets) get a
    tiny exclusive running-total window, broadcast back as offsets;
    the per-value cumulative window is PARTITIONED BY bucket — no
    global single-partition window anywhere. The 1-row totals frame
    crossJoins in (BNLJ-gated, tc1 precedent) and one max-aggregate
    collapses to the single output row."""
    from pyspark.sql.window import Window

    cust = table(spark, sf_dir, "customer")
    pts = cust.filter(
        F.col("c_mktsegment").isin(KS_SEG_A, KS_SEG_B)
    ).select(
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("v"),
        (F.col("c_mktsegment") == KS_SEG_A).cast("long").alias("a"),
        (F.col("c_mktsegment") == KS_SEG_B).cast("long").alias("b"),
    )
    per_v = (
        pts.groupBy("v")
        .agg(F.sum("a").alias("ca"), F.sum("b").alias("cb"))
        .withColumn("bkt", F.shiftright("v", KS_BUCKET_SHIFT))
        .localCheckpoint(eager=True)
    )
    n1 = per_v.agg(
        F.sum("ca").cast("decimal(38,0)").alias("na"),
        F.sum("cb").cast("decimal(38,0)").alias("nb"),
    )
    w_bkt = (
        Window.orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        per_v.groupBy("bkt")
        .agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"))
        .select(
            "bkt",
            F.coalesce(F.sum("ta").over(w_bkt), F.lit(0)).alias("off_a"),
            F.coalesce(F.sum("tb").over(w_bkt), F.lit(0)).alias("off_b"),
        )
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per_v.join(F.broadcast(offsets), "bkt").select(
        (F.col("off_a") + F.sum("ca").over(w_in))
        .cast("decimal(38,0)")
        .alias("cum_a"),
        (F.col("off_b") + F.sum("cb").over(w_in))
        .cast("decimal(38,0)")
        .alias("cum_b"),
    )
    diff = F.abs(
        F.col("nb") * F.col("cum_a") - F.col("na") * F.col("cum_b")
    )
    return (
        cum.crossJoin(F.broadcast(n1))
        .agg(
            F.max(F.col("na")).cast("bigint").alias("n_a"),
            F.max(F.col("nb")).cast("bigint").alias("n_b"),
            F.max(diff).cast("bigint").alias("d_scaled"),
            (
                F.max(diff).cast("double")
                / F.max(F.col("na") * F.col("nb")).cast("double")
            ).alias("d"),
        )
    )


# ---------------------------------------------------------------------------
# stat4 — Poisson-bootstrap confidence interval for the mean
# ---------------------------------------------------------------------------

#: number of bootstrap resamples (b = 0..B-1; b = -1 is the identity
#: pass carrying the point estimate through the same plan)
BOOT_B = 20

#: integer inverse CDF of Poisson(1) on a 0..9999 lattice: r < CUT[w]
#: => weight w (floor(1e4 * CDF(w)) thresholds — exact integers, so
#: both engines draw the identical deterministic weight)
_POIS_CUTS = (3679, 7358, 9197, 9810, 9963, 9994, 9999)


def _sql_pois_w(r: str) -> str:
    branches = " ".join(
        f"WHEN {r} < {c} THEN {w}" for w, c in enumerate(_POIS_CUTS)
    )
    return f"CASE {branches} ELSE {len(_POIS_CUTS)} END"


def _pois_w(r) -> "F.Column":
    w = F.when(r < _POIS_CUTS[0], 0)
    for i, c in enumerate(_POIS_CUTS[1:], start=1):
        w = w.when(r < c, i)
    return w.otherwise(len(_POIS_CUTS))


from bc_proj3_spark.functions.hashing import sql_hash60 as _sql_h60
from bc_proj3_spark.operators.sampling import _sql_seeded as _sql_sd

_STAT4_R = (
    "("
    + _sql_h60(
        _sql_sd("stat4", "CAST(o_orderkey AS VARCHAR)", "CAST(b AS VARCHAR)")
    )
    + " % 10000)"
)

_STAT4_ORACLE = f"""
WITH j AS (
  SELECT c_mktsegment AS seg,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
         o_orderkey
  FROM orders JOIN customer ON o_custkey = c_custkey
),
rs AS (
  SELECT seg, cents, b,
         CASE WHEN b = -1 THEN 1
              ELSE {_sql_pois_w(_STAT4_R)} END AS w
  FROM j CROSS JOIN (SELECT UNNEST(range(-1, {BOOT_B})) AS b)
),
agg AS (
  SELECT seg, b,
         CAST(SUM(CAST(w AS HUGEINT) * cents) AS HUGEINT) AS s,
         CAST(SUM(w) AS HUGEINT) AS wsum
  FROM rs GROUP BY seg, b
),
means AS (
  SELECT seg, b, wsum,
         CAST(s AS DOUBLE) / CAST(100 * wsum AS DOUBLE) AS m
  FROM agg
)
SELECT seg AS c_mktsegment,
       CAST(MAX(CASE WHEN b = -1 THEN wsum END) AS BIGINT) AS n_orders,
       MAX(CASE WHEN b = -1 THEN m END) AS mean_price,
       MIN(CASE WHEN b >= 0 THEN m END) AS ci_lo,
       MAX(CASE WHEN b >= 0 THEN m END) AS ci_hi
FROM means
GROUP BY seg
"""


@register("stat4_bootstrap_ci", _STAT4_ORACLE)
def stat4_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-bootstrap 95%-ish confidence interval for the mean
    order value per customer segment, via the Poisson bootstrap (the
    large-scale streaming form: resample multiplicities drawn per row,
    never a with-replacement shuffle — Chamandy et al., "Estimating
    Uncertainty for Massive Data Streams", Google TR 2012). stat2 says
    whether two segments differ; this says how wide each segment's own
    estimate is — the error bar a dashboard or an A/A sanity check
    needs. At B = {B} the reported interval is the exact-rank
    [1st, Bth] order-statistic envelope of the resample means.

    Determinism/exactness: the Poisson(1) multiplicity is an integer
    inverse-CDF lookup on (seeded-hash mod 10000) — pure integer
    CASE thresholds, so both engines draw the IDENTICAL resamples
    (no RNG); each resample mean is ONE IEEE division of exact
    DECIMAL(38,0)/HUGEINT sums (cents, stat2's convention), so the
    doubles are bit-identical and min/max over them are too
    (EXACT_DOUBLE_OK). b = -1 rides the identity weight and carries
    the point estimate through the same plan.

    Scale shape: one key-shuffle join (orders x customer), then a
    MAP-SIDE (B+1)-way explode whose fan-out is absorbed by partial
    aggregation before the only small shuffle — the (segment x B)
    grid, ~100 groups at any corpus size; no resampled dataset is
    ever materialized, and adding resamples widens the combiner
    state, not the shuffle. The slim joined frame is repartitioned to
    an EXPLICIT width before the explode: the join output is
    byte-small, so AQE coalesces it (to ONE partition on the bench
    host) and the (B+1)x hash expansion — the query's entire CPU —
    would serialize on a single core; an explicit user width is
    exempt from AQE coalescing and costs one shuffle of the
    pre-fan-out rows (measured 7.3 s -> 1.5 s at sf0.1 steady
    state).""".replace("{B}", str(BOOT_B))
    from bc_proj3_spark.functions.hashing import hash60
    from bc_proj3_spark.operators.sampling import _seeded

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    j = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias(
            "cents"
        ),
        "o_orderkey",
    ).repartition(spark.sparkContext.defaultParallelism, "o_orderkey")
    rs = j.select(
        "seg",
        "cents",
        "o_orderkey",
        F.explode(
            F.array(*[F.lit(b) for b in range(-1, BOOT_B)])
        ).alias("b"),
    )
    r = (
        hash60(
            _seeded(
                "stat4",
                F.col("o_orderkey").cast("string"),
                F.col("b").cast("string"),
            )
        )
        % 10000
    )
    w = F.when(F.col("b") == -1, 1).otherwise(_pois_w(r))
    agg = rs.select("seg", "b", "cents", w.alias("w")).groupBy(
        "seg", "b"
    ).agg(
        F.sum(F.col("w").cast("decimal(38,0)") * F.col("cents")).alias("s"),
        F.sum("w").cast("decimal(38,0)").alias("wsum"),
    )
    means = agg.select(
        "seg",
        "b",
        "wsum",
        (
            F.col("s").cast("double")
            / (F.lit(100) * F.col("wsum")).cast("double")
        ).alias("m"),
    )
    return means.groupBy("seg").agg(
        F.max(F.when(F.col("b") == -1, F.col("wsum")))
        .cast("bigint")
        .alias("n_orders"),
        F.max(F.when(F.col("b") == -1, F.col("m"))).alias("mean_price"),
        F.min(F.when(F.col("b") >= 0, F.col("m"))).alias("ci_lo"),
        F.max(F.when(F.col("b") >= 0, F.col("m"))).alias("ci_hi"),
    ).withColumnRenamed("seg", "c_mktsegment")


# ---------------------------------------------------------------------------
# a14 — median-absolute-deviation robust outliers
# ---------------------------------------------------------------------------

#: robust outlier rule: |x - median| > MAD_K * MAD (the classic k=3)
MAD_K = 3

_A14_ORACLE = f"""
WITH pv AS (
  SELECT c_mktsegment AS seg,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS v,
         COUNT(*) AS cnt
  FROM customer GROUP BY seg, v
),
cum AS (
  SELECT seg, v, cnt,
         SUM(cnt) OVER (PARTITION BY seg ORDER BY v) AS c,
         SUM(cnt) OVER (PARTITION BY seg) AS n
  FROM pv
),
med AS (
  SELECT seg, MAX(n) AS n,
         MAX(CASE WHEN c - cnt < (n + 1) // 2 AND (n + 1) // 2 <= c
                  THEN v END)
           + MAX(CASE WHEN c - cnt < (n + 2) // 2 AND (n + 2) // 2 <= c
                      THEN v END) AS twice_med
  FROM cum GROUP BY seg
),
dev AS (
  SELECT pv.seg, ABS(2 * pv.v - m.twice_med) AS dev2,
         SUM(pv.cnt) AS cnt
  FROM pv JOIN med m ON pv.seg = m.seg
  GROUP BY pv.seg, ABS(2 * pv.v - m.twice_med)
),
dcum AS (
  SELECT seg, dev2, cnt,
         SUM(cnt) OVER (PARTITION BY seg ORDER BY dev2) AS c,
         SUM(cnt) OVER (PARTITION BY seg) AS n
  FROM dev
),
mad AS (
  SELECT seg,
         MAX(CASE WHEN c - cnt < (n + 1) // 2 AND (n + 1) // 2 <= c
                  THEN dev2 END)
           + MAX(CASE WHEN c - cnt < (n + 2) // 2 AND (n + 2) // 2 <= c
                      THEN dev2 END) AS twice_mad2
  FROM dcum GROUP BY seg
),
flags AS (
  SELECT d.seg,
         SUM(CASE WHEN 2 * d.dev2 > {MAD_K} * m.twice_mad2
                  THEN d.cnt ELSE 0 END) AS n_outliers
  FROM dev d JOIN mad m ON d.seg = m.seg
  GROUP BY d.seg
)
SELECT med.seg AS c_mktsegment,
       CAST(med.n AS BIGINT) AS n,
       CAST(med.twice_med AS DOUBLE) / 200 AS median_bal,
       CAST(mad.twice_mad2 AS DOUBLE) / 400 AS mad_bal,
       CAST(flags.n_outliers AS BIGINT) AS n_outliers
FROM med JOIN mad ON med.seg = mad.seg
JOIN flags ON med.seg = flags.seg
"""


@register("a14_mad_outliers", _A14_ORACLE)
def a14_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen per customer segment: median balance,
    median absolute deviation, and the count of |x - median| > 3*MAD
    points. o5's z-score rule breaks exactly when it matters — one
    fat-fingered balance inflates the stddev it is judged against —
    while the MAD breakdown point is 50%; this is the screen to run
    BEFORE trusting moment-based statistics (a15, stat2) on dirty
    money columns.

    Exactness: the interpolated median over exact integer cents is
    carried as twice_med = v_(ceil(n/2)) + v_(floor(n/2)+1) (the sum
    of the two middle order statistics — an exact integer, no /2
    ever happens); deviations ride the doubled lattice (dev2 =
    |2v - twice_med|) and the MAD as twice_mad2 (= 4*MAD, exact); the
    outlier rule dev > 3*MAD is the all-integer comparison
    2*dev2 > 3*twice_mad2. The two display divisions (/200, /400 into
    dollars) are single IEEE divisions of exact integers
    (EXACT_DOUBLE_OK). Rank selection is interpolation-FREE on both
    engines (cur1's lesson: never feed quantile_cont output into a
    comparison).

    Scale shape: a13's collapse discipline — every rank selection
    runs over the (segment, distinct-cents) count table (bounded by
    the value domain, ~1.1M rows at ANY corpus size), never the fact
    rows; the fact table is touched ONCE by the collapsing groupBy.
    pv and dev each feed two branches and are localCheckpointed; the
    5-row median/MAD tables broadcast back onto the collapsed table
    only."""
    from pyspark.sql.window import Window

    cust = table(spark, sf_dir, "customer")
    pv = (
        cust.groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )

    def _twice_rank_stat(counts: DataFrame, val: str) -> DataFrame:
        """Sum of the two middle order statistics of `val` weighted by
        cnt, per seg — the doubled exact median, never divided."""
        w_ord = (
            Window.partitionBy("seg")
            .orderBy(val)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        w_all = Window.partitionBy("seg")
        cum = counts.select(
            "seg",
            F.col(val).alias("x"),
            "cnt",
            F.sum("cnt").over(w_ord).alias("c"),
            F.sum("cnt").over(w_all).alias("n"),
        )
        k1 = (F.col("n") + 1) / 2
        k2 = (F.col("n") + 2) / 2
        covers = lambda k: (F.col("c") - F.col("cnt") < F.floor(k)) & (
            F.floor(k) <= F.col("c")
        )
        return cum.groupBy("seg").agg(
            F.max("n").alias("n"),
            (
                F.max(F.when(covers(k1), F.col("x")))
                + F.max(F.when(covers(k2), F.col("x")))
            ).alias("twice"),
        )

    med = _twice_rank_stat(pv, "v").withColumnRenamed("twice", "twice_med")
    dev = (
        pv.join(F.broadcast(med.select("seg", "twice_med")), "seg")
        .groupBy(
            "seg",
            F.abs(F.lit(2) * F.col("v") - F.col("twice_med")).alias("dev2"),
        )
        .agg(F.sum("cnt").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    mad = (
        _twice_rank_stat(dev, "dev2")
        .select("seg", F.col("twice").alias("twice_mad2"))
    )
    flags = (
        dev.join(F.broadcast(mad), "seg")
        .groupBy("seg")
        .agg(
            F.sum(
                F.when(
                    F.lit(2) * F.col("dev2")
                    > F.lit(MAD_K) * F.col("twice_mad2"),
                    F.col("cnt"),
                ).otherwise(F.lit(0))
            ).alias("n_outliers")
        )
    )
    return (
        med.join(mad, "seg")
        .join(flags, "seg")
        .select(
            F.col("seg").alias("c_mktsegment"),
            F.col("n").cast("bigint").alias("n"),
            (F.col("twice_med").cast("double") / 200).alias("median_bal"),
            (F.col("twice_mad2").cast("double") / 400).alias("mad_bal"),
            F.col("n_outliers").cast("bigint").alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# a16 — Gini / concentration of customer spend per segment
# ---------------------------------------------------------------------------

#: spend-value bucket width (cents >> 20) for the two-level prefix sum —
#: per-customer lifetime spend spans a wider domain than a balance
#: column, so the bucket grid is coarser than stat3's (the bucket COUNT
#: stays bounded by the value domain, never by corpus size).
GINI_BUCKET_SHIFT = 20

_A16_ORACLE = """
WITH spend AS (
  SELECT c_mktsegment AS seg, o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS v
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY seg, o_custkey
),
pv AS (SELECT seg, v, COUNT(*) AS cnt FROM spend GROUP BY seg, v),
cum AS (
  SELECT seg, v, cnt,
         SUM(cnt) OVER (PARTITION BY seg ORDER BY v) AS c
  FROM pv
),
tot AS (
  SELECT seg, CAST(SUM(cnt) AS BIGINT) AS n,
         SUM(CAST(v AS HUGEINT) * cnt) AS t
  FROM pv GROUP BY seg
),
terms AS (
  SELECT c.seg,
         SUM(CAST(c.v AS HUGEINT)
             * (2 * c.cnt * (c.c - c.cnt) + c.cnt * (c.cnt + 1))) AS s2,
         SUM(CAST(c.v AS HUGEINT)
             * GREATEST(LEAST(t.n // 10 - (t.n - c.c), c.cnt), 0)) AS topk
  FROM cum c JOIN tot t ON c.seg = t.seg
  GROUP BY c.seg
)
SELECT t.seg AS c_mktsegment,
       t.n AS n_customers,
       CAST(t.t AS DOUBLE) / 100 AS total_spend,
       CAST(terms.s2 - (t.n + 1) * t.t AS DOUBLE)
         / CAST(t.n * t.t AS DOUBLE) AS gini,
       CAST(terms.topk AS DOUBLE) / CAST(t.t AS DOUBLE) AS top_decile_share
FROM tot t JOIN terms ON t.seg = terms.seg
"""


@register("a16_gini_concentration", _A16_ORACLE)
def a16_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend-concentration profile per customer segment: Gini
    coefficient of per-customer lifetime spend plus the share held by
    the top decile of customers. The corpus-curation twin is source
    concentration — a mixture whose Gini drifts toward 1 is becoming a
    single-source corpus however many sources it nominally lists — and
    the same two numbers are how revenue teams read whale-dependence.
    prof3 reports the shares themselves; this collapses them into the
    two scalars a dashboard can alarm on.

    Exactness: per-customer spend is an exact BIGINT cents sum. With
    values sorted ascending, ties carrying equal values make
    sum(i * x_i) permutation-invariant, and a tie block with prior
    cumulative count p and multiplicity m contributes exactly
    x * (2*m*p + m*(m+1)) to 2*sum(i*x_i) — so gini =
    (2*sum(i*x_i) - (n+1)*T) / (n*T) has exact DECIMAL(38,0)/HUGEINT
    numerator and denominator and is ONE IEEE division
    (EXACT_DOUBLE_OK, g3's convention); top_decile_share takes
    max(0, min(k - rows_above, m)) customers from each block at
    k = n DIV 10 — all-integer selection, one division.

    Scale shape: orders collapses map-side-combinably to per-customer
    totals (one key shuffle shared with the customer join), then to
    the (seg, distinct-spend) count table, which is localCheckpointed
    (it feeds totals, bucket offsets, and the ranked pass — one
    FileScan per input). The ranked cumulative count runs stat3's
    TWO-LEVEL prefix sum — per-bucket totals (cents >> 20) get a tiny
    running-total window broadcast back as offsets; the per-value
    window is PARTITIONED BY (seg, bucket) — never a single-partition
    global sort even at 10^9 customers. The 5-row totals broadcast
    back onto the collapsed table only."""
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    spend = (
        orders.join(
            cust.select("c_custkey", "c_mktsegment"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("v")
        )
    )
    pv = (
        spend.groupBy("seg", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("bkt", F.shiftright("v", GINI_BUCKET_SHIFT))
        .localCheckpoint(eager=True)
    )
    tot = pv.groupBy("seg").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("cnt")).alias("t"),
    )
    w_bkt = (
        Window.partitionBy("seg")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        pv.groupBy("seg", "bkt")
        .agg(F.sum("cnt").alias("tc"))
        .select(
            "seg",
            "bkt",
            F.coalesce(F.sum("tc").over(w_bkt), F.lit(0)).alias("off"),
        )
    )
    w_in = (
        Window.partitionBy("seg", "bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = pv.join(F.broadcast(offsets), ["seg", "bkt"]).select(
        "seg",
        "v",
        "cnt",
        (F.col("off") + F.sum("cnt").over(w_in)).alias("c"),
    )
    k = F.expr("n DIV 10")
    take = F.greatest(
        F.least(k - (F.col("n") - F.col("c")), F.col("cnt")), F.lit(0)
    )
    terms = (
        cum.join(F.broadcast(tot), "seg")
        .groupBy("seg")
        .agg(
            F.sum(
                F.col("v").cast("decimal(38,0)")
                * (
                    2 * F.col("cnt") * (F.col("c") - F.col("cnt"))
                    + F.col("cnt") * (F.col("cnt") + 1)
                )
            ).alias("s2"),
            F.sum(F.col("v").cast("decimal(38,0)") * take).alias("topk"),
        )
    )
    num = F.col("s2") - (F.col("n") + 1).cast("decimal(38,0)") * F.col("t")
    den = F.col("n").cast("decimal(38,0)") * F.col("t")
    return tot.join(terms, "seg").select(
        F.col("seg").alias("c_mktsegment"),
        F.col("n").cast("bigint").alias("n_customers"),
        (F.col("t").cast("double") / 100).alias("total_spend"),
        (num.cast("double") / den.cast("double")).alias("gini"),
        (F.col("topk").cast("double") / F.col("t").cast("double")).alias(
            "top_decile_share"
        ),
    )


# ---------------------------------------------------------------------------
# stat5 — Mann–Whitney U (rank-sum) test between customer segments
# ---------------------------------------------------------------------------

_STAT5_ORACLE = f"""
WITH pts AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v,
         CASE WHEN c_mktsegment = '{KS_SEG_A}' THEN 1 ELSE 0 END AS a,
         CASE WHEN c_mktsegment = '{KS_SEG_B}' THEN 1 ELSE 0 END AS b
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('{KS_SEG_A}', '{KS_SEG_B}')
),
pv AS (
  SELECT v, SUM(a) AS ca, SUM(b) AS cb FROM pts GROUP BY v
),
cum AS (
  SELECT v, ca, cb, ca + cb AS m,
         SUM(ca + cb) OVER (ORDER BY v) - (ca + cb) AS p
  FROM pv
),
agg AS (
  SELECT CAST(SUM(ca) AS HUGEINT) AS na,
         CAST(SUM(cb) AS HUGEINT) AS nb,
         SUM(CAST(ca AS HUGEINT) * (2 * p + m + 1)) AS r2a,
         SUM(CAST(m AS HUGEINT) * m * m - m) AS t3
  FROM cum
)
SELECT CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       CAST(r2a - na * (na + 1) AS BIGINT) AS u2_a,
       CAST(r2a - na * (na + 1) AS DOUBLE) / 2 AS u_a,
       CAST(r2a - na * (na + 1) - na * nb AS DOUBLE)
         / (2 * SQRT(
             (CAST(na * nb AS DOUBLE)
              / CAST(12 * (na + nb) * (na + nb - 1) AS DOUBLE))
             * CAST((na + nb) * (na + nb) * (na + nb) - (na + nb) - t3
                    AS DOUBLE)
           )) AS z
FROM agg
"""


@register("stat5_mann_whitney", _STAT5_ORACLE)
def stat5_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test between two customer
    segments' order values, tie-corrected. Completes the two-sample
    triad: stat2's Welch t compares means (and assumes the CLT has
    kicked in), stat3's KS compares whole shapes (but over-rejects on
    heavy discretization); the rank-sum U is the workhorse for skewed
    money distributions - it tests stochastic dominance and is
    invariant to any monotone transform of the values.

    Exactness: doubled average ranks are exact integers (a tie block
    with pooled prior count p and multiplicity m has 2*avgrank =
    2p + m + 1), so 2*R_A = sum(ca * (2p + m + 1)) and u2_a =
    2*U_A = 2*R_A - n_a*(n_a+1) are exact DECIMAL(38,0)/HUGEINT
    integers; the tie correction sum(m^3 - m) likewise. z factors the
    variance as (n_a*n_b / (12*N*(N-1))) * (N^3 - N - T3) so no
    intermediate exceeds 38 digits below N ~ 2e12; both engines then
    run the IDENTICAL IEEE chain div, mul, sqrt, div
    (EXACT_DOUBLE_OK, ts9's num/sqrt(den) precedent).

    Scale shape: stat3's collapse discipline - the segment-filtered
    join collapses map-side-combinably to the distinct-cents table
    (bounded by the value domain at any corpus size), localCheckpointed
    once; the pooled prior count runs the TWO-LEVEL prefix sum
    (per-bucket offsets broadcast back, per-value window PARTITIONED BY
    bucket - no global single-partition window); one final 1-row
    aggregate."""
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    pts = (
        orders.join(
            cust.filter(F.col("c_mktsegment").isin(KS_SEG_A, KS_SEG_B)).select(
                "c_custkey", "c_mktsegment"
            ),
            orders.o_custkey == F.col("c_custkey"),
        )
        .select(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("v"),
            (F.col("c_mktsegment") == KS_SEG_A).cast("long").alias("a"),
            (F.col("c_mktsegment") == KS_SEG_B).cast("long").alias("b"),
        )
    )
    pv = (
        pts.groupBy("v")
        .agg(F.sum("a").alias("ca"), F.sum("b").alias("cb"))
        .withColumn("m", F.col("ca") + F.col("cb"))
        .withColumn("bkt", F.shiftright("v", KS_BUCKET_SHIFT))
        .localCheckpoint(eager=True)
    )
    w_bkt = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        pv.groupBy("bkt")
        .agg(F.sum("m").alias("tm"))
        .select(
            "bkt",
            F.coalesce(F.sum("tm").over(w_bkt), F.lit(0)).alias("off"),
        )
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = pv.join(F.broadcast(offsets), "bkt").select(
        "ca",
        "cb",
        "m",
        (F.col("off") + F.sum("m").over(w_in) - F.col("m")).alias("p"),
    )
    dec = "decimal(38,0)"
    m_d = F.col("m").cast(dec)
    agg = cum.agg(
        F.sum("ca").cast(dec).alias("na"),
        F.sum("cb").cast(dec).alias("nb"),
        F.sum(
            F.col("ca").cast(dec) * (2 * F.col("p") + F.col("m") + 1)
        ).alias("r2a"),
        F.sum(m_d * m_d * m_d - m_d).alias("t3"),
    )
    na, nb, r2a, t3 = F.col("na"), F.col("nb"), F.col("r2a"), F.col("t3")
    nn = na + nb
    u2 = r2a - na * (na + 1)
    var = (
        (na * nb).cast("double") / (12 * nn * (nn - 1)).cast("double")
    ) * (nn * nn * nn - nn - t3).cast("double")
    return agg.select(
        na.cast("bigint").alias("n_a"),
        nb.cast("bigint").alias("n_b"),
        u2.cast("bigint").alias("u2_a"),
        (u2.cast("double") / 2).alias("u_a"),
        ((u2 - na * nb).cast("double") / (2 * F.sqrt(var))).alias("z"),
    )


# ---------------------------------------------------------------------------
# stat6 — permutation test for the segment mean-difference
# ---------------------------------------------------------------------------

#: permutation count (b = 0..PERM_B-1; b = -1 is the identity pass
#: carrying the observed statistic through the same plan)
PERM_B = 20

_STAT6_R = (
    "("
    + _sql_h60(
        _sql_sd("perm", "CAST(o_orderkey AS VARCHAR)", "CAST(b AS VARCHAR)")
    )
    + ")"
)

_STAT6_ORACLE = f"""
WITH j AS (
  SELECT CASE WHEN c_mktsegment = '{KS_SEG_A}' THEN 1 ELSE 0 END AS is_a,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
         o_orderkey
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('{KS_SEG_A}', '{KS_SEG_B}')
),
tot AS (
  SELECT CAST(SUM(is_a) AS BIGINT) AS na, COUNT(*) AS n FROM j
),
rs AS (
  SELECT b,
         CASE WHEN b = -1 THEN is_a
              WHEN {_STAT6_R} % n < na THEN 1 ELSE 0 END AS in_a,
         cents
  FROM j CROSS JOIN (SELECT UNNEST(range(-1, {PERM_B})) AS b) bb
  CROSS JOIN tot
),
agg AS (
  SELECT b,
         CAST(SUM(CASE WHEN in_a = 1 THEN CAST(cents AS HUGEINT) END)
              AS HUGEINT) AS sa,
         CAST(SUM(in_a) AS HUGEINT) AS ca,
         CAST(SUM(CASE WHEN in_a = 0 THEN CAST(cents AS HUGEINT) END)
              AS HUGEINT) AS sb,
         CAST(SUM(1 - in_a) AS HUGEINT) AS cb
  FROM rs GROUP BY b
),
diffs AS (
  SELECT b,
         CAST(sa AS DOUBLE) / CAST(100 * ca AS DOUBLE)
           - CAST(sb AS DOUBLE) / CAST(100 * cb AS DOUBLE) AS d
  FROM agg
)
SELECT (SELECT na FROM tot) AS n_a,
       (SELECT n - na FROM tot) AS n_b,
       MAX(CASE WHEN b = -1 THEN d END) AS obs_diff,
       CAST(SUM(CASE WHEN b >= 0 AND ABS(d) >=
                ABS((SELECT d FROM diffs WHERE b = -1))
                THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
       CAST(1 + SUM(CASE WHEN b >= 0 AND ABS(d) >=
                ABS((SELECT d FROM diffs WHERE b = -1))
                THEN 1 ELSE 0 END) AS DOUBLE) / {PERM_B + 1} AS p_value
FROM diffs
"""


@register("stat6_permutation_test", _STAT6_ORACLE)
def stat6_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monte-Carlo permutation test for the mean order-value gap
    between two customer segments: relabel every order PERM_B times
    with a deterministic hash coin calibrated to the observed group
    balance (P(A') = n_a/N), recompute the mean difference under each
    relabeling, and report how often chance alone matches the observed
    gap. This is the assumption-free companion to the parametric trio:
    stat2 trusts the CLT, stat5 tests ranks, the permutation test
    tests THE ACTUAL STATISTIC under the exchangeability null with no
    distributional assumption at all — the estimator of last resort
    for weird, multimodal money distributions (and at B = 20 the
    add-one p-value floor 1/21 is the honest resolution bound).

    Determinism/exactness: relabelings are seeded-hash integer
    comparisons (h mod N < n_a) — both engines draw the identical
    pseudo-permutations, no RNG state; each per-b mean difference is
    a fixed chain of two exact-integer IEEE divisions and one
    subtraction, so the extreme-count comparisons see bit-identical
    doubles (EXACT_DOUBLE_OK); p_value is one division by the
    literal B+1.

    Scale shape: stat4's fan-out discipline — one key-shuffle join,
    1-row group-balance broadcast, then a MAP-SIDE (B+1)-way explode
    absorbed by partial aggregation before the only shuffle (the
    B+1-row grid at any corpus size); the slim pre-fan-out frame is
    repartitioned to an explicit AQE-exempt width so the hash
    expansion parallelizes (the stat4 lesson, measured 7.3->1.5 s)."""
    from bc_proj3_spark.functions.hashing import hash60
    from bc_proj3_spark.operators.sampling import _seeded

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    j = (
        orders.join(
            cust.filter(
                F.col("c_mktsegment").isin(KS_SEG_A, KS_SEG_B)
            ).select("c_custkey", "c_mktsegment"),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .select(
            (F.col("c_mktsegment") == KS_SEG_A).cast("long").alias("is_a"),
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias(
                "cents"
            ),
            "o_orderkey",
        )
        .repartition(spark.sparkContext.defaultParallelism, "o_orderkey")
    )
    tot = j.agg(
        F.sum("is_a").cast("bigint").alias("na"),
        F.count(F.lit(1)).alias("n"),
    )
    rs = j.crossJoin(F.broadcast(tot)).select(
        "is_a",
        "cents",
        "o_orderkey",
        "na",
        "n",
        F.explode(F.array(*[F.lit(b) for b in range(-1, PERM_B)])).alias("b"),
    )
    h = hash60(
        _seeded(
            "perm",
            F.col("o_orderkey").cast("string"),
            F.col("b").cast("string"),
        )
    )
    in_a = (
        F.when(F.col("b") == -1, F.col("is_a"))
        .when(h % F.col("n") < F.col("na"), F.lit(1))
        .otherwise(F.lit(0))
    )
    dec = "decimal(38,0)"
    agg = (
        rs.select("b", in_a.alias("in_a"), "cents")
        .groupBy("b")
        .agg(
            F.sum(
                F.when(F.col("in_a") == 1, F.col("cents").cast(dec))
            ).alias("sa"),
            F.sum("in_a").cast(dec).alias("ca"),
            F.sum(
                F.when(F.col("in_a") == 0, F.col("cents").cast(dec))
            ).alias("sb"),
            F.sum(1 - F.col("in_a")).cast(dec).alias("cb"),
        )
    )
    diffs = agg.select(
        "b",
        (
            F.col("sa").cast("double") / (100 * F.col("ca")).cast("double")
            - F.col("sb").cast("double") / (100 * F.col("cb")).cast("double")
        ).alias("d"),
    ).localCheckpoint(eager=True)
    obs = diffs.filter(F.col("b") == -1).select(
        F.col("d").alias("obs_d")
    )
    return (
        diffs.crossJoin(F.broadcast(obs))
        .crossJoin(F.broadcast(tot))
        .agg(
            F.max("na").alias("n_a"),
            F.max(F.col("n") - F.col("na")).alias("n_b"),
            F.max(F.when(F.col("b") == -1, F.col("d"))).alias("obs_diff"),
            F.sum(
                F.when(
                    (F.col("b") >= 0)
                    & (F.abs(F.col("d")) >= F.abs(F.col("obs_d"))),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_extreme"),
            (
                (
                    1
                    + F.sum(
                        F.when(
                            (F.col("b") >= 0)
                            & (F.abs(F.col("d")) >= F.abs(F.col("obs_d"))),
                            1,
                        ).otherwise(0)
                    )
                ).cast("double")
                / F.lit(PERM_B + 1)
            ).alias("p_value"),
        )
    )


# ---------------------------------------------------------------------------
# stat7 — Benjamini–Hochberg FDR over per-segment permutation tests
# ---------------------------------------------------------------------------

#: BH target false-discovery rate as an exact rational (1/5 = 0.20):
#: the acceptance comparison stays in integer arithmetic.
FDR_ALPHA_NUM = 1
FDR_ALPHA_DEN = 5

_STAT7_SEGS = (
    "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"
)

_STAT7_R = (
    "("
    + _sql_h60(
        _sql_sd(
            "fdr",
            "s.seg",
            "CAST(o_orderkey AS VARCHAR)",
            "CAST(b AS VARCHAR)",
        )
    )
    + ")"
)

_STAT7_ORACLE = f"""
WITH segs AS (
  SELECT UNNEST([{', '.join(repr(s) for s in _STAT7_SEGS)}]) AS seg
),
j AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
         c_mktsegment AS cseg
  FROM orders JOIN customer ON o_custkey = c_custkey
),
tot AS (SELECT COUNT(*) AS n FROM j),
bal AS (SELECT cseg AS seg, COUNT(*) AS na FROM j GROUP BY cseg),
rs AS (
  SELECT s.seg, b,
         CASE WHEN b = -1 THEN CASE WHEN j.cseg = s.seg THEN 1 ELSE 0 END
              WHEN {_STAT7_R} % n < na THEN 1 ELSE 0 END AS in_a,
         cents
  FROM j
  CROSS JOIN (SELECT UNNEST(range(-1, {PERM_B})) AS b) bb
  CROSS JOIN segs s
  JOIN bal ON bal.seg = s.seg
  CROSS JOIN tot
),
agg AS (
  SELECT seg, b,
         CAST(SUM(CASE WHEN in_a = 1 THEN CAST(cents AS HUGEINT) END)
              AS HUGEINT) AS sa,
         CAST(SUM(in_a) AS HUGEINT) AS ca,
         CAST(SUM(CASE WHEN in_a = 0 THEN CAST(cents AS HUGEINT) END)
              AS HUGEINT) AS sb,
         CAST(SUM(1 - in_a) AS HUGEINT) AS cb
  FROM rs GROUP BY seg, b
),
diffs AS (
  SELECT seg, b,
         CAST(sa AS DOUBLE) / CAST(100 * ca AS DOUBLE)
           - CAST(sb AS DOUBLE) / CAST(100 * cb AS DOUBLE) AS d
  FROM agg
),
per_seg2 AS (
  SELECT seg,
         MAX(CASE WHEN d2.b = -1 THEN d2.d END) AS obs_diff,
         CAST(SUM(CASE WHEN d2.b >= 0 AND ABS(d2.d) >= o.od
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
  FROM diffs d2
  JOIN (SELECT seg, ABS(MAX(CASE WHEN b = -1 THEN d END)) AS od
        FROM diffs GROUP BY seg) o USING (seg)
  GROUP BY seg
),
ranked AS (
  SELECT seg, obs_diff, n_extreme, 1 + n_extreme AS p_num,
         ROW_NUMBER() OVER (ORDER BY 1 + n_extreme, seg) AS bh_rank,
         COUNT(*) OVER () AS m
  FROM per_seg2
),
cut AS (
  SELECT COALESCE(MAX(CASE WHEN p_num * {FDR_ALPHA_DEN} * m
                             <= {PERM_B + 1} * bh_rank * {FDR_ALPHA_NUM}
                      THEN bh_rank END), 0) AS cutoff
  FROM ranked
)
SELECT seg AS segment, obs_diff,
       n_extreme,
       CAST(1 + n_extreme AS DOUBLE) / {PERM_B + 1} AS p_value,
       CAST(bh_rank AS BIGINT) AS bh_rank,
       CAST(CASE WHEN bh_rank <= cutoff THEN 1 ELSE 0 END AS BIGINT)
         AS rejected
FROM ranked CROSS JOIN cut
"""


@register("stat7_bh_fdr", _STAT7_ORACLE)
def stat7_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg false-discovery-rate control over a FAMILY of
    permutation tests: every market segment is tested (segment mean
    order value vs the rest) with stat6's deterministic hash-coin
    relabelings, and BH decides which of the m p-values survive
    multiple-testing correction at FDR alpha = 1/5. This is the missing
    top of the test-family stack (stat2 means, stat3 shapes, stat5
    ranks, stat6 one assumption-free test): real corpus monitoring
    fires MANY hypotheses per run — per-segment, per-language,
    per-source — and uncorrected per-test alphas hallucinate drift at
    scale; BH is the standard correction.

    Exactness: each permutation p-value is an exact rational
    (1 + n_extreme)/(B+1) carried as its integer NUMERATOR; the BH
    acceptance p_(i) <= i*alpha/m is evaluated entirely in integer
    arithmetic (p_num*alpha_den*m <= (B+1)*i*alpha_num) — no float
    enters any comparison. Relabelings are seeded-hash integer coins
    (bit-identical on both engines); each mean gap is a fixed chain of
    two exact-integer IEEE divisions (stat6's EXACT_DOUBLE discipline).

    Scale shape: ONE key-shuffle join builds the (orderkey, cents,
    segment) frame (repartitioned to an explicit AQE-exempt width —
    the stat4 lesson); the m*(B+1)-way fan-out is MAP-SIDE (two nested
    literal explodes) and absorbed by partial aggregation before the
    only exchange, whose world is the m*(B+1)-row grid at any corpus
    size; the 5-row balance table and 1-row total broadcast. BH itself
    runs on the m-row family — window work on a frame the size of the
    hypothesis count, never the data."""
    from pyspark.sql.window import Window

    from bc_proj3_spark.functions.hashing import hash60
    from bc_proj3_spark.operators.sampling import _seeded

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    j = (
        orders.join(
            cust.select("c_custkey", "c_mktsegment"),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("cents"),
            F.col("c_mktsegment").alias("cseg"),
        )
        .repartition(spark.sparkContext.defaultParallelism, "o_orderkey")
    )
    # r11 (guide §1.2): j feeds the total, the balance table and the
    # permutation fan-out — un-cached, the orders⋈customer join ran
    # three times. tot's broadcast build is the first job and fills
    # this cache; bal and the fan-out read (orderkey, cents, cseg)
    # rows. Released by the session's per-query clearCache.
    from pyspark import StorageLevel

    j = j.persist(StorageLevel.MEMORY_AND_DISK)
    tot = j.agg(F.count(F.lit(1)).alias("n"))
    bal = j.groupBy(F.col("cseg").alias("seg")).agg(
        F.count(F.lit(1)).alias("na")
    )
    rs = (
        j.crossJoin(F.broadcast(tot))
        .select(
            "o_orderkey",
            "cents",
            "cseg",
            "n",
            F.explode(
                F.array(*[F.lit(s) for s in _STAT7_SEGS])
            ).alias("seg"),
        )
        .join(F.broadcast(bal), "seg")
        .select(
            "*",
            F.explode(
                F.array(*[F.lit(b) for b in range(-1, PERM_B)])
            ).alias("b"),
        )
    )
    h = hash60(
        _seeded(
            "fdr",
            F.col("seg"),
            F.col("o_orderkey").cast("string"),
            F.col("b").cast("string"),
        )
    )
    in_a = (
        F.when(
            F.col("b") == -1,
            (F.col("cseg") == F.col("seg")).cast("long"),
        )
        .when(h % F.col("n") < F.col("na"), F.lit(1))
        .otherwise(F.lit(0))
    )
    dec = "decimal(38,0)"
    agg = (
        rs.select("seg", "b", in_a.alias("in_a"), "cents")
        .groupBy("seg", "b")
        .agg(
            F.sum(
                F.when(F.col("in_a") == 1, F.col("cents").cast(dec))
            ).alias("sa"),
            F.sum("in_a").cast(dec).alias("ca"),
            F.sum(
                F.when(F.col("in_a") == 0, F.col("cents").cast(dec))
            ).alias("sb"),
            F.sum(1 - F.col("in_a")).cast(dec).alias("cb"),
        )
    )
    diffs = agg.select(
        "seg",
        "b",
        (
            F.col("sa").cast("double") / (100 * F.col("ca")).cast("double")
            - F.col("sb").cast("double") / (100 * F.col("cb")).cast("double")
        ).alias("d"),
    ).localCheckpoint(eager=True)  # feeds the obs lookup and the census
    obs = diffs.filter(F.col("b") == -1).select(
        "seg", F.abs(F.col("d")).alias("od"), F.col("d").alias("obs_d")
    )
    per_seg = (
        diffs.join(F.broadcast(obs), "seg")
        .groupBy("seg")
        .agg(
            F.max("obs_d").alias("obs_diff"),
            F.sum(
                F.when(
                    (F.col("b") >= 0) & (F.abs(F.col("d")) >= F.col("od")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_extreme"),
        )
        .withColumn("p_num", 1 + F.col("n_extreme"))
    )
    w_rank = Window.orderBy("p_num", "seg")
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = per_seg.select(
        "seg",
        "obs_diff",
        "n_extreme",
        "p_num",
        F.row_number().over(w_rank).cast("bigint").alias("bh_rank"),
        F.count(F.lit(1)).over(w_all).alias("m"),
    )
    accepted = F.when(
        F.col("p_num") * FDR_ALPHA_DEN * F.col("m")
        <= (PERM_B + 1) * F.col("bh_rank") * FDR_ALPHA_NUM,
        F.col("bh_rank"),
    )
    cut = ranked.agg(
        F.coalesce(F.max(accepted), F.lit(0)).alias("cutoff")
    )
    return ranked.crossJoin(F.broadcast(cut)).select(
        F.col("seg").alias("segment"),
        "obs_diff",
        "n_extreme",
        (F.col("p_num").cast("double") / F.lit(PERM_B + 1)).alias("p_value"),
        "bh_rank",
        (F.col("bh_rank") <= F.col("cutoff")).cast("bigint").alias(
            "rejected"
        ),
    )


# ---------------------------------------------------------------------------
# a17 — winsorized mean (clamp the tails instead of dropping them)
# ---------------------------------------------------------------------------

#: winsorization level as an exact rational: clamp below the
#: WINS_PCT-th and above the (100-WINS_PCT)-th percentile, both taken
#: as interpolation-free exact-rank order statistics.
WINS_PCT = 5

_A17_ORACLE = f"""
WITH pts AS (
  SELECT c_mktsegment AS segment,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS v
  FROM customer
),
per_v AS (
  SELECT segment, v, COUNT(*) AS c FROM pts GROUP BY segment, v
),
cum AS (
  SELECT segment, v, c,
         SUM(c) OVER (PARTITION BY segment ORDER BY v) AS cw,
         SUM(c) OVER (PARTITION BY segment) AS n
  FROM per_v
),
bounds AS (
  SELECT segment,
         CAST(MAX(n) AS BIGINT) AS n,
         MIN(CASE WHEN 100 * cw >= {WINS_PCT} * n THEN v END) AS lo,
         MIN(CASE WHEN 100 * cw >= {100 - WINS_PCT} * n THEN v END) AS hi
  FROM cum GROUP BY segment
),
clamped AS (
  SELECT p.segment, b.n, b.lo, b.hi,
         CAST(SUM(CAST(LEAST(GREATEST(p.v, b.lo), b.hi) AS HUGEINT))
              AS HUGEINT) AS s
  FROM pts p JOIN bounds b ON b.segment = p.segment
  GROUP BY p.segment, b.n, b.lo, b.hi
)
SELECT segment, n, lo AS lo_cents, hi AS hi_cents,
       CAST(s AS DOUBLE) / CAST(100 * n AS DOUBLE) AS winsorized_mean
FROM clamped
"""


@register("a17_winsorized_mean", _A17_ORACLE)
def a17_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{P}%-winsorized mean account balance per segment: the tails are
    CLAMPED to the P5/P95 order statistics rather than dropped (a7's
    trimmed mean discards them) — the robust-location estimator that
    keeps n constant, which matters when downstream consumers divide
    by cohort size; the trimmed/winsorized pair is the standard
    robust-mean portfolio and their gap is itself a tail-weight
    signal.

    Exactness: balances are exact integer cents; both cut points are
    interpolation-free exact-rank selections (100·cum >= p·n on
    integers — no percentile() interpolation, the cur1 lesson); the
    clamped sum is exact integer; the mean is ONE IEEE division of two
    exact integers (EXACT_DOUBLE class).

    Scale shape: a13's collapse discipline — the fact rows reduce to
    the (segment × distinct-cents) count table before any window; the
    cumulative rank runs per segment over that bounded domain; the
    5-row bounds frame broadcast-joins back; one combiner-absorbed
    clamped aggregate ends it."""
    from pyspark.sql.window import Window

    cust = table(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("v"),
    )
    per_v = pts.groupBy("segment", "v").agg(F.count(F.lit(1)).alias("c"))
    w_cum = (
        Window.partitionBy("segment")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("segment")
    cum = per_v.select(
        "segment",
        "v",
        F.sum("c").over(w_cum).alias("cw"),
        F.sum("c").over(w_all).alias("n"),
    )
    bounds = cum.groupBy("segment").agg(
        F.max("n").cast("bigint").alias("n"),
        F.min(
            F.when(100 * F.col("cw") >= WINS_PCT * F.col("n"), F.col("v"))
        ).alias("lo"),
        F.min(
            F.when(
                100 * F.col("cw") >= (100 - WINS_PCT) * F.col("n"),
                F.col("v"),
            )
        ).alias("hi"),
    )
    dec = "decimal(38,0)"
    clamped = (
        pts.join(F.broadcast(bounds), "segment")
        .groupBy("segment", "n", "lo", "hi")
        .agg(
            F.sum(
                F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))
                .cast(dec)
            ).alias("s")
        )
    )
    return clamped.select(
        "segment",
        "n",
        F.col("lo").alias("lo_cents"),
        F.col("hi").alias("hi_cents"),
        (
            F.col("s").cast("double") / (100 * F.col("n")).cast("double")
        ).alias("winsorized_mean"),
    )


# ---------------------------------------------------------------------------
# a18 — Theil inequality decomposition (within + between segments)
# ---------------------------------------------------------------------------

_A18_ORACLE = """
WITH spend AS (
  SELECT c_mktsegment AS seg, o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS v
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY seg, o_custkey
),
pv AS (SELECT seg, v, COUNT(*) AS cnt FROM spend GROUP BY seg, v),
lt AS (
  SELECT seg, v, cnt,
         CAST(ROUND(LN(CAST(v AS DOUBLE)), 9) AS DECIMAL(13,9)) AS lnv
  FROM pv
),
seg AS (
  SELECT seg,
         CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(v * cnt) AS BIGINT) AS s,
         SUM(CAST(v * cnt AS DECIMAL(20,0)) * lnv) AS l
  FROM lt GROUP BY seg
),
segm AS (
  SELECT seg, n, s, l,
         CAST(s AS DOUBLE) / n AS mean_cents
  FROM seg
),
segl AS (
  SELECT *, CAST(ROUND(LN(mean_cents), 9) AS DECIMAL(13,9)) AS lnmean
  FROM segm
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_t, CAST(SUM(s) AS BIGINT) AS s_t,
         SUM(l) AS l_t
  FROM seg
),
totm AS (
  SELECT n_t, s_t, l_t, CAST(s_t AS DOUBLE) / n_t AS mean_t FROM tot
),
totl AS (
  SELECT *, CAST(ROUND(LN(mean_t), 9) AS DECIMAL(13,9)) AS lnmean_t
  FROM totm
),
btw AS (
  SELECT CAST(SUM(CAST(g.s AS DECIMAL(20,0)) * (g.lnmean - t.lnmean_t))
              AS DOUBLE) / MAX(CAST(t.s_t AS DOUBLE)) AS theil_between
  FROM segl g CROSS JOIN totl t
),
ttot AS (
  SELECT CAST(t.l_t - CAST(t.s_t AS DECIMAL(20,0)) * t.lnmean_t AS DOUBLE)
           / (CAST(t.n_t AS DOUBLE) * t.mean_t) AS theil_total
  FROM totl t
)
SELECT g.seg AS c_mktsegment,
       g.n AS n_customers,
       CAST(g.s AS DOUBLE) / CAST(t.s_t AS DOUBLE) AS spend_share,
       CAST(g.l - CAST(g.s AS DECIMAL(20,0)) * g.lnmean AS DOUBLE)
         / (CAST(g.n AS DOUBLE) * g.mean_cents) AS theil_within,
       (SELECT theil_between FROM btw) AS theil_between,
       (SELECT theil_total FROM ttot) AS theil_total
FROM segl g CROSS JOIN totl t
"""


@register("a18_theil_decomposition", _A18_ORACLE)
def a18_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality decomposition of per-customer lifetime spend:
    per segment its population, spend share and WITHIN-segment Theil
    index, plus the BETWEEN-segment component and the pooled total on
    every row. Theil is the inequality measure a16's Gini cannot
    replace precisely because it decomposes additively — total =
    Σ share_g·T_g + T_between — so it answers "is spend concentration
    a property of segments or of customers WITHIN segments?", the
    question that decides whether assortment/pricing interventions
    target segments or individuals. (The identity holds exactly in
    real arithmetic; the 9-dp log lattice perturbs it below 1e-6 —
    pinned in tests.)

    Exactness: spend collapses to the distinct-cents table (a13/a16
    discipline); each distinct value contributes cnt·v·ROUND(LN(v),9)
    with the log on the t21 lattice and the product carried in exact
    DECIMAL — sums are order-free on both engines. Means are single
    IEEE divisions of exact integers; each Theil value is ONE fixed
    expression over those identical operands. The between-component
    sums 9-dp lattice DIFFERENCES in decimal (never a float sum over
    segments). In the standing sf0.1 strict gate (log-lattice class).

    Scale shape: identical to a16's head — one map-side-combinable
    per-customer roll-up sharing its shuffle with the customer join,
    collapsed to (seg, distinct-cents) counts; everything after is
    bounded by distinct spend values, and the 5-row segment table
    broadcasts. No window, no sort, no collect."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    spend = (
        orders.join(
            cust.select("c_custkey", "c_mktsegment"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            ).alias("v")
        )
    )
    lnv = F.round(F.log(F.col("v").cast("double")), 9).cast("decimal(13,9)")
    lt = spend.groupBy("seg", "v").agg(F.count(F.lit(1)).alias("cnt"))
    seg = lt.groupBy("seg").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.col("v") * F.col("cnt")).cast("bigint").alias("s"),
        F.sum(
            (F.col("v") * F.col("cnt")).cast("decimal(20,0)") * lnv
        ).alias("l"),
    )
    segl = seg.select(
        "seg", "n", "s", "l",
        (F.col("s").cast("double") / F.col("n")).alias("mean_cents"),
    ).withColumn(
        "lnmean",
        F.round(F.log(F.col("mean_cents")), 9).cast("decimal(13,9)"),
    ).localCheckpoint(eager=True)
    totl = (
        segl.agg(
            F.sum("n").cast("bigint").alias("n_t"),
            F.sum("s").cast("bigint").alias("s_t"),
            F.sum("l").alias("l_t"),
        )
        .select(
            "n_t", "s_t", "l_t",
            (F.col("s_t").cast("double") / F.col("n_t")).alias("mean_t"),
        )
        .withColumn(
            "lnmean_t",
            F.round(F.log(F.col("mean_t")), 9).cast("decimal(13,9)"),
        )
    )
    j = segl.crossJoin(F.broadcast(totl))
    btw = j.agg(
        (
            F.sum(
                F.col("s").cast("decimal(20,0)")
                * (F.col("lnmean") - F.col("lnmean_t"))
            ).cast("double")
            / F.max(F.col("s_t").cast("double"))
        ).alias("theil_between")
    )
    return (
        j.crossJoin(F.broadcast(btw))
        .select(
            F.col("seg").alias("c_mktsegment"),
            F.col("n").alias("n_customers"),
            (F.col("s").cast("double") / F.col("s_t").cast("double")).alias(
                "spend_share"
            ),
            (
                (
                    F.col("l")
                    - F.col("s").cast("decimal(20,0)") * F.col("lnmean")
                ).cast("double")
                / (F.col("n").cast("double") * F.col("mean_cents"))
            ).alias("theil_within"),
            "theil_between",
            (
                (
                    F.col("l_t")
                    - F.col("s_t").cast("decimal(20,0)")
                    * F.col("lnmean_t")
                ).cast("double")
                / (F.col("n_t").cast("double") * F.col("mean_t"))
            ).alias("theil_total"),
        )
    )


# ---------------------------------------------------------------------------
# a19 — Herfindahl–Hirschman concentration per segment
# ---------------------------------------------------------------------------

_A19_ORACLE = """
WITH spend AS (
  SELECT c_mktsegment AS seg, o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS v
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY seg, o_custkey
),
agg AS (
  SELECT seg,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         SUM(CAST(v AS HUGEINT)) AS t,
         SUM(CAST(v AS HUGEINT) * v) AS s2,
         CAST(MAX(v) AS BIGINT) AS vmax
  FROM spend GROUP BY seg
)
SELECT seg AS c_mktsegment,
       n_customers,
       CAST(t AS DOUBLE) / 100 AS total_spend,
       CAST(s2 AS DOUBLE)
         / (CAST(t AS DOUBLE) * CAST(t AS DOUBLE)) AS hhi,
       (CAST(t AS DOUBLE) * CAST(t AS DOUBLE)) / CAST(s2 AS DOUBLE)
         AS effective_n,
       CAST(vmax AS DOUBLE) / CAST(t AS DOUBLE) AS top_share
FROM agg
"""


@register("a19_hhi_concentration", _A19_ORACLE)
def a19_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of per-customer lifetime
    spend within each market segment, with the effective participant
    count 1/HHI and the single largest share. Completes the
    concentration portfolio — a16's Gini/top-decile reads dispersion,
    a18's Theil decomposes it, HHI is the antitrust-style "how many
    effective players" number — and the corpus-curation twin is source
    concentration: a mixture whose effective_n collapses toward 1 is a
    single-source corpus regardless of its nominal source list.

    Exactness: per-customer spend is an exact BIGINT cents sum; Σv and
    Σv² are exact DECIMAL(38,0) sums; hhi = Σv²/(Σv)², effective_n =
    its reciprocal, and top_share = max(v)/Σv are fixed chains of IEEE
    operations on engine-identical integer→double images (the g3
    >2^53-conversion class, pinned at sf0.1).

    Scale shape: orders collapses map-side-combinably to per-customer
    totals (one key shuffle shared with the customer join), then ONE
    combiner-absorbed aggregate per segment — no window, no sort; the
    output is segment-bounded at any corpus size."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    spend = (
        orders.join(
            cust.select("c_custkey", "c_mktsegment"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            ).alias("v")
        )
    )
    agg = spend.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("t"),
        F.sum(F.col("v").cast("decimal(19,0)") * F.col("v")).alias("s2"),
        F.max("v").cast("bigint").alias("vmax"),
    )
    t_d = F.col("t").cast("double")
    s2_d = F.col("s2").cast("double")
    return agg.select(
        F.col("seg").alias("c_mktsegment"),
        "n_customers",
        (t_d / 100).alias("total_spend"),
        (s2_d / (t_d * t_d)).alias("hhi"),
        ((t_d * t_d) / s2_d).alias("effective_n"),
        (F.col("vmax").cast("double") / t_d).alias("top_share"),
    )
