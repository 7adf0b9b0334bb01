"""The SQL entry path: raw Spark SQL over registered views.

The reference drives almost everything through ``spark.sql`` over temp
views (bronze_arxiv.py:74-89, silver_arxiv.py:82-97…); this engine is
DataFrame-first, but the SQL surface must work identically — same
Catalyst plans either way. One registered query runs PURE SQL text over
catalog-registered views to pin that path (SURVEY.md §2.1 S6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bc_proj3_spark.functions.numeric import sql_dec_sum
from bc_proj3_spark.plans.tables import table
from bc_proj3_spark.registry import register

#: Dialect-common SQL: the SAME statement text runs on Spark (over the
#: temp view) and on DuckDB (over the driver's view) modulo table name.
_SQL = f"""
SELECT
  o_orderpriority,
  COUNT(*) AS n_orders,
  {sql_dec_sum("o_totalprice", "total_price")}
FROM orders_v
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY o_orderpriority
"""

_SQL1_ORACLE = _SQL.replace("orders_v", "orders")


@register("sql1_priority_revenue", _SQL1_ORACLE)
def sql1_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw SQL text over a registered temp view — the notebook-style
    entry path (spark.sql + createOrReplaceTempView). Shares one source
    of truth with its oracle: identical SQL, different catalog."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(_SQL)


# ---------------------------------------------------------------------------
# sql2 — CTE + window + join through the raw SQL interface
# ---------------------------------------------------------------------------

_SQL2 = """
WITH cust_orders AS (
  SELECT o_custkey,
         o_orderkey,
         CAST(o_totalprice AS DECIMAL(28,10)) AS price_d
  FROM {orders}
),
ranked AS (
  SELECT o_custkey,
         o_orderkey,
         CAST(price_d AS DOUBLE) AS o_totalprice,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY price_d DESC, o_orderkey
         ) AS INTEGER) AS rk,
         CAST(SUM(price_d) OVER (PARTITION BY o_custkey) AS DOUBLE)
           AS cust_total
  FROM cust_orders
)
SELECT r.o_custkey, r.o_orderkey, r.o_totalprice, r.cust_total, c.c_name
FROM ranked r
JOIN {customer} c ON r.o_custkey = c.c_custkey
WHERE r.rk = 1
"""


@register(
    "sql2_top_order_per_customer",
    _SQL2.format(orders="orders", customer="customer"),
)
def sql2_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-string interface exercised past sql1's flat aggregate:
    chained CTEs, a rank window AND a partition-total window over the
    same exchange, and a join back to a dimension — one SQL text shared
    verbatim with the oracle (only the catalog names differ). Window
    ordering is total (price desc, orderkey) and money flows through
    decimal so both engines pick identical rows with identical sums."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v2")
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v2")
    return spark.sql(_SQL2.format(orders="orders_v2", customer="customer_v2"))


# ---------------------------------------------------------------------------
# sql3 — correlated EXISTS / NOT EXISTS through the raw SQL interface
# ---------------------------------------------------------------------------

_SQL3 = """
SELECT c.c_custkey, c.c_mktsegment,
       CAST(c.c_acctbal AS DOUBLE) AS c_acctbal
FROM {customer} c
WHERE EXISTS (
  SELECT 1 FROM {orders} o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_totalprice > 100000
)
AND NOT EXISTS (
  SELECT 1 FROM {orders} o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderpriority = '1-URGENT'
)
"""


@register(
    "sql3_exists_decorrelation",
    _SQL3.format(customer="customer", orders="orders"),
)
def sql3_exists_decorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS in one raw SQL statement —
    customers with at least one big order and no urgent ones. The SQL
    text is shared verbatim with the DuckDB oracle (only catalog names
    differ), and Catalyst must DECORRELATE both subqueries into a
    left-semi and a left-anti hash join on o_custkey — never a per-row
    subquery execution. (q4/q21 pin the same shapes through the
    DataFrame API; this pins the SQL parser path.)"""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(_SQL3.format(customer="customer_v", orders="orders_v"))


# ---------------------------------------------------------------------------
# sql4 — LATERAL correlated subquery with LIMIT (top-k per row)
# ---------------------------------------------------------------------------

#: Identical statement text for both engines modulo catalog names —
#: ANSI LATERAL is the one syntax for "top-k related rows per outer
#: row" that needs no window-function rewrite from the user.
_SQL4 = """
SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
FROM {customer} c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM {orders} o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
"""


@register(
    "sql4_lateral_topk",
    _SQL4.format(customer="customer", orders="orders"),
)
def sql4_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT: each
    customer's two largest orders, written the way a SQL user writes it
    (a dependent subquery per outer row). The naive reading is an
    O(customers × orders) nested loop; Catalyst DECORRELATES it into a
    ranked group-limit — the physical plan is one equi-join feeding
    ``WindowGroupLimit`` (partial before the shuffle, final after), so
    per-group top-k costs one key exchange with map-side pruning and no
    per-row re-scan. The unique-key tiebreak makes the selected rows
    deterministic for the value hash. DuckDB runs the IDENTICAL
    statement text over its own views — one source of truth, two
    catalogs, two optimizers, same rows."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v4")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v4")
    return spark.sql(_SQL4.format(customer="customer_v4", orders="orders_v4"))


# ---------------------------------------------------------------------------
# sql5 — WITH RECURSIVE date spine (native recursive CTE execution)
# ---------------------------------------------------------------------------

#: Identical statement text on both engines. Spark 4 executes WITH
#: RECURSIVE natively (UnionLoop iterations under the hood); DuckDB has
#: its own recursive-CTE executor — two independent recursion engines,
#: one statement, same rows.
_SQL5 = """
WITH RECURSIVE days(d) AS (
  SELECT DATE '1995-01-01'
  UNION ALL
  SELECT d + INTERVAL '1' DAY FROM days WHERE d < DATE '1995-03-31'
)
SELECT
  d AS order_day,
  COUNT(o.o_orderkey) AS n_orders,
  ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS revenue
FROM days LEFT JOIN {orders} o ON CAST(o.o_orderdate AS DATE) = d
GROUP BY d
"""


@register("sql5_recursive_spine", _SQL5.format(orders="orders"))
def sql5_recursive_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``WITH RECURSIVE`` date spine (90 daily rows built by the
    engine's own recursion, not a pre-materialized calendar) LEFT-joined
    to orders so zero-order days still appear — the gap-preserving daily
    rollup written the way a SQL user writes it. Complements ts1, which
    builds the same spine with ``sequence()`` + explode: two idioms, one
    semantic, both gap-faithful. Recursion depth (90) sits well under
    Spark's cteRecursionLevelLimit (100 by default); at 100 TB the spine
    side is O(days) rows and broadcast, so the join adds no shuffle
    beyond the date-group aggregate. Revenue rounds at 2 (exact cents)
    per the repo's cross-engine float convention."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v5")
    return spark.sql(_SQL5.format(orders="orders_v5"))


# ---------------------------------------------------------------------------
# sql6 — null-aware NOT IN (the ANSI three-valued-logic trap)
# ---------------------------------------------------------------------------

#: Identical statement text on both engines. A NULL in the NOT IN list
#: makes the predicate UNKNOWN for every row — the classic silent-empty
#: result. Both engines must agree on both branches.
_SQL6 = """
SELECT
  (SELECT COUNT(*) FROM {customer}
   WHERE c_nationkey NOT IN (SELECT nullif(n_nationkey, 3) FROM {nation}))
    AS n_with_null_list,
  (SELECT COUNT(*) FROM {customer}
   WHERE c_nationkey NOT IN (SELECT nullif(n_nationkey, 3) FROM {nation}
                             WHERE nullif(n_nationkey, 3) IS NOT NULL))
    AS n_null_filtered_list
"""


@register(
    "sql6_null_aware_notin",
    _SQL6.format(customer="customer", nation="nation"),
)
def sql6_null_aware_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN against a subquery CONTAINING a NULL is the ANSI
    three-valued-logic trap: the predicate is never TRUE, so the first
    count must be 0 — a plain anti-join rewrite would get this wrong,
    which is why Spark plans a null-aware anti join for it. The second
    branch filters the NULL out and must count exactly the nation-3
    customers. Registering both branches side by side pins that the
    engine's NOT-IN → anti-join rewrite (SURVEY §2 P7) stays
    null-AWARE, and that both engines agree on the semantics from the
    same statement text. The nation list is dimension-sized, so the
    null-aware join broadcasts it — the only safe shape for null-aware
    anti at scale (it cannot shuffle-partition, a Spark planning
    constraint worth pinning here)."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v6")
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation_v6")
    return spark.sql(_SQL6.format(customer="customer_v6", nation="nation_v6"))


# ---------------------------------------------------------------------------
# sql7 — correlated scalar subqueries in the SELECT list
# ---------------------------------------------------------------------------

_SQL7 = """
SELECT c.c_custkey, c.c_name,
       (SELECT COUNT(*) FROM {orders} o WHERE o.o_custkey = c.c_custkey)
         AS n_orders,
       (SELECT MAX(o_totalprice) FROM {orders} o
        WHERE o.o_custkey = c.c_custkey) AS max_order
FROM {customer} c
WHERE c.c_mktsegment = 'MACHINERY'
"""


@register(
    "sql7_scalar_subqueries",
    _SQL7.format(customer="customer", orders="orders"),
)
def sql7_scalar_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated SCALAR subqueries in the projection — the way a SQL
    user asks "each customer, with their order count and largest
    order" without writing a join. The naive reading re-runs an
    aggregate per outer row; Catalyst decorrelates each subquery into
    ONE grouped aggregate left-joined on the correlation key, so the
    cost is two key-shuffled aggregates however many customers there
    are — and customers with no orders surface NULL max / 0 count
    exactly as the ANSI scalar-subquery contract requires (a plain
    inner-join rewrite silently drops them; the segment filter still
    pushes to the customer scan). Same statement text on both
    engines."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v7")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v7")
    return spark.sql(_SQL7.format(customer="customer_v7", orders="orders_v7"))
