"""Count-min sketch over the documents token stream.

The fixed-width frequency sketch a 100 TB corpus pipeline uses where
exact per-token counts don't fit: a D×W counter matrix where every
token occurrence increments one cell per hash row, and a token's
estimate is the MIN over its D cells (always an over-estimate, never
under). Spark's built-in approx aggregates (HLL, approx quantiles) use
engine-private sketches that no oracle can replay; this CMS is built
from the shared seeded md5 family (functions/hashing.py), so DuckDB
computes the IDENTICAL sketch and the driver's value-hash gate applies
to an approximate-counting operator — the sketch is exact about its
own construction even though its estimates are approximate.

Scale shape: one explode over tokens fans out to D cells per
occurrence, then ONE groupBy over (row, col) — at most D×W = 1024
output rows however big the corpus, so partial aggregation absorbs
nearly everything map-side; the sketch is also trivially mergeable
across corpus shards (cell-wise sum), which is what makes it a
streaming/distributed counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bc_proj3_spark.functions.hashing import hash32, sql_hash32
from bc_proj3_spark.plans.tables import fanout, table
from bc_proj3_spark.registry import register

CMS_DEPTH = 4  # hash rows (independent seeds)
CMS_WIDTH = 256  # counters per row
TOP_K = 20  # sk2 verifies estimates for the top-K exact tokens

_SQL_TOK = """
tok AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
  FROM documents
)
"""

_SQL_CELLS = f"""
cells AS (
  {' UNION ALL '.join(f"SELECT {i} AS row_id, {sql_hash32('t', seed=i)} % {CMS_WIDTH} AS col_id FROM tok" for i in range(CMS_DEPTH))}
),
sketch AS (
  SELECT row_id, col_id, COUNT(*) AS cnt
  FROM cells GROUP BY row_id, col_id
)
"""

_SK1_ORACLE = f"""
WITH {_SQL_TOK},
{_SQL_CELLS}
SELECT CAST(row_id AS INTEGER) AS row_id,
       CAST(col_id AS BIGINT) AS col_id,
       CAST(cnt AS BIGINT) AS cnt
FROM sketch
"""


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fanout(table(spark, sf_dir, "documents"))
    return docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("t")
    )


def _cells(tok: DataFrame) -> DataFrame:
    """(row_id, col_id) per token occurrence per hash row — the same
    explode-a-literal-array shape as the LSH band table."""
    rows = [
        F.struct(
            F.lit(i).alias("row_id"),
            (hash32(F.col("t"), seed=i) % CMS_WIDTH).alias("col_id"),
        )
        for i in range(CMS_DEPTH)
    ]
    return tok.select(F.explode(F.array(*rows)).alias("c")).select(
        "c.row_id", "c.col_id"
    )


@register("sk1_countmin_sketch", _SK1_ORACLE)
def sk1_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch itself: D×W cell counts over every token occurrence.
    Output is bounded at D×W rows regardless of corpus size — the
    definition of a scalable aggregate."""
    return (
        _cells(_tokens(spark, sf_dir))
        .groupBy(
            F.col("row_id").cast("int").alias("row_id"),
            F.col("col_id").cast("bigint").alias("col_id"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


_SK2_ORACLE = f"""
WITH {_SQL_TOK},
{_SQL_CELLS},
exact AS (
  SELECT t AS token, COUNT(*) AS exact_cnt
  FROM tok GROUP BY t
  ORDER BY exact_cnt DESC, token
  LIMIT {TOP_K}
),
probes AS (
  {' UNION ALL '.join(f"SELECT token, exact_cnt, {i} AS row_id, {sql_hash32('token', seed=i)} % {CMS_WIDTH} AS col_id FROM exact" for i in range(CMS_DEPTH))}
)
SELECT token,
       CAST(MAX(exact_cnt) AS BIGINT) AS exact_cnt,
       CAST(MIN(s.cnt) AS BIGINT) AS cms_est
FROM probes p
JOIN sketch s ON s.row_id = p.row_id AND s.col_id = p.col_id
GROUP BY token
"""


@register("sk2_cms_estimate", _SK2_ORACLE)
def sk2_cms_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point queries against the sketch: for the top-{TOP_K} exact
    tokens (total order: count desc, token — both engines pick the same
    set), the CMS estimate is the MIN over that token's D cells. The
    one-sided error guarantee (est >= exact, over-count only from
    collisions) is pinned by a test. Probe-side is {TOP_K}×D rows
    joined against a <= D×W-row sketch — both tiny; the only
    corpus-sized work is the sketch build."""
    from pyspark import StorageLevel

    tok = _tokens(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    tok.count()  # one tokenization feeds both the sketch and exact counts
    sketch = (
        _cells(tok)
        .groupBy("row_id", "col_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = (
        tok.groupBy(F.col("t").alias("token"))
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("token"))
        .limit(TOP_K)
    )
    probe_rows = [
        F.struct(
            F.lit(i).alias("row_id"),
            (hash32(F.col("token"), seed=i) % CMS_WIDTH).alias("col_id"),
        )
        for i in range(CMS_DEPTH)
    ]
    probes = exact.select(
        "token", "exact_cnt", F.explode(F.array(*probe_rows)).alias("p")
    ).select("token", "exact_cnt", "p.row_id", "p.col_id")
    out = (
        probes.join(sketch, ["row_id", "col_id"])
        .groupBy("token")
        .agg(
            F.max("exact_cnt").cast("bigint").alias("exact_cnt"),
            F.min("cnt").cast("bigint").alias("cms_est"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    out.count()
    tok.unpersist()
    return out
