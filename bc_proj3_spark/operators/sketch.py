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


# ---------------------------------------------------------------------------
# sk3/sk4 — deterministic HyperLogLog (distinct users per event type)
# ---------------------------------------------------------------------------
#
# Spark's approx_count_distinct is an engine-private HLL++ no oracle can
# replay; this is a from-scratch HLL over the shared md5 hash family so
# DuckDB builds the IDENTICAL register file and the value-hash gate
# covers a cardinality sketch. 60-bit hash -> low HLL_P bits pick the
# register, the remaining W_BITS form the pattern word; rho = leading
# zeros in the word + 1, computed as 52 - length(bin(w)) (both engines'
# bin() prints without leading zeros). The register file is the
# fixed-width mergeable state (max per cell): m rows per group however
# many rows feed it — the same scale shape as the CMS.

HLL_P = 9
HLL_M = 1 << HLL_P  # 512 registers
HLL_W_BITS = 60 - HLL_P  # 51-bit pattern word
#: alpha_m * m^2 * 2^51, precomputed in Python (IEEE double) and
#: embedded as the same literal in both engines.
HLL_ALPHA_NUM = 0.7213 / (1 + 1.079 / HLL_M) * HLL_M * HLL_M * float(1 << HLL_W_BITS)

_SQL_HLL_REGS = f"""
hashes AS (
  SELECT event_type,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM events
),
regs AS (
  SELECT event_type,
         CAST(h & {HLL_M - 1} AS BIGINT) AS register_id,
         MAX(CASE WHEN (h >> {HLL_P}) = 0 THEN {HLL_W_BITS + 1}
                  ELSE {HLL_W_BITS + 1} - length(bin(h >> {HLL_P})) END) AS max_rho
  FROM hashes
  GROUP BY event_type, h & {HLL_M - 1}
)
"""

_SK3_ORACLE = f"""
WITH {_SQL_HLL_REGS}
SELECT event_type, register_id, CAST(max_rho AS INTEGER) AS max_rho
FROM regs
"""


def _hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hll_registers_for(table(spark, sf_dir, "events"))


def hll_registers_for(ev: DataFrame) -> DataFrame:
    """Register file for any frame with (event_type, user_id) — the
    mergeable unit: register files of disjoint shards combine by
    cell-wise MAX into the whole's register file (pinned by test)."""
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h")
    )
    w = F.shiftright(F.col("h"), HLL_P)
    rho = F.when(w == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.bin(w))
    )
    return (
        ev.select("event_type", h)
        .groupBy(
            "event_type",
            (F.col("h") % F.lit(HLL_M)).cast("bigint").alias("register_id"),
        )
        .agg(F.max(rho).cast("int").alias("max_rho"))
    )


@register("sk3_hll_registers", _SK3_ORACLE)
def sk3_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL register file per event_type: at most HLL_M rows per
    group regardless of input size, built by one map-side-combinable
    max-groupBy; mergeable across shards/streams by cell-wise MAX."""
    return _hll_registers(spark, sf_dir)


_SK4_ORACLE = f"""
WITH {_SQL_HLL_REGS},
folded AS (
  SELECT event_type,
         COUNT(*) AS n_present,
         SUM(1::BIGINT << ({HLL_W_BITS + 1} - max_rho)) AS s_present
  FROM regs GROUP BY event_type
),
est AS (
  SELECT event_type,
         {HLL_M} - n_present AS v_zero,
         {HLL_ALPHA_NUM!r} / CAST(
           s_present + ({HLL_M} - n_present) * (1::BIGINT << {HLL_W_BITS})
           AS DOUBLE) AS raw_est
  FROM folded
),
ex AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct FROM events
  GROUP BY event_type
)
SELECT e.event_type,
       CAST(x.exact_distinct AS BIGINT) AS exact_distinct,
       CASE WHEN e.raw_est <= {2.5 * HLL_M!r} AND e.v_zero > 0
            THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / e.v_zero)
            ELSE e.raw_est END AS hll_est
FROM est e JOIN ex x USING (event_type)
"""


@register("sk4_hll_estimate", _SK4_ORACLE)
def sk4_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality estimates from the register file, with the standard
    small-range (linear-counting) correction, next to the exact
    distinct count. Absent registers contribute 2^0 to the harmonic
    sum; the sum is accumulated as exact scaled INTEGERS
    (2^(52 - rho), max 512 * 2^51 < 2^63) so both engines hit the one
    double division with bit-identical operands. Large-range correction
    is omitted: the pattern word is 51 bits, so hash saturation is
    unreachable at any realistic cardinality."""
    regs = _hll_registers(spark, sf_dir)
    folded = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_W_BITS + 1} - max_rho)")
        ).alias("s_present"),
    )
    v_zero = F.lit(HLL_M) - F.col("n_present")
    s_total = F.col("s_present") + v_zero.cast("bigint") * F.lit(1 << HLL_W_BITS)
    raw = F.lit(HLL_ALPHA_NUM) / s_total.cast("double")
    est = folded.select(
        "event_type",
        F.when(
            (raw <= F.lit(2.5 * HLL_M)) & (v_zero > 0),
            F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v_zero),
        )
        .otherwise(raw)
        .alias("hll_est"),
    )
    exact = (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct(F.col("user_id")).cast("bigint").alias("exact_distinct"))
    )
    return est.join(exact, "event_type").select(
        "event_type", "exact_distinct", "hll_est"
    )


# ---------------------------------------------------------------------------
# sk5/sk6 — Bloom filter: build + membership probe (set-membership sketch)
# ---------------------------------------------------------------------------

BLOOM_BITS = 4096  # M
BLOOM_HASHES = 4  # K
_BLOOM_EVAL_MOD = 50  # doc_id % 50 == 0 plays the probe set (as d7)

_SQL_FP = """
fps AS (
  SELECT doc_id, md5(text) AS fp FROM documents
)
"""


def _sql_bloom_bits(src_filter: str) -> str:
    union = " UNION ALL ".join(
        f"SELECT {sql_hash32('fp', seed=100 + i)} % {BLOOM_BITS} AS bit_pos "
        f"FROM fps WHERE {src_filter}"
        for i in range(BLOOM_HASHES)
    )
    return f"bits AS (SELECT DISTINCT bit_pos FROM ({union}) u)"


_SK5_ORACLE = f"""
WITH {_SQL_FP},
{_sql_bloom_bits(f'doc_id % {_BLOOM_EVAL_MOD} <> 0')}
SELECT CAST(bit_pos AS BIGINT) AS bit_pos FROM bits
"""


def _fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fanout(table(spark, sf_dir, "documents"))
    return docs.select("doc_id", F.md5(F.col("text")).alias("fp"))


def _bloom_bits(fps: DataFrame) -> DataFrame:
    hashes = [
        (hash32(F.col("fp"), seed=100 + i) % BLOOM_BITS).alias("b")
        for i in range(BLOOM_HASHES)
    ]
    return (
        fps.select(F.explode(F.array(*hashes)).alias("bit_pos"))
        .distinct()
    )


@register("sk5_bloom_bits", _SK5_ORACLE)
def sk5_bloom_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom filter itself: the set bit positions (M=4096, K=4,
    seeded md5 family) for the TRAINING-side document fingerprints —
    built as explode → distinct, output bounded at M rows regardless of
    corpus size, mergeable across shards by union. DuckDB builds the
    identical filter, so the value gate covers a probabilistic
    set-membership structure exactly (same strategy as CMS/HLL: exact
    about its construction, approximate only in its answers)."""
    fps = _fps(spark, sf_dir).filter(
        F.col("doc_id") % _BLOOM_EVAL_MOD != 0
    )
    return _bloom_bits(fps)


_SK6_ORACLE = f"""
WITH {_SQL_FP},
{_sql_bloom_bits(f'doc_id % {_BLOOM_EVAL_MOD} <> 0')},
probes AS (
  {' UNION ALL '.join(f"SELECT doc_id, {sql_hash32('fp', seed=100 + i)} % {BLOOM_BITS} AS bit_pos FROM fps WHERE doc_id % {_BLOOM_EVAL_MOD} = 0" for i in range(BLOOM_HASHES))}
)
SELECT p.doc_id,
       CAST(MIN(CASE WHEN b.bit_pos IS NOT NULL THEN 1 ELSE 0 END) AS BOOLEAN)
         AS maybe_in_corpus
FROM probes p LEFT JOIN bits b ON p.bit_pos = b.bit_pos
GROUP BY p.doc_id
"""


@register("sk6_bloom_membership", _SK6_ORACLE)
def sk6_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership probe: each held-out doc tests its K bit positions
    against the corpus filter — maybe-present only if ALL are set (the
    Bloom contract: no false negatives, bounded false positives). The
    filter side is at most M rows → broadcast; the probe is then
    map-side per doc. This is the cheap pre-screen in front of d7's
    exact decontamination join: at 100 TB you Bloom-probe first and
    run the exact n-gram join only on maybe-hits."""
    fps = _fps(spark, sf_dir)
    bits = _bloom_bits(
        fps.filter(F.col("doc_id") % _BLOOM_EVAL_MOD != 0)
    ).withColumn("hit", F.lit(1))
    probes = fps.filter(F.col("doc_id") % _BLOOM_EVAL_MOD == 0).select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    (hash32(F.col("fp"), seed=100 + i) % BLOOM_BITS).alias("b")
                    for i in range(BLOOM_HASHES)
                ]
            )
        ).alias("bit_pos"),
    )
    return (
        probes.join(F.broadcast(bits), "bit_pos", "left")
        .groupBy("doc_id")
        .agg(
            (F.min(F.coalesce(F.col("hit"), F.lit(0))) == 1).alias(
                "maybe_in_corpus"
            )
        )
    )


# ---------------------------------------------------------------------------
# bf1 — Bloom runtime filter: semi-join reduction before the exact join
# ---------------------------------------------------------------------------

#: the selective driving subset: one month of urgent orders.
BF1_PRIORITY = "1-URGENT"
BF1_MONTH_START = "1995-03-01"
BF1_MONTH_END = "1995-04-01"

_BF1_ORACLE = f"""
WITH sel AS (
  SELECT o_orderkey
  FROM orders
  WHERE o_orderpriority = '{BF1_PRIORITY}'
    AND o_orderdate >= TIMESTAMP '{BF1_MONTH_START}'
    AND o_orderdate <  TIMESTAMP '{BF1_MONTH_END}'
)
SELECT COUNT(*) AS n_lineitems,
       COUNT(DISTINCT l.l_orderkey) AS n_orders,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(28,10))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN sel s ON l.l_orderkey = s.o_orderkey
"""


@register("bf1_bloom_semijoin", _BF1_ORACLE)
def bf1_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of the line items belonging to one month's urgent
    orders, computed through an explicit Bloom runtime filter: the
    selective order subset aggregates into a Spark-native Bloom sketch
    (``bloom_filter_agg``), which broadcasts to the fact scan and
    discards non-matching line items map-side (``might_contain``)
    BEFORE the exact join. False positives pass the filter and die in
    the join, so the result is byte-identical to the plain join the
    oracle runs — the filter is pure plan physics, invisible in the
    values (same contract as sj1's salting).

    This is the manual form of Spark's own runtime row-level filtering
    (spark.sql.optimizer.runtime.bloomFilter), written out so the
    technique is explicit and verifiable: at 100 TB the fact-side
    shuffle shrinks by the subset's selectivity (~0.25% here) for the
    price of one K-bit broadcast — the single highest-leverage trick
    for selective star joins. The exact join side is itself broadcast
    (the subset is dimension-sized)."""
    orders = table(spark, sf_dir, "orders")
    sel = orders.filter(
        (F.col("o_orderpriority") == BF1_PRIORITY)
        & (F.col("o_orderdate") >= F.lit(BF1_MONTH_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(BF1_MONTH_END).cast("timestamp"))
    ).select("o_orderkey")
    # Build the filter with the seeded md5 family (same construction as
    # sk5, independent seeds). The bit-position list is HARD-BOUNDED at
    # BLOOM_BITS rows regardless of key count — the one driver-side
    # collect is the filter itself (what a cluster broadcasts anyway),
    # same bounded-collect contract as the dedup hot-key cap.
    key = F.col("o_orderkey").cast("string")
    bit_rows = (
        sel.select(
            F.explode(
                F.array(
                    *[
                        (hash32(key, seed=200 + i) % BLOOM_BITS).alias(f"h{i}")
                        for i in range(BLOOM_HASHES)
                    ]
                )
            ).alias("bit_pos")
        )
        .distinct()
        .collect()
    )
    words = [0] * (BLOOM_BITS // 32)
    for r in bit_rows:
        b = int(r.bit_pos)
        words[b >> 5] |= 1 << (b & 31)
    words_lit = F.lit(words)
    pow2_lit = F.lit([1 << i for i in range(32)])

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    lkey = F.col("l_orderkey").cast("string")

    def _bit_set(h: "F.Column") -> "F.Column":
        word = F.element_at(words_lit, (h / 32).cast("int") + 1)
        p = F.element_at(pow2_lit, (h % 32).cast("int") + 1)
        # word / p is division by a power of two — exact in binary FP —
        # so the bigint truncation is an exact floor; word itself can
        # carry bit 31 (> int32 max), hence bigint not int.
        return ((word / p).cast("bigint") % 2) == 1

    probe = None
    for i in range(BLOOM_HASHES):
        ok = _bit_set(hash32(lkey, seed=200 + i) % BLOOM_BITS)
        probe = ok if probe is None else (probe & ok)
    probed = li.filter(probe)
    return (
        probed.join(F.broadcast(sel), probed["l_orderkey"] == sel["o_orderkey"])
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,10)"
                )
            )
            .cast("double")
            .alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# sk7 — bottom-k hash sample → mergeable quantile estimate
# ---------------------------------------------------------------------------

BOTTOMK = 64  # sample size per group

_SK7_ORACLE = f"""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_orderpriority
           ORDER BY {sql_hash32("CAST(o_orderkey AS VARCHAR)", seed=7)},
                    o_orderkey
         ) AS rn
  FROM orders
),
sample AS (SELECT * FROM ranked WHERE rn <= {BOTTOMK}),
est AS (
  SELECT o_orderpriority,
         COUNT(*) AS n_sample,
         quantile_cont(o_totalprice, 0.5) AS est_median
  FROM sample GROUP BY o_orderpriority
),
exact AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.5) AS exact_median
  FROM orders GROUP BY o_orderpriority
)
SELECT e.o_orderpriority, n_sample,
       ROUND(est_median, 6) AS est_median,
       ROUND(exact_median, 6) AS exact_median,
       ROUND(ABS(est_median - exact_median), 6) AS abs_err
FROM est e JOIN exact x USING (o_orderpriority)
"""


@register("sk7_bottomk_quantile", _SK7_ORACLE)
def sk7_bottomk_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k hash sketch for quantile estimation: per group, keep the
    K=64 rows with the smallest seeded md5-derived hash of the row key —
    a deterministic uniform sample WITHOUT randomness (same rows on any
    engine, any cluster size, any execution order), and a *mergeable*
    sketch (the bottom-k of a union is the bottom-k of the per-shard
    bottom-k's — the distributed-quantile property). The median over
    the sample estimates the group median; the query also carries the
    exact median so the sketch's error is visible in the result. The
    rank filter compiles to WindowGroupLimit (partial group-limit
    before the shuffle — tested in test_plans), so at 100 TB each map
    task forwards at most K rows per group, never the full column.
    Exact-median side is the small per-group percentile for comparison
    only. ``quantile_cont`` / Spark ``percentile`` are both linear
    interpolation on the sorted set — identical definition."""
    from pyspark.sql.window import Window

    orders = table(spark, sf_dir, "orders")
    hk = hash32(F.col("o_orderkey").cast("string"), seed=7)
    w = Window.partitionBy("o_orderpriority").orderBy(hk, "o_orderkey")
    sample = (
        orders.select("o_orderpriority", "o_totalprice", "o_orderkey")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BOTTOMK)
    )
    est = sample.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_sample"),
        F.percentile("o_totalprice", 0.5).alias("est_median_raw"),
    )
    exact = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.5).alias("exact_median_raw")
    )
    return est.join(exact, "o_orderpriority").select(
        "o_orderpriority",
        "n_sample",
        F.round("est_median_raw", 6).alias("est_median"),
        F.round("exact_median_raw", 6).alias("exact_median"),
        F.round(F.abs(F.col("est_median_raw") - F.col("exact_median_raw")), 6).alias(
            "abs_err"
        ),
    )


# ---------------------------------------------------------------------------
# sk8 — HLL shard merge: daily register files → whole-range estimate
# ---------------------------------------------------------------------------

_SK8_ORACLE = f"""
WITH hashes AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM events
),
shard_regs AS (
  SELECT event_type, day,
         CAST(h & {HLL_M - 1} AS BIGINT) AS register_id,
         MAX(CASE WHEN (h >> {HLL_P}) = 0 THEN {HLL_W_BITS + 1}
                  ELSE {HLL_W_BITS + 1} - length(bin(h >> {HLL_P})) END) AS max_rho
  FROM hashes
  GROUP BY event_type, day, h & {HLL_M - 1}
),
merged AS (
  SELECT event_type, register_id, MAX(max_rho) AS max_rho
  FROM shard_regs GROUP BY event_type, register_id
),
days AS (
  SELECT event_type, COUNT(DISTINCT day) AS n_shards
  FROM shard_regs GROUP BY event_type
),
folded AS (
  SELECT event_type,
         COUNT(*) AS n_present,
         SUM(1::BIGINT << ({HLL_W_BITS + 1} - max_rho)) AS s_present
  FROM merged GROUP BY event_type
),
est AS (
  SELECT event_type,
         {HLL_M} - n_present AS v_zero,
         {HLL_ALPHA_NUM!r} / CAST(
           s_present + ({HLL_M} - n_present) * (1::BIGINT << {HLL_W_BITS})
           AS DOUBLE) AS raw
  FROM folded
),
corrected AS (
  SELECT event_type,
         CASE WHEN raw <= {2.5 * HLL_M} AND v_zero > 0
              THEN {float(HLL_M)!r} * LN({float(HLL_M)!r} / v_zero)
              ELSE raw END AS hll_est
  FROM est
),
exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT c.event_type, d.n_shards, x.exact_distinct, c.hll_est
FROM corrected c
JOIN days d ON d.event_type = c.event_type
JOIN exact x ON x.event_type = c.event_type
"""


@register("sk8_hll_shard_merge", _SK8_ORACLE)
def sk8_hll_shard_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The property that makes HLL the distributed distinct-counter:
    per-DAY register files (the unit a streaming job or daily batch
    would persist) merge by cell-wise MAX into exactly the register
    file of the whole range, and the estimate is computed from the
    MERGED file — never from re-reading raw history. sk3/sk4 build one
    file over all input; this operator builds the per-shard files
    first and exercises the merge in the verified values (same
    estimator constants and correction as sk4, cited there). Scale
    shape: shard files are ≤ m rows per (type, day) however large the
    day is, so the merge input grows with days, not events — the
    incremental-rollup pattern for distinct counts at 100 TB."""
    ev = table(spark, sf_dir, "events")
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h")
    )
    w = F.shiftright(F.col("h"), HLL_P)
    rho = F.when(w == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.bin(w))
    )
    shard_regs = (
        ev.select("event_type", F.col("ts").cast("date").alias("day"), h)
        .groupBy(
            "event_type",
            "day",
            (F.col("h") % F.lit(HLL_M)).cast("bigint").alias("register_id"),
        )
        .agg(F.max(rho).alias("max_rho"))
    )
    merged = shard_regs.groupBy("event_type", "register_id").agg(
        F.max("max_rho").alias("max_rho")
    )
    days = shard_regs.groupBy("event_type").agg(
        F.count_distinct("day").alias("n_shards")
    )
    folded = merged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_W_BITS + 1} - max_rho)")
        ).alias("s_present"),
    )
    v_zero = F.lit(HLL_M) - F.col("n_present")
    s_total = F.col("s_present") + v_zero.cast("bigint") * F.lit(1 << HLL_W_BITS)
    raw = F.lit(HLL_ALPHA_NUM) / s_total.cast("double")
    corrected = folded.select(
        "event_type",
        F.when(
            (raw <= F.lit(2.5 * HLL_M)) & (v_zero > 0),
            F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v_zero),
        )
        .otherwise(raw)
        .alias("hll_est"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_distinct")
    )
    return (
        corrected.join(days, "event_type")
        .join(exact, "event_type")
        .select("event_type", "n_shards", "exact_distinct", "hll_est")
    )


# ---------------------------------------------------------------------------
# bmp1 — bitmap-word set intersection (exact distinct-user overlap)
# ---------------------------------------------------------------------------

BMP_WORD = 63  # bits used per bigint word (bit 63 avoided: no sign games)

_BMP1_ORACLE = f"""
WITH words AS (
  SELECT event_type,
         user_id // {BMP_WORD} AS word_id,
         bit_or(1::BIGINT << CAST(user_id % {BMP_WORD} AS INTEGER)) AS w
  FROM events
  GROUP BY event_type, user_id // {BMP_WORD}
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         SUM(bit_count(a.w & b.w)) AS n_both
  FROM words a JOIN words b
    ON a.word_id = b.word_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
),
exact AS (
  SELECT x.event_type AS type_a, y.event_type AS type_b,
         COUNT(*) AS n_both_exact
  FROM (SELECT DISTINCT event_type, user_id FROM events) x
  JOIN (SELECT DISTINCT event_type, user_id FROM events) y
    ON x.user_id = y.user_id AND x.event_type < y.event_type
  GROUP BY x.event_type, y.event_type
)
SELECT p.type_a, p.type_b, CAST(p.n_both AS BIGINT) AS n_both,
       e.n_both_exact
FROM pairs p JOIN exact e
  ON e.type_a = p.type_a AND e.type_b = p.type_b
"""


@register("bmp1_bitmap_intersect", _BMP1_ORACLE)
def bmp1_bitmap_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index set intersection: per event type, pack the distinct
    user set into 63-bit bigint words (bit_or aggregate keyed by
    user_id div 63), then count users active in BOTH of every type
    pair as Σ bit_count(a & b) over aligned words — the OLAP bitmap
    technique that turns set intersection into word-wise integer ops.
    The bitmap table is |users|/63 rows per type (≈ 16× smaller than
    the distinct pair list), the pair join is word-aligned equi-join,
    and — unlike HLL — the answer is EXACT, which the query proves by
    carrying the naive distinct-self-join count alongside. Dense
    integer user ids make the fixed-word layout optimal; sparse id
    spaces are what roaring-style containers add at 100 TB, same
    algebra. Bit 63 is left unused so no sign-extension semantics can
    diverge between engines."""
    ev = table(spark, sf_dir, "events")
    words = (
        ev.groupBy(
            "event_type",
            F.expr(f"user_id div {BMP_WORD}").alias("word_id"),
        )
        .agg(
            F.expr(
                f"bit_or(shiftleft(CAST(1 AS BIGINT), "
                f"CAST(user_id % {BMP_WORD} AS INT)))"
            ).alias("w")
        )
    )
    a = words.alias("a")
    b = words.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.word_id") == F.col("b.word_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            F.sum(F.expr("bit_count(a.w & b.w)")).cast("bigint").alias("n_both")
        )
    )
    dt = ev.select("event_type", "user_id").distinct()
    x = dt.alias("x")
    y = dt.alias("y")
    exact = (
        x.join(
            y,
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both_exact"))
    )
    return pairs.join(exact, ["type_a", "type_b"]).select(
        "type_a", "type_b", "n_both", "n_both_exact"
    )


# ---------------------------------------------------------------------------
# sk9 — AMS (tug-of-war) sketch: second frequency moment F2
# ---------------------------------------------------------------------------

AMS_K = 16  # independent ±1 estimators, averaged

_SK9_ORACLE = f"""
WITH tok AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
  FROM documents
),
cf AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
signs AS (
  SELECT c, {', '.join(
      f"CASE WHEN ('0x' || substr(md5('{j}:' || t), 1, 1))::INTEGER % 2 = 0 "
      f"THEN 1 ELSE -1 END AS s{j}" for j in range(AMS_K)
  )}
  FROM cf
),
est AS (
  SELECT {', '.join(f"SUM(s{j} * c) AS z{j}" for j in range(AMS_K))},
         SUM(CAST(c AS DECIMAL(28,0)) * c) AS f2_exact
  FROM signs
)
SELECT
  CAST(f2_exact AS BIGINT) AS f2_exact,
  CAST(({' + '.join(f"z{j} * z{j}" for j in range(AMS_K))})
       // {AMS_K} AS BIGINT) AS f2_estimate
FROM est
"""


@register("sk9_ams_f2", _SK9_ORACLE)
def sk9_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AMS tug-of-war sketch: F2 = Σ c² (the self-join size of the
    token stream — the quantity that predicts whether a key-join will
    blow up, and the repetitiveness moment behind skew planning),
    estimated from K random-sign projections z_j = Σ ±c whose squares
    are unbiased F2 estimators. Signs come from the seeded md5 family
    (one hex digit's parity per estimator), so DuckDB derives the
    IDENTICAL sketch and the value-hash gate covers it — and the exact
    F2 sits in the same row, making the estimator's error part of the
    verified values. Sketch state is K integers however large the
    stream: mergeable across shards by summing z vectors (sign
    functions are content-addressed, so shards agree). All integer
    arithmetic; zero float divergence."""
    docs = table(spark, sf_dir, "documents")
    tok = fanout(docs).select(
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("t")
    )
    cf = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    sign_cols = []
    for j in range(AMS_K):
        parity = (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{j}:"), F.col("t"))), 1, 1),
                16,
                10,
            ).cast("int")
            % 2
        )
        sign_cols.append(
            F.when(parity == 0, F.lit(1)).otherwise(F.lit(-1)).alias(f"s{j}")
        )
    signs = cf.select("c", *sign_cols)
    aggs = [
        F.sum(F.col(f"s{j}") * F.col("c")).alias(f"z{j}") for j in range(AMS_K)
    ] + [
        F.sum(F.col("c").cast("decimal(28,0)") * F.col("c")).alias("f2_exact")
    ]
    est = signs.agg(*aggs)
    sq = sum(
        (F.col(f"z{j}") * F.col(f"z{j}") for j in range(1, AMS_K)),
        F.col("z0") * F.col("z0"),
    )
    return est.select(
        F.col("f2_exact").cast("bigint").alias("f2_exact"),
        # floor division in BOTH engines (DuckDB `//`): a double cast
        # would round in DuckDB but truncate in Spark at *.5
        F.floor(sq / AMS_K).cast("bigint").alias("f2_estimate"),
    )


# ---------------------------------------------------------------------------
# bmp2 — bitmap shard merge: exact distinct rollup (sk8's exact twin)
# ---------------------------------------------------------------------------

_BMP2_ORACLE = f"""
WITH day_words AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         user_id // {BMP_WORD} AS word_id,
         bit_or(1::BIGINT << CAST(user_id % {BMP_WORD} AS INTEGER)) AS w
  FROM events
  GROUP BY event_type, CAST(ts AS DATE), user_id // {BMP_WORD}
),
merged AS (
  SELECT event_type, word_id, bit_or(w) AS w
  FROM day_words GROUP BY event_type, word_id
),
rolled AS (
  SELECT event_type, SUM(bit_count(w)) AS n_distinct_bitmap
  FROM merged GROUP BY event_type
),
exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_exact
  FROM events GROUP BY event_type
)
SELECT r.event_type,
       CAST(n_distinct_bitmap AS BIGINT) AS n_distinct_bitmap,
       n_distinct_exact
FROM rolled r JOIN exact e ON e.event_type = r.event_type
"""


@register("bmp2_bitmap_distinct_rollup", _BMP2_ORACLE)
def bmp2_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct-count rollup through mergeable per-day bitmaps:
    each (type, day) shard materializes its user set as 63-bit words,
    shards merge by word-aligned bit_or, and popcount of the merged
    bitmap IS the distinct count — sk8's shard-merge pattern with zero
    error, the right tool when the id space is dense enough that
    |ids|/63 words beat HLL's fixed registers on accuracy at similar
    size. The in-row exact count proves the algebra
    (bitmap == COUNT(DISTINCT) always, not approximately). Both
    aggregates are combiner-absorbed; incremental maintenance is
    bit_or of yesterday's bitmap with today's — no raw-history
    re-read, the same property the HLL path has, now exact."""
    ev = table(spark, sf_dir, "events")
    day_words = (
        ev.groupBy(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.expr(f"user_id div {BMP_WORD}").alias("word_id"),
        )
        .agg(
            F.expr(
                f"bit_or(shiftleft(CAST(1 AS BIGINT), "
                f"CAST(user_id % {BMP_WORD} AS INT)))"
            ).alias("w")
        )
    )
    merged = day_words.groupBy("event_type", "word_id").agg(
        F.expr("bit_or(w)").alias("w")
    )
    rolled = merged.groupBy("event_type").agg(
        F.sum(F.expr("bit_count(w)")).cast("bigint").alias("n_distinct_bitmap")
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_distinct_exact")
    )
    return rolled.join(exact, "event_type").select(
        "event_type", "n_distinct_bitmap", "n_distinct_exact"
    )


# ---------------------------------------------------------------------------
# sk10 — KMV (theta-sketch-style) distinct-set intersection estimate
# ---------------------------------------------------------------------------

KMV_K = 64  # bottom-k signature size per user set

# 2^60 — the hash60 range; exactly representable as a double.
_KMV_RANGE = 1 << 60

_SK10_ORACLE = f"""
WITH percount AS (
  SELECT event_type, user_id, COUNT(*) AS n
  FROM events GROUP BY event_type, user_id
),
users AS (
  -- "engaged" users of a type: above the type's MEAN events/user,
  -- compared in exact integer arithmetic (n * n_users > sum_n), so
  -- the set boundary is scale-free and identical on both engines.
  SELECT event_type, user_id
  FROM (
    SELECT event_type, user_id, n,
           COUNT(*) OVER (PARTITION BY event_type) AS n_users,
           SUM(n) OVER (PARTITION BY event_type) AS sum_n
    FROM percount
  ) t
  WHERE n * n_users > sum_n
),
hashed AS (
  SELECT DISTINCT event_type,
         (('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT) AS h
  FROM users
),
sk AS (
  SELECT event_type, h
  FROM (
    SELECT event_type, h,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM hashed
  ) r WHERE rn <= {KMV_K}
),
exact AS (
  SELECT x.event_type AS type_a, y.event_type AS type_b,
         COUNT(*) AS exact_intersection
  FROM users x JOIN users y USING (user_id)
  WHERE x.event_type < y.event_type
  GROUP BY 1, 2
),
memb AS (
  SELECT type_a, type_b, h,
         MAX(in_a) AS in_a, MAX(in_b) AS in_b
  FROM (
    SELECT p.type_a, p.type_b, s.h, 1 AS in_a, 0 AS in_b
    FROM exact p JOIN sk s ON s.event_type = p.type_a
    UNION ALL
    SELECT p.type_a, p.type_b, s.h, 0, 1
    FROM exact p JOIN sk s ON s.event_type = p.type_b
  ) u
  GROUP BY type_a, type_b, h
),
uni AS (
  SELECT type_a, type_b, h, in_a, in_b
  FROM (
    SELECT *, ROW_NUMBER() OVER (
             PARTITION BY type_a, type_b ORDER BY h) AS rn
    FROM memb
  ) r WHERE rn <= {KMV_K}
),
est AS (
  SELECT type_a, type_b,
         COUNT(*) AS k_used,
         CAST(SUM(in_a * in_b) AS BIGINT) AS k_both,
         MAX(h) AS kth
  FROM uni GROUP BY type_a, type_b
),
calc AS (
  SELECT type_a, type_b, k_used, k_both,
         CASE WHEN k_used < {KMV_K} THEN CAST(k_used AS DOUBLE)
              ELSE (CAST(k_used AS DOUBLE) - 1.0)
                   * {float(_KMV_RANGE)} / CAST(kth AS DOUBLE)
         END AS union_est
  FROM est
)
SELECT c.type_a, c.type_b, c.k_used,
       ROUND(CAST(c.k_both AS DOUBLE) / CAST(c.k_used AS DOUBLE), 9)
         AS est_jaccard,
       ROUND(c.union_est, 3) AS est_union,
       ROUND(CAST(c.k_both AS DOUBLE) / CAST(c.k_used AS DOUBLE)
             * c.union_est, 3) AS est_intersection,
       x.exact_intersection
FROM calc c JOIN exact x USING (type_a, type_b)
"""


@register("sk10_kmv_intersection", _SK10_ORACLE)
def sk10_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / theta-sketch-style) audience-overlap
    estimate: per event type, keep only the K smallest seeded hashes of
    its distinct user set; for each type pair, the K smallest hashes of
    the sketch UNION estimate |A∪B| from the Kth value's position in
    hash space, and the fraction of those also present in BOTH input
    sketches estimates Jaccard — their product estimates |A∩B| without
    ever materializing the intersection. The exact intersection rides
    alongside in the verified values, so the sketch's error is pinned.

    This is the sketch family behind cross-corpus overlap audits at
    100 TB: each set is reduced to K=64 hashes (mergeable: union of
    sketches → re-take bottom-K), set algebra happens on sketches, and
    the full user sets never co-shuffle. Deterministic md5-family
    hashes make DuckDB build the identical sketch (the same reason
    sk1–sk9 verify value-for-value).

    The compared sets are each type's ENGAGED users — above the type's
    mean events/user, decided in exact integer arithmetic
    (n · n_users > Σn, never a float mean) so the set boundary is
    scale-free and bit-identical across engines.

    Shape: one (type, user) count, a 5-row per-type totals broadcast
    back onto it, one bottom-K window per type (WindowGroupLimit
    prunes partial sorts), pair fan-out bounded by #types² sketch
    rows; the exact check is a user-keyed equi-join whose fan-out is
    bounded by #types per user."""
    from pyspark.sql.window import Window

    from bc_proj3_spark.functions.hashing import hash60

    events = table(spark, sf_dir, "events")
    percount = events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = percount.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("n").alias("sum_n")
    )
    # the engaged-user sets feed the hashing branch AND both sides of
    # the exact-intersection self-join; persisted so the events scan +
    # per-user count runs once, not once per branch (set size is
    # bounded by users × types, far below the event volume)
    users = (
        percount.join(F.broadcast(totals), "event_type")
        .filter(F.col("n") * F.col("n_users") > F.col("sum_n"))
        .select("event_type", "user_id")
        .persist()
    )
    hashed = users.select(
        "event_type",
        hash60(
            F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))
        ).alias("h"),
    ).distinct()
    w_type = Window.partitionBy("event_type").orderBy("h")
    # K×types rows, consumed by both pair-membership branches — the
    # barrier stops the bottom-K window re-running per branch
    sk = (
        hashed.withColumn("rn", F.row_number().over(w_type))
        .filter(F.col("rn") <= KMV_K)
        .select("event_type", "h")
        .localCheckpoint(eager=True)
    )
    exact = (
        users.alias("x")
        .join(users.alias("y"), "user_id")
        .filter(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
        # #types²-row result, consumed by the pair list AND the final
        # join — the barrier stops the users self-join running twice
        .localCheckpoint(eager=True)
    )
    pairs = exact.select("type_a", "type_b")
    memb = (
        pairs.join(sk, sk["event_type"] == pairs["type_a"])
        .select("type_a", "type_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionAll(
            pairs.join(sk, sk["event_type"] == pairs["type_b"]).select(
                "type_a", "type_b", "h", F.lit(0), F.lit(1)
            )
        )
        .groupBy("type_a", "type_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w_pair = Window.partitionBy("type_a", "type_b").orderBy("h")
    uni = memb.withColumn("rn", F.row_number().over(w_pair)).filter(
        F.col("rn") <= KMV_K
    )
    est = uni.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("k_used"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("k_both"),
        F.max("h").alias("kth"),
    )
    union_est = F.when(
        F.col("k_used") < KMV_K, F.col("k_used").cast("double")
    ).otherwise(
        (F.col("k_used").cast("double") - F.lit(1.0))
        * F.lit(float(_KMV_RANGE))
        / F.col("kth").cast("double")
    )
    jacc = F.col("k_both").cast("double") / F.col("k_used").cast("double")
    return (
        est.withColumn("union_est", union_est)
        .join(exact, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "k_used",
            F.round(jacc, 9).alias("est_jaccard"),
            F.round(F.col("union_est"), 3).alias("est_union"),
            F.round(jacc * F.col("union_est"), 3).alias("est_intersection"),
            "exact_intersection",
        )
    )


# ---------------------------------------------------------------------------
# sk13 — CountSketch (signed median estimator, the unbiased CMS twin)
# ---------------------------------------------------------------------------

#: odd depth so the median is the exact middle order statistic —
#: interpolation-free on both engines.
CS_DEPTH = 5
CS_WIDTH = 256
#: hash-seed offset so CountSketch rows are independent of CMS rows
CS_SEED0 = 100

_CS_SGN = "CASE WHEN ({h} >> 8) & 1 = 1 THEN 1 ELSE -1 END"


def _cs_sql_row(i: int, src: str, tcol: str) -> str:
    h = sql_hash32(tcol, seed=CS_SEED0 + i)
    return (
        f"SELECT {tcol} AS t_, {i} AS row_id, ({h}) % {CS_WIDTH} AS col_id, "
        + _CS_SGN.format(h=f"({h})")
        + f" AS sgn FROM {src}"
    )


_SK13_ORACLE = f"""
WITH {_SQL_TOK},
cells AS (
  {' UNION ALL '.join(_cs_sql_row(i, 'tok', 't') for i in range(CS_DEPTH))}
),
sketch AS (
  SELECT row_id, col_id, CAST(SUM(sgn) AS BIGINT) AS c
  FROM cells GROUP BY row_id, col_id
),
exact AS (
  SELECT t AS token, COUNT(*) AS exact_cnt
  FROM tok GROUP BY t
  ORDER BY exact_cnt DESC, token
  LIMIT {TOP_K}
),
probes AS (
  {' UNION ALL '.join(_cs_sql_row(i, 'exact', 'token') for i in range(CS_DEPTH))}
),
ests AS (
  SELECT p.t_ AS token, p.sgn * s.c AS est,
         ROW_NUMBER() OVER (PARTITION BY p.t_ ORDER BY p.sgn * s.c, p.row_id)
           AS rn
  FROM probes p
  JOIN sketch s ON s.row_id = p.row_id AND s.col_id = p.col_id
)
SELECT e.token,
       CAST(e.exact_cnt AS BIGINT) AS exact_cnt,
       CAST(m.est AS BIGINT) AS cs_est
FROM exact e
JOIN (SELECT token, est FROM ests WHERE rn = {CS_DEPTH // 2 + 1}) m
  ON m.token = e.token
"""


@register("sk13_countsketch", _SK13_ORACLE)
def sk13_countsketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CountSketch point estimates (Charikar-Chen-Farach-Colton 2002)
    for the top-{TOP_K} tokens: each of {CS_DEPTH} rows holds SIGNED
    counter sums (the ±1 sign makes collisions cancel in expectation
    instead of inflating), and the estimate is the exact MEDIAN of the
    per-row signed reads — two-sided unbiased error vs sk2's CMS
    over-count-only guarantee, and the estimator that still works
    under deletions (turnstile streams), which CMS cannot. The
    CMS/CountSketch pair is the standard frequency-sketch portfolio.

    Exactness: cells are exact integer sign sums from the shared
    seeded hash family; the median of an ODD number of integers is the
    middle order statistic (row_id tiebreak), interpolation-free on
    both engines — no float anywhere.

    Scale shape: sk1's — the map-side {CS_DEPTH}-way explode is
    absorbed by partial aggregation into a ≤ D×W-cell sketch (bounded
    at ANY corpus size); probes are {TOP_K}×D rows against that tiny
    sketch; the only corpus-sized work is one tokenization pass,
    persisted so the sketch and the exact counts share it."""
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    tok = _tokens(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    tok.count()

    def cs_cols(col):
        out = []
        for i in range(CS_DEPTH):
            h = hash32(col, seed=CS_SEED0 + i)
            out.append(
                F.struct(
                    F.lit(i).alias("row_id"),
                    (h % CS_WIDTH).alias("col_id"),
                    F.when(
                        F.shiftright(h, 8).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                    )
                    .otherwise(F.lit(-1))
                    .alias("sgn"),
                )
            )
        return out

    sketch = (
        tok.select(F.explode(F.array(*cs_cols(F.col("t")))).alias("c"))
        .select("c.row_id", "c.col_id", "c.sgn")
        .groupBy("row_id", "col_id")
        .agg(F.sum("sgn").cast("bigint").alias("c"))
    )
    exact = (
        tok.groupBy(F.col("t").alias("token"))
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("token"))
        .limit(TOP_K)
    )
    probes = exact.select(
        "token",
        "exact_cnt",
        F.explode(F.array(*cs_cols(F.col("token")))).alias("p"),
    ).select("token", "exact_cnt", "p.row_id", "p.col_id", "p.sgn")
    ests = probes.join(sketch, ["row_id", "col_id"]).select(
        "token",
        "exact_cnt",
        (F.col("sgn") * F.col("c")).alias("est"),
        "row_id",
    )
    w = Window.partitionBy("token").orderBy("est", "row_id")
    out = (
        ests.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == CS_DEPTH // 2 + 1)
        .select(
            "token",
            F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
            F.col("est").cast("bigint").alias("cs_est"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    out.count()
    tok.unpersist()
    return out
