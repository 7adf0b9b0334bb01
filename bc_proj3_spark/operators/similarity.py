"""Similarity search over the ``embeddings`` table (64-dim unit vectors).

Four registered queries, each value-verified against a DuckDB oracle:

- s1: brute-force cosine top-k — the exact baseline every ANN variant
  is judged against;
- s2: approximate top-k via multi-table random-hyperplane LSH (8 tables
  × 4 bits) — candidates share at least one bucket with the query;
- s3: embedding-cosine near-duplicate *pairs* via LSH bucket self-join
  + candidate-only verification (the embedding twin of
  operators/dedup.py d4);
- s4: IVF-style search — partition the corpus by label, probe only the
  nprobe nearest centroids per query.

Cross-engine determinism: all vector math is element-cast to double and
folded **sequentially** (Spark ``aggregate``/``zip_with``; DuckDB
``list_reduce``/``list_transform``), so both engines execute the same
IEEE operation sequence and produce bit-identical cosines — rankings
can't diverge on ties. Hyperplane signs are pre-computed constants from
the same md5 family as functions/hashing.py, baked as literals into
both plans.

Scale notes (100 TB / billion-vector posture):
- s1 broadcasts the (tiny) query set and scans the corpus once: the
  right brute-force plan, O(corpus) per query batch, no shuffle of the
  corpus itself. Its cost ceiling is why s2/s3/s4 exist.
- s2/s3 shuffle on (table, bucket) — pairwise work is bucket-local;
  recall is tuned by table count (1-(1-p^bits)^tables), not by
  widening any single join.
- s4 prunes whole partitions: with label-partitioned parquet the
  probed-label filter becomes partition pruning at the scan
  (the IVF promise: touch nprobe/nlist of the data).
- The testdata's vectors are near-uniform (max pairwise cosine ≈ 0.51,
  labels barely geometric), so approximate recall here is data-poor;
  the oracle replays the identical hash/probe decisions, so the
  verification is exact regardless.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bc_proj3_spark.plans.tables import fanout, local_rows_df, table
from bc_proj3_spark.registry import register

DIM = 64  # embeddings.parquet vector width (TESTDATA.md)
N_QUERIES = 5  # vec_id < 5 are the query vectors
TOP_K = 10
LSH_TABLES = 8
LSH_BITS = 4
NEARDUP_THRESHOLD = 0.45
N_PROBE = 2


# ---------------------------------------------------------------------------
# vector math — Spark + DuckDB twins (sequential fold ⇒ identical IEEE)
# ---------------------------------------------------------------------------


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def _sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})), "
        f"i -> ({a})[i] * ({b})[i]), (acc, x) -> acc + x)"
    )


def _sql_norm(a: str) -> str:
    return f"sqrt({_sql_dot(a, a)})"


def _hyperplane_sign(t: int, b: int, i: int) -> float:
    """Deterministic ±1 hyperplane weight — same md5-low-bit family as
    functions/hashing.py, evaluated once in Python and baked into both
    plans as literals (the hash inputs are constants, not data)."""
    h = int(hashlib.md5(f"{t}:{b}:{i}".encode()).hexdigest()[:8], 16)
    return 1.0 if h & 1 else -1.0


def _weights(t: int, b: int) -> list[float]:
    return [_hyperplane_sign(t, b, i) for i in range(DIM)]


def _sql_bucket(v: str, t: int) -> str:
    bits = []
    for b in range(LSH_BITS):
        w = "[" + ", ".join(str(x) for x in _weights(t, b)) + "]::DOUBLE[]"
        proj = (
            f"list_reduce(list_transform(generate_series(1, len({v})), "
            f"i -> {v}[i] * ({w})[i]), (acc, x) -> acc + x)"
        )
        bits.append(f"CASE WHEN {proj} > 0 THEN {1 << b} ELSE 0 END")
    return "(" + " + ".join(bits) + ")"


#: DuckDB CTE: corpus with double vectors + norms, and the query subset.
_SQL_BASE = f"""
e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         {_sql_norm('embedding::DOUBLE[]')} AS nrm
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM e
  WHERE vec_id < {N_QUERIES}
)
"""


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fanout(table(spark, sf_dir, "embeddings"))
    v = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id", "label", v.alias("v"), _norm(v).alias("nrm")
    )


def _queries(corpus: DataFrame) -> DataFrame:
    return corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )


def _top_k(scored: DataFrame, k: int = TOP_K) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cosine")
    )


# ---------------------------------------------------------------------------
# s1 — brute-force cosine top-k (the exact baseline)
# ---------------------------------------------------------------------------

_S1_ORACLE = f"""
WITH {_SQL_BASE},
scored AS (
  SELECT query_id, e.vec_id,
         {_sql_dot('qv', 'v')} / (qn * nrm) AS cosine
  FROM q, e
  WHERE e.vec_id <> query_id
)
SELECT query_id, vec_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
  FROM scored
) t WHERE rn <= {TOP_K}
"""


@register("s1_knn_bruteforce", _S1_ORACLE)
def s1_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 per query vector: broadcast the query set
    across one full corpus scan, rank per query. The corpus is never
    shuffled for scoring — only the (queries × k)-sized ranked rows
    move. This is the recall=1.0 baseline for s2/s4."""
    corpus = _corpus(spark, sf_dir)
    q = _queries(corpus)
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias(
                "cosine"
            ),
        )
    )
    return _top_k(scored)


# ---------------------------------------------------------------------------
# s2 — ANN via multi-table random-hyperplane LSH
# ---------------------------------------------------------------------------


def _sql_bucket_union(src: str, id_expr: str) -> str:
    return " UNION ALL ".join(
        f"SELECT {id_expr}, {t} AS t, {_sql_bucket('v', t)} AS bkt FROM {src}"
        for t in range(LSH_TABLES)
    )


_S2_ORACLE = f"""
WITH {_SQL_BASE},
cb AS ({_sql_bucket_union('e', 'vec_id')}),
qb AS (SELECT vec_id AS query_id, t, bkt FROM cb WHERE vec_id < {N_QUERIES}),
cand AS (
  SELECT DISTINCT qb.query_id, cb.vec_id
  FROM qb JOIN cb ON qb.t = cb.t AND qb.bkt = cb.bkt
  WHERE cb.vec_id <> qb.query_id
),
scored AS (
  SELECT c.query_id, c.vec_id,
         {_sql_dot('q.qv', 'e.v')} / (q.qn * e.nrm) AS cosine
  FROM cand c
  JOIN q ON q.query_id = c.query_id
  JOIN e ON e.vec_id = c.vec_id
)
SELECT query_id, vec_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
  FROM scored
) t WHERE rn <= {TOP_K}
"""


def _bucketed(corpus: DataFrame) -> DataFrame:
    """(vec_id, t, bkt) — one row per vector per hash table.

    All LSH_TABLES×LSH_BITS projections are computed in ONE numpy
    matmul per Arrow batch (vectorized pandas UDF), then reduced to
    per-table bucket ids — the billion-vector path, ~100× cheaper than
    per-bit interpreted fold expressions. Sign parity with the oracle's
    sequential fold is safe: |proj| for random unit vectors is O(1)
    while summation-order error is O(1e-15), so the (proj > 0) bit
    can't flip between formulations. (Cosine *rankings* stay on the
    sequential fold — see module docstring — because there ties are
    decided at full float precision.)"""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    w = np.array(
        [
            _weights(t, b)
            for t in range(LSH_TABLES)
            for b in range(LSH_BITS)
        ]
    )  # (tables*bits, DIM)

    @pandas_udf(ArrayType(LongType()))
    def _buckets(vs: pd.Series) -> pd.Series:
        m = np.vstack(vs.to_numpy())  # (n, DIM)
        bits = (m @ w.T > 0).astype(np.int64)  # (n, tables*bits)
        per_table = [
            sum(bits[:, t * LSH_BITS + b] << b for b in range(LSH_BITS))
            for t in range(LSH_TABLES)
        ]
        return pd.Series(list(np.stack(per_table, axis=1)))

    from pyspark import StorageLevel

    cb = corpus.select(
        "vec_id", F.posexplode(_buckets(F.col("v"))).alias("t", "bkt")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # Every caller joins cb against a projection of ITSELF (query-side
    # vs corpus-side buckets), so without a materialization barrier the
    # Arrow matmul above runs once per join side — eager persist+count
    # halves the Python-boundary work for all six consumers (s2/s3/s9/
    # hs3/hs4/hs5) and stops AQE's concurrent exchange jobs racing to
    # recompute the uncached UDF subtree (the _verified_jaccard
    # rationale). The bucket table is (vec_id, t, bkt) — narrow rows,
    # LSH_TABLES per vector.
    cb.count()
    return cb


@register("s2_ann_lsh", _S2_ORACLE)
def s2_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-10 via random-hyperplane LSH: 8 tables ×
    4 sign-bits; a corpus vector is a candidate if it shares any
    table's bucket with the query. Candidate generation is an equi-join
    on (table, bucket) — bucket-local work — and exact cosine is
    computed for candidates only. Recall is the multi-table OR:
    1-(1-p^4)^8 for per-bit agreement p."""
    corpus = _corpus(spark, sf_dir)
    q = _queries(corpus)
    cb = _bucketed(corpus)
    qb = cb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "t", "bkt"
    )
    cand = (
        qb.join(cb, ["t", "bkt"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    scored = (
        cand.join(q, "query_id")
        .join(corpus.select("vec_id", "v", "nrm"), "vec_id")
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias(
                "cosine"
            ),
        )
    )
    return _top_k(scored)


# ---------------------------------------------------------------------------
# s3 — embedding-cosine near-duplicate pairs (LSH self-join + verify)
# ---------------------------------------------------------------------------

_S3_ORACLE = f"""
WITH {_SQL_BASE},
cb AS ({_sql_bucket_union('e', 'vec_id')}),
cand AS (
  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM cb x JOIN cb y ON x.t = y.t AND x.bkt = y.bkt AND x.vec_id < y.vec_id
),
scored AS (
  SELECT vec_a, vec_b,
         {_sql_dot('ea.v', 'eb.v')} / (ea.nrm * eb.nrm) AS cosine
  FROM cand
  JOIN e ea ON ea.vec_id = vec_a
  JOIN e eb ON eb.vec_id = vec_b
)
SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= {NEARDUP_THRESHOLD}
"""


@register("s3_cosine_neardup_pairs", _S3_ORACLE)
def s3_cosine_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cosine >= 0.45) across the whole
    corpus — the embedding twin of dedup's MinHash path: LSH bucket
    self-join generates candidates (no vector×vector cross join),
    cosine is verified for candidates only. Recall scales with table
    count; exhaustiveness is never bought with a cartesian product."""
    from pyspark import StorageLevel

    # r11 (r10 deferred item): the (vec_id, v, nrm) projection feeds the
    # bucket build AND both verify joins — un-cached, the embeddings
    # scan + per-row norm ran three times. _bucketed's materialization
    # count is the first job over it and fills this cache; ea/eb then
    # read cached rows (after-plan: one embeddings scan).
    corpus = _corpus(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    cb = _bucketed(corpus)
    cand = (
        cb.alias("x")
        .join(
            cb.alias("y"),
            (F.col("x.t") == F.col("y.t"))
            & (F.col("x.bkt") == F.col("y.bkt"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b")
        )
        .distinct()
    )
    ea = corpus.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    eb = corpus.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= NEARDUP_THRESHOLD)
    )


# ---------------------------------------------------------------------------
# s4 — IVF-style probe: per-label centroids, search nprobe partitions
# ---------------------------------------------------------------------------

_S4_ORACLE = f"""
WITH {_SQL_BASE},
cent AS (
  SELECT label, list(cx ORDER BY i) AS c FROM (
    SELECT label, i, AVG(v[i]) AS cx
    FROM e, (SELECT unnest(generate_series(1, {DIM})) AS i) dims
    GROUP BY label, i
  ) percoord
  GROUP BY label
),
centn AS (SELECT label, c, {_sql_norm('c')} AS cn FROM cent),
probe AS (
  SELECT query_id, label FROM (
    SELECT q.query_id, centn.label,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY {_sql_dot('q.qv', 'centn.c')} / (q.qn * centn.cn) DESC,
                      centn.label) AS rn
    FROM q, centn
  ) r WHERE rn <= {N_PROBE}
),
scored AS (
  SELECT p.query_id, e.vec_id,
         {_sql_dot('q.qv', 'e.v')} / (q.qn * e.nrm) AS cosine
  FROM probe p
  JOIN q ON q.query_id = p.query_id
  JOIN e ON e.label = p.label
  WHERE e.vec_id <> p.query_id
)
SELECT query_id, vec_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
  FROM scored
) t WHERE rn <= {TOP_K}
"""


@register("s4_ivf_probe", _S4_ORACLE)
def s4_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-shaped ANN: labels play the role of coarse-quantizer cells.
    Per-label centroids (posexplode → per-coordinate avg → rebuild),
    each query probes its nprobe=2 nearest centroids, and exact cosine
    runs only inside the probed partitions. With label-partitioned
    storage the probed-label filter becomes scan-level partition
    pruning — the plan touches nprobe/nlist of the corpus."""
    corpus = _corpus(spark, sf_dir)
    q = _queries(corpus)
    cent = (
        corpus.select("label", F.posexplode("v").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.avg("x").alias("cx"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "cx"))), lambda s: s.cx
            ).alias("c")
        )
    )
    centn = cent.select("label", "c", _norm(F.col("c")).alias("cn"))
    wp = Window.partitionBy("query_id").orderBy(
        F.desc("csim"), F.asc("label")
    )
    probe = (
        q.crossJoin(F.broadcast(centn))
        .select(
            "query_id",
            "label",
            (_dot(F.col("qv"), F.col("c")) / (F.col("qn") * F.col("cn"))).alias(
                "csim"
            ),
        )
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= N_PROBE)
        .select("query_id", "label")
    )
    scored = (
        probe.join(q, "query_id")
        .join(corpus, "label")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias(
                "cosine"
            ),
        )
    )
    return _top_k(scored)


# ---------------------------------------------------------------------------
# s5 — k-means assignment step (one Lloyd iteration, deterministic seeds)
# ---------------------------------------------------------------------------

KMEANS_K = 8  # centroids = vec_id 0..7 (deterministic seeding)

_S5_ORACLE = f"""
WITH {_SQL_BASE},
cent AS (
  SELECT vec_id AS centroid_id, v AS cv, nrm AS cn FROM e
  WHERE vec_id < {KMEANS_K}
),
scored AS (
  SELECT e.vec_id, centroid_id,
         {_sql_dot('cv', 'v')} / (cn * nrm) AS cosine
  FROM e, cent
)
SELECT vec_id, centroid_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY vec_id ORDER BY cosine DESC, centroid_id) AS rn
  FROM scored
) t WHERE rn = 1
"""


@register("s5_kmeans_assign", _S5_ORACLE)
def s5_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd assignment step of spherical k-means: every vector is
    assigned to its highest-cosine centroid, centroids seeded
    deterministically as vec_id 0..K-1 (k-means++-style seeding is a
    sequential RNG process — replaying it identically in two engines
    buys nothing for a plan-shape benchmark, so seeds are fixed ids).

    Plan shape: the K-row centroid table is broadcast across ONE corpus
    scan (corpus × K scored rows, never corpus × corpus), and the
    per-vector argmax is a window rank with a centroid-id tiebreaker —
    deterministic because the sequential-fold cosines are bit-identical
    in both engines. The update step (new centroid = mean of members)
    is a map-side-combinable groupBy away; iterating assignment+update
    to convergence is driver-side orchestration of exactly this plan,
    checkpointed per round like operators/graph.py."""
    corpus = _corpus(spark, sf_dir)
    cent = corpus.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    scored = corpus.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "centroid_id",
        (_dot(F.col("cv"), F.col("v")) / (F.col("cn") * F.col("nrm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cosine"), F.asc("centroid_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "centroid_id", "cosine")
    )


# ---------------------------------------------------------------------------
# s6 — k-means update step (per-cluster mean vectors, decimal-exact)
# ---------------------------------------------------------------------------

_S6_ORACLE = f"""
WITH {_SQL_BASE},
cent AS (
  SELECT vec_id AS centroid_id, v AS cv, nrm AS cn FROM e
  WHERE vec_id < {KMEANS_K}
),
assigned AS (
  SELECT vec_id, centroid_id, v FROM (
    SELECT e.vec_id, centroid_id, e.v,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_sql_dot('cv', 'v')} / (cn * nrm) DESC, centroid_id
           ) AS rn
    FROM e, cent
  ) t WHERE rn = 1
),
pos AS (
  SELECT centroid_id, i.i AS pos, v[i.i] AS x
  FROM assigned, (SELECT unnest(generate_series(1, {DIM})) AS i) i
)
SELECT centroid_id,
       CAST(pos AS INTEGER) AS pos,
       COUNT(*) AS n_members,
       ROUND(CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*), 9)
         AS mean_x
FROM pos
GROUP BY centroid_id, pos
"""


@register("s6_kmeans_update", _S6_ORACLE)
def s6_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-means UPDATE step over s5's assignment: the element-wise
    mean vector of every cluster, emitted as (centroid_id, pos, mean)
    rows — one full Lloyd iteration is s5 ∘ s6.

    The vector mean is computed by posexploding assigned vectors to
    (centroid, position, value) and aggregating — ONE shuffle keyed on
    (centroid, pos) with map-side partial sums, the scale-canonical way
    to average billions of vectors (a collect-based centroid refresh
    dies at exactly the corpus size where k-means matters). Sums
    accumulate in exact decimal (functions/numeric.py) so any partial-
    aggregation order in either engine produces bit-identical means.
    Emitting positional rows (not re-assembled arrays) keeps the result
    a plain aggregate; array re-assembly is one sort_array(collect_list)
    away when the next iteration needs literal centroid vectors."""
    corpus = _corpus(spark, sf_dir)
    assigned = s5_kmeans_assign(spark, sf_dir).select("vec_id", "centroid_id")
    return (
        corpus.join(assigned, "vec_id")
        .select("centroid_id", F.posexplode("v").alias("pos0", "x"))
        .select(
            "centroid_id", (F.col("pos0") + 1).cast("int").alias("pos"), "x"
        )
        .groupBy("centroid_id", "pos")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(
                F.sum(F.col("x").cast("decimal(38,18)")).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("mean_x"),
        )
    )


# ---------------------------------------------------------------------------
# d12 — semantic dedup (SemDeDup): k-means cluster, dedup within cluster
# ---------------------------------------------------------------------------

SEMDEDUP_THRESHOLD = NEARDUP_THRESHOLD  # cosine above ⇒ semantic duplicate

_D12_ORACLE = f"""
WITH {_SQL_BASE},
cent AS (
  SELECT vec_id AS centroid_id, v AS cv, nrm AS cn FROM e
  WHERE vec_id < {KMEANS_K}
),
assigned AS (
  SELECT vec_id, centroid_id FROM (
    SELECT e.vec_id, centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_sql_dot('cv', 'v')} / (cn * nrm) DESC, centroid_id
           ) AS rn
    FROM e, cent
  ) t WHERE rn = 1
),
memb AS (
  SELECT a.vec_id, a.centroid_id, e.v, e.nrm
  FROM assigned a JOIN e USING (vec_id)
),
rem AS (
  SELECT DISTINCT q.vec_id
  FROM memb p
  JOIN memb q ON p.centroid_id = q.centroid_id AND p.vec_id < q.vec_id
  WHERE {_sql_dot('p.v', 'q.v')} / (p.nrm * q.nrm) >= {SEMDEDUP_THRESHOLD}
)
SELECT m.centroid_id,
       COUNT(*) AS n_members,
       CAST(SUM(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       CAST(COUNT(*)
            - SUM(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept
FROM memb m LEFT JOIN rem r ON m.vec_id = r.vec_id
GROUP BY m.centroid_id
"""


@register("d12_semdedup", _D12_ORACLE)
def d12_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings (s5's spherical k-means
    assignment) and removing, WITHIN each cluster, every vector that
    has a higher-cosine-than-threshold neighbor with a smaller id
    (greedy keep-lowest-id — deterministic, no RNG). The per-cluster
    report (members / removed / kept) is the dedup funnel's semantic
    stage, catching paraphrase-level duplicates that shingle MinHash
    (d4) cannot see.

    Scale shape: this is exactly why SemDeDup clusters FIRST — the
    pairwise stage is confined within clusters, O(Σ|cluster|²) instead
    of corpus²; at production scale K grows with the corpus (the paper
    uses 50k clusters for LAION) keeping cluster sizes bounded. The
    pair join is an equi-join on centroid_id with an id-order residual
    — one shuffle keyed by cluster, never a global cross. Cosines are
    sequential folds, bit-identical across engines (module docstring),
    so the removal set is exactly reproducible."""
    assigned = s5_kmeans_assign(spark, sf_dir).select("vec_id", "centroid_id")
    corpus = _corpus(spark, sf_dir)
    # the clustered membership feeds both sides of the pair self-join
    # and the final report; persisted so the k-means assignment pass
    # runs once, not once per branch (at scale this is the clustered
    # corpus you would materialize anyway — every SemDeDup consumer
    # reads it)
    memb = (
        assigned.join(corpus, "vec_id")
        .select("vec_id", "centroid_id", "v", "nrm")
        .persist()
    )
    p, q = memb.alias("p"), memb.alias("q")
    rem = (
        p.join(
            q,
            (F.col("p.centroid_id") == F.col("q.centroid_id"))
            & (F.col("p.vec_id") < F.col("q.vec_id")),
        )
        .filter(
            _dot(F.col("p.v"), F.col("q.v")) / (F.col("p.nrm") * F.col("q.nrm"))
            >= SEMDEDUP_THRESHOLD
        )
        .select(F.col("q.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("removed", F.lit(1))
    )
    return (
        memb.join(rem, "vec_id", "left")
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.coalesce(F.col("removed"), F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
            (
                F.count(F.lit(1))
                - F.sum(F.coalesce(F.col("removed"), F.lit(0)))
            )
            .cast("bigint")
            .alias("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# s7 — semantic decontamination against a held-out benchmark set
# ---------------------------------------------------------------------------

#: the first N_BENCH vectors stand in for a held-out eval/benchmark
#: embedding set; everything else is the training-candidate corpus.
N_BENCH = 32
#: max-cosine threshold above which a candidate is flagged as a
#: semantic duplicate of benchmark content (p99 of the testdata's
#: max-cosine distribution is ~0.42, so ~1-2% of docs flag — the
#: realistic contamination-rate regime).
DECON_TAU = 0.40

_S7_ORACLE = f"""
WITH {_SQL_BASE},
c AS (SELECT vec_id, v, nrm FROM e WHERE vec_id >= {N_BENCH}),
b AS (SELECT vec_id AS bench_id, v AS bv, nrm AS bn FROM e
      WHERE vec_id < {N_BENCH}),
scored AS (
  SELECT c.vec_id, b.bench_id,
         {_sql_dot('c.v', 'b.bv')} / (c.nrm * b.bn) AS cosine
  FROM c, b
)
SELECT vec_id, bench_id, cosine,
       cosine >= {DECON_TAU} AS contaminated
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY vec_id ORDER BY cosine DESC, bench_id) AS rn
  FROM scored
) t WHERE rn = 1
"""


@register("s7_semantic_decontaminate", _S7_ORACLE)
def s7_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: for every training-candidate
    vector, the nearest held-out benchmark vector by cosine and a
    contamination flag at DECON_TAU — the semantic complement of d7's
    n-gram decontamination (paraphrased or re-tokenized benchmark
    leakage that exact n-grams miss is exactly what embedding
    similarity catches; modern data cards report both).

    Determinism: cosines use the module's sequential-fold convention
    (bit-identical across engines), and the nearest-benchmark pick
    breaks cosine ties by bench_id, so both engines select the same
    row. The flag compares an exact double against a literal.

    Scale shape: the benchmark set is a constant-size broadcast
    (N_BENCH × DIM doubles); the corpus is scanned once, never
    shuffled for scoring — only (corpus × 1) winner rows move through
    the per-vector top-1 aggregation. s1's plan with k=1 and a fixed
    probe side; at a billion vectors the same plan holds (benchmark
    sets are KBs)."""
    corpus = _corpus(spark, sf_dir)
    cand = corpus.filter(F.col("vec_id") >= N_BENCH)
    bench = corpus.filter(F.col("vec_id") < N_BENCH).select(
        F.col("vec_id").alias("bench_id"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bn"),
    )
    scored = cand.crossJoin(F.broadcast(bench)).select(
        "vec_id",
        "bench_id",
        (_dot(F.col("v"), F.col("bv")) / (F.col("nrm") * F.col("bn"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cosine"), F.asc("bench_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "bench_id",
            "cosine",
            (F.col("cosine") >= DECON_TAU).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# s8 — hard-negative mining for contrastive / embedding training
# ---------------------------------------------------------------------------

#: pairs at or above this cosine are near-duplicates (s3's regime) —
#: too close to be semantically distinct, so they are excluded from the
#: negative pool (training on them teaches the model to separate
#: duplicates, the classic false-negative failure of contrastive runs).
HARD_NEG_CEIL = NEARDUP_THRESHOLD
HARD_NEG_K = TOP_K

_S8_ORACLE = f"""
WITH {_SQL_BASE},
qa AS (
  SELECT vec_id AS query_id, label AS qlabel, v AS qv, nrm AS qn
  FROM e WHERE vec_id < {N_QUERIES}
),
neg AS (
  SELECT query_id, e.vec_id, e.label,
         {_sql_dot('qv', 'v')} / (qn * nrm) AS cosine
  FROM qa, e
  WHERE e.vec_id <> query_id AND e.label <> qlabel
),
hard AS (SELECT * FROM neg WHERE cosine < {HARD_NEG_CEIL})
SELECT query_id, vec_id, label, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
  FROM hard
) t WHERE rn <= {HARD_NEG_K}
"""


@register("s8_hard_negatives", _S8_ORACLE)
def s8_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: for each anchor vector, the HARD_NEG_K
    most-similar vectors that are (a) a DIFFERENT label (not positives)
    and (b) below the near-duplicate ceiling (not undetected
    duplicates) — "similar but provably not the same", the pairs that
    carry the gradient signal in contrastive embedding training
    (easy random negatives are already separated; near-dup false
    negatives are actively harmful — both are filtered here).

    Determinism: sequential-fold cosines (bit-identical across
    engines), doubles compared against literal thresholds, vec_id
    tiebreak on the per-anchor ranking.

    Scale shape: s1's plan with two extra map-side predicates — the
    anchor batch broadcasts over ONE corpus scan, label/ceiling
    filters run before the per-anchor top-k, and only (anchors × k)
    ranked rows ever move. At billion-vector scale the anchor batch is
    the unit of work (mine per training batch); swapping the scan side
    for s2's LSH-bucketed candidates keeps the same downstream
    filter/rank shape."""
    corpus = _corpus(spark, sf_dir)
    anchors = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    neg = (
        corpus.crossJoin(F.broadcast(anchors))
        .filter(
            (F.col("vec_id") != F.col("query_id"))
            & (F.col("label") != F.col("qlabel"))
        )
        .select(
            "query_id",
            "vec_id",
            "label",
            (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") < HARD_NEG_CEIL)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        neg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= HARD_NEG_K)
        .select("query_id", "vec_id", "label", "cosine")
    )


# ---------------------------------------------------------------------------
# s9 — ANN quality monitor: recall@k / MRR of s2's LSH vs exact KNN
# ---------------------------------------------------------------------------

_S9_ORACLE = f"""
WITH {_SQL_BASE},
ex_scored AS (
  SELECT query_id, e.vec_id,
         {_sql_dot('qv', 'v')} / (qn * nrm) AS cosine
  FROM q, e
  WHERE e.vec_id <> query_id
),
exact AS (
  SELECT query_id, vec_id, rn FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
    FROM ex_scored
  ) t WHERE rn <= {TOP_K}
),
cb AS MATERIALIZED ({_sql_bucket_union('e', 'vec_id')}),
qb AS (SELECT vec_id AS query_id, t, bkt FROM cb WHERE vec_id < {N_QUERIES}),
cand AS (
  SELECT DISTINCT qb.query_id, cb.vec_id
  FROM qb JOIN cb ON qb.t = cb.t AND qb.bkt = cb.bkt
  WHERE cb.vec_id <> qb.query_id
),
ann_scored AS (
  SELECT c.query_id, c.vec_id,
         {_sql_dot('q.qv', 'e.v')} / (q.qn * e.nrm) AS cosine
  FROM cand c
  JOIN q ON q.query_id = c.query_id
  JOIN e ON e.vec_id = c.vec_id
),
ann AS (
  SELECT query_id, vec_id, rn AS ann_rn FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
    FROM ann_scored
  ) t WHERE rn <= {TOP_K}
),
j AS (
  SELECT x.query_id, x.rn, a.ann_rn
  FROM exact x LEFT JOIN ann a
    ON a.query_id = x.query_id AND a.vec_id = x.vec_id
)
SELECT query_id,
       COUNT(*) AS n_exact,
       CAST(SUM(CASE WHEN ann_rn IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits,
       CAST(SUM(CASE WHEN ann_rn IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS recall_at_k,
       MAX(CASE WHEN rn = 1
                THEN COALESCE(CAST(1 AS DOUBLE) / ann_rn, CAST(0 AS DOUBLE))
                ELSE CAST(0 AS DOUBLE) END) AS rr_top1
FROM j GROUP BY query_id
"""


def _ranked(scored: DataFrame, rn_name: str, k: int = TOP_K) -> DataFrame:
    """(query_id, vec_id, rn) top-k ranking — _top_k with the rank kept."""
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn(rn_name, F.row_number().over(w))
        .filter(F.col(rn_name) <= k)
        .select("query_id", "vec_id", rn_name)
    )


@register("s9_ann_recall", _S9_ORACLE)
def s9_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality monitor: per query, recall@k of s2's LSH candidates
    against s1's exact top-k ground truth, plus the reciprocal rank of
    the TRUE nearest neighbor inside the ANN list (0 when missed) —
    d11's sketch-calibration idea applied to the vector funnel. This is
    the number that tells you whether the LSH table/bit geometry is
    still adequate as the corpus grows: recall decay shows up here
    before it silently degrades every downstream retrieval consumer.

    Determinism: both rankings use the module's sequential-fold cosines
    (bit-identical across engines) with vec_id tiebreaks; recall and
    reciprocal rank are single IEEE divisions of exact small integers —
    deliberately unrounded (no ROUND-tie seam; EXACT_DOUBLE_OK).

    Scale shape: the ground-truth side is the brute-force scan you run
    over a SAMPLED query set (queries × corpus, embarrassingly
    parallel, the corpus never shuffles); the ANN side reuses s2's
    (table, bucket) equi-join plan. The corpus projection is persisted
    so both sides share one materialization; the two ranked lists are
    (queries × k)-row intermediates, localCheckpointed so the final
    join+aggregate never re-triggers either search. At production
    scale this runs periodically over ~1e3 sampled queries — cost is
    one brute-force pass by construction, and the monitor is the
    cheap insurance on the whole ANN stack."""
    corpus = _corpus(spark, sf_dir).persist()
    q = _queries(corpus)
    ex_scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias(
                "cosine"
            ),
        )
    )
    exact = _ranked(ex_scored, "rn").localCheckpoint(eager=True)

    cb = _bucketed(corpus)
    qb = cb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "t", "bkt"
    )
    cand = (
        qb.join(cb, ["t", "bkt"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    ann_scored = (
        cand.join(q, "query_id")
        .join(corpus.select("vec_id", "v", "nrm"), "vec_id")
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias(
                "cosine"
            ),
        )
    )
    ann = _ranked(ann_scored, "ann_rn").localCheckpoint(eager=True)

    j = exact.join(ann, ["query_id", "vec_id"], "left")
    hit = F.when(F.col("ann_rn").isNotNull(), 1).otherwise(0)
    return j.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.sum(hit).cast("bigint").alias("n_hits"),
        (F.sum(hit).cast("double") / F.count(F.lit(1))).alias("recall_at_k"),
        F.max(
            F.when(
                F.col("rn") == 1,
                F.coalesce(
                    F.lit(1.0) / F.col("ann_rn"), F.lit(0.0)
                ),
            ).otherwise(F.lit(0.0))
        ).alias("rr_top1"),
    )


# ---------------------------------------------------------------------------
# s10 — product-quantization codes + reconstruction error
# ---------------------------------------------------------------------------

PQ_M = 4  # subspaces (DIM/PQ_M = 16 dims each)
PQ_K = 8  # sub-centroids per subspace (codes 0..7; s5's deterministic seeds)
PQ_SUB = DIM // PQ_M


def _sql_d2(a: str, b: str) -> str:
    """Squared L2 over two DOUBLE[] lists — sequential fold, the same
    IEEE order as the Spark twin below."""
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})), "
        f"i -> (({a})[i] - ({b})[i]) * (({a})[i] - ({b})[i])), "
        f"(acc, x) -> acc + x)"
    )


def _d2(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


_S10_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
sub AS (
  SELECT vec_id, m.m AS m, v[m.m * {PQ_SUB} + 1 : (m.m + 1) * {PQ_SUB}] AS sv
  FROM e, (SELECT unnest(range(0, {PQ_M})) AS m) m
),
cb AS (
  SELECT m, vec_id AS cid, sv AS cv FROM sub WHERE vec_id < {PQ_K}
),
scored AS (
  SELECT s.vec_id, s.m, cb.cid, {_sql_d2('s.sv', 'cb.cv')} AS d2
  FROM sub s JOIN cb ON s.m = cb.m
),
best AS (
  SELECT vec_id, m, cid, d2 FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id, m ORDER BY d2, cid) AS rn
    FROM scored
  ) t WHERE rn = 1
),
packed AS (
  SELECT vec_id,
         list(cid ORDER BY m) AS code,
         list_reduce(list(d2 ORDER BY m), (acc, x) -> acc + x) AS recon_err
  FROM best GROUP BY vec_id
)
SELECT vec_id,
       CAST(code[1] AS INTEGER) AS c0,
       CAST(code[2] AS INTEGER) AS c1,
       CAST(code[3] AS INTEGER) AS c2,
       CAST(code[4] AS INTEGER) AS c3,
       recon_err
FROM packed
"""


@register("s10_pq_codes", _S10_ORACLE)
def s10_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding of the embedding corpus: split
    each vector into PQ_M subspaces, assign each subvector to its
    nearest of PQ_K sub-centroids (squared L2, centroid-id tiebreak),
    and emit the M-byte code plus the exact reconstruction error. PQ
    is THE billion-vector scale path for the s-family — s1's exact
    scan reads 256 bytes/vector, a PQ index reads M bytes and scans
    codes with table lookups (ADC), so the SAME cluster holds 64x the
    corpus; recon_err is the quality number that says how much recall
    that compression will cost (s9 measures it end-to-end). Codebooks
    are seeded deterministically from vec_id < PQ_K (s5's convention:
    replaying a k-means++ RNG across engines buys nothing here);
    refining them is s6's update step per subspace.

    Exactness: every squared distance is a sequential fold over
    doubles - the identical IEEE sequence on both engines - so the
    (d2, cid) argmin selects identically; recon_err sums the M chosen
    distances in subspace order via another sequential fold
    (EXACT_DOUBLE_OK: deterministic scalar chain, never a parallel
    accumulation).

    Scale shape: the subspace fan-out is map-side (explode of M
    slices); the codebook is PQ_M x PQ_K rows broadcast across ONE
    corpus scan (corpus x K scored rows per subspace, never
    corpus^2); the per-(vector, subspace) argmin is a map-side-
    combinable MIN of the (d2, cid) struct - commutative, so Spark's
    partial aggregation absorbs it before the only exchange, which
    carries one row per (vector, subspace). At a billion vectors the
    plan is one scan + one skinny shuffle."""
    emb = fanout(table(spark, sf_dir, "embeddings"))
    v = F.col("embedding").cast("array<double>")
    sub = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice(v, m * PQ_SUB + 1, PQ_SUB).alias("sv"),
                    )
                    for m in range(PQ_M)
                ]
            )
        ).alias("s"),
    ).select("vec_id", F.col("s.m").alias("m"), F.col("s.sv").alias("sv"))
    # PQ_M x PQ_K rows; materialized once so the broadcast side does
    # not re-scan the corpus (r6 shared-subplan discipline, plan-pinned
    # by test_round8_ops.test_s10_argmin_is_mapside_no_window)
    cb = (
        sub.filter(F.col("vec_id") < PQ_K)
        .select("m", F.col("vec_id").alias("cid"), F.col("sv").alias("cv"))
        .localCheckpoint(eager=True)
    )
    scored = sub.join(F.broadcast(cb), "m").select(
        "vec_id", "m", "cid", _d2(F.col("sv"), F.col("cv")).alias("d2")
    )
    best = scored.groupBy("vec_id", "m").agg(
        F.min(F.struct("d2", "cid")).alias("b")
    )
    packed = best.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("m", F.col("b.cid").alias("cid")))),
            lambda s: s.cid,
        ).alias("code"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", F.col("b.d2").alias("d2")))),
                lambda s: s.d2,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("recon_err"),
    )
    return packed.select(
        "vec_id",
        F.col("code")[0].cast("int").alias("c0"),
        F.col("code")[1].cast("int").alias("c1"),
        F.col("code")[2].cast("int").alias("c2"),
        F.col("code")[3].cast("int").alias("c3"),
        "recon_err",
    )


# ---------------------------------------------------------------------------
# hs2 — Maximal Marginal Relevance (MMR) diversified re-ranking
# ---------------------------------------------------------------------------

#: MMR trade-off lambda = MMR_LAM/10 (relevance) vs (10-MMR_LAM)/10
#: (redundancy penalty); kept as integers so the greedy objective
#: 7*rel - 3*maxsim stays on the exact decimal lattice.
MMR_LAM = 7
MMR_K = 5  # results per query after diversification


def _hs2_oracle() -> str:
    """Unrolled greedy MMR as MATERIALIZED CTEs (the pi-family lesson:
    DuckDB inlines CTEs per reference — chained rounds explode without
    MATERIALIZED)."""
    rounds = []
    prev_sel = "sel1"
    for r in range(2, MMR_K + 1):
        rounds.append(f"""
rem{r} AS MATERIALIZED (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM {prev_sel} s
    WHERE s.query_id = c.query_id AND s.vec_id = c.vec_id
  )
),
ms{r} AS MATERIALIZED (
  SELECT r.query_id, r.vec_id, r.rel_l,
         MAX(p.sim_l) AS maxsim
  FROM rem{r} r
  JOIN {prev_sel} s ON s.query_id = r.query_id
  JOIN pairs p ON p.query_id = r.query_id
    AND p.ai = r.vec_id AND p.bi = s.vec_id
  GROUP BY r.query_id, r.vec_id, r.rel_l
),
pick{r} AS MATERIALIZED (
  SELECT query_id, vec_id, rel_l, {r} AS mmr_rank FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id
      ORDER BY {MMR_LAM} * rel_l - {10 - MMR_LAM} * maxsim DESC, vec_id
    ) AS rn
    FROM ms{r}
  ) t WHERE rn = 1
),
sel{r} AS MATERIALIZED (
  SELECT query_id, vec_id, rel_l, mmr_rank FROM {prev_sel}
  UNION ALL
  SELECT query_id, vec_id, rel_l, mmr_rank FROM pick{r}
)""".strip())
        prev_sel = f"sel{r}"
    body = ",\n".join(rounds)
    return f"""
WITH {_SQL_BASE},
scored AS (
  SELECT query_id, e.vec_id,
         {_sql_dot('qv', 'v')} / (qn * nrm) AS cosine
  FROM q, e
  WHERE e.vec_id <> query_id
),
cand AS MATERIALIZED (
  SELECT query_id, vec_id,
         CAST(ROUND(cosine, 9) AS DECIMAL(28,10)) AS rel_l
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
    FROM scored
  ) t WHERE rn <= {TOP_K}
),
pairs AS MATERIALIZED (
  SELECT a.query_id, a.vec_id AS ai, b.vec_id AS bi,
         CAST(ROUND({_sql_dot('ea.v', 'eb.v')} / (ea.nrm * eb.nrm), 9)
              AS DECIMAL(28,10)) AS sim_l
  FROM cand a
  JOIN cand b ON a.query_id = b.query_id AND a.vec_id <> b.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
),
sel1 AS MATERIALIZED (
  SELECT query_id, vec_id, rel_l, 1 AS mmr_rank FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY rel_l DESC, vec_id) AS rn
    FROM cand
  ) t WHERE rn = 1
),
{body}
SELECT query_id, CAST(mmr_rank AS BIGINT) AS mmr_rank, vec_id,
       CAST(rel_l AS DOUBLE) AS relevance
FROM {prev_sel}
"""


@register("hs2_mmr_rerank", _hs2_oracle())
def hs2_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998) of s1's exact top-10 candidates: greedily pick K=5
    results per query maximizing lambda*relevance - (1-lambda)*max
    similarity to anything already picked — THE standard
    diversification pass between retrieval and a RAG context window
    (ten near-identical near-dups of the best hit waste nine slots;
    MMR spends them on coverage).

    Determinism/exactness: relevance and candidate-candidate cosines
    are sequential-fold dot products (bit-identical on both engines)
    ROUNDED onto the 9-decimal lattice and carried as DECIMAL — the
    greedy objective 7*rel - 3*maxsim is exact decimal arithmetic, so
    every argmax (vec_id tiebreak) picks the identical candidate on
    both engines at every round; the oracle unrolls the same greedy
    rounds as MATERIALIZED CTEs (pi-family discipline).

    Scale shape: candidate generation is s1's broadcast-queries single
    corpus scan; everything after runs on the (queries x K) candidate
    table — pair similarities are (queries x K^2) rows, each greedy
    round is a join + window on that bounded frame, and the corpus is
    never touched again (the candidate and pair tables are
    localCheckpointed once). Work per extra query is O(K^2) — at 100 TB
    the corpus term stays exactly one scan."""
    corpus = _corpus(spark, sf_dir)
    cand = (
        s1_knn_bruteforce(spark, sf_dir)
        .select(
            "query_id",
            "vec_id",
            F.round(F.col("cosine"), 9).cast("decimal(28,10)").alias("rel_l"),
        )
        .localCheckpoint(eager=True)
    )
    ea = corpus.select(F.col("vec_id").alias("ai"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    eb = corpus.select(F.col("vec_id").alias("bi"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    ca = cand.select("query_id", F.col("vec_id").alias("ai"))
    cb = cand.select(F.col("query_id").alias("qb"), F.col("vec_id").alias("bi"))
    pairs = (
        ca.join(cb, (F.col("query_id") == F.col("qb")) & (F.col("ai") != F.col("bi")))
        .join(ea, "ai")
        .join(eb, "bi")
        .select(
            "query_id",
            "ai",
            "bi",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 9
            )
            .cast("decimal(28,10)")
            .alias("sim_l"),
        )
        .localCheckpoint(eager=True)
    )
    # The greedy runs on the (N_QUERIES × K)-bounded candidate table —
    # a CONSTANT-size frame (the query set is a fixed sample at every
    # scale) — so it is collected and the argmax rounds run as exact
    # driver-side Decimal arithmetic (pi1/e24/bt1 precedent; was ~50
    # Spark jobs of per-round joins+windows over ≤50-row frames). The
    # corpus-scale work (s1's scan, the pair cosines) stays
    # distributed; decimal(28,10) values collect as exact Decimals.
    from decimal import localcontext

    from bc_proj3_spark.operators.linalg import _dec_to_double

    cand_rows = cand.collect()
    sim = {
        (r["query_id"], r["ai"], r["bi"]): r["sim_l"]
        for r in pairs.collect()
    }
    by_q: dict = {}
    for r in cand_rows:
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["rel_l"]))
    out_rows = []
    with localcontext() as ctx:
        ctx.prec = 50  # exact: operands stay well below 50 digits
        for q in sorted(by_q):
            cands = by_q[q]
            picked = []
            first = min(cands, key=lambda c: (-c[1], c[0]))
            picked.append(first[0])
            out_rows.append((q, 1, first[0], _dec_to_double(first[1])))
            for rank in range(2, MMR_K + 1):
                best = None
                for vid, rel in cands:
                    if vid in picked:
                        continue
                    maxsim = max(sim[(q, vid, b)] for b in picked)
                    obj = MMR_LAM * rel - (10 - MMR_LAM) * maxsim
                    key = (-obj, vid)
                    if best is None or key < best[0]:
                        best = (key, vid, rel)
                if best is None:
                    break
                picked.append(best[1])
                out_rows.append((q, rank, best[1], _dec_to_double(best[2])))
    return local_rows_df(
        spark,
        out_rows,
        "query_id long, mmr_rank long, vec_id long, relevance double",
    )


# ---------------------------------------------------------------------------
# s11 — greedy k-center coreset (farthest-point diversity selection)
# ---------------------------------------------------------------------------

#: coreset size: greedy farthest-point traversal gives the classic
#: 2-approximation to the optimal k-center cover (Gonzalez 1985).
KCENTER_K = 8


def _s11_oracle() -> str:
    """Unrolled greedy rounds as MATERIALIZED CTEs (pi-family lesson).
    Round r keeps, per point, the min cosine-DISTANCE to the selected
    set (9-decimal lattice), then picks the farthest point."""
    dist = f"ROUND(1.0 - {_sql_dot('e.v', 'c.v')} / (e.nrm * c.nrm), 9)"
    ctes = [f"""
d1 AS MATERIALIZED (
  SELECT e.vec_id,
         CAST({dist} AS DECIMAL(28,10)) AS d
  FROM e CROSS JOIN (SELECT v, nrm FROM e WHERE vec_id =
                     (SELECT MIN(vec_id) FROM e)) c
)""".strip()]
    for r in range(2, KCENTER_K + 1):
        ctes.append(f"""
p{r} AS MATERIALIZED (
  SELECT vec_id, d FROM d{r - 1} ORDER BY d DESC, vec_id LIMIT 1
),
d{r} AS MATERIALIZED (
  SELECT e.vec_id,
         LEAST(d{r - 1}.d, CAST({dist} AS DECIMAL(28,10))) AS d
  FROM e
  JOIN d{r - 1} ON d{r - 1}.vec_id = e.vec_id
  CROSS JOIN (SELECT v, nrm FROM e WHERE vec_id = (SELECT vec_id FROM p{r})) c
)""".strip())
    picks = ["SELECT 1 AS center_rank, (SELECT MIN(vec_id) FROM e) AS vec_id, CAST(NULL AS DOUBLE) AS radius"]
    for r in range(2, KCENTER_K + 1):
        picks.append(
            f"SELECT {r}, vec_id, CAST(d AS DOUBLE) FROM p{r}"
        )
    return f"""
WITH {_SQL_BASE},
{",".join(ctes)}
SELECT * FROM ({" UNION ALL ".join(picks)}) t
"""


@register("s11_kcenter_coreset", _s11_oracle())
def s11_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset over the embedding corpus (Gonzalez
    1985 farthest-point traversal, the 2-approximation to optimal
    k-center): start from the lowest vec_id, repeatedly pick the point
    FARTHEST (cosine distance) from everything selected so far. The
    emitted radius sequence is the coverage guarantee itself — after k
    centers, every point sits within radius_k of a center — which is
    the standard diverse-subset/data-pruning primitive (coreset
    selection for training-data budgets, complementing d12's
    redundancy REMOVAL with representativeness SELECTION, cur1's
    ordering, and sp12's importance weighting).

    Determinism/exactness: distances are sequential-fold cosines
    rounded onto the 9-decimal lattice and carried as DECIMAL; every
    argmax ties on vec_id; the min-distance recurrence uses LEAST over
    decimals — both engines walk the identical center sequence. The
    oracle unrolls the same rounds as MATERIALIZED CTEs.

    Scale shape: the selected set never exceeds K rows, so each round
    is ONE map-side pass over the corpus against a 1-row broadcast
    center (the running min-distance column rides along, refreshed via
    localCheckpoint so lineage stays O(1)) plus a TakeOrdered(1) —
    K scans total, the honest cost of greedy k-center, with nothing
    corpus² and nothing driver-side beyond K 1-row picks."""
    corpus = _corpus(spark, sf_dir).localCheckpoint(eager=True)
    seed = corpus.orderBy("vec_id").limit(1).select(
        F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    dec = "decimal(28,10)"

    def dist_to(center):
        return F.round(
            F.lit(1.0)
            - _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn")),
            9,
        ).cast(dec)

    dists = (
        corpus.crossJoin(F.broadcast(seed))
        .select("vec_id", "v", "nrm", dist_to(None).alias("d"))
        .localCheckpoint(eager=True)
    )
    picks = [
        corpus.orderBy("vec_id")
        .limit(1)
        .select(
            F.lit(1).alias("center_rank"),
            "vec_id",
            F.lit(None).cast("double").alias("radius"),
        )
    ]
    for r in range(2, KCENTER_K + 1):
        pick = dists.orderBy(F.col("d").desc(), "vec_id").limit(1)
        picks.append(
            pick.select(
                F.lit(r).alias("center_rank"),
                "vec_id",
                F.col("d").cast("double").alias("radius"),
            )
        )
        center = pick.join(corpus.select(F.col("vec_id").alias("cid"),
                                         F.col("v").alias("cv"),
                                         F.col("nrm").alias("cn")),
                           F.col("vec_id") == F.col("cid")).select("cv", "cn")
        dists = (
            dists.crossJoin(F.broadcast(center))
            .select(
                "vec_id",
                "v",
                "nrm",
                F.least(F.col("d"), dist_to(None)).alias("d"),
            )
            .localCheckpoint(eager=True)
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# hs3 — nDCG@k of the ANN ranking vs the exact ranking (rank-aware s9)
# ---------------------------------------------------------------------------

import math as _math
from decimal import Decimal as _Dec

#: DCG discounts 1/log2(rank+1), computed ONCE in Python and baked as
#: 9-dp decimal literals into BOTH plans — the cross-engine transcendental
#: seam never exists (g9's lattice-LN discipline, taken one step further:
#: the lattice values are compile-time constants here, not data-driven).
_NDCG_W = tuple(f"{1.0 / _math.log2(r + 1):.9f}" for r in range(1, TOP_K + 1))

#: Ideal DCG: the exact top-k always contributes grades TOP_K..1 in rank
#: order, so IDCG is a per-geometry constant — exact decimal arithmetic
#: in Python, emitted as one double literal shared by both plans.
_NDCG_IDCG = float(sum(_Dec(w) * (TOP_K - i) for i, w in enumerate(_NDCG_W)))

_NDCG_W_CASE = (
    "CASE ann_rn "
    + " ".join(
        f"WHEN {r + 1} THEN CAST({w} AS DECIMAL(28,10))"
        for r, w in enumerate(_NDCG_W)
    )
    + " ELSE CAST(0 AS DECIMAL(28,10)) END"
)

_HS3_ORACLE = f"""
WITH {_SQL_BASE},
ex_scored AS (
  SELECT query_id, e.vec_id,
         {_sql_dot('qv', 'v')} / (qn * nrm) AS cosine
  FROM q, e
  WHERE e.vec_id <> query_id
),
exact AS (
  SELECT query_id, vec_id, rn FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
    FROM ex_scored
  ) t WHERE rn <= {TOP_K}
),
cb AS MATERIALIZED ({_sql_bucket_union('e', 'vec_id')}),
qb AS (SELECT vec_id AS query_id, t, bkt FROM cb WHERE vec_id < {N_QUERIES}),
cand AS (
  SELECT DISTINCT qb.query_id, cb.vec_id
  FROM qb JOIN cb ON qb.t = cb.t AND qb.bkt = cb.bkt
  WHERE cb.vec_id <> qb.query_id
),
ann_scored AS (
  SELECT c.query_id, c.vec_id,
         {_sql_dot('q.qv', 'e.v')} / (q.qn * e.nrm) AS cosine
  FROM cand c
  JOIN q ON q.query_id = c.query_id
  JOIN e ON e.vec_id = c.vec_id
),
ann AS (
  SELECT query_id, vec_id, rn AS ann_rn FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
    FROM ann_scored
  ) t WHERE rn <= {TOP_K}
),
j AS (
  SELECT x.query_id, {TOP_K} + 1 - x.rn AS grade, a.ann_rn
  FROM exact x LEFT JOIN ann a
    ON a.query_id = x.query_id AND a.vec_id = x.vec_id
)
SELECT query_id,
       CAST(SUM(CASE WHEN ann_rn IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_rel_found,
       CAST(SUM(grade * ({_NDCG_W_CASE})) AS DOUBLE) AS dcg,
       CAST(SUM(grade * ({_NDCG_W_CASE})) AS DOUBLE) / {_NDCG_IDCG!r} AS ndcg
FROM j GROUP BY query_id
"""


@register("hs3_ndcg_eval", _HS3_ORACLE)
def hs3_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-aware retrieval quality: per query, nDCG@k of s2's LSH ANN
    ranking against s1's exact cosine top-k, with graded relevance
    grade = k+1-exact_rank. s9's recall says WHETHER the ANN funnel
    finds the right neighbors; nDCG says whether it puts the best ones
    FIRST — the number that moves when bucket collisions reorder the
    head of the list, which recall@k is blind to. Together they are the
    standard eval pair for any retrieval stack (RAG context selection,
    hard-negative mining, semantic dedup candidates).

    Exactness: cosines use the module's sequential-fold arithmetic
    (bit-identical across engines, vec_id tiebreaks); DCG is a sum of
    exact integer grades times compile-time 9-dp decimal discount
    literals — the 1/log2 values are baked identically into both plans,
    so there is NO transcendental evaluated by either engine; IDCG is a
    per-geometry Python constant; nDCG is one IEEE division of
    identical doubles.

    Scale shape: identical to s9 (one persisted corpus projection feeds
    the brute-force ground truth over ~1e3 sampled queries and the
    (table, bucket) equi-join ANN side; the two (queries × k) ranked
    lists are localCheckpointed so the final join + aggregate never
    re-triggers either search). The DCG aggregate adds zero shuffles:
    it reuses the same per-query groupBy the recall monitor pays for."""
    corpus = _corpus(spark, sf_dir).persist()
    q = _queries(corpus)
    ex_scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias(
                "cosine"
            ),
        )
    )
    exact = _ranked(ex_scored, "rn").localCheckpoint(eager=True)

    cb = _bucketed(corpus)
    qb = cb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "t", "bkt"
    )
    cand = (
        qb.join(cb, ["t", "bkt"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    ann_scored = (
        cand.join(q, "query_id")
        .join(corpus.select("vec_id", "v", "nrm"), "vec_id")
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias(
                "cosine"
            ),
        )
    )
    ann = _ranked(ann_scored, "ann_rn").localCheckpoint(eager=True)

    j = exact.join(ann, ["query_id", "vec_id"], "left").select(
        "query_id",
        (F.lit(TOP_K + 1) - F.col("rn")).alias("grade"),
        "ann_rn",
    )
    hit = F.when(F.col("ann_rn").isNotNull(), 1).otherwise(0)
    term = F.col("grade") * F.expr(_NDCG_W_CASE)
    return j.groupBy("query_id").agg(
        F.sum(hit).cast("bigint").alias("n_rel_found"),
        F.sum(term).cast("double").alias("dcg"),
        (F.sum(term).cast("double") / F.lit(_NDCG_IDCG)).alias("ndcg"),
    )


# ---------------------------------------------------------------------------
# s12 — agglomerative dendrogram over the k-means sketch
# ---------------------------------------------------------------------------

MERGE_ROUNDS = 4  # dendrogram merges reported (of KMEANS_K-1 possible)


def _s12_oracle() -> str:
    steps = [f"""{_SQL_BASE},
cent AS (
  SELECT vec_id AS centroid_id, v AS cv, nrm AS cn FROM e
  WHERE vec_id < {KMEANS_K}
),
scored AS (
  SELECT e.vec_id, centroid_id,
         {_sql_dot('cv', 'v')} / (cn * nrm) AS cosine
  FROM e, cent
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY cosine DESC, centroid_id) AS rn
    FROM scored
  ) t WHERE rn = 1
),
act0 AS MATERIALIZED (
  SELECT centroid_id AS rep, CAST(COUNT(*) AS BIGINT) AS n
  FROM assign GROUP BY 1
),
pairs AS MATERIALIZED (
  SELECT a.centroid_id AS a, b.centroid_id AS b,
         {_sql_d2('a.cv', 'b.cv')} AS d2
  FROM cent a JOIN cent b ON a.centroid_id < b.centroid_id
)"""]
    rows = []
    for r in range(1, MERGE_ROUNDS + 1):
        p = r - 1
        steps.append(f"""best{r} AS MATERIALIZED (
  SELECT a, b, d2 FROM pairs
  WHERE a IN (SELECT rep FROM act{p}) AND b IN (SELECT rep FROM act{p})
  ORDER BY d2, a, b LIMIT 1
),
act{r} AS MATERIALIZED (
  SELECT rep,
         CASE WHEN rep = (SELECT a FROM best{r})
              THEN n + (SELECT n FROM act{p}
                        WHERE rep = (SELECT b FROM best{r}))
              ELSE n END AS n
  FROM act{p} WHERE rep <> (SELECT b FROM best{r})
)""")
        rows.append(
            f"SELECT {r} AS round,"
            f" (SELECT a FROM best{r}) AS rep_kept,"
            f" (SELECT b FROM best{r}) AS rep_merged,"
            f" (SELECT d2 FROM best{r}) AS d2,"
            f" (SELECT CAST(n AS BIGINT) FROM act{r}"
            f"   WHERE rep = (SELECT a FROM best{r})) AS n_members"
        )
    return (
        "WITH "
        + ",\n".join(steps)
        + "\nSELECT CAST(round AS INTEGER) AS round,"
        " CAST(rep_kept AS BIGINT) AS rep_kept,"
        " CAST(rep_merged AS BIGINT) AS rep_merged, d2, n_members FROM ("
        + " UNION ALL ".join(rows)
        + ") dendro"
    )


@register("s12_centroid_dendrogram", _s12_oracle())
def s12_centroid_dendrogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agglomerative dendrogram over the k-means SKETCH: starting from
    s5's K clusters, repeatedly merge the two whose representatives are
    closest (squared L2; the merged cluster keeps the lower-id
    representative) and report (round, kept, merged, distance, merged
    size). This is the standard scale recipe for hierarchical
    clustering — BIRCH/hierarchical-over-kmeans: the corpus only ever
    pays the flat assignment pass; the hierarchy is algebra on the
    K-row sketch. The dendrogram's distance column is the knee plot
    that picks the REAL cluster count k* <= K, and the merge order is
    the taxonomy browsers show.

    Exactness: pairwise distances are the module's sequential-fold IEEE
    arithmetic (bit-identical in both engines) computed ONCE over the
    K(K-1)/2 representative pairs; each merge is an exact
    (d2, a, b) order statistic; member counts are exact integers summed
    through merges. The oracle unrolls the same MERGE_ROUNDS steps as
    MATERIALIZED CTEs (pi2's lesson).

    Scale shape: two corpus-scale jobs only — the broadcast-centroid
    assignment (s5's plan) reduced to K member counts, and the K² pair
    table (bounded by K, not the corpus). The merge loop runs on K+28
    collected rows driver-side (the Bloom-literal bounded-collect
    precedent: at ANY corpus size this is K(K+1)/2 numbers — what a
    coordinator holds anyway)."""
    sizes = {
        r["centroid_id"]: r["n"]
        for r in s5_kmeans_assign(spark, sf_dir)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    }
    corpus = _corpus(spark, sf_dir)
    cent = corpus.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    a, b = cent.alias("a"), cent.alias("b")
    pair_rows = (
        a.join(b, F.col("a.cid") < F.col("b.cid"))
        .select(
            F.col("a.cid").alias("a"),
            F.col("b.cid").alias("b"),
            _d2(F.col("a.cv"), F.col("b.cv")).alias("d2"),
        )
        .collect()
    )
    active = {cid: int(n) for cid, n in sizes.items()}
    pairs = [(r["d2"], r["a"], r["b"]) for r in pair_rows]
    out = []
    for rnd in range(1, MERGE_ROUNDS + 1):
        eligible = [p for p in pairs if p[1] in active and p[2] in active]
        if not eligible:
            # degenerate sketch (< 2 active clusters): the oracle's
            # scalar subqueries go NULL and its active set collapses —
            # mirror both instead of crashing on min() of empty
            active = {}
            out.append((rnd, None, None, None, None))
            continue
        d2, ka, kb = min(eligible)
        active[ka] += active.pop(kb)
        out.append((rnd, int(ka), int(kb), float(d2), int(active[ka])))
    return local_rows_df(
        spark,
        out,
        "round int, rep_kept long, rep_merged long, d2 double,"
        " n_members long",
    )


# ---------------------------------------------------------------------------
# hs4 — MAP@k of the ANN ranking vs the exact ranking (order-sensitive s9)
# ---------------------------------------------------------------------------

#: Precision weights 1/i for ranks 1..k, baked as 9-dp decimal literals
#: into BOTH plans (hs3's compile-time-lattice discipline) so neither
#: engine ever divides by the rank: AP terms are hits_i * (1/i) in exact
#: DECIMAL, summed order-free.
_MAP_W = tuple(f"{1.0 / r:.9f}" for r in range(1, TOP_K + 1))

_MAP_W_CASE = (
    "CASE ann_rn "
    + " ".join(
        f"WHEN {r + 1} THEN CAST({w} AS DECIMAL(28,10))"
        for r, w in enumerate(_MAP_W)
    )
    + " ELSE CAST(0 AS DECIMAL(28,10)) END"
)

_HS4_ORACLE = f"""
WITH {_SQL_BASE},
ex_scored AS (
  SELECT query_id, e.vec_id,
         {_sql_dot('qv', 'v')} / (qn * nrm) AS cosine
  FROM q, e
  WHERE e.vec_id <> query_id
),
exact AS (
  SELECT query_id, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
    FROM ex_scored
  ) t WHERE rn <= {TOP_K}
),
ex_cnt AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel FROM exact GROUP BY 1
),
cb AS MATERIALIZED ({_sql_bucket_union('e', 'vec_id')}),
qb AS (SELECT vec_id AS query_id, t, bkt FROM cb WHERE vec_id < {N_QUERIES}),
cand AS (
  SELECT DISTINCT qb.query_id, cb.vec_id
  FROM qb JOIN cb ON qb.t = cb.t AND qb.bkt = cb.bkt
  WHERE cb.vec_id <> qb.query_id
),
ann_scored AS (
  SELECT c.query_id, c.vec_id,
         {_sql_dot('q.qv', 'e.v')} / (q.qn * e.nrm) AS cosine
  FROM cand c
  JOIN q ON q.query_id = c.query_id
  JOIN e ON e.vec_id = c.vec_id
),
ann AS (
  SELECT query_id, vec_id, rn AS ann_rn FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
    FROM ann_scored
  ) t WHERE rn <= {TOP_K}
),
j AS (
  SELECT a.query_id, a.ann_rn,
         CASE WHEN x.vec_id IS NOT NULL THEN 1 ELSE 0 END AS rel
  FROM ann a LEFT JOIN exact x
    ON x.query_id = a.query_id AND x.vec_id = a.vec_id
),
rp AS (
  SELECT query_id, ann_rn, rel,
         CAST(SUM(rel) OVER (
           PARTITION BY query_id ORDER BY ann_rn
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hits
  FROM j
)
SELECT rp.query_id,
       CAST(SUM(rel) AS BIGINT) AS n_rel_found,
       ANY_VALUE(n_rel) AS n_rel,
       CAST(SUM(CAST(rel * hits AS DECIMAL(2,0)) * ({_MAP_W_CASE}))
            AS DOUBLE)
         / ANY_VALUE(n_rel) AS ap
FROM rp JOIN ex_cnt ON ex_cnt.query_id = rp.query_id
GROUP BY rp.query_id
"""


@register("hs4_map_eval", _HS4_ORACLE)
def hs4_map_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-average-precision@k of s2's LSH ANN ranking against s1's
    exact cosine top-k — the third leg of the retrieval-eval stool:
    s9's recall counts the right neighbors anywhere in the list, hs3's
    nDCG grades the whole ordering with graded relevance, AP@k is the
    binary-relevance order-sensitive score (the mean of precision at
    every hit position) that IR evaluations report when relevance has
    no grades. A funnel change can hold recall flat while AP drops —
    exactly the regression a RAG context-selection stack cares about.

    Exactness: cosines use the module's sequential-fold arithmetic
    (bit-identical, vec_id tiebreaks); the running hit count is exact
    integers over the same total order on both engines; precision
    weights 1/i are compile-time 9-dp decimal literals (hs3's
    discipline — no engine divides by the rank), so the AP numerator
    is an order-free exact DECIMAL sum; AP itself is ONE IEEE division
    by the exact relevant-set size.

    Scale shape: identical to s9/hs3 — one persisted corpus projection
    feeds both the brute-force ground truth over the sampled queries
    and the (table, bucket) equi-join candidate side; the two
    (queries × k) ranked lists are localCheckpointed so the final join
    + window + aggregate runs on k·|queries| rows however big the
    corpus is."""
    corpus = _corpus(spark, sf_dir).persist()
    q = _queries(corpus)
    ex_scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias(
                "cosine"
            ),
        )
    )
    exact = _ranked(ex_scored, "rn").localCheckpoint(eager=True)
    ex_cnt = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rel")
    )

    cb = _bucketed(corpus)
    qb = cb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "t", "bkt"
    )
    cand = (
        qb.join(cb, ["t", "bkt"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    ann_scored = (
        cand.join(q, "query_id")
        .join(corpus.select("vec_id", "v", "nrm"), "vec_id")
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias(
                "cosine"
            ),
        )
    )
    ann = _ranked(ann_scored, "ann_rn").localCheckpoint(eager=True)

    j = ann.join(
        exact.withColumnRenamed("rn", "ex_rn"),
        ["query_id", "vec_id"],
        "left",
    ).select(
        "query_id",
        "ann_rn",
        F.when(F.col("ex_rn").isNotNull(), 1).otherwise(0).alias("rel"),
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy("ann_rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rp = j.select(
        "query_id",
        "ann_rn",
        "rel",
        F.sum("rel").over(w).cast("bigint").alias("hits"),
    )
    # rel*hits <= k collapses to DECIMAL(2,0) so the product with the
    # (28,10) weight stays inside 38 digits — Spark would otherwise
    # shrink the result scale to 6 and silently round the lattice
    term = (F.col("rel") * F.col("hits")).cast("decimal(2,0)") * F.expr(
        _MAP_W_CASE
    )
    return (
        rp.join(ex_cnt, "query_id")
        .groupBy("query_id")
        .agg(
            F.sum("rel").cast("bigint").alias("n_rel_found"),
            F.any_value(F.col("n_rel")).alias("n_rel"),
            (
                F.sum(term).cast("double") / F.any_value(F.col("n_rel"))
            ).alias("ap"),
        )
    )


# ---------------------------------------------------------------------------
# hs5 — MRR@k of the ANN ranking vs the exact ranking (first-hit s9)
# ---------------------------------------------------------------------------

#: Reciprocal-rank literals 1/r at 9 dp (hs4's weights, reused): the
#: lookup is a compile-time CASE on the first relevant rank — neither
#: engine ever divides by a rank.
_MRR_CASE = (
    "CASE first_rel_rank "
    + " ".join(
        f"WHEN {r + 1} THEN CAST({w} AS DECIMAL(28,10))"
        for r, w in enumerate(_MAP_W)
    )
    + " ELSE CAST(0 AS DECIMAL(28,10)) END"
)

_HS5_ORACLE = f"""
WITH {_SQL_BASE},
ex_scored AS (
  SELECT query_id, e.vec_id,
         {_sql_dot('qv', 'v')} / (qn * nrm) AS cosine
  FROM q, e
  WHERE e.vec_id <> query_id
),
exact AS (
  SELECT query_id, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
    FROM ex_scored
  ) t WHERE rn <= {TOP_K}
),
cb AS MATERIALIZED ({_sql_bucket_union('e', 'vec_id')}),
qb AS (SELECT vec_id AS query_id, t, bkt FROM cb WHERE vec_id < {N_QUERIES}),
cand AS (
  SELECT DISTINCT qb.query_id, cb.vec_id
  FROM qb JOIN cb ON qb.t = cb.t AND qb.bkt = cb.bkt
  WHERE cb.vec_id <> qb.query_id
),
ann_scored AS (
  SELECT c.query_id, c.vec_id,
         {_sql_dot('q.qv', 'e.v')} / (q.qn * e.nrm) AS cosine
  FROM cand c
  JOIN q ON q.query_id = c.query_id
  JOIN e ON e.vec_id = c.vec_id
),
ann AS (
  SELECT query_id, vec_id, rn AS ann_rn FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
    FROM ann_scored
  ) t WHERE rn <= {TOP_K}
),
j AS (
  SELECT x.query_id, a.ann_rn
  FROM exact x LEFT JOIN ann a
    ON a.query_id = x.query_id AND a.vec_id = x.vec_id
),
agg AS (
  SELECT query_id, MIN(ann_rn) AS first_rel_rank FROM j GROUP BY query_id
)
SELECT query_id, first_rel_rank,
       CAST({_MRR_CASE} AS DOUBLE) AS rr
FROM agg
"""


@register("hs5_mrr_eval", _HS5_ORACLE)
def hs5_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-reciprocal-rank@k of s2's LSH ANN ranking against s1's
    exact cosine top-k — the fourth retrieval-eval leg: s9's recall
    counts hits anywhere, hs3's nDCG grades the whole ordering, hs4's
    AP averages precision over every hit, MRR isolates the HEAD — how
    high does the first truly-relevant neighbor sit. The single-answer
    retrieval regimes (RAG with one context slot, dedup
    first-candidate verify) live and die on this number; a funnel can
    hold recall and even AP while the first hit slips from rank 1 to
    rank 4.

    Exactness: cosines use the module's sequential-fold arithmetic
    (bit-identical, vec_id tiebreaks); the first relevant rank is an
    exact integer MIN over the shared total order; the reciprocal is a
    compile-time 9-dp decimal literal looked up by rank (hs4's weight
    lattice — no engine divides), cast once to double; queries whose
    relevant set is entirely missed by the funnel report rank NULL and
    rr = 0 on both engines.

    Scale shape: identical to s9/hs3/hs4 — one persisted corpus
    projection feeds the brute-force ground truth over the sampled
    queries and the (table, bucket) equi-join ANN side; the final
    left-join + MIN aggregate runs on k·|queries| rows regardless of
    corpus size."""
    corpus = _corpus(spark, sf_dir).persist()
    q = _queries(corpus)
    ex_scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias(
                "cosine"
            ),
        )
    )
    exact = _ranked(ex_scored, "rn").localCheckpoint(eager=True)

    cb = _bucketed(corpus)
    qb = cb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "t", "bkt"
    )
    cand = (
        qb.join(cb, ["t", "bkt"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    ann_scored = (
        cand.join(q, "query_id")
        .join(corpus.select("vec_id", "v", "nrm"), "vec_id")
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias(
                "cosine"
            ),
        )
    )
    ann = _ranked(ann_scored, "ann_rn").localCheckpoint(eager=True)

    return (
        exact.join(ann, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(F.min("ann_rn").alias("first_rel_rank"))
        .select(
            "query_id",
            "first_rel_rank",
            F.expr(_MRR_CASE).cast("double").alias("rr"),
        )
    )


# ---------------------------------------------------------------------------
# s13 — dimension-ablation recall (Matryoshka-style truncation eval)
# ---------------------------------------------------------------------------

ABLATE_DIM = DIM // 2  # retrieval with only the leading half of each vector


_S13_ORACLE = f"""
WITH {_SQL_BASE},
et AS (
  SELECT vec_id, v[1:{ABLATE_DIM}] AS tv,
         {_sql_norm(f'v[1:{ABLATE_DIM}]')} AS tnrm
  FROM e
),
qt AS (
  SELECT vec_id AS query_id, tv AS qtv, tnrm AS qtn FROM et
  WHERE vec_id < {N_QUERIES}
),
full_scored AS (
  SELECT query_id, e.vec_id,
         {_sql_dot('qv', 'v')} / (qn * nrm) AS cosine
  FROM q, e
  WHERE e.vec_id <> query_id
),
full_topk AS (
  SELECT query_id, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
    FROM full_scored
  ) t WHERE rn <= {TOP_K}
),
trunc_scored AS (
  SELECT query_id, et.vec_id,
         {_sql_dot('qtv', 'tv')} / (qtn * tnrm) AS cosine
  FROM qt, et
  WHERE et.vec_id <> query_id
),
trunc_topk AS (
  SELECT query_id, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
    FROM trunc_scored
  ) t WHERE rn <= {TOP_K}
)
SELECT f.query_id,
       CAST(COUNT(t.vec_id) AS BIGINT) AS n_overlap,
       CAST(COUNT(t.vec_id) AS DOUBLE) / {TOP_K} AS recall
FROM full_topk f
LEFT JOIN trunc_topk t
  ON t.query_id = f.query_id AND t.vec_id = f.vec_id
GROUP BY f.query_id
"""


@register("s13_dim_ablation_recall", _S13_ORACLE)
def s13_dim_ablation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-ablation retrieval eval: recall@k of cosine search
    using only the LEADING {ABLATE_DIM} of {DIM} embedding dimensions
    against the full-width exact top-k — the evaluation behind
    Matryoshka-style truncatable embeddings and every
    "can we store half the vector" capacity decision. A pipeline that
    ships truncated vectors without this number is guessing at its
    recall budget; run per release, the trend catches embedding-model
    drift that concentrates signal in late dimensions.

    Exactness: both rankings use the module's sequential-fold cosine
    (bit-identical across engines, vec_id tiebreaks); the truncated
    side re-derives its own norms over the slice (never a rescale of
    the full norm); overlap is an exact integer count and recall is
    ONE IEEE division by the compile-time k.

    Scale shape: s1's bounded brute-force shape twice — the query set
    is {N_QUERIES} broadcast rows against one corpus scan per ranking
    (the slice projects the scan to half width; column pruning keeps
    the full vector out of the truncated side); the final join +
    aggregate runs on k·|queries| rows regardless of corpus size."""
    corpus = _corpus(spark, sf_dir).persist()
    tv = F.slice(F.col("v"), 1, ABLATE_DIM)
    trunc = corpus.select(
        "vec_id", tv.alias("tv"), _norm(tv).alias("tnrm")
    )
    q = _queries(corpus)
    qt = trunc.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("tv").alias("qtv"),
        F.col("tnrm").alias("qtn"),
    )
    full_scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias(
                "cosine"
            ),
        )
    )
    full_topk = _ranked(full_scored, "rn").localCheckpoint(eager=True)
    trunc_scored = (
        trunc.crossJoin(F.broadcast(qt))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (
                _dot(F.col("qtv"), F.col("tv"))
                / (F.col("qtn") * F.col("tnrm"))
            ).alias("cosine"),
        )
    )
    trunc_topk = _ranked(trunc_scored, "t_rn").localCheckpoint(eager=True)
    return (
        full_topk.join(
            trunc_topk.select(
                "query_id", F.col("vec_id").alias("t_vec")
            ).withColumnRenamed("t_vec", "vec_id")
            .select("query_id", "vec_id", F.lit(1).alias("hit")),
            ["query_id", "vec_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("hit").cast("bigint").alias("n_overlap"),
            (F.count("hit").cast("double") / F.lit(TOP_K)).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# s14 — PQ-ADC retrieval recall vs the exact L2 top-k (s10's end-to-end)
# ---------------------------------------------------------------------------

_S14_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
sub AS (
  SELECT vec_id, m.m AS m, v[m.m * {PQ_SUB} + 1 : (m.m + 1) * {PQ_SUB}] AS sv
  FROM e, (SELECT unnest(range(0, {PQ_M})) AS m) m
),
cb AS (
  SELECT m, vec_id AS cid, sv AS cv FROM sub WHERE vec_id < {PQ_K}
),
assigned AS (
  SELECT vec_id, m, cid FROM (
    SELECT s.vec_id, s.m, cb.cid,
           ROW_NUMBER() OVER (
             PARTITION BY s.vec_id, s.m
             ORDER BY {_sql_d2('s.sv', 'cb.cv')}, cb.cid) AS rn
    FROM sub s JOIN cb ON s.m = cb.m
  ) t WHERE rn = 1
),
qsub AS (
  SELECT vec_id AS query_id, m, sv AS qsv FROM sub
  WHERE vec_id < {N_QUERIES}
),
adc_terms AS (
  SELECT q.query_id, a.vec_id, a.m, {_sql_d2('q.qsv', 'cb.cv')} AS term
  FROM assigned a
  JOIN cb ON cb.m = a.m AND cb.cid = a.cid
  JOIN qsub q ON q.m = a.m
  WHERE a.vec_id <> q.query_id
),
adc AS (
  SELECT query_id, vec_id,
         list_reduce(list(term ORDER BY m), (acc, x) -> acc + x) AS adc_d2
  FROM adc_terms GROUP BY query_id, vec_id
),
adc_topk AS (
  SELECT query_id, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY adc_d2, vec_id) AS rn
    FROM adc
  ) t WHERE rn <= {TOP_K}
),
q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}
),
exact_topk AS (
  SELECT query_id, vec_id FROM (
    SELECT q.query_id, e.vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY {_sql_d2('q.qv', 'e.v')}, e.vec_id) AS rn
    FROM q, e WHERE e.vec_id <> q.query_id
  ) t WHERE rn <= {TOP_K}
)
SELECT x.query_id,
       CAST(COUNT(a.vec_id) AS BIGINT) AS n_overlap,
       CAST(COUNT(a.vec_id) AS DOUBLE) / {TOP_K} AS recall
FROM exact_topk x
LEFT JOIN adc_topk a
  ON a.query_id = x.query_id AND a.vec_id = x.vec_id
GROUP BY x.query_id
"""


@register("s14_pq_adc_recall", _S14_ORACLE)
def s14_pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end quality of the PQ compression path: recall@k of
    asymmetric-distance (ADC) retrieval — the query stays full-width,
    every corpus vector is replaced by its s10 code's sub-centroids,
    distance = sum of per-subspace squared L2 to the assigned centroid
    — against the exact full-width L2 top-k. s10's recon_err says how
    lossy the codes are geometrically; s14 says what that loss COSTS
    in retrieval, which is the number that decides whether an M-byte
    code can replace a 256-byte vector at a billion rows. Completes
    the compression-eval pair the way s9/hs3/hs4/hs5 complete the
    LSH-funnel eval.

    Exactness: subspace assignment replays s10's exact (d2, cid)
    argmin; every ADC term is the module's sequential-fold d2
    (bit-identical IEEE); the per-(query, vector) sum folds the M
    terms IN SUBSPACE ORDER (s10's recon_err discipline — an ordered
    list fold, never a parallel double sum); both top-k rankings break
    ties by vec_id; recall is ONE IEEE division by the compile-time k.

    Scale shape: the codebook is PQ_M x PQ_K rows broadcast over one
    corpus-wide assignment pass (s10's plan); ADC scoring fans each
    assigned row out by the {N_QUERIES} broadcast query slices —
    corpus x M x |queries| skinny rows, linear in the corpus with
    bounded query sets; the final aggregates are k·|queries| rows."""
    emb = fanout(table(spark, sf_dir, "embeddings"))
    v = F.col("embedding").cast("array<double>")
    e = emb.select("vec_id", v.alias("v"))
    sub = e.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice(F.col("v"), m * PQ_SUB + 1, PQ_SUB).alias(
                            "sv"
                        ),
                    )
                    for m in range(PQ_M)
                ]
            )
        ).alias("s"),
    ).select("vec_id", F.col("s.m").alias("m"), F.col("s.sv").alias("sv"))
    cb = (
        sub.filter(F.col("vec_id") < PQ_K)
        .select("m", F.col("vec_id").alias("cid"), F.col("sv").alias("cv"))
        .localCheckpoint(eager=True)
    )
    assigned = (
        sub.join(F.broadcast(cb), "m")
        .select(
            "vec_id", "m", "cid",
            _d2(F.col("sv"), F.col("cv")).alias("d2"),
        )
        .groupBy("vec_id", "m")
        .agg(F.min(F.struct("d2", "cid")).alias("b"))
        .select("vec_id", "m", F.col("b.cid").alias("cid"))
    )
    qsub = sub.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "m", F.col("sv").alias("qsv")
    )
    adc_terms = (
        assigned.join(F.broadcast(cb), ["m", "cid"])
        .join(F.broadcast(qsub), "m")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id", "m",
            _d2(F.col("qsv"), F.col("cv")).alias("term"),
        )
    )
    adc = adc_terms.groupBy("query_id", "vec_id").agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("m", F.col("term").alias("t")))
                ),
                lambda s: s.t,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("adc_d2")
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("vec_id").asc()
    )
    adc_topk = (
        adc.withColumn("rn", F.row_number().over(w_adc))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "vec_id")
        .localCheckpoint(eager=True)
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    ex_scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            _d2(F.col("qv"), F.col("v")).alias("d2"),
        )
    )
    w_ex = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("vec_id").asc()
    )
    exact_topk = (
        ex_scored.withColumn("rn", F.row_number().over(w_ex))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "vec_id")
        .localCheckpoint(eager=True)
    )
    return (
        exact_topk.join(
            adc_topk.select("query_id", "vec_id", F.lit(1).alias("hit")),
            ["query_id", "vec_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("hit").cast("bigint").alias("n_overlap"),
            (F.count("hit").cast("double") / F.lit(TOP_K)).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# s15 — IVF probe-count tuning curve: recall@k per nprobe
# ---------------------------------------------------------------------------

#: probe counts swept by s15; max must not exceed the label cardinality
IVF_PROBE_SWEEP = (1, 2, 4, 8)

_S15_ORACLE = f"""
WITH {_SQL_BASE},
ex_scored AS (
  SELECT query_id, e.vec_id,
         {_sql_dot('qv', 'v')} / (qn * nrm) AS cosine
  FROM q, e
  WHERE e.vec_id <> query_id
),
exact AS (
  SELECT query_id, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
    FROM ex_scored
  ) t WHERE rn <= {TOP_K}
),
cent AS (
  SELECT label, list(cx ORDER BY i) AS c FROM (
    SELECT label, i, AVG(v[i]) AS cx
    FROM e, (SELECT unnest(generate_series(1, {DIM})) AS i) dims
    GROUP BY label, i
  ) percoord
  GROUP BY label
),
centn AS (SELECT label, c, {_sql_norm('c')} AS cn FROM cent),
probe AS (
  SELECT query_id, label, rn AS rn_label FROM (
    SELECT q.query_id, centn.label,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY {_sql_dot('q.qv', 'centn.c')} / (q.qn * centn.cn) DESC,
                      centn.label) AS rn
    FROM q, centn
  ) r WHERE rn <= {max(IVF_PROBE_SWEEP)}
),
scored AS (
  SELECT p.query_id, p.rn_label, e.vec_id,
         {_sql_dot('q.qv', 'e.v')} / (q.qn * e.nrm) AS cosine
  FROM probe p
  JOIN q ON q.query_id = p.query_id
  JOIN e ON e.label = p.label
  WHERE e.vec_id <> p.query_id
),
fan AS (
  SELECT pr.n_probe, s.query_id, s.vec_id, s.cosine
  FROM scored s
  JOIN (SELECT unnest({list(IVF_PROBE_SWEEP)}) AS n_probe) pr
    ON pr.n_probe >= s.rn_label
),
ann AS (
  SELECT n_probe, query_id, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY n_probe, query_id
      ORDER BY cosine DESC, vec_id) AS rn
    FROM fan
  ) t WHERE rn <= {TOP_K}
),
j AS (
  SELECT pr.n_probe, x.query_id, x.vec_id,
         CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM exact x
  JOIN (SELECT unnest({list(IVF_PROBE_SWEEP)}) AS n_probe) pr ON TRUE
  LEFT JOIN ann a ON a.n_probe = pr.n_probe
    AND a.query_id = x.query_id AND a.vec_id = x.vec_id
)
SELECT CAST(n_probe AS INTEGER) AS n_probe,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(SUM(hit) AS BIGINT) AS n_hits,
       CAST(SUM(hit) AS DOUBLE) / COUNT(*) AS recall_at_k
FROM j GROUP BY n_probe
"""


@register("s15_ivf_recall_curve", _S15_ORACLE)
def s15_ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF tuning curve: recall@k of s4's partition-probe retrieval
    against s1's exact top-k, swept over nprobe ∈ {IVF_PROBE_SWEEP} —
    the capacity-planning table every IVF deployment reads before
    picking its probe count (recall rises with nprobe while cost is
    ∝ nprobe/nlist of the corpus; the knee of this curve IS the
    configuration decision). s9 monitors ONE configured funnel; s15
    maps the whole trade-off.

    Exactness: centroid ranks and candidate cosines use the module's
    sequential-fold arithmetic with label/vec_id tiebreaks (bit-
    identical cross-engine); recall is a single IEEE division of exact
    integers (EXACT_DOUBLE_OK — no ROUND-tie seam).

    Scale shape: the probed-label candidates are scored ONCE at the
    largest swept nprobe (smaller probe sets are prefixes of the
    centroid ranking), then the sweep fans out MAP-SIDE — each
    candidate row joins the probe counts that admit it (≤ |sweep|
    copies of a (query × probed-partition) intermediate, never the
    corpus). The ground-truth side is s9's sampled brute-force pass;
    both ranked lists are (queries × k)-bounded. At 100 TB: one
    brute-force pass over the sampled queries + one nprobe_max-probe
    pass — the sweep itself costs one small fan-out, not |sweep|
    searches."""
    corpus = _corpus(spark, sf_dir).persist()
    q = _queries(corpus)
    ex_scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (
                _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
            ).alias("cosine"),
        )
    )
    exact = _ranked(ex_scored, "rn").localCheckpoint(eager=True)

    cent = (
        corpus.select("label", F.posexplode("v").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.avg("x").alias("cx"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "cx"))),
                lambda s: s.cx,
            ).alias("c")
        )
    )
    centn = cent.select("label", "c", _norm(F.col("c")).alias("cn"))
    wp = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("label"))
    probe = (
        q.crossJoin(F.broadcast(centn))
        .select(
            "query_id",
            "label",
            (
                _dot(F.col("qv"), F.col("c")) / (F.col("qn") * F.col("cn"))
            ).alias("csim"),
        )
        .withColumn("rn_label", F.row_number().over(wp))
        .filter(F.col("rn_label") <= max(IVF_PROBE_SWEEP))
        .select("query_id", "label", "rn_label")
    )
    scored = (
        probe.join(q, "query_id")
        .join(corpus, "label")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "rn_label",
            "vec_id",
            (
                _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
            ).alias("cosine"),
        )
    )
    probes_arr = F.array(*[F.lit(p) for p in IVF_PROBE_SWEEP])
    fan = scored.select(
        F.explode(probes_arr).alias("n_probe"),
        "query_id",
        "rn_label",
        "vec_id",
        "cosine",
    ).filter(F.col("n_probe") >= F.col("rn_label"))
    wk = Window.partitionBy("n_probe", "query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    ann = (
        fan.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= TOP_K)
        .select("n_probe", "query_id", "vec_id")
        .localCheckpoint(eager=True)
    )
    probes_df = spark.range(1).select(
        F.explode(probes_arr).alias("n_probe")
    )
    allpairs = exact.select("query_id", "vec_id").crossJoin(
        F.broadcast(probes_df)
    )
    joined = allpairs.join(
        ann.withColumn("hit", F.lit(1)),
        ["n_probe", "query_id", "vec_id"],
        "left",
    )
    return joined.groupBy(F.col("n_probe").cast("int").alias("n_probe")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias(
            "n_hits"
        ),
        (
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
            / F.count(F.lit(1))
        ).alias("recall_at_k"),
    )
