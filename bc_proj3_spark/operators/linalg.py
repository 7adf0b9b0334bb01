"""Distributed numerical linear algebra over the ``embeddings`` table.

pi1: power iteration for the corpus's top principal direction — the
spectral building block under PCA whitening, spectral clustering, and
embedding diagnostics (is one direction eating the variance?). The
Spark plan is the honest distributed shape at every step:

1. the 64×64 second-moment (Gram) matrix is built by exploding each
   sampled vector's outer product JVM-side (``transform`` ×
   ``transform`` → one ``explode``; no self-join, no Python) and
   decimal-summing per (i, j) cell — a map-side-combinable aggregate
   whose output size is DIM², independent of corpus size;
2. the fixed-ITERS power iteration then runs on the DRIVER over the
   collected DIM²-bounded Gram (a constant-size collect — the
   hot-key-list precedent), replaying the identical decimal protocol
   in Python Decimal arithmetic. This is MLlib's own shape for
   small-d spectral work (RowMatrix.computeSVD gathers the Gramian
   and decomposes locally): the corpus is touched exactly once, and
   the iteration costs O(DIM²·iters) scalar ops regardless of corpus
   size — versus ~30-80 Spark jobs of 64-row joins when the rounds
   ran as DataFrame plans (the r10 optimization round's measurement).

Cross-engine determinism — the iteration state is EXACT DECIMAL
end-to-end, learned the hard way:

- the first cut rounded doubles at every stage. That failed: a rounded
  value is a 1e-12 LATTICE multiple, and multiplying it by the next
  lattice value lands EXACTLY ON rounding half-ties (c·x with
  x = 0.125 ties in 1/8 of cases), where Spark (exact BigDecimal
  HALF_UP) and DuckDB (scaled double round) systematically disagree.
- so: raw products (generic doubles, tie-free) are rounded ONCE to 12
  decimals and cast to decimal; all matrix/vector arithmetic after
  that is decimal × decimal with precisions sized so neither engine
  ever rescales (c: DECIMAL(14,12), v: DECIMAL(14,12) → products at
  scale 24 inside both engines' 38-digit cap; sums exact).
- rescaling scale-24 sums back to 12 TRUNCATES (``y - y % 1e-12`` —
  pure decimal arithmetic, remainder truncation-based in both engines,
  verified on negatives) instead of casting: a cast ROUNDS, and these
  sums sit exactly on half-ties (multiples of 0.125e-12 from the v0 =
  1/8 lattice), where Spark's HALF_UP and DuckDB's rescale disagree;
- doubles reappear ONLY where unavoidable (sqrt, division) and ONLY on
  values first truncated to scale 12, whose integer numerator is
  double-exact — making each decimal→double cast a single correctly-
  rounded operation in both engines (at higher scales DuckDB's
  int128/10^s cast path drifts 1 ulp from Spark's BigDecimal).
- the division result (a generic, lattice-free double) is rounded to
  12 and recast — back to the safe case.

The driver's value hash therefore holds an ITERATIVE numeric algorithm
to bit equality — the linear-algebra twin of the sketch family's
replayed-sketch strategy. The fixed iteration count (no convergence
test) is deliberate: the result after K rounds is a pure function of
the input, so the oracle unrolls K CTE blocks; a data-dependent
stopping rule would let a last-ulp divergence change the round count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bc_proj3_spark.plans.tables import fanout, local_rows_df, table
from bc_proj3_spark.registry import register

DIM = 64
PI_ITERS = 5
PI_SAMPLE_MOD = 10  # Gram built over vec_id % 10 == 0 (bounded demo cost)
_RND = 12  # rounding scale for double→decimal entry points
#: entry-point decimal type: 2 integer digits (|cells| ≤ 99), scale 12.
#: Sized so decimal products stay inside the 38-digit cap with NO
#: engine-side rescale: (14,12) × (14,12) → (29,24) exact in both.
_DEC = "decimal(14,12)"
#: squared-term type for the norm sum: |y²| ≤ 9999, scale 24 exact.
_DEC_SQ = "decimal(28,24)"


def _pi_cte_blocks() -> list[str]:
    """The shared power-iteration CTE blocks: Gram matrix ``c``, start
    vector ``v0``, and PI_ITERS unrolled rounds ending at ``v{K}`` /
    ``n{K}`` — reused verbatim by pi1 (which selects the result) and
    pi2 (which deflates against it)."""
    ctes = [
        f"""
e AS MATERIALIZED (
  SELECT embedding::DOUBLE[] AS v FROM embeddings
  WHERE vec_id % {PI_SAMPLE_MOD} = 0
),
terms AS MATERIALIZED (
  SELECT unnest(flatten(list_transform(generate_series(1, {DIM}),
           i -> list_transform(generate_series(1, {DIM}),
             j -> {{'i': i, 'j': j, 'p': v[i] * v[j]}})))) AS u
  FROM e
),
c AS MATERIALIZED (
  SELECT u.i AS i, u.j AS j,
         CAST(SUM(CAST(ROUND(u.p, {_RND}) AS DECIMAL(14,12))) AS DECIMAL(14,12)) AS c
  FROM terms GROUP BY u.i, u.j
),
v0 AS MATERIALIZED (
  SELECT i.i AS pos, CAST(0.125 AS DECIMAL(14,12)) AS x
  FROM (SELECT unnest(generate_series(1, {DIM})) AS i) i
)"""
    ]
    for k in range(1, PI_ITERS + 1):
        p = k - 1
        ctes.append(
            f"""
mv{k} AS MATERIALIZED (
  SELECT pos, CAST(y24 - (y24 % CAST(0.000000000001 AS DECIMAL(14,12))) AS DECIMAL(14,12)) AS y
  FROM (
    SELECT c.i AS pos, SUM(c.c * v{p}.x) AS y24
    FROM c JOIN v{p} ON c.j = v{p}.pos
    GROUP BY c.i
  ) raw
),
n{k} AS MATERIALIZED (
  SELECT sqrt(CAST(CAST(s24 - (s24 % CAST(0.000000000001 AS DECIMAL(14,12))) AS DECIMAL(16,12)) AS DOUBLE)) AS nrm
  FROM (SELECT SUM(CAST(y * y AS DECIMAL(28,24))) AS s24 FROM mv{k}) sq
),
v{k} AS MATERIALIZED (
  SELECT pos,
         CAST(ROUND(CAST(y AS DOUBLE) / (SELECT nrm FROM n{k}), {_RND}) AS DECIMAL(14,12)) AS x
  FROM mv{k}
)"""
        )
    return ctes


def _pi1_oracle() -> str:
    final = f"""
SELECT pos, CAST(x AS DOUBLE) AS loading,
       ROUND((SELECT nrm FROM n{PI_ITERS}), 6) AS eigenvalue_est
FROM v{PI_ITERS}
"""
    return "WITH " + ",".join(_pi_cte_blocks()) + final


def _gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The checkpointed DIM² decimal Gram matrix ``c(i, j, c)`` shared
    by pi1/pi2 (see module docstring steps 1-2)."""
    emb = fanout(
        table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") % PI_SAMPLE_MOD == 0
        )
    )
    v = F.col("embedding").cast("array<double>")

    # outer-product terms: 4096 structs per row, JVM-side, one explode
    terms = emb.select(
        F.explode(
            F.flatten(
                F.transform(
                    v,
                    lambda xi, i: F.transform(
                        v,
                        lambda xj, j: F.struct(
                            (i + 1).alias("i"),
                            (j + 1).alias("j"),
                            (xi * xj).alias("p"),
                        ),
                    ),
                )
            )
        ).alias("u")
    )

    return (
        terms.groupBy(F.col("u.i").alias("i"), F.col("u.j").alias("j"))
        .agg(
            F.sum(F.round(F.col("u.p"), _RND).cast(_DEC))
            .cast(_DEC)
            .alias("c")
        )
        .localCheckpoint(eager=True)  # 4096 rows; cut the explode lineage
    )


_TICK = "0.000000000001"


def _dec_to_double(x) -> float:
    """Spark's DECIMAL→DOUBLE cast on the driver: correctly-rounded
    nearest double (CPython float(Decimal) and BigDecimal.doubleValue
    are both correctly rounded, so the bit patterns agree). BigDecimal
    has no signed zero, so Python's Decimal('-0') must land on +0.0."""
    f = float(x)
    return f + 0.0 if f == 0.0 else f


def _round_half_up(v: float, scale: int):
    """Spark's ROUND(double, scale) → CAST(... AS DECIMAL(.,scale))
    replayed on the driver: BigDecimal.valueOf(double) builds from
    Double.toString (the shortest round-trip repr — identical digits
    to CPython's repr), then setScale(scale, HALF_UP). The rounded
    value has ≤ 15 significant digits here, so the double→decimal
    round-trip in the second cast is exact and the composition is one
    quantize."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(repr(v)).quantize(
        Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP
    )
    # BigDecimal rounds tiny negatives to an UNSIGNED zero
    return q.copy_abs() if q.is_zero() else q


def _power_rounds_local(
    cells: "list[tuple[int, int, object]]", iters: int = PI_ITERS
) -> "tuple[dict[int, object], float | None]":
    """``iters`` decimal-exact power-iteration rounds over the
    collected DIM²-bounded Gram cells; returns ({pos: x decimal}, nrm
    float). Replays the in-plan decimal protocol (module docstring)
    op-for-op on the driver: exact Decimal sums/products, remainder
    truncation (sign of dividend in both BigDecimal and Python
    Decimal), correctly-rounded decimal→double at sqrt/divide, HALF_UP
    re-entry to the 1e-12 lattice — bit-identical to the previous
    in-plan loop, held to the same unrolled-CTE oracle."""
    import math
    from decimal import Decimal, localcontext

    tick = Decimal(_TICK)
    with localcontext() as ctx:
        ctx.prec = 60  # exact: operands stay far below 60 digits
        x = {p: Decimal("0.125") for p in range(1, DIM + 1)}
        nrm = None
        for _ in range(iters):
            y24: dict[int, object] = {}
            for i, j, cv in cells:
                if j in x:
                    y24[i] = y24.get(i, Decimal(0)) + cv * x[j]
            y = {i: v - v % tick for i, v in y24.items()}
            s24 = sum((v * v for v in y.values()), Decimal(0))
            nrm = math.sqrt(_dec_to_double(s24 - s24 % tick))
            x = {
                i: _round_half_up(_dec_to_double(v) / nrm, _RND)
                for i, v in y.items()
            }
        return x, nrm


@register("pi1_power_iteration", _pi1_oracle())
def pi1_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the sampled embedding Gram matrix
    after a fixed PI_ITERS power-iteration rounds; returns the 64
    loadings plus the eigenvalue estimate (the final pre-normalization
    norm). See module docstring for the plan and determinism story.

    The corpus-scale work (one embedding scan → DIM² decimal Gram) is
    distributed; the iteration itself runs on the DRIVER over the
    collected 4096-cell matrix — a constant-size collect (the
    hot-key-list/Bloom-literal precedent) replacing ~30 Spark jobs of
    64-row joins per query. This is MLlib's own shape for small-d
    spectral work (RowMatrix.computeSVD collects the Gramian and
    decomposes locally); iteration cost is O(DIM²·iters) scalar ops,
    independent of corpus size."""
    cells = [(r["i"], r["j"], r["c"]) for r in _gram(spark, sf_dir).collect()]
    if not cells:
        return spark.createDataFrame(
            [], "pos int, loading double, eigenvalue_est double"
        )
    x, nrm = _power_rounds_local(cells)
    rows = [
        (pos, _dec_to_double(x[pos]), float(_round_half_up(nrm, 6)))
        for pos in sorted(x)
    ]
    return local_rows_df(
        spark, rows, "pos int, loading double, eigenvalue_est double"
    )


# ---------------------------------------------------------------------------
# g1 — the Gram matrix X^T X of the embedding corpus
# ---------------------------------------------------------------------------

GRAM_DIM = 64

_G1_ORACLE = f"""
SELECT i, j,
       ROUND(CAST(SUM(CAST(ROUND(
         CAST(embedding[i] AS DOUBLE) * CAST(embedding[j] AS DOUBLE), 9)
         AS DECIMAL(28,10))) AS DOUBLE), 6) AS g
FROM embeddings
CROSS JOIN generate_series(1, {GRAM_DIM}) t1(i)
CROSS JOIN generate_series(1, {GRAM_DIM}) t2(j)
WHERE j >= i
GROUP BY i, j
"""


@register("g1_gram_matrix", _G1_ORACLE)
def g1_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X^T X over the embedding corpus (upper triangle) — the batch
    primitive under PCA/whitening/ridge: a d×d summary however many
    vectors feed it, which is why it is THE distributed shape for
    second-order statistics (pi1 iterates toward one eigenvector; this
    materializes the full matrix in one pass). Each vector fans out to
    its d(d+1)/2 upper-triangle products map-side (two chained
    explodes — never a vector×vector join), partial aggregation
    absorbs the fan-out before the only exchange, and the output is
    2,080 cells at ANY corpus size. Products are float→double, one
    rounded op each, decimal-summed per the association-order
    convention; the deliberate d² row fan-out is the standard
    compute-for-shuffle trade (the alternative — collecting vectors —
    doesn't distribute)."""
    emb = table(spark, sf_dir, "embeddings")
    with_i = fanout(emb).select(
        "embedding",
        F.explode(F.sequence(F.lit(1), F.lit(GRAM_DIM))).alias("i"),
    )
    with_ij = with_i.select(
        "embedding",
        "i",
        F.explode(F.sequence(F.col("i"), F.lit(GRAM_DIM))).alias("j"),
    )
    prod = F.round(
        F.element_at("embedding", F.col("i")).cast("double")
        * F.element_at("embedding", F.col("j")).cast("double"),
        9,
    ).cast("decimal(28,10)")
    return (
        with_ij.select("i", "j", prod.alias("p"))
        .groupBy("i", "j")
        .agg(F.round(F.sum("p").cast("double"), 6).alias("g"))
    )


# ---------------------------------------------------------------------------
# g2 — embedding centroid shift between content-addressed halves
# ---------------------------------------------------------------------------

from bc_proj3_spark.functions.hashing import sql_hash60  # noqa: E402

G2_DIM = 64

_G2_ORACLE = f"""
WITH tagged AS (
  SELECT embedding,
         ('0x' || substr(md5('half:' || CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
           % 2 = 0 AS in_a
  FROM embeddings
),
dims AS (
  SELECT in_a, i,
         SUM(CAST(ROUND(CAST(embedding[i] AS DOUBLE), 9) AS DECIMAL(28,10)))
           AS s,
         COUNT(*) AS n
  FROM tagged CROSS JOIN generate_series(1, {G2_DIM}) t(i)
  GROUP BY in_a, i
),
means AS (
  SELECT i,
         MAX(CASE WHEN in_a THEN CAST(s AS DOUBLE) / n END) AS mu_a,
         MAX(CASE WHEN NOT in_a THEN CAST(s AS DOUBLE) / n END) AS mu_b
  FROM dims GROUP BY i
)
SELECT CAST(i AS INTEGER) AS i,
       ROUND(mu_a, 6) AS mu_a,
       ROUND(mu_b, 6) AS mu_b,
       ROUND(ABS(mu_a - mu_b), 6) AS abs_shift
FROM means
"""


@register("g2_centroid_shift", _G2_ORACLE)
def g2_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift: the per-dimension centroid of two
    content-addressed halves of the corpus and their absolute shift —
    the monitoring signal that catches a broken or retrained encoder
    upstream (value-space drift dq6 can't see lives in embedding
    space; here the two halves of a STABLE corpus should agree, so a
    large shift localizes the dimension that moved). Per-dimension
    sums explode d ways map-side and reduce in decimal; output is d
    rows at any corpus size. The half assignment is the md5 family, so
    both engines split identically — no RNG, reproducible on any
    cluster."""
    emb = table(spark, sf_dir, "embeddings")
    in_a = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("half:"), F.col("vec_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
        == 0
    )
    tagged = fanout(emb).select("embedding", in_a.alias("in_a"))
    dims = (
        tagged.select(
            "in_a",
            "embedding",
            F.explode(F.sequence(F.lit(1), F.lit(G2_DIM))).alias("i"),
        )
        .select(
            "in_a",
            "i",
            F.round(
                F.element_at("embedding", F.col("i")).cast("double"), 9
            )
            .cast("decimal(28,10)")
            .alias("e"),
        )
        .groupBy("in_a", "i")
        .agg(F.sum("e").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    mean = F.col("s").cast("double") / F.col("n")
    means = dims.groupBy("i").agg(
        F.max(F.when(F.col("in_a"), mean)).alias("mu_a"),
        F.max(F.when(~F.col("in_a"), mean)).alias("mu_b"),
    )
    return means.select(
        F.col("i").cast("int").alias("i"),
        F.round("mu_a", 6).alias("mu_a"),
        F.round("mu_b", 6).alias("mu_b"),
        F.round(F.abs(F.col("mu_a") - F.col("mu_b")), 6).alias("abs_shift"),
    )


# ---------------------------------------------------------------------------
# pi2 — deflated power iteration: second eigenpair and the spectral gap
# ---------------------------------------------------------------------------

#: wider intermediate for the deflation round: the matvec result y and
#: the projection d = v1·y can exceed pi1's |cells| <= 99 envelope but
#: stay <= 9999 for (near-)unit embedding second moments, keeping the
#: scale-12 integer numerator double-exact (< 2^53) — the same
#: practical-bound discipline the module docstring sets for n{k}.
_DEC_W = "decimal(16,12)"


def _pi2_oracle() -> str:
    ctes = _pi_cte_blocks()
    vf, nf = f"v{PI_ITERS}", f"n{PI_ITERS}"
    ctes.append(
        f"""
w0 AS MATERIALIZED (
  SELECT i.i AS pos,
         CAST(CASE WHEN i.i % 2 = 0 THEN 0.125 ELSE -0.125 END
              AS DECIMAL(14,12)) AS x
  FROM (SELECT unnest(generate_series(1, {DIM})) AS i) i
)"""
    )
    tick = f"CAST({_TICK} AS DECIMAL(14,12))"
    for k in range(1, PI_ITERS + 1):
        p = k - 1
        ctes.append(
            f"""
wy{k} AS MATERIALIZED (
  SELECT pos, CAST(y24 - (y24 % {tick}) AS DECIMAL(16,12)) AS y
  FROM (
    SELECT c.i AS pos, SUM(c.c * w{p}.x) AS y24
    FROM c JOIN w{p} ON c.j = w{p}.pos
    GROUP BY c.i
  ) raw
),
wd{k} AS MATERIALIZED (
  SELECT CAST(d24 - (d24 % {tick}) AS DECIMAL(16,12)) AS d
  FROM (
    SELECT SUM(v.x * y.y) AS d24
    FROM {vf} v JOIN wy{k} y ON v.pos = y.pos
  ) s
),
wp{k} AS MATERIALIZED (
  SELECT pos, CAST(p24 - (p24 % {tick}) AS DECIMAL(16,12)) AS y
  FROM (
    SELECT y.pos, y.y - (SELECT d FROM wd{k}) * v.x AS p24
    FROM wy{k} y JOIN {vf} v ON v.pos = y.pos
  ) raw
),
wn{k} AS MATERIALIZED (
  SELECT sqrt(CAST(CAST(s24 - (s24 % {tick}) AS DECIMAL(16,12)) AS DOUBLE)) AS nrm
  FROM (SELECT SUM(CAST(y * y AS DECIMAL(38,24))) AS s24 FROM wp{k}) sq
),
w{k} AS MATERIALIZED (
  SELECT pos,
         CAST(ROUND(CAST(y AS DOUBLE) / (SELECT nrm FROM wn{k}), {_RND})
              AS DECIMAL(14,12)) AS x
  FROM wp{k}
)"""
        )
    final = f"""
SELECT pos, CAST(x AS DOUBLE) AS loading2,
       ROUND((SELECT nrm FROM wn{PI_ITERS}), 6) AS eigenvalue2_est,
       ROUND((SELECT nrm FROM wn{PI_ITERS}) / (SELECT nrm FROM {nf}), 9)
         AS gap_ratio
FROM w{PI_ITERS}
"""
    return "WITH " + ",".join(ctes) + final


@register("pi2_spectral_gap", _pi2_oracle())
def pi2_spectral_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second eigenpair of the embedding Gram matrix by DEFLATED power
    iteration, plus the spectral-gap ratio λ2/λ1 — the diagnostic that
    says whether the corpus embedding cloud is effectively
    one-dimensional (ratio ≪ 1: one direction eats the variance, PCA
    whitening is mandatory) or spread (ratio near 1: k-means/LSH
    geometry is trustworthy). Spectral clustering, whitening, and
    embedding-collapse monitoring all start from exactly this number.

    Each round is pi1's matvec PLUS one orthogonalization against the
    converged v1: y ← C·w, then y ← y − (v1ᵀy)·v1 (projection
    deflation — no λ1-scaled outer product is ever materialized, so the
    Gram matrix is touched read-only and the extra cost per round is
    one 64-row dot product). All iteration state follows the module's
    exact-decimal discipline (truncate-to-scale-12, double only at
    sqrt/divide on double-exact numerators), so the driver's value hash
    holds a DEFLATED iterative algorithm to bit equality; v1 comes from
    the same _power_rounds the pi1 oracle unrolls, so the two
    registered queries share one convergence story."""
    # Like pi1, the distributed work is the one corpus scan that builds
    # the DIM² Gram; the deflated iteration replays the identical
    # decimal protocol on the DRIVER over the collected constant-size
    # matrix (see pi1's docstring for the precedent), replacing ~80
    # Spark jobs of 64-row joins with O(DIM²·iters) exact scalar ops.
    import math
    from decimal import Decimal, localcontext

    cells = [(r["i"], r["j"], r["c"]) for r in _gram(spark, sf_dir).collect()]
    if not cells:
        return spark.createDataFrame(
            [],
            "pos int, loading2 double, eigenvalue2_est double,"
            " gap_ratio double",
        )
    v1, nrm1 = _power_rounds_local(cells)

    tick = Decimal(_TICK)
    with localcontext() as ctx:
        ctx.prec = 60
        w = {
            p: Decimal("0.125") if p % 2 == 0 else Decimal("-0.125")
            for p in range(1, DIM + 1)
        }
        nrm = None
        for _ in range(PI_ITERS):
            y24: dict[int, object] = {}
            for i, j, cv in cells:
                if j in w:
                    y24[i] = y24.get(i, Decimal(0)) + cv * w[j]
            y = {i: v - v % tick for i, v in y24.items()}
            d24 = sum((v1[p] * y[p] for p in y if p in v1), Decimal(0))
            d = d24 - d24 % tick
            perp = {}
            for p in y:
                if p in v1:
                    p24 = y[p] - d * v1[p]
                    perp[p] = p24 - p24 % tick
            s24 = sum((v * v for v in perp.values()), Decimal(0))
            nrm = math.sqrt(_dec_to_double(s24 - s24 % tick))
            w = {
                p: _round_half_up(_dec_to_double(v) / nrm, _RND)
                for p, v in perp.items()
            }
    rows = [
        (
            pos,
            _dec_to_double(w[pos]),
            float(_round_half_up(nrm, 6)),
            float(_round_half_up(nrm / nrm1, 9)),
        )
        for pos in sorted(w)
    ]
    return local_rows_df(
        spark,
        rows,
        "pos int, loading2 double, eigenvalue2_est double, gap_ratio double",
    )


# ---------------------------------------------------------------------------
# g5 — effective rank (participation ratio) of the embedding cloud
# ---------------------------------------------------------------------------

_G5_ORACLE = f"""
WITH cells AS (
  SELECT i, j, COUNT(*) AS cnt,
         SUM(CAST(ROUND(
           CAST(embedding[i] AS DOUBLE) * CAST(embedding[j] AS DOUBLE), 9)
           AS DECIMAL(28,10))) AS gd
  FROM embeddings
  CROSS JOIN generate_series(1, {GRAM_DIM}) t1(i)
  CROSS JOIN generate_series(1, {GRAM_DIM}) t2(j)
  WHERE j >= i
  GROUP BY i, j
),
m AS (
  SELECT MAX(CASE WHEN i = 1 AND j = 1 THEN cnt END) AS n,
         SUM(CASE WHEN i = j THEN gd ELSE 0 END) AS tr,
         SUM(CAST(ROUND(CAST(gd AS DOUBLE) * CAST(gd AS DOUBLE), 6)
                  AS DECIMAL(38,6))
             * CASE WHEN i = j THEN 1 ELSE 2 END) AS fro2
  FROM cells
)
SELECT CAST(n AS BIGINT) AS n_vectors,
       CAST(tr AS DOUBLE) AS trace,
       CAST(tr AS DOUBLE) * CAST(tr AS DOUBLE) / CAST(fro2 AS DOUBLE)
         AS effective_rank
FROM m
"""


@register("g5_effective_rank", _G5_ORACLE)
def g5_effective_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective dimensionality of the embedding cloud as the
    participation ratio PR = (sum lambda_i)^2 / sum lambda_i^2 =
    trace(G)^2 / ||G||_F^2 — computable from g1's Gram cells WITHOUT
    any eigendecomposition (trace and Frobenius norm are basis-free).
    PR ~ d means an isotropic, well-spread embedding space; PR ~ 1
    means the cloud has collapsed onto a line — the anisotropy
    pathology that silently breaks cosine-based dedup (s3/d12) and ANN
    recall (s9), caught here with one number per corpus snapshot.
    g1:257 materializes the matrix; this distills its health.

    Determinism: cells follow g1's exact protocol (9-dp-rounded
    products, DECIMAL(28,10) sums — association-order free); trace is
    an exact decimal sum; each squared cell is ONE IEEE product of the
    identical decimal-derived double, re-rounded to the 6-dp lattice
    and decimal-summed, so fro2 is exact; trace and effective_rank are
    deterministic IEEE expressions over those identical exact operands
    on both engines (EXACT_DOUBLE_OK — no unordered double sum
    anywhere).

    Scale shape: g1's single corpus pass (map-side d(d+1)/2 fan-out,
    combiner-absorbed, 2,080-cell output at any corpus size), then a
    1-row aggregate over the cells; n_vectors rides the (1,1) cell's
    count — no second corpus scan."""
    emb = table(spark, sf_dir, "embeddings")
    with_i = fanout(emb).select(
        "embedding",
        F.explode(F.sequence(F.lit(1), F.lit(GRAM_DIM))).alias("i"),
    )
    with_ij = with_i.select(
        "embedding",
        "i",
        F.explode(F.sequence(F.col("i"), F.lit(GRAM_DIM))).alias("j"),
    )
    prod = F.round(
        F.element_at("embedding", F.col("i")).cast("double")
        * F.element_at("embedding", F.col("j")).cast("double"),
        9,
    ).cast("decimal(28,10)")
    cells = (
        with_ij.select("i", "j", prod.alias("p"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("p").alias("gd"))
    )
    gsq = F.round(
        F.col("gd").cast("double") * F.col("gd").cast("double"), 6
    ).cast("decimal(38,6)")
    m = cells.agg(
        F.max(
            F.when((F.col("i") == 1) & (F.col("j") == 1), F.col("cnt"))
        ).alias("n"),
        F.sum(
            F.when(F.col("i") == F.col("j"), F.col("gd")).otherwise(
                F.lit(0).cast("decimal(28,10)")
            )
        ).alias("tr"),
        F.sum(
            gsq * F.when(F.col("i") == F.col("j"), 1).otherwise(2)
        ).alias("fro2"),
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_vectors"),
        F.col("tr").cast("double").alias("trace"),
        (
            F.col("tr").cast("double")
            * F.col("tr").cast("double")
            / F.col("fro2").cast("double")
        ).alias("effective_rank"),
    )


# ---------------------------------------------------------------------------
# g7 — Johnson–Lindenstrauss random-projection distortion audit
# ---------------------------------------------------------------------------

import hashlib  # noqa: E402

JL_DIM = 16  # target dimensionality (DIM -> JL_DIM, a 4x compression)
JL_QUERIES = 5  # audit anchors: vec_id < JL_QUERIES (s1's query set)


def _jl_sign(j: int, i: int) -> float:
    """Deterministic ±1 projection entry — the md5-low-bit family
    (similarity._hyperplane_sign's convention, its own 'jl' seed),
    evaluated once in Python and baked into BOTH plans as literals."""
    h = int(hashlib.md5(f"jl:{j}:{i}".encode()).hexdigest()[:8], 16)
    return 1.0 if h & 1 else -1.0


def _jl_row(j: int) -> list[float]:
    return [_jl_sign(j, i) for i in range(DIM)]


def _sql_jl_proj(v: str) -> str:
    # flat ±v[i] addition chains (left-associative in both engines —
    # the identical IEEE sequence as the Spark reduce below), not a
    # list_reduce lambda: measured ~10x faster on both sides
    comps = []
    for j in range(JL_DIM):
        terms = "".join(
            ("+" if s > 0 else "-") + f"({v})[{i + 1}]"
            for i, s in enumerate(_jl_row(j))
        )
        comps.append(f"({terms}) / 4.0")
    return "[" + ",\n          ".join(comps) + "]"


def _sql_jl_d2(a: str, b: str, n: int) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, {n}), "
        f"i -> (({a})[i] - ({b})[i]) * (({a})[i] - ({b})[i])), "
        f"(acc, x) -> acc + x)"
    )


_G7_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
proj AS (
  SELECT vec_id, v, {_sql_jl_proj('v')} AS y FROM e
),
q AS (
  SELECT vec_id AS query_id, v AS qv, y AS qy FROM proj
  WHERE vec_id < {JL_QUERIES}
),
ratios AS (
  SELECT q.query_id,
         {_sql_jl_d2('p.y', 'q.qy', JL_DIM)}
           / {_sql_jl_d2('p.v', 'q.qv', DIM)} AS ratio
  FROM proj p, q
  WHERE p.vec_id <> q.query_id
)
SELECT query_id,
       COUNT(*) AS n_pairs,
       ROUND(CAST(SUM(CAST(ROUND(ratio, 9) AS DECIMAL(28,10))) AS DOUBLE)
             / COUNT(*), 9) AS mean_ratio,
       MIN(ratio) AS min_ratio,
       MAX(ratio) AS max_ratio,
       ROUND(CAST(SUM(CASE WHEN ratio BETWEEN 0.8 AND 1.2
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 9) AS frac_in_band
FROM ratios GROUP BY query_id
"""


@register("g7_jl_distortion", _G7_ORACLE)
def g7_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss compression audit: project every
    embedding through a fixed ±1/sqrt(k) matrix (DIM -> JL_DIM, 4x
    smaller), then measure how squared pairwise distances to the s1
    query anchors distort (ratio projected/original). This is the
    dimension-compression twin of s10's code compression: PQ shrinks
    BYTES per vector, JL shrinks the DIMENSION every distance
    computation pays, and the distortion band (JL guarantees
    1±eps w.h.p.) is the number that says whether the s2/s3 funnels
    can run their candidate stage on 16-dim sketches. Signs come from
    the md5 literal family — reproducible on any engine, no RNG state.

    Determinism: each projected component and each squared distance
    is a sequential fold over doubles (the similarity-family IEEE
    convention), so every ratio is ONE deterministic division of two
    deterministic scalars; min/max are selections; the mean follows
    the round-then-decimal-sum convention; frac_in_band compares
    identical doubles against literal bounds and ROUND-wraps its
    integer ratio.

    Scale shape: ONE corpus scan computes v and y map-side; the
    JL_QUERIES anchor rows broadcast across it (s1's plan — corpus x
    Q scored rows, never corpus^2); the summary is a Q-row
    combiner-absorbed aggregate. At a billion vectors the projection
    itself is the useful output and this audit rides the same scan.
    One-time cost note: the 1024-term projection Project pays a ~15 s
    per-JVM codegen/JIT compile on first execution (s1's warm-up
    class, measured run0 18 s / run1+ 1.9 s at sf0.01) — a plan
    constant, not a data cost."""
    emb = fanout(table(spark, sf_dir, "embeddings"))
    v = F.col("embedding").cast("array<double>")

    def _proj_expr(name: str):
        # flat left-associative ±v[i] chains — plain codegen'd
        # arithmetic, NOT interpreted higher-order lambdas (the fold
        # form measured ~10x slower and paid a pathological Janino
        # compile), and ONE F.expr parse — not 1024 py4j Column calls
        # (Column-by-Column construction alone cost ~5 s per build).
        # The oracle writes the identical flat chain; Spark brackets
        # are 0-based, DuckDB's 1-based.
        comps = []
        for j in range(JL_DIM):
            terms = "".join(
                ("+" if s > 0 else "-") + f"{name}[{i}]"
                for i, s in enumerate(_jl_row(j))
            )
            comps.append(f"({terms}) / 4.0D")
        return F.expr("array(" + ", ".join(comps) + ")")

    def _d2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # persist: the projected corpus feeds the anchor subset AND the
    # pair scan — without the barrier Catalyst collapses the projection
    # into the post-join stage and re-runs the 16 folds once per PAIR
    # instead of once per vector (r6 shared-subplan discipline)
    proj = (
        emb.select("vec_id", v.alias("v"))
        .select("vec_id", "v", _proj_expr("v").alias("y"))
        .persist()
    )
    q = (
        proj.filter(F.col("vec_id") < JL_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("y").alias("qy"),
        )
        .localCheckpoint(eager=True)
    )
    ratios = (
        proj.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            (
                _d2(F.col("y"), F.col("qy")) / _d2(F.col("v"), F.col("qv"))
            ).alias("ratio"),
        )
    )
    return ratios.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(
            F.sum(F.round(F.col("ratio"), 9).cast("decimal(28,10)"))
            .cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("mean_ratio"),
        F.min("ratio").alias("min_ratio"),
        F.max("ratio").alias("max_ratio"),
        F.round(
            F.sum(
                F.when(F.col("ratio").between(0.8, 1.2), 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("frac_in_band"),
    )
