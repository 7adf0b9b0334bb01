"""Model TRAINING loops as Spark jobs, in exact arithmetic.

The LLM-data operators elsewhere in this engine prepare corpora
(filter, dedup, mix, split); these operators close the loop by showing
the engine can also RUN the distributed-training primitives that sit
on top of such corpora — in the repo's exact cross-engine arithmetic so
every round of every fit is bit-identical between Spark and the DuckDB
oracle:

- ml1: batch perceptron — the canonical distributed linear classifier
  update (each round is one map-side-combinable aggregate over the
  corpus; Rosenblatt 1958, distributed form McDonald et al. NAACL'10).
  Features, labels, weights and margins are ALL exact BIGINTs, so the
  trajectory is bit-identical at any partitioning and any scale.
- bt1: Bradley-Terry strength fit by minorization-maximization (Hunter
  2004) — the pairwise-preference model behind RLHF reward baselines
  and ranking evals, run in the cc3/e24 half-up scaled-integer
  protocol so the iterate walk is bit-identical across engines.

Scale shape: both fits are aggregate-then-iterate — the corpus is
touched ONCE to build a bounded statistic (per-doc integer features;
the K×K win matrix), then every round is O(rows-of-that-statistic),
never a second corpus pass. That is exactly how a 100 TB fit must be
shaped: the data-sized work is one scan per ROUND for ml1 (the
irreducible cost of batch gradients — here over the checkpointed
4-ints-per-doc projection, not the raw text) and one scan TOTAL for
bt1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bc_proj3_spark.plans.tables import local_rows_df, table
from bc_proj3_spark.registry import register

# ---------------------------------------------------------------------------
# ml1 — batch perceptron training trajectory (exact integer weights)
# ---------------------------------------------------------------------------

PERCEPTRON_ROUNDS = 4
#: label: the document is "long" (n_chars >= this) — linearly tied to
#: the n_words feature, so the fit has real signal to converge on.
PERCEPTRON_LABEL_CHARS = 250
#: compile-time centering offsets (median-ish word/stopword/distinct
#: counts). Centering is what makes the raw-count design usable: the
#: separator then passes near the origin, and the batch fit drops from
#: 100 % error to its noise floor in ONE round (measured; with raw
#: counts the needed bias ~ -50·w1 is unreachable and the fit
#: oscillates at 40 % — the classic conditioning failure).
PERCEPTRON_CENTER = (50, 4, 25)

_ML1_FEAT = """
SELECT doc_id,
       1 AS x0,
       len(string_split_regex(trim(text), '\\s+')) - {c1} AS x1,
       len(list_filter(string_split_regex(trim(text), '\\s+'),
                       t -> t IN ('the', 'a'))) - {c2} AS x2,
       len(list_distinct(string_split_regex(trim(text), '\\s+'))) - {c3}
         AS x3,
       CASE WHEN n_chars >= {thr} THEN 1 ELSE -1 END AS y
FROM documents
""".strip()


def _ml1_oracle() -> str:
    steps = [
        "feat AS MATERIALIZED ("
        + _ML1_FEAT.format(
            thr=PERCEPTRON_LABEL_CHARS,
            c1=PERCEPTRON_CENTER[0],
            c2=PERCEPTRON_CENTER[1],
            c3=PERCEPTRON_CENTER[2],
        )
        + "),",
        "n AS (SELECT COUNT(*) AS n_docs FROM feat),",
        "w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,"
        " CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3),",
    ]
    for k in range(1, PERCEPTRON_ROUNDS + 1):
        p = k - 1
        steps.append(f"""
m{k} AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_mistakes,
         CAST(COALESCE(SUM(y * x0), 0) AS BIGINT) AS s0,
         CAST(COALESCE(SUM(y * x1), 0) AS BIGINT) AS s1,
         CAST(COALESCE(SUM(y * x2), 0) AS BIGINT) AS s2,
         CAST(COALESCE(SUM(y * x3), 0) AS BIGINT) AS s3
  FROM feat, w{p}
  WHERE y * (w0 * x0 + w1 * x1 + w2 * x2 + w3 * x3) <= 0
),
w{k} AS (
  SELECT w{p}.w0 + m{k}.s0 AS w0, w{p}.w1 + m{k}.s1 AS w1,
         w{p}.w2 + m{k}.s2 AS w2, w{p}.w3 + m{k}.s3 AS w3
  FROM w{p}, m{k}
),""".strip())
    rows = " UNION ALL ".join(
        f"SELECT {k} AS round, m{k}.n_mistakes,"
        f" w{k}.w0, w{k}.w1, w{k}.w2, w{k}.w3,"
        f" CAST(m{k}.n_mistakes AS DOUBLE) / n.n_docs AS error_rate"
        f" FROM m{k}, w{k}, n"
        for k in range(1, PERCEPTRON_ROUNDS + 1)
    )
    return "WITH " + "\n".join(steps).rstrip(",") + "\n" + rows


@register("ml1_perceptron_train", _ml1_oracle())
def ml1_perceptron_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch perceptron TRAINING on Spark: 4 full-batch rounds of the
    Rosenblatt update w += Σ_{mistakes} y·x over integer document
    features (bias, word count, stopword count, distinct-word count),
    labels y = ±1 for long-vs-short documents. Emits the training
    trajectory — (round, n_mistakes, w0..w3, error_rate) — the curve an
    ML engineer reads to see the fit learning (mistakes fall as the
    margin on the correlated features grows).

    Exactness: features, labels, margins and weights are ALL exact
    BIGINTs; each round's update is an order-free integer SUM, so the
    whole trajectory is bit-identical across engines, partitionings and
    scales (no learning-rate float, no tie seam: margin 0 counts as a
    mistake on both engines). error_rate is ONE IEEE division of exact
    integers per row.

    Scale shape: the text is scanned ONCE into a checkpointed
    4-ints-per-doc projection; each round is one crossJoin(broadcast)
    of the 1-row weight frame onto that projection and one map-side-
    combinable aggregate — the canonical distributed batch-gradient
    shape (McDonald et al. NAACL'10). Weight frames are 1 row, each
    round's job is O(n_docs) over 5 integers, and lineage stays O(1)
    via per-round eager checkpoints."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    c1, c2, c3 = PERCEPTRON_CENTER
    feat = docs.select(
        F.lit(1).cast("bigint").alias("x0"),
        (F.size(toks) - c1).cast("bigint").alias("x1"),
        (F.size(F.filter(toks, lambda t: t.isin("the", "a"))) - c2)
        .cast("bigint")
        .alias("x2"),
        (F.size(F.array_distinct(toks)) - c3).cast("bigint").alias("x3"),
        F.when(F.col("n_chars") >= PERCEPTRON_LABEL_CHARS, 1)
        .otherwise(-1)
        .cast("bigint")
        .alias("y"),
    ).localCheckpoint(eager=True)
    n_docs = feat.count()
    if n_docs == 0:
        # degenerate corpus: the oracle still emits one row per round
        # (aggregates over an empty frame return a row) with zero
        # mistakes/weights and a NULL error rate (DuckDB 0/0 is NULL;
        # Spark's ANSI division would THROW at constant folding) —
        # mirror those rows literally
        return spark.createDataFrame(
            [(k, 0, 0, 0, 0, 0, None) for k in range(1, PERCEPTRON_ROUNDS + 1)],
            "round int, n_mistakes long, w0 long, w1 long, w2 long,"
            " w3 long, error_rate double",
        )

    w = spark.range(1).select(
        *[F.lit(0).cast("bigint").alias(f"w{i}") for i in range(4)]
    )
    out = None
    for k in range(1, PERCEPTRON_ROUNDS + 1):
        margin = sum(
            F.col(f"w{i}") * F.col(f"x{i}") for i in range(4)
        )
        step = (
            feat.crossJoin(F.broadcast(w))
            .filter(F.col("y") * margin <= 0)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_mistakes"),
                *[
                    F.coalesce(
                        F.sum(F.col("y") * F.col(f"x{i}")), F.lit(0)
                    )
                    .cast("bigint")
                    .alias(f"s{i}")
                    for i in range(4)
                ],
            )
        )
        w = (
            step.crossJoin(F.broadcast(w))
            .select(
                "n_mistakes",
                *[
                    (F.col(f"w{i}") + F.col(f"s{i}")).alias(f"w{i}")
                    for i in range(4)
                ],
            )
            .localCheckpoint(eager=True)
        )
        row = w.select(
            F.lit(k).alias("round"),
            "n_mistakes",
            "w0",
            "w1",
            "w2",
            "w3",
            (
                F.col("n_mistakes").cast("double") / F.lit(float(n_docs))
            ).alias("error_rate"),
        )
        out = row if out is None else out.unionAll(row)
        w = w.drop("n_mistakes")
    return out


# ---------------------------------------------------------------------------
# bt1 — Bradley-Terry preference-strength fit (scaled-integer MM rounds)
# ---------------------------------------------------------------------------

BT_SCALE = 10 ** 6
BT_ROUNDS = 5


def _bt_halfup(a: str, b: str) -> str:
    return f"((2 * ({a}) + ({b})) // (2 * ({b})))"


def _bt1_oracle() -> str:
    s = BT_SCALE
    steps = [f"""cells AS (
  SELECT o_orderdate AS day, c_mktsegment AS seg,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
m AS (
  SELECT a.seg AS sa, b.seg AS sb,
         CASE WHEN a.cents > b.cents THEN a.seg
              WHEN b.cents > a.cents THEN b.seg
              ELSE a.seg END AS winner
  FROM cells a JOIN cells b ON a.day = b.day AND a.seg < b.seg
),
up AS MATERIALIZED (
  SELECT sa, sb, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN winner = sa THEN 1 ELSE 0 END) AS BIGINT)
           AS wa
  FROM m GROUP BY sa, sb
),
dir AS MATERIALIZED (
  SELECT sa AS i, sb AS j, n FROM up
  UNION ALL
  SELECT sb AS i, sa AS j, n FROM up
),
wins AS MATERIALIZED (
  SELECT i, CAST(SUM(w) AS BIGINT) AS n_wins,
         CAST(SUM(n) AS BIGINT) AS n_matches
  FROM (
    SELECT sa AS i, wa AS w, n FROM up
    UNION ALL
    SELECT sb AS i, n - wa AS w, n FROM up
  ) GROUP BY i
),
p0 AS MATERIALIZED (
  SELECT i, CAST({s} // (SELECT COUNT(*) FROM wins) AS BIGINT) AS p
  FROM wins
)"""]
    for k in range(1, BT_ROUNDS + 1):
        p = k - 1
        steps.append(f"""d{k} AS (
  SELECT dir.i,
         CAST(SUM({_bt_halfup(f'dir.n * {s} * {s}', 'pi.p + pj.p')})
              AS BIGINT) AS d
  FROM dir
  JOIN p{p} pi ON pi.i = dir.i
  JOIN p{p} pj ON pj.i = dir.j
  GROUP BY dir.i
),
u{k} AS (
  SELECT wins.i,
         CAST({_bt_halfup(f'wins.n_wins * {s} * {s}', 'd{0}.d'.format(k))}
              AS BIGINT) AS pu
  FROM wins JOIN d{k} ON d{k}.i = wins.i
),
p{k} AS MATERIALIZED (
  SELECT i, CAST({_bt_halfup(f'pu * {s}', f'(SELECT SUM(pu) FROM u{k})')}
               AS BIGINT) AS p
  FROM u{k}
)""")
    return (
        "WITH "
        + ",\n".join(steps)
        + f"""
SELECT wins.i AS seg, wins.n_wins, wins.n_matches,
       CAST(p.p AS BIGINT) AS p_scaled,
       CAST(p.p AS DOUBLE) / {s} AS strength
FROM wins JOIN p{BT_ROUNDS} p ON p.i = wins.i
"""
    )


@register("bt1_bradley_terry", _bt1_oracle())
def bt1_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry preference-strength fit — the pairwise-comparison
    model behind RLHF reward baselines, ranking evals and any
    head-to-head leaderboard — over daily market-segment spend duels:
    each order date where two segments both transact is one match, won
    by the larger exact-cents total (ties to the lexicographically
    smaller segment — a deterministic rule both engines share). Five
    minorization-maximization rounds (Hunter 2004):
    π_i ← W_i / Σ_j n_ij/(π_i+π_j), renormalized to Σπ = 1. Emits per
    segment the match record (wins, matches) and the fitted strength.

    Exactness: the cc3/e24 half-up scaled-integer protocol end-to-end —
    strengths live in 1e-6 fixed-point BIGINTs, every division is the
    explicit half-up (2a+b)//(2b), and all products are bounded
    (n_ij·S² < 2^63 up to ~9000 matches per pair; W_i·S² < 2^63 up to
    ~9e3 wins — both orders of magnitude above any SF here), so the
    iterate walk is bit-identical across engines; the display strength
    is ONE exact division.

    Scale shape: the fact table is scanned ONCE into the (day, segment)
    aggregate; matches derive from a day-keyed self-join of that
    bounded table; everything iterative runs on the COLLECTED
    K(K-1)/2-row win matrix as exact driver-side integer arithmetic —
    O(K²) per round regardless of corpus size (e24's
    aggregate-then-iterate split)."""
    s = BT_SCALE
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    cells = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .groupBy(
            F.col("o_orderdate").alias("day"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
        # the (day, segment) table feeds BOTH sides of the match
        # self-join; the barrier keeps the orders ⋈ customer aggregate
        # from running once per side
        .localCheckpoint(eager=True)
    )
    a, b = cells.alias("a"), cells.alias("b")
    m = (
        a.join(
            b,
            (F.col("a.day") == F.col("b.day"))
            & (F.col("a.seg") < F.col("b.seg")),
        )
        .select(
            F.col("a.seg").alias("sa"),
            F.col("b.seg").alias("sb"),
            F.when(F.col("b.cents") > F.col("a.cents"), F.col("b.seg"))
            .otherwise(F.col("a.seg"))
            .alias("winner"),
        )
    )
    # The win matrix is K(K-1)/2-bounded by the segment vocabulary —
    # collect it and run the MM rounds as exact Python integer
    # arithmetic on the driver (pi1/e24's constant-size-collect
    # precedent; was ~65 Spark jobs of K-row joins per query). The
    # corpus-scale work above (orders ⋈ customer aggregate + day-keyed
    # self-join) stays distributed.
    up = [
        (r["sa"], r["sb"], r["n"], r["wa"])
        for r in m.groupBy("sa", "sb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("winner") == F.col("sa"), 1).otherwise(0))
            .cast("bigint")
            .alias("wa"),
        )
        .collect()
    ]
    dir_: list = []
    n_wins: dict = {}
    n_matches: dict = {}
    for sa, sb, n, wa in up:
        dir_.append((sa, sb, n))
        dir_.append((sb, sa, n))
        n_wins[sa] = n_wins.get(sa, 0) + wa
        n_matches[sa] = n_matches.get(sa, 0) + n
        n_wins[sb] = n_wins.get(sb, 0) + (n - wa)
        n_matches[sb] = n_matches.get(sb, 0) + n
    if not n_wins:
        # degenerate input (no two segments ever share an order date):
        # the oracle's final join over the empty win table yields zero
        # rows — mirror it instead of crashing on SCALE // 0
        return spark.createDataFrame(
            [],
            "seg string, n_wins long, n_matches long,"
            " p_scaled long, strength double",
        )

    def halfup(a: int, b: int) -> int:
        return (2 * a + b) // (2 * b)

    p = {i: s // len(n_wins) for i in n_wins}
    for _ in range(BT_ROUNDS):
        d: dict = {}
        for i, j, n in dir_:
            d[i] = d.get(i, 0) + halfup(n * s * s, p[i] + p[j])
        u = {i: halfup(n_wins[i] * s * s, d[i]) for i in d}
        tot = sum(u.values())
        p = {i: halfup(pu * s, tot) for i, pu in u.items()}
    return local_rows_df(
        spark,
        [
            (i, n_wins[i], n_matches[i], p[i], float(p[i]) / float(s))
            for i in sorted(n_wins)
        ],
        "seg string, n_wins long, n_matches long,"
        " p_scaled long, strength double",
    )


# ---------------------------------------------------------------------------
# ml2 — multinomial naive Bayes: train + score + confusion matrix
# ---------------------------------------------------------------------------

from bc_proj3_spark.functions import text as T  # noqa: E402
from bc_proj3_spark.functions.joins import gated_broadcast  # noqa: E402

_ML2_DEC = "DECIMAL(28,10)"


def _ml2_oracle() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, lang, unnest({T.sql_tokenize('text')}) AS w
  FROM documents
),
dt AS MATERIALIZED (
  SELECT doc_id, lang, w, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks GROUP BY 1, 2, 3
),
cls AS MATERIALIZED (
  SELECT lang AS c, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_c,
         CAST(SUM(cnt) AS BIGINT) AS tot_c
  FROM dt GROUP BY 1
),
vocab AS (SELECT DISTINCT w FROM dt),
consts AS (
  SELECT (SELECT CAST(SUM(n_docs_c) AS BIGINT) FROM cls) AS n_docs,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM vocab) AS v
),
tc AS (
  SELECT lang AS c, w, CAST(SUM(cnt) AS BIGINT) AS n_cw
  FROM dt GROUP BY 1, 2
),
grid AS MATERIALIZED (
  SELECT cls.c, vocab.w,
         CAST(ROUND(LN(
           CAST(COALESCE(tc.n_cw, 0) + 1 AS DOUBLE)
           / (cls.tot_c + (SELECT v FROM consts))
         ), 9) AS {_ML2_DEC}) AS term
  FROM cls CROSS JOIN vocab
  LEFT JOIN tc ON tc.c = cls.c AND tc.w = vocab.w
),
prior AS (
  SELECT c, CAST(ROUND(LN(
           CAST(n_docs_c AS DOUBLE) / (SELECT n_docs FROM consts)
         ), 9) AS {_ML2_DEC}) AS p
  FROM cls
),
score AS (
  SELECT dt.doc_id, dt.lang, grid.c,
         SUM(CAST(dt.cnt AS DECIMAL(9,0)) * grid.term) + ANY_VALUE(prior.p)
           AS s
  FROM dt
  JOIN grid ON grid.w = dt.w
  JOIN prior ON prior.c = grid.c
  GROUP BY 1, 2, 3
),
pred AS (
  SELECT doc_id, lang, c AS predicted FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY doc_id ORDER BY s DESC, c) AS rn
    FROM score
  ) t WHERE rn = 1
),
conf AS MATERIALIZED (
  SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM pred GROUP BY 1, 2
)
SELECT lang, predicted, n_docs,
       (SELECT CAST(SUM(CASE WHEN lang = predicted THEN n_docs ELSE 0 END)
                    AS DOUBLE) / SUM(n_docs)
        FROM conf) AS accuracy
FROM conf
"""


@register("ml2_naive_bayes_confusion", _ml2_oracle())
def ml2_naive_bayes_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes, trained AND evaluated as one Spark job:
    Laplace-smoothed class-conditional token probabilities and document
    priors fit on the corpus (target = document language, which this
    corpus's token mix genuinely encodes), every document scored
    against every class, and the resubstitution confusion matrix
    emitted with the overall accuracy — the baseline every text
    classifier must beat, produced by the same engine that prepared
    the corpus.

    Exactness: every probability is ONE IEEE division of exact BIGINTs
    ((n_cw+1)/(tot_c+V); n_c/N) followed by ROUND(LN(x), 9) — the
    t21/g9 log-lattice — carried as DECIMAL; each document's class
    score is an order-free decimal sum of (count × term) products
    (counts collapse to DECIMAL(9,0) first — (9,0)×(28,10) is exactly
    precision 38, so no product can silently rescale; hs4's
    precision-38 lesson). The remaining documented bound: one token
    repeated ≥ 1e9 times in ONE document overflows the (9,0) cast on
    both engines — loud, not silent. The (score DESC, class) argmax is
    bit-identical across engines. Documents whose content tokens are all stopwords have no
    token evidence and are excluded by construction on both engines.

    Scale shape: ONE exploded pass builds the per-(doc, token) counts
    (checkpointed — it feeds training counts AND scoring); the model is
    the (V×C) grid + C priors (vocabulary-bounded, gated broadcast for
    the scoring join); scoring is one token-keyed join + per-(doc,
    class) map-side-combinable aggregate; the confusion matrix is C²
    rows however big the corpus."""
    docs = table(spark, sf_dir, "documents")
    dt = (
        docs.select(
            "doc_id", "lang", F.explode(T.tokenize(F.col("text"))).alias("w")
        )
        .groupBy("doc_id", "lang", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    cls = (
        dt.groupBy(F.col("lang").alias("c"))
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs_c"),
            F.sum("cnt").cast("bigint").alias("tot_c"),
        )
        .localCheckpoint(eager=True)
    )
    vocab = dt.select("w").distinct()
    # both model scalars in ONE job (two 1-row aggregates crossed),
    # instead of a collect for N and a separate count for V
    scal = (
        cls.agg(F.sum("n_docs_c").alias("nd"))
        .crossJoin(vocab.agg(F.count(F.lit(1)).alias("nv")))
        .collect()[0]
    )
    n_docs, v = scal["nd"], scal["nv"]
    if not n_docs or v == 0:
        # degenerate corpus (no content tokens anywhere): the oracle's
        # confusion CTE is empty — mirror it instead of crashing on
        # float(None) / log of an empty-vocabulary model
        return spark.createDataFrame(
            [], "lang string, predicted string, n_docs long, accuracy double"
        )
    tc = dt.groupBy(F.col("lang").alias("c"), "w").agg(
        F.sum("cnt").cast("bigint").alias("n_cw")
    )
    grid = (
        cls.crossJoin(vocab)
        .join(tc, ["c", "w"], "left")
        .select(
            "c",
            "w",
            F.round(
                F.log(
                    (F.coalesce(F.col("n_cw"), F.lit(0)) + 1).cast("double")
                    / (F.col("tot_c") + F.lit(v))
                ),
                9,
            )
            .cast(_ML2_DEC.lower())
            .alias("term"),
        )
        .localCheckpoint(eager=True)
    )
    prior = cls.select(
        "c",
        F.round(
            F.log(F.col("n_docs_c").cast("double") / F.lit(float(n_docs))), 9
        )
        .cast(_ML2_DEC.lower())
        .alias("p"),
    )
    score = (
        dt.join(gated_broadcast(grid), "w")
        .join(F.broadcast(prior), "c")
        .groupBy("doc_id", "lang", "c")
        .agg(
            (
                F.sum(F.col("cnt").cast("decimal(9,0)") * F.col("term"))
                + F.any_value(F.col("p"))
            ).alias("s")
        )
    )
    from pyspark.sql.window import Window

    w_ = Window.partitionBy("doc_id").orderBy(F.col("s").desc(), F.col("c"))
    pred = (
        score.withColumn("rn", F.row_number().over(w_))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", F.col("c").alias("predicted"))
    )
    conf = (
        pred.groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .localCheckpoint(eager=True)
    )
    acc = conf.agg(
        (
            F.sum(
                F.when(
                    F.col("lang") == F.col("predicted"), F.col("n_docs")
                ).otherwise(0)
            ).cast("double")
            / F.sum("n_docs")
        ).alias("accuracy")
    )
    return conf.crossJoin(F.broadcast(acc))


# ---------------------------------------------------------------------------
# ml3 — decision-stump training (exact split search over prefix sums)
# ---------------------------------------------------------------------------

STUMP_SCALE = 10 ** 9
#: same target as ml1: the document is "long" (n_chars >= threshold)
STUMP_LABEL_CHARS = PERCEPTRON_LABEL_CHARS


def _ml3_oracle() -> str:
    s = STUMP_SCALE
    return f"""
WITH feat AS (
  SELECT CASE WHEN n_chars >= {STUMP_LABEL_CHARS} THEN 1 ELSE 0 END AS y,
         len(string_split_regex(trim(text), '\\s+')) AS n_words,
         len(list_distinct(string_split_regex(trim(text), '\\s+')))
           AS n_distinct
  FROM documents
),
longf AS (
  SELECT 'n_words' AS feature, n_words AS v, y FROM feat
  UNION ALL
  SELECT 'n_distinct' AS feature, n_distinct AS v, y FROM feat
),
cnts AS (
  SELECT feature, v,
         CAST(SUM(y) AS BIGINT) AS p,
         CAST(SUM(1 - y) AS BIGINT) AS n
  FROM longf GROUP BY feature, v
),
pre AS (
  SELECT feature, v,
         CAST(SUM(p) OVER w AS BIGINT) AS pl,
         CAST(SUM(n) OVER w AS BIGINT) AS nl,
         CAST(SUM(p) OVER (PARTITION BY feature) AS BIGINT) AS pt,
         CAST(SUM(n) OVER (PARTITION BY feature) AS BIGINT) AS nt
  FROM cnts
  WINDOW w AS (PARTITION BY feature ORDER BY v
               ROWS UNBOUNDED PRECEDING)
),
scored AS (
  SELECT feature, v AS threshold,
         pl, nl, pt - pl AS pr, nt - nl AS nr,
         CAST({{hu_l}} + {{hu_r}} AS BIGINT) AS score_scaled
  FROM pre
  WHERE pl + nl > 0 AND (pt - pl) + (nt - nl) > 0
),
best AS (
  SELECT * FROM scored
  ORDER BY score_scaled DESC, feature, threshold LIMIT 1
)
SELECT feature, threshold, score_scaled,
       pl + nl AS n_left, pr + nr AS n_right,
       CAST(CASE WHEN pl * 2 >= pl + nl THEN 1 ELSE 0 END AS INTEGER)
         AS pred_left,
       CAST(CASE WHEN pr * 2 >= pr + nr THEN 1 ELSE 0 END AS INTEGER)
         AS pred_right,
       GREATEST(pl, nl) + GREATEST(pr, nr) AS n_correct,
       CAST(GREATEST(pl, nl) + GREATEST(pr, nr) AS DOUBLE)
         / (pl + nl + pr + nr) AS accuracy
FROM best
""".format(
        hu_l=f"((2 * (CAST(pl AS HUGEINT) * pl"
        f" + CAST(nl AS HUGEINT) * nl) * {s} + (pl + nl))"
        f" // (2 * (pl + nl)))",
        hu_r=f"((2 * (CAST(pt - pl AS HUGEINT) * (pt - pl)"
        f" + CAST(nt - nl AS HUGEINT) * (nt - nl)) * {s}"
        f" + ((pt - pl) + (nt - nl)))"
        f" // (2 * ((pt - pl) + (nt - nl))))",
    )


@register("ml3_decision_stump", _ml3_oracle())
def ml3_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump TRAINING (a depth-1 CART split, the weak learner
    under every boosted-tree stack): exhaustive best-split search over
    every distinct value of every candidate feature, maximizing the
    purity score Σ_side (p²+n²)/n_side (the Gini-impurity argmin in its
    integer-friendly form), then the fitted stump as one row — feature,
    threshold, leaf sizes, leaf predictions and training accuracy
    (98.4 % on this corpus's long-doc target at sf0.01 — the split the
    perceptron ml1 can only approximate linearly).

    Exactness: class counts per candidate come from an integer prefix
    sum over the per-(feature, value) aggregate; the purity score is
    two explicit half-up divisions in 1e-9 fixed point, with the
    2·(p²+n²)·S numerator carried in 128-bit-equivalent arithmetic
    (HUGEINT / DECIMAL(38,0)) so the binding bound is the BIGINT
    result ≈ p·S < 2^63 — ~9.2e9 positives per feature, not the ~7e4
    a 64-bit numerator would allow (documented, not silent); the
    argmax runs on exact BIGINTs with (feature, threshold) tiebreaks;
    accuracy is ONE IEEE division of exact integers.

    Scale shape: ONE documents scan fans out map-side into the
    (feature, value) long format; candidate stats are a bounded
    aggregate (distinct values per feature ≈ document-length range,
    corpus-size independent); the split search is a window + top-1 over
    that bounded table — TakeOrderedAndProject, never a corpus-sized
    sort."""
    from pyspark.sql.window import Window

    s = STUMP_SCALE
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    feat = docs.select(
        F.when(F.col("n_chars") >= STUMP_LABEL_CHARS, 1)
        .otherwise(0)
        .alias("y"),
        F.size(toks).alias("n_words"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )
    longf = feat.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("n_words").alias("feature"),
                    F.col("n_words").cast("bigint").alias("v"),
                ),
                F.struct(
                    F.lit("n_distinct").alias("feature"),
                    F.col("n_distinct").cast("bigint").alias("v"),
                ),
            )
        ).alias("fv"),
        "y",
    ).select("fv.feature", "fv.v", "y")
    cnts = longf.groupBy("feature", "v").agg(
        F.sum("y").cast("bigint").alias("p"),
        F.sum(1 - F.col("y")).cast("bigint").alias("n"),
    )
    w_cum = (
        Window.partitionBy("feature")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("feature")
    pre = cnts.select(
        "feature",
        "v",
        F.sum("p").over(w_cum).cast("bigint").alias("pl"),
        F.sum("n").over(w_cum).cast("bigint").alias("nl"),
        F.sum("p").over(w_all).cast("bigint").alias("pt"),
        F.sum("n").over(w_all).cast("bigint").alias("nt"),
    )
    pr = F.col("pt") - F.col("pl")
    nr = F.col("nt") - F.col("nl")
    scored = pre.filter(
        ((F.col("pl") + F.col("nl")) > 0) & ((pr + nr) > 0)
    ).select(
        "feature",
        F.col("v").alias("threshold"),
        "pl",
        "nl",
        pr.alias("pr"),
        nr.alias("nr"),
        (
            F.expr(
                f"(2 * (CAST(pl AS DECIMAL(38,0)) * pl"
                f" + CAST(nl AS DECIMAL(38,0)) * nl) * {s} + (pl + nl))"
                f" div (2 * (pl + nl))"
            )
            + F.expr(
                f"(2 * (CAST(pt - pl AS DECIMAL(38,0)) * (pt - pl)"
                f" + CAST(nt - nl AS DECIMAL(38,0)) * (nt - nl))"
                f" * {s} + ((pt - pl) + (nt - nl)))"
                f" div (2 * ((pt - pl) + (nt - nl)))"
            )
        ).alias("score_scaled"),
    )
    best = scored.orderBy(
        F.col("score_scaled").desc(), "feature", "threshold"
    ).limit(1)
    n_left = F.col("pl") + F.col("nl")
    n_right = F.col("pr") + F.col("nr")
    correct = F.greatest(F.col("pl"), F.col("nl")) + F.greatest(
        F.col("pr"), F.col("nr")
    )
    return best.select(
        "feature",
        "threshold",
        "score_scaled",
        n_left.alias("n_left"),
        n_right.alias("n_right"),
        F.when(F.col("pl") * 2 >= n_left, 1).otherwise(0)
        .cast("int")
        .alias("pred_left"),
        F.when(F.col("pr") * 2 >= n_right, 1).otherwise(0)
        .cast("int")
        .alias("pred_right"),
        correct.alias("n_correct"),
        (correct.cast("double") / (n_left + n_right)).alias("accuracy"),
    )


# ---------------------------------------------------------------------------
# mf1 — one ALS half-step: exact user factors over the purchase matrix
# ---------------------------------------------------------------------------

#: rank-2 item-factor init derived arithmetically from the part key (a
#: deterministic stand-in for a previous iteration's item factors) and
#: the ridge term that keeps every per-user normal-equation system
#: invertible. Small integers so every cross-product stays exact.
MF1_RIDGE = 1
MF1_TOP_K = 20

_MF1_ORACLE = f"""
WITH ratings AS (
  SELECT o.o_custkey AS custkey, l.l_partkey AS partkey,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
v AS (
  SELECT custkey, c,
         CAST(1 + partkey % 7 AS BIGINT) AS v1,
         CAST(1 + partkey % 11 AS BIGINT) AS v2
  FROM ratings
),
ne AS (
  SELECT custkey,
         CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(v1 * v1) AS BIGINT) + {MF1_RIDGE} AS a11,
         CAST(SUM(v1 * v2) AS BIGINT) AS a12,
         CAST(SUM(v2 * v2) AS BIGINT) + {MF1_RIDGE} AS a22,
         CAST(SUM(c * v1) AS BIGINT) AS b1,
         CAST(SUM(c * v2) AS BIGINT) AS b2
  FROM v GROUP BY custkey
),
solved AS (
  SELECT custkey, n_items,
         CAST(a22 * b1 - a12 * b2 AS DOUBLE)
           / CAST(a11 * a22 - a12 * a12 AS DOUBLE) AS u1,
         CAST(a11 * b2 - a12 * b1 AS DOUBLE)
           / CAST(a11 * a22 - a12 * a12 AS DOUBLE) AS u2
  FROM ne
)
SELECT custkey, n_items, u1, u2,
       u1 * u1 + u2 * u2 AS factor_norm2
FROM solved
ORDER BY factor_norm2 DESC, custkey
LIMIT {MF1_TOP_K}
"""


@register("mf1_als_user_factors", _MF1_ORACLE)
def mf1_als_user_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact ALS half-step (Zhou et al. 2008, the canonical
    large-scale Spark ML workload): with rank-2 item factors held fixed
    (deterministic arithmetic init standing in for the previous
    iteration), solve every user's ridge normal equations
    (A + λI)u = b in closed form and emit the top-{MF1_TOP_K} users by
    factor energy — the recommender/embedding-training shape the
    engine's ml-family (perceptron, NB, stump) did not yet cover.

    Exactness: ratings are exact integer counts; A's entries and b are
    exact BIGINT cross-products; the 2×2 solve is the adjugate form, so
    each factor component is ONE IEEE division of exact integers, the
    energy is a fixed double chain over those engine-identical values,
    and the (norm DESC, custkey) order is bit-identical cross-engine.
    λ = {MF1_RIDGE} makes A + λI positive definite, so the determinant
    is strictly positive — no /0 branch exists.

    Scale shape: ONE fact-table join shuffles on orderkey, the rating
    aggregate and the normal-equation aggregate collapse
    map-side-combinably onto custkey (one key shuffle — this is
    exactly how MLlib's ALS computes its user updates, minus the
    block-to-block factor exchange that a FIXED item side makes
    unnecessary); top-k compiles to TakeOrderedAndProject. Nothing is
    ever user×item dense."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    ratings = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    v1 = (1 + F.col("partkey") % 7).cast("bigint")
    v2 = (1 + F.col("partkey") % 11).cast("bigint")
    ne = (
        ratings.select("custkey", "c", v1.alias("v1"), v2.alias("v2"))
        .groupBy("custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            (F.sum(F.col("v1") * F.col("v1")).cast("bigint") + MF1_RIDGE).alias("a11"),
            F.sum(F.col("v1") * F.col("v2")).cast("bigint").alias("a12"),
            (F.sum(F.col("v2") * F.col("v2")).cast("bigint") + MF1_RIDGE).alias("a22"),
            F.sum(F.col("c") * F.col("v1")).cast("bigint").alias("b1"),
            F.sum(F.col("c") * F.col("v2")).cast("bigint").alias("b2"),
        )
    )
    det = (
        F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12")
    ).cast("double")
    u1 = (F.col("a22") * F.col("b1") - F.col("a12") * F.col("b2")).cast(
        "double"
    ) / det
    u2 = (F.col("a11") * F.col("b2") - F.col("a12") * F.col("b1")).cast(
        "double"
    ) / det
    solved = ne.select(
        "custkey", "n_items", u1.alias("u1"), u2.alias("u2")
    )
    return (
        solved.select(
            "*",
            (
                F.col("u1") * F.col("u1") + F.col("u2") * F.col("u2")
            ).alias("factor_norm2"),
        )
        .orderBy(F.col("factor_norm2").desc(), "custkey")
        .limit(MF1_TOP_K)
    )
