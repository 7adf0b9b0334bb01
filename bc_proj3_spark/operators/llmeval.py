"""LLM evaluation harness operators: pass@k and corpus BLEU.

The engine already evaluates RETRIEVAL (s9 recall, hs3 nDCG, hs4 MAP,
hs5 MRR) and CALIBRATION (cal1/cal3); this module adds the two
generation-side eval aggregates a training-data pipeline publishes next
to its corpora:

- ev1: the unbiased pass@k estimator (1 - C(n-c,k)/C(n,k)) over
  per-task sample outcomes — the functional-correctness metric of
  code-generation benchmarks, computed here over a deterministic
  task/sample construction on the events table (task = user, sample =
  the user's first N_SAMP events by event_id, success = a 'purchase'
  outcome) so the oracle can value-match.
- ev2: corpus-level BLEU components over deterministically paired
  documents (hypothesis doc 2i vs reference doc 2i+1) — clipped
  modified n-gram precisions, the brevity term, and the 2-gram
  log-BLEU on the repo's ROUND(LN, 9) lattice.

Reference scope: the reference pipeline (infinit3labs/bc-proj3,
notebooks/gold_article_scoring.py) ends at heuristic document scores;
model-eval aggregates are the engine's LLM-pipeline extension of that
scoring lane (SURVEY.md §2.11 additions).

Exactness: every count is an exact BIGINT; pass@k's falling factorials
are explicit 10-factor integer products (max 20!/10! ~ 6.7e11, far
inside int64) and the estimator is ONE IEEE division by a compile-time
constant; BLEU precisions are single IEEE divisions of exact clipped
counts; the only transcendental (LN) goes through the established
ROUND(LN(x), 9) lattice (t21/g9/ml2 discipline).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bc_proj3_spark.plans.tables import table
from bc_proj3_spark.registry import register

# ---------------------------------------------------------------------------
# ev1 — pass@k over per-task sample outcomes
# ---------------------------------------------------------------------------

N_SAMP = 20  # samples per task (tasks with fewer are not evaluable)
PASS_K = 10  # the k of pass@k
#: ff(N_SAMP, PASS_K) = 20*19*...*11 — the constant denominator
_FF_N = math.prod(range(N_SAMP - PASS_K + 1, N_SAMP + 1))


def _sql_ff(m: str) -> str:
    """Falling factorial ff(m, PASS_K) as an explicit product; hits a
    zero factor (and stays zero) whenever m < PASS_K, which is exactly
    the C(m, k) = 0 case the estimator needs."""
    return " * ".join(f"({m} - {i})" for i in range(PASS_K))


_EV1_ORACLE = f"""
WITH ranked AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
  FROM events
),
agg AS (
  SELECT user_id AS task_id,
         CAST(COUNT(*) AS BIGINT) AS n_samples,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_correct
  FROM ranked WHERE rn <= {N_SAMP} GROUP BY user_id
)
SELECT task_id, n_samples, n_correct,
       CAST(n_correct AS DOUBLE) / {N_SAMP} AS pass_at_1,
       1 - CAST({_sql_ff(f'({N_SAMP} - n_correct)')} AS DOUBLE)
           / {_FF_N} AS pass_at_{PASS_K}
FROM agg WHERE n_samples = {N_SAMP}
"""


@register("ev1_pass_at_k", _EV1_ORACLE)
def ev1_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unbiased pass@k estimator per task: with n samples and c
    successes, pass@k = 1 - C(n-c,k)/C(n,k) — the probability that at
    least one of k drawn samples succeeds, THE metric of
    functional-correctness eval (HumanEval-style harnesses). Task =
    user, samples = the user's first {N_SAMP} events in event_id
    order, success = a 'purchase' outcome; tasks with fewer than
    {N_SAMP} samples are not evaluable and are excluded (the standard
    harness contract — the estimator is undefined for n < k... n).

    Exactness: C(n-c,k)/C(n,k) collapses to the falling-factorial
    ratio ff(n-c,k)/ff(n,k); with n pinned to {N_SAMP} the denominator
    is the compile-time constant {_FF_N} and the numerator is an
    explicit {PASS_K}-factor exact-integer product (which passes
    through a zero factor exactly when n-c < k, yielding the correct
    pass@k = 1), so each output is ONE IEEE division of exact ints.

    Scale shape: one rank window per task partition (the cap bounds
    every task's contribution), one groupBy task — at any corpus size
    the aggregate is |tasks| rows, and the per-task state is two
    BIGINTs."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    samp = (
        ev.select("user_id", "event_type", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= N_SAMP)
    )
    agg = (
        samp.groupBy(F.col("user_id").alias("task_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_samples"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_correct"),
        )
        .filter(F.col("n_samples") == N_SAMP)
    )
    ff_num = F.expr(_sql_ff(f"({N_SAMP} - n_correct)"))
    return agg.select(
        "task_id",
        "n_samples",
        "n_correct",
        (F.col("n_correct").cast("double") / F.lit(N_SAMP)).alias(
            "pass_at_1"
        ),
        (F.lit(1) - ff_num.cast("double") / F.lit(_FF_N)).alias(
            f"pass_at_{PASS_K}"
        ),
    )


# ---------------------------------------------------------------------------
# ev2 — corpus BLEU components over paired documents
# ---------------------------------------------------------------------------


_EV2_ORACLE = """
WITH pairs AS (
  SELECT h.doc_id // 2 AS pair_id,
         string_split_regex(trim(h.text), '\\s+') AS hyp,
         string_split_regex(trim(r.text), '\\s+') AS ref
  FROM documents h
  JOIN documents r ON r.doc_id = h.doc_id + 1
  WHERE h.doc_id % 2 = 0
),
uni AS (
  SELECT pair_id, g,
         CAST(COUNT(*) FILTER (WHERE side = 'h') AS BIGINT) AS hc,
         CAST(COUNT(*) FILTER (WHERE side = 'r') AS BIGINT) AS rc
  FROM (
    SELECT pair_id, 'h' AS side, unnest(hyp) AS g FROM pairs
    UNION ALL
    SELECT pair_id, 'r', unnest(ref) FROM pairs
  ) t GROUP BY pair_id, g
),
bi AS (
  SELECT pair_id, g,
         CAST(COUNT(*) FILTER (WHERE side = 'h') AS BIGINT) AS hc,
         CAST(COUNT(*) FILTER (WHERE side = 'r') AS BIGINT) AS rc
  FROM (
    SELECT pair_id, 'h' AS side,
           unnest(list_transform(
             generate_series(1, greatest(len(hyp) - 1, 0)),
             i -> hyp[i] || ' ' || hyp[i+1])) AS g
    FROM pairs
    UNION ALL
    SELECT pair_id, 'r',
           unnest(list_transform(
             generate_series(1, greatest(len(ref) - 1, 0)),
             i -> ref[i] || ' ' || ref[i+1]))
    FROM pairs
  ) t GROUP BY pair_id, g
),
tot AS (
  SELECT CAST(SUM(len(hyp)) AS BIGINT) AS hyp_len,
         CAST(SUM(len(ref)) AS BIGINT) AS ref_len,
         CAST(SUM(greatest(len(hyp) - 1, 0)) AS BIGINT) AS hyp_bi
  FROM pairs
),
c1 AS (SELECT CAST(SUM(LEAST(hc, rc)) AS BIGINT) AS clip1 FROM uni),
c2 AS (SELECT CAST(SUM(LEAST(hc, rc)) AS BIGINT) AS clip2 FROM bi)
SELECT hyp_len, ref_len, clip1, clip2,
       CASE WHEN hyp_len > 0
            THEN CAST(clip1 AS DOUBLE) / hyp_len END AS p1,
       CASE WHEN hyp_bi > 0
            THEN CAST(clip2 AS DOUBLE) / hyp_bi END AS p2,
       CASE WHEN hyp_len > 0
            THEN LEAST(CAST(0 AS DOUBLE),
                       1 - CAST(ref_len AS DOUBLE) / hyp_len)
       END AS brevity_log,
       CASE WHEN clip1 > 0 AND clip2 > 0
            THEN ROUND(LN(CAST(clip1 AS DOUBLE) / hyp_len), 9) / 2
               + ROUND(LN(CAST(clip2 AS DOUBLE) / hyp_bi), 9) / 2
               + LEAST(CAST(0 AS DOUBLE),
                       1 - CAST(ref_len AS DOUBLE) / hyp_len)
       END AS log_bleu2
FROM tot, c1, c2
"""


@register("ev2_bleu_corpus", _EV2_ORACLE)
def ev2_bleu_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level BLEU-2 between deterministically paired documents
    (hypothesis doc 2i vs reference doc 2i+1): clipped modified 1- and
    2-gram precisions, the brevity-penalty exponent, and the combined
    log-BLEU — the machine-translation/summarization eval aggregate,
    and in a data pipeline the standard similarity scorecard for
    paraphrase mining and distillation-output QA. Corpus-level (one
    row) by design: per-pair BLEU is noise on short texts AND hits
    ln(0) on zero-overlap pairs; the corpus aggregate is the number
    BLEU was defined as.

    Exactness: clipped counts are exact integers (per-pair per-gram
    LEAST of the two sides' counts, summed); each precision is ONE
    IEEE division of exact BIGINTs; LN goes through the repo's
    ROUND(LN(x), 9) lattice so both engines combine identical 9-dp
    values; the brevity exponent min(0, 1 - ref/hyp) stays in the
    log domain — no engine ever evaluates EXP.

    Scale shape: pairing is a doc-id-keyed self-join (shuffle on the
    id, no skew — ids are unique); n-gram counts shuffle on (pair_id,
    gram) with map-side combine; everything reduces to a 1-row
    aggregate. No vocabulary or pair list is ever collected."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    h = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(
            (F.col("doc_id") / 2).cast("bigint").alias("pair_id"),
            F.col("doc_id").alias("h_id"),
            toks.alias("hyp"),
        )
    )
    r = docs.select(
        (F.col("doc_id") - 1).alias("h_id"), toks.alias("ref")
    )
    from pyspark import StorageLevel

    # r11 (guide §1.2): the five consumers below (two gram sides x two
    # orders + the totals) each re-ran the tokenize+pairing join.
    # Tagged-concat explode folds each clipped() to ONE pass (ev3's
    # fix), and the persisted pairing is filled by c1's broadcast-build
    # job, so the regex tokenize runs once per call instead of 5x.
    pairs = (
        h.join(r, "h_id")
        .select("pair_id", "hyp", "ref")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def grams2(col):
        return F.expr(
            f"transform(slice({col}, 1, greatest(size({col}) - 1, 0)),"
            f" (x, i) -> concat(x, ' ', {col}[i + 1]))"
        )

    def clipped(hyp_grams, ref_grams, out_name):
        sides = pairs.select(
            "pair_id",
            F.explode(
                F.concat(
                    F.transform(
                        hyp_grams,
                        lambda g: F.struct(
                            F.lit("h").alias("side"), g.alias("g")
                        ),
                    ),
                    F.transform(
                        ref_grams,
                        lambda g: F.struct(
                            F.lit("r").alias("side"), g.alias("g")
                        ),
                    ),
                )
            ).alias("sg"),
        ).select(
            "pair_id",
            F.col("sg.side").alias("side"),
            F.col("sg.g").alias("g"),
        )
        cnt = sides.groupBy("pair_id", "g").agg(
            F.sum(F.when(F.col("side") == "h", 1).otherwise(0))
            .cast("bigint")
            .alias("hc"),
            F.sum(F.when(F.col("side") == "r", 1).otherwise(0))
            .cast("bigint")
            .alias("rc"),
        )
        return cnt.agg(
            F.sum(F.least(F.col("hc"), F.col("rc")))
            .cast("bigint")
            .alias(out_name)
        )

    c1 = clipped(F.col("hyp"), F.col("ref"), "clip1")
    c2 = clipped(grams2("hyp"), grams2("ref"), "clip2")
    tot = pairs.agg(
        F.sum(F.size("hyp")).cast("bigint").alias("hyp_len"),
        F.sum(F.size("ref")).cast("bigint").alias("ref_len"),
        F.sum(F.greatest(F.size("hyp") - 1, F.lit(0)))
        .cast("bigint")
        .alias("hyp_bi"),
    )
    # Degenerate corpora are pinned with the SAME CASE logic as the
    # oracle: a zero denominator yields NULL (Spark's 0.0/0 is NaN,
    # DuckDB's is NULL), and zero n-gram overlap yields NULL log-BLEU
    # (log BLEU is -inf there; Spark LOG(0) is NULL but DuckDB LN(0)
    # raises) — neither engine's native behavior agrees, so both sides
    # guard explicitly (ev3's chrf2 discipline).
    p1 = F.when(
        F.col("hyp_len") > 0, F.col("clip1").cast("double") / F.col("hyp_len")
    )
    p2 = F.when(
        F.col("hyp_bi") > 0, F.col("clip2").cast("double") / F.col("hyp_bi")
    )
    brevity = F.when(
        F.col("hyp_len") > 0,
        F.least(
            F.lit(0.0),
            F.lit(1) - F.col("ref_len").cast("double") / F.col("hyp_len"),
        ),
    )
    return (
        tot.crossJoin(F.broadcast(c1))
        .crossJoin(F.broadcast(c2))
        .select(
            "hyp_len",
            "ref_len",
            "clip1",
            "clip2",
            p1.alias("p1"),
            p2.alias("p2"),
            brevity.alias("brevity_log"),
            F.when(
                (F.col("clip1") > 0) & (F.col("clip2") > 0),
                F.round(F.log(p1), 9) / 2
                + F.round(F.log(p2), 9) / 2
                + brevity,
            ).alias("log_bleu2"),
        )
    )


# ---------------------------------------------------------------------------
# ev3 — corpus character-n-gram F-score (chrF-style) over the ev2 pairs
# ---------------------------------------------------------------------------

CHR_N = 4  # character n-gram width (chrF uses 1..6; one width keeps
#            the aggregate single-pass — stated in the output name)


_EV3_ORACLE = f"""
WITH pairs AS (
  SELECT h.doc_id // 2 AS pair_id,
         lower(h.text) AS hyp, lower(r.text) AS ref
  FROM documents h
  JOIN documents r ON r.doc_id = h.doc_id + 1
  WHERE h.doc_id % 2 = 0
),
grams AS (
  SELECT pair_id, g,
         CAST(COUNT(*) FILTER (WHERE side = 'h') AS BIGINT) AS hc,
         CAST(COUNT(*) FILTER (WHERE side = 'r') AS BIGINT) AS rc
  FROM (
    SELECT pair_id, 'h' AS side,
           unnest(list_transform(
             generate_series(1, greatest(length(hyp) - {CHR_N - 1}, 0)),
             i -> substr(hyp, i, {CHR_N}))) AS g
    FROM pairs
    UNION ALL
    SELECT pair_id, 'r',
           unnest(list_transform(
             generate_series(1, greatest(length(ref) - {CHR_N - 1}, 0)),
             i -> substr(ref, i, {CHR_N})))
    FROM pairs
  ) t GROUP BY pair_id, g
),
tot AS (
  SELECT CAST(SUM(greatest(length(hyp) - {CHR_N - 1}, 0)) AS BIGINT)
           AS hyp_grams,
         CAST(SUM(greatest(length(ref) - {CHR_N - 1}, 0)) AS BIGINT)
           AS ref_grams
  FROM pairs
),
cl AS (SELECT CAST(SUM(LEAST(hc, rc)) AS BIGINT) AS clip FROM grams)
SELECT hyp_grams, ref_grams, clip,
       CAST(clip AS DOUBLE) / hyp_grams AS chr_precision,
       CAST(clip AS DOUBLE) / ref_grams AS chr_recall,
       CASE WHEN 4 * (CAST(clip AS DOUBLE) / hyp_grams)
                 + (CAST(clip AS DOUBLE) / ref_grams) > 0
            THEN 5 * (CAST(clip AS DOUBLE) / hyp_grams)
                   * (CAST(clip AS DOUBLE) / ref_grams)
                 / (4 * (CAST(clip AS DOUBLE) / hyp_grams)
                    + (CAST(clip AS DOUBLE) / ref_grams))
            ELSE CAST(0 AS DOUBLE) END AS chrf2
FROM tot, cl
"""


@register("ev3_chargram_fscore", _EV3_ORACLE)
def ev3_chargram_fscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus character-{CHR_N}-gram F-score (the chrF family's
    recall-weighted F2) over ev2's deterministic document pairing —
    the tokenization-free similarity scorecard: BLEU collapses on
    morphology-rich or whitespace-poor text because it scores whole
    tokens; character n-grams credit partial word overlap, which is
    why chrF is the WMT-standard companion metric. In a data pipeline
    the pair (ev2, ev3) disagreeing is itself the signal — token-level
    divergence with character-level agreement means tokenizer drift,
    not content drift.

    Exactness: clipped counts are exact integers (per-pair per-gram
    LEAST, summed); precision and recall are single IEEE divisions of
    exact BIGINTs; F2 combines the two identical doubles with the
    same literal arithmetic on both engines, with the zero-overlap
    corpus pinned to 0 (not NaN) by the same CASE on both sides.

    Scale shape: ev2's — the pairing is a doc-id-keyed self-join; gram
    counts shuffle on (pair_id, gram) with map-side combine; the
    result is a 1-row aggregate. Character grams multiply row volume
    by ~|text| — the shuffle payload is the 4-char gram plus two
    bigints, and at 100 TB the same plan holds because nothing is ever
    collected or broadcast."""
    docs = table(spark, sf_dir, "documents")
    h = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(
            (F.col("doc_id") / 2).cast("bigint").alias("pair_id"),
            F.col("doc_id").alias("h_id"),
            F.lower(F.col("text")).alias("hyp"),
        )
    )
    r = docs.select(
        (F.col("doc_id") - 1).alias("h_id"),
        F.lower(F.col("text")).alias("ref"),
    )
    pairs = h.join(r, "h_id").select("pair_id", "hyp", "ref")

    def grams(col):
        # sequence(1, 0) counts DOWN to [1, 0] on Spark (step defaults
        # to -1 when start > stop) while the oracle's generate_series
        # is empty — texts shorter than CHR_N must short-circuit to an
        # empty array (same mask as shingles()/textstats trigrams).
        return F.expr(
            f"CASE WHEN length({col}) >= {CHR_N} THEN"
            f" transform(sequence(1, length({col}) - {CHR_N - 1}),"
            f" i -> substring({col}, i, {CHR_N}))"
            f" ELSE CAST(array() AS array<string>) END"
        )

    # r11 (guide §1.2): the old shape ran the doc pairing THREE times —
    # once per unionAll gram branch plus the totals aggregate. The
    # pairing is now PERSISTED (cl's broadcast build is the first job
    # and fills it; the union branches and tot read cached rows).
    # Two alternatives were A/B'd and REJECTED: (a) tagged-concat
    # struct explode of both sides in one projection — a WIN for ev2's
    # word bigrams but a measured ev3 regression (2.56 → 3.58 s
    # min-of-5 interleaved: char-4-gram arrays are ~|text|-sized, and
    # materializing the concat of two struct arrays per row costs more
    # than the second cached-union read it saves); (b) deriving the
    # totals from sum(hc)/sum(rc) of the gram aggregate — on a
    # pairs-nonempty/grams-empty corpus the global sum over zero rows
    # is NULL where the oracle's sum of greatest(len-3, 0) over pair
    # rows is 0 — tot stays its own aggregate over the cached pairing.
    from pyspark import StorageLevel

    pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    sides = pairs.select(
        "pair_id", F.lit("h").alias("side"), F.explode(grams("hyp")).alias("g")
    ).unionAll(
        pairs.select(
            "pair_id", F.lit("r").alias("side"),
            F.explode(grams("ref")).alias("g"),
        )
    )
    cl = (
        sides.groupBy("pair_id", "g")
        .agg(
            F.sum(F.when(F.col("side") == "h", 1).otherwise(0))
            .cast("bigint")
            .alias("hc"),
            F.sum(F.when(F.col("side") == "r", 1).otherwise(0))
            .cast("bigint")
            .alias("rc"),
        )
        .agg(
            F.sum(F.least(F.col("hc"), F.col("rc")))
            .cast("bigint")
            .alias("clip")
        )
    )
    tot = pairs.agg(
        F.sum(F.greatest(F.length("hyp") - (CHR_N - 1), F.lit(0)))
        .cast("bigint")
        .alias("hyp_grams"),
        F.sum(F.greatest(F.length("ref") - (CHR_N - 1), F.lit(0)))
        .cast("bigint")
        .alias("ref_grams"),
    )
    p = F.col("clip").cast("double") / F.col("hyp_grams")
    rr = F.col("clip").cast("double") / F.col("ref_grams")
    return tot.crossJoin(F.broadcast(cl)).select(
        "hyp_grams",
        "ref_grams",
        "clip",
        p.alias("chr_precision"),
        rr.alias("chr_recall"),
        F.when(4 * p + rr > 0, 5 * p * rr / (4 * p + rr))
        .otherwise(F.lit(0.0))
        .alias("chrf2"),
    )


# ---------------------------------------------------------------------------
# rag1 — retrieval context assembly under a token budget
# ---------------------------------------------------------------------------

RAG_BUDGET = 512  # context-window token budget per query


def _rag1_oracle() -> str:
    from bc_proj3_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        _SQL_BASE,
        _sql_dot,
    )
    from bc_proj3_spark.operators.textstats import BPE_RE

    return f"""
WITH {_SQL_BASE},
toks AS (
  SELECT doc_id, len(regexp_extract_all(lower(text), '{BPE_RE}'))
           AS n_tokens
  FROM documents
),
scored AS (
  SELECT query_id, e.vec_id,
         {_sql_dot('qv', 'v')} / (qn * nrm) AS cosine
  FROM q, e
  WHERE e.vec_id <> query_id
),
topk AS (
  SELECT query_id, vec_id, rn FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
    FROM scored
  ) t WHERE rn <= {TOP_K}
),
ctx AS (
  SELECT k.query_id, k.rn, t.n_tokens,
         SUM(t.n_tokens) OVER (
           PARTITION BY k.query_id ORDER BY k.rn
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM topk k JOIN toks t ON t.doc_id = k.vec_id
)
SELECT query_id,
       CAST(COUNT(*) AS BIGINT) AS n_retrieved,
       CAST(SUM(CASE WHEN cum <= {RAG_BUDGET} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_admitted,
       CAST(SUM(CASE WHEN cum <= {RAG_BUDGET} THEN n_tokens ELSE 0 END)
            AS BIGINT) AS tokens_used,
       CAST(SUM(CASE WHEN cum <= {RAG_BUDGET} THEN n_tokens ELSE 0 END)
            AS DOUBLE) / {RAG_BUDGET} AS budget_fill
FROM ctx GROUP BY query_id
"""


@register("rag1_context_budget", _rag1_oracle())
def rag1_context_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG context assembly under a token budget: take each query's
    exact cosine top-k (s1's ranking), join every candidate's BPE
    token cost (t5's measure, embeddings vec_id = documents doc_id),
    and admit documents in RANK ORDER while the running total stays
    within the {RAG_BUDGET}-token context budget — the greedy
    rank-priority fill every RAG serving stack runs per request. The
    report (retrieved vs admitted vs tokens used vs budget fill) is
    the capacity-planning table: a fill rate near 1.0 with few
    admitted docs means long documents are crowding out diversity and
    the chunking policy (ch1) needs to move.

    Exactness: the ranking is the module's bit-identical cosine with
    vec_id tiebreaks; token costs and the rank-ordered running sum are
    exact integers (the cumulative window orders by the already-ranked
    rn — no double enters until the single terminal fill-rate
    division).

    Scale shape: s1's bounded brute-force ranking ({N_QUERIES}
    broadcast queries against one corpus scan), one doc-id-keyed join
    to the token costs, and a k-row-per-query window + aggregate —
    constant work per query regardless of corpus size."""
    from bc_proj3_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        _corpus,
        _dot,
        _queries,
        _ranked,
    )
    from bc_proj3_spark.operators.textstats import BPE_RE

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
    topk = _ranked(scored, "rn")
    toks = table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"),
        F.size(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit(BPE_RE), F.lit(0)
            )
        ).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ctx = topk.join(toks, "vec_id").select(
        "query_id",
        "rn",
        "n_tokens",
        F.sum("n_tokens").over(w).alias("cum"),
    )
    admitted = F.when(F.col("cum") <= RAG_BUDGET, 1).otherwise(0)
    adm_tokens = F.when(
        F.col("cum") <= RAG_BUDGET, F.col("n_tokens")
    ).otherwise(0)
    return ctx.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_retrieved"),
        F.sum(admitted).cast("bigint").alias("n_admitted"),
        F.sum(adm_tokens).cast("bigint").alias("tokens_used"),
        (F.sum(adm_tokens).cast("double") / F.lit(RAG_BUDGET)).alias(
            "budget_fill"
        ),
    )


# ---------------------------------------------------------------------------
# ev5 — per-pair token-level F1 (the SQuAD-style QA/extraction metric)
# ---------------------------------------------------------------------------

_EV5_ORACLE = """
WITH pairs AS (
  SELECT h.doc_id // 2 AS pair_id,
         string_split_regex(trim(h.text), '\\s+') AS hyp,
         string_split_regex(trim(r.text), '\\s+') AS ref
  FROM documents h
  JOIN documents r ON r.doc_id = h.doc_id + 1
  WHERE h.doc_id % 2 = 0
),
cnt AS (
  SELECT pair_id, g,
         CAST(COUNT(*) FILTER (WHERE side = 'h') AS BIGINT) AS hc,
         CAST(COUNT(*) FILTER (WHERE side = 'r') AS BIGINT) AS rc
  FROM (
    SELECT pair_id, 'h' AS side, unnest(hyp) AS g FROM pairs
    UNION ALL
    SELECT pair_id, 'r', unnest(ref) FROM pairs
  ) t GROUP BY pair_id, g
),
clips AS (
  SELECT pair_id, CAST(SUM(LEAST(hc, rc)) AS BIGINT) AS clip
  FROM cnt GROUP BY pair_id
),
lens AS (
  SELECT pair_id, CAST(len(hyp) AS BIGINT) AS hyp_len,
         CAST(len(ref) AS BIGINT) AS ref_len
  FROM pairs
),
m AS (
  SELECT l.pair_id, l.hyp_len, l.ref_len, COALESCE(c.clip, 0) AS clip,
         CASE WHEN l.hyp_len > 0
              THEN CAST(COALESCE(c.clip, 0) AS DOUBLE) / l.hyp_len
         END AS p,
         CASE WHEN l.ref_len > 0
              THEN CAST(COALESCE(c.clip, 0) AS DOUBLE) / l.ref_len
         END AS r
  FROM lens l LEFT JOIN clips c ON c.pair_id = l.pair_id
)
SELECT pair_id, hyp_len, ref_len, clip,
       p AS precision_tok, r AS recall_tok,
       CASE WHEN p + r > 0 THEN 2 * p * r / (p + r)
            ELSE CAST(0 AS DOUBLE) END AS f1
FROM m
"""


@register("ev5_token_f1", _EV5_ORACLE)
def ev5_token_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pair token-level F1 over ev2's deterministic pairing — the
    SQuAD/extraction-eval standard: bag-of-token clipped overlap,
    precision against the hypothesis length, recall against the
    reference length, harmonic mean. ev2/ev3 are corpus aggregates;
    ev5 is the GRANULAR table — the per-example scores an eval harness
    ranks, thresholds, and slices by segment, and the distillation-QA
    filter ("keep teacher outputs with F1 >= x against the gold").

    Exactness: clip counts are exact integers (per-gram LEAST summed);
    precision/recall are single IEEE divisions of exact BIGINTs; F1
    combines the two identical doubles with the same literal
    expression on both engines, with empty-side and zero-overlap pairs
    pinned by the same CASE on both (ev3's chrf2 discipline —
    zero-token sides yield NULL p/r, zero overlap yields F1 = 0).

    Scale shape: ev2's — doc-id-keyed pairing join, (pair_id, token)
    shuffle with map-side combine, then a pair-count-sized join of two
    pair-keyed aggregates. Nothing is collected or broadcast; at
    100 TB this is the same two-shuffle plan."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    h = docs.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") / 2).cast("bigint").alias("pair_id"),
        F.col("doc_id").alias("h_id"),
        toks.alias("hyp"),
    )
    r = docs.select(
        (F.col("doc_id") - 1).alias("h_id"), toks.alias("ref")
    )
    pairs = h.join(r, "h_id").select("pair_id", "hyp", "ref")
    # r11: tagged-concat explode — one pairing pass feeds both sides
    # (ev2/ev3's fix); the lens aggregate keeps its own cheap pass
    sides = pairs.select(
        "pair_id",
        F.explode(
            F.concat(
                F.transform(
                    F.col("hyp"),
                    lambda g: F.struct(F.lit("h").alias("side"), g.alias("g")),
                ),
                F.transform(
                    F.col("ref"),
                    lambda g: F.struct(F.lit("r").alias("side"), g.alias("g")),
                ),
            )
        ).alias("sg"),
    ).select("pair_id", F.col("sg.side").alias("side"), F.col("sg.g").alias("g"))
    clips = (
        sides.groupBy("pair_id", "g")
        .agg(
            F.sum(F.when(F.col("side") == "h", 1).otherwise(0))
            .cast("bigint")
            .alias("hc"),
            F.sum(F.when(F.col("side") == "r", 1).otherwise(0))
            .cast("bigint")
            .alias("rc"),
        )
        .groupBy("pair_id")
        .agg(F.sum(F.least("hc", "rc")).cast("bigint").alias("clip"))
    )
    lens = pairs.select(
        "pair_id",
        F.size("hyp").cast("bigint").alias("hyp_len"),
        F.size("ref").cast("bigint").alias("ref_len"),
    )
    m = lens.join(clips, "pair_id", "left").select(
        "pair_id",
        "hyp_len",
        "ref_len",
        F.coalesce(F.col("clip"), F.lit(0)).cast("bigint").alias("clip"),
    )
    p = F.when(
        F.col("hyp_len") > 0, F.col("clip").cast("double") / F.col("hyp_len")
    )
    rr = F.when(
        F.col("ref_len") > 0, F.col("clip").cast("double") / F.col("ref_len")
    )
    return m.select(
        "pair_id",
        "hyp_len",
        "ref_len",
        "clip",
        p.alias("precision_tok"),
        rr.alias("recall_tok"),
        F.when(p + rr > 0, 2 * p * rr / (p + rr))
        .otherwise(F.lit(0.0))
        .alias("f1"),
    )
