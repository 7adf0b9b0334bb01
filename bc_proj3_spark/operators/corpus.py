"""The end-to-end corpus build: filter → dedup → split, as ONE operator.

Every stage exists as its own registered, oracle-checked query (f1
quality filter, d6 dedup funnel, sp1 split assignment); this module
composes them into the artifact a pre-training data pipeline actually
ships — the document manifest: which docs made the corpus and which
split each landed in. Composition is by reusing the SAME builders and
the SAME oracle CTE text (imported, not re-derived), so the flagship
cannot drift from its stages.

Reference scope: the reference pipeline's bronze→silver→gold document
flow (notebooks/gold_*.py) ends at scored terms; an LLM-corpus build is
the engine's extension of that flow to training-data production.

Scale shape: f1 is scan-side + two combiner-absorbed agg passes; d6 is
the capped-LSH funnel (bucket-local candidates only); the final join
chain is doc-id-keyed shuffles; sp1's split is a map-side hash — no new
scale risk is introduced by composing them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bc_proj3_spark.functions.hashing import hash60, sql_hash60
from bc_proj3_spark.operators.dedup import _DEDUP_FUNNEL_CTES, d6_survivors_artifact
from bc_proj3_spark.operators.ranking import _F1_ORACLE, f1_passed_artifact
from bc_proj3_spark.operators.sampling import (
    TRAIN_PCT,
    VAL_PCT,
    _seeded,
    _sql_seeded,
)
from bc_proj3_spark.registry import register

# f1's oracle is a full statement; as a composition block we need its
# CTEs only (strip the leading WITH, keep everything up to the final
# SELECT, then re-expose its decision as one more CTE).
_F1_CTES, _F1_SELECT = _F1_ORACLE.split("SELECT d.doc_id", 1)
_F1_AS_CTE = (
    _F1_CTES.replace("WITH tok AS", "tok AS", 1).rstrip().rstrip(",")
    + ",\nf1_pass AS (\nSELECT d.doc_id"
    + _F1_SELECT
    + ")"
)

_PIPE1_ORACLE = f"""{_DEDUP_FUNNEL_CTES.rstrip()},
{_F1_AS_CTE}
SELECT s.doc_id,
       {sql_hash60(_sql_seeded('split', 'CAST(s.doc_id AS VARCHAR)'))} % 100
         AS bucket,
       CASE WHEN {sql_hash60(_sql_seeded('split', 'CAST(s.doc_id AS VARCHAR)'))} % 100 < {TRAIN_PCT} THEN 'train'
            WHEN {sql_hash60(_sql_seeded('split', 'CAST(s.doc_id AS VARCHAR)'))} % 100 < {VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM surv s
JOIN f1_pass f ON f.doc_id = s.doc_id
WHERE s.doc_id NOT IN (SELECT doc_id FROM dropped)
"""


@register("pipe1_corpus_build", _PIPE1_ORACLE)
def pipe1_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus manifest: documents that pass the quality filter (f1)
    AND survive the dedup funnel (d6), stamped with their deterministic
    train/val/test split (sp1's content-addressed hash). This is the
    pipeline's end product — the table a trainer reads. Built by
    composing the registered stage operators themselves (f1 and d6 are
    called, not re-implemented), joined on doc_id, so this flagship is
    exactly as correct as its independently-oracled stages; its own
    oracle splices the same CTE text the stage oracles use."""
    kept = d6_survivors_artifact(spark, sf_dir).select("doc_id")
    passed = f1_passed_artifact(spark, sf_dir).select("doc_id")
    bucket = hash60(_seeded("split", F.col("doc_id").cast("string"))) % 100
    return (
        kept.join(passed, "doc_id")
        .select("doc_id", bucket.alias("bucket"))
        .select(
            "doc_id",
            "bucket",
            F.when(F.col("bucket") < TRAIN_PCT, "train")
            .when(F.col("bucket") < VAL_PCT, "val")
            .otherwise("test")
            .alias("split"),
        )
    )


# ---------------------------------------------------------------------------
# cur1 — curriculum/annealing data schedule by quality percentile
# ---------------------------------------------------------------------------


def _cur1_oracle() -> str:
    from bc_proj3_spark.operators.textstats import _T2_ORACLE, _T5_ORACLE

    return f"""
WITH q AS (
{_T2_ORACLE}
),
tok AS (
{_T5_ORACLE}
),
d AS (
  SELECT q.doc_id, q.quality, tok.n_bpe_tokens
  FROM q JOIN tok USING (doc_id)
),
counts AS (
  SELECT quality, COUNT(*) AS c FROM d GROUP BY quality
),
cum AS (
  SELECT quality, SUM(c) OVER (ORDER BY quality) AS cum_n FROM counts
),
nn AS (SELECT COUNT(*) AS n FROM d),
th AS (
  SELECT MIN(CASE WHEN cum.cum_n >= (nn.n - 1) * 8 // 10 + 1
             THEN cum.quality END) AS p80,
         MIN(CASE WHEN cum.cum_n >= (nn.n - 1) * 4 // 10 + 1
             THEN cum.quality END) AS p40
  FROM cum, nn
),
lab AS (
  SELECT CASE WHEN quality >= (SELECT p80 FROM th) THEN 'anneal'
              WHEN quality >= (SELECT p40 FROM th) THEN 'main'
              ELSE 'warmup' END AS phase,
         quality, n_bpe_tokens
  FROM d
)
SELECT phase,
       COUNT(*) AS n_docs,
       CAST(SUM(n_bpe_tokens) AS BIGINT) AS token_sum,
       ROUND(MIN(quality), 9) AS min_quality,
       ROUND(MAX(quality), 9) AS max_quality
FROM lab
GROUP BY phase
"""


@register("cur1_curriculum_schedule", _cur1_oracle())
def cur1_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum / annealing data schedule: partition the corpus into
    training phases by quality percentile — top 20% reserved for the
    annealing phase (the modern practice of ending pre-training on the
    highest-quality data), middle 40% for the main run, bottom 40% for
    warmup — and report each phase's document count and BPE-token
    budget (t5's segmentation), the numbers a training plan is actually
    written against. Composes the registered t2 (quality) and t5
    (token-cost) operators; phase boundaries are exact ORDER
    STATISTICS of the per-row quality score: the value at 1-based rank
    floor((n-1)*p)+1. Rank selection is interpolation-free — both
    engines pick an actual data value by integer arithmetic, so a
    1-ulp difference in percentile interpolation (Spark percentile vs
    DuckDB quantile_cont) can never flip a >= boundary comparison (the
    cc3 lattice-tie class, flagged by the r6 advisor).

    Scale shape: the rank is selected from the distinct-value
    histogram (groupBy quality + a cumulative window over DISTINCT
    values, not rows — bounded by the score's 9-decimal lattice, never
    corpus-sized), then the 1-row threshold broadcast labels one
    corpus pass (NOT a global NTILE, which would funnel the corpus
    through one window partition); the phase report is a 3-row
    aggregate. At production scale the exact order statistic swaps for
    approx_percentile's t-digest — kept exact here so the oracle can
    value-match (a2's convention)."""
    from pyspark.sql import Window
    from bc_proj3_spark.operators.textstats import (
        t2_quality_score,
        t5_token_count,
    )

    q = t2_quality_score(spark, sf_dir).select("doc_id", "quality")
    tok = t5_token_count(spark, sf_dir).select("doc_id", "n_bpe_tokens")
    # quantile split is inherently two-pass (thresholds, then labels);
    # persist the ~20-byte/doc projection so the second pass rereads
    # the cached scores instead of re-running the text expressions
    # over the raw corpus (the cache is dropped by the caller's
    # clearCache between queries)
    d = q.join(tok, "doc_id").persist()
    counts = d.groupBy("quality").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("quality").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.select("quality", F.sum("c").over(w).alias("cum_n"))
    nn = d.agg(F.count(F.lit(1)).alias("n"))
    th = cum.crossJoin(F.broadcast(nn)).agg(
        F.min(
            F.when(
                F.col("cum_n") >= F.expr("(n - 1) * 8 div 10 + 1"),
                F.col("quality"),
            )
        ).alias("p80"),
        F.min(
            F.when(
                F.col("cum_n") >= F.expr("(n - 1) * 4 div 10 + 1"),
                F.col("quality"),
            )
        ).alias("p40"),
    )
    phase = (
        F.when(F.col("quality") >= F.col("p80"), "anneal")
        .when(F.col("quality") >= F.col("p40"), "main")
        .otherwise("warmup")
    )
    return (
        d.crossJoin(F.broadcast(th))
        .select(phase.alias("phase"), "quality", "n_bpe_tokens")
        .groupBy("phase")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bpe_tokens").cast("bigint").alias("token_sum"),
            F.round(F.min("quality"), 9).alias("min_quality"),
            F.round(F.max("quality"), 9).alias("max_quality"),
        )
    )


# ---------------------------------------------------------------------------
# pipe2 — steady-state ingest manifest: the per-batch admission ledger
# ---------------------------------------------------------------------------

from bc_proj3_spark.operators.dedup import (  # noqa: E402
    _D8_CTES,
    D8_BATCH_MOD,
    D8_BATCH_REM,
    d8_admitted_artifact,
)
from bc_proj3_spark.plans.tables import table  # noqa: E402

_PIPE2_ORACLE = f"""WITH {_D8_CTES.rstrip()},
{_F1_AS_CTE},
batch AS (
  SELECT doc_id FROM documents
  WHERE doc_id % {D8_BATCH_MOD} = {D8_BATCH_REM}
)
SELECT b.doc_id,
       CASE WHEN f.doc_id IS NULL THEN 'quality'
            WHEN dr.doc_id IS NOT NULL THEN 'duplicate'
            ELSE 'admitted' END AS outcome,
       CASE WHEN f.doc_id IS NOT NULL AND dr.doc_id IS NULL THEN
         CASE WHEN {sql_hash60(_sql_seeded('split', 'CAST(b.doc_id AS VARCHAR)'))} % 100 < {TRAIN_PCT} THEN 'train'
              WHEN {sql_hash60(_sql_seeded('split', 'CAST(b.doc_id AS VARCHAR)'))} % 100 < {VAL_PCT} THEN 'val'
              ELSE 'test' END
       END AS split
FROM batch b
LEFT JOIN f1_pass f ON f.doc_id = b.doc_id
LEFT JOIN (SELECT doc_id FROM dropped) dr ON dr.doc_id = b.doc_id
"""


@register("pipe2_ingest_manifest", _PIPE2_ORACLE)
def pipe2_ingest_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The steady-state twin of pipe1: for TODAY'S ARRIVING BATCH
    (d8's doc_id % 10 == 7 stand-in), the per-document admission
    ledger — 'quality' (failed f1's filter decision), 'duplicate'
    (d8 found a verified near-dup in the existing corpus), or
    'admitted' with the sp1 split stamp. pipe1 is the backfill that
    builds a corpus once; this is the manifest an ingest job publishes
    every batch, and the reject REASONS are the product: reason-mix
    drift (quality rejects spiking vs duplicate rejects spiking)
    distinguishes a crawler bug from a recrawl loop. Composed from the
    registered stage operators themselves (f1 and d8 are called, not
    re-implemented; quality-first reason precedence is fixed by the
    same CASE order in both engines), with the oracle splicing the
    STAGE oracles' own CTE text verbatim.

    Scale shape: inherits the stages' plans — f1 is scan-side + two
    combiner-absorbed aggregates, d8's candidate generation joins
    batch-side band buckets against the existing side only (work
    scales with batch volume, never corpus^2); the ledger itself is
    two doc-id-keyed left joins on the batch subset and the split
    stamp is a map-side hash."""
    docs = table(spark, sf_dir, "documents")
    batch = docs.filter(
        F.col("doc_id") % D8_BATCH_MOD == D8_BATCH_REM
    ).select("doc_id")
    admitted = d8_admitted_artifact(spark, sf_dir).select(
        "doc_id", F.lit(1).alias("adm")
    )
    passed = f1_passed_artifact(spark, sf_dir).select(
        "doc_id", F.lit(1).alias("ok")
    )
    bucket = hash60(_seeded("split", F.col("doc_id").cast("string"))) % 100
    split = (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < VAL_PCT, "val")
        .otherwise("test")
    )
    return (
        batch.join(passed, "doc_id", "left")
        .join(admitted, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("ok").isNull(), "quality")
            .when(F.col("adm").isNull(), "duplicate")
            .otherwise("admitted")
            .alias("outcome"),
            F.when(
                F.col("ok").isNotNull() & F.col("adm").isNotNull(), split
            ).alias("split"),
        )
    )


# ---------------------------------------------------------------------------
# pipe3 — the full training-data recipe as a per-stage attrition ledger
# ---------------------------------------------------------------------------

from bc_proj3_spark.operators.dedup import _D7_ORACLE, d7_decontaminate  # noqa: E402
from bc_proj3_spark.operators.sampling import (  # noqa: E402
    MIX_QUOTA,
    PACK_BUCKETS,
    PACK_WINDOW,
)
from bc_proj3_spark.operators.textstats import BPE_RE  # noqa: E402

_P3_HM = sql_hash60(_sql_seeded("mix", "CAST(doc_id AS VARCHAR)"))
_P3_HP = sql_hash60(_sql_seeded("pack", "CAST(doc_id AS VARCHAR)"))

_PIPE3_ORACLE = f"""{_DEDUP_FUNNEL_CTES.rstrip()},
{_F1_AS_CTE},
contaminated AS (
{_D7_ORACLE}
),
p3_base AS (
  SELECT doc_id, source,
         len(regexp_extract_all(lower(text), '{BPE_RE}')) AS n_tokens,
         {_P3_HM} AS hm,
         {_P3_HP} AS hp
  FROM documents WHERE doc_id % 50 <> 0
),
led AS (
  SELECT b.*,
         (c.doc_id IS NULL) AS s1,
         (c.doc_id IS NULL AND sv.doc_id IS NOT NULL
          AND dr.doc_id IS NULL) AS s2,
         (c.doc_id IS NULL AND sv.doc_id IS NOT NULL AND dr.doc_id IS NULL
          AND f.doc_id IS NOT NULL) AS s3
  FROM p3_base b
  LEFT JOIN (SELECT DISTINCT doc_id FROM contaminated) c USING (doc_id)
  LEFT JOIN surv sv USING (doc_id)
  LEFT JOIN dropped dr USING (doc_id)
  LEFT JOIN f1_pass f USING (doc_id)
),
led2 AS (
  SELECT led.*,
         (s3 AND ROW_NUMBER() OVER (
            PARTITION BY source ORDER BY s3 DESC, hm, doc_id
          ) <= {MIX_QUOTA}) AS s4
  FROM led
),
packed AS (
  SELECT hp % {PACK_BUCKETS} AS bucket,
         CAST(floor((SUM(n_tokens) OVER (
                PARTITION BY hp % {PACK_BUCKETS} ORDER BY hp, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
              ) - n_tokens) / {PACK_WINDOW}.0) AS BIGINT) AS pack_id
  FROM led2 WHERE s4
),
np AS (
  SELECT CAST(COUNT(DISTINCT (bucket, pack_id)) AS BIGINT) AS n_packs
  FROM packed
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
         CAST(SUM(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS n4,
         CAST(SUM(CASE WHEN s1 THEN n_tokens ELSE 0 END) AS BIGINT) AS tok1,
         CAST(SUM(CASE WHEN s2 THEN n_tokens ELSE 0 END) AS BIGINT) AS tok2,
         CAST(SUM(CASE WHEN s3 THEN n_tokens ELSE 0 END) AS BIGINT) AS tok3,
         CAST(SUM(CASE WHEN s4 THEN n_tokens ELSE 0 END) AS BIGINT) AS tok4
  FROM led2
)
SELECT 1 AS stage_order, 'decontaminate' AS stage, n0 AS docs_in,
       n0 - n1 AS docs_dropped, n1 AS docs_out, tok1 AS tokens_out,
       CAST(NULL AS BIGINT) AS n_packs
FROM agg
UNION ALL
SELECT 2, 'dedup', n1, n1 - n2, n2, tok2, CAST(NULL AS BIGINT) FROM agg
UNION ALL
SELECT 3, 'quality', n2, n2 - n3, n3, tok3, CAST(NULL AS BIGINT) FROM agg
UNION ALL
SELECT 4, 'mix', n3, n3 - n4, n4, tok4, CAST(NULL AS BIGINT) FROM agg
UNION ALL
SELECT 5, 'pack', n4, CAST(0 AS BIGINT), n4, tok4,
       (SELECT n_packs FROM np)
FROM agg
"""


@register("pipe3_recipe_attrition", _PIPE3_ORACLE)
def pipe3_recipe_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete pre-training data recipe as ONE manifest: chain
    decontaminate (d7's eval-overlap flags) → dedup (d6's exact+near
    funnel) → quality gate (f1) → source mix (sp3's per-source hash
    quota) → sequence packing (sp4's bucketed greedy fill), and emit
    the per-stage attrition ledger — docs in/dropped/out and the
    surviving token budget per stage, plus the packed-sequence count —
    the one-page answer to "where did my corpus go". Attrition-mix
    drift between runs (dedup spiking vs quality spiking) is the
    production signal that distinguishes a recrawl loop from a crawler
    regression; the token column is what a compute plan is written
    against.

    Composition discipline (pipe1's): the drop sets come from the
    REGISTERED stage operators (d7, d6, f1 are called, not
    re-implemented; the oracle splices their own CTE/statement text
    verbatim), applied sequentially as flags on one document ledger.
    The mix and pack stages re-apply sp3/sp4's exact mechanisms (same
    seeded hashes, same constants) over the stage-3 survivor set —
    quota ranks and pack offsets must reflect what actually remains,
    not the raw corpus. Recipe input is the train-candidate side of
    d7's standing eval/train partition (doc_id % 50 <> 0): eval-set
    members are benchmark data, never corpus candidates.

    Scale shape: the stage flags are doc-id-keyed left joins onto one
    corpus projection (each stage op keeps its own banded/gated plan);
    the ledger aggregate is ONE pass with conditional sums; mix is one
    rank window per source partition directly on the ledger (s3 rows
    ordered first, so an s3 row's row_number IS its rank among
    survivors — no self-join, no second pass over the stage funnels);
    packing is sharded into {PACK_BUCKETS} independent hash-bucket
    streams (never a global running sum); the output is five rows."""
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents")
    ntok = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_RE), F.lit(0))
    )
    hm = hash60(_seeded("mix", F.col("doc_id").cast("string")))
    hp = hash60(_seeded("pack", F.col("doc_id").cast("string")))
    base = docs.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id",
        "source",
        ntok.alias("n_tokens"),
        hm.alias("hm"),
        hp.alias("hp"),
    )
    cont = (
        d7_decontaminate(spark, sf_dir)
        .select("doc_id")
        .distinct()
        .select("doc_id", F.lit(1).alias("c"))
    )
    kept = d6_survivors_artifact(spark, sf_dir).select(
        "doc_id", F.lit(1).alias("k")
    )
    passed = f1_passed_artifact(spark, sf_dir).select(
        "doc_id", F.lit(1).alias("p")
    )
    led = (
        base.join(cont, "doc_id", "left")
        .join(kept, "doc_id", "left")
        .join(passed, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "hm",
            "hp",
            F.col("c").isNull().alias("s1"),
            (F.col("c").isNull() & F.col("k").isNotNull()).alias("s2"),
            (
                F.col("c").isNull()
                & F.col("k").isNotNull()
                & F.col("p").isNotNull()
            ).alias("s3"),
        )
    )
    # The mix rank needs no self-join: ordering s3 rows FIRST makes an
    # s3 row's row_number equal its rank among s3 rows, so one window
    # over the ledger replaces the filter->rank->left-join round trip
    # (which re-executed the three stage funnels a second time while
    # the persist below was still materializing).
    w_mix = Window.partitionBy("source").orderBy(
        F.col("s3").desc(), F.col("hm").asc(), F.col("doc_id").asc()
    )
    # the ledger feeds the 1-row aggregate AND the packing window; one
    # persist keeps the three stage operators' funnels from re-running
    led2 = led.withColumn(
        "s4", F.col("s3") & (F.row_number().over(w_mix) <= MIX_QUOTA)
    ).persist()
    w_pack = (
        Window.partitionBy("bucket")
        .orderBy(F.col("hp").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        led2.filter(F.col("s4"))
        .select(
            "doc_id",
            "hp",
            "n_tokens",
            (F.col("hp") % PACK_BUCKETS).alias("bucket"),
        )
        .withColumn("cum", F.sum("n_tokens").over(w_pack))
        .select(
            "bucket",
            F.floor(
                (F.col("cum") - F.col("n_tokens")) / float(PACK_WINDOW)
            )
            .cast("bigint")
            .alias("pack_id"),
        )
    )
    np_df = packed.agg(
        F.countDistinct("bucket", "pack_id").cast("bigint").alias("n_packs")
    )

    def _n(flag):
        return F.sum(F.when(flag, 1).otherwise(0)).cast("bigint")

    def _tok(flag):
        return F.sum(F.when(flag, F.col("n_tokens")).otherwise(0)).cast(
            "bigint"
        )

    agg = led2.agg(
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        _n(F.col("s1")).alias("n1"),
        _n(F.col("s2")).alias("n2"),
        _n(F.col("s3")).alias("n3"),
        _n(F.col("s4")).alias("n4"),
        _tok(F.col("s1")).alias("tok1"),
        _tok(F.col("s2")).alias("tok2"),
        _tok(F.col("s3")).alias("tok3"),
        _tok(F.col("s4")).alias("tok4"),
    )

    def _stage(order, name, n_in, n_out, tok, n_packs, dropped=None):
        # pack drops nothing BY CONSTRUCTION: its ledger row carries a
        # literal 0 (not n4 - n4, which is NULL on an empty corpus —
        # the oracle's CAST(0 AS BIGINT) must be mirrored exactly)
        if dropped is None:
            dropped = n_in - n_out
        return F.struct(
            F.lit(order).alias("stage_order"),
            F.lit(name).alias("stage"),
            n_in.alias("docs_in"),
            dropped.alias("docs_dropped"),
            n_out.alias("docs_out"),
            tok.alias("tokens_out"),
            n_packs.alias("n_packs"),
        )

    null_packs = F.lit(None).cast("bigint")
    return (
        agg.crossJoin(F.broadcast(np_df))
        .select(
            F.explode(
                F.array(
                    _stage(1, "decontaminate", F.col("n0"), F.col("n1"),
                           F.col("tok1"), null_packs),
                    _stage(2, "dedup", F.col("n1"), F.col("n2"),
                           F.col("tok2"), null_packs),
                    _stage(3, "quality", F.col("n2"), F.col("n3"),
                           F.col("tok3"), null_packs),
                    _stage(4, "mix", F.col("n3"), F.col("n4"),
                           F.col("tok4"), null_packs),
                    _stage(5, "pack", F.col("n4"), F.col("n4"),
                           F.col("tok4"), F.col("n_packs"),
                           dropped=F.lit(0).cast("bigint")),
                )
            ).alias("r")
        )
        .select("r.*")
    )
