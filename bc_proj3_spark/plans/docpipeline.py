"""The reference pipeline's gold-layer semantics over ``documents``.

These queries re-express the reference's silver/gold operator chain
(surrogate keys → clean text → tokenize → stopwords → distinct → weighted
term scoring → score filter; SURVEY.md §2.8 F5-F8, §2.9 M1-M4, §2.2 P8)
on the driver's ``documents`` table so the DuckDB oracle can check them.
The weight dictionary mirrors the structure of the reference's 31-term
clean-tech dict (gold_article_scoring.py:104-136) over this corpus's
vocabulary. The runnable medallion pipeline itself lives in
``bc_proj3_spark.pipeline`` and uses the same column functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bc_proj3_spark.functions import text as T
from bc_proj3_spark.plans.tables import fanout, table
from bc_proj3_spark.registry import register

# weighted relevance dictionary (structure of gold_article_scoring.py:104-136)
TERM_WEIGHTS: dict[str, int] = {
    "spark": 3,
    "stream": 3,
    "query": 2,
    "data": 2,
    "join": 2,
    "merge": 2,
    "window": 1,
    "filter": 1,
    "hash": 1,
    "sort": 1,
    "scan": 1,
    "batch": 1,
    "group": 1,
    "table": 1,
}

# ---------------------------------------------------------------------------
# d1 — sha2 surrogate keys (silver_arxiv.py:117 semantics)
# ---------------------------------------------------------------------------

_D1_ORACLE = """
SELECT
  doc_id,
  sha256(concat_ws('|', source, CAST(doc_id AS VARCHAR))) AS doc_sk,
  source
FROM documents
"""


@register("d1_surrogate_key", _D1_ORACLE)
def d1_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sha2-256 surrogate key over concat_ws'd natural-key columns —
    exactly the reference's key scheme (sha2(concat_ws('|', ...), 256),
    silver_arxiv.py:117; concat_ws's null-skipping is part of the
    contract, SURVEY.md §2.8 F5)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.sha2(F.concat_ws("|", F.col("source"), F.col("doc_id").cast("string")), 256).alias(
            "doc_sk"
        ),
        "source",
    )


# ---------------------------------------------------------------------------
# d2 — clean/tokenize/stopword chain, token statistics
# ---------------------------------------------------------------------------

_D2_ORACLE = f"""
SELECT
  doc_id,
  CAST(len({T.sql_tokenize('text')}) AS INTEGER) AS n_tokens,
  CAST(len({T.sql_distinct_tokens('text')}) AS INTEGER) AS n_unique
FROM documents
"""


@register("d2_token_stats", _D2_ORACLE)
def d2_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token and unique-token counts after the full normalization chain
    (Tokenizer + StopWordsRemover + array_distinct/size rebuilt as native
    expressions; gold_article_scoring.py:49-65,149-154)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(T.tokenize(F.col("text"))).cast("int").alias("n_tokens"),
        F.size(T.distinct_tokens(F.col("text"))).cast("int").alias("n_unique"),
    )


# ---------------------------------------------------------------------------
# d3 — weighted term scoring + score>0 filter (the flagship gold query)
# ---------------------------------------------------------------------------


def _sql_raw_score(tokens_expr: str) -> str:
    cases = " + ".join(
        f"CASE WHEN list_contains({tokens_expr}, '{term}') THEN {w} ELSE 0 END"
        for term, w in TERM_WEIGHTS.items()
    )
    return f"({cases})"


_D3_ORACLE = f"""
WITH tokenized AS (
  SELECT doc_id, source, {T.sql_distinct_tokens('text')} AS toks
  FROM documents
)
SELECT
  doc_id,
  source,
  CAST({_sql_raw_score('toks')} AS INTEGER) AS raw_score,
  CAST(len(toks) AS INTEGER) AS n_unique,
  CAST({_sql_raw_score('toks')} AS DOUBLE) / len(toks) AS doc_score
FROM tokenized
WHERE {_sql_raw_score('toks')} > 0
"""


@register("d3_term_scoring", _D3_ORACLE)
def d3_term_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-weighted relevance scoring — the reference's
    ``clean_tech_score`` UDF (gold_article_scoring.py:92-144) rewritten
    as a native sum of ``array_contains`` branches (set-membership
    semantics: each matched term counts once, since the UDF folds over
    distinct tokens). Normalized score and >0 filter as at :163-175.
    At 100 TB this stays inside whole-stage codegen; no Python worker.
    """
    docs = table(spark, sf_dir, "documents")
    toks = T.distinct_tokens(F.col("text"))
    tokenized = docs.select("doc_id", "source", toks.alias("toks"))
    raw = None
    for term, w in TERM_WEIGHTS.items():
        branch = F.when(F.array_contains(F.col("toks"), term), F.lit(w)).otherwise(F.lit(0))
        raw = branch if raw is None else raw + branch
    return (
        tokenized.withColumn("raw_score", raw.cast("int"))
        .withColumn("n_unique", F.size("toks").cast("int"))
        .filter(F.col("raw_score") > 0)
        .select(
            "doc_id",
            "source",
            "raw_score",
            "n_unique",
            (F.col("raw_score").cast("double") / F.col("n_unique")).alias("doc_score"),
        )
    )
