"""Sliding-window document chunking — the RAG/pretraining prep step.

Long documents are cut into fixed-size token windows with overlap
(stride < window) so no span of text is lost at a boundary; each chunk
carries its position and a content fingerprint so downstream dedup /
embedding stages can key on it. The reference has the inverse op only
(explode of pre-split topic arrays, gold_article_scoring.py:89-96);
chunking is its generative twin and a hard requirement for any corpus
that feeds a bounded-context model.

Plan shape (100 TB posture): one scan of ``documents``; the chunk
generator is a pure codegen expression chain (split → sequence →
transform → explode) — no shuffle at all until a downstream consumer
asks for one, and the explode multiplies rows by ~n_tokens/stride,
which Spark's whole-stage codegen streams without materializing.
Chunks inherit the parent's partitioning, so a following
``groupBy(chunk_hash)`` dedup shuffles chunk-sized rows, never whole
documents.

Cross-engine note: chunk boundaries are defined on the RAW
whitespace-token stream (``split(text, ' ')``), not the cleaned/
stopword-filtered stream — chunk text must reproduce the original
span verbatim. DuckDB's ``string_split`` twins Spark's ``split`` on
single-space text exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bc_proj3_spark.plans.tables import table
from bc_proj3_spark.registry import register

#: tokens per chunk and stride between chunk starts (overlap = 16).
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


_CH1_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents
),
starts AS (
  SELECT doc_id, lang, t, n, unnest(range(0, n, {CHUNK_STRIDE})) AS start
  FROM toks
)
SELECT doc_id,
       CAST(start / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       lang,
       CAST(LEAST(n - start, {CHUNK_TOKENS}) AS INTEGER) AS n_chunk_tokens,
       array_to_string(list_slice(t, start + 1, start + {CHUNK_TOKENS}), ' ')
         AS chunk_text,
       md5(array_to_string(list_slice(t, start + 1, start + {CHUNK_TOKENS}), ' '))
         AS chunk_hash
FROM starts
"""


@register("ch1_chunk_documents", _CH1_ORACLE)
def ch1_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping CHUNK_TOKENS-token chunks at stride CHUNK_STRIDE per
    document, with per-chunk md5 fingerprints. Pure map-side codegen
    (split → sequence → explode → slice): zero shuffles."""
    return chunk_documents(table(spark, sf_dir, "documents"))


def chunk_documents(docs: DataFrame) -> DataFrame:
    """Chunking kernel over any (doc_id, lang, text) frame — factored
    so boundary semantics (final short chunk, single-token doc, exact
    window multiple) are unit-testable on crafted rows."""
    toks = docs.select(
        "doc_id",
        "lang",
        F.split(F.col("text"), " ").alias("t"),
    ).withColumn("n", F.size("t"))
    # sequence(0, n-1, stride): every chunk start strictly inside the
    # token stream; the final chunk may be shorter than CHUNK_TOKENS.
    starts = toks.withColumn(
        "start",
        F.explode(F.sequence(F.lit(0), F.col("n") - 1, F.lit(CHUNK_STRIDE))),
    )
    chunk = F.slice(F.col("t"), F.col("start") + 1, F.lit(CHUNK_TOKENS))
    chunk_text = F.array_join(chunk, " ")
    return starts.select(
        "doc_id",
        (F.col("start") / CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
        "lang",
        F.least(F.col("n") - F.col("start"), F.lit(CHUNK_TOKENS))
        .cast("int")
        .alias("n_chunk_tokens"),
        chunk_text.alias("chunk_text"),
        F.md5(chunk_text).alias("chunk_hash"),
    )


_CH2_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents
),
starts AS (
  SELECT doc_id, t, n, unnest(range(0, n, {CHUNK_STRIDE})) AS start
  FROM toks
),
chunks AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(t, start + 1, start + {CHUNK_TOKENS}), ' '))
           AS chunk_hash
  FROM starts
)
SELECT chunk_hash,
       COUNT(*) AS n_copies,
       COUNT(DISTINCT doc_id) AS n_docs,
       MIN(doc_id) AS first_doc
FROM chunks
GROUP BY chunk_hash
HAVING COUNT(*) > 1
"""


@register("ch2_duplicate_chunks", _CH2_ORACLE)
def ch2_duplicate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup: fingerprints appearing more than once
    across the corpus — the sub-document duplication signal (boilerplate
    headers, repeated passages) that document-level dedup (d1) cannot
    see. One hash-groupBy on the chunk fingerprint; the shuffle carries
    16-byte hashes, never chunk text."""
    chunks = ch1_chunk_documents(spark, sf_dir)
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_copies") > 1)
    )
