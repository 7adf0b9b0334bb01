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

from bc_proj3_spark.functions.hashing import hash32, sql_hash32
from bc_proj3_spark.plans.tables import fanout, table
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


# ---------------------------------------------------------------------------
# ch3 — content-defined chunking (rolling-hash boundaries, FastCDC-style)
# ---------------------------------------------------------------------------

#: rolling-hash window width in tokens and the boundary divisor: a chunk
#: boundary falls after token i when the hash of the trailing
#: CDC_WINDOW-token window is ≡ 0 (mod CDC_DIVISOR) — expected chunk
#: length ≈ CDC_DIVISOR tokens. End-of-document is always a boundary.
CDC_WINDOW = 4
CDC_DIVISOR = 16
CDC_SEED = 3


def _sql_cdc_window(i: str) -> str:
    return (
        f"array_to_string(list_slice(t, greatest(1, {i} - {CDC_WINDOW - 1}), {i}), ' ')"
    )


_CH3_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents
),
b AS (
  SELECT doc_id, t,
         list_filter(range(1, n + 1),
           i -> ({sql_hash32(_sql_cdc_window('i'), CDC_SEED)} % {CDC_DIVISOR} = 0)
                OR i = n) AS ends
  FROM toks
),
spans AS (
  SELECT doc_id, t, ends, unnest(range(1, len(ends) + 1)) AS j
  FROM b
),
cut AS (
  SELECT doc_id, j,
         CASE WHEN j = 1 THEN 1 ELSE ends[j - 1] + 1 END AS s,
         ends[j] AS e,
         t
  FROM spans
)
SELECT doc_id,
       CAST(j - 1 AS BIGINT) AS chunk_id,
       CAST(e - s + 1 AS INTEGER) AS n_chunk_tokens,
       array_to_string(list_slice(t, s, e), ' ') AS chunk_text,
       md5(array_to_string(list_slice(t, s, e), ' ')) AS chunk_hash
FROM cut
"""


@register("ch3_content_defined_chunks", _CH3_ORACLE)
def ch3_content_defined_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking: boundaries fall where the rolling hash
    of the trailing CDC_WINDOW-token window is 0 mod CDC_DIVISOR, so an
    insertion or deletion reshapes only the chunks it touches — unlike
    ch1's fixed-stride windows, where one added token shifts EVERY
    downstream boundary and defeats chunk-level dedup (ch2). This is
    the FastCDC/rsync boundary idea at token granularity, the chunking
    real dedup pipelines use ahead of exact chunk-hash matching.

    Plan shape (100 TB posture): pure map-side codegen — boundary
    detection is a higher-order ``filter`` over the token-position
    sequence, span construction a ``transform`` + ``posexplode``; zero
    shuffles, chunks inherit the parent scan's partitioning (fanout
    buys parallelism for the per-position hash work). Per-doc cost is
    O(n_tokens · CDC_WINDOW) hash bytes; no state crosses documents."""
    return cdc_chunks(fanout(table(spark, sf_dir, "documents")))


def cdc_chunks(docs: DataFrame) -> DataFrame:
    """Content-defined chunking kernel over any (doc_id, text) frame —
    factored so boundary locality (an edit reshapes only nearby chunks)
    is unit-testable on crafted rows."""
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    ).withColumn("n", F.size("t"))

    def _window_text(i):
        return F.array_join(
            F.slice(
                F.col("t"),
                F.greatest(F.lit(1), i - (CDC_WINDOW - 1)),
                F.least(i, F.lit(CDC_WINDOW)),
            ),
            " ",
        )

    ends = F.filter(
        F.sequence(F.lit(1), F.col("n")),
        lambda i: (hash32(_window_text(i), CDC_SEED) % CDC_DIVISOR == 0)
        | (i == F.col("n")),
    )
    b = toks.withColumn("ends", ends)
    spans = F.transform(
        F.sequence(F.lit(1), F.size("ends")),
        lambda j: F.struct(
            F.when(j == 1, F.lit(1))
            .otherwise(F.element_at(F.col("ends"), j - 1) + 1)
            .alias("s"),
            F.element_at(F.col("ends"), j).alias("e"),
        ),
    )
    ex = b.select("doc_id", "t", F.posexplode(spans).alias("chunk_id", "sp"))
    chunk_text = F.array_join(
        F.slice(F.col("t"), F.col("sp.s"), F.col("sp.e") - F.col("sp.s") + 1), " "
    )
    return ex.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        (F.col("sp.e") - F.col("sp.s") + 1).cast("int").alias("n_chunk_tokens"),
        chunk_text.alias("chunk_text"),
        F.md5(chunk_text).alias("chunk_hash"),
    )
