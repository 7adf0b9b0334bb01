"""Multimodal (binary) column operators: decode / feature-extract / frame-sample.

Model: media is an opaque ``binary`` payload column plus a typed
metadata struct — the standard lakehouse layout for image/audio/video
alongside relational columns. The decode step is STUBBED (this
container has no image/audio libraries — see :func:`decode_image`,
which raises NotImplementedError) behind a deterministic fake: payloads
are synthesized from md5 bytes of the documents table, so the
*Spark-side plumbing is real* — binary Arrow columns flow through
``mapInPandas``, features are computed from the actual bytes with
numpy, fan-out (frame sampling) yields multiple rows per input — while
the DuckDB oracle recomputes the same features from the md5 hex
strings, giving full value verification of the batch plumbing.

Scale notes (100 TB posture):
- media features are computed in ``mapInPandas`` over Arrow batches —
  the only sanctioned Python path (vectorized transfer, no per-row
  pickling); everything before/after it is JVM column work.
- the decode stage is embarrassingly parallel: no shuffle anywhere in
  m2/m3 — partition count follows the scan, so 1000 executors stream
  1000 partitions of payloads independently.
- metadata (m1) never touches Python: pure column expressions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bc_proj3_spark.functions import text as T
from bc_proj3_spark.plans.tables import fanout, table
from bc_proj3_spark.registry import register

PAYLOAD_BLOCKS = 4  # payload = 4 chained md5 digests = 64 bytes
FRAME_BYTES = 4  # m3: a "frame" is a 4-byte block
FRAME_STRIDE = 2  # sample every 2nd frame


def decode_image(payload: bytes) -> "object":
    """Real image decode — NOT IMPLEMENTED in this container (no
    PIL/cv2/ffmpeg). The pipeline's decode stage calls the
    deterministic byte-level fake instead; swap this in when the
    codec libraries exist."""
    raise NotImplementedError(
        "image/audio decoding requires codec libraries not present here; "
        "the deterministic md5-byte fake stands in for tests"
    )


# ---------------------------------------------------------------------------
# media table synthesis (deterministic; mirrored in every oracle)
# ---------------------------------------------------------------------------


def _hex_expr():
    """64 hex-byte string: chained md5 digests of the document text."""
    parts = [F.md5(F.col("text"))]
    for k in range(1, PAYLOAD_BLOCKS):
        parts.append(F.md5(F.concat(F.col("text"), F.lit(f"x{k}"))))
    return F.concat(*parts)


def _sql_hex() -> str:
    parts = ["md5(text)"] + [
        f"md5(text || 'x{k}')" for k in range(1, PAYLOAD_BLOCKS)
    ]
    return " || ".join(parts)


_MEDIA_TYPE = "CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, media_type, payload binary, meta struct).

    The engine's canonical multimodal layout: opaque bytes + typed
    metadata. Payload bytes are unhex'd md5 chains — deterministic and
    reproducible in SQL, standing in for real encoded media."""
    docs = fanout(table(spark, sf_dir, "documents"))
    media_type = (
        F.when((F.col("doc_id") % 3).cast("int") == 0, F.lit("image"))
        .when((F.col("doc_id") % 3).cast("int") == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    meta = F.struct(
        (F.lit(64) + (F.col("doc_id") % 5).cast("int") * 32).alias("width"),
        (F.lit(48) + (F.col("doc_id") % 3).cast("int") * 16).alias("height"),
        (F.col("n_chars")).alias("src_bytes"),
    )
    return docs.select(
        "doc_id",
        media_type.alias("media_type"),
        F.unhex(_hex_expr()).alias("payload"),
        meta.alias("meta"),
    )


# ---------------------------------------------------------------------------
# m1 — metadata projection (no Python, no shuffle)
# ---------------------------------------------------------------------------

_M1_ORACLE = f"""
SELECT
  doc_id,
  {_MEDIA_TYPE} AS media_type,
  CAST(octet_length(unhex({_sql_hex()})) AS INTEGER) AS n_bytes,
  CAST(64 + (doc_id % 5) * 32 AS INTEGER) AS width,
  CAST(48 + (doc_id % 3) * 16 AS INTEGER) AS height
FROM documents
"""


@register("m1_media_metadata", _M1_ORACLE)
def m1_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata projection over the binary media table: media
    type, payload byte length, declared dimensions. Struct access +
    octet length stay entirely in codegen."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").cast("int").alias("n_bytes"),
        F.col("meta.width").cast("int").alias("width"),
        F.col("meta.height").cast("int").alias("height"),
    )


# ---------------------------------------------------------------------------
# m2 — decode + feature extract via mapInPandas (Arrow batches)
# ---------------------------------------------------------------------------

_SQL_BYTES = (
    f"list_transform(generate_series(1, {16 * PAYLOAD_BLOCKS}), "
    f"i -> (('0x' || substr({_sql_hex()}, (i-1)*2 + 1, 2))::BIGINT))"
)

_M2_ORACLE = f"""
SELECT
  doc_id,
  CAST(len(b) AS INTEGER) AS n_bytes,
  CAST(list_reduce(b, (acc, x) -> acc + x) AS DOUBLE) / len(b) AS byte_mean,
  CAST(list_aggregate(b, 'min') AS INTEGER) AS byte_min,
  CAST(list_aggregate(b, 'max') AS INTEGER) AS byte_max
FROM (SELECT doc_id, {_SQL_BYTES} AS b FROM documents) t
"""


def _decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-batch 'decode': numpy over the raw payload bytes. The shape
    of a real decoder (bytes in → features out, batch at a time)."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(bytes(payload), dtype=np.uint8)
            rows.append(
                (
                    int(doc_id),
                    int(arr.size),
                    float(int(arr.sum(dtype=np.int64)) / arr.size),
                    int(arr.min()),
                    int(arr.max()),
                )
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "n_bytes", "byte_mean", "byte_min", "byte_max"]
        )


@register("m2_decode_features", _M2_ORACLE)
def m2_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads through ``mapInPandas``:
    Arrow-batched bytes → numpy stats (the stand-in for embed/classify).
    No shuffle — the Python stage rides the scan partitioning. The
    oracle recomputes identical features from the hex representation,
    so the binary round-trip (unhex → Arrow → numpy) is value-checked."""
    m = media_table(spark, sf_dir).select("doc_id", "payload")
    return m.mapInPandas(
        _decode_features,
        schema="doc_id long, n_bytes int, byte_mean double, byte_min int, byte_max int",
    )


# ---------------------------------------------------------------------------
# m3 — frame sampling (fan-out mapInPandas over video payloads)
# ---------------------------------------------------------------------------

_M3_ORACLE = f"""
SELECT doc_id,
       CAST(fi AS INTEGER) AS frame_idx,
       substr(hexstr, fi * {FRAME_BYTES * 2} + 1, {FRAME_BYTES * 2}) AS frame_hex
FROM (SELECT doc_id, {_sql_hex()} AS hexstr FROM documents WHERE doc_id % 3 = 2) v,
     (SELECT unnest(generate_series(0, {16 * PAYLOAD_BLOCKS // FRAME_BYTES - 1}, {FRAME_STRIDE})) AS fi) frames
"""


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: list[tuple] = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            n_frames = len(raw) // FRAME_BYTES
            for fi in range(0, n_frames, FRAME_STRIDE):
                frame = raw[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES]
                out.append((int(doc_id), fi, frame.hex()))
        yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame_hex"])


@register("m3_frame_sample", _M3_ORACLE)
def m3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided frame sampling from video payloads: a fan-out
    ``mapInPandas`` (one input row → 8 frame rows) — the decode-
    timestamps-then-sample shape of video preprocessing. Filter on
    media_type runs BEFORE the Python stage so non-video bytes never
    cross the Arrow boundary."""
    m = media_table(spark, sf_dir).filter(F.col("media_type") == "video").select(
        "doc_id", "payload"
    )
    return m.mapInPandas(
        _sample_frames, schema="doc_id long, frame_idx int, frame_hex string"
    )# ---------------------------------------------------------------------------
# m4 — media near-dedup via perceptual-hash stand-in
# ---------------------------------------------------------------------------

_M4_ORACLE = f"""
SELECT phash, COUNT(*) AS n_copies, MIN(doc_id) AS canonical_doc_id
FROM (SELECT doc_id, {T.sql_fingerprint('text')} AS phash FROM documents) f
GROUP BY phash
HAVING COUNT(*) > 1
"""


@register("m4_media_dedup", _M4_ORACLE)
def m4_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media deduplication by PERCEPTUAL hash: re-encodings of the same
    underlying content (different container bytes, same picture) must
    collapse to one group, so the key is a content-derived sketch, not
    the raw payload hash — exact byte identity would miss every
    re-compression. The stand-in pHash here is the deterministic
    fingerprint of the payload's source content (order-insensitive
    token-set md5, functions/text.py), which collapses the synthetic
    corpus's re-encoded variants exactly as a real pHash collapses JPEG
    re-compressions; a real deployment swaps the fingerprint UDF, the
    plan is unchanged. One map-side-combinable hash-groupBy; groups
    with >1 copy; canonical member = min doc_id. At 100 TB the pHash is
    computed once at ingest and stored, making this a metadata-only
    aggregate that never re-reads payload bytes."""
    docs = fanout(table(spark, sf_dir, "documents"))
    return (
        docs.select("doc_id", T.fingerprint(F.col("text")).alias("phash"))
        .groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


# ---------------------------------------------------------------------------
# m5 — multimodal token budgeting from metadata (no decode needed)
# ---------------------------------------------------------------------------

PATCH = 14  # ViT-style square patch edge
AUDIO_BYTES_PER_TOKEN = 4  # codec-rate proxy: 1 token per 4 source bytes
#: video frames entering the encoder = m3's sampling schedule
VIDEO_FRAMES = (16 * PAYLOAD_BLOCKS // FRAME_BYTES + FRAME_STRIDE - 1) // FRAME_STRIDE

_M5_ORACLE = f"""
WITH meta AS (
  SELECT doc_id,
         {_MEDIA_TYPE} AS media_type,
         CAST(64 + (doc_id % 5) * 32 AS BIGINT) AS w,
         CAST(48 + (doc_id % 3) * 16 AS BIGINT) AS h,
         CAST(n_chars AS BIGINT) AS src_bytes
  FROM documents
),
tok AS (
  SELECT media_type,
         CASE media_type
           WHEN 'image' THEN ((w + {PATCH - 1}) // {PATCH})
                             * ((h + {PATCH - 1}) // {PATCH})
           WHEN 'video' THEN ((w + {PATCH - 1}) // {PATCH})
                             * ((h + {PATCH - 1}) // {PATCH})
                             * {VIDEO_FRAMES}
           ELSE src_bytes // {AUDIO_BYTES_PER_TOKEN}
         END AS tokens
  FROM meta
)
SELECT media_type,
       COUNT(*) AS n_docs,
       CAST(SUM(tokens) AS BIGINT) AS token_sum,
       CAST(MAX(tokens) AS BIGINT) AS max_doc_tokens
FROM tok
GROUP BY media_type
"""


@register("m5_token_budget", _M5_ORACLE)
def m5_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal TOKEN BUDGET from metadata alone — the planning
    number a mixed-modality training recipe needs before any decode
    runs: images cost ceil(w/14)·ceil(h/14) ViT patches, videos that
    times the m3 frame-sampling schedule, audio a source-byte rate
    proxy. All integer arithmetic on declared metadata (m1's typed
    struct), so a 100 TB media lake is budgeted by a metadata-column
    scan + 3-row aggregate — no payload is ever read (column pruning
    drops the binary column at the scan). The text twin is cur1's
    BPE-token budget; together they price a multimodal corpus.

    Shape: map-side integer expressions, one combiner-absorbed
    aggregate keyed by media_type."""
    m = media_table(spark, sf_dir)
    w = F.col("meta.width").cast("bigint")
    h = F.col("meta.height").cast("bigint")
    src = F.col("meta.src_bytes").cast("bigint")
    # integer floor-division: metadata dims are positive, so the
    # double-divide + floor equals `//` on both engines
    patches = (
        F.floor((w + (PATCH - 1)) / PATCH)
        * F.floor((h + (PATCH - 1)) / PATCH)
    ).cast("bigint")
    tokens = (
        F.when(F.col("media_type") == "image", patches)
        .when(F.col("media_type") == "video", patches * VIDEO_FRAMES)
        .otherwise(F.floor(src / AUDIO_BYTES_PER_TOKEN).cast("bigint"))
    )
    return (
        m.select("media_type", tokens.alias("tokens"))
        .groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").cast("bigint").alias("token_sum"),
            F.max("tokens").cast("bigint").alias("max_doc_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# m6 — multimodal sequence packing (text + media tokens into windows)
# ---------------------------------------------------------------------------

#: multimodal context windows are larger than sp4's text-only 2048 —
#: one image already costs hundreds of patch tokens.
MM_WINDOW = 4096
MM_BUCKETS = 8


def _m6_oracle() -> str:
    from bc_proj3_spark.functions.hashing import sql_hash60
    from bc_proj3_spark.operators.sampling import _sql_seeded
    from bc_proj3_spark.operators.textstats import BPE_RE

    h = sql_hash60(_sql_seeded("mmpack", "CAST(doc_id AS VARCHAR)"))
    return f"""
WITH meta AS (
  SELECT doc_id,
         {_MEDIA_TYPE} AS media_type,
         CAST(64 + (doc_id % 5) * 32 AS BIGINT) AS w,
         CAST(48 + (doc_id % 3) * 16 AS BIGINT) AS h_,
         CAST(n_chars AS BIGINT) AS src_bytes,
         CAST(len(regexp_extract_all(lower(text), '{BPE_RE}')) AS BIGINT)
           AS text_tokens,
         {h} % {MM_BUCKETS} AS bucket,
         {h} AS hh
  FROM documents
),
priced AS (
  SELECT doc_id, bucket, hh, text_tokens,
         CASE media_type
           WHEN 'image' THEN ((w + {PATCH - 1}) // {PATCH})
                             * ((h_ + {PATCH - 1}) // {PATCH})
           WHEN 'video' THEN ((w + {PATCH - 1}) // {PATCH})
                             * ((h_ + {PATCH - 1}) // {PATCH})
                             * {VIDEO_FRAMES}
           ELSE src_bytes // {AUDIO_BYTES_PER_TOKEN}
         END AS media_tokens
  FROM meta
),
packed AS (
  SELECT doc_id, bucket, text_tokens, media_tokens,
         (SUM(text_tokens + media_tokens) OVER (
            PARTITION BY bucket ORDER BY hh, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - (text_tokens + media_tokens)) // {MM_WINDOW} AS pack_id
  FROM priced
)
SELECT bucket, CAST(pack_id AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(text_tokens) AS BIGINT) AS text_token_sum,
       CAST(SUM(media_tokens) AS BIGINT) AS media_token_sum,
       CAST(SUM(text_tokens + media_tokens) AS BIGINT) AS total_tokens
FROM packed
GROUP BY bucket, pack_id
"""


@register("m6_multimodal_packing", _m6_oracle())
def m6_multimodal_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack MIXED-MODALITY samples into training context windows: each
    document is priced as text BPE tokens PLUS its media tokens (m5's
    metadata-only pricing — ViT patches for images, frame-sampled
    patches for video, byte-rate tokens for audio) and packed greedily
    into {MM_WINDOW}-token windows. This is the interleaved image-text
    batch-prep step (MMC4/OBELICS-style corpora): text-only packing
    (sp4) underestimates media-heavy samples by orders of magnitude
    and silently overflows the context. Per-(bucket, pack) census out.

    Exactness: all token prices are integer arithmetic on declared
    metadata; the running sum and the window index are exact integer
    DIV (the e22 lesson — no floor-of-double-quotient anywhere).

    Scale shape: sp4's sharded packing — {MM_BUCKETS} independent
    hash-bucket streams, the cumulative window PARTITIONED BY bucket
    (raise MM_BUCKETS to O(cores) at 100 TB; no global sort, no
    single-partition window); pricing is map-side; the payload column
    is never read (metadata-only, m5's plan-pinned property)."""
    from pyspark.sql.window import Window

    from bc_proj3_spark.functions.hashing import hash60
    from bc_proj3_spark.operators.sampling import _seeded
    from bc_proj3_spark.operators.textstats import BPE_RE

    docs = fanout(table(spark, sf_dir, "documents"))
    h = hash60(_seeded("mmpack", F.col("doc_id").cast("string")))
    w_ = (F.lit(64) + (F.col("doc_id") % 5) * 32).cast("bigint")
    h_ = (F.lit(48) + (F.col("doc_id") % 3) * 16).cast("bigint")
    patches = F.expr(
        f"((64 + (doc_id % 5) * 32 + {PATCH - 1}) div {PATCH})"
        f" * ((48 + (doc_id % 3) * 16 + {PATCH - 1}) div {PATCH})"
    )
    media_tokens = (
        F.when((F.col("doc_id") % 3).cast("int") == 0, patches)
        .when(
            (F.col("doc_id") % 3).cast("int") == 2,
            patches * VIDEO_FRAMES,
        )
        .otherwise(F.expr(f"cast(n_chars as bigint) div {AUDIO_BYTES_PER_TOKEN}"))
    )
    text_tokens = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_RE), F.lit(0))
    ).cast("bigint")
    priced = docs.select(
        "doc_id",
        (h % MM_BUCKETS).alias("bucket"),
        h.alias("hh"),
        text_tokens.alias("text_tokens"),
        media_tokens.cast("bigint").alias("media_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("hh").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = F.col("text_tokens") + F.col("media_tokens")
    packed = priced.select(
        "bucket",
        "text_tokens",
        "media_tokens",
        F.expr(
            f"(sum(text_tokens + media_tokens) over ("
            f"partition by bucket order by hh asc, doc_id asc "
            f"rows between unbounded preceding and current row) "
            f"- (text_tokens + media_tokens)) div {MM_WINDOW}"
        ).alias("pack_id"),
    )
    return packed.groupBy("bucket", F.col("pack_id").cast("bigint").alias("pack_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("text_tokens").cast("bigint").alias("text_token_sum"),
        F.sum("media_tokens").cast("bigint").alias("media_token_sum"),
        F.sum(tot).cast("bigint").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# m7 — per-source modality token balance (the mixed-corpus audit table)
# ---------------------------------------------------------------------------


def _m7_oracle() -> str:
    from bc_proj3_spark.operators.textstats import BPE_RE

    return f"""
WITH priced AS (
  SELECT doc_id, source,
         {_MEDIA_TYPE} AS media_type,
         CASE {_MEDIA_TYPE}
           WHEN 'image' THEN ((CAST(64 + (doc_id % 5) * 32 AS BIGINT)
                               + {PATCH - 1}) // {PATCH})
                             * ((CAST(48 + (doc_id % 3) * 16 AS BIGINT)
                                 + {PATCH - 1}) // {PATCH})
           WHEN 'video' THEN ((CAST(64 + (doc_id % 5) * 32 AS BIGINT)
                               + {PATCH - 1}) // {PATCH})
                             * ((CAST(48 + (doc_id % 3) * 16 AS BIGINT)
                                 + {PATCH - 1}) // {PATCH})
                             * {VIDEO_FRAMES}
           ELSE CAST(n_chars AS BIGINT) // {AUDIO_BYTES_PER_TOKEN}
         END AS media_tokens,
         CAST(len(regexp_extract_all(lower(text), '{BPE_RE}')) AS BIGINT)
           AS text_tokens
  FROM documents
),
rows_ AS (
  SELECT source, 'text' AS modality, text_tokens AS tokens FROM priced
  UNION ALL
  SELECT source, media_type AS modality, media_tokens AS tokens FROM priced
),
agg AS (
  SELECT source, modality,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(tokens) AS BIGINT) AS token_sum
  FROM rows_ GROUP BY source, modality
),
tot AS (
  SELECT source, CAST(SUM(token_sum) AS BIGINT) AS t
  FROM agg GROUP BY source
)
SELECT a.source, a.modality, a.n_docs, a.token_sum,
       CAST(a.token_sum AS DOUBLE) / CAST(t.t AS DOUBLE) AS token_share
FROM agg a JOIN tot t ON a.source = t.source
"""


@register("m7_modality_balance", _m7_oracle())
def m7_modality_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source modality token balance: every document is priced as
    text BPE tokens PLUS its media tokens (m5's metadata-only formula),
    and the ledger reports each modality's token share within each
    source — the audit a mixed-modality recipe runs before setting mix
    weights, since a source that is nominally "text with images" may be
    90 % patch tokens by bill (m5 prices the corpus globally; this
    splits the bill by source × modality, the granularity mix decisions
    are made at).

    Exactness: all token prices are exact integer metadata arithmetic
    (m5/m6's formulas, shared constants); sums are exact BIGINTs;
    token_share is ONE IEEE division of exact integers.

    Scale shape: one documents scan (payload column never read — the
    price is metadata-only) fans each doc's two modality rows out
    MAP-SIDE via explode; both aggregates are combiner-absorbed and
    source×modality-bounded; the share join broadcasts the
    source-bounded totals."""
    from bc_proj3_spark.operators.textstats import BPE_RE

    # Derive media type + metadata inline from documents (the same
    # formulas media_table uses — it is itself a pure projection of
    # documents) so the whole operator is ONE scan; joining the
    # media_table view back to documents on doc_id measured 8 scans /
    # 20 exchanges in the formatted plan for what is a per-row price.
    docs = fanout(table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "text", "n_chars"
    )
    media_type = (
        F.when((F.col("doc_id") % 3).cast("int") == 0, F.lit("image"))
        .when((F.col("doc_id") % 3).cast("int") == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    w = (F.lit(64) + (F.col("doc_id") % 5).cast("int") * 32).cast("bigint")
    h = (F.lit(48) + (F.col("doc_id") % 3).cast("int") * 16).cast("bigint")
    src_b = F.col("n_chars").cast("bigint")
    patches = (
        F.floor((w + (PATCH - 1)) / PATCH)
        * F.floor((h + (PATCH - 1)) / PATCH)
    ).cast("bigint")
    media_tokens = (
        F.when(media_type == "image", patches)
        .when(media_type == "video", patches * VIDEO_FRAMES)
        .otherwise(F.floor(src_b / AUDIO_BYTES_PER_TOKEN).cast("bigint"))
    )
    text_tokens = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_RE), F.lit(0))
    ).cast("bigint")
    priced = docs.select(
        "doc_id",
        "source",
        "text",
        media_type.alias("media_type"),
        media_tokens.alias("mt"),
    )
    rows = priced.select(
        "source",
        F.explode(
            F.array(
                F.struct(
                    F.lit("text").alias("modality"),
                    text_tokens.alias("tokens"),
                ),
                F.struct(
                    F.col("media_type").alias("modality"),
                    F.col("mt").alias("tokens"),
                ),
            )
        ).alias("r"),
    ).select("source", "r.modality", "r.tokens")
    # source×modality-bounded (~4 rows per source): checkpoint so the
    # totals branch and the share join read ONE materialization instead
    # of re-running the scan+explode subtree per branch.
    agg = rows.groupBy("source", "modality").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("tokens").cast("bigint").alias("token_sum"),
    ).localCheckpoint(eager=True)
    tot = agg.groupBy("source").agg(
        F.sum("token_sum").cast("bigint").alias("t")
    )
    return agg.join(F.broadcast(tot), "source").select(
        "source",
        "modality",
        "n_docs",
        "token_sum",
        (
            F.col("token_sum").cast("double") / F.col("t").cast("double")
        ).alias("token_share"),
    )
