"""The engine's curated programmatic surface.

``registry.all_queries()`` is the DRIVER-facing surface (named queries
with oracles); this module is the USER-facing one — the reusable
operators a pipeline author composes directly, re-exported from their
implementation modules under stable names. Everything here takes and
returns DataFrames (or is a Catalog method), carries its scale posture
in its own docstring, and is covered by the named tests listed in
STATUS.md.

    from bc_proj3_spark import api

    spark = api.get_spark()
    cat = api.Catalog(spark, "/warehouse")
    clean = api.dedup_corpus_ops  # see groups below
"""

from __future__ import annotations

# session / warehouse
from bc_proj3_spark.catalog import Catalog
from bc_proj3_spark.session import apply_runtime_conf, get_spark, stop_spark

# incremental load primitives (the reference's MERGE/dedup-insert parity)
from bc_proj3_spark.operators.incremental import (
    PreconditionError,
    ValidationError,
    dedup_insert,
    merge_upsert,
)

# dedup family (content identity)
from bc_proj3_spark.operators.dedup import (
    decontaminate,
    shingle_df_cap,
    shingles,
)

# graph clustering over pair lists
from bc_proj3_spark.operators.graph import (
    min_label_components,
    star_components,
    triangle_census,
)

# document chunking (RAG / pretraining prep)
from bc_proj3_spark.operators.chunking import chunk_documents

# data layout
from bc_proj3_spark.operators.layout import zorder_key, zorder_layout

# hot-key joins
from bc_proj3_spark.operators.skew import salted_join

# text building blocks
from bc_proj3_spark.functions.text import (
    clean_text,
    distinct_tokens,
    fingerprint,
    tokenize,
)

# deterministic numeric aggregation
from bc_proj3_spark.functions.numeric import dec_avg, dec_sum

__all__ = [
    # session / warehouse
    "get_spark",
    "stop_spark",
    "apply_runtime_conf",
    "Catalog",
    # incremental
    "merge_upsert",
    "dedup_insert",
    "PreconditionError",
    "ValidationError",
    # dedup
    "shingles",
    "shingle_df_cap",
    "decontaminate",
    # graph
    "min_label_components",
    "star_components",
    "triangle_census",
    # chunking
    "chunk_documents",
    # layout
    "zorder_key",
    "zorder_layout",
    # joins
    "salted_join",
    # text
    "clean_text",
    "tokenize",
    "distinct_tokens",
    "fingerprint",
    # numeric
    "dec_sum",
    "dec_avg",
]
