"""Silver stages: typed projections + incremental loads.

Three incremental strategies, one per source, mirroring the reference:

- **arxiv** (silver_arxiv.py): watermark on updated_dt (re-read overlap
  via >=), MERGE upsert on article id with update-if-newer-version;
- **nytarchive** (silver_nyt_archive.py): append-only with surrogate-key
  dedup (anti join), no watermark;
- **googlescholar** (silver_google_scholar.py): derived publish_dt
  (native days_ago parse), insert rows with publish_dt strictly greater
  than the watermark, watermark = max over the whole target.

Documented deviations from the reference (SURVEY.md §7.4):
- version is cast to int so '10' sorts after '9' (the reference
  compares strings, :117-151);
- days_ago is a native regexp (the reference UDF crashes on digit-less
  snippets and has an always-true condition, :107-117);
- scholar's strict-> watermark drops same-day re-derived rows — kept
  verbatim for parity, and pinned by a test.

Row-count conservation (pre == post of the typed projection) is
asserted exactly as the notebooks do (silver_arxiv.py:64,161-166).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bc_proj3_spark.catalog import Catalog
from bc_proj3_spark.operators import incremental as inc

_DAYS_AGO_RE = r"^\s*(\d+)\s+days? ago"


def _run_date_col() -> Column:
    """bronze's YYYYMMDD audit string → date (silver_arxiv.py:89-94)."""
    return F.to_date(F.col("run_date"), "yyyyMMdd")


def _sk(*parts: Column | str) -> Column:
    """sha2-256 surrogate key over concat_ws'd parts (silver_arxiv.py:117).
    concat_ws skips nulls — key semantics depend on it (SURVEY.md F5)."""
    return F.sha2(F.concat_ws("||", *parts), 256)


def days_ago(snippet: Column) -> Column:
    """Native rewrite of the days_ago UDF (silver_google_scholar.py:107-117):
    leading 'N day(s) ago' → N, else null."""
    return F.when(
        snippet.rlike(_DAYS_AGO_RE),
        F.regexp_extract(snippet, _DAYS_AGO_RE, 1).cast("int"),
    )


# ---------------------------------------------------------------------------
# arxiv — watermark + merge upsert
# ---------------------------------------------------------------------------


def silver_arxiv(
    spark: SparkSession, catalog: Catalog, fresh: bool = False
) -> dict:
    table = "arxiv"
    if fresh:
        catalog.drop("silver", table)
        catalog.drop("silver", inc.watermark_name(table))

    watermark = inc.resolve_watermark(catalog, table)
    bronze = catalog.read("bronze", table)
    pre = bronze.count()

    arx_tail = F.split(F.split(F.col("id"), "/").getItem(4), "v")
    proj = bronze.select(
        arx_tail.getItem(0).cast("string").alias("id"),
        arx_tail.getItem(1).cast("int").alias("version"),
        F.col("id").cast("string").alias("link"),
        F.col("summary").cast("string").alias("summary"),
        F.col("title").cast("string").alias("title"),
        F.substring(F.col("updated"), 1, 10).cast("date").alias("updated_dt"),
        F.col("source_file_name").cast("string").alias("source_file_name"),
        _run_date_col().alias("run_date"),
        F.col("load_ts").cast("timestamp").alias("load_ts"),
    )
    keyed = proj.select(
        _sk(F.col("id"), F.col("version"), F.col("updated_dt")).alias("arx_sk"), "*"
    )

    if watermark is None:
        catalog.overwrite("silver", table, keyed, partition_by=["run_date"])
        inserted, updated = keyed.count(), 0
        catalog.log_operation("silver", table, "CREATE", numTargetRowsInserted=inserted)
    else:
        src = keyed.filter(F.col("updated_dt") >= F.lit(watermark))
        tgt = catalog.read("silver", table)
        res = inc.merge_upsert(
            tgt, src, key="id",
            update_when=F.col("src.version") > F.col("tgt.version"),
            partition_col="run_date",
        )
        try:
            if res.scoped_df is not None:
                # rewrite ONLY the run_date partitions the batch touched
                # (Delta-style pruning; untouched partitions' files stay)
                catalog.overwrite_partitions(
                    "silver", table, res.scoped_df, res.touched_partitions
                )
            else:  # null run_date in the touched set — full rewrite
                catalog.overwrite("silver", table, res.df, partition_by=["run_date"])
        finally:
            res.cleanup()  # release merge branches even on write failure
        inserted, updated = res.inserted, res.updated
        catalog.log_operation(
            "silver", table, "MERGE",
            numTargetRowsInserted=inserted, numTargetRowsUpdated=updated,
        )

    post = proj.count()
    if pre != post:
        raise inc.ValidationError(
            f"silver.{table}: rows lost in transformation ({pre}->{post})"
        )

    max_date = proj.agg(F.max("updated_dt").alias("m")).collect()[0]["m"]
    if max_date is not None:
        inc.write_watermark(catalog, table, str(max_date))
    return {"inserted": inserted, "updated": updated, "rows": pre}


# ---------------------------------------------------------------------------
# nytarchive — dedup append (no watermark)
# ---------------------------------------------------------------------------


def silver_nyt(spark: SparkSession, catalog: Catalog, fresh: bool = False) -> dict:
    table = "nytarchive"
    if fresh:
        catalog.drop("silver", table)

    bronze = catalog.read("bronze", table)
    pre = bronze.count()
    proj = bronze.select(
        F.col("_id").cast("string").alias("id"),
        F.col("abstract").cast("string").alias("abstract"),
        F.col("lead_paragraph").cast("string").alias("lead_paragraph"),
        F.col("snippet").cast("string").alias("snippet"),
        F.substring(F.col("pub_date"), 1, 10).cast("date").alias("publish_dt"),
        F.col("source_file_name").cast("string").alias("source_file_name"),
        _run_date_col().alias("run_date"),
        F.col("load_ts").cast("timestamp").alias("load_ts"),
    )
    keyed = proj.select(_sk(F.col("id"), F.col("publish_dt")).alias("nyt_sk"), "*")

    if not catalog.exists("silver", table):
        catalog.overwrite("silver", table, keyed, partition_by=["run_date"])
        inserted = keyed.count()
        catalog.log_operation("silver", table, "CREATE", numTargetRowsInserted=inserted)
    else:
        tgt = catalog.read("silver", table)
        res = inc.dedup_insert(tgt, keyed, key="nyt_sk")
        try:
            catalog.append("silver", table, res.df)
        finally:
            res.cleanup()
        inserted = res.inserted
        catalog.log_operation("silver", table, "INSERT", numTargetRowsInserted=inserted)

    post = proj.count()
    if pre != post:
        raise inc.ValidationError(
            f"silver.{table}: rows lost in transformation ({pre}->{post})"
        )
    return {"inserted": inserted, "updated": 0, "rows": pre}


# ---------------------------------------------------------------------------
# googlescholar — derived publish_dt + strict-> watermark insert
# ---------------------------------------------------------------------------


def silver_scholar(
    spark: SparkSession, catalog: Catalog, fresh: bool = False
) -> dict:
    table = "googlescholar"
    if fresh:
        catalog.drop("silver", table)
        catalog.drop("silver", inc.watermark_name(table))

    watermark = inc.resolve_watermark(catalog, table)
    bronze = catalog.read("bronze", table)
    pre = bronze.count()

    run_date = _run_date_col()
    publish_dt = F.coalesce(
        F.date_sub(run_date, days_ago(F.col("snippet"))), run_date
    )
    proj = bronze.select(
        F.col("link").cast("string").alias("link"),
        F.col("result_id").cast("string").alias("result_id"),
        F.col("snippet").cast("string").alias("snippet"),
        F.col("title").cast("string").alias("title"),
        publish_dt.alias("publish_dt"),
        F.col("source_file_name").cast("string").alias("source_file_name"),
        run_date.alias("run_date"),
        F.col("load_ts").cast("timestamp").alias("load_ts"),
    )
    keyed = proj.select(
        _sk(F.col("result_id"), F.col("publish_dt")).alias("ggl_sk"), "*"
    )

    if watermark is None:
        catalog.overwrite("silver", table, keyed, partition_by=["run_date"])
        inserted = keyed.count()
        catalog.log_operation("silver", table, "CREATE", numTargetRowsInserted=inserted)
    else:
        # strict > : same-day rows at the watermark are dropped — the
        # reference's documented semantics (silver_google_scholar.py:162)
        fresh_rows = keyed.filter(F.col("publish_dt") > F.lit(watermark))
        catalog.append("silver", table, fresh_rows)
        inserted = fresh_rows.count()
        catalog.log_operation("silver", table, "INSERT", numTargetRowsInserted=inserted)

    post = proj.count()
    if pre != post:
        raise inc.ValidationError(
            f"silver.{table}: rows lost in transformation ({pre}->{post})"
        )

    # watermark = max(publish_dt) over the WHOLE target (not the batch) —
    # silver_google_scholar.py:215
    max_date = (
        catalog.read("silver", table).agg(F.max("publish_dt").alias("m")).collect()[0]["m"]
    )
    if max_date is not None:
        inc.write_watermark(catalog, table, str(max_date))
    return {"inserted": inserted, "updated": 0, "rows": pre}
