"""Layer-namespaced parquet warehouse — the engine's table catalog.

Stands in for the reference's ``main.bronze/silver/gold`` Delta catalog
(bronze_arxiv.py:102-104, silver_arxiv.py:114-128): tables live at
``<warehouse>/<layer>/<name>`` as parquet directories, and the catalog
exposes the same verbs the notebooks use — CTAS-overwrite, append,
read, drop-if-exists, existence/list checks (SURVEY.md §2.1
S6-S9/S12-S13).

Overwrite is write-to-temp-then-swap so a plan that *reads* a table can
rebuild the same table (the silver merge reads its target and replaces
it): the new contents are fully materialized before the old directory
is removed, and readers of the old snapshot were already satisfied.

Scale note: on a real deployment this thin path-catalog is the seam
where Delta/Iceberg slots in (ACID swap, MERGE, time travel,
DESCRIBE HISTORY); the pipeline code only talks to these verbs, so the
swap is local to this module. Partition columns are threaded through
``write`` so silver/gold tables can be laid out by run_date/publish_dt
for partition pruning.
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

LAYERS = ("bronze", "silver", "gold")


class Catalog:
    def __init__(self, spark: SparkSession, warehouse_dir: str):
        self.spark = spark
        self.warehouse = Path(warehouse_dir)

    # -- paths ------------------------------------------------------------

    def path(self, layer: str, name: str) -> Path:
        if layer not in LAYERS:
            raise ValueError(f"unknown layer {layer!r}; expected one of {LAYERS}")
        return self.warehouse / layer / name

    # -- existence / listing ---------------------------------------------

    def exists(self, layer: str, name: str) -> bool:
        p = self.path(layer, name)
        return p.is_dir() and any(f.suffix == ".parquet" for f in p.iterdir())

    def list_tables(self, layer: str) -> list[str]:
        base = self.warehouse / layer
        if not base.is_dir():
            return []
        return sorted(p.name for p in base.iterdir() if self.exists(layer, p.name))

    # -- read / write -----------------------------------------------------

    def read(self, layer: str, name: str) -> DataFrame:
        if not self.exists(layer, name):
            raise FileNotFoundError(f"table {layer}.{name} does not exist")
        return self.spark.read.parquet(str(self.path(layer, name)))

    def overwrite(
        self, layer: str, name: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> int:
        """CREATE OR REPLACE TABLE AS SELECT. Returns rows written."""
        target = self.path(layer, name)
        # NOTE: no '.'/'_' prefix — Spark's file index silently ignores
        # hidden/metadata paths, which would break the row-count read-back.
        tmp = target.with_name(f"tmp-{name}-{uuid.uuid4().hex[:8]}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(tmp))  # materializes BEFORE the swap
        rows = self.spark.read.parquet(str(tmp)).count()
        if target.exists():
            shutil.rmtree(target)
        tmp.rename(target)
        return rows

    def append(self, layer: str, name: str, df: DataFrame) -> None:
        """INSERT INTO. The caller is responsible for dedup semantics
        (anti-join first, as in silver_nyt_archive.py:102-120)."""
        df.write.mode("append").parquet(str(self.path(layer, name)))

    def drop(self, layer: str, name: str) -> None:
        """DROP TABLE IF EXISTS."""
        p = self.path(layer, name)
        if p.exists():
            shutil.rmtree(p)
