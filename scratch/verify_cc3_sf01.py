"""Strict-verify cc3_pagerank at sf0.1 with DuckDB tuned to stay
in-memory (low thread count -> fewer operator partitions -> no
tens-of-GB temp spill from the materialized d4 CTEs)."""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import duckdb
from pyspark.sql import SparkSession

from bc_proj3_spark import registry
from conftest import strict_rows_key

threads = sys.argv[1] if len(sys.argv) > 1 else "6"

spark = (
    SparkSession.builder.master("local[8]")
    .appName("cc3-sf01-verify")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

spec = registry.all_queries()["cc3_pagerank"]
t0 = time.time()
sdf = spec.builder(spark, "/root/testdata/sf0.1")
srows = [tuple(r) for r in sdf.collect()]
scols = list(sdf.columns)
print(f"spark side done: {len(srows)} rows in {time.time()-t0:.1f}s", flush=True)

con = duckdb.connect()
con.execute(f"SET threads={threads}")
con.execute("SET memory_limit='90GB'")
con.execute("SET temp_directory='/root/repo/.tmp'")
for t in ["documents"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.1/{t}.parquet')"
    )
t0 = time.time()
res = con.execute(spec.oracle)
ocols = [d[0] for d in res.description]
orows = [tuple(r) for r in res.fetchall()]
print(f"oracle done: {len(orows)} rows in {time.time()-t0:.1f}s", flush=True)

assert len(srows) == len(orows), (len(srows), len(orows))
assert sorted(scols) == sorted(ocols), (scols, ocols)
sk, _ = strict_rows_key(scols, srows)
ok, _ = strict_rows_key(ocols, orows)
print("STRICT-EQUAL" if sk == ok else "MISMATCH", flush=True)
