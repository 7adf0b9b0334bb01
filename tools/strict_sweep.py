"""Strict-verify named registry queries vs DuckDB on a VANILLA session."""
import sys, time
sys.path.insert(0, "/root/repo")
names = sys.argv[1].split(",")
sfs = (sys.argv[2] if len(sys.argv) > 2 else "0.01").split(",")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]").appName("r8-verify")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "8").config("spark.ui.showConsoleProgress", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import duckdb
from bc_proj3_spark import registry
sys.path.insert(0, "/root/repo/tests")
from conftest import strict_rows_key, rows_key
SPECS = registry.all_queries()
fail = 0
for sf in sfs:
    con = duckdb.connect()
    # 32-thread DuckDB partitions the big materialized-CTE oracles into
    # tens of GB of temp spill at sf0.1 (see tests/test_sf01_strict.py)
    con.execute("SET threads=8")
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf{sf}/{t}.parquet')")
    for name in names:
        spec = SPECS[name]
        t0 = time.time()
        sdf = spec.builder(spark, f"/root/testdata/sf{sf}")
        srows = [tuple(r) for r in sdf.collect()]
        scols = list(sdf.columns)
        res = con.execute(spec.oracle)
        ocols = [d[0] for d in res.description]
        orows = [tuple(r) for r in res.fetchall()]
        dt = time.time() - t0
        if len(srows) != len(orows):
            print(f"FAIL {name} sf{sf}: rows {len(srows)} vs {len(orows)}"); fail += 1; continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name} sf{sf}: cols {sorted(scols)} vs {sorted(ocols)}"); fail += 1; continue
        sk, _ = strict_rows_key(scols, srows); ok, _ = strict_rows_key(ocols, orows)
        if sk != ok:
            nk1, _ = rows_key(scols, srows); nk2, _ = rows_key(ocols, orows)
            kind = "TYPE/ULP" if nk1 == nk2 else "VALUE DRIFT"
            print(f"FAIL {name} sf{sf}: {kind}")
            for i, (a, b) in enumerate(zip(sk, ok)):
                if a != b:
                    print("  spark :", a); print("  duckdb:", b)
                    if i > 3: break
            fail += 1
        else:
            print(f"OK   {name} sf{sf}  rows={len(srows)}  {dt:.1f}s")
        spark.catalog.clearCache()
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
