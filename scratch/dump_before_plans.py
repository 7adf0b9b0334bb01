"""Dump post-change .explain("formatted") plans to plans/r11/<name>_before.txt.

Same method as the _before dumps (scratch/profile_queries.py): build the
DataFrame, execute once via the noop sink so AQE final plans materialize,
then write the formatted explain. No seam env var set — compute plans.

Usage: python scratch/dump_after_plans.py name1,name2,...
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

names = sys.argv[1].split(",")
out_dir = "/root/repo/plans/r11"
os.makedirs(out_dir, exist_ok=True)

from bc_proj3_spark import registry
from bc_proj3_spark.session import apply_runtime_conf, get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(
    app_name="dump_after_plans",
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)
apply_runtime_conf(spark)
spark.sparkContext.setLogLevel("ERROR")
specs = registry.all_queries()

# warmup
try:
    df = specs["q1_pricing_summary"].builder(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
except Exception:
    pass

for name in names:
    spec = specs[name]
    t0 = time.perf_counter()
    df = spec.builder(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    t1 = time.perf_counter()
    with open(os.path.join(out_dir, f"{name}_before.txt"), "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))
    print(f"{name:40s} {t1 - t0:7.2f}s", flush=True)
    spark.catalog.clearCache()
print("DONE")
