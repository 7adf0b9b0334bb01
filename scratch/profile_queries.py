"""Profile registered queries: wall time, #Spark jobs, #tasks, plan.

Usage: python scratch/profile_queries.py name1,name2,... [out_dir]
Writes <out>/<name>.plan.txt (explain formatted) and prints one line per
query: name, build_s (DataFrame construction = driver/py4j/analysis),
exec_s (noop write), n_jobs, n_stages, n_tasks.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

names = sys.argv[1].split(",")
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/profile_plans"
os.makedirs(out_dir, exist_ok=True)

from bc_proj3_spark import registry
from bc_proj3_spark.session import apply_runtime_conf, get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(
    app_name="profile",
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)
apply_runtime_conf(spark)
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
specs = registry.all_queries()

# warmup
try:
    df = specs["q1_pricing_summary"].builder(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
except Exception:
    pass

print(f"{'query':38s} {'build_s':>7s} {'exec_s':>7s} {'jobs':>5s} {'stages':>6s} {'tasks':>6s}")
for name in names:
    spec = specs[name]
    group = f"prof_{name}"
    sc.setJobGroup(group, name)
    t0 = time.perf_counter()
    df = spec.builder(spark, sf_dir)
    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    tracker = sc.statusTracker()
    job_ids = tracker.getJobIdsForGroup(group)
    n_stages = 0
    n_tasks = 0
    for jid in job_ids:
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        for sid in info.stageIds:
            si = tracker.getStageInfo(sid)
            if si is not None:
                n_stages += 1
                n_tasks += si.numTasks
    with open(os.path.join(out_dir, f"{name}.plan.txt"), "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))
    print(
        f"{name:38s} {t1 - t0:7.2f} {t2 - t1:7.2f} {len(job_ids):5d}"
        f" {n_stages:6d} {n_tasks:6d}",
        flush=True,
    )
    spark.catalog.clearCache()
    sc.setJobGroup(None, None)
