"""Results must not depend on the shuffle width.

The distributed-correctness property behind every 100 TB claim: a
query's VALUES may never change with the cluster's partition count —
no ordering dependence, no per-partition RNG, no first()-wins
nondeterminism. This replays the most order-sensitive registered
queries (hash-sampling, weighted top-k, packing, dedup survivor
selection, rolling windows) in a subprocess pinned to a deliberately
odd, small shuffle width (5) and requires the exact row multiset the
default-width session produced.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from bc_proj3_spark import registry
from tests.conftest import rows_key

SF = "/root/testdata/sf0.01"

#: the queries whose plans lean hardest on partition-dependent shapes
INVARIANCE_QUERIES = [
    "sk7_bottomk_quantile",  # per-group rank over hash order
    "sp6_weighted_sample",  # global top-k by exponential key
    "sp4_sequence_packing",  # per-bucket greedy packing
    "t7_rolling_fingerprint",  # ordered rolling hash
    "d2_dedup_survivors",  # rank-window survivor pick
    "sk10_kmv_intersection",  # bottom-K sketch ranks over hash order
    "sp16_pack_efficiency",  # per-bucket cumulative fill over hash order
    "pipe3_recipe_attrition",  # mix ranks + pack offsets over hash order
    "sp17_token_budget_mix",  # per-source cumulative admission over hash order
    "t31_term_burstiness",  # double-ordered top-k from integer moments
]

_PROG = """
import json, sys
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.appName("partition-invariance")
    .master("local[4]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as entrymod

sf_dir, names = sys.argv[1], json.loads(sys.argv[2])
queries = entrymod.queries()
out = {}
for name in names:
    df = queries[name](spark, sf_dir)
    out[name] = {
        "columns": df.columns,
        "rows": [[repr(c) for c in row] for row in df.collect()],
    }
print("PARTITION_INVARIANCE_JSON:" + json.dumps(out))
"""


@pytest.fixture(scope="module")
def narrow_results():
    env = dict(os.environ, SPARK_GRAFT_SHUFFLE="5")
    proc = subprocess.run(
        [sys.executable, "-c", _PROG, SF, json.dumps(INVARIANCE_QUERIES)],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(
        l
        for l in proc.stdout.splitlines()
        if l.startswith("PARTITION_INVARIANCE_JSON:")
    )
    return json.loads(line.split(":", 1)[1])


@pytest.mark.parametrize("name", INVARIANCE_QUERIES, ids=str)
def test_values_survive_shuffle_width_change(spark, narrow_results, name):
    spec = registry.all_queries()[name]
    df = spec.builder(spark, SF)
    wide_rows = [tuple(repr(c) for c in row) for row in df.collect()]
    narrow = narrow_results[name]
    narrow_rows = [tuple(r) for r in narrow["rows"]]
    assert sorted(df.columns) == sorted(narrow["columns"])
    assert sorted(wide_rows) == sorted(narrow_rows), (
        f"{name}: values changed with shuffle width "
        f"({len(wide_rows)} vs {len(narrow_rows)} rows)"
    )
