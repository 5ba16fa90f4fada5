"""A/B the CC pointer-jump de-skew at the 20M-edge trend point.

Same JVM, alternating legs (plain -> adaptive -> plain -> adaptive ...),
same synthetic hub-skewed graph as scale_trend.py, CC to convergence.
`plain` (jump_salt=1, bcast_components=0) is the pre-de-skew plan; adaptive
is the shipped default. Prints one JSON line per leg + a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from credigraph_spark.session import get_spark
from credigraph_spark.graph import connected_components

N_EDGES = int(os.environ.get("AB_EDGES", "20000000"))
REPS = int(os.environ.get("AB_REPS", "3"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))

os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
spark = get_spark(f"cc-ab-{CPUS}", master=f"local[{CPUS}]",
                  shuffle_partitions=128,
                  extra={"spark.sql.autoBroadcastJoinThreshold": "-1",
                         "spark.local.dir": "/dev/shm/spark-tmp"})

v = max(N_EDGES // 20, 1000)
base = spark.range(0, N_EDGES, 1, 128)
e = base.select(
    F.pmod(F.xxhash64(F.col("id")), F.lit(v)).alias("src"),
    F.when(F.col("id") % 100 == 0, F.lit(0))
     .otherwise(F.pmod(F.xxhash64(F.col("id") + 7), F.lit(v))).alias("dst"))
e = e.persist(); e.count()

CONFIGS = {
    "plain": {"bcast_components": 0, "jump_salt": 1},
    "adaptive": {},
}
times: dict[str, list[float]] = {k: [] for k in CONFIGS}
strategies: dict[str, list] = {}
for rep in range(REPS):
    for name, kw in CONFIGS.items():
        t0 = time.time()
        labels, info = connected_components(e, max_iter=6, **kw)
        labels.count()
        dt = round(time.time() - t0, 2)
        times[name].append(dt)
        strategies[name] = info["jump_strategies"]
        print(json.dumps({"leg": name, "rep": rep, "sec": dt,
                          "iters": info["iterations"],
                          "strategies": info["jump_strategies"]}), flush=True)

summary = {
    "n_edges": N_EDGES, "cpus": CPUS, "reps": REPS,
    "plain_median": sorted(times["plain"])[REPS // 2],
    "adaptive_median": sorted(times["adaptive"])[REPS // 2],
    "plain_all": times["plain"], "adaptive_all": times["adaptive"],
    "adaptive_strategies": strategies["adaptive"],
}
print(json.dumps(summary))
spark.stop()
