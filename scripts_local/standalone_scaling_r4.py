"""Round-4 operators on the standalone N -> 4N harness.

Same topology as standalone_scaling.py (real standalone master, 2
workers x 2 cores vs 8 workers x 2 cores, separate executor JVMs,
/dev/shm shuffle, per-leg busy-loop control): measures the NEW round-4
operators so their scaling shape is on record next to PR/CC/LPA:

* weighted PageRank, shuffle mode, 15 fixed supersteps, 20M edges with
  deterministic synthetic weights — the superstep plan is the unweighted
  one plus a single column multiply, so it should land on the unweighted
  20M row (169.6 / 76.2 s, eff 0.56);
* coreness decomposition, k_max=4, rounds_per_k=2, 20M edges — six
  bounded peel rounds (degree agg + two semi joins each), the same
  shuffle family as CC's supersteps.

Run: python scripts_local/standalone_scaling_r4.py   (~15 min, box idle)
Appends the measured table to BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from standalone_scaling import (  # noqa: E402
    ENV, MASTER, WORKER_CORES, start_master, start_workers, stop_master,
    stop_workers,
)

N_EDGES = 20_000_000
PR_ITERS = 15

LEG = r'''
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from credigraph_spark.session import get_spark
from credigraph_spark.graph import coreness, pagerank

n_exec = int(os.environ["LEG_EXECUTORS"])
cores = n_exec * {cores}
spark = get_spark(f"r4scale-{{n_exec}}x{cores}", master={master!r},
                  shuffle_partitions=128,
                  extra={{"spark.sql.autoBroadcastJoinThreshold": "-1",
                          "spark.executor.cores": "{cores}",
                          "spark.executor.memory": "8g",
                          "spark.cores.max": str(cores)}})

def _burn(_):
    t = time.time(); x = 0
    while time.time() - t < 1.5: x += 1
    return x

def hw_control(c):
    sc = spark.sparkContext
    t0 = time.time()
    tot = sc.parallelize(range(c), c).map(_burn).sum()
    return tot / (time.time() - t0)

out = {{"executors": n_exec, "cores": cores, "hw_rate": hw_control(cores)}}

n_edges = {n_edges}
v = max(n_edges // 20, 1000)
base = spark.range(0, n_edges, 1, 128)
e = base.select(
    F.pmod(F.xxhash64(F.col("id")), F.lit(v)).alias("src"),
    F.when(F.col("id") % 100 == 0, F.lit(0))
     .otherwise(F.pmod(F.xxhash64(F.col("id") + 7), F.lit(v))).alias("dst"),
    (F.pmod(F.xxhash64(F.col("id") + 13), F.lit(10)) + 1)
        .cast("double").alias("w"))
e = e.persist(); e.count()

# unmeasured warmup (fresh executor JVMs: JIT/codegen/broadcast machinery)
pagerank(e, max_iter=3, tol=0.0, mode="shuffle", salt_buckets=32,
         weight_col="w")[0].count()

# in-run comparator: the UNWEIGHTED job round 3 already measured (0.56 at
# 20M edges) — if ITS efficiency moves, the box changed, not the code.
t0 = time.time()
ranks, info = pagerank(e.select("src", "dst"), max_iter={pr_iters},
                       tol=0.0, mode="shuffle", salt_buckets=32)
ranks.count()
out["upr"] = round(time.time() - t0, 2)

t0 = time.time()
ranks, info = pagerank(e, max_iter={pr_iters}, tol=0.0, mode="shuffle",
                       salt_buckets=32, weight_col="w")
ranks.count()
out["wpr"] = round(time.time() - t0, 2)

t0 = time.time()
cores_df = coreness(e.select("src", "dst"), k_max=4, rounds_per_k=2)
cores_df.count()
out["coreness"] = round(time.time() - t0, 2)

print("RESULT " + json.dumps(out))
spark.stop()
'''


def run_leg(n_workers: int) -> dict:
    start_workers(n_workers)
    try:
        job = LEG.format(repo=REPO, master=MASTER, cores=WORKER_CORES,
                         n_edges=N_EDGES, pr_iters=PR_ITERS)
        env = dict(ENV, LEG_EXECUTORS=str(n_workers))
        p = subprocess.run([sys.executable, "-c", job], capture_output=True,
                           text=True, env=env, timeout=5400)
        lines = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")]
        if not lines:
            raise RuntimeError(p.stderr[-3000:])
        return json.loads(lines[-1][len("RESULT "):])
    finally:
        stop_workers(n_workers)


def main():
    os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
    start_master()
    try:
        lo = run_leg(2)
        hi = run_leg(8)
    finally:
        stop_master()
    hw_eff = hi["hw_rate"] / (4 * lo["hw_rate"])

    rows = []
    for key, label in (("upr", f"UNWEIGHTED pagerank (r3 comparator), {PR_ITERS} supersteps"),
                       ("wpr", f"weighted pagerank shuffle, {PR_ITERS} supersteps"),
                       ("coreness", "coreness k_max=4, 2 rounds/phase")):
        t4, t16 = lo[key], hi[key]
        eff = t4 / (4 * t16)
        rows.append((label, N_EDGES, t4, t16, eff, eff / hw_eff))

    lines = [
        "",
        "### Round-4 operators on the same standalone topology",
        "",
        (f"(hw 2exec->8exec control eff this run = {hw_eff:.2f}; "
         f"abs rates lo={lo['hw_rate']:.0f} hi={hi['hw_rate']:.0f})"),
        "",
        "| job | edges | T(2 exec) s | T(8 exec) s | efficiency | eff/hw |",
        "|---|---|---|---|---|---|",
    ]
    for label, n, t4, t16, eff, rel in rows:
        lines.append(f"| {label} | {n:,} | {t4} | {t16} | **{eff:.2f}** | {rel:.2f} |")
    text = "\n".join(lines) + "\n"
    print(text)
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(text)


if __name__ == "__main__":
    main()
