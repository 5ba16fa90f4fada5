"""CC (and LPA) N -> 4N on the standalone cluster at 100M edges.

standalone_scaling.py measured connected components only at 20M edges
(0.77 efficiency). The local[N] trend shows efficiency RISES with
per-superstep data (serial floor amortizes), so this script adds the
100M-edge CC point — plus LPA, the other gather-shaped superstep loop —
on the same 2x2 vs 8x2 standalone topology, and appends the rows to
BENCH.md.

Run: python scripts_local/standalone_cc_big.py   (~25 min, box idle)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from standalone_scaling import (  # noqa: E402
    ENV, MASTER, REPO, WORKER_CORES,
    start_master, start_workers, stop_master, stop_workers,
)

CC_SIZE = int(os.environ.get("CCBIG_EDGES", 100_000_000))
CC_ITERS = int(os.environ.get("CCBIG_CC_ITERS", 4))       # 0 = skip CC
LPA_ITERS = int(os.environ.get("CCBIG_LPA_ITERS", 0))     # 0 = skip LPA

LEG = r'''
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from credigraph_spark.session import get_spark
from credigraph_spark.graph import connected_components
from credigraph_spark.graph.lpa import label_propagation

n_exec = int(os.environ["LEG_EXECUTORS"])
cores = n_exec * {cores}
spark = get_spark(f"standalone-cc-{{n_exec}}x{cores}", master={master!r},
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
     .otherwise(F.pmod(F.xxhash64(F.col("id") + 7), F.lit(v))).alias("dst"))
e = e.persist(); e.count()

# UNMEASURED warmup (JIT/codegen/heap — see standalone_scaling.py)
if {cc_iters} > 0:
    connected_components(e, max_iter=1)[0].count()
if {lpa_iters} > 0:
    label_propagation(e, max_iter=1)[0].count()

if {cc_iters} > 0:
    t0 = time.time()
    labels, info = connected_components(e, max_iter={cc_iters})
    labels.count()
    out["cc"] = round(time.time() - t0, 2)

if {lpa_iters} > 0:
    t0 = time.time()
    lp, linfo = label_propagation(e, max_iter={lpa_iters})
    lp.count()
    out["lpa"] = round(time.time() - t0, 2)

print("RESULT " + json.dumps(out))
spark.stop()
'''


def run_leg(n_workers: int) -> dict:
    start_workers(n_workers)
    try:
        job = LEG.format(repo=REPO, master=MASTER, cores=WORKER_CORES,
                         n_edges=CC_SIZE, cc_iters=CC_ITERS,
                         lpa_iters=LPA_ITERS)
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
    jobs = ([("cc", CC_ITERS)] if CC_ITERS else []) + \
           ([("lpa", LPA_ITERS)] if LPA_ITERS else [])
    for job, iters in jobs:
        t4, t16 = lo[job], hi[job]
        eff = t4 / (4 * t16)
        name = ("connected components" if job == "cc"
                else "label propagation")
        rows.append((f"{name}, {iters} supersteps", CC_SIZE, t4, t16,
                     eff, eff / hw_eff))

    lines = ["", f"Large-size CC rows (same topology, idle box, hw "
                 f"2exec->8exec eff = {hw_eff:.2f}):", ""]
    lines.append("| job | edges | T(2 exec) s | T(8 exec) s | efficiency | eff/hw |")
    lines.append("|---|---|---|---|---|---|")
    for name, n, t4, t16, eff, effhw in rows:
        lines.append(f"| {name} | {n:,} | {t4} | {t16} | **{eff:.2f}** | {effhw:.2f} |")
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"lo": lo, "hi": hi, "rows": rows}))


if __name__ == "__main__":
    main()
