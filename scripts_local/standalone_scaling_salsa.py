"""SALSA (3 degree-normalized iterations) on the standalone N -> 4N
harness — round-5 scaling datapoint for the newest iterative ranker.

Same topology and noise methodology as standalone_scaling_louvain.py
(real standalone master, 2 workers x 2 cores vs 8 workers x 2 cores,
separate executor JVMs, /dev/shm shuffle, alternating repeated legs with
per-leg busy-loop hardware controls — this VM's per-core rate varies up
to 2x between legs from host CPU steal, so best-of per size + max
control per size bounds it).

Run: python scripts_local/standalone_scaling_salsa.py   (~10 min, box idle)
Appends the measured line to BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from standalone_scaling import (  # noqa: E402
    ENV, MASTER, WORKER_CORES, start_master, start_workers, stop_master,
    stop_workers,
)

N_EDGES = 20_000_000
ITERS = 3

LEG = r'''
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from credigraph_spark.session import get_spark
from credigraph_spark.graph.salsa import salsa

n_exec = int(os.environ["LEG_EXECUTORS"])
cores = n_exec * {cores}
spark = get_spark(f"salsascale-{{n_exec}}x{cores}", master={master!r},
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

salsa(e, max_iter=1).count()  # unmeasured warmup

t0 = time.time()
salsa(e, max_iter={iters}).count()
out["salsa"] = round(time.time() - t0, 2)

print("RESULT " + json.dumps(out))
spark.stop()
'''


def run_leg(n_workers: int) -> dict:
    start_workers(n_workers)
    try:
        job = LEG.format(repo=REPO, master=MASTER, cores=WORKER_CORES,
                         n_edges=N_EDGES, iters=ITERS)
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
    legs: dict[int, list[dict]] = {2: [], 8: []}
    start_master()
    try:
        for n in (2, 8, 2, 8):
            legs[n].append(run_leg(n))
    finally:
        stop_master()
    t4 = min(r["salsa"] for r in legs[2])
    t16 = min(r["salsa"] for r in legs[8])
    hw_lo = max(r["hw_rate"] for r in legs[2])
    hw_hi = max(r["hw_rate"] for r in legs[8])
    hw_eff = hw_hi / (4 * hw_lo)
    eff = t4 / (4 * t16)
    text = "\n".join([
        "",
        (f"SALSA ({ITERS} iterations, {N_EDGES:,} edges), "
         f"best-of-2 alternating legs: {t4} s on 2 executors vs {t16} s "
         f"on 8 — **{eff:.2f}** raw N->4N efficiency ({eff / hw_eff:.2f} "
         f"of the busy-loop hardware ceiling {hw_eff:.2f}; all legs: "
         f"2w={[r['salsa'] for r in legs[2]]} s, "
         f"8w={[r['salsa'] for r in legs[8]]} s)."),
    ]) + "\n"
    print(text)
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(text)


if __name__ == "__main__":
    main()
