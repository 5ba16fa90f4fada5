"""HyperBall harmonic centrality on the standalone N -> 4N harness.

Same topology and methodology as standalone_scaling_spread.py
(alternating repeated legs, best-of per size, busy-loop hw control).
HyperBall's superstep is ONE bit_or aggregation over (edges ⋈ state) —
map-side combinable and hub-skew immune (OR is idempotent), the same
shape as the WL color-refinement round (one groupBy of neighbour
messages), so this row evidences both X179 and X180.

Run: python scripts_local/standalone_scaling_hyperball.py  (~12 min, box idle)
Appends the measured table to BENCH.md.
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

N_EDGES = int(os.environ.get("HB_EDGES", 20_000_000))
HOPS = int(os.environ.get("HB_HOPS", 3))

LEG = r'''
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from credigraph_spark.session import get_spark
from credigraph_spark.graph.anf import hyperball_harmonic

n_exec = int(os.environ["LEG_EXECUTORS"])
cores = n_exec * {cores}
spark = get_spark(f"hbscale-{{n_exec}}x{cores}", master={master!r},
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

hyperball_harmonic(e, max_hops=1, num_registers=4).count()  # warmup

t0 = time.time()
hyperball_harmonic(e, max_hops={hops}, num_registers=4).count()
out["hyperball"] = round(time.time() - t0, 2)

print("RESULT " + json.dumps(out))
spark.stop()
'''


def run_leg(n_workers: int) -> dict:
    start_workers(n_workers)
    try:
        job = LEG.format(repo=REPO, master=MASTER, cores=WORKER_CORES,
                         n_edges=N_EDGES, hops=HOPS)
        env = dict(ENV, LEG_EXECUTORS=str(n_workers))
        p = subprocess.run([sys.executable, "-c", job], capture_output=True,
                           text=True, env=env, timeout=5400)
        lines = [ln for ln in p.stdout.splitlines()
                 if ln.startswith("RESULT ")]
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
    t4 = min(r["hyperball"] for r in legs[2])
    t16 = min(r["hyperball"] for r in legs[8])
    hw_lo = max(r["hw_rate"] for r in legs[2])
    hw_hi = max(r["hw_rate"] for r in legs[8])
    hw_eff = hw_hi / (4 * hw_lo)
    eff = t4 / (4 * t16)
    text = "\n".join([
        "",
        (f"HyperBall harmonic ({HOPS} bit_or supersteps, 4 registers, "
         f"{N_EDGES:,} edges), best-of-2 alternating legs: {t4} s on 2 "
         f"executors vs {t16} s on 8 — **{eff:.2f}** raw N->4N efficiency "
         f"({eff / hw_eff:.2f} of the busy-loop hardware ceiling "
         f"{hw_eff:.2f}; all legs: 2w={[r['hyperball'] for r in legs[2]]} s, "
         f"8w={[r['hyperball'] for r in legs[8]]} s). The one-groupBy "
         f"message superstep is shared by WL color refinement (X180)."),
    ]) + "\n"
    print(text)
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(text)


if __name__ == "__main__":
    main()
