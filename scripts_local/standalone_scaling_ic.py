"""Independent-Cascade influence on the standalone N -> 4N harness.

Same topology as standalone_scaling.py. The X236 round is one
(sim, src) co-partitioned frontier join over the coin-filtered
|E| x n_sims frame per hop — a heavier-keyed variant of the BFS family,
so it gets its own datapoint.

Run: python scripts_local/standalone_scaling_ic.py  (~10 min, box idle)
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

N_EDGES = 20_000_000
ROUNDS = 2

LEG = r'''
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from credigraph_spark.session import get_spark
from credigraph_spark.graph.spreading import ic_influence

n_exec = int(os.environ["LEG_EXECUTORS"])
cores = n_exec * {cores}
spark = get_spark(f"icscale-{{n_exec}}x{cores}", master={master!r},
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

seeds = e.selectExpr("src as vid").union(e.selectExpr("dst as vid")) \
    .distinct().where("vid % 1000 = 0")
ic_influence(e, seeds, n_sims=2, p=0.3, rounds=1).count()  # warmup

t0 = time.time()
rows = ic_influence(e, seeds, n_sims=4, p=0.3,
                    rounds={rounds}).collect()
out["densest"] = round(time.time() - t0, 2)
out["rows"] = sorted((r["sim"], r["n_alive"], r["n_reached"])
                     for r in rows)

print("RESULT " + json.dumps(out))
spark.stop()
'''


def run_leg(n_workers: int) -> dict:
    start_workers(n_workers)
    try:
        job = LEG.format(repo=REPO, master=MASTER, cores=WORKER_CORES,
                         n_edges=N_EDGES, rounds=ROUNDS)
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
    """Alternating repeated legs (2, 8, 2, 8 workers), best-of per size —
    the VM's busy-loop rate varies between legs (host steal), so min
    wall / max hw_rate per size is the least-contended sample."""
    os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
    legs: dict[int, list[dict]] = {2: [], 8: []}
    start_master()
    try:
        for n in (2, 8, 2, 8):
            legs[n].append(run_leg(n))
    finally:
        stop_master()
    t4 = min(r["densest"] for r in legs[2])
    t16 = min(r["densest"] for r in legs[8])
    # identical outputs across every leg, or the comparison is void
    outs = {json.dumps(r["rows"]) for rs in legs.values() for r in rs}
    assert len(outs) == 1, outs
    hw_lo = max(r["hw_rate"] for r in legs[2])
    hw_hi = max(r["hw_rate"] for r in legs[8])
    hw_eff = hw_hi / (4 * hw_lo)
    eff = t4 / (4 * t16)
    text = "\n".join([
        "",
        (f"IC influence (4 sims, {ROUNDS} hops, {N_EDGES:,} edges), "
         f"best-of-2 alternating legs: {t4} s on 2 executors vs {t16} s "
         f"on 8 — **{eff:.2f}** raw N->4N efficiency ({eff / hw_eff:.2f} "
         f"of the busy-loop hardware ceiling {hw_eff:.2f}; identical "
         f"per-sim (alive, reached) across all legs; all legs: "
         f"2w={[r['densest'] for r in legs[2]]} s, "
         f"8w={[r['densest'] for r in legs[8]]} s)."),
    ]) + "\n"
    print(text)
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(text)


if __name__ == "__main__":
    main()
