"""N -> 4N scaling on a REAL standalone cluster (separate executor JVMs).

The local[N] trend (scale_trend.py) shares one JVM, so broadcast is
driver-serialized and shuffle is in-process — both unfavorable to the
engine and unrepresentative of a cluster. This script starts a Spark
standalone master on localhost and measures the SAME jobs at

    N  = 2 workers x 2 cores  (2 executors,  4 cores)
    4N = 8 workers x 2 cores  (8 executors, 16 cores)

so executors are separate JVMs, broadcast is torrent-distributed, and
shuffle crosses process boundaries — the closest available shape to the
north rule's "N and 4N executors" on one box. The hardware ceiling still
applies (same shared memory bus), so the busy-loop control is measured
per-leg exactly as in scale_trend.py.

Run: python scripts_local/standalone_scaling.py   (~25 min, box idle)
Appends the measured table to BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = "/opt/spark"
MASTER = "spark://127.0.0.1:7077"
LOG_DIR = "/tmp/spark-logs"
WORKER_CORES = 2
WORKER_MEM = "10g"

PR_SIZES = (20_000_000, 100_000_000)
CC_SIZES = (20_000_000,)
PR_ITERS = 15
CC_ITERS = 4

ENV = dict(
    os.environ,
    SPARK_HOME=SPARK_HOME,
    SPARK_LOG_DIR=LOG_DIR,
    SPARK_MASTER_HOST="127.0.0.1",
    SPARK_LOCAL_DIRS="/dev/shm/spark-tmp",
    SPARK_WORKER_DIR="/tmp/spark-work",
)


def sh(cmd: list[str]) -> None:
    subprocess.run(cmd, env=ENV, check=True, capture_output=True, text=True)


def start_master() -> None:
    sh([f"{SPARK_HOME}/sbin/start-master.sh", "-h", "127.0.0.1", "-p", "7077",
        "--webui-port", "8089"])
    time.sleep(4)


def start_workers(n: int) -> None:
    for i in range(1, n + 1):
        sh([f"{SPARK_HOME}/sbin/spark-daemon.sh", "start",
            "org.apache.spark.deploy.worker.Worker", str(i), MASTER,
            "-c", str(WORKER_CORES), "-m", WORKER_MEM,
            "--webui-port", str(8100 + i)])
    time.sleep(5)


def stop_workers(n: int) -> None:
    for i in range(1, n + 1):
        subprocess.run([f"{SPARK_HOME}/sbin/spark-daemon.sh", "stop",
                        "org.apache.spark.deploy.worker.Worker", str(i)],
                       env=ENV, capture_output=True)
    time.sleep(2)


def stop_master() -> None:
    subprocess.run([f"{SPARK_HOME}/sbin/stop-master.sh"], env=ENV,
                   capture_output=True)


LEG = r'''
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from credigraph_spark.session import get_spark
from credigraph_spark.graph import pagerank, connected_components

n_exec = int(os.environ["LEG_EXECUTORS"])
cores = n_exec * {cores}
spark = get_spark(f"standalone-{{n_exec}}x{cores}", master={master!r},
                  shuffle_partitions=128,
                  extra={{"spark.sql.autoBroadcastJoinThreshold": "-1",
                          "spark.executor.cores": "{cores}",
                          "spark.executor.memory": "8g",
                          "spark.cores.max": str(cores)}})

def _burn(_):
    t = time.time(); x = 0
    while time.time() - t < 1.5: x += 1
    return x

# busy-loop control ON THE EXECUTORS (not driver multiprocessing): measures
# what the box allows for this executor topology at this moment.
def hw_control(c):
    sc = spark.sparkContext
    t0 = time.time()
    tot = sc.parallelize(range(c), c).map(_burn).sum()
    return tot / (time.time() - t0)

out = {{"executors": n_exec, "cores": cores,
        "hw_rate": hw_control(cores), "pr": {{}}, "cc": {{}}}}

def make_edges(n_edges):
    v = max(n_edges // 20, 1000)
    base = spark.range(0, n_edges, 1, 128)
    e = base.select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(v)).alias("src"),
        F.when(F.col("id") % 100 == 0, F.lit(0))
         .otherwise(F.pmod(F.xxhash64(F.col("id") + 7), F.lit(v))).alias("dst"))
    e = e.persist(); e.count()
    return e

warmed = False
for n in {pr_sizes}:
    e = make_edges(n)
    if not warmed:
        # UNMEASURED warmup: fresh executor JVMs run the first iterative job
        # ~4-5x slower (JIT, codegen cache, broadcast machinery, heap growth
        # — measured 223.6 s cold vs 47.0 s warm for the same 15-superstep
        # job on 8 executors); warm every leg before measuring, as a real
        # long-running cluster would be.
        pagerank(e, max_iter=4, tol=0.0, mode="broadcast")[0].count()
        connected_components(e, max_iter=2)[0].count()
        warmed = True
    t0 = time.time()
    ranks, info = pagerank(e, max_iter={pr_iters}, tol=0.0, mode="broadcast")
    ranks.count()
    out["pr"][str(n)] = round(time.time() - t0, 2)
    if str(n) in [str(x) for x in {cc_sizes}]:
        t0 = time.time()
        labels, cinfo = connected_components(e, max_iter={cc_iters})
        labels.count()
        out["cc"][str(n)] = round(time.time() - t0, 2)
    e.unpersist()
    print(json.dumps({{"progress": n, "executors": n_exec}}), flush=True)

print("RESULT " + json.dumps(out))
spark.stop()
'''


def run_leg(n_workers: int) -> dict:
    start_workers(n_workers)
    try:
        job = LEG.format(repo=REPO, master=MASTER, cores=WORKER_CORES,
                         pr_sizes=list(PR_SIZES), pr_iters=PR_ITERS,
                         cc_sizes=list(CC_SIZES), cc_iters=CC_ITERS)
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
    for n in PR_SIZES:
        t4, t16 = lo["pr"][str(n)], hi["pr"][str(n)]
        eff = t4 / (4 * t16)
        rows.append((f"pagerank broadcast, {PR_ITERS} supersteps", n, t4, t16,
                     eff, eff / hw_eff))
    for n in CC_SIZES:
        t4, t16 = lo["cc"][str(n)], hi["cc"][str(n)]
        eff = t4 / (4 * t16)
        rows.append((f"connected components, {CC_ITERS} supersteps", n, t4, t16,
                     eff, eff / hw_eff))

    lines = [
        "",
        "## Standalone cluster N -> 4N (separate executor JVMs, torrent broadcast)",
        "",
        "Same jobs as the local[N] trend, but on a real standalone master",
        "with 2 workers x 2 cores (N) vs 8 workers x 2 cores (4N): executors",
        "are separate JVMs, broadcast is torrent-distributed executor-to-",
        "executor, shuffle crosses processes. The busy-loop control runs ON",
        f"the executors of each leg (hw 2exec->8exec eff = {hw_eff:.2f}: the",
        "shared-memory ceiling of this box for that topology).",
        "",
        "| job | edges | T(2 exec) s | T(8 exec) s | efficiency | eff/hw |",
        "|---|---|---|---|---|---|",
    ]
    for name, n, t4, t16, eff, rel in rows:
        lines.append(f"| {name} | {n:,} | {t4:.1f} | {t16:.1f} | "
                     f"**{eff:.2f}** | {min(rel, 1.0):.2f} |")
    lines.append("")
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
