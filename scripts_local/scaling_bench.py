"""N -> 4N scaling-efficiency evidence (north rule: >= 0.8).

No multi-executor cluster exists in this sandbox, so per the driver
instructions the two-cluster-size criterion is evidenced by running the
IDENTICAL job (same input, same code) at local[8] and local[32] in fresh
JVMs and reporting throughput at both plus the efficiency ratio:

    eff = (edges/sec @ 4N cores) / (4 * edges/sec @ N cores)

Writes/updates BENCH.md with the table. Run:
    python scripts_local/check_entry.py   # correctness first
    python scripts_local/scaling_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str, queries: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_QUERIES=queries)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    queries = "extract_graph,pagerank_converge,cc_converge"
    results = {}
    for cpus in (8, 32):
        results[cpus] = run_bench(cpus, sf_dir, queries)
        print(f"local[{cpus}]: {json.dumps(results[cpus])}", flush=True)

    rows = []
    for qname, metric in [("pagerank_converge", "pagerank_edges_per_sec"),
                          ("cc_converge", "cc_edges_per_sec"),
                          ("extract_graph", None)]:
        t8 = results[8]["queries"][qname]
        t32 = results[32]["queries"][qname]
        if metric:
            tp8, tp32 = results[8][metric], results[32][metric]
        else:
            tp8, tp32 = 1.0 / t8, 1.0 / t32
        eff = tp32 / (4 * tp8)
        rows.append((qname, t8, t32, tp8, tp32, eff))

    lines = [
        "# BENCH — scaling efficiency evidence (N=8 -> 4N=32 local cores)",
        "",
        f"Input: `{sf_dir}` lineitem-derived edge table "
        f"({results[32].get('n_edges')} edges); identical code + input at both sizes;",
        "fresh JVM per run. Efficiency = throughput(4N) / (4 x throughput(N)).",
        "",
        "| query | T(8 cores) s | T(32 cores) s | thr@8 | thr@32 | efficiency |",
        "|---|---|---|---|---|---|",
    ]
    for q, t8, t32, tp8, tp32, eff in rows:
        lines.append(f"| {q} | {t8:.1f} | {t32:.1f} | {tp8:,.1f} | {tp32:,.1f} | {eff:.2f} |")
    lines += [
        "",
        f"PageRank iterations: {results[32].get('pagerank_iterations')} "
        f"(converged={results[32].get('pagerank_converged')}); "
        f"CC iterations: {results[32].get('cc_iterations')}.",
        "",
        "Throughput unit: edges x supersteps / second for the iterative",
        "algorithms (jobs/sec for extraction).",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
