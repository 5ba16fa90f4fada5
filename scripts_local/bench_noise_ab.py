"""Attribute the r1->r2 bench deltas (cc_converge +7%, triangles +11%,
minhash_lsh_dedup +10%) to noise or code: alternate the ROUND-1 code and
the CURRENT code on the same box in one session, >=3 reps each, same
bench harness and data.

The round-1 tree is materialized with `git worktree add` at the round-1
bench commit; each leg is a fresh driver process (exactly how BENCH_r*.json
is produced), alternating r1/current so slow drift hits both legs equally.

Run: python scripts_local/bench_noise_ab.py   (~15 min, box idle)
Appends the verdict to BENCH.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R1_COMMIT = os.environ.get("AB_R1_COMMIT", "e1e18b0")
R1_TREE = "/tmp/r1tree"
QUERIES = "cc_converge,triangles,minhash_lsh_dedup"
REPS = int(os.environ.get("AB_REPS", "3"))


def ensure_worktree() -> None:
    if not os.path.isdir(R1_TREE):
        subprocess.run(["git", "-C", REPO, "worktree", "add", "--detach",
                        R1_TREE, R1_COMMIT], check=True, capture_output=True)


def run_bench(tree: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_BENCH_QUERIES=QUERIES,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
               SPARK_GRAFT_CPUS="32")
    p = subprocess.run([sys.executable, os.path.join(tree, "bench.py")],
                       capture_output=True, text=True, env=env, cwd=tree,
                       timeout=1800)
    for ln in reversed(p.stdout.splitlines()):
        if ln.startswith("{"):
            return json.loads(ln)["queries"]
    raise RuntimeError(p.stderr[-2000:])


def main():
    ensure_worktree()
    legs = {"r1": [], "cur": []}
    for rep in range(REPS):
        legs["r1"].append(run_bench(R1_TREE))
        legs["cur"].append(run_bench(REPO))
        print(json.dumps({"rep": rep, "r1": legs["r1"][-1],
                          "cur": legs["cur"][-1]}), flush=True)

    lines = [
        "",
        "## Same-session A/B: round-1 code vs current (noise attribution)",
        "",
        f"Alternating legs, {REPS} reps each, fresh driver per leg (same",
        "protocol as BENCH_r*.json), sf0.1 local[32], idle box. The r1 tree",
        f"is `git worktree` at {R1_COMMIT}.",
        "",
        "| query | r1 per-rep s | current per-rep s | r1 med | cur med | spread |",
        "|---|---|---|---|---|---|",
    ]
    for q in QUERIES.split(","):
        a = [leg[q] for leg in legs["r1"]]
        b = [leg[q] for leg in legs["cur"]]
        spread = (max(a + b) - min(a + b)) / statistics.median(a + b)
        lines.append(
            f"| {q} | {' / '.join(f'{x:.1f}' for x in a)} | "
            f"{' / '.join(f'{x:.1f}' for x in b)} | "
            f"{statistics.median(a):.1f} | {statistics.median(b):.1f} | "
            f"±{spread * 50:.0f}% |")
    lines.append("")
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
