"""End-to-end `spark-submit --py-files` packaging test.

The north-rule deployment path is `spark-submit --py-files cg.zip` on a
multi-executor cluster (reference analog: the sparkcc jobs submitted in
/root/reference/construction; packaging per its README). This test
proves the package actually resolves FROM THE ZIP: the subprocess runs
with a scratch cwd and a PYTHONPATH scrubbed of the repo, so any import
that leaks past --py-files fails loudly.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _build_zip(path: str) -> str:
    pkg = os.path.join(REPO, "credigraph_spark")
    zpath = os.path.join(path, "cg.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith((".py", ".txt", ".dat")):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_pagerank(spark, tmp_path):
    edges = str(tmp_path / "edges.parquet")
    spark.createDataFrame(
        [(a, b) for a in range(1, 8) for b in range(1, 8) if a != b and (a + b) % 3],
        ["src", "dst"]).write.parquet(edges)

    zpath = _build_zip(str(tmp_path))
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "SPARK_HOME")}
    out_dir = str(tmp_path / "ranks")
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--py-files", zpath,
         os.path.join(REPO, "credigraph_spark", "cli.py"),
         "pagerank", "--edges", edges, "--output", out_dir,
         "--max-iter", "5", "--master", "local[4]",
         "--shuffle-partitions", "4"],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    info = json.loads([ln for ln in proc.stdout.splitlines()
                       if ln.startswith("{")][-1])
    assert info["cmd"] == "pagerank" and info["iterations"] == 5
    assert info["n_vertices"] == 7

    ranks = spark.read.parquet(out_dir)
    assert ranks.count() == 7
    total = sum(r["rank"] for r in ranks.collect())
    assert abs(total - 1.0) < 1e-6
