"""Superstep checkpoint store: resumable iterative state + metrics + lineage.

North-rule requirement: every superstep checkpoints the vertex-state
DataFrame with per-partition lineage and iteration metrics so any run is
resumable mid-algorithm. This replaces the reference's ad-hoc resume
machinery (``--intermediate_output`` re-read, wat_extract_links.py:339-356,
and ``indices.json`` in construction/pipeline.sh:38-89).

Two backends behind one interface: an Iceberg table per state name
(``writeTo(...).using("iceberg")``, used automatically when the session
has an Iceberg catalog configured AND a ``catalog`` name is passed), and
a directory of parquet tables (one per iteration, committed by Spark's
``_SUCCESS`` marker) as the fallback — the sandbox has no Iceberg runtime
jar, so parquet-dir is what tests exercise (SURVEY.md §7 hard-part 2).

Checkpointing ALSO truncates lineage: iterative DataFrame plans grow per
superstep and re-reading the materialized parquet resets the logical plan
(the engine's analog of ``sc.checkpoint``, but resumable across processes).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


def _iceberg_available(spark) -> bool:
    """True when an Iceberg catalog is configured in this session (the
    sandbox ships no Iceberg runtime jar, so this is normally False; on a
    real cluster set ``spark.sql.catalog.<name>`` and the store switches to
    ``writeTo(...).using("iceberg")`` transparently)."""
    try:
        jconf = spark.sparkContext.getConf()
        return any(
            k.startswith("spark.sql.catalog.") and "iceberg" in (v or "").lower()
            for k, v in jconf.getAll()
        )
    except Exception:
        return False


class CheckpointStore:
    def __init__(self, root: str, run_id: str, catalog: str | None = None):
        """``catalog``: optional Iceberg catalog name; when set AND the
        session has an Iceberg catalog configured, state goes to
        ``<catalog>.<run_id>_<name>`` Iceberg tables (snapshot per
        iteration); otherwise the parquet-dir backend is used."""
        self.root = root
        self.run_id = run_id
        self.catalog = catalog
        self.run_dir = os.path.join(root, run_id)
        os.makedirs(self.run_dir, exist_ok=True)

    # -- state ------------------------------------------------------------
    def _iter_dir(self, name: str, iteration: int) -> str:
        return os.path.join(self.run_dir, name, f"iter={iteration:05d}")

    def _iceberg_table(self, name: str) -> str:
        return f"{self.catalog}.{self.run_id}_{name}"

    def write_state(self, df: DataFrame, iteration: int, name: str = "state") -> DataFrame:
        """Materialize one superstep's state; returns the re-read DataFrame
        (fresh lineage). Backend: Iceberg table (ACID snapshot commit) when
        a catalog is configured, else parquet dir (_SUCCESS marker commit)."""
        spark = df.sparkSession
        if self.catalog is not None and _iceberg_available(spark):
            tbl = self._iceberg_table(name)
            (df.withColumn("_iteration", F.lit(iteration))
               .writeTo(tbl).using("iceberg").createOrReplace())
            out = spark.read.table(tbl).where(F.col("_iteration") == iteration) \
                       .drop("_iteration")
        else:
            path = self._iter_dir(name, iteration)
            df.write.mode("overwrite").parquet(path)
            out = spark.read.parquet(path)
        self.record_lineage(out, iteration, name=name)
        return out

    def read_state(self, spark: SparkSession, iteration: int, name: str = "state") -> DataFrame:
        return spark.read.parquet(self._iter_dir(name, iteration))

    def committed_iterations(self, name: str = "state") -> list[int]:
        base = os.path.join(self.run_dir, name)
        if not os.path.isdir(base):
            return []
        out = []
        for d in os.listdir(base):
            if d.startswith("iter=") and os.path.exists(os.path.join(base, d, "_SUCCESS")):
                out.append(int(d.split("=")[1]))
        return sorted(out)

    def latest_iteration(self, name: str = "state") -> int | None:
        its = self.committed_iterations(name)
        return its[-1] if its else None

    # -- convergence marker -------------------------------------------------
    # Resuming a run whose checkpointed state already converged must NOT
    # burn an extra superstep (the re-run would drift the result by < tol
    # and waste a full pass): algorithms mark convergence here and
    # short-circuit resume when the marker exists.
    def _converged_path(self, name: str) -> str:
        return os.path.join(self.run_dir, f"{name}.converged.json")

    def mark_converged(self, iteration: int, name: str = "state") -> None:
        with open(self._converged_path(name), "w") as f:
            json.dump({"iteration": iteration, "wall_ts": time.time()}, f)

    def converged_iteration(self, name: str = "state") -> int | None:
        p = self._converged_path(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)["iteration"]

    # -- metrics / lineage --------------------------------------------------
    def append_metrics(self, iteration: int, metrics: dict) -> None:
        rec = {"run_id": self.run_id, "iteration": iteration,
               "wall_ts": time.time(), **metrics}
        with open(os.path.join(self.run_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")

    def read_metrics(self) -> list[dict]:
        p = os.path.join(self.run_dir, "metrics.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]

    def record_lineage(self, df: DataFrame, iteration: int, name: str = "state") -> None:
        """Per-partition row counts for the committed state (cheap: one
        narrow agg over data that was just written)."""
        parts = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows"))
            .collect()
        )
        rec = {
            "run_id": self.run_id, "name": name, "iteration": iteration,
            "partitions": {str(r["partition_id"]): r["rows"] for r in parts},
        }
        with open(os.path.join(self.run_dir, "lineage.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
