"""Bucketed edge store: pay the partitioning shuffle ONCE at write time.

At 100 TB every analytics run over a snapshot's edge table starts by
hash-partitioning ~|E| rows. When the same snapshot is queried repeatedly
(degree analytics, triangles, ad-hoc SQL, repeated algorithm runs), that
shuffle is pure waste: bucketing the table by ``src`` at write time bakes
``HashPartitioning(src, n)`` into the files, and every later
``groupBy("src")`` / src-keyed join / src-src self-join reads it
exchange-free (Catalyst sees the bucketed scan's output partitioning and
drops the Exchange — verified in tests and PLANS.md).

The iterative algorithms keep their own per-run cached repartition (their
supersteps reuse it dozens of times, so one exchange amortizes); the
store layer serves everything that reads the snapshot cold.

Tables are written as EXTERNAL bucketed parquet (explicit ``path``), so
no Hive metastore or warehouse dir is involved — the in-memory catalog
carries the bucket spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_edges(edges: DataFrame, name: str, path: str,
                         buckets: int = 32) -> None:
    """Write (src, dst) edges as a bucketed+sorted external parquet table.
    ``buckets`` should match the analytics session's
    ``spark.sql.shuffle.partitions`` so downstream aggregations align."""
    spark = edges.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        edges.select("src", "dst")
        .write.bucketBy(buckets, "src").sortBy("src", "dst")
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(name)
    )


def read_edges(spark: SparkSession, name: str) -> DataFrame:
    """Bucketed scan: output partitioning is HashPartitioning(src, n)."""
    return spark.table(name)
