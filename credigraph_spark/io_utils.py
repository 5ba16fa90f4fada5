"""IO helpers: CC-ranks ingest (G8) and gzip text sinks (S8).

* ``read_domain_ranks`` — parse the CommonCrawl-published
  ``domain-ranks.txt`` layout: whitespace-separated columns where
  harmonic-centrality value is col 2, PageRank value is col 4 and the
  (reversed) domain is col 5 (txt_to_csv_sqlite.py:37-80). Pure-SQL
  split — the reference's line-by-line Python parser becomes one
  projection over ``spark.read.text`` (which reads ``.gz`` natively, S10).
* ``write_tsv_text`` — ``concat_ws('\t', ...)`` -> ``write.text`` with
  gzip codec (hostlinks_to_graph.py:148-152,192-197).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_domain_ranks(spark: SparkSession, path: str, skip_header: bool = True) -> DataFrame:
    """-> (domain string, hc_val double, pr_val double)."""
    lines = spark.read.text(path)
    if skip_header:
        lines = lines.where(~F.col("value").startswith("#"))
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return (
        lines.where(F.size(parts) >= 5)
        .select(
            parts.getItem(4).alias("domain"),
            parts.getItem(1).cast("double").alias("hc_val"),
            parts.getItem(3).cast("double").alias("pr_val"),
        )
    )


def write_tsv_text(df: DataFrame, path: str, compression: str | None = "gzip",
                   sort_within_partitions: bool = True) -> None:
    """S8/O1: render all columns as one TSV line per row, sort within
    partitions for run-length-friendly compression (wat_extract_links.py:359),
    write as (gzip) text."""
    cols = df.columns
    if sort_within_partitions:
        df = df.sortWithinPartitions(*cols)
    out = df.select(F.concat_ws("\t", *[F.col(c).cast("string") for c in cols]).alias("value"))
    writer = out.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.text(path)
