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


_EXT_FORMATS = {
    "parquet": "parquet", "csv": "csv", "tsv": "csv", "json": "json",
    "jsonl": "json", "txt": "text", "text": "text", "orc": "orc",
    "gz": None,  # look one extension deeper (x.csv.gz)
}


def scan_table(spark: SparkSession, path: str, fmt: str | None = None,
               **options) -> DataFrame:
    """S5/S6 (sparkcc.py:617-628 ``load_dataframe`` analog): read any
    supported format into a DataFrame. ``fmt`` explicit, or inferred from
    the file extension (gz-aware: ``x.csv.gz`` -> csv). CSV defaults to
    header+schema inference (override via options); TSV sets ``sep='\\t'``.
    Compression is handled natively by every Spark source."""
    ext = None
    if fmt is None:
        parts = path.rstrip("/").rsplit("/", 1)[-1].split(".")
        exts = [e.lower() for e in parts[1:]]
        for e in reversed(exts):
            mapped = _EXT_FORMATS.get(e)
            if mapped:
                ext, fmt = e, mapped
                break
        if fmt is None:
            fmt = "parquet"
    reader = spark.read
    if fmt == "csv":
        opts = {"header": "true", "inferSchema": "true"}
        if ext == "tsv":
            opts["sep"] = "\t"
        opts.update({k: str(v) for k, v in options.items()})
        reader = reader.options(**opts)
    elif options:
        reader = reader.options(**{k: str(v) for k, v in options.items()})
    return reader.format(fmt).load(path)


def write_table(df: DataFrame, path: str, fmt: str = "parquet",
                mode: str = "overwrite", **options) -> None:
    """Generic-format sink (counterpart of scan_table)."""
    writer = df.write.mode(mode)
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    if options:
        writer = writer.options(**{k: str(v) for k, v in options.items()})
    writer.format(fmt).save(path)


def run_sql(spark: SparkSession, query: str, views: dict[str, DataFrame]) -> DataFrame:
    """User-supplied SQL over registered views (sparkcc.py:480-546: the
    reference registers the input table and executes arbitrary SQL; here
    any number of DataFrames become temp views scoped to this session)."""
    for name, vdf in views.items():
        vdf.createOrReplaceTempView(name)
    return spark.sql(query)
