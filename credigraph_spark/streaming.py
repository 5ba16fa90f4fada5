"""Incremental edge ingestion via Structured Streaming.

The reference has NO streaming (SURVEY.md §2.11) — new monthly crawl slices
are merged in batch (tgrag/utils/mergers.py:27-124, union + dedupe). This
module is the Spark-native upgrade of that workflow: new repo-corpus files
landing in a directory are discovered by a parquet file stream, run through
the SAME extraction plan (pandas-UDF reference extraction + explode), and
appended to the edge table exactly once per input file — the stream
checkpoint replaces the reference's ``indices.json`` resume bookkeeping
(construction/pipeline.sh:38-89).

``trigger(availableNow=True)`` makes each invocation drain whatever is new
and stop, which is exactly the monthly-slice cadence; on a live cluster the
same query runs continuously with a processing-time trigger.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from credigraph_spark.extraction import extract_edges_named

REPOS_SCHEMA = StructType([
    StructField("repo", StringType()),
    StructField("path", StringType()),
    StructField("commit", StringType()),
    StructField("lang", StringType()),
    StructField("content", StringType()),
])


def stream_extract_edges(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    langs: list[str] | None = None,
    await_termination: bool = True,
):
    """Drain new repo parquet files from ``input_dir`` into the named-edge
    table at ``output_dir``. Per-file exactly-once via the stream
    checkpoint; re-running after a crash resumes where it stopped.

    Note: within one micro-batch, edges are deduped by the extraction plan;
    ACROSS batches the named-edge table may contain duplicates (exactly
    like the reference's per-slice files) — graph build dedupes globally
    (edges_to_ids), so semantics match the batch path.
    """
    stream = spark.readStream.schema(REPOS_SCHEMA).parquet(input_dir)
    edges = extract_edges_named(stream, langs=langs, dedup=False)
    q = (
        edges.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
