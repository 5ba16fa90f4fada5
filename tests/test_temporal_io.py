"""Temporal slice merge, eTLD+1 rotation, CC-ranks ingest, TSV sink."""

from __future__ import annotations

import gzip
import glob

from pyspark.sql import functions as F

from credigraph_spark.functions import flip_if_needed_udf, strict_etld1_match_udf
from credigraph_spark.io_utils import read_domain_ranks, write_tsv_text
from credigraph_spark.temporal import (
    crawl_slice_ts,
    latest_snapshot,
    merge_edge_slices,
    stamp_ts,
)


def test_crawl_slice_ts_reference_golden():
    """F11 (temporal_utils.py:6-24): CC-MAIN-2024-19 -> ISO week 19 Monday."""
    assert crawl_slice_ts("CC-MAIN-2024-19") == "20240506"
    assert crawl_slice_ts("CC-MAIN-2020-01") == "20191230"  # ISO year wrap


def test_merge_edge_slices_dedup(spark):
    a = stamp_ts(spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"]), "CC-MAIN-2024-19")
    b = stamp_ts(spark.createDataFrame([(1, 2), (3, 4)], ["src", "dst"]), "CC-MAIN-2024-23")
    merged = merge_edge_slices([a, b, b])  # b twice: cross-file dup within a slice
    rows = {(r["src"], r["dst"], r["ts"]) for r in merged.collect()}
    assert rows == {(1, 2, "20240506"), (2, 3, "20240506"),
                    (1, 2, "20240603"), (3, 4, "20240603")}
    assert merged.count() == 4


def test_latest_snapshot(spark):
    df = spark.createDataFrame(
        [(1, "20240506", 5), (1, "20240603", 9), (2, "20240506", 3)],
        ["vid", "ts", "in_deg"],
    )
    out = {r["vid"]: (r["ts"], r["in_deg"]) for r in latest_snapshot(df).collect()}
    assert out == {1: ("20240603", 9), 2: ("20240506", 3)}


def test_flip_if_needed(spark):
    """F6 goldens (domain_handler.py:27-73 semantics): best rotation by
    (suffix_labels, domain_len, normalized) tuple max, eTLD+1 returned;
    unresolvable input falls back to the label-joined string (reference
    behavior — full-PSL cases live in tests/test_url_functions.py)."""
    df = spark.createDataFrame(
        [("com.example",), ("example.com",), ("uk.co.bbc.news",), ("zzz.qqq",)],
        ["domain"],
    )
    flip = flip_if_needed_udf()
    out = [r["flipped"] for r in df.select(flip(F.col("domain")).alias("flipped")).collect()]
    assert out[0] == "example.com"
    assert out[1] == "example.com"
    # rotations yield 1-label-suffix candidates ('bbc.news', 'news.uk',
    # 'uk.co'); longest domain label wins the reference tuple max
    assert out[2] == "news.uk"
    assert out[3] == "zzz.qqq"  # no rotation validates -> joined labels


def test_strict_etld1_match(spark):
    """F7 (target_generation.py:17-51): rotation must EQUAL its eTLD+1 and
    be rated."""
    df = spark.createDataFrame(
        [("com.example",), ("sub.example.com",), ("example.com",), ("other.com",)],
        ["domain"],
    )
    match = strict_etld1_match_udf(rated={"example.com"})
    out = [r["m"] for r in df.select(match(F.col("domain")).alias("m")).collect()]
    assert out[0] == "example.com"   # rotation hits
    assert out[1] is None            # eTLD+1 of sub.example.com != itself
    assert out[2] == "example.com"
    assert out[3] is None            # valid eTLD+1 but not rated


def test_read_domain_ranks_and_tsv_sink(spark, tmp_path):
    """G8 golden: domain-ranks.txt layout (txt_to_csv_sqlite.py:37-80)."""
    src = tmp_path / "ranks.txt"
    src.write_text(
        "#harmonicc_pos #harmonicc_val #pr_pos #pr_val #host_rev\n"
        "1 22.49 3 0.028 com.example\n"
        "2 21.13 1 0.045 org.wikipedia\n"
    )
    df = read_domain_ranks(spark, str(src))
    rows = {r["domain"]: (r["hc_val"], r["pr_val"]) for r in df.collect()}
    assert rows == {"com.example": (22.49, 0.028), "org.wikipedia": (21.13, 0.045)}

    out_dir = str(tmp_path / "tsv")
    write_tsv_text(df.coalesce(1), out_dir)
    files = glob.glob(out_dir + "/part-*.gz")
    assert files
    lines = gzip.open(files[0], "rt").read().strip().split("\n")
    assert sorted(lines) == sorted(["com.example\t22.49\t0.028",
                                    "org.wikipedia\t21.13\t0.045"])


def test_scan_table_and_run_sql(spark, tmp_path):
    """S5/S6 + SQL entry point: format-inferred scans registered as views,
    user SQL over them (sparkcc.py:480-546 analog)."""
    import csv as _csv

    from credigraph_spark.io_utils import run_sql, scan_table, write_table

    csv_path = tmp_path / "dims.csv"
    with open(csv_path, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["k", "name"])
        w.writerows([[1, "one"], [2, "two"], [3, "three"]])
    facts = spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 7.0)], ["k", "v"])
    write_table(facts, str(tmp_path / "facts.parquet"))

    dims = scan_table(spark, str(csv_path))            # format inferred: csv
    fact = scan_table(spark, str(tmp_path / "facts.parquet"))
    out = run_sql(
        spark,
        "SELECT name, SUM(v) AS total FROM fact JOIN dims USING (k) "
        "GROUP BY name ORDER BY name",
        {"dims": dims, "fact": fact},
    ).collect()
    assert [(r["name"], r["total"]) for r in out] == [("one", 15.0), ("two", 7.0)]

    # json + explicit format + tsv inference
    write_table(facts, str(tmp_path / "facts.json"), fmt="json")
    j = scan_table(spark, str(tmp_path / "facts.json"), fmt="json")
    assert j.count() == 3


def test_snapshot_diff_statuses(spark):
    from credigraph_spark.temporal import snapshot_diff

    old = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    new = spark.createDataFrame([(2, 3), (3, 4), (4, 5), (4, 5)],
                                "src long, dst long")
    got = {(r["src"], r["dst"]): r["status"]
           for r in snapshot_diff(old, new).collect()}
    assert got == {(1, 2): "removed", (2, 3): "kept",
                   (3, 4): "kept", (4, 5): "added"}
