"""Driver-contract smoke: entry() + queries()/oracle_sql() key alignment."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"vid", "rank"} <= set(df.columns)


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every query is callable
    assert all(callable(v) for v in qs.values())


def test_one_query_runs_at_smoke_scale(spark):
    out = entrymod.queries()["degree_counts"](spark, "/root/testdata/sf0.001")
    assert out.count() > 0
