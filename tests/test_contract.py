"""Driver-contract sanity: every query has an oracle, entry() returns rows."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_keys_match():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs), "oracle without query"
    missing = set(qs) - set(oracles)
    assert not missing, f"queries without oracle (rows-only fallback): {missing}"


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"part_name", "supplier_name", "interaction_count"}
