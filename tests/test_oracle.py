"""Driver-contract guard: every __spark_entry__ query must match its DuckDB
oracle dtype-strictly at sf0.001 (the driver's own gate runs at sf0.01).

This promotes tests/oracle_harness.py into the pytest suite so 'pytest
tests/' fails when a query drifts from its oracle — including the HUGEINT-
vs-int64 class of mismatch the round-1 driver gate caught (see
oracle_harness._pd_rows).
"""

from __future__ import annotations

import os

import pytest

import oracle_harness  # tests dir is on sys.path via conftest rootdir

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")

# rows-only by design: anything NOT in this set must have a value-exact
# oracle. Empty since round 2 — every query is oracled (simhash runs under
# the md5-derived token hash so DuckDB can rebuild its signatures).
EXPECTED_ROWS_ONLY: set[str] = set()


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason=f"{SF_DIR} missing")
def test_all_queries_match_oracles(spark):
    results = list(oracle_harness.iter_results(spark, SF_DIR))
    assert results, "no queries ran"
    failures = [(n, d) for n, s, d in results if s == "fail"]
    assert not failures, f"oracle mismatches: {failures}"
    rows_only = {n for n, s, _ in results if s == "rows"}
    unexpected = rows_only - EXPECTED_ROWS_ONLY
    assert not unexpected, f"queries silently lost their oracle: {unexpected}"
