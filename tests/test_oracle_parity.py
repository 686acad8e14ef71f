"""Every registered query vs its DuckDB oracle at sf0.001 — the local
twin of the driver's CORRECTNESS gate. Queries without an oracle get a
rows-comparable sanity check (>= 0 rows, stable schema)."""

from __future__ import annotations

import pytest

from etl_spark.queries import load_all
from tests.oracle_harness import compare

SF_DIR = "/root/testdata/sf0.001"

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    if spec.oracle is None:
        assert df.count() >= 0
        assert len(df.columns) > 0
        return
    problems = compare(df, SF_DIR, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)
