"""Oracle-parity test for every registered query (the primary gate,
SURVEY.md §5.1). Runs each queries()[name] against its oracle_sql()[name]
via DuckDB at the fixture scale in RHDS_TEST_SF_DIR (default sf0.001)."""

from __future__ import annotations

import pytest

from reconciliation_hive_data_spark import registry

from .parity import compare

registry.load_all_modules()
_WITH_ORACLE = sorted(n for n, s in registry.REGISTRY.items() if s.oracle)
_ROWS_ONLY = sorted(n for n, s in registry.REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    spec = registry.get(name)
    problems = compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir, name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    spec = registry.get(name)
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
