"""Per-query correctness vs the DuckDB oracle — the local mirror of the
driver's t2 gate (SURVEY §5.1). Every SQL-expressible registry entry is
compared exactly: row count + sorted-column schema + order-insensitive
values. Rows-only entries are smoke-checked for non-failure + rows>0."""

from __future__ import annotations

import pytest

from ucr_bigdata_snowfallproject_spark.queries import REGISTRY

from conftest import SF_SMOKE, compare_with_oracle

ORACLE_QUERIES = sorted(n for n, (_f, o) in REGISTRY.items() if o is not None)
ROWS_ONLY_QUERIES = sorted(n for n, (_f, o) in REGISTRY.items() if o is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    fn, oracle = REGISTRY[name]
    compare_with_oracle(fn(spark, SF_SMOKE), duck, oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, name):
    fn, _ = REGISTRY[name]
    df = fn(spark, SF_SMOKE)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_registry_contract():
    import __spark_entry__ as entry_mod

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25


def test_namespace_flatten_raises_on_divergent_same_name():
    """ADVICE r09 #3: the queries-package flatten must refuse a name bound
    to DIFFERENT objects in two submodules (silent last-module-wins could
    mask a helper divergence); identical objects (shared imports) pass."""
    import types

    from ucr_bigdata_snowfallproject_spark.queries._shared import (
        flatten_namespaces,
    )

    shared = object()
    a = types.ModuleType("qa")
    b = types.ModuleType("qb")
    a.F = shared
    b.F = shared  # same object in both → fine
    a._helper = lambda: 1
    merged = flatten_namespaces((a, b))
    assert merged["F"] is shared and "_helper" in merged

    b._helper = lambda: 2  # now divergent
    with pytest.raises(RuntimeError, match="collision: '_helper'.*qa.*qb"):
        flatten_namespaces((a, b))
