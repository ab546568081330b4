"""Every registered query with an oracle must hash-match DuckDB at
sf0.001 (the driver runs the same comparison at sf0.01). Oracle-less
queries must at least run and return a stable schema."""

from __future__ import annotations

import pytest

from project_map_reduce_spark.registry import entries
from tools.parity import compare


def _all_entries():
    return sorted(entries().items())


@pytest.mark.parametrize(
    "name", [n for n, e in _all_entries()], ids=[n for n, _ in _all_entries()]
)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    e = entries()[name]
    sdf = e.fn(spark, sf_dir)
    if e.oracle is None:
        rows = sdf.count()
        assert rows >= 0
        assert sdf.columns  # stable, non-empty schema
        return
    problems = compare(name, sdf, duck.sql(e.oracle))
    assert not problems, f"{name}: " + "; ".join(problems)
