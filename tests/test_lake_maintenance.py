"""Q125/Q126 — lake-maintenance surface (compaction, schema evolution).
The queries carry their own driver-checked raises (file-count,
row-count, evolved-column presence), exercised on every parity/pytest
run; these tests pin the output semantics the raises can't see."""

from __future__ import annotations

from project_map_reduce_spark.registry import entries


def test_compaction_aggregate_shape(spark, sf_dir):
    rows = entries()["q_compact_small_files"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 5
    assert all(r["n_events"] > 0 for r in rows)


def test_schema_evolution_nulls_are_real(spark, sf_dir):
    """Pre-evolution rows must read as NULL user_id, post-evolution rows
    must keep theirs: per type, 0 < n_with_user < n_events (both epochs
    present in every type at fixture scale)."""
    rows = entries()["q_schema_evolution"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_with_user"] < r["n_events"], tuple(r)
