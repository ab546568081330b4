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


def test_compaction_guard_scale_premise():
    """ADVICE r7: once measured input bytes reach target-size ×
    ingest-file-count (~2 GiB at the 64 × 32 MiB defaults), the computed
    target meets or exceeds the ingest file count and a lossless rewrite
    must NOT be flagged; below that, failing to shrink the file count
    still must be."""
    from project_map_reduce_spark.plans.warehouse import _compact_regressed

    # fragmented premise holds: must shrink and hit the target exactly
    assert not _compact_regressed(n_in=64, n_out=4, target=4)
    assert _compact_regressed(n_in=64, n_out=5, target=4)  # missed target
    assert _compact_regressed(n_in=64, n_out=64, target=4)  # no shrink
    # premise broken (big input): target == / > ingest count is legal
    assert not _compact_regressed(n_in=64, n_out=64, target=64)
    assert not _compact_regressed(n_in=64, n_out=80, target=80)
    assert _compact_regressed(n_in=64, n_out=79, target=80)  # still exact


def test_schema_evolution_nulls_are_real(spark, sf_dir):
    """Pre-evolution rows must read as NULL user_id, post-evolution rows
    must keep theirs: per type, 0 < n_with_user < n_events (both epochs
    present in every type at fixture scale)."""
    rows = entries()["q_schema_evolution"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_with_user"] < r["n_events"], tuple(r)
