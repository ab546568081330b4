"""Q124 q_cluster_prune — range-clustered layout + row-group skipping
(VERDICT-era scan-optimization family, Q118's sibling)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from project_map_reduce_spark.plans.scans import (
    _CLUSTER_HI,
    _CLUSTER_LO,
    _CLUSTER_MAX_OVERLAP,
)
from project_map_reduce_spark.registry import entries
from project_map_reduce_spark.tables import load


def _overlap_fraction(lay_dir: str) -> float:
    import datetime

    import pyarrow.parquet as pq

    lo = datetime.datetime.fromisoformat(_CLUSTER_LO)
    hi = datetime.datetime.fromisoformat(_CLUSTER_HI)
    total = overlap = 0
    for f in glob.glob(f"{lay_dir}/part-*.parquet"):
        meta = pq.ParquetFile(f).metadata
        ts_idx = meta.schema.names.index("ts")
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(ts_idx).statistics
            total += 1
            if st is None or (st.min < hi and st.max >= lo):
                overlap += 1
    assert total > 0
    return overlap / total


def test_query_runs_and_aggregates(spark, sf_dir):
    df = entries()["q_cluster_prune"].fn(spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 5
    assert {r["event_type"] for r in rows} <= {
        "click", "view", "purchase", "signup", "error"
    }


def test_unclustered_layout_fails_the_footer_audit(spark, sf_dir, tmp_path):
    """The counterfactual that makes the audit meaningful: the SAME
    data written WITHOUT range clustering (hash repartition — every
    file a random time mix) must overlap the window in ~every row
    group, far above the query's ceiling; the clustered write stays
    under it. If both layouts passed, the audit would prove nothing."""
    ev = load(spark, sf_dir, "events").select("event_type", "ts", "value")

    messy = str(tmp_path / "messy")
    ev.repartition(10, "event_type").write.parquet(messy)
    assert _overlap_fraction(messy) > 0.9

    tidy = str(tmp_path / "tidy")
    ev.repartitionByRange(10, "ts").sortWithinPartitions("ts").write.parquet(
        tidy
    )
    assert _overlap_fraction(tidy) <= _CLUSTER_MAX_OVERLAP


def test_pushdown_guard_trips_on_unpushable_predicate(spark, sf_dir, tmp_path):
    """The guard's trigger condition is real: wrap the ts bound in a
    function (date_trunc) — a form the parquet source cannot accept —
    and the same check must raise; the pushable form passes."""
    from project_map_reduce_spark.plans.scans import _assert_ts_bounds_pushed

    ev = load(spark, sf_dir, "events").select("event_type", "ts", "value")
    tidy = str(tmp_path / "tidy")
    ev.repartitionByRange(10, "ts").sortWithinPartitions("ts").write.parquet(
        tidy
    )
    lo = F.lit(_CLUSTER_LO).cast("timestamp_ntz")
    good = spark.read.parquet(tidy).filter(F.col("ts") >= lo)
    _assert_ts_bounds_pushed(good)  # must not raise
    bad = spark.read.parquet(tidy).filter(F.date_trunc("minute", "ts") >= lo)
    with pytest.raises(RuntimeError, match="filter-pushdown regression"):
        _assert_ts_bounds_pushed(bad)
