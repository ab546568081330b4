"""Q127 q_zorder_prune — Morton multi-column clustering (Q124's sibling;
VERDICT r7 item 4). The query carries its own driver-checked raises
(two-column pushdown, worst-dimension + conjunctive footer ceilings);
these tests pin the bit math and the counterfactual that makes the
audit meaningful."""

from __future__ import annotations

import datetime
import glob

from pyspark.sql import functions as F

from project_map_reduce_spark.operators.zorder import (
    RANK_MAX,
    column_bounds,
    py_z_value,
    rank16,
    z_value,
    zorder_write,
)
from project_map_reduce_spark.plans.scans import (
    _CLUSTER_HI,
    _CLUSTER_LO,
    _Z_MAX_DIM_OVERLAP,
)
from project_map_reduce_spark.registry import entries
from project_map_reduce_spark.tables import load


def test_spark_interleave_matches_python_reference(spark):
    """The JVM shift/mask chain must equal the textbook per-bit
    interleave, bit for bit, across the rank space (corners + a
    deterministic lattice)."""
    samples = [(0, 0), (RANK_MAX, RANK_MAX), (RANK_MAX, 0), (0, RANK_MAX)]
    samples += [
        (a * 4099 % (RANK_MAX + 1), b * 8191 % (RANK_MAX + 1))
        for a in range(17)
        for b in range(17)
    ]
    df = spark.createDataFrame(samples, "a long, b long")
    got = df.select("a", "b", z_value(F.col("a"), F.col("b")).alias("z")).collect()
    for r in got:
        assert r.z == py_z_value(r.a, r.b), (r.a, r.b, r.z)


def test_deinterleave_roundtrip_law():
    """z's even bits are a, odd bits are b — the property that makes a
    z-range a 2D cell."""
    for a, b in [(1, 0), (0, 1), (12345, 54321), (RANK_MAX, 1)]:
        z = py_z_value(a, b)
        back_a = sum(((z >> (2 * i)) & 1) << i for i in range(16))
        back_b = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (back_a, back_b) == (a, b)


def test_rank16_clamps_and_spans(spark):
    df = spark.createDataFrame([(-5,), (0,), (50,), (100,), (999,)], "x long")
    got = [r.r for r in df.select(rank16(F.col("x"), 0, 100).alias("r")).collect()]
    assert got[0] == 0  # below lo clamps
    assert got[1] == 0
    assert got[2] == (50 * RANK_MAX) // 100
    assert got[3] == RANK_MAX
    assert got[4] == RANK_MAX  # above hi clamps


def _dim_overlaps(lay_dir: str, u_lo: int, u_hi: int) -> tuple[float, float]:
    import pyarrow.parquet as pq

    ts_lo = datetime.datetime.fromisoformat(_CLUSTER_LO)
    ts_hi = datetime.datetime.fromisoformat(_CLUSTER_HI)
    total = o_ts = o_u = 0
    for f in glob.glob(f"{lay_dir}/part-*.parquet"):
        meta = pq.ParquetFile(f).metadata
        i_ts = meta.schema.names.index("ts")
        i_u = meta.schema.names.index("user_id")
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(i_ts).statistics
            su = meta.row_group(g).column(i_u).statistics
            total += 1
            o_ts += st is None or (st.min < ts_hi and st.max >= ts_lo)
            o_u += su is None or (su.min <= u_hi and su.max >= u_lo)
    assert total > 0
    return o_ts / total, o_u / total


def test_query_runs_and_aggregates(spark, sf_dir):
    rows = entries()["q_zorder_prune"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 5
    assert all(r["n_events"] > 0 for r in rows)


def test_linear_layout_fails_the_worst_dimension_audit(spark, sf_dir, tmp_path):
    """The counterfactual: the SAME data range-clustered on ts alone
    has tight ts stats but its user_id stats span the whole domain in
    ~every row group — the worst-dimension criterion fails at ~100%.
    The z-ordered write bounds BOTH dimensions under the query's
    ceiling. If both layouts passed, the audit would prove nothing."""
    ev = load(spark, sf_dir, "events").select("event_type", "ts", "user_id", "value")
    bounds = column_bounds(ev, ["ts", "user_id"])
    ulo_d, uhi_d = bounds["user_id"]
    u_lo = ulo_d + (3 * (uhi_d - ulo_d)) // 10
    u_hi = ulo_d + (uhi_d - ulo_d) // 2

    linear = str(tmp_path / "linear")
    ev.repartitionByRange(16, "ts").sortWithinPartitions("ts").write.parquet(linear)
    lin_ts, lin_u = _dim_overlaps(linear, u_lo, u_hi)
    assert lin_ts <= _Z_MAX_DIM_OVERLAP  # linear IS tight on its own column
    assert lin_u > 0.9  # ...and unskippable on the other

    z = str(tmp_path / "z")
    zorder_write(ev, z, "ts", "user_id", bounds, 16)
    z_ts, z_u = _dim_overlaps(z, u_lo, u_hi)
    assert max(z_ts, z_u) <= _Z_MAX_DIM_OVERLAP, (z_ts, z_u)
