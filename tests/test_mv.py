"""operators/mv.py — durable incremental materialized view (VERDICT r6
item 7): two successive refreshes must equal one full recompute, the
version layout must give write isolation, and pruning must keep only
the trailing versions."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from project_map_reduce_spark.operators.mv import (
    mv_finalize,
    mv_init,
    mv_read,
    mv_refresh,
)
from project_map_reduce_spark.tables import load

KEYS = ["event_type", "day"]
SUMS = {"sum_value": "value"}


def _with_day(df):
    return df.select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "value"
    )


def _canon(df):
    return sorted(
        (r["event_type"], r["day"], r["n_events"], round(r["sum_value"], 6))
        for r in mv_finalize(df, SUMS).collect()
    )


def test_two_refreshes_equal_full_recompute(spark, sf_dir, tmp_path):
    """init(history) + refresh(delta1) + refresh(delta2) == one partials
    pass over everything — the losslessness claim of the partial-merge
    design, across TWO committed versions (v1's stored bytes feed v2)."""
    from project_map_reduce_spark.operators.mv import mv_partials

    ev = load(spark, sf_dir, "events").select("event_type", "ts", "value")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    c1 = lo + (hi - lo) / 3
    c2 = lo + 2 * (hi - lo) / 3
    path = str(tmp_path / "mv")

    mv_init(_with_day(ev.filter(F.col("ts") < F.lit(c1))), KEYS, SUMS, path)
    v1 = mv_refresh(
        spark, path,
        _with_day(ev.filter((F.col("ts") >= F.lit(c1)) & (F.col("ts") < F.lit(c2)))),
        KEYS, SUMS,
    )
    v2 = mv_refresh(
        spark, path, _with_day(ev.filter(F.col("ts") >= F.lit(c2))), KEYS, SUMS
    )
    assert (v1, v2) == (1, 2)
    got = _canon(mv_read(spark, path))
    want = _canon(mv_partials(_with_day(ev), KEYS, SUMS))
    assert got == want


def test_crashed_refresh_leaves_previous_version_live(spark, sf_dir, tmp_path):
    """A version directory without _SUCCESS (a refresh that died
    mid-write) must be invisible: mv_read keeps serving the last
    committed version, and the next refresh commits OVER the dead
    version number's successor."""
    ev = load(spark, sf_dir, "events").select("event_type", "ts", "value")
    path = str(tmp_path / "mv")
    mv_init(_with_day(ev.limit(50)), KEYS, SUMS, path)
    before = _canon(mv_read(spark, path))

    # simulate the crash: v=1 exists but never committed
    dead = os.path.join(path, "v=1")
    os.makedirs(dead)
    with open(os.path.join(dead, "part-stale.parquet"), "w") as f:
        f.write("torn write")
    assert _canon(mv_read(spark, path)) == before

    # pruning keeps the last keep_versions committed dirs
    mv_refresh(spark, path, _with_day(ev.limit(0)), KEYS, SUMS)
    v = mv_refresh(spark, path, _with_day(ev.limit(0)), KEYS, SUMS,
                   keep_versions=1)
    assert _canon(mv_read(spark, path)) == before
    committed = sorted(
        d for d in os.listdir(path)
        if d.startswith("v=") and os.path.exists(os.path.join(path, d, "_SUCCESS"))
    )
    assert committed == [f"v={v}"]


def test_read_without_init_fails_loudly(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="no committed MV version"):
        mv_read(spark, str(tmp_path / "nope"))
