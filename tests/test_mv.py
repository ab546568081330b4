"""operators/mv.py — durable incremental materialized view (VERDICT r6
item 7): two successive refreshes must equal one full recompute, the
version layout must give write isolation, and pruning must keep only
the trailing versions."""

from __future__ import annotations

import os
import shutil

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


def test_stream_refresh_replay_does_not_double_count(spark, tmp_path):
    """The classic streaming-MV bug, crash-proven: batch 1's MV version
    committed but its checkpoint commit was lost — on restart the batch
    REPLAYS, and a naive foreachBatch merge would add the delta a
    second time. mv_apply_batch must instead overwrite version
    batch_id+1 from the version ≤ batch_id base: the final MV equals
    the batch recompute over everything, exactly once."""
    import datetime

    from project_map_reduce_spark.operators.mv import (
        mv_partials,
        mv_read,
        mv_stream_refresh,
    )

    day = datetime.datetime(2024, 5, 1)
    schema = "event_type string, day timestamp, value double"
    batches = [
        [("a", day, 1.0), ("b", day, 2.0)],
        [("a", day, 4.0)],
        [("b", day, 8.0), ("a", day, 16.0)],
    ]
    base = tmp_path / "smv"
    src, mv, ckpt = (str(base / d) for d in ("src", "mv", "ckpt"))
    os.makedirs(src)

    def stage(i):
        df = spark.createDataFrame(batches[i], schema)
        df.coalesce(1).write.parquet(str(base / f"c{i}"))
        import glob

        (part,) = glob.glob(str(base / f"c{i}" / "part-*.parquet"))
        shutil.move(part, f"{src}/b{i}.parquet")

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = mv_stream_refresh(stream, mv, ckpt, KEYS, SUMS)
        assert q.awaitTermination(180), "stream did not drain"
        assert q.exception() is None

    stage(0)
    stage(1)
    run()
    # batch 0 → v=1, batch 1 → v=2 (trailing no-data batch skipped)
    assert os.path.exists(f"{mv}/v=2/_SUCCESS")

    # Crash window: v=2 is on disk but batch 1's checkpoint commit (and
    # the trailing batch's dangling offsets) never landed.
    for f in ("commits/1", "commits/2", "offsets/2",
              "commits/.1.crc", "commits/.2.crc", "offsets/.2.crc"):
        p = os.path.join(ckpt, f)
        if os.path.exists(p):
            os.remove(p)

    stage(2)
    run()

    got = _canon(mv_read(spark, mv))
    want = _canon(
        mv_partials(
            spark.createDataFrame(sum(batches, []), schema), KEYS, SUMS
        )
    )
    assert got == want, f"\ngot:  {got}\nwant: {want}"
    # total count proves exactly-once directly: 5 events, not 6
    assert sum(r[2] for r in got) == 5
    # pruning keeps a bounded tail (last version + its replay base)
    committed = sorted(
        d for d in os.listdir(mv)
        if d.startswith("v=") and os.path.exists(os.path.join(mv, d, "_SUCCESS"))
    )
    assert len(committed) == 2, committed
