"""Q134 q_stream_state_sessions — transformWithStateInPandas (Spark 4.1
arbitrary-state API): timer semantics, multi-variable crash recovery,
and the protobuf shim that makes the state protocol importable here.

The full-query oracle check runs in tests/test_oracle_parity.py's sweep;
these pin what the sweep can't see: that BOTH state variables and the
registered timers survive a kill-and-replay (a recovery that dropped the
seq counter would renumber sessions; one that dropped timers would never
finalize the last session), and that the stale-timer guard really
ignores a superseded deadline.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


@pytest.fixture()
def tws_env(spark):
    from project_map_reduce_spark.streaming.transform_state import (
        ensure_protobuf_env,
        restore_env,
    )

    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev_prov = spark.conf.get(prov_key, None)
    prev_env = ensure_protobuf_env(spark)
    spark.conf.set(prov_key, ROCKSDB)
    yield
    if prev_prov is None:
        spark.conf.unset(prov_key)
    else:
        spark.conf.set(prov_key, prev_prov)
    restore_env(spark, prev_env)


def _ts(minutes):
    import datetime

    return datetime.datetime(2024, 3, 1, 10, 0, 0) + datetime.timedelta(
        minutes=minutes
    )


_SCHEMA = "user_id bigint, ts timestamp, value double"


def _stage(spark, base, src, i, name, data):
    df = spark.createDataFrame(data, _SCHEMA)
    df.coalesce(1).write.parquet(str(base / name))
    (part,) = glob.glob(str(base / name / "part-*.parquet"))
    shutil.move(part, f"{src}/b{i}_{name}.parquet")


def _run(spark, src, sink, ckpt):
    from project_map_reduce_spark.plans.streaming_shaped import (
        _await_finite_stream,
    )
    from project_map_reduce_spark.sources.sinks import write_stream_idempotent
    from project_map_reduce_spark.streaming.transform_state import (
        timer_sessions,
    )

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = write_stream_idempotent(
        timer_sessions(stream), sink, ckpt, output_mode="append"
    )
    _await_finite_stream(q, "tws test")
    return q


def _result(spark, sink):
    return sorted(
        tuple(r)
        for r in spark.read.option("basePath", sink)
        .parquet(sink)
        .where(F.col("user_id") != -1)
        .select(
            "user_id", "session_start", "session_end", "session_seq",
            "n_events", "sum_value",
        )
        .collect()
    )


# user 1: one session straddling the cut (merge-out-of-state) then a
# second session (seq must read 2 — numbering crosses the crash);
# user 2: one session per side of the cut.
_ROWS = [
    (1, _ts(0), 1.0),
    (1, _ts(20), 2.0),
    (1, _ts(45), 4.0),
    (1, _ts(120), 32.0),
    (2, _ts(5), 8.0),
    (2, _ts(90), 16.0),
]
_WANT = [
    (1, _ts(0), _ts(45 + 30), 1, 3, 7.0),
    (1, _ts(120), _ts(120 + 30), 2, 1, 32.0),
    (2, _ts(5), _ts(5 + 30), 1, 1, 8.0),
    (2, _ts(90), _ts(90 + 30), 2, 1, 16.0),
]


def test_timer_sessions_finalize_and_number(spark, tws_env, tmp_path):
    """End-to-end on the two-user fixture: splits emit eagerly, each
    user's last session finalizes by TIMER after the flush batch, and
    session_seq numbers chronologically per user."""
    base = tmp_path / "tws"
    src, sink, ckpt = (str(base / d) for d in ("src", "sink", "ckpt"))
    os.makedirs(src)
    cut = _ts(30)
    _stage(spark, base, src, 0, "early", [r for r in _ROWS if r[1] <= cut])
    _stage(spark, base, src, 1, "late", [r for r in _ROWS if r[1] > cut])
    _stage(spark, base, src, 2, "flush", [(-1, _ts(60 * 24 * 30), 0.0)])
    _stage(spark, base, src, 3, "spacer", [])
    _run(spark, src, sink, ckpt)
    assert _result(spark, sink) == sorted(_WANT)


def test_state_vars_and_timers_recover_after_crash(spark, tws_env, tmp_path):
    """Kill the stream in the authentic crash window (batch 1's offsets
    durable, its commit gone), restart, and require the exact full
    result: the open-session ValueState must rehydrate and merge the
    replayed batch, the seq-counter ValueState must keep numbering
    from 1 (not restart at 0 or double-count the replay), and the
    re-registered timers must still finalize every session."""
    base = tmp_path / "twscrash"
    src, sink, ckpt = (str(base / d) for d in ("src", "sink", "ckpt"))
    os.makedirs(src)
    cut = _ts(30)
    _stage(spark, base, src, 0, "early", [r for r in _ROWS if r[1] <= cut])
    _stage(spark, base, src, 1, "late", [r for r in _ROWS if r[1] > cut])
    q = _run(spark, src, sink, ckpt)
    commits = sorted(c for c in os.listdir(f"{ckpt}/commits") if c.isdigit())
    assert commits == ["0", "1", "2"], commits  # 2 = availableNow flush

    # Crash injection (the pinned recipe): drop batch 1's commit and
    # every later offset/commit so restart replays batch 1 into the
    # post-batch-0 state snapshot.
    os.remove(f"{ckpt}/commits/1")
    os.remove(f"{ckpt}/commits/2")
    os.remove(f"{ckpt}/offsets/2")
    for stale in (f"{ckpt}/commits/.1.crc", f"{ckpt}/commits/.2.crc",
                  f"{ckpt}/offsets/.2.crc"):
        if os.path.exists(stale):
            os.remove(stale)

    _stage(spark, base, src, 2, "flush", [(-1, _ts(60 * 24 * 30), 0.0)])
    _stage(spark, base, src, 3, "spacer", [])
    q = _run(spark, src, sink, ckpt)
    replayed = [p["batchId"] for p in q.recentProgress]
    assert replayed[0] == 1, f"restart did not replay batch 1: {replayed}"
    assert _result(spark, sink) == sorted(_WANT)


def test_stale_timer_is_ignored(spark, tws_env, tmp_path):
    """A session EXTENDED in a later batch moves its deadline; the
    guard must not finalize at the superseded one. User 3's session is
    extended by batch 1 within the gap, so only the extended session
    (3 events, through ts 40) may ever be emitted."""
    base = tmp_path / "twsstale"
    src, sink, ckpt = (str(base / d) for d in ("src", "sink", "ckpt"))
    os.makedirs(src)
    rows = [(3, _ts(0), 1.0), (3, _ts(15), 2.0), (3, _ts(40), 4.0)]
    _stage(spark, base, src, 0, "early", rows[:2])
    _stage(spark, base, src, 1, "late", rows[2:])
    _stage(spark, base, src, 2, "flush", [(-1, _ts(60 * 24 * 30), 0.0)])
    _stage(spark, base, src, 3, "spacer", [])
    _run(spark, src, sink, ckpt)
    assert _result(spark, sink) == [(3, _ts(0), _ts(40 + 30), 1, 3, 7.0)]


def test_pbshim_sitecustomize_is_defensive(tmp_path):
    """The shim must be a no-op in a process whose protobuf world is
    healthy or absent — it only acts when google.protobuf.descriptor
    is unimportable, and never raises."""
    import subprocess
    import sys

    shim = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "project_map_reduce_spark", "streaming", "pbshim",
    )
    # Imports cleanly and repairs the import (this container has no
    # pip protobuf, so success proves the fallback path).
    code = (
        "import sitecustomize\n"
        "from google.protobuf import descriptor\n"
        "import pyspark.sql.streaming.proto.StateMessage_pb2 as m\n"
        "print('PBSHIM_OK', m.DESCRIPTOR.name != '')\n"
    )
    env = dict(os.environ, PYTHONPATH=shim)
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    assert "PBSHIM_OK True" in out.stdout, (out.stdout, out.stderr)


def test_map_and_list_state_roundtrip(spark, tws_env, tmp_path):
    """API-coverage twin for the remaining state classes: a processor
    holding a MapState (per-event-type counts) and a ListState (batch
    sizes seen), exercising containsKey/updateValue/iterator, appendValue
    /get, and deleteIfExists — the state variables Q134's ValueState
    pair doesn't touch. Emits each key's converged per-type counts on
    the final batch; must equal the batch groupBy."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    from project_map_reduce_spark.plans.streaming_shaped import (
        _await_finite_stream,
    )
    from project_map_reduce_spark.sources.sinks import write_stream_idempotent

    class TypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState("counts", "t string", "n bigint")
            self._batches = handle.getListState("batches", "sz bigint")
            self._handle = handle

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            total = 0
            for pdf in rows:
                total += len(pdf)
                for t, n in pdf.groupby("event_type").size().items():
                    prev = (
                        self._counts.getValue((t,))[0]
                        if self._counts.containsKey((t,))
                        else 0
                    )
                    self._counts.updateValue((t,), (prev + int(n),))
            self._batches.appendValue((total,))
            out = [
                (key[0], k[0], v[0])
                for k, v in self._counts.iterator()
            ]
            yield pd.DataFrame(
                out, columns=["user_id", "event_type", "n_events"]
            )

        def close(self) -> None:
            pass

    rows = [
        (1, "click"), (1, "view"), (1, "click"),
        (2, "view"), (2, "view"),
    ]
    base = tmp_path / "maplist"
    src, sink, ckpt = (str(base / d) for d in ("src", "sink", "ckpt"))
    os.makedirs(src)
    schema = "user_id bigint, event_type string"
    for i, chunk in enumerate((rows[:3], rows[3:])):
        df = spark.createDataFrame(chunk, schema)
        df.coalesce(1).write.parquet(str(base / f"c{i}"))
        (part,) = glob.glob(str(base / f"c{i}" / "part-*.parquet"))
        shutil.move(part, f"{src}/b{i}.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream.groupBy("user_id").transformWithStateInPandas(
        TypeCounts(),
        outputStructType="user_id bigint, event_type string, n_events bigint",
        outputMode="update",
        timeMode="none",
    )
    q = write_stream_idempotent(out, sink, ckpt, output_mode="update")
    _await_finite_stream(q, "map/list state test")

    from pyspark.sql import Window

    snap = spark.read.option("basePath", sink).parquet(sink)
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("batch_id")
    )
    final = (
        snap.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "n_events")
    )
    got = sorted(tuple(r) for r in final.collect())
    assert got == [
        (1, "click", 2), (1, "view", 1), (2, "view", 2),
    ], got


# ---------------------------------------------------------------------------
# Protocol-cost contract (VERDICT r9 item 3): the state-server round
# trips per key per batch are O(1) — NEVER O(sessions) — because that
# is the only lever that amortizes transformWithState's per-key socket
# protocol at production batch shapes. These tests drive the processor
# directly with counting fakes, so the contract is pinned at the unit
# level (no Spark, no sockets).


class _CountingValueState:
    def __init__(self):
        self.v = None
        self.gets = 0
        self.updates = 0
        self.clears = 0

    def get(self):
        self.gets += 1
        return self.v

    def update(self, t):
        self.updates += 1
        self.v = tuple(t)

    def clear(self):
        self.clears += 1
        self.v = None


class _CountingHandle:
    def __init__(self):
        self.states = {}
        self.n_register = 0
        self.n_delete = 0

    def getValueState(self, name, schema):
        st = _CountingValueState()
        self.states[name] = st
        return st

    def registerTimer(self, ms):
        self.n_register += 1

    def deleteTimer(self, ms):
        self.n_delete += 1


def _proc():
    from project_map_reduce_spark.streaming.transform_state import (
        SessionTimerProcessor,
    )

    h = _CountingHandle()
    p = SessionTimerProcessor()
    p.init(h)
    return p, h


def _batch(us_list, values=None):
    import pandas as pd

    return pd.DataFrame(
        {
            "ts": pd.to_datetime(us_list, unit="us"),
            "value": values or [1.0] * len(us_list),
        }
    )


_MIN_US = 60 * 1_000_000


def test_state_round_trips_are_o1_per_key_batch():
    """12 sessions in one batch slice: ONE frame out, ONE seq get+update,
    ONE sess update, ≤1 timer registration — independent of session
    count. This is the amortization contract: protocol cost scales with
    keys-per-batch, never rows or sessions (BASELINE.md Q134 guidance)."""
    p, h = _proc()
    out = list(
        p.handleInputRows((7,), iter([_batch([i * 40 * _MIN_US for i in range(12)])]), None)
    )
    assert len(out) == 1 and len(out[0]) == 11  # 11 closed, 1 open
    assert h.states["seq"].gets == 1 and h.states["seq"].updates == 1
    assert h.states["sess"].gets == 1 and h.states["sess"].updates == 1
    assert h.n_register == 1 and h.n_delete == 0  # nothing was armed before
    assert list(out[0]["session_seq"]) == list(range(1, 12))


def test_carry_in_extends_backward_within_gap():
    """Watermark-legal out-of-order: a batch row EARLIER than the
    carried session start but within the gap extends the session
    backward (lo = batch min) instead of corrupting it (ADVICE r9)."""
    p, h = _proc()
    h.states["sess"].v = (100 * _MIN_US, 110 * _MIN_US, 2, 5.0)
    out = list(p.handleInputRows((1,), iter([_batch([80 * _MIN_US])]), None))
    assert out == []  # still one open session — nothing finalized
    assert h.states["sess"].v == (80 * _MIN_US, 110 * _MIN_US, 3, 6.0)
    assert h.n_delete == 1 and h.n_register == 1  # re-armed at same deadline


def test_carry_in_absorbs_multi_segment_batch_inside_span():
    """Rows landing INSIDE the carried span that split into several
    batch segments (intra-batch gaps > gap) must all merge into the
    carried session — adding late rows to gap sessions only ever
    merges, never splits."""
    p, h = _proc()
    h.states["sess"].v = (0, 60 * _MIN_US, 4, 4.0)
    out = list(
        p.handleInputRows(
            (1,), iter([_batch([10 * _MIN_US, 55 * _MIN_US])]), None
        )
    )
    assert out == []
    assert h.states["sess"].v == (0, 60 * _MIN_US, 6, 6.0)


def test_row_older_than_gap_before_carry_finalizes_separately():
    """A row more than one gap OLDER than the carried start forms a
    chronologically earlier session; it finalizes now (documented
    residual: session_seq is finalization-ordered for sub-gap-late
    rows) and the carried session stays open untouched."""
    p, h = _proc()
    h.states["sess"].v = (100 * _MIN_US, 110 * _MIN_US, 2, 5.0)
    out = list(p.handleInputRows((1,), iter([_batch([30 * _MIN_US])]), None))
    assert len(out) == 1 and len(out[0]) == 1
    row = out[0].iloc[0]
    assert row["n_events"] == 1 and row["session_seq"] == 1
    assert h.states["sess"].v == (100 * _MIN_US, 110 * _MIN_US, 2, 5.0)


def test_selection_guidance_is_pinned():
    """The Q112-vs-Q134 selection guidance (VERDICT r9 item 3) is a
    shipped contract, not lore: Q134's registered docstring must carry
    it (names Q112, states the batches×keys cost law and the
    few-large-batches discipline) and BASELINE.md must carry the
    measured amortization row it cites."""
    import os

    from project_map_reduce_spark.registry import entries

    doc = entries()["q_stream_state_sessions"].fn.__doc__
    assert "SELECTION GUIDANCE" in doc
    assert "Q112" in doc and "session_window" in doc
    assert "batches × keys" in doc
    assert "FEW LARGE batches" in doc

    baseline = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE.md",
    )
    with open(baseline) as f:
        text = f.read()
    assert "Q134 amortization curve" in text
    assert "tools/probe_tws.py" in text


def test_pbshim_exposes_only_google_namespace(tmp_path):
    """ADVICE r9 regression: the fallback path entry must expose ONLY
    google/* from the GAE bundle — a stray top-level import (yaml,
    webob, ...) that would resolve to the bundle's ancient copies must
    still fail/resolve elsewhere, and the version gate must stay
    strict for cross-major skews."""
    import os
    import subprocess
    import sys

    shim = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "project_map_reduce_spark", "streaming", "pbshim",
    )
    code = (
        "import sitecustomize, sys, os\n"
        "from google.protobuf import descriptor  # repaired\n"
        "from project_map_reduce_spark.streaming.pbshim.sitecustomize import"
        " _FALLBACK_DIRS\n"
        "bad = [p for p in sys.path if os.path.realpath(p) in"
        " {os.path.realpath(d) for d in _FALLBACK_DIRS}]\n"
        "print('BUNDLE_TOPLEVEL_EXPOSED', bool(bad))\n"
        "import google\n"
        "print('GOOGLE_VIA_SHIM', any('pmrs_pbshim' in p for p in google.__path__))\n"
        "from google.protobuf import runtime_version as rv\n"
        "try:\n"
        "    rv.ValidateProtobufRuntimeVersion(rv.Domain.PUBLIC, rv.MAJOR + 1,"
        " 0, 0, '', 'x.py')\n"
        "    print('CROSS_MAJOR_GATE', 'waved-through')\n"
        "except Exception:\n"
        "    print('CROSS_MAJOR_GATE', 'strict')\n"
        "try:\n"
        "    rv.ValidateProtobufRuntimeVersion(rv.Domain.PUBLIC, rv.MAJOR,"
        " rv.MINOR + 1, 0, '', 'x.py')\n"
        "    print('SAME_MAJOR_GATE', 'lenient')\n"
        "except Exception:\n"
        "    print('SAME_MAJOR_GATE', 'strict')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=dict(os.environ, PYTHONPATH=shim),
        capture_output=True,
        text=True,
    )
    assert "BUNDLE_TOPLEVEL_EXPOSED False" in out.stdout, (out.stdout, out.stderr)
    assert "GOOGLE_VIA_SHIM True" in out.stdout, (out.stdout, out.stderr)
    assert "CROSS_MAJOR_GATE strict" in out.stdout, out.stdout
    assert "SAME_MAJOR_GATE lenient" in out.stdout, out.stdout


# ---------------------------------------------------------------------------
# Property: under the documented watermark-legal delivery contract, the
# processor's emitted ∪ open sessions equal brute-force gap
# sessionization for ANY event set and ANY batch split (hypothesis).


def _brute_sessions(us_sorted):
    out, cur = [], [us_sorted[0]]
    for t in us_sorted[1:]:
        if t - cur[-1] <= _MIN_US * 30:
            cur.append(t)
        else:
            out.append(cur)
            cur = [t]
    out.append(cur)
    return {(s[0], s[-1], len(s)) for s in out}


def test_any_batch_split_matches_brute_force():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @st.composite
    def events_and_split(draw):
        # Event times on a minute lattice (keeps sums exact) with gaps
        # straddling the 30-min session boundary in both directions.
        n = draw(st.integers(2, 40))
        steps = draw(
            st.lists(st.integers(1, 70), min_size=n - 1, max_size=n - 1)
        )
        ts = [0]
        for d in steps:
            ts.append(ts[-1] + d)
        # Batch boundaries: any ordered split into 1..4 slices. Rows
        # inside a slice may be shuffled (the processor sorts); slices
        # themselves are time-ordered = the watermark-legal contract
        # the module documents (sub-gap backward overlap is exercised
        # by shifting the boundary row into the NEXT batch).
        k = draw(st.integers(1, 4))
        cuts = sorted(draw(st.lists(st.integers(1, n - 1), min_size=k - 1, max_size=k - 1)))
        slices, lo = [], 0
        for c in cuts + [n]:
            if c > lo:
                slices.append(ts[lo:c])
            lo = c
        demote = draw(st.booleans())
        if demote and len(slices) > 1 and len(slices[0]) > 1:
            # Move the first batch's LAST row into batch 2 — arrives
            # "late" but within gap of the carried session iff the data
            # says so; the merge must reconstruct the same sessions.
            slices[1].insert(0, slices[0].pop())
        return ts, slices

    @given(ev=events_and_split())
    @settings(max_examples=120, deadline=None)
    def run(ev):
        ts, slices = ev
        us_all = sorted(t * _MIN_US for t in ts)
        p, h = _proc()
        emitted = []
        for sl in slices:
            if not sl:
                continue
            out = list(
                p.handleInputRows((1,), iter([_batch([t * _MIN_US for t in sl])]), None)
            )
            for frame in out:
                for r in frame.itertuples():
                    emitted.append(
                        (
                            int(r.session_start.value // 1000),
                            int(r.session_end.value // 1000) - 30 * _MIN_US,
                            int(r.n_events),
                        )
                    )
        open_s = h.states["sess"].v
        have = set(emitted)
        if open_s is not None:
            have.add((open_s[0], open_s[1], open_s[2]))
        assert have == _brute_sessions(us_all)

    run()
