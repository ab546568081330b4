"""Arbitrary stateful streaming via Spark 4.1's ``transformWithStateInPandas``
(SURVEY.md §2 B.9 — the forward-looking state surface, VERDICT r8 item 5).

``applyInPandasWithState`` (streaming/stateful.py, Q90) is the classic
single-state-tuple API; ``transformWithState`` is its successor and the
surface a 2026 engine should own: a ``StatefulProcessor`` object holding
MULTIPLE named state variables (value/list/map), EVENT-TIME TIMERS with
registration/deletion, optional TTL, and separate input/timer callbacks.
This module implements 30-min-gap sessionization with timer-driven
finalization on it — the custom-operator twin of Q112's built-in
``session_window``:

* per-key ValueState ``sess`` holds the ONE open session as four
  scalars (start/last event-time micros, count, sum) — state is
  O(open sessions), never O(events);
* per-key ValueState ``seq`` numbers a user's finalized sessions
  (1-based, chronological) — the second state variable, and the
  oracle-checkable witness that both variables recover together after
  a crash (a lost ``seq`` would renumber sessions);
* a session is finalized EITHER by the next in-order event arriving
  past the gap (split, detected in ``handleInputRows``) OR by an
  event-time TIMER at ``last_ts + gap`` once the watermark passes it
  (``handleExpiredTimer``) — the path that finalizes every user's
  final session without any more input arriving;
* re-registration discipline: each batch deletes the key's previous
  timer before arming the new deadline, and the timer callback
  re-checks the CURRENT deadline so a stale timer (deadline moved by
  a later batch) is a no-op — the two orderings of "input first /
  timer first" inside one micro-batch therefore emit identical rows.

TTL note: per-state TTL (``ttlDurationMs``) is PROCESSING-time based
and deliberately unused here — a hash-checked query must not depend on
wall-clock; eviction is the explicit ``clear()`` on finalize instead.

Engine requirement: ``transformWithState`` runs only on the RocksDB
state-store provider (Spark enforces this); callers set
``spark.sql.streaming.stateStore.providerClass`` for the query.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "session_seq bigint, n_events bigint, sum_value double"
)
_SESS_STATE = "start_us long, last_us long, n bigint, s double"
_SEQ_STATE = "n bigint"

GAP_MIN = 30
_GAP_US = GAP_MIN * 60 * 1_000_000


def _deadline_ms(last_us: int) -> int:
    return (last_us + _GAP_US) // 1000


class SessionTimerProcessor(StatefulProcessor):
    """Gap sessionization with timer finalization (module docstring)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._sess = handle.getValueState("sess", _SESS_STATE)
        self._seq = handle.getValueState("seq", _SEQ_STATE)
        self._handle = handle

    def _emit(self, user_id: int, starts, lasts, counts, sums) -> pd.DataFrame:
        """One output frame for k finalized sessions, numbered with a
        SINGLE seq-state read+write (state round trips per key per
        batch stay O(1), never O(sessions))."""
        k = len(starts)
        base = (self._seq.get() or (0,))[0]
        self._seq.update((base + k,))
        return pd.DataFrame(
            {
                "user_id": [user_id] * k,
                "session_start": pd.to_datetime(starts, unit="us"),
                "session_end": pd.to_datetime(
                    [us + _GAP_US for us in lasts], unit="us"
                ),
                "session_seq": range(base + 1, base + k + 1),
                "n_events": counts,
                # Full precision out; display rounding is the READER's
                # job (plans apply one F.round on the sink read-back) —
                # Python round() here would be banker's rounding, which
                # disagrees with SQL half-away-from-zero on exact 6dp
                # halves (ADVICE r9).
                "sum_value": sums,
            }
        )

    def handleInputRows(
        self, key, rows, timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        carried = self._sess.get()  # one round trip: None when absent
        if carried is not None:
            start_us, last_us, n, s = carried
            # This key's armed deadline moves; disarm the old timer so
            # exactly one live timer per key survives the batch.
            self._handle.deleteTimer(_deadline_ms(last_us))
        else:
            start_us, last_us, n, s = -1, -1, 0, 0.0
        # Vectorized sessionization of the batch: everything below runs
        # over SEGMENT ARRAYS (sessions within this key's batch slice),
        # never over events — diff/cumsum/groupby stay in numpy/pandas,
        # and all completed sessions leave in ONE output frame.
        pdfs = [p for p in rows if len(p)]
        if pdfs:
            pdf = (pdfs[0] if len(pdfs) == 1 else pd.concat(pdfs)).sort_values("ts")
            ts_us = pdf["ts"].astype("int64") // 1000
            seg = (ts_us.diff() > _GAP_US).cumsum()
            g = pdf.assign(__us=ts_us).groupby(seg.values, sort=True)
            agg = g.agg(
                lo=("__us", "min"),
                hi=("__us", "max"),
                cnt=("__us", "size"),
                tot=("value", "sum"),
            )
            segs = [
                (int(lo), int(hi), int(c), float(t))
                for lo, hi, c, t in zip(
                    agg["lo"], agg["hi"], agg["cnt"], agg["tot"]
                )
            ]
            if last_us >= 0:
                # Carry-in joins the merge as a pseudo-segment rather
                # than special-casing "batch starts after the carry"
                # (ADVICE r9): watermark-legal out-of-order rows may
                # land BEFORE the carried session (extending it
                # backward, lo = min of the two) or inside its span
                # split into several batch segments — a sort by lo plus
                # one gap-merge pass handles every interleaving exactly,
                # because adding late rows to gap sessions only ever
                # MERGES sessions, never splits them. Residual contract
                # (documented, not recoverable from O(1) state): a row
                # older than ``carried.start - gap`` that survives the
                # watermark filter forms a chronologically EARLIER
                # session finalized after the carried one, so
                # session_seq is finalization-ordered in that case.
                segs.append((start_us, last_us, n, s))
                segs.sort(key=lambda t4: (t4[0], t4[1]))
            merged = [segs[0]]
            for lo, hi, c, t in segs[1:]:
                mlo, mhi, mc, mt = merged[-1]
                if lo - mhi <= _GAP_US:
                    merged[-1] = (mlo, max(mhi, hi), mc + c, mt + t)
                else:
                    merged.append((lo, hi, c, t))
            los = [t4[0] for t4 in merged]
            his = [t4[1] for t4 in merged]
            cnts = [t4[2] for t4 in merged]
            tots = [t4[3] for t4 in merged]
            # All segments but the last are complete; the last stays
            # open in state with a timer at its deadline.
            if len(los) > 1:
                yield self._emit(
                    user_id, los[:-1], his[:-1], cnts[:-1], tots[:-1]
                )
            start_us, last_us, n, s = los[-1], his[-1], cnts[-1], tots[-1]
        if last_us >= 0:  # no-op batch for this key: nothing to arm
            self._sess.update((start_us, last_us, n, s))
            self._handle.registerTimer(_deadline_ms(last_us))

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        carried = self._sess.get()  # one round trip: None when absent
        if carried is None:
            return
        start_us, last_us, n, s = carried
        # Stale-timer guard: only the timer matching the CURRENT
        # deadline finalizes (a later batch may have extended the
        # session and re-armed; that timer will come).
        if expiredTimerInfo.getExpiryTimeInMs() != _deadline_ms(last_us):
            return
        (user_id,) = key
        yield self._emit(user_id, [start_us], [last_us], [n], [s])
        self._sess.clear()

    def close(self) -> None:
        pass


def ensure_protobuf_env(spark) -> dict:
    """Arrange for every Spark Python worker of THIS context to import
    a working ``google.protobuf`` (required by transformWithState's
    state-server protocol) even on hosts where protobuf was never
    pip-installed: put ``pbshim/`` (whose ``sitecustomize.py`` repairs
    the import — see its docstring) on the workers' PYTHONPATH.

    The lever is ``sc.environment`` — the dict PySpark snapshots into
    every subsequently-created PythonFunction's envVars (rdd.py::
    ``_prepare_for_python_RDD``), which the JVM merges into the worker
    PYTHONPATH for both executor workers and the transformWithState
    driver-side runner. Crucially it is a plain Python dict consulted
    at FUNCTION-CREATION time, so a query function can apply it at
    runtime inside any session (the external driver's included) — no
    env var needed before JVM launch. Returns the previous entries so
    callers can restore (``restore_env``)."""
    import os

    shim = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pbshim")
    env = spark.sparkContext.environment
    prev = {k: env.get(k) for k in ("PYTHONPATH",)}
    parts = [shim] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    env["PYTHONPATH"] = os.pathsep.join(parts)
    return prev


def restore_env(spark, prev: dict) -> None:
    env = spark.sparkContext.environment
    for k, v in prev.items():
        if v is None:
            env.pop(k, None)
        else:
            env[k] = v


def timer_sessions(events: DataFrame) -> DataFrame:
    """30-min-gap sessions per user over a WATERMARKED stream, finalized
    by event-time timers; emits each session exactly once (append)."""
    return (
        events.select("user_id", "ts", "value")
        .withWatermark("ts", f"{GAP_MIN} minutes")
        .groupBy("user_id")
        .transformWithStateInPandas(
            SessionTimerProcessor(),
            outputStructType=SESSION_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
