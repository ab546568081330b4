"""Custom stateful streaming operator: per-key running aggregates via
``applyInPandasWithState`` (SURVEY.md §2 B.9 capability surface).

This is the Spark-native replacement for the reference Manager's
mutable per-job state — the gathered-count barrier held in a local
variable on one thread (Manager.java:293-311). Here the state is
partitioned by key across executors, checkpointed, and evicted by
timeout; the operator emits an updated running snapshot per key per
micro-batch.

100 TB discipline: state size is O(distinct keys), each entry a fixed
few scalars — never buffer raw rows in state. Timeouts guarantee
eviction for keys that go quiet.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
_STATE_SCHEMA = "n bigint, s double"


def _make_update_running(set_timeout: bool):
    def _update_running(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # Quiet key: emit final snapshot and evict state.
            n, s = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
            )
            return
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        if set_timeout:
            state.setTimeoutDuration(3_600_000)  # 1 h idle → evict
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return _update_running


def running_user_totals(events: DataFrame, *, evict_idle: bool = True) -> DataFrame:
    """Running (n_events, sum_value) per user, updated each micro-batch.

    Works on a streaming frame via ``applyInPandasWithState``; on a
    batch frame the same semantics reduce to a plain groupBy (use
    ``batch_user_totals`` — unified-API escape hatch for tests/oracle).

    ``evict_idle=True`` (perpetual streams) arms a 1 h processing-time
    timeout so quiet keys are flushed and evicted — the state-size
    discipline above. Pass ``evict_idle=False`` for FINITE runs under
    ``Trigger.AvailableNow``: with a processing-time timeout armed, the
    trigger can never declare the stream drained (a timer might still
    fire) and keeps scheduling empty timeout-check batches forever.
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_running(evict_idle),
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if evict_idle
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def batch_user_totals(events: DataFrame) -> DataFrame:
    """Batch-mode reference semantics for ``running_user_totals``."""
    from pyspark.sql import functions as F

    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )
