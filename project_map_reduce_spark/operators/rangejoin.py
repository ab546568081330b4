"""Bucketed interval (range) join — equi-join with a time-window
predicate that does NOT degenerate into a nested loop.

``left JOIN right ON key AND r.ts ∈ (l.ts + lower, l.ts + upper]`` is
the shape Spark's planner handles worst: the inequality conjunct can't
hash, so without help the plan is a BroadcastNestedLoopJoin (or a
per-key cartesian inside a SortMergeJoin when keys are hot). The
standard fix — the same one Flink's interval join and Databricks'
range-join optimization use — is to quantize time into buckets of the
window width:

- each RIGHT row lands in bucket floor(ts / w);
- each LEFT row is replicated to every bucket its window
  (l.ts+lower, l.ts+upper] overlaps — at most 2 buckets when
  w = upper - lower;
- equi-join on (key, bucket), then re-apply the EXACT window predicate.

Every candidate pair shares a (key, bucket) hash cell, so the join is
an ordinary hash/sort-merge equi-join with shuffle O(2·|L| + |R|), and
the post-filter only sees pairs at most one bucket apart — per-key
fanout is bounded by events-per-window, not events-per-key. The same
doctrine as the dedup family: never all-pairs, always a blocking key.

Reference analog: none — single-record maps only (SURVEY.md §2 Part A).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.det import epoch_micros

_US = 1_000_000  # microseconds per second


def _micros(c: Column) -> Column:
    # NTZ-safe epoch micros (events.ts is TIMESTAMP_NTZ on Spark ≥4.1);
    # bucketing only needs a consistent base, which epoch_micros gives
    # for either timestamp flavor.
    return epoch_micros(c)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    *,
    lower_sec: float,
    upper_sec: float,
) -> DataFrame:
    """Pairs of (left row, right row) with equal ``on`` key and
    ``r[right_ts] ∈ (l[left_ts] + lower_sec, l[left_ts] + upper_sec]``
    (half-open on the lower edge — "strictly after", the funnel/alert
    convention).

    Column-name collisions between the two inputs are the caller's to
    resolve (alias/select before calling); ``on`` must exist in both.
    """
    if upper_sec <= lower_sec:
        raise ValueError(
            f"empty window: lower_sec={lower_sec} >= upper_sec={upper_sec}"
        )
    w_us = int(round((upper_sec - lower_sec) * _US))
    lo_us = int(round(lower_sec * _US))
    up_us = int(round(upper_sec * _US))

    l_us = _micros(F.col(left_ts))
    r_us = _micros(F.col(right_ts))

    # Left window (l+lo, l+up] overlaps buckets floor((l+lo)/w) ..
    # floor((l+up)/w) — with w = window width that's at most 2 buckets.
    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((l_us + F.lit(lo_us)) / F.lit(w_us)),
                    F.floor((l_us + F.lit(up_us)) / F.lit(w_us)),
                )
            )
        ),
    )
    rb = right.withColumn("__bucket", F.floor(r_us / F.lit(w_us)))

    joined = lb.join(rb, [on, "__bucket"]).drop("__bucket")
    jl = _micros(F.col(left_ts))
    jr = _micros(F.col(right_ts))
    return joined.filter(
        (jr > jl + F.lit(lo_us)) & (jr <= jl + F.lit(up_us))
    )
