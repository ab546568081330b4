"""Durable incremental materialized view of partial aggregates.

The MV stores PARTIALS — per-group counts and exact ``decimal(18,6)``
value sums — never finals: partials merge associatively (counts add,
decimal sums add order-independently; averages derive from sum/count),
so a refresh is ``O(|MV| + |delta|)`` regardless of history size. A
double sum partial would make the stored bytes depend on accumulation
order; the decimal contract is what makes two successive refreshes
bit-equal to one full recompute (proven by
tests/test_warehouse_graph.py).

Durability layout — versioned directories, not in-place overwrite::

    <path>/v=0/    first full compute
    <path>/v=1/    after refresh #1
    ...

``mv_read`` resolves the highest version that carries Spark's own
``_SUCCESS`` marker, so a refresh that dies mid-write leaves the
previous version as the live MV (write isolation without a table
format; on S3-class stores the same layout works because no rename of
a live directory ever happens — each version is written fresh and the
marker commits it). ``mv_refresh`` reads version N, merges the delta's
partials, writes version N+1, and prunes versions older than
``keep_versions``. Readers of version N are unaffected by a concurrent
refresh; single-writer is the caller's contract (one refresh job per
MV, the normal warehouse arrangement).

Reference analog: none (``ext``) — the reference recomputes every
query from scratch (Manager.java re-runs the full scatter per request);
incremental view maintenance is warehouse-engine capability it lacks.
Query harness: plans/warehouse.py::q_mv_incremental.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def mv_partials(df: DataFrame, keys: list[str], sums: dict[str, str]) -> DataFrame:
    """Aggregate ``df`` to the MV's stored partial shape: one row per
    ``keys`` group with ``n_events`` (count) and one exact
    ``decimal(18,6)`` sum per ``sums`` entry (out_name -> value col)."""
    aggs = [F.count(F.lit(1)).alias("n_events")] + [
        F.sum(F.col(src).cast("decimal(18,6)")).alias(out)
        for out, src in sums.items()
    ]
    return df.groupBy(*keys).agg(*aggs)


def _merge(stored: DataFrame, delta: DataFrame, keys: list[str],
           sums: dict[str, str]) -> DataFrame:
    aggs = [F.sum("n_events").alias("n_events")] + [
        F.sum(out).alias(out) for out in sums
    ]
    return stored.unionByName(delta).groupBy(*keys).agg(*aggs)


def _versions(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        if name.startswith("v=") and name[2:].isdigit():
            if os.path.exists(os.path.join(path, name, "_SUCCESS")):
                out.append(int(name[2:]))
    return sorted(out)


def _current_version(path: str) -> int:
    vs = _versions(path)
    if not vs:
        raise FileNotFoundError(
            f"mv_read: no committed MV version under {path!r} "
            "(mv_init it first)"
        )
    return vs[-1]


def mv_read(spark: SparkSession, path: str) -> DataFrame:
    """The live MV: the highest _SUCCESS-committed version's partials."""
    return spark.read.parquet(os.path.join(path, f"v={_current_version(path)}"))


def mv_init(df: DataFrame, keys: list[str], sums: dict[str, str],
            path: str) -> None:
    """Full compute: write ``df``'s partials as version 0."""
    mv_partials(df, keys, sums).write.mode("overwrite").parquet(
        os.path.join(path, "v=0")
    )


def mv_refresh(spark: SparkSession, path: str, delta: DataFrame,
               keys: list[str], sums: dict[str, str],
               keep_versions: int = 2) -> int:
    """Merge ``delta``'s partials into the live MV and commit the next
    version; returns the new version number. Refresh cost is
    O(|MV| + |delta|) — history is never rescanned. The caller owns the
    delta predicate (typically ``ts >= last_cutoff``); feeding a row
    twice double-counts, exactly as in any watermark-based IVM."""
    cur = _current_version(path)
    merged = _merge(mv_read(spark, path), mv_partials(delta, keys, sums),
                    keys, sums)
    new = cur + 1
    merged.write.mode("overwrite").parquet(os.path.join(path, f"v={new}"))
    for v in _versions(path)[:-keep_versions] if keep_versions > 0 else []:
        if v != new:
            shutil.rmtree(os.path.join(path, f"v={v}"), ignore_errors=True)
    return new


def mv_finalize(mv: DataFrame, sums: dict[str, str]) -> DataFrame:
    """User-facing view of stored partials: decimal sums cast back to
    double (the query-surface type), counts kept."""
    cols = [c for c in mv.columns if c != "n_events" and c not in sums]
    return mv.select(
        *cols,
        F.col("n_events").alias("n_events"),
        *[F.col(out).cast("double").alias(out) for out in sums],
    )
