"""B.9 streaming-shaped analytics, batch-checked (Q39-Q42, Q90).

Q39-Q42 apply the batch/stream-unified transforms from
streaming/transforms.py to the batch events table; the identical
transform objects run under ``readStream`` in the streaming smoke test
(tests/test_streaming.py), which is the capability proof.

Q90 goes further: it runs an ACTUAL Structured Streaming query —
file-source micro-batches through ``applyInPandasWithState`` into the
idempotent foreachBatch sink — and hands the sink's final accounting to
the driver's hash gate, so the streaming path itself (not just its
batch-shaped twin) carries a driver correctness signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from project_map_reduce_spark.registry import register
from project_map_reduce_spark.streaming import transforms as X
from project_map_reduce_spark.tables import load


@register(
    "q_events_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts)                       AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR     AS window_end,
           event_type,
           count(*)                                     AS n_events,
           round(sum(value), 6)                         AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window counts (epoch-aligned, = date_trunc)."""
    return X.tumbling_counts(load(spark, sf_dir, "events"))


@register(
    "q_events_sliding",
    oracle="""
    WITH cand AS (
        SELECT e.*, CAST(to_timestamp(s.wstart_epoch) AS TIMESTAMP) AS window_start
        FROM events e,
             LATERAL (SELECT unnest(ARRAY[
                 floor(epoch(e.ts) / 1800) * 1800,
                 floor(epoch(e.ts) / 1800) * 1800 - 1800
             ]) AS wstart_epoch) s
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           event_type,
           count(*)             AS n_events,
           round(sum(value), 6) AS sum_value
    FROM cand
    WHERE ts >= window_start AND ts < window_start + INTERVAL 1 HOUR
    GROUP BY 1, 2, 3
    """,
)
def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding 30 min (oracle expands each event into its
    two candidate epoch-aligned buckets and filters)."""
    return X.sliding_counts(load(spark, sf_dir, "events"))


@register(
    "q_events_session",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END
                   AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), numbered AS (
        -- event_id tiebreak keeps the ROWS running sum deterministic when
        -- duplicate (user_id, ts) rows straddle a session boundary.
        SELECT *, sum(new_session) OVER (
            PARTITION BY user_id ORDER BY ts ASC, event_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS session_id
        FROM marked
    )
    SELECT user_id,
           min(ts)                             AS session_start,
           max(ts) + INTERVAL 30 MINUTE        AS session_end,
           (epoch_us(max(ts) + INTERVAL 30 MINUTE) - epoch_us(min(ts))) // 1000000
                                               AS duration_secs,
           count(*)                            AS n_events,
           round(sum(value), 6)                AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def q_events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap session windows per user (session_window ↔
    gaps-and-islands oracle; end = last event + gap on both sides)."""
    return X.session_stats(load(spark, sf_dir, "events"))


@register(
    "q_stream_dedup",
    oracle="""
    SELECT count(*)             AS n_rows,
           round(sum(value), 6) AS sum_value
    FROM events
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup on event_id over a deliberately doubled input (simulating
    the reference's at-least-once redelivery, SURVEY.md §1.4) — the
    result must equal the clean table."""
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import functions as F

    from project_map_reduce_spark.functions.det import r6d

    doubled = ev.unionByName(ev)
    deduped = X.dedup_events(doubled)
    return deduped.agg(
        F.count(F.lit(1)).alias("n_rows"),
        r6d(F.sum("value"), "sum_value"),
    )


@register(
    "q_stream_totals",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6)     AS sum_value
    FROM events
    GROUP BY user_id
    """,
)
def q_stream_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q90: end-to-end STREAMING correctness, driver-hash-checked.

    The events table is staged as 3 parquet files and re-read as a
    file-source stream (``maxFilesPerTrigger=1`` + available-now → 3
    micro-batches), flows through the custom stateful operator
    ``streaming/stateful.py::running_user_totals``
    (``applyInPandasWithState``, update mode: per-user running
    count/sum, state = 2 scalars/key), and lands in the exactly-once
    sink ``sources/sinks.py::write_stream_idempotent`` (per-batchId
    directory + overwrite — replay-safe where the reference's SQS
    visibility-timeout redelivery double-counts, SURVEY.md §1.4).
    The final accounting — each user's LAST update across batches —
    must equal the plain batch aggregate, which is exactly the oracle.

    Driver-collect note: the sink snapshot is O(distinct users)
    (150 @ sf0.01, 1.5k @ sf0.1) and is localized so the staging
    directory can be deleted before returning; this bounded collect is
    itself the row-accounting surface under test, not a data path.
    At 100 TB the snapshot stays parquet and downstream jobs read the
    sink root directly — the localization is test-harness-only.
    """
    import shutil
    import tempfile

    from pyspark.sql import Window, functions as F

    from project_map_reduce_spark.functions.det import r6d
    from project_map_reduce_spark.sources.sinks import write_stream_idempotent
    from project_map_reduce_spark.streaming.stateful import running_user_totals

    ev = load(spark, sf_dir, "events").select("user_id", "value")
    tmp = tempfile.mkdtemp(prefix="pmrs_q90_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        src, sink, ckpt = (f"{tmp}/{d}" for d in ("src", "sink", "ckpt"))
        ev.repartition(3).write.parquet(src)
        # State-store partitioning follows shuffle.partitions at query
        # start; 200 (vanilla default) means 200 state dirs per batch
        # for 150 keys. Pin low for the stream, restore after.
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        stream = (
            spark.readStream.schema("user_id bigint, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = write_stream_idempotent(
            running_user_totals(stream, evict_idle=False),
            sink,
            ckpt,
            output_mode="update",
        )
        finished = q.awaitTermination(300)
        if q.exception():
            raise q.exception()
        if not finished:
            # A timed-out stream must fail LOUDLY: reading the sink now
            # would return partial per-user totals (a driver hash
            # mismatch that looks like a logic bug), and the finally
            # block would rmtree the source under a live query.
            q.stop()
            raise RuntimeError(
                "q_stream_totals: stream did not finish within 300s "
                "(host stall?) — refusing to read a partial sink"
            )

        snap = spark.read.option("basePath", sink).parquet(sink)
        last = Window.partitionBy("user_id").orderBy(F.desc("batch_id"))
        final = (
            snap.withColumn("__rn", F.row_number().over(last))
            .where(F.col("__rn") == 1)
            .select("user_id", "n_events", r6d(F.col("sum_value"), "sum_value"))
        )
        rows = final.collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "user_id bigint, n_events bigint, sum_value double"
    )
