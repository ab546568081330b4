"""B.1 scans / sources (Q01-Q02).

Reference parity: the reference's only source is a line-oriented text
file scanned by the Manager (Manager.java:269-284) and counted by the
client (LocalApp.java:106-115). Here both become parquet relations with
column pruning — the projection in Q01 must reach the scan
(``ReadSchema`` shows only the 4 columns; verified in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_map_reduce_spark.registry import register
from project_map_reduce_spark.tables import load


@register(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan lineitem, project 4 columns (ref A1/A3). Column pruning pushes
    the 4-column ReadSchema into the parquet scan."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )


@register(
    "q_scan_count",
    oracle="SELECT count(*) AS n_rows FROM lineitem",
)
def q_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(*) of lineitem (ref A2 — the client's line count, without the
    reference's off-by-one at LocalApp.java:111). Parquet metadata-only
    count: Catalyst satisfies this from row-group stats."""
    return load(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "q_partition_prune",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
    GROUP BY event_type
    """,
)
def q_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q118: partition pruning DRIVER-PROVEN — the single most important
    scan optimization at 100 TB: the events stream is laid out
    hive-partitioned by event_date (the layout every production event
    lake uses), and a 3-day query then opens ONLY those 3 partition
    directories — the other 27 days are eliminated from the file
    listing before any I/O, turning a full-corpus scan into a
    date-bounded one. The function raises loudly if the executed plan's
    scan does not carry the date predicate as a PartitionFilter, so a
    planner regression that silently reverts to scanning all partitions
    becomes a driver failure, not a quiet 10× I/O bill.

    The oracle is the same 3-day aggregate computed by FILTERING the
    unpartitioned raw table, so the driver hash matches only if pruning
    changes the physical I/O and nothing else.

    Driver-collect note (the Q96/Q117 pattern): the aggregate is
    O(event types) = 5 rows; it is localized so the scratch partitioned
    layout can be removed before returning — at scale the partitioned
    table is the durable asset, written once and pruned by every query
    after.
    """
    import shutil
    import tempfile

    from project_map_reduce_spark.functions.det import sum6

    ev = load(spark, sf_dir, "events").select(
        "event_type", "ts", "value", F.to_date("ts").alias("event_date")
    )
    lo, hi = "2024-01-10", "2024-01-12"
    part_dir = tempfile.mkdtemp(prefix="q_partition_prune_")
    try:
        # One writer task per date directory (hash repartition on the
        # partition column), the layout a daily ingest job would leave.
        ev.repartition("event_date").write.mode("overwrite").partitionBy(
            "event_date"
        ).parquet(part_dir)
        pruned = (
            spark.read.parquet(part_dir)
            .filter(F.col("event_date").between(F.lit(lo), F.lit(hi)))
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                sum6("value").alias("sum_value"),
            )
        )
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        import re

        pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        if pf is None or "event_date" not in pf.group(1):
            raise RuntimeError(
                "partition pruning regression — scan has no event_date "
                f"PartitionFilter:\n{plan}"
            )
        rows = pruned.collect()
    finally:
        shutil.rmtree(part_dir, ignore_errors=True)
    return spark.createDataFrame(
        rows, schema="event_type string, n_events bigint, sum_value double"
    )
