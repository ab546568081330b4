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
