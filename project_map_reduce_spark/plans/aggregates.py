"""B.4 aggregation (Q15-Q21).

All of these compile to Catalyst's partial+final hash aggregate: the
map-side combine happens before the shuffle, so shuffle volume is
O(groups × partitions), not O(rows) — the property that makes them
survive 100 TB. No ordering is imposed (the driver hash is
order-insensitive); skipping a global sort avoids a pointless final
exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_map_reduce_spark.functions.det import r6d, sum6
from project_map_reduce_spark.registry import register
from project_map_reduce_spark.tables import load


@register(
    "q_pricing_summary",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)        AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)   AS sum_base_price,
        CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)
                                                                      AS sum_disc_price,
        CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,6))) AS DOUBLE)
                                                                      AS sum_charge,
        round(avg(l_quantity), 6)                                     AS avg_qty,
        round(avg(l_extendedprice), 6)                                AS avg_price,
        round(avg(l_discount), 6)                                     AS avg_disc,
        count(*)                                                      AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (TPC-H Q1 shape): pricing summary by returnflag/linestatus.

    Scale notes: single shuffle on a 2-column low-cardinality key after
    map-side partial aggregation; whole-stage codegen covers
    scan→project→partial-agg. The idiomatic restatement of the
    reference's gather/summary (Manager.java:287-312) — aggregation
    stays distributed instead of a driver-side concat loop.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        sum6("l_quantity").alias("sum_qty"),
        sum6("l_extendedprice").alias("sum_base_price"),
        sum6(disc_price).alias("sum_disc_price"),
        sum6(charge).alias("sum_charge"),
        r6d(F.avg("l_quantity"), "avg_qty"),
        r6d(F.avg("l_extendedprice"), "avg_price"),
        r6d(F.avg("l_discount"), "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )
