"""B.5 window functions (Q22-Q25).

One shuffle on the partition key + a per-partition sort each; no global
sort anywhere. Every orderBy carries a unique tiebreaker (determinism
convention) so rank/lag/frame contents are reproducible across engines
and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_map_reduce_spark.functions.det import r6d
from project_map_reduce_spark.registry import register
from project_map_reduce_spark.tables import load


@register(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           row_number() OVER w AS rn
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number of orders within customer."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
    )


@register(
    "q_window_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts,
           round(value, 6) AS value,
           round(lag(value)  OVER w, 6) AS prev_value,
           round(lead(value) OVER w, 6) AS next_value,
           round(value - lag(value) OVER w, 6) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user previous/next event value and delta."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        r6d(F.col("value"), "value"),
        r6d(F.lag("value").over(w), "prev_value"),
        r6d(F.lead("value").over(w), "next_value"),
        r6d(F.col("value") - F.lag("value").over(w), "delta"),
    )


@register(
    "q_window_moving",
    oracle="""
    SELECT event_id, user_id, ts,
           round(avg(value) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 6) AS moving_avg_3
    FROM events
    """,
)
def q_window_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average of event value per user."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        r6d(F.avg("value").over(w), "moving_avg_3"),
    )


@register(
    "q_window_range",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 6) AS running_total
    FROM orders
    """,
)
def q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total of order value per customer over order date."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        r6d(F.sum("o_totalprice").over(w), "running_total"),
    )


@register(
    "q_window_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round(c_acctbal, 6) AS acctbal,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cum_dist,
           round(first_value(c_acctbal) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                 AND UNBOUNDED FOLLOWING), 6) AS seg_min,
           round(last_value(c_acctbal)  OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                 AND UNBOUNDED FOLLOWING), 6) AS seg_max
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q71: distribution window functions — quartile bucket (ntile),
    percent_rank, cume_dist, and the segment min/max via first/last
    value over the full-frame — of account balance within market
    segment. The orderBy carries the unique c_custkey tiebreaker
    (determinism convention), so rank-derived fractions are identical
    across engines even where balances tie.

    Same physical shape as the rest of the family: ONE hash exchange on
    the partition key, one per-partition sort shared by all five
    functions (Catalyst collapses same-window expressions into a single
    Window operator) — no per-function re-shuffle."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        r6d(F.col("c_acctbal"), "acctbal"),
        F.ntile(4).over(w).alias("quartile"),
        r6d(F.percent_rank().over(w), "pct_rank"),
        r6d(F.cume_dist().over(w), "cum_dist"),
        r6d(F.first("c_acctbal").over(wf), "seg_min"),
        r6d(F.last("c_acctbal").over(wf), "seg_max"),
    )
