"""B.7 set operations (Q29-Q32).

``unionByName`` is a zero-shuffle concat; distinct/intersect/except
shuffle once on the full row as key. All four oracles are plain ANSI
set SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_map_reduce_spark.registry import register
from project_map_reduce_spark.tables import load


def _hi(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 200000)
        .select("o_orderkey", "o_orderstatus")
    )


def _urgent(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderstatus")
    )


_HI = "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice >= 200000"
_URGENT = "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'"


@register(
    "q_set_union_all",
    oracle=f"{_HI} UNION ALL {_URGENT}",
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two filtered projections (duplicates preserved)."""
    return _hi(spark, sf_dir).unionByName(_urgent(spark, sf_dir))


@register(
    "q_set_union_distinct",
    oracle=f"{_HI} UNION {_URGENT}",
)
def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT — concat then one hash-distinct shuffle."""
    return _hi(spark, sf_dir).unionByName(_urgent(spark, sf_dir)).distinct()


@register(
    "q_set_intersect",
    oracle=f"{_HI} INTERSECT {_URGENT}",
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics, like the SQL operator)."""
    return _hi(spark, sf_dir).intersect(_urgent(spark, sf_dir))


@register(
    "q_set_except",
    oracle=f"{_HI} EXCEPT {_URGENT}",
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): high-value minus urgent orders.
    ``subtract`` is Spark's EXCEPT DISTINCT (``exceptAll`` would keep
    multiset leftovers — different semantics)."""
    return _hi(spark, sf_dir).subtract(_urgent(spark, sf_dir))
