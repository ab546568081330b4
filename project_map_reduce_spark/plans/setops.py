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


@register(
    "q_union_by_name",
    oracle="""
    SELECT CAST(event_id % 3 AS BIGINT) AS generation,
           CAST(count(*) AS BIGINT)     AS n_rows,
           CAST(count(CASE WHEN event_id % 3 <> 0 THEN event_type END)
                AS BIGINT)              AS n_with_type,
           CAST(count(CASE WHEN event_id % 3 = 2 THEN user_id END)
                AS BIGINT)              AS n_with_user,
           CAST(count(CASE WHEN event_id % 3 = 2 THEN props END)
                AS BIGINT)              AS n_with_props,
           CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q155: SCHEMA-DRIFT union — ``unionByName(allowMissingColumns=
    True)``, the merge every long-lived ingest pipeline needs when
    batch generations disagree on column ORDER and PRESENCE (Q126
    reads drifted PARQUET; this is the in-plan relational form).
    Three generations are derived from events (``event_id % 3``):
    gen 0 the minimal legacy shape ``(event_id, value)``, gen 1 adds
    ``event_type`` FIRST (different order — positional union would
    misalign it under a bigint column), gen 2 the full modern shape
    with ``user_id`` and ``props``. The by-NAME union aligns columns
    and null-fills the gaps; the aggregate counts non-null presence
    per generation, so a misaligned column, a dropped generation, or
    a wrongly-null-filled field breaks the hash. The positional-union
    failure mode is pinned by a canary test (same-width different-
    order frames: silent column mixing where types collide, an
    AnalysisException where they don't).

    Scale shape: union is plan-level (no data movement — the three
    legs scan in parallel into the same exchange); the null-fill is a
    zero-cost projection. At 100 TB this is how N years of drifted
    batches aggregate in one pass without a rewrite-to-latest-schema
    job first.
    """
    ev = load(spark, sf_dir, "events")
    gen = F.col("event_id") % 3
    g0 = ev.where(gen == 0).select("event_id", "value")
    g1 = ev.where(gen == 1).select("event_type", "event_id", "value")
    g2 = ev.where(gen == 2).select(
        "user_id", "value", "event_id", "event_type", "props"
    )
    merged = g0.unionByName(g1, allowMissingColumns=True).unionByName(
        g2, allowMissingColumns=True
    )
    from project_map_reduce_spark.functions.det import sum6

    return (
        merged.groupBy((F.col("event_id") % 3).alias("generation"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("event_type").alias("n_with_type"),
            F.count("user_id").alias("n_with_user"),
            F.count("props").alias("n_with_props"),
            sum6("value").alias("sum_value"),
        )
    )


@register(
    "q_setops_all",
    oracle="""
    WITH a AS (
        SELECT o_orderkey % 500 AS v FROM orders
        WHERE o_orderpriority = '1-URGENT'
    ),
    b AS (
        SELECT o_orderkey % 500 AS v FROM orders
        WHERE o_orderpriority = '5-LOW'
    )
    SELECT 'intersect_all' AS op, v FROM (
        SELECT v FROM a INTERSECT ALL SELECT v FROM b
    )
    UNION ALL
    SELECT 'except_all' AS op, v FROM (
        SELECT v FROM a EXCEPT ALL SELECT v FROM b
    )
    """,
)
def q_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q183: MULTISET set operations — ``intersectAll`` / ``exceptAll``
    (SQL INTERSECT ALL / EXCEPT ALL), the bag-semantics half the
    B.7 family lacked (Q31/Q32 are the DISTINCT forms): the inputs
    carry real duplicates (orderkey mod 500 per priority class), and
    the ALL forms must keep min(m, n) copies in the intersection and
    max(0, m - n) copies in the difference — semantics a
    distinct-then-join emulation silently collapses, which is exactly
    what the raw multiset output hash catches (the driver's value
    hash counts duplicate rows).

    Scale shape: both compile to one hash exchange per side with a
    count-matching join underneath (no global distinct) — same
    shuffle budget as the DISTINCT forms, the multiplicity bookkeeping
    rides the aggregation.
    """
    o = load(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        (F.col("o_orderkey") % 500).alias("v")
    )
    b = o.where(F.col("o_orderpriority") == "5-LOW").select(
        (F.col("o_orderkey") % 500).alias("v")
    )
    return a.intersectAll(b).select(
        F.lit("intersect_all").alias("op"), "v"
    ).unionAll(
        a.exceptAll(b).select(F.lit("except_all").alias("op"), "v")
    )
