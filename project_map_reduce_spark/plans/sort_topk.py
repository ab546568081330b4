"""B.6 sort / limit / top-k (Q26-Q28).

``orderBy().limit(k)`` compiles to TakeOrderedAndProject: each
partition keeps a k-row heap, the driver merges partition heaps — no
global sort, no full-result shuffle. That is the 100 TB-safe top-k.
Per-group top-k uses a window rank + filter: one shuffle on the group
key, per-group sort only.
Every ordering carries a unique tiebreaker (o_orderkey) per the
determinism convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_map_reduce_spark.registry import register
from project_map_reduce_spark.tables import load


@register(
    "q_topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 orders by totalprice (TakeOrderedAndProject)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@register(
    "q_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC
               ) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: window row_number + filter. AQE can
    push the rank filter into the sort (WindowGroupLimit) so each group
    materializes only 3 rows."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key mixed-direction sort, first 100 rows deterministically."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
        .orderBy(
            F.col("o_orderstatus").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


@register(
    "q_limit_offset",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 20 OFFSET 40
    """,
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q184: LIMIT/OFFSET pagination (Spark 3.4+ ``DataFrame.offset``) —
    page 3 of the deterministic balance ranking (unique-key tiebreak,
    the B.6 convention). The hash checks the exact page boundary: an
    off-by-one in the skip, or an engine that applies offset before
    the sort, shifts every row.

    Scale shape: Catalyst folds this to a single GlobalLimit(60) over
    TakeOrdered partial limits — each partition ships at most
    offset+limit rows, so the cost grows with the PAGE DEPTH, not the
    table. That is also the documented trap: page N costs O(N·page)
    — deep pagination at 100 TB uses keyset continuation
    (WHERE (bal, key) < last_seen ORDER BY ... LIMIT page), which
    stays O(page) at any depth; this query pins the offset semantics
    the keyset form replaces.
    """
    c = load(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_mktsegment", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .offset(40)
        .limit(20)
    )


# Deterministic continuation token for Q186 — in production this is the
# (sort-key, unique-key) pair of the LAST row of the previous page,
# carried by the client; a fixed token makes the page hash-checkable.
_KEYSET_BAL = 5000.0
_KEYSET_KEY = 750
_KEYSET_PAGE = 20


@register(
    "q_keyset_page",
    oracle=f"""
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_acctbal < {_KEYSET_BAL}
       OR (c_acctbal = {_KEYSET_BAL} AND c_custkey > {_KEYSET_KEY})
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT {_KEYSET_PAGE}
    """,
)
def q_keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q186: keyset (seek-method) pagination — the 100 TB twin Q184's
    docstring promises. OFFSET pagination costs O(depth·page) because
    every partition must ship offset+limit rows; the keyset form turns
    the continuation into a PREDICATE on the ordered key pair — the
    next page after last-seen (bal, key) under ORDER BY bal DESC, key
    ASC is ``bal < last_bal OR (bal = last_bal AND key > last_key)`` —
    so page N costs exactly what page 1 costs at any depth. Reference
    anchor: the same line-wise report pagination LocalApp.java:302-343
    renders by re-scanning from an offset; the keyset form is what
    that report does when the report is 100 TB.

    Plan-asserted scan-bounded (raise-on-regress, the Q96 discipline):
    the continuation predicate must reach the parquet scan as a pushed
    filter (an Or of range/point filters — row groups whose acctbal
    stats sit entirely above the token are never read), and the
    sort+limit must fuse to TakeOrderedAndProject (per-partition
    page-size-row heaps, driver merge) with NO Offset operator
    anywhere — the two properties that make the cost O(page), not
    O(depth·page)."""
    c = load(spark, sf_dir, "customer")
    page = (
        c.select("c_custkey", "c_mktsegment", "c_acctbal")
        .filter(
            (F.col("c_acctbal") < _KEYSET_BAL)
            | (
                (F.col("c_acctbal") == _KEYSET_BAL)
                & (F.col("c_custkey") > _KEYSET_KEY)
            )
        )
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(_KEYSET_PAGE)
    )
    plan = page._jdf.queryExecution().executedPlan().toString()
    if (
        "PushedFilters" not in plan  # scan stopped printing the section
        or "PushedFilters: []" in plan
        or "c_acctbal" not in plan.split("PushedFilters")[1].split("]")[0]
    ):
        raise RuntimeError(f"keyset predicate not pushed to scan:\n{plan}")
    if "TakeOrderedAndProject" not in plan or "Offset" in plan:
        raise RuntimeError(f"keyset page lost the O(page) plan shape:\n{plan}")
    return page
