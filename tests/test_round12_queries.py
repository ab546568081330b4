"""Round-12 additions: engine-side invariants the DuckDB oracle sweep
can't see (plan shapes, continuation algebra, PQ recall)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_map_reduce_spark.registry import entries
from project_map_reduce_spark.tables import load


# ------------------------------------------------------ Q186 keyset page
def test_keyset_page_is_the_true_continuation(spark, sf_dir):
    """Q186: the keyset page must be EXACTLY the next 20 rows of the
    global (c_acctbal DESC, c_custkey) ordering after the continuation
    token — i.e. identical to what an offset-based reader that had
    already consumed everything at-or-before the token would return.
    An off-by-one in the boundary predicate (>= for >, or a dropped
    equal-balance arm) shifts the page head."""
    from project_map_reduce_spark.plans.sort_topk import (
        _KEYSET_BAL,
        _KEYSET_KEY,
        _KEYSET_PAGE,
    )

    c = load(spark, sf_dir, "customer")
    full = (
        c.select("c_custkey", "c_mktsegment", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .collect()
    )
    after_token = [
        r
        for r in full
        if r["c_acctbal"] < _KEYSET_BAL
        or (r["c_acctbal"] == _KEYSET_BAL and r["c_custkey"] > _KEYSET_KEY)
    ]
    expect = [(r["c_custkey"], r["c_acctbal"]) for r in after_token[:_KEYSET_PAGE]]
    got = [
        (r["c_custkey"], r["c_acctbal"])
        for r in entries()["q_keyset_page"].fn(spark, sf_dir).collect()
    ]
    assert got == expect


def test_keyset_page_plan_has_no_offset_and_pushes_the_predicate(spark, sf_dir):
    """Q186's O(page) claim is two plan properties: the continuation
    predicate reaches the parquet scan (PushedFilters carries the
    acctbal Or-filter, so row-group stats prune above-token groups)
    and the sort+limit fuses to TakeOrderedAndProject with no Offset
    operator. The query itself raises on regression (Q96 discipline);
    this test pins the positive shape so a silent relaxation of the
    in-plan assert is also caught."""
    df = entries()["q_keyset_page"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Offset" not in plan
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "c_acctbal" in pushed and "Or" in pushed
