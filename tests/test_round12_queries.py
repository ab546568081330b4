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
    assert all(qid % _QUERY_MOD == 0 for qid in by_q)
    recall = hits / total
    assert recall >= 0.0  # structural floor; value is data-dependent
    print(f"PQ recall@3 vs exact in-cell L2: {recall:.2f}")


# ------------------------------------------------------------ Q188 LSH
def test_ann_lsh_candidates_share_a_bucket_and_recall(spark, sf_dir):
    """Q188: every returned neighbor must collide with its query in at
    least one LSH table under the EXACT integer signature recomputed
    independently in Python (md5 signs + 6-dp micro-unit dots — if the
    engine's JVM fold disagreed with this reference even once, a
    neighbor could appear from a non-colliding bucket); ranks are
    dense and cosine-monotone; recall@3 vs the exact global cosine
    ranking is printed (data-dependent on the uniform fixture, the
    Q54 precedent)."""
    import numpy as np

    from project_map_reduce_spark.plans.similarity import (
        _LSH_H,
        _LSH_T,
        _QUERY_MOD,
        _lsh_signs,
    )
    from project_map_reduce_spark.tables import load

    res = entries()["q_ann_lsh"].fn(spark, sf_dir).collect()
    assert res
    rows = load(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    order = np.argsort(ids)
    ids = ids[order]
    vecs = np.array([[float(x) for x in r["embedding"]] for r in rows])[order]
    micro = np.round(vecs * 1e6).astype(np.int64)
    signs = np.array(
        [[_lsh_signs(t, h) for h in range(_LSH_H)] for t in range(_LSH_T)],
        dtype=np.int64,
    )  # T×H×64
    bits = (np.einsum("nd,thd->nth", micro, signs) >= 0).astype(np.int64)
    buckets = (bits << np.arange(_LSH_H)[None, None, :]).sum(axis=2)  # n×T
    pos = {int(v): i for i, v in enumerate(ids)}

    by_q: dict[int, list] = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    hits = total = 0
    for qid, got in by_q.items():
        assert qid % _QUERY_MOD == 0
        got.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
        sims = [r["cos_sim"] for r in got]
        assert sims == sorted(sims, reverse=True)
        qi = pos[qid]
        for r in got:
            ni = pos[r["neighbor_id"]]
            assert (buckets[qi] == buckets[ni]).any(), (
                f"{r['neighbor_id']} shares no bucket with {qid}"
            )
        nrm = np.linalg.norm(vecs, axis=1)
        cos = (vecs @ vecs[qi]) / (nrm * nrm[qi])
        cos[qi] = -np.inf
        exact = {int(ids[i]) for i in np.argsort(-cos, kind="stable")[:3]}
        hits += len({r["neighbor_id"] for r in got} & exact)
        total += 3
    recall = hits / total
    assert recall >= 0.0  # structural floor; value is data-dependent
    print(f"LSH recall@3 vs exact global cosine: {recall:.2f}")


# --------------------------------------------------------- Q189 skyline
def test_skyline_is_exactly_the_pareto_frontier(spark, sf_dir):
    """Q189: set-equality against an independent full recompute —
    soundness (no returned row is dominated by ANY table row) and
    completeness (every frontier row is returned, including whole
    (price, disc) tie-groups) in one check. Catches a local-sweep
    bug that phase 2 can't repair (a dropped candidate is gone for
    good) as well as over-returning."""
    import pandas as pd

    from project_map_reduce_spark.tables import load

    got = {
        (r["l_orderkey"], r["l_linenumber"])
        for r in entries()["q_skyline"].fn(spark, sf_dir).collect()
    }
    full = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
        .toPandas()
    )
    g = full.groupby("l_extendedprice", sort=True)["l_discount"].max()
    prior = g.cummax().shift(1)
    keep_prices = set(g.index[prior.isna() | (g > prior)])
    gmax = full.groupby("l_extendedprice")["l_discount"].transform("max")
    sky = full[
        (full["l_discount"] == gmax)
        & full["l_extendedprice"].isin(keep_prices)
    ]
    expect = set(zip(sky["l_orderkey"], sky["l_linenumber"]))
    assert got == expect


# ------------------------------------------------- Q190 weighted sample
def test_weighted_sample_matches_independent_recompute(spark, sf_dir):
    """Q190: the A-ES sample must equal an independent Python
    recompute of the md5-derived log-keys — same top-k doc_ids in the
    same order. Proves the content-hash uniform and the ln(u)/w key
    agree across three implementations (Spark codegen, DuckDB oracle,
    python hashlib/math), i.e. the sample is replayable anywhere."""
    import hashlib
    import math

    from project_map_reduce_spark.plans.sampling import _HEX_SPAN, _WS_K
    from project_map_reduce_spark.tables import load

    res = entries()["q_weighted_sample"].fn(spark, sf_dir).collect()
    assert len(res) == _WS_K
    keys = [r["samp_key"] for r in res]
    assert keys == sorted(keys, reverse=True)

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    scored = []
    for r in docs:
        w = len(r["text"]) + 1
        u = (
            int(hashlib.md5(r["text"].encode()).hexdigest()[:6], 16) + 0.5
        ) / _HEX_SPAN
        scored.append((round(math.log(u) / w, 9), r["doc_id"]))
    scored.sort(key=lambda t: (-t[0], t[1]))
    expect = [d for _, d in scored[:_WS_K]]
    assert [r["doc_id"] for r in res] == expect


# -------------------------------------------------------------- Q191 BM25
def test_bm25_plan_never_shuffles_the_corpus_and_agrees_with_reference(
    spark, sf_dir
):
    """Q191: the scoring pass must plan as TakeOrderedAndProject with
    no Exchange between the documents scan and the heap (the
    zero-corpus-shuffle contract); scores must match an independent
    python BM25 over the same stats."""
    import math

    from project_map_reduce_spark.plans.text_analysis import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        _BM25_TOP,
    )
    from project_map_reduce_spark.tables import load

    df = entries()["q_bm25"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # stats collected pre-plan; scan -> heap

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {r["doc_id"]: r["text"].split(" ") for r in docs}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfs = {
        t: sum(1 for tk in toks.values() if t in tk) for t in _BM25_TERMS
    }
    scored = []
    for d, tk in toks.items():
        s = 0.0
        for t in _BM25_TERMS:
            tf = tk.count(t)
            idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1)
            s += idf * (
                tf / (tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * len(tk) / avgdl))
            )
        scored.append((round(s, 6), d))
    scored.sort(key=lambda x: (-x[0], x[1]))
    expect = [(d, s) for s, d in scored[:_BM25_TOP]]
    got = [(r["doc_id"], r["bm25"]) for r in df.collect()]
    assert [g[0] for g in got] == [e[0] for e in expect]
    for (gd, gs), (ed, es) in zip(got, expect):
        assert abs(gs - es) < 1e-9, (gd, gs, es)


# ---------------------------------------------------------- Q192 PMI
def test_pmi_bigrams_reference_recompute_and_series_bound(spark, sf_dir):
    """Q192: top-20 PMI list must equal an independent python
    recompute (counts + formula + tiebreaks); and the oracle's
    constant generate_series bound (512) must dominate the longest
    fixture document — the guard the SQL comment promises."""
    import math
    from collections import Counter

    from project_map_reduce_spark.plans.text_analysis import _PMI_MIN, _PMI_TOP
    from project_map_reduce_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("text").collect()
    all_toks = [r["text"].split(" ") for r in docs]
    assert max(len(t) for t in all_toks) <= 512
    cx: Counter = Counter()
    cxy: Counter = Counter()
    for tk in all_toks:
        cx.update(tk)
        cxy.update(zip(tk, tk[1:]))
    n_tok = sum(cx.values())
    n_big = sum(cxy.values())
    scored = [
        (
            round(math.log((c * n_tok * n_tok) / (float(n_big) * cx[x] * cx[y])), 6),
            x,
            y,
            c,
        )
        for (x, y), c in cxy.items()
        if c >= _PMI_MIN
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    expect = [(x, y, c) for _, x, y, c in scored[:_PMI_TOP]]
    got = [
        (r["x"], r["y"], r["n_xy"])
        for r in entries()["q_pmi_bigrams"].fn(spark, sf_dir).collect()
    ]
    assert got == expect


# ---------------------------------------------- Q193 Markov transitions
def test_markov_rows_sum_to_one_and_match_pair_recount(spark, sf_dir):
    """Q193: per-cur probabilities must sum to 1 (row-stochastic
    matrix — the law an off-by-one in the lead() frame or a dropped
    NULL-tail pair breaks), and transition counts must equal an
    independent per-user bigram recount."""
    from collections import Counter, defaultdict

    from project_map_reduce_spark.tables import load

    res = entries()["q_markov_transitions"].fn(spark, sf_dir).collect()
    by_cur: dict[str, float] = defaultdict(float)
    for r in res:
        by_cur[r["cur"]] += r["p_trans"]
    for cur, total in by_cur.items():
        assert abs(total - 1.0) < 1e-4, (cur, total)

    ev = (
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    seqs: dict[int, list] = defaultdict(list)
    for r in ev:
        seqs[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    pairs: Counter = Counter()
    for s in seqs.values():
        s.sort()
        types = [t for _, _, t in s]
        pairs.update(zip(types, types[1:]))
    got = {(r["cur"], r["nxt"]): r["n_trans"] for r in res}
    assert got == dict(pairs)


# ------------------------------------------------- Q194 MAD outliers
def test_anomaly_mad_is_masking_resistant_vs_sigma(spark, sf_dir):
    """Q194 vs Q83 on a synthetic masking scenario: one extreme point
    inflates sigma enough that the mean/sigma gate under-flags a
    second, moderate outlier, while the median/MAD gate still flags
    both — the robustness property that justifies the second pass.
    Built from a literal frame so the law is data-independent."""
    import statistics

    vals = [10.0] * 40 + [12.0] * 40 + [40.0, 1000.0]
    med = statistics.median(vals)
    mad = statistics.median([abs(v - med) for v in vals])
    mu = statistics.mean(vals)
    sigma = statistics.pstdev(vals)
    mad_flags = sum(1 for v in vals if abs(0.6745 * (v - med) / mad) > 3.5)
    z_flags = sum(1 for v in vals if abs((v - mu) / sigma) > 3.0)
    assert mad_flags >= 2  # both 40.0 and 1000.0
    assert z_flags <= 1  # sigma inflated by 1000.0 masks 40.0
