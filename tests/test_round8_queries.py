"""Round-8 additions beyond the VERDICT asks: Q129 q_typo_join (lossless
deletion-neighborhood similarity join), Q130 q_kll_rollup (mergeable
quantile cube), Q131 q_heavy_hitters (frequent-items sketch). Each query
is hash-checked by the driver; these tests pin the properties the hash
can't see: blocking losslessness, plan shape, and sketch invariants."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from project_map_reduce_spark.registry import entries
from project_map_reduce_spark.tables import load


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _keys(s: str) -> set[str]:
    return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}


def test_deletion_neighborhood_blocking_is_lossless():
    """The algorithmic law Q129 rests on: ANY two distinct strings
    within edit distance 1 share a key in K(s) = {s} ∪ del1(s).
    Random substitutions/insertions/deletions over a seeded corpus —
    every within-1 pair must share a key (no false negatives); and
    sharing a key must never be blindly trusted (exists a sharing pair
    at distance 2, which the verify step prunes)."""
    rng = random.Random(8)
    alpha = "abcdefg"
    base = ["".join(rng.choice(alpha) for _ in range(rng.randint(3, 10))) for _ in range(60)]
    variants = []
    for s in base:
        i = rng.randrange(len(s))
        variants.append(s[:i] + rng.choice(alpha) + s[i:])  # insertion
        variants.append(s[:i] + s[i + 1 :])  # deletion
        variants.append(s[:i] + rng.choice(alpha) + s[i + 1 :])  # substitution
    pool = list(dict.fromkeys(base + variants))
    for a, b in itertools.combinations(pool, 2):
        if _lev(a, b) <= 1:
            assert _keys(a) & _keys(b), (a, b)
    # false candidates exist (blocking alone is not the predicate — the
    # exact-levenshtein verify step must prune them): "xa" and "ay"
    # share deletion key "a" but sit at distance 2.
    assert _keys("xa") & _keys("ay") and _lev("xa", "ay") == 2


def test_typo_join_equals_naive_quadratic(spark, sf_dir):
    """The fixture result must equal the all-pairs form computed here
    driver-side over the (small) distinct-name dictionary."""
    rows = entries()["q_typo_join"].fn(spark, sf_dir).collect()
    got = {(r.name_a, r.name_b, r.dist) for r in rows}
    names = [
        r.p_name
        for r in load(spark, sf_dir, "part").select("p_name").distinct().collect()
    ]
    want = {
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(sorted(names), 2)
        if _lev(a, b) <= 1
    }
    assert got == want
    assert all(r.n_parts_a > 0 and r.n_parts_b > 0 for r in rows)


def test_typo_join_plan_has_no_cartesian(spark, sf_dir):
    """The engine side must stay an equi-join on the neighborhood key:
    no CartesianProduct, no BroadcastNestedLoopJoin."""
    df = entries()["q_typo_join"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_kll_rollup_invariants_and_shape(spark, sf_dir):
    rows = entries()["q_kll_rollup"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 5
    for r in rows:
        assert r.merged_within_tol and r.direct_within_tol, tuple(r)
        assert r.n_days > 0


def test_kll_merged_median_matches_exact_rank(spark, sf_dir):
    """Stronger than the in-query ±5%-rank band: the merged sketch's
    median must sit within ±5% NORMALIZED RANK of 0.5 when ranked
    against the raw per-type values (checks the rank space directly,
    not just the value bracket)."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "value"
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.expr("kll_sketch_agg_double(value, 200)").alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.collect_list("sk").alias("sks")
    ).select(
        "event_type",
        F.expr(
            "kll_sketch_get_quantile_double(aggregate(slice(sks, 2,"
            " size(sks) - 1), sks[1], (acc, s) ->"
            " kll_sketch_merge_double(acc, s)), 0.5)"
        ).alias("m_est"),
    )
    ranks = (
        ev.join(merged, "event_type")
        .groupBy("event_type")
        .agg(
            (
                F.sum((F.col("value") <= F.col("m_est")).cast("long"))
                / F.count(F.lit(1))
            ).alias("rank")
        )
        .collect()
    )
    for r in ranks:
        assert 0.45 <= r.rank <= 0.55, tuple(r)


def test_heavy_hitters_true_and_ordered(spark, sf_dir):
    rows = entries()["q_heavy_hitters"].fn(spark, sf_dir).collect()
    # sf0.001 has only 4 sqrt-buckets; larger SFs fill the full top-10
    assert 0 < len(rows) <= 10
    counts = [r.n_events for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r.in_sketch_topk and r.count_within_tol, tuple(r)
    # the sqrt-bucket skew is real: the head hitter dominates the tail
    assert counts[0] > counts[-1]
