"""Property tests for the round-3 queries (Q76-Q83) — invariants the
oracle hash can't express: conservation laws, partition properties, and
inverse relationships between operators.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_map_reduce_spark.registry import entries
from project_map_reduce_spark.tables import load


def run(spark, sf_dir, name):
    return entries()[name].fn(spark, sf_dir)


def test_pack_conserves_tokens_and_docs(spark, sf_dir):
    """Q81: packing must place every document exactly once — total
    bin_tokens equals the corpus token count and n_docs sums to the
    corpus size, per language."""
    d = load(spark, sf_dir, "documents")
    expect = {
        r["lang"]: (r["docs"], r["toks"])
        for r in d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.size(F.split("text", " "))).alias("toks"),
        )
        .collect()
    }
    packed = run(spark, sf_dir, "q_pack_sequences")
    got = {
        r["lang"]: (r["docs"], r["toks"])
        for r in packed.groupBy("lang")
        .agg(F.sum("n_docs").alias("docs"), F.sum("bin_tokens").alias("toks"))
        .collect()
    }
    assert got == expect


def test_pack_bins_are_dense_and_filled(spark, sf_dir):
    """Q81: per language, bin ids must be dense 0..n-1 (a cumsum-derived
    bin index can't skip), and a bin only closes once the running token
    count reaches its boundary: cum tokens through bin b >= (b+1)*C for
    every non-last bin (the first doc of bin b+1 had cum_before >=
    (b+1)*C by the floor definition)."""
    rows = run(spark, sf_dir, "q_pack_sequences").collect()
    by_lang: dict[str, dict[int, int]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bin_id"]] = r["bin_tokens"]
    for lang, bins in by_lang.items():
        ids = sorted(bins)
        assert ids == list(range(len(ids))), f"{lang}: sparse bin ids {ids}"
        cum = 0
        for b in ids[:-1]:
            cum += bins[b]
            assert cum >= (b + 1) * 2048, (
                f"{lang}: bin {b} closed at {cum} tokens, under capacity"
            )


def test_length_deciles_partition_corpus(spark, sf_dir):
    """Q82: deciles must partition the corpus into 10 near-equal cells
    (sizes differ by at most 1) with non-overlapping length ranges."""
    rows = sorted(
        run(spark, sf_dir, "q_length_deciles").collect(),
        key=lambda r: r["decile"],
    )
    n_total = load(spark, sf_dir, "documents").count()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    sizes = [r["n_docs"] for r in rows]
    assert sum(sizes) == n_total
    assert max(sizes) - min(sizes) <= 1
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_chars"] <= hi["min_chars"], "deciles overlap"


def test_unpivot_inverts_pivot(spark, sf_dir):
    """Q78: summing the melted counts per priority must reproduce the
    plain groupBy counts over the pivoted statuses."""
    melted = run(spark, sf_dir, "q_unpivot")
    got = {
        r["o_orderpriority"]: r["n"]
        for r in melted.groupBy("o_orderpriority")
        .agg(F.sum("n_orders").alias("n"))
        .collect()
    }
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin("F", "O", "P")
    )
    expect = {
        r["o_orderpriority"]: r["count"]
        for r in o.groupBy("o_orderpriority").count().collect()
    }
    assert got == expect


def test_minmax_by_matches_window_reference(spark, sf_dir):
    """Q77: the struct-max idiom must agree with an independent
    row_number-window implementation of arg-max/arg-min."""
    got = {
        r["c_mktsegment"]: (r["top_custkey"], r["bot_custkey"])
        for r in run(spark, sf_dir, "q_minmax_by").collect()
    }
    c = load(spark, sf_dir, "customer").withColumn(
        "a6", F.round("c_acctbal", 6)
    )
    from pyspark.sql import Window

    wt = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("a6"), F.desc("c_custkey")
    )
    wb = Window.partitionBy("c_mktsegment").orderBy(
        F.asc("a6"), F.asc("c_custkey")
    )
    ref = (
        c.withColumn("rt", F.row_number().over(wt))
        .withColumn("rb", F.row_number().over(wb))
        .filter((F.col("rt") == 1) | (F.col("rb") == 1))
    )
    tops = {
        r["c_mktsegment"]: r["c_custkey"]
        for r in ref.filter(F.col("rt") == 1).collect()
    }
    bots = {
        r["c_mktsegment"]: r["c_custkey"]
        for r in ref.filter(F.col("rb") == 1).collect()
    }
    assert got == {s: (tops[s], bots[s]) for s in got}


def test_zscore_outlier_counts_bounded(spark, sf_dir):
    """Q83: outliers are a subset of events, and by Chebyshev at most
    1/9 of any distribution sits beyond 3 population sigma."""
    rows = run(spark, sf_dir, "q_zscore_outliers").collect()
    assert rows, "no event types"
    for r in rows:
        assert 0 <= r["n_outliers"] <= r["n_events"] / 9 + 1, r
        if r["n_outliers"] > 0:
            assert r["max_abs_z"] > 3.0


def test_time_rollup_grains_are_consistent(spark, sf_dir):
    """Q80: hour cells must sum to their day subtotal, day subtotals to
    the grand total, and sentinel cells appear only at the right lvl."""
    rows = run(spark, sf_dir, "q_time_rollup").collect()
    total = [r for r in rows if r["lvl"] == 2]
    days = [r for r in rows if r["lvl"] == 1]
    hours = [r for r in rows if r["lvl"] == 0]
    assert len(total) == 1
    assert total[0]["n_events"] == sum(r["n_events"] for r in days)
    assert total[0]["n_events"] == sum(r["n_events"] for r in hours)
    by_day: dict = {}
    for r in hours:
        by_day[r["day"]] = by_day.get(r["day"], 0) + r["n_events"]
    assert by_day == {r["day"]: r["n_events"] for r in days}


def test_string_agg_is_sorted_and_complete(spark, sf_dir):
    """Q76: each region's CSV must be ascending and contain exactly
    n_nations entries."""
    for r in run(spark, sf_dir, "q_string_agg").collect():
        names = r["nations_csv"].split(",")
        assert len(names) == r["n_nations"]
        assert names == sorted(names)


def test_scalar_subquery_counts_add_up(spark, sf_dir):
    """Q79: per segment, above-average customers are a strict subset,
    and with a continuous-ish balance distribution both sides of the
    average are non-empty."""
    for r in run(spark, sf_dir, "q_scalar_subquery").collect():
        assert 0 < r["n_above_avg"] < r["n_customers"], r


@pytest.mark.parametrize(
    "name",
    [
        "q_string_agg",
        "q_minmax_by",
        "q_unpivot",
        "q_scalar_subquery",
        "q_time_rollup",
        "q_pack_sequences",
        "q_length_deciles",
        "q_zscore_outliers",
    ],
)
def test_round3_deterministic_rerun(spark, sf_dir, name):
    """Every round-3 query must return the identical row multiset when
    re-executed under a different shuffle-partition count (no
    shuffle-order or partition-count dependence — the collect_list /
    window / cumsum paths are where this bites)."""
    a = sorted(map(tuple, run(spark, sf_dir, name).collect()))
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b = sorted(map(tuple, run(spark, sf_dir, name).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b
