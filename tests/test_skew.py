"""Equivalence tests for the skew-mitigation operators (operators/skew.py).

Salting must be invisible in the result: on any input — here a
deliberately skewed one (90% of rows on one hot key) — the salted
two-phase aggregate and the salted join must return exactly what the
plain groupBy / join return.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_map_reduce_spark.operators.skew import salted_groupby_agg, salted_join


@pytest.fixture(scope="module")
def skewed_df(spark):
    # key 0 is hot: 900 of 1000 rows.
    rows = [(0 if i % 10 != 0 else 1 + (i // 10) % 5, float(i)) for i in range(1000)]
    return spark.createDataFrame(rows, "k int, v double")


def _sorted(rows):
    return sorted(tuple(r) for r in rows)


def test_salted_agg_equals_plain(spark, skewed_df):
    plain = skewed_df.groupBy("k").agg(
        F.sum("v").alias("sum_v"),
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    salted = salted_groupby_agg(
        skewed_df,
        ["k"],
        {
            "sum_v": ("v", "sum"),
            "n": ("v", "count"),
            "min_v": ("v", "min"),
            "max_v": ("v", "max"),
        },
        n_salt=8,
    )
    assert _sorted(salted.collect()) == _sorted(plain.collect())


def test_salted_agg_rejects_nondecomposable(skewed_df):
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_groupby_agg(skewed_df, ["k"], {"a": ("v", "avg")})


def test_salted_join_equals_plain(spark, skewed_df):
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(6)], "k int, name string"
    )
    plain = skewed_df.join(dim, on=["k"], how="inner")
    salted = salted_join(skewed_df, dim, on=["k"], n_salt=8)
    assert salted.columns == plain.columns
    assert _sorted(salted.collect()) == _sorted(plain.collect())


def test_salted_join_rejects_right_and_full(spark, skewed_df):
    """right/full joins would duplicate unmatched small-side rows once
    per salt replica — the operator must refuse them loudly."""
    dim = spark.createDataFrame([(0, "x")], "k int, name string")
    for how in ("right", "rightouter", "right_outer", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(skewed_df, dim, on=["k"], how=how)


def test_salted_agg_count_null_semantics(spark):
    """'count' on a column counts non-nulls (SQL count(col)); column '*'
    gives count(*) — both must match the plain aggregate exactly."""
    df = spark.createDataFrame(
        [(1, 1.0), (1, None), (2, None), (2, 3.0), (2, 4.0)], "k int, v double"
    )
    plain = df.groupBy("k").agg(
        F.count("v").alias("n_v"), F.count(F.lit(1)).alias("n_all")
    )
    salted = salted_groupby_agg(
        df, ["k"], {"n_v": ("v", "count"), "n_all": ("*", "count")}, n_salt=4
    )
    assert _sorted(salted.collect()) == _sorted(plain.collect())


def test_salt_spreads_hot_key_across_shuffle_keys(spark, skewed_df):
    """The point of the salt: the hot key's rows must spread over many
    distinct (key, salt) shuffle keys. (Post-shuffle partition ids are
    not observable here — AQE coalesces this toy-sized exchange back to
    one partition — so assert on the shuffle keys themselves.)"""
    salted = skewed_df.withColumn(
        "s", F.pmod(F.hash(*[F.col(c) for c in skewed_df.columns]), F.lit(8))
    )
    hot_salts = salted.filter(F.col("k") == 0).select("s").distinct().count()
    assert hot_salts > 1, "hot key still collapsed onto one shuffle key"
