"""Contract tests for operators/bucketize.py — Q82's declared scale
path made real: sketch boundaries + shuffle-free assignment must track
the exact global-sort ntile closely, and the assignment plan must be a
pure projection."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from project_map_reduce_spark.operators.bucketize import (
    bucket_by_boundaries,
    bucketize,
    quantile_boundaries,
)
from project_map_reduce_spark.tables import load


def test_agrees_with_exact_ntile(spark, sf_dir):
    """≥95% of documents land in the same decile the exact ntile gives
    (sketch accuracy 1e-4 rank error; disagreement only at cell edges
    and among boundary ties)."""
    d = load(spark, sf_dir, "documents")
    w = Window.orderBy("n_chars", "doc_id")
    both = bucketize(d, "n_chars", 10).withColumn(
        "exact", F.ntile(10).over(w)
    )
    n = both.count()
    agree = both.filter(F.col("bucket") == F.col("exact")).count()
    assert agree / n >= 0.95, f"only {agree}/{n} agree"


def test_populations_near_equal(spark, sf_dir):
    """Every bucket holds between 50% and 200% of the ideal n/k cell
    (value ties can imbalance, but never collapse or explode a cell on
    this fixture's near-continuous lengths)."""
    d = load(spark, sf_dir, "documents")
    n = d.count()
    sizes = {
        r["bucket"]: r["count"]
        for r in bucketize(d, "n_chars", 10).groupBy("bucket").count().collect()
    }
    assert set(sizes) == set(range(1, 11))
    for b, s in sizes.items():
        assert 0.5 * n / 10 <= s <= 2.0 * n / 10, (b, s, n)


def test_assignment_is_shuffle_free(spark, sf_dir):
    """The assignment stage must plan as scan + project only — no
    Exchange, no Sort, no Window (the whole point vs ntile)."""
    d = load(spark, sf_dir, "documents")
    bounds = quantile_boundaries(d, "n_chars", 10)
    assigned = d.withColumn("bucket", bucket_by_boundaries("n_chars", bounds))
    plan = spark._jvm.PythonSQLUtils.explainString(
        assigned._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan
    assert "Window" not in plan, plan
    assert "Sort" not in plan, plan


def test_monotone_and_total(spark, sf_dir):
    """Bucket index is monotone in the bucketed value and covers every
    row exactly once (no NULL buckets for non-NULL inputs)."""
    d = load(spark, sf_dir, "documents")
    b = bucketize(d, "n_chars", 4)
    assert b.filter(F.col("bucket").isNull()).count() == 0
    pairs = (
        b.groupBy("bucket")
        .agg(F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi"))
        .orderBy("bucket")
        .collect()
    )
    for a, c in zip(pairs, pairs[1:]):
        assert a["hi"] <= c["lo"], (a, c)


def test_k_validation():
    with pytest.raises(ValueError):
        quantile_boundaries(None, "x", 1)  # k < 2 rejected before any Spark work
