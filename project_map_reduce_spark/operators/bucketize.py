"""Sketch-based quantile bucketing — the 100 TB form of ntile.

``ntile(k) OVER (ORDER BY x)`` needs a single global sort partition:
every row flows through one reducer, which is exactly the
serialization the plan audit forbids elsewhere. The scale form
(declared in Q82's docstring; implemented here) is:

1. one ``approx_percentile(x, [1/k .. (k-1)/k])`` aggregate — a
   fixed-size mergeable sketch (Greenwald-Khanna), ordinary
   partial+final agg, output k-1 doubles;
2. collect those k-1 boundaries to the driver (O(k), not O(rows)) and
   bake them into the plan as literals;
3. assign ``bucket = 1 + #boundaries < x`` as a pure narrow projection
   — shuffle-free, rides the scan.

Trade: boundaries are rank-approximate (sketch accuracy), and ties at
a boundary all land in one bucket (value-based, not row-split like
ntile) — so bucket populations are near-equal rather than exactly
balanced. That is the standard contract of distributed quantile
bucketing (Spark ml's QuantileDiscretizer makes the same trade).

Reference analog: none — the reference cannot rank at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantile_boundaries(
    df: DataFrame, col: str, k: int, *, accuracy: int = 10000
) -> list[float]:
    """k-1 approximate quantile boundaries of ``df[col]`` from one
    sketch aggregate (no sort, no window)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    qs = [i / k for i in range(1, k)]
    row = df.select(
        F.percentile_approx(col, qs, accuracy).alias("__b")
    ).first()
    return [float(x) for x in row["__b"]]


def bucket_by_boundaries(col: str | Column, boundaries: list[float]) -> Column:
    """1-based bucket index of ``col`` against sorted literal
    boundaries: bucket = 1 + count(boundaries strictly below value).
    Pure codegen projection (chained WHEN comparisons) — shuffle-free."""
    c = F.col(col) if isinstance(col, str) else col
    b = F.lit(1)
    for x in boundaries:
        b = b + F.when(c > F.lit(x), 1).otherwise(0)
    return b


def bucketize(
    df: DataFrame, col: str, k: int, *, out: str = "bucket", accuracy: int = 10000
) -> DataFrame:
    """Sketch-then-assign quantile bucketing of ``df[col]`` into k
    near-equal buckets. Two jobs: one sketch aggregate (O(k) result to
    the driver), then a narrow map — never a global sort."""
    return df.withColumn(
        out, bucket_by_boundaries(col, quantile_boundaries(df, col, k, accuracy=accuracy))
    )
