"""Scalar-function helpers shared across query plans."""

from project_map_reduce_spark.functions.det import SUM6, r6, r6d, sum6  # noqa: F401
