"""Scalar-function helpers shared across query plans."""

from project_map_reduce_spark.functions.det import r6, r6d  # noqa: F401
