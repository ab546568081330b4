"""Structured Streaming wiring (SURVEY.md §2 B.9).

The transforms in :mod:`project_map_reduce_spark.streaming.transforms`
are written once against the unified DataFrame API and run unchanged
over batch DataFrames (DuckDB-checkable, plans/streaming_shaped.py) and
``readStream`` sources (tests/test_streaming.py smoke).
"""
