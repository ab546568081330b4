"""Fixture-table access.

The driver pre-generates ten parquet tables per scale factor
(TESTDATA.md / FIXTURES.md). All queries load through here so that the
scan layer is one place: a parquet relation with Catalyst predicate
pushdown and column pruning. At cluster scale the same loader would
point at a partitioned table root; nothing else in the engine changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet (FIXTURES.md). A vanilla
        # SparkSession rejects that physical type (PARQUET_TYPE_ILLEGAL),
        # so opt in to the legacy long-nanos read here — the conf is
        # runtime-settable, and setting it in the loader means any caller's
        # session (driver, tests, notebooks) can read the table.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # Truncate long nanos to µs TimestampType — byte-identical to
        # DuckDB's µs view.
        ts_field = df.schema["ts"]
        if ts_field.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> None:
    """Register fixture tables as temp views (for spark.sql queries).

    Pass ``tables=`` to register only what the query reads — loading all ten
    tables for a one-table SQL query couples it to every fixture's health
    (and at cluster scale, to every table's metadata round-trip).
    """
    for name in tables:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
