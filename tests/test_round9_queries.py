"""Round-9 queries: Q132 q_source_roundtrip (text/CSV/JSON sources,
hash-checked), Q133 q_bloom_prune (parquet row-group bloom filters).

Beyond the oracle sweep (tests/test_oracle_parity.py covers the full
inventory), these pin the properties that make each query's raises
meaningful: the bloom audit must FAIL on a bloom-less layout and its
stats counterfactual must trip on a layout where min/max would already
skip; the round-trip's microsecond canary must actually detect a
precision-truncating format.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_map_reduce_spark.registry import entries
from project_map_reduce_spark.tables import load


# ---------------------------------------------------------------- Q132


def test_source_roundtrip_shape(spark, sf_dir):
    rows = entries()["q_source_roundtrip"].fn(spark, sf_dir).collect()
    by_fmt = {}
    for r in rows:
        by_fmt.setdefault(r["fmt"], []).append(r)
    assert set(by_fmt) == {"csv", "json", "text", "orc"}
    # The four format legs aggregate the SAME slice — their per-type
    # rows must be identical (the oracle checks each against parquet;
    # this checks them against each other without DuckDB in the loop).
    def key(recs):
        return sorted(
            (r["event_type"], r["n_events"], r["n_users"], r["sum_value"],
             r["micros_sum"], r["n_props"])
            for r in recs
        )

    assert (
        key(by_fmt["csv"])
        == key(by_fmt["json"])
        == key(by_fmt["text"])
        == key(by_fmt["orc"])
    )


def test_micros_canary_detects_truncating_format(spark, sf_dir, tmp_path):
    """The round-trip's timestamp check is a real canary: a
    writer/reader pair that consistently uses a seconds-only format
    round-trips 'successfully' but silently drops every microsecond —
    the canary (sum of sub-second micros) must read 0 for that pair
    and >0 for the query's full-precision format, so the truncating
    pair cannot hash-match the oracle. (A mismatched reader-only
    truncation is caught even harder: PERMISSIVE CSV parsing nulls the
    column, zeroing row counts.)"""
    from project_map_reduce_spark.plans.scans import _RT_SCHEMA, _RT_TS_FMT

    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .where(F.col("event_id") % 10 == 0)
    )
    n_slice = ev.count()

    def roundtrip(tag: str, fmt: str):
        path = str(tmp_path / tag)
        ev.write.option("header", True).option(
            "timestampNTZFormat", fmt
        ).csv(path)
        back = (
            spark.read.schema(_RT_SCHEMA)
            .option("header", True)
            .option("timestampNTZFormat", fmt)
            .csv(path)
        )
        r = back.agg(
            F.sum(
                F.unix_micros(F.col("ts").cast("timestamp_ltz")) % 1000000
            ).alias("m"),
            F.count("ts").alias("n"),
        ).collect()[0]
        return r["m"], r["n"]

    full, n_full = roundtrip("full", _RT_TS_FMT)
    truncated, n_trunc = roundtrip("trunc", "yyyy-MM-dd HH:mm:ss")
    assert n_full == n_trunc == n_slice  # both pairs "succeed"...
    assert full > 0
    assert truncated == 0  # ...but the truncating pair fails the canary


# ---------------------------------------------------------------- Q133


def _keyed(spark, sf_dir):
    return (
        load(spark, sf_dir, "events")
        .select(F.xxhash64("event_id").alias("key"), "event_type", "value")
    )


def _hashed_keys(spark, sf_dir) -> list[int]:
    n = load(spark, sf_dir, "events").count()
    step = n // 8
    ids = [(i * step + 7,) for i in range(8)]
    return [
        r["key"]
        for r in spark.createDataFrame(ids, "event_id long")
        .select(F.xxhash64("event_id").alias("key"))
        .collect()
    ]


def test_bloomless_layout_fails_the_audit(spark, sf_dir, tmp_path):
    """The counterfactual that makes the audit meaningful: the SAME
    keyed data written WITHOUT bloom filters must fail the footer
    check — otherwise the query would 'prove' a lever that isn't
    there."""
    from project_map_reduce_spark.plans.scans import _audit_bloom_skipping

    keys = _hashed_keys(spark, sf_dir)
    plain = str(tmp_path / "plain")
    _keyed(spark, sf_dir).repartition(8).write.parquet(plain)
    with pytest.raises(RuntimeError, match="carry a bloom filter"):
        _audit_bloom_skipping(spark, plain, keys)


def test_sorted_layout_trips_the_stats_counterfactual(spark, sf_dir, tmp_path):
    """Guard liveness for the OTHER raise: if the layout is sorted by
    key, min/max statistics already skip almost every row group and
    the audit must refuse — blooms would not be what's being measured.
    (This is why the query writes in natural order.)"""
    from project_map_reduce_spark.plans.scans import _audit_bloom_skipping

    keys = _hashed_keys(spark, sf_dir)
    sorted_dir = str(tmp_path / "sorted")
    (
        _keyed(spark, sf_dir)
        .repartitionByRange(8, "key")
        .sortWithinPartitions("key")
        .write.option("parquet.bloom.filter.enabled#key", "true")
        .parquet(sorted_dir)
    )
    with pytest.raises(RuntimeError, match="counterfactual broke"):
        _audit_bloom_skipping(spark, sorted_dir, keys)


def test_bloom_query_returns_the_eight_needles(spark, sf_dir):
    rows = entries()["q_bloom_prune"].fn(spark, sf_dir).collect()
    assert sum(r["n_events"] for r in rows) == 8
    assert {r["event_type"] for r in rows} <= {
        "click", "view", "purchase", "signup", "error"
    }


# ---------------------------------------------------------------- Q136


def test_dpp_guard_liveness_and_equivalence(spark, sf_dir, tmp_path):
    """The counterfactual that makes Q136's raise meaningful: the SAME
    star join with the DPP optimizer rule force-disabled must carry no
    dynamicpruningexpression (the guard raises), while returning the
    identical rows — proving the guard detects exactly the optimization,
    not some side effect of the data."""
    from project_map_reduce_spark.plans.scans import _assert_dynamic_pruning

    ev = load(spark, sf_dir, "events").select(
        "event_type", "value", F.to_date("ts").alias("event_date")
    )
    ev.repartition("event_date").write.partitionBy("event_date").parquet(
        str(tmp_path / "fact")
    )
    ev.select("event_date").distinct().withColumn(
        "weekday", F.weekday("event_date")
    ).write.parquet(str(tmp_path / "dim"))

    def star_agg():
        fact = spark.read.parquet(str(tmp_path / "fact"))
        weekend = (
            spark.read.parquet(str(tmp_path / "dim"))
            .where(F.col("weekday") >= 5)
            .select("event_date")
        )
        return (
            fact.join(weekend, "event_date")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )

    key = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "true")
        pruned = star_agg()
        _assert_dynamic_pruning(pruned)  # must not raise
        want = sorted(tuple(r) for r in pruned.collect())

        spark.conf.set(key, "false")
        unpruned = star_agg()
        with pytest.raises(RuntimeError, match="dynamic partition pruning"):
            _assert_dynamic_pruning(unpruned)
        assert sorted(tuple(r) for r in unpruned.collect()) == want
    finally:
        spark.conf.set(key, prev)
