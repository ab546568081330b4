"""operators/packing.py — the (lang, hash-prefix) scale form of Q81
must reproduce the single-window packing EXACTLY (same running totals,
same bin ids), because prefix-range partitioning of the md5 hex space
preserves the global (h, doc_id) order within each language."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from project_map_reduce_spark.operators.packing import (
    pack_bins,
    packed_running_total,
)
from project_map_reduce_spark.plans.packing import (
    _PACK_CAPACITY,
    q_pack_sequences,
)
from project_map_reduce_spark.tables import load


def _toks(spark, sf_dir):
    return load(spark, sf_dir, "documents").select(
        "lang",
        "doc_id",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )


def _single_window_cum(toks):
    w = (
        Window.partitionBy("lang")
        .orderBy(F.asc_nulls_last("h"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return toks.select(
        "lang",
        "doc_id",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("cum_before"),
    )


@pytest.mark.parametrize("prefix_chars", [1, 2])
def test_running_totals_match_single_window(spark, sf_dir, prefix_chars):
    """Per-ROW equivalence: the prefix-partitioned running total equals
    the whole-language window's, for 16- and 256-way fan-out."""
    toks = _toks(spark, sf_dir)
    want = {
        (r["lang"], r["doc_id"]): r["cum_before"]
        for r in _single_window_cum(toks).collect()
    }
    got = {
        (r["lang"], r["doc_id"]): r["cum_before"]
        for r in packed_running_total(
            toks, prefix_chars=prefix_chars
        ).select("lang", "doc_id", "cum_before").collect()
    }
    assert got == want


def test_pack_bins_match_declared_query(spark, sf_dir):
    """Aggregate equivalence: binning the scale form's assignments
    reproduces q_pack_sequences' (lang, bin_id, n_docs, bin_tokens)
    rows exactly."""
    want = sorted(
        (r["lang"], r["bin_id"], r["n_docs"], r["bin_tokens"])
        for r in q_pack_sequences(spark, sf_dir).collect()
    )
    got = sorted(
        (r["lang"], r["bin_id"], r["n_docs"], r["bin_tokens"])
        for r in pack_bins(_toks(spark, sf_dir), _PACK_CAPACITY)
        .groupBy("lang", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
        .collect()
    )
    assert got == want


def test_null_hash_rows_pack_last(spark):
    """A NULL hash (NULL text) must land AFTER every real hash in its
    language — the sentinel '~' prefix partition — matching Q81's
    pinned NULLS LAST order."""
    df = spark.createDataFrame(
        [
            ("en", 1, "00aa", 10),
            ("en", 2, "ffee", 20),
            ("en", 3, None, 30),
        ],
        "lang STRING, doc_id BIGINT, h STRING, n_tokens BIGINT",
    )
    cum = {
        r["doc_id"]: r["cum_before"]
        for r in packed_running_total(df).collect()
    }
    assert cum == {1: 0, 2: 10, 3: 30}


def test_scale_window_partitions_by_prefix(spark, sf_dir):
    """The wide shuffle is keyed on (lang, prefix), not lang alone:
    more than one sort partition exists per language (the whole point
    of the scale form)."""
    toks = _toks(spark, sf_dir)
    parts = (
        toks.withColumn("__pre", F.substring("h", 1, 1))
        .groupBy("lang", "__pre")
        .count()
    )
    n_langs = toks.select("lang").distinct().count()
    assert parts.count() > n_langs
