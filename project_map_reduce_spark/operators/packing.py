"""Prefix-partitioned sequence packing — the 100 TB form of Q81.

``sum() OVER (PARTITION BY lang ORDER BY h, doc_id)`` serializes every
language onto ONE reducer: at 100 TB an 80%-English corpus puts 80% of
all rows through a single sort partition. The scale form (declared in
Q81's docstring; implemented here) exploits a property of the ordering
key itself: the packing order is the content HASH, so range-partitioning
the hash space by PREFIX preserves the global order exactly —
``(prefix, h, doc_id)`` sorts identically to ``(h, doc_id)`` because the
prefix is a prefix of ``h``. That turns the global window into:

1. **Local pass** — cumulative token sums per ``(lang, prefix)``
   window: 16^chars independent sort partitions per language instead
   of one.
2. **Offset table** — per-(lang, prefix) token totals (a partial+final
   agg that reuses the local pass's partitioning), then a window over
   the TINY totals relation (langs × 16^chars rows) turns totals into
   per-prefix starting offsets.
3. **Recombine** — broadcast-join the offsets back; global running
   count = prefix offset + local cumulative sum; bin =
   ``floor(global / capacity)`` as a pure projection.

The bin assignment is BIT-IDENTICAL to the single-window form (the
equivalence test asserts it), so the trade is purely physical: one
wide shuffle keyed on (lang, prefix) whose largest partition is
~1/16^chars of the biggest language, plus an O(langs·16^chars)
side-table join. ``prefix_chars`` scales the fan-out (1 hex char → 16
partitions per language, 2 → 256, …).

NULL hashes (NULL text) sort LAST in Q81's pinned order; here they get
the sentinel prefix ``'~'`` (ASCII 0x7E, after every md5 hex char) so
they land in the final prefix partition and need no null-safe join.

Reference analog: none — see plans/packing.py module docstring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_NULL_PREFIX = "~"  # sorts after [0-9a-f]: NULL-hash rows pack last


def packed_running_total(
    df: DataFrame,
    *,
    lang_col: str = "lang",
    hash_col: str = "h",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    prefix_chars: int = 1,
    out: str = "cum_before",
) -> DataFrame:
    """Add ``out`` = tokens accumulated BEFORE each row in the global
    per-language (hash, id) packing order — computed with per-prefix
    parallelism, never a whole-language sort partition."""
    if prefix_chars < 1:
        raise ValueError("prefix_chars must be >= 1")
    pre = F.coalesce(
        F.substring(F.col(hash_col), 1, prefix_chars), F.lit(_NULL_PREFIX)
    )
    local_w = (
        Window.partitionBy(lang_col, "__pre")
        .orderBy(F.asc_nulls_last(hash_col), id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = df.withColumn("__pre", pre).withColumn(
        "__cum_local",
        F.coalesce(F.sum(tokens_col).over(local_w), F.lit(0)),
    )
    # Totals reuse the (lang, prefix) partitioning the window just
    # established; the offsets window runs over langs × 16^chars rows.
    totals = local.groupBy(lang_col, "__pre").agg(
        F.sum(tokens_col).alias("__tot")
    )
    off_w = (
        Window.partitionBy(lang_col)
        .orderBy("__pre")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        lang_col,
        "__pre",
        F.coalesce(F.sum("__tot").over(off_w), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), [lang_col, "__pre"])
        .withColumn(out, F.col("__off") + F.col("__cum_local"))
        .drop("__pre", "__cum_local", "__off")
    )


def bin_id(cum_before: str | Column, capacity: int) -> Column:
    """Q81's bin rule: ``floor(tokens-before / capacity)``."""
    c = F.col(cum_before) if isinstance(cum_before, str) else cum_before
    return F.floor(c / capacity)


def pack_bins(
    df: DataFrame,
    capacity: int,
    *,
    lang_col: str = "lang",
    hash_col: str = "h",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    prefix_chars: int = 1,
    out: str = "bin_id",
) -> DataFrame:
    """Assign each row its fixed-capacity training bin in the global
    per-language hash order, via the prefix-partitioned running total."""
    packed = packed_running_total(
        df,
        lang_col=lang_col,
        hash_col=hash_col,
        tokens_col=tokens_col,
        id_col=id_col,
        prefix_chars=prefix_chars,
        out="__cum",
    )
    return packed.withColumn(out, bin_id("__cum", capacity)).drop("__cum")
