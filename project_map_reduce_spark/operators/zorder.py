"""Z-order (Morton) multi-column clustering for data-skipping layouts.

Q124 (`q_cluster_prune`) proves SINGLE-column range clustering: sort the
table on `ts` and every parquet footer's per-row-group min/max on `ts`
is tight, so a pushed time predicate skips row groups. But a linear
range layout helps exactly one column — a second filter column
(`user_id`) is shuffled randomly across that layout, its per-group
[min, max] spans the whole domain, and a user-only (or user+time) query
skips nothing on it. Real lakes filter on two or more columns; the
standard fix (Delta `OPTIMIZE ZORDER BY`, Iceberg `rewrite_data_files`
with a z-order strategy — both public designs, rebuilt here from the
bit-interleaving definition) is to sort on the MORTON CODE of the
columns: each column is mapped to a 16-bit rank and the bits are
interleaved, so z-adjacent rows are close in EVERY dimension and each
file's bounding box covers ~(1/n_files)^(1/k) of each of the k domains
instead of all of them.

Everything here is JVM-side whole-stage-codegen arithmetic — shift,
mask, OR on longs (the classic bit-spread magic numbers) — no UDF, no
Python in the hot path. The only driver crossing a caller needs is an
O(1) min/max aggregate per clustered column to fix the rank scale
(`column_bounds`); at 100 TB those bounds come from table metadata or
the catalog instead, and the write itself is one range shuffle — the
same cost as the single-column layout Q124 already pays.

Reference analog: none (the reference has no storage layout control at
all); Spark analog: none built-in — `repartitionByRange` composes the
layout once the z-value column exists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16-bit rank per dimension -> 32-bit interleaved z-value (fits a long
# with room for a third dimension if ever needed).
RANK_BITS = 16
RANK_MAX = (1 << RANK_BITS) - 1

# (shift, mask) pairs spreading a 16-bit value over the even bits of a
# 32-bit lane: x = (x | x<<s) & m, applied in order.
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def spread_bits16(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` over the even bit positions of
    a 32-bit lane (0bABCD -> 0b0A0B0C0D), JVM-side."""
    x = col.bitwiseAND(F.lit(RANK_MAX))
    for shift, mask in _SPREAD:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def z_value(rank_a: Column, rank_b: Column) -> Column:
    """Morton code of two 16-bit ranks: a's bits on even positions, b's
    on odd. Monotone locality: rows whose z-values are close are close
    in BOTH a and b."""
    return spread_bits16(rank_a).bitwiseOR(
        F.shiftleft(spread_bits16(rank_b), 1)
    )


def rank16(col: Column, lo: int, hi: int) -> Column:
    """Map an integer-valued column with known domain [lo, hi] onto the
    16-bit rank space, clamped. The product (col - lo) * 65535 stays in
    long (exact below 2^47), but Spark evaluates `scaled / span` as
    double division (long/long -> double), which is exact only while
    (hi - lo) * 65535 stays under 2^53 — i.e. domains narrower than
    ~2^37 (ADVICE r8). Beyond that, floor(double-div) can differ from
    integer division by ±1 rank; MONOTONICITY — the only property the
    clustering layout needs — is still guaranteed, because IEEE
    division by a positive constant is monotone and floor preserves
    order."""
    span = max(1, int(hi) - int(lo))
    scaled = (col.cast("long") - F.lit(int(lo))) * F.lit(RANK_MAX)
    r = F.floor(scaled / F.lit(span)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(RANK_MAX), r))


def py_z_value(rank_a: int, rank_b: int) -> int:
    """Pure-Python reference interleave (tests compare the Spark
    expression against this, bit for bit)."""
    z = 0
    for i in range(RANK_BITS):
        z |= ((rank_a >> i) & 1) << (2 * i)
        z |= ((rank_b >> i) & 1) << (2 * i + 1)
    return z


def _as_long(df: DataFrame, c: str) -> Column:
    """Integer view of a clusterable column: timestamps become epoch
    seconds (timestamp_ntz cannot cast to long directly — route through
    timestamp_ltz; the session-TZ shift is a constant offset, and ranks
    only need monotonicity)."""
    col = F.col(c)
    if dict(df.dtypes)[c].startswith("timestamp"):
        col = col.cast("timestamp_ltz")
    return col.cast("long")


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[int, int]]:
    """min/max per clustered column as Python ints — the O(1)-row driver
    crossing that fixes the rank scale. Timestamp columns are read as
    epoch seconds. At 100 TB these come from the catalog or partition
    metadata; computing them is still just one metadata-cheap min/max
    aggregate."""
    aggs = []
    for c in cols:
        aggs.append(F.min(_as_long(df, c)).alias(f"{c}__lo"))
        aggs.append(F.max(_as_long(df, c)).alias(f"{c}__hi"))
    row = df.agg(*aggs).first()
    return {c: (row[f"{c}__lo"], row[f"{c}__hi"]) for c in cols}


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bounds: dict[str, tuple[int, int]],
    n_files: int,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the Morton
    code of (col_a, col_b): one range shuffle on the z-value, a local
    sort, and the scratch key projected away before the write. The
    resulting footers carry tight per-row-group min/max on BOTH columns
    — the property `q_zorder_prune` audits."""
    za = rank16(_as_long(df, col_a), *bounds[col_a])
    zb = rank16(_as_long(df, col_b), *bounds[col_b])
    (
        df.withColumn("__z", z_value(za, zb))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
