"""Warehouse maintenance surface — SCD type-2 dimension rebuild and an
explicit bloom-filter pre-filtered join (Q108-Q109).

Both are operations a reference user running a production warehouse
would reach for next after the SQL surface (plans/sql_surface.py):
slowly-changing-dimension history is how dim tables absorb a changelog,
and bloom pruning is how a 100 TB fact scan avoids shuffling rows that
a selective dim-side predicate will discard anyway.

Reference analog: none (the reference has no table-maintenance layer,
SURVEY.md §2 Part A "does NOT implement" list); both rows are `ext`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_map_reduce_spark.functions.det import SUM6, r6d, sum6
from project_map_reduce_spark.registry import fmt_doc, register
from project_map_reduce_spark.tables import load

_SNAPSHOT_TS = "1992-01-01 00:00:00"


@register(
    "q_scd2_merge",
    oracle=f"""
    WITH hist AS (
        SELECT c_custkey            AS custkey,
               CAST(-1 AS BIGINT)   AS change_id,
               round(c_acctbal, 6)  AS attr,
               TIMESTAMP '{_SNAPSHOT_TS}' AS valid_from
        FROM customer
        UNION ALL
        SELECT o_custkey, o_orderkey, round(o_totalprice, 6), o_orderdate
        FROM orders
    )
    SELECT custkey, change_id, attr, valid_from,
           lead(valid_from) OVER w AS valid_to,
           (lead(valid_from) OVER w IS NULL) AS is_current
    FROM hist
    WINDOW w AS (PARTITION BY custkey ORDER BY valid_from, change_id)
    """,
)
def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q108: slowly-changing-dimension type-2 rebuild — the existing
    dimension snapshot (customer, valid from a fixed epoch) unioned with
    its changelog (orders, one attribute change per order at
    o_orderdate), then one keyed window closes each version interval:
    ``valid_to = lead(valid_from)``, open interval = current row. The
    change_id (-1 for the snapshot row, o_orderkey for changes) is both
    the deterministic same-timestamp tiebreaker and the output lineage
    column.

    Scale shape: UNION ALL is a free plan concat; the only exchange is
    ONE hash partition on custkey for the window — no global sort (the
    per-key sort runs inside each partition), no join. This is the
    standard scale form of SCD2/MERGE on an append-only changelog: at
    100 TB the same plan holds because history building is
    embarrassingly parallel per key; skewed hot keys would take the
    salted-window treatment (operators/skew.py) and a real deployment
    would partition-prune the changelog to the merge date range.
    """
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.lit(-1).cast("long").alias("change_id"),
        r6d(F.col("c_acctbal"), "attr"),
        F.lit(_SNAPSHOT_TS).cast("timestamp").alias("valid_from"),
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("change_id"),
        r6d(F.col("o_totalprice"), "attr"),
        F.col("o_orderdate").alias("valid_from"),
    )
    w = Window.partitionBy("custkey").orderBy("valid_from", "change_id")
    return c.unionAll(o).select(
        "custkey",
        "change_id",
        "attr",
        "valid_from",
        F.lead("valid_from").over(w).alias("valid_to"),
        F.lead("valid_from").over(w).isNull().alias("is_current"),
    )


_BLOOM_K = 7  # hash functions per key (seeded xxhash64 family)
_BLOOM_CAP = 1 << 22  # bitmap ceiling: 512 KiB broadcast at most


@register(
    "q_join_bloom",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           count(*) AS n_rows,
           {SUM6.format(expr="l_extendedprice * (1 - l_discount)")} AS revenue
    FROM lineitem
    WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q109: bloom-filter pre-filtered semi join — revenue of lineitem
    rows whose order is URGENT. The urgent orderkey set is summarized
    into a bloom bitmap at plan-build (ONE fused probe-positions +
    key-count aggregate, O(m) driver model — the kmeans/SQ8 model-fit
    pattern), shipped as a single BINARY literal, and every fact row is
    pre-screened JVM-side with {k} seeded xxhash64 bit probes BEFORE
    the exact broadcast semi join removes the bloom's false positives —
    so the result is exactly the plain semi join (the oracle), but the
    shuffle/join input has already been cut to ~|matches| + fpp·|facts|
    rows in the scan stage.

    Sizing: m = next_pow2(16·n) bits (k=7 ⇒ fpp ≈ 0.2%), capped at
    512 KiB of bitmap. Scale limits are explicit: the literal-bitmap
    form carries dims up to ~10^6-10^7 keys; past that a real
    deployment flips to Spark's own runtime row-level bloom (AQE
    `spark.sql.optimizer.runtime.bloomFilter.enabled`) or stays with
    the shuffle semi join. The point demonstrated here is the
    scan-stage cut: the bloom runs inside the scan's WholeStageCodegen
    span — a predicate Catalyst cannot derive on its own — so at 100 TB
    only ~|matches| rows ever reach an exchange. (The fixed two-job fit
    cost means the plain broadcast semi join wins at toy scale; the
    bloom pays for itself once the fact side is large enough that
    scan-stage row elimination dominates, which is exactly the 100 TB
    regime.)
    """
    import numpy as np

    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    # ONE model-fit job: probe positions at the CAP size M plus the key
    # count (each key contributes exactly k probes, so n = rows/k).
    # Positions for the final m fold out of the cap positions because
    # both are powers of two: h mod m = (h mod M) & (m-1).
    probes = [
        F.pmod(F.xxhash64(F.lit(i).cast("long"), F.col("o_orderkey")), F.lit(_BLOOM_CAP))
        for i in range(_BLOOM_K)
    ]
    fit = (
        urgent.select(F.explode(F.array(*probes)).alias("p"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.collect_set("p").alias("ps"),
        )
        .collect()[0]
    )
    n = fit["cnt"] // _BLOOM_K
    m_bits = 1024
    while m_bits < 16 * n and m_bits < _BLOOM_CAP:
        m_bits *= 2

    # Pack the bitmap into BYTES and ship it as ONE binary literal:
    # a single py4j transfer (measured 8 ms vs 3.7 s for the same
    # bitmap as an array<bigint> literal — py4j marshals array
    # literals element-wise) and the byte probes run ~2× faster too.
    bits = np.zeros(m_bits, dtype=bool)
    bits[np.array(fit["ps"], dtype=np.int64) & (m_bits - 1)] = True
    bitmap = F.lit(bytes(np.packbits(bits, bitorder="little").tobytes()))

    def bit_set(i: int) -> Column:
        pos = F.pmod(
            F.xxhash64(F.lit(i).cast("long"), F.col("l_orderkey")), F.lit(m_bits)
        )
        byte = F.conv(
            F.hex(F.substring(bitmap, F.floor(pos / 8).cast("int") + 1, 1)), 16, 10
        ).cast("int")
        return F.getbit(byte, F.pmod(pos, 8)) == 1

    maybe = F.lit(True)
    for i in range(_BLOOM_K):
        maybe = maybe & bit_set(i)

    li = load(spark, sf_dir, "lineitem")
    survivors = li.filter(maybe).join(
        F.broadcast(urgent),
        li["l_orderkey"] == urgent["o_orderkey"],
        "left_semi",
    )
    return survivors.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        sum6(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


fmt_doc(q_join_bloom, k=_BLOOM_K)
