"""B.1 scans / sources (Q01-Q02) + the scan-side data-skipping and
schema-lifecycle surface (Q118 partition pruning, Q124 clustered-layout
row-group skipping, Q126 schema-evolution reads).

Reference parity: the reference's only source is a line-oriented text
file scanned by the Manager (Manager.java:269-284) and counted by the
client (LocalApp.java:106-115). Here both become parquet relations with
column pruning — the projection in Q01 must reach the scan
(``ReadSchema`` shows only the 4 columns; verified in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_map_reduce_spark.functions.det import SUM6
from project_map_reduce_spark.registry import fmt_doc, register
from project_map_reduce_spark.tables import load, local_rows

# Both sides of every hash-checked sum here accumulate in DECIMAL(27,6)
# (Spark: functions.det.sum6; DuckDB: this template) — the cross-engine
# contract ADVICE r7 asked to unify: a double-accumulating oracle drifts
# ~√n·ulp and sits ~1e-6 from the rounding boundary at sf10 group sizes.
_SUM6_VALUE = SUM6.format(expr="value")


@register(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan lineitem, project 4 columns (ref A1/A3). Column pruning pushes
    the 4-column ReadSchema into the parquet scan."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )


@register(
    "q_scan_count",
    oracle="SELECT count(*) AS n_rows FROM lineitem",
)
def q_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(*) of lineitem (ref A2 — the client's line count, without the
    reference's off-by-one at LocalApp.java:111). Parquet metadata-only
    count: Catalyst satisfies this from row-group stats."""
    return load(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


@register(
    "q_partition_prune",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
    GROUP BY event_type
    """,
)
def q_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q118: partition pruning DRIVER-PROVEN — the single most important
    scan optimization at 100 TB: the events stream is laid out
    hive-partitioned by event_date (the layout every production event
    lake uses), and a 3-day query then opens ONLY those 3 partition
    directories — the other 27 days are eliminated from the file
    listing before any I/O, turning a full-corpus scan into a
    date-bounded one. The function raises loudly if the executed plan's
    scan does not carry the date predicate as a PartitionFilter, so a
    planner regression that silently reverts to scanning all partitions
    becomes a driver failure, not a quiet 10× I/O bill.

    The oracle is the same 3-day aggregate computed by FILTERING the
    unpartitioned raw table, so the driver hash matches only if pruning
    changes the physical I/O and nothing else.

    Driver-collect note (the Q96/Q117 pattern): the aggregate is
    O(event types) = 5 rows; it is localized so the scratch partitioned
    layout can be removed before returning — at scale the partitioned
    table is the durable asset, written once and pruned by every query
    after.
    """
    import shutil
    import tempfile

    from project_map_reduce_spark.functions.det import sum6

    ev = load(spark, sf_dir, "events").select(
        "event_type", "ts", "value", F.to_date("ts").alias("event_date")
    )
    lo, hi = "2024-01-10", "2024-01-12"
    part_dir = tempfile.mkdtemp(prefix="q_partition_prune_")
    try:
        # One writer task per date directory (hash repartition on the
        # partition column), the layout a daily ingest job would leave.
        ev.repartition("event_date").write.mode("overwrite").partitionBy(
            "event_date"
        ).parquet(part_dir)
        pruned = (
            spark.read.parquet(part_dir)
            .filter(F.col("event_date").between(F.lit(lo), F.lit(hi)))
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                sum6("value").alias("sum_value"),
            )
        )
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        import re

        pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        if pf is None or "event_date" not in pf.group(1):
            raise RuntimeError(
                "partition pruning regression — scan has no event_date "
                f"PartitionFilter:\n{plan}"
            )
        rows = pruned.collect()
    finally:
        shutil.rmtree(part_dir, ignore_errors=True)
    return local_rows(
        spark,
        rows, schema="event_type string, n_events bigint, sum_value double"
    )


def _assert_dynamic_pruning(df: DataFrame) -> None:
    """Raise unless the executed plan's partitioned scan carries a
    ``dynamicpruningexpression`` PartitionFilter — the runtime-pruning
    guard q_dpp_prune runs on every execution (the Q118 pattern: an
    optimizer regression that silently reverts to scanning every
    partition becomes a driver failure, not a quiet full-corpus read)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "dynamicpruningexpression" not in plan:
        raise RuntimeError(
            "dynamic partition pruning regression — no "
            f"dynamicpruningexpression in any PartitionFilter:\n{plan}"
        )


@register(
    "q_dpp_prune",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_events,
           {{sum6}} AS sum_value
    FROM events
    WHERE isodow(CAST(ts AS DATE)) >= 6
    GROUP BY event_type
    """.format(sum6=SUM6.format(expr="value")),
)
def q_dpp_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q136: DYNAMIC partition pruning DRIVER-PROVEN — the runtime
    sibling of Q118 and the classic star-schema lever at 100 TB:
    Q118's static pruning needs the partition predicate IN THE QUERY;
    here the selective predicate lives on a DIMENSION (a date dim
    flagged by weekday), and only the JOIN knows which fact partitions
    matter. Without DPP the fact scan reads all 30 day-directories and
    the join discards ~5/7 of the I/O; with it, Catalyst reuses the
    broadcast dim to synthesize a runtime IN-filter on the fact's
    partition column (``dynamicpruningexpression`` in the scan's
    PartitionFilters), so only weekend directories are ever listed and
    read. This is the optimization every fact-join-dim query on a
    date-partitioned lake depends on.

    Driver-checked raise: the executed plan must carry the dynamic-
    pruning PartitionFilter (``_assert_dynamic_pruning``); the pytest
    counterfactual proves guard liveness by force-disabling the
    optimizer rule (the same plan then carries NO dynamic filter and
    the guard must raise) while both plans return identical rows —
    the filter's presence is what gates the partition listing, the
    same trust basis as Q118's static PartitionFilters. The oracle
    computes the same aggregate by
    filtering the raw table on the identical weekday rule (Spark
    ``weekday() >= 5`` ≡ DuckDB ``isodow() >= 6``, both Mon-based), so
    the hash matches only if runtime pruning changed the I/O and
    nothing else.

    Driver-collect note (Q118 pattern): the aggregate is O(event
    types); the scratch star layout is removed before returning — at
    scale the partitioned fact + date dim are the durable warehouse
    assets, and every dim-filtered join after ingest prunes this way.
    """
    import shutil
    import tempfile

    from project_map_reduce_spark.functions.det import sum6

    ev = load(spark, sf_dir, "events").select(
        "event_type", "value", F.to_date("ts").alias("event_date")
    )
    star_dir = tempfile.mkdtemp(prefix="q_dpp_prune_")
    dpp_key = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    prev_dpp = spark.conf.get(dpp_key)
    try:
        spark.conf.set(dpp_key, "true")
        ev.repartition("event_date").write.partitionBy("event_date").parquet(
            f"{star_dir}/fact"
        )
        # The date dimension a warehouse would maintain: one row per
        # calendar day with derived attributes.
        ev.select("event_date").distinct().withColumn(
            "weekday", F.weekday("event_date")
        ).write.parquet(f"{star_dir}/dim")

        fact = spark.read.parquet(f"{star_dir}/fact")
        weekend = (
            spark.read.parquet(f"{star_dir}/dim")
            .where(F.col("weekday") >= 5)
            .select("event_date")
        )
        agg = (
            fact.join(weekend, "event_date")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                sum6("value").alias("sum_value"),
            )
        )
        _assert_dynamic_pruning(agg)
        rows = agg.collect()
    finally:
        spark.conf.set(dpp_key, prev_dpp)
        shutil.rmtree(star_dir, ignore_errors=True)
    return local_rows(
        spark,
        rows, schema="event_type string, n_events bigint, sum_value double"
    )


_CLUSTER_LO = "2024-01-10 00:00:00"
_CLUSTER_HI = "2024-01-13 00:00:00"
_CLUSTER_FILES = 10  # range partitions = sorted files in the layout
_CLUSTER_MAX_OVERLAP = 0.34  # ≤ this fraction of row groups may overlap


def _assert_ts_bounds_pushed(df: DataFrame) -> None:
    """Raise unless the scan under ``df`` carries ts bounds in
    PushedFilters — the guard q_cluster_prune runs on every execution.
    Catches the real regression class: a predicate rewritten into a
    form the parquet source cannot accept (e.g. a function over the
    column), which silently turns the clustered layout's row-group
    skipping off. (The plan string lists ACCEPTED filters, so this is
    a property of the predicate shape, not of the runtime pushdown
    conf.)"""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    if pf is None or "ts" not in pf.group(1) or "GreaterThan" not in pf.group(1):
        raise RuntimeError(
            "filter-pushdown regression — scan does not push the ts "
            f"bounds:\n{plan}"
        )


@register(
    "q_cluster_prune",
    oracle=f"""
    SELECT event_type, count(*) AS n_events,
           {_SUM6_VALUE} AS sum_value
    FROM events
    WHERE ts >= TIMESTAMP '{_CLUSTER_LO}' AND ts < TIMESTAMP '{_CLUSTER_HI}'
    GROUP BY event_type
    """,
)
def q_cluster_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q124: range-clustered layout DRIVER-PROVEN to enable row-group /
    file skipping — Q118's sibling and the second data-skipping lever
    at 100 TB: partition pruning eliminates DIRECTORIES; CLUSTERING
    (range-repartition + sort within files on the filter column) makes
    every parquet footer's per-row-group min/max statistics TIGHT, so a
    pushed-down time predicate skips whole row groups and files without
    reading a data page. An unclustered layout carries the same pushed
    filter but every row group's [min,max] spans the full time range —
    the filter prunes nothing and the scan silently reads the corpus.

    Two raises make the contract driver-checked (the Q118 pattern):
    (1) the executed scan must carry the ts bounds in PushedFilters —
    a planner regression fails loudly; (2) the layout itself is audited
    through the parquet footers (pyarrow): the fraction of row groups
    whose ts [min,max] intersects the {d}-day window must be ≤ {f:.0%}
    — on this 30-day corpus a tight {n}-file range layout leaves
    ~1-2 overlapping groups, while an unclustered write overlaps ~100%
    (asserted by test). The oracle computes the same aggregate by
    filtering the raw table, so the hash matches only if skipping
    changed the I/O and nothing else.

    Driver-collect note (Q96/Q117/Q118 pattern): the aggregate is
    O(event types) = 5 rows; the scratch layout is removed before
    returning — at scale the clustered table is the durable asset
    (written once by ingest, skipped by every time-bounded query after).
    """
    import datetime
    import glob as _glob
    import shutil
    import tempfile

    from project_map_reduce_spark.functions.det import sum6

    ev = load(spark, sf_dir, "events").select("event_type", "ts", "value")
    lo = datetime.datetime.fromisoformat(_CLUSTER_LO)
    hi = datetime.datetime.fromisoformat(_CLUSTER_HI)
    lay_dir = tempfile.mkdtemp(prefix="q_cluster_prune_")
    try:
        (
            ev.repartitionByRange(_CLUSTER_FILES, "ts")
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(lay_dir)
        )

        # Layout audit straight from the parquet footers.
        import pyarrow.parquet as pq

        total = overlap = 0
        for f in _glob.glob(f"{lay_dir}/part-*.parquet"):
            meta = pq.ParquetFile(f).metadata
            ts_idx = meta.schema.names.index("ts")
            for g in range(meta.num_row_groups):
                st = meta.row_group(g).column(ts_idx).statistics
                total += 1
                if st is None:
                    overlap += 1  # no stats = unskippable, counts against
                elif st.min < hi and st.max >= lo:
                    overlap += 1
        if total == 0 or overlap / total > _CLUSTER_MAX_OVERLAP:
            raise RuntimeError(
                "clustered layout regression — "
                f"{overlap}/{total} row groups overlap the window; "
                "min/max stats are not tight enough to skip"
            )

        pruned = (
            spark.read.parquet(lay_dir)
            .filter(
                (F.col("ts") >= F.lit(lo.isoformat(sep=" ")).cast("timestamp_ntz"))
                & (F.col("ts") < F.lit(hi.isoformat(sep=" ")).cast("timestamp_ntz"))
            )
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                sum6("value").alias("sum_value"),
            )
        )
        _assert_ts_bounds_pushed(pruned)
        rows = pruned.collect()
    finally:
        shutil.rmtree(lay_dir, ignore_errors=True)
    return local_rows(
        spark,
        rows, schema="event_type string, n_events bigint, sum_value double"
    )


fmt_doc(
    q_cluster_prune,
    d=3,
    f=_CLUSTER_MAX_OVERLAP,
    n=_CLUSTER_FILES,
)


_Z_FILES = 16
# Worst-dimension ceiling: the property a linear layout CANNOT deliver.
# Measured (sf0.001/0.01/0.1, stable): zorder frac_ts 0.50, frac_user
# 0.31-0.38, 2D 0.25; range-on-ts frac_user 1.0. Headroom for
# repartitionByRange sample jitter.
_Z_MAX_DIM_OVERLAP = 0.70
_Z_MAX_2D_OVERLAP = 0.45


def _assert_cols_pushed(df: DataFrame, cols: list[str]) -> None:
    """Raise unless the scan under ``df`` carries a pushed RANGE filter
    (not merely IsNotNull) on EVERY named column — the multi-column
    form of ``_assert_ts_bounds_pushed``. The plan string elides
    metadata lists at spark.sql.maxMetadataStringLength (default 100 —
    a two-column pushed list is cut before its closing bracket), so the
    limit is raised for the duration of the read."""
    import re

    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key)
    spark.conf.set(key, "4096")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, old)
    pf = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    missing = [
        c
        for c in cols
        if pf is None
        or not re.search(rf"(GreaterThan|LessThan|EqualTo)\w*\({re.escape(c)},", pf.group(1))
    ]
    if missing:
        raise RuntimeError(
            f"filter-pushdown regression — scan does not push {missing}:\n{plan}"
        )


@register(
    "q_zorder_prune",
    oracle=f"""
    WITH bounds AS (
        SELECT min(user_id) AS ulo, max(user_id) AS uhi FROM events
    )
    SELECT event_type, count(*) AS n_events,
           {_SUM6_VALUE} AS sum_value
    FROM events, bounds
    WHERE ts >= TIMESTAMP '{_CLUSTER_LO}' AND ts < TIMESTAMP '{_CLUSTER_HI}'
      AND user_id >= ulo + (3 * (uhi - ulo)) // 10
      AND user_id <= ulo + (uhi - ulo) // 2
    GROUP BY event_type
    """,
)
def q_zorder_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q127: Z-order (Morton) multi-column clustering DRIVER-PROVEN —
    Q124's sibling for the multi-predicate case (VERDICT r7 item 4).
    Q124's linear range layout makes exactly ONE column's row-group
    stats tight; a second filter column is random across it and a query
    bounding that column skips nothing. Interleaved-bit clustering on
    (ts, user_id) — ``operators/zorder.py``, pure JVM shift/mask
    arithmetic, one range shuffle — bounds EVERY clustered dimension:
    each file's bounding box covers ~sqrt(1/n_files) of each domain
    instead of all of one and none of the other.

    Three driver-checked raises (the Q118/Q124 pattern): (1) the
    executed scan must push BOTH predicates; (2) the footer audit
    (pyarrow row-group stats) must show the {d}-day ts window AND the
    20%-wide user_id band each overlapping ≤ {dim:.0%} of row groups —
    the worst-dimension criterion a linear layout fails at 100% on its
    unsorted column (asserted by the counterfactual test); (3) the
    conjunctive 2D overlap must stay ≤ {both:.0%}. The oracle computes
    the same aggregate from the raw table (user band derived from
    min/max via integer arithmetic on both engines), so the hash
    matches only if skipping changed the I/O and nothing else.

    Driver-collect notes: the rank scale needs min/max per clustered
    column — O(1) rows (at 100 TB: catalog/partition metadata); the
    final aggregate is O(event types) = 5 rows; the scratch layout is
    removed before returning — at scale the z-ordered table is the
    durable asset (Delta OPTIMIZE ZORDER BY / Iceberg rewrite, written
    once, skipped by every multi-predicate query after).
    """
    import datetime
    import glob as _glob
    import shutil
    import tempfile

    from project_map_reduce_spark.functions.det import sum6
    from project_map_reduce_spark.operators.zorder import (
        column_bounds,
        zorder_write,
    )

    ev = load(spark, sf_dir, "events").select("event_type", "ts", "user_id", "value")
    ts_lo = datetime.datetime.fromisoformat(_CLUSTER_LO)
    ts_hi = datetime.datetime.fromisoformat(_CLUSTER_HI)
    bounds = column_bounds(ev, ["ts", "user_id"])
    ulo_d, uhi_d = bounds["user_id"]
    u_lo = ulo_d + (3 * (uhi_d - ulo_d)) // 10
    u_hi = ulo_d + (uhi_d - ulo_d) // 2

    lay_dir = tempfile.mkdtemp(prefix="q_zorder_prune_")
    try:
        zorder_write(ev, lay_dir, "ts", "user_id", bounds, _Z_FILES)

        # Footer audit: per-dimension AND conjunctive overlap.
        import pyarrow.parquet as pq

        total = o_ts = o_user = o_both = 0
        for f in _glob.glob(f"{lay_dir}/part-*.parquet"):
            meta = pq.ParquetFile(f).metadata
            i_ts = meta.schema.names.index("ts")
            i_u = meta.schema.names.index("user_id")
            for g in range(meta.num_row_groups):
                st = meta.row_group(g).column(i_ts).statistics
                su = meta.row_group(g).column(i_u).statistics
                total += 1
                t = st is None or (st.min < ts_hi and st.max >= ts_lo)
                u = su is None or (su.min <= u_hi and su.max >= u_lo)
                o_ts += t
                o_user += u
                o_both += t and u
        if total == 0 or max(o_ts, o_user) / total > _Z_MAX_DIM_OVERLAP:
            raise RuntimeError(
                "z-order layout regression — worst-dimension overlap "
                f"ts {o_ts}/{total}, user_id {o_user}/{total}; a clustered "
                "dimension's stats are not tight enough to skip"
            )
        if o_both / total > _Z_MAX_2D_OVERLAP:
            raise RuntimeError(
                "z-order layout regression — conjunctive overlap "
                f"{o_both}/{total} exceeds the 2D ceiling"
            )

        pruned = (
            spark.read.parquet(lay_dir)
            .filter(
                (F.col("ts") >= F.lit(ts_lo.isoformat(sep=" ")).cast("timestamp_ntz"))
                & (F.col("ts") < F.lit(ts_hi.isoformat(sep=" ")).cast("timestamp_ntz"))
                & F.col("user_id").between(F.lit(u_lo), F.lit(u_hi))
            )
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                sum6("value").alias("sum_value"),
            )
        )
        _assert_cols_pushed(pruned, ["ts", "user_id"])
        rows = pruned.collect()
    finally:
        shutil.rmtree(lay_dir, ignore_errors=True)
    return local_rows(
        spark,
        rows, schema="event_type string, n_events bigint, sum_value double"
    )


fmt_doc(
    q_zorder_prune,
    d=3,
    dim=_Z_MAX_DIM_OVERLAP,
    both=_Z_MAX_2D_OVERLAP,
)


_BLOOM_FILES = 8
_BLOOM_MAX_KEEP = 0.35  # bloom-level: ≤ this fraction of row groups kept
_BLOOM_MIN_STATS_KEEP = 0.75  # stats-level keeps ~everything on a hashed key


def _audit_bloom_skipping(
    spark: SparkSession, lay_dir: str, keys: list[int]
) -> None:
    """Prove, through parquet-mr's own row-group filter (the exact code
    path Spark's vectorized reader runs at scan time), that the layout's
    bloom filters skip row groups for point lookups on ``key`` — and
    that min/max STATISTICS alone would not. For every file and every
    looked-up key this runs ``RowGroupFilter.filterRowGroups`` twice,
    once at BLOOMFILTER level and once at STATISTICS level, and raises
    unless (a) every key's containing group survives (bloom filters
    have no false negatives — kept ≥ 1 per present key), (b) blooms
    keep ≤ {keep:.0%} of groups overall, and (c) stats keep ≥
    {stats:.0%} (the hashed key's per-group [min,max] spans ~the whole
    int64 domain, so the third skipping lever really is the only one
    that fires here).

    py4j note: values with |v| ≤ 2^31 would be re-boxed as Integer on
    the gateway (breaking the predicate's long comparator), so such
    keys are excluded from the audit — with 64-bit hashed keys this is
    a ~2^-32 event per key; at least 6 of the 8 must remain.
    """
    import glob as _glob

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    auditable = [k for k in keys if abs(k) > 2**31]
    if len(auditable) < 6:
        raise RuntimeError(
            f"bloom audit needs ≥6 long-boxed keys, got {len(auditable)}"
        )
    lvl_cls = jvm.java.lang.Class.forName(
        "org.apache.parquet.filter2.compat.RowGroupFilter$FilterLevel"
    )
    consts = {str(c): c for c in lvl_cls.getEnumConstants()}

    def _levels(name: str):
        lst = jvm.java.util.ArrayList()
        lst.add(consts[name])
        return lst

    FilterApi = jvm.org.apache.parquet.filter2.predicate.FilterApi
    FilterCompat = jvm.org.apache.parquet.filter2.compat.FilterCompat
    RowGroupFilter = jvm.org.apache.parquet.filter2.compat.RowGroupFilter
    kcol = FilterApi.longColumn("key")

    total = 0
    kept_bloom = {k: 0 for k in auditable}
    kept_stats = {k: 0 for k in auditable}
    have_bloom = 0
    for f in _glob.glob(f"{lay_dir}/part-*.parquet"):
        infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            jvm.org.apache.hadoop.fs.Path(f), conf
        )
        reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
        try:
            blocks = reader.getRowGroups()
            n_blocks = blocks.size()
            total += n_blocks
            for b in range(n_blocks):
                bcols = blocks.get(b).getColumns()
                for c in range(bcols.size()):
                    cc = bcols.get(c)
                    if (
                        cc.getPath().toDotString() == "key"
                        and cc.getBloomFilterOffset() >= 0
                    ):
                        have_bloom += 1
            for k in auditable:
                filt = FilterCompat.get(FilterApi.eq(kcol, k))
                kept_bloom[k] += RowGroupFilter.filterRowGroups(
                    _levels("BLOOMFILTER"), filt, blocks, reader
                ).size()
                kept_stats[k] += RowGroupFilter.filterRowGroups(
                    _levels("STATISTICS"), filt, blocks, reader
                ).size()
        finally:
            reader.close()

    if total == 0 or have_bloom < total:
        raise RuntimeError(
            f"bloom layout regression — {have_bloom}/{total} row groups "
            "carry a bloom filter on key"
        )
    no_keep = [k for k, n in kept_bloom.items() if n < 1]
    if no_keep:
        raise RuntimeError(
            f"bloom audit impossibility — present keys lost their row "
            f"group (boxing/hash mismatch?): {no_keep}"
        )
    b_frac = sum(kept_bloom.values()) / (len(auditable) * total)
    s_frac = sum(kept_stats.values()) / (len(auditable) * total)
    if b_frac > _BLOOM_MAX_KEEP:
        raise RuntimeError(
            "bloom skipping regression — blooms keep "
            f"{b_frac:.2f} of row groups (> {_BLOOM_MAX_KEEP})"
        )
    if s_frac < _BLOOM_MIN_STATS_KEEP:
        raise RuntimeError(
            "bloom audit counterfactual broke — stats alone keep only "
            f"{s_frac:.2f}; min/max would already skip and the bloom "
            "lever is not what's being measured"
        )


fmt_doc(
    _audit_bloom_skipping,
    keep=_BLOOM_MAX_KEEP,
    stats=_BLOOM_MIN_STATS_KEEP,
)


@register(
    "q_bloom_prune",
    oracle=f"""
    WITH n AS (SELECT count(*) // 8 AS step FROM events)
    SELECT event_type,
           count(*) AS n_events,
           {SUM6.format(expr="value")} AS sum_value
    FROM events, n
    WHERE event_id % step = 7 AND event_id // step < 8
    GROUP BY event_type
    """,
)
def q_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q133: parquet row-group BLOOM FILTERS driver-proven — the THIRD
    data-skipping lever (VERDICT r8 item 4), completing the family:
    Q118 prunes directories (partition values), Q124/Q127 prune row
    groups by min/max (range predicates on clustered columns) — but a
    POINT LOOKUP on a high-cardinality hashed key defeats both: every
    row group's [min,max] spans ~the whole 64-bit domain, so statistics
    keep everything. Parquet's split-block bloom filters
    (parquet.bloom.filter.enabled#col, written into the footer) answer
    "is this exact key definitely absent?" per row group, which is the
    only way a needle query over 100 TB of fingerprint-keyed data skips
    I/O without a global index.

    The scratch layout keys each event by xxhash64(event_id) — the
    realistic shape: content fingerprints / id hashes, uniformly spread
    with no cluster structure — written in natural order so min/max
    stats are useless BY CONSTRUCTION. Eight point-lookup keys are
    derived arithmetically from the row count (i*(n/8)+7), hashed
    JVM-side, and the query reads them back through an IN filter.
    ``_audit_bloom_skipping`` then drives parquet-mr's own
    ``RowGroupFilter`` per key at BLOOMFILTER level (≤ {keep:.0%} of
    groups kept, every present key's group survives) and at STATISTICS
    level (≥ {stats:.0%} kept — proving blooms, not min/max, do the
    skipping). The oracle selects the same 8 events from the raw table
    via the same modular-arithmetic id set, so the hash matches only if
    the bloom-filtered read returns exactly the looked-up rows.

    Driver-collect notes: the id→hash derivation is O(8) rows; the
    final aggregate is O(event types); the scratch layout is removed
    before returning — at scale the bloom-filtered table is the durable
    asset (written once at ingest, probed by every point lookup after).
    """
    import shutil
    import tempfile

    from project_map_reduce_spark.functions.det import sum6

    from project_map_reduce_spark.tables import footer_rows, table_path

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    # Row count from the parquet FOOTERS (round-13, guide §1.2 fewer
    # passes): identical to ev.count(), zero Spark jobs — and summed
    # per file, so a multi-file table directory counts correctly too
    # (VERDICT r13 item 7).
    n = footer_rows(table_path(sf_dir, "events"))
    step = n // _BLOOM_FILES
    ids = [i * step + 7 for i in range(_BLOOM_FILES)]
    keyed = ev.select(
        F.xxhash64("event_id").alias("key"), "event_type", "value"
    )
    keys = [
        r["key"]
        for r in local_rows(
        spark,
            [(i,) for i in ids], "event_id long"
        )
        .select(F.xxhash64("event_id").alias("key"))
        .collect()
    ]

    lay_dir = tempfile.mkdtemp(prefix="q_bloom_prune_")
    try:
        (
            keyed.repartition(_BLOOM_FILES)
            .write.mode("overwrite")
            .option("parquet.bloom.filter.enabled#key", "true")
            .option("parquet.bloom.filter.expected.ndv#key", str(n))
            .parquet(lay_dir)
        )
        _audit_bloom_skipping(spark, lay_dir, keys)
        looked_up = (
            spark.read.parquet(lay_dir)
            .filter(F.col("key").isin(keys))
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                sum6("value").alias("sum_value"),
            )
        )
        rows = looked_up.collect()
    finally:
        shutil.rmtree(lay_dir, ignore_errors=True)
    return local_rows(
        spark,
        rows, schema="event_type string, n_events bigint, sum_value double"
    )


fmt_doc(
    q_bloom_prune,
    keep=_BLOOM_MAX_KEEP,
    stats=_BLOOM_MIN_STATS_KEEP,
)


_RT_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_RT_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


@register(
    "q_source_roundtrip",
    oracle=f"""
    WITH slice AS (
        SELECT * FROM events WHERE event_id % 10 = 0
    ),
    agg AS (
        SELECT event_type,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               {SUM6.format(expr="value")} AS sum_value,
               CAST(sum(epoch_us(ts) % 1000000) AS BIGINT) AS micros_sum,
               count(DISTINCT props) AS n_props
        FROM slice
        GROUP BY event_type
    )
    SELECT fmt, event_type, n_events, n_users, sum_value, micros_sum, n_props
    FROM agg CROSS JOIN (VALUES ('csv'), ('json'), ('text'), ('orc')) fmts(fmt)
    """,
)
def q_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q132: text/CSV/JSON source round-trip DRIVER-PROVEN — upgrades the
    last capability-only SURVEY §2 B.1 rows (the non-parquet sources,
    previously smoke-tested only) to the full hash-checked tier
    (VERDICT r8 item 3). The reference's ONLY input format is a
    line-oriented text file the Manager splits into records
    (ref Manager.java:269-284); this query restates that lineage three
    ways: an events slice is written out as (a) quoted/escaped CSV with
    header, (b) JSON lines, and (c) raw tab-delimited TEXT lines parsed
    back field-by-field — plus (d) ORC, the columnar interchange
    sibling (upgrading the read_orc/write_orc capability row to the
    same tier) — then each copy is re-read WITH AN EXPLICIT SCHEMA
    (the only scalable contract: schema inference is a full extra pass
    over 100 TB) and aggregated identically.

    The oracle computes the same per-event_type aggregate once from the
    raw parquet table and cross-joins the four format labels, so the
    driver hash matches only if EVERY format round-trips losslessly:
    `micros_sum` (sum of each timestamp's sub-second microseconds)
    fails if a format truncates timestamp precision, `n_props` fails if
    CSV quoting/escaping mangles the embedded-JSON strings, `sum_value`
    (exact DECIMAL(27,6) accumulation both sides) fails on any float
    formatting drift, and the distinct counts catch dropped/duplicated
    lines. The sub-second extraction is timezone-offset-invariant
    (offsets are whole minutes), so the check holds in any driver
    session timezone.

    Scale notes: all four writers/readers are ordinary distributed
    FileFormat scans — the slice never passes through the driver; the
    explicit-schema re-read keeps the text formats splittable and
    single-pass. Driver-collect note (Q118/Q124 pattern): the final
    aggregate is O(formats x event types) = 20 rows; the scratch files
    are removed before returning — at scale the CSV/JSON/text/ORC
    copies are the interchange assets an ingest boundary exchanges.
    """
    import shutil
    import tempfile

    from project_map_reduce_spark.functions.det import sum6

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ev = (
        load(spark, sf_dir, "events")
        .select(*cols)
        .where(F.col("event_id") % 10 == 0)
    )
    tmp = tempfile.mkdtemp(prefix="q_source_roundtrip_")
    try:
        # (a) CSV: header + explicit NTZ format; the embedded-JSON props
        # column forces real quoting/escaping through the round trip.
        ev.write.option("header", True).option(
            "timestampNTZFormat", _RT_TS_FMT
        ).csv(f"{tmp}/csv")
        csv_back = (
            spark.read.schema(_RT_SCHEMA)
            .option("header", True)
            .option("timestampNTZFormat", _RT_TS_FMT)
            .csv(f"{tmp}/csv")
        )

        # (b) JSON lines, same explicit-format contract on both sides.
        ev.write.option("timestampNTZFormat", _RT_TS_FMT).json(f"{tmp}/json")
        json_back = (
            spark.read.schema(_RT_SCHEMA)
            .option("timestampNTZFormat", _RT_TS_FMT)
            .json(f"{tmp}/json")
        )

        # (c) Raw TEXT lines — the reference's literal input shape: one
        # record per line, tab-delimited, parsed back by position.
        ev.select(
            F.concat_ws(
                "\t",
                F.col("event_id").cast("string"),
                F.date_format("ts", _RT_TS_FMT),
                F.col("user_id").cast("string"),
                "event_type",
                F.col("value").cast("string"),
                "props",
            ).alias("value")
        ).write.text(f"{tmp}/text")
        parts = F.split(F.col("value"), "\t", 6)
        text_back = spark.read.text(f"{tmp}/text").select(
            parts.getItem(0).cast("long").alias("event_id"),
            F.to_timestamp_ntz(parts.getItem(1), F.lit(_RT_TS_FMT)).alias("ts"),
            parts.getItem(2).cast("long").alias("user_id"),
            parts.getItem(3).alias("event_type"),
            parts.getItem(4).cast("double").alias("value"),
            parts.getItem(5).alias("props"),
        )

        # (d) ORC: the columnar interchange sibling (sources/readers.py's
        # read_orc/write_orc capability row, now hash-checked) — native
        # vectorized reader, schema embedded, TIMESTAMP_NTZ preserved.
        ev.write.orc(f"{tmp}/orc")
        orc_back = spark.read.schema(_RT_SCHEMA).orc(f"{tmp}/orc")

        def agg(df: DataFrame, fmt: str) -> DataFrame:
            micros = F.unix_micros(F.col("ts").cast("timestamp_ltz")) % 1000000
            return df.groupBy("event_type").agg(
                F.count(F.lit(1)).alias("n_events"),
                F.countDistinct("user_id").alias("n_users"),
                sum6("value").alias("sum_value"),
                F.sum(micros).alias("micros_sum"),
                F.countDistinct("props").alias("n_props"),
            ).select(F.lit(fmt).alias("fmt"), "*")

        out = (
            agg(csv_back, "csv")
            .unionByName(agg(json_back, "json"))
            .unionByName(agg(text_back, "text"))
            .unionByName(agg(orc_back, "orc"))
        )
        rows = out.collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return local_rows(
        spark,
        rows,
        schema="fmt string, event_type string, n_events bigint, "
        "n_users bigint, sum_value double, micros_sum bigint, n_props bigint",
    )


@register(
    "q_schema_evolution",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_events,
           count(CASE WHEN event_id % 2 = 1 THEN user_id END) AS n_with_user,
           {_SUM6_VALUE} AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q126: schema-evolution read DRIVER-PROVEN — the lake capability
    every long-lived 100 TB table exercises: early ingest batches were
    written WITHOUT a column that later batches carry (here: user_id
    added after the first deployment), and a query over the whole table
    must see one UNION schema with nulls filled for pre-evolution rows
    — no rewrite of history, no reader crash. Spark's parquet source
    does this with ``mergeSchema`` (footer union at listing time; at
    scale you pin the merged schema in a catalog instead of re-merging
    per query — the read path is identical).

    Driver-checked raise: the merged scan must actually carry the
    evolved column — a reader regression that silently drops it (or a
    deployment that forgot mergeSchema and serves whichever footer won)
    becomes a driver failure, not silently-null analytics. The oracle
    recomputes the same aggregate from the raw table with the
    batch-split predicate inlined (event_id parity picks which half was
    written pre-evolution), so the hash matches only if old rows read
    as null and new rows keep their values.

    Driver-collect note (Q96/Q117 pattern): O(types) rows; scratch
    layout removed before returning.
    """
    import shutil
    import tempfile

    from project_map_reduce_spark.functions.det import sum6

    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    tmp = tempfile.mkdtemp(prefix="q_schema_evo_")
    try:
        # batch 1: the pre-evolution writer — no user_id column at all
        ev.where(F.col("event_id") % 2 == 0).select(
            "event_type", "value"
        ).write.parquet(f"{tmp}/batch=1")
        # batch 2: the evolved writer carries the new column
        ev.where(F.col("event_id") % 2 == 1).select(
            "event_type", "value", "user_id"
        ).write.parquet(f"{tmp}/batch=2")

        merged = spark.read.option("mergeSchema", "true").parquet(tmp)
        if "user_id" not in merged.columns:
            raise RuntimeError(
                "schema-evolution regression — merged read lost the "
                f"evolved column; schema: {merged.schema.simpleString()}"
            )
        rows = (
            merged.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.count("user_id").alias("n_with_user"),
                sum6("value").alias("sum_value"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return local_rows(
        spark,
        rows,
        schema="event_type string, n_events bigint, n_with_user bigint, "
        "sum_value double",
    )


# ---------------------------------------------------------------------------
# Q139 — Python DataSource API source (Spark 4), driver-hash-checked


@register(
    "q_pyds_source",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text)                                  AS payload_md5
    FROM documents
    """,
)
def q_pyds_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q139: a CUSTOM BATCH SOURCE on Spark 4's Python DataSource API
    (VERDICT r9 item 5) — ``sources/pyds.py`` registers
    ``format("pmrs_docpayload")``, whose tasks independently read their
    row-range slice of the corpus and emit Arrow RecordBatches of a
    deterministic derived payload (UTF-8 byte length + MD5). The
    DataFrame returned IS the source's output: what the driver
    hash-checks is the API plumbing itself — schema declaration,
    ``partitions()`` planning, per-task ``read()``, Arrow transfer —
    against DuckDB recomputing the same payload from the same parquet.
    The reference lineage is its download-then-process worker loop
    (``Workers.java:127-129``); the ``url`` fetch mode of the same
    source (one partition per remote object, fetch-then-decode) is
    exercised hermetically in tests/test_pyds.py over file://.

    Scale shape: ``partitions()`` reads footer metadata only; each of
    the {k} planned tasks streams just its slice — no driver data path,
    no single-task collapse (the plan assertion below pins the task
    count, and the plan-audit test pins it again with the math). At
    100 TB the partition unit becomes one per file/row-group over the
    object listing (module docstring); the API surface is identical.
    """
    from project_map_reduce_spark.sources.pyds import DocPayloadDataSource
    from project_map_reduce_spark.tables import table_path

    spark.dataSource.register(DocPayloadDataSource)
    out = (
        spark.read.format("pmrs_docpayload")
        .option("path", table_path(sf_dir, "documents"))
        .option("npartitions", _PYDS_PARTS)
        .load()
    )
    nparts = out.rdd.getNumPartitions()
    if nparts != _PYDS_PARTS:
        raise RuntimeError(
            f"pmrs_docpayload planned {nparts} tasks, expected {_PYDS_PARTS} "
            "— the Python DataSource partition planning regressed"
        )
    return out


_PYDS_PARTS = 8

fmt_doc(q_pyds_source, k=_PYDS_PARTS)


# ---------------------------------------------------------------------------
# Q141 — Python DataSource API STREAM source (Spark 4), driver-hash-checked


@register(
    "q_pyds_stream",
    oracle="""
    WITH n AS (SELECT count(*) AS c FROM documents)
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT)       AS byte_len,
           md5(text)                                        AS payload_md5,
           CAST(floor(doc_id / ceil(c / 4.0)) AS BIGINT)    AS chunk_id
    FROM documents, n
    """,
)
def q_pyds_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q141: the STREAMING half of the Python DataSource API (Q139's
    batch twin — completes the Spark 4 custom-source surface): the
    same ``pmrs_docpayload`` source read via ``spark.readStream``,
    where offsets are row positions, ``latestOffset`` releases one
    chunk (¼ of the corpus) per trigger to simulate arrival, and each
    micro-batch's rows are read ON EXECUTORS through the full
    partition-planned ``DataSourceStreamReader`` API
    (``partitions(start, end) → read(partition)`` — NOT the
    driver-prefetching Simple variant; data never crosses the driver,
    SURVEY §4.2). Batches land append-mode in the idempotent
    per-batchId sink; the result is the union of all micro-batches.

    The hash check is the exactly-once ledger: every document must
    appear EXACTLY once with its deterministic derived payload AND the
    chunk ordinal its offset range implies (``chunk_id = doc_id div
    ceil(n/4)`` — valid because doc_id equals file row position in the
    fixture, asserted cheaply below). A duplicated or dropped offset
    range, a drifting chunk boundary, or a driver-side re-read would
    all corrupt rows and fail the driver hash.

    Scale shape: ``latestOffset``/``initialOffset`` are footer-only
    driver calls; per-batch work is one executor task per offset range
    (a production source returns many partitions per range); the sink
    read stays lazy and distributed.
    """
    import math
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from project_map_reduce_spark.sources.pyds import DocPayloadDataSource
    from project_map_reduce_spark.sources.sinks import write_stream_idempotent
    from project_map_reduce_spark.tables import table_path

    spark.dataSource.register(DocPayloadDataSource)
    path = table_path(sf_dir, "documents")
    n = pq.ParquetFile(path).metadata.num_rows
    chunk = max(1, math.ceil(n / 4))

    from project_map_reduce_spark.plans.streaming_shaped import (
        _session_output_dir,
    )

    sink = _session_output_dir("pmrs_q141_sink_")
    tmp = tempfile.mkdtemp(prefix="pmrs_q141_")
    try:
        stream = (
            spark.readStream.format("pmrs_docpayload")
            .option("path", path)
            .option("chunk_rows", chunk)
            .load()
        )
        q = write_stream_idempotent(
            stream,
            sink,
            f"{tmp}/ckpt",
            output_mode="append",
            trigger_available_now=False,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        q.awaitTermination(60)
        out = spark.read.option("basePath", sink).parquet(sink).select(
            "doc_id", "byte_len", "payload_md5", "chunk_id"
        )
        # Premise guard for the oracle's chunk arithmetic: doc_id must
        # be the file row position (dense 0..n-1) — footer+agg only.
        lo_hi = out.agg(F.min("doc_id"), F.max("doc_id")).first()
        if lo_hi[0] != 0 or lo_hi[1] != n - 1:
            raise RuntimeError(
                f"q_pyds_stream: doc_id not dense 0..{n - 1} "
                f"(got {lo_hi}) — chunk_id oracle premise broke"
            )
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# Q142 — VARIANT parquet STORAGE round-trip (Q138's storage leg)


@register(
    "q_variant_storage",
    oracle="""
    WITH agg AS (
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               CAST(count(DISTINCT CAST(json_extract_string(props, '$.k')
                    AS BIGINT)) AS BIGINT) AS n_distinct_k,
               CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS min_k,
               CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS max_k
        FROM events
        GROUP BY event_type
    )
    SELECT l.leg, a.event_type, a.n_events, a.sum_k, a.n_distinct_k,
           a.min_k, a.max_k
    FROM agg a, (VALUES ('direct'), ('parquet')) l(leg)
    """,
)
def q_variant_storage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q142: the VARIANT STORAGE leg (Q132's discipline applied to
    Q138's type): each props string is decoded ONCE to the binary
    VARIANT encoding, a (event_type, v) projection is WRITTEN TO
    PARQUET (the variant physically lands as the
    struct<metadata binary, value binary> pair — probed r10), read
    back, and the identical extraction+aggregate runs on the 'direct'
    (never-stored) and 'parquet' (round-tripped) legs; the oracle
    computes the aggregate once from the raw table and cross-joins
    both leg labels, so the driver hash passes only if VARIANT's
    binary encoding survives the columnar write/read byte-exactly
    (a corrupted metadata dictionary or value offset would shift
    every extraction). This is the modern semi-structured STORAGE
    path at 100 TB: decode once at ingest, store binary, probe
    cheaply forever — never re-parse JSON strings per query.

    Scale shape: the write is distributed (no driver data path); both
    legs are one projection + one 5-group hash agg; the tiny per-leg
    aggregates (O(types) rows) are collected and re-lifted so the
    scratch dir can be removed eagerly (the Q126 pattern).
    """
    import shutil
    import tempfile

    ev = load(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="pmrs_q142_")

    def _extract_agg(df: DataFrame) -> list:
        k = F.variant_get(F.col("v"), "$.k", "bigint").alias("k")
        return (
            df.select("event_type", k)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("k").alias("sum_k"),
                F.countDistinct("k").alias("n_distinct_k"),
                F.min("k").alias("min_k"),
                F.max("k").alias("max_k"),
            )
            .collect()
        )

    varframe = None
    try:
        # persist(): the direct-leg aggregate AND the parquet write both
        # consume the decoded frame — without the cache boundary the
        # props JSON is parse_json'd twice (round-13, guide §5 caching
        # rule: reused AND expensive to recompute). Both consumers are
        # eager inside this function, so the finally block releases it.
        varframe = ev.select(
            "event_type", F.parse_json(F.col("props")).alias("v")
        ).persist()
        direct_rows = _extract_agg(varframe)
        varframe.write.mode("overwrite").parquet(f"{tmp}/var")
        stored = spark.read.parquet(f"{tmp}/var")
        if stored.schema["v"].dataType.simpleString() != "variant":
            raise RuntimeError(
                "q_variant_storage: VARIANT column did not survive the "
                f"parquet round-trip as variant (got "
                f"{stored.schema['v'].dataType.simpleString()})"
            )
        parquet_rows = _extract_agg(stored)
    finally:
        if varframe is not None:
            varframe.unpersist(blocking=False)
        shutil.rmtree(tmp, ignore_errors=True)

    schema = (
        "event_type string, n_events bigint, sum_k bigint, "
        "n_distinct_k bigint, min_k bigint, max_k bigint"
    )
    return local_rows(spark, direct_rows, schema).select(
        F.lit("direct").alias("leg"), "*"
    ).unionByName(
        local_rows(spark, parquet_rows, schema).select(
            F.lit("parquet").alias("leg"), "*"
        )
    )


# ---------------------------------------------------------------------------
# Q144 — native XML source round-trip (Spark 4 merged spark-xml)


_XML_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


@register(
    "q_source_xml",
    oracle=f"""
    WITH slice AS (
        SELECT * FROM events WHERE event_id % 10 = 0
    ),
    agg AS (
        SELECT event_type,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               {SUM6.format(expr="value")} AS sum_value,
               CAST(sum(epoch_us(ts) % 1000000) AS BIGINT) AS micros_sum,
               count(DISTINCT props) AS n_props
        FROM slice
        GROUP BY event_type
    )
    SELECT fmt, event_type, n_events, n_users, sum_value, micros_sum, n_props
    FROM agg CROSS JOIN (VALUES ('xml'), ('xml_gzip')) fmts(fmt)
    """,
)
def q_source_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q144: the NATIVE XML source (spark-xml merged into Spark 4)
    under Q132's round-trip discipline: the same events slice is
    written as rowTag-delimited XML documents — plain and
    gzip-compressed (the compression-codec leg no other source query
    exercises) — and re-read with an EXPLICIT schema and explicit
    micros timestamp format on BOTH sides; the oracle computes the
    aggregate once from raw parquet and cross-joins the two leg
    labels. The format's own precision trap is real and pinned by
    tests: the DEFAULT XML timestamp format truncates to MILLISECONDS
    (probed r10 — micros canary reads ...000), so the explicit
    `{{fmt}}` option is load-bearing, exactly the kind of silent
    fidelity loss `micros_sum` exists to catch; `n_props` catches
    XML entity-escaping mangling of the embedded-JSON strings.

    Scale notes: XML writes/reads are ordinary distributed FileFormat
    paths (gzip makes each file non-splittable — acceptable for
    interchange assets, the documented trade); the explicit schema
    keeps the read single-pass (inference would be an extra full scan
    at 100 TB). Final aggregate is O(legs × types) rows (Q132's
    driver-collect note applies).
    """
    import shutil
    import tempfile

    from project_map_reduce_spark.functions.det import sum6

    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ev = (
        load(spark, sf_dir, "events")
        .select(*cols)
        .where(F.col("event_id") % 10 == 0)
    )
    tmp = tempfile.mkdtemp(prefix="q_source_xml_")
    try:
        legs = []
        for fmt, codec in (("xml", None), ("xml_gzip", "gzip")):
            w = (
                ev.write.format("xml")
                .option("rootTag", "events")
                .option("rowTag", "event")
                .option("timestampNTZFormat", _XML_TS_FMT)
                .option("timestampFormat", _XML_TS_FMT)
            )
            if codec:
                w = w.option("compression", codec)
            w.save(f"{tmp}/{fmt}")
            back = (
                spark.read.format("xml")
                .schema(_RT_SCHEMA)
                .option("rowTag", "event")
                .option("timestampNTZFormat", _XML_TS_FMT)
                .option("timestampFormat", _XML_TS_FMT)
                .load(f"{tmp}/{fmt}")
            )
            micros = F.unix_micros(F.col("ts").cast("timestamp_ltz")) % 1000000
            legs.append(
                back.groupBy("event_type")
                .agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.countDistinct("user_id").alias("n_users"),
                    sum6("value").alias("sum_value"),
                    F.sum(micros).alias("micros_sum"),
                    F.countDistinct("props").alias("n_props"),
                )
                .select(F.lit(fmt).alias("fmt"), "*")
            )
        rows = legs[0].unionByName(legs[1]).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return local_rows(
        spark,
        rows,
        schema="fmt string, event_type string, n_events bigint, "
        "n_users bigint, sum_value double, micros_sum bigint, n_props bigint",
    )


@register(
    "q_corrupt_quarantine",
    oracle=f"""
    WITH slice AS (
        SELECT event_id, event_type, value
        FROM events
        WHERE event_id % 10 = 0
    ),
    ok AS (
        SELECT 'dropmalformed' AS status,
               CAST(count(*) AS BIGINT) AS n_rows,
               {SUM6.format(expr="value")} AS sum_value,
               CAST(sum(event_id) AS BIGINT) AS id_sum
        FROM slice WHERE event_id % 7 <> 0
    )
    SELECT 'permissive_ok' AS status, n_rows, sum_value, id_sum FROM ok
    UNION ALL
    SELECT 'permissive_quarantined' AS status,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(NULL AS DOUBLE) AS sum_value,
           CAST(sum(event_id) AS BIGINT) AS id_sum
    FROM slice WHERE event_id % 7 = 0
    UNION ALL
    SELECT status, n_rows, sum_value, id_sum FROM ok
    """,
)
def q_corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q147: malformed-record QUARANTINE ingestion, driver-hash-checked —
    the dirty-data contract every 100 TB ingest boundary needs and no
    other query exercises: a CSV batch where a deterministic subset of
    lines is corrupted (the ``value`` field replaced by non-numeric
    text on every ``event_id % 7 == 0`` row) is read back through all
    three CSV parser modes, and the hash proves each mode's exact
    semantics:

    - PERMISSIVE + ``columnNameOfCorruptRecord``: good rows parse
      fully (``permissive_ok`` row: count + exact DECIMAL(27,6) value
      sum + id checksum over the clean subset); bad rows are neither
      dropped nor fatal — the RAW LINE is preserved in the corrupt
      column, and the query proves recoverability by re-parsing the
      intact leading field out of the quarantined raw lines
      (``permissive_quarantined`` row's ``id_sum`` can only match the
      oracle's ``sum(event_id) WHERE event_id % 7 = 0`` if every
      corrupt line survived byte-intact into quarantine).
    - DROPMALFORMED: silently drops the bad rows — its aggregate must
      equal the permissive-ok aggregate exactly. Pinned caveat
      (property-tested): a column-pruned bare ``count()`` SKIPS
      parsing, so DROPMALFORMED cannot detect malformed rows there and
      counts every line — this query's aggregate references real
      columns, which forces the parse.
    - FAILFAST: must raise on the first malformed line (contract-tested
      in tests/test_round10_queries.py, not hashable).

    The reference has no quarantine path — a failed record kills the
    worker's message visibility and the job retries it forever
    (ref Workers.java:186-187 emits an in-band error line only for
    UNKNOWN operations; parse failures are unhandled). This query is
    the scalable restatement: corrupt input is data, not an exception.

    Scale notes: quarantining is a property of the SCAN — one
    distributed pass, no extra shuffle beyond the final O(1)-row
    aggregate; the corrupt column costs nothing on clean rows (null).
    The `.cache()` on the permissive read is load-bearing and bounded:
    Spark disallows filtering a CSV relation by the corrupt column
    alone without it (the parser would need a second pass to know
    which rows failed — SPARK-21610), and what is cached is the
    PROJECTED 4-column slice, not the raw bytes. Scratch files removed
    before returning (Q132's pattern); the returned aggregate is 3 rows.
    """
    import shutil
    import tempfile

    from project_map_reduce_spark.functions.det import sum6

    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .where(F.col("event_id") % 10 == 0)
    )
    # event_type values are single-token identifiers (no commas/quotes)
    # — premise of the hand-built CSV lines; the corrupt marker keeps
    # the id field intact so quarantine recovery has something to prove.
    corrupt = F.col("event_id") % 7 == 0
    line = F.concat_ws(
        ",",
        F.col("event_id").cast("string"),
        F.col("event_type"),
        F.when(corrupt, F.concat(F.lit("!corrupt!"), F.col("event_id")))
        .otherwise(F.col("value").cast("string")),
    )
    tmp = tempfile.mkdtemp(prefix="q_corrupt_quarantine_")
    schema_ok = "event_id long, event_type string, value double"
    schema_q = schema_ok + ", _quarantine string"
    try:
        ev.select(line.alias("value")).write.text(f"{tmp}/csv")

        perm = (
            spark.read.schema(schema_q)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_quarantine")
            .csv(f"{tmp}/csv")
        ).cache()
        try:
            ok = perm.where(F.col("_quarantine").isNull()).agg(
                F.lit("permissive_ok").alias("status"),
                F.count(F.lit(1)).alias("n_rows"),
                sum6("value").alias("sum_value"),
                F.sum("event_id").alias("id_sum"),
            )
            # Recover ids from the RAW quarantined lines, not the parsed
            # columns — proves byte-intact preservation.
            quar = perm.where(F.col("_quarantine").isNotNull()).agg(
                F.lit("permissive_quarantined").alias("status"),
                F.count(F.lit(1)).alias("n_rows"),
                F.lit(None).cast("double").alias("sum_value"),
                F.sum(
                    F.split(F.col("_quarantine"), ",").getItem(0).cast("long")
                ).alias("id_sum"),
            )
            dropped = (
                spark.read.schema(schema_ok)
                .option("mode", "DROPMALFORMED")
                .csv(f"{tmp}/csv")
                .agg(
                    F.lit("dropmalformed").alias("status"),
                    F.count(F.lit(1)).alias("n_rows"),
                    sum6("value").alias("sum_value"),
                    F.sum("event_id").alias("id_sum"),
                )
            )
            rows = ok.unionByName(quar).unionByName(dropped).collect()
        finally:
            perm.unpersist()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return local_rows(
        spark,
        rows,
        schema="status string, n_rows bigint, sum_value double, id_sum bigint",
    )


@register(
    "q_file_provenance",
    oracle=f"""
    SELECT CAST(event_id % 4 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT)     AS n_rows,
           CAST(1 AS BIGINT)            AS n_files,
           CAST(count(*) - 1 AS BIGINT) AS max_row_index,
           {SUM6.format(expr="value")}  AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def q_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q151: the ``_metadata`` hidden column — per-FILE provenance read
    straight from the scan, the lineage primitive (which file did this
    row come from, at which position) every 100 TB audit/debug loop
    needs and no other query exercises. The events slice is written
    partitioned by ``bucket = event_id % 4`` (one file per partition
    directory — a single writer task pins that, see below), read back,
    and each row's ``_metadata.file_path`` / ``_metadata.row_index``
    drive the aggregate: ``bucket`` is re-derived FROM THE FILE PATH
    (not from data — a row routed to the wrong directory breaks the
    hash), ``n_files`` counts distinct physical files per bucket, and
    ``max_row_index`` must equal ``n_rows − 1`` (parquet row_index is
    0-based and contiguous per file, so a gap or overlap — a torn scan
    — breaks the equality). ``sum_value`` ties file placement back to
    row CONTENT.

    ``_metadata`` is resolved at the scan (a metadata struct attached
    by the FileFormat reader, constant-folded per file/row-group) —
    requesting it costs no extra I/O and no shuffle; it simply must be
    SELECTED explicitly (never appears in ``*``).

    Determinism note: the scratch write goes through ``coalesce(1)``
    so ONE task writes all four partition directories → exactly one
    file each, making ``n_files``/``max_row_index`` oracle-expressible.
    Production provenance does not need that pin — per-file contiguity
    of row_index holds at any file count; it is only the per-BUCKET
    single-file arithmetic that wants a deterministic layout. Scratch
    removed before returning; the result is 4 rows.

    Reference parity: the reference's per-record result lines carry the
    source object URL as provenance (ref Workers.java:131-148 emits
    "<operation>: <inputUrl> <outputUrl>"); ``_metadata.file_path`` is
    the scan-native restatement.
    """
    import shutil
    import tempfile

    from project_map_reduce_spark.functions.det import sum6

    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "value")
        .withColumn("bucket", F.col("event_id") % 4)
    )
    tmp = tempfile.mkdtemp(prefix="q_file_provenance_")
    try:
        ev.coalesce(1).write.partitionBy("bucket").parquet(f"{tmp}/part")
        back = spark.read.parquet(f"{tmp}/part").select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.row_index").alias("row_index"),
            "value",
        )
        out = (
            back.withColumn(
                "bucket",
                F.regexp_extract("file_path", r"bucket=(\d+)", 1).cast("long"),
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct("file_path").alias("n_files"),
                F.max("row_index").alias("max_row_index"),
                sum6("value").alias("sum_value"),
            )
        )
        rows = out.collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return local_rows(
        spark,
        rows,
        schema="bucket bigint, n_rows bigint, n_files bigint, "
        "max_row_index bigint, sum_value double",
    )


@register(
    "q_jdbc_roundtrip",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT)          AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           {SUM6.format(expr="value")}       AS sum_value,
           CAST(sum(epoch_us(ts) % 1000000) AS BIGINT) AS micros_sum
    FROM events
    WHERE event_id % 10 = 0 AND value > 0
    GROUP BY event_type
    """,
)
def q_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q159: JDBC source/sink round-trip — the one connector family the
    inventory didn't yet exercise (file formats: Q132/Q144; custom
    Python sources: Q139/Q141; here: a RELATIONAL system over JDBC,
    embedded Derby standing in for the warehouse/OLTP endpoint). An
    events slice is published to a Derby table via ``df.write.jdbc``,
    then read back as a PARTITIONED JDBC scan — ``column/lowerBound/
    upperBound/numPartitions`` split the table into 8 range-disjoint
    parallel queries (bounds from the slice's own min/max id), which is
    the only JDBC read shape that scales: the default single-query read
    serializes the whole table through one connection. A ``value > 0``
    predicate must reach the remote system as a PUSHED filter (``*``-
    starred in the plan = evaluated by Derby, not re-checked by Spark —
    plan-asserted in tests) and the aggregate hash-checks fidelity:
    ``micros_sum`` pins sub-second TIMESTAMP precision through the JDBC
    type bridge, DECIMAL(27,6) sums pin float round-trip, distinct
    counts pin row multiplicity.

    Scale notes: at 100 TB the JDBC endpoint is the bottleneck, not
    Spark — partitioned reads bound per-connection transfer, and the
    pushed predicate ships the WHERE to the database so only matching
    rows cross the wire. The embedded-Derby scratch DB is removed
    before returning (Q132's pattern); timestamps round-trip through
    the session-UTC JDBC bridge (NTZ values written as UTC wall time).
    """
    import shutil
    import tempfile

    from project_map_reduce_spark.functions.det import sum6

    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .where(F.col("event_id") % 10 == 0)
    )
    if ev.schema["ts"].dataType.simpleString() == "timestamp_ntz":
        ev = ev.withColumn("ts", F.to_timestamp_ltz("ts"))
    lo, hi = ev.agg(F.min("event_id"), F.max("event_id")).first()
    if lo is None:
        raise ValueError("events slice is empty — nothing to round-trip")
    tmp = tempfile.mkdtemp(prefix="q_jdbc_roundtrip_")
    # Embedded Derby writes derby.log into user.dir unless told not to;
    # point it at the scratch dir BEFORE the driver class loads (the
    # property is read once at engine boot).
    spark._jvm.System.setProperty("derby.stream.error.file", f"{tmp}/derby.log")
    url = f"jdbc:derby:{tmp}/db;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    try:
        ev.write.jdbc(url, "events_rt", mode="overwrite", properties=props)
        back = spark.read.jdbc(
            url,
            "events_rt",
            column="event_id",
            lowerBound=int(lo),
            upperBound=int(hi) + 1,
            numPartitions=8,
            properties=props,
        )
        micros = F.unix_micros(F.col("ts").cast("timestamp_ltz")) % 1000000
        out = (
            back.where(F.col("value") > 0)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.countDistinct("user_id").alias("n_users"),
                sum6("value").alias("sum_value"),
                F.sum(micros).alias("micros_sum"),
            )
        )
        rows = out.collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return local_rows(
        spark,
        rows,
        schema="event_type string, n_events bigint, n_users bigint, "
        "sum_value double, micros_sum bigint",
    )


@register(
    "q_pyds_sink",
    oracle=f"""
    SELECT event_type,
           CAST(ts AS DATE)            AS day,
           CAST(count(*) AS BIGINT)    AS n_events,
           {SUM6.format(expr="value")} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_pyds_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q161: Python DataSource API custom batch SINK — the writer third
    of the custom-source surface (Q139 read, Q141 stream; here
    ``DataSource.writer``), restating the reference's REPORT SINK
    (result lines gathered and wrapped into an HTML report,
    ref Manager.java:287-312 + LocalApp.java:312-343) as the two-phase
    writer protocol: each task streams its partition into a part file
    and returns a commit message (filename + row count + order-
    independent content checksum), and the driver's ``commit()`` —
    which Spark runs exactly once, discarding messages from failed
    attempts — publishes the ``_MANIFEST`` and the wrapped
    ``report.html``.

    The hash closes the loop THROUGH the sink: the per-(type, day)
    aggregate is written via ``format("pmrs_report")`` across 4
    repartitioned tasks, read BACK by parsing the committed part files,
    validated against the manifest (total rows AND the xor checksum
    recomputed from the parsed lines must equal what commit() recorded
    — a dropped/duplicated/mangled line breaks either), and returned;
    the oracle recomputes the aggregate from the raw table. A row lost
    in a task, a task committed twice, or a commit that ran without all
    messages is caught at one of the three layers.

    Scale shape: per-task writes are coordination-free; commit is
    O(tasks) over tiny messages — the FileFormatWriter two-phase shape.
    Float cells are 6dp-rounded BEFORE rendering so the text round-trip
    is exact. Scratch removed before returning (Q132's pattern).
    """
    import shutil
    import tempfile

    from project_map_reduce_spark.functions.det import sum6
    from project_map_reduce_spark.sources.pyds_sink import (
        _line_hash,
        register_report_sink,
    )

    register_report_sink(spark)
    agg = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            sum6("value").alias("sum_value"),
        )
    )
    tmp = tempfile.mkdtemp(prefix="q_pyds_sink_")
    out = f"{tmp}/report"
    try:
        (
            agg.repartition(4)
            .write.format("pmrs_report")
            .option("path", out)
            .mode("append")
            .save()
        )
        head, *body = open(f"{out}/_MANIFEST").read().splitlines()
        manifest = head.split("\t")
        want_total, want_xor = int(manifest[1]), int(manifest[3])
        # Read ONLY manifest-listed parts (ADVICE r10): the manifest IS
        # the commit — an orphan part from a retried task whose commit
        # message was discarded must never count against the ledger.
        parts = [entry.split("\t")[0] for entry in body]
        got_lines = []
        for p in parts:
            with open(f"{out}/{p}", encoding="utf-8") as f:
                got_lines.extend(ln.rstrip("\n") for ln in f)
        got_xor = 0
        for ln in got_lines:
            got_xor ^= _line_hash(ln)
        if len(got_lines) != want_total or got_xor != want_xor:
            raise ValueError(
                "q_pyds_sink: committed parts disagree with manifest "
                f"(rows {len(got_lines)} vs {want_total}, "
                f"xor {got_xor} vs {want_xor})"
            )
        rows = [
            (c[0], c[1], int(c[2]), float(c[3]))
            for c in (ln.split("\t") for ln in got_lines)
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    import datetime as _dt

    return local_rows(
        spark,
        [(t, _dt.date.fromisoformat(d), n, v) for t, d, n, v in rows],
        schema="event_type string, day date, n_events bigint, sum_value double",
    )


@register(
    "q_agg_pushdown",
    oracle="""
    SELECT CAST(event_id % 4 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT)     AS n_rows,
           CAST(min(event_id) AS BIGINT) AS min_id,
           CAST(max(event_id) AS BIGINT) AS max_id,
           round(min(value), 6)          AS min_value,
           round(max(value), 6)          AS max_value
    FROM events
    GROUP BY 1
    """,
)
def q_agg_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q162: parquet AGGREGATE PUSHDOWN — MIN/MAX/COUNT answered from
    row-group FOOTER STATISTICS without reading a single data page, the
    last scan-layer shortcut the skipping family (Q118 partition prune,
    Q124 cluster prune, Q133 bloom prune, Q136 DPP) doesn't cover: those
    skip data; this never touches it. The events slice is written
    partitioned by ``bucket = event_id % 4``; under
    ``spark.sql.parquet.aggregatePushdown=true`` on the v2 read path the
    whole GROUP-BY-partition-column MIN/MAX/COUNT plan collapses to a
    footer walk — ``PushedAggregation: [MIN(...), MAX(...), COUNT(*)]``
    + ``PushedGroupBy: [bucket]`` in the scan node (plan-asserted in
    tests, along with the negative: adding SUM — not derivable from
    stats — silently disables the pushdown, which is why the query's
    aggregate set is exactly the pushable three).

    At 100 TB this is the difference between a metadata operation
    (O(row groups) footer reads) and a full-corpus scan for every
    data-profiling MIN/MAX/COUNT — the same class of win as Q118's
    listing-time pruning, applied to the aggregate itself.

    Engine notes: the two confs (aggregatePushdown + the v2 parquet
    read path) are set for the scratch read and RESTORED in finally —
    v1 is the session default and other queries depend on its plan
    shapes. Both engines see identical values: parquet min/max stats
    are exact for int64/double (no truncation at these widths), and the
    result is re-verified against the footer-free plan in tests.
    """
    import shutil
    import tempfile

    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "value")
        .withColumn("bucket", F.col("event_id") % 4)
    )
    tmp = tempfile.mkdtemp(prefix="q_agg_pushdown_")
    prev_push = spark.conf.get("spark.sql.parquet.aggregatePushdown")
    prev_v1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    try:
        ev.write.partitionBy("bucket").parquet(f"{tmp}/part")
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        out = (
            spark.read.parquet(f"{tmp}/part")
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("event_id").alias("min_id"),
                F.max("event_id").alias("max_id"),
                F.round(F.min("value"), 6).alias("min_value"),
                F.round(F.max("value"), 6).alias("max_value"),
            )
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        if "PushedAggregation: [" not in plan or "COUNT(*)" not in plan:
            raise AssertionError(
                "q_agg_pushdown: aggregate was not pushed to the parquet "
                "footer — plan regressed to a data scan"
            )
        rows = out.collect()
    finally:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", prev_push)
        spark.conf.set("spark.sql.sources.useV1SourceList", prev_v1)
        shutil.rmtree(tmp, ignore_errors=True)
    return local_rows(
        spark,
        rows,
        schema="bucket bigint, n_rows bigint, min_id bigint, max_id bigint, "
        "min_value double, max_value double",
    )
