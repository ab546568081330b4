"""B.4/B.8 extension: remaining ANSI-SQL analytic surface — ordered
string aggregation, arg-min/max, UNPIVOT, correlated scalar subquery,
and a time-dimension rollup (Q76-Q80).

These round out the SQL surface a reference user would expect from a
drop-in analytics engine. Every query is a single-pass grouped
aggregate or a Catalyst-decorrelated join — no new physical shapes,
which is the point: the engine's scale story (partial+final agg,
broadcast small sides, no cartesians) carries unchanged.

Reference analog: none (the reference has no SQL layer at all,
SURVEY.md §2 Part A "does NOT implement" list); all rows are `ext`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_map_reduce_spark.functions.det import r6d
from project_map_reduce_spark.registry import register
from project_map_reduce_spark.tables import load, register_views


@register(
    "q_string_agg",
    oracle="""
    SELECT r.r_name,
           count(*) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations_csv
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q76: ordered string aggregation (LISTAGG/STRING_AGG) — nation
    names per region as a sorted CSV. Spark's collect_list is
    shuffle-order-nondeterministic, so determinism comes from sorting
    the collected array BEFORE joining — the canonical form of every
    ordered-listagg at scale (the sort is per-group, size = group
    cardinality, never a global sort). Groups here are tiny by
    construction (dimension tables); a 100 TB listagg over a hot key
    would cap or sketch the list instead (collect_list is unbounded
    state — same discipline as Q26's top-k vs full sort)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    j = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    return j.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
            "nations_csv"
        ),
    )


@register(
    "q_minmax_by",
    oracle="""
    SELECT c_mktsegment,
           round((max(struct_pack(a := round(c_acctbal, 6), k := c_custkey,
                                  n := c_name))).a, 6) AS top_acctbal,
           (max(struct_pack(a := round(c_acctbal, 6), k := c_custkey,
                            n := c_name))).k AS top_custkey,
           (max(struct_pack(a := round(c_acctbal, 6), k := c_custkey,
                            n := c_name))).n AS top_name,
           round((min(struct_pack(a := round(c_acctbal, 6), k := c_custkey,
                                  n := c_name))).a, 6) AS bot_acctbal,
           (min(struct_pack(a := round(c_acctbal, 6), k := c_custkey,
                            n := c_name))).k AS bot_custkey,
           (min(struct_pack(a := round(c_acctbal, 6), k := c_custkey,
                            n := c_name))).n AS bot_name
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q77: arg-max / arg-min (MAX_BY/MIN_BY) — the customer with the
    highest and lowest account balance per market segment. Plain
    ``max_by(x, y)`` is nondeterministic on ties in both engines, so the
    engine form is the struct-max idiom: max(struct(ordering..., payload))
    with the unique key inside the ordering — one mergeable aggregate,
    deterministic by construction, and the same trick the as-of join's
    running carry uses (operators/asof.py). Single partial+final
    HashAggregate; shuffle O(segments)."""
    c = load(spark, sf_dir, "customer")
    arg = F.struct(
        F.round("c_acctbal", 6).alias("a"),
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("n"),
    )
    g = c.groupBy("c_mktsegment").agg(
        F.max(arg).alias("__top"), F.min(arg).alias("__bot")
    )
    return g.select(
        "c_mktsegment",
        r6d(F.col("__top.a"), "top_acctbal"),
        F.col("__top.k").alias("top_custkey"),
        F.col("__top.n").alias("top_name"),
        r6d(F.col("__bot.a"), "bot_acctbal"),
        F.col("__bot.k").alias("bot_custkey"),
        F.col("__bot.n").alias("bot_name"),
    )


_UNPIVOT_STATUSES = ("F", "O", "P")


@register(
    "q_unpivot",
    oracle="""
    WITH pr AS (SELECT DISTINCT o_orderpriority FROM orders),
         st AS (SELECT * FROM (VALUES ('F'), ('O'), ('P')) s(status)),
         cnt AS (SELECT o_orderpriority, o_orderstatus AS status,
                        count(*) AS n
                 FROM orders GROUP BY 1, 2)
    SELECT pr.o_orderpriority,
           st.status,
           CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_orders
    FROM pr CROSS JOIN st
    LEFT JOIN cnt ON cnt.o_orderpriority = pr.o_orderpriority
                 AND cnt.status = st.status
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q78: UNPIVOT (wide → long) — melt Q64's pivoted status counts
    back into (priority, status, n) rows, zero-cells preserved. Spark's
    ``unpivot`` compiles to an Expand node (each input row emitted once
    per value column) — a narrow map, no shuffle beyond the pivot's own
    aggregate. The oracle builds the same dense grid with a tiny
    dims-only cross join (priorities × 3 statuses)."""
    o = load(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(_UNPIVOT_STATUSES))
        .agg(F.count(F.lit(1)))
    )
    wide = wide.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(s), F.lit(0)).cast("bigint").alias(s)
            for s in _UNPIVOT_STATUSES
        ],
    )
    long = wide.unpivot(
        ["o_orderpriority"], list(_UNPIVOT_STATUSES), "status", "n_orders"
    )
    return long.select("o_orderpriority", "status", "n_orders")


@register(
    "q_scalar_subquery",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_customers,
           CAST(count(*) FILTER (WHERE above_avg) AS BIGINT) AS n_above_avg,
           round(any_value(seg_avg), 6) AS seg_avg_acctbal
    FROM (
        SELECT c1.c_mktsegment,
               round(c1.c_acctbal, 6) >
                   round((SELECT avg(c2.c_acctbal) FROM customer c2
                          WHERE c2.c_mktsegment = c1.c_mktsegment), 6)
                   AS above_avg,
               (SELECT avg(c2.c_acctbal) FROM customer c2
                WHERE c2.c_mktsegment = c1.c_mktsegment) AS seg_avg
        FROM customer c1
    )
    GROUP BY c_mktsegment
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q79: correlated scalar subquery — customers above their own
    segment's average balance. Catalyst decorrelates the subquery into
    an aggregate-then-join (visible in the plan: one HashAggregate over
    customer grouped by segment, joined back on the segment key) — the
    textbook rewrite, executed as two scans + one small join rather
    than one subquery per row. At 100 TB the per-segment aggregate is
    tiny and broadcast; the big side is scanned once."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(*) AS n_customers,
               count(CASE WHEN above_avg THEN 1 END) AS n_above_avg,
               round(any_value(seg_avg), 6) AS seg_avg_acctbal
        FROM (
            SELECT c1.c_mktsegment,
                   round(c1.c_acctbal, 6) >
                       round((SELECT avg(c2.c_acctbal) FROM customer c2
                              WHERE c2.c_mktsegment = c1.c_mktsegment), 6)
                       AS above_avg,
                   (SELECT avg(c2.c_acctbal) FROM customer c2
                    WHERE c2.c_mktsegment = c1.c_mktsegment) AS seg_avg
            FROM customer c1
        )
        GROUP BY c_mktsegment
        """
    )


@register(
    "q_time_rollup",
    oracle="""
    SELECT CAST(grouping(d) + grouping(h) AS INTEGER) AS lvl,
           COALESCE(CAST(d AS DATE), DATE '1970-01-01')           AS day,
           COALESCE(CAST(h AS TIMESTAMP),
                    TIMESTAMP '1970-01-01 00:00:00')              AS hour,
           count(*) AS n_events,
           round(sum(value), 6) AS sum_value
    FROM (
        SELECT CAST(ts AS DATE) AS d, date_trunc('hour', ts) AS h, value
        FROM events
    )
    GROUP BY ROLLUP(d, h)
    """,
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q80: hypertable-style time rollup — event counts and value sums
    at hour grain, day grain, and grand total in ONE pass via
    ROLLUP(day, hour). This is the continuous-aggregate shape a
    time-series store maintains incrementally; in Spark it is a single
    Expand + partial/final HashAggregate (each row contributes to its
    3 grouping sets map-side), shuffle O(days + hours + 1) — not three
    scans. ``lvl``: 0 = hour cell, 1 = day subtotal, 2 = grand total.
    Rolled-up grain cells are epoch sentinels, not NULLs: ``lvl``
    already disambiguates, and NULL temporal cells render
    asymmetrically across result-fetch paths (None vs NaT) — the same
    hazard class as the HUGEINT float64 coercion that
    ``tools/parity.py`` screens oracles for."""
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        F.col("ts").cast("date").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "value",
    )
    return (
        base.rollup("day", "hour")
        .agg(
            # grouping() is only resolvable inside the rollup's agg list
            (F.grouping("day") + F.grouping("hour")).cast("int").alias("lvl"),
            F.count(F.lit(1)).alias("n_events"),
            r6d(F.sum("value"), "sum_value"),
        )
        .select(
            "lvl",
            F.coalesce(F.col("day"), F.lit("1970-01-01").cast("date")).alias(
                "day"
            ),
            F.coalesce(
                F.col("hour"),
                F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            ).alias("hour"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_not_exists",
    oracle="""
    SELECT c_nationkey,
           count(*) AS n_custs,
           CAST(sum(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) AS total_acctbal
    FROM customer c
    WHERE round(c_acctbal, 6) >
            (SELECT round(avg(c_acctbal), 6) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    """,
)
def q_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q93: correlated NOT EXISTS (TPC-H Q22 shape, phone column swapped
    for nationkey) — wealthy customers who never placed an order,
    counted per nation. Exercises the decorrelation path Q79's scalar
    subquery doesn't: Catalyst rewrites NOT EXISTS into a LEFT ANTI
    join on the correlation key, and the uncorrelated scalar average
    into a one-row broadcast — visible in the plan as exactly one
    anti-join plus one tiny aggregate, no per-row subquery execution.

    At 100 TB the anti-join shuffles customer and orders on custkey
    once; the average is a full-scan partial+final agg whose single-row
    result broadcasts. Both comparison sides are rounded to 6 dp so the
    selection boundary is engine-stable (same discipline as Q79).
    """
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_nationkey,
               count(*) AS n_custs,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   AS total_acctbal
        FROM customer c
        WHERE round(c_acctbal, 6) >
                (SELECT round(avg(c_acctbal), 6) FROM customer
                 WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_nationkey
        """
    )


@register(
    "q_not_in",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_custs,
           CAST(sum(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE)
               AS total_acctbal
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def q_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q121: uncorrelated NOT IN — the three-valued-logic sibling of
    Q93's NOT EXISTS, and the classic SQL correctness trap: if the
    subquery can produce a NULL, NOT IN must return UNKNOWN for every
    probe row (one NULL empties the whole result), so a plain anti
    join is WRONG under nullable keys. Spark compiles this to a
    NULL-AWARE anti join — visible in the plan as the LeftAnti
    BroadcastHashJoin's trailing ``isNullAware=true`` flag, which the
    plan audit pins — that checks the build side for nulls at runtime
    instead of silently degrading to anti-join semantics. A test
    injects a NULL into the build side and asserts the result empties,
    proving the 3VL path is live, not incidental.

    Scale shape: the null-aware variant requires a broadcast build
    side (Spark cannot shuffle-partition it, because one NULL anywhere
    must veto every partition) — fine here and in the common
    dim-subquery case; when the subquery side outgrows broadcast, the
    deployment rewrites to Q93's NOT EXISTS (null-safe by
    construction, shuffle-able), which is exactly the guidance the two
    queries pair to document.
    """
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(*) AS n_custs,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                   AS total_acctbal
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
        """
    )


@register(
    "q_lateral_topk",
    oracle="""
    SELECT s.source, d.doc_id, d.n_chars
    FROM (SELECT DISTINCT source FROM documents) s,
    LATERAL (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
        FROM documents x
        WHERE x.source = s.source
        ORDER BY n_chars DESC, doc_id
        LIMIT 3
    ) d
    """,
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q143: correlated LATERAL subquery — the SQL-surface twin of
    Q27's DataFrame top-k-per-group, and the last big analytic SQL
    form the inventory didn't exercise: for every source, the LATERAL
    derived table re-executes logically per outer row (top-3 docs by
    n_chars, doc_id tiebreak). What gets hash-checked is Catalyst's
    DECORRELATION of it: the executed plan contains NO per-group loop
    and no nested-loop join — the correlated ORDER BY ... LIMIT
    becomes a partial→final ``WindowGroupLimit`` (map-side top-k
    before the one hash exchange, verified below) + row_number
    filter, i.e. exactly the plan a hand-written window query would
    get. DuckDB executes the same LATERAL SQL natively, so both
    engines' correlated-subquery semantics (including the tie rule)
    must agree row-for-row.

    Scale shape: one partial top-k per partition (O(partitions × k)
    rows into the exchange), one hash exchange on source, one final
    top-k — never sources × corpus. The decorrelation is plan-asserted
    so a Spark regression to BroadcastNestedLoopJoin fails loudly
    rather than silently going quadratic at 100 TB.
    """
    register_views(spark, sf_dir, tables=("documents",))
    out = spark.sql(
        """
        SELECT s.source, d.doc_id, d.n_chars
        FROM (SELECT DISTINCT source FROM documents) s,
        LATERAL (
            SELECT doc_id, n_chars FROM documents x
            WHERE x.source = s.source
            ORDER BY n_chars DESC, doc_id
            LIMIT 3
        ) d
        """
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    if "WindowGroupLimit" not in plan or "BroadcastNestedLoopJoin" in plan:
        raise RuntimeError(
            "q_lateral_topk: LATERAL decorrelation regressed — expected "
            "a WindowGroupLimit top-k plan without a nested-loop join; "
            f"got:\n{plan[:2000]}"
        )
    return out


@register(
    "q_collated_group",
    oracle="""
    WITH d AS (
        SELECT CASE
                 WHEN doc_id % 3 = 0 THEN upper(source)
                 WHEN doc_id % 3 = 1
                   THEN upper(substr(source, 1, 1)) || substr(source, 2)
                 ELSE source
               END AS k,
               n_chars
        FROM documents
    )
    SELECT lower(k) AS source_ci,
           CAST(count(*) AS BIGINT)          AS n_docs,
           CAST(count(DISTINCT k) AS BIGINT) AS n_case_variants,
           CAST(sum(n_chars) AS BIGINT)      AS sum_chars
    FROM d
    GROUP BY lower(k)
    """,
)
def q_collated_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q149: COLLATION-aware grouping — the Spark 4.0 string-collation
    surface (collations are a first-class string-type property since
    4.0; no other query exercises them). A deterministically
    case-mangled key (``doc_id % 3`` selects UPPER / Capitalized / raw
    spellings of ``source``) is grouped under ``UTF8_LCASE`` collation:
    the COMPARISON SEMANTICS live in the type, so the hash aggregate
    itself — not a ``lower()`` wrapped around every reference — merges
    the case variants. ``n_case_variants`` re-collates the key back to
    ``UTF8_BINARY`` inside a distinct-count, proving the two collations
    coexist in one aggregate (binary distinct sees 3 spellings where
    the case-insensitive group key sees 1); the output label is
    canonicalized via ``lower(k COLLATE UTF8_BINARY)`` so the returned
    schema carries PLAIN strings (no collation leaks to the driver).

    Why it matters at 100 TB: a collated column pushes case-insensitive
    equality into every comparison site — joins, group keys, DISTINCT —
    without materializing a second normalized column (and without the
    correctness trap of forgetting one ``lower()`` at one site). The
    oracle models the classic normalize-by-hand form; the hash matches
    only if UTF8_LCASE grouping is exactly lower-case-equality grouping
    on this corpus.

    Scale shape: one hash aggregate, partial+final, same exchange
    profile as any groupBy; the collated comparison is JVM-side
    (no Python). Case-mangling premise: ``source`` values are ASCII
    (asserted loud — non-ASCII case folding differs legitimately
    between UTF8_LCASE and ``lower()``, and this query pins the ASCII
    contract only).
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    bad = docs.where(~F.col("source").rlike("^[\\x00-\\x7F]*$")).limit(1)
    if bad.count() > 0:
        raise ValueError(
            "q_collated_group: non-ASCII source value — the lower()-oracle "
            "equivalence is pinned for ASCII only"
        )
    m = F.col("doc_id") % 3
    k = (
        F.when(m == 0, F.upper("source"))
        .when(
            m == 1,
            F.concat(
                F.upper(F.substring("source", 1, 1)),
                F.expr("substr(source, 2)"),
            ),
        )
        .otherwise(F.col("source"))
    )
    return (
        docs.select(F.collate(k, "UTF8_LCASE").alias("k"), "n_chars")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(F.collate("k", "UTF8_BINARY")).alias(
                "n_case_variants"
            ),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(
            F.lower(F.collate("k", "UTF8_BINARY")).alias("source_ci"),
            "n_docs",
            "n_case_variants",
            "sum_chars",
        )
    )


@register(
    "q_sql_script",
    oracle="""
    WITH total AS (SELECT count(*) AS n FROM documents),
    pows AS (
        SELECT CAST(power(2, g) AS BIGINT) AS w
        FROM generate_series(0, 40) t(g)
    ),
    tails AS (
        SELECT w,
               (SELECT count(*) FROM documents WHERE n_chars >= w) AS tail
        FROM pows
    ),
    chosen AS (
        SELECT min(w) AS w FROM tails, total WHERE tail * 20 < total.n
    )
    SELECT chosen.w AS bucket_width,
           CAST(floor(n_chars / chosen.w) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents, chosen
    GROUP BY 1, 2
    """,
)
def q_sql_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q150: SQL SCRIPTING control flow + parameterized SQL — the two
    Spark 4.0 driver-side SQL surfaces no other query exercises, doing
    a real job: ADAPTIVE bucketING. A ``BEGIN … END`` script (DECLARE
    session-scoped variables, a ``WHILE … DO`` loop whose condition
    and body re-run scalar aggregate queries) doubles a power-of-two
    bucket width until fewer than 5% of documents sit above it — the
    data-dependent fixed point a static query cannot express (Spark
    rejected any multi-statement/control-flow form before 4.0) — and
    the final histogram then runs as a PARAMETERIZED query
    (``spark.sql(sql, args={"w": …})``, the named-marker binding
    surface) over the chosen width.

    The integer-exact loop condition (``tail * 20 >= total``) avoids
    float thresholds; the oracle replays the whole search closed-form
    (generate_series of candidate widths → min satisfying width), so
    the hash fails if the loop stops one doubling early or late OR the
    parameter binding mangles the width.

    Scale shape: each loop iteration is ONE distributed count with a
    pushed-down ``n_chars >= w`` predicate (O(log(max_chars))
    iterations total — 20-ish scans worst case, each cheaper than a
    full aggregate); only O(1) scalars (the script's variable frame)
    ever reach the driver. This is the idiomatic home for
    driver-side fixed-point refinement (the reference has no analog;
    its Manager loop is job orchestration, not data iteration —
    ref Manager.java:287-312).

    Engine note: ``spark.sql`` returns the script's LAST statement
    result; the script here ends with ``SELECT w`` (an O(1) row), and
    the histogram is deliberately OUTSIDE the script so the returned
    plan is an ordinary Catalyst aggregate a downstream consumer can
    compose with (scripts materialize eagerly).
    """
    register_views(spark, sf_dir, ("documents",))
    try:
        script = """
        BEGIN
          -- DECLARE defaults must be subquery-free (INVALID_DEFAULT_VALUE
          -- .SUBQUERY_EXPRESSION); aggregates bind via SET.
          DECLARE total BIGINT DEFAULT 0;
          DECLARE w BIGINT DEFAULT 1;
          DECLARE tail BIGINT DEFAULT 0;
          SET total = (SELECT count(*) FROM documents);
          SET tail = (SELECT count(*) FROM documents WHERE n_chars >= 1);
          WHILE tail * 20 >= total DO
            SET w = w * 2;
            SET tail = (SELECT count(*) FROM documents WHERE n_chars >= w);
          END WHILE;
          SELECT w;
        END
        """
        (row,) = spark.sql(script).collect()
        w = int(row[0])
        if w <= 0 or (w & (w - 1)) != 0:
            raise ValueError(f"q_sql_script: loop produced a non-power-of-2 width {w}")
        return spark.sql(
            """
            SELECT CAST(:w AS BIGINT)                   AS bucket_width,
                   CAST(floor(n_chars / :w) AS BIGINT)  AS bucket,
                   CAST(count(*) AS BIGINT)             AS n_docs,
                   CAST(sum(n_chars) AS BIGINT)         AS sum_chars
            FROM documents
            GROUP BY 1, 2
            """,
            args={"w": w},
        )
    finally:
        spark.catalog.dropTempView("documents")


@register(
    "q_listagg",
    oracle="""
    SELECT r_name,
           CAST(count(*) AS BIGINT) AS n_nations,
           string_agg(n_name, ',' ORDER BY n_name DESC) AS nations_desc
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def q_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q156: NATIVE ``listagg(...) WITHIN GROUP (ORDER BY ...)`` — the
    Spark 4.0 built-in that obsoletes Q76's workaround (collect_list →
    array_sort → array_join, kept in-inventory as the pre-4.0 form and
    the deliberate contrast): ordering now lives INSIDE the aggregate,
    evaluated engine-side, so the shuffle carries the rows once and the
    sort is per-group at the aggregation site — no array materialized
    in the plan. DESC order (Q76 sorts ASC) makes the hash prove the
    WITHIN GROUP clause is real ordering, not incidental set equality.

    Unbounded-state caveat (same as Q76): a string aggregate's state is
    O(group payload); per-region nation lists are tiny, and at 100 TB
    listagg over a hot key needs the same cap/sample discipline as any
    collect. Plan note: one partial+final aggregate over the broadcast
    nation⋈region join.
    """
    reg = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nat = load(spark, sf_dir, "nation").select("n_regionkey", "n_name")
    joined = nat.join(F.broadcast(reg),
                      nat.n_regionkey == reg.r_regionkey).select(
        "r_name", "n_name"
    )
    joined.createOrReplaceTempView("q156_rn")
    try:
        return spark.sql(
            """
            SELECT r_name,
                   count(*) AS n_nations,
                   listagg(n_name, ',')
                       WITHIN GROUP (ORDER BY n_name DESC) AS nations_desc
            FROM q156_rn
            GROUP BY r_name
            """
        )
    finally:
        # Lazily-evaluated result still resolves: the analyzed plan
        # captured the view; dropping only removes the catalog entry.
        spark.catalog.dropTempView("q156_rn")


@register(
    "q_sql_ergonomics",
    oracle="""
    SELECT o_orderpriority AS priority,
           o_orderstatus   AS status,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
               AS sum_price,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                 / count(*), 6) AS avg_price
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    """,
)
def q_sql_ergonomics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q157: SQL PIPE SYNTAX (Spark 4.0 ``|>``) + the ergonomics bundle,
    each clause doing real work — the dialect-modernization surface a
    user migrating hand-written SQL hits immediately:

    - ``FROM orders |> AGGREGATE … GROUP BY …`` — the pipe form reads
      in DATAFLOW order (source → aggregate → project → sort), the
      linearization the DataFrame API taught everyone; Catalyst plans
      it identically to the nested classic form (plan-asserted: same
      single partial+final hash aggregate);
    - ``IDENTIFIER(:k)`` — the grouping keys arrive as named ARGUMENTS
      resolved as identifiers at plan time: injection-safe dynamic SQL
      (string-interpolated column names are the classic hole);
    - lateral column alias — ``avg_raw`` is defined and then REFERENCED
      in the same pipe SELECT (``round(avg_raw, 6)``), no repeated
      expression or subquery (pre-3.4 required both);
    - a final ``|> SELECT`` prunes the scratch alias, and
      ``|> ORDER BY ALL`` gives schema-stable total ordering.

    The oracle is the fully spelled-out classic form — the hash proves
    every shorthand resolves to exactly the pre-modern semantics. All
    of it is ANALYSIS-time sugar: zero runtime cost (test-asserted:
    one hash aggregate, no extra exchange).
    """
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        FROM orders
        |> AGGREGATE count(*) AS n_orders,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                         AS sum_price
           GROUP BY IDENTIFIER(:k1) AS priority, IDENTIFIER(:k2) AS status
        |> SELECT priority, status, n_orders, sum_price,
                  sum_price / n_orders AS avg_raw,
                  round(avg_raw, 6) AS avg_price
        |> SELECT priority, status, n_orders, sum_price, avg_price
        |> ORDER BY ALL
        """,
        args={"k1": "o_orderpriority", "k2": "o_orderstatus"},
    )


@register(
    "q_sql_udf",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
               AS sum_price,
           CAST(sum(CAST(CASE WHEN o.o_totalprice > 150000
                              THEN o.o_totalprice * 0.9
                              ELSE o.o_totalprice END
                         AS DECIMAL(27,6))) AS DOUBLE) AS sum_tier
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q165: SQL-DEFINED functions (Spark 4.1 ``CREATE FUNCTION …
    RETURN``) — business logic as catalog objects, in both shapes at
    once: a SCALAR SQL UDF (``f_tier_price``: the discount-policy CASE)
    and a SQL TABLE FUNCTION (``f_cust_orders(k) RETURNS TABLE``) used
    with a CORRELATED ``LATERAL`` argument (each customer's key flows
    into the function body's predicate). This is the third function
    tier after built-ins and Python UDFs — and unlike Python, SQL
    functions INLINE at analysis time: the optimized plan is the plain
    join + CASE + aggregate (zero runtime overhead, no Python workers,
    no serialization boundary) — asserted in tests: no BatchEvalPython,
    no BroadcastNestedLoopJoin, the TVF decorrelates into an ordinary
    equi-join exactly like Q143's LATERAL subquery.

    Why it matters at 100 TB: shared business definitions (pricing
    tiers, eligibility predicates) live ONCE in the catalog and every
    caller gets the optimizer-visible inlined form — pushdown and
    pruning work THROUGH the function boundary, which no external UDF
    can offer. The oracle is the hand-inlined SQL, so the hash proves
    inlining semantics exactly.

    Functions are session-scoped TEMPORARY and re-created per call
    (idempotent ``CREATE OR REPLACE``); names are q165-prefixed to
    avoid session collisions.
    """
    register_views(spark, sf_dir, ("customer", "orders"))
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION q165_tier_price(p DOUBLE)
        RETURNS DOUBLE
        RETURN CASE WHEN p > 150000 THEN p * 0.9 ELSE p END
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION q165_cust_orders(k BIGINT)
        RETURNS TABLE (o_totalprice DOUBLE)
        RETURN SELECT o_totalprice FROM orders WHERE o_custkey = k
        """
    )
    return spark.sql(
        """
        SELECT c.c_mktsegment,
               count(*) AS n_orders,
               CAST(sum(CAST(f.o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                   AS sum_price,
               CAST(sum(CAST(q165_tier_price(f.o_totalprice)
                             AS DECIMAL(27,6))) AS DOUBLE) AS sum_tier
        FROM customer c, LATERAL q165_cust_orders(c.c_custkey) f
        GROUP BY c.c_mktsegment
        """
    )


@register(
    "q_subquery_df",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_rich_active,
           round(avg(c.c_acctbal), 6) AS avg_bal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      AND c.c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    GROUP BY c.c_mktsegment
    """,
)
def q_subquery_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q170: SUBQUERY EXPRESSIONS in the DataFrame API — Spark 4's
    ``DataFrame.exists()`` (correlated, outer reference marked with
    ``Column.outer()``) and ``DataFrame.scalar()`` (uncorrelated) used
    directly as Columns inside ``where`` (Q79/Q93/Q121 are the SQL
    spellings; Q169 the lateral-join sibling — this completes the
    programmatic subquery surface): customers that placed at least one
    order AND sit above the global average balance, counted per market
    segment. The hash checks Spark's rewrite of both expression forms —
    exists into a left-semi join, the scalar into a broadcast
    one-row aggregate — against DuckDB's textbook planning of the
    identical SQL.

    API caveat pinned here: classic (non-Connect) PySpark analyzes
    eagerly, so a CORRELATED ``.scalar()``/``.agg()`` raises
    UNRESOLVED_COLUMN at construction — correlated aggregation goes
    through ``lateralJoin`` (Q169) or SQL (Q79); ``exists()`` accepts
    correlation fine.

    Scale shape: the semi join shuffles on the key with AQE free to
    broadcast the smaller side; the scalar aggregate is one exchange to
    a single row broadcast into the filter — no per-row subquery
    re-execution anywhere.
    """
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    o = load(spark, sf_dir, "orders").select("o_custkey")
    has_order = o.where(
        F.col("o_custkey") == F.col("c_custkey").outer()
    ).exists()
    global_avg = c.agg(F.avg("c_acctbal")).scalar()
    return (
        c.where(has_order & (F.col("c_acctbal") > global_avg))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rich_active"),
            r6d(F.avg("c_acctbal"), "avg_bal"),
        )
    )
