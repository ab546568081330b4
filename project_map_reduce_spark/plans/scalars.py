"""B.8 scalar functions: string / date / math / json / array / map
(Q33-Q38).

All JVM-side ``pyspark.sql.functions`` — zero Python in the data path,
everything inside whole-stage codegen. Cross-engine type quirks (Spark
``ceil`` → bigint, ``date_add`` → date, ``year`` → int) are pinned with
explicit casts on the oracle side so schemas agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_map_reduce_spark.functions.det import r6d
from project_map_reduce_spark.registry import register
from project_map_reduce_spark.tables import load, register_views


@register(
    "q_string_funcs",
    oracle=r"""
    SELECT p_partkey,
           upper(p_name)                          AS name_upper,
           lower(p_type)                          AS type_lower,
           substr(p_name, 1, 8)                   AS name_prefix,
           trim(p_name)                           AS name_trim,
           concat(p_brand, ':', p_type)           AS brand_type,
           CAST(length(p_name) AS INT)            AS name_len,
           regexp_extract(p_name, '^(\w+)', 1)    AS first_word,
           replace(p_type, ' ', '_')              AS type_snake
    FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery over part (ref analog: the only string
    ops in the reference are split/substring plumbing, Workers.java:237)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
    )


@register(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)     AS order_year,
           CAST(month(o_orderdate) AS INT)    AS order_month,
           CAST(quarter(o_orderdate) AS INT)  AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime function battery over orders."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.date_add(F.col("o_orderdate"), 30).alias("due_date"),
    )


@register(
    "q_datediff",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(date_diff('day', o_orderdate, l_shipdate) AS INT) AS ship_delay_days
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def q_datediff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """datediff across a join: days from order to ship per lineitem."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    return j.select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias(
            "ship_delay_days"
        ),
    )


@register(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1)                        AS price_r1,
           abs(l_discount - 0.05)                           AS disc_dev,
           CAST(ceil(l_quantity) AS BIGINT)                 AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT)                AS qty_floor,
           round(sqrt(l_extendedprice), 6)                  AS price_sqrt,
           round(ln(l_extendedprice + 1), 6)                AS price_ln,
           round(pow(1 + l_tax, 2), 6)                      AS tax_sq
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery over lineitem numerics (round-6 canonical
    form absorbs last-ulp libm differences between JVM and C)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        r6d(F.sqrt("l_extendedprice"), "price_sqrt"),
        r6d(F.log(F.col("l_extendedprice") + 1), "price_ln"),
        r6d(F.pow(F.lit(1) + F.col("l_tax"), 2), "tax_sq"),
    )


@register(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse events.props JSON, extract $.k, aggregate by type.
    ``get_json_object`` is a codegen'd JVM path (Jackson), no UDF."""
    ev = load(spark, sf_dir, "events")
    # Parse once in the projection; both aggregates then read the column
    # (inlining the parse into each agg child doubles the Jackson work).
    parsed = ev.select(
        "event_type", F.get_json_object("props", "$.k").cast("bigint").alias("k")
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        r6d(F.avg("k"), "avg_k"),
    )


@register(
    "q_variant_json",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           count(*) FILTER (WHERE json_extract_string(props, '$.missing') IS NOT NULL)
               AS n_missing,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q138: the VARIANT semi-structured path (Spark 4.x,
    ``spark-variant`` in the distro) — Q36's props extraction restated
    the modern way (VERDICT r9 item 4): ``parse_json`` decodes each
    props string ONCE into the binary VARIANT encoding, and every
    access after that is ``variant_get`` navigating the encoded value
    (here through a nested wrapper object, so a multi-step ``$.a.b``
    path traversal is what gets hash-checked) — no re-parse per field,
    which is the 100 TB difference vs ``get_json_object``: k accesses
    of a document cost one parse + k binary probes instead of k full
    Jackson passes. ``try_variant_get`` covers the absent-path contract
    (returns NULL, never throws — counted as ``n_missing = 0`` so the
    oracle cross-checks the same absent access via JSON NULL
    semantics).

    All expressions are codegen'd JVM variant primitives (no UDF, no
    Python); the aggregate is one hash agg over 5 groups. At 100 TB,
    VARIANT columns additionally shred into parquet struct columns on
    write (the storage-side win); here the source is a JSON string
    column so the decode happens in the projection.
    """
    ev = load(spark, sf_dir, "events")
    v = F.parse_json(
        F.concat(F.lit('{"payload":'), F.col("props"), F.lit("}"))
    )
    parsed = ev.select(
        "event_type",
        F.variant_get(v, "$.payload.k", "bigint").alias("k"),
        F.try_variant_get(v, "$.payload.missing", "string").alias("absent"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("absent").alias("n_missing"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        r6d(F.avg("k"), "avg_k"),
    )


@register(
    "q_array_ops",
    oracle="""
    SELECT word,
           count(*) AS n_occurrences,
           count(DISTINCT doc_id) AS n_docs
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    )
    GROUP BY word
    """,
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split → explode → word counts over the corpus (canonical
    single-space tokenizer, FIXTURES.md). Explode happens after the
    scan projection prunes to (doc_id, text); the groupBy combines
    map-side so shuffle rows ≈ per-partition vocab, not token count."""
    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    return words.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


@register(
    "q_map_ops",
    oracle="""
    SELECT source,
           count(*) FILTER (WHERE lang = 'es') AS n_es,
           count(*) FILTER (WHERE lang = 'zh') AS n_zh
    FROM documents
    GROUP BY source
    """,
)
def q_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build map(lang → count) per source, then element_at lookups —
    the oracle computes the same scalars via filtered counts (different
    computation, same value: the point of the check)."""
    d = load(spark, sf_dir, "documents")
    per_lang = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    maps = per_lang.groupBy("source").agg(
        F.map_from_entries(F.collect_list(F.struct("lang", "n"))).alias("lang_map")
    )
    zero = F.lit(0).cast("bigint")
    return maps.select(
        "source",
        F.coalesce(F.element_at("lang_map", "es"), zero).alias("n_es"),
        F.coalesce(F.element_at("lang_map", "zh"), zero).alias("n_zh"),
    )


@register(
    "q_try_arith",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(CASE WHEN event_id % 5 = 0 THEN 1 END) AS BIGINT)
               AS n_parsed,
           CAST(sum(CASE WHEN event_id % 5 = 0
                         THEN CAST(value AS DECIMAL(27,6)) END) AS DOUBLE)
               AS sum_parsed,
           CAST(count(CASE WHEN event_id % 2 = 1 THEN 1 END) AS BIGINT)
               AS n_safe_div
    FROM events
    GROUP BY event_type
    """,
)
def q_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q158: ANSI-safe dirty-numeric ingestion — the ``try_*`` family
    under Spark 4's ANSI-ON default, Q147's quarantine discipline at
    EXPRESSION granularity: in ANSI mode a plain ``CAST('n/a' AS
    DOUBLE)`` or a division by zero KILLS THE JOB (pinned by the
    canary test — the 100 TB failure mode where one bad cell aborts a
    million-task stage), and ``try_cast`` / ``try_divide`` are the
    per-cell null-on-error forms that keep the scan running. A dirty
    string column is derived deterministically (``event_id % 5``:
    clean float repr / currency-prefixed / empty / trailing garbage /
    'n/a' — only class 0 parses), and zero divisors via
    ``event_id % 2``; the aggregate counts exactly which cells
    survived, so the hash fails if try_cast admits any malformed class
    (or rejects the clean one) or try_divide nulls the wrong rows.
    Double→string→double round-trip exactness (class 0) rides Spark's
    shortest-round-trip float formatting — the same contract Q132's
    text leg pins.

    Scale shape: pure narrow projection + one hash aggregate; every
    ``try_*`` is codegen'd JVM-side (no Python, plan-asserted in
    tests) — error-tolerance costs nothing over the plain expressions.
    """
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    gen = F.col("event_id") % 5
    dirty = (
        F.when(gen == 0, F.col("value").cast("string"))
        .when(gen == 1, F.concat(F.lit("$"), F.col("value").cast("string")))
        .when(gen == 2, F.lit(""))
        .when(gen == 3, F.concat(F.col("value").cast("string"), F.lit("x")))
        .otherwise(F.lit("n/a"))
    )
    parsed = dirty.try_cast("double")  # Column.try_cast (no F.try_cast)
    safe_div = F.expr("try_divide(value, CAST(event_id % 2 AS DOUBLE))")
    from project_map_reduce_spark.functions.det import sum6

    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(parsed).alias("n_parsed"),
        sum6(parsed).alias("sum_parsed"),
        F.count(safe_div).alias("n_safe_div"),
    )


@register(
    "q_variant_explode",
    oracle="""
    WITH kv AS (
        SELECT 'bucket' AS key,
               CAST(user_id % 5 AS VARCHAR) AS val
        FROM events
        UNION ALL
        SELECT 'event_type' AS key,
               '"' || event_type || '"' AS val
        FROM events
    )
    SELECT key,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT val) AS BIGINT) AS n_values,
           min(val) AS min_val,
           max(val) AS max_val
    FROM kv
    GROUP BY key
    """,
)
def q_variant_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q175: the ``variant_explode`` TABLE FUNCTION — VARIANT's
    destructuring half (Q138 navigates with variant_get, Q142 stores;
    this LATERAL-explodes an encoded OBJECT into (pos, key, value)
    rows, the generic form a pipeline needs when the keys are NOT
    known at plan time). Each event builds a two-key object
    (to_json(struct(...)) → parse_json — one encode per row),
    variant_explode fans it out, and the per-key profile (row count,
    distinct values, min/max of the JSON-rendered value) must equal
    the oracle's direct per-column aggregation — the equivalence
    proves the explode loses nothing, invents nothing, and renders
    values canonically (``to_json`` of a VARIANT scalar: bare number
    vs quoted string — matched in the oracle by construction).

    Scale shape: variant_explode is a codegen'd JVM generator (same
    Generate node class as explode — no Python, no shuffle of its
    own); the output is key-value-shaped exactly like Q119's melt.
    The profile aggregates in TWO levels deliberately (the Q119/Q128
    collapse pattern): level 1 hash-aggregates the full exploded
    relation down to distinct (key, value) pairs with their counts —
    string group KEYS ride the hash-agg fast path — and only the
    collapsed O(distinct) relation feeds level 2's min/max(string),
    whose string AGG BUFFERS legally fall to SortAggregate (the
    documented q_profile_columns class: sort input is O(distinct),
    never the corpus). At 100 TB this is the schema-discovery scan
    you run ONCE over a new semi-structured feed before writing the
    variant_get extraction of Q138.
    """
    register_views(spark, sf_dir, ("events",))
    return spark.sql(
        """
        WITH src AS (
            SELECT parse_json(
                       to_json(named_struct(
                           'bucket', user_id % 5,
                           'event_type', event_type))) AS v
            FROM events
        ),
        kv AS (
            SELECT e.key, to_json(e.value) AS val
            FROM src, LATERAL variant_explode(src.v) AS e
        ),
        collapsed AS (
            SELECT key, val, count(*) AS n
            FROM kv
            GROUP BY key, val
        )
        SELECT key,
               sum(n) AS n_rows,
               count(*) AS n_values,
               min(val) AS min_val,
               max(val) AS max_val
        FROM collapsed
        GROUP BY key
        """
    )


@register(
    "q_explode_outer",
    oracle="""
    WITH big AS (
        SELECT o_custkey, o_orderkey,
               CAST(row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderkey
               ) - 1 AS INT) AS pos
        FROM orders WHERE o_totalprice > 400000
    )
    SELECT c.c_custkey, b.pos, b.o_orderkey
    FROM customer c LEFT JOIN big b ON b.o_custkey = c.c_custkey
    """,
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q178: OUTER generator semantics (``posexplode_outer``) — the
    null-preserving half of the explode family (Q37 uses the inner
    form, which silently DROPS parents with empty/null arrays — the
    lost-rows bug class of Q176's plain-equality join, here for
    generators): each customer carries the sorted array of their
    rare high-value orders; most arrays are EMPTY, and the outer
    explode must keep those customers as a single (null pos, null
    order) row — the oracle's LEFT JOIN against the ranked order set
    is the relational statement of exactly that contract, so any
    dropped empty-array parent or a nondeterministic array order
    breaks the row count or the pos hash.

    Determinism note: ``collect_list`` order is partition-dependent,
    so the array is ``array_sort``-ed before exploding — pos is then
    the rank by o_orderkey on both engines.

    Scale shape: one shuffle to build the per-customer array (small:
    the filter keeps ~1% of orders), one broadcast-or-SMJ left join
    onto customer, then the generate is a narrow row-multiplier. At
    100 TB you'd skip the array materialization and write the
    oracle's join directly — the query exists to pin the generator
    semantic, and says so.
    """
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    arrs = o.groupBy(F.col("o_custkey").alias("c2")).agg(
        F.array_sort(F.collect_list("o_orderkey")).alias("oks")
    )
    joined = c.join(arrs, c["c_custkey"] == arrs["c2"], "left")
    return joined.select(
        "c_custkey",
        F.posexplode_outer("oks"),
    ).select(
        "c_custkey",
        F.col("pos").cast("int").alias("pos"),
        F.col("col").alias("o_orderkey"),
    )


@register(
    "q_array_functions",
    oracle="""
    WITH t AS (
        SELECT l_orderkey, l_linenumber,
               range(1, CAST(l_quantity AS BIGINT) % 5 + 3) AS a,
               [2, 4, 6] AS b
        FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           array_to_string(list_sort(list_distinct(list_concat(a, b))), ',')
               AS union_sorted,
           array_to_string(list_sort(list_distinct(
               list_filter(a, x -> list_contains(b, x)))), ',')
               AS intersect_sorted,
           array_to_string(list_sort(list_distinct(
               list_filter(a, x -> NOT list_contains(b, x)))), ',')
               AS except_sorted,
           list_contains(a, 4)                       AS has_four,
           CAST(coalesce(list_position(a, 2), 0) AS INT) AS pos_two,
           CAST(len(a) AS INT)                       AS a_len,
           CAST(list_max(a) AS BIGINT)               AS a_max,
           array_to_string(a[2:3], ',')              AS mid_slice,
           array_to_string(flatten([a, b]), ',')     AS flat
    FROM t
    """,
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q185: the ARRAY-function battery (union / intersect / except /
    contains / position / size / max / slice / flatten over
    ``sequence``-built arrays) — Q37 covers split+explode; this pins
    the array ALGEBRA against DuckDB's list_* twins. Set-valued
    results are canonicalized ``array_join(array_sort(...))`` strings
    because the two engines' set-op ORDER guarantees differ (Spark
    preserves first-occurrence order, DuckDB's list_distinct does
    not) — sorting before the hash pins the CONTENTS, which is the
    portable contract; 1-based list_position and 1-based slice
    semantics agree by construction and an off-by-one breaks the
    hash.

    Scale shape: pure narrow codegen'd projection, zero shuffle, zero
    Python — the array kernels ride the scan like every Q33-Q38
    battery.
    """
    li = load(spark, sf_dir, "lineitem")
    a = F.sequence(
        F.lit(1).cast("bigint"),
        (F.col("l_quantity").cast("bigint") % 5 + 2),
    )
    b = F.array(F.lit(2), F.lit(4), F.lit(6)).cast("array<bigint>")
    t = li.select("l_orderkey", "l_linenumber", a.alias("a"), b.alias("b"))
    j = lambda c: F.array_join(F.array_sort(c), ",")  # noqa: E731
    return t.select(
        "l_orderkey",
        "l_linenumber",
        j(F.array_union("a", "b")).alias("union_sorted"),
        j(F.array_intersect("a", "b")).alias("intersect_sorted"),
        j(F.array_except("a", "b")).alias("except_sorted"),
        F.array_contains("a", 4).alias("has_four"),
        F.coalesce(
            F.array_position("a", 2), F.lit(0)
        ).cast("int").alias("pos_two"),
        F.size("a").alias("a_len"),
        F.array_max("a").alias("a_max"),
        F.array_join(F.slice("a", 2, 2), ",").alias("mid_slice"),
        F.array_join(F.flatten(F.array("a", "b")), ",").alias("flat"),
    )
