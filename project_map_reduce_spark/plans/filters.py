"""B.2 projection / filter / predicates (Q03-Q05) + Q48 dispatch UDF.

Q03/Q04 are pure Catalyst (predicate pushdown reaches the parquet
scan — PushedFilters on l_shipdate/l_discount/l_quantity). Q05 is the
reference's whole pipeline restated through the dispatch operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from project_map_reduce_spark.functions.det import r6d
from project_map_reduce_spark.operators.dispatch import dispatch, job_summary
from project_map_reduce_spark.registry import register
from project_map_reduce_spark.tables import load


@register(
    "q_filter_predicate",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 6) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight multi-predicate filter + global agg. All
    three predicates push into the parquet scan; the aggregate is a
    single partial+final reduction (no groupBy shuffle of rows)."""
    li = load(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        r6d(F.sum(F.col("l_extendedprice") * F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000  THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS price_tier
    FROM orders
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional projection: bucket o_totalprice into tiers
    (when/otherwise — pure codegen expression, no shuffle at all)."""
    o = load(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return o.select("o_orderkey", tier.alias("price_tier"))


_Q05_ORACLE = """
WITH tasks AS (
    SELECT
        CASE CAST(doc_id % 3 AS INT)
            WHEN 0 THEN 'totext' WHEN 1 THEN 'toimage' ELSE 'tohtml'
        END AS operation,
        concat('s3://docs/', CAST(doc_id AS VARCHAR)) AS input_url,
        lang,
        doc_id
    FROM documents
), results AS (
    SELECT operation, input_url,
        CASE WHEN lang = 'zh' THEN NULL
             ELSE concat('s3://out/', CAST(doc_id AS VARCHAR), '.',
                         CASE operation WHEN 'totext' THEN 'txt'
                                        WHEN 'toimage' THEN 'png'
                                        ELSE 'html' END)
        END AS output_url,
        CASE WHEN lang = 'zh' THEN 'error' ELSE 'ok' END AS status,
        CASE WHEN lang = 'zh' THEN 'Error: File is Encrypted' END AS error
    FROM tasks
)
SELECT operation, status,
       count(*) AS n_records,
       count(error) AS n_errors
FROM results
GROUP BY operation, status
"""


@register("q_job_pipeline", oracle=_Q05_ORACLE)
def q_job_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference pipeline restated (ref A3-A8): derive a task table
    from documents (operation by doc_id % 3, FIXTURES.md), run the keyed
    dispatch with the encrypted-PDF guard (lang='zh'), then the
    job-scoped summary. Error rows are preserved as data, never dropped
    (A7), and summary counts equal input counts (the A9 barrier
    property — asserted in tests)."""
    docs = load(spark, sf_dir, "documents")
    tasks = docs.select(
        F.element_at(
            F.array(F.lit("totext"), F.lit("toimage"), F.lit("tohtml")),
            (F.col("doc_id") % 3).cast("int") + 1,
        ).alias("operation"),
        F.concat(F.lit("s3://docs/"), F.col("doc_id").cast("string")).alias("url"),
        "lang",
        "doc_id",
    )
    ext = {"totext": "txt", "toimage": "png", "tohtml": "html"}
    handlers = {
        op: F.concat(
            F.lit("s3://out/"), F.col("doc_id").cast("string"), F.lit("." + e)
        )
        for op, e in ext.items()
    }
    results = dispatch(
        tasks,
        op_col="operation",
        input_url=F.col("url"),
        handlers=handlers,
        guard=F.col("lang") == "zh",
    )
    return job_summary(results)


@register(
    "q_udf_python",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000  THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS tier
    FROM orders
    """,
)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Python UDF tier label (ref A6's per-record dispatch, the
    idiomatic home of user Python logic). Kept deliberately as a
    row-at-a-time UDF to exercise that surface; the vectorized
    equivalent is q_pandas_udf_scalar. Remediation ladder, measured in
    the round-10 tier A/B (BASELINE.md: pickled 1.34 s → arrow 0.97 s
    → pandas_udf 0.92 s → built-in 0.29 s over 6 M cached rows): the
    FIRST step is the one-flag ``@F.udf(..., useArrow=True)`` variant —
    same function body, Arrow batch transfer instead of pickling,
    ~40% of the gap closed for free (equivalence test-pinned) — then
    the pandas_udf rewrite (Q49), and at 100 TB you'd write this as
    the CASE expression of q_case_when — documented slow path."""
    o = load(spark, sf_dir, "orders")

    @F.udf(T.StringType())
    def tier_udf(p: float) -> str:
        if p < 50000:
            return "low"
        if p < 150000:
            return "mid"
        return "high"

    return o.select("o_orderkey", tier_udf("o_totalprice").alias("tier"))
