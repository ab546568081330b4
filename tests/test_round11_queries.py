"""Round-11 additions: engine-side invariants the DuckDB oracle sweep
can't see (plan shapes, Spark-4.1 gotcha pins, lane equivalences)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from project_map_reduce_spark.registry import entries
from project_map_reduce_spark.tables import load


# ------------------------------------------------------------- Q48 note
def test_udf_python_arrow_optimized_variant_matches(spark, sf_dir):
    """Q48's docstring teaches ``@F.udf(..., useArrow=True)`` as the
    first remediation step (VERDICT r10 item 8: the round-10 tier A/B
    measured it closing ~40% of the pickled-UDF gap for free). Pin that
    the one-flag variant is a drop-in: same function body, identical
    results."""
    o = load(spark, sf_dir, "orders")

    def tier(p: float) -> str:
        if p < 50000:
            return "low"
        if p < 150000:
            return "mid"
        return "high"

    pickled = F.udf(tier, T.StringType())
    arrow = F.udf(tier, T.StringType(), useArrow=True)
    lhs = o.select("o_orderkey", pickled("o_totalprice").alias("tier"))
    rhs = o.select("o_orderkey", arrow("o_totalprice").alias("tier"))
    assert lhs.exceptAll(rhs).isEmpty() and rhs.exceptAll(lhs).isEmpty()


# ------------------------------------------- cogroup input-pruning pin
def test_cogroup_apply_in_pandas_expression_projection_prunes_inputs(spark):
    """Spark 4.1 gotcha (found fixing ADVICE r10's Q164 rounding item):
    a projection ABOVE cogroup.applyInPandas that wraps any output
    column in an EXPRESSION makes Catalyst mis-prune the cogroup INPUT
    frames — the right side loses columns the Python function still
    reads (a plain column reordering is safe). Q164 therefore rounds
    inside the pandas function (Decimal ROUND_HALF_UP — same contract
    as F.round / DuckDB round) instead of in a Spark expression above
    the operator. This test pins the CURRENT (buggy) behavior so a
    Spark upgrade that fixes it flips the assert and lets us move the
    rounding back engine-side."""
    ev = spark.createDataFrame(
        [(1, 10, "purchase", 5.0), (2, 10, "error", 0.0)],
        "event_id long, user_id long, event_type string, value double",
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    pur = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    err = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "ts", "user_id"
    )

    def probe(p: pd.DataFrame, e: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "pur_id": p["event_id"],
                "user_id": p["user_id"],
                "pur_value": p["value"],
                "ecols": [",".join(e.columns)] * len(p),
            }
        )

    out = (
        pur.groupBy("user_id")
        .cogroup(err.groupBy("user_id"))
        .applyInPandas(
            probe,
            "pur_id long, user_id long, pur_value double, ecols string",
        )
    )
    # No projection above the operator: inputs intact.
    (safe,) = out.collect()
    assert safe["ecols"] == "err_id,ts,user_id"
    # ANY projection above it may mis-prune (the exact boundary shifts
    # with session config — a full-width plain reorder survives in a
    # bare session but not under the repo conftest session); the
    # expression form reproduces everywhere: the error side's ts is
    # wrongly pruned.
    (buggy,) = out.select(
        "pur_id", F.round("pur_value", 6).alias("pur_value"), "ecols"
    ).collect()
    assert buggy["ecols"] == "err_id,user_id", (
        "Spark fixed the cogroup input mis-pruning — move Q164's "
        "rounding back to an engine-side expression (plans/udfs.py)"
    )
