"""Reference-semantics tests (SURVEY.md §5.2.3): the A-series pipeline
properties on the dispatch operator — in-band errors preserved,
unsupported ops flagged, summary counts = input counts (A9 barrier)."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_map_reduce_spark.operators.dispatch import dispatch, job_summary


def _task_df(spark):
    rows = [
        (1, "totext", "s3://in/1.pdf", False),
        (2, "toimage", "s3://in/2.pdf", False),
        (3, "tohtml", "s3://in/3.pdf", False),
        (4, "totext", "s3://in/4.pdf", True),  # guard trips (encrypted)
        (5, "tovideo", "s3://in/5.pdf", False),  # unsupported op
    ]
    return spark.createDataFrame(
        rows, "task_id long, operation string, url string, encrypted boolean"
    )


def _run(spark):
    df = _task_df(spark)
    handlers = {
        op: F.concat(F.lit(f"s3://out/{op}/"), F.col("task_id").cast("string"))
        for op in ("totext", "toimage", "tohtml")
    }
    return dispatch(
        df,
        op_col="operation",
        input_url=F.col("url"),
        handlers=handlers,
        guard=F.col("encrypted"),
        guard_error="Error: File is Encrypted",
    )


def test_dispatch_success_rows(spark):
    out = {r.operation + ":" + r.input_url: r for r in _run(spark).collect()}
    ok = out["totext:s3://in/1.pdf"]
    assert ok.status == "ok" and ok.error is None
    assert ok.output_url == "s3://out/totext/1"


def test_dispatch_error_rows_are_data(spark):
    """Failures are rows, not exceptions (ref Workers.java:186-221)."""
    rows = _run(spark).collect()
    assert len(rows) == 5  # nothing dropped — A9: every record accounted
    enc = next(r for r in rows if r.input_url == "s3://in/4.pdf")
    assert enc.status == "error"
    assert enc.error == "Error: File is Encrypted"
    assert enc.output_url is None
    unsup = next(r for r in rows if r.input_url == "s3://in/5.pdf")
    assert unsup.status == "error"
    assert unsup.error == "Error: Unsupported operation: tovideo"


def test_job_summary_barrier_property(spark):
    """Summary counts must equal input count (the count-based completion
    barrier, Manager.java:293-311 — restated as an aggregation law)."""
    results = _run(spark)
    summary = job_summary(results).collect()
    assert sum(r.n_records for r in summary) == 5
    errs = {(r.operation, r.status): r.n_errors for r in summary}
    assert errs[("totext", "error")] == 1
    assert errs[("tovideo", "error")] == 1
    assert errs[("toimage", "ok")] == 0


def test_unique_output_names(spark):
    """Per-record artifact names unique (ref workerID+index naming,
    Workers.java:146,159,179)."""
    out = _run(spark).filter(F.col("status") == "ok")
    n = out.count()
    assert out.select("output_url").distinct().count() == n
