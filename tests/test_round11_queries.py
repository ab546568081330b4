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


# ------------------------------------------------- r11 new-query plans
def _plan(spark, sf_dir, name):
    df = entries()[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_map_in_arrow_single_node_no_extra_exchange(spark, sf_dir):
    """Q167: exactly one MapInArrow node fed straight by the scan (the
    Python crossing is a narrow map — no exchange below it; the only
    shuffle is the final aggregate's)."""
    plan = _plan(spark, sf_dir, "q_map_in_arrow")
    tree = plan.split("\n\n")[0]
    assert tree.count("MapInArrow") == 1, tree
    below = tree[tree.index("MapInArrow"):]
    assert "Exchange" not in below, tree


def test_apply_in_arrow_plan_shape(spark, sf_dir):
    """Q168: the grouped Arrow lane compiles to FlatMapGroupsInArrow
    over ONE hash exchange on the grouping key."""
    plan = _plan(spark, sf_dir, "q_apply_in_arrow")
    tree = plan.split("\n\n")[0]
    assert tree.count("FlatMapGroupsInArrow") == 1, tree
    assert tree.count("Exchange") == 1, tree


def test_cogroup_in_arrow_plan_and_one_sided_keys(spark, sf_dir):
    """Q171: FlatMapCoGroupsInArrow with one exchange per side, and the
    3-arg key contract really surfaces users present on only ONE side
    (the reason the function takes the key tuple)."""
    plan = _plan(spark, sf_dir, "q_cogroup_in_arrow")
    tree = plan.split("\n\n")[0]
    assert tree.count("FlatMapCoGroupsInArrow") == 1, tree
    assert tree.count("Exchange") == 2, tree
    df = entries()["q_cogroup_in_arrow"].fn(spark, sf_dir)
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "error")
    )
    assert df.count() == ev.select("user_id").distinct().count()
    # One-sided key contract on a synthetic frame (the sf fixture is
    # dense — every user has both types): user 2 exists only on the
    # purchase side, user 3 only on the error side; the 3-arg key-tuple
    # form must still emit both with the right id and a 0 count.
    syn = spark.createDataFrame(
        [(2, "purchase"), (3, "error")], "user_id long, event_type string"
    )
    import pyarrow as pa

    def counts(key, p: pa.Table, e: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"user_id": [key[0].as_py()],
             "n_purchases": [p.num_rows], "n_errors": [e.num_rows]},
            schema=pa.schema([("user_id", pa.int64()),
                              ("n_purchases", pa.int64()),
                              ("n_errors", pa.int64())]),
        )

    got = sorted(
        tuple(r) for r in (
            syn.where(F.col("event_type") == "purchase").groupBy("user_id")
            .cogroup(syn.where(F.col("event_type") == "error").groupBy("user_id"))
            .applyInArrow(
                counts, "user_id long, n_purchases long, n_errors long"
            )
        ).collect()
    )
    assert got == [(2, 1, 0), (3, 0, 1)]


def test_lateral_join_df_decorrelates_to_window(spark, sf_dir):
    """Q169: the correlated ORDER-BY-LIMIT lateral subquery must
    decorrelate into ONE ranked window over customer (row_number +
    filter), never a per-outer-row re-execution (no nested-loop over
    the subquery, no cartesian)."""
    plan = _plan(spark, sf_dir, "q_lateral_join_df")
    tree = plan.split("\n\n")[0]
    assert "Window" in tree, tree
    assert "CartesianProduct" not in tree, tree


def test_subquery_df_rewrites(spark, sf_dir):
    """Q170: exists() becomes a semi join; scalar() becomes a one-row
    subquery reused as a literal-ish input to the filter — and the
    correlated-scalar limitation stays pinned (eager analysis raises
    UNRESOLVED_COLUMN, the docstring's documented boundary)."""
    plan = _plan(spark, sf_dir, "q_subquery_df")
    assert "LeftSemi" in plan, plan
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    with pytest.raises(Exception, match="UNRESOLVED_COLUMN"):
        c.select(
            o.where(F.col("o_custkey") == F.col("c_custkey").outer())
            .agg(F.count(F.lit(1)))
            .scalar()
        )


def test_line_hash_sql_twin_matches_python(spark):
    """LINE_HASH_SQL (the distributed readback's per-line hash) must be
    bit-identical to the writer's Python _line_hash for any line —
    including values that exercise the unsigned->signed reinterpretation
    branch and non-ASCII UTF-8."""
    from project_map_reduce_spark.sources.pyds_sink import (
        LINE_HASH_SQL,
        _line_hash,
    )

    lines = [
        "", "a", "1\tpurchase\t0.25", "tab\tsep\tline",
        "unicode-éß漢", "trailing space ", "0" * 200,
    ] + [f"probe-{i}" for i in range(50)]
    df = spark.createDataFrame([(s,) for s in lines], "value string")
    got = {r["value"]: r["h"] for r in
           df.select("value", F.expr(LINE_HASH_SQL).alias("h")).collect()}
    want = {s: _line_hash(s) for s in lines}
    assert got == want
    # both branches of the sign reinterpretation must have fired
    assert any(v < 0 for v in want.values())
    assert any(v >= 0 for v in want.values())


def test_bitmap_distinct_no_expand_node(spark, sf_dir):
    """Q173's whole point: the exact distinct comes from bitmap
    popcounts, never from the count(DISTINCT) plan — no Expand node
    anywhere, and the rollup merges bitmaps (bitmap_or_agg present in
    the plan) instead of rescanning events."""
    df = entries()["q_bitmap_distinct"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    tree = plan.split("\n\n")[0]
    assert "Expand" not in tree, tree
    assert "bitmap_or" in plan.lower(), plan[:2000]
    # Both rollup levels share the (type, day, bucket) cells exchange:
    # after AQE finalizes, the second branch reads a ReusedExchange /
    # ReusedQueryStage instead of rescanning events.
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "Reused" in final, final.split("\n\n")[0]


def test_agg_modern_mode_premise_unique_majority(spark, sf_dir):
    """Q174 hashes mode(least(l_linenumber, 3)) only because the
    premise holds: line numbers are ~uniform over 1..7, so the clamped
    value 3 carries ~5/7 of every group's mass — a strict majority
    over each alternative by a wide margin in EVERY group. Guard the
    premise loud — a fixture where the clamp no longer wins a group
    would silently turn mode() nondeterministic."""
    li = load(spark, sf_dir, "lineitem")
    rows = (
        li.groupBy("l_returnflag", F.least("l_linenumber", F.lit(3)).alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_flag: dict[str, dict[int, int]] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], {})[r["v"]] = r["n"]
    for flag, counts in by_flag.items():
        others = [n for v, n in counts.items() if v != 3]
        assert counts[3] > 2 * max(others), (flag, counts)


def test_variant_explode_is_jvm_generate(spark, sf_dir):
    """Q175: variant_explode must run as a codegen'd JVM Generate node —
    no Python evaluation anywhere in the plan."""
    plan = _plan(spark, sf_dir, "q_variant_explode")
    tree = plan.split("\n\n")[0]
    assert "Generate" in tree, tree
    assert "Python" not in tree, tree


def test_regr_stats_matches_closed_form(spark, sf_dir):
    """Q172: regr_slope/intercept must equal the covar_pop/var_pop
    closed form computed engine-side (the definitional identity the
    oracle can't distinguish from luck)."""
    li = load(spark, sf_dir, "lineitem")
    got = {
        r["l_returnflag"]: (r["slope"], r["intercept"])
        for r in entries()["q_regr_stats"].fn(spark, sf_dir).collect()
    }
    want = {
        r["f"]: (
            round(r["c"] / r["v"], 6),
            round(r["my"] - (r["c"] / r["v"]) * r["mx"], 6),
        )
        for r in li.groupBy(F.col("l_returnflag").alias("f"))
        .agg(
            F.covar_pop("l_extendedprice", "l_quantity").alias("c"),
            F.var_pop("l_quantity").alias("v"),
            F.avg("l_quantity").alias("mx"),
            F.avg("l_extendedprice").alias("my"),
        )
        .collect()
    }
    for f, (s, i) in want.items():
        assert abs(got[f][0] - s) < 1e-6 and abs(got[f][1] - i) < 1e-6


def test_join_null_safe_is_equi_not_bnlj(spark, sf_dir):
    """Q176: <=> must compile to a real EQUI join strategy (sort-merge
    or hash) — the naive OR-of-IS-NULLs disjunction degenerates to
    BroadcastNestedLoopJoin, which is the regression this pin
    catches. And the NULL groups must actually meet: exactly one
    output row carries a matched NULL key."""
    df = entries()["q_join_null_safe"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan), plan
    matched = [r for r in df.collect() if r["null_key_matched"]]
    assert len(matched) == 1 and matched[0]["k"] is None
    assert matched[0]["n_purchases"] > 0 and matched[0]["n_errors"] > 0


def test_percentile_disc_definition_matches_duckdb(spark):
    """Q174 hashes percentile_disc(0.25) assuming Spark's
    smallest-cume_dist>=p pick equals DuckDB's quantile_disc index
    pick. The driver only checks at one fixture size — pin the
    definitional agreement across adversarial group sizes (around the
    p*n integer boundaries where off-by-one definitions diverge) and
    several p values."""
    import duckdb

    sizes = [1, 2, 3, 4, 5, 7, 8, 9, 12, 13, 16, 17, 20, 39, 40, 41, 100]
    ps = [0.1, 0.25, 0.5, 0.75, 0.9]
    rows = [(n, float(v)) for n in sizes for v in range(1, n + 1)]
    df = spark.createDataFrame(rows, "n int, v double")
    got = {
        (r["n"], p): r[f"p{int(p*100)}"]
        for r in df.groupBy("n").agg(*[
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY v)"
            ).alias(f"p{int(p*100)}")
            for p in ps
        ]).collect()
        for p in ps
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(n INT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    for p in ps:
        for n, want in con.execute(
            f"SELECT n, quantile_disc(v, {p}) FROM t GROUP BY n"
        ).fetchall():
            assert got[(n, p)] == want, (n, p, got[(n, p)], want)


def test_topk_sketch_rollup_merges_states_not_rescans(spark, sf_dir):
    """Q177: the per-type answer must come from combining the daily
    sketch states — the plan has the two-level aggregate over the
    sketch struct and NO second scan of events; and the premise guard
    really fires past capacity."""
    df = entries()["q_topk_sketch_rollup"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1, tree
    assert "approx_top_k_combine" in plan.lower() or "approxtopkcombine" in plan.lower() or "approx_top_k" in plan.lower(), plan[:1500]
    # exactness premise: distinct items far below capacity here
    ev = load(spark, sf_dir, "events")
    n = ev.select(
        F.countDistinct(
            F.floor(F.sqrt(F.col("user_id"))).cast("bigint").cast("string")
        )
    ).first()[0]
    assert n < 1000
    # and the mass-conservation guard really fires when a sketch IS
    # over capacity (estimate WIDTH cannot detect it — an over-cap
    # frequent-items sketch returns only guaranteed heavy hitters,
    # possibly zero items; lost count mass is the sound signal)
    small = spark.range(1000).selectExpr("CAST(id % 50 AS STRING) AS item")
    m = small.agg(
        F.expr("approx_top_k_accumulate(item, 10)").alias("st"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    mass = F.aggregate(
        F.col("est"), F.lit(0).cast("bigint"), lambda a, x: a + x["count"]
    )
    guarded = m.select(
        "n_rows", F.expr("approx_top_k_estimate(st, 10)").alias("est")
    ).select(
        F.when(mass == F.col("n_rows"), F.col("est"))
        .otherwise(F.raise_error(F.lit("lost count mass")))
        .alias("est")
    )
    with pytest.raises(Exception, match="lost count mass"):
        guarded.collect()


def test_explode_outer_preserves_empty_array_parents(spark, sf_dir):
    """Q178: every customer appears at least once — the inner-explode
    form would drop the (majority) empty-array customers."""
    df = entries()["q_explode_outer"].fn(spark, sf_dir)
    c = load(spark, sf_dir, "customer")
    assert df.select("c_custkey").distinct().count() == c.count()
    assert df.where(F.col("pos").isNull()).count() > 0


def test_groupingsets_df_expand_plan(spark, sf_dir):
    """Q179: one Expand node (3 sets), one aggregate pair — the API
    must spell Q19's plan, not a union of three aggregates."""
    plan = _plan(spark, sf_dir, "q_groupingsets_df")
    tree = plan.split("\n\n")[0]
    assert tree.count("Expand") == 1, tree
    assert "Union" not in tree, tree


def test_hof_lambda_no_python_no_shuffle(spark, sf_dir):
    """Q180: pure narrow JVM projection — no Exchange, no Python."""
    plan = _plan(spark, sf_dir, "q_hof_lambda")
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree, tree
    assert "Python" not in tree, tree


def test_jl_projection_preserves_distances(spark, sf_dir):
    """Q182's reason to exist: the JL guarantee. For a sample of vector
    pairs, the projected squared distance (/k-normalized ±1 matrix)
    approximates the original squared distance — check the median
    distortion is within a loose band (k=8 is small, so per-pair
    bounds are weak; the MEDIAN over pairs is stable)."""
    import itertools
    import math

    e = load(spark, sf_dir, "embeddings").limit(12).collect()
    p = {
        r["vec_id"]: {}
        for r in e
    }
    proj = entries()["q_jl_projection"].fn(spark, sf_dir).collect()
    for r in proj:
        if r["vec_id"] in p:
            p[r["vec_id"]][r["dim"]] = r["proj"]
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in e}
    ratios = []
    for a, b in itertools.combinations(sorted(vecs), 2):
        d_orig = sum((x - y) ** 2 for x, y in zip(vecs[a], vecs[b]))
        if d_orig == 0 or len(p[a]) < 8 or len(p[b]) < 8:
            continue
        d_proj = sum((p[a][j] - p[b][j]) ** 2 for j in range(8))
        ratios.append(d_proj / d_orig)
    ratios.sort()
    med = ratios[len(ratios) // 2]
    assert 0.4 < med < 2.5, (med, len(ratios))


def test_stream_to_table_drops_scratch_table(spark, sf_dir):
    """Q181: the managed scratch table must not leak into the catalog
    after the query returns."""
    before = {t.name for t in spark.catalog.listTables()}
    entries()["q_stream_to_table"].fn(spark, sf_dir).collect()
    after = {t.name for t in spark.catalog.listTables()}
    assert not {t for t in after - before if t.startswith("pmrs_stream_tbl_")}


def test_setops_all_keeps_multiplicities(spark):
    """Q183's bag semantics on a known multiset: a={1,1,2,3}, b={1,2,2}
    -> intersectAll {1,2}, exceptAll {1,3}."""
    a = spark.createDataFrame([(1,), (1,), (2,), (3,)], "v int")
    b = spark.createDataFrame([(1,), (2,), (2,)], "v int")
    ia = sorted(r["v"] for r in a.intersectAll(b).collect())
    ea = sorted(r["v"] for r in a.exceptAll(b).collect())
    assert ia == [1, 2] and ea == [1, 3]


def test_limit_offset_page_algebra(spark, sf_dir):
    """Q184: pages partition the prefix — page2 rows = rows 41-60 of
    the bare top-60, disjoint from the top-40."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ordered = c.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    top60 = [r["c_custkey"] for r in ordered.limit(60).collect()]
    page = [r["c_custkey"] for r in ordered.offset(40).limit(20).collect()]
    assert page == top60[40:60]
