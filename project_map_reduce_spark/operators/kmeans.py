"""Distributed Lloyd's k-means — the iterative model-training loop
that builds the coarse-quantizer an IVF index (q_similarity_ann)
assumes as given.

The model (k·d doubles) lives at the DRIVER between rounds — the same
design as Spark MLlib's KMeans: what crosses the cluster boundary per
round is O(model), never O(data). Per round:

1. **Assign** — centroids are baked into the plan as literal arrays, so
   assignment is a pure narrow projection over the (cached) vector
   table: argmin squared-distance via ‖v‖² − 2·v·c + ‖c‖², distance
   ROUNDED to 6 dp, ties broken on cell id. NO join and NO shuffle —
   the vector table is never repartitioned, not even by vec_id.
2. **Update** — new centroid = element-wise mean of members:
   posexplode to (cell, dim, x) and avg — partial aggregation combines
   map-side, so the shuffle is O(k·d·partitions), never O(n·d). The
   k·d rounded means are collected to the driver (≤ a few KB) to become
   the next round's literals. Centroids are re-QUANTIZED to 6 dp each
   round: model state is the only thing that crosses iterations, and
   quantizing it makes cross-engine float drift collapse at every round
   boundary instead of compounding.

The LAST round's update is left lazy and returned as the result
DataFrame, so the caller still gets a distributed plan (assignment
projection + one O(k·d) aggregation) rather than a driver-local table.

Fixed iteration count (no convergence test): the loop is a constant
chain of identical dataflow rounds — exactly what makes it expressible
as chained CTEs in the SQL oracle, and what you'd run at 100 TB anyway
(each Lloyd round is a full pass; production IVF training fixes the
round budget up front, typically on a sample).

Reference analog: none — the reference has no iterative computation of
any kind (its only loop is an SQS poll).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _with_norm2(df: DataFrame, vec: str, out: str) -> DataFrame:
    v = F.col(vec)
    return df.withColumn(
        out,
        F.aggregate(F.zip_with(v, v, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x),
    )


def _assign(vecs: DataFrame, cents: dict[int, list[float]]) -> DataFrame:
    """Narrow argmin-assignment against the driver-held model. Pure
    projection — no join, no exchange.

    The k dot products are one Arrow pandas UDF, not k Catalyst
    ``aggregate`` folds: HOF lambdas evaluate interpreted (k·d lambda
    dispatches per row), and a calm-host A/B at sf0.1 measured the UDF
    form ~35% faster end-to-end (min 2.0 s vs 3.1 s, consistent across
    paired trials). Bit-exactness with DuckDB's sequential
    ``list_dot_product`` is preserved: the per-dimension accumulation
    loop adds strictly left-to-right from 0.0 — the identical IEEE
    operation sequence as the Catalyst ``aggregate`` fold it replaces
    (verified bit-identical to the Python fold and to DuckDB on the
    fixture embeddings) — the elementwise products are the same IEEE
    doubles, and ``nv - 2·dot + nc`` keeps the same operation order. ROUNDING, tie-break, and argmin stay JVM-side
    (round/getItem/array_min are codegen'd), so the cross-engine 6-dp
    rounding contract never crosses the UDF boundary.
    """
    cells = sorted(cents)
    model = [cents[c] for c in cells]
    norms = []
    for c in model:
        nc = 0.0
        for x in c:  # sequential sum of squares — bit-matches the SQL fold
            nc += x * x
        norms.append(nc)

    @pandas_udf("array<double>")
    def _dist2(v: pd.Series, nv: pd.Series) -> pd.Series:
        import numpy as np

        if len(v) == 0:
            return pd.Series([], dtype=object)
        mat = np.asarray(model, dtype=np.float64)  # k×d
        vmat = np.asarray(v.tolist(), dtype=np.float64)  # n×d
        # Strict left-to-right accumulation per (row, centroid): one
        # dimension at a time into an n×k buffer — the same IEEE add
        # order as an n×k×d cumsum but at 1/d the peak memory (no
        # throwaway product/prefix tensors).
        dots = np.zeros((vmat.shape[0], mat.shape[0]), dtype=np.float64)
        for j in range(mat.shape[1]):
            dots += vmat[:, j, None] * mat[None, :, j]
        d2 = nv.to_numpy()[:, None] - 2.0 * dots + np.asarray(norms)[None, :]
        return pd.Series(list(d2))

    choices = [
        F.struct(
            F.round(F.col("__d2").getItem(i), 6).alias("dist2"),
            F.lit(int(cell)).cast("int").alias("cell"),
        )
        for i, cell in enumerate(cells)
    ]
    return (
        vecs.withColumn("__d2", _dist2("v", "nv"))
        .withColumn("cell", F.array_min(F.array(*choices)).getField("cell"))
        .drop("__d2")
    )


def _lloyd_loop(
    vectors: DataFrame,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Shared Lloyd iteration: returns (final_assigned, final_update),
    both lazy — final_assigned is the last round's narrow assignment
    projection ``(vec_id, v, nv, cell)``, final_update the last round's
    per-(cell, dim) quantized means."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    # Every Lloyd round re-reads the full training set (assign is a pass
    # over all vectors) — persist it once so the scan + norm subtree is
    # not re-executed per round. At cluster scale this is the cache (or
    # checkpoint) of the working set that any iterative trainer does.
    vecs = _with_norm2(
        vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")),
        "v",
        "nv",
    ).persist()

    seed = vecs.filter(F.col("vec_id") < k).select("vec_id", "v").collect()
    cents: dict[int, list[float]] = {
        int(r["vec_id"]): [float(x) for x in r["v"]] for r in seed
    }

    assigned = upd = None
    for i in range(iters):
        assigned = _assign(vecs, cents)
        upd = (
            assigned.select("cell", F.posexplode("v").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.round(F.avg("x"), 6).alias("x"), F.count(F.lit(1)).alias("n"))
        )
        if i < iters - 1:
            # Model round-trip: k·d rounded means back to the driver to
            # become the next round's literal centroids.
            cents = {}
            for r in sorted(upd.collect(), key=lambda r: (r["cell"], r["dim"])):
                cents.setdefault(int(r["cell"]), []).append(float(r["x"]))
    return assigned, upd


def lloyd_assignments(
    vectors: DataFrame,
    *,
    k: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Run ``iters`` Lloyd rounds and return the FINAL-round cell
    assignment ``(vec_id, v, nv, cell)`` — i.e. each vector labeled by
    its nearest round-(iters−1) centroid. This is the IVF coarse
    partitioning as a first-class output: cell count grows with the
    corpus (k is a training knob), which is exactly what the
    embedding-dedup blocker (plans/dedup.py::q_dedup_embedding_ivf)
    needs for within-block work to stay flat at scale."""
    assigned, _ = _lloyd_loop(vectors, k, iters, id_col, vec_col)
    return assigned


def lloyd(
    vectors: DataFrame,
    *,
    k: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Run ``iters`` full Lloyd rounds over ``vectors`` (id, vec of
    doubles). Init: the k vectors with id < k (deterministic — the
    fixture ids are dense from 0). Returns the trained model: one row
    per non-empty cell, ``(cell_id, n_members, centroid)``, where
    centroid is the 6-dp-quantized member mean of the final round and
    n_members counts the final assignment.
    """
    _, upd = _lloyd_loop(vectors, k, iters, id_col, vec_col)

    return (
        upd.groupBy("cell")
        .agg(
            F.max("n").alias("n_members"),  # n is constant across a cell's dims
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "x"))),
                lambda s: s.getField("x"),
            ).alias("centroid"),
        )
        .select(F.col("cell").alias("cell_id"), "n_members", "centroid")
    )
