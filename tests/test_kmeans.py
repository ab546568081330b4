"""Lloyd k-means: semantic unit tests on synthetic data + model
invariants on the fixture, complementing the chained-CTE oracle parity
(tests/test_oracle_parity.py covers q_kmeans hash-equality vs DuckDB).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_map_reduce_spark.operators.kmeans import lloyd
from project_map_reduce_spark.plans.similarity import _KM_ITERS, _KM_K
from project_map_reduce_spark.tables import load


def test_lloyd_separates_obvious_clusters(spark):
    # Two tight blobs around (0,0) and (10,10); seeds = first 2 vectors,
    # one drawn from each blob. One round is enough to converge.
    rows = [
        (0, [0.0, 0.1]),
        (1, [10.0, 10.1]),
        (2, [0.2, -0.1]),
        (3, [9.9, 10.0]),
        (4, [-0.1, 0.0]),
        (5, [10.1, 9.9]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    model = lloyd(df, k=2, iters=2).collect()
    by_cell = {r["cell_id"]: r for r in model}
    assert set(by_cell) == {0, 1}
    assert by_cell[0]["n_members"] == 3 and by_cell[1]["n_members"] == 3
    # Centroids are the quantized member means.
    assert by_cell[0]["centroid"] == pytest.approx([0.033333, 0.0], abs=1e-6)
    assert by_cell[1]["centroid"] == pytest.approx([10.0, 10.0], abs=1e-6)


def test_lloyd_model_invariants_on_fixture(spark, sf_dir):
    vecs = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    )
    n_vectors = vecs.count()
    model = lloyd(vecs, k=_KM_K, iters=_KM_ITERS).collect()
    # Partition of the dataset: every vector lands in exactly one cell.
    assert sum(r["n_members"] for r in model) == n_vectors
    assert 1 <= len(model) <= _KM_K
    dims = {len(r["centroid"]) for r in model}
    assert dims == {64}
