"""Fixed-iteration PageRank as a DataFrame loop (Q110 support).

Each iteration is the classic Pregel step expressed relationally:
join the current ranks to the out-edges on source, sum the
``rank/out_degree`` contributions per destination, and blend with the
teleport term ``(1-d)/N``. Two keyed shuffles per round (join on src,
agg on dst) — the same physical shape as connected components
(operators/components.py), and like it the lineage is cut every round
(``localCheckpoint``; ``checkpoint`` to HDFS on a cluster) so the plan
does not double per iteration.

Determinism contract: ranks are rounded to ``round_dp`` decimals at
EVERY iteration (and the initial 1/N seed is rounded the same way, by
the engine's own ``round`` so Spark and the DuckDB oracle share
rounding semantics). Pre-round values agree across engines to ~1e-15
(per-node contribution sums are short and of uniform magnitude), so
the per-round snap makes the whole fixed-point trajectory bit-exact —
the same discipline that makes the k-means trainer oracle-checkable
(operators/kmeans.py).

Scale notes (100 TB graphs): edges are the big relation — they are
checkpointed once and re-joined each round, hash-partitioned on src;
ranks/degrees are O(nodes). Dangling nodes never arise here because
callers symmetrize (every node then has out-degree ≥ 1); a directed
deployment would add the standard dangling-mass redistribution term.

Reference analog: none — iterative graph analytics is engine-level
capability the reference lacks (its Manager only concatenates per-record
results, Manager.java:287-312).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iterations: int = 5,
    damping: float = 0.85,
    round_dp: int = 9,
) -> DataFrame:
    """Rank every node of the directed graph ``edges``. Returns
    (node, rank) with one row per node that has at least one out-edge
    (symmetrized input ⇒ every node). ``edges`` should be deduplicated;
    multi-edges would weight contributions.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).localCheckpoint()
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("outdeg")).localCheckpoint()
    n_nodes = deg.count()
    teleport = (1.0 - damping) / n_nodes

    # Fold the out-degree into the edge relation ONCE — each iteration
    # is then a single join (ranks on src) + a single aggregate (sum on
    # dst) instead of joining degrees back in every round. One upfront
    # keyed join buys back `iterations` per-round joins.
    e_deg = (
        e.join(deg, "s").select("s", "d", "outdeg").localCheckpoint()
    )

    ranks = deg.select(
        F.col("s").alias("node"),
        F.round(F.lit(1.0) / F.lit(float(n_nodes)), round_dp).alias("rank"),
    ).localCheckpoint()

    for _ in range(iterations):
        ranks = (
            e_deg.join(ranks, e_deg["s"] == ranks["node"])
            .groupBy("d")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("msum"))
            .select(
                F.col("d").alias("node"),
                F.round(
                    F.lit(teleport) + F.lit(damping) * F.col("msum"), round_dp
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
