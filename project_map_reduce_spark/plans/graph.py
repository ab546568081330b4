"""Graph analytics surface — fixed-iteration PageRank (Q110).

Complements the connected-components operator (Q67): components answer
"which records are the same thing", PageRank answers "which nodes are
central" — the standard next graph question over entity graphs derived
from relational data (here the part↔supplier co-occurrence graph mined
from lineitem).

Reference analog: none (`ext`) — see operators/pagerank.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_map_reduce_spark.functions.det import r6d
from project_map_reduce_spark.operators.pagerank import pagerank
from project_map_reduce_spark.registry import fmt_doc, register
from project_map_reduce_spark.tables import load

_ITERS = 5
_DAMPING = 0.85
_TOPN = 20


def _pagerank_oracle() -> str:
    nn = "(SELECT n FROM nn)"
    ctes = [
        "e0 AS (SELECT DISTINCT 2 * l_partkey AS s, 2 * l_suppkey + 1 AS d"
        " FROM lineitem)",
        "edges AS (SELECT s, d FROM e0 UNION ALL SELECT d AS s, s AS d FROM e0)",
        "deg AS (SELECT s AS node, count(*) AS outdeg FROM edges GROUP BY s)",
        "nn AS (SELECT count(*) AS n FROM deg)",
        f"r0 AS (SELECT node, round(1.0 / {nn}, 9) AS rank FROM deg)",
    ]
    for k in range(1, _ITERS + 1):
        ctes.append(
            f"r{k} AS (SELECT e.d AS node, "
            f"round((1 - {_DAMPING}) / {nn} + {_DAMPING} * "
            f"sum(r.rank / dg.outdeg), 9) AS rank "
            f"FROM edges e JOIN r{k - 1} r ON r.node = e.s "
            f"JOIN deg dg ON dg.node = e.s GROUP BY e.d)"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
    SELECT node,
           CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS node_type,
           round(rank, 6) AS rank
    FROM r{_ITERS}
    ORDER BY r{_ITERS}.rank DESC, node
    LIMIT {_TOPN}
    """
    )


@register("q_pagerank", oracle=_pagerank_oracle())
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q110: the {n} most central nodes of the part↔supplier graph by
    {iters}-iteration PageRank (damping {d}). Edges are the DISTINCT
    (part, supplier) pairs that co-occur on a lineitem row, symmetrized
    (node id = 2·partkey / 2·suppkey+1 keeps both populations in one
    bigint key space — no string keys in the shuffle). The oracle
    re-runs the identical fixed-point trajectory as {iters} chained
    CTEs; per-iteration 9-dp rank rounding (operators/pagerank.py
    determinism contract) makes the trajectory — and therefore the
    top-{n} set — bit-exact across engines.

    Scale shape: per iteration, one join hash-partitioned on src + one
    aggregate on dst over the checkpointed edge relation — O(iters)
    keyed shuffles of O(edges) rows, nothing quadratic, lineage cut per
    round. The final top-{n} is TakeOrdered (per-partition heads +
    driver merge of {n} rows), NOT a global sort.
    """
    li = load(spark, sf_dir, "lineitem")
    directed = li.select(
        (2 * F.col("l_partkey")).alias("src"),
        (2 * F.col("l_suppkey") + 1).alias("dst"),
    ).distinct()
    edges = directed.unionAll(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank(edges, iterations=_ITERS, damping=_DAMPING)
    return (
        ranks.orderBy(F.desc("rank"), "node")
        .limit(_TOPN)
        .select(
            "node",
            F.when(F.col("node") % 2 == 0, "part")
            .otherwise("supplier")
            .alias("node_type"),
            r6d(F.col("rank"), "rank"),
        )
    )


fmt_doc(q_pagerank, n=_TOPN, iters=_ITERS, d=_DAMPING)
