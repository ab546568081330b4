"""Round-13 additions: engine-side invariants the DuckDB oracle sweep
can't see (ledger keep/remove algebra, plan shapes)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from project_map_reduce_spark.registry import entries
from project_map_reduce_spark.tables import load


# ---------------------------------------------- Q195 fuzzy-dedup ledger
def test_fuzzy_ledger_every_removed_doc_has_a_kept_witness(spark, sf_dir):
    """Q195's contract (VERDICT r12 item 4 'Done' criterion): the
    ledger must be a valid dedup decision — every removed doc shares
    its cluster with EXACTLY ONE kept doc, that keeper dominates it
    under the declared rule (n_chars DESC, doc_id ASC), and kept docs
    are never removed. A ledger violating any of these would silently
    delete whole clusters (or keep duplicates) in the consuming
    pipeline."""
    rows = entries()["q_dedup_fuzzy_ledger"].fn(spark, sf_dir).collect()
    n_chars = {
        r["doc_id"]: r["n_chars"]
        for r in load(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    }
    assert len(rows) == len(n_chars)  # full per-document ledger
    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r["cluster_id"]].append(r)
    for cid, members in by_cluster.items():
        kept = [m for m in members if not m["removed"]]
        assert len(kept) == 1, f"cluster {cid}: {len(kept)} keepers"
        keeper = kept[0]
        # declared keep rule: longest doc wins, ties to smaller doc_id
        best = min(members, key=lambda m: (-n_chars[m["doc_id"]], m["doc_id"]))
        assert keeper["doc_id"] == best["doc_id"], (cid, keeper, best)
        for m in members:
            assert m["cluster_size"] == len(members)


def test_fuzzy_ledger_clusters_are_exactly_the_pair_graph_components(
    spark, sf_dir
):
    """Q195's cluster ids must be the connected components of Q44's
    pair graph (min doc_id per component), with every unpaired doc a
    singleton keeping its own id — the composition seam between the
    LSH pair stage and the ledger. A drifted seam (e.g. components run
    over unfiltered candidate pairs instead of verified ones) changes
    removal decisions silently."""
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in entries()["q_dedup_fuzzy"].fn(spark, sf_dir).collect()
    ]
    # union-find over the verified pair graph
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in list(parent)}
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in entries()["q_dedup_fuzzy_ledger"].fn(spark, sf_dir).collect()
    }
    paired = set(expect)
    for doc, cid in got.items():
        if doc in paired:
            assert cid == expect[doc], (doc, cid, expect[doc])
        else:
            assert cid == doc, f"unpaired doc {doc} not a singleton ({cid})"


def test_fuzzy_ledger_broadcasts_the_cluster_relation(spark, sf_dir):
    """Q195's 100 TB shape: the corpus-wide ledger join against the
    (small) cluster/keeper relation must be broadcast, never a
    corpus-shuffle sort-merge join — and no Window operator may appear
    (the keeper is a groupBy over clustered docs only, the Q119
    collapse-first discipline)."""
    df = entries()["q_dedup_fuzzy_ledger"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan
