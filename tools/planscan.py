"""Fleet-wide physical-plan smell scan.

Compiles every registered query against a fixture dir and flags the
plan shapes that silently cost at scale: SortAggregate (string/struct
agg buffers falling off the hash-agg fast path), CartesianProduct,
BroadcastNestedLoopJoin. tests/test_plan_audit.py pins the per-query
properties; this tool is the sweep that finds NEW smells after a
refactor, across the whole inventory at once.

Known/adjudicated sites (see VERDICT r3/r4): the five BNLJ hits are
broadcast-tiny crossJoins (O(1)-row or 16-row frames — similarity
centroids/queries, tfidf totals, Q97's 1-row n_min scalar, Q131's
1-row sketch map into the 10-row judge); the five SortAggregate hits
are deliberate: single-shuffle mergeable argmax/survivor picks over
struct or string buffers (q_minmax_by, q_cdc_apply's struct-max MERGE,
the min(string) survivor picks documented in q_pipeline_e2e's
docstring), and q_profile_columns' level-2 measures agg, which by
design runs AFTER the hash-agg collapse so its sort input is the
O(Σ distinct values) relation, not the corpus (see its docstring's
measured A/B). r10 adds a sixth SortAggregate: q_collated_group —
UTF8_LCASE group keys have no hash-agg fast path in Spark 4.1 (the
comparator lives in the collation), so the partial+final agg runs as
SortAggregate by construction; the hash-agg alternative is the
normalize-with-lower() form, which is deliberately the query's ORACLE,
not its engine path — the query exists to exercise the collated
comparator. r11 adds two more adjudicated SortAggregates:
q_variant_explode — min/max(STRING) agg buffers have no hash-agg fast
path; the query collapses to distinct (key, value) pairs FIRST so the
sort input is O(distinct), never the corpus (2.76→0.76 s grid after
that restructure) — and q_bitmap_distinct, whose 4 KB BINARY bitmap
buffers are likewise sort-based by Spark's aggregate selection; the
sorted relation is the narrow (type, day, bucket, id) projection and
the measured scale curve is flat (1.4 s at sf10, 2.6×/100×) — the
hash-path alternative IS count(DISTINCT)'s Expand, which the query
exists to avoid. r13 (optimization round) REMOVED two BNLJs: the
q_ann_pq / q_ann_pq_residual coarse IVF assignment is now a
driver-held-model Arrow projection (similarity._cell_assigner) instead
of a 16-row centroid crossJoin + per-vector window (q_similarity_ann
keeps the crossJoin — A/B'd 2× faster at sf0.1 with no
training/encode consumers to amortize the Arrow crossing).
r13 adds: q_ks_lengths
(BNLJ — sources × broadcast O(distinct-lengths) ECDF grid, bounded by
physical length caps); and three struct-buffer SortAggregates in the
q_minmax_by/q_cdc_apply class (struct min/max has no hash-agg
fast path by Spark's aggregate selection): q_dedup_fuzzy_ledger's
keeper pick runs over CLUSTERED docs only (O(clustered) ≪ corpus),
q_gap_islands' longest-streak pick runs over O(islands), and
q_ohlc_bars' open/close struct-min/max is the single-shuffle
mergeable form whose alternative — the oracle's two row_number
windows — costs two full sorts instead of one.
Current expected total: 17 flagged, all documented (mirrors
tests/test_plan_audit.py::_BNLJ_ALLOWED).

Usage:
    python tools/planscan.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from project_map_reduce_spark.registry import entries  # noqa: E402
from project_map_reduce_spark.session import get_spark  # noqa: E402

# Queries that execute side effects at plan-build time (streaming jobs,
# table writes) — compiled plans of their final localized frame are not
# the interesting part; their shapes are covered by dedicated tests.
_SKIP = {"q_stream_totals", "q_watermark_late", "q_stream_dedup_watermark", "q_join_interval_stream", "q_stream_enrich", "q_stream_sessions", "q_join_bucketed", "q_mv_incremental", "q_partition_prune"}

_SMELLS = ("SortAggregate", "CartesianProduct", "BroadcastNestedLoopJoin")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    a = p.parse_args()
    spark = get_spark("planscan")
    flagged = 0
    for name, e in sorted(entries().items()):
        if name in _SKIP:
            continue
        try:
            df = e.fn(spark, a.sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            print(f"ERR  {name}: {type(ex).__name__}: {ex}")
            flagged += 1
            continue
        marks = [s for s in _SMELLS if s in plan]
        if marks:
            print(f"FLAG {name}: {', '.join(marks)}")
            flagged += 1
    print(f"scanned {len(entries()) - len(_SKIP)} plans, {flagged} flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
