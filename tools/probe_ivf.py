"""Scaled-k sf10 evidence for the embedding-dedup family (VERDICT r9
item 6): run Q99 (q_dedup_embedding_ivf) and Q135 (q_semdedup) with the
IVF cell count k SCALED TO THE CORPUS — the declared escape hatch of
their fixed-k=8 oracle forms — and record wall time + emitted pair/
ledger volume, proving per-vector pair work stays flat when per-cell
population is held at the grid shape (~250 vectors/cell: k = n/250).

The production queries read module-level ``_IVF_K`` at call time, so
the probe sets it for the run and restores it (probe-only; the
registered oracles stay k=8 — this tool never touches correctness).

Usage:
    python tools/probe_ivf.py --sf-dir /root/repo/.scale/sf10 --k 800
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from project_map_reduce_spark.session import get_spark  # noqa: E402


def _steal() -> float:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8]) / 100.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--k", type=int, required=True)
    ap.add_argument(
        "--queries",
        nargs="+",
        default=["q_dedup_embedding_ivf", "q_semdedup"],
    )
    args = ap.parse_args()

    from project_map_reduce_spark.plans import dedup
    from project_map_reduce_spark.registry import entries

    spark = get_spark("ivf_probe")
    prev_k = dedup._IVF_K
    dedup._IVF_K = args.k
    try:
        for name in args.queries:
            fn = entries()[name].fn
            s0, t0 = _steal(), time.time()
            n_out = fn(spark, args.sf_dir).count()
            rec = {
                "query": name,
                "k": args.k,
                "sf_dir": args.sf_dir,
                "wall_sec": round(time.time() - t0, 1),
                "steal_sec": round(_steal() - s0, 1),
                "n_out_rows": n_out,
            }
            print(json.dumps(rec), flush=True)
    finally:
        dedup._IVF_K = prev_k
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
