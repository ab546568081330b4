"""Focused query timer — bench.py's measurement discipline for a subset.

Times only the named queries (min-of-k, noop sink, warm session, steal
accounting) so a regression can be re-measured without paying the full
full-inventory bench. Used for the clean-host re-measures VERDICT r3 asks for
and for the sf1 scale probe.

Usage:
    python tools/timeq.py [--sf-dir DIR] [--runs 3] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from project_map_reduce_spark.registry import entries  # noqa: E402
from project_map_reduce_spark.session import get_spark  # noqa: E402
from project_map_reduce_spark.tables import load  # noqa: E402


def _steal_sec() -> float:
    try:
        with open("/proc/stat") as f:
            fields = f.readline().split()
        return int(fields[8]) / os.sysconf("SC_CLK_TCK")
    except Exception:  # noqa: BLE001
        return 0.0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("queries", nargs="+")
    a = p.parse_args()

    spark = get_spark("timeq")
    li = load(spark, a.sf_dir, "lineitem")
    li.count()
    li.rollup("l_returnflag").count().write.format("noop").mode("overwrite").save()

    reg = entries()
    out: dict[str, dict] = {}
    steal0 = _steal_sec()
    for name in a.queries:
        e = reg[name]
        runs = []
        for _ in range(a.runs):
            s0 = _steal_sec()
            t0 = time.perf_counter()
            e.fn(spark, a.sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(
                (round(time.perf_counter() - t0, 3), round(_steal_sec() - s0, 2))
            )
        out[name] = {
            "min_sec": min(r[0] for r in runs),
            "runs": runs,
        }
        print(f"{name}: min {out[name]['min_sec']}s  runs {runs}", flush=True)
    print(
        json.dumps(
            {"steal_sec_total": round(_steal_sec() - steal0, 2), "queries": out}
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
