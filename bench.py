"""Bench harness (driver contract).

Times every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
     "queries": {"q_pricing_summary": sec, ...}, "sf": 0.1}

Each query is forced with the ``noop`` datasource sink, which executes
the full physical plan (scan → shuffle → agg) without collecting rows to
the driver — the same work profile a cluster write would have, and no
driver-memory artifact of local mode. A one-off warmup action amortizes
JVM/session startup out of the per-query numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from project_map_reduce_spark.registry import entries  # noqa: E402
from project_map_reduce_spark.session import get_spark  # noqa: E402
from project_map_reduce_spark.tables import load  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    # Warmup: force one full scan so JVM/codegen/readers are hot.
    load(spark, sf_dir, "lineitem").count()

    times: dict[str, float] = {}
    for name, e in sorted(entries().items()):
        t0 = time.perf_counter()
        try:
            e.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 3)
            print(f"bench: {name} {times[name]:.2f}s", file=sys.stderr)
        except Exception as ex:  # noqa: BLE001
            print(f"bench: {name} failed: {type(ex).__name__}: {ex}", file=sys.stderr)
            times[name] = -1.0

    ok = {k: v for k, v in times.items() if v >= 0}
    out = {
        "metric": "total_query_wall_sec",
        "value": round(sum(ok.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "n_queries": len(times),
        "n_failed": len(times) - len(ok),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
