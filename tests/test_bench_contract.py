"""bench.py's driver contract: the stdout line must survive the
driver's 2000-char tail capture at the CURRENT inventory size (round
6's artifact lost 46 of 121 entries and parsed as null — VERDICT r6
item 2), and the degraded form must be losslessly decodable."""

from __future__ import annotations

import json

import bench
from project_map_reduce_spark.registry import entries


def test_contract_line_fits_tail_capture_at_current_inventory():
    times = {k: 123.456 for k in entries()}  # worst-case value widths
    out = {
        "metric": "total_query_wall_sec",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": 0.1,
        "n_queries": len(times),
        "n_failed": 0,
        "steal_sec": 9999.9,
        "poisoned": [],
    }
    line = bench.emit_line(out)
    assert len(line) <= bench._LINE_BUDGET, len(line)
    parsed = json.loads(line)
    # lossless decode: q_sec aligns with sorted query names
    got = dict(zip(sorted(times), parsed["q_sec"]))
    assert got == times
    assert parsed["n_queries"] == len(times)


def test_small_inventory_keeps_the_named_dict():
    out = {"queries": {"q_a": 1.0, "q_b": 2.0}, "n_queries": 2}
    parsed = json.loads(bench.emit_line(out))
    assert parsed["queries"] == {"q_a": 1.0, "q_b": 2.0}
