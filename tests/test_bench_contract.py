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
        "slow_window_remeasured": [f"q_{i}" for i in range(20)],
    }
    line = bench.emit_line(out)
    assert len(line) <= bench._LINE_BUDGET, len(line)
    parsed = json.loads(line)
    # decodable: q_sec aligns with sorted query names; tier-2 degrade
    # (inventory > ~200) may round to 2 dp — bench_full.json keeps
    # full precision, the capture-window line needs grid-ratio grade
    got = dict(zip(sorted(times), parsed["q_sec"]))
    assert set(got) == set(times)
    for k, v in got.items():
        assert abs(v - times[k]) <= 0.005 + 1e-9, (k, v)
    assert parsed["n_queries"] == len(times)
    # The alignment key must be verifiable from the line alone
    # (VERDICT r13 item 2): names_sha256 is the digest of the sorted
    # name list the q_sec array is zipped with.
    import hashlib

    want = hashlib.sha256("\n".join(sorted(times)).encode()).hexdigest()[:16]
    assert parsed["names_sha256"] == want


def test_small_inventory_keeps_the_named_dict():
    out = {"queries": {"q_a": 1.0, "q_b": 2.0}, "n_queries": 2}
    parsed = json.loads(bench.emit_line(out))
    assert parsed["queries"] == {"q_a": 1.0, "q_b": 2.0}


def test_slow_window_detection_flags_contiguous_breach_runs():
    """VERDICT r7 item 7: a sub-steal-threshold host-slow window shows
    up as >= 3 consecutive queries over 1.5x their grid reference; the
    whole run is flagged for re-measure. Shorter runs are noise."""
    grid = {f"q_{c}": 1.0 for c in "abcdefgh"}
    # three contiguous breaches (c,d,e) inside an otherwise-clean sweep
    ordered = [
        ("q_a", 1.1), ("q_b", 1.2),
        ("q_c", 1.9), ("q_d", 2.4), ("q_e", 1.8),
        ("q_f", 1.0), ("q_g", 1.9), ("q_h", 2.0),  # only a 2-run: noise
    ]
    assert bench._slow_window_suspects(ordered, grid) == {"q_c", "q_d", "q_e"}


def test_slow_window_neutral_and_breaking_entries():
    """A query with no grid entry (new this round) must not break a
    straddling slow window; a failed query must."""
    grid = {"q_a": 1.0, "q_c": 1.0, "q_d": 1.0, "q_x": 1.0, "q_y": 1.0, "q_z": 1.0}
    straddled = [
        ("q_a", 2.0), ("q_b", 5.0),  # q_b has no grid entry: neutral
        ("q_c", 2.0), ("q_d", 2.0),
    ]
    assert bench._slow_window_suspects(straddled, grid) == {"q_a", "q_c", "q_d"}
    broken = [("q_x", 2.0), ("q_y", -1.0), ("q_z", 2.0)]
    assert bench._slow_window_suspects(broken, grid) == set()


def test_slow_window_detection_empty_without_grid():
    assert bench._slow_window_suspects([("q_a", 99.0)] * 5, {}) == set()


def test_grid_loads_only_at_its_own_scale_factor():
    """The detector must arm only when the bench sf matches the grid's
    (at 10x the grid's data everything exceeds 1.5x legitimately —
    the r8 sf1 sweep's 84 pointless re-measures)."""
    import json

    grid_sf = json.load(open("BASELINE_GRID.json"))["sf"]
    assert bench._load_grid(grid_sf)  # non-empty at the grid's sf
    assert bench._load_grid(grid_sf * 10) == {}
    assert bench._load_grid(None) == {}


def test_grid_covers_registry_exactly():
    """Every registered query must carry a BASELINE_GRID floor (the 2x
    gate is meaningless for a query without a reference), and the grid
    must not carry ghosts of renamed/removed queries; the summary
    fields must stay consistent with the entries."""
    g = json.load(open("BASELINE_GRID.json"))
    reg = set(entries())
    grid = set(g["queries"])
    assert grid == reg, (sorted(reg - grid), sorted(grid - reg))
    assert g["n_queries"] == len(g["queries"])
    assert abs(g["total_min_sec"] - sum(g["queries"].values())) < 0.5, (
        g["total_min_sec"], round(sum(g["queries"].values()), 2)
    )


def test_host_gate_defers_until_calm_then_releases():
    """The pre-flight gate (VERDICT r11 item 4) must wait through a
    storm window and release on the first calm sample; the artifact
    record must carry the observed rates and total deferral."""
    # stormy for 2 windows (30% steal rate), then calm
    steals = iter([0.0, 1.5, 1.5, 3.0, 3.0, 3.05])
    clock = {"t": 0.0}

    def fake_sleep(sec):
        clock["t"] += sec

    gate = bench._host_gate(
        sample_sec=5.0,
        timeout_sec=60.0,
        _sleep=fake_sleep,
        _steal=lambda: next(steals),
        _clock=lambda: clock["t"],
    )
    assert gate["calm"] is True
    assert len(gate["samples"]) == 3
    assert gate["samples"][0] > bench._GATE_STEAL_RATE
    assert gate["samples"][-1] <= bench._GATE_STEAL_RATE


def test_host_gate_times_out_flagged_not_forever():
    """A permanently-stormy host must yield a flagged record, not an
    infinite deferral: calm=False after the timeout budget."""
    import itertools

    clock = {"t": 0.0}

    def fake_sleep(sec):
        clock["t"] += sec

    stormy = itertools.count(step=10.0)  # 10s steal per call -> 100% rate
    gate = bench._host_gate(
        sample_sec=5.0,
        timeout_sec=12.0,
        _sleep=fake_sleep,
        _steal=lambda: next(stormy),
        _clock=lambda: clock["t"],
    )
    assert gate["calm"] is False
    assert gate["waited_sec"] >= 12.0


def test_host_gate_env_skip(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_NO_GATE", "1")
    gate = bench._host_gate(_sleep=lambda s: (_ for _ in ()).throw(AssertionError))
    assert gate == {"waited_sec": 0.0, "samples": [], "calm": True, "skipped": True}
