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

Two measurement-hardening disciplines (VERDICT r6 item 2):

**Per-run steal accounting.** The host VM exhibits sporadic multi-second
freezes (hypervisor steal, visible in /proc/stat field 9): a query that
straddles one records a wall time 10-100× its true cost while its
neighbors stay sub-second — round 6's driver bench accumulated 111.7 s
of steal and 14 per-query numbers breached the 2× grid gate on paper
while a clean-host re-measure put every one under it. Each run here
therefore records its OWN steal delta; a run whose steal exceeds
``_STEAL_POISON_SEC`` is discarded as poisoned and re-sampled (bounded
by ``_MAX_RUNS``), the same discipline ``tools/timeq.py`` applies to
clean-host probes. The reported number is min over CLEAN runs; only if
every sample was poisoned does the raw min stand (and the query is
listed under ``poisoned`` so the artifact is diagnosable).

**Tail-capture-proof output.** The driver records the last 2000 chars of
output; a 121-entry named queries dict is ~2.8 KB, so round 6's artifact
kept only the tail of the line and parsed as null. The full named
mapping is therefore always written to ``bench_full.json`` next to this
file (committed to git — the durable record), and the stdout line keeps
the contract's named-dict form only while it fits the capture window;
above that it degrades to ``"q_sec"``: values aligned with the SORTED
query names (the registry's own order, recoverable from
``sorted(entries())`` or from bench_full.json's ``queries`` keys).
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


# Low enough to catch a 4-second host stall poisoning a 1-second query
# (round-1 q_join_broadcast recorded 4.3 s of what was broadcast-build
# stall noise); the handful of genuinely >3 s queries just pay one
# extra timed run each.
_RETRY_THRESHOLD_SEC = 3.0
# A run observing more steal than max(0.3 s, 10% of its wall time) is
# poisoned and re-sampled. The floor distinguishes a real stall from
# the host's ambient ~0.05 s/s drizzle for sub-second queries; the
# proportional term keeps the multi-second streaming queries (whose
# micro-batch floor makes them straddle drizzle for 5-7 s) from burning
# their sample budget on steal that inflates them by only a few percent.
_STEAL_POISON_SEC = 0.3
_STEAL_POISON_FRAC = 0.10
# Hard cap on samples per query — a persistent steal storm must not
# spin the bench forever; the artifact flags the query instead.
_MAX_RUNS = 5
# The driver keeps the last 2000 chars of output; leave headroom for
# the trailing newline and any interleaved stderr flush.
_LINE_BUDGET = 1900


def _steal_sec() -> float:
    """Cumulative hypervisor steal time in seconds (0.0 if unreadable)."""
    try:
        with open("/proc/stat") as f:
            fields = f.readline().split()
        return int(fields[8]) / os.sysconf("SC_CLK_TCK")
    except Exception:  # noqa: BLE001
        return 0.0


def _measure(fn, spark, sf_dir) -> tuple[float, int, bool]:
    """(min clean wall sec, n samples, all_poisoned) for one query."""
    runs: list[tuple[float, float]] = []  # (wall, steal)
    while True:
        s0 = _steal_sec()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append((time.perf_counter() - t0, _steal_sec() - s0))
        clean = [
            w for w, s in runs
            if s <= max(_STEAL_POISON_SEC, _STEAL_POISON_FRAC * w)
        ]
        # Always take min-of-2 clean (the host also has sub-threshold
        # noise windows inflating everything ~30%); sample a 3rd time
        # only while the clean min still looks stall-poisoned.
        if len(clean) >= 2 and (
            min(clean) <= _RETRY_THRESHOLD_SEC or len(clean) >= 3
        ):
            return min(clean), len(runs), False
        if len(runs) >= _MAX_RUNS:
            if clean:
                return min(clean), len(runs), False
            return min(w for w, _ in runs), len(runs), True


def emit_line(out: dict) -> str:
    """The stdout contract line. Named-dict form while it fits the
    driver's 2000-char tail capture; above that, degrade the per-query
    map to a sorted-name-aligned value array (``q_sec``) so the whole
    line survives and parses (tests pin the budget as the inventory
    grows)."""
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > _LINE_BUDGET:
        compact = dict(out)
        compact["queries"] = "q_sec, aligned with sorted query names"
        compact["q_sec"] = [out["queries"][k] for k in sorted(out["queries"])]
        line = json.dumps(compact, separators=(",", ":"))
    return line


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    # Warmup: force one full scan plus a small aggregate so the JVM,
    # whole-stage-codegen compiler, and shuffle machinery are all hot —
    # otherwise the alphabetically-first timed query absorbs ~1s of
    # one-time compilation cost that belongs to session startup.
    li = load(spark, sf_dir, "lineitem")
    li.count()
    # rollup compiles both the plain hash-aggregate and the Expand
    # (grouping-sets) codegen paths in one shot.
    li.rollup("l_returnflag").count().write.format("noop").mode("overwrite").save()
    steal0 = _steal_sec()

    times: dict[str, float] = {}
    poisoned: list[str] = []
    for name, e in sorted(entries().items()):
        try:
            sec, n_runs, all_poisoned = _measure(e.fn, spark, sf_dir)
            times[name] = round(sec, 3)
            if all_poisoned:
                poisoned.append(name)
            note = "" if n_runs == 2 else f" ({n_runs} samples)"
            flag = " [steal-poisoned]" if all_poisoned else ""
            print(
                f"bench: {name} {times[name]:.2f}s{note}{flag}", file=sys.stderr
            )
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
        "steal_sec": round(_steal_sec() - steal0, 1),
        "poisoned": poisoned,
    }

    # Durable full record, independent of the driver's capture window.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_full.json")
    try:
        with open(full_path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError as ex:
        print(f"bench: could not write {full_path}: {ex}", file=sys.stderr)

    print(emit_line(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
