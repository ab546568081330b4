"""Skew-mitigation operators: salted aggregation and salted join.

At 100 TB a single hot key (one viral user_id in ``events``, one
stop-shingle in the dedup posting lists) lands its entire group on one
reducer and turns a 1000-executor stage into a 1-executor stage. AQE's
skew-join splitting handles the *join* case when statistics catch it;
these helpers are the explicit, always-works form of the same idea
(SURVEY.md §4.2 "100 TB design rules": skewed keys → salting), usable
when AQE can't see the skew (aggregation stages, or keys whose skew
only materializes mid-pipeline).

Both helpers are pure DataFrame compositions — no UDFs, no collect —
so they keep whole-stage codegen and cost exactly one extra narrow
projection (the salt column) plus, for the join, an ``explode`` whose
output is ``n_salt`` copies of the *small* side only.

Reference analog: the reference has no skew story at all — a slow PDF
simply blocks its single-threaded worker while the gather loop waits
(Manager.java:293-311); salting is the engine-level answer to the same
straggler problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

# Aggregates that decompose into (phase-1 partial, phase-2 combine).
# count re-combines by SUM of the partial counts.
_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_groupby_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation immune to per-key skew.

    ``aggs`` maps output column name -> (input column, fn) with fn in
    {'sum', 'count', 'min', 'max'} — the decomposable aggregates whose
    partials re-combine losslessly (avg = sum/count composed by the
    caller, same as Spark's own partial-aggregation split). 'count'
    counts non-null values of the input column (SQL count(col)); pass
    column '*' for count(*) semantics. Phase 1 groups by (keys + salt),
    spreading each hot key over ``n_salt`` reducers; phase 2 groups the
    (now ≤ n_salt · |distinct keys| rows) by the real keys. The salt is
    a deterministic hash of the whole row, so the result is
    reproducible run-to-run.
    """
    bad = {fn for _, fn in aggs.values()} - set(_COMBINE)
    if bad:
        raise ValueError(f"non-decomposable aggregate(s): {sorted(bad)}")

    salted = df.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salt))
    )

    def _phase1(col: str, fn: str):
        if fn == "count":
            return F.count(F.lit(1)) if col == "*" else F.count(F.col(col))
        return getattr(F, fn)(col)

    phase1 = salted.groupBy(*keys, _SALT).agg(
        *[_phase1(col, fn).alias(out) for out, (col, fn) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[
            _COMBINE[fn](out).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys and ``small`` is modest.

    The skewed side gets a deterministic row-hash salt in [0, n_salt);
    the small side is exploded ``n_salt``× (one copy per salt value) so
    every (key, salt) pair still finds its match. The shuffle then
    distributes each hot key over ``n_salt`` partitions instead of one.
    Use when the small side is too big to broadcast outright but
    ``n_salt`` copies of it still shuffle cheaply; if the small side
    fits in memory, prefer ``F.broadcast`` (no shuffle at all).

    Only inner/left-flavored joins are supported: with 'right' or
    'full', an unmatched small-side row would survive once per salt
    replica (each replica carries a distinct salt, then the salt is
    dropped), yielding n_salt duplicates. Swap the operands and use
    'left' instead of 'right'.
    """
    flavor = how.replace("_", "").lower()
    if flavor in {"right", "rightouter", "full", "fullouter", "outer"}:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched rows of the "
            "replicated small side would be duplicated n_salt times. "
            "Swap the operands (skewed side must be the left/preserved side)."
        )
    salted = skewed.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(n_salt))
    )
    replicated = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return salted.join(replicated, on=on + [_SALT], how=how).drop(_SALT)
