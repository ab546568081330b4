"""Synthesize an sf1-scale bench fixture from the driver's sf0.1 tables.

The driver ships sf{0.001,0.01,0.1} only; the scale probe (VERDICT r3
item 6) needs one order of magnitude more rows to surface buffering
cliffs that sf0.1 cannot (exact-percentile group buffers, collect_list
hot keys, applyInPandas group batches). This tool builds `sf1` as a
10-way replication of sf0.1 with KEY OFFSETS, so every cardinality that
matters scales with the data instead of collapsing into 10x duplicate
keys:

- fact/dim surrogate keys (orderkey, custkey, partkey, suppkey,
  event_id, user_id, doc_id, vec_id) are offset by `replica * ceil
  (max+1)` — FK joins stay consistent replica-locally, distinct-key
  counts scale 10x, join fanout per key stays constant (the honest
  scale-up: 10x rows through the same per-key work profile);
- `region`/`nation` stay fixed (TPC-H semantics: geography does not
  grow with sf);
- `documents.text` gets a per-replica token suffix (`tok` -> `tok_3`),
  so the within-replica duplicate/near-dup structure is preserved
  exactly while cross-replica Jaccard is 0 — dedup workloads scale
  linearly instead of quadratically exploding on 10 identical corpora;
- `events.ts` is left unchanged: 10x events per window is the correct
  stress for window/sessionization state.

Deterministic (pure column arithmetic, no RNG). Output is parquet, one
file per table, written OUTSIDE the repo tree's tracked files (default
/root/repo/.scale/sf1 — gitignored). Not a correctness fixture: the
oracle gate stays on the driver's sf0.01; this exists only for
`bench.py` via SPARK_GRAFT_SF_DIR.

Usage:
    python tools/make_scale.py [--src /root/testdata/sf0.1] \
        [--out /root/repo/.scale/sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

# Logical surrogate keys: stride comes from the OWNING table's max, and
# every table referencing the key (PK or FK column) offsets by that same
# stride. Computing strides per-referencing-table would misalign joins
# whenever a FK's max differs from the PK's max (true for real dbgen
# output, where e.g. custkeys divisible by 3 place no orders).
_KEY_OWNERS = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

# table -> {column: logical key}. Tables absent here are replicated only
# if listed; tiny fixed dims opt out entirely.
_OFFSET_COLS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
_FIXED = ["region", "nation"]


def build(src: str, out: str, copies: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in _FIXED:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied verbatim")
    # one stride per LOGICAL key, from its owning table
    key_stride = {
        key: con.execute(
            f"SELECT max({col}) + 1 FROM '{src}/{owner}.parquet'"
        ).fetchone()[0]
        for key, (owner, col) in _KEY_OWNERS.items()
    }
    for t, cols in _OFFSET_COLS.items():
        base = f"'{src}/{t}.parquet'"
        # replica r shifts each key column by r * owner-stride —
        # disjoint ranges, FK-consistent because the referencing and
        # owning tables share the stride by construction.
        strides = {c: key_stride[k] for c, k in cols.items()}
        keys = list(cols)
        selects = []
        for r in range(copies):
            replaces = [
                f"{k} + {r * strides[k]} AS {k}" for k in keys
            ]
            if t == "documents" and r > 0:
                # suffix every token: within-replica dup/near-dup
                # structure intact, cross-replica overlap zero.
                replaces.append(
                    f"concat(replace(text, ' ', '_{r} '), '_{r}') AS text"
                )
            selects.append(
                f"SELECT * REPLACE ({', '.join(replaces)}) FROM {base}"
            )
        union = " UNION ALL ".join(selects)
        con.execute(
            f"COPY ({union}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({copies}x)")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="/root/testdata/sf0.1")
    p.add_argument("--out", default="/root/repo/.scale/sf1")
    p.add_argument("--copies", type=int, default=10)
    a = p.parse_args()
    build(a.src, a.out, a.copies)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
