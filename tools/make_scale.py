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

# table -> columns to offset by replica * (max+1). Empty list = replicate
# rows verbatim (no keys; only tiny fixed dims opt out of replication).
_OFFSET_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
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
    for t, keys in _OFFSET_KEYS.items():
        base = f"'{src}/{t}.parquet'"
        # one offset literal per key column: replica r shifts the key by
        # r * (max(key)+1) — disjoint ranges, FK-consistent because every
        # referencing table uses the same per-key stride.
        strides = {
            k: con.execute(f"SELECT max({k}) + 1 FROM {base}").fetchone()[0]
            for k in keys
        }
        selects = []
        for r in range(copies):
            cols = ["*"]
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
