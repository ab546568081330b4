"""Round-13 additions: engine-side invariants the DuckDB oracle sweep
can't see (ledger keep/remove algebra, plan shapes)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from project_map_reduce_spark.registry import entries
from project_map_reduce_spark.tables import load


# ---------------------------------------------- Q195 fuzzy-dedup ledger
def test_fuzzy_ledger_every_removed_doc_has_a_kept_witness(spark, sf_dir):
    """Q195's contract (VERDICT r12 item 4 'Done' criterion): the
    ledger must be a valid dedup decision — every removed doc shares
    its cluster with EXACTLY ONE kept doc, that keeper dominates it
    under the declared rule (n_chars DESC, doc_id ASC), and kept docs
    are never removed. A ledger violating any of these would silently
    delete whole clusters (or keep duplicates) in the consuming
    pipeline."""
    rows = entries()["q_dedup_fuzzy_ledger"].fn(spark, sf_dir).collect()
    n_chars = {
        r["doc_id"]: r["n_chars"]
        for r in load(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    }
    assert len(rows) == len(n_chars)  # full per-document ledger
    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r["cluster_id"]].append(r)
    for cid, members in by_cluster.items():
        kept = [m for m in members if not m["removed"]]
        assert len(kept) == 1, f"cluster {cid}: {len(kept)} keepers"
        keeper = kept[0]
        # declared keep rule: longest doc wins, ties to smaller doc_id
        best = min(members, key=lambda m: (-n_chars[m["doc_id"]], m["doc_id"]))
        assert keeper["doc_id"] == best["doc_id"], (cid, keeper, best)
        for m in members:
            assert m["cluster_size"] == len(members)


def test_fuzzy_ledger_clusters_are_exactly_the_pair_graph_components(
    spark, sf_dir
):
    """Q195's cluster ids must be the connected components of Q44's
    pair graph (min doc_id per component), with every unpaired doc a
    singleton keeping its own id — the composition seam between the
    LSH pair stage and the ledger. A drifted seam (e.g. components run
    over unfiltered candidate pairs instead of verified ones) changes
    removal decisions silently."""
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in entries()["q_dedup_fuzzy"].fn(spark, sf_dir).collect()
    ]
    # union-find over the verified pair graph
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in list(parent)}
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in entries()["q_dedup_fuzzy_ledger"].fn(spark, sf_dir).collect()
    }
    paired = set(expect)
    for doc, cid in got.items():
        if doc in paired:
            assert cid == expect[doc], (doc, cid, expect[doc])
        else:
            assert cid == doc, f"unpaired doc {doc} not a singleton ({cid})"


# ------------------------------------------------ Q196 residual IVF-PQ
def test_ann_pq_residual_recall(spark, tmp_path):
    """Q196's headline claim (VERDICT r12 item 6 'Done' criterion):
    on CLUSTERED data — residual PQ's operating regime — encoding
    within-cell residuals must recover at least the recall of raw-PQ
    under the identical m×k codeword budget. The fixture is 16
    well-separated Gaussian blobs whose first-16 vec_ids are the blob
    representatives (= the engine's IVF centroids), so residuals
    concentrate near the origin per cell while raw sub-vectors must
    share 8 codewords across all 16 blob positions. The driver
    fixture's uniform-random embeddings are the degenerate case (no
    cell structure) and assert nothing here."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as papq

    from project_map_reduce_spark.plans.similarity import _N_CELLS

    rng = np.random.default_rng(7)
    per = 25
    centers = rng.normal(0, 1.0, (_N_CELLS, 64))
    vecs = np.repeat(centers, per, axis=0) + rng.normal(
        0, 0.05, (_N_CELLS * per, 64)
    )
    ids = np.arange(_N_CELLS * per)
    # permute so vec_ids 0..15 are one sample per blob (the IVF cells)
    reps = np.arange(_N_CELLS) * per
    perm = np.concatenate([reps, np.setdiff1d(ids, reps)])
    vecs = vecs[perm]
    papq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [v.astype(np.float32).tolist() for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array((ids % 4).astype(np.int32), pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )

    # independent reference: float32-cast coarse assignment + exact L2
    vv = vecs.astype(np.float32).astype(np.float64)
    cc = vv[ids < _N_CELLS]
    cent_ids = ids[ids < _N_CELLS]
    nrm = np.linalg.norm(vv, axis=1)
    cnrm = np.linalg.norm(cc, axis=1)
    cell = cent_ids[
        np.argmax((vv @ cc.T) / (nrm[:, None] * cnrm[None, :]), axis=1)
    ]

    def recall(qname: str) -> float:
        by_q: dict[int, set] = {}
        for r in entries()[qname].fn(spark, str(tmp_path)).collect():
            by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = total = 0
        for qid, got in by_q.items():
            qi = int(np.nonzero(ids == qid)[0][0])
            mates = np.nonzero((cell == cell[qi]) & (ids != qid))[0]
            d2 = ((vv[mates] - vv[qi]) ** 2).sum(axis=1)
            exact = {
                int(ids[mates[i]])
                for i in np.argsort(d2, kind="stable")[:3]
            }
            hits += len(got & exact)
            total += len(exact)
        assert total > 0
        return hits / total

    raw, res = recall("q_ann_pq"), recall("q_ann_pq_residual")
    assert res >= raw, f"residual recall {res} < raw recall {raw}"
    print(f"clustered-fixture recall@3: raw {raw:.3f} residual {res:.3f}")


# --------------------------------------------- Q197 gaps-and-islands
def test_gap_islands_matches_bruteforce_streaks(spark, sf_dir):
    """Q197 vs a per-user brute-force streak recomputation over the
    collected (user, day) set — pins the anchor-date algebra (the
    oracle replays the same SQL idiom, so an idiom-level error would
    pass parity; this reference computes streaks by direct date
    iteration instead)."""
    from datetime import timedelta

    days = defaultdict(set)
    for r in (
        load(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .collect()
    ):
        days[r["user_id"]].add(r["day"])
    got = {
        r["user_id"]: r
        for r in entries()["q_gap_islands"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(days)
    for uid, ds in days.items():
        runs = []
        for d in sorted(ds):
            if runs and d == runs[-1][1] + timedelta(days=1):
                runs[-1][1] = d
            else:
                runs.append([d, d])
        lens = [(e - s).days + 1 for s, e in runs]
        best = min(zip([-x for x in lens], (s for s, _ in runs)))
        r = got[uid]
        assert r["n_active_days"] == len(ds)
        assert r["n_streaks"] == len(runs)
        assert r["max_streak"] == max(lens)
        assert r["max_streak_start"] == best[1]


def test_gap_islands_plan_reuses_user_partitioning(spark, sf_dir):
    """Q197's 100 TB shape: exactly TWO exchanges — the distinct's
    (user, day) shuffle and the window's user_id shuffle; the streak
    and final rollups must reuse the window's user_id partitioning
    (ClusteredDistribution(user_id, anchor) is satisfied by
    HashPartitioning(user_id)), and no global sort may appear."""
    df = entries()["q_gap_islands"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, plan
    assert "Exchange rangepartitioning" not in plan, plan


# ------------------------------------------------- Q198 text entropy
def test_text_entropy_matches_independent_computation(spark, sf_dir):
    """Q198 vs an independent Python entropy computation with the
    SAME micro-unit term quantization — pins the unit-splitting
    semantics (space tokens, char units with the trailing-'' filter)
    and the exact-integer term-sum contract."""
    import math

    texts = {
        r["doc_id"]: r["text"]
        for r in load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .limit(50)
        .collect()
    }
    rows = {
        r["doc_id"]: r
        for r in entries()["q_text_entropy"].fn(spark, sf_dir).collect()
        if r["doc_id"] in texts
    }
    assert set(rows) == set(texts)

    def h_micro(units: list[str]) -> tuple[int, int, int]:
        n = len(units)
        from collections import Counter

        cnt = Counter(units)
        micro = sum(
            round(-(c / n) * math.log(c / n) * 1_000_000)
            for c in cnt.values()
        )
        return micro, n, len(cnt)

    for doc_id, text in texts.items():
        r = rows[doc_id]
        tm, tn, tt = h_micro(text.split(" "))
        cm, _, _ = h_micro(list(text))
        assert r["n_tokens"] == tn
        assert r["n_types"] == tt
        assert abs(r["token_entropy"] - tm / 1e6) < 1e-9, doc_id
        assert abs(r["char_entropy"] - cm / 1e6) < 1e-9, doc_id
        assert abs(r["type_token_ratio"] - round(tt / tn, 6)) < 1e-9


# ---------------------------------------------- Q199 RFM segmentation
def test_rfm_segments_partition_the_customer_base(spark, sf_dir):
    """Q199: the 8 R/F/M segments must exactly partition the ordering
    customers (every customer in exactly one segment), labels must be
    the {R,r}×{F,f}×{M,m} product, and totals must reconcile with the
    orders table — a segmentation that drops or double-counts
    customers silently corrupts every downstream rate."""
    rows = entries()["q_rfm_segments"].fn(spark, sf_dir).collect()
    labels = {r["segment"] for r in rows}
    assert labels <= {
        a + b + c for a in "Rr" for b in "Ff" for c in "Mm"
    }
    o = load(spark, sf_dir, "orders")
    n_cust = o.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert sum(r["total_orders"] for r in rows) == o.count()


# ------------------------------------------------------ Q200 OHLC bars
def test_ohlc_bars_candle_algebra(spark, sf_dir):
    """Q200: candle invariants no single-row check can fake — high is
    the bar max (>= open, close), low is the bar min (<= open, close),
    open/close equal the first/last event's value under the
    (ts, event_id) total order, and n_events reconciles with the raw
    event count."""
    rows = entries()["q_ohlc_bars"].fn(spark, sf_dir).collect()
    assert rows
    total = 0
    for r in rows:
        total += r["n_events"]
        assert r["high"] >= max(r["open"], r["close"])
        assert r["low"] <= min(r["open"], r["close"])
        assert r["high"] >= r["low"]
    assert total == load(spark, sf_dir, "events").count()
    # spot-check one bar's open/close against the raw ordering
    ev = load(spark, sf_dir, "events")
    bar = max(rows, key=lambda r: r["n_events"])
    pts = sorted(
        ev.filter(
            (F.col("event_type") == bar["event_type"])
            & (F.date_trunc("HOUR", F.col("ts")) == bar["bar_ts"])
        )
        .select("ts", "event_id", "value")
        .collect(),
        key=lambda p: (p["ts"], p["event_id"]),
    )
    assert round(pts[0]["value"], 6) == bar["open"]
    assert round(pts[-1]["value"], 6) == bar["close"]


def test_fuzzy_ledger_broadcasts_the_cluster_relation(spark, sf_dir):
    """Q195's 100 TB shape: the corpus-wide ledger join against the
    (small) cluster/keeper relation must be broadcast, never a
    corpus-shuffle sort-merge join — and no Window operator may appear
    (the keeper is a groupBy over clustered docs only, the Q119
    collapse-first discipline)."""
    df = entries()["q_dedup_fuzzy_ledger"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


# ---------------------------------------- Q201 interval overlap (wave 2)
def test_interval_overlap_matches_simple_sweep(spark, sf_dir):
    """Q201's chunked two-phase prefix sum must equal the textbook
    single-pass sweep line recomputed in Python — pins the chunk
    decomposition algebra (base + local == global running sum) and
    the closed-open boundary rule (-1 before +1 at an instant)."""
    from project_map_reduce_spark.plans.event_analytics import _LEASE_MICROS

    from project_map_reduce_spark.functions.det import epoch_micros

    ev = load(spark, sf_dir, "events").select(
        "event_type", epoch_micros("ts").alias("t")
    )
    deltas = defaultdict(list)
    for r in ev.collect():
        deltas[r["event_type"]].append((r["t"], 1))
        deltas[r["event_type"]].append((r["t"] + _LEASE_MICROS, -1))
    expect = {}
    for et, ds in deltas.items():
        run = peak = 0
        peak_at = None
        for t, d in sorted(ds):
            run += d
            if run > peak:
                peak, peak_at = run, t
        expect[et] = (peak, peak_at)
    got = {
        r["event_type"]: (r["peak_concurrency"], r["peak_at_micros"])
        for r in entries()["q_interval_overlap"].fn(spark, sf_dir).collect()
    }
    assert got == expect


# ------------------------------------------------ Q202 Gini (wave 2)
def test_gini_spend_matches_bruteforce(spark, sf_dir):
    """Q202 vs the rank-formula Gini recomputed in Python from raw
    cents — pins the exact-integer algebra and the (cents, custkey)
    tie order; also bounds: 0 <= G < 1 for non-negative spend."""
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    spend = defaultdict(int)
    for r in o.collect():
        spend[r["o_custkey"]] += round(r["o_totalprice"] * 100)
    seg_of = {r["c_custkey"]: r["c_mktsegment"] for r in c.collect()}
    by_seg = defaultdict(list)
    for k, v in spend.items():
        by_seg[seg_of[k]].append((v, k))
    got = {
        r["segment"]: r
        for r in entries()["q_gini_spend"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(by_seg)
    for seg, xs in by_seg.items():
        xs.sort()
        n = len(xs)
        s = sum(v for v, _ in xs)
        w = sum((i + 1) * v for i, (v, _) in enumerate(xs))
        gini = (2 * w - (n + 1) * s) / (n * s)
        r = got[seg]
        assert r["n_customers"] == n
        assert abs(r["gini"] - round(gini, 6)) < 1e-9
        assert 0.0 <= r["gini"] < 1.0


# --------------------------------------------- Q203 Benford (wave 2)
def test_benford_reconciles_and_shares_sum_to_one(spark, sf_dir):
    import math

    rows = entries()["q_benford"].fn(spark, sf_dir).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    o = load(spark, sf_dir, "orders")
    assert sum(r["n_orders"] for r in rows) == o.count()
    assert abs(sum(r["observed"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r["expected"] == round(math.log10(1 + 1 / r["digit"]), 6)
        assert abs(r["deviation"] - round(r["observed"] - r["expected"], 6)) < 1e-9


# ----------------------------------------- Q204 autocorr (wave 2)
def test_autocorr_daily_bounds_and_pair_counts(spark, sf_dir):
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", F.col("o_orderdate").cast("date"))
        .count()
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    n_days = {r["o_orderpriority"]: r["count"] for r in daily}
    for r in entries()["q_autocorr_daily"].fn(spark, sf_dir).collect():
        assert r["n_pairs"] == n_days[r["o_orderpriority"]] - 1
        assert -1.0 <= r["autocorr_lag1"] <= 1.0


# ------------------------------------- Q205/Q206 vocab stats (wave 3)
def test_ngram_coverage_matches_bruteforce_topk(spark, sf_dir):
    from collections import Counter

    cnt = Counter()
    for r in load(spark, sf_dir, "documents").select("text").collect():
        cnt.update(r["text"].split(" "))
    total = sum(cnt.values())
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    rows = {r["k"]: r for r in entries()["q_ngram_coverage"].fn(spark, sf_dir).collect()}
    prev = 0
    for k in sorted(rows):
        r = rows[k]
        covered = sum(c for _, c in ordered[:k])
        assert r["covered_tokens"] == covered
        assert r["n_vocab_used"] == min(k, len(ordered))
        assert abs(r["coverage"] - round(covered / total, 6)) < 1e-9
        assert r["covered_tokens"] >= prev
        prev = r["covered_tokens"]


def test_zipf_slope_matches_bruteforce(spark, sf_dir):
    import math
    from collections import Counter

    cnt = Counter()
    for r in load(spark, sf_dir, "documents").select("text").collect():
        cnt.update(r["text"].split(" "))
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    pts = [
        (round(math.log(i + 1) * 1e6), round(math.log(c) * 1e6))
        for i, (_, c) in enumerate(ordered)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    [r] = entries()["q_zipf_slope"].fn(spark, sf_dir).collect()
    assert r["n_vocab"] == n
    assert abs(r["zipf_slope"] - round(slope, 6)) < 1e-9
    assert r["zipf_slope"] < 0  # frequency falls with rank


# ------------------------------------------- Q207 KS drift (wave 3)
def test_ks_lengths_matches_bruteforce(spark, sf_dir):
    lens = defaultdict(list)
    for r in load(spark, sf_dir, "documents").select("source", "n_chars").collect():
        lens[r["source"]].append(r["n_chars"])
    all_vals = sorted({v for xs in lens.values() for v in xs})
    total = sum(len(xs) for xs in lens.values())
    got = {r["source"]: r for r in entries()["q_ks_lengths"].fn(spark, sf_dir).collect()}
    assert set(got) == set(lens)
    for src, xs in lens.items():
        ns, nr = len(xs), total - len(xs)
        rest = [v for s2, ys in lens.items() if s2 != src for v in ys]
        best = 0
        for v in all_vals:
            cs = sum(1 for x in xs if x <= v)
            cr = sum(1 for x in rest if x <= v)
            best = max(best, abs(cs * nr - cr * ns))
        r = got[src]
        assert r["n_docs"] == ns
        assert abs(r["ks_d"] - round(best / (ns * nr), 6)) < 1e-9
        assert 0.0 <= r["ks_d"] <= 1.0


# ------------------------------------------- Q208 CUSUM (wave 3)
def test_cusum_drift_matches_bruteforce(spark, sf_dir):
    daily = defaultdict(dict)
    for r in (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("x"))
        .collect()
    ):
        daily[r["o_orderpriority"]][r["d"]] = r["x"]
    got = {r["o_orderpriority"]: r for r in entries()["q_cusum_drift"].fn(spark, sf_dir).collect()}
    assert set(got) == set(daily)
    for prio, series in daily.items():
        days = sorted(series)
        n = len(days)
        s = sum(series.values())
        cum = 0
        best, best_day = -1, None
        for t, d in enumerate(days, start=1):
            cum += series[d]
            dev = abs(n * cum - t * s)
            if dev > best:
                best, best_day = dev, d
        r = got[prio]
        assert r["n_days"] == n
        assert abs(r["max_dev"] - round(best / n / 100, 6)) < 1e-9
        assert r["dev_day"] == best_day


# ------------------------------------------- Q209 itemsets (wave 4)
def test_freq_itemsets_supports_match_bruteforce(spark, sf_dir):
    """Q209 vs a brute-force basket-pair count — pins the distinct
    (order, part) collapse, the a<b pair orientation, the support
    floor, and the lift algebra."""
    from itertools import combinations

    baskets = defaultdict(set)
    for r in load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect():
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    support = defaultdict(int)
    part_cnt = defaultdict(int)
    for parts in baskets.values():
        for p in parts:
            part_cnt[p] += 1
        for a, b in combinations(sorted(parts), 2):
            support[(a, b)] += 1
    n = len(baskets)
    rows = entries()["q_freq_itemsets"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    seen = set()
    for r in rows:
        key = (r["part_a"], r["part_b"])
        assert key not in seen
        seen.add(key)
        assert r["part_a"] < r["part_b"]
        assert support[key] == r["support"] >= 2
        lift = r["support"] * n / (part_cnt[r["part_a"]] * part_cnt[r["part_b"]])
        assert abs(r["lift"] - round(lift, 6)) < 1e-9
    # the returned set is exactly the top-20 under the declared order
    ordered = sorted(
        ((s, a, b) for (a, b), s in support.items() if s >= 2),
        key=lambda t: (-t[0], t[1], t[2]),
    )[: len(rows)]
    assert [(r["support"], r["part_a"], r["part_b"]) for r in rows] == ordered


# --------------------------------------------- Q210 aging (wave 4)
def test_aging_buckets_reconcile(spark, sf_dir):
    from datetime import date

    rows = entries()["q_aging_buckets"].fn(spark, sf_dir).collect()
    assert {r["bucket"] for r in rows} <= {"0-30", "31-60", "61-90", "90+"}
    o = load(spark, sf_dir, "orders")
    n_eligible = o.filter(
        F.col("o_orderdate").cast("date") <= F.lit("2024-06-30").cast("date")
    ).count()
    assert sum(r["n_orders"] for r in rows) == n_eligible


# ------------------------------------- Q211 rolling anomaly (wave 4)
def test_rolling_anomaly_matches_bruteforce(spark, sf_dir):
    """Q211 vs an independent trailing-window z computation — pins the
    RANGE-frame day arithmetic (gaps shrink the window), the warm-up
    rule, and the micro-unit quantize-before-compare contract."""
    import math

    daily = defaultdict(dict)
    for r in (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.sum(F.round(F.col("value") * 1_000_000).cast("bigint")).alias("x"))
        .collect()
    ):
        daily[r["event_type"]][r["d"]] = r["x"]
    got = {r["event_type"]: r for r in entries()["q_rolling_anomaly"].fn(spark, sf_dir).collect()}
    for et, series in daily.items():
        days = sorted(series)
        zs = []
        for d in days:
            wnd = [series[p] for p in days if 1 <= (d - p).days <= 7]
            nw = len(wnd)
            if nw < 3:
                continue
            s, ss = sum(wnd), sum(v * v for v in wnd)
            var = (ss - float(s) * s / nw) / (nw - 1)
            if var <= 0:
                continue
            zs.append(round((series[d] - float(s) / nw) / math.sqrt(var) * 1e6))
        if not zs:
            assert et not in got
            continue
        r = got[et]
        assert r["n_scored"] == len(zs)
        assert r["n_flagged"] == sum(1 for z in zs if abs(z) > 3_000_000)
        assert abs(r["max_abs_z"] - round(max(abs(z) for z in zs) / 1e6, 6)) < 1e-9


# ----------------------------------- Q212 DOW seasonality (wave 4)
def test_seasonality_dow_closed_form(spark, sf_dir):
    """Q212's algebraic collapse (7·Σo² − n²)/n must equal the
    textbook Σ(o−e)²/e — pins the closed form, plus peak-day and
    reconciliation invariants."""
    dow = defaultdict(lambda: defaultdict(int))
    for r in load(spark, sf_dir, "events").select("event_type", "ts").collect():
        # Python: Monday=0..Sunday=6; Spark dayofweek: Sunday=1..Saturday=7
        dw = (r["ts"].date().weekday() + 1) % 7 + 1
        dow[r["event_type"]][dw] += 1
    got = {r["event_type"]: r for r in entries()["q_seasonality_dow"].fn(spark, sf_dir).collect()}
    assert set(got) == set(dow)
    for et, cells in dow.items():
        n = sum(cells.values())
        e = n / 7
        chi2 = sum((cells.get(d, 0) - e) ** 2 / e for d in range(1, 8))
        r = got[et]
        assert r["n_events"] == n
        assert abs(r["chi2"] - round(chi2, 6)) < 1e-6
        peak = min(sorted(cells), key=lambda d: (-cells[d], d))
        assert r["peak_dow"] == peak


# ------------------------------------------ Q213 window funnel (wave 5)
def test_window_funnel_matches_bruteforce_greedy(spark, sf_dir):
    """Q213 vs an independent greedy-earliest windowed funnel walk —
    pins the 24h anchor-window rule at BOTH later steps and the
    strict t ordering; also the windowed stage count can never exceed
    Q73's unbounded stage for the same user."""
    from project_map_reduce_spark.plans.event_analytics import (
        _FUNNEL_WINDOW_MICROS,
    )
    from project_map_reduce_spark.functions.det import epoch_micros

    ev = defaultdict(lambda: defaultdict(list))
    for r in (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_type", epoch_micros("ts").alias("t"))
        .collect()
    ):
        ev[r["user_id"]][r["event_type"]].append(r["t"])
    stages = defaultdict(int)
    hours = []
    for uid, types in ev.items():
        views = sorted(types.get("view", []))
        if not views:
            continue
        t1 = views[0]
        deadline = t1 + _FUNNEL_WINDOW_MICROS
        t2 = min(
            (t for t in types.get("click", []) if t1 < t <= deadline),
            default=None,
        )
        stage = 1
        cm = None
        if t2 is not None:
            stage = 2
            t3 = min(
                (t for t in types.get("purchase", []) if t2 < t <= deadline),
                default=None,
            )
            if t3 is not None:
                stage = 3
                cm = t3 - t1
        stages[stage] += 1
        if cm is not None:
            hours.append(cm)
    got = {
        r["funnel_stage"]: r
        for r in entries()["q_window_funnel"].fn(spark, sf_dir).collect()
    }
    assert {k: v for k, v in stages.items()} == {
        k: r["n_users"] for k, r in got.items()
    }
    if 3 in got:
        expect = round(sum(hours) / len(hours) / 3_600_000_000.0, 6)
        assert abs(got[3]["avg_hours_to_complete"] - expect) < 1e-9


# -------------------------------------- Q214 audience overlap (wave 5)
def test_audience_overlap_matches_bruteforce(spark, sf_dir):
    users = defaultdict(set)
    for r in load(spark, sf_dir, "events").select("event_type", "user_id").distinct().collect():
        users[r["event_type"]].add(r["user_id"])
    rows = entries()["q_audience_overlap"].fn(spark, sf_dir).collect()
    types = sorted(users)
    assert len(rows) == sum(
        1
        for i, a in enumerate(types)
        for b in types[i + 1 :]
        if users[a] & users[b]
    )
    for r in rows:
        inter = users[r["type_a"]] & users[r["type_b"]]
        union = users[r["type_a"]] | users[r["type_b"]]
        assert r["type_a"] < r["type_b"]
        assert r["n_both"] == len(inter)
        assert abs(r["jaccard"] - round(len(inter) / len(union), 6)) < 1e-9


# ------------------------------------------- Q215 Wilson CI (wave 5)
def test_wilson_ci_bounds_and_bruteforce(spark, sf_dir):
    import math

    z = 1.959964
    clickers = defaultdict(set)
    buyers = defaultdict(set)
    for r in load(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("d"), "user_id"
    ).collect():
        if r["event_type"] == "click":
            clickers[r["d"]].add(r["user_id"])
        elif r["event_type"] == "purchase":
            buyers[r["d"]].add(r["user_id"])
    got = {r["d"]: r for r in entries()["q_wilson_ci"].fn(spark, sf_dir).collect()}
    assert set(got) == {d for d in clickers if clickers[d]}
    for d, cs in clickers.items():
        n = len(cs)
        k = len(cs & buyers.get(d, set()))
        p = k / n
        center = p + z * z / (2 * n)
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
        denom = 1 + z * z / n
        r = got[d]
        assert (r["n_clickers"], r["n_converted"]) == (n, k)
        assert abs(r["rate"] - round(p, 6)) < 1e-9
        assert abs(r["ci_low"] - round((center - half) / denom, 6)) < 1e-6
        assert abs(r["ci_high"] - round((center + half) / denom, 6)) < 1e-6
        assert r["ci_low"] <= r["rate"] <= r["ci_high"]
        assert 0.0 <= r["ci_low"] and r["ci_high"] <= 1.0


# ------------------------------ Q216/Q217 co-purchase graph (wave 6)
def test_graph_census_matches_bruteforce(spark, sf_dir):
    """Q216's degree histogram and Q217's triangle count vs an
    independent Python graph build — pins the support-floored edge
    mining, the canonical a<b<c single-count orientation, and the
    wedge algebra."""
    from itertools import combinations

    baskets = defaultdict(set)
    for r in load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect():
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    pair_cnt = defaultdict(int)
    for parts in baskets.values():
        for a, b in combinations(sorted(parts), 2):
            pair_cnt[(a, b)] += 1
    edges = {p for p, c in pair_cnt.items() if c >= 2}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    hist = defaultdict(int)
    for node, nbrs in adj.items():
        hist[len(nbrs)] += 1
    got_hist = {
        r["degree"]: r["n_nodes"]
        for r in entries()["q_degree_distribution"].fn(spark, sf_dir).collect()
    }
    assert got_hist == dict(hist)

    tris = sum(
        1
        for a, b in edges
        for c in adj[b]
        if b < c and (a, c) in edges
    )
    wedges = sum(d * (d - 1) // 2 for d in (len(n) for n in adj.values()))
    [r] = entries()["q_triangle_count"].fn(spark, sf_dir).collect()
    assert r["n_edges"] == len(edges)
    assert r["n_triangles"] == tris
    if wedges:
        assert abs(r["clustering_coeff"] - round(3.0 * tris / wedges, 6)) < 1e-9


# --------------------------------------- Q218 Kaplan-Meier (wave 6)
def test_survival_km_matches_bruteforce(spark, sf_dir):
    """Q218 vs an independent KM estimator — pins the censoring rule,
    the risk-set walk, and the micro-unit ln-product discipline; the
    curve must be non-increasing in (0, 1]."""
    import math

    firsts = {}
    for r in (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
        .collect()
    ):
        firsts[r["user_id"]] = r["t0"]
    delays = {}
    for r in (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .collect()
    ):
        t0 = firsts.get(r["user_id"])
        if t0 is not None and r["ts"] > t0:
            d = (r["ts"].date() - t0.date()).days
            if r["user_id"] not in delays or d < delays[r["user_id"]]:
                delays[r["user_id"]] = d
    H = 14
    obs = []
    for uid in firsts:
        d = delays.get(uid)
        if d is not None and d <= H:
            obs.append((d, 1))
        else:
            obs.append((H, 0))
    daily = defaultdict(lambda: [0, 0])  # t -> [events, leaving]
    for t, e in obs:
        daily[t][0] += e
        daily[t][1] += 1
    at_risk = len(obs)
    cum = 0
    expect = []
    for t in sorted(daily):
        d, leave = daily[t]
        if 0 < d < at_risk:
            cum += round(math.log(1.0 - d / at_risk) * 1e6)
            expect.append((t, at_risk, d, round(math.exp(cum / 1e6), 6)))
        at_risk -= leave
    got = [
        (r["day"], r["n_at_risk"], r["n_events"], r["survival"])
        for r in sorted(
            entries()["q_survival_km"].fn(spark, sf_dir).collect(),
            key=lambda r: r["day"],
        )
    ]
    assert got == expect
    surv = [g[3] for g in got]
    assert all(0.0 < s <= 1.0 for s in surv)
    assert surv == sorted(surv, reverse=True)
