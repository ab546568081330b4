"""B.10 extension: deterministic corpus-sampling operators (Q62-Q63).

Training-data pipelines don't just dedup — they MIX: per-language
sampling rates (upweight low-resource languages) and per-source caps
(no single crawl/domain may dominate the corpus, the C4/Pile practice).
Both operators here are deterministic — membership is a pure function
of document content, never of Spark's RNG or partitioning — so results
are reproducible run-to-run, identical across engines (hash-match
oracles), and stable under retries/speculative execution at 100 TB.

Scale shapes:
- Stratified sampling is a narrow map-side filter on a codegen'd md5 —
  no shuffle at all; at 100 TB the same predicate prunes at the scan.
- Source quotas are a per-group top-k: rank-filter over a window that
  Spark collapses to WindowGroupLimit (each group materializes only
  quota rows, asserted in the plan audit) — one shuffle on source.

Registered LAST (after the 61-query core inventory) so the driver's
50-query correctness window keeps its priority ordering; pytest parity
(tests/test_oracle_parity.py) hash-checks these like every other query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from project_map_reduce_spark.registry import fmt_doc, register
from project_map_reduce_spark.tables import load

# Per-language keep rates, in 16ths of the md5 first-hex-digit space:
# English is abundant → keep 4/16; everything else is upweighted → 8/16.
_RATE_HEX = {"en": "3", "de": "7", "es": "7", "fr": "7", "zh": "7"}
_DEFAULT_HEX = "7"

_SOURCE_QUOTA = 10


@register(
    "q_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substr(md5(text), 1, 1) <=
          CASE lang
              WHEN 'en' THEN '{_RATE_HEX["en"]}'
              ELSE '{_DEFAULT_HEX}'
          END
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q62: deterministic stratified sampling for language mixing — keep
    a doc iff the first hex digit of md5(text) falls under its
    language's rate (en 4/16 = 25%, other languages 8/16 = 50%).

    Content-hash membership means duplicated documents sample
    identically everywhere (consistent with the leakage-safe split,
    Q61), and the filter is a shuffle-free codegen'd map — at 100 TB it
    rides the scan."""
    d = load(spark, sf_dir, "documents")
    first_hex = F.substring(F.md5(F.col("text").cast("binary")), 1, 1)
    threshold = F.when(F.col("lang") == "en", F.lit(_RATE_HEX["en"])).otherwise(
        F.lit(_DEFAULT_HEX)
    )
    return d.filter(first_hex <= threshold).select("doc_id", "lang", "source")


@register(
    "q_source_quota",
    oracle=f"""
    SELECT doc_id, source, rn
    FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source ORDER BY md5(text) ASC, doc_id ASC
               ) AS rn
        FROM documents
    )
    WHERE rn <= {_SOURCE_QUOTA}
    """,
)
def q_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q63: cap each source's contribution at {q} documents, chosen by
    content-hash order (md5 asc, doc_id tiebreak) — a deterministic
    stand-in for "random sample per source" that every engine and every
    re-run reproduces bit-for-bit.

    Scale shape: rank + filter collapses to WindowGroupLimit (each
    source materializes only {q} rows before the final window), one
    shuffle keyed on source; skewed mega-sources are exactly the rows
    the quota discards early."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("text").cast("binary")).asc(), F.col("doc_id").asc()
    )
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= _SOURCE_QUOTA)
    )


fmt_doc(q_source_quota, q=_SOURCE_QUOTA)


_ALPHA = 0.5  # mixing temperature: sampled share ∝ count^alpha
_HEX_SPAN = float(16 ** 6)  # u = first 6 md5 hex chars as uniform [0,1)


@register(
    "q_sample_temperature",
    oracle=f"""
    WITH counts AS (
        SELECT source, count(*) AS n FROM documents GROUP BY source
    ),
    mn AS (SELECT min(n) AS n_min FROM counts),
    rates AS (
        SELECT source, sqrt(CAST(n_min AS DOUBLE) / n) AS r
        FROM counts CROSS JOIN mn
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates USING (source)
    WHERE CAST(('0x' || substr(md5(d.text), 1, 6)) AS BIGINT)
              / {_HEX_SPAN} < r
    """,
)
def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q97: temperature-based source mixing (the multilingual-T5 /
    XLM-R recipe): sampled share per source ∝ count^α with α = {a} —
    big sources are down-sampled toward the small ones so no crawl
    dominates, without the hard cliff of Q63's fixed quota. Keep-rate
    per source is r_s = (n_min / n_s)^(1-α) (smallest source keeps
    100%), and membership is deterministic: keep iff the first 6 hex
    chars of md5(text), read as a uniform in [0,1), fall under r_s.

    Unlike Q62's HARD-CODED per-language rates, the rates here are
    DATA-DEPENDENT — computed from the corpus itself in the same job.
    Scale shape: the count aggregate is O(sources) rows and broadcast
    back (aggregate-then-broadcast, same as Q83's moments); membership
    is then a shuffle-free map-side filter on a codegen'd hash — no
    second shuffle of the corpus, and duplicated documents sample
    identically everywhere (content-hash discipline, Q61/Q62).

    Boundary determinism: u is an exact multiple of 2^-24 and both
    engines compute r_s with the same IEEE double divide + sqrt, so
    u < r_s can only disagree if u == r_s exactly — impossible unless
    r_s is dyadic, which sqrt of a non-square count ratio never is
    (and the r_s = 1.0 case accepts every u < 1 on both engines)."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    n_min = counts.agg(F.min("n").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "source",
        F.sqrt(F.col("n_min").cast("double") / F.col("n")).alias("r"),
    )
    u = (
        F.expr(
            "conv(substr(md5(cast(text as binary)), 1, 6), 16, 10)"
        ).cast("double")
        / F.lit(_HEX_SPAN)
    )
    return (
        d.join(F.broadcast(rates), "source")
        .filter(u < F.col("r"))
        .select("doc_id", "source")
    )


fmt_doc(q_sample_temperature, a=_ALPHA)


# ---------------------------------------------------------------------------
# Q190 — weighted sampling without replacement (Efraimidis–Spirakis A-ES)

_WS_K = 50  # sample size


@register(
    "q_weighted_sample",
    oracle=f"""
    SELECT doc_id, source,
           CAST(len(text) + 1 AS DOUBLE) AS w,
           round(
               ln((CAST(('0x' || substr(md5(text), 1, 6)) AS BIGINT) + 0.5)
                  / {_HEX_SPAN})
               / (len(text) + 1), 9) AS samp_key
    FROM documents
    ORDER BY samp_key DESC, doc_id
    LIMIT {_WS_K}
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q190: weighted sampling WITHOUT replacement via A-ES
    (Efraimidis & Spirakis 2006, the distributed-weighted-reservoir
    algorithm): each item draws u ~ U(0,1) and survives with key
    u^(1/w) — the top-k keys are EXACTLY a weight-proportional
    without-replacement sample (the one-pass form every data-mixing
    pipeline uses to draw a quality-weighted training subset). Weight
    here = document length + 1; ranking uses the order-equivalent
    log-key ln(u)/w (monotone in u^(1/w), no pow), rounded at 9 dp
    with doc_id tiebreak so both engines agree at rank boundaries.

    Determinism: u is the Q97 content-hash uniform — (first 6 md5 hex
    chars + 0.5) / 16^6, strictly inside (0,1) so ln never sees 0 —
    derived from the SAME bytes on both engines; no RNG, re-runs and
    replicas draw the identical sample (the reproducibility property
    that makes a sampled training mix auditable).

    Scale shape: key assignment is a shuffle-free codegen projection
    riding the scan; top-k is TakeOrderedAndProject (per-partition
    k-row heaps, driver merge — the Q26 plan), so the full pass moves
    ZERO rows between executors: the exact distributed-reservoir
    cost model of the paper. Reference analog: none — SURVEY §2 B.10
    extension row."""
    d = load(spark, sf_dir, "documents")
    w = (F.length("text") + F.lit(1)).cast("double")
    u = (
        F.expr("conv(substr(md5(cast(text as binary)), 1, 6), 16, 10)").cast(
            "double"
        )
        + F.lit(0.5)
    ) / F.lit(_HEX_SPAN)
    return (
        d.select(
            "doc_id",
            "source",
            w.alias("w"),
            F.round(F.log(u) / w, 9).alias("samp_key"),
        )
        .orderBy(F.desc("samp_key"), F.asc("doc_id"))
        .limit(_WS_K)
    )


fmt_doc(q_weighted_sample, k=_WS_K)
