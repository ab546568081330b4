"""Trained byte-pair-encoding tokenizer (Q122 support).

Real BPE (Sennrich et al. 2016, the LLM-pipeline standard), made
engine-replicable by pinning every degree of freedom:

* **Fit corpus**: the top ``vocab_words`` words by (count DESC, word
  ASC) — a distributed word-count + TakeOrdered, so O(K) rows cross the
  cluster boundary regardless of corpus size (the Q106/SQ8 model-fit
  pattern). Training then runs on the driver over the K-word frequency
  table — the textbook formulation (BPE trains on the word-frequency
  dict, not the raw corpus).
* **Symbol encoding**: a word's symbol sequence is a string with every
  symbol wrapped in ``~`` (``hello`` → ``~h~~e~~l~~l~~o~``). A merge
  rule (a, b) is then literally ``replace(s, '~a~~b~', '~ab~')`` —
  and SQL ``replace`` / Python ``str.replace`` share left-to-right
  non-overlapping semantics, so Spark, DuckDB and the driver-side
  trainer apply a rule identically (``aaaa`` + (a,a) → ``aa aa``, the
  greedy left-to-right pairing). The wrapper makes multi-char symbols
  unambiguous: rule (a, b) cannot fire inside ``~xa~~b~``. Input text
  is sanitized with ``replace(text, '~', '')`` so the encoding is
  total (the fixtures are [a-z ] only; the strip makes the contract
  hold for any corpus).
* **Merge selection**: each of ``merges`` rounds picks the adjacent
  symbol pair with the highest corpus-weighted count, ties broken by
  (left symbol ASC, right symbol ASC); one left-to-right replace pass
  updates the vocab and the next round recounts — the real iterative
  algorithm, not a one-shot pair ranking. A round with no pairs left
  emits the inert rule (chr(1) → chr(1)) so the applied chain always
  has exactly ``merges`` links (what lets the oracle unroll it).
* **Application**: one merge rule = one ``replace`` — the trained
  model is a LITERAL chain of ``merges`` replaces inside whole-stage
  codegen: zero shuffles, zero joins, no Python in the scoring path.

Reference analog: none (``ext``) — tokenization is LLM-pipeline
capability the reference lacks. Query harness:
plans/text_analysis.py::q_tokenize_bpe (whose DuckDB oracle re-derives
the FIT as ``merges`` unrolled CTE rounds — the PageRank-oracle
pattern — so training and inference are hash-checked together).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

INERT = "\x01"  # rule emitted by a pair-less round; matches nothing


def _wrap_expr(col: Column) -> Column:
    """Sanitized char-level symbol string for ``col``."""
    return F.regexp_replace(F.replace(col, F.lit("~"), F.lit("")), "(.)", "~$1~")


def _symbols(s: str) -> list[str]:
    """Driver-side mirror of split(trim(s, '~'), '~~')."""
    t = s.strip("~")
    return t.split("~~") if t else [""]


def bpe_fit(docs: DataFrame, text_col: str = "text", *,
            vocab_words: int = 128, merges: int = 8) -> list[tuple[str, str]]:
    """Train the merge table: distributed top-K word count, then the
    iterative merge loop on the driver over the K-row frequency table.
    Returns ``merges`` (pattern_pair) tuples, inert-padded."""
    top = (
        docs.select(
            F.explode(
                F.split(F.replace(F.col(text_col), F.lit("~"), F.lit("")), " ")
            ).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("w"))
        .limit(vocab_words)
        .collect()
    )
    vocab = [
        ("~" + "~~".join(r["w"]) + "~", int(r["cnt"])) for r in top
    ]
    rules: list[tuple[str, str]] = []
    for _ in range(merges):
        pairs: Counter = Counter()
        for s, cnt in vocab:
            sym = _symbols(s)
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            rules.append((INERT, INERT))
            continue
        # max count, ties by (a ASC, b ASC) — identical to the oracle's
        # ORDER BY c DESC, a ASC, b ASC LIMIT 1
        (a, b), _n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        pat, rep = f"~{a}~~{b}~", f"~{a}{b}~"
        rules.append((pat, rep))
        vocab = [(s.replace(pat, rep), cnt) for s, cnt in vocab]
    return rules


def bpe_tokens_expr(col: Column, rules: list[tuple[str, str]]) -> Column:
    """The trained tokenizer as one codegen'd expression: wrap → the
    literal replace chain → split back to symbols (space symbols — word
    boundaries — dropped). Shuffle-free and Python-free by shape."""
    s = _wrap_expr(col)
    for pat, rep in rules:
        s = F.replace(s, F.lit(pat), F.lit(rep))
    return F.filter(
        F.split(F.btrim(s, F.lit("~")), "~~"),
        lambda t: t != F.lit(" "),
    )
