"""operators/bpe.py — trained BPE tokenizer (VERDICT r6 item 5):
hand-computable fit trajectory, iterative-recount proof, replace-chain
apply semantics, and the shuffle-free/Python-free scoring plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_map_reduce_spark.operators.bpe import (
    INERT,
    bpe_fit,
    bpe_tokens_expr,
)


def _toks(spark, rules, text):
    return spark.range(1).select(
        bpe_tokens_expr(F.lit(text), rules).alias("t")
    ).first()["t"]


def test_fit_is_hand_computable_and_iterative(spark):
    """Corpus: 'abab' ×3, 'abc' ×2 (as document repetitions). Round 1
    pairs: (a,b)=8, (b,a)=3, (b,c)=2 → merge (a,b). Round 2 operates on
    the MERGED symbols: (ab,ab)=3, (ab,c)=2 → merge (ab,ab) — a pair of
    round-1 products, impossible for a one-shot pair ranking."""
    docs = spark.createDataFrame(
        [("abab",)] * 3 + [("abc",)] * 2, ["text"]
    )
    rules = bpe_fit(docs, vocab_words=10, merges=3)
    assert rules[0] == ("~a~~b~", "~ab~")
    assert rules[1] == ("~ab~~ab~", "~abab~")
    assert rules[2] == ("~ab~~c~", "~abc~")
    assert _toks(spark, rules, "abab abc ba") == ["abab", "abc", "b", "a"]


def test_apply_is_left_to_right_nonoverlapping(spark):
    """'aaaa' under (a,a) must pair greedily left-to-right: aa|aa, not
    a|aa|a — the shared semantics of SQL replace and str.replace that
    make the three engines agree."""
    docs = spark.createDataFrame([("aaaa",)] * 2, ["text"])
    rules = bpe_fit(docs, vocab_words=4, merges=1)
    assert rules[0] == ("~a~~a~", "~aa~")
    assert _toks(spark, rules, "aaaa") == ["aa", "aa"]
    assert _toks(spark, rules, "aaa") == ["aa", "a"]


def test_pairless_rounds_pad_with_inert_rules(spark):
    """Single-char vocab exhausts pairs immediately; the merge table
    must still carry exactly `merges` links (the oracle unrolls a fixed
    chain) and the inert rule must change nothing."""
    docs = spark.createDataFrame([("a b a",)], ["text"])
    rules = bpe_fit(docs, vocab_words=4, merges=3)
    assert rules == [(INERT, INERT)] * 3
    assert _toks(spark, rules, "ab a") == ["a", "b", "a"]


def test_tilde_in_input_is_sanitized(spark):
    """'~' is the symbol-wrapper metacharacter: both fit and apply
    strip it from input so the encoding is total on any corpus."""
    docs = spark.createDataFrame([("a~b a~b",)] * 2, ["text"])
    rules = bpe_fit(docs, vocab_words=4, merges=1)
    assert rules[0] == ("~a~~b~", "~ab~")
    assert _toks(spark, rules, "~a~b~") == ["ab"]


def test_scoring_plan_is_shuffle_and_python_free(spark, sf_dir):
    """The trained model is a literal replace chain: the scoring plan
    must contain no KEYED exchange (the only allowed Exchange is the
    round-robin ingest repartition — the q_doc_chunks family lesson),
    no join, no aggregate, and no Python evaluation (the fit jobs run
    at plan-build time and are not part of this plan)."""
    from project_map_reduce_spark.registry import entries

    df = entries()["q_tokenize_bpe"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "Join" not in plan, plan
    assert "Aggregate" not in plan, plan
    assert "Python" not in plan, plan
    # The token-array filter is a higher-order-function lambda, which
    # Spark evaluates outside whole-stage codegen — the plan is still a
    # single Project over a column-pruned scan.
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan, plan
