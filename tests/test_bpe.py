"""Merge-rank BPE semantics on hand-computed cases (operators/bpe)."""

from __future__ import annotations

from moloch_spark.operators.bpe import bpe_encode_text, bpe_word

MERGES = [
    ("s", "p"), ("sp", "a"), ("spa", "r"), ("spar", "k"),
    ("d", "a"), ("da", "t"), ("dat", "a"),
    ("q", "u"), ("qu", "e"), ("que", "r"), ("quer", "y"),
]
RANKS = {m: i for i, m in enumerate(MERGES)}


def test_full_merge_chains():
    assert bpe_word("spark", RANKS) == ["spark"]
    assert bpe_word("data", RANKS) == ["data"]
    assert bpe_word("query", RANKS) == ["query"]


def test_partial_and_unknown():
    assert bpe_word("sparkle", RANKS) == ["spark", "l", "e"]
    assert bpe_word("adapt", RANKS) == ["a", "da", "p", "t"]
    assert bpe_word("zebra", RANKS) == ["z", "e", "b", "r", "a"]


def test_rank_priority_not_greedy_position():
    """The LOWEST-rank pair merges first wherever it sits — not the
    leftmost mergeable pair."""
    ranks = {("b", "c"): 0, ("a", "b"): 1}
    # leftmost pair (a,b) has rank 1; (b,c) rank 0 wins first:
    # a,b,c -> a,bc (then (a,bc) has no rank)
    assert bpe_word("abc", ranks) == ["a", "bc"]


def test_every_occurrence_merges_in_one_step():
    ranks = {("a", "a"): 0, ("aa", "aa"): 1}
    # aaaa -> aa,aa (both occurrences in one pass) -> aaaa
    assert bpe_word("aaaa", ranks) == ["aaaa"]
    # odd count: aa,aa,a then no (aa,a) rank
    assert bpe_word("aaaaa", ranks) == ["aaaa", "a"]


def test_text_split_and_cache():
    cache: dict[str, int] = {}
    n = bpe_encode_text("Spark data! spark?? data", RANKS, cache)
    # spark(1) data(1) !(1) spark(1) ??(2 — no merge for '?','?') data(1)
    assert n == 7
    assert cache["spark"] == 1 and cache["??"] == 2
