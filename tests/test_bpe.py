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


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def _ref_train(texts, num_merges, min_pair_freq=2):
    """Independent pure-Python Sennrich learn_bpe with the pinned
    tie-break (freq DESC, left ASC, right ASC)."""
    import re
    from collections import Counter

    wf = Counter()
    for t in texts:
        wf.update(re.findall(r"[a-z0-9]+|[^a-z0-9\s]+", t.lower()))
    vocab = {tuple(w): f for w, f in wf.items()}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < min_pair_freq:
            break
        a, b = best[0]
        merges.append((a, b))
        nv = {}
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + f
        vocab = nv
    return merges


def test_bpe_train_matches_reference(spark):
    from moloch_spark.operators.bpe import bpe_train

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wider wide wide widest",
        "low and lower and newer",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = bpe_train(df, num_merges=12)
    want = _ref_train(texts, 12)
    assert got == want and len(got) > 4


def test_bpe_train_overlap_and_ties(spark):
    """'aaaa' under merge (a,a) must become (aa, aa) — left-to-right,
    no overlapping re-merge; and ties must break lexicographically."""
    from moloch_spark.operators.bpe import bpe_train

    texts = ["aaaa aaaa", "bc bc"]  # (a,a) freq 6 wins; then (aa,aa) 4, (b,c) 4 tie
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = bpe_train(df, num_merges=3)
    assert got == _ref_train(texts, 3)
    assert got[0] == ("a", "a")
    assert ("aa", "aa") in got and ("b", "c") in got


def test_bpe_train_apply_roundtrip(spark):
    """Tokens under trained merges must equal the reference encoder's
    count under the reference-trained merges."""
    from moloch_spark.operators.bpe import bpe_train_apply, bpe_encode_text

    texts = ["the cat sat", "the cat ran", "the rat sat on the cat"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    out = {r.doc_id: r.bpe_tokens for r in bpe_train_apply(df, df, num_merges=6).collect()}
    ranks = {m: i for i, m in enumerate(_ref_train(texts, 6))}
    want = {i: bpe_encode_text(t, ranks) for i, t in enumerate(texts)}
    assert out == want
