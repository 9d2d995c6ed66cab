"""Byte-pair-encoding tokenizer APPLY — real merge-rank BPE (the
Sennrich et al. 2016 algorithm used by GPT-2-family tokenizers), not
the regex approximation in text.token_counts. The merge table is the
model: an ordered list of symbol pairs; encoding a word repeatedly
merges the lowest-rank adjacent pair until none applies.

Scale shape: the merge table is broadcast once per executor (real
vocabularies are ~50k merges ≈ 1 MB — a dimension, not data); encoding
is an Arrow-batched pandas UDF with a per-batch word cache (corpus
word frequency is Zipfian, so the cache hit rate is high and per-DOC
cost approaches per-DISTINCT-WORD cost). No shuffle — token counting
rides the scan like every other per-row extractor.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORD_RE = re.compile(r"[a-z0-9]+|[^a-z0-9\s]+")


def bpe_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word: repeatedly merge the lowest-rank adjacent pair."""
    symbols = list(word)
    while len(symbols) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (symbols[i], symbols[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        # merge EVERY occurrence of the winning pair left-to-right
        # (standard BPE semantics), not just the first
        out: list[str] = []
        i = 0
        while i < len(symbols):
            if i < len(symbols) - 1 and symbols[i] == a and symbols[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


def bpe_encode_text(text: str, ranks: dict[tuple[str, str], int],
                    cache: dict[str, int] | None = None) -> int:
    """-> token count for a text (lowercased word/punct pre-split)."""
    n = 0
    for w in _WORD_RE.findall(text.lower()):
        if cache is not None and w in cache:
            n += cache[w]
            continue
        c = len(bpe_word(w, ranks))
        if cache is not None:
            cache[w] = c
        n += c
    return n


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (id, bpe_tokens): true merge-rank BPE token counts under the
    given ordered merge list."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @F.pandas_udf("long")
    def count(col: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}
        return col.map(
            lambda t: bpe_encode_text(t or "", ranks, cache)
        ).astype("int64")

    return df.select(F.col(id_col), count(F.col(text_col)).alias("bpe_tokens"))


# ---------------------------------------------------------------------------
# BPE TRAINING (Sennrich et al. 2016, learn_bpe) — distributed
# ---------------------------------------------------------------------------
#
# Training operates on the WORD-FREQUENCY table, not the corpus: one
# (word) map-combined shuffle reduces 100 TB of text to a vocab-bounded
# DataFrame (min_freq-pruned), and every merge round is then one small
# pair-count job over it — the driver receives exactly ONE row per
# round (the argmax pair), the kmeans-style bounded transfer. The
# winning merge is applied to the symbol arrays JVM-side (a lazy
# left-to-right aggregate() scan — words are short, so the per-element
# accumulator copy is bounded) and the table is checkpointed so lineage
# stays flat across rounds.


# Symbol escaping for the string-domain merge: % first (so decode can
# invert last), then backslash/dollar (regex + replacement metachars),
# then NUL (the join delimiter). Symbols come from arbitrary text, so
# none of these can be assumed absent.
_MERGE_ESC = [("%", "%25"), ("\\", "%5C"), ("$", "%24"), ("\x00", "%00")]


def _merge_pair_expr(sym, a: str, b: str):
    """Left-to-right single-pair merge over a symbol array — standard
    BPE semantics ('aaa' under (a,a) -> (aa, a)).

    Runs in the STRING domain so it is linear in the word length: the
    escaped symbols are NUL-joined (with NUL sentinels at both ends)
    and one anchored regexp_replace performs the merge — Java regex
    replacement scans left-to-right and resumes after each match,
    which is exactly the BPE merge order. The previous formulation
    (F.aggregate with an array accumulator) copied the accumulator per
    element, i.e. O(len^2) per word — a degenerate single-word document
    of ~100k chars took minutes per training round."""
    esc_a, esc_b = a, b
    for raw, enc in _MERGE_ESC:
        esc_a = esc_a.replace(raw, enc)
        esc_b = esc_b.replace(raw, enc)

    def esc(c):
        for raw, enc in _MERGE_ESC:
            c = F.replace(c, F.lit(raw), F.lit(enc))
        return c

    def unesc(c):
        for raw, enc in reversed(_MERGE_ESC):
            c = F.replace(c, F.lit(enc), F.lit(raw))
        return c

    joined = F.concat(
        F.lit("\x00"), F.array_join(F.transform(sym, esc), "\x00"), F.lit("\x00")
    )
    # consume the leading NUL (symbol-start anchor), assert the trailing
    # one; \Q..\E-quote the escaped pair (no backslash survives escaping,
    # so no \E can occur inside)
    pattern = "\x00\\Q" + esc_a + "\x00" + esc_b + "\\E(?=\x00)"
    replaced = F.regexp_replace(joined, pattern, "\x00" + esc_a + esc_b)
    merged = F.transform(
        F.filter(F.split(replaced, "\x00"), lambda x: x != F.lit("")),
        unesc,
    )
    return F.when(F.size(sym) <= F.lit(1), sym).otherwise(merged)


def word_freqs(
    df: DataFrame, *, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """-> (word, freq): the corpus word-frequency table (the only pass
    that touches the corpus; everything after is vocab-sized)."""
    words = F.explode(
        F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+|[^a-z0-9\\\\s]+', 0)")
    )
    return (
        df.select(words.alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .filter(F.col("freq") >= min_freq)
    )


def bpe_train(
    corpus: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 50,
    min_freq: int = 1,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn an ordered merge list from the corpus. Ties break on
    (freq DESC, left ASC, right ASC) — pinned against the pure-Python
    reference in tests/test_bpe.py. Stops early when no pair reaches
    min_pair_freq."""
    # lazy checkpoints: each round's single pair-count job materializes
    # the (tiny, vocab-bounded) table as a side effect — eager=True here
    # doubled the round count in driver jobs (2 per merge instead of 1),
    # and local job latency dominates training wall time
    vocab = word_freqs(corpus, text_col=text_col, min_freq=min_freq).select(
        F.split("word", "").alias("sym"), "freq"
    ).localCheckpoint(eager=False)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_a = F.slice("sym", 1, F.size("sym") - 1)
        pair_b = F.slice("sym", 2, F.size("sym") - 1)
        top = (
            vocab.filter(F.size("sym") > 1)
            .select(F.explode(F.arrays_zip(pair_a.alias("a"), pair_b.alias("b"))).alias("p"), "freq")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            _merge_pair_expr(F.col("sym"), a, b).alias("sym"), "freq"
        ).localCheckpoint(eager=False)
    return merges


def bpe_train_apply(
    corpus: DataFrame,
    train_slice: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_merges: int = 24,
    min_freq: int = 1,
) -> DataFrame:
    """End-to-end tokenizer pass: learn merges on the training slice,
    apply them to the whole corpus -> (id, bpe_tokens)."""
    merges = bpe_train(
        train_slice, text_col=text_col, num_merges=num_merges, min_freq=min_freq
    )
    return bpe_token_counts(corpus, merges, text_col=text_col, id_col=id_col)
