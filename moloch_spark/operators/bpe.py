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
