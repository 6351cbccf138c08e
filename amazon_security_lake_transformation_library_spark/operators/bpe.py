"""Byte-pair-encoding subword tokenizer — the real-model plug-in for the
``n_subwords`` estimate in :mod:`textstats` (textstats keeps its cheap
JVM-side chars/4 estimate; this module is the Arrow-stage replacement a
training pipeline swaps in when token counts must match a tokenizer).

Design
------
* **Deterministic, offline**: the merges table is LEARNED at import time
  from a small embedded corpus with the classic BPE procedure (count
  adjacent symbol pairs, merge the most frequent, ties broken
  lexicographically) — no network, no model file, reproducible across
  processes and engines. Callers can pass their own merges list (e.g. a
  real tokenizer's ``merges.txt`` loaded as pairs) — the encode path is
  the standard greedy rank-based merge loop either way.
* **Arrow batches, not per-row Python**: exposed as a ``pandas_udf`` —
  whole columns cross the JVM/Python boundary as Arrow arrays. Inside the
  batch the per-WORD work is cached (``lru_cache``): natural text is
  Zipf-distributed, so the cache turns the per-token cost into a dict hit
  for all but the first occurrence of each word type. This is the same
  shape a real HuggingFace-tokenizer plug-in would have.
* **Scale**: stateless per row → embarrassingly parallel, no shuffle; the
  only cost is one Arrow round-trip per batch. At 100 TB you'd keep the
  merges broadcast inside the worker (module-level, as here), never in
  the rows.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd

from pyspark.sql import functions as F

END = "</w>"

# Embedded training corpus for the default merges table: deterministic,
# ASCII, and wide enough to learn merges for common English fragments.
_CORPUS = """
the quick brown fox jumps over the lazy dog the user said that they would
return the result and the agent replied with a tool call that computed the
answer for the question about the data in the table where the rows were
grouped by the key and the values were aggregated into the summary that
was written back to the lake so the next job could read it again and the
session continued until the conversation ended with the final message
tokenization of words into subword units helps language models handle
rare words by composing them from frequent fragments learned from data
""".split()


def learn_merges(words: list[str], n_merges: int = 200) -> list[tuple[str, str]]:
    """Classic BPE learning: start from characters (+ end-of-word marker),
    repeatedly merge the most frequent adjacent pair. Ties break on the
    pair itself (lexicographic) so the table is deterministic for a given
    corpus regardless of dict iteration order."""
    from collections import Counter

    vocab = Counter(tuple(w) + (END,) for w in words)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, freq in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += freq
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab: Counter = Counter()
        for sym, freq in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


DEFAULT_MERGES: list[tuple[str, str]] = learn_merges(_CORPUS, 200)


def _encoder(merges: list[tuple[str, str]]):
    """Greedy rank-based BPE encode, cached per word type (Zipf -> most
    lookups are cache hits)."""
    ranks = {pair: r for r, pair in enumerate(merges)}

    @lru_cache(maxsize=1 << 17)
    def encode(word: str) -> tuple[str, ...]:
        sym = tuple(word) + (END,)
        while len(sym) > 1:
            best_rank, best_i = None, None
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            sym = (
                sym[:best_i]
                + (sym[best_i] + sym[best_i + 1],)
                + sym[best_i + 2:]
            )
        return sym

    return encode


def bpe_subword_count_pd(texts: pd.Series, merges=None) -> pd.Series:
    """Pandas-native subword counter (shared by the pandas_udf below and
    the DuckDB-oracle fixture builder, so both engines run the identical
    code path on the identical bytes). Words = whitespace split of the
    lowercased text; count = sum of per-word BPE token counts. NULL/empty
    text -> 0."""
    encode = _encoder(DEFAULT_MERGES if merges is None else merges)

    def count(t) -> int:
        if not t:
            return 0
        return sum(len(encode(w)) for w in t.lower().split())

    return texts.map(count, na_action="ignore").fillna(0).astype("int64")


def bpe_subword_count(col, merges=None):
    """Column-level API: ``df.select(bpe_subword_count(F.col("text")))``.
    One Arrow round-trip per batch, zero per-row Python on the JVM side."""

    @F.pandas_udf("long")
    def _udf(texts: pd.Series) -> pd.Series:
        return bpe_subword_count_pd(texts, merges)

    return _udf(col)


def bpe_tokens_pd(texts: pd.Series, merges=None) -> pd.Series:
    """Token lists (for tests / inspection): list[str] per row."""
    encode = _encoder(DEFAULT_MERGES if merges is None else merges)

    def toks(t):
        if not t:
            return []
        out: list[str] = []
        for w in t.lower().split():
            out.extend(encode(w))
        return out

    return texts.map(toks, na_action="ignore")
