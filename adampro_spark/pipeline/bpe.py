"""Trainable byte-pair encoding (Sennrich, Haddow & Birch, ACL 2016).

``text.bpe_token_count`` is a regex ESTIMATOR of an LLM token budget;
this module is the real thing: a BPE tokenizer whose merge table is fit
on the caller's own corpus, so ``pack_sequences`` / ``temperature_weights``
budgets line up with the tokenizer the downstream model will actually
train with.

Shape (the lm.py / dsir.py fit-boundary pattern):

* **fit** — word frequencies are aggregated IN SPARK (pre-tokenize →
  explode → hash-groupBy, map-side combined) and only the top
  ``max_words`` (word, count) rows reach the driver, where the classic
  merge loop runs with an incremental pair index (each merge touches
  only the words containing the pair — Sennrich's published
  optimization, not the O(merges·corpus) naive recount).
* **encode** — the merge-rank table rides an Arrow-batched pandas UDF
  closure; per word the standard lowest-rank-first merge loop with a
  per-executor word cache (Zipf makes the cache hit rate ~word-freq
  distribution).  Map-only: no explode, no join, no shuffle.

Pre-tokenization reuses ``text.BPE_TOKEN_PATTERN`` (letter runs, single
digits, single punctuation) so the trained counts refine the estimator
rather than disagreeing with it on word boundaries.  Case is preserved
(BPE is conventionally case-sensitive).

Encoding is not expressible in SQL (an iterative merge loop), so the
operator is pytest-pinned like the DEFLATE gate rather than
DuckDB-oracled; determinism is pinned by a parity test against an
independent naive reference implementation.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from adampro_spark.pipeline.text import BPE_TOKEN_PATTERN

__all__ = [
    "fit_bpe",
    "bpe_encode_col",
    "bpe_token_count_col",
]

END = "</w>"  # end-of-word symbol (Sennrich §3.2)


def _pairs(symbols: "tuple[str, ...]") -> "list[tuple[str, str]]":
    return [(symbols[i], symbols[i + 1]) for i in range(len(symbols) - 1)]


def _merge_word(
    symbols: "tuple[str, ...]", pair: "tuple[str, str]"
) -> "tuple[str, ...]":
    """Merge every (left-to-right, non-overlapping) occurrence of
    ``pair`` in ``symbols``."""
    a, b = pair
    out: list[str] = []
    i = 0
    n = len(symbols)
    while i < n:
        if i < n - 1 and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def _learn_merges(
    word_freqs: "dict[str, int]", num_merges: int, min_pair_freq: int
) -> "list[tuple[str, str]]":
    """The pure driver-side merge loop (separable so the incremental
    pair index can be property-tested against a naive full-recount
    reference without a SparkSession): each merge touches only the
    words containing the winning pair; ties break to the
    lexicographically smallest pair, so the fit is deterministic."""
    # incremental pair index: counts + which words contain each pair
    pair_counts: Counter = Counter()
    pair_words: dict[tuple, set] = {}
    words = [
        (tuple(w) + (END,), int(c)) for w, c in sorted(word_freqs.items())
    ]
    for wi, (symbols, freq) in enumerate(words):
        for p in _pairs(symbols):
            pair_counts[p] += freq
            pair_words.setdefault(p, set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        if not pair_counts:
            break
        # deterministic: max count, ties → lexicographically smallest
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < int(min_pair_freq):
            break
        merges.append(best)
        for wi in list(pair_words.get(best, ())):
            symbols, freq = words[wi]
            new_symbols = _merge_word(symbols, best)
            if new_symbols == symbols:
                continue
            for p in _pairs(symbols):
                pair_counts[p] -= freq
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        del pair_words[p]
            for p in _pairs(new_symbols):
                pair_counts[p] += freq
                pair_words.setdefault(p, set()).add(wi)
            words[wi] = (new_symbols, freq)
    return merges


def fit_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 2000,
    max_words: int = 30_000,
    min_pair_freq: int = 2,
    sample_fraction: float | None = None,
    seed: int = 42,
) -> tuple[list, dict[str, Any]]:
    """Fit a BPE merge table on the corpus.

    The Spark side reduces the corpus to a bounded (word, count) table:
    optional Bernoulli ``sample_fraction`` (pass ~``10**7 / corpus_docs``
    at crawl scale — BPE statistics saturate long before that), then
    pre-tokenize → explode → count → top ``max_words`` by (count desc,
    word asc).  The driver loop learns ``num_merges`` merges with
    deterministic tie-breaking (max count, then lexicographically
    smallest pair) and stops early when no pair reaches
    ``min_pair_freq``.

    Returns ``(merges, meta)`` — ``merges`` is the rank-ordered list of
    ``(left, right)`` symbol pairs (JSON-serializable; persist it next
    to the dataset so future batches tokenize identically), ``meta``
    records the pattern/end-token/fit sizes.
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    src = df
    if sample_fraction is not None:
        src = src.sample(fraction=float(sample_fraction), seed=seed)
    rows = (
        src.select(
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(BPE_TOKEN_PATTERN), F.lit(0)
                )
            ).alias("_w")
        )
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy(F.col("_c").desc(), F.col("_w").asc())
        .limit(int(max_words))
        .collect()
    )
    if not rows:
        raise ValueError("fit_bpe: no words in the corpus sample")
    word_freqs = {r["_w"]: int(r["_c"]) for r in rows}
    merges = _learn_merges(word_freqs, int(num_merges), int(min_pair_freq))
    meta = {
        "pattern": BPE_TOKEN_PATTERN,
        "end": END,
        "n_merges": len(merges),
        "n_fit_words": len(word_freqs),
    }
    return merges, meta


def _encoder(merges: Sequence) -> "tuple":
    """Build the (ranks, regex, cache) closure state shared by the
    encode/count UDFs."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    # re.ASCII: Java regex \s (the Spark fit side) is ASCII-only while
    # Python's is Unicode-aware — without the flag, fit and encode would
    # tokenize U+00A0 text differently (review r9)
    pat = re.compile(BPE_TOKEN_PATTERN, re.ASCII)
    cache: dict[str, tuple] = {}

    def encode_word(word: str) -> tuple:
        hit = cache.get(word)
        if hit is not None:
            return hit
        symbols = list(word) + [END]
        while len(symbols) > 1:
            best_rank, best_pair = None, None
            for i in range(len(symbols) - 1):
                r = ranks.get((symbols[i], symbols[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, (symbols[i], symbols[i + 1])
            if best_pair is None:
                break
            symbols = list(_merge_word(tuple(symbols), best_pair))
        out = tuple(symbols)
        if len(cache) > 200_000:  # bound executor memory on hostile vocab
            cache.clear()
        cache[word] = out
        return out

    return encode_word, pat


def bpe_encode_col(
    merges: Sequence, text_col: "str | Column" = "text"
) -> Column:
    """``array<string>`` of BPE tokens (subword units; the last piece of
    each word carries the ``</w>`` marker, so
    ``concat(tokens).replace('</w>', ' ')`` round-trips the
    pre-tokenized text).  NULL text → NULL, empty text → []."""
    import pandas as pd
    from pyspark.sql import types as T

    encode_word, pat = _encoder(merges)

    def _encode(texts):
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks: list[str] = []
            for w in pat.findall(t):
                toks.extend(encode_word(w))
            out.append(toks)
        return pd.Series(out)

    return F.pandas_udf(_encode, T.ArrayType(T.StringType()))(
        F.col(text_col) if isinstance(text_col, str) else text_col
    )


def bpe_token_count_col(
    merges: Sequence, text_col: "str | Column" = "text"
) -> Column:
    """``long`` trained-BPE token count — the budget column for
    ``pack_sequences(token_col=...)`` and the mass column for
    ``temperature_weights(mass_col=...)``.  NULL/empty text → 0."""
    import pandas as pd
    from pyspark.sql import types as T

    encode_word, pat = _encoder(merges)

    def _count(texts):
        out = []
        for t in texts:
            if t is None:
                out.append(0)
                continue
            n = 0
            for w in pat.findall(t):
                n += len(encode_word(w))
            out.append(n)
        return pd.Series(out, dtype="int64")

    return F.pandas_udf(_count, T.LongType())(
        F.col(text_col) if isinstance(text_col, str) else text_col
    )
