"""Trainable BPE (pipeline/bpe.py): fit+encode parity against an
INDEPENDENT naive reference implementation (full recount per merge —
different code path from the module's incremental pair index),
round-trip and determinism properties, and the token-count wiring into
pack_sequences / temperature_weights."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from adampro_spark.pipeline.bpe import (
    END,
    bpe_encode_col,
    bpe_token_count_col,
    fit_bpe,
)
from adampro_spark.pipeline.text import BPE_TOKEN_PATTERN


# --- independent reference (textbook Sennrich 2016, naive recount) ----

def _ref_fit(word_freqs: dict, num_merges: int, min_pair_freq: int = 2):
    vocab = {tuple(w) + (END,): c for w, c in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for symbols, freq in vocab.items():
            for i in range(len(symbols) - 1):
                pairs[(symbols[i], symbols[i + 1])] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_freq:
            break
        merges.append(best)
        new_vocab = {}
        a, b = best
        for symbols, freq in vocab.items():
            out, i = [], 0
            while i < len(symbols):
                if (
                    i < len(symbols) - 1
                    and symbols[i] == a
                    and symbols[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


def _ref_encode(word: str, merges: list) -> list:
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    symbols = list(word) + [END]
    while len(symbols) > 1:
        cands = [
            (ranks[(symbols[i], symbols[i + 1])], i)
            for i in range(len(symbols) - 1)
            if (symbols[i], symbols[i + 1]) in ranks
        ]
        if not cands:
            break
        r, _ = min(cands)
        a, b = merges[r]
        out, i = [], 0
        while i < len(symbols):
            if i < len(symbols) - 1 and symbols[i] == a and symbols[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


FIXTURE = (
    "the lowest lower low lowering newest newer new news widest wider "
    "wide widely the the the a a an and running runner runs ran "
    "tokenization tokenizer tokens token talking talked talks walk "
    "walking walked walker 123 42 hello, world! hello there."
)


def test_fit_matches_naive_reference(spark):
    df = spark.createDataFrame([(1, FIXTURE)], "doc_id long, text string")
    merges, meta = fit_bpe(df, num_merges=60, min_pair_freq=2)
    wf = Counter(re.findall(BPE_TOKEN_PATTERN, FIXTURE, re.ASCII))
    want = _ref_fit(dict(wf), 60)
    assert merges == want
    assert meta["n_merges"] == len(want)


def test_encode_matches_naive_reference(spark):
    df = spark.createDataFrame([(1, FIXTURE)], "doc_id long, text string")
    merges, _ = fit_bpe(df, num_merges=60)
    probe = "the lowest runner talked; tokenize NEW words 77!"
    got = (
        spark.createDataFrame([(1, probe)], "i long, text string")
        .select(bpe_encode_col(merges).alias("t"))
        .first()["t"]
    )
    want = []
    for w in re.findall(BPE_TOKEN_PATTERN, probe, re.ASCII):
        want.extend(_ref_encode(w, merges))
    assert got == want


def test_roundtrip_and_counts(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").limit(100)
    merges, _ = fit_bpe(docs, num_merges=300)
    out = docs.select(
        "text",
        bpe_encode_col(merges).alias("toks"),
        bpe_token_count_col(merges).alias("n"),
    ).collect()
    for r in out:
        toks, n = r["toks"], r["n"]
        assert n == len(toks)
        # round-trip: stripping END markers reconstructs the
        # pre-tokenized word sequence
        words = "".join(toks).split(END)[:-1] if toks else []
        assert words == re.findall(BPE_TOKEN_PATTERN, r["text"], re.ASCII)
        # trained BPE compresses vs characters, never beats word count
        assert len(words) <= n <= sum(len(w) + 1 for w in words)


def test_null_empty_and_determinism(spark):
    df = spark.createDataFrame(
        [(1, FIXTURE)], "doc_id long, text string"
    )
    merges, _ = fit_bpe(df, num_merges=40)
    merges2, _ = fit_bpe(df, num_merges=40)
    assert merges == merges2  # deterministic fit
    probe = spark.createDataFrame(
        [(1, None), (2, ""), (3, "low")], "i long, text string"
    )
    rows = {
        r["i"]: (r["t"], r["n"])
        for r in probe.select(
            "i",
            bpe_encode_col(merges).alias("t"),
            bpe_token_count_col(merges).alias("n"),
        ).collect()
    }
    assert rows[1] == (None, 0)
    assert rows[2] == ([], 0)
    assert rows[3][1] == len(rows[3][0]) >= 1


def test_feeds_pack_sequences_and_temperature_weights(spark):
    """verdict r8 #4 wiring: trained counts drive the packing budget and
    the temperature mix masses."""
    from adampro_spark.pipeline.mix import pack_sequences, temperature_weights

    rows = [(i, "web" if i % 3 else "books", FIXTURE[: 40 + 7 * (i % 9)])
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    merges, _ = fit_bpe(df, num_merges=80)
    with_n = df.withColumn("n_bpe", bpe_token_count_col(merges))
    packed = pack_sequences(with_n, budget=64, token_col="n_bpe")
    sums = (
        packed.groupBy("pack_id").agg(F.sum("n_bpe").alias("s")).collect()
    )
    assert sums and all(r["s"] <= 64 for r in sums)

    w = temperature_weights(
        df, tau=0.5, mass_col=bpe_token_count_col(merges)
    )
    assert set(w) == {"web", "books"}
    assert w["books"] > 1.0 > w["web"]  # small source up-weighted
    # expectation-preserving in the TRAINED token mass: sum_s m_s * w_s
    # equals the total trained-token mass
    m = {
        r["source"]: r["m"]
        for r in with_n.groupBy("source")
        .agg(F.sum("n_bpe").alias("m")).collect()
    }
    assert sum(m[s] * w[s] for s in w) == pytest.approx(
        sum(m.values()), rel=1e-9
    )


def test_fit_validation(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no words"):
        fit_bpe(df, num_merges=10)
    df2 = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError, match="num_merges"):
        fit_bpe(df2, num_merges=0)
