"""chunk_documents and tfidf_keywords (pipeline/text.py): hand-computed
semantics, coverage/overlap invariants, and pure-Python parity."""

import math

import pytest
from pyspark.sql import functions as F

from adampro_spark.pipeline.text import chunk_documents, tfidf_keywords


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b c d e f g h i j"),      # 10 tokens
        (2, "x y z"),                     # shorter than any window
        (3, ""),                          # empty: zero chunks
        (4, "  Multi   Space\tTabs  "),   # normalization
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_hand_computed(spark, docs):
    out = chunk_documents(docs, max_tokens=4, overlap=1)
    got = {
        (r["doc_id"], r["chunk_id"]): (r["text"], r["n_tokens"])
        for r in out.collect()
    }
    # doc 1: stride 3, starts while start <= n - overlap = 9 → 1,4,7
    # (a start at 10 would yield the pure-duplicate tail chunk "j")
    assert got[(1, 0)] == ("a b c d", 4)
    assert got[(1, 1)] == ("d e f g", 4)
    assert got[(1, 2)] == ("g h i j", 4)
    assert (1, 3) not in got  # no zero-new-token tail window
    assert got[(2, 0)] == ("x y z", 3)
    assert (3, 0) not in got  # empty doc: zero chunks
    assert got[(4, 0)] == ("multi space tabs", 3)
    assert len(got) == 5


def test_chunk_invariants(spark, tables):
    """Every token appears; consecutive chunks overlap by exactly
    `overlap` (except a shorter tail); chunk_id is dense from 0."""
    docs = tables["documents"].limit(50)
    out = chunk_documents(docs, max_tokens=16, overlap=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["text"].split(" ")
    base = {
        r["doc_id"]: [t for t in r["text"].lower().split() if t]
        for r in docs.collect()
    }
    for doc_id, chunks in by_doc.items():
        ids = sorted(chunks)
        assert ids == list(range(len(ids)))
        toks = base[doc_id]
        rebuilt = []
        for i in ids:
            c = chunks[i]
            start = i * 12  # stride = 16 - 4
            assert c == toks[start:start + 16]
            # every chunk carries at least one token the previous did not
            assert start <= len(toks) - 4 or i == 0
            rebuilt = rebuilt[:start] + c
        assert rebuilt == toks  # full coverage, correct overlap


def test_chunk_param_validation(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=8, overlap=8)


def test_tfidf_matches_python(spark):
    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana cherry cherry durian"),
        (3, "apple apple apple elderberry"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in tfidf_keywords(df, top_k=2).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["tfidf"])
        )
    n = 4
    corpus = {i: t.split() for i, t in rows}
    dft = {}
    for toks in corpus.values():
        for t in set(toks):
            dft[t] = dft.get(t, 0) + 1
    for doc_id, toks in corpus.items():
        if not toks:
            assert doc_id not in got
            continue
        scores = {
            t: toks.count(t) * math.log(n / dft[t]) for t in set(toks)
        }
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        want = [
            (i + 1, t, round(s, 4)) for i, (t, s) in enumerate(want)
        ]
        assert sorted(got[doc_id]) == want, doc_id


def test_tfidf_rank_bounds(spark, tables):
    docs = tables["documents"].limit(100)
    out = tfidf_keywords(docs, top_k=3)
    agg = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("c"), F.max("rank").alias("m")
    )
    assert agg.filter((F.col("c") > 3) | (F.col("m") > 3)).count() == 0
    assert out.filter(F.col("tfidf") < 0).count() == 0
