"""Round-16 optimization equivalence pins.

Each test pins an optimization from OPTIMIZATION_r16.md to the exact
output it must preserve — the round's contract is that no declared
query's results change, only their cost.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F


def test_fit_bigram_unigram_marginal_parity(spark):
    """Round 16: fit_bigram_lm now derives the unigram fit from the
    positioned pair table's ``cur`` marginal (one corpus pass instead of
    two).  The vocabulary, meta, bigram table, and kn statistics must be
    BIT-IDENTICAL to the standalone fit_unigram_lm + the old two-pass
    shape — pinned on a corpus with empty docs, NULL text, one-token
    docs, and vocab/bigram truncation in play."""
    from adampro_spark.pipeline.lm import fit_bigram_lm, fit_unigram_lm

    rows = [
        (1, "a b a c a b"),
        (2, "b c b c b"),
        (3, "a"),
        (4, ""),
        (5, None),
        (6, "c a a a b d e f g h"),
        (7, "d d d d"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uv, um = fit_unigram_lm(df, vocab_size=4)
    for smoothing in ("interp", "kn"):
        bv, bt, bm = fit_bigram_lm(
            df, vocab_size=4, bigram_size=5, smoothing=smoothing
        )
        uni = {
            (r["tok"], r["cnt"], round(r["logp"], 12)) for r in uv.collect()
        }
        got = {
            (r["tok"], r["cnt"], round(r["logp"], 12)) for r in bv.collect()
        }
        assert got == uni
        for key in ("n_tokens", "vocab_size_eff", "oov_logp"):
            assert bm[key] == um[key], key
        tops = sorted((r["prev"], r["cur"], r["cnt"]) for r in bt.collect())
        # hand-checked grouped pair counts, top-5 by (cnt desc, prev, cur)
        assert len(tops) == bm["bigram_size_eff"] == 5
    # kn statistics: cont/ctx/t_sum ride the vocab table
    bv, bt, bm = fit_bigram_lm(df, vocab_size=4, bigram_size=5, smoothing="kn")
    assert bm["smoothing"] == "kn" and "cont_denom" in bm
    cols = set(bv.columns)
    assert {"tok", "cnt", "logp", "cont", "ctx_total", "t_sum", "t_types"} <= cols


def test_repetition_arrow_kernel_parity(spark):
    """Round 16 (verdict r15 #7): text_stats' repetition signals now run
    through one Arrow kernel computing the staged INTEGER reductions;
    the ratio/round expressions stay in Spark.  Pin bit-equality with
    the HOF path on an adversarial fixture: NULL/empty/whitespace text,
    one-token docs, heavy line/paragraph/n-gram repetition, CJK +
    combining marks + non-BMP codepoints, and a doc long enough for
    every n-gram order."""
    from pyspark.sql import functions as F

    from adampro_spark.pipeline.text import (
        resolve_tokenizer, with_repetition, with_repetition_arrow,
    )

    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 "
    rows = [
        (1, None),
        (2, ""),
        (3, "   \n  \n"),
        (4, "one"),
        (5, "dup line\ndup line\nuniq\n\ndup line"),
        (6, "p1 p1 p1\n\np1 p1 p1\n\npx"),
        (7, base * 4 + "tail"),
        (8, ("a b c d e f g h i j " * 3) + "a b c d e f g h i j"),
        (9, "日本語 テスト 日本語 テスト 𝔘𝔫𝔦 𝔘𝔫𝔦 café café"),
        (10, "x\n" * 40 + "y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    staged = df.withColumn("_ts_toks", resolve_tokenizer("text", "whitespace"))
    toks = F.col("_ts_toks")
    for ext in (False, True):
        d1, f1, _ = with_repetition(staged, "text", toks=toks, extended=ext)
        d2, f2, _ = with_repetition_arrow(staged, "text", toks=toks, extended=ext)
        assert list(f1) == list(f2)
        a = {
            r["doc_id"]: tuple(r[n] for n in f1)
            for r in d1.select(
                "doc_id", *[c.alias(n) for n, c in f1.items()]
            ).collect()
        }
        b = {
            r["doc_id"]: tuple(r[n] for n in f2)
            for r in d2.select(
                "doc_id", *[c.alias(n) for n, c in f2.items()]
            ).collect()
        }
        assert a == b


def test_lm_shared_token_table_parity(spark):
    """Round 16 (verdict r15 #4): fit_unigram_lm_by / lm_score_by /
    lm_score(carry=) accept a shared lm_token_table explode — outputs
    must equal the unshared forms exactly (the shared table keeps
    NULL-tok rows for empty docs; fit consumers drop them)."""
    from adampro_spark.pipeline.lm import (
        fit_unigram_lm, fit_unigram_lm_by, lm_score, lm_score_by,
        lm_token_table,
    )

    rows = [
        (1, "en", "a b a c"),
        (2, "en", "b c b"),
        (3, "de", "x y x"),
        (4, "de", ""),
        (5, "en", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    ex = lm_token_table(df, by="lang").persist()
    try:
        v1, m1 = fit_unigram_lm_by(df, by="lang", vocab_size=3)
        v2, m2 = fit_unigram_lm_by(df, by="lang", vocab_size=3, exploded=ex)
        key = lambda d: sorted(  # noqa: E731
            (r["lang"], r["tok"], r["cnt"], round(r["logp"], 12))
            for r in d.collect()
        )
        assert key(v1) == key(v2) and m1 == m2
        s1 = lm_score_by(df, v1, m1, by="lang").collect()
        s2 = lm_score_by(df, v1, m1, by="lang", exploded=ex).collect()
        srt = lambda rs: sorted(  # noqa: E731
            (r["doc_id"], r["lang"], None if r["lm_logprob"] is None
             else round(r["lm_logprob"], 12), r["lm_tokens"]) for r in rs
        )
        assert srt(s1) == srt(s2)
        uvoc, umeta = fit_unigram_lm(df, vocab_size=3)
        c1 = lm_score(df, uvoc, umeta, carry=["lang"]).collect()
        c2 = lm_score(df, uvoc, umeta, carry=["lang"], exploded=ex).collect()
        assert srt(c1) == srt(c2)
    finally:
        ex.unpersist()


def test_ecp_bound_phase2_gate(spark):
    """Round 16 (verdict r15 #2): ecp_knn(cell_bound=True) runs its
    τ-tightening seed scan only when the build-time prunability
    estimate says the triangle bound can exclude anything — skipping is
    exactness-safe (the scan set only widens), so the top-k must be
    identical under every gate setting and equal to brute force."""
    from adampro_spark.index import ecp
    from adampro_spark.index.ecp import build_ecp, ecp_knn
    from adampro_spark.operators.scan import sequential_scan

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx, meta = build_ecp(df, "embedding", pk="vec_id")
    assert "bound_prune_frac" in meta  # the estimator rode the autofit sample
    q = [0.2] * 8
    brute = {
        (r["vec_id"], round(r["ap_distance"], 6))
        for r in sequential_scan(df, "embedding", q, 10, "euclidean", pk="vec_id").collect()
    }

    outs = {}
    for label, est in (("skip", 0.0), ("run", 1.0), ("legacy", None)):
        m = dict(meta)
        if est is None:
            m.pop("bound_prune_frac", None)
        else:
            m["bound_prune_frac"] = est
        res = ecp_knn(df, "embedding", idx, m, q, 10, cell_bound=True)
        outs[label] = {
            (r["vec_id"], round(r["ap_distance"], 6)) for r in res.collect()
        }
        if est == 0.0:
            assert ecp.LAST_BOUND_STATS["phase2"] is False
        else:
            assert ecp.LAST_BOUND_STATS["phase2"] is True
    assert outs["skip"] == outs["run"] == outs["legacy"] == brute


def test_curate_media_reject_rank_isolation(spark):
    """Round 16 (verdict r15 #3): the exact-dedup rank window now gives
    every gate-FAILED row (NULL sha) its own singleton partition instead
    of funneling all rejects of one byte length into a single
    (NULL, n_bytes) window partition.  Semantics must be unchanged:
    rejects' ``_rn`` is only ever read under a ``kept_c`` guard, so the
    report and the survivor set are identical — pinned here with many
    distinct gate-failed blobs SHARING a byte length (the skew shape)
    alongside a real exact-dup family."""
    from adampro_spark.pipeline.multimodal import curate_media, encode_bmp

    h, w = 16, 16
    img = (np.add.outer(np.arange(h), np.arange(w)) % 256).astype(np.uint8)
    blob = encode_bmp(img)
    rows = (
        # one byte-identical family of 3 -> 2 exact drops, min-pk keeper
        [(0, blob), (1, blob), (2, blob)]
        # 6 DISTINCT unknown-format blobs, ALL the same n_bytes (37):
        # pre-fix these shared one (NULL, 37) window partition
        + [(10 + i, bytes([65 + i]) * 37) for i in range(6)]
    )
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out, report = curate_media(df, dedup="exact")
    assert {r["media_id"] for r in out.collect()} == {0}
    assert report["n_input"] == 9
    assert report["n_bad_format"] == 6
    assert report["n_after_gates"] == 3
    assert report["n_exact_dropped"] == 2
    assert report["n_output"] == 1
