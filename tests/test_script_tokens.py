"""Script-aware tokenization for space-free scripts (round 12, verdict
r11 #2): whitespace word gates are degenerate on zh/ja/th — a Chinese
document is ONE "word" — so ``tokenizer="script"`` treats each
space-free-script character as its own token and routes the
English-targeted Gopher rules around dominated documents.
"""

import pytest

from pyspark.sql import functions as F

from adampro_spark.pipeline.curate import curate, gate_flags, gopher_gate_flags
from adampro_spark.pipeline.text import (
    script_tokens_expr,
    space_free_dominant_expr,
    text_stats,
    tokens_expr,
)

ZH = (
    "今天天气很好我们决定去公园散步然后在湖边喝茶看书"
    "晚上回家做饭吃完饭以后看了一部很长的电影觉得非常有意思"
    "第二天早上我们又去了博物馆参观了很多古代的文物和字画"
)
JA = "日本語のテキストです漢字とひらがなとカタカナが混ざっています"
EN = (
    "the quick brown fox jumps over the lazy dog and then runs back home "
    "to have a quiet dinner with all of its good friends before midnight "
    "because tomorrow they have planned a very long trip together again"
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(0, ZH), (1, JA), (2, EN), (3, "mixed 汉字 tokens here")],
        "doc_id long, text string",
    )


def test_script_tokens_split_cjk_chars(spark, corpus):
    rows = {
        r["doc_id"]: (r["w"], r["s"])
        for r in corpus.select(
            "doc_id",
            F.size(tokens_expr("text")).alias("w"),
            F.size(script_tokens_expr("text")).alias("s"),
        ).collect()
    }
    # zh: one whitespace "word" -> one token per character
    assert rows[0][0] == 1 and rows[0][1] == len(ZH)
    # latin text: identical under both tokenizers
    assert rows[2][0] == rows[2][1] == len(EN.split())
    # mixed: latin words survive, each CJK char its own token
    assert rows[3][1] == 3 + 2


def test_space_free_dominance_routing(spark, corpus):
    rows = {
        r["doc_id"]: r["dom"]
        for r in corpus.select(
            "doc_id", space_free_dominant_expr("text").alias("dom")
        ).collect()
    }
    assert rows[0] and rows[1] and not rows[2] and not rows[3]


def test_zh_doc_passes_script_gopher_gates(spark, corpus):
    """The verdict's pin: a zh document must no longer fail the
    mean-word-length gate spuriously (whitespace mode: the whole doc is
    one 70+-char "word" -> mean length way above 10 -> fail), and the
    alpha/required English rules must not kill it either."""
    ws = gopher_gate_flags()
    sc = gopher_gate_flags(tokenizer="script")
    row = (
        corpus.filter(F.col("doc_id") == 0)
        .select(
            ws["_g_word_len"].alias("ws_len"),
            sc["_g_word_len"].alias("sc_len"),
            sc["_g_alpha"].alias("sc_alpha"),
            sc["_g_required"].alias("sc_req"),
            ws["_g_words"].alias("ws_words"),
            sc["_g_words"].alias("sc_words"),
        )
        .collect()[0]
    )
    assert not row["ws_len"]          # the spurious failure
    assert row["sc_len"] and row["sc_alpha"] and row["sc_req"]
    # word-count floor regains meaning: 1 "word" fails, 70+ chars pass
    assert not row["ws_words"] and row["sc_words"]
    # and the English doc is judged IDENTICALLY in both modes
    en = (
        corpus.filter(F.col("doc_id") == 2)
        .select(
            *[c.alias(f"ws_{n}") for n, c in gopher_gate_flags().items()],
            *[
                c.alias(f"sc_{n}")
                for n, c in gopher_gate_flags(tokenizer="script").items()
            ],
        )
        .collect()[0]
    )
    for n in ("_g_words", "_g_word_len", "_g_symbols", "_g_bullets",
              "_g_alpha", "_g_required"):
        assert en[f"ws_{n}"] == en[f"sc_{n}"], n


def test_script_gate_flags_quality(spark, corpus):
    """curate's base gates: zh text is 0% alnum under the whitespace
    class (-> quality 0 -> fail) but passes in script mode; the token
    floor counts characters."""
    ws = gate_flags(langs=None)
    sc = gate_flags(langs=None, tokenizer="script")
    row = (
        corpus.filter(F.col("doc_id") == 0)
        .select(
            ws["_q_ok"].alias("ws_q"), sc["_q_ok"].alias("sc_q"),
            ws["_len_ok"].alias("ws_len"), sc["_len_ok"].alias("sc_len"),
        )
        .collect()[0]
    )
    assert not row["ws_q"] and row["sc_q"]
    assert not row["ws_len"] and row["sc_len"]


def test_curate_script_mode_end_to_end(spark, corpus):
    kept_ws, _ = curate(corpus, langs=None, dedup=None)
    kept_sc, rep = curate(corpus, langs=None, dedup=None, tokenizer="script")
    ws_ids = {r["doc_id"] for r in kept_ws.select("doc_id").collect()}
    sc_ids = {r["doc_id"] for r in kept_sc.select("doc_id").collect()}
    assert 0 not in ws_ids          # zh doc died under whitespace gates
    assert {0, 2} <= sc_ids         # zh + en both survive script mode
    assert rep["n_output"] == len(sc_ids)


def test_text_stats_script_mode(spark, corpus):
    ws = {r["doc_id"]: r for r in text_stats(corpus).collect()}
    sc = {
        r["doc_id"]: r
        for r in text_stats(corpus, tokenizer="script").collect()
    }
    assert ws[0]["n_tokens"] == 1 and sc[0]["n_tokens"] == len(ZH)
    assert sc[0]["avg_token_len"] == 1.0
    assert ws[0]["alnum_ratio"] == 0.0 and sc[0]["alnum_ratio"] == 1.0
    # latin doc: every stat identical under both tokenizers
    for k in ("n_tokens", "avg_token_len", "alnum_ratio", "quality"):
        assert ws[2][k] == sc[2][k], k


def test_unknown_tokenizer_raises(spark, corpus):
    with pytest.raises(ValueError, match="unknown tokenizer"):
        text_stats(corpus, tokenizer="bpe").collect()
