"""Trained char-n-gram NB langid (pipeline/langid.py): accuracy on
planted multilingual docs, superiority over the stopword heuristic,
exact parity with a driver-side mirror, und/NULL handling."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from adampro_spark.pipeline.langid import (
    SEED_TEXTS,
    _grams,
    _norm,
    fit_langid,
    langid_scores_col,
    trained_langid_col,
)

# Held-out sentences (NOT in the seeds), one per language.
HELDOUT = {
    "en": "the weather tomorrow should be sunny with a light wind from the west",
    "de": "das wetter morgen soll sonnig werden mit leichtem wind aus westen",
    "fr": "le temps demain devrait être ensoleillé avec un vent léger",
    "es": "el tiempo de mañana será soleado con un viento ligero del oeste",
    "it": "il tempo domani dovrebbe essere soleggiato con un vento leggero",
    "pt": "o tempo amanhã deve ser ensolarado com um vento leve do oeste",
    "nl": "het weer morgen wordt zonnig met een lichte wind uit het westen",
    "sv": "vädret i morgon blir soligt med en lätt vind från väster",
    "da": "vejret i morgen bliver solrigt med en let vind fra vest",
    "fi": "huomenna sää on aurinkoinen ja lännestä puhaltaa kevyt tuuli",
    "pl": "jutro pogoda będzie słoneczna z lekkim wiatrem z zachodu",
    "cs": "počasí zítra má být slunečné s lehkým větrem od západu",
    "zh": "明天的天气应该是晴朗的有来自西边的微风",
}


@pytest.fixture(scope="module")
def fitted():
    return fit_langid()


def test_heldout_sentences_all_correct(spark, fitted):
    model, meta = fitted
    rows = [(i, lang, txt) for i, (lang, txt) in enumerate(HELDOUT.items())]
    df = spark.createDataFrame(rows, "i long, want string, text string")
    got = {
        r["want"]: r["lang"]
        for r in df.select(
            "want", trained_langid_col(model, meta).alias("lang")
        ).collect()
    }
    assert got == {lang: lang for lang in HELDOUT}, got


def test_beats_stopword_heuristic(spark, fitted):
    """The verdict-r8 motivation: the heuristic covers 5 stopword lists;
    the trained model must match it on those and win on the rest."""
    from adampro_spark.pipeline.text import langid_expr

    model, meta = fitted
    rows = [(i, lang, txt) for i, (lang, txt) in enumerate(HELDOUT.items())]
    df = spark.createDataFrame(rows, "i long, want string, text string")
    out = df.select(
        "want",
        trained_langid_col(model, meta).alias("nb"),
        langid_expr("text").alias("heur"),
    ).collect()
    nb_ok = sum(r["nb"] == r["want"] for r in out)
    heur_ok = sum(r["heur"] == r["want"] for r in out)
    assert nb_ok == len(HELDOUT)
    assert nb_ok > heur_ok  # strictly more languages covered


def test_scores_match_python_mirror(spark, fitted):
    """The UDF's (lang, logp) must equal an independent driver-side
    recomputation — the same contract the DuckDB oracle checks."""
    model, meta = fitted
    texts = list(HELDOUT.values())[:6]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r["i"]: (r["s"]["lang"], r["s"]["logp"])
        for r in df.select(
            "i", langid_scores_col(model, meta).alias("s")
        ).collect()
    }
    for i, t in enumerate(texts):
        grams = Counter(_grams(_norm(t), meta["orders"]))
        total = sum(grams.values())
        scores = {
            lang: sum(
                c * model[lang].get(g, meta["floors"][lang])
                for g, c in grams.items()
            )
            for lang in meta["langs"]
        }
        best = max(sorted(scores), key=lambda l: scores[l])
        assert got[i][0] == best
        assert got[i][1] == pytest.approx(
            round(scores[best] / total, 4), abs=1e-9
        )


def test_und_and_null_handling(spark, fitted):
    model, meta = fitted
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   \n  "), (4, HELDOUT["en"])],
        "i long, text string",
    )
    got = {
        r["i"]: (r["s"]["lang"], r["s"]["logp"])
        for r in df.select(
            "i", langid_scores_col(model, meta).alias("s")
        ).collect()
    }
    assert got[1] == ("und", None)
    assert got[2] == ("und", None)
    assert got[3] == ("und", None)
    assert got[4][0] == "en" and got[4][1] is not None


def test_fit_from_dataframe_and_validation(spark):
    df = spark.createDataFrame(
        [("aa", SEED_TEXTS["en"]), ("bb", SEED_TEXTS["fi"]),
         ("aa", "more english text about trains and rivers")],
        "lang string, text string",
    )
    model, meta = fit_langid(df)
    assert meta["langs"] == ["aa", "bb"]
    # concatenation happened: the aa profile has grams from both rows
    assert " tr" in model["aa"]
    with pytest.raises(ValueError, match="two languages"):
        fit_langid({"xx": "only one"})


def test_model_entries_quantized_for_engine_parity(fitted):
    model, meta = fitted
    for lang in meta["langs"]:
        for v in list(model[lang].values())[:50]:
            assert v == round(v, 6)
        assert meta["floors"][lang] == round(meta["floors"][lang], 6)
        # floors are worse than any seen gram's probability
        assert meta["floors"][lang] <= min(model[lang].values()) + 1e-9


def test_curate_composes_with_trained_langid(spark, fitted):
    """The trained column drops into curate as an extra gate — mixed
    corpus keeps only the target language."""
    from adampro_spark.pipeline.curate import curate

    model, meta = fitted
    rows = [
        (i, (txt + " ") * 4) for i, txt in enumerate(HELDOUT.values())
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out, rep = curate(
        df, langs=None, min_tokens=3, min_quality=0.0, dedup=None,
        extra_gates={
            "_nblang_ok": trained_langid_col(model, meta).isin("en", "de")
        },
    )
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert kept == {0, 1}  # en, de rows
    assert rep["n_fail_nblang_ok"] == len(HELDOUT) - 2


def test_langid_col_replaces_heuristic_in_curate_and_stream(spark, fitted):
    """gate_flags(langid_col=...) swaps the trained model into the langs
    gate; batch curate and stream_curate (batch mode) agree."""
    from adampro_spark.pipeline.curate import curate
    from adampro_spark.streaming.ingest import stream_curate

    model, meta = fitted
    rows = [(i, (txt + " ") * 3) for i, txt in enumerate(HELDOUT.values())]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    col = trained_langid_col(model, meta)
    out, rep = curate(
        df, langs=("fi", "pl"), langid_col=col,
        min_tokens=3, min_quality=0.0, dedup=None,
    )
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    want = {i for i, lang in enumerate(HELDOUT) if lang in ("fi", "pl")}
    assert kept == want
    assert rep["n_lang_fail"] == len(HELDOUT) - 2

    s_out = stream_curate(
        df, langs=("fi", "pl"), langid_col=trained_langid_col(model, meta),
        min_tokens=3, min_quality=0.0, dedup=None,
    )
    assert {r["doc_id"] for r in s_out.select("doc_id").collect()} == want
