"""PII scrubbing (pipeline/scrub.py) and Gopher-style repetition signals
(text.with_repetition) — round-7 curation-stage additions.

Patterns are deliberately RE2-compatible; the DuckDB parity test holds
the portability claim (same pattern strings, same match counts on the
same corpus).
"""

import duckdb
import pytest

from pyspark.sql import functions as F

from adampro_spark.pipeline.scrub import (
    PII_PATTERNS,
    pii_stats,
    redact_expr,
    redact_pii,
)
from adampro_spark.pipeline.text import repetition_stats

PLANTED = [
    (1, "contact john.doe+x@example-mail.co.uk or a@b.io today"),
    (2, "ssn 123-45-6789 and card 4111 1111 1111 1111 here"),
    (3, "call (415) 555-1234 or 415-555-9876 from 10.0.0.255"),
    (4, "no pii at all, just an @ sign and 1234 numbers"),
    (5, ""),
]


@pytest.fixture(scope="module")
def planted(spark):
    return spark.createDataFrame(PLANTED, "doc_id long, text string").cache()


def test_pii_stats_exact_counts(planted):
    got = {r["doc_id"]: r.asDict() for r in pii_stats(planted).collect()}
    assert got[1]["pii_email"] == 2 and got[1]["pii_total"] == 2
    assert got[2]["pii_ssn"] == 1 and got[2]["pii_credit_card"] == 1
    assert got[3]["pii_phone"] == 2 and got[3]["pii_ipv4"] == 1
    assert got[4]["pii_total"] == 0 and got[5]["pii_total"] == 0


def test_redact_replaces_and_counts(planted):
    got = {r["doc_id"]: r for r in redact_pii(planted).collect()}
    assert "[EMAIL]" in got[1]["text"] and "@" not in got[1]["text"]
    assert got[1]["pii_redacted"] == 2
    assert "[SSN]" in got[2]["text"] and "[CARD]" in got[2]["text"]
    assert "123-45-6789" not in got[2]["text"]
    assert "[PHONE]" in got[3]["text"] and "[IP]" in got[3]["text"]
    # clean docs untouched
    assert got[4]["text"] == PLANTED[3][1] and got[4]["pii_redacted"] == 0


def test_redact_category_subset(planted):
    got = {
        r["doc_id"]: r["text"]
        for r in redact_pii(planted, categories=["email"]).collect()
    }
    assert "[EMAIL]" in got[1]
    assert "123-45-6789" in got[2]  # ssn untouched with email-only scrub


def test_unknown_category_raises(planted):
    with pytest.raises(ValueError, match="unknown PII categories"):
        pii_stats(planted, categories=["email", "passport"])


def test_patterns_portable_to_duckdb(spark, planted):
    """Every pattern string must count identically under DuckDB's RE2 —
    the portability contract that keeps engine-external audits honest."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.select("doc_id", "text").unionByName(
        planted.withColumn("doc_id", F.col("doc_id") + 10_000_000)
    )
    con = duckdb.connect()
    rows = corpus.collect()
    for name, (pat, _tok) in PII_PATTERNS.items():
        spark_counts = {
            r["doc_id"]: r["c"]
            for r in corpus.select(
                "doc_id", F.regexp_count("text", F.lit(pat)).alias("c")
            ).collect()
        }
        for r in rows:
            duck = con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [r["text"], pat]
            ).fetchone()[0]
            assert duck == spark_counts[r["doc_id"]], (name, r["doc_id"])


def test_repetition_stats_hand_computed(spark):
    rows = [
        (1, "dup line\ndup line\nunique one\n\ndup line"),
        (2, "the cat the cat the cat sat"),
        (3, "plain ordinary text without repeats here"),
        (4, ""),
        (5, "hello"),
        (6, "one two three four"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    # 4 non-empty lines, 2 distinct -> 0.5; 24 of 34 chars in dup lines
    assert got[1]["dup_line_frac"] == pytest.approx(0.5)
    assert got[1]["dup_line_char_frac"] == pytest.approx(24 / 34, abs=1e-4)
    # "the cat" x3, 7 chars, text len 27
    assert got[2]["top_2gram_char_frac"] == pytest.approx(21 / 27, abs=1e-4)
    assert got[2]["dup_5gram_frac"] == 0.0  # all three 5-grams distinct
    assert got[3]["dup_line_frac"] == 0.0
    assert got[4] == {
        "doc_id": 4, "dup_line_frac": 0.0, "dup_line_char_frac": 0.0,
        "top_2gram_char_frac": 0.0, "dup_5gram_frac": 0.0,
    }
    # review r7 second pass: a one-word doc has NO bigram — it must not
    # score as "maximally repetitive" via a phantom shorter gram
    assert got[5]["top_2gram_char_frac"] == 0.0
    assert got[5]["dup_5gram_frac"] == 0.0
    # 4 tokens: bigrams exist (all distinct), but no 5-gram
    assert 0.0 < got[6]["top_2gram_char_frac"] < 0.5
    assert got[6]["dup_5gram_frac"] == 0.0


def test_repetition_discriminates_boilerplate(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    junk = spark.createDataFrame(
        [(9_000_000 + i, "buy now best price deal " * 40) for i in range(5)],
        "doc_id long, text string",
    )
    stats = repetition_stats(docs.select("doc_id", "text").unionByName(junk))
    j = stats.filter(F.col("doc_id") >= 9_000_000).agg(
        F.min("dup_5gram_frac")
    ).collect()[0][0]
    p = stats.filter(
        (F.col("doc_id") < 9_000_000) & (F.col("dup_5gram_frac").isNotNull())
    ).agg(F.expr("percentile(dup_5gram_frac, 0.9)")).collect()[0][0]
    assert j > 0.9  # pure boilerplate: almost every 5-gram repeats
    assert j > p  # and clears the natural corpus's 90th percentile


def test_repetition_dup_line_chars_linear_formulation(spark):
    """Review r7 second pass: dup_line_char_frac must come from the
    sorted-neighbor O(L) form, exact on a many-line fixture (the old
    per-line rescan was O(L²))."""
    import numpy as np

    from adampro_spark.pipeline.text import repetition_stats

    rng = np.random.RandomState(2)
    lines = [f"line number {rng.randint(0, 400)}" for _ in range(1200)]
    text = "\n".join(lines)
    got = repetition_stats(
        spark.createDataFrame([(1, text)], "doc_id long, text string")
    ).collect()[0]
    from collections import Counter

    cnt = Counter(lines)
    dup_chars = sum(len(l) for l in lines if cnt[l] > 1)
    tot_chars = sum(len(l) for l in lines)
    assert got["dup_line_char_frac"] == pytest.approx(
        dup_chars / tot_chars, abs=1e-4
    )
    assert got["dup_line_frac"] == pytest.approx(
        1 - len(cnt) / len(lines), abs=1e-4
    )


def test_phone_pattern_handles_plus_prefix(spark):
    r"""Review r7 second pass: '\b\+?' could never consume '+' after a
    space — '+1-415-555-1234' left a stray '+' behind."""
    from adampro_spark.pipeline.scrub import redact_pii

    df = spark.createDataFrame(
        [(1, "call +1-415-555-1234 now"), (2, "call +1 (415) 555-1234 ok")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text"]
           for r in redact_pii(df, categories=["phone"]).collect()}
    assert got[1] == "call [PHONE] now"
    assert got[2] == "call [PHONE] ok"


def test_curate_redact_unknown_category_raises(spark):
    from adampro_spark.pipeline.curate import curate

    df = spark.createDataFrame([(1, "x " * 30)], "doc_id long, text string")
    with pytest.raises(ValueError, match="unknown PII categories"):
        curate(df, langs=None, min_quality=0.0, redact=["emial"], dedup=None)


def test_curate_repetition_gate_and_redaction(spark):
    from adampro_spark.pipeline.curate import curate

    base_text = (
        "this is a perfectly ordinary document with enough distinct tokens "
        "to pass every gate including length and it keeps going onwards"
    )
    rows = [
        (1, base_text),
        (2, base_text.replace("ordinary", "different")),
        # repetitive plant: one phrase over and over
        (3, "buy now best price deal " * 30),
        # pii plant that otherwise passes the gates
        (4, base_text + " contact me at leak@example.com please"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out, report = curate(
        df, langs=None, min_tokens=5, min_quality=0.0,
        max_dup_line_frac=0.5, max_top_2gram_char_frac=0.2,
        redact=True, dedup=None,
    )
    kept = {r["doc_id"]: r["text"] for r in out.collect()}
    assert 3 not in kept  # repetition gate dropped the boilerplate
    assert set(kept) == {1, 2, 4}
    assert "[EMAIL]" in kept[4] and "leak@example.com" not in kept[4]
    assert report["n_repetitive"] == 1
    assert report["n_pii_docs"] == 1
    assert report["n_output"] == 3


def test_redact_expr_composes(spark):
    df = spark.createDataFrame([(1, "a@b.co x")], "doc_id long, text string")
    r = df.select(
        F.length(redact_expr("text", ["email"])).alias("n")
    ).collect()[0]["n"]
    assert r == len("[EMAIL] x")


def test_gopher_gates_per_rule(spark):
    """Each MassiveText/Gopher rule fires on its planted violation and
    passes clean prose — and the preset plugs into curate's extra_gates
    with per-rule attrition counts."""
    from adampro_spark.pipeline.curate import curate, gopher_gate_flags

    prose = (
        "the quick brown fox jumps over the lazy dog and runs off to have "
        "a think about what life with so many words might be like today "
    ) * 3
    rows = [
        (1, prose),                                      # clean
        (2, "short doc"),                                # _g_words (too few)
        (3, "a " * 120),                                 # _g_word_len (mean 1)
        (4, prose + " " + "#tag " * 40),                 # _g_symbols
        (5, "\n".join(["- bullet item of the list"] * 20)),  # _g_bullets
        (6, ("123 456 789 000 " * 20) + "the of and to be that have with"),  # _g_alpha
        (7, "lorem ipsum dolor sit amet " * 12),         # _g_required
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    flags = gopher_gate_flags()
    flagged = df
    for n_, e in flags.items():
        flagged = flagged.withColumn(n_, e)
    got = {r["doc_id"]: r.asDict() for r in flagged.collect()}
    assert all(got[1][n_] for n_ in flags), {
        n_: got[1][n_] for n_ in flags if not got[1][n_]
    }
    assert not got[2]["_g_words"]
    assert not got[3]["_g_word_len"]
    assert not got[4]["_g_symbols"]
    assert not got[5]["_g_bullets"]
    assert not got[6]["_g_alpha"]
    assert not got[7]["_g_required"]

    out, report = curate(
        df, langs=None, min_tokens=1, min_quality=0.0, dedup=None,
        extra_gates=gopher_gate_flags(),
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {1}
    # per-rule attrition counts ride the same one-scan aggregate
    assert report["n_fail_g_words"] >= 1
    assert report["n_fail_g_required"] >= 1
    assert report["n_output"] == 1


def test_compression_ratio_detects_boilerplate(spark):
    """DEFLATE ratio separates repetitive junk from prose, and the Spark
    answer equals driver-side zlib exactly."""
    import zlib

    from adampro_spark.pipeline.text import compression_ratio_stats

    rows = [
        (1, "buy now best price deal " * 200),
        (2, "The committee convened at noon to review seventeen distinct "
            "proposals concerning watershed management, each drafted by a "
            "different regional authority with its own terminology."),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in compression_ratio_stats(df).collect()}
    for i, t in rows:
        b = t.encode()
        assert got[i]["n_bytes"] == len(b)
        assert got[i]["n_compressed"] == (len(zlib.compress(b, 6)) if b else 0)
    assert got[1]["compression_ratio"] < 0.05   # junk compresses away
    assert got[2]["compression_ratio"] > 0.5    # prose does not
    assert got[3]["compression_ratio"] == 0.0


def test_redaction_is_idempotent(spark):
    """redact(redact(x)) == redact(x): replacement tokens must never
    re-match any category pattern (hypothesis-style randomized plants)."""
    import random

    from adampro_spark.pipeline.scrub import redact_pii

    rng = random.Random(9)
    plants = [
        "a@b.io", "123-45-6789", "4111 1111 1111 1111",
        "+1-415-555-1234", "10.0.0.255",
    ]
    words = ["alpha", "bravo", "x1", "-", "#", "...", "[EMAIL]", "@"]
    rows = []
    for i in range(40):
        toks = [rng.choice(words) for _ in range(rng.randint(0, 12))]
        for _ in range(rng.randint(0, 3)):
            toks.insert(rng.randint(0, len(toks)) if toks else 0,
                        rng.choice(plants))
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = redact_pii(df, keep_counts=False)
    twice = redact_pii(once, keep_counts=False)
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r["text"] for r in twice.collect()}
    assert a == b


def test_curate_report_by_matches_global(spark):
    """Per-group attrition sums to curate's global report on the same
    gate parameters; extra gates ride along with per-rule counts."""
    from pyspark.sql import functions as F

    from adampro_spark.pipeline.curate import curate, curate_report_by

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "source")
    )
    kw = dict(langs=("en",), min_tokens=15, min_quality=0.25)
    rep = curate_report_by(docs, by="source", **kw)
    rows = rep.collect()
    assert len(rows) >= 2 and rep.columns == [
        "source", "n", "n_lang_fail", "n_short", "n_too_long",
        "n_low_quality", "n_pass",
    ]
    _out, g = curate(docs, dedup=None, **kw)
    assert sum(r["n"] for r in rows) == g["n_input"]
    assert sum(r["n_lang_fail"] for r in rows) == g["n_lang_fail"]
    assert sum(r["n_short"] for r in rows) == g["n_short"]
    assert sum(r["n_low_quality"] for r in rows) == g["n_low_quality"]
    assert sum(r["n_pass"] for r in rows) == g["n_after_gates"]

    # extra gate: per-rule fail column appears and is counted per group
    rep2 = curate_report_by(
        docs, by="source", extra_gates={"_g_even": F.col("doc_id") % 2 == 0}, **kw
    )
    assert "n_fail_g_even" in rep2.columns
    tot_odd = sum(r["n_fail_g_even"] for r in rep2.collect())
    assert tot_odd == docs.filter(F.col("doc_id") % 2 == 1).count()


def test_compression_gate_in_curate(spark):
    """curate(extra_gates=compression_gate_flags(...)) drops the
    machine-junk documents (ratio below the floor) in the same one-scan
    gate pass and reports the attrition (verdict r7 #8)."""
    from adampro_spark.pipeline.curate import curate
    from adampro_spark.pipeline.text import compression_gate_flags

    prose = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "magpies argue about breakfast near the old stone bridge today"
    )
    junk = "spam " * 60
    rows = [(i, prose + f" variant {i}") for i in range(10)]
    rows += [(100 + j, junk) for j in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out, rep = curate(
        df, langs=None, min_tokens=5, min_quality=0.0, dedup=None,
        extra_gates=compression_gate_flags(min_ratio=0.25),
    )
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert kept == set(range(10))
    assert rep["n_fail_comp_ok"] == 5


def test_compression_gate_streams(spark, tmp_path):
    """The same gate flag is stateless, so stream_curate(extra_gates=...)
    filters micro-batches identically to batch curate."""
    from adampro_spark.pipeline.curate import curate
    from adampro_spark.pipeline.text import compression_gate_flags
    from adampro_spark.streaming.ingest import stream_curate

    prose = (
        "a genuinely varied sentence with many different words that "
        "resist deflate compression better than repeated filler does"
    )
    rows = [(i, prose + f" tail {i}") for i in range(8)]
    rows += [(100 + j, "junk " * 50) for j in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(langs=None, min_tokens=5, min_quality=0.0, dedup=None)
    batch_out, _ = curate(
        df, extra_gates=compression_gate_flags(min_ratio=0.25), **kw
    )
    want = {r["doc_id"] for r in batch_out.select("doc_id").collect()}

    src = str(tmp_path / "comp_src")
    df.repartition(2).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    gated = stream_curate(
        stream, extra_gates=compression_gate_flags(min_ratio=0.25), **kw
    ).select("doc_id")
    q = (
        gated.writeStream.format("memory")
        .queryName("comp_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_comp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"] for r in spark.sql("SELECT doc_id FROM comp_stream").collect()
    }
    assert got == want and got == set(range(8))


# ---------------------------------------------------------------------------
# round 8: URL / domain filtering
# ---------------------------------------------------------------------------


def _url_corpus(spark):
    rows = [
        (1, "https://www.example.com/page", "keep? no - denied root"),
        (2, "http://sub.deep.example.com/x?q=1", "denied via parent"),
        (3, "https://good.org/article", "kept"),
        (4, "https://example.org/", "kept (org != com)"),
        (5, "not a url at all", "unparseable"),
        (6, None, "null url"),
        (7, "https://evil.net:8080/path", "denied with port"),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


def test_url_gate_flags_deny_and_allow(spark):
    from adampro_spark.pipeline.scrub import url_gate_flags

    df = _url_corpus(spark)
    flag = url_gate_flags("url", deny_domains=["example.com", "evil.net"])
    got = {
        r["doc_id"]: r["ok"]
        for r in df.select("doc_id", flag["_url_ok"].alias("ok")).collect()
    }
    # parse_url keeps the port out of HOST; www. stripped; subdomains
    # blocked via the chain; unparseable/NULL hosts fail the gate
    assert got == {1: False, 2: False, 3: True, 4: True, 5: False,
                   6: False, 7: False}

    allow = url_gate_flags("url", allow_domains=["example.com"])
    got2 = {
        r["doc_id"]: r["ok"]
        for r in df.select("doc_id", allow["_url_ok"].alias("ok")).collect()
    }
    assert got2[1] and got2[2] and not got2[3] and not got2[4]


def test_filter_by_domains_dataset_blocklist(spark):
    from adampro_spark.pipeline.scrub import filter_by_domains

    df = _url_corpus(spark)
    deny = spark.createDataFrame(
        [("example.com",), (".evil.net",)], "domain string"
    )
    kept = {
        r["doc_id"]
        for r in filter_by_domains(df, deny, "url").select("doc_id").collect()
    }
    # anti-join semantics: unparseable/NULL URLs are KEPT (documented),
    # denied roots + subdomains dropped
    assert kept == {3, 4, 5, 6}
    out = filter_by_domains(df, deny, "url")
    assert "_dchain" not in out.columns and set(out.columns) == {
        "doc_id", "url", "text"
    }


def test_filter_by_domains_rejects_streaming(spark, tmp_path):
    """ADVICE r9: the eager hit-set materialization is batch-only — a
    streaming input must raise a clear error up front, not fail deep in
    localCheckpoint."""
    import pytest as _pytest

    from adampro_spark.pipeline.scrub import filter_by_domains

    src = str(tmp_path / "stream_src")
    _url_corpus(spark).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    deny = spark.createDataFrame([("example.com",)], "domain string")
    with _pytest.raises(ValueError, match="streaming"):
        filter_by_domains(stream, deny, "url")


def test_url_gate_composes_with_curate(spark):
    from adampro_spark.pipeline.curate import curate
    from adampro_spark.pipeline.scrub import url_gate_flags

    rows = [
        (i, f"https://site{i % 3}.com/p",
         "a perfectly reasonable document with enough words to pass "
         "the gates and some variation " + str(i))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out, rep = curate(
        df, langs=None, min_tokens=5, min_quality=0.0, dedup=None,
        extra_gates=url_gate_flags("url", deny_domains=["site0.com"]),
    )
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert kept == {i for i in range(12) if i % 3 != 0}
    assert rep["n_fail_url_ok"] == 4


def test_line_dedup_paragraph_mode(spark):
    """sep='\\n\\n' removes cross-document boilerplate PARAGRAPHS and
    leaves untouched documents byte-identical."""
    from adampro_spark.pipeline.dedup import line_dedup

    boiler = "subscribe to our newsletter\nfor daily updates"
    rows = [
        (1, f"unique one\n\n{boiler}\n\ntail one"),
        (2, f"unique two\n\n{boiler}"),
        (3, f"{boiler}\n\nunique three"),
        (4, "totally original\n\nnothing shared here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in line_dedup(df, min_docs=3, sep="\n\n").collect()
    }
    assert out[1]["text"] == "unique one\n\ntail one"
    assert out[2]["text"] == "unique two"
    assert out[3]["text"] == "unique three"
    assert out[4]["text"] == rows[3][1]  # byte-identical
    assert out[4]["n_lines_removed"] == 0
    assert all(out[i]["n_lines_removed"] == 1 for i in (1, 2, 3))


def test_line_dedup_regex_significant_separator(spark):
    """ADVICE r8: sep is a FIXED STRING — a regex-significant separator
    like '. ' must split literally (not as 'any char + space') and the
    rejoin must stay byte-lossless for untouched documents."""
    from adampro_spark.pipeline.dedup import line_dedup

    boiler = "all rights reserved"
    rows = [
        (1, f"first sentence. {boiler}. tail one"),
        (2, f"second sentence. {boiler}"),
        (3, f"{boiler}. unique three"),
        (4, "ab. cd. ef"),  # untouched: '.' must not match 'b'/'d'
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in line_dedup(df, min_docs=3, sep=". ").collect()
    }
    assert out[1]["text"] == "first sentence. tail one"
    assert out[2]["text"] == "second sentence"
    assert out[3]["text"] == "unique three"
    assert out[4]["text"] == rows[3][1]  # byte-identical round trip
    assert out[4]["n_lines_removed"] == 0


def test_curate_rejects_lm_ok_input_column(spark):
    """ADVICE r8: '_lm_ok' is a reserved staging name (stream_curate
    materializes and drops it when lm= is set) — an input column with
    that name must be refused, batch and streaming alike."""
    from adampro_spark.pipeline.curate import curate
    from adampro_spark.streaming.ingest import stream_curate

    df = spark.createDataFrame(
        [(1, "some text", True)], "doc_id long, text string, _lm_ok boolean"
    )
    with pytest.raises(ValueError, match="_lm_ok"):
        curate(df, dedup=None)
    with pytest.raises(ValueError, match="_lm_ok"):
        stream_curate(df, dedup=None)


def test_stream_curate_extra_gate_name_clash_raises(spark):
    """ADVICE r8: an extra gate named like a built-in flag must raise
    (batch curate already does) instead of silently replacing the
    built-in gate on the streaming path."""
    from adampro_spark.streaming.ingest import stream_curate

    df = spark.createDataFrame([(1, "text")], "doc_id long, text string")
    with pytest.raises(ValueError, match="_lang_ok"):
        stream_curate(
            df, dedup=None, extra_gates={"_lang_ok": F.lit(True)}
        )


def test_html_to_text_extraction(spark):
    """html_to_text_expr strips invisible blocks, turns structure into
    line breaks, unescapes entities one level, and normalizes spacing."""
    from adampro_spark.pipeline.scrub import html_to_text_expr

    rows = [
        (1, "<html><head><title>T</title><style>x{color:red}</style>"
            "</head><body><h1>Hello</h1><p>World &amp; <b>friends</b>."
            "</p><script>evil()</script><ul><li>one</li><li>two</li>"
            "</ul><!-- hidden --></body></html>"),
        (2, "plain text, no markup"),
        (3, "a &amp;lt; b &nbsp; c &quot;d&quot; &#39;e&#39;"),
        (4, "<div>x</div>\n\n\n\n<div>y</div>"),
        (5, None),
        # truncated fetch: unclosed script body must not leak
        (6, "<p>keep this</p><script>var leaked = 'junk';"),
    ]
    df = spark.createDataFrame(rows, "i long, h string")
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text_expr("h").alias("t")).collect()
    }
    assert got[1] == "Hello\nWorld & friends .\none\ntwo"
    assert got[2] == "plain text, no markup"
    # one unescape level: &amp;lt; -> &lt; (not <)
    assert got[3] == "a &lt; b c \"d\" 'e'"
    assert got[4] == "x\n\ny"
    assert got[5] is None
    assert got[6] == "keep this"


def test_canonical_url_expr(spark):
    """URL canonicalization: case, www., default ports, fragments,
    tracking params (with separator repair), trailing slashes; unparsed
    inputs pass through."""
    from adampro_spark.pipeline.scrub import canonical_url_expr

    cases = [
        ("HTTPS://WWW.Example.COM:443/Path/Sub?utm_source=x&q=1&fbclid=z#f",
         "https://example.com/Path/Sub?q=1"),
        ("http://site.com:80/", "http://site.com/"),
        ("https://site.com:443", "https://site.com/"),
        ("https://site.com/a/b/", "https://site.com/a/b"),
        ("http://x.com/?utm_campaign=a", "http://x.com/"),
        ("http://y.com/p?a=1&utm_medium=m&b=2", "http://y.com/p?a=1&b=2"),
        ("http://z.com/?utm_a=1&utm_b=2", "http://z.com/"),
        ("http://k.com/p?gclid=g&a=2", "http://k.com/p?a=2"),
        ("  http://pad.com/x  ", "http://pad.com/x"),
        ("not a url", "not a url"),
        # non-default port survives
        ("http://p.com:8080/q", "http://p.com:8080/q"),
        # legal '&' in a query-less path must NOT be rewritten
        ("http://r.com/a&b", "http://r.com/a&b"),
        # consecutive leading trackers
        ("http://s.com/?utm_a=1&utm_b=2&q=3", "http://s.com/?q=3"),
        # review r9.2 regressions:
        ("http://a.com/path&utm_source=abc", "http://a.com/path&utm_source=abc"),
        ("http://a.com/p?a=1?utm_x=2", "http://a.com/p?a=1?utm_x=2"),
        ("http://www.www.example.com/x", "http://example.com/x"),
        ("HTTP://a.com:80?q=1", "http://a.com/?q=1"),
        ("http://a.com/?q=1", "http://a.com/?q=1"),
        ("http://a.com/Path/?q=1", "http://a.com/Path?q=1"),
        # ADVICE r9: VALUELESS trackers ('?utm_source', '&gclid') must
        # strip too, including adjacent runs; whole-param matching must
        # not prefix-garble longer legit names
        ("http://v.com/p?utm_source", "http://v.com/p"),
        ("http://v.com/p?a=1&gclid", "http://v.com/p?a=1"),
        ("http://v.com/p?gclid&a=1", "http://v.com/p?a=1"),
        ("http://v.com/p?a=1&utm_a&utm_b&utm_c&utm_d&b=2",
         "http://v.com/p?a=1&b=2"),
        ("http://v.com/p?utm_x&gclid", "http://v.com/p"),
        ("http://v.com/p?fbclidextra=1", "http://v.com/p?fbclidextra=1"),
        ("http://v.com/p?a=1&&b=2", "http://v.com/p?a=1&b=2"),
        # review r10: newline semantics — Java '$' matches before a
        # trailing newline, RE2's does not, and '.' crosses neither;
        # (?s)…\z strips these identically in both engines
        ("http://w.com/p?gclid\n", "http://w.com/p"),
        ("http://w.com/p?utm_source=x\ny&a=1", "http://w.com/p?a=1"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, u string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url_expr("u").alias("c")).collect()
    }
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)
    # idempotence: canonicalizing a canonical URL is a no-op
    df2 = spark.createDataFrame(
        [(i, c) for i, c in got.items()], "i long, u string"
    )
    again = {
        r["i"]: r["c"]
        for r in df2.select("i", canonical_url_expr("u").alias("c")).collect()
    }
    assert again == got


def test_url_dedup_via_canonical_form(spark):
    """The crawl-dedup use: dropDuplicates on the canonical URL
    collapses tracking-param/case/port variants of the same page."""
    from adampro_spark.pipeline.scrub import canonical_url_expr

    rows = [
        (1, "http://a.com/page?utm_source=x"),
        (2, "HTTP://WWW.A.com:80/page"),
        (3, "http://a.com/page#top"),
        (4, "http://a.com/other"),
    ]
    df = spark.createDataFrame(rows, "i long, url string")
    out = df.withColumn("cu", canonical_url_expr("url")).dropDuplicates(["cu"])
    assert out.count() == 2


def test_web_preprocessing_fuzz_batch(spark):
    """Adversarial-input guard for the newest expressions: random
    tag-soup/URL-ish strings must never error, canonicalization must be
    idempotent, and extraction must never return NULL for non-NULL
    input."""
    import random
    import string as _string

    from adampro_spark.pipeline.scrub import (
        canonical_url_expr,
        html_to_text_expr,
    )

    rng = random.Random(97)
    alphabet = _string.printable + "éü中"
    frags = ["<", ">", "</", "/>", "&amp;", "&", "#", "?", "://",
             "http://", "HTTPS://", "www.", ":80", ":443", "utm_x=1",
             "<script>", "</script>", "<p>", "\n", "\t", " "]
    rows = []
    for i in range(300):
        parts = [
            rng.choice(frags) if rng.random() < 0.5
            else "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
            for _ in range(rng.randint(0, 12))
        ]
        rows.append((i, "".join(parts)))
    df = spark.createDataFrame(rows, "i long, s string")
    out = df.select(
        "i",
        html_to_text_expr("s").alias("t"),
        canonical_url_expr("s").alias("c"),
    ).collect()
    assert len(out) == 300
    got = {r["i"]: (r["t"], r["c"]) for r in out}
    for i, s in rows:
        t, c = got[i]
        assert t is not None and c is not None
    # idempotence of canonicalization over the whole fuzz set
    df2 = spark.createDataFrame(
        [(i, c) for i, (_t, c) in got.items()], "i long, s string"
    )
    again = {
        r["i"]: r["c"]
        for r in df2.select("i", canonical_url_expr("s").alias("c")).collect()
    }
    bad = {i for i in again if again[i] != got[i][1]}
    assert not bad, [(got[i][1], again[i]) for i in sorted(bad)[:3]]


def test_crawl_front_end_composition(spark):
    """The full crawl front end in one flow: raw HTML + dirty URLs →
    html_to_text_expr → canonical-URL exact dedup → curate gates (with
    a URL gate) → near-dup dedup.  Each stage's effect is asserted."""
    from adampro_spark.pipeline.curate import curate
    from adampro_spark.pipeline.scrub import (
        canonical_url_expr,
        html_to_text_expr,
        url_gate_flags,
    )

    good = ("this is a perfectly reasonable document with plenty of "
            "ordinary english words that passes every quality gate "
            "because it keeps talking about normal things ") * 2
    wrap = lambda body: (  # noqa: E731
        "<html><head><style>x{}</style></head><body><p>"
        + body + "</p><script>s()</script></body></html>"
    )
    rows = [
        # 1+2: same page fetched twice with tracking params → URL dedup
        (1, "http://a.com/page?utm_source=x", wrap(good + "alpha")),
        (2, "HTTP://WWW.A.com:80/page#top", wrap(good + "alpha")),
        # 3: distinct page, near-dup TEXT of 1 → minhash dedup
        (3, "http://a.com/other", wrap(good + "alpha beta")),
        # 4: blocked domain
        (4, "http://spam.bad.com/x", wrap(good + "gamma")),
        # 5: junk content (fails gates after extraction)
        (5, "http://a.com/junk", wrap("@@@ ### !!!")),
        # 6: clean unique survivor
        (6, "http://a.com/unique", wrap(
            "completely different content about rivers bridges and "
            "markets with enough ordinary english words to pass the "
            "gates " * 2)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    extracted = (
        df.withColumn("text", html_to_text_expr("html"))
        .withColumn("curl", canonical_url_expr("url"))
        .drop("html")
    )
    # extraction really removed the markup
    assert all(
        "<" not in r["text"] for r in extracted.select("text").collect()
    )
    url_deduped = extracted.dropDuplicates(["curl"])
    assert url_deduped.count() == 5  # 1/2 collapsed
    out, rep = curate(
        url_deduped, langs=None, min_tokens=10, min_quality=0.3,
        dedup="minhash", dedup_threshold=0.8,
        extra_gates=url_gate_flags("url", deny_domains=["bad.com"]),
    )
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    # one of {1,2} (url dedup) then one of {that, 3} (near-dup text),
    # 4 blocked, 5 junk, 6 survives
    assert 6 in kept and 4 not in kept and 5 not in kept
    assert len(kept & {1, 2, 3}) == 1
    assert rep["n_fail_url_ok"] == 1 and rep["n_low_quality"] >= 1
    assert rep["n_dup_dropped"] == 1


def test_curate_failures_per_doc_reasons(spark):
    """curate_failures names every failing gate per document and agrees
    with curate's survivor set and aggregate report."""
    from adampro_spark.pipeline.curate import curate, curate_failures

    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river "
            "bank and the weather is fine today with some clouds around"),
        (2, "@@@ ### !!!"),                      # junk: lang + quality (+len)
        (3, "short text only"),                  # too short
        (4, "le texte est en français et il contient beaucoup de mots "
            "ordinaires pour dépasser la limite de longueur du filtre "
            "sans aucun doute possible ici"),    # wrong language
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(langs=("en",), min_tokens=10, min_quality=0.3)
    fails = {
        r["doc_id"]: list(r["failed_gates"])
        for r in curate_failures(df, **kw).collect()
    }
    assert 1 not in fails
    assert "len_ok" in fails[3]
    assert "lang_ok" in fails[4] and "len_ok" not in fails[4]
    assert {"lang_ok", "q_ok"} <= set(fails[2])
    out, rep = curate(df, dedup=None, **kw)
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert kept == {1}
    assert set(fails) == {2, 3, 4}  # failures ∪ survivors = input
    # aggregate report consistent with per-doc reasons
    assert rep["n_lang_fail"] == sum("lang_ok" in v for v in fails.values())
    assert rep["n_short"] == sum("len_ok" in v for v in fails.values())


# ---------------------------------------------------------------------------
# Encoding-artifact (mojibake) detection (round 11)
# ---------------------------------------------------------------------------


def test_mojibake_counts_and_duckdb_parity(spark):
    import duckdb

    from adampro_spark.pipeline.scrub import (
        MOJIBAKE_PATTERNS,
        mojibake_count_expr,
    )

    cases = [
        ("CafÃ© rÃ©sumÃ© naÃ¯ve", 4),        # 2-byte accents double-decoded
        ("donâ€™t â€” reallyâ€¦", 3),          # 3-byte cp1252 punctuation
        ("hello � world", 1),             # replacement char
        ("Ð¿Ñ€Ð¸Ð²ÐµÑ‚", 6),                 # Cyrillic double-decoded
        ("São Paulo, Café, née, don’t — vraiment…", 0),
        # review r11: legit typography pairing accented CAPITALS with
        # NBSP/guillemets must NOT flag (the full À-Ñ lead range did)
        ("«DÉJÀ» RÉSUMÉ\u00a0: CAFÉ\u00a0! JOSÉ»", 0),
        ("Привет мир Ελλάδα 日本語 ß æ ø", 0),
        ("Die Straße nach Zürich: àéîõü", 0),
        ("ÀÉÎÕÜ UPPERCASE ACCENTS", 0),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], ["t"])
    got = [r[0] for r in df.select(mojibake_count_expr("t")).collect()]
    assert got == [n for _, n in cases]
    # the same pattern strings count identically under DuckDB's RE2
    con = duckdb.connect()
    for (t, want), g in zip(cases, got):
        d = sum(
            con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [t, p]
            ).fetchone()[0]
            for p in MOJIBAKE_PATTERNS.values()
        )
        assert d == g == want
    # NULL text -> NULL count
    ndf = spark.createDataFrame([(None,)], "t string")
    assert ndf.select(mojibake_count_expr("t")).collect()[0][0] is None


def test_encoding_gate_in_curate(spark):
    from adampro_spark.pipeline.curate import curate
    from adampro_spark.pipeline.scrub import encoding_gate_flags

    clean = (
        "the quick brown fox jumps over the lazy dog and keeps going "
        "through the quiet field toward the distant hills every day"
    )
    dirty = clean + " but the encoding broke: CafÃ© donâ€™t â€”"
    df = spark.createDataFrame(
        [(1, clean), (2, dirty)], ["doc_id", "text"]
    )
    out, rep = curate(
        df,
        min_tokens=5,
        min_quality=0.0,
        dedup=None,
        extra_gates=encoding_gate_flags(),
    )
    assert {r["doc_id"] for r in out.collect()} == {1}
    assert rep["n_fail_enc_ok"] == 1
    # a tolerant ceiling lets the stray-artifact doc through
    out2, _ = curate(
        df,
        min_tokens=5,
        min_quality=0.0,
        dedup=None,
        extra_gates=encoding_gate_flags(max_artifacts=10),
    )
    assert out2.count() == 2
