"""Learned quality classifier (pipeline/quality.py): trains on planted
junk, scores as a pure codegen expression, matches the driver-side model."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from adampro_spark.pipeline.quality import (
    QUALITY_DIMS,
    classify_quality,
    quality_feature_exprs,
    quality_score_expr,
    train_quality_model,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def labeled(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    junk = spark.createDataFrame(
        [(10_000 + i, ("@#$%^&* " * 30) + str(i)) for i in range(50)]
        + [(11_000 + i, "1234 5678 " * 40) for i in range(50)],
        "doc_id long, text string",
    )
    df = docs.withColumn("y", F.lit(0.0)).unionByName(
        junk.withColumn("y", F.lit(1.0))
    )
    yield df


def test_train_and_classify_separates_planted_junk(spark, labeled):
    w = train_quality_model(labeled, "y")
    assert len(w) == QUALITY_DIMS
    out = classify_quality(labeled, w)
    rows = out.select("y", "is_junk").collect()
    acc = sum(1 for r in rows if (r["y"] == 1.0) == bool(r["is_junk"])) / len(rows)
    assert acc > 0.95
    # svm variant: Pegasos shrinkage under-calibrates the absolute score
    # (λ-dependent; see ml.py), so assert RANKING separation — junk must
    # score clearly above clean on average
    w_svm = train_quality_model(labeled, "y", model="svm")
    rows2 = classify_quality(labeled, w_svm).select("y", "quality_score").collect()
    junk_mean = np.mean([r["quality_score"] for r in rows2 if r["y"] == 1.0])
    clean_mean = np.mean([r["quality_score"] for r in rows2 if r["y"] == 0.0])
    assert junk_mean > clean_mean + 0.1


def test_score_expression_matches_driver_model(spark, labeled):
    """The baked-in expression must equal w·f computed driver-side on the
    exact same feature values — the expression IS the model."""
    w = train_quality_model(labeled, "y")
    feats = labeled.select(
        "doc_id",
        F.array(*quality_feature_exprs("text")).alias("f"),
        quality_score_expr(w, "text").alias("s"),
    ).collect()
    for r in feats:
        want = float(np.dot(np.asarray(w), np.asarray(r["f"], dtype=float)))
        assert abs(r["s"] - want) < 1e-9


def test_scoring_plan_is_codegen_projection(spark, labeled):
    w = train_quality_model(labeled, "y", sample_fraction=0.5)
    plan = (
        classify_quality(labeled, w)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # map-only: no shuffle


def test_weight_validation(spark, labeled):
    with pytest.raises(ValueError, match="weights"):
        quality_score_expr([1.0, 2.0])
    with pytest.raises(ValueError, match="model"):
        train_quality_model(labeled, "y", model="forest")


def test_learned_gate_plugs_into_curate(spark, labeled):
    """The classifier composes with curate() via extra_gates: junk fails
    the learned gate inside the SAME one-scan pass, the report carries
    its attrition, and clashing names raise."""
    from adampro_spark.pipeline.curate import curate
    from adampro_spark.pipeline.quality import quality_score_expr, train_quality_model

    w = train_quality_model(labeled, "y")
    corpus = labeled.select("doc_id", "text")
    out, report = curate(
        corpus, langs=None, min_tokens=0, min_quality=0.0, dedup=None,
        extra_gates={"_ml_ok": quality_score_expr(w) < 0.5},
    )
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    junk_ids = {r["doc_id"] for r in labeled.filter(F.col("y") == 1.0).collect()}
    assert not (ids & junk_ids)            # every junk doc gated out
    assert report["n_fail_ml_ok"] == len(junk_ids)
    assert report["n_output"] == report["n_input"] - len(junk_ids)

    with pytest.raises(ValueError, match="clash"):
        curate(corpus, dedup=None, extra_gates={"_q_ok": F.lit(True)})


def test_seed_fit_reproduces_pinned_weights(spark):
    """verdict r9 #4: the bundled-seed fit is deterministic and
    quantized at fit time — it must reproduce the pinned constant the
    SQL mirrors embed, and separate the seed set perfectly at the 0.5
    threshold."""
    from adampro_spark.pipeline.quality import (
        QUALITY_SEED_EXAMPLES,
        QUALITY_SEED_WEIGHTS,
        fit_quality_seed,
    )

    w = fit_quality_seed(spark)
    assert w == QUALITY_SEED_WEIGHTS
    # shuffled input order must not change the fit (sorted collect)
    df = spark.createDataFrame(
        list(reversed(QUALITY_SEED_EXAMPLES)), "text string, label double"
    ).repartition(7)
    assert train_quality_model(df, "label") == QUALITY_SEED_WEIGHTS

    scored = spark.createDataFrame(
        QUALITY_SEED_EXAMPLES, "text string, label double"
    ).select("label", quality_score_expr(w).alias("s"))
    rows = scored.collect()
    # every keep example scores keep; junk recall >= 11/14 (the pinned
    # model's documented ceiling — a 7-feature linear fit)
    assert all(r["s"] < 0.5 for r in rows if r["label"] == 0.0)
    junk = [r for r in rows if r["label"] == 1.0]
    assert sum(1 for r in junk if r["s"] >= 0.5) >= len(junk) - 3


def test_curate_quality_weights_gate(spark, labeled):
    """verdict r9 #4: curate(quality_weights=...) is first-class sugar —
    same behavior as the hand-built extra gate, report key n_fail_mlq_ok,
    clash with an explicit _mlq_ok raises."""
    from adampro_spark.pipeline.curate import curate
    from adampro_spark.pipeline.quality import QUALITY_SEED_WEIGHTS

    corpus = labeled.select("doc_id", "text")
    out, report = curate(
        corpus, langs=None, min_tokens=0, min_quality=0.0, dedup=None,
        quality_weights=QUALITY_SEED_WEIGHTS,
    )
    want, wreport = curate(
        corpus, langs=None, min_tokens=0, min_quality=0.0, dedup=None,
        extra_gates={
            "_mlq_ok": quality_score_expr(QUALITY_SEED_WEIGHTS) < 0.5
        },
    )
    a = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in want.select("doc_id").collect())
    assert a == b
    assert report["n_fail_mlq_ok"] == wreport["n_fail_mlq_ok"] > 0
    # the fixture's long repetitive junk is exactly what the long seed
    # examples exist to catch — all of it must fail the learned gate
    junk_ids = {r["doc_id"] for r in labeled.filter(F.col("y") == 1.0).collect()}
    assert not (set(a) & junk_ids)

    with pytest.raises(ValueError, match="_mlq_ok"):
        curate(
            corpus, dedup=None, quality_weights=QUALITY_SEED_WEIGHTS,
            extra_gates={"_mlq_ok": F.lit(True)},
        )


# ---------------------------------------------------------------------------
# round 8: the complete Gopher A1.1 repetition table
# ---------------------------------------------------------------------------


def test_extended_repetition_matches_bruteforce(spark):
    """All nine extended signals (paragraph dups, top-3/4-gram coverage,
    dup-{5..10}-gram char coverage with overlaps counted once) match a
    python brute force, including empty/NULL/short docs."""
    import re
    from collections import Counter

    from adampro_spark.pipeline.text import text_stats

    docs = [
        (1, "a b c d e f g h i j"),
        (2, "x y z w v x y z w v x y z w v extra tail words here"),
        (3, "p1 line\n\np2 para\n\np2 para\n\nshort"),
        (4, "one two one two one two one two one two"),
        (5, ""),
        (6, None),
        (7, "lone"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in text_stats(df, repetition="full").collect()
    }

    def toks(t):
        return [w for w in re.split(r"\s+", (t or "").lower()) if w]

    def grams(tk, n):
        return (
            [" ".join(tk[i:i + n]) for i in range(len(tk) - n + 1)]
            if len(tk) >= n
            else []
        )

    def cov_frac(tk, n):
        gs = grams(tk, n)
        c = Counter(gs)
        covered = set()
        for i, g in enumerate(gs):
            if c[g] >= 2:
                covered.update(range(i, i + n))
        tot = sum(len(w) for w in tk)
        return (
            round(sum(len(tk[p]) for p in covered) / tot, 4) if tot else 0.0
        )

    for i, t in docs:
        tk, ps = toks(t), [p for p in (t or "").split("\n\n") if p]
        got = out[i]
        want_dpf = round(1 - len(set(ps)) / len(ps), 4) if ps else 0.0
        assert got["dup_para_frac"] == pytest.approx(want_dpf, abs=1e-6), i
        pcnt, pc = Counter(ps), sum(len(p) for p in ps)
        want_dpc = (
            round(sum(len(p) for p in ps if pcnt[p] > 1) / pc, 4) if pc else 0.0
        )
        assert got["dup_para_char_frac"] == pytest.approx(want_dpc, abs=1e-6), i
        for n in (3, 4):
            gs = grams(tk, n)
            if gs and t:
                cnt = Counter(gs)
                g, c = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
                want = round(min(c * len(g) / len(t), 1.0), 4)
            else:
                want = 0.0
            assert got[f"top_{n}gram_char_frac"] == pytest.approx(
                want, abs=1e-6
            ), (i, n)
        for n in range(5, 11):
            assert got[f"dup_{n}gram_char_frac"] == pytest.approx(
                cov_frac(tk, n), abs=1e-6
            ), (i, n)


def test_gopher_repetition_ceilings_in_curate(spark):
    """curate(repetition_ceilings=GOPHER_REPETITION_CEILINGS) drops the
    pathologically repetitive documents in the one-scan gate pass and
    counts them; unknown signal names raise."""
    import numpy as np

    from adampro_spark.pipeline.curate import (
        GOPHER_REPETITION_CEILINGS,
        curate,
    )

    rng = np.random.RandomState(23)
    vocab = [f"w{i}" for i in range(300)]
    good = [
        (i, " ".join(rng.choice(vocab, size=40))) for i in range(12)
    ]
    bad = [
        (100, " ".join(["spam ham eggs toast jam bread"] * 12)),  # dup 6-grams
        (101, ("para one unique\n\n" + "same para\n\n" * 6).strip()),  # dup paras
    ]
    df = spark.createDataFrame(good + bad, "doc_id long, text string")
    out, rep = curate(
        df, langs=None, min_tokens=5, min_quality=0.0, dedup=None,
        repetition_ceilings=GOPHER_REPETITION_CEILINGS,
    )
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert {100, 101}.isdisjoint(kept)
    assert kept == {i for i, _ in good}
    assert rep["n_repetitive"] == 2
    # regression guards (round 8), both observed in the wild:
    # 1. a chained gram-hash staging once collapsed into a 365 MB task
    #    binary here (exponential expression duplication through
    #    CollapseProject) and OOMed the JVM — the plan must stay
    #    linear-sized;
    # 2. without text.pushdown_barrier on _rep_ok, filter pushdown
    #    substituted the staged gram projections into each other's
    #    lambdas (an interpreted O(T^3) plan: 20 real documents took
    #    minutes) — the staged columns must SURVIVE as attributes in
    #    the optimized kept plan instead of being inlined away
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    assert "_rep_sg5" in opt and "_rep_th" in opt
    assert len(out._jdf.queryExecution().executedPlan().toString()) < 3_000_000
    # 3. (review finding) the ND project blocks pushdown for EVERY
    #    conjunct, so the kept path must apply cheap gates as a SEPARATE
    #    filter BELOW the staging: two Filter nodes, and the bottom one
    #    (last in the top-down plan string) free of repetition columns
    filters = [
        ln for ln in opt.splitlines() if ln.lstrip().startswith("+- Filter")
        or ln.lstrip().startswith("Filter")
    ]
    assert len(filters) >= 2, opt[:2000]
    assert "_rep_" not in filters[-1]

    with pytest.raises(ValueError, match="unknown repetition signals"):
        curate(
            df, dedup=None, repetition_ceilings={"no_such_signal": 0.5},
        )


def test_span_dedup_pre_stage_in_curate(spark):
    """curate(span_dedup_min_docs=...) cuts shared >= span_n-token spans
    BEFORE the gates (the Lee et al. composition): a doc that is mostly
    one shared span fails the token floor after the cut, unique docs
    survive with their text intact, and the report counts the removed
    tokens via the one-scan aggregate."""
    import numpy as np

    from adampro_spark.pipeline.curate import curate

    rng = np.random.RandomState(11)
    vocab = [f"u{i}" for i in range(400)]
    span = " ".join(f"s{i}" for i in range(10))  # the shared 10-gram
    uniq = [(i, " ".join(rng.choice(vocab, size=30))) for i in range(8)]
    # carriers: unique prefix + the shared span (span survives min_docs)
    carriers = [
        (100 + j, " ".join(rng.choice(vocab, size=25)) + " " + span)
        for j in range(3)
    ]
    # mostly-span doc: 4 unique tokens + the span -> dies at min_tokens=20
    husk = [(200, "a1 b2 c3 d4 " + span)]
    df = spark.createDataFrame(
        uniq + carriers + husk, "doc_id long, text string"
    )
    out, rep = curate(
        df, langs=None, min_tokens=20, min_quality=0.0, dedup=None,
        span_dedup_min_docs=2, span_n=10,
    )
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    # unique docs untouched; carriers survive (25 tokens) with span cut
    for i, t in uniq:
        assert rows[i] == t, i
    for j in range(3):
        assert 100 + j in rows
        assert "s0" not in rows[100 + j]
    assert 200 not in rows  # husk fell below the token floor post-cut
    # 4 docs x 10 span tokens removed
    assert rep["n_span_tokens_removed"] == 40
    assert rep["n_short"] == 1


def test_pushdown_barrier_nd_disjunct_is_load_bearing(spark, monkeypatch):
    """verdict r8 #7 — Spark-version canary: pushdown_barrier encodes
    optimizer behavior (PushPredicateThroughNonJoin's determinism gate
    on Project fields).  This asserts the ND disjunct is still DOING
    something: with the barrier patched out, the optimizer must inline
    the staged gram projections into the gate (the O(T^3) plan the
    barrier exists to prevent).  If THIS test fails after a Spark
    upgrade, the optimizer changed — re-measure pushdown_barrier
    (pipeline/text.py) before trusting either plan shape, and consider
    the documented localCheckpoint fallback if the barrier stopped
    blocking substitution."""
    import adampro_spark.pipeline.text as tmod
    from adampro_spark.pipeline.curate import (
        GOPHER_REPETITION_CEILINGS,
        curate,
    )

    # one tiny doc: the degraded plan still EXECUTES here (the report
    # aggregate runs it), so keep T small — the assertion is on the
    # compiled plan, not the runtime
    df = spark.createDataFrame(
        [(1, "hello world one two three four five six seven eight " * 4)],
        "doc_id long, text string",
    )
    monkeypatch.setattr(tmod, "pushdown_barrier", lambda flag: flag)
    out, _ = curate(
        df, langs=None, min_tokens=1, min_quality=0.0, dedup=None,
        repetition_ceilings=GOPHER_REPETITION_CEILINGS,
    )
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    # staged attributes inlined away => the disjunct is load-bearing
    assert "_rep_sg5" not in opt


def test_stream_curate_quality_weights_matches_batch(spark, labeled, tmp_path):
    """round 10: the learned quality gate streams — stream_curate
    (quality_weights=) over micro-batched files keeps exactly batch
    curate(quality_weights=)'s survivors."""
    from adampro_spark.pipeline.curate import curate
    from adampro_spark.pipeline.quality import QUALITY_SEED_WEIGHTS
    from adampro_spark.streaming.ingest import stream_curate

    corpus = labeled.select("doc_id", "text")
    src = str(tmp_path / "qsrc")
    corpus.write.parquet(src)
    want, _rep = curate(
        corpus, langs=None, min_tokens=0, min_quality=0.0, dedup=None,
        quality_weights=QUALITY_SEED_WEIGHTS,
    )
    want_ids = sorted(r["doc_id"] for r in want.select("doc_id").collect())

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    gated = stream_curate(
        stream, langs=None, min_tokens=0, min_quality=0.0, dedup=None,
        quality_weights=QUALITY_SEED_WEIGHTS,
    )
    sink = str(tmp_path / "qsink")
    q = gated.select("doc_id").writeStream.format("parquet").option(
        "path", sink
    ).option("checkpointLocation", str(tmp_path / "qchk")).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    got_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(sink).collect()
    )
    assert got_ids == want_ids
