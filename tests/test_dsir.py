"""DSIR importance resampling (pipeline/dsir.py): the hashed-ngram fit
vs an exact Python mirror, weight direction on planted corpora, and the
deterministic Gumbel top-k selection."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from adampro_spark.pipeline.dsir import dsir_resample, dsir_weights, fit_dsir
from adampro_spark.pipeline.text import HASH_P

_MIX_A = 961_748_941
_MIX_B = 787


def _poly(s: str) -> int:
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) % HASH_P
    return h


def _features(text: str, n_buckets: int, bigrams: bool = True) -> list[int]:
    toks = [t for t in text.lower().split() if t]
    th = [_poly(t) for t in toks]
    out = [h % n_buckets for h in th]
    if bigrams:
        out += [
            ((th[i] * 31 + th[i + 1]) % HASH_P) % n_buckets
            for i in range(len(th) - 1)
        ]
    return out


def _unit(pk: int, salt: str) -> float:
    h = _poly(f"{salt}|{pk}")
    return ((h * _MIX_A + _MIX_B) % HASH_P) / HASH_P


TARGETY = "the quick brown fox jumps over the lazy dog near the river bank"
RAWY = "buy cheap pills online now click here casino bonus jackpot winner"


@pytest.fixture(scope="module")
def corpora(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    t_words = TARGETY.split()
    r_words = RAWY.split()
    raw = []
    for i in range(40):
        words = t_words if i % 2 == 0 else r_words
        raw.append((i, " ".join(rng.choice(words, size=30))))
    raw.append((98, ""))  # empty doc: weight 0.0, never crashes
    raw.append((99, None))  # NULL doc: same
    target = [
        (1000 + i, " ".join(rng.choice(t_words, size=30))) for i in range(10)
    ]
    raw_df = spark.createDataFrame(raw, "doc_id long, text string")
    tgt_df = spark.createDataFrame(target, "doc_id long, text string")
    return raw_df, tgt_df, raw, target


def test_fit_and_weights_match_python_mirror(spark, corpora):
    raw_df, tgt_df, raw, target = corpora
    B = 64
    buckets, meta = fit_dsir(raw_df, tgt_df, n_buckets=B)

    # exact mirror of the fit
    from collections import Counter

    rc: Counter = Counter()
    for _pk, t in raw:
        rc.update(_features(t or "", B))
    tc: Counter = Counter()
    for _pk, t in target:
        tc.update(_features(t or "", B))
    n_r, n_t = sum(rc.values()), sum(tc.values())
    assert meta["n_raw"] == n_r and meta["n_target"] == n_t
    want_ratio = {
        b: math.log10((tc.get(b, 0) + 1) / (n_t + B))
        - math.log10((rc.get(b, 0) + 1) / (n_r + B))
        for b in set(rc) | set(tc)
    }
    got_ratio = {r["bucket"]: r["log_ratio"] for r in buckets.collect()}
    assert set(got_ratio) == set(want_ratio)
    for b, v in want_ratio.items():
        assert got_ratio[b] == pytest.approx(v, rel=1e-12), b
    default = math.log10(1 / (n_t + B)) - math.log10(1 / (n_r + B))
    assert meta["default_log_ratio"] == pytest.approx(default, rel=1e-12)

    # weights: every document, including empty/NULL, exactly mirrored
    w = {
        r["doc_id"]: (r["dsir_logweight"], r["dsir_feats"])
        for r in dsir_weights(raw_df, buckets, meta).collect()
    }
    assert set(w) == {pk for pk, _ in raw}
    for pk, t in raw:
        feats = _features(t or "", B)
        want = sum(want_ratio.get(b, default) for b in feats)
        assert w[pk][0] == pytest.approx(want, rel=1e-9, abs=1e-12), pk
        assert w[pk][1] == len(feats), pk


def test_weights_separate_targety_from_rawy(spark, corpora):
    raw_df, tgt_df, raw, _target = corpora
    buckets, meta = fit_dsir(raw_df, tgt_df, n_buckets=256)
    w = {
        r["doc_id"]: r["dsir_logweight"]
        for r in dsir_weights(raw_df, buckets, meta).collect()
    }
    targety = [w[pk] for pk, t in raw if t and pk % 2 == 0]
    rawy = [w[pk] for pk, t in raw if t and pk % 2 == 1]
    # every target-like doc outweighs every spam-like doc
    assert min(targety) > max(rawy)


def test_resample_is_deterministic_gumbel_topk(spark, corpora):
    raw_df, tgt_df, raw, _target = corpora
    B = 64
    buckets, meta = fit_dsir(raw_df, tgt_df, n_buckets=B)
    k, seed = 8, 13
    sel = dsir_resample(raw_df, buckets, meta, k=k, seed=seed)
    got = {r["doc_id"] for r in sel.select("doc_id").collect()}
    assert len(got) == k
    # selected rows carry the original columns plus the weight
    assert set(sel.columns) == {"doc_id", "text", "dsir_logweight"}

    # exact mirror of the key: ln(10)·logweight - ln(-ln(u))
    w = {
        r["doc_id"]: r["dsir_logweight"]
        for r in dsir_weights(raw_df, buckets, meta).collect()
    }
    keys = {}
    for pk in w:
        u = max(_unit(pk, f"dsir|{seed}"), 1e-12)
        keys[pk] = w[pk] * math.log(10.0) - math.log(-math.log(u))
    want = set(sorted(keys, key=lambda p: (-keys[p], p))[:k])
    assert got == want

    # rerun after a repartition: identical selection
    got2 = {
        r["doc_id"]
        for r in dsir_resample(
            raw_df.repartition(7), buckets, meta, k=k, seed=seed
        ).select("doc_id").collect()
    }
    assert got2 == got
    # a different seed moves the sample (overwhelmingly likely)
    got3 = {
        r["doc_id"]
        for r in dsir_resample(raw_df, buckets, meta, k=k, seed=seed + 1)
        .select("doc_id").collect()
    }
    assert got3 != got


def test_weight_col_matches_join_path(spark, corpora):
    """The map-only closure scorer (stream-safe form) mirrors the
    explode+broadcast-join path term by term."""
    from adampro_spark.pipeline.dsir import dsir_weight_col

    raw_df, tgt_df, raw, _target = corpora
    buckets, meta = fit_dsir(raw_df, tgt_df, n_buckets=64)
    want = {
        r["doc_id"]: r["dsir_logweight"]
        for r in dsir_weights(raw_df, buckets, meta).collect()
    }
    got = {
        r["doc_id"]: r["w"]
        for r in raw_df.select(
            "doc_id", dsir_weight_col(buckets, meta).alias("w")
        ).collect()
    }
    assert set(got) == set(want)
    for pk, v in want.items():
        assert got[pk] == pytest.approx(v, rel=1e-12, abs=1e-12), pk


def test_weight_col_as_curate_gate(spark, corpora):
    """dsir_weight_col plugs into curate's extra_gates (one-scan pass)
    and into stream_curate, with identical survivors."""
    from adampro_spark.pipeline.curate import curate
    from adampro_spark.pipeline.dsir import dsir_weight_col

    raw_df, tgt_df, raw, _target = corpora
    buckets, meta = fit_dsir(raw_df, tgt_df, n_buckets=256)
    w = {
        r["doc_id"]: r["dsir_logweight"]
        for r in dsir_weights(raw_df, buckets, meta).collect()
    }
    # floor above the empty-doc weight (0.0): curate's other gates drop
    # NULL-text rows via NULL flag propagation regardless of this gate,
    # so a floor admitting weight-0.0 docs would conflate the two
    floor = min(v for v in w.values() if v > 0)
    gate = {"_dsir_ok": dsir_weight_col(buckets, meta) >= F.lit(floor)}
    kept, rep = curate(
        raw_df, langs=None, min_tokens=0, min_quality=0.0, dedup=None,
        extra_gates=gate,
    )
    got = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert got == {pk for pk, v in w.items() if v >= floor}
    assert rep["n_fail_dsir_ok"] == len(w) - len(got)


def test_weight_col_gate_streams(spark, corpora, tmp_path):
    """dsir_weight_col is stateless, so stream_curate(extra_gates=...)
    filters micro-batches identically to batch curate — the same
    batch≡stream contract as the compression and LM gates."""
    from adampro_spark.pipeline.curate import curate
    from adampro_spark.pipeline.dsir import dsir_weight_col
    from adampro_spark.streaming.ingest import stream_curate

    raw_df, tgt_df, raw, _target = corpora
    buckets, meta = fit_dsir(raw_df, tgt_df, n_buckets=256)
    w = dsir_weights(raw_df, buckets, meta).collect()
    floor = min(r["dsir_logweight"] for r in w if r["dsir_logweight"] > 0)
    gate = {"_dsir_ok": dsir_weight_col(buckets, meta) >= F.lit(floor)}
    kw = dict(langs=None, min_tokens=0, min_quality=0.0, dedup=None)
    batch_out, _ = curate(raw_df, extra_gates=gate, **kw)
    want = {r["doc_id"] for r in batch_out.select("doc_id").collect()}
    assert want  # non-degenerate

    src = str(tmp_path / "dsir_src")
    raw_df.repartition(2).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    gated = stream_curate(stream, extra_gates=gate, **kw).select("doc_id")
    q = (
        gated.writeStream.format("memory")
        .queryName("dsir_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_dsir"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]
        for r in spark.sql("SELECT doc_id FROM dsir_stream").collect()
    }
    assert got == want


def test_resample_plans_as_takeordered(spark, corpora):
    raw_df, tgt_df, *_ = corpora
    buckets, meta = fit_dsir(raw_df, tgt_df, n_buckets=64)
    sel = dsir_resample(raw_df, buckets, meta, k=5)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no global sort for top-k
    with pytest.raises(ValueError):
        dsir_resample(raw_df, buckets, meta, k=0)
    with pytest.raises(ValueError):
        fit_dsir(raw_df, tgt_df, n_buckets=1)
    with pytest.raises(ValueError):
        dsir_resample(raw_df, buckets, meta, k=5, mode="nope")


def test_resample_threshold_mode_tracks_exact(spark, corpora):
    """The scale path: approxQuantile cutoff + map-only filter selects
    ~k rows whose membership agrees with the exact top-k up to the
    quantile sketch's rank error (tight at this size)."""
    raw_df, tgt_df, raw, _target = corpora
    buckets, meta = fit_dsir(raw_df, tgt_df, n_buckets=64)
    k = 10
    exact = {
        r["doc_id"]
        for r in dsir_resample(raw_df, buckets, meta, k=k)
        .select("doc_id").collect()
    }
    approx = {
        r["doc_id"]
        for r in dsir_resample(
            raw_df, buckets, meta, k=k, mode="threshold",
            relative_error=1e-6,
        ).select("doc_id").collect()
    }
    # at relative_error ~ 0 on 42 rows the sketch is rank-exact; the
    # >=-cutoff filter may keep the boundary row too (the documented
    # ~k semantics), never fewer than the true top-k
    assert exact <= approx
    assert k <= len(approx) <= k + 1
    # no TakeOrdered / global Sort of the full corpus in the plan
    plan = (
        dsir_resample(raw_df, buckets, meta, k=k, mode="threshold")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" not in plan
    # k >= n degenerates to "keep everything scoreable"
    all_rows = dsir_resample(
        raw_df, buckets, meta, k=10_000, mode="threshold"
    )
    assert all_rows.count() == len(raw)


def test_resample_auto_routes_by_k(spark, corpora, monkeypatch):
    """verdict r8 #8: mode='auto' (the default) must pick the exact
    Gumbel top-k under DSIR_EXACT_MAX_K and the threshold path past it
    — same results as the explicit modes, no driver-converged k-sized
    selection on the big route."""
    import adampro_spark.pipeline.dsir as dmod

    raw_df, tgt_df, *_ = corpora
    buckets, meta = fit_dsir(raw_df, tgt_df, n_buckets=64)

    auto = dsir_resample(raw_df, buckets, meta, k=5)  # default auto
    exact = dsir_resample(raw_df, buckets, meta, k=5, mode="exact")
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(map(key, auto.collect())) == sorted(map(key, exact.collect()))
    assert "TakeOrderedAndProject" in (
        auto._jdf.queryExecution().executedPlan().toString()
    )

    monkeypatch.setattr(dmod, "DSIR_EXACT_MAX_K", 3)
    big = dsir_resample(raw_df, buckets, meta, k=5, relative_error=1e-6)
    thr = dsir_resample(
        raw_df, buckets, meta, k=5, mode="threshold", relative_error=1e-6
    )
    assert sorted(map(key, big.collect())) == sorted(map(key, thr.collect()))
    assert "TakeOrderedAndProject" not in (
        big._jdf.queryExecution().executedPlan().toString()
    )


def test_at_scale_preset_curate_dsir_bucket_end_to_end(spark, corpora):
    """verdict r8 #8 'done' gate: the documented at-scale pipeline —
    curate -> dsir_resample(auto) -> lm_bucket(auto) — runs end to end
    with every route self-selected, producing gated, resampled,
    bucketed documents."""
    from adampro_spark.pipeline.curate import curate
    from adampro_spark.pipeline.lm import fit_unigram_lm, lm_bucket

    raw_df, tgt_df, *_ = corpora
    gated, rep = curate(
        raw_df, langs=None, min_tokens=5, min_quality=0.0, dedup=None
    )
    buckets, meta = fit_dsir(gated, tgt_df, n_buckets=64)
    picked = dsir_resample(gated, buckets, meta, k=12)
    assert picked.count() == 12
    vocab, lmeta = fit_unigram_lm(tgt_df, vocab_size=64)
    out = lm_bucket(picked, vocab, lmeta)
    rows = out.collect()
    assert len(rows) == 12
    got_buckets = {r["bucket"] for r in rows}
    assert got_buckets <= {"head", "middle", "tail", None}
    assert {"head", "tail"} <= got_buckets  # the split actually split
