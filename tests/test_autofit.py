"""Build-time frac auto-fitting (index/autofit.py — round-7 verdict #1:
planner-fitted candidate fractions are the DEFAULT, not opt-in).

Three contracts:
  * PARITY — the numpy simulation admits exactly the candidate set the
    real Spark scans admit (corpus == sample, budget pinned), so the fit
    cannot silently drift from the scan implementations;
  * FIT FIRES where the data allows — on a clustered corpus the fitted
    default probes far less than DEFAULT_FRAC at recall ≈ 1.0;
  * RECALL-SAFE where it doesn't — on unclusterable data the curve never
    reaches the target/knee and the default stays DEFAULT_FRAC.
"""

import numpy as np
import pytest

from adampro_spark import index as IX
from adampro_spark.index._util import DEFAULT_FRAC, resolve_frac
from adampro_spark.index.autofit import autofit_meta, simulate_candidates
from adampro_spark.operators.scan import sequential_scan as seq


@pytest.fixture(scope="module")
def corpus(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").orderBy(
        "vec_id"
    )
    rows = emb.collect()
    S = np.array([r["embedding"] for r in rows], dtype=np.float64)
    # pk == row index so candidate sets compare directly with sim indices
    df = spark.createDataFrame(
        [(i, [float(x) for x in S[i]]) for i in range(len(S))],
        "rid long, embedding array<double>",
    ).cache()
    return df, S


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.RandomState(0)
    centers = rng.standard_normal((50, 16)) * 10
    X = np.concatenate([c + rng.standard_normal((40, 16)) * 0.5 for c in centers])
    # float32 column: matches the entity "vector" attribute type so the
    # plan_knn test can insert this frame into a catalog entity
    X = X.astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "rid long, embedding array<float>",
    ).cache()
    return df, X


B = 100  # pinned absolute budget for parity (times_k=0 disables the floor)


def _parity(kind, idx, meta, S, q, real_scan):
    real = {r["rid"] for r in real_scan().collect()}
    sim = set(simulate_candidates(kind, meta, S, q, B).tolist())
    assert sim == real, (kind, len(sim), len(real), len(sim & real))


def test_parity_sh(spark, corpus):
    df, S = corpus
    q = S[7]
    idx, meta = IX.build_sh(df, "embedding", pk="rid", ntraining=len(S), autofit=False)
    from adampro_spark.index.sh import scan_sh

    _parity("sh", idx, meta, S, q,
            lambda: scan_sh(idx, meta, list(q), k=1, times_k=0, frac=B / len(S)))


def test_parity_pq(spark, corpus):
    df, S = corpus
    q = S[7]
    idx, meta = IX.build_pq(df, "embedding", pk="rid", ntraining=len(S), autofit=False)
    from adampro_spark.index.pq import scan_pq

    _parity("pq", idx, meta, S, q,
            lambda: scan_pq(idx, meta, list(q), k=1, times_k=0, frac=B / len(S)))


def test_parity_ecp(spark, corpus):
    df, S = corpus
    q = S[7]
    idx, meta = IX.build_ecp(
        df, "embedding", pk="rid", distance_name="euclidean", autofit=False
    )
    from adampro_spark.index.ecp import scan_ecp

    _parity("ecp", idx, meta, S, q,
            lambda: scan_ecp(idx, meta, list(q), k=1, times_k=0, frac=B / len(S)))


def test_parity_mi(spark, corpus):
    df, S = corpus
    q = S[7]
    idx, meta = IX.build_mi(
        df, "embedding", pk="rid", distance_name="euclidean", autofit=False
    )
    from adampro_spark.index.mi import scan_mi

    _parity("mi", idx, meta, S, q, lambda: scan_mi(idx, meta, list(q), B))


def test_parity_ivfpq(spark, corpus):
    df, S = corpus
    q = S[7]
    idx, meta = IX.build_ivfpq(
        df, "embedding", pk="rid", ntraining=len(S), autofit=False
    )
    from adampro_spark.index.ivfpq import scan_ivfpq

    _parity("ivfpq", idx, meta, S, q,
            lambda: scan_ivfpq(idx, meta, list(q), k=1, times_k=0, frac=B / len(S)))


def test_fit_fires_on_clustered_corpus(spark, clustered):
    """Where the data has cluster structure the fitted default probes FAR
    less than the fixed 20% — the whole point of verdict r7 #1 — and the
    default scan keeps recall ≈ 1.0."""
    df, X = clustered
    q = [float(x) for x in X[3]]
    truth = {r["rid"] for r in seq(df, "embedding", q, 20, "euclidean", pk="rid").collect()}
    for kind, build, knn, bkw in [
        ("ecp", IX.build_ecp,
         lambda *a, **kv: IX.ecp_knn(*a, "euclidean", **kv),
         {"distance_name": "euclidean"}),
        ("pq", IX.build_pq,
         lambda *a, **kv: IX.pq_knn(*a, "euclidean", **kv), {}),
        ("ivfpq", IX.build_ivfpq,
         lambda *a, **kv: IX.ivfpq_knn(*a, "euclidean", **kv), {}),
    ]:
        idx, meta = build(df, "embedding", pk="rid", **bkw)
        assert meta["fitted_frac"] <= 0.05, (kind, meta["frac_curve"])
        got = {r["rid"] for r in knn(df, "embedding", idx, meta, q, 20).collect()}
        assert len(got & truth) / 20 >= 0.95, kind


def test_fit_stays_safe_on_unclusterable_corpus(spark, corpus):
    """The sf testdata embeddings are near-random: recall climbs all the
    way to DEFAULT_FRAC, so the fit must NOT pick a cheaper frac (the
    knee/target criterion refuses) — the old default is the ceiling."""
    df, S = corpus
    idx, meta = IX.build_ecp(df, "embedding", pk="rid", distance_name="euclidean")
    assert meta["fitted_frac"] == DEFAULT_FRAC, meta["frac_curve"]
    curve = meta["frac_curve"]
    assert [f for f, _ in curve] == sorted(f for f, _ in curve)
    # curve is (weakly) monotone in frac — more probe never hurts recall
    recalls = [r for _, r in curve]
    assert all(b >= a - 0.02 for a, b in zip(recalls, recalls[1:]))


def test_resolve_frac_uses_fitted(spark):
    assert resolve_frac("auto", {"fitted_frac": 0.05}) == 0.05
    assert resolve_frac("auto", {}) == DEFAULT_FRAC
    assert resolve_frac("auto", None) == DEFAULT_FRAC
    assert resolve_frac(0.5, {"fitted_frac": 0.05}) == 0.5  # explicit wins
    assert resolve_frac(None, {"fitted_frac": 0.05}) is None


def test_autofit_meta_skips_tiny_samples():
    meta = {"type": "pq", "bounds": [[0, 2]], "codebooks": [[[0.0, 0.0]]], "n": 10_000}
    out = autofit_meta("pq", meta, np.zeros((10, 2)))
    assert "fitted_frac" not in out and "frac_curve" not in out


def test_plan_knn_uses_build_time_curve(spark, clustered, tmp_path):
    """plan_knn(min_recall=…) must consume the build-time frac_curve when
    no train_planner sweep exists: a reachable floor routes to the lossy
    index with its cheapest adequate frac; an unreachable floor (1.01 —
    impossible) rejects the lossy path and falls back to sequential."""
    from adampro_spark.ops import AdamOps

    df, X = clustered
    ops = AdamOps(spark, str(tmp_path / "cat"))
    ops.entity.create("e", [("rid", "long"), ("embedding", "vector")])
    ops.entity.insert("e", df)
    ops.index.create("e_ecp", "e", "embedding", "ecp", pk="rid")
    rec = ops.catalog.index("e_ecp")
    assert rec["meta"].get("frac_curve"), "persisted index must carry the fit"

    from adampro_spark.ops import plan_knn

    plan = plan_knn(ops.catalog, "e", "embedding", "euclidean",
                    hints=("approximate",), min_recall=0.9)
    assert plan.path == "e_ecp"
    assert plan.frac is not None and plan.frac <= 0.05, plan

    plan2 = plan_knn(ops.catalog, "e", "embedding", "euclidean",
                     hints=("approximate",), min_recall=1.01)
    assert plan2.path == "sequential", plan2.reasons


def test_lsh_noq_fit_parity_and_behavior(spark, corpus, clustered):
    """LSH probe-count fit: the simulation admits EXACTLY scan_lsh's
    candidate set at every probe count; the fitted default is recall-
    equivalent to the max swept probes on clustered data; and the scan's
    default uses the fitted value."""
    from adampro_spark.index.autofit import (
        MAX_NOQ,
        autofit_lsh_meta,
        simulate_lsh_candidates,
    )
    from adampro_spark.index.lsh import scan_lsh

    df, S = corpus
    q = S[7]
    idx, meta = IX.build_lsh(
        df, "embedding", pk="rid", distance_name="euclidean", autofit=False
    )
    for noq in (0, 3, MAX_NOQ):
        real = {
            r["rid"] for r in scan_lsh(idx, meta, list(q), k=1, num_of_q=noq).collect()
        }
        sim = set(simulate_lsh_candidates(meta, S, q, noq).tolist())
        assert sim == real, noq

    # the curve is persisted and the fitted probe count is measured
    autofit_lsh_meta(meta, S, "euclidean")
    assert meta["fitted_num_of_q"] in range(MAX_NOQ + 1)
    curve = meta["noq_curve"]
    assert len(curve) == MAX_NOQ + 1
    # recall weakly increases with probes; candidate volume too
    recalls = [r for _j, r, _v in curve]
    vols = [v for _j, _r, v in curve]
    assert all(b >= a - 1e-9 for a, b in zip(recalls, recalls[1:]))
    assert all(b >= a - 1e-9 for a, b in zip(vols, vols[1:]))
    # the fitted count reaches the knee: within eps of the max-probe recall
    from adampro_spark.index.autofit import KNEE_EPS

    fitted_recall = recalls[meta["fitted_num_of_q"]]
    assert fitted_recall >= min(0.95, recalls[-1] - KNEE_EPS)

    # scan default (num_of_q=None) consumes the fitted value: candidate
    # count equals an explicit scan at the fitted probe count
    real_default = scan_lsh(idx, meta, list(q), k=1).count()
    real_fitted = scan_lsh(
        idx, meta, list(q), k=1, num_of_q=meta["fitted_num_of_q"]
    ).count()
    assert real_default == real_fitted
