"""Learned planner heuristics (ml.py + ops.train_planner svm/lr modes).

Parity: utils/ml/PegasosSVM.scala:24-86, utils/ml/Regression.scala:28-120,
SVMPlannerHeuristics.scala:29-120, RegressionPlannerHeuristics.scala:28-80.
"""

import numpy as np
import pytest

from adampro_spark.ml import (
    LinearModel,
    PegasosSVM,
    TrainingSample,
    build_features,
    load_model,
)
from adampro_spark.ops import AdamOps, plan_knn, train_planner

SF = "/root/testdata/sf0.001"
Q = [round(0.1 * ((i * 7) % 13) - 0.5, 4) for i in range(64)]


# ---------------------------------------------------------------------------
# model units (driver-side, no Spark)
# ---------------------------------------------------------------------------


def test_linear_model_recovers_exact_fit():
    rng = np.random.RandomState(0)
    w_true = np.array([0.5, 2.0, -1.0])
    X = rng.rand(50, 3)
    data = [TrainingSample(x, float(x @ w_true)) for x in X]
    m = LinearModel()
    m.train(data)
    assert np.allclose(m.w, w_true, atol=1e-5)
    assert m.test(np.array([1.0, 1.0, 1.0])) == pytest.approx(1.5, abs=1e-5)


def test_linear_model_constant_features_predict_mean():
    # single-training-query case: all features identical -> prediction is
    # the mean measured time (ridge LS limit), not a degenerate blowup
    f = build_features(1000, 64, 10)
    data = [TrainingSample(f, t) for t in (1.0, 2.0, 3.0)]
    m = LinearModel()
    m.train(data)
    assert m.test(f) == pytest.approx(2.0, rel=1e-4)


def test_pegasos_svm_converges_toward_target():
    # constant features, constant target: w.f must approach the target
    # (epsilon-insensitive: stops within eps)
    f = np.array([1.0, 0.5])
    data = [TrainingSample(f, 2.0)] * 40
    m = PegasosSVM(dims=2, epsilon=0.01, seed=1)
    m.train(data)
    assert m.test(f) == pytest.approx(2.0, abs=0.3)


def test_pegasos_svm_ranks_two_paths():
    # the planner only needs ORDER: a slow path's prediction must exceed a
    # fast path's when trained on separate models with the same features
    f = build_features(10_000, 64, 10)
    fast = PegasosSVM(dims=len(f), seed=2)
    slow = PegasosSVM(dims=len(f), seed=2)
    fast.train([TrainingSample(f, 0.05)] * 30)
    slow.train([TrainingSample(f, 1.5)] * 30)
    assert fast.test(f) < slow.test(f)


def test_model_weights_roundtrip():
    f = np.array([1.0, 2.0])
    m = LinearModel()
    m.train([TrainingSample(f, 3.0), TrainingSample(np.array([2.0, 1.0]), 3.0)])
    again = load_model("lr", m.to_weights())
    assert again.test(f) == pytest.approx(m.test(f))
    s = PegasosSVM(dims=2)
    s.train([TrainingSample(f, 1.0)])
    assert load_model("svm", s.to_weights()).test(f) == pytest.approx(s.test(f))


# ---------------------------------------------------------------------------
# planner lifecycle (Spark)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def ops(spark, tmp_path_factory, emb):
    o = AdamOps(spark, str(tmp_path_factory.mktemp("mlcat")))
    o.index.create_from_df("ml_vaf", "emb", emb, "embedding", "vaf", pk="vec_id")
    o.index.create_from_df("ml_ecp", "emb", emb, "embedding", "ecp", pk="vec_id")
    o.catalog.ensure_entity("emb")
    o.catalog.update_entity("emb", tuple_count=emb.count())
    return o


@pytest.mark.parametrize("heuristic", ["lr", "svm"])
def test_train_and_route(ops, emb, heuristic):
    out = train_planner(
        ops, "emb", "embedding", Q, 10, "euclidean",
        df=emb, pk="vec_id", heuristic=heuristic, nruns=2,
    )
    # one measured row per path, each tagged with its model key
    assert "sequential" in out and out["sequential"]["model"] == "entity"
    assert out["ml_vaf"]["model"] == "index-vaf"

    ent = ops.catalog.entity("emb")
    models = ent["planner_models"][heuristic]
    assert {"entity", "index-vaf", "index-ecp"} <= set(models)

    plan = plan_knn(
        ops.catalog, "emb", "embedding", "euclidean",
        hints=(f"optimized-{heuristic}",), k=10, dims=len(Q),
    )
    # must route SOMEWHERE via the model (never the untrained fallback)
    assert any(f"optimized-{heuristic} ->" in r for r in plan.reasons)
    assert plan.path in {"sequential", "ml_vaf", "ml_ecp"}

    # planned query end-to-end through the facade
    res, plan2 = ops.query.knn(
        "emb", "embedding", Q, 10, "euclidean",
        hints=(f"optimized-{heuristic}",), df=emb, pk="vec_id",
    )
    assert res.count() == 10
    assert plan2.path == plan.path


def test_untrained_kind_falls_through(ops):
    # an entity with no planner_models for the kind -> fallback reason
    plan = plan_knn(
        ops.catalog, "emb", "embedding", "manhattan",
        hints=("optimized-svm", "exact"), k=5, dims=len(Q),
    )
    # svm models exist (trained above) but only conform-usable paths count;
    # manhattan conforms for vaf, so either route or fall through to exact
    assert plan.path != ""


def test_scored_paths_surface_predictions(ops, emb):
    # after svm+lr training (test_train_and_route ran first in this module)
    paths = ops.query.scored_execution_paths(
        "emb", "embedding", "euclidean", k=10, dims=len(Q)
    )
    seq = next(p for p in paths if p["path"] == "sequential")
    vaf = next(p for p in paths if p["path"] == "ml_vaf")
    assert set(seq["predicted_time"]) == {"lr", "svm"}
    assert set(vaf["predicted_time"]) == {"lr", "svm"}
    assert all(isinstance(v, float) for v in seq["predicted_time"].values())


def test_samples_accumulate_across_calls(ops, emb):
    before = len(ops.catalog.entity("emb").get("planner_samples", {}).get("entity", []))
    train_planner(
        ops, "emb", "embedding", Q, 5, "euclidean",
        df=emb, pk="vec_id", heuristic="lr", nruns=1,
    )
    after = len(ops.catalog.entity("emb")["planner_samples"]["entity"])
    assert after == before + 1


# ---------------------------------------------------------------------------
# recall curves + min_recall guard (round-5: two-scale recall harness)
# ---------------------------------------------------------------------------


def test_predict_recall_model():
    from adampro_spark.ops import predict_recall

    assert predict_recall([], 1000) is None
    # at or below the measured scale: the measured value
    assert predict_recall([[1000, 0.9]], 500) == pytest.approx(0.9)
    assert predict_recall([[1000, 0.9]], 1000) == pytest.approx(0.9)
    # scaling up: 1/n decay of the absolute-budget fraction
    assert predict_recall([[1000, 0.9]], 10_000) == pytest.approx(0.09)
    # the largest measured n dominates (closest to the asked scale)
    assert predict_recall([[1000, 0.9], [100_000, 0.8]], 200_000) == pytest.approx(0.4)


def test_naive_training_persists_recall_curves(ops, emb):
    out = train_planner(
        ops, "emb", "embedding", Q, 10, "euclidean",
        df=emb, pk="vec_id", heuristic="naive",
    )
    assert "ml_ecp" in out and 0.0 <= out["ml_ecp"]["recall"] <= 1.0
    curves = ops.catalog.entity("emb")["recall_curves"]
    n = emb.count()
    assert curves["ecp"] and curves["ecp"][-1][0] == n
    assert curves["vaf"][-1][1] == pytest.approx(1.0)  # exact index


def test_scored_paths_surface_predicted_recall(ops, emb):
    # after naive training (curve persisted by the test above)
    paths = ops.query.scored_execution_paths("emb", "embedding", "euclidean", k=10, dims=len(Q))
    seq = next(p for p in paths if p["path"] == "sequential")
    ecp = next(p for p in paths if p["path"] == "ml_ecp")
    assert seq["predicted_recall"] == 1.0
    assert 0.0 <= ecp["predicted_recall"] <= 1.0


def test_planner_fitted_frac_picks_cheapest_meeting_floor(ops, emb):
    """VERDICT r5 item 6: with measured frac curves, a loose floor routes
    the lossy index with a frac BELOW the fixed default (cheaper scan), a
    floor no measured frac reaches escalates to VAF/sequential, and
    query.knn threads the fitted frac into the scan."""
    from adampro_spark.index._util import DEFAULT_FRAC

    out = train_planner(
        ops, "emb", "embedding", Q, 10, "euclidean",
        df=emb, pk="vec_id", heuristic="naive",
        frac_sweep=(0.02, 0.05, 0.1, DEFAULT_FRAC),
    )
    assert "ml_ecp" in out
    try:
        _fitted_frac_asserts(ops, emb, DEFAULT_FRAC)
    finally:
        # the scale-growth test below exercises the ABSOLUTE-curve gate,
        # which only applies when no frac curve is stored
        ops.catalog.update_entity("emb", frac_curves={})


def _fitted_frac_asserts(ops, emb, DEFAULT_FRAC):
    fcurves = ops.catalog.entity("emb")["frac_curves"]
    ecp_pts = [(f, r) for n, f, r in fcurves["ecp"]]
    assert len(ecp_pts) == 4
    # recall is monotone-ish in frac; the smallest frac's recall is a
    # usable loose floor
    by_frac = dict(ecp_pts)
    loose = by_frac[0.02] * 0.99

    plan_loose = plan_knn(
        ops.catalog, "emb", "embedding", "euclidean",
        hints=("ecp",), k=10, dims=len(Q), min_recall=loose,
    )
    assert plan_loose.path == "ml_ecp"
    assert plan_loose.frac is not None and plan_loose.frac < DEFAULT_FRAC
    assert any("fitted frac" in r for r in plan_loose.reasons)

    # an unreachable floor skips the lossy index entirely
    plan_tight = plan_knn(
        ops.catalog, "emb", "embedding", "euclidean",
        hints=("ecp", "exact"), k=10, dims=len(Q), min_recall=1.01,
    )
    assert plan_tight.path in ("ml_vaf", "sequential")
    assert any("no measured frac" in r for r in plan_tight.reasons)

    # end-to-end: the fitted frac reaches the scan and returns k rows
    res, plan = ops.query.knn(
        "emb", "embedding", Q, 10, "euclidean", hints=("ecp",),
        df=emb, pk="vec_id", min_recall=loose,
    )
    assert plan.frac == plan_loose.frac
    assert res.count() == 10


def test_min_recall_guard_flips_lossy_to_exact_at_scale(ops, emb):
    """For an index WITHOUT a build-time frac fit (legacy/autofit=False
    metas), growing n past what the measured (n, recall) curves support
    must flip the chosen path from the lossy index to an exact one (or
    sequential) — the planner-side complement of the frac='auto' budget.
    An index that DOES carry its scale-free frac_curve survives the
    growth: frac budgets probe frac·n at any n, so the n-decay
    prediction does not apply (round 7)."""
    # at the measured scale the lossy path is usable under the floor
    ent_n = emb.count()
    curves = ops.catalog.entity("emb")["recall_curves"]
    measured = dict(curves)["ecp"][-1][1]
    plan_small = plan_knn(
        ops.catalog, "emb", "embedding", "euclidean",
        hints=("ecp",), k=10, dims=len(Q), min_recall=measured * 0.9,
    )
    assert plan_small.path == "ml_ecp"

    # simulate the corpus growing 1000x
    rec = ops.catalog.index("ml_ecp")
    fitted_meta = dict(rec["meta"])
    ops.catalog.update_entity("emb", tuple_count=ent_n * 1000)
    try:
        # with the build-time frac_curve present the plan SURVIVES scale
        # growth (the curve is frac-proportional, not n-anchored) as long
        # as some measured frac reaches the floor
        curve_ok = [f for f, r in fitted_meta.get("frac_curve", [])
                    if r >= measured * 0.9]
        if curve_ok:
            plan_fitted = plan_knn(
                ops.catalog, "emb", "embedding", "euclidean",
                hints=("ecp", "exact"), k=10, dims=len(Q),
                min_recall=measured * 0.9,
            )
            assert plan_fitted.path == "ml_ecp", plan_fitted.reasons

        # strip the fit → legacy meta → the n-decay prediction applies
        legacy = {k: v for k, v in fitted_meta.items()
                  if k not in ("frac_curve", "fitted_frac")}
        ops.catalog.update_index_fields("ml_ecp", meta=legacy)
        plan_big = plan_knn(
            ops.catalog, "emb", "embedding", "euclidean",
            hints=("ecp", "exact"), k=10, dims=len(Q), min_recall=measured * 0.9,
        )
        assert plan_big.path != "ml_ecp"
        assert plan_big.path in ("ml_vaf", "sequential")
        assert any("below floor" in r for r in plan_big.reasons)
        # ungated call still routes to the lossy index (guard is opt-in)
        assert plan_knn(
            ops.catalog, "emb", "embedding", "euclidean",
            hints=("ecp",), k=10, dims=len(Q),
        ).path == "ml_ecp"
    finally:
        ops.catalog.update_index_fields("ml_ecp", meta=fitted_meta)
        ops.catalog.update_entity("emb", tuple_count=ent_n)


def test_ivfpq_joins_planner_frac_fitting(spark, tmp_path_factory, emb):
    """The IVF-PQ composite is a first-class FRAC_TYPES citizen: the
    naive frac_sweep measures its (n, frac, recall) curve, a loose
    min_recall floor routes through it with a fitted frac below the
    default, and an unreachable floor escalates off it."""
    from adampro_spark.index._util import DEFAULT_FRAC

    o = AdamOps(spark, str(tmp_path_factory.mktemp("ivcat")))
    o.index.create_from_df("pl_ivfpq", "emb2", emb, "embedding", "ivfpq", pk="vec_id")
    o.index.create_from_df("pl_vaf", "emb2", emb, "embedding", "vaf", pk="vec_id")
    o.catalog.ensure_entity("emb2")
    o.catalog.update_entity("emb2", tuple_count=emb.count())

    train_planner(
        o, "emb2", "embedding", Q, 10, "euclidean", df=emb, pk="vec_id",
        frac_sweep=(0.05, 0.2, 0.5),
    )
    fcurves = o.catalog.entity("emb2")["frac_curves"]
    assert "ivfpq" in fcurves and len(fcurves["ivfpq"]) == 3

    by_frac = {float(f): float(r) for _n, f, r in fcurves["ivfpq"]}
    loose = by_frac[0.05] * 0.99
    plan = plan_knn(
        o.catalog, "emb2", "embedding", "euclidean",
        hints=("ivfpq",), k=10, dims=len(Q), min_recall=loose,
    )
    assert plan.path == "pl_ivfpq" and plan.frac == 0.05

    tight = plan_knn(
        o.catalog, "emb2", "embedding", "euclidean",
        hints=("ivfpq", "exact"), k=10, dims=len(Q), min_recall=1.01,
    )
    assert tight.path in ("pl_vaf", "sequential")
