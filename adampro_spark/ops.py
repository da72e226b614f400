"""Programmatic API facade + access-path planner.

Parity targets: ``communication/api/EntityOp.scala:25-251``,
``IndexOp.scala:30-196``, ``QueryOp.scala:26-173`` (the natural Python
skeleton per SURVEY §2.10) and the hint-based planner
``HintBasedScanExpression.scala:93-176`` with the hint vocabulary of
``QueryHints.scala:13-71`` (fallback EXACT = vaf → vav → sequential,
QueryHints.scala:22-38).

Users get one import surface instead of hand-threading
``(index_df, meta)`` tuples through eight modules:

    ops = AdamOps(spark, catalog_base)
    ops.entity.create("e", [("id", "long"), ("feat", "vector")])
    ops.index.create("e_vaf", "e", "feat", "vaf")
    ops.query.knn("e", "feat", q, k=10)          # planner picks the path
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession

from adampro_spark.catalog import Catalog
from adampro_spark.entity import Entity
from adampro_spark.index import persist as IP
from adampro_spark.operators.scan import boolean_filter, sequential_scan

# conformity matrix: index type → distances it can serve
# (per-type isQueryConform: VAIndex.scala:137-143, VAPlusIndex euclidean,
# PQIndex.scala:69-74 Minkowski, ECPIndex.scala:71 any, LSHIndex.scala:84-86
# build distance only, MIIndex.scala:85 any, SHIndex.scala:78-84 euclidean)
_MINKOWSKI = ("manhattan", "euclidean", "squaredeuclidean", "minkowski")
CONFORMITY: dict[str, tuple[str, ...]] = {
    "vaf": _MINKOWSKI,
    "vav": _MINKOWSKI,
    "vaplus": ("euclidean", "squaredeuclidean"),
    "pq": _MINKOWSKI,
    "ecp": ("manhattan", "euclidean", "squaredeuclidean", "cosine"),
    "ivfpq": ("euclidean", "squaredeuclidean"),
    "lsh": (),  # special-cased: must equal the build distance
    "mi": ("manhattan", "euclidean", "squaredeuclidean", "cosine"),
    "sh": ("euclidean",),
}

# exact indexes first (the reference's EXACT_QUERY fallback chain,
# QueryHints.scala:22-38), then lossy by typical precision
PREFERENCE = ("vaf", "vav", "vaplus", "ivfpq", "pq", "ecp", "sh", "lsh", "mi")

CONFIDENCE = {  # Index.confidence: exact=1, lossy=0.5 (per-type .scala:28-38)
    "vaf": 1.0, "vav": 1.0, "vaplus": 1.0,
    "pq": 0.5, "ecp": 0.5, "lsh": 0.5, "mi": 0.5, "sh": 0.5, "ivfpq": 0.5,
    "sequential": 1.0,
}


@dataclass
class KnnPlan:
    """Outcome of the access-path search: which scan serves the query."""

    path: str  # "sequential" or an index name
    index_type: str | None = None
    confidence: float = 1.0
    reasons: list[str] = field(default_factory=list)
    # planner-fitted candidate fraction for the lossy scan (None = the
    # scan's own default); set when min_recall selects the cheapest
    # measured frac meeting the floor from train_planner's frac curves
    frac: float | None = None


# index types whose scans take the scale-proportional ``frac`` budget
# (index/_util.candidate_budget); LSH tunes ntables/num_of_q instead
FRAC_TYPES = ("ecp", "mi", "pq", "sh", "ivfpq")

# budget-only knobs that may legitimately be present while the planner
# falls back to a path that does not take them (review r6: a valid
# frac= + a plan that degrades to sequential/VA must not TypeError)
_BUDGET_KWARGS = ("frac", "times_k", "nprobe", "num_of_q")


def _supported_scan_kwargs(fn, kw: dict) -> dict:
    """Drop BUDGET kwargs the scan callable does not accept; every other
    unknown key passes through so a genuine typo still raises."""
    import inspect

    params = inspect.signature(fn).parameters
    if any(p.kind == p.VAR_KEYWORD for p in params.values()):
        return kw
    return {
        k_: v
        for k_, v in kw.items()
        if k_ in params or k_ not in _BUDGET_KWARGS
    }


def _conforms(index_type: str, meta: dict[str, Any], distance_name: str) -> bool:
    if index_type == "lsh":
        return meta.get("distance") == distance_name
    return distance_name in CONFORMITY.get(index_type, ())


def _ml_route(
    catalog: Catalog,
    entity: str,
    attribute: str,
    kind: str,
    distance_name: str,
    k: int,
    dims: int | None,
    idx_records: dict[str, dict[str, Any]],
    usable,
) -> tuple[str, float] | None:
    """Route by learned time prediction (SVMPlannerHeuristics.test /
    RegressionPlannerHeuristics.test:84-120): per-index-type models and the
    sequential-scan model predict wall time from (count, dims, k); the
    lowest prediction wins.  Returns ``(path, predicted_sec)`` or None when
    no model for ``kind`` has been trained for this entity."""
    from adampro_spark.ml import build_features, load_model

    if not catalog.exists_entity(entity):
        return None
    ent = catalog.entity(entity)
    models = (ent.get("planner_models") or {}).get(kind) or {}
    if not models:
        return None
    count = ent.get("tuple_count", 0)
    if dims is None:
        dims = next(
            (
                int(a.get("dims", 0))
                for a in ent.get("attributes", [])
                if a.get("name") == attribute
            ),
            0,
        )
    f = build_features(count, dims, k)
    best: tuple[str, float] | None = None
    if "entity" in models:
        best = ("sequential", load_model(kind, models["entity"]).test(f))
    for name, rec in idx_records.items():
        key = "index-" + rec["type"]
        if key not in models or not usable(name, rec, None):
            continue
        pred = load_model(kind, models[key]).test(f)
        if best is None or pred < best[1]:
            best = (name, pred)
    return best


def predict_recall(samples: Sequence[Sequence[float]], n: int) -> float | None:
    """Conservative recall prediction at corpus size ``n`` from measured
    ``(n_measured, recall)`` samples (train_planner's naive heuristic
    records one per run).

    Model: an absolute candidate budget covers a ``1/n`` fraction of the
    corpus, so measured recall decays ∝ ``n_measured / n`` when scaling
    UP, and is at least the measured value when scaling down — a lower
    bound (scans using the ``frac="auto"`` scale-proportional budget hold
    their recall, so the prediction under-promises, never over-promises).
    The sample with the largest measured n dominates (closest to the
    asked scale); retraining at the current scale refreshes the bound.
    Returns None with no samples.
    """
    if not samples:
        return None
    n_m, r_m = max(samples, key=lambda s: s[0])
    if n <= n_m:
        return float(r_m)
    return float(r_m) * (float(n_m) / float(n))


def plan_knn(
    catalog: Catalog,
    entity: str,
    attribute: str,
    distance_name: str,
    hints: Sequence[str] = ("exact",),
    k: int = 20,
    dims: int | None = None,
    min_recall: float | None = None,
) -> KnnPlan:
    """Pick the access path for a kNN query (HintBasedScanExpression:93-176).

    ``hints`` are tried in order (QueryHints vocabulary, lowercased):
      * ``"sequential"`` — force the brute-force scan;
      * an index TYPE (``"vaf"``, ``"pq"``, …) — best non-stale conforming
        index of that type;
      * an index NAME — that exact index if usable;
      * ``"exact"`` — non-stale conforming exact index (vaf → vav →
        vaplus), else sequential;
      * ``"approximate"`` — any conforming index by PREFERENCE order.
    Falls through to sequential when nothing matches (the reference's
    fallback, HintBasedScanExpression.scala:169-175).

    ``min_recall`` arms the two-scale recall guard: lossy paths whose
    :func:`predict_recall` at the entity's CURRENT tuple_count (from the
    per-index-type curves ``train_planner`` persists) falls below the
    floor are skipped with a reason — growing n past what the curves
    support flips the plan to an exact index or the sequential scan
    instead of silently serving low-recall results.  Exact paths
    (confidence 1.0) are never recall-gated.

    When ``train_planner(frac_sweep=…)`` has persisted per-type
    ``frac_curves`` (measured (n, frac, recall) points), ``min_recall``
    additionally FITS the budget: the plan carries the CHEAPEST measured
    frac whose recall meets the floor (``KnnPlan.frac``, threaded into
    the scan by ``query.knn``) instead of the scan's fixed default — a
    loose floor probes less than DEFAULT_FRAC, a floor no measured frac
    reaches escalates to an exact index or sequential.  Frac-proportional
    budgets hold recall across n (the frac="auto" design), so the
    largest-n measurement is the predictor.
    """
    reasons: list[str] = []
    idx_records = {
        name: catalog.index(name)
        for name in catalog.list_indexes(entity)
    }
    ent_rec: dict[str, Any] = (
        catalog.entity(entity) if catalog.exists_entity(entity) else {}
    )
    curves = ent_rec.get("recall_curves") or {}
    fcurves = ent_rec.get("frac_curves") or {}
    n_now = int(ent_rec.get("tuple_count") or 0)
    chosen_frac: dict[str, float] = {}

    def fit_frac(t: str) -> float | None:
        """Cheapest measured frac for type ``t`` meeting the floor, from
        the largest-n sweep (None when no measured frac reaches it)."""
        samples = fcurves.get(t) or []
        if not samples:
            return None
        n_best = max(int(s[0]) for s in samples)
        ok = [
            float(s[1])
            for s in samples
            if int(s[0]) == n_best and float(s[2]) >= min_recall
        ]
        return min(ok) if ok else None

    def usable(name: str, rec: dict[str, Any], kinds: Sequence[str] | None) -> bool:
        if rec["attribute"] != attribute:
            return False
        if kinds is not None and rec["type"] not in kinds:
            return False
        if rec.get("stale"):
            reasons.append(f"{name}: stale, skipped")
            return False
        if not _conforms(rec["type"], rec.get("meta", {}), distance_name):
            reasons.append(f"{name}: {rec['type']} not conform to {distance_name}")
            return False
        if (
            min_recall is not None
            and CONFIDENCE.get(rec["type"], 0.5) < 1.0
            and n_now > 0
        ):
            t = rec["type"]
            if fcurves.get(t):
                f = fit_frac(t)
                if f is None:
                    reasons.append(
                        f"{name}: no measured frac reaches floor {min_recall} "
                        f"(frac curve from train_planner)"
                    )
                    return False
                chosen_frac[name] = f
                reasons.append(
                    f"{name}: fitted frac {f} meets floor {min_recall}"
                )
                return True
            build_curve = rec.get("meta", {}).get("frac_curve")
            if build_curve:
                # no train_planner sweep, but the index carries its
                # build-time sample-measured curve (index/autofit.py) —
                # frac budgets are scale-proportional, so the curve is
                # usable at any n without extrapolation
                ok = [float(f) for f, r in build_curve if float(r) >= min_recall]
                if not ok:
                    reasons.append(
                        f"{name}: no build-time frac reaches floor {min_recall} "
                        f"(frac_curve from autofit)"
                    )
                    return False
                chosen_frac[name] = min(ok)
                reasons.append(
                    f"{name}: build-time fitted frac {min(ok)} meets floor "
                    f"{min_recall}"
                )
                return True
            pred = predict_recall(curves.get(t) or [], n_now)
            if pred is not None and pred < min_recall:
                reasons.append(
                    f"{name}: predicted recall {pred:.3f} at n={n_now} "
                    f"below floor {min_recall} (curve from train_planner)"
                )
                return False
        return True

    def best(kinds: Sequence[str] | None) -> str | None:
        ranked = sorted(
            (
                (PREFERENCE.index(rec["type"]), name)
                for name, rec in idx_records.items()
                if usable(name, rec, kinds)
            ),
        )
        return ranked[0][1] if ranked else None

    for hint in hints:
        h = hint.lower()
        if h == "sequential":
            reasons.append("hint: sequential")
            return KnnPlan("sequential", None, 1.0, reasons)
        if h in PREFERENCE:
            name = best((h,))
            if name:
                reasons.append(f"hint: index type {h} -> {name}")
                return KnnPlan(
                    name, h, CONFIDENCE[h], reasons, frac=chosen_frac.get(name)
                )
        elif h == "exact":
            name = best(("vaf", "vav", "vaplus"))
            if name:
                t = idx_records[name]["type"]
                reasons.append(f"hint: exact -> {name}")
                return KnnPlan(name, t, 1.0, reasons)
        elif h == "approximate":
            name = best(None)
            if name:
                t = idx_records[name]["type"]
                reasons.append(f"hint: approximate -> {name}")
                return KnnPlan(
                    name, t, CONFIDENCE[t], reasons, frac=chosen_frac.get(name)
                )
        elif h in idx_records or hint in idx_records:
            # index NAMES are catalog-verbatim (possibly mixed-case) —
            # match the raw hint too, not just its lowercased form
            nm = hint if hint in idx_records else h
            if usable(nm, idx_records[nm], None):
                t = idx_records[nm]["type"]
                reasons.append(f"hint: index name {nm}")
                return KnnPlan(
                    nm, t, CONFIDENCE[t], reasons, frac=chosen_frac.get(nm)
                )

        elif h == "optimized":
            scored = sorted(
                (
                    (-(rec.get("score") or 0.0), name)
                    for name, rec in idx_records.items()
                    if usable(name, rec, None) and rec.get("score") is not None
                ),
            )
            # the sequential scan is a scored path too (trained onto the
            # entity record): it wins when every index scores worse
            seq_score = ent_rec.get("seq_score")
            if scored and (
                seq_score is None or -scored[0][0] >= float(seq_score)
            ):
                name = scored[0][1]
                t = idx_records[name]["type"]
                reasons.append(
                    f"hint: optimized -> {name} (score {idx_records[name]['score']:.3f})"
                )
                return KnnPlan(
                    name, t, CONFIDENCE[t], reasons, frac=chosen_frac.get(name)
                )
            if seq_score is not None:
                reasons.append(
                    f"hint: optimized -> sequential (score {float(seq_score):.3f})"
                )
                return KnnPlan("sequential", None, 1.0, reasons)
            reasons.append("hint: optimized, but no trained scores")
        elif h in ("optimized-svm", "optimized-lr"):
            kind = h.split("-", 1)[1]
            choice = _ml_route(
                catalog, entity, attribute, kind, distance_name, k, dims,
                idx_records, usable,
            )
            if choice is not None:
                path, pred = choice
                t = idx_records[path]["type"] if path != "sequential" else None
                reasons.append(f"hint: {h} -> {path} (predicted {pred:.4f}s)")
                return KnnPlan(
                    path, t, CONFIDENCE[t] if t else 1.0, reasons,
                    frac=chosen_frac.get(path),
                )
            reasons.append(f"hint: {h}, but no trained {kind} models")

    reasons.append("fallback: sequential")
    return KnnPlan("sequential", None, 1.0, reasons)


def train_planner(
    ops: "AdamOps",
    entity: str,
    attribute: str,
    query,
    k: int,
    distance_name: str = "euclidean",
    df=None,
    pk: str = "ap_id",
    heuristic: str = "naive",
    nruns: int = 3,
    frac_sweep: Sequence[float] | None = None,
) -> dict[str, dict[str, float]]:
    """Measured path scoring (planner heuristics + measurement harness,
    PlannerHeuristics.scala:66-140, QueryPlannerOp.scala:33-60).

    ``heuristic="naive"`` (NaiveHeuristics.scala:16-171): run every
    conforming path once on the training query, record wall time and
    recall against the sequential ground truth, and store ``score =
    recall / (1 + time)`` per index in the catalog (the reference
    sigmoid-blends time/precision/recall scores; one monotone blend
    suffices for ranking).  ``hints=("optimized",)`` then routes by score.

    ``frac_sweep`` (naive only) additionally measures each frac-aware
    lossy index (``FRAC_TYPES``) at every given candidate fraction and
    persists per-type ``frac_curves = {type: [[n, frac, recall], …]}`` on
    the entity — ``plan_knn(min_recall=…)`` then routes with the CHEAPEST
    measured frac meeting the floor instead of the fixed default
    (index/_util.DEFAULT_FRAC).

    ``heuristic="svm"`` / ``"lr"`` (SVMPlannerHeuristics.scala:36-60,
    RegressionPlannerHeuristics.scala:35-77): measure each path ``nruns``
    times, fit a per-index-TYPE time-prediction model — PegasosSVM or
    least-squares (ml.py) — over (count, dims, k) features, plus the
    ``entity`` model for the sequential scan, and persist the coefficients
    on the entity's catalog record.  ``hints=("optimized-svm",)`` /
    ``("optimized-lr",)`` then route to the lowest predicted time.
    Retraining MERGES with previously stored models of other kinds.
    """
    import time as _time

    from adampro_spark.execution import knn_paths

    paths = knn_paths(ops, entity, attribute, query, k, distance_name, df=df, pk=pk)

    if heuristic == "naive":
        import time as _t2

        seq = paths.pop("sequential")
        t0s = _t2.perf_counter()
        truth = {r[0] for r in seq[1]().select(pk).collect()}
        seq_dt = _t2.perf_counter() - t0s
        out: dict[str, dict[str, float]] = {}
        ops.catalog.ensure_entity(entity)
        ent = ops.catalog.entity(entity)
        n_now = int(ent.get("tuple_count") or 0) or (
            df.count() if df is not None else 0
        )
        curves = {k_: list(v) for k_, v in (ent.get("recall_curves") or {}).items()}
        for name, (_conf, fn) in paths.items():
            t0 = _time.perf_counter()
            got = {r[0] for r in fn().select(pk).collect()}
            dt = _time.perf_counter() - t0
            recall = len(got & truth) / max(len(truth), 1)
            score = recall / (1.0 + dt)
            out[name] = {"time_sec": round(dt, 4), "recall": recall, "score": score}
            ops.catalog.update_index_fields(name, score=score, recall=recall)
            # per-index-TYPE (n, recall) curve — plan_knn's min_recall
            # guard extrapolates these to the current corpus size
            if n_now > 0:
                t = ops.catalog.index(name)["type"]
                rows = [s for s in curves.get(t, []) if int(s[0]) != n_now]
                rows.append([n_now, recall])
                curves[t] = rows
        # the sequential scan is a scored path too (the reference's
        # adaptScanMethods covers entity scans): recall 1.0 by definition,
        # the score persists on the ENTITY record so the "optimized" hint
        # can route to it when every index scores worse (review r6)
        seq_score = 1.0 / (1.0 + seq_dt)
        out["sequential"] = {
            "time_sec": round(seq_dt, 4), "recall": 1.0, "score": seq_score,
        }
        ops.catalog.update_entity(entity, seq_score=seq_score)
        if n_now > 0:
            ops.catalog.update_entity(entity, recall_curves=curves)
        if frac_sweep and n_now > 0:
            fcurves = {
                k_: list(v) for k_, v in (ent.get("frac_curves") or {}).items()
            }
            for name in paths:
                t = ops.catalog.index(name)["type"]
                if t not in FRAC_TYPES:
                    continue
                for f in frac_sweep:
                    f = float(f)
                    got_f = {
                        r[0]
                        for r in ops.query.index(
                            name, query, k, distance_name, df=df, frac=f
                        ).select(pk).collect()
                    }
                    rec_f = len(got_f & truth) / max(len(truth), 1)
                    rows = [
                        s
                        for s in fcurves.get(t, [])
                        if not (int(s[0]) == n_now and float(s[1]) == f)
                    ]
                    rows.append([n_now, f, rec_f])
                    fcurves[t] = sorted(rows)
            ops.catalog.update_entity(entity, frac_curves=fcurves)
        return out

    if heuristic not in ("svm", "lr"):
        raise ValueError(f"unknown planner heuristic {heuristic!r}")

    import numpy as _np

    from adampro_spark.ml import MODELS, TrainingSample, build_features

    ops.catalog.ensure_entity(entity)
    ent = ops.catalog.entity(entity)
    # same ad-hoc-df fallback as the naive branch: an external-table
    # entity has tuple_count 0 in the catalog, and size-0 features make
    # the time model blind to corpus scale (review r6)
    count = int(ent.get("tuple_count") or 0) or (
        df.count() if df is not None else 0
    )
    dims = len(list(query))
    feats = build_features(count, dims, k)

    # measurements grouped per MODEL KEY (index type, or "entity" for the
    # sequential scan) — several indexes of one type train one model, as in
    # the reference's groupBy(indextypename)
    samples: dict[str, list[TrainingSample]] = {}
    out = {}
    for name, (_conf, fn) in paths.items():
        key = (
            "entity"
            if name == "sequential"
            else "index-" + ops.catalog.index(name)["type"]
        )
        times = []
        for _ in range(max(1, nruns)):
            t0 = _time.perf_counter()
            fn().select(pk).collect()
            times.append(_time.perf_counter() - t0)
        samples.setdefault(key, []).extend(
            TrainingSample(feats, t) for t in times
        )
        out[name] = {"time_sec": round(min(times), 4), "model": key}

    # accumulate samples across train_planner calls (the reference's
    # Regression.train appends a .data object file per call and refits on
    # the union, Regression.scala:43-56) — training at several k values
    # teaches the models an actual k-dependence
    all_samples = dict(ent.get("planner_samples") or {})
    for key, data in samples.items():
        rows = list(all_samples.get(key) or [])
        rows.extend([[*map(float, s.f), float(s.time)] for s in data])
        all_samples[key] = rows

    stored = dict(ent.get("planner_models") or {})
    kind_models = dict(stored.get(heuristic) or {})
    for key, rows in all_samples.items():
        data = [
            TrainingSample(_np.asarray(r[:-1], dtype=float), r[-1]) for r in rows
        ]
        model = (
            MODELS[heuristic](dims=len(feats))
            if heuristic == "svm"
            else MODELS[heuristic]()
        )
        model.train(data)
        kind_models[key] = model.to_weights()
    stored[heuristic] = kind_models
    ops.catalog.update_entity(
        entity, planner_models=stored, planner_samples=all_samples
    )
    return out


# ---------------------------------------------------------------------------
# facade
# ---------------------------------------------------------------------------


class EntityOps:
    """EntityOp.scala:25-251 — DDL/DML surface."""

    def __init__(self, spark: SparkSession, catalog: Catalog):
        self.spark = spark
        self.catalog = catalog

    def create(self, name: str, attributes: Sequence[tuple[str, str]]) -> Entity:
        return Entity.create(self.spark, self.catalog, name, attributes)

    def get(self, name: str) -> Entity:
        self.catalog.entity(name)  # raises on missing
        return Entity(self.spark, self.catalog, name)

    def exists(self, name: str) -> bool:
        return self.catalog.exists_entity(name)

    def list(self) -> list[str]:
        return self.catalog.list_entities()

    def insert(self, name: str, df: DataFrame) -> None:
        self.get(name).insert(df)

    def delete(self, name: str, predicates) -> int:
        return self.get(name).delete(predicates)

    def vacuum(self, name: str, num_partitions: int | None = None) -> None:
        self.get(name).vacuum(num_partitions)

    def sparsify(self, name: str, attribute: str, threshold: float = 0.0) -> None:
        self.get(name).sparsify(attribute, threshold)

    def bucketize(self, name: str, n_buckets: int) -> None:
        self.get(name).bucketize(n_buckets)

    def debucketize(self, name: str) -> None:
        self.get(name).debucketize()

    def count(self, name: str) -> int:
        return self.get(name).count()

    def preview(self, name: str, k: int = 100) -> DataFrame:
        return self.get(name).preview(k)

    def drop(self, name: str) -> None:
        self.get(name).drop()

    def properties(self, name: str) -> dict[str, Any]:
        return dict(self.catalog.entity(name))

    def transfer(
        self, name: str, handler: str, location: str | None = None, **opts: Any
    ) -> None:
        """transferStorageHandler (DataDefintion.scala transfer op): move
        the entity's storage to a registered handler; queries unchanged."""
        from adampro_spark.io_ops import transfer_entity

        transfer_entity(self.get(name), handler, location=location, **opts)

    def export_proto(self, name: str, path: str) -> None:
        """Protobuf bulk export (ProtoImporterExporter.exportData)."""
        from adampro_spark.proto_io import export_entity_proto

        export_entity_proto(self.get(name), path)

    def import_proto(self, path: str) -> list[Entity]:
        """Protobuf bulk import (ProtoImporterExporter.importData)."""
        from adampro_spark.proto_io import import_proto

        return import_proto(self.spark, self.catalog, path)


class IndexOps:
    """IndexOp.scala:30-196 — index lifecycle over persist.py."""

    def __init__(self, spark: SparkSession, catalog: Catalog):
        self.spark = spark
        self.catalog = catalog

    def create(
        self, name: str, entity: str, attribute: str, index_type: str, **kw: Any
    ) -> tuple[DataFrame, dict[str, Any]]:
        df = Entity(self.spark, self.catalog, entity).df()
        return IP.create_index(
            self.spark, self.catalog, name, entity, df, attribute, index_type, **kw
        )

    def create_from_df(
        self,
        name: str,
        entity: str,
        df: DataFrame,
        attribute: str,
        index_type: str,
        **kw: Any,
    ) -> tuple[DataFrame, dict[str, Any]]:
        """Index an arbitrary DataFrame registered under ``entity`` — the
        path for external tables (e.g. the testdata parquet) that are not
        catalog-managed entities."""
        return IP.create_index(
            self.spark, self.catalog, name, entity, df, attribute, index_type, **kw
        )

    def generate_all(self, entity: str, attribute: str, pk: str = "ap_id") -> list[str]:
        """IndexOp.generateAll: one index of every type (IndexOp.scala:77-96)."""
        made = []
        for t in IP.index_types():
            name = f"{entity}_{attribute}_{t}"
            self.create(name, entity, attribute, t, pk=pk)
            made.append(name)
        return made

    def append(self, name: str, new_df: DataFrame):
        """Incrementally extend a persisted vector index with the batch
        of rows inserted since its build (IP.append_index; round 14
        ecp/ivfpq, round 15 every vector family): frozen-model
        assignment/encoding of the batch only, parquet (or bucketed
        table / cell layout) append, meta refresh (counts/radii/marks
        envelope/n), staleness flag cleared.  Fulltext stays
        rebuild-only (posting lists aggregate across documents)."""
        return IP.append_index(self.spark, self.catalog, name, new_df)

    def load(self, name: str, allow_stale: bool = True):
        return IP.load_index(self.spark, self.catalog, name, allow_stale)

    def exists(self, name: str) -> bool:
        try:
            self.catalog.index(name)
            return True
        except KeyError:
            return False

    def list(self, entity: str | None = None) -> list[str]:
        return self.catalog.list_indexes(entity)

    def drop(self, name: str) -> None:
        IP.drop_index(self.catalog, name)

    def properties(self, name: str) -> dict[str, Any]:
        rec = dict(self.catalog.index(name))
        rec.pop("meta", None)  # heavy payload (marks/codebooks) on demand
        return rec


class QueryOps:
    """QueryOp.scala:26-173 — query surface (sequential / index / planned)."""

    def __init__(self, spark: SparkSession, catalog: Catalog, index_ops: IndexOps):
        self.spark = spark
        self.catalog = catalog
        self._index = index_ops

    def _entity_df(self, entity: str, df: DataFrame | None) -> DataFrame:
        if df is not None:
            return df
        return Entity(self.spark, self.catalog, entity).df()

    def sequential(
        self,
        entity: str,
        attribute: str,
        query: Sequence[float],
        k: int,
        distance_name: str = "euclidean",
        predicates=None,
        df: DataFrame | None = None,
        pk: str = "ap_id",
        **kw: Any,
    ) -> DataFrame:
        """BooleanFilterScan ∘ SequentialScan (QueryOp.scala:56-69)."""
        data = self._entity_df(entity, df)
        if predicates is not None:
            data = boolean_filter(data, predicates)
        return sequential_scan(data, attribute, query, k, distance_name, pk=pk, **kw)

    def radius(
        self,
        entity: str,
        attribute: str,
        query: Sequence[float],
        radius: float,
        distance_name: str = "euclidean",
        predicates=None,
        df: DataFrame | None = None,
        pk: str = "ap_id",
        **kw: Any,
    ) -> DataFrame:
        """BooleanFilterScan ∘ RANGE scan (round 12 beyond-reference
        extension — the reference is kNN-only): every row within
        ``radius`` of the query, ascending; same distance library and
        predicate pushdown as :meth:`sequential`.  See
        :func:`~adampro_spark.operators.scan.radius_scan` for the knobs
        (``limit`` caps pathological radii, ``ordered=False`` skips the
        final sort)."""
        from adampro_spark.operators.scan import radius_scan

        data = self._entity_df(entity, df)
        if predicates is not None:
            data = boolean_filter(data, predicates)
        return radius_scan(
            data, attribute, query, radius, distance_name, pk=pk, **kw
        )

    def radius_indexed(
        self,
        index_name: str,
        query: Sequence[float],
        radius: float,
        df: DataFrame | None = None,
        **kw: Any,
    ) -> DataFrame:
        """Index-accelerated RANGE scan through a persisted eCP index
        (round 13 facade for
        :func:`~adampro_spark.index.ecp.ecp_radius`): triangle-
        inequality cell pruning + Parquet partition pruning on the
        cell-partitioned layout, results identical to :meth:`radius`.
        ``df`` defaults to the index's cataloged entity."""
        from adampro_spark.index.ecp import ecp_radius

        rec = self.catalog.index(index_name)
        if rec["type"] != "ecp":
            raise ValueError(
                f"radius_indexed needs an eCP index (cell radii), "
                f"{index_name!r} is {rec['type']!r} — use "
                "query.radius for the exact brute scan"
            )
        index_df, meta = self._index.load(index_name)
        data = self._entity_df(rec["entity"], df)
        return ecp_radius(
            data, rec["attribute"], index_df, meta, list(query), radius, **kw
        )

    def index(
        self,
        index_name: str,
        query: Sequence[float],
        k: int,
        distance_name: str | None = None,
        df: DataFrame | None = None,
        prefilter: DataFrame | None = None,
        **kw: Any,
    ) -> DataFrame:
        """Scan one PERSISTED index by name → exact refinement
        (QueryOp.scala:91-106; IndexScanExpression.rewrite :89-98).

        Budget-only kwargs a scan kind does not take (``frac`` on the
        exact VA family, ``nprobe`` outside ivfpq, …) are DROPPED rather
        than crashing — a planner fallback must not turn a valid lossy
        knob into a TypeError (review r6); any other unknown kwarg still
        raises through the callee's signature.
        """
        from adampro_spark import index as IX
        from adampro_spark.index.va import va_knn

        rec = self.catalog.index(index_name)
        index_df, meta = self._index.load(index_name)
        data = self._entity_df(rec["entity"], df)
        t = rec["type"]
        attr = rec["attribute"]
        dn = distance_name or meta.get("distance") or "euclidean"
        if t == "sh" and dn not in ("euclidean",):
            # SH conformity is Euclidean-only (SHIndex.scala:78-84); the
            # by-name path used to silently return euclidean distances
            raise ValueError(
                f"index {index_name!r} (sh) only supports euclidean, "
                f"got {dn!r}"
            )
        if t in ("vaf", "vav"):
            # exact VA paths forward **kw into sequential_scan, which has
            # no budget knobs — strip them outright
            kw = {k_: v for k_, v in kw.items() if k_ not in _BUDGET_KWARGS}
            return va_knn(data, attr, index_df, meta, list(query), k,
                          distance_name=dn, prefilter=prefilter, **kw)
        if t == "vaplus":
            kw = {k_: v for k_, v in kw.items() if k_ not in _BUDGET_KWARGS}
            return IX.vaplus_knn(data, attr, index_df, meta, list(query), k,
                                 distance_name=dn, prefilter=prefilter, **kw)
        if t == "ecp":
            kw = _supported_scan_kwargs(IX.ecp_knn, kw)
            return IX.ecp_knn(data, attr, index_df, meta, list(query), k, dn,
                              prefilter=prefilter, **kw)
        if t == "ivfpq":
            kw = _supported_scan_kwargs(IX.ivfpq_knn, kw)
            return IX.ivfpq_knn(data, attr, index_df, meta, list(query), k, dn,
                                prefilter=prefilter, **kw)
        if t == "pq":
            kw = _supported_scan_kwargs(IX.pq_knn, kw)
            return IX.pq_knn(data, attr, index_df, meta, list(query), k, dn,
                             prefilter=prefilter, **kw)
        if t == "lsh":
            kw = _supported_scan_kwargs(IX.lsh_knn, kw)
            return IX.lsh_knn(data, attr, index_df, meta, list(query), k, dn,
                              prefilter=prefilter, **kw)
        if t == "mi":
            kw = _supported_scan_kwargs(IX.mi_knn, kw)
            return IX.mi_knn(data, attr, index_df, meta, list(query), k, dn,
                             prefilter=prefilter, **kw)
        if t == "sh":
            kw = _supported_scan_kwargs(IX.sh_knn, kw)
            return IX.sh_knn(data, attr, index_df, meta, list(query), k,
                             prefilter=prefilter, **kw)
        raise ValueError(f"unknown index type {t!r}")

    def knn(
        self,
        entity: str,
        attribute: str,
        query: Sequence[float],
        k: int,
        distance_name: str = "euclidean",
        hints: Sequence[str] = ("exact",),
        predicates=None,
        df: DataFrame | None = None,
        pk: str = "ap_id",
        min_recall: float | None = None,
        **kw: Any,
    ) -> tuple[DataFrame, KnnPlan]:
        """Planned kNN: hint walk → conforming non-stale index → scan, with
        sequential fallback (HintBasedScanExpression.scala:63-176).

        Predicates thread into the index scan as a PK prefilter (the
        reference's filter-first pipeline, HintBasedScanExpression
        filterExpr): bounds (VA k-th ubound) and lossy candidate widths are
        then computed over the FILTERED index rows — computing them over
        the unfiltered index can prune true neighbors of the filtered
        subset or return fewer-than-k rows."""
        if "prefilter" in kw:
            raise TypeError(
                "knn() does not accept 'prefilter'; pass predicates= "
                "(prefiltering is derived from predicates)"
            )
        plan = plan_knn(
            self.catalog, entity, attribute, distance_name, hints,
            k=k, dims=len(list(query)), min_recall=min_recall,
        )
        prefilter = None
        data = self._entity_df(entity, df)
        if predicates is not None:
            data = boolean_filter(data, predicates)
            prefilter = data.select(pk)
        if plan.path == "sequential":
            res = sequential_scan(
                data, attribute, query, k, distance_name, pk=pk,
                **_supported_scan_kwargs(sequential_scan, kw),
            )
        else:
            if plan.frac is not None and "frac" not in kw:
                # planner-fitted candidate budget (an explicit frac= from
                # the caller always wins)
                kw = {**kw, "frac": plan.frac}
            res = self.index(
                plan.path, query, k, distance_name, df=data, prefilter=prefilter, **kw
            )
        return res, plan

    def fulltext(
        self,
        target: str,
        terms: Sequence[str],
        k: int | None = None,
        df: DataFrame | None = None,
        text_col: str = "text",
        pk: str = "ap_id",
        **kw: Any,
    ) -> DataFrame:
        """Full-text term search (SolrEngine.scala:139-163 passthrough):
        ``target`` naming a persisted ``fulltext`` index routes through the
        posting table (text column never read; ``scoring="bm25"`` + k1/b
        pass through); an entity name falls back to the scan path.
        Default-scoring results identical either way."""
        from adampro_spark.operators.fulltext import text_search, text_search_indexed

        if self._index.exists(target):
            rec = self.catalog.index(target)
            if rec["type"] == "fulltext":
                idx, meta = self._index.load(target)
                return text_search_indexed(idx, meta, terms, k, **kw)
        if kw:
            # the scan path has no posting table: BM25 needs the index
            # (silently returning tf-ranked rows misled callers, review r6)
            raise ValueError(
                f"fulltext options {sorted(kw)} need a persisted fulltext "
                f"index; {target!r} resolves to the scan path"
            )
        data = self._entity_df(target, df)
        return text_search(data, text_col, terms, k, pk=pk)

    def batch_query(self, specs: Sequence[dict]) -> list:
        """Run a batch of planned kNN queries concurrently and return their
        observations IN INPUT ORDER (doBatchQuery, DataQuery.scala:253-257
        — the reference answers a BatchedQueryMessage with one result per
        sub-query).  Each spec is the kwargs of :meth:`knn`; execution
        fans out through :func:`parallel_query`, so on a cluster the
        queries interleave across executors instead of queueing FIFO.
        """
        from adampro_spark.execution import parallel_query

        paths = {
            f"q{i}": (1.0, (lambda s=dict(spec): self.knn(**s)[0]))
            for i, spec in enumerate(specs)
        }
        obs = parallel_query(self.spark, paths)
        # numeric sort: lexicographic q-keys break input order at 10k+
        return sorted(obs, key=lambda o: int(o.path[1:]))

    def scored_execution_paths(
        self,
        entity: str,
        attribute: str,
        distance_name: str = "euclidean",
        k: int = 20,
        dims: int | None = None,
    ) -> list[dict]:
        """Introspect every access path for (entity, attribute, distance)
        with the planner's ranking signals (getScoredExecutionPaths,
        DataQuery.scala:380-411 + QueryPlannerOp.scala:33-60): trained
        score when ``train_planner`` has run, conformity confidence
        otherwise, plus per-heuristic predicted times when svm/lr models
        exist for this entity.  Ranked best-first: measured score beats
        static confidence, sequential is the always-usable 1.0-confidence
        floor.  No query executes — this is metadata only.
        """
        from adampro_spark.ml import build_features, load_model

        ent = (
            self.catalog.entity(entity)
            if self.catalog.exists_entity(entity)
            else {}
        )
        planner_models = ent.get("planner_models") or {}
        feats = build_features(
            ent.get("tuple_count", 0),
            dims
            if dims is not None
            else next(
                (
                    int(a.get("dims", 0))
                    for a in ent.get("attributes", [])
                    if a.get("name") == attribute
                ),
                0,
            ),
            k,
        )

        def _predicted(model_key: str) -> dict[str, float]:
            out = {}
            for kind, models in planner_models.items():
                if model_key in models:
                    out[kind] = round(load_model(kind, models[model_key]).test(feats), 4)
            return out

        curves = ent.get("recall_curves") or {}
        n_now = int(ent.get("tuple_count") or 0)
        rows: list[dict] = []
        for name in self.catalog.list_indexes(entity):
            rec = self.catalog.index(name)
            usable = (
                rec["attribute"] == attribute
                and not rec.get("stale")
                and _conforms(rec["type"], rec.get("meta", {}), distance_name)
            )
            rows.append(
                {
                    "path": name,
                    "index_type": rec["type"],
                    "confidence": CONFIDENCE.get(rec["type"], 0.5),
                    "score": rec.get("score"),
                    "recall": rec.get("recall"),
                    "usable": usable,
                    "predicted_time": _predicted("index-" + rec["type"]),
                    # conservative recall bound at the CURRENT corpus size
                    # (plan_knn's min_recall guard uses the same model)
                    "predicted_recall": (
                        predict_recall(curves.get(rec["type"]) or [], n_now)
                        if n_now > 0
                        else None
                    ),
                }
            )
        rows.append(
            {
                "path": "sequential",
                "index_type": None,
                "confidence": 1.0,
                "score": None,
                "recall": 1.0,
                "usable": True,
                "predicted_time": _predicted("entity"),
                "predicted_recall": 1.0,
            }
        )
        rows.sort(
            key=lambda r: (
                not r["usable"],
                -(r["score"] if r["score"] is not None else -1.0),
                -r["confidence"],
            )
        )
        return rows


class AdamOps:
    """One handle over the whole engine (the reference's implicit
    SharedComponentContext wiring, reduced to a constructor)."""

    def __init__(self, spark: SparkSession, catalog_base: str):
        self.spark = spark
        self.catalog = Catalog(catalog_base)
        self.entity = EntityOps(spark, self.catalog)
        self.index = IndexOps(spark, self.catalog)
        self.query = QueryOps(spark, self.catalog, self.index)
