"""Build-time candidate-fraction auto-fitting for the lossy indexes.

The reference's planner scores scan paths by MEASURED recall/time
(``QueryPlannerOp.scoredScans``, QueryPlannerOp.scala:33-60) — but only
when the operator explicitly trains it.  Round-6 verdict #1: an untrained
entity here fell back to a fixed ``DEFAULT_FRAC = 0.2`` probe — recall-
safe, but at 100× scale an "index" that scans a fifth of the corpus is
only a ~5× win over sequential.

This module makes the fit automatic and FREE: every lossy build already
holds a driver-side training sample (IndexGenerator.scala:47-80 trains on
a collected sample too).  We re-run the scan's candidate-selection rule
in numpy ON THAT SAMPLE for a set of held-out sample queries, measure
recall at several candidate fractions, and persist the measured curve
plus the cheapest fraction meeting the criterion into the index metadata:

  * ``meta["frac_curve"]``  — ``[[frac, mean_recall], …]`` (sample-measured)
  * ``meta["fitted_frac"]`` — cheapest measured frac meeting the criterion

``frac="auto"`` (the scan default) then resolves to ``fitted_frac``
instead of the fixed 20% (index/_util.resolve_frac), and
``plan_knn(min_recall=…)`` fits against the curve when the entity has no
``train_planner`` sweep.  Zero extra Spark jobs: the simulation is a few
(sample × dim) matmuls on the driver.

Two statistical points make the sample estimate transfer to the corpus:

* **Scale-free budgets.**  The frac budgets probe ``frac·n`` for any n
  (the round-4 "auto" design), and a uniform sample preserves score
  quantiles — a row admitted in the top ``frac·m`` of the sample ranking
  lands in the top ``frac·n`` of the corpus ranking.
* **Sparsity-corrected ground truth.**  The sample's own top-k is a
  HARDER target than the corpus top-k (a 1/5 sample's 20th neighbour is
  roughly the corpus's 100th), which biased a naive fit pessimistic —
  measured: real recall@20 at frac 0.05 equalled frac 0.2 on every index
  type while the naive sample curve still climbed.  The unbiased target
  is the sample's top ``k_eff ≈ k·m/n`` — the expected slice of the
  corpus top-k that survived sampling; the query count scales up to keep
  the positive count stable as ``k_eff`` shrinks.

The fit criterion is **knee-or-target**: the cheapest frac whose recall
reaches the absolute target (0.95) OR comes within ``KNEE_EPS`` of the
curve's plateau (the recall at the largest swept frac).  The knee clause
matters in practice: these scans' recall plateaus early (extra cells /
deeper ADC prefixes stop adding true neighbours), so probing past the
knee buys nothing — the measured real curves were FLAT from 0.05 to 0.2.

A parity test (tests/test_autofit.py) pins the simulated candidate SETS
to the real scans' output on a corpus where sample == corpus, so the
simulation cannot silently drift from the Spark implementations.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from adampro_spark.index._util import DEFAULT_FRAC, np_distance, np_pairwise as _pairwise

# Swept fractions, cheapest first.  DEFAULT_FRAC is always included so
# the fit can only IMPROVE on the old fixed default, never regress it.
FIT_FRACS = (0.01, 0.02, 0.05, 0.1, DEFAULT_FRAC)
FIT_TARGET = 0.95   # absolute sample-recall target
KNEE_EPS = 0.02     # "as good as the plateau" tolerance
FIT_K = 20
MIN_FIT_SAMPLE = 300  # below this, recall estimates are too noisy to trust
TARGET_POSITIVES = 96  # queries scale so nqueries·k_eff stays near this


def _rank_rows(scores: np.ndarray) -> np.ndarray:
    """Full row ordering by (score, row index) — the scans'
    ``orderBy(score, pk)`` with the sample row index standing in for pk."""
    return np.lexsort((np.arange(len(scores)), scores))


# ---------------------------------------------------------------------------
# per-type simulation: encode the sample once, then per query produce a
# state from which ``admit(budget)`` yields the real scan's candidate set
# ---------------------------------------------------------------------------


def _pq_codes(bounds, codebooks, S: np.ndarray) -> list[np.ndarray]:
    codes = []
    for (s, ln), cb in zip(bounds, codebooks):
        cbm = np.asarray(cb, dtype=np.float64)
        sub = S[:, s : s + ln]
        codes.append(((sub[:, None, :] - cbm[None, :, :]) ** 2).sum(axis=2).argmin(axis=1))
    return codes


class _Sim:
    """One fit session: per-type encodings shared across queries."""

    def __init__(self, kind: str, meta: dict[str, Any], S: np.ndarray):
        self.kind = kind
        self.meta = meta
        self.S = S.astype(np.float64)
        m = len(S)
        if kind == "ecp":
            leaders = np.asarray(meta["leaders"], dtype=np.float64)
            self.cells = _pairwise(S, leaders, meta["distance"]).argmin(axis=1)
            self.counts = np.bincount(self.cells, minlength=len(leaders))
        elif kind == "pq":
            self.codes = _pq_codes(meta["bounds"], meta["codebooks"], self.S)
        elif kind == "sh":
            from adampro_spark.index.sh import _np_signature

            self.sig = _np_signature(self.S, meta).astype(np.float64)
        elif kind == "mi":
            refs = np.asarray(meta["refs"], dtype=np.float64)
            D = _pairwise(S, refs, meta["distance"])
            ids = np.broadcast_to(np.arange(D.shape[1]), D.shape)
            # ranked ref ids per row by (distance, id) — mi's array_sort
            # over (d, i) structs
            self.features = np.lexsort((ids, D), axis=1)[:, : meta["ki"]]
        elif kind == "ivfpq":
            leaders = np.asarray(meta["leaders"], dtype=np.float64)
            self.cells = (
                ((self.S[:, None, :] - leaders[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
            )
            self.counts = np.bincount(self.cells, minlength=len(leaders))
            R = self.S - leaders[self.cells]
            self.codes = _pq_codes(meta["bounds"], meta["codebooks"], R)
        else:
            raise ValueError(f"no frac simulator for index type {kind!r}")

    def query_state(self, q: np.ndarray) -> dict[str, Any]:
        meta, S = self.meta, self.S
        if self.kind == "ecp":
            order = np.argsort(
                np_distance(q, np.asarray(meta["leaders"], dtype=np.float64), meta["distance"]),
                kind="stable",
            )
            return {"cell_order": order}
        if self.kind == "pq":
            # ADC with the per-split Minkowski root (pq._adc_expr, p = 2)
            scores = np.zeros(len(S))
            for (s, ln), cb, codes in zip(meta["bounds"], meta["codebooks"], self.codes):
                cbm = np.asarray(cb, dtype=np.float64)
                d = np.sqrt(((cbm - q[s : s + ln]) ** 2).sum(axis=1))
                scores += d[codes]
            return {"rank": _rank_rows(scores)}
        if self.kind == "sh":
            from adampro_spark.index.sh import _np_signature

            rng = np.random.RandomState(meta["seed"] + 1)
            radius = float(np.mean(np.asarray(meta["radius"], dtype=np.float64)))
            queries = [q] + [
                q + rng.standard_normal(len(q)) * radius for _ in range(3)
            ]
            QS = _np_signature(np.array(queries), meta)
            nq = len(queries)
            cost1 = (nq - QS.sum(axis=0)).astype(np.float64)
            cost0 = QS.sum(axis=0).astype(np.float64)
            scores = (self.sig * cost1 + (1 - self.sig) * cost0).sum(axis=1)
            return {"rank": _rank_rows(scores)}
        if self.kind == "mi":
            refs = np.asarray(meta["refs"], dtype=np.float64)
            ki, ks = meta["ki"], meta["ks"]
            qrefs = np.argsort(np_distance(q, refs, meta["distance"]), kind="stable")[:ks]
            scores = np.zeros(len(S))
            for i, qr in enumerate(qrefs):
                hit, pos = np.nonzero(self.features == qr)
                term = np.full(len(S), float(ki + 1))
                term[hit] = np.abs(pos - i)
                scores += term
            return {"rank": _rank_rows(scores)}
        # ivfpq: cell order by leader distance + per-row residual ADC
        leaders = np.asarray(meta["leaders"], dtype=np.float64)
        order = np.argsort(((leaders - q) ** 2).sum(axis=1), kind="stable")
        scores = np.zeros(len(S))
        for (s, ln), cb, codes in zip(meta["bounds"], meta["codebooks"], self.codes):
            cbm = np.asarray(cb, dtype=np.float64)
            # per-cell LUT: d2[cell, code] from the cell's residual query
            qr = q[None, s : s + ln] - leaders[:, s : s + ln]  # (ncells × ln)
            d2 = ((qr[:, None, :] - cbm[None, :, :]) ** 2).sum(axis=2)  # (ncells × ncl)
            scores += d2[self.cells, codes]
        return {"cell_order": order, "scores": np.sqrt(scores)}

    def admit(self, qstate: dict[str, Any], budget: int) -> np.ndarray:
        """Sample-row indices the real scan admits at this budget."""
        if self.kind == "ecp":
            # scan_ecp's takeWhile(+1 more): test cum BEFORE adding
            cum = 0
            chosen: list[int] = []
            for li in qstate["cell_order"]:
                chosen.append(int(li))
                if cum >= budget:
                    break
                cum += int(self.counts[li])
            return np.nonzero(np.isin(self.cells, chosen))[0]
        if self.kind in ("pq", "sh", "mi"):
            return qstate["rank"][:budget]
        # ivfpq: cells accumulate FIRST (always ≥1 cell), then ADC top-budget
        cum = 0
        chosen = []
        for c in qstate["cell_order"]:
            cum += int(self.counts[c])
            chosen.append(int(c))
            if cum >= budget:
                break
        rows = np.nonzero(np.isin(self.cells, chosen))[0]
        if not len(rows):
            return rows
        keep = np.lexsort((rows, qstate["scores"][rows]))[:budget]
        return rows[keep]


def simulate_candidates(
    kind: str, meta: dict[str, Any], S: np.ndarray, q: np.ndarray, budget: int
) -> np.ndarray:
    """One-shot convenience (parity tests): the sample-row indices the
    real scan would admit as candidates for ``q`` at ``budget``."""
    sim = _Sim(kind, meta, np.asarray(S, dtype=np.float64))
    return sim.admit(sim.query_state(np.asarray(q, dtype=np.float64)), budget)


def autofit_meta(
    kind: str,
    meta: dict[str, Any],
    sample: np.ndarray,
    distance_name: str = "euclidean",
    fracs: tuple[float, ...] = FIT_FRACS,
    k: int = FIT_K,
    target: float = FIT_TARGET,
    n_corpus: int | None = None,
) -> dict[str, Any]:
    """Measure recall at each frac on the build sample and set
    ``meta["frac_curve"]`` / ``meta["fitted_frac"]`` in place.

    Queries are sample rows spread across the (hash-ordered, so already
    pseudo-random) sample — query distribution ≈ data distribution, the
    standard self-query ANN calibration.  Ground truth per query is the
    sample's exact top-``k_eff`` under the index's refinement distance,
    with ``k_eff ≈ k·m/n`` correcting the sample-sparsity bias (see
    module docstring).  A sample smaller than MIN_FIT_SAMPLE skips the
    fit (the scan default then stays DEFAULT_FRAC).
    """
    m = len(sample)
    if m < MIN_FIT_SAMPLE:
        return meta
    S = np.asarray(sample, dtype=np.float64)
    n = int(n_corpus or meta.get("n") or m)
    k_eff = k if n <= m else max(2, int(round(k * m / n)))
    nq = int(np.clip(int(np.ceil(TARGET_POSITIVES / k_eff)), 8, 48))
    qidx = np.linspace(0, m - 1, num=min(nq, m), dtype=int)

    try:
        sim = _Sim(kind, meta, S)
    except ValueError:
        return meta
    budgets = {
        f: max(1, int(np.ceil(f * m))) for f in sorted(set(float(x) for x in fracs))
    }
    per_frac: dict[float, list[float]] = {f: [] for f in budgets}
    for qi in qidx:
        q = S[qi]
        # ground truth EXCLUDES the query row itself: every scan trivially
        # admits its own row (own cell / ADC rank 0), so including it
        # floors measured recall at ~1/k_eff exactly when k_eff is small
        # (large n/m) and fits cheaper fracs than the corpus justifies
        ranked = _rank_rows(np_distance(q, S, distance_name))
        truth = set(ranked[ranked != qi][:k_eff].tolist())
        qstate = sim.query_state(q)
        for f, b in budgets.items():
            cands = set(sim.admit(qstate, b).tolist())
            # the scan refines candidates EXACTLY, so recall is simply
            # the share of true neighbours admitted as candidates
            per_frac[f].append(len(cands & truth) / max(len(truth), 1))

    curve = [[f, round(float(np.mean(rs)), 4)] for f, rs in sorted(per_frac.items())]
    plateau = curve[-1][1]
    # the knee clause always fires by the last swept frac (r >= plateau),
    # so `fitted` is always one of the MEASURED points — never a value
    # outside the sweep (an earlier draft clamped to DEFAULT_FRAC, which
    # persisted an unmeasured budget when the caller swept only larger
    # fractions)
    fitted = next(f for f, r in curve if r >= target or r >= plateau - KNEE_EPS)
    meta["frac_curve"] = curve
    meta["fitted_frac"] = fitted
    return meta


# ---------------------------------------------------------------------------
# LSH: no frac knob (bucket membership is scale-proportional by itself) —
# its scan-time lever is the number of radius-jittered probe queries
# (``num_of_q``), which the same sample simulation can fit
# ---------------------------------------------------------------------------

MAX_NOQ = 8


def _lsh_query_buckets(meta: dict[str, Any], q: np.ndarray, noq: int) -> np.ndarray:
    """Bucket matrix for q plus its first ``noq`` jitters — EXACTLY the
    scan's construction (scan_lsh draws jitters from RandomState(seed+1)
    sequentially, so smaller noq values are prefixes of the same
    stream)."""
    from adampro_spark.index.lsh import _buckets

    rng = np.random.RandomState(meta["seed"] + 1)
    queries = [q]
    for _ in range(noq):
        if meta.get("distance") == "hamming":
            nflip = max(1, min(int(round(meta["radius"])), len(q)))
            qj = q.copy()
            flip = rng.choice(len(q), size=nflip, replace=False)
            qj[flip] += rng.standard_normal(nflip)
            queries.append(qj)
        else:
            dirv = rng.standard_normal(len(q))
            dirv /= np.linalg.norm(dirv) or 1.0
            queries.append(q + dirv * meta["radius"])
    return _buckets(np.array(queries), meta)  # ((1+noq) × ntables)


def simulate_lsh_candidates(
    meta: dict[str, Any], S: np.ndarray, q: np.ndarray, num_of_q: int
) -> np.ndarray:
    """Sample-row indices scan_lsh admits: rows whose bucket in ANY table
    equals ANY probe query's bucket for that table."""
    from adampro_spark.index.lsh import _buckets

    B = _buckets(np.asarray(S, dtype=np.float64), meta)  # (m × ntables)
    QB = _lsh_query_buckets(meta, np.asarray(q, dtype=np.float64), num_of_q)
    hit = np.zeros(len(S), dtype=bool)
    for t in range(meta["ntables"]):
        hit |= np.isin(B[:, t], QB[:, t])
    return np.nonzero(hit)[0]


def autofit_lsh_meta(
    meta: dict[str, Any],
    sample: np.ndarray,
    distance_name: str,
    k: int = FIT_K,
    target: float = FIT_TARGET,
    n_corpus: int | None = None,
) -> dict[str, Any]:
    """Measure recall AND candidate volume per probe count on the build
    sample, persist ``meta["noq_curve"] = [[noq, recall, cand_frac], …]``
    and ``meta["fitted_num_of_q"]`` — the smallest probe count meeting
    the knee-or-target criterion (extra probes past the knee only add
    candidate volume).  Same sparsity-corrected ground truth as
    :func:`autofit_meta`."""
    m = len(sample)
    if m < MIN_FIT_SAMPLE:
        return meta
    S = np.asarray(sample, dtype=np.float64)
    n = int(n_corpus or m)
    k_eff = k if n <= m else max(2, int(round(k * m / n)))
    nq = int(np.clip(int(np.ceil(TARGET_POSITIVES / k_eff)), 8, 48))
    qidx = np.linspace(0, m - 1, num=min(nq, m), dtype=int)

    from adampro_spark.index.lsh import _buckets

    B = _buckets(S, meta)
    per_noq: dict[int, list[float]] = {j: [] for j in range(MAX_NOQ + 1)}
    vol: dict[int, list[float]] = {j: [] for j in range(MAX_NOQ + 1)}
    for qi in qidx:
        q = S[qi]
        ranked = _rank_rows(np_distance(q, S, distance_name))
        truth = set(ranked[ranked != qi][:k_eff].tolist())
        QB = _lsh_query_buckets(meta, q, MAX_NOQ)
        hit = np.zeros(m, dtype=bool)
        for j in range(MAX_NOQ + 1):
            # probe j is cumulative: add query row j's buckets
            for t in range(meta["ntables"]):
                hit |= B[:, t] == QB[j, t]
            cands = set(np.nonzero(hit)[0].tolist())
            per_noq[j].append(len(cands & truth) / max(len(truth), 1))
            vol[j].append(len(cands) / m)
    curve = [
        [j, round(float(np.mean(per_noq[j])), 4), round(float(np.mean(vol[j])), 4)]
        for j in range(MAX_NOQ + 1)
    ]
    plateau = curve[-1][1]
    fitted = next(j for j, r, _v in curve if r >= target or r >= plateau - KNEE_EPS)
    meta["noq_curve"] = curve
    meta["fitted_num_of_q"] = int(fitted)
    return meta
