"""Driver-side ML models for the learned query planner.

Parity targets: ``utils/ml/PegasosSVM.scala:24-86`` and
``utils/ml/Regression.scala:28-120`` — the models behind the reference's
``svm`` and ``lr`` planner heuristics (SVMPlannerHeuristics.scala:29-120,
RegressionPlannerHeuristics.scala:28-80).  Both predict QUERY TIME from a
small feature vector; the planner then routes to the path with the lowest
predicted time.

These are deliberately NOT Spark jobs: training data is a handful of
measured executions (features are 4 floats), so the models live on the
driver and serialize into the JSON catalog as plain coefficient lists.
The reference itself ships the same shape — PegasosSVM is an in-memory
breeze vector; its Regression delegates to MLlib but over an RDD of
tens of rows.  A closed-form least-squares fit (``LinearModel``) is the
honest equivalent; spinning up distributed SGD for a 4-float regression
would be cargo cult.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class TrainingSample:
    """``utils/ml/PegasosSVM.scala:9`` — (feature vector, measured time)."""

    f: np.ndarray
    time: float


def build_features(count: int, dims: int, k: int) -> np.ndarray:
    """Planner feature vector (RegressionPlannerHeuristics.scala:157-192:
    normalized-capped entity count, vector dimensionality, query k, plus a
    bias term so a constant-time path is learnable)."""
    return np.array(
        [
            1.0,
            min(1.0, count / 500_000_000.0),
            min(1.0, dims / 10_000.0),
            min(1.0, k / 1_000.0),
        ]
    )


class PegasosSVM:
    """Epsilon-insensitive linear model trained by Pegasos-style
    mini-batch subgradient steps (PegasosSVM.scala:24-86; S. Shalev-Shwartz
    et al., "Pegasos: Primal Estimated sub-GrAdient SOlver for SVM", 2011).

    Kept faithful to the reference's (regression-flavored) variant: each
    mini-batch accumulates ``x · max(0, |y − w·x| − ε)`` and steps
    ``w ← w(1 − 1/t) + batchW / (|batch| · t · λ)``; the outer loop
    shuffles, splits 80/20 and stops when the held-out MSE stops moving.
    The reference seeds from ``scala.util.Random``; we take an explicit
    seed so training is reproducible.
    """

    MAX_ITER = 5000

    def __init__(
        self,
        dims: int,
        lamb: float = 0.01,
        batch_size: int = 5,
        epsilon: float = 0.01,
        seed: int = 42,
    ):
        # reference defaults epsilon=100, lambda=1 are tuned for times in
        # MILLISECONDS (PlannerHeuristics measures currentTimeMillis
        # deltas); we measure seconds, so the dead zone scales down, and
        # the weight decay — whose fixpoint is y·|f|²/(λ+|f|²), i.e. a
        # shrinkage of the prediction by λ/(λ+|f|²) — drops to 0.01 so
        # predicted times stay calibrated for ~unit-norm planner features
        # (ranking is λ-invariant; calibration is not).
        self.dims = dims
        self.lamb = lamb
        self.batch_size = batch_size
        self.epsilon = epsilon
        self.w = np.zeros(dims)
        self.t = 1
        self._rng = np.random.RandomState(seed)

    def _step(self, batch: list[TrainingSample]) -> None:
        batch_w = np.zeros(self.dims)
        for s in batch:
            loss = max(0.0, abs(s.time - float(self.w @ s.f)) - self.epsilon)
            # subgradient sign: move w·x TOWARD y (the reference drops the
            # sign and relies on small t·λ steps; with it, convergence is
            # monotone instead of oscillating — documented deviation)
            batch_w += s.f * loss * np.sign(s.time - float(self.w @ s.f))
        self.w = self.w * (1.0 - 1.0 / self.t) + batch_w / (
            len(batch) * self.t * self.lamb
        )
        self.t += 1

    def train(self, data: list[TrainingSample]) -> None:
        if not data:
            return
        if len(data) <= self.batch_size:
            self._step(list(data))
            return
        # the reference's loop guard `(mse-changed && t < 100) || t < 5000`
        # keeps iterating until t reaches MAX_ITER no matter what the MSE
        # does (PegasosSVM.scala:40-50) — with the 1/(t·λ) step decay that
        # is exactly what drives w·x onto the target, so keep it
        while self.t < self.MAX_ITER:
            idx = self._rng.permutation(len(data))
            cut = max(1, int(0.8 * len(data)))
            train_part = [data[i] for i in idx[:cut]]
            for i in range(0, len(train_part), self.batch_size):
                self._step(train_part[i : i + self.batch_size])

    def mse(self, data: list[TrainingSample]) -> float:
        if not data:
            return 0.0
        return float(
            np.mean([(s.time - self.test(s.f)) ** 2 for s in data])
        )

    def test(self, f: np.ndarray) -> float:
        return float(self.w @ np.asarray(f, dtype=float))

    # --- catalog (de)serialization ------------------------------------
    def to_weights(self) -> list[float]:
        return [float(x) for x in self.w]

    @classmethod
    def from_weights(cls, w: list[float]) -> "PegasosSVM":
        m = cls(len(w))
        m.w = np.asarray(w, dtype=float)
        return m


class LinearModel:
    """Least-squares linear regression (Regression.scala:103-120: the
    reference's default ``lin`` algorithm, MLlib LinearRegressionWithSGD
    over a driver-sized sample — solved closed-form here via lstsq, with a
    tiny L2 ridge so near-collinear planner features stay stable)."""

    def __init__(self, w: np.ndarray | None = None):
        self.w = w

    def train(self, data: list[TrainingSample], ridge: float = 1e-8) -> None:
        if not data:
            return
        X = np.vstack([s.f for s in data])
        y = np.array([s.time for s in data])
        A = X.T @ X + ridge * np.eye(X.shape[1])
        self.w = np.linalg.solve(A, X.T @ y)

    def test(self, f: np.ndarray) -> float:
        if self.w is None:
            raise ValueError("model not trained")
        return float(self.w @ np.asarray(f, dtype=float))

    def to_weights(self) -> list[float]:
        return [float(x) for x in (self.w if self.w is not None else [])]

    @classmethod
    def from_weights(cls, w: list[float]) -> "LinearModel":
        return cls(np.asarray(w, dtype=float))


MODELS = {"svm": PegasosSVM, "lr": LinearModel}


def load_model(kind: str, weights: list[float]):
    return MODELS[kind].from_weights(weights)
