"""Vector distance library — Catalyst-native column expressions.

Parity target: the 14 distance functions of the reference
(``query/distance/*.scala``, registry ``communication/rpc/MessageParser.scala:314-341``).
The reference computes them in row-at-a-time Scala UDFs
(``query/distance/Distance.scala:26-55``); here each distance is a pure
Column expression over ``array<float>`` built from higher-order functions
(``zip_with`` / ``aggregate`` / ``transform``), so the whole kNN scan stays
inside whole-stage codegen with no serialization boundary — the single
biggest throughput win over the reference at scale.

Semantics preserved (see each function's docstring for the file:line cite):
  * storage is Float, math is Double (``Distance.scala:18-19``);
  * a NULL vector row yields ``Double.MaxValue`` rather than an error
    (``Distance.scala:26-38``);
  * weights multiply per-element terms; functions that ignore weights in the
    reference ignore them here too (cosine/correlation/jaccard/spannorm/
    haversine/kullbackleibler — the first five log a warning in the reference,
    KL's element() silently drops its weight argument);
  * zero-guards match (cosine 0-norm -> 0, chi² x+y<=0 -> 0, KL zero -> 0).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

DOUBLE_MAX = 1.7976931348623157e308

VectorLike = Column | str | Sequence[float]


def _as_vec(v: VectorLike) -> Column:
    """Coerce a column name / Column / python sequence to an array<double> Column."""
    if isinstance(v, Column):
        return v.cast("array<double>")
    if isinstance(v, str):
        return F.col(v).cast("array<double>")
    return F.array(*[F.lit(float(x)) for x in v]).cast("array<double>")


def _sum(arr: Column) -> Column:
    """Sum an array<double> column (map-side, per-row, codegen'd).

    ``coalesce(x, 0)`` absorbs the nulls ``zip_with`` pads in when the two
    vectors differ in length, matching the reference's loop over the common
    prefix (ElementwiseSummedDistanceFunction.scala:40-44) instead of
    propagating NULL distances that would sort ahead of real ones.
    """
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + F.coalesce(x, F.lit(0.0)))


def _weighted(terms: Column, weights: VectorLike | None) -> Column:
    if weights is None:
        return terms
    return F.zip_with(terms, _as_vec(weights), lambda t, w: t * w)


def _null_guard(vec: Column, expr: Column) -> Column:
    """NULL vector -> Double.MaxValue, never an error (Distance.scala:26-38)."""
    return F.when(vec.isNull(), F.lit(DOUBLE_MAX)).otherwise(expr)


# ---------------------------------------------------------------------------
# Norm-based family (NormBasedDistance.scala)
# ---------------------------------------------------------------------------

def minkowski(
    vec: VectorLike, query: VectorLike, p: float, weights: VectorLike | None = None
) -> Column:
    """(sum w_i * |x_i - q_i|^p)^(1/p) — MinkowskiDistance (NormBasedDistance.scala:26-30)."""
    v, q = _as_vec(vec), _as_vec(query)
    if abs(p - 1.0) < 1e-5:
        terms = F.zip_with(v, q, lambda a, b: F.abs(a - b))
    elif abs(p - 2.0) < 1e-5:
        terms = F.zip_with(v, q, lambda a, b: (a - b) * (a - b))
    else:
        terms = F.zip_with(v, q, lambda a, b: F.pow(F.abs(a - b), F.lit(float(p))))
    s = _sum(_weighted(terms, weights))
    if abs(p - 1.0) < 1e-5:
        out = s
    elif abs(p - 2.0) < 1e-5:
        out = F.sqrt(s)
    else:
        out = F.pow(s, F.lit(1.0 / float(p)))
    return _null_guard(v, out)


def manhattan(vec: VectorLike, query: VectorLike, weights: VectorLike | None = None) -> Column:
    """sum w*|x-q| (NormBasedDistance.scala:35-37)."""
    return minkowski(vec, query, 1.0, weights)


def euclidean(vec: VectorLike, query: VectorLike, weights: VectorLike | None = None) -> Column:
    """sqrt(sum w*(x-q)^2) (NormBasedDistance.scala:42-47)."""
    return minkowski(vec, query, 2.0, weights)


def squaredeuclidean(
    vec: VectorLike, query: VectorLike, weights: VectorLike | None = None
) -> Column:
    """sum w*(x-q)^2, no root (NormBasedDistance.scala:52-58)."""
    v, q = _as_vec(vec), _as_vec(query)
    terms = F.zip_with(v, q, lambda a, b: (a - b) * (a - b))
    return _null_guard(v, _sum(_weighted(terms, weights)))


def chebyshev(vec: VectorLike, query: VectorLike, weights: VectorLike | None = None) -> Column:
    """max |w*(x-q)| (NormBasedDistance.scala:63-71; weights multiply before abs)."""
    v, q = _as_vec(vec), _as_vec(query)
    diffs = F.zip_with(v, q, lambda a, b: a - b)
    diffs = _weighted(diffs, weights)
    return _null_guard(v, F.array_max(F.transform(diffs, lambda d: F.abs(d))))


# ---------------------------------------------------------------------------
# Angular / statistical family
# ---------------------------------------------------------------------------

def _dot(a: Column, b: Column) -> Column:
    return _sum(F.zip_with(a, b, lambda x, y: x * y))


def cosine(vec: VectorLike, query: VectorLike, weights: VectorLike | None = None) -> Column:
    """1 - x.q/(|x||q|); any zero-norm side -> 0 (CosineDistance.scala:16-29).

    Weights ignored, as in the reference.
    """
    v, q = _as_vec(vec), _as_vec(query)
    nv, nq = F.sqrt(_dot(v, v)), F.sqrt(_dot(q, q))
    expr = F.when((nv < 1e-5) | (nq < 1e-5), F.lit(0.0)).otherwise(
        F.lit(1.0) - _dot(v, q) / (nv * nq)
    )
    return _null_guard(v, expr)


def _centered(a: Column) -> Column:
    mean = _sum(a) / F.size(a).cast("double")
    return F.transform(a, lambda x: x - mean)


def correlation(vec: VectorLike, query: VectorLike, weights: VectorLike | None = None) -> Column:
    """cosine(x - mean(x), q - mean(q)) (CorrelationDistance.scala:16-24). Weights ignored."""
    v, q = _as_vec(vec), _as_vec(query)
    return _null_guard(v, cosine(_centered(v), _centered(q)))


def chisquared(vec: VectorLike, query: VectorLike, weights: VectorLike | None = None) -> Column:
    """sum w*(x-q)^2/(x+q) where x+q>0 else 0 (ChiSquaredDistance.scala)."""
    v, q = _as_vec(vec), _as_vec(query)
    terms = F.zip_with(
        v, q,
        lambda a, b: F.when(a + b > 0, (a - b) * (a - b) / (a + b)).otherwise(F.lit(0.0)),
    )
    return _null_guard(v, _sum(_weighted(terms, weights)))


def hamming(vec: VectorLike, query: VectorLike, weights: VectorLike | None = None) -> Column:
    """sum w*[|x-q| > 1e-5] (HammingDistance.scala)."""
    v, q = _as_vec(vec), _as_vec(query)
    terms = F.zip_with(
        v, q, lambda a, b: F.when(F.abs(a - b) > 1e-5, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    return _null_guard(v, _sum(_weighted(terms, weights)))


def jaccard(vec: VectorLike, query: VectorLike, weights: VectorLike | None = None) -> Column:
    """1 - sum(min)/sum(max) (JaccardDistance.scala:17-29). Weights ignored."""
    v, q = _as_vec(vec), _as_vec(query)
    smin = _sum(F.zip_with(v, q, lambda a, b: F.least(a, b)))
    smax = _sum(F.zip_with(v, q, lambda a, b: F.greatest(a, b)))
    # sum(max) == 0 guard: Spark 4's default ANSI mode turns the division
    # into DIVIDE_BY_ZERO and aborts the scan (review r6, reproduced);
    # define the distance as 0 there (identical all-zero overlap), the
    # oracle mirror carries the same guard
    return _null_guard(
        v, F.when(smax == 0.0, F.lit(0.0)).otherwise(F.lit(1.0) - smin / smax)
    )


def kullbackleibler(
    vec: VectorLike, query: VectorLike, weights: VectorLike | None = None
) -> Column:
    """sum x*log(x/q), zero-guarded per element (KullbackLeiblerDivergence.scala).

    NB the reference sums element(v1_q, v2) with v1_q = query, v2 = row vector,
    i.e. the divergence is computed FROM the query TO the row: q*log(q/x).
    Weights are IGNORED: the reference's ``element(v1, v2, w)`` override drops
    ``w`` entirely (KullbackLeiblerDivergence.scala:15-21).
    """
    v, q = _as_vec(vec), _as_vec(query)
    terms = F.zip_with(
        q, v,
        lambda a, b: F.when((F.abs(a) < 1e-5) | (F.abs(b) < 1e-5), F.lit(0.0)).otherwise(
            a * F.log(a / b)
        ),
    )
    return _null_guard(v, _sum(terms))


def spannorm(vec: VectorLike, query: VectorLike, weights: VectorLike | None = None) -> Column:
    """max(x-q) - min(x-q) (SpanNormDistance.scala:16-23). Weights ignored."""
    v, q = _as_vec(vec), _as_vec(query)
    diffs = F.zip_with(v, q, lambda a, b: a - b)
    return _null_guard(v, F.array_max(diffs) - F.array_min(diffs))


def modulo(vec: VectorLike, query: VectorLike, weights: VectorLike | None = None) -> Column:
    """sum w*(x mod q_elem) with query element as divisor base (ModuloDistance.scala:
    element(v1_q, v2, w) = w * (v2 % v1_q) where v1_q is the query element)."""
    v, q = _as_vec(vec), _as_vec(query)
    # zero-divisor guard: ANSI mode aborts with REMAINDER_BY_ZERO on any
    # zero query element (review r6, reproduced; the reference's Java
    # double % 0 NaNs instead) — a zero divisor contributes 0
    terms = F.zip_with(
        v, q, lambda a, b: F.when(b == 0.0, F.lit(0.0)).otherwise(a % b)
    )
    return _null_guard(v, _sum(_weighted(terms, weights)))


_EARTH_RADIUS = 6371000.0


def haversine(vec: VectorLike, query: VectorLike, weights: VectorLike | None = None) -> Column:
    """Great-circle metres between (lat,lng) in the first two dims
    (HaversineDistance.scala:22-66): clamp lat to [-90,90], normalize lng to
    [-180,180), spherical earth R=6371000.  <2 dims -> +Inf.  Weights ignored.
    """
    v, q = _as_vec(vec), _as_vec(query)

    def _lat(a: Column) -> Column:
        return F.radians(F.greatest(F.lit(-90.0), F.least(F.lit(90.0), a.getItem(0))))

    def _lng(a: Column) -> Column:
        m = ((a.getItem(1) % 360.0) + 360.0) % 360.0
        return F.radians(F.when(m < 180.0, m).otherwise(m - 360.0))

    lat1, lng1, lat2, lng2 = _lat(v), _lng(v), _lat(q), _lng(q)
    dphi, dlmb = lat2 - lat1, lng2 - lng1
    a = (
        F.sin(dphi / 2.0) * F.sin(dphi / 2.0)
        + F.cos(lat1) * F.cos(lat2) * F.sin(dlmb / 2.0) * F.sin(dlmb / 2.0)
    )
    dist = 2.0 * _EARTH_RADIUS * F.atan2(F.sqrt(a), F.sqrt(1.0 - a))
    expr = F.when(
        (F.size(v) < 2) | (F.size(q) < 2), F.lit(float("inf"))
    ).otherwise(dist)
    return _null_guard(v, expr)


# ---------------------------------------------------------------------------
# Registry — mirrors the gRPC DistanceType registry (MessageParser.scala:314-341)
# ---------------------------------------------------------------------------

DISTANCES: dict[str, Callable[..., Column]] = {
    "manhattan": manhattan,
    "euclidean": euclidean,
    "squaredeuclidean": squaredeuclidean,
    "chebyshev": chebyshev,
    "cosine": cosine,
    "correlation": correlation,
    "chisquared": chisquared,
    "hamming": hamming,
    "jaccard": jaccard,
    "kullbackleibler": kullbackleibler,
    "spannorm": spannorm,
    "modulo": modulo,
    "haversine": haversine,
}


def distance(
    name: str,
    vec: VectorLike,
    query: VectorLike,
    weights: VectorLike | None = None,
    p: float | None = None,
) -> Column:
    """Look up a distance by name (``minkowski`` additionally takes ``p``)."""
    if name == "minkowski":
        if p is None:
            raise ValueError("minkowski distance requires p")
        return minkowski(vec, query, p, weights)
    fn = DISTANCES.get(name)
    if fn is None:
        raise ValueError(f"unknown distance {name!r}; known: {sorted(DISTANCES)}")
    return fn(vec, query, weights)
