"""LSH index (p-stable hashing).

Parity targets: build ``lsh/LSHIndexGenerator.scala:27-77`` (radius = mean
per-point max pairwise training distance :55-60; hash family per distance:
Gaussian projections for Euclidean, Cauchy for Manhattan —
``hashfunction/EuclideanHashFunction.scala:13-35``, ``ManhattanHashFunction``;
``numHashes`` AND-combined per table via ``java.util.Arrays.hashCode % m``
— ``hashfunction/Hasher.scala:33-37``; ``numHashTables`` OR-combined), scan
``lsh/LSHIndex.scala:38-78`` (recompute buckets for q plus ``numOfQ``
radius-jittered queries, keep rows sharing a bucket in ANY table,
distance column 0 — candidates only).  Lossy (confidence 0.5).

Spark-first: the signature is a dense (rows × tables·hashes) matmul — the
one place where a Catalyst expression tree would be absurd (64·64
projections), so it is an Arrow-batched pandas UDF over numpy (SURVEY
§4.1: pandas UDFs only where expression forms can't work).  The scan-side
membership test IS an expression: ``exists(zip_with(sig, query_buckets,
array_contains))`` over a tiny literal matrix.

Deviation (documented): bucket arithmetic uses numpy int32 wraparound and
floored ``%`` instead of Java's truncated ``%`` — self-consistent between
build and scan, which is all bucket identity needs.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from adampro_spark.index._util import sample_matrix
from adampro_spark.operators.scan import DISTANCE_COL

FEATURE_COL = "ap_indexfeature"


def _radius(sample: np.ndarray, distance_name: str, cap: int = 300) -> float:
    """Mean over points of the max pairwise training distance
    (LSHIndexGenerator.scala:55-60), on a capped subsample (O(n²))."""
    S = sample[:cap].astype(np.float64)
    if distance_name == "manhattan":
        d = np.abs(S[:, None, :] - S[None, :, :]).sum(axis=2)
    elif distance_name == "hamming":
        d = (np.abs(S[:, None, :] - S[None, :, :]) > 1e-5).sum(axis=2).astype(float)
    else:
        d = np.sqrt(((S[:, None, :] - S[None, :, :]) ** 2).sum(axis=2))
    return float(d.max(axis=1).mean())


def _projections(
    dim: int, ntables: int, nhashes: int, distance_name: str, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    n = ntables * nhashes
    if distance_name == "manhattan":
        proj = rng.standard_cauchy(size=(dim, n))
    elif distance_name == "hamming":
        # bit-sampling family (HammingHashFunction: report one random
        # coordinate per hash) — a one-hot column picks the sampled dim;
        # rounding in _buckets discretizes it so equal-valued coordinates
        # share buckets, mirroring hamming's |x−y|>1e-5 element test
        proj = np.zeros((dim, n))
        dims = rng.randint(0, dim, size=n)
        proj[dims, np.arange(n)] = 1.0
    else:
        proj = rng.standard_normal(size=(dim, n))
    offs = rng.uniform(0.0, 1.0, size=n)  # offset/w = U(0,1) (EuclideanHashFunction:21)
    return proj, offs


def _buckets(V: np.ndarray, meta: dict[str, Any]) -> np.ndarray:
    """(rows × ntables) bucket ids: h = floor(v·proj/w + offset) % m per
    hash — the p-stable scheme floor((a·v + b)/w) with the BUILD RADIUS
    as the bucket width w (EuclideanHashFunction.scala:21), then a
    per-table Arrays.hashCode-style combine % m (Hasher.scala:33-37).

    The /w normalization is what makes bucketing SCALE-FREE (review r6:
    without it, granularity was a fixed 1.0 of the raw projection — a
    corpus scaled by 0.01 collapsed every row into one bucket, scaled by
    1000 it shattered true neighbors apart).  Hamming keeps w = 1 — its
    bit-sampling hash buckets on the (discretized) coordinate VALUE and
    must not rescale."""
    proj = np.asarray(meta["proj"], dtype=np.float64)
    offs = np.asarray(meta["offsets"], dtype=np.float64)
    m = meta["nbuckets"]
    nt, nh = meta["ntables"], meta["nhashes"]
    # Legacy compat (ADVICE r6): indexes persisted BEFORE the scale-free
    # /w change have no "width" in meta — their rows were bucketed with
    # the old rint(v·proj + offs) formula, so queries against them must
    # hash the same way or recall silently collapses.  Only metas that
    # carry an explicit width take the floor/w p-stable path.
    legacy = "width" not in meta
    w = float(meta.get("width") or 1.0)
    if meta.get("distance") == "hamming" or legacy or w <= 0.0:
        H = (np.rint(V.astype(np.float64) @ proj + offs).astype(np.int64) % m).astype(
            np.int32
        )
    else:
        H = (
            np.floor(V.astype(np.float64) @ proj / w + offs).astype(np.int64) % m
        ).astype(np.int32)
    H = H.reshape(len(V), nt, nh)
    hc = np.full((len(V), nt), 1, dtype=np.int32)
    with np.errstate(over="ignore"):
        for j in range(nh):
            hc = hc * np.int32(31) + H[:, :, j]
    return (hc.astype(np.int64) % m).astype(np.int32)


def build_lsh(
    df: DataFrame,
    vector_col: str,
    pk: str = "ap_id",
    distance_name: str = "euclidean",
    ntables: int = 16,
    nhashes: int = 8,
    nbuckets: int = 256,
    ntraining: int = 500,
    seed: int = 42,
    autofit: bool = True,
) -> tuple[DataFrame, dict[str, Any]]:
    """Defaults scaled down from the reference's 64×64 (a 4096-projection
    signature per row); 16×8 keeps the same OR-of-ANDs structure with far
    less build cost — override to match the reference exactly.
    """
    if distance_name not in ("euclidean", "manhattan", "hamming"):
        raise ValueError("LSH supports euclidean/manhattan/hamming")
    df = df.filter(F.col(vector_col).isNotNull())  # NULL vectors: no bucket
    first = df.select(vector_col).first()
    if first is None:
        raise ValueError("cannot build an LSH index over an empty table")
    dim = len(first[0])
    sample = sample_matrix(df, vector_col, ntraining, seed, pk=pk)
    proj, offs = _projections(dim, ntables, nhashes, distance_name, seed)

    meta = {
        "type": "lsh",
        "pk": pk,
        "distance": distance_name,
        "dim": dim,
        "ntables": ntables,
        "nhashes": nhashes,
        "nbuckets": nbuckets,
        "radius": _radius(sample, distance_name),
        # p-stable bucket width = the build radius (hamming: value-keyed)
        "width": (
            1.0
            if distance_name == "hamming"
            else max(_radius(sample, distance_name), 1e-9)
        ),
        "proj": proj.tolist(),
        "offsets": offs.tolist(),
        "seed": seed,
    }

    meta_local = dict(meta)  # captured by the UDF closure (no DataFrame refs)

    def _sig(vs):
        import pandas as pd

        V = np.array([np.asarray(x, dtype=np.float64) for x in vs])
        B = _buckets(V, meta_local)
        return pd.Series(list(B))

    sig_udf = F.pandas_udf(_sig, T.ArrayType(T.IntegerType()))

    indexed = df.select(pk, sig_udf(F.col(vector_col)).alias(FEATURE_COL))
    if autofit:
        # fit the probe count on an independent sample (seed+7): LSH has
        # no frac knob — bucket volume is scale-proportional already —
        # so its measured scan-time lever is the number of jitter probes
        from adampro_spark.index.autofit import autofit_lsh_meta

        meta["n"] = df.count()  # sparsity-corrects the fit's ground truth
        # float64: the fit simulates scan_lsh's bucket arithmetic, which
        # runs on full-precision vectors — a float32-rounded sample
        # buckets boundary rows differently than the built index would
        fit_sample = sample_matrix(
            df, vector_col, 1000, seed + 7, pk=pk, dtype=np.float64
        )
        autofit_lsh_meta(meta, fit_sample, distance_name, n_corpus=meta["n"])
    return indexed, meta


def scan_lsh(
    index_df: DataFrame,
    meta: dict[str, Any],
    query: list[float],
    k: int,
    num_of_q: int | None = None,
    prefilter: DataFrame | None = None,
) -> DataFrame:
    """Bucket-membership filter: row qualifies if ANY table's bucket equals
    the bucket of ANY of the (1 + numOfQ radius-jittered) queries
    (LSHIndex.scala:44-78).  Distance column = 0 — candidates only.

    No ``frac`` knob here (unlike eCP/PQ/SH/MI): bucket membership IS
    scale-proportional — each bucket holds ~n/nbuckets rows, so the
    candidate volume grows with the corpus already.  The recall PROFILE
    still drifts slowly with n (measured ~0.5 → ~0.35 over a 4× corpus
    at the scaled-down 16×8 defaults): more occupants per bucket raise
    the candidate count but not the per-bucket hit precision.  The levers
    at scale are the reference's own (more tables — it ships 64×64 — and
    ``num_of_q`` jitter probes), both of which ADD candidate volume
    proportionally; ``train_planner``'s recall curves + ``plan_knn``'s
    ``min_recall`` floor provide the measured guard.
    """
    pk = meta["pk"]
    if num_of_q is None:
        # build-time fitted probe count (autofit_lsh_meta); 3 = the
        # pre-fit default for legacy metas
        num_of_q = int(meta.get("fitted_num_of_q", 3))
    q = np.asarray(query, dtype=np.float64)
    rng = np.random.RandomState(meta["seed"] + 1)
    queries = [q]
    for _ in range(num_of_q):
        if meta["distance"] == "hamming":
            # hamming jitter: perturb ~radius random coordinates (moving
            # ALL coordinates would change every sampled-bit bucket)
            nflip = max(1, min(int(round(meta["radius"])), len(q)))
            qj = q.copy()
            flip = rng.choice(len(q), size=nflip, replace=False)
            qj[flip] += rng.standard_normal(nflip)
            queries.append(qj)
        else:
            dirv = rng.standard_normal(len(q))
            dirv /= np.linalg.norm(dirv) or 1.0
            queries.append(q + dirv * meta["radius"])
    B = _buckets(np.array(queries), meta)  # (nqueries × ntables)
    per_table = [[int(x) for x in set(B[:, t])] for t in range(meta["ntables"])]

    df = index_df
    if prefilter is not None:
        df = df.join(prefilter.select(pk), on=pk, how="left_semi")

    qb_lit = F.lit(per_table)
    match = F.exists(
        F.zip_with(F.col(FEATURE_COL), qb_lit, lambda b, qs: F.array_contains(qs, b)),
        lambda x: x,
    )
    return df.filter(match).withColumn(DISTANCE_COL, F.lit(0.0)).select(pk, DISTANCE_COL)


def lsh_knn(
    df: DataFrame,
    vector_col: str,
    index_df: DataFrame,
    meta: dict[str, Any],
    query: list[float],
    k: int,
    distance_name: str | None = None,
    num_of_q: int | None = None,
    prefilter: DataFrame | None = None,
) -> DataFrame:
    """Candidate scan → exact refinement.  Conform: build distance only
    (LSHIndex.scala:84-86)."""
    from adampro_spark.operators.scan import sequential_scan

    dn = distance_name or meta["distance"]
    cands = scan_lsh(index_df, meta, query, k, num_of_q=num_of_q, prefilter=prefilter)
    return sequential_scan(df, vector_col, query, k, dn, prefilter=cands, pk=meta["pk"])


def lsh_append(
    new_df: DataFrame,
    vector_col: str,
    meta: "dict[str, Any]",
) -> "tuple[DataFrame, dict[str, Any]]":
    """Incremental LSH maintenance (round 15 — the
    :func:`~adampro_spark.index.ecp.ecp_append` pattern): hash ONLY a
    new batch through the FROZEN projections/offsets/width — the exact
    build-time :func:`_buckets` Arrow pass — and return
    ``(new_index_rows, updated_meta)`` with ``n`` grown (the autofit
    probe count was fit at build and stays; LSH recall under
    distribution drift degrades gracefully, candidate math never
    breaks — the lossy-family contract)."""
    if meta.get("type") != "lsh":
        raise ValueError(
            f"lsh_append needs an lsh meta, got {meta.get('type')!r}"
        )
    pk = meta["pk"]
    batch = new_df.filter(F.col(vector_col).isNotNull())
    meta_local = {
        k: meta[k]
        for k in (
            "proj", "offsets", "nbuckets", "ntables", "nhashes", "distance",
        )
        if k in meta
    }
    if "width" in meta:
        meta_local["width"] = meta["width"]

    def _sig(vs):
        import pandas as pd

        V = np.array([np.asarray(x, dtype=np.float64) for x in vs])
        B = _buckets(V, meta_local)
        return pd.Series(list(B))

    sig_udf = F.pandas_udf(_sig, T.ArrayType(T.IntegerType()))
    indexed = batch.select(
        pk, sig_udf(F.col(vector_col)).alias(FEATURE_COL)
    ).localCheckpoint(eager=True)
    out = dict(meta)
    if "n" in out:
        out["n"] = int(out["n"]) + batch.count()
    return indexed, out
