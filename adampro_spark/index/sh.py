"""SH (spectral hashing) index.

Parity targets: build ``sh/SHIndexGenerator.scala:32-122`` (PCA of the
training sample, eigenfunction enumeration by simplified eigenvalue
(kπ/range)², ``nbits`` bit signature), hashing ``sh/SHUtils.scala:20-45``
(projV = v·pca − minProj; bit_i = sin(π/2 + (k_i·π/range_i)·projV[dim_i])
> 0), scan ``sh/SHIndex.scala:41-71`` (summed Hamming distance to the
query signature plus ``numOfQ`` radius-jittered query signatures, top
timesK·k).  Lossy (confidence 0.5); Euclidean-only conformity (:78-84).

Spark-first: row signatures are an Arrow-batched pandas UDF over the
same numpy kernel the query side uses (see build_sh docstring — the
expression form re-evaluates the PCA projection per bit, nbits × dim²
per row); the multi-query Hamming SCAN stays a pure expression — per bit
position, precompute the score contribution when the row bit is 0 vs 1
across all query signatures (cost0/cost1 arrays), so scan cost is one
zip_with, independent of numOfQ.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from adampro_spark.index._util import sample_matrix
from adampro_spark.operators.scan import DISTANCE_COL

FEATURE_COL = "ap_indexfeature"


def _train(sample: np.ndarray, nbits: int | None) -> dict[str, Any]:
    X = sample.astype(np.float64)
    dim = X.shape[1]
    nbits = nbits or dim * 2
    ncomp = min(dim, nbits)

    cov = np.cov(X, rowvar=False)
    w, v = np.linalg.eigh(cov)  # ascending
    eigv = v[:, ::-1][:, :ncomp]  # top ncomp, descending eigenvalue

    projected = X @ eigv
    min_p = projected.min(axis=0)
    max_p = projected.max(axis=0)
    ranges = max_p - min_p
    max_range = float(ranges.max()) or 1.0

    funcs: list[tuple[float, int, int, float]] = []
    for d in range(ncomp):
        r = float(ranges[d])
        if r <= 0:
            continue
        nmodes = int(math.ceil(r * ((nbits + 1) / max_range))) - 1
        for k in range(1, nmodes + 1):
            funcs.append(((k * math.pi / r) ** 2, d, k, r))
    funcs.sort(key=lambda t: t[0])
    funcs = funcs[:nbits]

    return {
        "pca": eigv.tolist(),
        "min_proj": min_p.tolist(),
        "max_proj": max_p.tolist(),
        "eigenfunctions": [[d, k, r] for _, d, k, r in funcs],
        "radius": (0.1 * ranges).tolist(),
        "nbits": len(funcs),
    }


def _np_signature(V: np.ndarray, meta: dict[str, Any]) -> np.ndarray:
    eigv = np.asarray(meta["pca"], dtype=np.float64)
    minp = np.asarray(meta["min_proj"], dtype=np.float64)
    P = V.astype(np.float64) @ eigv - minp
    bits = np.zeros((len(V), meta["nbits"]), dtype=np.int32)
    for i, (d, k, r) in enumerate(meta["eigenfunctions"]):
        bits[:, i] = (np.sin(math.pi / 2.0 + (k * math.pi / r) * P[:, d]) > 0).astype(
            np.int32
        )
    return bits


def build_sh(
    df: DataFrame,
    vector_col: str,
    pk: str = "ap_id",
    nbits: int | None = None,
    ntraining: int = 5000,
    seed: int = 42,
    autofit: bool = True,
) -> tuple[DataFrame, dict[str, Any]]:
    """Row signatures via an Arrow-batched pandas UDF sharing
    ``_np_signature`` with the query side (bit-identical by construction).

    The expression form (``_sig_expr``) re-evaluates the full PCA
    projection inside every per-bit lambda body (HOF lambdas don't CSE:
    nbits × dim² multiplies per row); the numpy path is one (dim × nbits)
    matmul per batch — the LSH-projection precedent (index/lsh.py).
    Signatures only gate candidates (scan refines exactly), so
    self-consistency is the only requirement.
    """
    from pyspark.sql import types as T

    df = df.filter(F.col(vector_col).isNotNull())  # NULL vectors: no signature
    sample = sample_matrix(df, vector_col, ntraining, seed, pk=pk)
    meta = _train(sample, nbits)
    meta.update({"type": "sh", "pk": pk, "seed": seed, "n": df.count()})
    meta_local = {
        k: meta[k] for k in ("pca", "min_proj", "eigenfunctions", "nbits")
    }

    def _sig(vs):
        import pandas as pd

        V = np.array([np.asarray(x, dtype=np.float64) for x in vs])
        return pd.Series(list(_np_signature(V, meta_local)))

    sig_udf = F.pandas_udf(_sig, T.ArrayType(T.IntegerType()))
    indexed = df.select(pk, sig_udf(F.col(vector_col)).alias(FEATURE_COL))
    if autofit:
        # fit on an INDEPENDENT sample (seed+7): the eigenfunctions were
        # trained on `sample`, so measuring recall there biases optimistic
        from adampro_spark.index.autofit import autofit_meta

        fit_sample = sample_matrix(df, vector_col, 1000, seed + 7, pk=pk)
        autofit_meta("sh", meta, fit_sample)
    return indexed, meta


def scan_sh(
    index_df: DataFrame,
    meta: dict[str, Any],
    query: list[float],
    k: int,
    num_of_q: int = 3,
    times_k: int = 5,
    prefilter: DataFrame | None = None,
    frac: float | str | None = "auto",
) -> DataFrame:
    """Summed Hamming distance to 1 + numOfQ query signatures, top timesK·k
    (``frac`` → scale-proportional budget, see candidate_budget)."""
    from adampro_spark.index._util import candidate_budget

    want = candidate_budget(times_k, k, frac, meta, index_df)
    pk = meta["pk"]
    q = np.asarray(query, dtype=np.float64)
    rng = np.random.RandomState(meta["seed"] + 1)
    radius = np.asarray(meta["radius"], dtype=np.float64)
    # jitter in ORIGINAL space: move by per-component radius mapped back is
    # not invertible, so move by radius-scaled random direction (the
    # reference jitters in original space with its projected radius too).
    queries = [q] + [
        q + rng.standard_normal(len(q)) * float(np.mean(radius)) for _ in range(num_of_q)
    ]
    QS = _np_signature(np.array(queries), meta)  # (nq × nbits)
    nq = len(queries)
    cost1 = (nq - QS.sum(axis=0)).astype(float).tolist()  # row bit 1: queries with 0
    cost0 = QS.sum(axis=0).astype(float).tolist()  # row bit 0: queries with 1

    df = index_df
    if prefilter is not None:
        df = df.join(prefilter.select(pk), on=pk, how="left_semi")

    c1 = F.lit(cost1)
    sig = F.col(FEATURE_COL)
    score = F.aggregate(
        F.zip_with(
            F.zip_with(sig, c1, lambda b, a: F.struct(b.alias("b"), a.alias("c1"))),
            F.lit(cost0),
            lambda s, c0: F.when(s["b"] == 1, s["c1"]).otherwise(c0),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        df.withColumn(DISTANCE_COL, score)
        .orderBy(F.col(DISTANCE_COL).asc(), F.col(pk).asc())
        .limit(want)
        .select(pk, DISTANCE_COL)
    )


def sh_knn(
    df: DataFrame,
    vector_col: str,
    index_df: DataFrame,
    meta: dict[str, Any],
    query: list[float],
    k: int,
    num_of_q: int = 3,
    times_k: int = 5,
    prefilter: DataFrame | None = None,
    frac: float | str | None = "auto",
) -> DataFrame:
    """Candidate scan → exact refinement.  Euclidean-only conformity
    (SHIndex.scala:78-84)."""
    from adampro_spark.operators.scan import sequential_scan

    cands = scan_sh(
        index_df, meta, query, k, num_of_q=num_of_q, times_k=times_k,
        prefilter=prefilter, frac=frac,
    )
    return sequential_scan(
        df, vector_col, query, k, "euclidean", prefilter=cands, pk=meta["pk"]
    )


def sh_append(
    new_df: DataFrame,
    vector_col: str,
    meta: "dict[str, Any]",
) -> "tuple[DataFrame, dict[str, Any]]":
    """Incremental SH maintenance (round 15 — the
    :func:`~adampro_spark.index.ecp.ecp_append` pattern): signature
    ONLY the new batch through the FROZEN PCA/eigenfunctions — the
    exact build-time :func:`_np_signature` Arrow pass, bit-identical to
    a rebuild with this model — and return ``(new_index_rows,
    updated_meta)`` with ``n`` grown.  The trained model never moves
    (that is a rebuild); drift degrades signature selectivity (recall),
    never the exact refinement."""
    if meta.get("type") != "sh":
        raise ValueError(
            f"sh_append needs an sh meta, got {meta.get('type')!r}"
        )
    from pyspark.sql import types as T

    pk = meta["pk"]
    batch = new_df.filter(F.col(vector_col).isNotNull())
    meta_local = {
        k: meta[k] for k in ("pca", "min_proj", "eigenfunctions", "nbits")
    }

    def _sig(vs):
        import pandas as pd

        V = np.array([np.asarray(x, dtype=np.float64) for x in vs])
        return pd.Series(list(_np_signature(V, meta_local)))

    sig_udf = F.pandas_udf(_sig, T.ArrayType(T.IntegerType()))
    indexed = batch.select(
        pk, sig_udf(F.col(vector_col)).alias(FEATURE_COL)
    ).localCheckpoint(eager=True)
    out = dict(meta)
    if "n" in out:
        out["n"] = int(out["n"]) + batch.count()
    return indexed, out
