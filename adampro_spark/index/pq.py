"""PQ (product quantization) index.

Parity targets: build ``pq/PQIndexGenerator.scala:33-88`` (split dims into
``nsq`` sub-vectors, per-split k-means, row → code per split), scan
``pq/PQIndex.scala:33-64`` (broadcast per-split query→centroid distance
table, ADC score = Σ table lookups, top timesK·k).  Lossy (confidence 0.5).

Reference bug NOT copied (SURVEY §7.4): ``2 ^ nsqbits`` is Scala XOR = 10
clusters, not 256 — we use a real ``2**nsqbits`` (capped by the training
sample size).

Spark-first: per-split code assignment and the ADC sum are codegen'd
higher-order-function expressions over literal centroid/lookup tables —
the reference uses two row-at-a-time UDFs.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from adampro_spark.index._util import kmeans, sample_matrix
from adampro_spark.operators.scan import DISTANCE_COL

FEATURE_COL = "ap_indexfeature"


def _split_bounds(dim: int, nsq: int) -> list[tuple[int, int]]:
    """Sub-vector [start, len) per split — ``grouped(dim/nsq)`` like the
    reference (PQIndexGenerator.scala:43), so a non-dividing nsq yields a
    trailing shorter split."""
    step = max(1, dim // nsq)
    return [(s, min(step, dim - s)) for s in range(0, dim, step)]


def build_pq(
    df: DataFrame,
    vector_col: str,
    pk: str = "ap_id",
    nsq: int = 8,
    nsqbits: int = 8,
    ntraining: int = 1000,
    seed: int = 42,
    autofit: bool = True,
) -> tuple[DataFrame, dict[str, Any]]:
    df = df.filter(F.col(vector_col).isNotNull())  # NULL vectors: no codes
    first = df.select(vector_col).first()
    dim = len(first[0])
    n_rows = df.count()  # lets frac= scans size their budget without a job
    sample = sample_matrix(df, vector_col, ntraining, seed, pk=pk)

    bounds = _split_bounds(dim, nsq)
    nclusters = min(1 << nsqbits, max(2, sample.shape[0] // 2))
    codebooks = [
        kmeans(sample[:, s : s + ln], nclusters, seed=seed + i)
        for i, (s, ln) in enumerate(bounds)
    ]

    # per-split nearest-centroid assignment as ONE Arrow-batched pandas
    # UDF: an (nclusters × sublen) distance matmul per split per batch.
    # The expression form walks nsq × nclusters × sublen ≈ 16k interpreted
    # lambda evals per ROW (HOFs are CodegenFallback) — ~10 s at 500 rows;
    # the numpy argmin is first-minimum like array_position(array_min),
    # and codes only gate candidates (the scan refines exactly).
    from pyspark.sql import types as T

    cb_local = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    bounds_local = list(bounds)

    def _codes(vs):
        import pandas as pd

        out = []
        Vs = [np.asarray(x, dtype=np.float64) for x in vs]
        if not Vs:
            return pd.Series(out)
        V = np.stack(Vs)
        code_cols = []
        for (s, ln), cb in zip(bounds_local, cb_local):
            sub = V[:, s : s + ln]
            d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            code_cols.append(d2.argmin(axis=1).astype(np.int32))
        C = np.stack(code_cols, axis=1)  # (n × nsq)
        return pd.Series(list(C))

    codes_udf = F.pandas_udf(_codes, T.ArrayType(T.IntegerType()))
    indexed = df.select(pk, codes_udf(F.col(vector_col)).alias(FEATURE_COL))

    meta = {
        "type": "pq",
        "pk": pk,
        "dim": dim,
        "n": n_rows,
        "nsq": nsq,
        "bounds": [list(b) for b in bounds],
        "codebooks": [cb.tolist() for cb in codebooks],
    }
    if autofit:
        # fit on an INDEPENDENT sample (seed+7): the k-means codebooks
        # minimize quantization error on the training rows, so measuring
        # recall on those same rows would bias the curve optimistic
        from adampro_spark.index.autofit import autofit_meta

        fit_sample = sample_matrix(df, vector_col, 1000, seed + 7, pk=pk)
        autofit_meta("pq", meta, fit_sample)
    return indexed, meta


def _adc_expr(meta: dict[str, Any], query: list[float], p: float) -> Column:
    """ADC score: Σ_s dist(q_sub_s, centroid[code_s]) with the per-split
    distance INCLUDING the Minkowski root, as the reference does
    (PQIndex.scala:40-47 applies the full distance per split and sums)."""
    q = np.asarray(query, dtype=np.float64)
    flat: list[float] = []
    offsets: list[int] = []
    off = 0
    for (s, ln), cb in zip(meta["bounds"], meta["codebooks"]):
        qs = q[s : s + ln]
        cbm = np.asarray(cb, dtype=np.float64)
        d = (np.abs(cbm - qs) ** p).sum(axis=1) ** (1.0 / p)
        offsets.append(off)
        flat.extend(float(x) for x in d)
        off += len(cb)
    off_lit = F.lit(offsets)
    terms = F.zip_with(
        F.col(FEATURE_COL),
        off_lit,
        lambda c, o: F.element_at(F.col("_ap_adc"), o + c + 1),
    )
    return F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x), flat


def scan_pq(
    index_df: DataFrame,
    meta: dict[str, Any],
    query: list[float],
    k: int,
    p: float = 2.0,
    times_k: int = 5,
    prefilter: DataFrame | None = None,
    frac: float | str | None = "auto",
) -> DataFrame:
    """ADC candidate top-(timesK·k) by table-lookup distance
    (PQIndex.scala:50-64) — TakeOrderedAndProject, no shuffle.
    ``frac`` switches to the scale-proportional budget (candidate_budget)."""
    from adampro_spark.index._util import attach_lut, candidate_budget

    pk = meta["pk"]
    # the build-time fitted fraction was measured under p=2 ADC ranking
    # (autofit.py); a different Minkowski power reorders candidates, so
    # its budget falls back to the conservative default rather than
    # trusting a curve that was never measured for it
    budget_meta = (
        meta if p == 2.0 else {k_: v for k_, v in meta.items() if k_ != "fitted_frac"}
    )
    want = candidate_budget(times_k, k, frac, budget_meta, index_df)
    df = index_df
    if prefilter is not None:
        df = df.join(prefilter.select(pk), on=pk, how="left_semi")
    expr, flat = _adc_expr(meta, query, p)
    scored = attach_lut(df, _ap_adc=flat).withColumn(DISTANCE_COL, expr)
    return (
        scored.orderBy(F.col(DISTANCE_COL).asc(), F.col(pk).asc())
        .limit(want)
        .select(pk, DISTANCE_COL)
    )


_P = {"manhattan": 1.0, "euclidean": 2.0, "squaredeuclidean": 2.0}


def pq_knn(
    df: DataFrame,
    vector_col: str,
    index_df: DataFrame,
    meta: dict[str, Any],
    query: list[float],
    k: int,
    distance_name: str = "euclidean",
    times_k: int = 5,
    prefilter: DataFrame | None = None,
    frac: float | str | None = "auto",
) -> DataFrame:
    """Candidate scan → exact refinement.  Minkowski-only
    (PQIndex.isQueryConform, :67-73)."""
    from adampro_spark.operators.scan import sequential_scan

    p = _P.get(distance_name)
    if p is None:
        raise ValueError(f"PQ index only supports Minkowski distances, got {distance_name!r}")
    cands = scan_pq(
        index_df, meta, query, k, p=p, times_k=times_k, prefilter=prefilter, frac=frac
    )
    return sequential_scan(df, vector_col, query, k, distance_name, prefilter=cands, pk=meta["pk"])


def pq_append(
    new_df: DataFrame,
    vector_col: str,
    meta: "dict[str, Any]",
) -> "tuple[DataFrame, dict[str, Any]]":
    """Incremental flat-PQ maintenance (round 15 — the
    :func:`~adampro_spark.index.ivfpq.ivfpq_append` pattern without the
    cell layer): quantize ONLY the new batch through the FROZEN
    codebooks — the exact build-time Arrow argmin pass — and return
    ``(new_index_rows, updated_meta)`` with ``n`` grown.  The scan's
    ADC tables derive from the same codebooks, so appended codes rank
    exactly like build-time codes; drift costs quantization error
    (recall), never candidate math.  Codebooks never move (that is a
    rebuild)."""
    if meta.get("type") != "pq":
        raise ValueError(
            f"pq_append needs a pq meta, got {meta.get('type')!r}"
        )
    from pyspark.sql import types as T

    pk = meta["pk"]
    batch = new_df.filter(F.col(vector_col).isNotNull())
    cb_local = [np.asarray(cb, dtype=np.float64) for cb in meta["codebooks"]]
    bounds_local = [tuple(b) for b in meta["bounds"]]

    def _codes(vs):
        import pandas as pd

        out = []
        Vs = [np.asarray(x, dtype=np.float64) for x in vs]
        if not Vs:
            return pd.Series(out)
        V = np.stack(Vs)
        code_cols = []
        for (s, ln), cb in zip(bounds_local, cb_local):
            sub = V[:, s : s + ln]
            d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            code_cols.append(d2.argmin(axis=1).astype(np.int32))
        C = np.stack(code_cols, axis=1)  # (n × nsq)
        return pd.Series(list(C))

    codes_udf = F.pandas_udf(_codes, T.ArrayType(T.IntegerType()))
    indexed = batch.select(
        pk, codes_udf(F.col(vector_col)).alias(FEATURE_COL)
    ).localCheckpoint(eager=True)
    out = dict(meta)
    if "n" in out:
        out["n"] = int(out["n"]) + batch.count()
    return indexed, out
