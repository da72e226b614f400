"""IVF-PQ composite index: eCP-style coarse cells + product-quantized
RESIDUALS + per-cell ADC scan.

Beyond the reference (which ships eCP and PQ separately,
``ecp/ECPIndexGenerator.scala`` + ``pq/PQIndexGenerator.scala``): the
standard large-scale ANN layout (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011, §IV — the faiss ``IVFx,PQy``
factory string).  Quantizing the residual ``v − leader(cell)`` instead of
``v`` concentrates the codebook on within-cell variation, so the same
code budget yields a tighter distance estimate than flat PQ, and the
coarse cells prune the scan the way eCP does.

Spark-first shapes:
  * build — ONE Arrow-batched pandas UDF emits (cell, codes) per row
    (leader argmin + residual per-split argmin are two numpy matmuls);
    the persisted table partitions by cell, so probes become Parquet
    partition pruning exactly like the eCP layout.
  * scan — probed cells' ADC tables (|probe|·nsq·2^bits doubles) ride a
    broadcast LUT; the per-row score is an ``aggregate(zip_with(...))``
    expression over the code array with ``array_position`` resolving the
    row's cell to its table slot — no UDF, no shuffle before the top-k.
  * candidates refine through the exact sequential scan, like every
    other lossy index here.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from adampro_spark.index._util import kmeans, sample_matrix
from adampro_spark.index.pq import _split_bounds
from adampro_spark.operators.scan import DISTANCE_COL

FEATURE_COL = "ap_indexfeature"  # the PQ code array
CELL_COL = "ap_cell"             # the coarse cell (partition column)

MAX_LEADERS = 200  # same cap as eCP (ECPIndexGenerator.scala:27)


def _pq_encode(
    df: DataFrame,
    vector_col: str,
    pk: str,
    leaders: np.ndarray,
    codebooks: list,
    bounds,
) -> DataFrame:
    """``(pk, cell, codes)`` for every row: nearest-leader coarse cell,
    then per-sub-vector residual codeword argmin — ONE Arrow-batched
    pandas UDF (two batch matmuls per sub-vector).  Shared by the build
    and :func:`ivfpq_append` so appended codes are bit-identical to
    what the build would emit for the same vectors."""
    from pyspark.sql import types as T

    L = np.asarray(leaders, dtype=np.float64).copy()
    cbs = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    blist = [tuple(b) for b in bounds]

    def _encode(vs):
        import pandas as pd

        Vs = [np.asarray(x, dtype=np.float64) for x in vs]
        if not Vs:
            return pd.DataFrame({"cell": [], "codes": []})
        V = np.stack(Vs)
        dd = ((V[:, None, :] - L[None, :, :]) ** 2).sum(axis=2)
        cells = dd.argmin(axis=1)
        R = V - L[cells]
        cols = []
        for (s, ln), cb in zip(blist, cbs):
            sub = R[:, s : s + ln]
            d2s = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            cols.append(d2s.argmin(axis=1).astype(np.int32))
        C = np.stack(cols, axis=1)
        return pd.DataFrame(
            {"cell": cells.astype(np.int32), "codes": list(C)}
        )

    enc = F.pandas_udf(
        _encode,
        T.StructType(
            [
                T.StructField("cell", T.IntegerType()),
                T.StructField("codes", T.ArrayType(T.IntegerType())),
            ]
        ),
    )
    return df.select(pk, enc(F.col(vector_col)).alias("_e")).select(
        pk,
        F.col("_e.cell").alias(CELL_COL),
        F.col("_e.codes").alias(FEATURE_COL),
    )


def ivfpq_append(
    new_df: DataFrame,
    vector_col: str,
    meta: "dict[str, Any]",
) -> "tuple[DataFrame, dict[str, Any]]":
    """Incremental IVF-PQ maintenance (round 14, the :func:`~adampro_
    spark.index.ecp.ecp_append` pattern): encode ONLY a new batch
    against the FROZEN leaders and residual codebooks — the exact
    build-time Arrow pass — and return ``(new_index_rows,
    updated_meta)`` with counts and ``n`` grown.

    Soundness: the scan's ADC tables derive from the same codebooks the
    appended codes were quantized with, so appended rows rank exactly
    like build-time rows.  What degrades under DISTRIBUTION DRIFT is
    quantization error (recall), never candidate-math correctness —
    rebuild when a refreshed autofit recall measurement decays.
    Leaders and codebooks never move (moving them would invalidate
    every existing code).  :func:`adampro_spark.index.persist.
    append_index` wraps this with the cell-partitioned parquet append +
    catalog refresh + staleness clear."""
    if meta.get("type") != "ivfpq":
        raise ValueError(
            f"ivfpq_append needs an ivfpq meta, got {meta.get('type')!r}"
        )
    pk = meta["pk"]
    batch = new_df.filter(F.col(vector_col).isNotNull())
    indexed = _pq_encode(
        batch, vector_col, pk,
        np.array(meta["leaders"], dtype=np.float64),
        meta["codebooks"],
        meta["bounds"],
    ).localCheckpoint(eager=True)
    stats = {
        int(r[CELL_COL]): int(r["cnt"])
        for r in indexed.groupBy(CELL_COL)
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    out = dict(meta)
    out["counts"] = [
        int(c) + stats.get(i, 0) for i, c in enumerate(meta["counts"])
    ]
    out["n"] = int(meta.get("n", 0)) + sum(stats.values())
    return indexed, out


def build_ivfpq(
    df: DataFrame,
    vector_col: str,
    pk: str = "ap_id",
    nleaders: int | None = None,
    nsq: int = 8,
    nsqbits: int = 8,
    ntraining: int = 1000,
    seed: int = 42,
    autofit: bool = True,
) -> tuple[DataFrame, dict[str, Any]]:
    """Sample ≤200 leaders, k-means the RESIDUALS per sub-vector split,
    emit ``(pk, cell, codes)``.  ``nleaders`` defaults to √n like eCP."""
    from pyspark.sql import types as T

    df = df.filter(F.col(vector_col).isNotNull())  # NULL vectors: no cell/codes
    n = df.count()
    nl = min(max(nleaders or int(np.sqrt(n)), 2), MAX_LEADERS)
    leaders = sample_matrix(df, vector_col, nl, seed, pk=pk)[:nl]
    nl = leaders.shape[0]
    dim = leaders.shape[1]

    train = sample_matrix(df, vector_col, ntraining, seed + 1, pk=pk)
    d2 = ((train[:, None, :] - leaders[None, :, :]) ** 2).sum(axis=2)
    resid = train - leaders[d2.argmin(axis=1)]
    bounds = _split_bounds(dim, nsq)
    nclusters = min(1 << nsqbits, max(2, resid.shape[0] // 2))
    codebooks = [
        kmeans(resid[:, s : s + ln], nclusters, seed=seed + 2 + i)
        for i, (s, ln) in enumerate(bounds)
    ]

    indexed = _pq_encode(df, vector_col, pk, leaders, codebooks, bounds)
    counts = {
        int(r[CELL_COL]): int(r["cnt"])
        for r in indexed.groupBy(CELL_COL).agg(F.count("*").alias("cnt")).collect()
    }
    meta = {
        "type": "ivfpq",
        "pk": pk,
        "distance": "euclidean",
        "dim": dim,
        "n": n,
        "nsq": nsq,
        "bounds": [list(b) for b in bounds],
        "leaders": leaders.tolist(),
        "counts": [counts.get(i, 0) for i in range(nl)],
        "codebooks": [cb.tolist() for cb in codebooks],
    }
    if autofit:
        # fit on an INDEPENDENT sample (seed+7): the residual codebooks
        # were trained on `train`, so measuring recall there biases
        # optimistic
        from adampro_spark.index.autofit import autofit_meta

        fit_sample = sample_matrix(df, vector_col, 1000, seed + 7, pk=pk)
        autofit_meta("ivfpq", meta, fit_sample)
    return indexed, meta


def scan_ivfpq(
    index_df: DataFrame,
    meta: dict[str, Any],
    query: list[float],
    k: int,
    times_k: int = 5,
    nprobe: int | None = None,
    prefilter: DataFrame | None = None,
    frac: float | str | None = "auto",
) -> DataFrame:
    """Probe the nearest cells, score their rows by residual-ADC
    (squared-L2 table lookups per split, √ at the end), return the
    candidate top-(budget).

    Cells: ``nprobe`` fixes the probe count; otherwise cells accumulate
    until the scale-proportional budget (``candidate_budget`` — the same
    ``max(times_k·k, ceil(frac·n))`` rule as every frac-aware scan, so
    recall holds across corpus sizes).  With a ``prefilter`` the
    per-cell counts are recomputed on the FILTERED index table before
    the takeWhile (the eCP rule, ecp.py:139-148): budgeting against the
    unfiltered populations would leave the chosen cells with far fewer
    eligible rows than the budget under a selective predicate.
    """
    from adampro_spark.index._util import attach_lut, candidate_budget

    pk = meta["pk"]
    q = np.asarray(query, dtype=np.float64)
    leaders = np.asarray(meta["leaders"], dtype=np.float64)
    counts = np.asarray(meta["counts"], dtype=np.int64)
    order = np.argsort(((leaders - q) ** 2).sum(axis=1), kind="stable")

    df = index_df
    if prefilter is not None:
        df = df.join(prefilter.select(pk), on=pk, how="left_semi")
        filt = {
            r[CELL_COL]: r["n"]
            for r in df.groupBy(CELL_COL).agg(F.count("*").alias("n")).collect()
        }
        counts = np.asarray(
            [filt.get(i, 0) for i in range(len(leaders))], dtype=np.int64
        )

    budget = max(times_k * k, k)
    if nprobe is not None:
        chosen = [int(c) for c in order[: max(1, nprobe)]]
    else:
        want = candidate_budget(
            times_k, k, frac, {**meta, "n": int(counts.sum())}, df
        )
        cum = 0
        chosen = []
        for c in order:
            cum += int(counts[c])
            chosen.append(int(c))
            if cum >= want:
                break
        # the ADC top-R must not clip the scale-proportional coverage the
        # probe just paid for — quantization error reorders near the cut
        budget = want

    nsq = len(meta["bounds"])
    cbs = [np.asarray(cb, dtype=np.float64) for cb in meta["codebooks"]]
    ncl = cbs[0].shape[0]
    # flat ADC LUT: slot-major, split-major, centroid-minor
    flat: list[float] = []
    for c in chosen:
        qr = q - leaders[c]
        for (s, ln), cb in zip(meta["bounds"], cbs):
            d2 = ((cb - qr[s : s + ln]) ** 2).sum(axis=1)
            flat.extend(float(x) for x in d2)
    split_offsets = [i * ncl for i in range(nsq)]

    df = df.filter(F.col(CELL_COL).isin(chosen))
    slot = F.array_position(
        F.lit([int(c) for c in chosen]), F.col(CELL_COL)
    )  # 1-based; rows are filtered to chosen, so never 0
    base = (slot - 1) * F.lit(nsq * ncl)
    terms = F.zip_with(
        F.col(FEATURE_COL),
        F.lit(split_offsets),
        lambda c, o: F.element_at(F.col("_ap_adc"), (base + o + c + 1).cast("int")),
    )
    dist2 = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
    scored = attach_lut(df, _ap_adc=flat).withColumn(
        DISTANCE_COL, F.sqrt(dist2)
    )
    return (
        scored.orderBy(F.col(DISTANCE_COL).asc(), F.col(pk).asc())
        .limit(budget)
        .select(pk, DISTANCE_COL)
    )


def ivfpq_knn(
    df: DataFrame,
    vector_col: str,
    index_df: DataFrame,
    meta: dict[str, Any],
    query: list[float],
    k: int,
    distance_name: str = "euclidean",
    times_k: int = 5,
    nprobe: int | None = None,
    prefilter: DataFrame | None = None,
    frac: float | str | None = "auto",
) -> DataFrame:
    """Probe → ADC candidates → exact sequential refinement.  Euclidean
    family only (the residual quantizer is L2-trained)."""
    from adampro_spark.operators.scan import sequential_scan

    if distance_name not in ("euclidean", "squaredeuclidean"):
        raise ValueError(
            f"ivfpq supports euclidean distances, got {distance_name!r}"
        )
    cands = scan_ivfpq(
        index_df, meta, query, k, times_k=times_k, nprobe=nprobe,
        prefilter=prefilter, frac=frac,
    )
    return sequential_scan(
        df, vector_col, query, k, distance_name, prefilter=cands, pk=meta["pk"]
    )
