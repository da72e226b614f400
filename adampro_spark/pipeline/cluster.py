"""Embedding clustering — the shared machinery behind SemDeDup
(:mod:`~adampro_spark.pipeline.dedup`), topic/domain bucketing for
dataset mixing, and cluster-balance profiling.

Spark-first shape: the FIT is driver-sized (a layout-independent sample
through the repo's numpy k-means — the IVF build path, index/ivfpq.py);
the ASSIGNMENT is one Arrow-batched pandas UDF computing a normalized
batch × broadcast-centroid matmul — map-only, no shuffle, text/payload
columns pruned.  At 100 TB only the sample collect touches the driver.

Spherical convention throughout: vectors and centroids are L2-normalized
and assignment is argmax cosine (ties → lowest centroid index), matching
SemDeDup; euclidean k-means on normalized vectors is equivalent.
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_SAMPLE = 20_000


def fit_centroids(
    df: DataFrame,
    vector_col: str = "embedding",
    pk: str = "vec_id",
    n_clusters: int | None = None,
    sample_size: int = DEFAULT_SAMPLE,
    seed: int = 42,
) -> np.ndarray:
    """Fit k-means centroids on a layout-independent sample of the
    (normalized) vectors; returns the NORMALIZED (k × dim) matrix.
    Default k = ⌈√n⌉ clamped to [2, 4096].  NULL and zero-norm vectors
    are excluded from the fit."""
    from adampro_spark.index._util import kmeans, sample_matrix

    v = F.col(vector_col).cast("array<double>")
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(v, v, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    base = (
        df.filter(F.col(vector_col).isNotNull())
        .filter(norm > 1e-12)
        .select(v.alias("_v"), F.col(pk).alias("_pk"))
    )
    S = sample_matrix(
        base.select(F.col("_v").alias(vector_col), F.col("_pk").alias("pk")),
        vector_col, sample_size, seed, pk="pk",
    ).astype(np.float64)
    if len(S) == 0:
        raise ValueError("no usable vectors to fit centroids on")
    n_total = len(S) if len(S) < sample_size else base.count()
    k = n_clusters or int(np.clip(round(math.sqrt(n_total)), 2, 4096))
    S /= np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-12)
    C = kmeans(S, k, seed=seed)
    return C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)


def assign_clusters_udf(Cn: np.ndarray):
    """Pandas UDF ``vector → argmax-cosine cluster index`` against the
    broadcast normalized centroid matrix; NULL in → NULL out."""
    def _assign(cols):
        import pandas as pd

        vals = [
            np.asarray(x, dtype=np.float64) if x is not None else None
            for x in cols
        ]
        out = [None] * len(vals)
        idx = [i for i, v in enumerate(vals) if v is not None]
        if idx:
            V = np.stack([vals[i] for i in idx])
            n = np.linalg.norm(V, axis=1)
            ok = n > 1e-12
            if ok.any():
                labels = ((V[ok] / n[ok, None]) @ Cn.T).argmax(axis=1)
                it = iter(labels)
                for pos, good in zip(idx, ok):
                    if good:
                        out[pos] = int(next(it))
        return pd.Series(out, dtype="object")

    return F.pandas_udf(_assign, T.IntegerType())


def resolve_centroids(
    centroids: "DataFrame | np.ndarray",
    vector_col: str = "embedding",
) -> np.ndarray:
    """Caller-provided centroids (a small DataFrame of vectors collected
    in row order, or an ndarray) → the NORMALIZED matrix every assigner
    consumes.  The one shared implementation behind cluster_embeddings
    and the semantic dedup family — a tie-break or guard change here
    reaches all of them.

    Degenerate centroids (NULL rows, zero-norm vectors) are DROPPED —
    they have no direction, the oracle mirrors exclude them the same
    way, and a NULL row would otherwise crash the collect.  Positional
    cluster indices therefore refer to the RETAINED rows.
    """
    if isinstance(centroids, DataFrame):
        rows = [
            r[0] for r in centroids.select(vector_col).collect()
            if r[0] is not None
        ]
        if not rows:
            raise ValueError("no usable centroid rows")
        C = np.array(rows, dtype=np.float64)
    else:
        C = np.asarray(centroids, dtype=np.float64)
    norms = np.linalg.norm(C, axis=1)
    C = C[norms > 1e-12]
    if len(C) == 0:
        raise ValueError("no usable centroid rows")
    return C / np.linalg.norm(C, axis=1, keepdims=True)


def cluster_embeddings(
    df: DataFrame,
    vector_col: str = "embedding",
    pk: str = "vec_id",
    n_clusters: int | None = None,
    centroids: "DataFrame | np.ndarray | None" = None,
    sample_size: int = DEFAULT_SAMPLE,
    seed: int = 42,
    cluster_col: str = "cluster",
) -> tuple[DataFrame, np.ndarray]:
    """Assign every row to its nearest (cosine) centroid: returns
    ``(df + cluster_col, normalized_centroids)``.  Rows with NULL or
    zero-norm vectors get a NULL cluster (they have no direction).

    ``centroids``: a small DataFrame of vectors (collected in the
    caller's row order — ``orderBy`` it for determinism) or an ndarray;
    fitted from a sample when omitted.  The returned matrix feeds
    downstream calls (stream scoring, share profiling, re-assignment of
    a second corpus against the SAME clustering).
    """
    if centroids is not None:
        Cn = resolve_centroids(centroids, vector_col)
    else:
        Cn = fit_centroids(
            df, vector_col=vector_col, pk=pk, n_clusters=n_clusters,
            sample_size=sample_size, seed=seed,
        )
    udf = assign_clusters_udf(Cn)
    out = df.withColumn(
        cluster_col, udf(F.col(vector_col).cast("array<double>"))
    )
    return out, Cn


def cluster_shares(
    df: DataFrame, cluster_col: str = "cluster"
) -> DataFrame:
    """Per-cluster population and corpus share — the balance report a
    mixing pipeline reads before re-weighting.  One map-side-combined
    aggregate down to ≤ k rows; normalization cross-joins the 1-row
    total (an unpartitioned window would be constant-folded into the
    WindowExec warning — see temporal.py's boundary-carry note)."""
    out = df.groupBy(cluster_col).agg(F.count(F.lit(1)).alias("n"))
    tot = out.agg(F.sum("n").alias("_tot"))
    return (
        out.crossJoin(F.broadcast(tot))
        .withColumn("share", F.round(F.col("n") / F.col("_tot"), 4))
        .drop("_tot")
    )
