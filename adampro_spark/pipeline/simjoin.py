"""Batch similarity join: many-query kNN over a vector table.

North-star extension (BASELINE.json: "similarity search") — everything in
the reference is single-query (broadcast literal query vector,
SequentialScanExpression.scala:163-180); a training-data pipeline needs
``knn_join(queries, data, k)``.

Plan shapes (chosen by ``strategy``):

* ``window`` — exact brute force: data ⋈ broadcast(queries) (broadcast
  nested-loop, no shuffle of the big side), codegen'd distance column,
  per-query top-k via window.  The shuffle carries |data|·|queries| rows,
  so this is the small-|queries|·small-|data| / oracle path.
* ``local_topk`` — exact brute force at scale: one ``mapInPandas`` pass
  computes a vectorized (numpy matmul) per-batch top-k per query, so the
  shuffle carries only O(batches · |queries| · k) narrow rows into the
  final per-query top-k.  This is the one place the built-in operators
  genuinely can't pre-reduce per group (Spark has TakeOrderedAndProject
  globally, not per-key), matching SURVEY §7.1's pandas-UDF rule.
* ``ivf_knn_join`` — the index path: bucket both sides by nearest-leader
  cell (eCP shape, ECPIndexGenerator.scala:27-75), equi-join on cell, so
  only candidates in probed cells ever meet; exact distances + per-query
  top-k on the reduced set.  Recall is tunable via ``nprobe``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from adampro_spark.index._util import ref_dists_expr, sample_matrix
from adampro_spark.operators.scan import DISTANCE_COL

# The byte budget for driver-collecting / broadcasting a query side —
# the reference's own broadcast ceiling (SparkStartup.scala:30 sets
# spark.sql.autoBroadcastJoinThreshold to 50 MB).  Row counts alone
# ignore dimensionality: 100k rows of 4096-dim doubles is ~3.3 GB.
BROADCAST_BYTE_BUDGET = 50 * 1024 * 1024


def _q_side_stats(queries: DataFrame, qv: str) -> tuple[int, int]:
    """(row count, per-row vector payload bytes) of the query side in one
    cheap aggregate — dim is taken as the max vector length (8 B/element
    after the float64 upcast both collect and broadcast paths perform)."""
    row = queries.select(
        F.count(F.lit(1)).alias("n"),
        F.max(F.size(F.col(qv))).alias("dim"),
    ).first()
    n = int(row["n"] or 0)
    dim = int(row["dim"] or 0)
    return n, dim * 8


def _pair_dist(a: Column, b: Column, distance_name: str) -> Column:
    """Column-vs-column distance (both sides arrays), left-fold order —
    same arithmetic as functions/distances.py's literal-query versions."""
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    if distance_name == "manhattan":
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: F.abs(x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    if distance_name in ("euclidean", "squaredeuclidean"):
        s = F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.sqrt(s) if distance_name == "euclidean" else s
    if distance_name == "cosine":
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
        na = F.sqrt(
            F.aggregate(F.zip_with(a, a, lambda x, y: x * y), F.lit(0.0), lambda s_, x: s_ + x)
        )
        nb = F.sqrt(
            F.aggregate(F.zip_with(b, b, lambda x, y: x * y), F.lit(0.0), lambda s_, x: s_ + x)
        )
        return F.when((na < 1e-5) | (nb < 1e-5), F.lit(0.0)).otherwise(
            F.lit(1.0) - dot / (na * nb)
        )
    raise ValueError(f"unsupported join distance {distance_name!r}")


def _np_dists(Q: np.ndarray, V: np.ndarray, distance_name: str) -> np.ndarray:
    """(|Q| × |V|) distance matrix, vectorized."""
    if distance_name == "manhattan":
        return np.abs(Q[:, None, :] - V[None, :, :]).sum(axis=2)
    if distance_name == "euclidean":
        # direct diff (not the a²+b²−2ab expansion): ~1e-15 relative error
        # keeps the 4-decimal rounding bit-identical to the fold-based oracle
        return np.sqrt(((Q[:, None, :] - V[None, :, :]) ** 2).sum(axis=2))
    if distance_name == "squaredeuclidean":
        return ((Q[:, None, :] - V[None, :, :]) ** 2).sum(axis=2)
    if distance_name == "cosine":
        nq = np.linalg.norm(Q, axis=1)
        nv = np.linalg.norm(V, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            sim = (Q @ V.T) / (nq[:, None] * nv[None, :])
        # SAME zero-norm contract as _pair_dist's expression form (1e-5
        # epsilon, distance 0) — review r6: the kernels disagreed for
        # norms in (0, 1e-5), so the two "exact" strategies diverged
        sim = np.where(np.isfinite(sim), sim, 1.0)
        zero = (nq[:, None] < 1e-5) | (nv[None, :] < 1e-5)
        return np.where(zero, 0.0, 1.0 - sim)
    raise ValueError(f"unsupported join distance {distance_name!r}")


def _global_topk(cands: DataFrame, q_pk: str, pk: str, k: int) -> DataFrame:
    w = Window.partitionBy(q_pk).orderBy(
        F.col(DISTANCE_COL).asc(), F.col(pk).asc()
    )
    return (
        cands.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def knn_join(
    data: DataFrame,
    queries: DataFrame,
    vector_col: str,
    k: int,
    distance_name: str = "euclidean",
    pk: str = "vec_id",
    q_pk: str = "q_id",
    q_vector_col: str | None = None,
    strategy: str = "auto",
    auto_collect_cap: int = 100_000,
    auto_collect_bytes: int = BROADCAST_BYTE_BUDGET,
    **ivf_kw,
) -> DataFrame:
    """For every query row, the k nearest data rows:
    ``(q_pk, pk, ap_distance)``, exact (lossy only on the auto ivf
    spill-over path), ties broken by pk.

    ``strategy="auto"`` (default) routes by query-side SIZE so no regime
    silently hits the wrong plan: |Q| ≤ ``auto_collect_cap`` rows AND
    |Q|·dim·8 B ≤ ``auto_collect_bytes`` (the reference's 50 MB broadcast
    ceiling, SparkStartup.scala:30) → exact ``local_topk`` (query side
    driver-collected + broadcast — the documented caps this routing
    enforces); larger on EITHER axis → :func:`ivf_knn_join` with the
    query side kept DISTRIBUTED (cell equi-join, no broadcast, no
    collect), forwarding ``**ivf_kw`` (nprobe, ecp_index, …).  The byte
    axis matters because row counts ignore dimensionality: 100k rows of
    4096-dim float64 is ~3.3 GB — far past any sane driver collect.

    ``local_topk`` is the scale-safe exact plan (per-batch pre-reduction,
    shuffle carries O(batches·|Q|·k) rows).  ``window`` is a broadcast
    nested-loop whose shuffle carries |data|·|Q| rows: it only makes sense
    for tiny inputs (oracle mirroring, plan comparisons) and must be
    requested explicitly.
    """
    qv = q_vector_col or vector_col

    if strategy == "auto":
        nq, row_bytes = _q_side_stats(queries, qv)
        if nq <= auto_collect_cap and nq * row_bytes <= auto_collect_bytes:
            strategy = "local_topk"
        else:
            return ivf_knn_join(
                data, queries, vector_col, k, distance_name,
                pk=pk, q_pk=q_pk, q_vector_col=q_vector_col,
                broadcast_queries=False, **ivf_kw,
            )

    if strategy == "window":
        q = queries.select(
            F.col(q_pk).alias("_q_pk"), F.col(qv).alias("_q_vec")
        )
        cands = (
            data.select(pk, vector_col)
            .join(F.broadcast(q))
            .withColumn(
                DISTANCE_COL,
                _pair_dist(F.col(vector_col), F.col("_q_vec"), distance_name),
            )
            .select(F.col("_q_pk").alias(q_pk), F.col(pk), DISTANCE_COL)
        )
        return _global_topk(cands, q_pk, pk, k)

    if strategy == "local_topk":
        qrows = queries.select(q_pk, qv).collect()
        q_ids = [r[0] for r in qrows]
        spark = data.sparkSession
        if not q_ids:  # empty query side: empty result, stable schema
            return spark.createDataFrame(
                [], schema=f"{q_pk} long, {pk} long, {DISTANCE_COL} double"
            )
        Q = np.array([r[1] for r in qrows], dtype=np.float64)
        bQ = spark.sparkContext.broadcast((q_ids, Q, distance_name, k))

        def local_topk(batches: Iterator) -> Iterator:
            import pandas as pd

            q_ids_, Q_, dn, k_ = bQ.value
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.array([np.asarray(x, dtype=np.float64) for x in pdf[vector_col]])
                ids = pdf[pk].to_numpy()
                D = _np_dists(Q_, V, dn)  # (q × n)
                kk = min(k_, D.shape[1])
                # (distance, pk) lexsort, not bare argpartition — the
                # batch-local cut must keep the SAME tied row the window
                # strategy keeps (min pk), or the two exact strategies
                # return different top-k on ties (review r6, reproduced)
                ids_b = np.broadcast_to(ids, D.shape)
                order = np.lexsort((ids_b, D), axis=-1)  # distance primary
                part = order[:, :kk]
                out_q, out_id, out_d = [], [], []
                for qi in range(D.shape[0]):
                    sel = part[qi]
                    out_q.extend([q_ids_[qi]] * len(sel))
                    out_id.extend(ids[sel])
                    out_d.extend(D[qi, sel])
                yield pd.DataFrame(
                    {q_pk: out_q, pk: out_id, DISTANCE_COL: out_d}
                )

        pk_t = data.schema[pk].dataType.simpleString()
        qpk_t = queries.schema[q_pk].dataType.simpleString()
        reduced = data.select(pk, vector_col).mapInPandas(
            local_topk,
            schema=f"{q_pk} {qpk_t}, {pk} {pk_t}, {DISTANCE_COL} double",
        )
        return _global_topk(reduced, q_pk, pk, k)

    raise ValueError(f"unknown knn_join strategy {strategy!r}")


def ivf_knn_join(
    data: DataFrame,
    queries: DataFrame,
    vector_col: str,
    k: int,
    distance_name: str = "euclidean",
    pk: str = "vec_id",
    q_pk: str = "q_id",
    q_vector_col: str | None = None,
    nleaders: int | None = None,
    nprobe: int = 8,
    seed: int = 42,
    ecp_index: tuple[DataFrame, dict] | None = None,
    broadcast_queries: bool | None = None,
    broadcast_cap_rows: int = 1_000_000,
    broadcast_cap_bytes: int = BROADCAST_BYTE_BUDGET,
) -> DataFrame:
    """IVF-bucketed batch kNN: assign data rows to their nearest leader
    cell, probe each query's ``nprobe`` nearest cells, equi-join on cell.

    At 100 TB: the data side is partitioned by cell (one narrow shuffle at
    build — or FREE when ``ecp_index`` passes a persisted eCP index
    (index/persist.py ``load_index``): its (pk, cell) table joins back to
    the data by pk and the per-query cell assignment is never recomputed),
    queries explode to nprobe rows each, and the join only touches probed
    cells.  Lossy unless nprobe = nleaders; recall climbs with nprobe
    (asserted in tests, PQ-style).

    ``broadcast_queries`` — None (default) decides by size: the exploded
    query side (|Q|·nprobe rows, each carrying the full vector) is
    broadcast only while it stays under BOTH ``broadcast_cap_rows`` and
    ``broadcast_cap_bytes`` (|Q|·nprobe·dim·8 B against the reference's
    50 MB ceiling, SparkStartup.scala:30 — row counts alone miss
    high-dim blowup); beyond either it becomes a shuffle cell-join (both
    sides hashed on ``_cell``), so a huge query side degrades to a
    bigger shuffle instead of an executor OOM.  Explicit True/False
    forces the choice (True mirrors the pre-round-5 behavior).
    """
    from adampro_spark.index._util import attach_lut

    qv = q_vector_col or vector_col
    if ecp_index is not None:
        index_df, meta = ecp_index
        leaders = [list(map(float, r)) for r in meta["leaders"]]
        data_cells = data.select(pk, vector_col).join(
            index_df.select(
                F.col(meta.get("pk", pk)).alias(pk),
                F.col("ap_indexfeature").alias("_cell"),
            ),
            on=pk,
        )
    else:
        n = data.count()
        nl = min(max(nleaders or int(np.sqrt(n)), 2), 200)
        leaders = sample_matrix(data, vector_col, nl, seed, pk=pk)[:nl].tolist()
        leaders_lut = [[float(x) for x in r] for r in leaders]

        d = ref_dists_expr(vector_col, F.col("_ap_leaders"), distance_name)
        # struct array_min: lexicographic (d, i) = the same first-minimum
        # as array_position(array_min) but the leader-distance HOF
        # evaluates ONCE per row instead of twice (round 13, the
        # build_ecp fused-assignment trick)
        cell = F.array_min(
            F.transform(d, lambda dd, i: F.struct(dd.alias("d"), i.alias("i")))
        )["i"].cast("int")
        data_cells = attach_lut(data, _ap_leaders=leaders_lut).select(
            pk, vector_col, cell.alias("_cell")
        )
    leaders_lut = [[float(x) for x in r] for r in leaders]

    # probe with the metric the cells were ASSIGNED under (the index's
    # build distance when reusing a persisted eCP index); exact final
    # distances still use distance_name
    probe_metric = (
        ecp_index[1].get("distance", distance_name) if ecp_index else distance_name
    )
    qd = ref_dists_expr(qv, F.col("_ap_leaders"), probe_metric)
    ranked = F.array_sort(
        F.zip_with(
            qd,
            F.sequence(F.lit(0), F.lit(len(leaders) - 1)),
            lambda d, i: F.struct(d.alias("d"), i.alias("i")),
        )
    )
    probe_cells = F.transform(
        F.slice(ranked, 1, min(nprobe, len(leaders))), lambda s: s["i"]
    )
    q_cells = attach_lut(queries, _ap_leaders=leaders_lut).select(
        F.col(q_pk).alias("_q_pk"),
        F.col(qv).alias("_q_vec"),
        F.explode(probe_cells).alias("_cell"),
    )

    if broadcast_queries is None:
        # one aggregate on the (usually smaller) query side decides the
        # shape — rows AND bytes, since each exploded row carries the
        # full vector
        nq, row_bytes = _q_side_stats(queries, qv)
        exploded = nq * max(nprobe, 1)
        broadcast_queries = (
            exploded <= broadcast_cap_rows
            and exploded * row_bytes <= broadcast_cap_bytes
        )
    q_side = F.broadcast(q_cells) if broadcast_queries else q_cells

    cands = (
        data_cells.join(q_side, on="_cell")
        .withColumn(
            DISTANCE_COL,
            _pair_dist(F.col(vector_col), F.col("_q_vec"), distance_name),
        )
        .select(F.col("_q_pk").alias(q_pk), F.col(pk), DISTANCE_COL)
    )
    return _global_topk(cands, q_pk, pk, k)
