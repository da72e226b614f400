"""MI (metric inverted file) index.

Parity targets: build ``mi/MIIndexGenerator.scala:30-58`` (per row: the
``ki`` nearest of ≤200 sampled reference points, as an ordered id list),
scan ``mi/MIIndex.scala:33-79`` (take the ``ks`` refs nearest to q; score
= Spearman-footrule position difference, missing ref → ki+1; top-k).
Lossy (confidence 0.5).

Reference bug NOT copied (documented): the scan checks ``idx > 0``
(MIIndex.scala:61), so a query ref found at position 0 of a row's ref
list is scored as MISSING — we use ``idx >= 0`` (found-at-first-position
counts as position 0, distance |0 - i|).

Spark-first: the build ranks references with ``array_sort`` over
(distance, id) structs — lexicographic struct ordering IS sortBy with id
tie-break; the scan scores via ``array_position`` per query ref — both
fully codegen'd, vs the reference's row-at-a-time UDFs.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from adampro_spark.index._util import np_distance, ref_dists_expr, sample_matrix
from adampro_spark.operators.scan import DISTANCE_COL

FEATURE_COL = "ap_indexfeature"

MAX_REFS = 200  # MIIndexGeneratorFactory: min(200, ceil(2*sqrt(n)))


def build_mi(
    df: DataFrame,
    vector_col: str,
    pk: str = "ap_id",
    distance_name: str = "euclidean",
    nrefs: int | None = None,
    ki: int | None = None,
    ks: int | None = None,
    seed: int = 42,
    autofit: bool = True,
) -> tuple[DataFrame, dict[str, Any]]:
    df = df.filter(F.col(vector_col).isNotNull())  # NULL vectors: no feature
    n = df.count()
    nr = min(nrefs or min(MAX_REFS, int(np.ceil(2 * np.sqrt(n)))), MAX_REFS)
    refs = sample_matrix(df, vector_col, nr, seed, pk=pk)[:nr]
    nr = len(refs)
    ki_v = min(ki or 100, nr)  # Amato et al. (2008) defaults
    ks_v = min(ks or 50, nr)
    # clamp instead of a bare assert (stripped under -O; review r6):
    # scanning more refs than each row stored just scores them as missing
    ks_v = min(ks_v, ki_v)

    from adampro_spark.index._util import attach_lut

    # reference matrix (≤200×dim) as a broadcast LUT, not a py4j literal
    wr = attach_lut(df, _ap_refs=[[float(x) for x in r] for r in refs.tolist()])
    dists = ref_dists_expr(vector_col, F.col("_ap_refs"), distance_name)
    ranked = F.array_sort(
        F.zip_with(
            dists,
            F.lit(list(range(nr))),
            lambda d, i: F.struct(d.alias("d"), i.alias("i")),
        )
    )
    feature = F.slice(F.transform(ranked, lambda s: s["i"]), 1, ki_v)
    indexed = wr.select(pk, feature.alias(FEATURE_COL))

    meta = {
        "type": "mi",
        "pk": pk,
        "distance": distance_name,
        "n": n,
        "refs": refs.tolist(),
        "ki": ki_v,
        "ks": ks_v,
    }
    if autofit:
        # refs are too few to measure recall on — dedicated fit sample
        from adampro_spark.index.autofit import autofit_meta

        fit_sample = sample_matrix(df, vector_col, 1000, seed + 7, pk=pk)
        autofit_meta("mi", meta, fit_sample, distance_name=distance_name)
    return indexed, meta


def scan_mi(
    index_df: DataFrame,
    meta: dict[str, Any],
    query: list[float],
    k: int,
    ks: int | None = None,
    prefilter: DataFrame | None = None,
) -> DataFrame:
    """Spearman-footrule scoring against the ks query-nearest references."""
    pk = meta["pk"]
    ki = meta["ki"]
    ks_v = min(ks or meta["ks"], ki)
    refs = np.array(meta["refs"], dtype=np.float64)
    order = np.argsort(np_distance(np.array(query), refs, meta["distance"]), kind="stable")
    qrefs = [int(x) for x in order[:ks_v]]

    df = index_df
    if prefilter is not None:
        df = df.join(prefilter.select(pk), on=pk, how="left_semi")

    feature = F.col(FEATURE_COL)
    score = None
    for i, qr in enumerate(qrefs):
        pos = F.array_position(feature, F.lit(qr))  # 1-based, 0 if missing
        term = F.when(pos > 0, F.abs(pos - 1 - F.lit(i))).otherwise(F.lit(ki + 1))
        score = term if score is None else (score + term)

    return (
        df.withColumn(DISTANCE_COL, score.cast("double"))
        .orderBy(F.col(DISTANCE_COL).asc(), F.col(pk).asc())
        .limit(k)
        .select(pk, DISTANCE_COL)
    )


def mi_knn(
    df: DataFrame,
    vector_col: str,
    index_df: DataFrame,
    meta: dict[str, Any],
    query: list[float],
    k: int,
    distance_name: str | None = None,
    times_k: int = 5,
    prefilter: DataFrame | None = None,
    frac: float | str | None = "auto",
) -> DataFrame:
    """Candidate scan (timesK·k candidates) → exact refinement.

    The reference's MI scan returns only k rows ordered by footrule score;
    refining those k directly can drop true neighbours, so like the other
    lossy scans we widen the candidate set to timesK·k before refinement
    (``frac`` → scale-proportional budget, see candidate_budget).
    Conform: any distance (MIIndex.scala:85).
    """
    from adampro_spark.index._util import candidate_budget
    from adampro_spark.operators.scan import sequential_scan

    dn = distance_name or meta["distance"]
    want = candidate_budget(times_k, k, frac, meta, index_df)
    cands = scan_mi(index_df, meta, query, want, prefilter=prefilter)
    return sequential_scan(df, vector_col, query, k, dn, prefilter=cands, pk=meta["pk"])


def mi_append(
    new_df: DataFrame,
    vector_col: str,
    meta: "dict[str, Any]",
) -> "tuple[DataFrame, dict[str, Any]]":
    """Incremental MI maintenance (round 15 — the
    :func:`~adampro_spark.index.ecp.ecp_append` pattern): rank ONLY the
    new batch against the FROZEN reference objects — the exact
    build-time ranked-refs expression, so appended features are
    bit-identical to a rebuild with these refs — and return
    ``(new_index_rows, updated_meta)`` with ``n`` grown.  Refs never
    move (that is a rebuild); drift degrades permutation selectivity
    (recall), never the exact refinement."""
    if meta.get("type") != "mi":
        raise ValueError(
            f"mi_append needs an mi meta, got {meta.get('type')!r}"
        )
    from adampro_spark.index._util import attach_lut

    pk = meta["pk"]
    batch = new_df.filter(F.col(vector_col).isNotNull())
    refs = [[float(x) for x in r] for r in meta["refs"]]
    nr = len(refs)
    ki_v = int(meta["ki"])
    wr = attach_lut(batch, _ap_refs=refs)
    dists = ref_dists_expr(vector_col, F.col("_ap_refs"), meta["distance"])
    ranked = F.array_sort(
        F.zip_with(
            dists,
            F.lit(list(range(nr))),
            lambda d, i: F.struct(d.alias("d"), i.alias("i")),
        )
    )
    feature = F.slice(F.transform(ranked, lambda s: s["i"]), 1, ki_v)
    indexed = wr.select(pk, feature.alias(FEATURE_COL)).localCheckpoint(
        eager=True
    )
    out = dict(meta)
    if "n" in out:
        out["n"] = int(out["n"]) + batch.count()
    return indexed, out
