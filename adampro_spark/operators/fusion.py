"""Result-set fusion operators (the reference's "aggregations").

Parity target: ``query/ast/internal/AggregationExpression.scala`` — fusions
of two subquery results keyed by the entity PK:

  * UNION (:137-168) — union-all of PK sets, distance reset to 0;
  * INTERSECT (:248-280) — PK-set intersection (set semantics), distance 0;
  * EXCEPT (:360-392) — PK-set difference (set semantics), distance 0;
  * FUZZYUNION (:176-238) — join on PK (default full-outer), missing-side
    distance defaults to ``fuzzydefault`` (0.0), combined = min(dl, dr);
  * FUZZYINTERSECT (:289-351) — same join, combined = max(dl, dr);
  * stochastic multi-index fusion
    (query/ast/internal/StochasticIndexQueryExpression.scala:28-92) —
    union candidate PKs from n scans, score = 1 - count(pk)/n, ascending
    top-``min(50*k, 5000)``.

All are plain DataFrame set/join/groupBy ops, so Catalyst handles the
physical strategy (broadcast for small sides, partial aggregation map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from adampro_spark.operators.scan import DISTANCE_COL


def _zero_distance(df: DataFrame, pk: str) -> DataFrame:
    return df.withColumn(DISTANCE_COL, F.lit(0.0))


def union_fusion(left: DataFrame, right: DataFrame, pk: str = "ap_id") -> DataFrame:
    """Union-all of PK sets, distance reset to 0 (AggregationExpression.scala:166)."""
    return _zero_distance(left.select(pk).union(right.select(pk)), pk)


def intersect_fusion(left: DataFrame, right: DataFrame, pk: str = "ap_id") -> DataFrame:
    """PK-set intersection, set semantics (AggregationExpression.scala:278)."""
    return _zero_distance(left.select(pk).intersect(right.select(pk)), pk)


def except_fusion(left: DataFrame, right: DataFrame, pk: str = "ap_id") -> DataFrame:
    """PK-set difference, set semantics (AggregationExpression.scala:390).

    ``subtract`` is Spark's set-semantic EXCEPT — a PK present on the right is
    removed entirely even if it appears more often on the left (matters when
    the left side is the output of union_fusion, which is union-all).
    """
    return _zero_distance(left.select(pk).subtract(right.select(pk)), pk)


def _fuzzy(
    left: DataFrame,
    right: DataFrame,
    pk: str,
    combine,
    default: float,
    join_type: str,
) -> DataFrame:
    l = left.select(F.col(pk).alias("_pk_l"), F.col(DISTANCE_COL).alias("_d_l"))
    r = right.select(F.col(pk).alias("_pk_r"), F.col(DISTANCE_COL).alias("_d_r"))
    joined = l.join(r, l["_pk_l"] == r["_pk_r"], join_type)
    dl = F.coalesce(F.col("_d_l"), F.lit(default))
    dr = F.coalesce(F.col("_d_r"), F.lit(default))
    return joined.select(
        F.coalesce(F.col("_pk_l"), F.col("_pk_r")).alias(pk),
        combine(dl, dr).alias(DISTANCE_COL),
    )


def fuzzy_union(
    left: DataFrame,
    right: DataFrame,
    pk: str = "ap_id",
    default: float = 0.0,
    join_type: str = "outer",
) -> DataFrame:
    """Full-outer join on PK; combined distance = min(dl, dr)
    (AggregationExpression.scala:176-238)."""
    return _fuzzy(left, right, pk, F.least, default, join_type)


def fuzzy_intersect(
    left: DataFrame,
    right: DataFrame,
    pk: str = "ap_id",
    default: float = 0.0,
    join_type: str = "outer",
) -> DataFrame:
    """Same join; combined distance = max(dl, dr)
    (AggregationExpression.scala:289-351)."""
    return _fuzzy(left, right, pk, F.greatest, default, join_type)


def fused_scan(
    build_left,
    build_right,
    fuse,
    order: str = "parallel",
    pk: str = "ap_id",
):
    """Evaluation-order control for two-sided fusions
    (AggregationExpression.scala:42-54,72-114).

    ``build_left`` / ``build_right``: ``callable(prefilter) -> DataFrame``
    — scan builders accepting an optional PK-candidate DataFrame.

    * ``"left_first"`` — evaluate the left side, thread its PKs into the
      right side as a semi-join prefilter (the reference's filter-
      DataFrame pipeline);
    * ``"right_first"`` — symmetric;
    * ``"parallel"`` — build both sides independently; Spark runs the
      two branches of the fused DAG concurrently anyway (the reference
      needs explicit Futures only because its sides execute eagerly).
    """
    if order == "left_first":
        left = build_left(None)
        right = build_right(left.select(pk))
    elif order == "right_first":
        right = build_right(None)
        left = build_left(right.select(pk))
    elif order == "parallel":
        left, right = build_left(None), build_right(None)
    else:
        raise ValueError(f"unknown evaluation order {order!r}")
    return fuse(left, right, pk=pk)


def stochastic_fusion(
    candidates: list[DataFrame], k: int, pk: str = "ap_id"
) -> DataFrame:
    """Union n candidate PK sets; score = 1 - count(pk)/n; ascending top-k'
    with k' = min(50*k, 5000) (StochasticIndexQueryExpression.scala:60-66).

    groupBy on the PK gets map-side partial aggregation for free; the final
    orderBy+limit is TakeOrderedAndProject.
    """
    if not candidates:
        raise ValueError("stochastic_fusion needs at least one candidate set")
    unioned = candidates[0].select(pk)
    for c in candidates[1:]:
        unioned = unioned.union(c.select(pk))
    n = float(len(candidates))
    scored = unioned.groupBy(pk).agg(
        (F.lit(1.0) - F.count(F.lit(1)) / F.lit(n)).alias(DISTANCE_COL)
    )
    limit = min(50 * k, 5000)
    return scored.orderBy(F.col(DISTANCE_COL).asc(), F.col(pk).asc()).limit(limit)
