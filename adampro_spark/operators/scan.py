"""Scan operators: sequential kNN, Boolean filter, projections.

Parity targets:
  * ``SequentialScanExpression`` (query/ast/internal/SequentialScanExpression.scala:24-184)
    — brute-force distance on every row + top-k.  The reference builds
    ``df.withColumn(ap_distance, <UDF>).orderBy(ap_distance).limit(k)``;
    we build the same logical plan with a native distance expression, which
    Catalyst physically plans as ``TakeOrderedAndProject`` (per-partition
    heap + driver merge — no full sort, no full shuffle).  That is exactly
    the scale-out shape we want: each of N executors keeps k rows.
  * ``BooleanFilterScanExpression`` (query/ast/internal/BooleanFilterExpression.scala:29-101)
    — metadata WHERE.  The reference concatenates SQL strings
    (QueryObject.scala:55-73); we build Column predicates so Catalyst can
    push them into the Parquet scan (PushedFilters).
  * ``ProjectionExpression`` (query/ast/internal/ProjectionExpression.scala:17-115)
    — field/count/exists/distinct projections.
  * candidate pre-filter pipeline (SequentialScanExpression.scala:51-121):
    Bloom / chunked-IN / left-semi strategies all collapse to a left-semi
    join here — broadcast automatically when the candidate side is small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from adampro_spark.functions.distances import VectorLike, distance

DISTANCE_COL = "ap_distance"


def sequential_scan(
    df: DataFrame,
    vector_col: str,
    query: VectorLike,
    k: int,
    distance_name: str = "euclidean",
    weights: VectorLike | None = None,
    p: float | None = None,
    prefilter: DataFrame | None = None,
    pk: str = "ap_id",
    keep_vector: bool = False,
) -> DataFrame:
    """Brute-force kNN: distance on every (candidate) row, ascending top-k.

    ``prefilter`` is an optional candidate DataFrame carrying ``pk`` — the
    reference's pushed-down filter (strategy select at
    SequentialScanExpression.scala:75-121).  A left-semi join subsumes all
    three reference strategies; Spark broadcasts it when small (AQE).

    Ties at equal distance are broken by ``pk`` so results are deterministic
    across partitionings — the reference may lose ties (SHIndex.scala:73).
    """
    out = df
    if prefilter is not None:
        # planner rewrite (round-2 advice): a prefilter built from the
        # SAME source collapses to inline predicates — one scan with
        # pushdown instead of a self semi-join (doubled scan + shuffle)
        from adampro_spark.plans.rewrite import maybe_collapse_prefilter

        out, collapsed = maybe_collapse_prefilter(out, prefilter, pk)
        if not collapsed:
            out = out.join(prefilter.select(pk), on=pk, how="left_semi")
    dist = distance(distance_name, vector_col, query, weights=weights, p=p)
    out = out.withColumn(DISTANCE_COL, dist)
    if not keep_vector:
        out = out.drop(vector_col)
    # orderBy+limit => TakeOrderedAndProject (per-partition heap, driver merge)
    return out.orderBy(F.col(DISTANCE_COL).asc(), F.col(pk).asc()).limit(k)


def knn(
    df: DataFrame,
    vector_col: str,
    query: Sequence[float],
    k: int,
    distance_name: str = "euclidean",
    pk: str = "ap_id",
    **kwargs,
) -> DataFrame:
    """Convenience alias for :func:`sequential_scan`."""
    return sequential_scan(df, vector_col, query, k, distance_name, pk=pk, **kwargs)


def radius_scan(
    df: DataFrame,
    vector_col: str,
    query: VectorLike,
    radius: float,
    distance_name: str = "euclidean",
    weights: VectorLike | None = None,
    p: float | None = None,
    prefilter: DataFrame | None = None,
    pk: str = "ap_id",
    keep_vector: bool = False,
    limit: int | None = None,
    ordered: bool = True,
) -> DataFrame:
    """RANGE similarity search (round 12): every row within ``radius`` of
    the query (``distance <= radius``, boundary inclusive), ascending by
    distance — kNN's companion when the QUALITY BAR is known but the
    answer size is not (all near-duplicates above a cosine floor, all
    points within R meters via haversine, all candidates inside an
    ADC error bound).  Same distance library, ``weights``/``p`` knobs,
    prefilter-collapse rewrite and pk tie-breaking as
    :func:`sequential_scan`; the reference has no range operator — this
    is a beyond-reference extension expressed as ONE codegen filter.

    Scale shape: the predicate stays inside whole-stage codegen (no
    top-k heap, no shuffle); the result is whatever matches.  A
    too-large radius returns the corpus, so ``limit`` caps the answer
    with ``TakeOrderedAndProject`` semantics — the worst case is then
    exactly one kNN.  ``ordered=False`` skips the final sort (a global
    order over a large result is a range-shuffle; aggregating consumers
    don't need it) — EXCEPT when ``limit`` is also set: a capped answer
    must be the CLOSEST ``limit`` rows (an unordered limit returns an
    arbitrary, plan-dependent subset), so ``limit`` always forces the
    ordering (``TakeOrderedAndProject`` — a per-partition top-k heap,
    not a global sort-shuffle) and ``ordered=False`` is ignored.
    """
    out = df
    if prefilter is not None:
        from adampro_spark.plans.rewrite import maybe_collapse_prefilter

        out, collapsed = maybe_collapse_prefilter(out, prefilter, pk)
        if not collapsed:
            out = out.join(prefilter.select(pk), on=pk, how="left_semi")
    dist = distance(distance_name, vector_col, query, weights=weights, p=p)
    out = out.withColumn(DISTANCE_COL, dist).filter(
        F.col(DISTANCE_COL) <= F.lit(float(radius))
    )
    if not keep_vector:
        out = out.drop(vector_col)
    if ordered or limit is not None:
        out = out.orderBy(F.col(DISTANCE_COL).asc(), F.col(pk).asc())
    if limit is not None:
        out = out.limit(int(limit))
    return out


# ---------------------------------------------------------------------------
# Boolean predicates (QueryObject.scala:29-74)
# ---------------------------------------------------------------------------

_OPS = {
    "=": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    "<>": lambda c, v: c != v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
}


def predicate(attribute: str, op: str | None, values: Sequence) -> Column:
    """One ``Predicate(attribute, op, values)`` (QueryObject.scala:29-53):
    op defaults to ``=``; multiple values turn ``=``/``!=`` into IN / NOT IN.
    Built as a Column (not a SQL string) so it reaches the Parquet scan as a
    pushed filter.
    """
    op = (op or "=").strip().lower()
    col = F.col(attribute)
    if op in ("in", "=") and len(values) > 1:
        return col.isin(list(values))
    if op in ("not in", "!=", "<>") and len(values) > 1:
        return ~col.isin(list(values))
    if op == "in":
        return col.isin(list(values))
    if op == "not in":
        # single-value NOT IN is valid (review r6: used to fall through to
        # the scalar-op table and raise)
        return ~col.isin(list(values))
    if op == "like":
        return col.like(values[0])
    fn = _OPS.get(op)
    if fn is None:
        raise ValueError(f"unsupported predicate operator {op!r}")
    return fn(col, values[0])


def predicates_to_column(predicates) -> Column:
    """Normalize a predicate spec (Column / SQL string / triple list) to one
    AND-conjoined Column, so callers can also negate it (delete)."""
    if isinstance(predicates, Column):
        return predicates
    if isinstance(predicates, str):
        return F.expr(predicates)
    cond = None
    for attr, op, values in predicates:
        c = predicate(attr, op, values)
        cond = c if cond is None else (cond & c)
    if cond is None:
        return F.lit(True)
    return cond


def boolean_filter(df: DataFrame, predicates) -> DataFrame:
    """Conjunction (AND) of predicates (BooleanFilterExpression.scala:151-160).

    ``predicates`` is a Column, a SQL string, or a list of
    ``(attribute, op, values)`` triples which are ANDed.
    """
    return df.filter(predicates_to_column(predicates))


# ---------------------------------------------------------------------------
# Projections (ProjectionExpression.scala:17-115)
# ---------------------------------------------------------------------------

def project(df: DataFrame, fields: Sequence[str] | None) -> DataFrame:
    """SELECT a,b,c (or * when fields is falsy) — FieldNameProjection."""
    if not fields:
        return df
    return df.select(*fields)


def count_projection(df: DataFrame) -> DataFrame:
    """Single-row COUNT (ProjectionExpression.scala:75-87)."""
    return df.agg(F.count(F.lit(1)).alias("count"))


def exists_projection(df: DataFrame) -> DataFrame:
    """Single-row EXISTS boolean.

    The reference tests ``count() > 1`` — a known bug
    (ProjectionExpression.scala:91); implemented correctly here as
    ``limit(1).count() > 0`` per SURVEY §7.4.
    """
    return df.limit(1).agg((F.count(F.lit(1)) > 0).alias("exists"))


def distinct_projection(df: DataFrame, fields: Sequence[str] | None = None) -> DataFrame:
    """DISTINCT rows (ProjectionExpression.scala:103-115)."""
    return project(df, fields).distinct()
