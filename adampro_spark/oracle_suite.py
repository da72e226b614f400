"""Driver-contract query battery: (Spark query, DuckDB oracle SQL) pairs.

Every implemented operator from SURVEY.md §2 registers here as a
``name -> callable(spark, sf_dir) -> DataFrame`` plus a matching ANSI-SQL
string DuckDB runs on the same parquet files.  The driver compares
row-count + schema + order-insensitive value hash, so:

  * every computed column is aliased identically on both sides;
  * float results are rounded to 4 decimals on both sides (ordering uses
    full precision) — the distance kernels themselves are bit-reproducible
    (Spark ``F.aggregate`` left-fold == DuckDB ``list_reduce`` left-fold,
    verified), rounding only de-risks libm-dependent ops (log/pow/trig);
  * every query orders deterministically before LIMIT (ties broken by PK).

Parity cites: sequential kNN SequentialScanExpression.scala:24-184,
projections ProjectionExpression.scala:17-115, predicates
QueryObject.scala:29-74, fusions AggregationExpression.scala:137-392,
stochastic fusion StochasticIndexQueryExpression.scala:28-92.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adampro_spark.operators.scan import (
    DISTANCE_COL,
    boolean_filter,
    count_projection,
    distinct_projection,
    exists_projection,
    predicate,
    project,
    sequential_scan,
)
from adampro_spark.operators import fusion as FU

# ---------------------------------------------------------------------------
# deterministic fixtures
# ---------------------------------------------------------------------------

DIM = 64
# patterned, exactly-representable-ish literals (4 decimals) so the SQL
# literal and the Python literal parse to identical doubles
QVEC = [round(0.1 * ((i * 7) % 13) - 0.5, 4) for i in range(DIM)]
QVEC2 = [round(0.05 * ((i * 11) % 17) - 0.3, 4) for i in range(DIM)]
WVEC = [round(0.02 * ((i * 5) % 11) + 0.1, 4) for i in range(DIM)]
# strictly-positive query vector for KL (log of ratios) and modulo (divisor)
QVEC_POS = [round(0.1 * ((i * 7) % 13) + 0.25, 4) for i in range(DIM)]

K = 20


def _sql_list(vals: list[float]) -> str:
    return "[" + ",".join(repr(float(v)) for v in vals) + "]::DOUBLE[]"


QS = _sql_list(QVEC)
QS2 = _sql_list(QVEC2)
WS = _sql_list(WVEC)
QSP = _sql_list(QVEC_POS)


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table; restore nanos timestamps if present.

    Runs with the *driver's* SparkSession, which may not carry our
    ``nanosAsLong`` config — set it at runtime before touching files that
    need it (events.ts is TIMESTAMP(NANOS) in the testdata).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("`ts` div 1000")))
        return df
    return spark.read.parquet(path)


def _round4(df: DataFrame, col: str = DISTANCE_COL) -> DataFrame:
    return df.withColumn(col, F.round(F.col(col), 4))


# ---------------------------------------------------------------------------
# DuckDB distance formula fragments (sequential left-fold == F.aggregate)
# ---------------------------------------------------------------------------

def _fold(terms: str) -> str:
    return f"list_reduce({terms}, (a, b) -> a + b)"


def _duck_distance(name: str) -> str:
    """DuckDB expression for distance(embedding, QVEC) as a double ``d``."""
    x = "x::DOUBLE"
    if name == "manhattan":
        return _fold(f"list_transform(embedding, (x,i) -> abs({x} - ({QS})[i]))")
    if name == "euclidean":
        return (
            "sqrt("
            + _fold(f"list_transform(embedding, (x,i) -> ({x} - ({QS})[i]) * ({x} - ({QS})[i]))")
            + ")"
        )
    if name == "squaredeuclidean":
        return _fold(
            f"list_transform(embedding, (x,i) -> ({x} - ({QS})[i]) * ({x} - ({QS})[i]))"
        )
    if name == "chebyshev":
        return f"list_aggregate(list_transform(embedding, (x,i) -> abs({x} - ({QS})[i])), 'max')"
    if name == "cosine":
        dot = _fold(f"list_transform(embedding, (x,i) -> {x} * ({QS})[i])")
        nv = "sqrt(" + _fold(f"list_transform(embedding, (x,i) -> {x} * {x})") + ")"
        nq = "sqrt(" + _fold(f"list_transform({QS}, (x,i) -> x * x)") + ")"
        return f"(CASE WHEN {nv} < 1e-5 OR {nq} < 1e-5 THEN 0.0 ELSE 1.0 - ({dot}) / (({nv}) * ({nq})) END)"
    if name == "chisquared":
        return _fold(
            f"list_transform(embedding, (x,i) -> CASE WHEN {x} + ({QS})[i] > 0 "
            f"THEN ({x} - ({QS})[i]) * ({x} - ({QS})[i]) / ({x} + ({QS})[i]) ELSE 0.0 END)"
        )
    if name == "hamming":
        # literals cast to DOUBLE (DuckDB would otherwise infer DECIMAL(2,1)
        # and overflow on the fold)
        return _fold(
            f"list_transform(embedding, (x,i) -> CASE WHEN abs({x} - ({QS})[i]) > 1e-5 "
            f"THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END)"
        )
    if name == "jaccard":
        smin = _fold(f"list_transform(embedding, (x,i) -> least({x}, ({QS})[i]))")
        smax = _fold(f"list_transform(embedding, (x,i) -> greatest({x}, ({QS})[i]))")
        return f"(CASE WHEN ({smax}) = 0.0 THEN 0.0 ELSE 1.0 - ({smin}) / ({smax}) END)"
    if name == "kullbackleibler":
        # reference direction: q * ln(q / x), zero-guarded.  Computed over a
        # strictly-positive derived vector (abs(x)+0.5) and positive query so
        # DuckDB's ln never sees a negative ratio (Spark's log would NULL it,
        # Scala's math.log would NaN — three engines, three behaviours; a
        # positive domain is the only oracle-checkable one, and KL is only
        # defined on positive distributions anyway).
        return _fold(
            f"list_transform(embedding, (x,i) -> ({QSP})[i] * ln(({QSP})[i] / (abs({x}) + 0.5)))"
        )
    if name == "spannorm":
        diffs = f"list_transform(embedding, (x,i) -> {x} - ({QS})[i])"
        return f"(list_aggregate({diffs}, 'max') - list_aggregate({diffs}, 'min'))"
    if name == "modulo":
        # strictly-positive divisor query vector (ANSI Spark errors on x % 0);
        # DuckDB mod() is truncated like Spark/Java %, fmod() is floored
        return _fold(
            f"list_transform(embedding, (x,i) -> CASE WHEN ({QSP})[i] = 0.0 "
            f"THEN 0.0 ELSE mod({x}, ({QSP})[i]) END)"
        )
    if name == "minkowski3":
        return (
            "pow("
            + _fold(f"list_transform(embedding, (x,i) -> pow(abs({x} - ({QS})[i]), 3.0))")
            + ", 1.0/3.0)"
        )
    raise ValueError(name)


def _knn_sql(dist_expr: str, k: int = K, where: str = "") -> str:
    w = f"WHERE {where}" if where else ""
    return f"""
    SELECT vec_id, round(d, 4) AS {DISTANCE_COL} FROM (
      SELECT vec_id, {dist_expr} AS d FROM embeddings {w}
      ORDER BY d ASC, vec_id ASC LIMIT {k}
    ) ORDER BY d
    """


def _knn_spark(
    spark: SparkSession,
    sf_dir: str,
    distance_name: str,
    k: int = K,
    weights=None,
    p=None,
    predicates=None,
    prefilter_pred=None,
    query_vec=None,
    positive_vec: bool = False,
) -> DataFrame:
    """Sequential kNN routed through the QueryOp facade
    (ops.QueryOps.sequential = BooleanFilterScan ∘ SequentialScan,
    QueryOp.scala:56-69) — the facade IS the engine's query surface, so
    the driver suite exercises it on every scan."""
    from adampro_spark.ops import AdamOps

    df = _table(spark, sf_dir, "embeddings")
    if positive_vec:
        # derived strictly-positive vector (matches the oracle's abs(x)+0.5)
        df = df.withColumn(
            "embedding",
            F.transform(F.col("embedding").cast("array<double>"),
                        lambda x: F.abs(x) + F.lit(0.5)),
        )
    pre = None
    if prefilter_pred is not None:
        pre = boolean_filter(
            _table(spark, sf_dir, "embeddings"), prefilter_pred
        ).select("vec_id")
    ops = AdamOps(spark, os.path.join(_SCRATCH, "qcat"))
    res = ops.query.sequential(
        "embeddings_ext", "embedding",
        query_vec if query_vec is not None else QVEC, k, distance_name,
        predicates=predicates, df=df, pk="vec_id",
        weights=weights, p=p, prefilter=pre,
    )
    return _round4(res.select("vec_id", DISTANCE_COL))


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, fn: Callable[[SparkSession, str], DataFrame], sql: str | None):
    QUERIES[name] = fn
    if sql is not None:
        ORACLES[name] = sql


# -- sequential kNN, one per distance (SequentialScanExpression + §2.5) -----
#
# The driver adjudicates only the FIRST 50 registered queries (round-3
# verdict), so the 14 single-distance variants fold into ONE tagged-union
# query (``knn_seq_distances``).  Every distance kernel still gets a full
# rows+schema+hash check — a mismatch in any one metric flips the fold red.
# The individual callables stay available in ``BENCH_ONLY`` so bench.py
# keeps its round-over-round per-query timings comparable.

BENCH_ONLY: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

_SEQ_VARIANTS: list[tuple[str, Callable[[SparkSession, str], DataFrame], str]] = []


def _seq_variant(tag: str, fn: Callable[[SparkSession, str], DataFrame], sql: str):
    _SEQ_VARIANTS.append((tag, fn, sql))
    BENCH_ONLY[f"knn_seq_{tag}"] = fn


_DISTS = [
    "manhattan", "euclidean", "squaredeuclidean", "chebyshev", "cosine",
    "chisquared", "hamming", "jaccard", "spannorm",
]

for _d in _DISTS:
    _seq_variant(
        _d,
        (lambda d: lambda spark, sf: _knn_spark(spark, sf, d))(_d),
        _knn_sql(_duck_distance(_d)),
    )

_seq_variant(
    "kullbackleibler",
    lambda spark, sf: _knn_spark(
        spark, sf, "kullbackleibler", query_vec=QVEC_POS, positive_vec=True
    ),
    _knn_sql(_duck_distance("kullbackleibler")),
)

_seq_variant(
    "modulo",
    lambda spark, sf: _knn_spark(spark, sf, "modulo", query_vec=QVEC_POS),
    _knn_sql(_duck_distance("modulo")),
)

_seq_variant(
    "minkowski3",
    lambda spark, sf: _knn_spark(spark, sf, "minkowski", p=3.0),
    _knn_sql(_duck_distance("minkowski3")),
)

# Round 12: RANGE similarity search (radius_scan / ops.query.radius —
# beyond-reference: ADAMpro is kNN-only).  The radius sits in a probed
# GAP of the distance distribution (≥6e-4 from every corpus distance at
# sf0.01 AND sf0.1), so the boundary-inclusive filter can never flip a
# row on cross-engine float noise; the variant adjudicates the filter
# expression, the inclusive bound and the ordering tie-break.
_RADIUS = 3.0997


def _radius_spark(spark: SparkSession, sf: str) -> DataFrame:
    from adampro_spark.ops import AdamOps

    df = _table(spark, sf, "embeddings")
    ops = AdamOps(spark, os.path.join(_SCRATCH, "qcat"))
    res = ops.query.radius(
        "embeddings_ext", "embedding", QVEC, _RADIUS, "euclidean",
        df=df, pk="vec_id",
    )
    return _round4(res.select("vec_id", DISTANCE_COL))


_RADIUS_SQL = f"""
    SELECT vec_id, round(d, 4) AS {DISTANCE_COL} FROM (
      SELECT vec_id, {_duck_distance("euclidean")} AS d FROM embeddings
    ) WHERE d <= {_RADIUS}
    """

_seq_variant("radius", _radius_spark, _RADIUS_SQL)


def _radius_ecp_spark(spark: SparkSession, sf: str) -> DataFrame:
    """Index-accelerated range search (ecp_radius: triangle-inequality
    cell pruning over per-cell radii recorded at build) — EXACT for
    metric distances, so it adjudicates against the SAME brute-force
    SQL as the sequential radius variant: the pruning bound provably
    drops no true match, and the oracle enforces it."""
    from adampro_spark.index.ecp import build_ecp, ecp_radius

    emb = _table(spark, sf, "embeddings")
    idx, meta = build_ecp(emb, "embedding", pk="vec_id", autofit=False)
    res = ecp_radius(emb, "embedding", idx, meta, QVEC, _RADIUS)
    return _round4(res.select("vec_id", DISTANCE_COL))


_seq_variant("radius_ecp", _radius_ecp_spark, _RADIUS_SQL)


def _correlation_sql() -> str:
    # center both sides then cosine (CorrelationDistance.scala:16-24)
    qmean = sum(QVEC) / DIM  # python-side constant; Spark centers q the same way
    vc = "list_transform(embedding, (x,i) -> x::DOUBLE - vmean)"
    dot = f"list_reduce(list_transform({vc}, (x,i) -> x * (({QS})[i] - qm)), (a,b)->a+b)"
    nv = f"sqrt(list_reduce(list_transform({vc}, (x,i) -> x * x), (a,b)->a+b))"
    nq = f"sqrt(list_reduce(list_transform({QS}, (x,i) -> (x - qm) * (x - qm)), (a,b)->a+b))"
    d = f"(CASE WHEN {nv} < 1e-5 OR {nq} < 1e-5 THEN 0.0 ELSE 1.0 - ({dot}) / (({nv}) * ({nq})) END)"
    return f"""
    SELECT vec_id, round(d, 4) AS {DISTANCE_COL} FROM (
      SELECT vec_id, {d} AS d FROM (
        SELECT vec_id, embedding,
               list_reduce(list_transform(embedding, (x,i) -> x::DOUBLE), (a,b)->a+b) / {DIM} AS vmean,
               list_reduce({QS}, (a,b)->a+b) / {DIM} AS qm
        FROM embeddings
      )
      ORDER BY d ASC, vec_id ASC LIMIT {K}
    ) ORDER BY d
    """


_seq_variant(
    "correlation",
    lambda spark, sf: _knn_spark(spark, sf, "correlation"),
    _correlation_sql(),
)


def _haversine_sql() -> str:
    # first two dims as (lat, lng); clamp lat, normalize lng (HaversineDistance.scala:22-66)
    lat = "radians(greatest(-90.0, least(90.0, {v})))"
    lng = (
        "radians(CASE WHEN m{n} < 180.0 THEN m{n} ELSE m{n} - 360.0 END)"
    )
    return f"""
    SELECT vec_id, round(d, 4) AS {DISTANCE_COL} FROM (
      SELECT vec_id,
        2.0 * 6371000.0 * atan2(sqrt(a), sqrt(1.0 - a)) AS d
      FROM (
        SELECT vec_id,
          pow(sin((lat2 - lat1) / 2.0), 2)
          + cos(lat1) * cos(lat2) * pow(sin((lng2 - lng1) / 2.0), 2) AS a
        FROM (
          SELECT vec_id,
            {lat.format(v='embedding[1]::DOUBLE')} AS lat1,
            {lng.format(n='1')} AS lng1,
            {lat.format(v=repr(float(QVEC[0])))} AS lat2,
            {lng.format(n='2')} AS lng2
          FROM (
            SELECT vec_id, embedding,
              fmod(fmod(embedding[2]::DOUBLE, 360.0) + 360.0, 360.0) AS m1,
              fmod(fmod({QVEC[1]!r}, 360.0) + 360.0, 360.0) AS m2
            FROM embeddings
          )
        )
      )
      ORDER BY d ASC, vec_id ASC LIMIT {K}
    ) ORDER BY d
    """


_seq_variant(
    "haversine",
    lambda spark, sf: _knn_spark(spark, sf, "haversine"),
    _haversine_sql(),
)

# -- weighted variants (ElementwiseSummedDistanceFunction.scala:45-87) ------

_seq_variant(
    "manhattan_weighted",
    lambda spark, sf: _knn_spark(spark, sf, "manhattan", weights=WVEC),
    _knn_sql(
        _fold(
            f"list_transform(embedding, (x,i) -> abs(x::DOUBLE - ({QS})[i]) * ({WS})[i])"
        )
    ),
)

_seq_variant(
    "zero_weights",
    # all-zero weights => all distances 0 (QueryTestSuite.scala:59-77);
    # top-k then degenerates to first k PKs
    lambda spark, sf: _knn_spark(spark, sf, "euclidean", weights=[0.0] * DIM),
    f"""
    SELECT vec_id, 0.0 AS {DISTANCE_COL} FROM embeddings
    ORDER BY vec_id ASC LIMIT {K}
    """,
)


def _union_all(parts: list[DataFrame]) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _seq_fold(spark: SparkSession, sf: str) -> DataFrame:
    return _union_all(
        [
            fn(spark, sf).select(
                F.lit(tag).alias("metric"), "vec_id", DISTANCE_COL
            )
            for tag, fn, _ in _SEQ_VARIANTS
        ]
    )


_register(
    "knn_seq_distances",
    _seq_fold,
    "\nUNION ALL\n".join(
        f"SELECT '{tag}' AS metric, * FROM ({sql})" for tag, _, sql in _SEQ_VARIANTS
    ),
)

# -- prefilter / combined boolean+kNN (SequentialScanExpression.scala:51-121)

_register(
    "knn_prefilter_semijoin",
    lambda spark, sf: _knn_spark(
        spark, sf, "manhattan", prefilter_pred=[("label", "=", [2])]
    ),
    _knn_sql(_duck_distance("manhattan"), where="label = 2"),
)

_register(
    "knn_boolean_combined",
    lambda spark, sf: _knn_spark(
        spark, sf, "euclidean",
        predicates=[("label", "!=", [0]), ("vec_id", "<", [400])],
    ),
    _knn_sql(_duck_distance("euclidean"), where="label != 0 AND vec_id < 400"),
)

# -- projections (ProjectionExpression.scala:17-115) ------------------------
# Round-8 window re-fold (round-7 verdict #1): the four projection kinds
# merge into ONE tagged-union driver row over a shared (part, k, v)
# schema — each kind still contributes its full result to the value
# hash (fields: every (custkey|name, acctbal); count/exists: the scalar;
# distinct: every distinct key pair), so a defect in any projection
# operator flips the fold red.  Individual callables stay in BENCH_ONLY.


def _proj_fields(spark, sf):
    return project(
        _table(spark, sf, "customer"), ["c_custkey", "c_name", "c_acctbal"]
    )


def _proj_count(spark, sf):
    return count_projection(_table(spark, sf, "lineitem"))


def _proj_exists(spark, sf):
    return exists_projection(
        boolean_filter(_table(spark, sf, "orders"), [("o_orderstatus", "=", ["F"])])
    )


def _proj_distinct(spark, sf):
    return distinct_projection(
        _table(spark, sf, "lineitem"), ["l_returnflag", "l_linestatus"]
    )


BENCH_ONLY["projection_fields"] = _proj_fields
BENCH_ONLY["projection_count"] = _proj_count
BENCH_ONLY["projection_exists"] = _proj_exists
BENCH_ONLY["projection_distinct"] = _proj_distinct


def _projection_suite(spark: SparkSession, sf: str) -> DataFrame:
    parts = [
        (
            "fields",
            _proj_fields(spark, sf).select(
                F.concat_ws(
                    "|", F.col("c_custkey").cast("string"), F.col("c_name")
                ).alias("k"),
                F.col("c_acctbal").cast("double").alias("v"),
            ),
        ),
        (
            "count",
            _proj_count(spark, sf).select(
                F.lit("lineitem").alias("k"),
                F.col("count").cast("double").alias("v"),
            ),
        ),
        (
            "exists",
            _proj_exists(spark, sf).select(
                F.lit("orders_F").alias("k"),
                F.col("exists").cast("int").cast("double").alias("v"),
            ),
        ),
        (
            "distinct",
            _proj_distinct(spark, sf).select(
                F.concat_ws("|", "l_returnflag", "l_linestatus").alias("k"),
                F.lit(1.0).alias("v"),
            ),
        ),
    ]
    return _union_all(
        [df.select(F.lit(tag).alias("part"), "k", "v") for tag, df in parts]
    )


_register(
    "projection_suite",
    _projection_suite,
    """
    SELECT 'fields' AS part, c_custkey::VARCHAR || '|' || c_name AS k,
           c_acctbal::DOUBLE AS v FROM customer
    UNION ALL
    SELECT 'count', 'lineitem', count(*)::DOUBLE FROM lineitem
    UNION ALL
    SELECT 'exists', 'orders_F', (count(*) > 0)::INT::DOUBLE FROM (
      SELECT 1 FROM orders WHERE o_orderstatus = 'F' LIMIT 1)
    UNION ALL
    SELECT 'distinct', l_returnflag || '|' || l_linestatus, 1.0::DOUBLE
    FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)
    """,
)

# -- boolean predicates (QueryObject.scala:29-74) ---------------------------
# Folded into one tagged union (driver 50-row window): each predicate kind
# contributes its full matching-PK set, so the value hash still adjudicates
# exactly WHICH rows every operator (=, IN, NOT IN, range, LIKE, compound)
# selected.  Projection-of-columns itself is covered by projection_fields.


def _pred_compound(spark, sf):
    return boolean_filter(
        _table(spark, sf, "lineitem"),
        [
            ("l_returnflag", "=", ["R"]),
            ("l_quantity", ">", [25.0]),
            ("l_discount", "<=", [0.05]),
        ],
    ).select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long").alias("pk")
    )


def _predicate_parts(spark, sf) -> list[tuple[str, DataFrame]]:
    docs = _table(spark, sf, "documents")
    return [
        ("eq", boolean_filter(docs, [("lang", "=", ["en"])]).select(
            F.col("doc_id").cast("long").alias("pk"))),
        ("in", boolean_filter(
            _table(spark, sf, "customer"),
            [("c_mktsegment", "=", ["BUILDING", "MACHINERY"])],
        ).select(F.col("c_custkey").cast("long").alias("pk"))),
        ("not_in", boolean_filter(docs, [("lang", "!=", ["en", "de"])]).select(
            F.col("doc_id").cast("long").alias("pk"))),
        ("range", boolean_filter(
            _table(spark, sf, "orders"),
            [("o_totalprice", ">=", [1000.0]), ("o_totalprice", "<", [5000.0])],
        ).select(F.col("o_orderkey").cast("long").alias("pk"))),
        ("like", boolean_filter(docs, [("source", "like", ["src1%"])]).select(
            F.col("doc_id").cast("long").alias("pk"))),
        ("compound", _pred_compound(spark, sf)),
    ]


def _predicate_suite(spark: SparkSession, sf: str) -> DataFrame:
    return _union_all(
        [
            df.select(F.lit(tag).alias("pred"), "pk")
            for tag, df in _predicate_parts(spark, sf)
        ]
    )


_register(
    "predicate_suite",
    _predicate_suite,
    """
    SELECT 'eq' AS pred, doc_id::BIGINT AS pk FROM documents WHERE lang = 'en'
    UNION ALL
    SELECT 'in', c_custkey::BIGINT FROM customer
      WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    UNION ALL
    SELECT 'not_in', doc_id::BIGINT FROM documents WHERE lang NOT IN ('en', 'de')
    UNION ALL
    SELECT 'range', o_orderkey::BIGINT FROM orders
      WHERE o_totalprice >= 1000.0 AND o_totalprice < 5000.0
    UNION ALL
    SELECT 'like', doc_id::BIGINT FROM documents WHERE source LIKE 'src1%'
    UNION ALL
    SELECT 'compound', (l_orderkey * 10 + l_linenumber)::BIGINT FROM lineitem
      WHERE l_returnflag = 'R' AND l_quantity > 25.0 AND l_discount <= 0.05
    """,
)

BENCH_ONLY["predicate_compound"] = lambda spark, sf: boolean_filter(
    _table(spark, sf, "lineitem"),
    [
        ("l_returnflag", "=", ["R"]),
        ("l_quantity", ">", [25.0]),
        ("l_discount", "<=", [0.05]),
    ],
).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")

# -- fusions (AggregationExpression.scala) ----------------------------------

def _docs_sides(spark, sf):
    docs = _table(spark, sf, "documents")
    left = boolean_filter(docs, [("lang", "=", ["en"])])
    right = boolean_filter(docs, [("n_chars", ">", [300])])
    return left, right


_DOCS_L = "SELECT doc_id FROM documents WHERE lang = 'en'"
_DOCS_R = "SELECT doc_id FROM documents WHERE n_chars > 300"

# UNION / INTERSECT / EXCEPT fold into one tagged union (50-row window);
# each set-op still contributes its exact result-PK multiset to the hash.


def _fusion_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Also adjudicates the two trivial nodes (verdict r6 #2, zero slot
    cost): every set-op side routes through ``compound()``
    (CompoundQueryExpression.scala:15-34 — pass-through, so the hash is
    unchanged iff the wrapper is semantically invisible) and an
    ``empty_relation`` with the row schema rides the union
    (AggregationExpression.scala:397-412 — schema-compatible, contributes
    exactly 0 rows, so row-count AND hash prove emptiness)."""
    from adampro_spark.operators.misc import compound, empty_relation

    parts = []
    for tag, fn in [
        ("union", FU.union_fusion),
        ("intersect", FU.intersect_fusion),
        ("except", FU.except_fusion),
    ]:
        res = compound(fn(*_docs_sides(spark, sf), pk="doc_id"))
        parts.append(res.select(F.lit(tag).alias("setop"), "doc_id", DISTANCE_COL))
    parts.append(
        empty_relation(
            spark, f"setop string, doc_id long, {DISTANCE_COL} double"
        )
    )
    return compound(_union_all(parts))


_register(
    "fusion_set_ops",
    _fusion_set_ops,
    f"""
    SELECT 'union' AS setop, doc_id, 0.0 AS {DISTANCE_COL}
      FROM (({_DOCS_L}) UNION ALL ({_DOCS_R}))
    UNION ALL
    SELECT 'intersect', doc_id, 0.0 FROM (({_DOCS_L}) INTERSECT ({_DOCS_R}))
    UNION ALL
    SELECT 'except', doc_id, 0.0 FROM (({_DOCS_L}) EXCEPT ({_DOCS_R}))
    """,
)


def _knn_pair(spark, sf, k=50):
    df = _table(spark, sf, "embeddings")
    left = sequential_scan(df, "embedding", QVEC, k, "manhattan", pk="vec_id").select(
        "vec_id", DISTANCE_COL
    )
    right = sequential_scan(df, "embedding", QVEC2, k, "manhattan", pk="vec_id").select(
        "vec_id", DISTANCE_COL
    )
    return left, right


def _knn_cte(qs: str, k: int = 50) -> str:
    return f"""
      SELECT vec_id, d FROM (
        SELECT vec_id,
          list_reduce(list_transform(embedding, (x,i) -> abs(x::DOUBLE - ({qs})[i])), (a,b)->a+b) AS d
        FROM embeddings ORDER BY d ASC, vec_id ASC LIMIT {k}
      )
    """


# fuzzy (t-conorm min / t-norm max, AggregationExpression.scala:137-392)
# folded into one tagged union; both score combiners hash-checked.


def _fusion_fuzzy(spark: SparkSession, sf: str) -> DataFrame:
    parts = []
    for tag, fn in [("union", FU.fuzzy_union), ("intersect", FU.fuzzy_intersect)]:
        res = _round4(fn(*_knn_pair(spark, sf), pk="vec_id"))
        parts.append(res.select(F.lit(tag).alias("fuzzop"), "vec_id", DISTANCE_COL))
    return _union_all(parts)


# registered below as part of the round-8 fusion_rank_suite fold
_FUSION_FUZZY_SQL = f"""
    WITH l AS ({_knn_cte(QS)}), r AS ({_knn_cte(QS2)})
    SELECT 'union' AS fuzzop, coalesce(l.vec_id, r.vec_id) AS vec_id,
           round(least(coalesce(l.d, 0.0), coalesce(r.d, 0.0)), 4) AS {DISTANCE_COL}
    FROM l FULL OUTER JOIN r ON l.vec_id = r.vec_id
    UNION ALL
    SELECT 'intersect', coalesce(l.vec_id, r.vec_id),
           round(greatest(coalesce(l.d, 0.0), coalesce(r.d, 0.0)), 4)
    FROM l FULL OUTER JOIN r ON l.vec_id = r.vec_id
    """

BENCH_ONLY["fusion_fuzzy_union"] = lambda spark, sf: _round4(
    FU.fuzzy_union(*_knn_pair(spark, sf), pk="vec_id")
)


def _stochastic(spark, sf):
    emb = _table(spark, sf, "embeddings")
    cands = [
        boolean_filter(emb, [("label", "=", [0])]),
        boolean_filter(emb, [("label", "=", [1])]),
        boolean_filter(emb, [("vec_id", "<", [250])]),
    ]
    return _round4(FU.stochastic_fusion([c.select("vec_id") for c in cands], k=4, pk="vec_id"))


# registered below as part of the round-8 fusion_rank_suite fold
BENCH_ONLY["fusion_stochastic"] = _stochastic
_FUSION_STOCH_SQL = f"""
    SELECT vec_id, round(1.0 - count(*) / 3.0, 4) AS {DISTANCE_COL}
    FROM (
      (SELECT vec_id FROM embeddings WHERE label = 0)
      UNION ALL (SELECT vec_id FROM embeddings WHERE label = 1)
      UNION ALL (SELECT vec_id FROM embeddings WHERE vec_id < 250)
    )
    GROUP BY vec_id
    ORDER BY {DISTANCE_COL} ASC, vec_id ASC LIMIT 200
    """

# -- entity preview (Entity.scala:261) --------------------------------------

_register(
    "entity_preview",
    # deterministic preview: first k rows by PK (reference preview has no
    # defined order; pinning to PK makes it oracle-checkable)
    lambda spark, sf: _table(spark, sf, "nation").orderBy("n_nationkey").limit(10),
    "SELECT * FROM nation ORDER BY n_nationkey LIMIT 10",
)


# -- VA-File index scans (exact → brute-force oracle; VAIndex.scala:37-38) --

def _va_query(index_type: str, marktype: str, distance: str):
    def run(spark: SparkSession, sf: str) -> DataFrame:
        from adampro_spark.index.va import build_va, va_knn

        df = _table(spark, sf, "embeddings")
        idx, meta = build_va(
            df, "embedding", pk="vec_id", index_type=index_type, marktype=marktype
        )
        res = va_knn(df, "embedding", idx, meta, QVEC, K, distance_name=distance)
        return _round4(res.select("vec_id", DISTANCE_COL))

    return run


# Round-6 window re-fold: the four VA-family scans (vaf/equifrequent,
# vaf/equidistant, vav, va+) merge into ONE tagged-union driver row —
# each variant still contributes its full rows+schema+hash — freeing
# three window slots for the round-5 verdict's missing §2 rows
# (proto_roundtrip / execution_modes / repartition_invariance).  The
# fold itself is registered below, after _lossy_query exists (VA+ rides
# it); individual callables stay in BENCH_ONLY for bench continuity.
_VA_VARIANTS: list[tuple[str, Callable[[SparkSession, str], DataFrame], str]] = [
    (
        "vaf_manhattan",
        _va_query("vaf", "equifrequent", "manhattan"),
        _knn_sql(_duck_distance("manhattan")),
    ),
    (
        "vaf_equidistant_euclidean",
        _va_query("vaf", "equidistant", "euclidean"),
        _knn_sql(_duck_distance("euclidean")),
    ),
    (
        "vav_euclidean",
        _va_query("vav", "equifrequent", "euclidean"),
        _knn_sql(_duck_distance("euclidean")),
    ),
]
for _tag, _fn, _ in _VA_VARIANTS:
    BENCH_ONLY[f"knn_{_tag}"] = _fn


# -- lossy index scans (ECP/LSH/MI/PQ/SH/VA+) -------------------------------
# All builds are seed-fixed AND layout-independent (training samples are
# xxhash64(pk)-ranked, not partition-order .sample collects), so results
# are deterministic in any driver environment.  Candidate widths are tuned
# until the refined result provably equals brute force at sf0.01 (recall
# sweep in tests/test_lossy_indexes.py; the reference's own bar for lossy
# indexes is top-1 + recall, QueryTestSuite.scala:92-108 — these settings
# clear the stronger exact bar, so every query carries the full SQL
# oracle).  Wide candidate sets are the price of exactness at a 500-row
# sf; production scans use the narrower defaults and the recall bar.

_LOSSY_PARAMS: dict[str, dict] = {
    # recall sweeps: ecp exact from times_k=20 at sf0.01 and 75 at sf0.1,
    # mi at 25 (sf0.01; auto-frac carries sf0.1), lsh at (64 tables, 16
    # probes), sh at (25, 12) sf0.01 / (100, 32) sf0.1.  Registered with
    # margin at the LARGER scale — widening is monotone (the seeded
    # jitter sequence at a larger num_of_q is a strict prefix-superset,
    # so the candidate set only grows), so the widths below are exact at
    # sf0.001, sf0.01 AND sf0.1 (verified by sweep), not just at the
    # driver's gate.  Round 16: manhattan-LSH missed 1/10 neighbors at
    # the 500-row sf0.001 with 16 probes (the p-stable radius is fit for
    # denser buckets); 32 probes are exact at all three SFs.
    "ecp": {"times_k": 85},
    "mi": {"times_k": 30},
    "lsh": {"ntables": 64, "num_of_q": 32},
    "sh": {"times_k": 110, "num_of_q": 32},
}


def _lossy_query(kind: str, distance: str):
    def run(spark: SparkSession, sf: str) -> DataFrame:
        from adampro_spark import index as IX

        df = _table(spark, sf, "embeddings")
        p = _LOSSY_PARAMS.get(kind, {})
        if kind == "ecp":
            idx, meta = IX.build_ecp(df, "embedding", pk="vec_id", distance_name=distance)
            res = IX.ecp_knn(df, "embedding", idx, meta, QVEC, K, distance, **p)
        elif kind == "pq":
            idx, meta = IX.build_pq(df, "embedding", pk="vec_id")
            res = IX.pq_knn(df, "embedding", idx, meta, QVEC, K, distance)
        elif kind == "mi":
            idx, meta = IX.build_mi(df, "embedding", pk="vec_id", distance_name=distance)
            res = IX.mi_knn(df, "embedding", idx, meta, QVEC, K, distance, **p)
        elif kind == "lsh":
            idx, meta = IX.build_lsh(
                df, "embedding", pk="vec_id", distance_name=distance,
                ntables=p.get("ntables", 16),
            )
            res = IX.lsh_knn(
                df, "embedding", idx, meta, QVEC, K, distance,
                num_of_q=p.get("num_of_q", 3),
            )
        elif kind == "sh":
            idx, meta = IX.build_sh(df, "embedding", pk="vec_id")
            res = IX.sh_knn(df, "embedding", idx, meta, QVEC, K, **p)
        elif kind == "vaplus":
            idx, meta = IX.build_vaplus(df, "embedding", pk="vec_id")
            res = IX.vaplus_knn(df, "embedding", idx, meta, QVEC, K)
        else:
            raise ValueError(kind)
        return _round4(res.select("vec_id", DISTANCE_COL))

    return run


# Round-8 window re-fold (round-7 verdict #1): the four per-type lossy
# scans (eCP/PQ/MI/SH, all → exact vs the brute-force oracle) merge into
# ONE tagged-union driver row — the knn_persisted_suite trick; each
# index type still contributes its full rows+schema+hash.  Individual
# callables stay in BENCH_ONLY for bench continuity.
_LOSSY_VARIANTS: list[tuple[str, Callable[[SparkSession, str], DataFrame], str]] = [
    ("ecp", _lossy_query("ecp", "euclidean"), _knn_sql(_duck_distance("euclidean"))),
    ("pq", _lossy_query("pq", "euclidean"), _knn_sql(_duck_distance("euclidean"))),
    ("mi", _lossy_query("mi", "euclidean"), _knn_sql(_duck_distance("euclidean"))),
    ("sh", _lossy_query("sh", "euclidean"), _knn_sql(_duck_distance("euclidean"))),
]
for _tag, _fn, _ in _LOSSY_VARIANTS:
    BENCH_ONLY[f"knn_{_tag}_euclidean"] = _fn
# LSH folds with its hamming sibling below (knn_lsh_suite); here only
# the bench callable.
BENCH_ONLY["knn_lsh_manhattan"] = _lossy_query("lsh", "manhattan")


def _lossy_fold(spark: SparkSession, sf: str) -> DataFrame:
    return _union_all(
        [
            fn(spark, sf).select(
                F.lit(tag).alias("index_type"), "vec_id", DISTANCE_COL
            )
            for tag, fn, _ in _LOSSY_VARIANTS
        ]
    )


_register(
    "knn_lossy_suite",
    _lossy_fold,
    "\nUNION ALL\n".join(
        f"SELECT '{tag}' AS index_type, * FROM ({sql})"
        for tag, _, sql in _LOSSY_VARIANTS
    ),
)

# VA+ completes the VA family fold (see _VA_VARIANTS above).
_VA_VARIANTS.append(
    (
        "vaplus_euclidean",
        _lossy_query("vaplus", "euclidean"),
        _knn_sql(_duck_distance("euclidean")),
    )
)
BENCH_ONLY["knn_vaplus_euclidean"] = _VA_VARIANTS[-1][1]


def _va_fold(spark: SparkSession, sf: str) -> DataFrame:
    return _union_all(
        [
            fn(spark, sf).select(
                F.lit(tag).alias("variant"), "vec_id", DISTANCE_COL
            )
            for tag, fn, _ in _VA_VARIANTS
        ]
    )


_register(
    "knn_va_suite",
    _va_fold,
    "\nUNION ALL\n".join(
        f"SELECT '{tag}' AS variant, * FROM ({sql})"
        for tag, _, sql in _VA_VARIANTS
    ),
)


# -- index lifecycle: persisted scans, planner routing, entity DML ----------
# (round-2 verdict items 3-6: indexes built once per session, written via
# the catalog, scanned from Parquet; planner + facade exercised end-to-end)

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_scratch")
_SESSION_BUILT: set[str] = set()


def _ops(spark, tag: str):
    """AdamOps over a per-tag scratch catalog, wiped once per process."""
    from adampro_spark.ops import AdamOps
    import shutil

    base = os.path.join(_SCRATCH, tag)
    if tag not in _SESSION_BUILT:
        shutil.rmtree(base, ignore_errors=True)
        _SESSION_BUILT.add(tag)
    return AdamOps(spark, base)


def _persisted_index_query(index_type: str, distance: str, **scan_kw):
    """Build once per session via IndexOp, persist through the catalog,
    then scan the PERSISTED table (Index.scala:442-471 lifecycle).  The
    scan's plan reads Parquet — no rebuild, no training, no full-vector
    scan (and for eCP, partition pruning on the cell directories)."""

    def run(spark: SparkSession, sf: str) -> DataFrame:
        ops = _ops(spark, "idxcache")
        name = f"emb_{index_type}"
        df = _table(spark, sf, "embeddings")
        if not ops.index.exists(name):
            ops.index.create_from_df(
                name, "embeddings_ext", df, "embedding", index_type, pk="vec_id"
            )
        res = ops.query.index(name, QVEC, K, distance, df=df, **scan_kw)
        return _round4(res.select("vec_id", DISTANCE_COL))

    return run


# Round-5 window re-fold: the four persisted-index scans merge into ONE
# tagged-union driver row (the knn_seq_distances trick) — each variant
# still contributes its full rows+schema+hash to the fold — freeing three
# window slots for dedup_resolution / pipeline_profile /
# fulltext_bm25_persisted (oracle_pipeline.py).  The individual callables
# stay in BENCH_ONLY for round-over-round bench continuity.
_PERSISTED_VARIANTS: list[tuple[str, Callable[[SparkSession, str], DataFrame], str]] = [
    (
        "vaf",
        _persisted_index_query("vaf", "manhattan"),
        _knn_sql(_duck_distance("manhattan")),
    ),
    (
        "ecp",
        # partition-pruned layout: index table written partitionBy(cell);
        # exactness via the tuned candidate width (see _LOSSY_PARAMS)
        _persisted_index_query("ecp", "euclidean", **_LOSSY_PARAMS["ecp"]),
        _knn_sql(_duck_distance("euclidean")),
    ),
    (
        "ecp_bound",
        # round 13 (verdict r12 #8): exact triangle-inequality cell
        # pruning over the SAME persisted index — no width tuning, the
        # top-k equals brute force structurally, so the identical kNN
        # oracle adjudicates it
        _persisted_index_query("ecp", "euclidean", cell_bound=True),
        _knn_sql(_duck_distance("euclidean")),
    ),
    (
        "pq",
        _persisted_index_query("pq", "euclidean"),
        _knn_sql(_duck_distance("euclidean")),
    ),
    (
        "sh",
        _persisted_index_query("sh", "euclidean", **_LOSSY_PARAMS["sh"]),
        _knn_sql(_duck_distance("euclidean")),
    ),
]

for _tag, _fn, _ in _PERSISTED_VARIANTS:
    BENCH_ONLY[f"knn_{_tag}_persisted"] = _fn

# round 6: the IVF-PQ composite (coarse cells + residual PQ + per-cell
# ADC — index/ivfpq.py) rides the same persisted lifecycle; bench row
# only (the persisted driver row's hash stays untouched), recall and
# partition pruning are pytest-adjudicated in tests/test_ivfpq.py
BENCH_ONLY["knn_ivfpq_persisted"] = _persisted_index_query("ivfpq", "euclidean")


def _persisted_fold(spark: SparkSession, sf: str) -> DataFrame:
    return _union_all(
        [
            fn(spark, sf).select(
                F.lit(tag).alias("index_type"), "vec_id", DISTANCE_COL
            )
            for tag, fn, _ in _PERSISTED_VARIANTS
        ]
    )


_register(
    "knn_persisted_suite",
    _persisted_fold,
    "\nUNION ALL\n".join(
        f"SELECT '{tag}' AS index_type, * FROM ({sql})"
        for tag, _, sql in _PERSISTED_VARIANTS
    ),
)


def _planned_query(spark: SparkSession, sf: str) -> DataFrame:
    """Planner-routed kNN (hints=exact → persisted VAF → exact result;
    HintBasedScanExpression.scala:93-176 + QueryHints.scala:22-38)."""
    ops = _ops(spark, "idxcache")
    df = _table(spark, sf, "embeddings")
    if not ops.index.exists("emb_vaf"):
        ops.index.create_from_df(
            "emb_vaf", "embeddings_ext", df, "embedding", "vaf", pk="vec_id"
        )
    res, plan = ops.query.knn(
        "embeddings_ext", "embedding", QVEC, K, "manhattan",
        hints=("exact",), df=df, pk="vec_id",
    )
    assert plan.path == "emb_vaf", plan
    return _round4(res.select("vec_id", DISTANCE_COL))


_register(
    "knn_planned_default", _planned_query, _knn_sql(_duck_distance("manhattan"))
)


def _dml_query(spark: SparkSession, sf: str) -> DataFrame:
    """Entity DML end-to-end (EntityTestSuite.scala:36-517 scenarios):
    create → insert an embeddings slice → count → delete by predicate →
    vacuum → count — then the storage-handler roundtrip (verdict r6 #2,
    ``DataDefintion.scala`` transferStorageHandler): transfer the entity
    to the embedded-Derby JDBC handler, re-count THROUGH the handler
    (``n_jdbc``), transfer back to parquet and re-count (``n_back``).
    Oracle = the same arithmetic in DuckDB; n_jdbc/n_back must equal
    n_after, so a lossy transfer breaks the hash."""
    import shutil

    from adampro_spark.ops import AdamOps

    base = os.path.join(_SCRATCH, "dml")
    shutil.rmtree(base, ignore_errors=True)
    ops = AdamOps(spark, base)
    ops.entity.create("t", [("vec_id", "long"), ("label", "int")])
    ops.entity.insert("t", _table(spark, sf, "embeddings").select("vec_id", "label"))
    n_inserted = ops.entity.count("t")
    n_removed = ops.entity.delete("t", [("label", "=", [0])])
    ops.entity.vacuum("t")
    n_after = ops.entity.count("t")
    # Derby db lives OUTSIDE the rmtree'd base: the embedded engine keeps
    # a booted database keyed by path for the JVM's lifetime — deleting
    # the directory under it corrupts re-runs in the same session.  The
    # overwrite-mode table write makes re-runs self-cleaning instead.
    derby = os.path.join(_SCRATCH, "dml_derby")
    ops.entity.transfer(
        "t", "jdbc",
        url=f"jdbc:derby:{derby};create=true", dbtable="DML_T",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    # explicit raises, not asserts (stripped under -O): these are the only
    # guard that n_jdbc was really counted THROUGH the JDBC handler
    if ops.catalog.entity("t").get("storage", {}).get("handler") != "jdbc":
        raise RuntimeError("transfer to jdbc did not flip the storage flag")
    n_jdbc = ops.entity.count("t")
    ops.entity.transfer("t", "parquet")
    if ops.catalog.entity("t").get("storage"):
        raise RuntimeError("transfer back to parquet left the storage flag set")
    n_back = ops.entity.count("t")
    return spark.createDataFrame(
        [(n_inserted, n_removed, n_after, n_jdbc, n_back)],
        "n_inserted long, n_removed long, n_after long, n_jdbc long, n_back long",
    )


_register(
    "entity_dml_roundtrip",
    _dml_query,
    """
    SELECT count(*)::BIGINT AS n_inserted,
           sum(CASE WHEN label = 0 THEN 1 ELSE 0 END)::BIGINT AS n_removed,
           sum(CASE WHEN label = 0 THEN 0 ELSE 1 END)::BIGINT AS n_after,
           sum(CASE WHEN label = 0 THEN 0 ELSE 1 END)::BIGINT AS n_jdbc,
           sum(CASE WHEN label = 0 THEN 0 ELSE 1 END)::BIGINT AS n_back
    FROM embeddings
    """,
)


# -- full-text scan, typed columns (sparse / WKT), multimodal, misc ---------


def _fulltext_query(spark: SparkSession, sf: str) -> DataFrame:
    from adampro_spark.operators.fulltext import SCORE_COL, text_search

    res = text_search(
        _table(spark, sf, "documents"), "text", ["spark", "query", "join"],
        pk="doc_id",
    )
    return res.select("doc_id", SCORE_COL)


_FULLTEXT_SQL = """
    SELECT doc_id, score AS ap_score FROM (
      SELECT doc_id,
        len(list_filter(
          list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'), t -> length(t) > 0),
          t -> list_contains(['spark', 'query', 'join'], t)))::DOUBLE AS score
      FROM documents
    ) WHERE score > 0
    """


def _fulltext_indexed_query(spark: SparkSession, sf: str) -> DataFrame:
    """Inverted-index full-text path (operators/fulltext.py posting table
    through the shared index lifecycle): build once per session, query via
    the posting filter — same oracle as the scan path, proving the two
    access paths agree."""
    ops = _ops(spark, "ftcat")
    if not ops.index.exists("docs_ft"):
        ops.index.create_from_df(
            "docs_ft", "documents_ext", _table(spark, sf, "documents"),
            "text", "fulltext", pk="doc_id",
        )
    res = ops.query.fulltext("docs_ft", ["spark", "query", "join"])
    from adampro_spark.operators.fulltext import SCORE_COL

    return res.select("doc_id", SCORE_COL)


# Round-5 fold: the scan path and the posting-table path produce
# IDENTICAL results by contract, so both ride one tagged-union driver row
# (each path's full result still contributes to the value hash — a
# divergence in either flips the row red); the freed slot goes to
# temporal_asof below.  Individual callables stay benchable.
BENCH_ONLY["fulltext_search"] = _fulltext_query
BENCH_ONLY["fulltext_persisted"] = _fulltext_indexed_query


def _fulltext_paths(spark: SparkSession, sf: str) -> DataFrame:
    return _union_all(
        [
            _fulltext_query(spark, sf).select(
                F.lit("scan").alias("path"), "doc_id", "ap_score"
            ),
            _fulltext_indexed_query(spark, sf).select(
                F.lit("persisted").alias("path"), "doc_id", "ap_score"
            ),
        ]
    )


_register(
    "fulltext_paths",
    _fulltext_paths,
    "\nUNION ALL\n".join(
        f"SELECT '{tag}' AS path, * FROM ({_FULLTEXT_SQL})"
        for tag in ("scan", "persisted")
    ),
)


def _temporal_asof(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join driver row (pipeline/temporal.py): every 'view' event
    joined to the same user's most recent prior-or-simultaneous 'click';
    oracle = DuckDB's NATIVE ASOF LEFT JOIN on the same rows — the
    strongest kind of oracle for an operator Spark itself lacks."""
    from adampro_spark.pipeline.temporal import asof_join
    from adampro_spark.session import load_tables

    ev = load_tables(spark, sf)["events"].select(
        "event_id", "user_id", "event_type", "value",
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
    )
    left = ev.filter(F.col("event_type") == "view")
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    res = asof_join(left, right, time_col="ts", by="user_id",
                    right_cols=["click_value"])
    return res.select(
        "event_id",
        F.round("ts_right", 6).alias("ts_right"),
        F.round("click_value", 4).alias("click_value"),
    )


# registered below as part of the round-8 temporal_suite fold
BENCH_ONLY["temporal_asof"] = _temporal_asof


def _temporal_asof_stream(spark: SparkSession, sf: str) -> DataFrame:
    """Round 11: the STREAM-STATIC as-of formulation
    (streaming/ingest.stream_asof — sorted per-key reference arrays +
    stateless element_at lookup, the shape that runs on a live stream)
    evaluated in batch mode against the SAME DuckDB ASOF oracle as the
    window formulation: two independent implementations of the as-of
    contract, both inside the hash."""
    from adampro_spark.session import load_tables
    from adampro_spark.streaming.ingest import stream_asof

    ev = load_tables(spark, sf)["events"].select(
        "event_id", "user_id", "event_type", "value",
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
    )
    left = ev.filter(F.col("event_type") == "view")
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    res = stream_asof(left, right, time_col="ts", by="user_id",
                      right_cols=["click_value"])
    return res.select(
        "event_id",
        F.round("ts_right", 6).alias("ts_right"),
        F.round("click_value", 4).alias("click_value"),
    )


BENCH_ONLY["temporal_asof_stream"] = _temporal_asof_stream
_TEMPORAL_ASOF_SQL = """
    WITH ev AS (
      SELECT event_id, user_id, event_type, value, epoch(ts) AS ts FROM events
    )
    SELECT l.event_id,
           round(r.ts, 6) AS ts_right,
           round(r.value, 4) AS click_value
    FROM (SELECT * FROM ev WHERE event_type = 'view') l
    ASOF LEFT JOIN (SELECT * FROM ev WHERE event_type = 'click') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """


def _temporal_range(spark: SparkSession, sf: str) -> DataFrame:
    """Range-join driver row (pipeline/temporal.py): every event LEFT-
    joined to the per-user 2h window opening at that user's first event;
    ``value`` is NULLed for event_id % 7 == 0 rows so the oracle also
    proves the round-5 NULL-payload bug stays fixed (a matched NULL-
    payload event must appear exactly once).  Oracle = DuckDB's plain
    range-predicate LEFT JOIN."""
    from adampro_spark.pipeline.temporal import range_join
    from adampro_spark.session import load_tables

    ev = load_tables(spark, sf)["events"].select(
        "event_id", "user_id",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("value")
        ).alias("value"),
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
    )
    iv = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("w_start"))
        .withColumn("w_end", F.col("w_start") + 7200.0)
        .withColumn("win_id", F.col("user_id") * 1000)
    )
    res = range_join(
        ev, iv, time_col="ts", start_col="w_start", end_col="w_end",
        by="user_id", bucket_width=3600.0, how="left",
    )
    return res.select(
        "event_id",
        F.round("value", 4).alias("value"),
        "win_id",
        F.round("w_start", 6).alias("w_start"),
    )


BENCH_ONLY["temporal_range"] = _temporal_range
_TEMPORAL_RANGE_SQL = """
    WITH ev AS (
      SELECT event_id, user_id,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value,
             epoch(ts) AS ts
      FROM events
    ), iv AS (
      SELECT user_id, min(ts) AS w_start, min(ts) + 7200.0 AS w_end,
             (user_id * 1000)::BIGINT AS win_id
      FROM ev GROUP BY user_id
    )
    SELECT e.event_id, round(e.value, 4) AS value, i.win_id,
           round(i.w_start, 6) AS w_start
    FROM ev e LEFT JOIN iv i
      ON e.user_id = i.user_id AND e.ts >= i.w_start AND e.ts <= i.w_end
    """


def _temporal_asof_unkeyed(spark: SparkSession, sf: str) -> DataFrame:
    """UNKEYED as-of join driver row — exercises the round-6 parallel
    prefix-carry path (temporal.py `_unkeyed_carry`: range-partition on
    time, per-partition window, broadcast boundary carry — NO single-
    partition stage).  Oracle = DuckDB's native ASOF LEFT JOIN with no
    equality key.  Timestamps are disambiguated with +event_id·1e-6 (pure
    IEEE double adds, identical in both engines) so the most-recent-row
    winner is unique and the hash deterministic."""
    from adampro_spark.pipeline.temporal import asof_join
    from adampro_spark.session import load_tables

    ev = load_tables(spark, sf)["events"].select(
        "event_id", "event_type", "value",
        (
            F.col("ts").cast("timestamp").cast("double")
            + F.col("event_id").cast("double") / F.lit(1e6)
        ).alias("ts"),
    )
    left = ev.filter(F.col("event_type") == "view")
    right = ev.filter(F.col("event_type") == "click").select(
        "ts", F.col("value").alias("click_value")
    )
    res = asof_join(left, right, time_col="ts", right_cols=["click_value"])
    return res.select(
        "event_id",
        F.round("ts_right", 6).alias("ts_right"),
        F.round("click_value", 4).alias("click_value"),
    )


BENCH_ONLY["temporal_asof_unkeyed"] = _temporal_asof_unkeyed
_TEMPORAL_UNKEYED_SQL = """
    WITH ev AS (
      SELECT event_id, event_type, value,
             epoch(ts) + event_id / 1e6 AS ts
      FROM events
    )
    SELECT l.event_id,
           round(r.ts, 6) AS ts_right,
           round(r.value, 4) AS click_value
    FROM (SELECT * FROM ev WHERE event_type = 'view') l
    ASOF LEFT JOIN (SELECT * FROM ev WHERE event_type = 'click') r
      ON l.ts >= r.ts
    """


def _temporal_asof_skew(spark: SparkSession, sf: str) -> DataFrame:
    """HOT-KEY as-of join driver row (verdict r10 #4): user_ids not
    divisible by 3 collapse onto one planted hot key (-1, ~2/3 of all
    rows), and ``skew_threshold=200`` forces that key through the
    time-bucketed parallel carry (temporal.py ``_unkeyed_carry(by=)``:
    global-quantile buckets, per-key boundary prefix/suffix carry) while
    the cold keys stay on the plain window — BOTH legs of the round-11
    default count-then-route are inside the hash.  The explicit threshold
    pins the route deterministically at every sf; it selects exactly the
    keys ``skew_threshold="auto"`` would select on a genuinely hot corpus
    (the derivation itself is pytest-pinned in tests/test_skew.py).
    ``tolerance`` rides through the carry too.  Oracle = DuckDB's native
    ASOF LEFT JOIN with the tolerance voided post-join.  Timestamps are
    disambiguated with +event_id·1e-6 so the winner is unique."""
    from adampro_spark.pipeline.temporal import asof_join
    from adampro_spark.session import load_tables

    ev = load_tables(spark, sf)["events"].select(
        "event_id", "event_type", "value",
        F.when(F.col("user_id") % 3 != 0, F.lit(-1))
        .otherwise(F.col("user_id"))
        .cast("long")
        .alias("k"),
        (
            F.col("ts").cast("timestamp").cast("double")
            + F.col("event_id").cast("double") / F.lit(1e6)
        ).alias("ts"),
    )
    left = ev.filter(F.col("event_type") == "view")
    right = ev.filter(F.col("event_type") == "click").select(
        "k", "ts", F.col("value").alias("click_value")
    )
    res = asof_join(
        left, right, time_col="ts", by="k", right_cols=["click_value"],
        tolerance=86400.0, skew_threshold=200,
    )
    return res.select(
        "event_id", "k",
        F.round("ts_right", 6).alias("ts_right"),
        F.round("click_value", 4).alias("click_value"),
    )


BENCH_ONLY["temporal_asof_skew"] = _temporal_asof_skew
_TEMPORAL_SKEW_SQL = """
    WITH ev AS (
      SELECT event_id, event_type, value,
             CASE WHEN user_id % 3 <> 0 THEN -1 ELSE user_id END::BIGINT AS k,
             epoch(ts) + event_id / 1e6 AS ts
      FROM events
    ), m AS (
      SELECT l.event_id, l.k, r.ts AS rts, r.value AS rv, l.ts AS lts
      FROM (SELECT * FROM ev WHERE event_type = 'view') l
      ASOF LEFT JOIN (SELECT * FROM ev WHERE event_type = 'click') r
        ON l.k = r.k AND l.ts >= r.ts
    )
    SELECT event_id, k,
           CASE WHEN lts - rts <= 86400.0 THEN round(rts, 6) END AS ts_right,
           CASE WHEN lts - rts <= 86400.0 THEN round(rv, 4) END AS click_value
    FROM m
    """


# Round-8 window re-fold (round-7 verdict #1): the three temporal-join
# rows (keyed as-of, bucketed range, unkeyed as-of) merge into ONE
# tagged-union driver row over a shared (mode, event_id, k, a, b)
# schema — asof/unkeyed carry (ts_right, click_value), range carries
# (win_id, w_start, value); every column of every variant still rides
# the value hash.  Individual callables stay in BENCH_ONLY.  Round 11
# adds a fourth part: the planted-hot-key SKEW route (verdict r10 #4).


def _temporal_suite(spark: SparkSession, sf: str) -> DataFrame:
    a = _temporal_asof(spark, sf).select(
        F.lit("asof").alias("mode"),
        "event_id",
        F.lit(None).cast("long").alias("k"),
        F.col("ts_right").alias("a"),
        F.col("click_value").alias("b"),
    )
    r = _temporal_range(spark, sf).select(
        F.lit("range").alias("mode"),
        "event_id",
        F.col("win_id").cast("long").alias("k"),
        F.col("w_start").alias("a"),
        F.col("value").alias("b"),
    )
    u = _temporal_asof_unkeyed(spark, sf).select(
        F.lit("unkeyed").alias("mode"),
        "event_id",
        F.lit(None).cast("long").alias("k"),
        F.col("ts_right").alias("a"),
        F.col("click_value").alias("b"),
    )
    s = _temporal_asof_skew(spark, sf).select(
        F.lit("skew").alias("mode"),
        "event_id",
        F.col("k"),
        F.col("ts_right").alias("a"),
        F.col("click_value").alias("b"),
    )
    st = _temporal_asof_stream(spark, sf).select(
        F.lit("sasof").alias("mode"),
        "event_id",
        F.lit(None).cast("long").alias("k"),
        F.col("ts_right").alias("a"),
        F.col("click_value").alias("b"),
    )
    return _union_all([a, r, u, s, st])


_register(
    "temporal_suite",
    _temporal_suite,
    f"""
    SELECT 'asof' AS mode, event_id, NULL::BIGINT AS k,
           ts_right AS a, click_value AS b
    FROM ({_TEMPORAL_ASOF_SQL})
    UNION ALL
    SELECT 'range', event_id, win_id::BIGINT, w_start, value
    FROM ({_TEMPORAL_RANGE_SQL})
    UNION ALL
    SELECT 'unkeyed', event_id, NULL::BIGINT, ts_right, click_value
    FROM ({_TEMPORAL_UNKEYED_SQL})
    UNION ALL
    SELECT 'skew', event_id, k, ts_right, click_value
    FROM ({_TEMPORAL_SKEW_SQL})
    UNION ALL
    SELECT 'sasof', event_id, NULL::BIGINT, ts_right, click_value
    FROM ({_TEMPORAL_ASOF_SQL})
    """,
)


def _proto_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Protobuf wire-format round-trip (proto_io.py; exportData/importData,
    ProtoImporterExporter.scala:41-49,203-224): an embeddings slice is
    written to the delimited .catalog/.bin exchange format, imported into
    a FRESH catalog through the normal insert path, and the flagship kNN
    over the imported entity must hash-equal brute force over the source
    parquet — any bit lost in encode/decode flips the row red."""
    import shutil

    from adampro_spark.ops import AdamOps
    from adampro_spark.proto_io import export_entity_proto, import_proto

    base = os.path.join(_SCRATCH, "protoio")
    shutil.rmtree(base, ignore_errors=True)
    ops = AdamOps(spark, os.path.join(base, "src"))
    src = (
        _table(spark, sf, "embeddings")
        .filter(F.col("vec_id") < 1000)
        .select("vec_id", "label", "embedding")
    )
    ops.entity.create(
        "pr_emb", [("vec_id", "long"), ("label", "int"), ("embedding", "vector")]
    )
    ops.entity.insert("pr_emb", src)
    wire = os.path.join(base, "wire")
    export_entity_proto(ops.entity.get("pr_emb"), wire)

    ops2 = AdamOps(spark, os.path.join(base, "dst"))
    import_proto(spark, ops2.catalog, wire)
    res = ops2.query.sequential(
        "pr_emb", "embedding", QVEC, K, "euclidean", pk="vec_id"
    )
    return _round4(res.select("vec_id", DISTANCE_COL))


_register(
    "proto_roundtrip",
    _proto_roundtrip,
    _knn_sql(_duck_distance("euclidean"), where="vec_id < 1000"),
)


def _execution_modes(spark: SparkSession, sf: str) -> DataFrame:
    """Parallel / timed / progressive execution (execution.py;
    ParallelQueryHandler.scala:37-86, TimedScanExpression.scala:19-67):
    each mode runs the same manhattan kNN concurrently over the
    sequential + conforming-index paths; every mode's result must
    hash-equal the brute-force oracle, and the progressive observer must
    fire once per path."""
    from adampro_spark.execution import knn_paths, parallel_query, timed_knn

    ops = _ops(spark, "idxcache")
    df = _table(spark, sf, "embeddings")
    if not ops.index.exists("emb_vaf"):
        ops.index.create_from_df(
            "emb_vaf", "embeddings_ext", df, "embedding", "vaf", pk="vec_id"
        )
    paths = knn_paths(
        ops, "embeddings_ext", "embedding", QVEC, K, "manhattan",
        df=df, pk="vec_id",
    )
    # collect only (pk, distance), rounded — the comparable surface
    wrapped = {
        name: (conf, (lambda f=fn: _round4(f().select("vec_id", DISTANCE_COL))))
        for name, (conf, fn) in paths.items()
    }

    fired: list[str] = []
    obs = parallel_query(spark, wrapped, on_next=lambda o: fired.append(o.path))
    by_path = {o.path: o for o in obs}
    assert sorted(fired) == sorted(wrapped), (fired, list(wrapped))
    assert by_path["sequential"].error is None, by_path["sequential"].error
    seq_rows = by_path["sequential"].rows

    best, _all = timed_knn(
        spark, {"sequential": wrapped["sequential"]}, timeout_sec=300.0
    )
    assert best is not None and best.error is None

    def to_rows(mode: str, rows) -> list[tuple]:
        return [(mode, r["vec_id"], r[DISTANCE_COL]) for r in rows]

    data = (
        to_rows("parallel", seq_rows)
        + to_rows("progressive", seq_rows)
        + to_rows("timed", best.rows)
    )
    return spark.createDataFrame(
        data, "mode string, vec_id long, ap_distance double"
    )


_register(
    "execution_modes",
    _execution_modes,
    "\nUNION ALL\n".join(
        f"SELECT '{mode}' AS mode, * FROM ({_knn_sql(_duck_distance('manhattan'))})"
        for mode in ("parallel", "progressive", "timed")
    ),
)


def _repartition_invariance(spark: SparkSession, sf: str) -> DataFrame:
    """Entity + index repartition (operators/misc.py;
    EntityPartitioner.scala:18-75): rewrite the stored entity on a new
    hash layout (7 partitions on pk) and the persisted VAF index on
    another (5), then re-run both the sequential and the index kNN — the
    results must be layout-invariant, hash-equal to brute force."""
    import shutil

    from adampro_spark.operators.misc import repartition_entity, repartition_index
    from adampro_spark.ops import AdamOps

    base = os.path.join(_SCRATCH, "repart")
    shutil.rmtree(base, ignore_errors=True)
    ops = AdamOps(spark, base)
    ops.entity.create("re", [("vec_id", "long"), ("embedding", "vector")])
    ops.entity.insert(
        "re", _table(spark, sf, "embeddings").select("vec_id", "embedding")
    )
    ops.index.create("re_vaf", "re", "embedding", "vaf", pk="vec_id")

    repartition_entity(ops.entity.get("re"), 7, ["vec_id"])
    repartition_index(spark, ops.catalog, "re_vaf", 5)

    ent_df = ops.entity.get("re").df()
    seq = ops.query.sequential(
        "re", "embedding", QVEC, K, "euclidean", df=ent_df, pk="vec_id"
    )
    idx = ops.query.index("re_vaf", QVEC, K, "euclidean", df=ent_df)
    return _union_all(
        [
            _round4(seq.select("vec_id", DISTANCE_COL)).select(
                F.lit("sequential").alias("path"), "vec_id", DISTANCE_COL
            ),
            _round4(idx.select("vec_id", DISTANCE_COL)).select(
                F.lit("vaf").alias("path"), "vec_id", DISTANCE_COL
            ),
        ]
    )


_register(
    "repartition_invariance",
    _repartition_invariance,
    "\nUNION ALL\n".join(
        f"SELECT '{tag}' AS path, * FROM ({_knn_sql(_duck_distance('euclidean'))})"
        for tag in ("sequential", "vaf")
    ),
)


def _sparse_knn(spark: SparkSession, sf: str) -> DataFrame:
    """kNN over SPARSEVECTORTYPE: rows sparsified (|x| > 0.1) into the
    reference struct shape (SparseVectorWrapper.scala:24-28), distance via
    the O(nnz) sparse kernel — no densify."""
    from adampro_spark.functions.typed import sparse_euclidean

    v = F.col("embedding").cast("array<double>")
    idxs = F.filter(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda i: F.abs(F.element_at(v, i + 1)) > 0.1,
    )
    sv = F.struct(
        F.transform(idxs, lambda i: i.cast("int")).alias("index"),
        F.transform(idxs, lambda i: F.element_at(v, i + 1).cast("float")).alias("data"),
        F.lit(DIM).cast("int").alias("length"),
    )
    q_idx = [i for i, x in enumerate(QVEC) if abs(x) > 0.1]
    qsv = F.struct(
        F.lit(q_idx).cast("array<int>").alias("index"),
        F.lit([float(QVEC[i]) for i in q_idx]).cast("array<float>").alias("data"),
        F.lit(DIM).cast("int").alias("length"),
    )
    df = _table(spark, sf, "embeddings").withColumn("_sv", sv)
    res = (
        df.withColumn(DISTANCE_COL, sparse_euclidean(F.col("_sv"), qsv))
        .orderBy(F.col(DISTANCE_COL).asc(), F.col("vec_id").asc())
        .limit(K)
    )
    return _round4(res.select("vec_id", DISTANCE_COL))


_QM_SQL = (
    "["
    + ",".join(repr(float(x)) if abs(x) > 0.1 else "0.0" for x in QVEC)
    + "]::DOUBLE[]"
)

# Round-6 fold: the two sparse-vector paths (ad-hoc sparse kernel +
# sparsified entity storage) ride ONE tagged-union driver row.
_SPARSE_SQL = (
    _knn_sql(
        # same polarization identity (‖a‖²+‖q‖²−2a·q) as the sparse kernel,
        # over the mask-equivalent dense form
        "sqrt(greatest("
        + _fold(
            "list_transform(embedding, (x,i) -> CASE WHEN abs(x::DOUBLE) > 0.1 "
            "THEN x::DOUBLE * x::DOUBLE ELSE 0.0 END)"
        )
        + " + "
        + _fold(f"list_transform({_QM_SQL}, (x,i) -> x * x)")
        + " - 2.0 * "
        + _fold(
            f"list_transform(embedding, (x,i) -> CASE WHEN abs(x::DOUBLE) > 0.1 "
            f"THEN x::DOUBLE * ({_QM_SQL})[i] ELSE 0.0 END)"
        )
        + ", 0.0))"
    )
)
BENCH_ONLY["knn_sparse_euclidean"] = _sparse_knn


def _sparsified_knn(spark: SparkSession, sf: str) -> DataFrame:
    """sparsify entity op end-to-end (DataDefintion sparsify +
    SparseVectorWrapper.scala:24-28): entity stored SPARSE (|x| > 0.1
    kept), scan densifies transparently, kNN over the densified column —
    oracle = brute force over the equivalent masked dense vectors."""
    ops = _ops(spark, "sparsecat")
    if not ops.entity.exists("emb_sp"):
        ops.entity.create("emb_sp", [("vec_id", "long"), ("embedding", "vector")])
        ops.entity.insert(
            "emb_sp", _table(spark, sf, "embeddings").select("vec_id", "embedding")
        )
        ops.entity.sparsify("emb_sp", "embedding", threshold=0.1)
        # storage really is the sparse struct now
        stored = spark.read.parquet(ops.catalog.entity_path("emb_sp"))
        assert dict(stored.dtypes)["embedding"].startswith("struct<"), stored.dtypes
    res = ops.query.sequential(
        "emb_sp", "embedding", QVEC, K, "euclidean", pk="vec_id"
    )
    return _round4(res.select("vec_id", DISTANCE_COL))


_SPARSIFIED_SQL = _knn_sql(
    "sqrt("
    + _fold(
        f"list_transform(embedding, (x,i) -> "
        f"(CASE WHEN abs(x::DOUBLE) > 0.1 THEN x::DOUBLE ELSE 0.0 END - ({QS})[i]) * "
        f"(CASE WHEN abs(x::DOUBLE) > 0.1 THEN x::DOUBLE ELSE 0.0 END - ({QS})[i]))"
    )
    + ")"
)
BENCH_ONLY["knn_sparsified_euclidean"] = _sparsified_knn

_SPARSE_VARIANTS: list[tuple[str, Callable[[SparkSession, str], DataFrame], str]] = [
    ("sparse", _sparse_knn, _SPARSE_SQL),
    ("sparsified", _sparsified_knn, _SPARSIFIED_SQL),
]


def _sparse_fold(spark: SparkSession, sf: str) -> DataFrame:
    return _union_all(
        [
            fn(spark, sf).select(
                F.lit(tag).alias("variant"), "vec_id", DISTANCE_COL
            )
            for tag, fn, _ in _SPARSE_VARIANTS
        ]
    )


_register(
    "knn_sparse_suite",
    _sparse_fold,
    "\nUNION ALL\n".join(
        f"SELECT '{tag}' AS variant, * FROM ({sql})"
        for tag, _, sql in _SPARSE_VARIANTS
    ),
)


def _geo_query(spark: SparkSession, sf: str) -> DataFrame:
    """GEOMETRYTYPE consumption: derive WKT POINTs from the first two
    embedding dims (rounded so the string round-trip is exact), parse with
    st_x/st_y, rank by planar distance to a query point."""
    from adampro_spark.functions.typed import st_distance, st_point

    df = _table(spark, sf, "embeddings").withColumn(
        "geom",
        st_point(
            F.round(F.element_at(F.col("embedding").cast("array<double>"), 1), 4),
            F.round(F.element_at(F.col("embedding").cast("array<double>"), 2), 4),
        ),
    )
    qwkt = F.lit(f"POINT ({QVEC[0]} {QVEC[1]})")
    res = (
        df.withColumn(DISTANCE_COL, st_distance(F.col("geom"), qwkt))
        .orderBy(F.col(DISTANCE_COL).asc(), F.col("vec_id").asc())
        .limit(K)
    )
    return _round4(res.select("vec_id", "geom", DISTANCE_COL))


_register(
    "geo_point_distance",
    _geo_query,
    f"""
    SELECT vec_id, geom, round(d, 4) AS {DISTANCE_COL} FROM (
      SELECT vec_id,
        'POINT (' || round(embedding[1]::DOUBLE, 4) || ' ' || round(embedding[2]::DOUBLE, 4) || ')' AS geom,
        sqrt(pow(round(embedding[1]::DOUBLE, 4) - {QVEC[0]!r}, 2)
           + pow(round(embedding[2]::DOUBLE, 4) - {QVEC[1]!r}, 2)) AS d
      FROM embeddings
      ORDER BY d ASC, vec_id ASC LIMIT {K}
    ) ORDER BY d
    """,
)


#: Round-13 color-JPEG adjudication palette (verdict r12 #1b): 64 RGB
#: tuples where every rounding step of the flat-color round trip
#: (forward BT.601 → DC quantization → plane round → inverse BT.601)
#: lands ≥ 1e-6 away from an exact .5 — chosen by search so the
#: prediction is rounding-MODE-independent (numpy banker's vs DuckDB
#: half-away agree) and immune to the IDCT's ~1e-13 float noise, then
#: each verified against the real codec across dims/subsample/restart
#: combos.  The palette is the shared INPUT spec (like the flat-gray
#: ``doc_id % 256``); the oracle still derives the decoded values
#: through its own SQL arithmetic.
_JPEG_PALETTE: list = [
    (203, 136, 252), (186, 9, 191), (151, 120, 176), (118, 156, 157),
    (152, 251, 156), (6, 161, 20), (165, 115, 53), (0, 247, 130),
    (221, 26, 172), (200, 239, 238), (72, 43, 176), (218, 104, 139),
    (115, 82, 176), (210, 114, 114), (24, 161, 251), (227, 16, 218),
    (124, 51, 8), (87, 156, 147), (217, 100, 9), (104, 255, 60),
    (40, 50, 24), (171, 77, 91), (103, 149, 196), (224, 255, 99),
    (84, 197, 194), (87, 47, 109), (152, 227, 152), (140, 1, 64),
    (179, 142, 169), (189, 132, 173), (16, 73, 203), (223, 238, 181),
    (170, 207, 226), (152, 212, 31), (230, 132, 197), (168, 51, 214),
    (193, 196, 203), (252, 128, 10), (75, 23, 21), (227, 143, 37),
    (169, 47, 202), (212, 148, 164), (132, 131, 187), (30, 122, 3),
    (138, 110, 247), (223, 204, 129), (24, 39, 38), (181, 5, 28),
    (181, 133, 121), (232, 146, 255), (106, 4, 58), (219, 172, 7),
    (194, 65, 189), (237, 186, 163), (43, 165, 145), (40, 57, 184),
    (118, 77, 162), (74, 255, 40), (216, 127, 165), (135, 29, 30),
    (199, 64, 35), (2, 133, 36), (245, 247, 66), (236, 69, 87),
]


def _multimodal_fp(spark: SparkSession, sf: str) -> DataFrame:
    """Media fingerprinting over a derived binary column (documents.text
    utf-8 encoded — the corpus is ASCII so byte and char counts agree
    with the SQL mirror).

    Round 12 second part (verdict r11 #6): the pure-numpy baseline JPEG
    codec, driver-adjudicated through an EXACTLY-predictable shape —
    per doc, a flat gray image (value doc_id%256, varied non-8-multiple
    dims, varied restart intervals) encodes to a real baseline JPEG and
    decodes back through the sniffing ``decode_media`` hook inside the
    standard mapInPandas media kernel.  A flat block survives quant=1
    EXACTLY (only the DC coefficient is non-zero and it is integral, so
    quantization never rounds), so DuckDB independently predicts every
    decoded pixel: the hash carries the pixel count, the pixel SUM, and
    the packed decoded dims — Huffman/bit-reader/DC-predictor/restart/
    MCU-crop bugs all shift at least one of them.  (Non-flat content is
    pytest-pinned by round-trip tolerance; lossy values are not
    SQL-predictable.)
    """
    from adampro_spark.pipeline.multimodal import media_fingerprint

    media = _table(spark, sf, "documents").select(
        F.col("doc_id").alias("media_id"), F.encode("text", "utf-8").alias("content")
    )
    fp = media_fingerprint(media).select(
        F.lit("fp").alias("part"),
        "media_id",
        F.col("n_bytes").cast("long").alias("n1"),
        F.lit(None).cast("long").alias("n2"),
        F.lit(None).cast("long").alias("n3"),
        F.col("fp_hex").alias("s"),
    )

    def _jpeg_kernel(batches):
        import numpy as np
        import pandas as pd

        from adampro_spark.pipeline.multimodal import decode_media, encode_jpeg

        for pdf in batches:
            ids, n1, n2, n3 = [], [], [], []
            for did in pdf["media_id"]:
                did = int(did)
                v = did % 256
                h = 8 + (did % 3) * 4   # 8 / 12 / 16 — MCU-grid overhang
                w = 8 + (did % 5) * 2   # 8 / 10 / 12 / 14 / 16
                blob = encode_jpeg(
                    np.full((h, w), v, dtype=np.uint8),
                    quant=1,
                    restart_interval=did % 4,  # 0 = no DRI
                )
                dec = decode_media(blob, w, h)
                ids.append(did)
                n1.append(int(dec.size))
                n2.append(int(dec.astype(np.int64).sum()))
                n3.append(dec.shape[1] * 1000 + dec.shape[0])
            yield pd.DataFrame(
                {"media_id": ids, "n1": n1, "n2": n2, "n3": n3}
            )

    jp = media.select("media_id").mapInPandas(
        _jpeg_kernel, schema="media_id long, n1 long, n2 long, n3 long"
    ).select(
        F.lit("jpeg").alias("part"),
        "media_id", "n1", "n2", "n3",
        F.lit(None).cast("string").alias("s"),
    )

    def _jpeg_rgb_kernel(batches):
        import numpy as np
        import pandas as pd

        from adampro_spark.pipeline.multimodal import decode_jpeg, encode_jpeg

        for pdf in batches:
            ids, n1, n2, n3 = [], [], [], []
            for did in pdf["media_id"]:
                did = int(did)
                r, g, b = _JPEG_PALETTE[did % 64]
                h = 8 + (did % 3) * 4
                w = 8 + (did % 5) * 2
                img = np.zeros((h, w, 3), dtype=np.uint8)
                img[..., 0], img[..., 1], img[..., 2] = r, g, b
                blob = encode_jpeg(
                    img, quant=1,
                    subsample=(did % 2 == 0),  # both 4:4:4 and 4:2:0
                    restart_interval=did % 4,
                )
                dec = decode_jpeg(blob, rgb=True)
                ids.append(did)
                sums = dec.astype(np.int64).sum(axis=(0, 1))
                n1.append(int(sums[0]))
                n2.append(int(sums[1]))
                n3.append(int(sums[2]))
            yield pd.DataFrame(
                {"media_id": ids, "n1": n1, "n2": n2, "n3": n3}
            )

    jrgb = media.select("media_id").mapInPandas(
        _jpeg_rgb_kernel, schema="media_id long, n1 long, n2 long, n3 long"
    ).select(
        F.lit("jpeg_rgb").alias("part"),
        "media_id", "n1", "n2", "n3",
        F.lit(None).cast("string").alias("s"),
    )

    # round-14 progressive leg (verdict r13 #2): the same flat-gray
    # exactly-recoverable plant, but through the SOF2 writer/decoder
    # pair — varied dc_al exercises DC successive approximation +
    # refinement scans, and the all-zero AC bands decode as pure
    # cross-block EOBn runs; the 'jpeg' leg's oracle formulas apply
    # unchanged (identical coefficients at quant=1)
    def _jpeg_prog_kernel(batches):
        import numpy as np
        import pandas as pd

        from adampro_spark.pipeline.multimodal import (
            decode_media,
            encode_jpeg_progressive,
        )

        for pdf in batches:
            ids, n1, n2, n3 = [], [], [], []
            for did in pdf["media_id"]:
                did = int(did)
                v = did % 256
                h = 8 + (did % 3) * 4
                w = 8 + (did % 5) * 2
                blob = encode_jpeg_progressive(
                    np.full((h, w), v, dtype=np.uint8),
                    quant=1,
                    dc_al=did % 3,
                    ac_split=5 + (did % 2) * 58,  # two bands / single band
                )
                dec = decode_media(blob, w, h)
                ids.append(did)
                n1.append(int(dec.size))
                n2.append(int(dec.astype(np.int64).sum()))
                n3.append(dec.shape[1] * 1000 + dec.shape[0])
            yield pd.DataFrame(
                {"media_id": ids, "n1": n1, "n2": n2, "n3": n3}
            )

    jprog = media.select("media_id").mapInPandas(
        _jpeg_prog_kernel, schema="media_id long, n1 long, n2 long, n3 long"
    ).select(
        F.lit("jpeg_prog").alias("part"),
        "media_id", "n1", "n2", "n3",
        F.lit(None).cast("string").alias("s"),
    )

    # round-13 dhash part: a planted-gradient grayscale image per doc
    # (pixel = (doc_id + 3x + 7y) % 256, dims indivisible by the 9x8
    # grid so the floor cell boundaries are exercised) rides the REAL
    # image_dhash operator (encode -> decode_media -> box means ->
    # 63-bit compare hash).  Round 14: odd docs encode as identity-
    # palette GIF instead of BMP — both are LOSSLESS, so the pixels are
    # the formula either way and ONE oracle formulation adjudicates the
    # BMP and GIF(LZW) decode paths alike
    def _bmp_kernel(batches):
        import numpy as np
        import pandas as pd

        from adampro_spark.pipeline.multimodal import encode_bmp, encode_gif

        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["media_id"]:
                did = int(did)
                h = 18 + did % 5
                w = 19 + did % 3
                ys = np.arange(h, dtype=np.int64)[:, None]
                xs = np.arange(w, dtype=np.int64)[None, :]
                img = ((did + 3 * xs + 7 * ys) % 256).astype(np.uint8)
                ids.append(did)
                blobs.append(
                    encode_bmp(img) if did % 2 == 0 else encode_gif(img)
                )
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    from adampro_spark.pipeline.multimodal import image_dhash

    bmp_media = media.select("media_id").mapInPandas(
        _bmp_kernel, schema="media_id long, content binary"
    )
    dh = image_dhash(bmp_media).select(
        F.lit("dhash").alias("part"),
        "media_id",
        F.col("dhash").alias("n1"),
        ((18 + F.col("media_id") % 5) * 1000 + (19 + F.col("media_id") % 3))
        .cast("long").alias("n2"),
        F.lit(None).cast("long").alias("n3"),
        F.lit(None).cast("string").alias("s"),
    )

    # round-15 WebP part: planted gray formula pixels ride the REAL
    # encode_webp (VP8L literal / subtract-green / one of the 14
    # predictor modes, cycling by doc_id) -> decode_webp -> image_dhash
    # path; VP8L is lossless and gray luma is exact (r=g=b -> luma=v),
    # so the oracle re-derives the 63-bit dhash from the formula alone
    def _webp_kernel(batches):
        import numpy as np
        import pandas as pd

        from adampro_spark.pipeline.multimodal import encode_webp

        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["media_id"]:
                did = int(did)
                h = 17 + did % 4
                w = 18 + did % 5
                ys = np.arange(h, dtype=np.int64)[:, None]
                xs = np.arange(w, dtype=np.int64)[None, :]
                img = ((did * 5 + 11 * xs + 3 * ys) % 256).astype(np.uint8)
                mode = did % 3
                if mode == 0:
                    blob = encode_webp(img)
                elif mode == 1:
                    blob = encode_webp(img, subtract_green=True)
                else:
                    blob = encode_webp(img, predictor_mode=(did // 3) % 14)
                ids.append(did)
                blobs.append(blob)
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    webp_media = media.select("media_id").mapInPandas(
        _webp_kernel, schema="media_id long, content binary"
    )
    wp = image_dhash(webp_media).select(
        F.lit("webp").alias("part"),
        "media_id",
        F.col("dhash").alias("n1"),
        ((17 + F.col("media_id") % 4) * 1000 + (18 + F.col("media_id") % 5))
        .cast("long").alias("n2"),
        F.lit(None).cast("long").alias("n3"),
        F.lit(None).cast("string").alias("s"),
    )

    # round-13 audio part: planted sawtooth PCM (exact int16 formula,
    # clip length indivisible by the 64 windows) rides the real
    # encode_wav -> decode_wav -> audio_envelope_bits path; the oracle
    # re-derives the 63-bit envelope hash from the sample formula
    def _wav_kernel(batches):
        import numpy as np
        import pandas as pd

        from adampro_spark.pipeline.multimodal import encode_wav

        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["media_id"]:
                did = int(did)
                n = 6400 + (did % 7) * 160
                t = np.arange(n, dtype=np.int64)
                s = ((did * 7 + 13 * t) % 2048) - 1024
                ids.append(did)
                blobs.append(encode_wav(s.astype(np.int16)))
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    from adampro_spark.pipeline.multimodal import audio_dhash

    wav_media = media.select("media_id").mapInPandas(
        _wav_kernel, schema="media_id long, content binary"
    )
    aw = audio_dhash(wav_media).select(
        F.lit("awav").alias("part"),
        "media_id",
        F.col("dhash").alias("n1"),
        (6400 + (F.col("media_id") % 7) * 160).cast("long").alias("n2"),
        F.lit(None).cast("long").alias("n3"),
        F.lit(None).cast("string").alias("s"),
    )
    # round-14 G.711 part: planted µ-law BYTES by formula ride the real
    # RIFF fmt-7 container -> decode_wav ITU expansion ->
    # audio_envelope_bits path; the oracle re-expands the same bytes
    # through the 256-entry table as a SQL literal (exact int16 values,
    # exact |sample| window sums)
    def _g711_kernel(batches):
        import numpy as np
        import pandas as pd

        from adampro_spark.pipeline.multimodal import (
            _riff_chunk,
            audio_envelope_bits,
            decode_wav,
        )

        for pdf in batches:
            ids, n1, n2 = [], [], []
            for did in pdf["media_id"]:
                did = int(did)
                nn = 6400 + (did % 7) * 160
                t = np.arange(nn, dtype=np.int64)
                bb = ((did * 7 + 13 * t) % 256).astype(np.uint8)
                fmtc = (
                    (7).to_bytes(2, "little")
                    + (1).to_bytes(2, "little")
                    + (8000).to_bytes(4, "little")
                    + (8000).to_bytes(4, "little")
                    + (1).to_bytes(2, "little")
                    + (8).to_bytes(2, "little")
                )
                body = (
                    b"WAVE"
                    + _riff_chunk(b"fmt ", fmtc)
                    + _riff_chunk(b"data", bb.tobytes())
                )
                blob = b"RIFF" + len(body).to_bytes(4, "little") + body
                samples, _rate = decode_wav(blob)
                ids.append(did)
                n1.append(int(audio_envelope_bits(samples)))
                n2.append(nn)
            yield pd.DataFrame({"media_id": ids, "n1": n1, "n2": n2})

    gw = media.select("media_id").mapInPandas(
        _g711_kernel, schema="media_id long, n1 long, n2 long"
    ).select(
        F.lit("gwav").alias("part"),
        "media_id", "n1", "n2",
        F.lit(None).cast("long").alias("n3"),
        F.lit(None).cast("string").alias("s"),
    )

    # round-15 FLAC part: a planted sawtooth (new constants, shorter
    # clip) rides the REAL encode_flac container (fixed-order-2
    # predictor + Rice residual) -> decode_flac -> audio_envelope_bits
    # via audio_dhash's container dispatch; FLAC is lossless, so the
    # oracle re-derives the envelope hash from the sample formula like
    # the awav leg
    def _flac_kernel(batches):
        import numpy as np
        import pandas as pd

        from adampro_spark.pipeline.multimodal import encode_flac

        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["media_id"]:
                did = int(did)
                n = 1920 + (did % 5) * 128
                t = np.arange(n, dtype=np.int64)
                sm = ((did * 11 + 17 * t) % 2048) - 1024
                ids.append(did)
                blobs.append(encode_flac(sm.astype(np.int16)))
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    flac_media = media.select("media_id").mapInPandas(
        _flac_kernel, schema="media_id long, content binary"
    )
    fl = audio_dhash(flac_media).select(
        F.lit("flac").alias("part"),
        "media_id",
        F.col("dhash").alias("n1"),
        (1920 + (F.col("media_id") % 5) * 128).cast("long").alias("n2"),
        F.lit(None).cast("long").alias("n3"),
        F.lit(None).cast("string").alias("s"),
    )

    # round-13 video part: a planted MJPEG-AVI per doc (flat frames,
    # exactly recoverable at quant=1) rides the real encode_avi_mjpeg ->
    # decode_avi_frames -> video_fingerprint path with every_n=2
    # container-level frame striding; the oracle predicts frame counts
    # and the SAMPLED pixel sum from the plant formulas
    def _avi_kernel(batches):
        import numpy as np
        import pandas as pd

        from adampro_spark.pipeline.multimodal import encode_avi_mjpeg

        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["media_id"]:
                did = int(did)
                h = 14 + (did % 3) * 2
                w = 16 + did % 5
                nfr = 3 + did % 4
                frames = [
                    np.full((h, w), (did + 31 * f) % 256, dtype=np.uint8)
                    for f in range(nfr)
                ]
                ids.append(did)
                blobs.append(encode_avi_mjpeg(frames))
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    from adampro_spark.pipeline.multimodal import video_fingerprint

    avi_media = media.select("media_id").mapInPandas(
        _avi_kernel, schema="media_id long, content binary"
    )
    vf = video_fingerprint(avi_media, every_n=2).select(
        F.lit("vavi").alias("part"),
        "media_id",
        F.col("px_sum").alias("n1"),
        (F.col("n_frames") * 1000 + F.col("n_sampled")).alias("n2"),
        F.lit(None).cast("long").alias("n3"),
        F.lit(None).cast("string").alias("s"),
    )
    # round-13 probe part: header-only metadata sniff over a format
    # cycle (bmp/jpeg/wav/avi/png + round 14: animated gif, planted
    # dims/lengths/frame counts) — the ffprobe-lite pass; every field
    # is pure arithmetic for the oracle
    def _probe_kernel(batches):
        import numpy as np
        import pandas as pd

        from adampro_spark.pipeline.multimodal import (
            encode_avi_mjpeg,
            encode_bmp,
            encode_gif,
            encode_jpeg,
            encode_png,
            encode_wav,
        )

        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["media_id"]:
                did = int(did)
                kind = did % 6
                h = 18 + did % 5
                w = 19 + did % 3
                img = np.full((h, w), did % 256, dtype=np.uint8)
                if kind == 0:
                    blob = encode_bmp(img)
                elif kind == 1:
                    blob = encode_jpeg(img, quant=1)
                elif kind == 2:
                    n = 6400 + (did % 7) * 160
                    blob = encode_wav(np.zeros(n, dtype=np.int16))
                elif kind == 3:
                    nfr = 3 + did % 4
                    blob = encode_avi_mjpeg([img] * nfr)
                elif kind == 4:
                    blob = encode_png(img)
                else:
                    blob = encode_gif([img] * (1 + did % 3))
                ids.append(did)
                blobs.append(blob)
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    from adampro_spark.pipeline.multimodal import probe_media

    probe_in = media.select("media_id").mapInPandas(
        _probe_kernel, schema="media_id long, content binary"
    )
    pr = probe_media(probe_in).select(
        F.lit("probe").alias("part"),
        "media_id",
        (F.col("width").cast("long") * 1000 + F.col("height")).alias("n1"),
        F.col("n_frames").alias("n2"),
        F.col("sample_rate").cast("long").alias("n3"),
        F.col("format").alias("s"),
    )
    return (
        fp.unionByName(jp).unionByName(jrgb).unionByName(jprog)
        .unionByName(dh).unionByName(wp).unionByName(aw).unionByName(gw)
        .unionByName(fl).unionByName(vf).unionByName(pr)
    )


def _curate_media_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """BENCH row for the flagship multimodal composition (round 14):
    synthesize a deterministic mixed-media corpus from ``documents``
    in one Arrow pass — per doc_id%5: a formula BMP, a retouched BMP
    near-dup of the previous doc's image, a GIF re-encode of the base
    two back (a 3-member image family per 5 docs), a per-doc sawtooth
    WAV, junk bytes — then run the full probe → exact → per-modality
    near-dup pipeline.  Synthesis rides inside the timing (the jpeg-leg
    convention): blob building is ~24×24 images, small next to the
    decode+Manku stages the row exists to measure."""
    from adampro_spark.pipeline.dedup import _spread
    from adampro_spark.pipeline.multimodal import curate_media

    # spread the SLIM id rows before the synthesis kernel: documents at
    # bench scale is a single-row-group file, so the scan hands every id
    # to one task and the whole synthesis pass (and its re-run by the
    # final survivor semi-join) serializes onto one core — repartition
    # the 8-byte ids here (not the blobs) and curate_media's own
    # _spread becomes a no-op, so blob bytes never ride an exchange
    docs = _spread(
        _table(spark, sf, "documents").select(
            F.col("doc_id").alias("media_id")
        )
    )

    def _kern(batches):
        import numpy as np
        import pandas as pd

        from adampro_spark.pipeline.multimodal import (
            encode_bmp,
            encode_gif,
            encode_wav,
        )

        tt = np.arange(6400, dtype=np.int64)

        def img_of(fam: int) -> np.ndarray:
            # SEEDED-random pixels per family: linear gradients share
            # their dHash sign structure across families (everything
            # collided into one giant near-dup family); random fields
            # sit ~32 hamming bits apart
            return np.random.RandomState(fam).randint(
                0, 256, size=(24, 24), dtype=np.int64
            ).astype(np.uint8)

        for pdf in batches:
            ids, blobs = [], []
            for did in pdf["media_id"]:
                did = int(did)
                k = did % 5
                fam = did // 5
                if k == 0:
                    blob = encode_bmp(img_of(fam))
                elif k == 1:
                    im = img_of(fam).astype(np.int16)
                    im[5:8, 5:8] += 9
                    blob = encode_bmp(np.clip(im, 0, 255).astype(np.uint8))
                elif k == 2:
                    blob = encode_gif(img_of(fam))
                elif k == 3:
                    # per-doc random ENVELOPE profile (a flat sawtooth
                    # has the same loudness envelope for every doc):
                    # seeded window gains over 100-sample steps
                    g = np.random.RandomState(100_000 + did).randint(
                        1, 6, size=64
                    )
                    s = (
                        (((did * 7 + 13 * tt) % 2048) - 1024) // 8
                        * np.repeat(g, 100)
                    ).astype(np.int16)
                    blob = encode_wav(s)
                else:
                    blob = b"junk" + did.to_bytes(8, "big")
                ids.append(did)
                blobs.append(blob)
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    media = docs.mapInPandas(_kern, schema="media_id long, content binary")
    MEDIA_CURATE_STAGES.clear()
    survivors, _report = curate_media(
        media, stage_timings=MEDIA_CURATE_STAGES
    )
    return survivors.select("media_id")


#: stage attribution for the multimodal_curate bench row (round 15,
#: verdict r14 #2: the 20 s headline row — 16% of the bench wall — had
#: no probe/exact/neardup split, unlike pipeline_curate's ``stages``
#: block).  curate_media fills probe_sec/exact_sec/neardup_sec here;
#: bench.py snapshots it for the WINNING pass, the pipeline_curate
#: convention.
MEDIA_CURATE_STAGES: dict[str, float] = {}


BENCH_ONLY["multimodal_curate"] = _curate_media_corpus


_PAL_VALUES = ", ".join(
    f"({i}, {r}.0, {g}.0, {b}.0)"
    for i, (r, g, b) in enumerate(_JPEG_PALETTE)
)


def _mu_sql_literal() -> str:
    """The 256-entry G.711 µ-law expansion table as a DuckDB list
    literal — the oracle re-expands the planted µ-law bytes through the
    SAME shared constant the engine decodes with (the STOPWORDS/
    minhash-coeffs shared-constant convention)."""
    from adampro_spark.pipeline.multimodal import _mulaw_table

    return "[" + ", ".join(str(int(v)) for v in _mulaw_table()) + "]"


_MU_SQL = _mu_sql_literal()

_register(
    "multimodal_fingerprint",
    _multimodal_fp,
    f"""
    SELECT 'fp' AS part, doc_id AS media_id,
           octet_length(encode(text))::BIGINT AS n1,
           NULL::BIGINT AS n2, NULL::BIGINT AS n3,
           substring(sha256(text), 1, 16) AS s
    FROM documents
    UNION ALL
    SELECT 'jpeg', doc_id,
           ((8 + (doc_id % 3) * 4) * (8 + (doc_id % 5) * 2))::BIGINT,
           ((doc_id % 256) * (8 + (doc_id % 3) * 4)
             * (8 + (doc_id % 5) * 2))::BIGINT,
           ((8 + (doc_id % 5) * 2) * 1000 + (8 + (doc_id % 3) * 4))::BIGINT,
           NULL::VARCHAR
    FROM documents
    UNION ALL
    -- round-14 progressive (SOF2) leg: the flat plant survives quant=1
    -- exactly regardless of scan script, so the baseline formulas apply
    -- verbatim — the Spark side runs the real progressive writer and
    -- the Annex-G multi-scan decoder
    SELECT 'jpeg_prog', doc_id,
           ((8 + (doc_id % 3) * 4) * (8 + (doc_id % 5) * 2))::BIGINT,
           ((doc_id % 256) * (8 + (doc_id % 3) * 4)
             * (8 + (doc_id % 5) * 2))::BIGINT,
           ((8 + (doc_id % 5) * 2) * 1000 + (8 + (doc_id % 3) * 4))::BIGINT,
           NULL::VARCHAR
    FROM documents
    UNION ALL
    -- round-13 color leg: a flat (r,g,b) image round-trips through
    -- encode_jpeg/decode_jpeg(rgb=True) to EXACTLY-predictable pixels
    -- (only DC coefficients survive, palette chosen so no rounding
    -- step sits on a .5); the oracle re-derives the decoded color via
    -- its own SQL arithmetic and predicts the per-channel pixel sums
    SELECT 'jpeg_rgb', doc_id,
           (hw * LEAST(255.0, GREATEST(0.0,
                round(yd + 1.402 * (crd - 128.0)))))::BIGINT,
           (hw * LEAST(255.0, GREATEST(0.0,
                round(yd - 0.344136 * (cbd - 128.0)
                         - 0.714136 * (crd - 128.0)))))::BIGINT,
           (hw * LEAST(255.0, GREATEST(0.0,
                round(yd + 1.772 * (cbd - 128.0)))))::BIGINT,
           NULL::VARCHAR
    FROM (
        SELECT doc_id,
               ((8 + (doc_id % 3) * 4) * (8 + (doc_id % 5) * 2)) AS hw,
               round(round(8 * ((0.299 * r + 0.587 * g + 0.114 * b)
                                - 128.0)) / 8.0 + 128.0) AS yd,
               round(round(8 * (-0.168736 * r - 0.331264 * g
                                + 0.5 * b)) / 8.0 + 128.0) AS cbd,
               round(round(8 * (0.5 * r - 0.418688 * g
                                - 0.081312 * b)) / 8.0 + 128.0) AS crd
        FROM documents
        JOIN (VALUES {_PAL_VALUES}) AS pal(i, r, g, b)
          ON pal.i = doc_id % 64
    )
    UNION ALL
    -- round-13 dhash leg: BMP decode is LOSSLESS and the 9x8 box means
    -- are exact integer-sum doubles, so the 63-bit difference hash is
    -- re-derivable from the planted pixel formula alone (the Spark side
    -- runs the real encode_bmp -> decode_media -> image_dhash path)
    SELECT 'dhash', doc_id,
      list_sum(list_transform(generate_series(0, 8), i ->
        list_sum(list_transform(generate_series(0, 6), j ->
          CASE WHEN m[i + 1][j + 1] > m[i + 1][j + 2]
               THEN (1::BIGINT << (i * 7 + j)) ELSE 0::BIGINT
          END))))::BIGINT,
      (hh * 1000 + ww)::BIGINT,
      NULL::BIGINT, NULL::VARCHAR
    FROM (
      SELECT doc_id, hh, ww,
        list_transform(generate_series(0, 8), i ->
          list_transform(generate_series(0, 7), j ->
            list_sum(list_transform(
              generate_series(i * hh // 9, (i + 1) * hh // 9 - 1), y ->
                list_sum(list_transform(
                  generate_series(j * ww // 8, (j + 1) * ww // 8 - 1), x ->
                    ((doc_id + 3 * x + 7 * y) % 256)::BIGINT))))::DOUBLE
            / (((i + 1) * hh // 9 - i * hh // 9)
               * ((j + 1) * ww // 8 - j * ww // 8)))) AS m
      FROM (
        SELECT doc_id, 18 + doc_id % 5 AS hh, 19 + doc_id % 3 AS ww
        FROM documents
      )
    )
    UNION ALL
    -- round-15 WebP leg: VP8L is lossless, gray luma exact, so the
    -- dhash re-derives from the planted formula (the dhash-leg
    -- machinery with the round-15 constants)
    SELECT 'webp', doc_id,
      list_sum(list_transform(generate_series(0, 8), i ->
        list_sum(list_transform(generate_series(0, 6), j ->
          CASE WHEN m[i + 1][j + 1] > m[i + 1][j + 2]
               THEN (1::BIGINT << (i * 7 + j)) ELSE 0::BIGINT
          END))))::BIGINT,
      (hh * 1000 + ww)::BIGINT,
      NULL::BIGINT, NULL::VARCHAR
    FROM (
      SELECT doc_id, hh, ww,
        list_transform(generate_series(0, 8), i ->
          list_transform(generate_series(0, 7), j ->
            list_sum(list_transform(
              generate_series(i * hh // 9, (i + 1) * hh // 9 - 1), y ->
                list_sum(list_transform(
                  generate_series(j * ww // 8, (j + 1) * ww // 8 - 1), x ->
                    ((doc_id * 5 + 11 * x + 3 * y) % 256)::BIGINT))))::DOUBLE
            / (((i + 1) * hh // 9 - i * hh // 9)
               * ((j + 1) * ww // 8 - j * ww // 8)))) AS m
      FROM (
        SELECT doc_id, 17 + doc_id % 4 AS hh, 18 + doc_id % 5 AS ww
        FROM documents
      )
    )
    UNION ALL
    -- round-13 audio leg: the 63-bit loudness-envelope hash of the
    -- planted sawtooth PCM, re-derived from the sample formula (exact
    -- integer |sample| sums -> exact double means)
    SELECT 'awav', doc_id,
      list_sum(list_transform(generate_series(0, 62), i ->
        CASE WHEN env[i + 1] > env[i + 2]
             THEN (1::BIGINT << i) ELSE 0::BIGINT
        END))::BIGINT,
      nn::BIGINT,
      NULL::BIGINT, NULL::VARCHAR
    FROM (
      SELECT doc_id, nn,
        list_transform(generate_series(0, 63), w ->
          list_sum(list_transform(
            generate_series(w * nn // 64, (w + 1) * nn // 64 - 1), t ->
              abs(((doc_id * 7 + 13 * t) % 2048) - 1024)::BIGINT))::DOUBLE
          / ((w + 1) * nn // 64 - w * nn // 64)) AS env
      FROM (
        SELECT doc_id, 6400 + (doc_id % 7) * 160 AS nn FROM documents
      )
    )
    UNION ALL
    -- round-14 G.711 leg: the planted µ-law bytes expand through the
    -- shared 256-entry table (SQL literal) to exact int16 samples, so
    -- the loudness-envelope hash re-derives like the awav leg
    SELECT 'gwav', doc_id,
      list_sum(list_transform(generate_series(0, 62), i ->
        CASE WHEN env[i + 1] > env[i + 2]
             THEN (1::BIGINT << i) ELSE 0::BIGINT
        END))::BIGINT,
      nn::BIGINT,
      NULL::BIGINT, NULL::VARCHAR
    FROM (
      SELECT doc_id, nn,
        -- mu is hoisted to a per-ROW column: a list literal inside the
        -- innermost lambda re-materialized per ELEMENT (~330M times at
        -- sf0.1 — minutes); per row it folds once
        list_transform(generate_series(0, 63), w ->
          list_sum(list_transform(
            generate_series(w * nn // 64, (w + 1) * nn // 64 - 1), t ->
              abs(list_extract(mu,
                  ((doc_id * 7 + 13 * t) % 256) + 1))::BIGINT))::DOUBLE
          / ((w + 1) * nn // 64 - w * nn // 64)) AS env
      FROM (
        SELECT doc_id, 6400 + (doc_id % 7) * 160 AS nn,
               {_MU_SQL} AS mu
        FROM documents
      )
    )
    UNION ALL
    -- round-15 FLAC leg: lossless container, so the envelope hash
    -- re-derives from the planted formula exactly like the awav leg
    SELECT 'flac', doc_id,
      list_sum(list_transform(generate_series(0, 62), i ->
        CASE WHEN env[i + 1] > env[i + 2]
             THEN (1::BIGINT << i) ELSE 0::BIGINT
        END))::BIGINT,
      nn::BIGINT,
      NULL::BIGINT, NULL::VARCHAR
    FROM (
      SELECT doc_id, nn,
        list_transform(generate_series(0, 63), w ->
          list_sum(list_transform(
            generate_series(w * nn // 64, (w + 1) * nn // 64 - 1), t ->
              abs(((doc_id * 11 + 17 * t) % 2048) - 1024)::BIGINT))::DOUBLE
          / ((w + 1) * nn // 64 - w * nn // 64)) AS env
      FROM (
        SELECT doc_id, 1920 + (doc_id % 5) * 128 AS nn FROM documents
      )
    )
    UNION ALL
    -- round-13 video leg: flat MJPEG frames are exactly recoverable, so
    -- the every-2nd-frame sampled pixel sum is pure arithmetic
    SELECT 'vavi', doc_id,
      ((14 + (doc_id % 3) * 2) * (16 + doc_id % 5)
        * list_sum(list_transform(
            generate_series(0, (3 + doc_id % 4) - 1), f ->
              CASE WHEN f % 2 = 0
                   THEN ((doc_id + 31 * f) % 256)::BIGINT
                   ELSE 0::BIGINT END)))::BIGINT,
      ((3 + doc_id % 4) * 1000 + (3 + doc_id % 4 + 1) // 2)::BIGINT,
      NULL::BIGINT, NULL::VARCHAR
    FROM documents
    UNION ALL
    -- round-13 probe leg: header-only metadata over the planted
    -- format cycle (round 14: + animated gif), all fields pure
    -- arithmetic
    SELECT 'probe', doc_id,
      CASE WHEN doc_id % 6 = 2 THEN NULL::BIGINT
           ELSE ((19 + doc_id % 3) * 1000 + (18 + doc_id % 5))::BIGINT END,
      CASE doc_id % 6
           WHEN 2 THEN (6400 + (doc_id % 7) * 160)::BIGINT
           WHEN 3 THEN (3 + doc_id % 4)::BIGINT
           WHEN 5 THEN (1 + doc_id % 3)::BIGINT
           ELSE 1::BIGINT END,
      CASE WHEN doc_id % 6 = 2 THEN 16000::BIGINT ELSE NULL::BIGINT END,
      CASE doc_id % 6 WHEN 0 THEN 'bmp' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'wav'
           WHEN 3 THEN 'avi' WHEN 4 THEN 'png' ELSE 'gif' END
    FROM documents
    """,
)


def _fusion_left_first(spark: SparkSession, sf: str) -> DataFrame:
    """Evaluation-order pipeline (AggregationExpression.scala:42-54):
    left side runs first, its PKs thread into the right scan as a
    semi-join prefilter; INTERSECT semantics are order-invariant, so the
    set-op oracle adjudicates the pipeline exactly."""
    docs = _table(spark, sf, "documents")

    def left(pre):
        return boolean_filter(docs, [("lang", "=", ["en"])])

    def right(pre):
        out = boolean_filter(docs, [("n_chars", ">", [300])])
        if pre is not None:
            out = out.join(pre, on="doc_id", how="left_semi")
        return out

    return FU.fused_scan(left, right, FU.intersect_fusion, order="left_first", pk="doc_id")


BENCH_ONLY["fusion_left_first"] = _fusion_left_first
_FUSION_LEFT_SQL = f"""SELECT doc_id, 0.0 AS {DISTANCE_COL}
        FROM (({_DOCS_L}) INTERSECT ({_DOCS_R}))"""


# Round-8 window re-fold (round-7 verdict #1): the three score-combining
# fusion rows (fuzzy union/intersect, stochastic multi-candidate,
# left-first evaluation-order pipeline) merge into ONE tagged-union
# driver row over a shared (fusop, pk, distance) schema — each fusion
# operator's full result still rides the value hash.  fusion_set_ops
# stays its own row (it additionally adjudicates compound() and the
# typed empty relation).


def _fusion_rank_suite(spark: SparkSession, sf: str) -> DataFrame:
    fuzzy = _fusion_fuzzy(spark, sf).select(
        F.concat(F.lit("fuzzy_"), F.col("fuzzop")).alias("fusop"),
        F.col("vec_id").cast("long").alias("pk"),
        F.col(DISTANCE_COL).cast("double").alias(DISTANCE_COL),
    )
    sto = _stochastic(spark, sf).select(
        F.lit("stochastic").alias("fusop"),
        F.col("vec_id").cast("long").alias("pk"),
        F.col(DISTANCE_COL).cast("double").alias(DISTANCE_COL),
    )
    lf = _fusion_left_first(spark, sf).select(
        F.lit("left_first").alias("fusop"),
        F.col("doc_id").cast("long").alias("pk"),
        F.col(DISTANCE_COL).cast("double").alias(DISTANCE_COL),
    )
    return _union_all([fuzzy, sto, lf])


_register(
    "fusion_rank_suite",
    _fusion_rank_suite,
    f"""
    SELECT 'fuzzy_' || fuzzop AS fusop, vec_id::BIGINT AS pk,
           {DISTANCE_COL}::DOUBLE AS {DISTANCE_COL}
    FROM ({_FUSION_FUZZY_SQL})
    UNION ALL
    SELECT 'stochastic', vec_id::BIGINT, {DISTANCE_COL}::DOUBLE
    FROM ({_FUSION_STOCH_SQL})
    UNION ALL
    SELECT 'left_first', doc_id::BIGINT, {DISTANCE_COL}::DOUBLE
    FROM ({_FUSION_LEFT_SQL})
    """,
)


def _cached_knn(spark: SparkSession, sf: str) -> DataFrame:
    """Cache node (CacheExpression.scala:15-45 + CacheManager): the same
    query id served twice must return the SAME persisted DataFrame; the
    driver adjudicates the result like any kNN."""
    from adampro_spark.operators.misc import ResultCache

    cache = getattr(_cached_knn, "_cache", None)
    if cache is None:
        cache = _cached_knn._cache = ResultCache(max_entries=8)
    fn = lambda: _knn_spark(spark, sf, "manhattan")  # noqa: E731
    first = cache.get_or_compute(f"knn_manhattan:{sf}", fn)
    again = cache.get_or_compute(f"knn_manhattan:{sf}", fn)
    assert again is first, "cache must serve the memoized DataFrame"
    return again


_register("cached_knn_manhattan", _cached_knn, _knn_sql(_duck_distance("manhattan")))


def _lsh_hamming_query(spark: SparkSession, sf: str) -> DataFrame:
    """Hamming-family LSH (bit-sampling, HammingHashFunction) — lossy
    candidates refined by the exact hamming distance; widened like the
    other lossy suites until exact at sf0.01."""
    from adampro_spark import index as IX

    df = _table(spark, sf, "embeddings")
    idx, meta = IX.build_lsh(
        df, "embedding", pk="vec_id", distance_name="hamming", ntables=64
    )
    res = IX.lsh_knn(df, "embedding", idx, meta, QVEC, K, "hamming", num_of_q=16)
    return _round4(res.select("vec_id", DISTANCE_COL))


# Round-6 fold: both LSH families (gaussian/cauchy p-stable via
# manhattan + bit-sampling hamming) ride ONE tagged-union driver row.
BENCH_ONLY["knn_lsh_hamming"] = _lsh_hamming_query

_LSH_VARIANTS: list[tuple[str, Callable[[SparkSession, str], DataFrame], str]] = [
    (
        "manhattan",
        BENCH_ONLY["knn_lsh_manhattan"],
        _knn_sql(_duck_distance("manhattan")),
    ),
    ("hamming", _lsh_hamming_query, _knn_sql(_duck_distance("hamming"))),
]


def _lsh_fold(spark: SparkSession, sf: str) -> DataFrame:
    return _union_all(
        [
            fn(spark, sf).select(
                F.lit(tag).alias("variant"), "vec_id", DISTANCE_COL
            )
            for tag, fn, _ in _LSH_VARIANTS
        ]
    )


_register(
    "knn_lsh_suite",
    _lsh_fold,
    "\nUNION ALL\n".join(
        f"SELECT '{tag}' AS variant, * FROM ({sql})"
        for tag, _, sql in _LSH_VARIANTS
    ),
)


# ONE lag/cumsum session-break formulation shared by the 'session' and
# 'assign' oracle legs — two hand-maintained copies could silently
# desynchronize the cross-check (review r11)
_SID_SQL = """
  SELECT user_id, event_id, ts, value, event_type,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM (
    SELECT user_id, event_id, ts, value, event_type,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                     > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS brk
    FROM events
  )
"""

_FUNNEL_STEPS = ("view", "click", "purchase")


def _funnel_sql() -> str:
    """Unrolled earliest-match chain over the shared session formulation
    (greedy earliest matching is optimal, so min-ts chaining decides
    funnel depth exactly): f1 = each session's first step-1 event,
    f_{i+1} = first step-(i+1) event strictly later than f_i.  NULL-safe
    session keys (a NULL user forms one session group in both engines);
    NULL-ts rows have no session."""
    ctes = [
        "fe AS (SELECT user_id, sid, ts, event_type FROM ({SID}) "
        "WHERE ts IS NOT NULL)".replace("{SID}", _SID_SQL),
        f"f1 AS (SELECT user_id, sid, min(ts) AS t FROM fe "
        f"WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY 1, 2)",
    ]
    for i in range(1, len(_FUNNEL_STEPS)):
        ctes.append(
            f"f{i + 1} AS (SELECT fe.user_id, fe.sid, min(fe.ts) AS t "
            f"FROM fe JOIN f{i} ON fe.user_id IS NOT DISTINCT FROM "
            f"f{i}.user_id AND fe.sid = f{i}.sid "
            f"WHERE fe.event_type = '{_FUNNEL_STEPS[i]}' "
            f"AND fe.ts > f{i}.t GROUP BY 1, 2)"
        )
    counts = " UNION ALL ".join(
        f"SELECT {i + 1} AS i, count(*) AS n FROM f{i + 1}"
        for i in range(len(_FUNNEL_STEPS))
    )
    values = ", ".join(
        f"({i + 1}, '{s}')" for i, s in enumerate(_FUNNEL_STEPS)
    )
    return (
        "WITH " + ",\n".join(ctes) + ",\n"
        f"c AS ({counts})\n"
        f"SELECT s.step, (s.i * 1000000 + coalesce(c.n, 0))::BIGINT AS n "
        f"FROM (VALUES {values}) s(i, step) "
        "LEFT JOIN c ON c.i = s.i"
    )


def _events_windowed(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling-window + SESSION-window event stats (round 11 fold) —
    the streaming module's aggregations run in batch mode (the same
    DataFrame code serves readStream; batch IS the oracle for the
    stream, streaming/ingest.py).  The session part adjudicates
    F.session_window's merge semantics (boundary-inclusive gap, close =
    last ts + gap) against an independent lag/cumsum SQL formulation."""
    from adampro_spark.streaming.ingest import (
        sessionize_events,
        windowed_event_stats,
    )

    ev = _table(spark, sf, "events")
    tw = windowed_event_stats(ev, window="1 hour").select(
        F.lit("tumbling").alias("part"),
        F.col("event_type").alias("key"),
        F.col("window_start").alias("t0"),
        (F.col("window_start") + F.expr("INTERVAL 1 HOUR")).alias("t1"),
        "n",
        "total_value",
    )
    # round 12 fourth part: HOPPING windows (slide=30m, so every event
    # lands in window/slide = 2 windows) — the overlap arithmetic is
    # pinned against an independent DuckDB time_bucket formulation
    # (30-min buckets align identically from the 1970 and 2000 epochs);
    # Spark drops NULL-ts rows from hopping windows (probed round 12),
    # so the oracle filters them explicitly
    hop = windowed_event_stats(ev, window="1 hour", slide="30 minutes").select(
        F.lit("hop").alias("part"),
        F.col("event_type").alias("key"),
        F.col("window_start").alias("t0"),
        (F.col("window_start") + F.expr("INTERVAL 1 HOUR")).alias("t1"),
        "n",
        "total_value",
    )
    se = sessionize_events(ev, gap="30 minutes").select(
        F.lit("session").alias("part"),
        F.col("user_id").cast("string").alias("key"),
        F.col("session_start").alias("t0"),
        F.col("session_end").alias("t1"),
        F.col("n_events").alias("n"),
        "total_value",
    )
    # round 11 second part: the per-EVENT session labeling — every
    # event's (user, session ordinal) is in the hash, so the lag/cumsum
    # assignment and the session_window aggregation adjudicate each
    # other through the shared SQL formulation
    from adampro_spark.streaming.ingest import assign_sessions

    asg = assign_sessions(ev, gap="30 minutes").select(
        F.lit("assign").alias("part"),
        F.col("user_id").cast("string").alias("key"),
        F.col("ts").alias("t0"),
        # NULL t1 typed EXACTLY like ts — a bare "timestamp" cast would
        # coerce the whole union's t1 to LTZ while t0 stays NTZ (review)
        F.lit(None).cast(ev.schema["ts"].dataType).alias("t1"),
        (F.col("event_id") * 100000 + F.col("session_idx")).alias("n"),
        F.lit(None).cast("double").alias("total_value"),
    )
    # round 12 fifth part: the session FUNNEL (view -> click -> purchase,
    # strictly-later chaining) — adjudicated against an independent
    # unrolled min-ts chain over the shared session SQL
    from adampro_spark.streaming.ingest import session_funnel

    ts_t = ev.schema["ts"].dataType
    fu = session_funnel(ev, steps=list(_FUNNEL_STEPS)).select(
        F.lit("funnel").alias("part"),
        F.col("step").alias("key"),
        F.lit(None).cast(ts_t).alias("t0"),
        F.lit(None).cast(ts_t).alias("t1"),
        (F.col("step_idx").cast("long") * 1000000 + F.col("n_sessions")).alias("n"),
        F.lit(None).cast("double").alias("total_value"),
    )
    return (
        tw.unionByName(hop).unionByName(se).unionByName(asg).unionByName(fu)
    )


_register(
    "events_windowed_stats",
    _events_windowed,
    """
    SELECT 'tumbling' AS part, event_type AS key,
           date_trunc('hour', ts) AS t0,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS t1,
           count(*)::BIGINT AS n, round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2, 3, 4
    UNION ALL
    SELECT 'hop', event_type,
           ws, ws + INTERVAL 1 HOUR,
           count(*)::BIGINT, round(sum(value), 4)
    FROM (
      SELECT event_type, value,
             time_bucket(INTERVAL 30 MINUTE, ts)
               - i * INTERVAL 30 MINUTE AS ws
      FROM events, generate_series(0, 1) t(i)
      WHERE ts IS NOT NULL
    ) GROUP BY event_type, ws
    UNION ALL
    SELECT 'session', user_id::VARCHAR,
           min(ts), max(ts) + INTERVAL 30 MINUTE,
           count(*)::BIGINT, round(sum(value), 4)
    FROM ({SID}) GROUP BY user_id, sid
    UNION ALL
    SELECT 'assign', user_id::VARCHAR, ts, NULL::TIMESTAMP,
           (CASE WHEN ts IS NULL THEN NULL
                 ELSE event_id * 100000 + sid END)::BIGINT,
           NULL::DOUBLE
    FROM ({SID})
    UNION ALL
    SELECT 'funnel', step, NULL::TIMESTAMP, NULL::TIMESTAMP,
           n, NULL::DOUBLE
    FROM ({FUNNEL})
    """.replace("{SID}", _SID_SQL).replace("{FUNNEL}", _funnel_sql()),
)


# Cross-round bench comparability (round 12, verdict r11 #3): the driver
# row above grew from one part (r10) to a 4-part adjudicated union, so a
# BENCH row named `events_windowed_stats` timing the union would not mean
# the same work it meant in r10.  The pipeline_ccnet / pipeline_ccnet_mh
# precedent, applied: bench keeps the ORIGINAL r10 tumbling shape under
# the historical name (BENCH_ONLY wins the registry merge in bench.py)
# and each later part is its own row — see README "bench row mapping".


def _events_tumbling_row(spark: SparkSession, sf: str) -> DataFrame:
    from adampro_spark.streaming.ingest import windowed_event_stats

    return windowed_event_stats(_table(spark, sf, "events"), window="1 hour")


def _events_hopping_row(spark: SparkSession, sf: str) -> DataFrame:
    from adampro_spark.streaming.ingest import windowed_event_stats

    return windowed_event_stats(
        _table(spark, sf, "events"), window="1 hour", slide="30 minutes"
    )


def _events_sessionized_row(spark: SparkSession, sf: str) -> DataFrame:
    from adampro_spark.streaming.ingest import sessionize_events

    return sessionize_events(_table(spark, sf, "events"), gap="30 minutes")


def _events_assign_row(spark: SparkSession, sf: str) -> DataFrame:
    from adampro_spark.streaming.ingest import assign_sessions

    return assign_sessions(_table(spark, sf, "events"), gap="30 minutes")


def _events_funnel_row(spark: SparkSession, sf: str) -> DataFrame:
    from adampro_spark.streaming.ingest import session_funnel

    return session_funnel(
        _table(spark, sf, "events"), steps=list(_FUNNEL_STEPS)
    )


BENCH_ONLY["events_windowed_stats"] = _events_tumbling_row
BENCH_ONLY["events_hopping"] = _events_hopping_row
BENCH_ONLY["events_sessionized"] = _events_sessionized_row
BENCH_ONLY["events_session_assign"] = _events_assign_row
BENCH_ONLY["events_funnel"] = _events_funnel_row


def _random_data_query(spark: SparkSession, sf: str) -> DataFrame:
    """RandomDataOp (RandomDataOp.scala:35-93): generate seeded rows for a
    mixed-type schema; the oracle checks the deterministic row count and
    non-null contract (values are engine-specific randomness)."""
    from adampro_spark.operators.misc import random_data

    df = random_data(
        spark,
        [("a_int", "int"), ("a_vec", "vector"), ("a_str", "string"), ("a_geo", "geometry")],
        n=1234,
        dim=8,
    )
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("a_int").alias("n_int"),
        F.count("a_vec").alias("n_vec"),
        F.sum(F.size("a_vec")).alias("total_dim"),
    )


_register(
    "random_data_counts",
    _random_data_query,
    """
    SELECT 1234::BIGINT AS n, 1234::BIGINT AS n_int, 1234::BIGINT AS n_vec,
           (1234 * 8)::BIGINT AS total_dim
    """,
)


# -- LLM-pipeline operators (text / dedup / similarity join) ----------------
# registered in their own module; merged into the shared registries here
from adampro_spark import oracle_pipeline as _OP  # noqa: E402

QUERIES.update(_OP.QUERIES)
ORACLES.update(_OP.ORACLES)
BENCH_ONLY.update(_OP.BENCH_ONLY)


# ---------------------------------------------------------------------------
# flagship (driver smoke check, sf0.001)
# ---------------------------------------------------------------------------

def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combined Boolean + 20-NN Manhattan scan over ``embeddings`` —
    the reference's core query shape (QueryOp.sequential,
    QueryOp.scala:56-69: BooleanFilterScan ∘ SequentialScan)."""
    return _knn_spark(
        spark, sf_dir, "manhattan", predicates=[("label", "!=", [0])]
    )
