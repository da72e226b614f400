"""Dataset profiling: one-pass sketch-based column statistics.

A training-data pipeline's first question about a new 100 TB corpus —
cardinalities, null rates, ranges, quantiles — answered in ONE map-side-
combined aggregation pass using Spark's built-in sketches (HyperLogLog++
``approx_count_distinct``, GK ``percentile_approx``), never an exact
distinct or sort.  The reference's entity ``properties``/``preview``
surface (Entity.scala:241-261) stops at row counts; this is the scale
extension of that idea.

Everything is a single ``df.agg(...)`` so Catalyst plans one partial/
final aggregate pair — the profile costs one scan regardless of column
count, and column pruning keeps the scan to the profiled columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.ShortType,
    T.ByteType, T.DecimalType,
)


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    rsd: float = 0.05,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """One row per profiled column:

    ``column, dtype, n, n_null, approx_distinct`` plus, for numeric
    columns, ``min, max, mean`` and ``q`` (approximate quantiles at
    ``quantiles``); for string columns ``min``/``max``/``mean`` carry
    length statistics (the useful scalar for text).

    ``rsd`` is the HLL++ relative standard deviation (Spark default 5%);
    lower costs more sketch memory, never another pass.

    Vector columns (``array`` of numerics — embeddings) profile their
    L2 NORM through the same ``min/max/mean/q`` slots: the scalar that
    actually diagnoses an embedding table (zero vectors → min 0,
    un-normalized rows → wide norm range), still inside the one pass.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns or [n for n in fields]
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = fields[c]
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null"))
        aggs.append(F.approx_count_distinct(c, rsd).alias(f"{c}__adist"))
        if isinstance(dt, _NUMERIC):
            v = F.col(c).cast("double")
        elif isinstance(dt, T.StringType):
            v = F.length(F.col(c)).cast("double")
        elif isinstance(dt, T.ArrayType) and isinstance(dt.elementType, _NUMERIC):
            v = F.sqrt(
                F.aggregate(
                    F.col(c).cast("array<double>"),
                    F.lit(0.0),
                    lambda a, x: a + x * x,
                )
            )
        else:
            v = None
        if v is not None:
            aggs.append(F.min(v).alias(f"{c}__min"))
            aggs.append(F.max(v).alias(f"{c}__max"))
            aggs.append(F.avg(v).alias(f"{c}__mean"))
            aggs.append(
                F.percentile_approx(v, list(quantiles)).alias(f"{c}__q")
            )
    row = df.agg(*aggs).collect()[0].asDict()

    spark = df.sparkSession
    out_rows = []
    for c in cols:
        out_rows.append(
            {
                "column": c,
                "dtype": fields[c].simpleString(),
                "n": row["__n"],
                "n_null": row[f"{c}__null"] or 0,
                "approx_distinct": row[f"{c}__adist"],
                "min": row.get(f"{c}__min"),
                "max": row.get(f"{c}__max"),
                "mean": row.get(f"{c}__mean"),
                "q": [float(x) for x in row[f"{c}__q"]]
                if row.get(f"{c}__q") is not None
                else None,
            }
        )
    schema = T.StructType(
        [
            T.StructField("column", T.StringType(), False),
            T.StructField("dtype", T.StringType(), False),
            T.StructField("n", T.LongType(), False),
            T.StructField("n_null", T.LongType(), False),
            T.StructField("approx_distinct", T.LongType(), False),
            T.StructField("min", T.DoubleType(), True),
            T.StructField("max", T.DoubleType(), True),
            T.StructField("mean", T.DoubleType(), True),
            T.StructField("q", T.ArrayType(T.DoubleType()), True),
        ]
    )
    return spark.createDataFrame(out_rows, schema)
