"""SparkSession factory tuned for the engine.

Reference config worth keeping (SparkStartup.scala:22-33): Kryo, a 50 MB
broadcast-join threshold, small default partition counts.  On Spark 4 we
instead lean on AQE (runtime coalescing, skew-join splitting) and keep
shuffle partitions bounded so local runs do not over-partition while a
cluster run can still scale them up via ``spark.sql.shuffle.partitions``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(app_name: str = "adampro-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    AQE is enabled for runtime shuffle-partition coalescing and skew-join
    handling — both matter far more at 100 TB than any static setting.
    Arrow is enabled for the few pandas-UDF paths (index kernels).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.default.parallelism", cpus)
        .config("spark.sql.autoBroadcastJoinThreshold", str(50 * 1024 * 1024))
        # FAIR scheduling so parallel/timed query paths (execution.py)
        # interleave instead of queueing FIFO (SparkStartup fair mode)
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # a session that runs the whole oracle/bench suite compiles several
        # hundred whole-stage-codegen units; the default 100-entry plan
        # cache thrashes (every re-run regenerates + re-JITs its classes)
        # and the default 240 MB JVM code cache can fill up, at which point
        # HotSpot silently disables the JIT and random queries run
        # interpreted 10-50x slower.  Both limits are per-JVM one-offs —
        # harmless on executors, vital for long-lived driver/local sessions.
        .config("spark.sql.codegen.cache.maxEntries", "1000")
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=512m -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # the synthetic testdata writes TIMESTAMP(NANOS) which Spark refuses
        # by default (PARQUET_TYPE_ILLEGAL); read as long and convert in
        # load_tables().
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # split small single-file tables into >= one byte-range per core at
        # the READER (no shuffle): otherwise a 15 MB parquet file arrives as
        # ONE partition and every downstream map/UDF stage runs on one core
        # of 32.  minPartitionNum alone is floored by openCostInBytes (4 MB
        # default), which keeps a few-MB file whole — lower it so the
        # min-partition floor actually bites.  NOTE (round 15): byte-range
        # splits only parallelize MULTI-row-group files — a single-row-group
        # file yields all its rows to the one split containing the row
        # group, so per-row-heavy operators additionally _spread their
        # input (pipeline/dedup.py) rather than relying on the reader.
        # At cluster scale inputs already span many >=128 MB splits, so
        # both settings are inert.
        .config("spark.sql.files.minPartitionNum", cpus)
        .config("spark.sql.files.openCostInBytes", str(64 * 1024))
    )
    return builder.getOrCreate()


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet timestamp[ns], via pyarrow footer inspection."""
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa

        schema = pq.read_schema(path)
        return [
            f.name
            for f in schema
            if isinstance(f.type, pa.TimestampType) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every synthetic table in ``sf_dir`` as a DataFrame.

    Plain ``spark.read.parquet`` — Catalyst handles column pruning and
    predicate pushdown into the scan, so no eager caching here.
    """
    from pyspark.sql import functions as F

    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            # nanos timestamps arrive as long (nanosAsLong): restore
            # microsecond-precision timestamps so date semantics match SQL
            # engines reading the same files.
            for c in _nanos_timestamp_cols(path):
                # integer `div`, not float /: the double round-trip loses the
                # low bits of epoch-nanos (53-bit mantissa) -> +-1us drift
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
            out[name] = df
    return out
