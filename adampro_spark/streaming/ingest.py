"""Structured Streaming extension (SURVEY §2.9).

The reference has NO stream processing — its "streaming" endpoints are
transport-level chunking of inserts/results (``DataQuery.scala:173-247``,
``streamInsert`` ``DataDefintion.scala:170``), and SURVEY §2.9 records
that for parity nothing is required.  This module is the north-star
extension a training-data pipeline actually needs: continuous ingest into
entities, and watermarked windowed aggregation over the ``events`` table
shape.

Spark-first: ``readStream`` file sources → the same column expressions as
batch → ``writeStream`` with ``foreachBatch`` for entity appends (reusing
the bit-packed PK insert path) or a plain sink for aggregates.  Every
query here also runs in batch mode (the DataFrame code is shared), which
is how the correctness tests adjudicate the streaming results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(
    spark: SparkSession, source_dir: str, schema: T.StructType = EVENT_SCHEMA
) -> DataFrame:
    """File-source stream over a directory of event parquet files.

    ``maxFilesPerTrigger=1`` keeps micro-batches bounded; the schema is
    explicit (streams cannot infer).  The testdata's TIMESTAMP(NANOS)
    arrives as long under ``nanosAsLong`` — restore micros like
    session.load_tables does.
    """
    df = (
        spark.readStream.schema(
            T.StructType(
                [
                    f
                    if f.name != "ts"
                    else T.StructField("ts", T.LongType())
                    for f in schema.fields
                ]
            )
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    return df.withColumn("ts", F.timestamp_micros(F.expr("`ts` div 1000")))


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 day",
) -> DataFrame:
    """Tumbling-window per-type stats with late-data handling.

    Works on a stream (watermark bounds state: windows older than
    ``watermark`` behind the max seen ``ts`` finalize and evict) AND on a
    batch DataFrame (watermark is a no-op there) — the batch run is the
    oracle for the streaming run.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w").start.alias("window_start"),
            F.col("event_type"),
            F.col("n"),
            F.col("total_value"),
        )
    )


def stream_insert_entity(
    stream: DataFrame, entity, checkpoint_dir: str, trigger_available_now: bool = True
):
    """Continuous entity ingest: every micro-batch appends through
    ``Entity.insert`` (bit-packed PKs, version bump, index staleness —
    the same path as batch inserts; the reference's streamInsert also
    funnels into the normal insert, DataDefintion.scala:170).

    Returns the started StreamingQuery; callers ``awaitTermination()``.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        entity.insert(batch_df)

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
