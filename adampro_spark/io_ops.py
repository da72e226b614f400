"""Entity import/export (SURVEY §2.1 #16, ``ProtoImporterExporter.scala``).

The reference round-trips entities through protobuf files plus Lire/Solr
importers — deployment plumbing for its gRPC transport.  The Spark-native
equivalents are the interchange formats Spark already speaks: Parquet
(lossless), JSON (lossless for our types), CSV (complex columns — vector /
sparsevector / geometry — serialized as JSON strings and restored on
import from the catalog's attribute types).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adampro_spark.entity import ATTRIBUTE_TYPES, PK, Entity

_COMPLEX = ("vector", "sparsevector")


def export_entity(entity: Entity, path: str, fmt: str = "parquet") -> None:
    """Write an entity's data to ``path`` in ``fmt`` (parquet/json/csv)."""
    df = entity.df()
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
        return
    if fmt == "json":
        df.write.mode("overwrite").json(path)
        return
    if fmt == "csv":
        attrs = entity.catalog.entity(entity.name)["attributes"]
        for a in attrs:
            if a["type"] in _COMPLEX:
                df = df.withColumn(a["name"], F.to_json(F.col(a["name"])))
        df.write.mode("overwrite").option("header", "true").csv(path)
        return
    raise ValueError(f"unknown export format {fmt!r}")


def import_entity(
    spark: SparkSession,
    catalog,
    name: str,
    attributes,
    path: str,
    fmt: str = "parquet",
) -> Entity:
    """Create ``name`` with ``attributes`` and load ``path`` into it.

    Imported rows get fresh PKs via the normal insert path (the reference
    importer also re-inserts, Entity.scala:295-392); an exported ``ap_id``
    column is dropped rather than trusted.
    """
    ent = Entity.create(spark, catalog, name, attributes)
    schema = ent.schema()
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "json":
        df = spark.read.schema(schema).json(path)
    elif fmt == "csv":
        df = spark.read.option("header", "true").csv(path)
        for f in schema.fields:
            if f.name == PK or f.name not in df.columns:
                continue
            col = F.col(f.name)
            a_type = next(
                (a["type"] for a in catalog.entity(name)["attributes"] if a["name"] == f.name),
                None,
            )
            if a_type in _COMPLEX:
                df = df.withColumn(f.name, F.from_json(col, f.dataType))
            else:
                df = df.withColumn(f.name, col.cast(f.dataType))
    else:
        raise ValueError(f"unknown import format {fmt!r}")
    if PK in df.columns:
        df = df.drop(PK)
    ent.insert(df.select(*[f.name for f in schema.fields if f.name != PK]))
    return ent
