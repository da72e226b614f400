"""Entity import/export and alternative storage engines.

Import/export (SURVEY §2.1 #16, ``ProtoImporterExporter.scala``): the
reference round-trips entities through protobuf files plus Lire/Solr
importers — deployment plumbing for its gRPC transport.  The Spark-native
equivalents are the interchange formats Spark already speaks: Parquet
(lossless), JSON (lossless for our types), ORC (lossless, columnar —
``OrcEngine.scala:25-30``), Avro (``AvroEngine.scala:26-31``; the
spark-avro module is external to core Spark, so this path is gated on its
presence), CSV (complex columns — vector / sparsevector / geometry —
serialized as JSON strings and restored on import from the catalog's
attribute types).

Relational storage (SURVEY §2.1 #11, ``PostgresqlEngine.scala:23-30``):
``export_entity_jdbc`` / ``import_entity_jdbc`` move an entity through any
JDBC database via Spark's JDBC source — predicate pushdown, partitioned
reads, and dialect mapping come from Spark.  Complex columns travel as
JSON strings (the reference's Postgres engine likewise only handles
relational fields and routes vectors to a separate engine).  Tests use
the embedded Derby driver that ships with Spark; against Postgres, pass
the usual ``jdbc:postgresql://`` URL + driver properties.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adampro_spark.entity import ATTRIBUTE_TYPES, PK, Entity

_COMPLEX = ("vector", "sparsevector")


def _avro_check(spark: SparkSession) -> None:
    """spark-avro is an external module (not bundled in pyspark wheels);
    raise a clear error where it is absent instead of Spark's generic
    'failed to find data source'.  The check must probe the CLASS —
    ``df.write.format("avro")`` never raises (it only records the format
    string; review r6: the old try/except around it was dead code)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.avro.AvroFileFormat"
        )
    except Exception as e:  # pragma: no cover - depends on deployment
        raise RuntimeError(
            "Avro support needs the spark-avro package "
            "(--packages org.apache.spark:spark-avro_2.13:<spark-version>)"
        ) from e


def export_entity(entity: Entity, path: str, fmt: str = "parquet") -> None:
    """Write an entity's data to ``path`` in ``fmt``
    (parquet/json/orc/avro/csv)."""
    df = entity.df()
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
        return
    if fmt == "json":
        df.write.mode("overwrite").json(path)
        return
    if fmt == "orc":
        df.write.mode("overwrite").orc(path)
        return
    if fmt == "avro":
        _avro_check(df.sparkSession)
        df.write.format("avro").mode("overwrite").save(path)
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
    elif fmt == "orc":
        df = spark.read.orc(path)
    elif fmt == "avro":
        df = spark.read.format("avro").load(path)
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


# ---------------------------------------------------------------------------
# storage handler registry (StorageManager.scala:19-100 +
# StorageHandler.scala:20-190): named engines behind one read/write
# surface.  On Spark the "engine zoo" is the DataSource API — Cassandra,
# HBase, Solr, Delta, Iceberg all ship Spark connectors addressed by
# format name — so a handler here is (format, fixed options), and
# registering a new engine is one call, no subclassing.
# ---------------------------------------------------------------------------


class StorageHandler:
    """A named storage engine: Spark DataSource format + fixed options.

    ``priority``/``supports`` mirror the reference's handler selection
    metadata (StorageHandler.scala:20-27); ``read``/``write`` are the
    whole engine contract — everything else (pushdown, partitioned
    parallel IO, schema mapping) is the connector's job.
    """

    def __init__(
        self,
        name: str,
        fmt: str,
        options: dict | None = None,
        priority: int = 0,
        supports: tuple[str, ...] = (),
    ):
        self.name = name
        self.fmt = fmt
        self.options = options or {}
        self.priority = priority
        self.supports = supports

    def read(self, spark: SparkSession, path: str | None = None, schema=None, **opts):
        reader = spark.read.format(self.fmt).options(**{**self.options, **opts})
        if schema is not None:
            reader = reader.schema(schema)
        return reader.load(path) if path is not None else reader.load()

    def write(self, df: DataFrame, path: str | None = None, mode: str = "overwrite", **opts):
        writer = df.write.format(self.fmt).options(**{**self.options, **opts}).mode(mode)
        writer.save(path) if path is not None else writer.save()


STORAGE_HANDLERS: dict[str, StorageHandler] = {}


def register_storage_handler(handler: StorageHandler) -> None:
    STORAGE_HANDLERS[handler.name] = handler


def get_storage_handler(name: str) -> StorageHandler:
    """StorageManager.get (StorageManager.scala:42-52): error on a missing
    handler rather than silent fallback."""
    if name not in STORAGE_HANDLERS:
        raise KeyError(
            f"no suitable storage handler found in registry for {name!r} "
            f"(registered: {sorted(STORAGE_HANDLERS)})"
        )
    return STORAGE_HANDLERS[name]


for _h in (
    StorageHandler("parquet", "parquet", priority=10, supports=("*",)),
    StorageHandler("orc", "orc", priority=5, supports=("*",)),
    StorageHandler("json", "json", supports=("*",)),
    StorageHandler("csv", "csv", options={"header": "true"}),
    StorageHandler("avro", "avro"),
    # relational engine through the same registry surface
    # (PostgresqlEngine.scala:23-30); per-call options carry
    # url/dbtable/driver — tests drive it on embedded Derby
    StorageHandler("jdbc", "jdbc"),
):
    register_storage_handler(_h)


# ---------------------------------------------------------------------------
# storage transfer (DataDefintion.scala transferStorageHandler op — the
# reference moves an entity's attribute data between engines; queries keep
# running unchanged against the new storage)
# ---------------------------------------------------------------------------

# handlers whose on-disk model has no native nested types: complex columns
# (vector / sparsevector / any array or struct) travel as JSON strings
_FLAT_FORMATS = ("jdbc", "csv")


def transfer_entity(
    entity: Entity, handler_name: str, location: str | None = None, **handler_opts
) -> None:
    """Move an entity's STORED rows to the named storage handler —
    ``transferStorageHandler`` semantics: the query surface (``df()``,
    PKs, schema) is unchanged, only where the bytes live moves.

    ``handler_name="parquet"`` restores the default layout at the
    entity's own path.  For other handlers, ``location`` is the target
    path (file formats) and ``handler_opts`` pass through to the
    connector (JDBC: ``url=… dbtable=… driver=…``).  PKs are PRESERVED
    (unlike import/export, which re-keys — transfer is the same entity,
    not a new one).  Complex columns ride as JSON on flat engines and are
    restored on read from the schema captured at transfer time.

    Crash-safe like bucketize: the catalog flag flips before the old
    layout is removed, and mutations (insert/delete/vacuum) transparently
    transfer back to parquet first — the handler layouts are
    read-optimized placements, exactly like the bucketed layout.
    """
    import json as _json
    import shutil

    from pyspark.sql import types as T

    cat = entity.catalog
    entity.debucketize()
    # STORED representation: transferring the densified view would break
    # the sparse catalog schema on the way back (see Entity._stored_df)
    df = entity._stored_df()

    if handler_name == "parquet":
        if not cat.entity(entity.name).get("storage"):
            return  # already on the default layout
        tmp = entity.path + "_tmp"
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(entity.path):
            entity._swap_in(tmp)
        else:
            os.rename(tmp, entity.path)
        # external handler data (e.g. the JDBC table) is left in place —
        # it is no longer authoritative once the flag clears
        cat.update_entity(entity.name, storage=None)
        return

    h = get_storage_handler(handler_name)
    complex_cols = [
        f.name for f in df.schema.fields if not isinstance(f.dataType, T.AtomicType)
    ]
    read_schema = df.schema
    out = df
    if h.fmt in _FLAT_FORMATS:
        for c in complex_cols:
            out = out.withColumn(c, F.to_json(F.col(c)))
    read_opts = dict(handler_opts)
    if location is not None:
        read_opts["path"] = location
    h.write(out, **read_opts)
    cat.update_entity(
        entity.name,
        storage={
            "handler": handler_name,
            "options": read_opts,
            "read_schema": _json.dumps(read_schema.jsonValue()),
            "complex_json": complex_cols if h.fmt in _FLAT_FORMATS else [],
        },
    )
    # flag is authoritative from here; the parquet dir is stale
    shutil.rmtree(entity.path, ignore_errors=True)


# ---------------------------------------------------------------------------
# JDBC storage engine (PostgresqlEngine.scala:23-30)
# ---------------------------------------------------------------------------


def export_entity_jdbc(
    entity: Entity,
    url: str,
    table: str,
    properties: dict | None = None,
    mode: str = "overwrite",
) -> None:
    """Write an entity's rows to a JDBC table.

    Complex columns (vector / sparsevector) are serialized to JSON strings
    — JDBC databases have no portable array type, and the reference's
    relational engine likewise handles only scalar fields
    (PostgresqlEngine.scala:23-30 limits itself to FieldTypes it can map).
    The write itself is Spark's partitioned JDBC writer: each partition
    opens its own connection, so ingest parallelism scales with the
    upstream partitioning.
    """
    df = entity.df()
    attrs = entity.catalog.entity(entity.name)["attributes"]
    for a in attrs:
        if a["type"] in _COMPLEX:
            df = df.withColumn(a["name"], F.to_json(F.col(a["name"])))
    df.write.jdbc(url, table, mode=mode, properties=properties or {})


def import_entity_jdbc(
    spark: SparkSession,
    catalog,
    name: str,
    attributes,
    url: str,
    table: str,
    properties: dict | None = None,
    **read_options,
) -> Entity:
    """Create ``name`` and load a JDBC table into it.

    ``read_options`` pass through to Spark's JDBC reader —
    ``partitionColumn``/``lowerBound``/``upperBound``/``numPartitions``
    turn the read into range-parallel scans (the 100 TB ingest path);
    without them the read is a single connection.
    """
    ent = Entity.create(spark, catalog, name, attributes)
    schema = ent.schema()
    reader = spark.read.options(**read_options) if read_options else spark.read
    df = reader.jdbc(url, table, properties=properties or {})
    for f in schema.fields:
        if f.name == PK or f.name not in df.columns:
            continue
        a_type = next(
            (a["type"] for a in catalog.entity(name)["attributes"] if a["name"] == f.name),
            None,
        )
        if a_type in _COMPLEX:
            df = df.withColumn(f.name, F.from_json(F.col(f.name), f.dataType))
        else:
            df = df.withColumn(f.name, F.col(f.name).cast(f.dataType))
    if PK in df.columns:
        df = df.drop(PK)
    ent.insert(df.select(*[f.name for f in schema.fields if f.name != PK]))
    return ent
