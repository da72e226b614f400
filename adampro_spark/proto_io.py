"""Protobuf bulk exchange: the reference's only cross-deployment entity
format (``utils/importer/ProtoImporterExporter.scala:32-294``).

File layout mirrors the reference exactly:
  * ``<entity>.catalog`` — ONE delimited ``CreateEntityMessage`` (entity
    name + attribute definitions, ProtoImporterExporter.scala:263-293);
  * ``<entity>.bin``     — a stream of delimited ``TupleInsertMessage``s,
    one per row (ProtoImporterExporter.scala:107-167), read back in
    batches of ``BATCH_SIZE`` and re-inserted through the normal entity
    insert path.

Wire format is hand-rolled standard protobuf (varints, length-delimited
frames, little-endian fixed32/64 — the container has no protobuf
runtime).  Field tags follow the public vitrivr ``adam.proto`` message
shapes used by the reference (CreateEntityMessage, AttributeDefinition-
Message, TupleInsertMessage, DataMessage oneof, FeatureVectorMessage /
DenseVectorMessage); the single ``_TAGS`` table below is the place to
re-pin numbers if byte-level parity against a specific grpc build is
needed.  The codec round-trips every entity attribute type losslessly
(vectors as packed-float dense vectors, sparse vectors via the sparse
branch, text/string/bool/int/long/float/double natively).

Scale note: a delimited single stream is inherently serial — it is the
reference's RPC-boundary exchange format, not a table layout.  Export
streams ``toLocalIterator`` (one partition in memory at a time, like the
reference's ``messages.toLocalIterator``); import batches rows into
normal inserts.  Bulk-parallel interchange at 100 TB is what the
parquet/ORC paths in io_ops.py are for.
"""

from __future__ import annotations

import os
import struct
from typing import Any, BinaryIO, Iterator

from pyspark.sql import SparkSession

from adampro_spark.entity import PK, Entity

BATCH_SIZE = 10_000  # ProtoImporterExporter.scala:33

# --------------------------------------------------------------------------
# low-level wire codec
# --------------------------------------------------------------------------

_VARINT, _FIXED64, _LEN, _FIXED32 = 0, 1, 2, 5


def write_varint(out: bytearray, v: int) -> None:
    if v < 0:
        v &= (1 << 64) - 1  # two's-complement 64-bit, standard proto ints
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("malformed varint")


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


def _key(tag: int, wire: int) -> int:
    return (tag << 3) | wire


def _emit_len(out: bytearray, tag: int, payload: bytes) -> None:
    write_varint(out, _key(tag, _LEN))
    write_varint(out, len(payload))
    out.extend(payload)


def _emit_varint_field(out: bytearray, tag: int, v: int) -> None:
    write_varint(out, _key(tag, _VARINT))
    write_varint(out, v)


def _emit_float(out: bytearray, tag: int, v: float) -> None:
    write_varint(out, _key(tag, _FIXED32))
    out.extend(struct.pack("<f", v))


def _emit_double(out: bytearray, tag: int, v: float) -> None:
    write_varint(out, _key(tag, _FIXED64))
    out.extend(struct.pack("<d", v))


def iter_fields(buf: bytes) -> Iterator[tuple[int, int, Any]]:
    """Yield (tag, wire_type, raw_value) over a message body; LEN fields
    yield the raw bytes, varints the int, fixed the undecoded bytes."""
    pos = 0
    while pos < len(buf):
        key, pos = read_varint(buf, pos)
        tag, wire = key >> 3, key & 7
        if wire == _VARINT:
            v, pos = read_varint(buf, pos)
        elif wire == _LEN:
            n, pos = read_varint(buf, pos)
            v = buf[pos : pos + n]
            pos += n
        elif wire == _FIXED32:
            v = buf[pos : pos + 4]
            pos += 4
        elif wire == _FIXED64:
            v = buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield tag, wire, v


def write_delimited(fh: BinaryIO, body: bytes) -> None:
    head = bytearray()
    write_varint(head, len(body))
    fh.write(head)
    fh.write(body)


def iter_delimited(fh: BinaryIO) -> Iterator[bytes]:
    """One frame at a time — the varint header is read byte-by-byte and
    then exactly the frame body; the whole file is never slurped, so the
    driver's memory stays one frame regardless of export size (review
    r6: fh.read() defeated the batched-import design)."""
    while True:
        shift = 0
        n = 0
        first = fh.read(1)
        if not first:
            return
        b = first[0]
        while True:
            n |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
            nxt = fh.read(1)
            if not nxt:
                raise ValueError("truncated varint header")
            b = nxt[0]
        body = fh.read(n)
        if len(body) != n:
            raise ValueError("truncated frame body")
        yield body


# --------------------------------------------------------------------------
# message schema (tags per the public adam.proto message shapes)
# --------------------------------------------------------------------------

# AttributeType enum values (grpc.AttributeType in the reference's
# writeCatalogFile mapping, ProtoImporterExporter.scala:268-279)
ATTR_ENUM = {
    "unknown": 0,
    "auto": 1,
    "long": 2,
    "int": 3,
    "float": 4,
    "double": 5,
    "string": 6,
    "text": 7,
    "boolean": 8,
    "vector": 9,
    "sparsevector": 10,
    "geometry": 11,
    # beyond the reference enum (its mapping stops at geometry): the
    # round-trip must not collapse a valid attribute type to "unknown"
    "geography": 12,
}
_ENUM_ATTR = {v: k for k, v in ATTR_ENUM.items()}

_TAGS = {
    # CreateEntityMessage
    "create.entity": 1,
    "create.attributes": 2,
    # AttributeDefinitionMessage
    "attr.name": 1,
    "attr.type": 2,
    "attr.params": 3,  # map<string,string>: entries with key=1, value=2
    "attr.handler": 4,
    # TupleInsertMessage
    "tuple.data": 1,  # map<string, DataMessage>: key=1, value=2
    # DataMessage oneof
    "data.boolean": 1,
    "data.int": 2,
    "data.long": 3,
    "data.float": 4,
    "data.double": 5,
    "data.string": 6,
    "data.feature": 7,
    # FeatureVectorMessage oneof
    "feature.dense": 1,
    "feature.sparse": 2,
    # DenseVectorMessage
    "dense.vector": 1,  # repeated float, packed
    # SparseVectorMessage
    "sparse.index": 1,  # repeated int32, packed
    "sparse.data": 2,  # repeated float, packed
    "sparse.length": 3,
}


def _enc_dense(vec) -> bytes:
    inner = bytearray()
    payload = struct.pack(f"<{len(vec)}f", *[float(x) for x in vec])
    _emit_len(inner, _TAGS["dense.vector"], payload)
    out = bytearray()
    _emit_len(out, _TAGS["feature.dense"], bytes(inner))
    return bytes(out)


def _enc_sparse(sv) -> bytes:
    inner = bytearray()
    if isinstance(sv, list):
        # a DENSIFIED view of a sparsified attribute (entity.df() returns
        # dense arrays) — re-sparsify on the wire (review r6: indexing a
        # list with 'index' crashed the export)
        idx = [i for i, x in enumerate(sv) if float(x) != 0.0]
        dat = [float(sv[i]) for i in idx]
        length = len(sv)
    elif isinstance(sv, tuple):
        idx, dat, length = list(sv[0]), list(sv[1]), int(sv[2])
    else:
        idx, dat, length = list(sv["index"]), list(sv["data"]), int(sv["length"])
    ib = bytearray()
    for i in idx:
        write_varint(ib, int(i))
    _emit_len(inner, _TAGS["sparse.index"], bytes(ib))
    _emit_len(inner, _TAGS["sparse.data"], struct.pack(f"<{len(dat)}f", *dat))
    _emit_varint_field(inner, _TAGS["sparse.length"], length)
    out = bytearray()
    _emit_len(out, _TAGS["feature.sparse"], bytes(inner))
    return bytes(out)


def encode_data_message(value: Any, attr_type: str) -> bytes:
    """One DataMessage (the oneof switch in writeDataFile,
    ProtoImporterExporter.scala:231-246)."""
    out = bytearray()
    if value is None:
        # DELIBERATE deviation from the reference (which writes
        # stringData("") and so loses NULLs): an EMPTY DataMessage decodes
        # back to None, keeping nulls of every type round-trip-exact
        pass
    elif attr_type == "boolean":
        _emit_varint_field(out, _TAGS["data.boolean"], 1 if value else 0)
    elif attr_type == "int":
        _emit_varint_field(out, _TAGS["data.int"], int(value))
    elif attr_type in ("long", "auto"):
        _emit_varint_field(out, _TAGS["data.long"], int(value))
    elif attr_type == "float":
        _emit_float(out, _TAGS["data.float"], float(value))
    elif attr_type == "double":
        _emit_double(out, _TAGS["data.double"], float(value))
    elif attr_type in ("string", "text"):
        _emit_len(out, _TAGS["data.string"], str(value).encode("utf-8"))
    elif attr_type == "vector":
        _emit_len(out, _TAGS["data.feature"], _enc_dense(value))
    elif attr_type == "sparsevector":
        _emit_len(out, _TAGS["data.feature"], _enc_sparse(value))
    else:
        _emit_len(out, _TAGS["data.string"], str(value).encode("utf-8"))
    return bytes(out)


def decode_data_message(buf: bytes, legacy_empty_string_null: bool = False) -> Any:
    """``legacy_empty_string_null`` (opt-in, ADVICE r6): the reference
    writes NULLs as ``stringData("")`` (ProtoImporterExporter.scala:231-246),
    whereas this engine emits an EMPTY DataMessage to keep NULLs typed and
    round-trip-exact.  Set the flag when importing reference-produced .bin
    streams so their empty strings decode back to None."""
    for tag, wire, raw in iter_fields(buf):
        if tag == _TAGS["data.boolean"]:
            return bool(raw)
        if tag == _TAGS["data.int"]:
            return _signed64(raw) if raw >= 1 << 31 else int(raw)
        if tag == _TAGS["data.long"]:
            return _signed64(raw)
        if tag == _TAGS["data.float"]:
            return struct.unpack("<f", raw)[0]
        if tag == _TAGS["data.double"]:
            return struct.unpack("<d", raw)[0]
        if tag == _TAGS["data.string"]:
            s = raw.decode("utf-8")
            if legacy_empty_string_null and s == "":
                return None
            return s
        if tag == _TAGS["data.feature"]:
            return _decode_feature(raw)
    return None


def _decode_feature(buf: bytes) -> Any:
    for tag, _w, raw in iter_fields(buf):
        if tag == _TAGS["feature.dense"]:
            for t2, _w2, r2 in iter_fields(raw):
                if t2 == _TAGS["dense.vector"]:
                    return list(struct.unpack(f"<{len(r2) // 4}f", r2))
            return []
        if tag == _TAGS["feature.sparse"]:
            idx, dat, length = [], [], 0
            for t2, _w2, r2 in iter_fields(raw):
                if t2 == _TAGS["sparse.index"]:
                    pos = 0
                    while pos < len(r2):
                        v, pos = read_varint(r2, pos)
                        idx.append(v)
                elif t2 == _TAGS["sparse.data"]:
                    dat = list(struct.unpack(f"<{len(r2) // 4}f", r2))
                elif t2 == _TAGS["sparse.length"]:
                    length = r2
            return {"index": idx, "data": dat, "length": length}
    return None


def encode_tuple(row: dict[str, Any], types: dict[str, str]) -> bytes:
    """TupleInsertMessage: map<string, DataMessage>."""
    out = bytearray()
    for name, value in row.items():
        entry = bytearray()
        _emit_len(entry, 1, name.encode("utf-8"))
        _emit_len(entry, 2, encode_data_message(value, types.get(name, "string")))
        _emit_len(out, _TAGS["tuple.data"], bytes(entry))
    return bytes(out)


def decode_tuple(buf: bytes, legacy_empty_string_null: bool = False) -> dict[str, Any]:
    row: dict[str, Any] = {}
    for tag, _w, raw in iter_fields(buf):
        if tag != _TAGS["tuple.data"]:
            continue
        key, val = "", None
        for t2, _w2, r2 in iter_fields(raw):
            if t2 == 1:
                key = r2.decode("utf-8")
            elif t2 == 2:
                val = decode_data_message(r2, legacy_empty_string_null)
        row[key] = val
    return row


def encode_create_entity(name: str, attributes: list[dict[str, str]]) -> bytes:
    out = bytearray()
    _emit_len(out, _TAGS["create.entity"], name.encode("utf-8"))
    for a in attributes:
        ab = bytearray()
        _emit_len(ab, _TAGS["attr.name"], a["name"].encode("utf-8"))
        _emit_varint_field(ab, _TAGS["attr.type"], ATTR_ENUM.get(a["type"], 0))
        # attribute params (map<string,string>): carries densify_on_read
        # so a SPARSIFIED entity round-trips its dense read view (review
        # r6 — the flag was lost and imports served raw sparse structs)
        if a.get("densify_on_read"):
            kv = bytearray()
            _emit_len(kv, 1, b"densify_on_read")
            _emit_len(kv, 2, b"true")
            _emit_len(ab, _TAGS["attr.params"], bytes(kv))
        _emit_len(out, _TAGS["create.attributes"], bytes(ab))
    return bytes(out)


def decode_create_entity(buf: bytes) -> tuple[str, list[dict[str, str]]]:
    name, attrs = "", []
    for tag, _w, raw in iter_fields(buf):
        if tag == _TAGS["create.entity"]:
            name = raw.decode("utf-8")
        elif tag == _TAGS["create.attributes"]:
            a: dict[str, str] = {}
            for t2, _w2, r2 in iter_fields(raw):
                if t2 == _TAGS["attr.name"]:
                    a["name"] = r2.decode("utf-8")
                elif t2 == _TAGS["attr.type"]:
                    a["type"] = _ENUM_ATTR.get(r2, "string")
                elif t2 == _TAGS["attr.params"]:
                    key = val = b""
                    for t3, _w3, r3 in iter_fields(r2):
                        if t3 == 1:
                            key = r3
                        elif t3 == 2:
                            val = r3
                    if key == b"densify_on_read" and val == b"true":
                        a["densify_on_read"] = True
            attrs.append(a)
    return name, attrs


# --------------------------------------------------------------------------
# entity-level import/export
# --------------------------------------------------------------------------


def export_entity_proto(entity: Entity, path: str) -> None:
    """``exportData`` (ProtoImporterExporter.scala:203-224): write
    ``<path>/<name>.catalog`` + ``<path>/<name>.bin``.

    Streams the DataFrame with ``toLocalIterator`` — one partition on the
    driver at a time, matching the reference's (commented-in-spirit)
    ``messages.toLocalIterator`` write loop."""
    os.makedirs(path, exist_ok=True)
    rec = entity.catalog.entity(entity.name)
    attrs = [a for a in rec["attributes"] if a["name"] != PK]
    types = {a["name"]: a["type"] for a in rec["attributes"]}

    with open(os.path.join(path, f"{entity.name}.catalog"), "wb") as fh:
        write_delimited(fh, encode_create_entity(entity.name, attrs))

    cols = [a["name"] for a in attrs]
    df = entity.df().select(*cols)
    with open(os.path.join(path, f"{entity.name}.bin"), "wb") as fh:
        for row in df.toLocalIterator():
            fh.write(_delimited_bytes(encode_tuple(row.asDict(), types)))


def _delimited_bytes(body: bytes) -> bytes:
    head = bytearray()
    write_varint(head, len(body))
    return bytes(head) + body


def import_proto(
    spark: SparkSession, catalog, path: str, legacy_empty_string_null: bool = False
) -> list[Entity]:
    """``importData`` (ProtoImporterExporter.scala:41-49): every
    ``*.catalog`` under ``path`` creates its entity, then every matching
    ``*.bin`` streams tuples back in ``BATCH_SIZE`` batches through the
    normal insert path (fresh PKs, staleness bookkeeping — the reference
    re-inserts through InsertMessage ops too).

    ``legacy_empty_string_null``: opt-in compat for reference-produced
    streams, which encode NULL as ``stringData("")`` — see
    :func:`decode_data_message`."""
    entities: list[Entity] = []
    catalogs = sorted(
        os.path.join(dp, f)
        for dp, _dn, fns in os.walk(path)
        for f in fns
        if f.endswith(".catalog")
    )
    if not catalogs:
        raise FileNotFoundError(f"no .catalog files under {path!r}")
    for cpath in catalogs:
        with open(cpath, "rb") as fh:
            for body in iter_delimited(fh):
                name, attrs = decode_create_entity(body)
                ent = Entity.create(spark, catalog, name, [(a["name"], a["type"]) for a in attrs])
                # restore per-attribute read semantics carried in params
                if any(a.get("densify_on_read") for a in attrs):
                    rec_attrs = [
                        dict(a2) for a2 in catalog.entity(name)["attributes"]
                    ]
                    for a in attrs:
                        if a.get("densify_on_read"):
                            for a2 in rec_attrs:
                                if a2["name"] == a["name"]:
                                    a2["densify_on_read"] = True
                    catalog.update_entity(name, attributes=rec_attrs)
                entities.append(ent)
                bin_path = cpath[: -len(".catalog")] + ".bin"
                if os.path.exists(bin_path):
                    _import_bin(spark, ent, bin_path, legacy_empty_string_null)
    return entities


def _import_bin(
    spark: SparkSession,
    ent: Entity,
    bin_path: str,
    legacy_empty_string_null: bool = False,
) -> None:
    schema = ent.schema()
    fields = [f for f in schema.fields if f.name != PK]
    batch: list[dict[str, Any]] = []

    def flush() -> None:
        if not batch:
            return
        rows = [[r.get(f.name) for f in fields] for r in batch]
        sub = spark.createDataFrame(
            rows, schema=type(schema)(fields)
        )
        ent.insert(sub)
        batch.clear()

    with open(bin_path, "rb") as fh:
        for body in iter_delimited(fh):
            batch.append(decode_tuple(body, legacy_empty_string_null))
            if len(batch) >= BATCH_SIZE:
                flush()
    flush()
