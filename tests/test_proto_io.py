"""Protobuf bulk exchange (proto_io.py ↔ ProtoImporterExporter.scala)."""

import math
import struct

import pytest

from adampro_spark.catalog import Catalog
from adampro_spark.entity import PK, Entity
from adampro_spark.proto_io import (
    decode_create_entity,
    decode_data_message,
    decode_tuple,
    encode_create_entity,
    encode_data_message,
    encode_tuple,
    export_entity_proto,
    import_proto,
    read_varint,
    write_varint,
)


# ---------------------------------------------------------------------------
# wire-level units (no Spark)
# ---------------------------------------------------------------------------


def test_varint_roundtrip_edges():
    for v in (0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -(2**31)):
        buf = bytearray()
        write_varint(buf, v)
        got, pos = read_varint(bytes(buf), 0)
        want = v & (1 << 64) - 1 if v < 0 else v
        assert got == want and pos == len(buf)


@pytest.mark.parametrize(
    "value,atype",
    [
        (True, "boolean"),
        (False, "boolean"),
        (42, "int"),
        (-7, "int"),
        (2**40, "long"),
        (-(2**40), "long"),
        (1.5, "float"),
        (math.pi, "double"),
        ("héllo wörld", "string"),
        ("long text " * 10, "text"),
        ([1.0, -2.5, 0.0], "vector"),
        ({"index": [0, 3], "data": [1.0, 2.0], "length": 8}, "sparsevector"),
        (None, "string"),
    ],
)
def test_data_message_roundtrip(value, atype):
    got = decode_data_message(encode_data_message(value, atype))
    if atype == "float":
        assert got == pytest.approx(value, rel=1e-6)
    elif atype == "double":
        assert got == value
    elif atype == "vector":
        assert got == pytest.approx(value)
    elif value is None:
        # deviation from the reference (documented in proto_io): an empty
        # DataMessage keeps NULLs round-trip-exact instead of "" 
        assert got is None
    else:
        assert got == value


def test_tuple_roundtrip():
    row = {"id": 7, "name": "x", "vec": [0.5, 1.5]}
    types = {"id": "long", "name": "string", "vec": "vector"}
    got = decode_tuple(encode_tuple(row, types))
    assert got["id"] == 7 and got["name"] == "x"
    assert got["vec"] == pytest.approx([0.5, 1.5])


def test_create_entity_roundtrip():
    attrs = [{"name": "id", "type": "long"}, {"name": "emb", "type": "vector"}]
    name, got = decode_create_entity(encode_create_entity("ent1", attrs))
    assert name == "ent1" and got == attrs


def test_int32_negative_is_ten_byte_varint():
    # standard proto int32: negatives go out as 64-bit two's complement
    body = encode_data_message(-1, "int")
    assert decode_data_message(body) == -1
    assert len(body) >= 11  # key + 10-byte varint


# ---------------------------------------------------------------------------
# entity-level roundtrip (Spark)
# ---------------------------------------------------------------------------


ATTRS = [
    ("n_int", "int"),
    ("n_long", "long"),
    ("n_float", "float"),
    ("n_double", "double"),
    ("label", "string"),
    ("body", "text"),
    ("flag", "boolean"),
    ("emb", "vector"),
    ("sparse", "sparsevector"),
]

ROWS = [
    (1, 10**12, 0.5, math.e, "a", "lorem ipsum", True,
     [0.1, 0.2, 0.3], {"index": [1], "data": [9.0], "length": 4}),
    (-2, -5, 1.25, -0.125, "b", "", False,
     [1.0, 0.0, -1.0], {"index": [0, 2], "data": [1.0, 2.0], "length": 4}),
]


def test_entity_proto_roundtrip(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat_a"))
    ent = Entity.create(spark, cat, "exch", ATTRS)
    src = spark.createDataFrame(ROWS, schema=type(ent.schema())(
        [f for f in ent.schema().fields if f.name != PK]
    ))
    ent.insert(src)

    export_entity_proto(ent, str(tmp_path / "dump"))
    assert (tmp_path / "dump" / "exch.catalog").exists()
    assert (tmp_path / "dump" / "exch.bin").exists()

    cat2 = Catalog(str(tmp_path / "cat_b"))
    ents = import_proto(spark, cat2, str(tmp_path / "dump"))
    assert [e.name for e in ents] == ["exch"]
    got = ents[0].df().drop(PK).orderBy("n_int").collect()
    want = sorted(ROWS, key=lambda r: r[0])
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["n_int"] == w[0] and g["n_long"] == w[1]
        assert g["n_float"] == pytest.approx(w[2], rel=1e-6)
        assert g["n_double"] == w[3]
        assert g["label"] == w[4] and g["body"] == w[5] and g["flag"] == w[6]
        assert list(g["emb"]) == pytest.approx(w[7])
        assert list(g["sparse"]["index"]) == w[8]["index"]
        assert list(g["sparse"]["data"]) == pytest.approx(w[8]["data"])
        assert g["sparse"]["length"] == w[8]["length"]


def test_import_proto_missing_path_raises(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat_c"))
    with pytest.raises(FileNotFoundError):
        import_proto(spark, cat, str(tmp_path / "nothing"))


def test_null_and_sparsified_roundtrip(spark, tmp_path):
    """Review r6: NULLs in non-string columns crashed the import, and a
    SPARSIFIED entity's densified export view crashed _enc_sparse.  Both
    must round-trip exactly through the wire format."""
    from adampro_spark.ops import AdamOps

    o = AdamOps(spark, str(tmp_path / "cat"))
    o.entity.create(
        "pn", [("rid", "long"), ("v", "vector"), ("x", "int"), ("s", "string")]
    )
    rows = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 2.0, 0.0], 7, "a"),
            (2, [0.0, 3.0, 0.0, 0.0], None, None),
        ],
        "rid long, v array<float>, x int, s string",
    )
    o.entity.insert("pn", rows)
    o.entity.sparsify("pn", "v")

    wire = str(tmp_path / "wire")
    o.entity.export_proto("pn", wire)

    o2 = AdamOps(spark, str(tmp_path / "cat2"))
    (ent,) = o2.entity.import_proto(wire)
    got = {r["rid"]: r for r in ent.df().orderBy("rid").collect()}
    assert got[2]["x"] is None and got[2]["s"] is None  # nulls survive
    assert list(got[1]["v"]) == [1.0, 0.0, 2.0, 0.0]    # sparse re-densifies
    assert list(got[2]["v"]) == [0.0, 3.0, 0.0, 0.0]


def test_legacy_empty_string_null_compat_flag():
    """ADVICE r6: the reference writes NULL as stringData("") — behind the
    opt-in flag an empty string decodes to None; without it (default) the
    engine's lossless semantics hold (empty string stays a string)."""
    buf = encode_data_message("", "string")
    assert decode_data_message(buf) == ""
    assert decode_data_message(buf, legacy_empty_string_null=True) is None
    # non-empty strings unaffected by the flag
    buf2 = encode_data_message("x", "string")
    assert decode_data_message(buf2, legacy_empty_string_null=True) == "x"
    # the engine's own NULL encoding still round-trips either way
    bufn = encode_data_message(None, "string")
    assert decode_data_message(bufn) is None
    assert decode_data_message(bufn, legacy_empty_string_null=True) is None
    # and the flag threads through tuple decode
    tup = encode_tuple({"a": "", "b": "y"}, {"a": "string", "b": "string"})
    assert decode_tuple(tup) == {"a": "", "b": "y"}
    assert decode_tuple(tup, legacy_empty_string_null=True) == {"a": None, "b": "y"}
