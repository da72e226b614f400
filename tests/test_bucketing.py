"""Bucketed entity layout: co-located joins without an Exchange.

The 100 TB claim under test: two tables bucketed the same way on the
join key are sort-merge-joined with ZERO shuffle on either side — the
layout a repartition-only approach (the reference's RepartitionOp) can
only deliver within one job.
"""

import pytest

from adampro_spark.catalog import Catalog
from adampro_spark.entity import PK, Entity

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def ent(spark, tmp_path):
    cat = Catalog(str(tmp_path / "bcat"))
    e = Entity.create(spark, cat, "bents", [("val", "long"), ("tag", "string")])
    src = spark.range(500).selectExpr("id AS val", "concat('t', id % 7) AS tag")
    e.insert(src)
    return e


def _executed(df):
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketize_preserves_rows(ent):
    before = sorted(r["val"] for r in ent.df().collect())
    ent.bucketize(4)
    assert ent.catalog.entity(ent.name)["buckets"] == 4
    after = sorted(r["val"] for r in ent.df().collect())
    assert after == before


def test_bucketed_self_join_has_no_exchange(spark, ent):
    ent.bucketize(4)
    a = ent.df().select(PK, "val")
    b = ent.df().select(PK, "tag")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _executed(a.join(b, PK))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange" not in plan, plan[:800]


def test_unbucketed_join_does_shuffle(spark, ent):
    # control: the same join WITHOUT bucketing plans Exchanges
    a = ent.df().select(PK, "val")
    b = ent.df().select(PK, "tag")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _executed(a.join(b, PK))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange" in plan


def test_mutation_falls_back_to_plain_layout(ent):
    ent.bucketize(4)
    more = ent.spark.range(10).selectExpr("id + 1000 AS val", "'x' AS tag")
    ent.insert(more)
    rec = ent.catalog.entity(ent.name)
    assert not rec.get("buckets")
    assert ent.count() == 510


def test_bucketed_table_reregisters_after_session_drop(spark, ent):
    ent.bucketize(4)
    spark.sql(f"DROP TABLE IF EXISTS {ent._bucket_table_name()}")
    # a fresh session would hit the same path: catalog record -> CREATE TABLE
    assert ent.df().count() == 500
    assert spark.catalog.tableExists(ent._bucket_table_name())


def test_debucketize_roundtrip(ent):
    before = sorted(r["val"] for r in ent.df().collect())
    ent.bucketize(4)
    ent.debucketize()
    rec = ent.catalog.entity(ent.name)
    assert not rec.get("buckets")
    assert sorted(r["val"] for r in ent.df().collect()) == before


# ---------------------------------------------------------------------------
# bucketed INDEX tables (round-5): candidate -> refine with zero shuffle
# ---------------------------------------------------------------------------


@pytest.fixture()
def vec_ent(spark, tmp_path):
    cat = Catalog(str(tmp_path / "vcat"))
    e = Entity.create(spark, cat, "vents", [("feat", "vector"), ("label", "int")])
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    e.insert(emb.selectExpr("embedding AS feat", "label"))
    return e


def test_index_inherits_entity_buckets_and_join_is_exchange_free(spark, vec_ent):
    """create_index over a bucketized entity defaults to the same bucket
    count; the VA candidate set (a pure filter over the bucketed index
    scan) then sort-merge-joins the bucketed entity with ZERO shuffle
    Exchange — the refine pipeline no longer depends on the candidate set
    being broadcastable (the 100x scale case)."""
    from adampro_spark.index import persist as IP
    from adampro_spark.index.va import va_knn

    vec_ent.bucketize(4)
    idx, meta = IP.create_index(
        vec_ent.spark, vec_ent.catalog, "v_vaf", vec_ent.name,
        vec_ent.df(), "feat", "vaf", pk=PK,
    )
    assert meta["buckets"] == 4

    q = [0.1 * ((i * 7) % 13) - 0.5 for i in range(64)]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        res = va_knn(vec_ent.df(), "feat", idx, meta, q, 10, "manhattan")
        plan = _executed(res)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # broadcast exchanges remain (one-row LUTs, explicitly hinted); the
    # co-located layout must eliminate every SHUFFLE exchange
    assert "Exchange hashpartitioning" not in plan, plan[:1500]
    assert "SortMergeJoin" in plan
    assert res.count() == 10


def test_bucketed_index_reloads_and_matches_unbucketed(spark, vec_ent):
    from adampro_spark.index import persist as IP
    from adampro_spark.index.va import va_knn

    vec_ent.bucketize(4)
    IP.create_index(
        vec_ent.spark, vec_ent.catalog, "v_vaf2", vec_ent.name,
        vec_ent.df(), "feat", "vaf", pk=PK,
    )
    # fresh-session path: drop the session table, reload from the catalog
    spark.sql("DROP TABLE IF EXISTS adam_bucketed_idx_v_vaf2")
    idx, meta = IP.load_index(spark, vec_ent.catalog, "v_vaf2")
    assert spark.catalog.tableExists("adam_bucketed_idx_v_vaf2")

    q = [0.1 * ((i * 3) % 11) - 0.4 for i in range(64)]
    got = va_knn(vec_ent.df(), "feat", idx, meta, q, 10, "euclidean").collect()

    # control: the same index built unbucketed gives identical results
    plain = Entity(vec_ent.spark, vec_ent.catalog, vec_ent.name)
    plain.debucketize()
    idx2, meta2 = IP.create_index(
        spark, vec_ent.catalog, "v_vaf3", "other_ent",
        plain.df(), "feat", "vaf", pk=PK,
    )
    assert "buckets" not in meta2
    want = va_knn(plain.df(), "feat", idx2, meta2, q, 10, "euclidean").collect()
    assert [(r[PK], round(r["ap_distance"], 6)) for r in got] == [
        (r[PK], round(r["ap_distance"], 6)) for r in want
    ]


def test_rebucketize_preserves_data(spark, tmp_path):
    """Review r6: bucketize() on an already-bucketized entity dropped the
    bucketed table/dir BEFORE reading it — the second call destroyed the
    only copy of the data.  Re-bucketizing must move data back first."""
    from pyspark.sql import functions as F

    from adampro_spark.ops import AdamOps

    o = AdamOps(spark, str(tmp_path / "cat"))
    o.entity.create("rb", [("val", "int")])
    o.entity.insert(
        "rb", spark.createDataFrame([(i,) for i in range(100)], "val int")
    )
    o.entity.bucketize("rb", 4)
    o.entity.bucketize("rb", 8)  # used to destroy the data
    df = o.entity.get("rb").df()
    assert df.count() == 100
    assert df.agg(F.sum("val")).collect()[0][0] == sum(range(100))
