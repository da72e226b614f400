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
