"""Same-source prefilter collapse (plans/rewrite.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adampro_spark.operators.scan import (
    DISTANCE_COL,
    boolean_filter,
    sequential_scan,
)
from adampro_spark.plans.rewrite import maybe_collapse_prefilter

SF = "/root/testdata/sf0.001"
Q = [round(0.1 * ((i * 7) % 13) - 0.5, 4) for i in range(64)]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_same_source_prefilter_collapses_to_single_scan(emb):
    pre = boolean_filter(emb, [("label", "=", [2])]).select("vec_id")
    res = sequential_scan(emb, "embedding", Q, 10, "manhattan", prefilter=pre, pk="vec_id")
    plan = _plan(res)
    assert "Join" not in plan, plan  # no self semi-join
    # result identical to the explicit-predicate scan
    direct = sequential_scan(
        boolean_filter(emb, [("label", "=", [2])]), "embedding", Q, 10, "manhattan", pk="vec_id"
    )
    key = lambda df: [  # noqa: E731
        (r["vec_id"], round(r[DISTANCE_COL], 6)) for r in df.collect()
    ]
    assert key(res) == key(direct)


def test_foreign_prefilter_keeps_semijoin(spark, emb):
    ids = spark.createDataFrame([(i,) for i in range(50)], "vec_id long")
    res = sequential_scan(emb, "embedding", Q, 10, "manhattan", prefilter=ids, pk="vec_id")
    assert "Join" in _plan(res)
    assert all(r["vec_id"] < 50 for r in res.collect())


def test_aliased_pk_prefilter_not_collapsed(emb):
    # pk aliased from another column — membership would change if inlined
    pre = emb.filter(F.col("label") == 2).select(F.col("label").cast("long").alias("vec_id"))
    out, collapsed = maybe_collapse_prefilter(emb, pre, "vec_id")
    assert not collapsed


def test_derived_column_filter_not_collapsed(emb):
    pre = (
        emb.withColumn("_dd", F.col("vec_id") % 7)
        .filter(F.col("_dd") == 3)
        .select("vec_id")
    )
    out, collapsed = maybe_collapse_prefilter(emb, pre, "vec_id")
    if collapsed:
        # only acceptable if semantics survived the round-trip
        a = sorted(r["vec_id"] for r in out.select("vec_id").collect())
        b = sorted(r["vec_id"] for r in emb.join(pre, "vec_id", "left_semi").select("vec_id").collect())
        assert a == b
