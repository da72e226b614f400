"""Boundary behavior: k > |table|, dimension mismatch, unknown distance,
empty inputs — the engine must degrade, never NULL-poison or crash."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adampro_spark.operators.scan import DISTANCE_COL, sequential_scan

SF = "/root/testdata/sf0.001"
Q64 = [round(0.1 * ((i * 7) % 13) - 0.5, 4) for i in range(64)]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_k_larger_than_table(emb):
    small = emb.limit(7)
    res = sequential_scan(small, "embedding", Q64, 100, "euclidean", pk="vec_id")
    assert res.count() == 7


def test_unknown_distance_raises(emb):
    with pytest.raises(ValueError):
        sequential_scan(emb, "embedding", Q64, 5, "not_a_distance", pk="vec_id")


def test_query_dimension_mismatch_yields_finite_distances(emb):
    # shorter query: zip_with pads nulls; the fold coalesces them to 0 —
    # common-prefix semantics (ElementwiseSummedDistanceFunction loops the
    # shorter length), never NULL distances that would sort first
    res = sequential_scan(emb, "embedding", Q64[:16], 5, "manhattan", pk="vec_id")
    rows = res.collect()
    assert len(rows) == 5
    assert all(r[DISTANCE_COL] is not None and r[DISTANCE_COL] >= 0 for r in rows)


def test_empty_table_knn(spark, emb):
    empty = emb.filter(F.lit(False))
    res = sequential_scan(empty, "embedding", Q64, 5, "euclidean", pk="vec_id")
    assert res.count() == 0


def test_index_on_empty_table_raises(spark, emb):
    from adampro_spark.index.va import build_va

    empty = emb.filter(F.lit(False))
    with pytest.raises(ValueError):
        build_va(empty, "embedding", pk="vec_id")


def test_knn_join_empty_queries(spark, emb):
    from adampro_spark.pipeline.simjoin import knn_join

    q = emb.filter(F.lit(False)).select(F.col("vec_id").alias("q_id"), "embedding")
    assert knn_join(emb, q, "embedding", 3, "euclidean").count() == 0
