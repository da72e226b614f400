"""cluster_embeddings / fit_centroids / cluster_shares (pipeline/cluster.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from adampro_spark.pipeline.cluster import (
    cluster_embeddings,
    cluster_shares,
    fit_centroids,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(11)
    anchors = np.eye(6)[:3] * 8.0
    rows = [
        (i, (anchors[i % 3] + rng.standard_normal(6) * 0.1).tolist())
        for i in range(90)
    ]
    rows += [(90, None), (91, [0.0] * 6)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_fixed_centroid_assignment_matches_numpy(spark, corpus):
    cents = corpus.filter(
        F.col("vec_id").isin(0, 1, 2)
    ).orderBy("vec_id")
    out, Cn = cluster_embeddings(corpus, centroids=cents)
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in corpus.filter(F.col("embedding").isNotNull()).collect()
    }
    for vid, v in vecs.items():
        v = np.asarray(v)
        n = np.linalg.norm(v)
        if n <= 1e-12:
            assert got[vid] is None
            continue
        assert got[vid] == int(np.argmax(Cn @ (v / n))), vid
    assert got[90] is None and got[91] is None
    # anchors are separated: members of group g all land with centroid g
    for vid in range(3, 90):
        assert got[vid] == vid % 3


def test_fitted_centroids_recover_groups(spark, corpus):
    out, Cn = cluster_embeddings(corpus, n_clusters=3, sample_size=200)
    assert Cn.shape[0] == 3
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    # same-anchor rows co-cluster; different anchors split
    for g in range(3):
        members = {got[v] for v in range(90) if v % 3 == g}
        assert len(members) == 1
    assert len({got[g] for g in range(3)}) == 3


def test_centroid_matrix_reusable_on_second_corpus(spark, corpus):
    _out, Cn = cluster_embeddings(corpus, n_clusters=3, sample_size=200)
    second = corpus.filter(F.col("vec_id") < 6)
    out2, Cn2 = cluster_embeddings(second, centroids=Cn)
    assert np.allclose(Cn, Cn2)
    got = {r["vec_id"]: r["cluster"] for r in out2.collect()}
    full = {
        r["vec_id"]: r["cluster"]
        for r in cluster_embeddings(corpus, centroids=Cn)[0].collect()
    }
    assert all(got[v] == full[v] for v in got)


def test_cluster_shares(spark, corpus):
    out, _ = cluster_embeddings(corpus, n_clusters=3, sample_size=200)
    shares = {r["cluster"]: r for r in cluster_shares(out).collect()}
    # 90 usable rows over 3 clusters + one NULL bucket of 2
    assert sum(r["n"] for r in shares.values()) == 92
    assert shares[None]["n"] == 2
    assert abs(sum(r["share"] for r in shares.values()) - 1.0) < 1e-6


def test_fit_raises_on_unusable_corpus(spark):
    df = spark.createDataFrame(
        [(1, None), (2, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="no usable vectors"):
        fit_centroids(df)
