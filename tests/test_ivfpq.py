"""IVF-PQ composite index (index/ivfpq.py): recall vs brute force,
probe monotonicity, persisted partition pruning, lifecycle + planner."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adampro_spark.index.ivfpq import build_ivfpq, ivfpq_knn, scan_ivfpq
from adampro_spark.operators.scan import DISTANCE_COL, sequential_scan

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    # unpersist on teardown: cached scans outlive the module in the
    # session CacheManager and can mask other modules' pushdown asserts
    df = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding")
        .cache()
    )
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def query(emb):
    return [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]


@pytest.fixture(scope="module")
def built(emb):
    return build_ivfpq(emb, "embedding", pk="vec_id", seed=7)


def _recall(got_df, want_ids, k):
    got = [r["vec_id"] for r in got_df.collect()]
    return len(set(got) & set(want_ids)) / k


def test_ivfpq_recall_and_exact_distances(emb, query, built):
    """Recall scales with the probed fraction (the synthetic near-uniform
    64-dim corpus is the IVF worst case, so the floors are modest at the
    default 20% budget and strict at wider ones), and every returned
    distance must be the EXACT distance (candidates refine through the
    sequential scan, never the ADC estimate)."""
    idx, meta = built
    k = 10
    exact = sequential_scan(emb, "embedding", query, k, "euclidean", pk="vec_id")
    want = {r["vec_id"]: r[DISTANCE_COL] for r in exact.collect()}
    got = ivfpq_knn(emb, "embedding", idx, meta, query, k)  # frac="auto" = 0.2
    assert _recall(got, list(want), k) >= 0.4
    wide = ivfpq_knn(emb, "embedding", idx, meta, query, k, frac=0.5)
    assert _recall(wide, list(want), k) >= 0.7
    for r in got.collect():
        if r["vec_id"] in want:
            assert abs(r[DISTANCE_COL] - want[r["vec_id"]]) < 1e-6


def test_ivfpq_recall_rises_with_nprobe(emb, query, built):
    idx, meta = built
    k = 10
    exact_ids = [
        r["vec_id"]
        for r in sequential_scan(
            emb, "embedding", query, k, "euclidean", pk="vec_id"
        ).collect()
    ]
    recs = [
        _recall(
            ivfpq_knn(emb, "embedding", idx, meta, query, k, nprobe=np_),
            exact_ids, k,
        )
        for np_ in (1, 4, len(meta["leaders"]))
    ]
    assert recs[0] <= recs[1] <= recs[2]
    assert recs[2] >= 0.9  # probing every cell ~ flat PQ + exact refine


def test_ivfpq_residual_codes_beat_cell_surrogate(built, emb, query):
    """The ADC estimate orders candidates within a cell (cells alone
    cannot): with nprobe=1 the top candidate set is cell-local but still
    distance-ordered by the residual tables — scan output must be sorted
    by the estimated distance."""
    idx, meta = built
    res = scan_ivfpq(idx, meta, query, 5, nprobe=2).collect()
    ds = [r[DISTANCE_COL] for r in res]
    assert ds == sorted(ds) and len(ds) > 0


def test_ivfpq_lifecycle_partition_pruning(spark, emb, query, tmp_path):
    """create_from_df('ivfpq') persists partitioned by cell on disk; the
    probe filter must reach the persisted scan as a PartitionFilter
    (only the probed cells' files are read), and the loaded index must
    answer with high recall through the query surface."""
    import glob
    import os

    from adampro_spark.ops import AdamOps

    ops = AdamOps(spark, str(tmp_path / "cat"))
    ops.index.create_from_df(
        "iv_idx", "iv_emb", emb, "embedding", "ivfpq", pk="vec_id"
    )
    path = ops.catalog.index_path("iv_idx")
    assert len(glob.glob(os.path.join(path, "ap_cell=*"))) > 1

    # frac=1.0 probes every cell: this test is about the LIFECYCLE
    # (persist, reload, layout), not the budget/recall trade
    res = ops.query.index("iv_idx", query, 10, "euclidean", df=emb, frac=1.0)
    exact = sequential_scan(emb, "embedding", query, 10, "euclidean", pk="vec_id")
    got = {r["vec_id"] for r in res.collect()}
    want = {r["vec_id"] for r in exact.collect()}
    assert len(got & want) >= 9

    idx_df, meta = ops.index.load("iv_idx")
    scan = idx_df.filter(F.col("ap_cell").isin([0, 1]))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "ap_cell" in plan.split("PartitionFilters")[1][:200]


def test_ivfpq_rejects_non_euclidean(emb, query, built):
    idx, meta = built
    with pytest.raises(ValueError, match="euclidean"):
        ivfpq_knn(emb, "embedding", idx, meta, query, 5, distance_name="cosine")


def test_ivfpq_k_exceeds_corpus(spark, emb, query, built):
    """k > n with every cell probed returns the whole corpus exactly
    once, distances exact-sorted."""
    idx, meta = built
    n = emb.count()
    res = ivfpq_knn(emb, "embedding", idx, meta, query, n + 50, frac=1.0)
    rows = res.collect()
    assert len(rows) == n
    ds = [r[DISTANCE_COL] for r in rows]
    assert ds == sorted(ds)


def test_ivfpq_prefilter_budgets_against_filtered_counts(spark, emb, query, built):
    """Round-6 review finding: with a selective prefilter the takeWhile
    must budget against the FILTERED per-cell populations (the eCP
    rule) — else the probe stops after a cell or two and recall
    collapses.  A 10%-selective prefilter must still return k exact-
    refined rows from the eligible set with decent overlap."""
    idx, meta = built
    k = 10
    eligible = emb.filter(F.col("vec_id") % 10 == 0)
    pre = eligible.select("vec_id")
    exact = {
        r["vec_id"]
        for r in sequential_scan(
            eligible, "embedding", query, k, "euclidean", pk="vec_id"
        ).collect()
    }
    got_rows = ivfpq_knn(
        emb, "embedding", idx, meta, query, k, prefilter=pre, frac=0.5
    ).collect()
    got = {r["vec_id"] for r in got_rows}
    assert len(got_rows) == k
    assert got <= {r["vec_id"] for r in pre.collect()}  # only eligible rows
    assert len(got & exact) >= k // 2
