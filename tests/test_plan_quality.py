"""Plan-shape assertions: the physical plans must stay the ones that
survive a 100× scale-up — filters pushed into the Parquet scan, column
pruning at the reader, top-k as TakeOrderedAndProject (per-partition heap,
no global sort), broadcast for small join sides."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adampro_spark.operators.scan import boolean_filter, project, sequential_scan

SF = "/root/testdata/sf0.001"
Q = [round(0.1 * ((i * 7) % 13) - 0.5, 4) for i in range(64)]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_predicates_reach_parquet_scan(docs):
    plan = _plan(boolean_filter(docs, [("lang", "=", ["en"]), ("n_chars", ">", [100])]))
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "lang" in pushed and "n_chars" in pushed, plan


def test_projection_prunes_columns(docs):
    plan = _plan(project(docs, ["doc_id", "lang"]))
    read = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "doc_id" in read and "lang" in read
    assert "text" not in read, "projection must not read the text column"


def test_knn_is_take_ordered_not_global_sort(emb):
    plan = _plan(sequential_scan(emb, "embedding", Q, 10, "manhattan", pk="vec_id"))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan, "global sort would shuffle all rows"


def test_small_prefilter_broadcasts(spark, emb):
    ids = spark.createDataFrame([(i,) for i in range(40)], "vec_id long")
    res = sequential_scan(emb, "embedding", Q, 5, "manhattan", prefilter=ids, pk="vec_id")
    res.collect()  # AQE re-plans at runtime; inspect the FINAL plan
    plan = _plan(res)
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_bm25_dfreq_is_aggregate_not_term_window(docs):
    """verdict r9 #1: df(t) must be a map-side-combinable
    groupBy(term).count() broadcast-joined back — NEVER a
    Window.partitionBy(term), which funnels a hot term's entire posting
    list through one window task at 100 TB."""
    from adampro_spark.index.persist import FEATURE_COL
    from adampro_spark.operators.fulltext import build_text_index, text_search_indexed

    postings, meta = build_text_index(docs, "text", pk="doc_id")
    res = text_search_indexed(postings, meta, ["spark", "query"], scoring="bm25")
    # scope to the query-time plan: the cached build plan (below the
    # InMemoryRelation boundary) legitimately has a per-DOCUMENT window
    # for doc length (bounded partitions — a doc's distinct-term count)
    plan = _plan(res).split("InMemoryRelation")[0]
    assert "Window" not in plan, f"term-partitioned window in BM25 plan:\n{plan}"
    assert "BroadcastHashJoin" in plan, plan
    postings.unpersist()


def test_distance_stays_jvm_side(emb):
    # the distance expression must evaluate JVM-side (higher-order
    # functions are CodegenFallback, so no WholeStageCodegen node — but
    # crucially no BatchEvalPython row-at-a-time Python boundary either)
    plan = _plan(sequential_scan(emb, "embedding", Q, 10, "euclidean", pk="vec_id"))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
