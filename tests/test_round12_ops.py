"""Round-12 extension operators: quality-aware dedup survivor selection
(``deduplicate(keep_by=)``), ordered session funnels (``session_funnel``),
and the per-document train/eval overlap report (``contamination_report``).
"""

from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# deduplicate(keep_by=)
# ---------------------------------------------------------------------------


def test_deduplicate_keep_by_best_copy(spark):
    from adampro_spark.pipeline.dedup import deduplicate

    corpus = spark.createDataFrame(
        [
            (1, 30), (2, 90), (3, 90),   # group A: best q=90, tie -> pk 2
            (10, 50), (11, 40),          # group B: best is pk 10
            (20, 5),                     # singleton, never in pairs
        ],
        "doc_id long, q long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    kept = {
        r["doc_id"]
        for r in deduplicate(corpus, pairs, keep_by="q").collect()
    }
    assert kept == {2, 10, 20}
    # min-pk default unchanged
    legacy = {r["doc_id"] for r in deduplicate(corpus, pairs).collect()}
    assert legacy == {1, 10, 20}
    # keep="min" flips the policy (lowest q wins, tie min pk)
    low = {
        r["doc_id"]
        for r in deduplicate(corpus, pairs, keep_by="q", keep="min").collect()
    }
    assert low == {1, 11, 20}
    with pytest.raises(ValueError, match="keep must be"):
        deduplicate(corpus, pairs, keep_by="q", keep="best")


def test_deduplicate_keep_by_null_scores(spark):
    """NULL scores never beat a real score; an all-NULL group falls back
    to the min-pk survivor."""
    from adampro_spark.pipeline.dedup import deduplicate

    corpus = spark.createDataFrame(
        [(1, None), (2, 7), (3, None), (10, None), (11, None)],
        "doc_id long, q long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    kept = {
        r["doc_id"]
        for r in deduplicate(corpus, pairs, keep_by="q").collect()
    }
    assert kept == {2, 10}


# ---------------------------------------------------------------------------
# session_funnel
# ---------------------------------------------------------------------------


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, event_type string"
    )


def test_session_funnel_ordered_chaining(spark):
    from adampro_spark.streaming.ingest import session_funnel

    t0 = datetime(2024, 1, 1)

    def at(m):
        return t0 + timedelta(minutes=m)

    rows = [
        # u1 session 1: full funnel in order
        (1, "u1", at(0), "view"), (2, "u1", at(1), "click"),
        (3, "u1", at(2), "purchase"),
        # u1 session 2 (90 min later): click before view -> depth 1 only
        (4, "u1", at(95), "click"), (5, "u1", at(96), "view"),
        # u2: view then purchase, no click -> depth 1
        (6, "u2", at(0), "view"), (7, "u2", at(3), "purchase"),
        # u3: simultaneous view+click -> the tie must NOT chain (depth 1)
        (8, "u3", at(0), "view"), (9, "u3", at(0), "click"),
        # u4: NULL ts -> no session, excluded entirely
        (10, "u4", None, "view"),
    ]
    out = {
        r["step_idx"]: (r["step"], r["n_sessions"])
        for r in session_funnel(
            _ev(spark, rows), steps=["view", "click", "purchase"]
        ).collect()
    }
    # sessions: u1/s1, u1/s2, u2, u3 = 4 with a view
    assert out[1] == ("view", 4)
    assert out[2] == ("click", 1)   # only u1/s1 chains a later click
    assert out[3] == ("purchase", 1)
    with pytest.raises(ValueError, match="non-empty"):
        session_funnel(_ev(spark, rows), steps=[])


def test_session_funnel_gap_splits_sessions(spark):
    """The same user's view and click separated by more than the gap land
    in DIFFERENT sessions — no cross-session chaining."""
    from adampro_spark.streaming.ingest import session_funnel

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, "u1", t0, "view"),
        (2, "u1", t0 + timedelta(minutes=90), "click"),
    ]
    out = {
        r["step"]: r["n_sessions"]
        for r in session_funnel(
            _ev(spark, rows), steps=["view", "click"]
        ).collect()
    }
    assert out == {"view": 1, "click": 0}
    merged = {
        r["step"]: r["n_sessions"]
        for r in session_funnel(
            _ev(spark, rows), steps=["view", "click"], gap="2 hours"
        ).collect()
    }
    assert merged == {"view": 1, "click": 1}


def test_session_funnel_matches_sql_mirror_on_real_events(spark):
    """The driver-row formulation (unrolled min-ts chain in DuckDB over
    the shared session SQL) must agree on the real events table."""
    import duckdb

    from adampro_spark.oracle_suite import _FUNNEL_STEPS, _funnel_sql
    from adampro_spark.session import load_tables
    from adampro_spark.streaming.ingest import session_funnel

    ev = load_tables(spark, "/root/testdata/sf0.001")["events"]
    got = {
        r["step_idx"]: r["n_sessions"]
        for r in session_funnel(ev, steps=list(_FUNNEL_STEPS)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "'/root/testdata/sf0.001/events.parquet'"
    )
    want = {
        n // 1_000_000: n % 1_000_000
        for _step, n in con.execute(_funnel_sql()).fetchall()
    }
    assert got == want


# ---------------------------------------------------------------------------
# contamination_report
# ---------------------------------------------------------------------------


def test_contamination_report_counts_and_decontaminate_consistency(spark):
    from adampro_spark.pipeline.mix import contamination_report, decontaminate

    train = spark.createDataFrame(
        [
            (1, "a b c d e f"),       # windows: abc bcd cde def (n=3)
            (2, "x y z"),             # one window, clean
            (3, "c d e"),             # exactly the planted eval gram
            (4, "zz"),                # shorter than n: one full-seq gram
            (5, None),                # NULL text: zero grams
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame([("c d e",), ("q r s",)], "text string")
    rep = {
        r["doc_id"]: (r["n_grams"], r["n_matched"], r["contamination"])
        for r in contamination_report(train, eval_df, n=3).collect()
    }
    assert rep[1] == (4, 1, round(1 / 4, 6))
    # review r12: a REPETITIVE document counts window OCCURRENCES, not
    # distinct grams — 'c d e c d e c d e' has 7 windows of which
    # 'c d e' occurs 3 times (positions 0, 3, 6)
    repet = spark.createDataFrame(
        [(9, "c d e c d e c d e")], "doc_id long, text string"
    )
    for method in ("semi", "bloom"):
        r9 = contamination_report(repet, eval_df, n=3, method=method).collect()[0]
        assert (r9["n_grams"], r9["n_matched"]) == (7, 3), method
    assert rep[2] == (1, 0, 0.0)
    assert rep[3] == (1, 1, 1.0)
    assert rep[4] == (1, 0, 0.0)
    assert rep[5] == (0, 0, 0.0)
    kept = {
        r["doc_id"] for r in decontaminate(train, eval_df, n=3).collect()
    }
    flagged = {d for d, (_, m, _) in rep.items() if m > 0}
    assert kept == set(rep) - flagged  # report ⇔ drop consistency


def test_contamination_report_bloom_matches_semi(spark, docs=None):
    from adampro_spark.pipeline.mix import contamination_report
    from adampro_spark.session import load_tables
    from adampro_spark.pipeline.text import tokens_expr

    corpus = load_tables(spark, "/root/testdata/sf0.001")["documents"]
    eval_df = corpus.filter(F.col("doc_id") % 25 == 0).select(
        F.concat_ws(" ", F.slice(tokens_expr("text"), 5, 5)).alias("text")
    )
    semi = {
        r["doc_id"]: (r["n_grams"], r["n_matched"])
        for r in contamination_report(corpus, eval_df, n=5).collect()
    }
    bloom = {
        r["doc_id"]: (r["n_grams"], r["n_matched"])
        for r in contamination_report(
            corpus, eval_df, n=5, method="bloom"
        ).collect()
    }
    assert set(semi) == set(bloom)
    over = 0
    for d in semi:
        assert bloom[d][0] == semi[d][0], d          # window counts exact
        assert bloom[d][1] >= semi[d][1], d          # FP only over-counts
        over += bloom[d][1] - semi[d][1]
    # fpp=1e-6 over a few thousand windows: expected over-count ~0
    assert over <= 2, over


def test_contamination_report_bloom_plan_is_map_only(spark):
    from adampro_spark.pipeline.mix import contamination_report
    from adampro_spark.session import load_tables

    corpus = load_tables(spark, "/root/testdata/sf0.001")["documents"]
    eval_df = corpus.limit(3).select("text")
    plan = (
        contamination_report(corpus, eval_df, n=5, method="bloom")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "Exchange" not in plan
    assert "ArrowEvalPython" in plan


def test_contamination_report_empty_eval(spark):
    from adampro_spark.pipeline.mix import contamination_report

    train = spark.createDataFrame(
        [(1, "a b c d"), (2, None)], "doc_id long, text string"
    )
    empty = train.limit(0).select("text")
    for method in ("semi", "bloom"):
        rep = {
            r["doc_id"]: (r["n_grams"], r["n_matched"])
            for r in contamination_report(
                train, empty, n=3, method=method
            ).collect()
        }
        assert rep[1][1] == 0 and rep[2] == (0, 0), method
    with pytest.raises(ValueError, match="method must be"):
        contamination_report(train, empty, method="hash").collect()


def test_curate_dedup_keep_by(spark):
    """curate(dedup_keep_by=) keeps the best-scored near-dup copy; the
    exact mode rejects the knob (member choice is immaterial there)."""
    from adampro_spark.pipeline.curate import curate

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away to the hills where it finds a quiet place to sleep all day "
        "long before returning home at night for a warm dinner with friends"
    )
    rows = [
        (1, base, 10),
        (2, base + " extra", 90),   # near-dup of 1, higher score
        (3, "completely different words about ships sailing the wide "
            "ocean under bright stars while the crew sings old songs and "
            "the captain studies maps of distant islands and hidden coves "
            "planning the long voyage home across the endless sea", 50),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, score long")
    kept, rep = curate(
        df, langs=None, min_tokens=5, min_quality=0.0,
        dedup="minhash", dedup_threshold=0.6, dedup_keep_by="score",
    )
    ids = {r["doc_id"] for r in kept.collect()}
    assert ids == {2, 3}
    assert rep["n_dup_dropped"] == 1
    legacy, _ = curate(
        df, langs=None, min_tokens=5, min_quality=0.0,
        dedup="minhash", dedup_threshold=0.6,
    )
    assert {r["doc_id"] for r in legacy.collect()} == {1, 3}
    with pytest.raises(ValueError, match="near-dup modes"):
        curate(df, langs=None, dedup="exact", dedup_keep_by="score")


def test_split_dataset_grouped_is_leakage_safe(spark):
    """split_dataset(by=): every member of a near-dup family (labeled by
    dup_groups' survivor) lands in the SAME split — the structural fix
    for train/test leakage; NULL group keys split independently."""
    from adampro_spark.pipeline.dedup import dup_groups
    from adampro_spark.pipeline.mix import split_dataset

    # 60 families of 5 docs each, chained pairs
    pairs = spark.createDataFrame(
        [(f * 100 + i, f * 100 + i + 1) for f in range(60) for i in range(4)],
        "id_a long, id_b long",
    )
    fam = dup_groups(pairs)  # (id, survivor)
    docs = spark.createDataFrame(
        [(f * 100 + i,) for f in range(60) for i in range(5)]
        + [(90_000 + j,) for j in range(40)],  # unpaired rows
        "doc_id long",
    )
    labeled = docs.join(
        fam.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    ).withColumn("family", F.col("survivor").cast("string"))
    out = split_dataset(
        labeled, {"train": 0.6, "val": 0.2, "test": 0.2}, by="family"
    )
    fam_splits = (
        out.filter(F.col("family").isNotNull())
        .groupBy("family")
        .agg(F.count_distinct("split").alias("k"))
    )
    assert fam_splits.filter(F.col("k") > 1).count() == 0  # no straddling
    # with enough families, more than one split is actually populated
    used = {r["split"] for r in out.select("split").distinct().collect()}
    assert len(used) >= 2
    # NULL-family rows follow their own pk coin — identical to ungrouped
    solo = {
        r["doc_id"]: r["split"]
        for r in out.filter(F.col("family").isNull()).collect()
    }
    plain = {
        r["doc_id"]: r["split"]
        for r in split_dataset(
            docs.filter(F.col("doc_id") >= 90_000),
            {"train": 0.6, "val": 0.2, "test": 0.2},
        ).collect()
    }
    assert solo == plain
    # determinism under repartitioning
    again = {
        (r["doc_id"], r["split"])
        for r in split_dataset(
            labeled.repartition(13), {"train": 0.6, "val": 0.2, "test": 0.2},
            by="family",
        ).collect()
    }
    assert again == {(r["doc_id"], r["split"]) for r in out.collect()}


# ---------------------------------------------------------------------------
# radius_scan (range similarity search)
# ---------------------------------------------------------------------------


def test_radius_scan_semantics(spark):
    from adampro_spark.operators import radius_scan
    from adampro_spark.operators.scan import sequential_scan

    rows = [
        (1, [0.0, 0.0]), (2, [3.0, 4.0]),      # d=5 exactly (boundary)
        (3, [1.0, 0.0]), (4, [10.0, 0.0]), (5, None),
    ]
    df = spark.createDataFrame(rows, "ap_id long, v array<double>")
    got = radius_scan(df, "v", [0.0, 0.0], 5.0).collect()
    # boundary INCLUSIVE; ascending; NULL vector never matches
    assert [(r["ap_id"], r["ap_distance"]) for r in got] == [
        (1, 0.0), (3, 1.0), (2, 5.0),
    ]
    # limit caps with TakeOrderedAndProject semantics
    top = radius_scan(df, "v", [0.0, 0.0], 5.0, limit=2).collect()
    assert [r["ap_id"] for r in top] == [1, 3]
    # agrees with kNN on the same ordering for k = |matches|
    knn3 = sequential_scan(df, "v", [0.0, 0.0], 3).collect()
    assert [r["ap_id"] for r in knn3] == [r["ap_id"] for r in got]
    # unordered mode returns the same SET
    fast = radius_scan(df, "v", [0.0, 0.0], 5.0, ordered=False).collect()
    assert {r["ap_id"] for r in fast} == {1, 2, 3}


def test_radius_scan_plan_is_filter_not_topk(spark):
    """The range scan must be a codegen FILTER — no TakeOrderedAndProject
    / sort node unless ordered output or a limit is requested."""
    from adampro_spark.operators import radius_scan
    from adampro_spark.session import load_tables

    emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"]
    q = [0.0] * len(emb.select("embedding").first()["embedding"])
    plan_fast = (
        radius_scan(emb, "embedding", q, 3.0, pk="vec_id", ordered=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" not in plan_fast
    assert "Sort" not in plan_fast and "Exchange" not in plan_fast
    plan_lim = (
        radius_scan(emb, "embedding", q, 3.0, pk="vec_id", limit=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan_lim


def test_ops_radius_with_predicates(spark):
    """The facade composes BooleanFilterScan with the range scan."""
    import os

    from adampro_spark.ops import AdamOps
    from adampro_spark.session import load_tables

    emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"]
    ops = AdamOps(spark, os.path.join("/root/repo/_scratch", "radcat"))
    from adampro_spark.oracle_suite import QVEC

    res = ops.query.radius(
        "embeddings_ext", "embedding", QVEC, 3.2, "euclidean",
        predicates=[("label", "!=", [0])], df=emb, pk="vec_id",
    ).collect()
    assert all(r["ap_distance"] <= 3.2 for r in res)
    labels = {
        r["vec_id"]: r["label"]
        for r in emb.select("vec_id", "label").collect()
    }
    assert all(labels[r["vec_id"]] != 0 for r in res)
    assert len(res) > 0


def test_ecp_radius_exact_vs_brute(spark):
    """Triangle-inequality cell pruning must reproduce the brute range
    scan EXACTLY (metric distances), while genuinely pruning cells."""
    import numpy as np

    from adampro_spark.index.ecp import METRIC_DISTANCES, build_ecp, ecp_radius
    from adampro_spark.operators.scan import radius_scan
    from adampro_spark.session import load_tables

    emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"]
    q = [0.1] * len(emb.select("embedding").first()["embedding"])
    for dn in ("euclidean", "manhattan"):
        index_df, meta = build_ecp(
            emb, "embedding", pk="vec_id", distance_name=dn, autofit=False
        )
        index_df = index_df.cache()
        assert len(meta["radii"]) == len(meta["leaders"])
        for r in (2.0, 3.0, 3.5):
            brute = {
                (x["vec_id"], x["ap_distance"])
                for x in radius_scan(emb, "embedding", q, r, dn, pk="vec_id")
                .collect()
            }
            accel = {
                (x["vec_id"], x["ap_distance"])
                for x in ecp_radius(emb, "embedding", index_df, meta, q, r)
                .collect()
            }
            assert accel == brute, (dn, r)
        index_df.unpersist()
    # pruning actually happens on a separable corpus: two tight clusters
    # far apart, query inside one -> the other cluster's cells fail the
    # d(q, leader) <= r + cell_radius bound
    rng = np.random.RandomState(5)
    pts = [(i, (rng.standard_normal(8) * 0.1).tolist()) for i in range(200)]
    pts += [
        (200 + i, (rng.standard_normal(8) * 0.1 + 50.0).tolist())
        for i in range(200)
    ]
    sep = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    idx2, meta2 = build_ecp(
        sep, "embedding", pk="vec_id", distance_name="euclidean",
        autofit=False,
    )
    from adampro_spark.index._util import np_distance

    d2 = np_distance(np.zeros(8), np.array(meta2["leaders"]), "euclidean")
    pruned = (d2 > 2.0 + np.array(meta2["radii"])).sum()
    assert pruned > 0
    near = {
        x["vec_id"]
        for x in ecp_radius(sep, "embedding", idx2, meta2, [0.0] * 8, 2.0)
        .collect()
    }
    assert near == set(range(200))  # whole near cluster, nothing missed
    # non-metric distances refuse (the bound does not hold)
    index_df, meta = build_ecp(
        emb, "embedding", pk="vec_id", distance_name="cosine", autofit=False
    )
    with pytest.raises(NotImplementedError, match="metric"):
        ecp_radius(emb, "embedding", index_df, meta, q, 0.5)


def test_ecp_radius_legacy_meta_probes_all_cells(spark):
    """An index persisted before radii were recorded stays CORRECT —
    every cell probed (no pruning), same answer."""
    from adampro_spark.index.ecp import build_ecp, ecp_radius
    from adampro_spark.operators.scan import radius_scan
    from adampro_spark.session import load_tables

    emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"]
    q = [0.1] * len(emb.select("embedding").first()["embedding"])
    index_df, meta = build_ecp(
        emb, "embedding", pk="vec_id", autofit=False
    )
    legacy = {k: v for k, v in meta.items() if k != "radii"}
    brute = {
        x["vec_id"]
        for x in radius_scan(emb, "embedding", q, 3.0, pk="vec_id").collect()
    }
    got = {
        x["vec_id"]
        for x in ecp_radius(emb, "embedding", index_df, legacy, q, 3.0)
        .collect()
    }
    assert got == brute


def test_emit_packed_follows_shuffle_order(spark):
    """shuffle -> pack(order_col) -> emit: each emitted pack's text is
    its members' text joined IN THE SHUFFLE ORDER; provenance pks align;
    NULL text joins as empty."""
    from adampro_spark.pipeline.mix import (
        emit_packed,
        pack_sequences,
        shuffle_dataset,
    )

    rows = [(i, f"doc{i}" if i != 7 else None, 40) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_tokens int")
    shuffled = shuffle_dataset(df, key_col="_ord")
    packs = pack_sequences(shuffled, budget=100, num_shards=2, order_col="_ord")
    out = emit_packed(packs)
    rows_by_pack = {}
    for r in packs.collect():
        rows_by_pack.setdefault(r["pack_id"], []).append(
            (r["pack_pos"], r["doc_id"], r["text"])
        )
    got = {r["pack_id"]: r for r in out.collect()}
    assert set(got) == set(rows_by_pack)
    for pid, mem in rows_by_pack.items():
        mem.sort()
        want_pks = [d for _, d, _ in mem]
        want_text = "\n\n".join((t if t is not None else "") for _, _, t in mem)
        assert got[pid]["pks"] == want_pks, pid
        assert got[pid]["text"] == want_text, pid
        assert got[pid]["n_docs"] == len(mem), pid
