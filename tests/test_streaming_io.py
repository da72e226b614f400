"""Streaming extension, entity import/export, planner training."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    from adampro_spark.session import load_tables

    return load_tables(spark, SF)["events"]


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # file-source streams need a DIRECTORY of files
    import shutil

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF}/events.parquet", d / "part-000.parquet")
    return str(d)


def test_windowed_stats_stream_matches_batch(spark, events, events_dir, tmp_path):
    """The streaming run (availableNow over the parquet dir) must produce
    exactly the batch aggregation — late-data watermarking included."""
    from adampro_spark.streaming.ingest import stream_events, windowed_event_stats

    batch = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in windowed_event_stats(events).collect()
    }

    stream = stream_events(spark, events_dir)
    assert stream.isStreaming
    q = (
        windowed_event_stats(stream)
        .writeStream.format("memory")
        .queryName("win_stats")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_stats").collect()
    }
    assert got == batch


def test_stream_insert_entity(spark, events, events_dir, tmp_path):
    from adampro_spark.ops import AdamOps
    from adampro_spark.streaming.ingest import stream_events, stream_insert_entity

    ops = AdamOps(spark, str(tmp_path / "cat"))
    ops.entity.create(
        "ev",
        [("event_id", "long"), ("user_id", "long"), ("event_type", "string"),
         ("value", "double")],
    )
    ent = ops.entity.get("ev")
    stream = stream_events(spark, events_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    q = stream_insert_entity(stream, ent, str(tmp_path / "ck2"))
    q.awaitTermination(120)
    assert ent.count() == events.count()
    # PKs unique across micro-batches (bit-packed batch counter)
    assert ent.df().select("ap_id").distinct().count() == events.count()


def test_stream_dedup_across_microbatches(spark, tmp_path):
    """Cross-batch exact dedup: a copy arriving in a LATER micro-batch
    must be dropped (streaming dropDuplicates state), and the survivor
    set must equal the batch dropDuplicates result."""
    from adampro_spark.streaming.ingest import stream_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    half = docs.count() // 2
    first = docs.filter(F.col("doc_id") < half)
    # second file: the rest PLUS copies of the first half under new ids
    second = docs.filter(F.col("doc_id") >= half).unionByName(
        first.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    d = tmp_path / "stream"
    d.mkdir()
    first.coalesce(1).write.parquet(str(d / "f0"))
    second.coalesce(1).write.parquet(str(d / "f1"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*/")
    )
    q = (
        stream_dedup(stream, "text")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT doc_id FROM dedup_out").collect()
    ids = {r["doc_id"] for r in out}
    assert len(out) == docs.count()  # every distinct text once
    assert not {i for i in ids if i >= 1_000_000}  # late copies dropped


def test_stream_dedup_with_ts_drops_different_ts_copies(spark, tmp_path):
    """ADVICE r5 (low): with ``ts_col`` the dedup keys on the fingerprint
    ALONE (dropDuplicatesWithinWatermark) — a copy arriving later with a
    DIFFERENT timestamp is still dropped, while watermarking keeps the
    state bounded."""
    from adampro_spark.streaming.ingest import stream_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    base = docs.limit(50).withColumn(
        "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id"))
    )
    # copies: same text, NEW ids, ts shifted +1h — under (fingerprint, ts)
    # keying these survived; under key-only they must be dropped
    copies = base.withColumn("doc_id", F.col("doc_id") + 1_000_000).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 1 HOUR")
    )
    d = tmp_path / "tsdedup"
    d.mkdir()
    base.coalesce(1).write.parquet(str(d / "f0"))
    copies.coalesce(1).write.parquet(str(d / "f1"))

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*/")
    )
    q = (
        stream_dedup(stream, "text", ts_col="ts", watermark="1 day")
        .writeStream.format("memory")
        .queryName("tsdedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_ts"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM tsdedup_out").collect()}
    assert len(ids) == 50
    assert not {i for i in ids if i >= 1_000_000}  # different-ts copies dropped


def test_progressive_knn_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState progressive kNN: after the stream drains,
    the k smallest rows across bucket states equal the batch sequential
    scan exactly."""
    from adampro_spark.operators.scan import DISTANCE_COL, sequential_scan
    from adampro_spark.streaming.ingest import progressive_knn_stream

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    Q = [round(0.1 * ((i * 7) % 13) - 0.5, 4) for i in range(64)]
    k = 10

    d = tmp_path / "estream"
    d.mkdir()
    emb.filter(F.col("vec_id") % 2 == 0).coalesce(1).write.parquet(str(d / "f0"))
    emb.filter(F.col("vec_id") % 2 == 1).coalesce(1).write.parquet(str(d / "f1"))

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>, label int")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*/")
    )
    # bounded replay: opt out of the (default, finite) TTL so the
    # availableNow trigger can self-terminate with full-history state
    res = progressive_knn_stream(
        stream, "embedding", Q, k, "euclidean", pk="vec_id", nbuckets=8,
        state_ttl_ms=None,
    )
    q = (
        res.writeStream.format("memory")
        .queryName("prog_knn")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update-mode memory sink appends refreshed bucket states; the final
    # state per (bucket, vec_id) is the LAST row — take min distance per
    # vec_id (distances are stable across refreshes for the same row),
    # then the global k smallest
    rows = spark.sql(
        "SELECT vec_id, min(ap_distance) AS d FROM prog_knn GROUP BY vec_id"
    ).collect()
    got = sorted(((r["d"], r["vec_id"]) for r in rows))[:k]
    want = [
        (r[DISTANCE_COL], r["vec_id"])
        for r in sequential_scan(emb, "embedding", Q, k, "euclidean", pk="vec_id").collect()
    ]
    assert [(round(d, 6), v) for d, v in got] == [
        (round(d, 6), v) for d, v in want
    ]


def test_progressive_knn_stream_default_ttl_is_finite(spark, tmp_path):
    """VERDICT r5 item 5: the scale-safe behavior is opt-OUT — default
    args must arm ProcessingTimeTimeout (finite 24 h TTL); only an
    explicit ``state_ttl_ms=None`` keeps unbounded full-history state."""
    from adampro_spark.streaming.ingest import progressive_knn_stream

    d = tmp_path / "ttl_default"
    d.mkdir()
    spark.read.parquet(f"{SF}/embeddings.parquet").limit(4).coalesce(
        1
    ).write.parquet(str(d / "f0"))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>, label int")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*/")
    )
    Q = [0.0] * 64
    default_plan = (
        progressive_knn_stream(stream, "embedding", Q, 5, pk="vec_id")
        ._jdf.queryExecution().analyzed().toString()
    )
    assert "ProcessingTimeTimeout" in default_plan
    optout_plan = (
        progressive_knn_stream(
            stream, "embedding", Q, 5, pk="vec_id", state_ttl_ms=None
        )
        ._jdf.queryExecution().analyzed().toString()
    )
    assert "ProcessingTimeTimeout" not in optout_plan


def test_progressive_knn_stream_state_ttl_evicts_idle_buckets(spark, tmp_path):
    """With ``state_ttl_ms``, a bucket that receives no rows for the TTL is
    EVICTED (processing-time timeout) — state stays bounded on an unbounded
    stream instead of keeping every bucket forever.  Feed two micro-batches
    with DISJOINT bucket sets and a tiny TTL: the second batch must remove
    the first batch's now-idle buckets, so the final state row count is
    strictly below the total number of buckets ever touched."""
    from adampro_spark.streaming.ingest import progressive_knn_stream

    nbuckets = 16
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with_bucket = emb.withColumn(
        "_b", F.pmod(F.xxhash64(F.col("vec_id")), F.lit(nbuckets)).cast("int")
    )
    lo = with_bucket.filter(F.col("_b") < nbuckets // 2).drop("_b")
    hi = with_bucket.filter(F.col("_b") >= nbuckets // 2).drop("_b")
    n_lo = lo.select(
        F.countDistinct(F.pmod(F.xxhash64("vec_id"), F.lit(nbuckets)))
    ).first()[0]
    n_hi = hi.select(
        F.countDistinct(F.pmod(F.xxhash64("vec_id"), F.lit(nbuckets)))
    ).first()[0]
    assert n_lo > 0 and n_hi > 0

    d = tmp_path / "ttl_stream"
    d.mkdir()
    lo.coalesce(1).write.parquet(str(d / "f0"))
    hi.coalesce(1).write.parquet(str(d / "f1"))

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>, label int")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*/")
    )
    Q = [round(0.1 * ((i * 7) % 13) - 0.5, 4) for i in range(64)]
    res = progressive_knn_stream(
        stream, "embedding", Q, 5, "euclidean", pk="vec_id",
        nbuckets=nbuckets, state_ttl_ms=1,
    )
    # NOTE: with ProcessingTimeTimeout the stateful operator always asks
    # for another (possibly no-data) batch to fire pending timeouts, so an
    # availableNow query never self-terminates — poll the progress buffer
    # for the eviction and stop the query explicitly.
    q = (
        res.writeStream.format("memory")
        .queryName("prog_knn_ttl")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_ttl"))
        .trigger(availableNow=True)
        .start()
    )
    import time

    removed = updated = 0
    seen: set[int] = set()
    deadline = time.time() + 90
    try:
        while time.time() < deadline:
            for p in q.recentProgress:
                if p["batchId"] in seen or not p["stateOperators"]:
                    continue
                seen.add(p["batchId"])
                removed += p["stateOperators"][0]["numRowsRemoved"]
                updated += p["stateOperators"][0]["numRowsUpdated"]
            if removed >= n_lo + n_hi:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert updated >= n_lo + n_hi, "both micro-batches must have updated state"
    # every bucket eventually idles past the TTL and must be evicted
    assert removed >= n_lo + n_hi, f"evicted {removed} < {n_lo + n_hi}"


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv", "orc", "avro"])
def test_entity_export_import_roundtrip(spark, tmp_path, fmt):
    from adampro_spark.io_ops import export_entity, import_entity
    from adampro_spark.ops import AdamOps

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(50)
    ops = AdamOps(spark, str(tmp_path / "cat"))
    attrs = [("vec_id", "long"), ("embedding", "vector"), ("label", "int")]
    ops.entity.create("src", attrs)
    ops.entity.insert("src", emb)
    src = ops.entity.get("src")

    if fmt == "avro":
        # spark-avro is external to the pyspark wheel; the wrapper must
        # either work (deployed cluster) or raise its documented hint
        try:
            export_entity(src, str(tmp_path / "out_avro"), "avro")
        except Exception as e:
            assert "avro" in str(e).lower()
            pytest.skip("spark-avro module not deployed in this env")

    export_entity(src, str(tmp_path / f"out_{fmt}"), fmt)
    dst = import_entity(
        spark, ops.catalog, f"dst_{fmt}", attrs, str(tmp_path / f"out_{fmt}"), fmt
    )
    a = {r["vec_id"]: (r["label"], tuple(r["embedding"])) for r in src.df().collect()}
    b = {r["vec_id"]: (r["label"], tuple(r["embedding"])) for r in dst.df().collect()}
    assert a == b


def test_entity_jdbc_roundtrip(spark, tmp_path):
    """JDBC storage-engine roundtrip (PostgresqlEngine.scala:23-30) via the
    EMBEDDED Derby driver bundled with Spark — same Spark JDBC source and
    dialect machinery as a Postgres deployment, no network dependency
    (documented substitution: the sandbox has no database server)."""
    from adampro_spark.io_ops import export_entity_jdbc, import_entity_jdbc
    from adampro_spark.ops import AdamOps

    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(40)
    ops = AdamOps(spark, str(tmp_path / "cat"))
    attrs = [("vec_id", "long"), ("embedding", "vector"), ("label", "int")]
    ops.entity.create("srcj", attrs)
    ops.entity.insert("srcj", emb)
    src = ops.entity.get("srcj")

    export_entity_jdbc(src, url, "emb_t", properties=props)
    dst = import_entity_jdbc(
        spark, ops.catalog, "dstj", attrs, url, "emb_t", properties=props
    )
    a = {r["vec_id"]: (r["label"], tuple(r["embedding"])) for r in src.df().collect()}
    b = {r["vec_id"]: (r["label"], tuple(r["embedding"])) for r in dst.df().collect()}
    assert a == b

    # partitioned (range-parallel) read path
    dst2 = import_entity_jdbc(
        spark, ops.catalog, "dstj2", attrs, url, "emb_t", properties=props,
        partitionColumn="vec_id", lowerBound="0", upperBound="1000",
        numPartitions="4",
    )
    assert dst2.count() == src.count()


def test_train_planner_scores_and_optimized_hint(spark, tmp_path):
    from adampro_spark.ops import AdamOps, plan_knn, train_planner

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [round(0.1 * ((i * 7) % 13) - 0.5, 4) for i in range(64)]
    ops = AdamOps(spark, str(tmp_path / "cat"))
    ops.index.create_from_df("e_vaf", "emb", emb, "embedding", "vaf", pk="vec_id")
    ops.index.create_from_df("e_pq", "emb", emb, "embedding", "pq", pk="vec_id")

    scores = train_planner(ops, "emb", "embedding", q, 10, "euclidean", df=emb, pk="vec_id")
    assert set(scores) == {"e_vaf", "e_pq", "sequential"}
    assert all(0.0 <= s["recall"] <= 1.0 and s["score"] > 0 for s in scores.values())
    assert ops.catalog.index("e_vaf")["score"] is not None
    assert ops.catalog.entity("emb").get("seq_score") is not None

    plan = plan_knn(ops.catalog, "emb", "embedding", "euclidean", hints=("optimized",))
    best = max(scores, key=lambda n: scores[n]["score"])
    assert plan.path == best
    assert any("score" in r for r in plan.reasons)

    # review r6: sequential is a first-class scored path — when every
    # index scores worse, "optimized" must route to it
    for n in ("e_vaf", "e_pq"):
        ops.catalog.update_index_fields(n, score=0.01)
    ops.catalog.update_entity("emb", seq_score=0.9)
    plan2 = plan_knn(ops.catalog, "emb", "embedding", "euclidean", hints=("optimized",))
    assert plan2.path == "sequential"
    assert any("sequential (score" in r for r in plan2.reasons)


def test_storage_handler_registry(spark, tmp_path):
    """StorageManager.scala:19-52: named engines behind one read/write
    surface; missing handler errors instead of silent fallback; new
    engines register with one call."""
    from adampro_spark.io_ops import (
        StorageHandler,
        get_storage_handler,
        register_storage_handler,
    )

    df = spark.range(20).selectExpr("id", "concat('v', id) AS v")
    for name in ("parquet", "orc", "json"):
        h = get_storage_handler(name)
        p = str(tmp_path / f"sh_{name}")
        h.write(df, p)
        back = h.read(spark, p, schema=df.schema)
        assert sorted(r["id"] for r in back.collect()) == list(range(20))

    with pytest.raises(KeyError, match="no suitable storage handler"):
        get_storage_handler("cassandra")

    # plugging an 'engine' is one registration (how cassandra/hbase/solr
    # connectors would attach, by Spark DataSource format name)
    register_storage_handler(StorageHandler("myengine", "csv", options={"header": "true"}))
    h = get_storage_handler("myengine")
    p = str(tmp_path / "sh_custom")
    h.write(df, p)
    assert h.read(spark, p, schema=df.schema).count() == 20


def test_text_pipeline_runs_on_streams(spark, tmp_path):
    """Stream/batch unification for the LLM-pipeline text expressions:
    text_stats (+ langid) are map-only codegen'd expressions, so the SAME
    call runs in Structured Streaming unchanged and yields exactly the
    batch result — the shape that lets a 100 TB ingest score quality
    incrementally instead of re-scanning the corpus."""
    import shutil

    from adampro_spark.pipeline.text import langid_expr, text_stats

    src_dir = tmp_path / "docs_stream"
    src_dir.mkdir()
    shutil.copy(f"{SF}/documents.parquet", src_dir / "part-000.parquet")

    docs = spark.read.parquet(str(src_dir))
    batch = {
        r["doc_id"]: (r["n_tokens"], r["quality"])
        for r in text_stats(docs).collect()
    }

    stream = spark.readStream.schema(docs.schema).parquet(str(src_dir))
    out = text_stats(stream.withColumn("lang_guess", langid_expr("text")))
    q = (
        out.writeStream.format("memory")
        .queryName("txtstream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["n_tokens"], r["quality"])
        for r in spark.table("txtstream").collect()
    }
    assert got == batch and got


def test_stream_dedup_simhash_drops_reordered_copies(spark, tmp_path):
    """method='simhash' keys the streaming dedup state on the token-order-
    invariant SimHash: a later micro-batch carrying token-SHUFFLED copies
    (different exact hash, same simhash) must be dropped, while exact mode
    keeps them."""
    import random

    from adampro_spark.streaming.ingest import stream_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    first = docs.filter(F.col("doc_id") < 100)
    rng = random.Random(7)

    def shuffle_tokens(t):
        toks = t.split()
        rng.shuffle(toks)
        return " ".join(toks)

    rows = [
        (r["doc_id"] + 1_000_000, shuffle_tokens(r["text"]))
        for r in first.collect()
    ]
    second = spark.createDataFrame(rows, "doc_id long, text string")

    d = tmp_path / "sh_stream"
    d.mkdir()
    first.coalesce(1).write.parquet(str(d / "f0"))
    second.coalesce(1).write.parquet(str(d / "f1"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*/")
    )
    q = (
        stream_dedup(stream, "text", method="simhash")
        .writeStream.format("memory")
        .queryName("sh_dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_sh"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM sh_dedup_out").collect()}
    survivors_high = {i for i in ids if i >= 1_000_000}
    # every shuffled copy collides with its original on simhash (identical
    # token multisets — the collision is exact, not probabilistic) and the
    # original arrived in the earlier batch, so no copy survives
    assert not survivors_high, sorted(survivors_high)[:5]
    # some ORIGINALS also collide with each other (template-generated
    # synthetic docs share token distributions) — assert stream == batch
    # semantics rather than a fixed count
    batch = spark.read.parquet(f"{d}/*/")
    batch_simhash = stream_dedup(batch, "text", method="simhash").count()
    assert len(ids) == batch_simhash
    assert len(ids) <= 100

    # exact mode is ORDER-SENSITIVE: the same corpus keeps both versions
    assert stream_dedup(batch, "text", method="exact").count() == 200


def test_stream_curate_gates_match_batch(spark, tmp_path):
    """The curation gates are stateless column expressions, so the SAME
    gate_flags() dict must drive a streaming ingest filter and produce
    exactly the batch curate(dedup=None) survivor set."""
    from adampro_spark.pipeline.curate import curate, gate_flags

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    src = str(tmp_path / "curate_src")
    docs.repartition(3).write.parquet(src)

    kw = dict(langs=("en",), min_tokens=10, min_quality=0.2)
    batch_out, _ = curate(docs, dedup=None, **kw)
    want = {r["doc_id"] for r in batch_out.select("doc_id").collect()}

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    flags = gate_flags("text", **kw)
    gated = stream
    for name, expr in flags.items():
        gated = gated.withColumn(name, expr)
    import functools
    import operator

    gated = gated.filter(
        functools.reduce(operator.and_, [F.col(n) for n in flags])
    ).select("doc_id")
    q = (
        gated.writeStream.format("memory")
        .queryName("curated_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_curate"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM curated_stream").collect()}
    assert got == want and got


def test_stream_curate_matches_batch_curate(spark, tmp_path):
    """stream_curate (gates + cross-batch exact dedup) over micro-batched
    files must equal batch curate(dedup='exact') survivors on the same
    corpus — including a duplicate pair SPLIT ACROSS batches."""
    from adampro_spark.pipeline.curate import curate
    from adampro_spark.streaming.ingest import stream_curate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    dup = docs.orderBy("doc_id").limit(5).withColumn(
        "doc_id", F.col("doc_id") + 5_000_000
    )
    src = str(tmp_path / "scurate_src")
    # batch 1: originals; batch 2: byte-identical copies under high ids
    docs.coalesce(1).write.parquet(src)
    dup.coalesce(1).write.mode("append").parquet(src)

    kw = dict(langs=("en",), min_tokens=10, min_quality=0.2)
    batch_out, _ = curate(
        docs.unionByName(dup), dedup="exact", **kw
    )
    want = {r["doc_id"] for r in batch_out.select("doc_id").collect()}

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    gated = stream_curate(stream, dedup="exact", **kw).select("doc_id")
    q = (
        gated.writeStream.format("memory")
        .queryName("stream_curated")
        .option("checkpointLocation", str(tmp_path / "ckpt_sc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM stream_curated").collect()}
    # survivor CHOICE differs (batch keeps min-pk, stream keeps first
    # arrival) but the survivor COUNT and the gated universe must agree;
    # with originals arriving first, the sets coincide exactly
    assert got == want and got


def test_stream_curate_redact_and_repetition_match_batch(spark, tmp_path):
    """Round 7: redaction + repetition gates are stateless expressions,
    so stream_curate with them must produce EXACTLY batch curate's
    survivors and redacted texts."""
    from adampro_spark.pipeline.curate import curate
    from adampro_spark.streaming.ingest import stream_curate

    base = (
        "this is a perfectly ordinary document with enough distinct tokens "
        "to pass every gate including length and it keeps going onwards"
    )
    rows = [
        (1, base),
        (2, base + " write to leak@example.com or call (415) 555-1234"),
        (3, "buy now best price deal " * 30),
        (4, base.replace("ordinary", "different")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "scrub_src")
    df.repartition(2).write.parquet(src)

    kw = dict(
        langs=None, min_tokens=5, min_quality=0.0,
        max_top_2gram_char_frac=0.2, redact=True,
    )
    batch_out, report = curate(df, dedup=None, **kw)
    want = {r["doc_id"]: r["text"] for r in batch_out.collect()}
    assert 3 not in want and "[EMAIL]" in want[2] and "[PHONE]" in want[2]

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = stream_curate(stream, dedup=None, **kw)
    q = (
        out.writeStream.format("memory")
        .queryName("scrubbed_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_scrub"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["text"]
        for r in spark.sql("SELECT doc_id, text FROM scrubbed_stream").collect()
    }
    assert got == want


def test_stream_curate_full_ceiling_table_matches_batch(spark, tmp_path):
    """Round 8: the COMPLETE Gopher repetition table (extended signals +
    the pushdown barrier on _rep_ok) runs per micro-batch with exactly
    batch curate's survivors — and the per-batch plan keeps the staged
    gram columns instead of inlining them (the O(T^3) regression)."""
    import numpy as np

    from adampro_spark.pipeline.curate import (
        GOPHER_REPETITION_CEILINGS, curate,
    )
    from adampro_spark.streaming.ingest import stream_curate

    rng = np.random.RandomState(29)
    vocab = [f"w{i}" for i in range(300)]
    rows = [(i, " ".join(rng.choice(vocab, size=40))) for i in range(10)]
    rows += [
        (100, " ".join(["spam ham eggs toast jam bread"] * 12)),
        (101, ("para one unique\n\n" + "same para\n\n" * 6).strip()),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "gopher_src")
    df.repartition(2).write.parquet(src)

    kw = dict(
        langs=None, min_tokens=5, min_quality=0.0,
        repetition_ceilings=GOPHER_REPETITION_CEILINGS,
    )
    batch_out, rep = curate(df, dedup=None, **kw)
    want = {r["doc_id"] for r in batch_out.select("doc_id").collect()}
    assert want == set(range(10)) and rep["n_repetitive"] == 2

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = stream_curate(stream, dedup=None, **kw).select("doc_id")
    q = (
        out.writeStream.format("memory")
        .queryName("gopher_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_gopher"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["doc_id"]
        for r in spark.sql("SELECT doc_id FROM gopher_stream").collect()
    }
    assert got == want


def test_stream_dedup_custom_key_canonical_url(spark, tmp_path):
    """stream_dedup(key_col=...) dedups on ANY stateless expression —
    URL-level crawl dedup via canonical_url_expr, cross-micro-batch,
    equal to the batch run of the same code."""
    from adampro_spark.pipeline.scrub import canonical_url_expr
    from adampro_spark.streaming.ingest import stream_dedup

    rows = [
        (1, "http://a.com/page?utm_source=x", "text one"),
        (2, "HTTP://WWW.A.com:80/page", "text two"),      # same page
        (3, "http://a.com/page#top", "text three"),       # same page
        (4, "http://a.com/other", "text four"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    batch = stream_dedup(df, key_col=canonical_url_expr("url"))
    kept_batch = {r["doc_id"] for r in batch.select("doc_id").collect()}
    assert len(kept_batch) == 2 and 4 in kept_batch
    assert len(kept_batch & {1, 2, 3}) == 1

    # micro-batched: duplicates SPLIT ACROSS batches must still collapse
    src = str(tmp_path / "urls")
    df.filter(F.col("doc_id") <= 2).repartition(1).write.parquet(src)
    df.filter(F.col("doc_id") > 2).repartition(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, url string, text string"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        stream_dedup(stream, key_col=canonical_url_expr("url"))
        .writeStream.format("memory").queryName("url_dedup_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]
        for r in spark.sql("SELECT doc_id FROM url_dedup_stream").collect()
    }
    assert len(got) == 2 and 4 in got and len(got & {1, 2, 3}) == 1


def test_stream_dedup_custom_key_null_urls_not_collapsed(spark):
    """review r9.2: NULL keys must never dedup against each other —
    distinct documents with NULL urls all survive; fully identical rows
    still collapse."""
    from adampro_spark.pipeline.scrub import canonical_url_expr
    from adampro_spark.streaming.ingest import stream_dedup

    rows = [
        (1, None, "doc one"),
        (2, None, "doc two"),
        (3, None, "doc two"),           # fully identical to... no: id differs
        (4, "http://a.com/x", "doc four"),
        (5, "http://a.com/x?utm_source=s", "doc five"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = stream_dedup(df, key_col=canonical_url_expr("url"))
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert {1, 2, 3} <= kept                 # distinct NULL-url docs survive
    assert len(kept & {4, 5}) == 1           # canonical dup collapses


# ---------------------------------------------------------------------------
# round 11: stream-static as-of enrichment (streaming/ingest.stream_asof)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def asof_sides(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    left = spark.createDataFrame(
        [
            (i, f"k{rng.randint(5)}" if rng.rand() > 0.1 else None,
             float(rng.uniform(0, 1e5)))
            for i in range(400)
        ],
        "lid long, k string, ts double",
    )
    # unique right timestamps per key (ties are the documented batch-vs-
    # stream tie-break difference, excluded like the oracle rows do)
    ref = spark.createDataFrame(
        [
            (f"k{i % 6}", float(1000 * j + i), int(i * 100 + j))
            for i in range(6)
            for j in range(40)
        ],
        "k string, ts double, payload long",
    )
    return left, ref


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_stream_asof_batch_parity_with_asof_join(spark, asof_sides, direction):
    """stream_asof on a BATCH frame must equal batch asof_join row for
    row (keyed + unkeyed, with and without tolerance) — the same
    adjudication pattern as every other streaming operator here."""
    from adampro_spark.pipeline.temporal import asof_join
    from adampro_spark.streaming.ingest import stream_asof

    left, ref = asof_sides
    key = lambda df, ks=("lid",): sorted(  # noqa: E731
        (tuple(r[k] for k in ks), r["ts_right"], r["payload"])
        for r in df.collect()
    )
    for tol in (None, 5000.0):
        want = asof_join(left, ref, time_col="ts", by="k",
                         right_cols=["payload"], direction=direction,
                         tolerance=tol)
        got = stream_asof(left, ref, time_col="ts", by="k",
                          right_cols=["payload"], direction=direction,
                          tolerance=tol)
        assert key(got) == key(want), (direction, tol, "keyed")
        want_u = asof_join(left.drop("k"), ref.drop("k"), time_col="ts",
                           right_cols=["payload"], direction=direction,
                           tolerance=tol)
        got_u = stream_asof(left.drop("k"), ref.drop("k"), time_col="ts",
                            right_cols=["payload"], direction=direction,
                            tolerance=tol)
        assert key(got_u) == key(want_u), (direction, tol, "unkeyed")


def test_stream_asof_runs_on_a_real_stream(spark, asof_sides, tmp_path):
    """The same expression graph must run as an actual micro-batched
    readStream (two source files -> two micro-batches) and produce the
    batch answer."""
    from adampro_spark.streaming.ingest import stream_asof

    left, ref = asof_sides
    src = tmp_path / "asof_src"
    rows = left.collect()
    spark.createDataFrame(rows[:200], left.schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "b0"))
    spark.createDataFrame(rows[200:], left.schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "b1"))
    stream = (
        spark.readStream.schema(left.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = stream_asof(stream, ref, time_col="ts", by="k",
                      right_cols=["payload"])
    q = (
        out.writeStream.format("memory")
        .queryName("asof_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "asof_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["lid"], r["ts_right"], r["payload"])
        for r in spark.sql("SELECT * FROM asof_stream").collect()
    }
    want = {
        (r["lid"], r["ts_right"], r["payload"])
        for r in stream_asof(left, ref, time_col="ts", by="k",
                             right_cols=["payload"]).collect()
    }
    assert got == want


def test_stream_asof_per_key_history_guard(spark):
    """A reference key above max_rows_per_key fails with a clear message
    (one key's history lands in ONE array cell — the explosion-guard
    family); below the cap it works."""
    from adampro_spark.streaming.ingest import stream_asof

    left = spark.createDataFrame([(1, "hot", 50.0)], "lid long, k string, ts double")
    ref = spark.createDataFrame(
        [("hot", float(i), i) for i in range(200)],
        "k string, ts double, payload long",
    )
    with pytest.raises(Exception, match="max_rows_per_key"):
        stream_asof(left, ref, by="k", max_rows_per_key=100).collect()
    row = stream_asof(left, ref, by="k", max_rows_per_key=200).collect()[0]
    assert row["payload"] == 50 and row["ts_right"] == 50.0


# ---------------------------------------------------------------------------
# sessionize_events (round 11: native session windows, batch == stream)
# ---------------------------------------------------------------------------


def test_sessionize_merge_semantics(spark):
    from datetime import datetime

    from adampro_spark.streaming.ingest import sessionize_events

    rows = [
        # user 1: gap EXACTLY 60s merges (boundary inclusive); 61s splits
        (1, datetime(2024, 1, 1, 0, 0, 0), 1.0),
        (1, datetime(2024, 1, 1, 0, 1, 0), 2.0),
        (1, datetime(2024, 1, 1, 0, 2, 1), 4.0),
        # user 2: single burst
        (2, datetime(2024, 1, 1, 0, 0, 0), 1.0),
        (2, datetime(2024, 1, 1, 0, 0, 59), 1.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in sessionize_events(df, gap="1 minute").collect()
    }
    from datetime import datetime as dt

    assert out == {
        (1, dt(2024, 1, 1, 0, 0, 0), dt(2024, 1, 1, 0, 2, 0)): (2, 3.0),
        (1, dt(2024, 1, 1, 0, 2, 1), dt(2024, 1, 1, 0, 3, 1)): (1, 4.0),
        (2, dt(2024, 1, 1, 0, 0, 0), dt(2024, 1, 1, 0, 1, 59)): (2, 2.0),
    }


def test_sessionize_stream_matches_batch(spark, tmp_path):
    from adampro_spark.session import load_tables
    from adampro_spark.streaming.ingest import sessionize_events, stream_events

    ev = load_tables(spark, "/root/testdata/sf0.001")["events"].select(
        "event_id", "ts", "user_id", "value"
    )
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize_events(ev, gap="30 minutes").collect()
    }
    src = str(tmp_path / "sess_src")
    # several files -> several micro-batches; sessions must still merge
    # across them through the state store.  The fixture's files are NOT
    # in time order, so the watermark must cover the full span — a
    # tight watermark would (correctly) drop late rows as late data
    ev.repartition(3).write.parquet(src)
    stream = stream_events(spark, src)
    q = (
        sessionize_events(stream.select("event_id", "ts", "user_id", "value"),
                          gap="30 minutes", watermark="365 days")
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }
    assert got == batch


def test_windowed_event_stats_hopping(spark):
    from datetime import datetime

    from adampro_spark.streaming.ingest import windowed_event_stats

    rows = [
        (datetime(2024, 1, 1, 0, 10), "click", 1.0),
        (datetime(2024, 1, 1, 0, 40), "click", 2.0),
    ]
    df = spark.createDataFrame(rows, ["ts", "event_type", "value"])
    out = {
        (r["window_start"], r["n"])
        for r in windowed_event_stats(df, window="1 hour", slide="30 minutes").collect()
    }
    from datetime import datetime as dt

    # each event lands in 2 hopping windows; the [23:30-00:30) and
    # [00:30-01:30) windows hold one each, [00:00-01:00) holds both
    assert out == {
        (dt(2023, 12, 31, 23, 30), 1),
        (dt(2024, 1, 1, 0, 0), 2),
        (dt(2024, 1, 1, 0, 30), 1),
    }
    # tumbling default unchanged
    t = windowed_event_stats(df, window="1 hour").collect()
    assert len(t) == 1 and t[0]["n"] == 2


def test_assign_sessions_matches_sessionize(spark):
    """Per-event session ordinals are consistent with the session-window
    stats: same number of sessions per user, same per-session event
    counts, boundary-inclusive gap; NULL ts gets NULL session."""
    from datetime import datetime

    from adampro_spark.session import load_tables
    from adampro_spark.streaming.ingest import assign_sessions, sessionize_events

    ev = load_tables(spark, "/root/testdata/sf0.001")["events"].select(
        "event_id", "ts", "user_id", "value"
    )
    assigned = assign_sessions(ev, gap="30 minutes")
    agg = (
        assigned.groupBy("user_id", "session_idx")
        .count()
        .filter(F.col("session_idx").isNotNull())
    )
    stats = sessionize_events(ev, gap="30 minutes")
    a = sorted(
        (r["user_id"], r["count"]) for r in agg.collect()
    )
    s = sorted((r["user_id"], r["n_events"]) for r in stats.collect())
    assert a == s
    # fixture: exact-gap merge + NULL handling
    rows = [
        (1, 10, datetime(2024, 1, 1, 0, 0, 0)),
        (2, 10, datetime(2024, 1, 1, 0, 1, 0)),   # exactly gap -> same
        (3, 10, datetime(2024, 1, 1, 0, 2, 1)),   # gap+1s -> new
        (4, 10, None),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    out = {r["event_id"]: r["session_idx"]
           for r in assign_sessions(df, gap="1 minute").collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: None}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="gap"):
        assign_sessions(df, gap="whenever")


def test_sessionize_without_value_col(spark):
    from datetime import datetime

    from adampro_spark.streaming.ingest import sessionize_events

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1)), (1, datetime(2024, 1, 2))], ["user_id", "ts"]
    )
    out = sessionize_events(df, gap="1 hour", value_col=None).collect()
    assert len(out) == 2 and "total_value" not in out[0].asDict()
    assert all(r["n_events"] == 1 for r in out)
