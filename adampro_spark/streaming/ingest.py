"""Structured Streaming extension (SURVEY §2.9).

The reference has NO stream processing — its "streaming" endpoints are
transport-level chunking of inserts/results (``DataQuery.scala:173-247``,
``streamInsert`` ``DataDefintion.scala:170``), and SURVEY §2.9 records
that for parity nothing is required.  This module is the north-star
extension a training-data pipeline actually needs: continuous ingest into
entities, and watermarked windowed aggregation over the ``events`` table
shape.

Spark-first: ``readStream`` file sources → the same column expressions as
batch → ``writeStream`` with ``foreachBatch`` for entity appends (reusing
the bit-packed PK insert path) or a plain sink for aggregates.  Every
query here also runs in batch mode (the DataFrame code is shared), which
is how the correctness tests adjudicate the streaming results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType | None = None,
    nanos_cols: list[str] | None = None,
) -> DataFrame:
    """File-source stream over a directory of event parquet files.

    ``maxFilesPerTrigger=1`` keeps micro-batches bounded; the schema is
    explicit (streams cannot infer) and DERIVED from the first file's
    parquet footer so it always matches the batch read of the same files
    — including the timestamp unit: TIMESTAMP(NANOS) columns arrive as
    long under ``nanosAsLong`` and are restored to micros exactly like
    session.load_tables; micros columns stream through untouched.
    (Hardcoding either unit breaks when the data generator switches —
    observed: the synthetic events table moved from nanos to micros.)
    """
    import glob
    import os

    from adampro_spark.session import _nanos_timestamp_cols

    # "**" with recursive=True already matches top-level files — no
    # second flat glob needed (review r6: the `or` fallback was dead)
    files = sorted(
        glob.glob(os.path.join(source_dir, "**", "*.parquet"), recursive=True)
    )
    ns_cols: list[str] = list(nanos_cols or [])
    if schema is None:
        if files:
            schema = spark.read.parquet(files[0]).schema
            if nanos_cols is None:
                ns_cols = _nanos_timestamp_cols(files[0])
        else:
            # EMPTY-DIR START: nothing to derive from — the default
            # schema assumes micros timestamps, so a producer writing
            # TIMESTAMP(NANOS) files later WILL mis-read.  Pass schema=
            # and nanos_cols= explicitly for an empty-source start
            # (review r6: the derive-from-footer contract only holds when
            # at least one file exists before the stream starts).
            schema = EVENT_SCHEMA
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # watermarks reject TIMESTAMP_NTZ event time — cast to session-tz
    # TIMESTAMP (UTC session: same wall-clock instants as the batch read)
    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 day",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling-window per-type stats with late-data handling.

    Works on a stream (watermark bounds state: windows older than
    ``watermark`` behind the max seen ``ts`` finalize and evict) AND on a
    batch DataFrame (watermark is a no-op there) — the batch run is the
    oracle for the streaming run.

    ``slide`` (optional) makes the windows HOPPING: a window of
    ``window`` length starts every ``slide`` (must evenly divide into
    sensible overlap; an event lands in ``window/slide`` windows — the
    standard smoothed-rate view).  ``None`` keeps tumbling windows.
    """
    w = (
        F.window("ts", window)
        if slide is None
        else F.window("ts", window, slide)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w").start.alias("window_start"),
            F.col("event_type"),
            F.col("n"),
            F.col("total_value"),
        )
    )


def sessionize_events(
    events: DataFrame,
    gap: str = "30 minutes",
    by: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
    watermark: str = "1 day",
    max_events_per_session: int | None = None,
) -> DataFrame:
    """Per-key SESSION stats: consecutive events of one ``by`` key merge
    into a session while each inter-event gap is ≤ ``gap`` (boundary
    INCLUSIVE — an event exactly ``gap`` after the previous one merges;
    pinned empirically and in the oracle mirror); the session closes
    ``gap`` after its last event.  Returns one row per session:
    ``(by, session_start, session_end, n_events, total_value)``.

    Spark-first: ``F.session_window`` — the engine's NATIVE session
    operator, so the identical code runs on a batch DataFrame (the
    oracle path) and on a stream, where the watermark both finalizes
    sessions (a session emits once no earlier event can extend it) and
    bounds state.  One shuffle on the key, sessions merge inside the
    aggregation — no per-event window function, no self-join.

    Scale note: session merging is inherently sequential per key, so a
    single pathological key holding a large corpus fraction (a bot
    account) concentrates in one task — session analytics over USER
    keys is bounded by real user activity in practice; pre-filter known
    bot ids if that assumption breaks.

    ``max_events_per_session`` (round 13, verdict r12 #3): a no-gap bot
    stream forms ONE unbounded session — set a cap to turn that into a
    loud, actionable raise (the house assert-folded guard: the assert is
    folded into the emitted ``n_events`` so the optimizer can never
    prune it) instead of a silent mega-group.  Pre-filter the offending
    key or raise the cap for legitimately long sessions.
    """
    agg = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        agg.append(F.round(F.sum(value_col), 4).alias("total_value"))
    n_ev: Column = F.col("n_events")
    if max_events_per_session is not None:
        n_ev = n_ev + _session_cap_guard(
            F.col("n_events"), int(max_events_per_session),
            "sessionize_events",
        )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(by))
        .agg(*agg)
        .select(
            F.col(by),
            F.col("w").start.alias("session_start"),
            F.col("w").end.alias("session_end"),
            n_ev.alias("n_events"),
            *(["total_value"] if value_col is not None else []),
        )
    )


def _session_cap_guard(n: Column, cap: int, where: str) -> Column:
    """The house assert-folded session-size guard (the range_join
    ``max_buckets_per_interval`` pattern, temporal.py): 0 on the happy
    path, a loud named raise when one session exceeds ``cap`` events.
    Added into an emitted value so Catalyst can never prune it."""
    return F.coalesce(
        F.assert_true(
            n <= F.lit(int(cap)),
            F.concat(
                F.lit(f"{where}: a session holds "),
                n.cast("string"),
                F.lit(
                    f" events (> max_events_per_session={cap}); "
                    "pre-filter the offending key (a no-gap bot stream "
                    "forms one unbounded session) or raise the cap"
                ),
            ),
        ).cast("long"),
        F.lit(0),
    )


def assign_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    by: str = "user_id",
    ts_col: str = "ts",
    pk: str = "event_id",
    session_col: str = "session_idx",
    skew_threshold: "int | str | None" = "auto",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-EVENT session assignment: each row gains ``session_col`` —
    the 0-based ordinal of its session within its ``by`` key, under the
    same boundary-inclusive gap rule as :func:`sessionize_events` (join
    the two on ``(by, session_idx)`` ordinals match min-ts order).  Use
    this when downstream needs the events themselves labeled (session
    features, intra-session ordering); use :func:`sessionize_events`
    for the aggregated per-session view and for streams (a per-event
    label cannot stream: a late event can renumber history).

    Batch formulation: ``lag`` + cumulative sum over the per-key
    time-ordered window (ties broken by ``pk`` so the numbering is
    deterministic).  Rows with NULL ``ts`` get NULL session.

    ``skew_threshold`` (round 12 — verdict r11 #1, the same default-on
    count-then-route as ``asof_join``): a window partition is NOT
    splittable by AQE skew handling, so one bot account holding a large
    corpus fraction would serialize its lag/cumsum into a single task.
    ``"auto"`` (default) runs one map-side-combined per-key count and
    routes keys above ``max(ASOF_SKEW_MIN_ROWS, rows /
    shuffle.partitions)`` through a per-(key, time-bucket) two-phase
    carry: the lag needs only the previous event and the session ordinal
    is an ASSOCIATIVE prefix sum over break flags, so each bucket
    computes its local breaks/cumsum in parallel and a tiny per-(key,
    bucket) boundary table (last ts, break total per bucket — ≤
    #hot_keys × #buckets rows) supplies the boundary break and ordinal
    offset, broadcast back.  An ``int`` routes keys above that explicit
    count; ``None`` opts out (one window partition per key).  A
    detected-heavy NULL key routes through the same carry with the key
    dropped (all NULL keys form one window partition — the join-back on
    the key would drop NULLs, so the NULL leg joins on the bucket
    alone).  ``num_partitions`` sizes the time bucketing (defaults to
    ``spark.sql.shuffle.partitions``).
    """
    import re as _re

    from pyspark.sql import Window

    if not _re.fullmatch(
        r"\s*\d+\s*(second|minute|hour|day|week)s?\s*", str(gap)
    ):
        raise ValueError(f"cannot parse gap {gap!r} (use '<n> <unit>')")

    hot_vals: list = []
    null_hot = False
    if skew_threshold is not None:
        from adampro_spark.pipeline.temporal import _detect_hot_keys

        hot_vals, null_hot = _detect_hot_keys(events, by, skew_threshold)

    is_hot = None
    if hot_vals:
        is_hot = F.coalesce(F.col(by).isin(hot_vals), F.lit(False))
    if null_hot:
        null_pred = F.col(by).isNull()
        is_hot = null_pred if is_hot is None else (is_hot | null_pred)

    plain = events if is_hot is None else events.filter(~is_hot)
    w = Window.partitionBy(by).orderBy(ts_col, pk)
    prev = F.lag(ts_col).over(w)
    # interval arithmetic works on TIMESTAMP and TIMESTAMP_NTZ alike
    # (a double cast does not); boundary-INCLUSIVE like session_window
    brk = (F.col(ts_col) > prev + F.expr(f"INTERVAL {gap}")).cast("long")
    sid = F.sum(F.coalesce(brk, F.lit(0))).over(
        Window.partitionBy(by).orderBy(ts_col, pk).rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    out = plain.withColumn(
        session_col,
        F.when(F.col(ts_col).isNotNull(), sid).otherwise(F.lit(None)),
    )
    if hot_vals:
        hot_leg = _session_carry(
            events.filter(F.coalesce(F.col(by).isin(hot_vals), F.lit(False))),
            gap, [by], ts_col, pk, session_col, num_partitions,
        )
        out = out.unionByName(hot_leg.select(*out.columns))
    if null_hot:
        # the NULL-key group IS one window partition — same carry with
        # the key dropped from the bucket partitioning/join-back
        null_leg = _session_carry(
            events.filter(F.col(by).isNull()),
            gap, [], ts_col, pk, session_col, num_partitions,
        )
        out = out.unionByName(null_leg.select(*out.columns))
    return out


def _gap_timedelta(gap: str):
    """The validated ``'<n> <unit>'`` gap as a ``datetime.timedelta`` —
    used by the driver-side boundary prefix of the NULL-key carry leg
    (the per-bucket table is ≤ #buckets rows and already collected)."""
    import re as _re
    from datetime import timedelta

    m = _re.fullmatch(
        r"\s*(\d+)\s*(second|minute|hour|day|week)s?\s*", str(gap)
    )
    return timedelta(**{m.group(2) + "s": int(m.group(1))})


def _session_carry(
    events: DataFrame,
    gap: str,
    keys: list,
    ts_col: str,
    pk: str,
    session_col: str,
    num_partitions: int | None,
) -> DataFrame:
    """Two-phase session numbering for detected-heavy keys — the
    ``asof_join`` bucketed-carry shape (temporal.py ``_unkeyed_carry``)
    transplanted to lag/cumsum: window partitions become ``(key,
    time-bucket)`` so no key serializes into one task.

    Phase 1 (parallel): within each bucket, the ordinary lag → break
    flag → running sum, all local.  Phase 2 (boundary patch): one row
    per (key, bucket) — its first/last event time and local break total
    — is enough to stitch buckets, because the lag needs only the
    previous event and the ordinal is an associative prefix sum:
    ``offset(b) = Σ_{b'<b} breaks(b') + Σ_{b''≤b} boundary_break(b'')``
    where ``boundary_break(b)`` is the gap test between bucket ``b``'s
    first event and the newest event of any earlier bucket.  The
    boundary table is ≤ #hot_keys × #buckets rows, broadcast back.

    Bucket ids are a PURE FUNCTION of the row's time (quantile
    boundaries baked in as literals) — never ``spark_partition_id()``
    — for the same recomputation-consistency reason documented in
    temporal.py.  All ts ties share a bucket, so pk tie-breaking never
    crosses buckets.  Keyed legs stitch via a per-key window over the
    tiny boundary table; the unkeyed (NULL-key) leg computes the prefix
    driver-side over its ≤ #buckets collected rows (a global window —
    even over a constant partition key — trips WindowExec's
    no-partition warning; same choice as temporal ``_unkeyed_carry``).
    """
    from pyspark.sql import Window

    spark = events.sparkSession
    p = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    # TIMESTAMP_NTZ refuses a direct double cast; via TIMESTAMP first —
    # monotonic under the UTC session tz (get_spark pins it), and only
    # bucket BALANCE depends on the numeric mapping anyway
    t = F.col(ts_col).cast("timestamp").cast("double")
    if p <= 1:
        # single bucket: no quantile probe needed (and approxQuantile
        # with an empty probability list raises a raw Py4J NPE)
        bounds: list[float] = []
    else:
        qs = events.select(t.alias("_t")).stat.approxQuantile(
            "_t", [i / p for i in range(1, p)], 0.01
        )
        bounds = sorted({q for q in qs if q is not None})
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    bucket = F.when(t.isNull(), F.lit(0)).otherwise(
        F.size(F.filter(barr, lambda b: t >= b))
    )
    u = events.withColumn("_ap_spid", bucket)
    part = list(keys) + ["_ap_spid"]

    w = Window.partitionBy(*part).orderBy(ts_col, pk)
    prev = F.lag(ts_col).over(w)
    lbrk = F.coalesce(
        (F.col(ts_col) > prev + F.expr(f"INTERVAL {gap}")).cast("long"),
        F.lit(0),
    )
    u = u.withColumn("_ap_lbrk", lbrk).withColumn(
        "_ap_lsum",
        F.sum("_ap_lbrk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )

    per = u.groupBy(*part).agg(
        F.min(ts_col).alias("_ap_first_ts"),
        F.max(ts_col).alias("_ap_last_ts"),
        F.sum("_ap_lbrk").alias("_ap_nbrk"),
    )
    if keys:
        wc = Window.partitionBy(*keys).orderBy("_ap_spid")
        carry_ts = F.last("_ap_last_ts", ignorenulls=True).over(
            wc.rowsBetween(Window.unboundedPreceding, -1)
        )
        bnd = F.coalesce(
            (
                F.col("_ap_first_ts") > carry_ts + F.expr(f"INTERVAL {gap}")
            ).cast("long"),
            F.lit(0),
        )
        per = per.withColumn("_ap_bnd", bnd)
        off = F.coalesce(
            F.sum("_ap_nbrk").over(wc.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ) + F.sum("_ap_bnd").over(wc.rowsBetween(Window.unboundedPreceding, 0))
        offsets = per.withColumn("_ap_off", off).select(*part, "_ap_off")
    else:
        delta = _gap_timedelta(gap)
        rows = sorted(per.collect(), key=lambda r: r["_ap_spid"])
        off_rows, run_nbrk, run_bnd, last_ts = [], 0, 0, None
        for r in rows:
            first_ts = r["_ap_first_ts"]
            if (
                last_ts is not None
                and first_ts is not None
                and first_ts > last_ts + delta
            ):
                run_bnd += 1
            off_rows.append((int(r["_ap_spid"]), run_nbrk + run_bnd))
            run_nbrk += int(r["_ap_nbrk"] or 0)
            if r["_ap_last_ts"] is not None:
                last_ts = r["_ap_last_ts"]
        offsets = spark.createDataFrame(off_rows, "_ap_spid int, _ap_off long")

    out = u.join(F.broadcast(offsets), part)
    return out.select(
        *events.columns,
        F.when(
            F.col(ts_col).isNotNull(),
            F.col("_ap_lsum") + F.col("_ap_off"),
        )
        .otherwise(F.lit(None))
        .alias(session_col),
    )


def session_funnel(
    events: DataFrame,
    steps: "list[str]",
    gap: str = "30 minutes",
    by: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    pk: str = "event_id",
    skew_threshold: "int | str | None" = "auto",
    max_events_per_session: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion over SESSIONS (round 12): for every
    session (same gap rule as :func:`sessionize_events`), the funnel
    depth is the largest ``k`` such that ``steps[0..k-1]`` occur in
    order — step ``i+1`` STRICTLY LATER (event time) than the matched
    step ``i``; simultaneous events do not chain, so the result is
    deterministic under timestamp ties.  Greedy earliest matching is
    optimal (exchange argument), so depth ≥ k iff an ordered chain
    exists.  Returns one row per step:
    ``(step_idx 1-based, step, n_sessions)`` where ``n_sessions``
    counts sessions reaching at least that step — the classic
    product-analytics funnel, here as one Spark job.

    Shape: :func:`assign_sessions` labels events (inheriting its
    default-on skew routing — a bot account cannot serialize the
    labeling), one groupBy ``(by, session)`` folds the time-sorted
    per-session event list (bounded by session length) through a
    codegen ``aggregate`` that tracks ``(depth, last matched time)``,
    and a ≤|sessions|-row explode/count aggregate emits the k counts.
    Events with NULL time or NULL session are excluded (no session).

    ``max_events_per_session`` (round 13, verdict r12 #3): the
    per-session ``collect_list`` is bounded by session length, and a
    no-gap bot stream makes ONE session the whole corpus — the skew
    routing protects the LABELING but not this fold.  The cap turns
    that into a loud assert-folded raise naming the knob (instead of an
    executor OOM); pre-filter the offending key or raise the cap.
    """
    if not steps:
        raise ValueError("steps must be a non-empty list of event types")
    k = len(steps)
    labeled = assign_sessions(
        events, gap=gap, by=by, ts_col=ts_col, pk=pk,
        skew_threshold=skew_threshold,
    )
    ev_pack = F.struct(
        F.col(ts_col).cast("timestamp").cast("double").alias("t"),
        F.col(pk).alias("k"),
        F.col(type_col).alias("tp"),
    )
    sess = (
        labeled.filter(F.col("session_idx").isNotNull())
        .groupBy(F.col(by), F.col("session_idx"))
        .agg(F.array_sort(F.collect_list(ev_pack)).alias("_ev"))
    )
    steps_lit = F.lit(list(steps))
    d0: Column = F.lit(0)
    if max_events_per_session is not None:
        # folded into the fold's seed so the guard can never be pruned
        d0 = d0 + _session_cap_guard(
            F.size(F.col("_ev")), int(max_events_per_session),
            "session_funnel",
        ).cast("int")
    init = F.struct(d0.alias("d"), F.lit(0.0).alias("t"))

    def _advance(acc, e):
        can = (
            (acc["d"] < F.lit(k))
            & (e["tp"] == F.element_at(steps_lit, acc["d"] + 1))
            & ((acc["d"] == 0) | (e["t"] > acc["t"]))
        )
        return F.struct(
            F.when(can, acc["d"] + 1).otherwise(acc["d"]).alias("d"),
            F.when(can, e["t"]).otherwise(acc["t"]).alias("t"),
        )

    depth = sess.select(
        F.aggregate(F.col("_ev"), init, _advance)["d"].alias("d")
    )
    counts = (
        depth.filter(F.col("d") >= 1)
        .select(F.explode(F.sequence(F.lit(1), F.col("d"))).alias("step_idx"))
        .groupBy("step_idx")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    frame = events.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step_idx int, step string"
    )
    return frame.join(counts, "step_idx", "left").select(
        "step_idx",
        "step",
        F.coalesce(F.col("n_sessions"), F.lit(0)).alias("n_sessions"),
    )


def stream_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 day",
    method: str = "exact",
    key_col=None,
) -> DataFrame:
    """Cross-micro-batch dedup of a document stream: the first arrival of
    each fingerprint survives, later copies are dropped — state is
    Spark's own streaming dropDuplicates keyed on the fingerprint (no
    custom operator needed; the built-in keeps the seen-key set in the
    state store).

    ``method="exact"`` keys on the 31-poly hash of the whitespace-
    normalized text (byte-level duplicates).  ``method="simhash"`` keys
    on the 30-bit SimHash fingerprint instead: token-ORDER-invariant and
    collision-prone exactly for near-identical token distributions, so
    shuffled/lightly-reordered copies are dropped too — the streaming
    counterpart of the batch near-dup family (a full banded MinHash
    needs multi-stage stateful joins that Structured Streaming does not
    allow in one query; SimHash-collision is the single-key formulation).

    With ``ts_col`` the stream is watermarked and deduped with
    ``dropDuplicatesWithinWatermark`` on the FINGERPRINT ALONE — copies
    arriving with different timestamps are still dropped (the round-5
    advice: keying on ``(fingerprint, ts)`` only deduped exact-same-ts
    copies, defeating the simhash mode whose reordered copies rarely
    share a ts), while the seen-key state still EVICTS once a key is
    older than ``watermark`` — the only way the state stays bounded on
    an unbounded corpus (dup detection then spans the watermark horizon,
    the standard streaming-dedup contract).  Without ``ts_col`` the
    state grows with the distinct-document count.
    ``key_col`` replaces the fingerprint with ANY stateless expression
    (e.g. ``scrub.canonical_url_expr("url")`` for URL-level dedup);
    NULL keys never dedup against each other (a per-row full-row-hash
    fallback), only fully identical rows collapse.

    Runs identically on a batch DataFrame (dropDuplicates semantics
    match), which is how tests adjudicate it.
    """
    from adampro_spark.pipeline.dedup import simhash_expr
    from adampro_spark.pipeline.text import char_codes, poly_hash, tokens_expr

    if key_col is not None:
        # custom dedup key (round 9): any stateless expression — e.g.
        # scrub.canonical_url_expr("url") for URL-level stream dedup
        # (the cheapest crawl dedup, before any text comparison); the
        # method fingerprints are ignored when a key is supplied.
        # NULL keys must NOT collapse into one group (dropDuplicates
        # treats NULLs as equal — review r9.2: every NULL-url doc but
        # the first would vanish): substitute a deterministic per-row
        # fallback, so NULL-key rows dedup only when fully identical
        fallback = F.concat(
            F.lit("_ap_nullkey_"),
            F.xxhash64(*[F.col(c) for c in stream.columns]).cast("string"),
        )
        key = F.coalesce(key_col.cast("string"), fallback)
    elif method == "exact":
        key = poly_hash(char_codes(F.concat_ws(" ", tokens_expr(text_col))))
    elif method == "simhash":
        key = simhash_expr(text_col)
    else:
        raise ValueError(f"unknown stream_dedup method {method!r}")
    out = stream.withColumn("_ap_texthash", key)
    if ts_col is not None and out.isStreaming:
        out = out.withWatermark(ts_col, watermark)
        return out.dropDuplicatesWithinWatermark(["_ap_texthash"]).drop(
            "_ap_texthash"
        )
    # batch: watermark/eviction is a no-op, so key-only dropDuplicates IS
    # the batch equivalent (dropDuplicatesWithinWatermark rejects batch)
    return out.dropDuplicates(["_ap_texthash"]).drop("_ap_texthash")


def stream_curate(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 day",
    dedup: str | None = "exact",
    langs=("en",),
    langid_col=None,
    min_tokens: int = 20,
    min_quality: float = 0.3,
    max_chars: int | None = None,
    max_dup_line_frac: float | None = None,
    max_top_2gram_char_frac: float | None = None,
    repetition_ceilings=None,
    redact=None,
    lm=None,
    extra_gates=None,
    quality_weights=None,
    quality_junk_threshold: float = 0.5,
    tokenizer: str = "whitespace",
) -> DataFrame:
    """The streaming counterpart of batch :func:`~adampro_spark.pipeline.
    curate.curate`: the SAME gate expressions (``gate_flags`` — stateless,
    map-only, identical semantics by construction) filter each micro-batch,
    then :func:`stream_dedup` drops cross-batch duplicate survivors
    (``dedup`` = "exact" / "simhash" / None; state bounded by ``watermark``
    when ``ts_col`` is given).  Gates run BEFORE dedup, so junk never
    enters the dedup state store.  Runs identically on a batch DataFrame.

    ``redact`` and the repetition ceilings (round 7) mirror the batch
    surface: PII redaction and the Gopher-style repetition gates are
    stateless column expressions too, so they stream unchanged —
    redaction rewrites ``text_col`` BEFORE the gates and the dedup state,
    exactly like batch curate.

    ``lm`` — the batch ``(vocab, meta, min_logprob)`` triple, scored
    here via the MAP-ONLY :func:`~adampro_spark.pipeline.lm.lm_score_col`
    pandas UDF instead of batch curate's explode→broadcast-join→groupBy
    (a streaming groupBy would be a stateful aggregate); same scores,
    same floor semantics (NULL-scoring empty docs drop), rides the same
    stateless gate pass.

    No attrition report: a streaming query cannot collect counts
    mid-plan — observe the gate pass with ``df.observe`` or compare sink
    counts instead.
    """
    from adampro_spark.pipeline.curate import _check_reserved_columns, gate_flags

    _check_reserved_columns(stream)
    out = stream
    if redact:
        from adampro_spark.pipeline.scrub import _cats, redact_expr

        cats = _cats(None if redact is True else list(redact))
        out = out.withColumn(text_col, redact_expr(text_col, cats))

    from adampro_spark.pipeline.text import resolve_tokenizer as _resolve_tok

    # tokenizer="script" mirrors batch curate (round 12): stateless, so
    # the script-aware gates stream unchanged
    out = out.withColumn("_ap_gtoks", _resolve_tok(text_col, tokenizer))
    flags = dict(gate_flags(
        text_col, langs=langs, min_tokens=min_tokens,
        min_quality=min_quality, max_chars=max_chars,
        toks=F.col("_ap_gtoks"), langid_col=langid_col,
        tokenizer=tokenizer,
    ))
    rep_internals: list[str] = []
    ceilings = dict(repetition_ceilings or {})
    if max_dup_line_frac is not None:
        ceilings.setdefault("dup_line_frac", float(max_dup_line_frac))
    if max_top_2gram_char_frac is not None:
        ceilings.setdefault(
            "top_2gram_char_frac", float(max_top_2gram_char_frac)
        )
    if ceilings:
        from adampro_spark.pipeline.text import with_repetition

        basic = {
            "dup_line_frac", "dup_line_char_frac",
            "top_2gram_char_frac", "dup_5gram_frac",
        }
        out, rep, rep_internals = with_repetition(
            out, text_col, toks=F.col("_ap_gtoks"),
            extended=bool(set(ceilings) - basic),
        )
        unknown = sorted(set(ceilings) - set(rep))
        if unknown:
            raise ValueError(
                f"unknown repetition signals {unknown}; available: "
                f"{sorted(rep)}"
            )
        # shared fold + pushdown pin with batch curate: per-microbatch
        # plans run the same optimizer, and filtering on an unpinned
        # flag inlines the staged gram projections into each other's
        # lambdas — the O(T^3) plan text.pushdown_barrier documents
        from adampro_spark.pipeline.text import repetition_gate_flag

        flags["_rep_ok"] = repetition_gate_flag(rep, ceilings)
    if lm is not None:
        from adampro_spark.pipeline.lm import bigram_lm_score_col, lm_score_col

        # accept BOTH batch-curate forms (ADVICE r7: the 4-tuple used to
        # die in a bare unpack error): (vocab, meta, floor) scores the
        # unigram model, (vocab, bigrams, meta, floor) the interpolated
        # bigram model — both via map-only pandas UDFs (a streaming
        # explode→groupBy would be a stateful aggregate)
        if len(lm) == 4:
            lm_vocab, lm_bigrams, lm_meta, lm_floor = lm
            score = bigram_lm_score_col(lm_vocab, lm_bigrams, lm_meta, text_col)
        elif len(lm) == 3:
            lm_vocab, lm_meta, lm_floor = lm
            score = lm_score_col(lm_vocab, lm_meta, text_col)
        else:
            raise ValueError(
                "lm must be (vocab, meta, min_logprob) for the unigram "
                "model or (vocab, bigrams, meta, min_logprob) for the "
                f"bigram model — got a {len(lm)}-tuple"
            )
        flags["_lm_ok"] = score >= F.lit(float(lm_floor))
    if quality_weights is not None:
        # batch-curate symmetry (round 10): the learned quality gate is
        # a stateless codegen dot product, so it streams unchanged
        from adampro_spark.pipeline.quality import quality_score_expr

        flags["_mlq_ok"] = quality_score_expr(
            list(quality_weights), text_col
        ) < F.lit(float(quality_junk_threshold))
    if extra_gates:
        # same contract as batch curate: stateless boolean flag columns
        # merged into the one-scan gate pass (e.g. the compression-ratio
        # preset, text.compression_gate_flags).  Same clash check as
        # batch curate (ADVICE r8): an extra gate named like a built-in
        # flag would silently REPLACE that gate on the streaming path.
        clashes = sorted(set(extra_gates) & set(flags))
        if clashes:
            raise ValueError(
                f"extra_gates {clashes} collide with stream_curate's "
                "built-in gate flags; rename them"
            )
        flags.update(extra_gates)
    cond = None
    for name, expr in flags.items():
        out = out.withColumn(name, expr)
        cond = F.col(name) if cond is None else (cond & F.col(name))
    out = out.filter(cond).drop("_ap_gtoks", *flags.keys(), *rep_internals)
    if dedup is None:
        return out
    return stream_dedup(
        out, text_col=text_col, ts_col=ts_col,
        watermark=watermark, method=dedup,
    )


def progressive_knn_stream(
    stream: DataFrame,
    vector_col: str,
    query,
    k: int,
    distance_name: str = "euclidean",
    pk: str = "ap_id",
    nbuckets: int = 32,
    state_ttl_ms: int | None = 86_400_000,
) -> DataFrame:
    """Progressive kNN over streaming inserts — the reference's
    progressive query (``DataQuery.scala:327-360``: results improve as
    more data is scanned) re-expressed for CONTINUOUS data: each
    micro-batch refines a running top-k.

    Custom stateful operator (``applyInPandasWithState`` — the one shape
    Structured Streaming's built-ins can't express: per-group running
    top-k): rows hash into ``nbuckets`` groups, each group's state is its
    current top-k ``(pks, dists)`` arrays; a batch merges its numpy-
    computed distances into the state and emits the bucket's refreshed
    top-k.  The global answer is the k smallest of the ``nbuckets·k``
    emitted rows — a trivial final aggregation for any sink.  State is
    O(nbuckets·k), independent of stream length; buckets keep the merge
    parallel across executors.

    ``state_ttl_ms`` bounds state LIFETIME the way ``stream_dedup``'s
    watermark bounds its key set: a bucket that receives no rows for the
    TTL is evicted (processing-time timeout), so idle buckets do not live
    forever on an unbounded stream.  The merged answer then reflects the
    TTL horizon — the standard contract for windowed progressive results.
    The DEFAULT is a finite 24 h TTL so the scale-safe behavior is
    opt-OUT (round-5 verdict): pass ``state_ttl_ms=None`` explicitly for
    full-history semantics on bounded replays.
    """
    import numpy as np

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from adampro_spark.index._util import np_distance

    q = np.asarray([float(x) for x in query], dtype=np.float64)
    dn = distance_name

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        if state_ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            pks, ds = state.get
            pks, ds = list(pks), list(ds)
        else:
            pks, ds = [], []
        for pdf in pdfs:
            if not len(pdf):
                continue
            V = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vector_col]]
            )
            batch_d = np_distance(q, V, dn)
            pks.extend(int(x) for x in pdf[pk])
            ds.extend(float(x) for x in batch_d)
        order = sorted(range(len(ds)), key=lambda i: (ds[i], pks[i]))[:k]
        pks = [pks[i] for i in order]
        ds = [ds[i] for i in order]
        state.update((pks, ds))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(
            {"bucket": [int(key[0])] * len(pks), pk: pks, "ap_distance": ds}
        )

    bucketed = stream.withColumn(
        "_ap_bucket", F.pmod(F.xxhash64(F.col(pk)), F.lit(nbuckets)).cast("int")
    )
    return bucketed.groupBy("_ap_bucket").applyInPandasWithState(
        update,
        outputStructType=f"bucket int, {pk} long, ap_distance double",
        stateStructType="pks array<bigint>, ds array<double>",
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_asof(
    stream: DataFrame,
    reference: DataFrame,
    time_col: str = "ts",
    by: str | None = None,
    right_cols: "list[str] | None" = None,
    direction: str = "backward",
    tolerance: float | None = None,
    suffix: str = "_right",
    max_rows_per_key: int = 100_000,
) -> DataFrame:
    """STREAM-STATIC as-of join (round 11): enrich a live event stream
    with the matching row of a static reference table per ``direction``
    — the production shape of as-of at ingest time (tag each event with
    the most recent quote/config/dimension snapshot at or before its
    timestamp).  Same surface and semantics as the batch
    :func:`~adampro_spark.pipeline.temporal.asof_join`
    (backward/forward/nearest, ``tolerance`` seconds, equal times
    match, the matched row carried ATOMICALLY), with one deliberate
    tightening: equal right timestamps within a key break
    deterministically by payload order (the batch window's order among
    exact ts ties is engine-internal).

    Shape (the reason this streams at all): the batch formulation is a
    window over the UNION of both sides — stateful, and Structured
    Streaming cannot sort a stream.  But against a STATIC right side
    the lookup is a pure function of the event row: the reference
    compiles once into one sorted ``array<struct(ts, payload…)>`` per
    key, the stream equi-joins that tiny table on the key (Spark
    broadcasts a dimension-sized build side; AQE decides), and the
    match is ``element_at(filter(arr, r -> r.ts <= t), -1)`` — a
    stateless codegen expression, so the SAME code runs on a batch
    DataFrame, which is how tests adjudicate it (vs batch asof_join).

    ``max_rows_per_key`` bounds the per-key history array (one key's
    reference rows land in ONE array cell — the explosion-guard family,
    like ``range_join``'s bucket cap): above the cap the job fails with
    a clear message; as-of against an unbounded per-key history is the
    batch operator's job, not a stream enrichment's.

    NULL-time reference rows never match (dropped up front, the batch
    contract).  NULL / unseen keys yield NULL right columns (left
    semantics).  Returns the stream's columns plus ``ts<suffix>`` and
    each requested right column (``<col><suffix>`` on name clash).
    """
    from adampro_spark.pipeline.temporal import _TS_FIELD

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
    reference = reference.filter(F.col(time_col).isNotNull())
    rcols = right_cols or [
        c for c in reference.columns if c not in (time_col, by)
    ]
    keys = [by] if by is not None else []
    pack = F.struct(
        F.col(time_col).cast("double").alias(_TS_FIELD),
        *[F.col(c) for c in rcols],
    )
    grouped = (
        reference.groupBy(*[F.col(k) for k in keys])
        if keys
        else reference.groupBy(F.lit(1).alias("_ap_one"))
    ).agg(F.sort_array(F.collect_list(pack)).alias("_ap_ref"))
    cap = int(max_rows_per_key)
    # non-prunable guard (the range_join pattern): assert_true returns
    # NULL when the bound holds, so slicing from `1 + guard` is the
    # whole array on the happy path and raises on a hot key
    guard = F.coalesce(
        F.assert_true(
            F.size("_ap_ref") <= F.lit(cap),
            F.concat(
                F.lit("stream_asof: a reference key holds "),
                F.size("_ap_ref").cast("string"),
                F.lit(
                    f" rows (> max_rows_per_key={cap}); as-of against an "
                    "unbounded per-key history is batch asof_join's job"
                ),
            ),
        ).cast("int"),
        F.lit(0),
    )
    grouped = grouped.withColumn(
        "_ap_ref", F.slice(F.col("_ap_ref"), F.lit(1) + guard, F.size("_ap_ref"))
    )

    if keys:
        joined = stream.join(grouped, on=keys, how="left")
    else:
        joined = stream.withColumn("_ap_one", F.lit(1)).join(
            grouped, on=["_ap_one"], how="left"
        ).drop("_ap_one")

    t = F.col(time_col).cast("double")
    arr = F.col("_ap_ref")
    back = F.filter(arr, lambda x: x[_TS_FIELD] <= t)
    fwd = F.filter(arr, lambda x: x[_TS_FIELD] >= t)
    # element_at under ANSI (Spark 4 default) raises on index 0/out-of-
    # bounds — guard on size explicitly
    mb = F.when(F.size(back) > 0, F.element_at(back, F.size(back)))
    mf = F.when(F.size(fwd) > 0, F.element_at(fwd, F.lit(1)))

    tol = None if tolerance is None else F.lit(float(tolerance))
    valid_b = mb.isNotNull() if tol is None else (
        mb.isNotNull() & ((t - mb[_TS_FIELD]) <= tol)
    )
    valid_f = mf.isNotNull() if tol is None else (
        mf.isNotNull() & ((mf[_TS_FIELD] - t) <= tol)
    )
    if direction == "backward":
        m = F.when(valid_b, mb)
    elif direction == "forward":
        m = F.when(valid_f, mf)
    else:  # nearest: closer side wins, tie -> backward (pandas)
        db = t - mb[_TS_FIELD]
        df_ = mf[_TS_FIELD] - t
        m = (
            F.when(valid_b & valid_f, F.when(df_ < db, mf).otherwise(mb))
            .when(valid_b, mb)
            .when(valid_f, mf)
        )

    proj = [F.col(c) for c in stream.columns]
    proj.append(m[_TS_FIELD].alias(f"ts{suffix}"))
    for c in rcols:
        name = f"{c}{suffix}" if c in stream.columns else c
        proj.append(m[c].alias(name))
    return joined.select(*proj)


def stream_insert_entity(
    stream: DataFrame, entity, checkpoint_dir: str, trigger_available_now: bool = True
):
    """Continuous entity ingest: every micro-batch appends through
    ``Entity.insert`` (bit-packed PKs, version bump, index staleness —
    the same path as batch inserts; the reference's streamInsert also
    funnels into the normal insert, DataDefintion.scala:170).

    Returns the started StreamingQuery; callers ``awaitTermination()``.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        entity.insert(batch_df)

    writer = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_media_gates(
    stream: DataFrame,
    content_col: str = "content",
    pk: str = "media_id",
    formats: "tuple[str, ...] | None" = None,
    min_width: "int | None" = None,
    min_height: "int | None" = None,
) -> DataFrame:
    """:func:`~adampro_spark.pipeline.multimodal.curate_media`'s PROBE
    GATES on a STREAM (round 14): the header-only probe is a stateless
    Arrow projection, so the format whitelist and size floors filter
    micro-batches with exactly batch stage-1 semantics (the
    :func:`stream_curate` batch≡stream contract; runs identically on a
    batch DataFrame).  Returns the gated stream with the probed
    metadata attached (``format, width, height, n_frames,
    sample_rate``).

    The dedup stages are inherently GLOBAL (cross-corpus hash and
    fingerprint joins) and stay batch — for cross-batch EXACT media
    dedup, chain :func:`stream_dedup` with
    ``key_col=F.sha2(F.col(content_col), 256)`` (bounded by its
    watermark); near-dup fingerprint dedup needs the batch
    ``curate_media`` over the sink.  No attrition report: a streaming
    query cannot collect counts mid-plan (``df.observe`` or sink-count
    comparison instead)."""
    from adampro_spark.pipeline.multimodal import probe_media

    probed = probe_media(stream, content_col, pk, keep_content=True)
    fmt_ok = (
        F.col("format").isin(list(formats))
        if formats is not None
        else F.col("format") != F.lit("unknown")
    )
    size_ok = F.lit(True)
    if min_width is not None:
        size_ok = size_ok & (
            F.col("width").isNull() | (F.col("width") >= int(min_width))
        )
    if min_height is not None:
        size_ok = size_ok & (
            F.col("height").isNull() | (F.col("height") >= int(min_height))
        )
    return probed.filter(fmt_ok & size_ok)
