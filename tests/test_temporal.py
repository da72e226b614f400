"""Temporal joins (asof_join / range_join) adjudicated against DuckDB's
native ASOF JOIN and range predicates on the same rows, plus plan-shape
asserts (no nested-loop, ever)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from adampro_spark.pipeline.temporal import asof_join, range_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    from adampro_spark.session import load_tables

    # epoch-seconds ts keeps the Spark/DuckDB comparison unit-exact
    ev = load_tables(spark, SF)["events"]
    # NTZ has no direct double cast: hop through session-tz TIMESTAMP
    # (UTC session => identical instants)
    return ev.select(
        "event_id", "user_id", "event_type", "value",
        F.col("ts").cast("timestamp").cast("double").alias("ts"),
    ).cache()


def _duck(events_rows, cols):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (event_id BIGINT, user_id BIGINT, event_type VARCHAR, "
        "value DOUBLE, ts DOUBLE)"
    )
    con.executemany("INSERT INTO ev VALUES (?, ?, ?, ?, ?)", events_rows)
    return con


def test_asof_join_matches_duckdb(spark, events):
    """Per-user as-of: each 'click' joined to the most recent prior (or
    simultaneous) 'purchase' of the SAME user — byte-identical to
    DuckDB's ASOF LEFT JOIN."""
    left = events.filter(F.col("event_type") == "click")
    right = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    got = {
        (r["event_id"], r["purchase_value"], r["ts_right"])
        for r in asof_join(
            left, right, time_col="ts", by="user_id",
            right_cols=["purchase_value"],
        ).collect()
    }

    rows = [tuple(r) for r in events.collect()]
    con = _duck(rows, events.columns)
    want = {
        (eid, pv, rts)
        for eid, pv, rts in con.execute(
            """
            SELECT l.event_id, r.value, r.ts
            FROM (SELECT * FROM ev WHERE event_type = 'click') l
            ASOF LEFT JOIN (SELECT * FROM ev WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
            """
        ).fetchall()
    }
    assert got == want
    assert len(got) == left.count()


def test_asof_join_tolerance_voids_stale_matches(spark, events):
    left = events.filter(F.col("event_type") == "click")
    right = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    tol = 3600.0  # 1 hour
    wide = {
        r["event_id"]: (r["purchase_value"], r["ts_right"], r["ts"])
        for r in asof_join(
            left, right, time_col="ts", by="user_id",
            right_cols=["purchase_value"],
        ).collect()
    }
    tight = {
        r["event_id"]: (r["purchase_value"], r["ts_right"])
        for r in asof_join(
            left, right, time_col="ts", by="user_id",
            right_cols=["purchase_value"], tolerance=tol,
        ).collect()
    }
    voided = kept = 0
    for eid, (pv, rts, lts) in wide.items():
        if rts is None:
            assert tight[eid] == (None, None)
        elif lts - rts > tol:
            voided += 1
            assert tight[eid] == (None, None), eid
        else:
            kept += 1
            assert tight[eid] == (pv, rts), eid
    assert voided > 0 and kept > 0  # the corpus exercises both branches


def test_asof_join_plans_one_shuffle_no_join_node(spark, events):
    left = events.limit(200)
    right = events.select("user_id", "ts", F.col("value").alias("v2"))
    plan = (
        asof_join(left, right, time_col="ts", by="user_id", right_cols=["v2"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan  # interleaved window, not a join node
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # union sides share the key shuffle


def test_asof_join_null_payload_carried_atomically(spark):
    """ADVICE r5 (high): a matched right row with a NULL payload must
    yield NULL (not an older row's value), and every carried column must
    come from the SAME right row — verified against the exact reported
    repro and pandas merge_asof/DuckDB semantics."""
    left = spark.createDataFrame([(10.0, 1)], "ts double, lid int")
    right = spark.createDataFrame(
        [(1.0, 100.0), (5.0, None)], "ts double, v double"
    )
    row = asof_join(left, right, time_col="ts", right_cols=["v"]).collect()[0]
    assert row["ts_right"] == 5.0
    assert row["v"] is None  # NOT 100.0 from the older row

    # multi-column: both payloads must come from the matched (ts=5) row
    right2 = spark.createDataFrame(
        [(1.0, 100.0, "a"), (5.0, None, "b")], "ts double, v double, tag string"
    )
    row2 = asof_join(
        left, right2, time_col="ts", right_cols=["v", "tag"]
    ).collect()[0]
    assert (row2["ts_right"], row2["v"], row2["tag"]) == (5.0, None, "b")


def test_asof_join_unkeyed_matches_keyed_and_duckdb(spark, events):
    """The unkeyed (global) as-of must agree with DuckDB's keyless ASOF
    LEFT JOIN — and must NOT plan a single-partition window over the
    data (VERDICT r5 scale edge)."""
    left = events.filter(F.col("event_type") == "click")
    right = events.filter(F.col("event_type") == "purchase").select(
        "ts", F.col("value").alias("purchase_value")
    )
    out = asof_join(
        left, right, time_col="ts", right_cols=["purchase_value"],
        num_partitions=8,
    )
    got = {
        (r["event_id"], r["purchase_value"], r["ts_right"])
        for r in out.collect()
    }
    rows = [tuple(r) for r in events.collect()]
    con = _duck(rows, events.columns)
    want = {
        (eid, pv, rts)
        for eid, pv, rts in con.execute(
            """
            SELECT l.event_id, r.value, r.ts
            FROM (SELECT * FROM ev WHERE event_type = 'click') l
            ASOF LEFT JOIN (SELECT * FROM ev WHERE event_type = 'purchase') r
              ON l.ts >= r.ts
            """
        ).fetchall()
    }
    assert got == want and got
    # parallel shape: the DATA window runs per VALUE-DERIVED time bucket
    # (hash exchange on _ap_pid, the quantile-boundary bucket expression),
    # never as one global single-partition window — and never keyed on
    # spark_partition_id(), whose meaning is not stable across the plan's
    # two evaluations of the source (the round-6 carry-corruption bug).
    # (AQE may still coalesce tiny sf0.001 outputs to 1 partition — plan
    # shape, not runtime partition count, is the scale signal.)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_ap_pid" in plan
    assert "SPARK_PARTITION_ID" not in plan.upper()
    # the only SinglePartition window is the <= p-row boundary prefix scan
    data_windows = [
        ln for ln in plan.splitlines()
        if "Window" in ln and "_ap_pack" in ln
    ]
    assert data_windows and all("SinglePartition" not in ln for ln in data_windows)


def test_range_join_left_null_payload_single_row(spark):
    """ADVICE r5 (medium): an event with a NULL payload column that DOES
    match an interval must appear exactly once (the old anti-join on all
    event columns re-emitted it as unmatched)."""
    events = spark.createDataFrame(
        [(1, 100.0, None), (2, 999.0, 5.0)],
        "event_id int, ts double, payload double",
    )
    intervals = spark.createDataFrame(
        [(7, 50.0, 150.0)], "win_id int, start double, end double"
    )
    out = range_join(
        events, intervals, time_col="ts", start_col="start", end_col="end",
        bucket_width=60.0, how="left",
    ).collect()
    by_event = {}
    for r in out:
        by_event.setdefault(r["event_id"], []).append(r)
    assert len(by_event[1]) == 1  # matched once, NOT also "unmatched"
    assert by_event[1][0]["win_id"] == 7
    assert len(by_event[2]) == 1 and by_event[2][0]["win_id"] is None


def test_range_join_matches_duckdb(spark, events):
    """Events joined to the per-user maintenance windows that contain
    them — equi-join on cover buckets + exact filter == DuckDB's range
    predicate join."""
    intervals = (
        events.groupBy("user_id")
        .agg(F.min("ts").alias("start"))
        .withColumn("end", F.col("start") + 7200.0)
        .withColumn("win_id", F.col("user_id") * 1000)
    )
    got = {
        (r["event_id"], r["win_id"])
        for r in range_join(
            events, intervals, time_col="ts", start_col="start",
            end_col="end", by="user_id", bucket_width=3600.0,
        ).collect()
    }

    rows = [tuple(r) for r in events.collect()]
    con = _duck(rows, events.columns)
    con.execute(
        "CREATE TABLE iv AS SELECT user_id, min(ts) AS start, "
        "min(ts) + 7200.0 AS \"end\", user_id * 1000 AS win_id "
        "FROM ev GROUP BY user_id"
    )
    want = {
        (eid, wid)
        for eid, wid in con.execute(
            """
            SELECT e.event_id, i.win_id FROM ev e JOIN iv i
            ON e.user_id = i.user_id AND e.ts >= i.start AND e.ts <= i."end"
            """
        ).fetchall()
    }
    assert got == want and got


def test_range_join_left_keeps_unmatched(spark, events):
    intervals = (
        events.groupBy("user_id")
        .agg(F.min("ts").alias("start"))
        .withColumn("end", F.col("start") + 60.0)  # tiny windows
        .withColumn("win_id", F.col("user_id") * 1000)
    )
    out = range_join(
        events, intervals, time_col="ts", start_col="start", end_col="end",
        by="user_id", bucket_width=3600.0, how="left",
    )
    n_events = events.count()
    matched = out.filter(F.col("win_id").isNotNull()).count()
    assert out.count() == n_events  # 1 window/user, none overlap -> no fanout
    assert 0 < matched < n_events


def test_range_join_plan_is_equi_join(spark, events):
    intervals = (
        events.groupBy("user_id")
        .agg(F.min("ts").alias("start"))
        .withColumn("end", F.col("start") + 7200.0)
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            range_join(events, intervals, by="user_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_asof_join_randomized_vs_pandas_merge_asof(spark):
    """Seeded randomized differential test: keyed AND unkeyed as-of, all
    three directions (backward/forward/nearest), with and without
    tolerance, must match ``pandas.merge_asof`` on every generated frame
    — including NULL payloads, empty sides, and no-match rows.  The
    matched right time rides along as a payload column (``ts_r``), so
    pandas itself adjudicates WHICH right row matched."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    for it in range(8):
        n_l = int(rng.integers(0, 40))
        n_r = int(rng.integers(0, 30))
        # unique timestamps globally: equal-ts winners on the RIGHT are
        # implementation-defined in both engines, so keep them unique
        ts_pool = rng.choice(10_000, size=n_l + n_r, replace=False).astype(float)
        keys = np.array(["a", "b", "c"])
        ldf = pd.DataFrame({
            "lid": np.arange(n_l, dtype=np.int64),
            "k": rng.choice(keys, size=n_l),
            "ts": ts_pool[:n_l],
        })
        rdf = pd.DataFrame({
            "k": rng.choice(keys, size=n_r),
            "ts": ts_pool[n_l:],
            "v": np.where(rng.random(n_r) < 0.3, np.nan, rng.random(n_r).round(4)),
        })
        rdf["ts_r"] = rdf["ts"]  # matched-right-ts as a carried payload
        tol = None if it % 2 == 0 else float(rng.integers(100, 3000))
        direction = ("backward", "forward", "nearest")[it % 3]

        sl = spark.createDataFrame(ldf.astype(object).where(ldf.notna(), None),
                                   "lid long, k string, ts double") if n_l else \
            spark.createDataFrame([], "lid long, k string, ts double")
        sr = spark.createDataFrame(rdf.astype(object).where(rdf.notna(), None),
                                   "k string, ts double, v double, ts_r double") \
            if n_r else \
            spark.createDataFrame([], "k string, ts double, v double, ts_r double")

        for by in (None, "k"):
            res = asof_join(
                sl, sr.drop("k") if by is None else sr,
                time_col="ts", by=by, right_cols=["v", "ts_r"],
                tolerance=tol, direction=direction,
            ).collect()
            got = {
                (r["lid"], r["ts_r"],
                 None if r["v"] is None else round(r["v"], 4))
                for r in res
            }
            # carried columns must agree with the struct's own matched ts
            assert all(r["ts_right"] == r["ts_r"] for r in res)
            kw = {"by": "k"} if by else {}
            want_df = pd.merge_asof(
                ldf.sort_values("ts"), rdf.sort_values("ts"),
                on="ts", direction=direction, allow_exact_matches=True,
                suffixes=("", "_rr"), tolerance=tol, **kw,
            ) if n_l else pd.DataFrame(columns=["lid", "v", "ts_r"])
            want = {
                (int(row["lid"]),
                 None if pd.isna(row["ts_r"]) else float(row["ts_r"]),
                 None if pd.isna(row["v"]) else round(float(row["v"]), 4))
                for _, row in want_df.iterrows()
            }
            assert got == want, f"iter={it} by={by} tol={tol} dir={direction}"


def test_asof_null_time_rights_never_match(spark):
    """DuckDB ASOF / pandas semantics: a right row with NULL time cannot
    satisfy the inequality — all paths (plain keyed, skew carry, unkeyed)
    must agree it matches nothing (review r7: the carry aggregations
    treated NULL-time rights differently from the plain window)."""
    from adampro_spark.pipeline.temporal import asof_join

    left = spark.createDataFrame(
        [(i, "K", float(i)) for i in range(10)], "lid long, k string, ts double"
    )
    right = spark.createDataFrame(
        [("K", None, 111), ("K", 4.5, 222)], "k string, ts double, payload long"
    )
    for kw in ({}, {"skew_threshold": 1}):
        got = {r["lid"]: r["payload"]
               for r in asof_join(left, right, time_col="ts", by="k",
                                  right_cols=["payload"], **kw).collect()}
        want = {i: (222 if i >= 5 else None) for i in range(10)}
        assert got == want, kw
    # unkeyed path agrees
    got_u = {r["lid"]: r["payload"]
             for r in asof_join(left.drop("k"), right.drop("k"),
                                time_col="ts", right_cols=["payload"]).collect()}
    assert got_u == {i: (222 if i >= 5 else None) for i in range(10)}


def test_range_join_explosion_guard(spark):
    """round 11: one sentinel-dated interval (span >> cap) must fail the
    job with a clear message instead of exploding span/width rows; an
    inverted interval (end < start) emits nothing; legitimate intervals
    are unaffected by the guard expression."""
    from adampro_spark.pipeline.temporal import range_join

    ev = spark.createDataFrame(
        [(1, 100.0), (2, 5000.0)], "event_id long, ts double"
    )
    good = spark.createDataFrame(
        [(10, 0.0, 7200.0)], "win long, start double, end double"
    )
    out = range_join(ev, good, bucket_width=3600.0)
    assert {r["event_id"] for r in out.collect()} == {1, 2}

    # sentinel end date: ~9999-12-31 in epoch seconds, ~70M hourly buckets
    dirty = spark.createDataFrame(
        [(11, 0.0, 253402300799.0)], "win long, start double, end double"
    )
    with pytest.raises(Exception, match="max_buckets_per_interval"):
        range_join(ev, dirty, bucket_width=3600.0).collect()
    # the same interval passes with an explicit higher cap + wider buckets
    ok = range_join(
        ev, dirty, bucket_width=3600.0 * 24 * 365,
        max_buckets_per_interval=10_000,
    )
    assert {r["event_id"] for r in ok.collect()} == {1, 2}

    inverted = spark.createDataFrame(
        [(12, 7200.0, 0.0)], "win long, start double, end double"
    )
    assert range_join(ev, inverted, bucket_width=3600.0).count() == 0
    left = range_join(ev, inverted, bucket_width=3600.0, how="left")
    rows = left.collect()
    assert {r["event_id"] for r in rows} == {1, 2}
    assert all(r["win"] is None for r in rows)
