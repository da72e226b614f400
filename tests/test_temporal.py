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
