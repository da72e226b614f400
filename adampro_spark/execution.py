"""Parallel / timed / progressive query execution (SURVEY §2.7).

Parity targets: ``query/execution/parallel/ParallelQueryHandler.scala:37-86``
(one future per access path, each completion fires an observer),
``ScanFuture.scala:21-57`` (confidence-tagged completions),
``TimedScanExpression.scala:19-67`` (poll until deadline, return the best
completed result), path choosers ``ParallelPathChooser.scala:35-135``.

Spark mapping: concurrent jobs on ONE SparkSession from a thread pool.
Each path runs in its own thread with its own job group (cancellable) and
FAIR-scheduler pool, exactly the reference's setup
(SequentialScanExpression.scala:43-44; SparkStartup fair mode).  Spark's
scheduler interleaves the jobs across executors — on a cluster each path
progresses concurrently instead of queueing FIFO behind the first scan.

Results are collected in the worker threads (materialization is the
completion event, as in ScanFuture.scala:30-35); the main thread observes
completions in finish order — the progressive-query stream — and
``timed_knn`` stops consuming at the deadline, returning the
best-confidence finished path (ParallelQueryHandler.scala:121-147).
"""

from __future__ import annotations

import threading
import time
import uuid
from concurrent.futures import FIRST_COMPLETED, Future, ThreadPoolExecutor, wait
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Observation:
    """One completed path (the reference's ProgressiveObservation,
    ScanFuture.scala:30-46)."""

    path: str
    confidence: float
    t_sec: float
    rows: list[Any] = field(default_factory=list)
    schema: Any | None = None
    error: Exception | None = None


def _run_path(
    spark: SparkSession,
    name: str,
    confidence: float,
    fn: Callable[[], DataFrame],
    group: str,
    pool: str,
    cancelled: "threading.Event | None" = None,
) -> Observation:
    sc = spark.sparkContext
    t0 = time.perf_counter()
    try:
        # deadline already passed before this path got a thread — don't
        # even start (cancelJobGroup cannot cancel a job that has not
        # been submitted yet, review r6)
        if cancelled is not None and cancelled.is_set():
            return Observation(
                name, confidence, 0.0, error=TimeoutError("deadline before start")
            )
        # job group + FAIR pool are thread-local in Spark — set in the
        # worker thread that triggers the job (the reference does the same
        # per scan expression)
        sc.setLocalProperty("spark.scheduler.pool", pool)
        sc.setJobGroup(group, f"parallel path {name}", interruptOnCancel=True)
        df = fn()  # driver-side planning (no job yet)
        if cancelled is not None and cancelled.is_set():
            return Observation(
                name, confidence, time.perf_counter() - t0,
                error=TimeoutError("deadline before job launch"),
            )
        rows = df.collect()
        return Observation(name, confidence, time.perf_counter() - t0, rows, df.schema)
    except Exception as e:  # surfaced to the caller per-path
        return Observation(name, confidence, time.perf_counter() - t0, error=e)
    finally:
        if cancelled is not None and cancelled.is_set():
            # close the submit-vs-cancel race: a job launched between the
            # sweep's cancelJobGroup and collect() re-cancels itself here
            try:
                sc.cancelJobGroup(group)
            except Exception:
                pass
        try:
            sc.setLocalProperty("spark.scheduler.pool", None)
        except Exception:
            pass


def parallel_query(
    spark: SparkSession,
    paths: dict[str, tuple[float, Callable[[], DataFrame]]],
    on_next: Callable[[Observation], None] | None = None,
    timeout_sec: float | None = None,
) -> list[Observation]:
    """Run every path concurrently; observe completions in finish order.

    ``paths``: name → (confidence, thunk building the DataFrame).
    ``on_next``: progressive observer (doProgressiveQuery,
    DataQuery.scala:327-360).  Returns all observations that finished
    before ``timeout_sec`` (None = wait for all); unfinished paths are
    cancelled via their job group.
    """
    group_base = f"adampro-parallel-{uuid.uuid4().hex[:8]}"
    deadline = None if timeout_sec is None else time.monotonic() + timeout_sec
    done_obs: list[Observation] = []
    futures: dict[Future, str] = {}
    groups: dict[str, str] = {}
    cancelled = threading.Event()

    # NOT a context manager: `with` exits through shutdown(wait=True),
    # which blocks past the deadline until every straggler path finishes
    # (review r6 — timed_knn(timeout_sec=1) used to return only when the
    # slowest path did).  shutdown(wait=False) below returns at the
    # deadline; cancelled paths wind down in the background.
    ex = ThreadPoolExecutor(max_workers=max(len(paths), 1))
    try:
        for i, (name, (conf, fn)) in enumerate(paths.items()):
            group = f"{group_base}-{name}"
            groups[name] = group
            fut = ex.submit(
                _run_path, spark, name, conf, fn, group,
                pool=f"pool{i % 4}", cancelled=cancelled,
            )
            futures[fut] = name

        pending = set(futures)
        while pending:
            budget = None if deadline is None else max(deadline - time.monotonic(), 0)
            finished, pending = wait(pending, timeout=budget, return_when=FIRST_COMPLETED)
            for fut in finished:
                obs = fut.result()
                done_obs.append(obs)
                if on_next is not None:
                    on_next(obs)
            if deadline is not None and time.monotonic() >= deadline:
                break

        # cancel whatever is still running (stopQuery semantics,
        # DataQuery.scala:413-425): flag first so not-yet-started paths
        # skip launching, then cancel the in-flight job groups
        if pending:
            cancelled.set()
        for fut, name in futures.items():
            if not fut.done():
                try:
                    spark.sparkContext.cancelJobGroup(groups[name])
                except Exception:
                    pass
    finally:
        ex.shutdown(wait=False)

    return done_obs


def timed_knn(
    spark: SparkSession,
    paths: dict[str, tuple[float, Callable[[], DataFrame]]],
    timeout_sec: float,
) -> tuple[Observation | None, list[Observation]]:
    """TimedScanExpression.scala:19-67: run paths concurrently, at the
    deadline return the best finished observation (highest confidence,
    then fastest).  Returns (best, all_finished)."""
    obs = parallel_query(spark, paths, timeout_sec=timeout_sec)
    ok = [o for o in obs if o.error is None]
    if not ok:
        return None, obs
    best = sorted(ok, key=lambda o: (-o.confidence, o.t_sec))[0]
    return best, obs


def knn_paths(
    ops,
    entity: str,
    attribute: str,
    query: Sequence[float],
    k: int,
    distance_name: str,
    df: DataFrame | None = None,
    pk: str = "ap_id",
) -> dict[str, tuple[float, Callable[[], DataFrame]]]:
    """SimpleParallelPathChooser (ParallelPathChooser.scala:36-60): the
    sequential scan plus every conforming non-stale index of the entity."""
    from adampro_spark.ops import CONFIDENCE, _conforms

    paths: dict[str, tuple[float, Callable[[], DataFrame]]] = {
        "sequential": (
            1.0,
            lambda: ops.query.sequential(
                entity, attribute, query, k, distance_name, df=df, pk=pk
            ),
        )
    }
    for name in ops.catalog.list_indexes(entity):
        rec = ops.catalog.index(name)
        if rec["attribute"] != attribute or rec.get("stale"):
            continue
        if not _conforms(rec["type"], rec.get("meta", {}), distance_name):
            continue
        paths[name] = (
            CONFIDENCE.get(rec["type"], 0.5),
            lambda n=name: ops.query.index(n, query, k, distance_name, df=df),
        )
    return paths
