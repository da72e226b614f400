"""Dataset assembly for LLM training: splitting, source mixing,
benchmark decontamination, and sequence packing.

No counterpart exists in the reference (it stops at retrieval); these are
the north-star curation extensions that sit between `curate()` and the
trainer, built the way the rest of the engine is built — deterministic,
hash-portable, and scale-shaped:

* :func:`split_dataset` — train/val/test assignment as a PURE FUNCTION of
  the primary key (portable polynomial hash → unit interval → cumulative
  weight bins).  Map-only, no shuffle, no RNG state: every engine that
  can hash reproduces the same split, rows keep their split under
  appends, and the assignment is stable across reruns/partitionings —
  the property per-row `rand()` does not have.
* :func:`sample_sources` — per-source Bernoulli down-sampling with the
  same keyed-hash coin.  Map-only; the per-source rates are a tiny plan
  literal (typically a handful of sources), not a join.
* :func:`mix_sources` — the up-sampling generalization: weight 3.0
  repeats a source three times (multi-epoch mixing), fractional parts
  by the same deterministic coin; one map-only explode.
* :func:`temperature_weights` — the Gopher/PaLM ``p^tau`` mixing rule:
  one driver-sized aggregation of source token (or document) shares →
  expectation-preserving multipliers for :func:`mix_sources`, with
  epoch-cap waterfilling.
* :func:`decontaminate` — drop training docs sharing any word n-gram
  with an evaluation set (the standard 13-gram eval-contamination rule).
  Shapes as: explode both sides to n-gram hashes → LEFT SEMI join to tag
  contaminated docs → anti-join survivors.  The eval side is tiny by
  definition, so the semi-join broadcasts; the training text itself is
  never shuffled (only (pk, gram_hash) pairs).  ``method="bloom"`` is
  the ZERO-shuffle variant: eval grams compile into a driver-built
  Bloom filter checked by one map-only Arrow projection — false
  positives over-drop at the configured ``fpp``, never under-drop.
* :func:`pack_sequences` — greedy first-fit packing of documents into
  fixed-token-budget training sequences.  Exact bin packing is
  inherently sequential, so the scale formulation shards by hash into
  independent packing groups and runs the greedy loop per shard inside
  one ``applyInPandas`` pass (deterministic doc order within a shard);
  pack ids are (shard, local) pairs bit-packed into a long.  Waste is
  bounded by the per-shard tail pack: shards pack independently, so at
  most ``num_shards`` under-filled packs exist — noise at corpus scale.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from adampro_spark.pipeline.text import (
    HASH_P,
    char_codes,
    poly_hash,
    tokens_expr,
)

__all__ = [
    "split_dataset",
    "sample_sources",
    "mix_sources",
    "shuffle_dataset",
    "temperature_weights",
    "decontaminate",
    "decontamination_gate_flags",
    "pack_sequences",
]


# universal-hash mixing constants for the split/sample coin (any fixed
# multiplier in (1, P-1) works; these are primes)
_MIX_A = 961_748_941
_MIX_B = 787


def _unit_hash(pk: str | Column, salt: str) -> Column:
    """Deterministic hash of (salt || pk-as-string) mapped to [0, 1).

    The raw 31-polynomial is nearly LINEAR in a trailing counter
    (consecutive pks differ by 1), so it is useless as a coin on
    sequential keys; the final universal-hash step ``(a·h + b) mod P``
    is a bijection that turns the unit step into an ~a/P stride — the
    mapped values of sequential keys equidistribute over [0, 1).  Unlike
    ``F.hash``/``xxhash64`` the whole chain has an exact DuckDB mirror,
    so split membership itself is oracle-checkable.
    """
    return _mixed_hash(pk, salt) / F.lit(float(HASH_P))


def _mixed_hash(pk: str | Column, salt: str) -> Column:
    """The integer universal-hash chain behind every mix.py coin and the
    shuffle key: ``(poly_hash(salt|pk)·a + b) mod P`` — ONE definition,
    mirrored by the oracle SQL builders."""
    col = pk if isinstance(pk, Column) else F.col(pk)
    key = F.concat(F.lit(salt), F.lit("|"), col.cast("string"))
    h = poly_hash(char_codes(key))
    return (h * F.lit(_MIX_A) + F.lit(_MIX_B)) % F.lit(HASH_P)


def split_dataset(
    df: DataFrame,
    weights: Mapping[str, float],
    pk: str = "doc_id",
    salt: str = "split",
    col: str = "split",
    by: str | None = None,
) -> DataFrame:
    """Assign every row to a named split with probability proportional to
    ``weights`` (e.g. ``{"train": 0.98, "val": 0.01, "test": 0.01}``),
    as a pure function of ``hash(salt, pk)``.

    Properties the trainer relies on: (a) deterministic — reruns, engine
    versions, and repartitionings agree; (b) append-stable — new rows
    never move old rows across splits; (c) disjoint and exhaustive.
    Map-only: the cumulative bins are plan literals.

    ``by`` (round 12, LEAKAGE-SAFE grouped split): hash that column
    instead of the pk, so every row sharing a group key — a URL host, a
    source, a near-dup family label (join ``dup_groups``'s ``survivor``
    on first) — lands in the SAME split.  Row-wise splitting puts one
    member of a near-duplicate family in train and its twin in test,
    which is exactly the eval leakage decontamination exists to prevent;
    grouped splitting closes it structurally.  Still map-only and
    append-stable (a new family member follows its family).  NULL group
    keys fall back to the row's own pk hash — NULL is the absence of a
    family, not one giant family (a coalesced NULL group would dump
    every keyless row into a single split).
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    if by is not None:
        u = F.when(
            F.col(by).isNotNull(), _unit_hash(by, salt)
        ).otherwise(_unit_hash(pk, salt))
    else:
        u = _unit_hash(pk, salt)
    # cumulative upper bounds; last bin closes at 1.0 exactly
    names = list(weights)
    acc = 0.0
    expr: Column | None = None
    for name in names[:-1]:
        acc += float(weights[name]) / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    return df.withColumn(col, last if expr is None else expr.otherwise(last))


def sample_sources(
    df: DataFrame,
    rates: Mapping[str, float],
    source_col: str = "source",
    pk: str = "doc_id",
    salt: str = "sample",
    default_rate: float = 1.0,
) -> DataFrame:
    """Per-source Bernoulli down-sampling with a keyed-hash coin: a row of
    source ``s`` survives iff ``hash(salt, pk) < rates.get(s, default)``.
    The standard mixing knob (down-weight a crawl, keep curated sources
    at 1.0) as ONE map-only filter — deterministic and append-stable like
    :func:`split_dataset`.  Rates are plan literals; no join, no RNG.
    """
    for s, r in rates.items():
        if not (0.0 <= float(r) <= 1.0):
            raise ValueError(f"rate for {s!r} must be in [0, 1], got {r}")
    if not (0.0 <= float(default_rate) <= 1.0):
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    u = _unit_hash(pk, salt)
    rate: Column = F.lit(float(default_rate))
    for s, r in rates.items():
        rate = F.when(F.col(source_col) == F.lit(s), F.lit(float(r))).otherwise(
            rate
        )
    return df.filter(u < rate)


# Upper bound on a mix weight = per-row copy count (round 11, the
# range_join explosion-guard family): no real mixing recipe repeats a
# source 10,000x, but a units mistake would multiply the corpus by it.
_MAX_MIX_WEIGHT = 10_000.0


def mix_sources(
    df: DataFrame,
    weights: Mapping[str, float],
    source_col: str = "source",
    pk: str = "doc_id",
    salt: str = "mix",
    default_weight: float = 1.0,
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Source re-weighting with UP-sampling: a row of source ``s`` with
    weight ``w`` appears ``floor(w)`` times plus one more with
    probability ``frac(w)`` (the standard multi-epoch mixing rule —
    ``{"wiki": 3.0, "crawl": 0.5}`` repeats wiki 3× and halves the
    crawl).  Copies are distinguished by ``copy_col`` (0..n-1), since
    the pk alone no longer identifies a row; run dedup BEFORE mixing.

    Same deterministic keyed-hash coin as :func:`sample_sources`
    (append-stable, rerun-stable); one map-only ``explode`` of a
    per-row ``sequence``, weights are plan literals — no join, no RNG,
    no shuffle.
    """
    for s, w in weights.items():
        if not 0 <= float(w) <= _MAX_MIX_WEIGHT:
            raise ValueError(
                f"weight for {s!r} must be in [0, {_MAX_MIX_WEIGHT}], got "
                f"{w} — a weight IS a per-row copy count (explosion "
                "factor); mis-typed weights (epochs*1e6, epoch-seconds) "
                "would multiply the corpus silently"
            )
    if not 0 <= float(default_weight) <= _MAX_MIX_WEIGHT:
        raise ValueError(
            f"default_weight must be in [0, {_MAX_MIX_WEIGHT}], got "
            f"{default_weight}"
        )
    u = _unit_hash(pk, salt)
    w_expr: Column = F.lit(float(default_weight))
    for s, w in weights.items():
        w_expr = F.when(
            F.col(source_col) == F.lit(s), F.lit(float(w))
        ).otherwise(w_expr)
    base = F.floor(w_expr).cast("int")
    n = base + (u < (w_expr - base)).cast("int")
    # sequence(0, -1) would step BACKWARDS ([0, -1]); empty-array guard
    # instead, and explode drops the row entirely when n == 0
    copies = F.when(
        n > 0, F.sequence(F.lit(0), n - 1)
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn(copy_col, F.explode(copies))


def shuffle_dataset(
    df: DataFrame,
    pk: str = "doc_id",
    salt: str = "shuffle",
    key_col: str | None = None,
) -> DataFrame:
    """Deterministic global training-order shuffle: sort the corpus by
    the keyed portable hash ``(hash(salt|pk), pk)`` — the final step of
    a training pipeline, so examples arrive in pseudo-random order
    instead of crawl/source order.

    Properties: (a) deterministic and engine-portable — the sort key is
    the same oracle-checkable hash chain as :func:`split_dataset`, so
    reruns and other engines reproduce the exact permutation; (b)
    re-shuffling per epoch is just a new ``salt``; (c) append-stable in
    the sense that a new row lands at a position that is a pure function
    of its pk, displacing nothing relatively.

    ``key_col`` (optional) exposes the INTEGER sort key as a column —
    downstream writers can range-partition on it, and the oracle can
    adjudicate the full permutation without materializing ranks.

    At scale: one ``orderBy`` = range-repartition + per-partition sort
    (the one unavoidable shuffle of a global reorder); the hash key is
    uniform by construction so range partitions balance regardless of
    pk skew.  For per-file-local order at zero global-sort cost, write
    with ``df.repartition(n, F.col(key)).sortWithinPartitions(key)``.
    """
    mixed = _mixed_hash(pk, salt)
    if key_col is not None:
        return df.withColumn(key_col, mixed).orderBy(key_col, pk)
    return df.orderBy(mixed, F.col(pk))


def temperature_weights(
    df: DataFrame,
    tau: float,
    source_col: str = "source",
    text_col: str | None = "text",
    max_weight: float | None = None,
    mass_col: Column | None = None,
) -> dict[str, float]:
    """Temperature-based source re-weighting (the Gopher / PaLM mixing
    rule): sampling probability ``q_s ∝ p_s^tau`` where ``p_s`` is the
    source's share of the corpus (TOKEN share when ``text_col`` is
    given, document share with ``text_col=None``).  ``tau = 1``
    reproduces natural proportions, ``tau = 0`` weights every source
    equally, intermediate values up-weight small curated sources
    without drowning the crawl.

    Returns per-source multipliers for :func:`mix_sources` — ``w_s =
    q_s / p_s``, normalized so the EXPECTED corpus size is unchanged
    (``Σ_s n_s · w_s = Σ_s n_s``); pass the dict straight through:
    ``mix_sources(df, temperature_weights(df, 0.7))``.  ``max_weight``
    caps the multiplier (small sources would otherwise repeat for many
    epochs; Gopher capped wiki/books at a few epochs) — the cap is
    applied BEFORE normalization, so capped fits still keep the
    expected size within the cap's distortion.

    ``mass_col`` overrides the mass expression entirely — pass a
    TRAINED token count (``bpe.bpe_token_count_col(merges)``) so the
    temperature mix is computed in the same units the downstream model
    trains in, instead of the whitespace-token share.

    One aggregation (≤ |sources| rows to the driver); the weights are
    plan literals from there on — the fit is driver-sized by
    construction, like the LM and DSIR fit boundaries.
    """
    if tau < 0:
        raise ValueError(f"tau must be >= 0, got {tau}")
    if mass_col is not None:
        mass = mass_col.cast("double")
    else:
        mass = (
            F.size(tokens_expr(text_col)).cast("double")
            if text_col is not None
            else F.lit(1.0)
        )
    rows = (
        df.select(F.col(source_col).alias("_s"), mass.alias("_m"))
        .groupBy("_s")
        .agg(F.sum("_m").alias("_n"))
        .collect()
    )
    n = {r["_s"]: float(r["_n"]) for r in rows if r["_n"] and r["_n"] > 0}
    if not n:
        raise ValueError("no non-empty sources to weight")
    total = sum(n.values())
    q = {s: (v / total) ** float(tau) for s, v in n.items()}
    qt = sum(q.values())
    # already expectation-preserving: sum_s n_s * w_s = total exactly
    w = {s: (q[s] / qt) / (n[s] / total) for s in n}
    if max_weight is not None:
        if max_weight <= 0:
            raise ValueError(f"max_weight must be > 0, got {max_weight}")
        cap = float(max_weight)
        # waterfilling: pin capped sources at the cap and rescale the
        # rest to preserve the expected size; a plain global rescale
        # would push capped weights back over the cap.  Terminates in
        # <= |sources| rounds (the capped set only grows).
        capped: set[str] = set()
        while True:
            newly = {s for s in w if s not in capped and w[s] > cap}
            if not newly:
                break
            capped |= newly
            for s in capped:
                w[s] = cap
            free = [s for s in w if s not in capped]
            if not free:
                break  # everything capped; expected size shrinks to cap
            budget = total - sum(n[s] * cap for s in capped)
            cur = sum(n[s] * w[s] for s in free)
            if budget <= 0 or cur <= 0:
                break
            for s in free:
                w[s] *= budget / cur
    return w


def _token_hashes(text: str | Column) -> Column:
    """Per-token poly hashes — char-hash each token exactly once."""
    return F.transform(tokens_expr(text), lambda t: poly_hash(char_codes(t)))


def _grams_from_token_hashes(
    th: Column, n: int, distinct: bool = True
) -> Column:
    """Distinct n-gram hashes from a MATERIALIZED token-hash array: every
    n-token window folds its n hashes ((a·31 + h) mod P).

    ``th`` must be a plain column reference, not the token-hash
    expression itself: an expression argument gets inlined by Catalyst
    into every window's lambda (CollapseProject), re-hashing the whole
    document per window — measured 13.5 s vs 1.5 s at sf0.1.  The
    one-level form (char-hash each joined window string) is the other
    trap: it re-hashes every character n times (6.4 s).  Two selects —
    materialize, then window-fold — is the fast shape; still plain
    portable arithmetic (DuckDB: list_transform + list_reduce over
    list_slice), no UDF.

    ``distinct=False`` keeps EVERY window (duplicates included) — the
    contamination REPORT counts window occurrences, where the dedup of
    the membership paths would under-count repetitive documents
    (review r12)."""
    k = F.size(th)
    idx = F.sequence(F.lit(1), F.greatest(k - (n - 1), F.lit(1)))
    grams = F.transform(
        idx,
        lambda i: F.aggregate(
            F.slice(th, i, n),
            F.lit(0).cast("long"),
            lambda acc, h: (acc * 31 + h) % F.lit(HASH_P),
        ),
    )
    return F.array_distinct(grams) if distinct else grams


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    pk: str = "doc_id",
    eval_text_col: str | None = None,
    n: int = 13,
    method: str = "semi",
    fpp: float = 1e-6,
    max_eval_grams: int = 50_000_000,
    max_broadcast_grams: int = 5_000_000,
) -> DataFrame:
    """Remove training documents that share ANY word ``n``-gram with the
    evaluation corpus — the standard eval-decontamination rule (n = 13
    in the GPT-3 / PaLM data reports; documents shorter than ``n`` tokens
    contribute their full token sequence as one gram).

    ``method="semi"`` (default, exact) at 100 TB: train side explodes to
    a slim ``(pk, gram)`` table (the text column is never shuffled); the
    eval side's distinct gram set is small by definition (eval suites
    are thousands of docs) and broadcasts into a LEFT SEMI join that
    tags contaminated pks; one anti-join keeps the survivors.  No
    similarity math, no all-pairs.

    ``method="bloom"`` is the ZERO-SHUFFLE scale path: the eval gram set
    compiles into a driver-built Bloom filter (``fpp`` false-positive
    rate) checked by ONE Arrow-batched map-only projection — no explode
    of the training grams into rows, no distinct, no semi/anti join;
    the whole operator is a single scan of ``train``.  False positives
    DROP a clean document (never keep a contaminated one) — the
    conservative direction for decontamination; expected over-drop is
    ≈ ``fpp · Σ grams(doc)`` documents.  Eval sets above
    ``max_eval_grams`` distinct grams raise (the filter is driver-built
    and broadcast; use ``method="semi"`` there).

    ``max_broadcast_grams`` (round 13): the semi path broadcasts the
    eval gram set only while its distinct-gram count stays at or below
    this bound (count-then-route); above it the join degrades to a
    shuffle semi-join with a warning instead of forcing a multi-GB
    broadcast.
    """
    ev_col = eval_text_col or text_col
    ev_grams = _eval_grams(eval_df, ev_col, n)
    if method == "bloom":
        return _decontaminate_bloom(
            train, ev_grams, text_col, n, float(fpp), int(max_eval_grams)
        )
    if method != "semi":
        raise ValueError(f"method must be 'semi' or 'bloom', got {method!r}")
    tr_grams = train.select(
        F.col(pk).alias("_pk"), _token_hashes(text_col).alias("_th")
    ).select(
        "_pk", F.explode(_grams_from_token_hashes(F.col("_th"), n)).alias("_g")
    )
    contaminated = (
        tr_grams.join(
            _route_eval_grams(ev_grams, max_broadcast_grams), "_g", "left_semi"
        )
        .select(F.col("_pk").alias(pk))
        .distinct()
    )
    return train.join(contaminated, pk, "left_anti")


def _route_eval_grams(ev_grams: DataFrame, max_broadcast_grams: int) -> DataFrame:
    """Count-then-route the eval gram set (round 13, verdict r12 #4 —
    the house asof/assign pattern): the exact semi paths used to FORCE
    ``broadcast(ev_grams)`` on the docstring contract that eval suites
    are small, with no guard — a huge eval set would force a multi-GB
    broadcast instead of degrading.  At or below the threshold the plan
    is unchanged (broadcast hash semi-join); above it the join falls
    back to a plain shuffle semi-join and a warning suggests
    ``method="bloom"`` (which sizes/guards its driver-built filter via
    ``max_eval_grams``).  The probe is ``limit(threshold+1).count()`` —
    bounded by the threshold, so a huge eval set stops deriving grams
    once the answer is known and a small one costs one tiny job (review
    r13: a full ``count()`` re-derived the whole gram lineage twice)."""
    cap = int(max_broadcast_grams)
    n_grams = ev_grams.limit(cap + 1).count()
    if n_grams <= cap:
        return F.broadcast(ev_grams)
    import warnings

    warnings.warn(
        f"decontamination eval gram set exceeds max_broadcast_grams={cap} "
        "distinct grams; routing to a shuffle semi-join instead of a "
        "broadcast — consider method='bloom' for a zero-shuffle scan at "
        "this scale",
        stacklevel=3,
    )
    return ev_grams


def _eval_grams(eval_df: DataFrame, ev_col: str, n: int) -> DataFrame:
    """Distinct n-gram hashes of the eval corpus — the one derivation
    both decontaminate paths AND the curate gate share.  Two selects:
    materialize the token-hash array first so the window fold sees a
    column reference (see _grams_from_token_hashes)."""
    return (
        eval_df.select(_token_hashes(ev_col).alias("_th"))
        .select(F.explode(_grams_from_token_hashes(F.col("_th"), n)).alias("_g"))
        # a NULL-text eval row can surface as a NULL gram; the semi-join
        # path tolerates it silently (NULL never joins) but the bloom
        # path's np.array(..., dtype=int64) would raise on None — drop
        # NULLs so both methods see the same gram set (ADVICE r11)
        .filter(F.col("_g").isNotNull())
        .distinct()
    )


def _bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """Classic Bloom sizing: ``m = -n·ln(fpp)/ln²2`` bits, rounded UP to
    a power of two, ``k = (m/n)·ln2`` probes.  The power-of-two rounding
    is CANONICAL SIZING, not a correctness requirement: ``_bloom_probe``
    uses an independent splitmix64 avalanche per probe (double hashing
    was abandoned for measured FP inflation — see its docstring), whose
    ``% m`` is uniform for any m.  Rounding up keeps m word-aligned,
    makes the modulo a cheap mask where numpy can use it, and only ever
    LOWERS the realized FP rate below the target (the direction the
    decontamination guarantee needs)."""
    import math

    m = max(64, int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))))
    m = 1 << (m - 1).bit_length()
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _bloom_probe(g, i: int, m: int):
    """Probe ``i``'s bit position for every gram in ``g`` — a FULL
    splitmix64 avalanche of ``g + (i+1)·golden`` per probe, so the k
    probes are INDEPENDENT hashes.  Double hashing (h1 + i·h2) from one
    base hash was measured 25–200× over the target FP rate at small m:
    gram hashes carry only ~30 bits and progressions with equal strides
    overlap coherently.  One avalanche per probe per gram is ~k cheap
    uint64 ops, vectorized; probes loop OUTSIDE the gram axis so peak
    memory stays one uint64 array per batch."""
    import numpy as np

    # per-probe offset computed in Python ints (numpy warns on intended
    # scalar uint64 wraparound)
    off = np.uint64(((i + 1) * 0x9E3779B97F4A7C15) % (1 << 64))
    x = g.astype(np.uint64) + off
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x % np.uint64(m)


def _bloom_insert(words, items, m: int, k: int) -> None:
    import numpy as np

    for i in range(k):
        pos = _bloom_probe(items, i, m)
        np.bitwise_or.at(
            words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )


def _bloom_contains(words, g, m: int, k: int):
    """Membership (all k probes set) for every gram in ``g``."""
    import numpy as np

    ok = np.ones(len(g), dtype=bool)
    for i in range(k):
        pos = _bloom_probe(g[ok], i, m)
        hit = (
            words[(pos >> np.uint64(6)).astype(np.int64)]
            & (np.uint64(1) << (pos & np.uint64(63)))
        ) != 0
        ok[np.flatnonzero(ok)[~hit]] = False
        if not ok.any():
            break
    return ok


def _fold_grams_np(flat, lens, n: int):
    """Numpy mirror of :func:`_grams_from_token_hashes`'s window fold
    over a FLATTENED batch: ``flat`` is every document's token hashes
    concatenated, ``lens`` the per-document token counts.  Returns
    ``(gram_values, doc_of_window)`` — one gram per n-token window
    (documents shorter than ``n`` contribute their full sequence as one
    gram, matching the Spark expression's ``greatest(k-(n-1), 1)``).
    Duplicates are NOT removed: membership-ANY doesn't need distinct."""
    import numpy as np

    d = len(lens)
    # lens < 0 encodes NULL token arrays (no grams at all); lens == 0 is
    # an EMPTY array, which the Spark expression gives ONE gram (the fold
    # over an empty slice = 0) — the semi-join path matches whitespace-only
    # docs on that gram 0, so the bloom path must too (review r11: the
    # old lens>0 guard made bloom UNDER-drop vs semi on empty-text docs)
    nw = np.where(lens < 0, 0, np.maximum(lens - (n - 1), 1))
    doc_of_win = np.repeat(np.arange(d), nw)
    plens = np.maximum(lens, 0)  # NULL sentinel -1 holds no flat slots
    starts = np.repeat(np.concatenate(([0], np.cumsum(plens)[:-1])), nw)
    # local window offset within each doc
    wi = np.arange(nw.sum()) - np.repeat(
        np.concatenate(([0], np.cumsum(nw)[:-1])), nw
    )
    base = starts + wi
    ends = starts + np.repeat(plens, nw)  # doc end per window
    acc = np.zeros(len(base), dtype=np.int64)
    # empty batch of tokens: every window is over an empty slice (valid
    # is all-False), but the clamped gather still needs one real slot
    flat_safe = flat if len(flat) else np.zeros(1, dtype=np.int64)
    for j in range(n):
        idx = base + j
        valid = idx < ends
        acc = np.where(
            valid,
            (acc * 31 + flat_safe[np.minimum(idx, len(flat_safe) - 1)])
            % HASH_P,
            acc,
        )
    return acc, doc_of_win


def _contaminated_col(
    ev_grams: DataFrame,
    text_col: str | Column,
    n: int,
    fpp: float,
    max_eval_grams: int,
) -> Column | None:
    """Boolean "shares an n-gram with the eval set" column: collect the
    eval gram hashes, compile the Bloom filter, return the Arrow-batched
    membership check over ``text_col``.  ``None`` when the eval set is
    empty (nothing can be contaminated)."""
    import numpy as np
    import pandas as pd

    built = _build_eval_bloom(ev_grams, fpp, max_eval_grams)
    if built is None:
        return None
    words, m, k = built

    # no type hints: under `from __future__ import annotations` they are
    # strings and pandas_udf's hint inference rejects them.  The UDF
    # receives TOKEN HASHES, not grams: the gram window fold runs in
    # numpy here (n vectorized passes) — measured 5x cheaper than the
    # Catalyst slice+aggregate HOF per window, and it halves the Arrow
    # payload (tokens, not n-per-token gram values)
    def _any_in_bloom(token_hashes):
        # NULL text -> NULL token array: counts as no grams (kept), the
        # same outcome the semi-join path gives a NULL-text document
        batch = _batch_gram_fold(token_hashes, n)
        if batch is None:
            return pd.Series(np.zeros(len(token_hashes), dtype=bool))
        grams, doc_of_win = batch
        hit = _bloom_contains(words, grams, m, k)
        out = np.bincount(doc_of_win, weights=hit, minlength=len(token_hashes)) > 0
        return pd.Series(out)

    from pyspark.sql import types as T

    udf = F.pandas_udf(_any_in_bloom, T.BooleanType())
    return udf(_token_hashes(text_col))


def _build_eval_bloom(
    ev_grams: DataFrame, fpp: float, max_eval_grams: int
) -> "tuple | None":
    """Driver-built Bloom filter over the eval gram set — ``(words, m,
    k)``, or ``None`` for an empty eval set.  ONE implementation for the
    membership and counting kernels (review r12: two near-verbatim
    copies would drift on the next cap/fpp/NULL fix)."""
    import numpy as np

    if not 0.0 < fpp < 0.5:
        raise ValueError(
            f"fpp must be in (0, 0.5), got {fpp} — a mistyped rate (1e6 "
            "for 1e-6) would build a saturated filter that silently "
            "drops the whole corpus"
        )
    ev = ev_grams.limit(max_eval_grams + 1).collect()
    if len(ev) > max_eval_grams:
        raise ValueError(
            f"eval corpus exceeds max_eval_grams={max_eval_grams} distinct "
            "n-grams — the Bloom filter is driver-built; raise the cap or "
            "use method='semi'"
        )
    if not ev:
        return None
    items = np.array([r[0] for r in ev], dtype=np.int64)
    m, k = _bloom_params(len(items), fpp)
    words = np.zeros(m // 64, dtype=np.uint64)
    _bloom_insert(words, items, m, k)
    return words, m, k


def _batch_gram_fold(token_hashes, n: int):
    """Per-Arrow-batch preamble shared by the bloom kernels: NULL-token
    encoding (lens -1), flattening, and the numpy window fold.  Returns
    ``(grams, doc_of_win)`` or ``None`` for an all-NULL batch."""
    import numpy as np

    lens = np.array(
        [-1 if t is None else len(t) for t in token_hashes],
        dtype=np.int64,
    )
    if (lens >= 0).sum() == 0:
        return None
    arrs = [
        np.asarray(t, dtype=np.int64) for t in token_hashes if t is not None
    ]
    flat = np.concatenate(arrs) if arrs else np.array([], dtype=np.int64)
    return _fold_grams_np(flat, lens, n)


def _decontaminate_bloom(
    train: DataFrame,
    ev_grams: DataFrame,
    text_col: str,
    n: int,
    fpp: float,
    max_eval_grams: int,
) -> DataFrame:
    bad = _contaminated_col(ev_grams, text_col, n, fpp, max_eval_grams)
    return train if bad is None else train.filter(~bad)


def decontamination_gate_flags(
    eval_df: DataFrame,
    text_col: str = "text",
    eval_text_col: str | None = None,
    n: int = 13,
    fpp: float = 1e-6,
    max_eval_grams: int = 50_000_000,
) -> dict[str, Column]:
    """Eval-decontamination as a CURATE GATE: the Bloom-filter
    contamination check (see :func:`decontaminate` ``method="bloom"``)
    packaged as a ``{"_decon_ok": Column}`` flag for
    ``curate(extra_gates=...)`` / ``stream_curate`` — the check rides
    curate's one-scan gate pass (and streams unchanged: the filter is a
    stateless map), and the report gains ``n_fail_decon_ok`` attrition
    for free.  The eval set is collected ONCE here, at gate-build time.
    """
    ev_col = eval_text_col or text_col
    ev_grams = _eval_grams(eval_df, ev_col, n)
    bad = _contaminated_col(ev_grams, text_col, n, float(fpp), int(max_eval_grams))
    ok = F.lit(True) if bad is None else ~bad
    return {"_decon_ok": ok}


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    eval_text_col: str | None = None,
    n: int = 13,
    pk: str = "doc_id",
    method: str = "semi",
    fpp: float = 1e-6,
    max_eval_grams: int = 50_000_000,
    max_broadcast_grams: int = 5_000_000,
) -> DataFrame:
    """Per-document train/eval overlap REPORT (round 12) — the measuring
    companion of :func:`decontaminate`: ``(pk, n_grams, n_matched,
    contamination)`` where ``n_grams`` counts the document's n-gram
    WINDOWS (duplicates included; documents shorter than ``n`` tokens
    contribute their full sequence as one gram, NULL text contributes
    zero) and ``n_matched`` those present in the eval gram set —
    ``contamination`` is their ratio.  The Dolma-style overlap audit: a
    pipeline measures leakage and picks thresholds BEFORE committing to
    a binary drop, and evaluation reports quote per-benchmark overlap
    fractions.

    ``method="semi"`` (default, exact): the same slim ``(pk, gram)``
    explode as decontaminate, LEFT-joined against the broadcast eval
    gram set with a conditional count — one shuffle of hashes, text
    never moves.  ``method="bloom"``: the zero-shuffle map-only Arrow
    kernel counts Bloom hits per document in one scan — counts can only
    OVER-state contamination, by ≈ ``fpp`` per window (the conservative
    direction), so use it for monitoring at scale and ``"semi"`` for
    exact audits.  ``decontaminate(...)`` drops exactly the documents
    this report gives ``n_matched > 0``.
    """
    ev_col = eval_text_col or text_col
    ev_grams = _eval_grams(eval_df, ev_col, n)
    frac = F.when(
        F.col("n_grams") > 0, F.col("n_matched") / F.col("n_grams")
    ).otherwise(F.lit(0.0))
    if method == "bloom":
        counts = _contamination_counts_col(
            ev_grams, text_col, n, float(fpp), int(max_eval_grams)
        )
        if counts is None:
            # empty eval set: nothing can match — window counts only.
            # NULL text must report 0 windows (size() of a NULL array is
            # NULL/-1 depending on legacy conf; guard explicitly)
            nw = F.when(
                F.col(text_col).isNull(), F.lit(0).cast("long")
            ).otherwise(
                F.greatest(
                    F.size(tokens_expr(text_col)).cast("long") - F.lit(n - 1),
                    F.lit(1),
                )
            )
            counts = F.array(nw, F.lit(0).cast("long"))
        return train.select(
            F.col(pk), counts.alias("_ap_cnt")
        ).select(
            pk,
            F.element_at("_ap_cnt", 1).alias("n_grams"),
            F.element_at("_ap_cnt", 2).alias("n_matched"),
        ).withColumn("contamination", F.round(frac, 6))
    if method != "semi":
        raise ValueError(f"method must be 'semi' or 'bloom', got {method!r}")
    tr_grams = train.select(
        F.col(pk).alias("_pk"), _token_hashes(text_col).alias("_th")
    ).select(
        "_pk",
        # explode_outer: a NULL-text document keeps its row (0 grams) —
        # the report must cover the whole corpus, unlike the drop path.
        # distinct=False: the report counts WINDOW occurrences; the drop
        # paths' dedup would under-count repetitive documents (a doc
        # repeating one contaminated gram 50 times is 100% contaminated,
        # not 1-of-distinct) — review r12
        F.explode_outer(
            _grams_from_token_hashes(F.col("_th"), n, distinct=False)
        ).alias("_g"),
    )
    per = (
        tr_grams.join(
            _route_eval_grams(
                ev_grams.withColumn("_ap_hit", F.lit(1)), max_broadcast_grams
            ),
            "_g",
            "left",
        )
        .groupBy("_pk")
        .agg(
            F.sum(F.col("_g").isNotNull().cast("long")).alias("n_grams"),
            F.coalesce(F.sum("_ap_hit"), F.lit(0)).cast("long").alias(
                "n_matched"
            ),
        )
    )
    return per.select(
        F.col("_pk").alias(pk), "n_grams", "n_matched"
    ).withColumn("contamination", F.round(frac, 6))


def _contamination_counts_col(
    ev_grams: DataFrame,
    text_col: str | Column,
    n: int,
    fpp: float,
    max_eval_grams: int,
) -> Column | None:
    """``array<long> [n_gram_windows, n_bloom_hits]`` per document — the
    counting sibling of :func:`_contaminated_col` (shared driver-built
    filter and batch fold via ``_build_eval_bloom``/``_batch_gram_fold``,
    one more bincount).  ``None`` when the eval set is empty."""
    import numpy as np
    import pandas as pd

    built = _build_eval_bloom(ev_grams, fpp, max_eval_grams)
    if built is None:
        return None
    words, m, k = built

    def _count_hits(token_hashes):
        d = len(token_hashes)
        batch = _batch_gram_fold(token_hashes, n)
        if batch is None:
            return pd.Series([[0, 0]] * d)
        grams, doc_of_win = batch
        hit = _bloom_contains(words, grams, m, k)
        tot = np.bincount(doc_of_win, minlength=d).astype(np.int64)
        mat = np.bincount(
            doc_of_win, weights=hit, minlength=d
        ).astype(np.int64)
        return pd.Series([[int(t), int(h)] for t, h in zip(tot, mat)])

    from pyspark.sql import types as T

    udf = F.pandas_udf(_count_hits, T.ArrayType(T.LongType()))
    return udf(_token_hashes(text_col))


def emit_packed(
    df: DataFrame,
    text_col: str = "text",
    pk: str = "doc_id",
    sep: str = "\n\n",
    pack_col: str = "pack_id",
    pos_col: str = "pack_pos",
) -> DataFrame:
    """Materialize each training pack as ONE row (round 12 — the emit
    step after :func:`pack_sequences`): ``(pack_id, n_docs, pks, text)``
    where ``text`` is the members' ``text_col`` joined by ``sep`` in
    ``pack_pos`` order — i.e. in the SHUFFLE order when the packs were
    built with ``order_col=`` (``shuffle_dataset`` → ``pack_sequences``
    → ``emit_packed`` is the full training-data emit chain), and ``pks``
    is the same-order provenance list for attribution/debugging.

    One groupBy on ``pack_col``: members collect into a sorted
    struct array (bounded by the pack budget — a pack holds at most
    ``budget`` tokens by construction, so the per-group state is small
    and NO pack can become a hot key).  NULL member text joins as the
    empty string (the document was counted by its token column, not its
    text).  Map-side combine applies; the output is one row per pack,
    ready for ``writeStream``/parquet emit partitioned by pack range.
    """
    packed = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(pos_col).alias("p"),
                F.col(pk).alias("k"),
                F.col(text_col).alias("t"),
            )
        )
    )
    return (
        df.groupBy(F.col(pack_col))
        .agg(packed.alias("_m"))
        .select(
            pack_col,
            F.size("_m").alias("n_docs"),
            F.transform(F.col("_m"), lambda m: m["k"]).alias("pks"),
            F.array_join(
                F.transform(F.col("_m"), lambda m: m["t"]),
                sep,
                "",  # NULL text -> empty string, never a dropped slot
            ).alias("text"),
        )
    )


_PACK_SHARD_BITS = 20  # up to ~1M local packs per shard


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    pk: str = "doc_id",
    num_shards: int | None = None,
    truncate_oversize: bool = False,
    order_col: str | None = None,
) -> DataFrame:
    """Assign each document to a training pack such that every pack's
    total ``token_col`` is ≤ ``budget`` (greedy first-fit in deterministic
    pk order).  Returns ``df`` plus ``pack_id`` (long) and ``pack_pos``
    (the document's position within its pack).

    Scale shape: docs shard by ``hash(pk) % num_shards`` (default = the
    session's shuffle parallelism) and each shard packs independently in
    one ``applyInPandas`` pass — the greedy loop is per-shard sequential
    (bin packing is), but shards run in parallel and pack ids are
    ``(shard << 20) | local``.  Only (pk, n_tokens) shuffles; the caller
    joins packs back to payloads by pk if needed.  Waste: each shard
    leaves at most one under-filled tail pack.

    Docs with ``n_tokens > budget`` raise unless ``truncate_oversize``,
    which caps their contribution at ``budget`` (one doc alone in a pack
    — the trainer's truncation contract).

    ``order_col`` (round 12, verdict r11 #7): the packing ORDER.  By
    default packs fill in pk order, which silently DISCARDS a preceding
    :func:`shuffle_dataset` — the model would still read pk-ordered
    text inside every pack.  Pass the shuffle's exposed sort key
    (``shuffle_dataset(key_col="_order")``) and each shard packs in
    ``(order_col, pk)`` order instead, so every pack's internal document
    order is a subsequence of the global shuffle permutation — the
    training-order guarantee composed end-to-end.  Ties (and everything
    else) stay deterministic via the pk tiebreak.
    """
    import pandas as pd

    if budget <= 0:
        raise ValueError("budget must be positive")
    spark = df.sparkSession
    shards = int(
        num_shards
        or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    )
    if shards <= 0 or shards > (1 << (63 - _PACK_SHARD_BITS)):
        raise ValueError(f"num_shards out of range: {shards}")

    slim = df.select(
        F.col(pk).alias("_pk"),
        F.col(token_col).cast("long").alias("_nt"),
        (F.pmod(F.hash(F.col(pk)), F.lit(shards))).alias("_shard"),
        *([F.col(order_col).alias("_ord")] if order_col is not None else []),
    )
    oversize = slim.filter(F.col("_nt") > budget)
    if not truncate_oversize and oversize.limit(1).count() > 0:
        ex = oversize.limit(3).collect()
        raise ValueError(
            f"documents exceed the pack budget {budget}: "
            f"{[(r['_pk'], r['_nt']) for r in ex]}; pass "
            "truncate_oversize=True to cap them"
        )

    b = int(budget)
    sort_keys = ["_ord", "_pk"] if order_col is not None else ["_pk"]

    def _pack(key, pdf):
        shard = int(key[0])
        pdf = pdf.sort_values(sort_keys).reset_index(drop=True)
        sizes = pdf["_nt"].clip(upper=b).to_numpy()
        pack_ids = []
        positions = []
        local = 0
        used = 0
        pos = 0
        for s in sizes:
            if used + s > b and used > 0:
                local += 1
                if local >= (1 << _PACK_SHARD_BITS):
                    raise ValueError(
                        "pack_sequences: over 2^20 packs in one shard — "
                        "raise num_shards"
                    )
                used = 0
                pos = 0
            used += int(s)
            pack_ids.append((shard << _PACK_SHARD_BITS) | local)
            positions.append(pos)
            pos += 1
        out = pdf[["_pk"]].copy()
        out["pack_id"] = pd.Series(pack_ids, dtype="int64")
        out["pack_pos"] = pd.Series(positions, dtype="int32")
        return out

    assigned = slim.groupBy("_shard").applyInPandas(
        _pack, schema=f"_pk {df.schema[pk].dataType.simpleString()}, pack_id long, pack_pos int"
    )
    return df.join(
        assigned.withColumnRenamed("_pk", pk), pk, "inner"
    )
