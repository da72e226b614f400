"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": N}

Query set = representative operators across the engine: sequential kNN
(several distances), filtered/prefiltered kNN, fusions, projections, plus
(as they land) index scans and LLM-pipeline operators.  Each query runs
once after a shared warmup that triggers JVM/codegen init.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline subset of the full oracle suite (bench = throughput signal, not
# the correctness gate; the driver runs the full suite separately)
HEADLINE = [
    "knn_seq_manhattan",
    "knn_seq_euclidean",
    "knn_seq_cosine",
    "knn_seq_minkowski3",
    # round 12: range similarity search (codegen filter, no top-k heap)
    "knn_seq_radius",
    "knn_boolean_combined",
    "knn_prefilter_semijoin",
    "projection_distinct",
    "predicate_compound",
    "fusion_fuzzy_union",
    "fusion_stochastic",
    # round 3: persisted index scans (build amortized once per session),
    # LLM-pipeline operators, batch similarity join
    "knn_vaf_persisted",
    "knn_ecp_persisted",
    # round 13: exact triangle-inequality cell-bound variant (verdict
    # r12 #8) over the same persisted eCP index
    "knn_ecp_bound_persisted",
    # round 14: the flagship multimodal composition (synth + probe ->
    # exact -> per-modality near-dup), timed end to end
    "multimodal_curate",
    "text_stats",
    "dedup_minhash",
    "dedup_embedding",
    "simjoin_knn_local",
    "fulltext_search",
    "fulltext_persisted",
    "events_windowed_stats",
    # round 4: sketch profiling, BM25 ranking
    "pipeline_profile",
    "fulltext_bm25_persisted",
    # round 5: the dedup ACTION step (pairs -> components -> anti-join)
    "dedup_resolution",
    # round 5: end-to-end curation (gates + dedup composition)
    "pipeline_curate",
    # round 5: as-of join (window-interleave formulation, no join node)
    "temporal_asof",
    # round 6: bucketed range join (left, NULL-safe single-join form)
    "temporal_range",
    # round 6: unkeyed as-of (quantile-bucketed parallel prefix-carry)
    "temporal_asof_unkeyed",
    # round 6: dataset assembly — eval decontamination (13-gram semi-join)
    # and sequence packing (sharded greedy first-fit)
    "pipeline_decontaminate",
    # round 11: the zero-shuffle Bloom-filter path (method="bloom")
    "pipeline_decontaminate_bloom",
    "pipeline_pack",
    # round 7: source re-weighting + hash-stable train/val/test split
    "pipeline_split_sample",
    # round 7: PII redaction + repetition signals, one map-only pass
    "pipeline_scrub",
    # round 6: IVF-PQ composite index (coarse cells + residual-PQ ADC)
    "knn_ivfpq_persisted",
    # round 7: unigram-LM fit + score (CCNet-style perplexity filter)
    "text_lm_score",
    # round 7: SemDeDup cluster-bucketed semantic near-dup (fitted k-means)
    "dedup_semantic",
    # round 7: context-window chunking and per-doc tf-idf keyword top-k
    "text_chunks",
    "text_tfidf",
    # round 7: C4-style cross-document boilerplate line removal
    "dedup_lines",
    # round 7: interpolated bigram LM (two-table fit + scoring)
    "text_lm_bigram",
    # round 11: interpolated Kneser-Ney bigram (fit incl. continuation
    # counts + scoring)
    "text_lm_kn",
    # round 7: exact-substring (span) dedup, Lee-et-al-style
    "dedup_spans",
    # round 8: the complete 13-signal Gopher A1.1 repetition table
    # (one-scan staged projection; text_stats keeps the 4-signal form)
    "text_stats_full",
    # round 7: asymmetric new-vs-reference dedup (banded, no ref self-join)
    "dedup_against",
    # round 8: DSIR importance weights + Gumbel top-k resample
    "pipeline_dsir",
    # round 8: RefinedWeb paragraph-level boilerplate removal
    "dedup_paragraphs",
    # round 9: trained char-n-gram NB language ID (map-only Arrow UDF)
    "text_langid_nb",
    # round 9: trained-BPE fit (Spark agg + driver merges) + count pass
    "text_bpe_count",
    # round 10: the CCNet end-to-end composition (trained langid →
    # curate → per-language perplexity terciles, count-hint wired)
    "pipeline_ccnet",
    # round 10: trained quality classifier (pinned-seed ridge fit +
    # one codegen dot-product scoring pass)
    "text_quality_lr",
    # round 11: the CCNet composition in its minhash production shape
    # (langid → gates → banded near-dup removal → component resolution
    # → shared-LM terciles); pipeline_ccnet keeps the r10 two-part
    # shape so the two rows stay separately comparable across rounds
    "pipeline_ccnet_mh",
    # round 11: stream-static as-of (sorted per-key reference arrays +
    # stateless element_at lookup — the formulation that runs on a live
    # stream), timed in batch mode like every streaming-capable row
    "temporal_asof_stream",
    # round 12 (verdict r11 #3): the parts the events_windowed_stats /
    # pipeline_profile driver rows gained in r11/r12, as their own rows
    # so the historical names keep timing their r10 shapes (BENCH_ONLY
    # overrides in oracle_suite.py / oracle_pipeline.py; README mapping)
    "events_hopping",
    "events_sessionized",
    "events_session_assign",
    "pipeline_profile_vec",
    # round 12: ordered session-funnel analytics (assign_sessions ->
    # per-session greedy fold -> k-row count)
    "events_funnel",
    # round 12: quality-aware survivor selection (keep the best-scored
    # copy per near-dup family); dedup_resolution keeps its r11
    # single-policy shape (BENCH_ONLY override — README mapping)
    "dedup_resolution_best",
]

# NOTE on the pipeline_curate name: the BENCH row (BENCH_ONLY wins the
# registry merge below) is the minhash-dedup composition — comparable
# with rounds 4-5; the DRIVER correctness row of the same name is the
# SQL-expressible dedup="exact" variant (oracle_pipeline._curate_exact_row).


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from adampro_spark.session import get_spark
    from adampro_spark import oracle_suite

    spark = get_spark("adampro-bench")

    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    # bench pulls from the driver registry plus BENCH_ONLY (per-distance
    # and per-predicate callables kept out of the driver's 50-row window
    # but preserved here so per-query timings stay comparable across rounds)
    registry = {**oracle_suite.QUERIES, **oracle_suite.BENCH_ONLY}
    names = [n for n in HEADLINE if n in registry]
    extra = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if extra:
        names = [n for n in extra.split(",") if n in registry]

    # warmup: run the flagship once so JVM startup/codegen is excluded
    oracle_suite.flagship(spark, SF_DIR).collect()
    # warmup each query's PLAN SHAPE once at the smallest sf: whole-stage
    # codegen compilation, the python-worker pool, and Arrow/shuffle
    # machinery are per-process one-time costs (measured: first run of the
    # minhash plan 14 s, steady state 2.3 s) — the timed section should
    # measure the operators, not JVM warmup.  No query state is reused:
    # every call builds fresh DataFrames.  Persisted-index queries warm via
    # the pre-build loop below instead (a small-sf run would leave a stale
    # index in the session catalog).
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf):
        for name in names:
            if name.endswith("_persisted") or name == "knn_planned_default":
                continue
            try:
                registry[name](spark, warm_sf).collect()
            except Exception:
                pass
        # drop warmup-persisted intermediates (dedup signature/band tables
        # etc.) so the timed section starts with a clean block manager
        spark.catalog.clearCache()
    # pre-build persisted indexes so the timed runs measure the SCAN of the
    # persisted table (the lifecycle's whole point: build once, scan many)
    for name in names:
        if name.endswith("_persisted") or name == "knn_planned_default":
            registry[name](spark, SF_DIR).collect()

    # two timed passes, min per query: single-shot numbers on this host
    # swing ~2x with background load; the min is the operator's cost (no
    # state is shared between passes — every call builds fresh DataFrames
    # and the cache is cleared after each query)
    # BENCH_REPEATS (round 16, verdict r15 #6): optional EXTRA passes,
    # folded into the same per-query min — the host swings ±12-30% run
    # to run, so a 3+-pass min tightens per-row variance without
    # touching the default methodology, the query set, or the JSON line.
    # Default 2 = the exact historical behavior.
    n_passes = max(2, int(os.environ.get("BENCH_REPEATS", "2")))
    timings: dict[str, float] = {}
    best_stages: dict[str, dict] = {}
    for _pass in range(n_passes):
        for name in names:
            fn = registry[name]
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            dt = round(time.perf_counter() - t0, 4)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
                # stage attribution must describe the WINNING pass, not
                # whichever ran last (the min and the last can differ by
                # 2-3x under background load)
                if name == "pipeline_curate":
                    try:
                        from adampro_spark.oracle_pipeline import CURATE_STAGES

                        best_stages["pipeline_curate"] = dict(CURATE_STAGES)
                    except Exception:
                        pass
                elif name == "multimodal_curate":
                    try:
                        from adampro_spark.oracle_suite import (
                            MEDIA_CURATE_STAGES,
                        )

                        best_stages["multimodal_curate"] = dict(
                            MEDIA_CURATE_STAGES
                        )
                    except Exception:
                        pass
            # each query is self-contained; drop its persisted intermediates
            # so later queries don't pay eviction/GC churn for earlier caches
            spark.catalog.clearCache()

    total = round(sum(timings.values()), 4)
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    # per-stage attribution for the composite curation row (gates vs
    # candidate pairs vs component resolution) — localizes regressions
    if best_stages:
        payload["stages"] = best_stages
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
