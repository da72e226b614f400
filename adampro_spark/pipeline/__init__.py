"""LLM-training-data pipeline operators (north-star extensions beyond the
reference's own operator set — BASELINE.json: dedup, similarity search,
multimodal columns, text analysis).

Everything here is designed for the 100 TB shape first:

* text analysis is pure Catalyst higher-order-function expressions
  (whole-stage codegen, no Python on the hot path);
* dedup never goes all-pairs — candidates come from MinHash/LSH band
  equi-joins (shuffle keyed on band hash, pairs verified within buckets
  only), mirroring the reference's LSH machinery
  (lsh/LSHIndexGenerator.scala:27-77) applied to documents;
* the batch similarity join pre-reduces per-partition (vectorized local
  top-k) so the shuffle carries O(partitions * queries * k) rows, not
  |data| * |queries|.
"""

from adampro_spark.pipeline.text import (  # noqa: F401
    ccnet_normalize_expr,
    char_codes,
    fingerprint_expr,
    langid_expr,
    ngrams_expr,
    poly_hash,
    shingle_hashes,
    text_stats,
    tokens_expr,
)
from adampro_spark.pipeline.dedup import (  # noqa: F401
    deduplicate,
    dup_groups,
    exact_dedup,
    embedding_dedup,
    embedding_dup_pairs,
    fingerprint_against,
    fingerprint_pairs,
    minhash_bands,
    lsh_params,
    minhash_dup_pairs,
    minhash_signature,
    simhash_expr,
    simhash_pairs,
)
from adampro_spark.pipeline.curate import curate, curate_report_by  # noqa: F401
from adampro_spark.pipeline.temporal import asof_join, range_join  # noqa: F401
from adampro_spark.pipeline.profile import profile  # noqa: F401
from adampro_spark.pipeline.simjoin import knn_join, ivf_knn_join  # noqa: F401
from adampro_spark.pipeline.text import bpe_token_count  # noqa: F401
from adampro_spark.pipeline.text import (  # noqa: F401
    repetition_stats,
    with_repetition,
)
from adampro_spark.pipeline.scrub import (  # noqa: F401
    PII_PATTERNS,
    pii_stats,
    redact_expr,
    redact_pii,
)
from adampro_spark.pipeline.curate import (  # noqa: F401
    gate_flags,
    gopher_gate_flags,
)
from adampro_spark.pipeline.text import (  # noqa: F401
    compression_gate_flags,
    compression_ratio_col,
    compression_ratio_stats,
)
from adampro_spark.pipeline.text import (  # noqa: F401
    chunk_documents,
    tfidf_keywords,
)
from adampro_spark.pipeline.cluster import (  # noqa: F401
    cluster_embeddings,
    cluster_shares,
    fit_centroids,
)
from adampro_spark.pipeline.mix import (  # noqa: F401
    contamination_report,
    decontaminate,
    decontamination_gate_flags,
    emit_packed,
    mix_sources,
    pack_sequences,
    sample_sources,
    shuffle_dataset,
    split_dataset,
    temperature_weights,
)
from adampro_spark.pipeline.dsir import (  # noqa: F401
    dsir_resample,
    dsir_weight_col,
    dsir_weights,
    fit_dsir,
)
from adampro_spark.pipeline.dedup import (  # noqa: F401
    dedup_against,
    line_dedup,
    semantic_dedup,
    semantic_dedup_against,
    semantic_dup_pairs,
    span_dedup,
)
from adampro_spark.pipeline.lm import (  # noqa: F401
    bigram_lm_score,
    fit_unigram_lm_by,
    lm_bucket_by,
    lm_score_by,
    fit_bigram_lm,
    fit_unigram_lm,
    lm_filter,
    lm_perplexity_col,
    lm_score,
    lm_bucket,
    lm_score_col,
)
from adampro_spark.pipeline.ccnet import ccnet_pipeline  # noqa: F401
