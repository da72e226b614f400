"""Learned document-quality classification for curation pipelines.

The heuristic quality score in ``text_stats``/``curate`` is a fixed
formula; real pipelines usually train a small linear model on labeled
examples (the fastText-classifier pattern from the LLM data reports)
and filter by its score.  This module does that Spark-first:

* features are ENGINEERED COLUMN EXPRESSIONS (the same portable
  arithmetic as text_stats — ratios of alnum/stopword/digit/upper
  characters, length priors), evaluated inside whole-stage codegen;
* training collects only the (features, label) pairs of a driver-side
  SAMPLE (like the reference's planner training,
  SVMPlannerHeuristics.scala:29-120) and fits the in-repo models
  (:class:`~adampro_spark.ml.LinearModel` closed-form ridge by default,
  :class:`~adampro_spark.ml.PegasosSVM` optionally);
* scoring bakes the learned weights back into ONE dot-product
  expression — no UDF, no model object on the executors, the plan is a
  plain projection that scales like any other map-only stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from adampro_spark.ml import LinearModel, PegasosSVM, TrainingSample
from adampro_spark.pipeline.text import QUALITY_STOPWORDS, tokens_expr

__all__ = [
    "QUALITY_DIMS",
    "quality_feature_exprs",
    "train_quality_model",
    "quality_score_expr",
    "classify_quality",
]


def quality_feature_exprs(text_col: str = "text") -> list[Column]:
    """The engineered feature vector (all doubles, all codegen):
    [bias, alnum_ratio, stopword_ratio, length_prior, avg_token_len/10,
    digit_ratio, upper_ratio]."""
    t = F.col(text_col)
    toks = tokens_expr(text_col)
    n_chars = F.length(t).cast("double")
    n_tokens = F.size(toks).cast("double")
    safe_chars = F.greatest(n_chars, F.lit(1.0))
    alnum = F.length(F.regexp_replace(t, "[^a-zA-Z0-9 ]", "")).cast("double")
    digits = F.length(F.regexp_replace(t, "[^0-9]", "")).cast("double")
    uppers = F.length(F.regexp_replace(t, "[^A-Z]", "")).cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda w: w.isin(list(QUALITY_STOPWORDS)))
    ).cast("double")
    return [
        F.lit(1.0),
        alnum / safe_chars,
        F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0)),
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)),
        F.when(n_tokens > 0, (n_chars / n_tokens) / F.lit(10.0)).otherwise(
            F.lit(0.0)
        ),
        digits / safe_chars,
        uppers / safe_chars,
    ]


QUALITY_DIMS = 7


def train_quality_model(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    model: str = "lr",
    sample_fraction: float = 1.0,
    seed: int = 42,
) -> list[float]:
    """Fit a linear quality model on labeled documents (``label_col``:
    1.0 = junk, 0.0 = keep — any numeric target works) and return its
    weight vector for :func:`quality_score_expr`.

    Feature extraction runs distributed (one map-only projection);
    only the sampled (features, label) pairs reach the driver — size it
    with ``sample_fraction`` (a labeled set is small by construction;
    millions of labels at 100 TB still sample down to a driver-sized
    matrix).  ``model``: "lr" (closed-form ridge — deterministic,
    recommended) or "svm" (Pegasos subgradient)."""
    feats = F.array(*quality_feature_exprs(text_col))
    sdf = df.select(feats.alias("f"), F.col(label_col).cast("double").alias("y"))
    if sample_fraction < 1.0:
        sdf = sdf.sample(fraction=sample_fraction, seed=seed)
    rows = sdf.collect()
    if not rows:
        raise ValueError("no labeled rows to train on")
    import numpy as np

    data = [
        TrainingSample(f=np.asarray(r["f"], dtype=float), time=float(r["y"]))
        for r in rows
    ]
    if model == "lr":
        m: LinearModel | PegasosSVM = LinearModel()
        m.train(data)
    elif model == "svm":
        m = PegasosSVM(dims=QUALITY_DIMS, seed=seed)
        m.train(data)
    else:
        raise ValueError(f"unknown quality model {model!r}")
    return m.to_weights()


def quality_score_expr(weights: list[float], text_col: str = "text") -> Column:
    """The learned score ``w · features(text)`` as one codegen expression
    — the executors never see a model object."""
    exprs = quality_feature_exprs(text_col)
    if len(weights) != len(exprs):
        raise ValueError(
            f"expected {len(exprs)} weights, got {len(weights)}"
        )
    out: Column = F.lit(0.0)
    for w, e in zip(weights, exprs):
        out = out + F.lit(float(w)) * e
    return out


def classify_quality(
    df: DataFrame,
    weights: list[float],
    threshold: float = 0.5,
    text_col: str = "text",
    score_col: str = "quality_score",
    flag_col: str = "is_junk",
) -> DataFrame:
    """Attach the learned score and a junk flag (``score >= threshold``
    under the 1.0-=-junk labeling).  Compose with curation as
    ``df.filter(~F.col('is_junk'))`` — a map-only stage like every gate."""
    s = quality_score_expr(weights, text_col)
    return df.withColumn(score_col, s).withColumn(
        flag_col, F.col(score_col) >= F.lit(float(threshold))
    )
