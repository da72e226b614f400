"""Full-text scan over TEXTTYPE attributes (SURVEY §2.1 external handler).

Parity target: the reference delegates TEXTTYPE to Solr and passes the
query string through (``storage/engine/SolrEngine.scala:139-163``,
``GenericExternalScanExpression.scala:17-47``).  A Spark-native engine
doesn't need an external system for the semantics its tests exercise
(term matching + relevance ordering): tokenized term-frequency scoring is
one codegen'd expression over the text column.

Scoring: score(doc) = Σ_term tf(term, doc) — the count of matching
tokens summed over query terms (a Solr-like disjunctive match; documents
matching no term are dropped).  Deterministic ordering by (score desc,
pk) makes results oracle-checkable.

At 100 TB this is a map-only scan + TakeOrderedAndProject; a real
deployment would persist an inverted index (the MI machinery generalizes),
but the reference itself never exposes more than "query string → ranked
ids", which this matches.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from adampro_spark.pipeline.text import tokens_expr

SCORE_COL = "ap_score"  # AttributeNames.scala:16


def tf_score_expr(text: str | Column, terms: Sequence[str]) -> Column:
    """Σ_term count(token == term) over the lowercased whitespace tokens."""
    toks = tokens_expr(text)
    terms_l = [t.lower() for t in terms]
    return F.size(
        F.filter(toks, lambda t: F.array_contains(F.lit(terms_l), t))
    ).cast("double")


def text_search(
    df: DataFrame,
    text_col: str,
    terms: Sequence[str],
    k: int | None = None,
    pk: str = "ap_id",
) -> DataFrame:
    """Ranked term search: rows matching ≥1 term, by (score desc, pk asc).

    ``k`` limits like the kNN scans (TakeOrderedAndProject); None returns
    every match.
    """
    scored = df.withColumn(SCORE_COL, tf_score_expr(text_col, terms)).filter(
        F.col(SCORE_COL) > 0
    )
    ordered = scored.orderBy(F.col(SCORE_COL).desc(), F.col(pk).asc())
    return ordered.limit(k) if k is not None else ordered
