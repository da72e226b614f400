"""Text analysis for training-data pipelines — native Catalyst expressions.

No counterpart exists in the reference (its TEXTTYPE is a pass-through to
Solr, storage/engine/SolrEngine.scala:139-163); these operators are the
north-star extensions (BASELINE.json: "text analysis") built the way the
rest of this engine is built: higher-order-function expressions that stay
inside whole-stage codegen, zero Python on the hot path.

Every function here has an exact DuckDB mirror (the oracle suite generates
the SQL), so results are hash-checkable end-to-end.  The portable hash is
a 31-polynomial over character codes mod 1e9+7 — identical arithmetic is
expressible in both engines (verified: Spark ``aggregate`` left-fold ==
DuckDB ``list_reduce`` left-fold on BIGINT).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_P = 1_000_000_007  # modulus for the portable polynomial hash
HASH_M = 31

# Tiny per-language stopword lists for the n-gram-free language heuristic.
# Deliberately short and frozen: the langid below is a deterministic
# *heuristic* (hit-count argmax), not a model — the oracle mirrors it.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une", "dans", "pour"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "los", "por"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"),
}

QUALITY_STOPWORDS = STOPWORDS["en"]


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens_expr(text: str | Column) -> Column:
    """Whitespace tokens of the lowercased text, empties dropped.

    DuckDB mirror: ``list_filter(string_split_regex(lower(t), '\\s+'),
    t -> length(t) > 0)``.
    """
    return F.filter(F.split(F.lower(_c(text)), r"\s+"), lambda t: F.length(t) > 0)


def char_codes(text: str | Column) -> Column:
    """array<long> of character codes (DuckDB: ``list_transform(
    string_split(t, ''), c -> ascii(c)::BIGINT)``; both engines return the
    codepoint of a 1-char string)."""
    return F.transform(F.split(_c(text), ""), lambda c: F.ascii(c).cast("long"))


def poly_hash(codes: Column) -> Column:
    """Left-fold 31-polynomial hash of a code array, mod 1e9+7."""
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * HASH_M + x) % HASH_P,
    )


def fingerprint_expr(text: str | Column) -> Column:
    """Document fingerprint: polynomial hash of the whitespace-normalized
    lowercased text (join tokens with single spaces first, so formatting
    differences don't change the fingerprint)."""
    norm = F.concat_ws(" ", tokens_expr(text))
    return poly_hash(char_codes(norm))


def shingle_hashes(text: str | Column, n: int = 8) -> Column:
    """array<long> of hashes of all character n-grams (shingles).

    Codes are materialized once per row; each shingle hash folds an
    n-length slice — O(len·n) arithmetic, all codegen'd.  Documents
    shorter than ``n`` produce one (shorter) shingle.
    """
    codes = char_codes(text)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(codes) - (n - 1), F.lit(1))),
        lambda i: poly_hash(F.slice(codes, i, n)),
    )


def ngrams_expr(text: str | Column, n: int = 2) -> Column:
    """Word n-grams as space-joined strings (token-level shingling)."""
    toks = tokens_expr(text)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_count(text: str | Column) -> Column:
    """Subword-style token count: a BPE-ish pre-tokenizer regex (letter
    runs, single digits, single punctuation — the GPT-2 pre-tokenizer
    family reduced to constructs Java regex and RE2 agree on, so the
    DuckDB oracle mirrors it verbatim).  A cheap LLM-token budget
    estimator that runs as one codegen'd expression."""
    return F.size(
        F.regexp_extract_all(_c(text), F.lit(BPE_TOKEN_PATTERN), F.lit(0))
    ).cast("long")


def langid_expr(text: str | Column) -> Column:
    """Deterministic language heuristic: argmax of per-language stopword
    hit counts, ties broken by language code order, no hits → 'und'."""
    toks = tokens_expr(text)

    def _hits(sw: tuple[str, ...]) -> Column:
        # closure factory: PySpark lambda arity introspection forbids
        # default-arg lambdas (it would pass a Column for the second param)
        return F.size(F.filter(toks, lambda t: F.array_contains(F.lit(list(sw)), t)))

    scored = []
    for lang in sorted(STOPWORDS):
        scored.append(F.struct(_hits(STOPWORDS[lang]).alias("hits"), F.lit(lang).alias("lang")))
    # array_max on (hits, lang) structs: max hits, then max lang — to keep
    # ties deterministic *and* mirrorable we order by (hits asc, lang asc)
    # and take the last element, i.e. highest hits with last-sorting lang.
    best = F.array_max(F.array(*scored))
    return F.when(best["hits"] <= 0, F.lit("und")).otherwise(best["lang"])


def text_stats(
    df: DataFrame, text_col: str = "text", pk: str = "doc_id",
    repetition: bool = False,
) -> DataFrame:
    """Per-document quality statistics, one projection pass:

    * ``n_chars_obs`` / ``n_tokens`` / ``n_bpe_tokens`` / ``avg_token_len``
    * ``alnum_ratio`` — alphanumeric+space chars / all chars
    * ``stopword_ratio`` — English stopword tokens / tokens
    * ``quality`` — a composable [0,1] score: alnum_ratio damped by a
      length prior (docs under 20 tokens score down linearly)

    All ratios are plain column arithmetic; a 100 TB corpus runs this as
    one codegen'd map-only stage with full column pruning.

    ``repetition=True`` appends the four Gopher-style repetition signals
    (:func:`repetition_exprs`) to the SAME single projection — no extra
    pass, no join.
    """
    toks = tokens_expr(text_col)
    n_chars = F.length(F.col(text_col)).cast("long")
    n_tokens = F.size(toks).cast("long")
    alnum = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9 ]", ""))
    stop_hits = F.size(
        F.filter(toks, lambda t: F.array_contains(F.lit(list(QUALITY_STOPWORDS)), t))
    )
    alnum_ratio = F.when(n_chars > 0, alnum / n_chars).otherwise(F.lit(0.0))
    stopword_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    quality = alnum_ratio * F.least(n_tokens / F.lit(20.0), F.lit(1.0))
    # mean length of the TOKENS themselves, not raw chars / tokens (the
    # raw numerator counts separators and padding — review r6: 'ab cd'
    # scored 2.5 instead of 2.0)
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    avg_tok = F.when(n_tokens > 0, tok_chars / n_tokens).otherwise(F.lit(0.0))
    cols = [
        F.col(pk),
        n_chars.alias("n_chars_obs"),
        n_tokens.alias("n_tokens"),
        bpe_token_count(text_col).alias("n_bpe_tokens"),
        F.round(avg_tok, 4).alias("avg_token_len"),
        F.round(alnum_ratio, 4).alias("alnum_ratio"),
        F.round(stopword_ratio, 4).alias("stopword_ratio"),
        F.round(quality, 4).alias("quality"),
    ]
    if repetition:
        cols += [c.alias(n) for n, c in repetition_exprs(text_col).items()]
    return df.select(*cols)


def repetition_exprs(text_col: str = "text") -> dict[str, "Column"]:
    """Gopher-style repetition signals (Rae et al. 2021, "Scaling
    Language Models: Methods, Analysis & Insights from Training Gopher",
    table A1 quality rules) as PURE COLUMN EXPRESSIONS — composable into
    any projection (text_stats ``repetition=True`` rides them in its one
    map-only pass; curate gates use them via ``extra_gates``):

    * ``dup_line_frac`` — fraction of non-empty lines that are repeats
      of another line (1 − distinct/total);
    * ``dup_line_char_frac`` — characters inside lines that occur more
      than once / characters inside all non-empty lines;
    * ``top_2gram_char_frac`` — characters covered by the most frequent
      word bigram (count × gram length / doc length, clamped to 1.0;
      ties break to the lexicographically smallest gram);
    * ``dup_5gram_frac`` — fraction of word 5-gram occurrences that are
      repeats (1 − distinct/total; a simplification of Gopher's
      char-coverage variant, documented deviation).

    The top-bigram is a sort + run-length fold over the gram array
    (O(G log G) per row, no shuffle) — NOT a per-gram recount (O(G²)
    interpreted lambda evals).  All four land in [0, 1]; junk pages
    (boilerplate, templating, keyword stuffing) score high, prose low.
    """
    t = _c(text_col)
    lines = F.filter(F.split(t, "\n"), lambda ln: F.length(ln) > 0)
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0, 1.0 - F.size(F.array_distinct(lines)) / n_lines
    ).otherwise(F.lit(0.0))
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, ln: a + F.length(ln)
    )
    dup_chars = F.aggregate(
        lines,
        F.lit(0).cast("long"),
        lambda a, ln: a
        + F.when(
            F.size(F.filter(lines, lambda x: x == ln)) > 1,
            F.length(ln).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    dup_line_char_frac = F.when(
        line_chars > 0, dup_chars / line_chars
    ).otherwise(F.lit(0.0))

    g2 = F.array_sort(ngrams_expr(text_col, 2))
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("bc"),
        F.lit("").alias("bg"),
    )

    def _step(s, g):
        new_run = F.when(g == s["prev"], s["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        better = new_run > s["bc"]
        return F.struct(
            g.alias("prev"),
            new_run.alias("run"),
            F.when(better, new_run).otherwise(s["bc"]).alias("bc"),
            F.when(better, g).otherwise(s["bg"]).alias("bg"),
        )

    st = F.aggregate(g2, init, _step)
    n_chars = F.length(t)
    top2 = F.when(
        n_chars > 0,
        F.least(st["bc"] * F.length(st["bg"]) / n_chars, F.lit(1.0)),
    ).otherwise(F.lit(0.0))

    g5 = ngrams_expr(text_col, 5)
    dup5 = F.when(
        F.size(g5) > 0, 1.0 - F.size(F.array_distinct(g5)) / F.size(g5)
    ).otherwise(F.lit(0.0))

    return {
        "dup_line_frac": F.round(dup_line_frac, 4),
        "dup_line_char_frac": F.round(dup_line_char_frac, 4),
        "top_2gram_char_frac": F.round(top2, 4),
        "dup_5gram_frac": F.round(dup5, 4),
    }


def repetition_stats(
    df: DataFrame, text_col: str = "text", pk: str = "doc_id"
) -> DataFrame:
    """Standalone (pk, repetition signals) projection — see
    :func:`repetition_exprs`."""
    exprs = repetition_exprs(text_col)
    return df.select(F.col(pk), *[c.alias(n) for n, c in exprs.items()])
