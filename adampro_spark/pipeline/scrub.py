"""PII detection and redaction — the scrubbing stage every public
LLM-corpus pipeline runs before training (C4/RefinedWeb/Dolma all ship a
regex-PII pass; the reference engine predates the use case).

Spark-first shape: detection is ``regexp_count`` per category and
redaction is a chained ``regexp_replace`` — both plain codegen column
expressions, so a 100 TB corpus scrubs in ONE map-only projection with
full column pruning and zero Python.  Patterns deliberately avoid
lookaround and other Java-regex-only constructs so the same pattern
strings run verbatim under RE2-family engines (DuckDB mirrors them in
tests) — portability over cleverness, exactly like
``text.BPE_TOKEN_PATTERN``.

Precision note: regex PII detection is a RECALL tool (catch the obvious
formats cheaply at scale), not a guarantee — the category list is
conservative (emails, IPv4, US-style phone/SSN, 16-digit card shapes)
to keep false positives low on prose.  A deployment layering an ML
detector plugs into the same column surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# category -> (pattern, replacement token).  Order matters for redaction:
# more specific patterns run first (an SSN would otherwise be half-eaten
# by the phone pattern).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "[EMAIL]",
    ),
    "ssn": (
        r"\b\d{3}-\d{2}-\d{4}\b",
        "[SSN]",
    ),
    "credit_card": (
        r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
        "[CARD]",
    ),
    "phone": (
        # \+? sits BEFORE the word boundary: '\b\+?' can never consume a
        # '+' after whitespace (space/'+' are both non-word, so \b fails
        # there) and '+1-415-555-1234' would redact to '+[PHONE]'
        r"\+?\b1?[-. ]?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b",
        "[PHONE]",
    ),
    "ipv4": (
        r"\b(\d{1,3}\.){3}\d{1,3}\b",
        "[IP]",
    ),
}


def _cats(categories: Sequence[str] | None) -> list[str]:
    cats = list(categories) if categories is not None else list(PII_PATTERNS)
    unknown = [c for c in cats if c not in PII_PATTERNS]
    if unknown:
        raise ValueError(
            f"unknown PII categories {unknown} (known: {sorted(PII_PATTERNS)})"
        )
    return cats


def pii_count_expr(text: str | Column, category: str) -> Column:
    """Match count for one category — a single ``regexp_count``."""
    pattern, _ = PII_PATTERNS[category]
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(col, F.lit(pattern)).cast("long")


def pii_total_expr(
    text: str | Column, categories: Sequence[str] | None = None
) -> Column:
    """Sum of per-category DETECTION counts on the given text.  Counts
    are independent per category, so text where one category's match
    contains another's (an IPv4 inside an email's domain) counts both —
    detection semantics, not replacement semantics (redaction replaces
    the outer match once)."""
    total = None
    for c in _cats(categories):
        n = pii_count_expr(text, c)
        total = n if total is None else total + n
    return total


def pii_stats(
    df: DataFrame,
    text_col: str = "text",
    pk: str = "doc_id",
    categories: Sequence[str] | None = None,
) -> DataFrame:
    """Per-document PII match counts: ``(pk, pii_<category>…, pii_total)``
    in one map-only projection — feed ``pii_total > 0`` to a curation
    gate, or aggregate for a corpus audit."""
    cats = _cats(categories)
    counts = [
        pii_count_expr(text_col, c).alias(f"pii_{c}") for c in cats
    ]
    out = df.select(F.col(pk), *counts)
    total = None
    for c in cats:
        col = F.col(f"pii_{c}")
        total = col if total is None else total + col
    return out.withColumn("pii_total", total)


def redact_expr(
    text: str | Column, categories: Sequence[str] | None = None
) -> Column:
    """The redacted text as ONE chained regexp_replace expression —
    composable into any projection (curate's one-scan gate pass uses it
    via ``redact=``)."""
    col = F.col(text) if isinstance(text, str) else text
    for c in _cats(categories):
        pattern, token = PII_PATTERNS[c]
        col = F.regexp_replace(col, pattern, token)
    return col


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    pk: str = "doc_id",
    categories: Sequence[str] | None = None,
    keep_counts: bool = True,
) -> DataFrame:
    """Replace PII matches with their category tokens, in place: the
    output keeps every input column with ``text_col`` rewritten, plus
    (``keep_counts``) a ``pii_redacted`` DETECTION count (independent
    per-category matches on the original text; overlapping categories
    each count — see :func:`pii_total_expr`) — all in the same single
    projection."""
    cats = _cats(categories)
    out = df
    if keep_counts:
        # count on the ORIGINAL text (counting replacement tokens in the
        # output would miscount documents that already contain the
        # literal token strings)
        out = out.withColumn("pii_redacted", pii_total_expr(text_col, cats))
    return out.withColumn(text_col, redact_expr(text_col, cats))


# ---------------------------------------------------------------------------
# URL / domain filtering (UT1-blocklist-style source gating)
# ---------------------------------------------------------------------------


def domain_chain_expr(url_col: str | Column = "url") -> Column:
    """The host's domain-suffix chain as an array column:
    ``https://a.b.example.com/x`` → ``[a.b.example.com, b.example.com,
    example.com, com]`` (lowercased, leading ``www.`` stripped).  A URL
    whose host cannot be parsed yields an empty array.

    This is the scalable unit of URL blocklisting: membership of ANY
    chain element in a blocklist blocks the URL, so a list entry
    ``example.com`` covers every subdomain without per-entry suffix
    scans.
    """
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    # try_parse_url: invalid URLs yield NULL host (plain parse_url
    # RAISES on them since Spark 4 — a poisoned row would fail the job)
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    host = F.regexp_replace(host, r"^www\.", "")
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(
        host.isNotNull() & (F.length(host) > 0),
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.concat_ws(".", F.slice(parts, i + 1, n - i)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def url_gate_flags(
    url_col: str = "url",
    deny_domains: Sequence[str] = (),
    allow_domains: Sequence[str] | None = None,
) -> dict[str, Column]:
    """URL gate for ``curate(extra_gates=...)``/``stream_curate`` over
    LITERAL domain lists (config-sized; for blocklists that are
    themselves datasets use :func:`filter_by_domains`): ``_url_ok`` is
    true iff the host parses, no chain element is in ``deny_domains``,
    and — when ``allow_domains`` is given — some chain element is in it.
    A deny entry covers the domain and every subdomain.  One
    ``arrays_overlap`` per list: vectorized, no per-entry scans.
    """
    chain = domain_chain_expr(url_col)
    ok = F.size(chain) > 0
    if deny_domains:
        deny = sorted({d.lower().lstrip(".") for d in deny_domains})
        ok = ok & ~F.arrays_overlap(chain, F.lit(deny))
    if allow_domains is not None:
        allow = sorted({d.lower().lstrip(".") for d in allow_domains})
        ok = ok & F.arrays_overlap(chain, F.lit(allow))
    return {"_url_ok": ok}


def filter_by_domains(
    df: DataFrame,
    deny: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Drop rows whose URL host (or any parent domain) appears in the
    ``deny`` table — the dataset-sized form of :func:`url_gate_flags`
    (UT1-style blocklists run to millions of domains, far past any
    literal-list or broadcast ceiling).

    Plan shape at 100 TB (docstring corrected, ADVICE r8): the suffix
    chain explodes to slim ``(url, chain_domain)`` pairs — document
    text never enters the hit computation — and a LEFT SEMI equi-join
    against the deny table yields the distinct blocked-URL set; AQE
    broadcasts the deny side when it fits and shuffle-joins
    (skew-splittable) when it doesn't.  Blocked rows are then dropped
    by ONE url-keyed LEFT ANTI join whose hit side is size-gated like
    :func:`~adampro_spark.pipeline.dedup._gated_semi_join`: the
    (usually small — blocked minority) hit set broadcasts, so full
    document rows never shuffle; past the row gate the anti-join
    routes through a plain shuffle instead of OOMing the driver.  Rows
    with unparseable hosts are KEPT (no chain element to match) — gate
    them separately with ``url_gate_flags`` if unparsed URLs should
    fail.

    EAGER (ADVICE r9): calling this runs a full-corpus job immediately
    — the hit set is materialized via ``localCheckpoint(eager=True)``
    so the gate count and the anti-join don't recompute the hit
    pipeline once per consumer.  That also means it cannot run on a
    STREAMING DataFrame (checkpointing is batch-only) — it raises
    up front; gate streams with the stateless ``url_gate_flags``
    expressions instead.
    """
    from adampro_spark.pipeline.dedup import (
        BROADCAST_HOT_BYTE_BUDGET,
        BROADCAST_HOT_MAX_ROWS,
    )

    if df.isStreaming:
        raise ValueError(
            "filter_by_domains materializes the hit set eagerly and "
            "cannot run on a streaming DataFrame — use url_gate_flags "
            "(stateless expressions) in stream_curate/extra_gates"
        )

    deny_tab = (
        deny.select(
            F.lower(F.regexp_replace(F.col(domain_col), r"^\.", "")).alias(
                "_deny_dom"
            )
        )
        .distinct()
    )
    chained = df.withColumn("_dchain", domain_chain_expr(url_col))
    hits = (
        chained.select(
            F.col(url_col).alias("_u"),
            F.explode("_dchain").alias("_deny_dom"),
        )
        .join(deny_tab, "_deny_dom", "left_semi")
        .select(F.col("_u"))
        .distinct()
    )
    # eagerly materialize the HIT SET (the blocked minority — bounded by
    # blocked URLs, not the corpus; review r9: the earlier lazy count
    # re-ran the whole hit pipeline once per consumer), then gate the
    # forced broadcast on MEASURED bytes, not just rows — URL keys are
    # long strings, so a row-only gate re-introduces the byte-blind
    # broadcast verdict r8 #6 closed in _gated_semi_join
    hits = hits.localCheckpoint(eager=True)
    st = hits.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.length("_u")), F.lit(0)).alias("b"),
    ).first()
    est_bytes = int(st["b"]) + 16 * int(st["n"])
    side = (
        F.broadcast(hits)
        if st["n"] <= BROADCAST_HOT_MAX_ROWS
        and est_bytes <= BROADCAST_HOT_BYTE_BUDGET
        else hits
    )
    return chained.join(
        side.withColumnRenamed("_u", url_col), url_col, "left_anti"
    ).drop("_dchain")


# ---------------------------------------------------------------------------
# web preprocessing — HTML → text extraction and URL canonicalization
# (round 9; no reference counterpart — the front end of a crawl pipeline)
# ---------------------------------------------------------------------------

# invisible-content blocks removed whole (no RE2 backreferences, so each
# tag pair is spelled out); (?is) = case-insensitive + dot-matches-newline
_HTML_BLOCKS = (
    r"(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>"
    r"|<noscript[^>]*>.*?</noscript>|<head[^>]*>.*?</head>|<!--.*?-->"
)
# structural closers become line breaks so extracted text keeps Gopher's
# line-based signals (bullet/ellipsis fractions, line dedup) meaningful
_HTML_BREAKS = r"(?i)<br[^>]*>|</p>|</div>|</li>|</tr>|</h[1-6]>|</title>"
_HTML_TAG = r"(?s)<[^>]*>"


def html_to_text_expr(html: str | Column) -> Column:
    """Visible text of an HTML document as ONE chain of codegen'd
    ``regexp_replace`` steps — the extraction stage that runs BEFORE
    every text operator in a crawl pipeline (C4/CCNet/RefinedWeb all
    start from rendered-ish text, not markup).

    Steps: drop script/style/noscript/head/comment blocks whole; turn
    structural closers (``<br> </p> </div> </li> </tr> </hN>``) into
    newlines so line-based quality signals survive; strip remaining
    tags; unescape the six common entities (``&amp;`` LAST, so double-
    escaped text unescapes one level per pass, the standard contract);
    collapse runs of spaces/tabs, tidy newline spacing, trim.

    Map-only and RE2-portable (no backreferences, no lookaround) — the
    DuckDB oracle mirrors the chain verbatim.  This is a heuristic
    extractor (like the quality heuristics, not a DOM parser): good for
    boilerplate-scale corpus work, not for faithful rendering.
    """
    c = F.col(html) if isinstance(html, str) else html
    t = F.regexp_replace(c, _HTML_BLOCKS, " ")
    # truncated fetches leave UNCLOSED script/style blocks whose bodies
    # would otherwise leak into the text as junk — after the paired
    # pass, anything from an unmatched opener to EOF is invisible
    t = F.regexp_replace(
        t, r"(?is)<script[^>]*>.*$|<style[^>]*>.*$", " "
    )
    t = F.regexp_replace(t, _HTML_BREAKS, "\n")
    t = F.regexp_replace(t, _HTML_TAG, " ")
    for ent, rep in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", "\""), ("&#39;", "'"), ("&apos;", "'"),
        ("&amp;", "&"),  # LAST: &amp;lt; -> &lt; (one level per pass)
    ):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    t = F.regexp_replace(t, r"[ \t]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{3,}", "\n\n")
    # trim() strips spaces only — newlines need the regex form
    return F.regexp_replace(t, r"^\s+|\s+$", "")


# tracking parameters stripped by canonical_url_expr — the public lists
# every crawl pipeline uses (UTM family + the big ad-click ids)
_TRACKING_PARAM = r"(utm_[^=&#]*|fbclid|gclid|msclkid|mc_eid|igshid)"


def canonical_url_expr(url: str | Column) -> Column:
    """Canonical form of a URL for exact URL-level dedup — the cheapest
    dedup signal a crawl has (two fetches of the same canonical URL are
    duplicates before any text comparison):

    * scheme and host lowercased (path/query case preserved);
    * leading ``www.`` dropped (consistent with ``domain_chain_expr``);
    * default ports stripped (``http://…:80``, ``https://…:443``);
    * fragment stripped;
    * tracking parameters stripped (``utm_*``, ``fbclid``, ``gclid``,
      ``msclkid``, ``mc_eid``, ``igshid``), with separator repair so the
      query stays well-formed;
    * trailing ``/`` dropped from non-root paths; bare authority gets
      ``/``.

    One codegen'd expression chain, RE2-portable.  Unparseable inputs
    (no ``scheme://``) pass through trimmed-only, so the expression is
    safe on dirty crawl columns; use with ``dropDuplicates`` or
    ``exact_dedup``-style grouping for URL-level dedup.
    """
    # Newline discipline (review r10): Java's '$' matches before a
    # final newline while RE2's does not, and '.' crosses newlines in
    # neither — so every anchor below is '\z' and every '.' span is
    # '(?s)', both of which the two engines implement identically.
    # Edge whitespace (incl. \n — crawl columns carry trailing
    # newlines) is stripped up front with an explicit class; F.trim
    # alone only strips spaces.
    raw = F.col(url) if isinstance(url, str) else url
    c = F.regexp_replace(
        raw, r"^[ \t\n\r\f\x0B]+|[ \t\n\r\f\x0B]+\z", ""
    )
    scheme_pat = r"(?s)^([A-Za-z][A-Za-z0-9+.\-]*://)([^/?#]*)(.*)\z"
    scheme = F.regexp_extract(c, scheme_pat, 1)
    auth = F.regexp_extract(c, scheme_pat, 2)
    rest = F.regexp_extract(c, scheme_pat, 3)
    lscheme = F.lower(scheme)
    # '(www\.)+': one-level stripping was not idempotent on stacked
    # prefixes (review r9.2 — canonicalize-on-ingest flows re-apply it)
    lauth = F.regexp_replace(F.lower(auth), r"^(www\.)+", "")
    lauth = F.when(
        (lscheme == "http://") & lauth.endswith(":80"),
        F.regexp_replace(lauth, r":80\z", ""),
    ).when(
        (lscheme == "https://") & lauth.endswith(":443"),
        F.regexp_replace(lauth, r":443\z", ""),
    ).otherwise(lauth)
    r = F.regexp_replace(rest, r"(?s)#.*\z", "")            # fragment
    # split at the FIRST '?': tracking removal then runs over the query
    # ONLY (review r9.2 — an unanchored pass deleted '&utm_…='
    # sequences from query-less paths and '?tracker=…' suffixes inside
    # query VALUES).  The query is split on '&' and rebuilt from the
    # surviving params (ADVICE r9: regex deletion required '=value', so
    # VALUELESS trackers — '?utm_source', '&gclid' — survived, and
    # adjacent valueless trackers defeat single-pass replacement
    # entirely); each param is matched WHOLE, so 'fbclidx=1' is not
    # prefix-garbled.  Empty segments ('&&', bare '?') drop with the
    # rebuild.  Param ORDER is preserved — reorder-normalization is out
    # of scope (two URLs differing only in param order do not
    # canonicalize together).
    path = F.regexp_extract(r, r"^([^?]*)", 1)
    query = F.regexp_extract(r, r"(?s)(\?.*)\z", 1)
    params = F.split(F.regexp_replace(query, r"^\?", ""), "&")
    # (?s) + \z, not '$': Java's '$' matches BEFORE a trailing newline
    # while RE2's does not (cross-engine divergence on 'gclid\n'), and
    # '.' excludes newlines in both — (?s)…\z strips a tracker whose
    # raw value embeds or ends with a newline identically in both
    # engines (review r10)
    kept_params = F.filter(
        params,
        lambda p: (F.length(p) > 0)
        & ~p.rlike("(?s)^" + _TRACKING_PARAM + r"(=.*)?\z"),
    )
    query = F.when(
        F.size(kept_params) > 0,
        F.concat(F.lit("?"), F.array_join(kept_params, "&")),
    ).otherwise(F.lit(""))
    # non-root trailing slash on the PATH alone
    path = F.when(
        F.length(path) > 1, F.regexp_replace(path, r"/+\z", "")
    ).otherwise(path)
    # RFC 3986 normalization: empty path ≡ '/' — also when a query
    # follows ('http://a.com?q=1' ≡ 'http://a.com/?q=1', review r9.2)
    path = F.when(F.length(path) == 0, F.lit("/")).otherwise(path)
    r = F.concat(path, query)
    return F.when(
        F.length(scheme) > 0, F.concat(lscheme, lauth, r)
    ).otherwise(c)


# ---------------------------------------------------------------------------
# Encoding-artifact (mojibake) detection — round 11.  Web corpora carry
# UTF-8-decoded-as-Latin-1/cp1252 double-encoding damage ("CafÃ©"
# for Café, "donâ€™t" for don’t), mangled NBSPs
# ("Â ") and U+FFFD replacement characters; a document dense in them
# trains garbage byte sequences.  Detection is plain regexp_count codegen
# (the pii_stats shape): one map-only projection, patterns portable to
# RE2 (explicit classes, no lookaround).
# ---------------------------------------------------------------------------

# Continuation-range glyphs: U+0080-U+00BF as Latin-1, plus what cp1252
# prints for bytes 0x80-0x9F (euro/curly-quote/dagger row).  A UTF-8
# lead byte mis-decoded as Latin-1/cp1252 is ALWAYS followed by one of
# these, while legit accented text (São, Café, née) never
# pairs an accented CAPITAL with one.
_MOJI_CONT = "\u0080-\u00bf" + bytes(range(0x80, 0xA0)).decode(
    "cp1252", errors="ignore"
)

#: mojibake signature -> regex (all RE2-portable).  Keys are stable API
#: (they name diagnostics the way PII categories do).
MOJIBAKE_PATTERNS: dict[str, str] = {
    # lead glyphs Â Ã Ð Ñ followed by a continuation glyph
    # — EXACTLY the UTF-8 lead bytes of Latin-1 (0xC2/0xC3) and
    # Cyrillic (0xD0/0xD1) text.  NOT the full À-Ñ lead range:
    # legit French/Spanish typography pairs OTHER accented capitals
    # with NBSP/guillemets («DÉJÀ», RESUME + NBSP before ':')
    # which fall in the continuation class — measured false positives
    # (review r11); É/À/Ç as lead bytes would only encode the
    # rare U+0240-U+0251 row.  Original comment: the
    # two-byte UTF-8 sequences for Latin accents (Ã© = é),
    # NBSP (Â ), and Cyrillic (Ð° = а) decoded
    # as Latin-1/cp1252
    "utf8_as_latin1": f"[ÂÃÐÑ][{_MOJI_CONT}]",
    # three-byte sequences (curly quotes/dashes): â followed by TWO
    # continuation glyphs ("donâ€™t")
    "utf8_punct": f"â[{_MOJI_CONT}][{_MOJI_CONT}]",
    # the replacement character a lossy decode leaves behind
    "replacement_char": "�",
}


def mojibake_count_expr(text: str | Column) -> Column:
    """Total mojibake-signature matches in ``text`` (0 for clean text;
    NULL text → NULL).  One codegen projection, no UDF."""
    c = F.col(text) if isinstance(text, str) else text
    total: Column | None = None
    for pat in MOJIBAKE_PATTERNS.values():
        cnt = F.regexp_count(c, F.lit(pat))
        total = cnt if total is None else total + cnt
    return total


def sql_mojibake_count(t: str) -> str:
    """DuckDB mirror of :func:`mojibake_count_expr` (same pattern
    literals — the oracle builds its SQL from this so the two engines
    can never drift)."""
    parts = [
        f"len(regexp_extract_all({t}, '" + p.replace("'", "''") + "'))"
        for p in MOJIBAKE_PATTERNS.values()
    ]
    return "(" + " + ".join(parts) + ")"


def encoding_gate_flags(
    text_col: str = "text", max_artifacts: int = 0
) -> dict[str, Column]:
    """Curate-pluggable gate: a document passes iff its mojibake-
    signature count is ≤ ``max_artifacts`` (default 0 — any
    double-encoding damage fails; raise it to tolerate stray artifacts
    in long documents).  NULL text passes (the token-floor gate owns
    NULLs).  Usage::

        curate(df, extra_gates=encoding_gate_flags())
    """
    n = mojibake_count_expr(text_col)
    return {"_enc_ok": F.coalesce(n <= int(max_artifacts), F.lit(True))}
