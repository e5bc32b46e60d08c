"""Page-health signals: soft-404 detection and mojibake repair.

Two content-quality gates every Common-Crawl-style pipeline runs
between fetch and corpus admission (the reference runs its crawler
output straight into extraction — `crawler.php` keeps whatever the
fetch returned, including error bodies served with HTTP 200, and
`reconstruction/` inherits them; these operators give the engine the
filter the reference lacks):

- **Soft 404**: a page served with status 200 whose CONTENT is an
  error page ("404 Not Found", "page does not exist", ...). Signals:
  an error phrase in the title/h1, and a tiny extracted-text length
  for a non-tiny html body (error templates are mostly chrome).
- **Mojibake**: UTF-8 bytes decoded as Latin-1/cp1252 somewhere in
  the pipeline leave signature two-codepoint sequences (``â€™`` for
  ``’``, ``Ã©`` for ``é``). Detection counts signature hits; repair
  inverts the common sequences via a fixed replace chain.

Scale design: every function here emits per-row JVM expressions
(regexp/length/replace) — zero shuffles, whole-stage-codegen
friendly, and they compose with any scan so Catalyst pushes the
resulting filters to the parquet read when possible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "SOFT404_TITLE_RE",
    "MOJIBAKE_RE",
    "MOJIBAKE_REPAIRS",
    "FULLWIDTH_CHARS",
    "HALFWIDTH_CHARS",
    "soft404_signals",
    "mojibake_signals",
    "demojibake",
    "normalize_text",
    "MAGIC_PREFIXES",
    "sniff_content_type",
    "meta_robots_flags",
    "link_follow_counts",
]

# Error phrases that mark a title/h1 as an error template. Kept to
# unambiguous markers — a news headline containing the word "error"
# alone must not trip the gate.
SOFT404_TITLE_RE = (
    r"(?i)(404|page not found|not found|page (?:unavailable|"
    r"does not exist)|no longer available)"
)

# Signature sequences of UTF-8 read as Latin-1/cp1252: 'Ã' followed by
# a Latin-1 letter covers the é/è/ñ/ö family; 'â€' prefixes the curly
# quote/dash family; 'Â' before nbsp/guillemets.
MOJIBAKE_RE = "(Ã[©¨±¶¼]|â€[™œ“”]|Â[»« ])"

# repair order matters: every 'â€x' sequence (quotes, dashes,
# ellipsis) precedes shorter prefixes so no rule can bite another's
# prefix and leave different garbage (ADVICE r2 added the dash /
# ellipsis / single-quote family). The '\u009d' in the right-double-
# quote rule is what a WHATWG windows-1252 decode carries through for
# the unmapped 0x9D byte.
MOJIBAKE_REPAIRS = (
    ("â€™", "’"),
    ("â€œ", "“"),
    ("â€“", "–"),
    ("â€”", "—"),
    ("â€¦", "…"),
    ("â€˜", "‘"),
    ("â€", "”"),
    ("Ã©", "é"),
    ("Ã¨", "è"),
    ("Ã±", "ñ"),
    ("Ã¶", "ö"),
    ("Ã¼", "ü"),
    ("Â»", "»"),
    ("Â«", "«"),
)


def soft404_signals(
    pages: DataFrame,
    html_col: str = "html_str",
    text_col: str = "text",
    min_text_chars: int = 120,
    min_ratio: float = 0.05,
) -> DataFrame:
    """Append soft-404 signal columns to `pages`:

    - ``title`` — first <h1>/<title> payload in the html
    - ``err_title`` — title matches `SOFT404_TITLE_RE`
    - ``text_chars`` / ``html_chars`` — lengths
    - ``text_ratio`` — text_chars / html_chars (rounded, 4 places)
    - ``is_soft404`` — err_title, OR a page whose extracted text is
      both absolutely tiny (< `min_text_chars`) and a sliver of the
      html (< `min_ratio`): error templates are chrome-heavy.

    Per-row expressions only; attach before extraction so error
    bodies never reach the corpus (and their links never reach the
    frontier — a soft-404 page's links are template links).
    """
    title = F.coalesce(
        F.nullif(
            F.regexp_extract(html_col, r"<h1[^>]*>([^<]*)</h1>", 1),
            F.lit(""),
        ),
        F.regexp_extract(html_col, r"<title[^>]*>([^<]*)</title>", 1),
    )
    out = pages.withColumn("title", title)
    err_title = F.col("title").rlike(SOFT404_TITLE_RE)
    text_chars = F.length(F.coalesce(F.col(text_col), F.lit("")))
    html_chars = F.length(F.coalesce(F.col(html_col), F.lit("")))
    ratio = text_chars / F.greatest(html_chars, F.lit(1))
    return (
        out.withColumn("err_title", err_title)
        .withColumn("text_chars", text_chars)
        .withColumn("html_chars", html_chars)
        .withColumn("text_ratio", F.round(ratio, 4))
        .withColumn(
            "is_soft404",
            err_title
            | (
                (text_chars < F.lit(min_text_chars))
                & (ratio < F.lit(min_ratio))
            ),
        )
    )


def mojibake_signals(
    df: DataFrame, text_col: str = "text", min_hits: int = 3
) -> DataFrame:
    """Append ``n_mojibake`` (signature-sequence count) and
    ``is_mojibake`` (count >= `min_hits` — a threshold, because a
    single hit can be a legitimate Latin-1 quotation of broken text,
    while systematic damage repeats on every apostrophe)."""
    n = F.regexp_count(text_col, F.lit(MOJIBAKE_RE))
    return df.withColumn("n_mojibake", n.cast("long")).withColumn(
        "is_mojibake", n >= F.lit(min_hits)
    )


def meta_robots_flags(pages: DataFrame, html_col: str = "html_str") -> DataFrame:
    """Append ``noindex`` / ``nofollow`` booleans from the page-level
    ``<meta name="robots" content="...">`` directive — the in-page
    counterpart of robots.txt that a compliant crawler MUST honor:
    noindex pages are fetched but never stored, nofollow pages'
    links never enter the frontier.

    Token matching is case-insensitive and order-independent inside
    the content list ('NOINDEX, nofollow' works); 'none' implies
    both, per the Google/Bing documented semantics. A page without
    the meta tag gets false/false. Per-row JVM regexes only."""
    c = F.coalesce(F.col(html_col), F.lit(""))
    content = F.lower(
        F.regexp_extract(
            c, r'(?i)<meta[^>]*name="robots"[^>]*content="([^"]*)"', 1
        )
    )
    has = lambda tok: content.rlike(rf"(^|[,\s]){tok}([,\s]|$)")
    none = has("none")
    return pages.withColumn(
        "noindex", none | has("noindex")
    ).withColumn("nofollow", none | has("nofollow"))


def link_follow_counts(
    pages: DataFrame, html_col: str = "html_str"
) -> DataFrame:
    """Append ``n_links_total`` / ``n_links_follow``: anchors whose
    tag carries ``rel="nofollow"`` are excluded from the follow
    count (page-level meta nofollow is `meta_robots_flags`' job —
    compose: follow links = 0 when nofollow). Counting is two JVM
    regexp_count passes over the anchor tags; no parser, no UDF."""
    c = F.coalesce(F.col(html_col), F.lit(""))
    total = F.regexp_count(c, F.lit(r'(?i)<a\s[^>]*href="[^"]*"'))
    # both attribute orders, counted separately (no lookahead — the
    # oracle's RE2 engine has none); an anchor carries at most one
    # order so the sum cannot double-count
    nofollow = F.regexp_count(
        c, F.lit(r'(?i)<a\s[^>]*href="[^"]*"[^>]*rel="nofollow"')
    ) + F.regexp_count(
        c, F.lit(r'(?i)<a\s[^>]*rel="nofollow"[^>]*href="[^"]*"')
    )
    return pages.withColumn(
        "n_links_total", total.cast("long")
    ).withColumn("n_links_follow", (total - nofollow).cast("long"))


# (prefix_hex, type), longest/most-specific first — the match order
# IS the spec (GIF before the generic '<' rule is irrelevant, but
# RIFF must refine to webp/wav before falling back to 'riff').
MAGIC_PREFIXES = (
    ("89504E470D0A1A0A", "image/png"),
    ("474946383761", "image/gif"),
    ("474946383961", "image/gif"),
    ("255044462D", "application/pdf"),
    ("FFD8FF", "image/jpeg"),
    ("504B0304", "application/zip"),
    ("1F8B", "application/gzip"),
    ("3C", "text/html"),
)


def sniff_content_type(col: Column | str) -> Column:
    """Content type from a binary column's magic bytes — the gate a
    crawler needs because servers lie in Content-Type headers (a
    '.htm' URL can serve a PDF; a 200 'text/html' can be a gzip).

    Strict-prefix semantics over `MAGIC_PREFIXES` plus the RIFF
    refinement (bytes 9-12 distinguish WEBP/WAV): matching happens on
    `hex()` of the bytes, which both engines produce identically and
    which never trips invalid-UTF-8 decode errors the way a
    cast-to-string sniff would on real image bytes. 'text/html' means
    "first byte is '<'" — no whitespace/BOM skipping, by design (a
    page with leading whitespace is still mostly-html; callers that
    care should normalize first). Unmatched -> 'unknown'.

    Per-row JVM expressions only (hex + startswith + substr).
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.hex(c)
    riff_tag = F.substring(h, 17, 8)
    expr = F.when(
        h.startswith("52494646"),
        F.when(riff_tag == "57454250", F.lit("image/webp"))
        .when(riff_tag == "57415645", F.lit("audio/wav"))
        .otherwise(F.lit("application/riff")),
    )
    for pfx, typ in MAGIC_PREFIXES:
        expr = expr.when(h.startswith(pfx), F.lit(typ))
    return expr.otherwise(F.lit("unknown"))


# Fullwidth ASCII block U+FF01..U+FF5E maps 1:1 onto U+0021..U+007E;
# the ideographic space U+3000 maps to a plain space. This is the
# width-folding slice of NFKC — the part that matters for mixed
# CJK/Latin web text (the reference's actual domain: a fullwidth
# '１２３' in a Chinese page must tokenize like '123').
FULLWIDTH_CHARS = "".join(chr(0xFF01 + i) for i in range(94)) + "　"
HALFWIDTH_CHARS = "".join(chr(0x21 + i) for i in range(94)) + " "

_CONTROL_RE = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"


def normalize_text(col: Column | str) -> Column:
    """Deterministic web-text normalization, all JVM expressions:

    1. fold fullwidth ASCII + ideographic space to halfwidth
       (`translate`, one pass)
    2. strip C0/DEL control characters (keeping \\t \\n \\r, which
       step 3 then folds as whitespace)
    3. collapse whitespace runs to single spaces and trim

    Order matters: width-folding first so a fullwidth space joins the
    whitespace collapse. This is the NFKC-width + control-strip +
    ws-normalize prefix of a training-data cleaner; full NFKC
    (ligatures, compatibility ideographs) needs ICU and is out of
    scope by design."""
    c = F.col(col) if isinstance(col, str) else col
    folded = F.translate(c, FULLWIDTH_CHARS, HALFWIDTH_CHARS)
    stripped = F.regexp_replace(folded, _CONTROL_RE, "")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


def demojibake(col: Column | str) -> Column:
    """Invert the common UTF-8-as-Latin-1 sequences via a fixed
    replace chain (`MOJIBAKE_REPAIRS` order). Lossless on undamaged
    text: every source sequence contains a codepoint (Ã/â/Â + marker)
    that real prose doesn't produce adjacently."""
    c = F.col(col) if isinstance(col, str) else col
    for bad, good in MOJIBAKE_REPAIRS:
        c = F.replace(c, F.lit(bad), F.lit(good))
    return c
