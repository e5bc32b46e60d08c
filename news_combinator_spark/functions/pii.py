"""PII scrubbing for webtext training corpora.

The reference stores whatever its extractor captured (getcontent.py
writes raw passage text); a corpus destined for model training
redacts personally identifiable strings first — the standard
email/IP/phone pass every public webtext pipeline ships (CCNet,
RefinedWeb, Dolma all document exactly this step). Design rules:

1. **Pure JVM expressions.** Every pattern is a `regexp_replace` /
   `regexp_count` over the text column — whole-stage codegen, zero
   Python, one pass over the corpus with no shuffle at all (the
   audit's cheapest shape).

2. **Deterministic, engine-portable patterns.** Java regex and RE2
   (DuckDB) share no lookaround, so the IPv4 pattern guards its
   context with CAPTURED neighbor characters instead: the match must
   be bounded by non-digit-non-dot characters (or string edges),
   which keeps "1.2.3.4.5"-style version strings intact — a plain
   \\b boundary would happily redact "2.3.4.5" out of one. Because a
   consumed right-context character can hide an immediately following
   IP ("1.1.1.1 2.2.2.2"), the IP replace runs TWICE; the second pass
   sees the freed separator. Replacement group syntax differs
   ($1 in Spark, \\1 in DuckDB) — the oracle SQL carries its own
   spelling.

3. **Counts are literal-token counts on the FINAL text** (one
   regexp_count of '<EMAIL>' etc.), so count and redaction can never
   disagree with each other — at the cost that a source text already
   containing a literal token inflates its count, which is the right
   failure direction for a monitoring signal.

Patterns are deliberately conservative (precision over recall): a
false redaction deletes training signal silently, while a missed
rare format shows up in the counts this operator also emits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "EMAIL_PATTERN",
    "IP_PATTERN",
    "PHONE_PATTERN",
    "scrub_pii",
    "scrub_pii_col",
]

EMAIL_PATTERN = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
# group 1 = left context (consumed!), group 2 = the address,
# group 4 = right context; replacement must restore groups 1 and 4
# right context allows a sentence-terminating dot (dot followed by a
# non-digit or end) — without it 'from 10.1.2.3.' keeps its IP — while
# a dot followed by a DIGIT still protects version strings (1.2.3.4.5)
IP_PATTERN = (
    r"(^|[^0-9.])([0-9]{1,3}(\.[0-9]{1,3}){3})"
    r"($|[^0-9.]|\.([^0-9]|$))"
)
PHONE_PATTERN = (
    r"\+[0-9]{1,3}[ \-][0-9]{3}[ \-][0-9]{3,4}[ \-]?[0-9]{0,4}\b"
)


def scrub_pii_col(col: Column | str) -> Column:
    """The redacted text as a single column expression: emails first
    (their digit runs must never reach the phone pattern), the
    double-pass context-guarded IP replace, then phones."""
    out = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(out, EMAIL_PATTERN, "<EMAIL>")
    out = F.regexp_replace(out, IP_PATTERN, "$1<IP>$4")
    out = F.regexp_replace(out, IP_PATTERN, "$1<IP>$4")
    out = F.regexp_replace(out, PHONE_PATTERN, "<PHONE>")
    return out


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """(doc, n_emails, n_ips, n_phones, clean) — the redacted text a
    training shard should carry, plus per-kind counts as the
    per-slice monitoring signal (counted as literal tokens in the
    final text, so counts and redactions agree by construction)."""
    clean = scrub_pii_col(text_col)
    return df.select(
        F.col(doc_col).alias("doc"),
        F.regexp_count(clean, F.lit("<EMAIL>"))
        .cast("long")
        .alias("n_emails"),
        F.regexp_count(clean, F.lit("<IP>")).cast("long").alias("n_ips"),
        F.regexp_count(clean, F.lit("<PHONE>"))
        .cast("long")
        .alias("n_phones"),
        clean.alias("clean"),
    )
