"""Sitemap XML parsing as JVM-side DataFrame expressions.

Sitemaps are the crawl frontier's other discovery channel besides
in-page links (the reference discovers only via link extraction,
crawlernewsspider.py start_urls + SgmlLinkExtractor; sitemaps are the
standard complement for a polite production crawler). A sitemap body
is one XML document per host listing <url><loc>..</loc>
<lastmod>..</lastmod></url> entries.

Parsing is regexp extraction, not an XML library: sitemap files are
machine-generated with a fixed shape, the hot path must stay inside
whole-stage codegen, and a malformed entry should drop (null lastmod)
rather than fail the batch. `regexp_extract_all` over the <url>
blocks, then per-block field extraction — all JVM, zero Python,
dual-expressible in ANSI SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["urls_from_sitemap", "sitemap_index_entries", "resolve_sitemap_index"]


def urls_from_sitemap(
    sitemaps: DataFrame,
    host_col: str = "host",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """(host, sitemap_xml) -> one row per <url> entry:
    (host, loc, lastmod timestamp|null).

    Entries without a <loc> are dropped; a missing or malformed
    <lastmod> yields null (the frontier treats those as
    always-recrawlable). Rows explode from bounded sitemap bodies
    (the protocol caps a sitemap at 50k entries), so the fan-out per
    input row is bounded and needs no special partitioning.

    The block regex runs in DOTALL mode ((?s)) — real sitemaps put
    each child tag on its own line, so '.' must cross newlines or
    every multi-line <url> entry would silently parse to nothing.
    Field values (<loc>, <lastmod>) are single-line by protocol and
    are trimmed, so pretty-printed whitespace around them is inert.
    """
    blocks = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(
                F.col(xml_col), F.lit("(?s)<url>(.*?)</url>"), 1
            )
        ).alias("entry"),
    )
    loc = F.trim(F.regexp_extract("entry", "<loc>(.*?)</loc>", 1))
    return (
        blocks.select(
            "host",
            loc.alias("loc"),
            F.expr(
                "try_cast(trim(regexp_extract(entry,"
                " '<lastmod>(.*?)</lastmod>', 1)) AS timestamp)"
            ).alias("lastmod"),
        )
        .filter(F.length("loc") > 0)
    )


def sitemap_index_entries(
    indexes: DataFrame,
    host_col: str = "host",
    xml_col: str = "index_xml",
) -> DataFrame:
    """(host, index_xml) -> one row per <sitemap> child of a
    <sitemapindex>: (host, sitemap_loc, index_lastmod timestamp|null).

    Large sites shard their URL space across child sitemaps behind an
    index file (the protocol caps one sitemap at 50k URLs, so any
    10^6-URL host MUST use an index) — a crawler that only parses
    urlset files misses most of the web's sitemap surface. Children
    without a <loc> drop; malformed <lastmod> yields null. Same
    DOTALL regexp discipline as `urls_from_sitemap`."""
    blocks = indexes.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(
                F.col(xml_col), F.lit("(?s)<sitemap>(.*?)</sitemap>"), 1
            )
        ).alias("entry"),
    )
    loc = F.trim(F.regexp_extract("entry", "<loc>(.*?)</loc>", 1))
    return blocks.select(
        "host",
        loc.alias("sitemap_loc"),
        F.expr(
            "try_cast(trim(regexp_extract(entry,"
            " '<lastmod>(.*?)</lastmod>', 1)) AS timestamp)"
        ).alias("index_lastmod"),
    ).filter(F.length("sitemap_loc") > 0)


def resolve_sitemap_index(
    indexes: DataFrame,
    bodies: DataFrame,
    host_col: str = "host",
    index_xml_col: str = "index_xml",
    loc_col: str = "sitemap_loc",
    body_xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Walk index -> child sitemap -> URLs in one pass:
    (host, sitemap_loc, loc, lastmod). `bodies` maps a child
    sitemap's URL to its fetched urlset XML (sitemap_loc,
    sitemap_xml); children whose body was never fetched drop (inner
    join — the frontier schedules them like any URL). One bounded
    explode per level, one equi-join; the protocol's single level of
    nesting means no iteration."""
    entries = sitemap_index_entries(indexes, host_col, index_xml_col)
    fetched = entries.join(
        bodies.select(
            F.col(loc_col).alias("sitemap_loc"),
            F.col(body_xml_col).alias("sitemap_xml"),
        ),
        "sitemap_loc",
    )
    # parse each child body keyed by its own loc, then re-attach host
    urls = urls_from_sitemap(
        fetched.select("sitemap_loc", "sitemap_xml"),
        host_col="sitemap_loc",
        xml_col="sitemap_xml",
    ).withColumnRenamed("host", "sitemap_loc")
    return urls.join(
        entries.select("sitemap_loc", "host").distinct(), "sitemap_loc"
    ).select("host", "sitemap_loc", "loc", "lastmod")
