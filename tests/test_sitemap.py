"""Sitemap XML parsing unit tests (field extraction + error paths)."""

from news_combinator_spark.functions.sitemap import urls_from_sitemap

_XML = (
    "<urlset>"
    "<url><loc>http://h0.test/a</loc>"
    "<lastmod>2024-01-02T03:04:05</lastmod></url>"
    "<url><loc>http://h0.test/b</loc><lastmod>soon</lastmod></url>"
    "<url><lastmod>2024-01-01</lastmod></url>"
    "<url><loc>http://h0.test/c</loc></url>"
    "</urlset>"
)


def test_urls_from_sitemap_fields_and_error_paths(spark):
    sm = spark.createDataFrame(
        [("h0.test", _XML)], "host string, sitemap_xml string"
    )
    rows = {r.loc: r for r in urls_from_sitemap(sm).collect()}
    # loc-less entry dropped; 3 entries survive
    assert sorted(rows) == [
        "http://h0.test/a", "http://h0.test/b", "http://h0.test/c"
    ]
    assert rows["http://h0.test/a"].lastmod is not None
    assert rows["http://h0.test/a"].lastmod.isoformat() == "2024-01-02T03:04:05"
    # malformed and missing lastmod both null, not an error
    assert rows["http://h0.test/b"].lastmod is None
    assert rows["http://h0.test/c"].lastmod is None


_XML_MULTILINE = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> http://h1.test/x </loc>
    <lastmod>2024-02-03T04:05:06</lastmod>
  </url>
  <url>
    <loc>http://h1.test/y</loc>
  </url>
</urlset>
"""


def test_multiline_pretty_printed_sitemap(spark):
    """Real sitemaps put each child tag on its own line — the block
    regex must run DOTALL or every entry silently vanishes; loc is
    trimmed of pretty-print padding."""
    sm = spark.createDataFrame(
        [("h1.test", _XML_MULTILINE)], "host string, sitemap_xml string"
    )
    rows = {r.loc: r for r in urls_from_sitemap(sm).collect()}
    assert sorted(rows) == ["http://h1.test/x", "http://h1.test/y"]
    assert rows["http://h1.test/x"].lastmod.isoformat() == "2024-02-03T04:05:06"
    assert rows["http://h1.test/y"].lastmod is None


def test_discovery_channel_composition(spark):
    """robots.txt names the sitemaps, the sitemaps name the URLs, the
    store's lastmod gate drops what cannot have changed — the full
    sitemap discovery channel, chained end-to-end into frontier-ready
    candidates."""
    from news_combinator_spark.functions.robots import (
        sitemaps_from_robots_txt,
    )
    from news_combinator_spark.operators.snapshots import (
        modified_candidates,
    )

    robots = spark.createDataFrame(
        [("h.test",
          "User-agent: *\nDisallow: /x\nSitemap: http://h.test/sm.xml\n")],
        "host string, robots_txt string",
    )
    maps = sitemaps_from_robots_txt(robots)
    assert [r.sitemap_url for r in maps.collect()] == [
        "http://h.test/sm.xml"
    ]

    # fetching the named sitemap yields a body; parse it
    bodies = maps.join(
        spark.createDataFrame(
            [("http://h.test/sm.xml",
              "<urlset>\n"
              "<url>\n  <loc>http://h.test/fresh</loc>\n"
              "  <lastmod>2024-02-01T00:00:00</lastmod>\n</url>\n"
              "<url>\n  <loc>http://h.test/stale</loc>\n"
              "  <lastmod>2024-01-01T00:00:00</lastmod>\n</url>\n"
              "<url>\n  <loc>http://h.test/unknown</loc>\n</url>\n"
              "</urlset>")],
            "sitemap_url string, sitemap_xml string",
        ),
        "sitemap_url",
    )
    urls = urls_from_sitemap(bodies)
    assert urls.count() == 3

    # store has both known urls as of mid-January
    store = spark.createDataFrame(
        [("http://h.test/fresh", "2024-01-15 00:00:00"),
         ("http://h.test/stale", "2024-01-15 00:00:00")],
        "url string, snap_ts string",
    ).selectExpr("url", "cast(snap_ts as timestamp) as snap_ts")
    cand = urls.selectExpr("loc as url", "lastmod")
    kept = sorted(
        r.url
        for r in modified_candidates(cand, store, lastmod_col="lastmod")
        .collect()
    )
    # fresh: lastmod after snapshot -> re-fetch; stale: dropped;
    # unknown lastmod: always re-crawlable
    assert kept == ["http://h.test/fresh", "http://h.test/unknown"]


def test_sitemap_index_entries_and_resolution(spark):
    """Index children without <loc> drop; unfetched children drop at
    the join; malformed child lastmod parses null; URLs carry their
    owning shard and host."""
    from news_combinator_spark.functions.sitemap import (
        resolve_sitemap_index,
        sitemap_index_entries,
    )

    idx = (
        "<sitemapindex>"
        "<sitemap><loc>http://h.test/sm/a.xml</loc>"
        "<lastmod>2024-02-01</lastmod></sitemap>"
        "<sitemap><loc> http://h.test/sm/b.xml </loc>"
        "<lastmod>not-a-date</lastmod></sitemap>"
        "<sitemap><lastmod>2024-02-03</lastmod></sitemap>"  # no loc
        "<sitemap><loc>http://h.test/sm/missing.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    indexes = spark.createDataFrame(
        [("h.test", idx)], "host string, index_xml string"
    )
    ents = {
        r.sitemap_loc: r.index_lastmod
        for r in sitemap_index_entries(indexes).collect()
    }
    assert set(ents) == {
        "http://h.test/sm/a.xml", "http://h.test/sm/b.xml",
        "http://h.test/sm/missing.xml",
    }
    assert ents["http://h.test/sm/a.xml"] is not None
    assert ents["http://h.test/sm/b.xml"] is None  # malformed lastmod

    bodies = spark.createDataFrame(
        [
            ("http://h.test/sm/a.xml",
             "<urlset><url><loc>http://h.test/1</loc>"
             "<lastmod>2024-01-05T00:00:00</lastmod></url></urlset>"),
            ("http://h.test/sm/b.xml",
             "<urlset><url><loc>http://h.test/2</loc></url></urlset>"),
        ],
        "sitemap_loc string, sitemap_xml string",
    )
    got = {
        (r.host, r.sitemap_loc, r.loc, r.lastmod is None)
        for r in resolve_sitemap_index(indexes, bodies).collect()
    }
    assert got == {
        ("h.test", "http://h.test/sm/a.xml", "http://h.test/1", False),
        ("h.test", "http://h.test/sm/b.xml", "http://h.test/2", True),
    }
