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
