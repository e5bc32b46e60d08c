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
