"""Canonical-link consolidation, eTLD+1 extraction, normalization.

Edges the driver oracles' fixtures don't reach: dangling canonical
targets, suffix shadowing with a custom PSL, normalization
idempotence.
"""

from pyspark.sql import functions as F

from news_combinator_spark.functions.pagehealth import normalize_text
from news_combinator_spark.functions.urls import (
    canonical_href,
    registered_domain,
)
from news_combinator_spark.operators.dedup import canonical_consolidate


def test_canonical_href_orders_and_absence(spark):
    df = spark.createDataFrame(
        [
            ('<link rel="canonical" href="http://c/1"/>',),
            ('<link href="http://c/2" rel="canonical"/>',),
            ('<link rel="stylesheet" href="http://c/3"/>',),
            ("<html>no links</html>",),
        ],
        "html_str string",
    )
    got = [r.c for r in df.select(canonical_href("html_str").alias("c")).collect()]
    assert got == ["http://c/1", "http://c/2", None, None]


def test_canonical_consolidate_keep_rule(spark):
    mk = lambda c: f'<html><link rel="canonical" href="{c}"/></html>'
    rows = [
        # group A: canonical page itself present -> kept over smaller url
        ("http://h/a", mk("http://h/a")),
        ("http://h/A-variant", mk("http://h/a")),
        # group B: DANGLING canonical (target never crawled) -> lexi min
        ("http://h/b2", mk("http://h/b")),
        ("http://h/b1", mk("http://h/b")),
        # singleton, no canonical declared
        ("http://h/solo", "<html></html>"),
    ]
    df = spark.createDataFrame(rows, "url string, html_str string")
    got = {
        r.canonical_url: (r.kept_url, r.n_variants)
        for r in canonical_consolidate(df).collect()
    }
    assert got == {
        "http://h/a": ("http://h/a", 2),
        "http://h/b": ("http://h/b1", 2),
        "http://h/solo": ("http://h/solo", 1),
    }


def test_registered_domain_longest_suffix_wins(spark):
    df = spark.createDataFrame(
        [("a.b.co.uk",), ("x.co.uk",), ("co.uk",), ("plain.uk",)],
        "host string",
    )
    got = {
        r.host: (r.public_suffix, r.registered_domain)
        for r in registered_domain(df, suffixes=("uk", "co.uk")).collect()
    }
    # 'co.uk' beats 'uk' wherever both match on a label boundary
    assert got["a.b.co.uk"] == ("co.uk", "b.co.uk")
    assert got["x.co.uk"] == ("co.uk", "x.co.uk")
    # host IS the suffix: no owner label -> last-two-labels fallback
    assert got["co.uk"] == ("co.uk", "co.uk")
    assert got["plain.uk"] == ("uk", "plain.uk")


def test_registered_domain_no_false_label_match(spark):
    """'notco.uk' must not match suffix 'co.uk' (label boundary) but
    does match 'uk'; unknown TLDs fall back to last two labels."""
    df = spark.createDataFrame(
        [("notco.uk",), ("a.b.internal",)], "host string"
    )
    got = {
        r.host: (r.public_suffix, r.registered_domain)
        for r in registered_domain(df, suffixes=("uk", "co.uk")).collect()
    }
    assert got["notco.uk"] == ("uk", "notco.uk")
    assert got["a.b.internal"] == (None, "b.internal")


def test_normalize_text_idempotent_and_fixed_point(spark):
    noisy = "Ａｂｃ！１２３　x\x07y\tz  end "
    df = spark.createDataFrame(
        [(noisy,), ("already clean ascii",)], "text string"
    )
    once = df.select(normalize_text("text").alias("t"))
    twice = once.select(normalize_text("t").alias("t"))
    a, b = [r.t for r in once.collect()], [r.t for r in twice.collect()]
    assert a == b  # idempotent
    assert a[0] == "Abc!123 xy z end"
    assert a[1] == "already clean ascii"  # clean text is a fixed point


def test_canonicalize_rfc3986_normalization():
    """§6 syntax-based normalization: dot segments resolve, '..' never
    climbs past root, percent hex uppercases, unreserved encodings
    decode, equivalent spellings collapse to one dedup key."""
    from news_combinator_spark.functions.urls import canonicalize_url as c

    assert c("http://H.test:80/a/./b/../c?z=1&a=2#f") == \
        "http://h.test/a/c?a=2&z=1"
    assert c("http://h.test/a/b/..") == "http://h.test/a/"
    assert c("http://h.test/../../x") == "http://h.test/x"
    assert c("https://h.test:443/%7Euser/%2fx") == \
        "https://h.test/~user/%2Fx"
    assert c("http://h.test/a%41?k=%6d") == "http://h.test/aA?k=m"
    # the equivalence class actually collapses
    spellings = [
        "http://h.test/a/c",
        "HTTP://h.test/./a/c",
        "http://H.TEST:80/a/b/../c",
        "http://h.test/%61/c",
    ]
    assert len({c(u) for u in spellings}) == 1
