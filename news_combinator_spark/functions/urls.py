"""URL canonicalization, grammar rules, and hashing.

The reference's per-source URL grammars (crawlernewsspider.py:16,39,62;
reconstruction/crawler/crawler.php:232-236,292-296,364-368) become
regex rules with capture groups that turn into columns (date, news id).
Canonicalization + dedup is Scrapy's implicit dupefilter / the file-
exists check (pipelines.py:19-23) re-expressed as an explicit kernel.

Engine-side hashing uses Spark's built-in ``xxhash64`` (JVM, codegen).
The pure-Python oracle uses the same Spark function through a local
session, so hashes agree by construction.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Reference URL grammars (v1 spiders). Group order: (base, date-ish, id).
NETEASE_URL = r"(http://news\.163\.com)/(\d{2})/(\d{4})/\d+/(\w+)\.html"
SINA_URL = (
    r"(http://(?:\w+\.)*news\.sina\.com\.cn)/.*/(\d{4}-\d{2}-\d{2})/"
    r"\d{4}(\d{8})\.(?:s)html"
)
TENCENT_URL = r"(.*)/a/(\d{8})/(\d+)\.htm"

SOURCE_RULES = {
    "netease": NETEASE_URL,
    "sina": SINA_URL,
    "tencent": TENCENT_URL,
}

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str) -> str:
    """Deterministic canonical form:

    - scheme + host lowercased
    - default port stripped
    - fragment stripped
    - query keys sorted (stable; duplicate keys keep relative order)
    - empty path -> '/'
    """
    if not url:
        return ""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    if ":" in netloc:
        host, _, port = netloc.rpartition(":")
        if port == _DEFAULT_PORTS.get(scheme, ""):
            netloc = host
    path = parts.path or "/"
    query = "&".join(sorted(parts.query.split("&"))) if parts.query else ""
    return urlunsplit((scheme, netloc, path, query, ""))


def url_host(url: str) -> str:
    try:
        return urlsplit(url).netloc.lower().rpartition("@")[2].split(":")[0]
    except ValueError:
        return ""


@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: canonicalize_url(u or ""))


@F.pandas_udf(T.StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: url_host(u or ""))


def with_url_identity(df, url_col: str = "url"):
    """Add canonical url, host, and 64-bit hash columns.

    host/hash are derived with built-in functions (JVM side) where
    possible: ``parse_url`` handles host; xxhash64 the canonical form.
    Canonicalization itself needs the Python kernel (query-sort).
    """
    return (
        df.withColumn("url_canon", canonicalize_udf(F.col(url_col)))
        .withColumn("host", F.lower(F.parse_url(F.col("url_canon"), F.lit("HOST"))))
        .withColumn("url_hash", F.xxhash64("url_canon"))
    )


def match_source(url: str) -> tuple[str, str, str] | None:
    """(source, yyyymmdd, news_id) per the reference grammar, else None.

    Mirrors parse_news date logic: netease '20'+yy+mmdd
    (crawlernewsspider.py:25), sina joins date parts (:47), tencent
    uses the 8-digit group (:70).
    """
    m = re.match(NETEASE_URL, url)
    if m:
        return ("netease", "20" + m.group(2) + m.group(3), m.group(4))
    m = re.match(SINA_URL, url)
    if m:
        return ("sina", m.group(2).replace("-", ""), m.group(3))
    m = re.match(TENCENT_URL, url)
    if m:
        return ("tencent", m.group(2), m.group(3))
    return None
