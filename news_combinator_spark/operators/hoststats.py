"""Host-level curation statistics that feed back into crawl scheduling.

The reference schedules purely by source config (crawler.php walks a
static source list); a web-scale frontier instead LEARNS per-host
behavior and folds it into the politeness/priority plan each round:

- trap_hosts:      distinct-URL vs distinct-content explosion — the
                   content-side crawler-trap signal (calendar pages /
                   session ids serving identical bodies). Complements
                   the syntax-side template mining in the
                   `url_templates` query: a trap whose varying tokens
                   are non-numeric is invisible to template
                   collapsing but still shows up here.
- host_reputation: compose trap ratio, soft-404-ish rate, and mean
                   document quality into one crawl-budget multiplier
                   per host, the number a frontier scheduler
                   multiplies into its per-host politeness budget
                   (operators/frontier.py budgets).

Everything is host-granularity aggregation over built-in expressions:
map-side-combined groupBys, ordinary equi-joins at host cardinality
(10^7-10^8 at web scale — never forced-broadcast, per the
mirror_hosts lesson), zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trap_hosts(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    host_col: str = "host",
    ratio_threshold: float = 2.0,
) -> DataFrame:
    """(host, n_urls, n_contents, url_content_ratio, is_trap).

    A host is flagged when it serves ``ratio_threshold`` times more
    distinct URLs than distinct content bodies — the signature of an
    infinite URL space over finite content. Content identity is
    md5(text) so the aggregate carries 16-byte digests, not bodies.
    Two count-distincts in one groupBy (one expand, still map-side
    partial); output is one row per host.
    """
    per_host = pages.groupBy(host_col).agg(
        F.countDistinct(F.col(url_col)).alias("n_urls"),
        F.countDistinct(F.md5(F.col(text_col))).alias("n_contents"),
    )
    ratio = F.col("n_urls") / F.col("n_contents")
    return per_host.select(
        host_col,
        "n_urls",
        "n_contents",
        F.round(ratio, 4).alias("url_content_ratio"),
        (ratio > ratio_threshold).alias("is_trap"),
    )


def host_reputation(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    host_col: str = "host",
    trap_ratio_threshold: float = 2.0,
    stub_chars: int = 64,
    stub_rate_threshold: float = 0.3,
    low_quality_factor: float = 0.5,
) -> DataFrame:
    """Per-host crawl-budget multiplier from observed page quality.

    Signals, each halving (or quartering) the budget when tripped:

    - trap:        url_content_ratio > trap_ratio_threshold  -> x0.25
    - stubs:       fraction of pages shorter than ``stub_chars``
                   characters exceeds ``stub_rate_threshold`` -> x0.5
                   (the cheap soft-404 proxy; the full admission gate
                   is functions/pagehealth.soft404_signals)
    - low quality: host mean token count below
                   ``low_quality_factor`` x corpus mean -> x0.5

    Returns (host, n_urls, url_content_ratio, stub_rate, mean_tok,
    budget_multiplier). The multiplier is what a scheduler multiplies
    into the host's politeness budget next round — curation feeding
    back into crawl ordering. The corpus mean is a 1-row aggregate
    broadcast into the host frame; the host<->trap join is an
    ordinary equi-join.
    """
    n_tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    per_host = pages.groupBy(host_col).agg(
        F.avg(n_tok).alias("mean_tok"),
        F.avg(
            (F.length(F.col(text_col)) < stub_chars).cast("double")
        ).alias("stub_rate"),
    )
    corpus = pages.agg(F.avg(n_tok).alias("corpus_mean_tok"))
    traps = trap_hosts(
        pages, url_col, text_col, host_col, trap_ratio_threshold
    )
    joined = per_host.join(traps, host_col).crossJoin(F.broadcast(corpus))
    mult = (
        F.lit(1.0)
        * F.when(F.col("is_trap"), F.lit(0.25)).otherwise(F.lit(1.0))
        * F.when(
            F.col("stub_rate") > stub_rate_threshold, F.lit(0.5)
        ).otherwise(F.lit(1.0))
        * F.when(
            F.col("mean_tok")
            < F.lit(low_quality_factor) * F.col("corpus_mean_tok"),
            F.lit(0.5),
        ).otherwise(F.lit(1.0))
    )
    return joined.select(
        host_col,
        "n_urls",
        "url_content_ratio",
        F.round("stub_rate", 4).alias("stub_rate"),
        F.round("mean_tok", 4).alias("mean_tok"),
        F.round(mult, 4).alias("budget_multiplier"),
    )


def discovery_yield(
    pages: DataFrame,
    outlinks: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    link_col: str = "link",
) -> DataFrame:
    """Per-host frontier value: how many NEW urls each fetched page
    contributes — (host, n_pages, n_new_links, offsite_frac,
    discovery_yield).

    `outlinks` is (host, link) — one row per extracted link from a
    fetched page of `host`. A link is NEW when it is not itself a
    fetched page url (the crawl's seen set at this snapshot);
    discovery_yield = distinct new links / pages fetched. High-yield
    hosts (hubs, fresh indexes) are where a budget-constrained
    frontier earns its next round — the OPIC-style counterpart to
    trap_hosts' negative signal, and `offsite_frac` separates
    frontier EXPANSION (cross-host discovery) from site self-cover.
    Feed into apply_priority_boosts / host budgets alongside
    host_reputation.

    Shape: one distinct on (host, link), one anti-join against the
    fetched-url set (both on the crawl loop's own url shuffle key),
    two map-side-combined groupBys, one host-level equi-join. Never a
    window, never a broadcast of unbounded host frames.
    """
    fetched = pages.select(F.col(url_col).alias(link_col)).distinct()
    per_host = pages.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("n_pages")
    )
    link_host = F.regexp_extract(F.col(link_col), r"^[a-z]+://([^/]+)", 1)
    new_links = (
        outlinks.dropDuplicates([host_col, link_col])
        .join(fetched, link_col, "left_anti")
        .groupBy(host_col)
        .agg(
            F.count(F.lit(1)).alias("n_new_links"),
            F.avg(
                (link_host != F.col(host_col)).cast("double")
            ).alias("offsite_frac"),
        )
    )
    j = per_host.join(new_links, host_col, "left")
    return j.select(
        host_col,
        "n_pages",
        F.coalesce(F.col("n_new_links"), F.lit(0)).alias("n_new_links"),
        F.round(F.coalesce(F.col("offsite_frac"), F.lit(0.0)), 6).alias(
            "offsite_frac"
        ),
        F.round(
            F.coalesce(F.col("n_new_links"), F.lit(0))
            / F.col("n_pages"),
            6,
        ).alias("discovery_yield"),
    )


def param_significance(
    requests: DataFrame,
    url_col: str = "url",
    fp_col: str = "fp",
    min_support: int = 2,
) -> DataFrame:
    """Which URL query parameters actually change content, per host —
    the DUST signal ("Do Not Crawl in the DUST: Different URLs with
    Similar Text", Bar-Yossef et al., WWW 2007) that lets a frontier
    collapse session-id / tracking parameters BEFORE fetching instead
    of deduplicating after.

    Input: (url, fp) request log rows where fp fingerprints the
    fetched content. For each (host, param), urls carrying the param
    are grouped by their STRIPPED form (the url with that key=value
    pair removed); only groups the param actually multiplies
    (>= 2 urls) are evidence. Within those groups:

        n_groups  stripped-url groups with >= 2 urls
        n_urls    urls across those groups
        n_fp      sum over groups of distinct content fingerprints

    A parameter whose groups each serve ONE content (n_fp == n_groups)
    is INSIGNIFICANT — stripping it merges urls without merging
    distinct content; any within-group content variation
    (n_fp > n_groups) keeps it significant. The within-group
    comparison is what makes the signal robust to co-occurring
    parameters: a session id stays insignificant even when every url
    also carries a genuinely significant paging parameter.
    (host, param) pairs with fewer than ``min_support`` urls in
    evidence groups are dropped.

    The strip is literal-string surgery on the url's own `key=value`
    pair (each key assumed at most once per url, the overwhelmingly
    common shape), so the whole operator is built-in string/agg
    expressions: one explode of query pairs, then two map-side-
    combined groupBys — (host, param, stripped) is request-log
    cardinality, (host, param) is tiny. No window, no Python.
    """
    q = F.regexp_extract(F.col(url_col), r"\?(.*)$", 1)
    pairs = requests.select(
        F.col(url_col).alias("url"),
        F.col(fp_col).alias("fp"),
        F.regexp_extract(
            F.col(url_col), r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1
        ).alias("host"),
        F.explode(F.split(q, "&")).alias("pair"),
    ).filter(F.col("pair") != "")
    # remove the pair: '&k=v' anywhere after the first param; then a
    # leading '?k=v&' promotes the next param; a bare '?k=v' tail drops
    stripped = F.replace(
        F.replace(
            F.replace(
                F.col("url"),
                F.concat(F.lit("&"), F.col("pair")),
                F.lit(""),
            ),
            F.concat(F.lit("?"), F.col("pair"), F.lit("&")),
            F.lit("?"),
        ),
        F.concat(F.lit("?"), F.col("pair")),
        F.lit(""),
    )
    keyed = pairs.select(
        "url",
        "fp",
        "host",
        F.regexp_extract("pair", r"^([^=]*)", 1).alias("param"),
        stripped.alias("stripped"),
    )
    grp = (
        keyed.groupBy("host", "param", "stripped")
        .agg(
            F.countDistinct("url").alias("g_urls"),
            F.countDistinct("fp").alias("g_fps"),
        )
        .filter(F.col("g_urls") >= 2)
    )
    agg = grp.groupBy("host", "param").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("g_urls").alias("n_urls"),
        F.sum("g_fps").alias("n_fp"),
    )
    return agg.filter(F.col("n_urls") >= min_support).select(
        "host",
        "param",
        "n_groups",
        "n_urls",
        "n_fp",
        (F.col("n_fp") > F.col("n_groups")).alias("significant"),
    )


def path_profile(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    max_depth: int = 3,
) -> DataFrame:
    """Site-structure rollup: per (host, path prefix, depth) the page
    count, total text bytes, and distinct content fingerprints, for
    every prefix up to ``max_depth`` segments — the map a crawl
    operator reads to SCOPE a crawl ("/a/ is the article tree, 2M
    pages; /tag/ is 40M near-empty pages") and the denominator for
    directory-level include/exclude rules.

    Each url contributes one row per ancestor prefix (<= max_depth,
    a constant), emitted by exploding a sequence of slash positions —
    pure JVM expressions, then ONE map-side-combined groupBy at
    (host, prefix) cardinality. No window, no Python, no second scan.
    """
    path = F.regexp_replace(
        F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/]*", ""
    )
    path = F.regexp_replace(path, r"[?#].*$", "")
    segs = F.split(path, "/")  # leading '' element for the root slash
    # guard: sequence(1, stop) DESCENDS when stop < 1, so a root-path
    # url ('/', one segment) must yield no prefixes, not [1, 0]
    depths = F.when(
        F.size(segs) >= 3,
        F.sequence(F.lit(1), F.least(F.lit(max_depth), F.size(segs) - 2)),
    ).otherwise(F.expr("array()").cast("array<int>"))
    rows = pages.select(
        F.regexp_extract(
            F.col(url_col), r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1
        ).alias("host"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("fp"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("nbytes"),
        segs.alias("segs"),
        F.explode(depths).alias("depth"),
    ).select(
        "host",
        "fp",
        "nbytes",
        "depth",
        F.concat(
            F.array_join(F.slice("segs", 1, F.col("depth") + 1), "/"),
            F.lit("/"),
        ).alias("prefix"),
    )
    return rows.groupBy("host", "prefix", "depth").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("nbytes").alias("total_bytes"),
        F.countDistinct("fp").alias("n_distinct_fp"),
    )


def host_clusters(
    edges: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Resolve pairwise host-equivalence evidence (mirror detection,
    reciprocal rings, shared-registrant heuristics) into CLUSTERS:
    (host, cluster, is_canonical), cluster = lexicographically
    smallest member. The frontier treats a cluster as ONE logical
    site — one politeness identity, one crawl of shared content —
    instead of re-fetching every mirror.

    Reuses the crawl engine's hash-min connected components
    (clustering.connected_components: one groupBy shuffle per round,
    O(diameter) rounds, symmetric edge list checkpointed once); min
    label propagation is type-agnostic, so string hosts need no id
    assignment pass.
    """
    from .clustering import connected_components

    comps = connected_components(
        edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    )
    return comps.select(
        F.col("doc_id").alias("host"),
        F.col("component").alias("cluster"),
        (F.col("doc_id") == F.col("component")).alias("is_canonical"),
    )
