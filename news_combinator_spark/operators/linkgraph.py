"""Link-graph centrality: iterative PageRank over crawl edges.

The reference crawls a link graph (SgmlLinkExtractor edges,
crawlernewsspider.py:62-75) but never ranks it; a production frontier
at Common-Crawl scale prioritizes URLs by link centrality (Common
Crawl itself publishes harmonic-centrality/PageRank host ranks), so
the engine ships PageRank as a first-class operator feeding the
frontier's `priority` key.

Scale design (10^10-edge graph):

- The edge list is the big, IMMUTABLE side. It is joined once with
  out-degrees, repartitioned by `src`, and persisted — every
  iteration's contribution join then reuses that partitioning; only
  the (node, rank) frame (orders of magnitude narrower) shuffles per
  iteration.
- Per-iteration work is join + groupBy(dst) + left join back to the
  node set: all JVM-side, map-side partial aggregation on the
  contribution sum, no windows, no collect of data-sized frames.
- Dangling mass (nodes with no out-links) is a 1-row aggregate
  cross-joined back — a broadcast of a scalar, never a driver loop.
- Fixed iteration count -> one deterministic plan, checkpointable
  every `checkpoint_every` rounds to bound lineage depth on long
  power iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["page_rank", "host_rank", "anchor_text_profile"]


def page_rank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    num_iters: int = 5,
    alpha: float = 0.85,
    dangling: str = "redistribute",
    checkpoint_every: int = 1,
) -> DataFrame:
    """Power-iteration PageRank over an edge list.

    Multi-edges count with multiplicity (a page linking twice sends
    twice the share), matching the multiset semantics of the link
    extractor's output. Nodes = union of sources and destinations.

    dangling: ``"redistribute"`` spreads the rank mass of out-degree-0
    nodes uniformly (the standard formulation); ``"ignore"`` drops it
    (total mass then decays, as in some crawler-priority variants).

    Returns (node, rank) with sum(rank) == 1 under "redistribute".

    checkpoint_every: localCheckpoint the (node, rank) frame every K
    iterations (default every iteration). Each round references the
    previous ranks TWICE — the contribution join and the dangling-mass
    aggregate — so an uncheckpointed chain re-evaluates both branches
    and doubles work per iteration (2^iters blow-up); checkpointing a
    frame that is orders of magnitude narrower than the edge list
    keeps every iteration O(edges). 0 disables (only safe for 1-2
    iterations under dangling="ignore", where ranks is referenced
    once).
    """
    if dangling not in ("redistribute", "ignore"):
        raise ValueError(f"dangling must be redistribute|ignore: {dangling}")

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .dropDuplicates(["node"])
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # big immutable side: partitioned by src ONCE, reused every round
    e_norm = (
        e.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w"))
        .repartition("src")
        .localCheckpoint()
    )

    base = (1.0 - alpha) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))

    # out-degree-0 node SET is iteration-invariant — materialize it
    # once; only its rank mass is re-summed per round
    dang_nodes = None
    if dangling == "redistribute":
        dang_nodes = (
            nodes.join(
                deg.withColumnRenamed("src", "node"), "node", "left_anti"
            ).localCheckpoint()
        )

    for i in range(num_iters):
        contrib = (
            e_norm.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("contrib"))
        )
        new_ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (F.lit(base) + F.lit(alpha) * F.coalesce("contrib", F.lit(0.0))).alias("rank"),
            )
        )
        if dangling == "redistribute":
            # rank mass sitting on out-degree-0 nodes this round: a
            # scalar, broadcast back as a uniform addend
            dang = (
                ranks.join(dang_nodes.select("node"), "node", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
            )
            new_ranks = new_ranks.crossJoin(F.broadcast(dang)).select(
                "node",
                (F.col("rank") + F.lit(alpha) * F.col("dm") / n).alias("rank"),
            )
        ranks = new_ranks
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()

    return ranks


def anchor_text_profile(
    pages: DataFrame,
    *,
    url_col: str = "url",
    host_col: str = "host",
    html_col: str = "html_str",
) -> DataFrame:
    """Per-target anchor-text aggregation over <a href="...">text</a>
    tags: (dst, n_refs, n_src_hosts, anchors).

    Anchor text is the web's free labeling signal — what OTHER pages
    call a URL — used for crawl prioritization and as retrieval/
    training metadata (the reference extracts hrefs only,
    crawlernewsspider.py:62-75; the text between the tags is what a
    production pipeline keeps). n_refs counts referring tags
    (multiplicity kept — two links from one page are two votes),
    n_src_hosts counts distinct referring hosts (the spam-resistant
    variant), anchors is the sorted distinct anchor-text set joined
    with '|' (deterministic, hash-comparable).

    Scale shape: tag explosion and both field extractions are JVM
    regexps inside whole-stage codegen (no Python); the profile is one
    groupBy(dst) shuffle with map-side partial aggregation. Anchor
    sets are per-URL small (capped by real pages' tag counts), so
    collect_set stays bounded; a 10^10-edge corpus shuffles narrow
    (dst, host, anchor) rows only.
    """
    tags = pages.select(
        F.col(host_col).alias("src_host"),
        F.explode(
            F.regexp_extract_all(
                F.col(html_col),
                F.lit('<a href="[^"]*">[^<]*</a>'),
                0,
            )
        ).alias("tag"),
    )
    pairs = tags.select(
        "src_host",
        F.regexp_extract("tag", 'href="([^"]*)"', 1).alias("dst"),
        F.regexp_extract("tag", ">([^<]*)<", 1).alias("anchor"),
    )
    return pairs.groupBy("dst").agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.countDistinct("src_host").alias("n_src_hosts"),
        F.concat_ws("|", F.array_sort(F.collect_set("anchor"))).alias(
            "anchors"
        ),
    )


def host_rank(
    pages: DataFrame, ranks: DataFrame, *, url: str = "url", node: str = "node"
) -> DataFrame:
    """Aggregate page ranks to host level (the frontier's priority key
    granularity): total and mean rank plus page count per host."""
    joined = pages.select(
        F.parse_url(F.col(url), F.lit("HOST")).alias("host"),
        F.col(url).alias("url"),
    ).join(ranks.withColumnRenamed(node, "url"), "url")
    return joined.groupBy("host").agg(
        F.sum("rank").alias("total_rank"),
        F.avg("rank").alias("mean_rank"),
        F.count(F.lit(1)).alias("n_pages"),
    )
