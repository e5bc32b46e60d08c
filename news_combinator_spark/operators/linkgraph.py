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

__all__ = [
    "page_rank",
    "host_rank",
    "anchor_text_profile",
    "hits_rank",
    "opic_priority",
    "reciprocal_hosts",
]


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


def hits_rank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    num_iters: int = 5,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Kleinberg HITS over an edge list: (node, hub, authority).

    Per iteration (synchronous, the standard formulation):

        auth(v) = sum over u->v of hub(u),   then L2-normalize auths
        hub(u)  = sum over u->v of auth(v),  then L2-normalize hubs

    Multi-edges count with multiplicity, matching page_rank and the
    link extractor's multiset output. Nodes = union of endpoints;
    initial hub = auth = 1/sqrt(n) (unit L2 norm). PageRank measures
    one global importance; HITS separates DIRECTORY pages (hubs —
    index/section pages whose value is what they point at) from
    CONTENT pages (authorities) — exactly the split a crawl scheduler
    wants, because a high-hub page is worth re-crawling for
    DISCOVERY (its links churn) while a high-authority page is worth
    re-crawling for CONTENT.

    Scale shape mirrors page_rank: the edge list is repartitioned by
    join key once and localCheckpoint'ed; per iteration only the
    (node, score) frame shuffles, the contribution sum is map-side
    combined, and the L2 norm is a 1-row aggregate broadcast back.
    Scores are checkpointed every ``checkpoint_every`` iterations —
    each round references them twice (contribution + norm), so an
    uncheckpointed chain doubles per iteration.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .dropDuplicates(["node"])
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("hub", F.lit(0.0)).withColumn(
            "authority", F.lit(0.0)
        )

    e_by_src = e.repartition("src").localCheckpoint()

    init = 1.0 / (n ** 0.5)
    scores = nodes.select(
        "node", F.lit(init).alias("hub"), F.lit(init).alias("auth")
    )

    def _l2_normalized(frame: DataFrame, col: str) -> DataFrame:
        norm = frame.agg(
            F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_n")
        )
        return frame.crossJoin(F.broadcast(norm)).select(
            *[c for c in frame.columns if c != col],
            F.when(F.col("_n") > 0, F.col(col) / F.col("_n"))
            .otherwise(F.lit(0.0))
            .alias(col),
        )

    for i in range(num_iters):
        auth_c = (
            e_by_src.join(
                scores.select(F.col("node").alias("src"), "hub"), "src"
            )
            .groupBy("dst")
            .agg(F.sum("hub").alias("auth_raw"))
        )
        with_auth = _l2_normalized(
            scores.drop("auth")
            .join(
                auth_c.withColumnRenamed("dst", "node"), "node", "left"
            )
            .select(
                "node", "hub",
                F.coalesce("auth_raw", F.lit(0.0)).alias("auth"),
            ),
            "auth",
        )
        hub_c = (
            e_by_src.join(
                with_auth.select(F.col("node").alias("dst"), "auth"),
                "dst",
            )
            .groupBy("src")
            .agg(F.sum("auth").alias("hub_raw"))
        )
        scores = _l2_normalized(
            with_auth.drop("hub")
            .join(
                hub_c.withColumnRenamed("src", "node"), "node", "left"
            )
            .select(
                "node", "auth",
                F.coalesce("hub_raw", F.lit(0.0)).alias("hub"),
            ),
            "hub",
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            scores = scores.localCheckpoint()

    return scores.select(
        "node",
        F.round("hub", 6).alias("hub"),
        F.round("auth", 6).alias("authority"),
    )


def opic_priority(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    num_rounds: int = 5,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Adaptive On-line Page Importance Computation (Abiteboul,
    Preda & Cobena, WWW 2003) in synchronous batch form: (node, cash,
    history, priority).

    OPIC is the crawl-native importance measure: each page holds
    CASH; "crawling" a page moves its cash into its HISTORY and
    distributes an equal share to every outlink. Unlike PageRank it
    needs no damping factor and its running estimate
    priority = (history + cash) / (rounds + 1) converges while the
    crawl is still in flight — which is why real frontiers use it to
    order FETCHES rather than waiting for a converged offline rank.

    Batch semantics here: every round, ALL nodes are "crawled" at
    once — history += cash, and next cash = sum of in-neighbor
    shares. Cash on dangling nodes (out-degree 0) goes to the virtual
    root and is redistributed uniformly, preserving total cash of
    1.0 every round (the paper's virtual-page construction).

    Scale shape identical to page_rank: edge list keyed+checkpointed
    once; per-round shuffles carry only (node, cash, history); the
    dangling sum is a broadcast scalar.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .dropDuplicates(["node"])
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return (
            nodes.withColumn("cash", F.lit(0.0))
            .withColumn("history", F.lit(0.0))
            .withColumn("priority", F.lit(0.0))
        )

    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    e_norm = (
        e.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w"))
        .repartition("src")
        .localCheckpoint()
    )
    dang_nodes = nodes.join(
        deg.withColumnRenamed("src", "node"), "node", "left_anti"
    ).localCheckpoint()

    state = nodes.select(
        "node",
        F.lit(1.0 / n).alias("cash"),
        F.lit(0.0).alias("history"),
    )

    for i in range(num_rounds):
        contrib = (
            e_norm.join(
                state.select(F.col("node").alias("src"), "cash"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("cash") * F.col("w")).alias("inflow"))
        )
        dang = state.join(
            dang_nodes.select("node"), "node", "left_semi"
        ).agg(F.coalesce(F.sum("cash"), F.lit(0.0)).alias("dm"))
        state = (
            state.join(
                contrib.withColumnRenamed("dst", "node"), "node", "left"
            )
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.coalesce("inflow", F.lit(0.0))
                    + F.col("dm") / n
                ).alias("cash"),
                (F.col("history") + F.col("cash")).alias("history"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            state = state.localCheckpoint()

    return state.select(
        "node",
        F.round("cash", 6).alias("cash"),
        F.round("history", 6).alias("history"),
        F.round(
            (F.col("history") + F.col("cash")) / (num_rounds + 1.0), 6
        ).alias("priority"),
    )


def reciprocal_hosts(
    edges: DataFrame,
    *,
    src: str = "src_host",
    dst: str = "dst_host",
    min_out: int = 1,
) -> DataFrame:
    """Link-exchange signal: per host, how much of its cross-host
    linking is RECIPROCATED — (host, n_out_hosts, n_reciprocal,
    reciprocity). Organic linking is strongly asymmetric (news sites
    link sources; sources don't link back), so a host whose outlink
    partners overwhelmingly link back is the classic link-farm /
    exchange-ring shape (TrustRank-era spam heuristic), and a crawl
    scheduler discounts its centrality before PageRank/OPIC ever see
    the edges.

    Input rows are page-level or host-level directed edges; self
    links are ignored and multi-edges collapse to the distinct host
    pair. Shape: one distinct on the (a, b) pair, one self-join of
    that deduped pair set against its own flipped form (equi-join on
    both keys — no skew beyond true host-degree skew, which salting
    in the caller's repartition handles), one map-side-combined
    groupBy. Host-pair cardinality is orders below edge cardinality,
    so the join is cheap relative to the edge scan.
    """
    pair = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    back = pair.select(
        F.col("b").alias("a"), F.col("a").alias("b"), F.lit(1).alias("_r")
    ).dropDuplicates(["a", "b"])
    marked = pair.join(back, ["a", "b"], "left")
    agg = marked.groupBy(F.col("a").alias("host")).agg(
        F.count(F.lit(1)).alias("n_out_hosts"),
        F.count("_r").alias("n_reciprocal"),
    )
    return agg.filter(F.col("n_out_hosts") >= min_out).select(
        "host",
        "n_out_hosts",
        "n_reciprocal",
        F.round(
            F.col("n_reciprocal") / F.col("n_out_hosts"), 6
        ).alias("reciprocity"),
    )
