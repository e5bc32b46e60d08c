"""Physical-plan audits: the properties that make these queries hold up
at 100 TB, asserted from `explain` output so regressions are caught.

What is pinned and why it matters at scale:
- predicate pushdown + column pruning reach the parquet scan (a scan
  that reads every column for a 2-column projection is wrong at any
  scale, fatal at 100 TB);
- partition-count-sized dims are broadcast, not shuffled;
- the hot relational path runs inside WholeStageCodegen (JVM, no
  Python in the loop);
- the frontier's fetch join never re-shuffles or re-sorts the big
  (pre-partitioned, persisted) web side, and never builds a driver-side
  broadcast of the scheduled batch.
"""

import re

import pytest
from pyspark.sql import functions as F

from news_combinator_spark.plans import queries as Q

from conftest import SF_MED


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _simple(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


# ---------------------------------------------------------------------------
# Parquet scan: pushdown + pruning
# ---------------------------------------------------------------------------

def test_filter_pushed_to_parquet_scan(spark):
    """A doc_id predicate must reach the lineitem/documents scan as
    PushedFilters, not execute post-scan only."""
    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    plan = _formatted(docs.filter(F.col("doc_id") < 50).select("doc_id", "source"))
    assert re.search(r"PushedFilters: \[.*LessThan\(doc_id,50\).*\]", plan), plan


def test_column_pruning_reaches_scan(spark):
    """Selecting 2 columns from documents must not read text/title."""
    docs = spark.read.parquet(f"{SF_MED}/documents.parquet")
    plan = _formatted(docs.select("doc_id", "source"))
    m = re.search(r"ReadSchema: (struct<[^\n]*>)", plan)
    assert m, plan
    schema = m.group(1)
    assert "doc_id" in schema and "source" in schema
    assert "text" not in schema and "title" not in schema, schema


def test_serving_daterange_pushdown(spark):
    """index query's day cutoff derives from ts; the ts scan must prune
    to just the needed columns (ts, value)."""
    plan = _formatted(Q.q_index_daterange(spark, SF_MED))
    m = re.search(r"ReadSchema: (struct<[^\n]*>)", plan)
    assert m and "ts" in m.group(1) and "value" in m.group(1)
    assert "event_type" not in m.group(1), m.group(1)


# ---------------------------------------------------------------------------
# Joins: broadcast where small, no needless exchanges
# ---------------------------------------------------------------------------

def test_small_dim_joins_broadcast(spark):
    """customer (25k rows at sf0.01) must broadcast against lineitem,
    not trigger a shuffle of the fact table for the dim join."""
    plan = _simple(Q.q_top_revenue_customers(spark, SF_MED))
    assert "BroadcastHashJoin" in plan, plan


def test_frontier_fetch_join_no_resort_of_web(spark):
    """The per-round fetch is a shuffle-hash join against the
    pre-partitioned persisted web: no SortMergeJoin (which would sort
    the 10^10-row side every round) and no BroadcastExchange of it."""
    from news_combinator_spark.datagen import (
        budgets_df,
        pages_from_documents,
        seeds_df,
    )
    from news_combinator_spark.operators.frontier import schedule_per_host

    pages = pages_from_documents(spark, SF_MED)
    web = pages.select("url", "host", "priority", "html").repartition(8, "url")
    web = web.persist()
    web.count()
    taken = (
        schedule_per_host(seeds_df(spark, pages), budgets_df(spark))
        .filter("taken")
        .drop("taken")
        .withColumnRenamed("host", "t_host")
        .withColumnRenamed("priority", "t_priority")
    )
    fetch = taken.hint("shuffle_hash").join(web, "url", "inner")
    plan = _simple(fetch)
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    web.unpersist()


def test_robots_gating_is_broadcast(spark):
    """robots rules are a tiny table: the gating join must broadcast
    them, never shuffle the candidate set on the rule key."""
    from news_combinator_spark.datagen import pages_from_documents, robots_df
    from news_combinator_spark.operators.frontier import apply_robots

    pages = pages_from_documents(spark, SF_MED)
    cand = pages.select("url", "host", "priority")
    plan = _simple(apply_robots(cand, robots_df(spark)))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


# ---------------------------------------------------------------------------
# Codegen: relational hot path stays in the JVM
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "qname",
    ["pricing_summary", "sessionize", "front_page_ranking", "dedup_first"],
)
def test_hot_queries_whole_stage_codegen(spark, qname):
    # AQE hides codegen subtrees behind AdaptiveSparkPlan until runtime;
    # flip it off just for the audit so the fused spans are visible.
    fn, _sql = Q.QUERIES[qname]
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = fn(spark, SF_MED)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "codegen"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    m = re.match(r"Found (\d+) WholeStageCodegen subtrees", plan)
    assert m and int(m.group(1)) >= 1, plan.split("\n")[0]


@pytest.mark.parametrize(
    "qname",
    [
        "pricing_summary",
        "lang_id",
        "quality_score",
        "repetition_score",
        "dedup_first",
        "pii_scrub",
        "decontaminate",
        "lm_nll",
    ],
)
def test_no_python_udf_in_jvm_expressible_queries(spark, qname):
    """These are fully expressible with built-ins; a BatchEvalPython /
    ArrowEvalPython node appearing means someone dropped to the slow
    path needlessly."""
    fn, _sql = Q.QUERIES[qname]
    plan = _simple(fn(spark, SF_MED))
    assert "EvalPython" not in plan, plan


# ---------------------------------------------------------------------------
# No data-sized single-partition stages (the 100x-scale killer class)
# ---------------------------------------------------------------------------

# An Exchange SinglePartition is legitimate only when its input is
# cardinality-bounded: beneath an aggregate (group-count rows), or a
# limit / parallel top-k (TakeOrderedAndProject). A single-partition
# exchange over raw data — the old bare Window.orderBy pattern — is a
# guaranteed OOM / single-task stall at web scale.
_BOUNDED_MARKERS = (
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "TakeOrderedAndProject",
    "CollectLimit",
    "GlobalLimit",
    "LocalLimit",
)


def _node_depth(line: str) -> int:
    m = re.search(r"[+:]-", line)
    return m.start() if m else -1


def single_partition_violations(plan: str) -> list[str]:
    """Exchange SinglePartition nodes whose subtree holds no aggregate
    or limit — i.e. single-partition stages over unbounded data."""
    lines = plan.splitlines()
    viols = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        d = _node_depth(ln)
        subtree = []
        for nxt in lines[i + 1:]:
            if _node_depth(nxt) <= d:
                break
            subtree.append(nxt)
        if not any(m in s for s in subtree for m in _BOUNDED_MARKERS):
            viols.append(ln.strip())
    return viols


# every lazily-built battery query (the crawl/cluster loops execute
# eagerly at build time and are audited separately)
_LAZY_QUERIES = [
    "extract_text", "extract_links", "extract_markers", "url_parse",
    "index_daterange", "front_page_ranking", "entry_lookup",
    "comments_sort", "group_by_day", "pricing_summary",
    "top_revenue_customers", "order_priority", "running_total",
    "sessionize", "event_type_pivot", "distinct_users", "lang_id",
    "quality_score", "token_count", "fingerprint", "dedup_stats",
    "dedup_first", "ngram_overlap", "summarize", "merge_upsert",
    "pos_tags", "repetition_score", "sentence_dedup", "ann_topk",
    "label_centroids", "minhash_near_dups", "simhash_near_dups",
    "embedding_near_dups", "ivf_ann", "multimodal_features",
    "audio_features", "video_features", "pii_scrub",
    "decontaminate", "corpus_stats", "filter_funnel",
    "lm_nll", "v1_cross_source_clusters", "duplicated_spans",
    "dup_span_stats", "pack_sequences",
    # round-2 additions (link_rank excluded: page_rank iterates
    # eagerly via localCheckpoint, audited in test_linkgraph)
    "hot_hosts", "snapshot_asof", "domain_mix", "robots_rules",
    "crawl_diff", "crawl_delay_budgets", "host_quality_filter",
    "sitemap_urls", "token_budget_mix",
    "fetch_retries", "redirect_resolution", "anchor_texts",
    "warc_records", "recrawl_priority", "robots_sitemaps",
    "conditional_fetch", "boilerplate_removal", "gopher_rules",
    "priority_boosts", "global_cap", "url_templates",
    "robots_longest_match", "soft404_filter", "mojibake_repair",
    "adaptive_budgets", "canonical_consolidate", "registered_domains",
    "normalize_text", "admission_funnel", "politeness_composition",
    "content_sniff", "pq_ann", "request_rate_budgets",
    "meta_robots_gate", "hreflang_alternates", "sitemap_index",
    "etag_gate", "wet_export", "shard_manifest", "ip_politeness",
    "mirror_hosts", "parallel_corpus",
    # round-3 additions
    "delta_admit", "trap_hosts", "host_reputation",
    "ngram_counts", "wat_export", "frontier_merge",
    "inverted_index", "term_search", "shard_rendezvous",
    "freshness_revisit", "alpha_mix", "dsir_select", "cdx_export",
    "discovery_yield",
    "bm25_search", "hits_rank", "opic_priority", "param_significance",
    "phrase_search", "path_profile", "reciprocal_hosts", "stale_robots",
    "containment_pairs", "host_clusters", "drain_forecast",
    "pii_scrub",
    "robots_wildcards",
    "adaptive_length",
    "content_drift",
    "index_delta_merge",
]


# queries whose build is EAGER (loops with localCheckpoint, scalar
# collects the docstrings justify) — audited by their own tests, not
# the lazy-plan parametrization above
_EAGER_AUDITED_ELSEWHERE = {
    # crawl loop: test_frontier_fetch_order_no_global_window
    "crawl_frontier", "crawl_frontier_cuckoo", "crawl_host_lineage",
    "crawl_seen_set",
    # CC / greedy iteration loops: test_clustering / test_linkgraph
    # (canonical_best = near_dup_groups' CC + one lazy argmax groupBy)
    "news_clusters_lsh", "near_dup_groups", "link_rank",
    "canonical_best",
}


def test_every_registered_query_is_plan_audited():
    """Drift guard: a new queries.py entry must either join
    _LAZY_QUERIES (and get the single-partition audit) or be listed
    as eager-audited-elsewhere — it cannot silently skip plan
    review."""
    covered = set(_LAZY_QUERIES) | _EAGER_AUDITED_ELSEWHERE
    missing = sorted(set(Q.QUERIES) - covered)
    assert not missing, f"queries with no plan audit: {missing}"
    unknown = sorted(set(_LAZY_QUERIES) - set(Q.QUERIES))
    assert not unknown, f"_LAZY_QUERIES entries not registered: {unknown}"


@pytest.mark.parametrize("qname", _LAZY_QUERIES)
def test_no_unbounded_single_partition_exchange(spark, qname):
    fn, _sql = Q.QUERIES[qname]
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _simple(fn(spark, SF_MED))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    viols = single_partition_violations(plan)
    assert not viols, f"unbounded single-partition stages: {viols}\n{plan}"


def test_frontier_fetch_order_no_global_window(spark):
    """The flagship crawl output plan must not coalesce the fetched
    table into one partition for fetch_order (the round-1 scale
    killer): the only single-partition frame allowed is the
    rounds x priorities x hosts offsets aggregate."""
    from news_combinator_spark.datagen import (
        budgets_df,
        pages_from_documents,
        seeds_df,
    )
    from news_combinator_spark.operators.frontier import crawl

    from conftest import SF_SMALL

    pages = pages_from_documents(spark, SF_SMALL)
    res = crawl(
        spark, pages, seeds_df(spark, pages), budgets_df(spark),
        rounds=2, collect_lineage=False,
    )
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _simple(res.fetched)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    viols = single_partition_violations(plan)
    assert not viols, f"unbounded single-partition stages: {viols}\n{plan}"


def test_partial_aggregation_before_shuffle(spark):
    """groupBy must map-side combine (two HashAggregate levels around
    the exchange), or the shuffle carries every input row at 100 TB."""
    plan = _formatted(Q.q_pricing_summary(spark, SF_MED))
    assert plan.count("HashAggregate") >= 2, plan
    assert "partial_" in plan.lower() or "Partial" in plan, plan


# ---------------------------------------------------------------------------
# Bucketed layout: the big side of the fetch join must not re-shuffle
# ---------------------------------------------------------------------------

def test_bucketed_fetch_join_shuffles_probe_side_only(spark, tmp_path):
    """With web_meta stored bucketed+sorted by url, the per-round fetch
    join must read the page store Exchange-free — and, with one file
    per bucket plus the bucketed-scan output-ordering conf, Sort-free:
    only the scheduled-batch probe side shuffles and sorts. Against
    plain parquet the same join exchanges BOTH sides — the contrast is
    the whole point of persisting the layout in the table instead of a
    session cache."""
    from news_combinator_spark.datagen import pages_from_documents
    from news_combinator_spark.operators.bucketing import (
        colocated_join,
        write_bucketed,
    )

    pages = pages_from_documents(spark, SF_MED).select(
        "url", "host", "priority"
    )
    spark.sql("DROP TABLE IF EXISTS web_meta_bucketed")
    # one writer task -> one file per bucket, so the sortBy order is a
    # table-level guarantee the scan may expose as its output ordering
    write_bucketed(
        pages.repartition(1), "web_meta_bucketed", "url", 8,
        path=str(tmp_path / "web_meta_bucketed"),
    )
    probe = pages.select("url")
    ordering_conf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set(ordering_conf, "true")
    try:
        plan = _formatted(colocated_join(spark, "web_meta_bucketed", probe))
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
        # formatted mode puts the node header and its hashpartitioning
        # arguments on separate lines; count argument occurrences
        n_exchanges = len(re.findall(r"hashpartitioning\(", plan))
        assert n_exchanges == 1, f"expected probe-side-only exchange:\n{plan}"
        assert len(re.findall(r"\(\d+\) Sort\b", plan)) == 1, plan

        baseline = _formatted(probe.hint("merge").join(pages, "url"))
        assert len(re.findall(r"hashpartitioning\(", baseline)) == 2, baseline
    finally:
        spark.conf.unset(ordering_conf)
        spark.sql("DROP TABLE IF EXISTS web_meta_bucketed")


def test_fetch_retry_ladder_is_shuffle_free(spark):
    """The retry ladder is per-row arithmetic over a union of filters —
    at 10^10 URLs any Exchange here would be pure waste. Pin: zero
    Exchange nodes in the whole plan."""
    plan = _simple(Q.q_fetch_retries(spark, SF_MED))
    assert "Exchange" not in plan, plan


def test_recrawl_priority_window_is_partitioned(spark):
    """The change-rate lag window must partition by url — an
    unpartitioned frame would coalesce the whole observation history
    into one task."""
    plan = _formatted(Q.q_recrawl_priority(spark, SF_MED))
    for m in re.finditer(r"Arguments: \[[^\]]*windowspecdefinition\(([^,]*),", plan):
        assert "url" in m.group(1), plan


def test_bench_battery_covers_all_oracle_queries():
    """Drift guard for bench.py: every dual-expressed (oracle) query
    must be in the SQL bench battery or the phase-benchmarked set, so
    a new query can't silently skip per-round timing."""
    import bench

    battery = set(bench.SQL_BENCH_QUERIES)
    assert battery <= set(Q.QUERIES), sorted(battery - set(Q.QUERIES))
    phase_benched = {
        "crawl_frontier", "crawl_seen_set",  # bench_crawl
        "crawl_frontier_cuckoo",  # same loop, cuckoo prefilter
        "crawl_host_lineage",     # same loop + per-host audit frames
        "news_clusters_lsh", "v1_cross_source_clusters",  # bench_cluster
        "url_parse",  # sub-second scalar pass, folded into extract
        "minhash_near_dups", "simhash_near_dups", "duplicated_spans",
        "dedup_stats", "distinct_users", "multimodal_features",
        "ivf_ann",  # recall-gated in pytest; brute-force phase benched
    }
    dual = {n for n, (_f, s) in Q.QUERIES.items() if s is not None}
    missing = sorted(dual - battery - phase_benched)
    assert not missing, f"oracle queries not benched: {missing}"


def test_mirror_hosts_size_frames_not_forced_broadcast(spark):
    """The per-host fingerprint-count frames joined back onto the
    mirror pair aggregate must NOT carry a forced broadcast hint:
    host cardinality is 10^7-10^8 at web scale, so the plan (AQE off,
    so hints are the only broadcast source) must contain no
    BroadcastHashJoin — AQE may still choose one at runtime when the
    frames turn out small (VERDICT r2 finding #2)."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # below the autoBroadcast threshold everything COULD broadcast;
    # disable it so only explicit hints would surface
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _simple(Q.q_mirror_hosts(spark, SF_MED))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "BroadcastHashJoin" not in plan, plan
