#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with per-query seconds.

Headline workloads (per BASELINE.json metric):
  - crawl_frontier: URL-frontier scheduler throughput (scheduled +
    fetched URLs/sec) over a bench-scale pages table (64 hosts,
    politeness budget 200/host/round, 4 micro-rounds, bloom seen-
    filter, salted scheduling).
  - cluster_merge: near-dup clustering wall-time (MinHash-LSH ->
    verify -> connected components -> greedy relabel) over a
    dup-injected corpus.
  - SQL-expressible serving/agg/window/text/embedding queries from
    plans/queries.py at $SPARK_GRAFT_SF_DIR.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
Each query fully materializes via the noop sink (count() would let
Catalyst prune the interesting columns).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from news_combinator_spark.datagen import (  # noqa: E402
    pages_from_documents,
    reference_grammar_pages,
)
from news_combinator_spark.operators.clustering import cluster_documents  # noqa: E402
from news_combinator_spark.operators.frontier import crawl  # noqa: E402
from news_combinator_spark.plans import queries as Q  # noqa: E402
from news_combinator_spark.session import get_spark  # noqa: E402

BENCH_HOSTS = 256
BENCH_BUDGET = 400
BENCH_ROUNDS = 3
BENCH_SEEDS = 4096  # wide seed set so every round carries real volume
BENCH_AMPLIFY = 40  # replicate docs so the frontier is ~200k pages at sf0.1
CLUSTER_CORPUS = 10000

SQL_BENCH_QUERIES = [
    "extract_text",
    "extract_links",
    "pricing_summary",
    "top_revenue_customers",
    "order_priority",
    "running_total",
    "sessionize",
    "event_type_pivot",
    "lang_id",
    "quality_score",
    "token_count",
    "fingerprint",
    "dedup_first",
    "ngram_overlap",
    "ann_topk",
    "label_centroids",
    "front_page_ranking",
    "index_daterange",
    "group_by_day",
]


def _materialize(df):
    df.write.format("noop").mode("overwrite").save()


def bench_crawl(spark, sf_dir: str) -> tuple[float, int]:
    pages = pages_from_documents(
        spark, sf_dir, n_hosts=BENCH_HOSTS, amplify=BENCH_AMPLIFY
    )
    seeds = pages.filter(F.col("doc_id") < BENCH_SEEDS).select(
        "url", "host", "priority"
    )
    budgets = spark.createDataFrame(
        [(f"h{i}.test", BENCH_BUDGET) for i in range(BENCH_HOSTS)],
        "host string, budget int",
    )
    t0 = time.time()
    res = crawl(
        spark,
        pages,
        seeds,
        budgets,
        robots=None,
        rounds=BENCH_ROUNDS,
        allowed_host_suffix=".test",
        use_bloom=True,
        bloom_expected=2_000_000,
        salt_buckets=8,
        collect_lineage=False,
    )
    n_fetched = res.fetched.count()
    return time.time() - t0, n_fetched


def bench_cluster(spark) -> tuple[float, int, int]:
    pages = reference_grammar_pages(
        n_pages=CLUSTER_CORPUS, seed=5, dup_rate=0.3
    )
    rows = [(i, p["text"], p["host"]) for i, p in enumerate(pages)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    t0 = time.time()
    out = cluster_documents(spark, docs)
    n_clusters = out.count()
    return time.time() - t0, len(rows), n_clusters


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark(app_name="nc-bench", cores=cpus)

    per_query: dict[str, float] = {}

    crawl_sec, n_fetched = bench_crawl(spark, sf_dir)
    per_query["crawl_frontier"] = round(crawl_sec, 3)

    cluster_sec, n_docs, n_clusters = bench_cluster(spark)
    per_query["cluster_merge"] = round(cluster_sec, 3)

    registry = Q.QUERIES
    for name in SQL_BENCH_QUERIES:
        fn, _sql = registry[name]
        t0 = time.time()
        _materialize(fn(spark, sf_dir))
        per_query[name] = round(time.time() - t0, 3)

    total = sum(per_query.values())
    out = {
        "metric": "suite_wall_time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "cpus": cpus,
        "crawl_urls_fetched": n_fetched,
        "crawl_urls_per_sec": round(n_fetched / crawl_sec, 2),
        "cluster_docs": n_docs,
        "cluster_docs_per_sec": round(n_docs / cluster_sec, 2),
        "n_clusters": n_clusters,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
