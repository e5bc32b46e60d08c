"""PageRank operator parity vs a dense numpy power iteration."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from news_combinator_spark.operators.linkgraph import host_rank, page_rank

# Hand-built digraph exercising every structural case the operator
# claims to handle: a multi-edge (0->1 twice), a dangling node (4 has
# no out-links), a node that is dst-only (4), and asymmetric in-degree.
EDGES = [
    (0, 1), (0, 1), (0, 2),
    (1, 2),
    (2, 0), (2, 3),
    (3, 4),
]
N = 5


def _numpy_pagerank(edges, n, iters, alpha, redistribute=True):
    ranks = np.full(n, 1.0 / n)
    out_deg = np.zeros(n)
    for s, _d in edges:
        out_deg[s] += 1
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, d in edges:
            contrib[d] += ranks[s] / out_deg[s]
        dm = ranks[out_deg == 0].sum() if redistribute else 0.0
        ranks = (1 - alpha) / n + alpha * (contrib + dm / n)
    return ranks


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src int, dst int")


def test_pagerank_matches_numpy(spark, edges_df):
    got = {
        r.node: r.rank
        for r in page_rank(edges_df, num_iters=8, alpha=0.85).collect()
    }
    exp = _numpy_pagerank(EDGES, N, 8, 0.85)
    assert set(got) == set(range(N))
    for v in range(N):
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    # redistribute keeps total mass == 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_pagerank_ignore_dangling_decays(spark, edges_df):
    got = {
        r.node: r.rank
        for r in page_rank(
            edges_df, num_iters=8, alpha=0.85, dangling="ignore"
        ).collect()
    }
    exp = _numpy_pagerank(EDGES, N, 8, 0.85, redistribute=False)
    for v in range(N):
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    assert sum(got.values()) < 1.0  # node 4's mass leaks each round


def test_pagerank_multi_edge_counts_with_multiplicity(spark):
    # 0 links twice to 1 and once to 2: 1 must get 2/3 of 0's share
    df = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 2), (1, 0), (2, 0)], "src int, dst int"
    )
    got = {r.node: r.rank for r in page_rank(df, num_iters=1, alpha=1.0).collect()}
    assert got[1] == pytest.approx(2 / 3 * (1 / 3), abs=1e-12)
    assert got[2] == pytest.approx(1 / 3 * (1 / 3), abs=1e-12)


def test_pagerank_checkpointed_equals_uncheckpointed(spark, edges_df):
    a = page_rank(edges_df, num_iters=6, checkpoint_every=2).collect()
    b = page_rank(edges_df, num_iters=6).collect()
    assert {r.node: round(r.rank, 12) for r in a} == {
        r.node: round(r.rank, 12) for r in b
    }


def test_host_rank_aggregates_by_host(spark):
    pages = spark.createDataFrame(
        [("http://a.test/1",), ("http://a.test/2",), ("http://b.test/1",)],
        "url string",
    )
    ranks = spark.createDataFrame(
        [("http://a.test/1", 0.5), ("http://a.test/2", 0.3),
         ("http://b.test/1", 0.2)],
        "node string, rank double",
    )
    got = {r.host: r for r in host_rank(pages, ranks).collect()}
    assert got["a.test"].total_rank == pytest.approx(0.8)
    assert got["a.test"].n_pages == 2
    assert got["b.test"].mean_rank == pytest.approx(0.2)


def test_pagerank_validates_dangling_mode(spark, edges_df):
    with pytest.raises(ValueError):
        page_rank(edges_df, dangling="drop")


def test_anchor_text_profile(spark):
    """Multiplicity kept in n_refs, hosts distinct in n_src_hosts,
    anchors sorted-distinct; non-anchor markup ignored."""
    from news_combinator_spark.operators.linkgraph import (
        anchor_text_profile,
    )

    pages = spark.createDataFrame(
        [
            ("http://a.test/1", "a.test",
             '<p>x</p><a href="http://t.test/x">one</a>'
             '<a href="http://t.test/x">two</a>'),
            ("http://a.test/2", "a.test",
             '<a href="http://t.test/x">one</a>'
             '<a href="http://t.test/y">why</a>'),
            ("http://b.test/1", "b.test",
             '<a href="http://t.test/x">zed</a><img src="/i.jpg"/>'),
        ],
        "url string, host string, html_str string",
    )
    got = {
        r.dst: (r.n_refs, r.n_src_hosts, r.anchors)
        for r in anchor_text_profile(pages).collect()
    }
    assert got == {
        "http://t.test/x": (4, 2, "one|two|zed"),
        "http://t.test/y": (1, 1, "why"),
    }
