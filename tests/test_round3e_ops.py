"""Semantics of the round-3 fourth-batch operators beyond the DuckDB
hash gate: phrase search over positional postings, path-prefix site
profiling, reciprocal-link detection, robots TTL refresh gate."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from news_combinator_spark.operators import indexing as ix
from news_combinator_spark.operators.frontier import stale_robots
from news_combinator_spark.operators.hoststats import path_profile
from news_combinator_spark.operators.linkgraph import reciprocal_hosts


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --------------------------------------------------------- phrase search


def test_phrase_counts_overlapping_occurrences(spark):
    docs = _docs(spark, [
        (0, "a b a b a"),       # 'a b' twice
        (1, "b a b"),           # once
        (2, "a a b b"),         # once
        (3, "b a"),             # zero (wrong order)
        (4, "a"),               # zero (no second term)
    ])
    got = {r.doc: r.n_occurrences
           for r in ix.phrase_search(docs, ["a", "b"]).collect()}
    assert got == {0: 2, 1: 1, 2: 1}


def test_phrase_three_terms_chains_joins(spark):
    docs = _docs(spark, [
        (0, "x y z x y"),       # one full run
        (1, "x y y z"),         # broken in the middle
        (2, "x y z x y z"),     # two runs
    ])
    got = {r.doc: r.n_occurrences
           for r in ix.phrase_search(docs, ["x", "y", "z"]).collect()}
    assert got == {0: 1, 2: 2}


def test_phrase_repeated_token_positions(spark):
    # 'a a a' contains 'a a' twice — the position join must not
    # collapse self-pairs
    docs = _docs(spark, [(0, "a a a")])
    got = ix.phrase_search(docs, ["a", "a"]).collect()
    assert got[0].n_occurrences == 2


def test_phrase_empty_raises(spark):
    docs = _docs(spark, [(0, "a")])
    with pytest.raises(ValueError):
        ix.phrase_search(docs, [])


# ----------------------------------------------------------- path profile


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_path_profile_prefix_rollup(spark):
    pages = _pages(spark, [
        ("http://h.test/a/x/1.htm", "t1"),
        ("http://h.test/a/x/2.htm", "t2"),
        ("http://h.test/a/y/3.htm", "t1"),
        ("http://h.test/b/4.htm", "t3"),
    ])
    out = {(r.prefix, r.depth): r for r in path_profile(pages).collect()}
    a = out[("/a/", 1)]
    assert a.n_pages == 3 and a.n_distinct_fp == 2
    assert out[("/a/x/", 2)].n_pages == 2
    assert out[("/a/y/", 2)].n_pages == 1
    assert out[("/b/", 1)].n_pages == 1
    assert a.total_bytes == 6  # 't1'+'t2'+'t1'


def test_path_profile_root_and_query_urls(spark):
    # root path contributes no prefixes; query strings are cut before
    # segmentation
    pages = _pages(spark, [
        ("http://h.test/", "root"),
        ("http://h.test/a/1.htm?page=2", "q"),
    ])
    out = {(r.prefix, r.depth) for r in path_profile(pages).collect()}
    assert out == {("/a/", 1)}


def test_path_profile_depth_cap(spark):
    pages = _pages(spark, [("http://h.test/a/b/c/d/e/f.htm", "x")])
    got = sorted(r.prefix for r in path_profile(pages, max_depth=3).collect())
    assert got == ["/a/", "/a/b/", "/a/b/c/"]


# ------------------------------------------------------- reciprocal hosts


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src_host string, dst_host string")


def test_reciprocity_ratio_and_self_loop_ignored(spark):
    edges = _edges(spark, [
        ("farm.test", "partner.test"),
        ("partner.test", "farm.test"),   # reciprocated
        ("farm.test", "victim.test"),    # one-way
        ("farm.test", "farm.test"),      # self loop, dropped
        ("farm.test", "partner.test"),   # multi-edge, collapsed
    ])
    out = {r.host: r for r in reciprocal_hosts(edges).collect()}
    f = out["farm.test"]
    assert f.n_out_hosts == 2 and f.n_reciprocal == 1
    assert abs(f.reciprocity - 0.5) < 1e-9
    assert out["partner.test"].reciprocity == 1.0
    assert "victim.test" not in out  # no out-links -> no row


def test_reciprocity_min_out_filter(spark):
    edges = _edges(spark, [("a.test", "b.test"), ("b.test", "a.test")])
    assert reciprocal_hosts(edges, min_out=2).count() == 0


# ----------------------------------------------------------- stale robots


def _ts(h):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)


def test_stale_robots_reasons_and_freshness(spark):
    log = spark.createDataFrame(
        [("h0", _ts(0)), ("h0", _ts(2)), ("h1", _ts(20))],
        "host string, fetched_ts timestamp",
    )
    sched = spark.createDataFrame(
        [("h0",), ("h1",), ("h2",)], "host string"
    )
    out = {r.host: r for r in stale_robots(
        log, sched, "2024-01-02 00:00:00", ttl_hours=12.0
    ).collect()}
    # h0 newest fetch is 2:00 -> 22h old -> expired (max wins, not min)
    assert out["h0"].reason == "expired"
    assert abs(out["h0"].robots_age_hours - 22.0) < 1e-6
    # h1 fetched 20:00 -> 4h old -> fresh, absent
    assert "h1" not in out
    # h2 never in the log
    assert out["h2"].reason == "never_fetched"
    assert out["h2"].robots_age_hours is None


def test_stale_robots_only_scheduled_hosts(spark):
    log = spark.createDataFrame(
        [("h9", _ts(0))], "host string, fetched_ts timestamp"
    )
    sched = spark.createDataFrame([("h0",)], "host string")
    out = stale_robots(log, sched, "2024-01-02 00:00:00").collect()
    assert [r.host for r in out] == ["h0"]  # h9 not scheduled -> ignored


# ------------------------------------------------- RFC 9309 wildcards


def _rules(spark, rows):
    return spark.createDataFrame(
        rows, "host string, path_prefix string, allow boolean"
    )


def _cand(spark, paths, host="h.test"):
    return spark.createDataFrame(
        [(f"http://{host}{p}", host, 0) for p in paths],
        "url string, host string, priority int",
    )


def _kept(spark, rules, paths):
    from news_combinator_spark.operators.frontier import (
        apply_robots_rfc9309,
    )

    out = apply_robots_rfc9309(_cand(spark, paths), _rules(spark, rules))
    return {r.url.split(".test", 1)[1] for r in out.collect()}


def test_wildcard_star_matches_any_sequence(spark):
    rules = [("h.test", "/*.php", False)]
    kept = _kept(spark, rules, ["/a.php", "/x/y.php", "/a.phpx", "/a.html"])
    # '*.php' is a prefix rule (no $): /a.phpx matches too
    assert kept == {"/a.html"}


def test_dollar_anchors_end(spark):
    rules = [("h.test", "/*.php$", False)]
    kept = _kept(spark, rules, ["/a.php", "/a.phpx", "/a.php/more"])
    assert kept == {"/a.phpx", "/a.php/more"}


def test_dot_is_literal_not_regex(spark):
    # a naive translation would let '.' match any char
    rules = [("h.test", "/a.htm", False)]
    kept = _kept(spark, rules, ["/a.htm", "/axhtm"])
    assert kept == {"/axhtm"}


def test_mid_rule_dollar_is_literal(spark):
    rules = [("h.test", "/p$q", False)]
    kept = _kept(spark, rules, ["/p$q/x", "/pq/x"])
    assert kept == {"/pq/x"}


def test_longest_octets_governs_allow_wins_ties(spark):
    rules = [
        ("h.test", "/dir/*", False),        # 6 octets
        ("h.test", "/dir/open*", True),     # 10 octets -> wins under it
    ]
    kept = _kept(spark, rules, ["/dir/x", "/dir/open1", "/other"])
    assert kept == {"/dir/open1", "/other"}


def test_wildcard_rule_invisible_to_prefix_gate(spark):
    # the motivating gap: the exact-prefix evaluator treats '*' as a
    # literal and never matches, silently allowing what the wildcard
    # rule blocks
    from news_combinator_spark.operators.frontier import (
        apply_robots_longest_match,
    )

    rules = _rules(spark, [("h.test", "/*.php", False)])
    cand = _cand(spark, ["/a.php"])
    assert apply_robots_longest_match(cand, rules).count() == 1  # leaks
    from news_combinator_spark.operators.frontier import (
        apply_robots_rfc9309,
    )
    assert apply_robots_rfc9309(cand, rules).count() == 0  # blocked
