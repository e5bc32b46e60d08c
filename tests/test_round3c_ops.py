"""Semantics of the round-3 second-batch operators beyond the DuckDB
hash gate: inverted index + conjunctive search, rendezvous resharding
stability, renewal-corrected revisit scheduling, alpha mixture
shares."""

import math

import pyspark.sql.functions as F
import pytest

from news_combinator_spark.operators import indexing as ix
from news_combinator_spark.operators.bucketing import (
    rendezvous_shard,
    reshard_moves,
)
from news_combinator_spark.operators.sampling import alpha_mix_shares
from news_combinator_spark.operators.snapshots import freshness_revisit

from conftest import SF_MED


@pytest.fixture(scope="module")
def docs200(spark):
    return (
        spark.read.parquet(f"{SF_MED}/documents.parquet")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
        .cache()
    )


# ------------------------------------------------------------- indexing


def test_postings_match_python_counter(spark, docs200):
    """df / tf / posting list agree with a driver-side recount."""
    rows = docs200.collect()
    want: dict[str, dict[int, int]] = {}
    for r in rows:
        for t in r.text.strip().lower().split():
            want.setdefault(t, {}).setdefault(r.doc_id, 0)
            want[t][r.doc_id] += 1
    got = {
        r.term: r
        for r in ix.term_postings(docs200, min_df=1).collect()
    }
    assert set(got) == set(want)
    for t, per_doc in want.items():
        assert got[t].n_docs == len(per_doc)
        assert got[t].total_tf == sum(per_doc.values())
        assert got[t].postings == ",".join(
            str(d) for d in sorted(per_doc)
        )


def test_postings_max_df_drops_stopwords(spark, docs200):
    full = ix.term_postings(docs200, min_df=1)
    capped = ix.term_postings(docs200, min_df=1, max_df=50)
    kept = {r.term for r in capped.collect()}
    for r in full.collect():
        assert (r.term in kept) == (r.n_docs <= 50)


def test_conjunctive_search_equals_set_intersection(spark, docs200):
    terms = ["vector", "stream", "window"]
    rows = docs200.collect()
    want = {
        r.doc_id: sum(
            r.text.strip().lower().split().count(t) for t in terms
        )
        for r in rows
        if all(t in r.text.lower().split() for t in terms)
    }
    got = {
        r.doc: r.score
        for r in ix.conjunctive_search(docs200, terms).collect()
    }
    assert got == want


def test_conjunctive_search_empty_on_absent_term(spark, docs200):
    out = ix.conjunctive_search(docs200, ["vector", "zz_not_a_word"])
    assert out.count() == 0


# ----------------------------------------------------------- rendezvous


def test_rendezvous_matches_stdlib_md5(spark):
    """The placement is reproducible from four lines of stdlib — the
    cross-language routing contract."""
    import hashlib

    urls = [f"http://h{i}.test/a/{i}.htm" for i in range(64)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r.url: r.s
        for r in df.select(
            "url", rendezvous_shard("url", 12).alias("s")
        ).collect()
    }
    for u in urls:
        want = max(
            range(12),
            key=lambda s: hashlib.md5(f"{u}:{s}".encode()).hexdigest(),
        )
        assert got[u] == want


def test_reshard_moves_bounded_and_stable(spark):
    """Grown fleet 16 -> 20: every unmoved key keeps its exact shard,
    moved keys all land on a NEW shard (HRW property: a key moves only
    when a new shard wins), and the moved fraction sits near the
    theoretical (20-16)/20 = 0.2."""
    df = spark.range(4000).select(
        F.concat(F.lit("http://x.test/"), F.col("id")).alias("url")
    )
    rows = reshard_moves(df, "url", 16, 20).collect()
    moved = [r for r in rows if r.moved]
    for r in rows:
        if not r.moved:
            assert r.shard_old == r.shard_new
        else:
            assert r.shard_new >= 16  # only a NEW shard can steal
    frac = len(moved) / len(rows)
    assert 0.15 < frac < 0.25, frac


def test_prefix_resharding_moves_far_more(spark):
    """The contrast that motivates HRW: modulo/prefix resharding
    16 -> 20 remaps the large majority of keys; HRW moves ~20%."""
    df = spark.range(4000).select(
        F.concat(F.lit("http://x.test/"), F.col("id")).alias("url")
    )
    prefix_moved = (
        df.select(
            (
                (F.abs(F.xxhash64("url")) % 16)
                != (F.abs(F.xxhash64("url")) % 20)
            ).alias("m")
        )
        .agg(F.avg(F.col("m").cast("double")))
        .collect()[0][0]
    )
    hrw_moved = (
        reshard_moves(df, "url", 16, 20)
        .agg(F.avg(F.col("moved").cast("double")))
        .collect()[0][0]
    )
    assert prefix_moved > 0.7
    assert hrw_moved < 0.25


# ------------------------------------------------------------ freshness


def _obs(spark, rows):
    return spark.createDataFrame(
        rows, "url string, snap_ts timestamp, fingerprint string"
    )


def test_freshness_estimator_values(spark):
    """n=4 transitions, X=2 changes over a 4-day span (1-day gaps):
    lambda = -ln((4-2+.5)/(4+.5)) / 1.0; revisit = 1/lambda."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u", t0 + dt.timedelta(days=i), fp)
        for i, fp in enumerate(["a", "a", "b", "b", "c"])
    ]
    out = freshness_revisit(_obs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    lam = -math.log((4 - 2 + 0.5) / (4 + 0.5))
    assert r.n_trans == 4 and r.n_changes == 2
    assert abs(r.lambda_hat - round(lam, 6)) < 1e-9
    assert abs(r.revisit_days - round(1 / lam, 4)) < 1e-6


def test_freshness_never_changing_hits_max_clamp(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u", t0 + dt.timedelta(days=i), "same") for i in range(5)
    ]
    r = freshness_revisit(_obs(spark, rows), max_days=90.0).collect()[0]
    assert r.n_changes == 0
    assert r.revisit_days == 90.0  # +0.5 prior keeps lambda finite


def test_freshness_fast_changer_hits_min_clamp(spark):
    """Changes every observation at 6-hour gaps -> revisit clamps to
    min_days."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u", t0 + dt.timedelta(hours=6 * i), f"v{i}") for i in range(9)
    ]
    r = freshness_revisit(_obs(spark, rows), min_days=1.0).collect()[0]
    assert r.n_changes == 8
    assert r.revisit_days == 1.0


def test_freshness_single_observation_excluded(spark):
    import datetime as dt

    rows = [("u", dt.datetime(2024, 1, 1), "a")]
    assert freshness_revisit(_obs(spark, rows)).count() == 0


# ------------------------------------------------------------ alpha mix


def test_alpha_mix_shares_sum_to_one_and_order(spark):
    df = spark.createDataFrame(
        [("a", 1000), ("b", 100), ("c", 10)], "g string, tok long"
    )
    rows = {r.g: r for r in alpha_mix_shares(df, "g", "tok", 0.5).collect()}
    assert abs(sum(r.share for r in rows.values()) - 1.0) < 1e-5
    # sqrt scaling compresses the range: head downweighted, tail up
    assert rows["a"].share / rows["c"].share == pytest.approx(
        math.sqrt(100), rel=1e-3
    )
    assert rows["a"].epochs < 1.0 < rows["c"].epochs


def test_alpha_one_is_natural_distribution(spark):
    df = spark.createDataFrame(
        [("a", 300), ("b", 100)], "g string, tok long"
    )
    rows = {r.g: r for r in alpha_mix_shares(df, "g", "tok", 1.0).collect()}
    assert rows["a"].share == pytest.approx(0.75, abs=1e-6)
    assert rows["a"].epochs == pytest.approx(1.0, abs=1e-6)
    assert rows["b"].epochs == pytest.approx(1.0, abs=1e-6)


# ------------------------------------------------------------- cdx/surt


def test_surt_and_cdx_line_shape(spark):
    from news_combinator_spark.functions.warc import cdx_records
    import datetime as dt

    df = spark.createDataFrame(
        [
            (
                "http://news.sub.example.co/a/1.htm",
                "news.sub.example.co",
                "hello world",
                dt.datetime(2024, 3, 5, 12, 34, 56),
            ),
            ("http://h1.test", "h1.test", None, dt.datetime(2024, 1, 1)),
        ],
        "url string, host string, text string, warc_ts timestamp",
    )
    rows = {r.host: r for r in cdx_records(df).collect()}
    assert rows["news.sub.example.co"].surt == (
        "co,example,sub,news)/a/1.htm"
    )
    # pathless url -> '/' (the RFC empty-path == '/' rule)
    assert rows["h1.test"].surt == "test,h1)/"
    assert rows["news.sub.example.co"].cdx_ts == "20240305123456"
    line = rows["news.sub.example.co"].cdx_line
    import hashlib

    want_digest = hashlib.md5(b"hello world").hexdigest()
    assert line == (
        "co,example,sub,news)/a/1.htm 20240305123456 "
        '{"url":"http://news.sub.example.co/a/1.htm",'
        f'"digest":"md5:{want_digest}","length":11}}'
    )
    # null text -> empty-string digest and length 0
    assert '"length":0' in rows["h1.test"].cdx_line


def test_surt_orders_host_subtree_contiguously(spark):
    """The point of SURT: every capture of a registered domain sorts
    into one contiguous range."""
    from news_combinator_spark.functions.warc import cdx_records
    import datetime as dt

    rows = [
        (f"http://{h}/p", h, "t", dt.datetime(2024, 1, 1))
        for h in [
            "a.example.com", "b.example.com", "example.com",
            "aexample.com", "zz.org",
        ]
    ]
    df = spark.createDataFrame(
        rows, "url string, host string, text string, warc_ts timestamp"
    )
    surts = sorted(r.surt for r in cdx_records(df).collect())
    com_example = [s for s in surts if s.startswith("com,example")]
    lo = surts.index(com_example[0])
    assert surts[lo : lo + len(com_example)] == com_example
    assert len(com_example) == 3  # aexample.com is NOT in the range


# ------------------------------------------------------- discovery yield


def test_discovery_yield_counts_only_unfetched(spark):
    from news_combinator_spark.operators.hoststats import discovery_yield

    pages = spark.createDataFrame(
        [
            ("http://a.test/1", "a.test"),
            ("http://a.test/2", "a.test"),
            ("http://b.test/1", "b.test"),
        ],
        "url string, host string",
    )
    links = spark.createDataFrame(
        [
            ("a.test", "http://a.test/2"),      # fetched -> not new
            ("a.test", "http://a.test/new"),    # new, onsite
            ("a.test", "http://c.test/x"),      # new, offsite
            ("a.test", "http://c.test/x"),      # duplicate proposal
            ("b.test", "http://b.test/1"),      # fetched -> not new
        ],
        "host string, link string",
    )
    rows = {r.host: r for r in discovery_yield(pages, links).collect()}
    a = rows["a.test"]
    assert a.n_pages == 2 and a.n_new_links == 2
    assert a.offsite_frac == 0.5
    assert a.discovery_yield == 1.0
    b = rows["b.test"]
    assert b.n_new_links == 0 and b.discovery_yield == 0.0


def test_conjunctive_search_duplicate_terms_collapse(spark, docs200):
    # a conjunction of a term with itself is the term: must NOT
    # return empty because countDistinct can never reach the raw count
    once = ix.conjunctive_search(docs200, ["vector"])
    twice = ix.conjunctive_search(docs200, ["vector", "vector"])
    assert once.count() > 0
    assert twice.count() == once.count()


def test_merge_postings_equals_rebuild(spark, docs200):
    old = ix.term_postings(docs200.filter("doc_id < 100"), min_df=1)
    delta = docs200.filter("doc_id >= 100")
    merged = {
        r.term: (r.n_docs, r.total_tf, r.postings)
        for r in ix.merge_postings(old, delta, min_df=2).collect()
    }
    rebuilt = {
        r.term: (r.n_docs, r.total_tf, r.postings)
        for r in ix.term_postings(docs200, min_df=2).collect()
    }
    assert merged == rebuilt


def test_merge_postings_numeric_posting_order(spark):
    # lexicographic merge would put '10' before '9'
    docs = spark.createDataFrame(
        [(9, "zebra word"), (10, "zebra other")],
        "doc_id long, text string",
    )
    old = ix.term_postings(docs.filter("doc_id = 9"), min_df=1)
    out = {r.term: r.postings for r in
           ix.merge_postings(old, docs.filter("doc_id = 10")).collect()}
    assert out["zebra"] == "9,10"


def test_merge_postings_string_doc_ids(spark):
    # ADVICE r3: a blind cast('long') crashed on non-numeric ids under
    # ANSI, and numeric-as-string ids sorted numerically in the merge
    # but lexicographically in term_postings. Both sides must order by
    # the doc column's NATIVE type: string ids sort lexicographically
    # ('10' before '9'), and the rebuild invariant must hold.
    docs = spark.createDataFrame(
        [("doc-b", "zebra word"), ("doc-a", "zebra other"),
         ("10", "zebra ten"), ("9", "zebra nine")],
        "doc_id string, text string",
    )
    old = ix.term_postings(docs.filter("doc_id in ('doc-b', '9')"),
                           doc_col="doc_id", min_df=1)
    merged = {
        r.term: (r.n_docs, r.total_tf, r.postings)
        for r in ix.merge_postings(
            old, docs.filter("doc_id in ('doc-a', '10')")
        ).collect()
    }
    rebuilt = {
        r.term: (r.n_docs, r.total_tf, r.postings)
        for r in ix.term_postings(docs, min_df=1).collect()
    }
    assert merged == rebuilt
    assert merged["zebra"][2] == "10,9,doc-a,doc-b"


def test_cdx_and_wat_json_escape(spark):
    # ADVICE r3: a url containing '"' or '\' must still yield a valid
    # JSON payload in the CDXJ line and the WAT record.
    import json

    from news_combinator_spark.functions.warc import (
        cdx_records,
        wat_records,
    )

    from datetime import datetime

    df = spark.createDataFrame(
        [('http://h1.test/a?q="x"\\y', "h1.test", "body",
          datetime(2024, 3, 5, 12, 34, 56), "http://h1.test/n1",
          'http://h1.test/"n2"')],
        "url string, host string, text string, warc_ts timestamp, "
        "next1_url string, next2_url string",
    )
    line = cdx_records(df).collect()[0].cdx_line
    payload = line.split(" ", 2)[2]
    obj = json.loads(payload)
    assert obj["url"] == 'http://h1.test/a?q="x"\\y'
    rec = wat_records(df).collect()[0].wat_record
    body = rec.split("\n\n", 1)[1]
    wat = json.loads(body)
    assert wat["WARC-Target-URI"] == 'http://h1.test/a?q="x"\\y'
    assert wat["Links"][1] == 'http://h1.test/"n2"'


def test_merge_postings_ids_containing_separator(spark):
    # review fix: ids containing ',' or '%' are percent-escaped in the
    # posting list, so the comma join is lossless and the rebuild
    # invariant holds for URL-shaped doc ids
    docs = spark.createDataFrame(
        [("http://h/a,b", "zebra word"), ("50%,off", "zebra other"),
         ("plain", "zebra plain")],
        "doc_id string, text string",
    )
    old = ix.term_postings(
        docs.filter("doc_id = 'plain'"), doc_col="doc_id", min_df=1
    )
    merged = {
        r.term: (r.n_docs, r.total_tf, r.postings)
        for r in ix.merge_postings(
            old, docs.filter("doc_id != 'plain'")
        ).collect()
    }
    rebuilt = {
        r.term: (r.n_docs, r.total_tf, r.postings)
        for r in ix.term_postings(docs, min_df=1).collect()
    }
    assert merged == rebuilt
    # three postings survive (a naive split on ',' would make five)
    assert merged["zebra"][0] == 3
    assert merged["zebra"][2].count(",") == 2
    assert "%2C" in merged["zebra"][2]


def test_split_posting_ids_inverts_escaping(spark):
    # read-side inverse: raw ids come back exactly, including ids
    # containing ',' and '%' (and the literal sequence '%25')
    raw_ids = ["http://h/a,b", "50%,off", "x%25y", "plain"]
    docs = spark.createDataFrame(
        [(i, "zebra word") for i in raw_ids],
        "doc_id string, text string",
    )
    import pyspark.sql.functions as F

    out = (
        ix.term_postings(docs, min_df=1)
        .filter("term = 'zebra'")
        .select(ix.split_posting_ids(F.col("postings")).alias("ids"))
        .collect()[0]["ids"]
    )
    assert sorted(out) == sorted(raw_ids)
