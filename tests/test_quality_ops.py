"""Distribution-aware curation semantics beyond the DuckDB hash gate:
adaptive length cuts and PSI content drift."""

import pyspark.sql.functions as F
import pytest

from news_combinator_spark.operators.quality import (
    adaptive_length_filter,
    content_drift,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_adaptive_cuts_differ_per_group(spark):
    # short-form group: lengths 1..10; long-form group: 100..1000
    rows = [(i, "short", "w " * (i + 1)) for i in range(10)] + [
        (100 + i, "long", "w " * (100 * (i + 1))) for i in range(10)
    ]
    out = adaptive_length_filter(_docs(spark, rows)).collect()
    cuts = {(r.lang): (r.lo_cut, r.hi_cut) for r in out}
    assert cuts["short"][1] < cuts["long"][0]
    # a 5-token doc is fine for 'short' but would fail 'long'
    short5 = [r for r in out if r.lang == "short" and r.n_tok == 5][0]
    assert short5.keep


def test_adaptive_tails_cut_within_group(spark):
    # 98 docs at length 50, one at 1, one at 5000: the outliers are
    # exactly the p05/p95 exclusions
    rows = (
        [(i, "en", "w " * 50) for i in range(98)]
        + [(98, "en", "w"), (99, "en", "w " * 5000)]
    )
    out = {r.doc: r.keep for r in
           adaptive_length_filter(_docs(spark, rows)).collect()}
    assert not out[98] and not out[99]
    assert all(out[i] for i in range(98))


def _pages(spark, rows):
    return spark.createDataFrame(rows, "host string, text string")


def test_drift_zero_for_identical_distributions(spark):
    rows = [("h", "w " * n) for n in (10, 30, 50, 70)] * 5
    a, b = _pages(spark, rows), _pages(spark, rows)
    r = content_drift(a, b).collect()[0]
    assert abs(r.psi) < 1e-9 and not r.drifted


def test_drift_flags_shifted_host_only(spark):
    steady = [("ok", "w " * n) for n in (10, 30, 50, 70)] * 5
    before = _pages(spark, steady + [("bad", "w " * 60)] * 20)
    after = _pages(spark, steady + [("bad", "w " * 5)] * 20)
    out = {r.host: r for r in content_drift(before, after).collect()}
    assert out["bad"].drifted and out["bad"].psi > 1.0
    assert not out["ok"].drifted


def test_drift_key_absent_from_one_side_still_scores(spark):
    before = _pages(spark, [("gone", "w " * 30)] * 10)
    after = _pages(spark, [("new", "w " * 30)] * 10)
    out = {r.host: r for r in content_drift(before, after).collect()}
    # a host that vanished (or appeared) is maximal-drift territory:
    # all its mass moved between the eps floor and one bucket
    assert out["gone"].n_after == 0 and out["gone"].drifted
    assert out["new"].n_before == 0 and out["new"].drifted


def test_adaptive_null_group_gets_its_own_band(spark):
    rows = [(i, None, "w " * 50) for i in range(5)] + [
        (10 + i, "en", "w " * 50) for i in range(5)
    ]
    out = adaptive_length_filter(_docs(spark, rows)).collect()
    # NULL-lang docs must not silently vanish from the output
    assert len(out) == 10
    nulls = [r for r in out if r.lang is None]
    assert len(nulls) == 5 and all(r.keep for r in nulls)
