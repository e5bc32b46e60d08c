"""Sharded cuckoo filter: the deletable seen-set (north-star's
"bloom/cuckoo"). Invariants: no false negatives under inserts, fp
rate bounded, delete forgets exactly the fed keys, per-shard memory
bounded, executor-resident state (never a driver bitset)."""

import numpy as np
import pytest

from news_combinator_spark.operators.cuckoo import (
    ShardedCuckoo,
    _Table,
    buckets_for,
    build_sharded_cuckoo,
)


def test_local_table_no_false_negatives_and_fp_bounded():
    import pandas as pd

    t = _Table(buckets_for(5000))
    vals = pd.Series([f"http://h{i % 7}.test/{i}" for i in range(5000)])
    assert t.insert(vals) == 0  # no homeless keys at 90% sizing
    assert t.contains(vals).all()
    probes = pd.Series([f"out-{i}" for i in range(20000)])
    fp = t.contains(probes).sum()
    # design point ~1.2e-4/probe; generous ceiling
    assert fp / 20000 < 5e-3


def test_local_table_delete_forgets_only_inserted():
    import pandas as pd

    t = _Table(buckets_for(1000))
    a = pd.Series([f"keep-{i}" for i in range(500)])
    b = pd.Series([f"drop-{i}" for i in range(500)])
    t.insert(a)
    t.insert(b)
    assert t.delete(b) == 500
    assert t.contains(a).all()          # kept set intact
    assert t.contains(b).sum() < 10     # forgotten modulo fp noise


def test_sharded_no_false_negatives(spark):
    df = spark.createDataFrame(
        [(f"http://h{i % 11}.test/p/{i}",) for i in range(3000)],
        "url string",
    ).repartition(8)
    ck = build_sharded_cuckoo(df, "url", expected_n=3000, n_shards=16)
    out = ck.probe(df, "url").toPandas()
    assert len(out) == 3000 and out.maybe.all()


def test_sharded_delete_readmits_for_recrawl(spark):
    """The recrawl path: a seen URL whose freshness expired is deleted
    from the filter and probes definitely-new again, without touching
    any other shard or key."""
    seen = spark.createDataFrame(
        [(f"u-{i}",) for i in range(2000)], "url string"
    )
    ck = build_sharded_cuckoo(seen, "url", expected_n=4000, n_shards=8)
    expired = seen.filter("url like 'u-1%'")      # 1, 10-19, 100-199, 1000-1999
    ck2 = ck.delete(expired, "url")
    probed = {
        r["url"]: r["maybe"]
        for r in ck2.probe(seen, "url").collect()
    }
    n_exp = expired.count()
    readmitted = sum(
        1 for u, m in probed.items() if u.startswith("u-1") and not m
    )
    kept = sum(
        1 for u, m in probed.items() if not u.startswith("u-1") and m
    )
    assert readmitted >= n_exp * 0.99   # forgotten (fp collisions only)
    assert kept == 2000 - n_exp         # everyone else still seen


def test_sharded_insert_delta_and_memory_bound(spark):
    base = spark.createDataFrame(
        [(f"a-{i}",) for i in range(500)], "url string"
    )
    delta = spark.createDataFrame(
        [(f"b-{i}",) for i in range(500)], "url string"
    )
    ck = build_sharded_cuckoo(base, "url", expected_n=2000, n_shards=8)
    ck2 = ck.insert_delta(delta, "url")
    both = base.unionByName(delta)
    assert ck2.probe(both, "url").toPandas().maybe.all()
    # per-shard bytes = n_buckets * 4 slots * 2 bytes, never the union
    per_shard = ck2.n_buckets * 4 * 2
    assert ck2.max_shard_bytes() <= per_shard
    assert ck2.slots_df.count() <= 8


def test_overflow_raises_with_clear_message(spark):
    tiny = spark.createDataFrame(
        [(f"x-{i}",) for i in range(2000)], "url string"
    )
    with pytest.raises(Exception, match="overflow|homeless"):
        # sized for 64 keys total -> shards overflow deterministically
        build_sharded_cuckoo(tiny, "url", expected_n=64, n_shards=2)
