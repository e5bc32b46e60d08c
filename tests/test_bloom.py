"""Bloom seen-filter: no false negatives; FP rate bounded; merge OK."""

import numpy as np

from news_combinator_spark.operators.bloom import (
    Bloom,
    build_bloom,
    maybe_seen_udf,
    optimal_params,
)


def test_no_false_negatives_local():
    m, k = optimal_params(1000, 1e-6)
    b = Bloom(m, k)
    vals = [f"http://h{i % 7}.test/{i}" for i in range(1000)]
    b.add_local(vals)
    assert b.contains_local(vals).all()


def test_false_positive_rate_bounded():
    m, k = optimal_params(5000, 1e-4)
    b = Bloom(m, k)
    b.add_local([f"in-{i}" for i in range(5000)])
    probes = [f"out-{i}" for i in range(20000)]
    fp = b.contains_local(probes).sum()
    assert fp / 20000 < 1e-2  # generous ceiling over the 1e-4 design point


def test_merge_is_union():
    m, k = optimal_params(100, 1e-6)
    b1, b2 = Bloom(m, k), Bloom(m, k)
    b1.add_local(["a", "b"])
    b2.add_local(["c"])
    b1.or_(b2.bits)
    assert b1.contains_local(["a", "b", "c"]).all()


def test_distributed_build_matches_local(spark):
    vals = [(f"http://x.test/{i}",) for i in range(2000)]
    df = spark.createDataFrame(vals, "url string").repartition(8)
    m, k = optimal_params(2000, 1e-6)
    bloom = build_bloom(df, "url", m, k)
    local = Bloom(m, k)
    local.add_local([v[0] for v in vals])
    assert np.array_equal(bloom.bits, local.bits)
    # udf path agrees
    udf = maybe_seen_udf(spark, bloom)
    from pyspark.sql import functions as F

    out = df.withColumn("maybe", udf(F.col("url"))).toPandas()
    assert out.maybe.all()
