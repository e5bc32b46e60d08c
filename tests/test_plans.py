"""Physical-plan assertions: pushdown, pruning, broadcast — the
scale-readiness invariants (SURVEY.md §4)."""

import re

from pyspark.sql import functions as F

from news_combinator_spark.plans.queries import q_top_revenue_customers

from conftest import SF_MED


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushed_to_parquet(spark):
    li = (
        spark.read.parquet(f"{SF_MED}/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .filter(F.col("l_quantity") > 30)
    )
    plan = _plan(li)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "GreaterThan(l_quantity,30.0)" in m.group(1), plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m is not None
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_orderkey", "l_quantity"}, cols  # column pruning


def test_small_dim_join_is_broadcast(spark):
    plan = _plan(q_top_revenue_customers(spark, SF_MED))
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_partial_aggregation_before_shuffle(spark):
    li = spark.read.parquet(f"{SF_MED}/lineitem.parquet")
    agg = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    plan = _plan(agg)
    # two HashAggregates (partial + final) around one exchange =
    # map-side combine
    assert plan.count("HashAggregate") >= 2, plan
    assert "Exchange" in plan
