"""Serving-layer queries — the reference website's read path as
DataFrame builders (SURVEY.md §2: P5, O1-O3, W4, W5, A7, A8, J4).

All pure built-in expressions (codegen'd, pushdown-friendly); these
are the SQL-expressible operators checked against the DuckDB oracle
in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clamp_range_days(range_days: int, default: int = 3, lo: int = 1, hi: int = 50) -> int:
    """indexAction.php:8-13 — range clamped to [1,50], default 3."""
    if range_days is None:
        return default
    return max(lo, min(hi, int(range_days)))


def date_range_filter(
    df: DataFrame, day_col: str, cutoff_day: int
) -> DataFrame:
    """day_time >= cutoff, newest first (indexAction.php:32-45)."""
    return df.filter(F.col(day_col) >= cutoff_day).orderBy(
        F.desc(day_col)
    )


def rank_front_page(
    clusters: DataFrame,
    sources_col: str = "source_names",
    preferred_source: str = "reetsee",
) -> DataFrame:
    """Within each day: entries carrying the preferred source first,
    then more distinct sources first (indexAction.php:57-68 usort),
    deterministic tie-break on cluster_id."""
    sources_arr = F.split(F.col(sources_col), ",")
    return (
        clusters.withColumn(
            "has_preferred",
            F.array_contains(sources_arr, preferred_source).cast("int"),
        )
        .withColumn("n_distinct_sources", F.size(F.array_distinct(sources_arr)))
        .orderBy(
            F.desc("day_time"),
            F.desc("has_preferred"),
            F.desc("n_distinct_sources"),
            F.asc("cluster_id"),
        )
    )


def group_by_day(clusters: DataFrame) -> DataFrame:
    """data[day_time][] grouping (indexAction.php:52-56)."""
    return clusters.groupBy("day_time").agg(
        F.count("*").alias("n_entries"),
        F.sort_array(F.collect_list("cluster_id")).alias("cluster_ids"),
    )


def entry_lookup(clusters: DataFrame, contents: DataFrame) -> DataFrame:
    """J4: cluster -> member contents via the csv id list
    (entryAction.php:79-87 WHERE abstract_id IN (...)). Explode the
    array then equi-join (broadcast-friendly when the cluster side is
    one id's row)."""
    member = clusters.select(
        "cluster_id",
        F.explode(F.split(F.col("abstract_ids"), ",")).alias("abstract_id"),
    ).withColumn("abstract_id", F.col("abstract_id").cast("long"))
    return member.join(contents, "abstract_id", "inner")


def sort_comments(
    comments: DataFrame,
    preferred_source: str = "reetsee",
    time_col: str = "time",
) -> DataFrame:
    """W5: preferred-source comments first, then by time
    (commentsAction.php:182-189)."""
    return comments.orderBy(
        (F.col("source") == preferred_source).cast("int").desc(),
        F.asc(time_col),
    )


def paginate(df: DataFrame, order_cols, pn: int = 1, rn: int = 20) -> DataFrame:
    """O3 comment paging (commentsAction.php:10-11). Page pn needs only
    the top pn*rn rows of the total order, so rank a limit-bounded
    prefix (TakeOrderedAndProject) instead of windowing the whole
    relation into one partition."""
    from .ranking import ranked_prefix

    return (
        ranked_prefix(df, list(order_cols), limit=pn * rn, out_col="_rn")
        .filter(F.col("_rn") > (pn - 1) * rn)
        .drop("_rn")
    )
