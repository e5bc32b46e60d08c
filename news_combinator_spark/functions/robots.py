"""robots.txt parsing as JVM-side DataFrame expressions.

The reference delegates robots handling to scrapy's middleware
(reconstruction/crawler settings enable ROBOTSTXT_OBEY); the frontier
here gates candidates with `apply_robots` over (host, disallow_prefix)
rules. This module produces those rules from RAW robots.txt bodies —
one body per host, fetched like any other page — so the whole
politeness pipeline runs from crawl data with no driver-side parsing.

Semantics (the subset `apply_robots` can enforce):
- groups: consecutive `User-agent:` lines head a group; the group's
  rules run until the next group starts (a UA line whose previous
  significant line is not a UA line).
- a group applies to `agent` if ANY of its UA lines equals it
  (case-insensitive; `*` is just an agent name here).
- `Disallow:` with a non-empty prefix emits a rule; empty Disallow
  (allow-all) is dropped.
- comments (`#...`), blank lines, and `Allow:` lines are ignored —
  Allow-overrides are an ACCEPTED DEVIATION (the frontier's gate is
  prefix-disallow only; an Allow that shadows a broader Disallow is
  treated as still disallowed, i.e. the gate errs conservative).

Scale design: everything is split/regexp/window expressions — no
Python. The only window partitions by host, and a robots body is
KB-sized by protocol convention, so no partition can exceed a few
thousand lines regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rules_from_robots_txt"]


def rules_from_robots_txt(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) -> distinct disallow rules applying to
    `agent`: (host, path_prefix, disallow_prefix), where path_prefix
    is the literal Disallow value and disallow_prefix is the full-URL
    form ('http://' || host || path) that `frontier.apply_robots`
    matches candidate urls against."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("pos", "raw"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace("raw", "#.*", "")).alias("line"),
    )
    typed = lines.select(
        "host",
        "pos",
        F.startswith(F.lower("line"), F.lit("user-agent:")).alias("is_ua"),
        F.startswith(F.lower("line"), F.lit("disallow:")).alias("is_dis"),
        # value = everything after the FIRST colon (a prefix may
        # itself contain colons)
        F.trim(
            F.expr("substring(line, instr(line, ':') + 1)")
        ).alias("value"),
    ).filter(F.length("line") > 0)
    w = Window.partitionBy("host").orderBy("pos")
    grouped = typed.withColumn(
        "new_group",
        (
            F.col("is_ua")
            & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False))
        ).cast("int"),
    ).withColumn("group_id", F.sum("new_group").over(w))
    agent_groups = (
        grouped.filter(
            F.col("is_ua") & (F.lower("value") == agent.lower())
        )
        .select("host", "group_id")
        .distinct()
    )
    rules = grouped.filter(F.col("is_dis") & (F.length("value") > 0))
    return (
        rules.join(agent_groups, ["host", "group_id"])
        .select("host", F.col("value").alias("path_prefix"))
        .distinct()
        .withColumn(
            "disallow_prefix",
            F.concat(F.lit("http://"), F.col("host"), F.col("path_prefix")),
        )
    )
