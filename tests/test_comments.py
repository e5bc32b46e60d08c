"""Comments fan-out join + merged ordering + cluster abstract (J6)."""

from news_combinator_spark.operators.comments import (
    cluster_comment_abstract,
    fake_comment_api,
    fetch_comments,
    merged_sorted_comments,
)


def test_fake_api_deterministic():
    a = fake_comment_api("netease", "bd1/123")
    b = fake_comment_api("netease", "bd1/123")
    assert a == b
    assert 1 <= len(a) <= 5
    assert all({"user", "time", "content"} <= set(c) for c in a)


def test_fetch_comments_fanout(spark):
    members = spark.createDataFrame(
        [
            (100, "netease", "bd1/123"),
            (100, "sina", "1-2-99"),
            (200, "tencent", "c55"),
        ],
        "cluster_id long, source string, source_comment_id string",
    )
    out = fetch_comments(members)
    rows = out.collect()
    assert len(rows) >= 3
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["source"])
    assert by_cluster[100] == {"netease", "sina"}
    assert by_cluster[200] == {"tencent"}
    # deterministic across invocations
    rows2 = fetch_comments(members).collect()
    assert sorted(map(str, rows)) == sorted(map(str, rows2))


def test_merged_sorted_preferred_first(spark):
    comments = spark.createDataFrame(
        [
            (1, "sina", "s", "u1", 100, "a"),
            (1, "reetsee", "r", "u2", 999, "b"),
            (1, "netease", "n", "u3", 50, "c"),
        ],
        "cluster_id long, source string, source_comment_id string, "
        "user string, time long, content string",
    )
    ordered = [r["content"] for r in merged_sorted_comments(comments).collect()]
    assert ordered == ["b", "c", "a"]  # reetsee first, then time asc


def test_cluster_comment_abstract(spark):
    members = spark.createDataFrame(
        [(7, "netease", "x1"), (7, "sina", "x2")],
        "cluster_id long, source string, source_comment_id string",
    )
    out = cluster_comment_abstract(fetch_comments(members)).collect()
    assert len(out) == 1
    row = out[0]
    assert row["cluster_id"] == 7
    assert "|" in row["all_comments"] or len(row["all_comments"]) > 0
    assert row["comment_abstract"].endswith("|")
