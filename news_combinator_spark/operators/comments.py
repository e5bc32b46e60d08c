"""Cross-site comments fan-out (SURVEY.md J6, U2, W5, A4).

The reference website fetches comments per cluster member from each
source's comment API at render time (commentsAction.php:25-44 loop,
URL builder :60-88, per-source JSON parsing :121-180), merges
(array_merge :36-37) and sorts (reetsee first, then time :182-189),
then pipes the '|'-joined bodies to the summarizer daemon (:269-303).

Engine shape:
- `fetch_comments_udf`: an Arrow pandas UDF keyed by
  (source, source_comment_id) — the per-batch HTTP fan-out slot. The
  sandbox implementation is a deterministic fake API (seeded by the
  key) with the same response shape as the reference's normalized
  record (commentsAction.php:107-117); a real deployment swaps the
  function body for requests calls, batched per host.
- `attach_comments`: cluster members x comments equi-join + the
  reference ordering + the '|'-join aggregation in document order.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .summarize import abstract_v2


def fake_comment_api(source: str, comment_id: str, n_max: int = 5):
    """Deterministic stand-in for the per-source comment APIs: returns
    normalized (user, time, content) rows derived from the key hash."""
    h = hashlib.blake2b(
        f"{source}/{comment_id}".encode(), digest_size=8
    ).digest()
    n = 1 + h[0] % n_max
    out = []
    for i in range(n):
        hi = hashlib.blake2b(
            f"{source}/{comment_id}/{i}".encode(), digest_size=8
        ).digest()
        out.append(
            {
                "user": f"user{hi[1] % 1000}",
                "time": 1704067200 + hi[2] * 3600 + i,
                "content": f"comment {hi[3]} about story via {source}.",
            }
        )
    return out


def fetch_comments(members: DataFrame) -> DataFrame:
    """members(cluster_id, source, source_comment_id) -> one row per
    comment. mapInPandas = the batched fan-out slot (real impl: HTTP
    per batch, politeness per host)."""

    def _fetch(batches):
        for pdf in batches:
            rows = []
            for cid, src, scid in zip(
                pdf["cluster_id"], pdf["source"], pdf["source_comment_id"]
            ):
                for c in fake_comment_api(str(src), str(scid)):
                    rows.append(
                        (cid, src, scid, c["user"], c["time"], c["content"])
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "cluster_id", "source", "source_comment_id",
                    "user", "time", "content",
                ],
            )

    return members.mapInPandas(
        _fetch,
        schema=(
            "cluster_id long, source string, source_comment_id string, "
            "user string, time long, content string"
        ),
    )


def merged_sorted_comments(
    comments: DataFrame, preferred_source: str = "reetsee"
) -> DataFrame:
    """U2+W5: union of per-source lists, preferred source first then
    by time (commentsAction.php:36-43,182-189); deterministic
    tie-break on (user, content)."""
    return comments.orderBy(
        (F.col("source") == preferred_source).cast("int").desc(),
        F.asc("time"),
        F.asc("user"),
        F.asc("content"),
    )


def cluster_comment_abstract(comments: DataFrame) -> DataFrame:
    """Per cluster: '|'-join comment bodies in merged order (A4,
    commentsAction.php:276-279), then the v2 extractive abstract
    (abstraction_service.cpp:162-213)."""
    ordered = comments.withColumn(
        "pref", (F.col("source") == "reetsee").cast("int")
    )
    joined = ordered.groupBy("cluster_id").agg(
        F.concat_ws(
            "|",
            F.expr(
                "transform(array_sort(collect_list(struct(-pref as np, "
                "time, user, content))), x -> x.content)"
            ),
        ).alias("all_comments")
    )

    def _abs(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["comment_abstract"] = pdf["all_comments"].map(
                lambda t: abstract_v2(t or "")
            )
            yield pdf

    return joined.mapInPandas(
        _abs,
        schema="cluster_id long, all_comments string, comment_abstract string",
    )
