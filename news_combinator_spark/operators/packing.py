"""Sequence packing for LLM training-data preparation.

Production pretraining pipelines concatenate documents in a fixed
order and chunk the token stream into fixed-budget training sequences
("concat-and-chunk"). The placement of every document is a pure
function of the running token count before it, so packing is a global
cumulative sum — implemented here with the two-level prefix sum from
operators/ranking.py (no single-partition window, no driver loop),
which is exactly the shape that survives a 10^10-document corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ranking import partitioned_global_cumsum


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    token_col: str | None = None,
    order_col: str = "doc_id",
    bucket_width: int = 1 << 20,
) -> DataFrame:
    """Assign each document its place in the packed token stream:
    (order_col, n_tok, seq_id, seq_offset, n_seqs) where documents are
    concatenated in ``order_col`` order and chunked every ``budget``
    tokens. ``seq_id``/``seq_offset`` locate the document's first
    token; ``n_seqs`` is how many training sequences it spans.

    Token counts come from ``token_col`` if given, else a whitespace
    count of ``text_col`` (JVM-side split/size — swap in a real
    tokenizer count upstream for BPE budgets). ``bucket_width`` sizes
    the prefix-sum buckets; it must stay >> 1 so the offsets frame is
    ~n/width rows (see partitioned_global_cumsum)."""
    cols = df
    if token_col is None:
        token_col = "n_tok"
        cols = df.withColumn(
            token_col,
            F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long"),
        )
    narrow = cols.select(order_col, token_col)
    bucket = F.floor(F.col(order_col) / F.lit(bucket_width)).cast("long")
    cum = partitioned_global_cumsum(
        narrow, bucket, [order_col], token_col, out_col="_cum"
    )
    cb = F.col("_cum") - F.col(token_col)  # tokens before this doc
    return cum.select(
        order_col,
        F.col(token_col),
        F.floor(cb / budget).cast("long").alias("seq_id"),
        (cb % budget).cast("long").alias("seq_offset"),
        (
            F.floor((cb + F.col(token_col) - 1) / budget)
            - F.floor(cb / budget)
            + 1
        )
        .cast("long")
        .alias("n_seqs"),
    )
