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


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_records: int,
    order_cols: list[str],
    group_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> int:
    """Export a corpus as deterministic fixed-size shards — the
    training loader's contract: shard k holds rows (k*shard_records,
    (k+1)*shard_records] of the total order over ``order_cols``, so
    any reader reproduces the same sample order regardless of the
    cluster that wrote it.

    Shard assignment reuses the two-level prefix-sum rank
    (`ranking.partitioned_global_rank` over ``group_cols`` defaulting
    to the first order col) — no single-partition stage — and each
    shard is one output task via repartition on the shard id, giving
    one file per shard. Returns the shard count.
    """
    from .ranking import partitioned_global_rank

    group_cols = group_cols or [order_cols[0]]
    within = [c for c in order_cols if c not in group_cols] or order_cols
    ranked = partitioned_global_rank(
        df, part_cols=group_cols, order_cols=within, out_col="_rank"
    )
    sharded = ranked.withColumn(
        "shard",
        ((F.col("_rank") - 1) / F.lit(shard_records)).cast("long"),
    ).drop("_rank")
    n_shards = sharded.agg(
        (F.max("shard") + 1).cast("int").alias("n")
    ).collect()[0]["n"]
    (
        sharded.repartition(max(int(n_shards), 1), "shard")
        .sortWithinPartitions("shard", *order_cols)
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(fmt)
        .save(path)
    )
    return int(n_shards)


def shard_manifest(
    df: DataFrame,
    shard_records: int,
    order_cols: list[str],
    group_cols: list[str] | None = None,
    token_col: str | None = None,
    digest_cols: list[str] | None = None,
) -> DataFrame:
    """Integrity manifest for a sharded training export: one row per
    shard with (shard, n_rows, first_rank, last_rank, content_xor
    [, n_tokens]) — what a training loader checks before trusting a
    multi-terabyte export (row counts catch truncation, the rank
    range pins the reproducible total order, the checksum catches
    content substitution).

    ``content_xor`` is the bit-XOR of a 52-bit md5-derived digest of
    ``digest_cols`` (default: the order columns) per row —
    order-insensitive by construction, which is exactly right here:
    order integrity is already pinned by (first_rank, last_rank)
    under the total-order guarantee, so the checksum can use a
    commutative reduction that map-side combines instead of a
    per-shard collect_list. Shard assignment reuses the same
    two-level prefix-sum rank as `write_training_shards`, so the
    manifest matches the files byte-for-byte row placement."""
    from pyspark.sql import functions as F

    from .ranking import partitioned_global_rank

    group_cols = group_cols or [order_cols[0]]
    within = [c for c in order_cols if c not in group_cols] or order_cols
    ranked = partitioned_global_rank(
        df, part_cols=group_cols, order_cols=within, out_col="_rank"
    )
    dcols = digest_cols or order_cols
    digest = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", *[F.col(c).cast("string") for c in dcols])),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    shard = F.floor((F.col("_rank") - 1) / shard_records).cast("int")
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.min("_rank").alias("first_rank"),
        F.max("_rank").alias("last_rank"),
        F.expr("bit_xor(_d)").alias("content_xor"),
    ]
    if token_col is not None:
        aggs.append(F.sum(token_col).alias("n_tokens"))
    return (
        ranked.withColumn("_d", digest)
        .groupBy(shard.alias("shard"))
        .agg(*aggs)
    )
