"""Sequence packing: engine two-level prefix sum vs pure-Python scan."""

from pyspark.sql import functions as F

from news_combinator_spark.operators.packing import pack_sequences


def _expected(rows, budget):
    cum = 0
    exp = {}
    for doc_id, text in sorted(rows):
        n = len(text.strip().split())
        seq_id = cum // budget
        exp[doc_id] = (
            n,
            seq_id,
            cum % budget,
            (cum + n - 1) // budget - seq_id + 1,
        )
        cum += n
    return exp


def test_pack_sequences_matches_serial_scan(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(7 + (i * 13) % 40)))
            for i in range(100)]
    rows.append((100, " ".join(["long"] * 900)))  # spans many sequences
    df = spark.createDataFrame(rows, "doc_id long, text string")
    budget = 128
    got = {
        r["doc_id"]: (r["n_tok"], r["seq_id"], r["seq_offset"], r["n_seqs"])
        for r in pack_sequences(
            df, budget=budget, bucket_width=16
        ).collect()
    }
    exp = _expected(rows, budget)
    assert got == exp
    # the long doc really spans several sequences
    assert got[100][3] >= 7


def test_pack_sequences_bucket_width_invariant(spark):
    """The bucket decomposition is an implementation detail: any width
    must produce the identical packing."""
    rows = [(i, " ".join(["t"] * (5 + i % 17))) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(
        map(tuple, pack_sequences(df, budget=64, bucket_width=4).collect())
    )
    b = sorted(
        map(tuple, pack_sequences(df, budget=64, bucket_width=1 << 20).collect())
    )
    assert a == b


def test_pack_sequences_precomputed_token_col(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "doc_id long, my_tok long"
    )
    out = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in pack_sequences(
            df, budget=25, token_col="my_tok"
        ).collect()
    }
    assert out == {1: (0, 0), 2: (0, 10), 3: (1, 5)}


def test_write_training_shards_deterministic(spark, tmp_path):
    """Shards hold contiguous slices of the total order at the
    declared size; a re-write from a differently-partitioned input
    produces the identical assignment."""
    from news_combinator_spark.operators.packing import (
        write_training_shards,
    )

    df = spark.range(0, 95).selectExpr(
        "concat('g', cast(id % 7 as string)) AS grp",
        "id AS doc_id",
    )
    out = tmp_path / "shards"
    n = write_training_shards(
        df, str(out), shard_records=10, order_cols=["grp", "doc_id"],
        group_cols=["grp"],
    )
    assert n == 10  # ceil(95/10)
    back = spark.read.parquet(str(out))
    sizes = {
        r.shard: r.n
        for r in back.groupBy("shard").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert sum(sizes.values()) == 95
    assert all(v == 10 for s, v in sizes.items() if s < 9)
    assert sizes[9] == 5
    # shard 0 holds the FIRST 10 rows of the (grp, doc_id) total order
    first = sorted(
        (r.grp, r.doc_id)
        for r in back.filter("shard = 0").collect()
    )
    expected = sorted(
        (f"g{i % 7}", i) for i in range(95)
    )[:10]
    assert first == expected
    # determinism under different input partitioning
    n2 = write_training_shards(
        df.repartition(13), str(tmp_path / "shards2"),
        shard_records=10, order_cols=["grp", "doc_id"],
        group_cols=["grp"],
    )
    back2 = spark.read.parquet(str(tmp_path / "shards2"))
    a = sorted((r.shard, r.grp, r.doc_id) for r in back.collect())
    b = sorted((r.shard, r.grp, r.doc_id) for r in back2.collect())
    assert n2 == n and a == b


def test_shard_manifest_matches_written_files(spark, tmp_path):
    """The manifest computed from the PLAN equals one recomputed from
    the FILES write_training_shards produced — counts, rank ranges,
    token sums, and the XOR checksum all agree; tampering with one
    row's content flips exactly that shard's checksum."""
    from pyspark.sql import functions as F

    from news_combinator_spark.operators.packing import (
        shard_manifest,
        write_training_shards,
    )

    df = spark.range(0, 95).selectExpr(
        "concat('g', cast(id % 7 as string)) AS grp",
        "id AS doc_id",
        "concat('text-', cast(id as string)) AS payload",
        "cast(id % 5 + 1 as long) AS n_tok",
    )
    out = tmp_path / "shards"
    write_training_shards(
        df, str(out), shard_records=10, order_cols=["grp", "doc_id"],
        group_cols=["grp"],
    )
    man = shard_manifest(
        df, 10, order_cols=["grp", "doc_id"], group_cols=["grp"],
        token_col="n_tok", digest_cols=["doc_id", "payload"],
    ).toPandas().set_index("shard").sort_index()

    back = spark.read.parquet(str(out))
    dg = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id").cast("string"),
                              "payload")), 1, 13), 16, 10
    ).cast("long")
    from_files = (
        back.withColumn("_d", dg)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.expr("bit_xor(_d)").alias("content_xor"),
             F.sum("n_tok").alias("n_tokens"))
        .toPandas().set_index("shard").sort_index()
    )
    assert list(man.n_rows) == list(from_files.n_rows)
    assert list(man.content_xor) == list(from_files.content_xor)
    assert list(man.n_tokens) == list(from_files.n_tokens)
    assert (man.last_rank - man.first_rank + 1 == man.n_rows).all()

    tampered = df.withColumn(
        "payload",
        F.when(F.col("doc_id") == 42, F.lit("EVIL")).otherwise(
            F.col("payload")
        ),
    )
    man2 = shard_manifest(
        tampered, 10, order_cols=["grp", "doc_id"], group_cols=["grp"],
        token_col="n_tok", digest_cols=["doc_id", "payload"],
    ).toPandas().set_index("shard").sort_index()
    diff = (man.content_xor != man2.content_xor).sum()
    assert diff == 1  # exactly the shard holding doc 42
    assert list(man.n_rows) == list(man2.n_rows)
