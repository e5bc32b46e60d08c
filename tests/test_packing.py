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
