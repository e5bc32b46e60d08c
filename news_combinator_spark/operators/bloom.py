"""Distributed bloom filter for the URL-seen set.

The reference deduplicates by file existence (pipelines.py:19-23) and
UNIQUE keys (reetsee_news.sql:15,33) — O(1) point lookups that don't
distribute. At 10^10 URLs the exact seen-set is a table you must
anti-join against every round; the bloom filter is the broadcastable
prefilter that keeps that shuffle small: candidates that miss the
bloom are DEFINITELY new (skip the anti-join); only bloom hits go to
the exact check, so no false drops ever (SURVEY.md §7 risk 3).

Build is partition-local: each partition folds its URLs into an m-bit
bitset via mapInPandas; the driver ORs the fixed-size bitsets (size is
independent of row count) and broadcasts the result. Hashing uses
pandas' vectorized, deterministic hash_array with double hashing
h_i = h1 + i*h2 (Kirsch-Mitzenmacher).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hash_pair(values: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    arr = values.astype("object").to_numpy()
    h1 = pd.util.hash_array(arr, hash_key="0123456789123456")
    h2 = pd.util.hash_array(arr, hash_key="6543219876543210") | 1
    return h1, h2


def _fold_into(bits: np.ndarray, values: pd.Series, m: int, k: int) -> None:
    h1, h2 = _hash_pair(values)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
        byte_idx = (idx >> np.uint64(3)).astype(np.int64)
        mask = (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)).astype(
            np.uint8
        )
        # bitwise_or.at: unbuffered, so duplicate byte indices all land
        # (plain fancy-index |= silently drops repeats).
        np.bitwise_or.at(bits, byte_idx, mask)


def _check(bits: np.ndarray, values: pd.Series, m: int, k: int) -> np.ndarray:
    h1, h2 = _hash_pair(values)
    hit = np.ones(len(values), dtype=bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
        hit &= (bits[idx >> np.uint64(3)] >> (idx & np.uint64(7)).astype(np.uint8)) & 1 == 1
    return hit


def optimal_params(expected_n: int, fp_rate: float = 1e-6) -> tuple[int, int]:
    """(m_bits, k) for a target false-positive rate."""
    n = max(expected_n, 1)
    m = int(-n * math.log(fp_rate) / (math.log(2) ** 2)) + 8
    k = max(1, round(m / n * math.log(2)))
    return m, k


class Bloom:
    def __init__(self, m_bits: int, k: int, bits: np.ndarray | None = None):
        self.m = m_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(
            (m_bits + 7) // 8, dtype=np.uint8
        )

    def or_(self, other_bits: np.ndarray) -> None:
        np.bitwise_or(self.bits, other_bits, out=self.bits)

    def add_local(self, values: list[str]) -> None:
        if values:
            _fold_into(self.bits, pd.Series(values), self.m, self.k)

    def contains_local(self, values: list[str]) -> np.ndarray:
        if not values:
            return np.zeros(0, dtype=bool)
        return _check(self.bits, pd.Series(values), self.m, self.k)


def build_bloom(df: DataFrame, col: str, m_bits: int, k: int) -> Bloom:
    """Per-partition bitset build -> driver OR-merge. The shuffle-free
    scalable path: each task ships (m/8) bytes regardless of its row
    count."""
    m, kk = m_bits, k

    def fold(batches):
        bits = np.zeros((m + 7) // 8, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if len(pdf):
                any_rows = True
                _fold_into(bits, pdf[col].astype(str), m, kk)
        if any_rows:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = df.select(col).mapInPandas(fold, schema="bits binary").collect()
    bloom = Bloom(m, k)
    for row in parts:
        bloom.or_(np.frombuffer(row["bits"], dtype=np.uint8))
    return bloom


def maybe_seen_udf(spark: SparkSession, bloom: Bloom):
    """pandas_udf: True when the bloom MAY contain the value (exact
    anti-join still required for those); False = definitely new."""
    bc = spark.sparkContext.broadcast((bloom.bits, bloom.m, bloom.k))

    @F.pandas_udf(T.BooleanType())
    def _maybe(vals: pd.Series) -> pd.Series:
        bits, m, k = bc.value
        return pd.Series(_check(bits, vals.astype(str), m, k))

    return _maybe
