"""Batched stability properties for column-expression kernels.

These are hypothesis-style invariants checked over a generated batch
in ONE Spark job each (per-example Spark jobs would be prohibitively
slow): re-applying a normalizer must be a no-op, and the wildcard
rule translator must degrade to plain prefix semantics when no
special characters are present."""

import random
import string

import pyspark.sql.functions as F

from news_combinator_spark.functions.pii import scrub_pii_col
from news_combinator_spark.operators.frontier import robots_rule_pattern


def _rand_texts(n, seed):
    rng = random.Random(seed)
    alphabet = (
        string.ascii_letters + string.digits + " .@+-_/:$*[]{}()|\\"
    )
    out = []
    for i in range(n):
        body = "".join(
            rng.choice(alphabet) for _ in range(rng.randrange(0, 60))
        )
        # salt in PII-shaped fragments so the replace paths actually run
        extras = rng.sample(
            [
                f"user{i}@ex{i % 7}.com",
                f"10.{i % 256}.{(i * 3) % 256}.{(i * 7) % 256}",
                f"+{1 + i % 99} {100 + i % 900} {1000 + i % 9000}",
                f"1.2.3.4.{i % 10}",
                "10.1.2.3.",
                "",
            ],
            k=rng.randrange(0, 4),
        )
        out.append((i, body + " " + " ".join(extras)))
    return out


def test_scrub_pii_is_idempotent(spark):
    """scrub(scrub(x)) == scrub(x): the replacement tokens must never
    themselves match any pattern — otherwise a corpus scrubbed twice
    (re-ingestion, pipeline retry) silently mutates."""
    df = spark.createDataFrame(
        _rand_texts(400, seed=1234), "doc_id long, text string"
    )
    out = df.select(
        scrub_pii_col("text").alias("a")
    ).select(F.col("a"), scrub_pii_col(F.col("a")).alias("b"))
    diffs = out.filter(F.col("a") != F.col("b")).collect()
    assert diffs == [], diffs[:5]


def test_wildcard_pattern_reduces_to_prefix_without_specials(spark):
    """For rules containing no * or $, regexp_like(path, translate(
    rule)) must equal startswith(path, rule) — the wildcard evaluator
    strictly generalizes the prefix gate, including on rules full of
    regex metacharacters (dots, brackets, plus signs)."""
    rng = random.Random(99)
    alphabet = string.ascii_lowercase + string.digits + "/.-_[]{}()+?|\\^"
    rules = [
        "/" + "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 12)))
        for _ in range(120)
    ]
    paths = [
        "/" + "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 16)))
        for _ in range(120)
    ]
    # pair each rule with its own path, plus with a path that extends it
    rows = [
        (r, p) for r, p in zip(rules, paths)
    ] + [(r, r + "x/tail") for r in rules] + [(r, r) for r in rules]
    df = spark.createDataFrame(rows, "rule string, path string")
    out = df.select(
        "rule",
        "path",
        F.regexp_like(
            F.col("path"), robots_rule_pattern("rule")
        ).alias("via_regex"),
        F.col("path").startswith(F.col("rule")).alias("via_prefix"),
    )
    diffs = out.filter(F.col("via_regex") != F.col("via_prefix")).collect()
    assert diffs == [], diffs[:5]
