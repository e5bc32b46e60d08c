"""Replicates the driver's correctness gate locally: every queries()
entry with an oracle is run on Spark AND DuckDB at sf0.01 and compared
order-insensitively on sorted columns + values."""

import pandas as pd
import pytest

from news_combinator_spark.plans.queries import QUERIES

from conftest import SF_MED

WITH_ORACLE = [n for n, (_f, sql) in QUERIES.items() if sql is not None]
ROWS_ONLY = [n for n, (_f, sql) in QUERIES.items() if sql is None]


from news_combinator_spark.oracle.compare import (  # noqa: E402
    normalize_frame as _normalize,
)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    fn, sql = QUERIES[name]
    got = _normalize(fn(spark, SF_MED).toPandas())
    exp = _normalize(duck.execute(sql).fetchdf())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: column mismatch {got.columns} vs {exp.columns}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_registry_has_no_rows_only_entries():
    """Since round 4 every registry entry carries a DuckDB hash oracle
    (the last two rows-only entries — the sequential-consume greedy
    clusterings — got recursive-CTE replays). A new rows-only entry is
    a deliberate, documented decision: re-add a parametrized
    rows-only smoke test here alongside it if one ever returns."""
    assert ROWS_ONLY == []


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries().keys()) >= set(e.oracle_sql().keys())
