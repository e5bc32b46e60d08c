"""End-to-end corpus-build pipeline (scripts/build_corpus.py): the
composed funnel over sf0.001, with export + manifest integrity."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from build_corpus import build  # noqa: E402

from conftest import SF_SMALL


@pytest.fixture(scope="module")
def result(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus"))
    return build(spark, SF_SMALL, out=out, shard_records=10), out


def test_funnel_monotone_and_nonempty(result):
    r, _ = result
    f = r["funnel"]
    order = [
        "fetched",
        "after_health_gates",
        "after_exact_dedup",
        "after_near_dup",
        "after_decontamination",
    ]
    vals = [f[k] for k in order]
    assert vals == sorted(vals, reverse=True), vals
    assert vals[-1] > 0


def test_tokens_and_sequences_consistent(result):
    r, _ = result
    assert r["tokens"] > 0
    # sequences cover the token total at the configured budget
    assert r["sequences"] >= r["tokens"] // r["seq_budget"]


def test_shards_and_manifest_agree(result, spark):
    r, out = result
    shards = spark.read.parquet(f"{out}/shards")
    manifest = spark.read.parquet(f"{out}/manifest")
    assert shards.count() == r["funnel"]["after_decontamination"]
    m = manifest.collect()
    assert len(m) == r["shards"]
    assert sum(row.n_rows for row in m) == shards.count()
    # every kept doc has a packing placement
    assert shards.filter("seq_id IS NULL").count() == 0


def test_export_text_is_scrubbed(result, spark):
    _, out = result
    shards = spark.read.parquet(f"{out}/shards")
    leaked = shards.filter(
        "text rlike '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\\\.[A-Za-z]{2,}'"
    )
    assert leaked.count() == 0
