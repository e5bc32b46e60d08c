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


def test_dsir_stage_keeps_targets_and_k_best(result, spark):
    """--dsir-hosts/--dsir-k: the resampled corpus is the surviving
    target-host docs plus at most k selected candidates; the funnel
    records the stage, and the default build (module fixture) skips
    it."""
    from pyspark.sql import functions as F

    from news_combinator_spark.datagen import pages_from_documents

    base, _ = result
    assert "after_dsir" not in base["funnel"]

    hosts = [
        r.host
        for r in pages_from_documents(spark, SF_SMALL)
        .select("host")
        .distinct()
        .limit(2)
        .collect()
    ]
    k = 5
    r = build(spark, SF_SMALL, dsir_target_hosts=hosts, dsir_k=k)
    f = r["funnel"]
    assert "after_dsir" in f
    assert f["after_dsir"] <= f["after_decontamination"]
    # the stage keeps at most (surviving targets + k) docs
    full = pages_from_documents(spark, SF_SMALL)
    n_targets = full.filter(F.col("host").isin(*hosts)).count()
    assert f["after_dsir"] <= n_targets + k


def test_dsir_stage_arg_validation(spark):
    """Bad DSIR configs fail fast, before the funnel runs: negative
    k, and hosts/k given without each other."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match=">= 0"):
        build(spark, SF_SMALL, dsir_target_hosts=["h0.test"], dsir_k=-5)
    with _pytest.raises(ValueError, match="set together"):
        build(spark, SF_SMALL, dsir_target_hosts=["h0.test"], dsir_k=0)
    with _pytest.raises(ValueError, match="set together"):
        build(spark, SF_SMALL, dsir_k=7)
    with _pytest.raises(ValueError, match="matched no"):
        build(
            spark, SF_SMALL,
            dsir_target_hosts=["no-such-host.test"], dsir_k=7,
        )
