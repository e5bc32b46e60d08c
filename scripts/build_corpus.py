#!/usr/bin/env python
"""spark-submit entry point for the training-corpus build — the
second half of the pipeline, consuming what the crawl produced.

The reference stops at "store extracted articles + serve them"
(getcontent.py -> MySQL); a 100 TB crawl feeding model training
needs the curation funnel this script composes from the engine's
operators, in the order every public webtext pipeline documents:

    pages
      -> health gates      (soft-404, mojibake repair, language,
                            min length, repetition cap)
      -> PII scrub         (functions/pii, redacted bytes + counts)
      -> exact dedup       (md5 body identity, first id wins)
      -> near-dup dedup    (MinHash banding -> CC -> keep BEST copy
                            by token count, not blind min-id)
      -> decontamination   (word 4-gram overlap vs a held-out eval
                            slice, broadcast semi-join)
      -> DSIR resampling   (optional --dsir-hosts/--dsir-k: keep the
                            curated target hosts + the k candidates
                            whose hashed-n-gram profile best matches
                            them — operators/sampling.dsir_select)
      -> sequence packing  (two-level prefix sum -> seq_id/offset)
      -> sharded export    + integrity manifest

Cluster usage (same submission shape as the crawl job):

    zip -r nc_spark.zip news_combinator_spark
    spark-submit --py-files nc_spark.zip scripts/build_corpus.py \
        --sf-dir /data/testdata/sf0.1 --out /tmp/corpus \
        --seq-budget 2048 --shard-records 1000

Prints ONE JSON line: the per-stage funnel (rows in/out of every
gate), token totals, and the shard count — the numbers a pipeline
operator alarms on.

Every stage is the library operator (nothing reimplemented here), so
this script doubles as the composition proof: the funnel counts it
prints are reproducible from the individually hash-oracled queries.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from news_combinator_spark.datagen import pages_from_documents  # noqa: E402
from news_combinator_spark.functions.pagehealth import (  # noqa: E402
    demojibake,
    soft404_signals,
)
from news_combinator_spark.functions.pii import scrub_pii_col  # noqa: E402
from news_combinator_spark.operators.dedup import (  # noqa: E402
    keep_best_in_groups,
)
from news_combinator_spark.operators.packing import (  # noqa: E402
    pack_sequences,
    shard_manifest,
    write_training_shards,
)
from news_combinator_spark.session import get_spark  # noqa: E402


def build(
    spark,
    sf_dir: str,
    out: str = "",
    lang: str = "en",
    min_tokens: int = 25,
    max_rep: float = 0.6,
    eval_mod: int = 20,
    seq_budget: int = 2048,
    shard_records: int = 1000,
    near_dup_threshold: float = 0.8,
    dsir_target_hosts: list[str] | None = None,
    dsir_k: int = 0,
) -> dict:
    # validate the DSIR config BEFORE any Spark work: a bad pairing
    # discovered after the (expensive) gate/dedup stages is exactly
    # the late failure these checks exist to prevent
    if dsir_k < 0:
        raise ValueError(f"dsir_k must be >= 0, got {dsir_k}")
    if bool(dsir_target_hosts) != bool(dsir_k):
        raise ValueError(
            "dsir_target_hosts and dsir_k must be set together "
            f"(got hosts={dsir_target_hosts!r}, k={dsir_k})"
        )
    funnel: dict[str, int] = {}
    pages = pages_from_documents(spark, sf_dir)
    funnel["fetched"] = pages.count()

    # ---- health gates (per-row expressions, zero shuffle) ------------
    sig = soft404_signals(pages, html_col="html_str")
    healthy = sig.filter(~F.col("is_soft404")).select(
        "doc_id", "url", "host", "lang",
        demojibake(F.col("text")).alias("text"),
    )
    ws = F.split(F.trim(F.col("text")), r"\s+")
    nt = F.size(ws)
    rep = F.lit(1.0) - F.size(F.array_distinct(ws)) / nt
    gated = healthy.filter(
        (F.col("lang") == lang) & (nt >= min_tokens) & (rep <= max_rep)
    )
    funnel["after_health_gates"] = gated.count()

    # ---- PII scrub (still zero shuffle) ------------------------------
    scrubbed = gated.withColumn("text", scrub_pii_col("text"))

    # ---- exact dedup: first doc_id per body wins (groupBy-min + semi
    # join — the window-free shape the plan audit pins everywhere) ----
    firsts = (
        scrubbed.withColumn("_fp", F.md5("text"))
        .groupBy("_fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # persist: five downstream actions (funnel counts, packing agg,
    # shard + manifest writes) would otherwise re-execute the whole
    # gate->scrub->dedup lineage once each
    exact = scrubbed.join(firsts, "doc_id", "semi").persist()
    funnel["after_exact_dedup"] = exact.count()

    # ---- near-dup dedup, keep the LONGEST member ----------------------
    with_score = exact.withColumn("n_tok", F.size(ws).cast("long"))
    best = keep_best_in_groups(
        with_score.select("doc_id", "text", "n_tok"),
        score_col="n_tok",
        threshold=near_dup_threshold,
    )
    kept = with_score.join(
        best.filter("is_canonical").select("doc_id"), "doc_id", "semi"
    ).persist()
    funnel["after_near_dup"] = kept.count()

    # ---- decontamination vs the held-out eval slice -------------------
    grams = kept.select(
        "doc_id",
        F.explode(
            # guard: sequence(1, stop) DESCENDS for stop < 1
            F.when(
                nt >= 4,
                F.transform(
                    F.sequence(F.lit(1), nt - 3),
                    lambda i: F.array_join(F.slice(ws, i, 4), " "),
                ),
            ).otherwise(F.expr("array()").cast("array<string>"))
        ).alias("g"),
    )
    is_eval = F.col("doc_id") % eval_mod == 0
    eval_grams = grams.filter(is_eval).select("g").distinct()
    # no broadcast hint: the eval-slice gram set is O(corpus/eval_mod)
    # distinct strings — unbounded at the target scale; let AQE pick
    contaminated = (
        grams.filter(~is_eval)
        .join(eval_grams, "g", "semi")
        .select("doc_id")
        .distinct()
    )
    train = (
        kept.filter(~is_eval)
        .join(contaminated, "doc_id", "anti")
    ).persist()
    funnel["after_decontamination"] = train.count()

    # ---- optional DSIR stage: resample toward a target domain --------
    # (Xie et al. 2023 importance resampling; operators/sampling.
    # dsir_select). Keeps the curated target hosts themselves plus the
    # k candidates whose hashed-n-gram profile scores highest against
    # the target bucket distribution — the "make the crawl look like
    # the curated slice" step of a quality-targeted pretraining mix.
    if dsir_target_hosts and dsir_k:
        from news_combinator_spark.operators.sampling import dsir_select

        # eqNullSafe(True) coalesces the three-valued isin() to a
        # plain boolean: a NULL-host row is a non-target CANDIDATE
        # (scored like any other doc) instead of being silently
        # dropped from both sides of the semi-join (ADVICE r4).
        pred = F.col("host").isin(*dsir_target_hosts).eqNullSafe(True)
        targets = train.filter(pred).select("doc_id")
        n_targets = targets.count()
        if n_targets == 0:
            # without this a typo'd host list would silently shrink
            # the whole corpus to k docs scored against a degenerate
            # (empty-target) bucket distribution
            raise ValueError(
                f"dsir_target_hosts {dsir_target_hosts!r} matched no "
                "surviving docs (typo, or all dropped by earlier "
                "gates) — refusing to resample against an empty "
                "target distribution"
            )
        selected = dsir_select(train, pred, k=dsir_k).select("doc_id")
        resampled = train.join(
            selected.union(targets), "doc_id", "semi"
        ).persist()
        funnel["dsir_targets"] = n_targets
        funnel["after_dsir"] = resampled.count()
        train.unpersist()
        train = resampled

    # ---- packing + shards + manifest -----------------------------------
    packed = pack_sequences(
        train, budget=seq_budget, token_col="n_tok"
    )
    stats = packed.agg(
        F.sum("n_tok").alias("tokens"),
        (F.max("seq_id") + 1).alias("sequences"),
    ).collect()[0]
    result = {
        "funnel": funnel,
        "tokens": int(stats["tokens"] or 0),
        "sequences": int(stats["sequences"] or 0),
        "seq_budget": seq_budget,
    }

    if out:
        # train already carries n_tok; take only the placement cols
        export = train.join(packed.select(
            "doc_id", "seq_id", "seq_offset"), "doc_id")
        n_shards = write_training_shards(
            export.select(
                "doc_id", "url", "text", "n_tok", "seq_id", "seq_offset"
            ),
            f"{out}/shards",
            shard_records=shard_records,
            order_cols=["doc_id"],
        )
        manifest = shard_manifest(
            export.select("doc_id", "text", "n_tok"),
            shard_records=shard_records,
            order_cols=["doc_id"],
            token_col="n_tok",
            digest_cols=["text"],
        )
        manifest.write.mode("overwrite").parquet(f"{out}/manifest")
        result["shards"] = int(n_shards)
        result["out"] = out
    for frame in (exact, kept, train):
        frame.unpersist()
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="")
    ap.add_argument("--lang", default="en")
    ap.add_argument("--min-tokens", type=int, default=25)
    ap.add_argument("--max-rep", type=float, default=0.6)
    ap.add_argument("--eval-mod", type=int, default=20)
    ap.add_argument("--seq-budget", type=int, default=2048)
    ap.add_argument("--shard-records", type=int, default=1000)
    ap.add_argument("--threshold", type=float, default=0.8)
    ap.add_argument(
        "--dsir-hosts",
        default="",
        help="comma-separated target hosts: keep them + the "
        "--dsir-k candidates that best match their n-gram profile",
    )
    ap.add_argument("--dsir-k", type=int, default=0)
    args = ap.parse_args()

    spark = get_spark(app_name="nc-build-corpus")
    t0 = time.time()
    result = build(
        spark,
        args.sf_dir,
        out=args.out,
        lang=args.lang,
        min_tokens=args.min_tokens,
        max_rep=args.max_rep,
        eval_mod=args.eval_mod,
        seq_budget=args.seq_budget,
        shard_records=args.shard_records,
        near_dup_threshold=args.threshold,
        dsir_target_hosts=[
            h for h in args.dsir_hosts.split(",") if h
        ],
        dsir_k=args.dsir_k,
    )
    result["wall_sec"] = round(time.time() - t0, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
