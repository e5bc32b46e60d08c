#!/usr/bin/env python
"""cluster_merge efficiency vs volume (VERDICT r3 #7).

Round 2/3 measured cluster_merge two-parallelism efficiency ~0.46 at
20k docs and ARGUED that the number is a small-N artifact: the
clustering pipeline has a fixed per-stage barrier cost (LSH band
shuffle, CC iterations, greedy relabel) that dominates at 20k docs, so
extra cores mostly idle; at real volume the per-doc work dominates and
parallelism pays. This script turns the argument into a measurement:
the SAME cluster_documents job at 1x (20k) and 10x (200k) docs, each
at two core counts, alternated A/B/B/A inside one process (the only
timing protocol this contended box supports — see BASELINE.md), and
reports efficiency(cores_lo -> cores_hi) per volume.

Expected shape: efficiency rises with volume. On a 1000-executor
cluster the same logic applies per-stage: barrier count is constant in
data size (fixed LSH bands, ~log CC rounds), so the parallel fraction
grows with rows/core.

Env: SCALE_CORES (default "2,8"), CLUSTER_VOLUMES (default
"20000,200000"), SCALE_REPS (default 2 -> A/B/B/A per volume).
Output: ONE JSON line; also written to BENCH/cluster_scaling_r4.json
by the caller (redirect).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from news_combinator_spark.session import get_spark  # noqa: E402


def run_cell(cores: int, n_docs: int, docs_cache: dict) -> float:
    spark = get_spark(app_name=f"nc-cluster-scale-{cores}", cores=cores)
    try:
        bench.warmup(spark)
        sec, _n, _c = bench.bench_cluster(spark, n_docs=n_docs)
    finally:
        spark.stop()
    return sec


def main() -> None:
    cores = [int(c) for c in os.environ.get("SCALE_CORES", "2,8").split(",")]
    volumes = [
        int(v)
        for v in os.environ.get("CLUSTER_VOLUMES", "20000,200000").split(",")
    ]
    reps = int(os.environ.get("SCALE_REPS", "2"))
    assert len(cores) == 2

    result: dict = {
        "metric": "cluster_merge efficiency vs volume (A/B/B/A, min/cell)",
        "cores": cores,
        "volumes": volumes,
        "cells": {},
        "timeline": [],
    }
    for n_docs in volumes:
        order: list[int] = []
        for r in range(reps):
            order.extend(cores if r % 2 == 0 else cores[::-1])
        best: dict[int, float] = {}
        for c in order:
            sec = run_cell(c, n_docs, {})
            result["timeline"].append(
                {"n_docs": n_docs, "cores": c, "sec": round(sec, 2)}
            )
            print(
                f"# n_docs={n_docs} cores={c}: {sec:.1f}s",
                file=sys.stderr,
                flush=True,
            )
            best[c] = min(best.get(c, sec), sec)
        lo, hi = cores
        speedup = best[lo] / best[hi]
        eff = speedup / (hi / lo)
        result["cells"][str(n_docs)] = {
            f"sec_{lo}c": round(best[lo], 2),
            f"sec_{hi}c": round(best[hi], 2),
            "speedup": round(speedup, 3),
            "efficiency": round(eff, 3),
            "docs_per_sec_hi": round(n_docs / best[hi], 1),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
