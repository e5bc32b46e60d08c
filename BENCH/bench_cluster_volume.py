#!/usr/bin/env python
"""Cluster-merge scaling efficiency AS A FUNCTION OF VOLUME.

VERDICT r3 #7: the round-3 claim that cluster_merge's poor
small-corpus two-parallelism efficiency (0.46 at 20k docs) is
fixed-stage-overhead dilution — i.e. that the per-round barrier /
session-constant costs dominate at small N and amortize away as the
corpus grows — was an argument, not a measurement. This harness
measures it: the SAME cluster_documents job at two volumes
(20k and 10x = 200k docs) x two parallelism levels, interleaved
A/B/B/A per volume inside one process (the only timing protocol this
contended box supports — see BENCH/BASELINE.md).

efficiency(volume) = (docs_per_sec_hi / docs_per_sec_lo) / (hi/lo)

Expected shape if the claim holds: efficiency rises with volume.

Env: SCALE_CORES (default "2,8"), SCALE_REPS (default 2 -> A/B/B/A),
     CLUSTER_VOLUMES (default "20000,200000").
Output: ONE JSON line; commit to BENCH/scaling_r4_cluster_volume.json.
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


def run_cell(cores: int, n_docs: int) -> float:
    spark = get_spark(app_name=f"nc-clvol-{cores}-{n_docs}", cores=cores)
    try:
        bench.warmup(spark)
        sec, _n, _k = bench.bench_cluster(spark, n_docs=n_docs)
    finally:
        spark.stop()
    return sec


def main() -> None:
    cores = [int(c) for c in os.environ.get("SCALE_CORES", "2,8").split(",")]
    reps = int(os.environ.get("SCALE_REPS", "2"))
    volumes = [
        int(v)
        for v in os.environ.get("CLUSTER_VOLUMES", "20000,200000").split(",")
    ]
    assert len(cores) == 2
    lo, hi = min(cores), max(cores)
    factor = hi / lo

    out = {
        "metric": "cluster_merge_efficiency_vs_volume",
        "cores": cores,
        "reps": reps,
        "volumes": {},
        "timeline": [],
    }
    for n_docs in volumes:
        order: list[int] = []
        for r in range(reps):
            order.extend(cores if r % 2 == 0 else cores[::-1])
        best: dict[int, float] = {}
        for c in order:
            t0 = time.time()
            sec = run_cell(c, n_docs)
            out["timeline"].append(
                {"n_docs": n_docs, "cores": c,
                 "at": round(t0, 1), "sec": round(sec, 2)}
            )
            best[c] = min(best.get(c, sec), sec)
            print(
                f"# volume={n_docs} cores={c}: {sec:.1f}s",
                file=sys.stderr, flush=True,
            )
        speedup = best[lo] / best[hi]
        out["volumes"][str(n_docs)] = {
            f"sec_c{lo}": round(best[lo], 3),
            f"sec_c{hi}": round(best[hi], 3),
            f"docs_per_sec_c{hi}": round(n_docs / best[hi], 1),
            "speedup": round(speedup, 3),
            "efficiency": round(speedup / factor, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
