#!/usr/bin/env python
"""Alternating same-process two-parallelism scaling protocol.

The sandbox shows 2-10x throughput swings from invisible host-neighbor
contention, so legs run HOURS apart (one full bench.py per core count)
can land in different contention regimes and produce meaningless
cross-leg ratios — round 1 and round 2 both caught contaminated passes
this way. This harness tightens the comparison to the only form of
timing this box supports (see BASELINE.md): the two core counts
ALTERNATE inside one Python process, minutes apart, in an A/B/B/A
order that cancels linear drift, and each (phase, cores) cell takes
the MIN across reps — the closest available approximation of
"same conditions, different parallelism".

Phases measured are the two that carry the north_rule argument:
  - round_dataplane: the at-scale-dominant shuffle+Arrow data plane
    (schedule -> fetch join -> extract -> canonicalize -> anti-join)
  - kernel_sketch:   the pure-CPU per-doc sketch kernel

Per cell, the phase runs twice inside its session (bench.py's
min-of-2 warm-run rule). Sessions are recreated per cell via
SparkSession stop/rebuild so `local[N]` and shuffle.partitions=N
change while everything else (JVM, page cache, process) stays put.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SCALE_CORES (default "2,8" — the honest N->4N pair on this box,
     see BASELINE.md for why 8->32 hits single-box ceilings),
     SCALE_REPS (default 2 -> A/B/B/A).
Output: ONE JSON line with per-cell seconds, speedup and efficiency.
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


def run_cell(
    cores: int, sf_dir: str, phases: set[str]
) -> dict[str, float]:
    spark = get_spark(app_name=f"nc-scaling-{cores}", cores=cores)
    out: dict[str, float] = {}
    try:
        bench.warmup(spark)
        if "dataplane" in phases:
            out["round_dataplane"] = min(
                bench.bench_round_dataplane(spark, sf_dir)[0],
                bench.bench_round_dataplane(spark, sf_dir)[0],
            )
        if "kernel" in phases:
            out["kernel_sketch"] = min(
                bench.bench_kernel_sketch(spark)[0],
                bench.bench_kernel_sketch(spark)[0],
            )
    finally:
        spark.stop()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = [
        int(c) for c in os.environ.get("SCALE_CORES", "2,8").split(",")
    ]
    reps = int(os.environ.get("SCALE_REPS", "2"))
    phases = set(
        os.environ.get("SCALE_PHASES", "dataplane,kernel").split(",")
    )
    assert len(cores) == 2, "protocol compares exactly two core counts"

    # A/B/B/A (palindrome) ordering cancels linear contention drift
    order: list[int] = []
    for r in range(reps):
        order.extend(cores if r % 2 == 0 else cores[::-1])

    cells: dict[int, dict[str, float]] = {c: {} for c in cores}
    timeline = []
    for c in order:
        t0 = time.time()
        res = run_cell(c, sf_dir, phases)
        timeline.append(
            {"cores": c, "at": round(t0, 1), **{k: round(v, 2) for k, v in res.items()}}
        )
        for phase, sec in res.items():
            prev = cells[c].get(phase)
            cells[c][phase] = sec if prev is None else min(prev, sec)
        print(
            f"# cell cores={c}: "
            + ", ".join(f"{k}={v:.1f}s" for k, v in res.items()),
            file=sys.stderr,
            flush=True,
        )

    lo, hi = min(cores), max(cores)
    factor = hi / lo
    out = {
        "metric": "scaling_efficiency",
        "sf_dir": sf_dir,
        "cores": cores,
        "reps": reps,
        "order": order,
        "phases": {},
        "timeline": timeline,
    }
    for phase in cells[lo]:
        t_lo, t_hi = cells[lo][phase], cells[hi][phase]
        speedup = t_lo / t_hi
        out["phases"][phase] = {
            f"sec_c{lo}": round(t_lo, 3),
            f"sec_c{hi}": round(t_hi, 3),
            "speedup": round(speedup, 3),
            "efficiency": round(speedup / factor, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
