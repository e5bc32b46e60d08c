"""spark-submit entry-point regression: the crawl job CLI end to end.

One subprocess run covers the flags a cluster submission composes:
robots bodies (rfc9309 mode) + crawl-delay budgets + checkpoint
output. The CLI is the north_rule's submission surface, so a broken
flag is a broken deployment even when every operator test passes.
"""

import json
import os
import subprocess
import sys

from conftest import SF_SMALL


def test_crawl_job_cli_end_to_end(spark, tmp_path):
    robots = spark.createDataFrame(
        [(
            "h1.test",
            "User-agent: *\nDisallow: /a/\nAllow: /a/20240106/\n"
            "Crawl-delay: 10\n",
        )],
        "host string, robots_txt string",
    )
    rp = str(tmp_path / "robots")
    robots.write.parquet(rp)
    out_dir = str(tmp_path / "out")

    proc = subprocess.run(
        [
            sys.executable, "scripts/run_crawl_job.py",
            "--sf-dir", SF_SMALL, "--rounds", "3", "--hosts", "4",
            "--budget", "3", "--seeds", "4", "--out", out_dir,
            "--robots", rp, "--robots-mode", "rfc9309",
            "--use-crawl-delays",
        ],
        capture_output=True,
        text=True,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=420,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, proc.stderr[-3000:]
    summary = json.loads(lines[-1])
    assert summary["rounds"] == 3
    assert summary["urls_fetched"] > 0
    assert len(summary["lineage"]) == 3
    # the robots gate actually fired on discovered candidates
    assert sum(m["robots_blocked"] for m in summary["lineage"]) > 0

    fetched = spark.read.parquet(os.path.join(out_dir, "fetched"))
    assert fetched.count() == summary["urls_fetched"]
    # rfc9309: h1's only surviving discoveries sit under the Allow
    h1 = fetched.filter(
        "host = 'h1.test' AND round > 0"
    ).toPandas()
    assert all("/a/20240106/" in u for u in h1.url)
    # checkpoints exist for every round boundary (resumability)
    assert os.path.isdir(os.path.join(out_dir, "ckpt"))
