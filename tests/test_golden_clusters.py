"""End-to-end parity vs the reference's committed cluster outputs.

The reference ships its real production results: result/<date>/<seed
newsId>/<member newsId>.json — the de-facto golden outputs of the
whole v1 pipeline (SURVEY.md §5), produced by the cross-source greedy
in chnsegmt/categorize.py:40-68 with jieba's FULL dictionary and
idf.txt (both missing large blobs in this checkout).

`test_golden_corpus_agreement` runs the engine's
cluster_documents_v1_sources over the exact same 893 documents in a
subprocess (the segmentation dictionary must be configured before the
JVM launches; the shared pytest session is already up) and scores
pairwise same-cluster agreement. With the committed SMALL dictionary
and the dict-frequency idf proxy the floor is pinned at F1 >= 0.90
(measured 0.911; dates 20140301/20140305/20140312/20140314 reproduce
the reference's grouping exactly). Residual disagreement is
vocabulary (small vs full dict, proxy vs real idf) plus the
reference's own unordered Py2 Set iteration, not algorithm.
"""

import json
import os
import subprocess
import sys
from collections import defaultdict
from itertools import combinations

import pytest

from news_combinator_spark.operators.clustering import (
    cluster_documents_v1_sources,
)

RESULT = "/root/reference/result"
DICT = (
    "/root/reference/reconstruction/category/dict/extra_dict/"
    "jieba.dict.small.utf8"
)
HMM = "/root/reference/reconstruction/category/dict/hmm_model.utf8"
STOP = "/root/reference/reconstruction/category/dict/stop_words.utf8"
ORDER = ["tencent", "netease", "sina"]  # tencent and netease seed,
# sina never does — inferred from the goldens: every cluster head is
# tencent or netease, and netease heads only ever match sina members.


def _load_golden():
    """(docs, golden_pairs): docs[date][newsId] = (source, passage);
    pairs are frozenset couples of newsIds sharing a cluster dir."""
    docs: dict = defaultdict(dict)
    pairs: set = set()
    for date in sorted(os.listdir(RESULT)):
        droot = os.path.join(RESULT, date)
        if not os.path.isdir(droot):
            continue
        for cdir in sorted(os.listdir(droot)):
            members = []
            cpath = os.path.join(droot, cdir)
            if not os.path.isdir(cpath):
                continue
            for fn in sorted(os.listdir(cpath)):
                if not fn.endswith(".json"):
                    continue
                j = json.load(open(os.path.join(cpath, fn), encoding="utf-8"))
                nid = j["newsId"]
                members.append(nid)
                docs[date].setdefault(
                    nid, (j.get("source", "?"), j["contents"]["passage"])
                )
            for a, b in combinations(sorted(set(members)), 2):
                pairs.add((date, a, b))
    return docs, pairs


def test_cross_source_greedy_semantics(spark):
    """Synthetic pin of the categorize.py loop shape: one match per
    later source, matched docs consumed from their pool, singleton
    seeds silent, last source never seeds."""
    mk = "alpha beta gamma delta epsilon zeta "
    rows = [
        # s0 doc 1 matches s1 doc 10 and s2 doc 20
        (1, "t", "d1", mk * 3),
        (10, "n", "d1", mk * 3 + "extra1 filler1"),
        (20, "s", "d1", mk * 3 + "extra2 filler2"),
        # s0 doc 2: no match anywhere (disjoint vocab)
        (2, "t", "d1", "omega1 omega2 omega3 omega4 omega5 omega6 " * 3),
        # s1 doc 11 matches s2 doc 21; doc 20 is already consumed
        (11, "n", "d1", "kappa iota theta mu nu xi " * 3),
        (21, "s", "d1", "kappa iota theta mu nu xi " * 3 + "pad1 pad2"),
        # s2 doc 22 never seeds (last source)
        (22, "s", "d1", "rho sigma tau phi chi psi " * 3),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, day_time string, text string"
    )
    out = {
        r["seed_id"]: (list(r["member_ids"]), list(r["source_list"]))
        for r in cluster_documents_v1_sources(
            docs, ["t", "n", "s"], day_col="day_time"
        ).collect()
    }
    assert out == {
        1: ([1, 10, 20], ["t", "n", "s"]),
        11: ([11, 21], ["n", "s"]),
    }


@pytest.mark.skipif(
    not (os.path.isdir(RESULT) and os.path.exists(DICT)),
    reason="reference goldens or dictionary absent",
)
def test_golden_corpus_agreement(tmp_path):
    """The headline parity run: all 13 golden dates through the Spark
    operator in dictionary mode, scored against the committed dirs."""
    script = tmp_path / "golden_run.py"
    script.write_text(
        f"""
import json, sys
from collections import defaultdict
from itertools import combinations
from news_combinator_spark.functions import chnseg
chnseg.configure_dictionary({DICT!r}, {HMM!r})

from news_combinator_spark.session import get_spark
from news_combinator_spark.functions.chnseg import MixSegmenter, load_stop_words
from news_combinator_spark.operators.clustering import (
    cluster_documents_v1_sources,
)
sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
from test_golden_clusters import ORDER, _load_golden

docs, golden = _load_golden()
seg = MixSegmenter({DICT!r}, {HMM!r})
idf = seg.idf_proxy()
stop = frozenset(load_stop_words({STOP!r}))

spark = get_spark(cores=8)
rows, ids = [], {{}}
for date, dd in docs.items():
    for nid, (src, passage) in dd.items():
        doc_id = len(ids)
        ids[doc_id] = (date, nid)
        rows.append((doc_id, src, date, passage))
df = spark.createDataFrame(
    rows, "doc_id long, source string, day_time string, text string"
)
pred = set()
out = cluster_documents_v1_sources(
    df, ORDER, idf=idf, stopwords=stop
).collect()
for r in out:
    named = sorted(ids[m][1] for m in r["member_ids"])
    day = r["day"]
    for a, b in combinations(named, 2):
        pred.add((day, a, b))
tp = len(pred & golden); fp = len(pred - golden); fn = len(golden - pred)
p = tp / (tp + fp); rc = tp / (tp + fn)
print(json.dumps({{"tp": tp, "fp": fp, "fn": fn,
                   "f1": 2 * p * rc / (p + rc)}}))
spark.stop()
"""
    )
    proc = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True, text=True, timeout=900,
        cwd="/root/repo",
        env={**os.environ, "PYTHONPATH": "/root/repo"},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    # measured 0.911 over 571 golden pairs; floor leaves noise room
    assert stats["tp"] + stats["fn"] == 571  # golden pair count pinned
    p = stats["tp"] / (stats["tp"] + stats["fp"])
    r = stats["tp"] / (stats["tp"] + stats["fn"])
    assert stats["f1"] >= 0.90, stats
    assert p >= 0.85 and r >= 0.90, stats
