"""POS-tag filtering for passage tags (SURVEY.md F12).

Re-expresses the reference's GetPassageTags
(chnsegmt/getabstract.py:86-112) with its attr dict
(chnsegmt/user_dicts/elmnattrdict.txt): every (word, flag) pair from
the POS tagger is checked against the dict — the EXACT flag first,
then the wildcard ``flag[0] + '*'``, and a flag seen by neither is
counted by default (the reference prints a warning and counts it).
A word whose first occurrence carries a filtered flag is NOT entered,
but a later occurrence with an allowed flag admits it at count 1
(earlier occurrences lost) — faithful to the reference loop, which
re-evaluates the flag until the word is in the dict.

Ranking: the reference sorts with a Python-2 cmp ``lambda x,y:
x[1]>y[1]`` (a bool, never -1 — an unspecified order for ties) and
keeps the top ``max(1, round(len*keys_factor))``. As with
computeWeight (operators/summarize.py), the engine implements the
evident intent with a deterministic tie-break: (count desc, word asc).

jieba.posseg is NOT installable in this container (no network; see
the F11 note in COVERAGE.md), so `pos_tag` is a deterministic
heuristic fallback good enough to exercise the filter machinery;
`passage_tags` accepts any caller-supplied (word, flag) stream, e.g.
a real jieba.posseg pass on a cluster where it is pinned.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame

# chnsegmt/user_dicts/elmnattrdict.txt, verbatim semantics: 1 = count
# the word as a tag candidate, 0 = filter it. Flag classes are ICTCLAS
# / jieba POS tags: n* nouns, v* verbs, a* adjectives ... r* pronouns,
# m* numerals, p* prepositions, u* particles, w* punctuation etc.
DEFAULT_ELMN_ATTRS = {
    "n*": 1, "t*": 1, "s*": 1, "f*": 1, "v*": 1, "a*": 1, "b*": 1,
    "z*": 1, "d*": 1, "o*": 1, "h*": 1, "k*": 1, "l*": 1,
    "x*": 0, "r*": 0, "m*": 0, "q*": 0, "p*": 0, "c*": 0, "u*": 0,
    "e*": 0, "y*": 0, "w*": 0, "i*": 0,
    # exact-flag overrides beat the v* wildcard
    "vshi": 0, "vyou": 0,
}

_NUM_RE = re.compile(r"^[0-9]+$")
_PUNCT_RE = re.compile(r"^[^\w]+$", re.UNICODE)
# tiny closed-class lists for the heuristic fallback tagger
_PRONOUNS = frozenset(
    "i you he she it we they me him her us them this that these those "
    "我 你 他 她 它 我们 你们 他们".split()
)
_FUNCTION_WORDS = frozenset(
    "the a an of and or to in on at by for with from as is are was "
    "were be been 的 了 着 是 在 和 与 或".split()
)


_CJK_CHAR_RE = re.compile(r"[一-鿿]")


def pos_tag(tokens: Iterable[str]) -> list[tuple[str, str]]:
    """Deterministic POS tagger. With a dictionary segmenter
    configured (functions/chnseg.py), dictionary words take their
    dictionary tag — PosTagger.hpp:41-66 semantics. Out-of-vocabulary
    CJK words get a REAL tag from the reference's committed
    jieba.posseg Viterbi model when one is configured
    (functions/posseg.configure_pos_model over
    reconstruction/category/dict/pos_dict), falling back to
    PosTagger.hpp's 'x' when it is not. Non-CJK tokens (and
    everything in the unconfigured default mode) use the heuristic
    stand-in: numerals -> 'm', punctuation -> 'w', pronouns -> 'r',
    function words -> 'u', everything else -> 'n'. Crude, but
    exercises every branch of the attr-dict filter
    deterministically."""
    from .chnseg import get_segmenter
    from .posseg import get_pos_model

    seg = get_segmenter()
    posm = get_pos_model()
    out = []
    for t in tokens:
        if seg is not None:
            dict_tag = seg.tags.get(t)
            if dict_tag is not None:
                out.append((t, dict_tag))
                continue
            if _CJK_CHAR_RE.search(t):
                out.append((t, posm.tag_word(t) if posm else "x"))
                continue
        if _NUM_RE.match(t):
            flag = "m"
        elif _PUNCT_RE.match(t):
            flag = "w"
        elif t.lower() in _PRONOUNS:
            flag = "r"
        elif t.lower() in _FUNCTION_WORDS:
            flag = "u"
        else:
            flag = "n"
        out.append((t, flag))
    return out


def passage_tags(
    tagged: Iterable[tuple[str, str]],
    attr_dict: dict[str, int] | None = None,
    keys_factor: float = 1.0,
) -> list[str]:
    """GetPassageTags semantics over a (word, flag) stream: POS-filter
    on first sight, count every occurrence once admitted, rank by
    (count desc, word asc), truncate to max(1, round(len * keys_factor))
    (the reference's keys-factor truncation, W6)."""
    attrs = DEFAULT_ELMN_ATTRS if attr_dict is None else attr_dict
    tags: dict[str, int] = {}
    for word, flag in tagged:
        if word in tags:
            tags[word] += 1
            continue
        if flag in attrs:
            if attrs[flag] != 0:
                tags[word] = 1
        elif flag[:1] + "*" in attrs:
            if attrs[flag[:1] + "*"] != 0:
                tags[word] = 1
        else:
            # unseen attr: the reference warns and counts it
            tags[word] = 1
    if not tags:
        return []
    ranked = sorted(tags.items(), key=lambda kv: (-kv[1], kv[0]))
    keep = max(1, int(round(len(ranked) * keys_factor)))
    return [w for w, _ in ranked[:keep]]


def doc_pos_tags(
    docs: DataFrame,
    text_col: str = "text",
    attr_dict: dict[str, int] | None = None,
    keys_factor: float = 1.0,
) -> DataFrame:
    """(doc_id, tags array<string>): the POS-filtered tag list per
    document, Arrow-batched (the tagger + filter run per row inside
    mapInPandas — same parallel unit as the reference daemon).
    Driver-side segmenter/pos-model config is snapshotted into the
    closure so executor workers (which don't see env vars set after
    they spawn) build the same tagger."""
    from . import chnseg, posseg
    from .textfns import tokenize

    seg_cfg = chnseg.snapshot_config()
    pos_cfg = posseg.snapshot_config()

    def _tags(batches):
        chnseg.apply_config(seg_cfg)
        posseg.apply_config(pos_cfg)
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "tags": pdf[text_col].map(
                        lambda t: passage_tags(
                            pos_tag(tokenize(t or "")),
                            attr_dict=attr_dict,
                            keys_factor=keys_factor,
                        )
                    ),
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(
        _tags, schema="doc_id long, tags array<string>"
    )
