"""Extractive summarization (the comment-abstract service + v1 abstract).

Re-expresses SURVEY.md W2/W3:

- v2 (abstraction_service.cpp:162-213): split text into sentences on
  the 8 delimiters | . 。 ! ！ ? ？ \\n applied sequentially, delimiter
  dropped (split_contents :216-244 — an empty segment produced by one
  delimiter is silently dropped by the next delimiter's pass, so only
  empties from the last delimiter '\\n' survive; replicated); top-10 tags
  over the whole text; per-sentence weight = sum of each DISTINCT
  matched tag's weight; take the top floor(0.15*n) sentences by weight
  (all when that floor is 0), restore document order, join with '|'
  (trailing '|' kept, :208-212).

  NOTE the reference's computeWeight (:246-261) tests
  ``used_words.find(w) != end`` against an initially-empty set, so it
  always returns 0.0 and the selection degenerates to std::sort's
  unspecified tie order. That is not reproducible semantics; the
  engine implements the evident intent (each distinct tag counted
  once) with a deterministic (weight desc, index asc) tie-break, and
  this file documents the divergence.

- v1 (chnsegmt/getabstract.py:32-54): sentence weight += 1/len(words)
  per tag hit (repeats count); threshold = weight at index
  min(round(n*factor), n-1) of the desc-sorted list; keep sentences
  with weight > 0 and weight > threshold, document order.

Spark-side: one row per document, sentence logic inside an Arrow
mapInPandas batch kernel (sentence counts per doc are tiny; the
parallel unit is the document, exactly like the reference daemon
handling one payload per request).
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.textfns import tokenize

V2_DELIMS = ["|", ".", "。", "!", "！", "?", "？", "\n"]


def split_sentences_v2(text: str) -> list[str]:
    """Sequential per-delimiter splitting, delimiter dropped, interior
    empties kept, no trailing empty (split_contents :216-244)."""
    segments = [text]
    for d in V2_DELIMS:
        out: list[str] = []
        for seg in segments:
            j = 0
            n = len(seg)
            while j < n:
                pos = seg.find(d, j)
                if pos != -1:
                    out.append(seg[j:pos])
                    j = pos + len(d)
                else:
                    out.append(seg[j:])
                    break
        segments = out
    return segments


def top_tags_by_count(text: str, k: int = 10) -> dict[str, float]:
    """Tag -> weight for the summarizer; weight = raw term frequency
    (the engine's deterministic stand-in for the idf-file-pinned
    KeywordExtractor weights). Integer-valued on purpose: within one
    document any positive monotone transform of tf ranks sentences
    identically, and integer-valued weights make the per-sentence sums
    exactly representable, so the selection is bit-stable across
    engines/summation orders (the SQL oracle ranks by the same integer
    sums — a tf/total float share could flip ties by summation-order
    ulps)."""
    toks = [t for t in tokenize(text) if len(t) > 1]
    counts = Counter(toks)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {w: float(c) for w, c in ranked}


def abstract_v2(text: str, keyword_num: int = 10) -> str:
    sentences = split_sentences_v2(text)
    if not sentences:
        return ""
    weights = top_tags_by_count(text, keyword_num)
    scored = []
    for idx, s in enumerate(sentences):
        seen: set[str] = set()
        w = 0.0
        for tok in tokenize(s):
            if tok in weights and tok not in seen:
                seen.add(tok)
                w += weights[tok]
        scored.append((idx, w))
    req = int(len(scored) * 0.15)
    if req == 0:
        req = len(scored)
    chosen = sorted(scored, key=lambda p: (-p[1], p[0]))[:req]
    chosen.sort(key=lambda p: p[0])
    return "".join(sentences[i] + "|" for i, _ in chosen)


def abstract_v1(
    text: str,
    tags: list[str],
    sentences_factor: float = 0.8,
    join_character: str = "",
) -> str:
    """v1 GetAbstract semantics (getabstract.py:32-54), including the
    leading join_character from the ans=[''] seed."""
    sentences = [s for s in split_sentences_v2(text)]
    if not sentences:
        return ""
    tag_set = set(tags)
    weights = []
    for s in sentences:
        words = tokenize(s)
        w = sum(1.0 / len(words) for t in words if t in tag_set) if words else 0.0
        weights.append(w)
    desc = sorted(weights, reverse=True)
    thresh_index = int(min(round(len(sentences) * sentences_factor),
                           len(sentences) - 1))
    if thresh_index < 0 or thresh_index >= len(desc):
        return ""
    thresh = desc[thresh_index]
    ans = [""]
    for s, w in zip(sentences, weights):
        if w > 0 and w > thresh:
            ans.append(s)
    return join_character.join(ans)


def add_abstract_column(
    df: DataFrame, text_col: str = "content", out_col: str = "abstract"
) -> DataFrame:
    """Arrow-batched v2 abstract per row."""
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )

    def _abs(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[text_col].map(lambda t: abstract_v2(t or ""))
            yield pdf

    return df.mapInPandas(_abs, schema=f"{fields}, {out_col} string")
