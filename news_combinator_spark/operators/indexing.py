"""Inverted-index construction and conjunctive term search.

The reference serves its news index by date + id lookups (SURVEY
§2.5: index.php date-range pages, entry_lookup); a web-scale corpus
additionally wants TERM access — "which documents contain these
words" — both as a serving primitive and as the backbone of
decontamination / boilerplate audits ("every doc containing this
benchmark sentence"). Two operators:

- term_postings:      the classic inverted index — one row per term
                      with document frequency, total term frequency,
                      and the sorted posting list.
- conjunctive_search: multi-term AND retrieval over the corpus with
                      a term-frequency score, the query-time
                      counterpart (count-distinct-terms == n_terms,
                      the standard relational encoding of postings
                      intersection).

Scale shape: both are two map-side-combined aggregations — tokens
collapse to (term, doc, tf) within partitions before the first
shuffle, then a per-term (or per-doc) agg. The posting LIST is the
one genuinely size-unbounded output (a stopword's list is the corpus
row count), so `max_df` drops saturated terms before collect — the
standard stopword cut that keeps every materialized list
O(max_df). Search never materializes lists at all; it stays in the
aggregate domain.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "term_doc_tf",
    "term_postings",
    "conjunctive_search",
    "bm25_search",
    "term_positions",
    "phrase_search",
    "merge_postings",
]


def term_doc_tf(
    df: DataFrame, text_col: str = "text", doc_col: str = "doc_id"
) -> DataFrame:
    """(term, doc, tf): lowercase whitespace tokens counted per
    document — the shared first aggregation of indexing and search.
    The explode never materializes globally: partial aggregation
    collapses within-partition repeats before the (term, doc)
    shuffle."""
    return (
        df.select(
            F.col(doc_col).alias("doc"),
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("term", "doc")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def term_postings(
    df: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Inverted index: (term, n_docs, total_tf, postings) where
    postings is the comma-joined ascending doc-id list.

    ``min_df`` prunes hapax noise; ``max_df`` is the scale guard —
    terms in more than ``max_df`` documents are dropped BEFORE their
    posting list is collected (a stopword's list is otherwise the
    size of the corpus). The df/tf pre-aggregate still covers every
    term, so the cut costs one extra lightweight agg, not a rescan.
    The posting string is deterministic (sorted ids, fixed
    separator), so the whole index is hash-checkable cross-engine.

    STRING doc ids are percent-escaped ('%' -> '%25', ',' -> '%2C')
    before they enter the comma-joined list, so an id containing the
    separator (URLs are a natural doc id) round-trips through
    ``merge_postings`` instead of being silently split into bogus
    postings. Sorting happens on the ESCAPED form on both the build
    and the merge path, so merge(index(A), B) == term_postings(A+B)
    holds for arbitrary ids; numeric ids are unaffected.
    """
    per = term_doc_tf(df, text_col, doc_col)
    doc_v = F.col("doc")
    if not isinstance(df.schema[doc_col].dataType, T.NumericType):
        # NOTE: this escape convention is part of the stored-index
        # format. merge_postings assumes BOTH sides use it; an index
        # persisted by a pre-escaping build must be rebuilt (or its
        # ids re-escaped) before merging, or the same raw id can
        # appear under two spellings. split_posting_ids() is the
        # read-side inverse.
        doc_v = F.regexp_replace(
            F.regexp_replace(doc_v.cast("string"), "%", "%25"), ",", "%2C"
        )
    agg = per.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tf").alias("total_tf"),
        F.array_join(
            F.sort_array(F.collect_list(doc_v)), ","
        ).alias("postings"),
    )
    out = agg.filter(F.col("n_docs") >= min_df)
    if max_df is not None:
        out = out.filter(F.col("n_docs") <= max_df)
    return out


def split_posting_ids(postings_col) -> "F.Column":
    """Read-side inverse of the posting-list escape convention: split
    the comma-joined list and percent-UNescape each id ('%2C' -> ',',
    then '%25' -> '%' — the reverse application order of the build
    side). Numeric-id postings contain neither sequence, so this is a
    plain split for them."""
    return F.transform(
        F.split(postings_col, ","),
        lambda x: F.regexp_replace(
            F.regexp_replace(x, "%2C", ","), "%25", "%"
        ),
    )


def conjunctive_search(
    df: DataFrame,
    terms: Sequence[str],
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Documents containing ALL of ``terms``: (doc, score) where
    score is the summed term frequency of the query terms — the
    relational postings intersection (count distinct matched terms ==
    len(terms)) with a tf ranking signal.

    The term filter is pushed below the tokenize-aggregate, so only
    matching tokens ever reach a shuffle; the per-doc agg is map-side
    combined and the result is at most |docs matching rarest term|.
    Duplicate query terms are collapsed (a conjunction of a term with
    itself is the term) — otherwise countDistinct could never reach
    the raw term count and every result would be rejected.
    """
    want = list(dict.fromkeys(t.lower() for t in terms))
    per = term_doc_tf(df, text_col, doc_col).filter(
        F.col("term").isin(want)
    )
    return (
        per.groupBy("doc")
        .agg(
            F.countDistinct("term").alias("n_hit"),
            F.sum("tf").alias("score"),
        )
        .filter(F.col("n_hit") == len(want))
        .select("doc", "score")
    )


def bm25_search(
    df: DataFrame,
    terms: Sequence[str],
    text_col: str = "text",
    doc_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Disjunctive (OR) retrieval ranked by Okapi BM25: (doc, n_hit,
    score) for every document matching AT LEAST ONE query term.

    Per matched (term, doc):

        idf  = ln((N - df + 0.5) / (df + 0.5) + 1)          [Lucene's
               always-positive variant of the Robertson idf]
        part = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    where N = corpus document count, df = documents containing the
    term, dl = document token length, avgdl = mean token length —
    all derived from the same (term, doc, tf) aggregate the index is
    built from, so ranking needs NO second tokenization pass.

    Scale shape: corpus stats (N, avgdl) reduce to one broadcast
    scalar row; per-term df is an aggregate over the query terms'
    postings only (the isin filter sits below the shuffle, same as
    conjunctive_search); the scoring join touches |docs matching any
    query term| rows. Scores are rounded to 6 decimals so the ranking
    is reproducible cross-engine in IEEE double.
    """
    want = [t.lower() for t in terms]
    per_all = term_doc_tf(df, text_col, doc_col)

    doclen = per_all.groupBy("doc").agg(F.sum("tf").alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    hits = per_all.filter(F.col("term").isin(want))
    dfreq = hits.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )

    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(doclen, "doc")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
    )
    return scored.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_hit"),
        F.round(F.sum("part"), 6).alias("score"),
    )


def term_positions(
    df: DataFrame, text_col: str = "text", doc_col: str = "doc_id"
) -> DataFrame:
    """(term, doc, pos): zero-based token offsets — the positional
    layer of the inverted index (what phrase and proximity queries
    consume). posexplode keeps the offset assignment inside the JVM
    row pipeline; no shuffle until the consumer aggregates."""
    return df.select(
        F.col(doc_col).alias("doc"),
        F.posexplode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("pos", "term"),
    ).filter(F.col("term") != "")


def phrase_search(
    df: DataFrame,
    phrase: Sequence[str],
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Exact-phrase retrieval: (doc, n_occurrences) for documents
    containing the tokens of ``phrase`` consecutively, resolved as
    the standard positional-postings merge — the position lists of
    term_i and term_{i+1} equi-join on (doc, pos + 1).

    Scale shape: the per-term position frames are filtered to the
    query terms BEFORE any shuffle (rare-term selectivity applies to
    every join input), materialized once so the k per-term branches
    share one corpus scan, each join key is (doc, pos) — uniformly
    distributed, no skew — and the final count is one map-side-
    combined groupBy. A k-word phrase costs k-1 equi-joins over
    postings-sized frames, never a rescan of the corpus.
    """
    want = [t.lower() for t in phrase]
    if not want:
        raise ValueError("phrase must have at least one term")
    # materialize the query terms' positions ONCE: each per-term
    # branch below is otherwise an independent full corpus scan +
    # tokenization (k scans for a k-word phrase)
    hits = (
        term_positions(df, text_col, doc_col)
        .filter(F.col("term").isin(list(set(want))))
        .localCheckpoint()
    )
    cur = (
        hits.filter(F.col("term") == want[0])
        .select("doc", F.col("pos").alias("p0"))
    )
    for i, t in enumerate(want[1:], start=1):
        nxt = hits.filter(F.col("term") == t).select(
            "doc", (F.col("pos") - i).alias("p0")
        )
        cur = cur.join(nxt, ["doc", "p0"])
    return cur.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )


def merge_postings(
    index: DataFrame,
    delta: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Incrementally fold a batch of NEW documents into an existing
    inverted index without re-tokenizing the corpus: the delta's own
    postings (term_postings over just the new docs) full-outer-merge
    with the old index per term — df and tf add, posting lists merge
    numerically sorted. The defining property, and what the oracle
    hash-checks: ``merge_postings(index(A), B) == term_postings(A+B)``
    whenever the doc-id sets are disjoint.

    ``min_df``/``max_df`` apply to the MERGED counts (pass the index
    in unfiltered, cut at read time — a term dropped from the stored
    index below min_df would lose its count forever). Per-round cost
    is O(delta tokens) + one term-keyed merge join against the index,
    never a corpus rescan — the same rolling-corpus discipline as
    dedup.delta_admit.
    """
    d = term_postings(delta, text_col, doc_col, min_df=1)

    # term_postings sorts posting lists by the doc column's NATIVE
    # type (collect_list keeps the type; sort_array orders by it). The
    # merge must order the SAME way or the merge(index(A),B) ==
    # term_postings(A+B) invariant breaks: numeric doc ids sort
    # numerically, string ids lexicographically — and a blind
    # cast('long') crashes under ANSI on non-numeric ids. Key off the
    # delta's doc column type (the index side must come from the same
    # corpus schema; a type mismatch between the two is a caller bug).
    # String postings hold percent-ESCAPED ids (see term_postings), so
    # splitting on ',' is lossless and sorting the escaped strings
    # reproduces the build-side order exactly.
    numeric_ids = isinstance(
        delta.schema[doc_col].dataType, T.NumericType
    )

    def _ids(col: str):
        arr = F.split(F.col(col), ",")
        if numeric_ids:
            return F.transform(arr, lambda x: x.cast("long"))
        return arr

    merged = (
        index.select(
            "term",
            F.col("n_docs").alias("n0"),
            F.col("total_tf").alias("t0"),
            F.col("postings").alias("p0"),
        )
        .join(
            d.select(
                "term",
                F.col("n_docs").alias("n1"),
                F.col("total_tf").alias("t1"),
                F.col("postings").alias("p1"),
            ),
            "term",
            "full_outer",
        )
        .select(
            "term",
            (
                F.coalesce("n0", F.lit(0)) + F.coalesce("n1", F.lit(0))
            ).alias("n_docs"),
            (
                F.coalesce("t0", F.lit(0)) + F.coalesce("t1", F.lit(0))
            ).alias("total_tf"),
            F.array_join(
                F.sort_array(
                    F.concat(
                        F.coalesce(
                            _ids("p0"),
                            F.expr("array()").cast(
                                "array<long>"
                                if numeric_ids
                                else "array<string>"
                            ),
                        ),
                        F.coalesce(
                            _ids("p1"),
                            F.expr("array()").cast(
                                "array<long>"
                                if numeric_ids
                                else "array<string>"
                            ),
                        ),
                    )
                ),
                ",",
            ).alias("postings"),
        )
    )
    out = merged.filter(F.col("n_docs") >= min_df)
    if max_df is not None:
        out = out.filter(F.col("n_docs") <= max_df)
    return out
