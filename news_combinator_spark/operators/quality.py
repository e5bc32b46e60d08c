"""Distribution-aware corpus curation: adaptive cuts and drift.

Fixed thresholds (min 25 tokens, max N chars) are wrong across
languages and domains — Chinese carries more information per token,
forum text runs shorter than news. These operators derive the cuts
from the corpus's own distributions and watch those distributions
move between crawl rounds:

- adaptive_length_filter: keep documents inside their OWN group's
  [lo, hi] length quantiles (per-language, per-domain, ...) instead
  of one global constant.
- content_drift: Population Stability Index between two crawl
  snapshots' per-host length distributions — the alarm that fires
  when a site redesign breaks the extractor (lengths collapse) or a
  template injection bloats it, BEFORE the bad text reaches training.

Scale shape: both are two-level aggregations over built-in
expressions. Quantiles use Spark's exact `percentile` aggregate
(linear interpolation, same definition as DuckDB's quantile_cont, so
the oracle can replay values bit-for-bit after rounding); group
cardinality (languages, hosts) is orders below row count, so the
joins back are cheap and never broadcast unbounded frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["adaptive_length_filter", "content_drift"]


def adaptive_length_filter(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    doc_col: str = "doc_id",
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """(doc, group, n_tok, lo_cut, hi_cut, keep): keep documents whose
    whitespace token count lies within their group's [lo, hi]
    quantile band — the cut adapts to each group's distribution
    instead of applying one corpus-wide constant.

    Quantiles are Spark's exact `percentile` (linear interpolation
    between order statistics); each group's pair is computed in one
    map-side-combined aggregate and joined back at group cardinality.
    Bounds are rounded to 4 dp so the keep decision is reproducible
    cross-engine.
    """
    n_tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast(
        "long"
    )
    toks = df.select(
        F.col(doc_col).alias("doc"),
        F.col(group_col).alias("grp"),
        n_tok.alias("n_tok"),
    )
    cuts = toks.groupBy("grp").agg(
        F.round(F.percentile("n_tok", F.lit(lo)), 4).alias("lo_cut"),
        F.round(F.percentile("n_tok", F.lit(hi)), 4).alias("hi_cut"),
    )
    # eqNullSafe: a NULL group (failed language ID) must still get
    # its own band and a keep decision — a plain equi-join silently
    # drops those rows from the output
    joined = toks.join(
        cuts.withColumnRenamed("grp", "_cg"),
        toks["grp"].eqNullSafe(F.col("_cg")),
    ).drop("_cg")
    return joined.select(
        "doc",
        F.col("grp").alias(group_col),
        "n_tok",
        "lo_cut",
        "hi_cut",
        (
            (F.col("n_tok") >= F.col("lo_cut"))
            & (F.col("n_tok") <= F.col("hi_cut"))
        ).alias("keep"),
    )


def content_drift(
    before: DataFrame,
    after: DataFrame,
    key_col: str = "host",
    text_col: str = "text",
    bucket_width: int = 20,
    n_buckets: int = 10,
    eps: float = 1e-6,
    alert_threshold: float = 0.2,
) -> DataFrame:
    """Population Stability Index of the per-``key_col`` token-length
    distribution between two crawl snapshots: (key, n_before,
    n_after, psi, drifted).

    Lengths land in ``n_buckets`` fixed-width buckets (width
    ``bucket_width`` tokens, last bucket open-ended), per-key shares
    are smoothed by ``eps``, and

        psi = sum_b (p_after[b] - p_before[b]) * ln(p_after[b] / p_before[b])

    The conventional reading: psi < 0.1 stable, 0.1-0.2 drifting,
    > 0.2 act — ``alert_threshold`` sets the ``drifted`` flag. Fixed
    buckets (not quantile buckets) keep the statistic deterministic
    and cross-engine replayable.

    Shape: one groupBy(key, bucket) per side (map-side combined), a
    full outer join at key x bucket cardinality, one groupBy(key).
    Keys present in only one snapshot still score: every bucket of
    the absent side is the eps floor.
    """
    def _hist(df: DataFrame, n_col: str) -> DataFrame:
        n_tok = F.size(
            F.split(F.trim(F.col(text_col)), r"\s+")
        ).cast("long")
        b = F.least(
            F.floor(n_tok / bucket_width), F.lit(n_buckets - 1)
        ).cast("int")
        return (
            df.select(F.col(key_col).alias("key"), b.alias("bucket"))
            .groupBy("key", "bucket")
            .agg(F.count(F.lit(1)).alias(n_col))
        )

    ha = _hist(before, "n_b")
    hb = _hist(after, "n_a")
    grid = ha.join(hb, ["key", "bucket"], "full_outer").select(
        "key",
        "bucket",
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
    )
    tot = grid.groupBy("key").agg(
        F.sum("n_b").alias("tot_b"), F.sum("n_a").alias("tot_a")
    )
    j = grid.join(tot, "key")
    pb = F.col("n_b") / F.greatest(F.col("tot_b"), F.lit(1)) + eps
    pa = F.col("n_a") / F.greatest(F.col("tot_a"), F.lit(1)) + eps
    per_bucket = j.select(
        "key",
        "n_b",
        "n_a",
        ((pa - pb) * F.log(pa / pb)).alias("term"),
    )
    agg = per_bucket.groupBy("key").agg(
        F.sum("n_b").alias("n_before"),
        F.sum("n_a").alias("n_after"),
        F.round(F.sum("term"), 6).alias("psi"),
    )
    return agg.select(
        F.col("key").alias(key_col),
        "n_before",
        "n_after",
        "psi",
        (F.col("psi") > alert_threshold).alias("drifted"),
    )
