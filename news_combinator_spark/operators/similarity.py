"""Similarity search over embedding columns (array<float>).

Two paths:
- brute_force_topk: exact cosine top-k of every query against the full
  corpus — JVM-side vector math (zip_with/aggregate inside codegen),
  broadcast queries, window top-k. The correctness baseline.
- ivf_topk: IVF-style scale path — corpus assigned to the nearest of
  n_cells centroids (sampled deterministically from the corpus), each
  query probes its `n_probe` nearest cells only, so the pair join is
  |Q| x (corpus/n_cells x n_probe) instead of |Q| x corpus. Same
  output schema; recall measured against brute force in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ranking import bounded_part_key


def _norm_col(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


def _dot(u, v):
    return F.aggregate(
        F.zip_with(u, v, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank, cos_sim): exact top-k by cosine;
    ties broken by neighbor id for determinism. Self-pairs excluded."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("cn", _norm_col(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qn", _norm_col(F.col("qv")))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def _assign_to(
    vecs: DataFrame, centroids: DataFrame, n_probe: int = 1
) -> DataFrame:
    """Top-``n_probe`` nearest centroids by COSINE (centroid norm
    divided out; the row vector's own norm is constant per row so it
    never moves the argmax)."""
    scored = (
        vecs.join(F.broadcast(centroids))
        .withColumn(
            "d",
            _dot(F.col("v"), F.col("centroid")) / F.col("centroid_norm"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("d"), F.asc("cell"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_probe)
        .select("id", "cell")
    )


def assign_cells(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF coarse quantizer. Seeds = the n_cells corpus
    vectors with the lowest ids, then `train_iters` Lloyd refinements
    (centroid = per-dimension mean of its members — posexplode +
    groupBy, all JVM-side; empty cells keep their previous centroid).
    Assignment is cosine-correct. Returns (centroids(cell, centroid,
    centroid_norm), assignments(id, cell))."""
    vecs = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    centroids = (
        corpus.orderBy(id_col)
        .limit(n_cells)
        .select(
            F.col(id_col).alias("cell_src"),
            F.col(vec_col).alias("centroid"),
        )
        .withColumn(
            # frame bounded by n_cells (the LIMIT above)
            "cell",
            F.row_number().over(
                Window.partitionBy(bounded_part_key()).orderBy("cell_src")
            )
            - 1,
        )
        .select("cell", "centroid")
        .withColumn("centroid_norm", _norm_col(F.col("centroid")))
    )
    for _ in range(train_iters):
        assign = _assign_to(vecs, centroids)
        means = (
            vecs.join(assign, "id")
            .select("cell", F.posexplode("v").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(
                F.sort_array(F.collect_list(F.struct("dim", "m"))).alias("dm")
            )
            .select(
                "cell",
                F.expr("transform(dm, p -> p.m)").alias("new_centroid"),
            )
        )
        centroids = (
            centroids.join(means, "cell", "left")
            .select(
                "cell",
                F.coalesce("new_centroid", "centroid").alias("centroid"),
            )
            .withColumn("centroid_norm", _norm_col(F.col("centroid")))
        )
    assign = _assign_to(vecs, centroids)
    return centroids, assign


def assign_cells_multi(
    corpus: DataFrame,
    n_cells: int = 64,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 1,
) -> DataFrame:
    """Multi-probe cell assignment: (id, cell) with each vector in its
    ``n_probe`` nearest IVF cells. Used as the default blocking for
    embedding near-dup detection at scale — two near-identical vectors
    share their top cells with probability -> 1, so a same-cell join
    after multi-probing recovers near-dup pairs without the all-pairs
    cross join."""
    centroids, _ = assign_cells(
        corpus, n_cells=n_cells, id_col=id_col, vec_col=vec_col,
        train_iters=train_iters,
    )
    vecs = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    return _assign_to(vecs, centroids, n_probe=n_probe)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 1,
    corpus_assign: int = 1,
) -> DataFrame:
    """Approximate top-k: probe the n_probe best cells per query.

    ``corpus_assign`` > 1 replicates each corpus vector into that many
    nearest cells (multi-assignment): index size grows linearly with it
    while recall rises, because a true neighbor sitting near a cell
    boundary is findable through ANY of its top cells rather than only
    its single argmax cell — the main recall loss mode of plain IVF.
    Pairs that meet through several shared cells are deduplicated
    before ranking (their scores are identical, so the output stays
    deterministic)."""
    centroids, assign = assign_cells(
        corpus, n_cells, id_col, vec_col, train_iters
    )
    if corpus_assign > 1:
        vecs = corpus.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v")
        )
        assign = _assign_to(vecs, centroids, n_probe=corpus_assign)
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        )
        .join(assign.withColumnRenamed("id", "neighbor_id"), "neighbor_id")
        .withColumn("cn", _norm_col(F.col("cv")))
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qn", _norm_col(F.col("qv")))
    q_cells = (
        q.join(F.broadcast(centroids))
        .withColumn(
            "d", _dot(F.col("qv"), F.col("centroid")) / F.col("centroid_norm")
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("d"), F.asc("cell"))
    probes = (
        q_cells.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "qn", "cell")
    )
    scored = (
        c.join(probes, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
        )
    )
    if corpus_assign > 1:
        scored = scored.dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
