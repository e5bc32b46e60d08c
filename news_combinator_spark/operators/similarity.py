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
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 1,
    corpus_assign: int = 2,
) -> DataFrame:
    """Approximate top-k: probe the n_probe best cells per query.

    Default (n_probe=8/16 cells, corpus_assign=2) comes from a bench
    sweep (r3): multi-assignment is the dominant recall lever —
    recall ~0.97 at a 50% scan fraction x2 index replication, vs
    ~0.79 for the same scan single-assigned; the r2 default
    (4/16, ca=1) measured ~0.68-0.75. Full probe (n_probe=n_cells)
    stays exactly brute force (the oracle invariant), ca-independent
    because duplicate pairs dedupe before ranking.

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


# ---------------------------------------------------------------------------
# Product quantization (PQ) — ADC approximate search
# ---------------------------------------------------------------------------

def _l2sq(u, v):
    return F.aggregate(
        F.zip_with(u, v, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def _subvectors(df, id_name, vec_col, m, sub_len):
    """(id, sub, sv): the vector split into m contiguous slices."""
    return df.select(
        F.col(id_name),
        F.explode(
            F.expr(
                f"transform(sequence(0, {m - 1}), s -> struct("
                f"s as sub, slice({vec_col}, s * {sub_len} + 1,"
                f" {sub_len}) as sv))"
            )
        ).alias("p"),
    ).select(id_name, F.col("p.sub").alias("sub"), F.col("p.sv").alias("sv"))


def pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 0,
    dim: int | None = None,
) -> DataFrame:
    """Per-subspace PQ codebooks: (sub, code, centroid array<double>).

    Seeds = the subvectors of the ``n_codes`` lowest-id corpus rows
    (deterministic, SQL-replayable); ``train_iters`` optional Lloyd
    refinements per subspace (posexplode + per-(sub, code, dim) mean,
    all JVM-side; empty codes keep their seed). The codebook is
    m*n_codes rows — kilobytes — and is broadcast by every consumer:
    at 10^10 corpus rows the index state per executor stays constant
    while the encoded corpus shrinks to m small ints per vector
    (the point of PQ: the 256 GB of raw float32 vectors become
    ~10 GB of codes that fit scan-side memory).
    """
    if dim is None:
        dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    if dim % m != 0:
        raise ValueError(f"dim ({dim}) must be divisible by m ({m})")
    sub_len = dim // m
    seeds = (
        corpus.orderBy(id_col)
        .limit(n_codes)
        .select(F.col(id_col).alias("sid"), F.col(vec_col).alias("v"))
    )
    cb = (
        _subvectors(seeds.withColumnRenamed("v", "vec"), "sid", "vec",
                    m, sub_len)
        .withColumn(
            # frame bounded: n_codes rows per sub (the LIMIT above)
            "code",
            F.row_number().over(Window.partitionBy("sub").orderBy("sid")) - 1,
        )
        .select("sub", "code", F.col("sv").alias("centroid"))
    )
    vecs = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    vsubs = None
    for _ in range(train_iters):
        if vsubs is None:
            vsubs = _subvectors(
                vecs.withColumnRenamed("v", "vec"), "id", "vec", m, sub_len
            ).localCheckpoint(eager=False)
        assigned = _pq_assign(vsubs, cb)
        means = (
            vsubs.join(assigned, ["id", "sub"])
            .select("sub", "code", F.posexplode("sv").alias("dim", "x"))
            .groupBy("sub", "code", "dim")
            .agg(F.avg("x").alias("mu"))
            .groupBy("sub", "code")
            .agg(
                F.sort_array(F.collect_list(F.struct("dim", "mu"))).alias("dm")
            )
            .select(
                "sub", "code",
                F.expr("transform(dm, p -> p.mu)").alias("nc"),
            )
        )
        cb = cb.join(means, ["sub", "code"], "left").select(
            "sub", "code", F.coalesce("nc", "centroid").alias("centroid")
        )
    return cb


def _pq_assign(vsubs: DataFrame, codebooks: DataFrame) -> DataFrame:
    """(id, sub) -> nearest code by squared L2 (ties to lowest code)."""
    scored = vsubs.join(F.broadcast(codebooks), "sub").withColumn(
        "d2", _l2sq(F.col("sv"), F.col("centroid"))
    )
    return scored.groupBy("id", "sub").agg(
        F.min_by("code", F.struct(F.col("d2").alias("d"),
                                  F.col("code").alias("c"))).alias("code")
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Encode the corpus against trained codebooks: (id, sub, code) —
    m small ints per vector. One broadcast join + one map-side-
    combined groupBy; the raw vectors are never needed again by the
    search path."""
    if dim is None:
        dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    sub_len = dim // m
    vecs = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    vsubs = _subvectors(vecs, "id", "vec", m, sub_len)
    return _pq_assign(vsubs, codebooks)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 0,
    round_dist: int = 6,
    rerank: int = 0,
    n_cells: int = 0,
    n_probe: int = 4,
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ top-k: (query_id, neighbor_id,
    rank, adc_dist). The query stays un-quantized; per (query, sub)
    a distance TABLE to every centroid is precomputed (|Q|*m*n_codes
    rows — broadcast), and each corpus vector's approximate distance
    is the sum of m table lookups on its codes. Distances are rounded
    to `round_dist` dp BEFORE ranking so a cross-engine ulp in the
    sum cannot flip a rank (ties then break on neighbor_id).

    ``rerank`` > k enables the production two-stage shape: the ADC
    pass shortlists `rerank` candidates per query from codes alone,
    then ONLY those |Q|*rerank rows fetch their raw vectors for an
    exact squared-L2 re-rank (adc_dist then holds the exact
    distance). Quantization error stops costing recall as long as a
    true neighbor lands anywhere in the shortlist — the cheap knob
    that buys recall without touching the scan side.

    ``n_cells`` > 0 adds IVF blocking in front of ADC (IVF-PQ, the
    FAISS production architecture): the corpus is assigned to coarse
    cells (`assign_cells`), each query probes only its ``n_probe``
    nearest cells, and the ADC sum runs over the probed members
    instead of the whole code table — candidate volume drops by
    ~n_cells/n_probe while the broadcast index state stays KB-sized.
    With n_probe >= n_cells the blocking is a no-op (pinned in tests).

    Scale shape: the scan side touches only the (id, sub, code)
    frame — m ints per corpus vector, no raw vectors — joined to the
    broadcast tables and reduced by one map-side-combined
    groupBy(query_id, id) sum. Self-pairs excluded like
    `brute_force_topk`. Exactness invariant: with codebooks covering
    every distinct subvector, adc_dist IS the exact squared L2
    distance (pinned in tests).
    """
    if n_codes <= 0 or m <= 0:
        raise ValueError("m and n_codes must be positive")
    dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    sub_len = dim // m
    cb = pq_codebooks(
        corpus, m=m, n_codes=n_codes, id_col=id_col, vec_col=vec_col,
        train_iters=train_iters, dim=dim,
    )
    codes = pq_encode(corpus, cb, m=m, id_col=id_col, vec_col=vec_col,
                      dim=dim)
    qvecs = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("vec")
    )
    qsubs = _subvectors(qvecs, "query_id", "vec", m, sub_len)
    tables = qsubs.join(F.broadcast(cb), "sub").select(
        "query_id", "sub", "code",
        _l2sq(F.col("sv"), F.col("centroid")).alias("dt"),
    )
    if n_cells > 0:
        centroids, assign = assign_cells(
            corpus, n_cells=n_cells, id_col=id_col, vec_col=vec_col
        )
        q_scored = qvecs.join(F.broadcast(centroids)).withColumn(
            "d",
            _dot(F.col("vec"), F.col("centroid")) / F.col("centroid_norm"),
        )
        wq = Window.partitionBy("query_id").orderBy(
            F.desc("d"), F.asc("cell")
        )
        probes = (
            q_scored.withColumn("rn", F.row_number().over(wq))
            .filter(F.col("rn") <= n_probe)
            .select("query_id", "cell")
        )
        cand = probes.join(assign, "cell").select("query_id", "id")
        scored = (
            cand.filter(F.col("id") != F.col("query_id"))
            .join(codes, "id")
            .join(F.broadcast(tables), ["query_id", "sub", "code"])
            .groupBy("query_id", F.col("id").alias("neighbor_id"))
            .agg(F.round(F.sum("dt"), round_dist).alias("adc_dist"))
        )
    else:
        scored = (
            codes.join(F.broadcast(tables), ["sub", "code"])
            .filter(F.col("id") != F.col("query_id"))
            .groupBy("query_id", F.col("id").alias("neighbor_id"))
            .agg(F.round(F.sum("dt"), round_dist).alias("adc_dist"))
        )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    if rerank > k:
        shortlist = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= rerank)
            .select("query_id", "neighbor_id")
        )
        cvecs = corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        )
        exact = (
            shortlist.join(cvecs, "neighbor_id")
            .join(F.broadcast(qvecs.withColumnRenamed("vec", "qv")),
                  "query_id")
            .withColumn(
                "adc_dist",
                F.round(_l2sq(F.col("qv"), F.col("cv")), round_dist),
            )
        )
        return (
            exact.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "adc_dist")
        )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )
