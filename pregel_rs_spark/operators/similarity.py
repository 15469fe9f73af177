"""Similarity search over an embedding column (``array<float>``).

Two paths per the pipeline requirements:
  * brute-force cosine top-k — the exact baseline; a blocked cross join
    (queries × corpus) with a window top-k.  Fine for ≤10^5 corpus per
    executor-memory unit; at 100 TB this is the re-rank stage only.
  * LSH-bucketed ANN — random-hyperplane signs as the coarse bucket,
    multi-probe within bucket, exact cosine re-rank inside.  The scale path:
    the corpus is bucketed ONCE (write-time), queries only join their probe
    buckets — candidate set shrinks by ~2^n_planes.

The hyperplanes are deterministic pseudo-random weights derived from
md5(plane|dim) — integer-exact dyadic doubles, so any engine (Spark, DuckDB,
NumPy) reproduces the identical bucket assignment without a stored model
artifact or trusting a libm ``sin`` to be bit-identical across runtimes.
Quality-critical deployments plug in trained centroids via the same
bucket-column contract.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pregel_rs_spark.operators.dedup import cosine_expr


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (excluding itself).  ``queries`` has (vec_id, embedding).
    Returns ``(query_id, neighbor_id, cosine, rank)``.
    """
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("qe"), F.col("ce")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def brute_force_topk_arrow(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    max_queries: int = 100_000,
) -> DataFrame:
    """Vectorized Arrow/numpy top-k — the scale path for dense math.

    The query set (small by contract: it's the probe side) is collected once
    and broadcast as a dense row-normalized matrix; every corpus Arrow batch
    computes a (batch × n_queries) cosine block with one BLAS matmul and
    emits only its local top-k candidates per query; a final window
    aggregation reduces local candidates to the global top-k.  Per-row
    Python never runs — this is `mapInPandas` over whole Arrow batches
    (input_hint: "no per-row Python").

    Versus :func:`brute_force_topk` (pure Catalyst `aggregate`/`zip_with`
    expressions): identical ranking up to float-summation order; ~10-50×
    less CPU per candidate at realistic dims.  Returns
    ``(query_id, neighbor_id, cosine, rank)``.
    """
    import numpy as np
    import pandas as pd

    # the query side is collected + broadcast by contract; enforce it so an
    # oversized caller gets an actionable error, not a driver OOM
    n_q = queries.count()
    if n_q > max_queries:
        raise ValueError(
            f"brute_force_topk_arrow collects the query side to the driver "
            f"({n_q} rows > max_queries={max_queries}); batch the queries or "
            "use lsh_topk for a distributed probe side"
        )
    q_rows = queries.select("vec_id", "embedding").collect()
    qids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    qm = np.array([r.embedding for r in q_rows], dtype=np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-300)
    bq = emb.sparkSession.sparkContext.broadcast((qids, qm))

    def block_topk(batches):
        bqids, bqm = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cm = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            cm = cm / np.maximum(np.linalg.norm(cm, axis=1, keepdims=True), 1e-300)
            sims = cm @ bqm.T  # (batch, n_queries)
            take = min(k + 1, len(cids))  # +1 to survive self-exclusion
            out_q, out_n, out_c = [], [], []
            for j in range(len(bqids)):
                s = sims[:, j]
                idx = np.argpartition(-s, take - 1)[:take]
                idx = idx[np.argsort(-s[idx], kind="stable")]
                out_q.extend([bqids[j]] * len(idx))
                out_n.extend(cids[idx])
                out_c.extend(s[idx])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
            )

    candidates = emb.select("vec_id", "embedding").mapInPandas(
        block_topk, "query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        candidates.filter(F.col("query_id") != F.col("neighbor_id"))
        # rank on the ROUNDED cosine (same contract as brute_force_topk):
        # raw float sums differ between BLAS matmul and sequential folds at
        # ~1e-15, so ranking on rounded values keeps the result identical
        # across the Catalyst / Arrow / SQL-oracle paths.
        .withColumn("cosine", F.round("cosine", 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_weight(plane: int, dim: int) -> float:
    """Deterministic hyperplane weight in [-1, 1): the first 8 hex chars of
    md5("plane|dim") as a 32-bit int, scaled by 2^-31 and shifted.  The
    result is a dyadic rational (exactly representable as a double), so
    ``h / 2147483648.0 - 1.0`` evaluated in ANY IEEE-754 engine — Spark,
    DuckDB SQL, NumPy — yields the identical bit pattern, making bucket
    assignment engine-portable (the property the SQL oracle relies on)."""
    h = int(hashlib.md5(f"{plane}|{dim}".encode()).hexdigest()[:8], 16)
    return h / 2147483648.0 - 1.0


def hyperplane_weights(n_planes: int, dim: int) -> list[list[float]]:
    """Weight matrix [plane][dim] for :func:`lsh_topk` and its oracles."""
    return [
        [hyperplane_weight(p, d) for d in range(dim)] for p in range(n_planes)
    ]


def _hyperplane_bucket(vec, n_planes: int, dim: int):
    """Sign-bit bucket id from n_planes deterministic hyperplanes (weights
    per :func:`hyperplane_weight`; constant arrays, folded by Catalyst)."""
    bits = []
    for p in range(n_planes):
        w = F.array(*[F.lit(hyperplane_weight(p, d)) for d in range(dim)])
        dot = F.aggregate(
            F.zip_with(vec, w, lambda x, wd: x.cast("double") * wd),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ivf_centroids(emb: DataFrame, n_cells: int = 16) -> DataFrame:
    """Deterministic IVF coarse quantizer: the ``n_cells`` corpus vectors
    with the smallest ``md5(vec_id)`` (a pseudo-random but engine-portable
    sample — DuckDB computes the identical hash of the identical decimal
    string, so the SQL oracle selects the identical seed set).  Returns
    ``(cell_id, cent)`` where ``cell_id`` is the seed's vec_id.

    Production deployments plug trained k-means centroids into
    :func:`ivf_topk` through this same (cell_id, cent) contract; the seeded
    quantizer is the zero-model-artifact default that keeps the whole index
    reproducible from the data alone.
    """
    return (
        emb.select("vec_id", "embedding")
        .withColumn("__h__", F.md5(F.col("vec_id").cast("string")))
        .orderBy(F.asc("__h__"), F.asc("vec_id"))
        .limit(n_cells)
        .select(
            F.col("vec_id").alias("cell_id"), F.col("embedding").alias("cent")
        )
    )


def _nearest_cells(vecs: DataFrame, cents: DataFrame, id_col: str,
                   vec_col: str, n: int, keep_sim: bool = False) -> DataFrame:
    """Top-``n`` centroids per vector by cosine (rounded to 6 dp so the
    ordering is engine-portable; ties broken by cell_id ASC).  The centroid
    table is tiny by construction — Catalyst broadcasts the join, so this
    is a map-side pass over the vectors, no shuffle."""
    scored = vecs.crossJoin(F.broadcast(cents)).withColumn(
        "__sim__", F.round(cosine_expr(F.col(vec_col), F.col("cent")), 6)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("__sim__"), F.asc("cell_id")
    )
    cols = [id_col, vec_col, "cell_id"] + (["__sim__"] if keep_sim else [])
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= n)
        .select(*cols)
    )


def kmeans_assign(
    emb: DataFrame,
    n_clusters: int = 8,
    iters: int = 2,
    scale_bits: int = 20,
) -> DataFrame:
    """Lloyd k-means over the embedding corpus (cosine assignment) —
    the semantic-clustering primitive for corpus curation (SemDeDup-style
    cluster-then-dedup, topic bucketing, per-cluster sampling; public
    technique).  Fully deterministic and engine-portable:

      * seeds = :func:`ivf_centroids`' md5-ordered corpus sample, so the
        initial centroids are reproducible from the data alone;
      * assignment = broadcast centroids + cosine rounded to 6 dp, ties
        broken by cluster id ASC (a map-only pass, no shuffle on the
        corpus side);
      * centroid update sums each dimension as a SCALED INTEGER
        (``round(v · 2^scale_bits)`` as int64) — integer addition is
        order-independent, so the new centroids are bit-identical under
        any partitioning AND in the SQL oracle (the same trick as the HLL
        register sums); the mean divides two exact integers in double.

    Cluster ids are the seed vectors' ``vec_id`` (stable across
    iterations; a cluster that loses all members disappears rather than
    being re-seeded).  Scale shape per iteration: one broadcast-join
    assignment pass + one (cluster, dim)-keyed aggregation whose output
    is ``n_clusters × dim`` rows — the classic distributed-Lloyd layout;
    ``iters`` is a fixed small constant, so the whole job is
    ``iters + 1`` scans of the corpus.

    int64 bound: |v| · 2^scale_bits · corpus_rows must stay < 2^63 —
    with unit-normalized embeddings and the default 2^20 scale that
    allows ~8·10^12 rows per cluster.

    Returns ``(vec_id, cluster_id, cosine)`` — the final assignment and
    its rounded cosine to the final centroid.
    """
    cents = ivf_centroids(emb, n_clusters)
    c = emb.select("vec_id", "embedding")
    s = float(1 << scale_bits)
    for _ in range(iters):
        assigned = _nearest_cells(c, cents, "vec_id", "embedding", 1)
        sums = (
            assigned.select(
                "cell_id", F.posexplode("embedding").alias("pos", "v")
            )
            .groupBy("cell_id", "pos")
            .agg(
                F.sum(
                    F.round(F.col("v").cast("double") * s).cast("long")
                ).alias("sv"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        cents = (
            sums.withColumn("m", F.col("sv") / (F.col("n") * F.lit(s)))
            .groupBy("cell_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
            )
            .select(
                "cell_id",
                F.transform("pm", lambda x: x["m"]).alias("cent"),
            )
        )
    final = _nearest_cells(c, cents, "vec_id", "embedding", 1, keep_sim=True)
    return final.select(
        "vec_id",
        F.col("cell_id").alias("cluster_id"),
        F.col("__sim__").alias("cosine"),
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    max_cell: int | None = None,
    index: tuple[DataFrame, DataFrame] | None = None,
    rerank: str = "catalyst",
) -> DataFrame:
    """IVF-flat ANN top-k: inverted-file coarse quantization + exact cosine
    re-rank inside the probed cells (the FAISS IVF-Flat layout, public
    design).

    Index side (write-time at scale): every corpus vector is assigned to
    its nearest centroid — one broadcast-join map pass, then
    persisted/partitioned by ``cell_id`` so each cell is a contiguous
    read.  Query side: each query probes its ``nprobe`` nearest cells,
    joins only those cells' vectors (candidate volume ≈ nprobe/n_cells of
    the corpus), exact re-rank within.  Recall < 1.0 by construction —
    tests measure it against :func:`brute_force_topk`.

    ``max_cell`` optionally caps pathological cells with the same
    ``row_number() <= cap`` guard the LSH bucket join uses (a degenerate
    quantizer or clustered corpus can put O(corpus) in one cell; capping
    trades recall for a hard bound on the per-cell join).

    ``rerank`` picks the in-cell exact-scoring engine: ``"catalyst"``
    (pure-expression fold — the SQL-oracle-parity default) or ``"arrow"``
    (vectorized numpy over Arrow batches — ~30× less CPU per candidate;
    measured: at 200k×64 the Catalyst fold costs more than its 16×
    candidate reduction saves, the Arrow re-rank restores the win —
    tools/bench_ann.py).  Both rank on the ROUNDED cosine, so the top-k
    sets are identical (same contract as :func:`brute_force_topk_arrow`;
    equality pytest-pinned).

    ``index=(cents, assigned)`` supplies a PREBUILT index — ``cents`` as
    ``(cell_id, cent)`` and ``assigned`` as ``(neighbor_id, ce, cell_id)``
    (exactly what :func:`ivf_centroids` + :func:`_nearest_cells` or a
    trained external quantizer produce).  That is the production shape:
    the assignment pass runs once at ingest and is persisted partitioned
    by ``cell_id``; queries then pay only the probe + in-cell re-rank
    (~nprobe/n_cells of a full scan).

    Returns ``(query_id, neighbor_id, cosine, rank)``.
    """
    if index is not None:
        cents, assigned = index
    else:
        cents = ivf_centroids(emb, n_cells)
        c = emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("ce"),
        )
        assigned = _nearest_cells(c, cents, "neighbor_id", "ce", 1)
    if max_cell is not None:
        wcap = Window.partitionBy("cell_id").orderBy(F.asc("neighbor_id"))
        assigned = (
            assigned.withColumn("__cn__", F.row_number().over(wcap))
            .filter(F.col("__cn__") <= max_cell)
            .drop("__cn__")
        )
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    probes = _nearest_cells(q, cents, "query_id", "qe", nprobe)
    cand = probes.join(assigned, "cell_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    if rerank == "catalyst":
        scored = cand.withColumn(
            "cosine", F.round(cosine_expr(F.col("qe"), F.col("ce")), 6)
        ).select("query_id", "neighbor_id", "cosine")
    elif rerank == "arrow":
        import numpy as np
        import pandas as pd

        def batch_cos(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                a = np.array(pdf["qe"].tolist(), dtype=np.float64)
                b = np.array(pdf["ce"].tolist(), dtype=np.float64)
                dot = np.einsum("ij,ij->i", a, b)
                na = np.maximum(np.linalg.norm(a, axis=1), 1e-300)
                nb = np.maximum(np.linalg.norm(b, axis=1), 1e-300)
                yield pd.DataFrame(
                    {
                        "query_id": pdf["query_id"],
                        "neighbor_id": pdf["neighbor_id"],
                        "cosine": dot / (na * nb),
                    }
                )

        scored = cand.select(
            "query_id", "qe", "neighbor_id", "ce"
        ).mapInPandas(
            batch_cos, "query_id long, neighbor_id long, cosine double"
        ).withColumn("cosine", F.round("cosine", 6))
    else:
        raise ValueError(
            f"rerank must be 'catalyst' or 'arrow', got {rerank!r}"
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        # (query, neighbor) pairs are unique by construction: each corpus
        # vector lives in exactly one cell and a query probes each cell
        # at most once
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: random-hyperplane LSH bucket join + exact re-rank.

    Multi-probe: with ``probe_hamming=1`` each query also probes every
    bucket at Hamming distance 1 from its own (one hyperplane sign flipped
    — the most likely buckets to hide true neighbors that fell just across
    a plane).  Candidate volume grows ×(n_planes+1) while recall rises
    sharply vs single-probe; ``probe_hamming=0`` is the exact-bucket mode.
    Recall < 1.0 by construction; tests check recall vs
    :func:`brute_force_topk` on a real corpus.  At scale the corpus side is
    bucketed once and persisted/bucketed-by on write; only the (small)
    query side fans out to its probe buckets.
    """
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        _hyperplane_bucket(F.col("embedding"), n_planes, dim).alias("bucket"),
    )
    qb = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _hyperplane_bucket(F.col("embedding"), n_planes, dim).alias("__b0__"),
    )
    probes = [F.col("__b0__")]
    if probe_hamming >= 1:
        probes += [
            F.col("__b0__").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)
        ]
    q = qb.select(
        "query_id", "qe", F.explode(F.array(*probes)).alias("bucket")
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("qe"), F.col("ce")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def neighbor_feature_agg(
    edges: DataFrame,
    feats: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One round of GNN-style neighbor feature pooling (public technique:
    GraphSAGE mean/max aggregation, Hamilton et al. NeurIPS'17) — for each
    vertex, the element-wise mean and max of its out-neighbors' embedding
    vectors, plus the neighbor count.  This is the feature-engineering
    join between the link graph and the embedding table: node features
    for ranking/classification models without a training framework in the
    loop.

    Shape (100 TB-safe): one equi-join of the (distinct) edge table
    against the feature table on the neighbor id, then ``posexplode`` and
    a hash aggregate keyed (vertex, dim) — the dim component fans a
    mega-hub's aggregation across d reducers instead of one, so hubs
    parallelize instead of skewing.  No pairwise work; rows scale as
    |E|·d into a |V|·d result.  Returned per-dim rows (not re-assembled
    arrays) keep the result directly joinable and ANSI-SQL comparable;
    ``array_agg`` over pos re-assembles vectors when needed.

    Vertices with no out-edges (or whose neighbors lack features) are
    absent — the closed-world contract of the edge/feature join.  Floats
    are cast to DOUBLE before aggregation and rounded to 6 so the result
    is engine-exact.  Returns (vertex_id, pos, n_neighbors, mean_val,
    max_val).
    """
    from pregel_rs_spark.columns import OBJECT, SUBJECT, VERTEX_ID

    nb = (
        edges.select(SUBJECT, OBJECT)
        .distinct()
        .join(feats.select(id_col, vec_col), F.col(OBJECT) == F.col(id_col))
    )
    ex = nb.select(
        F.col(SUBJECT).alias(VERTEX_ID),
        F.posexplode(F.col(vec_col)).alias("pos", "__v"),
    ).withColumn("__v", F.col("__v").cast("double"))
    return ex.groupBy(VERTEX_ID, "pos").agg(
        F.count(F.lit(1)).alias("n_neighbors"),
        F.round(F.avg("__v"), 6).alias("mean_val"),
        F.round(F.max("__v"), 6).alias("max_val"),
    )


def quantize_embeddings(
    feats: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Global-calibration int8 scalar quantization of an embedding column —
    the standard memory/IO reduction for web-scale ANN (public technique:
    FAISS ``SQ8`` / scalar quantizers; 4× smaller vectors, ~1% recall
    loss).  Per dimension d the corpus min/max calibrate an affine code

        q = floor((v − mn_d) · 255 / (mx_d − mn_d) + 0.5)   ∈ [0, 255]

    and the dequantized value is ``mn_d + q · (mx_d − mn_d)/255``.
    ``floor(x + 0.5)`` is used instead of ``round`` because HALF_UP vs
    banker's rounding differs across engines while floor on identical
    IEEE doubles does not — the codes are bit-exact everywhere.

    Scale shape: calibration is ONE posexplode + hash aggregate keyed by
    dimension (d rows out, broadcast back); quantization is a map-side
    join + arithmetic — no pairwise work, two scans total.  A constant
    dimension (mx = mn) quantizes to 0 with 0 error.  Returns
    (id, pos, q, err) where ``err`` = |v − dequant(q)| rounded to 6 —
    the per-coordinate reconstruction error, so the recall/size tradeoff
    is auditable in-pipeline.
    """
    ex = feats.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col)).alias("pos", "__v"),
    ).withColumn("__v", F.col("__v").cast("double"))
    cal = ex.groupBy("pos").agg(
        F.min("__v").alias("__mn"), F.max("__v").alias("__mx")
    )
    rng = F.col("__mx") - F.col("__mn")
    q = F.when(rng == 0, F.lit(0)).otherwise(
        F.floor((F.col("__v") - F.col("__mn")) * 255.0 / rng + 0.5)
    ).cast("int")
    deq = F.col("__mn") + F.col("__q") * rng / 255.0
    return (
        ex.join(F.broadcast(cal), "pos")
        .withColumn("__q", q)
        .select(
            id_col,
            "pos",
            F.col("__q").alias("q"),
            F.round(F.abs(F.col("__v") - deq), 6).alias("err"),
        )
    )


def pq_codebooks(
    emb: DataFrame, n_codes: int = 16, m_sub: int = 4, dim: int = 64
) -> DataFrame:
    """Deterministic product-quantization codebooks (Jégou, Douze &
    Schmid, TPAMI 2011 — public literature; the FAISS ``IndexPQ``
    layout): the embedding space is split into ``m_sub`` contiguous
    subspaces of ``dim/m_sub`` dims, and each subspace's ``n_codes``
    centroids are the corresponding SLICES of the ``n_codes``
    md5-smallest corpus vectors — the same zero-model-artifact seeded
    quantizer as :func:`ivf_centroids`, so the whole index is
    reproducible from the data alone (and a trained codebook plugs in
    through the same ``(sub, code, cent_sub)`` contract).

    Returns ``(sub, code, cent_sub)`` — ``m_sub · n_codes`` rows, tiny
    by construction (broadcast side everywhere it is used).
    """
    if dim % m_sub != 0:
        raise ValueError(f"m_sub={m_sub} must divide dim={dim}")
    ds = dim // m_sub
    seeds = (
        emb.select("vec_id", "embedding")
        .withColumn("__h__", F.md5(F.col("vec_id").cast("string")))
        .orderBy(F.asc("__h__"), F.asc("vec_id"))
        .limit(n_codes)
        .select(F.col("vec_id").alias("code"), "embedding")
    )
    subs = F.explode(
        F.sequence(F.lit(0), F.lit(m_sub - 1))
    ).alias("sub")
    return seeds.select("code", "embedding", subs).select(
        "sub",
        "code",
        F.slice(
            F.col("embedding"), F.col("sub") * ds + 1, ds
        ).alias("cent_sub"),
    )


def _l2sq_expr(a, b):
    """Exact squared-L2 between two float arrays as an ordered left fold
    (same element order as DuckDB's list_reduce/list_zip replay)."""
    return F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_encode(
    emb: DataFrame,
    books: DataFrame,
    m_sub: int = 4,
    dim: int = 64,
) -> DataFrame:
    """PQ encoding: each vector → ``m_sub`` small codes (its nearest
    codebook centroid per subspace by squared L2, rounded 6 dp for
    engine portability, ties broken by code ASC) — the 64× memory
    compression that lets a 10^12-vector index live in RAM.

    Scale shape: one broadcast crossJoin (codebook is m_sub·n_codes
    rows) + one per-(vec, sub) window top-1 + one per-vec collect of
    m_sub codes — a single map-shuffle pass over the corpus; the
    output is ``(vec_id, codes)`` with ``codes[sub]`` the chosen code.
    """
    ds = dim // m_sub
    scored = (
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(books))
        .select(
            "vec_id",
            "sub",
            "code",
            F.round(
                _l2sq_expr(
                    F.slice(F.col("embedding"), F.col("sub") * ds + 1, ds),
                    F.col("cent_sub"),
                ),
                6,
            ).alias("d"),
        )
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(
        F.asc("d"), F.asc("code")
    )
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .groupBy("vec_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("sub", "code"))).alias("sc")
        )
        .select(
            "vec_id",
            F.transform(F.col("sc"), lambda s: s["code"]).alias("codes"),
        )
    )


def pq_topk(
    emb: DataFrame,
    k: int = 5,
    n_queries: int = 10,
    n_codes: int = 16,
    m_sub: int = 4,
    dim: int = 64,
) -> DataFrame:
    """PQ asymmetric-distance top-k (ADC — Jégou et al. 2011): queries
    stay full-precision, the corpus is scanned in its ``m_sub``-byte PQ
    codes, and each candidate's distance is the sum of ``m_sub``
    precomputed lookup-table entries — no corpus-side float math at all.

    Pipeline: :func:`pq_codebooks` (broadcast) → :func:`pq_encode` the
    corpus once (write-time at production scale, like the IVF cell
    assignment) → per query build the ``m_sub · n_codes`` LUT of
    subspace distances (a broadcast table of n_queries · m_sub ·
    n_codes rows) → explode corpus codes, broadcast-join the LUT, one
    (query, neighbor) integer-keyed hash agg sums the m_sub entries —
    map-side combined, the only corpus-sized shuffle.  Self-matches are
    excluded; ADC distance is rounded 6 dp, rank ties break by
    neighbor_id ASC (engine-portable total order).

    With ``m_sub=1, n_codes=|corpus|`` every vector is its own centroid
    and ADC degenerates to EXACT squared-L2 brute force — the
    correctness anchor the pytest pins (the analogue of IVF's
    nprobe=n_cells ≡ brute-force proof).

    Returns ``(query_id, neighbor_id, adc_dist, rank)``.
    """
    books = pq_codebooks(emb, n_codes=n_codes, m_sub=m_sub, dim=dim)
    ds = dim // m_sub
    codes = pq_encode(emb, books, m_sub=m_sub, dim=dim)
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    lut = queries.crossJoin(F.broadcast(books)).select(
        "query_id",
        "sub",
        "code",
        F.round(
            _l2sq_expr(
                F.slice(F.col("qe"), F.col("sub") * ds + 1, ds),
                F.col("cent_sub"),
            ),
            6,
        ).alias("d"),
    )
    exploded = codes.select(
        F.col("vec_id").alias("neighbor_id"),
        F.posexplode("codes").alias("sub", "code"),
    )
    scored = (
        exploded.join(F.broadcast(lut), ["sub", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("d"), 6).alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def ranking_eval(truth: DataFrame, approx: DataFrame, k: int = 5) -> DataFrame:
    """IR-metric evaluation of an approximate ranking against the exact
    one — the quality gate for the ANN scale paths (public metrics:
    recall@k; MRR; binary-relevance NDCG@k, Järvelin & Kekäläinen 2002).
    Both inputs use the ann_topk contract ``(query_id, neighbor_id,
    rank)`` with ≤ k rows per query; ``truth`` is assumed to carry
    exactly k rows per query (the brute-force top-k does), which fixes
    the recall denominator and the ideal DCG.

    Per query: relevant = truth's top-k set;
      recall_at_k = |approx ∩ relevant| / k
      mrr         = 1 / (smallest approx rank that is relevant), 0 if none
      ndcg        = Σ_{relevant hits} 1/log2(rank+1) / Σ_{r=1..k} 1/log2(r+1)

    Scale shape: one (query, neighbor) equi-join + one query-keyed agg +
    one left join back onto the query set — rankings are k rows/query, so
    this is k·|queries| rows end to end; no windows, nothing collected.
    Returns ``(query_id, recall_at_k, mrr, ndcg)`` rounded 6 dp.
    """
    import math

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    idcg = sum(1.0 / math.log2(r + 1) for r in range(1, k + 1))
    hits = approx.join(
        truth.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    )
    per = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.lit(1.0) / F.log2(F.col("rank") + 1)).alias("__dcg"),
        F.min("rank").alias("__fh"),
    )
    qs = truth.select("query_id").distinct()
    return qs.join(per, "query_id", "left").select(
        "query_id",
        F.round(F.coalesce(F.col("__n"), F.lit(0)) / F.lit(float(k)), 6).alias(
            "recall_at_k"
        ),
        F.round(
            F.when(F.col("__fh").isNull(), F.lit(0.0)).otherwise(
                F.lit(1.0) / F.col("__fh")
            ),
            6,
        ).alias("mrr"),
        F.round(
            F.coalesce(F.col("__dcg"), F.lit(0.0)) / F.lit(idcg), 6
        ).alias("ndcg"),
    )


def bitext_margin_pairs(
    a: DataFrame, b: DataFrame, k: int = 4, top_n: int = 20
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk ACL'19, the
    LASER/CCMatrix parallel-corpus scoring — public literature): candidate
    cross-lingual pairs (x∈a, y∈b) scored by the MARGIN between their
    cosine and the average cosine of each side's k nearest neighbors in
    the OTHER side,

        margin(x,y) = cos(x,y) / ((avgₖNN(x→b) + avgₖNN(y→a)) / 2)

    which suppresses hub vectors that are "near everything" — raw cosine's
    failure mode for mining.  Cosines round 6 dp before the k-NN averages
    (the repo's ANN portability convention), so the whole score chain is
    engine-replayable.

    This is the EXACT baseline (one a×b cross score, two windowed k-NN
    averages) — the re-rank stage at 100 TB, where candidate generation
    runs through the bucketed/celled ANN paths (``ivf_topk`` /
    ``lsh_topk``) and this operator scores only the surviving pairs.
    Assumes each side has ≥ k vectors (the averages divide by the literal
    k on both engines either way).

    Returns the global ``top_n`` pairs ``(doc_a, doc_b, margin, rank)``
    by (margin DESC, doc_a ASC, doc_b ASC) — TakeOrdered, no global sort.
    """
    if k < 1 or top_n < 1:
        raise ValueError(f"need k >= 1 and top_n >= 1, got k={k}, top_n={top_n}")
    av = a.select(F.col("vec_id").alias("doc_a"), F.col("embedding").alias("av"))
    bv = b.select(F.col("vec_id").alias("doc_b"), F.col("embedding").alias("bv"))
    cx = av.crossJoin(bv).select(
        "doc_a",
        "doc_b",
        F.round(cosine_expr(F.col("av"), F.col("bv")), 6).alias("cos"),
    )
    wa = Window.partitionBy("doc_a").orderBy(F.desc("cos"), F.asc("doc_b"))
    da = (
        cx.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") <= k)
        .groupBy("doc_a")
        .agg((F.sum("cos") / F.lit(float(k))).alias("da"))
    )
    wb = Window.partitionBy("doc_b").orderBy(F.desc("cos"), F.asc("doc_a"))
    db = (
        cx.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= k)
        .groupBy("doc_b")
        .agg((F.sum("cos") / F.lit(float(k))).alias("db"))
    )
    # denominator guard: with orthogonal/anti-correlated embeddings the
    # two k-NN averages can sum to <= 0, where the ratio margin is
    # undefined (NULL / unbounded / sign-flipped scores that would sort
    # to the top of the global ranking) — such pairs are dropped, not
    # scored (LASER margin scoring presumes positive neighborhood
    # similarity; mirrored in the DuckDB oracle)
    scored = (
        cx.join(da, "doc_a")
        .join(db, "doc_b")
        .filter((F.col("da") + F.col("db")) > 0)
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("cos") / ((F.col("da") + F.col("db")) / F.lit(2.0)), 6
            ).alias("margin"),
        )
    )
    top = scored.orderBy(
        F.desc("margin"), F.asc("doc_a"), F.asc("doc_b")
    ).limit(top_n)
    w = Window.orderBy(F.desc("margin"), F.asc("doc_a"), F.asc("doc_b"))
    return top.select(
        "doc_a", "doc_b", "margin", F.row_number().over(w).alias("rank")
    )
