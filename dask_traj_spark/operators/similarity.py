"""Similarity search over embedding columns (array<float>).

Beyond-reference capability block: approximate-nearest-neighbor and
near-duplicate detection over a 100 TB embedding corpus.

Three physical strategies:

- **SQL brute force** (``cosine_topk``): explode both sides, exact
  dot products via one groupBy-sum, window top-k. The auditable
  baseline and the oracle-gate form. Quantizing elements to a 2^-12
  grid first makes every product an exact multiple of 2^-24 and the
  64-term sum exact in double — aggregation order cannot change the
  result, which is what lets a Spark partial-agg hash-match a DuckDB
  sequential sum.
- **vectorized brute force** (``cosine_topk_vectorized``): broadcast
  the (small) query matrix, one numpy matmul per Arrow batch of the
  corpus, per-partition top-k then a final global top-k — the
  throughput path: O(batch × dim × q) BLAS, no shuffle until the
  tiny per-partition winners.
- **LSH-bucketed** (``cosine_lsh_buckets`` + ``near_duplicates_
  embedding_lsh``): random-hyperplane signatures (deterministic
  integer-seeded planes), bucket join, exact rerank inside buckets —
  the scale path when the corpus side is too big to brute-force.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

QGRID = 4096.0  # 2^12 — quantization grid for exact aggregation


def _quantized_elements(emb: DataFrame, id_col: str, prefix: str) -> DataFrame:
    """Explode embeddings to (id, pos, value) with 2^-12-quantized
    double values (exact in both engines)."""
    return emb.select(
        F.col(id_col).alias(prefix),
        F.posexplode(F.col("embedding")).alias("pos", "_v"),
    ).select(
        prefix,
        "pos",
        (F.round(F.col("_v").cast("double") * QGRID, 0) / QGRID).alias(f"v_{prefix}"),
    )


def cosine_pairs(
    emb: DataFrame,
    query_ids: Sequence[int],
    id_col: str = "vec_id",
    corpus_filter=None,
) -> DataFrame:
    """(qid, vec_id, cos) exact quantized cosine for every (query,
    corpus) pair. Query side is broadcast.

    ``corpus_filter`` (Column or SQL string) restricts the CORPUS
    side before the explode — pre-filter semantics for filtered
    vector search: the predicate sits directly on the scan, so
    Catalyst pushes it into the parquet reader (PushedFilters) and
    the explode/join/agg pipeline never sees a non-matching row.
    Queries are looked up in the UNFILTERED table (a query need not
    satisfy its own filter)."""
    q = F.broadcast(
        _quantized_elements(
            emb.where(F.col(id_col).isin([int(i) for i in query_ids])), id_col, "qid"
        )
    )
    corpus = emb
    if corpus_filter is not None:
        if isinstance(corpus_filter, str):
            corpus_filter = F.expr(corpus_filter)
        corpus = corpus.where(corpus_filter)
    c = _quantized_elements(corpus, id_col, "cid")
    dots = (
        q.join(c, "pos")
        .groupBy("qid", "cid")
        .agg(
            F.sum(F.col("v_qid") * F.col("v_cid")).alias("dot"),
            F.sum(F.col("v_qid") * F.col("v_qid")).alias("qq"),
            F.sum(F.col("v_cid") * F.col("v_cid")).alias("cc"),
        )
    )
    return dots.select(
        "qid",
        F.col("cid").alias(id_col),
        (F.col("dot") / (F.sqrt("qq") * F.sqrt("cc"))).alias("cos"),
    )


def cosine_topk(
    emb: DataFrame,
    query_ids: Sequence[int],
    k: int = 10,
    id_col: str = "vec_id",
    corpus_filter=None,
) -> DataFrame:
    """Exact top-k by cosine per query (excluding self), deterministic
    tie-break on (cos desc, vec_id asc). → (qid, vec_id, cos, rank).

    With ``corpus_filter`` this is FILTERED vector search (the
    metadata-constrained top-k every production vector store exposes)
    with pre-filter semantics: each query receives k results from the
    filtered corpus — never fewer because ranking preceded filtering.
    The predicate pushes down to the corpus scan; at 100 TB that is
    the difference between reading one partition-pruned slice and
    brute-forcing the corpus then discarding most of the ranking."""
    pairs = cosine_pairs(emb, query_ids, id_col, corpus_filter).where(
        F.col("qid") != F.col(id_col)
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        pairs.select("qid", id_col, "cos", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
    )


def cosine_topk_vectorized(
    emb: DataFrame, query_ids: Sequence[int], k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Throughput form: broadcast query matrix, numpy matmul per
    Arrow batch, per-batch top-k, final exact top-k via one tiny
    window. Output matches ``cosine_topk`` semantics within float
    tolerance (float32 BLAS vs exact SQL — NOT bit-identical; use
    the SQL form for the oracle gate)."""
    import pandas as pd

    qpdf = (
        emb.where(F.col(id_col).isin([int(i) for i in query_ids]))
        .select(id_col, "embedding")
        .toPandas()
    )
    qids = qpdf[id_col].to_numpy()
    qm = np.stack(qpdf["embedding"].to_numpy()).astype(np.float32)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    sc = emb.sparkSession.sparkContext
    b_q = sc.broadcast((qids, qm))

    schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField(id_col, T.LongType()),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def gen(batches):
        qids_, qm_ = b_q.value
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
            cm /= np.linalg.norm(cm, axis=1, keepdims=True)
            sims = qm_ @ cm.T  # (q, batch)
            cids = pdf[id_col].to_numpy()
            # mask self-matches BEFORE top-k so self-removal can't
            # starve a batch below k candidates
            for qi, qid in enumerate(qids_):
                sims[qi, cids == qid] = -np.inf
            kk = min(k, sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = {
                "qid": np.repeat(qids_, kk),
                id_col: cids[idx].ravel(),
                "cos": np.take_along_axis(sims, idx, axis=1).ravel().astype(np.float64),
            }
            yield pd.DataFrame(rows)

    partial = emb.select(id_col, "embedding").mapInPandas(gen, schema)
    partial = partial.where(F.col("qid") != F.col(id_col))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        partial.select("qid", id_col, "cos", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= k)
    )


def knn_classify(
    emb: DataFrame,
    query_ids: Sequence[int],
    k: int = 10,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """kNN label vote over the embedding space — the semantic
    propagation step of classifier-based curation (FineWeb-Edu-style
    quality labels, topic routing): each query's exact cosine top-k
    neighbors vote with their ``label_col``; the majority label wins,
    votes tying to the SMALLEST label (a min over the
    (-votes, label) struct — partial-aggregable, the t26 argmax
    shape).

    → (qid, pred_label, votes, mean_cos): the winning label, its
    vote count, and the mean similarity of ITS voters (grid-snapped
    to 2^-20 before the sum, so the k-term mean is an exact dyadic
    sum + one correctly-rounded division — bit-stable across
    engines and partial-agg orders).

    100-TB posture: the ranking is :func:`cosine_topk`'s plan (the
    scale path swaps in the IVF form unchanged — same (qid, vec_id)
    output contract); the label attach joins the tiny q×k top-k
    table against the corpus labels (broadcast-eligible, AQE
    decides); two partial-aggregable groupBys on qid-keyed rows.

    ``label_col`` must be an integral column (the output contract is
    a BIGINT ``pred_label``); a string/float label would otherwise be
    cast to long and silently become NULL (ADVICE r10) — map
    categorical labels to ids upstream."""
    from pyspark.sql import types as T

    if label_col not in emb.columns:
        # schema[...] would raise an opaque KeyError; keep the error
        # shape consistent with the integral-type one (ADVICE r11)
        raise ValueError(
            f"knn_classify: label_col {label_col!r} not found in "
            f"embedding columns {emb.columns}"
        )
    label_type = emb.schema[label_col].dataType
    if not isinstance(
        label_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        raise ValueError(
            f"knn_classify: label_col {label_col!r} must be integral "
            f"(byte/short/int/long), got {label_type.simpleString()}; "
            f"map categorical labels to ids before voting"
        )
    topk = cosine_topk(emb, query_ids, k=k, id_col=id_col)
    labels = emb.select(id_col, F.col(label_col).alias("nb_label"))
    g = F.lit(1048576.0)  # 2^-20 grid — the LP_GRID convention
    snapped = F.round(F.col("cos") * g, 0) / g
    votes = (
        topk.join(labels, id_col)
        .select("qid", "nb_label", snapped.alias("cos_s"))
        .groupBy("qid", "nb_label")
        .agg(
            F.count(F.lit(1)).alias("votes"),
            F.sum("cos_s").alias("sum_cos"),
        )
    )
    best = votes.groupBy("qid").agg(
        F.min(
            F.struct(
                (-F.col("votes")).alias("negv"),
                F.col("nb_label").alias("lbl"),
                F.col("sum_cos").alias("sc"),
            )
        ).alias("m")
    )
    return best.select(
        "qid",
        F.col("m.lbl").cast("long").alias("pred_label"),
        (-F.col("m.negv")).cast("long").alias("votes"),
        (F.col("m.sc") / (-F.col("m.negv")).cast("double")).alias("mean_cos"),
    )


# ------------------------------------------------------------------ IVF


def ivf_train(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    seed: int = 42,
    sample: int = 4096,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Train IVF centroids: seeded k-means on a driver-side sample
    (unit-normalized, spherical k-means). The sample is tiny relative
    to the corpus; at 100 TB you train on ~10^5 sampled rows and the
    result is a broadcastable (k, dim) float32 matrix.

    The sample is the ``sample`` smallest rows by a seeded xxhash64 of
    the id — a deterministic uniform draw that is independent of the
    corpus's physical order (a bare ``limit(n)`` takes the first n
    rows, which biases centroids on any sorted/clustered corpus),
    executed as a distributed TakeOrderedAndProject, not a full
    sort."""
    pdf = (
        emb.select("embedding", id_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(int(seed))))
        .limit(sample)
        .select("embedding")
        .toPandas()
    )
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-12
    rng = np.random.default_rng(seed)
    # k-means++ init (greedy, deterministic): each next centroid is
    # the sample point farthest (in cosine distance) from its nearest
    # chosen centroid — spreads initial centroids over the data and
    # makes the final clustering far less sensitive to sample order
    # than a uniform draw
    k = min(n_centroids, len(x))
    first = int(rng.integers(len(x)))
    chosen = [first]
    best_sim = x @ x[first]
    for _ in range(1, k):
        nxt = int(np.argmin(best_sim))
        chosen.append(nxt)
        np.maximum(best_sim, x @ x[nxt], out=best_sim)
    cent = x[chosen].copy()
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                cent[c] = v / (np.linalg.norm(v) + 1e-12)
    return cent


def ivf_assign(
    emb: DataFrame, centroids: np.ndarray, id_col: str = "vec_id"
) -> DataFrame:
    """(id, cluster) — one matmul per Arrow batch against the
    broadcast centroid matrix. Persist/write this next to the corpus;
    it is the IVF index."""
    import pandas as pd
    from pyspark.sql import types as T

    sc = emb.sparkSession.sparkContext
    b_c = sc.broadcast(centroids)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("cluster", T.IntegerType()),
        ]
    )

    def gen(batches):
        cent = b_c.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
            x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-12
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cluster": (x @ cent.T).argmax(axis=1).astype(np.int32),
                }
            )

    return emb.select(id_col, "embedding").mapInPandas(gen, schema)


def cosine_topk_ivf(
    emb: DataFrame,
    query_ids: "Sequence[int]",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    rerank: str = "vectorized",
) -> DataFrame:
    """IVF approximate top-k: probe only the ``nprobe`` clusters
    nearest each query, exact rerank inside them. The corpus side is
    pre-filtered by a broadcast semi-join on cluster ids — at scale
    this reads nprobe/n_centroids of the data instead of all of it
    (with the index persisted, partition-pruned).

    ``rerank``: ``"vectorized"`` (float32 BLAS, the throughput path)
    or ``"sql"`` (exact quantized-double scoring — bit-reproducible,
    used by the oracle gate)."""
    from pyspark.sql import functions as F

    cent = ivf_train(emb, n_centroids=n_centroids, id_col=id_col)
    assign = ivf_assign(emb, cent, id_col)

    qpdf = (
        emb.where(F.col(id_col).isin([int(i) for i in query_ids]))
        .select(id_col, "embedding")
        .toPandas()
    )
    qm = np.stack(qpdf["embedding"].to_numpy()).astype(np.float32)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True) + 1e-12
    probes = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]
    probe_clusters = sorted({int(c) for row in probes for c in row})

    spark = emb.sparkSession
    q_ids_df = spark.createDataFrame([(int(i),) for i in query_ids], f"{id_col} long")
    cand_ids = (
        assign.where(F.col("cluster").isin(probe_clusters))
        .select(id_col)
        .union(q_ids_df)  # queries must be present for vector lookup
        .distinct()
    )
    cand = emb.join(F.broadcast(cand_ids), id_col, "left_semi")
    if rerank == "sql":
        return cosine_topk(cand, query_ids, k=k, id_col=id_col)
    return cosine_topk_vectorized(cand, query_ids, k=k, id_col=id_col)


def ivf_build_index(
    emb: DataFrame,
    directory: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    seed: int = 42,
) -> np.ndarray:
    """Persist an IVF index: the corpus re-written PARTITIONED BY
    cluster (hive directories), plus the centroid matrix as a tiny
    parquet. At 100 TB this is the layout that makes ANN cheap:
    probing ``nprobe`` of ``n_centroids`` clusters is a partition-
    pruned scan (PartitionFilters on ``cluster``) that never touches
    the other directories' files. One shuffle at build time."""
    cent = ivf_train(emb, n_centroids=n_centroids, seed=seed, id_col=id_col)
    assign = ivf_assign(emb, cent, id_col)
    # batch_id=0 is the initial load; incremental batches append as
    # higher batch_id partitions (see ivf_append_batch) — queries
    # prune on cluster only, the batch level rides along harmlessly
    (
        emb.join(assign, id_col)
        .withColumn("batch_id", F.lit(0))
        .repartition("cluster")
        .write.mode("overwrite")
        .partitionBy("cluster", "batch_id")
        .parquet(f"{directory}/corpus")
    )
    spark = emb.sparkSession
    # Plain-Python rows + an explicit schema: correctness must not
    # depend on the session's Arrow config.  A pandas frame holding
    # numpy arrays only converts when arrow.pyspark.enabled=true;
    # with it off Spark falls back to _inferSchemaFromList and dies
    # with CANNOT_INFER_TYPE_FOR_FIELD (seen in the driver session).
    cent_rows = [
        (int(c), [float(v) for v in vec])
        for c, vec in enumerate(cent.astype(np.float32))
    ]
    spark.createDataFrame(
        cent_rows, "cluster int, centroid array<float>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{directory}/centroids")
    return cent


def cosine_topk_ivf_indexed(
    spark,
    directory: str,
    query_ids: "Sequence[int]",
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN over a persisted IVF index: load centroids (tiny), pick
    the ``nprobe`` nearest clusters per query, scan ONLY those
    cluster partitions (pruned at the parquet source), exact
    vectorized rerank. Queries are looked up from the index itself
    by id."""
    import pandas as pd  # noqa: F401

    cent_pdf = spark.read.parquet(f"{directory}/centroids").toPandas()
    cent_pdf = cent_pdf.sort_values("cluster")
    cent = np.stack(cent_pdf["centroid"].to_numpy()).astype(np.float32)

    corpus = spark.read.parquet(f"{directory}/corpus")
    qpdf = (
        corpus.where(F.col(id_col).isin([int(i) for i in query_ids]))
        .select(id_col, "embedding")
        .toPandas()
    )
    qm = np.stack(qpdf["embedding"].to_numpy()).astype(np.float32)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True) + 1e-12
    probes = np.argsort(-(qm @ cent.T), axis=1)[:, :nprobe]
    probe_clusters = sorted({int(c) for row in probes for c in row})

    cand = corpus.where(F.col("cluster").isin(probe_clusters)).select(
        id_col, "embedding"
    )
    return cosine_topk_vectorized(cand, query_ids, k=k, id_col=id_col)


# ------------------------------------------------------------------ LSH


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float32)


def cosine_lsh_buckets(
    emb: DataFrame, n_planes: int = 8, dim: int = 64, id_col: str = "vec_id"
) -> DataFrame:
    """Random-hyperplane LSH signature per vector → (id, bucket).
    Deterministic planes (seeded); signature bit j = sign(v · p_j).
    Computed JVM-side as 8 aggregate() dot products over the array —
    no Python, no shuffle."""
    planes = _hyperplanes(dim, n_planes)
    sig = None
    for j in range(n_planes):
        lits = F.array(*[F.lit(float(x)) for x in planes[j]])
        dot = F.aggregate(
            F.zip_with(F.col("embedding"), lits, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return emb.select(F.col(id_col), sig.cast("long").alias("bucket"))


def cosine_lsh_bands(
    emb: DataFrame,
    n_planes: int = 8,
    n_bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
) -> DataFrame:
    """OR-construction hyperplane LSH: ``n_bands`` independent
    signatures per vector (each from its own seeded plane set) →
    (id, band, bucket) rows. A pair is a candidate if ANY band
    collides: recall = 1 − (1 − p^planes)^bands, tunable without
    touching precision (the exact rerank handles that). All
    JVM-side aggregate() dot products; one explode, no shuffle."""
    structs = []
    for band in range(n_bands):
        planes = _hyperplanes(dim, n_planes, seed=42 + band)
        sig = None
        for j in range(n_planes):
            lits = F.array(*[F.lit(float(x)) for x in planes[j]])
            dot = F.aggregate(
                F.zip_with(F.col("embedding"), lits, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bit = F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
            sig = bit if sig is None else sig + bit
        structs.append(
            F.struct(
                F.lit(band).alias("band"), sig.cast("long").alias("bucket")
            )
        )
    return emb.select(
        F.col(id_col), F.explode(F.array(*structs)).alias("s")
    ).select(id_col, F.col("s.band").alias("band"), F.col("s.bucket").alias("bucket"))


def near_duplicates_embedding_lsh(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    n_bands: int = 1,
) -> DataFrame:
    """Embedding near-dup pairs at scale: bucket-join on LSH
    signatures, exact quantized-cosine rerank inside buckets →
    (id1, id2, cos ≥ threshold).

    ``n_bands=1`` (default — the oracle-gated spec form) is a single
    signature; recall is bounded by its collision probability.
    ``n_bands>1`` switches to the OR-construction
    (``cosine_lsh_bands``): candidates collide in ANY band, recall
    1 − (1 − p^planes)^bands, precision unchanged (exact rerank).
    Candidate join stays per-(band, bucket) — no cross-band blowup."""
    if n_bands > 1:
        b = cosine_lsh_bands(emb, n_planes, n_bands, dim, id_col)
        keys = ["band", "bucket"]
    else:
        b = cosine_lsh_buckets(emb, n_planes, dim, id_col)
        keys = ["bucket"]
    l = b.select(F.col(id_col).alias("id1"), *keys)
    r = b.select(F.col(id_col).alias("id2"), *keys)
    cand = l.join(r, keys).where(F.col("id1") < F.col("id2")).select("id1", "id2")
    if n_bands > 1:
        # a pair may collide in several bands — dedupe before rerank
        cand = cand.distinct()
    e1 = _quantized_elements(emb, id_col, "id1")
    e2 = _quantized_elements(emb, id_col, "id2")
    scored = (
        cand.join(e1, "id1")
        .join(e2, ["id2", "pos"])
        .groupBy("id1", "id2")
        .agg(
            F.sum(F.col("v_id1") * F.col("v_id2")).alias("dot"),
            F.sum(F.col("v_id1") * F.col("v_id1")).alias("n1"),
            F.sum(F.col("v_id2") * F.col("v_id2")).alias("n2"),
        )
        .select(
            "id1",
            "id2",
            (F.col("dot") / (F.sqrt("n1") * F.sqrt("n2"))).alias("cos"),
        )
    )
    return scored.where(F.col("cos") >= threshold)


# --------------------------------------------------------- SemDeDup


#: target members per sign-bit cluster when ``n_bits`` is auto —
#: ~1024 matches the SemDeDup paper's cluster granularity (k ≈ 10⁵
#: clusters for a 10⁸-doc corpus) and bounds the within-cluster
#: pairwise compare at ~n·512 pairs corpus-wide: LINEAR in n.
TARGET_CLUSTER_SIZE = 1024

#: mandatory per-cluster member cap for ``semantic_dedup`` — the d2
#: ``MAX_BUCKET`` analog.  A degenerate cluster (mass of identical
#: or near-zero embeddings) is excluded from the pairwise compare
#: entirely (its members default to keep=True) instead of emitting
#: O(B²) pairs.  4× the auto target: fires only on real skew.
MAX_CLUSTER = 4096


def _auto_n_bits(emb: DataFrame, id_col: str) -> int:
    """ceil(log2(n / TARGET_CLUSTER_SIZE)) clamped to [1, dim] — the
    cluster count grows WITH the corpus so per-cluster size stays
    ~constant.  A fixed small n_bits (the old default of 6 = 64
    clusters total) makes the within-cluster join O(n²/64) — at 10⁹
    docs that is ~10¹⁶ pairs, effectively all-pairs (VERDICT r4).
    Both probes are metadata-cheap: a parquet count and one row."""
    import math

    n = emb.count()
    first = emb.select(F.size("embedding").alias("d")).first()
    dim = int(first["d"]) if first is not None else 1
    if n <= TARGET_CLUSTER_SIZE:
        return 1
    return max(1, min(dim, math.ceil(math.log2(n / TARGET_CLUSTER_SIZE))))


def signbit_clusters(
    emb: DataFrame, n_bits: int | None = None, id_col: str = "vec_id"
) -> DataFrame:
    """Training-free coarse clustering: cluster id = sign bits of the
    first ``n_bits`` embedding coordinates (axis-aligned hyperplane
    signature).  Deterministic, no fitted state, exactly mirrorable
    in ANSI SQL — the 100-TB-safe default for ``semantic_dedup``
    (the k-means/IVF assignment from ``ivf_assign`` drops in when a
    trained codebook is worth its shuffle).

    ``n_bits=None`` (default) scales the cluster count with the
    corpus: ceil(log2(n / TARGET_CLUSTER_SIZE)) bits, so clusters
    hold ~1024 members at any scale."""
    if n_bits is None:
        n_bits = _auto_n_bits(emb, id_col)
    sig = None
    for j in range(n_bits):
        bit = F.when(
            F.element_at(F.col("embedding"), j + 1) > 0, F.lit(1 << j)
        ).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return emb.select(F.col(id_col), sig.cast("long").alias("cluster"))


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.8,
    n_bits: int | None = None,
    id_col: str = "vec_id",
    max_cluster: int | None = MAX_CLUSTER,
    form: str = "auto",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023 —
    public arXiv:2303.09540): coarse-cluster the corpus, compare
    embeddings only *within* a cluster, and drop every vector that
    has a cosine-``threshold`` neighbor with a smaller id in its
    cluster.  Unlike ``near_duplicates_embedding_lsh`` (which emits
    candidate PAIRS), this emits the curation DECISION — one row per
    vector: (id, cluster, keep).

    The keep rule "drop iff a smaller-id neighbor is within
    threshold" is deterministic and local to the cluster — no
    transitive closure, no iteration; exactly one representative
    (the smallest id) survives from any mutually-similar group.

    Scale posture: the pairwise compare is per-cluster (never
    all-pairs); the cluster count scales with the corpus (auto
    ``n_bits`` keeps clusters at ~TARGET_CLUSTER_SIZE members, so
    total candidate pairs ≈ n·512 — linear in n); clusters come from
    sign-bit bucketing (no training, no broadcast state); the final
    decision is one anti-join-shaped aggregate.  ``max_cluster`` is
    MANDATORY skew insurance (same ``_cap_buckets`` machinery as
    d2's MAX_BUCKET): members of a cluster above the cap skip the
    pairwise compare and default to keep=True — conservative (never
    a false drop), bounded (never O(B²) on a degenerate cluster).
    Pass ``max_cluster=None`` only when the cluster-size
    distribution is known benign.

    ``form``: "vectorized"/"auto" runs the within-cluster compare as
    a per-cluster numpy gram matrix (one Arrow group per cluster —
    group size is bounded by ``max_cluster``, so memory is bounded;
    a 4096×4096 f64 gram is 128 MB worst case, ~8 MB at the 1024
    auto target); "sql" runs the pos-explode join form.  Both
    quantize to the 2^-12 grid first, and products/sums of grid
    values are exact in f64, so the two forms are BIT-IDENTICAL
    (differential-tested); vectorized is ~10-50× faster at real
    cluster sizes."""
    from dask_traj_spark.operators.dedup import _cap_buckets

    clusters = signbit_clusters(emb, n_bits, id_col)
    capped = _cap_buckets(clusters, ["cluster"], max_cluster)
    if form not in ("auto", "vectorized", "sql"):
        raise ValueError(f"form must be auto/vectorized/sql, got {form!r}")
    if form in ("auto", "vectorized"):
        import numpy as np
        import pandas as pd

        thr = float(threshold)
        idc = id_col

        def _cluster_drops(pdf: "pd.DataFrame") -> "pd.DataFrame":
            ids = pdf[idc].to_numpy()
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            v = np.stack(pdf["embedding"].to_numpy()[order]).astype(np.float64)
            q = np.round(v * 4096.0) / 4096.0
            g = q @ q.T  # exact: products/sums of 2^-12-grid values
            norms = np.sqrt(np.diag(g))
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = g / np.outer(norms, norms)
            # drop iff ANY smaller-id row reaches the threshold —
            # strictly-lower triangle, same rule as the SQL form
            drop = np.any(np.tril(cos >= thr, k=-1), axis=1)
            return pd.DataFrame({idc: ids[drop]})

        dropped = (
            capped.join(emb.select(id_col, "embedding"), id_col)
            .groupBy("cluster")
            .applyInPandas(_cluster_drops, f"{id_col} long")
        )
    else:
        l = capped.select(F.col(id_col).alias("id1"), "cluster")
        r = capped.select(F.col(id_col).alias("id2"), "cluster")
        cand = l.join(r, "cluster").where(F.col("id1") < F.col("id2"))
        e1 = _quantized_elements(emb, id_col, "id1")
        e2 = _quantized_elements(emb, id_col, "id2")
        dup_pairs = (
            cand.join(e1, "id1")
            .join(e2, ["id2", "pos"])
            .groupBy("id1", "id2")
            .agg(
                F.sum(F.col("v_id1") * F.col("v_id2")).alias("dot"),
                F.sum(F.col("v_id1") * F.col("v_id1")).alias("n1"),
                F.sum(F.col("v_id2") * F.col("v_id2")).alias("n2"),
            )
            .where(
                F.col("dot") / (F.sqrt("n1") * F.sqrt("n2"))
                >= F.lit(float(threshold))
            )
        )
        dropped = dup_pairs.select(F.col("id2").alias(id_col)).distinct()
    # ONE left join, not an anti/semi union: the union form evaluated
    # the whole ``dropped`` pipeline (and the cluster scan) once per
    # branch — at sf0.1 that doubled every stage of a query whose
    # cost is pure fixed overhead, and at 100 TB it would re-run the
    # per-cluster compare twice.  ``dropped`` ids are unique (one row
    # per dropped vector in both forms), so the join is 1:≤1 and
    # keep = "no drop row matched".
    return clusters.join(
        dropped.select(F.col(id_col), F.lit(False).alias("keep")),
        id_col,
        "left",
    ).select(id_col, "cluster", F.coalesce("keep", F.lit(True)).alias("keep"))


# ----------------------------------------------- product quantization


def pq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 8,
    seed: int = 42,
    sample: int = 4096,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Train product-quantization codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", public TPAMI 2011):
    split the (unit-normalized) vector into ``m`` subvectors and run
    an independent seeded k-means with ``k`` centroids in each
    subspace.  Returns (m, k, dim/m) float32 — a few KiB, broadcast
    everywhere.  The memory story at 100 TB: a 64-dim float32 vector
    (256 B) compresses to ``m`` one-byte codes (8 B, 32×), so the
    whole corpus's codes fit in cluster RAM while the float vectors
    stay in parquet for the final rerank.

    Sampling matches ``ivf_train``: the ``sample`` smallest rows by
    seeded xxhash64(id) — deterministic, physical-order independent,
    a distributed TakeOrderedAndProject."""
    pdf = (
        emb.select("embedding", id_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(int(seed))))
        .limit(sample)
        .select("embedding")
        .toPandas()
    )
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-12
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, d_sub), dtype=np.float32)
    for j in range(m):
        xs = x[:, j * d_sub : (j + 1) * d_sub]
        # k-means++ -style greedy farthest-point init, deterministic
        first = int(rng.integers(len(xs)))
        chosen = [first]
        best_d = ((xs - xs[first]) ** 2).sum(axis=1)
        for _ in range(1, min(k, len(xs))):
            nxt = int(np.argmax(best_d))
            chosen.append(nxt)
            np.minimum(best_d, ((xs - xs[nxt]) ** 2).sum(axis=1), out=best_d)
        cent = xs[chosen].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(axis=1)
            for c in range(len(cent)):
                msk = assign == c
                if msk.any():
                    cent[c] = xs[msk].mean(axis=0)
        books[j, : len(cent)] = cent
        if len(cent) < k:
            books[j, len(cent):] = cent[-1]
    return books


def pq_encode(
    emb: DataFrame, codebooks: np.ndarray, id_col: str = "vec_id"
) -> DataFrame:
    """(id, codes ARRAY<INT>) — nearest-centroid code per subspace,
    vectorized per Arrow batch (one (B, k) distance matrix per
    subspace). Codes are the 32×-compressed corpus representation."""
    import pandas as pd

    spark = emb.sparkSession
    b_books = spark.sparkContext.broadcast(np.asarray(codebooks, dtype=np.float32))

    def gen(batches):
        books = b_books.value
        m, k, d_sub = books.shape
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
            x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-12
            codes = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                xs = x[:, j * d_sub : (j + 1) * d_sub]
                d2 = (
                    (xs ** 2).sum(1, keepdims=True)
                    - 2 * xs @ books[j].T
                    + (books[j] ** 2).sum(1)[None, :]
                )
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "codes": [row.tolist() for row in codes],
                }
            )

    return emb.select(id_col, "embedding").mapInPandas(
        gen, f"{id_col} long, codes array<int>"
    )


def pq_topk(
    emb: DataFrame,
    query_ids,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query a
    tiny (m, n_codes) lookup table of subspace distances is built
    driver-side and broadcast; each corpus vector's approximate
    distance is ``sum(LUT[j, code_j])`` — a table-gather per row, no
    float vectors touched after encoding.  Per-batch top-k before
    the final k-row reduction, like ``cosine_topk_vectorized``.
    Returns (qid, vec_id, approx_d2) — rerank the survivors with
    exact cosine when precision matters (v1/v3 machinery)."""
    import pandas as pd

    books = pq_train(emb, m=m, k=n_codes, seed=seed, id_col=id_col)
    codes = pq_encode(emb, books, id_col)
    qpdf = (
        emb.where(F.col(id_col).isin([int(i) for i in query_ids]))
        .select(id_col, "embedding")
        .toPandas()
    )
    q = np.stack(qpdf["embedding"].to_numpy()).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True) + 1e-12
    mm, kk, d_sub = books.shape
    luts = np.empty((len(q), mm, kk), dtype=np.float32)
    for j in range(mm):
        qs = q[:, j * d_sub : (j + 1) * d_sub]
        luts[:, j, :] = (
            (qs ** 2).sum(1, keepdims=True)
            - 2 * qs @ books[j].T
            + (books[j] ** 2).sum(1)[None, :]
        )
    spark = emb.sparkSession
    b_lut = spark.sparkContext.broadcast(luts)
    b_qids = spark.sparkContext.broadcast(qpdf[id_col].to_numpy())

    def gen(batches):
        lut = b_lut.value
        qids = b_qids.value
        nq, m_, _ = lut.shape
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (B, m)
            ids = pdf[id_col].to_numpy()
            # gather: for each query, sum LUT[j, c[:, j]] over j
            out_q, out_id, out_d = [], [], []
            for qi in range(nq):
                d = lut[qi][np.arange(m_)[None, :], c].sum(axis=1)  # (B,)
                top = np.argsort(d)[: min(len(d), max(k * 4, k))]
                out_q.extend([int(qids[qi])] * len(top))
                out_id.extend(ids[top].tolist())
                out_d.extend(d[top].tolist())
            yield pd.DataFrame({"qid": out_q, id_col: out_id, "approx_d2": out_d})

    partials = codes.mapInPandas(gen, f"qid long, {id_col} long, approx_d2 double")
    w = Window.partitionBy("qid").orderBy(
        F.col("approx_d2").asc(), F.col(id_col).asc()
    )
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", id_col, "approx_d2", "rank")
    )


def kmeans_cluster(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    seed: int = 42,
    sample: int = 4096,
    id_col: str = "vec_id",
) -> DataFrame:
    """First-class document/embedding clustering → (id, cluster,
    sim): seeded spherical k-means (k-means++ init) trained on a
    deterministic hash-ordered sample (``ivf_train``), then one
    broadcast-matmul assignment pass that also emits each point's
    cosine similarity to its assigned centroid.

    This is the topic-bucketing / corpus-partitioning primitive of a
    training-data pipeline (SemDeDup-style curation clusters, domain
    mixing); the IVF ANN index reuses the same two stages.

    100-TB posture: training touches only the ~10^4-row sample
    (distributed TakeOrderedAndProject, driver holds (k, dim));
    assignment is a map-only Arrow pass with the (k, dim) centroid
    matrix broadcast — no shuffle at all.
    """
    import pandas as pd
    from pyspark.sql import types as T

    cent = ivf_train(
        emb, n_centroids=k, iters=iters, seed=seed, sample=sample, id_col=id_col
    )
    sc = emb.sparkSession.sparkContext
    b_c = sc.broadcast(cent)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("sim", T.FloatType()),
        ]
    )

    def gen(batches):
        c = b_c.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
            x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-12
            sims = x @ c.T
            a = sims.argmax(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cluster": a.astype(np.int32),
                    "sim": sims[np.arange(len(a)), a].astype(np.float32),
                }
            )

    return emb.select(id_col, "embedding").mapInPandas(gen, schema)


def sq_train(emb: DataFrame, id_col: str = "vec_id") -> np.ndarray:
    """Per-dimension int8 scalar-quantization scales: the max |x̂_d|
    of the unit-normalized corpus per dimension — ONE exact
    aggregate over posexploded elements (no sampling, no
    iteration), returning a (dim,) float32 vector that broadcasts
    everywhere.  The 100-TB memory story one notch simpler than PQ:
    float32 (256 B) → int8 codes (64 B, 4×) with no codebook
    training and byte-wise integer dot products."""
    v = F.col("v").cast("double")
    el = emb.select(id_col, F.posexplode("embedding").alias("pos", "v"))
    norms = el.groupBy(id_col).agg(F.sqrt(F.sum(v * v)).alias("nrm"))
    rows = (
        el.join(norms, id_col)
        .groupBy("pos")
        .agg(F.max(F.abs(v / F.col("nrm"))).alias("s"))
        .orderBy("pos")
        .collect()
    )
    return np.array([r["s"] for r in rows], dtype=np.float32)


def sq_encode(
    emb: DataFrame, scales: np.ndarray, id_col: str = "vec_id"
) -> DataFrame:
    """(id, codes ARRAY<INT>) — int8 codes round(x̂_d/scale_d·127)
    clamped to [−127, 127], vectorized per Arrow batch."""
    import pandas as pd

    b_s = emb.sparkSession.sparkContext.broadcast(
        np.asarray(scales, dtype=np.float32)
    )

    def gen(batches):
        s = b_s.value + np.float32(1e-12)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
            x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-12
            codes = np.clip(np.rint(x / s * 127.0), -127, 127).astype(np.int32)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "codes": [row.tolist() for row in codes],
                }
            )

    return emb.select(id_col, "embedding").mapInPandas(
        gen, f"{id_col} long, codes array<int>"
    )


def sq_topk(
    emb: DataFrame,
    query_ids,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k over int8 scalar-quantized codes →
    (qid, vec_id, approx_score): the query codes ride along as a
    broadcast int32 matrix; each Arrow batch scores with ONE integer
    matmul (codes @ qcodes.T, scaled back by the per-dim scales) and
    keeps its local top-k, so the final window sees
    n_batches × k × n_queries rows.  Rerank the survivors with exact
    cosine when precision matters (same two-stage contract as PQ)."""
    import pandas as pd
    from pyspark.sql import Window

    spark = emb.sparkSession
    scales = sq_train(emb, id_col=id_col)
    qpdf = (
        emb.where(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(id_col, "embedding")
        .toPandas()
    )
    qx = np.stack(qpdf["embedding"].to_numpy()).astype(np.float32)
    qx /= np.linalg.norm(qx, axis=1, keepdims=True) + 1e-12
    s = scales + np.float32(1e-12)
    qcodes = np.clip(np.rint(qx / s * 127.0), -127, 127).astype(np.int32)
    # fold the per-dim scales into the query side once: score =
    # sum_d (c_d·s_d/127)·(q_d·s_d/127) = codes @ (qcodes·s²/127²).T
    qmat = (qcodes * (s * s)[None, :]).astype(np.float32)
    b_q = spark.sparkContext.broadcast(
        (qmat, qpdf[id_col].to_numpy(), scales)
    )

    def gen(batches):
        qm, qids_arr, sc = b_q.value
        sloc = sc + np.float32(1e-12)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
            x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-12
            codes = np.clip(np.rint(x / sloc * 127.0), -127, 127).astype(
                np.float32
            )
            scores = codes @ qm.T / np.float32(127.0 * 127.0)
            ids = pdf[id_col].to_numpy()
            out = {"qid": [], id_col: [], "approx_score": []}
            top = min(k, len(ids))
            for qi in range(scores.shape[1]):
                col = scores[:, qi]
                idx = np.argpartition(-col, top - 1)[:top]
                out["qid"].extend([qids_arr[qi]] * len(idx))
                out[id_col].extend(ids[idx])
                out["approx_score"].extend(col[idx])
            yield pd.DataFrame(out)

    local = emb.select(id_col, "embedding").mapInPandas(
        gen, f"qid long, {id_col} long, approx_score float"
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("approx_score").desc(), F.col(id_col).asc()
    )
    return (
        local.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .drop("rk")
    )


def ivf_append_batch(
    emb_batch: DataFrame,
    batch_id: int,
    directory: str,
    id_col: str = "vec_id",
) -> None:
    """Incremental IVF ingest: assign a new micro-batch against the
    index's FROZEN centroids (read from ``directory/centroids``) and
    write it into the corpus as ``(cluster, batch_id)`` partitions
    with dynamic overwrite — replaying a crashed batch rewrites
    exactly its own partitions, so the index never holds a vector
    twice (the sx5 gate proves this value-level: the reloaded corpus
    must reproduce the exact brute-force top-k).

    Centroids are deliberately NOT retrained per batch: stable
    centroids keep every prior partition's assignment valid, which
    is what makes appends pure partition-adds.  Re-train + rebuild
    when drift accumulates (an offline compaction, like the
    versioned-state pruning in streaming/ingest.py)."""
    import pandas as pd  # noqa: F401

    spark = emb_batch.sparkSession
    cent_pdf = (
        spark.read.parquet(f"{directory}/centroids").toPandas().sort_values("cluster")
    )
    cent = np.stack(cent_pdf["centroid"].to_numpy()).astype(np.float32)
    assign = ivf_assign(emb_batch, cent, id_col)
    (
        emb_batch.join(assign, id_col)
        .withColumn("batch_id", F.lit(int(batch_id)))
        .repartition("cluster")
        .write.mode("overwrite")
        .partitionBy("cluster", "batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(f"{directory}/corpus")
    )


def cosine_topk_ivf_pq(
    emb: DataFrame,
    query_ids,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    rerank_depth: int = 100,
    seed: int = 42,
    id_col: str = "vec_id",
) -> DataFrame:
    """The production ANN ladder composed end to end (IVF × PQ ×
    exact rerank — the IVFPQ shape of Jégou et al. 2011 / FAISS
    docs, both public): coarse IVF pruning reads only the ``nprobe``
    of ``n_centroids`` clusters nearest each query (partition-pruned
    scan when the index is persisted), PQ ADC scoring ranks the
    survivors touching only the 32×-compressed codes, and the float
    vectors are read back for just the top ``rerank_depth``
    candidates per query for the exact-cosine top-k.

    Returns (qid, vec_id, cos, rank).

    100-TB posture per stage: train = driver-side k-means on a
    seeded hash sample; assign/encode = map-only broadcast-matmul
    passes; candidate pruning = one broadcast semi-join; ADC = LUT
    gather per Arrow batch with per-batch top-``rerank_depth``; the
    only full-width data read after encoding is ``rerank_depth``
    rows per query."""
    import pandas as pd
    from pyspark.sql import Window

    cent = ivf_train(emb, n_centroids=n_centroids, seed=seed, id_col=id_col)
    assign = ivf_assign(emb, cent, id_col)
    books = pq_train(emb, m=m, k=n_codes, seed=seed, id_col=id_col)

    qpdf = (
        emb.where(F.col(id_col).isin([int(i) for i in query_ids]))
        .select(id_col, "embedding")
        .toPandas()
    )
    q = np.stack(qpdf["embedding"].to_numpy()).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True) + 1e-12
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    probe_clusters = sorted({int(c) for row in probes for c in row})

    cand_ids = (
        assign.where(F.col("cluster").isin(probe_clusters)).select(id_col)
    )
    cand_emb = emb.join(F.broadcast(cand_ids), id_col, "left_semi")
    codes = pq_encode(cand_emb, books, id_col)

    mm, kk, d_sub = books.shape
    luts = np.empty((len(q), mm, kk), dtype=np.float32)
    for j in range(mm):
        qs = q[:, j * d_sub : (j + 1) * d_sub]
        luts[:, j, :] = (
            (qs ** 2).sum(1, keepdims=True)
            - 2 * qs @ books[j].T
            + (books[j] ** 2).sum(1)[None, :]
        )
    spark = emb.sparkSession
    b_lut = spark.sparkContext.broadcast(luts)
    b_qids = spark.sparkContext.broadcast(qpdf[id_col].to_numpy())

    def adc(batches):
        lut = b_lut.value
        qids = b_qids.value
        nq, m_, _ = lut.shape
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            ids = pdf[id_col].to_numpy()
            out_q, out_id, out_d = [], [], []
            for qi in range(nq):
                d = lut[qi][np.arange(m_)[None, :], c].sum(axis=1)
                top = np.argsort(d)[: min(len(d), rerank_depth)]
                out_q.extend([int(qids[qi])] * len(top))
                out_id.extend(ids[top].tolist())
                out_d.extend(d[top].tolist())
            yield pd.DataFrame({"qid": out_q, id_col: out_id, "approx_d2": out_d})

    partials = codes.mapInPandas(adc, f"qid long, {id_col} long, approx_d2 double")
    wa = Window.partitionBy("qid").orderBy(
        F.col("approx_d2").asc(), F.col(id_col).asc()
    )
    survivors = (
        partials.withColumn("rk", F.row_number().over(wa))
        .where(F.col("rk") <= rerank_depth)
        .select("qid", id_col)
    )

    # exact rerank: read float vectors for survivors only
    b_qvec = spark.sparkContext.broadcast(
        {int(i): q[r] for r, i in enumerate(qpdf[id_col].to_numpy())}
    )

    def rerank(batches):
        qvec = b_qvec.value
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
            v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-12
            qm = np.stack([qvec[int(i)] for i in pdf["qid"]])
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"].to_numpy(),
                    id_col: pdf[id_col].to_numpy(),
                    "cos": (v * qm).sum(axis=1).astype(np.float64),
                }
            )

    scored = (
        # survivors ≈ rerank_depth × n_queries rows — broadcast them
        # so the full-width corpus never shuffles for the rerank
        F.broadcast(survivors).join(emb.select(id_col, "embedding"), id_col)
        .select("qid", id_col, "embedding")
        .mapInPandas(rerank, f"qid long, {id_col} long, cos double")
        .where(F.col("qid") != F.col(id_col))  # self-match excluded,
        # matching cosine_topk/_vectorized semantics
    )
    wr = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= k)
        .select("qid", id_col, "cos", "rank")
    )


def embedding_diversity(
    emb: DataFrame, strata_col: str = "label", id_col: str = "vec_id"
) -> DataFrame:
    """Per-stratum embedding diversity: the MEAN PAIRWISE COSINE of a
    group's vectors WITHOUT any pairwise join, via the sum identity
    mean_{i≠j} cos(u_i, u_j) = (|Σu|² − Σ|u|²) / (n(n−1)) over
    normalized vectors — high mean cosine = a semantically collapsed
    slice (near-dup farm, templated source), low = diverse.  The
    corpus-diversity diagnostic next to d6's per-pair decisions, at
    aggregation cost O(n·dim) instead of O(n²·dim).

    → (``strata_col``, n_vectors, mean_pairwise_cos), strata with
    n ≥ 2 only.

    Determinism: elements snap to the 2^-12 grid; each vector's norm
    is the sqrt of an exact dyadic sum (correctly rounded, identical
    in both engines); normalized components snap to 2^-20 (exact
    dyadics), so Σu per (stratum, pos) and Σ|u|² are exact sums;
    both squared terms are snapped again before their final sums
    (the t24 product rule).  The one closing division is correctly
    rounded from exact operands.

    100-TB posture: three keyed partial+final aggregations
    ((stratum, vec) norms → (stratum, pos) component sums → stratum
    rollup) plus one keyed join for the normalize — never a pairwise
    join, never SinglePartition; |strata| rows out."""
    g20 = F.lit(1048576.0)

    def _snap(c):
        return F.round(c * g20, 0) / g20

    e = emb.select(
        F.col(strata_col).alias("st"),
        F.col(id_col).alias("vid"),
        F.posexplode("embedding").alias("pos", "_v"),
    ).select(
        "st",
        "vid",
        "pos",
        (F.round(F.col("_v").cast("double") * QGRID, 0) / QGRID).alias("v"),
    )
    # zero-norm vectors carry no direction: EXCLUDE them from both
    # the sums and the count (session-6 review finding: v/0 is NULL
    # in Spark, so a zero vector silently vanished from the sums
    # while still inflating n — mirrored as nrm > 0 in the oracle)
    nr = e.groupBy("st", "vid").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm")
    ).where(F.col("nrm") > 0)
    u = e.join(nr, ["st", "vid"]).select(
        "st", "vid", "pos", _snap(F.col("v") / F.col("nrm")).alias("u")
    )
    per_pos = u.groupBy("st", "pos").agg(F.sum("u").alias("s"))
    s2 = per_pos.groupBy("st").agg(
        F.sum(_snap(F.col("s") * F.col("s"))).alias("s2")
    )
    q = u.groupBy("st").agg(
        F.sum(_snap(F.col("u") * F.col("u"))).alias("qq"),
        F.countDistinct("vid").alias("n"),
    )
    n = F.col("n").cast("double")
    return (
        s2.join(q, "st")
        .where(F.col("n") >= 2)
        .select(
            F.col("st").alias(strata_col),
            F.col("n").cast("long").alias("n_vectors"),
            ((F.col("s2") - F.col("qq")) / (n * (n - F.lit(1.0)))).alias(
                "mean_pairwise_cos"
            ),
        )
    )
