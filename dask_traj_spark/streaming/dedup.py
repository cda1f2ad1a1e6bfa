"""Streaming near-duplicate detection over a document stream.

The batch dedup operators (``operators/dedup.py``) answer "which
pairs in this corpus are near-dups"; a training-data INGEST pipeline
needs the incremental form: as documents stream in, flag each
micro-batch's docs against everything already ingested, then fold the
batch into the state. This module implements that as a
``foreachBatch`` loop reusing the batch MinHash/LSH machinery:

per micro-batch
  1. hashed token ids → minhash signatures → LSH band rows for the
     NEW docs only (the batch);
  2. candidates = new band rows ⋈ (stored ∪ new) band rows on
     (band, bh) — every candidate pair touches ≥1 new doc, so work
     per batch scales with the batch, not the corpus;
  3. exact-Jaccard verify against the token-set store (new ∪ old);
  4. matches land in a results table, and the batch's band rows +
     token sets are folded into the state store.

Exactly-once: every write (results, band store, token store) is a
dynamic partition overwrite of that batch's own ``batch_id``
partition — the same idempotent-replay contract as the bucketed
coords ingest (``sources/bucketed.py``). A replayed batch replaces
its own partitions and recomputes the same matches.

Scale posture: the state tables are plain parquet appended one
partition per batch; at 100 TB you would additionally bucket the
band store by (band, bh) so step 2's join is co-located, and compact
partitions out of band — both mechanics exist in
``sources/bucketed.py`` and apply unchanged. The LSH bucket cap
bounds degenerate boilerplate buckets exactly as in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dask_traj_spark.operators.dedup import (
    MAX_BUCKET,
    _band_candidates,
    _cap_buckets,
    _doc_token_ids,
    _jaccard_verify,
    _signatures_from,
)
from dask_traj_spark.operators.dedup import BAND_MIX, N_BANDS  # noqa: F401


def _band_rows(sig: DataFrame) -> DataFrame:
    """(doc_id, band, bh) rows from a signature table."""
    return sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.col(f"h{2 * b}") * BAND_MIX + F.col(f"h{2 * b + 1}")
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band", "bh"),
    )


def _read_or_empty(
    spark: SparkSession, path: str, schema: str, before_batch: int
) -> DataFrame:
    """Read a ``batch_id``-partitioned state table, keeping only
    partitions written by batches BEFORE ``before_batch``.

    A replayed batch (data files committed, checkpoint commit lost)
    finds its OWN ``batch_id`` partition already on disk; excluding it
    makes the state read identical to the pre-crash view, so the
    recomputed Jaccard values (which count both intersections and
    set sizes over this state) are bit-identical — the exactly-once
    contract. Existence is probed by attempting the read, which works
    on any Hadoop FileSystem URI (hdfs://, s3a://), unlike a local
    glob."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(path)
    except AnalysisException:
        return spark.createDataFrame([], schema)
    return df.where(
        F.col("batch_id").cast("long") < int(before_batch)
    ).drop("batch_id")


def _overwrite_batch_partition(df: DataFrame, path: str, batch_id: int) -> None:
    # per-write option only (no session-wide conf mutation): dynamic
    # mode replaces exactly this batch's partition on replay
    (
        df.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )


def process_neardup_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    results_dir: str,
    threshold: float = 0.8,
    text_col: str = "text",
    max_bucket: int | None = MAX_BUCKET,
) -> None:
    """One micro-batch of the incremental near-dup loop (the
    ``foreachBatch`` body — also callable directly on a batch
    DataFrame for backfills).

    State posture: unlike the lag-BOUNDED MSM carry
    (:func:`process_transition_batch`), near-dup state is inherently
    GLOBAL — a new document can collide with any earlier one, so the
    band join must see every prior band row.  The per-batch cost is
    one bucketed join against the full band table (not all-pairs);
    at 100 TB the state tables would additionally be bucketed by
    (band, bh) on disk so the join co-locates without a shuffle."""
    from pyspark import StorageLevel

    spark = batch_df.sparkSession
    dt_new = (
        _doc_token_ids(batch_df, text_col)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    bands_new = _band_rows(_signatures_from(dt_new)).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    bands_old = _read_or_empty(
        spark, f"{state_dir}/bands", "doc_id long, band int, bh long", batch_id
    ).select("doc_id", "band", "bh")
    dt_old = _read_or_empty(
        spark, f"{state_dir}/tokens", "doc_id long, tid long", batch_id
    ).select("doc_id", "tid")

    all_bands = _cap_buckets(
        bands_old.unionByName(bands_new), ["band", "bh"], max_bucket
    )
    n = bands_new.select(F.col("doc_id").alias("doc_new"), "band", "bh")
    cand = (
        n.join(all_bands, ["band", "bh"])
        .where(F.col("doc_new") != F.col("doc_id"))
        .select(
            F.least("doc_new", "doc_id").alias("doc1"),
            F.greatest("doc_new", "doc_id").alias("doc2"),
        )
        .distinct()
    )
    dt_all = dt_old.unionByName(dt_new.select("doc_id", F.col("tid").cast("long")))
    # _jaccard_verify takes PACKED sets (the batch path fuses this
    # packing into its signature aggregate); the streaming state stays
    # exploded (doc_id, tid) on disk — schema-pinned — so pack here
    sets_all = dt_all.groupBy("doc_id").agg(F.collect_set("tid").alias("s"))
    matches = _jaccard_verify(cand, sets_all).where(F.col("jaccard") >= threshold)

    _overwrite_batch_partition(matches, results_dir, batch_id)
    _overwrite_batch_partition(
        dt_new.select("doc_id", F.col("tid").cast("long")),
        f"{state_dir}/tokens",
        batch_id,
    )
    _overwrite_batch_partition(bands_new, f"{state_dir}/bands", batch_id)
    # all three writes above are actions — release the per-batch
    # caches or a long stream pins one cached RDD pair per batch
    # (ADVICE r10; same lifecycle as process_winnow_batch)
    dt_new.unpersist()
    bands_new.unpersist()


def stream_neardup_minhash(
    docs_stream: DataFrame,
    state_dir: str,
    results_dir: str,
    checkpoint: str,
    threshold: float = 0.8,
    text_col: str = "text",
    max_bucket: int | None = MAX_BUCKET,
    available_now: bool = True,
):
    """Run the incremental MinHash-LSH near-dup loop over a document
    stream (``doc_id`` + text column). Returns the StreamingQuery.

    Results land in ``results_dir`` as (doc1, doc2, jaccard,
    batch_id) — every pair involving ≥1 doc of that batch with
    Jaccard ≥ threshold against the corpus ingested so far."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        process_neardup_batch(
            batch_df,
            batch_id,
            state_dir,
            results_dir,
            threshold=threshold,
            text_col=text_col,
            max_bucket=max_bucket,
        )

    writer = docs_stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ------------------------------------------------------- exact dedup


def process_exact_dedup_batch(
    batch_df: DataFrame, batch_id: int, state_dir: str, text_col: str = "text"
) -> None:
    """foreachBatch body for incremental EXACT dedup: write this
    batch's partial groups (h, keep_id, n) into a batch_id-
    partitioned state table.  The partial depends only on the
    batch's own rows and dynamic partition overwrite replaces the
    partition wholesale, so crash-replay is idempotent by
    construction — a strictly simpler exactly-once story than the
    near-dup loop above (no cross-batch reads at write time at all).
    """
    h = F.md5(F.encode(F.col(text_col), "UTF-8"))
    partial = batch_df.groupBy(h.alias("h")).agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n"),
    )
    _overwrite_batch_partition(partial, state_dir, batch_id)


def exact_dedup_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Global exact-dedup view over every batch partial: (h, keep_id,
    n) with keep_id = min over batches, n = sum — the associative
    merge, identical to running the batch operator over the full
    corpus (gated by sx2 against d1's value oracle)."""
    st = spark.read.parquet(state_dir).drop("batch_id")
    return st.groupBy("h").agg(
        F.min("keep_id").alias("keep_id"), F.sum("n").alias("n")
    )


# ----------------------------------------------- incremental SemDeDup


def process_semantic_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    results_dir: str,
    threshold: float = 0.8,
    n_bits: int = 6,
    id_col: str = "vec_id",
) -> None:
    """One micro-batch of incremental semantic dedup (the streaming
    twin of d6's SemDeDup): write this batch's cluster members into
    the batch_id-partitioned state table, then emit THIS batch's
    keep/drop decisions by comparing its members against every
    earlier member of the same cluster (state partitions < batch_id
    — never its own, the ADVICE-r4 crash-replay rule) plus
    smaller-id members inside the batch.

    Exactly-once: the state partial is a pure function of the
    batch's own rows; the decisions depend on that partial and the
    UNTOUCHED earlier partitions; dynamic overwrite replaces both
    partitions wholesale on replay.

    Close-is-final requires id-ordered batches (each batch's ids all
    exceed the previous batch's — the shape an id-monotone ingest
    delivers): a vector's drop rule quantifies over smaller ids
    only, and all of those are already in state.  Under that
    ordering the union of per-batch decisions equals the one-shot
    batch ``semantic_dedup`` BITWISE — same grid quantization, same
    gram-matrix kernel (gated by sx6 against d6's oracle).

    100-TB posture: state is one row per vector partitioned by
    batch (append-shaped writes); the compare is per-cluster
    ``applyInPandas`` with the same bounded-group properties as the
    batch operator (callers wanting the cap apply ``_cap_buckets``
    on the state read)."""
    import numpy as np
    import pandas as pd

    from dask_traj_spark.operators.similarity import signbit_clusters

    spark = batch_df.sparkSession
    clusters = signbit_clusters(batch_df, n_bits, id_col)
    members = clusters.join(batch_df.select(id_col, "embedding"), id_col)
    _overwrite_batch_partition(
        members.select("cluster", id_col, "embedding"), state_dir, batch_id
    )

    prior = _read_or_empty(
        spark, state_dir,
        f"cluster long, {id_col} long, embedding array<float>",
        batch_id,
    ).withColumn("is_new", F.lit(False))
    cur = members.select("cluster", id_col, "embedding").withColumn(
        "is_new", F.lit(True)
    )
    thr = float(threshold)
    idc = id_col

    def decide(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf[idc].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        new = pdf["is_new"].to_numpy()[order]
        v = np.stack(pdf["embedding"].to_numpy()[order]).astype(np.float64)
        q = np.round(v * 4096.0) / 4096.0
        g = q @ q.T
        norms = np.sqrt(np.diag(g))
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = g / np.outer(norms, norms)
        drop = np.any(np.tril(cos >= thr, k=-1), axis=1)
        keep_new = new  # emit decisions only for this batch's rows
        return pd.DataFrame(
            {
                idc: ids[keep_new],
                "cluster": pdf["cluster"].iloc[0],
                "keep": ~drop[keep_new],
            }
        )

    decisions = (
        prior.unionByName(cur)
        .groupBy("cluster")
        .applyInPandas(decide, f"{idc} long, cluster long, keep boolean")
    )
    _overwrite_batch_partition(decisions, results_dir, batch_id)


def semantic_dedup_results(spark: SparkSession, results_dir: str) -> DataFrame:
    """Union of per-batch SemDeDup decisions — under id-ordered
    batches, identical to the one-shot batch operator (gated by sx6
    against d6's value oracle)."""
    return spark.read.parquet(results_dir).drop("batch_id")


# ------------------------------------------------ incremental count-min


def process_cms_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    text_col: str = "text",
    id_mode: str = "hashed",
    vocab_df: DataFrame | None = None,
) -> None:
    """One micro-batch of the incremental count-min sketch: the
    batch's OWN cell partial (a pure function of its rows — cells
    are associative sums) written as partition ``batch_id`` —
    replay-idempotent by construction, the sx2 class.  In production
    ('hashed') keys are xxhash64 of the word, naturally
    batch-independent; the oracle-gated twin passes a corpus
    ``vocab_df`` for its 'mult' keys."""
    from dask_traj_spark.functions.text import count_min_cells

    partial = count_min_cells(
        batch_df, text_col, id_mode=id_mode, vocab_df=vocab_df
    )
    _overwrite_batch_partition(partial, state_dir, batch_id)


def cms_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Merged sketch over every batch partial: cell-wise sum —
    identical to the one-pass batch sketch (gated by sx7 against
    t14's oracle construction)."""
    st = spark.read.parquet(state_dir).drop("batch_id")
    return st.groupBy("row", "col").agg(F.sum("n").alias("n"))


# ------------------------------------------------ incremental Bloom


def process_bloom_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    col: str = "text",
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
) -> None:
    """One micro-batch of the incremental cross-corpus Bloom filter:
    the batch's OWN bitmap partial (a pure function of its rows —
    bit_or cells are associative, the sx2/sx7 exactly-once class)
    written as partition ``batch_id``, replay-idempotent by
    construction.  The running filter answers "was this seen in ANY
    earlier batch" without ever re-reading the ingested data."""
    from dask_traj_spark.operators.dedup import bloom_build

    partial = bloom_build(batch_df, col=col, n_bits=n_bits, n_hashes=n_hashes)
    _overwrite_batch_partition(partial, state_dir, batch_id)


def bloom_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Merged bitmap over every batch partial: word-wise bit_or —
    identical to the one-shot ``bloom_build`` over the union of the
    batches (gated bitwise by sx9)."""
    st = spark.read.parquet(state_dir).drop("batch_id")
    return st.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


# ------------------------------------------- incremental MSM counting


def process_transition_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    results_dir: str,
    value_col: str = "v",
    bin_width: float = 0.015625,
    lag: int = 1,
    key_col: str = "frame_id",
) -> None:
    """One micro-batch of incremental MSM transition counting — the
    THIRD exactly-once shape after the associative (sx2/sx3/sx7) and
    versioned-fold (sx4) classes: lag pairs SPAN batch boundaries,
    so each batch persists its own (t, state) rows as state and
    counts exactly the pairs whose LATER frame lands in this batch —
    earlier frames come from strictly-earlier state partitions
    (never its own — crash-replay reads the pre-crash view) or from
    the batch itself.  Each (t, t+lag) pair is counted by exactly
    one batch, and both writes are idempotent partition overwrites.

    Requires time-ordered batches (each batch's frame ids exceed the
    previous batch's), the same close-is-final shape as
    sessionization/sx6.

    Carry-state bound: only frames within ``lag`` of a batch's END
    can ever pair with a later batch (time-ordered batches ⇒ a frame
    needed by batch k satisfies t ≥ start_k − lag > max_t_j − lag for
    every earlier batch j), so each batch persists just its trailing
    ``lag`` frames — per-batch state is O(lag), and the per-batch
    read is O(lag · #batches) rows instead of the whole stream
    history (which made cumulative cost O(n²)).  The merged counts
    are unchanged; replay still rewrites the same carry partition."""
    from dask_traj_spark.operators.distance import ACF_GRID

    spark = batch_df.sparkSession
    bw = float(bin_width)
    q = F.round(F.col(value_col).cast("double") * ACF_GRID, 0) / ACF_GRID
    st = batch_df.select(
        F.col(key_col).alias("t"),
        F.floor(q / F.lit(bw)).cast("long").alias("state"),
    )
    # one scalar job per micro-batch (driver state O(1)) to find the
    # batch end; the carry is the trailing-lag slice only
    mx = st.agg(F.max("t").alias("mx")).first()["mx"]
    carry = st if mx is None else st.where(F.col("t") > int(mx) - int(lag))
    _overwrite_batch_partition(carry, state_dir, batch_id)

    prior = _read_or_empty(spark, state_dir, "t long, state long", batch_id)
    earlier = prior.unionByName(st)
    a = earlier.select((F.col("t") + int(lag)).alias("tt"),
                       F.col("state").alias("from_state"))
    b = st.select(F.col("t").alias("tt"), F.col("state").alias("to_state"))
    partial = (
        a.join(b, "tt")
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    _overwrite_batch_partition(partial, results_dir, batch_id)


def transition_counts_state(spark: SparkSession, results_dir: str) -> DataFrame:
    """Merged transition-count view: per-batch partials sum — under
    time-ordered batches identical to the one-pass batch operator
    (gated by sx8 against x22's value oracle)."""
    st = spark.read.parquet(results_dir).drop("batch_id")
    return st.groupBy("from_state", "to_state").agg(F.sum("n").alias("n"))


# --------------------------------------------- incremental winnowing


def process_winnow_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    results_dir: str,
    k: int = 3,
    w: int = 4,
    min_shared: int = 1,
    max_df: int | None = None,
    text_col: str = "text",
) -> None:
    """foreachBatch body for incremental MOSS-style winnowing
    matches (the streaming twin of ``winnow_matches``): fingerprint
    the NEW docs (xxhash64 — stateless, so fingerprints are
    batch-stable and cross-batch joins are meaningful), match them
    against the accumulated fingerprint state, fold the batch in.

    Every emitted pair touches >= 1 new doc, so per-batch work
    scales with the batch (one fp-keyed join against the state),
    not the corpus.  Because a document's complete fingerprint set
    arrives with its batch, a pair's n_shared — counted when its
    LATER member arrives — equals the one-shot batch value, and the
    per-batch result union equals ``winnow_matches`` exactly in the
    uncapped form (gated by sx11).  With ``max_df`` set, the cap
    sees only the prefix corpus, so a fingerprint that outgrows the
    cap later keeps its earlier matches — the incremental result is
    a superset of the capped one-shot (same class of documented
    divergence as sx1's bucket cap).

    Exactly-once: results and state are dynamic partition
    overwrites of this batch's own partition; state reads keep only
    strictly-earlier batches (``_read_or_empty``), so crash-replay
    recomputes bit-identical output.
    """
    from pyspark import StorageLevel

    from dask_traj_spark.functions.text import winnow_fingerprints

    spark = batch_df.sparkSession
    fps_new = (
        winnow_fingerprints(batch_df, k=k, w=w, text_col=text_col)
        .select("doc_id", "fp")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    fps_old = _read_or_empty(
        spark, state_dir, "doc_id long, fp long", batch_id
    )
    all_fps = _cap_buckets(fps_old.unionByName(fps_new), ["fp"], max_df)
    new_side = all_fps.join(
        fps_new.select("doc_id").distinct(), "doc_id", "left_semi"
    )
    pairs = (
        new_side.select(F.col("doc_id").alias("da"), "fp")
        .join(all_fps.select(F.col("doc_id").alias("db"), "fp"), "fp")
        .where(F.col("da") != F.col("db"))
        .select(
            F.least("da", "db").alias("doc1"),
            F.greatest("da", "db").alias("doc2"),
            "fp",
        )
        # a same-batch pair arrives in both join directions; distinct
        # fp counting collapses them (and is the pair's true n_shared)
        .groupBy("doc1", "doc2")
        .agg(F.countDistinct("fp").alias("n_shared"))
        .where(F.col("n_shared") >= F.lit(int(min_shared)))
    )
    _overwrite_batch_partition(pairs, results_dir, batch_id)
    _overwrite_batch_partition(fps_new, state_dir, batch_id)
    fps_new.unpersist()
