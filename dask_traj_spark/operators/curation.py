"""Corpus-curation operators a large-scale training-data pipeline
needs beyond dedup: benchmark decontamination, deterministic
stratified sampling (data mixing), and intra-document repetition
scoring.

Beyond-reference capability block (the reference is a trajectory
engine; these extend the engine's `documents` surface the same way
dedup/similarity do). All three are pure DataFrame plans — no UDFs,
partial+final aggregations only.

Scale posture:

- ``decontaminate``: the benchmark n-gram set is tiny relative to
  the corpus (a benchmark suite is ~10^6 n-grams) and is broadcast;
  the corpus side streams its n-grams through one broadcast
  left-semi-style join and a per-doc partial+final agg — the corpus
  is never shuffled except on doc_id for the count.
- ``stratified_sample``: one shuffle on the stratum key; the
  per-stratum rank is a window over each stratum's rows only (no
  global sort, no single-partition exchange).
- ``repetition_score``: per-doc agg only — map-side combine
  collapses each doc's bigrams before any exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dask_traj_spark.functions.text import LP_GRID, tokens
from dask_traj_spark.session import track_cache


def _word_ngrams(docs: DataFrame, n: int, text_col: str = "text") -> DataFrame:
    """(doc_id, gram) DISTINCT word n-grams, '_'-joined. Built from
    position-joined whitespace tokens so the DuckDB oracles can
    mirror the construction exactly."""
    tok = tokens(docs, text_col)
    out = tok.select("doc_id", "pos", F.col("word").alias("g0"))
    for k in range(1, n):
        nxt = tok.select(
            "doc_id", (F.col("pos") - k).alias("pos"),
            F.col("word").alias(f"g{k}"),
        )
        out = out.join(nxt, ["doc_id", "pos"])
    gram = F.concat_ws("_", *[f"g{k}" for k in range(n)])
    return out.select("doc_id", gram.alias("gram")).distinct()


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-overlap decontamination: for every corpus document,
    how many of its distinct word ``n``-grams appear anywhere in the
    ``benchmark`` document set (the test-set-leakage signal used to
    drop contaminated training documents).

    Returns (doc_id, n_grams, n_contaminated, contamination) where
    ``contamination = n_contaminated / n_grams`` (0.0 for documents
    too short to have any n-gram). Decide the drop threshold
    downstream; docs that ARE benchmark members score 1.0 by
    construction.
    """
    corpus = _word_ngrams(docs, n, text_col)
    bench = F.broadcast(
        _word_ngrams(benchmark, n, text_col).select("gram").distinct()
    )
    hits = (
        corpus.join(bench, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    totals = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    base = docs.select("doc_id")
    return (
        base.join(totals, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.coalesce("n_contaminated", F.lit(0)).cast("double")
                / F.col("n_grams").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("contamination"),
        )
    )


# multiplicative (Knuth) ordering constant — exact BIGINT arithmetic
# in both Spark and DuckDB, used by the oracle-parity order mode
_MIX_A = 2654435761
_MIX_M = 2 ** 32


def _mult_mix(seed: int, id_col: str = "doc_id") -> "F.Column":
    """The SQL-mirrorable seeded multiplicative hash of an id —
    ((id mod 2^31 + seed) · 2654435761) mod 2^32 — ONE definition
    for every ``order_mode='mult'`` consumer (the oracles embed the
    formula verbatim; a convention tweak applied to some hand-copies
    but not others would silently desynchronize an operator from its
    oracle).  The mod-2^31 reduction keeps the multiply inside
    BIGINT for ANY id (without it, ids ≥ ~3.4e6·1024 silently wrap
    negative in Spark and overflow-error in ANSI engines); the
    oracle formulas omit the reduction and are therefore valid for
    gate corpora with ids < 2^31 — where the reduction is the
    identity and both forms agree bit-for-bit.  (id + seed)·A ≡
    id·A at seed = 0, so the seed-0 oracle formula is unchanged."""
    return (
        (F.col(id_col) % F.lit(2 ** 31) + F.lit(int(seed))) * F.lit(_MIX_A)
    ) % F.lit(_MIX_M)


def stratified_sample(
    docs: DataFrame,
    quota: int,
    strata_col: str = "source",
    order_mode: str = "xxhash",
    seed: int = 0,
) -> DataFrame:
    """Deterministic per-stratum quota sample — the data-mixing
    primitive ("k documents per source, reproducibly, independent of
    physical order").

    Order within a stratum is a seeded hash of doc_id (ties broken
    by doc_id), so the sample is a uniform, stable draw. ``xxhash``
    is the production default; ``mult`` uses multiplicative hashing
    ((doc_id * 2654435761) mod 2^32) — weaker mixing but exactly
    mirrorable in ANSI SQL, used by the oracle-gated wrapper.
    At extreme doc_id ranges the mult mode would need the modulus
    applied per multiply; the engine keeps xxhash as default.
    """
    if order_mode == "xxhash":
        order = F.xxhash64(F.col("doc_id"), F.lit(int(seed)))
    elif order_mode == "mult":
        # seed participates in both modes (the dataset_split ADVICE-r4
        # rule applied uniformly): (doc_id + seed) * A ≡ doc_id * A at
        # seed=0, so the seed-0 oracle formula is unchanged
        order = _mult_mix(seed)
    else:
        raise ValueError(f"order_mode must be 'xxhash' or 'mult', got {order_mode!r}")
    w = Window.partitionBy(strata_col).orderBy(order.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= quota)
        .select("doc_id", strata_col, F.col("rk").cast("int").alias("rk"))
    )


def repetition_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Intra-document repetition: 1 − distinct_bigrams/total_bigrams
    (0.0 for docs with fewer than two tokens) — the boilerplate /
    degenerate-generation quality signal used as a filter alongside
    t2's length/punct heuristics."""
    tok = tokens(docs, text_col)
    nxt = tok.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("word").alias("w2")
    )
    big = tok.join(nxt, ["doc_id", "pos"]).select(
        "doc_id", F.concat_ws("_", "word", "w2").alias("gram")
    )
    per = big.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("total_bigrams"),
        F.count_distinct("gram").alias("distinct_bigrams"),
    )
    base = docs.select("doc_id")
    return base.join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("total_bigrams", F.lit(0)).alias("total_bigrams"),
        F.coalesce("distinct_bigrams", F.lit(0)).alias("distinct_bigrams"),
        F.when(
            F.coalesce("total_bigrams", F.lit(0)) > 0,
            1.0
            - F.col("distinct_bigrams").cast("double")
            / F.col("total_bigrams").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("repetition"),
    )


def heuristic_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 25,
    max_words: int = 100_000,
    min_mean_wlen: float = 3.0,
    max_mean_wlen: float = 6.0,
    max_top_share: float = 0.15,
) -> DataFrame:
    """C4-style heuristic cleaning filters (Raffel et al. 2020 §2.2,
    adapted to a sentence-free corpus): per-document rule flags plus
    the combined keep decision.

    - ``len_ok``: word count within [min_words, max_words] (C4's
      too-short/too-long page drop).
    - ``wlen_ok``: mean word length within a natural-language band
      (the gibberish/boilerplate signal C4 gets from punctuation
      rules, which this corpus has none of).
    - ``rep_ok``: most-frequent-word share ≤ ``max_top_share`` (the
      repeated-boilerplate drop; complements t7's bigram repetition).

    Pure column expressions + two partial+final aggregations (one on
    (doc, word) for the mode share, one on doc) — no UDFs, no
    windows, scale-safe."""
    tok = tokens(docs, text_col)
    per_word = tok.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("n"))
    per_doc = per_word.groupBy("doc_id").agg(
        F.sum("n").alias("n_words"),
        F.max("n").alias("top_n"),
        F.sum(F.length("word") * F.col("n")).alias("n_word_chars"),
    )
    mean_wlen = F.col("n_word_chars").cast("double") / F.col("n_words").cast("double")
    top_share = F.col("top_n").cast("double") / F.col("n_words").cast("double")
    len_ok = F.col("n_words").between(min_words, max_words)
    wlen_ok = (mean_wlen >= min_mean_wlen) & (mean_wlen <= max_mean_wlen)
    rep_ok = top_share <= max_top_share
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.round(F.coalesce(mean_wlen, F.lit(0.0)), 6).alias("mean_wlen"),
            F.round(F.coalesce(top_share, F.lit(0.0)), 6).alias("top_share"),
            F.coalesce(len_ok, F.lit(False)).alias("len_ok"),
            F.coalesce(wlen_ok, F.lit(False)).alias("wlen_ok"),
            F.coalesce(rep_ok, F.lit(False)).alias("rep_ok"),
            F.coalesce(len_ok & wlen_ok & rep_ok, F.lit(False)).alias("keep"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    text_col: str = "text",
    order_mode: str = "xxhash",
    seed: int = 0,
    partitions: int | None = None,
    token_counts: DataFrame | None = None,
) -> DataFrame:
    """Concatenate-and-chunk sequence packing — the training-data
    step that lays shuffled documents end to end and cuts the stream
    into fixed ``budget``-token sequences.  Returns one row per doc:
    (doc_id, n_tokens, start_seq, offset, n_seqs) where ``start_seq``
    is the sequence index its first token lands in, ``offset`` the
    position within that sequence, and ``n_seqs`` how many sequences
    the doc spans.

    The global document order is a seeded hash of doc_id (the
    reproducible shuffle), and the token prefix-sum over that order
    is computed as a DISTRIBUTED prefix sum — NOT a single-partition
    window:

    1. range-repartition on the (hash, doc_id) order key,
    2. within-partition cumulative sum (window partitioned by the
       physical partition id — each task sorts only its own range),
    3. per-partition totals (one tiny aggregate, #partitions rows)
       collected, prefix-offsets broadcast back, added per row.

    Step 3's collect is #partitions values — driver-side state is
    O(cluster), not O(data); this is the textbook scan-then-offset
    prefix sum and survives 100 TB.  ``order_mode='mult'`` uses the
    SQL-mirrorable multiplicative hash (oracle-gated form);
    ``xxhash`` is the production default."""
    from pyspark.sql import Window

    if order_mode == "xxhash":
        order = F.xxhash64(F.col("doc_id"), F.lit(int(seed)))
    elif order_mode == "mult":
        # seed participates in both modes (the dataset_split ADVICE-r4
        # rule applied uniformly): (doc_id + seed) * A ≡ doc_id * A at
        # seed=0, so the seed-0 oracle formula is unchanged
        order = _mult_mix(seed)
    else:
        raise ValueError(f"order_mode must be 'xxhash' or 'mult', got {order_mode!r}")

    if token_counts is not None:
        # precomputed (doc_id, n_tokens) — e.g. real tokenizer counts
        # from bpe_token_counts; whitespace counts are only the
        # default proxy.  Docs absent from the table are not packed.
        base = token_counts.select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            order.alias("ord"),
        )
    else:
        from dask_traj_spark.functions.text import _n_tokens

        base = docs.select(
            "doc_id",
            _n_tokens(F.col(text_col)).cast("long").alias("n_tokens"),
            order.alias("ord"),
        )
    spark = docs.sparkSession
    nparts = partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = base.repartitionByRange(nparts, "ord", "doc_id").withColumn(
        "pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("pid")
        .orderBy("ord", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "local_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    # persist: the totals collect and the final plan must see the SAME
    # range boundaries (re-sampling on recompute would shift offsets).
    # Tracked so a long-lived session can release it once the packing
    # result is materialized — this is the one tracked cache whose
    # result must NOT be re-collected after release (the collected
    # offsets are baked into the plan as literals; see
    # session.release_caches)
    local = track_cache(local)
    totals = sorted(
        local.groupBy("pid").agg(F.sum("n_tokens").alias("t")).collect(),
        key=lambda r: r["pid"],
    )
    offsets, acc = {}, 0
    for row in totals:
        offsets[row["pid"]] = acc
        acc += row["t"]
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "pid int, part_offset long"
        )
    )
    cum_before = F.col("local_before") + F.col("part_offset")
    cum_after = cum_before + F.col("n_tokens")
    return (
        local.join(off_df, "pid")
        .select(
            "doc_id",
            "n_tokens",
            F.floor(cum_before / budget).cast("long").alias("start_seq"),
            (cum_before % budget).cast("long").alias("offset"),
            F.when(F.col("n_tokens") > 0,
                   F.floor((cum_after - 1) / budget) - F.floor(cum_before / budget) + 1)
            .otherwise(F.lit(0)).cast("long").alias("n_seqs"),
        )
    )


def source_token_mixture(
    docs: DataFrame,
    token_budget: int,
    strata_col: str = "source",
    text_col: str = "text",
    order_mode: str = "xxhash",
    seed: int = 0,
) -> DataFrame:
    """Per-source token-budget mixing — the data-mixing step that
    caps every source's contribution at ``token_budget`` tokens
    (uniform weights; pass per-source budgets by pre-scaling
    ``n_tokens`` upstream).  Documents are taken in seeded-hash
    order within their source until the running token count would
    reach the budget (a doc is kept while its first token lands
    inside the budget), so the draw is reproducible and independent
    of physical order — ``stratified_sample``'s quota semantics
    lifted from doc counts to token counts.

    One shuffle on the source key; the window is per-source (never
    SinglePartition).  A pathologically dominant source makes its
    partition the straggler — the two-phase prefix sum from
    ``pack_sequences`` drops in per source when that matters.

    Returns (doc_id, source, n_tokens, tok_before) for KEPT docs.
    """
    from dask_traj_spark.functions.text import _n_tokens

    if order_mode == "xxhash":
        order = F.xxhash64(F.col("doc_id"), F.lit(int(seed)))
    elif order_mode == "mult":
        # seed participates in both modes (the dataset_split ADVICE-r4
        # rule applied uniformly): (doc_id + seed) * A ≡ doc_id * A at
        # seed=0, so the seed-0 oracle formula is unchanged
        order = _mult_mix(seed)
    else:
        raise ValueError(f"order_mode must be 'xxhash' or 'mult', got {order_mode!r}")
    w = (
        Window.partitionBy(strata_col)
        .orderBy(order.asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = docs.select(
        "doc_id", strata_col, _n_tokens(F.col(text_col)).cast("long").alias("n_tokens")
    )
    return (
        base.withColumn("tok_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .where(F.col("tok_before") < token_budget)
        .select("doc_id", strata_col, "n_tokens", "tok_before")
    )


def dataset_split(
    docs: DataFrame,
    fractions: tuple[int, int] = (80, 10),
    order_mode: str = "xxhash",
    seed: int = 0,
) -> DataFrame:
    """Deterministic, leak-proof train/val/test assignment →
    (doc_id, source, split): bucket = seeded hash of doc_id mod 100;
    bucket < fractions[0] → 'train', < sum(fractions) → 'val', else
    'test'.  Hash-of-id (never physical position or random()) means
    the same document lands in the same split on every run, on any
    cluster size, after any repartition — the property that keeps a
    held-out set held out across pipeline re-runs.

    ``xxhash`` is the production default; ``mult`` mirrors exactly
    in ANSI SQL for the oracle gate (same convention as
    ``stratified_sample``).

    100-TB posture: map-only projection, fused into the scan."""
    if order_mode == "xxhash":
        bucket = F.pmod(F.xxhash64(F.col("doc_id"), F.lit(int(seed))), F.lit(100))
    elif order_mode == "mult":
        # seed participates in BOTH modes (ADVICE r4: a silently
        # ignored seed means callers varying it get identical splits).
        # (doc_id + seed) * A ≡ doc_id * A at seed=0, so the oracle
        # formula for the default case is unchanged; nonzero seeds
        # mirror in SQL as ((doc_id + seed) * 2654435761) % 2^32.
        bucket = _mult_mix(seed) % F.lit(100)
    else:
        raise ValueError(f"order_mode must be 'xxhash' or 'mult', got {order_mode!r}")
    train, val = int(fractions[0]), int(fractions[1])
    split = (
        F.when(bucket < train, F.lit("train"))
        .when(bucket < train + val, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select("doc_id", "source", split.alias("split"))


def quantile_prune(
    docs: DataFrame,
    keep_frac: float = 0.6,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum quality-percentile pruning — keep the top
    ``keep_frac`` of every stratum by the t2 heuristic quality score
    (the "filter at a percentile threshold, per source" curation
    step: a single global threshold lets one high-quality source
    starve the others, so web-scale pipelines prune each source
    against its own quality distribution).

    Rank is percent_rank() over (quality DESC, doc_id ASC) within
    the stratum — doc_id breaks ties, so the decision is
    deterministic and exactly mirrored by ANSI ``PERCENT_RANK()``
    ((rank-1)/(n-1), a correctly-rounded integer division in both
    engines).  Rows with pct_rank <= keep_frac are kept; a 1-row
    stratum has pct_rank 0 and is always kept.

    100-TB posture: ONE shuffle, on the stratum key; the quality
    score is a single column expression fused into the scan
    projection (never a doc_id join against the scored table), and
    the window sorts each stratum's rows only (never
    SinglePartition) — the same posture as ``stratified_sample``.
    Plan-locked to one exchange.
    """
    from dask_traj_spark.functions.text import quality_expr

    keyed = docs.select(
        "doc_id", strata_col, quality_expr(text_col).alias("quality")
    )
    w = Window.partitionBy(strata_col).orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        keyed.withColumn("pct_rank", F.percent_rank().over(w))
        .where(F.col("pct_rank") <= F.lit(float(keep_frac)))
        .select("doc_id", strata_col, "quality", "pct_rank")
    )


#: dyadic grid for the DSIR per-bucket log-ratios — THE SAME 2^-20
#: snap constant as the t9 char-bigram model (imported, not
#: re-declared: the cross-engine bit-parity contract lives in one
#: place).  ln() is not guaranteed correctly rounded, so each
#: bucket's log value is snapped BEFORE any per-doc summation; sums
#: of grid values are exact, making the per-doc average independent
#: of partial-agg order.
DSIR_GRID = LP_GRID


def dsir_importance(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_mode: str = "hash",
) -> DataFrame:
    """Data Selection via Importance Resampling weights (Xie et al.
    2023, DSIR): per-document average log importance ratio
    ``ln p_target(w) − ln p_raw(w)`` under hashed-unigram
    multinomials with add-one smoothing over ``n_buckets`` buckets —
    the "pick raw-corpus documents that look like the target
    distribution" selection signal (the hashed-n-gram stand-in for a
    trained quality classifier).

    Returns (doc_id, n_tokens, avg_logratio); resample downstream by
    ordering on ``avg_logratio`` (or Gumbel-perturbing it).

    Construction: token → bucket (``id_mode='hash'``: xxhash64 mod
    n_buckets, the open-vocabulary production path; ``'sorted'``:
    dense sorted-vocab ids mixed with the multiplicative constant —
    the DuckDB-mirrorable gate path).  Each corpus gets one bucket
    count table (≤ n_buckets rows); the per-bucket log-ratio is
    snapped to the 2^-20 grid and broadcast back onto the token
    stream; one per-doc partial+final aggregation finishes.

    100-TB posture: the model is bounded by n_buckets, not corpus
    size — two bounded aggregations, one broadcast join, one keyed
    doc aggregation.  The two 1-row token totals ride a broadcast
    cross-join (the audited 1-row-aggregate pattern).  No windows,
    no UDFs, no all-pairs anywhere.
    """
    from dask_traj_spark.functions.text import token_id_hashed, tokens, vocab

    b_lit = F.lit(int(n_buckets))
    # spread=False: both token streams feed only bounded bucket
    # rollups and one per-doc partial+final aggregate — all map-side
    # collapsing — so the pre-explode shuffle costs more than the
    # width it buys (measured r12: t17 0.50×; see ``tokens``)
    tok_raw = tokens(docs, text_col, spread=False)
    tok_tgt = tokens(target, text_col, spread=False)
    if id_mode == "hash":
        raw_b = tok_raw.select(
            "doc_id", F.pmod(token_id_hashed(F.col("word")), b_lit).alias("bucket")
        )
        tgt_b = tok_tgt.select(
            F.pmod(token_id_hashed(F.col("word")), b_lit).alias("bucket")
        )
    elif id_mode == "sorted":
        # vocab over the union so target-only words (impossible in the
        # gate, where target ⊆ docs, but legal for callers) still get
        # a stable id; mirrored verbatim in the oracle SQL.
        voc = vocab(tok_raw.select("word").union(tok_tgt.select("word")))
        mix = (F.col("tid").cast("long") * F.lit(_MIX_A)) % F.lit(_MIX_M)
        raw_b = tok_raw.join(voc, "word").select(
            "doc_id", (mix % b_lit).alias("bucket")
        )
        tgt_b = tok_tgt.join(voc, "word").select((mix % b_lit).alias("bucket"))
    else:
        raise ValueError(f"id_mode must be 'hash' or 'sorted', got {id_mode!r}")

    # rollup gives the per-bucket counts AND the grand total (the
    # bucket-NULL row — buckets are pmod results and never null
    # themselves) in ONE aggregation pass over each token stream; a
    # separate totals agg would re-scan the corpus.  The two slices
    # of each rollup share one exchange (ReusedExchange).
    roll_raw = raw_b.rollup("bucket").agg(F.count(F.lit(1)).alias("c"))
    roll_tgt = tgt_b.rollup("bucket").agg(F.count(F.lit(1)).alias("c"))
    c_raw = roll_raw.where(F.col("bucket").isNotNull()).select(
        "bucket", F.col("c").alias("c_raw")
    )
    c_tgt = roll_tgt.where(F.col("bucket").isNotNull()).select(
        "bucket", F.col("c").alias("c_tgt")
    )
    # both total slices are 1 row but the planner can't prove it
    # through the rollup filter — broadcast them explicitly so the
    # cross joins stay nested-loop-over-broadcast, never cartesian
    totals = (
        roll_raw.where(F.col("bucket").isNull())
        .select(F.col("c").alias("n_raw"))
        .crossJoin(
            F.broadcast(
                roll_tgt.where(F.col("bucket").isNull())
                .select(F.col("c").alias("n_tgt"))
            )
        )
    )

    def _snap_log(num, den):
        return (
            F.round(F.log(num.cast("double") / den.cast("double")) * F.lit(DSIR_GRID), 0)
            / F.lit(DSIR_GRID)
        )

    model = F.broadcast(
        c_raw.join(c_tgt, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                _snap_log(F.coalesce("c_tgt", F.lit(0)) + F.lit(1), F.col("n_tgt") + b_lit)
                - _snap_log(F.col("c_raw") + F.lit(1), F.col("n_raw") + b_lit)
            ).alias("lr"),
        )
    )
    return (
        raw_b.join(model, "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("lr") / F.count(F.lit(1)), 6).alias("avg_logratio"),
        )
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    strata_col: str | None = None,
    text_col: str = "text",
    order_mode: str = "xxhash",
    seed: int = 0,
) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling without replacement:
    every document draws key = −ln(u)/w with u a seeded hash of its
    doc_id and w its token count; the k smallest keys are the sample.
    P(doc drawn first) = w / Σw — the length-proportional document
    draw data-mixing uses when sources should contribute tokens, not
    document counts (complementing ``stratified_sample``'s uniform
    per-stratum quota and ``source_token_mixture``'s hard budget).

    Returns (doc_id, weight, key) — ``strata_col=None`` takes the k
    globally smallest keys (TakeOrderedAndProject — no global sort
    materialization); with a stratum column it takes k per stratum
    through a stratum-keyed window (never SinglePartition).

    Determinism: u = (hash+1)/2^32 ∈ (0,1] is an exact dyadic
    rational; −ln(u) is snapped to the 2^-20 grid (ln is the one
    non-correctly-rounded step — the t9 convention) and divided by
    the integer-valued weight (correctly-rounded IEEE division), so
    the key — and therefore the sampled SET — is bit-identical across
    engines and physical orders.  ``xxhash`` is the production
    default; ``mult`` mirrors exactly in ANSI SQL for the oracle.
    """
    from dask_traj_spark.functions.text import _n_tokens

    if order_mode == "xxhash":
        h = F.pmod(F.xxhash64(F.col("doc_id"), F.lit(int(seed))), F.lit(_MIX_M))
    elif order_mode == "mult":
        h = _mult_mix(seed)
    else:
        raise ValueError(f"order_mode must be 'xxhash' or 'mult', got {order_mode!r}")
    u = (h + F.lit(1)).cast("double") / F.lit(float(_MIX_M))
    e = F.round(-F.log(u) * F.lit(DSIR_GRID), 0) / F.lit(DSIR_GRID)
    w = _n_tokens(F.col(text_col)).cast("double")
    base_cols = ["doc_id"] + ([strata_col] if strata_col else [])
    # NULL text → NULL weight → NULL key, and Spark orders NULLS
    # FIRST ascending (DuckDB: NULLS LAST) — a zero-information doc
    # would head the sample in one engine and miss it in the other.
    # No weight means no ticket in the race: drop it.
    keyed = (
        docs.select(*base_cols, w.alias("weight"), (e / w).alias("key"))
        .where(F.col("weight").isNotNull())
    )
    if strata_col is None:
        return keyed.orderBy("key", "doc_id").limit(int(k))
    win = Window.partitionBy(strata_col).orderBy("key", "doc_id")
    return (
        keyed.withColumn("rk", F.row_number().over(win))
        .where(F.col("rk") <= int(k))
        .drop("rk")
    )


def mixture_weights(
    docs: DataFrame,
    total_budget: int,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled mixture weights (the UniMax/T5 α=0.5
    convention): per-source sampling weight ∝ sqrt(source's token
    count), normalized — the "damp the biggest sources, boost the
    tails" budget split a multi-source training mix starts from.
    Returns (source, n_tokens, weight, budget_tokens) with
    budget_tokens = floor(total_budget · weight).

    α is fixed at 0.5 because sqrt is the one power IEEE requires
    correctly rounded (``pow`` is banned repo-wide); each sqrt is
    snapped to the 2^-20 grid BEFORE the normalizing sum so the
    total is an exact sum of dyadics — order-independent, hence
    bit-identical across partial-agg schedules and engines.

    100-TB posture: one per-source aggregation (partial+final over
    the stratum key), then a 1-row normalizer over the ~|sources|
    table (the audited 1-row-aggregate pattern) broadcast back.
    """
    from dask_traj_spark.functions.text import _n_tokens

    per = (
        docs.groupBy(strata_col)
        .agg(F.sum(_n_tokens(F.col(text_col)).cast("long")).alias("n_tokens"))
        .select(
            strata_col,
            "n_tokens",
            (
                F.round(F.sqrt(F.col("n_tokens").cast("double")) * F.lit(DSIR_GRID), 0)
                / F.lit(DSIR_GRID)
            ).alias("scaled"),
        )
    )
    # materialize the ~|sources|-row table before deriving the
    # normalizer: `per` feeds BOTH the cross-join and total, and an
    # un-pinned plan would re-run the corpus aggregation for each
    # (exchange reuse is an optimization, not a guarantee) — the
    # checkpoint makes the one-corpus-scan claim structural
    per = per.localCheckpoint(eager=True)
    total = per.agg(F.sum("scaled").alias("z"))
    w = F.col("scaled") / F.col("z")
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            strata_col,
            "n_tokens",
            w.alias("weight"),
            F.floor(w * F.lit(float(int(total_budget)))).cast("long").alias(
                "budget_tokens"
            ),
        )
    )


def context_chunks(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
) -> DataFrame:
    """Fixed-window token chunking with overlap — the context-length
    preparation step that SPLITS long documents (the complement of
    ``pack_sequences``, which concatenates short ones): chunk *i*
    covers token positions [i·stride, i·stride + chunk_tokens), so
    consecutive chunks share ``chunk_tokens − stride`` tokens (the
    HF ``return_overflowing_tokens`` convention).  The final chunk is
    the first one whose window reaches the document's end and may be
    shorter; no chunk starts past the end, and a document shorter
    than one window yields exactly one chunk.

    Returns (doc_id, chunk_idx, n_tokens, chunk_text).

    Determinism: pure integer arithmetic — chunk count is an exact
    integer ceiling, the slice bounds are exact, and the chunk text
    is a substring re-join of the whitespace tokenization.

    100-TB posture: ZERO shuffles — one projection (split, exact
    chunk-count arithmetic), one ``explode(sequence(...))`` whose
    fan-out is the output's own row count, one slice+join per row.
    Embarrassingly parallel; partition sizing is the only knob.
    """
    chunk_tokens = int(chunk_tokens)
    stride = int(stride)
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not (1 <= stride <= chunk_tokens):
        raise ValueError(
            f"stride must be in [1, chunk_tokens={chunk_tokens}], got {stride}"
        )
    toks = F.split(F.col(text_col), " ")
    staged = docs.where(F.col(text_col).isNotNull()).select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("n_doc")
    )
    # chunks = 1 if n <= chunk else 1 + ceil((n - chunk)/stride); the
    # ceiling guarantees the last start < n and last end >= n.
    n_chunks = F.when(F.col("n_doc") <= F.lit(chunk_tokens), F.lit(1)).otherwise(
        F.lit(1)
        + F.expr(f"(n_doc - {chunk_tokens} + {stride - 1}) DIV {stride}").cast("int")
    )
    start = F.col("chunk_idx") * F.lit(stride)  # 0-based token offset
    return (
        staged.select(
            "doc_id",
            "toks",
            "n_doc",
            F.explode(F.sequence(F.lit(0), (n_chunks - F.lit(1)).cast("int"))).alias(
                "chunk_idx"
            ),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.least(F.lit(chunk_tokens), F.col("n_doc") - start)
            .cast("int")
            .alias("n_tokens"),
            F.array_join(
                F.slice(F.col("toks"), start + F.lit(1), F.lit(chunk_tokens)), " "
            ).alias("chunk_text"),
        )
    )


def shuffle_shards(
    docs: DataFrame,
    n_shards: int,
    order_mode: str = "xxhash",
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle into training shards — the
    "shuffle the corpus before training" step, reproducible across
    runs, cluster sizes, and physical input order: shard = seeded
    hash mod n_shards, position within the shard = rank of the hash
    (doc_id breaking ties).  Reading shards 0..n−1 in position order
    IS the shuffled epoch; re-running with the same seed rebuilds it
    bit-identically, a different seed is a fresh permutation.

    Returns the input columns + (shard, pos), pos 1-based within the
    shard, so downstream stages never need a join back (the review
    lesson from c14's first cut: a projection-only return forced a
    key-join against the caller's own table, re-executing its
    subtree on both sides).  ``id_col`` names the unique id to hash
    and tie-break on (default doc_id; composites pass a derived
    chunk id).

    100-TB posture: ONE shuffle on the shard key; the within-shard
    rank is a shard-keyed window (never SinglePartition — shards are
    the parallelism unit, size them >= cluster cores).  ``xxhash``
    is the production default; ``mult`` mirrors exactly in ANSI SQL
    for the oracle (the stratified_sample convention).
    """
    n_shards = int(n_shards)
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if order_mode == "xxhash":
        h = F.pmod(F.xxhash64(F.col(id_col), F.lit(int(seed))), F.lit(_MIX_M))
    elif order_mode == "mult":
        h = _mult_mix(seed, id_col)
    else:
        raise ValueError(f"order_mode must be 'xxhash' or 'mult', got {order_mode!r}")
    keyed = docs.withColumn("_shuffle_h", h)
    shard = F.pmod(F.col("_shuffle_h"), F.lit(n_shards)).cast("int")
    w = Window.partitionBy(shard).orderBy(
        F.col("_shuffle_h").asc(), F.col(id_col).asc()
    )
    return keyed.select(
        *docs.columns,
        shard.alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


def budget_select(
    docs: DataFrame,
    budget_tokens: int,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget-constrained data selection: within each stratum,
    greedily keep the highest-quality documents until the stratum's
    token budget is exhausted — the "best data that fits the compute
    budget" decision every pretraining run makes after scoring
    (quality-classifier filtering à la FineWeb-Edu reduces to this
    with a model score in place of the heuristic).

    Uses the t2 quality expression (``quality_expr`` — ONE shared
    definition with the t2/c8/d16 gates), ties broken by doc_id, and
    a greedy prefix rule: a document is ``selected`` iff the running
    token total INCLUDING it stays within ``budget_tokens`` AND every
    better-quality document before it was within budget too (a
    strict prefix — no skip-and-backfill, so the output is a
    deterministic quality cut, not a knapsack approximation).

    → (doc_id, ``strata_col``, quality, n_tokens, cum_tokens,
    selected) for every document.

    100-TB posture: the quality score fuses into the scan
    projection; one stratum-keyed window (rank + running sum in the
    same sort order — one exchange, never SinglePartition); all
    token arithmetic exact integers."""
    from pyspark.sql import Window

    from dask_traj_spark.functions.text import _n_tokens, quality_expr

    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    scored = docs.select(
        "doc_id",
        strata_col,
        quality_expr(text_col).alias("quality"),
        _n_tokens(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy(strata_col)
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return out.select(
        "doc_id",
        strata_col,
        "quality",
        "n_tokens",
        "cum_tokens",
        (F.col("cum_tokens") <= F.lit(int(budget_tokens)))
        .cast("long")
        .alias("selected"),
    )
