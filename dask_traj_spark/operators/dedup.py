"""Deduplication operators for large-scale corpus pipelines.

Beyond-reference capability block: exact dedup, MinHash+LSH near-dup,
SimHash, and n-gram Jaccard — the standard toolbox for cleaning a
100 TB training corpus, expressed as declarative Spark plans.

Plan shapes (scale posture):

- **exact**: one hash-groupBy over the corpus — partial+final agg,
  one shuffle on a 32-char key.
- **minhash/LSH**: tokens → hashed token ids (default; no global
  state) → k min-aggs per doc (ONE groupBy), band hashes → self-join
  on (band, hash) buckets → candidate pairs → Jaccard verify on the
  token sets. Only same-bucket docs are ever paired — the O(n²)
  comparison never materializes. Skewed buckets (boilerplate docs)
  are the classic hazard: AQE skew-join handles moderate skew, and
  ``max_bucket`` drops degenerate buckets (a bucket of B docs emits
  B² pairs — a 10⁶-doc boilerplate bucket would emit 10¹² pairs)
  before the self-join.
- **simhash**: one groupBy producing a 16-bit signature per doc;
  near-dup candidates = equal signatures (or Hamming-adjacent via
  banding the bits).
- **ngram-jaccard**: bigram shingles → ONE self-join of the
  ``max_df``-capped (doc, shingle) set aggregated straight to
  per-pair intersection counts (no candidate/verify phases — see
  ``near_duplicates_ngram`` for why that shape explodes on templated
  corpora). Jaccard is computed over the capped shingle universe; the
  join is bounded by Σ min(df, max_df)² per shingle.

Token/shingle id assignment (``id_mode``):

- ``"hashed"`` (DEFAULT — the 100 TB path): xxhash64 of the token /
  shingle text. No global vocabulary, no single-partition window,
  embarrassingly parallel. Not reproducible in DuckDB.
- ``"sorted"``: dense ranks over a sorted global vocabulary — a
  single-partition window, bounded-vocab only, but bit-reproducible
  in any SQL engine. Used ONLY by the oracle-gated query wrappers in
  ``queries_pipeline`` (the driver's DuckDB twin must re-derive the
  identical ids).

Jaccard values are invariant under any injective id mapping, so both
modes agree wherever the candidate generation overlaps; the affine
minhash values differ between modes (they hash the id), which only
perturbs which *candidates* LSH surfaces — the exact-Jaccard verify
then filters both the same way.

Determinism (DuckDB oracle hash-compares values): sorted-mode ids
are dense ranks; min-hash uses integer affine hashes
((a·tid+b) mod p) — with hashed 31-bit ids, a·tid < 2^62, still
BIGINT-exact; Jaccard is one double division of exact ints. The
bucket caps are mirrored as HAVING clauses in the SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dask_traj_spark.session import (
    release_caches,  # noqa: F401 — established public API of this module
    release_local_checkpoint,
    track_cache,
)
from dask_traj_spark.functions.text import (
    spread_for_expansion,
    token_id_hashed,
    tokens,
    vocab,
)

# Several operators below persist a shared intermediate (the token /
# shingle sets referenced by multiple plan branches).  Their results
# are LAZY, so the cache must outlive the operator call and cannot be
# unpersisted here; it is TRACKED instead, and a long-lived session
# running many dedup calls releases all of them with
# ``release_caches()`` once the results are materialized (ADVICE
# r10: each call otherwise pins a cached RDD for the session's
# lifetime).  Storage is MEMORY_AND_DISK and Spark evicts cached
# blocks LRU, so an unreleased cache degrades to recompute/disk
# churn, never OOM — but explicit release is the contract.  The
# registry itself now lives in ``dask_traj_spark.session`` (shared
# with curation); these names stay as the established public API.
_tracked_persist = track_cache

#: affine minhash constants: h_i(t) = (A_i * t + B_i) mod P. Fixed,
#: mirrored in the oracle SQL.
MINHASH_P = 2_147_483_647
N_HASHES = 16
N_BANDS = 8  # 2 rows per band
BAND_MIX = 1_000_003

#: default degenerate-bucket caps. An LSH bucket (or shingle) held by
#: more than this many docs is boilerplate, not near-duplication —
#: dropping it bounds the self-join at B²·cap pairs per bucket.
MAX_BUCKET = 1024
MAX_SHINGLE_DF = 1024


def _hash_consts(i: int) -> tuple[int, int]:
    """Large mixing multipliers so the affine map actually permutes
    (a tiny multiplier never wraps mod P on a bounded vocab — the min
    then always picks the smallest tid and every hash collapses to
    the same token). a·tid stays ≤ ~2^31·tid ≪ 2^63 — BIGINT-exact in
    both engines."""
    a = (2654435761 * (i + 1)) % MINHASH_P
    b = (1013904223 * (i + 1) + 12345) % MINHASH_P
    return a, b


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup via content hash: (h, keep_id, n) — one group per
    distinct text, keep_id = min doc_id, n = multiplicity."""
    h = F.md5(F.encode(F.col(text_col), "UTF-8"))
    return (
        docs.groupBy(h.alias("h"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def _doc_token_ids(
    docs: DataFrame, text_col: str = "text", id_mode: str = "hashed"
) -> DataFrame:
    """(doc_id, tid) distinct token-id sets. Hashed ids by default
    (scale path); sorted-vocab dense ranks for oracle parity."""
    tok = tokens(docs, text_col)
    if id_mode == "hashed":
        return tok.select(
            "doc_id", token_id_hashed(F.col("word")).alias("tid")
        ).distinct()
    if id_mode == "sorted":
        v = F.broadcast(vocab(tok))
        return tok.join(v, "word").select("doc_id", "tid").distinct()
    raise ValueError(f"id_mode must be 'hashed' or 'sorted', got {id_mode!r}")


def _minhash_aggs() -> list:
    aggs = []
    for i in range(N_HASHES):
        a, b = _hash_consts(i)
        aggs.append(
            F.min((F.col("tid").cast("long") * a + b) % MINHASH_P).alias(f"h{i}")
        )
    return aggs


def _signatures_from(dt: DataFrame) -> DataFrame:
    return dt.groupBy("doc_id").agg(*_minhash_aggs())


def _raw_token_ids(
    docs: DataFrame, text_col: str = "text", id_mode: str = "hashed"
) -> DataFrame:
    """(doc_id, tid) token ids WITH duplicates — one row per token
    occurrence.  Feed this only to duplicate-insensitive aggregates
    (min, collect_set); everything counting rows wants
    ``_doc_token_ids`` (the distinct form)."""
    tok = tokens(docs, text_col)
    if id_mode == "hashed":
        return tok.select("doc_id", token_id_hashed(F.col("word")).alias("tid"))
    if id_mode == "sorted":
        v = F.broadcast(vocab(tok))
        return tok.join(v, "word").select("doc_id", "tid")
    raise ValueError(f"id_mode must be 'hashed' or 'sorted', got {id_mode!r}")


def _packed_doc_tokens(
    docs: DataFrame, text_col: str = "text", id_mode: str = "hashed"
) -> DataFrame:
    """(doc_id, s, h0..h{k-1}): each doc's DISTINCT token-id set packed
    into one array plus its full minhash signature, from ONE
    groupBy(doc_id) over the raw (non-distinct) token stream.

    Both aggregates are duplicate-insensitive (min and collect_set),
    so the old ``.distinct()`` exchange bought nothing — and computing
    signatures and sets in one aggregation makes the whole minhash
    front end a single token-table exchange instead of three
    (distinct, signature groupBy, set groupBy).  Map-side partial
    aggregation dedups within each input partition before the
    exchange, so the shuffled bytes are the partition-local distinct
    sets either way."""
    return _raw_token_ids(docs, text_col, id_mode).groupBy("doc_id").agg(
        F.collect_set("tid").alias("s"), *_minhash_aggs()
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", id_mode: str = "hashed"
) -> DataFrame:
    """(doc_id, h0..h{k-1}) — k min-aggregations in one groupBy,
    straight over the raw token stream (min is duplicate-insensitive,
    so no distinct pass — same values, one fewer exchange)."""
    return _signatures_from(_raw_token_ids(docs, text_col, id_mode))


def _cap_buckets(df: DataFrame, keys: list[str], cap: int | None) -> DataFrame:
    """Drop rows whose bucket (group on ``keys``) exceeds ``cap``
    members — at scale this is what keeps a boilerplate bucket from
    emitting O(B²) candidate pairs.

    Implemented as a keyed window count (never SinglePartition): ONE
    shuffle on ``keys`` versus the groupBy-sizes + semi-join form's
    two, and the output comes back hash-partitioned on exactly the
    keys the downstream bucket self-join needs, so that join reuses
    the window's exchange instead of re-shuffling the full bands
    table (measured r8, sf0.1 d2: ~18% end-to-end; at 100 TB the
    bands table is bands×corpus rows, so the saved shuffle is the
    big one)."""
    if cap is None:
        return df
    from pyspark.sql import Window

    w = Window.partitionBy(*keys)
    return (
        df.withColumn("_bsz", F.count(F.lit(1)).over(w))
        .where(F.col("_bsz") <= cap)
        .drop("_bsz")
    )


# In-row pair emission over a packed bucket: members sorted, each
# (i < j) pair once as struct(a, b) — a < b in member-struct order.
_PAIR_EXPR = (
    "flatten(transform(ms, (x, i) -> "
    "transform(slice(ms, i + 2, size(ms) - i - 1), "
    "y -> named_struct('a', x, 'b', y))))"
)

# Bipartite variant (the d20/d21 tagged-union convention: even
# doc_id = left corpus, odd = right): every (even, odd) pair once.
_BIPARTITE_PAIR_EXPR = (
    "flatten(transform(filter(ms, m -> pmod(m.doc_id, 2) = 0), x -> "
    "transform(filter(ms, m -> pmod(m.doc_id, 2) = 1), "
    "y -> named_struct('a', x, 'b', y))))"
)


def _bucket_pairs(
    df: DataFrame,
    keys: list[str],
    cap: int,
    member_cols: list[str],
    bipartite: bool = False,
) -> DataFrame:
    """Co-bucket member pairs via ONE groupBy on ``keys``: pack each
    bucket's members (structs of ``member_cols``, first column unique
    within a bucket) into a sorted array, drop buckets above ``cap``
    (the ``_cap_buckets`` semantics — size counts the whole bucket,
    union-wide for the bipartite form) or below 2, and emit the pairs
    in-row.  Output: one row per pair, column ``p`` =
    struct<a, b> with a < b in member order (bipartite: a even doc_id,
    b odd).

    Why not the count-filter + self-join form these operators used
    before: where the filter is a count SEMI-JOIN (the anchor/winnow
    family), the two pair-join sides and the two semi-join sides hold
    four DIFFERENT subtrees above the key exchange, AQE reuses
    nothing, and the expensive upstream pipeline (n-gram windows,
    winnow fingerprints) physically executed FOUR times per query
    (measured: executedPlan of the r12-pre d14/d17/d21 shows 4
    parquet scans, 0 ReusedExchange).  This form executes it once.

    The trade: pair emission materializes one in-row array of up to
    cap·(cap-1)/2 structs per bucket, and ``slice`` copies make that
    O(cap²) allocations for a full bucket — fine at cap ≤ 64 (≤ 2016
    structs), pathological at cap 1024 (~0.5M structs per hot bucket;
    measured GC storms on the d2 profile).  So this helper is for
    SMALL-cap callers only; the MinHash/SimHash band family (cap
    1024) keeps the window-cap + streaming self-join, whose identical
    under-window subtrees AQE DOES reuse at runtime (executedPlan of
    d2/d20 shows 4 ReusedExchange — the static explain misleads
    here).  ``cap`` is REQUIRED; uncapped callers (gate/audit paths)
    keep their legacy streaming join, which tolerates unbounded
    buckets."""
    member = F.struct(*[F.col(c).alias(c) for c in member_cols])
    g = df.groupBy(*keys).agg(
        F.array_sort(F.collect_list(member)).alias("ms")
    )
    g = g.where((F.size("ms") >= 2) & (F.size("ms") <= cap))
    expr = _BIPARTITE_PAIR_EXPR if bipartite else _PAIR_EXPR
    return g.select(F.explode(F.expr(expr)).alias("p"))


def lsh_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_mode: str = "hashed",
    max_bucket: int | None = MAX_BUCKET,
) -> DataFrame:
    """(doc1, doc2) candidate near-dup pairs: docs sharing any LSH
    band bucket (band hash = h_{2b} * mix + h_{2b+1}), after dropping
    degenerate buckets larger than ``max_bucket``."""
    sig = minhash_signatures(docs, text_col, id_mode)
    return _band_candidates(sig, max_bucket)


def _band_rows(sig: DataFrame) -> DataFrame:
    """(doc_id, band, bh) LSH band-bucket membership — the shared
    candidate-generation core of the self-join (d2) and bipartite
    (d20) paths.  The degenerate-bucket cap is applied by the caller
    (``_cap_buckets``; cap 1024 keeps the streaming join — see
    ``_bucket_pairs`` on why)."""
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


def _packed_band_buckets(
    sig: DataFrame, max_bucket: int
) -> DataFrame:
    """(band, bh, ms): each LSH band bucket's member doc_ids packed
    into ONE sorted array by a single groupBy(band, bh), buckets
    outside [2, max_bucket] dropped (the ``_cap_buckets`` semantics —
    size-1 buckets emit no pairs anyway)."""
    return (
        _band_rows(sig)
        .groupBy("band", "bh")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ms"))
        .where((F.size("ms") >= 2) & (F.size("ms") <= int(max_bucket)))
    )


def _streamed_pairs(ms: DataFrame) -> DataFrame:
    """(doc1 < doc2) member pairs from packed buckets (column ``ms``:
    sorted array of distinct ids), emitted STREAMING-SAFELY for large
    caps: posexplode each member as doc1, then explode its strict
    suffix as doc2 — every intermediate array is O(cap), never the
    O(cap²)-struct in-row flatten that made ``_bucket_pairs``'
    emitter GC-pathological at cap 1024 (r12 §12)."""
    return (
        ms.select("ms", F.posexplode("ms").alias("i", "doc1"))
        .select(
            "doc1",
            F.explode(
                F.expr("slice(ms, i + 2, size(ms) - i - 1)")
            ).alias("doc2"),
        )
        .distinct()
    )


def _band_candidates(sig: DataFrame, max_bucket: int | None) -> DataFrame:
    # Capped path: ONE groupBy(band, bh) packs each bucket and pairs
    # are emitted in-row (streaming-safe emitter, see _streamed_pairs)
    # — no self-join, so the band pipeline (posexplode over the
    # signature table, corpus × n_bands rows) physically executes
    # ONCE at every regime BY CONSTRUCTION.  The r12 self-join form
    # relied on AQE exchange reuse that never fired: the band
    # subtrees sit above a cached table, and the cache's
    # AdaptiveSparkPlan mutates as stages materialize, so the two
    # sides' canonicalized plans diverge and the stage cache misses
    # (verified r13: Generate=2 / ReusedExchange=0 at sf0.001 AND
    # sf0.1, under broadcast AND under a pinned shuffle-hash join).
    # Versus the join form this also replaces the cap WINDOW (sort +
    # count over the shuffled bands) with the groupBy's size filter:
    # one exchange of the bands table total, down from two + a join
    # (VERDICT r12 item 1).  The uncapped path (gate/audit callers)
    # keeps the legacy streaming join, which tolerates unbounded
    # buckets without packing them into one row.
    if max_bucket is None:
        bands = _band_rows(sig)
        l = bands.select(F.col("doc_id").alias("doc1"), "band", "bh")
        r = bands.select(F.col("doc_id").alias("doc2"), "band", "bh")
        return (
            l.join(r, ["band", "bh"])
            .where(F.col("doc1") < F.col("doc2"))
            .select("doc1", "doc2")
            .distinct()
        )
    return _streamed_pairs(_packed_band_buckets(sig, max_bucket))


def _jaccard_verify(pairs: DataFrame, sets: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate pairs from packed distinct token
    sets (``sets``: doc_id + array column ``s`` — the
    ``_packed_doc_tokens`` shape).

    The candidate pairs join the packed table twice on the doc key;
    the intersection is a JVM-side ``array_intersect``.  Versus the
    exploded form (pairs ⋈ tokens ⋈ tokens, grouped back), this
    shuffles |pairs| + |docs| rows instead of |pairs|·|tokens/doc| —
    the same set content, packed — so the verify stage no longer
    dominates when LSH emits many candidates (boilerplate corpora).
    ``array_intersect`` is hash-set based (O(n+m) per pair); the
    collect_set order is engine-dependent but size/intersection are
    order-invariant, so the output stays deterministic."""
    t1 = sets.select(
        F.col("doc_id").alias("doc1"), F.col("s").alias("s1"), F.size("s").alias("sz1")
    )
    t2 = sets.select(
        F.col("doc_id").alias("doc2"), F.col("s").alias("s2"), F.size("s").alias("sz2")
    )
    inter = (
        pairs.join(t1, "doc1")
        .join(t2, "doc2")
        .select(
            "doc1",
            "doc2",
            F.size(F.array_intersect("s1", "s2")).alias("inter"),
            "sz1",
            "sz2",
        )
        .where(F.col("inter") > 0)
    )
    return inter.select(
        "doc1",
        "doc2",
        (
            F.col("inter").cast("double")
            / (F.col("sz1") + F.col("sz2") - F.col("inter")).cast("double")
        ).alias("jaccard"),
    )


def near_duplicates_minhash(
    docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_mode: str = "hashed",
    max_bucket: int | None = MAX_BUCKET,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with exact-Jaccard verification:
    (doc1, doc2, jaccard) where jaccard ≥ threshold. The Jaccard
    verify always uses the FULL token sets — the cap only bounds
    candidate generation.

    The whole front end (signatures + packed sets) is ONE
    token-table exchange (``_packed_doc_tokens``); the packed table
    is cached via ``_tracked_persist`` (see ``release_caches``) and
    feeds both the band candidates (a projection) and the two verify
    joins."""
    packed = _tracked_persist(_packed_doc_tokens(docs, text_col, id_mode))
    sig = packed.drop("s")
    cand = _band_candidates(sig, max_bucket)
    return _jaccard_verify(cand, packed).where(F.col("jaccard") >= threshold)


def cross_corpus_neardup(
    docs: DataFrame,
    ref: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_mode: str = "hashed",
    max_bucket: int | None = MAX_BUCKET,
) -> DataFrame:
    """MinHash-LSH near-dup pairs ACROSS two corpora — the near-dup
    decontamination workhorse: c2's n-gram overlap catches verbatim
    benchmark contamination, d13's Bloom catches exact membership;
    this catches the PARAPHRASED/templated eval document sitting in
    the training corpus at whole-document granularity (one side from
    ``docs``, one from ``ref``, exact-Jaccard verified).

    Returns (doc_id, ref_id, jaccard) with jaccard ≥ ``threshold``.

    Plan: both corpora are tagged into one frame (sid = 2·id + side
    — BIGINT-exact for ids < 2^62) so tokenization, the shared vocab
    (id_mode='sorted' MUST rank over the union — per-corpus vocabs
    would put the same word at different tids) and the signature
    aggregation run ONCE over the union; the band table splits by
    side parity BEFORE the bucket join, so same-side pairs are never
    generated (the self-join form post-filtered would do ~half its
    work for nothing); the degenerate-bucket cap applies to the
    UNION bucket, mirrored in the oracle.  Same one-keyed-shuffle
    candidate shape as d2, bounded by cap² per bucket."""
    tagged = docs.select(
        (F.col("doc_id") * 2).alias("doc_id"), F.col(text_col).alias(text_col)
    ).unionByName(
        ref.select(
            (F.col("doc_id") * 2 + 1).alias("doc_id"),
            F.col(text_col).alias(text_col),
        )
    )
    packed = _tracked_persist(_packed_doc_tokens(tagged, text_col, id_mode))
    sig = packed.drop("s")
    # capped path: ONE groupBy packs each union bucket (cap applies
    # to the union size, as before), then the (even, odd) pairs are
    # emitted in-row by parity-splitting the packed array — no
    # bipartite join, so the band pipeline executes once at every
    # regime (the _band_candidates argument; VERDICT r12 item 1).
    # pmod, not %: Spark's % keeps the sign, so a NEGATIVE odd sid
    # (legal — ids are arbitrary longs) would land on neither side
    # and silently vanish (session-6 review finding)
    if max_bucket is None:
        bands = _band_rows(sig)
        l = bands.where(F.pmod(F.col("doc_id"), F.lit(2)) == 0).select(
            F.col("doc_id").alias("doc1"), "band", "bh"
        )
        r = bands.where(F.pmod(F.col("doc_id"), F.lit(2)) == 1).select(
            F.col("doc_id").alias("doc2"), "band", "bh"
        )
        cand = l.join(r, ["band", "bh"]).select("doc1", "doc2").distinct()
    else:
        g = (
            _band_rows(sig)
            .groupBy("band", "bh")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("ms"))
            .where((F.size("ms") >= 2) & (F.size("ms") <= int(max_bucket)))
        )
        cand = (
            g.select(
                F.expr("filter(ms, m -> pmod(m, 2) = 0)").alias("evens"),
                F.expr("filter(ms, m -> pmod(m, 2) = 1)").alias("odds"),
            )
            .where((F.size("evens") >= 1) & (F.size("odds") >= 1))
            .select(F.explode("evens").alias("doc1"), "odds")
            .select("doc1", F.explode("odds").alias("doc2"))
            .distinct()
        )
    pairs = _jaccard_verify(cand, packed).where(F.col("jaccard") >= threshold)
    # floor division via (sid - pmod)/2 — `div` truncates toward
    # zero and would mis-map negative sids
    return pairs.select(
        F.expr("(doc1 - pmod(doc1, 2)) div 2").alias("doc_id"),
        F.expr("(doc2 - pmod(doc2, 2)) div 2").alias("ref_id"),
        "jaccard",
    )


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    bits: int = 16,
    id_mode: str = "hashed",
) -> DataFrame:
    """(doc_id, sh) SimHash over the distinct token set:
    bit j set iff sum over tokens of (2·bit_j(h(tid)) − 1) > 0,
    h(t) = (1103515245·t + 12345) mod 2^31. With 31-bit hashed ids,
    tid·1103515245 < 2^62 — BIGINT-exact.

    ``bits`` is capped at 31: h() only has 31 hash bits, so any
    higher bit would be constantly unset (and a 64-bit signature
    would additionally overflow the ``1 << j`` LongType literal at
    j=63 — verified NumberFormatException on Spark)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31] (h() is mod 2^31), got {bits}")
    dt = _doc_token_ids(docs, text_col, id_mode)
    h = (F.col("tid").cast("long") * 1103515245 + 12345) % (2 ** 31)
    bit_sums = [
        F.sum(F.shiftright(h, j) % 2 * 2 - 1).alias(f"s{j}") for j in range(bits)
    ]
    per_doc = dt.groupBy("doc_id").agg(*bit_sums)
    sh = None
    for j in range(bits):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sh = term if sh is None else sh + term
    return per_doc.select("doc_id", sh.cast("long").alias("sh"))


def _doc_shingle_ids(
    docs: DataFrame, text_col: str = "text", id_mode: str = "hashed"
) -> DataFrame:
    """(doc_id, tid) distinct word-bigram shingle ids. Hashed by
    default; sorted dense ranks for oracle parity."""
    tok = tokens(docs, text_col)
    nxt = tok.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("word").alias("word2")
    )
    big = tok.join(nxt, ["doc_id", "pos"]).select(
        "doc_id", F.concat_ws("_", "word", "word2").alias("shingle")
    )
    if id_mode == "hashed":
        # ONE distinct, on the hashed id: deduping by tid subsumes
        # deduping by shingle string (hash is a function of the
        # string), and it must be the tid that is deduped — a 31-bit
        # collision between two shingles of one doc must not yield
        # duplicate (doc_id, tid) rows (they'd double-count in the
        # intersection self-join and the per-doc size window).  The
        # old string-distinct + tid-distinct form paid two exchanges
        # of the shingle table for the same rows.
        return big.select(
            "doc_id", token_id_hashed(F.col("shingle")).alias("tid")
        ).distinct()
    if id_mode == "sorted":
        big = big.distinct()
        from pyspark.sql import Window

        sv = F.broadcast(
            big.select("shingle")
            .distinct()
            .select(
                "shingle",
                F.row_number().over(Window.orderBy("shingle")).alias("sid"),
            )
        )
        return big.join(sv, "shingle").select("doc_id", F.col("sid").alias("tid"))
    raise ValueError(f"id_mode must be 'hashed' or 'sorted', got {id_mode!r}")


def near_duplicates_ngram(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_mode: str = "hashed",
    max_df: int | None = MAX_SHINGLE_DF,
) -> DataFrame:
    """Word-bigram (2-gram) Jaccard near-dup pairs:
    (doc1, doc2, jaccard ≥ threshold) over the frequency-capped
    shingle universe.

    Plan: ONE self-join of the capped (doc, shingle) set on shingle
    id, aggregated straight to per-pair intersection counts, then a
    sizes join and the threshold filter. No candidate/verify phases:
    a verify pass that re-joins every candidate against full shingle
    sets explodes as candidates × |S| (measured on the templated
    sf0.1 corpus: 10M candidates × 51 shingles ≈ 10× the direct
    join; 86 s → ~8 s direct).

    Semantics: with ``max_df=None`` this is plain exact Jaccard.
    With a cap, shingles whose document frequency exceeds ``max_df``
    are excluded from BOTH intersection and union — Jaccard over the
    capped feature space. That is the only shape that stays
    computable at corpus scale: the self-join size is bounded by
    Σ min(df, max_df)² per shingle, whereas exact Jaccard in the
    presence of a df=10⁶ boilerplate shingle needs a 10¹²-row join
    no matter how candidates were generated. The oracle applies the
    identical cap (HAVING df <= max_df feeding both inter and
    sizes)."""
    ds = _doc_shingle_ids(docs, text_col, id_mode)
    ds_c = _cap_buckets(ds, ["tid"], max_df)
    # the (doc, shingle) derivation (token self-join + distinct) is
    # referenced by the sizes aggregate AND both sides of the
    # intersection self-join; without a persist Spark re-derives it
    # per reference (4× the token join). MEMORY_AND_DISK spills at
    # scale; this is the same intermediate a real pipeline would
    # materialize.
    ds_c = _tracked_persist(ds_c)
    # set sizes attached per row (doc-partitioned window on the tiny
    # cached set) so they ride through the intersection join — no
    # extra per-pair joins on the aggregated output
    from pyspark.sql import Window

    ds_sz = ds_c.withColumn(
        "sz", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )
    s1 = ds_sz.select(F.col("doc_id").alias("doc1"), "tid", F.col("sz").alias("sz1"))
    s2 = ds_sz.select(F.col("doc_id").alias("doc2"), "tid", F.col("sz").alias("sz2"))
    inter = (
        s1.join(s2, "tid")
        .where(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first("sz1").alias("sz1"),
            F.first("sz2").alias("sz2"),
        )
    )
    return inter.select(
        "doc1",
        "doc2",
        (
            F.col("inter").cast("double")
            / (F.col("sz1") + F.col("sz2") - F.col("inter")).cast("double")
        ).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)


def repeated_ngram_docs(
    docs: DataFrame, n: int = 8, text_col: str = "text"
) -> DataFrame:
    """Cross-document exact n-gram repetition — the substring-level
    dedup signal (long verbatim spans shared across documents, the
    thing doc-level Jaccard under-weights; cf. the train-data
    dedup literature's exact-substring pass, PAPERS.md).

    For each document: how many of its DISTINCT word ``n``-grams
    (default 8 — long enough that sharing is verbatim copying, not
    phrase coincidence) also appear in at least one OTHER document.
    Returns (doc_id, n_grams, n_shared, shared_frac).

    Plan: distinct (doc, gram) → gram document-frequency (partial+
    final count, one shuffle on gram) → broadcast-free semi-style
    join back, per-doc count. Work is linear in corpus token count;
    no pairwise blow-up (a gram shared by B docs contributes B rows,
    not B² pairs — per-doc flags are the scale-safe output shape; the
    pair form is d2/d4's job). At open-vocabulary scale the gram key
    would be xxhash64-hashed exactly like token ids; the string form
    is kept for the value-level oracle."""
    from dask_traj_spark.operators.curation import _word_ngrams

    grams = _word_ngrams(docs, n, text_col)
    # referenced by the df-count AND the join-back AND the totals —
    # persist or the tokenize+n-way position join re-derives 3×
    grams = _tracked_persist(grams)
    dfc = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= 2)
        .select("gram")
    )
    shared = (
        grams.join(dfc, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    totals = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        docs.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.coalesce("n_shared", F.lit(0)).cast("double")
                / F.col("n_grams").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("shared_frac"),
        )
    )


# ------------------------------------------------------- components


def dup_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 50,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph — the
    step that turns pairwise dedup evidence (d2/d4/d6 emit PAIRS)
    into duplicate CLUSTERS: every document gets the minimum doc id
    reachable through the pair graph as its ``component``, and
    exactly one member per component (the minimum) is flagged
    ``is_representative`` — the survivor a curation pass keeps.

    Algorithm: min-label propagation WITH pointer doubling.  Each
    round (a) every node takes ``min(own label, neighbors'
    labels)`` and (b) labels are path-compressed twice
    (``label ← label(label(v))`` — each node jumps to its current
    representative's representative).  Plain propagation alone is
    O(graph diameter) rounds, which degenerates on the chain-shaped
    components near-dup graphs actually produce (doc i ≈ doc i+1
    templated runs); the doubling step compresses chains
    geometrically, giving O(log n) rounds — the same hybrid the
    large-star/small-star formulation (Kiveris et al., "Connected
    Components in MapReduce and Beyond", public SoCC'14) and
    GraphFrames' CC use.  Each round's labels are CHECKPOINTED
    (``localCheckpoint``), not merely persisted: persistence caches
    the data but leaves the logical plan growing round over round,
    and Catalyst re-analysis of the doubling plan goes exponential
    by round ~3 — checkpointing truncates the lineage so every round
    optimizes a flat plan.  (On a real cluster use
    ``spark.sparkContext.setCheckpointDir`` + ``checkpoint()`` for
    executor-loss resilience; the algorithm is unchanged.)  The
    driver holds only a changed-row COUNT per round (O(1) state).

    Raises after ``max_iters`` non-converged rounds (with doubling,
    50 rounds covers components of ~2^50 nodes).
    """
    # symmetrize via ONE explode pass, not a self-union: the union
    # form evaluates the caller's ``pairs`` lineage (typically the
    # full MinHash/verify pipeline) once per branch when the
    # checkpoint materializes — explode reads it once and emits both
    # orientations per row (same multiset, bit-identical closure)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("id1").alias("src"), F.col("id2").alias("dst")
                    ),
                    F.struct(
                        F.col("id2").alias("src"), F.col("id1").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        # distinct leaves hash(src, dst) partitioning; re-key on src
        # ONCE so the per-round message join scans the (static,
        # edge-sized) side in place — localCheckpoint preserves the
        # partitioning, and only the vertex-sized label table moves
        # per round
        .repartition("src")
        .localCheckpoint()
    )
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint()
    label_t = dict(labels.dtypes)["label"]
    ckpt_prev = labels

    def _jump(lbl: DataFrame) -> DataFrame:
        # label ← label(label(v)): follow each node's pointer one hop
        ptr = lbl.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        return (
            lbl.join(ptr, lbl["label"] == ptr["p_node"], "left")
            .select(
                "node",
                F.coalesce(F.least("p_label", "label"), F.col("label")).alias("label"),
                "old",
            )
        )

    for _ in range(max_iters):
        # each node's previous label rides in-row through the round
        # (every node appears exactly once in ``labels``, so
        # max(old) over the message group recovers it — messages
        # carry NULL), making the convergence check a scan of the
        # just-checkpointed table instead of a vertex-keyed join
        msgs = edges.join(
            labels, edges["src"] == labels["node"]
        ).select(
            F.col("dst").alias("node"),
            "label",
            F.lit(None).cast(label_t).alias("old"),
        )
        prop = (
            labels.withColumn("old", F.col("label"))
            .unionByName(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.max("old").alias("old"))
        )
        # LAZY checkpoint: the convergence count below scans every
        # partition, so its job materializes (and truncates) the
        # marked RDD — one job per round instead of an eager
        # checkpoint job plus the count job.  The superseded previous
        # round is only released after the count, i.e. after the new
        # blocks exist.
        new_labels = _jump(_jump(prop)).localCheckpoint(eager=False)
        changed = new_labels.where(F.col("label") != F.col("old")).count()
        # the previous round's label checkpoint is superseded the
        # moment the new one materializes — release it so a long
        # convergence run doesn't pin one vertex-sized cache per
        # round for the session's lifetime
        release_local_checkpoint(ckpt_prev)
        ckpt_prev = new_labels
        labels = new_labels.drop("old")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"dup_components did not converge in {max_iters} iterations"
        )
    # the returned projection reads only the final label checkpoint
    release_local_checkpoint(edges)
    return labels.select(
        F.col("node").alias(id_col),
        F.col("label").alias("component"),
        (F.col("node") == F.col("label")).alias("is_representative"),
    )


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    text_col: str = "text",
    id_mode: str = "hashed",
    max_df: int | None = MAX_SHINGLE_DF,
) -> DataFrame:
    """ASYMMETRIC near-dup: (inner_doc, outer_doc, containment) where
    containment = |S(inner) ∩ S(outer)| / |S(inner)| ≥ threshold over
    word-bigram shingles — the quote/superset detector Jaccard
    misses: a short document fully embedded in a long one has low
    Jaccard (union is huge) but containment ≈ 1 (Broder's original
    containment measure, the resemblance/containment pair).

    Plan: identical single intersection self-join as
    ``near_duplicates_ngram`` (one shuffle on the capped shingle id,
    bounded by Σ min(df, max_df)²), but DIRECTED — both (a,b)
    orderings are scored because containment is not symmetric; the
    denominator is the inner side's set size only.  Same capped-
    feature-space semantics, mirrored in the oracle."""
    ds = _doc_shingle_ids(docs, text_col, id_mode)
    ds_c = _cap_buckets(ds, ["tid"], max_df)
    from pyspark.sql import Window

    ds_c = _tracked_persist(ds_c)
    ds_sz = ds_c.withColumn(
        "sz", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )
    s1 = ds_sz.select(
        F.col("doc_id").alias("inner_doc"), "tid", F.col("sz").alias("sz_in")
    )
    s2 = ds_sz.select(F.col("doc_id").alias("outer_doc"), "tid")
    inter = (
        s1.join(s2, "tid")
        .where(F.col("inner_doc") != F.col("outer_doc"))
        .groupBy("inner_doc", "outer_doc")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first("sz_in").alias("sz_in"),
        )
    )
    return inter.select(
        "inner_doc",
        "outer_doc",
        (
            F.col("inter").cast("double") / F.col("sz_in").cast("double")
        ).alias("containment"),
    ).where(F.col("containment") >= threshold)


# ------------------------------------------------------ URL dedup


def canonicalize_url(url: "Column") -> "Column":
    """Canonical form of a URL for dedup purposes — the standard
    web-pipeline normalization chain, as one codegen'd expression:

    1. drop the fragment (``#...``),
    2. lowercase the scheme://host part (path/query stay
       case-sensitive),
    3. strip default ports (``https://h:443``, ``http://h:80``),
    4. strip tracking query params (``utm_*``, ``fbclid``,
       ``gclid``) and any dangling ``?``/``&``,
    5. strip one trailing slash.

    Regexes live in the Java∩RE2 intersection (no lookaround/
    backrefs in patterns) so the SQL oracle reproduces every step;
    only the $1-vs-\\1 replacement spelling differs per engine."""
    u = F.regexp_replace(url, "#.*$", "")
    u = F.concat(
        F.lower(F.regexp_extract(u, "^([^/]+://[^/]+)", 1)),
        F.regexp_replace(u, "^[^/]+://[^/]+", ""),
    )
    u = F.regexp_replace(u, "^(https://[^/:]+):443($|/)", "$1$2")
    u = F.regexp_replace(u, "^(http://[^/:]+):80($|/)", "$1$2")
    # anchored to a ?/& separator: an unanchored match would fire
    # mid-token ('?xutm_source=1' → '?x') and inside path segments,
    # silently merging genuinely different URLs
    u = F.regexp_replace(u, "([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*", "$1")
    u = F.regexp_replace(u, "([?&])&+", "$1")
    u = F.regexp_replace(u, "[?&]$", "")
    return F.regexp_replace(u, "/$", "")


def url_duplicates(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level dedup → (canonical_url, keep_id, n_variants): group
    documents whose URLs canonicalize identically, keep the smallest
    id — the crawl-frontier/dedup signal that catches the same page
    fetched as http/https, with tracking params, fragments or a
    trailing slash.

    100-TB posture: one codegen'd projection + one hash groupBy on
    the canonical string — the d1 shape."""
    return (
        docs.select(
            F.col(id_col), canonicalize_url(F.col(url_col)).alias("canonical_url")
        )
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_variants"),
        )
    )


def simhash_neardup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    bits: int = 16,
    k: int = 3,
    id_mode: str = "hashed",
    max_bucket: int | None = MAX_BUCKET,
) -> DataFrame:
    """SimHash near-duplicate PAIRS within Hamming distance ``k``
    (Manku, Jain & Sarma's block-permutation scheme, public WWW
    2007): split each signature into ``k+1`` equal bit blocks — two
    signatures within Hamming ``k`` must agree on at least one block
    (pigeonhole) — bucket-join on (block, value), then verify with
    an exact ``bit_count(sh1 XOR sh2) <= k``.

    Returns (doc1, doc2, hamming), doc1 < doc2, each pair once.

    Scale posture: candidate generation is the bucketed-join shape
    of d2 with the same mandatory ``_cap_buckets`` skew insurance;
    verification is one codegen'd XOR/popcount per candidate.  At
    real corpus scale use ``bits=28`` with ``k=3`` (the widest
    (k+1)-divisible signature under ``simhash``'s 31-hash-bit cap;
    wider blocks → sparser buckets); the 16-bit default matches
    ``simhash``'s gate geometry."""
    sh = simhash(docs, text_col, bits, id_mode)
    return _hamming_pairs(sh, bits, k, max_bucket)


def _hamming_pairs(
    sh: DataFrame, bits: int, k: int, max_bucket: int | None
) -> DataFrame:
    """(doc1, doc2, hamming ≤ k) pairs from any (doc_id, sh) signature
    table via the Manku block-permutation scheme — the shared back end
    of :func:`simhash_neardup_pairs` (text) and the multimodal
    perceptual-hash dedup (``image_neardup_pairs``): k+1 equal bit
    blocks (pigeonhole-complete for Hamming ≤ k), capped bucket join,
    exact XOR-popcount verify."""
    nblocks = k + 1
    if bits % nblocks:
        raise ValueError(f"bits={bits} not divisible by k+1={nblocks} blocks")
    bw = bits // nblocks
    blocks = sh.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    (F.shiftright(F.col("sh"), b * bw) % F.lit(1 << bw))
                    for b in range(nblocks)
                ]
            )
        ).alias("blk", "bv"),
    )
    # streaming self-join, not _bucket_pairs — the SimHash block cap
    # is the MinHash MAX_BUCKET (1024): same rationale as
    # _band_candidates
    blocks = _cap_buckets(blocks, ["blk", "bv"], max_bucket)
    l = blocks.select(
        F.col("doc_id").alias("doc1"), F.col("sh").alias("sh1"), "blk", "bv"
    )
    r = blocks.select(
        F.col("doc_id").alias("doc2"), F.col("sh").alias("sh2"), "blk", "bv"
    )
    cand = (
        l.join(r, ["blk", "bv"])
        .where(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2", "sh1", "sh2")
        .distinct()
    )
    ham = F.bit_count(F.expr("sh1 ^ sh2"))
    return (
        cand.where(ham <= k)
        .select("doc1", "doc2", ham.cast("long").alias("hamming"))
    )


def duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    ngram: int = 8,
    min_docs: int = 2,
    key_mode: str = "hashed",
) -> DataFrame:
    """Exact substring-level duplication: maximal token spans covered
    by some ``ngram``-token window that appears verbatim in at least
    ``min_docs`` distinct documents.

    The span-level view of duplication (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022): document
    near-dup operators drop whole documents, but most real
    contamination is a shared boilerplate PARAGRAPH inside otherwise
    distinct pages — the actionable output is "which token ranges of
    which docs are duplicated", ready for masking or excision.

    → (doc_id, span_start, span_end, span_tokens): inclusive 0-based
    token positions of each maximal covered range, ``span_tokens`` =
    its width.  Two duplicated windows merge when their covered
    ranges touch (next start <= prev start + ngram), so the output
    is the interval union of all duplicated windows.

    Plan (scale posture): tokens and windows are built JVM-side from
    the split array (``transform`` over ``sequence`` + ``slice`` —
    no per-token shuffle, no Python); then
      1. ``(ngram, doc)`` pairs are DISTINCT'd — the partial
         aggregation collapses a boilerplate n-gram's million
         occurrences to its distinct-doc list map-side, which is why
         this is a groupBy chain and NOT a window over raw
         occurrences (a window would sort every occurrence of the
         skewed key in one task);
      2. n-grams reaching ``min_docs`` distinct docs (a tiny set —
         broadcast-eligible, AQE decides) semi-join back to the
         occurrence list, co-partitioned on the n-gram;
      3. per-doc gaps-and-islands over the hit positions (window on
         doc_id, then one partial-agg groupBy) yields the maximal
         spans.
    Every shuffle is keyed; nothing is all-pairs; the heaviest key
    (a corpus-wide n-gram) costs |docs| rows after step 1, not
    |occurrences|.

    ``key_mode`` follows the module's id-assignment convention:
    "hashed" (default) replaces each n-gram string with its
    ``xxhash64`` immediately after window construction, so every
    shuffle, aggregate and join moves 8-byte longs instead of
    ~``ngram``-word strings — measured ~5x end-to-end on the 10x
    replicated-corpus stress, where the duplicated set is the whole
    corpus and cannot be broadcast.  A 64-bit collision can only
    ADD a false duplicated window (two distinct n-grams colliding),
    at ~n²/2⁶⁴ probability — negligible curation noise.  "exact"
    keeps the strings (bit-reproducible across engines — the
    oracle-gated mode)."""
    from pyspark.sql import Window

    if ngram < 1:
        raise ValueError(f"ngram must be >= 1, got {ngram}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    if key_mode not in ("hashed", "exact"):
        raise ValueError(f"key_mode must be 'hashed' or 'exact', got {key_mode!r}")
    toks = spread_for_expansion(
        docs.select("doc_id", F.split(F.col(text_col), " ").alias("t")).where(
            F.size("t") >= ngram
        )
    )
    if key_mode == "hashed":
        # hash each TOKEN once, then fold the window's token hashes
        # with chained xxhash64(acc, h) — order-sensitive, no
        # overflow under ANSI mode (a Horner multiply would need
        # wrapping semantics), all long arithmetic.  Building the
        # ~ngram-word window STRING first and hashing that measured
        # ~3x slower end-to-end at 10x scale — allocation/GC churn.
        toks = toks.withColumn(
            "t", F.expr("transform(t, x -> xxhash64(x))")
        )
        ng_col = F.expr(
            f"transform(sequence(0, size(t) - {ngram}), "
            f"i -> aggregate(slice(t, i + 2, {ngram - 1}), "
            f"element_at(t, i + 1), "
            f"(acc, h) -> xxhash64(acc, h)))"
        )
    else:
        ng_col = F.expr(
            f"transform(sequence(0, size(t) - {ngram}), "
            f"i -> array_join(slice(t, i + 1, {ngram}), ' '))"
        )
    occ = toks.select(
        "doc_id", F.posexplode(ng_col).alias("pos", "ng")
    )
    per_doc = occ.select("ng", "doc_id").distinct()
    dup = (
        per_doc.groupBy("ng")
        .count()
        .where(F.col("count") >= min_docs)
        .select("ng")
    )
    hits = occ.join(dup, "ng", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.col("pos") > F.lag("pos").over(w) + ngram, 1
    ).otherwise(0)
    grouped = hits.withColumn("g", F.sum(brk).over(w))
    return (
        grouped.groupBy("doc_id", "g")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + (ngram - 1)).cast("long").alias("span_end"),
            (F.max("pos") - F.min("pos") + ngram).cast("long").alias(
                "span_tokens"
            ),
        )
        .drop("g")
    )


def maximal_matches(
    docs: DataFrame,
    text_col: str = "text",
    ngram: int = 8,
    max_occ: int | None = 64,
    key_mode: str = "hashed",
    within_doc: bool = False,
) -> DataFrame:
    """Variable-length MAXIMAL shared substrings between document
    pairs — the suffix-array-style signal of Lee et al.'s dedup
    pipeline (ACL 2022), derived from :func:`duplicate_spans`'s
    bucketed n-gram plan instead of a suffix array:

    a maximal shared token run of length L >= ``ngram`` between two
    docs contains exactly L - ngram + 1 matching ``ngram``-token
    anchor windows at CONSECUTIVE positions on one alignment
    diagonal (pos1 - pos2 constant), and it cannot be extended
    precisely because the anchor before/after the run does not
    match — so gaps-and-islands over anchor pairs grouped by
    (doc1, doc2, diagonal) reports EXACTLY the maximal matches, at
    full token resolution, with no suffix sort.

    → (doc1, doc2, start1, start2, match_tokens): one row per
    maximal cross-doc shared run (doc1 < doc2; all alignments are
    reported, so a phrase occurring twice in one doc and once in
    another yields two rows on different diagonals).
    ``within_doc=True`` additionally reports each document's
    INTERNAL maximal repeats (doc1 == doc2 rows with start1 >
    start2, one row per repeated alignment) — the complete
    Lee-et-al. repeat surface.  Unlike d11's
    per-doc interval UNION (which may merge windows shared with
    DIFFERENT partners into one range that is itself no one's
    verbatim match), every row here is a verbatim contiguous match
    of both docs — the contamination-attribution view.

    Plan (scale posture): windows built JVM-side exactly as in
    :func:`duplicate_spans`; occurrence counts per n-gram key
    collapse map-side (partial agg) and keys outside
    [2, ``max_occ``] are dropped BEFORE the pair join, so the
    self-join emits at most ``max_occ``² anchor pairs per key —
    the same degenerate-bucket cap discipline as MinHash-LSH's
    MAX_BUCKET (a corpus-wide boilerplate n-gram would otherwise
    emit O(occurrences²) pairs).  ``max_occ=None`` removes the cap
    (gate-scale / audit use ONLY — never at 100 TB).  The islands
    window is keyed on (doc1, doc2, diagonal) — no SinglePartition
    anywhere.  Dropping an over-cap INTERIOR anchor can split a
    run that crosses it (the cap is mirrored verbatim in the
    oracle, so the gate stays exact).

    ``key_mode`` as in :func:`duplicate_spans`: "hashed" (default)
    moves 8-byte xxhash64 chain keys through every shuffle — a
    collision can only ADD a spurious anchor at ~n²/2⁻⁶⁴
    probability; "exact" keeps the window strings (the oracle-gated
    bit-reproducible mode)."""
    # cross-doc pairs one direction only; within_doc additionally
    # keeps same-doc alignments at p1 > p2 (each internal repeat
    # pair once, on its positive diagonal — the trivial diag-0 self
    # match never appears), which is the Lee-et-al. within-document
    # repeat signal
    if max_occ is None:
        # uncapped audit path: streaming self-join (see _bucket_pairs)
        occ = _anchor_occurrences(docs, text_col, ngram, max_occ, key_mode)
        a = occ.select(
            F.col("doc_id").alias("doc1"), F.col("pos").alias("p1"), "ng"
        )
        b = occ.select(
            F.col("doc_id").alias("doc2"), F.col("pos").alias("p2"), "ng"
        )
        keep = F.col("doc1") < F.col("doc2")
        if within_doc:
            keep = keep | (
                (F.col("doc1") == F.col("doc2")) & (F.col("p1") > F.col("p2"))
            )
        pairs = a.join(b, "ng").where(keep).select(
            "doc1", "doc2", "p1", "p2", (F.col("p1") - F.col("p2")).alias("diag")
        )
        return _matches_from_pairs(pairs, ngram)
    # packed path: members sorted by (doc_id, pos), so a same-doc pair
    # always has a.pos < b.pos — mapping it to (p1=b.pos, p2=a.pos)
    # lands each internal repeat once on its positive diagonal,
    # exactly the legacy keep-predicate's output
    p = _anchor_pairs(docs, text_col, ngram, max_occ, key_mode)
    a, b = F.col("p.a"), F.col("p.b")
    same = a["doc_id"] == b["doc_id"]
    rows = p if within_doc else p.where(~same)
    pairs = rows.select(
        a["doc_id"].alias("doc1"),
        b["doc_id"].alias("doc2"),
        F.when(same, b["pos"]).otherwise(a["pos"]).alias("p1"),
        F.when(same, a["pos"]).otherwise(b["pos"]).alias("p2"),
    ).withColumn("diag", F.col("p1") - F.col("p2"))
    return _matches_from_pairs(pairs, ngram)


def _anchor_windows(
    docs: DataFrame,
    text_col: str,
    ngram: int,
    max_occ: int | None,
    key_mode: str,
) -> DataFrame:
    """(doc_id, pos, ng) EVERY n-gram window occurrence — argument
    validation + JVM-side window construction shared by the packed
    (capped) and flat (uncapped legacy) anchor paths.  ``max_occ`` is
    validated here but applied by the caller (packed size filter or
    the legacy count semi-join)."""
    if ngram < 1:
        raise ValueError(f"ngram must be >= 1, got {ngram}")
    if max_occ is not None and max_occ < 2:
        raise ValueError(f"max_occ must be >= 2 or None, got {max_occ}")
    if key_mode not in ("hashed", "exact"):
        raise ValueError(f"key_mode must be 'hashed' or 'exact', got {key_mode!r}")
    toks = spread_for_expansion(
        docs.select("doc_id", F.split(F.col(text_col), " ").alias("t")).where(
            F.size("t") >= ngram
        )
    )
    if key_mode == "hashed":
        toks = toks.withColumn(
            "t", F.expr("transform(t, x -> xxhash64(x))")
        )
        ng_col = F.expr(
            f"transform(sequence(0, size(t) - {ngram}), "
            f"i -> aggregate(slice(t, i + 2, {ngram - 1}), "
            f"element_at(t, i + 1), "
            f"(acc, h) -> xxhash64(acc, h)))"
        )
    else:
        ng_col = F.expr(
            f"transform(sequence(0, size(t) - {ngram}), "
            f"i -> array_join(slice(t, i + 1, {ngram}), ' '))"
        )
    return toks.select("doc_id", F.posexplode(ng_col).alias("pos", "ng"))


def _anchor_occurrences(
    docs: DataFrame,
    text_col: str,
    ngram: int,
    max_occ: int | None,
    key_mode: str,
) -> DataFrame:
    """Flat (doc_id, pos, ng) duplicated-anchor occurrences with the
    [2, max_occ] occurrence filter applied via a count semi-join —
    the LEGACY front end kept for the uncapped (``max_occ=None``)
    gate/audit path, where the packed form's in-row pair arrays would
    be unbounded.  Capped callers use ``_anchor_pairs`` instead (one
    evaluation of the window pipeline instead of four: the semi-join
    here re-evaluates it once per side, and the downstream pair
    self-join doubled that again)."""
    occ = _anchor_windows(docs, text_col, ngram, max_occ, key_mode)
    cnt = occ.groupBy("ng").count().where(F.col("count") >= 2)
    if max_occ is not None:
        cnt = cnt.where(F.col("count") <= max_occ)
    return occ.join(cnt.select("ng"), "ng", "left_semi")


def _anchor_pairs(
    docs: DataFrame,
    text_col: str,
    ngram: int,
    max_occ: int,
    key_mode: str,
    bipartite: bool = False,
) -> DataFrame:
    """Packed anchor-pair generation for capped callers: ONE ng-keyed
    groupBy packs each duplicated window's (doc_id, pos) occurrence
    list (the [2, max_occ] filter applied on the packed size — same
    semantics as the legacy count semi-join), then pairs are emitted
    in-row.  Returns exploded ``p`` = struct<a:(doc_id,pos),
    b:(doc_id,pos)> with a < b in (doc_id, pos) order (bipartite:
    a even doc_id, b odd)."""
    occ = _anchor_windows(docs, text_col, ngram, max_occ, key_mode)
    return _bucket_pairs(occ, ["ng"], max_occ, ["doc_id", "pos"], bipartite)


def _matches_from_pairs(pairs: DataFrame, ngram: int) -> DataFrame:
    """Diagonal gaps-and-islands over (doc1, doc2, p1, p2, diag)
    anchor pairs → one row per maximal match — shared back end of the
    self-join and bipartite match operators."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc1", "doc2", "diag").orderBy("p1")
    brk = F.when(F.col("p1") > F.lag("p1").over(w) + 1, 1).otherwise(0)
    grouped = pairs.withColumn("g", F.sum(brk).over(w))
    return (
        grouped.groupBy("doc1", "doc2", "diag", "g")
        .agg(
            F.min("p1").cast("long").alias("start1"),
            F.min("p2").cast("long").alias("start2"),
            (F.max("p1") - F.min("p1") + ngram).cast("long").alias(
                "match_tokens"
            ),
        )
        .drop("diag", "g")
    )


def cross_corpus_matches(
    docs: DataFrame,
    ref: DataFrame,
    text_col: str = "text",
    ngram: int = 8,
    max_occ: int | None = 64,
    key_mode: str = "hashed",
) -> DataFrame:
    """Verbatim maximal shared substrings BETWEEN two corpora — the
    span-attribution form of decontamination: c2 scores each training
    doc's contaminated n-gram fraction, d20 flags whole-document
    near-dups; this reports exactly WHICH token runs of which
    training docs appear verbatim in which benchmark docs (ready for
    excision with :func:`excise_duplicate_spans`'s machinery), the
    Lee-et-al. suffix-array signal restricted to cross-corpus
    alignments.

    → (doc_id, ref_id, start_doc, start_ref, match_tokens): one row
    per maximal run of ≥ ``ngram`` tokens shared by training doc
    ``doc_id`` and benchmark doc ``ref_id`` (all alignments).

    Plan: both corpora tag into one frame (sid = 2·id + side, the
    d20 convention) so window construction and the occurrence cap
    run ONCE over the union (the cap counts UNION occurrences —
    mirrored in the oracle); anchor sides split by parity BEFORE the
    pair join, so same-corpus anchor pairs are never generated; then
    the shared diagonal-islands back end.  Same bounded-join posture
    as d14: ≤ ``max_occ``² anchor pairs per surviving key."""
    tagged = docs.select(
        (F.col("doc_id") * 2).alias("doc_id"), F.col(text_col).alias(text_col)
    ).unionByName(
        ref.select(
            (F.col("doc_id") * 2 + 1).alias("doc_id"),
            F.col(text_col).alias(text_col),
        )
    )
    # pmod + floor-div decode: the d20 negative-id rule (see
    # cross_corpus_neardup)
    if max_occ is None:
        # uncapped audit path: streaming bipartite join
        occ = _anchor_occurrences(tagged, text_col, ngram, max_occ, key_mode)
        a = occ.where(F.pmod(F.col("doc_id"), F.lit(2)) == 0).select(
            F.col("doc_id").alias("doc1"), F.col("pos").alias("p1"), "ng"
        )
        b = occ.where(F.pmod(F.col("doc_id"), F.lit(2)) == 1).select(
            F.col("doc_id").alias("doc2"), F.col("pos").alias("p2"), "ng"
        )
        pairs = a.join(b, "ng").select(
            "doc1", "doc2", "p1", "p2", (F.col("p1") - F.col("p2")).alias("diag")
        )
    else:
        p = _anchor_pairs(
            tagged, text_col, ngram, max_occ, key_mode, bipartite=True
        )
        pairs = p.select(
            F.col("p.a.doc_id").alias("doc1"),
            F.col("p.b.doc_id").alias("doc2"),
            F.col("p.a.pos").alias("p1"),
            F.col("p.b.pos").alias("p2"),
            (F.col("p.a.pos") - F.col("p.b.pos")).alias("diag"),
        )
    out = _matches_from_pairs(pairs, ngram)
    return out.select(
        F.expr("(doc1 - pmod(doc1, 2)) div 2").alias("doc_id"),
        F.expr("(doc2 - pmod(doc2, 2)) div 2").alias("ref_id"),
        F.col("start1").alias("start_doc"),
        F.col("start2").alias("start_ref"),
        "match_tokens",
    )


def spans_from_matches(matches: DataFrame) -> DataFrame:
    """Convert :func:`maximal_matches` output into per-doc excisable
    spans under the KEEP-FIRST-OCCURRENCE policy (the Lee-et-al.
    dedup action): for a cross-doc match the higher doc_id's range
    is the duplicate; for a within-doc match (doc1 == doc2, start1 >
    start2 by construction) the LATER occurrence is.  Feed the
    result to :func:`excise_duplicate_spans` — its coverage filter
    handles overlapping spans, so no pre-merge is needed.

    → (doc_id, span_start, span_end): one row per excised range
    (inclusive token positions), distinct.  Pure projections + one
    distinct — no new shuffle class on top of the matches plan."""
    cross = F.col("doc1") < F.col("doc2")
    return (
        matches.select(
            F.when(cross, F.col("doc2")).otherwise(F.col("doc1")).alias(
                "doc_id"
            ),
            F.when(cross, F.col("start2")).otherwise(F.col("start1")).alias(
                "span_start"
            ),
            (
                F.when(cross, F.col("start2")).otherwise(F.col("start1"))
                + F.col("match_tokens") - 1
            ).alias("span_end"),
        )
        .distinct()
    )


def excise_duplicate_spans(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Apply :func:`duplicate_spans` output to the corpus: drop every
    token covered by a span and rebuild the text — the excision step
    of substring-level dedup (the usual pipeline keeps ONE canonical
    copy upstream and excises the rest; which copies reach this
    operator is the caller's policy).

    → all ``docs`` columns with ``text_col`` rewritten, plus
    ``n_removed`` (tokens dropped; 0 for untouched docs).

    Plan: spans collapse to one row per doc (groupBy → array of
    [start, end] pairs), RIGHT-joins the corpus (untouched docs pass
    through with a null span list), and the rewrite is a JVM-side
    ``filter`` over the token array testing coverage with ``exists``
    — per-token cost is |spans in that doc|, no Python, no explode:
    the only wide operations are one groupBy and one keyed join,
    both on doc_id.  At 100 TB the span side is tiny relative to the
    corpus (AQE broadcasts it when it fits)."""
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.array("span_start", "span_end")).alias("_spans")
    )
    joined = per_doc.join(docs, "doc_id", "right")
    t = F.split(F.col(text_col), " ")
    kept = F.expr(
        "filter(transform(t, (x, i) -> struct(x AS x, i AS i)), "
        "s -> NOT exists(_spans, sp -> s.i >= sp[0] AND s.i <= sp[1]))"
    )
    out = (
        joined.withColumn("t", t)
        .withColumn("_kept", F.coalesce(
            F.when(F.col("_spans").isNotNull(), kept), F.expr(
                "transform(t, (x, i) -> struct(x AS x, i AS i))"
            ),
        ))
        .withColumn("n_removed", (F.size("t") - F.size("_kept")).cast("long"))
        .withColumn(
            text_col,
            F.array_join(F.expr("transform(_kept, s -> s.x)"), " "),
        )
        .drop("t", "_kept", "_spans")
    )
    return out


# ---------------------------------------------------------------------
# cross-corpus Bloom membership — dedup NEW data against an EXISTING
# corpus without joining the corpus itself
# ---------------------------------------------------------------------

def bloom_build(
    df: DataFrame,
    col: str = "text",
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
) -> DataFrame:
    """Distributed Bloom-filter bitmap over ``df[col]`` as
    ``(word_idx, bits)`` int64 rows — at most ``n_bits/64`` rows
    REGARDLESS of corpus size (the count-min bound argument).  Each
    value sets ``n_hashes`` bits at ``xxhash64(value, seed) mod
    n_bits``; the per-partition bit_or partials merge associatively,
    so the build is one bounded shuffle over the whole corpus.

    Size the filter for the corpus: false-positive rate ≈
    (1 - e^(-k·n/m))^k, so m ≈ 10 bits/key gives <1% at k=4.  The
    guarantee that matters for dedup is one-sided: a Bloom filter
    NEVER false-negatives, so "not in filter" is a safe keep."""
    if n_bits < 64 or n_bits & (n_bits - 1):
        raise ValueError(f"n_bits must be a power of two >= 64, got {n_bits}")
    if not (1 <= n_hashes <= 16):
        raise ValueError(f"n_hashes must be in [1, 16], got {n_hashes}")
    pos = df.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(n_bits))
                    for i in range(n_hashes)
                ]
            )
        ).alias("pos")
    )
    return (
        pos.select(
            F.shiftright(F.col("pos"), 6).alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))"
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_membership(
    ref: DataFrame | None,
    probe: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
    broadcast: bool = True,
    bitmap: DataFrame | None = None,
) -> DataFrame:
    """Flag each ``probe`` row whose ``col`` value is (probably) in
    ``ref`` — the incremental-crawl dedup primitive: new data is
    checked against an existing corpus through a bitmap instead of a
    join against the corpus itself.  Output: ``(id_col, maybe_dup)``
    where ``maybe_dup = false`` is CERTAIN (Bloom filters have no
    false negatives under the same hash family) and ``true`` means
    "duplicate or false positive at the configured rate".

    Plan: the ref side collapses to the ``n_bits/64``-row bitmap
    (one bounded shuffle); each probe row explodes to ``n_hashes``
    (word_idx, bit) lookups joined against the bitmap —
    ``broadcast=True`` (default) broadcasts the bitmap (m bits / 8
    bytes on the wire; right up to a few GB), ``broadcast=False``
    shuffles the lookups on word_idx instead for filters too big to
    ship — then one groupBy on the probe id ANDs the hits.  The
    corpus is never joined row-to-row.

    Pass a prebuilt ``bitmap`` (e.g. the merged incremental state
    from ``streaming.dedup.bloom_state``) to probe without
    rebuilding; ``n_bits``/``n_hashes`` must then match the build."""
    if bitmap is None:
        if ref is None:
            raise ValueError(
                "bloom_membership needs either ref or a prebuilt bitmap"
            )
        bitmap = bloom_build(ref, col=col, n_bits=n_bits, n_hashes=n_hashes)
    lookups = probe.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(n_bits))
                    for i in range(n_hashes)
                ]
            )
        ).alias("pos"),
    ).select(
        id_col,
        F.shiftright(F.col("pos"), 6).alias("word_idx"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))"
        ).alias("bit"),
    )
    side = F.broadcast(bitmap) if broadcast else bitmap
    return (
        lookups.join(side, "word_idx", "left")
        .withColumn(
            "hit",
            F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("bit"))
            != F.lit(0),
        )
        .groupBy(id_col)
        .agg(F.bool_and("hit").alias("maybe_dup"))
    )


def keep_best_in_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    max_iters: int = 50,
) -> DataFrame:
    """Quality-aware cluster keep policy — the curation decision that
    follows near-dup clustering: within every duplicate cluster keep
    the HIGHEST-QUALITY member, not the minimum id (d7's
    ``is_representative`` is the id-stable default; real pipelines
    keep the best copy of a templated page, which is rarely the
    oldest one).

    ``pairs`` is any near-dup pair table (id1, id2) — d2/d4/d6/d8
    all emit one.  Returns (doc_id, component, quality, keep):
    every document scored with the t2 quality expression, clustered
    through :func:`dup_components`' min-label propagation, and
    exactly one ``keep`` per component — argmax quality, doc_id
    breaking ties, so the decision is bit-deterministic.  Singleton
    components keep themselves.

    100-TB posture: the component labels come from the O(log n)
    pointer-doubling loop (already checkpoint-bounded); the keep
    decision adds ONE component-keyed window (never SinglePartition)
    over a projection whose quality column is fused into the scan.
    """
    from pyspark.sql import Window

    from dask_traj_spark.functions.text import quality_expr

    comp = dup_components(pairs, docs.select("doc_id"), max_iters=max_iters)
    scored = docs.select(
        "doc_id", quality_expr(text_col).alias("quality")
    ).join(comp.select("doc_id", "component"), "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .select(
            "doc_id",
            "component",
            "quality",
            (F.col("rk") == 1).cast("long").alias("keep"),
        )
    )


def soft_dedup_weights(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 50,
) -> DataFrame:
    """Soft deduplication — reweight instead of drop (the SoftDeDup
    idea, He et al., "SoftDedup: an Efficient Data Reweighting Method
    for Speeding Up Language Model Pre-training", public ACL 2024):
    keep EVERY document but scale its sampling weight by the inverse
    of its near-dup cluster size, so each distinct content item
    contributes ~one document's worth of expected tokens per epoch
    while high-multiplicity boilerplate keeps a small, nonzero
    gradient signal (hard dedup's keep-one policy is the
    weight ∈ {0, 1} special case — d16 for quality-aware keeps).

    ``pairs`` is any near-dup pair table (id1, id2) — d2/d4/d6/d8
    all emit one.  Returns (``id_col``, component, cluster_size,
    weight) with weight = 1 / cluster_size — exact integer division,
    bit-identical across engines; Σ weight = number of distinct
    clusters by construction (the conservation law the unit test
    pins).

    100-TB posture: component labels come from
    :func:`dup_components`' O(log n) pointer-doubling loop
    (checkpoint-bounded); the size attach is one partial-aggregable
    component-keyed count + one keyed join (AQE handles a degenerate
    mega-cluster's skew) — never a window over raw members, never
    SinglePartition."""
    comp = dup_components(pairs, nodes, id_col=id_col, max_iters=max_iters)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return comp.join(sizes, "component").select(
        id_col,
        "component",
        F.col("cluster_size").cast("long").alias("cluster_size"),
        (F.lit(1.0) / F.col("cluster_size").cast("double")).alias("weight"),
    )


def quality_soft_dedup_weights(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    max_iters: int = 50,
) -> DataFrame:
    """Quality-apportioned soft deduplication — the d16 × d19
    composition: every near-dup cluster still contributes ONE
    document's worth of expected sampling mass per epoch (d19's
    conservation law), but that mass is split by the t2 quality
    score instead of uniformly, so the best copy of a templated page
    dominates the cluster's gradient signal while worse copies keep
    a small share (d16's keep-one argmax is the limit where the
    winner takes the whole unit; d19's 1/size is the limit where
    quality is flat).

    Returns (doc_id, component, quality, weight) with
    weight = q_i / Σ_cluster q_j, where q is the t2 quality snapped
    to the 2^-20 grid BEFORE the cluster sum — grid values are exact
    in f64 and their sums are order-independent, so the Spark
    partial-agg total and a sequential SQL sum agree bitwise, and
    the final division is a single correctly-rounded op (the
    "snap products before summing" rule).  The division needs no
    zero guard: t2's length_score is ≥ 1/50 for ANY string (split
    always yields ≥ 1 token), so quality ≥ 1/150 ≈ 1.4e5 grid units
    and every cluster sum is strictly positive — pinned by
    ``test_quality_expr_strictly_positive``.

    100-TB posture: identical to :func:`soft_dedup_weights` — the
    component labels come from :func:`dup_components`' O(log n)
    checkpoint-bounded loop; the apportioning adds one
    component-keyed sum + one keyed join (partial-aggregable, AQE
    handles mega-cluster skew), with the quality expression fused
    into the document scan.  Never a window over raw members, never
    SinglePartition."""
    from dask_traj_spark.functions.text import quality_expr

    g = F.lit(1048576.0)  # 2^-20 grid — the LP_GRID convention
    scored = docs.select(
        "doc_id",
        (F.round(quality_expr(text_col) * g, 0) / g).alias("quality"),
    )
    # the scored join (docs scan + quality expression) feeds BOTH the
    # qsum aggregate and the final join — tracked-persist it or the
    # corpus text scan runs twice per action (exchange reuse is an
    # optimization, not a guarantee)
    comp = _tracked_persist(
        dup_components(
            pairs, docs.select("doc_id"), max_iters=max_iters
        ).join(scored, "doc_id")
    )
    totals = comp.groupBy("component").agg(F.sum("quality").alias("qsum"))
    return comp.join(totals, "component").select(
        "doc_id",
        "component",
        "quality",
        (F.col("quality") / F.col("qsum")).alias("weight"),
    )


def winnow_matches(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = MAX_SHINGLE_DF,
    text_col: str = "text",
    id_mode: str = "hashed",
) -> DataFrame:
    """MOSS-style document matching over winnowing fingerprints
    (the action on t22's selections): (doc1, doc2, n_shared) pairs
    counting DISTINCT shared fingerprint values, doc1 < doc2,
    n_shared >= ``min_shared``.  Because winnowing guarantees a
    fingerprint in every w-window, n_shared lower-bounds how much
    verbatim overlap two documents share — the candidate generator
    MOSS builds its plagiarism report from, and the cheap first pass
    before d14's exact maximal-match attribution.

    Plan: distinct (doc, fp) → ONE fp-keyed groupBy packing each
    fingerprint's doc list (document-frequency cap ``max_df`` applied
    on the packed size — the MinHash MAX_BUCKET discipline: a
    boilerplate fingerprint shared by B docs would emit O(B²) pairs;
    the cap is mirrored in the oracle) → in-row pair emission → pair
    count.  See ``_bucket_pairs``: the previous self-join form
    re-evaluated the whole fingerprint pipeline per join side.

    ``id_mode`` passes through to ``winnow_fingerprints``:
    'hashed' (xxhash64, zero-shuffle fingerprinting) is the 100-TB
    default; 'sorted' is the SQL-mirrorable gate path."""
    from dask_traj_spark.functions.text import winnow_fingerprints

    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    fps = (
        winnow_fingerprints(docs, k=k, w=w, text_col=text_col, id_mode=id_mode)
        .select("doc_id", "fp")
        .distinct()
    )
    if max_df is None:
        # uncapped gate/audit path: streaming self-join (see
        # _bucket_pairs on why the packed form requires the cap)
        a = fps.select(F.col("doc_id").alias("doc1"), "fp")
        b = fps.select(F.col("doc_id").alias("doc2"), "fp")
        pairs = a.join(b, "fp").where(F.col("doc1") < F.col("doc2"))
    else:
        pairs = _bucket_pairs(fps, ["fp"], max_df, ["doc_id"]).select(
            F.col("p.a.doc_id").alias("doc1"),
            F.col("p.b.doc_id").alias("doc2"),
        )
    return (
        pairs.groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= F.lit(int(min_shared)))
    )
