"""Deduplication operators for large-scale corpus pipelines.

Beyond-reference capability block: exact dedup, MinHash+LSH near-dup,
SimHash, and n-gram Jaccard — the standard toolbox for cleaning a
100 TB training corpus, expressed as declarative Spark plans.

Plan shapes (scale posture):

- **exact**: one hash-groupBy over the corpus — partial+final agg,
  one shuffle on a 32-char key.
- **minhash/LSH**: tokens → (broadcast) vocab join → k min-aggs per
  doc (ONE groupBy), band hashes → self-join on (band, hash) buckets
  → candidate pairs → Jaccard verify on the token sets. Only
  same-bucket docs are ever paired — the O(n²) comparison never
  materializes. Skewed buckets (boilerplate docs) are the classic
  hazard: AQE skew-join handles moderate skew; degenerate buckets
  should be capped upstream (drop buckets above a size threshold).
- **simhash**: one groupBy producing a 16-bit signature per doc;
  near-dup candidates = equal signatures (or Hamming-adjacent via
  banding the bits).
- **ngram-jaccard**: bigram shingles → same bucket-join + verify
  shape as LSH, with shingles as the buckets.

Determinism (DuckDB oracle hash-compares values): token/shingle ids
come from sorted-vocab dense ranks; min-hash uses integer affine
hashes ((a·tid+b) mod p); Jaccard is one double division of exact
ints. All mirrored verbatim in the SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dask_traj_spark.functions.text import tokens, vocab

#: affine minhash constants: h_i(t) = (A_i * t + B_i) mod P. Fixed,
#: mirrored in the oracle SQL.
MINHASH_P = 2_147_483_647
N_HASHES = 16
N_BANDS = 8  # 2 rows per band
BAND_MIX = 1_000_003


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


def _doc_token_ids(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, tid) distinct token-id sets (broadcast sorted vocab)."""
    tok = tokens(docs, text_col)
    v = F.broadcast(vocab(tok))
    return tok.join(v, "word").select("doc_id", "tid").distinct()


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, h0..h{k-1}) — k min-aggregations in one groupBy."""
    dt = _doc_token_ids(docs, text_col)
    aggs = []
    for i in range(N_HASHES):
        a, b = _hash_consts(i)
        aggs.append(
            F.min((F.col("tid").cast("long") * a + b) % MINHASH_P).alias(f"h{i}")
        )
    return dt.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc1, doc2) candidate near-dup pairs: docs sharing any LSH
    band bucket (band hash = h_{2b} * mix + h_{2b+1})."""
    sig = minhash_signatures(docs, text_col)
    bands = sig.select(
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
    l = bands.select(F.col("doc_id").alias("doc1"), "band", "bh")
    r = bands.select(F.col("doc_id").alias("doc2"), "band", "bh")
    return (
        l.join(r, ["band", "bh"])
        .where(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )


def _jaccard_verify(pairs: DataFrame, dt: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate pairs from distinct token sets."""
    sizes = dt.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    t1 = dt.select(F.col("doc_id").alias("doc1"), "tid")
    t2 = dt.select(F.col("doc_id").alias("doc2"), "tid")
    inter = (
        pairs.join(t1, "doc1")
        .join(t2, ["doc2", "tid"])
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "doc1", "sz": "sz1"}), "doc1")
        .join(sizes.withColumnsRenamed({"doc_id": "doc2", "sz": "sz2"}), "doc2")
        .select(
            "doc1",
            "doc2",
            (
                F.col("inter").cast("double")
                / (F.col("sz1") + F.col("sz2") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
    )


def near_duplicates_minhash(
    docs: DataFrame, threshold: float = 0.8, text_col: str = "text"
) -> DataFrame:
    """MinHash-LSH near-dup pairs with exact-Jaccard verification:
    (doc1, doc2, jaccard) where jaccard ≥ threshold."""
    dt = _doc_token_ids(docs, text_col)
    cand = lsh_candidate_pairs(docs, text_col)
    return _jaccard_verify(cand, dt).where(F.col("jaccard") >= threshold)


def simhash(docs: DataFrame, text_col: str = "text", bits: int = 16) -> DataFrame:
    """(doc_id, sh) 16-bit SimHash over the distinct token set:
    bit j set iff sum over tokens of (2·bit_j(h(tid)) − 1) > 0,
    h(t) = (1103515245·t + 12345) mod 2^31."""
    dt = _doc_token_ids(docs, text_col)
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


def _doc_shingle_ids(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, sid) distinct word-bigram shingle ids via a sorted
    shingle vocabulary (dense ranks — same bounded-vocab caveat as
    the token vocab)."""
    from pyspark.sql import Window

    tok = tokens(docs, text_col)
    nxt = tok.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("word").alias("word2")
    )
    big = (
        tok.join(nxt, ["doc_id", "pos"])
        .select("doc_id", F.concat_ws("_", "word", "word2").alias("shingle"))
        .distinct()
    )
    sv = F.broadcast(
        big.select("shingle")
        .distinct()
        .select("shingle", F.row_number().over(Window.orderBy("shingle")).alias("sid"))
    )
    return big.join(sv, "shingle").select("doc_id", F.col("sid").alias("tid"))


def near_duplicates_ngram(
    docs: DataFrame, threshold: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """Word-bigram (2-gram) Jaccard near-dup pairs: candidates are
    docs sharing ≥1 shingle; (doc1, doc2, jaccard ≥ threshold)."""
    ds = _doc_shingle_ids(docs, text_col)
    s1 = ds.select(F.col("doc_id").alias("doc1"), "tid")
    s2 = ds.select(F.col("doc_id").alias("doc2"), "tid")
    cand = (
        s1.join(s2, "tid")
        .where(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2")
        .distinct()
    )
    return _jaccard_verify(cand, ds).where(F.col("jaccard") >= threshold)
