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

from dask_traj_spark.functions.text import tokens


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
        order = (F.col("doc_id") * F.lit(_MIX_A)) % F.lit(_MIX_M)
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
