"""End-to-end training-data curation walkthrough.

The operators a 100-TB LLM-data pipeline runs between "raw crawl"
and "training mix", chained over the driver's ``documents`` table —
every step is the REAL engine operator the oracle gate scores, in
the order a production pipeline applies them:

  quality filter → exact dedup → span excision → decontamination →
  DSIR target-likeness scoring → per-source percentile pruning →
  length-weighted sampling → leak-proof split → sequence packing →
  context chunking → deterministic shard shuffle

Run: ``python examples/curation_pipeline.py [sf_dir]``
(default /root/testdata/sf0.001 — a few seconds on local[4]).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

import dask_traj_spark as dts


def main(spark=None, sf_dir=None) -> None:
    # argv belongs to the host process (pytest, a notebook kernel);
    # only the standalone __main__ path may read it
    if sf_dir is None:
        sf_dir = "/root/testdata/sf0.001"
    own_session = spark is None
    if own_session:
        spark = dts.get_spark(app_name="curation-example", master="local[4]")
        spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()
    print(f"raw corpus: {n0} docs")

    # 1. rule-based cleaning (C4-style flags; keep the survivors)
    from dask_traj_spark.operators.curation import heuristic_filter

    kept = heuristic_filter(docs, min_words=10).where("keep").select("doc_id")
    docs = docs.join(kept, "doc_id")
    print(f"after heuristic filter: {docs.count()}")

    # 2. exact dedup (hash-groupBy; keep the minimum doc_id per text)
    from dask_traj_spark.operators.dedup import exact_duplicates

    reps = exact_duplicates(docs).select(F.col("keep_id").alias("doc_id"))
    docs = docs.join(reps, "doc_id")
    print(f"after exact dedup: {docs.count()}")

    # 3. span-level dedup: excise duplicated token ranges in place
    #    (Lee et al. — dedup the SUBSTRINGS, keep the documents)
    from dask_traj_spark.operators.dedup import (
        duplicate_spans,
        excise_duplicate_spans,
    )

    spans = duplicate_spans(docs, ngram=8)
    docs = excise_duplicate_spans(docs, spans)
    n_excised = docs.where(F.col("n_removed") > 0).count()
    docs = docs.drop("n_removed")
    print(f"after span excision: {n_excised} texts rewritten in place")

    # 4. benchmark decontamination: drop anything sharing trigrams
    #    with the "eval set" (stand-in: every 50th doc)
    from dask_traj_spark.operators.curation import decontaminate

    bench = docs.where(F.col("doc_id") % 50 == 0)
    scores = decontaminate(docs, bench, n=3)
    clean = scores.where(F.col("contamination") < 0.5).select("doc_id")
    docs = docs.join(clean, "doc_id")
    print(f"after decontamination: {docs.count()}")

    # 5. DSIR: score every doc's likeness to a target distribution
    #    (stand-in target: the doc_id % 20 slice)
    from dask_traj_spark.operators.curation import dsir_importance

    target = docs.where(F.col("doc_id") % 20 == 0)
    dsir = dsir_importance(docs, target)
    top = dsir.orderBy(F.desc("avg_logratio")).limit(3).collect()
    print("most target-like docs:",
          [(r["doc_id"], round(r["avg_logratio"], 3)) for r in top])

    # 6. per-source percentile pruning: keep each source's top 60%
    from dask_traj_spark.operators.curation import quantile_prune

    pruned = quantile_prune(docs, keep_frac=0.6)
    docs = docs.join(pruned.select("doc_id"), "doc_id")
    print(f"after per-source quality pruning: {docs.count()}")

    # 7. length-weighted draw: 100 docs, P(doc) ∝ its token count
    from dask_traj_spark.operators.curation import weighted_sample

    sample = weighted_sample(docs, k=min(100, docs.count()))
    docs = docs.join(sample.select("doc_id"), "doc_id")
    print(f"weighted sample: {docs.count()} docs, "
          f"mean weight {sample.agg(F.avg('weight')).first()[0]:.1f}")

    # 8. leak-proof split + sequence packing for the training run
    from dask_traj_spark.operators.curation import (
        dataset_split,
        pack_sequences,
    )

    split = dataset_split(docs)
    train = docs.join(
        split.where("split = 'train'").select("doc_id"), "doc_id"
    )
    packed = pack_sequences(train, budget=512)
    n_seqs = packed.agg(
        F.max(F.col("start_seq") + F.col("n_seqs"))
    ).first()[0]
    print(f"train split: {train.count()} docs → {n_seqs} sequences of 512")

    # 9. long docs split into overlapping context windows, then the
    #    reproducible epoch shuffle: chunk → shard → position
    from dask_traj_spark.operators.curation import (
        context_chunks,
        shuffle_shards,
    )

    chunks = context_chunks(train, chunk_tokens=64, stride=48)
    keyed = chunks.withColumn(
        "chunk_id", F.col("doc_id") * F.lit(1024) + F.col("chunk_idx")
    )
    sharded = shuffle_shards(keyed, n_shards=4, id_col="chunk_id")
    per_shard = sharded.groupBy("shard").count().orderBy("shard").collect()
    print(
        f"context chunks: {sum(r['count'] for r in per_shard)} → shards "
        + str({r["shard"]: r["count"] for r in per_shard})
    )

    # 10. the budget cut: each source's best-quality prefix that fits
    #     a token budget — the "best data that fits the compute"
    #     decision after all scoring is done
    from dask_traj_spark.operators.curation import budget_select

    sel = budget_select(docs, budget_tokens=2000)
    n_sel, n_tok = sel.where("selected = 1").agg(
        F.count(F.lit(1)), F.sum("n_tokens")
    ).first()
    print(f"budget cut: {n_sel} docs / {n_tok} tokens within 2000/source")

    # 11. or keep EVERYTHING and reweight: inverse-cluster-size
    #     sampling weights (SoftDeDup) — Σ weight = #distinct clusters
    from dask_traj_spark.operators.dedup import (
        near_duplicates_minhash,
        soft_dedup_weights,
    )

    nd_pairs = near_duplicates_minhash(docs, threshold=0.9).select(
        F.col("doc1").alias("id1"), F.col("doc2").alias("id2")
    )
    weights = soft_dedup_weights(nd_pairs, docs.select("doc_id"))
    total_w, n_clusters = weights.agg(
        F.sum("weight"), F.countDistinct("component")
    ).first()
    print(f"soft dedup: Σ weight {total_w:.1f} == {n_clusters} clusters")

    # 12. quality-apportioned variant: the cluster's unit mass split
    #     by t2 quality instead of uniformly (d16's argmax keep and
    #     step 11's 1/size are the two limits)
    from dask_traj_spark.operators.dedup import (
        quality_soft_dedup_weights,
        release_caches,
    )

    qw = quality_soft_dedup_weights(docs, nd_pairs)
    q_total, q_clusters = qw.agg(
        F.sum("weight"), F.countDistinct("component")
    ).first()
    print(
        f"quality soft dedup: Σ weight {q_total:.1f} == {q_clusters} clusters"
    )

    # the dedup operators cache shared intermediates for their lazy
    # results' lifetime; a long-lived pipeline releases them once the
    # outputs are materialized
    print(f"released {release_caches()} dedup cache(s)")
    if own_session:
        spark.stop()


if __name__ == "__main__":
    main(sf_dir=sys.argv[1] if len(sys.argv) > 1 else None)
