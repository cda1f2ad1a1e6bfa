"""Streaming weighted sampling over a document stream.

Efraimidis–Spirakis exponential-race sampling is the textbook
weighted RESERVOIR algorithm: each item draws key = −ln(u)/w once,
and the k smallest keys ever seen are the sample. Because "k
smallest" is associative (the global k smallest keys are contained
in the union of any partition-of-the-stream's per-part k smallest),
a micro-batch ingest can keep one bounded candidate table and stay
exactly equal — bit-for-bit — to the one-shot batch draw over the
same corpus (``operators/curation.py::weighted_sample``, gate c9).

per micro-batch
  1. run the batch operator on the batch's own rows → its local
     top-k candidates (doc_id, weight, key);
  2. dynamic-partition-overwrite them into a ``batch_id``-partitioned
     state table (the same idempotent-replay contract as the dedup
     twins: a crash-replayed batch replaces its OWN partition
     wholesale, so recovery cannot double-count or lose rows).

The sample view is then the k smallest keys over the state — at most
``k × n_batches`` rows however large the stream, so the final merge
is bounded by ingest cadence, not data volume.

Gated as ``sx10_stream_weighted_sample_twin`` against c9's value
oracle: a 3-batch replay (with a simulated crash-replay of the
middle batch) must reproduce the one-shot sample value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dask_traj_spark.streaming.dedup import _overwrite_batch_partition


def process_weighted_sample_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    k: int,
    text_col: str = "text",
    order_mode: str = "xxhash",
    seed: int = 0,
) -> None:
    """foreachBatch body: fold this batch's local top-k candidates
    into the state. The partial depends only on the batch's own rows
    (keys are pure functions of doc_id and text), so replay is
    idempotent by construction — no cross-batch reads at write time.

    A batch smaller than ``k`` contributes all its rows; that is
    still a valid partial (the union bound above needs per-part
    candidates to include each part's k smallest, which "all rows"
    trivially does).
    """
    from dask_traj_spark.operators.curation import weighted_sample

    partial = weighted_sample(
        batch_df, k, text_col=text_col, order_mode=order_mode, seed=seed
    )
    _overwrite_batch_partition(partial, state_dir, batch_id)


def weighted_sample_state(
    spark: SparkSession, state_dir: str, k: int
) -> DataFrame:
    """The sample so far: k smallest keys over every batch's
    candidates (ties broken by doc_id, as in the batch operator).
    TakeOrderedAndProject over ≤ k × n_batches rows — bounded by
    ingest cadence, never by stream volume."""
    st = spark.read.parquet(state_dir).drop("batch_id")
    return st.orderBy("key", "doc_id").limit(int(k))
