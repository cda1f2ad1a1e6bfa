"""Multimodal column plumbing: opaque binary payloads + typed
metadata, with Pandas-UDF decode/feature stages.

Beyond-reference capability block. The container has no image/audio
libraries, so the DECODE step is a clearly-marked stub (deterministic
fake or NotImplementedError); everything Spark-side — schemas,
binary columns, partitioning, Arrow batch shapes, UDF signatures —
is real and tested. Swapping the stub for PIL/ffmpeg is a one-
function change that does not touch the plan.

Scale posture: payloads travel as BINARY columns (Arrow binary
arrays — no boxing); decode runs in ``mapInPandas`` so each task
streams batches instead of materializing a partition; metadata-only
queries never touch the payload column thanks to Parquet column
pruning (`ReadSchema` excludes `payload`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("channels", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat each document's UTF-8 bytes as an opaque media payload
    with typed metadata — the storage/transport shape of a real
    image/audio column."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        F.lit("fake/utf8").alias("kind"),
        payload.alias("payload"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
    )


def decode_and_featurize(media: DataFrame, real: bool = False) -> DataFrame:
    """Decode payloads and extract fixed-dim features.

    ``real=True`` raises NotImplementedError (no image libs in this
    container). The stub path is DETERMINISTIC: "dimensions" derive
    from the byte length, "features" are the first FEATURE_DIM bytes
    scaled to [0,1] — so tests can assert exact values while the
    batch shapes and schema match a real decoder drop-in.
    """
    if real:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg — not available; "
            "run with real=False for the deterministic stub"
        )
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            feats = []
            widths = []
            for buf in pdf["payload"]:
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                head = np.zeros(FEATURE_DIM, dtype=np.float32)
                head[: min(FEATURE_DIM, len(b))] = b[:FEATURE_DIM] / 255.0
                feats.append(head)
                widths.append(len(b))
            w = np.asarray(widths, dtype=np.int32)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "width": w,
                    "height": np.maximum(w // 2, 1).astype(np.int32),
                    "channels": np.full(len(pdf), 3, dtype=np.int32),
                    "features": feats,
                }
            )

    return media.mapInPandas(gen, FEATURES_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — never reads the payload column
    (verify with .explain(): ReadSchema excludes `payload`)."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("n_bytes").alias("min_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )


FRAME_BYTES = 16  # fake codec: fixed-size frames inside the payload

FRAME_SAMPLE_SCHEMA = (
    "doc_id long, frame_idx int, frame_bytes binary, n_frames int"
)


def frame_sample(media: DataFrame, every: int = 4) -> DataFrame:
    """Video-style frame sampling over an opaque payload: treat each
    payload as a sequence of fixed-size ``FRAME_BYTES`` frames and
    emit every ``every``-th one as its own row. The Spark-side
    plumbing is the real thing — Arrow-batched ``mapInPandas``
    exploding one input row into many output rows with a binary
    column — while the "codec" is a deterministic stub (byte
    slicing), so the whole operator is oracle-checkable; a real
    ffmpeg frame extractor drops into ``gen`` without touching the
    plan, schema, or partitioning."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out_doc, out_idx, out_bytes, out_n = [], [], [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(buf)
                n = len(b) // FRAME_BYTES
                for f in range(0, n, every):
                    out_doc.append(doc_id)
                    out_idx.append(f)
                    out_bytes.append(b[f * FRAME_BYTES : (f + 1) * FRAME_BYTES])
                    out_n.append(n)
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "frame_idx": out_idx,
                    "frame_bytes": out_bytes,
                    "n_frames": out_n,
                }
            )

    return media.mapInPandas(gen, FRAME_SAMPLE_SCHEMA)
