"""Multimodal column plumbing: opaque binary payloads + typed
metadata, with Pandas-UDF decode/feature stages.

Beyond-reference capability block. Two decode tiers:

- **Real decoders** (pure stdlib ``struct`` + numpy — the container
  has no PIL/ffmpeg): uncompressed 24-bit BMP (``decode_bmp``,
  including bottom-up row order and 4-byte row-stride padding) and
  PCM WAV (``decode_wav``, RIFF chunk walk). ``decode_and_featurize``
  routes ``image/bmp`` and ``audio/wav`` payloads through them.
- **Deterministic stub** for every other kind (e.g. the
  ``fake/utf8`` transport-shape fixture): dimensions from byte
  length, features from the byte head — clearly marked, exact-
  checkable. ``strict=True`` refuses to fall back to the stub.

Everything Spark-side — schemas, binary columns, partitioning,
Arrow batch shapes, UDF signatures — is identical across tiers;
swapping in PIL/ffmpeg for JPEG/MP4 is a per-kind dispatch entry
that does not touch the plan.

Scale posture: payloads travel as BINARY columns (Arrow binary
arrays — no boxing); decode runs in ``mapInPandas`` so each task
streams batches instead of materializing a partition; metadata-only
queries never touch the payload column thanks to Parquet column
pruning (`ReadSchema` excludes `payload`).
"""

from __future__ import annotations

import struct

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


# --------------------------------------------------------- real codecs


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """Build a standard uncompressed 24-bit BMP (BITMAPINFOHEADER,
    bottom-up rows, rows padded to 4-byte stride). ``pixels`` is the
    TOP-DOWN flat row-major byte string (w*3 bytes per row, no
    padding); short input is zero-padded."""
    row = width * 3
    stride = (row + 3) & ~3
    need = row * height
    px = pixels[:need] + b"\x00" * max(0, need - len(pixels))
    body = b"".join(
        px[r * row : (r + 1) * row] + b"\x00" * (stride - row)
        for r in reversed(range(height))  # bottom-up storage
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, stride * height,
        2835, 2835, 0, 0,
    )
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    return head + info + body


def decode_bmp(data: bytes):
    """Parse an uncompressed 8/24/32-bit BMP → (width, height,
    channels, top-down flat pixel bytes as a numpy uint8 array).
    Handles bottom-up (positive height) and top-down (negative
    height) files and strips the 4-byte row-stride padding."""
    import numpy as np

    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    hdr_size, width, height = struct.unpack_from("<Iii", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    planes, bpp = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bpp {bpp}")
    channels = bpp // 8
    top_down = height < 0
    height = abs(height)
    row = width * channels
    stride = (row + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8, offset=pix_off,
                        count=stride * height).reshape(height, stride)
    rows = raw[:, :row]
    if not top_down:
        rows = rows[::-1]
    return width, height, channels, np.ascontiguousarray(rows).reshape(-1)


def encode_wav(samples, sample_rate: int = 8000, n_channels: int = 1) -> bytes:
    """Build a PCM 16-bit WAV from an int16 sequence (frames
    interleaved across channels)."""
    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * n_channels * 2, n_channels * 2, 16,
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(data: bytes):
    """Parse a PCM 16-bit WAV → (n_frames, n_channels, sample_rate,
    int16 numpy array of interleaved samples). Walks the RIFF chunk
    list properly, so files with extra chunks (LIST, fact) decode."""
    import numpy as np

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV format {audio_format}/{bits}-bit")
    samples = np.frombuffer(pcm, dtype="<i2")
    return len(samples) // n_channels, n_channels, sample_rate, samples


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


BMP_WIDTH = 7  # odd width → 21-byte rows padded to 24: the decoder
BMP_HEIGHT = 2  # must strip stride padding AND flip bottom-up rows


def attach_payload_bmp(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Encode each document's UTF-8 bytes as a REAL 24-bit BMP
    (``BMP_WIDTH``×``BMP_HEIGHT``, pixel bytes = the text's byte
    head, zero-padded) — a decodable image column whose decoded
    content is predictable from the text, so the full
    encode→decode→featurize pipeline is oracle-checkable."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            payloads = [
                encode_bmp(BMP_WIDTH, BMP_HEIGHT, t.encode("utf-8"))
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "kind": "image/bmp",
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(gen, MEDIA_SCHEMA)


def decode_and_featurize(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode payloads and extract fixed-dim features, dispatching
    per ``kind``:

    - ``image/bmp`` → real stdlib BMP decode (``decode_bmp``):
      width/height/channels from the header, features = first
      FEATURE_DIM top-down pixel bytes / 255.
    - ``audio/wav`` → real stdlib WAV decode (``decode_wav``):
      width = frames, height = 1, channels from the fmt chunk,
      features = first FEATURE_DIM samples / 32768.
    - anything else → the DETERMINISTIC stub ("dimensions" from the
      byte length, features from the byte head), unless
      ``strict=True``, which raises NotImplementedError instead of
      silently faking (JPEG/MP4 etc. need PIL/ffmpeg, absent here).
    """
    import numpy as np
    import pandas as pd

    def one(kind, buf):
        b = bytes(buf)
        head = np.zeros(FEATURE_DIM, dtype=np.float32)
        if kind == "image/bmp":
            w, h, ch, px = decode_bmp(b)
            n = min(FEATURE_DIM, len(px))
            head[:n] = px[:n] / np.float32(255.0)
            return w, h, ch, head
        if kind == "audio/wav":
            frames, ch, _rate, samples = decode_wav(b)
            n = min(FEATURE_DIM, len(samples))
            head[:n] = samples[:n] / np.float32(32768.0)
            return frames, 1, ch, head
        if strict:
            raise NotImplementedError(
                f"no real decoder for kind={kind!r} (needs PIL/ffmpeg); "
                "call with strict=False for the deterministic stub"
            )
        raw = np.frombuffer(b, dtype=np.uint8)
        head[: min(FEATURE_DIM, len(raw))] = raw[:FEATURE_DIM] / 255.0
        return len(raw), max(len(raw) // 2, 1), 3, head

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            decoded = [
                one(kind, buf)
                for kind, buf in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "width": np.array([d[0] for d in decoded], dtype=np.int32),
                    "height": np.array([d[1] for d in decoded], dtype=np.int32),
                    "channels": np.array([d[2] for d in decoded], dtype=np.int32),
                    "features": [d[3] for d in decoded],
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
