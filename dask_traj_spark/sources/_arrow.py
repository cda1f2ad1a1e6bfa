"""Arrow batch emission for trajectory DataSource readers.

Spark 4 Python DataSources may yield ``pyarrow.RecordBatch`` objects
from ``read()`` instead of per-row tuples; for a frame of N atoms
that replaces N tuple constructions + N row pickles with one
columnar hand-off (zero-copy into the JVM via Arrow IPC). On a
275k-row file this is the difference between the scan being
decode-bound and being serialization-bound — and at 100 TB every
scan task crosses this boundary once per batch instead of once per
atom.

All trajectory sources share one output schema
``(frame_id long, atom_id int, x float, y float, z float)``; the
helper below converts an iterator of decoded ``(frame_id, xyz)``
frames into batches of ~``rows_per_batch`` rows (several frames per
batch — Arrow overhead is per-batch, so tiny frames are coalesced).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np


def frames_to_record_batches(
    frame_iter: Iterable[tuple[int, "np.ndarray"]],
    rows_per_batch: int = 131072,
) -> Iterator["object"]:
    """(frame_id, xyz (n_atoms, 3) float-ish) → pyarrow.RecordBatch
    stream in the shared coords schema."""
    import pyarrow as pa

    fids: list[np.ndarray] = []
    aids: list[np.ndarray] = []
    cols: list[np.ndarray] = []
    nrows = 0

    def flush():
        xyz = np.concatenate(cols, axis=0)
        batch = pa.record_batch(
            [
                pa.array(np.concatenate(fids)),
                pa.array(np.concatenate(aids)),
                pa.array(np.ascontiguousarray(xyz[:, 0])),
                pa.array(np.ascontiguousarray(xyz[:, 1])),
                pa.array(np.ascontiguousarray(xyz[:, 2])),
            ],
            names=["frame_id", "atom_id", "x", "y", "z"],
        )
        fids.clear()
        aids.clear()
        cols.clear()
        return batch

    for fid, xyz in frame_iter:
        n = xyz.shape[0]
        fids.append(np.full(n, fid, dtype=np.int64))
        aids.append(np.arange(n, dtype=np.int32))
        cols.append(xyz.astype(np.float32, copy=False))
        nrows += n
        if nrows >= rows_per_batch:
            yield flush()
            nrows = 0
    if nrows:
        yield flush()
