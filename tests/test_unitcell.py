"""G9/G10 unit-cell conversions: against golden + round-trip."""

from __future__ import annotations

import numpy as np
import pandas as pd

from dask_traj_spark.operators.unitcell import (
    box_vectors_to_lengths_and_angles,
    lengths_and_angles_to_box_vectors,
)
from tests import golden

CASES = [
    (6.8555, 6.8555, 6.8555, 60.0, 60.0, 90.0),
    (1.0, 2.0, 3.0, 90.0, 90.0, 90.0),
    (2.0, 2.0, 2.0, 75.0, 80.0, 85.0),
]


def test_lengths_angles_to_vectors(spark):
    pdf = pd.DataFrame(CASES, columns=["a", "b", "c", "alpha", "beta", "gamma"])
    pdf.insert(0, "frame_id", range(len(CASES)))
    out = (
        lengths_and_angles_to_box_vectors(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("frame_id")
    )
    for idx, case in enumerate(CASES):
        want = golden.box_vectors_from_lengths_angles(*case)
        got = out.loc[idx, ["ax", "ay", "az", "bx", "by", "bz", "cx", "cy", "cz"]]
        np.testing.assert_allclose(
            got.to_numpy(dtype=float).reshape(3, 3), want, atol=1e-5
        )


def test_roundtrip(spark):
    pdf = pd.DataFrame(CASES, columns=["a", "b", "c", "alpha", "beta", "gamma"])
    pdf.insert(0, "frame_id", range(len(CASES)))
    vecs = lengths_and_angles_to_box_vectors(spark.createDataFrame(pdf)).select(
        "frame_id", "ax", "ay", "az", "bx", "by", "bz", "cx", "cy", "cz"
    )
    back = box_vectors_to_lengths_and_angles(vecs).toPandas().sort_values("frame_id")
    for idx, case in enumerate(CASES):
        got = back.loc[idx, ["a", "b", "c", "alpha", "beta", "gamma"]].to_numpy(dtype=float)
        np.testing.assert_allclose(got, np.array(case), atol=1e-4)


def test_orthogonal_box_is_diagonal(spark):
    pdf = pd.DataFrame([CASES[1]], columns=["a", "b", "c", "alpha", "beta", "gamma"])
    pdf.insert(0, "frame_id", [0])
    out = lengths_and_angles_to_box_vectors(spark.createDataFrame(pdf)).toPandas()
    # snap-to-zero: off-diagonals exactly zero (reference validation.py:224-227)
    for c in ["ay", "az", "bx", "bz", "cx", "cy"]:
        assert out.loc[0, c] == 0.0
