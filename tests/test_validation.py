"""ensure_type / ensure_schema parity tests (reference
tests/test_utils.py:14-74 is the model for the numpy layer)."""

from __future__ import annotations

import numpy as np
import pytest

from dask_traj_spark.functions.validation import ensure_schema, ensure_type


class TestEnsureType:
    def test_cast_warns(self):
        with pytest.warns(UserWarning, match="Casting"):
            out = ensure_type([1.0, 2.0], np.float32, 1, "x")
        assert out.dtype == np.float32

    def test_ndim_error(self):
        with pytest.raises(ValueError, match="2-dimensional"):
            ensure_type(np.zeros(3, dtype=np.float32), np.float32, 2, "x")

    def test_newaxis_promotion(self):
        out = ensure_type(
            np.zeros(3, dtype=np.float32),
            np.float32,
            2,
            "x",
            add_newaxis_on_deficient_ndim=True,
        )
        assert out.shape == (1, 3)

    def test_shape_pattern_none_is_wildcard(self):
        a = np.zeros((4, 3), dtype=np.int32)
        assert ensure_type(a, np.int32, 2, "x", shape=(None, 3)).shape == (4, 3)
        with pytest.raises(ValueError, match="shape"):
            ensure_type(a, np.int32, 2, "x", shape=(None, 2))

    def test_length_and_none(self):
        assert ensure_type(None, np.float32, 1, "x", can_be_none=True) is None
        with pytest.raises(TypeError):
            ensure_type(None, np.float32, 1, "x")
        with pytest.raises(ValueError, match="length"):
            ensure_type(np.zeros(3, dtype=np.float32), np.float32, 1, "x", length=4)

    def test_contiguous(self):
        a = np.zeros((4, 4), dtype=np.float32)[:, ::2]
        assert ensure_type(a, np.float32, 2, "x").flags["C_CONTIGUOUS"]


class TestEnsureSchema:
    def test_casts_and_reorders(self, spark):
        from dask_traj_spark import schemas

        df = spark.createDataFrame(
            [(1.0, 2.0, 3.0, 0, 0, "extra")],
            "x double, y double, z double, atom_id int, frame_id int, junk string",
        )
        out = ensure_schema(df, schemas.COORDS_SCHEMA)
        assert out.columns == ["frame_id", "atom_id", "x", "y", "z"]
        assert dict(out.dtypes)["x"] == "float"
        assert dict(out.dtypes)["frame_id"] == "bigint"

    def test_missing_column_raises(self, spark):
        from dask_traj_spark import schemas

        df = spark.createDataFrame([(0,)], "frame_id long")
        with pytest.raises(ValueError, match="missing required columns"):
            ensure_schema(df, schemas.COORDS_SCHEMA)


def test_to_mdtraj_raises_without_mdtraj(spark):
    from dask_traj_spark.sources.loaders import from_wide_pandas

    traj = from_wide_pandas(spark, np.zeros((1, 2, 3), dtype=np.float32))
    try:
        import mdtraj  # noqa: F401

        pytest.skip("mdtraj unexpectedly installed")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="mdtraj"):
        traj.to_mdtraj()
