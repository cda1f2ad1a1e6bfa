"""dask_traj_spark — a PySpark-native trajectory analytics engine.

A from-scratch re-design of the capabilities of ``sroet/dask-traj``
(lazy chunked molecular-dynamics trajectory analysis) on idiomatic
Spark: trajectories are long-format DataFrames over Parquet, geometry
operators are broadcast-join + SQL-expression plans with
Arrow-vectorized ``applyInPandas`` fast paths, and aggregations are
plain ``GROUP BY frame_id``.

Public API mirrors the reference's surface
(``/root/reference/dask_traj/__init__.py:8-10``):
``load``, ``Trajectory``, ``compute_distances``,
``compute_displacements``, ``compute_angles``,
``compute_center_of_mass``, ``compute_center_of_geometry``,
``find_closest_contact``, plus the unit-cell algebra and the
large-scale data-pipeline extensions (dedup / similarity / text /
multimodal) that the reference does not have.
"""

from dask_traj_spark.session import get_spark
from dask_traj_spark.trajectory import Trajectory
from dask_traj_spark.sources.loaders import (
    load,
    load_multi,
    load_tables,
    load_frame_range,
    save_tables,
    from_wide_pandas,
)
from dask_traj_spark.operators.distance import (
    compute_distances,
    compute_neighbors,
    compute_displacements,
    find_closest_contact,
    compute_center_of_mass,
    compute_center_of_geometry,
    compute_radius_of_gyration,
    gyration_tensor,
    mean_squared_displacement,
    native_contact_fraction,
    neighbor_pairs,
    rdf_histogram,
    sasa_exposure,
    velocity_autocorrelation,
)
from dask_traj_spark.operators.angle import (
    compute_angles,
    compute_dihedrals,
    hydrogen_bonds,
)
from dask_traj_spark.operators.rmsd import (
    compute_rmsf,
    frame_rmsd,
    frame_rmsd_aligned,
    pairwise_rmsd,
    pairwise_rmsd_auto,
    pairwise_rmsd_blocked,
    rmsd_topk,
    superpose,
)
from dask_traj_spark.operators.pca import (
    pca_fit,
    pca_project,
    principal_components,
    tica_fit,
)
from dask_traj_spark.operators.unitcell import (
    lengths_and_angles_to_box_vectors,
    box_vectors_to_lengths_and_angles,
)
from dask_traj_spark.functions.validation import ensure_type, ensure_schema

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "Trajectory",
    "load",
    "load_multi",
    "load_tables",
    "load_frame_range",
    "save_tables",
    "from_wide_pandas",
    "compute_distances",
    "compute_neighbors",
    "compute_displacements",
    "compute_angles",
    "compute_dihedrals",
    "compute_center_of_mass",
    "compute_center_of_geometry",
    "find_closest_contact",
    "compute_radius_of_gyration",
    "compute_rmsf",
    "gyration_tensor",
    "mean_squared_displacement",
    "native_contact_fraction",
    "neighbor_pairs",
    "rdf_histogram",
    "sasa_exposure",
    "velocity_autocorrelation",
    "hydrogen_bonds",
    "frame_rmsd",
    "frame_rmsd_aligned",
    "pairwise_rmsd",
    "pairwise_rmsd_auto",
    "pairwise_rmsd_blocked",
    "rmsd_topk",
    "superpose",
    "pca_fit",
    "pca_project",
    "principal_components",
    "tica_fit",
    "lengths_and_angles_to_box_vectors",
    "box_vectors_to_lengths_and_angles",
    "ensure_type",
    "ensure_schema",
]
