"""Scoring-window invariants for the driver-contract registry.

The driver scores exactly the first 50 entries of ``queries()``.
These tests pin the rotation bookkeeping so a new registration can't
silently push a must-score query out of the window.
"""

from dask_traj_spark import queries as q

WINDOW = 50

# queries that MUST be scored in round 3: the 13 rotated back in to
# refresh stale r1 evidence, the 4 events queries re-scoring the
# TIMESTAMP_NTZ fix, and this round's new registrations.
MUST_SCORE_R3 = [
    "g1_distances",
    "g1_distances_mic_ortho",
    "g8_orthogonality",
    "g2_displacements",
    "g3_angles",
    "g5_center_of_mass",
    "g6_center_of_geometry",
    "g7_closest_contact",
    "g9_lengths_angles_to_vectors",
    "g10_vectors_to_lengths_angles",
    "s8_time_fallback",
    "p2_atom_slice",
    "x1_frame_rmsd",
    "e2_sessionization",
    "e3_asof_last_purchase",
    "e4_session_concurrency",
    "e5_funnel_completions",
    "g1_distances_vec",
]


def test_scoring_window_holds_must_score_queries():
    names = list(q.queries().keys())
    window = set(names[:WINDOW])
    missing = [n for n in MUST_SCORE_R3 if n not in window]
    assert not missing, f"pushed out of the scored window: {missing}"


def test_scoring_window_exactly_full():
    # head == 50 means no registered-but-unscored query hides in the
    # head; everything outside the window is an explicit tail entry.
    names = list(q.queries().keys())
    head = [n for n in names if n not in q._SCORING_TAIL]
    assert len(head) == WINDOW, (
        f"head is {len(head)} entries, window is {WINDOW}: adjust "
        f"_SCORING_TAIL so new registrations stay scored"
    )


def test_tail_queries_all_registered():
    names = set(q.queries().keys())
    assert set(q._SCORING_TAIL) <= names


def test_every_query_has_oracle_or_is_documented():
    # every registered query should carry a DuckDB oracle unless it is
    # genuinely non-SQL-expressible; keep that list explicit.
    no_oracle_ok = set()
    oracles = q.oracle_sql()
    missing = [n for n in q.queries() if n not in oracles and n not in no_oracle_ok]
    assert not missing, f"queries without oracle SQL: {missing}"
