"""Scoring-window invariants for the driver-contract registry.

The driver scores exactly the first 50 entries of ``queries()``.
These tests pin the rotation bookkeeping so a new registration can't
silently push a must-score query out of the window.
"""

from dask_traj_spark import queries as q

WINDOW = 50

# queries that MUST be scored in round 5: the 21 late-block round-4
# additions that have never had driver evidence (rotation plan from
# NOTES_r04/VERDICT r4 item 1), plus everything round-5 code changes
# touch (d6 semantic-dedup rework, t9/t12 bigram guard, g1_vec
# contiguity check, sx4 ingest-state fix, c6 split-seed doc).
MUST_SCORE_R5 = [
    # never driver-scored — first evidence this round
    "x10_rmsf",
    "t10_pii_scrub",
    "v6_kmeans_contract",
    "m7_resize_bmp",
    "sx3_stream_window_counts_twin",
    "x11_hbond_geometric",
    "x12_vacf",
    "t11_lexical_diversity",
    "m8_audio_window_features",
    "sx4_stream_sessionization_twin",
    "m9_frame_diffs",
    "e7_burst_detection",
    "x13_gyration_tensor",
    "c6_dataset_split",
    "x14_native_contacts",
    "m10_decode_tiff",
    "t12_bigram_crossscore",
    "v7_sq_recall",
    "sx5_incremental_ivf_twin",
    "d8_containment_neardup",
    "x15_rg_autocorrelation",
    # touched by round-5 code changes — evidence must stay fresh
    "d6_semantic_dedup",
    "t9_char_bigram_logprob",
    "g1_distances_vec",
    "sx2_stream_exact_dedup_twin",
    "sx1_stream_neardup_batch_twin",
]


def test_scoring_window_holds_must_score_queries():
    names = list(q.queries().keys())
    window = set(names[:WINDOW])
    missing = [n for n in MUST_SCORE_R5 if n not in window]
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
