"""Scoring-window invariants for the driver-contract registry.

The driver scores exactly the first 50 entries of ``queries()``.
These tests pin the rotation bookkeeping so a new registration can't
silently push a must-score query out of the window.
"""

from dask_traj_spark import queries as q

WINDOW = 50

# queries that MUST be scored in round 6 (VERDICT r5 items 1, 4, 7):
# sx5 (never driver-green — schema fix this round), everything
# round-6 code changes touch, the §2-core geometry block whose
# evidence is stale since round 3, and the 22 r5-tailed extension
# queries returning per the written rotation plan.
MUST_SCORE_R6 = [
    # never driver-green — the round-6 fix (explicit centroid schema)
    "sx5_incremental_ivf_twin",
    # touched by round-6 code changes — evidence must stay fresh
    "d9_url_canonical_dedup",
    "t14_count_min_heavy_hitters",
    "sx7_stream_count_min_twin",
    "x18_sasa_exposure",
    "sx8_stream_transition_counts_twin",
    "d3_simhash",
    "d10_simhash_hamming_pairs",
    # §2-core block, last green r3 — hard ≤2-round staleness bound
    "g1_distances",
    "g2_displacements",
    "g3_angles",
    "g5_center_of_mass",
    "g6_center_of_geometry",
    "g7_closest_contact",
    "g8_orthogonality",
    "g9_lengths_angles_to_vectors",
    "g10_vectors_to_lengths_angles",
    "s8_time_fallback",
    "p1_frame_slice_stride_reverse",
    "p2_atom_slice",
    "u1_concat_overlap_discard",
    "u2_content_fingerprint",
    "x1_frame_rmsd",
    "x2_rmsd_topk",
    # returning r5-tailed extension queries (r4-green, untouched)
    "m3_frame_sample",
    "m4_decode_png",
    "m5_decode_avi_frames",
    "m6_decode_wav",
    "v1_cosine_topk",
    "v2_embedding_neardup_lsh",
    "v3_cosine_topk_ivf",
    "v4_ann_recall",
    "v5_pq_recall",
    "c2_decontamination",
    "c3_stratified_sample",
    "c5_source_token_mixture",
    "d1_exact_dedup",
    "d2_minhash_lsh_neardup",
    "d4_ngram_jaccard_neardup",
    "d5_repeated_ngram_docs",
    "d7_dup_components",
    "t7_repetition_score",
    "t8_heuristic_filter",
    "x8_dihedrals",
    "x9_msd",
    "e6_cohort_retention",
    # new this round — never scored, first evidence now
    "x16b_pairwise_rmsd_blocked",
    "m13_video_container_stats",
    # touched this round: sniff_kind gained the ISO-BMFF branch and
    # the m12 gate corpus an mp4 family
    "m12_sniff_kind",
    # the stalest relational shape (last green round 2; r4-r6 gave
    # their slots to x16b/m12/m13 and head the round-7 debt list)
    "r3_rollup_acctbal",
]


def test_scoring_window_holds_must_score_queries():
    names = list(q.queries().keys())
    window = set(names[:WINDOW])
    missing = [n for n in MUST_SCORE_R6 if n not in window]
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
