"""Scoring-window invariants for the driver-contract registry.

The driver scores exactly the first 50 entries of ``queries()``.
These tests pin the rotation bookkeeping so a new registration can't
silently push a must-score query out of the window.
"""

from dask_traj_spark import queries as q

WINDOW = 50

# queries that MUST be scored in round 9 (VERDICT r8 items 1, 5):
# t15 (never scored), x16c (touched: the r9 _frame_count_hint change
# is on its dispatch path), the round-4-stale block (x5-x7, r15/r16,
# r23-r34), the five bucket-cap consumers whose r8 re-verification
# was local-only (d4/d8/d10/sx1/sx6), the 14-query SS2-core block at
# the 2-round hard bound (last green r7), and the 12 stalest
# r5-green shapes.
MUST_SCORE_R9 = [
    "t15_tfidf_top_terms",
    "x16c_pairwise_rmsd_auto",
    "x5_rdf_histogram",
    "x6_neighbor_pairs",
    "x7_superpose_contract",
    "r15_large_volume_orders",
    "r16_disjunctive_revenue",
    "r23_priority_exists",
    "r24_forecast_revenue",
    "r25_market_share",
    "r26_profit_by_nation_year",
    "r27_returned_items",
    "r28_important_balances",
    "r29_priority_lineshare",
    "r30_customer_distribution",
    "r31_top_supplier",
    "r32_promo_part_suppliers",
    "r33_waiting_suppliers",
    "r34_approx_quantiles",
    "d4_ngram_jaccard_neardup",
    "d8_containment_neardup",
    "d10_simhash_hamming_pairs",
    "sx1_stream_neardup_batch_twin",
    "sx6_stream_semantic_dedup_twin",
    "g1_distances",
    "g2_displacements",
    "g3_angles",
    "g5_center_of_mass",
    "g6_center_of_geometry",
    "g7_closest_contact",
    "g8_orthogonality",
    "g9_lengths_angles_to_vectors",
    "g10_vectors_to_lengths_angles",
    "p1_frame_slice_stride_reverse",
    "p2_atom_slice",
    "s8_time_fallback",
    "u1_concat_overlap_discard",
    "u2_content_fingerprint",
    "e8_asof_tolerance",
    "x16_pairwise_rmsd",
    "x3_rmsd_aligned_contract",
    "c4_sequence_packing",
    "x20_pca_contract",
    "x22_msm_transition_counts",
    "x21_tica_contract",
    "x19_compute_neighbors",
    "t9_char_bigram_logprob",
    "sx2_stream_exact_dedup_twin",
    "t13_mojibake",
    "c7_curation_chain",
]


def test_scoring_window_holds_must_score_queries():
    names = list(q.queries().keys())
    window = set(names[:WINDOW])
    missing = [n for n in MUST_SCORE_R9 if n not in window]
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
