"""Scoring-window invariants for the driver-contract registry.

The driver scores exactly the first 50 entries of ``queries()``.
These tests pin the rotation bookkeeping so a new registration can't
silently push a must-score query out of the window.
"""

from dask_traj_spark import queries as q

WINDOW = 50

# queries that MUST be scored in round 4: everything this round's
# code changes touched (g1 MIC fast path, m2 BMP decode, v3/v4 IVF
# init, d2/d4 dedup distinct fix), the r3-tailed relational block
# rotating back in, and the two new contract gates.
MUST_SCORE_R4 = [
    "g1_distances_mic_ortho",
    "g1_distances_mic_triclinic",
    "g1_distances_vec",
    "m2_decode_features",
    "m3_frame_sample",
    "v1_cosine_topk",
    "v2_embedding_neardup_lsh",
    "v3_cosine_topk_ivf",
    "v4_ann_recall",
    "d1_exact_dedup",
    "d2_minhash_lsh_neardup",
    "d4_ngram_jaccard_neardup",
    "x3_rmsd_aligned_contract",
    "sx1_stream_neardup_batch_twin",
    "c2_decontamination",
    "c3_stratified_sample",
    "t7_repetition_score",
    "d5_repeated_ngram_docs",
    "r15_large_volume_orders",
    "r16_disjunctive_revenue",
    # added this round — need first driver evidence
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
    "t8_heuristic_filter",
    "c4_sequence_packing",
    "d6_semantic_dedup",
    "m4_decode_png",
    "d7_dup_components",
    "x4_radius_of_gyration",
    "x5_rdf_histogram",
    "r34_approx_quantiles",
    "x6_neighbor_pairs",
    "x7_superpose_contract",
    "e6_cohort_retention",
    "t9_char_bigram_logprob",
    "x8_dihedrals",
    "x9_msd",
    "sx2_stream_exact_dedup_twin",
    "m5_decode_avi_frames",
    "m6_decode_wav",
    "v5_pq_recall",
    "c5_source_token_mixture",
]


def test_scoring_window_holds_must_score_queries():
    names = list(q.queries().keys())
    window = set(names[:WINDOW])
    missing = [n for n in MUST_SCORE_R4 if n not in window]
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
