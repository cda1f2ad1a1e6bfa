"""Scoring-window invariants for the driver-contract registry.

The driver scores exactly the first 50 entries of ``queries()``.
These tests pin the rotation bookkeeping so a new registration can't
silently push a must-score query out of the window.
"""

from dask_traj_spark import queries as q

WINDOW = 50

# queries that MUST be scored in round 8 (VERDICT r7 items 1, 5, 6):
# the never-scored gates (m11b, x16c), the gates round-8 code changes
# touch (m11, m13, and every consumer of the hardened PNG/AVI/WAV/
# TIFF decoders: m4/m5/m6/m10 + m2/m8/m9), the r2/r3-stale debt
# (r4-r14 last green ROUND 2; r1/r2/r17-r22, t1-t6, c1, m1, e1-e5
# round 3), the three SS2-core g1 vec/MIC forms at the 2-round
# staleness boundary, the three heaviest consumers of the r8
# window-count bucket-cap rewrite (d2/d6/d7), and the stalest
# round-4 shape (x4).
MUST_SCORE_R8 = [
    "m11b_decode_jpeg_progressive",
    "x16c_pairwise_rmsd_auto",
    "m11_decode_jpeg",
    "m13_video_container_stats",
    "r4_running_revenue_window",
    "r5_semi_anti_join",
    "r6_intersect_status",
    "r7_regional_revenue",
    "r8_cube_quantities",
    "r9_rich_inactive_customers",
    "r10_small_qty_revenue",
    "r11_promo_share_by_month",
    "r12_shipping_priority",
    "r13_nation_volume",
    "r14_supplier_part_variety",
    "r1_pricing_summary",
    "r2_topk_revenue",
    "r17_grouping_sets",
    "r18_window_functions",
    "r19_exact_quantiles",
    "r20_except_status",
    "r21_min_cost_supplier",
    "r22_sketch_distinct",
    "t1_doc_stats",
    "t2_quality_score",
    "t3_langid",
    "t4_fingerprint",
    "t5_source_stats",
    "t6_token_counts",
    "c1_corpus_curation",
    "m1_media_stats",
    "e1_event_window_counts",
    "e2_sessionization",
    "e3_asof_last_purchase",
    "e4_session_concurrency",
    "e5_funnel_completions",
    "g1_distances_vec",
    "g1_distances_mic_ortho",
    "g1_distances_mic_triclinic",
    "x4_radius_of_gyration",
    "d2_minhash_lsh_neardup",
    "d6_semantic_dedup",
    "d7_dup_components",
    "m2_decode_features",
    "m8_audio_window_features",
    "m9_frame_diffs",
    "m4_decode_png",
    "m5_decode_avi_frames",
    "m6_decode_wav",
    "m10_decode_tiff",
]


def test_scoring_window_holds_must_score_queries():
    names = list(q.queries().keys())
    window = set(names[:WINDOW])
    missing = [n for n in MUST_SCORE_R8 if n not in window]
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
