"""Scoring-window invariants for the driver-contract registry.

The driver scores exactly the first 50 entries of ``queries()``.
These tests pin the rotation bookkeeping so a new registration can't
silently push a must-score query out of the window.
"""

import re
from pathlib import Path

from dask_traj_spark import queries as q

WINDOW = 50

# The full round-12 head, per the written r12 seating plan
# (VERDICT r11 item 1; plan comment above _SCORING_TAIL): d23 + d24
# new-query-first, the three SS2-core g1 forms at the hard-bound
# breach, the five last r7-green shapes, and 40 of the 46 r8-green
# entries (six defer to r13 with same-machinery siblings seated).
MUST_SCORE_R12 = [
    # (0) new gates (new-query-first)
    "d23_pagerank_tol_contract",
    "d24_pagerank_dangling_contract",
    # (1) SS2-core g1 forms, last green r8 (hard-bound breach)
    "g1_distances_vec",
    "g1_distances_mic_ortho",
    "g1_distances_mic_triclinic",
    # (2) the last r7-green shapes (deferred from r11)
    "c3_stratified_sample",
    "c5_source_token_mixture",
    "d3_simhash",
    "v2_embedding_neardup_lsh",
    "sx7_stream_count_min_twin",
    # (3) the r8-green block, minus the six r13 deferrals
    "t1_doc_stats",
    "t2_quality_score",
    "t3_langid",
    "t4_fingerprint",
    "t5_source_stats",
    "t6_token_counts",
    "c1_corpus_curation",
    "d2_minhash_lsh_neardup",
    "d6_semantic_dedup",
    "d7_dup_components",
    "m1_media_stats",
    "m2_decode_features",
    "m4_decode_png",
    "m5_decode_avi_frames",
    "m6_decode_wav",
    "m8_audio_window_features",
    "m10_decode_tiff",
    "m11_decode_jpeg",
    "m13_video_container_stats",
    "e1_event_window_counts",
    "e2_sessionization",
    "e3_asof_last_purchase",
    "e5_funnel_completions",
    "x4_radius_of_gyration",
    "r1_pricing_summary",
    "r2_topk_revenue",
    "r5_semi_anti_join",
    "r7_regional_revenue",
    "r9_rich_inactive_customers",
    "r10_small_qty_revenue",
    "r11_promo_share_by_month",
    "r12_shipping_priority",
    "r13_nation_volume",
    "r14_supplier_part_variety",
    "r17_grouping_sets",
    "r18_window_functions",
    "r19_exact_quantiles",
    "r20_except_status",
    "r21_min_cost_supplier",
    "r22_sketch_distinct",
]


def test_scoring_window_holds_must_score_queries():
    names = list(q.queries().keys())
    window = set(names[:WINDOW])
    missing = [n for n in MUST_SCORE_R12 if n not in window]
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


def test_coverage_doc_count():
    # COVERAGE.md's headline registry count drifted in r9 (143→151)
    # and again in r10 (175→189).  Pin it: the documented number must
    # equal the live registry size (VERDICT r10 item 2).
    root = Path(__file__).resolve().parents[1]
    for doc, pattern in [
        ("COVERAGE.md", r"(\d+) registered queries"),
        ("README.md", r"(\d+) registered queries"),
    ]:
        text = root.joinpath(doc).read_text()
        m = re.search(pattern, text)
        assert m, f"{doc} no longer states a registered-query count"
        assert int(m.group(1)) == len(q.queries()), (
            f"{doc} says {m.group(1)} registered queries; registry "
            f"has {len(q.queries())} — update the doc in the same "
            f"commit that registers a query"
        )
