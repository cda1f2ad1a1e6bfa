"""Scoring-window invariants for the driver-contract registry.

The driver scores exactly the first 50 entries of ``queries()``.
These tests pin the rotation bookkeeping so a new registration can't
silently push a must-score query out of the window.
"""

import re
from pathlib import Path

from dask_traj_spark import queries as q

WINDOW = 50

# The full round-13 head, per the written r13 seating plan
# (plan comment above _SCORING_TAIL; emitted as HEAD_r13.json per
# VERDICT r12 item 7): the six r8-green deferrals, the full
# r9-green extension set, and the first 8 r10-green entries.
MUST_SCORE_R13 = [
    # (1) the six r8-green entries deferred from the r12 head
    "d1_exact_dedup",
    "d4_ngram_jaccard_neardup",
    "v1_cosine_topk",
    "v3_cosine_topk_ivf",
    "v4_ann_recall",
    "e8_asof_tolerance",
    # (2) the full r9-green extension set, stalest-first
    "e4_session_concurrency",
    "x1_frame_rmsd",
    "x16_pairwise_rmsd",
    "x16b_pairwise_rmsd_blocked",
    "x16c_pairwise_rmsd_auto",
    "x2_rmsd_topk",
    "x3_rmsd_aligned_contract",
    "sx1_stream_neardup_batch_twin",
    "c2_decontamination",
    "t15_tfidf_top_terms",
    "c4_sequence_packing",
    "x5_rdf_histogram",
    "x20_pca_contract",
    "x22_msm_transition_counts",
    "x21_tica_contract",
    "x19_compute_neighbors",
    "x6_neighbor_pairs",
    "x7_superpose_contract",
    "t9_char_bigram_logprob",
    "sx2_stream_exact_dedup_twin",
    "sx6_stream_semantic_dedup_twin",
    "t13_mojibake",
    "c7_curation_chain",
    "m9_frame_diffs",
    "m11b_decode_jpeg_progressive",
    "d8_containment_neardup",
    "d10_simhash_hamming_pairs",
    "r4_running_revenue_window",
    "r8_cube_quantities",
    "r6_intersect_status",
    "r15_large_volume_orders",
    "r16_disjunctive_revenue",
    "r23_priority_exists",
    "r24_forecast_revenue",
    "r25_market_share",
    "r26_profit_by_nation_year",
    # (3) the remaining 8 slots from the r10-green set, stalest-first
    "r27_returned_items",
    "r28_important_balances",
    "r29_priority_lineshare",
    "r30_customer_distribution",
    "r31_top_supplier",
    "r32_promo_part_suppliers",
    "r33_waiting_suppliers",
    "r34_approx_quantiles",
]


def test_scoring_window_holds_must_score_queries():
    names = list(q.queries().keys())
    window = set(names[:WINDOW])
    missing = [n for n in MUST_SCORE_R13 if n not in window]
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
