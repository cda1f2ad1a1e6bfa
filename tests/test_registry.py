"""Scoring-window invariants for the driver-contract registry.

The driver scores exactly the first 50 entries of ``queries()``.
These tests pin the rotation bookkeeping so a new registration can't
silently push a must-score query out of the window.
"""

import re
from pathlib import Path

from dask_traj_spark import queries as q

WINDOW = 50

# The full round-11 head, per the written r11 seating plan
# (VERDICT r10 item 1; plan comment above _SCORING_TAIL): the 28
# never-driver-scored session-5/6 gates, the 14-query §2-core block
# at the 2-round hard bound, and the 8 r7-green shapes deferred by
# round 10's new-query-first seats.
MUST_SCORE_R11 = [
    # (0) never driver-scored (sessions 5-6)
    "d16_cluster_keep_best",
    "c11_mixture_weights",
    "c12_context_chunks",
    "t20_char_entropy",
    "t21_source_unigram_kl",
    "t22_winnowing",
    "d17_winnow_matches",
    "c13_shuffle_shards",
    "t23_perplexity_buckets",
    "sx11_stream_winnow_twin",
    "d18_pagerank_dup_graph",
    "c14_chunk_shard_pipeline",
    "t24_heaps_law",
    "t25_zipf_slope",
    "t26_top_ngram_fraction",
    "t27_dup_ngram_char_fraction",
    "d19_soft_dedup_weights",
    "v9_filtered_topk",
    "e9_inter_event_gaps",
    "sx12_stream_gap_twin",
    "m15_audio_clipping",
    "d20_cross_corpus_neardup",
    "d21_cross_corpus_matches",
    "v10_knn_classify",
    "c15_budget_select",
    "m16_perceptual_hash",
    "t28_tokenizer_fertility",
    "v11_embedding_diversity",
    # (1) §2-core block at the 2-round hard bound (last green r9)
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
    # (2) r7-green shapes deferred from the r10 head
    "r3_rollup_acctbal",
    "m3_frame_sample",
    "t7_repetition_score",
    "x9_msd",
    "e6_cohort_retention",
    "v5_pq_recall",
    "d5_repeated_ngram_docs",
    # (3) NEW in r11 (new-query-first; its slot deferred
    # c3_stratified_sample to the r12 head)
    "d22_quality_soft_dedup",
]


def test_scoring_window_holds_must_score_queries():
    names = list(q.queries().keys())
    window = set(names[:WINDOW])
    missing = [n for n in MUST_SCORE_R11 if n not in window]
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
