"""Scoring-window invariants for the driver-contract registry.

The driver scores exactly the first 50 entries of ``queries()``.
These tests pin the rotation bookkeeping so a new registration can't
silently push a must-score query out of the window.
"""

from dask_traj_spark import queries as q

WINDOW = 50

# queries that MUST be scored in round 10 (VERDICT r9 item 1 + the
# round's one new gate): the seven never-driver-scored gates (d14
# maximal-matches NEW this round; d11/d12 span dedup, t16 BM25,
# d13/sx9 Bloom — d13/sx9 also TOUCHED by the corpus-driven n_bits
# sizing — m11c arithmetic JPEG), the 18 round-5-stale shapes, and
# x1/x2/x16b at the r7 best-effort boundary.  The rest of the head
# (22 r7-green extension shapes) is pinned by window-exactness, not
# listed here.
MUST_SCORE_R10 = [
    "d14_maximal_matches",
    "m14_video_codec_mix",
    "d15_keep_first_excision",
    "c8_quantile_prune",
    "t17_dsir_importance",
    "c9_weighted_sample",
    "sx10_stream_weighted_sample_twin",
    "t18_bpe_train",
    "t19_bpe_token_counts",
    "c10_bpe_sequence_packing",
    "d11_duplicate_spans",
    "d12_excise_duplicate_spans",
    "t16_bm25_topk",
    "d13_bloom_cross_corpus",
    "sx9_stream_bloom_twin",
    "m11c_decode_jpeg_arith",
    "v8_ivf_pq_recall",
    "x10_rmsf",
    "t10_pii_scrub",
    "v6_kmeans_contract",
    "m7_resize_bmp",
    "sx3_stream_window_counts_twin",
    "x11_hbond_geometric",
    "x12_vacf",
    "t11_lexical_diversity",
    "sx4_stream_sessionization_twin",
    "e7_burst_detection",
    "x13_gyration_tensor",
    "c6_dataset_split",
    "x14_native_contacts",
    "t12_bigram_crossscore",
    "v7_sq_recall",
    "x17_rg_block_average",
    "x15_rg_autocorrelation",
    "x1_frame_rmsd",
    "x2_rmsd_topk",
    "x16b_pairwise_rmsd_blocked",
]


def test_scoring_window_holds_must_score_queries():
    names = list(q.queries().keys())
    window = set(names[:WINDOW])
    missing = [n for n in MUST_SCORE_R10 if n not in window]
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
