#!/usr/bin/env python
"""Bulk physical-plan audit over the full query registry.

Builds every ``queries()`` DataFrame at a small scale factor and
greps its ``explain('formatted')`` text for the scale anti-patterns
the per-operator locks in ``tests/test_plans.py`` assert piecewise:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — all-pairs
  plans that die at scale (hard FAIL unless allowlisted with a
  reason);
- ``BatchEvalPython`` — row-at-a-time Python UDFs (hard FAIL; the
  repo's rule is Arrow-batched or JVM-side only);
- ``SinglePartition`` exchanges — global funnels; legitimate only
  for tiny final aggregates / 1-row corpus stats, so every
  occurrence must be on the documented allowlist.

Gates that execute work eagerly while BUILDING the DataFrame
(streaming twins replaying micro-batches, contract gates that
collect a bounded comparison) still end in a plain DataFrame whose
plan is audited the same way.

Usage: python scripts/audit_plans.py [sf_dir] [report_path]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# (query, pattern) pairs that are DOCUMENTED-acceptable, with why.
# Every entry below was verified by reading the flagged plan fragment
# (round 10): each BroadcastNestedLoopJoin builds an
# IdentityBroadcastMode side holding a 1-row aggregate or a constant
# dimension table, and each SinglePartition exchange merges 1-row /
# sketch-size aggregate buffers or the gate-only sorted vocabulary.
_VOCAB = (
    "gate-only sorted-vocab id assignment (distinct words -> tiny "
    "vocab); the operator DEFAULT is hashed ids with no such funnel"
)
_ONE_ROW = "1-row global aggregate (corpus stats / threshold / max)"
ALLOW = {
    # 1-row corpus-stats cross joins (the BM25/TF-IDF/TPC-H pattern):
    # the broadcast side is one row, the nested loop is a map-side
    # constant attach
    ("t16_bm25_topk", "SinglePartition"): _ONE_ROW,
    ("t16_bm25_topk", "BroadcastNestedLoopJoin"):
        "cross join against the 1-row corpus stats broadcast",
    ("t15_tfidf_top_terms", "SinglePartition"): _ONE_ROW,
    ("t15_tfidf_top_terms", "BroadcastNestedLoopJoin"):
        "cross join against the 1-row n_docs broadcast",
    ("v6_kmeans_contract", "SinglePartition"):
        "1-row contract aggregates (count/sum/max)",
    ("v6_kmeans_contract", "BroadcastNestedLoopJoin"):
        "cross joins against 1-row contract aggregates",
    ("r9_rich_inactive_customers", "BroadcastNestedLoopJoin"):
        "cross join against the 1-row avg-balance threshold",
    ("r9_rich_inactive_customers", "SinglePartition"): _ONE_ROW,
    ("r16_disjunctive_revenue", "SinglePartition"): _ONE_ROW,
    ("r24_forecast_revenue", "SinglePartition"): _ONE_ROW,
    ("r28_important_balances", "SinglePartition"): _ONE_ROW,
    ("r28_important_balances", "BroadcastNestedLoopJoin"):
        "inner join against the 1-row threshold broadcast (TPC-H Q22)",
    ("r31_top_supplier", "SinglePartition"):
        "1-row max-revenue aggregate (TPC-H Q15)",
    ("r34_approx_quantiles", "SinglePartition"):
        "approx-quantile sketch buffers -> single final merge "
        "(sketch-size, not data-size)",
    ("d13_bloom_cross_corpus", "SinglePartition"):
        "1-row membership-contract aggregate (count + 4 sums)",
    # the 32-row constant sphere-point dimension (documented in
    # tests/test_plans.py::test_sasa_join_shapes)
    ("x18_sasa_exposure", "BroadcastNestedLoopJoin"):
        "constant 32-row sphere-point table broadcast",
    # gate-only sorted-vocab funnels: these wrappers pin DuckDB
    # parity with deterministic ids; the production operators use
    # xxhash64 ids and never build the vocab
    ("d2_minhash_lsh_neardup", "SinglePartition"): _VOCAB,
    ("d3_simhash", "SinglePartition"): _VOCAB,
    ("d4_ngram_jaccard_neardup", "SinglePartition"): _VOCAB,
    ("d8_containment_neardup", "SinglePartition"): _VOCAB,
    ("d10_simhash_hamming_pairs", "SinglePartition"): _VOCAB,
    ("t4_fingerprint", "SinglePartition"): _VOCAB,
    ("t14_count_min_heavy_hitters", "SinglePartition"): _VOCAB,
    # t17's gate: sorted-vocab funnel (production is xxhash — locked
    # by tests/test_plans.py::test_dsir_importance_default_is_open_
    # vocabulary) + the two 1-row token totals, whose cross joins are
    # the audited 1-row-aggregate broadcast pattern
    ("t17_dsir_importance", "SinglePartition"):
        _VOCAB + "; plus the two 1-row token-total aggregates",
    ("t17_dsir_importance", "BroadcastNestedLoopJoin"):
        "cross joins against the two 1-row token-total broadcasts",
    ("c11_mixture_weights", "SinglePartition"):
        "1-row normalizer over the ~|sources| table",
    ("c11_mixture_weights", "BroadcastNestedLoopJoin"):
        "cross join against the 1-row normalizer broadcast",
    ("d20_cross_corpus_neardup", "SinglePartition"): _VOCAB,
    ("t22_winnowing", "SinglePartition"): _VOCAB,
    ("d17_winnow_matches", "SinglePartition"): _VOCAB,
    ("d18_pagerank_dup_graph", "SinglePartition"): _VOCAB,
    ("d18_pagerank_dup_graph", "BroadcastNestedLoopJoin"):
        "cross joins against the checkpointed 1-row vertex-count "
        "broadcast",
    ("t21_source_unigram_kl", "SinglePartition"):
        "1-row grand-total aggregate over the checkpointed "
        "(word, source) table",
    ("t21_source_unigram_kl", "BroadcastNestedLoopJoin"):
        "cross join against the 1-row grand-total broadcast",
    ("d23_pagerank_tol_contract", "SinglePartition"):
        "1-row contract aggregate (count/mass/argmin over the "
        "checkpointed rank table)",
    ("d24_pagerank_dangling_contract", "SinglePartition"):
        "1-row contract aggregates (count/mass/argmin over the two "
        "checkpointed rank tables; per-round 1-row dangling-mass "
        "aggregate)",
    ("d24_pagerank_dangling_contract", "BroadcastNestedLoopJoin"):
        "cross joins against the 1-row vertex-count / dangling-mass "
        "/ leak-mass broadcasts",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    report = sys.argv[2] if len(sys.argv) > 2 else None

    from dask_traj_spark import queries as q
    from dask_traj_spark.plans.audit import formatted_plan
    from dask_traj_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    n_fail = 0
    for name, fn in q.queries().items():
        t0 = time.time()
        try:
            plan = formatted_plan(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            msg = str(e).splitlines()[0][:100] if str(e) else type(e).__name__
            rows.append((name, f"BUILD-ERROR[FAIL: {msg}]", "0s"))
            n_fail += 1
            print(f"{name}: BUILD-ERROR {msg}", flush=True)
            continue
        flags = []
        for pat in ("CartesianProduct", "BroadcastNestedLoopJoin",
                    "BatchEvalPython"):
            if pat in plan:
                if (name, pat) in ALLOW:
                    flags.append(f"{pat}[allowed: {ALLOW[(name, pat)]}]")
                else:
                    flags.append(f"{pat}[FAIL]")
                    n_fail += 1
        n_sp = plan.count("SinglePartition")
        if n_sp:
            if (name, "SinglePartition") in ALLOW:
                flags.append(
                    f"SinglePartition x{n_sp}"
                    f"[allowed: {ALLOW[(name, 'SinglePartition')]}]"
                )
            else:
                flags.append(f"SinglePartition x{n_sp}[FAIL]")
                n_fail += 1
        rows.append(
            (name, "clean" if not flags else "; ".join(flags),
             f"{time.time() - t0:.1f}s")
        )
        print(f"{name}: {rows[-1][1]}", flush=True)

    flagged = [r for r in rows if r[1] != "clean"]
    summary = (
        f"{len(rows)} queries audited, {len(rows) - len(flagged)} clean, "
        f"{len(flagged)} flagged, {n_fail} FAIL"
    )
    print(summary)
    if report:
        with open(report, "w") as f:
            f.write("# Bulk plan audit — full query registry\n\n")
            f.write(f"Input: `{sf_dir}`.  {summary}.\n\n")
            f.write(
                "Anti-patterns: CartesianProduct / "
                "BroadcastNestedLoopJoin / row-at-a-time Python "
                "(BatchEvalPython) are hard failures; SinglePartition "
                "exchanges must be on the documented allowlist "
                "(tiny final aggregates / 1-row stats).  Arrow-batched "
                "mapInPandas is the sanctioned Python path and is not "
                "flagged.\n\n| query | finding |\n|---|---|\n"
            )
            for name, flag, _t in rows:
                if flag != "clean":
                    f.write(f"| {name} | {flag} |\n")
            f.write(
                f"\nAll other {len(rows) - len(flagged)} queries: clean.\n"
            )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
