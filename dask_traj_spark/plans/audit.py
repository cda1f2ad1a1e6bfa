"""Physical-plan audit helpers: make plan quality testable.

The 100 TB posture lives or dies on plan shape — a filter that
doesn't reach the parquet scan or a broadcast that silently becomes
a sort-merge join is invisible in correctness tests and fatal at
scale. These helpers parse ``explain('formatted')`` output so tests
can assert:

- shuffle count (``Exchange`` nodes, minus AQE re-uses),
- join strategies (broadcast vs sort-merge vs shuffled hash),
- parquet pushdown (``PushedFilters``) and column pruning
  (``ReadSchema``),
- whole-stage-codegen coverage.

They parse the stable-ish formatted explain text; they are test/dev
tooling, not runtime dependencies.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@dataclass
class PlanAudit:
    text: str
    n_exchanges: int = 0
    n_broadcast_joins: int = 0
    n_sortmerge_joins: int = 0
    n_shuffledhash_joins: int = 0
    n_broadcast_exchanges: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    n_codegen_stages: int = 0

    @property
    def n_shuffles(self) -> int:
        """Shuffle exchanges only (broadcast exchanges excluded)."""
        return self.n_exchanges - self.n_broadcast_exchanges


def audit(df: DataFrame) -> PlanAudit:
    text = formatted_plan(df)
    a = PlanAudit(text=text)
    # count ONLY the "(n) NodeName" detail headers — every node appears
    # once there; the tree rendering above them would double-count
    a.n_exchanges = len(re.findall(r"^\(\d+\) (?:Exchange|BroadcastExchange)\b", text, re.M))
    a.n_broadcast_exchanges = len(re.findall(r"^\(\d+\) BroadcastExchange\b", text, re.M))
    a.n_broadcast_joins = len(
        re.findall(r"^\(\d+\) Broadcast(?:Hash|NestedLoop)Join\b", text, re.M)
    )
    a.n_sortmerge_joins = len(re.findall(r"^\(\d+\) SortMergeJoin\b", text, re.M))
    a.n_shuffledhash_joins = len(re.findall(r"^\(\d+\) ShuffledHashJoin\b", text, re.M))
    a.pushed_filters = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    a.read_schemas = re.findall(r"ReadSchema: (\S+)", text)
    a.n_codegen_stages = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", text)))
    return a


def assert_no_sortmerge(df: DataFrame) -> PlanAudit:
    a = audit(df)
    if a.n_sortmerge_joins:
        raise AssertionError(
            f"plan has {a.n_sortmerge_joins} sort-merge join(s); expected "
            f"broadcast-only joins\n{a.text}"
        )
    return a


def assert_max_shuffles(df: DataFrame, n: int) -> PlanAudit:
    a = audit(df)
    if a.n_shuffles > n:
        raise AssertionError(
            f"plan has {a.n_shuffles} shuffle exchange(s), budget is {n}\n{a.text}"
        )
    return a
