"""Physical-plan audits: machine-checkable assertions about what Catalyst
actually produced — column pruning reached the scan, filters were pushed,
no unexpected shuffles, joins picked the intended strategy.

These run in tests so a plan regression (e.g. a change that silently drags
every column through the Python worker) fails CI, not a 100 TB run.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PlanFacts:
    text: str
    read_schemas: list[str]
    pushed_filters: list[str]
    n_exchanges: int
    join_strategies: list[str]
    has_python_eval: bool

    def read_columns(self) -> set[str]:
        cols: set[str] = set()
        for rs in self.read_schemas:
            cols |= set(re.findall(r"(\w+):", rs))
        return cols


def plan_facts(df: DataFrame) -> PlanFacts:
    text = df._jdf.queryExecution().executedPlan().toString()
    return PlanFacts(
        text=text,
        read_schemas=re.findall(r"ReadSchema: struct<([^>]*)", text),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", text),
        n_exchanges=text.count("Exchange"),
        join_strategies=re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)",
            text,
        ),
        has_python_eval=(
            "ArrowEvalPython" in text
            or "MapInPandas" in text
            or "MapInArrow" in text
            or "FlatMapGroupsInPandas" in text
        ),
    )


def assert_columns_pruned(df: DataFrame, forbidden: set[str]) -> None:
    facts = plan_facts(df)
    leaked = facts.read_columns() & forbidden
    if leaked:
        raise AssertionError(
            f"scan reads columns that should be pruned: {sorted(leaked)}\n"
            f"{facts.read_schemas}"
        )


def assert_filter_pushed(df: DataFrame, column: str) -> None:
    facts = plan_facts(df)
    if not any(column in pf for pf in facts.pushed_filters):
        raise AssertionError(
            f"no pushed filter on {column!r}; PushedFilters="
            f"{facts.pushed_filters}"
        )


def assert_max_exchanges(df: DataFrame, n: int) -> None:
    facts = plan_facts(df)
    if facts.n_exchanges > n:
        raise AssertionError(
            f"plan has {facts.n_exchanges} exchanges (max {n}):\n{facts.text}"
        )


def assert_no_cartesian(df: DataFrame) -> None:
    facts = plan_facts(df)
    bad = [j for j in facts.join_strategies
           if j in ("CartesianProduct", "BroadcastNestedLoopJoin")]
    if bad:
        raise AssertionError(f"plan contains {bad}")
