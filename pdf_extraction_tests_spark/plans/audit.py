"""Physical-plan audits: assert the plan shape scale requires.

``explain()`` strings are the ground truth for whether Catalyst actually
did what the DataFrame code intends: filters pushed into the parquet scan,
small dimensions broadcast, no surprise shuffles.  These helpers parse the
formatted plan so tests (tests/test_plans.py) can pin the plan shape —
a regression here is a 100-TB performance bug even when results stay right.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def count_exchanges(plan: str) -> int:
    """Shuffle exchanges in the plan (excludes broadcast exchanges).

    Formatted plans list nodes as ``(n) Exchange`` with arguments on the
    following line; broadcast exchanges print as ``(n) BroadcastExchange``.
    """
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def has_broadcast_join(plan: str) -> bool:
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def pushed_filters(plan: str) -> str:
    m = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    return "; ".join(x for x in m if x)


def read_schema_columns(plan: str) -> list[str]:
    """Columns actually read from the (first) parquet scan."""
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [c.split(":")[0] for c in m.group(1).split(",") if c]
