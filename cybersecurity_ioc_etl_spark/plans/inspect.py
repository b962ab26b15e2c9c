"""Physical-plan inspection helpers.

The difference between "passes at sf0.01" and "survives 100 TB" is plan
shape: filters at the scan, broadcast dims, distributed top-k, no Python
eval in hot paths.  These helpers turn those properties into assertions
a CI gate (tests/test_plans.py) or an ad-hoc notebook can run against
any DataFrame — the engine's plan contract, callable.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame, execute: bool = False) -> str:
    """Capture ``explain(mode="formatted")`` as a string.

    ``execute=True`` first runs THIS DataFrame so AQE materializes the
    final plan (including codegen ids).  Use ``collect()`` semantics —
    calling ``count()`` instead would plan a different query.
    """
    if execute:
        df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def has_pushed_filters(plan: str) -> bool:
    """At least one predicate reached the parquet scan."""
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def has_partition_filters(plan: str, column: str | None = None) -> bool:
    """The scan prunes at the partition level (optionally on `column`)."""
    if "PartitionFilters" not in plan:
        return False
    head = plan.split("PartitionFilters", 1)[1].split("\n")[0]
    return column in head if column else True


def read_schema_columns(plan: str) -> list[str]:
    """Column names the scan actually reads (pruning evidence)."""
    head = plan.split("ReadSchema", 1)[1].split("\n")[0]
    return re.findall(r"(\w+):", head)


def has_broadcast_join(plan: str, min_count: int = 1) -> bool:
    return plan.count("BroadcastHashJoin") >= min_count


def has_take_ordered_topk(plan: str) -> bool:
    """Top-k runs as per-partition heaps, never a global sort."""
    return "TakeOrderedAndProject" in plan


def is_all_jvm(plan: str) -> bool:
    """No Python evaluation nodes — the whole plan stays in codegen."""
    return "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def shuffle_count(plan: str) -> int:
    """Number of exchange (shuffle) operators in the plan."""
    return plan.count("hashpartitioning") + plan.count("rangepartitioning")
