"""Physical-plan inspection: the 100 TB design checks, automated.

"Would this plan survive a 100× scale-up?" is a property of the
physical plan, not the row count — so these helpers make plan shape
assertable in tests: filters reaching the parquet scan (PushedFilters),
column pruning (ReadSchema), broadcast vs shuffle joins, whole-stage
codegen coverage, partial (map-side) aggregation.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def plan_has(df: DataFrame, *needles: str) -> dict[str, bool]:
    plan = formatted_plan(df)
    return {n: (n in plan) for n in needles}


def scan_pushdown_report(df: DataFrame) -> list[dict]:
    """One entry per parquet scan detail block: pushed filters + read schema."""
    plan = formatted_plan(df)
    scans = []
    for m in re.finditer(r"\(\d+\) Scan parquet.*?(?=\n\(\d+\) |\Z)", plan, re.S):
        block = m.group(0)
        pushed = re.search(r"PushedFilters: \[(.*?)\]", block)
        schema = re.search(r"ReadSchema: (.*)", block)
        scans.append(
            {
                "pushed_filters": pushed.group(1) if pushed else "",
                "read_schema": schema.group(1).strip() if schema else "",
            }
        )
    return scans


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (lower = better co-location).

    Broadcast exchanges are excluded — they move the small side only.
    """
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))
