"""Incremental resume — the flagship operator (reference §2 #21).

``crawl_resume`` (app.js:457-482) reads the full frontier and the
progress checkpoint, Set-dedups both, and returns ``source − saved``.
The Spark-native form is a ``left_anti`` join after ``dropDuplicates``:

- At 100 TB the frontier side is huge but the join is on a single string
  key; Catalyst picks broadcast when ``saved`` is small and
  sort-merge otherwise, with AQE switching strategy at runtime. No
  driver-side Sets — the reference's O(n·m) ``find_difference``
  (app.js:101-112, dead code) and its ``Array.includes`` scan become a
  real distributed anti-join.
- Reference bug (app.js:476: ``saved_list == []`` is always false) is NOT
  reproduced; empty saved-list is simply an anti-join against an empty
  relation, which returns the whole frontier — the intended behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def resume_anti_join(source: DataFrame, saved: DataFrame, key: str = "url") -> DataFrame:
    """Pending work = distinct(source) ⟕anti distinct(saved) on ``key``."""
    return (
        source.select(key)
        .dropDuplicates([key])
        .join(saved.select(key).dropDuplicates([key]), key, "left_anti")
    )
