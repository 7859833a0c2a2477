"""Resume anti-join semantics (reference app.js:457-482)."""

from __future__ import annotations

from collect_mobile_devices_datalake_spark.operators.resume import resume_anti_join


def test_resume_basic(spark):
    source = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "b")], ["id", "url"]
    )
    saved = spark.createDataFrame([(1, "b")], ["id", "url"])
    got = {r["url"] for r in resume_anti_join(source, saved).collect()}
    assert got == {"a", "c"}


def test_resume_empty_saved_returns_all(spark):
    # the reference INTENDED this (app.js:476 bug: `== []` never true); we do it right
    source = spark.createDataFrame([(1, "a"), (2, "a")], ["id", "url"])
    saved = spark.createDataFrame([], "id int, url string")
    got = [r["url"] for r in resume_anti_join(source, saved).collect()]
    assert got == ["a"]  # deduped too


def test_resume_foreign_saved_urls_ignored(spark):
    # anti-join direction: saved urls not in source must not appear (app.js:479)
    source = spark.createDataFrame([(1, "a")], ["id", "url"])
    saved = spark.createDataFrame([(1, "zzz")], ["id", "url"])
    got = [r["url"] for r in resume_anti_join(source, saved).collect()]
    assert got == ["a"]
