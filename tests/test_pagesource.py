"""The page_range Python DataSource: partitioning, determinism, schema."""

from __future__ import annotations

from pyspark.sql import functions as F

from collect_mobile_devices_datalake_spark.sources.pagesource import (
    register_page_range_source,
)


def _read(spark, **opts):
    register_page_range_source(spark)
    r = spark.read.format("page_range")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_range_is_complete_and_deterministic(spark):
    df = _read(spark, start=0, end=500, numPartitions=8)
    assert df.count() == 500
    assert df.select("page_id").distinct().count() == 500
    lo, hi = df.agg(F.min("page_id"), F.max("page_id")).first()
    assert (lo, hi) == (0, 499)
    # deterministic re-read: same content hash both times
    h = lambda d: d.select(F.bit_xor(F.xxhash64("url", "html", "status"))).first()[0]  # noqa: E731
    assert h(df) == h(_read(spark, start=0, end=500, numPartitions=8))


def test_range_splits_into_requested_partitions(spark):
    df = _read(spark, start=0, end=1000, numPartitions=16)
    assert df.rdd.getNumPartitions() == 16
    # ragged split still covers everything exactly once
    df2 = _read(spark, start=0, end=997, numPartitions=16)
    assert df2.count() == 997


def test_status_gate_matches_fixture_convention(spark):
    df = _read(spark, start=0, end=290, numPartitions=4)
    bad = df.filter(F.col("status") != 200)
    assert bad.count() == 10  # page_id % 29 == 3
    assert bad.filter(F.col("page_id") % 29 != 3).count() == 0


def test_downstream_plan_composes(spark):
    # the source feeds ordinary DataFrame ops (the crawl-parse shape)
    df = _read(spark, start=0, end=200, numPartitions=4, source="geekbench")
    out = (
        df.filter(F.col("status") == 200)
        .select("page_id", F.regexp_extract("html", r"<span class=\"score\">(\d+)</span>", 1).cast("bigint").alias("score"))
        .filter(F.col("score") == F.col("page_id") * 47)
    )
    assert out.count() == df.filter(F.col("status") == 200).count()
