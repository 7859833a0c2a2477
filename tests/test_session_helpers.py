"""fan_out helper: spreads narrow scans, no-op at real parallelism."""

from __future__ import annotations

from pyspark.sql import functions as F

from collect_mobile_devices_datalake_spark.session import fan_out, load_table

from .conftest import SF_SMOKE


def test_fan_out_spreads_single_partition_scan(spark):
    d = load_table(spark, "documents", SF_SMOKE)
    assert d.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    f = fan_out(d, "doc_id")
    assert f.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # values untouched
    assert f.count() == d.count()
    h = lambda x: x.select(F.bit_xor(F.xxhash64("doc_id", "text"))).first()[0]  # noqa: E731
    assert h(f) == h(d)


def test_fan_out_noop_when_scan_already_wide(spark, tmp_path):
    """fan_out decides from scan metadata (file count / size estimate), never
    df.rdd — a many-file table, the 100 TB shape, passes through unchanged."""
    d = load_table(spark, "documents", SF_SMOKE)
    target = spark.sparkContext.defaultParallelism
    path = str(tmp_path / "wide_docs")
    d.repartition(target + 5, "doc_id").write.parquet(path)
    wide = spark.read.parquet(path)
    assert len(wide.inputFiles()) >= target
    same = fan_out(wide, "doc_id")
    # unchanged frame: no extra repartition inserted
    assert same is wide


def test_fan_out_without_keys_round_robins(spark):
    d = load_table(spark, "nation", SF_SMOKE)
    f = fan_out(d)
    assert f.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert f.count() == d.count()
