"""Count-Min Sketch: one-sided bound, mergeability, calibration shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from collect_mobile_devices_datalake_spark.operators.cms import (
    DEPTH,
    SWEEP_WIDTHS,
    WIDTH,
    cms_estimate,
    cms_sketch,
    token_stream,
)
from collect_mobile_devices_datalake_spark.registry import REGISTRY, _ensure_loaded
from collect_mobile_devices_datalake_spark.session import load_table

from .conftest import SF_SMOKE

_ensure_loaded()


def _stream(spark):
    return token_stream(load_table(spark, "documents", SF_SMOKE)).localCheckpoint(
        eager=True
    )


def test_one_sided_over_full_vocabulary(spark):
    """est >= exact for EVERY token — the CMS guarantee, not a sample."""
    stream = _stream(spark)
    vocab = stream.groupBy("t").agg(
        F.max("h").alias("h"), F.count("*").alias("exact_count")
    )
    est = cms_estimate(vocab, cms_sketch(stream))
    bad = est.filter(F.col("est_count") < F.col("exact_count")).count()
    assert bad == 0
    assert est.count() == vocab.count()  # every token answered


def test_cellwise_sum_merge_identity(spark):
    """sketch(A ∪ B) == cell-wise sum of sketch(A) + sketch(B): the
    property that makes the sketch a shippable partial at 100 TB (and
    the state a streaming sink would fold)."""
    docs = load_table(spark, "documents", SF_SMOKE)
    a = token_stream(docs.filter(F.col("doc_id") % 2 == 0))
    b = token_stream(docs.filter(F.col("doc_id") % 2 == 1))
    merged = (
        cms_sketch(a)
        .unionByName(cms_sketch(b))
        .groupBy("row_j", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = cms_sketch(token_stream(docs))
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_sketch_size_is_bounded(spark):
    """The sketch never exceeds depth*width cells regardless of corpus."""
    sk = cms_sketch(_stream(spark))
    assert sk.count() <= DEPTH * WIDTH


def test_width_calibration_monotone(spark):
    """Total overestimate must not grow with width (cells only split)."""
    rows = (
        REGISTRY["cms_width_calibration"].spark(spark, SF_SMOKE).orderBy("width").collect()
    )
    assert [r.width for r in rows] == sorted(SWEEP_WIDTHS)
    totals = [r.total_overestimate for r in rows]
    assert totals == sorted(totals, reverse=True)
    for r in rows:
        assert r.max_overestimate >= 0 and r.total_overestimate >= 0
