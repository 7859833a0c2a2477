"""Exact duplicated-substring spans: semantic + plan properties."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from collect_mobile_devices_datalake_spark.operators.dedup import _LGRAM
from collect_mobile_devices_datalake_spark.plans.explain import formatted_plan
from collect_mobile_devices_datalake_spark.registry import REGISTRY, _ensure_loaded
from collect_mobile_devices_datalake_spark.session import load_table

from .conftest import SF_SMOKE

_ensure_loaded()


def test_spans_are_disjoint_maximal_and_in_bounds(spark):
    spans = REGISTRY["dup_substring_spans"].spark(spark, SF_SMOKE).collect()
    lengths = {
        r.doc_id: r.n
        for r in load_table(spark, "documents", SF_SMOKE)
        .select("doc_id", F.length("text").alias("n"))
        .collect()
    }
    by_doc = defaultdict(list)
    for r in spans:
        assert r.span_chars >= _LGRAM  # a span holds at least one full L-gram
        assert r.span_chars == r.span_end - r.span_start + 1
        assert 1 <= r.span_start <= r.span_end <= lengths[r.doc_id]
        by_doc[r.doc_id].append((r.span_start, r.span_end))
    for doc, ivs in by_doc.items():
        ivs.sort()
        for (s1, e1), (s2, e2) in zip(ivs, ivs[1:]):
            # spans are DISJOINT maximal regions (overlapping islands are
            # interval-merged), so coverage sums are exact
            assert s2 > e1, (doc, ivs)


def test_every_span_text_occurs_elsewhere(spark):
    # ground truth for a sample: the opening L-gram of each span must
    # appear at least twice corpus-wide
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, "documents", SF_SMOKE).collect()
    }
    corpus_counts = defaultdict(int)
    for text in docs.values():
        for i in range(len(text) - _LGRAM + 1):
            corpus_counts[text[i : i + _LGRAM]] += 1
    spans = REGISTRY["dup_substring_spans"].spark(spark, SF_SMOKE).collect()
    assert spans
    for r in spans[:200]:
        gram = docs[r.doc_id][r.span_start - 1 : r.span_start - 1 + _LGRAM]
        assert corpus_counts[gram] >= 2, (r.doc_id, gram)


def test_profile_fraction_bounded_and_zero_filled(spark):
    prof = REGISTRY["dup_substring_profile"].spark(spark, SF_SMOKE)
    n_docs = load_table(spark, "documents", SF_SMOKE).count()
    rows = prof.collect()
    assert len(rows) == n_docs  # every document appears, zero-filled
    for r in rows:
        assert 0 <= r.dup_chars <= r.doc_chars
        assert 0.0 <= r.dup_frac <= 1.0


def test_span_plan_shuffles_hashes_not_text(spark):
    q = REGISTRY["dup_substring_spans"].spark(spark, SF_SMOKE)
    plan = formatted_plan(q)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "xxhash64" in plan, plan  # grams move as 8-byte keys
    assert "Exchange SinglePartition" not in plan, plan
