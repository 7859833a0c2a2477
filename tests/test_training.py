"""Invariant tests for the training-data curation ops (operators/training.py).

The oracle gate proves cross-engine value equality; these prove the
*semantic* properties a trainer relies on: split determinism and
proportions, quantization round-trip error bounds, complete PII removal,
and contamination pairs actually crossing the split boundary.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from collect_mobile_devices_datalake_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()
SF = "/root/testdata/sf0.01"


def _q(name, spark, sf=SF):
    return REGISTRY[name].spark(spark, sf)


class TestTrainSplit:
    def test_deterministic_and_total(self, spark):
        a = {r["doc_id"]: r["split"] for r in _q("train_split_assign", spark).collect()}
        b = {r["doc_id"]: r["split"] for r in _q("train_split_assign", spark).collect()}
        assert a == b and len(a) == 500

    def test_proportions_roughly_80_10_10(self, spark):
        counts = {
            r["split"]: r["n"]
            for r in _q("train_split_assign", spark)
            .groupBy("split")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        n = sum(counts.values())
        # multiplicative hash over 500 sequential ids: loose tolerance
        assert 0.70 <= counts["train"] / n <= 0.90
        assert 0.05 <= counts["val"] / n <= 0.15
        assert 0.05 <= counts["test"] / n <= 0.15

    def test_buckets_in_range(self, spark):
        row = _q("train_split_assign", spark).agg(
            F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
        ).first()
        assert 0 <= row["lo"] and row["hi"] <= 99


class TestQuantize:
    def test_roundtrip_error_within_one_step(self, spark):
        # |x - (zero_point + q*scale)| <= scale for every element: floor
        # quantization underestimates by < 1 step, never more
        emb = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
        # q ships stringified (driver canonicalizer can't hash list cells) —
        # split it back into codes for the round-trip check
        dequant = F.transform(
            F.split("q", " "),
            lambda qi: F.col("zero_point") + qi.cast("double") * F.col("scale"),
        )
        err = F.zip_with(
            F.transform("embedding", lambda x: x.cast("double")),
            dequant,
            lambda x, d: F.abs(x - d),
        )
        bad = (
            _q("embedding_quantize_int8", spark)
            .join(emb, "vec_id")
            .select(F.array_max(err).alias("max_err"), "scale")
            .filter(F.col("max_err") > F.col("scale") * 1.0000001)
            .count()
        )
        assert bad == 0

    def test_codes_in_int8_range(self, spark):
        bad = (
            _q("embedding_quantize_int8", spark)
            .select(F.explode(F.split("q", " ")).alias("c"))
            .filter((F.col("c").cast("int") < 0) | (F.col("c").cast("int") > 255))
            .count()
        )
        assert bad == 0


class TestRedact:
    def test_no_pii_left(self, spark):
        rows = _q("doc_pii_redact", spark).collect()
        email = re.compile(r"[A-Za-z0-9._]+@")
        phone = re.compile(r"[0-9]{3}-[0-9]{4}")
        for r in rows:
            assert not email.search(r["redacted"]), r["doc_id"]
            assert not phone.search(r["redacted"]), r["doc_id"]
            assert not r["residual_at"]
        assert all("<EMAIL>" in r["redacted"] and "<PHONE>" in r["redacted"] for r in rows)


class TestContamination:
    def test_pairs_cross_split_boundary(self, spark):
        splits = {r["doc_id"]: r["split"] for r in _q("train_split_assign", spark).collect()}
        pairs = _q("split_contamination", spark).collect()
        assert pairs, "expected at least one contaminated pair at sf0.01"
        for r in pairs:
            assert splits[r["train_doc"]] == "train"
            assert splits[r["test_doc"]] == "test"
            assert r["n_shared"] >= 3


def test_domain_token_waterfill_is_maximal(spark):
    # The waterfill contract: allocations never exceed the budget, and
    # raising the level by one token would — i.e. the level is maximal.
    # Saturated domains keep everything; clipped domains sit exactly at
    # the level.
    rows = REGISTRY["domain_token_waterfill"].spark(spark, SF).collect()
    budget = rows[0].budget
    total_alloc = sum(r.alloc_tokens for r in rows)
    assert total_alloc <= budget
    level = rows[0].level
    if level is not None:
        would = sum(min(r.n_tokens, level + 1) for r in rows)
        assert would > budget
        for r in rows:
            if r.saturated:
                assert r.alloc_tokens == r.n_tokens
            else:
                assert r.alloc_tokens == min(r.n_tokens, level)
    else:
        assert all(r.alloc_tokens == r.n_tokens for r in rows)


def test_curated_mix_is_budgeted_prefix_cut(spark):
    # Per source: the in-mix docs are a PREFIX of the hash order whose
    # token total fits the waterfill allocation, and the first excluded
    # doc would overflow it — i.e. the cut is exactly at the budget.
    rows = REGISTRY["curated_mix_manifest"].spark(spark, SF).collect()
    assert rows and any(r.in_mix for r in rows)
    assert all(r.ppl_bucket in ("head", "middle") for r in rows)
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    H = lambda doc_id: ((doc_id * 2654435761) % 2147483647)  # noqa: E731
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (H(r.doc_id), r.doc_id))
        flags = [r.in_mix for r in rs]
        # prefix property: once out, never in again
        assert flags == sorted(flags, reverse=True), src
        # the cut sits exactly at the allocation: cum of the last
        # in-mix doc <= alloc < cum of the first excluded doc, which
        # the cum_tokens column encodes directly
        kept = [r for r in rs if r.in_mix]
        dropped = [r for r in rs if not r.in_mix]
        if kept and dropped:
            assert kept[-1].cum_tokens < dropped[0].cum_tokens


def test_temperature_mix_flattens_and_budgets(spark):
    """tau = 1/2 must FLATTEN the natural distribution (head/tail
    probability ratio strictly below the head/tail token ratio), keep
    an exact integer-sqrt weight (w^2 <= n < (w+1)^2), and never
    allocate more than the shared 2/5 budget in total."""
    from collect_mobile_devices_datalake_spark.operators.training2 import (
        WATERFILL_BUDGET_DEN,
        WATERFILL_BUDGET_NUM,
    )
    from collect_mobile_devices_datalake_spark.registry import REGISTRY

    rows = REGISTRY["temperature_mix_allocation"].spark(spark, SF).collect()
    assert len(rows) > 1
    for r in rows:
        assert r.weight * r.weight <= r.n_tokens < (r.weight + 1) * (r.weight + 1)
    total_tokens = sum(r.n_tokens for r in rows)
    budget = total_tokens * WATERFILL_BUDGET_NUM // WATERFILL_BUDGET_DEN
    assert sum(r.alloc_tokens for r in rows) <= budget
    assert abs(sum(r.p_sample for r in rows) - 1.0) < 1e-3
    hi = max(rows, key=lambda r: r.n_tokens)
    lo = min(rows, key=lambda r: r.n_tokens)
    if hi.n_tokens > lo.n_tokens:
        assert (hi.p_sample / lo.p_sample) < (hi.n_tokens / lo.n_tokens)


def test_bpe_corpus_encoding_folds_to_type_table(spark):
    """Corpus-level BPE token mass must equal the word-TYPE table's
    freq-weighted segment counts — the encode join can neither drop nor
    double-count words (every corpus word appears in the type table by
    construction)."""
    from collect_mobile_devices_datalake_spark.registry import REGISTRY

    enc = REGISTRY["bpe_corpus_encoding"].spark(spark, SF).collect()
    seg = REGISTRY["bpe_vocab_segmentation"].spark(spark, SF).collect()
    assert sum(r.n_bpe_tokens for r in enc) == sum(
        r.freq * r.n_bpe_tokens for r in seg
    )
    assert sum(r.n_words for r in enc) == sum(r.freq for r in seg)


def test_novelty_consistent_with_contamination_pairs(spark):
    """Cross-op invariant: a (train, test) pair flagged by
    split_contamination (>= 3 shared shingles) implies the test doc's
    exact seen-in-train count is at least that pair's n_shared; and the
    novelty report covers exactly the test-split docs that have
    shingles, with ratios in [0, 1]."""
    from collect_mobile_devices_datalake_spark.operators.training import (
        split_bucket,
    )
    from collect_mobile_devices_datalake_spark.registry import REGISTRY
    from collect_mobile_devices_datalake_spark.session import load_table

    nov = {r.doc_id: r for r in REGISTRY["test_set_novelty"].spark(spark, SF).collect()}
    assert nov and all(0.0 <= r.novelty_ratio <= 1.0 for r in nov.values())
    test_ids = {
        r.doc_id
        for r in load_table(spark, "documents", SF)
        .select("doc_id")
        .withColumn("b", split_bucket("doc_id"))
        .filter("b >= 90")
        .collect()
    }
    assert set(nov) <= test_ids
    pairs = REGISTRY["split_contamination"].spark(spark, SF).collect()
    for p in pairs:
        assert p.test_doc in nov
        assert nov[p.test_doc].n_seen_in_train >= min(p.n_shared, nov[p.test_doc].n_shingles), p
