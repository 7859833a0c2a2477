"""Semantic invariants for ccnet_lm_buckets and softdedup_weights.

(Value parity vs DuckDB is covered for both by test_oracle_parity's
parametrized sweep; these pin the properties parity alone can't state.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from collect_mobile_devices_datalake_spark.operators.selection import (
    BACKOFF_BITS,
    CCNET_REF_SOURCES,
)
from collect_mobile_devices_datalake_spark.registry import REGISTRY, _ensure_loaded
from collect_mobile_devices_datalake_spark.session import load_table

from .conftest import SF_SMOKE

_ensure_loaded()


def test_ccnet_buckets_are_balanced_tertiles(spark):
    out = REGISTRY["ccnet_lm_buckets"].spark(spark, SF_SMOKE).localCheckpoint(eager=True)
    sizes = (
        out.groupBy("lang", "ppl_bucket").count().groupBy("lang")
        .agg(F.max("count").alias("mx"), F.min("count").alias("mn"),
             F.count("*").alias("n_buckets"))
        .collect()
    )
    for r in sizes:
        assert r.n_buckets == 3, r
        assert r.mx - r.mn <= 1, r  # ntile property


def test_ccnet_scores_every_scorable_doc(spark):
    """No doc with >=2 tokens may be dropped (the per-lang LM join must
    not lose languages: the fixture guarantees every lang appears in the
    reference sources — asserted here so a fixture change fails loudly)."""
    docs = load_table(spark, "documents", SF_SMOKE)
    ref_langs = {
        r.lang
        for r in docs.filter(F.col("source").isin(*CCNET_REF_SOURCES))
        .select("lang").distinct().collect()
    }
    all_langs = {r.lang for r in docs.select("lang").distinct().collect()}
    assert ref_langs == all_langs
    scorable = docs.filter(
        F.size(F.split(F.trim("text"), "\\s+")) >= 2
    ).count()
    assert REGISTRY["ccnet_lm_buckets"].spark(spark, SF_SMOKE).count() == scorable


def test_ccnet_head_scores_below_tail(spark):
    """Bucket ordering is by score: max(head) <= min(tail) per lang."""
    out = REGISTRY["ccnet_lm_buckets"].spark(spark, SF_SMOKE)
    agg = (
        out.groupBy("lang")
        .agg(
            F.max(F.when(F.col("ppl_bucket") == "head", F.col("bits_per_bigram"))).alias("h"),
            F.min(F.when(F.col("ppl_bucket") == "tail", F.col("bits_per_bigram"))).alias("t"),
        )
        .collect()
    )
    for r in agg:
        assert r.h <= r.t, r
    assert BACKOFF_BITS >= 1


def test_softdedup_cluster_mass_is_one(spark):
    """Each cluster's weights sum to 1 (singletons keep weight 1), so
    total weight mass == number of clusters."""
    out = REGISTRY["softdedup_weights"].spark(spark, SF_SMOKE).localCheckpoint(eager=True)
    per_cluster = out.groupBy("cluster_id").agg(
        F.round(F.sum("weight"), 4).alias("mass")
    )
    off = per_cluster.filter(F.abs(F.col("mass") - 1.0) > 0.01).count()
    assert off == 0
    n_docs = load_table(spark, "documents", SF_SMOKE).count()
    assert out.count() == n_docs
    singles = out.filter(F.col("cluster_size") == 1)
    assert singles.filter(F.col("weight") != 1.0).count() == 0
