"""KMV sketch properties (operators/sketches.py).

Oracle parity is covered by test_oracle_parity; these pin the two claims
the oracle can't see: merge-invariance (the property that makes the
two-level plan correct on any cluster partitioning) and estimator
quality.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from collect_mobile_devices_datalake_spark.operators.sketches import (
    K,
    _source_token_hashes,
    kmv_sketches,
)

from .conftest import SF_SMOKE


def _sketch_map(df):
    return {r["source"]: tuple(r["kmin"]) for r in df.select("source", "kmin").collect()}


def test_sketch_is_partitioning_invariant(spark):
    """k-min merge is associative+commutative: the sketch is identical
    under 1, 7, and 32 partitions — the property that lets each of 1000
    executors ship k values per group instead of its vocabulary."""
    hashed = _source_token_hashes(spark, SF_SMOKE).localCheckpoint(eager=True)
    base = _sketch_map(kmv_sketches(hashed.coalesce(1)))
    assert base  # non-empty corpus
    for n in (7, 32):
        assert _sketch_map(kmv_sketches(hashed.repartition(n))) == base


def test_sketch_equals_exact_kmin(spark):
    """The distributed sketch is EXACTLY the k smallest distinct hashes
    (KMV is an exact top-k of a hashed set, not an approximation)."""
    hashed = _source_token_hashes(spark, SF_SMOKE).localCheckpoint(eager=True)
    got = _sketch_map(kmv_sketches(hashed))
    want = {
        r["source"]: tuple(r["kmin"])
        for r in hashed.groupBy("source")
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, K).alias("kmin"))
        .collect()
    }
    assert got == want


def test_estimator_quality_bounds(spark):
    """KMV stderr is ~1/sqrt(k-2) ≈ 13% at k=64; assert every source
    estimates within 5 sigma and undersized vocabularies come back
    exact."""
    from collect_mobile_devices_datalake_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = REGISTRY["kmv_vocab_distinct"].spark(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        if r["n_exact"] < K:
            assert r["est_distinct"] == r["n_exact"]
        else:
            assert r["err_pct"] < 65.0, (r["source"], r["err_pct"])
