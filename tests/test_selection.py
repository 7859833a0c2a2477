"""Properties of the bloom-prefiltered resume + model-based selection ops.

Value-level parity with the DuckDB oracles is covered by the parametrized
tests in test_oracle_parity.py; these tests pin the SEMANTIC guarantees
(no false negatives, accounting identities, score direction) and the
plan shapes (broadcast bitmap, no cartesian products).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from collect_mobile_devices_datalake_spark.plans.explain import formatted_plan
from collect_mobile_devices_datalake_spark.registry import REGISTRY, _ensure_loaded
from collect_mobile_devices_datalake_spark.session import load_table
from collect_mobile_devices_datalake_spark.sources.synthetic import (
    saved_list,
    source_list,
)

from .conftest import SF_SMOKE

_ensure_loaded()


def test_bloom_prefilter_has_no_false_negatives(spark):
    # Bloom guarantee: the prefiltered pending set must EQUAL the exact
    # anti-join's pending set (restricted to non-empty urls) — a missing
    # url would be a false negative, which the bitmap cannot produce.
    orders = load_table(spark, "orders", SF_SMOKE)
    exact = {
        r.url
        for r in source_list(orders)
        .filter(F.col("url") != "")
        .select("url")
        .distinct()
        .join(saved_list(orders).select("url").distinct(), "url", "left_anti")
        .collect()
    }
    got_rows = REGISTRY["resume_bloom_prefilter"].spark(spark, SF_SMOKE).collect()
    got = {r.url for r in got_rows}
    assert got == exact
    # every row is unique — the definite/rescued branches never overlap
    assert len(got_rows) == len(got)


def test_bloom_fp_accounting_identity(spark):
    row = REGISTRY["bloom_fp_report"].spark(spark, SF_SMOKE).collect()[0]
    # no false negatives ⇒ every true member passes ⇒ passes split exactly
    # into members + false positives
    assert row.n_bloom_pass == row.n_members + row.n_false_pos
    assert 0 <= row.n_false_pos <= row.n_probed - row.n_members
    # 2^20 bits against this corpus' load keeps the realized rate tiny
    assert row.fp_rate < 0.05


def test_dsir_scores_rank_target_language_higher(spark):
    # the importance weight is trained FOR lang='en' — mean score of en
    # docs must exceed mean score of every other language's docs
    scores = REGISTRY["dsir_importance_score"].spark(spark, SF_SMOKE)
    docs = load_table(spark, "documents", SF_SMOKE).select("doc_id", "lang")
    by_lang = {
        r.lang: r.m
        for r in scores.join(docs, "doc_id")
        .groupBy("lang")
        .agg(F.avg(F.col("dsir_score") / F.col("n_tokens")).alias("m"))
        .collect()
    }
    assert all(by_lang["en"] > v for k, v in by_lang.items() if k != "en"), by_lang


def test_rarity_bits_are_bounded_by_corpus_size(spark):
    out = REGISTRY["doc_rarity_bits"].spark(spark, SF_SMOKE)
    n_docs = load_table(spark, "documents", SF_SMOKE).count()
    max_bits = n_docs.bit_length() - 1  # flog2(N) = a hapax's contribution
    row = out.agg(
        F.min("rarity_bits").alias("lo"), F.max("mean_bits").alias("hi")
    ).collect()[0]
    assert row.lo >= 0
    assert row.hi <= max_bits


def test_bloom_probe_broadcasts_bitmap_no_cartesian(spark):
    # the bitmap is the bounded side — it must broadcast to the frontier
    # probes; nothing in the plan may be an all-pairs product
    q = REGISTRY["resume_bloom_prefilter"].spark(spark, SF_SMOKE)
    plan = formatted_plan(q)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_selection_scores_have_no_global_sort(spark):
    # dsir / rarity: the only SinglePartition exchange allowed is the
    # scalar totals aggregate over the bounded feature/vocab table; doc
    # mass must move through hash partitionings only
    for name in ["dsir_importance_score", "doc_rarity_bits"]:
        q = REGISTRY[name].spark(spark, SF_SMOKE)
        plan = formatted_plan(q)
        assert plan.count("Exchange SinglePartition") <= 1, (name, plan)
        assert "rangepartitioning" not in plan.lower(), (name, plan)
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BroadcastExchange" in plan, (name, plan)


def test_poly_hash_cross_engine_parity_on_adversarial_strings(spark):
    # the 31-poly hash is the load-bearing primitive of the bloom + DSIR
    # oracles: pin Spark's aggregate-fold == DuckDB's list_reduce on a
    # seeded batch of adversarial ASCII strings (punctuation, digits,
    # repeats, long tails — plus every printable char solo)
    import random
    import string

    import duckdb

    from collect_mobile_devices_datalake_spark.operators.selection import (
        _poly_hash,
        _poly_hash_sql,
    )

    rng = random.Random(42)
    printable = string.ascii_letters + string.digits + string.punctuation
    cases = [c for c in printable]
    cases += ["".join(rng.choice(printable) for _ in range(rng.randint(1, 300)))
              for _ in range(60)]
    cases += ["a" * 500, "https://example.com/devices/gsmarena/1-urgent_42"]

    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = {r.s: r.h for r in df.select("s", _poly_hash(F.col("s")).alias("h")).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in cases])
    want = dict(con.execute(f"SELECT s, {_poly_hash_sql('s')} FROM t").fetchall())

    assert got == want
    assert all(0 <= h < 2_147_483_647 for h in got.values())


def test_bigram_surprise_hand_computed(spark, tmp_path):
    """Pin the add-one-smoothed bigram-bits semantics on a corpus small
    enough to verify by hand. Unigrams: a=3 b=3 c=1 z=2, V=4. Bigrams:
    'a b'=3 'b a'=1 'b c'=1 'z z'=1. Term = flog2((c1+V) div (c2+1))."""
    import os

    from collect_mobile_devices_datalake_spark.registry import REGISTRY

    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, "z z"), (3, "solo")],
        "doc_id bigint, text string",
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_bigrams"], r["total_bits"], round(r["mean_bits"], 6))
        for r in REGISTRY["doc_bigram_surprise"].spark(spark, d).collect()
    }
    # doc 0: (a b)=0 bits x2, (b a): (3+5)//2=4 -> 2 bits ... wait V
    # includes 'solo': V=5. Recompute: (a b): (3+5)//4=2 -> 1 bit;
    # (b a): (3+5)//2=4 -> 2; (b c): 4 -> 2; (z z): (2+5)//2=3 -> 1.
    assert got == {
        0: (3, 1 + 2 + 1, round((1 + 2 + 1) / 3, 6)),
        1: (2, 1 + 2, 1.5),
        2: (1, 1, 1.0),
        # doc 3 has a single token -> no bigrams -> absent
    }


def test_stratified_sample_invariants(spark):
    # Determinism + the allocation guarantee: two runs produce the same
    # doc set, strata at or below the target keep everything, and the
    # realized per-stratum counts are hypergeometrically plausible for a
    # ~TARGET/n_stratum hash-threshold rate (bounded well below n_stratum
    # for large strata).
    q = REGISTRY["stratified_sample"].spark
    a = {r.doc_id for r in q(spark, SF_SMOKE).collect()}
    b = {r.doc_id for r in q(spark, SF_SMOKE).collect()}
    assert a == b and a
    rows = q(spark, SF_SMOKE).collect()
    from collections import Counter

    per = Counter((r.source, r.lang) for r in rows)
    n_stratum = {(r.source, r.lang): r.n_stratum for r in rows}
    docs = load_table(spark, "documents", SF_SMOKE)
    full = {
        (r.source, r.lang): r.n
        for r in docs.groupBy("source", "lang").agg(F.count("*").alias("n")).collect()
    }
    for key, n in full.items():
        if n <= 8:
            # inequality is vacuously true below the target: all kept
            assert per.get(key, 0) == n, key
    # reported n_stratum must be the true stratum size, not the kept count
    for key, n in n_stratum.items():
        assert full[key] == n


def test_stratified_sample_plan_is_broadcast_filter(spark):
    # The scale contract: per-stratum counts broadcast back; no window,
    # no sort-based rank anywhere in the plan.
    plan = formatted_plan(REGISTRY["stratified_sample"].spark(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_nb_quality_classifier_separates_reference_sources(spark):
    # The calibration claim: the reference (clean) sources must score a
    # higher mean predicted-clean fraction than the web sources, and the
    # aggregate score mass of the clean class must be positive — the
    # direction a likelihood-ratio classifier trained on that very split
    # cannot get wrong unless the arithmetic is broken.
    rows = REGISTRY["nb_quality_classifier"].spark(spark, SF_SMOKE).collect()
    clean = [r for r in rows if r.label == "clean"]
    web = [r for r in rows if r.label == "web"]
    assert clean and web
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    assert mean([r.pred_clean_frac for r in clean]) > mean(
        [r.pred_clean_frac for r in web]
    )
    assert sum(r.total_score for r in clean) > 0
    # fixed-point floor: a weight can never drop below -SCALE, so no
    # document's score can be below -SCALE * its token count — spot the
    # bound through the per-source aggregate
    from collect_mobile_devices_datalake_spark.operators.selection import NB_SCALE

    for r in rows:
        assert r.total_score >= -NB_SCALE * 10_000 * r.n_docs


def test_dsir_resample_monotone_in_score(spark):
    # Acceptance must be monotone in the importance score: the top score
    # tercile's acceptance rate strictly exceeds the bottom tercile's
    # (the property exponential tilting has and the linear surrogate
    # must keep), and re-running yields the identical accepted set.
    rows = REGISTRY["dsir_resample"].spark(spark, SF_SMOKE).collect()
    rows2 = REGISTRY["dsir_resample"].spark(spark, SF_SMOKE).collect()
    assert {(r.doc_id, r.accepted) for r in rows} == {
        (r.doc_id, r.accepted) for r in rows2
    }
    ordered = sorted(rows, key=lambda r: r.dsir_score)
    k = len(ordered) // 3
    lo, hi = ordered[:k], ordered[-k:]
    rate = lambda xs: sum(r.accepted for r in xs) / len(xs)  # noqa: E731
    assert rate(hi) > rate(lo)
    # thresholds clamp inside [0, MOD]
    from collect_mobile_devices_datalake_spark.operators.selection import _RS_MOD

    for r in rows:
        assert 0 <= r.accept_threshold <= _RS_MOD


def test_priority_sample_semantics(spark):
    """Pin the Duffield-Lund-Thorup invariants: exact-K sample, tau is a
    genuine separating threshold (every kept priority >= tau > every
    dropped one would need the full ranking; the kept side is checkable),
    the estimator identity est = max(w, tau), the uniform-mixing property
    of the two-step Lehmer (one step is a linear non-uniform map on
    fixture-sized doc_ids — the round-10 bug class), and the estimator's
    accuracy on total mass (unbiased => a few percent at K=200)."""
    from collect_mobile_devices_datalake_spark.operators.selection import (
        _PRI_K,
        _PRI_MOD,
    )

    sample = REGISTRY["priority_sample_topk"].spark(spark, SF_SMOKE).collect()
    assert len(sample) == _PRI_K
    taus = {r.tau for r in sample}
    assert len(taus) == 1
    tau = taus.pop()
    assert tau > 0  # population (500) exceeds K
    assert all(r.pri >= tau for r in sample)
    assert all(r.est_mass == max(r.w, tau) for r in sample)
    # two-step Lehmer mixing: implied uniforms pri ~ w*M/u must give
    # u/M quantiles spread over (0,1) — the single-step bug confined
    # them to [0.28, 0.39] and biased the estimator ~65%
    report = REGISTRY["priority_sample_domain_mass"].spark(spark, SF_SMOKE).collect()
    true_total = sum(r.true_mass for r in report)
    est_total = sum(r.est_mass for r in report)
    assert abs(est_total - true_total) / true_total < 0.15, (
        f"estimator off by {abs(est_total - true_total) / true_total:.1%} — "
        "uniformity of the Lehmer mix is broken"
    )
    # accounting identity: n_docs sums to the corpus size
    d = load_table(spark, "documents", SF_SMOKE)
    assert sum(r.n_docs for r in report) == d.count()
    assert _PRI_MOD == 2147483647


def test_priority_sample_plan_is_bounded_heap(spark):
    """The corpus-mass operation must be TakeOrderedAndProject (bounded
    per-partition heap + driver merge), never a full Sort/Exchange of
    the scan — the property that makes the kernel O(scan) at 100 TB."""
    df = REGISTRY["priority_sample_topk"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_priority_sample_per_source_pushes_group_limit(spark):
    """The per-group rank filter must compile to WindowGroupLimit
    (SPARK-37099) — bounded per-partition heaps ahead of the
    source-keyed shuffle — or the kernel shuffles the whole corpus."""
    df = REGISTRY["priority_sample_per_source"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    # per-source DLT invariants: exact K_G per (large-enough) source,
    # single tau per source, estimator identity
    from collect_mobile_devices_datalake_spark.operators.selection import _PRI_KG

    rows = df.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, grp in by_src.items():
        assert len(grp) == _PRI_KG  # every fixture source has > K_G docs
        assert len({r.tau for r in grp}) == 1
        assert all(r.est_mass == max(r.w, r.tau) for r in grp)
