"""Cross-operator consistency: independent operators must agree.

Each registered query is already value-checked against its own DuckDB
oracle; these tests check operators against EACH OTHER — a second,
oracle-independent net that catches consistent-but-wrong semantics
(e.g. two tokenizers that silently disagree, a dedup key that doesn't
partition the corpus the way the exact op says it does).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from collect_mobile_devices_datalake_spark.registry import REGISTRY, _ensure_loaded

from .conftest import SF_SMOKE

_ensure_loaded()
SF = SF_SMOKE


def _q(spark, name):
    return REGISTRY[name].spark(spark, SF)


def test_exact_and_fingerprint_dedup_agree(spark):
    """Content-keyed and fingerprint-keyed exact dedup must induce the
    same partition of the corpus (identical group-size multisets and the
    same keeper count) — or the fingerprint isn't a faithful content key."""
    by_text = _q(spark, "dedup_exact").select("n_copies")
    by_fp = _q(spark, "dedup_by_fingerprint").select("n_copies")
    assert sorted(r[0] for r in by_text.collect()) == sorted(
        r[0] for r in by_fp.collect()
    )


def test_repetition_metrics_word_count_matches_doc_stats(spark):
    """doc_repetition_metrics' whitespace word count must equal
    doc_stats' token_count for every doc — two independent tokenizer
    expressions, one contract."""
    rep = _q(spark, "doc_repetition_metrics").select("doc_id", "n_words")
    stats = _q(spark, "doc_stats").select("doc_id", "n_tokens")
    joined = rep.join(stats, "doc_id")
    assert joined.filter(F.col("n_words") != F.col("n_tokens")).count() == 0
    assert joined.count() == rep.count()


def test_boilerplate_removal_conserves_segments(spark):
    """clean_text's segment count + n_segs_removed must reconstruct the
    original document's segment count (ceil(words/3)) for every doc."""
    d = _q(spark, "boilerplate_removal")
    docs = REGISTRY["doc_stats"].spark(spark, SF).select("doc_id", "n_tokens")
    joined = d.join(docs, "doc_id").select(
        "doc_id",
        (F.ceil(F.size(F.split(F.trim("clean_text"), "\\s+")) / 3) + F.col("n_segs_removed")).alias("rebuilt"),
        F.ceil(F.col("n_tokens") / 3).alias("expected"),
    )
    # kept segments are whole 3-word windows except possibly the original
    # tail; allow the tail segment (1-2 words) to round the same way
    mismatches = joined.filter(F.col("rebuilt") != F.col("expected"))
    assert mismatches.count() == 0, mismatches.limit(5).collect()


def test_split_assignment_consistent_with_contamination_pairs(spark):
    """Every (train_doc, test_doc) contamination pair must place its docs
    in the splits the split op itself assigns — the contamination op
    recomputes the split arithmetically and may not drift."""
    pairs = _q(spark, "split_contamination")
    splits = _q(spark, "train_split_assign").select("doc_id", "split")
    tr = splits.withColumnRenamed("doc_id", "train_doc").withColumnRenamed(
        "split", "train_split"
    )
    te = splits.withColumnRenamed("doc_id", "test_doc").withColumnRenamed(
        "split", "test_split"
    )
    j = pairs.join(tr, "train_doc").join(te, "test_doc")
    assert j.filter(F.col("train_split") != "train").count() == 0
    assert j.filter(F.col("test_split") != "test").count() == 0


def test_cdc_diff_and_apply_are_inverse(spark):
    """apply(old, feed) must land exactly on the new snapshot, and the
    diff of (applied, new) must therefore be EMPTY — diff/apply are
    inverses. (cdc_apply_changes' own oracle checks values; this checks
    the pair's algebra through the engine's own diff.)"""
    applied = _q(spark, "cdc_apply_changes")
    from collect_mobile_devices_datalake_spark.operators.lake_ops import (
        _ORDER_COLS,
        _new_snapshot,
    )
    from collect_mobile_devices_datalake_spark.session import load_table

    new = _new_snapshot(load_table(spark, "orders", SF))
    fp = F.xxhash64(*_ORDER_COLS)
    a = applied.select("o_orderkey", fp.alias("fp_a"))
    b = new.select("o_orderkey", fp.alias("fp_b"))
    resid = a.join(b, "o_orderkey", "full_outer").filter(
        F.col("fp_a").isNull()
        | F.col("fp_b").isNull()
        | (F.col("fp_a") != F.col("fp_b"))
    )
    assert resid.count() == 0


def test_minhash_lsh_recall_of_exact_jaccard_pairs(spark):
    """Every pair the exact ngram-Jaccard op reports at tau=0.5 should be
    surfaced by the banded-minhash candidate generator: with 4 bands x 4
    rows, P(candidate | J=0.5) ≈ 1-(1-0.5^4)^4 ≈ 0.23 per table but the
    planted dups sit at J >= 0.8 where recall ≈ 0.89; assert the overall
    recall floor 0.7 that the corpus's J-distribution implies."""
    exact = _q(spark, "dedup_ngram_jaccard").select("doc_a", "doc_b")
    cand = _q(spark, "dedup_minhash_lsh_pairs").select("doc_a", "doc_b")
    n_exact = exact.count()
    n_hit = exact.join(cand, ["doc_a", "doc_b"], "left_semi").count()
    assert n_exact > 0
    assert n_hit / n_exact >= 0.7, f"{n_hit}/{n_exact}"


def test_containment_jaccard_matches_minhash_exact_jaccard(spark):
    """Two independent computations of exact pair Jaccard must agree:
    doc_containment_pairs works over distinct shingle-HASH sets while
    minhash_estimate_quality intersects the shingle STRING arrays — equal
    unless the rolling hash collides within a pair (none on this corpus).
    Also check the containment bounds: max(c_ab, c_ba) >= jaccard."""
    cont = {
        (r["doc_a"], r["doc_b"]): (
            r["jaccard"],
            r["containment_ab"],
            r["containment_ba"],
        )
        for r in _q(spark, "doc_containment_pairs").collect()
    }
    est = {
        (r["doc_a"], r["doc_b"]): r["exact_jaccard"]
        for r in _q(spark, "minhash_estimate_quality").collect()
    }
    shared = set(cont) & set(est)
    assert shared, "operators must share LSH candidate pairs"
    for k in shared:
        j, cab, cba = cont[k]
        assert j == est[k], f"jaccard mismatch for {k}: {j} vs {est[k]}"
        assert max(cab, cba) >= j, f"containment bound violated for {k}"


def test_rollup_grains_conserve_mass(spark):
    """Every grain of the rollup hierarchy must carry the same event count
    and the same (exactly-summed) value total — partial re-aggregation
    cannot create or lose mass. Also cross-checks the hour grain against
    the independently-built events_tumbling_hourly operator."""
    roll = _q(spark, "rollup_reuse_hierarchy").collect()
    by_grain = {}
    for r in roll:
        n, v = by_grain.get(r.grain, (0, 0.0))
        by_grain[r.grain] = (n + r.n_events, v + r.total_value)
    assert set(by_grain) == {"hour", "day", "month"}
    counts = {g: n for g, (n, _) in by_grain.items()}
    assert len(set(counts.values())) == 1, counts
    totals = {g: round(v, 2) for g, (_, v) in by_grain.items()}
    assert len(set(totals.values())) == 1, totals

    hourly = _q(spark, "events_tumbling_hourly").collect()
    assert sum(r.n_events for r in hourly) == counts["hour"]


def test_mad_outliers_sit_beyond_the_gate(spark):
    rows = _q(spark, "order_value_outliers_mad").collect()
    assert rows
    for r in rows:
        assert r.mad_score > 2.0, r


def test_order_overlap_pairs_bounded_by_order_count(spark):
    for r in _q(spark, "order_overlap_stats").collect():
        assert r.n_orders >= 2
        assert 1 <= r.n_overlap_pairs <= r.n_orders * (r.n_orders - 1) // 2
        assert r.max_overlap_days >= 0


def test_token_drift_is_nonnegative_and_consistent(spark):
    rows = _q(spark, "source_token_drift").collect()
    assert rows
    for r in rows:
        assert r.chi2_fp >= 0
        assert abs(r.chi2 - r.chi2_fp / 1_000_000) < 1e-6
        assert r.n_tokens > 0
    # drift against the corpus the sources themselves form: the total
    # token mass must match doc_tokens_per_source's independent count
    per_source = {r.source: r.total_tokens for r in _q(spark, "doc_tokens_per_source").collect()}
    for r in rows:
        assert per_source.get(r.source) == r.n_tokens, (r.source, r.n_tokens)


def test_locf_agrees_with_zero_fill_grid(spark):
    """The LOCF variant must sit on exactly the same dense grid as the
    zero-fill gap filler (same cells, same counts), and every silent
    hour must carry the most recent observed value forward."""
    locf = {(r.event_type, r.hour): r for r in _q(spark, "events_gap_fill_locf").collect()}
    zero = {(r.event_type, r.hour): r.n_events for r in _q(spark, "events_gap_fill_hourly").collect()}
    assert set(locf) == set(zero)
    assert all(locf[k].n_events == zero[k] for k in zero)
    by_type = {}
    for (et, h), r in sorted(locf.items(), key=lambda kv: (kv[0][0], kv[0][1])):
        if r.is_filled:
            assert r.n_events == 0
            # carried value equals the last non-filled cell's value (or
            # stays None before the first observation)
            assert r.filled_value == by_type.get(et)
        else:
            by_type[et] = r.filled_value


def test_mann_whitney_u_is_a_valid_statistic(spark):
    rows = _q(spark, "value_distribution_shift").collect()
    assert rows
    total = rows[0].n + rows[0].n_rest
    for r in rows:
        assert r.n + r.n_rest == total
        assert 0 <= r.u2 <= 2 * r.n * r.n_rest
        assert 0.0 <= r.auc <= 1.0
    # each cross-type comparison is counted once from each side: the 2*U
    # values sum to twice the number of cross-type pairs (ties included)
    pair_mass = sum(r.n * r.n_rest for r in rows)
    assert sum(r.u2 for r in rows) == pair_mass


def test_ks_statistic_bounds_and_spine_agreement(spark):
    """KS must be a valid statistic (0 <= ks <= 1, integer numerator
    bounded by n*n_rest) over the same population the Mann-Whitney op
    sees (identical per-type counts)."""
    ks = {r.event_type: r for r in _q(spark, "value_ks_statistic").collect()}
    mw = {r.event_type: r for r in _q(spark, "value_distribution_shift").collect()}
    assert set(ks) == set(mw)
    for et, r in ks.items():
        assert (r.n, r.n_rest) == (mw[et].n, mw[et].n_rest)
        assert 0 <= r.ks_num <= r.n * r.n_rest
        assert 0.0 <= r.ks <= 1.0


def test_ivm_view_equals_aggregate_of_applied_changes(spark):
    """Three independent routes to the same view must agree: the IVM merge
    (old aggregate ⊕ signed deltas), the direct oracle recompute (parity
    gate), and aggregating the table cdc_apply_changes materializes."""
    ivm = {
        r.o_orderstatus: (r.n_orders, round(r.total_price, 2))
        for r in _q(spark, "ivm_status_totals").collect()
    }
    applied = {
        r.o_orderstatus: (r.n_orders, round(r.total_price, 2))
        for r in _q(spark, "cdc_apply_changes")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_price"),
        )
        .collect()
    }
    assert ivm == applied and len(ivm) > 0


def test_markov_rows_are_conditional_distributions(spark):
    rows = _q(spark, "events_markov_transitions").collect()
    assert rows
    from collections import defaultdict

    by_from = defaultdict(list)
    for r in rows:
        by_from[r.from_type].append(r)
    for ft, rs in by_from.items():
        n_out = rs[0].n_out
        assert all(r.n_out == n_out for r in rs)
        assert sum(r.n for r in rs) == n_out, ft
        assert abs(sum(r.p for r in rs) - 1.0) < 5e-6 * len(rs) + 1e-9, ft


def test_windowed_funnel_is_monotone(spark):
    r = _q(spark, "funnel_windowed_7d").collect()[0]
    assert r.n_signup >= r.n_click_7d >= r.n_purchase_7d >= 0
    if r.n_signup:
        assert abs(r.rate_overall - round(r.n_purchase_7d / r.n_signup, 6)) < 1e-9


def test_association_rules_are_bounded(spark):
    rows = _q(spark, "copurchase_association_rules").collect()
    assert rows
    ranks = sorted(r.rk for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.s_ab <= min(r.s_a, r.s_b)
        assert 0.0 < r.confidence_ab <= 1.0
        assert r.lift > 0.0


def test_backlog_timeline_conserves_orders(spark):
    """Sweep-line algebra: total opened == total closed == order count
    (every order closes), and the running balance never goes negative
    and ends at zero."""
    rows = sorted(_q(spark, "orders_backlog_timeline").collect(), key=lambda r: r.day)
    from collect_mobile_devices_datalake_spark.session import load_table

    # population = orders WITH lineitems (an order with no lines has no
    # close date and is correctly absent from the timeline)
    o = load_table(spark, "orders", SF)
    li = load_table(spark, "lineitem", SF).select("l_orderkey").distinct()
    total = o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").count()
    assert sum(r.opened for r in rows) == total
    assert sum(r.closed for r in rows) == total
    assert all(r.n_open >= 0 for r in rows)
    assert rows[-1].n_open == 0


def test_kmv_exact_column_matches_independent_distinct_count(spark):
    """kmv_vocab_distinct's calibration column equals an independently
    computed per-source distinct token-hash count (hash collisions
    conflate identically on both paths), and the estimator is exact
    whenever the sketch is not full."""
    from collect_mobile_devices_datalake_spark.operators.sketches import (
        K,
        _source_token_hashes,
    )
    from collect_mobile_devices_datalake_spark.registry import REGISTRY

    rows = {r["source"]: r for r in REGISTRY["kmv_vocab_distinct"].spark(spark, SF).collect()}
    indep = {
        r["source"]: r["n"]
        for r in _source_token_hashes(spark, SF)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(rows) == set(indep)
    for src, r in rows.items():
        assert r["n_exact"] == indep[src]
        if r["n_exact"] < K:
            assert r["est_distinct"] == r["n_exact"]


def test_mined_hard_negatives_never_beat_the_global_top1(spark):
    """A query's best cross-label neighbor cannot be more similar than
    its best unrestricted neighbor: hard_negative_mining rank-1 cosine
    <= knn_bruteforce rank-1 cosine, per query."""
    from collect_mobile_devices_datalake_spark.registry import REGISTRY

    hn = {
        r["query_id"]: r["cosine"]
        for r in REGISTRY["hard_negative_mining"].spark(spark, SF).collect()
        if r["rk"] == 1
    }
    bf = {
        r["query_id"]: r["cosine"]
        for r in REGISTRY["knn_bruteforce"].spark(spark, SF).collect()
        if r["rk"] == 1
    }
    assert set(hn) == set(bf) and hn
    for q in hn:
        assert hn[q] <= bf[q] + 1e-9


def test_weekly_dau_bounded_by_sum_of_daily(spark):
    """Distinct users in a week <= sum of that week's daily distincts
    (set union vs multiset sum), and >= the max single day."""
    from collections import defaultdict

    from collect_mobile_devices_datalake_spark.registry import REGISTRY

    daily = REGISTRY["kmv_daily_active_users"].spark(spark, SF).collect()
    weekly = {r["week"]: r["n_exact"] for r in REGISTRY["kmv_weekly_from_daily"].spark(spark, SF).collect()}
    by_week = defaultdict(list)
    # recompute each day's week bucket the same way the op does
    import datetime

    for r in daily:
        day = r["day"]
        week = day - datetime.timedelta(days=day.weekday())
        by_week[week].append(r["n_exact"])
    assert set(weekly) == set(by_week)
    for w, days in by_week.items():
        assert max(days) <= weekly[w] <= sum(days)


def test_golden_record_survivorship_vs_window_reference(spark):
    # Oracle-independent check: the packed-key max_by must pick exactly
    # the row a window over (prio DESC, ts DESC, event_id DESC) picks.
    from pyspark.sql.window import Window

    from collect_mobile_devices_datalake_spark.session import load_table

    got = {
        (r.user_id): (r.golden_event_id, r.golden_type, r.n_events)
        for r in _q(spark, "golden_record_survivorship").collect()
    }
    e = load_table(spark, "events", SF)
    prio = (
        F.when(F.col("event_type") == "purchase", 5)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "click", 3)
        .when(F.col("event_type") == "view", 2)
        .otherwise(1)
    )
    w = Window.partitionBy("user_id").orderBy(
        prio.desc(), F.col("ts").desc(), F.col("event_id").desc()
    )
    ref = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
        .collect()
    )
    counts = {r.user_id: r.n for r in e.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert got == {
        r.user_id: (r.event_id, r.event_type, counts[r.user_id]) for r in ref
    }


def test_golden_record_survivorship_plan_has_no_window(spark):
    # The 100 TB contract: ONE hash aggregation with partial max_by, no
    # per-user sort.
    from collect_mobile_devices_datalake_spark.plans.explain import formatted_plan

    plan = formatted_plan(_q(spark, "golden_record_survivorship"))
    assert "Window" not in plan
    assert "partial_max_by" in plan or "HashAggregate" in plan


def test_unigram_corpus_encoding_conserves_type_table_segments(spark):
    """Conservation law tying the apply op to the learn op: the corpus
    total of per-doc segment counts must equal sum(freq * nseg) over the
    word-TYPE segmentation (capped words only, both sides) — or the
    broadcast dictionary join is dropping/duplicating occurrences."""
    seg = _q(spark, "unigram_lm_segmentation").select("word", "freq", "n_segments")
    want = seg.agg(
        F.sum(F.col("freq") * F.col("n_segments")).cast("long")
    ).collect()[0][0]
    enc = _q(spark, "unigram_corpus_encoding")
    got = enc.agg(F.sum("n_segments").cast("long")).collect()[0][0]
    assert got == want
    # and the word accounting closes: capped words counted per doc must
    # sum to the type table's total frequency
    n_words = enc.agg(F.sum("n_words").cast("long")).collect()[0][0]
    total_freq = seg.agg(F.sum("freq").cast("long")).collect()[0][0]
    assert n_words == total_freq


def test_band_sweep_production_config_matches_lsh_pairs(spark):
    """The tuner's (4,4) row is the production banding — its candidate
    count must equal dedup_minhash_lsh_pairs exactly (same signatures,
    same banding, same bucket join)."""
    n_pairs = _q(spark, "dedup_minhash_lsh_pairs").count()
    row = {
        (r["bands"], r["rows_per_band"]): r["n_candidates"]
        for r in _q(spark, "minhash_band_sweep").collect()
    }
    assert row[(4, 4)] == n_pairs


def test_ivf_sweep_widest_config_matches_ivf_probe(spark):
    """The sweep's nprobe=5 point IS knn_ivf_probe's operating point —
    its hit count must equal the probe op's top-10 intersection with the
    exact baseline, or the prk-annotated single-join expansion is not
    faithful to the per-config probe."""
    probe = {
        (r["query_id"], r["neighbor_id"])
        for r in _q(spark, "knn_ivf_probe").collect()
    }
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in _q(spark, "knn_bruteforce").collect()
    }
    want = len(probe & exact)
    sweep = {r["nprobe"]: r["n_hits"] for r in _q(spark, "ivf_probe_sweep").collect()}
    assert sweep[5] == want
    # recall is monotone in nprobe (candidate sets are nested)
    assert sweep[1] <= sweep[3] <= sweep[5]


def test_paragraph_clean_matches_independent_python_recompute(spark):
    """Full oracle-independent recompute of paragraph_dedup_clean in plain
    Python: split every doc into 8-word segments, keep each distinct
    paragraph only at its global first occurrence ordered by
    (doc_id, par_idx), reassemble — every output column must match
    exactly, and the cleaned text is by construction a subset of the
    original's paragraphs in order (the containment invariant vs
    dup_substring_profile's source text)."""
    from collect_mobile_devices_datalake_spark.session import load_table

    out = {r["doc_id"]: r for r in _q(spark, "paragraph_dedup_clean").collect()}
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, "documents", SF).collect()
    }
    assert set(out) == set(texts)
    pars = {
        doc_id: [
            " ".join(ws[i : i + 8])
            for ws in [t.strip().split()]
            for i in range(0, len(ws), 8)
        ]
        for doc_id, t in texts.items()
    }
    seen: set[str] = set()
    want: dict[int, tuple[str, int, int]] = {}
    for doc_id in sorted(pars):
        kept = []
        for p in pars[doc_id]:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        want[doc_id] = (
            " ".join(kept),
            len(pars[doc_id]),
            len(pars[doc_id]) - len(kept),
        )
    total_removed = 0
    for doc_id, r in out.items():
        assert (r["clean_text"], r["n_pars"], r["n_pars_removed"]) == want[doc_id], doc_id
        total_removed += r["n_pars_removed"]
    # the fixture corpus has cross-doc duplicated 8-word windows (the
    # dup_substring family exists because of them) — some removal happens
    assert total_removed > 0


def test_nsw_sweep_widest_budget_matches_nsw_probe(spark):
    """The sweep's widest point (budget = NSW_M) IS knn_nsw_probe's
    operating point — its per-query top-10 set must equal the probe op's
    output exactly, and pooled recall is monotone in the budget (nested
    candidate sets)."""
    from collect_mobile_devices_datalake_spark.operators.similarity import NSW_M

    probe = {
        (r["query_id"], r["neighbor_id"])
        for r in _q(spark, "knn_nsw_probe").collect()
    }
    rows = _q(spark, "nsw_probe_sweep").collect()
    sweep = {r["budget"]: r for r in rows}
    assert sweep[NSW_M]["n_hits"] == sweep[NSW_M]["n_pooled"] == len(probe)
    recalls = [sweep[b]["pooled_recall_micro"] for b in sorted(sweep)]
    assert recalls == sorted(recalls)
    assert sweep[NSW_M]["pooled_recall_micro"] == 1_000_000


def test_paragraph_profile_matches_recompute_and_clean(spark):
    """paragraph_dup_profile vs a full Python recompute, plus consistency
    with paragraph_dedup_clean: identical segmentation (n_pars equal per
    doc), and every doc that loses a paragraph to the corpus-wide
    keep-first either shares a paragraph with another doc or repeats one
    internally."""
    from collect_mobile_devices_datalake_spark.session import load_table

    prof = {r["doc_id"]: r for r in _q(spark, "paragraph_dup_profile").collect()}
    clean = {r["doc_id"]: r for r in _q(spark, "paragraph_dedup_clean").collect()}
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, "documents", SF).collect()
    }
    pars = {
        doc_id: [
            " ".join(ws[i : i + 8])
            for ws in [t.strip().split()]
            for i in range(0, len(ws), 8)
        ]
        for doc_id, t in texts.items()
    }
    doc_sets = {d: set(ps) for d, ps in pars.items()}
    assert set(prof) == set(texts)
    for doc_id, r in prof.items():
        mine = pars[doc_id]
        others = set().union(
            *(doc_sets[d] for d in doc_sets if d != doc_id)
        )
        n_shared = sum(1 for p in mine if p in others)
        assert r["n_pars"] == len(mine) == clean[doc_id]["n_pars"]
        assert r["n_shared_pars"] == n_shared
        assert r["shared_frac"] == round(n_shared / len(mine), 6)
        if clean[doc_id]["n_pars_removed"] > 0:
            assert n_shared > 0 or len(set(mine)) < len(mine), doc_id


def test_phash_clusters_consistent_with_pairs(spark):
    """media_phash_clusters must be the transitive closure of the exact
    phash pair graph: both endpoints of every pair carry the same
    cluster_id, every cluster_id is the component's lowest member, and
    no singleton appears."""
    pairs = [
        (r["media_a"], r["media_b"])
        for r in _q(spark, "media_phash_near_dup").collect()
    ]
    labels = {
        r["media_id"]: r["cluster_id"]
        for r in _q(spark, "media_phash_clusters").collect()
    }
    nodes = {n for p in pairs for n in p}
    assert set(labels) == nodes
    for a, b in pairs:
        assert labels[a] == labels[b]
    for cid in set(labels.values()):
        members = [m for m, c in labels.items() if c == cid]
        assert cid == min(members)


def test_fertility_report_consistent_with_per_doc_encodings(spark):
    """tokenizer_fertility_report's per-source sums must equal the
    independent per-doc encodings aggregated by hand, and each fertility
    column must be the rounded ratio of its own exact integers."""
    from collect_mobile_devices_datalake_spark.session import load_table

    rep = {
        r.source: r
        for r in REGISTRY["tokenizer_fertility_report"].spark(spark, SF).collect()
    }
    src = {
        r.doc_id: r.source
        for r in load_table(spark, "documents", SF).select("doc_id", "source").collect()
    }
    bpe = REGISTRY["bpe_corpus_encoding"].spark(spark, SF).collect()
    agg: dict[str, dict[str, int]] = {}
    for r in bpe:
        a = agg.setdefault(src[r.doc_id], {"n_words": 0, "bpe": 0, "docs": 0})
        a["n_words"] += r.n_words
        a["bpe"] += r.n_bpe_tokens
        a["docs"] += 1
    assert set(rep) == set(agg)
    for s, a in agg.items():
        assert rep[s].n_docs == a["docs"]
        assert rep[s].n_words == a["n_words"]
        assert rep[s].bpe_tokens == a["bpe"]
        assert rep[s].bpe_fertility == round(a["bpe"] / a["n_words"], 6)
        # serving tokenization can only split as fine as characters and
        # no coarser than one token per word
        assert rep[s].n_words <= rep[s].mm_tokens
        assert rep[s].wp_fertility >= 1.0 and rep[s].mm_fertility >= 1.0


def test_watermark_sweep_matches_naive_simulation(spark):
    """watermark_lateness_sweep's two-phase prefix scan must equal the
    naive single-pass simulation: replay arrivals in order, track the
    running max event time, and count drops per threshold by hand."""
    from collect_mobile_devices_datalake_spark.operators.streaming_batch import (
        _WM_DELAY_MOD,
        _WM_MULT,
        _WM_P,
        _WM_SWEEP,
    )
    from collect_mobile_devices_datalake_spark.session import load_table

    rows = (
        load_table(spark, "events", SF)
        .select("event_id", F.unix_timestamp("ts").alias("eps"))
        .collect()
    )
    evs = sorted(
        (
            (r.eps + (r.event_id * _WM_MULT) % _WM_P % _WM_DELAY_MOD, r.event_id, r.eps)
            for r in rows
        ),
    )
    wm = -(1 << 62)
    late = []
    for _arr, _eid, eps in evs:
        wm = max(wm, eps)
        late.append((wm - eps, eps // 3600))
    want = {}
    for w in _WM_SWEEP:
        d = [(ls, win) for ls, win in late if ls > w]
        want[w] = (
            len(late),
            len(d),
            round(len(d) / len(late), 6),
            len({win for _, win in d}),
            max((ls for ls, _ in d), default=None),
        )
    got = {
        r.allowed_lateness_s: (
            r.n_events,
            r.n_dropped,
            r.dropped_frac,
            r.n_windows_losing,
            r.max_dropped_late_s,
        )
        for r in REGISTRY["watermark_lateness_sweep"].spark(spark, SF).collect()
    }
    assert got == want
    # the sweep must be monotone: a larger allowance never drops more
    drops = [got[w][1] for w in _WM_SWEEP]
    assert drops == sorted(drops, reverse=True)
    # the largest candidate covers the synthetic delay bound exactly
    assert got[_WM_SWEEP[-1]][1] == 0


def test_vocab_sweep_endpoints_pin_to_serving_op_and_alphabet_floor(spark):
    """wp_vocab_size_sweep's largest budget must reproduce
    wordpiece_maxmunch_encoding's corpus totals exactly (same vocab,
    same greedy walk), and the k=0 floor must be character-level
    (fertility = chars/word, token length 1)."""
    from collect_mobile_devices_datalake_spark.operators.tokenizer import (
        WP_MERGES,
        WP_VOCAB_SWEEP,
    )

    sweep = {
        r.vocab_merges: r
        for r in REGISTRY["wp_vocab_size_sweep"].spark(spark, SF).collect()
    }
    assert set(sweep) == set(WP_VOCAB_SWEEP)

    mm = REGISTRY["wordpiece_maxmunch_encoding"].spark(spark, SF).collect()
    want_tokens = sum(r.n_tokens * r.freq for r in mm)
    want_words = sum(r.freq for r in mm)
    want_chars = sum(r.n_chars * r.freq for r in mm)
    top = sweep[WP_MERGES]
    assert top.total_tokens == want_tokens
    assert top.n_words == want_words and top.n_chars == want_chars

    floor = sweep[0]
    assert floor.total_tokens == floor.n_chars
    assert floor.avg_token_len == 1.0
    # fertility strictly improves as the budget grows (every merge the
    # learner picked occurs in this corpus)
    toks = [sweep[k].total_tokens for k in sorted(sweep)]
    assert toks == sorted(toks, reverse=True)
    sizes = [sweep[k].vocab_size for k in sorted(sweep)]
    assert sizes == sorted(sizes)


def test_ann_ndcg_matches_hand_recompute_and_recall_hits(spark):
    """ann_ndcg_report must equal a by-hand nDCG computed from the
    registered probe outputs against the brute-force baseline, and its
    total hit mass must agree with ann_methods_recall's n_hits."""
    from collect_mobile_devices_datalake_spark.operators.similarity import (
        _NDCG_IDEAL,
        _NDCG_W,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["knn_bruteforce"].spark(spark, SF).collect()
    }
    panel = sorted({q for q, _ in exact})
    got = {
        r.method: r for r in REGISTRY["ann_ndcg_report"].spark(spark, SF).collect()
    }
    recall = {
        r.method: r.n_hits
        for r in REGISTRY["ann_methods_recall"].spark(spark, SF).collect()
    }
    probes = {
        "lsh_multiprobe": "knn_lsh_probe",
        "ivf_kmeans": "knn_ivf_kmeans_probe",
        "ivf_pq": "knn_ivfpq_probe",
        "nsw_graph": "knn_nsw_probe",
    }
    for method, key in probes.items():
        rows = REGISTRY[key].spark(spark, SF).collect()
        dcg = {}
        n_hits = 0
        for r in rows:
            if (r.query_id, r.neighbor_id) in exact:
                dcg[r.query_id] = dcg.get(r.query_id, 0) + _NDCG_W[r.rk - 1]
                n_hits += 1
        ndcgs = [(1_000_000 * dcg.get(q, 0)) // _NDCG_IDEAL for q in panel]
        g = got[method]
        assert g.n_queries == len(panel)
        assert g.mean_ndcg_micro == sum(ndcgs) // len(panel)
        assert g.min_ndcg_micro == min(ndcgs)
        assert g.n_perfect == sum(1 for v in ndcgs if v == 1_000_000)
        assert recall[method] == n_hits
        assert 0 <= g.mean_ndcg_micro <= 1_000_000


def test_context_sweep_monotone_and_consistent_with_packer(spark):
    """context_length_sweep: losses shrink monotonically with budget,
    token totals equal doc_context_packing's corpus mass, and the
    per-budget columns obey their own arithmetic identities."""
    rows = {
        r.max_len: r
        for r in REGISTRY["context_length_sweep"].spark(spark, SF).collect()
    }
    budgets = sorted(rows)
    packed_total = sum(
        r.n_tokens for r in REGISTRY["doc_context_packing"].spark(spark, SF).collect()
    )
    losses = [rows[b].tokens_lost for b in budgets]
    assert losses == sorted(losses, reverse=True)
    truncs = [rows[b].n_truncated for b in budgets]
    assert truncs == sorted(truncs, reverse=True)
    from decimal import ROUND_HALF_UP, Decimal

    def r6(num: int, den: int) -> float:
        # Spark/DuckDB round() is HALF_UP on the double quotient; for an
        # exact-decimal quotient (e.g. 24142/32000 = 0.7544375) Python's
        # round() banker's-rounds the other way — replicate HALF_UP
        return float(
            (Decimal(num) / Decimal(den)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )

    for b in budgets:
        r = rows[b]
        assert r.tokens_total == packed_total
        assert abs(r.frac_lost - r6(r.tokens_lost, r.tokens_total)) < 1e-9
        # kept mass fits the sequence budget exactly
        assert r.tokens_total - r.tokens_lost <= r.n_seqs * b
        assert abs(
            r.pad_free_fill - r6(r.tokens_total - r.tokens_lost, r.n_seqs * b)
        ) < 1e-9


def test_simhash_band_pairs_are_exact_through_threshold(spark):
    """simhash_band_near_dup must equal the full quadratic recompute:
    every pair at Hamming <= T present (pigeonhole completeness through
    T = bands-1), nothing beyond T, and the reported distances exact."""
    import itertools

    from collect_mobile_devices_datalake_spark.operators.dedup import (
        SIMHASH_F,
        SIMHASH_T,
        simhash_fingerprints,
    )
    from collect_mobile_devices_datalake_spark.session import load_table

    hs = {
        r.doc_id: r.simhash
        for r in simhash_fingerprints(
            load_table(spark, "documents", SF), SIMHASH_F
        ).collect()
    }
    want = {}
    for a, b in itertools.combinations(sorted(hs), 2):
        h = bin(hs[a] ^ hs[b]).count("1")
        if h <= SIMHASH_T:
            want[(a, b)] = h
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in REGISTRY["simhash_band_near_dup"].spark(spark, SF).collect()
    }
    assert got == want and len(want) > 0


def test_hybrid_ndcg_matches_hand_recompute(spark):
    """hybrid_search_ndcg must equal a by-hand nDCG from the two
    registered RRF outputs (exact twin defines relevance; indexed twin
    supplies the ranking)."""
    from collect_mobile_devices_datalake_spark.operators.similarity import (
        _NDCG_IDEAL,
        _NDCG_W,
    )

    exact = {
        (r.query_id, r.doc_id)
        for r in REGISTRY["hybrid_search_rrf"].spark(spark, SF).collect()
    }
    panel = sorted({q for q, _ in exact})
    dcg: dict[int, int] = {}
    for r in REGISTRY["hybrid_search_rrf_indexed"].spark(spark, SF).collect():
        if (r.query_id, r.doc_id) in exact:
            dcg[r.query_id] = dcg.get(r.query_id, 0) + _NDCG_W[r.rk - 1]
    ndcgs = [(1_000_000 * dcg.get(q, 0)) // _NDCG_IDEAL for q in panel]
    got = REGISTRY["hybrid_search_ndcg"].spark(spark, SF).collect()[0]
    assert got.n_queries == len(panel)
    assert got.mean_ndcg_micro == sum(ndcgs) // len(panel)
    assert got.min_ndcg_micro == min(ndcgs)
    assert got.n_perfect == sum(1 for v in ndcgs if v == 1_000_000)
