"""Semantic invariants for the hybrid-retrieval / embedding-eval family.

Cross-engine value parity is covered by test_oracle_parity; these tests
pin properties parity can't see: internal score consistency, recall
bounds, and set-algebra sanity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from collect_mobile_devices_datalake_spark.operators.retrieval import (
    FUSE_TOPK,
    LEG_TOPN,
    RRF_K,
    RRF_SCALE,
    TRUNC_DIMS,
    q_embedding_truncation_recall,
    q_hybrid_search_rrf,
    q_source_vocab_overlap,
)

from .conftest import SF_SMOKE


def test_rrf_score_is_exact_sum_of_leg_contributions(spark):
    rows = q_hybrid_search_rrf(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r.rk <= FUSE_TOPK
        assert 0 <= r.lex_rank <= LEG_TOPN
        assert 0 <= r.vec_rank <= LEG_TOPN
        expect = (RRF_SCALE // (RRF_K + r.lex_rank) if r.lex_rank else 0) + (
            RRF_SCALE // (RRF_K + r.vec_rank) if r.vec_rank else 0
        )
        assert r.rrf_score == expect, r
        # a fused hit must come from at least one leg
        assert r.lex_rank or r.vec_rank


def test_rrf_never_returns_the_query_itself(spark):
    df = q_hybrid_search_rrf(spark, SF_SMOKE)
    assert df.filter(F.col("doc_id") == F.col("query_id")).count() == 0


def test_truncation_recall_full_dim_is_one(spark):
    rows = {r.dim: r for r in q_embedding_truncation_recall(spark, SF_SMOKE).collect()}
    assert set(rows) == set(TRUNC_DIMS)
    full = rows[max(TRUNC_DIMS)]
    assert full.hits == full.n_baseline
    assert full.recall == 1.0
    for r in rows.values():
        assert 0 <= r.hits <= r.n_baseline


def test_vocab_overlap_is_valid_jaccard(spark):
    rows = q_source_vocab_overlap(spark, SF_SMOKE).collect()
    assert rows
    n_sources = len({r.source_a for r in rows} | {r.source_b for r in rows})
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        assert r.source_a < r.source_b
        assert r.n_common <= min(r.n_a, r.n_b)
        assert 0.0 < r.jaccard <= 1.0
        denom = r.n_a + r.n_b - r.n_common
        assert abs(r.jaccard - r.n_common / denom) < 1e-6


def test_mmr_rerank_diversifies(spark):
    """Structural MMR properties the oracle can't express: rank-1 is the
    relevance argmax (= brute-force top-1), picks are distinct, penalized
    scores are non-increasing, and the diversified set actually departs
    from the plain top-5 somewhere (the corpus plants near-dup vectors,
    so pure-relevance top-5 contains redundancy MMR must displace)."""
    from collections import defaultdict

    from collect_mobile_devices_datalake_spark.operators.retrieval import (
        MMR_K,
        q_knn_mmr_rerank,
    )
    from collect_mobile_devices_datalake_spark.operators.similarity import (
        q_knn_bruteforce,
    )

    mmr = q_knn_mmr_rerank(spark, SF_SMOKE).collect()
    by_q = defaultdict(list)
    for r in sorted(mmr, key=lambda r: (r.query_id, r.rank)):
        by_q[r.query_id].append(r)

    bf = q_knn_bruteforce(spark, SF_SMOKE).collect()
    top1 = {r.query_id: r.neighbor_id for r in bf if r.rk == 1}
    top5 = defaultdict(set)
    for r in bf:
        if r.rk <= MMR_K:
            top5[r.query_id].add(r.neighbor_id)

    assert set(by_q) == set(top1)
    for qid, rows in by_q.items():
        assert [r.rank for r in rows] == list(range(1, MMR_K + 1))
        assert len({r.neighbor_id for r in rows}) == MMR_K
        assert rows[0].neighbor_id == top1[qid]
        penalized = [r.mmr_score for r in rows[1:]]
        assert penalized == sorted(penalized, reverse=True)
    assert any({r.neighbor_id for r in rows} != top5[qid] for qid, rows in by_q.items())


def test_hard_negatives_are_cross_label_and_harder_than_random(spark):
    """Every mined negative has a different label than its anchor, and
    the mined set's mean cosine strictly exceeds the all-cross-label
    mean (the 'hard' in hard negatives)."""
    from collect_mobile_devices_datalake_spark.operators.retrieval import (
        HN_TOPK,
        q_hard_negative_mining,
    )

    rows = q_hard_negative_mining(spark, SF_SMOKE).collect()
    assert rows
    per_q = {}
    for r in rows:
        assert r.anchor_label != r.negative_label
        per_q.setdefault(r.query_id, []).append(r)
    assert all(len(v) == HN_TOPK for v in per_q.values())

    from collect_mobile_devices_datalake_spark.functions.vectors import (
        cosine_similarity,
    )
    from collect_mobile_devices_datalake_spark.session import load_table

    emb = load_table(spark, "embeddings", SF_SMOKE)
    a = emb.select(F.col("vec_id").alias("qid"), F.col("label").alias("ql"),
                   F.col("embedding").alias("qv")).filter(F.col("qid") % 25 == 0)
    pairs = a.join(emb, (F.col("vec_id") != F.col("qid")) & (F.col("label") != F.col("ql")))
    mean_all = pairs.select(F.avg(cosine_similarity("qv", "embedding"))).first()[0]
    mean_mined = sum(r.cosine for r in rows) / len(rows)
    assert mean_mined > mean_all


def test_kcenter_radius_curve_and_diversity(spark):
    """Gonzalez invariants: covering radii are non-increasing from round
    2 on, centers are distinct, and each selected center is at least its
    recorded radius away from every EARLIER center (it was the farthest
    point when picked)."""
    from collect_mobile_devices_datalake_spark.operators.retrieval import (
        KCENTER_K,
        q_kcenter_coreset,
    )
    from collect_mobile_devices_datalake_spark.functions.vectors import (
        cosine_similarity,
    )
    from collect_mobile_devices_datalake_spark.session import load_table

    rows = sorted(q_kcenter_coreset(spark, SF_SMOKE).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, KCENTER_K + 1))
    assert len({r.vec_id for r in rows}) == KCENTER_K
    radii = [r.radius for r in rows[1:]]
    assert radii == sorted(radii, reverse=True)
    assert radii[-1] > 0

    emb = {r["vec_id"]: r["embedding"] for r in load_table(spark, "embeddings", SF_SMOKE)
           .filter(F.col("vec_id").isin([r.vec_id for r in rows])).collect()}

    import math

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        return 0.0 if den == 0 else num / den

    for i, r in enumerate(rows[1:], start=1):
        d_near = min(1.0 - cos(emb[r.vec_id], emb[p.vec_id]) for p in rows[:i])
        assert d_near >= r.radius - 1e-6


def test_mmr_selection_composes_with_an_ann_shortlist(spark):
    """The swap-in seam, exercised: feed mmr_select the LSH-probe
    shortlist instead of the brute-force one. The selection invariants
    (rank-1 = shortlist relevance argmax, k distinct picks within the
    shortlist, monotone penalized scores) hold regardless of generator."""
    from collections import defaultdict

    from collect_mobile_devices_datalake_spark.functions.vectors import (
        dot_product,
        l2_norm,
    )
    from collect_mobile_devices_datalake_spark.operators.retrieval import (
        MMR_K,
        mmr_select,
    )
    from collect_mobile_devices_datalake_spark.registry import REGISTRY
    from collect_mobile_devices_datalake_spark.session import load_table

    lsh = REGISTRY["knn_lsh_probe"].spark(spark, SF_SMOKE)
    cand = lsh.select(
        "query_id", F.col("neighbor_id").alias("cid"), F.col("cosine").alias("rel")
    ).localCheckpoint(eager=True)

    emb = load_table(spark, "embeddings", SF_SMOKE).select(
        "vec_id", "embedding", l2_norm("embedding").alias("nrm")
    )
    ce = cand.join(emb, cand.cid == emb.vec_id).select(
        "query_id", "cid", "embedding", "nrm"
    )
    a, b = ce.alias("a"), ce.alias("b")
    pair_cos = F.when(F.col("a.nrm") * F.col("b.nrm") == 0, F.lit(0.0)).otherwise(
        dot_product(F.col("a.embedding"), F.col("b.embedding"))
        / (F.col("a.nrm") * F.col("b.nrm"))
    )
    sims = (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.cid") != F.col("b.cid")),
        )
        .select(
            F.col("a.query_id").alias("query_id"),
            F.col("a.cid").alias("ca"),
            F.col("b.cid").alias("cb"),
            pair_cos.alias("sim"),
        )
        .localCheckpoint(eager=True)
    )

    sel = mmr_select(spark, cand, sims).collect()
    shortlist = defaultdict(set)
    best = {}
    for r in cand.collect():
        shortlist[r["query_id"]].add(r["cid"])
        if r["query_id"] not in best or (r["rel"], -r["cid"]) > (
            best[r["query_id"]][0],
            -best[r["query_id"]][1],
        ):
            best[r["query_id"]] = (r["rel"], r["cid"])
    by_q = defaultdict(list)
    for r in sorted(sel, key=lambda r: (r["query_id"], r["rank"])):
        by_q[r["query_id"]].append(r)
    assert by_q
    for qid, rows in by_q.items():
        assert [r["rank"] for r in rows] == list(range(1, MMR_K + 1))
        picks = [r["cid"] for r in rows]
        assert len(set(picks)) == MMR_K
        assert set(picks) <= shortlist[qid]
        assert rows[0]["cid"] == best[qid][1]
        pen = [r["score"] for r in rows[1:]]
        assert pen == sorted(pen, reverse=True)


def test_bm25_shape_and_invariants(spark):
    """Every query doc gets a dense 1..k ranking, never itself; scores
    are positive and non-increasing down each ranking."""
    from collect_mobile_devices_datalake_spark.operators.retrieval import (
        BM25_TOPK,
        QUERY_MOD,
        q_bm25_search,
    )

    out = q_bm25_search(spark, SF_SMOKE).collect()
    by_q = {}
    for r in out:
        assert r.query_id % QUERY_MOD == 0
        assert r.doc_id != r.query_id
        assert r.bm25_score > 0
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rk)
        assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= BM25_TOPK
        scores = [r.bm25_score for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_jl_sign_matrix_mixes():
    """The square in the JL sign hash is load-bearing: any purely linear
    index hash maps the dense (i, j) grid to constant-stride progressions
    mod M whose parity stays column-correlated (agreement up to ~0.94
    measured), collapsing the projection to effective rank ~2. Pin the
    mixing: pairwise column agreement must sit in the binomial-noise band
    around 0.5, and the overall +1 fraction near 0.5."""
    import itertools

    from collect_mobile_devices_datalake_spark.operators.retrieval import (
        _JL_C1,
        _JL_C2,
        _JL_D,
        _JL_MOD,
    )

    def sign(i: int, j: int) -> int:
        u = (i * _JL_C2 + j * _JL_C1 + 12345) % _JL_MOD
        return (u * u) % _JL_MOD % 2

    agrees = []
    for j1, j2 in itertools.combinations(range(16), 2):
        agrees.append(
            sum(sign(i, j1) == sign(i, j2) for i in range(_JL_D)) / _JL_D
        )
    # binomial(64, 0.5) 4-sigma band
    assert all(0.25 <= a <= 0.75 for a in agrees), (min(agrees), max(agrees))
    total = sum(sign(i, j) for i in range(_JL_D) for j in range(32)) / (_JL_D * 32)
    assert 0.45 <= total <= 0.55


def test_jl_recall_monotone_in_dim(spark):
    """More projected dimensions should not systematically hurt. Random-
    projection recall is NOT theoretically monotone in the projected
    dimension (a single fixture can invert adjacent dims by chance), so
    assert the trend, not strict order: each step may dip by at most a
    small tolerance, and the largest dim must clearly beat the smallest
    (a broken sign matrix or fold flattens or inverts the whole sweep)."""
    from collect_mobile_devices_datalake_spark.registry import REGISTRY

    from .conftest import SF_ORACLE

    rows = REGISTRY["jl_projection_recall"].spark(spark, SF_ORACLE).collect()
    rec = [r.recall for r in sorted(rows, key=lambda r: r.dim)]
    eps = 0.05
    assert all(b >= a - eps for a, b in zip(rec, rec[1:])), rec
    assert rec[-1] >= rec[0] + 0.10, rec
