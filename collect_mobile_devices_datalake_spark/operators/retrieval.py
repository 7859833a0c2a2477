"""Hybrid retrieval and embedding-evaluation operators (north-star M5).

The missing third leg of the ANN family: production LLM-data retrieval
is rarely vector-only — candidates come from a LEXICAL inverted index
and a VECTOR index, fused by reciprocal-rank fusion (RRF). This module
adds that fusion as a first-class query, plus two evaluation operators
(Matryoshka-style truncation recall, cross-source vocabulary overlap)
that a curation pipeline runs to pick index/embedding parameters.

Scale notes (100 TB):
- the lexical leg is a token-partitioned inverted-index join — the
  standard shape; the df cut (drop tokens present in > x% of docs)
  bounds the posting-list blowup and is the documented knob;
- the vector leg here is the exact brute-force scorer (the corpus at
  test SF is the query set's candidate pool); at scale the leg swaps
  for ``knn_lsh_probe``/``knn_nsw_probe`` over the persisted index —
  fusion is rank-based, so legs are interchangeable;
- RRF contributions are INTEGER (1e12 div (k + rank)) so the fused
  score is an order-independent BIGINT sum — bit-stable across
  engines, partitionings, and re-runs (no float accumulation).

Reference lineage: the reference app has no retrieval surface (app.js
is a crawler); this family is part of the LLM-training-pipeline
extension mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens, word_ngrams
from ..functions.vectors import dot_product, l2_norm
from ..registry import register
from ..session import fan_out, load_table, scoped_shuffle_width

# The composed-oracle helpers below (_knn_class_oracle,
# _semantic_cluster_oracle) read REGISTRY["knn_bruteforce"] /
# ["embedding_near_dup_pairs"] at decoration time, so the module that
# registers them must already be imported — make that explicit instead
# of relying on registry._ensure_loaded()'s import order, so
# ``import ...operators.retrieval`` works standalone (e.g. a test file
# collected in isolation).
from . import similarity as _similarity  # noqa: F401  (registers knn_* + near-dup keys)

# Single-sourced from similarity so the hybrid kernels' lexical/vector
# legs and every oracle in this module can never select different query
# sets (the r9-advice coupling, resolved by removing the duplicate
# rather than asserting equality).
QUERY_MOD = _similarity.QUERY_MOD  # doc_id % 25 == 0 → 20 query docs / 500 rows
RRF_K = 60  # the standard RRF damping constant
RRF_SCALE = 1_000_000_000_000  # integer contribution = SCALE div (K + rank)
LEG_TOPN = 20  # per-leg shortlist depth fed into fusion
FUSE_TOPK = 10  # fused results surfaced per query

_TOKENS_SQL = "string_split_regex(trim(text), '\\s+')"

# lexical-leg CTE chain shared verbatim by _RRF_ORACLE and
# _RRF_INDEXED_ORACLE (same leg, same shortlist depth)
_LEX_CTES = f"""tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM (
    SELECT doc_id, unnest({_TOKENS_SQL}) AS word FROM documents
  ) GROUP BY doc_id, word
),
lex_scored AS (
  SELECT q.doc_id AS query_id, d.doc_id AS doc_id,
         SUM(q.tf * d.tf) AS lex_score
  FROM tf q JOIN tf d USING (word)
  WHERE q.doc_id % {QUERY_MOD} = 0 AND d.doc_id <> q.doc_id
  GROUP BY 1, 2
),
lex AS (
  SELECT query_id, doc_id, rk AS lex_rk FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY lex_score DESC, doc_id) AS rk
    FROM lex_scored
  ) WHERE rk <= {LEG_TOPN}
)"""

# RRF fusion + final cut, shared verbatim by both hybrid oracles
_FUSE_SQL = f"""fused AS (
  SELECT COALESCE(l.query_id, v.query_id) AS query_id,
         COALESCE(l.doc_id, v.doc_id) AS doc_id,
         CAST(COALESCE(l.lex_rk, 0) AS BIGINT) AS lex_rank,
         CAST(COALESCE(v.vec_rk, 0) AS BIGINT) AS vec_rank,
         COALESCE({RRF_SCALE} // ({RRF_K} + l.lex_rk), 0)
         + COALESCE({RRF_SCALE} // ({RRF_K} + v.vec_rk), 0) AS rrf_score
  FROM lex l FULL OUTER JOIN vec v
    ON l.query_id = v.query_id AND l.doc_id = v.doc_id
)
SELECT query_id, doc_id, lex_rank, vec_rank, rrf_score, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_score DESC, doc_id) AS rk
  FROM fused
) WHERE rk <= {FUSE_TOPK}"""

_RRF_ORACLE = f"""
WITH {_LEX_CTES},
vec_parts AS (
  -- num/den split so the zero-norm guard below matches the Spark
  -- implementation's ``WHEN qnrm*nrm == 0 THEN 0.0`` exactly (a
  -- zero-norm embedding must score 0, not NaN/Inf).
  SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
         list_reduce(list_transform(range(1, len(q.embedding) + 1),
                     i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
                     (a, b) -> a + b) AS num,
         sqrt(list_reduce(list_transform(range(1, len(q.embedding) + 1),
                     i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)),
                     (a, b) -> a + b))
         * sqrt(list_reduce(list_transform(range(1, len(e.embedding) + 1),
                     i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
                     (a, b) -> a + b)) AS den
  FROM embeddings q CROSS JOIN embeddings e
  WHERE q.vec_id % {QUERY_MOD} = 0 AND e.vec_id <> q.vec_id
),
vec_scored AS (
  SELECT query_id, doc_id,
         CASE WHEN den = 0 THEN 0.0 ELSE num / den END AS cos
  FROM vec_parts
),
vec AS (
  SELECT query_id, doc_id, rk AS vec_rk FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, doc_id) AS rk
    FROM vec_scored
  ) WHERE rk <= {LEG_TOPN}
),
{_FUSE_SQL}
"""


def _lex_shortlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical leg shared by both hybrid variants: inverted-index
    tf-dot-product, per-query top-LEG_TOPN as (query_id, doc_id, lex_rk).
    The query-side postings are tiny (|queries| x |vocab|) -> broadcast;
    the corpus side shuffles by token only into the aggregation."""
    docs = fan_out(load_table(spark, "documents", sf_dir), "doc_id")
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )
    qtf = tf.filter(F.col("doc_id") % QUERY_MOD == 0).select(
        F.col("doc_id").alias("query_id"), "word", F.col("tf").alias("qtf")
    )
    lex_scored = (
        F.broadcast(qtf)
        .join(tf, "word")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("qtf") * F.col("tf")).alias("lex_score"))
    )
    w_lex = Window.partitionBy("query_id").orderBy(F.desc("lex_score"), "doc_id")
    return (
        lex_scored.withColumn("lex_rk", F.row_number().over(w_lex))
        .filter(F.col("lex_rk") <= LEG_TOPN)
        .select("query_id", "doc_id", "lex_rk")
    )


def _rrf_fuse(lex: DataFrame, vec: DataFrame) -> DataFrame:
    """RRF fusion shared by both hybrid variants: outer-join the two
    shortlists per (query, doc); an absent leg contributes 0. Integer
    div keeps the fused sum exact in any accumulation order."""
    fused = lex.join(vec, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        F.coalesce(F.col("lex_rk"), F.lit(0)).cast("long").alias("lex_rank"),
        F.coalesce(F.col("vec_rk"), F.lit(0)).cast("long").alias("vec_rank"),
        (
            F.coalesce(F.expr(f"{RRF_SCALE} div ({RRF_K} + lex_rk)"), F.lit(0))
            + F.coalesce(F.expr(f"{RRF_SCALE} div ({RRF_K} + vec_rk)"), F.lit(0))
        ).alias("rrf_score"),
    )
    w_fuse = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), "doc_id")
    return (
        fused.withColumn("rk", F.row_number().over(w_fuse))
        .filter(F.col("rk") <= FUSE_TOPK)
        .select("query_id", "doc_id", "lex_rank", "vec_rank", "rrf_score", "rk")
    )


@register(
    "hybrid_search_rrf",
    oracle=_RRF_ORACLE,
    doc="Hybrid retrieval: a lexical leg (inverted-index tf-dot-product "
    "over whitespace tokens) and a vector leg (cosine over the paired "
    "embedding, doc_id = vec_id) each produce a per-query top-20 "
    "shortlist; the legs are fused by reciprocal-rank fusion with "
    "integer contributions (1e12 div (60 + rank)), and the fused top-10 "
    "per query is surfaced with both leg ranks (0 = absent from that "
    "leg's shortlist). The fused score is a BIGINT sum — exact, "
    "order-independent, engine-portable.",
)
def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(load_table(spark, "embeddings", sf_dir), "vec_id")

    lex = _lex_shortlist(spark, sf_dir)

    # Vector leg: exact cosine (norms projected once per side, one array
    # fold per pair). At scale this leg is served by the persisted
    # LSH/NSW index instead; fusion only consumes ranks.
    corpus = emb.select("vec_id", "embedding", l2_norm("embedding").alias("nrm"))
    qv = corpus.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("nrm").alias("qnrm"),
    )
    vec_scored = (
        F.broadcast(qv)
        .crossJoin(corpus)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            F.when(F.col("qnrm") * F.col("nrm") == 0, F.lit(0.0))
            .otherwise(dot_product("query_vec", "embedding") / (F.col("qnrm") * F.col("nrm")))
            .alias("cos"),
        )
    )
    w_vec = Window.partitionBy("query_id").orderBy(F.desc("cos"), "doc_id")
    vec = (
        vec_scored.withColumn("vec_rk", F.row_number().over(w_vec))
        .filter(F.col("vec_rk") <= LEG_TOPN)
        .select("query_id", "doc_id", "vec_rk")
    )

    return _rrf_fuse(lex, vec)


# Indexed-vector-leg oracle: the lexical CTEs and RRF fusion are the
# shared fragments above; the vector shortlist comes from the SAME
# deterministic multi-table LSH multiprobe the knn_lsh_probe oracle
# pins (similarity._PLANES_SQL / _MT_BUCKET_SQL / Hamming-1 probes),
# cut at LEG_TOPN instead of 10.
def _rrf_indexed_oracle() -> str:
    from .similarity import N_TABLES, _cos_sql_pair, _MT_BUCKET_SQL, _PLANES_SQL

    return f"""
WITH {_LEX_CTES},
pl AS ({_PLANES_SQL}),
bk AS (
  SELECT e.vec_id, t.t, {_MT_BUCKET_SQL} AS bucket
  FROM embeddings e CROSS JOIN (SELECT unnest(range(0, {N_TABLES})) AS t) t CROSS JOIN pl
),
masks AS (
  -- Hamming-2 probe masks (query-side deepening, r14): identity, every
  -- 1-bit flip, every 2-bit flip — mirrors _multiprobe(radius=2)
  SELECT CAST(0 AS BIGINT) AS mask
  UNION ALL
  SELECT CAST(power(2, i.i) AS BIGINT)
  FROM (SELECT unnest(range(0, (SELECT p FROM pl))) AS i) i
  UNION ALL
  SELECT CAST(power(2, i.i) + power(2, j.j) AS BIGINT)
  FROM (SELECT unnest(range(0, (SELECT p FROM pl))) AS i) i
  JOIN (SELECT unnest(range(0, (SELECT p FROM pl))) AS j) j ON j.j > i.i
),
probes AS (
  SELECT bk.vec_id AS query_id, bk.t, xor(bucket, m.mask) AS probe
  FROM bk CROSS JOIN masks m
  WHERE bk.vec_id % {QUERY_MOD} = 0
),
vcand AS (
  SELECT DISTINCT p.query_id, y.vec_id AS doc_id
  FROM probes p JOIN bk y ON p.t = y.t AND p.probe = y.bucket AND y.vec_id <> p.query_id
),
vec_scored AS (
  SELECT vcand.query_id, vcand.doc_id, {_cos_sql_pair('qa.embedding', 'nb.embedding')} AS cos
  FROM vcand
  JOIN embeddings qa ON qa.vec_id = vcand.query_id
  JOIN embeddings nb ON nb.vec_id = vcand.doc_id
),
vec AS (
  SELECT query_id, doc_id, rk AS vec_rk FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, doc_id) AS rk
    FROM vec_scored
  ) WHERE rk <= {LEG_TOPN}
),
{_FUSE_SQL}
"""


@register(
    "hybrid_search_rrf_indexed",
    oracle=_rrf_indexed_oracle(),
    doc="hybrid_search_rrf with the vector leg riding the PERSISTED "
    "multi-table LSH index (similarity.lsh_scored_pairs: bucket-join "
    "candidate generation + exact cosine re-rank, top-20 shortlist) "
    "instead of the exact brute-force scorer — the measured-linear twin "
    "of the deliberately-quadratic exact baseline. Fusion is identical "
    "(integer RRF, BIGINT sums); only the vector shortlist membership "
    "may differ where LSH multiprobe misses a true neighbor, which is "
    "exactly the recall trade the ann_recall_report family prices. At "
    "100 TB this is the production shape: candidate generation never "
    "scans the corpus, the lexical leg shuffles 8-byte token keys, and "
    "both legs are rank-only inputs to an integer fusion.",
)
def q_hybrid_search_rrf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import lsh_scored_pairs

    lex = _lex_shortlist(spark, sf_dir)
    w_vec = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    vec = (
        lsh_scored_pairs(spark, sf_dir, probe_radius=2)
        .withColumn("vec_rk", F.row_number().over(w_vec))
        .filter(F.col("vec_rk") <= LEG_TOPN)
        .select("query_id", F.col("neighbor_id").alias("doc_id"), "vec_rk")
    )
    return _rrf_fuse(lex, vec)


TRUNC_DIMS = (8, 16, 32, 64)
TRUNC_TOPK = 10

_TRUNC_ORACLE = f"""
WITH dims AS (SELECT unnest([{", ".join(str(d) for d in TRUNC_DIMS)}]) AS dim),
scored_parts AS (
  -- num/den split so the zero-norm guard matches the Spark
  -- implementation's ``WHEN den == 0 THEN 0.0`` (an all-zero
  -- truncated prefix must score 0, not NaN/Inf).
  SELECT dm.dim, q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_reduce(list_transform(range(1, dm.dim + 1),
                     i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
                     (a, b) -> a + b) AS num,
         sqrt(list_reduce(list_transform(range(1, dm.dim + 1),
                     i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)),
                     (a, b) -> a + b))
         * sqrt(list_reduce(list_transform(range(1, dm.dim + 1),
                     i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
                     (a, b) -> a + b)) AS den
  FROM embeddings q CROSS JOIN embeddings e CROSS JOIN dims dm
  WHERE q.vec_id % {QUERY_MOD} = 0 AND e.vec_id <> q.vec_id
),
scored AS (
  SELECT dim, query_id, neighbor_id,
         CASE WHEN den = 0 THEN 0.0 ELSE num / den END AS cos
  FROM scored_parts
),
topk AS (
  SELECT dim, query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY dim, query_id
                                 ORDER BY cos DESC, neighbor_id) AS rk
    FROM scored
  ) WHERE rk <= {TRUNC_TOPK}
),
base AS (SELECT query_id, neighbor_id FROM topk WHERE dim = {max(TRUNC_DIMS)}),
base_n AS (SELECT COUNT(*) AS n FROM base)
SELECT t.dim,
       CAST(COUNT(b.neighbor_id) AS BIGINT) AS hits,
       CAST(MIN(base_n.n) AS BIGINT) AS n_baseline,
       round(COUNT(b.neighbor_id) / CAST(MIN(base_n.n) AS DOUBLE), 4) AS recall
FROM topk t
LEFT JOIN base b ON b.query_id = t.query_id AND b.neighbor_id = t.neighbor_id
CROSS JOIN base_n
GROUP BY t.dim
ORDER BY t.dim
"""


@register(
    "embedding_truncation_recall",
    oracle=_TRUNC_ORACLE,
    doc="Matryoshka-style truncation evaluation: brute-force cosine "
    "top-10 using only the first d dims of each embedding (d in "
    f"{TRUNC_DIMS}), scored as recall against the full-dimension "
    "baseline. The report a pipeline runs before shipping truncated "
    "embeddings to a cheaper index tier. One pair scan serves all "
    "dims (dim exploded per pair); fold order is fixed so the cosine "
    "is bit-identical across engines.",
)
def q_embedding_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(load_table(spark, "embeddings", sf_dir), "vec_id")
    corpus = emb.select("vec_id", "embedding")
    qv = corpus.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    pairs = (
        F.broadcast(qv)
        .crossJoin(corpus)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "query_vec",
            "embedding",
            F.explode(F.array(*[F.lit(d) for d in TRUNC_DIMS])).alias("dim"),
        )
    )
    qt = F.expr("slice(query_vec, 1, dim)")
    et = F.expr("slice(embedding, 1, dim)")
    denom = l2_norm(qt) * l2_norm(et)
    scored = pairs.select(
        "dim",
        "query_id",
        "neighbor_id",
        F.when(denom == 0, F.lit(0.0)).otherwise(dot_product(qt, et) / denom).alias("cos"),
    )
    w = Window.partitionBy("dim", "query_id").orderBy(F.desc("cos"), "neighbor_id")
    topk = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TRUNC_TOPK)
        .select("dim", "query_id", "neighbor_id")
    )
    base = topk.filter(F.col("dim") == max(TRUNC_DIMS)).select(
        "query_id", F.col("neighbor_id").alias("base_neighbor")
    )
    base_n = base.agg(F.count("*").alias("n"))
    hits = (
        topk.join(
            base,
            (topk.query_id == base.query_id)
            & (topk.neighbor_id == base.base_neighbor),
            "left",
        )
        .groupBy("dim")
        .agg(F.count("base_neighbor").cast("long").alias("hits"))
    )
    return (
        hits.crossJoin(F.broadcast(base_n))
        .select(
            "dim",
            "hits",
            F.col("n").cast("long").alias("n_baseline"),
            F.round(F.col("hits") / F.col("n").cast("double"), 4).alias("recall"),
        )
        .orderBy("dim")
    )


_VOCAB_OVERLAP_ORACLE = f"""
WITH toks AS (SELECT source, {_TOKENS_SQL} AS t FROM documents),
grams AS (
  SELECT DISTINCT source,
         unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
  FROM toks WHERE len(t) >= 3
),
sizes AS (SELECT source, COUNT(*) AS n FROM grams GROUP BY source),
common AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
  FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
  GROUP BY 1, 2
)
SELECT c.source_a, c.source_b, c.n_common,
       sa.n AS n_a, sb.n AS n_b,
       round(c.n_common / CAST(sa.n + sb.n - c.n_common AS DOUBLE), 6) AS jaccard
FROM common c
JOIN sizes sa ON sa.source = c.source_a
JOIN sizes sb ON sb.source = c.source_b
ORDER BY source_a, source_b
"""


@register(
    "source_vocab_overlap",
    oracle=_VOCAB_OVERLAP_ORACLE,
    doc="Cross-source corpus diagnostics: pairwise Jaccard overlap of "
    "the word-trigram shingle vocabularies of every source pair — the "
    "report that flags mirrored/scraped-twice sources before mixing "
    "weights are assigned. Exact set Jaccard via a shingle-partitioned "
    "self-join; at 100 TB the per-source vocabulary is replaced by its "
    "minhash signature (dedup_minhash_signature) and the same report "
    "reads the sketch instead.",
)
def q_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, "documents", sf_dir), "doc_id")
    grams = (
        docs.select("source", F.explode(word_ngrams("text", 3)).alias("g"))
        .distinct()
    )
    sizes = grams.groupBy("source").agg(F.count("*").alias("n"))
    a = grams.select(F.col("source").alias("source_a"), "g")
    b = grams.select(F.col("source").alias("source_b"), "g")
    common = (
        a.join(b, "g")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(
            F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_common",
            "n_a",
            "n_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def _knn_class_oracle() -> str:
    """Compose the labeled brute-force top-k oracle verbatim, then vote."""
    from ..registry import REGISTRY

    base = REGISTRY["knn_bruteforce"].oracle
    return f"""
    WITH topk AS (SELECT query_id, label FROM ({base})),
    votes AS (
      SELECT query_id, label, COUNT(*) AS n_votes
      FROM topk GROUP BY 1, 2
    ),
    pred AS (
      SELECT query_id, label AS pred_label FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY n_votes DESC, label) AS rk
        FROM votes
      ) WHERE rk = 1
    ),
    truth AS (
      SELECT vec_id AS query_id, label AS true_label
      FROM embeddings WHERE vec_id % {QUERY_MOD} = 0
    )
    SELECT t.true_label,
           COUNT(*) AS n_queries,
           CAST(SUM(CASE WHEN p.pred_label = t.true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           round(SUM(CASE WHEN p.pred_label = t.true_label THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS accuracy
    FROM truth t JOIN pred p USING (query_id)
    GROUP BY t.true_label
    ORDER BY t.true_label
    """


@register(
    "knn_classification_report",
    oracle=_knn_class_oracle(),
    doc="k-NN label prediction quality: each query vector's label is "
    "predicted by majority vote of its exact top-10 neighbors "
    "(deterministic tie-break: most votes, then smallest label), and "
    "per-true-label accuracy is reported — the evaluation a pipeline "
    "runs to decide whether an embedding space separates its classes "
    "before using it for model-based filtering. Composes the registered "
    "knn_bruteforce operator verbatim on BOTH engines (integer votes, "
    "exact division only at the surfaced accuracy).",
)
def q_knn_classification_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import q_knn_bruteforce

    topk = q_knn_bruteforce(spark, sf_dir)
    votes = topk.groupBy("query_id", "label").agg(F.count("*").alias("n_votes"))
    w = Window.partitionBy("query_id").orderBy(F.desc("n_votes"), "label")
    pred = (
        votes.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("query_id", F.col("label").alias("pred_label"))
    )
    emb = load_table(spark, "embeddings", sf_dir)
    truth = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    correct = F.sum(
        F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
    )
    return (
        truth.join(pred, "query_id")
        .groupBy("true_label")
        .agg(
            F.count("*").alias("n_queries"),
            correct.cast("long").alias("n_correct"),
            F.round(correct / F.count("*").cast("double"), 4).alias("accuracy"),
        )
        .orderBy("true_label")
    )


def _semantic_cluster_oracle() -> str:
    """Recursive min-label reachability over the LSH near-dup pair graph,
    composing the registered embedding_near_dup_pairs oracle verbatim."""
    from ..registry import REGISTRY

    pairs = REGISTRY["embedding_near_dup_pairs"].oracle
    return f"""
    WITH RECURSIVE ndp AS (SELECT vec_a, vec_b FROM ({pairs})),
    nodes AS (SELECT DISTINCT vec_a AS node FROM ndp
              UNION SELECT DISTINCT vec_b FROM ndp),
    edges AS (
      SELECT vec_a AS src, vec_b AS dst FROM ndp
      UNION ALL SELECT vec_b, vec_a FROM ndp
    ),
    reach(node, root) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
    ),
    labels AS (SELECT node, MIN(root) AS cluster_id FROM reach GROUP BY node),
    assigned AS (
      SELECT e.vec_id, COALESCE(l.cluster_id, e.vec_id) AS cluster_id
      FROM embeddings e LEFT JOIN labels l ON l.node = e.vec_id
    )
    SELECT vec_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
           vec_id = cluster_id AS is_survivor
    FROM assigned
    """


@register(
    "semantic_cluster_survivors",
    oracle=_semantic_cluster_oracle(),
    doc="SemDeDup-style semantic dedup end-to-end: LSH-bucketed cosine "
    "near-dup pairs (embedding_near_dup_pairs, threshold 0.4) are "
    "clustered by distributed min-label propagation (cluster_labels — "
    "the union-find analogue), every vector is assigned its component's "
    "lowest id (singletons keep their own id), and the lowest member of "
    "each cluster is the survivor the pipeline keeps. One row per "
    "corpus vector with cluster id/size/survivor flag. The pair graph "
    "is the only super-linear stage and it is LSH-bounded — no "
    "all-pairs product anywhere.",
)
def q_semantic_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import cluster_labels
    from .similarity import q_embedding_near_dup_pairs

    pairs = q_embedding_near_dup_pairs(spark, sf_dir).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    labels = cluster_labels(pairs)  # (doc_id, cluster_id)
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id")
    assigned = emb.join(
        labels, emb.vec_id == labels.doc_id, "left"
    ).select(
        "vec_id",
        F.coalesce(labels.cluster_id, emb.vec_id).alias("cluster_id"),
    )
    w = Window.partitionBy("cluster_id")
    return assigned.select(
        "vec_id",
        "cluster_id",
        F.count("*").over(w).alias("cluster_size"),
        (F.col("vec_id") == F.col("cluster_id")).alias("is_survivor"),
    )


# --- MMR diversified rerank --------------------------------------------------

MMR_LAMBDA = 0.7  # relevance weight
MMR_MU = 0.3  # redundancy weight (spelled out, NOT 1-lambda: 1-0.7 != 0.3 in IEEE754)
MMR_CAND = 20  # shortlist depth the selector sees
MMR_K = 5  # diversified results returned per query

# guarded cosine over two array expressions (same fold order as
# functions.vectors.cosine_similarity; zero-norm -> 0.0 like the Spark side)
def _guarded_cos_sql(a: str, b: str) -> str:
    dot = (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )
    nrm = lambda v: (
        f"sqrt(list_reduce(list_transform(range(1, len({v}) + 1), "
        f"i -> CAST({v}[i] AS DOUBLE) * CAST({v}[i] AS DOUBLE)), (x, y) -> x + y))"
    )
    return (
        f"CASE WHEN {nrm(a)} * {nrm(b)} = 0 THEN 0.0 "
        f"ELSE {dot} / ({nrm(a)} * {nrm(b)}) END"
    )


def _mmr_oracle() -> str:
    """Unrolled MMR selection (the BPE-oracle technique: one CTE pair per
    iteration — greedy argmax is not expressible as a single SQL level)."""
    from .similarity import QUERY_MOD as VEC_QUERY_MOD

    cos_qe = _guarded_cos_sql("q.qv", "e.embedding")
    cos_ab = _guarded_cos_sql("a.embedding", "b.embedding")
    parts = [
        f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id % {VEC_QUERY_MOD} = 0),
rel AS (
  SELECT q.query_id, e.vec_id AS cid, {cos_qe} AS rel
  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id
),
cand AS (
  SELECT query_id, cid, rel FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, cid) AS rk
    FROM rel
  ) WHERE rk <= {MMR_CAND}
),
sims AS (
  SELECT ca.query_id, ca.cid AS ca, cb.cid AS cb, {cos_ab} AS sim
  FROM cand ca JOIN cand cb ON cb.query_id = ca.query_id AND cb.cid <> ca.cid
  JOIN embeddings a ON a.vec_id = ca.cid
  JOIN embeddings b ON b.vec_id = cb.cid
),
sel1 AS (
  SELECT query_id, cid, 1 AS rank, rel AS score FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, cid) AS rn
    FROM cand
  ) WHERE rn = 1
),
selu1 AS (SELECT * FROM sel1)"""
    ]
    for t in range(2, MMR_K + 1):
        parts.append(f""",
pen{t} AS (
  SELECT s.query_id, s.ca AS cid, max(s.sim) AS maxsim
  FROM sims s JOIN selu{t - 1} u ON u.query_id = s.query_id AND u.cid = s.cb
  GROUP BY s.query_id, s.ca
),
sc{t} AS (
  SELECT r.query_id, r.cid,
         {MMR_LAMBDA} * r.rel - {MMR_MU} * p.maxsim AS score
  FROM cand r
  JOIN pen{t} p ON p.query_id = r.query_id AND p.cid = r.cid
  LEFT JOIN selu{t - 1} u ON u.query_id = r.query_id AND u.cid = r.cid
  WHERE u.cid IS NULL
),
sel{t} AS (
  SELECT query_id, cid, {t} AS rank, score FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, cid) AS rn
    FROM sc{t}
  ) WHERE rn = 1
),
selu{t} AS (SELECT * FROM selu{t - 1} UNION ALL SELECT * FROM sel{t})""")
    parts.append(f"""
SELECT query_id, rank, cid AS neighbor_id, round(score, 6) AS mmr_score
FROM selu{MMR_K} ORDER BY query_id, rank""")
    return "".join(parts)


@register(
    "knn_mmr_rerank",
    oracle=_mmr_oracle(),
    doc="Maximal-marginal-relevance rerank: greedy diversified top-5 from "
    "a cosine top-20 shortlist, score = 0.7*relevance - 0.3*max-"
    "similarity-to-already-selected (Carbonell & Goldstein '98). The "
    "iterative argmax runs on the driver over k-bounded frames, but "
    "every per-iteration frame is O(queries * shortlist): the candidate "
    "shortlist and its pairwise-similarity matrix are computed ONCE and "
    "the loop never touches the corpus again — MMR cost is independent "
    "of corpus size, and the shortlist generator swaps for any ANN leg "
    "(knn_lsh_probe / knn_nsw_probe) exactly like hybrid_search_rrf's "
    "vector leg. Oracle: one unrolled CTE pair per greedy step (greedy "
    "argmax is inherently sequential — same technique as the BPE "
    "oracle).",
)
def q_knn_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import QUERY_MOD as VEC_QUERY_MOD

    emb = fan_out(load_table(spark, "embeddings", sf_dir), "vec_id")
    corpus = emb.select("vec_id", "embedding", l2_norm("embedding").alias("nrm"))
    q = corpus.filter(F.col("vec_id") % VEC_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    guarded = F.when(F.col("qnrm") * F.col("nrm") == 0, F.lit(0.0)).otherwise(
        dot_product("qv", "embedding") / (F.col("qnrm") * F.col("nrm"))
    )
    rel = (
        F.broadcast(q)
        .crossJoin(corpus)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cid"), guarded.alias("rel"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("rel"), "cid")
    cand = (
        rel.withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= MMR_CAND)
        .select("query_id", "cid", "rel")
        .localCheckpoint(eager=True)
    )
    # pairwise similarity matrix of each query's shortlist: O(q * n_cand²)
    # rows TOTAL, computed once — the loop below only re-joins it
    ce = cand.join(corpus, cand.cid == corpus.vec_id).select(
        "query_id", "cid", "embedding", "nrm"
    )
    a, b = ce.alias("a"), ce.alias("b")
    pair_cos = F.when(
        F.col("a.nrm") * F.col("b.nrm") == 0, F.lit(0.0)
    ).otherwise(
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
    return mmr_select(spark, cand, sims).select(
        "query_id",
        "rank",
        F.col("cid").alias("neighbor_id"),
        F.round("score", 6).alias("mmr_score"),
    ).orderBy("query_id", "rank")


def mmr_select(
    spark: SparkSession, cand: DataFrame, sims: DataFrame, k: int = MMR_K
) -> DataFrame:
    """The greedy MMR selection loop, decoupled from its shortlist
    generator: ``cand`` = (query_id, cid, rel), ``sims`` = the
    shortlist's pairwise similarity matrix (query_id, ca, cb, sim).
    ANY candidate generator plugs in — the brute-force scorer above,
    or an ANN leg's top-k (see the LSH-shortlist composition test) —
    because the loop only ever touches these two k-bounded frames.
    Returns (query_id, cid, rank, score)."""
    wq = Window.partitionBy("query_id").orderBy(F.desc("rel"), "cid")
    sel_all = (
        cand.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == 1)
        .select("query_id", "cid", F.lit(1).alias("rank"), F.col("rel").alias("score"))
        .localCheckpoint(eager=True)
    )
    # selection loop frames are O(queries * shortlist) — scoped width,
    # same as the BPE/k-center loops
    with scoped_shuffle_width(spark, MMR_CAND * MMR_CAND * 32):
        for t in range(2, k + 1):
            pen = (
                sims.join(
                    sel_all.select("query_id", F.col("cid").alias("cb")),
                    ["query_id", "cb"],
                    "left_semi",
                )
                .groupBy("query_id", F.col("ca").alias("cid"))
                .agg(F.max("sim").alias("maxsim"))
            )
            scored = (
                cand.join(
                    sel_all.select("query_id", "cid"), ["query_id", "cid"], "left_anti"
                )
                .join(pen, ["query_id", "cid"])
                .select(
                    "query_id",
                    "cid",
                    (
                        F.lit(MMR_LAMBDA) * F.col("rel")
                        - F.lit(MMR_MU) * F.col("maxsim")
                    ).alias("score"),
                )
            )
            ws = Window.partitionBy("query_id").orderBy(F.desc("score"), "cid")
            pick = (
                scored.withColumn("rn", F.row_number().over(ws))
                .filter(F.col("rn") == 1)
                .select("query_id", "cid", F.lit(t).alias("rank"), "score")
            )
            sel_all = sel_all.union(pick).localCheckpoint(eager=True)
    return sel_all


# --- hard-negative mining ----------------------------------------------------

HN_TOPK = 5  # hard negatives surfaced per anchor


@register(
    "hard_negative_mining",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, label AS qlabel, embedding AS qv
               FROM embeddings WHERE vec_id % {QUERY_MOD} = 0),
    scored AS (
      SELECT q.query_id, q.qlabel, e.vec_id AS neighbor_id, e.label,
             {_guarded_cos_sql("q.qv", "e.embedding")} AS cos
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.query_id AND e.label <> q.qlabel
    )
    SELECT query_id, qlabel AS anchor_label, neighbor_id,
           label AS negative_label, round(cos, 6) AS cosine, rk
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rk
      FROM scored
    ) WHERE rk <= {HN_TOPK}
    """,
    doc="Hard-negative mining for contrastive embedding training: per "
    f"anchor, the top-{HN_TOPK} most-similar vectors with a DIFFERENT "
    "label — the negatives that sit closest to the decision boundary "
    "and carry the training signal (random negatives are trivially "
    "easy). Same scoring shape as knn_bruteforce with the label "
    "inequality pushed into the join predicate (filtered before the "
    "top-k window, not after — at scale the per-anchor candidate heap "
    "never fills with same-label rows). The exact scorer is the "
    "evaluation baseline; at 100 TB the candidate generator swaps for "
    "any ANN leg, as in hybrid_search_rrf/knn_mmr_rerank.",
)
def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import QUERY_MOD as VEC_QUERY_MOD

    emb = fan_out(load_table(spark, "embeddings", sf_dir), "vec_id")
    corpus = emb.select("vec_id", "label", "embedding", l2_norm("embedding").alias("nrm"))
    q = corpus.filter(F.col("vec_id") % VEC_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    guarded = F.when(F.col("qnrm") * F.col("nrm") == 0, F.lit(0.0)).otherwise(
        dot_product("qv", "embedding") / (F.col("qnrm") * F.col("nrm"))
    )
    scored = (
        F.broadcast(q)
        .crossJoin(corpus)
        .filter(
            (F.col("vec_id") != F.col("query_id"))
            & (F.col("label") != F.col("qlabel"))
        )
        .select(
            "query_id",
            "qlabel",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            guarded.alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= HN_TOPK)
        .select(
            "query_id",
            F.col("qlabel").alias("anchor_label"),
            "neighbor_id",
            F.col("label").alias("negative_label"),
            F.round("cos", 6).alias("cosine"),
            "rk",
        )
    )


# --- k-center coreset --------------------------------------------------------

KCENTER_K = 8  # coreset size


def _kcenter_oracle() -> str:
    """Unrolled greedy k-center (Gonzalez 1985): one CTE pair per round."""
    dist = f"1.0 - ({_guarded_cos_sql('a.embedding', 'b.embedding')})"
    parts = [
        f"""
WITH sel1 AS MATERIALIZED (
  SELECT CAST(1 AS BIGINT) AS rank, vec_id, 0.0 AS radius
  FROM embeddings ORDER BY vec_id LIMIT 1
),
selu1 AS MATERIALIZED (SELECT * FROM sel1)"""
    ]
    for t in range(2, KCENTER_K + 1):
        parts.append(f""",
mind{t} AS MATERIALIZED (
  SELECT a.vec_id, min({dist}) AS mind
  FROM embeddings a
  JOIN selu{t - 1} s ON a.vec_id <> s.vec_id
  JOIN embeddings b ON b.vec_id = s.vec_id
  WHERE a.vec_id NOT IN (SELECT vec_id FROM selu{t - 1})
  GROUP BY a.vec_id
),
sel{t} AS MATERIALIZED (
  SELECT CAST({t} AS BIGINT) AS rank, vec_id, mind AS radius
  FROM mind{t} ORDER BY mind DESC, vec_id ASC LIMIT 1
),
selu{t} AS MATERIALIZED (SELECT * FROM selu{t - 1} UNION ALL SELECT * FROM sel{t})""")
    parts.append(f"""
SELECT rank, vec_id, round(radius, 6) AS radius
FROM selu{KCENTER_K} ORDER BY rank""")
    return "".join(parts)


@register(
    "kcenter_coreset",
    oracle=_kcenter_oracle(),
    doc=f"Greedy k-center coreset (Gonzalez 1985, 2-approximation): "
    f"{KCENTER_K} maximally-diverse embeddings under cosine distance — "
    "the diversity-sampling selector for labeling budgets and eval-set "
    "construction, complementing per-query MMR with a GLOBAL selection. "
    "The k selected centers are collected driver-side (k-bounded — the "
    "ONE legitimate driver-side loop shape) and re-injected as literal "
    "arrays, so each round is a single map-only scan (distance to ≤ k "
    "literal centers via F.least) + a TakeOrdered 1-row argmax: NO "
    "shuffle, NO checkpoint barrier — at 100 TB the cost is exactly k "
    "cached scans. The radius column is the classic non-increasing "
    "covering-radius curve (each selected point's distance to its "
    "nearest prior center). Oracle: unrolled greedy rounds (the "
    "BPE/MMR technique).",
)
def q_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(load_table(spark, "embeddings", sf_dir), "vec_id")
    corpus = emb.select(
        "vec_id", "embedding", l2_norm("embedding").alias("nrm")
    ).persist()
    try:
        seed = corpus.orderBy("vec_id").limit(1).collect()[0]
        # (rank, vec_id, radius, embedding-as-doubles, norm). Collected
        # float32 elements widen to double exactly, and nrm was computed
        # as a double JVM-side, so the literal re-injection reproduces
        # the former column-to-column arithmetic bit-for-bit.
        centers = [
            (1, seed["vec_id"], 0.0, [float(x) for x in seed["embedding"]], float(seed["nrm"]))
        ]
        # One F.expr per round: composing ~k*64 F.lit columns through
        # py4j costs ~0.9 s of driver chatter per round; a single SQL
        # string is one round trip and parses JVM-side in microseconds.
        # cast('<repr>' as double) is an exact round trip for Python's
        # shortest-repr floats, so the literal arithmetic is bit-equal
        # to the former column-to-column form.
        def _d(x: float) -> str:
            return f"cast('{x!r}' as double)"

        for t in range(2, KCENTER_K + 1):
            dists = []
            for _rank, _cid, _rad, cemb, cnrm in centers:
                arr = "array(" + ",".join(_d(x) for x in cemb) + ")"
                nc = _d(cnrm)
                dot = (
                    f"aggregate(zip_with(embedding, {arr}, "
                    f"(x, y) -> cast(x as double) * y), "
                    f"cast(0.0 as double), (acc, x) -> acc + x)"
                )
                dists.append(
                    f"(cast(1.0 as double) - (case when nrm * {nc} = 0 "
                    f"then cast(0.0 as double) else {dot} / (nrm * {nc}) end))"
                )
            mind = F.expr(
                "least(" + ",".join(dists) + ")" if len(dists) > 1 else dists[0]
            )
            pick = (
                corpus.where(~F.col("vec_id").isin([c[1] for c in centers]))
                .select("vec_id", mind.alias("mind"), "embedding", "nrm")
                .orderBy(F.desc("mind"), F.asc("vec_id"))
                .limit(1)
                .collect()[0]
            )
            centers.append(
                (
                    t,
                    pick["vec_id"],
                    float(pick["mind"]),
                    [float(x) for x in pick["embedding"]],
                    float(pick["nrm"]),
                )
            )
    finally:
        corpus.unpersist()
    out = spark.createDataFrame(
        [(r, v, rad) for r, v, rad, _e, _n in centers],
        "rank long, vec_id long, radius double",
    )
    return out.select("rank", "vec_id", F.round("radius", 6).alias("radius")).orderBy(
        "rank"
    )


# --- BM25: the saturating, length-normalized lexical ranker ------------------

BM25_SCALE = 1024  # fixed-point scale for the saturation ratio
BM25_TOPK = 10
# k1 = 6/5, b = 3/4 as exact rationals. With A = avglen (integer floor
# of total/doc-count) the per-term saturation clears to integers:
#   tf*(k1+1) / (tf + k1*(1-b) + k1*b*len/A)
#   = 22*A*tf / (10*A*tf + 3*A + 9*len)        (x 10A)
# so the denominator is bounded by DOC length, not corpus size — no
# overflow growth with corpus (cf. the documented decimal bound in
# source_token_drift; here the rescale removes the problem entirely).

_BM25_ORACLE = f"""
WITH tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM (
    SELECT doc_id, unnest({_TOKENS_SQL}) AS word FROM documents
  ) GROUP BY doc_id, word
),
lens AS (
  SELECT doc_id, CAST(len({_TOKENS_SQL}) AS BIGINT) AS dl FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nd,
         CAST(SUM(dl) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS a
  FROM lens
),
df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word),
scored AS (
  SELECT q.doc_id AS query_id, d.doc_id AS doc_id,
         SUM(q.tf
             * (length(to_base((2 * s.nd) // f.df, 2)) - 1)
             * (({BM25_SCALE} * 22 * s.a * d.tf)
                // (10 * s.a * d.tf + 3 * s.a + 9 * l.dl))) AS bm25_score
  FROM tf q
  JOIN tf d USING (word)
  JOIN lens l ON l.doc_id = d.doc_id
  JOIN df f USING (word)
  CROSS JOIN stats s
  WHERE q.doc_id % {QUERY_MOD} = 0 AND d.doc_id <> q.doc_id
  GROUP BY 1, 2
  HAVING bm25_score > 0
)
SELECT query_id, doc_id, CAST(bm25_score AS BIGINT) AS bm25_score,
       CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY bm25_score DESC, doc_id) AS rk
  FROM scored
) WHERE rk <= {BM25_TOPK}
ORDER BY query_id, rk
"""


@register(
    "bm25_search",
    oracle=_BM25_ORACLE,
    doc="BM25 ranking (Robertson-Sparck Jones) over the token inverted "
    "index — the saturating, length-normalized lexical leg the plain "
    "tf x tf scorer in hybrid_search_rrf lacks: term contribution = "
    "qtf * idf_bits * saturation(tf_d, doclen). Everything is exact "
    "integer arithmetic: idf as add-one-smoothed whole bits "
    "(flog2(2N div df) >= 1, the doc_rarity_bits trick with Lucene's "
    "positive-idf clamp), k1=6/5 b=3/4 cleared to the integer "
    "ratio 22*A*tf div (10*A*tf + 3*A + 9*len) at fixed point 1024 "
    "(A = floor mean doc length), so the DuckDB oracle pins scores "
    "bit-for-bit and — unlike a float BM25 — the rescale keeps every "
    "intermediate bounded by DOC length, not corpus size: no overflow "
    "at any scale. Plan shape: the classic token-partitioned "
    "inverted-index join (tf x tf on the word key) with df and "
    "doc-length side tables joined in — on a Zipfian corpus the df "
    "table is the knob that demotes the stopword head before the big "
    "join (the BM25 analogue of the PPJoin prefix order), and this leg "
    "swaps into hybrid_search_rrf's fusion unchanged since RRF only "
    "consumes ranks.",
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..functions.text import tokens as _tokens

    d = fan_out(load_table(spark, "documents", sf_dir), "doc_id")
    toks = d.select("doc_id", _tokens("text").alias("t")).localCheckpoint(eager=True)
    words = toks.select("doc_id", F.explode("t").alias("word")).select(
        "doc_id", F.xxhash64("word").alias("hw")
    )
    tf = words.groupBy("doc_id", "hw").agg(F.count("*").alias("tf"))
    lens = toks.select("doc_id", F.size("t").cast("long").alias("dl"))
    stats = lens.agg(
        F.count("*").cast("long").alias("nd"),
        (F.sum("dl") / F.count("*")).cast("long").alias("a"),
    )
    df_t = tf.groupBy("hw").agg(F.count("*").cast("long").alias("df"))
    kept = tf.join(df_t, "hw").crossJoin(F.broadcast(stats))
    q = kept.filter(F.col("doc_id") % QUERY_MOD == 0).select(
        F.col("doc_id").alias("query_id"), "hw", F.col("tf").alias("qtf")
    )
    joined = (
        q.join(kept.select("hw", "doc_id", "tf", "df", "nd", "a"), "hw")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(lens, "doc_id")
    )
    # Add-one-smoothed whole-bit idf: floor(log2(2N/df)) >= 1 for every
    # df <= N, so no posting is silently zero-weighted (the synthetic
    # corpus has a 31-word vocab with df > N/2 for 30 of them — an
    # unsmoothed floor-log2 idf zeroes the whole score there).
    idf_bits = F.length(F.bin(F.expr("(2 * nd) div df"))) - 1
    sat = F.expr(
        f"({BM25_SCALE} * 22 * a * tf) div (10 * a * tf + 3 * a + 9 * dl)"
    )
    scored = (
        joined.select(
            "query_id",
            "doc_id",
            (F.col("qtf") * idf_bits * sat).alias("term"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("term").cast("long").alias("bm25_score"))
        .filter(F.col("bm25_score") > 0)
    )
    rk = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("bm25_score"), "doc_id")
    )
    return (
        scored.withColumn("rk", rk.cast("long"))
        .filter(F.col("rk") <= BM25_TOPK)
        .orderBy("query_id", "rk")
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random-projection recall: the third member of the
# embedding-eval triad (prefix truncation / PQ codes / random projection)
# ---------------------------------------------------------------------------

JL_DIMS = (4, 8, 16, 32, 64)  # projected dimensions evaluated; 64 (= the
# source dim, a dense random rotation-like transform) closes the gap to
# prefix truncation: measured recall@10 at sf0.01 is 0.385 at d'=64 —
# exactly truncation@32's 0.385 — vs 0.275 at d'=32. A two-block-mix
# sign hash (XOR of two independent squared-mix parities) was also
# measured and REJECTED: 0.175 at d'=32, worse than the single squared
# mix — the honest conclusion is that on this corpus +-1 projection
# needs ~2x the dims of coordinate truncation for equal recall, so the
# cheap-index tier should truncate first and project only when the
# source dims carry no preferential energy ordering.
JL_TOPK = 10
_JL_C1 = 2654435761  # Knuth multiplicative constant (input-dim mixing)
_JL_C2 = 48271  # MINSTD multiplier (output-dim mixing)
_JL_MOD = 2147483647  # 2^31 - 1
_JL_D = 64  # source embedding dimensionality

# The +-1 sign matrix is a deterministic pure function of (i, j):
# u = (i*C2 + j*C1 + 12345) % M, sign = +1 iff (u*u) % M is even —
# exact BIGINT both engines compute identically (u < M so u*u < 2^62).
# The SQUARE is load-bearing: any purely LINEAR index hash (one or
# many Lehmer/LCG steps) maps the dense (i, j) grid to constant-stride
# progressions mod M whose PARITY stays strongly correlated between
# output columns — measured pairwise column agreement up to 0.94,
# collapsing the projection to effective rank ~2 and recall to noise.
# Squaring the mixed index breaks the arithmetic-progression structure
# (consecutive inputs step by 2u+1, not a constant): measured column
# agreement is binomial noise around 0.5 (the same mixing-not-just-
# determinism lesson as the priority-sampling Lehmer fix, NOTES r10).
# The projection fold and the cosine folds run left-to-right over the
# index (Spark aggregate-with-0.0-init vs DuckDB 2-arg list_reduce,
# the convention every cosine oracle in this repo already relies on),
# so projected scores are bit-identical across engines.


def _jl_recall_oracle() -> str:
    from ..registry import REGISTRY

    base = REGISTRY["knn_bruteforce"].oracle
    sign = (
        f"(((i - 1) * {_JL_C2} + j * {_JL_C1} + 12345) % {_JL_MOD})"
        f" * (((i - 1) * {_JL_C2} + j * {_JL_C1} + 12345) % {_JL_MOD})"
        f" % {_JL_MOD} % 2 = 0"
    )
    return f"""
WITH dims AS (SELECT unnest([{", ".join(str(d) for d in JL_DIMS)}]) AS dim),
proj AS (
  SELECT dm.dim, e.vec_id,
         list_transform(range(0, dm.dim), j -> list_reduce(
             list_transform(range(1, {_JL_D} + 1), i ->
                 CASE WHEN {sign}
                      THEN CAST(e.embedding[i] AS DOUBLE)
                      ELSE -CAST(e.embedding[i] AS DOUBLE) END),
             (a, b) -> a + b)) AS p
  FROM embeddings e CROSS JOIN dims dm
),
pairs AS (
  SELECT q.dim, q.vec_id AS query_id, e.vec_id AS neighbor_id,
         list_reduce(list_transform(range(1, q.dim + 1),
                     i -> q.p[i] * e.p[i]), (a, b) -> a + b) AS num,
         sqrt(list_reduce(list_transform(range(1, q.dim + 1),
                     i -> q.p[i] * q.p[i]), (a, b) -> a + b))
         * sqrt(list_reduce(list_transform(range(1, q.dim + 1),
                     i -> e.p[i] * e.p[i]), (a, b) -> a + b)) AS den
  FROM proj q JOIN proj e ON q.dim = e.dim AND e.vec_id <> q.vec_id
  WHERE q.vec_id % {QUERY_MOD} = 0
),
scored AS (
  SELECT dim, query_id, neighbor_id,
         CASE WHEN den = 0 THEN 0.0 ELSE num / den END AS cos
  FROM pairs
),
topk AS (
  SELECT dim, query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY dim, query_id
                                 ORDER BY cos DESC, neighbor_id) AS rk
    FROM scored
  ) WHERE rk <= {JL_TOPK}
),
base AS (SELECT query_id, neighbor_id FROM ({base})),
base_n AS (SELECT COUNT(*) AS n FROM base)
SELECT t.dim,
       CAST(COUNT(b.neighbor_id) AS BIGINT) AS hits,
       CAST(MIN(base_n.n) AS BIGINT) AS n_baseline,
       round(COUNT(b.neighbor_id) / CAST(MIN(base_n.n) AS DOUBLE), 4) AS recall
FROM topk t
LEFT JOIN base b ON b.query_id = t.query_id AND b.neighbor_id = t.neighbor_id
CROSS JOIN base_n
GROUP BY t.dim
ORDER BY t.dim
"""


@register(
    "jl_projection_recall",
    oracle=_jl_recall_oracle(),
    doc="Johnson-Lindenstrauss random-projection evaluation: each "
    "embedding is projected to d' dims (d' in "
    f"{JL_DIMS}) by a deterministic +-1 sign matrix (sign(i, j) from "
    "exact integer arithmetic on the index pair — no stored projection "
    "matrix, any worker regenerates it), then brute-force cosine "
    "top-10 in the PROJECTED space is scored as recall against the "
    "exact full-dimension baseline (the registered knn_bruteforce "
    "oracle composed verbatim). Completes the embedding-eval triad — "
    "prefix truncation (embedding_truncation_recall) / product "
    "quantization (knn_ivfpq_probe + ann_recall_report) / random "
    "projection (this) — the three cheap-index-tier transforms a "
    "pipeline prices before shipping 100 TB of vectors. Scale shape: "
    "the projection is a scan-local map (each vector projected once "
    "per d', not per pair); the pair scoring here is the documented "
    "exact baseline over the 4% query set (same shape as "
    "knn_bruteforce); at scale the projected vectors feed the "
    "persisted LSH/IVF index instead and only the projection map "
    "changes. Fold order is fixed (left-to-right over the index), so "
    "projected cosines are bit-identical across engines.",
)
def q_jl_projection_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import q_knn_bruteforce

    emb = fan_out(load_table(spark, "embeddings", sf_dir), "vec_id")
    withdim = emb.select(
        "vec_id",
        "embedding",
        F.explode(F.array(*[F.lit(d) for d in JL_DIMS])).alias("dim"),
    )
    p = F.transform(
        F.sequence(F.lit(0), F.col("dim") - 1),
        lambda j: F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.sequence(F.lit(0), F.lit(_JL_D - 1)),
                lambda v, i: F.when(
                    (
                        (
                            (i * F.lit(_JL_C2) + j * F.lit(_JL_C1) + F.lit(12345))
                            % F.lit(_JL_MOD)
                        )
                        * (
                            (i * F.lit(_JL_C2) + j * F.lit(_JL_C1) + F.lit(12345))
                            % F.lit(_JL_MOD)
                        )
                    )
                    % F.lit(_JL_MOD)
                    % 2
                    == 0,
                    v.cast("double"),
                ).otherwise(-v.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    proj = withdim.select("vec_id", "dim", p.alias("p"))
    corpus = proj.select("vec_id", "dim", "p", l2_norm("p").alias("nrm"))
    qv = corpus.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("dim").alias("qdim"),
        F.col("p").alias("qp"),
        F.col("nrm").alias("qnrm"),
    )
    scored = (
        F.broadcast(qv)
        .join(corpus, F.col("qdim") == F.col("dim"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "dim",
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.when(F.col("qnrm") * F.col("nrm") == 0, F.lit(0.0))
            .otherwise(dot_product("qp", "p") / (F.col("qnrm") * F.col("nrm")))
            .alias("cos"),
        )
    )
    w = Window.partitionBy("dim", "query_id").orderBy(F.desc("cos"), "neighbor_id")
    topk = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= JL_TOPK)
        .select("dim", "query_id", "neighbor_id")
    )
    base = q_knn_bruteforce(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("base_neighbor")
    )
    base_n = base.agg(F.count("*").alias("n"))
    hits = (
        topk.join(
            base,
            (topk.query_id == base.query_id)
            & (topk.neighbor_id == base.base_neighbor),
            "left",
        )
        .groupBy("dim")
        .agg(F.count("base_neighbor").cast("long").alias("hits"))
    )
    return (
        hits.crossJoin(F.broadcast(base_n))
        .select(
            "dim",
            "hits",
            F.col("n").cast("long").alias("n_baseline"),
            F.round(F.col("hits") / F.col("n").cast("double"), 4).alias("recall"),
        )
        .orderBy("dim")
    )


# --- rank-aware hybrid-retrieval QA --------------------------------------------


def _hybrid_ndcg_oracle() -> str:
    """Compose the exact and indexed RRF oracles verbatim, score the
    indexed ranking with the shared integer nDCG discounts (the
    ann_ndcg_report machinery, applied to the retrieval pair)."""
    from ..registry import REGISTRY
    from .similarity import _NDCG_IDEAL, _NDCG_W

    exact = REGISTRY["hybrid_search_rrf"].oracle
    indexed = REGISTRY["hybrid_search_rrf_indexed"].oracle
    wt = " UNION ALL ".join(
        f"SELECT {i + 1} AS rk, CAST({w} AS BIGINT) AS wmicro"
        for i, w in enumerate(_NDCG_W)
    )
    return f"""
    WITH exact_r AS (SELECT query_id, doc_id FROM ({exact})),
    idx AS (SELECT query_id, doc_id, rk FROM ({indexed})),
    panel AS (SELECT DISTINCT query_id FROM exact_r),
    wt AS ({wt}),
    dcg AS (
      SELECT i.query_id, CAST(SUM(w.wmicro) AS BIGINT) AS dcg_micro
      FROM idx i
      JOIN exact_r e ON e.query_id = i.query_id AND e.doc_id = i.doc_id
      JOIN wt w ON w.rk = i.rk
      GROUP BY i.query_id
    ),
    perq AS (
      SELECT p.query_id,
             (1000000 * COALESCE(d.dcg_micro, 0)) // {_NDCG_IDEAL} AS ndcg_micro
      FROM panel p LEFT JOIN dcg d ON d.query_id = p.query_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(ndcg_micro) // COUNT(*) AS BIGINT) AS mean_ndcg_micro,
           CAST(MIN(ndcg_micro) AS BIGINT) AS min_ndcg_micro,
           CAST(SUM(CASE WHEN ndcg_micro = 1000000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_perfect
    FROM perq
    """


@register(
    "hybrid_search_ndcg",
    oracle=_hybrid_ndcg_oracle(),
    doc="Rank-aware QA for the hybrid-retrieval pair: binary-relevance "
    "nDCG@10 of the INDEXED RRF pipeline (token postings + LSH vector "
    "leg) against its EXACT twin's top-10 — the retrieval counterpart "
    "of ann_ndcg_report, closing the loop on the r12 headline swap: "
    "set-recall said the indexed path finds the exact answers; this "
    "says how well it ORDERS them (rank inversions are free under "
    "recall, charged here). Same exactness discipline: shared integer "
    "micro-unit discounts, floor-divided BIGINT means, queries missed "
    "entirely scoring 0 through the panel left join. Scale: both legs "
    "ride their registered pipelines; the metric adds one "
    "query-panel-sized aggregation.",
)
def q_hybrid_search_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import _NDCG_IDEAL, _NDCG_W

    exact = (
        q_hybrid_search_rrf(spark, sf_dir)
        .select("query_id", "doc_id")
        .localCheckpoint(eager=True)
    )
    idx = q_hybrid_search_rrf_indexed(spark, sf_dir).select(
        "query_id", "doc_id", "rk"
    )
    panel = exact.select("query_id").distinct()
    warr = F.array(*[F.lit(w).cast("bigint") for w in _NDCG_W])
    dcg = (
        idx.join(exact, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(F.sum(F.element_at(warr, F.col("rk"))).cast("bigint").alias("dcg_micro"))
    )
    perq = panel.join(dcg, "query_id", "left").select(
        F.expr(f"(1000000 * COALESCE(dcg_micro, 0)) div {_NDCG_IDEAL}").alias(
            "ndcg_micro"
        )
    )
    return perq.agg(
        F.count("*").cast("bigint").alias("n_queries"),
        F.expr("sum(ndcg_micro) div count(*)").cast("bigint").alias("mean_ndcg_micro"),
        F.min("ndcg_micro").cast("bigint").alias("min_ndcg_micro"),
        F.sum(F.when(F.col("ndcg_micro") == 1_000_000, 1).otherwise(0))
        .cast("bigint")
        .alias("n_perfect"),
    )
