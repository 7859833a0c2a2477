"""Training-data curation operators, wave 2.

Second batch of between-lake-and-trainer ops (companions to
``training.py``), each with a value-level DuckDB oracle:

- overlapping context-window chunking (explode, no Python);
- near-dup cluster survivorship (keep the best doc per cluster);
- deterministic shuffled sharding (the distributed form of "shuffle the
  training set": hash-shard + in-shard order, no global sort);
- domain mixture weights (per-source up/down-sampling factors).

Scale notes: chunking is map-side explode (output partitions inherit the
scan); survivorship reuses the LSH pair graph + label propagation from
``dedup.py`` and adds one partitioned window; sharding's only shuffle is
the hash partition itself — exactly the shuffle the trainer needs; mix
weights aggregate to one row per source (tiny) before any math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table
from .dedup import _PAIRS_SQL, cluster_labels, lsh_candidate_pairs, minhash_signatures
from .training import _SPLIT_HASH_SQL, split_hash

# chunk geometry: 200-char windows advancing 150 chars (50-char overlap) —
# the char-level stand-in for token-window chunking with context overlap.
_CHUNK = 200
_STRIDE = 150

_N_CHUNKS_SQL = (
    f"CASE WHEN length(text) <= {_CHUNK} THEN 1 "
    f"ELSE (length(text) - {_CHUNK} + {_STRIDE - 1}) // {_STRIDE} + 1 END"
)


@register(
    "doc_chunking",
    oracle=f"""
    WITH n AS (SELECT doc_id, text, {_N_CHUNKS_SQL} AS n_chunks FROM documents),
    c AS (
      SELECT doc_id, text, CAST(unnest(range(0, n_chunks)) AS INTEGER) AS chunk_idx
      FROM n
    )
    SELECT doc_id, chunk_idx,
           substring(text, chunk_idx * {_STRIDE} + 1, {_CHUNK}) AS chunk,
           length(substring(text, chunk_idx * {_STRIDE} + 1, {_CHUNK})) AS chunk_len
    FROM c
    """,
    doc="Context-window chunking: each document split into 200-char windows "
    "advancing 150 chars (50 overlap), via sequence+explode — map-side "
    "only, zero Python, output co-partitioned with the scan. The last "
    "window starts before EOF by construction, so no empty tail chunks. "
    "The char-window stand-in for token-window chunking (the reference "
    "has no analogue; LLM-pipeline north star).",
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    ln = F.length("text")
    n_chunks = F.when(ln <= _CHUNK, F.lit(1)).otherwise(
        F.floor((ln - _CHUNK + (_STRIDE - 1)) / _STRIDE) + 1
    )
    c = d.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias("chunk_idx"),
    )
    chunk = F.substring(
        F.col("text"), F.col("chunk_idx") * _STRIDE + 1, _CHUNK
    )
    return c.select(
        "doc_id",
        "chunk_idx",
        chunk.alias("chunk"),
        F.length(chunk).alias("chunk_len"),
    )


@register(
    "dedup_survivors",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_PAIRS_SQL}),
    nodes AS (SELECT DISTINCT doc_a AS node FROM pairs
              UNION SELECT DISTINCT doc_b FROM pairs),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, root) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
    ),
    labels AS (SELECT node AS doc_id, MIN(root) AS cluster_id FROM reach GROUP BY node),
    docs AS (
      SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id, d.n_chars
      FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
    ),
    ranked AS (
      SELECT doc_id, cluster_id,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM docs
    )
    SELECT doc_id, cluster_id, rn = 1 AS is_survivor FROM ranked
    """,
    doc="Near-dup survivorship: every document labeled with its LSH cluster "
    "(singletons are their own cluster) and exactly one survivor kept per "
    "cluster — the longest doc, doc_id tiebreak. This is the dedup "
    "DECISION step the filter pipeline consumes (keep is_survivor). One "
    "partitioned window over cluster_id on top of the shared "
    "label-propagation machinery — no new shuffle shape at 100 TB.",
)
def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, "documents", sf_dir)
    labels = cluster_labels(lsh_candidate_pairs(minhash_signatures(d)))
    docs = (
        d.select("doc_id", "n_chars")
        .join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
            "n_chars",
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n_chars"), "doc_id")
    return docs.select(
        "doc_id",
        "cluster_id",
        (F.row_number().over(w) == 1).alias("is_survivor"),
    )


_N_SHARDS = 64


@register(
    "training_shuffle_shards",
    oracle=f"""
    WITH h AS (SELECT doc_id, {_SPLIT_HASH_SQL} AS hsh FROM documents)
    SELECT doc_id,
           CAST(hsh % {_N_SHARDS} AS INTEGER) AS shard,
           row_number() OVER (PARTITION BY hsh % {_N_SHARDS}
                              ORDER BY hsh, doc_id) AS pos
    FROM h
    """,
    doc="Deterministic training-set shuffle as shard + position: docs land "
    "in one of 64 hash shards and are ordered inside the shard by the "
    "full hash (doc_id tiebreak). This IS how a 100 TB shuffle ships — "
    "hash partition + in-partition sort, never a global total order; the "
    "trainer reads shards in any order and each shard is internally "
    "decorrelated from ingest order. Same engine-portable multiplicative "
    "hash as the train/val/test split, so the order is reproducible "
    "across engines and runs.",
)
def q_training_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, "documents", sf_dir)
    h = d.select("doc_id", split_hash("doc_id").alias("hsh"))
    w = Window.partitionBy(F.col("hsh") % _N_SHARDS).orderBy("hsh", "doc_id")
    return h.select(
        "doc_id",
        (F.col("hsh") % _N_SHARDS).cast("int").alias("shard"),
        F.row_number().over(w).alias("pos"),
    )


@register(
    "domain_mix_weights",
    oracle="""
    WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    t AS (SELECT SUM(n_docs) AS total, COUNT(*) AS n_sources FROM c)
    SELECT source, n_docs,
           ROUND(CAST(n_docs AS DOUBLE) / total, 12) AS actual_share,
           ROUND(CAST(total AS DOUBLE) / (n_sources * n_docs), 12) AS weight
    FROM c CROSS JOIN t
    """,
    doc="Domain mixture weights: per-source sampling factor that rebalances "
    "the corpus to a uniform target mixture (weight = target_share / "
    "actual_share). The heavy work is one groupBy to a per-source row; "
    "all arithmetic happens on the tiny aggregate, broadcast back if a "
    "downstream sampler joins it against the corpus.",
)
def q_domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    c = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    t = c.agg(
        F.sum("n_docs").alias("total"), F.count("*").alias("n_sources")
    )
    return c.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.col("total"), 12).alias("actual_share"),
        F.round(
            F.col("total").cast("double") / (F.col("n_sources") * F.col("n_docs")), 12
        ).alias("weight"),
    )


@register(
    "domain_temperature_sampling",
    oracle="""
    WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    w AS (SELECT source, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS wt FROM c),
    t AS (SELECT SUM(wt) AS total_wt FROM w)
    SELECT source, n_docs,
           ROUND(wt / total_wt, 12) AS sample_prob,
           CAST(FLOOR(wt / total_wt * 1000000) AS BIGINT) AS epoch_docs,
           ROUND(wt / total_wt * 1000000 / n_docs, 12) AS epochs_per_doc
    FROM w CROSS JOIN t
    """,
    doc="Temperature-based domain sampling (T=2, i.e. p_i ∝ n_i^(1/2) — "
    "the multilingual-sampling exponent family): upweights small "
    "domains without flattening to uniform. sqrt, not pow(x, 0.7): "
    "IEEE-754 requires sqrt correctly rounded, so the oracle matches "
    "bit-exactly in any engine, while pow differs in the last ulp "
    "between libms. Emits per-source sampling probability, docs drawn "
    "per 1M-doc epoch, and the oversampling factor (epochs_per_doc > 1 "
    "= the domain repeats within an epoch). One groupBy to a per-source "
    "row; all arithmetic on the tiny aggregate, like domain_mix_weights.",
)
def q_domain_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    c = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    w = c.select("source", "n_docs", F.sqrt(F.col("n_docs").cast("double")).alias("wt"))
    t = w.agg(F.sum("wt").alias("total_wt"))
    p = F.col("wt") / F.col("total_wt")
    return w.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        F.round(p, 12).alias("sample_prob"),
        F.floor(p * 1_000_000).cast("bigint").alias("epoch_docs"),
        F.round(p * 1_000_000 / F.col("n_docs"), 12).alias("epochs_per_doc"),
    )


# ---------------------------------------------------------------------------
# Waterfill token-budget allocation across domains
# ---------------------------------------------------------------------------

# Budget as an exact rational fraction of the corpus (2/5 = 40%): float
# multiplication would round differently per engine; num/den integers
# never do.
WATERFILL_BUDGET_NUM = 2
WATERFILL_BUDGET_DEN = 5



def waterfill_sql(per_cte: str) -> str:
    """The waterfill CTE chain over a prior CTE ``per_cte`` with columns
    (source, n_tokens). Yields CTEs tot/ranked/cut/lvl and finally
    ``alloc`` (source, n_tokens, alloc_tokens, saturated, level,
    budget) — composed verbatim by every oracle that budgets tokens, so
    parity always covers the same arithmetic the Spark side runs."""
    return f"""
    tot AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n_tokens) AS BIGINT) * {WATERFILL_BUDGET_NUM}
               // {WATERFILL_BUDGET_DEN} AS budget
      FROM {per_cte}
    ),
    ranked AS (
      SELECT p.source, p.n_tokens, t.k, t.budget,
             row_number() OVER (ORDER BY p.n_tokens, p.source) AS i,
             SUM(p.n_tokens) OVER (ORDER BY p.n_tokens, p.source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
      FROM {per_cte} p CROSS JOIN tot t
    ),
    cut AS (
      SELECT COALESCE(MAX(CASE
               WHEN i = k AND prefix <= budget THEN i
               WHEN i < k AND n_tokens <= (budget - prefix) // (k - i) THEN i
               ELSE NULL END), 0) AS j,
             COALESCE(MAX(CASE
               WHEN i = k AND prefix <= budget THEN prefix
               WHEN i < k AND n_tokens <= (budget - prefix) // (k - i) THEN prefix
               ELSE NULL END), 0) AS prefix_j
      FROM ranked
    ),
    lvl AS (
      SELECT j, CASE WHEN j >= (SELECT k FROM tot) THEN NULL
                     ELSE (budget - prefix_j) // ((SELECT k FROM tot) - j)
                END AS level, budget
      FROM cut CROSS JOIN tot
    ),
    alloc AS (
      SELECT r.source, r.n_tokens,
             CAST(CASE WHEN r.i <= l.j THEN r.n_tokens
                  ELSE LEAST(r.n_tokens, l.level) END AS BIGINT) AS alloc_tokens,
             r.i <= l.j AS saturated,
             CAST(l.level AS BIGINT) AS level, CAST(l.budget AS BIGINT) AS budget
      FROM ranked r CROSS JOIN lvl l
    )"""


def waterfill_alloc(per: DataFrame) -> DataFrame:
    """(source, n_tokens, alloc_tokens, saturated, level, budget): the
    closed-form waterfill allocation over a (source, n_tokens) frame —
    the Spark mirror of ``waterfill_sql`` (see q_domain_token_waterfill's
    doc for the cut-point argument)."""
    from pyspark.sql.window import Window

    tot = per.agg(
        F.sum("n_tokens").cast("long").alias("total"),
        F.count("*").cast("long").alias("k"),
        F.expr(
            f"CAST(SUM(n_tokens) * {WATERFILL_BUDGET_NUM}"
            f" div {WATERFILL_BUDGET_DEN} AS BIGINT)"
        ).alias("budget"),
    )
    w = Window.orderBy("n_tokens", "source")
    ranked = (
        per.crossJoin(F.broadcast(tot))
        .withColumn("i", F.row_number().over(w))
        .withColumn(
            "prefix",
            F.sum("n_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    ).localCheckpoint(eager=True)  # reused by the cut aggregate and the output
    feasible = F.when(
        (F.col("i") == F.col("k")) & (F.col("prefix") <= F.col("budget")), True
    ).when(
        (F.col("i") < F.col("k"))
        & (F.col("n_tokens") <= F.expr("(budget - prefix) div (k - i)")),
        True,
    )
    cut = ranked.agg(
        F.coalesce(F.max(F.when(feasible, F.col("i"))), F.lit(0)).alias("j"),
        F.coalesce(F.max(F.when(feasible, F.col("prefix"))), F.lit(0)).alias(
            "prefix_j"
        ),
    )
    out = ranked.crossJoin(F.broadcast(cut)).withColumn(
        "level",
        F.when(F.col("j") >= F.col("k"), F.lit(None).cast("long")).otherwise(
            F.expr("(budget - prefix_j) div (k - j)")
        ),
    )
    alloc = F.when(F.col("i") <= F.col("j"), F.col("n_tokens")).otherwise(
        F.least(F.col("n_tokens"), F.col("level"))
    )
    return out.select(
        "source",
        "n_tokens",
        alloc.alias("alloc_tokens"),
        (F.col("i") <= F.col("j")).alias("saturated"),
        "level",
        "budget",
    )


@register(
    "domain_token_waterfill",
    oracle=f"""
    WITH per AS (
      SELECT source,
             CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ),{waterfill_sql("per")}
    SELECT a.source, a.n_tokens, a.alloc_tokens,
           round(CAST(a.alloc_tokens AS DOUBLE) / a.n_tokens, 6) AS keep_rate,
           a.saturated, a.level, a.budget
    FROM alloc a ORDER BY a.source
    """,
    doc="Token-budget waterfilling across domains: given a corpus budget "
    "(an exact 2/5 rational of total tokens), every domain receives "
    "min(its tokens, L) where the water level L is the largest integer "
    "level the budget covers — small domains keep everything "
    "(saturated), large domains are clipped to the common level, the "
    "allocation that maximizes the minimum domain share (the DoReMi/"
    "balanced-mix budgeting step before temperature sampling picks "
    "epoch probabilities). The cut point j is found closed-form from "
    "the sorted prefix sums — for each candidate prefix of ascending "
    "domains, saturating it is feasible iff the remaining per-slot "
    "level (budget - prefix_j) div (k - j) still covers the largest "
    "saturated domain; j* is the max feasible cut, no iteration, no "
    "floats anywhere except the surfaced keep_rate. Scale shape: one "
    "scan aggregates per-domain token counts; everything after runs on "
    "a |domains|-row table (the bounded-cardinality SinglePartition "
    "window curriculum_bins also uses) — at 100 TB the window sees "
    "hundreds of rows, never documents.",
)
def q_domain_token_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import token_count

    d = load_table(spark, "documents", sf_dir)
    per = (
        d.select("source", token_count("text").cast("long").alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").cast("long").alias("n_tokens"))
    )
    a = waterfill_alloc(per)
    return a.select(
        "source",
        "n_tokens",
        "alloc_tokens",
        F.round(
            F.col("alloc_tokens").cast("double") / F.col("n_tokens"), 6
        ).alias("keep_rate"),
        "saturated",
        "level",
        "budget",
    ).orderBy("source")


@register(
    "temperature_mix_allocation",
    oracle=f"""
    WITH per AS (
      SELECT source,
             CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ),
    wt AS (
      SELECT source, n_tokens,
             CASE WHEN (s + 1) * (s + 1) <= n_tokens THEN s + 1
                  WHEN s * s > n_tokens THEN s - 1
                  ELSE s END AS weight
      FROM (SELECT source, n_tokens,
                   CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS s
            FROM per)
    ),
    tot AS (
      SELECT CAST(SUM(weight) AS BIGINT) AS tot_w,
             CAST(SUM(n_tokens) AS BIGINT) * {WATERFILL_BUDGET_NUM}
               // {WATERFILL_BUDGET_DEN} AS budget
      FROM wt
    ),
    alloc AS (
      -- floor(budget*w / tot) with bounded intermediates: budget*weight
      -- overflows int64 at the corpus scale this op documents, but with
      -- budget = q*tot + r the identity floor(budget*w/tot) =
      -- q*w + floor(r*w/tot) holds exactly and r*w < tot*max(w)
      SELECT w.source, w.n_tokens, w.weight,
             t.tot_w,
             (t.budget // t.tot_w) * w.weight
               + (t.budget % t.tot_w) * w.weight // t.tot_w AS alloc_tokens
      FROM wt w CROSS JOIN tot t
    )
    SELECT source, n_tokens, weight,
           round(CAST(weight AS DOUBLE) / tot_w, 6) AS p_sample,
           CAST(alloc_tokens AS BIGINT) AS alloc_tokens,
           round(CAST(alloc_tokens AS DOUBLE) / n_tokens, 6) AS epochs
    FROM alloc
    ORDER BY source
    """,
    doc="Temperature-based mixture sampling over TOKEN mass (tau = 1/2): "
    "each source's epoch sampling weight is n_tokens^tau, flattening "
    "the natural distribution so head domains stop dominating and tail "
    "domains upsample — the step AFTER waterfilling caps absolute "
    "budgets, this picks per-epoch probabilities. The token-budget "
    "twin of domain_temperature_sampling (which weights DOC counts and "
    "emits per-1M-doc epoch draws): mixes are specified in tokens once "
    "a tokenizer exists, and this variant ALLOCATES the shared 2/5 "
    "token budget, not just probabilities. tau = 1/2 is computed as an "
    "EXACT integer sqrt "
    "(floor(sqrt) from the IEEE double, then a +-1 integer correction, "
    "so both engines land on the same BIGINT even when the double "
    "rounds across a perfect square); probabilities and epoch factors "
    "are each a single IEEE divide of exact integers (round 6); "
    "allocated tokens are exact integer div of the shared 2/5 rational "
    "budget. epochs > 1 on a source IS the point — upsampled tail. "
    "Scale shape: one scan aggregates per-source token counts; "
    "everything after runs on a |sources|-row table with the 1-row "
    "totals broadcast (no SinglePartition window).",
)
def q_temperature_mix_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import token_count

    d = load_table(spark, "documents", sf_dir)
    per = (
        d.select("source", token_count("text").cast("long").alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").cast("long").alias("n_tokens"))
    )
    s = F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("long")
    isqrt = (
        F.when((s + 1) * (s + 1) <= F.col("n_tokens"), s + 1)
        .when(s * s > F.col("n_tokens"), s - 1)
        .otherwise(s)
    )
    wt = per.select("source", "n_tokens", isqrt.alias("weight"))
    tot = wt.agg(
        F.sum("weight").cast("long").alias("tot_w"),
        F.expr(
            f"CAST(sum(n_tokens) AS BIGINT) * {WATERFILL_BUDGET_NUM}"
            f" div {WATERFILL_BUDGET_DEN}"
        ).alias("budget"),
    )
    # floor(budget*w / tot) with bounded intermediates (the r10 err_ppm
    # lesson): budget*weight overflows int64 at the documented corpus
    # scale; with budget = q*tot + r, floor(budget*w/tot) = q*w +
    # floor(r*w/tot) exactly, and r*w < tot_w * max(weight)
    alloc = F.expr(
        "(budget div tot_w) * weight + ((budget % tot_w) * weight) div tot_w"
    )
    return (
        wt.crossJoin(F.broadcast(tot))
        .withColumn("alloc_tokens", alloc.cast("long"))
        .select(
            "source",
            "n_tokens",
            "weight",
            F.round(F.col("weight").cast("double") / F.col("tot_w"), 6).alias(
                "p_sample"
            ),
            "alloc_tokens",
            F.round(
                F.col("alloc_tokens").cast("double") / F.col("n_tokens"), 6
            ).alias("epochs"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Curated-mix manifest: quality gate -> budget -> deterministic cut
# ---------------------------------------------------------------------------


def _curated_mix_oracle() -> str:
    # the composed key must be REGISTERED before lookup — import its
    # module explicitly instead of relying on registry load order (the
    # retrieval.py lesson)
    from . import selection as _selection  # noqa: F401
    from ..registry import REGISTRY

    ccnet = REGISTRY["ccnet_lm_buckets"].oracle
    return f"""
    WITH buckets AS (SELECT doc_id, ppl_bucket FROM ({ccnet})),
    kept AS (
      SELECT d.doc_id, d.source, b.ppl_bucket,
             CAST(len(string_split_regex(trim(d.text), '\\s+')) AS BIGINT)
               AS n_tokens
      FROM documents d JOIN buckets b ON b.doc_id = d.doc_id
      WHERE b.ppl_bucket <> 'tail'
    ),
    per AS (
      SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
      FROM kept GROUP BY source
    ),{waterfill_sql("per")},
    cum AS (
      SELECT k.doc_id, k.source, k.ppl_bucket, k.n_tokens, a.alloc_tokens,
             SUM(k.n_tokens) OVER (PARTITION BY k.source
               ORDER BY (k.doc_id * 2654435761) % 2147483647, k.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      FROM kept k JOIN alloc a USING (source)
    )
    SELECT doc_id, source, ppl_bucket, n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           cum_tokens <= alloc_tokens AS in_mix
    FROM cum ORDER BY doc_id
    """


@register(
    "curated_mix_manifest",
    oracle=_curated_mix_oracle(),
    doc="The curation pipeline's capstone, end to end in one manifest: "
    "(1) the CCNet perplexity gate keeps head+middle documents "
    "(composing the registered ccnet_lm_buckets oracle verbatim), "
    "(2) the waterfill budget allocates the 2/5 token budget across "
    "sources over the KEPT tokens (composing waterfill_sql — both "
    "upstream oracles are reused, never re-derived, so parity certifies "
    "the real composition), and (3) within each source, documents enter "
    "the mix in deterministic hash order until the allocation is "
    "exhausted — a prefix cut, so the mix is bit-reproducible and "
    "append-only with respect to budget increases (a bigger budget "
    "extends each source's prefix, never reshuffles it — what makes "
    "ablation runs at nested budgets comparable). Scale shape: the "
    "gate and token counts are scans; the budget runs on a "
    "|sources|-row table; the cut is one window partitioned by source "
    "ordered by an 8-byte hash — the same single-shuffle shape as "
    "doc_chunking, no global sort anywhere.",
)
def q_curated_mix_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators.selection import q_ccnet_lm_buckets

    # n_tokens = n_bigrams + 1 for EVERY doc the gate scored (a doc gets
    # a ccnet row iff it has >= 2 tokens, and then bigrams = tokens - 1),
    # and docs without a gate row are excluded by the inner join in both
    # engines — so the manifest derives token counts from the gate output
    # instead of re-tokenizing the full corpus a second time. The oracle
    # keeps the independent string-split derivation; parity certifies the
    # identity.
    buckets = q_ccnet_lm_buckets(spark, sf_dir).select(
        "doc_id",
        "ppl_bucket",
        (F.col("n_bigrams") + 1).cast("long").alias("n_tokens"),
    )
    d = load_table(spark, "documents", sf_dir).select("doc_id", "source")
    kept = (
        d.join(buckets, "doc_id")
        .filter(F.col("ppl_bucket") != "tail")
        .localCheckpoint(eager=True)  # reused: per-source sums + the cut window
    )
    per = kept.groupBy("source").agg(
        F.sum("n_tokens").cast("long").alias("n_tokens")
    )
    alloc = waterfill_alloc(per).select("source", "alloc_tokens")
    w = (
        Window.partitionBy("source")
        .orderBy((F.col("doc_id") * F.lit(2654435761)) % F.lit(2147483647), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = kept.join(F.broadcast(alloc), "source").withColumn(
        "cum_tokens", F.sum("n_tokens").over(w)
    )
    return cum.select(
        "doc_id",
        "source",
        "ppl_bucket",
        "n_tokens",
        "cum_tokens",
        (F.col("cum_tokens") <= F.col("alloc_tokens")).alias("in_mix"),
    ).orderBy("doc_id")
