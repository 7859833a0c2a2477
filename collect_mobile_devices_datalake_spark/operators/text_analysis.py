"""Text-analysis operators over the ``documents`` table (north-star M5).

All codegen'd built-ins — tokenization, ratios, n-grams, rolling-hash
fingerprints — so the same plan scales from 500 docs to a 100 TB corpus
(narrow projections, one shuffle per aggregate, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    STOPWORDS,
    punct_ratio,
    quality_score,
    rolling_hash,
    stopword_ratio,
    token_count,
    tokens,
    word_ngrams,
)
from ..registry import register
from ..session import load_table

# DuckDB fragments shared across oracles.
_TOKENS_SQL = "string_split_regex(trim(text), '\\s+')"

# packing shard: engine-portable multiplicative hash (training.py) mod 16
from .training import _SPLIT_HASH_SQL as _TRAIN_HASH_SQL  # noqa: E402

# _funnel_oracle composes REGISTRY['dedup_survivors'] at decoration time;
# importing its home module here (not relying on registry._ensure_loaded's
# pinned order) keeps `import operators.text_analysis` standalone-safe.
from . import training2  # noqa: E402, F401

_PACK_SHARD_SQL = f"({_TRAIN_HASH_SQL}) % 16"


def _sw_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({_TOKENS_SQL}, t -> lower(t) IN ({words})))"


@register(
    "doc_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKENS_SQL}) AS INTEGER) AS n_tokens,
           CAST(length(text) AS INTEGER) AS n_chars_actual,
           round(CASE WHEN length(text) = 0 THEN 0.0
                 ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE) / length(text) END, 6) AS punct_ratio,
           round(CASE WHEN len({_TOKENS_SQL}) = 0 THEN 0.0
                 ELSE CAST({_sw_hits_sql('en')} AS DOUBLE) / len({_TOKENS_SQL}) END, 6) AS stopword_ratio
    FROM documents
    """,
    doc="Per-document token/char counts + punctuation & stopword ratios (quality filters).",
)
def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        token_count("text").cast("int").alias("n_tokens"),
        F.length("text").cast("int").alias("n_chars_actual"),
        F.round(punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(stopword_ratio("text", "en"), 6).alias("stopword_ratio"),
    )


@register(
    "doc_quality_filter",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, source,
        round((
          (CASE WHEN length(text) BETWEEN 50 AND 5000 THEN 1.0
                WHEN length(text) = 0 THEN 0.0 ELSE 0.5 END) +
          (CASE WHEN (CASE WHEN length(text)=0 THEN 0.0
                      ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)/length(text) END) <= 0.2
                THEN 1.0 ELSE 0.5 END) +
          (CASE WHEN (CASE WHEN len({_TOKENS_SQL})=0 THEN 0.0
                      ELSE CAST({_sw_hits_sql('en')} AS DOUBLE)/len({_TOKENS_SQL}) END) >= 0.05
                THEN 1.0 ELSE 0.5 END)
        ) / 3.0, 6) AS quality
      FROM documents
    )
    SELECT doc_id, lang, source, quality FROM scored WHERE quality >= 0.8
    """,
    doc="Composite quality score + filter — the pre-training data gate.",
)
def q_doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    return d.select(
        "doc_id", "lang", "source", F.round(quality_score("text"), 6).alias("quality")
    ).filter(F.col("quality") >= 0.8)


@register(
    "doc_langid",
    oracle=f"""
    WITH hits AS (
      SELECT doc_id, lang AS lang_actual,
             {_sw_hits_sql('en')} AS en_h, {_sw_hits_sql('es')} AS es_h,
             {_sw_hits_sql('de')} AS de_h, {_sw_hits_sql('fr')} AS fr_h,
             {_sw_hits_sql('zh')} AS zh_h
      FROM documents
    )
    SELECT doc_id, lang_actual,
           CASE WHEN en_h >= es_h AND en_h >= de_h AND en_h >= fr_h AND en_h >= zh_h THEN 'en'
                WHEN es_h >= de_h AND es_h >= fr_h AND es_h >= zh_h THEN 'es'
                WHEN de_h >= fr_h AND de_h >= zh_h THEN 'de'
                WHEN fr_h >= zh_h THEN 'fr'
                ELSE 'zh' END AS lang_pred
    FROM hits
    """,
    doc="Stopword-profile language ID (first-preference tie-break en>es>de>fr>zh).",
)
def q_doc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    toks = tokens(F.col("text"))

    def _hits(lang: str):
        # NB: the lambda must be unary — a second (defaulted) parameter would
        # be bound to the HOF's index argument.
        words = STOPWORDS[lang]
        return F.size(F.filter(toks, lambda t: F.lower(t).isin(words)))

    hit_cols = {lang: _hits(lang) for lang in ["en", "es", "de", "fr", "zh"]}
    en, es, de, fr, zh = (hit_cols[x] for x in ["en", "es", "de", "fr", "zh"])
    pred = (
        F.when((en >= es) & (en >= de) & (en >= fr) & (en >= zh), "en")
        .when((es >= de) & (es >= fr) & (es >= zh), "es")
        .when((de >= fr) & (de >= zh), "de")
        .when(fr >= zh, "fr")
        .otherwise("zh")
    )
    return d.select("doc_id", F.col("lang").alias("lang_actual"), pred.alias("lang_pred"))


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           CASE WHEN length(text) = 0 THEN 0
                ELSE list_reduce(
                  list_transform(range(1, length(text) + 1), i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)),
                  (acc, x) -> (acc * 31 + x) % 1000000007) END AS fingerprint
    FROM documents
    """,
    doc="Deterministic polynomial rolling-hash document fingerprint (engine-reproducible).",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    return d.select("doc_id", rolling_hash("text").alias("fingerprint"))


@register(
    "doc_top_ngrams",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents),
    grams AS (
      SELECT unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS ngram
      FROM toks WHERE len(t) >= 3
    )
    SELECT ngram, COUNT(*) AS n_occurrences
    FROM grams GROUP BY ngram
    ORDER BY n_occurrences DESC, ngram LIMIT 20
    """,
    doc="Corpus-wide top-k word trigrams: explode → count → top-k with tiebreak.",
)
def q_doc_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    return (
        d.select(F.explode(word_ngrams("text", 3)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "ngram")
        .limit(20)
    )


@register(
    "doc_tokens_per_source",
    oracle=f"""
    SELECT source,
           CAST(SUM(len({_TOKENS_SQL})) AS BIGINT) AS total_tokens,
           CAST(CAST(SUM(len({_TOKENS_SQL})) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_tokens,
           COUNT(*) AS n_docs
    FROM documents GROUP BY source
    """,
    doc="Token budget accounting per source — the sizing query for training-data mixes.",
)
def q_doc_tokens_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    return d.groupBy("source").agg(
        F.sum(token_count("text")).alias("total_tokens"),
        (F.sum(token_count("text")).cast("double") / F.count("*"))
        .cast("double")
        .alias("avg_tokens"),
        F.count("*").alias("n_docs"),
    )


@register(
    "doc_bpe_token_estimate",
    oracle=f"""
    SELECT doc_id,
           CAST(list_reduce(list_transform({_TOKENS_SQL}, w -> CAST(ceil(length(w) / 4.0) AS BIGINT)),
                            (a, b) -> a + b)
                + length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS BIGINT) AS bpe_tokens
    FROM documents WHERE length(trim(text)) > 0
    """,
    doc="BPE-ish sub-word token estimate: ceil(len/4) pieces per word + punct marks.",
)
def q_doc_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import bpe_ish_token_count

    d = load_table(spark, "documents", sf_dir)
    return d.filter(F.length(F.trim("text")) > 0).select(
        "doc_id", bpe_ish_token_count("text").cast("bigint").alias("bpe_tokens")
    )


@register(
    "doc_top_char_shingles",
    oracle="""
    WITH g AS (
      SELECT unnest(list_transform(range(1, greatest(length(text) - 4, 0) + 1),
                                   i -> substring(text, i, 5))) AS shingle
      FROM documents WHERE length(text) >= 5
    )
    SELECT shingle, COUNT(*) AS n FROM g
    GROUP BY shingle ORDER BY n DESC, shingle LIMIT 20
    """,
    doc="Top character 5-gram shingles corpus-wide (the SimHash/MinHash feature space).",
)
def q_doc_top_char_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import char_ngrams

    d = load_table(spark, "documents", sf_dir)
    return (
        d.filter(F.length("text") >= 5)
        .select(F.explode(char_ngrams("text", 5)).alias("shingle"))
        .groupBy("shingle")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "shingle")
        .limit(20)
    )


@register(
    "doc_context_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_PACK_SHARD_SQL} AS shard, len({_TOKENS_SQL}) AS n_tokens
      FROM documents WHERE length(trim(text)) > 0
    ),
    c AS (
      SELECT doc_id, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT doc_id, CAST(shard AS INTEGER) AS shard,
           CAST(n_tokens AS INTEGER) AS n_tokens,
           CAST((cum - n_tokens) // 2048 AS INTEGER) AS bin_in_shard
    FROM c
    """,
    doc="Context-window packing: sequential-fill of documents into 2048-token "
    "bins, PER HASH SHARD (16 shards here; one per task at scale). The "
    "cumulative-sum window is partitioned by shard, so no single-partition "
    "global sort exists anywhere in the plan — each shard fills its own "
    "bins independently, which is exactly how a 100 TB packing job ships "
    "(bin ids are only ever consumed shard-locally by the trainer).",
)
def q_doc_context_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from .training import split_hash

    d = load_table(spark, "documents", sf_dir).filter(F.length(F.trim("text")) > 0)
    shard = split_hash("doc_id") % 16
    t = d.select(
        "doc_id", shard.alias("shard"), token_count("text").alias("n_tokens")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.select(
        "doc_id",
        F.col("shard").cast("int").alias("shard"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048)
        .cast("int")
        .alias("bin_in_shard"),
    )


@register(
    "doc_vocabulary",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS word FROM documents
    )
    SELECT word, COUNT(*) AS term_freq, COUNT(DISTINCT doc_id) AS doc_freq
    FROM w GROUP BY word
    ORDER BY term_freq DESC, word LIMIT 50
    """,
    doc="Vocabulary build: term frequency + document frequency per word, "
    "top-50 (the tokenizer-training precursor).",
)
def q_doc_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    w = d.select("doc_id", F.explode(tokens("text")).alias("word"))
    return (
        w.groupBy("word")
        .agg(F.count("*").alias("term_freq"), F.countDistinct("doc_id").alias("doc_freq"))
        .orderBy(F.desc("term_freq"), "word")
        .limit(50)
    )


def _funnel_oracle() -> str:
    """Compose the funnel from the quality-filter and survivorship oracles
    verbatim (parenthesized WITH-subqueries), then count each stage."""
    from ..registry import REGISTRY
    from .training import _SPLIT_HASH_SQL

    quality = REGISTRY["doc_quality_filter"].oracle
    surv = REGISTRY["dedup_survivors"].oracle
    bucket = f"{_SPLIT_HASH_SQL} % 100"
    return f"""
    WITH quality AS (SELECT doc_id FROM ({quality})),
    surv AS (SELECT doc_id FROM ({surv}) WHERE is_survivor),
    kept AS (SELECT q.doc_id FROM quality q JOIN surv s ON s.doc_id = q.doc_id)
    SELECT '00_raw' AS stage, COUNT(*) AS n FROM documents
    UNION ALL SELECT '01_quality', COUNT(*) FROM quality
    UNION ALL SELECT '02_near_dedup', COUNT(*) FROM kept
    UNION ALL
    SELECT stage, COUNT(*) FROM (
      SELECT CASE WHEN {bucket} < 80 THEN '03_train'
                  WHEN {bucket} < 90 THEN '04_val'
                  ELSE '05_test' END AS stage
      FROM kept
    ) GROUP BY stage
    """


@register(
    "curation_funnel",
    oracle=_funnel_oracle(),
    doc="End-to-end curation funnel report: raw -> quality-filtered -> "
    "near-dup-deduplicated (LSH survivors) -> per-split counts — the "
    "one-page summary a training-data pipeline publishes per snapshot. "
    "Demonstrates operator COMPOSITION: both upstream stages run as "
    "registered operators and intersect on doc_id sets (left-semi joins "
    "of 8-byte keys, never payloads); the report itself is six rows. "
    "Oracle composes the upstream oracles verbatim, so the whole chain "
    "is value-gated.",
)
def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training import split_bucket
    from .training2 import q_dedup_survivors

    d = load_table(spark, "documents", sf_dir)
    quality = q_doc_quality_filter(spark, sf_dir).select("doc_id")
    surv = q_dedup_survivors(spark, sf_dir).filter("is_survivor").select("doc_id")
    kept = quality.join(surv, "doc_id", "left_semi")

    raw_n = d.agg(F.count("*").alias("n")).select(F.lit("00_raw").alias("stage"), "n")
    q_n = quality.agg(F.count("*").alias("n")).select(
        F.lit("01_quality").alias("stage"), "n"
    )
    kept_n = kept.agg(F.count("*").alias("n")).select(
        F.lit("02_near_dedup").alias("stage"), "n"
    )
    b = split_bucket("doc_id")
    split_n = (
        kept.select(
            F.when(b < 80, "03_train").when(b < 90, "04_val").otherwise("05_test").alias("stage")
        )
        .groupBy("stage")
        .agg(F.count("*").alias("n"))
    )
    return raw_n.unionAll(q_n).unionAll(kept_n).unionAll(split_n)


_WINNOW_W = 4  # fingerprint window: one fingerprint per w consecutive grams
_POS_PACK = 4294967296  # 2^32: pack (h, pos) -> h*2^32 + (2^32 - pos)
_WINNOW_MAX_DF = 10  # MOSS -m: ignore fingerprints in >= this many docs


@register(
    "doc_winnowing",
    # The MOSS winnowing rule (min hash per window, ties -> RIGHTMOST
    # position) becomes a plain integer MIN by packing (h asc, pos desc)
    # into one BIGINT: h*2^32 + (2^32 - pos). h < 1e9 so the product stays
    # under int64; unpacking is integer div/mod — identical in both engines.
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENS_SQL} AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, CAST(i AS INTEGER) AS pos,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
      FROM toks, unnest(range(1, greatest(len(t) - 1, 1))) AS u(i)
      WHERE len(t) >= 3
    ),
    h AS (
      SELECT doc_id, pos,
             list_reduce(list_transform(range(1, length(g) + 1),
               c -> CAST(ascii(substring(g, c, 1)) AS BIGINT)),
               (acc, x) -> (acc * 31 + x) % 1000000007) AS hh
      FROM grams
    ),
    wins AS (
      SELECT doc_id, pos,
             min(hh * {_POS_PACK} + ({_POS_PACK} - pos))
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS m,
             COUNT(*) OVER (PARTITION BY doc_id) AS g_cnt
      FROM h
    )
    SELECT DISTINCT doc_id,
           m // {_POS_PACK} AS fp_hash,
           CAST({_POS_PACK} - (m % {_POS_PACK}) AS INTEGER) AS fp_pos
    FROM wins WHERE pos <= greatest(g_cnt - {_WINNOW_W} + 1, 1)
    """,
    doc="Winnowing document fingerprints (the MOSS algorithm): positional "
    "word-trigram rolling hashes, minimum per sliding window of "
    f"{_WINNOW_W} (ties to the rightmost position), distinct selected "
    "(hash, position) pairs per doc. Guarantees a shared fingerprint for "
    "any sufficiently long verbatim overlap — the local-dedup primitive "
    "exact hashing misses and MinHash only answers globally. Winnowing "
    "is per-document arithmetic, so the whole selection runs MAP-SIDE "
    "as array HOFs (gram hashes -> packed keys -> sliding array_min -> "
    "array_distinct): zero exchanges, vs the naive shape that explodes "
    "|grams| rows through two doc_id windows and a distinct (measured "
    "8x slower at 10x sf0.1). Two localCheckpoint barriers pin the "
    "token and packed-key arrays so CollapseProject cannot inline them "
    "into downstream lambdas (the repo's documented HOF re-evaluation "
    "trap, O(len^2) otherwise). Output is ~|grams|/w 8-byte rows/doc.",
)
def q_doc_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import fan_out

    d = load_table(spark, "documents", sf_dir)
    toks = (
        fan_out(d, "doc_id")
        .select("doc_id", tokens("text").alias("w"))
        .localCheckpoint(eager=True)
    )
    from ..functions.text import word_ngrams_from_tokens

    n_grams = F.size("w") - F.lit(2)
    grams = word_ngrams_from_tokens("w", 3)
    # pack (h asc, pos desc) into one BIGINT so the window rule "min hash,
    # ties -> rightmost" is a plain array_min (same packing as the oracle)
    keys = F.zip_with(
        F.transform(grams, lambda g: rolling_hash(g)),
        F.when(n_grams <= 0, F.array().cast("array<int>")).otherwise(
            F.sequence(F.lit(1), n_grams)
        ),
        lambda h, i: h * _POS_PACK + (F.lit(_POS_PACK) - i),
    )
    keyed = toks.select("doc_id", keys.alias("keys")).localCheckpoint(eager=True)
    n_pos = F.greatest(F.size("keys") - _WINNOW_W + 1, F.lit(1))
    mins = F.when(F.size("keys") == 0, F.array().cast("array<bigint>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_pos),
            lambda p: F.array_min(F.slice("keys", p, _WINNOW_W)),
        )
    )
    return keyed.select(
        "doc_id", F.explode(F.array_distinct(mins)).alias("m")
    ).select(
        "doc_id",
        F.expr(f"m div {_POS_PACK}").alias("fp_hash"),
        (F.lit(_POS_PACK) - F.col("m") % _POS_PACK).cast("int").alias("fp_pos"),
    )


@register(
    "winnowing_overlap_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENS_SQL} AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, CAST(i AS INTEGER) AS pos,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
      FROM toks, unnest(range(1, greatest(len(t) - 1, 1))) AS u(i)
      WHERE len(t) >= 3
    ),
    h AS (
      SELECT doc_id, pos,
             list_reduce(list_transform(range(1, length(g) + 1),
               c -> CAST(ascii(substring(g, c, 1)) AS BIGINT)),
               (acc, x) -> (acc * 31 + x) % 1000000007) AS hh
      FROM grams
    ),
    wins AS (
      SELECT doc_id, pos,
             min(hh * {_POS_PACK} + ({_POS_PACK} - pos))
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS m,
             COUNT(*) OVER (PARTITION BY doc_id) AS g_cnt
      FROM h
    ),
    fp AS (
      SELECT DISTINCT doc_id, m // {_POS_PACK} AS fp_hash
      FROM wins WHERE pos <= greatest(g_cnt - {_WINNOW_W} + 1, 1)
    ),
    fpk AS (
      SELECT doc_id, fp_hash FROM fp
      WHERE fp_hash IN (
        SELECT fp_hash FROM fp GROUP BY fp_hash
        HAVING COUNT(*) < {_WINNOW_MAX_DF}
      )
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
    FROM fpk a JOIN fpk b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
    """,
    doc="Local-overlap detection on top of winnowing: doc pairs sharing >= 2 "
    "selected fingerprints, with the shared count — how MOSS surfaces "
    "verbatim passage reuse. Fingerprints selected in >= "
    f"{_WINNOW_MAX_DF} distinct docs are dropped first (MOSS's own -m "
    "knob: a passage shared THAT widely is boilerplate, not reuse) — "
    "the df cut that bounds every join bucket, so one viral passage "
    "cannot make a bucket quadratic at corpus scale. The self-join then "
    "keys on the 8-byte fingerprint hash, never text; per-window "
    "selection bounds fingerprint count to ~|grams|/w per doc.",
)
def q_winnowing_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # a hash can be selected at several positions within one doc; pair
    # counting is over distinct (doc, hash) like the oracle's fp CTE
    fp = q_doc_winnowing(spark, sf_dir).select("doc_id", "fp_hash").distinct()
    hot = (
        fp.groupBy("fp_hash")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= _WINNOW_MAX_DF)
        .select("fp_hash")
    )
    # hot set is tiny by definition (head of the df distribution) —
    # broadcast anti-join, same shape as boilerplate_removal's
    fpk = fp.join(F.broadcast(hot), "fp_hash", "left_anti")
    a = fpk.select(F.col("doc_id").alias("doc_a"), "fp_hash")
    b = fpk.select(F.col("doc_id").alias("doc_b"), "fp_hash")
    return (
        a.join(b, ["fp_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


@register(
    "doc_top_terms",
    # Classic TF-IDF keyword extraction, minus the log: score = tf * N / df
    # is order-isomorphic to tf * (N/df) and stays in exact integer + one
    # IEEE division, so rankings are engine-identical (log(x) rounding is
    # NOT guaranteed identical across libm implementations — see NOTES).
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             tf.tf * CAST(n.n_docs AS DOUBLE) / df.df AS score
      FROM tf JOIN df ON df.term = tf.term CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, round(score, 6) AS score, rk FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
    doc="Top-3 characteristic terms per document by log-free TF-IDF "
    "(tf * N / df — same ranking as tf-idf for fixed N, none of libm's "
    "cross-engine log() rounding variance). Two narrow aggregations "
    "(doc-term counts, term document-frequencies) joined on the term "
    "string, a broadcast scalar for N, and a per-doc window — every "
    "shuffle keys on term or doc_id, never text bodies.",
)
def q_doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..functions.text import tokens

    d = load_table(spark, "documents", sf_dir)
    toks = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (F.col("tf") * F.col("n_docs").cast("double") / F.col("df")).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "df", F.round("score", 6).alias("score"), "rk")
    )


def _packing_efficiency_oracle() -> str:
    """Compose the context-packing oracle verbatim, then audit bin fill."""
    from ..registry import REGISTRY

    packing = REGISTRY["doc_context_packing"].oracle
    return f"""
    WITH packed AS (SELECT * FROM ({packing})),
    bins AS (
      SELECT shard, bin_in_shard,
             COUNT(*) AS n_docs, SUM(n_tokens) AS bin_tokens
      FROM packed GROUP BY 1, 2
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) * 2048 AS BIGINT) AS capacity,
           round(SUM(bin_tokens) / CAST(COUNT(*) * 2048 AS DOUBLE), 4)
             AS fill_rate,
           CAST(MAX(bin_tokens) AS BIGINT) AS max_bin_tokens
    FROM bins GROUP BY shard ORDER BY shard
    """


@register(
    "packing_efficiency",
    oracle=_packing_efficiency_oracle(),
    doc="Packing-quality audit over doc_context_packing (composed "
    "verbatim on both engines): per shard, the bin count, packed token "
    "mass, nominal capacity (bins x 2048) and fill rate — the number a "
    "training job watches to know how much compute the packer wastes "
    "as padding. max_bin_tokens > 2048 quantifies start-offset bin "
    "overflow (documents straddle bin boundaries in offset packing). "
    "Runs entirely on the |shards x bins| aggregate.",
)
def q_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    packed = q_doc_context_packing(spark, sf_dir)
    bins = packed.groupBy("shard", "bin_in_shard").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("bin_tokens")
    )
    return (
        bins.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_bins"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("bin_tokens").cast("long").alias("total_tokens"),
            (F.count("*") * 2048).cast("long").alias("capacity"),
            F.round(
                F.sum("bin_tokens") / (F.count("*") * 2048).cast("double"), 4
            ).alias("fill_rate"),
            F.max("bin_tokens").cast("long").alias("max_bin_tokens"),
        )
        .orderBy("shard")
    )


@register(
    "doc_heaps_law",
    oracle=f"""
    WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
    cps AS (
      SELECT CAST(k AS BIGINT) AS decile, (m * k) // 10 AS cut_doc_id
      FROM mx, range(1, 11) AS t(k)
    ),
    first AS (
      -- blank docs: string_split_regex(trim(''), '\\s+') yields [''] in
      -- DuckDB while Spark's tokens() yields an empty array; drop the
      -- empty token so parity holds structurally even if a fixture
      -- gains a blank document
      SELECT word, MIN(doc_id) AS fd FROM (
        SELECT doc_id, unnest({_TOKENS_SQL}) AS word FROM documents
      ) WHERE word <> '' GROUP BY word
    )
    SELECT c.decile, c.cut_doc_id,
           (SELECT COUNT(*) FROM documents d
             WHERE d.doc_id <= c.cut_doc_id) AS n_docs,
           (SELECT COUNT(*) FROM first f
             WHERE f.fd <= c.cut_doc_id) AS vocab
    FROM cps c
    """,
    doc="Vocabulary-growth (Heaps'-law) checkpoints: distinct-token count "
    "of every doc-id-prefix decile of the corpus — the curve tokenizer "
    "sizing and OOV budgeting read (V(n) ~ K*n^beta; sublinear growth "
    "flattening early signals a repetitive corpus). Exact, windowless: "
    "per-token FIRST occurrence is a plain min-aggregate, and each "
    "checkpoint's vocabulary is the count of tokens whose first "
    "occurrence falls at-or-before the cut, computed by broadcasting "
    "the 10-row checkpoint list against the vocabulary table (vocab x "
    "10 map-side rows, one 10-group aggregate). No global sort, no "
    "running-distinct window; at 100 TB the vocabulary table is the "
    "only shuffle and it is the same one doc_vocabulary already pays.",
)
def q_doc_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    cps = (
        d.agg(F.max("doc_id").alias("m"))
        .select(
            F.explode(F.array([F.lit(k) for k in range(1, 11)])).alias("decile"), "m"
        )
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.expr("(m * decile) div 10").alias("cut_doc_id"),
        )
    )
    first = (
        d.select("doc_id", F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.min("doc_id").alias("fd"))
    )
    vocab = (
        first.join(F.broadcast(cps), F.col("fd") <= F.col("cut_doc_id"))
        .groupBy("decile", "cut_doc_id")
        .agg(F.count("*").alias("v"))
    )
    ndocs = (
        d.select("doc_id")
        .join(F.broadcast(cps), F.col("doc_id") <= F.col("cut_doc_id"))
        .groupBy("decile", "cut_doc_id")
        .agg(F.count("*").alias("n"))
    )
    # checkpoints below the smallest doc_id must surface as zero rows
    # (structural, not fixture-dependent), so build from the full list
    return (
        cps.join(ndocs, ["decile", "cut_doc_id"], "left")
        .join(vocab, ["decile", "cut_doc_id"], "left")
        .select(
            "decile",
            "cut_doc_id",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("v", F.lit(0)).cast("long").alias("vocab"),
        )
    )


# ---------------------------------------------------------------------------
# Zipf slope per source: the rank-frequency twin of doc_heaps_law
# ---------------------------------------------------------------------------

# OLS fit of flog2(freq) against flog2(rank) — Zipf's law says
# freq(r) ~ r^(-s), so the bit-quantized log-log regression recovers -s.
# Every sum (n, Sx, Sy, Sxy, Sxx) is an exact BIGINT of small integer
# products (ranks and freqs are corpus-bounded; flog2 of both is < 64),
# so the accumulation is order-independent and engine-portable; only the
# FINAL slope is one IEEE double division. Same integer-bits convention
# as doc_rarity_bits / doc_bigram_surprise (selection.py:_flog2).
_ZIPF_ORACLE = """
WITH tf AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS f
  FROM (
    SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS w
    FROM documents
  ) WHERE w <> '' GROUP BY source, w
),
ranked AS (
  SELECT source,
         length(to_base(row_number() OVER (PARTITION BY source
                                           ORDER BY f DESC, w), 2)) - 1 AS x,
         length(to_base(f, 2)) - 1 AS y
  FROM tf
),
sums AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM ranked GROUP BY source
)
SELECT source, n_types,
       round(CAST(-(n_types * sxy - sx * sy) AS DOUBLE)
             / (n_types * sxx - sx * sx), 6) AS zipf_slope
FROM sums
WHERE n_types * sxx - sx * sx <> 0
ORDER BY source
"""


@register(
    "doc_zipf_slope",
    oracle=_ZIPF_ORACLE,
    doc="Per-source Zipf slope: the rank-frequency power-law exponent "
    "fitted by OLS over bit-quantized logs — flog2(freq) against "
    "flog2(rank of the token by frequency) — the twin diagnostic of "
    "doc_heaps_law (type growth) for comparing sources' token "
    "distributions: natural text sits near slope ~1, templated or "
    "synthetic text flattens or steepens. All five regression sums are "
    "exact BIGINTs of bounded integer products (order-independent, "
    "engine-portable — the same integer-bits convention as "
    "doc_rarity_bits); only the final slope is one IEEE double "
    "division, identical in both engines. Degenerate sources (all "
    "ranks in one bit bucket) are excluded by the zero-variance guard. "
    "Scale shape: one token-keyed aggregation (the shuffle every "
    "vocabulary kernel pays), a per-source rank window over the "
    "VOCABULARY (not the corpus), and a |sources|-row final aggregate.",
)
def q_doc_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from .selection import _flog2

    d = load_table(spark, "documents", sf_dir)
    tf = (
        d.select("source", F.explode(tokens("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").cast("long").alias("f"))
    )
    wnd = Window.partitionBy("source").orderBy(F.desc("f"), "w")
    xy = tf.select(
        "source",
        _flog2(F.row_number().over(wnd)).cast("long").alias("x"),
        _flog2(F.col("f")).cast("long").alias("y"),
    )
    sums = xy.groupBy("source").agg(
        F.count("*").cast("long").alias("n_types"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("n_types") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        sums.filter(den != 0)
        .select(
            "source",
            "n_types",
            F.round(
                (-(F.col("n_types") * F.col("sxy") - F.col("sx") * F.col("sy")))
                .cast("double")
                / den,
                6,
            ).alias("zipf_slope"),
        )
        .orderBy("source")
    )


@register(
    "source_quality_calibration",
    # Integer-exact end to end: the composite score uses integer `div`
    # (Spark `div` == DuckDB `//`), the within-source percentile is a
    # cumulative count over the tiny (source, score) aggregate, and the
    # keep rule compares integer per-mille ranks — no doubles anywhere,
    # so cross-engine parity is exact by construction.
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             (1000000 * {_sw_hits_sql('en')})
               // GREATEST(len({_TOKENS_SQL}), 1)
           + (1000000 * len(list_distinct(list_transform({_TOKENS_SQL},
                 t -> lower(t)))))
               // GREATEST(len({_TOKENS_SQL}), 1) AS score
      FROM documents
    ),
    hist AS (
      SELECT source, score, COUNT(*) AS c FROM scored GROUP BY 1, 2
    ),
    ranked AS (
      SELECT source, score,
             COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
             SUM(c) OVER (PARTITION BY source) AS n_src
      FROM hist
    )
    SELECT s.doc_id, s.source, CAST(s.score AS BIGINT) AS score,
           CAST((1000000 * r.below) // r.n_src AS BIGINT) AS pct_micro
    FROM scored s JOIN ranked r ON s.source = r.source AND s.score = r.score
    WHERE (1000000 * r.below) // r.n_src >= 500000
    """,
    doc="Per-source quality-score calibration — the FineWeb/CCNet 'score "
    "distributions differ per dump' problem: a single global threshold "
    "over-prunes weak sources and under-prunes strong ones, so the cut "
    "is taken at a WITHIN-SOURCE percentile instead. Score = integer "
    "composite (stopword density + lexical diversity, both per-million "
    "via integer div); rank = strictly-below cumulative count over the "
    "tiny (source, score) histogram (the curriculum_bins scale-safe "
    "exact-rank idiom — NO per-doc window, no single-partition sort); "
    "docs at or above the median of their own source survive. Shuffle "
    "discipline at 100 TB: one map-side-combined aggregate over "
    "(source, score), a |sources x scores|-row window, and a broadcast "
    "join back onto the scan — the corpus shuffles zero payload bytes.",
)
def q_source_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, "documents", sf_dir)
    toks = tokens("text")
    n = F.greatest(F.size(toks), F.lit(1))
    sw = STOPWORDS["en"]
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(sw)))
    distinct_toks = F.size(F.array_distinct(F.transform(toks, F.lower)))
    scored = d.select(
        "doc_id",
        "source",
        (
            (hits.cast("bigint") * 1000000).cast("bigint")
        ).alias("_sw_num"),
        (
            (distinct_toks.cast("bigint") * 1000000).cast("bigint")
        ).alias("_dv_num"),
        n.cast("bigint").alias("_n"),
    ).select(
        "doc_id",
        "source",
        (F.expr("_sw_num div _n") + F.expr("_dv_num div _n")).alias("score"),
        # both the histogram and the keep-join read this frame; checkpoint
        # the 3-column scored projection so the token-scoring scan runs
        # ONCE (the split_contamination rule) — ~24 bytes/doc pinned vs a
        # second full array-ops pass over the corpus
    ).localCheckpoint(eager=True)
    hist = scored.groupBy("source", "score").agg(
        F.count("*").cast("long").alias("c")
    )
    w_below = (
        Window.partitionBy("source")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = hist.select(
        "source",
        "score",
        F.coalesce(F.sum("c").over(w_below), F.lit(0)).alias("below"),
        F.sum("c").over(Window.partitionBy("source")).alias("n_src"),
    ).withColumn("pct_micro", F.expr("(1000000 * below) div n_src"))
    return (
        scored.join(
            F.broadcast(ranked.filter(F.col("pct_micro") >= 500000)),
            ["source", "score"],
        )
        .select("doc_id", "source", "score", "pct_micro")
    )


@register(
    "doc_langid_margin",
    oracle=f"""
    WITH hits AS (
      SELECT doc_id, lang AS lang_actual,
             {_sw_hits_sql('en')} AS en_h, {_sw_hits_sql('es')} AS es_h,
             {_sw_hits_sql('de')} AS de_h, {_sw_hits_sql('fr')} AS fr_h,
             {_sw_hits_sql('zh')} AS zh_h
      FROM documents
    ),
    pred AS (
      SELECT *,
             CASE WHEN en_h >= es_h AND en_h >= de_h AND en_h >= fr_h AND en_h >= zh_h THEN 'en'
                  WHEN es_h >= de_h AND es_h >= fr_h AND es_h >= zh_h THEN 'es'
                  WHEN de_h >= fr_h AND de_h >= zh_h THEN 'de'
                  WHEN fr_h >= zh_h THEN 'fr'
                  ELSE 'zh' END AS lang_pred
      FROM hits
    )
    SELECT doc_id, lang_actual, lang_pred,
           CAST(GREATEST(en_h, es_h, de_h, fr_h, zh_h) AS BIGINT) AS best_hits,
           CAST(CASE lang_pred
                WHEN 'en' THEN GREATEST(es_h, de_h, fr_h, zh_h)
                WHEN 'es' THEN GREATEST(en_h, de_h, fr_h, zh_h)
                WHEN 'de' THEN GREATEST(en_h, es_h, fr_h, zh_h)
                WHEN 'fr' THEN GREATEST(en_h, es_h, de_h, zh_h)
                ELSE GREATEST(en_h, es_h, de_h, fr_h) END AS BIGINT) AS second_hits,
           CAST(GREATEST(en_h, es_h, de_h, fr_h, zh_h)
              - CASE lang_pred
                WHEN 'en' THEN GREATEST(es_h, de_h, fr_h, zh_h)
                WHEN 'es' THEN GREATEST(en_h, de_h, fr_h, zh_h)
                WHEN 'de' THEN GREATEST(en_h, es_h, fr_h, zh_h)
                WHEN 'fr' THEN GREATEST(en_h, es_h, de_h, zh_h)
                ELSE GREATEST(en_h, es_h, de_h, fr_h) END AS BIGINT) AS margin,
           CAST(CASE WHEN GREATEST(en_h, es_h, de_h, fr_h, zh_h) = 0
                       OR GREATEST(en_h, es_h, de_h, fr_h, zh_h)
                        = CASE lang_pred
                          WHEN 'en' THEN GREATEST(es_h, de_h, fr_h, zh_h)
                          WHEN 'es' THEN GREATEST(en_h, de_h, fr_h, zh_h)
                          WHEN 'de' THEN GREATEST(en_h, es_h, fr_h, zh_h)
                          WHEN 'fr' THEN GREATEST(en_h, es_h, de_h, zh_h)
                          ELSE GREATEST(en_h, es_h, de_h, fr_h) END
                     THEN 1 ELSE 0 END AS INTEGER) AS ambiguous
    FROM pred
    """,
    doc="Language-ID confidence report — the code-switching/ambiguity "
    "audit on top of doc_langid: per doc the winning language's "
    "stopword evidence, the runner-up's, their margin, and an "
    "ambiguous flag (zero evidence or a tie) — the rule multilingual "
    "cleaning uses to route low-confidence docs to a heavier model or "
    "drop them (a near-zero margin with non-zero hits in two profiles "
    "is the code-switching signature). All integer hit counts and CASE "
    "arithmetic, identical in both engines — exact parity by "
    "construction. Map-only: one scan, zero shuffles.",
)
def q_doc_langid_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    toks = tokens(F.col("text"))

    def _hits(lang: str):
        words = STOPWORDS[lang]
        return F.size(F.filter(toks, lambda t: F.lower(t).isin(words))).cast("long")

    langs = ["en", "es", "de", "fr", "zh"]
    h = d.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        *[_hits(lg).alias(f"{lg}_h") for lg in langs],
    )
    en, es, de, fr, zh = (F.col(f"{lg}_h") for lg in langs)
    pred = (
        F.when((en >= es) & (en >= de) & (en >= fr) & (en >= zh), "en")
        .when((es >= de) & (es >= fr) & (es >= zh), "es")
        .when((de >= fr) & (de >= zh), "de")
        .when(fr >= zh, "fr")
        .otherwise("zh")
    )
    best = F.greatest(en, es, de, fr, zh)
    others = {
        "en": F.greatest(es, de, fr, zh),
        "es": F.greatest(en, de, fr, zh),
        "de": F.greatest(en, es, fr, zh),
        "fr": F.greatest(en, es, de, zh),
        "zh": F.greatest(en, es, de, fr),
    }
    p = h.withColumn("lang_pred", pred)
    second = (
        F.when(F.col("lang_pred") == "en", others["en"])
        .when(F.col("lang_pred") == "es", others["es"])
        .when(F.col("lang_pred") == "de", others["de"])
        .when(F.col("lang_pred") == "fr", others["fr"])
        .otherwise(others["zh"])
    )
    return p.select(
        "doc_id",
        "lang_actual",
        "lang_pred",
        best.alias("best_hits"),
        second.alias("second_hits"),
        (best - second).alias("margin"),
        F.when((best == 0) | (best == second), 1)
        .otherwise(0)
        .cast("int")
        .alias("ambiguous"),
    )


# --- context-length sweep -----------------------------------------------------

# Candidate max_seq_len budgets (whitespace tokens), spanning the
# fixture's document-length distribution (mean ~56 tokens) so the
# truncation curve is non-degenerate: the sweep answers the question a
# team asks BEFORE running doc_context_packing's packer — which budget
# loses how much corpus? (A production corpus would sweep 512..8192;
# the budgets are a knob, the arithmetic is the operator.)
CTX_SWEEP = [16, 32, 64, 128]


@register(
    "context_length_sweep",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, len({_TOKENS_SQL}) AS n_tokens
      FROM documents WHERE length(trim(text)) > 0
    ),
    sweep AS (SELECT unnest(ARRAY{CTX_SWEEP}) AS max_len)
    SELECT CAST(s.max_len AS BIGINT) AS max_len,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_tokens > s.max_len THEN 1 ELSE 0 END) AS BIGINT)
             AS n_truncated,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
           CAST(SUM(GREATEST(n_tokens - s.max_len, 0)) AS BIGINT) AS tokens_lost,
           round(CAST(SUM(GREATEST(n_tokens - s.max_len, 0)) AS DOUBLE)
                 / SUM(n_tokens), 6) AS frac_lost,
           CAST(SUM((LEAST(n_tokens, s.max_len) + s.max_len - 1) // s.max_len)
                AS BIGINT) AS n_seqs,
           round(CAST(SUM(n_tokens) - SUM(GREATEST(n_tokens - s.max_len, 0)) AS DOUBLE)
                 / (SUM((LEAST(n_tokens, s.max_len) + s.max_len - 1) // s.max_len)
                    * s.max_len), 6) AS pad_free_fill
    FROM t, sweep s
    GROUP BY s.max_len ORDER BY max_len
    """,
    doc="Context-budget tuner: for every candidate max_seq_len, how many "
    "documents truncate, how many tokens the corpus loses (count and "
    "fraction), how many training sequences the kept mass yields, and "
    "the fill rate a padding-free packer could reach at that budget — "
    "the table read BEFORE committing doc_context_packing's fixed bin "
    "size. The whole sweep is one corpus scan (token counts) exploded "
    "by |sweep| budgets into a |sweep|-row aggregate; exact BIGINT "
    "arithmetic throughout (ceil division as (x+L-1) div L), two "
    "rounded divisions at the end.",
)
def q_context_length_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir).filter(F.length(F.trim("text")) > 0)
    t = d.select(token_count("text").alias("n_tokens"))
    s = t.select(
        "n_tokens",
        F.explode(F.array(*[F.lit(x) for x in CTX_SWEEP])).alias("max_len"),
    )
    lost = F.greatest(F.col("n_tokens") - F.col("max_len"), F.lit(0))
    kept = F.least(F.col("n_tokens"), F.col("max_len"))
    seqs = F.expr("(least(n_tokens, max_len) + max_len - 1) div max_len")
    return (
        s.groupBy("max_len")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("n_tokens") > F.col("max_len"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_truncated"),
            F.sum("n_tokens").cast("bigint").alias("tokens_total"),
            F.sum(lost).cast("bigint").alias("tokens_lost"),
            F.round(F.sum(lost).cast("double") / F.sum("n_tokens"), 6).alias(
                "frac_lost"
            ),
            F.sum(seqs).cast("bigint").alias("n_seqs"),
            F.round(
                F.sum(kept).cast("double")
                / (F.sum(seqs) * F.first("max_len")).cast("double"),
                6,
            ).alias("pad_free_fill"),
        )
        .select(F.col("max_len").cast("bigint").alias("max_len"), "n_docs",
                "n_truncated", "tokens_total", "tokens_lost", "frac_lost",
                "n_seqs", "pad_free_fill")
        .orderBy("max_len")
    )
