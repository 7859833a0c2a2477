"""Corpus-level boilerplate removal + in-document repetition metrics.

The two pretraining-curation steps the text battery (text_analysis.py)
does not cover yet:

- **Boilerplate removal** (C4/RefinedWeb-style): a text segment that
  recurs verbatim across many documents is navigation/footer/template
  noise, not content — drop the segment, keep the document. The corpus
  has no newlines, so the segment unit is a fixed 3-word window (the
  plumbing is identical for line- or sentence-segmented text: swap the
  segmenter expression).
- **Repetition metrics** (Gopher-style): fraction of duplicated words /
  bigrams / trigrams WITHIN a document — high values flag degenerate,
  loopy text. Entirely map-side: per-row array expressions, no shuffle,
  scan speed at any corpus size.

No reference analogue (app.js has no text pipeline) — these are part of
the LLM-pipeline north star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS
from ..registry import register
from ..session import fan_out, load_table

_SEG = 3  # words per boilerplate segment
_HOT_DOCS = 5  # a segment seen in >= this many docs is boilerplate


def _tokens(docs: DataFrame) -> DataFrame:
    # checkpoint the token arrays: every downstream slice/ngram lambda
    # otherwise re-splits text per element (the repo's documented
    # CollapseProject HOF trap); fan_out spreads the single-row-group
    # local scan, no-op at real split counts
    return fan_out(docs, "doc_id").select(
        "doc_id", F.split(F.trim("text"), "\\s+").alias("w")
    ).localCheckpoint(eager=True)


@register(
    "boilerplate_removal",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
    segs AS (
      SELECT doc_id, i AS seg_idx,
             array_to_string(w[(i*{_SEG}+1):(i*{_SEG}+{_SEG})], ' ') AS seg
      FROM t, UNNEST(range(CAST(ceil(len(w)/{_SEG}.0) AS BIGINT))) AS r(i)
    ),
    freq AS (SELECT seg, COUNT(DISTINCT doc_id) AS nd FROM segs GROUP BY seg),
    tot AS (SELECT doc_id, COUNT(*) AS n_segs FROM segs GROUP BY doc_id),
    kept AS (
      SELECT s.doc_id, s.seg_idx, s.seg
      FROM segs s JOIN freq f ON f.seg = s.seg
      WHERE f.nd < {_HOT_DOCS}
    )
    SELECT k.doc_id,
           string_agg(k.seg, ' ' ORDER BY k.seg_idx) AS clean_text,
           CAST(ANY_VALUE(t.n_segs) - COUNT(*) AS BIGINT) AS n_segs_removed
    FROM kept k JOIN tot t ON t.doc_id = k.doc_id
    GROUP BY k.doc_id
    """,
    doc="Cross-document boilerplate removal: 3-word segments that appear "
    "verbatim in >= 5 distinct documents are template noise — drop the "
    "segment, reassemble the document in original order. The frequency "
    "table groups on the segment's xxhash64 (8-byte shuffle key, never "
    "the text); removal is a LEFT ANTI join of segments against the hot "
    "set (at web scale the hot set is tiny — boilerplate is by "
    "definition the head of the distribution — so AQE broadcasts it); "
    "reassembly sorts WITHIN each doc's collected segment list, no "
    "global sort. Three narrow shuffles total, payload text moves "
    "through exactly one of them (the reassembly).",
)
def q_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    toks = _tokens(d)
    n_segs = F.ceil(F.size("w") / _SEG).cast("int")
    segs = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_segs - 1),
                lambda i: F.array_join(F.slice("w", i * _SEG + 1, _SEG), " "),
            )
        ).alias("seg_idx", "seg"),
    ).select("doc_id", "seg_idx", "seg", F.xxhash64("seg").alias("h"))
    hot = (
        segs.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= _HOT_DOCS)
        .select("h")
    )
    kept = segs.join(hot, "h", "left_anti")
    totals = segs.groupBy("doc_id").agg(F.count("*").alias("n_segs"))
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))).alias("ks"),
            F.count("*").alias("n_kept"),
        )
        .join(totals, "doc_id")
        .select(
            "doc_id",
            F.array_join(F.col("ks").getField("seg"), " ").alias("clean_text"),
            (F.col("n_segs") - F.col("n_kept")).cast("bigint").alias("n_segs_removed"),
        )
    )


@register(
    "doc_repetition_metrics",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents),
    g AS (
      SELECT doc_id, w,
             list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) AS bi,
             list_transform(range(1, len(w) - 1),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS tri
      FROM t WHERE len(w) >= 3
    )
    SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
           ROUND(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 12)
             AS dup_word_frac,
           ROUND(1.0 - CAST(len(list_distinct(bi)) AS DOUBLE) / len(bi), 12)
             AS dup_bigram_frac,
           ROUND(1.0 - CAST(len(list_distinct(tri)) AS DOUBLE) / len(tri), 12)
             AS dup_trigram_frac
    FROM g
    """,
    doc="Gopher-style in-document repetition: duplicated-word / -bigram / "
    "-trigram fractions per doc (1 - distinct/total). Pure per-row array "
    "expressions over the checkpointed token array — zero shuffles, zero "
    "Python; the filter a 100 TB curation pass runs at scan speed. High "
    "fractions flag degenerate loopy text for removal before training.",
)
def q_doc_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    toks = _tokens(d).filter(F.size("w") >= 3)
    ngr = lambda k: F.transform(  # noqa: E731
        F.sequence(F.lit(1), F.size("w") - (k - 1)),
        lambda i: F.array_join(F.slice("w", i, k), " "),
    )
    withg = toks.select("doc_id", "w", ngr(2).alias("bi"), ngr(3).alias("tri"))
    frac = lambda c: F.round(  # noqa: E731
        1.0 - F.size(F.array_distinct(c)).cast("double") / F.size(c), 12
    )
    return withg.select(
        "doc_id",
        F.size("w").cast("bigint").alias("n_words"),
        frac("w").alias("dup_word_frac"),
        frac("bi").alias("dup_bigram_frac"),
        frac("tri").alias("dup_trigram_frac"),
    )


# --- Gopher-style rule report ------------------------------------------------

# thresholds adapted to this corpus (47-558 chars, no newlines); the rule
# SET is the recognizable part — word-count band, mean word length band,
# alpha-word fraction, stopword presence, symbol-to-word ratio
_GR_MIN_WORDS, _GR_MAX_WORDS = 10, 1000
_GR_MIN_MWL, _GR_MAX_MWL = 2.0, 12.0
_GR_MIN_ALPHA_FRAC = 0.8
_GR_MIN_SW_HITS = 2
_GR_MAX_SYMBOL_RATIO = 0.1

_GR_SW = ", ".join(f"'{w}'" for w in STOPWORDS["en"])


@register(
    "gopher_quality_rules",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_words,
             round(CAST(list_reduce(list_transform(w, x -> len(x)), (a, b) -> a + b) AS DOUBLE)
                   / len(w), 6) AS mean_word_len,
             round(CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
                   / len(w), 6) AS alpha_word_frac,
             len(list_filter(w, x -> lower(x) IN ({_GR_SW}))) AS sw_hits,
             round(CAST(len(list_filter(w, x -> x LIKE '%#%' OR x LIKE '%...%')) AS DOUBLE)
                   / len(w), 6) AS symbol_ratio
      FROM t WHERE len(w) > 0
    )
    SELECT doc_id, n_words, mean_word_len, alpha_word_frac,
           CAST(n_words BETWEEN {_GR_MIN_WORDS} AND {_GR_MAX_WORDS} AS BOOLEAN) AS ok_word_count,
           CAST(mean_word_len BETWEEN {_GR_MIN_MWL} AND {_GR_MAX_MWL} AS BOOLEAN) AS ok_mean_word_len,
           CAST(alpha_word_frac >= {_GR_MIN_ALPHA_FRAC} AS BOOLEAN) AS ok_alpha_words,
           CAST(sw_hits >= {_GR_MIN_SW_HITS} AS BOOLEAN) AS ok_stopwords,
           CAST(symbol_ratio <= {_GR_MAX_SYMBOL_RATIO} AS BOOLEAN) AS ok_symbols,
           CAST(n_words BETWEEN {_GR_MIN_WORDS} AND {_GR_MAX_WORDS}
                AND mean_word_len BETWEEN {_GR_MIN_MWL} AND {_GR_MAX_MWL}
                AND alpha_word_frac >= {_GR_MIN_ALPHA_FRAC}
                AND sw_hits >= {_GR_MIN_SW_HITS}
                AND symbol_ratio <= {_GR_MAX_SYMBOL_RATIO} AS BOOLEAN) AS pass_all
    FROM m
    """,
    doc="Gopher-style rule report (Rae et al. 2021 filter set, thresholds "
    "fit to this corpus): per-document word-count band, mean-word-length "
    "band, alphabetic-word fraction, stopword presence, symbol-to-word "
    "ratio — each surfaced as its own boolean plus the conjunction, the "
    "way curation pipelines audit WHY documents fail rather than just "
    "dropping them. Pure per-row array expressions over one token split "
    "— zero shuffles, scan speed at 100 TB. Mean word length divides two "
    "exact integers (IEEE-identical across engines).",
)
def q_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    toks = _tokens(d).filter(F.size("w") > 0)
    sw = STOPWORDS["en"]
    n = F.size("w").cast("bigint")
    mwl = F.round(
        F.aggregate("w", F.lit(0), lambda a, x: a + F.length(x)).cast("double") / n, 6
    )
    alpha = F.round(
        F.size(F.filter("w", lambda x: x.rlike("[a-zA-Z]"))).cast("double") / n, 6
    )
    sw_hits = F.size(F.filter("w", lambda x: F.lower(x).isin(sw)))
    sym = F.round(
        F.size(
            F.filter("w", lambda x: x.contains("#") | x.contains("..."))
        ).cast("double")
        / n,
        6,
    )
    m = toks.select(
        "doc_id",
        n.alias("n_words"),
        mwl.alias("mean_word_len"),
        alpha.alias("alpha_word_frac"),
        sw_hits.alias("sw_hits"),
        sym.alias("symbol_ratio"),
    )
    ok_wc = F.col("n_words").between(_GR_MIN_WORDS, _GR_MAX_WORDS)
    ok_mwl = F.col("mean_word_len").between(_GR_MIN_MWL, _GR_MAX_MWL)
    ok_alpha = F.col("alpha_word_frac") >= _GR_MIN_ALPHA_FRAC
    ok_sw = F.col("sw_hits") >= _GR_MIN_SW_HITS
    ok_sym = F.col("symbol_ratio") <= _GR_MAX_SYMBOL_RATIO
    return m.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "alpha_word_frac",
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_alpha.alias("ok_alpha_words"),
        ok_sw.alias("ok_stopwords"),
        ok_sym.alias("ok_symbols"),
        (ok_wc & ok_mwl & ok_alpha & ok_sw & ok_sym).alias("pass_all"),
    )


DRIFT_SCALE = 1_000_000  # fixed-point scale for chi-square contributions


@register(
    "source_token_drift",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS word
      FROM documents
    ),
    cst AS (SELECT source, word, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    ns AS (SELECT source, SUM(c) AS n_s FROM cst GROUP BY 1),
    ct AS (SELECT word, SUM(c) AS c_t FROM cst GROUP BY 1),
    tot AS (SELECT SUM(c) AS n FROM cst),
    grid AS (SELECT ns.source, ns.n_s, ct.word, ct.c_t FROM ns CROSS JOIN ct),
    parts AS (
      SELECT g.source, g.n_s,
             (CAST(COALESCE(c.c, 0) AS HUGEINT) * t.n
              - CAST(g.n_s AS HUGEINT) * g.c_t)
             * (CAST(COALESCE(c.c, 0) AS HUGEINT) * t.n
                - CAST(g.n_s AS HUGEINT) * g.c_t) AS dd,
             CAST(t.n AS HUGEINT) * g.n_s * g.c_t AS den
      FROM grid g
      LEFT JOIN cst c ON c.source = g.source AND c.word = g.word
      CROSS JOIN tot t
    ),
    terms AS (
      -- exact fixed-point 1e6 chi-square contribution via the two-step
      -- decomposition floor(S*dd/den) = S*(dd//den) + (S*(dd%den))//den,
      -- so the widest intermediate is dd (= d^2), not S*d^2 — exact
      -- while d^2 <= 1.7e38, i.e. total token count N <~ 3.6e9.
      SELECT source, n_s,
             CAST({DRIFT_SCALE} AS HUGEINT) * (dd // den)
             + (CAST({DRIFT_SCALE} AS HUGEINT) * (dd % den)) // den AS term
      FROM parts
    )
    SELECT source,
           CAST(MIN(n_s) AS BIGINT) AS n_tokens,
           CAST(SUM(term) AS BIGINT) AS chi2_fp,
           round(CAST(SUM(term) AS BIGINT) / {DRIFT_SCALE}.0, 6) AS chi2
    FROM terms GROUP BY source
    """,
    doc="Per-source distribution-drift report: the chi-square statistic "
    "of each source's token histogram against the corpus-wide "
    "expectation — the QA gate that flags a source whose language "
    "suddenly shifts before it poisons the training mix. Every "
    "contribution is computed in EXACT integer arithmetic via the "
    "two-step decomposition floor(S*d^2/D) = S*(d^2 div D) + "
    "(S*(d^2 mod D)) div D with d = c_st*N - n_s*c_t, D = N*n_s*c_t "
    "(decimal(38,0) on Spark, HUGEINT on DuckDB), so the per-source sum "
    "is an order-independent BIGINT — no floating-point accumulation "
    "anywhere. Exactness bound: the widest intermediate is d^2 <= N^4, "
    "which fits 38 digits while the total token count N <~ 3.1e9; "
    "beyond that (true 100 TB corpora) pre-reduce each term by "
    "g = gcd(d, D) (d/g squared stays in range whenever d/g <~ 1e19) "
    "or accept double-precision terms — the documented trade, not a "
    "silent overflow: with ANSI off Spark would NULL an overflowing "
    "term out of the SUM, so the bound is asserted in the unit test. "
    "The source x token grid is dimension-sized "
    "(|sources| x |vocab|) and broadcast; the only fact-table pass is "
    "the token count.",
)
def q_source_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens as tok

    docs = fan_out(load_table(spark, "documents", sf_dir), "doc_id")
    cst = (
        docs.select("source", F.explode(tok("text")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").alias("c"))
    )
    ns = cst.groupBy("source").agg(F.sum("c").alias("n_s"))
    ct = cst.groupBy("word").agg(F.sum("c").alias("c_t"))
    tot = cst.agg(F.sum("c").alias("n"))
    grid = F.broadcast(ns).crossJoin(F.broadcast(ct))
    d38 = "decimal(38,0)"
    # Two-step exact decomposition (see doc): the widest intermediate is
    # dd = d^2 (<= N^4, 38 digits while N <~ 3.1e9) instead of SCALE*d^2
    # (which would already overflow — silently NULL with ANSI off — near
    # N ~ 1e8). Both quotients fit BIGINT: dd div den <= N, and the
    # remainder quotient < DRIFT_SCALE.
    terms = (
        grid.join(cst, ["source", "word"], "left")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "dd",
            F.expr(
                f"(CAST(COALESCE(c, 0) AS {d38}) * n - CAST(n_s AS {d38}) * c_t)"
                f" * (CAST(COALESCE(c, 0) AS {d38}) * n - CAST(n_s AS {d38}) * c_t)"
            ),
        )
        .withColumn("den", F.expr(f"CAST(n AS {d38}) * n_s * c_t"))
        .select(
            "source",
            "n_s",
            F.expr(
                f"CAST({DRIFT_SCALE} AS {d38}) * (dd div den)"
                f" + (CAST({DRIFT_SCALE} AS {d38}) * (dd % den)) div den"
            ).alias("term"),
        )
    )
    return terms.groupBy("source").agg(
        F.min("n_s").cast("long").alias("n_tokens"),
        F.sum("term").cast("long").alias("chi2_fp"),
        F.round(F.sum("term").cast("double") / DRIFT_SCALE, 6).alias("chi2"),
    )
