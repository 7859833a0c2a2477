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
