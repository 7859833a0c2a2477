"""In-engine BPE tokenizer induction (Sennrich et al. 2016).

Learns the first K byte-pair-encoding merges from the corpus as a
distributed iterative algorithm — the tokenizer-training step of an LLM
data pipeline, run where the data already lives instead of collecting a
word count file to a single machine.

Classic BPE (arXiv:1508.07909) operates on the WORD-TYPE table (distinct
words + corpus frequencies), not the token stream — so each iteration's
working set is vocabulary-sized (Zipf-bounded at any corpus scale: web
corpora hold ~10^7-10^8 types against 10^12+ tokens), which is exactly
the shape Spark aggregations want. Each iteration is:

1. adjacent symbol pairs via ``lead`` over (word, pos) — one window;
2. weighted pair counts + argmax with a deterministic tiebreak
   (count DESC, left ASC, right ASC) — one aggregation of a
   vocabulary-sized table, argmax kept as a 1-row broadcast DataFrame
   (never collected to the driver);
3. greedy left-to-right NON-OVERLAPPING occurrence selection — the only
   subtle part (overlaps arise when left == right, e.g. ``a a a``):
   consecutive occurrence positions form islands (pos − row_number) and
   the merge takes every other occurrence from each island's start —
   two more windows, no sequential scan;
4. rebuild: selected positions take the merged symbol, the position to
   their right is consumed, everything else passes through; positions
   re-numbered densely by one final window. ``localCheckpoint`` ends the
   iteration (the repo's standard loop barrier, as in the Lloyd loop).

The DuckDB oracle unrolls the same K iterations as a CTE chain with the
identical windows and tiebreaks (the unrolled-Lloyd precedent,
similarity.py::_kmeans_cte_chain) — value-level parity over an
iterative algorithm, not a rows-only check.

No reference analogue (app.js has no text pipeline); north-star M4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_table, scoped_shuffle_width

BPE_MERGES = 8  # merge rules to learn


def _word_types(docs: DataFrame) -> DataFrame:
    return (
        docs.select(F.explode(F.split(F.trim("text"), "\\s+")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )


def _initial_symbols(types: DataFrame) -> DataFrame:
    return types.select(
        "word",
        "freq",
        F.posexplode(F.split("word", "")).alias("pos0", "sym"),
    ).select("word", "freq", (F.col("pos0") + 1).alias("pos"), "sym")


def _one_merge(syms: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One BPE iteration: returns (rule, next_symbols).

    ``rule`` is a 1-row DataFrame (merge_left, merge_right, pair_weight);
    it stays a DataFrame end to end — broadcast into the rebuild, never
    collected.
    """
    w_pos = Window.partitionBy("word").orderBy("pos")
    p = syms.withColumn("nxt", F.lead("sym").over(w_pos))
    rule = (
        p.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("sym").alias("merge_left"), F.col("nxt").alias("merge_right"))
        .agg(F.sum("freq").cast("bigint").alias("pair_weight"))
        .orderBy(F.desc("pair_weight"), F.asc("merge_left"), F.asc("merge_right"))
        .limit(1)
        .localCheckpoint(eager=True)
    )
    occ = (
        p.crossJoin(F.broadcast(rule))
        .filter((F.col("sym") == F.col("merge_left")) & (F.col("nxt") == F.col("merge_right")))
        .select("word", "pos")
    )
    # islands of consecutive occurrence positions; greedy left-to-right
    # non-overlap = keep every other occurrence from each island's start
    isl = occ.withColumn("grp", F.col("pos") - F.row_number().over(w_pos))
    w_isl = Window.partitionBy("word", "grp")
    sel = isl.withColumn("off", F.col("pos") - F.min("pos").over(w_isl)).filter(
        F.col("off") % 2 == 0
    )
    start = sel.select("word", "pos", F.lit(1).alias("is_start"))
    consumed = sel.select("word", (F.col("pos") + 1).alias("pos"), F.lit(1).alias("is_consumed"))
    nxt_syms = (
        syms.join(start, ["word", "pos"], "left")
        .join(consumed, ["word", "pos"], "left")
        .filter(F.col("is_consumed").isNull())
        .crossJoin(F.broadcast(rule.select("merge_left", "merge_right")))
        .select(
            "word",
            "freq",
            "pos",
            F.when(
                F.col("is_start").isNotNull(),
                F.concat("merge_left", "merge_right"),
            )
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
        .withColumn("pos", F.row_number().over(w_pos))
        .localCheckpoint(eager=True)
    )
    return rule, nxt_syms


def _bpe_oracle(k: int = BPE_MERGES, final: str | None = None) -> str:
    ctes = [
        """w AS (
          SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
          FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents)
          GROUP BY w
        )""",
        """s1 AS MATERIALIZED (
          SELECT word, freq, i AS pos, substring(word, CAST(i AS INTEGER), 1) AS sym
          FROM w, UNNEST(range(1, len(word) + 1)) r(i)
        )""",
    ]
    for i in range(1, k + 1):
        ctes.append(f"""p{i} AS MATERIALIZED (
          SELECT word, freq, pos, sym,
                 lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
          FROM s{i}
        )""")
        ctes.append(f"""r{i} AS MATERIALIZED (
          SELECT sym AS merge_left, nxt AS merge_right,
                 CAST(SUM(freq) AS BIGINT) AS pair_weight
          FROM p{i} WHERE nxt IS NOT NULL
          GROUP BY sym, nxt
          ORDER BY pair_weight DESC, merge_left ASC, merge_right ASC
          LIMIT 1
        )""")
        ctes.append(f"""o{i} AS MATERIALIZED (
          SELECT p.word, p.pos
          FROM p{i} p, r{i} r
          WHERE p.sym = r.merge_left AND p.nxt = r.merge_right
        )""")
        ctes.append(f"""sel{i} AS MATERIALIZED (
          SELECT word, pos FROM (
            SELECT word, pos, pos - MIN(pos) OVER (PARTITION BY word, grp) AS off
            FROM (
              SELECT word, pos,
                     pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp
              FROM o{i}
            )
          ) WHERE off % 2 = 0
        )""")
        ctes.append(f"""s{i + 1} AS MATERIALIZED (
          SELECT word, freq,
                 row_number() OVER (PARTITION BY word ORDER BY pos) AS pos, sym
          FROM (
            SELECT s.word, s.freq, s.pos,
                   CASE WHEN a.pos IS NOT NULL THEN r.merge_left || r.merge_right
                        ELSE s.sym END AS sym
            FROM s{i} s
            CROSS JOIN r{i} r
            LEFT JOIN sel{i} a ON a.word = s.word AND a.pos = s.pos
            LEFT JOIN sel{i} b ON b.word = s.word AND b.pos = s.pos - 1
            WHERE b.pos IS NULL
          )
        )""")
    if final is None:
        final = "\n    UNION ALL ".join(
            f"SELECT CAST({i} AS BIGINT) AS merge_rank, merge_left, merge_right, "
            f"merge_left || merge_right AS merged, pair_weight FROM r{i}"
            for i in range(1, k + 1)
        )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + final


@register(
    "bpe_learn_merges",
    oracle=_bpe_oracle(),
    doc=f"BPE tokenizer induction (Sennrich et al. 2016): the first "
    f"{BPE_MERGES} merge rules learned from the corpus word-type table, "
    "each iteration = lead-window pairs → weighted argmax (deterministic "
    "tiebreak) → island-parity greedy non-overlap selection → windowed "
    "rebuild; the argmax stays a 1-row broadcast DataFrame (no driver "
    "collect) and localCheckpoint is the loop barrier. Works on the "
    "Zipf-bounded TYPE table, so the per-iteration working set is "
    "vocabulary-sized at any corpus scale. Oracle = the same iterations "
    "unrolled as a CTE chain (the repo's unrolled-Lloyd pattern) — "
    "value-level parity for an iterative algorithm.",
)
def q_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    syms = _initial_symbols(_word_types(docs)).localCheckpoint(eager=True)
    out = None
    # the working set is the vocabulary-sized symbol table; on the
    # session default width each of the ~6 shuffles per iteration pays
    # 32 tasks of overhead — scope the width to the data (the same fix
    # that took connected components 37.7 -> 7.6 s)
    with scoped_shuffle_width(spark, syms.count()):
        for i in range(1, BPE_MERGES + 1):
            rule, syms = _one_merge(syms)
            ranked = rule.select(
                F.lit(i).cast("bigint").alias("merge_rank"),
                "merge_left",
                "merge_right",
                F.concat("merge_left", "merge_right").alias("merged"),
                "pair_weight",
            )
            out = ranked if out is None else out.unionByName(ranked)
    return out


@register(
    "bpe_vocab_segmentation",
    oracle=_bpe_oracle(
        final=f"""SELECT word, freq,
           CAST(len(word) AS BIGINT) AS n_chars,
           CAST(COUNT(*) AS BIGINT) AS n_bpe_tokens,
           round(len(word) / CAST(COUNT(*) AS DOUBLE), 6) AS chars_per_token
    FROM s{BPE_MERGES + 1}
    GROUP BY word, freq"""
    ),
    doc=f"The learned tokenizer APPLIED: per word type, its segment count "
    f"after the {BPE_MERGES} merges and the resulting compression "
    "(chars per BPE token) — the fertility/efficiency report a tokenizer "
    "training run emits. Same iterative state as bpe_learn_merges, one "
    "final vocabulary-sized aggregate; corpus token counts under the "
    "learned vocab follow by joining freq (already a column). Oracle = "
    "the same unrolled chain aggregated at s9.",
)
def q_bpe_vocab_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    syms = _initial_symbols(_word_types(docs)).localCheckpoint(eager=True)
    with scoped_shuffle_width(spark, syms.count()):
        for _ in range(BPE_MERGES):
            _, syms = _one_merge(syms)
    return syms.groupBy("word", "freq").agg(
        F.max("pos").cast("bigint").alias("n_bpe_tokens")
    ).select(
        "word",
        "freq",
        F.length("word").cast("bigint").alias("n_chars"),
        "n_bpe_tokens",
        F.round(
            F.length("word") / F.col("n_bpe_tokens").cast("double"), 6
        ).alias("chars_per_token"),
    )
