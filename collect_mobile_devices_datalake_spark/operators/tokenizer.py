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
   vocabulary-sized table; the 1-row argmax is collected (a BOUNDED
   O(1) driver row at any corpus scale — the kcenter_coreset pattern)
   and re-injected as plan literals, which drops the per-iteration
   rule-checkpoint job and broadcast exchanges the DataFrame form paid;
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


def _merge_rebuild(syms: DataFrame, left: str, right: str, merged: str) -> DataFrame:
    """Apply one (left, right) merge rule to the symbol table.

    Shared by the BPE and WordPiece loops — only the merged-symbol
    string differs (plain concat vs continuation-mark strip). The rule
    arrives as PYTHON LITERALS (the r15 optimization: the argmax is a
    bounded 1-row driver collection, the kcenter_coreset r14 pattern),
    so the rebuild is one job with no broadcast exchanges — the 1-row-
    DataFrame form paid a localCheckpoint job for the rule plus two
    BroadcastExchanges per iteration.
    Greedy left-to-right NON-OVERLAPPING occurrence selection — the only
    subtle part (overlaps arise when left == right, e.g. ``a a a``):
    consecutive occurrence positions form islands (pos − row_number) and
    the merge takes every other occurrence from each island's start.
    """
    w_pos = Window.partitionBy("word").orderBy("pos")
    p = syms.withColumn("nxt", F.lead("sym").over(w_pos))
    occ = (
        p.filter((F.col("sym") == F.lit(left)) & (F.col("nxt") == F.lit(right)))
        .select("word", "pos")
    )
    isl = occ.withColumn("grp", F.col("pos") - F.row_number().over(w_pos))
    w_isl = Window.partitionBy("word", "grp")
    sel = isl.withColumn("off", F.col("pos") - F.min("pos").over(w_isl)).filter(
        F.col("off") % 2 == 0
    )
    start = sel.select("word", "pos", F.lit(1).alias("is_start"))
    consumed = sel.select("word", (F.col("pos") + 1).alias("pos"), F.lit(1).alias("is_consumed"))
    return (
        syms.join(start, ["word", "pos"], "left")
        .join(consumed, ["word", "pos"], "left")
        .filter(F.col("is_consumed").isNull())
        .select(
            "word",
            "freq",
            "pos",
            F.when(F.col("is_start").isNotNull(), F.lit(merged))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
        .withColumn("pos", F.row_number().over(w_pos))
        .localCheckpoint(eager=True)
    )


def _one_merge(syms: DataFrame):
    """One BPE iteration: returns (rule_row, next_symbols).

    r16: this is the REFERENCE form (row-per-position windows + joins),
    kept because the unit tests pin it against a from-scratch Python BPE
    and the array production step (``_one_merge_arr``) is
    equivalence-tested against it. The learn loops themselves run the
    array form.

    ``rule_row`` is the collected 1-row argmax (merge_left, merge_right,
    pair_weight) — a BOUNDED driver collection, O(1) at any corpus scale
    (the kcenter_coreset r14 precedent), re-injected into the rebuild as
    plan literals. ``None`` when no adjacent pair remains (degenerate
    corpora); the next symbol table is then empty — exactly the old
    crossJoin-with-an-empty-rule semantics and the oracle's
    ``CROSS JOIN r{i}``."""
    w_pos = Window.partitionBy("word").orderBy("pos")
    p = syms.withColumn("nxt", F.lead("sym").over(w_pos))
    rows = (
        p.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("sym").alias("merge_left"), F.col("nxt").alias("merge_right"))
        .agg(F.sum("freq").cast("bigint").alias("pair_weight"))
        .orderBy(F.desc("pair_weight"), F.asc("merge_left"), F.asc("merge_right"))
        .limit(1)
        .collect()
    )
    if not rows:
        return None, syms.filter(F.lit(False))
    r = rows[0]
    nxt_syms = _merge_rebuild(
        syms, r["merge_left"], r["merge_right"], r["merge_left"] + r["merge_right"]
    )
    return r, nxt_syms


# --- r16: array-per-word learn loop -------------------------------------
#
# The production learn loops run on an ARRAY representation of the symbol
# table — one row per word TYPE, its symbol sequence as array<string> —
# instead of one row per (word, pos). The per-iteration physical work
# collapses (guide §1.2 step 1, "the distributed algorithm"):
#
#   reference form (kept below for the unit tests): pair lead-window +
#   aggregation for the argmax, then a rebuild of 3 window passes + 2
#   joins + a renumber window, ~6 shuffles per iteration;
#
#   array form: the argmax is one explode + one aggregation (a single
#   shuffle), and the rebuild is a PURE PER-ROW FOLD (`_greedy_merge_col`)
#   — zero shuffles, zero windows, zero joins. The per-iteration
#   localCheckpoint stays (the loop barrier; it also stops CollapseProject
#   from substituting the fold into the next iteration's expressions,
#   which would grow the tree exponentially — measured: 8 uncheckpointed
#   layers OOM the driver during optimization).
#
# Equivalence (pinned by tests/test_tokenizer.py::
# test_array_loop_equals_reference_forms): greedy left-to-right
# non-overlapping selection IS the island-parity rule — overlapping
# occurrences only arise when left == right, where consecutive positions
# form an island and taking every other occurrence from its start is
# exactly what the skip-flag fold does; pair counts/argmax are the same
# aggregation over the same adjacent pairs. Interleaved A/B at sf0.1:
# BPE loop 3.04 -> 1.96 s, WP loop 3.15 -> 2.36 s (best-of-3).


def _initial_symbol_arrays(types: DataFrame, wp: bool = False) -> DataFrame:
    """(word, freq, a): each word type's initial symbol sequence as an
    array — plain characters for BPE, '##'-marked word-internal
    characters for WordPiece. Empty arrays (an empty-string word type,
    possible on whitespace-only documents) are dropped, matching the
    row form where ``posexplode`` emits no rows for them."""
    ch = F.split("word", "")
    if wp:
        a = F.transform(
            ch,
            lambda x, i: F.when(i == 0, x).otherwise(F.concat(F.lit("##"), x)),
        )
    else:
        a = ch
    return types.select("word", "freq", a.alias("a")).filter(F.size("a") >= 1)


def _pair_counts_arr(at: DataFrame) -> DataFrame:
    """(merge_left, merge_right, pair_weight): adjacent-pair weights from
    the array form — one explode of the (size-1) adjacent pairs and one
    vocabulary-sized aggregation, the map-side-combinable shape."""
    a = F.col("a")
    prs = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.size(a) - 1),
            lambda i: F.struct(
                F.element_at(a, i).alias("l"), F.element_at(a, i + 1).alias("r")
            ),
        )
    )
    return (
        at.filter(F.size(a) >= 2)
        .select("freq", prs.alias("p"))
        .groupBy(F.col("p.l").alias("merge_left"), F.col("p.r").alias("merge_right"))
        .agg(F.sum("freq").cast("bigint").alias("pair_weight"))
    )


def _greedy_merge_col(a, left: str, right: str, merged: str):
    """Greedy left-to-right non-overlapping application of one merge rule
    to a symbol array, as a single fold (no shuffle): the skip flag
    consumes the right-hand symbol of a just-merged pair, which on runs
    of an overlapping rule (left == right) takes every other occurrence
    from the run's start — the island-parity selection."""
    idx = F.sequence(F.lit(1), F.size(a))
    zero = F.struct(
        F.lit([]).cast("array<string>").alias("out"), F.lit(False).alias("skip")
    )

    def step(st, i):
        hit = (
            (i < F.size(a))
            & (F.element_at(a, i) == F.lit(left))
            & (F.element_at(a, i + 1) == F.lit(right))
        )
        return (
            F.when(
                st["skip"], F.struct(st["out"].alias("out"), F.lit(False).alias("skip"))
            )
            .when(
                hit,
                F.struct(
                    F.concat(st["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(True).alias("skip"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(st["out"], F.array(F.element_at(a, i))).alias("out"),
                    F.lit(False).alias("skip"),
                )
            )
        )

    return F.aggregate(idx, zero, step, lambda st: st["out"])


def _one_merge_arr(at: DataFrame, wp: bool = False):
    """One learn iteration on the array form: returns (rule_row, next).

    The argmax is the same bounded 1-row driver collection as the
    reference forms (identical aggregation, identical total-order
    tiebreak); the rebuild applies the rule as a per-row fold and
    checkpoints (the loop barrier). ``None`` rule on degenerate corpora
    (no adjacent pair anywhere) with an empty next table, matching the
    reference forms and the oracle's ``CROSS JOIN r{i}``."""
    pc = _pair_counts_arr(at)
    if wp:
        counts = (
            at.select("freq", F.explode("a").alias("sym"))
            .groupBy("sym")
            .agg(F.sum("freq").cast("bigint").alias("w"))
        )
        rows = (
            pc.join(
                counts.select(
                    F.col("sym").alias("merge_left"), F.col("w").alias("left_weight")
                ),
                "merge_left",
            )
            .join(
                counts.select(
                    F.col("sym").alias("merge_right"), F.col("w").alias("right_weight")
                ),
                "merge_right",
            )
            .orderBy(
                F.desc(
                    F.col("pair_weight").cast("double")
                    / (F.col("left_weight") * F.col("right_weight"))
                ),
                F.asc("merge_left"),
                F.asc("merge_right"),
            )
            .limit(1)
            .select(
                "merge_left", "merge_right", "pair_weight", "left_weight", "right_weight"
            )
            .collect()
        )
    else:
        rows = (
            pc.orderBy(F.desc("pair_weight"), F.asc("merge_left"), F.asc("merge_right"))
            .limit(1)
            .collect()
        )
    if not rows:
        return None, at.filter(F.lit(False))
    r = rows[0]
    merged = (
        _wp_merged_str(r["merge_left"], r["merge_right"])
        if wp
        else r["merge_left"] + r["merge_right"]
    )
    nxt = at.withColumn(
        "a", _greedy_merge_col(F.col("a"), r["merge_left"], r["merge_right"], merged)
    ).localCheckpoint(eager=True)
    return r, nxt


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
    f"{BPE_MERGES} merge rules learned from the corpus word-type table. "
    "r16 shape: each word type carries its symbol sequence as an ARRAY, "
    "so an iteration is one explode+aggregation for the weighted argmax "
    "(deterministic tiebreak; a BOUNDED 1-row driver collection — the "
    "kcenter_coreset pattern, O(1) at any corpus scale) and a PER-ROW "
    "greedy fold for the rebuild (zero shuffles — the skip-flag fold IS "
    "the island-parity non-overlap selection); localCheckpoint is the "
    "loop barrier. Works on the Zipf-bounded TYPE table, so the "
    "per-iteration working set is vocabulary-sized at any corpus scale. "
    "Oracle = the same iterations unrolled as a CTE chain (the repo's "
    "unrolled-Lloyd pattern) — value-level parity for an iterative "
    "algorithm.",
)
def q_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    at = _initial_symbol_arrays(_word_types(docs)).localCheckpoint(eager=True)
    # the working set is the vocabulary-sized word-type table; on the
    # session default width the per-iteration pair shuffle pays 32 tasks
    # of overhead — scope the width to the data (the same fix that took
    # connected components 37.7 -> 7.6 s)
    rows: list[tuple] = []
    with scoped_shuffle_width(spark, at.count()):
        for i in range(1, BPE_MERGES + 1):
            rule, at = _one_merge_arr(at)
            if rule is not None:
                rows.append(
                    (
                        i,
                        rule["merge_left"],
                        rule["merge_right"],
                        rule["merge_left"] + rule["merge_right"],
                        rule["pair_weight"],
                    )
                )
    return spark.createDataFrame(
        rows,
        "merge_rank bigint, merge_left string, merge_right string, "
        "merged string, pair_weight bigint",
    )


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
    at = _initial_symbol_arrays(_word_types(docs)).localCheckpoint(eager=True)
    with scoped_shuffle_width(spark, at.count()):
        for _ in range(BPE_MERGES):
            _, at = _one_merge_arr(at)
    return at.select(
        "word", "freq", F.size("a").cast("bigint").alias("n_bpe_tokens")
    ).select(
        "word",
        "freq",
        F.length("word").cast("bigint").alias("n_chars"),
        "n_bpe_tokens",
        F.round(
            F.length("word") / F.col("n_bpe_tokens").cast("double"), 6
        ).alias("chars_per_token"),
    )


@register(
    "bpe_corpus_encoding",
    oracle=_bpe_oracle(
        # leading comma: this `final` extends the unrolled chain with two
        # more CTEs before its SELECT (the helper appends final verbatim)
        final=f""", seg AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n_bpe_tokens
      FROM s{BPE_MERGES + 1} GROUP BY word
    ),
    toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
      FROM documents
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(s.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(len(t.word)) AS BIGINT) AS n_chars,
           round(CAST(SUM(len(t.word)) AS DOUBLE)
                 / SUM(s.n_bpe_tokens), 6) AS chars_per_token
    FROM toks t JOIN seg s ON s.word = t.word
    GROUP BY t.doc_id"""
    ),
    doc=f"The learned tokenizer applied to the CORPUS: per document, its "
    f"token count under the {BPE_MERGES}-merge BPE vocabulary — the "
    "number that actually sizes training budgets, context packing, and "
    "per-source mixes once a real tokenizer exists (whitespace counts "
    "are a proxy; THIS is the exact count the trained model will see). "
    "Scale shape is the tokenizer-apply idiom at 100 TB: segmentation "
    "runs on the Zipf-bounded word-TYPE table (vocabulary-sized, "
    "shared iterative state with bpe_learn_merges), and the corpus is "
    "never re-segmented — each document's exploded words join the "
    "per-type segment counts (a broadcast-sized dictionary at any "
    "corpus scale) and sum per doc: one explode, one hash join on the "
    "word key, one doc-keyed aggregation. Oracle = the same unrolled "
    "merge chain joined back to the exploded corpus.",
)
def q_bpe_corpus_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import _persisted_index

    docs = load_table(spark, "documents", sf_dir)

    def _build_seg() -> DataFrame:
        at = _initial_symbol_arrays(_word_types(docs)).localCheckpoint(eager=True)
        with scoped_shuffle_width(spark, at.count()):
            for _ in range(BPE_MERGES):
                _, at = _one_merge_arr(at)
            return at.select(
                "word", F.size("a").cast("bigint").alias("n_bpe_tokens")
            ).localCheckpoint(eager=True)

    # r12: the learned segment table is a PERSISTED artifact keyed by
    # merge count + corpus fingerprint (the ANN-index discipline): a
    # tokenizer is trained once per corpus and applied many times, so
    # the apply path must not pay the iterative learn loop per query —
    # at 100 TB this is the vocab table a deployment keeps in the lake
    # next to the merges. bpe_learn_merges itself stays UNCACHED: it is
    # the bench guard for the learn loop.
    seg = _persisted_index(
        spark, "bpeseg", sf_dir, f"m{BPE_MERGES}", _build_seg, table="documents"
    )
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), "\\s+")).alias("word")
    )
    return (
        toks.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_bpe_tokens",
            "n_chars",
            F.round(
                F.col("n_chars").cast("double") / F.col("n_bpe_tokens"), 6
            ).alias("chars_per_token"),
        )
    )


# --- unigram-LM segmentation -------------------------------------------------

UNI_MAXW = 8  # words longer than this are excluded from the report
UNI_SEG_MAX = 4  # candidate segment length cap
UNI_TOP_V = 128  # multi-char vocab cut (all single chars always kept)

_UNI_WT_SQL = f"""
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents)
  WHERE len(w) BETWEEN 1 AND {UNI_MAXW}
  GROUP BY w
"""

_UNI_VOCAB_SQL = f"""
  subs AS (
    SELECT substring(word, CAST(i AS INTEGER), CAST(l AS INTEGER)) AS sub,
           CAST(SUM(freq) AS BIGINT) AS cnt
    FROM wt,
         UNNEST(range(1, len(word) + 1)) s(i),
         UNNEST(range(1, {UNI_SEG_MAX + 1})) t(l)
    WHERE i + l <= len(word) + 1
    GROUP BY sub
  ),
  vocab AS (
    SELECT sub, cnt FROM subs WHERE len(sub) = 1
    UNION ALL
    SELECT sub, cnt FROM (
      SELECT sub, cnt,
             row_number() OVER (ORDER BY cnt DESC, sub ASC) AS rk
      FROM subs WHERE len(sub) > 1
    ) WHERE rk <= {UNI_TOP_V}
  ),
  tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot,
                 CAST(COUNT(*) AS BIGINT) AS nv FROM vocab),
  vc AS (
    SELECT sub, cnt,
           CAST(length(to_base((tot + nv) // (cnt + 1), 2)) - 1 AS BIGINT) AS cost
    FROM vocab CROSS JOIN tot
  )
"""


def _unigram_oracle(final: str | None = None) -> str:
    """Unrolled Viterbi over word positions (the BPE-oracle technique:
    greedy/DP sequentiality → one CTE pair per step). Like _bpe_oracle,
    ``final`` starting with ", name AS (" extends the CTE chain before
    its own SELECT; None keeps the per-word segmentation report."""
    ctes = [
        f"wt AS ({_UNI_WT_SQL})",
        _UNI_VOCAB_SQL.strip().lstrip(),  # subs/vocab/tot/vc
        "b0 AS (SELECT word, freq, CAST(0 AS BIGINT) AS bits, "
        "CAST(0 AS BIGINT) AS nseg, '' AS path FROM wt)",
    ]
    for j in range(1, UNI_MAXW + 1):
        legs = []
        for l in range(1, min(UNI_SEG_MAX, j) + 1):
            legs.append(f"""
      SELECT b.word, b.freq, b.bits + v.cost AS bits, b.nseg + 1 AS nseg,
             CASE WHEN b.path = '' THEN v.sub
                  ELSE b.path || ' ' || v.sub END AS path
      FROM b{j - l} b
      JOIN vc v ON v.sub = substring(b.word, {j - l + 1}, {l})
      WHERE len(b.word) >= {j}""")
        union = "\n      UNION ALL".join(legs)
        ctes.append(f"""cand{j} AS ({union}
    )""")
        ctes.append(f"""b{j} AS (
      SELECT word, freq, bits, nseg, path FROM (
        SELECT *, row_number() OVER (PARTITION BY word
                                     ORDER BY bits, nseg, path) AS rn
        FROM cand{j}
      ) WHERE rn = 1
    )""")
    if final is not None:
        return "WITH " + ",\n    ".join(ctes) + final
    default_final = "\n    UNION ALL ".join(
        f"SELECT word, freq, CAST(len(word) AS BIGINT) AS n_chars, nseg AS n_segments, "
        f"bits AS total_bits, path AS segmentation FROM b{j} WHERE len(word) = {j}"
        for j in range(1, UNI_MAXW + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + default_final


def _unigram_vocab_frames(spark: SparkSession, sf_dir: str):
    """(wt, vc): the length-capped word-type table and the costed vocab.

    The vocab is every substring of length 1..SEG_MAX of the word types,
    occurrence-weighted by corpus frequency; multi-char entries are cut
    to the top ``UNI_TOP_V`` by weight (deterministic tiebreak) while
    every single character survives so any word stays segmentable. The
    segment cost is the add-one-smoothed improbability in WHOLE BITS —
    ``flog2((TOT + |V|) div (cnt + 1))``, bit-length arithmetic with no
    libm anywhere — which is what makes a value-level cross-engine
    oracle for a Viterbi DP possible at all (float log-prob sums would
    diverge in the last ulp and flip argmins).
    """
    docs = load_table(spark, "documents", sf_dir)
    wt = (
        _word_types(docs)
        .filter(F.length("word") <= UNI_MAXW)
        .localCheckpoint(eager=True)
    )
    subs = (
        wt.select("word", "freq", F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i"))
        .select("word", "freq", "i", F.explode(F.sequence(F.lit(1), F.lit(UNI_SEG_MAX))).alias("l"))
        .filter(F.col("i") + F.col("l") <= F.length("word") + 1)
        .select(F.col("word").substr(F.col("i"), F.col("l")).alias("sub"), "freq")
        .groupBy("sub")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )
    chars = subs.filter(F.length("sub") == 1)
    wm = Window.orderBy(F.desc("cnt"), F.asc("sub"))
    multi = (
        subs.filter(F.length("sub") > 1)
        .withColumn("rk", F.row_number().over(wm))
        .filter(F.col("rk") <= UNI_TOP_V)
        .drop("rk")
    )
    vocab = chars.unionByName(multi)
    tot = vocab.agg(
        F.sum("cnt").cast("long").alias("tot"), F.count("*").cast("long").alias("nv")
    )
    vc = (
        vocab.crossJoin(F.broadcast(tot))
        .select(
            "sub",
            "cnt",
            (F.length(F.bin(F.expr("(tot + nv) div (cnt + 1)"))) - 1)
            .cast("long")
            .alias("cost"),
        )
        .localCheckpoint(eager=True)
    )
    return wt, vc


@register(
    "unigram_lm_vocab",
    oracle=f"""
    WITH wt AS ({_UNI_WT_SQL}),
    {_UNI_VOCAB_SQL.strip().lstrip()}
    SELECT sub, cnt, cost FROM vc ORDER BY sub
    """,
    doc="The unigram-LM candidate vocabulary: every substring (length "
    f"1..{UNI_SEG_MAX}) of the word-type table, occurrence-weighted by "
    "corpus frequency, multi-char entries cut to the top "
    f"{UNI_TOP_V} by weight, plus its integer-bits segment cost "
    "(add-one-smoothed improbability via bit-length arithmetic — no "
    "libm). Vocabulary-sized at any corpus scale: one hash aggregation "
    "over the Zipf-bounded type table, the same shape as the BPE "
    "pair-count step.",
)
def q_unigram_lm_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, vc = _unigram_vocab_frames(spark, sf_dir)
    return vc.orderBy("sub")


@register(
    "unigram_lm_segmentation",
    oracle=_unigram_oracle(),
    doc="Unigram-LM (SentencePiece-style, Kudo 2018) Viterbi "
    "segmentation of every word type under the substring vocabulary — "
    "the tokenizer family's second induction algorithm next to BPE. "
    "Min-cost split where cost is integer improbability bits; exact DP "
    "(not greedy), ties broken by (bits, segment count, lexicographic "
    "path). r15: computed by direct candidate enumeration in ONE job — "
    f"the {UNI_MAXW}-char cap bounds the composition table to 223 "
    "static rows, so every word's segmentations and the argmin fit one "
    "broadcast-join + aggregate + window over the vocabulary-sized "
    "type table (provably the DP's answer; see _unigram_segments). "
    "Words longer than the cap are excluded and the cap is the "
    "documented knob. Integer costs are what make the "
    "unrolled DuckDB DP bit-identical — float log-probs would flip "
    "argmins in the last ulp. At 100 TB the DP cost is O(types * "
    "maxlen * seg_max) — corpus-size-independent, like every op on the "
    "type table.",
)
def q_unigram_lm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _unigram_segments(spark, sf_dir)
    return out.select(
        "word",
        "freq",
        F.length("word").cast("long").alias("n_chars"),
        F.col("nseg").alias("n_segments"),
        F.col("bits").alias("total_bits"),
        F.col("path").alias("segmentation"),
    ).orderBy("word")


def _compositions(n: int, max_part: int) -> list[tuple[int, ...]]:
    """Every ordered composition of ``n`` into parts 1..max_part."""
    if n == 0:
        return [()]
    out: list[tuple[int, ...]] = []
    for part in range(1, min(max_part, n) + 1):
        for rest in _compositions(n - part, max_part):
            out.append((part,) + rest)
    return out


def _unigram_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, freq, nseg, bits, path): the min-cost Viterbi segmentation
    of every capped word type — the shared kernel of the segmentation
    report and the corpus encoding.

    r15 shape: the position-unrolled DP (8 localCheckpoint-barrier jobs,
    one per word length) is replaced by DIRECT candidate enumeration in
    ONE job. With the DP capped at UNI_MAXW chars and UNI_SEG_MAX-char
    segments, the full candidate set per word is the static composition
    table of its length (compositions(8, 4) = 108; 223 rows across all
    lengths — a plan-time literal), so every word's segmentations,
    their integer-bit costs, and the (bits, n_segments, path) argmin
    fit one broadcast-join + aggregate + window. Provably the DP's
    answer: bits are additive so the global min is the min over
    compositions, and among equal-bits candidates the DP's per-prefix
    (nseg, path) tiebreak equals the global one — equal-(bits, nseg)
    prefixes ending at the same position have equal string length, so
    lexicographic order is preserved under any common suffix. A comp
    survives only when EVERY segment is in the vocabulary (count match
    below), exactly the DP's inner-join semantics; single chars are
    always in the vocabulary so every word keeps >= 1 candidate.
    Oracle unchanged (the unrolled-DP SQL) — parity certifies the
    equivalence. At any corpus scale the work is O(types x 223 x
    avg_segs) on the Zipf-bounded type table; the cap is the documented
    knob and bounds the composition table, not the corpus."""
    wt, vc = _unigram_vocab_frames(spark, sf_dir)
    seg_rows = []  # (word_len, comp_id, seg_idx, start_pos, seg_len)
    comp_rows = []  # (word_len, comp_id, n_segs)
    for n in range(1, UNI_MAXW + 1):
        for cid, comp in enumerate(_compositions(n, UNI_SEG_MAX)):
            comp_rows.append((n, cid, len(comp)))
            pos = 1
            for k, seg_len in enumerate(comp):
                seg_rows.append((n, cid, k, pos, seg_len))
                pos += seg_len
    segs = spark.createDataFrame(seg_rows, "n int, cid int, k int, i int, l int")
    comps = spark.createDataFrame(comp_rows, "n int, cid int, n_segs int")
    # r16 (ADVICE): no scoped_shuffle_width here — the one-job plan is
    # returned LAZILY, so a scope would be restored before the caller's
    # action ever ran (it was inert in r15) while its sizing count paid
    # a real job. The session default width + AQE coalescing is what
    # actually executed the r15-measured 1.8 s row.
    cand = (
        wt.join(F.broadcast(segs), F.length("word") == F.col("n"))
        .withColumn("sub", F.col("word").substr(F.col("i"), F.col("l")))
        .join(F.broadcast(vc.select("sub", "cost")), "sub")
    )
    scored = (
        cand.groupBy("word", "freq", "n", "cid")
        .agg(
            F.sum("cost").cast("long").alias("bits"),
            F.count("*").cast("long").alias("nseg"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("k", "sub"))),
                    lambda s: s["sub"],
                ),
                " ",
            ).alias("path"),
        )
        .join(F.broadcast(comps), ["n", "cid"])
        .filter(F.col("nseg") == F.col("n_segs"))  # every segment in-vocab
    )
    wv = Window.partitionBy("word").orderBy("bits", "nseg", "path")
    return (
        scored.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("word", "freq", "bits", "nseg", "path")
    )


@register(
    "unigram_corpus_encoding",
    oracle=_unigram_oracle(
        final=f""", seg AS (
      {" UNION ALL ".join(f"SELECT word, nseg, bits FROM b{j} WHERE len(word) = {j}" for j in range(1, UNI_MAXW + 1))}
    ),
    toks AS (
      SELECT doc_id, word
      FROM (SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\\s+')) AS word
            FROM documents)
      WHERE len(word) >= 1
    )
    SELECT t.doc_id,
           CAST(COUNT(s.word) AS BIGINT) AS n_words,
           CAST(COUNT(*) - COUNT(s.word) AS BIGINT) AS n_long_words,
           CAST(COALESCE(SUM(s.nseg), 0) AS BIGINT) AS n_segments,
           CAST(COALESCE(SUM(s.bits), 0) AS BIGINT) AS total_bits
    FROM toks t LEFT JOIN seg s ON s.word = t.word
    GROUP BY t.doc_id"""
    ),
    doc="The unigram-LM tokenizer applied to the CORPUS — the "
    "tokenizer-apply twin of bpe_corpus_encoding, completing the pair "
    "for the repo's second induction algorithm: per document, its "
    f"Viterbi segment count and total improbability bits under the "
    f"{UNI_TOP_V}-entry substring vocabulary, with words beyond the "
    f"{UNI_MAXW}-char DP cap surfaced as n_long_words (the honest "
    "coverage column — a deployment widens the cap or byte-falls-back). "
    "Same scale shape as the BPE apply: the DP runs once on the "
    "Zipf-bounded word-TYPE table and is persisted keyed by params + "
    "corpus fingerprint (the ANN-index discipline), the corpus is never "
    "re-segmented — one explode, one LEFT hash join against the "
    "broadcast-sized segment dictionary, one doc-keyed aggregate. "
    "total_bits doubles as an integer-exact corpus compression/"
    "perplexity proxy (the Kudo 2018 objective summed over the corpus).",
)
def q_unigram_corpus_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import _persisted_index

    docs = load_table(spark, "documents", sf_dir)

    def _build_seg() -> DataFrame:
        return _unigram_segments(spark, sf_dir).select("word", "nseg", "bits")

    seg = _persisted_index(
        spark,
        "uniseg",
        sf_dir,
        f"w{UNI_MAXW}s{UNI_SEG_MAX}v{UNI_TOP_V}",
        _build_seg,
        table="documents",
    )
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), "\\s+")).alias("word")
    ).filter(F.length("word") >= 1)
    return (
        toks.join(F.broadcast(seg), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count("nseg").cast("bigint").alias("n_words"),
            (F.count("*") - F.count("nseg")).cast("bigint").alias("n_long_words"),
            F.coalesce(F.sum("nseg"), F.lit(0)).cast("bigint").alias("n_segments"),
            F.coalesce(F.sum("bits"), F.lit(0)).cast("bigint").alias("total_bits"),
        )
    )


# --- WordPiece induction -----------------------------------------------------
#
# The third tokenizer family, completing the trio (BPE above, unigram LM
# below): WordPiece (Schuster & Nakajima 2012; Wu et al. 2016 §3.2, the
# BERT tokenizer) is BPE's loop with a LIKELIHOOD merge criterion — pick
# the pair maximizing count(ab) / (count(a) * count(b)) instead of raw
# count(ab) — and continuation marks ('##') on word-internal symbols, so
# the learned units are directly the BERT-style vocab entries. Behavioral
# spec: the HuggingFace `tokenizers` WordPiece trainer's documented
# scoring rule (public docs); no code consulted or copied.
#
# Cross-engine determinism: the score is one IEEE division of exact
# integers — CAST(pair AS DOUBLE) / (left_w * right_w); the BIGINT
# product is exact below 2^53 (corpus token counts ~1e7 at sf0.1 →
# product ≤ ~1e14) and correctly-rounded division is bit-identical in
# Spark and DuckDB, with the (score DESC, left, right) tiebreak making
# float-equal scores deterministic.

WP_MERGES = 6  # merge rules to learn (each adds ~7 CTEs to the oracle)


def _initial_wp_symbols(types: DataFrame) -> DataFrame:
    """Symbol table with WordPiece continuation marks: position 1 keeps
    the bare character, every later position is '##'-prefixed."""
    return types.select(
        "word",
        "freq",
        F.posexplode(F.split("word", "")).alias("pos0", "ch"),
    ).select(
        "word",
        "freq",
        (F.col("pos0") + 1).alias("pos"),
        F.when(F.col("pos0") == 0, F.col("ch"))
        .otherwise(F.concat(F.lit("##"), F.col("ch")))
        .alias("sym"),
    )


def _wp_merged_str(left: str, right: str) -> str:
    """Merged symbol: left keeps its own mark; the right side's '##' is
    consumed by the merge (right[2:] — rights are always word-internal,
    hence always '##'-prefixed; matches SQL substring(merge_right, 3))."""
    return left + right[2:]


def _one_wp_merge(syms: DataFrame):
    """One WordPiece iteration: likelihood-scored rule + rebuild.

    Two vocabulary-sized aggregations (pair counts, symbol counts) and
    two broadcast-sized joins feed the argmax, which is collected as a
    bounded 1-row driver row and re-injected as plan literals (see
    ``_one_merge``); the rebuild is the shared island-parity machinery
    (`_merge_rebuild`). ``None`` rule when no adjacent pair remains."""
    w_pos = Window.partitionBy("word").orderBy("pos")
    p = syms.withColumn("nxt", F.lead("sym").over(w_pos))
    counts = syms.groupBy("sym").agg(F.sum("freq").cast("bigint").alias("w"))
    pc = (
        p.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("sym").alias("merge_left"), F.col("nxt").alias("merge_right"))
        .agg(F.sum("freq").cast("bigint").alias("pair_weight"))
    )
    rows = (
        pc.join(
            counts.select(F.col("sym").alias("merge_left"), F.col("w").alias("left_weight")),
            "merge_left",
        )
        .join(
            counts.select(F.col("sym").alias("merge_right"), F.col("w").alias("right_weight")),
            "merge_right",
        )
        .orderBy(
            F.desc(
                F.col("pair_weight").cast("double")
                / (F.col("left_weight") * F.col("right_weight"))
            ),
            F.asc("merge_left"),
            F.asc("merge_right"),
        )
        .limit(1)
        .select("merge_left", "merge_right", "pair_weight", "left_weight", "right_weight")
        .collect()
    )
    if not rows:
        return None, syms.filter(F.lit(False))
    r = rows[0]
    nxt = _merge_rebuild(
        syms,
        r["merge_left"],
        r["merge_right"],
        _wp_merged_str(r["merge_left"], r["merge_right"]),
    )
    return r, nxt


def _wp_oracle(k: int = WP_MERGES, final: str | None = None) -> str:
    """The WordPiece loop unrolled as a CTE chain (the _bpe_oracle
    technique, plus per-iteration symbol-count and score-join CTEs)."""
    ctes = [
        """w AS (
          SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
          FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents)
          GROUP BY w
        )""",
        """s1 AS MATERIALIZED (
          SELECT word, freq, i AS pos,
                 CASE WHEN i = 1 THEN substring(word, CAST(i AS INTEGER), 1)
                      ELSE '##' || substring(word, CAST(i AS INTEGER), 1) END AS sym
          FROM w, UNNEST(range(1, len(word) + 1)) r(i)
        )""",
    ]
    for i in range(1, k + 1):
        ctes.append(f"""p{i} AS MATERIALIZED (
          SELECT word, freq, pos, sym,
                 lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
          FROM s{i}
        )""")
        ctes.append(f"""c{i} AS MATERIALIZED (
          SELECT sym, CAST(SUM(freq) AS BIGINT) AS w FROM s{i} GROUP BY sym
        )""")
        ctes.append(f"""r{i} AS MATERIALIZED (
          SELECT pc.merge_left, pc.merge_right, pc.pair_weight,
                 cl.w AS left_weight, cr.w AS right_weight
          FROM (
            SELECT sym AS merge_left, nxt AS merge_right,
                   CAST(SUM(freq) AS BIGINT) AS pair_weight
            FROM p{i} WHERE nxt IS NOT NULL
            GROUP BY sym, nxt
          ) pc
          JOIN c{i} cl ON cl.sym = pc.merge_left
          JOIN c{i} cr ON cr.sym = pc.merge_right
          ORDER BY CAST(pc.pair_weight AS DOUBLE) / (cl.w * cr.w) DESC,
                   pc.merge_left ASC, pc.merge_right ASC
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
                   CASE WHEN a.pos IS NOT NULL
                        THEN r.merge_left || substring(r.merge_right, 3)
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
            f"merge_left || substring(merge_right, 3) AS merged, "
            f"pair_weight, left_weight, right_weight FROM r{i}"
            for i in range(1, k + 1)
        )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + final


@register(
    "wordpiece_learn_merges",
    oracle=_wp_oracle(),
    doc=f"WordPiece tokenizer induction (Schuster & Nakajima 2012; Wu et "
    f"al. 2016 — the BERT tokenizer): the first {WP_MERGES} merges "
    "learned from the word-type table under the LIKELIHOOD criterion "
    "score(a,b) = count(ab) / (count(a)*count(b)), with '##' "
    "continuation marks on word-internal symbols so the learned units "
    "are the BERT-style vocab entries. Same Zipf-bounded iterative "
    "shape as bpe_learn_merges (vocabulary-sized working set, bounded "
    "1-row argmax, per-row greedy-fold rebuild — shared array "
    "machinery); the score adds one symbol-count aggregation and two "
    "broadcast joins per iteration, and is ONE IEEE division of exact "
    "BIGINTs, bit-identical cross-engine. Output keeps the integer "
    "count triple (pair/left/right weights) instead of the float score "
    "so every emitted column is exact.",
)
def q_wordpiece_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    at = _initial_symbol_arrays(_word_types(docs), wp=True).localCheckpoint(eager=True)
    rows: list[tuple] = []
    with scoped_shuffle_width(spark, at.count()):
        for i in range(1, WP_MERGES + 1):
            rule, at = _one_merge_arr(at, wp=True)
            if rule is not None:
                rows.append(
                    (
                        i,
                        rule["merge_left"],
                        rule["merge_right"],
                        _wp_merged_str(rule["merge_left"], rule["merge_right"]),
                        rule["pair_weight"],
                        rule["left_weight"],
                        rule["right_weight"],
                    )
                )
    return spark.createDataFrame(
        rows,
        "merge_rank bigint, merge_left string, merge_right string, merged string, "
        "pair_weight bigint, left_weight bigint, right_weight bigint",
    )


@register(
    "wordpiece_corpus_encoding",
    oracle=_wp_oracle(
        final=f""", seg AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n_wp_tokens
      FROM s{WP_MERGES + 1} GROUP BY word
    ),
    toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
      FROM documents
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(s.n_wp_tokens) AS BIGINT) AS n_wp_tokens,
           CAST(SUM(len(t.word)) AS BIGINT) AS n_chars,
           round(CAST(SUM(len(t.word)) AS DOUBLE)
                 / SUM(s.n_wp_tokens), 6) AS chars_per_token
    FROM toks t JOIN seg s ON s.word = t.word
    GROUP BY t.doc_id"""
    ),
    doc=f"The learned WordPiece tokenizer applied to the corpus: per "
    f"document, its token count under the {WP_MERGES}-merge WordPiece "
    "vocabulary — the BERT-style twin of bpe_corpus_encoding, and the "
    "number that sizes encoder-model training budgets. Same "
    "train-once/apply-many artifact discipline: the per-type segment "
    "table is a PERSISTED artifact keyed by merge count + corpus "
    "fingerprint, and the apply path is one explode, one broadcast "
    "dictionary join on the word key, one doc-keyed aggregation — the "
    "learn loop is never paid per query.",
)
def q_wordpiece_corpus_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import _persisted_index

    docs = load_table(spark, "documents", sf_dir)

    def _build_seg() -> DataFrame:
        at = _initial_symbol_arrays(_word_types(docs), wp=True).localCheckpoint(
            eager=True
        )
        with scoped_shuffle_width(spark, at.count()):
            for _ in range(WP_MERGES):
                _, at = _one_merge_arr(at, wp=True)
            return at.select(
                "word", F.size("a").cast("bigint").alias("n_wp_tokens")
            ).localCheckpoint(eager=True)

    seg = _persisted_index(
        spark, "wpseg", sf_dir, f"m{WP_MERGES}", _build_seg, table="documents"
    )
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), "\\s+")).alias("word")
    )
    return (
        toks.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_wp_tokens").cast("bigint").alias("n_wp_tokens"),
            F.sum(F.length("word")).cast("bigint").alias("n_chars"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_wp_tokens",
            "n_chars",
            F.round(
                F.col("n_chars").cast("double") / F.col("n_wp_tokens"), 6
            ).alias("chars_per_token"),
        )
    )


# --- WordPiece inference tokenization (greedy max-munch) ---------------------
#
# The RUNTIME algorithm (HF WordPiece docs; Wu et al. 2016 §4.1 describe
# greedy longest-match-first): at inference BERT does not replay merges —
# it greedily takes the longest vocabulary prefix at each position, with
# '##' continuation candidates past position 1. Sequential per word as
# usually written; HERE it is a FIXED-DEPTH distributed kernel:
#
#   1. longest-match table: every (word, pos) gets its best match length
#      via one bounded explode (pos x unit-length <= |word| x max vocab
#      unit) + one broadcast vocab join + one max aggregation;
#   2. the greedy walk next[pos] = pos + bestlen[pos] is a functional
#      graph, so token counts and the token path come from POINTER
#      DOUBLING (the dedup_clusters idiom): WP_DOUBLING self-joins of
#      the type-table-sized node frame handle words up to 2^WP_DOUBLING
#      chars — no data-dependent driver loop at all, and a convergence
#      tripwire (assert_true) fires loudly if a corpus ever exceeds it.
#
# At 100 TB this is the tokenizer-SERVING shape: vocab is a broadcast
# dictionary, the walk is log2(max word length) joins over the
# Zipf-bounded type table, and documents only ever join the finished
# (word -> n_tokens) artifact.

WP_DOUBLING = 5  # pointer-doubling rounds: words up to 2^5 = 32 chars


def _wp_vocab(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """The learned WordPiece vocabulary: the marked initial alphabet plus
    the WP_MERGES merged units (BERT keeps every intermediate unit)."""
    at = _initial_symbol_arrays(_word_types(docs), wp=True).localCheckpoint(eager=True)
    vocab = at.select(F.explode("a").alias("sym")).distinct()
    merged: list[str] = []
    with scoped_shuffle_width(spark, at.count()):
        for _ in range(WP_MERGES):
            rule, at = _one_merge_arr(at, wp=True)
            if rule is not None:
                merged.append(_wp_merged_str(rule["merge_left"], rule["merge_right"]))
    if merged:
        vocab = vocab.unionByName(
            spark.createDataFrame([(m,) for m in merged], "sym string")
        )
    return vocab.distinct().localCheckpoint(eager=True)


def _maxmunch_oracle() -> str:
    """The max-munch walk in SQL: vocab from the unrolled learn chain,
    longest-match table, then WP_DOUBLING unrolled pointer-doubling CTEs."""
    vocab_union = "\n      UNION\n      ".join(
        f"SELECT merge_left || substring(merge_right, 3) AS sym FROM r{i}"
        for i in range(1, WP_MERGES + 1)
    )
    ctes = f""", vocab AS (
      SELECT DISTINCT sym FROM s1
      UNION
      {vocab_union}
    ),
    ml AS (
      SELECT MAX(len(CASE WHEN sym LIKE '##%' THEN substring(sym, 3)
                          ELSE sym END)) AS ml
      FROM vocab
    ),
    cand AS (
      SELECT c.word, c.p, c.l FROM (
        SELECT w.word, CAST(pp.p AS INTEGER) AS p, CAST(ll.l AS INTEGER) AS l,
               CASE WHEN pp.p = 1
                    THEN substring(w.word, CAST(pp.p AS INTEGER), CAST(ll.l AS INTEGER))
                    ELSE '##' || substring(w.word, CAST(pp.p AS INTEGER), CAST(ll.l AS INTEGER))
               END AS tok
        FROM w, ml, UNNEST(range(1, len(w.word) + 1)) pp(p),
                    UNNEST(range(1, ml.ml + 1)) ll(l)
        WHERE pp.p + ll.l <= len(w.word) + 1
      ) c JOIN vocab v ON v.sym = c.tok
    ),
    g0 AS (
      SELECT word, p, p + bl AS nxt, CAST(1 AS BIGINT) AS hops,
             CASE WHEN p = 1 THEN substring(word, p, bl)
                  ELSE '##' || substring(word, p, bl) END AS path
      FROM (SELECT word, p, MAX(l) AS bl FROM cand GROUP BY word, p)
      UNION ALL
      SELECT word, len(word) + 1, len(word) + 1, 0, '' FROM w
    )"""
    for j in range(1, WP_DOUBLING + 1):
        ctes += f""",
    g{j} AS (
      SELECT a.word, a.p, b.nxt, a.hops + b.hops AS hops,
             a.path || CASE WHEN b.path = '' THEN '' ELSE ' ' || b.path END AS path
      FROM g{j - 1} a JOIN g{j - 1} b ON b.word = a.word AND b.p = a.nxt
    )"""
    final = f"""{ctes}
    SELECT g.word, w.freq,
           CAST(len(g.word) AS BIGINT) AS n_chars,
           g.hops AS n_tokens,
           g.path AS segmentation
    FROM g{WP_DOUBLING} g JOIN w ON w.word = g.word
    WHERE g.p = 1"""
    return _wp_oracle(final=final)


@register(
    "wordpiece_maxmunch_encoding",
    oracle=_maxmunch_oracle(),
    doc=f"WordPiece INFERENCE tokenization (greedy longest-match-first, "
    "the algorithm BERT serving actually runs — Wu et al. 2016) as a "
    "FIXED-DEPTH distributed kernel over the word-type table: one "
    "bounded explode + broadcast vocab join builds the longest-match "
    "table, and the sequential greedy walk becomes POINTER DOUBLING "
    f"({WP_DOUBLING} self-joins handle words to 2^{WP_DOUBLING} chars; "
    "an assert_true tripwire fires if a corpus exceeds it) — no "
    "data-dependent driver loop, the per-word token count AND the "
    "segmentation string both accumulated through the doubling. The "
    "vocabulary (marked alphabet + all merged units) is a persisted "
    "artifact keyed by merge count + corpus fingerprint. Max-munch can "
    "differ from the training segmentation on the same word — this is "
    "the serving-side twin of wordpiece_corpus_encoding. Oracle: the "
    "unrolled learn chain + the same doubling, unrolled.",
)
def q_wordpiece_maxmunch_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import _persisted_index

    docs = load_table(spark, "documents", sf_dir)
    vocab = _persisted_index(
        spark,
        "wpvocab",
        sf_dir,
        f"m{WP_MERGES}",
        lambda: _wp_vocab(spark, docs),
        table="documents",
    )
    wt = _word_types(docs).localCheckpoint(eager=True)
    with scoped_shuffle_width(spark, wt.count()):
        ml = vocab.agg(
            F.max(F.length(F.regexp_replace("sym", "^##", ""))).alias("ml")
        )
        tok = F.when(
            F.col("p") == 1, F.expr("substring(word, p, l)")
        ).otherwise(F.concat(F.lit("##"), F.expr("substring(word, p, l)")))
        cand = (
            wt.crossJoin(F.broadcast(ml))
            .select(
                "word",
                F.explode(F.sequence(F.lit(1), F.length("word"))).alias("p"),
                "ml",
            )
            .select(
                "word", "p", F.explode(F.sequence(F.lit(1), F.col("ml"))).alias("l")
            )
            .filter(F.col("p") + F.col("l") <= F.length("word") + 1)
            .withColumn("tok", tok)
            .join(F.broadcast(vocab), F.col("tok") == F.col("sym"))
        )
        best = cand.groupBy("word", "p").agg(F.max("l").alias("bl"))
        path0 = F.when(
            F.col("p") == 1, F.expr("substring(word, p, bl)")
        ).otherwise(F.concat(F.lit("##"), F.expr("substring(word, p, bl)")))
        g = (
            best.select(
                "word",
                "p",
                (F.col("p") + F.col("bl")).alias("nxt"),
                F.lit(1).cast("bigint").alias("hops"),
                path0.alias("path"),
            )
            .unionByName(
                wt.select(
                    "word",
                    (F.length("word") + 1).alias("p"),
                    (F.length("word") + 1).alias("nxt"),
                    F.lit(0).cast("bigint").alias("hops"),
                    F.lit("").alias("path"),
                )
            )
            .localCheckpoint(eager=True)
        )
        for _ in range(WP_DOUBLING):
            a = g.select(
                "word",
                "p",
                F.col("nxt").alias("j"),
                F.col("hops").alias("hops_a"),
                F.col("path").alias("path_a"),
            )
            b = g.select(
                "word",
                F.col("p").alias("j"),
                "nxt",
                F.col("hops").alias("hops_b"),
                F.col("path").alias("path_b"),
            )
            g = (
                a.join(b, ["word", "j"])
                .select(
                    "word",
                    "p",
                    "nxt",
                    (F.col("hops_a") + F.col("hops_b")).alias("hops"),
                    F.concat(
                        "path_a",
                        F.when(F.col("path_b") == "", F.lit("")).otherwise(
                            F.concat(F.lit(" "), F.col("path_b"))
                        ),
                    ).alias("path"),
                )
                .localCheckpoint(eager=True)
            )
    out = (
        g.filter(F.col("p") == 1)
        .join(wt, "word")
        .select(
            "word",
            "freq",
            F.length("word").cast("bigint").alias("n_chars"),
            # convergence tripwire: 2^WP_DOUBLING hops must have reached
            # the terminal; fires only on words > 32 chars (never on the
            # fixtures — the oracle has no tripwire, so parity holds)
            F.when(
                F.col("nxt") == F.length("word") + 1, F.col("hops")
            )
            .otherwise(
                F.assert_true(
                    F.col("nxt") == F.length("word") + 1,
                    F.concat(
                        F.lit("wordpiece max-munch did not converge in "
                              f"{WP_DOUBLING} doublings for word: "),
                        F.col("word"),
                    ),
                ).cast("bigint")
            )
            .alias("n_tokens"),
            F.col("path").alias("segmentation"),
        )
    )
    return out


# --- cross-tokenizer fertility report ----------------------------------------


def _fertility_oracle() -> str:
    """Each tokenizer's unrolled chain embedded as an independent
    subquery (WITH scopes nest cleanly in DuckDB), joined per source."""
    bpe_doc = _bpe_oracle(
        final=f""", seg AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n_bpe_tokens
      FROM s{BPE_MERGES + 1} GROUP BY word
    ),
    toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
      FROM documents
    )
    SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(s.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens
    FROM toks t JOIN seg s ON s.word = t.word
    GROUP BY t.doc_id"""
    )
    wp_doc = _wp_oracle(
        final=f""", seg AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n_wp_tokens
      FROM s{WP_MERGES + 1} GROUP BY word
    ),
    toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
      FROM documents
    )
    SELECT t.doc_id, CAST(SUM(s.n_wp_tokens) AS BIGINT) AS n_wp_tokens
    FROM toks t JOIN seg s ON s.word = t.word
    GROUP BY t.doc_id"""
    )
    uni_doc = _unigram_oracle(
        final=f""", seg AS (
      {" UNION ALL ".join(f"SELECT word, nseg FROM b{j} WHERE len(word) = {j}" for j in range(1, UNI_MAXW + 1))}
    ),
    toks AS (
      SELECT doc_id, word
      FROM (SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\\s+')) AS word
            FROM documents)
      WHERE len(word) >= 1
    )
    SELECT t.doc_id,
           CAST(COUNT(s.word) AS BIGINT) AS uni_words,
           CAST(COALESCE(SUM(s.nseg), 0) AS BIGINT) AS uni_segments
    FROM toks t LEFT JOIN seg s ON s.word = t.word
    GROUP BY t.doc_id"""
    )
    mm_type = _maxmunch_oracle()
    return f"""
    WITH bpe AS ({bpe_doc}),
    wp AS ({wp_doc}),
    uni AS ({uni_doc}),
    mm AS (
      SELECT st.source, CAST(SUM(m.n_tokens) AS BIGINT) AS mm_tokens
      FROM (SELECT source,
                   unnest(string_split_regex(trim(text), '\\s+')) AS word
            FROM documents) st
      JOIN ({mm_type}) m ON m.word = st.word
      GROUP BY st.source
    ),
    per AS (
      SELECT d.source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(b.n_words) AS BIGINT) AS n_words,
             CAST(SUM(b.n_bpe_tokens) AS BIGINT) AS bpe_tokens,
             CAST(SUM(w.n_wp_tokens) AS BIGINT) AS wp_tokens,
             CAST(SUM(u.uni_words) AS BIGINT) AS uni_covered_words,
             CAST(SUM(u.uni_segments) AS BIGINT) AS uni_segments
      FROM documents d
      JOIN bpe b ON b.doc_id = d.doc_id
      JOIN wp w ON w.doc_id = d.doc_id
      JOIN uni u ON u.doc_id = d.doc_id
      GROUP BY d.source
    )
    SELECT p.source, p.n_docs, p.n_words,
           p.bpe_tokens,
           round(p.bpe_tokens / CAST(p.n_words AS DOUBLE), 6) AS bpe_fertility,
           p.wp_tokens,
           round(p.wp_tokens / CAST(p.n_words AS DOUBLE), 6) AS wp_fertility,
           m.mm_tokens,
           round(m.mm_tokens / CAST(p.n_words AS DOUBLE), 6) AS mm_fertility,
           p.uni_covered_words, p.uni_segments,
           round(p.uni_segments / CAST(p.uni_covered_words AS DOUBLE), 6)
             AS uni_fertility
    FROM per p JOIN mm m ON m.source = p.source
    ORDER BY p.source"""


@register(
    "tokenizer_fertility_report",
    oracle=_fertility_oracle(),
    doc="The tokenizer-SELECTION report: per source, fertility (tokens "
    "per word) under every induction algorithm the engine ships — BPE "
    "training segmentation, WordPiece training segmentation, WordPiece "
    "max-munch serving, and the unigram-LM Viterbi (over its covered "
    "words, the honest denominator) — the table a team reads before "
    "committing a tokenizer for a corpus, since fertility drives "
    "training cost and context usage directly. The composition is the "
    "artifact-discipline payoff: all four legs ride their PERSISTED "
    "segment/vocab tables (nothing re-learns), so the report costs four "
    "broadcast dictionary joins + one source-keyed aggregation. Token "
    "sums stay exact BIGINTs; each fertility is one IEEE division. "
    "Oracle: the four unrolled chains embedded as independent "
    "subqueries, joined per source.",
)
def q_tokenizer_fertility_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    src = docs.select("doc_id", "source")
    bpe = q_bpe_corpus_encoding(spark, sf_dir).select(
        "doc_id", "n_words", "n_bpe_tokens"
    )
    wp = q_wordpiece_corpus_encoding(spark, sf_dir).select("doc_id", "n_wp_tokens")
    uni = q_unigram_corpus_encoding(spark, sf_dir).select(
        "doc_id",
        F.col("n_words").alias("uni_words"),
        F.col("n_segments").alias("uni_segments"),
    )
    mm = q_wordpiece_maxmunch_encoding(spark, sf_dir).select("word", "n_tokens")
    mm_per_source = (
        docs.select(
            "source", F.explode(F.split(F.trim("text"), "\\s+")).alias("word")
        )
        .join(F.broadcast(mm), "word")
        .groupBy("source")
        .agg(F.sum("n_tokens").cast("bigint").alias("mm_tokens"))
    )
    per = (
        src.join(bpe, "doc_id")
        .join(wp, "doc_id")
        .join(uni, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_bpe_tokens").cast("bigint").alias("bpe_tokens"),
            F.sum("n_wp_tokens").cast("bigint").alias("wp_tokens"),
            F.sum("uni_words").cast("bigint").alias("uni_covered_words"),
            F.sum("uni_segments").cast("bigint").alias("uni_segments"),
        )
    )
    return (
        per.join(F.broadcast(mm_per_source), "source")
        .select(
            "source",
            "n_docs",
            "n_words",
            "bpe_tokens",
            F.round(
                F.col("bpe_tokens") / F.col("n_words").cast("double"), 6
            ).alias("bpe_fertility"),
            "wp_tokens",
            F.round(
                F.col("wp_tokens") / F.col("n_words").cast("double"), 6
            ).alias("wp_fertility"),
            "mm_tokens",
            F.round(
                F.col("mm_tokens") / F.col("n_words").cast("double"), 6
            ).alias("mm_fertility"),
            "uni_covered_words",
            "uni_segments",
            F.round(
                F.col("uni_segments") / F.col("uni_covered_words").cast("double"), 6
            ).alias("uni_fertility"),
        )
        .orderBy("source")
    )


# --- vocabulary-size sweep ----------------------------------------------------

# A learned merge list is PREFIX-CLOSED: the vocabulary after k merges is
# the alphabet plus the first k merged units, so one ranked vocab table
# (sym, kreq = the merge rank that introduced it; 0 for the alphabet)
# serves every candidate budget at once. That is exactly how production
# teams read the vocab-size-vs-fertility tradeoff (32k vs 64k vs 128k)
# without training per-size tokenizers.
WP_VOCAB_SWEEP = [0, 2, 4, WP_MERGES]


def _wp_vocab_ranked(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(sym, kreq): the WordPiece vocabulary with the merge rank that
    first introduced each unit (0 = initial alphabet; duplicates keep
    their earliest rank)."""
    at = _initial_symbol_arrays(_word_types(docs), wp=True).localCheckpoint(eager=True)
    vocab = (
        at.select(F.explode("a").alias("sym"))
        .distinct()
        .withColumn("kreq", F.lit(0).cast("bigint"))
    )
    merged: list[tuple] = []
    with scoped_shuffle_width(spark, at.count()):
        for i in range(1, WP_MERGES + 1):
            rule, at = _one_merge_arr(at, wp=True)
            if rule is not None:
                merged.append(
                    (_wp_merged_str(rule["merge_left"], rule["merge_right"]), i)
                )
    if merged:
        vocab = vocab.unionByName(
            spark.createDataFrame(merged, "sym string, kreq bigint")
        )
    return (
        vocab.groupBy("sym").agg(F.min("kreq").alias("kreq")).localCheckpoint(eager=True)
    )


def _vocab_sweep_oracle() -> str:
    """Per-budget max-munch in SQL: the unrolled learn chain feeds a
    ranked vocab; every sweep budget runs the same pointer doubling with
    the budget as an extra join key."""
    vocab_union = "\n      UNION ALL\n      ".join(
        f"SELECT merge_left || substring(merge_right, 3) AS sym, "
        f"CAST({i} AS BIGINT) AS kreq FROM r{i}"
        for i in range(1, WP_MERGES + 1)
    )
    ctes = f""", vocab_k AS (
      SELECT sym, CAST(0 AS BIGINT) AS kreq FROM (SELECT DISTINCT sym FROM s1)
      UNION ALL
      {vocab_union}
    ),
    vk AS (SELECT sym, MIN(kreq) AS kreq FROM vocab_k GROUP BY sym),
    sweep AS (SELECT unnest(ARRAY{WP_VOCAB_SWEEP}) AS k),
    vs AS (
      SELECT s.k, CAST(COUNT(*) AS BIGINT) AS vocab_size
      FROM sweep s JOIN vk v ON v.kreq <= s.k GROUP BY s.k
    ),
    ml AS (
      SELECT MAX(len(CASE WHEN sym LIKE '##%' THEN substring(sym, 3)
                          ELSE sym END)) AS ml
      FROM vk
    ),
    cand AS (
      SELECT s.k, c.word, c.p, c.l FROM (
        SELECT w.word, CAST(pp.p AS INTEGER) AS p, CAST(ll.l AS INTEGER) AS l,
               CASE WHEN pp.p = 1
                    THEN substring(w.word, CAST(pp.p AS INTEGER), CAST(ll.l AS INTEGER))
                    ELSE '##' || substring(w.word, CAST(pp.p AS INTEGER), CAST(ll.l AS INTEGER))
               END AS tok
        FROM w, ml, UNNEST(range(1, len(w.word) + 1)) pp(p),
                    UNNEST(range(1, ml.ml + 1)) ll(l)
        WHERE pp.p + ll.l <= len(w.word) + 1
      ) c JOIN vk v ON v.sym = c.tok
      JOIN sweep s ON v.kreq <= s.k
    ),
    h0 AS (
      SELECT k, word, p, p + bl AS nxt, CAST(1 AS BIGINT) AS hops
      FROM (SELECT k, word, p, MAX(l) AS bl FROM cand GROUP BY k, word, p)
      UNION ALL
      SELECT s.k, word, len(word) + 1, len(word) + 1, 0 FROM w, sweep s
    )"""
    for j in range(1, WP_DOUBLING + 1):
        ctes += f""",
    h{j} AS (
      SELECT a.k, a.word, a.p, b.nxt, a.hops + b.hops AS hops
      FROM h{j - 1} a JOIN h{j - 1} b
        ON b.k = a.k AND b.word = a.word AND b.p = a.nxt
    )"""
    final = f"""{ctes}
    SELECT g.k AS vocab_merges, vs.vocab_size,
           CAST(SUM(w.freq) AS BIGINT) AS n_words,
           CAST(SUM(len(g.word) * w.freq) AS BIGINT) AS n_chars,
           CAST(SUM(g.hops * w.freq) AS BIGINT) AS total_tokens,
           round(CAST(SUM(g.hops * w.freq) AS DOUBLE) / SUM(w.freq), 6) AS fertility,
           round(CAST(SUM(len(g.word) * w.freq) AS DOUBLE)
                 / SUM(g.hops * w.freq), 6) AS avg_token_len
    FROM h{WP_DOUBLING} g JOIN w ON w.word = g.word JOIN vs ON vs.k = g.k
    WHERE g.p = 1
    GROUP BY g.k, vs.vocab_size
    ORDER BY vocab_merges"""
    return _wp_oracle(final=final)


@register(
    "wp_vocab_size_sweep",
    oracle=_vocab_sweep_oracle(),
    doc=f"Vocabulary-budget tuner (the fifth parameter-sweep report): "
    "corpus fertility and mean token length under every candidate "
    "vocab size at once, exploiting that a merge list is PREFIX-CLOSED "
    "— vocab after k merges = alphabet + first k units, so ONE ranked "
    "vocab artifact (sym, introducing rank; persisted, keyed by merge "
    "count + corpus fingerprint) serves the whole sweep, and the "
    "serving-path max-munch pointer doubling runs once with the budget "
    "as an extra join key (sweep-parallel, still fixed-depth, no "
    "driver loop). k=0 is the alphabet floor (fertility = chars/word); "
    f"k={WP_MERGES} is wordpiece_maxmunch_encoding's exact vocabulary, "
    "pinning the sweep's endpoint to the certified serving op. This is "
    "the table a team reads before committing a tokenizer budget "
    "(vocab rows vs average tokens per word). Oracle: the unrolled "
    "learn chain + ranked vocab + per-budget doubling, unrolled.",
)
def q_wp_vocab_size_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import _persisted_index

    docs = load_table(spark, "documents", sf_dir)
    vk = _persisted_index(
        spark,
        "wpvocabk",
        sf_dir,
        f"m{WP_MERGES}",
        lambda: _wp_vocab_ranked(spark, docs),
        table="documents",
    )
    wt = _word_types(docs).localCheckpoint(eager=True)
    sweep = spark.createDataFrame([(k,) for k in WP_VOCAB_SWEEP], "k bigint")
    with scoped_shuffle_width(spark, wt.count()):
        vs = (
            sweep.join(F.broadcast(vk), F.col("kreq") <= F.col("k"))
            .groupBy("k")
            .agg(F.count("*").cast("bigint").alias("vocab_size"))
        )
        ml = vk.agg(
            F.max(F.length(F.regexp_replace("sym", "^##", ""))).alias("ml")
        )
        tok = F.when(
            F.col("p") == 1, F.expr("substring(word, p, l)")
        ).otherwise(F.concat(F.lit("##"), F.expr("substring(word, p, l)")))
        cand = (
            wt.crossJoin(F.broadcast(ml))
            .select(
                "word",
                F.explode(F.sequence(F.lit(1), F.length("word"))).alias("p"),
                "ml",
            )
            .select(
                "word", "p", F.explode(F.sequence(F.lit(1), F.col("ml"))).alias("l")
            )
            .filter(F.col("p") + F.col("l") <= F.length("word") + 1)
            .withColumn("tok", tok)
            .join(F.broadcast(vk), F.col("tok") == F.col("sym"))
            .join(F.broadcast(sweep), F.col("kreq") <= F.col("k"))
        )
        best = cand.groupBy("k", "word", "p").agg(F.max("l").alias("bl"))
        g = (
            best.select(
                "k",
                "word",
                "p",
                (F.col("p") + F.col("bl")).alias("nxt"),
                F.lit(1).cast("bigint").alias("hops"),
            )
            .unionByName(
                wt.crossJoin(F.broadcast(sweep)).select(
                    "k",
                    "word",
                    (F.length("word") + 1).alias("p"),
                    (F.length("word") + 1).alias("nxt"),
                    F.lit(0).cast("bigint").alias("hops"),
                )
            )
            .localCheckpoint(eager=True)
        )
        for _ in range(WP_DOUBLING):
            a = g.select(
                "k", "word", "p", F.col("nxt").alias("j"), F.col("hops").alias("hops_a")
            )
            b = g.select(
                "k", "word", F.col("p").alias("j"), "nxt", F.col("hops").alias("hops_b")
            )
            g = (
                a.join(b, ["k", "word", "j"])
                .select(
                    "k",
                    "word",
                    "p",
                    "nxt",
                    (F.col("hops_a") + F.col("hops_b")).alias("hops"),
                )
                .localCheckpoint(eager=True)
            )
        enc = g.filter(F.col("p") == 1).join(wt, "word")
        return (
            enc.groupBy("k")
            .agg(
                F.sum("freq").cast("bigint").alias("n_words"),
                F.sum(F.length("word") * F.col("freq")).cast("bigint").alias("n_chars"),
                F.sum(F.col("hops") * F.col("freq")).cast("bigint").alias("total_tokens"),
                F.round(
                    F.sum(F.col("hops") * F.col("freq")).cast("double")
                    / F.sum("freq"),
                    6,
                ).alias("fertility"),
                F.round(
                    F.sum(F.length("word") * F.col("freq")).cast("double")
                    / F.sum(F.col("hops") * F.col("freq")),
                    6,
                ).alias("avg_token_len"),
            )
            .join(F.broadcast(vs), "k")
            .select(
                F.col("k").alias("vocab_merges"),
                "vocab_size",
                "n_words",
                "n_chars",
                "total_tokens",
                "fertility",
                "avg_token_len",
            )
            .orderBy("vocab_merges")
        )
