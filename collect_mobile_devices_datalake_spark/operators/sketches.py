"""KMV (k-minimum-values) distinct sketches over ``documents``.

The missing piece between ``approx_count_distinct`` (HLL — mergeable but
opaque and union-only) and exact ``COUNT(DISTINCT ...)`` (one shuffle of
every distinct key): a KMV sketch keeps the k smallest hash values of a
set. It is

- **mergeable**: k-min of a union = k-min of the concatenated partial
  k-mins, so each executor ships at most k values per group and the
  reduce side touches ``n_partitions * k`` rows, never the vocabulary —
  the 100 TB plan for per-source cardinality;
- **intersectable**: unlike HLL, two KMV sketches estimate their sets'
  Jaccard directly (Beyer et al., "On synopses for distinct-value
  estimation", SIGMOD'07): J ≈ |topk(A ∪ B) ∩ A ∩ B| / k — which HLL
  can only get via inclusion-exclusion with compounding error.

Both queries double as sketch QA (like ``minhash_estimate_quality``):
they carry the exact value next to the estimate so the driver oracle
pins the estimator arithmetic bit-for-bit, and the error column is the
calibration report.

Hashes are the pure-arithmetic polynomial rolling hash
(``functions.text.rolling_hash``) — reproducible in DuckDB, which is
what makes a value-level oracle for a *sketch* possible at all.

Reference lineage: the reference keeps per-source row counts only
(app.js:700-714, COUNT(*) loops); these are the scale-path analogues a
lake that large actually needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import rolling_hash
from ..registry import register
from ..session import fan_out, load_table

P = 1_000_000_007
K = 64

# --- shared DuckDB fragments -------------------------------------------------

# one token's rolling hash (t bound by the enclosing scope)
_TOKEN_HASH_SQL = (
    "list_reduce(list_transform(range(1, length(t) + 1), "
    "i -> CAST(ascii(substring(t, i, 1)) AS BIGINT)), "
    "(acc, x) -> (acc * 31 + x) % 1000000007)"
)

# distinct (source, token-hash) pairs
_SOURCE_HASHES_SQL = f"""
  SELECT DISTINCT source, {_TOKEN_HASH_SQL} AS h
  FROM (
    SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS t
    FROM documents
  ) WHERE length(t) > 0
"""

def kmv_sketch_sql(pairs_sql: str, key: str) -> str:
    """DuckDB fragment: per-``key`` ordered k-min list + exact distinct
    count over a (key, h) pairs relation."""
    return f"""
  SELECT {key},
         list_sort(list(h ORDER BY h) FILTER (rk <= {K})) AS kmin,
         max(n_exact) AS n_exact
  FROM (
    SELECT {key}, h,
           row_number() OVER (PARTITION BY {key} ORDER BY h) AS rk,
           COUNT(*) OVER (PARTITION BY {key}) AS n_exact
    FROM ({pairs_sql})
  ) GROUP BY {key}
"""


# per-source ordered k-min list + exact distinct count
_KMV_SKETCH_SQL = kmv_sketch_sql(_SOURCE_HASHES_SQL, "source")


def token_hash_pairs(docs: DataFrame) -> DataFrame:
    """(source, h) token-hash pairs, NOT deduplicated — the map-only
    frame the sketch path consumes (KMV doesn't need set semantics on
    its input; duplicates cost nothing past the prefilter)."""
    toks = docs.select(
        "source", F.explode(F.split(F.trim("text"), "\\s+")).alias("t")
    ).filter(F.length("t") > 0)
    return toks.select("source", rolling_hash("t").alias("h"))


def token_hashes(docs: DataFrame) -> DataFrame:
    """(source, h): the DISTINCT token-hash pairs of each source — the
    exact legs (n_exact, pairwise exact Jaccard) need set semantics.

    Hash FIRST, then distinct: the dedup shuffle moves (source, int64)
    instead of (source, token-text) — the same 8-byte-key rule as the
    PPJoin candidate shuffle (dedup.py).
    """
    return token_hash_pairs(docs).distinct()


def _source_token_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_hashes(fan_out(load_table(spark, "documents", sf_dir), "doc_id"))


def kmv_merge_expr(k: int = K):
    """The lattice join: k smallest of the concatenated partial k-mins.
    Associative, commutative, AND idempotent (a G-set-with-bound CRDT):
    re-merging a partial you already absorbed changes nothing — which is
    what makes streaming maintenance replay/re-delivery-proof without
    any anti-join."""
    return F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmin")))), 1, k
    )


KMV_THRESHOLD_MARGIN = 8  # prefilter keeps ~margin*k smallest per source


def kmv_kmin(pairs: DataFrame, k: int = K, key: str = "source") -> DataFrame:
    """(key, kmin): the exact k smallest distinct hashes per group,
    via an HLL-threshold prefilter so no shuffle ever carries a
    vocabulary.

    The naive plans both move O(vocab) over the network: a distinct
    shuffles every pair, and a per-partition collect_set partial ships
    each partition's full distinct set (the slice only applies AFTER the
    aggregate completes). Instead:

    1. ``approx_count_distinct`` per source — HLL partials are the
       bounded mergeable aggregate, so this shuffle is O(sources).
    2. Broadcast the per-source cutoff ``P * k * margin / est`` and
       filter map-side: uniform hashes put the true kth-min near
       ``k*P/n``, so survivors are ~``margin * k`` rows per source.
       With margin 8 and HLL error ±5%, the probability the cutoff
       undershoots the true kth-min is the Binomial(n, 8k/n) lower tail
       at k — astronomically small (and shrinking with n); the oracle
       gate would catch it as a value mismatch, not silent drift.
    3. Exact k-min on the survivor set — tiny by construction.

    Cost shape at 100 TB: two map-only scans of the pairs + two bounded
    shuffles, versus one vocabulary-wide shuffle — scans parallelize
    linearly; the shuffle is the thing that doesn't.
    """
    est = pairs.groupBy(key).agg(F.approx_count_distinct("h").alias("est"))
    thr = est.select(
        key,
        F.least(
            F.lit(float(P)), F.lit(float(P) * k * KMV_THRESHOLD_MARGIN) / F.col("est")
        ).alias("thr"),
    )
    survivors = pairs.join(F.broadcast(thr), key).filter(
        F.col("h") < F.col("thr")
    )
    return survivors.groupBy(key).agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("kmin")
    )


def kmv_sketches(hashed: DataFrame, k: int = K, key: str = "source") -> DataFrame:
    """(key, kmin array, n_exact): sketch + exact calibration column.

    The sketch leg is `kmv_kmin` (HLL-threshold prefilter, bounded
    shuffles). ``n_exact`` is the one aggregate that still pays a full
    distinct shuffle — at 100 TB you drop it and keep the sketch; here
    it is what lets the oracle pin the estimator arithmetic.
    """
    exact = hashed.groupBy(key).agg(F.countDistinct("h").alias("n_exact"))
    return kmv_kmin(hashed, k, key).join(F.broadcast(exact), key)


@register(
    "kmv_vocab_distinct",
    oracle=f"""
    WITH sk AS ({_KMV_SKETCH_SQL})
    SELECT source,
           CAST({K} AS BIGINT) AS k,
           kmin[LEAST({K}, CAST(n_exact AS INT))] AS kth_min,
           CASE WHEN n_exact < {K} THEN n_exact
                ELSE CAST(floor({(K - 1) * P}.0 / kmin[{K}]) AS BIGINT)
           END AS est_distinct,
           n_exact,
           round(100.0 * abs(
             (CASE WHEN n_exact < {K} THEN n_exact
                   ELSE CAST(floor({(K - 1) * P}.0 / kmin[{K}]) AS BIGINT) END)
             - n_exact) / n_exact, 6) AS err_pct
    FROM sk ORDER BY source
    """,
    doc="Per-source distinct-vocabulary cardinality from a k-minimum-"
    "values sketch (k=64), with the exact count alongside as the "
    "calibration column. Estimator: (k-1) * HASH_SPACE / kth_min when "
    "the sketch is full, else the sketch IS the set and the count is "
    "exact. The build is the two-level mergeable plan (partial k-min "
    "per partition, then a k-bounded merge) — per-source distincts at "
    "100 TB without shuffling a vocabulary, and the same partials are "
    "what a streaming sink would checkpoint.",
)
def q_kmv_vocab_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    sk = kmv_sketches(_source_token_hashes(spark, sf_dir))
    kth = F.element_at("kmin", F.least(F.lit(K), F.size("kmin")))
    est = F.when(F.col("n_exact") < K, F.col("n_exact")).otherwise(
        F.floor(F.lit(float((K - 1) * P)) / F.element_at("kmin", K)).cast("long")
    )
    return (
        sk.select(
            "source",
            F.lit(K).cast("long").alias("k"),
            kth.alias("kth_min"),
            est.alias("est_distinct"),
            "n_exact",
            F.round(
                100.0 * F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6
            ).alias("err_pct"),
        )
        .orderBy("source")
    )


@register(
    "kmv_vocab_jaccard",
    oracle=f"""
    WITH sk AS ({_KMV_SKETCH_SQL}),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             list_sort(list_distinct(list_concat(a.kmin, b.kmin)))[1:{K}] AS m,
             a.kmin AS ka, b.kmin AS kb
      FROM sk a JOIN sk b ON a.source < b.source
    ),
    est AS (
      SELECT source_a, source_b,
             round(CAST(len(list_intersect(list_intersect(m, ka), kb)) AS DOUBLE)
                   / len(m), 6) AS est_jaccard
      FROM pairs
    ),
    g AS ({_SOURCE_HASHES_SQL}),
    sizes AS (SELECT source, COUNT(*) AS n FROM g GROUP BY source),
    exact AS (
      SELECT a.source AS source_a, b.source AS source_b,
             round(CAST(COUNT(*) AS DOUBLE)
                   / (max(sa.n) + max(sb.n) - COUNT(*)), 6) AS exact_jaccard
      FROM g a JOIN g b ON a.h = b.h AND a.source < b.source
      JOIN sizes sa ON sa.source = a.source
      JOIN sizes sb ON sb.source = b.source
      GROUP BY a.source, b.source
    )
    SELECT e.source_a, e.source_b, e.est_jaccard,
           COALESCE(x.exact_jaccard, 0.0) AS exact_jaccard,
           round(abs(e.est_jaccard - COALESCE(x.exact_jaccard, 0.0)), 6) AS err
    FROM est e LEFT JOIN exact x
      ON x.source_a = e.source_a AND x.source_b = e.source_b
    ORDER BY e.source_a, e.source_b
    """,
    doc="Pairwise vocabulary Jaccard between sources estimated from KMV "
    "sketches alone — the intersection HLL cannot give. Estimator "
    "(Beyer et al. SIGMOD'07): among the k smallest of A ∪ B (a "
    "uniform sample of the union), the fraction present in both "
    "sketches. The exact Jaccard rides along as the QA column. At "
    "100 TB the exact leg (`source_vocab_overlap`'s hash self-join) is "
    "dropped and the report costs |sources|² * k longs — the mirrored-"
    "source detector you can afford to run daily.",
)
def q_kmv_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    hashed = _source_token_hashes(spark, sf_dir).localCheckpoint(eager=True)
    sk = kmv_sketches(hashed)
    a = sk.select(F.col("source").alias("source_a"), F.col("kmin").alias("ka"))
    b = sk.select(F.col("source").alias("source_b"), F.col("kmin").alias("kb"))
    merged = F.slice(F.array_sort(F.array_union("ka", "kb")), 1, K)
    pairs = (
        a.join(F.broadcast(b), F.col("source_a") < F.col("source_b"))
        .withColumn("m", merged)
        .select(
            "source_a",
            "source_b",
            F.round(
                F.size(F.array_intersect(F.array_intersect("m", "ka"), "kb"))
                / F.size("m").cast("double"),
                6,
            ).alias("est_jaccard"),
        )
    )
    sizes = hashed.groupBy("source").agg(F.count("*").alias("n"))
    ga = hashed.select(F.col("source").alias("source_a"), "h")
    gb = hashed.select(F.col("source").alias("source_b"), "h")
    exact = (
        ga.join(gb, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_common"))
        .join(
            F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("n").alias("na"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            F.round(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double"),
                6,
            ).alias("exact_jaccard"),
        )
    )
    return (
        pairs.join(exact, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "est_jaccard",
            F.coalesce("exact_jaccard", F.lit(0.0)).alias("exact_jaccard"),
            F.round(
                F.abs(F.col("est_jaccard") - F.coalesce("exact_jaccard", F.lit(0.0))), 6
            ).alias("err"),
        )
        .orderBy("source_a", "source_b")
    )


# integer multiplicative hash for id columns (both engines: pure int64
# arithmetic, no overflow: id * 2654435761 < 2^63 for id < 3.5e9)
_ID_HASH_A = 2_654_435_761  # Knuth's multiplicative constant
_ID_HASH_B = 104_729

_DAU_PAIRS_SQL = f"""
  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         (user_id * {_ID_HASH_A} + {_ID_HASH_B}) % {P} AS h
  FROM events
"""


@register(
    "kmv_daily_active_users",
    oracle=f"""
    WITH sk AS ({{sketch}})
    SELECT day,
           CAST({K} AS BIGINT) AS k,
           kmin[LEAST({K}, CAST(n_exact AS INT))] AS kth_min,
           CASE WHEN n_exact < {K} THEN n_exact
                ELSE CAST(floor({(K - 1) * P}.0 / kmin[{K}]) AS BIGINT)
           END AS est_dau,
           n_exact,
           round(100.0 * abs(
             (CASE WHEN n_exact < {K} THEN n_exact
                   ELSE CAST(floor({(K - 1) * P}.0 / kmin[{K}]) AS BIGINT) END)
             - n_exact) / n_exact, 6) AS err_pct
    FROM sk ORDER BY day
    """.format(sketch=kmv_sketch_sql(_DAU_PAIRS_SQL, "day")),
    doc="Daily active users from a KMV sketch over integer user-id "
    "hashes (Knuth multiplicative — pure int64 arithmetic on both "
    "engines), exact count alongside as calibration. The classic "
    "streaming-analytics distinct: per-day sketches are mergeable "
    "(weekly/monthly DAU = fold of the daily partials, the same "
    "idempotent lattice join the streaming sketch sink uses) and the "
    "build is the bounded-shuffle prefilter plan of kmv_kmin — at "
    "100 TB of events nothing wider than sources x k ever shuffles.",
)
def q_kmv_daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    pairs = e.select(
        F.date_trunc("day", "ts").alias("day"),
        ((F.col("user_id") * _ID_HASH_A + _ID_HASH_B) % P).alias("h"),
    )
    sk = kmv_sketches(pairs, key="day")
    kth = F.element_at("kmin", F.least(F.lit(K), F.size("kmin")))
    est = F.when(F.col("n_exact") < K, F.col("n_exact")).otherwise(
        F.floor(F.lit(float((K - 1) * P)) / F.element_at("kmin", K)).cast("long")
    )
    return (
        sk.select(
            "day",
            F.lit(K).cast("long").alias("k"),
            kth.alias("kth_min"),
            est.alias("est_dau"),
            "n_exact",
            F.round(
                100.0 * F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6
            ).alias("err_pct"),
        )
        .orderBy("day")
    )


_WAU_PAIRS_SQL = f"""
  SELECT DISTINCT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
         (user_id * {_ID_HASH_A} + {_ID_HASH_B}) % {P} AS h
  FROM events
"""


@register(
    "kmv_weekly_from_daily",
    oracle=f"""
    WITH sk AS ({{sketch}})
    SELECT week,
           CAST({K} AS BIGINT) AS k,
           CASE WHEN n_exact < {K} THEN n_exact
                ELSE CAST(floor({(K - 1) * P}.0 / kmin[{K}]) AS BIGINT)
           END AS est_wau,
           n_exact,
           round(100.0 * abs(
             (CASE WHEN n_exact < {K} THEN n_exact
                   ELSE CAST(floor({(K - 1) * P}.0 / kmin[{K}]) AS BIGINT) END)
             - n_exact) / n_exact, 6) AS err_pct
    FROM sk ORDER BY week
    """.format(sketch=kmv_sketch_sql(_WAU_PAIRS_SQL, "week")),
    doc="Weekly active users obtained by FOLDING the per-day KMV "
    "sketches (k-min lattice join over each week's daily partials) — "
    "the rollup never touches the event stream again. The oracle "
    "computes the weekly k-min DIRECTLY from the events, so value "
    "parity is an end-to-end proof of the merge identity "
    "(k-min of a union == k-min of concatenated partial k-mins) on "
    "real data, not just the unit-test property. This is how sketch "
    "rollup hierarchies work at 100 TB: day → week → month each fold "
    "the previous grain's O(k) state, exactly like "
    "rollup_reuse_hierarchy folds numeric partials.",
)
def q_kmv_weekly_from_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    pairs = e.select(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("week", "ts").alias("week"),
        ((F.col("user_id") * _ID_HASH_A + _ID_HASH_B) % P).alias("h"),
    ).localCheckpoint(eager=True)
    daily = kmv_kmin(pairs.select("day", "h"), key="day")
    weekly = (
        daily.join(
            F.broadcast(pairs.select("day", "week").distinct()), "day"
        )
        .groupBy("week")
        .agg(kmv_merge_expr().alias("kmin"))
    )
    exact = pairs.groupBy("week").agg(F.countDistinct("h").alias("n_exact"))
    sk = weekly.join(F.broadcast(exact), "week")
    est = F.when(F.col("n_exact") < K, F.col("n_exact")).otherwise(
        F.floor(F.lit(float((K - 1) * P)) / F.element_at("kmin", K)).cast("long")
    )
    return (
        sk.select(
            "week",
            F.lit(K).cast("long").alias("k"),
            est.alias("est_wau"),
            "n_exact",
            F.round(
                100.0 * F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6
            ).alias("err_pct"),
        )
        .orderBy("week")
    )


# (side, h) key-hash pairs for the two join sides, as ONE relation —
# the same KMV machinery then sketches both sides in one pass
_JOIN_PAIRS_SQL = f"""
  SELECT 'orders' AS side, (o_orderkey * {_ID_HASH_A} + {_ID_HASH_B}) % {P} AS h
  FROM orders
  UNION ALL
  SELECT 'lineitem' AS side, (l_orderkey * {_ID_HASH_A} + {_ID_HASH_B}) % {P} AS h
  FROM lineitem
"""


@register(
    "kmv_join_cardinality",
    oracle=f"""
    WITH sk AS ({kmv_sketch_sql(f"SELECT DISTINCT side, h FROM ({_JOIN_PAIRS_SQL})", "side")}),
    counts AS (
      SELECT CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_a,
             CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_b
    ),
    sides AS (
      SELECT
        (SELECT kmin FROM sk WHERE side = 'orders') AS ka,
        (SELECT n_exact FROM sk WHERE side = 'orders') AS da,
        (SELECT kmin FROM sk WHERE side = 'lineitem') AS kb,
        (SELECT n_exact FROM sk WHERE side = 'lineitem') AS db
    ),
    est AS (
      SELECT
        list_sort(list_distinct(list_concat(ka, kb)))[1:{K}] AS m,
        CASE WHEN da < {K} THEN da
             ELSE CAST(floor({(K - 1) * P}.0 / ka[{K}]) AS BIGINT) END AS est_da,
        CASE WHEN db < {K} THEN db
             ELSE CAST(floor({(K - 1) * P}.0 / kb[{K}]) AS BIGINT) END AS est_db,
        ka, kb, da, db
      FROM sides
    ),
    est2 AS (
      SELECT
        CAST(len(list_intersect(list_intersect(m, ka), kb)) AS DOUBLE) / len(m)
          AS est_jaccard,
        CASE WHEN len(list_distinct(list_concat(ka, kb))) < {K}
             THEN CAST(len(list_distinct(list_concat(ka, kb))) AS BIGINT)
             ELSE CAST(floor({(K - 1) * P}.0 / m[{K}]) AS BIGINT)
        END AS est_union,
        est_da, est_db, ka, kb
      FROM est
    )
    SELECT
      CAST(floor(e.est_jaccard * e.est_union) AS BIGINT) AS est_matched_keys,
      CAST(floor(e.est_jaccard * e.est_union
                 * (c.n_a / e.est_da) * (c.n_b / e.est_db)) AS BIGINT)
        AS est_join_rows,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey) AS exact_join_rows,
      round(100.0 * abs(
        floor(e.est_jaccard * e.est_union * (c.n_a / e.est_da) * (c.n_b / e.est_db))
        - (SELECT COUNT(*) FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey))
        / (SELECT COUNT(*) FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        6) AS err_pct
    FROM est2 e CROSS JOIN counts c
    """,
    doc="Join-cardinality estimation from KMV sketches alone — the "
    "optimizer-statistics use of the sketch family: |A join B| is "
    "estimated as J(A,B) * |A union B| (matched distinct keys, via the "
    "KMV intersection estimator) scaled by each side's rows-per-"
    "distinct-key, with the exact join count alongside as calibration. "
    "At 100 TB this is how a planner decides broadcast-vs-shuffle and "
    "pre-sizes shuffle partitions WITHOUT running the join: the "
    "sketches cost two map passes and O(k) state per side, and they're "
    "the same mergeable daily/per-shard partials the maintenance "
    "streams already keep. Deterministic end to end (integer hash, "
    "exact k-min, fixed estimator arithmetic), hence value-oracled "
    "like every other sketch.",
)
def q_kmv_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    ha = orders.select(
        F.lit("orders").alias("side"),
        ((F.col("o_orderkey") * _ID_HASH_A + _ID_HASH_B) % P).alias("h"),
    )
    hb = lineitem.select(
        F.lit("lineitem").alias("side"),
        ((F.col("l_orderkey") * _ID_HASH_A + _ID_HASH_B) % P).alias("h"),
    )
    sk = kmv_sketches(ha.unionByName(hb).distinct(), key="side").localCheckpoint(
        eager=True
    )
    a = sk.filter(F.col("side") == "orders").select(
        F.col("kmin").alias("ka"), F.col("n_exact").alias("da")
    )
    b = sk.filter(F.col("side") == "lineitem").select(
        F.col("kmin").alias("kb"), F.col("n_exact").alias("db")
    )
    n_a = orders.count()
    n_b = lineitem.count()
    est_side = lambda kcol, dcol: F.when(  # noqa: E731
        F.col(dcol) < K, F.col(dcol)
    ).otherwise(
        F.floor(F.lit(float((K - 1) * P)) / F.element_at(kcol, K)).cast("long")
    )
    one = (
        a.crossJoin(b)
        .withColumn("m", F.slice(F.array_sort(F.array_union("ka", "kb")), 1, K))
        .withColumn("u_full", F.size(F.array_distinct(F.array_union("ka", "kb"))))
        .select(
            (
                F.size(F.array_intersect(F.array_intersect("m", "ka"), "kb"))
                / F.size("m").cast("double")
            ).alias("est_jaccard"),
            F.when(F.col("u_full") < K, F.col("u_full").cast("long"))
            .otherwise(
                F.floor(F.lit(float((K - 1) * P)) / F.element_at("m", K)).cast("long")
            )
            .alias("est_union"),
            est_side("ka", "da").alias("est_da"),
            est_side("kb", "db").alias("est_db"),
        )
    )
    exact = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .count()
    )
    est_rows = (
        F.col("est_jaccard")
        * F.col("est_union")
        * (F.lit(n_a) / F.col("est_da"))
        * (F.lit(n_b) / F.col("est_db"))
    )
    return one.select(
        F.floor(F.col("est_jaccard") * F.col("est_union")).cast("long").alias(
            "est_matched_keys"
        ),
        F.floor(est_rows).cast("long").alias("est_join_rows"),
        F.lit(exact).cast("long").alias("exact_join_rows"),
        F.round(100.0 * F.abs(F.floor(est_rows) - F.lit(exact)) / F.lit(exact), 6).alias(
            "err_pct"
        ),
    )


# --- log-binned quantile sketch ---------------------------------------------

QSKETCH_SUBBITS = 5  # 32 sub-buckets per octave → rel. error <= 2^-5 = 3.125%

_QUANTILES = [(1, 2), (9, 10), (99, 100)]  # exact rationals, no float ceil


def logbin_hist(c: DataFrame) -> DataFrame:
    """(shift, bkey, width, cnt, lower): the log-binned histogram of a
    ``c`` (cents, BIGINT) column. Cell-wise ADDITIVE: per-shard/per-batch
    partials merge by plain SUM over (shift, bkey, width) — the lattice
    the streaming twin (streaming/sketch_maintenance.py) checkpoints."""
    keyed = c.select(
        "c",
        F.greatest(
            F.length(F.bin("c")) - 1 - QSKETCH_SUBBITS, F.lit(0)
        ).alias("shift"),
    )
    p2 = F.pow(F.lit(2.0), F.col("shift")).cast("long")
    return (
        keyed.select("c", "shift", (F.col("c") / p2).cast("long").alias("bkey"), p2.alias("width"))
        .groupBy("shift", "bkey", "width")
        .agg(F.count("*").alias("cnt"))
        .withColumn("lower", F.col("bkey") * F.col("width"))
    )



@register(
    "logbin_quantile_sketch",
    oracle=f"""
    WITH c AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
    keyed AS (
      SELECT c, GREATEST(length(to_base(c, 2)) - 1 - {QSKETCH_SUBBITS}, 0) AS shift
      FROM c
    ),
    hist AS (
      SELECT shift,
             c // CAST(power(2, shift) AS BIGINT) AS bkey,
             (c // CAST(power(2, shift) AS BIGINT))
               * CAST(power(2, shift) AS BIGINT) AS lower,
             CAST(power(2, shift) AS BIGINT) AS width,
             COUNT(*) AS cnt
      FROM keyed GROUP BY shift, c // CAST(power(2, shift) AS BIGINT)
    ),
    cum AS (
      SELECT *,
             COALESCE(SUM(cnt) OVER (ORDER BY lower
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM hist
    ),
    targets AS (
      SELECT round(CAST(num AS DOUBLE) / den, 2) AS q,
             (num * n + den - 1) // den AS r, n
      FROM (VALUES {", ".join(f"({a}, {b})" for a, b in _QUANTILES)}) AS v(num, den)
      CROSS JOIN n
    ),
    est AS (
      SELECT t.q, t.n, t.r,
             cum.lower + ((t.r - cum.cb) * cum.width) // cum.cnt AS est_cents
      FROM targets t JOIN cum ON cum.cb < t.r AND t.r <= cum.cb + cum.cnt
    ),
    ranked AS (SELECT c, row_number() OVER (ORDER BY c) AS rk FROM c),
    ex AS (SELECT t.q, ranked.c AS exact_cents
           FROM targets t JOIN ranked ON ranked.rk = t.r)
    SELECT e.q, e.n AS n_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM hist) AS n_buckets,
           round(e.est_cents / 100.0, 6) AS est_price,
           round(x.exact_cents / 100.0, 6) AS exact_price,
           round(100.0 * abs(e.est_cents - x.exact_cents) / x.exact_cents, 6)
             AS err_pct
    FROM est e JOIN ex x ON x.q = e.q
    ORDER BY e.q
    """,
    doc="Mergeable quantile estimation from a log-binned histogram "
    "sketch (the HdrHistogram/DDSketch idea, integer-exact): prices in "
    "cents are bucketed by [floor-log2 octave, 5-bit sub-bucket], so "
    "the sketch is <= ~32 buckets per octave regardless of row count "
    "and every bucket bound is a power-of-two arithmetic fact both "
    "engines compute identically — no libm in the bucket map. p50/p90/"
    "p99 are read off the cumulative histogram with integer-division "
    "interpolation; the exact rank values ride along (one global sort "
    "— the test-scale calibration luxury, dropped at 100 TB exactly "
    "like KMV's n_exact) and the relative-error column is bounded by "
    "2^-5 = 3.125% by construction, asserted in tests. Ranks come from "
    "exact rational ceil ((num*n + den - 1) div den), never float. "
    "Unlike percentile_approx (opaque, engine-specific) the bucket "
    "sums are plain counts: cell-wise ADDITIVE like the CMS — per-"
    "shard partials merge by sum, the streaming-checkpoint shape, and "
    "day->week rollups fold for free.",
)
def q_logbin_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, "lineitem", sf_dir)
    c = li.select(F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"))
    c = c.localCheckpoint(eager=True)
    n = c.agg(F.count("*").cast("long").alias("n"))
    hist = logbin_hist(c)
    cum = hist.withColumn(
        "cb",
        F.coalesce(
            F.sum("cnt").over(
                Window.orderBy("lower").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    targets = (
        spark.createDataFrame(_QUANTILES, "num long, den long")
        .crossJoin(F.broadcast(n))
        .select(
            F.round(F.col("num") / F.col("den"), 2).alias("q"),
            F.expr("(num * n + den - 1) div den").alias("r"),
            "n",
        )
    )
    est = (
        cum.join(
            F.broadcast(targets),
            (F.col("cb") < F.col("r")) & (F.col("r") <= F.col("cb") + F.col("cnt")),
        )
        .select(
            "q",
            "n",
            "r",
            (
                F.col("lower")
                + F.expr("((r - cb) * width) div cnt")
            ).alias("est_cents"),
        )
    )
    ranked = c.withColumn("rk", F.row_number().over(Window.orderBy("c")))
    ex = ranked.join(
        F.broadcast(targets.select("q", "r")), F.col("rk") == F.col("r")
    ).select("q", F.col("c").alias("exact_cents"))
    n_buckets = hist.agg(F.count("*").cast("long").alias("n_buckets"))
    return (
        est.join(ex, "q")
        .crossJoin(F.broadcast(n_buckets))
        .select(
            "q",
            F.col("n").alias("n_rows"),
            "n_buckets",
            F.round(F.col("est_cents") / 100.0, 6).alias("est_price"),
            F.round(F.col("exact_cents") / 100.0, 6).alias("exact_price"),
            F.round(
                100.0
                * F.abs(F.col("est_cents") - F.col("exact_cents"))
                / F.col("exact_cents"),
                6,
            ).alias("err_pct"),
        )
        .orderBy("q")
    )


# --- KMV set difference ------------------------------------------------------


@register(
    "kmv_vocab_difference",
    oracle=f"""
    WITH sk AS ({_KMV_SKETCH_SQL}),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             list_sort(list_distinct(list_concat(a.kmin, b.kmin)))[1:{K}] AS m,
             a.kmin AS ka, b.kmin AS kb,
             a.n_exact AS na_exact
      FROM sk a JOIN sk b ON a.source < b.source
    ),
    est AS (
      SELECT source_a, source_b,
             CASE WHEN len(m) < {K} THEN CAST(len(m) AS BIGINT)
                  ELSE CAST(floor({(K - 1) * P}.0 / m[{K}]) AS BIGINT)
             END AS est_union,
             CAST(len(list_filter(list_intersect(m, ka),
                                  x -> NOT list_contains(kb, x))) AS BIGINT)
               AS k_only_a,
             CAST(len(m) AS BIGINT) AS k_union
      FROM pairs
    ),
    g AS ({_SOURCE_HASHES_SQL}),
    sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY source),
    common AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM g a JOIN g b ON a.h = b.h AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT e.source_a, e.source_b,
           CAST((e.est_union * e.k_only_a) // e.k_union AS BIGINT) AS est_only_a,
           CAST(sa.n - COALESCE(c.n_common, 0) AS BIGINT) AS exact_only_a,
           round(CAST(ABS((e.est_union * e.k_only_a) // e.k_union
                          - (sa.n - COALESCE(c.n_common, 0))) AS DOUBLE)
                 / GREATEST(sa.n - COALESCE(c.n_common, 0), 1), 6) AS rel_err
    FROM est e
    JOIN sizes sa ON sa.source = e.source_a
    LEFT JOIN common c ON c.source_a = e.source_a AND c.source_b = e.source_b
    ORDER BY e.source_a, e.source_b
    """,
    doc="Pairwise vocabulary set DIFFERENCE |A \\\\ B| estimated from KMV "
    "sketches alone, completing the sketch set-algebra trio (distinct = "
    "cardinality, jaccard = intersection, this = difference) — the "
    "sketch-scale analogue of the reference's key-set union/diff "
    "(app.js key set algebra, crawler2.key_set_algebra): the k smallest "
    "of A ∪ B are a uniform sample of the union, so |A\\\\B| ≈ "
    "est|A∪B| * (union-sample members in A but not B)/k, with the "
    "final product computed by integer floor division so the estimate "
    "is engine-exact. The exact leg (full hash anti-join) rides along "
    "as calibration and is what a 100 TB deployment drops: the "
    "estimator needs only the |sources| * k sketch table — the "
    "what-would-deduplicating-source-B-cost report priced at sketch "
    "scale.",
)
def q_kmv_vocab_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    hashed = _source_token_hashes(spark, sf_dir).localCheckpoint(eager=True)
    return kmv_difference_report(hashed)


def kmv_difference_report(hashed: DataFrame) -> DataFrame:
    r"""The pairwise |A \ B| sketch estimate + exact calibration over any
    (source, h) distinct-pair frame — factored out so tests can drive
    the m[K] estimator branch with a universe larger than K (the test
    corpus' per-source vocabularies are smaller than K, which makes the
    sketch exact and the estimator path vacuous there)."""
    sk = kmv_sketches(hashed)
    a = sk.select(F.col("source").alias("source_a"), F.col("kmin").alias("ka"))
    b = sk.select(F.col("source").alias("source_b"), F.col("kmin").alias("kb"))
    merged = F.slice(F.array_sort(F.array_union("ka", "kb")), 1, K)
    est = (
        a.join(F.broadcast(b), F.col("source_a") < F.col("source_b"))
        .withColumn("m", merged)
        .select(
            "source_a",
            "source_b",
            F.when(F.size("m") < K, F.size("m").cast("long"))
            .otherwise(
                F.floor(F.lit(float((K - 1) * P)) / F.element_at("m", K)).cast(
                    "long"
                )
            )
            .alias("est_union"),
            F.size(
                F.array_except(F.array_intersect("m", "ka"), "kb")
            ).cast("long").alias("k_only_a"),
            F.size("m").cast("long").alias("k_union"),
        )
    )
    sizes = hashed.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    ga = hashed.select(F.col("source").alias("source_a"), "h")
    gb = hashed.select(F.col("source").alias("source_b"), "h")
    common = (
        ga.join(gb, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    est_only = F.expr("(est_union * k_only_a) div k_union")
    exact_only = F.col("na") - F.coalesce("n_common", F.lit(0))
    return (
        est.join(
            F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("n").alias("na"))),
            "source_a",
        )
        .join(common, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            est_only.cast("long").alias("est_only_a"),
            exact_only.cast("long").alias("exact_only_a"),
            F.round(
                F.abs(est_only - exact_only).cast("double")
                / F.greatest(exact_only, F.lit(1)),
                6,
            ).alias("rel_err"),
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# HyperLogLog register sketch (Flajolet et al. 2007, "HyperLogLog: the
# analysis of a near-optimal cardinality estimation algorithm", AofA'07)
# ---------------------------------------------------------------------------
#
# The third cardinality structure, completing the trio the module
# docstring lays out: approx_count_distinct is Spark's OPAQUE HLL++ (you
# cannot checkpoint, fold, or introspect its registers), KMV is the
# intersectable sketch, and THIS is the classic register-file HLL with
# the state held as ordinary rows — (key, register, max_rho) — so the
# lattice is visible to the engine: per-register MAX is idempotent,
# associative, and commutative, which makes the sketch re-delivery-proof
# in a streaming sink and foldable across rollup grains (day → week
# below) without ever touching the raw stream again.
#
# Arithmetic is cross-engine-exact by construction:
#   - hash: the module's rolling/multiplicative hashes (pure int64, < P)
#   - register index = h & (m-1); rho window w = h >> p  (w < 2^22
#     because h < P = 1e9+7, so w < P/256 < 2^22)
#   - rho = 23 - length(bin(w)) for w > 0, else 23 — length(bin(x)) is
#     floor(log2 x) + 1 in BOTH engines (minimal-width binary strings)
#   - the harmonic-mean denominator SUM(2^-rho_j) is kept as the SCALED
#     INTEGER SUM(1 << (23 - rho_j)) + empties * 2^23 — exact BIGINT,
#     max 256 * 2^23 ≈ 2.1e9, no float accumulation order anywhere
#   - the only float op is the final alpha*m^2*2^23 / sum division,
#     one correctly-rounded IEEE op from one shared literal
HLL_P_BITS = 8
HLL_M = 1 << HLL_P_BITS  # 256 registers: ~6.5% rse — the QA-grade preset
HLL_RHO_CAP = 23  # 22-bit rho window + 1
HLL_SCALE = 1 << HLL_RHO_CAP
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)  # alpha_m, m >= 128 regime
_HLL_NUM = HLL_ALPHA * float(HLL_M * HLL_M * HLL_SCALE)  # alpha * m^2 * 2^23
HLL_SHINGLE = 8  # char-8-gram shingles: ~4k distinct per source at sf0.01


def hll_registers(pairs: DataFrame, key: str = "source") -> DataFrame:
    """(key, reg, mrho): the HLL register file as rows.

    ONE aggregation with a map-side-combining MAX — at 100 TB the
    shuffle carries at most keys * m rows per map partition no matter
    how many billions of values stream through, and duplicates cost
    nothing (max is idempotent), so unlike every exact-distinct plan
    there is NO distinct shuffle anywhere.
    """
    w = F.shiftright("h", HLL_P_BITS)
    return (
        pairs.select(
            key,
            F.col("h").bitwiseAND(HLL_M - 1).alias("reg"),
            F.when(w == 0, F.lit(HLL_RHO_CAP))
            .otherwise(F.lit(HLL_RHO_CAP) - F.length(F.bin(w)))
            .cast("bigint")
            .alias("rho"),
        )
        .groupBy(key, "reg")
        .agg(F.max("rho").alias("mrho"))
    )


def hll_estimate_cols(key: str) -> list:
    """The shared estimator tail over a (key, v_hit, sum_hit) frame."""
    sum_scaled = (
        F.col("sum_hit") + (F.lit(HLL_M) - F.col("v_hit")) * F.lit(HLL_SCALE)
    ).cast("bigint")
    return [
        F.col(key),
        F.lit(HLL_M).cast("bigint").alias("m"),
        (F.lit(HLL_M) - F.col("v_hit")).cast("bigint").alias("v_empty"),
        sum_scaled.alias("sum_scaled"),
        F.round(F.lit(_HLL_NUM) / sum_scaled, 6).alias("hll_estimate"),
    ]


def _hll_fold(regs: DataFrame, key: str) -> DataFrame:
    return regs.groupBy(key).agg(
        F.count("*").alias("v_hit"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_CAP} - CAST(mrho AS INT))")
        ).alias("sum_hit"),
    )


# DuckDB fragments mirroring the same arithmetic
def _hll_regs_sql(pairs_sql: str, key: str) -> str:
    return f"""
  SELECT {key}, h & {HLL_M - 1} AS reg,
         MAX(CASE WHEN (h >> {HLL_P_BITS}) = 0 THEN {HLL_RHO_CAP}
              ELSE {HLL_RHO_CAP} - length(ltrim(bin(h >> {HLL_P_BITS}), '0'))
         END) AS mrho
  FROM ({pairs_sql}) GROUP BY {key}, reg
"""


def _hll_fold_sql(regs_sql: str, key: str) -> str:
    return f"""
  SELECT {key}, CAST({HLL_M} AS BIGINT) AS m,
         CAST({HLL_M} - COUNT(*) AS BIGINT) AS v_empty,
         CAST(SUM(CAST(1 AS BIGINT) << ({HLL_RHO_CAP} - CAST(mrho AS INT)))
              + ({HLL_M} - COUNT(*)) * {HLL_SCALE} AS BIGINT) AS sum_scaled
  FROM ({regs_sql}) GROUP BY {key}
"""


_HLL_SHINGLE_PAIRS_SQL = f"""
  SELECT source, {{hash}} AS h FROM (
    SELECT source, substring(text, CAST(i AS INTEGER), {HLL_SHINGLE}) AS t
    FROM documents, UNNEST(range(1, length(text) - {HLL_SHINGLE - 2})) r(i)
  )
""".format(hash=_TOKEN_HASH_SQL)


@register(
    "hll_register_sketch",
    oracle=f"""
    WITH regs AS ({_hll_regs_sql(_HLL_SHINGLE_PAIRS_SQL, "source")}),
    folded AS ({_hll_fold_sql("SELECT * FROM regs", "source")}),
    ex AS (
      SELECT source, CAST(COUNT(DISTINCT h) AS BIGINT) AS n_exact
      FROM ({_HLL_SHINGLE_PAIRS_SQL}) GROUP BY source
    )
    SELECT f.source, f.m, f.v_empty, f.sum_scaled,
           round({_HLL_NUM!r} / f.sum_scaled, 6) AS hll_estimate,
           e.n_exact,
           round(100.0 * abs({_HLL_NUM!r} / f.sum_scaled - e.n_exact)
                 / e.n_exact, 6) AS err_pct
    FROM folded f JOIN ex e ON e.source = f.source
    ORDER BY f.source
    """,
    doc=f"Per-source distinct char-{HLL_SHINGLE}-gram cardinality from a "
    f"classic {HLL_M}-register HyperLogLog (Flajolet et al. 2007) held "
    "as ROWS — the introspectable/foldable sibling of Spark's opaque "
    "approx_count_distinct and the union-only complement of the KMV "
    "trio. Register max is one map-side-combining aggregation (shuffle "
    f"<= sources x {HLL_M} rows per map partition at ANY corpus scale, "
    "duplicates free, NO distinct shuffle); the harmonic denominator is "
    "the exact scaled-integer SUM(1 << (23 - rho)) so the only float in "
    "the sketch is the final alpha*m^2/sum division. Exact distinct "
    "rides along as the QA calibration column (the one leg you drop at "
    "100 TB). rho = leading-zero rank via length(bin(w)) — identical "
    "minimal-width binary semantics in both engines.",
)
def q_hll_register_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import char_ngrams

    docs = fan_out(load_table(spark, "documents", sf_dir), "doc_id")
    pairs = docs.select(
        "source", F.explode(char_ngrams(F.col("text"), HLL_SHINGLE)).alias("t")
    ).select("source", rolling_hash("t").alias("h"))
    folded = _hll_fold(hll_registers(pairs), "source")
    exact = pairs.groupBy("source").agg(
        F.countDistinct("h").cast("bigint").alias("n_exact")
    )
    est_raw = F.lit(_HLL_NUM) / F.col("sum_scaled")
    return (
        folded.select(*hll_estimate_cols("source"))
        .join(F.broadcast(exact), "source")
        .select(
            "source",
            "m",
            "v_empty",
            "sum_scaled",
            "hll_estimate",
            "n_exact",
            F.round(
                F.lit(100.0) * F.abs(est_raw - F.col("n_exact")) / F.col("n_exact"), 6
            ).alias("err_pct"),
        )
        .orderBy("source")
    )


_HLL_DAU_PAIRS_SQL = f"""
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
         (user_id * {_ID_HASH_A} + {_ID_HASH_B}) % {P} AS h
  FROM events
"""


@register(
    "hll_weekly_from_daily",
    oracle=f"""
    WITH regs AS ({_hll_regs_sql(_HLL_DAU_PAIRS_SQL, "week")}),
    folded AS ({_hll_fold_sql("SELECT * FROM regs", "week")}),
    ex AS (
      SELECT week, CAST(COUNT(DISTINCT h) AS BIGINT) AS n_exact
      FROM ({_HLL_DAU_PAIRS_SQL}) GROUP BY week
    )
    SELECT f.week, f.m, f.v_empty, f.sum_scaled,
           round({_HLL_NUM!r} / f.sum_scaled, 6) AS est_wau,
           e.n_exact,
           round(100.0 * abs({_HLL_NUM!r} / f.sum_scaled - e.n_exact)
                 / e.n_exact, 6) AS err_pct
    FROM folded f JOIN ex e ON e.week = f.week
    ORDER BY f.week
    """,
    doc="Weekly active users obtained by FOLDING the per-day HLL "
    "register files (per-register MAX over each week's daily partials) "
    "— the HLL twin of kmv_weekly_from_daily's merge-identity proof. "
    "The oracle builds the weekly registers DIRECTLY from the events, "
    "so value parity is an end-to-end proof on real data that the "
    "register lattice folds exactly: max-merge of daily register files "
    "== registers of the union. This is the property that makes HLL "
    "state checkpointable in a streaming sink (re-delivered batches "
    "are absorbed idempotently) and rollup-able day -> week -> month "
    "at O(m) per grain, never re-reading the stream.",
)
def q_hll_weekly_from_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    pairs = e.select(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("week", "ts").alias("week"),
        ((F.col("user_id") * _ID_HASH_A + _ID_HASH_B) % P).alias("h"),
    ).localCheckpoint(eager=True)
    daily = hll_registers(pairs.select(F.col("day").alias("key"), "h"), "key")
    weekly_regs = (
        daily.join(
            F.broadcast(
                pairs.select(F.col("day").alias("key"), "week").distinct()
            ),
            "key",
        )
        .groupBy("week", "reg")
        .agg(F.max("mrho").alias("mrho"))  # the lattice fold under test
    )
    folded = _hll_fold(weekly_regs, "week")
    exact = pairs.groupBy("week").agg(
        F.countDistinct("h").cast("bigint").alias("n_exact")
    )
    est_raw = F.lit(_HLL_NUM) / F.col("sum_scaled")
    return (
        folded.select(*hll_estimate_cols("week"))
        .join(F.broadcast(exact), "week")
        .select(
            "week",
            "m",
            "v_empty",
            "sum_scaled",
            F.col("hll_estimate").alias("est_wau"),
            "n_exact",
            F.round(
                F.lit(100.0) * F.abs(est_raw - F.col("n_exact")) / F.col("n_exact"), 6
            ).alias("err_pct"),
        )
        .orderBy("week")
    )


@register(
    "hll_union_inclusion_exclusion",
    oracle=f"""
    WITH regs AS ({_hll_regs_sql(_HLL_SHINGLE_PAIRS_SQL, "source")}),
    per AS ({_hll_fold_sql("SELECT * FROM regs", "source")}),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b, a.reg,
             greatest(a.mrho, b.mrho) AS mrho
      FROM regs a JOIN regs b ON a.reg = b.reg AND a.source < b.source
    ),
    uni AS (
      SELECT source_a, source_b,
             CAST(SUM(CAST(1 AS BIGINT) << ({HLL_RHO_CAP} - CAST(mrho AS INT)))
                  + ({HLL_M} - COUNT(*)) * {HLL_SCALE} AS BIGINT) AS sum_u
      FROM pairs GROUP BY source_a, source_b
    ),
    ex AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS n_exact_common
      FROM (SELECT DISTINCT source, h FROM ({_HLL_SHINGLE_PAIRS_SQL})) a
      JOIN (SELECT DISTINCT source, h FROM ({_HLL_SHINGLE_PAIRS_SQL})) b
        ON a.h = b.h AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT u.source_a, u.source_b,
           round({_HLL_NUM!r} / pa.sum_scaled, 6) AS est_a,
           round({_HLL_NUM!r} / pb.sum_scaled, 6) AS est_b,
           round({_HLL_NUM!r} / u.sum_u, 6) AS est_union,
           round(({_HLL_NUM!r} / pa.sum_scaled + {_HLL_NUM!r} / pb.sum_scaled)
                 - {_HLL_NUM!r} / u.sum_u, 6) AS est_common_ie,
           COALESCE(e.n_exact_common, 0) AS n_exact_common,
           round(abs((({_HLL_NUM!r} / pa.sum_scaled + {_HLL_NUM!r} / pb.sum_scaled)
                 - {_HLL_NUM!r} / u.sum_u) - COALESCE(e.n_exact_common, 0)), 6) AS abs_err
    FROM uni u
    JOIN per pa ON pa.source = u.source_a
    JOIN per pb ON pb.source = u.source_b
    LEFT JOIN ex e ON e.source_a = u.source_a AND e.source_b = u.source_b
    ORDER BY u.source_a, u.source_b
    """,
    doc="Pairwise UNION cardinality from HLL register max-folds plus the "
    "classic inclusion-exclusion intersection workaround, QA'd against "
    "the exact intersection — the measured counterpart of the module's "
    "design claim that KMV is the sketch to keep when intersections "
    "matter (I-E inherits ~union-scale absolute error, so small "
    "overlaps drown; kmv_vocab_jaccard estimates them directly). The "
    "union fold itself is the HLL selling point: register-wise max of "
    "the per-source files, O(|sources|^2 x m) integers, no data "
    "rescan — at 100 TB the pairwise union matrix costs nothing beyond "
    "the per-source sketches a deployment already maintains (the exact "
    "leg is the one you drop). All integer arithmetic except three "
    "shared-literal IEEE divisions per pair.",
)
def q_hll_union_inclusion_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import char_ngrams

    docs = fan_out(load_table(spark, "documents", sf_dir), "doc_id")
    pairs = docs.select(
        "source", F.explode(char_ngrams(F.col("text"), HLL_SHINGLE)).alias("t")
    ).select("source", rolling_hash("t").alias("h"))
    regs = hll_registers(pairs).localCheckpoint(eager=True)
    per = _hll_fold(regs, "source").select(
        "source",
        (
            F.col("sum_hit") + (F.lit(HLL_M) - F.col("v_hit")) * F.lit(HLL_SCALE)
        ).cast("bigint").alias("sum_scaled"),
    )
    a = regs.select(F.col("source").alias("source_a"), "reg", F.col("mrho").alias("ma"))
    b = regs.select(F.col("source").alias("source_b"), "reg", F.col("mrho").alias("mb"))
    uni = (
        a.join(b, ["reg"])
        .filter(F.col("source_a") < F.col("source_b"))
        .select("source_a", "source_b", "reg", F.greatest("ma", "mb").alias("mrho"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").alias("v_hit"),
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_CAP} - CAST(mrho AS INT))"
                )
            ).alias("sum_hit"),
        )
        .select(
            "source_a",
            "source_b",
            (
                F.col("sum_hit") + (F.lit(HLL_M) - F.col("v_hit")) * F.lit(HLL_SCALE)
            ).cast("bigint").alias("sum_u"),
        )
    )
    hashed = pairs.distinct().localCheckpoint(eager=True)
    exact = (
        hashed.select(F.col("source").alias("source_a"), "h")
        .join(hashed.select(F.col("source").alias("source_b"), "h"), "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("n_exact_common"))
    )
    est_a = F.lit(_HLL_NUM) / F.col("sum_a")
    est_b = F.lit(_HLL_NUM) / F.col("sum_b")
    est_u = F.lit(_HLL_NUM) / F.col("sum_u")
    ie = (est_a + est_b) - est_u
    return (
        uni.join(
            F.broadcast(per.select(F.col("source").alias("source_a"), F.col("sum_scaled").alias("sum_a"))),
            "source_a",
        )
        .join(
            F.broadcast(per.select(F.col("source").alias("source_b"), F.col("sum_scaled").alias("sum_b"))),
            "source_b",
        )
        .join(exact, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.round(est_a, 6).alias("est_a"),
            F.round(est_b, 6).alias("est_b"),
            F.round(est_u, 6).alias("est_union"),
            F.round(ie, 6).alias("est_common_ie"),
            F.coalesce("n_exact_common", F.lit(0).cast("bigint")).alias("n_exact_common"),
            F.round(
                F.abs(ie - F.coalesce("n_exact_common", F.lit(0).cast("bigint"))), 6
            ).alias("abs_err"),
        )
        .orderBy("source_a", "source_b")
    )


# --- HLL precision sweep ------------------------------------------------------

# Memory-vs-error tuner for the register sketch. The key identity: with
# index = h & (m-1) (low bits) and rho always computed over h >> 8 (the
# bits ABOVE the largest m), every smaller power-of-two register file is
# a FOLD of the 256-register file — reg' = reg & (m'-1), mrho' = max —
# so the whole sweep derives from the one sketch already built, no
# corpus rescan per candidate m. (For m < 256 the unused index bits sit
# between index and rho window; they cost nothing — rho's geometric law
# is unchanged, only alpha_m varies.) alpha constants are the published
# Flajolet et al. 2007 values, shared with DuckDB as repr literals.
HLL_SWEEP_MS = [32, 64, 128, 256]
_HLL_ALPHAS = {
    16: 0.673,
    32: 0.697,
    64: 0.709,
}
_HLL_NUMS = {
    m: (_HLL_ALPHAS.get(m, 0.7213 / (1.0 + 1.079 / m)) * float(m * m * HLL_SCALE))
    for m in HLL_SWEEP_MS
}


def _hll_sweep_oracle() -> str:
    num_case = " ".join(
        f"WHEN {m} THEN {_HLL_NUMS[m]!r}" for m in HLL_SWEEP_MS
    )
    return f"""
    WITH regs AS ({_hll_regs_sql(_HLL_SHINGLE_PAIRS_SQL, "source")}),
    sweep AS (SELECT unnest(ARRAY{HLL_SWEEP_MS}) AS m),
    fold AS (
      SELECT r.source, s.m, r.reg & (s.m - 1) AS reg2, MAX(r.mrho) AS mrho
      FROM regs r CROSS JOIN sweep s
      GROUP BY r.source, s.m, r.reg & (s.m - 1)
    ),
    agg AS (
      SELECT source, m,
             CAST(m - COUNT(*) AS BIGINT) AS v_empty,
             CAST(SUM(CAST(1 AS BIGINT) << ({HLL_RHO_CAP} - CAST(mrho AS INT)))
                  + (m - COUNT(*)) * {HLL_SCALE} AS BIGINT) AS sum_scaled
      FROM fold GROUP BY source, m
    ),
    ex AS (
      SELECT source, CAST(COUNT(DISTINCT h) AS BIGINT) AS n_exact
      FROM ({_HLL_SHINGLE_PAIRS_SQL}) GROUP BY source
    )
    SELECT a.source, CAST(a.m AS BIGINT) AS m, a.v_empty, a.sum_scaled,
           round((CASE a.m {num_case} END) / a.sum_scaled, 6) AS hll_estimate,
           e.n_exact,
           round(100.0 * abs((CASE a.m {num_case} END) / a.sum_scaled - e.n_exact)
                 / e.n_exact, 6) AS err_pct
    FROM agg a JOIN ex e ON e.source = a.source
    ORDER BY a.source, m
    """


@register(
    "hll_precision_sweep",
    oracle=_hll_sweep_oracle(),
    doc="Register-count tuner (the sketch-budget sweep, completing the "
    "tuner set alongside cms_width_calibration): per-source HLL "
    "estimate and realized error at every candidate register count, "
    "ALL derived from the one 256-register sketch by the fold identity "
    "reg' = reg & (m'-1), mrho' = max — no corpus rescan per "
    "candidate; the sweep costs one |sources x 256 x |sweep||-row "
    "aggregation over the register file. rho is computed over h >> 8 "
    "(bits above the largest m) for every m, which is what makes the "
    "fold exact; only alpha_m varies (published Flajolet constants, "
    "shared repr literals). Exact distinct rides along as the QA "
    "column. This is the table a team reads to pick register memory "
    "per key before deploying the streaming HLL lattice.",
)
def q_hll_precision_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import char_ngrams

    docs = fan_out(load_table(spark, "documents", sf_dir), "doc_id")
    pairs = docs.select(
        "source", F.explode(char_ngrams(F.col("text"), HLL_SHINGLE)).alias("t")
    ).select("source", rolling_hash("t").alias("h"))
    regs = hll_registers(pairs, "source")
    sweep = F.explode(F.array(*[F.lit(m) for m in HLL_SWEEP_MS])).alias("m")
    fold = (
        regs.select("source", "reg", "mrho", sweep)
        .groupBy("source", "m", F.col("reg").bitwiseAND(F.col("m") - 1).alias("reg2"))
        .agg(F.max("mrho").alias("mrho"))
    )
    agg = fold.groupBy("source", "m").agg(
        (F.col("m") - F.count("*")).cast("bigint").alias("v_empty"),
        (
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_CAP} - CAST(mrho AS INT))"
                )
            )
            + (F.first("m") - F.count("*")) * HLL_SCALE
        )
        .cast("bigint")
        .alias("sum_scaled"),
    )
    exact = pairs.groupBy("source").agg(
        F.countDistinct("h").cast("bigint").alias("n_exact")
    )
    num = F.when(F.col("m") == HLL_SWEEP_MS[0], F.lit(_HLL_NUMS[HLL_SWEEP_MS[0]]))
    for m in HLL_SWEEP_MS[1:]:
        num = num.when(F.col("m") == m, F.lit(_HLL_NUMS[m]))
    est_raw = num / F.col("sum_scaled")
    return (
        agg.join(F.broadcast(exact), "source")
        .select(
            "source",
            F.col("m").cast("bigint").alias("m"),
            "v_empty",
            "sum_scaled",
            F.round(est_raw, 6).alias("hll_estimate"),
            "n_exact",
            F.round(
                F.lit(100.0) * F.abs(est_raw - F.col("n_exact")) / F.col("n_exact"), 6
            ).alias("err_pct"),
        )
        .orderBy("source", "m")
    )


# --- KMV k sweep ----------------------------------------------------------------

# The third sketch-budget tuner (CMS width, HLL registers, now KMV k),
# riding the same exactness trick as hll_precision_sweep: a k-min list
# is PREFIX-CLOSED — the first k' entries of the k=64 sketch ARE the
# k'-min sketch — so every candidate budget reads off the one sketch
# already built, no corpus rescan. Numerators (k'-1)*P are shared
# per-budget literals so the one float division mirrors
# kmv_vocab_distinct's formula exactly at every budget.
KMV_SWEEP_KS = [8, 16, 32, 64]


def _kmv_sweep_oracle() -> str:
    num_case = " ".join(
        f"WHEN {k} THEN {float((k - 1) * P)!r}" for k in KMV_SWEEP_KS
    )
    shingle_pairs = f"SELECT DISTINCT source, h FROM ({_HLL_SHINGLE_PAIRS_SQL})"
    return f"""
    WITH sk AS ({kmv_sketch_sql(shingle_pairs, "source")}),
    sweep AS (SELECT unnest(ARRAY{KMV_SWEEP_KS}) AS k)
    SELECT source, CAST(s.k AS BIGINT) AS k,
           kmin[LEAST(CAST(s.k AS INT), CAST(n_exact AS INT))] AS kth_min,
           CASE WHEN n_exact < s.k THEN n_exact
                ELSE CAST(floor((CASE s.k {num_case} END)
                                / kmin[CAST(s.k AS INT)]) AS BIGINT)
           END AS est_distinct,
           n_exact,
           round(100.0 * abs(
             (CASE WHEN n_exact < s.k THEN n_exact
                   ELSE CAST(floor((CASE s.k {num_case} END)
                                   / kmin[CAST(s.k AS INT)]) AS BIGINT) END)
             - n_exact) / n_exact, 6) AS err_pct
    FROM sk, sweep s ORDER BY source, k
    """


@register(
    "kmv_k_sweep",
    oracle=_kmv_sweep_oracle(),
    doc="KMV budget tuner, completing the sketch-budget trio (CMS width "
    "/ HLL registers / KMV k): per-source estimate and realized error "
    "at every candidate k, ALL read off the one k=64 sketch by prefix "
    "closure (the first k' minima ARE the k'-min sketch — no corpus "
    "rescan per budget). Each budget applies kmv_vocab_distinct's "
    "exact formula with its own shared (k-1)*P literal; the exact "
    "count rides along as the QA column. The table a team reads to "
    "size per-key sketch memory before deploying the streaming KMV "
    "lattice. The universe is the char-8-gram shingle space (the "
    "hll_precision_sweep universe, ~4k distinct per source — the "
    "31-word fixture vocabulary is smaller than every candidate k, "
    "which would leave the estimator untested), so the two sweeps "
    "read memory-vs-error across sketch families on the SAME keys.",
)
def q_kmv_k_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import char_ngrams

    docs = fan_out(load_table(spark, "documents", sf_dir), "doc_id")
    pairs = (
        docs.select(
            "source", F.explode(char_ngrams(F.col("text"), HLL_SHINGLE)).alias("t")
        )
        .select("source", rolling_hash("t").alias("h"))
        .distinct()
    )
    kmin = kmv_kmin(pairs, K, "source")
    exact = pairs.groupBy("source").agg(
        F.countDistinct("h").cast("bigint").alias("n_exact")
    )
    sk = kmin.join(exact, "source")
    s = sk.select(
        "source",
        "kmin",
        "n_exact",
        F.explode(F.array(*[F.lit(k) for k in KMV_SWEEP_KS])).alias("k"),
    )
    num = F.when(F.col("k") == KMV_SWEEP_KS[0], F.lit(float((KMV_SWEEP_KS[0] - 1) * P)))
    for k in KMV_SWEEP_KS[1:]:
        num = num.when(F.col("k") == k, F.lit(float((k - 1) * P)))
    kth = F.element_at(
        "kmin", F.least(F.col("k").cast("int"), F.col("n_exact").cast("int"))
    )
    est = F.when(F.col("n_exact") < F.col("k"), F.col("n_exact")).otherwise(
        F.floor(num / F.element_at("kmin", F.col("k").cast("int"))).cast("long")
    )
    return s.select(
        "source",
        F.col("k").cast("long").alias("k"),
        kth.alias("kth_min"),
        est.alias("est_distinct"),
        "n_exact",
        F.round(100.0 * F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6).alias(
            "err_pct"
        ),
    ).orderBy("source", "k")
