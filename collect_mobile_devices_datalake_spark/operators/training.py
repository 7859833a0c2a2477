"""Training-data curation operators (north-star extensions, BASELINE.json).

Four ops every LLM-scale data pipeline runs between the lake and the
trainer, each with a value-level DuckDB oracle:

- deterministic train/val/test split (multiplicative hash → buckets);
- per-vector int8 embedding quantization (zero-point + scale);
- PII redaction (email/phone regex scrub);
- cross-split contamination check (train↔test shingle overlap).

Determinism notes: the split hash is pure BIGINT arithmetic (no engine
hash functions — Spark's xxhash64 and DuckDB's hash() disagree, a
Knuth-style multiplicative hash is bit-identical everywhere and is what
you'd ship anyway so the split survives engine migrations). Quantization
does all arithmetic in DOUBLE with identical op order in both engines;
``floor`` avoids the round-half tie rules that differ cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import fan_out, load_table
from .dedup import _SHINGLES_SQL, shingled_docs

# Knuth multiplicative hash constant (2654435761 = 2^32 * golden ratio);
# dockey * K mod 2^32 scatters sequential ids uniformly, then % 100 buckets.
#
# Overflow-safe form: doc_id * K overflows int64 for doc_id > ~3.47e9 (Spark
# wraps silently, DuckDB raises). Reduce doc_id mod 2^32 first, then split K
# into 16-bit halves (K = K_HI * 2^16 + K_LO) so every intermediate stays
# below ~1.8e14: (r*K) mod 2^32 == ((r*K_LO) mod 2^32 + ((r*K_HI) mod 2^16)
# * 2^16) mod 2^32. Bit-identical to the naive formula wherever that one
# doesn't overflow, and exact everywhere — so the split survives both engine
# migration AND 100 TB-scale 64-bit doc ids.
_K = 2654435761
_M = 4294967296
_K_HI = _K // 65536  # 40503
_K_LO = _K % 65536  # 31153


def split_hash_sql(key: str) -> str:
    """ANSI-SQL twin of :func:`split_hash` for any integer key column."""
    return (
        f"(((({key} % {_M}) * {_K_LO}) % {_M}"
        f" + ((({key} % {_M}) * {_K_HI}) % 65536) * 65536) % {_M})"
    )


_SPLIT_HASH_SQL = split_hash_sql("doc_id")
_SPLIT_BUCKET_SQL = f"{_SPLIT_HASH_SQL} % 100"


def split_hash(doc_id: F.Column | str) -> F.Column:
    """(doc_id * K) mod 2^32 without int64 overflow — see module constants."""
    col = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    r = F.pmod(col, F.lit(_M))
    return F.pmod((r * _K_LO) % _M + F.pmod(r * _K_HI, F.lit(65536)) * 65536, F.lit(_M))
_SPLIT_SQL = (
    f"CASE WHEN {_SPLIT_BUCKET_SQL} < 80 THEN 'train' "
    f"WHEN {_SPLIT_BUCKET_SQL} < 90 THEN 'val' ELSE 'test' END"
)


def split_bucket(doc_id: F.Column | str) -> F.Column:
    return split_hash(doc_id) % 100


@register(
    "train_split_assign",
    oracle=f"""
    SELECT doc_id, {_SPLIT_BUCKET_SQL} AS bucket, {_SPLIT_SQL} AS split
    FROM documents
    """,
    doc="Deterministic 80/10/10 train/val/test assignment via multiplicative "
    "hash of the doc key. Pure projection — no shuffle, no state; the "
    "same row lands in the same split on any engine, any partitioning, "
    "any day (the property reservoir/random splits lack).",
)
def q_train_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    b = split_bucket("doc_id")
    return d.select(
        "doc_id",
        b.alias("bucket"),
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split"),
    )


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    mm AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM e)
    SELECT vec_id,
           mn AS zero_point,
           (mx - mn) / 255 AS scale,
           array_to_string(
             CASE WHEN mx = mn THEN list_transform(v, x -> 0)
                  ELSE list_transform(v, x -> CAST(floor((x - mn) * 255 / (mx - mn)) AS INTEGER))
             END, ' ') AS q
    FROM mm
    """,
    doc="Per-vector asymmetric int8 quantization: zero_point = min, scale = "
    "range/255, element -> floor((x - min) * 255 / range). Map-only over "
    "the vector column (no shuffle); floor not round so no cross-engine "
    "tie-breaking. The min/max are projected ONCE before the per-element "
    "lambda — inlining them re-scans the vector per element (O(d²)).",
)
def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = fan_out(load_table(spark, "embeddings", sf_dir), "vec_id")
    v = F.transform("embedding", lambda x: x.cast("double"))
    # barrier: materialize v/mn/mx so CollapseProject cannot inline the
    # array_min/array_max back into the quantize lambda (HOF O(d²) trap)
    mm = e.select(
        "vec_id", v.alias("v"), F.array_min(v).alias("mn"), F.array_max(v).alias("mx")
    ).localCheckpoint(eager=True)
    mn, mx = F.col("mn"), F.col("mx")
    quant = F.transform(
        "v", lambda x: F.floor((x - mn) * 255 / (mx - mn)).cast("int")
    )
    qarr = F.when(mx == mn, F.transform("v", lambda x: F.lit(0))).otherwise(quant)
    return mm.select(
        "vec_id",
        mn.alias("zero_point"),
        ((mx - mn) / 255).alias("scale"),
        # Stringified: the driver's pandas canonicalizer cannot hash list cells.
        F.array_join(F.transform(qarr, lambda x: x.cast("string")), " ").alias("q"),
    )


# planted PII: deterministic email + phone appended to each document, so
# the scrubber has known targets and the oracle can build identical rows.
_PLANTED_SQL = (
    "text || ' contact user_' || CAST(doc_id AS VARCHAR) || '@mail.example.com"
    " or call 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR)"
)


@register(
    "doc_pii_redact",
    oracle=f"""
    WITH planted AS (SELECT doc_id, {_PLANTED_SQL} AS body FROM documents)
    SELECT doc_id,
           regexp_replace(
             regexp_replace(body, '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
             '[0-9]{{3}}-[0-9]{{4}}', '<PHONE>', 'g') AS redacted,
           contains(regexp_replace(
             regexp_replace(body, '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
             '[0-9]{{3}}-[0-9]{{4}}', '<PHONE>', 'g'), '@') AS residual_at
    FROM planted
    """,
    doc="PII scrub: email then phone regex rewritten to placeholder tokens, "
    "plus a residual check column (any '@' left after the pass). Regex "
    "subset chosen to behave identically under Java regex and RE2. "
    "Map-only — runs at scan speed, no shuffle.",
)
def q_doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    body = F.concat(
        F.col("text"),
        F.lit(" contact user_"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or call 555-"),
        (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(body, r"[A-Za-z0-9._]+@[A-Za-z0-9.]+", "<EMAIL>"),
        r"[0-9]{3}-[0-9]{4}",
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        redacted.alias("redacted"),
        redacted.contains("@").alias("residual_at"),
    )


@register(
    "split_contamination",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, {_SPLIT_BUCKET_SQL} AS b, unnest({_SHINGLES_SQL}) AS shingle
      FROM documents
    )
    SELECT tr.doc_id AS train_doc, te.doc_id AS test_doc, COUNT(*) AS n_shared
    FROM (SELECT doc_id, shingle FROM g WHERE b < 80) tr
    JOIN (SELECT doc_id, shingle FROM g WHERE b >= 90) te ON tr.shingle = te.shingle
    GROUP BY tr.doc_id, te.doc_id
    HAVING COUNT(*) >= 3
    """,
    doc="Train/test decontamination: distinct 3-gram shingles shared between "
    "a train doc and a test doc (≥3 ⇒ flagged pair). The split needs no "
    "join — the bucket is recomputed from doc_id arithmetic on the "
    "exploded index; the overlap join shuffles 8-byte shingle hashes, "
    "not n-gram text (same discipline as dedup_ngram_jaccard).",
)
def q_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    g = (
        shingled_docs(d)
        .select("doc_id", F.explode(F.transform("sh", lambda s: F.xxhash64(s))).alias("shingle_h"))
        .withColumn("b", split_bucket("doc_id"))
        .localCheckpoint(eager=True)  # feeds both sides of the self-join
    )
    tr = g.filter(F.col("b") < 80).select(F.col("doc_id").alias("train_doc"), "shingle_h")
    te = g.filter(F.col("b") >= 90).select(F.col("doc_id").alias("test_doc"), "shingle_h")
    return (
        tr.join(te, "shingle_h")
        .groupBy("train_doc", "test_doc")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
    )


@register(
    "test_set_novelty",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, {_SPLIT_BUCKET_SQL} AS b, unnest({_SHINGLES_SQL}) AS shingle
      FROM documents
    ),
    tr AS (SELECT DISTINCT shingle FROM g WHERE b < 80),
    te AS (SELECT DISTINCT doc_id, shingle FROM g WHERE b >= 90)
    SELECT te.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_seen_in_train,
           round(1 - SUM(CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS novelty_ratio
    FROM te LEFT JOIN tr ON tr.shingle = te.shingle
    GROUP BY te.doc_id
    """,
    doc="Per-document n-gram novelty of the TEST split against the train "
    "split: for each test doc, the fraction of its distinct 3-gram "
    "shingles never seen anywhere in train — the memorization/leakage "
    "audit an eval pipeline runs before trusting held-out metrics "
    "(novelty ~0 means the benchmark leaked; split_contamination names "
    "the offending PAIRS, this scores every test doc even when no "
    "single train doc crosses the pair threshold). EXACT twin of the "
    "decontam_bloom_report path: the bloom variant is the 100 TB "
    "default (train shingle set as O(1) bits), this one is the "
    "ground-truth join run on samples to MEASURE the bloom's false-hit "
    "rate. Shuffle discipline: the join moves 8-byte xxhash64 shingle "
    "keys, never n-gram text; both sides prune to distinct keys before "
    "the join (map-side combine), and the split needs no doc join — "
    "the bucket recomputes from doc_id arithmetic. Exactness caveat: "
    "joining on xxhash64(shingle) admits a ~2^-64-per-pair hash "
    "collision that would count a novel shingle as seen (same idiom as "
    "split_contamination; the DuckDB oracle joins on shingle TEXT, so "
    "driver parity doubles as a collision-absence check at test scale). "
    "When calibrating bloom false-hit rates where even that bias "
    "matters, join on the shingle string instead — the text join is the "
    "strictly-exact form, at ~3x the shuffled bytes.",
)
def q_test_set_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    g = (
        shingled_docs(d)
        .select(
            "doc_id",
            F.explode(F.transform("sh", lambda s: F.xxhash64(s))).alias("shingle_h"),
        )
        .withColumn("b", split_bucket("doc_id"))
        # val-bucket rows never reach either side — prune BEFORE the
        # barrier; checkpoint because tr and te both read this frame
        # (the split_contamination rule)
        .filter((F.col("b") < 80) | (F.col("b") >= 90))
        .localCheckpoint(eager=True)
    )
    tr = g.filter(F.col("b") < 80).select("shingle_h").distinct()
    te = g.filter(F.col("b") >= 90).select("doc_id", "shingle_h").distinct()
    seen = F.sum(F.when(F.col("hit").isNotNull(), 1).otherwise(0))
    return (
        te.join(tr.withColumn("hit", F.lit(1)), "shingle_h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            seen.cast("long").alias("n_seen_in_train"),
            F.round(
                1 - seen / F.count("*").cast("double"), 6
            ).alias("novelty_ratio"),
        )
    )


@register(
    "curriculum_bins",
    oracle="""
    WITH binned AS (
      SELECT doc_id, n_chars,
             ntile(10) OVER (ORDER BY n_chars, doc_id) AS bin
      FROM documents
    )
    SELECT bin, COUNT(*) AS n_docs, MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM binned GROUP BY bin
    """,
    doc="Curriculum binning: documents deciled by length (short->long "
    "training order), deterministic via the doc_id tiebreak. Scale-safe "
    "exact ranking: NO ntile / no single-partition total sort over the "
    "docs table. Global rank = (count of docs with smaller n_chars, from "
    "a cumulative sum over the tiny per-length aggregate) + (row_number "
    "within the doc's own n_chars group, a PARTITIONED window). The only "
    "global-order window runs over the distinct-length aggregate (bounded "
    "by max doc length — KBs, not TBs). Bin from rank via exact ntile "
    "arithmetic: the first N%10 bins take ceil(N/10) rows, the rest "
    "floor(N/10) — bit-identical to the oracle's ntile(10).",
)
def q_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, "documents", sf_dir)
    # Per-length counts: tiny relation (one row per distinct n_chars).
    by_len = d.groupBy("n_chars").agg(F.count("*").alias("cnt"))
    w_cum = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, -1)
    offsets = by_len.select(
        "n_chars", F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).alias("offset")
    )
    total = by_len.agg(F.sum("cnt").alias("n_total"))
    w_in = Window.partitionBy("n_chars").orderBy("doc_id")
    ranked = (
        d.select("doc_id", "n_chars", F.row_number().over(w_in).alias("rn_in"))
        .join(F.broadcast(offsets), "n_chars")
        .crossJoin(F.broadcast(total))
        .withColumn("r", F.col("offset") + F.col("rn_in"))
    )
    # ntile(10) arithmetic on the exact global rank r (1-based), N rows:
    # q = N div 10, rem = N mod 10; ranks 1..(q+1)*rem fill bins 1..rem
    # with q+1 rows each, the rest fill bins rem+1..10 with q rows each.
    q, rem, r = F.floor(F.col("n_total") / 10), F.col("n_total") % 10, F.col("r")
    big_span = (q + 1) * rem
    bin_col = F.when(r <= big_span, F.ceil(r / (q + 1))).otherwise(
        rem + F.ceil((r - big_span) / F.greatest(q, F.lit(1)))
    )
    return (
        ranked.select("n_chars", bin_col.cast("int").alias("bin"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@register(
    "source_capped_sample",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY {_SPLIT_HASH_SQL}, doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, source FROM ranked WHERE rn <= 20
    """,
    doc="Stratified downsampling: cap each source's contribution at K docs, "
    "chosen by deterministic hash order (not first-K by id — that biases "
    "toward old documents). One shuffle on source; per-group top-K via "
    "row_number is rank-pruned by Spark's WindowGroupLimit at scale.",
)
def q_source_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, "documents", sf_dir)
    w = Window.partitionBy("source").orderBy(split_hash("doc_id"), "doc_id")
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "source")
    )


PQ_SUBSPACES = 8  # 64-dim vectors -> 8 subvectors of 8 dims
PQ_SUBDIM = 8
PQ_CODES = 16  # codebook entries per subspace (codes fit in 4 bits)


@register(
    "embedding_pq_codes",
    # Codebook: subspace s's entry c is the slice of vec_id=c's embedding —
    # a deterministic "trained" codebook both engines reconstruct from the
    # table itself. Distances are sequential 8-term folds; the per-vector
    # error is summed in subspace order via an ordered list fold, so every
    # double is bit-identical cross-engine.
    oracle=f"""
    WITH sp AS (SELECT unnest(range(0, {PQ_SUBSPACES})) AS s),
    cb AS (
      SELECT e.vec_id AS code, sp.s,
             list_transform(range(1, {PQ_SUBDIM} + 1),
               i -> CAST(e.embedding[sp.s * {PQ_SUBDIM} + i] AS DOUBLE)) AS csub
      FROM embeddings e CROSS JOIN sp WHERE e.vec_id < {PQ_CODES}
    ),
    vs AS (
      SELECT e.vec_id, sp.s,
             list_transform(range(1, {PQ_SUBDIM} + 1),
               i -> CAST(e.embedding[sp.s * {PQ_SUBDIM} + i] AS DOUBLE)) AS sub
      FROM embeddings e CROSS JOIN sp
    ),
    d AS (
      SELECT vs.vec_id, vs.s, cb.code,
             list_reduce(list_transform(range(1, {PQ_SUBDIM} + 1),
               i -> (sub[i] - csub[i]) * (sub[i] - csub[i])), (a, b) -> a + b) AS dist
      FROM vs JOIN cb ON vs.s = cb.s
    ),
    best AS (
      SELECT vec_id, s, code, dist FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, code) AS rk
        FROM d
      ) WHERE rk = 1
    )
    SELECT vec_id,
           array_to_string(list(CAST(code AS VARCHAR) ORDER BY s), ' ') AS codes,
           list_reduce(list(dist ORDER BY s), (a, b) -> a + b) AS quant_err
    FROM best GROUP BY vec_id
    """,
    doc="Product quantization: 64-dim float vectors -> 8 sub-codes of 4 bits "
    "(64:1 compression vs float32), the memory layer under IVF-PQ ANN at "
    "100 TB. Codebook (16 entries x 8 subspaces, sliced from the first 16 "
    "vectors as a deterministic stand-in for per-subspace k-means) is tiny "
    "and BROADCAST; assignment is a per-(vector, subspace) argmin — "
    "map-side compute, one narrow groupBy(vec_id) to fold codes back, no "
    "corpus self-join. Codes stringified (driver canonicalizer hashes "
    "scalars); quant_err folded in subspace order for bit-stable doubles.",
)
def q_embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(load_table(spark, "embeddings", sf_dir), "vec_id")
    best = pq_encode(emb)
    packed = F.array_sort(F.collect_list(F.struct("s", "code", "dist")))
    return (
        best.groupBy("vec_id")
        .agg(packed.alias("p"))
        .select(
            "vec_id",
            F.array_join(
                F.transform("p", lambda e: e["code"].cast("string")), " "
            ).alias("codes"),
            F.aggregate(
                F.transform("p", lambda e: e["dist"]), F.lit(0.0), lambda acc, x: acc + x
            ).alias("quant_err"),
        )
    )


def _slice_by_col(embedding: str):
    """Subvector for the exploded subspace column ``s`` (slice start is a
    Column, so F.slice's int-only signature needs expr)."""
    return F.transform(
        F.expr(f"slice({embedding}, s * {PQ_SUBDIM} + 1, {PQ_SUBDIM})"),
        lambda x: x.cast("double"),
    )


def pq_codebook(emb: DataFrame) -> DataFrame:
    """(code, s, csub): 16 entries per subspace, sliced from the first 16
    vectors — the deterministic stand-in codebook. Tiny; always broadcast."""
    spaces = F.explode(F.sequence(F.lit(0), F.lit(PQ_SUBSPACES - 1))).alias("s")
    return (
        emb.filter(F.col("vec_id") < PQ_CODES)
        .select(F.col("vec_id").alias("code"), "embedding")
        .select("code", spaces, "embedding")
        .select("code", "s", _slice_by_col("embedding").alias("csub"))
    )


def pq_encode(emb: DataFrame) -> DataFrame:
    """(vec_id, s, code, dist): each vector's nearest codebook entry per
    subspace (argmin L2², ties to the lower code id). Map-side compute
    against the broadcast codebook; dist is a sequential 8-term fold."""
    from pyspark.sql.window import Window as W

    spaces = F.explode(F.sequence(F.lit(0), F.lit(PQ_SUBSPACES - 1))).alias("s")
    vs = emb.select("vec_id", spaces, "embedding").select(
        "vec_id", "s", _slice_by_col("embedding").alias("sub")
    )
    dist = F.aggregate(
        F.zip_with("sub", "csub", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    d = vs.join(F.broadcast(pq_codebook(emb)), "s").select(
        "vec_id", "s", "code", dist.alias("dist")
    )
    w = W.partitionBy("vec_id", "s").orderBy("dist", "code")
    return d.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
