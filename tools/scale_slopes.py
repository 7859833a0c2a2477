"""Measure the scaling SLOPE of the quadratic-risk kernels.

The 100 TB claims elsewhere in this repo are plan-grounded (banded LSH,
prefix-filtered PPJoin, windowed island reassembly, batched NSW build);
this tool turns them into measured evidence: it deterministically
expands the sf0.1 documents/embeddings tables by configurable
multipliers and records each kernel's wall time, then reports the
log-log slope between successive sizes. A kernel whose candidate
generation secretly degrades to all-pairs shows slope → 2; the healthy
shapes stay near 1 (plus the output's own growth).

Expansion design — replicas must NOT be near-duplicates of each other,
or the pair-output itself grows quadratically in the multiplier and the
measurement can't separate algorithm cost from output size:

- documents: replica k rewrites every word at position i with
  i % 3 == k % 3 to a replica-unique token. Every 3-gram shingle then
  contains at least one rewritten word, so cross-replica Jaccard ~ 0,
  while WITHIN a replica the original near-dup structure is preserved
  (near-dup docs are rewritten in lockstep). Corpus-level length and
  frequency shape survive; pair counts grow ~linearly in m.
- documents_disjoint: replica k rewrites EVERY position, so replica
  vocabularies are fully disjoint. Needed for UNIGRAM-keyed kernels
  (BM25): under the 1-in-3 rewrite the replicas still share 2/3 of
  the fixture's 31-word vocabulary, so every query matches every
  document through those shared high-df terms and the candidate mass
  is quadratic BY WORKLOAD CONSTRUCTION — the measurement would grade
  the corpus, not the algorithm. With disjoint vocabularies posting
  lengths stay constant per replica and a healthy inverted-index join
  measures ~linear. (The shared-vocab behavior is itself real — it is
  the stopword-posting problem every exact lexical ranker has on a
  bounded vocabulary — and is documented on the bm25_search operator;
  it is a property of exact BM25 on that workload, not a join defect
  this harness could catch.)
- embeddings: replica k adds a deterministic hash-derived offset of
  magnitude ~0.5 per element — far beyond the near-dup cosine band, so
  cross-replica vectors are not mutual neighbors by construction.

Run: python tools/scale_slopes.py [sf_dir] [mults] [out_json] [only]
Defaults: /root/testdata/sf0.1  1,3,10  docs/SCALE_SLOPES.json  (all)
``only`` is a comma-separated kernel-key subset; prior results for the
same src+mults are preserved and merged in the output JSON.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KERNELS = [
    # (registry key, which tables it scales with)
    ("dedup_ngram_jaccard", "documents"),
    ("dedup_minhash_lsh_pairs", "documents"),
    ("dup_substring_spans", "documents"),
    ("winnowing_overlap_pairs", "documents"),
    ("nsw_graph_edges", "embeddings"),
    # linear-claim kernels added late in round 7: the KMV build (two
    # bounded shuffles), the unigram-LM Viterbi DP (type-table-sized),
    # and greedy k-center (k map-only passes) must all hold slope ~1
    ("kmv_vocab_distinct", "documents"),
    ("unigram_lm_segmentation", "documents"),
    ("kcenter_coreset", "embeddings"),
    # final-session linear-claim kernels: NB classifier (vocab-keyed
    # shuffles), stratified sampling (broadcast-count + scan filter),
    # waterfill (one count scan + |domains|-row window)
    ("nb_quality_classifier", "documents"),
    ("stratified_sample", "documents"),
    ("domain_token_waterfill", "documents"),
    # round-8 linear-claim kernels (verdict item 8): BM25 (vocab-keyed
    # postings join — measured on the disjoint-vocab corpus, see the
    # documents_disjoint note above) and the survivorship argmax
    # aggregation (one user-keyed shuffle, output rows ~ users)
    ("bm25_search", "documents_disjoint"),
    ("golden_record_survivorship", "events"),
    # round-8 widening: the three remaining quadratic-risk production
    # paths with clean expansion semantics — train/test shingle-hash
    # decontamination join, the persisted-LSH ANN probe (query count
    # grows with the corpus; per-query cost must stay bucket-bounded),
    # and the full SemDeDup chain (LSH pairs -> label propagation ->
    # survivor assignment). hybrid_search_rrf is deliberately absent:
    # its vector leg is the documented EXACT baseline (broadcast
    # queries x corpus), quadratic by spec, so a slope would measure
    # the spec, not a defect.
    ("split_contamination", "documents"),
    ("knn_lsh_probe", "embeddings"),
    ("semantic_cluster_survivors", "embeddings"),
    # the flagship lexical dedup chain (MinHash -> LSH bands -> pairs ->
    # label-prop clusters) and the CCNet perplexity-tertile selection
    # (train/apply vocab-keyed joins) — the last two heavily-composed
    # document paths without a slope row
    ("dedup_clusters", "documents"),
    ("ccnet_lm_buckets", "documents"),
    # round-10: the indexed twin of the deliberately-quadratic exact
    # hybrid baseline (r8 verdict item 7) — lexical inverted-index leg
    # + persisted multi-table LSH vector leg + integer RRF fusion. The
    # lexical leg is unigram-keyed, so like bm25_search it must be
    # measured on the disjoint-vocab corpus (shared high-df terms make
    # candidate mass quadratic BY WORKLOAD on the 31-word fixture
    # vocabulary); the vector leg reads the same dir's expanded
    # embeddings (disjoint dirs carry both tables).
    ("hybrid_search_rrf_indexed", "documents_disjoint"),
    # round-10: the priority-sampling pair's plan claims made measurable —
    # global top-K must stay scan-bound (TakeOrderedAndProject: bounded
    # per-partition heaps, slope ~1 from the scan alone), and the
    # per-source variant must stay group-limit-bounded (WindowGroupLimit
    # pushdown: only ~K_G+1 rows per (source, partition) reach the
    # shuffle). Output sizes are K / K_G*|sources| — constant in m.
    ("priority_sample_topk", "documents"),
    ("priority_sample_per_source", "documents"),
    # round-11 kernels: corpus BPE encoding (word-TYPE segmentation +
    # one broadcast dictionary join onto the exploded corpus — the apply
    # cost must track the corpus, the segmentation cost the vocabulary)
    # and the exact test-vs-train novelty join (distinct 8-byte shingle
    # keys both sides; the 1-in-3 rewrite keeps replicas' shingles
    # disjoint so join mass grows ~linearly)
    ("bpe_corpus_encoding", "documents"),
    ("test_set_novelty", "documents"),
    # round-12 kernels (r11 verdict item 7): the temperature-mix
    # allocator (one domain-sized aggregate + integer isqrt weights —
    # cost must track the corpus scan, output |domains|), LSH hard-
    # negative mining (rides the persisted multi-table LSH probe chain,
    # so its slope should match knn_lsh_probe's bucket-bounded shape),
    # and the LSH index health report (bucket-occupancy aggregate over
    # the persisted index — one index-sized groupBy, output ~ bands).
    ("temperature_mix_allocation", "documents"),
    ("contrastive_pairs_mined", "embeddings"),
    ("lsh_index_stats", "embeddings"),
    # round-12 additions: the per-source calibrated quality cut (one
    # scoring scan + tiny histogram window + broadcast join — output
    # ~half the docs), VAD run segmentation over decoded WAV frames
    # (map-only decode + media-keyed islands — cost tracks total PCM
    # bytes, output ~ state flips), and the unigram tokenizer apply
    # (persisted type-table DP + broadcast dictionary join — the
    # bpe_corpus_encoding shape for the second induction algorithm).
    ("source_quality_calibration", "documents"),
    ("media_wav_silence_runs", "documents"),
    ("unigram_corpus_encoding", "documents"),
    # the banding tuner triples the LSH explode (8+4+2 bands of the same
    # signatures) — its slope must stay near dedup_minhash_lsh_pairs'
    # bucket-bounded shape, since candidate mass is the quadratic risk
    ("minhash_band_sweep", "documents"),
    # round-13 additions (r12 verdict item 4 + the new paragraph op):
    # the BPE learn loop itself (8 driver iterations over the word-TYPE
    # table — the heaviest batch kernel; under the 1-in-3 rewrite the
    # type table grows with m, so this measures the loop's real
    # type-table dependence, the honest worst case), the Bloom
    # decontamination report (bitmap build + broadcast probe — both
    # sides scan-shaped), the curated-mix composite (ccnet gate +
    # waterfill + per-source prefix window — its slope is its
    # ccnet_lm_buckets leg), and paragraph keep-first dedup (8-byte
    # fingerprint shuffles + one doc-keyed reassembly join).
    ("bpe_learn_merges", "documents"),
    ("decontam_bloom_report", "documents"),
    ("curated_mix_manifest", "documents"),
    ("paragraph_dedup_clean", "documents"),
    # r13 (r12 verdict item 6): ivf_probe_sweep rejoins the harness —
    # its exact recall leg is now bounded to a FIXED 20-query panel
    # (smallest query ids, corpus-size-independent), so the leg is
    # O(panel x corpus) and the r12 exclusion rationale (query set
    # growing with the corpus made it 1.37 at the 10x leg) no longer
    # applies. The IVF candidate leg was always cell-bounded.
    ("ivf_probe_sweep", "embeddings"),
    # r13: the NSW probe-budget tuner — pooled recall (union of configs'
    # top-10s) needs NO brute-force leg, so the whole sweep rides the
    # persisted graph's bucket-bounded build + per-query O(b + b^2)
    # expansion; its slope should track knn_nsw_probe / nsw_graph_edges.
    ("nsw_probe_sweep", "embeddings"),
    # r13: perceptual image near-dup — map-only BMP decode + 60-bit
    # aHash, 4x15-bit bands with Hamming-1 multiprobe (exact through
    # distance 7); candidate mass is the quadratic risk exactly as in
    # dedup_minhash_lsh_pairs. The first 32-bit design measured 0.77-
    # 0.94 at the 10x leg on BOTH corpora: a narrow hash saturates
    # (birthday collisions), which is a finding about hash WIDTH, not
    # banding — the 60-bit widening (plus MEDIAN bit balancing) is the
    # fix for hash saturation. Workload caveat, recorded with numbers in
    # NOTES r13: NEITHER expansion corpus produces perceptually-
    # independent image replicas — the 1-in-3 rewrite leaves 2/3 of each
    # replica's pixels unchanged (true near-dups of the original), and
    # the disjoint rewrite makes ALL replicas share the 'zqKxNNNNN'
    # token skeleton (true near-dups of each other) — so the EXACT
    # output grows superlinearly by workload construction on both. The
    # time-per-output is the gradeable quantity: wall grew 2.6x while
    # true-pair output grew 162x at the 10x leg (40 -> 6482 pairs).
    ("media_phash_near_dup", "documents"),
    # r13 continuation: the HLL register sketch (ONE map-side-combining
    # max aggregation — the purest scan-bound shape in the repo; shuffle
    # is sources x 256 rows regardless of m) and its events-table fold
    # twin (daily registers -> weekly max-merge; events expansion), plus
    # the WordPiece pair: the learn loop (same type-table dependence as
    # bpe_learn_merges with one extra symbol-count aggregate per
    # iteration) and the corpus apply (persisted segment artifact + one
    # broadcast dictionary join — the bpe_corpus_encoding shape).
    ("hll_register_sketch", "documents"),
    ("hll_weekly_from_daily", "events"),
    ("wordpiece_learn_merges", "documents"),
    ("wordpiece_corpus_encoding", "documents"),
    # the TV-energy image gate: map-only decode + numpy row-diff, cost
    # tracks total pixel bytes (fixture images tile the text bytes, so
    # the expanded corpus carries ~m x the pixel volume), output 1 row
    # per image.
    ("media_gradient_energy", "documents"),
    # the max-munch serving tokenizer: longest-match table (bounded
    # explode + broadcast vocab join) + 5 pointer-doubling self-joins,
    # all over the word-TYPE table — under the 1-in-3 rewrite the type
    # table grows with m, so this measures the doubling joins' real
    # type-table dependence (cold path: includes the per-corpus vocab
    # artifact build, same discipline as bpe/wordpiece_corpus_encoding).
    ("wordpiece_maxmunch_encoding", "documents"),
    # r13 session 3: the watermark tuner (two-phase prefix scan — the
    # within-chunk window grows m x rows per chunk while the chunk
    # table is fixed by the time span, so a healthy run tracks the
    # scan; events expansion), the vocab-budget sweep (4 budgets
    # through ONE pointer-doubling pass over the word-TYPE table —
    # same type-table dependence as wordpiece_maxmunch_encoding, ~4x
    # constant; cold path includes the ranked-vocab artifact build),
    # and the embedding hygiene audit (one scan of array folds + one
    # label-keyed window — output fixed at |labels| rows).
    # r15: the Manku-Jain-Sarma simhash near-dup in its permuted-table
    # form — C(6,3)=20 tables keyed on 30-bit prefixes; candidate mass
    # is Θ(N²/2^30)/table + true-pair output, so the measured slope
    # should now track output growth, not a bucket-collision tail. The
    # media_phash_near_dup workload caveat still applies (the 1-in-3
    # rewrite leaves replicas fingerprint-close to their originals, so
    # true-pair output grows superlinearly by construction; wall time
    # per candidate is the gradeable quantity).
    ("simhash_band_near_dup", "documents"),
    ("watermark_lateness_sweep", "events"),
    ("wp_vocab_size_sweep", "documents"),
    ("embedding_dq_audit", "embeddings"),
    # r15: the incremental ANN maintenance paths. Wall time includes the
    # one-time base+delta index/assignment builds (the cost an append
    # actually pays is the delta shard alone; the measured slope is the
    # honest end-to-end build+probe shape).
    # - LSH: data-independent planes, bucketed probes -> measured flat
    #   (slope 0.29 on the 3->10x leg).
    # - IVF: the r15 measurement at FIXED k=8 read slope 1.8 (occupancy
    #   grows linearly) and drove the cells_for_count fix (k ~ sqrt(n),
    #   the classical IVF sizing); with adaptive cells the measured
    #   slope is ~1.4 — the THEORETICAL shape: Lloyd training is
    #   iters*n*k ~ n^1.5 and the query panel grows with the corpus
    #   (vec_id % 25) while per-query probe cost grows ~sqrt(n), so
    #   end-to-end ~n^1.5 (log-log 1.5) is the floor for this family,
    #   not a defect — same workload-growth class as nsw_probe_sweep.
    ("knn_lsh_incremental", "embeddings"),
    ("knn_ivf_incremental", "embeddings"),
]


def expand_documents(
    spark: SparkSession, src: str, m: int, dst: str, disjoint: bool = False
) -> None:
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    top = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    rep = docs.select(
        "*", F.explode(F.array(*[F.lit(k) for k in range(m)])).alias("k")
    )
    # rewrite every word at position i % 3 == k % 3 (k > 0 only: replica 0
    # is the original corpus byte-for-byte); disjoint=True rewrites EVERY
    # position so replica vocabularies share nothing (word -> token is
    # still deterministic per (word, k), so within-replica df structure
    # is an isomorphic copy of the original corpus)
    cond = "k > 0" if disjoint else "k > 0 AND i % 3 = k % 3"
    rewritten = F.expr(
        "array_join(zip_with(split(text, ' '), sequence(0, size(split(text, ' ')) - 1),"
        f" (w, i) -> IF({cond},"
        "             concat('zq', k, 'x', abs(xxhash64(w, k)) % 100000), w)), ' ')"
    )
    out = rep.select(
        (F.col("doc_id") + F.col("k") * top).alias("doc_id"),
        rewritten.alias("text"),
        "lang",
        "source",
        F.length(rewritten).cast("long").alias("n_chars"),
    )
    out.coalesce(max(1, m)).write.mode("overwrite").parquet(
        os.path.join(dst, "documents.parquet")
    )


def expand_embeddings(spark: SparkSession, src: str, m: int, dst: str) -> None:
    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    top = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    rep = emb.select(
        "*", F.explode(F.array(*[F.lit(k) for k in range(m)])).alias("k")
    )
    shifted = F.expr(
        "zip_with(embedding, sequence(1, size(embedding)), (v, i) -> IF(k = 0, v,"
        " CAST(v + ((abs(xxhash64(vec_id, k, i)) % 1000) / 1000.0 - 0.5) AS FLOAT)))"
    )
    out = rep.select(
        (F.col("vec_id") + F.col("k") * top).alias("vec_id"),
        shifted.alias("embedding"),
        "label",
    )
    out.coalesce(max(1, m)).write.mode("overwrite").parquet(
        os.path.join(dst, "embeddings.parquet")
    )


def expand_events(spark: SparkSession, src: str, m: int, dst: str) -> None:
    """Replica k shifts user_id and event_id past the originals: users
    grow linearly, per-user event counts stay constant, so a healthy
    user-keyed aggregation's output (and cost) grows ~linearly in m.
    Read through load_table (the source ts is TIMESTAMP(NANOS)); the
    rewritten copy is written as plain micros, which load_table also
    accepts."""
    from collect_mobile_devices_datalake_spark.session import load_table

    ev = load_table(spark, "events", src.rstrip("/"))
    tops = ev.agg(F.max("user_id"), F.max("event_id")).collect()[0]
    top_u, top_e = tops[0] + 1, tops[1] + 1
    rep = ev.select(
        "*", F.explode(F.array(*[F.lit(k) for k in range(m)])).alias("k")
    )
    out = rep.select(
        (F.col("event_id") + F.col("k") * top_e).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("k") * top_u).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    out.coalesce(max(1, m)).write.mode("overwrite").parquet(
        os.path.join(dst, "events.parquet")
    )


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "1,3,10").split(",")]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "docs/SCALE_SLOPES.json"
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

    from collect_mobile_devices_datalake_spark import registry
    from collect_mobile_devices_datalake_spark.session import get_spark

    registry._ensure_loaded()
    spark = get_spark("scale-slopes")
    spark.sparkContext.setLogLevel("ERROR")

    run_keys = {k for k, _ in KERNELS} if only is None else only
    need_disjoint = any(t == "documents_disjoint" for k, t in KERNELS if k in run_keys)

    root = tempfile.mkdtemp(prefix="scale_slopes_")
    dirs: dict[int, str] = {}
    dirs_disjoint: dict[int, str] = {}
    try:
        for m in mults:
            d = os.path.join(root, f"m{m}")
            os.makedirs(d, exist_ok=True)
            expand_documents(spark, src, m, d)
            expand_embeddings(spark, src, m, d)
            expand_events(spark, src, m, d)
            dirs[m] = d
            nd = spark.read.parquet(os.path.join(d, "documents.parquet")).count()
            ne = spark.read.parquet(os.path.join(d, "embeddings.parquet")).count()
            print(f"built m={m}: {nd} docs, {ne} vectors", flush=True)
            if need_disjoint:
                dd = os.path.join(root, f"m{m}_disjoint")
                os.makedirs(dd, exist_ok=True)
                expand_documents(spark, src, m, dd, disjoint=True)
                # kernels with BOTH a lexical and a vector leg (hybrid
                # RRF) read embeddings from the same dir
                expand_embeddings(spark, src, m, dd)
                dirs_disjoint[m] = dd

        report: dict[str, dict] = {"src": src, "mults": mults, "kernels": {}}
        if os.path.exists(out_path):
            with open(out_path) as f:
                prior = json.load(f)
            if prior.get("src") == src and prior.get("mults") == mults:
                report["kernels"].update(prior.get("kernels", {}))
            elif only is not None:
                # A subset run can only MERGE into a prior file measured
                # under the same src/mults — otherwise the write below
                # would silently discard every kernel not in `only`.
                # Refuse rather than destroy prior results; a full run
                # (no subset) legitimately replaces the file.
                raise SystemExit(
                    f"refusing subset run: {out_path} was measured with "
                    f"src={prior.get('src')!r} mults={prior.get('mults')} "
                    f"but this run uses src={src!r} mults={mults}; its other "
                    "kernels would be dropped. Re-run without a kernel "
                    "subset (full replace) or match the prior src/mults."
                )
        for key, tables in KERNELS:
            if only is not None and key not in only:
                continue
            q = registry.REGISTRY[key]
            kdirs = dirs_disjoint if tables == "documents_disjoint" else dirs
            times: list[float] = []
            rows: list[int] = []
            for m in mults:
                t0 = time.monotonic()
                n = q.spark(spark, kdirs[m]).count()
                dt = time.monotonic() - t0
                times.append(round(dt, 2))
                rows.append(n)
                print(f"{key}  m={m}: {dt:.2f}s  rows={n}", flush=True)
            slopes = []
            import math

            for a, b in zip(range(len(mults) - 1), range(1, len(mults))):
                if times[a] > 0 and mults[b] > mults[a]:
                    slopes.append(
                        round(
                            math.log(max(times[b], 1e-9) / times[a])
                            / math.log(mults[b] / mults[a]),
                            2,
                        )
                    )
            report["kernels"][key] = {
                "corpus": tables,
                "sec": dict(zip(map(str, mults), times)),
                "rows": dict(zip(map(str, mults), rows)),
                "loglog_slopes": slopes,
            }
            print(f"{key}  slopes={slopes}", flush=True)

        with open(out_path, "w") as f:
            json.dump(report, f, indent=2)
        print("wrote", out_path)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
