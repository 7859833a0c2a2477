"""Registered queries for the multimodal column surface.

Payload bytes are ASCII text, so byte-level features are recomputable in
SQL from ``documents.text`` — the oracle checks the Arrow-UDF plumbing
end-to-end (binary encode → batch transfer → python kernel → result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import decode_images, frame_sample, media_features, media_table
from ..registry import register
from ..session import load_table


@register(
    "media_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
           CAST(length(text) AS INTEGER) AS payload_len,
           CASE WHEN length(text) = 0 THEN 0
                ELSE list_reduce(list_transform(range(1, length(text) + 1),
                     i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)), (a, b) -> a + b)
           END AS byte_sum,
           CASE WHEN doc_id % 2 = 0 THEN CAST((doc_id % 8 + 1) * 64 AS INTEGER) END AS width,
           CASE WHEN doc_id % 2 <> 0 THEN 16000 END AS sample_rate
    FROM documents
    """,
    doc="Binary payload + typed metadata: Arrow-batched byte features over the "
    "binary column; metadata predicates prune without touching payload bytes.",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    return media_features(media_table(d))


@register(
    "media_frame_sample",
    oracle="""
    WITH audio AS (
      SELECT doc_id AS media_id, CAST(n_chars * 10 AS INTEGER) AS n_frames
      FROM documents WHERE doc_id % 2 <> 0
    )
    SELECT media_id, CAST(unnest(range(0, greatest(n_frames - 1, 0) + 1, 1000)) AS INTEGER) AS frame_idx
    FROM audio
    """,
    doc="Frame-sampling plan for audio/video assets (sequence + explode).",
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, "documents", sf_dir)
    return media_table(d).transform(frame_sample).select(
        "media_id", F.col("frame_idx").cast("int").alias("frame_idx")
    )


# REAL decode oracle, shared by the BMP and PNG decode keys. The fixture
# containers tile the utf-8 text bytes to width*height pixels, so
# pixel_sum = (n // len) * full_byte_sum + prefix_byte_sum(n % len) —
# recomputable in SQL from the text, while the Spark side reads
# width/height/pixels from the container parse (BITMAPINFOHEADER +
# padded bottom-up rows for BMP; CRC-verified chunk walk + inflate +
# scanline unfiltering for PNG). Parity therefore certifies the full
# encode->container->decode round trip per format. The mean is a plain
# double division in BOTH engines (IEEE-correctly-rounded, so
# bit-identical); the UDFs themselves only emit integer stats.
_DECODE_STATS_ORACLE = """
    WITH img AS (
      SELECT doc_id AS media_id, 'image' AS kind,
             CAST((doc_id % 8 + 1) * 64 AS INTEGER) AS width,
             CAST((doc_id % 4 + 1) * 64 AS INTEGER) AS height,
             (doc_id % 8 + 1) * 64 * (doc_id % 4 + 1) * 64 AS n,
             text, length(text) AS len
      FROM documents WHERE doc_id % 2 = 0
    ),
    sums AS (
      SELECT media_id, kind, width, height, n, len,
             CASE WHEN len = 0 THEN 0 ELSE
               list_reduce(list_transform(range(1, len + 1),
                 i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)), (a, b) -> a + b)
             END AS full_sum,
             CASE WHEN len = 0 OR n % len = 0 THEN 0 ELSE
               list_reduce(list_transform(range(1, n % len + 1),
                 i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)), (a, b) -> a + b)
             END AS rem_sum
      FROM img
    )
    SELECT media_id, kind, width, height,
           CAST(CASE WHEN len = 0 THEN 0 ELSE n END AS BIGINT) AS n_pixels,
           CASE WHEN len = 0 OR n = 0 THEN 0.0
                ELSE ((n // len) * full_sum + rem_sum) / CAST(n AS DOUBLE)
           END AS mean_byte
    FROM sums
    """


@register(
    "media_decode_stats",
    oracle=_DECODE_STATS_ORACLE,
    doc="REAL image decode (r13): genuine 8-bit grayscale BMP payloads "
    "built from the fixture docs (stdlib struct; palette + padded "
    "bottom-up rows) are parsed back executor-side inside mapInPandas — "
    "width/height come from the BITMAPINFOHEADER and pixel stats from "
    "the reassembled pixel array, and the oracle recomputes them from "
    "doc_id + the fixture text, certifying the full encode->BMP->decode "
    "round trip (the WAV playbook applied to images; zero stubbed "
    "modalities left).",
)
def q_media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal import bmp_media_table

    d = load_table(spark, "documents", sf_dir)
    return decode_images(bmp_media_table(d))


@register(
    "media_png_decode_stats",
    oracle=_DECODE_STATS_ORACLE,
    doc="REAL image decode, compressed container (r14): genuine 8-bit "
    "grayscale PNGs (stdlib zlib — IHDR/IDAT/IEND with per-chunk CRC32, "
    "DEFLATE, five-filter scanlines; fixture encoder cycles the three "
    "vectorizable filters) built from the SAME fixture docs as "
    "media_decode_stats and parsed back inside mapInPandas through the "
    "shared _parse_image seam, so the identical oracle certifies the "
    "encode->PNG->decode round trip value-for-value — and equality with "
    "the BMP key certifies container-independence of the decode. Scale: "
    "map-only; compressed payloads never shuffle, and the entropy-coded "
    "container is ~8x smaller on the wire than the BMP twin.",
)
def q_media_png_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal import png_media_table

    d = load_table(spark, "documents", sf_dir)
    return decode_images(png_media_table(d))


@register(
    "media_jpeg_decode_stats",
    # JPEG is LOSSY, so this oracle certifies a different contract than
    # the BMP/PNG twins: the structural decode exactly (width/height
    # from the SOF0 parse, n_pixels from the decoded array, n_blocks
    # from the MCU grid — all closed-form from doc_id), plus the
    # bounded-error DECISION within_tol = (max |decoded - pre-encode
    # tile| <= 8), whose TRUE value is not empirical: the fixture's
    # all-ones quant table makes the 7.43 worst-case pixel error a
    # theorem (see multimodal._JPEG_TOL). Pixel-level fidelity beyond
    # the decision is pinned by unit tests (flat assets round-trip
    # EXACTLY; random assets stay inside the proven bound) — the
    # decontam_bloom_report precedent: oracle the decision, test the
    # mechanism.
    oracle="""
    SELECT doc_id AS media_id,
           CAST((doc_id % 8 + 1) * 16 AS INTEGER) AS width,
           CAST((doc_id % 4 + 1) * 16 AS INTEGER) AS height,
           CAST((doc_id % 8 + 1) * 16 * (doc_id % 4 + 1) * 16 AS BIGINT)
             AS n_pixels,
           CAST((doc_id % 8 + 1) * 2 * (doc_id % 4 + 1) * 2 AS INTEGER)
             AS n_blocks,
           TRUE AS within_tol
    FROM documents WHERE doc_id % 2 = 0 AND length(text) > 0
    """,
    doc="REAL image decode, LOSSY transform codec (r15): genuine "
    "baseline-JFIF grayscale JPEGs (stdlib struct + numpy — 8x8 FDCT, "
    "all-ones quantization, zigzag, Annex-K Huffman, byte-stuffed "
    "entropy stream) built from the fixture docs and parsed back "
    "executor-side through the shared _parse_image seam: the decoder "
    "reads its quant and Huffman tables FROM the file's DQT/DHT "
    "segments, entropy-decodes, dequantizes, and inverts the DCT. "
    "Quarter-scale fixture dims keep the pure-Python Huffman walk in "
    "seconds (production swaps libjpeg behind the same seam). Scale: "
    "map-only; compressed payloads never shuffle.",
)
def q_media_jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal import jpeg_fidelity_stats, jpeg_media_table

    d = load_table(spark, "documents", sf_dir).filter(F.length("text") > 0)
    return jpeg_fidelity_stats(jpeg_media_table(d, keep_text=True))


@register(
    "media_audio_frames",
    # r12: REAL decode. The Spark side builds a genuine RIFF/WAVE file per
    # audio doc (8-bit mono 16 kHz PCM, samples = utf-8 text bytes; stdlib
    # wave) and frame_audio parses it BACK with wave.open — header fields
    # (sample_rate, n_samples) and the PCM stream all come from the parse.
    # The oracle derives the same values from the fixture text (rate is the
    # generator constant, n_samples/frames from text bytes), so parity
    # certifies the encode -> RIFF -> decode round trip, not byte slicing.
    # RMS = sqrt(sq_sum / n) is a SQL-side IEEE division + sqrt in BOTH
    # engines — bit-identical from integer inputs.
    oracle="""
    WITH audio AS (
      SELECT doc_id AS media_id, text, length(text) AS len
      FROM documents WHERE doc_id % 2 <> 0
    ),
    idx AS (
      SELECT media_id, text, len,
             CAST(unnest(range(0, (len + 159) // 160)) AS INTEGER) AS frame_idx
      FROM audio WHERE len > 0
    ),
    fr AS (
      SELECT media_id, len, frame_idx,
             substring(text, frame_idx * 160 + 1, 160) AS chunk
      FROM idx
    ),
    sums AS (
      SELECT media_id, len, frame_idx,
             CAST(length(chunk) AS INTEGER) AS n_bytes,
             list_reduce(list_transform(range(1, length(chunk) + 1),
               i -> CAST(ascii(substring(chunk, i, 1)) AS BIGINT)),
               (a, b) -> a + b) AS byte_sum,
             list_reduce(list_transform(range(1, length(chunk) + 1),
               i -> CAST(ascii(substring(chunk, i, 1)) AS BIGINT)
                  * CAST(ascii(substring(chunk, i, 1)) AS BIGINT)),
               (a, b) -> a + b) AS sq_sum
      FROM fr
    )
    SELECT media_id, CAST(16000 AS INTEGER) AS sample_rate,
           CAST(len AS BIGINT) AS n_samples,
           frame_idx, n_bytes, byte_sum, sq_sum,
           sqrt(sq_sum / CAST(n_bytes AS DOUBLE)) AS rms
    FROM sums
    """,
    doc="REAL audio decode (r12): genuine RIFF/WAVE payloads built from the "
    "fixture docs (stdlib wave, 8-bit mono PCM) are parsed back executor-"
    "side by wave.open inside mapInPandas — header fields and PCM frames "
    "both come from the parse, and the oracle recomputes them from the "
    "fixture text, certifying the full encode->RIFF->decode round trip. "
    "160-sample (10 ms) frames -> integer stats + SQL-side RMS. Since "
    "r13 the image leg is a real decode too (stdlib BMP).",
)
def q_media_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal import frame_audio, wav_media_table

    d = load_table(spark, "documents", sf_dir)
    return frame_audio(wav_media_table(d))


@register(
    "media_resize_stats",
    # r13: the resample now strides over the DECODED pixel array (text
    # bytes tiled to width*height inside a real BMP, parsed back), so the
    # oracle reconstructs pixel i as text byte (i % len) and strides the
    # n = width*height sequence — ceil(n/stride) <= out_w*out_h <= 4096
    # sampled terms per row, cheap in both engines.
    oracle="""
    WITH img AS (
      SELECT doc_id AS media_id,
             CAST((doc_id % 8 + 1) * 64 AS INTEGER) AS width,
             CAST((doc_id % 4 + 1) * 64 AS INTEGER) AS height,
             text, length(text) AS len
      FROM documents WHERE doc_id % 2 = 0
    ),
    dims AS (
      SELECT media_id, width, height, len, text,
             width * height AS n,
             greatest(1, (width * 64) // greatest(width, height)) AS out_w,
             greatest(1, (height * 64) // greatest(width, height)) AS out_h
      FROM img
    ),
    strided AS (
      SELECT media_id, width, height, n, len, text,
             CAST(out_w AS INTEGER) AS out_w, CAST(out_h AS INTEGER) AS out_h,
             CAST(greatest(1, n // (out_w * out_h)) AS INTEGER) AS stride
      FROM dims
    )
    SELECT media_id, width, height, out_w, out_h, stride,
           CASE WHEN len = 0 THEN 0
                ELSE list_reduce(list_transform(range(0, n, stride),
                     i -> CAST(ascii(substring(text, (i % len) + 1, 1)) AS BIGINT)),
                     (a, b) -> a + b)
           END AS sample_sum
    FROM strided
    """,
    doc="Image resize over REALLY-decoded BMP pixels (r13): width/height "
    "come from the parsed BITMAPINFOHEADER, the aspect-preserving 64-px "
    "output box is integer floor math, and the strided nearest-neighbor "
    "resample checksum runs over the reassembled pixel array (padding "
    "stripped, rows re-ordered) — the oracle recomputes all of it from "
    "doc_id + fixture text, value-gating the container parse and the "
    "per-asset arithmetic. Map-only: zero shuffles, payload never leaves "
    "the executor. Completes the decode / feature-extract / resize / "
    "frame-sample multimodal set with both modalities really decoded.",
)
def q_media_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal import bmp_media_table, resize_images

    d = load_table(spark, "documents", sf_dir)
    return resize_images(bmp_media_table(d))


@register(
    "media_dedup_report",
    oracle="""
    WITH base AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
             CASE WHEN length(text) = 0 THEN 0
                  ELSE list_reduce(
                    list_transform(range(1, length(text) + 1),
                                   i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)),
                    (acc, x) -> (acc * 31 + x) % 1000000007) END AS fp
      FROM documents
    ),
    -- deterministic double-ingestion: every 10th asset re-lands under the
    -- OPPOSITE modality pipeline with a new media_id (the bug under audit)
    m AS (
      SELECT * FROM base
      UNION ALL
      SELECT media_id + 1000000,
             CASE WHEN kind = 'image' THEN 'audio' ELSE 'image' END,
             fp
      FROM base WHERE media_id % 10 = 0
    )
    SELECT fp AS payload_fp,
           MIN(media_id) AS keeper_media_id,
           COUNT(*) AS n_copies,
           CAST(SUM(CASE WHEN kind = 'image' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_image,
           CAST(SUM(CASE WHEN kind = 'audio' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_audio,
           SUM(CASE WHEN kind = 'image' THEN 1 ELSE 0 END) > 0
             AND SUM(CASE WHEN kind = 'audio' THEN 1 ELSE 0 END) > 0
             AS is_cross_modal
    FROM m GROUP BY fp
    """,
    doc="Multimodal asset dedup: media payloads grouped by content "
    "fingerprint (the 31-poly rolling hash of the payload bytes — the "
    "8-byte shuffle key, never the blob), keeping the lowest media_id "
    "and reporting per-modality copy counts. is_cross_modal flags the "
    "same bytes ingested under BOTH pipelines (image and audio) — the "
    "double-ingestion bug a multimodal lake audits for (a deterministic "
    "re-ingestion of every 10th asset under the flipped modality plants "
    "the fault the audit must catch). The payload "
    "column itself never moves through the shuffle.",
)
def q_media_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import rolling_hash
    from ..multimodal import media_table

    d = load_table(spark, "documents", sf_dir)
    base = media_table(d).select(
        "media_id",
        "kind",
        # fingerprint computed on the DECODED payload text (ascii-safe
        # corpus: utf-8 bytes == character codes), so the oracle can
        # reproduce it engine-side from the same source column
        rolling_hash(F.decode("payload", "utf-8")).alias("fp"),
    )
    # deterministic double-ingestion twin (see oracle comment)
    reingested = base.filter(F.col("media_id") % 10 == 0).select(
        (F.col("media_id") + 1000000).alias("media_id"),
        F.when(F.col("kind") == "image", "audio").otherwise("image").alias("kind"),
        "fp",
    )
    m = base.unionAll(reingested)
    n_image = F.sum(F.when(F.col("kind") == "image", 1).otherwise(0))
    n_audio = F.sum(F.when(F.col("kind") == "audio", 1).otherwise(0))
    return m.groupBy(F.col("fp").alias("payload_fp")).agg(
        F.min("media_id").alias("keeper_media_id"),
        F.count("*").alias("n_copies"),
        n_image.cast("long").alias("n_image"),
        n_audio.cast("long").alias("n_audio"),
        ((n_image > 0) & (n_audio > 0)).alias("is_cross_modal"),
    )


@register(
    "media_wav_silence_runs",
    # Built on the r12 REAL WAV decode: frames come from wave.open's PCM
    # parse, the activity gate is the integer compare sq_sum > T*n_bytes
    # (mean-square threshold T=9800 — the fixture corpus' median frame
    # energy — with no division and no sqrt anywhere), and runs are
    # gaps-and-islands over frame_idx. All integers -> exact parity.
    oracle="""
    WITH audio AS (
      SELECT doc_id AS media_id, text, length(text) AS len
      FROM documents WHERE doc_id % 2 <> 0
    ),
    idx AS (
      SELECT media_id, text,
             CAST(unnest(range(0, (len + 159) // 160)) AS INTEGER) AS frame_idx
      FROM audio WHERE len > 0
    ),
    fr AS (
      SELECT media_id, frame_idx,
             substring(text, frame_idx * 160 + 1, 160) AS chunk
      FROM idx
    ),
    gated AS (
      SELECT media_id, frame_idx,
             CASE WHEN list_reduce(list_transform(range(1, length(chunk) + 1),
                    i -> CAST(ascii(substring(chunk, i, 1)) AS BIGINT)
                       * CAST(ascii(substring(chunk, i, 1)) AS BIGINT)),
                    (a, b) -> a + b) > 9800 * length(chunk)
                  THEN 1 ELSE 0 END AS active
      FROM fr
    ),
    runs AS (
      SELECT media_id, active, frame_idx,
             frame_idx - ROW_NUMBER() OVER (
               PARTITION BY media_id, active ORDER BY frame_idx) AS grp
      FROM gated
    )
    SELECT media_id, CAST(active AS INTEGER) AS active,
           CAST(MIN(frame_idx) AS INTEGER) AS start_frame,
           CAST(MAX(frame_idx) AS INTEGER) AS end_frame,
           CAST(COUNT(*) AS BIGINT) AS n_frames
    FROM runs GROUP BY media_id, active, grp
    """,
    doc="Voice-activity-style segmentation over REALLY-decoded WAV frames "
    "(the downstream op the r12 real decode enables): each 10 ms PCM "
    "frame is gated by the integer mean-square compare sq_sum > T * "
    "n_bytes, then consecutive same-state frames merge into runs via "
    "gaps-and-islands (frame_idx - row_number, the dup_substring island "
    "idiom). The speech-pipeline primitive for silence trimming and "
    "utterance splitting before ASR/feature extraction. Scale shape: "
    "map-only decode (payload bytes never shuffle), per-asset windows "
    "partitioned by media_id (frames per asset are payload-bounded), one "
    "aggregate; output rows ~ state flips, not frames.",
)
def q_media_wav_silence_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..multimodal import frame_audio, wav_media_table

    d = load_table(spark, "documents", sf_dir)
    frames = frame_audio(wav_media_table(d)).select(
        "media_id",
        "frame_idx",
        F.when(F.col("sq_sum") > 9800 * F.col("n_bytes"), 1)
        .otherwise(0)
        .alias("active"),
    )
    w = Window.partitionBy("media_id", "active").orderBy("frame_idx")
    runs = frames.withColumn(
        "grp", F.col("frame_idx") - F.row_number().over(w)
    )
    return runs.groupBy("media_id", "active", "grp").agg(
        F.min("frame_idx").cast("int").alias("start_frame"),
        F.max("frame_idx").cast("int").alias("end_frame"),
        F.count("*").cast("long").alias("n_frames"),
    ).select("media_id", "active", "start_frame", "end_frame", "n_frames")


# aHash near-dup banding: 4 x 15-bit bands over the 60-bit hash, probed
# with Hamming-1 multiprobe (the knn_lsh_probe idiom: the probe side
# also queries every one-bit flip of each band). Pigeonhole makes the
# candidate set COMPLETE through total distance 7 — a pair within 7
# flipped bits leaves some band within distance 1, and that band is
# reached by an exact or one-flip probe — so with the verify threshold
# ALSO at 7 the operator is EXACT: output = all pairs with
# hamming(phash_a, phash_b) <= 7, no probabilistic recall at all.
PHASH_BANDS = 4
PHASH_BAND_BITS = 15
PHASH_HAM_T = 7


@register(
    "media_phash_near_dup",
    oracle=f"""
    WITH img AS (
      SELECT doc_id AS media_id,
             (doc_id % 8 + 1) * 64 AS w, (doc_id % 4 + 1) * 64 AS h,
             text, length(text) AS len
      FROM documents WHERE doc_id % 2 = 0
    ),
    sm AS (
      SELECT media_id,
             list_transform(range(0, 60),
               k -> CAST(ascii(substring(text,
                    ((k * ((w * h) // 60)) % len) + 1, 1)) AS BIGINT)) AS s
      FROM img
    ),
    md AS (SELECT media_id, s, list_sort(s)[31] AS med FROM sm),
    ph AS (
      SELECT media_id,
             list_reduce(list_transform(range(0, 60),
               k -> CASE WHEN s[k + 1] > med
                         THEN CAST(power(2, k) AS BIGINT)
                         ELSE CAST(0 AS BIGINT) END),
               (a, b) -> a + b) AS phash
      FROM md
    ),
    bv AS (
      SELECT media_id, phash, b.j,
             (phash >> (b.j * {PHASH_BAND_BITS})) & {(1 << PHASH_BAND_BITS) - 1} AS band_val
      FROM ph CROSS JOIN (SELECT unnest(range(0, {PHASH_BANDS})) AS j) b
    ),
    probes AS (
      SELECT media_id, phash, j,
             CASE WHEN f.f = 0 THEN band_val
                  ELSE xor(band_val, CAST(power(2, f.f - 1) AS BIGINT)) END AS probe
      FROM bv CROSS JOIN (SELECT unnest(range(0, {PHASH_BAND_BITS} + 1)) AS f) f
    ),
    cand AS (
      SELECT DISTINCT a.media_id AS media_a, a.phash AS ph_a,
                      y.media_id AS media_b, y.phash AS ph_b
      FROM probes a JOIN bv y
        ON a.j = y.j AND a.probe = y.band_val AND a.media_id < y.media_id
    )
    SELECT media_a, media_b,
           CAST(bit_count(xor(ph_a, ph_b)) AS INTEGER) AS hamming
    FROM cand WHERE bit_count(xor(ph_a, ph_b)) <= {PHASH_HAM_T}
    """,
    doc="Perceptual near-duplicate detection over REALLY-decoded images — "
    "the image twin of dedup_simhash, enabled by the r13 real BMP "
    "decode: each image's 60-bit median-hash (strided samples of the "
    "parsed pixel array, bit = sample above the sample MEDIAN — balanced "
    "p=1/2 bits, so random pairs sit near distance 30 and only true "
    "perceptual structure lands under the threshold) is banded into 4 x 15-bit "
    "bands and bucket-joined with Hamming-1 MULTIPROBE (the "
    "knn_lsh_probe idiom), then Hamming-verified at <= 7. Pigeonhole "
    "makes this EXACT, not probabilistic: <= 7 total flips leave some "
    "band within one flip of matching, so the output is precisely every "
    "pair at perceptual distance <= 7. 60 bits, not 32: a narrow hash "
    "saturates as the corpus grows (birthday collisions made pair mass "
    "superlinear — measured 0.94 at the 10x leg before widening), the "
    "same reason production pHash systems are 64-bit+. The "
    "multimodal-lake audit that catches re-encoded duplicates exact "
    "fingerprints miss (media_dedup_report = byte-exact leg; this = "
    "perceptual leg). Scale shape: map-only decode + hash (payload "
    "never shuffles), candidates via 8-byte (band, value) keys with a "
    "16x bounded probe fan-out, exact verify only on co-bucketed pairs.",
)
def q_media_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal import bmp_media_table, phash_images

    d = load_table(spark, "documents", sf_dir)
    ph = phash_images(bmp_media_table(d))
    mask = (1 << PHASH_BAND_BITS) - 1
    bands = ph.select(
        "media_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("phash"), PHASH_BAND_BITS * j).bitwiseAND(
                        F.lit(mask)
                    )
                    for j in range(PHASH_BANDS)
                ]
            )
        ).alias("j", "band_val"),
    )
    probes = bands.select(
        "media_id",
        "phash",
        "j",
        F.explode(
            F.array(
                F.col("band_val"),
                *[
                    F.col("band_val").bitwiseXOR(F.lit(1 << f))
                    for f in range(PHASH_BAND_BITS)
                ],
            )
        ).alias("probe"),
    )
    a = probes.alias("a")
    y = bands.alias("y")
    cand = (
        a.join(
            y,
            (F.col("a.j") == F.col("y.j"))
            & (F.col("a.probe") == F.col("y.band_val"))
            & (F.col("a.media_id") < F.col("y.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("a.phash").alias("ph_a"),
            F.col("y.media_id").alias("media_b"),
            F.col("y.phash").alias("ph_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).cast("int")
    return cand.select("media_a", "media_b", ham.alias("hamming")).filter(
        F.col("hamming") <= PHASH_HAM_T
    )


def _phash_clusters_oracle() -> str:
    """Connected components over the exact perceptual-pair graph — the
    media_phash_near_dup oracle embeds verbatim as the edge source (the
    dedup_clusters recursive-CTE idiom)."""
    from ..registry import REGISTRY

    pairs = REGISTRY["media_phash_near_dup"].oracle
    return f"""
    WITH RECURSIVE ppairs AS (
      SELECT media_a, media_b FROM ({pairs})
    ),
    nodes AS (SELECT DISTINCT media_a AS node FROM ppairs
              UNION SELECT DISTINCT media_b FROM ppairs),
    edges AS (
      SELECT media_a AS src, media_b AS dst FROM ppairs
      UNION ALL SELECT media_b, media_a FROM ppairs
    ),
    reach(node, root) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS media_id, MIN(root) AS cluster_id FROM reach GROUP BY node
    """


@register(
    "media_phash_clusters",
    oracle=_phash_clusters_oracle(),
    doc="Perceptual duplicate CLUSTERS: connected components over the "
    "exact media_phash_near_dup pair graph (min-label propagation with "
    "pointer doubling — the dedup_clusters machinery reused verbatim on "
    "image pairs), cluster_id = lowest media_id = the keeper. Completes "
    "the image dedup chain: byte-exact fingerprint groups "
    "(media_dedup_report) -> exact perceptual pairs "
    "(media_phash_near_dup) -> transitive closure + keeper selection "
    "(this op) — a lake dedups re-encoded asset families by DELETING "
    "everything whose media_id != cluster_id. Pairs are exact, so the "
    "clustering is too; singleton assets are absent by construction "
    "(nothing to dedup).",
)
def q_media_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import cluster_labels

    pairs = q_media_phash_near_dup(spark, sf_dir).select(
        F.col("media_a").alias("doc_a"), F.col("media_b").alias("doc_b")
    )
    return cluster_labels(pairs).select(
        F.col("doc_id").alias("media_id"), "cluster_id"
    )


@register(
    "media_gradient_energy",
    # pixels are the utf-8 text bytes tiled to width*height, so the
    # within-row neighbor difference at flat index i is
    # |byte[(i+1) % len] − byte[i % len]| except where i+1 starts a new
    # row — recomputable in SQL from doc_id + text, while the Spark side
    # measures it on the pixel array reassembled from the padded
    # bottom-up BMP rows. Integer sum both sides; the mean is one IEEE
    # division.
    oracle="""
    WITH img AS (
      SELECT doc_id AS media_id,
             CAST((doc_id % 8 + 1) * 64 AS INTEGER) AS width,
             CAST((doc_id % 4 + 1) * 64 AS INTEGER) AS height,
             (doc_id % 8 + 1) * 64 * (doc_id % 4 + 1) * 64 AS n,
             text, length(text) AS len
      FROM documents WHERE doc_id % 2 = 0
    ),
    g AS (
      SELECT media_id, width, height,
             CAST((width - 1) * height AS BIGINT) AS n_pairs,
             CAST(list_reduce(list_transform(range(0, n - 1),
                  i -> CASE WHEN (i + 1) % width = 0 THEN CAST(0 AS BIGINT)
                       ELSE CAST(abs(
                         ascii(substring(text, CAST((i + 1) % len AS INTEGER) + 1, 1))
                         - ascii(substring(text, CAST(i % len AS INTEGER) + 1, 1))
                       ) AS BIGINT) END),
                  (a, b) -> a + b) AS BIGINT) AS grad_sum
      FROM g0
    )
    SELECT media_id, width, height, n_pairs, grad_sum,
           round(grad_sum / CAST(n_pairs AS DOUBLE), 6) AS grad_mean
    FROM g ORDER BY media_id
    """.replace("FROM g0", "FROM img"),
    doc="Horizontal total-variation energy per image over REALLY-decoded "
    "BMP pixels — the sharpness/texture signal a multimodal curation "
    "pipeline gates on (blurred/flat assets score low), and the second "
    "downstream consumer of the image decode path (with "
    "media_phash_near_dup), mirroring how media_wav_silence_runs "
    "consumes decoded PCM. Map-only: one Arrow batch in/out, payload "
    "bytes never leave the executor; the oracle recomputes the exact "
    "integer sum from the tiled fixture bytes, so parity certifies the "
    "row-major reassembly of the padded bottom-up BMP rows (a transposed "
    "or padding-polluted decode would change the sum).",
)
def q_media_gradient_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal import bmp_media_table, gradient_energy

    d = load_table(spark, "documents", sf_dir)
    return (
        gradient_energy(bmp_media_table(d))
        .select(
            "media_id",
            "width",
            "height",
            "n_pairs",
            "grad_sum",
            F.round(
                F.col("grad_sum") / F.col("n_pairs").cast("double"), 6
            ).alias("grad_mean"),
        )
        .orderBy("media_id")
    )
