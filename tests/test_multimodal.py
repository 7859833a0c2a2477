"""Multimodal column plumbing: binary payloads, metadata pruning, real codecs."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from collect_mobile_devices_datalake_spark.multimodal import (
    decode_images,
    frame_sample,
    media_features,
    media_table,
)
from collect_mobile_devices_datalake_spark.session import load_table

SF = "/root/testdata/sf0.001"


def test_media_table_schema_and_metadata_pruning(spark):
    d = load_table(spark, "documents", SF)
    m = media_table(d)
    assert dict(m.dtypes)["payload"] == "binary"
    # metadata predicate never touches payload bytes
    imgs = m.filter(F.col("meta.width") > 128).select("media_id", "meta.width")
    assert imgs.count() > 0
    kinds = {r["kind"] for r in m.select("kind").distinct().collect()}
    assert kinds == {"image", "audio"}


def test_decode_real_bmp_shapes(spark):
    from collect_mobile_devices_datalake_spark.multimodal import bmp_media_table

    d = load_table(spark, "documents", SF).limit(20)
    out = decode_images(bmp_media_table(d)).collect()
    assert out and all(r["kind"] == "image" for r in out)
    for r in out:
        assert r["n_pixels"] == r["width"] * r["height"]
        assert 0 <= r["mean_byte"] <= 255


def test_bmp_round_trip_real_decode():
    """r13: the image leg is a genuine BMP round trip — magic bytes, a
    stdlib re-parse independent of our parser, and pixel-sum conservation
    through the padded bottom-up row layout (incl. a non-multiple-of-4
    width, where padding handling actually matters)."""
    import struct

    from collect_mobile_devices_datalake_spark.multimodal import (
        _bmp_bytes,
        _parse_bmp,
    )

    for w, h in [(7, 3), (64, 128), (1, 1), (5, 4)]:
        px = bytes((i * 37 + 11) % 256 for i in range(w * h))
        blob = _bmp_bytes(px, w, h)
        # magic + header fields via an independent stdlib unpack
        assert blob[:2] == b"BM"
        file_size, _, _, offset = struct.unpack_from("<IHHI", blob, 2)
        hsz, bw, bh, planes, bpp, comp = struct.unpack_from("<IiiHHI", blob, 14)
        assert (file_size, offset) == (len(blob), 14 + 40 + 1024)
        assert (hsz, bw, bh, planes, bpp, comp) == (40, w, h, 1, 8, 0)
        row_size = (w + 3) & ~3
        assert len(blob) == offset + row_size * h
        # independent pixel reassembly (bottom-up, padding stripped)
        want = b"".join(
            blob[offset + (h - 1 - y) * row_size :][:w] for y in range(h)
        )
        pw, ph, got = _parse_bmp(blob, media_id=0)
        assert (pw, ph) == (w, h)
        assert got == want == px                      # exact round trip
        assert sum(got) == sum(px)                    # pixel-sum conservation


def test_parse_bmp_rejects_malformed_containers():
    """Strict decode: wrong magic, unsupported bpp, and truncated pixel
    data all raise a per-media ValueError naming the asset — never a
    silent mis-parse."""
    import pytest

    from collect_mobile_devices_datalake_spark.multimodal import (
        _bmp_bytes,
        _parse_bmp,
    )

    blob = _bmp_bytes(bytes(range(12)), 4, 3)
    with pytest.raises(ValueError, match="media_id 7.*BM magic"):
        _parse_bmp(b"XX" + blob[2:], media_id=7)
    bad_bpp = bytearray(blob)
    bad_bpp[28] = 24  # biBitCount byte
    with pytest.raises(ValueError, match="media_id 8.*expected 8-bit"):
        _parse_bmp(bytes(bad_bpp), media_id=8)
    with pytest.raises(ValueError, match="media_id 9.*truncated"):
        _parse_bmp(blob[:-4], media_id=9)


def test_png_round_trip_all_five_filters():
    """r14: the PNG codec is a genuine compressed round trip — every
    scanline filter type (None/Sub/Up/Average/Paeth) reconstructs the
    exact pixel array, for widths that stress the x-sequential unfilter
    paths (w=1 edges, odd widths) and any filter mix."""
    from collect_mobile_devices_datalake_spark.multimodal import (
        _PNG_SIG,
        _parse_png,
        _png_bytes,
    )

    for w, h in [(1, 1), (1, 7), (7, 1), (13, 29), (64, 64), (5, 10)]:
        px = bytes((i * 37 + (i >> 3) * 11 + 7) % 256 for i in range(w * h))
        for cyc in [(0,), (1,), (2,), (3,), (4,), (0, 1, 2), (0, 1, 2, 3, 4), (4, 3)]:
            blob = _png_bytes(px, w, h, cyc)
            assert blob[: len(_PNG_SIG)] == _PNG_SIG
            assert blob.endswith(b"IEND" + blob[-4:])  # IEND last, CRC-trailed
            pw, ph, got = _parse_png(blob, media_id=0)
            assert (pw, ph, got) == (w, h, px)


def test_parse_png_rejects_malformed_containers():
    """Strict compressed decode: bad signature, a flipped byte anywhere
    in a chunk (CRC32 catches it), an unsupported IHDR shape, and a
    truncated or corrupt DEFLATE stream all raise a per-media ValueError
    naming the asset — never a silent mis-parse."""
    import pytest

    from collect_mobile_devices_datalake_spark.multimodal import (
        _parse_image,
        _parse_png,
        _png_bytes,
    )

    blob = _png_bytes(bytes(range(12)), 4, 3, (0, 1, 2, 3, 4))
    with pytest.raises(ValueError, match="media_id 7.*signature"):
        _parse_png(b"XXXXXXXX" + blob[8:], media_id=7)
    # flip one byte of IDAT payload: the chunk CRC must catch it
    idat_at = blob.index(b"IDAT")
    bad = bytearray(blob)
    bad[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="media_id 8.*CRC mismatch"):
        _parse_png(bytes(bad), media_id=8)
    # 16-bit depth: unsupported IHDR shape (CRC recomputed to isolate the gate)
    import struct
    import zlib

    deep = bytearray(blob)
    deep[8 + 8 + 8] = 16  # IHDR bit-depth byte
    ihdr = bytes(deep[8 + 8 : 8 + 8 + 13])
    deep[8 + 8 + 13 : 8 + 8 + 17] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="media_id 9.*expected 8-bit"):
        _parse_png(bytes(deep), media_id=9)
    with pytest.raises(ValueError, match="media_id 10.*truncated"):
        _parse_png(blob[:-6], media_id=10)
    with pytest.raises(ValueError, match="media_id 11.*unknown image container"):
        _parse_image(b"GIF89a\x00\x00" + blob, media_id=11)


def test_png_and_bmp_decode_identically_through_consumers(spark):
    """Container-independence: the PNG and BMP media tables carry the
    same pixels for the same assets, so every consumer must emit
    identical values — pinned here via phash (full pixel-array
    sensitivity) and gradient energy (neighbor-pair sensitivity)."""
    from collect_mobile_devices_datalake_spark.multimodal import (
        bmp_media_table,
        gradient_energy,
        phash_images,
        png_media_table,
    )

    # deterministic selection: limit() without orderBy can pick a
    # different 8 docs per action, and the BMP/PNG branches trigger
    # separate actions — a predicate keeps both branches on one doc set
    d = load_table(spark, "documents", SF).filter(
        (F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 16)
    )
    bmp, png = bmp_media_table(d), png_media_table(d)
    assert {tuple(r) for r in phash_images(bmp).collect()} == {
        tuple(r) for r in phash_images(png).collect()
    }
    assert {tuple(r) for r in gradient_energy(bmp).collect()} == {
        tuple(r) for r in gradient_energy(png).collect()
    }
    # and the compressed container is materially smaller on the wire
    sizes = (
        bmp.select(F.sum(F.length("payload")).alias("b"))
        .crossJoin(png.select(F.sum(F.length("payload")).alias("p")))
        .first()
    )
    assert sizes["p"] < sizes["b"] / 2


def test_resize_strides_decoded_pixels(spark):
    """The resample must run over the DECODED pixel array (tiled text
    bytes), not the raw container — recompute one asset end-to-end in
    plain Python."""
    from collect_mobile_devices_datalake_spark.multimodal import (
        bmp_media_table,
        resize_images,
    )

    d = load_table(spark, "documents", SF).filter(F.col("doc_id") % 2 == 0).limit(3)
    rows = {r["media_id"]: r for r in resize_images(bmp_media_table(d)).collect()}
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    assert rows
    for mid, r in rows.items():
        b = texts[mid].encode("utf-8")
        n = r["width"] * r["height"]
        px = (b * (n // len(b) + 1))[:n]
        long_edge = max(r["width"], r["height"])
        assert r["out_w"] == max(1, r["width"] * 64 // long_edge)
        assert r["out_h"] == max(1, r["height"] * 64 // long_edge)
        assert r["stride"] == max(1, n // (r["out_w"] * r["out_h"]))
        assert r["sample_sum"] == sum(px[:: r["stride"]])


def test_frame_sample_stride(spark):
    d = load_table(spark, "documents", SF).limit(20)
    rows = frame_sample(media_table(d), every_n=1000).collect()
    assert rows and all(r["frame_idx"] % 1000 == 0 for r in rows)


def test_byte_features_match_python(spark):
    d = load_table(spark, "documents", SF).limit(5)
    feats = {r["media_id"]: r for r in media_features(media_table(d)).collect()}
    for row in d.collect():
        want = sum(row["text"].encode())
        got = feats[row["doc_id"]]
        assert got["byte_sum"] == want
        assert got["payload_len"] == len(row["text"].encode())


def test_wav_round_trip_real_decode(spark):
    """r12: the audio leg is a genuine RIFF/WAVE round trip — payloads are
    real containers (44-byte header + data chunk) and frame_audio's values
    come from wave.open's parse, not byte slicing."""
    import io
    import wave

    from collect_mobile_devices_datalake_spark.multimodal import (
        frame_audio,
        wav_media_table,
    )

    d = load_table(spark, "documents", SF).limit(10)
    media = wav_media_table(d)
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert payloads, "fixture slice has no audio docs"
    for mid, wav in payloads.items():
        assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
        with wave.open(io.BytesIO(wav)) as w:  # stdlib parses our container
            assert w.getframerate() == 16000
            assert w.getnchannels() == 1 and w.getsampwidth() == 1
            assert w.readframes(w.getnframes()) == texts[mid].encode("utf-8")

    frames = frame_audio(media).collect()
    by_id: dict[int, list] = {}
    for r in frames:
        assert r["sample_rate"] == 16000  # header-read, not a constant column
        by_id.setdefault(r["media_id"], []).append(r)
    for mid, rows in by_id.items():
        b = texts[mid].encode("utf-8")
        assert rows[0]["n_samples"] == len(b)
        assert sum(r["n_bytes"] for r in rows) == len(b)
        assert sum(r["byte_sum"] for r in rows) == sum(b)


def test_frame_audio_rejects_non_mono_or_wide_samples(spark):
    """The decode path is strict 8-bit mono PCM: a well-formed WAV with
    the wrong shape must raise (per-media ValueError naming the asset),
    not silently mis-frame the byte stream."""
    import io
    import wave

    import pytest
    from pyspark.sql import functions as F

    from collect_mobile_devices_datalake_spark.multimodal import frame_audio

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)  # stereo — unsupported by the 8-bit mono framing
        w.setsampwidth(1)
        w.setframerate(16000)
        w.writeframes(b"ab" * 100)
    media = spark.createDataFrame(
        [(1, "audio", bytearray(buf.getvalue()))], "media_id long, kind string, payload binary"
    )
    with pytest.raises(Exception, match="expected 8-bit mono PCM"):
        frame_audio(media).collect()


def test_documents_text_is_ascii_at_all_scale_factors():
    """Fixture invariant the multimodal oracles depend on (ADVICE r12):
    the DuckDB oracles for media_audio_frames / media_wav_silence_runs /
    media_features / media_decode_stats derive BYTE counts and byte sums
    from character-level SQL (length(text), ascii(substring(...))), while
    the Spark side decodes text.encode('utf-8'). Those agree iff the
    corpus is pure ASCII — pin that here, at every generated scale
    factor, so a future fixture regeneration can't silently break parity.
    """
    import os

    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        n_bad = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{path}') "
            "WHERE octet_length(encode(text)) <> length(text)"
        ).fetchone()[0]
        assert n_bad == 0, f"{sf}: {n_bad} non-ASCII documents.text rows"


def test_phash_near_dup_is_exact(spark):
    """media_phash_near_dup vs an independent Python recompute of every
    image's 60-bit aHash from the fixture text: with 4x15-bit bands AND
    Hamming-1 multiprobe the candidate set is pigeonhole-complete through
    the verify threshold 7, so the operator is EXACT — its output must
    equal the full set of pairs at Hamming distance <= 7, with exact
    distance values."""
    from collect_mobile_devices_datalake_spark.operators.multimodal_queries import (
        PHASH_HAM_T,
        q_media_phash_near_dup,
    )

    d = load_table(spark, "documents", SF)
    out = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in q_media_phash_near_dup(spark, SF).collect()
    }
    hashes: dict[int, int] = {}
    for r in d.filter(F.col("doc_id") % 2 == 0).collect():
        w, h = (r["doc_id"] % 8 + 1) * 64, (r["doc_id"] % 4 + 1) * 64
        b = r["text"].encode()
        n = w * h
        px = (b * (n // len(b) + 1))[:n]
        stride = n // 60
        s = [px[k * stride] for k in range(60)]
        med = sorted(s)[30]  # upper median, matches phash_images
        hashes[r["doc_id"]] = sum(1 << k for k in range(60) if s[k] > med)
    ids = sorted(hashes)
    want = {}
    for i, a in enumerate(ids):
        for bb in ids[i + 1:]:
            ham = bin(hashes[a] ^ hashes[bb]).count("1")
            if ham <= PHASH_HAM_T:
                want[(a, bb)] = ham
    assert out == want and len(want) > 0


def test_gradient_energy_matches_python_and_survives_roundtrip(spark):
    """media_gradient_energy's per-image TV sum equals a from-scratch
    Python recompute from the fixture tiling rule, AND a direct
    _bmp_bytes -> gradient_energy round trip on a hand-built image gets
    the row-major neighbor sum right (a transposed or padding-polluted
    decode would change it — width 5 forces 3 padding bytes per row)."""
    from collect_mobile_devices_datalake_spark.multimodal import (
        _bmp_bytes,
        bmp_media_table,
        gradient_energy,
    )
    from collect_mobile_devices_datalake_spark.operators.multimodal_queries import (
        q_media_gradient_energy,
    )

    # hand-built 5x3 image, values chosen so row and column sums differ
    px = bytes([10, 0, 255, 3, 7,
                9, 9, 9, 9, 9,
                0, 100, 0, 100, 0])
    want_tv = sum(
        abs(px[y * 5 + x + 1] - px[y * 5 + x]) for y in range(3) for x in range(4)
    )
    media = spark.createDataFrame(
        [(1, "image", _bmp_bytes(px, 5, 3))], "media_id long, kind string, payload binary"
    )
    row = gradient_energy(media).collect()[0]
    assert (row.width, row.height, row.n_pairs, row.grad_sum) == (5, 3, 12, want_tv)

    # fixture-wide: recompute from the tiling rule
    d = load_table(spark, "documents", SF)
    got = {r["media_id"]: r for r in q_media_gradient_energy(spark, SF).collect()}
    docs = d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text").collect()
    assert set(got) == {r["doc_id"] for r in docs}
    for r in docs:
        w, h = (r["doc_id"] % 8 + 1) * 64, (r["doc_id"] % 4 + 1) * 64
        b = r["text"].encode()
        n = w * h
        tiles = (b * (n // len(b) + 1))[:n]
        want = sum(
            abs(tiles[y * w + x + 1] - tiles[y * w + x])
            for y in range(h)
            for x in range(w - 1)
        )
        e = got[r["doc_id"]]
        assert (e.width, e.height, e.n_pairs, e.grad_sum) == (w, h, (w - 1) * h, want)
        assert e.grad_mean == round(want / ((w - 1) * h), 6)


def test_jpeg_round_trip_flat_exact_and_random_bounded():
    """r15: the JPEG codec is a genuine lossy transform round trip —
    flat images reconstruct EXACTLY (DC-only blocks quantize without
    loss under the all-ones table), and arbitrary images stay inside
    the PROVABLE _JPEG_TOL bound, across dims that exercise the
    pad-and-crop path (non-multiples of 8) and both MCU grid shapes."""
    import numpy as np

    from collect_mobile_devices_datalake_spark.multimodal import (
        _JPEG_TOL,
        _jpeg_bytes,
        _parse_image,
        _parse_jpeg,
    )

    for w, h in [(8, 8), (16, 8), (17, 9), (1, 1), (64, 24), (13, 29)]:
        flat = bytes([201]) * (w * h)
        pw, ph, got = _parse_jpeg(_jpeg_bytes(flat, w, h), media_id=0)
        assert (pw, ph, got) == (w, h, flat)
    rng = np.random.default_rng(42)
    for w, h in [(8, 8), (24, 16), (17, 9), (128, 64)]:
        px = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
        blob = _jpeg_bytes(px, w, h)
        assert blob[:2] == b"\xff\xd8" and blob.endswith(b"\xff\xd9")
        # the dispatch seam recognizes the magic
        pw, ph, got = _parse_image(blob, media_id=1)
        a = np.frombuffer(px, dtype=np.uint8).astype(int)
        b = np.frombuffer(got, dtype=np.uint8).astype(int)
        assert (pw, ph) == (w, h) and len(got) == w * h
        assert np.abs(a - b).max() <= _JPEG_TOL


def test_jpeg_decoder_reads_tables_from_the_file():
    """The decoder must use the FILE's DQT, not assume the fixture's
    all-ones table: re-emit the same entropy stream with a doubled quant
    table and the decoded pixels must change accordingly (every
    dequantized coefficient doubles -> roughly doubled contrast around
    the level-shift midpoint), while a decoder that hardcoded ones would
    return the original pixels."""
    import numpy as np

    from collect_mobile_devices_datalake_spark.multimodal import (
        _jpeg_bytes,
        _parse_jpeg,
    )

    # high-contrast vertical stripes: large AC coefficients, so doubling
    # the quantizer visibly doubles the reconstructed swing
    px = bytes((20 if i % 2 == 0 else 220) for i in range(16 * 16))
    blob = bytearray(_jpeg_bytes(px, 16, 16))
    at = blob.index(b"\xff\xdb") + 5  # DQT body: Pq/Tq byte then 64 entries
    assert blob[at : at + 64] == bytes([1]) * 64
    blob[at : at + 64] = bytes([2]) * 64
    _, _, doubled = _parse_jpeg(bytes(blob), media_id=0)
    orig = np.frombuffer(px, dtype=np.uint8).astype(int)
    got = np.frombuffer(doubled, dtype=np.uint8).astype(int)
    # doubling the quantizer doubles the AC swing around the DC level
    assert np.abs(got - orig).max() > 8


def test_parse_jpeg_rejects_malformed_containers():
    """Strict lossy decode: bad SOI, truncated segment, unsupported SOF
    mode (progressive), non-baseline precision, corrupted Huffman
    lengths, truncated entropy stream, and trailing garbage each raise
    a per-media ValueError naming the asset."""
    import pytest

    from collect_mobile_devices_datalake_spark.multimodal import (
        _jpeg_bytes,
        _parse_jpeg,
    )

    blob = _jpeg_bytes(bytes(range(64)), 8, 8)
    with pytest.raises(ValueError, match="media_id 7.*SOI"):
        _parse_jpeg(b"XX" + blob[2:], media_id=7)
    with pytest.raises(ValueError, match="media_id 8.*truncated"):
        _parse_jpeg(blob[:15], media_id=8)  # cut mid-APP0
    with pytest.raises(ValueError, match="media_id 13.*missing SOF0"):
        _parse_jpeg(blob[:20], media_id=13)  # cut at a segment boundary
    # SOF0 -> SOF2 (progressive): refused as unsupported mode
    prog = bytearray(blob)
    prog[prog.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="media_id 9.*(SOF|baseline)"):
        _parse_jpeg(bytes(prog), media_id=9)
    # 12-bit precision: outside baseline
    deep = bytearray(blob)
    deep[deep.index(b"\xff\xc0") + 4] = 12
    with pytest.raises(ValueError, match="media_id 10.*8-bit"):
        _parse_jpeg(bytes(deep), media_id=10)
    with pytest.raises(ValueError, match="media_id 11.*trailing"):
        _parse_jpeg(blob + b"junk", media_id=11)
    # amputate the entropy stream mid-block
    cut = blob[: len(blob) - 12] + b"\xff\xd9"
    with pytest.raises(ValueError, match="media_id 12"):
        _parse_jpeg(cut, media_id=12)


def test_jpeg_and_bmp_consumers_agree_within_lossy_tolerance(spark):
    """Container independence for the LOSSY codec: the same assets
    packed as JPEG vs lossless BMP at the JPEG fixture dims must agree
    through the shared consumers up to the codec's proven error bound —
    phash within a small Hamming radius and gradient energy within a
    small relative band (exact equality is the PNG/BMP contract; a
    transform codec earns a tolerance contract)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from collect_mobile_devices_datalake_spark.multimodal import (
        _JPEG_DIM_SCALE,
        _bmp_bytes,
        gradient_energy,
        jpeg_media_table,
        phash_images,
    )

    d = load_table(spark, "documents", SF).filter(
        (F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 16)
    )
    jpg = jpeg_media_table(d)

    # BMP twin at the same (quarter-scale) dims, built through the same
    # tiling so pixels are the pre-encode ground truth
    @pandas_udf("binary")
    def bmp_encode(text: pd.Series, width: pd.Series, height: pd.Series) -> pd.Series:
        def enc(t, w, h):
            b = (t or "").encode("utf-8")
            n = int(w) * int(h)
            return _bmp_bytes((b * (n // len(b) + 1))[:n], int(w), int(h))

        return pd.Series([enc(t, w, h) for t, w, h in zip(text, width, height)])

    w = ((F.col("doc_id") % 8 + 1) * _JPEG_DIM_SCALE).cast("int")
    h = ((F.col("doc_id") % 4 + 1) * _JPEG_DIM_SCALE).cast("int")
    bmp = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        bmp_encode("text", w, h).alias("payload"),
        F.struct(
            w.alias("width"),
            h.alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
    from collect_mobile_devices_datalake_spark.operators.multimodal_queries import (
        PHASH_HAM_T,
    )

    ph_j = {r["media_id"]: r["phash"] for r in phash_images(jpg).collect()}
    ph_b = {r["media_id"]: r["phash"] for r in phash_images(bmp).collect()}
    assert set(ph_j) == set(ph_b) and len(ph_j) == 8
    # the codec must keep every asset inside its own near-dup orbit:
    # the JPEG/BMP twins stay within the registered phash near-dup
    # threshold (media_phash_near_dup's PHASH_HAM_T)
    for mid in ph_j:
        assert bin(ph_j[mid] ^ ph_b[mid]).count("1") <= PHASH_HAM_T, mid
    ge_j = {r["media_id"]: r["grad_sum"] for r in gradient_energy(jpg).collect()}
    ge_b = {r["media_id"]: r["grad_sum"] for r in gradient_energy(bmp).collect()}
    for mid in ge_j:
        rel = abs(ge_j[mid] - ge_b[mid]) / max(ge_b[mid], 1)
        assert rel <= 0.25, (mid, ge_j[mid], ge_b[mid])
