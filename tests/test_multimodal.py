"""Multimodal column plumbing: binary payloads, metadata pruning, decode stub."""

from __future__ import annotations

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


def test_decode_stub_shapes(spark):
    d = load_table(spark, "documents", SF).limit(20)
    out = decode_images(media_table(d)).collect()
    assert all(r["kind"] == "image" for r in out)
    for r in out:
        assert r["n_pixels"] == r["width"] * r["height"]
        assert 0 <= r["mean_byte"] <= 255


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
