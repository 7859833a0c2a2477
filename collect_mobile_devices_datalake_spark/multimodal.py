"""Multimodal columns: binary payloads + typed metadata (north-star M5).

Model: media assets are opaque ``binary`` columns with a typed metadata
struct alongside — the lakehouse pattern for images/audio/video at
100 TB (payload stays columnar+compressed; metadata predicates prune
without touching bytes).

Both modalities are REAL decodes with zero extra dependencies:

- AUDIO (r12): payloads are genuine RIFF/WAVE containers and
  ``frame_audio`` parses them with stdlib ``wave`` (header + PCM frames).
- IMAGE (r13): payloads are genuine 8-bit uncompressed BMP files
  (BITMAPFILEHEADER + BITMAPINFOHEADER + 256-entry grayscale palette +
  bottom-up 4-byte-padded pixel rows, built and parsed with stdlib
  ``struct``) and ``decode_images`` / ``resize_images`` read width,
  height, and every pixel FROM the container parse — no stub left. A
  production deployment swaps the parser for PIL/cv2 behind the same
  ``mapInPandas`` signature to gain compressed codecs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

# The UDF emits INTEGER stats only (pixel count + sum); the mean is a plain
# SQL division appended outside the UDF. IEEE double division is correctly
# rounded, so Spark and any oracle engine produce bit-identical means from
# identical integer inputs — a Python-side round() would not.
DECODED_SCHEMA = (
    "media_id bigint, kind string, width int, height int, "
    "n_pixels bigint, pixel_sum bigint"
)


def media_table(documents: DataFrame) -> DataFrame:
    """Derive a deterministic media table from ``documents``.

    Payload = utf-8 bytes of the text (a stand-in blob); metadata derived
    from doc_id — image rows get width/height, audio rows sample_rate.
    """
    is_image = F.col("doc_id") % 2 == 0
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.when(is_image, "image").otherwise("audio").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.when(is_image, (F.col("doc_id") % 8 + 1) * 64).cast("int").alias("width"),
            F.when(is_image, (F.col("doc_id") % 4 + 1) * 64).cast("int").alias("height"),
            F.when(~is_image, F.lit(16000)).cast("int").alias("sample_rate"),
            F.when(~is_image, F.col("n_chars") * 10).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


# --- Arrow-batched byte-level feature extraction (REAL plumbing) ------------


# NB: a DataType instance, not a DDL string — strings are parsed at import
# time and require a live SparkContext.
@pandas_udf(LongType())
def payload_byte_sum(payload: pd.Series) -> pd.Series:
    """Sum of payload bytes — stands in for any per-asset feature kernel;
    Arrow ships the binary column batch-wise, no per-row Python overhead."""
    return payload.map(lambda b: int(sum(b)) if b is not None else 0)


def media_features(media: DataFrame) -> DataFrame:
    return media.select(
        "media_id",
        "kind",
        F.length("payload").alias("payload_len"),
        payload_byte_sum("payload").alias("byte_sum"),
        F.col("meta.width").alias("width"),
        F.col("meta.sample_rate").alias("sample_rate"),
    )


# --- decode / resize: REAL stdlib BMP codec (r13 — the WAV playbook) --------

_BMP_HEADER_SIZE = 14  # BITMAPFILEHEADER
_BMP_INFO_SIZE = 40  # BITMAPINFOHEADER
_BMP_PALETTE = b"".join(bytes((i, i, i, 0)) for i in range(256))  # gray BGRX
_BMP_DATA_OFFSET = _BMP_HEADER_SIZE + _BMP_INFO_SIZE + len(_BMP_PALETTE)


def _bmp_bytes(pixels: bytes, width: int, height: int) -> bytes:
    """A genuine 8-bit uncompressed BMP (stdlib ``struct``): grayscale
    palette, one payload byte per pixel, rows stored BOTTOM-UP and padded
    to 4-byte multiples — the real on-disk format any image viewer opens,
    not a stand-in. The image twin of ``_wav_bytes``."""
    import struct

    if len(pixels) != width * height or width <= 0 or height <= 0:
        raise ValueError(
            f"pixel buffer {len(pixels)} != width*height {width}*{height}"
        )
    row_size = (width + 3) & ~3
    pad = b"\x00" * (row_size - width)
    data = b"".join(
        pixels[y * width : (y + 1) * width] + pad
        for y in range(height - 1, -1, -1)
    )
    info = struct.pack(
        "<IiiHHIIiiII",
        _BMP_INFO_SIZE, width, height, 1, 8, 0, len(data), 2835, 2835, 256, 0,
    )
    header = struct.pack(
        "<2sIHHI", b"BM", _BMP_DATA_OFFSET + len(data), 0, 0, _BMP_DATA_OFFSET
    )
    return header + info + _BMP_PALETTE + data


def _parse_bmp(payload: bytes, media_id: object) -> tuple[int, int, bytes]:
    """Strict BMP parse (the decode seam): validates the magic, header
    shape, and pixel format, then reconstructs the TOP-DOWN pixel array by
    reversing the bottom-up rows and stripping the 4-byte row padding.
    Returns (width, height, pixels). Raises a per-media ValueError on any
    malformed or unsupported container — same strictness as
    ``frame_audio``'s 8-bit-mono gate."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError(f"media_id {media_id}: not a BMP (missing BM magic)")
    (_file_size, _r1, _r2, offset) = struct.unpack_from("<IHHI", payload, 2)
    (hsz, width, height, planes, bpp, comp) = struct.unpack_from(
        "<IiiHHI", payload, _BMP_HEADER_SIZE
    )
    if hsz != _BMP_INFO_SIZE or planes != 1 or bpp != 8 or comp != 0:
        raise ValueError(
            f"media_id {media_id}: expected 8-bit uncompressed BMP, got "
            f"header={hsz} planes={planes} bpp={bpp} compression={comp}"
        )
    top_down = height < 0
    h = abs(height)
    row_size = (width + 3) & ~3
    if len(payload) < offset + row_size * h:
        raise ValueError(
            f"media_id {media_id}: truncated BMP pixel data "
            f"({len(payload)} bytes < {offset + row_size * h})"
        )
    px = bytearray(width * h)
    for y in range(h):
        src = y if top_down else (h - 1 - y)
        start = offset + src * row_size
        px[y * width : (y + 1) * width] = payload[start : start + width]
    return width, h, bytes(px)


# --- PNG: the first COMPRESSED codec (r14 — stdlib zlib) ---------------------
#
# The third real container after WAV and BMP, and the first with an
# entropy-coded payload: 8-bit grayscale PNG (color type 0), IHDR/IDAT/
# IEND chunk walk with per-chunk CRC32 verification, DEFLATE via stdlib
# zlib, and the five scanline filters. The fixture encoder cycles
# filters 0/1/2 (None/Sub/Up — the unfilter paths that vectorize), so
# production decode stays numpy-fast; filters 3/4 (Average/Paeth) are
# implemented in the decoder and pinned by the round-trip unit test.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _png_bytes(
    pixels: bytes, width: int, height: int, filter_cycle: tuple[int, ...] = (0, 1, 2)
) -> bytes:
    """A genuine 8-bit grayscale PNG (stdlib ``struct`` + ``zlib``):
    IHDR / IDAT / IEND chunks with correct CRC32s, scanlines filtered
    per ``filter_cycle[y % len]`` (PNG filter semantics: predictors read
    RAW neighbor values, so encoding vectorizes), DEFLATE-compressed.
    The compressed twin of ``_bmp_bytes``."""
    import struct
    import zlib

    import numpy as np

    if len(pixels) != width * height or width <= 0 or height <= 0:
        raise ValueError(
            f"pixel buffer {len(pixels)} != width*height {width}*{height}"
        )
    raw = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width).astype(np.int64)
    lines = []
    for y in range(height):
        f = filter_cycle[y % len(filter_cycle)]
        row = raw[y]
        left = np.concatenate(([0], row[:-1]))
        up = raw[y - 1] if y > 0 else np.zeros(width, dtype=np.int64)
        upleft = (
            np.concatenate(([0], raw[y - 1][:-1]))
            if y > 0
            else np.zeros(width, dtype=np.int64)
        )
        if f == 0:
            filt = row
        elif f == 1:
            filt = row - left
        elif f == 2:
            filt = row - up
        elif f == 3:
            filt = row - (left + up) // 2
        elif f == 4:
            p = left + up - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
            )
            filt = row - pred
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        lines.append(bytes([f]) + (filt % 256).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )


def _parse_png(payload: bytes, media_id: object) -> tuple[int, int, bytes]:
    """Strict PNG parse: signature, CRC32-verified chunk walk, IHDR
    shape gate (8-bit grayscale, non-interlaced), IDAT concatenation +
    inflate, and full five-filter scanline reconstruction. Returns
    (width, height, pixels); per-media ValueError on any malformed or
    unsupported container — the same strictness as ``_parse_bmp``."""
    import struct
    import zlib

    import numpy as np

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError(f"media_id {media_id}: not a PNG (bad signature)")
    pos, ihdr, idat, ended = len(_PNG_SIG), None, [], False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError(f"media_id {media_id}: truncated PNG chunk header")
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError(f"media_id {media_id}: truncated PNG chunk {tag!r}")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != (zlib.crc32(tag + data) & 0xFFFFFFFF):
            raise ValueError(f"media_id {media_id}: PNG CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            if ihdr is not None or pos != len(_PNG_SIG):
                raise ValueError(f"media_id {media_id}: misplaced IHDR")
            ihdr = data
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            ended = True
            break
        pos += 12 + length
    if ihdr is None or not ended:
        raise ValueError(f"media_id {media_id}: PNG missing IHDR or IEND")
    if len(ihdr) != 13:
        raise ValueError(f"media_id {media_id}: IHDR length {len(ihdr)} != 13")
    w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", ihdr)
    if (depth, ctype, comp, filt, inter) != (8, 0, 0, 0, 0):
        raise ValueError(
            f"media_id {media_id}: expected 8-bit grayscale non-interlaced "
            f"PNG, got depth={depth} color={ctype} comp={comp} "
            f"filter={filt} interlace={inter}"
        )
    if w <= 0 or h <= 0:
        raise ValueError(f"media_id {media_id}: bad PNG dimensions {w}x{h}")
    try:
        stream = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"media_id {media_id}: PNG inflate failed: {e}") from e
    if len(stream) != h * (w + 1):
        raise ValueError(
            f"media_id {media_id}: PNG scanline stream {len(stream)} bytes "
            f"!= {h * (w + 1)}"
        )
    sl = np.frombuffer(stream, dtype=np.uint8).reshape(h, w + 1)
    filters, rows = sl[:, 0], sl[:, 1:].astype(np.int64)
    out = np.zeros((h, w), dtype=np.int64)
    for y in range(h):
        f, filt_row = int(filters[y]), rows[y]
        prev = out[y - 1] if y > 0 else np.zeros(w, dtype=np.int64)
        if f == 0:
            out[y] = filt_row
        elif f == 1:  # Sub: recon(x) = filt(x) + recon(x-1) → cumsum mod 256
            out[y] = np.cumsum(filt_row) % 256
        elif f == 2:  # Up
            out[y] = (filt_row + prev) % 256
        elif f == 3:  # Average: sequential in x (depends on recon left)
            left = 0
            for x in range(w):
                left = (filt_row[x] + (left + prev[x]) // 2) % 256
                out[y, x] = left
        elif f == 4:  # Paeth: sequential in x
            left = upleft = 0
            for x in range(w):
                up = int(prev[x])
                p = left + up - upleft
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - upleft)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else upleft)
                v = (int(filt_row[x]) + pred) % 256
                out[y, x] = v
                left, upleft = v, up
        else:
            raise ValueError(f"media_id {media_id}: unknown PNG filter {f}")
    return w, h, out.astype(np.uint8).tobytes()


# --- JPEG: the first LOSSY codec (r15 — stdlib struct + numpy) ---------------
#
# The fourth real container, and the first entropy-coded TRANSFORM codec:
# baseline JFIF grayscale (ITU T.81 SOF0) — 8x8 FDCT, quantization,
# zigzag, DC-differential + AC run-length Huffman coding with the Annex K
# standard luminance tables, byte-stuffed entropy stream. The decoder
# parses markers STRICTLY (SOI/APP0/DQT/SOF0/DHT/SOS/EOI), builds its
# Huffman tables FROM the file's DHT segments (never assumes Annex K),
# dequantizes with the file's DQT table, and inverts the DCT — so a
# corrupt marker, truncated segment, undecodable Huffman prefix, or
# trailing garbage each raises with the media_id, same strictness as the
# BMP/PNG/WAV parsers.
#
# JPEG is lossy BY DESIGN, which changes what the value oracle can pin:
# the fixture encoder uses an all-ones quantization table (a valid
# "quality 100" baseline JPEG), so the only loss is integer rounding of
# DCT coefficients — |err per coeff| <= 1/2, and the 2D IDCT's worst-case
# amplification is (1/4)*(sum_u |C(u)|)^2 = (1/4)*(1/sqrt(2)+7)^2 = 14.85,
# giving a PROVABLE per-pixel bound of 7.43 < JPEG_TOL = 8. The oracled
# key therefore certifies the exact structural decode (dims, pixel/block
# counts from the actual parse) plus the bounded-error DECISION
# (within_tol), while pixel-level fidelity is pinned by unit tests
# (flat images round-trip EXACTLY — DC-only blocks quantize without
# loss — and random images stay inside the proven bound).

_JPEG_TOL = 8  # provable bound: ceil((1/4) * (1/sqrt(2) + 7)^2 * 1/2) — see above

# zigzag scan order: position k in the scan reads row-major index
# _JPEG_ZIGZAG[k] of the 8x8 block (T.81 Figure 5)
_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)
# Annex K standard luminance Huffman tables (T.81 Tables K.3/K.5):
# BITS[i] = number of codes of length i+1; HUFFVAL in code order
_JPEG_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_JPEG_DC_VALS = tuple(range(12))
_JPEG_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_JPEG_AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)


def _jpeg_dct_matrix():
    """Orthonormal 8x8 DCT-II matrix M: forward F = M @ B @ M.T equals
    T.81's (1/4) C(u) C(v) sum-cos-cos; inverse is M.T @ F @ M."""
    import math

    import numpy as np

    m = np.zeros((8, 8))
    for u in range(8):
        c = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * c * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


def _huff_encode_table(bits, vals):
    """Canonical Huffman (T.81 C.2): {symbol: (code, length)}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode_table(bits, vals):
    """Canonical Huffman decode map: {(length, code): symbol}."""
    return {
        (ln, code): sym for sym, (code, ln) in _huff_encode_table(bits, vals).items()
    }


def _jpeg_bytes(pixels: bytes, width: int, height: int) -> bytes:
    """A genuine baseline-JFIF grayscale JPEG (stdlib struct + numpy):
    level shift, 8x8 FDCT, all-ones quantization (the lossless-but-for-
    rounding 'quality 100' table — see the module note on _JPEG_TOL),
    zigzag, DC-differential + AC run-length Huffman with the Annex K
    luminance tables, 0xFF byte stuffing. Edge-replicated padding for
    dims that are not multiples of 8 (the decoder crops). The lossy
    transform-coded sibling of ``_png_bytes``."""
    import struct

    import numpy as np

    if len(pixels) != width * height or width <= 0 or height <= 0:
        raise ValueError(
            f"pixel buffer {len(pixels)} != width*height {width}*{height}"
        )
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    ph, pw = (-height) % 8, (-width) % 8
    if ph or pw:
        arr = np.pad(arr, ((0, ph), (0, pw)), mode="edge")
    h8, w8 = arr.shape
    nby, nbx = h8 // 8, w8 // 8
    blocks = (
        arr.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).astype(np.float64) - 128.0
    )
    m = _jpeg_dct_matrix()
    coef = np.einsum("ux,ijxy,vy->ijuv", m, blocks, m)
    q = np.rint(coef).astype(np.int64).reshape(nby * nbx, 64)
    zz = q[:, list(_JPEG_ZIGZAG)]

    dc_tab = _huff_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_tab = _huff_encode_table(_JPEG_AC_BITS, _JPEG_AC_VALS)
    buf, acc, nbits = bytearray(), 0, 0

    def put(code: int, length: int) -> None:
        nonlocal acc, nbits
        acc = (acc << length) | (code & ((1 << length) - 1))
        nbits += length
        while nbits >= 8:
            b = (acc >> (nbits - 8)) & 0xFF
            buf.append(b)
            if b == 0xFF:  # byte stuffing: 0xFF in entropy data -> 0xFF 0x00
                buf.append(0x00)
            nbits -= 8
        acc &= (1 << nbits) - 1

    def put_dc(v: int) -> None:
        # category (size) + size bits; negatives use one's-complement bits
        s = v.bit_length() if v > 0 else (-v).bit_length()
        if s > 11:
            raise ValueError(f"JPEG dc coefficient {v} exceeds category 11")
        code, ln = dc_tab[s]
        put(code, ln)
        if s:
            put(v if v > 0 else v + (1 << s) - 1, s)

    prev_dc = 0
    for blk in zz:
        put_dc(int(blk[0]) - prev_dc)
        prev_dc = int(blk[0])
        run = 0
        last_nz = max((k for k in range(1, 64) if blk[k]), default=0)
        for k in range(1, last_nz + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tab[0xF0]  # ZRL: 16 zeros
                put(code, ln)
                run -= 16
            s = v.bit_length() if v > 0 else (-v).bit_length()
            if s > 10:
                raise ValueError(f"JPEG ac coefficient {v} exceeds category 10")
            code, ln = ac_tab[(run << 4) | s]
            put(code, ln)
            put(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            code, ln = ac_tab[0x00]  # EOB
            put(code, ln)
    if nbits:  # pad to byte boundary with 1-bits (T.81 F.1.2.3)
        put((1 << (8 - nbits)) - 1, 8 - nbits)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    qtab = bytes([0]) + bytes(1 for _ in range(64))  # Pq=0/Tq=0, all-ones zigzag
    # SOF0 carries the TRUE dims; the decoder re-derives the padded MCU
    # grid ((h+7)//8 blocks) and crops back, per T.81 A.2.1
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
    dht_ac = bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    jfif = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    return (
        b"\xff\xd8"  # SOI
        + seg(0xFFE0, jfif)  # APP0
        + seg(0xFFDB, qtab)  # DQT
        + seg(0xFFC0, sof0)  # SOF0 baseline
        + seg(0xFFC4, dht_dc)  # DHT DC
        + seg(0xFFC4, dht_ac)  # DHT AC
        + seg(0xFFDA, sos)  # SOS
        + bytes(buf)
        + b"\xff\xd9"  # EOI
    )


def _parse_jpeg(payload: bytes, media_id: object) -> tuple[int, int, bytes]:
    """Strict baseline-JFIF grayscale JPEG decode: marker walk (every
    table read FROM the file — DQT quantizers, DHT Huffman codes, SOF0
    dims), byte-unstuffed entropy decode (DC differential + AC
    run-length), dequantize, inverse DCT, level shift, clip, crop the
    8-multiple padding. Per-media ValueError on any malformed marker,
    undecodable prefix, wrong mode (only SOF0 / 8-bit / single-component
    / 1x1 sampling), or trailing garbage."""
    import struct

    import numpy as np

    def die(msg: str):
        raise ValueError(f"media_id {media_id}: {msg}")

    if payload[:2] != b"\xff\xd8":
        die("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}
    sof = None
    scan = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            die(f"expected marker at offset {pos}")
        marker = payload[pos + 1] if pos + 1 < len(payload) else None
        if marker is None:
            die("truncated marker")
        pos += 2
        if marker == 0xD9:  # EOI
            if pos != len(payload):
                die(f"{len(payload) - pos} trailing bytes after EOI")
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0xDD:
            die("restart markers / DRI unsupported (strict baseline scope)")
        if pos + 2 > len(payload):
            die(f"truncated segment header for marker 0x{marker:02x}")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            die(f"truncated segment body for marker 0x{marker:02x}")
        pos += seglen
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    die("only 8-bit DQT supported (baseline)")
                if off + 65 > len(body):
                    die("truncated DQT")
                qtables[tq] = list(body[off + 1 : off + 65])
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                if len(bits) != 16 or len(vals) != n:
                    die("truncated DHT")
                htables[(cls, tid)] = _huff_decode_table(bits, vals)
                off += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or ncomp != 1:
                die(f"expected 8-bit single-component SOF0, got prec={prec} ncomp={ncomp}")
            cid, samp, tq = body[6], body[7], body[8]
            if samp != 0x11:
                die(f"expected 1x1 sampling, got 0x{samp:02x}")
            sof = (h, w, cid, tq)
        elif 0xC1 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            die(f"unsupported SOF mode 0x{marker:02x} (baseline SOF0 only)")
        elif marker == 0xDA:  # SOS: entropy data follows the header
            if sof is None:
                die("SOS before SOF0")
            ns = body[0]
            if ns != 1:
                die(f"expected single-component scan, got {ns}")
            dc_id, ac_id = body[2] >> 4, body[2] & 0xF
            # entropy data: everything up to the next non-stuffed marker
            end = pos
            while end + 1 < len(payload) and not (
                payload[end] == 0xFF and payload[end + 1] != 0x00
            ):
                end += 1
            if end + 1 >= len(payload):
                die("entropy stream missing terminating marker")
            scan = (dc_id, ac_id, payload[pos:end])
            pos = end
        # APP0/COM and other APPn segments: parsed length-wise, ignored
    if sof is None or scan is None:
        die("missing SOF0 or SOS")
    h, w, _cid, tq = sof
    if tq not in qtables:
        die(f"SOF0 references missing quant table {tq}")
    dc_id, ac_id, data = scan
    if (0, dc_id) not in htables or (1, ac_id) not in htables:
        die("SOS references missing Huffman table")
    dc_tab, ac_tab = htables[(0, dc_id)], htables[(1, ac_id)]

    # unstuff 0xFF 0x00 -> 0xFF
    data = data.replace(b"\xff\x00", b"\xff")
    acc, nbits, dpos = 0, 0, 0

    def read_bits(k: int) -> int:
        nonlocal acc, nbits, dpos
        while nbits < k:
            if dpos >= len(data):
                die("entropy stream exhausted mid-block")
            acc = (acc << 8) | data[dpos]
            dpos += 1
            nbits += 8
        nbits -= k
        v = (acc >> nbits) & ((1 << k) - 1)
        acc &= (1 << nbits) - 1
        return v

    def read_symbol(tab: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | read_bits(1)
            sym = tab.get((ln, code))
            if sym is not None:
                return sym
        die("undecodable Huffman prefix in entropy stream")

    def extend(v: int, s: int) -> int:
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    nby, nbx = (h + 7) // 8, (w + 7) // 8
    zz = np.zeros((nby * nbx, 64), dtype=np.int64)
    prev_dc = 0
    for bi in range(nby * nbx):
        s = read_symbol(dc_tab)
        diff = extend(read_bits(s), s) if s else 0
        prev_dc += diff
        zz[bi, 0] = prev_dc
        k = 1
        while k < 64:
            rs = read_symbol(ac_tab)
            run, size = rs >> 4, rs & 0xF
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += run
            if k > 63:
                die("AC run overruns block")
            zz[bi, k] = extend(read_bits(size), size)
            k += 1

    qvec = np.array(qtables[tq], dtype=np.int64)  # zigzag order, like the file
    deq = np.zeros((nby * nbx, 64), dtype=np.float64)
    deq[:, list(_JPEG_ZIGZAG)] = (zz * qvec).astype(np.float64)
    blocks = deq.reshape(nby, nbx, 8, 8)
    m = _jpeg_dct_matrix()
    out = np.einsum("xu,ijuv,yv->ijxy", m.T, blocks, m.T) + 128.0
    img = (
        np.clip(np.rint(out), 0, 255)
        .astype(np.uint8)
        .transpose(0, 2, 1, 3)
        .reshape(nby * 8, nbx * 8)
    )
    return w, h, img[:h, :w].tobytes()


def _parse_image(payload: bytes, media_id: object) -> tuple[int, int, bytes]:
    """Container dispatch for the image decode seam: PNG by signature,
    BMP and JPEG by magic. Every downstream image consumer (decode
    stats, resize, phash, gradient energy) parses through here, so a new
    container only needs a parser and an entry in this dispatch."""
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return _parse_png(payload, media_id)
    if payload[:2] == b"BM":
        return _parse_bmp(payload, media_id)
    if payload[:2] == b"\xff\xd8":
        return _parse_jpeg(payload, media_id)
    raise ValueError(
        f"media_id {media_id}: unknown image container "
        f"(first bytes {bytes(payload[:8])!r})"
    )


def bmp_media_table(documents: DataFrame) -> DataFrame:
    """The image half of ``media_table`` with a REAL BMP payload: each
    image doc's utf-8 text bytes, tiled to width*height pixels, become a
    genuine 8-bit grayscale BMP built executor-side (Arrow-batched pandas
    UDF, stdlib ``struct``). The image twin of ``wav_media_table`` — the
    decode leg then exercises an actual container parse (header fields +
    padded bottom-up rows), not byte slicing."""

    @pandas_udf("binary")
    def bmp_encode(text: pd.Series, width: pd.Series, height: pd.Series) -> pd.Series:
        def enc(t: str | None, w: int, h: int) -> bytes:
            b = (t or "").encode("utf-8")
            if not b:
                raise ValueError("empty payload: cannot tile zero bytes to pixels")
            n = w * h
            return _bmp_bytes((b * (n // len(b) + 1))[:n], w, h)

        return pd.Series(
            [enc(t, int(w), int(h)) for t, w, h in zip(text, width, height)]
        )

    img = documents.filter(F.col("doc_id") % 2 == 0)
    w = ((F.col("doc_id") % 8 + 1) * 64).cast("int")
    h = ((F.col("doc_id") % 4 + 1) * 64).cast("int")
    return img.select(
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


def png_media_table(documents: DataFrame) -> DataFrame:
    """The PNG twin of ``bmp_media_table``: the SAME doc subset, pixel
    tiling, and dimensions, but packed into a compressed container
    (``_png_bytes``) — so every image consumer, and the value-level
    decode-stats oracle, can run unchanged against either container,
    and PNG-vs-BMP pixel parity is testable asset-for-asset."""

    @pandas_udf("binary")
    def png_encode(text: pd.Series, width: pd.Series, height: pd.Series) -> pd.Series:
        def enc(t: str | None, w: int, h: int) -> bytes:
            b = (t or "").encode("utf-8")
            if not b:
                raise ValueError("empty payload: cannot tile zero bytes to pixels")
            n = w * h
            return _png_bytes((b * (n // len(b) + 1))[:n], w, h)

        return pd.Series(
            [enc(t, int(w), int(h)) for t, w, h in zip(text, width, height)]
        )

    img = documents.filter(F.col("doc_id") % 2 == 0)
    w = ((F.col("doc_id") % 8 + 1) * 64).cast("int")
    h = ((F.col("doc_id") % 4 + 1) * 64).cast("int")
    return img.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        png_encode("text", w, h).alias("payload"),
        F.struct(
            w.alias("width"),
            h.alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


# JPEG fixture dims are a quarter of the BMP/PNG tables' (max 128x64,
# not 512x256): entropy decode of a transform codec is the one
# genuinely bit-serial stage in the repo — the pure-Python Huffman walk
# costs ~1 symbol per nonzero coefficient, and text-tiled pixels keep
# most of the 63 ACs nonzero — so the fixture is sized to keep a full
# decode pass in seconds. A production deployment swaps libjpeg/PIL
# behind the same ``_parse_image`` seam for the 100 TB path.
_JPEG_DIM_SCALE = 16


def jpeg_media_table(documents: DataFrame, keep_text: bool = False) -> DataFrame:
    """The JPEG (lossy) sibling of ``bmp_media_table``/``png_media_table``:
    same doc subset and pixel tiling, quarter-scale dims (see
    ``_JPEG_DIM_SCALE``), packed as baseline-JFIF grayscale via
    ``_jpeg_bytes``. ``keep_text=True`` carries the source text through
    so a fidelity consumer can recompute the pre-encode ground-truth tile
    without a second join against documents."""

    @pandas_udf("binary")
    def jpeg_encode(text: pd.Series, width: pd.Series, height: pd.Series) -> pd.Series:
        def enc(t: str | None, w: int, h: int) -> bytes:
            b = (t or "").encode("utf-8")
            if not b:
                raise ValueError("empty payload: cannot tile zero bytes to pixels")
            n = w * h
            return _jpeg_bytes((b * (n // len(b) + 1))[:n], w, h)

        return pd.Series(
            [enc(t, int(w), int(h)) for t, w, h in zip(text, width, height)]
        )

    img = documents.filter(F.col("doc_id") % 2 == 0)
    w = ((F.col("doc_id") % 8 + 1) * _JPEG_DIM_SCALE).cast("int")
    h = ((F.col("doc_id") % 4 + 1) * _JPEG_DIM_SCALE).cast("int")
    cols = [
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        jpeg_encode("text", w, h).alias("payload"),
        F.struct(
            w.alias("width"),
            h.alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    ]
    if keep_text:
        cols.append(F.col("text"))
    return img.select(*cols)


JPEG_STATS_SCHEMA = (
    "media_id bigint, width int, height int, n_pixels bigint, "
    "n_blocks int, within_tol boolean"
)


def jpeg_fidelity_stats(media_with_text: DataFrame) -> DataFrame:
    """mapInPandas decode of REAL baseline-JFIF payloads → per-asset
    structural stats plus the bounded-error DECISION.

    JPEG is lossy, so unlike the BMP/PNG keys the decoded pixel_sum is
    not SQL-derivable; what IS exact and oracle-checkable: width/height
    (from the SOF0 parse), n_pixels (length of the actually-decoded
    array), n_blocks (the decoded MCU grid), and ``within_tol`` — max
    |decoded - pre-encode tile| <= _JPEG_TOL, where the tile is
    recomputed from the carried source text and the bound is PROVABLE
    for the all-ones quant table (see the codec note). Map-only; the
    compressed payloads never shuffle."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                w, h, px = _parse_jpeg(bytes(r["payload"]), r["media_id"])
                b = (r["text"] or "").encode("utf-8")
                n = w * h
                truth = np.frombuffer((b * (n // len(b) + 1))[:n], dtype=np.uint8)
                got = np.frombuffer(px, dtype=np.uint8)
                err = int(np.abs(truth.astype(np.int64) - got.astype(np.int64)).max())
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "width": w,
                        "height": h,
                        "n_pixels": len(px),
                        "n_blocks": ((w + 7) // 8) * ((h + 7) // 8),
                        "within_tol": err <= _JPEG_TOL,
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "n_pixels", "n_blocks", "within_tol"
            ])

    return media_with_text.mapInPandas(fn, JPEG_STATS_SCHEMA)


def decode_images(media: DataFrame) -> DataFrame:
    """mapInPandas decode: image rows with REAL BMP payloads → per-asset
    pixel stats.

    r13: a genuine decode — ``_parse_bmp`` reads width/height from the
    BITMAPINFOHEADER and reassembles the pixel array from the padded
    bottom-up rows; the emitted ``width``/``height``/``n_pixels``/
    ``pixel_sum`` all come FROM the parse, so the value-level oracle
    (which derives them from doc_id + fixture text) certifies the full
    encode→BMP→decode round trip. Batch shape: one Arrow batch in, one
    out; payload bytes never leave the executor.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img = pdf[pdf["kind"] == "image"]
            rows = []
            for _, r in img.iterrows():
                w, h, px = _parse_image(bytes(r["payload"]), r["media_id"])
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "width": w,
                        "height": h,
                        "n_pixels": len(px),
                        "pixel_sum": sum(px),
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "width", "height", "n_pixels", "pixel_sum"
            ])

    decoded = media.mapInPandas(fn, DECODED_SCHEMA)
    mean = F.when(F.col("n_pixels") == 0, F.lit(0.0)).otherwise(
        F.col("pixel_sum").cast("double") / F.col("n_pixels").cast("double")
    )
    return decoded.withColumn("mean_byte", mean).drop("pixel_sum")


AUDIO_FRAME_BYTES = 160  # 10 ms at 16 kHz 8-bit mono — one frame of samples

WAV_SAMPLE_RATE = 16000

AUDIO_FRAMES_SCHEMA = (
    "media_id bigint, sample_rate int, n_samples bigint, "
    "frame_idx int, n_bytes int, byte_sum bigint, sq_sum bigint"
)


def _wav_bytes(samples: bytes, sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """A genuine RIFF/WAVE container (stdlib ``wave``): 8-bit unsigned PCM,
    mono, ``sample_rate`` Hz, one sample per input byte. Used to build the
    fixture WAVs that the decode path parses back — no audio libs needed,
    and both sides are the REAL formats (44-byte RIFF header + data chunk),
    not a stand-in."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(sample_rate)
        w.writeframes(samples)
    return buf.getvalue()


def wav_media_table(documents: DataFrame) -> DataFrame:
    """The audio half of ``media_table`` with a REAL WAV payload: each
    audio doc's utf-8 text bytes become the PCM samples of a genuine
    RIFF/WAVE file (built executor-side via an Arrow-batched pandas UDF —
    stdlib ``wave``, zero extra dependencies). This is the fixture-WAV
    flow: payloads are real containers a soundfile tool would open, so
    the decode leg exercises an actual codec path, not byte slicing."""

    @pandas_udf("binary")
    def wav_encode(text: pd.Series) -> pd.Series:
        return text.map(
            lambda t: _wav_bytes(t.encode("utf-8")) if t is not None else _wav_bytes(b"")
        )

    aud = documents.filter(F.col("doc_id") % 2 != 0)
    return aud.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        wav_encode("text").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(WAV_SAMPLE_RATE).cast("int").alias("sample_rate"),
            (F.col("n_chars") * 10).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def frame_audio(media: DataFrame) -> DataFrame:
    """mapInPandas audio decode + framing: audio rows with REAL WAV
    payloads → per-frame integer stats.

    r12: this is a genuine decode, not the byte-slicing stub it replaced —
    ``wave.open`` parses the RIFF header (fmt chunk: channels, sample
    width, rate; data chunk length) and ``readframes`` yields the PCM
    stream, which is then cut into 160-sample (10 ms) frames. The emitted
    ``sample_rate``/``n_samples`` columns come FROM the parsed header, so
    the value-level oracle (which derives them from the fixture text)
    certifies the full encode→RIFF→decode round trip. Since r13 the image
    leg is a real decode too (stdlib BMP — see ``_parse_bmp``). Like
    decode_images, the UDF emits INTEGER stats only; per-frame RMS is a
    SQL division + sqrt outside the UDF (IEEE-correctly-rounded → bit-
    identical cross-engine). Map-only: payload bytes never shuffle.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            aud = pdf[pdf["kind"] == "audio"]
            rows = []
            for _, r in aud.iterrows():
                with wave.open(io.BytesIO(bytes(r["payload"]))) as w:
                    if w.getnchannels() != 1 or w.getsampwidth() != 1:
                        raise ValueError(
                            f"media_id {r['media_id']}: expected 8-bit mono PCM, "
                            f"got {w.getnchannels()}ch sampwidth={w.getsampwidth()}"
                        )
                    rate = w.getframerate()
                    n_samples = w.getnframes()
                    pcm = w.readframes(n_samples)
                n_frames = (len(pcm) + AUDIO_FRAME_BYTES - 1) // AUDIO_FRAME_BYTES
                for fi in range(n_frames):
                    fr = pcm[fi * AUDIO_FRAME_BYTES : (fi + 1) * AUDIO_FRAME_BYTES]
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "sample_rate": rate,
                            "n_samples": n_samples,
                            "frame_idx": fi,
                            "n_bytes": len(fr),
                            "byte_sum": sum(fr),
                            "sq_sum": sum(x * x for x in fr),
                        }
                    )
            yield pd.DataFrame(rows, columns=[
                "media_id", "sample_rate", "n_samples",
                "frame_idx", "n_bytes", "byte_sum", "sq_sum",
            ])

    framed = media.mapInPandas(fn, AUDIO_FRAMES_SCHEMA)
    rms = F.sqrt(F.col("sq_sum").cast("double") / F.col("n_bytes").cast("double"))
    return framed.withColumn("rms", rms)


def frame_sample(media: DataFrame, every_n: int = 1000) -> DataFrame:
    """Audio/video frame sampling plan: sampled frame indices per asset
    (sequence + explode). This op is the INDEX plan only — the real
    per-frame decode lives in ``frame_audio`` (RIFF/WAVE parse →
    per-frame PCM stats), which a caller joins against these indices;
    since r12/r13 no modality decode in this module is stubbed."""
    audio = media.filter(F.col("kind") == "audio")
    idx = F.sequence(
        F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n)
    )
    return audio.select(
        "media_id", F.explode(idx).alias("frame_idx")
    )


RESIZE_TARGET = 64  # fit the long edge into a 64-px box, aspect preserved

RESIZED_SCHEMA = (
    "media_id bigint, width int, height int, out_w int, out_h int, "
    "stride int, sample_sum bigint"
)


def resize_images(media: DataFrame) -> DataFrame:
    """mapInPandas resize: image rows with REAL BMP payloads → target
    dimensions + a strided pixel-resample checksum.

    r13: a genuine decode — width/height come from the parsed
    BITMAPINFOHEADER and the resample strides over the DECODED pixel
    array (padding stripped, rows re-ordered top-down), not the raw
    container bytes. The aspect-preserving output box is integer floor
    math mirrored exactly in the SQL twin, so the parse, the per-asset
    loop, and the integer plumbing are all value-gated. A production
    build swaps the strided nearest-neighbor stand-in for a real
    interpolation kernel behind the same signature. Map-only: payload
    bytes never shuffle.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img = pdf[pdf["kind"] == "image"]
            rows = []
            for _, r in img.iterrows():
                w, h, px = _parse_image(bytes(r["payload"]), r["media_id"])
                long_edge = max(w, h, 1)
                out_w = max(1, (w * RESIZE_TARGET) // long_edge)
                out_h = max(1, (h * RESIZE_TARGET) // long_edge)
                stride = max(1, len(px) // (out_w * out_h))
                sample_sum = sum(px[::stride]) if px else 0
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "width": w,
                        "height": h,
                        "out_w": out_w,
                        "out_h": out_h,
                        "stride": stride,
                        "sample_sum": sample_sum,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "out_w", "out_h",
                    "stride", "sample_sum",
                ],
            )

    return media.mapInPandas(fn, RESIZED_SCHEMA)


PHASH_BITS = 60  # aHash grid: strided samples of the decoded pixels.
# 60 bits (not 32): a narrow perceptual hash saturates as the corpus
# grows — birthday collisions make pair mass superlinear regardless of
# banding (measured 0.94 at the 10x leg with 32 bits before widening);
# production pHash/aHash systems use 64+ bits for exactly this reason.
# 60 = 4 bands x 15 bits for the near-dup join.


def phash_images(media: DataFrame) -> DataFrame:
    """Median-hash perceptual fingerprint over REALLY-decoded BMP
    pixels: ``PHASH_BITS`` evenly-strided samples of the decoded pixel
    array, each bit set iff its sample exceeds the sample MEDIAN (the
    upper median of the sorted samples — integer-exact, no division).
    Median, not mean: mean-thresholded bits are BIASED on real byte
    distributions (this corpus: letters sit above, digits/spaces far
    below the mean -> p(bit)~0.9), which concentrates pairwise Hamming
    distances near 2*B*p*(1-p) and makes near-threshold pair mass grow
    quadratically with the corpus; the median balances every bit to
    p=1/2, pushing random pairs to distance ~B/2 and leaving only true
    perceptual structure below the threshold — the same reason
    dHash/pHash beat plain aHash in production. The image analogue of
    ``dedup_simhash``, enabled by the r13 real decode: width/height/
    pixels all come from the container parse. Map-only: one Arrow batch
    in/out, payload never leaves the executor.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img = pdf[pdf["kind"] == "image"]
            rows = []
            for _, r in img.iterrows():
                w, h, px = _parse_image(bytes(r["payload"]), r["media_id"])
                n = len(px)
                if n < PHASH_BITS:
                    raise ValueError(
                        f"media_id {r['media_id']}: {n} pixels < {PHASH_BITS} "
                        "phash samples"
                    )
                stride = n // PHASH_BITS
                s = [px[k * stride] for k in range(PHASH_BITS)]
                med = sorted(s)[PHASH_BITS // 2]  # upper median
                phash = sum(1 << k for k in range(PHASH_BITS) if s[k] > med)
                rows.append({"media_id": r["media_id"], "phash": phash})
            yield pd.DataFrame(rows, columns=["media_id", "phash"])

    return media.mapInPandas(fn, "media_id bigint, phash bigint")


GRADIENT_SCHEMA = (
    "media_id bigint, width int, height int, n_pairs bigint, grad_sum bigint"
)


def gradient_energy(media: DataFrame) -> DataFrame:
    """mapInPandas: image rows → horizontal total-variation energy.

    The second downstream consumer of the REAL BMP decode (the image
    twin of ``media_wav_silence_runs``'s role for audio): per image,
    the sum of |p[y][x+1] − p[y][x]| over every within-row neighbor
    pair of the PARSED pixel array — the classic total-variation
    sharpness/texture proxy a multimodal curation pipeline uses to
    drop blurred/flat assets. Vectorized numpy over the decoded
    buffer; integer output so the value-level oracle is exact.
    """
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            img = pdf[pdf["kind"] == "image"]
            rows = []
            for _, r in img.iterrows():
                w, h, px = _parse_image(bytes(r["payload"]), r["media_id"])
                arr = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
                grad = int(np.abs(np.diff(arr.reshape(h, w), axis=1)).sum())
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "width": w,
                        "height": h,
                        "n_pairs": (w - 1) * h,
                        "grad_sum": grad,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_pairs", "grad_sum"]
            )

    return media.mapInPandas(fn, GRADIENT_SCHEMA)
