"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Decoding is pluggable (see the decoder contract below). THREE real
decoders ship built-in, all stdlib+numpy with no codec libraries:
`ppm_decode` (binary PPM P6 — header tokenization, raw pixel demux,
channel/quadrant statistics), `png_decode` (chunk/CRC parse, inflate,
all five scanline filter reconstructions), and `wav_decode` (RIFF/WAVE
PCM — word-aligned chunk walk, fmt validation, int16 demux,
integer-exact audio statistics) — so image AND audio decode paths are
genuinely exercised end-to-end. Other compressed formats (JPEG, video)
still need external codecs and register through the same contract; the
deterministic `fake_decode` remains for plumbing tests.

At scale: binary payloads ride in their own column so column pruning
keeps them out of metadata-only queries; `repartition` by size budget
before decode bounds per-task memory; Arrow batch size is capped via
spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("payload", BinaryType()),    # opaque encoded bytes
        StructField("mime", StringType()),
        StructField("width", IntegerType()),     # typed metadata (nullable)
        StructField("height", IntegerType()),
        StructField("duration_s", DoubleType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sha256", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/benches: payload bytes
    derived from the id."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media:{i}".encode()).digest() * (1 + i % 4)
        rows.append((i, ["image", "audio", "video"][i % 3], bytearray(payload),
                     "application/octet-stream", 64 + i % 32, 48 + i % 32, float(i % 30)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# -- decoder contract ---------------------------------------------------------
#
# Decoding is the ONLY step that needs codec libraries, so it is a
# plug-in: a decoder is a plain picklable callable `bytes -> list[float]`
# registered per media kind. The Spark-side plumbing (schema, Arrow
# batching, mapInPandas signature, partition shape) is identical for
# every decoder; a deployment with PIL/torchvision/ffmpeg installs its
# real decoders at startup:
#
#     from PIL import Image; import io
#     def pil_decode(b):
#         im = Image.open(io.BytesIO(b)).convert("L").resize((8, 1))
#         return [p / 255.0 for p in im.getdata()]
#     multimodal.register_decoder("image", pil_decode)
#
# The callable must be importable/picklable (it ships to executors
# inside the mapInPandas closure). The built-in "fake" decoder is a
# deterministic sha256-derived 8-dim vector so tests and the oracle
# exercise the full distributed path without codecs.

def fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in decoder: 8 dims from the payload sha256."""
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:8]]


# -- real PPM (P6) decode ------------------------------------------------------

def make_ppm(width: int, height: int, pixels: "np.ndarray") -> bytes:
    """Encode an (h, w, 3) uint8 array as a binary PPM (P6) image."""
    if pixels.shape != (height, width, 3):
        raise ValueError(f"pixels must be ({height}, {width}, 3), got {pixels.shape}")
    return f"P6\n{width} {height}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def _ppm_parse(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """Shared PPM (P6) header parser + pixel-plane extraction: magic,
    whitespace/`#`-comment tokenization, width/height/maxval, the
    single-whitespace byte after maxval, and the truncated-payload
    check. Returns (w, h, uint8 pixel array of shape (h, w, 3)).
    ppm_decode and ppm_pool_grid both consume this so a header-contract
    fix (e.g. two-byte samples for maxval > 255) can never diverge the
    two decoders."""
    tokens: list[bytes] = []
    i = 0
    while len(tokens) < 4 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    if len(tokens) < 4 or tokens[0] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    i += 1  # single whitespace byte after maxval
    raw = payload[i : i + w * h * 3]
    if len(raw) != w * h * 3:
        raise ValueError(f"truncated PPM: want {w * h * 3} pixel bytes, got {len(raw)}")
    return w, h, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def ppm_decode(payload: bytes) -> list[float]:
    """REAL image decode for binary PPM (P6) — numpy only, no codec
    libraries. Parses the header (magic, whitespace/`#`-comment
    tokenization, width/height/maxval), demuxes the raw RGB plane, and
    returns an 8-dim feature vector in [0, 1]:

        [mean_r, mean_g, mean_b, mean_gray,
         q00, q01, q10, q11]   (gray means of the four image quadrants)

    Gray is the channel SUM (0..765) normalized by 765, not the /3
    average: every intermediate is then an integer-valued double, so
    the statistics are bit-identical across engines and the DuckDB
    oracle can recompute them exactly from the generative pixel
    formula. Quadrant split: rows < h//2 are the top half, cols < w//2
    the left half (remainder rows/cols fall in the bottom/right
    quadrants). Raises ValueError on a bad magic, truncated pixel
    data, or an unsupported maxval — a decode error MUST surface, not
    produce junk features.
    """
    w, h, px8 = _ppm_parse(payload)
    if w < 2 or h < 2:
        # the quadrant features need both halves non-empty; an empty
        # slice would silently yield NaN features, and a decode error
        # must surface instead of producing junk
        raise ValueError(f"image too small for quadrant features: {w}x{h}")
    px = px8.astype(np.float64)
    gray = px.sum(axis=2)  # 0..765, integer-valued
    hh, wh = h // 2, w // 2
    return [
        px[:, :, 0].mean() / 255.0,
        px[:, :, 1].mean() / 255.0,
        px[:, :, 2].mean() / 255.0,
        gray.mean() / 765.0,
        gray[:hh, :wh].mean() / 765.0,
        gray[:hh, wh:].mean() / 765.0,
        gray[hh:, :wh].mean() / 765.0,
        gray[hh:, wh:].mean() / 765.0,
    ]


# -- real PNG decode (stdlib zlib + numpy, no codec libraries) -----------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def make_png(
    width: int,
    height: int,
    pixels: "np.ndarray",
    filter_mode: str = "cycle",
) -> bytes:
    """Encode an (h, w, 3) uint8 array as an 8-bit truecolor PNG using
    only stdlib zlib (deflate + crc32). `filter_mode="cycle"` applies
    filter type row % 5 (None/Sub/Up/Average/Paeth in turn) so a decode
    of the produced file exercises every unfilter path; "none" writes
    filter 0 throughout."""
    import struct
    import zlib

    if pixels.shape != (height, width, 3):
        raise ValueError(f"pixels must be ({height}, {width}, 3), got {pixels.shape}")
    px = pixels.astype(np.int64)
    bpp = 3
    raw_rows = px.reshape(height, width * bpp)
    prior = np.zeros(width * bpp, dtype=np.int64)
    out_rows = []
    for r in range(height):
        row = raw_rows[r]
        ftype = (r % 5) if filter_mode == "cycle" else 0
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int64), prior[:-bpp]])
        if ftype == 0:
            filt = row
        elif ftype == 1:
            filt = row - left
        elif ftype == 2:
            filt = row - prior
        elif ftype == 3:
            filt = row - (left + prior) // 2
        else:
            p = left + prior - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, upleft)
            )
            filt = row - pred
        out_rows.append(bytes([ftype]) + (filt % 256).astype(np.uint8).tobytes())
        prior = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(out_rows))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def png_decode(payload: bytes) -> list[float]:
    """REAL image decode for PNG — stdlib zlib + numpy, no codec
    libraries. Parses the chunk stream (IHDR/IDAT/IEND, CRC-checked),
    inflates the concatenated IDAT deflate stream, reverses all five
    scanline filters (None/Sub/Up/Average/Paeth), and returns the same
    8-dim feature contract as ppm_decode:

        [mean_r, mean_g, mean_b, mean_gray,
         q00, q01, q10, q11]   (gray = integer channel sum / 765)

    Supported: 8-bit depth, color types 0 (grayscale, replicated to
    RGB), 2 (truecolor), 6 (truecolor+alpha, alpha dropped),
    non-interlaced. Anything else raises — a decode error MUST
    surface, not produce junk features."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    i = 8
    ihdr = None
    idat = bytearray()
    while i + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[i : i + 4])
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + length]
        if len(data) != length or len(payload) < i + 12 + length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", payload[i + 8 + length : i + 12 + length])
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        i += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or color not in (0, 2, 6) or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG shape: depth={depth} color={color} "
            f"interlace={interlace} (8-bit color 0/2/6 non-interlaced only)"
        )
    if w < 2 or h < 2:
        raise ValueError(f"image too small for quadrant features: {w}x{h}")
    ch = {0: 1, 2: 3, 6: 4}[color]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG pixel data: want {h * (stride + 1)} bytes, got {len(raw)}"
        )
    recon = np.zeros((h, stride), dtype=np.int64)
    for r in range(h):
        line = raw[r * (stride + 1) : (r + 1) * (stride + 1)]
        ftype, row = line[0], np.frombuffer(line[1:], dtype=np.uint8).astype(np.int64)
        prior = recon[r - 1] if r > 0 else np.zeros(stride, dtype=np.int64)
        if ftype == 0:
            recon[r] = row
        elif ftype == 2:
            recon[r] = (row + prior) % 256
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth need the RECONSTRUCTED left neighbor —
            # sequential in x by definition; rows stay numpy, the x loop
            # is bounded by the row byte count
            cur = recon[r]
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + prior[x]) // 2
                else:
                    c = prior[x - ch] if x >= ch else 0
                    pred = _paeth(int(a), int(prior[x]), int(c))
                cur[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    px = recon.reshape(h, w, ch).astype(np.float64)
    if ch == 1:
        rgb = np.repeat(px, 3, axis=2)
    else:
        rgb = px[:, :, :3]
    gray = rgb.sum(axis=2)
    hh, wh = h // 2, w // 2
    return [
        rgb[:, :, 0].mean() / 255.0,
        rgb[:, :, 1].mean() / 255.0,
        rgb[:, :, 2].mean() / 255.0,
        gray.mean() / 765.0,
        gray[:hh, :wh].mean() / 765.0,
        gray[:hh, wh:].mean() / 765.0,
        gray[hh:, :wh].mean() / 765.0,
        gray[hh:, wh:].mean() / 765.0,
    ]


def make_wav(sample_rate: int, samples: "np.ndarray") -> bytes:
    """Encode mono 16-bit PCM as a canonical RIFF/WAVE byte stream
    (RIFF header, fmt chunk, data chunk) — stdlib struct only."""
    import struct

    if samples.size and (samples.max() > 32767 or samples.min() < -32768):
        raise ValueError("samples out of int16 range")
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> list[float]:
    """REAL audio decode for RIFF/WAVE PCM — stdlib struct + numpy, no
    audio libraries. Walks the RIFF chunk stream (word-aligned, so odd
    chunks' pad bytes are honored), validates the fmt chunk (PCM, mono,
    16-bit — anything else raises; a decode error MUST surface, not
    produce junk features), demuxes the little-endian int16 samples,
    and returns an 8-dim feature vector of integer-exact statistics:

        [n_samples, sample_rate, mean, peak_max, peak_min,
         zero_crossings, mean_abs, energy_per_sample]

    Every numerator is an exact int64 sum converted once to double and
    divided once — bit-identical across engines, which is what lets
    the catalog query pin the decode against an analytic DuckDB oracle
    the way the PPM/PNG codecs are pinned."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (declared,) = struct.unpack("<I", payload[4:8])
    if declared != len(payload) - 8:
        raise ValueError(
            f"RIFF size mismatch: declared {declared}, have {len(payload) - 8}"
        )
    i, fmt, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (ln,) = struct.unpack("<I", payload[i + 4 : i + 8])
        chunk = payload[i + 8 : i + 8 + ln]
        if len(chunk) != ln:
            raise ValueError(f"truncated WAVE chunk {cid!r}")
        if cid == b"fmt ":
            if fmt is not None:
                raise ValueError("duplicate fmt chunk")
            fmt = chunk
        elif cid == b"data":
            if data is not None:
                raise ValueError("duplicate data chunk")
            data = chunk
        i += 8 + ln + (ln & 1)  # RIFF chunks are word-aligned
    if i != len(payload):
        # a sub-8-byte tail inside the declared RIFF size is malformed,
        # not skippable — junk must surface, never be silently ignored
        raise ValueError(f"{len(payload) - i} trailing bytes after last chunk")
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt or data chunk")
    if len(fmt) < 16:
        raise ValueError("fmt chunk too short")
    audio_fmt, channels, rate, _brate, _block, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_fmt != 1 or channels != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAVE shape: fmt={audio_fmt} channels={channels} "
            f"bits={bits} (PCM mono 16-bit only)"
        )
    if len(data) % 2:
        raise ValueError("odd PCM data length for 16-bit samples")
    s = np.frombuffer(data, dtype="<i2").astype(np.int64)
    if s.size < 2:
        raise ValueError("too few samples for crossing features")
    n = s.size
    zc = int(np.count_nonzero(s[:-1] * s[1:] < 0))
    return [
        float(n),
        float(rate),
        float(s.sum()) / n,
        float(s.max()),
        float(s.min()),
        float(zc),
        float(np.abs(s).sum()) / n,
        float((s * s).sum()) / n,
    ]


def ppm_pool_grid(payload: bytes, grid_w: int = 9, grid_h: int = 8) -> list[float]:
    """Average-pool front half of the dHash perceptual hash: decode a
    binary PPM (same header contract as ppm_decode) and return the
    grid_h x grid_w block-SUM grayscale grid, row-major. Block sums of
    the integer channel-sum gray (0..765 per px) are integer-valued
    doubles, so the grid — and every dHash bit derived from it — is
    bit-identical across engines and recomputable by a SQL oracle from
    a closed-form pixel field. The image must tile exactly (w % grid_w
    == h % grid_h == 0): silent partial blocks would make the pooled
    values depend on remainder-handling conventions, the kind of
    ambiguity an oracle-pinned codec must refuse."""
    w, h, px8 = _ppm_parse(payload)
    if w % grid_w or h % grid_h:
        raise ValueError(
            f"image {w}x{h} does not tile into a {grid_w}x{grid_h} pool grid"
        )
    px = px8.astype(np.int64)
    gray = px.sum(axis=2)
    pooled = gray.reshape(grid_h, h // grid_h, grid_w, w // grid_w).sum(axis=(1, 3))
    return [float(v) for v in pooled.flatten()]


# -- JPEG (baseline sequential DCT, ITU-T T.81) --------------------------------
#
# The dominant crawl image format, through the same registry contract
# as PNG/PPM/WAV: a pure stdlib+numpy decoder (marker walk, canonical
# Huffman entropy decode with DC prediction and byte unstuffing,
# dequantization, inverse zigzag, float IDCT, level shift,
# floor(x+0.5) rounding, clamp; YCbCr -> RGB for 3-component scans,
# 4:4:4 or 4:2:0 with replication chroma upsampling) plus a fixture
# encoder that writes coefficient blocks directly, so the catalog
# oracle can recompute the decoded pixels from the closed-form IDCT
# of the analytic coefficient field.
# Rejects progressive (SOF2), arithmetic coding, sampling layouts
# other than 4:4:4/4:2:0, and restart intervals loudly —
# approximating any of those silently would make decoded stats
# depend on unimplemented reconstruction.

_JPEG_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]


def _jpeg_canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via T.81 Annex C canonical assignment:
    codes of length L are consecutive, starting from twice the
    successor of the last length-(L-1) code."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _jpeg_flat_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """(bits, vals) giving every symbol the same code length L, with
    2^L >= len(symbols) + 1 so the all-ones code stays unused (the
    padding-bits convention makes an all-ones codeword ambiguous at
    the end of the scan)."""
    L = 1
    while (1 << L) < len(symbols) + 1:
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(symbols)
    return bits, list(symbols)


class _JpegBitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self._acc, self._n = 0, 0

    def flush(self) -> None:
        while self._n:
            self.put(1, 1)  # pad with 1-bits per the spec


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """(category s, s-bit representation): negative values use the
    one's-complement-style form v + 2^s - 1."""
    s, a = 0, abs(v)
    while a:
        s += 1
        a >>= 1
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _make_jpeg(
    width: int, height: int, comp_blocks: list, subsample: bool = False
) -> bytes:
    """Baseline-sequential JPEG written directly from QUANTIZED
    coefficient blocks (comp_blocks[comp][by][bx] is an 8x8 int array
    in (row, col) frequency order; 1 component = grayscale, 3 =
    4:4:4 YCbCr interleaved), quant table all ones — the
    fixture-encoder analogue of make_png: because the coefficients
    are the ground truth, the decoded pixels are the closed-form IDCT
    the SQL oracle recomputes. Dimensions must be block-aligned (no
    edge-replication ambiguity in an oracle-pinned codec). One shared
    DC and one shared AC Huffman table cover every component's
    symbols (flat-length canonical codes, all-ones code unused).

    `subsample=True` writes 4:2:0 chroma (the dominant real-web
    encoding): Y sampled 2x2 per MCU (sampling byte 0x22), Cb/Cr one
    block per 16x16 MCU (0x11); comp_blocks[0] is then the full
    (h/8, w/8) Y grid while comp_blocks[1..2] are (h/16, w/16) chroma
    grids, and the scan interleaves Y00 Y01 Y10 Y11 Cb Cr per MCU
    (ITU-T T.81 A.2.3 left-to-right, top-to-bottom block order).
    Dimensions must be 16-aligned."""
    if width % 8 or height % 8:
        raise ValueError("oracle fixture JPEGs must be 8-aligned")
    nc = len(comp_blocks)
    if nc not in (1, 3):
        raise ValueError("1 (gray) or 3 (YCbCr) components only")
    by_n, bx_n = height // 8, width // 8
    if subsample:
        if nc != 3:
            raise ValueError("4:2:0 requires 3 components")
        if width % 16 or height % 16:
            raise ValueError("4:2:0 oracle fixtures must be 16-aligned")
        order = []
        for my in range(height // 16):
            for mx in range(width // 16):
                for v in range(2):
                    for u in range(2):
                        order.append((0, 2 * my + v, 2 * mx + u))
                order.append((1, my, mx))
                order.append((2, my, mx))
        samp = [0x22, 0x11, 0x11]
    else:
        order = [
            (ci, by, bx)
            for by in range(by_n)
            for bx in range(bx_n)
            for ci in range(nc)
        ]
        samp = [0x11] * nc
    # entropy-code the MCUs to learn which symbols the tables need
    dc_syms: set[int] = set()
    ac_syms: set[int] = {0x00}
    tokens = []  # per block: (dc_sym, dc_bits_val, [(ac_sym, val, s)...], eob)
    pred = [0] * nc
    for ci, by, bx in order:
        blk = comp_blocks[ci][by][bx]
        dc = int(blk[0][0])
        s, bitsv = _jpeg_magnitude(dc - pred[ci])
        pred[ci] = dc
        dc_syms.add(s)
        acs = []
        run = 0
        last_nonzero = 0
        seq = [int(blk[r][c]) for (r, c) in _JPEG_ZIGZAG]
        for i in range(63, 0, -1):
            if seq[i]:
                last_nonzero = i
                break
        for i in range(1, last_nonzero + 1):
            v = seq[i]
            if v == 0:
                run += 1
                if run == 16:
                    ac_syms.add(0xF0)  # ZRL
                    acs.append((0xF0, 0, 0))
                    run = 0
                continue
            vs, vb = _jpeg_magnitude(v)
            sym = (run << 4) | vs
            ac_syms.add(sym)
            acs.append((sym, vb, vs))
            run = 0
        tokens.append((s, bitsv, acs, last_nonzero < 63))
    dc_bits, dc_vals = _jpeg_flat_table(sorted(dc_syms))
    ac_bits, ac_vals = _jpeg_flat_table(sorted(ac_syms))
    dc_codes = _jpeg_canonical_codes(dc_bits, dc_vals)
    ac_codes = _jpeg_canonical_codes(ac_bits, ac_vals)
    w = _JpegBitWriter()
    for s, bitsv, acs, eob in tokens:
        c, ln = dc_codes[s]
        w.put(c, ln)
        if s:
            w.put(bitsv, s)
        for sym, vb, vs in acs:
            c, ln = ac_codes[sym]
            w.put(c, ln)
            if vs:
                w.put(vb, vs)
        if eob:
            c, ln = ac_codes[0x00]
            w.put(c, ln)
    w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT id 0, all ones
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, samp[ci], 0])
    out += seg(0xC0, sof)  # SOF0 baseline
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    out += seg(0xDA, sos + bytes([0, 63, 0]))
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def make_jpeg_gray(width: int, height: int, coef_blocks) -> bytes:
    """Grayscale fixture JPEG — see _make_jpeg."""
    return _make_jpeg(width, height, [coef_blocks])


def make_jpeg_color(width: int, height: int, y, cb, cr) -> bytes:
    """4:4:4 YCbCr fixture JPEG — see _make_jpeg."""
    return _make_jpeg(width, height, [y, cb, cr])


def make_jpeg_color_420(width: int, height: int, y, cb, cr) -> bytes:
    """4:2:0 chroma-subsampled YCbCr fixture JPEG — `y` is the full
    (h/8, w/8) block grid, `cb`/`cr` are (h/16, w/16) grids covering
    one chroma block per 16x16 MCU. See _make_jpeg(subsample=True)."""
    return _make_jpeg(width, height, [y, cb, cr], subsample=True)


class _JpegBitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.d[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:
                    raise ValueError(
                        f"marker 0xFF{nxt:02X} inside entropy-coded data "
                        "(restart intervals are not supported)"
                    )
            self._acc, self._n = b, 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _jpeg_decode_table(bits: list[int], vals: list[int]):
    """(code, length) -> symbol lookup for the canonical table."""
    return {cl: sym for sym, cl in _jpeg_canonical_codes(bits, vals).items()}


def _jpeg_read_symbol(r: _JpegBitReader, table: dict) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | r.bit()
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy-coded data")


def _jpeg_extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_idct_matrix() -> "np.ndarray":
    """M[x, u] = C(u) * cos((2x+1) u pi / 16) — the 1-D IDCT basis;
    f = 0.25 * M F' M' applied separably."""
    import math

    m = np.zeros((8, 8))
    for x in range(8):
        for u in range(8):
            cu = 1.0 / math.sqrt(2.0) if u == 0 else 1.0
            m[x, u] = cu * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return m


def jpeg_parse(payload: bytes) -> "np.ndarray":
    """Decode a baseline-sequential JPEG to an (H, W, C) uint8 array
    (C = 1 grayscale or 3 RGB via the YCbCr transform with
    floor(x+0.5) rounding). Sampling: 4:4:4 and 4:2:0 (Y 2x2 per
    16x16 MCU, chroma upsampled by SAMPLE REPLICATION — the one
    deterministic kernel an oracle-pinned decoder can define; T.81
    does not mandate an upsampling filter). Raises on
    progressive/arithmetic scans, other sampling layouts, restart
    intervals, and truncated streams — the registry's refuse-loudly
    contract."""
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, [(comp_id, qid)...])
    scan_comps = None
    while pos < len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = d[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC2, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                "only baseline sequential (SOF0) JPEG is supported; got "
                f"SOF marker 0x{marker:02X}"
            )
        ln = int.from_bytes(d[pos : pos + 2], "big")
        body = d[pos + 2 : pos + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                prec, qid = body[i] >> 4, body[i] & 0x0F
                if prec:
                    raise ValueError("16-bit quant tables not supported")
                qtables[qid] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htables[(cls, tid)] = _jpeg_decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0:
            if body[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for ci in range(ncomp):
                cid, samp, qid = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, qid, samp >> 4, samp & 0x0F))
            samps = [(hi, vi) for (_, _, hi, vi) in comps]
            if not (
                all(s == (1, 1) for s in samps)
                or (len(samps) == 3 and samps == [(2, 2), (1, 1), (1, 1)])
            ):
                raise ValueError(
                    "unsupported sampling: only 4:4:4 (all 1x1) and "
                    "4:2:0 (Y 2x2, chroma 1x1) are implemented; got "
                    f"{samps}"
                )
            frame = (h, w, comps)
        elif marker == 0xDD:
            if int.from_bytes(body, "big") != 0:
                raise ValueError("restart intervals not supported")
        elif marker == 0xDA:
            ns = body[0]
            scan_comps = []
            for ci in range(ns):
                cid, tbl = body[1 + 2 * ci], body[2 + 2 * ci]
                scan_comps.append((cid, tbl >> 4, tbl & 0x0F))
            pos += ln
            break
        pos += ln
    if frame is None or scan_comps is None:
        raise ValueError("truncated JPEG: missing SOF0/SOS")
    h, w, comps = frame
    if len(scan_comps) != len(comps):
        raise ValueError("scan/frame component mismatch")
    qid_of = {cid: qid for (cid, qid, _, _) in comps}
    samp_of = {cid: (hi, vi) for (cid, _, hi, vi) in comps}
    hmax = max(hi for (_, _, hi, _) in comps)
    vmax = max(vi for (_, _, _, vi) in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    if h % mcu_h or w % mcu_w:
        raise ValueError(
            f"non-MCU-aligned dimensions not supported ({w}x{h} vs "
            f"{mcu_w}x{mcu_h} MCUs)"
        )
    m = _jpeg_idct_matrix()
    # one plane PER COMPONENT at its natural (subsampled) resolution;
    # chroma upsamples by sample replication after the scan (the
    # deterministic closed-form kernel — libjpeg's default triangular
    # filter is a smoothing choice, not part of T.81; an oracle-pinned
    # decoder needs ONE defined kernel, and replication is exact)
    planes = [
        np.zeros((h * vi // vmax, w * hi // hmax))
        for (_, _, hi, vi) in comps
    ]
    r = _JpegBitReader(d, pos)
    pred = [0] * len(comps)
    for my in range(h // mcu_h):
        for mx in range(w // mcu_w):
            for ci, (cid, dct, act) in enumerate(scan_comps):
                hi, vi = samp_of[cid]
                dc_tab = htables[(0, dct)]
                ac_tab = htables[(1, act)]
                q = qtables[qid_of[cid]]
                for v in range(vi):
                    for u in range(hi):
                        seq = [0] * 64
                        s = _jpeg_read_symbol(r, dc_tab)
                        diff = _jpeg_extend(r.bits(s), s) if s else 0
                        pred[ci] += diff
                        seq[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = _jpeg_read_symbol(r, ac_tab)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run != 15:
                                    raise ValueError("invalid AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC index overflow")
                            seq[k] = _jpeg_extend(r.bits(size), size)
                            k += 1
                        blk = np.zeros((8, 8))
                        for zi, (rr, cc) in enumerate(_JPEG_ZIGZAG):
                            blk[rr, cc] = seq[zi] * q[zi]
                        px = 0.25 * (m @ blk.T @ m.T)  # px[x, y]
                        py0 = (my * vi + v) * 8
                        px0 = (mx * hi + u) * 8
                        planes[ci][py0 : py0 + 8, px0 : px0 + 8] = (
                            px.T + 128.0
                        )
    # replicate subsampled planes up to full resolution
    full = np.zeros((len(comps), h, w))
    for ci, (_, _, hi, vi) in enumerate(comps):
        p = planes[ci]
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full[ci] = p
    planes = full
    if len(comps) == 1:
        out = np.clip(np.floor(planes[0] + 0.5), 0, 255)
        return out.astype(np.uint8)[:, :, None]
    if len(comps) != 3:
        raise ValueError(f"{len(comps)}-component scans not supported")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


def jpeg_decode(payload: bytes) -> list[float]:
    """Feature extraction over the decoded image: 8 stats of the
    cross-channel mean-gray field g (for grayscale, g IS the pixel
    value, so every sum is integer-exact and the closed-form oracle
    reproduces each feature bit-for-bit): mean, max, min, the four
    quadrant means (all /255), and the mean absolute deviation from
    mid-gray 128 (/255)."""
    img = jpeg_parse(payload).astype(np.float64)
    g = img.mean(axis=2)
    h, w = g.shape
    hh, hw = h // 2, w // 2
    return [
        float(g.mean() / 255.0),
        float(g.max() / 255.0),
        float(g.min() / 255.0),
        float(g[:hh, :hw].mean() / 255.0),
        float(g[:hh, hw:].mean() / 255.0),
        float(g[hh:, :hw].mean() / 255.0),
        float(g[hh:, hw:].mean() / 255.0),
        float(np.abs(g - 128.0).mean() / 255.0),
    ]


def jpeg_rgbsum_decode(payload: bytes) -> list[float]:
    """Color-JPEG feature extraction over the integer channel-SUM
    field s = R+G+B ∈ [0, 765] (the ppm_decode normalization): mean,
    max, min, four quadrant means, and mean |s − 384| (mid-gray),
    all /765. Unlike jpeg_decode's mean-gray field (exact only for
    grayscale), every statistic here is an integer sum for ANY
    decoded image, so the features are fold-order-free and the
    closed-form 4:2:0 oracle reproduces them bit-for-bit."""
    img = jpeg_parse(payload).astype(np.int64)
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    s = img.sum(axis=2)
    h, w = s.shape
    hh, hw = h // 2, w // 2
    return [
        float(s.mean() / 765.0),
        float(s.max() / 765.0),
        float(s.min() / 765.0),
        float(s[:hh, :hw].mean() / 765.0),
        float(s[:hh, hw:].mean() / 765.0),
        float(s[hh:, :hw].mean() / 765.0),
        float(s[hh:, hw:].mean() / 765.0),
        float(np.abs(s - 384).mean() / 765.0),
    ]


_DECODERS: dict[str, object] = {
    "fake": fake_decode,
    "ppm": ppm_decode,
    "png": png_decode,
    "wav": wav_decode,
    "jpeg": jpeg_decode,
    "jpeg_rgbsum": jpeg_rgbsum_decode,
    "ppm_pool": ppm_pool_grid,
}


def register_decoder(kind: str, fn) -> None:
    """Install a real decoder (`bytes -> list[float]`) for a media kind."""
    _DECODERS[kind] = fn


def get_decoder(kind: str):
    if kind not in _DECODERS:
        raise NotImplementedError(
            f"no decoder registered for kind={kind!r}: compressed formats need "
            "a codec library (PIL/opencv/ffmpeg) — register one with "
            "multimodal.register_decoder(kind, fn). Built-ins: 'ppm' (real "
            "binary-PPM decode), 'png' (real PNG: chunk/CRC/inflate/all "
            "five filters), 'jpeg' (real baseline-sequential JPEG: "
            "Huffman/dequant/IDCT/YCbCr), 'wav' (real RIFF PCM audio "
            "decode) — all stdlib+numpy only — and 'fake' (deterministic "
            "plumbing stand-in)"
        )
    return _DECODERS[kind]


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """Decode an encoded image to a feature vector via the registry
    (`fake=True` forces the deterministic stand-in)."""
    decoder = fake_decode if fake else get_decoder("image")
    return decoder(payload)


def extract_features(
    media: DataFrame,
    fake: bool = True,
    batch_size_hint: int = 256,
    kind: str | None = None,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched; one Python worker pass, vectorized per batch. The
    decoder is resolved from the registry (see the decoder contract
    above): `kind` selects a registered decoder; default is the
    deterministic fake (`fake=True`) or the registered "image" decoder.
    """
    decoder = get_decoder(kind) if kind else (fake_decode if fake else get_decoder("image"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # metadata-only rows carry payload NULL (the schema allows
            # it); bytes(None) would kill the whole task, so they flow
            # through as (None, 0, None) instead — per-row flagging,
            # the same posture as the decoder error contract
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sha256": pdf["payload"].map(
                        lambda b: None if b is None else hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "n_bytes": pdf["payload"].map(
                        lambda b: 0 if b is None else len(bytes(b))
                    ).astype("int64"),
                    "features": pdf["payload"].map(
                        lambda b: None if b is None else decoder(bytes(b))
                    ),
                }
            )
            yield out

    return media.select("media_id", "payload").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame-sampling plan: emits (media_id, frame_ts) rows from
    duration metadata WITHOUT decoding — pure native exprs; the decode
    of each sampled frame is the stubbed step."""
    # frames sampled at ts < duration: the last index is
    # ceil(duration/every) - 1 — an inclusive floor() end would emit a
    # phantom frame AT the end-of-stream instant for exact-multiple
    # durations, and NULL/zero durations must emit no frames at all
    # (greatest() skips NULLs, so the old form gave them frame 0)
    n_last = (F.ceil(F.col("duration_s") / every_s) - 1).cast("int")
    idx = F.when(
        F.col("duration_s") > 0, F.sequence(F.lit(0), n_last)
    ).otherwise(F.array().cast("array<int>"))
    return (
        media.where(F.col("kind") == "video")
        .select("media_id", F.explode(idx).alias("_i"))
        .select("media_id", (F.col("_i") * every_s).alias("frame_ts"))
    )
