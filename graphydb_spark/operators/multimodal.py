"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference extension (SURVEY.md §7.3).  Images/audio/video travel as
``binary`` columns with a metadata struct; decode/feature steps run as
Arrow-batched ``mapInPandas`` so each Python worker sees columnar batches,
never rows.

``decode_image`` is a REAL container-header decoder (pure stdlib
``struct``/byte-walking over the public BMP/PNG/GIF/JPEG formats): width,
height and GIF frame count come from the actual bytes.  Pixel-level
DECODE is real for all four, stdlib+numpy only: BMP rasters read raw
BGR, PNG inflates through zlib + the full scanline-unfilter set, GIF
through a complete variable-width LZW codec (encode + decode), and
baseline JPEG through canonical-Huffman entropy decoding + exact 8×8
IDCT with 4:2:0/4:4:4 chroma upsampling.  Re-ENCODE exists for all
four: BMP/PNG/GIF write real rasters back, and :func:`encode_jpeg` is
a complete baseline JPEG encoder (FDCT + canonical Huffman + byte
stuffing, 4:4:4, unit quant tables), so JPEG resize resamples real
pixels and re-encodes a real stream.

Corrupt/unrecognized payloads decode to nulls instead of failing the
task: at 100 TB a handful of truncated files must not kill the stage —
filter ``fmt IS NULL`` downstream to quarantine them.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("media_type", T.StringType(), True),     # image|audio|video
    T.StructField("meta", T.StructType([
        T.StructField("source", T.StringType(), True),
        T.StructField("bytes", T.LongType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("fmt", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("feat_hash", T.StringType(), True),
])


# --------------------------------------------------------------- decoding

def _gif_segments(b: bytes) -> tuple[int, list[tuple[int, int]]] | None:
    """Walk the GIF block structure: ``(header_end, frame_segments)``.

    Blocks after the logical screen descriptor (+ optional global color
    table): 0x21 extension (label + length-prefixed sub-blocks), 0x2C
    image descriptor (9-byte header + optional local color table + LZW
    min-code byte + sub-blocks), 0x3B trailer.  A frame's segment
    starts at any extension run immediately preceding its image
    descriptor (graphic-control extensions travel with their frame), so
    ``header + segment + trailer`` is a standalone single-frame GIF.
    """
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    i = 13
    packed = b[10]
    if packed & 0x80:                       # global color table
        i += 3 * (2 ** ((packed & 0x07) + 1))
    header_end = i
    segs: list[tuple[int, int]] = []
    pend: int | None = None                 # start of pending extension run
    n = len(b)
    while i < n:
        t = b[i]
        if t == 0x3B:                       # trailer
            break
        if t == 0x21:                       # extension block
            if pend is None:
                pend = i
            i += 2
            while i < n and b[i] != 0:
                i += 1 + b[i]
            i += 1
        elif t == 0x2C:                     # image descriptor
            start = pend if pend is not None else i
            pend = None
            if i + 10 > n:
                segs.append((start, n))
                break
            lpacked = b[i + 9]
            i += 10
            if lpacked & 0x80:              # local color table
                i += 3 * (2 ** ((lpacked & 0x07) + 1))
            i += 1                          # LZW minimum code size
            while i < n and b[i] != 0:      # data sub-blocks
                i += 1 + b[i]
            i += 1
            segs.append((start, min(i, n)))
        else:                               # unknown block: stop walking
            break
    return header_end, segs


def _gif_frame_count(b: bytes) -> int:
    seg = _gif_segments(b)
    return max(len(seg[1]), 1) if seg else 1


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame_payload", T.BinaryType(), True),
])


def extract_frames(media: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL video-frame sampling for GIF containers: demux every
    ``every_n``-th frame into a STANDALONE single-frame GIF (header +
    global color table + the frame's byte segment + trailer) — actual
    bytes out, not an index plan (cf. :func:`frame_sample_plan`).
    Pure block-walking, no codec: the frame's pixel data is copied
    verbatim.  Non-GIF / undecodable payloads yield no rows.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p or b"")
                seg = _gif_segments(b)
                if seg is None:
                    continue
                header_end, segs = seg
                head = b[:header_end]
                for idx in range(0, len(segs), max(1, every_n)):
                    s, e = segs[idx]
                    rows.append((int(m), idx, head + b[s:e] + b"\x3b"))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_payload"])

    return media.select("media_id", "payload").mapInPandas(
        run, schema=FRAME_SCHEMA)


def decode_image(payload) -> dict | None:
    """Parse real image-container headers: BMP, PNG, GIF, JPEG.

    Returns ``{"fmt", "width", "height", "n_frames"}`` read from the
    actual bytes (big-endian IHDR for PNG, little-endian logical screen
    descriptor for GIF, little-endian BITMAPINFOHEADER for BMP, the
    first start-of-frame segment for JPEG; GIF frame count walks the
    block structure).  ``None`` for unrecognized/truncated payloads —
    callers surface that as null columns, never a task failure.

    Pure stdlib on public formats; full pixel decode (rasters, EXIF
    rotation, ICC) is explicitly out of scope without an imaging
    library.
    """
    b = bytes(payload or b"")
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return {"fmt": "png", "width": w, "height": h, "n_frames": 1}
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 13:
        w, h = struct.unpack("<HH", b[6:10])
        return {"fmt": "gif", "width": w, "height": h,
                "n_frames": _gif_frame_count(b)}
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        # negative height = top-down row order, dims still |h|
        return {"fmt": "bmp", "width": w, "height": abs(h), "n_frames": 1}
    if b[:2] == b"\xff\xd8":                # JPEG: scan marker segments
        i = 2
        n = len(b)
        while i + 9 <= n and b[i] == 0xFF:
            marker = b[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                i += 2
                continue
            seglen = struct.unpack(">H", b[i + 2:i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5:i + 9])
                return {"fmt": "jpeg", "width": w, "height": h,
                        "n_frames": 1}
            i += 2 + seglen
    return None


# ------------------------------------------------- container synthesizers
# Deterministic, valid-enough files built with stdlib only — the test
# fixtures for the real decoder (and the payloads documents_as_media
# wraps around the documents fixture).

def make_bmp(width: int, height: int) -> bytes:
    """Complete 24-bit uncompressed BMP (BITMAPINFOHEADER, rows padded
    to 4 bytes, deterministic pixel bytes)."""
    row = (3 * width + 3) & ~3
    size = 54 + row * height
    header = (b"BM" + struct.pack("<IHHI", size, 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24,
                            0, row * height, 2835, 2835, 0, 0))
    body = bytes((7 * i) & 0xFF for i in range(row)) * height
    return header + body


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def make_png(width: int, height: int) -> bytes:
    """Complete valid PNG: 8-bit grayscale, one zlib IDAT, real CRCs."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes((x * 3 + y) & 0xFF
                                   for x in range(width))
                   for y in range(height))
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 6))
            + _png_chunk(b"IEND", b""))


#: PNG color type → samples per pixel (8-bit depth, non-interlaced)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def decode_png_pixels(body: bytes):
    """REAL PNG raster decode — stdlib only: walk the chunk list,
    concatenate IDAT, ``zlib.decompress``, then invert the per-scanline
    filters (None/Sub/Up/Average/Paeth, the complete PNG filter set).
    Returns ``(raster ndarray [h, w, channels], color_type)`` or None
    for unsupported flavors (bit depth ≠ 8, palette, interlaced) or
    corrupt streams."""
    import numpy as np

    if len(body) < 33 or body[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", body[16:29])
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        return None
    ch = _PNG_CHANNELS[ctype]
    idat, pos = [], 8
    while pos + 8 <= len(body):
        ln, tag = struct.unpack(">I4s", body[pos:pos + 8])
        if tag == b"IDAT":
            idat.append(body[pos + 8:pos + 8 + ln])
        if tag == b"IEND":
            break
        pos += 12 + ln
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(raw) < h * (stride + 1) or w == 0 or h == 0:
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        f = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += 1 + stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride,
                                                              np.int32)
        if f == 0:
            cur = line
        elif f == 1:                          # Sub
            cur = line.copy()
            for x in range(ch, stride):
                cur[x] = (cur[x] + cur[x - ch]) & 0xFF
        elif f == 2:                          # Up
            cur = (line + prev) & 0xFF
        elif f == 3:                          # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                cur[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:                          # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pr) & 0xFF
        else:
            return None
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, ch), ctype


def encode_png(raster, ctype: int) -> bytes:
    """Re-encode an 8-bit raster as a valid PNG (filter 0 rows, one
    zlib IDAT, real CRCs) — the inverse of :func:`decode_png_pixels`."""
    h, w, ch = raster.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + raster[y].tobytes() for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 6))
            + _png_chunk(b"IEND", b""))


def resize_png(body: bytes, max_side: int) -> tuple[bytes, int, int] | None:
    """REAL nearest-neighbor resample of an 8-bit PNG via full raster
    decode (stdlib zlib + unfilter) → index-gather → re-encode."""
    import numpy as np

    d = decode_png_pixels(body)
    if d is None:
        return None
    raster, ctype = d
    h, w = raster.shape[:2]
    if max(w, h) <= max_side:
        return body, w, h          # already small: pass through verbatim
    scale = min(1.0, max_side / max(w, h, 1))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    yi = (np.arange(nh) * (h / nh)).astype(int)
    xi = (np.arange(nw) * (w / nw)).astype(int)
    out = np.ascontiguousarray(raster[yi][:, xi])
    return encode_png(out, ctype), nw, nh


def make_gif(width: int, height: int, n_frames: int = 1) -> bytes:
    """Structurally valid GIF89a: logical screen descriptor, 2-entry
    global color table, ``n_frames`` image descriptors each carrying a
    minimal LZW data stream, trailer."""
    out = [b"GIF89a", struct.pack("<HH", width, height),
           bytes([0x80, 0, 0]),             # GCT flag, 2 entries
           b"\x00\x00\x00\xff\xff\xff"]     # the color table
    frame = (b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
             + b"\x00"                      # no local color table
             + b"\x02"                      # LZW min code size
             + b"\x02\x44\x01"              # one 2-byte data sub-block
             + b"\x00")                     # block terminator
    out.extend([frame] * max(1, n_frames))
    out.append(b"\x3b")
    return b"".join(out)


def make_wav(seed: int, n_samples: int, sample_rate: int = 8000) -> bytes:
    """Complete valid RIFF/WAVE file: PCM, mono, 8-bit, deterministic
    samples ``(seed*31 + i*7) % 256`` (unsigned, 128 = silence)."""
    data = bytes((seed * 31 + i * 7) % 256 for i in range(n_samples))
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate, 1, 8)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_audio(payload) -> dict | None:
    """Parse a real RIFF/WAVE container: walk the chunk list for
    ``fmt `` and ``data`` (tolerating extra chunks), return
    ``{"fmt", "sample_rate", "channels", "bits", "data_off",
    "n_bytes"}`` from the actual bytes.  ``None`` for non-WAV or
    truncated payloads — null columns downstream, never a task
    failure.  PCM sample bytes are raw, so feature extraction needs no
    codec (cf. the BMP raster argument in :func:`resize_bmp`)."""
    b = bytes(payload or b"")
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, n = 12, len(b)
    rate = ch = bits = None
    off = nb = None
    while i + 8 <= n:
        tag = b[i:i + 4]
        ln = struct.unpack("<I", b[i + 4:i + 8])[0]
        if tag == b"fmt " and i + 8 + 16 <= n:
            _, ch, rate, _, _, bits = struct.unpack(
                "<HHIIHH", b[i + 8:i + 24])
        elif tag == b"data":
            off, nb = i + 8, min(ln, n - i - 8)
        i += 8 + ln + (ln & 1)
    if rate is None or off is None:
        return None
    return {"fmt": "wav", "sample_rate": rate, "channels": ch,
            "bits": bits, "data_off": off, "n_bytes": nb}


AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("fmt", T.StringType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_samples", T.LongType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("sum_sq", T.LongType(), True),
    T.StructField("zero_crossings", T.LongType(), True),
])


def audio_features(media: DataFrame) -> DataFrame:
    """REAL audio feature extraction from the decoded PCM samples:
    energy (sum of squared centered amplitudes) and zero-crossing
    count, both as exact integers — sufficient statistics for RMS/ZCR
    that are bit-stable under any batch split (float accumulation
    order never enters).  8-bit mono PCM is computed with numpy over
    the actual data chunk; other encodings yield header fields with
    null features."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                body = bytes(p or b"")
                d = decode_audio(body)
                if d is None:
                    rows.append((int(m), None, None, None, None,
                                 None, None))
                    continue
                nb = d["n_bytes"]
                dur = (nb * 1000) // d["sample_rate"] \
                    if d["sample_rate"] else None
                if d["bits"] != 8 or d["channels"] != 1 or nb == 0:
                    rows.append((int(m), "wav", d["sample_rate"], nb,
                                 dur, None, None))
                    continue
                s = (np.frombuffer(body, np.uint8, count=nb,
                                   offset=d["data_off"])
                     .astype(np.int64) - 128)
                pos = s >= 0
                rows.append((int(m), "wav", d["sample_rate"], nb, dur,
                             int((s * s).sum()),
                             int((pos[1:] != pos[:-1]).sum())))
            yield pd.DataFrame(rows, columns=[
                "media_id", "fmt", "sample_rate", "n_samples",
                "duration_ms", "sum_sq", "zero_crossings"])

    return media.select("media_id", "payload").mapInPandas(
        run, schema=AUDIO_FEATURE_SCHEMA)


def documents_as_audio(docs: DataFrame) -> DataFrame:
    """Wrap the documents fixture as an audio table with REAL WAV
    payloads: ``n_samples = 200 + n_chars % 600`` and the deterministic
    sample formula of :func:`make_wav`, so a SQL oracle can recompute
    the energy/ZCR statistics the decoder must read back."""
    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, src, nch in zip(pdf["doc_id"], pdf["source"],
                                     pdf["n_chars"]):
                did, nch = int(did), int(nch)
                payload = make_wav(did, 200 + nch % 600)
                rows.append((did, payload, "audio",
                             {"source": src, "bytes": len(payload)}))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "media_type", "meta"])

    return (docs.select("doc_id", "source", "n_chars")
            .mapInPandas(build, schema=MEDIA_SCHEMA))


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Wrap the documents fixture as a media table whose payloads are
    REAL container bytes: format cycles bmp/png/gif by doc_id, the
    dimensions are a pure function of ``n_chars`` (so a SQL oracle can
    predict what the header decoder must read back), and GIFs carry
    1-4 frames.  Arrow-batched synthesis — the builder is the same
    mapInPandas shape a real ingest/decode stage has.
    """
    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, src, nch in zip(pdf["doc_id"], pdf["source"],
                                     pdf["n_chars"]):
                did, nch = int(did), int(nch)
                w = 4 + nch % 60
                h = 4 + (nch // 7) % 60
                k = did % 3
                if k == 0:
                    payload = make_bmp(w, h)
                elif k == 1:
                    payload = make_png(w, h)
                else:
                    payload = make_gif(w, h, 1 + did % 4)
                rows.append((did, payload, "image",
                             {"source": src, "bytes": len(payload)}))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "media_type", "meta"])

    return (docs.select("doc_id", "source", "n_chars")
            .mapInPandas(build, schema=MEDIA_SCHEMA))


# ------------------------------------------------------------- operators

def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: container
    format, dimensions and frame count from the REAL headers
    (:func:`decode_image`), plus an md5 payload fingerprint.
    Unrecognized payloads yield null features.

    ``mapInPandas`` keeps the transfer columnar; at scale, repartition by
    a size-balanced key first so one giant video doesn't skew a task.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                d = decode_image(p)
                fp = hashlib.md5(bytes(p or b"")).hexdigest()
                if d is None:
                    rows.append((int(m), None, None, None, None, fp))
                else:
                    rows.append((int(m), d["fmt"], d["width"], d["height"],
                                 d["n_frames"], fp))
            yield pd.DataFrame(rows, columns=["media_id", "fmt", "width",
                                              "height", "n_frames",
                                              "feat_hash"])

    return media.select("media_id", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Plan frame sampling from the real per-container frame counts:
    explode per-media frame indices — one row per kept frame (the
    fan-out shape of a video sampling stage)."""
    feats = extract_features(media)
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return (feats.where(F.col("n_frames").isNotNull())
            .select("media_id", F.explode(idx).alias("frame_idx")))


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])


def resize_bmp(body: bytes, max_side: int) -> tuple[bytes, int, int] | None:
    """REAL nearest-neighbor resample of an uncompressed 24-bit BMP
    (numpy row/column index-gather over the raw BGR raster, rows
    re-padded to 4 bytes, a fresh valid header) — no imaging library
    needed because the format stores raw pixels.  Returns None for any
    other BMP flavor (palette/compressed) or a truncated raster."""
    import numpy as np

    if len(body) < 54 or body[:2] != b"BM":
        return None
    off = struct.unpack_from("<I", body, 10)[0]
    w, h = struct.unpack_from("<ii", body, 18)
    bpp = struct.unpack_from("<H", body, 28)[0]
    comp = struct.unpack_from("<I", body, 30)[0]
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    flipped = h < 0
    hh = abs(h)
    row = (3 * w + 3) & ~3
    if len(body) < off + row * hh:
        return None
    if max(w, hh) <= max_side:
        return body, w, hh         # already small: pass through verbatim
    raster = (np.frombuffer(body, dtype=np.uint8, count=row * hh,
                            offset=off)
              .reshape(hh, row)[:, :3 * w].reshape(hh, w, 3))
    scale = min(1.0, max_side / max(w, hh, 1))
    nw, nh = max(1, int(w * scale)), max(1, int(hh * scale))
    yi = (np.arange(nh) * (hh / nh)).astype(int)
    xi = (np.arange(nw) * (w / nw)).astype(int)
    out = raster[yi][:, xi]
    nrow = (3 * nw + 3) & ~3
    rows = np.zeros((nh, nrow), dtype=np.uint8)
    rows[:, :3 * nw] = out.reshape(nh, 3 * nw)
    header = (b"BM" + struct.pack("<IHHI", 54 + nrow * nh, 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, nw,
                            -nh if flipped else nh, 1, 24, 0,
                            nrow * nh, 2835, 2835, 0, 0))
    return header + rows.tobytes(), nw, nh


def resize(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Arrow-batched resize: payload in → (smaller) payload out, with
    the scaled dimensions computed from the REAL header dims
    (aspect-preserving, media already within ``max_side`` pass through).

    All four formats get a REAL nearest-neighbor pixel resample:
    :func:`resize_bmp` reads the raw raster, :func:`resize_png`
    decodes through stdlib zlib + the full PNG unfilter set and
    re-encodes with real CRCs, :func:`resize_gif` round-trips the LZW
    codec, and :func:`resize_jpeg` runs the full baseline decode
    (Huffman + IDCT) and re-encodes with :func:`encode_jpeg` (FDCT +
    canonical Huffman).  Variants a decoder rejects (palette BMPs,
    progressive JPEGs, …) keep the byte-proportional payload stand-in,
    for which the Spark-side shape is still the real one: a
    binary-to-binary mapInPandas whose output batches shrink by the
    area ratio.  Undecodable payloads pass through with null dims.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                body = bytes(p or b"")
                d = decode_image(body)
                if d is None:
                    out_rows.append((int(m), body, None, None))
                    continue
                if d["fmt"] == "bmp":
                    real = resize_bmp(body, max_side)
                    if real is not None:
                        out_rows.append((int(m),) + real)
                        continue
                if d["fmt"] == "png":
                    real = resize_png(body, max_side)
                    if real is not None:
                        out_rows.append((int(m),) + real)
                        continue
                if d["fmt"] == "gif":
                    real = resize_gif(body, max_side)
                    if real is not None:
                        out_rows.append((int(m),) + real)
                        continue
                if d["fmt"] == "jpeg":
                    real = resize_jpeg(body, max_side)
                    if real is not None:
                        out_rows.append((int(m),) + real)
                        continue
                w, h = d["width"], d["height"]
                scale = min(1.0, max_side / max(w, h, 1))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                keep = max(1, int(len(body) * scale * scale))
                out_rows.append((int(m), body[:keep], nw, nh))
            yield pd.DataFrame(
                out_rows, columns=["media_id", "payload", "width", "height"])

    return media.select("media_id", "payload").mapInPandas(
        run, schema=RESIZED_SCHEMA)


PIXEL_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("fmt", T.StringType(), True),
    T.StructField("n_px", T.LongType(), True),
    T.StructField("px_sum", T.LongType(), True),
    T.StructField("px_sum_sq", T.LongType(), True),
])


def pixel_stats(media: DataFrame) -> DataFrame:
    """REAL pixel-level statistics from decoded rasters (BMP raw BGR,
    PNG via :func:`decode_png_pixels`): sample count, sum and
    sum-of-squares of the 8-bit channel values — exact integers, so
    mean/variance derive bit-stably under any batch split (the same
    sufficient-statistics discipline as :func:`audio_features`).  GIFs
    with full LZW streams decode through :func:`decode_gif_pixels`
    (palette-mapped RGB of every frame); baseline JPEGs through
    :func:`decode_jpeg_pixels` (Huffman + IDCT).  The
    brightness/contrast quality gates of an image-curation pipeline
    run on these columns."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                body = bytes(p or b"")
                try:
                    d = decode_image(body)
                except Exception:
                    d = None
                raster = None
                if d is not None and d["fmt"] == "png":
                    r = decode_png_pixels(body)
                    raster = None if r is None else r[0]
                elif d is not None and d["fmt"] == "gif":
                    r = decode_gif_pixels(body)
                    if r is not None:
                        frames, pal = r
                        lut = np.frombuffer(pal, np.uint8).reshape(-1, 3)
                        raster = np.concatenate(
                            [lut[f.ravel()] for f in frames])
                elif d is not None and d["fmt"] == "jpeg":
                    raster = decode_jpeg_pixels(body)
                elif d is not None and d["fmt"] == "bmp" and len(body) >= 54:
                    off = struct.unpack_from("<I", body, 10)[0]
                    w, h = struct.unpack_from("<ii", body, 18)
                    bpp = struct.unpack_from("<H", body, 28)[0]
                    comp = struct.unpack_from("<I", body, 30)[0]
                    hh = abs(h)
                    row_b = (3 * w + 3) & ~3
                    if (bpp == 24 and comp == 0 and w > 0 and hh > 0
                            and len(body) >= off + row_b * hh):
                        raster = (np.frombuffer(
                            body, np.uint8, row_b * hh, off)
                            .reshape(hh, row_b)[:, :3 * w])
                if raster is None:
                    rows.append((int(m), None if d is None else d["fmt"],
                                 None, None, None))
                else:
                    v = raster.astype(np.int64)
                    rows.append((int(m), d["fmt"], int(v.size),
                                 int(v.sum()), int((v * v).sum())))
            yield pd.DataFrame(rows, columns=[
                "media_id", "fmt", "n_px", "px_sum", "px_sum_sq"])

    return media.select("media_id", "payload").mapInPandas(
        run, schema=PIXEL_STATS_SCHEMA)


SPECTRAL_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("dominant_hz", T.DoubleType(), True),
    T.StructField("spectral_centroid_hz", T.DoubleType(), True),
])


def audio_spectral(media: DataFrame) -> DataFrame:
    """REAL spectral features via numpy FFT over the decoded 8-bit mono
    PCM: dominant frequency (argmax magnitude bin above DC — an exact
    integer bin index scaled by the real sample rate) and the spectral
    centroid (magnitude-weighted mean frequency, rounded to 3 dp).
    The DSP stage of an audio-curation pipeline — silence/tone/bandwidth
    gates run on these columns.  Non-PCM payloads yield nulls."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                body = bytes(p or b"")
                d = decode_audio(body)
                if (d is None or d["bits"] != 8 or d["channels"] != 1
                        or d["n_bytes"] < 4):
                    rows.append((int(m), None, None))
                    continue
                s = (np.frombuffer(body, np.uint8, d["n_bytes"],
                                   d["data_off"]).astype(np.float64)
                     - 128.0)
                mag = np.abs(np.fft.rfft(s))
                freqs = np.fft.rfftfreq(len(s), 1.0 / d["sample_rate"])
                dom = int(np.argmax(mag[1:])) + 1 if len(mag) > 1 else 0
                tot = float(mag[1:].sum())
                cent = (float((mag[1:] * freqs[1:]).sum()) / tot
                        if tot > 0 else 0.0)
                rows.append((int(m), float(freqs[dom]), round(cent, 3)))
            yield pd.DataFrame(rows, columns=[
                "media_id", "dominant_hz", "spectral_centroid_hz"])

    return media.select("media_id", "payload").mapInPandas(
        run, schema=SPECTRAL_SCHEMA)


# ------------------------------------------------------------ GIF LZW codec

def _lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF variable-width LZW encoder (pure stdlib): CLEAR/EOI codes,
    LSB-first bit packing, code width grows when the next code would
    not fit, table reset at 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    buf = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code):
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    def reset():
        nonlocal width
        width = min_code_size + 1
        return {(i,): i for i in range(clear)}

    table = reset()
    next_code = eoi + 1
    emit(clear)
    seq = ()
    for px in indices:
        nxt = seq + (int(px),)
        if nxt in table:
            seq = nxt
            continue
        emit(table[seq])
        table[nxt] = next_code
        next_code += 1
        # GIF "not-early-change": widen AFTER assigning code 2^width
        # (codes equal to 2^width are then emitted at the new width) —
        # the convention giflib/browsers implement; TIFF-style early
        # change (widening at 2^width) desyncs against real decoders
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear)
            table = reset()
            next_code = eoi + 1
        seq = (int(px),)
    if seq:
        emit(table[seq])
    emit(eoi)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int,
                n_pixels: int) -> list[int] | None:
    """Inverse of :func:`_lzw_encode`; None for truncated/invalid
    streams or streams that don't cover ``n_pixels``."""
    clear = 1 << min_code_size
    eoi = clear + 1
    stream = int.from_bytes(data, "little")
    total_bits = len(data) * 8
    bitpos = 0
    width = min_code_size + 1
    table: list[tuple[int, ...] | None] = \
        [(i,) for i in range(clear)] + [None, None]
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    while len(out) < n_pixels:
        if bitpos + width > total_bits:
            return None
        code = (stream >> bitpos) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            width = min_code_size + 1
            table = [(i,) for i in range(clear)] + [None, None]
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table) or table[code] is None:
                return None
            entry = table[code]
        else:
            if code < len(table) and table[code] is not None:
                entry = table[code]
            elif code == len(table):
                entry = prev + (prev[0],)
            else:
                return None
            table.append(prev + (entry[0],))
            # decoder lags the encoder by one entry (the first code
            # after CLEAR appends nothing), so the standard decoder
            # widens when its table reaches 2^w — matching the
            # encoder's widen-after-2^w rule above
            if len(table) == (1 << width) and width < 12:
                width += 1
        out.extend(entry)
        prev = entry
    return out[:n_pixels] if len(out) >= n_pixels else None


#: 4-color palette for raster GIFs (black, white, red, blue)
_GIF_PALETTE = b"\x00\x00\x00\xff\xff\xff\xff\x00\x00\x00\x00\xff"


def make_gif_raster(width: int, height: int, n_frames: int = 1) -> bytes:
    """GIF89a with REAL LZW-encoded pixel data: 4-color global table,
    frame f's pixel (x, y) has palette index ``(x + y + f) % 4``.
    The fully-decodable counterpart of :func:`make_gif` (whose minimal
    stream keeps byte-stable fixtures for the container-level oracles).
    """
    out = [b"GIF89a", struct.pack("<HH", width, height),
           bytes([0x81, 0, 0]),             # GCT flag, 4 entries
           _GIF_PALETTE]
    for f in range(max(1, n_frames)):
        idx = [(x + y + f) % 4
               for y in range(height) for x in range(width)]
        data = _lzw_encode(idx, 2)
        blocks = bytearray()
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            blocks.append(len(chunk))
            blocks.extend(chunk)
        blocks.append(0)
        out.append(b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
                   + b"\x00" + bytes([2]) + bytes(blocks))
    out.append(b"\x3b")
    return b"".join(out)


def decode_gif_pixels(body: bytes):
    """REAL GIF raster decode (pure stdlib LZW): returns
    ``(frames, palette)`` where frames is a list of [h][w] numpy index
    arrays mapped through the GLOBAL color table.  None for payloads
    without a decodable full-coverage LZW stream (e.g. the minimal
    fixture streams), interlaced frames, or local color tables."""
    import numpy as np

    if len(body) < 13 or body[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    packed = body[10]
    if not packed & 0x80:
        return None
    gct_n = 2 ** ((packed & 0x07) + 1)
    palette = body[13:13 + 3 * gct_n]
    if len(palette) != 3 * gct_n:
        return None
    seg = _gif_segments(body)
    if seg is None or not seg[1]:
        return None
    frames = []
    n = len(body)
    for s, e in seg[1]:
        i = s
        while i < n and body[i] == 0x21:     # skip extension run
            i += 2
            while i < n and body[i] != 0:
                i += 1 + body[i]
            i += 1
        if i >= n or body[i] != 0x2C or i + 10 > n:
            return None
        fw, fh = struct.unpack_from("<HH", body, i + 5)
        lpacked = body[i + 9]
        if lpacked & 0xC0:                   # local table or interlace
            return None
        i += 10
        mcs = body[i]
        i += 1
        data = bytearray()
        while i < n and body[i] != 0:
            ln = body[i]
            data.extend(body[i + 1:i + 1 + ln])
            i += 1 + ln
        px = _lzw_decode(bytes(data), mcs, fw * fh)
        if px is None or (px and max(px) >= gct_n):
            return None              # out-of-palette indices = corrupt
        frames.append(np.array(px, dtype=np.uint8).reshape(fh, fw))
    return frames, palette


def resize_gif(body: bytes, max_side: int) -> tuple[bytes, int, int] | None:
    """REAL nearest-neighbor resample of a fully-decodable GIF: every
    frame decodes through the LZW codec, index-gathers, and re-encodes
    against the original global color table.  None for payloads
    :func:`decode_gif_pixels` rejects (minimal fixture streams, local
    tables, interlace) — those keep the documented stand-in path."""
    import numpy as np

    r = decode_gif_pixels(body)
    if r is None or not r[0]:
        return None
    frames, pal = r
    h, w = frames[0].shape
    if max(w, h) <= max_side:
        return body, w, h
    scale = min(1.0, max_side / max(w, h, 1))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    yi = (np.arange(nh) * (h / nh)).astype(int)
    xi = (np.arange(nw) * (w / nw)).astype(int)
    n_colors = len(pal) // 3
    bits = max(1, (n_colors - 1).bit_length())
    mcs = max(2, bits)
    out = [b"GIF89a", struct.pack("<HH", nw, nh),
           bytes([0x80 | (bits - 1), 0, 0]), pal]
    for f in frames:
        small = f[yi][:, xi]
        data = _lzw_encode(small.ravel().tolist(), mcs)
        blocks = bytearray()
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            blocks.append(len(chunk))
            blocks.extend(chunk)
        blocks.append(0)
        out.append(b"\x2c" + struct.pack("<HHHH", 0, 0, nw, nh)
                   + b"\x00" + bytes([mcs]) + bytes(blocks))
    out.append(b"\x3b")
    return b"".join(out), nw, nh


# ------------------------------------------------------- baseline JPEG

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]


def _huff_table(counts: bytes, symbols: bytes) -> dict:
    """Canonical Huffman: {(bit_length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data with 0xFF00
    unstuffing.  Never reads past a marker; the MCU loop calls
    :meth:`restart_sync` at DRI boundaries, which discards the byte-
    alignment padding, consumes the RSTn marker, and lets the caller
    reset its DC predictors."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24 and self.pos < len(self.d):
            b = self.d[self.pos]
            if b == 0xFF:
                nxt = self.d[self.pos + 1] if self.pos + 1 < len(self.d) \
                    else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:                        # RSTn / EOI / next segment
                    return
            else:
                self.pos += 1
            self.buf = (self.buf << 8) | b
            self.nbits += 8

    def restart_sync(self) -> bool:
        """Byte-align (drop pad bits), consume the next RSTn marker."""
        self.buf = 0
        self.nbits = 0
        if (self.pos + 1 < len(self.d) and self.d[self.pos] == 0xFF
                and 0xD0 <= self.d[self.pos + 1] <= 0xD7):
            self.pos += 2
            return True
        return False

    def bits(self, n: int) -> int | None:
        if n == 0:
            return 0
        self._fill()
        if self.nbits < n:
            return None
        self.nbits -= n
        v = (self.buf >> self.nbits) & ((1 << n) - 1)
        self.buf &= (1 << self.nbits) - 1
        return v

    def huff(self, table: dict) -> int | None:
        code = 0
        for length in range(1, 17):
            b = self.bits(1)
            if b is None:
                return None
            code = (code << 1) | b
            if (length, code) in table:
                return table[(length, code)]
        return None


def _extend(v: int, t: int) -> int:
    return v - ((1 << t) - 1) if t and v < (1 << (t - 1)) else v


_IDCT_M = None


def _idct8(coeffs):
    """Exact float 8×8 inverse DCT via the orthonormal basis matrix."""
    import numpy as np

    global _IDCT_M
    if _IDCT_M is None:
        m = np.zeros((8, 8))
        for u in range(8):
            c = (1 / (2 ** 0.5)) if u == 0 else 1.0
            for x in range(8):
                m[u, x] = 0.5 * c * \
                    np.cos((2 * x + 1) * u * np.pi / 16)
        _IDCT_M = m
    return _IDCT_M.T @ coeffs @ _IDCT_M


def decode_jpeg_pixels(body: bytes):
    """REAL baseline JPEG raster decode — pure stdlib + numpy: marker
    walk (DQT/SOF0/DHT/SOS/DRI), canonical Huffman entropy decode with
    byte unstuffing and restart-interval handling, dequantize,
    de-zigzag, exact 8×8 IDCT, 4:2:0/4:2:2/4:4:4 chroma upsampling and
    YCbCr→RGB.  Returns an [h][w][channels] uint8 array (1 channel for
    grayscale, 3 for color) or None for progressive/arithmetic/12-bit
    streams and corrupt payloads — malformed bytes must surface as
    nulls, never a task failure (module contract), so structural
    errors the parser can't anticipate are caught wholesale."""
    try:
        return _decode_jpeg_unsafe(body)
    except (IndexError, ValueError, struct.error):
        return None


def _decode_jpeg_unsafe(body: bytes):
    import numpy as np

    if len(body) < 4 or body[:2] != b"\xff\xd8":
        return None
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    h = w = 0
    scan = None
    dri = 0
    i = 2
    n = len(body)
    while i + 4 <= n:
        if body[i] != 0xFF:
            return None
        m = body[i + 1]
        if m in (0x01,) or 0xD0 <= m <= 0xD9:
            i += 2
            continue
        ln = struct.unpack(">H", body[i + 2:i + 4])[0]
        seg = body[i + 4:i + 2 + ln]
        if m == 0xDB:                        # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                if pq != 0:
                    return None
                qt[tq] = list(seg[j + 1:j + 65])
                j += 65
        elif m == 0xC0:                      # SOF0 baseline
            if seg[0] != 8:
                return None
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None                      # non-baseline
        elif m == 0xC4:                      # DHT
            j = 0
            while j + 17 <= len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = seg[j + 1:j + 17]
                ns = sum(counts)
                huff[(tc, th)] = _huff_table(counts,
                                             seg[j + 17:j + 17 + ns])
                j += 17 + ns
        elif m == 0xDD:                      # DRI: restart interval
            dri = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:                      # SOS
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c:3 + 2 * c]
                sel[cid] = (tt >> 4, tt & 15)
            scan = (sel, i + 2 + ln)
            break
        i += 2 + ln
    if comps is None or scan is None or not qt:
        return None
    sel, data_off = scan
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = []
    for c in comps:
        pw = mcus_x * c["h"] * 8
        ph = mcus_y * c["v"] * 8
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    rd = _BitReader(body[data_off:])
    preds = [0] * len(comps)
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_i and mcu_i % dri == 0:
                if not rd.restart_sync():
                    return None
                preds = [0] * len(comps)
            mcu_i += 1
            for ci, c in enumerate(comps):
                dc_t = huff.get((0, sel[c["id"]][0]))
                ac_t = huff.get((1, sel[c["id"]][1]))
                q = qt.get(c["tq"])
                if dc_t is None or ac_t is None or q is None:
                    return None
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        t = rd.huff(dc_t)
                        if t is None:
                            return None
                        vv = rd.bits(t)
                        if vv is None:
                            return None
                        preds[ci] += _extend(vv, t)
                        zz = [0] * 64
                        zz[0] = preds[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = rd.huff(ac_t)
                            if rs is None:
                                return None
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break
                            k += r
                            if k > 63:
                                return None
                            vv = rd.bits(s)
                            if vv is None:
                                return None
                            zz[_ZIGZAG[k]] = _extend(vv, s) * q[k]
                            k += 1
                        block = np.array(zz, dtype=np.float64) \
                            .reshape(8, 8)
                        sp = _idct8(block) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = sp
    out = []
    for ci, c in enumerate(comps):
        sy, sx = vmax // c["v"], hmax // c["h"]
        p = np.repeat(np.repeat(planes[ci], sy, axis=0), sx, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        g = np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)
        return g.reshape(h, w, 1)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


#: AC symbol order for the flat canonical table: EOB, ZRL, then every
#: (run, size) pair — 162 symbols, all at code length 8 (162 < 256, so
#: the canonical assignment is valid and the decoder's _huff_table
#: reads it back directly: code for symbol i is just i)
_AC_SYMS = [0x00, 0xF0] + [(r << 4) | s
                           for r in range(16) for s in range(1, 11)]
_AC_CODE = {sym: i for i, sym in enumerate(_AC_SYMS)}

_FDCT_M = None


def _fdct8(block):
    """Exact float 8×8 forward DCT — the matrix inverse of
    :func:`_idct8` (orthonormal basis: FDCT = M @ x @ M.T, so
    _idct8(_fdct8(x)) == x in float)."""
    import numpy as np

    global _FDCT_M
    if _FDCT_M is None:
        m = np.zeros((8, 8))
        for u in range(8):
            c = (1 / (2 ** 0.5)) if u == 0 else 1.0
            for x in range(8):
                m[u, x] = 0.5 * c * \
                    np.cos((2 * x + 1) * u * np.pi / 16)
        _FDCT_M = m
    return _FDCT_M @ block @ _FDCT_M.T


def encode_jpeg(raster) -> bytes:
    """Complete baseline JPEG ENCODER (pure stdlib + numpy) — the
    re-encode half :func:`resize_jpeg` needs, closing the one stand-in
    round 3 left in the codec set.

    Layout choices favor fidelity and decoder simplicity over
    compression: 4:4:4 (no chroma subsampling), UNIT quantization
    tables (coefficients lose only their round-to-integer step — flat
    8×8 blocks round-trip bit-exactly since they quantize to a lone
    integer DC), and flat canonical Huffman tables (the 12 DC
    categories as 4-bit codes, all 162 AC (run,size) symbols at 8
    bits).  Entropy coding is the real thing: DC prediction per
    component, (run,size) AC coding with ZRL/EOB, 0xFF byte stuffing.
    Accepts the [h][w][1] (grayscale) or [h][w][3] (RGB, BT.601
    forward transform) uint8 rasters :func:`decode_jpeg_pixels`
    produces."""
    import numpy as np

    h, w = int(raster.shape[0]), int(raster.shape[1])
    ch = int(raster.shape[2]) if raster.ndim == 3 else 1
    x = raster.reshape(h, w, ch).astype(np.float64)
    if ch == 3:
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    else:
        planes = [x[..., 0]]
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = []
    for p in planes:                       # edge-replicate partial blocks
        p2 = np.empty((ph, pw))
        p2[:h, :w] = p
        if ph > h:
            p2[h:, :w] = p[h - 1:h, :]
        if pw > w:
            p2[:, w:] = p2[:, w - 1:w]
        padded.append(p2 - 128.0)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    dc_counts = bytes([0, 0, 0, 12] + [0] * 12)
    dc_syms = bytes(range(12))
    ac_counts = bytes([0] * 7 + [len(_AC_SYMS)] + [0] * 8)
    out = [b"\xff\xd8", seg(0xDB, bytes([0]) + bytes([1] * 64))]
    if ch == 3:
        sof = bytes([8]) + struct.pack(">HH", h, w) + bytes(
            [3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
        sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    else:
        sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
        sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += [seg(0xC0, sof),
            seg(0xC4, bytes([0x00]) + dc_counts + dc_syms),
            seg(0xC4, bytes([0x10]) + ac_counts + bytes(_AC_SYMS)),
            seg(0xDA, sos)]

    bits: list[int] = []

    def put(v, n):
        for k in range(n - 1, -1, -1):
            bits.append((v >> k) & 1)

    def put_coef(v, t):
        put(v if v >= 0 else v + (1 << t) - 1, t)

    preds = [0] * ch
    for my in range(ph // 8):
        for mx in range(pw // 8):
            for ci in range(ch):
                block = padded[ci][my * 8:(my + 1) * 8,
                                   mx * 8:(mx + 1) * 8]
                co = np.rint(_fdct8(block)).astype(np.int64)
                zz = [int(co.flat[_ZIGZAG[k]]) for k in range(64)]
                # baseline AC size cap is 10 bits (|v| ≤ 1023); unit
                # quant can push a pathological block 1-2 counts over.
                # DC is exempt (category 11 covers its ±1024 range)
                zz[1:] = [min(1023, max(-1023, v)) for v in zz[1:]]
                diff = zz[0] - preds[ci]
                preds[ci] = zz[0]
                t = abs(diff).bit_length()
                put(t, 4)                              # DC category code
                if t:
                    put_coef(diff, t)
                run = 0
                last_nz = max((k for k in range(1, 64) if zz[k]),
                              default=0)
                for k in range(1, last_nz + 1):
                    if zz[k] == 0:
                        run += 1
                        continue
                    while run >= 16:
                        put(_AC_CODE[0xF0], 8)         # ZRL
                        run -= 16
                    s = abs(zz[k]).bit_length()
                    put(_AC_CODE[(run << 4) | s], 8)
                    put_coef(zz[k], s)
                    run = 0
                if last_nz < 63:
                    put(_AC_CODE[0x00], 8)             # EOB
    while len(bits) % 8:
        bits.append(1)
    stuffed = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for bit in bits[i:i + 8]:
            byte = (byte << 1) | bit
        stuffed.append(byte)
        if byte == 0xFF:
            stuffed.append(0x00)
    out.append(bytes(stuffed))
    out.append(b"\xff\xd9")
    return b"".join(out)


def resize_jpeg(body: bytes, max_side: int) -> tuple[bytes, int, int] | None:
    """REAL JPEG resize: full baseline decode
    (:func:`decode_jpeg_pixels`), the same nearest-neighbor index
    gather as :func:`resize_bmp`, then a real re-encode
    (:func:`encode_jpeg`).  None for streams the decoder rejects
    (progressive/arithmetic/corrupt) — the dispatch falls back to the
    byte-proportional stand-in."""
    import numpy as np

    raster = decode_jpeg_pixels(body)
    if raster is None:
        return None
    h, w = raster.shape[0], raster.shape[1]
    if max(w, h) <= max_side:
        return body, w, h          # already small: pass through verbatim
    scale = min(1.0, max_side / max(w, h, 1))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    yi = (np.arange(nh) * (h / nh)).astype(int)
    xi = (np.arange(nw) * (w / nw)).astype(int)
    return encode_jpeg(raster[yi][:, xi]), nw, nh


def make_jpeg(width: int, height: int) -> bytes:
    """Complete valid baseline JPEG (grayscale, DC-only blocks): block
    (bx, by) is a flat patch of value ``(17·bx + 29·by) mod 256`` — a
    closed-form raster, so a SQL oracle can recompute what
    :func:`decode_jpeg_pixels` must read back, crop included.  Real
    markers, a real canonical Huffman table (categories 0-11 as 4-bit
    codes), real bit-packed entropy data."""
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    # DC table: categories 0..11 as canonical 4-bit codes; AC: EOB='0'
    dc_counts = [0, 0, 0, 12] + [0] * 12
    dc_syms = list(range(12))
    ac_counts = [1] + [0] * 15
    ac_syms = [0x00]

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    out = [b"\xff\xd8",
           seg(0xDB, bytes([0]) + bytes([1] * 64)),
           seg(0xC0, bytes([8]) + struct.pack(">HH", height, width)
               + bytes([1, 1, 0x11, 0])),
           seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms)),
           seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms)),
           seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))]
    bits: list[int] = []

    def put(v, n):
        for k in range(n - 1, -1, -1):
            bits.append((v >> k) & 1)

    pred = 0
    for by in range(bh):
        for bx in range(bw):
            v = (17 * bx + 29 * by) % 256
            dc = (v - 128) * 8
            diff = dc - pred
            pred = dc
            t = abs(diff).bit_length()
            put(0b0000 + t, 4)              # DC category code (4 bits)
            if t:
                put(diff if diff >= 0 else diff + (1 << t) - 1, t)
            bits.append(0)                  # AC EOB ('0')
    while len(bits) % 8:
        bits.append(1)
    stuffed = bytearray()
    for i in range(0, len(bits), 8):
        byte = int("".join(map(str, bits[i:i + 8])), 2)
        stuffed.append(byte)
        if byte == 0xFF:             # spec: stuff a zero after 0xFF
            stuffed.append(0x00)
    out.append(bytes(stuffed))
    out.append(b"\xff\xd9")
    return b"".join(out)


def documents_as_jpeg(docs: DataFrame) -> DataFrame:
    """Wrap the documents fixture as REAL baseline JPEG payloads
    (:func:`make_jpeg`; dims from the same n_chars formulas as
    :func:`documents_as_media`) — the oracle-checkable corpus for the
    JPEG decoder."""
    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, src, nch in zip(pdf["doc_id"], pdf["source"],
                                     pdf["n_chars"]):
                did, nch = int(did), int(nch)
                w = 4 + nch % 60
                h = 4 + (nch // 7) % 60
                payload = make_jpeg(w, h)
                rows.append((did, payload, "image",
                             {"source": src, "bytes": len(payload)}))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "media_type",
                               "meta"])

    return (docs.select("doc_id", "source", "n_chars")
            .mapInPandas(build, schema=MEDIA_SCHEMA))


AHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("ahash", T.StringType()),
])


def ahash(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual average-hash over REAL decoded PNG rasters: nearest-
    neighbor downsample to ``grid``×``grid``, each cell emits 1 iff its
    value exceeds the grid mean — the classic aHash image-dedup
    fingerprint (identical rasters collide; near-identical rasters land
    within small Hamming distance).

    The hash is emitted as a ``grid²``-char bit string in (row, col)
    scan order, and the mean compare stays in integers
    (``px·grid² > Σpx``) so the fingerprint is bit-stable across
    engines and batch splits.  Non-PNG / undecodable payloads yield
    null.  Arrow-batched ``mapInPandas``; at scale partition by a
    size-balanced key so one giant payload doesn't skew a task."""
    n2 = grid * grid

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                body = bytes(p or b"")
                r = decode_png_pixels(body)
                if r is None:
                    rows.append((int(m), None))
                    continue
                raster, ctype = r
                ch = _PNG_CHANNELS[ctype]
                h = raster.shape[0]
                w = raster.shape[1] // ch
                # first channel only (the synthetic corpus is
                # grayscale; for RGB this is the R plane)
                samples = [
                    int(raster[(y * h) // grid, ((x * w) // grid) * ch])
                    for y in range(grid) for x in range(grid)]
                tot = sum(samples)
                bits = "".join(
                    "1" if px * n2 > tot else "0" for px in samples)
                rows.append((int(m), bits))
            yield pd.DataFrame(rows, columns=["media_id", "ahash"])

    return media.select("media_id", "payload").mapInPandas(
        run, schema=AHASH_SCHEMA)


# --------------------------------------------------------- MP4 (ISO BMFF)
# Video containers: the ISO base media file format (MPEG-4 Part 12,
# publicly specified) is a pure box tree — size-prefixed fourcc chunks —
# so duration, track dimensions and sample counts parse with stdlib
# struct alone, no codec.  Frame PIXEL decode (H.264 et al.) is
# explicitly out of scope without a codec library; the GIF path above
# (extract_frames) is the real byte-level frame-sampling demo.

def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def make_mp4(width: int, height: int, n_frames: int,
             timescale: int = 1000, fps: int = 10) -> bytes:
    """Minimal complete ISO BMFF file with one video track: ftyp +
    moov(mvhd, trak(tkhd, mdia(mdhd, hdlr'vide', minf(stbl(stsd/avc1,
    stts, stsc, stsz, stco))))) + mdat.  Deterministic; every field the
    decoder reads is derived from the arguments."""
    delta = timescale // fps
    duration = n_frames * delta
    identity = (struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                            0, 0, 0x40000000))
    mvhd = _box(b"mvhd", struct.pack(">IIIII", 0, 0, 0, timescale,
                                     duration)
                + struct.pack(">IHH", 0x00010000, 0x0100, 0)
                + b"\0" * 8 + identity + b"\0" * 24
                + struct.pack(">I", 2))
    tkhd = _box(b"tkhd", struct.pack(">IIIII", 3, 0, 0, 1, 0)
                + struct.pack(">I", duration) + b"\0" * 8
                + struct.pack(">HHHH", 0, 0, 0, 0) + identity
                + struct.pack(">II", width << 16, height << 16))
    mdhd = _box(b"mdhd", struct.pack(">IIIIIHH", 0, 0, 0, timescale,
                                     duration, 0x55C4, 0))
    hdlr = _box(b"hdlr", struct.pack(">II", 0, 0) + b"vide"
                + b"\0" * 12 + b"v\0")
    avc1 = _box(b"avc1", b"\0" * 6 + struct.pack(">H", 1)
                + b"\0" * 16 + struct.pack(">HH", width, height)
                + struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)
                + b"\0" * 32 + struct.pack(">Hh", 24, -1))
    stsd = _box(b"stsd", struct.pack(">II", 0, 1) + avc1)
    stts = _box(b"stts", struct.pack(">IIII", 0, 1, n_frames, delta))
    stsc = _box(b"stsc", struct.pack(">IIIII", 0, 1, 1, n_frames, 1))
    stsz = _box(b"stsz", struct.pack(">III", 0, 1, n_frames))
    stco = _box(b"stco", struct.pack(">III", 0, 1, 0))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512)
                + b"isommp42")
    mdat = _box(b"mdat", bytes(min(n_frames, 64)))
    return ftyp + moov + mdat


def _walk_boxes(b: bytes, i: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for the sibling boxes
    in ``b[i:end]``; tolerates 64-bit largesize and size-0 (to end),
    stops cleanly on truncation."""
    while i + 8 <= end:
        size = struct.unpack(">I", b[i:i + 4])[0]
        tag = b[i + 4:i + 8]
        body = i + 8
        if size == 1:
            if i + 16 > end:
                return
            size = struct.unpack(">Q", b[i + 8:i + 16])[0]
            body = i + 16
        elif size == 0:
            size = end - i
        if size < 8 or i + size > end:
            return
        yield tag, body, i + size
        i += size


def _find_box(b: bytes, i: int, end: int, tag: bytes):
    for t, s, e in _walk_boxes(b, i, end):
        if t == tag:
            return s, e
    return None


def decode_video(payload) -> dict | None:
    """Parse a real MP4/ISO-BMFF container: movie timescale + duration
    from ``mvhd``, the video track's pixel dimensions from its ``tkhd``
    (16.16 fixed point), and the frame count by summing the track's
    ``stts`` sample runs.  Version-0 and version-1 (64-bit) headers
    both handled.  ``None`` for non-BMFF/truncated payloads — null
    columns downstream, never a task failure."""
    b = bytes(payload or b"")
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None
    moov = _find_box(b, 0, len(b), b"moov")
    if moov is None:
        return None
    mvhd = _find_box(b, moov[0], moov[1], b"mvhd")
    if mvhd is None:
        return None
    ver = b[mvhd[0]]
    if ver == 1:
        timescale = struct.unpack(">I", b[mvhd[0] + 20:mvhd[0] + 24])[0]
        duration = struct.unpack(">Q", b[mvhd[0] + 24:mvhd[0] + 32])[0]
    else:
        timescale, duration = struct.unpack(
            ">II", b[mvhd[0] + 12:mvhd[0] + 20])
    if not timescale:
        return None
    for tag, s, e in _walk_boxes(b, moov[0], moov[1]):
        if tag != b"trak":
            continue
        mdia = _find_box(b, s, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find_box(b, mdia[0], mdia[1], b"hdlr")
        if hdlr is None or b[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        tkhd = _find_box(b, s, e, b"tkhd")
        if tkhd is None or tkhd[1] - tkhd[0] < 8:
            continue
        w16, h16 = struct.unpack(">II", b[tkhd[1] - 8:tkhd[1]])
        n_frames = 0
        minf = _find_box(b, mdia[0], mdia[1], b"minf")
        stbl = (minf and _find_box(b, minf[0], minf[1], b"stbl"))
        stts = (stbl and _find_box(b, stbl[0], stbl[1], b"stts"))
        if stts:
            cnt = struct.unpack(">I", b[stts[0] + 4:stts[0] + 8])[0]
            for k in range(cnt):
                off = stts[0] + 8 + k * 8
                if off + 8 > stts[1]:
                    break
                n_frames += struct.unpack(">I", b[off:off + 4])[0]
        return {"fmt": "mp4", "width": w16 >> 16, "height": h16 >> 16,
                "n_frames": n_frames,
                "duration_ms": duration * 1000 // timescale}
    return None


VIDEO_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("fmt", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])


def video_features(media: DataFrame) -> DataFrame:
    """Container-level video metadata from the ACTUAL bytes (box walk,
    no codec) — Arrow-batched ``mapInPandas``, narrow map, no shuffle;
    unrecognized payloads surface as null columns."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                d = decode_video(p)
                if d is None:
                    rows.append((int(m), None, None, None, None, None))
                else:
                    rows.append((int(m), d["fmt"], d["width"],
                                 d["height"], d["n_frames"],
                                 d["duration_ms"]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "fmt", "width", "height", "n_frames",
                "duration_ms"])

    return media.select("media_id", "payload").mapInPandas(
        run, schema=VIDEO_FEATURE_SCHEMA)


def documents_as_video(docs: DataFrame) -> DataFrame:
    """Wrap the documents fixture as a video table with REAL MP4
    payloads: ``width = 16 + n_chars % 120``, ``height = 16 +
    (n_chars // 7) % 120``, ``n_frames = 1 + doc_id % 24`` at 10 fps /
    1000 timescale — so a SQL oracle can recompute every field the
    box-walking decoder must read back from the bytes."""
    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, src, nch in zip(pdf["doc_id"], pdf["source"],
                                     pdf["n_chars"]):
                did, nch = int(did), int(nch)
                payload = make_mp4(16 + nch % 120, 16 + (nch // 7) % 120,
                                   1 + did % 24)
                rows.append((did, payload, "video",
                             {"source": src, "bytes": len(payload)}))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "media_type", "meta"])

    return (docs.select("doc_id", "source", "n_chars")
            .mapInPandas(build, schema=MEDIA_SCHEMA))
