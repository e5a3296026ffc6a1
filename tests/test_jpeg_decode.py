"""Baseline JPEG decoder tests on hand-crafted streams: every byte of
the test vectors is constructed here (markers, canonical Huffman
tables, bit-packed entropy data), so the decoder is checked against
the specification, not against itself."""

import struct

import numpy as np

from graphydb_spark.operators.multimodal import _idct8, decode_jpeg_pixels


class _Bits:
    def __init__(self):
        self.bits = []

    def add(self, s):
        self.bits += [int(c) for c in s]

    def bytes(self):
        b = self.bits[:]
        while len(b) % 8:
            b.append(1)                      # pad with 1s per the spec
        return bytes(int("".join(map(str, b[i:i + 8])), 2)
                     for i in range(0, len(b), 8))


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
        + payload


def _counts(d):
    c = [0] * 16
    for ln, n in d.items():
        c[ln - 1] = n
    return c


def _sof0(w, h, comps):
    p = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs, tq in comps:
        p += bytes([cid, (hs << 4) | vs, tq])
    return _seg(0xC0, p)


def _sos(comps):
    p = bytes([len(comps)])
    for cid, td, ta in comps:
        p += bytes([cid, (td << 4) | ta])
    return _seg(0xDA, p + bytes([0, 63, 0]))


_QT = _seg(0xDB, bytes([0]) + bytes([1] * 64))
#: DC table: category 0 -> '0', category 4 -> '10'
_DC = _seg(0xC4, bytes([0x00]) + bytes(_counts({1: 1, 2: 1}))
           + bytes([0x00, 0x04]))
#: AC table: EOB -> '0', (run 0, size 1) -> '10'
_AC = _seg(0xC4, bytes([0x10]) + bytes(_counts({1: 1, 2: 1}))
           + bytes([0x00, 0x01]))


def _jpeg(w, h, comps_sof, comps_sos, bits):
    return (b"\xff\xd8" + _QT + _sof0(w, h, comps_sof) + _DC + _AC
            + _sos(comps_sos) + bits.bytes() + b"\xff\xd9")


def test_jpeg_flat_grayscale_dc():
    b = _Bits()
    b.add("10"); b.add("1000"); b.add("0")   # DC cat4 diff +8, EOB
    r = decode_jpeg_pixels(_jpeg(8, 8, [(1, 1, 1, 0)], [(1, 0, 0)], b))
    assert r.shape == (8, 8, 1) and (r == 129).all()


def test_jpeg_dc_prediction_across_blocks():
    b = _Bits()
    b.add("10"); b.add("1000"); b.add("0")   # DC = 8
    b.add("10"); b.add("0111"); b.add("0")   # diff -8 -> DC = 0
    r = decode_jpeg_pixels(_jpeg(16, 8, [(1, 1, 1, 0)], [(1, 0, 0)], b))
    assert (r[:, :8, 0] == 129).all() and (r[:, 8:, 0] == 128).all()


def test_jpeg_ac_coefficient_zigzag_and_idct():
    b = _Bits()
    b.add("0"); b.add("10"); b.add("1"); b.add("0")  # DC 0; AC(0,1)=+1
    r = decode_jpeg_pixels(_jpeg(8, 8, [(1, 1, 1, 0)], [(1, 0, 0)], b))
    want = np.clip(np.rint(_idct8(_c01()) + 128), 0, 255)
    assert (r[:, :, 0] == want).all()


def _c01():
    c = np.zeros((8, 8))
    c[0, 1] = 1.0
    return c


def test_jpeg_color_444_and_ycbcr():
    b = _Bits()
    b.add("10"); b.add("1000"); b.add("0")   # Y DC 8 -> 129
    b.add("0"); b.add("0")                   # Cb DC 0 -> centered 0
    b.add("10"); b.add("1000"); b.add("0")   # Cr DC 8 -> centered 1
    r = decode_jpeg_pixels(_jpeg(
        8, 8, [(1, 1, 1, 0), (2, 1, 1, 0), (3, 1, 1, 0)],
        [(1, 0, 0), (2, 0, 0), (3, 0, 0)], b))
    y, cb, cr = 129.0, 0.0, 1.0
    want = [round(y + 1.402 * cr),
            round(y - 0.344136 * cb - 0.714136 * cr),
            round(y + 1.772 * cb)]
    assert r.shape == (8, 8, 3) and (r[0, 0] == want).all()


def test_jpeg_420_mcu_order_and_upsampling():
    b = _Bits()
    for bits in ("1000", "0111", "1000", "0111"):   # Y: 129,128,129,128
        b.add("10"); b.add(bits); b.add("0")
    b.add("0"); b.add("0")                   # Cb flat
    b.add("0"); b.add("0")                   # Cr flat
    r = decode_jpeg_pixels(_jpeg(
        16, 16, [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)],
        [(1, 0, 0), (2, 0, 0), (3, 0, 0)], b))
    assert r.shape == (16, 16, 3)
    assert (r[0, 0] == 129).all() and (r[0, 8] == 128).all()
    assert (r[8, 0] == 129).all() and (r[8, 8] == 128).all()


def test_jpeg_rejects_progressive_and_garbage():
    # progressive SOF2 must be refused, as must junk
    prog = (b"\xff\xd8" + _QT
            + _seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8)
                   + bytes([1, 1, 0x11, 0])) + b"\xff\xd9")
    assert decode_jpeg_pixels(prog) is None
    assert decode_jpeg_pixels(b"\xff\xd8junk") is None


def test_pixel_stats_covers_jpeg(spark):
    from graphydb_spark.operators.multimodal import pixel_stats
    b = _Bits()
    b.add("10"); b.add("1000"); b.add("0")
    jp = _jpeg(8, 8, [(1, 1, 1, 0)], [(1, 0, 0)], b)
    media = spark.createDataFrame(
        [(1, bytearray(jp), "image", None)],
        "media_id long, payload binary, media_type string, meta string")
    r = pixel_stats(media).collect()[0]
    assert (r["fmt"], r["n_px"], r["px_sum"], r["px_sum_sq"]) == \
        ("jpeg", 64, 64 * 129, 64 * 129 * 129)


def test_jpeg_restart_markers_with_dri():
    """DRI=1 + RST0 between two single-block intervals: predictors
    reset, padding discarded, both blocks decode."""
    b1 = _Bits(); b1.add("10"); b1.add("1000"); b1.add("0")   # DC 8
    b2 = _Bits(); b2.add("10"); b2.add("1000"); b2.add("0")   # DC 8 again
    body = (b"\xff\xd8" + _QT + _sof0(16, 8, [(1, 1, 1, 0)]) + _DC + _AC
            + _seg(0xDD, struct.pack(">H", 1))                # DRI = 1
            + _sos([(1, 0, 0)])
            + b1.bytes() + b"\xff\xd0" + b2.bytes() + b"\xff\xd9")
    r = decode_jpeg_pixels(body)
    assert r is not None and (r[:, :, 0] == 129).all()


def test_jpeg_corrupt_streams_yield_none_not_crash():
    """The corrupt-to-nulls contract: structurally plausible but broken
    streams must return None, never raise."""
    # empty SOS body
    bad1 = (b"\xff\xd8" + _QT + _sof0(8, 8, [(1, 1, 1, 0)])
            + _seg(0xDA, b"") + b"\xff\xd9")
    # DHT declaring more symbols than it carries
    bad2 = (b"\xff\xd8" + _QT + _sof0(8, 8, [(1, 1, 1, 0)])
            + _seg(0xC4, bytes([0x00]) + bytes(_counts({1: 5})) + b"\x00")
            + _sos([(1, 0, 0)]) + b"\xff\xd9")
    assert decode_jpeg_pixels(bad1) is None
    assert decode_jpeg_pixels(bad2) is None


def test_make_jpeg_stuffs_ff_bytes():
    """Dimensions whose entropy stream contains 0xFF must still form a
    valid (stuffed) JPEG the decoder reads back."""
    from graphydb_spark.operators.multimodal import (decode_jpeg_pixels
                                                     as dec, make_jpeg)
    r = dec(make_jpeg(112, 16))
    assert r is not None and r.shape == (16, 112, 1)
    assert r[0, 0, 0] == 0 and r[0, 8, 0] == 17 and r[8, 0, 0] == 29


def test_encode_jpeg_flat_blocks_roundtrip_exact():
    """encode_jpeg is a full baseline encoder; with unit quant tables a
    flat 8×8 block carries only an integer DC, so the make_jpeg raster
    round-trips BIT-exactly through encode→decode."""
    from graphydb_spark.operators.multimodal import encode_jpeg, make_jpeg
    r = decode_jpeg_pixels(make_jpeg(64, 64))
    r2 = decode_jpeg_pixels(encode_jpeg(r))
    assert r2 is not None and np.array_equal(r, r2)


def test_encode_jpeg_arbitrary_rasters_near_exact():
    """Arbitrary rasters survive encode→decode within the coefficient
    round-to-integer step (gray ≤1, color ≤3 incl. the BT.601 forward/
    inverse transform pair) — unit quant tables discard nothing else."""
    from graphydb_spark.operators.multimodal import encode_jpeg
    rng = np.random.RandomState(7)
    g = rng.randint(0, 256, (37, 53, 1), dtype=np.uint8)
    g2 = decode_jpeg_pixels(encode_jpeg(g))
    assert g2 is not None
    assert int(np.abs(g.astype(int) - g2.astype(int)).max()) <= 1
    c = rng.randint(0, 256, (24, 31, 3), dtype=np.uint8)
    c2 = decode_jpeg_pixels(encode_jpeg(c))
    assert c2 is not None and c2.shape == (24, 31, 3)
    assert int(np.abs(c.astype(int) - c2.astype(int)).max()) <= 3


def test_resize_jpeg_real_nearest_neighbor_pixels():
    """resize_jpeg = decode → NN index gather → re-encode: the resized
    stream's DECODED pixels equal the NN-sample of the original's
    decoded raster exactly (flat source blocks → integer DCT); the
    BMP test's contract, now for the compressed format."""
    from graphydb_spark.operators.multimodal import make_jpeg, resize_jpeg
    body = make_jpeg(64, 48)
    orig = decode_jpeg_pixels(body)
    out, nw, nh = resize_jpeg(body, 32)
    assert (nw, nh) == (32, 24)
    small = decode_jpeg_pixels(out)
    yi = (np.arange(nh) * (48 / nh)).astype(int)
    xi = (np.arange(nw) * (64 / nw)).astype(int)
    assert np.array_equal(small, orig[yi][:, xi])
    # already-small payloads pass through verbatim
    assert resize_jpeg(body, 64)[0] == body


def test_resize_dispatch_covers_jpeg(spark):
    """The resize operator routes JPEG payloads through the real codec:
    output dims scale and the payload is itself a decodable JPEG."""
    from graphydb_spark.operators.multimodal import make_jpeg, resize
    rows = [(1, make_jpeg(60, 40)), (2, make_jpeg(10, 8))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in resize(df, max_side=30).collect()}
    assert (got[1].width, got[1].height) == (30, 20)
    assert (got[2].width, got[2].height) == (10, 8)   # pass-through
    dec = decode_jpeg_pixels(bytes(got[1].payload))
    assert dec is not None and dec.shape == (20, 30, 1)
