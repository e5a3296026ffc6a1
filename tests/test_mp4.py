"""MP4/ISO-BMFF box walking: decode robustness + the Spark operator."""

import struct

from graphydb_spark.operators import multimodal as M


def test_mp4_roundtrip():
    d = M.decode_video(M.make_mp4(320, 240, 17))
    assert d == {"fmt": "mp4", "width": 320, "height": 240,
                 "n_frames": 17, "duration_ms": 1700}


def test_mp4_rejects_garbage_and_truncation():
    b = M.make_mp4(64, 48, 3)
    assert M.decode_video(b"") is None
    assert M.decode_video(b"notavideo") is None
    assert M.decode_video(b[:10]) is None
    # cut inside moov: walker stops cleanly, no exception
    assert M.decode_video(b[:60]) is None


def test_mp4_version1_mvhd_and_largesize():
    # rebuild the file with a version-1 (64-bit) mvhd and wrap moov in
    # a largesize box header — both legal BMFF encodings
    mvhd_v1 = M._box(
        b"mvhd", struct.pack(">B3x", 1) + struct.pack(">QQIQ", 0, 0,
                                                      1000, 4200)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0) + b"\0" * 8
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000) + b"\0" * 24 + struct.pack(">I", 2))
    base = M.make_mp4(100, 50, 7)
    # locate original moov and splice: ftyp + largesize(moov') + rest
    ftyp_len = struct.unpack(">I", base[:4])[0]
    moov_len = struct.unpack(">I", base[ftyp_len:ftyp_len + 4])[0]
    moov_body = base[ftyp_len + 8:ftyp_len + moov_len]
    # swap v0 mvhd (first child) for the v1 one
    old_mvhd_len = struct.unpack(">I", moov_body[:4])[0]
    new_body = mvhd_v1 + moov_body[old_mvhd_len:]
    largesize_moov = (struct.pack(">I", 1) + b"moov"
                      + struct.pack(">Q", 16 + len(new_body)) + new_body)
    rebuilt = base[:ftyp_len] + largesize_moov + base[ftyp_len + moov_len:]
    d = M.decode_video(rebuilt)
    assert d == {"fmt": "mp4", "width": 100, "height": 50,
                 "n_frames": 7, "duration_ms": 4200}


def test_mp4_multi_run_stts():
    # two stts runs (3 + 4 frames): frame count sums the runs
    b = M.make_mp4(32, 32, 3)
    one_run = M._box(b"stts", struct.pack(">IIII", 0, 1, 3, 100))
    two_run = M._box(b"stts", struct.pack(">II", 0, 2)
                     + struct.pack(">II", 3, 100)
                     + struct.pack(">II", 4, 50))
    assert one_run in b
    d = M.decode_video(b.replace(one_run, two_run))
    assert d["n_frames"] == 7


def test_video_features_operator(spark):
    rows = [(1, M.make_mp4(20, 10, 2), "video", {}),
            (2, b"junk", "video", {}),
            (3, M.make_mp4(640, 480, 24), "video", {})]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in
           M.video_features(media).collect()}
    assert out[1]["width"] == 20 and out[1]["n_frames"] == 2
    assert out[2]["fmt"] is None and out[2]["width"] is None
    assert out[3]["height"] == 480 and out[3]["duration_ms"] == 2400
