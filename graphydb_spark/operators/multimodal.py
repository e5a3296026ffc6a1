"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference extension (SURVEY.md §7.3).  Images/audio/video travel as
``binary`` columns with a metadata struct; decode/feature steps run as
Arrow-batched ``mapInPandas`` so each Python worker sees columnar batches,
never rows.  The actual codec calls are STUBBED (pillow/ffmpeg are not in
this container — ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``); the Spark-side plumbing (schema, batching, partitioning)
is real and tested.
"""

from __future__ import annotations

import hashlib
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
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("feat_hash", T.StringType(), True),
])


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Wrap the documents fixture as a media table (payload = utf-8 bytes)
    so the binary plumbing is exercisable without image fixtures."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image").alias("media_type"),
        F.struct(F.col("source").alias("source"),
                 F.col("n_chars").cast("long").alias("bytes")).alias("meta"))


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for a real decoder: dimensions derived from
    the payload hash.  Replace with PIL/ffmpeg in a full container."""
    h = hashlib.md5(payload or b"").hexdigest()
    width = 64 + int(h[:4], 16) % 1920
    height = 64 + int(h[4:8], 16) % 1080
    n_frames = 1 + int(h[8:10], 16) % 16
    return width, height, n_frames, h


def decode_image(payload: bytes):
    """Real decode stub — requires an imaging library not in this
    container."""
    raise NotImplementedError(
        "image decoding requires pillow/opencv; use extract_features(..., "
        "fake=True) for the deterministic test double")


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps the transfer columnar; at scale, repartition by a
    size-balanced key first so one giant video doesn't skew a task.
    """
    if not fake:
        decode_image(b"")  # raises NotImplementedError

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [(int(m), *_fake_decode(p))
                    for m, p in zip(pdf["media_id"], pdf["payload"])]
            out = pd.DataFrame(rows, columns=["media_id", "width", "height",
                                              "n_frames", "feat_hash"])
            yield out

    return media.select("media_id", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Plan frame sampling: explode per-media frame indices (metadata only;
    decoding stubbed).  Shows the fan-out shape: one row per kept frame."""
    feats = extract_features(media)
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return feats.select("media_id", F.explode(idx).alias("frame_idx"))


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])


def resize(media: DataFrame, max_side: int = 256,
           fake: bool = True) -> DataFrame:
    """Arrow-batched resize: payload in → (smaller) payload out, with the
    scaled dimensions.  The pixel work is STUBBED (the fake keeps a
    deterministic byte prefix proportional to the area ratio); the
    Spark-side shape is the real one — a binary-to-binary mapInPandas
    whose output batches are smaller than the input, which is exactly the
    memory profile a thumbnailing stage has at scale.  Aspect ratio is
    preserved; media already within ``max_side`` pass through unchanged.
    """
    if not fake:
        decode_image(b"")  # raises NotImplementedError

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, _, _ = _fake_decode(p)
                scale = min(1.0, max_side / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                body = bytes(p or b"")
                keep = max(1, int(len(body) * scale * scale))
                out_rows.append((int(m), body[:keep], nw, nh))
            yield pd.DataFrame(
                out_rows, columns=["media_id", "payload", "width", "height"])

    return media.select("media_id", "payload").mapInPandas(
        run, schema=RESIZED_SCHEMA)
