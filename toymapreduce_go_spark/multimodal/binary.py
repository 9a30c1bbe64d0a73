"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas via
``mapInPandas``.

The container has no image/audio libraries, so the *decode* step is a
deterministic fake (and the real-library hook raises NotImplementedError,
clearly marked). Everything around it — schema, Arrow batch shape, UDF
signature, partitioning — is real and tested: swap ``_fake_dims`` for a
PIL/libvips call and the pipeline is production-shaped.

Scale: mapInPandas streams Arrow batches, so a partition of binary blobs
never materializes as Python objects row-by-row; at 100 TB the binary
column lives in its own parquet column chunk and is only read by stages
that need it (column pruning keeps metadata-only queries cheap).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = ("doc_id long, source string, byte_len long, "
                  "width long, height long, channels long, n_pixels long")


def real_decode_image(payload: bytes) -> tuple[int, int, int]:
    """Hook for a real decoder (PIL/libvips). Not available in this
    container — STUB, clearly marked."""
    raise NotImplementedError(
        "image decoding requires PIL/libvips; not installed in this "
        "environment — use fake_decode_image for plumbing tests")


def _fake_dims(byte_len: "pd.Series") -> "pd.DataFrame":
    """Deterministic fake decode: dimensions derived from payload length
    (stands in for parsing a real image header)."""
    width = 64 + byte_len % 512
    height = 64 + (byte_len * 7) % 512
    return pd.DataFrame({
        "width": width, "height": height,
        "channels": 3, "n_pixels": width * height * 3,
    })


def fake_decode_image(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, source, payload binary) batches →
    decoded-metadata batches. Vectorized over each Arrow batch — no
    per-row Python."""
    for pdf in batches:
        byte_len = pdf["payload"].map(len).astype("int64")
        dims = _fake_dims(byte_len)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "source": pdf["source"],
            "byte_len": byte_len,
            "width": dims["width"],
            "height": dims["height"],
            "channels": dims["channels"],
            "n_pixels": dims["n_pixels"],
        })


def with_binary_payload(documents: DataFrame) -> DataFrame:
    """Manufacture the opaque binary column from text (the testdata has no
    real image bytes); a real pipeline reads this column from parquet."""
    return documents.select(
        "doc_id", "source", F.encode(F.col("text"), "UTF-8").alias("payload"))


def decode_meta_query(documents: DataFrame) -> DataFrame:
    """Declared query: binary → mapInPandas fake-decode → per-source
    rollup of byte/pixel accounting. Oracle-checkable because the fake
    decode is pure arithmetic on octet length."""
    decoded = with_binary_payload(documents).mapInPandas(
        fake_decode_image, schema=DECODED_SCHEMA)
    return (
        decoded.groupBy("source")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("byte_len").alias("total_bytes"),
            F.sum("width").alias("sum_width"),
            F.sum("height").alias("sum_height"),
            F.sum("n_pixels").alias("total_pixels"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Chained transform plumbing: decode → resize → frame-sample. Each stage
# is its own mapInPandas with a real Arrow batch contract; the kernels
# are deterministic fakes (no media libs in this container) — swap the
# arithmetic for PIL/ffmpeg calls and the stages are production-shaped.

DECODE_KEEP_SCHEMA = ("doc_id long, source string, payload binary, "
                      "byte_len long, width long, height long")
RESIZED_SCHEMA = ("doc_id long, source string, byte_len long, "
                  "width long, height long, resized_bytes long")
SAMPLED_SCHEMA = RESIZED_SCHEMA + ", n_frames long, n_sampled long"

TARGET_W, TARGET_H = 64, 64
FRAME_BYTES = 1024          # fake: one "frame" per KiB of payload
SAMPLE_EVERY = 4


def decode_keep_payload(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Stage 1 — decode: parse dimensions (fake: from octet length),
    keep the payload for downstream pixel-level stages."""
    for pdf in batches:
        byte_len = pdf["payload"].map(len).astype("int64")
        dims = _fake_dims(byte_len)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"], "source": pdf["source"],
            "payload": pdf["payload"], "byte_len": byte_len,
            "width": dims["width"], "height": dims["height"],
        })


def resize_to_thumbnail(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Stage 2 — resize: produce thumbnail byte counts (fake: capped at
    TARGET_W*TARGET_H*3); drops the payload so later shuffles move
    metadata only — the real pipeline writes thumbnails to a sink here."""
    cap = TARGET_W * TARGET_H * 3
    for pdf in batches:
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"], "source": pdf["source"],
            "byte_len": pdf["byte_len"],
            "width": pdf["width"], "height": pdf["height"],
            "resized_bytes": pdf["byte_len"].clip(upper=cap),
        })


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Stage 3 — frame-sample: every SAMPLE_EVERY-th frame of the fake
    FRAME_BYTES-per-frame stream."""
    for pdf in batches:
        n_frames = 1 + pdf["byte_len"] // FRAME_BYTES
        yield pdf.assign(
            n_frames=n_frames,
            n_sampled=(n_frames + SAMPLE_EVERY - 1) // SAMPLE_EVERY,
        )


def multimodal_pipeline_query(documents: DataFrame) -> DataFrame:
    """Declared query: the full decode → resize → frame-sample chain,
    rolled up per source. Oracle-checkable because every fake kernel is
    pure arithmetic on octet length.

    The rollup also carries the decode-stage accounting (bytes, dims,
    pixels) so this one declared query certifies every stage end-to-end;
    the standalone ``decode_meta_query`` stays pytest-oracled."""
    staged = (
        with_binary_payload(documents)
        .mapInPandas(decode_keep_payload, schema=DECODE_KEEP_SCHEMA)
        .mapInPandas(resize_to_thumbnail, schema=RESIZED_SCHEMA)
        .mapInPandas(sample_frames, schema=SAMPLED_SCHEMA)
    )
    return (
        staged.groupBy("source")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("byte_len").alias("total_bytes"),
            F.sum("width").alias("sum_width"),
            F.sum("height").alias("sum_height"),
            F.sum(F.col("width") * F.col("height") * 3).alias("total_pixels"),
            F.sum("resized_bytes").alias("total_resized_bytes"),
            F.sum("n_frames").alias("total_frames"),
            F.sum("n_sampled").alias("total_sampled"),
        )
        .orderBy("source")
    )
