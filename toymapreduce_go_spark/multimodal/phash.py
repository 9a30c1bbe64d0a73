"""Perceptual image hashing (DCT pHash) + Hamming near-dup — multimodal
DEDUP, the image-side twin of the text tier's SimHash.

Reference scope note: the reference runtime (pkg/mapreduce, ~1.7k LoC Go)
ships no image operators at all; this module is part of the
training-data-pipeline surface (multimodal dedup) built Spark-first on
top of the repo's own pure-stdlib/numpy codecs (multimodal/binary.py,
multimodal/jpeg.py).

The hash is the classic DCT perceptual hash (Zauner, "Implementation and
Benchmarking of Perceptual Image Hash Functions", 2010 — the pHash
library's DCT variant):

    grayscale → 32×32 bilinear resample → 2-D DCT-II →
    keep the 8×8 lowest-frequency block → drop the DC term →
    threshold the 63 AC coefficients against their median →
    one bit per coefficient, packed into a BIGINT.

Near-identical pixel content (lossy re-encode, slight noise) moves few
bits; unrelated images disagree on ~half. 63 bits (not 64) is
deliberate: the packed value stays in the non-negative range of a
signed long, so block extraction needs no sign-bit special-casing.

Spark shape (the 100 TB posture):
- hashing is ONE fused mapInPandas stage at scan parallelism —
  synthesize (the stand-in for reading a binary parquet column) →
  decode → hash, per Arrow batch, with the DCT as two numpy matmuls;
  no shuffle, no driver state;
- near-dup candidate generation is the same pigeonhole block join as
  ``simhash_hamming_pairs`` (Manku et al., WWW'07): 63 bits → 7 blocks
  × 9 bits, so any pair within Hamming ≤ 6 agrees exactly on ≥ 1
  block and docs meet only on 9-bit block-value collisions, never
  all-pairs;
- verification is one codegen'd ``bit_count(xor)`` per candidate.

Correctness tier: pytest-invariant (DuckDB cannot decode images) — the
contract is distributed-equals-local recomputation, re-encode
robustness measured through the real JPEG codec, and planted-pair
detection (tests/test_phash.py), the same convention as
audio/video_stats.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .binary import PNG_MAGIC, _text_rows, real_decode_pixels, \
    synthesize_real_image

PHASH_BITS = 63
PHASH_SIZE = 32          # resample target (32×32) before the DCT
PHASH_BLOCK = 8          # keep the 8×8 low-frequency corner


@lru_cache(maxsize=1)
def _dct_matrix(n: int = PHASH_SIZE) -> np.ndarray:
    """Orthonormal DCT-II basis matrix: row k = cos((2j+1)kπ/2n)."""
    j = np.arange(n)
    mat = np.cos((2 * j[None, :] + 1) * j[:, None] * np.pi / (2 * n))
    mat[0] *= 1.0 / np.sqrt(2.0)
    return mat * np.sqrt(2.0 / n)


def _resample32(gray: np.ndarray) -> np.ndarray:
    """Deterministic bilinear resample of an h×w float64 plane to
    32×32, sampling at pixel centers (the align-corners=False
    convention). Pure float64 numpy — bit-identical wherever it runs."""
    n = PHASH_SIZE
    h, w = gray.shape
    if (h, w) == (n, n):
        # the bilinear weights are exactly (1, 0) at native size (the
        # sample points land on pixel centers), so this is the identity
        return gray
    ys = np.clip((np.arange(n) + 0.5) * h / n - 0.5, 0.0, h - 1.0)
    xs = np.clip((np.arange(n) + 0.5) * w / n - 0.5, 0.0, w - 1.0)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    top = gray[y0][:, x0] * (1.0 - wx) + gray[y0][:, x1] * wx
    bot = gray[y1][:, x0] * (1.0 - wx) + gray[y1][:, x1] * wx
    return top * (1.0 - wy) + bot * wy


def phash63(width: int, height: int, channels: int, pixels: bytes) -> int:
    """63-bit DCT perceptual hash of one decoded image (see module
    docstring). Multi-channel input is averaged to luma-less grayscale
    (equal channel weights — deterministic and codec-independent)."""
    arr = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    arr = arr.reshape(height, width * channels)
    if channels > 1:
        arr = arr.reshape(height, width, channels).mean(axis=2)
    small = _resample32(arr)
    d = _dct_matrix()
    coefs = d @ small @ d.T
    ac = coefs[:PHASH_BLOCK, :PHASH_BLOCK].ravel()[1:]   # drop DC
    med = float(np.median(ac))
    bits = np.nonzero(ac > med)[0]
    return int(np.sum((np.int64(1) << bits.astype(np.int64))))


PHASH_SCHEMA = "doc_id long, source string, format string, phash long"


def hash_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, source, payload) → (doc_id, source,
    format, phash). Full decode via the repo codecs; progressive JPEGs
    route declaratively to their own decoder (same protocol as
    ``decode_pixel_stats``) and keep the routing label."""
    from .jpeg import decode_progressive, is_progressive

    for pdf in batches:
        rows = {k: [] for k in ("doc_id", "source", "format", "phash")}
        for doc_id, source, payload in zip(pdf["doc_id"], pdf["source"],
                                           pdf["payload"]):
            payload = bytes(payload)
            if payload[:8] == PNG_MAGIC:
                fmt = "png"
                w, h, c, pix = real_decode_pixels(payload)
            elif is_progressive(payload):
                fmt = "jpeg_progressive"
                w, h, c, pix = decode_progressive(payload)
            else:
                fmt = "jpeg"
                w, h, c, pix = real_decode_pixels(payload)
            rows["doc_id"].append(doc_id)
            rows["source"].append(source)
            rows["format"].append(fmt)
            rows["phash"].append(phash63(w, h, c, pix))
        yield pd.DataFrame({
            "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
            "source": pd.Series(rows["source"], dtype="object"),
            "format": pd.Series(rows["format"], dtype="object"),
            "phash": pd.Series(rows["phash"], dtype="int64"),
        })


def image_phashes(documents: DataFrame) -> DataFrame:
    """Per-document perceptual hash over REAL decodable containers:
    synthesize → decode → hash in ONE fused Python stage (scan
    parallelism, no shuffle) — the binary column stand-in convention of
    ``pixel_stats_query``."""
    return _text_rows(documents).mapInPandas(
        lambda batches: hash_payloads(synthesize_real_image(batches)),
        schema=PHASH_SCHEMA)


def image_phash_buckets(documents: DataFrame) -> DataFrame:
    """Images whose perceptual hashes collide exactly — the image twin
    of ``simhash_buckets`` (exact-bucket tier: re-encoded or
    byte-identical images of the same pixel content)."""
    return (
        image_phashes(documents)
        .groupBy("phash").agg(F.count("*").alias("n_images"),
                              F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("n_images") > 1)
        .orderBy("phash")
    )


PHASH_N_BLOCKS = 9       # 7-bit blocks joined on triples at k=6: the
                         # collision-rate knob — see hamming_block_pairs


def image_phash_pairs(documents: DataFrame,
                      max_hamming: int = 6,
                      n_blocks: int = PHASH_N_BLOCKS) -> DataFrame:
    """All image pairs with pHash Hamming distance ≤ max_hamming via
    the shared pigeonhole block join (``dedup.hamming_block_pairs``) —
    the image twin of ``simhash_hamming_pairs``. 9 blocks of 7 bits
    joined on block TRIPLES (t = 9 − 6 clean blocks guaranteed by
    pigeonhole): the default max_hamming+1 split would join 63 bits on
    9-bit values — only 512 buckets, candidates ∝ n²/146 (measured
    153M candidates at 150k images) — where the C(9,3)=84 21-bit
    triple keys cut that ~340×. Exact either way; one
    ``bit_count(xor)`` verifies each candidate."""
    from ..operators.dedup import hamming_block_pairs, hamming_block_width

    hamming_block_width(PHASH_BITS, max_hamming,
                        n_blocks)                  # fail before decoding
    # Unlike simhash (codegen'd JVM expressions, cheap to recompute), the
    # decode+hash stage is ~1 ms/doc of Python — and Spark does not reuse
    # the exchange across the self-join sides (PythonUDF subplans don't
    # canonicalize equal), so without a lineage cut every image decodes
    # TWICE. localCheckpoint materializes the tiny (doc_id, phash) table
    # once and both join sides read it.
    sigs = (image_phashes(documents).select("doc_id", "phash")
            .localCheckpoint(eager=False))
    return hamming_block_pairs(sigs, "phash", PHASH_BITS, max_hamming,
                               n_blocks)
