"""Video modality (round 7): raw MJPEG streams — concatenated baseline
JPEG frames, the actual wire format ffmpeg reads as ``.mjpeg`` — as an
opaque binary column with REAL frame splitting, frame sampling, and
pixel decode via the pure-stdlib codec (``multimodal.jpeg``).

Tier structure mirrors the image/audio paths:
- ``synthesize_mjpeg`` encodes N genuinely decodable JPEG frames per
  doc (deterministic per-frame content) and concatenates them.
- ``split_mjpeg`` finds frame boundaries by PARSING — segment walk to
  SOS, then an entropy scan honoring byte stuffing and RST markers
  until EOI. Searching for the 0xFFD9 byte pair naively would split
  inside entropy data; the scanner is the real thing.
- ``video_stats_query`` fuses synthesize → split → sample every k-th
  frame → full DCT decode of the sampled frames into one Arrow stage,
  rolled up per source. Pytest-tier: oracle is a driver-side
  recomputation with the same functions.

Scale: frame sampling happens INSIDE the decode stage, so unsampled
frames cost a marker scan (bytes skipped by length fields), never a
DCT — the exact cost shape a production frame-sampler (ffmpeg
``-vf select``) has, expressed over Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .binary import _text_rows

from .jpeg import decode_baseline, encode_baseline_gray_batch

SAMPLE_EVERY = 2

VIDEO_STATS_SCHEMA = ("doc_id long, source string, n_frames long, "
                      "n_sampled long, width long, height long, "
                      "avg_luma double")


def synthesize_mjpeg(doc_id: int, text: str, n_frames: int | None = None,
                     size: int = 16) -> bytes:
    """A raw MJPEG stream: ``n_frames`` concatenated baseline JPEGs.
    Frame f's pixels derive deterministically from (doc_id, f, text) —
    a smooth moving gradient (with the occasional mod-256 wrap edge),
    so sampled-frame luma differs per frame. Smooth content is the
    representative case: natural video quantizes to a handful of AC
    coefficients per block, which is what a JPEG entropy coder spends
    its time on in production — the earlier noise-like fixture measured
    the coder's adversarial worst case instead (every coefficient
    nonzero), which no real camera stream exhibits."""
    if n_frames is None:
        n_frames = 2 + (doc_id % 4)
    body = np.frombuffer(text.encode("utf-8") or b"\x00", dtype=np.uint8)
    f = np.arange(n_frames, dtype=np.int64)[:, None, None]
    x = np.arange(size, dtype=np.int64)
    y = np.arange(size, dtype=np.int64)[:, None]
    b0 = body[f % len(body)].astype(np.int64) + doc_id
    stack = ((b0 + 3 * x + 2 * y + 7 * f) % 256).astype(np.uint8)
    return b"".join(encode_baseline_gray_batch(stack, quality=85))


def _frame_end(stream: bytes, start: int) -> int:
    """Index just past the EOI of the frame starting at ``start`` —
    a real parse: walk marker segments to SOS, then scan entropy data
    honoring 0xFF00 stuffing and RSTn markers."""
    if stream[start:start + 2] != b"\xff\xd8":
        raise ValueError("MJPEG frame does not start with SOI")
    i = start + 2
    in_scan = False
    while i + 1 < len(stream):
        if not in_scan:
            if stream[i] != 0xFF:
                raise ValueError("bad marker alignment in MJPEG frame")
            marker = stream[i + 1]
            if marker == 0xD9:
                return i + 2
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(stream[i + 2:i + 4], "big")
            if seg_len < 2 or i + 2 + seg_len > len(stream):
                raise ValueError("truncated MJPEG segment")
            if marker == 0xDA:
                in_scan = True
            i += 2 + seg_len
        else:
            # C-speed scan: bytes.find jumps to the next 0xFF instead of
            # walking entropy bytes one-by-one in Python — this is what
            # keeps UNSAMPLED frames at marker-scan cost only.
            j = stream.find(b"\xff", i)
            if j < 0 or j + 1 >= len(stream):
                break  # falls through to 'missing EOI'
            i = j
            nxt = stream[i + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:  # stuffing / restart
                i += 2
                continue
            if nxt == 0xD9:
                return i + 2
            raise ValueError(
                f"unexpected marker 0xFF{nxt:02X} in MJPEG entropy data")
    raise ValueError("MJPEG frame missing EOI")


def split_mjpeg(stream: bytes) -> list[bytes]:
    """Frame boundaries of a raw MJPEG stream, by parsing."""
    frames = []
    pos = 0
    while pos < len(stream):
        end = _frame_end(stream, pos)
        frames.append(stream[pos:end])
        pos = end
    return frames


def synthesize_video(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = [synthesize_mjpeg(d, t)
                    for d, t in zip(pdf["doc_id"], pdf["text"])]
        yield pd.DataFrame({"doc_id": pdf["doc_id"],
                            "source": pdf["source"],
                            "payload": payloads})


def decode_video_stats(batches: Iterator[pd.DataFrame],
                       sample_every: int = SAMPLE_EVERY
                       ) -> Iterator[pd.DataFrame]:
    """payload → per-doc frame accounting + mean luma over the SAMPLED
    frames (every ``sample_every``-th), fully DCT-decoded."""
    for pdf in batches:
        rows = {k: [] for k in ("doc_id", "source", "n_frames",
                                "n_sampled", "width", "height",
                                "avg_luma")}
        for doc_id, source, payload in zip(pdf["doc_id"], pdf["source"],
                                           pdf["payload"]):
            frames = split_mjpeg(bytes(payload))
            sampled = frames[::sample_every]
            lumas = []
            w = h = 0
            for fr in sampled:
                w, h, _c, pix = decode_baseline(fr)
                lumas.append(float(np.frombuffer(pix, dtype=np.uint8)
                                   .sum()) / len(pix))
            rows["doc_id"].append(doc_id)
            rows["source"].append(source)
            rows["n_frames"].append(len(frames))
            rows["n_sampled"].append(len(sampled))
            rows["width"].append(w)
            rows["height"].append(h)
            rows["avg_luma"].append(sum(lumas) / len(lumas)
                                    if lumas else 0.0)
        yield pd.DataFrame({
            "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
            "source": pd.Series(rows["source"], dtype="object"),
            "n_frames": pd.Series(rows["n_frames"], dtype="int64"),
            "n_sampled": pd.Series(rows["n_sampled"], dtype="int64"),
            "width": pd.Series(rows["width"], dtype="int64"),
            "height": pd.Series(rows["height"], dtype="int64"),
            "avg_luma": pd.Series(rows["avg_luma"], dtype="float64"),
        })


def video_stats_query(documents: DataFrame) -> DataFrame:
    """Per-source video rollup over the fused synthesize + split +
    sample + decode stage."""
    decoded = _text_rows(documents).mapInPandas(
        lambda batches: decode_video_stats(synthesize_video(batches)),
        schema=VIDEO_STATS_SCHEMA)
    return (
        decoded.groupBy("source")
        .agg(F.count("*").alias("n_videos"),
             F.sum("n_frames").alias("total_frames"),
             F.sum("n_sampled").alias("total_sampled"),
             F.round(F.avg("avg_luma"), 4).alias("avg_luma"))
        .orderBy("source")
    )
