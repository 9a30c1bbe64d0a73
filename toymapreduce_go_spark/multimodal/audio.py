"""Audio modality (round 7): WAV/PCM as an opaque binary column with
typed metadata and REAL decode — PCM needs no codec, so unlike images
this modality is lossless end-to-end with nothing but ``struct``.

Same tier structure as the image path (``multimodal.binary``):
- ``synthesize_wav`` builds a genuinely valid RIFF/WAVE container
  (fmt + data chunks, PCM16 little-endian) — players open these files.
- ``parse_wav_header`` is a real RIFF chunk walk (sample rate,
  channels, bit depth, sample count) that works on any standard WAV.
- ``decode_pcm`` returns the actual samples.
- ``audio_stats_query`` runs synthesize → full decode → per-doc
  signal statistics (duration, RMS, peak, zero-crossing rate) in one
  fused Arrow stage, rolled up per source. Pytest-tier: the oracle is
  a driver-side recomputation with the same functions (DuckDB cannot
  parse RIFF).

Scale: identical posture to the image pipeline — the binary column
lives in its own parquet chunk, decode is a fused single-Python-stage
``mapInPandas``, and per-doc stats are a few floats so the rollup
shuffle is metadata-sized.
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .binary import _text_rows

DEFAULT_RATE = 8000

AUDIO_STATS_SCHEMA = ("doc_id long, source string, sample_rate long, "
                      "n_samples long, duration_ms double, rms double, "
                      "peak long, zero_crossings long")


def synthesize_wav(samples: list[int], sample_rate: int = DEFAULT_RATE,
                   channels: int = 1) -> bytes:
    """A valid PCM16 WAV: RIFF header, fmt chunk, data chunk."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav_header(payload: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, channels, bits_per_sample, n_samples) via a real
    RIFF chunk walk — unknown chunks (LIST, fact, ...) are skipped by
    their length fields like any compliant reader. Raises ValueError
    on non-WAV or truncated input."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data_len = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        if pos + 8 + clen > len(payload):
            raise ValueError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", payload[pos + 8:pos + 24])
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data_len is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1:
        raise ValueError(f"only PCM WAV supported (format {audio_format})")
    n_samples = data_len // (channels * bits // 8)
    return rate, channels, bits, n_samples


def decode_pcm(payload: bytes) -> list[int]:
    """The actual samples (PCM16, interleaved if multi-channel)."""
    rate, channels, bits, n = parse_wav_header(payload)
    if bits != 16:
        raise ValueError("only 16-bit PCM decode implemented")
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        if cid == b"data":
            raw = payload[pos + 8:pos + 8 + clen]
            return list(struct.unpack(f"<{clen // 2}h", raw[:clen & ~1]))
        pos += 8 + clen + (clen & 1)
    raise ValueError("WAV missing data chunk")


def _doc_waveform(doc_id: int, text: str,
                  rate: int = DEFAULT_RATE) -> list[int]:
    """Deterministic per-doc test signal: a fundamental whose frequency
    and duration derive from (doc_id, len(text)) plus one harmonic —
    audio-shaped (periodic, zero-mean) rather than byte noise, so RMS /
    zero-crossing stats are meaningful."""
    n = rate // 20 + (len(text) % 400)  # 50-100 ms
    f0 = 110.0 * (1 + doc_id % 8)
    amp = 8000 + (len(text) * 37) % 16000
    return [int(amp * (math.sin(2 * math.pi * f0 * t / rate)
                       + 0.5 * math.sin(4 * math.pi * f0 * t / rate)) / 1.5)
            for t in range(n)]


def synthesize_audio(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(doc_id, source, text) → (doc_id, source, payload) with real WAV
    containers around the per-doc deterministic signal."""
    for pdf in batches:
        payloads = [synthesize_wav(_doc_waveform(d, t))
                    for d, t in zip(pdf["doc_id"], pdf["text"])]
        yield pd.DataFrame({"doc_id": pdf["doc_id"],
                            "source": pdf["source"],
                            "payload": payloads})


def decode_audio_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """payload → per-doc signal statistics via the FULL PCM decode."""
    for pdf in batches:
        rows = {k: [] for k in ("doc_id", "source", "sample_rate",
                                "n_samples", "duration_ms", "rms",
                                "peak", "zero_crossings")}
        for doc_id, source, payload in zip(pdf["doc_id"], pdf["source"],
                                           pdf["payload"]):
            payload = bytes(payload)
            rate, _ch, _bits, _n = parse_wav_header(payload)
            s = decode_pcm(payload)
            zc = sum(1 for i in range(1, len(s))
                     if (s[i - 1] < 0) != (s[i] < 0))
            rows["doc_id"].append(doc_id)
            rows["source"].append(source)
            rows["sample_rate"].append(rate)
            rows["n_samples"].append(len(s))
            rows["duration_ms"].append(1000.0 * len(s) / rate)
            rows["rms"].append(math.sqrt(sum(x * x for x in s) / len(s))
                               if s else 0.0)
            rows["peak"].append(max((abs(x) for x in s), default=0))
            rows["zero_crossings"].append(zc)
        yield pd.DataFrame({
            "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
            "source": pd.Series(rows["source"], dtype="object"),
            "sample_rate": pd.Series(rows["sample_rate"], dtype="int64"),
            "n_samples": pd.Series(rows["n_samples"], dtype="int64"),
            "duration_ms": pd.Series(rows["duration_ms"], dtype="float64"),
            "rms": pd.Series(rows["rms"], dtype="float64"),
            "peak": pd.Series(rows["peak"], dtype="int64"),
            "zero_crossings": pd.Series(rows["zero_crossings"],
                                        dtype="int64"),
        })


def audio_stats_query(documents: DataFrame) -> DataFrame:
    """Per-source audio rollup over the fused synthesize+decode stage:
    total duration, mean RMS, max peak, mean zero-crossing rate."""
    decoded = _text_rows(documents).mapInPandas(
        lambda batches: decode_audio_stats(synthesize_audio(batches)),
        schema=AUDIO_STATS_SCHEMA)
    return (
        decoded.groupBy("source")
        .agg(F.count("*").alias("n_clips"),
             F.round(F.sum("duration_ms"), 2).alias("total_ms"),
             F.round(F.avg("rms"), 4).alias("avg_rms"),
             F.max("peak").alias("max_peak"),
             F.sum("zero_crossings").alias("total_zero_crossings"))
        .orderBy("source")
    )
