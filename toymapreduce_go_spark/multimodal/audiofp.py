"""Audio fingerprinting + Hamming near-dup — the AUDIO member of the
multimodal dedup matrix (text: simhash/minhash; images:
``multimodal.phash``; audio: this module), all sharing ONE pigeonhole
block join (``operators.dedup.hamming_block_pairs``).

Reference scope note: the reference runtime (pkg/mapreduce, ~1.7k LoC
Go) ships no audio operators; this is part of the training-data-pipeline
surface built Spark-first on the repo's own RIFF/WAV codec
(``multimodal.audio``).

The fingerprint is a 63-bit spectral hash in the band-energy family of
Haitsma & Kalker ("A Highly Robust Audio Fingerprinting System", ISMIR
2002), thresholded the way image pHash thresholds DCT coefficients
(median split) rather than with HK's temporal delta — the right variant
for short clips, where a per-frame temporal difference is dominated by
windowing noise:

    PCM16 → 128-sample Hann frames, hop 32 → |rfft|² →
    time-averaged log band energies (63 bands, DC dropped) →
    threshold against their median → one bit per band.

Properties (measured, tests/test_audiofp.py):
- exactly 31 of 63 bits are set (median split), so all pairwise
  distances are EVEN;
- volume re-encodes (gain 0.5–1.2 in the int16 domain) and low-level
  additive noise (±50 on a 12000 peak) move 0 bits — the median
  threshold on log energies is scale-free;
- unrelated clips sit at distance ≥ 4 (mean ~27 on fixture text), and
  a 3000-doc fixture study put the ≤2 false-pair rate at ~4e-7 per
  pair — so the default ``max_hamming=2`` returns exact dups and
  re-encodes only. 63 bits split into max_hamming+1 equal blocks, so
  valid thresholds are {0, 2, 6, 8, 20, 62}.

Synthesis is CONTENT-keyed (md5(text) → a 16-partial tone complex),
unlike ``audio.audio_stats_query``'s doc_id-keyed probe signal: a
fingerprint corpus where every doc shares one of 8 frequencies would
collapse into 8 Hamming classes and the pair join would go quadratic.
Content keying also gives dedup its semantics — byte-identical text is
the stand-in for "the same recording ingested twice".

Spark shape (the 100 TB posture): hashing is ONE fused mapInPandas
stage at scan parallelism (synthesize → RIFF parse → PCM decode → FFT
hash, numpy-vectorized per clip); the pair tier cuts lineage with a
localCheckpoint (PythonUDF subplans don't canonicalize equal, see
``phash.image_phash_pairs``) so every clip decodes ONCE, then the
shared block join generates candidates — never all-pairs.

Correctness tier: pytest-invariant (DuckDB cannot run an FFT) —
distributed-equals-local recomputation, re-encode robustness through
the real WAV codec, and planted-pair detection, the same convention as
``image_phash``.
"""
from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .audio import decode_pcm, synthesize_wav
from .binary import _text_rows

AFP_BITS = 63
AFP_RATE = 8000
AFP_FRAME = 128          # samples per Hann frame (→ 64 rfft bins + DC)
AFP_HOP = 32
AFP_PARTIALS = 16        # tone complex richness of the synthetic clip


def fingerprint_waveform(text: str, rate: int = AFP_RATE) -> np.ndarray:
    """Deterministic content-keyed PCM16 clip: md5(text) seeds a
    16-partial tone complex (frequencies in [200, 3600) Hz — under the
    4 kHz Nyquist — with per-partial amplitude and phase), peak-scaled
    to 12000. Identical text → identical samples on every worker."""
    h = hashlib.md5(text.encode("utf-8")).digest()
    hb = h + hashlib.md5(h).digest() + hashlib.md5(h * 2).digest()
    n = 512 + 2 * hb[47]                       # 64–128 ms at 8 kHz
    t = np.arange(n, dtype=np.float64) / rate
    x = np.zeros(n)
    for k in range(AFP_PARTIALS):
        f = 200.0 + ((hb[2 * k] << 8 | hb[2 * k + 1]) % 3400)
        amp = 1.0 + hb[32 + (k % 15)] / 64.0
        phase = 2 * np.pi * hb[(3 * k + 5) % 47] / 256.0
        x += amp * np.sin(2 * np.pi * f * t + phase)
    x *= 12000.0 / np.max(np.abs(x))
    return np.clip(np.floor(x + 0.5), -32768, 32767).astype(np.int16)


def audio_fp63(samples) -> int:
    """63-bit spectral fingerprint of one PCM clip (see module
    docstring). Pure float64 numpy; silence hashes to 0."""
    x = np.asarray(samples, dtype=np.float64)
    if len(x) < AFP_FRAME:
        x = np.pad(x, (0, AFP_FRAME - len(x)))
    nf = 1 + (len(x) - AFP_FRAME) // AFP_HOP
    idx = (np.arange(AFP_FRAME)[None, :]
           + AFP_HOP * np.arange(nf)[:, None])
    frames = x[idx] * np.hanning(AFP_FRAME)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    bands = np.log1p(spec[:, 1:AFP_BITS + 1]).mean(axis=0)
    med = float(np.median(bands))
    bits = np.nonzero(bands > med)[0]
    return int(np.sum(np.int64(1) << bits.astype(np.int64)))


AFP_SCHEMA = "doc_id long, source string, afp long"


def fingerprint_payloads(batches: Iterator[pd.DataFrame]
                         ) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, source, payload WAV) → (doc_id,
    source, afp) via the real RIFF parse + PCM decode."""
    for pdf in batches:
        fps = []
        for payload in pdf["payload"]:
            # decode_pcm walks the RIFF chunks itself and raises on any
            # invalid container — no separate header-validation pass
            fps.append(audio_fp63(decode_pcm(bytes(payload))))
        yield pd.DataFrame({
            "doc_id": pd.Series(pdf["doc_id"], dtype="int64"),
            "source": pd.Series(pdf["source"], dtype="object"),
            "afp": pd.Series(fps, dtype="int64"),
        })


def synthesize_fp_audio(batches: Iterator[pd.DataFrame]
                        ) -> Iterator[pd.DataFrame]:
    """(doc_id, source, text) → (doc_id, source, payload) with real WAV
    containers around the content-keyed clip."""
    for pdf in batches:
        payloads = [synthesize_wav(list(map(int, fingerprint_waveform(t))))
                    for t in pdf["text"]]
        yield pd.DataFrame({"doc_id": pdf["doc_id"],
                            "source": pdf["source"],
                            "payload": payloads})


def audio_fingerprints(documents: DataFrame) -> DataFrame:
    """Per-document audio fingerprint over REAL WAV containers:
    synthesize → decode → FFT hash in ONE fused Python stage (scan
    parallelism, no shuffle)."""
    return _text_rows(documents).mapInPandas(
        lambda batches: fingerprint_payloads(synthesize_fp_audio(batches)),
        schema=AFP_SCHEMA)


def audio_fingerprint_pairs(documents: DataFrame,
                            max_hamming: int = 2) -> DataFrame:
    """All clip pairs with fingerprint Hamming distance ≤ max_hamming
    via the shared pigeonhole block join — the audio twin of
    ``image_phash_pairs``. The default threshold 2 (21-bit blocks)
    admits exact dups and re-encodes only; see the module docstring's
    false-pair study for why 6 is too loose for a 63-bit median-split
    hash at corpus scale."""
    from ..operators.dedup import hamming_block_pairs, hamming_block_width

    hamming_block_width(AFP_BITS, max_hamming)   # fail before decoding
    sigs = (audio_fingerprints(documents).select("doc_id", "afp")
            .localCheckpoint(eager=False))
    return hamming_block_pairs(sigs, "afp", AFP_BITS, max_hamming)
