"""Audio fingerprint + Hamming near-dup — multimodal dedup tier
(round 9). Invariant contracts (DuckDB cannot run an FFT):
distributed-equals-local recomputation, re-encode robustness through
the REAL WAV codec (gain in the int16 domain, additive noise), planted
duplicate detection, and the median-split structural properties
(popcount 31, even distances)."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import SF_DIR

from toymapreduce_go_spark.multimodal.audio import (decode_pcm,
                                                    synthesize_wav)
from toymapreduce_go_spark.multimodal.audiofp import (
    AFP_BITS, audio_fingerprint_pairs, audio_fingerprints, audio_fp63,
    fingerprint_waveform)
from toymapreduce_go_spark.sources.registry import load_table


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_afp_median_split_structure():
    """Exactly 31 of 63 bits set (median threshold), hence all pairwise
    distances are even; silence hashes to 0."""
    fps = [audio_fp63(fingerprint_waveform(f"doc body {i}"))
           for i in range(16)]
    assert all(bin(fp).count("1") == 31 for fp in fps)
    assert all(_ham(a, b) % 2 == 0 for a in fps for b in fps)
    assert all(0 <= fp < 1 << AFP_BITS for fp in fps)
    assert audio_fp63(np.zeros(600, dtype=np.int16)) == 0


def test_afp_reencode_robust_and_unrelated_separated():
    """The defining property, measured through real re-encodes: volume
    scaling in the int16 domain and low-level additive noise move ≤ 2
    of 63 bits (measured 0), while unrelated clips sit at ≥ 4."""
    rng = np.random.default_rng(11)
    waves = [fingerprint_waveform(f"document body {i} with words")
             for i in range(12)]
    fps = [audio_fp63(w) for w in waves]
    for w, fp in zip(waves, fps):
        f64 = w.astype(np.float64)
        for gain in (0.5, 0.8, 1.2):
            scaled = np.clip(np.floor(f64 * gain + 0.5), -32768, 32767)
            assert _ham(fp, audio_fp63(scaled)) <= 2
        noisy = np.clip(f64 + rng.integers(-50, 51, len(f64)),
                        -32768, 32767)
        assert _ham(fp, audio_fp63(noisy)) <= 2
    dists = [_ham(fps[i], fps[j])
             for i in range(12) for j in range(i + 1, 12)]
    assert min(dists) >= 4
    assert np.mean(dists) > 15


def test_afp_roundtrips_wav_codec():
    """synthesize_wav → decode_pcm is lossless, so the fingerprint of
    the decoded container equals the fingerprint of the raw samples."""
    for i in range(4):
        w = fingerprint_waveform(f"clip {i}")
        payload = synthesize_wav(list(map(int, w)))
        assert audio_fp63(decode_pcm(payload)) == audio_fp63(w)


def test_afp_distributed_equals_local(spark):
    """The Spark fingerprint column matches a driver-side recomputation
    with the same functions, doc by doc."""
    docs = load_table(spark, SF_DIR, "documents").limit(40)
    got = {r["doc_id"]: r["afp"]
           for r in audio_fingerprints(docs).collect()}
    want = {r["doc_id"]: audio_fp63(fingerprint_waveform(r["text"]))
            for r in docs.filter("text is not null").collect()}
    assert got == want and got


def test_afp_pairs_planted_duplicates(spark):
    """Byte-identical text (the stand-in for the same recording
    ingested twice) is found at Hamming 0; a corpus of distinct texts
    contributes no pair at the default threshold."""
    rows = [(i, "src_a", f"unique audio doc {i} text body")
            for i in range(30)]
    rows += [(100, "src_b", "the planted duplicate recording"),
             (101, "src_c", "the planted duplicate recording")]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in audio_fingerprint_pairs(docs).collect()}
    assert pairs == {(100, 101): 0}


def test_afp_pairs_invalid_blocks():
    with pytest.raises(ValueError):
        audio_fingerprint_pairs(None, max_hamming=4)   # 5 ∤ 63


def test_afp_single_python_stage_no_pre_shuffle(spark):
    """Plan contract: fingerprinting is ONE fused Python stage directly
    over the scan — no Exchange before or between Python evals."""
    from test_explain_plans import plan_of

    docs = load_table(spark, SF_DIR, "documents")
    plan = plan_of(audio_fingerprints(docs))
    assert plan.count("ArrowEvalPython") == 0, plan
    # formatted mode prints each node twice (tree line + detail block)
    assert plan.count("MapInPandas") == 2, plan
    assert "Exchange" not in plan, plan
    assert "PushedFilters" in plan or "ReadSchema" in plan
