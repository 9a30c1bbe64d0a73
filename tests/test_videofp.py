"""Video fingerprint + Hamming near-dup — multimodal dedup tier
(round 9). Invariant contracts (DuckDB cannot parse MJPEG):
distributed-equals-local recomputation, re-encode and frame-drop
robustness through the REAL codec, planted duplicate detection, and
the bag-of-frames vote semantics."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import SF_DIR

from toymapreduce_go_spark.multimodal.jpeg import encode_baseline_gray_batch
from toymapreduce_go_spark.multimodal.videofp import (
    VFP_BITS, fingerprint_frames, mjpeg_fp63, video_fingerprint_pairs,
    video_fingerprints, video_fp63)
from toymapreduce_go_spark.sources.registry import load_table


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _stream(text: str, quality: int = 85) -> bytes:
    return b"".join(encode_baseline_gray_batch(
        fingerprint_frames(text), quality=quality))


def test_vfp_vote_semantics():
    """Majority vote per bit; ties break to 0; no frames hashes to 0."""
    assert video_fp63([]) == 0
    assert video_fp63([0b1011]) == 0b1011
    assert video_fp63([0b1011, 0b1011, 0b0010]) == 0b1011
    assert video_fp63([0b1, 0b0]) == 0              # tie → 0
    fp = video_fp63([(1 << VFP_BITS) - 1])
    assert fp == (1 << VFP_BITS) - 1 and fp > 0     # stays in long range


def test_vfp_reencode_and_framedrop_robust_unrelated_separated():
    """The defining properties, pinned at the measured values the
    module docstring advertises (deterministic inputs): a quality-60
    re-encode moves ≤ 3 of 63 bits, quality-95 ≤ 1, dropping the last
    frame ≤ 6, and unrelated videos sit at ≥ 20 (mean ~31)."""
    texts = [f"video document {i} body content" for i in range(20)]
    fps = [mjpeg_fp63(_stream(t)) for t in texts]
    for t, fp in zip(texts, fps):
        assert _ham(fp, mjpeg_fp63(_stream(t, quality=60))) <= 3
        assert _ham(fp, mjpeg_fp63(_stream(t, quality=95))) <= 1
        frames = fingerprint_frames(t)
        if len(frames) > 2:
            dropped = b"".join(encode_baseline_gray_batch(
                frames[:-1], quality=85))
            assert _ham(fp, mjpeg_fp63(dropped)) <= 6
    dists = [_ham(fps[i], fps[j])
             for i in range(20) for j in range(i + 1, 20)]
    assert min(dists) >= 20
    assert np.mean(dists) > 25


def test_vfp_distributed_equals_local(spark):
    """The Spark fingerprint column matches a driver-side recomputation
    with the same functions, doc by doc — including frame counts."""
    docs = load_table(spark, SF_DIR, "documents").limit(30)
    got = {r["doc_id"]: (r["vfp"], r["n_frames"])
           for r in video_fingerprints(docs).collect()}
    want = {}
    for r in docs.filter("text is not null").collect():
        frames = fingerprint_frames(r["text"])
        want[r["doc_id"]] = (mjpeg_fp63(_stream(r["text"])), len(frames))
    assert got == want and got


def test_vfp_pairs_planted_duplicate_and_reencode(spark):
    """Byte-identical text (same footage ingested twice) is found at
    Hamming 0; distinct texts contribute nothing at the default
    threshold."""
    rows = [(i, "src_a", f"unique video doc {i} text body")
            for i in range(25)]
    rows += [(100, "src_b", "the planted duplicate footage"),
             (101, "src_c", "the planted duplicate footage")]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in video_fingerprint_pairs(docs).collect()}
    assert pairs == {(100, 101): 0}


def test_vfp_pairs_invalid_blocks():
    with pytest.raises(ValueError):
        video_fingerprint_pairs(None, max_hamming=9)   # no clean block
    with pytest.raises(ValueError):
        video_fingerprint_pairs(None, n_blocks=8)      # 8 ∤ 63


def test_vfp_single_python_stage_no_pre_shuffle(spark):
    """Plan contract: fingerprinting is ONE fused Python stage directly
    over the scan — no Exchange before or between Python evals."""
    from test_explain_plans import plan_of

    docs = load_table(spark, SF_DIR, "documents")
    plan = plan_of(video_fingerprints(docs))
    assert plan.count("ArrowEvalPython") == 0, plan
    # formatted mode prints each node twice (tree line + detail block)
    assert plan.count("MapInPandas") == 2, plan
    assert "Exchange" not in plan, plan
    assert "PushedFilters" in plan or "ReadSchema" in plan
