"""Perceptual image hash (DCT pHash) + Hamming near-dup — multimodal
dedup tier (round 9). Invariant contracts (DuckDB cannot decode
images): distributed-equals-local recomputation, lossy re-encode
robustness through the REAL JPEG codec, planted-pair detection
including cross-container (PNG vs JPEG) duplicates, and bucket/pair
consistency."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import SF_DIR

from toymapreduce_go_spark.multimodal.jpeg import (decode_baseline,
                                                   encode_baseline)
from toymapreduce_go_spark.multimodal.phash import (image_phash_buckets,
                                                    image_phash_pairs,
                                                    image_phashes,
                                                    phash63)
from toymapreduce_go_spark.sources.registry import load_table


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _structured_img(seed: int, w: int = 48, h: int = 40) -> np.ndarray:
    """Deterministic structured test image: gradient + sinusoid mix +
    mild noise — content with genuine low-frequency signal, unlike the
    fixture's byte-replication textures."""
    r = np.random.RandomState(seed)
    y, x = np.mgrid[0:h, 0:w]
    img = (128.0 + 60.0 * np.sin(x / r.uniform(3, 9))
           * np.cos(y / r.uniform(3, 9))
           + r.uniform(-40, 40) * (x / w) + r.uniform(-40, 40) * (y / h))
    img += r.normal(0, 8, size=img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def test_phash_jpeg_reencode_robust_and_unrelated_separated():
    """The defining perceptual property, measured through the real
    codec: JPEG q90 re-encode moves ≤ 4 of 63 bits (measured ≤ 2),
    while distinct structured images disagree on far more."""
    imgs = [_structured_img(s) for s in range(8)]
    hashes = [phash63(48, 40, 1, im.tobytes()) for im in imgs]
    for im, h0 in zip(imgs, hashes):
        payload = encode_baseline(im.tobytes(), 48, 40, 1, quality=90)
        w, h, c, pix = decode_baseline(payload)
        assert _ham(h0, phash63(w, h, c, pix)) <= 4
    dists = [_ham(hashes[i], hashes[j])
             for i in range(8) for j in range(i + 1, 8)]
    assert np.mean(dists) > 15          # ~half the 63 bits in expectation


def test_phash_noise_and_resize_stability():
    """±2-level pixel noise moves ≤ 6 bits; the same content rendered
    at a different resolution (bilinear-resampled source) stays close —
    the hash sees content, not dimensions."""
    rng = np.random.RandomState(11)
    for seed in range(6):
        im = _structured_img(seed)
        h0 = phash63(48, 40, 1, im.tobytes())
        pert = np.clip(im.astype(int) + rng.randint(-2, 3, size=im.shape),
                       0, 255).astype(np.uint8)
        assert _ham(h0, phash63(48, 40, 1, pert.tobytes())) <= 6
        # nearest-neighbor 2x upscale of the same content
        up = np.repeat(np.repeat(im, 2, axis=0), 2, axis=1)
        assert _ham(h0, phash63(96, 80, 1, up.tobytes())) <= 10


def test_phash_multichannel_grayscale_equivalence():
    """An RGB image with identical channels hashes exactly like its
    grayscale plane (equal-weight channel averaging)."""
    im = _structured_img(3)
    rgb = np.repeat(im[:, :, None], 3, axis=2)
    assert phash63(48, 40, 3, rgb.tobytes()) == phash63(48, 40, 1,
                                                        im.tobytes())


def test_phash_distributed_equals_local(spark):
    """The distributed fused stage (synthesize → decode → hash in one
    mapInPandas) reproduces a driver-side recomputation bit-for-bit on
    the real fixture."""
    from toymapreduce_go_spark.multimodal.binary import (
        synthesize_real_image)
    from toymapreduce_go_spark.multimodal.phash import hash_payloads

    docs = load_table(spark, SF_DIR, "documents")
    got = {r["doc_id"]: (r["format"], r["phash"])
           for r in image_phashes(docs).collect()}
    pdf = (docs.select("doc_id", "source", "text")
           .filter("text is not null").toPandas())
    local = {}
    for out in hash_payloads(synthesize_real_image(iter([pdf]))):
        for r in out.itertuples():
            local[r.doc_id] = (r.format, r.phash)
    assert got == local and len(got) > 0


def _docs_frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, "
                                       "text string")


def test_phash_pairs_planted_cross_container(spark):
    """Planted near-dups are found; unrelated content is not. doc_ids
    0/1 carry the SAME text but synthesize into DIFFERENT containers
    (even → PNG lossless, odd → JPEG q90 lossy), so the detected pair
    is a genuine cross-format perceptual match, not byte equality."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, "s", base),                       # PNG of base pixels
        (1, "s", base),                       # JPEG q90 of base pixels
        (3, "s", base[:-1] + "x"),            # 1-char edit → near-dup
        (5, "s", "completely different content with other words "
                 "entirely and a much longer tail of text here"),
        (7, "s", "yet another unrelated document whose bytes share "
                 "nothing with the base string at all ok"),
    ]
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in image_phash_pairs(_docs_frame(spark, rows),
                                        max_hamming=6).collect()}
    assert (0, 1) in pairs                    # cross-container dup
    assert (0, 3) in pairs and (1, 3) in pairs   # near-dup edit
    for (a, b), d in pairs.items():
        if ({a, b} & {5, 7}) and {a, b} != {5, 7}:
            pytest.fail(f"unrelated pair ({a},{b}) at hamming {d}")


def test_phash_buckets_exact_dups_same_container(spark):
    """Byte-identical text on same-parity doc_ids → identical images →
    one exact-collision bucket; the bucket query reports it."""
    t = "repeated document body for exact bucket check one two three"
    rows = [(0, "s", t), (2, "s", t), (4, "s", t),
            (6, "s", "some other words to stand apart from the rest "
                     "of this tiny corpus okay")]
    buckets = image_phash_buckets(_docs_frame(spark, rows)).collect()
    assert any(r["n_images"] >= 3 and r["min_doc_id"] == 0
               for r in buckets)


def test_phash_pairs_invalid_blocks():
    with pytest.raises(ValueError):
        image_phash_pairs(None, max_hamming=9)   # no clean block at t=0
    with pytest.raises(ValueError):
        image_phash_pairs(None, n_blocks=8)      # 8 does not divide 63


def test_phash_single_python_stage_no_pre_shuffle(spark):
    """Plan contract: hashing is ONE fused Python stage directly over
    the scan — no Exchange before (or between) Python evals; the pair
    query's only shuffles serve the block join."""
    from test_explain_plans import plan_of

    docs = load_table(spark, SF_DIR, "documents")
    plan = plan_of(image_phashes(docs))
    # formatted mode prints each node twice (tree line + detail block),
    # so one fused Python stage appears exactly twice
    assert plan.count("ArrowEvalPython") == 0, plan
    assert plan.count("MapInPandas") == 2, plan
    assert "Exchange" not in plan, plan       # scan → Python, no shuffle
    assert "PushedFilters" in plan or "ReadSchema" in plan
