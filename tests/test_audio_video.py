"""Audio (WAV/PCM) and video (raw MJPEG) modality tiers (round 7):
real containers, real decode, distributed-equals-local rollups — the
pattern the image pixel tier set, extended to the other two opaque
binary modalities a training-data pipeline carries."""

from __future__ import annotations

import math
import struct

import pytest

from conftest import SF_DIR

from toymapreduce_go_spark.multimodal.audio import (decode_pcm,
                                                    parse_wav_header,
                                                    synthesize_wav)
from toymapreduce_go_spark.multimodal.video import (split_mjpeg,
                                                    synthesize_mjpeg)


def test_wav_roundtrip_lossless():
    """PCM16 WAV is lossless end-to-end: samples out == samples in,
    header fields exact."""
    samples = [0, 1000, -1000, 32767, -32768, 7, -7] * 11
    wav = synthesize_wav(samples, sample_rate=16000)
    assert parse_wav_header(wav) == (16000, 1, 16, len(samples))
    assert decode_pcm(wav) == samples


def test_wav_parser_skips_unknown_chunks_and_fails_loudly():
    """A real-world WAV carries LIST/fact chunks before data — the RIFF
    walk must skip them by length; garbage and truncation raise."""
    samples = [5, -5, 9]
    wav = bytearray(synthesize_wav(samples))
    # splice an unknown chunk between fmt and data
    data_at = bytes(wav).index(b"data")
    extra = b"LIST" + struct.pack("<I", 6) + b"INFOxy"
    spliced = bytes(wav[:data_at]) + extra + bytes(wav[data_at:])
    # fix the RIFF size field
    spliced = (spliced[:4] + struct.pack("<I", len(spliced) - 8)
               + spliced[8:])
    assert decode_pcm(spliced) == samples
    with pytest.raises(ValueError):
        parse_wav_header(b"RIFX" + bytes(40))
    with pytest.raises(ValueError):
        parse_wav_header(synthesize_wav(samples)[:-3])


def test_mjpeg_split_and_decode_every_frame():
    """The MJPEG splitter must find exact frame boundaries by parsing
    (not byte search): every split frame fully decodes, and frame count
    matches what was synthesized."""
    from toymapreduce_go_spark.multimodal.jpeg import decode_baseline

    stream = synthesize_mjpeg(3, "some text for frames", n_frames=5)
    frames = split_mjpeg(stream)
    assert len(frames) == 5
    assert b"".join(frames) == stream  # exact partition of the stream
    lumas = []
    for fr in frames:
        w, h, c, pix = decode_baseline(fr)
        assert (w, h, c) == (16, 16, 1)
        lumas.append(sum(pix) / len(pix))
    assert len(set(round(x) for x in lumas)) > 1  # frames differ


def test_mjpeg_split_rejects_garbage():
    with pytest.raises(ValueError):
        split_mjpeg(b"not a jpeg stream")
    good = synthesize_mjpeg(1, "t", n_frames=2)
    with pytest.raises(ValueError):
        split_mjpeg(good[:-4])  # truncated final frame


def test_audio_pipeline_distributed_equals_local(spark):
    """audio_stats_query's executor-side decode rollup == a driver-side
    recomputation with the same functions over the same rows."""
    from collections import defaultdict

    import pandas as pd

    from toymapreduce_go_spark.multimodal.audio import (audio_stats_query,
                                                        decode_audio_stats,
                                                        synthesize_audio)
    from toymapreduce_go_spark.sources.registry import load_table

    docs = load_table(spark, SF_DIR, "documents").filter("doc_id < 40")
    got = sorted((r.source, r.n_clips, r.total_ms, r.avg_rms, r.max_peak,
                  r.total_zero_crossings)
                 for r in audio_stats_query(docs).collect())
    local = docs.select("doc_id", "source", "text").toPandas()
    decoded = pd.concat(decode_audio_stats(synthesize_audio(iter([local]))))
    agg = defaultdict(lambda: [0, 0.0, 0.0, 0, 0])
    for r in decoded.itertuples(index=False):
        a = agg[r.source]
        a[0] += 1
        a[1] += r.duration_ms
        a[2] += r.rms
        a[3] = max(a[3], r.peak)
        a[4] += r.zero_crossings
    # Spark's round() is HALF_UP; Python's is banker's — an exact .125
    # millisecond total rounds differently. Use HALF_UP locally.
    from decimal import ROUND_HALF_UP, Decimal

    def r(v, nd):
        return float(Decimal(repr(v)).quantize(
            Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP))

    want = sorted((s, n, r(ms, 2), r(rms / n, 4), pk, zc)
                  for s, (n, ms, rms, pk, zc) in agg.items())
    assert got == want and len(want) > 1
    # signal sanity: a sine-family signal has plenty of zero crossings
    assert all(zc > 0 for *_, zc in got)


def test_video_pipeline_distributed_equals_local(spark):
    """video_stats_query (split + sample every 2nd + full DCT decode on
    executors) == driver-side recomputation; sampling genuinely halves
    the decoded frames."""
    from collections import defaultdict

    import pandas as pd

    from toymapreduce_go_spark.multimodal.video import (decode_video_stats,
                                                        synthesize_video,
                                                        video_stats_query)
    from toymapreduce_go_spark.sources.registry import load_table

    docs = load_table(spark, SF_DIR, "documents").filter("doc_id < 24")
    got = sorted((r.source, r.n_videos, r.total_frames, r.total_sampled,
                  r.avg_luma)
                 for r in video_stats_query(docs).collect())
    local = docs.select("doc_id", "source", "text").toPandas()
    decoded = pd.concat(decode_video_stats(synthesize_video(iter([local]))))
    agg = defaultdict(lambda: [0, 0, 0, 0.0])
    for r in decoded.itertuples(index=False):
        a = agg[r.source]
        a[0] += 1
        a[1] += r.n_frames
        a[2] += r.n_sampled
        a[3] += r.avg_luma
    want = sorted((s, n, fr, sm, round(lu / n, 4))
                  for s, (n, fr, sm, lu) in agg.items())
    assert got == want and len(want) > 1
    total_frames = sum(fr for _, _, fr, _, _ in got)
    total_sampled = sum(sm for _, _, _, sm, _ in got)
    assert 0 < total_sampled < total_frames
    assert total_sampled == sum(math.ceil(fr / 2) for fr in (
        r.n_frames for r in decoded.itertuples(index=False)))
