"""Property-based tests (hypothesis): randomized inputs against naive
reference implementations — coverage the reference's harness never had
(SURVEY.md §5: no property tests exist there).

Examples are capped small: each case builds tiny DataFrames on the shared
session; the value is input diversity, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from toymapreduce_go_spark.mr.api import run_map_reduce, simple_reduce
from toymapreduce_go_spark.operators.joins import asof_join

_SETTINGS = dict(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.sampled_from(["a", "b", "c", "hot"])


@given(rows=st.lists(st.tuples(keys, st.integers(0, 99)),
                     min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_mr_compat_count_matches_groupby(spark, rows):
    """Identity-map + counting-reduce through the compat API equals the
    declarative groupBy().count() for arbitrary key multisets."""
    df = spark.createDataFrame(rows, "k string, v long")

    def map_f(key, value):
        return [(key, "1")]

    def reduce_f(key, values):
        return str(sum(1 for _ in values))

    out = run_map_reduce(spark, map_f, simple_reduce(reduce_f), df, n_reduce=3)
    got = {(r.key, int(r.value)) for r in out.collect()}
    want = {(r.k, r.cnt) for r in
            df.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    assert got == want


@given(
    left=st.lists(st.tuples(keys, st.integers(0, 50)), min_size=1, max_size=25),
    right=st.lists(st.tuples(keys, st.integers(0, 50)), min_size=1, max_size=25),
)
@settings(**_SETTINGS)
def test_asof_join_matches_naive(spark, left, right):
    """Union+window as-of join equals the naive per-row 'latest right at
    or before left.ts' scan, for arbitrary key/ts multisets (inner
    semantics: unmatched left rows drop)."""
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k string, ts long, lid long")
    rdf = spark.createDataFrame(
        [(k, t, t * 10 + 1) for k, t in right], "k string, ts long, rv long")
    got = {(r.lid, r.rv, r.ts_asof) for r in
           asof_join(ldf, rdf, on="k", ts="ts", value_cols=["rv"])
           .select("lid", F.col("rv_asof").alias("rv"), "ts_asof").collect()}

    want = set()
    for i, (k, t) in enumerate(left):
        cands = [(rt, rv) for (rk, rt, rv) in
                 ((rk, rt, rt * 10 + 1) for rk, rt in right)
                 if rk == k and rt <= t]
        if cands:
            # latest ts wins; among equal ts the max rv is what the
            # window's last() sees after the (ts, side) sort with input
            # order ties broken arbitrarily — pin by max (rt, rv)
            rt, rv = max(cands)
            want.add((i, rv, rt))
    assert got == want


# keys: no space/newline; values: no newline (the kvtext line format's
# representable domain — the writer rejects the rest by contract)
_kv_key = st.text(
    st.characters(blacklist_characters=" \n\r",
                  blacklist_categories=("Cs",)),
    min_size=1, max_size=12)
_kv_val = st.text(
    st.characters(blacklist_characters="\n\r",
                  blacklist_categories=("Cs",)),
    max_size=20)


@given(rows=st.lists(st.tuples(_kv_key, _kv_val), min_size=1, max_size=15))
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_kvtext_roundtrip_property(spark, rows, tmp_path_factory):
    """Any representable (key, value) multiset — including unicode —
    survives a kvtext write+read bit-for-bit, duplicates preserved."""
    out = str(tmp_path_factory.mktemp("kvprop"))
    df = spark.createDataFrame(rows, "key string, value string")
    df.write.format("kvtext").mode("overwrite").save(out)
    back = sorted((r.key, r.value) for r in
                  spark.read.format("kvtext").load(out).collect())
    assert back == sorted(rows)


@given(vals=st.lists(
    st.tuples(st.sampled_from("AB"),
              st.floats(min_value=0.01, max_value=1e6,
                        allow_nan=False, allow_infinity=False)),
    min_size=1, max_size=60))
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_quartiles_property_both_paths(spark, vals):
    """Both quartile plans (windowed and banded) must return the type-1
    quartile — the element at sorted position ceil(q*n) — for any
    multiset, including duplicates and single-element groups."""
    import math

    from toymapreduce_go_spark.operators.relational import (
        lineitem_price_quartiles)

    df = spark.createDataFrame(
        [(f, round(v, 2)) for f, v in vals],
        "l_returnflag string, l_extendedprice double")
    by_flag = {}
    for f, v in vals:
        by_flag.setdefault(f, []).append(round(v, 2))
    for threshold in (10**12, 0):
        got = {r.l_returnflag: (r.n_items, r.p25, r.p50, r.p75)
               for r in lineitem_price_quartiles(
                   df, band_threshold=threshold).collect()}
        for f, fv in by_flag.items():
            s = sorted(fv)
            want = tuple(round(s[math.ceil(q * len(s)) - 1], 2)
                         for q in (0.25, 0.5, 0.75))
            assert got[f] == (len(fv), *want), (threshold, f, got[f], want)


# ---------------------------------------------------------------------------
# Codec properties (round 7): no Spark session needed — pure functions.


@given(w=st.integers(1, 14), h=st.integers(1, 14),
       color=st.sampled_from([0, 2, 4, 6]),
       data=st.data())
@settings(max_examples=20, deadline=None)
def test_png_codec_roundtrip_property(w, h, color, data):
    """Any pixel content × any per-row filter choice round-trips the
    PNG path EXACTLY (it's lossless by construction)."""
    from toymapreduce_go_spark.multimodal.binary import (
        _PNG_CHANNELS, real_decode_pixels, synthesize_png_pixels)

    ch = _PNG_CHANNELS[color]
    pixels = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch)))
    filters = data.draw(st.lists(st.integers(0, 4),
                                 min_size=h, max_size=h))
    png = synthesize_png_pixels(pixels, w, h, color, filters=filters)
    assert real_decode_pixels(png) == (w, h, ch, pixels)


@given(w=st.integers(1, 12), h=st.integers(1, 12),
       quality=st.integers(70, 100), data=st.data())
@settings(max_examples=15, deadline=None)
def test_jpeg_codec_roundtrip_property(w, h, quality, data):
    """Any grayscale content round-trips the baseline JPEG path within
    a quantization-error bound that shrinks with quality; dims/channels
    are always exact."""
    from toymapreduce_go_spark.multimodal.jpeg import (decode_baseline,
                                                      encode_baseline)

    pixels = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=w * h, max_size=w * h)))
    jpg = encode_baseline(pixels, w, h, 1, quality=quality)
    W, H, C, out = decode_baseline(jpg)
    assert (W, H, C) == (w, h, 1)
    # worst observed for random noise at q70 is ~40; q95+ stays <10
    bound = 64 if quality < 85 else 32 if quality < 95 else 12
    assert max(abs(a - b) for a, b in zip(pixels, out)) <= bound


@given(cut=st.integers(2, 400), data=st.data())
@settings(max_examples=25, deadline=None)
def test_jpeg_decoder_never_returns_garbage_on_truncation(cut, data):
    """Truncating a valid JPEG anywhere either raises ValueError or —
    when the cut lands beyond the last entropy bit actually read —
    still yields the exact full-stream pixels. Never silent garbage."""
    from toymapreduce_go_spark.multimodal.jpeg import (decode_baseline,
                                                      encode_baseline)

    pixels = bytes(data.draw(st.lists(
        st.integers(0, 255), min_size=64, max_size=64)))
    jpg = encode_baseline(pixels, 8, 8, 1, quality=90)
    full = decode_baseline(jpg)
    trunc = jpg[:min(cut, len(jpg) - 1)]
    try:
        out = decode_baseline(trunc)
    except ValueError:
        return
    assert out == full


@given(st.lists(st.tuples(st.integers(0, 10**6),
                          st.integers(0, 600)),
                min_size=1, max_size=120, unique_by=lambda t: t[0]),
       st.integers(16, 512))
@settings(max_examples=60, deadline=None)
def test_ffd_pack_shard_invariants(docs, cap):
    """Pure-Python FFD kernel (packing._pack_shard) under random
    workloads: every doc assigned exactly once; no bin over budget
    unless it holds a single oversize doc; FFD quality bound (every
    bin but at most one is more than half full when no oversize docs
    exist — the classic first-fit guarantee)."""
    import pandas as pd

    from toymapreduce_go_spark.operators.packing import _pack_shard

    pdf = pd.DataFrame({
        "doc_id": [d for d, _ in docs],
        "n_tok": [t for _, t in docs],
        "shard": 3,
        "cap": cap,
    })
    out = _pack_shard(pdf)
    assert sorted(out["doc_id"]) == sorted(pdf["doc_id"])
    toks = dict(zip(out["doc_id"], out["n_tok"]))
    bins: dict[int, list[int]] = {}
    for did, b in zip(out["doc_id"], out["bin_id"]):
        bins.setdefault(b, []).append(did)
        assert b >> 32 == 3  # shard-prefixed ids
    for members in bins.values():
        fill = sum(toks[d] for d in members)
        if fill > cap:
            assert any(toks[d] > cap for d in members)
    if all(t <= cap for _, t in docs):
        under_half = sum(1 for m in bins.values()
                         if sum(toks[d] for d in m) * 2 <= cap)
        assert under_half <= 1


@given(starts_sets=st.lists(
    st.one_of(
        st.lists(st.integers(0, 400), min_size=0, max_size=40),
        # past the OLD 20-bit layout's 2^20 ceiling: a multi-megachar
        # document (crawl-data-normal) must not corrupt the packed state
        st.lists(st.integers(0, 5_000_000), min_size=0, max_size=40)),
    min_size=1, max_size=6))
@settings(**_SETTINGS)
def test_dup_span_interval_union_fold_property(spark, starts_sets):
    """Property pin for dup_span_coverage's packed-BIGINT sweep: for
    ARBITRARY duplicated-span start sets (overlapping, adjacent,
    repeated, unordered — including starts past 2^20, where the r8
    20-bit packing silently overflowed), the JVM fold must equal the
    brute-force union size |∪ [s, s+k)| computed in Python."""
    k = 20
    rows = [(i, sorted(set(ss))) for i, ss in enumerate(starts_sets)]
    df = spark.createDataFrame(rows, "doc_id long, ss array<bigint>")
    lo_mask = F.lit((1 << 31) - 1)
    fold = F.aggregate(
        F.col("ss"), F.lit(0).cast("long"),
        lambda acc, s: F.shiftleft(
            F.shiftright(acc, 31)
            + F.greatest(F.lit(0).cast("long"),
                         s + k - F.greatest(acc.bitwiseAND(lo_mask), s)),
            31).bitwiseOR(F.greatest(acc.bitwiseAND(lo_mask), s + k)))
    got = {r["doc_id"]: r["dup"] for r in
           df.select("doc_id", F.shiftright(fold, 31).alias("dup"))
           .collect()}
    for i, ss in rows:
        covered = set()
        for s in ss:
            covered.update(range(s, s + k))
        assert got[i] == len(covered), (ss, got[i], len(covered))


@given(sigs=st.lists(st.integers(0, (1 << 63) - 1),
                     min_size=2, max_size=14, unique=True),
       decomp=st.sampled_from([(2, None), (6, None), (8, None),
                               (6, 9), (2, 9), (8, 9)]))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_hamming_block_pairs_matches_bruteforce(spark, sigs, decomp):
    """The shared pigeonhole join (simhash / image_phash /
    audio_fingerprint / video_fingerprint pair tier) returns EXACTLY
    the brute-force Hamming-≤k pairs at every decomposition — the
    default k+1 split AND the widened n_blocks variants that join on
    block combinations (t = n_blocks − k clean blocks guaranteed);
    neither loses a pair, and the verify filter adds nothing."""
    from toymapreduce_go_spark.operators.dedup import hamming_block_pairs

    max_hamming, n_blocks = decomp
    df = spark.createDataFrame([(i, s) for i, s in enumerate(sigs)],
                               "doc_id long, sig long")
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in hamming_block_pairs(df, "sig", 63, max_hamming,
                                        n_blocks).collect()}
    want = {}
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            d = bin(sigs[i] ^ sigs[j]).count("1")
            if d <= max_hamming:
                want[(i, j)] = d
    assert got == want
