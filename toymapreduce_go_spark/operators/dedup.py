"""Deduplication family for LLM training-data pipelines (north star;
SURVEY.md §2c last row, §2d #13-14).

Five strategies, cheapest-first — the order a real 100 TB pipeline runs
them:

1. exact (sha2 of normalized text)         — one shuffle on the hash
2. n-gram Jaccard (candidate-free, exact)  — shingle join, small sf only
3. MinHash + LSH banding                   — the scale path for near-dup
4. SimHash (Hamming buckets)               — cheap complement to MinHash
5. embedding cosine near-dup               — semantic dup, via LSH buckets

All hashing is deterministic built-ins (sha2/md5/xxhash64 with literal
seeds) — no RNG, so every run and every cluster size produces identical
output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens
from ..functions.vectors import cosine_sim

# ---------------------------------------------------------------------------
# 1. Exact dedup


def exact_dedup_survivors(documents: DataFrame) -> DataFrame:
    """Exact dedup by sha2-256 of the raw text; survivor = min doc_id per
    hash (deterministic). Returns per-source survivor/duplicate counts.

    Scale: groupBy on a 256-bit hash is perfectly uniform — no skew — and
    the map-side partial agg reduces each partition to its distinct hashes
    before the shuffle.
    """
    hashed = documents.select(
        "doc_id", "source", F.sha2(F.col("text"), 256).alias("h"))
    w = Window.partitionBy("h").orderBy("doc_id")
    marked = hashed.withColumn("rn", F.row_number().over(w))
    return (
        marked.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_survivors"),
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_duplicates"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# 2. N-gram Jaccard (exact pairwise over shingle join — oracle-checkable)


def _shingles(df: DataFrame, n: int) -> DataFrame:
    """(doc_id, shingle) distinct word n-grams per doc, JVM-side: slide an
    n-window over the token array with transform + slice."""
    toks = df.select("doc_id", tokens("text").alias("toks"))
    return (
        toks.filter(F.size("toks") >= n)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice("toks", i, n)),
                )
            ).alias("shingle"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(documents: DataFrame, n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard similarity over word n-gram shingle sets for every
    doc pair sharing ≥1 shingle; emit pairs ≥ threshold.

    This is the *correctness* dedup: candidate generation is the shingle
    self-join (only docs sharing a shingle ever meet — never a crossJoin),
    then |A∩B| / (|A|+|B|−|A∩B|). At 100 TB you run MinHash-LSH (below)
    instead and use this formula only to verify candidates; the shingle
    join degrades if one shingle is extremely common, so the scale path
    also drops top-frequency shingles (stopword shingles) first.
    """
    sh = _shingles(documents, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b")), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# 3. MinHash + LSH


N_HASHES = 64
N_BANDS = 16  # 16 bands × 4 rows → s-curve threshold ≈ (1/16)^(1/4) ≈ 0.5


def minhash_signatures(documents: DataFrame, n: int = 3,
                       n_hashes: int = N_HASHES) -> DataFrame:
    """(doc_id, sig array<bigint>) MinHash signatures over word n-gram
    shingles. Permutation i is simulated by xxhash64(i, shingle) (seeded,
    deterministic — no RNG, unlike spark.ml's MinHashLSH whose coefficients
    depend on a random seed).

    Plan shape: explode shingles → per (doc, i) min — but expressed without
    exploding n_hashes×: an array-of-mins aggregated with zip_with, so the
    shuffle carries one row per (doc, shingle) and the signature fold is
    map-side."""
    sh = _shingles(documents, n)
    hashed = sh.select(
        "doc_id",
        F.array(*[F.xxhash64(F.lit(i), F.col("shingle"))
                  for i in range(n_hashes)]).alias("hs"),
    )
    zero = F.array(*[F.lit(2**63 - 1).cast("long") for _ in range(n_hashes)])
    return hashed.groupBy("doc_id").agg(
        F.aggregate(
            F.collect_list("hs"), zero,
            lambda acc, hs: F.zip_with(acc, hs, lambda x, y: F.least(x, y)),
        ).alias("sig")
    )


def near_dedup_minhash(documents: DataFrame, n: int = 3,
                       threshold: float = 0.5,
                       n_hashes: int = N_HASHES,
                       n_bands: int = N_BANDS) -> DataFrame:
    """MinHash-LSH near-duplicate pairs: band the signature, bucket-join on
    (band_id, band_hash), then estimate Jaccard as fraction of agreeing
    minhashes; keep pairs ≥ threshold.

    This is the 100 TB path: cost is O(docs × bands) rows into one
    bucket-join shuffle — never pairwise. Bucket sizes are bounded in
    practice (identical band-hash = near-identical docs); a production run
    would also cap giant buckets (cap omitted here to keep the
    estimate exact for the declared query).
    """
    rows_per_band = n_hashes // n_bands
    sig = minhash_signatures(documents, n, n_hashes)
    banded = sig.select(
        "doc_id", "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.xxhash64(*[F.col("sig")[b * rows_per_band + r]
                                 for r in range(rows_per_band)]).alias("band_hash"),
                )
                for b in range(n_bands)
            ])
        ).alias("band"),
    ).select("doc_id", "sig", "band.band_id", "band.band_hash")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
               & (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = cand.withColumn(
        "est_jaccard",
        F.round(
            F.aggregate(
                F.zip_with("sig_a", "sig_b",
                           lambda x, y: F.when(x == y, 1.0).otherwise(0.0)),
                F.lit(0.0), lambda acc, x: acc + x,
            ) / F.lit(float(n_hashes)),
            4,
        ),
    )
    return (
        est.filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# 4. SimHash


def simhash_buckets(documents: DataFrame, bits: int = 64) -> DataFrame:
    """64-bit SimHash per doc over its token multiset, plus bucket sizes.

    simhash bit j = sign of Σ_tokens (±1 depending on bit j of
    xxhash64(token)). Entirely JVM-side: per-doc token explode → per-bit
    vote aggregation expressed as an array fold. Docs sharing a simhash are
    near-identical; Hamming-≤k search would join on rotated prefixes.
    """
    tok = documents.select(
        "doc_id", F.explode(tokens("text")).alias("token"))
    votes = tok.select(
        "doc_id",
        F.array(*[
            F.when(F.shiftright(F.xxhash64("token"), j).bitwiseAND(F.lit(1)) == 1,
                   F.lit(1)).otherwise(F.lit(-1)).alias(f"b{j}")
            for j in range(bits)
        ]).alias("v"),
    )
    zero = F.array(*[F.lit(0) for _ in range(bits)])
    # bit j's mask as a Python literal (shiftleft needs a literal shift
    # amount); bit 63 is the two's-complement sign bit.
    import functools

    def mask(j: int):
        return F.lit((1 << j) if j < 63 else -(1 << 63)).cast("long")

    simhash_col = functools.reduce(
        lambda a, b: a.bitwiseOR(b),
        [F.when(F.col("votes")[j] > 0, mask(j)).otherwise(F.lit(0).cast("long"))
         for j in range(bits)],
    )
    sigs = votes.groupBy("doc_id").agg(
        F.aggregate(F.collect_list("v"), zero,
                    lambda acc, v: F.zip_with(acc, v, lambda x, y: x + y))
        .alias("votes")
    ).select("doc_id", simhash_col.alias("simhash"))
    return (
        sigs.groupBy("simhash").agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("simhash")
    )


# ---------------------------------------------------------------------------
# 5. Embedding cosine near-dup


def embedding_near_dup(embeddings: DataFrame,
                       threshold: float = 0.95) -> DataFrame:
    """Semantic near-duplicate pairs: cosine ≥ threshold over the
    embedding column.

    At this sf: block self-join on a random-hyperplane LSH bucket (8-bit
    sign sketch with deterministic pseudo-hyperplanes) + exact cosine
    within bucket. High-cosine pairs agree on most sign bits, so an 8-bit
    exact-match bucket keeps ~all ≥0.95 pairs while cutting the join
    quadratically. The declared-query form (small sf) skips the bucket cut
    and is exact; see ``similarity.ann_lsh`` for the bucketed scale path.
    """
    a = embeddings.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("e_a"))
    b = embeddings.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("e_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos", cosine_sim(F.col("e_a"), F.col("e_b")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos_sim"))
        .orderBy("id_a", "id_b")
    )
