"""The reference's app-level text operations (SURVEY.md §2b A1-A6),
re-expressed as declarative DataFrame plans over the ``documents`` table
(doc_id plays filename, text plays content — FIXTURES.md §1).

Scale notes: every operator here is a single shuffle (one groupBy on the
token or doc key) with map-side partial aggregation supplied by Catalyst's
partial/final HashAggregate split — the combiner the reference lacks
(wc.go:31-36 ships one ("word","1") per occurrence; SURVEY.md §4). Word
keys are near-uniform so no skew handling is needed; if a corpus had a
degenerate hot token, AQE skew-coalescing covers it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, tokens_unicode, words_exploded


def wordcount(documents: DataFrame) -> DataFrame:
    """A1+A2 (reference wc.go:24-55): occurrences per token across the
    corpus. One wide shuffle on `word`, partial-agg before it."""
    return (
        words_exploded(documents.select("doc_id", "text"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy("word")
    )


def unicode_wordcount(documents: DataFrame) -> DataFrame:
    """Wordcount under the reference's ACTUAL tokenizer contract —
    full-Unicode ``FieldsFunc(!unicode.IsLetter)`` (wc.go:26-29) via
    ``\\p{L}`` letter runs — rather than the ASCII-pinned form the other
    declared text queries use. Declared in round 7: the driver fixtures
    are pure ASCII (25 distinct chars, enumerated), where Java regex and
    DuckDB's RE2 trivially agree on ``[^\\p{L}]+``; both engines are
    Unicode-aware beyond that (pytest pins the multilingual behavior and
    the cross-engine agreement on a non-ASCII fixture). Same plan shape
    as ``wordcount``: one shuffle, map-side partial agg."""
    return (
        documents.select(
            F.explode(tokens_unicode("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy("word")
    )


def inverted_index(documents: DataFrame) -> DataFrame:
    """A3 (reference indexer.go:22-41): word → number of distinct docs and
    the sorted csv of doc ids containing it.

    The reference sorts doc names lexicographically (indexer.go:38-41);
    here doc_id is numeric so we sort numerically then stringify —
    deterministic either way, pinned in the oracle identically.

    The per-doc word *set* (indexer.go:23-31) is array_distinct on the
    token array — map-side, inside the scan stage — NOT a (word, doc_id)
    distinct, which would cost a second full shuffle before the groupBy.
    """
    pairs = documents.select(
        "doc_id",
        F.explode(F.array_distinct(tokens("text"))).alias("word"))
    return (
        pairs.groupBy("word")
        .agg(
            F.count("doc_id").alias("n_docs"),
            F.concat_ws(
                ",", F.transform(F.sort_array(F.collect_set("doc_id")),
                                 lambda d: d.cast("string"))
            ).alias("doc_ids"),
        )
        .orderBy("word")
    )


def distinct_words_per_doc(documents: DataFrame) -> DataFrame:
    """A3 map half: doc_id → count(distinct word). Zero shuffles: the
    per-doc distinct count is size(array_distinct(tokens)) computed in
    the scan stage — no explode, no groupBy (the reference pays a full
    shuffle for this; so would a countDistinct formulation)."""
    return (
        documents.select(
            "doc_id",
            F.size(F.array_distinct(tokens("text"))).alias("n_words"))
        .filter(F.col("n_words") > 0)
        .orderBy("doc_id")
    )


def per_source_doc_count(documents: DataFrame) -> DataFrame:
    """A5 analog (early_exit.go:21-40 counts records per input file):
    documents per source."""
    return (
        documents.groupBy("source")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("source")
    )


def sorted_concat_sources_per_lang(documents: DataFrame) -> DataFrame:
    """A4 (crash.go:48-58 / nocrash.go:40-50: per-key sorted value concat):
    per lang, the sorted csv of the *set* of sources."""
    return (
        documents.groupBy("lang")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("source"))).alias("sources"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("lang")
    )


def constant_key_metadata(documents: DataFrame) -> DataFrame:
    """A6 (crash.go:37-46): per doc emit fixed keys a/b/c/d with
    (doc id, id-string length, text length, literal) — an unpivot/stack."""
    base = documents.select(
        F.col("doc_id"),
        F.col("doc_id").cast("string").alias("id_str"),
        F.length("text").alias("text_len"),
    )
    return (
        base.select(
            "doc_id",
            F.expr(
                "stack(4, 'a', id_str, 'b', cast(length(id_str) as string), "
                "'c', cast(text_len as string), 'd', 'xyzzy') as (k, v)"
            ),
        )
        .orderBy("doc_id", "k")
    )
