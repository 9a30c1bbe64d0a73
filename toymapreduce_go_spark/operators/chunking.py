"""Document chunking: split long documents into overlapping
fixed-token windows — the complement of sequence packing
(``operators/packing.py:19`` explicitly defers oversized-document
splitting to a chunker; this is that chunker). A training pipeline
runs both: chunking bounds every unit of text at ``chunk_tokens`` so
the packer's bins never hold an over-budget document, and the
``overlap`` tokens of shared context keep windows self-contained
(the standard long-document recipe for LLM pretraining and for
embedding/retrieval indexes).

Reference scope note: the reference runtime ships no text-splitting
operator (its mrapps treat whole files as units — ``mrapps/wc.go``);
chunking is part of this repo's declared LLM-curation surface.

Semantics (all integer-exact, replayed verbatim by the DuckDB
oracle):

- tokens = the ASCII tokenizer (``functions/text.py`` — the corpus
  token convention every text operator here shares)
- stride s = chunk_tokens − overlap (requires overlap < chunk_tokens)
- n_chunks = 0 for an empty token stream, 1 when n ≤ chunk_tokens,
  else 1 + ceil((n − chunk_tokens)/s) — the minimal count whose last
  window still reaches the final token
- chunk i = tokens[i·s + 1 .. i·s + chunk_tokens] (1-based, fixed
  left-anchored starts, CLAMPED at the stream end): consecutive
  chunks always share exactly ``overlap`` tokens; the LAST chunk may
  be shorter than ``chunk_tokens`` (it keeps its stride position and
  simply runs out of tokens — never padded, never re-anchored)
- chunk text is the token stream re-joined with single spaces —
  canonical whitespace, NOT the original byte span (the tokenizer
  already dropped punctuation; disclosed, matched by the oracle)

Plan shape — why this scales: chunking is a pure scan-side
projection (tokens → one ``transform(sequence(...))`` building all
windows → ``posexplode``). No shuffle, no join, no Python; a 100 TB
corpus streams through the scan stage and chunk rows flow straight
into whatever consumes them (the stats rollup here is one
count-combinable aggregate on a sources-sized key space).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.checksum import CKSUM_MOD as _CKSUM_MOD
from ..functions.text import tokens

CHUNK_TOKENS = 32
CHUNK_OVERLAP = 8


def chunk_documents(documents: DataFrame,
                    chunk_tokens: int = CHUNK_TOKENS,
                    overlap: int = CHUNK_OVERLAP) -> DataFrame:
    """(doc_id, source, chunk_id, n_tokens, text) — one row per window.
    Zero-token documents produce zero chunks (there is nothing to
    train on; disclosed, mirrored by the oracle)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got overlap={overlap}, "
            f"chunk_tokens={chunk_tokens}")
    s = chunk_tokens - overlap
    toks = documents.select(
        "doc_id", "source", tokens("text").alias("toks"),
        F.size(tokens("text")).alias("n"))
    # minimal window count: 1 + ceil((n - c)/s) via integer div — the
    # cross-engine ceil-div convention (Spark div == DuckDB //)
    n_chunks = (
        F.when(F.col("n") <= 0, F.lit(0))
        .when(F.col("n") <= chunk_tokens, F.lit(1))
        .otherwise(F.expr(
            f"1 + ((n - {chunk_tokens} + {s - 1}) div {s})")))
    toks = toks.select(
        "doc_id", "source", "toks",
        n_chunks.cast("long").alias("n_chunks"))
    # NB: sequence(1, 0) steps DOWNWARD in Spark ([1, 0]) — an empty
    # doc must short-circuit to an empty window array, not two phantoms
    chunk = toks.select(
        "doc_id", "source",
        F.posexplode(F.expr(
            f"CASE WHEN n_chunks < 1 THEN array() "
            f"ELSE transform(sequence(1, n_chunks), "
            f"i -> slice(toks, (i - 1) * {s} + 1, {chunk_tokens})) END"
        )).alias("chunk_id", "ctoks"))
    return chunk.select(
        "doc_id", "source", F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size("ctoks").cast("long").alias("n_tokens"),
        F.concat_ws(" ", F.col("ctoks")).alias("text"))


def chunk_stats(documents: DataFrame,
                chunk_tokens: int = CHUNK_TOKENS,
                overlap: int = CHUNK_OVERLAP) -> DataFrame:
    """Per-source chunking rollup with a content-certifying checksum:
    (source, n_docs, n_chunks, sum_chunk_tokens, max_chunk_tokens,
    chunk_checksum). The checksum folds every chunk's md5-derived
    48-bit text hash (weighted by chunk_id + 1, reduced mod a prime)
    into the value-hash, so the oracle comparison pins window
    boundaries, token slicing, AND the re-joined chunk text — not
    just the counts."""
    ch = chunk_documents(documents, chunk_tokens, overlap)
    h = F.pmod(
        F.conv(F.substring(F.md5("text"), 1, 12), 16, 10).cast("long"),
        F.lit(_CKSUM_MOD))
    # the weighted term is reduced mod the prime BEFORE the SUM so every
    # term honors checksum.py's "< ~10^6" invariant — unreduced,
    # (chunk_id+1)*h reaches ~6.7e13 for int32-length docs and a
    # per-source int64 SUM can wrap (Spark wraps silently, DuckDB sums
    # in HUGEINT → silent value-hash divergence at scale)
    return (ch
            .select("doc_id", "source", "n_tokens",
                    F.pmod((F.col("chunk_id") + 1) * h,
                           F.lit(_CKSUM_MOD)).alias("term"))
            .groupBy("source")
            .agg(F.count_distinct("doc_id").alias("n_docs"),
                 F.count(F.lit(1)).alias("n_chunks"),
                 F.sum("n_tokens").alias("sum_chunk_tokens"),
                 F.max("n_tokens").alias("max_chunk_tokens"),
                 F.sum("term").alias("chunk_checksum"))
            .orderBy("source"))
