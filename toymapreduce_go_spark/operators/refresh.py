"""Delta-driven index maintenance — the composition ``crawl_diff``
exists to drive (verdict r10 item 1): a refresh crawl diffs two
snapshots by canonical URL, and instead of rebuilding 100 TB of
persisted state it RETRACTS exactly the removed/changed pages from
each index and EXTENDS with the re-processed added/changed pages.
Before this, both persisted indexes (the MinHash band archive,
``dedup.write_prior_index``; the IVF vector index,
``similarity.write_vector_index``) could only grow or drop whole
batches by age — a refresh left stale survivors screening future
batches against content that no longer exists.

Reference scope: none — the reference reprocesses its whole input per
run (``play.sh:62-99`` feeds a fixed file list to every job); this is
the north-star extension the r10 verdict ranked first.

Cost shape at 100 TB: the diff's delta is a few percent of a snapshot;
retraction rewrites only the partitions containing delta keys
(``sources.sinks.retract_keys_from_parquet`` — broadcast anti-join,
tmp/old rename protocol, crash-rerunnable); the extension is the
ordinary incremental path (one batch-sized signature/assignment pass,
dynamic-overwrite of its own ``ingest_batch`` partition). Nothing
re-reads, re-hashes, or re-embeds the unchanged archive.

Equality contract (pinned in tests/test_index_retract.py): refreshed
index == fresh build over the new crawl's corpus, provided unchanged
pages keep their ids (they are not reprocessed, by design) and — for
the vector index — the training sample is unchanged (the quantizer is
never retrained on a refresh; ``rebuild_vector_index`` is the
retrain path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RETRACT_STATUSES = ("removed", "changed")
REPROCESS_STATUSES = ("added", "changed")


def stale_keys_from_diff(diff: DataFrame, old_keys: DataFrame,
                         key_col: str) -> DataFrame:
    """Index keys to RETRACT: the removed/changed canons of ``diff``
    (``urls.crawl_diff`` output) mapped to ids through ``old_keys``
    (canon, <key_col>) — the crawl's own URL→id table, metadata-sized
    relative to content. One join between two key-only frames."""
    gone = (diff.filter(F.col("status").isin(*RETRACT_STATUSES))
            .select("canon"))
    return gone.join(old_keys, "canon").select(key_col)


def fresh_rows_from_diff(diff: DataFrame, new_rows: DataFrame) -> DataFrame:
    """The new crawl's rows to (re-)process: added/changed canons only
    — a broadcast-able semi-join gate (the delta is small by the same
    argument that makes diffing worthwhile)."""
    todo = (diff.filter(F.col("status").isin(*REPROCESS_STATUSES))
            .select("canon"))
    return new_rows.join(todo, "canon", "left_semi")


def refresh_band_index(spark, index_path: str, diff: DataFrame,
                       old_ids: DataFrame, new_docs: DataFrame,
                       batch_id: int, n: int = 3,
                       n_hashes: int | None = None,
                       n_bands: int | None = None) -> dict:
    """Refresh the persisted MinHash band archive from a crawl diff:
    retract removed+changed pages' band rows and signatures
    (``dedup.retract_index_keys``), then index the added+changed pages
    from the NEW crawl as one ordinary incremental batch
    (``dedup.write_prior_index`` — dynamic overwrite of its own
    partition, so the refresh itself is crash-rerunnable end to end).

    ``old_ids``: (canon, prior_id) for the indexed corpus.
    ``new_docs``: the new crawl's documents with (doc_id, canon, text).
    Returns the retraction stats plus the extension row count."""
    from .dedup import (N_BANDS, N_HASHES, _check_index_meta,
                        retract_index_keys, write_prior_index)

    n_hashes = N_HASHES if n_hashes is None else n_hashes
    n_bands = N_BANDS if n_bands is None else n_bands
    # validate against the index manifest BEFORE mutating anything: a
    # parameter mismatch must fail with the index untouched, not after
    # the retraction has already removed the changed pages (review r11)
    _check_index_meta(spark, index_path, n, n_hashes, n_bands,
                      "refresh_band_index")
    stale = stale_keys_from_diff(diff, old_ids, "prior_id")
    stats = retract_index_keys(spark, index_path, stale)
    fresh = fresh_rows_from_diff(diff, new_docs)
    write_prior_index(fresh.drop("canon"), index_path,
                      batch_id=batch_id, n=n,
                      n_hashes=n_hashes, n_bands=n_bands)
    stats["extended_docs"] = fresh.count()
    return stats


def refresh_vector_index(spark, index_path: str, diff: DataFrame,
                         old_ids: DataFrame,
                         new_vectors: DataFrame,
                         batch_id: int) -> dict:
    """The vector-index twin: retract removed+changed pages' postings
    (``similarity.retract_vector_index_keys`` — the stored model is
    NOT retrained), then assign the re-embedded added+changed vectors
    with the stored centroids (``similarity.extend_vector_index``).

    ``old_ids``: (canon, vec_id) for the indexed vectors.
    ``new_vectors``: the new crawl's embeddings with
    (vec_id, canon, embedding)."""
    from .similarity import extend_vector_index, \
        retract_vector_index_keys

    stale = stale_keys_from_diff(diff, old_ids, "vec_id")
    stats = retract_vector_index_keys(spark, index_path, stale)
    fresh = fresh_rows_from_diff(diff, new_vectors)
    extend_vector_index(fresh.select("vec_id", "embedding"),
                        index_path, batch_id=batch_id)
    stats["extended_vectors"] = fresh.count()
    return stats
