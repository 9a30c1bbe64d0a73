"""Map/Reduce compat API — parity with the reference's UDF plugin contract.

Reference contract (`pkg/mr/mr.go`):
- ``KeyValue{Key, Value string}``                       (mr.go:91-94)
- ``MapFunc(filename, content) -> []KeyValue``          (mr.go:96)
- ``ReduceFunc(valueIter) -> Iterator`` — called once per distinct key
  over the key's grouped values                         (mr.go:98, and the
  grouped ``KVIterator``/``NextKey`` stream it consumes, mr.go:50-89)
- the sequential-oracle convention ``reduce(key, values) -> value``
  (mrsequential.go:110) used by 7 of the 8 example apps (SURVEY.md App. A.7)

Spark mapping: the two-stage map→shuffle→reduce pipeline the reference
hardcodes (coordinator.go:124-133, :256-271) is literally one RDD chain:

    wholeTextFiles → flatMap(map_f) → repartitionAndSortWithinPartitions
        (n_reduce, hash) → mapPartitions(group-consecutive-keys → reduce_f)

Per Appendix A we implement the *oracle* semantics, not the reference's
broken distributed path: one reduce per distinct key globally (not
per-intermediate-file, A.3), output rows are (key, value) pairs (A.4).
Scheduling, shuffle transport, retry, barriers (F8, F10-F14) are Spark
core.

This layer is intentionally Python-row-based — it exists for plugin parity
(F15), not speed. Every *declared* query except ``mr_compat_wordcount``
uses the declarative operators instead.
"""

from __future__ import annotations

import itertools
from collections.abc import Callable, Iterable, Iterator
from typing import NamedTuple

from pyspark.rdd import portable_hash
from pyspark.sql import DataFrame, SparkSession


class KeyValue(NamedTuple):
    """Compat twin of mr.KeyValue (mr.go:91-94)."""
    key: str
    value: str


MapFunc = Callable[[str, str], Iterable[KeyValue]]
# Grouped form (mr.go:98): receives (key, iterator-of-values), yields
# output value strings — the KVIterator/NextKey stream as a generator.
GroupedReduceFunc = Callable[[str, Iterator[str]], Iterable[str]]
# Sequential-oracle form (mrsequential.go:110): (key, [values]) -> value.
SimpleReduceFunc = Callable[[str, list[str]], str]


def simple_reduce(f: SimpleReduceFunc) -> GroupedReduceFunc:
    """Adapt the (key, values) -> value convention to the grouped form —
    the wrapper SURVEY.md Appendix A.7 calls for."""
    def grouped(key: str, values: Iterator[str]) -> Iterable[str]:
        yield f(key, list(values))
    return grouped


def _reduce_partition(rows: Iterator[tuple[str, str]],
                      reduce_f: GroupedReduceFunc) -> Iterator[KeyValue]:
    """Consume one key-sorted partition; call reduce_f once per distinct
    key with a lazy value iterator (the KVIterator contract, mr.go:50-89,
    minus the ErrStopIter sentinel — Python generators express it
    directly)."""
    for key, group in itertools.groupby(rows, key=lambda kv: kv[0]):
        for out in reduce_f(key, (v for _, v in group)):
            yield KeyValue(key, out)


def run_map_reduce(spark: SparkSession,
                   map_f: MapFunc,
                   reduce_f: GroupedReduceFunc,
                   inputs: DataFrame,
                   n_reduce: int = 4) -> DataFrame:
    """Run a map/reduce job over ``inputs``, a DataFrame whose first two
    columns are (filename/doc-id string, content string) — the reference's
    input unit (mr.go:96).

    Returns a DataFrame(key string, value string), one row per reduce
    output — the sequential oracle's "key value" line format
    (mrsequential.go:84).
    """
    # Map parallelism floors at the session default (r14): the reference
    # coordinator splits its input among ALL map workers
    # (coordinator.go task queue); a single-row-group parquet input
    # would otherwise run every Python map task on one core. No-op once
    # the input already has enough partitions; the reduce side is
    # unchanged (n_reduce sorted hash partitions either way).
    from ..functions.partitioning import spread_for_compute
    inputs = spread_for_compute(inputs, inputs.columns[0])
    pairs = (
        inputs.rdd
        .flatMap(lambda row: [(kv[0], kv[1])
                              for kv in map_f(str(row[0]), str(row[1]))])
        # sort-based shuffle, hash partitioner — F3/F4/F5/F6 in one call
        .repartitionAndSortWithinPartitions(
            numPartitions=n_reduce, partitionFunc=portable_hash)
        .mapPartitions(lambda rows: _reduce_partition(rows, reduce_f))
    )
    return spark.createDataFrame(pairs, schema="key string, value string")


def run_map_reduce_files(spark: SparkSession,
                         map_f: MapFunc,
                         reduce_f: GroupedReduceFunc,
                         path_glob: str,
                         n_reduce: int = 4) -> DataFrame:
    """File-path variant: whole-file (filename, content) input exactly like
    the reference's fsutil.ReadAll scan (util.go:7-21, worker.go:199).
    Fine for plugin-compat corpora; at 100 TB use the documents table or
    ``sources.read_text_corpus`` — never whole-file reads (SURVEY.md §7).
    """
    files = spark.sparkContext.wholeTextFiles(path_glob)
    inputs = spark.createDataFrame(files, schema="filename string, content string")
    return run_map_reduce(spark, map_f, reduce_f, inputs, n_reduce)


# ---------------------------------------------------------------------------
# Compat twins of the reference's example apps (example/mrapps/*), usable
# as plug-in UDF pairs with run_map_reduce.

import re

_WORD_RE = re.compile(r"[A-Za-z]+")


def wc_map(filename: str, content: str) -> list[KeyValue]:
    """wc.go:24-37 — one ("word","1") per occurrence (ASCII-letter tokens,
    FIXTURES.md §1 contract)."""
    return [KeyValue(w, "1") for w in _WORD_RE.findall(content)]


def wc_reduce(key: str, values: Iterator[str]) -> Iterable[str]:
    """wc.go:44-55 — count the group (streaming, O(1) memory)."""
    yield str(sum(1 for _ in values))


def indexer_map(filename: str, content: str) -> list[KeyValue]:
    """indexer.go:22-31 — distinct words per doc."""
    return [KeyValue(w, filename) for w in sorted(set(_WORD_RE.findall(content)))]


def indexer_reduce(key: str, values: Iterator[str]) -> Iterable[str]:
    """indexer.go:38-41 — "{n} doc1,doc2,...": sorted doc list."""
    docs = sorted(set(values))
    yield f"{len(docs)} {','.join(docs)}"
