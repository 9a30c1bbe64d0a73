"""Table sources.

The reference supports exactly one source: whole local text files behind a
scheme→client registry (`pkg/fsutil/fsclient.go:14-45`, only ``file://`` is
implemented at :47-76). Spark's Hadoop FileSystem layer supersedes the
registry (file://, hdfs://, s3a:// for free); this module is the typed-table
layer on top: every engine table is columnar Parquet, read lazily so
Catalyst prunes columns and pushes filters into the scan.

At 100 TB the fact tables (lineitem, events, documents, embeddings) are
assumed to be partitioned Parquet/Delta directories; ``load_table`` takes a
directory so the same call reads one file locally or 10k files on a
cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Every table in the engine's catalog (TESTDATA.md).
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimension tables: small, slowly-growing — always broadcastable in joins
# against the fact tables, at every scale factor we target.
DIM_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})

# Small-unsplittable-input fan-out (fact tables only). A Parquet file is
# splittable at row-group granularity; a single-row-group file — the shape
# of the local fixtures — yields exactly ONE scan task no matter how many
# cores the cluster has, serializing every downstream map-side operator
# (tokenize, hash, vector math) onto one thread. Fan the scan out with a
# bounded round-robin exchange when the input is small enough that the
# shuffle is provably cheap (< FANOUT_MAX_BYTES moves < 64 MB — noise on
# any cluster) yet big enough to carry real map work (> FANOUT_MIN_BYTES).
# At production scale the window never triggers: a 100 TB table is
# thousands of files / row groups and the scan parallelizes naturally, so
# this is a no-op exactly where a repartition would be catastrophic.
#
# Only the compute-heavy tables qualify: documents (tokenize / shingle /
# hash entire texts) and embeddings (64-dim vector math) do real per-row
# work BEFORE their first shuffle, so a serial scan starves every core.
# Relational tables (lineitem/orders/events) hit a groupBy/join exchange
# immediately — the shuffle already parallelizes the pipeline, and a
# fan-out would just prepend a redundant exchange (measured +0.5-0.7 s
# per query at sf0.1). Dimension tables exist to be broadcast, not
# mapped.
FANOUT_TABLES = frozenset({"documents", "embeddings"})
FANOUT_MIN_BYTES = 256 * 1024
FANOUT_MAX_BYTES = 64 * 1024 * 1024


def _input_bytes(path: str) -> int:
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(path) for f in files
        )
    try:
        return os.path.getsize(path)
    except OSError:
        return FANOUT_MAX_BYTES  # non-local URI: assume big, never fan out


def normalize_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the event-time column to Spark's session-tz TIMESTAMP.

    Physical parquet encodings seen from upstream producers (the driver's
    testdata generator has shipped all three across rounds):

    - ``TIMESTAMP(NANOS)`` — surfaces as long (ns since epoch) under
      ``spark.sql.legacy.parquet.nanosAsLong``; convert with integer
      division (no double round-trip — ns epochs exceed double's 53-bit
      mantissa). DuckDB's ``epoch_us()`` truncates the same way, so oracle
      comparisons agree.
    - ``timestamp[us]`` with isAdjustedToUTC=false — Spark 4 infers
      TIMESTAMP_NTZ, which ``unix_micros``/``window``/``withWatermark``
      all reject. The session tz is pinned UTC (session.py), so casting to
      TIMESTAMP preserves the wall-clock value and matches DuckDB, which
      reads the same bytes as a plain TIMESTAMP.
    - ``timestamp[us, tz=UTC]`` — already Spark TIMESTAMP; no-op.
    """
    from pyspark.sql.types import LongType, TimestampNTZType

    for field in df.schema.fields:
        if field.name != col:
            continue
        if isinstance(field.dataType, LongType):
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
        elif isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazily read one catalog table from ``sf_dir``.

    Accepts ``<dir>/<name>.parquet`` (a file or a directory of part files —
    Spark treats both identically).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Runtime-set (not only in our session builder) because callers — the
    # driver included — may hand us a session built elsewhere; without it
    # Spark refuses parquet TIMESTAMP(NANOS) columns outright.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    df = normalize_event_time(df)
    if name in FANOUT_TABLES:
        if FANOUT_MIN_BYTES < _input_bytes(path) < FANOUT_MAX_BYTES:
            df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def read_text_corpus(spark: SparkSession, path_glob: str) -> DataFrame:
    """Scale-path replacement for the reference's whole-file text scan
    (`pkg/fsutil/util.go:7-21` + `internal/worker/worker.go:199`).

    Returns (filename string, line string) without ever materializing a
    whole file in one task: ``spark.read.text`` splits large files by byte
    range, and ``input_file_name()`` recovers the filename grouping key.
    Whole-file semantics, when a compat UDF truly needs them, are
    ``group_by(filename).agg(concat_ws('\\n', collect_list(line)))`` — or
    the mr compat layer's ``wholeTextFiles`` for small corpora.
    """
    df = spark.read.text(path_glob)
    return df.select(
        F.input_file_name().alias("filename"),
        F.col("value").alias("line"),
    )
