"""A user-pluggable Python DataSource for the reference's native file
format — the F16 "pluggable filesystem/format" story made concrete.

The reference's only on-disk interchange format is the reduce output:
one ``"key value"`` line per record, one ``mr-out-N`` file per reduce
task (worker.go:301-320; oracle layout mrsequential.go:62-84). This
module registers that format as a first-class Spark source/sink via the
PySpark 4 Python DataSource API:

    spark.dataSource.register(KVTextDataSource)
    df = spark.read.format("kvtext").load("out_dir")          # read
    df.write.format("kvtext").mode("append").save("dir2")     # write

so reference output directories (and this repo's ``write_text_kv`` CLI
output) round-trip losslessly — a reference user's downstream tooling
keeps working against Spark-produced data and vice versa.

Scale posture: one input partition per file (the reference's own
granularity — files are reduce-task-sized); reads stream line-by-line,
never materializing a file in memory. The value may itself contain
spaces (crash.go's reduce joins values with " "), so only the FIRST
space splits key from value — same contract as the sink.

All filesystem access goes through the scheme→client registry
(``sources.fs``, the F16 twin of pkg/fsutil/fsclient.go:14-45): a
``register_fs``-ed scheme makes ``myfs://...`` paths readable AND
writable here, including the rename-on-commit protocol. The client is
resolved at plan-build time and pickled to executors with the
reader/writer.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from .fs import fs_for

KV_SCHEMA = "key string, value string"


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class KVTextReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kvtext requires a path: .load(<dir or file>)")
        self.fs = fs_for(self.path)

    def partitions(self) -> Sequence[InputPartition]:
        fs = self.fs
        if fs.isdir(self.path):
            files = sorted(
                fs.join(self.path, f) for f in fs.listdir(self.path)
                if not f.startswith(("_", "."))
                and fs.isfile(fs.join(self.path, f)))
        else:
            files = [self.path]
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with self.fs.open(partition.path) as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                key, sep, value = line.partition(" ")
                yield (key, value if sep else None)


class _WroteFile(WriterCommitMessage):
    def __init__(self, path: str, n: int):
        self.path = path
        self.n = n


class KVTextWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kvtext requires a path: .save(<dir>)")
        self.overwrite = overwrite
        self.fs = fs_for(self.path)

    def write(self, rows: Iterator) -> WriterCommitMessage:
        """One ``mr-out``-style part file per task — the reference's
        one-file-per-reduce layout. Written to a task-unique temp name;
        commit() renames winners so failed/speculative attempts leave
        nothing visible (the same rename-on-commit protocol the
        reference uses for map output, worker.go:286-299)."""
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        fs = self.fs
        fs.makedirs(self.path)
        tmp = fs.join(self.path,
                      f"._tmp-{pid}-{uuid.uuid4().hex[:12]}")
        n = 0
        try:
            with fs.open(tmp, "w") as f:
                for row in rows:
                    key, value = row[0], row[1]
                    # the line format cannot represent these; fail loudly
                    # instead of writing a file that reads back differently
                    # \r is unrepresentable too: text-mode universal
                    # newlines would translate a trailing "\r\n" to
                    # "\n" on read, silently mutating the value
                    # "" is unrepresentable too: with a None value it
                    # writes a bare newline the reader skips as a blank
                    # line — a silently lost row
                    if not key or " " in key or "\n" in key \
                            or "\r" in key:
                        raise ValueError(
                            f"kvtext: unrepresentable key {key!r} "
                            "(None, empty, space, or newline)")
                    if value is not None and ("\n" in value
                                              or "\r" in value):
                        raise ValueError("kvtext: newline in value for key "
                                         f"{key!r}")
                    # None value -> bare "key" line, which the reader
                    # returns as (key, None): lossless round-trip (and
                    # byte-identical to concat_ws's null-dropping sink)
                    f.write(f"{key}\n" if value is None
                            else f"{key} {value}\n")
                    n += 1
        except BaseException:
            # a failing task gets no abort() callback for its own file —
            # clean up here or the partial temp leaks forever
            fs.remove(tmp)
            raise
        return _WroteFile(tmp, n)

    def commit(self, messages) -> None:
        fs = self.fs
        # write() creates the dir per task, but a zero-partition write
        # (empty RDD) runs no tasks — commit() must still produce a valid
        # (empty) output dir instead of FileNotFoundError
        fs.makedirs(self.path)
        start = 0
        if self.overwrite:
            # clear every file a reader would see (mr-out-*, part-*,
            # _SUCCESS...), not just our own layout — "overwrite" must
            # not leave prior data to be unioned into the next read
            for f in fs.listdir(self.path):
                p = fs.join(self.path, f)
                if not f.startswith("._tmp") and fs.isfile(p):
                    fs.remove(p)
        else:
            # append: continue numbering AFTER existing part files so a
            # second append never clobbers the first (mr-out-0 from run
            # 1 silently replaced by run 2's would lose data)
            taken = [int(f[len("mr-out-"):]) for f in fs.listdir(self.path)
                     if f.startswith("mr-out-")
                     and f[len("mr-out-"):].isdigit()]
            start = max(taken) + 1 if taken else 0
        for i, m in enumerate(messages):
            fs.replace(m.path, fs.join(self.path, f"mr-out-{start + i}"))

    def abort(self, messages) -> None:
        for m in messages:
            self.fs.remove(m.path)


class KVTextDataSource(DataSource):
    """``spark.read.format("kvtext")`` / ``df.write.format("kvtext")``."""

    @classmethod
    def name(cls) -> str:
        return "kvtext"

    def schema(self) -> str:
        return KV_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return KVTextReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        # exact (key, value) only: extra columns would be silently
        # dropped by the line format, which is data loss, not coercion
        if [f.name for f in schema.fields] != ["key", "value"]:
            raise ValueError(
                f"kvtext writes (key, value) frames, got {schema.simpleString()}")
        return KVTextWriter(self.options, overwrite)


def register(spark) -> None:
    """Register the source (idempotent: Spark 4 replaces an existing
    Python data-source registration under the same name, so real
    failures — missing API, serialization errors — surface here rather
    than as a confusing DATA_SOURCE_NOT_FOUND at first use)."""
    spark.dataSource.register(KVTextDataSource)
