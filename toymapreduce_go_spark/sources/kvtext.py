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

KV_SCHEMA = "key string, value string"


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class KVTextReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kvtext requires a path: .load(<dir or file>)")

    def partitions(self) -> Sequence[InputPartition]:
        import os

        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f) for f in os.listdir(self.path)
                if not f.startswith(("_", "."))
                and os.path.isfile(os.path.join(self.path, f)))
        else:
            files = [self.path]
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8") as f:
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

    def write(self, rows: Iterator) -> WriterCommitMessage:
        """One ``mr-out``-style part file per task — the reference's
        one-file-per-reduce layout. Written to a task-unique temp name;
        commit() renames winners so failed/speculative attempts leave
        nothing visible (the same rename-on-commit protocol the
        reference uses for map output, worker.go:286-299)."""
        import os
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path,
                           f"._tmp-{pid}-{uuid.uuid4().hex[:12]}")
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in rows:
                key, value = row[0], row[1]
                # the line format cannot represent these; fail loudly
                # instead of writing a file that reads back differently
                if key is None or " " in key or "\n" in key:
                    raise ValueError(f"kvtext: unrepresentable key {key!r} "
                                     "(None, space, or newline)")
                if value is not None and "\n" in value:
                    raise ValueError("kvtext: newline in value for key "
                                     f"{key!r}")
                f.write(f"{key} {'' if value is None else value}\n")
                n += 1
        return _WroteFile(tmp, n)

    def commit(self, messages) -> None:
        import os

        if self.overwrite:
            for f in os.listdir(self.path):
                if f.startswith("mr-out-"):
                    os.remove(os.path.join(self.path, f))
        for i, m in enumerate(messages):
            os.replace(m.path, os.path.join(self.path, f"mr-out-{i}"))

    def abort(self, messages) -> None:
        import os

        for m in messages:
            try:
                os.remove(m.path)
            except OSError:
                pass


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
        if [f.name for f in schema.fields][:2] != ["key", "value"]:
            raise ValueError(
                f"kvtext writes (key, value) frames, got {schema.simpleString()}")
        return KVTextWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotent registration (re-register is a no-op error in Spark)."""
    try:
        spark.dataSource.register(KVTextDataSource)
    except Exception:
        pass
