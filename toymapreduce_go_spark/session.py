"""SparkSession construction with scale-aware defaults.

The reference has no tunables beyond ``-nreduce`` (cmd/main.go:22). Here the
session is where 100 TB posture is set: AQE for runtime re-planning (skew
joins, partition coalescing), broadcast threshold for star-schema dims,
Arrow for any Python/pandas exchange, UTC session timezone for oracle
determinism (FIXTURES.md §3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def build_session(app_name: str = "toymapreduce-go-spark",
                  shuffle_partitions: int | None = None,
                  local_max_failures: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's default config.

    On a real cluster the master/parallelism come from the environment; the
    configs below are the ones that matter at any scale:

    - AQE on: runtime shuffle-partition coalescing + skew-join splitting.
      The reference has no skew handling at all (SURVEY.md §4), so one hot
      key serializes a reduce; AQE is our answer.
    - broadcast threshold 64 MB: region/nation/supplier/part/customer are
      dimension tables; at 100 TB the fact table is lineitem/events/
      documents — dims stay broadcastable far past sf1000.
    - Arrow enabled: any pandas_udf / applyInPandas exchange is
      Arrow-batched, never per-row pickling.
    """
    cpus = default_parallelism()
    if shuffle_partitions is None:
        # local mode: ~1 partition per core; a cluster would size this to
        # target ~128MB post-shuffle partitions (or let AQE coalesce).
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python workers are the expensive resource behind the mr-compat
        # RDD layer and every pandas UDF: a fork per task turns a 1.5s
        # query into a 3s+ one (the r6 bench saw exactly that class of
        # swing). reuse=true is Spark's default — pinned here so a
        # deployment override can never silently reintroduce
        # fork-per-task on the declared Python-stage queries.
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet stores TIMESTAMP(NANOS); Spark has no nanos
        # timestamp type — read as long and convert in sources.registry.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # local mode: the driver JVM hosts all executor threads, so the
        # heap must be sized for cores × per-task memory, not a remote
        # driver's footprint — 8g across 32 concurrent tasks GC-thrashes.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        # Whole-stage codegen emits one compiled class per stage; a session
        # running the full 51-query surface overflows the JVM's default
        # 240 MB code cache, after which the JIT flushes hot methods /
        # stops compiling and every later query runs 2-4x slower. Only
        # effective at JVM launch (harmless no-op on an existing session).
        .config("spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=1g")
    )
    # Only default to local[N] when nothing else manages the master:
    # under spark-submit the driver JVM already carries spark.master (and
    # PythonRunner exports PYSPARK_GATEWAY_PORT before python starts), and
    # the pyspark shell passes --master via PYSPARK_SUBMIT_ARGS — forcing
    # local[N] there would silently override the cluster master.
    externally_managed = (
        os.environ.get("SPARK_MASTER")
        or os.environ.get("MASTER")
        or os.environ.get("PYSPARK_GATEWAY_PORT")
        or "--master" in os.environ.get("PYSPARK_SUBMIT_ARGS", "")
    )
    if not externally_managed:
        # local[N, M] enables M task attempts (F12 retry budget) — used
        # by the CLI so the crash compat app's injected failures retry;
        # on a cluster spark.task.maxFailures comes from spark-submit.
        builder = builder.master(
            f"local[{cpus}, {local_max_failures}]" if local_max_failures
            else f"local[{cpus}]")
    spark = builder.getOrCreate()
    if hasattr(spark, "dataSource"):  # Spark 4 Python DataSource API
        from .sources.kvtext import register
        register(spark)
    return spark
