"""Fault-tolerance smoke — honors the reference crash test's *intent*
(play.sh:268-315: workers crash 33% of the time; final output must equal
the golden run). Spark's task retry is the mechanism (SURVEY.md §2a
F11/F12 map to spark.task.maxFailures).

Runs in a subprocess because retries need a master of the form
local[N, maxFailures] and the shared test session is local[N] (task
retries disabled)."""

from __future__ import annotations

import subprocess
import sys
import textwrap


def test_task_retry_produces_correct_result():
    code = textwrap.dedent("""
        import sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession
        from pyspark import TaskContext

        spark = (SparkSession.builder.master("local[4, 4]")
                 .appName("crash-smoke")
                 .config("spark.sql.shuffle.partitions", "4")
                 .config("spark.ui.enabled", "false")
                 .getOrCreate())

        def flaky(it):
            # every task fails on its first attempt, succeeds on retry —
            # a deterministic stand-in for crash.go's 33% exit(1)
            if TaskContext.get().attemptNumber() == 0:
                raise RuntimeError("injected crash (first attempt)")
            for x in it:
                yield x

        rdd = spark.sparkContext.parallelize(range(1000), 4).mapPartitions(flaky)
        assert rdd.sum() == 499500, rdd.sum()
        # and a DataFrame agg over the same flaky source
        df = spark.createDataFrame(rdd.map(lambda x: (x % 7, x)), "k long, v long")
        total = df.groupBy().sum("v").collect()[0][0]
        assert total == 499500, total
        print("RETRY_OK")
        spark.stop()
    """)
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=300)
    assert "RETRY_OK" in proc.stdout, proc.stderr[-2000:]


def test_iterative_clusters_and_pipeline_survive_task_crashes():
    """r7 verdict item: kill-and-retry smoke for the NEW stateful paths —
    the connected-components frontier loop (localCheckpoint per round)
    and the multi-stage corpus pipeline (persisted stage boundaries).
    Tasks on even partitions crash on their first attempt at the source
    scan; outputs must be identical to the clean run (the play.sh
    crash-test differential intent)."""
    code = textwrap.dedent("""
        import sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession
        from pyspark import TaskContext

        spark = (SparkSession.builder.master("local[4, 4]")
                 .appName("crash-iterative")
                 .config("spark.sql.shuffle.partitions", "4")
                 .config("spark.ui.enabled", "false")
                 .getOrCreate())
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        schema = docs.schema

        def flaky(it):
            tc = TaskContext.get()
            if tc.attemptNumber() == 0 and tc.partitionId() % 2 == 0:
                raise RuntimeError("injected crash (first attempt)")
            for row in it:
                yield row

        flaky_docs = spark.createDataFrame(
            docs.rdd.mapPartitions(flaky), schema)

        from toymapreduce_go_spark.operators.dedup import near_dup_clusters
        golden = sorted(tuple(r) for r in near_dup_clusters(docs).collect())
        crashy = sorted(tuple(r) for r in
                        near_dup_clusters(flaky_docs).collect())
        assert golden and golden == crashy, (len(golden), len(crashy))

        from toymapreduce_go_spark.pipeline import build_training_corpus
        cur_g, fun_g = build_training_corpus(spark, "/root/testdata/sf0.001")
        cur_c, fun_c = build_training_corpus(spark, "/root/testdata/sf0.001",
                                             docs=flaky_docs)
        assert [tuple(r) for r in fun_g.collect()] == \\
               [tuple(r) for r in fun_c.collect()]
        assert sorted(tuple(r) for r in cur_g.collect()) == \\
               sorted(tuple(r) for r in cur_c.collect())
        print("ITER_RETRY_OK")
        spark.stop()
    """)
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=600)
    assert "ITER_RETRY_OK" in proc.stdout, proc.stderr[-3000:]
