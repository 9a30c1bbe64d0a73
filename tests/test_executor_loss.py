"""Executor-PROCESS-loss resilience (round-9 verdict item 8).

`tests/test_resilience.py` proves task-retry (`local[N,M]`) — the
reference crash test's intent — but every task there lives in ONE JVM.
This runs the composed streaming ingest and the WebDataset sink under
``local-cluster[2,2,1024]`` (a real standalone Master/Worker with two
separate executor JVMs), SIGKILLs one executor mid-stream, and requires

- the stream to finish with state byte-identical to the clean run
  (lost shuffle/state recomputed, idempotent foreachBatch steps absorb
  any replay),
- the cluster to relaunch the lost executor (standalone Worker
  supervision), and
- the tar sink on the recovered cluster to produce byte-identical
  shards to the pre-kill run (the sink's write-tmp + rename protocol).

Subprocess-isolated (its own master; the shared session is local[32]).
Marker-gated as ``local_cluster`` so environments without the
standalone launcher can deselect it.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pytest


@pytest.mark.local_cluster
def test_executor_kill_mid_stream_recovers_and_matches_golden():
    code = textwrap.dedent("""
        import hashlib, os, signal, subprocess, sys, tempfile
        import threading, time
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession

        spark = (SparkSession.builder.master("local-cluster[2,2,1024]")
                 .appName("executor-loss-smoke")
                 .config("spark.sql.shuffle.partitions", "4")
                 .config("spark.task.maxFailures", "8")
                 .config("spark.ui.enabled", "false")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        app_id = spark.sparkContext.applicationId

        def executor_pids():
            out = subprocess.run(["ps", "-eo", "pid,args"],
                                 capture_output=True, text=True).stdout
            return [int(l.strip().split(None, 1)[0])
                    for l in out.splitlines()
                    if "CoarseGrainedExecutorBackend" in l
                    and app_id in l]

        def await_executors(n, budget=90):
            deadline = time.time() + budget
            while time.time() < deadline:
                pids = executor_pids()
                if len(pids) >= n:
                    return pids
                time.sleep(0.5)
            raise AssertionError(f"never saw {n} executors")

        first = await_executors(2)

        sf = "/root/testdata/sf0.001"
        from toymapreduce_go_spark.sources.wds import write_webdataset
        from toymapreduce_go_spark.streaming.events_stream import (
            read_documents_stream)
        from toymapreduce_go_spark.streaming.ingest import (
            read_survivors, read_telemetry, run_curation_ingest)

        base = tempfile.mkdtemp(prefix="execloss")
        docs = spark.read.parquet(sf + "/documents.parquet")

        def tel(state):
            return sorted((r["n_docs"], r["n_pass"]) for r in
                          read_telemetry(spark, state).collect())

        def surv(state):
            return sorted(r["doc_id"] for r in
                          read_survivors(spark, state).collect())

        def tarsig(d):
            return {name: hashlib.sha256(
                        open(os.path.join(d, name), "rb").read()
                    ).hexdigest()
                    for name in sorted(os.listdir(d))
                    if name.endswith(".tar")}

        # golden runs on the intact 2-executor cluster
        golden = os.path.join(base, "golden")
        run_curation_ingest(read_documents_stream(spark, sf, n_splits=6),
                            golden, spark)
        g_tel, g_surv = tel(golden), surv(golden)
        assert len(g_tel) == 6 and g_surv
        wds_a = os.path.join(base, "wds_a")
        write_webdataset(docs, wds_a, docs_per_shard=20)
        sig_a = tarsig(wds_a)
        assert len(sig_a) >= 2

        # crash run: SIGKILL one executor JVM as soon as the first
        # batch's state hits disk (later batches are then in flight)
        crash = os.path.join(base, "crash")
        killed = {}

        def killer():
            deadline = time.time() + 180
            while time.time() < deadline and "pid" not in killed:
                for dp, _d, fn in os.walk(crash):
                    if any(f.endswith(".parquet") for f in fn):
                        victims = executor_pids()
                        if victims:
                            os.kill(victims[0], signal.SIGKILL)
                            killed["pid"] = victims[0]
                            return
                time.sleep(0.2)

        th = threading.Thread(target=killer)
        th.start()
        run_curation_ingest(read_documents_stream(spark, sf, n_splits=6),
                            crash, spark, timeout=480)
        th.join()
        assert "pid" in killed, "killer never fired"
        assert tel(crash) == g_tel, (tel(crash), g_tel)
        assert surv(crash) == g_surv

        # the Worker relaunches the lost executor...
        relaunched = await_executors(2)
        assert killed["pid"] not in relaunched
        # ...and the sink on the recovered cluster is byte-identical
        wds_b = os.path.join(base, "wds_b")
        write_webdataset(docs, wds_b, docs_per_shard=20)
        assert tarsig(wds_b) == sig_a

        print("EXEC_LOSS_OK killed=", killed["pid"], "first=", first)
        spark.stop()
    """)
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=900)
    assert "EXEC_LOSS_OK" in proc.stdout, (
        proc.stdout[-2000:], proc.stderr[-4000:])
