"""Compat twins of the remaining reference example apps + the CLI.

Test strategy mirrors the reference's own (play.sh:62-129): run the
distributed job, compare against a sequential golden run of the same
map/reduce pair — plus the crash test's retry-under-failure PASS
condition (play.sh:268-315) and the jobcount exactly-once condition
(play.sh:189-208)."""

from __future__ import annotations

import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

sys.path.insert(0, "/root/repo")

from toymapreduce_go_spark.mr import apps  # noqa: E402
from toymapreduce_go_spark.mr.api import run_map_reduce  # noqa: E402


def sequential_golden(map_f, reduce_f, files: dict[str, str]) -> set[tuple[str, str]]:
    """mrsequential.go:40-84 — in-memory map, sort, group, reduce."""
    kvs = []
    for name, content in sorted(files.items()):
        kvs.extend(map_f(name, content))
    groups: dict[str, list[str]] = {}
    for k, v in sorted(kvs):
        groups.setdefault(k, []).append(v)
    out = set()
    for k, vals in groups.items():
        for v in reduce_f(k, iter(vals)):
            out.add((k, v))
    return out


CORPUS = {
    "f0.txt": "the quick brown fox",
    "f1.txt": "jumps over the lazy dog",
    "f2.txt": "the dog barks",
    "f3.txt": "brown dog quick fox",
    "f4.txt": "",
}


def _inputs(spark, files=CORPUS, n_parts: int = 4):
    return spark.createDataFrame(
        sorted(files.items()), "filename string, content string"
    ).repartition(n_parts)


@pytest.mark.parametrize("app", ["nocrash", "jobcount", "early_exit",
                                 "wc", "indexer"])
def test_app_matches_sequential_golden(spark, app):
    map_f, reduce_f = apps.APPS[app]
    got = {(r.key, r.value)
           for r in run_map_reduce(spark, map_f, reduce_f,
                                   _inputs(spark), n_reduce=3).collect()}
    assert got == sequential_golden(map_f, reduce_f, CORPUS)


def test_jobcount_output_is_input_count(spark):
    """play.sh:189-208: absent failures, maps run exactly once per input
    — the reduce's count equals the number of input files."""
    rows = run_map_reduce(spark, apps.jobcount_map, apps.jobcount_reduce,
                          _inputs(spark), n_reduce=2).collect()
    assert {(r.key, r.value) for r in rows} == {("a", str(len(CORPUS)))}


def test_exactly_once_absent_failures(spark):
    """F13: invocation count (accumulator census, the cluster-safe analog
    of jobcount.go's side files) == input count when nothing fails and
    speculation is off (the session default)."""
    assert spark.conf.get("spark.speculation", "false") == "false"
    acc = spark.sparkContext.accumulator(0)
    counted = apps.make_counting_map(apps.jobcount_map, acc)
    run_map_reduce(spark, counted, apps.jobcount_reduce,
                   _inputs(spark), n_reduce=2).collect()
    assert acc.value == len(CORPUS)


def _assert_overlap(intervals: list[tuple[float, float]], need: int = 2):
    """play.sh's parallelism PASS: at least `need` recorded [start, end]
    windows were simultaneously open. Sweep line; on a tie the -1 (end)
    event sorts first, so touching intervals don't count as overlap."""
    events = sorted([(a, +1) for a, _ in intervals]
                    + [(b, -1) for _, b in intervals])
    live = peak = 0
    for _, d in events:
        live += d
        peak = max(peak, live)
    assert peak >= need, f"peak parallelism {peak} < {need}: {intervals}"


def test_map_parallelism_probe(spark):
    """mtiming analog (play.sh:131-160): map tasks overlap in time."""
    files = {f"m{i}.txt": "x" for i in range(8)}
    rows = run_map_reduce(spark, apps.make_mtiming_map(0.5),
                          apps.mtiming_reduce,
                          _inputs(spark, files, n_parts=8),
                          n_reduce=2).collect()
    ivs = [tuple(map(float, r.value.split())) for r in rows
           if r.key.startswith("times-")]
    assert len(ivs) == 8
    _assert_overlap(ivs)


def test_reduce_parallelism_probe(spark):
    """rtiming analog (play.sh:162-187): reduce groups in different
    partitions overlap in time."""
    rows = run_map_reduce(spark, apps.rtiming_map,
                          apps.make_rtiming_reduce(0.5),
                          _inputs(spark, {"r0.txt": "x", "r1.txt": "x"},
                                  n_parts=2),
                          n_reduce=5).collect()
    assert {r.key for r in rows} == set("abcdefghij")
    _assert_overlap([tuple(map(float, r.value.split())) for r in rows])


def _write_corpus(tmp_path: Path) -> str:
    d = tmp_path / "corpus"
    d.mkdir()
    for name, content in CORPUS.items():
        (d / name).write_text(content)
    return str(d)


def test_cli_crash_app_survives_and_matches_golden(tmp_path):
    """CLI end-to-end + the crash test (play.sh:268-315): the crashing
    app's output equals the no-crash golden, because the default
    --max-failures 4 master retries each injected first-attempt failure
    (F12). Filenames arrive as wholeTextFiles URIs, so the golden uses
    the same keys the distributed run saw."""
    corpus = _write_corpus(tmp_path)
    out = tmp_path / "out"
    proc = subprocess.run(
        [sys.executable, "-m", "toymapreduce_go_spark", "--app", "crash",
         "--input", corpus, "--nreduce", "3", "--out", str(out),
         "--single-file"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-3000:]
    got = set((out).glob("part-*"))
    assert len(got) == 1  # --single-file
    lines = got.pop().read_text().splitlines()
    assert lines == sorted(lines)
    uri_corpus = {f"file:{corpus}/{n}": c for n, c in CORPUS.items()}
    golden = sequential_golden(apps.nocrash_map, apps.nocrash_reduce,
                               uri_corpus)
    assert {tuple(ln.split(" ", 1)) for ln in lines} == golden


def test_cli_plugin_wordcount(tmp_path):
    """--plugin loads a user Python file by the reference worker's
    Map/Reduce symbol contract (F15; worker -mrpath analog) and the
    output matches the sequential golden."""
    corpus = _write_corpus(tmp_path)
    plugin = tmp_path / "wc_plugin.py"
    plugin.write_text(textwrap.dedent("""
        import re
        from collections import namedtuple
        KV = namedtuple("KV", "key value")

        def Map(filename, contents):
            return [KV(w, "1") for w in re.findall(r"[A-Za-z]+", contents)]

        def Reduce(key, values):
            return str(len(values))
    """))
    out = tmp_path / "out"
    proc = subprocess.run(
        [sys.executable, "-m", "toymapreduce_go_spark",
         "--plugin", str(plugin), "--input", corpus,
         "--nreduce", "2", "--out", str(out)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-3000:]
    parts = sorted(out.glob("part-*"))
    assert len(parts) == 2  # one file per reduce partition (F9)
    got = {tuple(ln.split(" ", 1))
           for pf in parts for ln in pf.read_text().splitlines()}
    golden = sequential_golden(apps.wc_map, apps.wc_reduce, CORPUS)
    assert got == golden


def test_mr_job_chaining_via_kvtext(spark, tmp_path):
    """The reference chains jobs by pointing the next coord at the
    previous run's mr-out files; here job 1's kvtext output feeds job 2
    as its (filename, content) inputs — the interop path a reference
    user's multi-stage pipelines rely on."""
    from toymapreduce_go_spark.sources.kvtext import register

    register(spark)
    out1 = str(tmp_path / "stage1")
    stage1 = run_map_reduce(spark, *[apps.APPS["wc"][0], apps.APPS["wc"][1]],
                            _inputs(spark), n_reduce=2)
    stage1.write.format("kvtext").mode("append").save(out1)

    # job 2: re-count over stage-1 records — each (word, count) row
    # becomes one input; the identity-ish map keys on the count value,
    # giving "how many words occurred N times" (a classic second stage)
    def freq_map(word, count):
        return [apps.KeyValue(count, "1")]

    def freq_reduce(key, values):
        yield str(sum(1 for _ in values))

    stage2_in = spark.read.format("kvtext").load(out1)
    got = {(r.key, r.value)
           for r in run_map_reduce(spark, freq_map, freq_reduce,
                                   stage2_in, n_reduce=2).collect()}

    golden1 = sequential_golden(apps.APPS["wc"][0], apps.APPS["wc"][1],
                                CORPUS)
    want = sequential_golden(freq_map, freq_reduce,
                             {k: v for k, v in golden1})
    assert got == want and got
