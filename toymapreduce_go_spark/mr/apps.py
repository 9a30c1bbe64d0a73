"""Compat twins of the reference's remaining example apps
(`/root/reference/example/mrapps/*`), as map/reduce UDF pairs runnable
through ``run_map_reduce`` — completing the plugin surface started with
wc/indexer in ``api.py``.

Semantics vs mechanism, per app:

- crash/nocrash (crash.go:37-58, nocrash.go:29-49): identical pure
  output (that's the reference crash test's PASS condition — play.sh
  compares the crashing run against the golden run). The reference
  crashes with ``os.Exit(1)`` 33% of the time; the Spark twin injects a
  deterministic first-attempt task failure via ``TaskContext`` instead,
  because a random in-process ``os._exit`` in local mode would kill the
  whole JVM's python worker pool rather than one worker process. Retry
  (F12) is exercised identically; determinism makes the test reliable.
- jobcount (jobcount.go:25-49): the reference counts map invocations by
  side files on local disk and asserts inputs map exactly once absent
  failures. Shared-local-disk side files don't exist on a cluster; the
  Spark-native probe is a ``LongAccumulator`` bumped per invocation
  (``make_counting_map``) — same observable, works on 1000 executors.
- early_exit (early_exit.go:21-40): per-file "1" count; the reference's
  3-second sleeps exist to tempt a worker into exiting before commit —
  Spark's stage barrier (F8) makes that structurally impossible, so the
  twin keeps the semantics and drops the sleeps.
- mtiming/rtiming (mtiming.go:22-65, rtiming.go:65-87): parallelism
  probes. The reference detects concurrent workers by liveness-checking
  PIDs behind marker files; the portable observable is the task's own
  [start, end] wall-clock interval — overlapping intervals == parallel
  execution (asserted in tests/test_mr_apps.py, honoring
  play.sh:131-208's map/reduce parallelism PASS conditions).
"""

from __future__ import annotations

import time
from collections.abc import Iterable, Iterator

from .api import KeyValue, MapFunc

# ---------------------------------------------------------------------------
# crash / nocrash


def _maybe_crash() -> None:
    """Deterministic stand-in for crash.go:23-35's 33% os.Exit(1): fail
    every task's first attempt (needs a retry-capable master, e.g.
    ``local[N, 4]`` — the reference likewise only passes its crash test
    because the coordinator reschedules, coordinator.go:176-199)."""
    from pyspark import TaskContext

    ctx = TaskContext.get()
    if ctx is not None and ctx.attemptNumber() == 0:
        raise RuntimeError("injected crash (first attempt)")


def nocrash_map(filename: str, content: str) -> list[KeyValue]:
    """nocrash.go:29-38 — four fixed keys probing filename/content
    plumbing."""
    return [KeyValue("a", filename),
            KeyValue("b", str(len(filename))),
            KeyValue("c", str(len(content))),
            KeyValue("d", "xyzzy")]


def nocrash_reduce(key: str, values: Iterator[str]) -> Iterable[str]:
    """nocrash.go:41-49 — sorted value concat (deterministic output)."""
    yield " ".join(sorted(values))


def crash_map(filename: str, content: str) -> list[KeyValue]:
    """crash.go:37-46 — nocrash output + injected failure."""
    _maybe_crash()
    return nocrash_map(filename, content)


def crash_reduce(key: str, values: Iterator[str]) -> Iterable[str]:
    """crash.go:48-58 — nocrash reduce + injected failure. The crash
    point fires BEFORE any value is drained, matching the reference
    (which crashes before touching values): a retried reduce re-reads
    its whole group from shuffle data, so no partial consumption can
    leak into the retry's output."""
    _maybe_crash()
    yield from nocrash_reduce(key, values)


# ---------------------------------------------------------------------------
# jobcount


def jobcount_map(filename: str, content: str) -> list[KeyValue]:
    """jobcount.go:25-35 minus the side-file write and the 2-5s sleep:
    one ("a","x") per map invocation."""
    return [KeyValue("a", "x")]


def jobcount_reduce(key: str, values: Iterator[str]) -> Iterable[str]:
    """jobcount.go:37-49 — emit the invocation count. The reference
    counts side files (which double-counts re-executed maps); Spark's
    shuffle commits each map task's output exactly once, so counting the
    values IS the invocation count absent failures — play.sh:189-208's
    ``NT == #inputs`` PASS condition."""
    yield str(sum(1 for _ in values))


def make_counting_map(inner: MapFunc, acc) -> MapFunc:
    """Wrap ``inner`` to bump accumulator ``acc`` once per invocation —
    the cluster-safe analog of jobcount.go's side-file census, used by
    the F13 exactly-once probe (invocations == input count when no task
    fails and speculation is off)."""
    def counting(filename: str, content: str) -> Iterable[KeyValue]:
        acc.add(1)
        return inner(filename, content)
    return counting


# ---------------------------------------------------------------------------
# early_exit


def early_exit_map(filename: str, content: str) -> list[KeyValue]:
    """early_exit.go:21-25 — one (filename, "1") per file."""
    return [KeyValue(filename, "1")]


def early_exit_reduce(key: str, values: Iterator[str]) -> Iterable[str]:
    """early_exit.go:31-40 — per-file occurrence count, sleeps dropped."""
    yield str(sum(1 for _ in values))


# ---------------------------------------------------------------------------
# mtiming / rtiming


def _interval(sleep_sec: float) -> str:
    t0 = time.time()
    time.sleep(sleep_sec)
    return f"{t0:.3f} {time.time():.3f}"


def make_mtiming_map(sleep_sec: float = 0.5) -> MapFunc:
    """mtiming.go:65-81 — each map invocation records when it ran; the
    sleep widens the window so genuinely-parallel tasks must overlap."""
    def mmap(filename: str, content: str) -> list[KeyValue]:
        return [KeyValue(f"times-{filename}", _interval(sleep_sec))]
    return mmap


def mtiming_reduce(key: str, values: Iterator[str]) -> Iterable[str]:
    """mtiming.go:83-92 — sorted concat, deterministic."""
    yield " ".join(sorted(values))


def make_rtiming_reduce(sleep_sec: float = 0.5):
    """rtiming.go:65-87 — the *reduce* side records its interval."""
    def rreduce(key: str, values: Iterator[str]) -> Iterable[str]:
        for _ in values:  # drain the group first (contract: values
            pass          # are consumed before output)
        yield _interval(sleep_sec)
    return rreduce


def rtiming_map(filename: str, content: str) -> list[KeyValue]:
    """rtiming.go:68-80 — ten fixed keys to spread across reducers."""
    return [KeyValue(k, "1") for k in "abcdefghij"]


# ---------------------------------------------------------------------------
# Named-app registry (the reference selects apps by plugin path,
# play.sh:62-99; the CLI selects by name).

from .api import indexer_map, indexer_reduce, wc_map, wc_reduce  # noqa: E402

APPS: dict[str, tuple] = {
    "wc": (wc_map, wc_reduce),
    "indexer": (indexer_map, indexer_reduce),
    "crash": (crash_map, crash_reduce),
    "nocrash": (nocrash_map, nocrash_reduce),
    "jobcount": (jobcount_map, jobcount_reduce),
    "early_exit": (early_exit_map, early_exit_reduce),
    "mtiming": (make_mtiming_map(), mtiming_reduce),
    "rtiming": (rtiming_map, make_rtiming_reduce()),
}
