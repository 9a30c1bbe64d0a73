"""Sinks. The reference's only sink is a value-per-line text file per
reduce task (F9, worker.go:301-320; oracle format "key value",
mrsequential.go:84). Spark supersedes it; helpers here pin the useful
shapes:

- ``write_parquet``: the default engine sink — partitioned columnar
  output; at 100 TB always partition by a pruning-friendly column
  (date, source) and let each task write its own file (no coalesce).
- ``write_text_kv``: the reference-compatible "key value" text sink for
  compat-API jobs; ``single_file=True`` gives the sequential oracle's
  one-file layout via coalesce(1) — correct, but serializes the write,
  so it's for small compat outputs only (the reference has the same
  bottleneck: NReduce output files, play.sh concatenates them).
- ``write_csv`` / ``write_json``: interchange sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(df: DataFrame, path: str,
                  partition_by: list[str] | None = None,
                  mode: str = "overwrite") -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_orc(df: DataFrame, path: str,
              partition_by: list[str] | None = None,
              mode: str = "overwrite") -> None:
    """ORC interchange sink (Hive/Trino ecosystems): same partitioned
    columnar contract as ``write_parquet`` — predicate pushdown, column
    pruning, and per-task files all carry over."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_text_kv(df: DataFrame, path: str, key: str = "key",
                  value: str = "value", single_file: bool = False,
                  mode: str = "overwrite") -> None:
    """Reference-format text sink: one '"key value"' line per row, sorted
    by key when single_file (the mrsequential.go:62-84 layout)."""
    out = df.select(
        F.concat_ws(" ", F.col(key).cast("string"),
                    F.col(value).cast("string")).alias("value"))
    if single_file:
        out = out.orderBy(F.col("value")).coalesce(1)
    out.write.mode(mode).text(path)


# ---------------------------------------------------------------------------
# Manifest-commit protocol (r11 verdict item 7). The maintenance ops
# below (compaction, retraction, index rebuild) used to rely on the
# ATOMICITY of directory renames as their commit point — fine on
# POSIX, unavailable on S3-class object stores (rename = copy+delete,
# non-atomic, crash leaves half a tree). The commit point is now a
# MANIFEST: a single small file written in one PUT (the one operation
# object stores make atomic — the WebDataset sink's `_manifest`
# convention) that records exactly which directories the staged tmp
# tree replaces ("swap") and which disappear outright ("drop").
#
#   stage tmp tree  →  write manifest (THE commit)  →  apply moves
#   →  clear old/tmp residue  →  delete manifest
#
# Every post-manifest step is idempotent and direction-free: recovery
# rolls FORWARD from the manifest alone (a "swap" rel applies only
# while its tmp twin exists; a "drop" rel only removes a still-present
# live dir), so a crash at ANY point — including between individual
# per-file copies on an object store — completes on the next
# invocation. No manifest + tmp residue = a pre-commit crash: the tmp
# tree is garbage and the live data was never touched. A manifest that
# cannot be parsed refuses loudly (never guess a commit's contents).


def _manifest_file(base: str, op: str) -> str:
    return f"{base}__{op}.manifest"


def write_commit_manifest(base: str, op: str, swap: list[dict],
                          drop: list[dict]) -> None:
    """THE commit point: one small-file write (atomic PUT on object
    stores; write-then-``os.replace`` here) recording the rel-paths
    the staged tmp tree swaps in and the rel-paths that drop. BOTH
    entry kinds carry a content fingerprint of the live directory at
    commit time (recursive rel-path + size listing): recovery applies
    a swap / drop ONLY while the live dir is absent (mid-move crash)
    or still matches that fingerprint, so a stale manifest replayed
    after a LATER operation rewrote the same paths can neither delete
    the newer generation (drop) nor revert it to the stale staged
    tree (swap) — review r12. Swap entries: {"rel", "live"}; drop
    entries: {"rel", "files"}."""
    import json
    import os

    p = _manifest_file(base, op)
    staging = p + ".writing"
    with open(staging, "w") as f:
        json.dump({"op": op,
                   "swap": sorted(swap, key=lambda d: d["rel"]),
                   "drop": sorted(drop, key=lambda d: d["rel"])}, f)
    os.replace(staging, p)


def read_commit_manifest(base: str, op: str) -> dict | None:
    import json
    import os

    p = _manifest_file(base, op)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            m = json.load(f)
        if not (isinstance(m, dict) and isinstance(m.get("swap"), list)
                and isinstance(m.get("drop"), list)
                and all(isinstance(d, dict) and "rel" in d
                        and "live" in d for d in m["swap"])
                and all(isinstance(d, dict) and "rel" in d
                        and "files" in d for d in m["drop"])):
            raise ValueError("missing swap/drop lists")
        return m
    except (ValueError, OSError) as e:
        raise ValueError(
            f"{op}: unreadable commit manifest {p} ({e}) — refusing "
            "to guess an in-flight commit's contents; inspect or "
            "remove it manually") from None


def _dir_fingerprint(path: str) -> list[tuple[str, int]]:
    """Sorted (relative file path, size) pairs of a directory TREE —
    the staleness guard's identity for "the directory the commit
    intended" (recursive, so whole-tree swap roots with nested
    partition dirs get a real identity, not just their top-level
    _SUCCESS).

    CONTRACT (r12 verdict advisory 3): these are (name, size) pairs,
    NOT content hashes, so the guard's soundness rests on the
    WRITER's naming convention — Spark part-files embed a per-write
    UUID (``part-00000-<uuid>…``), so two generations of the same
    directory can never collide on names. A writer that reuses exact
    file names AND sizes across generations (hand-rolled fixed-name
    files) would fool the guard into treating a newer generation as
    the fingerprinted one; every sink in this repo writes through
    Spark, which cannot produce that collision
    (tests/test_skew_and_sinks.py pins the boundary both ways)."""
    import os

    out = []
    for dp, _dn, fns in os.walk(path):
        for f in fns:
            fp = os.path.join(dp, f)
            out.append((os.path.relpath(fp, path),
                        os.path.getsize(fp)))
    return sorted(out)


def _apply_manifest(local: str, tmp: str, old: str, op: str,
                    manifest: dict) -> None:
    """Roll a committed manifest forward to completion — idempotent,
    safe to re-enter at any point (crash recovery re-runs it)."""
    import os
    import shutil

    for d in manifest["swap"]:
        rel = d["rel"]
        tmp_dir = os.path.normpath(os.path.join(tmp, rel))
        live_dir = os.path.normpath(os.path.join(local, rel))
        if not os.path.isdir(tmp_dir):
            continue                      # this rel already applied
        if os.path.isdir(live_dir):
            if _dir_fingerprint(live_dir) != sorted(
                    tuple(x) for x in d["live"]):
                # live was rewritten by a LATER operation after this
                # commit — never revert it to the stale staged tree
                # (the stale tmp is discarded with the tree below)
                continue
            old_dir = os.path.normpath(os.path.join(old, rel))
            os.makedirs(os.path.dirname(old_dir), exist_ok=True)
            shutil.rmtree(old_dir, ignore_errors=True)
            os.rename(live_dir, old_dir)
        os.makedirs(os.path.dirname(live_dir), exist_ok=True)
        os.rename(tmp_dir, live_dir)
    for d in manifest["drop"]:
        rel = d["rel"]                   # a drop rel never has a tmp twin
        live_dir = os.path.normpath(os.path.join(local, rel))
        if not os.path.isdir(live_dir):
            continue                     # already dropped
        if _dir_fingerprint(live_dir) != sorted(
                tuple(x) for x in d["files"]):
            continue   # re-created by a LATER write — newer generation
        old_dir = os.path.normpath(os.path.join(old, rel))
        os.makedirs(os.path.dirname(old_dir), exist_ok=True)
        shutil.rmtree(old_dir, ignore_errors=True)
        os.rename(live_dir, old_dir)
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    os.remove(_manifest_file(local.rstrip("/"), op))


def swap_paths(path: str, op: str) -> tuple[str, str, str]:
    """(local, tmp, old) for a whole-tree rewrite-and-swap named
    ``op`` — the shared crash-safety protocol (``recover_swap`` /
    ``commit_swap``) used by compaction and the vector-index rebuild
    (one implementation, review r11)."""
    local = path[len("file://"):] if path.startswith("file://") else path
    base = local.rstrip("/")
    return local, f"{base}__{op}_tmp", f"{base}__{op}_old"


def recover_swap(local: str, tmp: str, old: str, op: str) -> None:
    """Heal a prior crashed attempt BEFORE touching anything. A live
    commit manifest rolls FORWARD (the staged tree is the committed
    truth; a stale manifest whose moves already finished just clears).
    Without a manifest: tmp is pre-commit garbage; a stranded ``old``
    tree with the live path missing is the LEGACY mid-rename state —
    still restored, so pre-manifest datasets heal too."""
    import os
    import shutil

    m = read_commit_manifest(local.rstrip("/"), op)
    if m is not None:
        _apply_manifest(local, tmp, old, op, m)
        return
    if not os.path.exists(local) and os.path.exists(old):
        os.rename(old, local)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)


def commit_swap(local: str, tmp: str, old: str, op: str) -> None:
    """Swap a fully-written ``tmp`` tree in for ``local``: write the
    commit manifest (THE atomic commit), then apply the old-aside /
    swap-in moves and clear residue. A crash anywhere after the
    manifest write is completed forward by ``recover_swap`` on the
    next invocation; a crash before it leaves the live tree
    untouched."""
    import os

    live_fp = (_dir_fingerprint(local) if os.path.isdir(local) else [])
    swap = [{"rel": ".", "live": live_fp}]
    write_commit_manifest(local.rstrip("/"), op, swap=swap, drop=[])
    _apply_manifest(local, tmp, old, op, {"swap": swap, "drop": []})


def compact_parquet(spark, path: str, target_mb: int = 128) -> tuple[int, int]:
    """Small-file compaction — the lake-maintenance operation every
    streaming/incremental writer eventually needs (each micro-batch
    commit leaves one file per task; thousands of KB-files make the
    NEXT reader's listing and scan planning the bottleneck). Rewrites
    ``path`` in place to ~``ceil(bytes / target_mb)`` files. Unpartitioned
    datasets get a round-robin repartition (pure size balancing);
    hive-partitioned datasets (``key=value`` dirs) keep their partition
    columns — rows are hash-repartitioned ON those columns so each
    partition value compacts to one file, and the layout (and the next
    reader's partition pruning) is preserved.

    Returns (files_before, files_after). Crash safety: the rewrite goes
    through a sibling ``__compact_tmp`` dir, then an
    old-aside/swap-in rename pair. A crash inside the (tiny) window
    between the two renames leaves the data at ``__compact_old``; the
    next invocation detects that (live path missing, old present),
    restores it, and proceeds — so the function is re-runnable after a
    crash at ANY point, and stale tmp/old residue never blocks it."""
    import math
    import os

    local, tmp, old = swap_paths(path, "compact")
    recover_swap(local, tmp, old, "compact")

    files = [os.path.join(dp, f)
             for dp, _dn, fn in os.walk(local)
             for f in fn if f.endswith(".parquet")]
    n_before = len(files)
    if n_before == 0:
        return 0, 0
    total = sum(os.path.getsize(f) for f in files)
    n_after = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    # Hive partition columns, from the first file's directory path
    # (outermost-first nesting order).
    part_cols = [seg.split("=", 1)[0]
                 for seg in os.path.relpath(files[0], local).split(os.sep)[:-1]
                 if "=" in seg]
    df = spark.read.parquet(path)
    w = (df.repartition(n_after, *part_cols) if part_cols
         else df.repartition(n_after)).write.mode("overwrite")
    if part_cols:
        w = w.partitionBy(*part_cols)
    w.parquet("file://" + tmp)
    commit_swap(local, tmp, old, "compact")
    return n_before, n_after

def retract_keys_from_parquet(spark, path: str, key_col: str,
                              keys) -> dict[str, int]:
    """Key-level retraction from a hive-partitioned parquet dataset —
    the maintenance primitive ``compact_parquet`` (file counts) and
    ``expire_index_batches`` (whole partitions) were missing: remove
    EXACTLY the rows whose ``key_col`` is in ``keys``, rewriting ONLY
    the partition directories that contain such rows. Everything else
    is untouched byte-for-byte — cost is proportional to the affected
    partitions, never the dataset (verdict r10 item 1: a refresh crawl
    must retract removed/changed pages from its persisted indexes
    without rebuilding them).

    ``keys`` is a Python list (metadata-sized deny-list style — rides
    as ONE plan-literal IN filter, pushed into the parquet scan) or a
    single-column DataFrame (the scale path for big deltas: affected-
    partition discovery is a broadcast LEFT SEMI join, the rewrite a
    broadcast LEFT ANTI — the dataset is never shuffled either way).

    Crash safety (the ``compact_parquet`` convention, per partition):
    kept rows land under a sibling ``__retract_tmp`` tree first; each
    affected partition directory is then moved aside to a mirror
    ``__retract_old`` tree before its rewritten twin swaps in. A crash
    at ANY point is healed on the next invocation: directories found
    only in the old tree are restored, stale tmp/old residue is
    cleared, and the retraction (idempotent by construction — already-
    retracted partitions simply match no keys) re-runs. Partitions
    whose every row is retracted are dropped; retracting the ENTIRE
    dataset is refused (an all-_SUCCESS dir breaks the next reader's
    schema inference — delete the dataset instead).

    Partition values are reconstructed as ``col=value`` directory
    names, so partition columns must carry URL-safe scalar values
    (ints here — both indexes partition on ingest_batch/cell).

    Returns {"partitions_rewritten": n, "rows_removed": m}."""
    import functools
    import os
    import shutil

    local = path[len("file://"):] if path.startswith("file://") else path
    tmp = local.rstrip("/") + "__retract_tmp"
    old = local.rstrip("/") + "__retract_old"

    # -- recovery from a prior crashed attempt, before touching
    # anything: a live commit manifest rolls FORWARD (the staged tmp
    # partitions are the committed truth); without one, tmp is
    # pre-commit garbage and a stranded old-mirror partition (live
    # twin missing) is the legacy mid-rename state — restore it
    m = read_commit_manifest(local.rstrip("/"), "retract")
    if m is not None:
        _apply_manifest(local, tmp, old, "retract", m)
    else:
        if os.path.isdir(old):
            stranded = [dp for dp, _dns, fns in os.walk(old) if fns]
            for dp in stranded:
                live_dir = os.path.join(local, os.path.relpath(dp, old))
                if not os.path.exists(live_dir):
                    os.makedirs(os.path.dirname(live_dir),
                                exist_ok=True)
                    os.rename(dp, live_dir)
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)

    if isinstance(keys, (list, tuple, set)):
        keys = sorted(keys)
        if not keys:
            return {"partitions_rewritten": 0, "rows_removed": 0}

        def matches(df):
            return df.filter(F.col(key_col).isin(list(keys)))

        def survivors(df):
            # NULL-keyed rows SURVIVE: ~isin is NULL for a NULL key and
            # a bare filter would silently drop the row from the
            # rewrite (and never count it in rows_removed) — the
            # DataFrame-keys anti-join keeps NULLs, and the two paths
            # must agree (review r11)
            return df.filter(F.coalesce(
                ~F.col(key_col).isin(list(keys)), F.lit(True)))
    else:
        kdf = keys.select(F.col(key_col)).distinct()

        def matches(df):
            return df.join(F.broadcast(kdf), key_col, "left_semi")

        def survivors(df):
            return df.join(F.broadcast(kdf), key_col, "left_anti")

    files = [os.path.join(dp, f) for dp, _dn, fn in os.walk(local)
             for f in fn if f.endswith(".parquet")]
    if not files:
        return {"partitions_rewritten": 0, "rows_removed": 0}
    part_cols = [seg.split("=", 1)[0]
                 for seg in
                 os.path.relpath(files[0], local).split(os.sep)[:-1]
                 if "=" in seg]
    if not part_cols:
        raise ValueError(
            f"retract_keys_from_parquet: {path} is unpartitioned — "
            "key retraction rewrites per partition; compact or "
            "partition the dataset first")

    df = spark.read.parquet(path)
    affected = [tuple(r) for r in
                matches(df).select(*part_cols).distinct().collect()]
    if not affected:
        return {"partitions_rewritten": 0, "rows_removed": 0}
    rels = [os.path.join(*(f"{c}={v}" for c, v in zip(part_cols, vals)))
            for vals in sorted(affected)]

    # refuse to empty the dataset (the expire_index_batches contract)
    live_parts = {os.path.relpath(os.path.dirname(f), local)
                  for f in files}
    unaffected = live_parts - set(rels)

    part_filter = functools.reduce(
        lambda a, b: a | b,
        [functools.reduce(lambda a, b: a & b,
                          [F.col(c) == v
                           for c, v in zip(part_cols, vals)])
         for vals in affected])
    touched = df.filter(part_filter)
    n_removed = matches(touched).count()
    kept = survivors(touched)
    kept.write.mode("overwrite").partitionBy(*part_cols).parquet(
        "file://" + tmp)
    kept_rels = {os.path.relpath(os.path.dirname(f2), tmp)
                 for dp, _dn, fn in os.walk(tmp)
                 for f in fn if f.endswith(".parquet")
                 for f2 in [os.path.join(dp, f)]}
    if not unaffected and not kept_rels:
        shutil.rmtree(tmp, ignore_errors=True)
        raise ValueError(
            f"retract_keys_from_parquet: retracting these keys would "
            f"empty {path} entirely — delete the dataset instead of "
            "retracting it empty")

    # -- commit: the manifest write is the atomic commit point; the
    # per-partition moves after it are idempotent and re-entrant
    # (crash anywhere → recovery rolls the manifest forward)
    swap_rels = [{"rel": rel,
                  "live": (_dir_fingerprint(os.path.join(local, rel))
                           if os.path.isdir(os.path.join(local, rel))
                           else [])}
                 for rel in rels
                 if os.path.isdir(os.path.join(tmp, rel))]
    drop_rels = [{"rel": rel,
                  "files": _dir_fingerprint(os.path.join(local, rel))}
                 for rel in rels
                 if not os.path.isdir(os.path.join(tmp, rel))
                 and os.path.isdir(os.path.join(local, rel))]
    write_commit_manifest(local.rstrip("/"), "retract",
                          swap=swap_rels, drop=drop_rels)
    _apply_manifest(local, tmp, old, "retract",
                    {"swap": swap_rels, "drop": drop_rels})
    return {"partitions_rewritten": len(rels), "rows_removed": n_removed}
