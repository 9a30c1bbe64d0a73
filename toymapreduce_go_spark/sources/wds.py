"""WebDataset-style tar shard sink: materialize a curated corpus as
POSIX tar shards — ``shard-000123.tar`` containing one ``{key}.txt``
member (and one ``{key}.json`` metadata member) per document — the
de-facto delivery format for large-scale training data loaders
(the public WebDataset convention: samples are adjacent same-prefix
members inside sequentially-read tar files, so a trainer streams
shards with NO random access).

Reference scope: the reference's only sink is the per-reduce-task
"mr-out-N" text file (``mr/worker.go``); tar shards are this repo's
training-facing extension of that sink row, built on the same
rename-on-commit discipline as ``sources/kvtext.py``.

Design for 100 TB:
- Shard assignment is a deterministic hash of doc_id (the
  ``training_shards`` convention) — no global sort, no sequential
  counter, so assignment is a scan-side projection and any subset of
  shards can be (re)built independently.
- Each shard is built by ONE task (``applyInPandas`` over the shard
  key): members sorted by key inside the shard, tar metadata pinned
  (mtime 0, uid/gid 0, USTAR format), so a shard's BYTES are a pure
  function of its document set — reruns reproduce shards
  byte-identically.
- Exactly-once: each task writes ``shard-NNNNNN.tar.tmp-<uuid>`` then
  atomically renames over the final name — a crashed-and-rerun write
  replaces its own shard with identical bytes and never tears a
  reader (the kvtext sink's commit protocol, per-shard).
- The returned manifest (shard, n_docs, n_bytes, sha256) is
  metadata-sized; readers verify shards against it.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST_SCHEMA = ("shard int, n_docs long, n_bytes long, sha256 string")


def _commit_shard_tar(out_dir: str, shard: int, n_docs: int,
                      members) -> dict:
    """The ONE shard-commit implementation shared by the text and the
    tokenized sinks (review r14: two copies of the exactly-once and
    byte-determinism logic would drift): build the tar in memory from
    ``members`` — an ordered iterable of (name, payload bytes) —
    with pinned USTAR metadata, write ``*.tmp-<uuid>``, atomically
    rename over the final shard name (idempotent on rerun: identical
    bytes replace identical bytes), and return the manifest row.

    Executors write directly: out_dir must be task-visible shared
    storage (trivially true on local[N]; NFS / a FUSE-mounted object
    store on a cluster — or route a registered scheme through
    sources/fs.py)."""
    os.makedirs(out_dir, exist_ok=True)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tar:
        for name, payload in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tar.addfile(info, io.BytesIO(payload))
    data = buf.getvalue()
    final = os.path.join(out_dir, f"shard-{shard:06d}.tar")
    tmp = f"{final}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, final)  # atomic commit, idempotent on rerun
    return {"shard": shard, "n_docs": n_docs, "n_bytes": len(data),
            "sha256": hashlib.sha256(data).hexdigest()}


def _commit_manifest_and_sweep(manifest, out_dir: str):
    """Persist the manifest parquet next to the shards, read the
    committed copy back, and sweep stale finals / orphaned tmps from
    a prior larger run (a glob reader would resurrect deleted
    documents from them) — shared by both sinks."""
    (manifest.coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(out_dir, "_manifest")))
    committed = manifest.sparkSession.read.parquet(
        os.path.join(out_dir, "_manifest")).orderBy("shard")
    written = {f"shard-{int(r['shard']):06d}.tar"
               for r in committed.select("shard").collect()}
    for name in os.listdir(out_dir):
        stale_final = (name.startswith("shard-") and name.endswith(".tar")
                       and name not in written)
        orphan_tmp = name.startswith("shard-") and ".tar.tmp-" in name
        if stale_final or orphan_tmp:
            os.remove(os.path.join(out_dir, name))
    return committed


def _read_verified_tars(spark, out_dir: str, parse_tar, schema: str):
    """Manifest-driven, sha256-verified shard reader core shared by
    both sinks: the file LIST comes from ``_manifest`` (never a glob),
    every shard's bytes verify against the manifest digest before
    parsing, and ``parse_tar(tar) -> list[dict]`` extracts the
    samples."""
    mf = spark.read.parquet(os.path.join(out_dir, "_manifest"))
    expected = {f"shard-{int(r['shard']):06d}.tar": r["sha256"]
                for r in mf.select("shard", "sha256").collect()}
    cols = [c.strip().split(" ")[0] for c in schema.split(",")]

    def parse(iterator):
        import pandas as pd

        for pdf in iterator:
            out = []
            for _, row in pdf.iterrows():
                name = os.path.basename(str(row["path"]))
                digest = hashlib.sha256(bytes(row["content"])).hexdigest()
                if digest != expected.get(name):
                    raise ValueError(
                        f"webdataset shard {name} does not match the "
                        f"manifest sha256 — stale, torn, or foreign "
                        f"shard file under {out_dir}")
                with tarfile.open(
                        fileobj=io.BytesIO(row["content"])) as tar:
                    out.extend(parse_tar(name, tar))
            yield pd.DataFrame(out, columns=cols)

    files = (spark.read.format("binaryFile")
             .load([os.path.join(out_dir, name)
                    for name in sorted(expected)])
             .select("path", "content"))
    return files.mapInPandas(parse, schema)


def _build_shard(out_dir: str):
    """Per-shard tar builder (runs once per shard key). Deterministic
    bytes: members sorted by key, USTAR format, zeroed metadata. Keys
    assume the curated-corpus contract of unique doc_ids."""

    def build(pdf):
        import pandas as pd

        shard = int(pdf["shard"].iloc[0])
        rows = sorted(
            (int(r.doc_id), ("" if r.text is None else str(r.text)),
             ("" if r.source is None else str(r.source)),
             ("" if r.lang is None else str(r.lang)))
            for r in pdf.itertuples(index=False))
        members = []
        for doc_id, text, source, lang in rows:
            key = f"{doc_id:012d}"
            members.append((f"{key}.txt", text.encode("utf-8")))
            members.append((f"{key}.json", json.dumps(
                {"doc_id": doc_id, "source": source, "lang": lang},
                sort_keys=True).encode("utf-8")))
        return pd.DataFrame([_commit_shard_tar(
            out_dir, shard, len(rows), members)])

    return build


def write_webdataset(documents: DataFrame, out_dir: str,
                     docs_per_shard: int = 1000) -> DataFrame:
    """Write ``documents`` (doc_id, source, lang, text) as WebDataset
    tar shards under ``out_dir``; returns the manifest frame (shard,
    n_docs, n_bytes, sha256), also persisted as ``{out_dir}/_manifest``
    parquet. Shard count = ceil(n/docs_per_shard) with hash
    assignment, so shards are docs_per_shard-sized in expectation (the
    loader convention cares about order WITHIN a shard, which is
    deterministic, not exact shard cardinality)."""
    os.makedirs(out_dir, exist_ok=True)
    n = documents.count()
    n_shards = max(1, -(-n // docs_per_shard))
    slim = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source", "lang", "text",
        F.pmod(F.xxhash64(F.col("doc_id").cast("long")),
               F.lit(n_shards)).cast("int").alias("shard"))
    manifest = (slim.groupBy("shard")
                .applyInPandas(_build_shard(out_dir), MANIFEST_SCHEMA)
                .orderBy("shard"))
    return _commit_manifest_and_sweep(manifest, out_dir)


def read_webdataset(spark, out_dir: str) -> DataFrame:
    """Read tar shards back into (doc_id, source, lang, text) —
    distributed: each task parses whole tar files from the binaryFile
    source (a shard is one file = one reader, the WebDataset streaming
    model).

    The shard LIST comes from the ``_manifest`` parquet, never a
    ``shard-*.tar`` glob — rewriting the same out_dir with a smaller
    corpus (fewer shards) leaves stale shard files on disk, and a glob
    would silently read them back, resurrecting deleted documents.
    Every shard's bytes are also verified against the manifest sha256
    before parsing, so a stale or torn shard fails LOUD."""
    def parse_tar(_name, tar):
        texts: dict[str, str] = {}
        metas: dict[str, dict] = {}
        for m in tar.getmembers():
            key, ext = m.name.rsplit(".", 1)
            payload = tar.extractfile(m).read()
            if ext == "txt":
                texts[key] = payload.decode("utf-8")
            elif ext == "json":
                metas[key] = json.loads(payload)
        return [{"doc_id": meta["doc_id"], "source": meta["source"],
                 "lang": meta["lang"], "text": texts.get(key, "")}
                for key, meta in metas.items()]

    return _read_verified_tars(
        spark, out_dir, parse_tar,
        "doc_id long, source string, lang string, text string")


# ---------------------------------------------------------------------------
# Tokenized training shards (r13 verdict item 7): the id-sequence form
# a pretraining loader actually consumes — packed TOKEN-ID sequences,
# budgeted on REAL trained-tokenizer counts (operators/bpe.py:
# bpe_encode_ids + packing.pack_by_counts), delivered through the same
# deterministic-tar / atomic-rename / manifest discipline as the text
# shards. One sample per document: `{bin:012d}.{doc:012d}.ids` (token
# ids as big-endian uint32 — the loader-portable fixed-width form) +
# a `.json` twin (doc_id, bin_id, n_tokens). Shards are assigned by
# BIN (not doc), so every packed sequence's members are adjacent in
# ONE sequentially-read shard — the property packing exists for.

def _build_token_shard(out_dir: str):
    import struct

    def build(pdf):
        import pandas as pd

        shard = int(pdf["shard"].iloc[0])
        rows = sorted((int(r.bin_id), int(r.doc_id),
                       [int(t) for t in r.token_ids])
                      for r in pdf.itertuples(index=False))
        members = []
        for bin_id, doc_id, ids in rows:
            key = f"{bin_id:012d}.{doc_id:012d}"
            members.append((f"{key}.ids",
                            struct.pack(f">{len(ids)}I", *ids)))
            members.append((f"{key}.json", json.dumps(
                {"doc_id": doc_id, "bin_id": bin_id,
                 "n_tokens": len(ids)},
                sort_keys=True).encode("utf-8")))
        return pd.DataFrame([_commit_shard_tar(
            out_dir, shard, len(rows), members)])

    return build


def write_tokenized_webdataset(tokenized: DataFrame, out_dir: str,
                               bins_per_shard: int = 200) -> DataFrame:
    """Write (doc_id, bin_id, token_ids array<int>) as tokenized tar
    shards; returns (and persists) the manifest. Sharding hashes the
    BIN id so a packed sequence never straddles shards; stale final
    shards and orphaned tmps from a prior larger run are swept exactly
    like the text sink."""
    os.makedirs(out_dir, exist_ok=True)
    n_bins = tokenized.select("bin_id").distinct().count()
    n_shards = max(1, -(-n_bins // bins_per_shard))
    slim = tokenized.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("bin_id").cast("long").alias("bin_id"),
        "token_ids",
        F.pmod(F.xxhash64(F.col("bin_id").cast("long")),
               F.lit(n_shards)).cast("int").alias("shard"))
    manifest = (slim.groupBy("shard")
                .applyInPandas(_build_token_shard(out_dir),
                               MANIFEST_SCHEMA)
                .orderBy("shard"))
    return _commit_manifest_and_sweep(manifest, out_dir)


def read_tokenized_webdataset(spark, out_dir: str) -> DataFrame:
    """Read tokenized shards back into (doc_id, bin_id, token_ids) —
    manifest-driven file list, sha256-verified bytes, the text
    reader's contract on the id form."""
    import struct

    def parse_tar(name, tar):
        ids: dict[str, list[int]] = {}
        metas: dict[str, dict] = {}
        for m in tar.getmembers():
            key, ext = m.name.rsplit(".", 1)
            payload = tar.extractfile(m).read()
            if ext == "ids":
                ids[key] = list(struct.unpack(
                    f">{len(payload) // 4}I", payload))
            elif ext == "json":
                metas[key] = json.loads(payload)
        out = []
        for key, meta in metas.items():
            got = ids.get(key, [])
            if len(got) != meta["n_tokens"]:
                raise ValueError(
                    f"tokenized webdataset member {key} in {name}: "
                    f"ids length {len(got)} != manifest n_tokens "
                    f"{meta['n_tokens']}")
            out.append({"doc_id": meta["doc_id"],
                        "bin_id": meta["bin_id"], "token_ids": got})
        return out

    return _read_verified_tars(
        spark, out_dir, parse_tar,
        "doc_id long, bin_id long, token_ids array<int>")
