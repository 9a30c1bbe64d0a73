"""WebDataset tar shard sink contracts: lossless round-trip,
byte-deterministic shards, idempotent rename-on-commit replays, and
manifest integrity."""

from __future__ import annotations

import hashlib
import os
import tarfile

from conftest import SF_DIR

from toymapreduce_go_spark.sources.wds import (read_webdataset,
                                               write_webdataset)


def _shard_bytes(out_dir):
    out = {}
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("shard-") and name.endswith(".tar"):
            with open(os.path.join(out_dir, name), "rb") as f:
                out[name] = f.read()
    return out


def test_wds_roundtrip_and_manifest(spark, tmp_path):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "source", "lang", "text"))
    out = str(tmp_path / "wds")
    manifest = write_webdataset(docs, out, docs_per_shard=100)
    rows = manifest.collect()
    n_docs = docs.count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert len(rows) == max(1, -(-n_docs // 100))
    # manifest hashes match the files on disk
    shards = _shard_bytes(out)
    for r in rows:
        data = shards[f"shard-{r.shard:06d}.tar"]
        assert hashlib.sha256(data).hexdigest() == r.sha256
        assert len(data) == r.n_bytes
    # members are same-key ADJACENT pairs with keys in sorted order —
    # the property a streaming WebDataset loader actually needs
    first = next(iter(shards.values()))
    with tarfile.open(fileobj=__import__("io").BytesIO(first)) as tar:
        names = tar.getnames()
    keys = [n.rsplit(".", 1)[0] for n in names]
    assert keys[0::2] == keys[1::2]                   # pairs adjacent
    assert keys[0::2] == sorted(set(keys))            # keys ascend
    assert all(n.endswith((".txt", ".json")) for n in names)
    # lossless distributed read-back
    back = read_webdataset(spark, out)
    want = sorted(tuple(r) for r in docs.collect())
    got = sorted(tuple(r) for r in back.collect())
    assert got == want


def test_wds_shards_are_byte_deterministic_and_replay_idempotent(
        spark, tmp_path):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter("doc_id < 200")
            .select("doc_id", "source", "lang", "text"))
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_webdataset(docs, out1, docs_per_shard=50)
    write_webdataset(docs, out2, docs_per_shard=50)
    assert _shard_bytes(out1) == _shard_bytes(out2)
    # crash-retry: delete one committed shard, rerun — identical bytes
    before = _shard_bytes(out1)
    victim = sorted(before)[0]
    os.remove(os.path.join(out1, victim))
    write_webdataset(docs, out1, docs_per_shard=50)
    assert _shard_bytes(out1) == before
    # no torn temp files survive a completed run
    assert not [n for n in os.listdir(out1) if ".tmp-" in n]
