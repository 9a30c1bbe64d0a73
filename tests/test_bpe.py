"""BPE tokenizer induction (operators/bpe.py): train merges from the
distributed word-frequency pass, apply distributed; the training
contract is EXACT agreement with an independent pure-Python reference
trainer (deterministic tie-breaks), the application contract is
roundtrip consistency (joining BPE tokens reconstructs the words)."""

from __future__ import annotations

from conftest import SF_DIR
from toymapreduce_go_spark.operators.bpe import (END, bpe_stats,
                                                 bpe_tokenize, train_bpe)


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Independent reference trainer (textbook Sennrich et al. loop)."""
    vocab = {}
    for w, c in word_counts.items():
        vocab[tuple(list(w) + [END])] = vocab.get(
            tuple(list(w) + [END]), 0) + c
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = \
                    pairs.get((syms[i], syms[i + 1]), 0) + c
        if not pairs or max(pairs.values()) < 2:
            break
        top = max(pairs.values())
        a, b = min(p for p, c in pairs.items() if c == top)
        merges.append((a, b))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_train_bpe_matches_reference(spark):
    docs = spark.createDataFrame(
        [(1, "a", "low lower lowest low low"),
         (2, "a", "new newer newest new new new"),
         (3, "b", "low new lower newer")],
        "doc_id long, source string, text string")
    counts = {}
    for _, _, t in [(1, "a", "low lower lowest low low"),
                    (2, "a", "new newer newest new new new"),
                    (3, "b", "low new lower newer")]:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    want = _reference_bpe(counts, 20)
    got = train_bpe(docs, n_merges=20)
    assert got == want and len(got) >= 5
    # the classic outcome: frequent whole words coalesce to one token
    merged_syms = {"".join(p) for p in got}
    assert any(s.startswith("low") for s in merged_syms)
    assert any(s.startswith("new") for s in merged_syms)


def test_bpe_tokenize_roundtrips_and_compresses(spark):
    """Applying the merges distributed: concatenating a word's BPE
    tokens (minus the end marker) reconstructs the word, and frequent
    words use FEWER tokens than character count."""
    docs = spark.createDataFrame(
        [(i, "a", "banana bandana banana banana bandana") for i in range(5)]
        + [(9, "b", "banana")],
        "doc_id long, source string, text string")
    merges = train_bpe(docs, n_merges=15)
    out = {r["doc_id"]: r for r in
           bpe_tokenize(docs, merges).collect()}
    toks = out[9]["bpe_tokens"]
    assert "".join(toks).replace(END, "") == "banana"
    assert len(toks) < len("banana") + 1  # merges really applied
    stats = {r["source"]: r for r in bpe_stats(docs, 15).collect()}
    assert stats["a"]["total_bpe_tokens"] < stats["a"]["total_words"] * 7
    assert stats["a"]["tokens_per_word"] >= 1.0


def test_bpe_on_fixture_corpus(spark):
    """Smoke at fixture scale: training converges, the application pass
    covers every doc, and token counts are sane."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    stats = bpe_stats(docs, n_merges=30).collect()
    assert stats
    total_docs = sum(r["n_docs"] for r in stats)
    assert total_docs == docs.count()
    for r in stats:
        assert 1.0 <= r["tokens_per_word"] <= 8.0


def test_train_bpe_pruned_matches_reference_at_200_merges(spark):
    """r8 verdict item 2 done-gate: with min_count pruning ACTIVE and a
    deep merge budget (n_merges >= 200), the incremental trainer must
    agree merge-for-merge with the naive reference loop fed the same
    pruned counts — proving both the pruning filter and the incremental
    pair maintenance preserve the exact (count desc, pair asc) merge
    sequence."""
    import re

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    splitter = re.compile(r"[^a-zA-Z]+")
    counts: dict[str, int] = {}
    for r in docs.select("text").collect():
        for w in splitter.split(r["text"] or ""):
            if w:
                w = w.lower()
                counts[w] = counts.get(w, 0) + 1
    pruned = {w: c for w, c in counts.items() if c >= 100}
    assert 0 < len(pruned) < len(counts)  # the cut really drops words
    want = _reference_bpe(pruned, 200)
    got = train_bpe(docs, n_merges=200, min_count=100)
    assert got == want
    assert len(got) >= 100  # the budget is actually exercised


def test_train_bpe_max_vocab_caps_the_collect(spark):
    """max_vocab is the hard driver-state cap: the trainer must see only
    the top-N words by (count desc, word asc) and still produce the
    reference merge sequence for that truncated table."""
    import re

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    splitter = re.compile(r"[^a-zA-Z]+")
    counts: dict[str, int] = {}
    for r in docs.select("text").collect():
        for w in splitter.split(r["text"] or ""):
            if w:
                w = w.lower()
                counts[w] = counts.get(w, 0) + 1
    top = dict(sorted(counts.items(),
                      key=lambda kv: (-kv[1], kv[0]))[:50])
    want = _reference_bpe(top, 60)
    got = train_bpe(docs, n_merges=60, max_vocab=50)
    assert got == want and len(got) >= 10


def test_bpe_ids_round_trip_losslessly(spark):
    """r13 verdict item 7 pin 1: encode → ids → decode reproduces the
    tokenizer's normalized word sequence EXACTLY for every document
    (lowercased letter runs — the engine's tokenizer contract), and
    the id count equals the token count from the same pass."""
    import re

    from toymapreduce_go_spark.operators.bpe import (
        bpe_decode_ids, bpe_encode_ids, bpe_vocab, train_bpe)
    from toymapreduce_go_spark.sources.registry import load_table
    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(200)
    merges = train_bpe(docs, n_merges=40)
    vocab = bpe_vocab(merges)
    assert len(vocab) == 26 + 1 + len(merges)
    enc = bpe_encode_ids(docs, merges)
    dec = {r["doc_id"]: list(r["words"])
           for r in bpe_decode_ids(enc, merges).collect()}
    splitter = re.compile(r"[^a-zA-Z]+")
    base = {r["doc_id"]: [w.lower() for w in splitter.split(r["text"])
                          if w] if r["text"] is not None else []
            for r in docs.collect()}
    assert dec == base
    for r in enc.collect():
        assert r["n_tokens"] == len(r["token_ids"])


def test_token_packing_budgets_bind_on_real_counts(spark):
    """r13 verdict item 7 pin 2: packing the id sequences budgets on
    REAL trained-tokenizer counts — every multi-doc bin's fill is
    ≤ max_tokens as measured by the actual id lengths (only
    single-doc oversize bins exceed), and the real counts genuinely
    differ from the heuristic (the direction that makes the re-pack
    worth running)."""
    from pyspark.sql import functions as F

    from toymapreduce_go_spark.functions.text import bpe_ish_token_count
    from toymapreduce_go_spark.operators.bpe import (bpe_encode_ids,
                                                     train_bpe)
    from toymapreduce_go_spark.operators.packing import pack_by_counts
    from toymapreduce_go_spark.sources.registry import load_table
    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(300)
    merges = train_bpe(docs, n_merges=40)
    ids = bpe_encode_ids(docs, merges)
    max_tokens = 256
    bins = pack_by_counts(
        ids.select("doc_id", F.col("n_tokens").alias("n_tok")),
        max_tokens=max_tokens)
    rows = bins.collect()
    real = {r["doc_id"]: r["n_tokens"] for r in
            ids.select("doc_id", "n_tokens").collect()}
    fills: dict[int, list[int]] = {}
    for r in rows:
        assert r["n_tok"] == real[r["doc_id"]]     # real counts bind
        fills.setdefault(r["bin_id"], []).append(real[r["doc_id"]])
    assert fills
    for b, sizes in fills.items():
        if len(sizes) > 1:
            assert sum(sizes) <= max_tokens, (b, sizes)
        else:
            assert sizes[0] <= max_tokens or len(sizes) == 1
    heur = {r["doc_id"]: r["h"] for r in docs.select(
        "doc_id", bpe_ish_token_count(F.col("text")).alias("h"))
        .collect()}
    assert any(heur[d] != real[d] for d in real)


def test_tokenized_webdataset_round_trip_and_pipeline_flag(
        spark, tmp_path):
    """r13 verdict item 7 pin 3: the tokenized tar sink round-trips id
    sequences byte-exactly (manifest-driven, sha256-verified), keeps
    every bin inside ONE shard, and the pipeline flag wires the whole
    train → encode → re-pack → shard chain with a funnel stage."""
    from pyspark.sql import functions as F

    from toymapreduce_go_spark.operators.bpe import (bpe_encode_ids,
                                                     train_bpe)
    from toymapreduce_go_spark.operators.packing import pack_by_counts
    from toymapreduce_go_spark.pipeline import build_training_corpus
    from toymapreduce_go_spark.sources.registry import load_table
    from toymapreduce_go_spark.sources.wds import (
        read_tokenized_webdataset, write_tokenized_webdataset)
    from conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(200)
    merges = train_bpe(docs, n_merges=30)
    ids = bpe_encode_ids(docs, merges)
    tok = ids.join(
        pack_by_counts(ids.select("doc_id",
                                  F.col("n_tokens").alias("n_tok")))
        .select("doc_id", "bin_id"), "doc_id") \
        .select("doc_id", "bin_id", "token_ids")
    out = str(tmp_path / "tokshards")
    mf = write_tokenized_webdataset(tok, out, bins_per_shard=10)
    assert mf.count() >= 1
    back = read_tokenized_webdataset(spark, out)
    want = {(r["doc_id"], r["bin_id"], tuple(r["token_ids"]))
            for r in tok.collect()}
    got = {(r["doc_id"], r["bin_id"], tuple(r["token_ids"]))
           for r in back.collect()}
    assert got == want and got
    # a bin never straddles shards: recompute each bin's shard from
    # the member keys inside each tar
    import os
    import tarfile
    bin_shards: dict[int, set] = {}
    for name in os.listdir(out):
        if name.endswith(".tar"):
            with tarfile.open(os.path.join(out, name)) as tar:
                for m in tar.getmembers():
                    b = int(m.name.split(".")[0])
                    bin_shards.setdefault(b, set()).add(name)
    assert bin_shards and all(len(s) == 1 for s in bin_shards.values())
    # the pipeline flag
    pdir = str(tmp_path / "pipeshards")
    _, funnel = build_training_corpus(
        spark, SF_DIR, tokenized_shards_dir=pdir, tokenizer_merges=20)
    stages = {r["stage"]: r["n_docs"] for r in funnel.collect()}
    assert stages.get("4b_tokenized_shards", 0) > 0
    assert read_tokenized_webdataset(spark, pdir).count() \
        == stages["4b_tokenized_shards"]
