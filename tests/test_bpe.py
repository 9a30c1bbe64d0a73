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
