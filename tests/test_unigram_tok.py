"""Unigram-LM tokenizer induction (operators/unigram_tok.py): the
training contract is EXACT agreement with an independent pure-Python
reference implementation of the frozen spec (module docstring steps
1-5); the application contract is roundtrip consistency plus
distributed == local equivalence."""

from __future__ import annotations

import math
import re

from conftest import SF_DIR
from toymapreduce_go_spark.operators.unigram_tok import (train_unigram,
                                                         unigram_tok_stats,
                                                         unigram_tokenize)


def _ref_viterbi(word, counts, total, max_len):
    """Reference segmenter — same spec, independently structured
    (forward table of (score, path) instead of backpointers)."""
    floor = math.log(0.5 / total)
    state = {0: (0.0, [])}
    for i in range(1, len(word) + 1):
        best = None
        for j in range(max(0, i - max_len), i):
            if j not in state:
                continue
            piece = word[j:i]
            if piece in counts:
                s = state[j][0] + math.log(counts[piece] / total)
            elif len(piece) == 1:
                s = state[j][0] + floor
            else:
                continue
            if best is None or s > best[0]:
                best = (s, state[j][1] + [piece])
        state[i] = best
    return state[len(word)][1]


def _ref_train(word_counts: dict[str, int], vocab_size=60,
               seed_max_len=6, seed_size=1000, prune_frac=0.2):
    """Independent reference trainer for the frozen spec."""
    seed: dict[str, int] = {}
    for w, c in word_counts.items():
        for j in range(len(w)):
            for k in range(j + 1, min(j + seed_max_len, len(w)) + 1):
                seed[w[j:k]] = seed.get(w[j:k], 0) + c
    model = {p: c for p, c in seed.items() if len(p) == 1}
    ranked = sorted((pc for pc in seed.items() if len(pc[0]) > 1),
                    key=lambda pc: (-pc[1], pc[0]))
    model.update(dict(ranked[:seed_size]))

    def em(counts):
        total = sum(counts.values())
        new = {}
        for w, c in word_counts.items():
            for p in _ref_viterbi(w, counts, total, seed_max_len):
                new[p] = new.get(p, 0) + c
        for p in counts:
            if len(p) == 1:
                new[p] = max(new.get(p, 0), 1)
        return {p: c for p, c in new.items() if c > 0}

    while True:
        model = em(model)
        excess = len(model) - vocab_size
        if excess <= 0:
            break
        multi = sorted((pc for pc in model.items() if len(pc[0]) > 1),
                       key=lambda pc: (pc[1], pc[0]))
        if not multi:
            break
        for p, _ in multi[:min(excess,
                               max(1, int(prune_frac * len(multi))))]:
            del model[p]
    return em(model)


CORPUS = [
    (1, "a", "internationalization international nation"),
    (2, "a", "nationalization nation nation national"),
    (3, "b", "internal international internals nation"),
    (4, "b", "organization organizational organ nation inter"),
]


def _word_counts():
    counts: dict[str, int] = {}
    for _, _, t in CORPUS:
        for w in re.split(r"[^a-zA-Z]+", t):
            if w:
                counts[w.lower()] = counts.get(w.lower(), 0) + 1
    return counts


def test_train_matches_reference(spark):
    docs = spark.createDataFrame(
        CORPUS, "doc_id long, source string, text string")
    want = _ref_train(_word_counts(), vocab_size=30)
    got = train_unigram(docs, vocab_size=30)
    assert got == want
    assert len(got) <= 30 + sum(1 for p in got if len(p) == 1)
    # the pruned inventory keeps a genuinely multi-char piece
    assert any(len(p) >= 4 for p in got)


def test_tokenize_roundtrips_and_is_distribution_invariant(spark):
    docs = spark.createDataFrame(
        CORPUS, "doc_id long, source string, text string")
    model = train_unigram(docs, vocab_size=30)
    total = sum(model.values())
    out = {r["doc_id"]: r["uni_tokens"]
           for r in unigram_tokenize(docs, model).collect()}
    for doc_id, _, text in CORPUS:
        words = [w.lower() for w in re.split(r"[^a-zA-Z]+", text) if w]
        # concatenating the pieces reconstructs the words in order
        assert "".join(out[doc_id]) == "".join(words)
        # every emitted piece is in the model (or a floor single char)
        for p in out[doc_id]:
            assert p in model or len(p) == 1
    # repartitioning must not change a per-row Python stage's output
    out2 = {r["doc_id"]: r["uni_tokens"]
            for r in unigram_tokenize(docs.repartition(7), model)
            .collect()}
    assert out == out2
    # and the distributed pass agrees with a local reference segmenter
    for doc_id, _, text in CORPUS:
        words = [w.lower() for w in re.split(r"[^a-zA-Z]+", text) if w]
        want = [p for w in words
                for p in _ref_viterbi(w, model, total, 6)]
        assert out[doc_id] == want


def test_stats_on_fixture_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = {r["source"]: r for r in unigram_tok_stats(docs).collect()}
    assert rows
    for r in rows.values():
        # a trained inventory compresses: strictly fewer pieces than
        # characters, at least one piece per word
        assert r["total_pieces"] >= r["total_words"]
        assert 1.0 <= r["pieces_per_word"] < 6.0
        assert 0 < r["vocab_size"] <= 60 + 26
