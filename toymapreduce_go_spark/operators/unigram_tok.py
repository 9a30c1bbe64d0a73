"""Unigram-LM tokenizer induction (the SentencePiece unigram model,
Kudo 2018 — public method; original implementation here) — the second
of the two tokenizer families real pipelines train (BPE builds up by
merging, unigram starts from an over-complete piece inventory and
PRUNES down under a piece-probability model).

This is the hard-EM (Viterbi) variant of Kudo's trainer: the E-step
segments each distinct word with Viterbi under the current piece
probabilities instead of accumulating full-lattice expectations, and
pruning drops the lowest-count pieces instead of ranking by exact
likelihood loss. Both simplifications are standard in public
re-implementations; the spec below is frozen so the pytest contract —
EXACT agreement with an independent reference trainer — is
well-defined.

Scalable shape — identical to ``bpe.py``'s and for the same reason:
the only corpus-sized work is ONE word-frequency shuffle
(``word_frequencies``, shared with BPE, same ``min_count``/
``max_vocab`` driver-state bounds); seeding, EM, and pruning all
operate on the word-count TABLE (vocab-sized). Applying the tokenizer
is a distributed Arrow stage with a per-word memo. The corpus is never
touched twice.

Frozen training spec (the reference trainer mirrors this exactly):

1. Seed = every substring of length 1..``seed_max_len`` of every word,
   scored by sum(word count × occurrences in word); keep the top
   ``seed_size`` multi-char pieces by (count desc, piece asc) plus ALL
   single characters.
2. Viterbi(word): DP over end positions, candidates scanned with start
   j ASCENDING, a candidate replaces the incumbent only when its score
   is STRICTLY greater (=> equal-score ties resolve to the smallest
   start = the longest final piece). Piece score = ln(count/total);
   pieces absent from the model score ln(0.5/total) and are emitted as
   single characters.
3. Hard-EM round: re-count pieces from the Viterbi segmentations
   (weighted by word counts); single characters keep a floor count of
   1 so coverage can never be pruned away.
4. Prune: while vocab > ``vocab_size``, after each EM round drop
   k = min(excess, max(1, floor(``prune_frac`` × multi-char pieces)))
   multi-char pieces in (count asc, piece asc) order.
5. One final EM re-count; the model is the integer count table (exact
   — no floats stored), probabilities are derived at segmentation
   time.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import apply_word_tokenizer, word_frequencies

SEED_MAX_LEN = 6


def _viterbi(word: str, counts: dict[str, int], total: int,
             max_len: int) -> list[str]:
    """Best segmentation under ln(count/total) piece scores; the frozen
    tie-break of the module docstring (spec step 2)."""
    if not word:
        return []
    floor = math.log(0.5 / total)
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            c = counts.get(piece)
            if c is None:
                if i - j > 1:
                    continue  # unknown multi-char: never a piece
                score = best[j] + floor
            else:
                score = best[j] + math.log(c / total)
            if score > best[i]:
                best[i] = score
                back[i] = (j, piece)
    out: list[str] = []
    i = n
    while i > 0:
        j, piece = back[i]
        out.append(piece)
        i = j
    out.reverse()
    return out


def _em_counts(freqs: list[tuple[str, int]], counts: dict[str, int],
               max_len: int) -> dict[str, int]:
    """One hard-EM re-count (spec step 3)."""
    total = sum(counts.values())
    new: dict[str, int] = {}
    for w, c in freqs:
        for piece in _viterbi(w, counts, total, max_len):
            new[piece] = new.get(piece, 0) + c
    for p in counts:
        if len(p) == 1:
            new[p] = max(new.get(p, 0), 1)
    return {p: c for p, c in new.items() if c > 0}


def train_unigram(documents: DataFrame, vocab_size: int = 60,
                  seed_max_len: int = SEED_MAX_LEN,
                  seed_size: int = 1000, prune_frac: float = 0.2,
                  min_count: int = 1,
                  max_vocab: int | None = None) -> dict[str, int]:
    """Train the unigram tokenizer; returns the integer piece-count
    model (spec step 5). ``min_count``/``max_vocab`` bound the driver
    collect exactly as in ``train_bpe`` (shared ``word_frequencies``
    pass)."""
    wf = word_frequencies(documents, min_count=min_count)
    if max_vocab is not None:
        wf = wf.orderBy(F.col("c").desc(), "w").limit(max_vocab)
    freqs = [(r["w"], int(r["c"])) for r in wf.collect()]
    if not freqs:
        return {}
    # spec step 1: substring seed
    seed: dict[str, int] = {}
    for w, c in freqs:
        n = len(w)
        for j in range(n):
            for i in range(j + 1, min(j + seed_max_len, n) + 1):
                p = w[j:i]
                seed[p] = seed.get(p, 0) + c
    chars = {p: c for p, c in seed.items() if len(p) == 1}
    multi = sorted(((p, c) for p, c in seed.items() if len(p) > 1),
                   key=lambda pc: (-pc[1], pc[0]))[:seed_size]
    counts = dict(chars)
    counts.update(dict(multi))
    # spec steps 3-4: EM + prune until the budget is met
    while True:
        counts = _em_counts(freqs, counts, seed_max_len)
        excess = len(counts) - vocab_size
        if excess <= 0:
            break
        multi_pieces = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (pc[1], pc[0]))
        if not multi_pieces:
            break
        k = min(excess, max(1, int(prune_frac * len(multi_pieces))))
        for p, _ in multi_pieces[:k]:
            del counts[p]
    # spec step 5: final re-count with the surviving inventory
    return _em_counts(freqs, counts, seed_max_len)


def unigram_tokenize(documents: DataFrame, model: dict[str, int],
                     seed_max_len: int = SEED_MAX_LEN) -> DataFrame:
    """Apply a trained model distributed: ``(doc_id, source,
    uni_tokens array<string>, n_uni_tokens, n_words)`` via the shared
    ``bpe.apply_word_tokenizer`` scaffold (the tokenizer families
    differ only in the per-word function)."""
    counts = dict(model)
    total = sum(counts.values()) or 1

    def factory():
        def word_pieces(w: str) -> list[str]:
            return _viterbi(w, counts, total, seed_max_len)
        return word_pieces

    return apply_word_tokenizer(documents, factory,
                                "uni_tokens", "n_uni_tokens")


def unigram_tok_stats(documents: DataFrame, vocab_size: int = 60,
                      min_count: int = 1,
                      max_vocab: int | None = None) -> DataFrame:
    """Train-and-report (the ``bpe_stats`` twin): per source, word vs
    unigram-piece counts and the pieces-per-word compression — plus the
    trained inventory size, the number the vocab-budget decision
    reads."""
    model = train_unigram(documents, vocab_size=vocab_size,
                          min_count=min_count, max_vocab=max_vocab)
    # n_words rides out of the same Arrow pass (apply_word_tokenizer)
    toked = unigram_tokenize(documents, model)
    return (toked
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_words").alias("total_words"),
                 F.sum("n_uni_tokens").alias("total_pieces"),
                 F.round(F.sum("n_uni_tokens")
                         / F.sum("n_words").cast("double"), 4)
                  .alias("pieces_per_word"),
                 F.lit(len(model)).alias("vocab_size"))
            .orderBy("source"))
