"""BPE tokenizer induction — training the tokenizer itself from the
corpus, the step upstream of every token count in this engine.

The scalable shape (it is also how the standard public BPE trainers
work, from the original Sennrich et al. 2016 implementation to the
word-count-fed trainers in common tokenizer libraries): the CORPUS
pass is just a word-frequency count — one shuffle, the same agg as
``wordcount`` — and every merge iteration after that operates on the
word-frequency TABLE, which is vocab-sized (Heaps' law), not
corpus-sized. So training is: one distributed pass, then a model-sized
driver loop (the same budget class as the IVF Lloyd's training); the
corpus is never touched again.

Applying the tokenizer back to the corpus IS distributed: an
Arrow-batched pandas UDF with a per-word memo (text re-uses words
heavily, so each distinct word pays the merge walk once per batch) —
the sanctioned Python-stage fallback for genuinely-custom per-row
logic the built-ins can't express (SURVEY.md §6).

Determinism: merge selection breaks frequency ties on the
lexicographically smallest pair, so the same corpus always yields the
same merge table; the pytest contract is exact agreement with an
independent pure-Python reference trainer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

END = "</w>"


def word_frequencies(documents: DataFrame,
                     min_count: int = 1) -> DataFrame:
    """(word, c) lowercased corpus word counts — the ONE distributed
    pass BPE training needs. ``min_count`` prunes the long tail BEFORE
    anything leaves the cluster: on web text the raw "vocabulary" is
    not Heaps'-law-polite (typos, concatenations, DNA-like strings make
    it hundreds of millions of rows at 100 TB), but it is extremely
    Zipf — singletons alone are the majority of DISTINCT words while
    carrying negligible total mass, so even ``min_count=2`` collapses
    the table by an order of magnitude with no effect on which pairs
    can win a merge vote beyond the dropped mass itself."""
    toks = F.filter(
        F.transform(tokens("text"), lambda t: F.lower(t)),
        lambda t: F.length(t) > 0)
    wf = (documents.select(F.explode(toks).alias("w"))
          .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    if min_count > 1:
        wf = wf.filter(F.col("c") >= min_count)
    return wf


def _merge_word(syms: tuple, a: str, b: str, merged: str) -> tuple:
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(documents: DataFrame, n_merges: int = 50,
              min_count: int = 1,
              max_vocab: int | None = None) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges. Returns the ordered merge list
    [(left, right), ...]; applying them in order IS the tokenizer.

    Driver-state bound (r8 verdict item 2): the collected table is the
    word-frequency table AFTER ``min_count`` pruning (cluster-side
    filter) and/or a deterministic ``max_vocab`` top-N cut (by count
    desc, then word — a distributed TakeOrdered, never a full sort), so
    the driver materialization is capped by construction instead of
    trusting web vocabularies to be polite. ``min_count=1`` with
    ``max_vocab=None`` is the exact unpruned model.

    The merge loop maintains pair counts INCREMENTALLY (the standard
    public-trainer structure, Sennrich et al. 2016): a pair→words index
    finds the words containing the winning pair, and only THOSE words
    re-count their adjacent pairs — each merge costs O(affected words),
    not O(vocab), which is what makes a real 32k-merge vocabulary
    feasible. Selection stays a full scan of the live pair table
    (vocab-sized), preserving the exact (count desc, pair asc)
    tie-break of the naive loop; each round merges the most frequent
    pair and stops early when no pair occurs twice."""
    wf = word_frequencies(documents, min_count=min_count)
    if max_vocab is not None:
        wf = wf.orderBy(F.col("c").desc(), "w").limit(max_vocab)
    freqs = [(r["w"], int(r["c"])) for r in wf.collect()]
    # words: mutable [symbols, count] rows, one per distinct symbol seq
    seen: dict[tuple, int] = {}
    words: list[list] = []
    for w, c in freqs:
        syms = tuple(list(w) + [END])
        at = seen.get(syms)
        if at is None:
            seen[syms] = len(words)
            words.append([syms, c])
        else:
            words[at][1] += c
    del seen
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for at, (syms, c) in enumerate(words):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_words.setdefault(p, set()).add(at)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        top = max(pair_counts.values())
        if top < 2:
            break
        a, b = min(p for p, c in pair_counts.items() if c == top)
        merges.append((a, b))
        merged = a + b
        # only words that (ever) contained the winner change; stale
        # index entries no-op via the new == syms check
        for at in sorted(pair_words.pop((a, b), ())):
            syms, c = words[at]
            new = _merge_word(syms, a, b, merged)
            if new == syms:
                continue
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                left = pair_counts.get(p, 0) - c
                if left > 0:
                    pair_counts[p] = left
                else:
                    pair_counts.pop(p, None)
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_words.setdefault(p, set()).add(at)
            words[at][0] = new
    return merges


def apply_word_tokenizer(documents: DataFrame, word_fn_factory,
                         tokens_name: str,
                         count_name: str) -> DataFrame:
    """Shared distributed word-level tokenizer apply (BPE and the
    unigram-LM tokenizer differ ONLY in the per-word function): split
    each text on the engine's letter-run contract, lowercase, map every
    word through ``word_fn_factory()`` with a per-batch memo
    (Arrow-batched; the model rides the factory closure, model-sized).
    Emits ``(doc_id, source, <tokens_name> array<string>, <count_name>
    long, n_words long)`` — the word count comes from the SAME pass, so
    stats consumers never re-scan the corpus for it."""
    import pandas as pd  # noqa: F401 (typed signature below)

    def run(batches):
        word_fn = word_fn_factory()
        memo: dict[str, list[str]] = {}

        def pieces(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                got = word_fn(w)
                memo[w] = got
            return got

        import re
        splitter = re.compile(r"[^a-zA-Z]+")
        for pdf in batches:
            toks_col, nw_col = [], []
            for text in pdf["text"]:
                if text is None:
                    toks_col.append([])
                    nw_col.append(0)
                    continue
                out: list[str] = []
                nw = 0
                for w in splitter.split(text):
                    if w:
                        nw += 1
                        out.extend(pieces(w.lower()))
                toks_col.append(out)
                nw_col.append(nw)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                tokens_name: toks_col,
                count_name: [len(t) for t in toks_col],
                "n_words": nw_col,
            })

    return (documents.select("doc_id", "source", "text")
            .mapInPandas(run, schema=f"doc_id long, source string, "
                                     f"{tokens_name} array<string>, "
                                     f"{count_name} long, n_words long"))


def bpe_tokenize(documents: DataFrame,
                 merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a trained merge list to the corpus — the distributed
    scoring pass: ``(doc_id, source, bpe_tokens array<string>,
    n_bpe_tokens, n_words)`` via the shared word-level apply."""
    merge_list = list(merges)

    def factory():
        def word_to_tokens(w: str) -> list[str]:
            syms = tuple(list(w) + [END])
            for a, b in merge_list:
                if len(syms) < 2:
                    break
                syms = _merge_word(syms, a, b, a + b)
            return list(syms)
        return word_to_tokens

    return apply_word_tokenizer(documents, factory,
                                "bpe_tokens", "n_bpe_tokens")


def bpe_vocab(merges: list[tuple[str, str]]) -> dict[str, int]:
    """The deterministic id table a trained merge list induces: ids
    0..25 are the letter alphabet (the engine's tokenizer contract
    lowercases letter runs, so the base alphabet is closed), 26 the
    end-of-word marker, then one id per merge in training order — the
    standard BPE vocab layout, reproducible from the merge list alone
    (a checkpointed merges file IS the tokenizer)."""
    syms = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [END]
    syms += [a + b for a, b in merges]
    return {s: i for i, s in enumerate(syms)}


def bpe_encode_ids(documents: DataFrame,
                   merges: list[tuple[str, str]]) -> DataFrame:
    """Corpus-wide apply of a TRAINED tokenizer to integer token ids
    (r13 verdict item 7 — downstream packing/sharding must budget on
    real token counts, not the ``bpe_ish_token_count`` heuristic):
    the Arrow-batched merge walk produces the token strings, then the
    string→id map rides a JVM-side ``create_map`` literal (the vocab
    is model-sized), with an unknown-symbol guard that RAISES — an id
    table that silently dropped or nulled a token would corrupt every
    downstream sequence. Emits (doc_id, source, token_ids array<int>,
    n_tokens, n_words)."""
    vocab = bpe_vocab(merges)
    vmap = F.create_map(*[F.lit(x) for s, i in vocab.items()
                          for x in (s, i)])
    toked = bpe_tokenize(documents, merges)
    ids = F.transform(
        "bpe_tokens",
        lambda t: F.when(
            vmap[t].isNull(),
            F.raise_error(F.concat(
                F.lit("bpe_encode_ids: token outside the trained "
                      "vocab: "), t)).cast("int"))
        .otherwise(vmap[t].cast("int")))
    return toked.select(
        "doc_id", "source", ids.alias("token_ids"),
        F.col("n_bpe_tokens").alias("n_tokens"), "n_words")


def bpe_decode_ids(frame: DataFrame,
                   merges: list[tuple[str, str]],
                   ids_col: str = "token_ids") -> DataFrame:
    """Lossless detokenization: ids → symbols → words (split on the
    end-of-word marker). Inverse of ``bpe_encode_ids`` with respect to
    the tokenizer's normalization (lowercased letter runs) — the
    pytest pin. Adds ``words array<string>``; id→symbol is the same
    JVM-side map literal, inverted."""
    vocab = bpe_vocab(merges)
    inv = F.create_map(*[F.lit(x) for s, i in vocab.items()
                         for x in (i, s)])
    sym = F.transform(
        ids_col,
        lambda t: F.when(
            inv[t].isNull(),
            F.raise_error(F.concat(
                F.lit("bpe_decode_ids: id outside the trained "
                      "vocab: "), t.cast("string"))).cast("string"))
        .otherwise(inv[t]))
    words = F.filter(
        F.split(F.array_join(sym, ""), END, -1), lambda w: w != "")
    return frame.withColumn("words", words)


def bpe_stats(documents: DataFrame, n_merges: int = 50,
              min_count: int = 1,
              max_vocab: int | None = None) -> DataFrame:
    """Train-and-report in one call: per source, whitespace-word vs
    BPE token counts and the compression the learned merges achieve —
    the number a tokenizer-budget decision reads. ``min_count``/
    ``max_vocab`` bound the training collect (see ``train_bpe``);
    defaults keep the exact unpruned oracle contract."""
    merges = train_bpe(documents, n_merges, min_count=min_count,
                       max_vocab=max_vocab)
    # n_words rides out of the SAME Arrow pass — no second corpus scan
    # or doc_id join for the denominator
    toked = bpe_tokenize(documents, merges)
    return (toked
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_words").alias("total_words"),
                 F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
                 F.round(F.sum("n_bpe_tokens")
                         / F.sum("n_words").cast("double"), 4)
                  .alias("tokens_per_word"))
            .orderBy("source"))
