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


def word_frequencies(documents: DataFrame) -> DataFrame:
    """(word, c) lowercased corpus word counts — the ONE distributed
    pass BPE training needs."""
    toks = F.filter(
        F.transform(tokens("text"), lambda t: F.lower(t)),
        lambda t: F.length(t) > 0)
    return (documents.select(F.explode(toks).alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).alias("c")))


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


def train_bpe(documents: DataFrame, n_merges: int = 50
              ) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges. Returns the ordered merge list
    [(left, right), ...]; applying them in order IS the tokenizer.

    The driver loop runs over the collected word-frequency table
    (vocab-sized — the model-budget class); each round counts adjacent
    symbol pairs weighted by word frequency, merges the most frequent
    pair (ties → lexicographically smallest), and stops early when no
    pair occurs twice."""
    freqs = [(r["w"], int(r["c"])) for r in word_frequencies(documents)
             .collect()]
    vocab: dict[tuple, int] = {}
    for w, c in freqs:
        syms = tuple(list(w) + [END])
        vocab[syms] = vocab.get(syms, 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        top = max(pair_counts.values())
        if top < 2:
            break
        a, b = min(p for p, c in pair_counts.items() if c == top)
        merges.append((a, b))
        merged = a + b
        vocab = {(_merge_word(syms, a, b, merged)): c
                 for syms, c in vocab.items()}
    return merges


def bpe_tokenize(documents: DataFrame,
                 merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a trained merge list to the corpus — the distributed
    scoring pass: ``(doc_id, source, bpe_tokens array<string>,
    n_bpe_tokens)``. Arrow-batched with a per-batch word memo; the
    merge list ships with the closure (model-sized broadcast)."""
    import pandas as pd  # noqa: F401 (typed signature below)

    merge_list = list(merges)

    def run(batches):
        memo: dict[str, list[str]] = {}

        def word_to_tokens(w: str) -> list[str]:
            got = memo.get(w)
            if got is not None:
                return got
            syms = tuple(list(w) + [END])
            for a, b in merge_list:
                if len(syms) < 2:
                    break
                syms = _merge_word(syms, a, b, a + b)
            out = list(syms)
            memo[w] = out
            return out

        import re
        splitter = re.compile(r"[^a-zA-Z]+")
        for pdf in batches:
            toks_col = []
            for text in pdf["text"]:
                if text is None:
                    toks_col.append([])
                    continue
                out: list[str] = []
                for w in splitter.split(text):
                    if w:
                        out.extend(word_to_tokens(w.lower()))
                toks_col.append(out)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "bpe_tokens": toks_col,
                "n_bpe_tokens": [len(t) for t in toks_col],
            })

    return (documents.select("doc_id", "source", "text")
            .mapInPandas(run, schema="doc_id long, source string, "
                                     "bpe_tokens array<string>, "
                                     "n_bpe_tokens long"))


def bpe_stats(documents: DataFrame, n_merges: int = 50) -> DataFrame:
    """Train-and-report in one call: per source, whitespace-word vs
    BPE token counts and the compression the learned merges achieve —
    the number a tokenizer-budget decision reads."""
    merges = train_bpe(documents, n_merges)
    toked = bpe_tokenize(documents, merges)
    chars = documents.select(
        "doc_id",
        F.size(F.filter(F.transform(tokens("text"),
                                    lambda t: F.lower(t)),
                        lambda t: F.length(t) > 0)).alias("n_words"))
    return (toked.join(chars, "doc_id")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_words").alias("total_words"),
                 F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
                 F.round(F.sum("n_bpe_tokens")
                         / F.sum("n_words").cast("double"), 4)
                  .alias("tokens_per_word"))
            .orderBy("source"))
