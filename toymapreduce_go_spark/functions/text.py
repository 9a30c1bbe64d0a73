"""Text column expressions. All JVM-side (`pyspark.sql.functions` only) so
they stay inside whole-stage codegen — no Python UDFs on these paths.

Tokenization contract (FIXTURES.md §1): split on runs of non-letters, drop
empty tokens, case-sensitive, no stemming — the ASCII-pinned form of the
reference's `strings.FieldsFunc(content, !unicode.IsLetter)`
(example/mrapps/wc/wc.go:26-29). The Go original is full-Unicode
`unicode.IsLetter`; declared queries pin ``[^a-zA-Z]+`` so Spark and the
DuckDB oracle agree (documented divergence, SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ASCII letter-run tokenizer (see module docstring for the Unicode caveat).
TOKEN_PATTERN = "[^a-zA-Z]+"

# BPE-ish word/number/punct splitter for token counting: runs of letters,
# runs of digits, or single non-space symbols — a cheap, deterministic
# stand-in for a real BPE vocab (the shape GPT-2's pre-tokenizer has).
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def tokens(text: Column | str) -> Column:
    """array<string> of non-empty tokens of ``text`` per TOKEN_PATTERN."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(col, TOKEN_PATTERN), lambda t: F.length(t) > 0)


def words_exploded(df: DataFrame, text_col: str = "text",
                   out_col: str = "word") -> DataFrame:
    """One output row per token occurrence (the map half of wordcount,
    reference wc.go:24-37). Keeps all other columns."""
    return df.withColumn(out_col, F.explode(tokens(text_col)))


def whitespace_token_count(text: Column) -> Column:
    """Number of whitespace-delimited tokens."""
    return F.size(F.filter(F.split(text, "\\s+"), lambda t: F.length(t) > 0))


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-ish tokens (letters-run | digits-run | symbol)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))


# Full-Unicode letter-run tokenizer: the reference's actual contract
# (`unicode.IsLetter`, wc.go:26-29). Java regex \p{L} matches the same
# Unicode Letter category Go's unicode.IsLetter tests, so this closes
# the documented ASCII divergence for non-ASCII corpora. Kept out of the
# DECLARED oracle surface only because DuckDB's regexp engine (RE2) and
# Java's differ on some category edge cases; pytest pins it against a
# known multilingual fixture instead.
UNICODE_TOKEN_PATTERN = "[^\\p{L}]+"


def tokens_unicode(text: Column | str) -> Column:
    """array<string> of non-empty Unicode-letter-run tokens — the exact
    FieldsFunc(!unicode.IsLetter) semantics of the reference."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(col, UNICODE_TOKEN_PATTERN),
                    lambda t: F.length(t) > 0)
