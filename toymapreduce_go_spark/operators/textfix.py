"""Encoding repair — the text-hygiene pass (ftfy's core case; see
also the UTF-8 cleanup step every public crawl pipeline runs) for the
single most common real-corpus corruption: UTF-8 bytes decoded as
CP1252, so ``’`` arrives as ``â€™``, ``é`` as ``Ã©``, ``—`` as
``â€”``.  The repair is the exact inverse mapping applied as a
scan-side literal-replace chain (longest sequences first so 3-byte
mojibake can never be half-eaten by a 2-byte rule), plus a C0
control-character strip (``\\n``/``\\t`` kept).

The mapping table is COMPUTED, not hand-typed: for each supported
character, ``c.encode('utf-8').decode('cp1252')`` — one table, shared
with the DuckDB twin through ``moji_pairs()`` (the ``TRACKING_RE``
one-literal-two-engines convention). Characters whose UTF-8 bytes hit
CP1252's five undefined slots (0x81 8D 8F 90 9D — e.g. ``”``) are out
of scope, as are ftfy's statistical heuristics — disclosed.

Fixture: the corpus is ASCII, so each document gets a deterministic
Unicode suffix (4 templates by ``doc_id % 4``, together covering every
mapped character), and docs with ``doc_id % CORRUPT_MOD == 0`` are
forward-corrupted (mojibake + a trailing BEL control byte). The
contract pinned in pytest: ``repair(corrupt(rich)) == rich`` exactly,
clean docs pass through untouched, and repair is idempotent. The
DuckDB twin replays the synthesis and the FORWARD corruption but
never runs the repair — its stats come from the clean text — so the
value-hash proves repair is the true inverse, not that two engines
ran the same replace chain.

100 TB shape: pure whole-stage-codegen string projection — no joins,
no shuffles before the per-source rollup; the replace chain is a
constant-size expression independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.checksum import CKSUM_MOD

# every supported char round-trips utf-8 → cp1252 without hitting an
# undefined cp1252 byte (asserted at import)
_CHARS = "’‘“–—…éèïüñçà"
CORRUPT_MOD = 3


def moji_pairs() -> list[tuple[str, str]]:
    """(clean, mojibake) pairs, longest mojibake first — the one
    table both the engine and the DuckDB twin are generated from.

    ORDER IS LOAD-BEARING for the forward direction: a mojibake
    string can CONTAIN a later source char (the real case: '–' →
    'â€<U+201C>', whose third char is '“'), and a later rule would
    re-corrupt it, producing sequences the repair cannot invert. The
    ordering is therefore asserted, not assumed: every pair's
    mojibake must be free of all LATER pairs' source chars."""
    pairs = [(c, c.encode("utf-8").decode("cp1252")) for c in _CHARS]
    for c, m in pairs:
        assert m.encode("cp1252").decode("utf-8") == c, c
    pairs = sorted(pairs, key=lambda p: -len(p[1]))
    for i, (_, m) in enumerate(pairs):
        for later, _ in pairs[i + 1:]:
            assert later not in m, (
                f"moji_pairs: {later!r} appears inside the mojibake "
                f"{m!r} of an earlier pair — reorder _CHARS so the "
                "contained char's rule runs first")
    return pairs


_SUFFIXES = (" — café touché…",
             " ‘naïve’ – über",
             " “garçon — déjà vu",
             " señor – èlite…")


def rich_text_expr() -> Column:
    """The fixture's clean Unicode text: ``text`` plus one of four
    deterministic suffixes; together they cover every mapped char."""
    v = F.pmod(F.col("doc_id"), F.lit(4))
    suffix = (F.when(v == 0, F.lit(_SUFFIXES[0]))
              .when(v == 1, F.lit(_SUFFIXES[1]))
              .when(v == 2, F.lit(_SUFFIXES[2]))
              .otherwise(F.lit(_SUFFIXES[3])))
    return F.concat(F.col("text"), suffix)


def corrupt_mojibake(col: Column) -> Column:
    """Forward corruption: clean char → its UTF-8-as-CP1252 bytes,
    applied in ``moji_pairs()`` order — which matters: '–'-mojibake
    embeds a literal '“', so the '“' rule must already have run (the
    order is asserted in ``moji_pairs``, see there)."""
    c = col
    for ch, moji in moji_pairs():
        c = F.replace(c, F.lit(ch), F.lit(moji))
    return c


def repair_mojibake(col: Column) -> Column:
    """The inverse: mojibake sequence → clean char (longest first),
    then newline normalization (CRLF and lone CR → LF — a CRLF
    document and its LF twin must dedup together), then strip the
    remaining C0 controls except tab/newline. Pure scan-side."""
    c = col
    for ch, moji in moji_pairs():
        c = F.replace(c, F.lit(moji), F.lit(ch))
    c = F.regexp_replace(c, "\\r\\n?", "\n")
    return F.regexp_replace(
        c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", "")


def mojibake_corpus(documents: DataFrame) -> DataFrame:
    """(doc_id, source, rich, raw): the fixture corpus — ``rich`` is
    the clean truth, ``raw`` is what 'arrived' (corrupted + BEL for
    the ``doc_id % CORRUPT_MOD == 0`` class, clean otherwise)."""
    rich = rich_text_expr()
    raw = F.when(
        F.pmod(F.col("doc_id"), F.lit(CORRUPT_MOD)) == 0,
        F.concat(corrupt_mojibake(rich), F.lit("\x07"))).otherwise(rich)
    return documents.select("doc_id", "source", rich.alias("rich"),
                            raw.alias("raw"))


def mojibake_stats(documents: DataFrame) -> DataFrame:
    """The registered rollup: per source — docs, repaired vs clean
    counts, total mojibake inflation (chars removed by repair), and a
    mod-prime md5 checksum over the REPAIRED text. The twin computes
    the same columns from the clean text + forward corruption only,
    so matching hashes prove exact inversion on every document."""
    d = mojibake_corpus(documents).withColumn(
        "repaired", repair_mojibake(F.col("raw")))
    fixed = F.col("raw") != F.col("repaired")
    h = F.pmod(F.conv(F.substring(F.md5("repaired"), 1, 15), 16, 10)
               .cast("long"), F.lit(CKSUM_MOD))
    return (d.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(fixed.cast("long")).alias("n_repaired"),
                 F.sum((~fixed).cast("long")).alias("n_clean"),
                 F.sum((F.length("raw") - F.length("repaired"))
                       .cast("long")).alias("chars_inflated"),
                 F.sum(h).alias("repaired_checksum"))
            .orderBy("source"))
