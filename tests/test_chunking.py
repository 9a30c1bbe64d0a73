"""Document chunking invariants: window coverage/overlap arithmetic,
lossless reconstruction of the token stream, degenerate inputs, and
the zero-shuffle plan contract. The per-source rollup's full DuckDB
value-hash parity runs in tests/test_oracle_parity.py (chunk_stats)."""

from __future__ import annotations

import pytest
from conftest import SF_DIR

from toymapreduce_go_spark.operators.chunking import (chunk_documents,
                                                      chunk_stats)


def _tokens(text: str) -> list[str]:
    import re
    return [t for t in re.split(r"[^a-zA-Z]+", text) if t]


def test_chunks_reconstruct_token_stream_exactly(spark):
    """Drop the first ``overlap`` tokens of every chunk after the first
    and concatenate: the original token stream comes back exactly —
    chunking loses nothing and every token lands in at least one
    window. (The LAST window keeps its fixed stride position and is
    CLAMPED at the stream end, so its fresh suffix can be shorter than
    the stride; reconstruction uses each chunk's fresh TAIL against the
    stream position instead of assuming stride.)"""
    from toymapreduce_go_spark.sources.registry import load_table

    c, o = 12, 4
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    originals = {r.doc_id: _tokens(r.text)
                 for r in docs.select("doc_id", "text").collect()}
    by_doc: dict[int, list] = {}
    for r in chunk_documents(docs, chunk_tokens=c, overlap=o).collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {d for d, t in originals.items() if t}
    s = c - o
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_id)
        orig = originals[doc_id]
        assert [r.chunk_id for r in rows] == list(range(len(rows)))
        recon: list[str] = []
        for r in rows:
            ctoks = r.text.split(" ")
            assert r.n_tokens == len(ctoks) <= c
            start = r.chunk_id * s  # 0-based window start in the stream
            assert ctoks == orig[start:start + c]
            recon.extend(ctoks[len(recon) - start:])
        assert recon == orig
        # minimality: one fewer window would strand the tail
        if len(rows) > 1:
            assert (len(rows) - 2) * s + c < len(orig)


def test_chunking_degenerate_inputs(spark):
    """Empty text → no chunks (sequence(1,0) steps DOWN in Spark — the
    guard matters); short docs → exactly one un-padded chunk; a doc of
    exactly chunk_tokens → one chunk; +1 token → two."""
    docs = spark.createDataFrame(
        [(0, "s", ""), (1, "s", "   "), (2, "s", "one two three"),
         (3, "s", " ".join(f"w{i}" for i in range(12))),
         (4, "s", " ".join(f"w{i}" for i in range(13)))],
        "doc_id long, source string, text string")
    rows = chunk_documents(docs, chunk_tokens=12, overlap=4).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert 0 not in per_doc and 1 not in per_doc
    assert len(per_doc[2]) == 1 and per_doc[2][0].n_tokens == 3
    assert len(per_doc[3]) == 1 and per_doc[3][0].n_tokens == 12
    assert len(per_doc[4]) == 2
    # the second window starts at its fixed stride position (token 9)
    # and is clamped at the end: tokens 9..13 (5 of them), sharing
    # exactly overlap=4 with window one
    assert sorted(r.n_tokens for r in per_doc[4]) == [5, 12]

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_chunking_plan_is_scan_side(spark):
    """Plan contract: chunk_documents is a pure scan-side projection —
    NO exchange, join, window, or Python stage anywhere; chunk_stats
    adds only the count-combinable per-source aggregate."""
    from test_explain_plans import plan_of

    from toymapreduce_go_spark.sources.registry import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = plan_of(chunk_documents(docs))
    assert "Exchange" not in plan, plan
    for bad in ("Join", "Window", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan, (bad, plan)
    splan = plan_of(chunk_stats(docs))
    for bad in ("Join", "Window", "ArrowEvalPython", "MapInPandas"):
        assert bad not in splan, (bad, splan)
