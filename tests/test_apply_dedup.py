"""apply_near_dedup: the materializing cluster-dedup contract."""

from __future__ import annotations

from conftest import SF_DIR
from toymapreduce_go_spark.operators.dedup import (apply_near_dedup,
                                                   connected_components,
                                                   near_dedup_minhash)


def test_apply_near_dedup_keeps_exactly_cluster_survivors(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    kept = apply_near_dedup(docs)
    pairs = near_dedup_minhash(docs).select("doc_a", "doc_b")
    comp = connected_components(pairs)
    n_losers = comp.filter("doc_id != cluster_id").count()
    assert n_losers > 0  # fixture plants near-dups
    assert kept.count() == docs.count() - n_losers
    # every cluster's min id survives; no loser survives
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    for r in comp.collect():
        if r["doc_id"] == r["cluster_id"]:
            assert r["doc_id"] in kept_ids
        else:
            assert r["doc_id"] not in kept_ids
    # schema passes through untouched
    assert kept.columns == docs.columns


def _py_mask_dup_spans(rows, k=20):
    """Independent pure-Python ExactSubstr removal: same gram hash
    (int(md5_hex[:15], 16)), >= 2 distinct docs rule, interval union,
    complement splice."""
    import hashlib

    def h(gram):
        return int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:15], 16)

    grams = {}
    for doc_id, _src, text in rows:
        if text is None or len(text) < k:
            continue
        for i in range(len(text) - k + 1):
            grams.setdefault(h(text[i:i + k]), set()).add(doc_id)
    dup = {g for g, docs in grams.items() if len(docs) >= 2}
    out = {}
    for doc_id, _src, text in rows:
        if text is None or len(text) < k:
            out[doc_id] = text
            continue
        starts = [i for i in range(len(text) - k + 1)
                  if h(text[i:i + k]) in dup]
        ivs = []
        for s in starts:
            if ivs and s <= ivs[-1][1]:
                ivs[-1][1] = max(ivs[-1][1], s + k)
            else:
                ivs.append([s, s + k])
        kept, pe = [], 0
        for s, e in ivs:
            kept.append(text[pe:s])
            pe = e
        kept.append(text[pe:])
        out[doc_id] = "".join(kept)
    return out


def test_mask_dup_spans_matches_python_reference(spark):
    """The two JVM aggregate folds (interval merge + complement splice)
    must agree EXACTLY with an independent Python implementation —
    including overlapping spans, spans at doc start/end, multiple
    disjoint duplicated regions, short and untouched docs."""
    from toymapreduce_go_spark.operators.dedup import mask_dup_spans

    b1 = "shared boilerplate block number one used all over"
    b2 = "another independently repeated chunk of legal text"
    rows = [
        (1, "a", f"{b1} then unique middle content {b2} unique end."),
        (2, "a", f"prefix text {b1} and then some more then {b2}"),
        (3, "a", f"{b2}"),                       # doc IS the span
        (4, "b", "completely original content long enough for grams."),
        (5, "b", "tiny"),                        # < k: untouched
        (6, "b", None),                          # null text: untouched
    ]
    want = _py_mask_dup_spans(rows)
    docs = spark.createDataFrame(rows,
                                 "doc_id long, source string, text string")
    got = {r["doc_id"]: r["text"] for r in mask_dup_spans(docs).collect()}
    assert got == want
    # the planted boilerplate really is removed from every carrier
    for d in (1, 2, 3):
        assert b1 not in (got[d] or "") and b2 not in (got[d] or "")
    # and original text survives where there is no duplication
    assert got[4] == rows[3][2]
    assert got[5] == "tiny"
    assert got[6] is None


def test_dedup_lines_across_corpus_matches_python_reference(spark):
    """The line-dedup rewrite pass: planted boilerplate (a long cookie
    banner shared by many docs) must survive exactly once corpus-wide
    (first (doc_id, pos) occurrence), short lines pass through verbatim
    everywhere, line order within docs is preserved, and the rewrite
    agrees doc-for-doc with an independent Python reference."""
    from toymapreduce_go_spark.operators.dedup import (
        dedup_lines_across_corpus, line_dedup_stats)

    banner = "This website uses cookies to improve your experience."
    lic = "Licensed under the Apache License, Version 2.0 (the License)"
    rows = [
        (1, "a", f"{banner}\nunique text one\nok"),
        (2, "a", f"intro two\n{banner}\n{lic}"),
        (3, "b", f"{lic}\nshort\n{banner}"),
        (4, "b", "no duplicates here at all, just original prose lines"),
        # fully-cleared doc: its ONLY line is a corpus duplicate, so
        # the rewrite leaves "" and removes len(banner) chars (no
        # newline existed) — the stats' fully-cleared correction
        (5, "c", banner),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string")

    # python reference: first (doc_id, pos) occurrence of eligible lines
    seen: set[str] = set()
    want = {}
    for doc_id, _, text in sorted(rows):
        kept = []
        for line in text.split("\n"):
            if len(line) >= 30:
                if line in seen:
                    continue
                seen.add(line)
            kept.append(line)
        want[doc_id] = "\n".join(kept)

    got = {r["doc_id"]: r["text"]
           for r in dedup_lines_across_corpus(docs).collect()}
    assert got == want
    # the banner survives exactly once, in doc 1 where it first appeared
    assert banner in got[1] and banner not in got[2] \
        and banner not in got[3]
    assert lic in got[2] and lic not in got[3]
    # stats agree with the rewrite's removals
    stats = {r["source"]: r for r in line_dedup_stats(docs).collect()}
    assert stats["a"]["n_dup_lines"] == 1   # banner copy in doc 2
    assert stats["b"]["n_dup_lines"] == 2   # lic + banner copies
    assert stats["b"]["docs_with_dup"] == 1
    assert stats["c"]["n_dup_lines"] == 1
    assert got[5] == ""
    removed = {r["doc_id"]: r["removed_chars"]
               for r in dedup_lines_across_corpus(docs).collect()}
    for doc_id, _, text in rows:
        assert removed[doc_id] == len(text) - len(want[doc_id])
    # chars_removable is EXACTLY what the rewrite removes, per source —
    # including the fully-cleared doc 5 (len(banner), not len+1)
    by_src: dict[str, int] = {}
    for doc_id, src, _ in rows:
        by_src[src] = by_src.get(src, 0) + removed[doc_id]
    for src, r in stats.items():
        assert r["chars_removable"] == by_src[src], src
    assert stats["c"]["chars_removable"] == len(banner)


def test_dedup_lines_within_doc_matches_python_reference(spark):
    """Intra-doc repeated-line removal: equal long lines collapse to
    their first occurrence WITHIN each doc (other docs untouched),
    short lines repeat freely, and the whole pass is scan-side — the
    physical plan has no Exchange at all."""
    import contextlib
    import io

    from toymapreduce_go_spark.operators.dedup import \
        dedup_lines_within_doc

    banner = "This website uses cookies to improve your experience."
    rows = [
        # banner twice in one doc -> second copy goes
        (1, "a", f"{banner}\nmiddle prose line, quite original\n{banner}"),
        # same banner in ANOTHER doc -> intra-doc pass keeps it
        (2, "a", f"{banner}\nunrelated content"),
        # short line repeated -> kept both times; long line repeated
        # three times -> kept once
        (3, "b", f"ok\n{banner}\nok\n{banner}\n{banner}\nok"),
        (4, "b", "no duplicates here at all, just original prose"),
        (5, "b", ""),  # empty text survives as empty
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string")

    def py_ref(text: str) -> str:
        seen: set[str] = set()
        kept = []
        for line in text.split("\n"):
            if len(line) >= 30:
                if line in seen:
                    continue
                seen.add(line)
            kept.append(line)
        return "\n".join(kept)

    out = dedup_lines_within_doc(docs)
    got = {r["doc_id"]: (r["text"], r["removed_chars"])
           for r in out.collect()}
    for doc_id, _, text in rows:
        want = py_ref(text)
        assert got[doc_id][0] == want, doc_id
        assert got[doc_id][1] == len(text) - len(want)
    # doc 2's banner copy is intact (independence from doc 1)
    assert banner in got[2][0]
    assert got[3][0].count(banner) == 1
    assert [l for l in got[3][0].split("\n") if l == "ok"] == ["ok"] * 3
    # scan-side contract: zero shuffles
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "Exchange" not in buf.getvalue()
