"""HTTP redirect resolution (operators/redirects.py) — bounded-follow
semantics, loop flagging, re-keying composition; full DuckDB
value-hash parity runs via test_oracle_parity.py (`redirect_resolve`)."""

from __future__ import annotations

from conftest import SF_DIR
from pyspark.sql import functions as F

from toymapreduce_go_spark.operators.redirects import (
    REDIRECT_MAX_HOPS, apply_redirects, redirect_stats,
    redirected_url_dedup, resolve_redirects, synthesize_redirects)
from toymapreduce_go_spark.sources.registry import load_table


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_resolve_chains_loops_and_budget(spark):
    """Constructed edge classes: 1/2/3-hop chains terminate with exact
    hop counts; a 2-cycle and a self-loop FLAG (never resolve, never
    hang); a chain longer than the budget flags as unresolved — the
    RFC 9110 §15.4 client obligations, each observable."""
    assert REDIRECT_MAX_HOPS == 4
    pairs = [("a1", "t1"),                              # 1 hop
             ("b1", "b2"), ("b2", "t2"),                # 2 hops
             ("c1", "c2"), ("c2", "c3"), ("c3", "t3"),  # 3 hops
             ("la", "lb"), ("lb", "la"),                # 2-cycle
             ("self", "self"),                          # self-loop
             # 5-hop chain: exceeds the 4-hop budget
             ("d1", "d2"), ("d2", "d3"), ("d3", "d4"),
             ("d4", "d5"), ("d5", "t4")]
    out = {r["src"]: r for r in
           resolve_redirects(_edges(spark, pairs)).collect()}
    assert (out["a1"]["final"], out["a1"]["hops"],
            out["a1"]["looped"]) == ("t1", 1, False)
    assert (out["b1"]["final"], out["b1"]["hops"],
            out["b1"]["looped"]) == ("t2", 2, False)
    assert (out["c1"]["final"], out["c1"]["hops"],
            out["c1"]["looped"]) == ("t3", 3, False)
    assert out["la"]["looped"] and out["lb"]["looped"]
    assert out["self"]["looped"]
    assert out["d1"]["looped"]          # budget exhausted -> flagged
    assert not out["d2"]["looped"]      # 4 hops from d2 DOES terminate
    assert out["d2"]["final"] == "t4" and out["d2"]["hops"] == 4


def test_fixture_classes_and_rollup_direction(spark):
    """The synthesized fixture exercises every class: moved hosts
    (m%8==6) only; even pages chain twice, odd once; exactly the two
    planted loop URLs flag per moved host; non-moved hosts have no
    redirect rows at all; the permanence split reconciles (resolved =
    permanent + temporary, and fully-permanent / fully-temporary /
    MIXED chains all occur)."""
    docs = load_table(spark, SF_DIR, "documents")
    st = {r["domain"]: r for r in redirect_stats(docs).collect()}
    moved = {d for d in st if ".example.com" in d}
    assert all("site6" in d or "site14" in d for d in moved)
    for m in (6, 14):
        src = st[f"www.site{m}.example.com"]
        mid = st[f"www.site{m}m.example.com"]
        assert src["n_loops"] == 2                  # /loop/a, /loop/b
        assert src["max_hops"] == 2                 # even pages
        assert src["n_resolved"] == src["n_redirected"] - 2
        assert src["n_resolved"] == src["n_permanent"] \
            + src["n_temporary"]
        assert src["n_temporary"] > 0               # 302 class present
        assert mid["n_loops"] == 0 and mid["max_hops"] == 1
    import re

    rows = resolve_redirects(synthesize_redirects(docs)).collect()
    classes = set()
    for r in rows:
        if r["looped"]:
            assert "/loop/" in r["src"]
            continue
        g = re.match(r"http://www\.site\d+(m*)\.example\.com"
                     r"/articles/item(\d+)", r["src"])
        suffix, page = g.group(1), int(g.group(2))
        if suffix == "" and page % 2 == 0:
            assert r["hops"] == 2 and "mm.example.com" in r["final"]
            # chain perm = hop1 perm AND hop2 perm; identity follows
            # the permanent PREFIX (review r14): 301 into a 302 lands
            # at the intermediate, 302 into a 301 stays home
            want = page % 5 != 1 and page % 5 != 2
            assert r["perm"] == want
            if page % 5 == 2:
                assert r["perm_final"].split("/articles")[0] \
                    .endswith(f"site{page % 16}m.example.com")
                classes.add("mixed_pt")     # 301 into a 302
            elif page % 5 == 1:
                assert r["perm_final"] == r["src"]
                classes.add("mixed_tp")     # 302 into a 301
            else:
                assert r["perm_final"] == r["final"]
                classes.add("perm2")
        elif suffix == "":
            # moved pages are p ≡ 6/14 (mod 16) — always even, so
            # every source chain is the 2-hop form; reaching here
            # means the fixture shape changed
            raise AssertionError(f"unexpected 1-hop source {r['src']}")
        else:       # the intermediate host's own hop-2 edge
            assert suffix == "m" and r["hops"] == 1 \
                and "mm.example.com" in r["final"]
            assert r["perm"] == (page % 5 != 2)
            classes.add("perm1" if page % 5 != 2 else "temp1")
    assert {"mixed_pt", "mixed_tp", "perm1", "perm2", "temp1"} \
        <= classes


def test_permanence_and_duplicate_src_semantics(spark):
    """Constructed-edge contracts: (a) perm propagates as the AND of
    followed hops — a permanent hop into a temporary hop resolves
    temporary; (b) a frame without a perm column resolves
    all-permanent (the pre-r14 behavior); (c) conflicting Location
    entries for one src dedupe to ONE deterministic edge (min (dst,
    perm)) instead of multiplying rows through the hop joins."""
    mixed = spark.createDataFrame(
        [("a", "b", True), ("b", "c", False),    # mixed -> temp
         ("p", "q", True), ("q", "r", True),     # all-perm
         ("t", "u", False)],                     # 1-hop temp
        "src string, dst string, perm boolean")
    out = {r["src"]: r for r in resolve_redirects(mixed).collect()}
    assert not out["a"]["perm"] and out["a"]["final"] == "c"
    # review r14 (permanent prefix): a's 301 moved identity to b even
    # though b 302s onward — perm_final is the intermediate
    assert out["a"]["perm_final"] == "b"
    assert out["p"]["perm"] and out["p"]["final"] == "r"
    assert out["p"]["perm_final"] == "r"
    assert not out["t"]["perm"] and out["t"]["perm_final"] == "t"
    # b went through only its own (temporary) hop
    assert not out["b"]["perm"] and out["b"]["final"] == "c"
    assert out["b"]["perm_final"] == "b"
    noperm = spark.createDataFrame([("x", "y")], "src string, dst string")
    row0 = resolve_redirects(noperm).collect()[0]
    assert row0["perm"] is True and row0["perm_final"] == "y"
    dup = spark.createDataFrame(
        [("s", "b", True), ("s", "a", False), ("a", "z", True)],
        "src string, dst string, perm boolean")
    rows = resolve_redirects(dup).collect()
    got = {r["src"]: r for r in rows}
    assert len([r for r in rows if r["src"] == "s"]) == 1
    # min (dst, perm) winner: ('a', false) < ('b', true)
    assert got["s"]["final"] == "z" and got["s"]["hops"] == 2
    assert not got["s"]["perm"] and got["s"]["perm_final"] == "s"


def test_apply_redirects_rekeys_and_dedups_across_the_move(spark):
    """The composition: fetches of a PERMANENTLY moved page through
    the OLD host and fetches through the NEW host collapse into one
    key after re-keying (plain canon dedup keeps them apart); looped
    sources keep their original key; TEMPORARILY redirected sources
    keep their original key (§15.4.3); a non-canonical Location
    (uppercase host, default port) re-keys to its CANONICAL form;
    untouched canons pass through."""
    resolved = resolve_redirects(_edges(spark, [
        ("http://old/a", "http://new/a"),
        ("http://loop/x", "http://loop/y"),
        ("http://loop/y", "http://loop/x")]))
    frame = spark.createDataFrame(
        [("http://old/a", 1), ("http://new/a", 2),
         ("http://loop/x", 3), ("http://other/z", 4)],
        "canon string, doc_id long")
    out = {r["doc_id"]: r["canon"]
           for r in apply_redirects(frame, resolved).collect()}
    assert out[1] == out[2] == "http://new/a"     # collapsed
    assert out[3] == "http://loop/x"              # loop: key unmoved
    assert out[4] == "http://other/z"

    # a 302'd source keeps its key; a messy permanent Location lands
    # as the canonical key (ADVICE r13)
    resolved2 = resolve_redirects(spark.createDataFrame(
        [("http://a/1", "http://b/1", False),
         ("http://a/2", "HTTP://B.example.COM:80/2?utm_source=x&k=1",
          True)],
        "src string, dst string, perm boolean"))
    frame2 = spark.createDataFrame(
        [("http://a/1", 1), ("http://a/2", 2)], "canon string, doc_id long")
    out2 = {r["doc_id"]: r["canon"]
            for r in apply_redirects(frame2, resolved2).collect()}
    assert out2[1] == "http://a/1"               # temporary: unmoved
    assert out2[2] == "http://b.example.com/2?k=1"

    # fixture-level: the dedup keyed on the FINAL url preserves group
    # sizes (no group splits/merges on the synthetic corpus); every
    # PERMANENT chain's pages key at the moved-to host while
    # temporary/mixed-chain pages stay keyed at the original
    docs = load_table(spark, SF_DIR, "documents")
    from toymapreduce_go_spark.operators.urls import url_dedup_docs, \
        synthesize_urls
    plain = url_dedup_docs(synthesize_urls(docs)).collect()
    rekeyed = redirected_url_dedup(docs).collect()
    assert sorted(r["doc_id"] for r in plain) \
        == sorted(r["doc_id"] for r in rekeyed)
    import re
    by_host: dict[str, set] = {"": set(), "m": set(), "mm": set()}
    for r in rekeyed:
        g = re.match(r"http://www\.site(\d+)(m*)\.example\.com"
                     r"/articles/item(\d+)", r["canon"])
        if g and int(g.group(1)) % 8 == 6:
            by_host[g.group(2)].add(int(g.group(3)))
    # permanent-prefix identity: temp-first chains stay home, 301→302
    # lands at the intermediate host, fully-permanent at the terminal
    n_pages = (docs.count() + 3) // 4
    moved = {p for p in range(n_pages) if p % 16 % 8 == 6}
    assert by_host[""] == {p for p in moved if p % 5 == 1}
    assert by_host["m"] == {p for p in moved if p % 5 == 2}
    assert by_host["mm"] == {p for p in moved
                             if p % 5 not in (1, 2)}
    assert by_host[""] and by_host["m"] and by_host["mm"]


def _page_of(canon: str) -> int:
    import re
    return int(re.search(r"/articles/item(\d+)", canon).group(1))


def test_redirect_aware_diff_is_move_transparent(spark):
    """The refresh-crawl composition (r13 verdict item 1): with the
    new crawl recording permanently moved pages at their terminal
    URL, the NAIVE diff classifies every such page removed+added —
    while the redirect-aware diff's per-page statuses EQUAL the
    unmoved diff's (the move is transparent to the delta), keyed at
    the terminal host."""
    from toymapreduce_go_spark.operators.redirects import (
        fixture_resolved_redirects, redirect_aware_crawl_diff,
        rekey_on_final)
    from toymapreduce_go_spark.operators.urls import (
        CHANGED_MODS, NEW_EXCLUDE, OLD_EXCLUDE, crawl_diff,
        synthesize_snapshot)
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents")
    resolved = fixture_resolved_redirects(docs)
    old = synthesize_snapshot(docs, exclude_page_mod=OLD_EXCLUDE)
    new_unmoved = synthesize_snapshot(docs, exclude_page_mod=NEW_EXCLUDE,
                                      change_mods=CHANGED_MODS)
    new_moved = (rekey_on_final(new_unmoved, resolved)
                 .groupBy("canon")
                 .agg(F.min("domain").alias("domain"),
                      F.min("fp").alias("fp")))

    def by_page(rows):
        return {_page_of(r["canon"]): r["status"] for r in rows
                if "/articles/" in r["canon"]}

    naive = by_page(crawl_diff(old, new_moved).collect())
    aware = by_page(redirect_aware_crawl_diff(
        old, new_moved, resolved).collect())
    base = by_page(crawl_diff(old, new_unmoved).collect())

    n_pages = docs.count() // 4 + (docs.count() % 4 > 0)
    perm_moved = {p for p in range(n_pages)
                  if p % 16 % 8 == 6 and p % 5 != 1}
    assert perm_moved
    # naive: a moved page present in both crawls splits into
    # removed (old key) + added (new key) unless excluded
    split = {p for p in perm_moved
             if base.get(p) in ("unchanged", "changed")}
    assert split
    for p in split:
        assert naive[p] in ("removed", "added")
    # aware: page-for-page equal to the unmoved diff — the move is
    # invisible to the delta
    assert aware == base


def test_pure_move_refresh_retracts_nothing_with_aware_diff(spark):
    """A recrawl that ONLY observes permanent moves (same content,
    new hosts) must drive a no-op refresh: the aware diff classifies
    everything unchanged, so stale_keys_from_diff retracts zero index
    keys — where the naive diff would retract and re-process every
    permanently moved page (the 100 TB waste)."""
    from toymapreduce_go_spark.operators.redirects import (
        fixture_resolved_redirects, redirect_aware_crawl_diff,
        rekey_on_final)
    from toymapreduce_go_spark.operators.refresh import \
        stale_keys_from_diff
    from toymapreduce_go_spark.operators.urls import (crawl_diff,
                                                      synthesize_snapshot)
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents")
    resolved = fixture_resolved_redirects(docs)
    old = synthesize_snapshot(docs)
    new = (rekey_on_final(old, resolved)
           .groupBy("canon")
           .agg(F.min("domain").alias("domain"),
                F.min("fp").alias("fp")))
    aware = redirect_aware_crawl_diff(old, new, resolved)
    assert aware.filter(F.col("status") != "unchanged").count() == 0
    # old_keys: the crawl's canon -> id table (ids = pages here)
    old_keys = old.select(
        "canon", F.monotonically_increasing_id().alias("prior_id"))
    assert stale_keys_from_diff(aware, old_keys, "prior_id").count() == 0
    naive = crawl_diff(old, new)
    n_naive = stale_keys_from_diff(naive, old_keys, "prior_id").count()
    n_pages = docs.count() // 4 + (docs.count() % 4 > 0)
    rekeyed = {p for p in range(n_pages)
               if p % 16 % 8 == 6 and p % 5 != 1}
    assert n_naive == len(rekeyed) > 0
