"""Sitemap front door (operators/sitemaps.py) — round-trip and
frontier-compose contracts; full DuckDB value-hash parity (against an
oracle that never parses the XML) runs via test_oracle_parity.py
(`sitemap_extract`)."""

from __future__ import annotations

import re

from conftest import SF_DIR

from toymapreduce_go_spark.operators.frontier import frontier_schedule
from toymapreduce_go_spark.operators.sitemaps import (
    sitemap_entries, sitemap_seeds, synthesize_sitemaps)
from toymapreduce_go_spark.operators.urls import (
    canonicalize_url, synth_url_sql)
from toymapreduce_go_spark.sources.registry import load_table
from pyspark.sql import functions as F


def test_parse_roundtrip_recovers_every_pages_canonical_url(spark):
    """Parsing the synthesized XML and canonicalizing every escaped
    loc yields EXACTLY the corpus's canonical URL set per domain —
    the lossless-container contract (html/pdf/warc convention): no
    entry lost, none invented, XML escaping round-tripped."""
    docs = load_table(spark, SF_DIR, "documents")
    parsed = sitemap_entries(synthesize_sitemaps(docs))
    got = {(r.domain, r.canon) for r in parsed.collect()}
    want = {(r.domain, r.canon) for r in docs.select(
        canonicalize_url(synth_url_sql()).alias("canon")).select(
        F.regexp_extract(
            "canon", r"^[a-z]+://([^/]*)", 1).alias("domain"),
        "canon").collect()}
    assert got == want
    # every parsed loc survived escaping: sorted query, no &amp; left
    for _, canon in got:
        assert "&amp;" not in canon
        assert canon.endswith("?a=1&b=2")


def test_sitemap_seeds_superset_of_link_frontier_and_find_orphans(spark):
    """The sitemap enumerates EVERY gated uncrawled page, so the link
    frontier's canon set is a strict subset: (a) every link-frontier
    candidate is a sitemap seed (gate consistency — both channels
    apply deny list + robots identically), and (b) at the fixture
    size at least one seed has NO crawled in-linker and is therefore
    invisible to the link frontier — the orphan page that justifies
    running the sitemap channel at all."""
    docs = load_table(spark, SF_DIR, "documents")
    seeds = {r.canon for r in sitemap_seeds(docs).collect()}
    front = {r.canon for r in frontier_schedule(docs).collect()}
    assert front, "link frontier empty — fixture broken"
    assert front < seeds          # strict subset
    orphans = seeds - front
    assert orphans
    # orphans are genuinely uncrawled pages (page % 3 == 0)
    for c in orphans:
        assert int(re.search(r"item(\d+)", c).group(1)) % 3 == 0


def test_lastmod_rides_the_xml(spark):
    """Every parsed lastmod equals epoch + (page % 365) days — i.e.
    the value came back THROUGH the XML, not from the page id."""
    import datetime
    docs = load_table(spark, SF_DIR, "documents")
    epoch = datetime.date(2025, 1, 1)
    for r in sitemap_entries(synthesize_sitemaps(docs)).collect():
        page = int(re.search(r"item(\d+)", r.canon).group(1))
        want = epoch + datetime.timedelta(days=page % 365)
        assert r.lastmod == want.isoformat(), r.canon


def test_recrawl_schedule_staleness_is_exact_and_nonvacuous(spark):
    """Every (page, verdict) matches the strict lastmod-vs-fetch-day
    comparison recomputed driver-side, both verdict classes occur, and
    uncrawled pages (the frontier's job) never appear."""
    from toymapreduce_go_spark.operators.frontier import FRONTIER_MOD
    from toymapreduce_go_spark.operators.sitemaps import (
        FETCH_DAY_MULT, recrawl_schedule, sitemap_entries)

    docs = load_table(spark, SF_DIR, "documents")
    roll = recrawl_schedule(docs).collect()
    assert roll
    assert sum(r.n_stale for r in roll) > 0
    assert sum(r.n_fresh for r in roll) > 0
    # per-domain totals recomputed driver-side from the parsed sitemap
    # with the strict staleness comparison — pins every verdict AND
    # the crawled-only exclusion
    dom_pages: dict[str, int] = {}
    dom_stale: dict[str, int] = {}
    for r in sitemap_entries(synthesize_sitemaps(docs)).collect():
        page = int(re.search(r"item(\d+)", r.canon).group(1))
        if page % FRONTIER_MOD == 0:
            continue
        dom_pages[r.domain] = dom_pages.get(r.domain, 0) + 1
        if (page % 365) > (page * FETCH_DAY_MULT) % 365:
            dom_stale[r.domain] = dom_stale.get(r.domain, 0) + 1
    assert {r.domain: r.n_crawled_pages for r in roll} == dom_pages
    assert {r.domain: r.n_stale for r in roll} == \
        {d: dom_stale.get(d, 0) for d in dom_pages}


def test_sitemap_index_two_level_round_trip_equals_flat(spark):
    """The <sitemapindex> → gzipped-children parse yields exactly the
    flat urlset's entries (domain, canon, lastmod) — the equality pin
    that lets sitemap_index_stats inherit the XML-free twin — and the
    miniature 50k-cap stand-in BINDS: every host splits into more
    than one child, no child exceeds SITEMAP_CHILD_CAP entries."""
    from toymapreduce_go_spark.operators.sitemaps import (
        SITEMAP_CHILD_CAP, sitemap_entries, sitemap_index_entries,
        sitemap_index_stats, synthesize_sitemap_children,
        synthesize_sitemap_index, synthesize_sitemaps)
    docs = load_table(spark, SF_DIR, "documents")
    flat = {tuple(r) for r in
            sitemap_entries(synthesize_sitemaps(docs)).collect()}
    idx = {tuple(r) for r in sitemap_index_entries(
        synthesize_sitemap_index(docs),
        synthesize_sitemap_children(docs)).collect()}
    assert idx == flat and flat
    # the cap binds and is respected
    ch = synthesize_sitemap_children(docs)
    per = {(r["domain"], r["child"]) for r in ch.collect()}
    n_children = {}
    for d, c in per:
        n_children[d] = n_children.get(d, 0) + 1
    assert all(v > 1 for v in n_children.values())
    import gzip
    for r in ch.collect():
        xml = gzip.decompress(bytes(r["xml_gz"])).decode()
        assert xml.count("<url><loc>") <= SITEMAP_CHILD_CAP
    # and the registered rollup equals the flat one MINUS the
    # 5xx-robots hosts (r14: the index form discovers via robots.txt,
    # and an unreadable robots.txt discovers nothing — RFC 9309
    # §2.3.1.3; the flat form models a direct fetch and keeps them)
    from toymapreduce_go_spark.operators.urls import ROBOTS_5XX_MODS
    gone = {f"www.site{m}.example.com" for m in ROBOTS_5XX_MODS}
    a = {tuple(r) for r in sitemap_index_stats(docs).collect()}
    ball = __import__("toymapreduce_go_spark.operators.sitemaps",
                      fromlist=["sitemap_extract_stats"]) \
        .sitemap_extract_stats(docs).collect()
    assert {r["domain"] for r in ball} & gone     # the class is live
    b = {tuple(r) for r in ball if r["domain"] not in gone}
    assert a == b


def test_sitemap_index_corrupt_gz_child_raises(spark):
    """A corrupted gzip child sitemap fails loudly (CRC trailer),
    naming the child — never a partial parse."""
    import pytest

    from toymapreduce_go_spark.operators.sitemaps import (
        sitemap_index_entries, synthesize_sitemap_children,
        synthesize_sitemap_index)
    docs = load_table(spark, SF_DIR, "documents")
    ch = synthesize_sitemap_children(docs)

    def corrupt(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["xml_gz"] = [
                bytes(g[:-6]) + bytes([g[-6] ^ 0xFF]) + bytes(g[-5:])
                for g in pdf["xml_gz"]]
            yield pdf

    bad = ch.mapInPandas(corrupt,
                         "domain string, child long, xml_gz binary")
    with pytest.raises(Exception, match="sitemap_index"):
        sitemap_index_entries(synthesize_sitemap_index(docs),
                              bad).collect()


def test_sitemap_discovery_rides_the_robots_declared_loc(spark):
    """r12 verdict item 5: the index fetch starts from the robots.txt
    ``Sitemap:`` line — a host whose robots declares no sitemap (or a
    loc nothing serves) contributes NOTHING to the discovered index
    set, and the discovered set equals the synthesized files exactly
    when every host declares (the fixture case)."""
    from pyspark.sql import functions as F

    from toymapreduce_go_spark.operators.sitemaps import (
        discovered_sitemap_indexes, robots_sitemap_locs,
        synthesize_sitemap_index)

    from toymapreduce_go_spark.operators.urls import ROBOTS_5XX_MODS
    gone = {f"www.site{m}.example.com" for m in ROBOTS_5XX_MODS}
    docs = load_table(spark, SF_DIR, "documents")
    disc = discovered_sitemap_indexes(docs)
    # r14: a host whose robots.txt fetch answered 5xx declared
    # nothing readable — its sitemap is never discovered
    want = {tuple(r) for r in
            synthesize_sitemap_index(docs).collect()
            if r["domain"] not in gone}
    assert {tuple(r) for r in disc.collect()} == want and want

    # drop one host's Sitemap line -> that host's index is never
    # fetched (simulate by filtering the loc frame the join consumes)
    locs = robots_sitemap_locs(docs)
    assert locs.count() == 16 - len(gone)
    assert not {r["domain"] for r in locs.collect()} & gone
    files = synthesize_sitemap_index(docs).withColumn(
        "_loc", F.concat(F.lit("http://"), F.col("domain"),
                         F.lit("/sitemaps/index.xml")))
    kept_locs = locs.filter(~F.col("domain").contains("site0.")).select(
        F.col("sitemap_loc").alias("_loc"))
    got = files.join(F.broadcast(kept_locs), "_loc").select("domain")
    doms = {r["domain"] for r in got.collect()}
    assert "www.site0.example.com" not in doms \
        and len(doms) == 15 - len(gone)

    # a declared loc nothing serves fetches nothing (join on the loc,
    # not the domain)
    bogus = locs.withColumn(
        "sitemap_loc", F.concat(F.col("sitemap_loc"), F.lit(".nope")))
    got2 = files.join(
        F.broadcast(bogus.select(F.col("sitemap_loc").alias("_loc"))),
        "_loc")
    assert got2.count() == 0


def test_revalidation_reconciles_with_recrawl_and_saves_bytes(spark):
    """r13: conditional-request accounting — the 304/200 split is
    exactly recrawl_schedule's fresh/stale split per host, byte
    totals reconcile against a driver-side replay (page body size =
    min doc byte length over the quad), and the fixture exercises
    both outcomes with real bytes on each side."""
    from toymapreduce_go_spark.operators.sitemaps import (
        recrawl_revalidation, recrawl_schedule)

    docs = load_table(spark, SF_DIR, "documents")
    rev = {r["domain"]: r for r in recrawl_revalidation(docs).collect()}
    sch = {r["domain"]: r for r in recrawl_schedule(docs).collect()}
    assert set(rev) == set(sch)
    sizes: dict[int, int] = {}
    for r in docs.select("doc_id", "text").collect():
        p = r["doc_id"] // 4
        b = len(r["text"].encode()) if r["text"] is not None else 0
        sizes[p] = min(sizes.get(p, 1 << 60), b)
    want_saved: dict[str, int] = {}
    want_moved: dict[str, int] = {}
    for p, b in sizes.items():
        if p % 3 == 0:                      # uncrawled: no recrawl row
            continue
        dom = f"www.site{p % 16}.example.com"
        if (p % 365) > (p * 7) % 365:
            want_moved[dom] = want_moved.get(dom, 0) + b
        else:
            want_saved[dom] = want_saved.get(dom, 0) + b
    for d, r in rev.items():
        assert r["n_304"] == sch[d]["n_fresh"]
        assert r["n_200"] == sch[d]["n_stale"]
        assert r["n_conditional"] == sch[d]["n_crawled_pages"]
        assert r["bytes_saved"] == want_saved.get(d, 0)
        assert r["bytes_transferred"] == want_moved.get(d, 0)
    assert sum(r["bytes_saved"] for r in rev.values()) > 0
    assert sum(r["bytes_transferred"] for r in rev.values()) > 0


def test_etag_revalidation_is_the_diff_partition_and_lastmod_lies(spark):
    """r13 verdict item 3: the fingerprint-validator 304 set EQUALS
    crawl_diff's unchanged partition (RFC 9110 strong-validator
    semantics — the declarative spec), the 410 set equals its removed
    partition, and BOTH lastmod-disagreement classes are live: pages
    whose lastmod claims stale while the content is unchanged (the
    lie — the fingerprint saves their bytes) and pages whose lastmod
    claims fresh while the content CHANGED (the miss — lastmod alone
    would serve stale data)."""
    from pyspark.sql import functions as F

    from toymapreduce_go_spark.operators.sitemaps import (
        FETCH_DAY_MULT, etag_revalidation)
    from toymapreduce_go_spark.operators.urls import (
        CHANGED_MODS, NEW_EXCLUDE, OLD_EXCLUDE, crawl_diff,
        synthesize_snapshot)

    docs = load_table(spark, SF_DIR, "documents")
    out = {r["domain"]: r for r in etag_revalidation(docs).collect()}
    d = crawl_diff(
        synthesize_snapshot(docs, exclude_page_mod=OLD_EXCLUDE),
        synthesize_snapshot(docs, exclude_page_mod=NEW_EXCLUDE,
                            change_mods=CHANGED_MODS)).collect()
    by_status: dict[str, set] = {}
    for r in d:
        by_status.setdefault(r["status"], set()).add(r["canon"])
    # per-domain counts reconcile with the diff partition exactly
    import re

    def doms(canons):
        c: dict[str, int] = {}
        for x in canons:
            dom = re.search(r"://([^/]*)/", x).group(1)
            c[dom] = c.get(dom, 0) + 1
        return c

    assert {d_: r["n_304"] for d_, r in out.items() if r["n_304"]} \
        == doms(by_status["unchanged"])
    assert {d_: r["n_200"] for d_, r in out.items() if r["n_200"]} \
        == doms(by_status["changed"])
    assert {d_: r["n_gone"] for d_, r in out.items() if r["n_gone"]} \
        == doms(by_status["removed"])
    # conditional requests = everything we hold (added is discovery)
    for d_, r in out.items():
        assert r["n_conditional"] == r["n_304"] + r["n_200"] \
            + r["n_gone"]
    # both disagreement classes are LIVE and exact: recompute from
    # page arithmetic (lastmod stale iff page%365 > (page*7)%365)
    n_pages = docs.count() // 4 + (docs.count() % 4 > 0)
    lied = missed = 0
    for p in range(n_pages):
        if p % 9 == OLD_EXCLUDE or p % 9 == NEW_EXCLUDE or p % 3 == 0:
            continue
        lm_stale = (p % 365) > (p * FETCH_DAY_MULT) % 365
        content_changed = (p % 9) in CHANGED_MODS
        if lm_stale and not content_changed:
            lied += 1
        if not lm_stale and content_changed:
            missed += 1
    assert sum(r["n_lastmod_lied"] for r in out.values()) == lied > 0
    assert sum(r["n_lastmod_missed"] for r in out.values()) \
        == missed > 0
    # the fingerprint's bandwidth win is visible: bytes saved on the
    # 304 set include every lied page's body
    assert all(r["bytes_saved"] >= 0 for r in out.values())
    assert sum(r["bytes_saved"] for r in out.values()) > 0
