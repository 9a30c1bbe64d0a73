"""Sitemap front door — the OTHER discovery channel a crawler runs
next to link extraction (sitemaps.org protocol, RFC-referenced by
RFC 9309 §6): each host publishes a ``sitemap.xml`` enumerating its
pages with last-modification dates, and a frontier seeds from it to
reach ORPHAN pages no crawled page links to (the link frontier in
``frontier.py`` provably cannot discover a page whose in-linkers are
all uncrawled — the compose test pins a real such page).

Following the container convention (``html_extract.py`` /
``pdf_extract.py`` / ``warc_extract.py``): structurally REAL sitemap
XML is synthesized deterministically — urlset header, one
``<url><loc>…</loc><lastmod>…</lastmod></url>`` entry per page in
page order, with the loc carrying the messy variant-0 raw URL
(``:80`` default port, unsorted query, ``&`` escaped as ``&amp;`` —
XML requires it, so the parser must unescape before canonicalizing) —
then parsed BACK scan-side (``regexp_extract_all`` + explode + the
shared RFC 3986 canonicalization), never trusting the synthesis.

The DuckDB twin is deliberately INDEPENDENT: it never parses XML — it
derives each page's canonical URL from the URL-quad table and the
lastmod offset from the page id, so a value-hash match proves the
whole synthesize → escape → parse → unescape → canonicalize round
trip, not that two engines ran the same string code.

100 TB shape: sitemaps are host-sized metadata (16 rows on the
fixture; millions of rows — still metadata — on a real crawl); the
only corpus-touching step is the one distinct over page ids, which is
count-combinable. Parsing explodes host-sized XML, canonicalization
is scan-side, and the rollup groups by host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.checksum import CKSUM_MOD
from .frontier import FRONTIER_MOD
from .urls import (canonicalize_url, deny_gate, parse_sitemap_locs,
                   robots_gate_frame, synthesize_robots)

SITEMAP_EPOCH = "2025-01-01"   # lastmod = epoch + (page % 365) days
_SM_HEADER = ('<?xml version="1.0" encoding="UTF-8"?>\n<urlset '
              'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n')
_ENTRY_RE = r"<url><loc>([^<]*)</loc><lastmod>([^<]*)</lastmod></url>"


def synthesize_sitemaps(documents: DataFrame) -> DataFrame:
    """(domain, xml): one structurally real flat sitemap per host,
    entries in page order — the shared page/entry builders
    (``_host_pages`` / ``_page_entry`` / ``_urlset_xml``) grouped per
    host instead of per (host, child). The page universe is ONE
    count-combinable distinct over ``doc_id div 4``; everything after
    is host-sized."""
    e = _host_pages(documents).select(
        "domain",
        F.struct("page", _page_entry().alias("entry")).alias("s"))
    return (e.groupBy("domain")
            .agg(_urlset_xml(F.array_sort(F.collect_list("s")))
                 .alias("xml")))


def sitemap_entries(sitemaps: DataFrame) -> DataFrame:
    """Parse (domain, xml) → (domain, canon, lastmod): explode the
    entry regex matches, XML-unescape the loc, canonicalize with the
    shared RFC 3986 chain. Scan-side over host-sized input."""
    e = sitemaps.select(
        "domain",
        F.explode(F.expr(
            f"regexp_extract_all(xml, '{_ENTRY_RE}', 0)")).alias("ent"))
    # XML unescape — &amp; LAST so escaped sequences never double-decode
    loc = ("replace(replace(replace("
           "regexp_extract(ent, '<loc>([^<]*)</loc>', 1), "
           "'&lt;', '<'), '&gt;', '>'), '&amp;', '&')")
    return e.select(
        "domain", canonicalize_url(loc).alias("canon"),
        F.regexp_extract("ent", r"<lastmod>([^<]*)</lastmod>", 1)
        .alias("lastmod"))


# ---------------------------------------------------------------------------
# Sitemap INDEX files — the production shape: the protocol caps a
# urlset at 50,000 entries / 50 MB (sitemaps.org §"Using sitemap index
# files"), so any real host publishes a <sitemapindex> whose
# <sitemap><loc> entries point at child sitemaps, usually gzipped.
# Synthesized in miniature (SITEMAP_CHILD_CAP entries per child so the
# cap BINDS on the fixture), children gzip-compressed (RFC 1952, CRC
# validated on inflate — corruption raises, never parses partially),
# and parsed back through a genuine two-level round trip: index XML →
# child locs → join to the child files ON THE PARSED LOC — a mis-built
# or mis-parsed loc loses its child and the equality-with-flat pin
# catches it.

SITEMAP_CHILD_CAP = 4   # miniature stand-in for the 50k-entry cap
_SI_HEADER = ('<?xml version="1.0" encoding="UTF-8"?>\n<sitemapindex '
              'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n')
_SI_ENTRY_RE = r"<sitemap><loc>([^<]*)</loc></sitemap>"


def _host_pages(documents: DataFrame) -> DataFrame:
    """(domain, page, child): the page universe with its host and
    child-sitemap assignment — pages on one host are m, m+16, m+32, …
    so ``(page div 16) div CAP`` chunks them in page order without a
    window (scan-side; the distinct is the one corpus touch)."""
    pages = documents.select(
        F.expr("doc_id div 4").cast("long").alias("page")).distinct()
    dom = F.concat(F.lit("www.site"),
                   F.pmod(F.col("page"), F.lit(16)).cast("string"),
                   F.lit(".example.com"))
    return pages.select(
        dom.alias("domain"), "page",
        F.expr(f"(page div 16) div {SITEMAP_CHILD_CAP}").alias("child"))


def _urlset_xml(entries_col) -> "F.Column":
    """urlset XML from a sorted array of (page, entry) structs — the
    ONE body shared by the flat synthesis and the index children."""
    return F.concat(
        F.lit(_SM_HEADER),
        F.array_join(F.transform(entries_col, lambda s: s["entry"]),
                     "\n"),
        F.lit("\n</urlset>\n"))


def _page_entry() -> "F.Column":
    """One <url> entry for the current (page) row — messy variant-0
    loc (&amp;-escaped), lastmod from the page id."""
    loc = F.concat(F.lit("http://"), F.col("domain"),
                   F.lit(":80/articles/item"),
                   F.col("page").cast("string"), F.lit("?b=2&amp;a=1"))
    lastmod = F.date_format(
        F.date_add(F.to_date(F.lit(SITEMAP_EPOCH)),
                   F.pmod(F.col("page"), F.lit(365)).cast("int")),
        "yyyy-MM-dd")
    return F.concat(F.lit("<url><loc>"), loc,
                    F.lit("</loc><lastmod>"), lastmod,
                    F.lit("</lastmod></url>"))


def _gzip_xml(batches):
    import gzip
    for pdf in batches:
        pdf = pdf.copy()
        pdf["xml_gz"] = [gzip.compress(x.encode(), 6, mtime=0)
                         for x in pdf["xml"]]
        yield pdf[["domain", "child", "xml_gz"]]


def _gunzip_xml(batches):
    import gzip
    import zlib
    for pdf in batches:
        pdf = pdf.copy()
        xs = []
        for d, c, g in zip(pdf["domain"], pdf["child"], pdf["xml_gz"]):
            try:
                xs.append(gzip.decompress(bytes(g)).decode())
            except (OSError, zlib.error, EOFError) as e:
                # gzip.BadGzipFile (bad magic / CRC) is an OSError
                raise ValueError(
                    f"sitemap_index: corrupt gzip child sitemap "
                    f"{c} of {d}: {e}") from None
        pdf["xml"] = xs
        yield pdf[["domain", "child", "xml"]]


def synthesize_sitemap_children(documents: DataFrame,
                                pages: DataFrame | None = None
                                ) -> DataFrame:
    """(domain, child, xml_gz): the gzipped child sitemaps, at most
    ``SITEMAP_CHILD_CAP`` entries each, entries in page order (the
    urlset body is ``_urlset_xml`` — shared with the flat form).
    ``pages`` (a ``_host_pages`` frame) lets the caller share ONE
    corpus-distinct across the index and the children."""
    e = (pages if pages is not None
         else _host_pages(documents)).select(
        "domain", "child", F.struct("page", _page_entry().alias("entry"))
        .alias("s"))
    xml = (e.groupBy("domain", "child")
           .agg(_urlset_xml(F.array_sort(F.collect_list("s")))
                .alias("xml")))
    return xml.mapInPandas(
        _gzip_xml, "domain string, child long, xml_gz binary")


def synthesize_sitemap_index(documents: DataFrame,
                             pages: DataFrame | None = None
                             ) -> DataFrame:
    """(domain, xml): one <sitemapindex> per host enumerating its
    child sitemap locs (``http://<host>/sitemaps/sitemap-<k>.xml.gz``)
    in child order. ``pages`` as in ``synthesize_sitemap_children``."""
    ch = (pages if pages is not None
          else _host_pages(documents)).select("domain",
                                              "child").distinct()
    ent = F.concat(F.lit("<sitemap><loc>http://"), F.col("domain"),
                   F.lit("/sitemaps/sitemap-"),
                   F.col("child").cast("string"),
                   F.lit(".xml.gz</loc></sitemap>"))
    e = ch.select("domain", F.struct("child", ent.alias("entry"))
                  .alias("s"))
    return (e.groupBy("domain")
            .agg(F.concat(
                F.lit(_SI_HEADER),
                F.array_join(F.transform(
                    F.array_sort(F.collect_list("s")),
                    lambda s: s["entry"]), "\n"),
                F.lit("\n</sitemapindex>\n")).alias("xml")))


def sitemap_index_entries(index: DataFrame,
                          children: DataFrame) -> DataFrame:
    """The two-level parse: explode the index's <sitemap><loc> hits,
    recover (host, child) FROM THE PARSED LOC, join to the gzipped
    child files on that parsed key (host-sized both sides — the join
    is metadata-scale), inflate, and run the shared urlset parser.
    Output = ``sitemap_entries``'s (domain, canon, lastmod)."""
    locs = index.select(F.explode(F.expr(
        f"regexp_extract_all(xml, '{_SI_ENTRY_RE}', 1)")).alias("loc"))
    locs = locs.select(
        F.regexp_extract("loc", r"^http://([^/]*)/", 1).alias("domain"),
        F.regexp_extract("loc", r"/sitemap-(\d+)\.xml\.gz$", 1)
        .cast("long").alias("child"))
    j = locs.join(children, ["domain", "child"])
    xml = j.mapInPandas(_gunzip_xml,
                        "domain string, child long, xml string")
    return sitemap_entries(xml.select("domain", "xml"))


ROBOTS_INDEX_LOC_SUFFIX = "/sitemaps/index.xml"


def robots_sitemap_locs(documents: DataFrame) -> DataFrame:
    """(domain, sitemap_loc): sitemap locations DISCOVERED from each
    host's robots.txt ``Sitemap:`` lines (sitemaps.org / RFC 9309 §6 —
    the production discovery channel; a host whose robots declares no
    sitemap is simply never fetched, and a host whose robots.txt
    fetch answered 5xx declared nothing readable — its sitemap is
    never discovered). Domain-sized."""
    return (synthesize_robots(documents)
            .filter(F.col("status") < 500)
            .select(
                "domain",
                F.explode(parse_sitemap_locs("robots_txt"))
                .alias("sitemap_loc")))


def discovered_sitemap_indexes(documents: DataFrame,
                               pages: DataFrame | None = None
                               ) -> DataFrame:
    """(domain, xml): the sitemap-index files a crawler actually
    FETCHES — the robots-declared locations joined to the synthesized
    index files ON THE LOC (the index file's address is
    ``http://<host>{ROBOTS_INDEX_LOC_SUFFIX}``): a host whose robots
    omits the Sitemap line, or declares a loc nothing serves, fetches
    nothing — discovery is load-bearing, not decorative. Both sides
    are host-sized metadata."""
    files = synthesize_sitemap_index(documents, pages=pages).withColumn(
        "_loc", F.concat(F.lit("http://"), F.col("domain"),
                         F.lit(ROBOTS_INDEX_LOC_SUFFIX)))
    # distinct: a robots.txt may declare the same Sitemap line twice
    # (review r13 — a duplicate loc must not fetch/count the host's
    # entries twice); host-sized frame, free
    locs = robots_sitemap_locs(documents).select(
        F.col("sitemap_loc").alias("_loc")).distinct()
    return (files.join(F.broadcast(locs), "_loc")
            .select("domain", "xml"))


def sitemap_index_stats(documents: DataFrame) -> DataFrame:
    """The registered rollup over the INDEX form, now discovered via
    robots.txt (r12 verdict item 5): robots ``Sitemap:`` lines name
    each host's index loc, the fetch joins ON THAT PARSED LOC, then
    the two-level index → gzipped-children parse. Output identical to
    ``sitemap_extract_stats`` (the discovery hop and child split are
    transparent to every downstream value — pinned in pytest along
    with the cap binding and the loc round trip), so it inherits the
    same XML-free DuckDB twin. The page universe is computed ONCE and
    localCheckpoint-ed (page-sized) so the corpus-distinct — the
    module's one corpus touch — does not run twice for the two
    synthesizers (review r12)."""
    hp = _host_pages(documents).localCheckpoint(eager=False)
    ent = sitemap_index_entries(
        discovered_sitemap_indexes(documents, pages=hp),
        synthesize_sitemap_children(documents, pages=hp))
    return _sitemap_rollup(ent)


def sitemap_seeds(documents: DataFrame,
                  redirects: "DataFrame | bool" = True,
                  rules: "DataFrame | None" = None,
                  entries: "DataFrame | None" = None) -> DataFrame:
    """(canon, domain, lastmod): sitemap-discovered UNCRAWLED pages
    surviving the same gates the link frontier applies — structurally
    the SAME gates (``urls.deny_gate`` / ``urls.robots_gate_frame``),
    so the two channels cannot silently diverge. Page-sized.

    ``redirects`` composes redirect resolution exactly like the link
    channel (``frontier.frontier_candidates``): the sitemap lists the
    OLD loc, the fetch of it is gated at the discovered host, a
    permanent chain re-keys the seed to the terminal URL, and the
    terminal host's gates apply — so a moved orphan page seeds the
    frontier ONCE, at the host that actually serves it.

    ``rules`` / ``entries`` let a multi-channel plan (fetch_list)
    share one ``urls.shared_robots_rules`` frame across its gates and
    one parsed-entries frame with the recrawl channel (the module's
    one corpus distinct runs once per cycle, not once per channel)."""
    ent = (sitemap_entries(synthesize_sitemaps(documents))
           if entries is None else entries)
    item = F.regexp_extract("canon", r"/articles/item(\d+)", 1)
    ent = ent.filter(F.pmod(item.cast("long"),
                            F.lit(FRONTIER_MOD)) == 0)
    seeds = robots_gate_frame(deny_gate(ent), documents, rules=rules)
    if redirects is not False:
        from .redirects import fixture_resolved_redirects, rekey_on_final
        resolved = (fixture_resolved_redirects(documents)
                    if redirects is True else redirects)
        seeds = (rekey_on_final(seeds, resolved)
                 .groupBy("canon", "domain")
                 .agg(F.min("lastmod").alias("lastmod")))
        seeds = robots_gate_frame(deny_gate(seeds), documents,
                                  rules=rules)
    return seeds


def sitemap_extract_stats(documents: DataFrame) -> DataFrame:
    """The registered rollup: per host — entry count, distinct pages,
    uncrawled count, the newest lastmod, and a (canon-hash ×
    (1 + lastmod-offset)) mod-prime checksum — so the value-hash pins
    every parsed loc's canonicalization AND every lastmod's round trip
    through the XML. The twin derives both independently of the XML."""
    return _sitemap_rollup(sitemap_entries(synthesize_sitemaps(documents)))


def _sitemap_rollup(ent: DataFrame) -> DataFrame:
    """The per-host rollup over parsed (domain, canon, lastmod)
    entries — ONE definition shared by the flat and the sitemapindex
    forms (their equality is the index round trip's pin)."""
    off = F.datediff(F.to_date("lastmod"),
                     F.to_date(F.lit(SITEMAP_EPOCH)))
    item = F.regexp_extract("canon", r"/articles/item(\d+)", 1)
    canon_h = F.pmod(F.conv(F.substring(F.md5("canon"), 1, 15), 16, 10)
                     .cast("long"), F.lit(CKSUM_MOD))
    term = F.pmod(canon_h * (F.lit(1) + off.cast("long")),
                  F.lit(CKSUM_MOD))
    return (ent.groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_entries"),
                 F.count_distinct("canon").alias("n_pages"),
                 F.sum((F.pmod(item.cast("long"), F.lit(FRONTIER_MOD))
                        == 0).cast("long")).alias("n_uncrawled"),
                 F.max("lastmod").alias("max_lastmod"),
                 F.sum(term).alias("sitemap_checksum"))
            .orderBy("domain"))


# ---------------------------------------------------------------------------
# Recrawl scheduling — the freshness channel: the frontier decides
# which UNCRAWLED pages to fetch (frontier.py); this decides which
# already-crawled pages to RE-fetch. The sitemaps.org contract: a
# <lastmod> newer than the page's last fetch means the copy is stale.
# (crawl_diff then verifies what actually changed AFTER the refetch,
# and refresh_training_corpus re-curates only that delta — this
# operator closes the front of that loop.)

FETCH_DAY_MULT = 7   # fixture fetch day = (page * 7) % 365


def fetched_day_expr(page) -> "F.Column":
    """The fixture's deterministic last-fetch day offset for a crawled
    page (production reads this from the crawl log). Spread with a
    multiplier so lastmod (page % 365) lands on BOTH sides of it
    across the page universe — staleness is exercised, not vacuous."""
    return F.pmod(page * FETCH_DAY_MULT, F.lit(365))


def recrawl_gaps(documents: DataFrame,
                 entries: "DataFrame | None" = None) -> DataFrame:
    """(canon, domain, page, off, gap): every CRAWLED page listed in
    the parsed sitemaps with its lastmod day offset (``off``) and
    staleness gap (``gap`` = off − last-fetch day; strictly positive
    means stale). THE single definition of the recrawl staleness
    logic — ``recrawl_schedule`` rolls it up, the fetch list's
    recrawl channel filters ``gap > 0`` and ranks by it (r11 ADVICE:
    the two hand-kept copies were the same desync hazard the gates
    had). Host-sized after the one corpus distinct. ``entries`` lets
    the fetch list share one parsed-entries frame with the sitemap
    channel instead of re-running the distinct per channel."""
    ent = (sitemap_entries(synthesize_sitemaps(documents))
           if entries is None else entries)
    item = F.regexp_extract("canon", r"/articles/item(\d+)", 1) \
        .cast("long")
    ent = (ent.withColumn("page", item)
           .filter(F.pmod(F.col("page"), F.lit(FRONTIER_MOD)) != 0))
    off = F.datediff(F.to_date("lastmod"),
                     F.to_date(F.lit(SITEMAP_EPOCH))).cast("long")
    return ent.select(
        "canon", "domain", "page", off.alias("off"),
        (off - fetched_day_expr(F.col("page"))).alias("gap"))


def recrawl_revalidation(documents: DataFrame) -> DataFrame:
    """Conditional-request accounting for the recrawl channel — the
    bandwidth story behind HTTP revalidation (RFC 9110 §13.2.1 /
    §15.4.5): the fetcher re-requests every crawled sitemap page with
    ``If-Modified-Since: <last fetch>``; pages whose lastmod is not
    newer answer ``304 Not Modified`` (headers only — the body never
    crosses the wire), stale pages answer ``200`` with the full body.
    Per host: conditional requests issued, 304 vs 200 split,
    ``bytes_transferred`` (stale bodies actually fetched) and
    ``bytes_saved`` (fresh bodies the 304s avoided — at 100 TB this is
    most of a refresh cycle's bandwidth), plus a (canon-hash ×
    (1 + body-size)) checksum over the 304 set pinning every verdict
    AND every page's byte size. Page body size = the page's minimum
    document byte length (deterministic, min over the fetched
    variants — one count-combinable corpus agg, the module's second
    corpus touch; everything after is host-sized)."""
    gaps = recrawl_gaps(documents)
    sizes = (documents
             .groupBy(F.expr("doc_id div 4").cast("long").alias("page"))
             .agg(F.min(F.coalesce(F.octet_length("text"), F.lit(0)))
                  .alias("body_bytes")))
    g = gaps.join(sizes, "page")
    fresh = F.col("gap") <= 0
    canon_h = F.pmod(F.conv(F.substring(F.md5("canon"), 1, 15), 16, 10)
                     .cast("long"), F.lit(CKSUM_MOD))
    term = F.pmod(canon_h * (F.lit(1) + F.col("body_bytes")),
                  F.lit(CKSUM_MOD))
    return (g.groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_conditional"),
                 F.sum(fresh.cast("long")).alias("n_304"),
                 F.sum((~fresh).cast("long")).alias("n_200"),
                 F.sum(F.when(~fresh, F.col("body_bytes"))
                       .otherwise(F.lit(0))).alias("bytes_transferred"),
                 F.sum(F.when(fresh, F.col("body_bytes"))
                       .otherwise(F.lit(0))).alias("bytes_saved"),
                 F.sum(F.when(fresh, term).otherwise(F.lit(0)))
                 .alias("reval_checksum"))
            .orderBy("domain"))


def etag_revalidation(documents: DataFrame) -> DataFrame:
    """Fingerprint-validator revalidation (r13 verdict item 3) — the
    ``If-None-Match`` tier where the validator is the page's CONTENT
    fingerprint (exactly what a production ETag is), not the sitemap
    ``<lastmod>`` that ``recrawl_revalidation`` trusts — and real
    lastmod lies notoriously. The fetcher re-requests every page of
    the OLD crawl (the standard ``crawl_diff`` snapshot fixture) with
    the stored fingerprint; the server's verdict is definitionally
    ``crawl_diff``'s content partition (RFC 9110 §8.8.3 + §13.1.2:
    a strong validator matches iff the representation is the same):

        304  fingerprints equal   (diff: unchanged) — headers only
        200  fingerprints differ  (diff: changed)   — full body
        410  page no longer served (diff: removed)  — nothing held

    Per domain, next to the request/bytes split the rollup pins the
    two LASTMOD-DISAGREEMENT classes on the crawled pages where both
    validators exist: ``n_lastmod_lied`` (lastmod claims stale, the
    fingerprint says unchanged — bandwidth the lastmod validator
    wastes) and ``n_lastmod_missed`` (lastmod claims fresh while the
    content CHANGED — staleness the lastmod validator would serve).
    The fingerprint wins both by construction.

    100 TB shape: one full-outer diff on the page key (both
    snapshots bucket by canon at scale) + the page-size agg the
    module's 304 accounting already pays; everything after is
    host-sized."""
    from .urls import (CHANGED_MODS, NEW_EXCLUDE, OLD_EXCLUDE,
                       crawl_diff, synthesize_snapshot)
    old = synthesize_snapshot(documents, exclude_page_mod=OLD_EXCLUDE)
    new = synthesize_snapshot(documents, exclude_page_mod=NEW_EXCLUDE,
                              change_mods=CHANGED_MODS)
    # conditional requests go out for pages WE hold (the old crawl);
    # 'added' rows are discovery's job, not revalidation's
    d = crawl_diff(old, new).filter(F.col("status") != "added")
    page = F.regexp_extract("canon", r"/articles/item(\d+)", 1) \
        .cast("long")
    d = d.withColumn("page", page)
    sizes = (documents
             .groupBy(F.expr("doc_id div 4").cast("long").alias("page"))
             .agg(F.min(F.coalesce(F.octet_length("text"), F.lit(0)))
                  .alias("body_bytes")))
    g = d.join(sizes, "page")
    is_304 = F.col("status") == "unchanged"
    is_200 = F.col("status") == "changed"
    is_gone = F.col("status") == "removed"
    crawled = F.pmod(F.col("page"), F.lit(FRONTIER_MOD)) != 0
    lastmod_stale = (F.pmod(F.col("page"), F.lit(365))
                     > fetched_day_expr(F.col("page")))
    canon_h = F.pmod(F.conv(F.substring(F.md5("canon"), 1, 15), 16, 10)
                     .cast("long"), F.lit(CKSUM_MOD))
    term = F.pmod(canon_h * (F.lit(1) + F.col("body_bytes")),
                  F.lit(CKSUM_MOD))
    return (g.groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_conditional"),
                 F.sum(is_304.cast("long")).alias("n_304"),
                 F.sum(is_200.cast("long")).alias("n_200"),
                 F.sum(is_gone.cast("long")).alias("n_gone"),
                 F.sum((is_304 & crawled & lastmod_stale).cast("long"))
                 .alias("n_lastmod_lied"),
                 F.sum((is_200 & crawled & ~lastmod_stale).cast("long"))
                 .alias("n_lastmod_missed"),
                 F.sum(F.when(is_200, F.col("body_bytes"))
                       .otherwise(F.lit(0))).alias("bytes_transferred"),
                 F.sum(F.when(is_304, F.col("body_bytes"))
                       .otherwise(F.lit(0))).alias("bytes_saved"),
                 F.sum(F.when(is_304, term).otherwise(F.lit(0)))
                 .alias("etag_checksum"))
            .orderBy("domain"))


def recrawl_schedule(documents: DataFrame) -> DataFrame:
    """The registered rollup: per host — crawled pages listed in the
    sitemap, stale pages (lastmod strictly newer than the last fetch),
    fresh pages, and a (canon-hash × (1 + lastmod-offset)) mod-prime
    checksum over the STALE set, so the value-hash pins every
    staleness verdict. Everything runs on the host-sized parsed
    sitemap (the corpus is touched once for the page universe);
    uncrawled pages are the frontier's job and are excluded here."""
    ent = recrawl_gaps(documents)
    off = F.col("off")
    stale = F.col("gap") > 0
    canon_h = F.pmod(F.conv(F.substring(F.md5("canon"), 1, 15), 16, 10)
                     .cast("long"), F.lit(CKSUM_MOD))
    term = F.pmod(canon_h * (F.lit(1) + off), F.lit(CKSUM_MOD))
    return (ent.groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_crawled_pages"),
                 F.sum(stale.cast("long")).alias("n_stale"),
                 F.sum((~stale).cast("long")).alias("n_fresh"),
                 F.sum(F.when(stale, term).otherwise(F.lit(0)))
                 .alias("stale_checksum"))
            .orderBy("domain"))
