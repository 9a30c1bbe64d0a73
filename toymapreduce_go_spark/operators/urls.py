"""URL canonicalization + domain-level hygiene — where crawl dedup
actually STARTS: before any content hash runs, the frontier/dedup
layer must recognize that ``HTTP://WWW.Site.COM:80/a?b=2&a=1#x``,
``http://www.site.com/a?a=1&b=2&utm_source=feed`` and
``http://www.site.com/a?a=1&fbclid=...&b=2`` are the same page.

Reference scope: the reference ingests local text files
(``play.sh:62-99``) and has no URL layer; this is the crawl-ingest
extension row next to ``html_extract``, built on public normalization
rules (RFC 3986 §6 syntax-based normalization + the universal
tracking-parameter strip): lowercase scheme and host, drop the
fragment, drop default ports (80/http, 443/https), empty path → '/',
remove tracking parameters (``utm_*``, ``fbclid``, ``gclid``,
``msclkid``, ``mc_eid``), sort the surviving query parameters
byte-lexicographically.

Because the fixture tables carry no URL column, the operator follows
the ``multimodal/binary.py`` convention: a deterministic MESSY url is
synthesized per document — four raw variants (default port + reversed
params / uppercase scheme+host + fragment / utm-laden / fbclid-laden)
that all canonicalize to the same page URL, with consecutive doc_id
quads sharing a page — so canonicalization provably COLLAPSES
variants, and the DuckDB oracle replays synthesis + canonicalization
exactly.

100 TB shape: everything here is a scan-side expression chain
(regexp_extract / split / filter / array_sort / concat) in whole-stage
codegen — zero Python, zero joins; the only shuffle is the final
domain rollup (count-combinable, keyed by registrable domain — a
bounded key space in practice). URL-level exact dedup is the same
min-agg winner rule as ``exact_dedup``: no window, a viral URL is one
combinable group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.checksum import CKSUM_MOD

# tracking parameters stripped during canonicalization (shared with
# the DuckDB oracle through TRACKING_RE — one literal, two engines)
TRACKING_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid)="


def synthesize_urls(documents: DataFrame) -> DataFrame:
    """(doc_id, url): a deterministic messy URL per document. doc_id
    quads (div 4) share a page — same host, same path — and doc_id % 4
    picks the raw variant, so every page arrives as four DIFFERENT raw
    strings that canonicalize identically; (div 4) % 16 spreads pages
    over 16 hosts for the domain rollup."""
    page = F.col("doc_id").cast("long")
    item = F.expr("doc_id div 4").cast("long")
    v = F.pmod(page, F.lit(4))
    base = F.concat(F.lit("www.site"),
                    F.pmod(item, F.lit(16)).cast("string"),
                    F.lit(".example.com"))
    path = F.concat(F.lit("/articles/item"), item.cast("string"))
    url = (
        F.when(v == 0, F.concat(
            F.lit("http://"), base, F.lit(":80"), path,
            F.lit("?b=2&a=1")))
        .when(v == 1, F.concat(
            F.lit("HTTP://"), F.upper(base), path,
            F.lit("?a=1&b=2#section-2")))
        .when(v == 2, F.concat(
            F.lit("http://"), base, path,
            F.lit("?utm_source=feed&a=1&b=2&utm_campaign=spring")))
        .otherwise(F.concat(
            F.lit("http://"), base, path,
            F.lit("?a=1&fbclid=x"), page.cast("string"),
            F.lit("&b=2"))))
    return documents.select("doc_id", url.alias("url"))


def canonicalize_url(col) -> "F.Column":
    """RFC 3986 syntax normalization + tracking-param strip + sorted
    query, as one scan-side expression chain. Unparseable inputs (no
    scheme) pass through fragment-stripped but otherwise untouched —
    fail-open, never fail-silent-to-empty."""
    nofrag = F.regexp_replace(col, "#.*$", "")
    scheme = F.lower(F.regexp_extract(
        nofrag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(nofrag, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = F.regexp_extract(hostport, r"^([^:]*)", 1)
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    keep_port = (
        F.when((port == "") | ((scheme == "http") & (port == "80"))
               | ((scheme == "https") & (port == "443")), F.lit(""))
        .otherwise(F.concat(F.lit(":"), port)))
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_RE)))
    qcanon = F.when(F.size(params) > 0,
                    F.concat(F.lit("?"), F.array_join(params, "&"))
                    ).otherwise(F.lit(""))
    return F.when(
        scheme == "", nofrag
    ).otherwise(F.concat(scheme, F.lit("://"), host, keep_port,
                         path, qcanon))


def url_domain(col) -> "F.Column":
    """The lowercased host of a canonical URL (port excluded)."""
    return F.regexp_extract(F.lower(col), r"^[a-z][a-z0-9+.-]*://([^/:?]*)",
                            1)


def url_stats(documents: DataFrame) -> DataFrame:
    """Per-domain hygiene rollup over synthesized messy URLs:
    (domain, n_urls, n_raw_distinct, n_canonical, n_dup_urls,
    canon_checksum). ``n_dup_urls = n_urls − n_canonical`` is exactly
    how many fetches canonicalization deduplicates away;
    ``canon_checksum`` folds the portable hash of every DISTINCT
    canonical URL so the value-hash pins each normalization rule
    (a missed tracking param or unsorted query changes it)."""
    u = synthesize_urls(documents).select(
        "doc_id", "url", canonicalize_url(F.col("url")).alias("canon"))
    u = u.select(
        "doc_id", "url", "canon", url_domain(F.col("canon")).alias("domain"))
    per_canon = (u.groupBy("domain", "canon")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.count_distinct("url").alias("nraw")))
    h = F.pmod(F.conv(F.substring(F.md5("canon"), 1, 15), 16, 10)
               .cast("long"), F.lit(CKSUM_MOD))
    return (per_canon.groupBy("domain")
            .agg(F.sum("n").alias("n_urls"),
                 F.sum("nraw").alias("n_raw_distinct"),
                 F.count(F.lit(1)).alias("n_canonical"),
                 (F.sum("n") - F.count(F.lit(1))).alias("n_dup_urls"),
                 F.sum(h).alias("canon_checksum"))
            .orderBy("domain"))


def url_dedup_docs(urls: DataFrame) -> DataFrame:
    """URL-level exact dedup: one surviving doc per canonical URL —
    the crawl-frontier "have we fetched this page" gate. Winner is
    min(doc_id) per canonical (ONE count-combinable agg, the
    exact_dedup rule — no window, a viral URL is one combinable
    group). Returns (canon, doc_id, n_occurrences)."""
    u = urls.select(
        "doc_id", canonicalize_url(F.col("url")).alias("canon"))
    return (u.groupBy("canon")
            .agg(F.min("doc_id").alias("doc_id"),
                 F.count(F.lit(1)).alias("n_occurrences"))
            .orderBy("canon"))
