"""HTTP redirect resolution — the crawl-frontier surface every real
crawl hits that the rest of the URL stack assumes away: servers answer
``301/308`` with a ``Location`` and the page's identity moves. A
frontier that keys state by the OLD canonical URL re-fetches moved
content forever and splits dedup groups across the move; production
pipelines resolve redirect CHAINS to their terminal target (bounded
hops — RFC 9110 §15.4 warns clients MUST detect cycles; curl/browsers
budget ~5-20 hops) and re-key on the final URL.

Reference scope: none (the reference ingests local files); this is the
crawl-ingest extension row next to ``urls.py``, built on public
semantics (RFC 9110 §15.4 redirection, the canonical bounded-follow +
loop-flag behavior of every HTTP client).

Fixture synthesis (the ``urls.py`` convention — deterministic,
replayed by the DuckDB twin): hosts ``m % 8 == 6`` have MOVED — every
page's canonical URL 301s to the same path on ``site<m>m`` (hop 1),
and even pages moved TWICE: ``site<m>m`` 301s on to ``site<m>mm``
(hop 2, terminal) — so chains of length 1 and 2 both exist. One loop
is planted per moved host (``/loop/a`` ↔ ``/loop/b``) — the case the
resolver must FLAG, never follow forever and never silently resolve.

100 TB shape: the redirect edge set is page-sized metadata (a crawl
log column, never the corpus); resolution is ``REDIRECT_MAX_HOPS``
self-joins of that page-sized frame (each hop one broadcast-scale
equi-join, localCheckpoint between hops — the iterative-loop lineage
discipline), and ``apply_redirects`` re-keys any canon-carrying frame
with ONE left broadcast join. The only corpus touch is the shared
page-universe distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.checksum import CKSUM_MOD
from .urls import canonicalize_url, synth_url_expr, url_domain

REDIRECT_MAX_HOPS = 4   # follow budget; anything longer flags as loop
MOVED_HOST_MOD = 6      # hosts m % 8 == 6 have moved


def _moved_url(suffix: str) -> "F.Column":
    """http://www.site<m><suffix>.example.com/articles/item<p>?a=1&b=2
    for the current (page, m) row."""
    return F.concat(
        F.lit("http://www.site"), F.col("m").cast("string"),
        F.lit(suffix), F.lit(".example.com/articles/item"),
        F.col("page").cast("string"), F.lit("?a=1&b=2"))


def synthesize_redirects(documents: DataFrame) -> DataFrame:
    """(src, dst): the redirect edge list a crawl log yields — moved
    hosts' pages 301 to ``site<m>m`` (all) and on to ``site<m>mm``
    (even pages), plus the planted 2-cycle per moved host. Page-sized
    (one corpus distinct, the sitemap convention)."""
    pages = (documents
             .select(F.expr("doc_id div 4").cast("long").alias("page"))
             .distinct()
             .withColumn("m", F.pmod(F.col("page"), F.lit(16)))
             .filter(F.pmod(F.col("m"), F.lit(8)) == MOVED_HOST_MOD))
    hop1 = pages.select(
        canonicalize_url(F.concat(
            F.lit("http://www.site"), F.col("m").cast("string"),
            F.lit(".example.com/articles/item"),
            F.col("page").cast("string"), F.lit("?a=1&b=2")))
        .alias("src"),
        _moved_url("m").alias("dst"))
    hop2 = (pages.filter(F.pmod(F.col("page"), F.lit(2)) == 0)
            .select(_moved_url("m").alias("src"),
                    _moved_url("mm").alias("dst")))
    hosts = pages.select("m").distinct()
    la = F.concat(F.lit("http://www.site"), F.col("m").cast("string"),
                  F.lit(".example.com/loop/a"))
    lb = F.concat(F.lit("http://www.site"), F.col("m").cast("string"),
                  F.lit(".example.com/loop/b"))
    loops = (hosts.select(la.alias("src"), lb.alias("dst"))
             .unionByName(hosts.select(lb.alias("src"),
                                       la.alias("dst"))))
    return hop1.unionByName(hop2).unionByName(loops)


def resolve_redirects(edges: DataFrame,
                      max_hops: int = REDIRECT_MAX_HOPS) -> DataFrame:
    """(src, final, hops, looped): every redirect SOURCE followed to
    its terminal URL (one with no outgoing edge) within ``max_hops``.
    ``looped`` marks sources that revisit themselves or exhaust the
    budget — flagged, never silently dropped or half-resolved (the
    RFC 9110 §15.4 client obligation). Each hop is one equi-join of
    the page-sized edge frame against itself; ``finished`` rows stop
    participating."""
    cur = edges.select(
        "src", F.col("dst").alias("final"),
        F.lit(1).alias("hops"),
        (F.col("dst") == F.col("src")).alias("looped"))
    for _ in range(1, max_hops):
        nxt = edges.select(F.col("src").alias("final"),
                           F.col("dst").alias("nxt"))
        cur = (cur.join(nxt, "final", "left")
               .select(
                   "src",
                   F.coalesce("nxt", "final").alias("final"),
                   F.when(F.col("nxt").isNotNull() & ~F.col("looped"),
                          F.col("hops") + 1).otherwise(F.col("hops"))
                   .alias("hops"),
                   (F.col("looped")
                    | (F.col("nxt").eqNullSafe(F.col("src"))))
                   .alias("looped"))
               .localCheckpoint())
    # budget exhaustion: a final that STILL has an outgoing edge never
    # terminated within max_hops — flag it like a loop
    more = edges.select(F.col("src").alias("final"),
                        F.lit(True).alias("_more"))
    return (cur.join(more.distinct(), "final", "left")
            .select("src", "final", "hops",
                    (F.col("looped") | F.coalesce("_more", F.lit(False)))
                    .alias("looped")))


def apply_redirects(frame: DataFrame,
                    resolved: DataFrame) -> DataFrame:
    """Re-key any frame carrying ``canon`` on the redirect-resolved
    FINAL url (non-redirected canons pass through; looped sources are
    left on their original canon — a crawler refuses to follow them,
    so their state keys must not move). ONE left broadcast join — the
    resolved frame is page-sized."""
    mapping = (resolved.filter(~F.col("looped"))
               .select(F.col("src").alias("canon"),
                       F.col("final").alias("_final")))
    return (frame.join(F.broadcast(mapping), "canon", "left")
            .withColumn("canon", F.coalesce("_final", "canon"))
            .drop("_final"))


def redirect_stats(documents: DataFrame) -> DataFrame:
    """The registered rollup: per SOURCE domain — redirected URLs,
    resolved-within-budget count, loop count, the longest chain, and a
    (src-hash × (1 + hops) × final-hash) mod-prime checksum pinning
    every source's exact terminal URL, hop count, and loop verdict.
    Bounded by domains."""
    r = resolve_redirects(synthesize_redirects(documents))
    h = lambda c: F.pmod(  # noqa: E731 — local twin of the shared hash
        F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long"),
        F.lit(CKSUM_MOD))
    term = F.pmod(
        F.pmod(h("src") * (F.lit(1) + F.col("hops")), F.lit(CKSUM_MOD))
        * F.when(F.col("looped"), F.lit(1)).otherwise(h("final") + 1),
        F.lit(CKSUM_MOD))
    return (r.withColumn("domain", url_domain(F.col("src")))
            .groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_redirected"),
                 F.sum((~F.col("looped")).cast("long"))
                 .alias("n_resolved"),
                 F.sum(F.col("looped").cast("long")).alias("n_loops"),
                 F.max(F.when(~F.col("looped"), F.col("hops"))
                       .otherwise(F.lit(0))).alias("max_hops"),
                 F.sum(term).alias("redirect_checksum"))
            .orderBy("domain"))


def redirected_url_dedup(documents: DataFrame) -> DataFrame:
    """The composition redirects exist for: URL-level exact dedup
    keyed on the redirect-resolved FINAL canonical URL — fetches of a
    moved page through its old host collapse with the new host's page
    into ONE frontier key (plain ``url_dedup_docs`` keeps them apart).
    Returns (canon, doc_id, n_occurrences) like ``url_dedup_docs``."""
    u = documents.select(
        "doc_id",
        canonicalize_url(synth_url_expr()).alias("canon"))
    resolved = resolve_redirects(synthesize_redirects(documents))
    u = apply_redirects(u, resolved)
    return (u.groupBy("canon")
            .agg(F.min("doc_id").alias("doc_id"),
                 F.count(F.lit(1)).alias("n_occurrences"))
            .orderBy("canon"))
