"""Crawl-frontier scheduling — the capstone that composes the crawl
suite into the decision a crawler actually makes each cycle: *which
uncrawled URLs to fetch next, in what order, under which politeness
budget*. The pieces are all existing first-class operators — the
synthesized link graph + integer PageRank (``linkgraph.py``), RFC 3986
canonicalization, the domain deny list, and the RFC 9309 robots gate
(``urls.py``) — wired in the order a production frontier wires them
(Mercator-style: discover → dedup → gate → prioritize → per-host
budget; Heydon & Najork 1999).

Fixture semantics (everything deterministic and DuckDB-replayable):

- the crawler has fetched pages ``page % FRONTIER_MOD != 0``
  (page = ``doc_id div 4`` — the URL-quad key from ``urls.py``);
  outlinks are only known for FETCHED pages, so frontier edges keep
  crawled sources only,
- candidates are link TARGETS on uncrawled pages
  (``page % FRONTIER_MOD == 0``), keyed by canonical URL (the four
  raw variants of a page collapse — frontier dedup),
- priority(canon) = Σ final integer micro-rank of the crawled pages
  linking to it (the classic rank-inflow ordering: pages endorsed by
  high-rank pages are fetched first; all-integer, so the distributed
  sum is order-independent and bit-exact),
- gates: the domain deny list (scan-side ``array_contains`` on a
  plan-literal, BEFORE any shuffle — blocked targets never pay the
  rank join), then robots longest-match on the page-sized candidate
  frame (broadcast rules + the ``urls.robots_allowed`` fold),
- politeness: at most ``FRONTIER_PER_DOMAIN`` URLs per host per
  cycle, highest priority first (ties → lexicographic canon — total
  order, so the cap is deterministic).

100 TB shape: edges are a scan-side explode; the deny gate runs scan-
side before the one corpus-sized shuffle (edge ⋈ ranks on the source
id — at scale both sides bucket by node id and co-locate, the
``linkgraph.py`` posture); the groupBy(canon) output is PAGE-sized,
and everything after (robots join, per-domain window, rollup) runs on
that page-sized frame. The per-domain ``row_number`` window is
bounded by a single host's candidate count; a pathological mega-host
would use the skew-safe salted-tournament top-k already in
``relational.py``.

Reference scope: the reference engine (SURVEY.md §2) ships no crawl
or scheduling surface; this is forward-looking LLM-pipeline coverage
on the repo's crawl front door (html_extract → urls → linkgraph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.checksum import CKSUM_MOD
from .linkgraph import PR_FANOUT, PR_ITERS, pagerank_state
from .urls import (canonicalize_url, deny_gate, robots_gate_frame,
                   synth_url_sql, url_domain)

FRONTIER_MOD = 3          # crawled pages: page % 3 != 0
FRONTIER_PER_DOMAIN = 2   # politeness cap per host per cycle


def frontier_candidates(documents: DataFrame, iters: int = PR_ITERS,
                        fanout: int = PR_FANOUT,
                        redirects: "DataFrame | bool" = True,
                        ranks: "DataFrame | None" = None,
                        rules: "DataFrame | None" = None,
                        state: "tuple | None" = None) -> DataFrame:
    """(canon, domain, priority): gated, prioritized, pre-cap frontier
    candidates. See the module docstring for the contract. The gates
    are the SHARED channel gates (``urls.deny_gate`` /
    ``urls.robots_gate_frame``) — structurally identical to the
    sitemap channel's, not a hand-kept copy.

    ``redirects`` composes redirect resolution (r13 verdict item 1):
    candidates are gated at the DISCOVERED url's host (the request
    that observes the 301 must itself be deny/robots-clean), then
    permanently-moved canons re-key to the terminal URL, priorities
    re-aggregate on the new key (two old canons collapsing onto one
    final sum their inflow), and the terminal host's gates apply to
    the fetch that actually lands there. True synthesizes + resolves
    the fixture edges; pass a pre-resolved frame (the
    ``fixture_resolved_redirects`` artifact) to share one resolution
    across channels; False is the un-composed form the algebra tests
    use.

    ``ranks`` feeds a PRE-COMPUTED (v, r) frame — the warm-cycle
    composition (r14): a production cycle passes the persisted rank
    store's warm-started converged ranks (``crawl_cycle_ranks``)
    instead of paying the cold fixed-iteration build; the declared
    query keeps the fixed-iteration default (the DuckDB twin unrolls
    it bit-for-bit). ``rules`` — a ``urls.shared_robots_rules``
    frame — lets a multi-channel plan (fetch_list) parse the robots
    fold once instead of once per gate. ``state`` — a pre-built
    ``pagerank_state`` tuple — lets fetch_channels materialize the
    rank chain CONCURRENTLY with the other shared artifacts (guide
    §2.6) instead of serially inside this call."""
    _, edges, ranks = (state if state is not None
                       else pagerank_state(documents, iters, fanout,
                                           ranks=ranks))
    e = (edges
         .filter(F.pmod(F.expr("u div 4"), F.lit(FRONTIER_MOD)) != 0)
         .filter(F.pmod(F.expr("v div 4"), F.lit(FRONTIER_MOD)) == 0))
    # the target's canonical URL is an EXPRESSION of its doc id
    # (synth_url_expr), so no join is needed to attach it — and the
    # deny gate runs scan-side before the rank shuffle
    t = e.select(F.col("v").alias("doc_id"), "u")
    t = t.select("u", canonicalize_url(synth_url_sql()).alias("canon"))
    t = t.withColumn("domain", url_domain("canon"))
    t = deny_gate(t)
    pri = (t.join(ranks.select(F.col("v").alias("u"), "r"), "u")
           .groupBy("canon", "domain")
           .agg(F.sum("r").alias("priority")))
    cand = robots_gate_frame(pri, documents, rules=rules)
    if redirects is not False:
        from .redirects import fixture_resolved_redirects, rekey_on_final
        resolved = (fixture_resolved_redirects(documents)
                    if redirects is True else redirects)
        cand = (rekey_on_final(cand, resolved)
                .groupBy("canon", "domain")
                .agg(F.sum("priority").alias("priority")))
        cand = robots_gate_frame(deny_gate(cand), documents, rules=rules)
    return cand


def frontier_schedule(documents: DataFrame, iters: int = PR_ITERS,
                      fanout: int = PR_FANOUT,
                      redirects: "DataFrame | bool" = True,
                      ranks: "DataFrame | None" = None) -> DataFrame:
    """Candidates with their per-domain politeness rank ``rn``
    (1 = fetch first); rows with ``rn <= FRONTIER_PER_DOMAIN`` are
    this cycle's fetch list. Window input is page-sized and
    partition-bounded by a single host's candidates (the TERMINAL
    host once redirects compose — a permanently moved page spends the
    budget of the host actually fetched)."""
    cand = frontier_candidates(documents, iters, fanout, redirects,
                               ranks)
    w = Window.partitionBy("domain").orderBy(F.desc("priority"),
                                             F.asc("canon"))
    return cand.withColumn("rn", F.row_number().over(w))


def crawl_frontier(documents: DataFrame, iters: int = PR_ITERS,
                   fanout: int = PR_FANOUT,
                   cap: int = FRONTIER_PER_DOMAIN) -> DataFrame:
    """The registered rollup: per domain — gated candidate count,
    scheduled count (the politeness cap), total scheduled priority,
    the first URL the crawler would fetch, and a mod-prime
    (canon-hash × priority) checksum over the SCHEDULED set — so the
    value-hash pins every gate verdict, every rank-derived priority,
    and every cap decision. Output bounded by hosts."""
    s = frontier_schedule(documents, iters, fanout)
    sched = F.col("rn") <= cap
    canon_h = F.pmod(F.conv(F.substring(F.md5("canon"), 1, 15), 16, 10)
                     .cast("long"), F.lit(CKSUM_MOD))
    term = F.pmod(canon_h * F.pmod(F.col("priority"), F.lit(CKSUM_MOD)),
                  F.lit(CKSUM_MOD))
    return (s.groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_candidates"),
                 F.sum(sched.cast("long")).alias("n_scheduled"),
                 F.sum(F.when(sched, F.col("priority"))
                       .otherwise(F.lit(0))).alias("sched_priority"),
                 F.min(F.struct(F.col("rn"), F.col("canon")))["canon"]
                 .alias("top_canon"),
                 F.sum(F.when(sched, term).otherwise(F.lit(0)))
                 .alias("frontier_checksum"))
            .orderBy("domain"))
