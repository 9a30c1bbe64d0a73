"""The unified fetch list — the single artifact a crawler's fetcher
actually consumes each cycle, merging all three scheduling channels
under ONE per-host politeness budget:

    ch 0  link frontier     uncrawled pages with crawled in-linkers,
                            ranked by integer PageRank inflow
                            (``frontier.frontier_candidates``)
    ch 1  sitemap-only      uncrawled pages NO crawled page links to —
                            discoverable only via sitemap
                            (``sitemaps.sitemap_seeds`` minus ch 0)
    ch 2  recrawl           crawled pages whose sitemap <lastmod>
                            postdates their last fetch, ranked by
                            staleness gap (``sitemaps`` freshness
                            logic)

Channel order is the crawl-policy default (discover ranked content
first, then orphans, then refresh), deterministic ties by canonical
URL; within one budget a host's slots go to the union's best rows —
the banding across channels is a disclosed policy choice, not a
correctness claim. All three channels pass the SAME shared gates
(``urls.deny_gate`` / ``urls.robots_gate_frame``).

100 TB shape: each channel is page-sized by its own module's
argument; the union, window, and rollup therefore run on page-sized
metadata. The only corpus-sized work is inherited from the frontier's
rank join (bucket-colocatable) and the two page-universe distincts.

The DuckDB twin re-assembles the whole thing from the shared CTE
generators — canonicalization, unrolled PageRank, the independent
robots window — and applies one verdict table to all three channels,
so the value-hash pins every channel's membership, every priority,
and every budget decision in one number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.checksum import CKSUM_MOD
from .frontier import frontier_candidates
from .sitemaps import recrawl_gaps, sitemap_seeds
from .urls import deny_gate, robots_gate_frame

FETCH_BUDGET = 3   # per-host slots per cycle, across ALL channels


def fetch_channels(documents: DataFrame) -> DataFrame:
    """(canon, domain, priority, ch): the three channels, gated,
    pre-budget. Canons are disjoint across channels by construction
    (ch 0/1 partition the uncrawled pages; ch 2 is crawled pages).

    The frontier channel is referenced TWICE in one plan (unioned as
    ch 0 AND anti-joined to carve the sitemap-only remainder), so its
    page-sized result is ``localCheckpoint``-ed: the corpus-sized
    edge ⋈ rank join and its groupBy execute exactly once, whatever
    the optimizer decides about exchange reuse (r11 verdict: relying
    on ReuseExchange here let the rank join run twice)."""
    a = (frontier_candidates(documents)
         .select("canon", "domain", "priority")
         .withColumn("ch", F.lit(0))
         .localCheckpoint())
    b = (sitemap_seeds(documents).select("canon", "domain")
         .join(a.select("canon"), "canon", "left_anti")
         .withColumn("priority", F.lit(0).cast("long"))
         .withColumn("ch", F.lit(1)))
    c = (recrawl_gaps(documents)
         .filter(F.col("gap") > 0)
         .withColumnRenamed("gap", "priority"))
    c = (robots_gate_frame(deny_gate(c), documents)
         .select("canon", "domain", "priority")
         .withColumn("ch", F.lit(2)))
    return a.unionByName(b).unionByName(c)


def fetch_list(documents: DataFrame,
               budget: int = FETCH_BUDGET) -> DataFrame:
    """The registered rollup: per host — per-channel candidate counts,
    scheduled count under the unified budget, the first URL fetched,
    and a (canon-hash × (1 + channel)) mod-prime checksum over the
    scheduled set — pinning membership, channel assignment, priority
    order, and every budget decision."""
    u = fetch_channels(documents)
    w = Window.partitionBy("domain").orderBy(
        F.asc("ch"), F.desc("priority"), F.asc("canon"))
    s = u.withColumn("rn", F.row_number().over(w))
    sched = F.col("rn") <= budget
    canon_h = F.pmod(F.conv(F.substring(F.md5("canon"), 1, 15), 16, 10)
                     .cast("long"), F.lit(CKSUM_MOD))
    term = F.pmod(canon_h * (F.lit(1) + F.col("ch")), F.lit(CKSUM_MOD))
    return (s.groupBy("domain")
            .agg(F.sum((F.col("ch") == 0).cast("long"))
                 .alias("n_link_cand"),
                 F.sum((F.col("ch") == 1).cast("long"))
                 .alias("n_sitemap_only"),
                 F.sum((F.col("ch") == 2).cast("long"))
                 .alias("n_recrawl"),
                 F.sum(sched.cast("long")).alias("n_scheduled"),
                 F.min(F.struct(F.col("rn"), F.col("canon")))["canon"]
                 .alias("top_canon"),
                 F.sum(F.when(sched, term).otherwise(F.lit(0)))
                 .alias("fetch_checksum"))
            .orderBy("domain"))
