"""The full crawl-refresh loop, composed end to end from the r10/r11
crawl suite — the integration a crawl-pipeline user actually runs each
cycle:

    discover (sitemap seeds ∪ link frontier, both gated by deny list
    + robots)  →  fetch the scheduled pages  →  classify the delta
    (corpus_delta)  →  refresh the curated corpus re-processing ONLY
    the delta (refresh_training_corpus)

Each stage's own contract is pinned in its module tests; this test
pins that they COMPOSE — ids, keys, and statuses line up across the
stage boundaries without glue."""

from __future__ import annotations

import re

from conftest import SF_DIR

from pyspark.sql import functions as F

from toymapreduce_go_spark.operators.frontier import (
    FRONTIER_MOD, FRONTIER_PER_DOMAIN, frontier_schedule)
from toymapreduce_go_spark.operators.refresh import (
    refresh_training_corpus)
from toymapreduce_go_spark.operators.sitemaps import sitemap_seeds
from toymapreduce_go_spark.pipeline import build_training_corpus
from toymapreduce_go_spark.sources.registry import load_table


def _items(rows):
    return {int(re.search(r"/articles/item(\d+)", r.canon).group(1))
            for r in rows}


def test_full_crawl_refresh_cycle_composes(spark):
    docs = load_table(spark, SF_DIR, "documents")

    # 1. discovery: both channels, identically gated
    fetch_items = (_items(sitemap_seeds(docs).collect())
                   | _items(frontier_schedule(docs)
                            .filter(F.col("rn") <= FRONTIER_PER_DOMAIN)
                            .collect()))
    assert fetch_items

    # 2. the crawler state: crawled pages vs this cycle's fetches
    page = F.expr("doc_id div 4")
    old_crawl = docs.filter(
        F.pmod(page, F.lit(FRONTIER_MOD)) != 0).localCheckpoint()
    fetched = docs.filter(
        page.isin([int(i) for i in fetch_items])).localCheckpoint()
    assert fetched.count() > 0
    new_crawl = old_crawl.unionByName(fetched)

    # 3-4. prior curated output, then the delta-driven refresh
    prior, _ = build_training_corpus(spark, SF_DIR, docs=old_crawl)
    prior = prior.localCheckpoint()
    curated, report = refresh_training_corpus(
        spark, SF_DIR, old_crawl, new_crawl, prior)
    rep = {r.stage: r.n_docs for r in report.collect()}

    # the delta classification sees EXACTLY the fetched docs as added
    assert rep["0_delta_added"] == fetched.count()
    assert rep["0_delta_removed"] == 0
    assert rep["0_delta_changed"] == 0
    assert rep["0_delta_unchanged"] == old_crawl.count()

    # nothing kept was touched: the prior curated rows ride through
    # byte-identically
    prior_rows = {(r.doc_id, r.source, r.lang, r.text, r.bin_id)
                  for r in prior.collect()}
    out_rows = {(r.doc_id, r.source, r.lang, r.text, r.bin_id)
                for r in curated.collect()}
    assert prior_rows <= out_rows

    # every NEW curated row came from this cycle's fetch list, and at
    # least one fetched page survived curation into the corpus
    new_ids = {r[0] for r in out_rows - prior_rows}
    fetched_ids = {r.doc_id for r in fetched.select("doc_id").collect()}
    assert new_ids and new_ids <= fetched_ids
