"""Unified fetch list (operators/scheduling.py) — channel-partition
and budget contracts; full DuckDB value-hash parity (one verdict
table, three channels, one budget window) via test_oracle_parity.py
(`fetch_list`)."""

from __future__ import annotations

from conftest import SF_DIR

from toymapreduce_go_spark.operators.frontier import frontier_candidates
from toymapreduce_go_spark.operators.scheduling import (
    FETCH_BUDGET, fetch_channels, fetch_list)
from toymapreduce_go_spark.operators.sitemaps import (
    recrawl_schedule, sitemap_seeds)
from toymapreduce_go_spark.sources.registry import load_table


def test_channels_partition_and_agree_with_their_modules(spark):
    """ch0 is exactly the link frontier's candidate set, ch1 exactly
    the sitemap-only remainder (ch0 ∪ ch1 = sitemap seeds — the two
    discovery channels partition the gated uncrawled pages), ch2's
    per-domain counts are exactly recrawl_schedule's stale counts, and
    no canon appears in two channels."""
    docs = load_table(spark, SF_DIR, "documents")
    rows = fetch_channels(docs).collect()
    by_ch = {c: {r.canon for r in rows if r.ch == c} for c in (0, 1, 2)}
    assert all(by_ch.values())                      # every channel live
    assert not (by_ch[0] & by_ch[1]) and not (by_ch[0] & by_ch[2]) \
        and not (by_ch[1] & by_ch[2])
    assert by_ch[0] == {r.canon for r in
                        frontier_candidates(docs).collect()}
    seeds = {r.canon for r in sitemap_seeds(docs).collect()}
    assert by_ch[0] | by_ch[1] == seeds
    ch2_by_dom: dict[str, int] = {}
    for r in rows:
        if r.ch == 2:
            ch2_by_dom[r.domain] = ch2_by_dom.get(r.domain, 0) + 1
            assert r.priority > 0                  # staleness gap
    # expected = recrawl_schedule's stale pages MINUS the gates ch2
    # applies (recrawl_schedule reports per-host freshness including
    # blocked hosts; the fetch list must not schedule them): recompute
    # driver-side with explicit deny + robots rules
    n_pages = docs.count() // 4 + (docs.count() % 4 > 0)
    want: dict[str, int] = {}
    from robots_ref import fixture_allowed
    for page in range(n_pages):
        m = page % 16
        if page % 3 == 0 or m in (3, 7):
            continue                       # uncrawled / deny-listed
        if not fixture_allowed(page):
            continue                       # robots most-specific block
        if (page % 365) > (page * 7) % 365:
            dom = f"www.site{m}.example.com"
            want[dom] = want.get(dom, 0) + 1
    assert ch2_by_dom == want
    # and it is a strict subset of the ungated freshness report
    rep = {r.domain: r.n_stale for r in recrawl_schedule(docs).collect()}
    assert all(want[d] <= rep[d] for d in want)
    assert sum(want.values()) < sum(rep.values())


def test_budget_is_unified_across_channels_and_binds(spark):
    """Per host: the schedule takes the union's best rows in
    (channel, priority DESC, canon) order under ONE budget — so a
    host with enough link candidates schedules no recrawls, and the
    rollup's counts reconcile with the raw channel rows."""
    docs = load_table(spark, SF_DIR, "documents")
    chan: dict[str, list] = {}
    for r in fetch_channels(docs).collect():
        chan.setdefault(r.domain, []).append(r)
    roll = {r.domain: r for r in fetch_list(docs).collect()}
    assert set(roll) == set(chan)
    binds = False
    for dom, rows in chan.items():
        rows.sort(key=lambda r: (r.ch, -r.priority, r.canon))
        rep = roll[dom]
        assert rep.n_link_cand == sum(r.ch == 0 for r in rows)
        assert rep.n_sitemap_only == sum(r.ch == 1 for r in rows)
        assert rep.n_recrawl == sum(r.ch == 2 for r in rows)
        assert rep.n_scheduled == min(len(rows), FETCH_BUDGET)
        assert rep.top_canon == rows[0].canon
        if len(rows) > FETCH_BUDGET:
            binds = True
            # the budget goes to the union's best rows: everything
            # scheduled sorts before everything cut
            cut = rows[FETCH_BUDGET:]
            assert all((c.ch, -c.priority, c.canon)
                       >= (rows[FETCH_BUDGET - 1].ch,
                           -rows[FETCH_BUDGET - 1].priority,
                           rows[FETCH_BUDGET - 1].canon) for c in cut)
    assert binds
