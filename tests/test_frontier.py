"""Crawl-frontier scheduling (operators/frontier.py) — direction and
contract tests; full DuckDB value-hash parity runs via
test_oracle_parity.py (`crawl_frontier`)."""

from __future__ import annotations

import re

from conftest import SF_DIR

from toymapreduce_go_spark.operators.frontier import (
    FRONTIER_MOD, FRONTIER_PER_DOMAIN, crawl_frontier, frontier_schedule)
from toymapreduce_go_spark.operators.urls import BLOCKED_HOST_MODS
from toymapreduce_go_spark.sources.registry import load_table


def _item(canon: str) -> int:
    return int(re.search(r"/articles/item(\d+)", canon).group(1))


def test_schedule_targets_only_uncrawled_unblocked_pages(spark):
    """Every scheduled URL is (a) on a page the crawler has NOT
    fetched (page % FRONTIER_MOD == 0 — the whole point of a
    frontier), (b) not on a deny-listed host, and (c) not on a
    robots-full-block host (site m%4==3: 'Disallow: /')."""
    docs = load_table(spark, SF_DIR, "documents")
    s = frontier_schedule(docs).collect()
    assert s
    for r in s:
        item = _item(r.canon)
        assert item % FRONTIER_MOD == 0, r.canon
        m = item % 16
        assert m not in BLOCKED_HOST_MODS, r.canon          # deny list
        assert m % 4 != 3, r.canon                          # robots
        assert r.priority > 0


def test_politeness_cap_binds_and_is_exact(spark):
    """Per domain: rn is the dense 1..k prefix ordered by
    (priority DESC, canon ASC); the rollup's scheduled count is
    min(k, cap); and at the fixture size the cap BINDS on at least
    one domain (n_candidates > n_scheduled) — so the test would
    catch a cap that silently stopped truncating."""
    docs = load_table(spark, SF_DIR, "documents")
    by_dom: dict[str, list] = {}
    for r in frontier_schedule(docs).collect():
        by_dom.setdefault(r.domain, []).append(r)
    assert by_dom
    for dom, rows in by_dom.items():
        rows.sort(key=lambda r: (-r.priority, r.canon))
        assert [r.rn for r in rows] == list(range(1, len(rows) + 1)), dom
    roll = {r.domain: r for r in crawl_frontier(docs).collect()}
    assert set(roll) == set(by_dom)
    for dom, rows in by_dom.items():
        assert roll[dom].n_candidates == len(rows)
        assert roll[dom].n_scheduled == min(len(rows),
                                            FRONTIER_PER_DOMAIN)
    assert any(r.n_candidates > r.n_scheduled for r in roll.values())


def test_priority_is_rank_inflow_from_crawled_sources(spark):
    """Independent recomputation of one domain's priorities: rebuild
    the edge list and final integer ranks driver-side (pure Python —
    no Spark code shared with the operator) and check every candidate
    canon's priority equals the sum of its crawled in-linkers' ranks."""
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    scale, fanout, iters = 1_000_000, 3, 3
    ranks = {v: scale // n for v in range(n)}
    edges = [(u, (u * 7 + j) % n) for u in range(n)
             for j in range(1, fanout + 1)]
    base = (15 * scale // 100) // n
    for _ in range(iters):
        inflow: dict[int, int] = {}
        for u, v in edges:
            inflow[v] = inflow.get(v, 0) + ranks[u] // fanout
        ranks = {v: base + 85 * inflow.get(v, 0) // 100
                 for v in range(n)}
    want: dict[int, int] = {}   # item (= target page) -> priority
    for u, v in edges:
        if (u // 4) % FRONTIER_MOD != 0 and (v // 4) % FRONTIER_MOD == 0:
            want[v // 4] = want.get(v // 4, 0) + ranks[u]
    got = {_item(r.canon): r.priority
           for r in frontier_schedule(docs).collect()}
    for item, pri in got.items():
        assert want[item] == pri, item
