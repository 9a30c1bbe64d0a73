"""Crawl snapshot diffing (urls.crawl_diff) — direction and contract
tests; full DuckDB value-hash parity runs via test_oracle_parity.py
(`crawl_diff`)."""

from __future__ import annotations

from conftest import SF_DIR

from toymapreduce_go_spark.operators.urls import (
    CHANGED_MODS, NEW_EXCLUDE, OLD_EXCLUDE, SNAPSHOT_MOD, crawl_diff,
    crawl_diff_stats, synthesize_snapshot)
from toymapreduce_go_spark.sources.registry import load_table


def test_statuses_route_exactly_by_page_mod(spark):
    """Every page lands in exactly the status its mod class dictates:
    added = pages the OLD crawl never fetched, removed = pages the NEW
    crawl dropped, changed = the re-stamped mod classes, unchanged =
    everything else — and the four classes partition the union."""
    docs = load_table(spark, SF_DIR, "documents")
    old = synthesize_snapshot(docs, exclude_page_mod=OLD_EXCLUDE)
    new = synthesize_snapshot(docs, exclude_page_mod=NEW_EXCLUDE,
                              change_mods=CHANGED_MODS)
    d = crawl_diff(old, new).collect()
    assert d

    def page_of(canon):  # /articles/item<page>
        return int(canon.rsplit("item", 1)[1].split("?")[0])

    expect = {
        "added": {OLD_EXCLUDE}, "removed": {NEW_EXCLUDE},
        "changed": set(CHANGED_MODS),
        "unchanged": set(range(SNAPSHOT_MOD))
        - {OLD_EXCLUDE, NEW_EXCLUDE} - set(CHANGED_MODS)}
    seen = {}
    for r in d:
        seen.setdefault(r.status, set()).add(
            page_of(r.canon) % SNAPSHOT_MOD)
    # exact partition: every status holds exactly its mod classes (the
    # fixture has >= 13 pages per class, so none is vacuously absent)
    assert seen == expect, (seen, expect)
    # the union covers every page in either snapshot exactly once
    assert len(d) == len({r.canon for r in d})
    assert sum(1 for r in d) == old.count() + new.count() - sum(
        1 for r in d if r.status in ("changed", "unchanged"))


def test_identical_snapshots_diff_to_all_unchanged(spark):
    docs = load_table(spark, SF_DIR, "documents")
    snap = synthesize_snapshot(docs)
    d = crawl_diff(snap, snap)
    assert {r.status for r in d.collect()} == {"unchanged"}


def test_rollup_counts_reconcile(spark):
    docs = load_table(spark, SF_DIR, "documents")
    stats = crawl_diff_stats(docs).collect()
    by_status = {}
    for r in stats:
        by_status[r.status] = by_status.get(r.status, 0) + r.n_pages
    assert set(by_status) == {"added", "removed", "changed", "unchanged"}
    old = synthesize_snapshot(docs, exclude_page_mod=OLD_EXCLUDE).count()
    new = synthesize_snapshot(docs, exclude_page_mod=NEW_EXCLUDE,
                              change_mods=CHANGED_MODS).count()
    assert by_status["removed"] + by_status["changed"] \
        + by_status["unchanged"] == old
    assert by_status["added"] + by_status["changed"] \
        + by_status["unchanged"] == new


def test_bucketed_snapshots_diff_without_exchange(spark):
    """The 100 TB posture claim in crawl_diff's docstring, proven:
    write both snapshots bucketed by canon and the full-outer diff join
    plans with NO Exchange on either side — at scale the diff is a
    scan-local sort-merge join. Results identical to the unbucketed
    diff."""
    from test_bucketing import no_broadcast
    from test_explain_plans import plan_of

    from toymapreduce_go_spark.operators.urls import (
        CHANGED_MODS, NEW_EXCLUDE, OLD_EXCLUDE, crawl_diff)
    from toymapreduce_go_spark.sources.bucketing import write_bucketed

    docs = load_table(spark, SF_DIR, "documents")
    old = synthesize_snapshot(docs, exclude_page_mod=OLD_EXCLUDE)
    new = synthesize_snapshot(docs, exclude_page_mod=NEW_EXCLUDE,
                              change_mods=CHANGED_MODS)
    plain = sorted(tuple(r) for r in crawl_diff(old, new).collect())
    try:
        write_bucketed(old, "snap_old_r10", "canon", 4)
        write_bucketed(new, "snap_new_r10", "canon", 4)
        # the join requires hashpartitioning(canon); broadcast would
        # bypass the bucketing claim on the tiny fixture — disable it
        with no_broadcast(spark):
            d = crawl_diff(spark.table("snap_old_r10"),
                           spark.table("snap_new_r10"))
            plan = plan_of(d)
            assert "Exchange" not in plan, plan
            assert sorted(tuple(r) for r in d.collect()) == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS snap_old_r10")
        spark.sql("DROP TABLE IF EXISTS snap_new_r10")
