"""event_funnel direction contracts: greedy-earliest subsequence
matching, strict ordering, and the time horizon — on constructed event
frames where the right answer is known by hand. Full DuckDB value-hash
parity on the fixture runs in tests/test_oracle_parity.py."""

from __future__ import annotations

from datetime import datetime

import pytest

from toymapreduce_go_spark.operators.events import event_funnel


def _frame(spark, rows):
    """rows: (minute, user_id, event_type) → a full events frame."""
    data = [(i, datetime(2024, 1, 1, minute // 60, minute % 60), u, t,
             1.0, "{}")
            for i, (minute, u, t) in enumerate(rows)]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")


def test_funnel_order_and_horizon_semantics(spark):
    """User 1 completes in order; user 2 has all three types but the
    purchase PRECEDES the click (no valid subsequence past step 2);
    user 3 completes but the purchase lands outside the horizon; user
    4 never clicks. Greedy matching must also survive a decoy: user
    1's early purchase BEFORE the click must not block the later
    valid one."""
    rows = [
        # user 1: view@0, purchase@5 (decoy), click@10, purchase@20 ✓
        (0, 1, "view"), (5, 1, "purchase"), (10, 1, "click"),
        (20, 1, "purchase"),
        # user 2: view@0, purchase@5, click@10 — wrong order after click
        (0, 2, "view"), (5, 2, "purchase"), (10, 2, "click"),
        # user 3: view@0, click@10, purchase@90 — outside 60-min horizon
        (0, 3, "view"), (10, 3, "click"), (90, 3, "purchase"),
        # user 4: view@0 only
        (0, 4, "view"),
    ]
    out = {r.step: r for r in event_funnel(
        _frame(spark, rows), within_minutes=60).collect()}
    assert out[1].n_users == 4
    assert out[2].n_users == 3          # users 1, 2, 3 reach click
    assert out[3].n_users == 1          # only user 1 completes
    assert [out[i].event_type for i in (1, 2, 3)] == [
        "view", "click", "purchase"]

    # horizon wide enough → user 3 completes too
    wide = {r.step: r.n_users for r in event_funnel(
        _frame(spark, rows), within_minutes=600).collect()}
    assert wide[3] == 2

    with pytest.raises(ValueError, match="2 steps"):
        event_funnel(_frame(spark, rows), steps=("view",))


def test_funnel_strictly_after_and_checksum(spark):
    """Simultaneous events do NOT chain (strictly-after contract), and
    the t_checksum pins the matched times: shifting the matched
    purchase by one second changes the checksum."""
    rows_tie = [(0, 1, "view"), (0, 1, "click")]
    out = {r.step: r.n_users for r in event_funnel(
        _frame(spark, rows_tie),
        steps=("view", "click")).collect()}
    assert out == {1: 1, 2: 0}

    base = [(0, 1, "view"), (10, 1, "click"), (20, 1, "purchase")]
    shifted = [(0, 1, "view"), (10, 1, "click"), (21, 1, "purchase")]
    c1 = {r.step: r.t_checksum
          for r in event_funnel(_frame(spark, base)).collect()}
    c2 = {r.step: r.t_checksum
          for r in event_funnel(_frame(spark, shifted)).collect()}
    assert c1[1] == c2[1] and c1[2] == c2[2]
    assert c1[3] != c2[3]


def test_funnel_plan_is_keyed_joins_only(spark):
    """Plan contract: len(steps) keyed equi-joins on user_id, no
    cartesian product, no window over raw events, no Python stage —
    the skew-safe min-agg chain the docstring promises."""
    from test_explain_plans import plan_of

    from conftest import SF_DIR
    from toymapreduce_go_spark.sources.registry import load_table

    ev = load_table(spark, SF_DIR, "events")
    plan = plan_of(event_funnel(ev))
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_retention_constructed_cohorts(spark):
    """Two cohorts with known dropout: users 1-3 start week 1 (user 3
    churns after week 1, user 2 after week 2); user 4 starts week 2.
    The matrix must report exactly that, and n_active_days must count
    distinct (user, day) activity — repeats on one day collapse."""
    from toymapreduce_go_spark.operators.events import user_retention

    rows = [
        # (day-of-jan, user) — all "view" events
        (1, 1), (8, 1), (15, 1),        # user 1: weeks 0, 1, 2
        (2, 2), (9, 2),                 # user 2: weeks 0, 1
        (3, 3),                         # user 3: week 0 only
        (8, 4), (8, 4), (16, 4),        # user 4: cohort week 2, then +1
    ]
    data = [(i, datetime(2024, 1, d, 12, 0), u, "view", 1.0, "{}")
            for i, (d, u) in enumerate(rows)]
    ev = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {(r.cohort_week.day, r.week_offset): (r.n_users, r.n_active_days)
           for r in user_retention(ev).collect()}
    # cohort of Jan 1 (users 1-3): 3 active in week 0, 2 in week 1,
    # 1 in week 2; cohort of Jan 8 (user 4): active weeks 0 and 1 —
    # user 4's two Jan-8 events collapse to ONE active day
    assert got == {
        (1, 0): (3, 3), (1, 1): (2, 2), (1, 2): (1, 1),
        (8, 0): (1, 1), (8, 1): (1, 1),
    }


def test_funnel_first_touch_anchor(spark):
    """Pins the FIRST-TOUCH semantics the docstring promises: the
    horizon anchors on the user's EARLIEST step-1 event, so a user
    whose only completing chain starts at a LATER step-1 event is
    deliberately not counted (the sliding/any-anchor variant would
    count them)."""
    rows = [(0, 1, "view"), (40, 1, "view"), (50, 1, "click"),
            (90, 1, "purchase")]
    out = {r.step: r.n_users for r in event_funnel(
        _frame(spark, rows), within_minutes=60).collect()}
    # anchored at view@0: click@50 matches, purchase@90 is outside the
    # 60-min horizon — NOT counted, although view@40→click@50→purchase@90
    # would complete under any-anchor semantics
    assert out == {1: 1, 2: 1, 3: 0}


def test_anomalies_planted_spike_and_dip(spark):
    """Direction contract on a constructed series: 40 quiet hours at
     10 events each, one 100-event spike, one 1-event dip. Both tails
    must flag at 3σ (the z² test is two-sided) and the checksum must
    pin WHICH hours flagged (moving the spike changes it)."""
    from toymapreduce_go_spark.operators.events import event_anomalies

    def series(spike_hour):
        rows = []
        eid = 0
        for h in range(40):
            n = 100 if h == spike_hour else (1 if h == 20 else 10)
            for i in range(n):
                rows.append((eid, datetime(2024, 1, 1 + h // 24, h % 24,
                                           i % 60), 1, "view", 1.0, "{}"))
                eid += 1
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string")

    out = event_anomalies(series(5)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_hours == 40
    assert r.n_anomalies_3s == 1          # the spike dominates sigma
    assert r.n_anomalies_2s >= 1
    moved = event_anomalies(series(6)).collect()[0]
    assert moved.n_anomalies_3s == 1
    assert moved.anomaly_checksum != r.anomaly_checksum
