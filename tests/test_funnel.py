"""Funnel + cohort retention (operators/funnel.py)."""

import datetime as dt

import pytest

from farmrpg_etl_spark.operators.funnel import (
    cohort_retention,
    funnel,
    funnel_summary,
)


def ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1 completes all 3 steps in order within windows
        (1, ts(1, 0), 1, "view"),
        (2, ts(1, 5), 1, "click"),
        (3, ts(1, 9), 1, "purchase"),
        # u2: click BEFORE view -> step2 not completed
        (4, ts(2, 0), 2, "click"),
        (5, ts(2, 1), 2, "view"),
        # u3: click more than 24h after view -> window missed
        (6, ts(3, 0), 3, "view"),
        (7, ts(4, 1), 3, "click"),
        # u4: never enters (no view)
        (8, ts(5, 0), 4, "purchase"),
        # u1 again on day 3 (retention)
        (9, ts(3, 2), 1, "view"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_funnel_steps_and_windows(events):
    out = {r.user_id: r for r in
           funnel(events, ["view", "click", "purchase"]).collect()}
    assert out[1].steps_completed == 3 and out[1].t3 == ts(1, 9)
    assert out[2].steps_completed == 1 and out[2].t2 is None
    assert out[3].steps_completed == 1  # 25h gap > 24h window
    assert 4 not in out  # never viewed -> not in funnel


def test_funnel_first_touch_is_min(spark):
    rows = [
        (1, ts(1, 0), 1, "view"),
        (2, ts(1, 2), 1, "click"),
        (3, ts(1, 1), 1, "click"),  # earlier qualifying click wins
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    (row,) = funnel(ev, ["view", "click"]).collect()
    assert row.t2 == ts(1, 1)


def test_funnel_summary_monotone(events):
    out = {r.step: r.n_users for r in
           funnel_summary(funnel(events, ["view", "click", "purchase"]), 3)
           .collect()}
    assert out == {1: 3, 2: 1, 3: 1}


def test_cohort_retention_matrix(events):
    out = {(r.cohort_day, r.day_offset): r.n_users
           for r in cohort_retention(events).collect()}
    # u1 cohort Jan 1, active day 0 and day 2; u2 Jan 2; u3 cohort Jan 3,
    # active days 0 and 1; u4 Jan 5.
    assert out[(dt.date(2024, 1, 1), 0)] == 1
    assert out[(dt.date(2024, 1, 1), 2)] == 1
    assert out[(dt.date(2024, 1, 3), 0)] == 1  # u1 Jan-3 activity counts in
    # its OWN cohort (Jan 1, offset 2); only u3 has cohort Jan 3

    assert out[(dt.date(2024, 1, 3), 1)] == 1  # u3 active Jan 4 (click)


def test_funnel_step_filters_pushed_to_scan(spark):
    """Each step's event_type filter must reach the parquet scan
    (PushedFilters), so at 100 TB a step reads only its row groups —
    the frontier-join design is pointless if every step scans the
    full log."""
    from farmrpg_etl_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    df = funnel(ev, ["view", "click", "purchase"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    for step in ("view", "click", "purchase"):
        assert any(f"EqualTo(event_type,{step})" in l for l in pushed), step


def test_event_transitions_counts_and_probs(spark):
    from farmrpg_etl_spark.operators.funnel import event_transitions

    rows = [
        (1, ts(1, 0), 1, "view"),
        (2, ts(1, 1), 1, "click"),
        (3, ts(1, 2), 1, "view"),
        (4, ts(1, 3), 1, "click"),
        (5, ts(1, 4), 1, "purchase"),
        (6, ts(2, 0), 2, "view"),
        (7, ts(2, 1), 2, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {(r.from_type, r.to_type): (r.n, r.p)
           for r in event_transitions(ev).collect()}
    # from 'view': 2x ->click, 1x ->purchase
    assert out[("view", "click")] == (2, round(2 / 3, 6))
    assert out[("view", "purchase")] == (1, round(1 / 3, 6))
    # from 'click': ->view, ->purchase once each
    assert out[("click", "view")][0] == 1
    assert out[("click", "purchase")][0] == 1
    # user boundary: no transition purchase(u1)->view(u2)
    assert ("purchase", "view") not in out


def test_linear_attribution_splits_credit(spark):
    from farmrpg_etl_spark.operators.funnel import linear_attribution

    rows = [
        (1, ts(1, 0), 1, "click"),
        (2, ts(1, 1), 1, "click"),
        (3, ts(1, 2), 1, "purchase"),   # splits over clicks 1,2
        (4, ts(1, 3), 1, "purchase"),   # also splits over clicks 1,2
        (5, ts(3, 0), 2, "click"),
        (6, ts(4, 5), 2, "purchase"),   # click 5 is >24h before -> no credit
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r.event_id: r for r in linear_attribution(ev).collect()}
    assert set(out) == {1, 2}
    for eid in (1, 2):
        assert out[eid].n_conversions == 2
        assert out[eid].credit == 1.0  # 2 conversions x 0.5


def test_gap_fill_hourly_dense_grid_and_ffill(spark):
    """Lives here with the other event-analytics ops: the grid is
    dense over the global span, zero counts in holes, forward-filled
    value totals reset never (they carry until the next real hour)."""
    from farmrpg_etl_spark.operators.rollup import gap_fill_hourly

    rows = [
        (1, ts(1, 0), 1, "a", 1.5),
        (2, ts(1, 3), 1, "a", 2.25),
        (3, ts(1, 1), 1, "b", 10.0),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = {(r.event_type, r.hour.hour): r
           for r in gap_fill_hourly(ev).collect()}
    # grid: 2 keys x 4 hours (00..03)
    assert len(out) == 8
    assert out[("a", 0)].value_micros == 1_500_000
    # hole at hour 1-2 for 'a': zero events, ffill carries 1.5
    assert out[("a", 1)].n_events == 0
    assert out[("a", 1)].value_ffill_micros == 1_500_000
    assert out[("a", 2)].value_ffill_micros == 1_500_000
    assert out[("a", 3)].value_micros == 2_250_000
    # 'b' before its first event: ffill floor 0
    assert out[("b", 0)].value_ffill_micros == 0
    assert out[("b", 1)].value_micros == 10_000_000


def test_zscore_anomalies_exact_integer_flagging(spark):
    from farmrpg_etl_spark.operators.rollup import zscore_anomalies

    # 9 quiet hours at 10 micros, one spike at 1000:
    # mean=109, var=(n*s2-s1^2)/n^2 -> spike is way past 3 sigma,
    # quiet hours are not.
    rows = [("a", dt.datetime(2024, 1, 1, h), 10) for h in range(9)]
    rows.append(("a", dt.datetime(2024, 1, 1, 9), 1000))
    hourly = spark.createDataFrame(
        rows, "event_type string, hour timestamp, value_micros long"
    )
    out = {r.hour.hour: r.is_anomaly for r in
           zscore_anomalies(hourly).collect()}
    assert out[9] == 1
    assert all(out[h] == 0 for h in range(9))
