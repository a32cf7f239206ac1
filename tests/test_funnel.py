"""Unit tests for funnel_stages (operators/timebucket.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from bodo_spark.operators.timebucket import funnel_stages


def _ev(spark, rows):
    return spark.createDataFrame(
        [(e, dt.datetime(2024, 1, 1, 0, 0, s), u, t)
         for (e, s, u, t) in rows],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string")


STEPS = ["view", "click", "purchase"]


def test_funnel_order_matters(spark):
    ev = _ev(spark, [
        # user 1: full ordered funnel
        (1, 1, 1, "view"), (2, 2, 1, "click"), (3, 3, 1, "purchase"),
        # user 2: purchase BEFORE the view -> stops at stage 1
        (4, 1, 2, "purchase"), (5, 2, 2, "view"),
        # user 3: click then view -> the click cannot count, stage 1
        (6, 1, 3, "click"), (7, 2, 3, "view"),
        # user 4: only clicks -> stage 0 (present, step[0] never seen)
        (8, 1, 4, "click"),
        # user 5: no step-typed events at all -> absent from output
        (9, 1, 5, "error"),
    ])
    got = {r.user_id: r.stage
           for r in funnel_stages(ev, STEPS).collect()}
    assert got == {1: 3, 2: 1, 3: 1, 4: 0}


def test_funnel_same_timestamp_ties_on_event_id(spark):
    ev = _ev(spark, [
        # same second: event_id order decides -> view(10) before
        # click(11) advances both; reversed ids advance only view
        (10, 1, 1, "view"), (11, 1, 1, "click"),
        (21, 1, 2, "click"), (22, 1, 2, "view"),
    ])
    got = {r.user_id: r.stage
           for r in funnel_stages(ev, STEPS).collect()}
    assert got == {1: 2, 2: 1}


def test_funnel_repeat_steps_and_restart(spark):
    ev = _ev(spark, [
        # repeated views don't advance twice; a later click still counts
        (1, 1, 1, "view"), (2, 2, 1, "view"), (3, 3, 1, "click"),
    ])
    got = {r.user_id: r.stage
           for r in funnel_stages(ev, STEPS).collect()}
    assert got == {1: 2}


def test_funnel_empty_steps_raises(spark):
    ev = _ev(spark, [(1, 1, 1, "view")])
    with pytest.raises(ValueError):
        funnel_stages(ev, [])


def test_interpolate_linear_hand_example(spark):
    from bodo_spark.operators.timebucket import interpolate_linear
    rows = [("a", 0, 10.0), ("a", 10, None), ("a", 20, None),
            ("a", 30, 40.0), ("a", 40, None),       # trailing edge
            ("b", 0, None), ("b", 10, 5.0)]         # leading edge
    df = spark.createDataFrame(rows, "g string, pos long, v double")
    out = {(r.g, r.pos): r.vf for r in interpolate_linear(
        df, group_cols=["g"], order_col="pos", value_col="v",
        out_col="vf").collect()}
    assert out[("a", 10)] == 20.0 and out[("a", 20)] == 30.0
    assert out[("a", 0)] == 10.0 and out[("a", 30)] == 40.0
    assert out[("a", 40)] is None and out[("b", 0)] is None  # edges
    assert out[("b", 10)] == 5.0
    # non-uniform spacing interpolates by position, not row index
    df2 = spark.createDataFrame([("a", 0, 0.0), ("a", 30, None),
                                 ("a", 100, 100.0)],
                                "g string, pos long, v double")
    out2 = {r.pos: r.v for r in interpolate_linear(
        df2, group_cols=["g"], order_col="pos",
        value_col="v").collect()}
    assert out2[30] == 30.0


def test_expand_hierarchy_forest_and_cycle(spark):
    from bodo_spark.operators.hierarchy import expand_hierarchy
    import pytest
    # two trees: 0<-1<-3, 0<-2, 10<-11; deep chain resolves in
    # log rounds (depth 4 via 20<-21<-22<-23<-24)
    edges = spark.createDataFrame(
        [(1, 0), (3, 1), (2, 0), (11, 10),
         (21, 20), (22, 21), (23, 22), (24, 23)],
        "child long, parent long")
    got = {r.id: (r.root, r.depth)
           for r in expand_hierarchy(edges).collect()}
    assert got == {0: (0, 0), 1: (0, 1), 2: (0, 1), 3: (0, 2),
                   10: (10, 0), 11: (10, 1),
                   20: (20, 0), 21: (20, 1), 22: (20, 2),
                   23: (20, 3), 24: (20, 4)}
    cyc = spark.createDataFrame([(1, 2), (2, 1)], "child long, parent long")
    with pytest.raises(RuntimeError, match="converge"):
        expand_hierarchy(cyc, max_iter=4)
