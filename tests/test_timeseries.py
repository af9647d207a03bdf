"""Behavioral tests for the gap-fill resample operator (timeseries.py,
x23) beyond its DuckDB hash oracle."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from cubefs_hadoop_spark.catalog import load
from cubefs_hadoop_spark.extensions.timeseries import (
    gapfill_daily,
    range_join_near_count,
)
from cubefs_hadoop_spark.plans.audit import audit_plan
from tests.conftest import SF_SMOKE


def test_gapfill_witness(spark):
    """Hand-built series: missing days carry the last observation, days
    before a series' first observation stay NULL, multi-event days mean
    correctly."""
    rows = [
        (1, datetime.datetime(2024, 1, 1, 9), 10.0),
        (1, datetime.datetime(2024, 1, 1, 15), 20.0),  # day1 mean 15
        (1, datetime.datetime(2024, 1, 4, 9), 40.0),   # days 2-3 gap
        (2, datetime.datetime(2024, 1, 3, 9), 7.0),    # starts day 3
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {
        (r.user_id, r.day.isoformat()): (
            None if r.val_filled is None else float(r.val_filled),
            r.observed,
        )
        for r in gapfill_daily(ev).collect()
    }
    assert out == {
        (1, "2024-01-01"): (15.0, 1),
        (1, "2024-01-02"): (15.0, 0),
        (1, "2024-01-03"): (15.0, 0),
        (1, "2024-01-04"): (40.0, 1),
        (2, "2024-01-01"): (None, 0),  # before first observation
        (2, "2024-01-02"): (None, 0),
        (2, "2024-01-03"): (7.0, 1),
        (2, "2024-01-04"): (7.0, 0),
    }


def test_gapfill_grid_is_complete_and_filled(spark):
    """Fixture events: every (series, day-in-range) bucket exists, every
    post-first-observation bucket is non-null, and the frame is stable
    under repartitioning."""
    ev = load(spark, SF_SMOKE, "events")
    out = gapfill_daily(ev).collect()
    days = {r.day for r in out}
    users = {r.user_id for r in out}
    assert len(out) == len(days) * len(users)  # full grid
    by_user: dict = {}
    for r in sorted(out, key=lambda r: (r.user_id, r.day)):
        seen = by_user.setdefault(r.user_id, [])
        if seen and seen[-1] is not None:
            assert r.val_filled is not None  # locf never un-fills
        seen.append(r.val_filled)
    alt = gapfill_daily(ev.repartition(13)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, alt))


def test_gapfill_plan_shape(spark):
    """The grid explode rides a broadcast 1-row bounds frame (one
    nested-loop broadcast is the scalar-aggregate pattern), the fill is a
    per-series window (no corpus SinglePartition), nothing in Python."""
    spark.catalog.clearCache()
    a = audit_plan(gapfill_daily(load(spark, SF_SMOKE, "events")))
    assert "BatchEvalPython" not in a.text
    # exactly one SinglePartition exchange: the 1-row [min,max] bounds
    # aggregate — the fill window itself is partitioned per series
    assert a.text.count("SinglePartition") == 1
    assert a.nested_loop_joins == 1  # the broadcast bounds frame


def test_range_join_witness_and_plan(spark):
    """x24: hand-built timeline — pairs straddling a bucket boundary are
    found (the +/-1 bucket probe), far pairs are not, self never counts;
    and the plan has ZERO nested loops (the whole point of the bucketed
    rewrite)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base),                                   # near 2 only
        (2, base + dt.timedelta(seconds=29)),        # near 1 and 3
        (3, base + dt.timedelta(seconds=31)),        # near 2 (cross-bucket)
        (4, base + dt.timedelta(seconds=300)),       # isolated
    ]
    ev = spark.createDataFrame(rows, ["event_id", "ts"])
    out = {
        r.event_id: r.n_near
        for r in range_join_near_count(ev).collect()
    }
    assert out == {1: 1, 2: 2, 3: 1, 4: 0}

    spark.catalog.clearCache()
    a = audit_plan(range_join_near_count(load(spark, SF_SMOKE, "events")))
    assert a.nested_loop_joins == 0
    assert "BatchEvalPython" not in a.text


def test_series_similarity_witness_and_plan(spark):
    """x27: identical series have distance 0 and rank first; the plan is
    a broadcast probe join with WindowGroupLimit top-k and no Python."""
    import datetime as dt

    from cubefs_hadoop_spark.extensions.timeseries import (
        series_topk_similar,
    )

    base = dt.datetime(2024, 1, 1, 9)
    day = dt.timedelta(days=1)
    rows = []
    eid = 0
    # users 0 and 7: identical series; user 8: far away
    for u, vals in [(0, [1.0, 2.0]), (7, [1.0, 2.0]), (8, [90.0, 95.0])]:
        for i, v in enumerate(vals):
            rows.append((eid, base + i * day, u, "view", v, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = series_topk_similar(ev, n_probes=1, topk=2).collect()
    assert [(r.user_id, float(r.dist)) for r in out] == [
        (7, 0.0),
        (8, 128.72),  # sqrt(8900^2+9300^2)/100 rounded
    ]

    spark.catalog.clearCache()
    a = audit_plan(
        series_topk_similar(load(spark, SF_SMOKE, "events"))
    )
    assert a.has_window_group_limit
    assert "BatchEvalPython" not in a.text
