"""Behavioral tests for the event-analytics operators (behavior.py,
x25/x26) beyond their DuckDB hash oracles."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cubefs_hadoop_spark.catalog import load
from cubefs_hadoop_spark.extensions.behavior import funnel, lifecycle_summary
from cubefs_hadoop_spark.plans.audit import audit_plan
from tests.conftest import SF_SMOKE


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts"]
    ).select("user_id", "event_type", "ts")


def test_funnel_witness(spark):
    """Hand-built journeys: in-window conversions count, out-of-window
    and out-of-ORDER events do not, the first qualifying event wins."""
    base = dt.datetime(2024, 1, 1, 12)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: full in-window funnel; a later click must not shift tb
        (1, 1, "view", base),
        (2, 1, "click", base + 10 * m),
        (3, 1, "click", base + 20 * m),
        (4, 1, "purchase", base + 30 * m),
        # user 2: click comes 2h after view -> funnel breaks at step 2
        (5, 2, "view", base),
        (6, 2, "click", base + 120 * m),
        # user 3: purchase BEFORE click -> step 3 unsatisfied
        (7, 3, "view", base),
        (8, 3, "purchase", base + 5 * m),
        (9, 3, "click", base + 10 * m),
        # user 4: never viewed -> not in the funnel at all
        (10, 4, "click", base),
    ]
    out = {
        r.user_id: (r.t0, r.t1, r.t2)
        for r in funnel(_ev(spark, rows)).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1] == (base, base + 10 * m, base + 30 * m)
    assert out[2] == (base, None, None)
    assert out[3] == (base, base + 10 * m, None)


def test_lifecycle_witness(spark):
    rows = [
        (1, 1, "view", dt.datetime(2024, 1, 1, 9)),
        (2, 1, "view", dt.datetime(2024, 1, 1, 18)),
        (3, 1, "click", dt.datetime(2024, 1, 5, 9)),
    ]
    r = lifecycle_summary(_ev(spark, rows)).collect()[0]
    assert (r.active_days, r.span_days) == (2, 5)
    assert (r.first_day, r.last_day) == (
        dt.date(2024, 1, 1),
        dt.date(2024, 1, 5),
    )


def test_behavior_plan_shapes(spark):
    """Funnel: equi-joins only (user-keyed), event-type filters pushed to
    the scan, no Python, no corpus-wide window."""
    spark.catalog.clearCache()
    ev = load(spark, SF_SMOKE, "events")
    a = audit_plan(funnel(ev))
    assert a.nested_loop_joins == 0
    assert "BatchEvalPython" not in a.text
    assert "Window" not in a.text
    assert any("view" in f or "click" in f for f in a.pushed_filters)


def test_sessionize_gap_semantics(spark):
    """x34 witness: sessions split exactly at gaps > 30 min (a gap of
    exactly 30:00 does NOT split), counters restart per user, duration
    is exact microseconds, and a single-event session has duration 0."""
    from cubefs_hadoop_spark.extensions.behavior import sessionize

    rows = [
        # user 1: 3 events 10 min apart -> one session, then a 31-min
        # gap -> second session of one event
        (1, 1, "2024-01-01 00:00:00"),
        (2, 1, "2024-01-01 00:10:00"),
        (3, 1, "2024-01-01 00:20:00"),
        (4, 1, "2024-01-01 00:51:00"),
        # user 2: exactly 30:00 apart -> still ONE session
        (5, 2, "2024-01-01 00:00:00"),
        (6, 2, "2024-01-01 00:30:00"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = {
        (r.user_id, r.session_idx): (r.events, r.duration_us)
        for r in sessionize(ev).collect()
    }
    assert got == {
        (1, 1): (3, 20 * 60 * 1_000_000),
        (1, 2): (1, 0),
        (2, 1): (2, 30 * 60 * 1_000_000),
    }


def test_x34_agrees_with_session_window_family(spark):
    """x34 at a 10-minute gap must produce exactly the per-user session
    counts of the S04 batch twin — which tests/test_streaming.py pins
    equal to the native streaming session_window — so the batch
    summarizer and the streaming operator share one session semantics
    (split strictly-greater-than the gap, tie kept together)."""
    from cubefs_hadoop_spark.extensions.behavior import sessionize
    from cubefs_hadoop_spark.queries.streaming_twins import (
        s04_sessionization,
    )

    ev = load(spark, SF_SMOKE, "events")
    x34 = {
        r.user_id: r.n
        for r in sessionize(ev, gap_us=600_000_000)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    s04 = {
        r.user_id: r.sessions
        for r in s04_sessionization(spark, SF_SMOKE).collect()
    }
    assert x34 == s04


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    offsets=st.lists(
        st.integers(0, 200 * 60), min_size=1, max_size=40
    ),  # event offsets in seconds over ~3 hours
    users=st.integers(1, 3),
)
def test_sessionize_invariants_property(spark, offsets, users):
    """x34 property: for ANY event stream — duplicates and ties included
    — (a) every event lands in exactly one session, (b) consecutive
    events within a session gap by <= 30 min, (c) consecutive sessions
    of a user gap by > 30 min, (d) session indexes are 1..n dense."""
    import datetime as dtm

    from cubefs_hadoop_spark.extensions.behavior import sessionize

    base = dtm.datetime(2024, 1, 1)
    rows = [
        (i, i % users, base + dtm.timedelta(seconds=off))
        for i, off in enumerate(offsets)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz"
    )
    out = sorted(
        sessionize(ev).collect(), key=lambda r: (r.user_id, r.session_idx)
    )
    per_user: dict[int, list] = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r)
    assert sum(r.events for r in out) == len(rows)  # (a)
    gap = 30 * 60 * 1_000_000
    for uid, sess in per_user.items():
        assert [r.session_idx for r in sess] == list(
            range(1, len(sess) + 1)
        )  # (d)
        evs = sorted(
            (t for i, u, t in rows if u == uid), key=lambda t: t
        )
        # rebuild ground-truth splits
        truth = 1
        prev = None
        for t in evs:
            if prev is not None and (t - prev).total_seconds() * 1e6 > gap:
                truth += 1
            prev = t
        assert len(sess) == truth  # (b)+(c) combined
        for r in sess:
            assert 0 <= r.duration_us <= 200 * 60 * 1_000_000


def test_sessionize_bucketed_stitches_boundaries(spark):
    """x34b witness: bucket-local sessions + boundary stitching equal
    single-window sessionization on crafted streams that exercise every
    stitch case — a session spanning one boundary (merge), a boundary
    that is a real gap (no merge), a session CHAINING across four
    buckets, and a hot user owning most of the stream.  bucket_us is
    shrunk to 1 h so the 30-min gap can straddle boundaries hard."""
    from cubefs_hadoop_spark.extensions.behavior import (
        sessionize,
        sessionize_bucketed,
    )

    rows = [
        # user 1: events every 25 min for 4 hours -> ONE session chaining
        # across 4+ hourly buckets
        *[
            (100 + i, 1, f"2024-01-01 {h:02d}:{m:02d}:00")
            for i, (h, m) in enumerate(
                (t // 60, t % 60) for t in range(0, 250, 25)
            )
        ],
        # user 2: 00:50 -> 01:10 (20-min gap across the 01:00 boundary,
        # merge), then 01:10 -> 02:50 (real gap, no merge)
        (200, 2, "2024-01-01 00:50:00"),
        (201, 2, "2024-01-01 01:10:00"),
        (202, 2, "2024-01-01 02:50:00"),
        # user 3: exactly 30:00 across a boundary -> still one session
        (300, 3, "2024-01-01 00:45:00"),
        (301, 3, "2024-01-01 01:15:00"),
        # user 4: single event
        (400, 4, "2024-01-01 05:00:00"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    want = {
        (r.user_id, r.session_idx): (
            r.session_start,
            r.session_end,
            r.events,
            r.duration_us,
        )
        for r in sessionize(ev).collect()
    }
    got = {
        (r.user_id, r.session_idx): (
            r.session_start,
            r.session_end,
            r.events,
            r.duration_us,
        )
        for r in sessionize_bucketed(ev, bucket_us=3600 * 1_000_000).collect()
    }
    assert got == want
    # the chain really did cross buckets: user 1 is one session of 10
    assert got[(1, 1)][2] == 10


def test_sessionize_bucketed_hot_user_equivalence(spark):
    """Skew witness (VERDICT r7 item 4): one bot user owns ~10% of a
    multi-day stream; the bucketed plan must (a) key its event-grain
    exchange on (user, bucket) — the skew remedy — and (b) reproduce
    the single-window output bit-for-bit."""
    import random

    from cubefs_hadoop_spark.extensions.behavior import (
        sessionize,
        sessionize_bucketed,
    )
    from cubefs_hadoop_spark.plans.audit import audit_plan

    rng = random.Random(34)
    rows = []
    eid = 0
    # bot: one event every 2-40 min for 5 days (dense, many sessions,
    # lots of day-boundary crossings)
    t = 0
    while t < 5 * 86400:
        rows.append((eid, 0, t))
        eid += 1
        t += rng.randrange(120, 2400)
    # 60 normal users with sparse activity
    for u in range(1, 61):
        t = rng.randrange(0, 86400)
        for _ in range(rng.randrange(3, 12)):
            rows.append((eid, u, t))
            eid += 1
            t += rng.randrange(60, 7200)
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, off long"
    ).select(
        "event_id",
        "user_id",
        (
            F.lit("2024-03-01 00:00:00").cast("timestamp_ntz")
            + F.make_dt_interval(secs=F.col("off").cast("double"))
        ).alias("ts"),
    )
    bot_share = sum(1 for r in rows if r[1] == 0) / len(rows)
    assert bot_share > 0.3  # deliberately extreme at test scale

    bucketed = sessionize_bucketed(ev)
    a = audit_plan(bucketed)
    assert "hashpartitioning(user_id" in a.text and "bkt" in a.text
    want = {
        (r.user_id, r.session_idx): (r.events, r.duration_us)
        for r in sessionize(ev).collect()
    }
    got = {
        (r.user_id, r.session_idx): (r.events, r.duration_us)
        for r in bucketed.collect()
    }
    assert got == want


def test_x52_skew_profile_exact_shares(spark):
    """x52 witness on a crafted stream: hand-computed ranks, exact
    integer milli shares, cumulative shares, and totals; ties broken by
    key; the top-N truncation keeps exactly N rows."""
    from cubefs_hadoop_spark.extensions.behavior import key_skew_profile

    rows = []
    eid = 0
    for uid, n in ((7, 50), (3, 30), (9, 30), (1, 10)):
        for _ in range(n):
            rows.append((eid, uid))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, user_id long")
    prof = key_skew_profile(ev, top=3).collect()
    assert [r.rk for r in prof] == [1, 2, 3]
    assert [r.user_id for r in prof] == [7, 3, 9]  # tie 3/9 -> key order
    assert [r.n_events for r in prof] == [50, 30, 30]
    # total 120: 50 -> 416 milli, cum 50/80/110 -> 416/666/916
    assert [r.share_milli for r in prof] == [416, 250, 250]
    assert [r.cum_share_milli for r in prof] == [416, 666, 916]
    assert all(r.n_keys == 4 and r.n_rows == 120 for r in prof)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    offsets=st.lists(
        # spread events over ~5 days so day-bucket boundaries are hit
        # both inside sessions (merge) and at real gaps (no merge)
        st.integers(0, 5 * 86400),
        min_size=1,
        max_size=40,
    ),
    users=st.integers(1, 3),
    bucket_hours=st.sampled_from([1, 6, 24]),
)
def test_sessionize_bucketed_equals_plain_property(
    spark, offsets, users, bucket_hours
):
    """x34b property: for ANY event stream — duplicates, ties, and any
    bucket width — the bucketed/stitched plan is row-identical to the
    single-window plan.  This is the equivalence the shared oracle
    checks on the fixture, generalized to adversarial streams where
    sessions straddle and CHAIN across arbitrary bucket boundaries."""
    import datetime as dtm

    from cubefs_hadoop_spark.extensions.behavior import (
        sessionize,
        sessionize_bucketed,
    )

    base = dtm.datetime(2024, 1, 1)
    rows = [
        (i, i % users, base + dtm.timedelta(seconds=off))
        for i, off in enumerate(offsets)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz"
    )
    key = lambda r: (r.user_id, r.session_idx)  # noqa: E731
    want = {
        key(r): (r.session_start, r.session_end, r.events, r.duration_us)
        for r in sessionize(ev).collect()
    }
    got = {
        key(r): (r.session_start, r.session_end, r.events, r.duration_us)
        for r in sessionize_bucketed(
            ev, bucket_us=bucket_hours * 3600 * 1_000_000
        ).collect()
    }
    assert got == want


def test_x74_retention_crafted_and_laws(spark):
    """Crafted event log with a hand-computable cohort matrix; plus the
    fixture laws: offset-0 retention is exactly 1000 (every user is
    active in their first week by definition), n_active <= n_cohort,
    and cohort sizes sum to the distinct user count."""
    from datetime import datetime

    from cubefs_hadoop_spark.catalog import load
    from cubefs_hadoop_spark.extensions.behavior import retention_cohorts
    from cubefs_hadoop_spark.queries import QUERIES
    from tests.conftest import SF_SMOKE

    def ev(uid, day):
        return (uid, datetime(2024, 1, 1 + day, 12, 0, 0))

    # users 1,2 start week 0; user 1 returns weeks 1 and 2, user 2
    # only week 2; user 3 starts week 1 and never returns
    rows = [
        ev(1, 0), ev(1, 7), ev(1, 14),
        ev(2, 1), ev(2, 15),
        ev(3, 8),
    ]
    events = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz"
    )
    m = {
        (r.cohort_week, r.week_offset): (r.n_cohort, r.n_active,
                                         r.retention_milli)
        for r in retention_cohorts(events).collect()
    }
    assert m[(0, 0)] == (2, 2, 1000)
    assert m[(0, 1)] == (2, 1, 500)
    assert m[(0, 2)] == (2, 2, 1000)
    assert m[(1, 0)] == (1, 1, 1000)
    assert set(m) == {(0, 0), (0, 1), (0, 2), (1, 0)}

    fixture = load(spark, SF_SMOKE, "events")
    out = QUERIES["x74_retention_cohorts"](spark, SF_SMOKE).collect()
    users = fixture.select("user_id").distinct().count()
    cohort_sizes = {}
    for r in out:
        assert r.n_active <= r.n_cohort
        assert r.retention_milli == 1000 * r.n_active // r.n_cohort
        if r.week_offset == 0:
            assert r.retention_milli == 1000
        cohort_sizes[r.cohort_week] = r.n_cohort
    assert sum(cohort_sizes.values()) == users


def test_x74_empty_events_raises_value_error(spark):
    """ADVICE r10: an empty (or all-NULL-ts) event frame must fail with
    the reason, not an AttributeError on the None anchor."""
    import pytest as _pytest

    from cubefs_hadoop_spark.extensions.behavior import retention_cohorts

    empty = spark.createDataFrame([], "user_id long, ts timestamp_ntz")
    with _pytest.raises(ValueError, match="no events"):
        retention_cohorts(empty)
    all_null = spark.createDataFrame(
        [(1, None)], "user_id long, ts timestamp_ntz"
    )
    with _pytest.raises(ValueError, match="no events"):
        retention_cohorts(all_null)


def test_x74_retention_random_logs_match_python_reference(spark):
    """Property check on pseudo-random (seeded, deterministic) event
    logs: the cohort matrix equals a brute-force Python reference for
    several shapes — sparse users, a bot user, single-week corpora."""
    from datetime import datetime, timedelta

    from cubefs_hadoop_spark.extensions.behavior import retention_cohorts

    def reference(rows):
        days = {}
        for uid, ts in rows:
            days.setdefault(uid, []).append(ts)
        anchor = min(ts for _, ts in rows).date()
        week = lambda ts: (ts.date() - anchor).days // 7  # noqa: E731
        cohort = {u: min(week(t) for t in ts) for u, ts in days.items()}
        active = {
            (cohort[u], week(t) - cohort[u])
            for u, ts in days.items()
            for t in ts
        }
        # (cohort, off) -> n_active over users
        cells = {}
        for u, ts in days.items():
            for off in {week(t) - cohort[u] for t in ts}:
                cells[(cohort[u], off)] = cells.get((cohort[u], off), 0) + 1
        sizes = {}
        for u, cw in cohort.items():
            sizes[cw] = sizes.get(cw, 0) + 1
        return {
            k: (sizes[k[0]], n, 1000 * n // sizes[k[0]])
            for k, n in cells.items()
        }

    base = datetime(2024, 3, 1, 6, 0, 0)
    rng_rows = []
    # deterministic pseudo-random walk (no RNG): user = i*7 % 13,
    # day = (i*i) % 40 — covers sparse users, repeats, multi-week spans
    for i in range(120):
        rng_rows.append((i * 7 % 13, base + timedelta(days=(i * i) % 40)))
    shapes = [
        rng_rows,
        [(1, base), (1, base + timedelta(days=3))],          # one week
        [(1, base)] * 5 + [(2, base + timedelta(days=21))],  # bot + late
    ]
    for rows in shapes:
        df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
        got = {
            (r.cohort_week, r.week_offset): (
                r.n_cohort, r.n_active, r.retention_milli
            )
            for r in retention_cohorts(df).collect()
        }
        assert got == reference(rows)


def test_x85_transitions_match_python_reference(spark):
    """The transition matrix replays exactly from a brute-force Python
    reference (per-user ordered streams, lead-1 pairs, per-from-type
    milli shares)."""
    from datetime import datetime

    from cubefs_hadoop_spark.extensions.behavior import event_transitions

    rows = [
        (0, datetime(2024, 1, 1, 10, 0), 1, "view"),
        (1, datetime(2024, 1, 1, 10, 5), 1, "click"),
        (2, datetime(2024, 1, 1, 10, 9), 1, "purchase"),
        (3, datetime(2024, 1, 1, 11, 0), 2, "view"),
        (4, datetime(2024, 1, 1, 11, 2), 2, "view"),
        (5, datetime(2024, 1, 1, 11, 4), 2, "click"),
        (6, datetime(2024, 1, 1, 12, 0), 3, "error"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string"
    )
    got = {
        (r.from_type, r.to_type): (r.n, r.p_milli)
        for r in event_transitions(events).collect()
    }
    # user 1: view->click, click->purchase; user 2: view->view,
    # view->click; user 3: no transition
    assert got == {
        ("view", "click"): (2, 666),
        ("view", "view"): (1, 333),
        ("click", "purchase"): (1, 1000),
    }

    fixture = load(spark, SF_SMOKE, "events")
    out = event_transitions(fixture).collect()
    per_from: dict = {}
    for r in out:
        per_from.setdefault(r.from_type, []).append(r)
    n_events = fixture.count()
    n_users = fixture.select("user_id").distinct().count()
    assert sum(r.n for r in out) == n_events - n_users
    for ft, rs in per_from.items():
        tot = sum(r.n for r in rs)
        for r in rs:
            assert r.p_milli == 1000 * r.n // tot, ft


def test_x87_rfm_crafted_and_laws(spark):
    """Crafted users with hand-computable RFM metrics land in the right
    terciles; fixture laws: buckets are 1..3 with near-equal sizes,
    monetary sums only purchase value, empty events raise."""
    from datetime import datetime

    import pytest as _pytest

    from cubefs_hadoop_spark.extensions.behavior import rfm_segments

    rows = [
        # user 1: recent, frequent, big spender -> 1-1-1
        (0, datetime(2024, 1, 9, 12, 0), 1, "purchase", 100.00),
        (1, datetime(2024, 1, 9, 13, 0), 1, "purchase", 50.50),
        (2, datetime(2024, 1, 9, 14, 0), 1, "view", 999.0),
        # user 2: mid everything
        (3, datetime(2024, 1, 5, 12, 0), 2, "purchase", 20.00),
        (4, datetime(2024, 1, 5, 13, 0), 2, "view", 0.0),
        # user 3: stale, one free event -> 3-3-3
        (5, datetime(2024, 1, 1, 12, 0), 3, "view", 500.0),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double",
    )
    got = {
        r.user_id: (
            r.recency_days, r.frequency, r.monetary_cents,
            r.r_bucket, r.f_bucket, r.m_bucket,
        )
        for r in rfm_segments(events).collect()
    }
    assert got[1] == (0, 3, 15050, 1, 1, 1)
    assert got[2] == (4, 2, 2000, 2, 2, 2)
    assert got[3] == (8, 1, 0, 3, 3, 3)

    from cubefs_hadoop_spark.catalog import load
    from tests.conftest import SF_SMOKE

    out = rfm_segments(load(spark, SF_SMOKE, "events")).collect()
    n = len(out)
    for axis in ("r_bucket", "f_bucket", "m_bucket"):
        sizes: dict = {}
        for r in out:
            b = getattr(r, axis)
            assert 1 <= b <= 3
            sizes[b] = sizes.get(b, 0) + 1
        assert max(sizes.values()) - min(sizes.values()) <= 1, axis
    assert sum(1 for r in out if r.recency_days == 0) >= 1

    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double"
    )
    with _pytest.raises(ValueError, match="no events"):
        rfm_segments(empty)


def test_x88_percentiles_match_python_reference(spark):
    """Per-type order statistics replay exactly from sorted Python
    lists (discrete rank 1 + (n-1)·q//100), NULL values excluded,
    totals exact in cents."""
    from datetime import datetime

    from cubefs_hadoop_spark.extensions.behavior import value_percentiles

    base = datetime(2024, 1, 1, 12, 0)
    vals = {
        "purchase": [10.00, 20.00, 30.00, 40.00, 50.00],
        "view": [1.25, 2.50],
        "error": [7.77],
    }
    rows = []
    i = 0
    for t, vs in vals.items():
        for v in vs:
            rows.append((i, base, 1, t, v))
            i += 1
    rows.append((i, base, 1, "view", None))  # NULL excluded
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double",
    )
    got = {
        r.event_type: (r.n, r.total_cents, r.p50_cents, r.p90_cents)
        for r in value_percentiles(events).collect()
    }
    want = {}
    for t, vs in vals.items():
        cs = sorted(round(v * 100) for v in vs)
        n = len(cs)
        want[t] = (
            n,
            sum(cs),
            cs[(n - 1) * 50 // 100],
            cs[(n - 1) * 90 // 100],
        )
    assert got == want

    from cubefs_hadoop_spark.catalog import load
    from tests.conftest import SF_SMOKE

    out = value_percentiles(load(spark, SF_SMOKE, "events")).collect()
    for r in out:
        assert r.p50_cents <= r.p90_cents
        assert r.p90_cents * r.n >= r.total_cents // r.n  # sanity scale


def test_x92_x94_empty_events_match_oracle_degenerate(spark):
    """ADVICE r12: on an events table with no purchases the DuckDB
    oracles yield zero rows; the Spark side must agree — x92 must not
    emit a zeros rollup and x94 must not raise."""
    from cubefs_hadoop_spark.extensions.behavior import (
        copurchase_affinity,
        revenue_concentration,
    )

    empty = spark.createDataFrame(
        [],
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    )
    r = revenue_concentration(empty)
    assert r.columns == ["tier_milli", "users", "revenue_cents", "share_milli"]
    assert r.count() == 0
    c = copurchase_affinity(empty)
    assert c.columns == ["item_a", "item_b", "n_pair", "lift_milli"]
    assert c.count() == 0


def test_x94b_basket_cap_bounds_every_user(spark):
    """x94b (VERDICT r12 #2): the cap truncates a whale basket to
    ``basket_cap`` items BEFORE the pair join — per-pair support can
    never exceed what capped baskets allow, and a crafted whale user
    (1 user x 200 items) contributes at most C(C-1)/2 pairs."""
    from cubefs_hadoop_spark.extensions.behavior import copurchase_affinity

    rows = []
    eid = 0
    # whale: user 1 buys 200 distinct items; 3 normal users share items
    base = dt.datetime(2024, 1, 1)
    for k in range(200):
        rows.append((eid, base, 1, "purchase", 1.0, '{"k": %d}' % k))
        eid += 1
    for u in (2, 3, 4):
        for k in (5, 6, 7):
            rows.append((eid, base, u, "purchase", 1.0, '{"k": %d}' % k))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    )
    cap = 8
    out = copurchase_affinity(ev, k=10_000, min_pair=1, basket_cap=cap)
    pairs = out.collect()
    # total pair support is bounded by sum over users of C(C,2) with
    # C = min(basket, cap): whale 28 + 3 users x 3 = 28 + 9
    assert sum(r.n_pair for r in pairs) <= 28 + 9
    # uncapped, the whale alone contributes 200*199/2 pairs
    unc = copurchase_affinity(ev, k=100_000, min_pair=1)
    assert sum(r.n_pair for r in unc.collect()) == 200 * 199 // 2 + 9
