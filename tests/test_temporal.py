"""As-of join semantics (operators/temporal.py) vs hand-computed truth."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from shacl_validator_spark.operators.temporal import asof_join


def _ts(s):
    return dt.datetime(2026, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10), "l10"),
            (1, _ts(20), "l20"),
            (1, _ts(5), "l5"),   # before any right row
            (2, _ts(10), "l-u2"),  # user with no right rows at all
        ],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(8), "r8"),
            (1, _ts(10), "r10"),  # exact tie with l10 -> inclusive match
            (1, _ts(15), "r15"),
        ],
        "user_id long, ts timestamp, val string",
    )
    return left, right


def test_asof_backward(spark, frames):
    left, right = frames
    out = asof_join(left, right, on=["user_id"], ts_col="ts")
    got = {r["tag"]: (r["asof_val"], r["asof_ts"]) for r in out.collect()}
    assert got["l10"] == ("r10", _ts(10))  # inclusive at equal ts
    assert got["l20"] == ("r15", _ts(15))  # latest at-or-before
    assert got["l5"] == (None, None)       # nothing before
    assert got["l-u2"] == (None, None)     # key absent on the right
    assert out.count() == left.count()     # left rows always survive


def test_asof_forward_and_tolerance(spark, frames):
    left, right = frames
    fwd = asof_join(left, right, on=["user_id"], ts_col="ts", direction="forward")
    got = {r["tag"]: r["asof_val"] for r in fwd.collect()}
    assert got["l5"] == "r8"      # earliest at-or-after
    assert got["l10"] == "r10"    # inclusive
    assert got["l20"] is None     # nothing after
    tol = asof_join(left, right, on=["user_id"], ts_col="ts", tolerance_seconds=2)
    got = {r["tag"]: r["asof_val"] for r in tol.collect()}
    assert got["l10"] == "r10"    # gap 0 <= 2
    assert got["l20"] is None     # gap 5 > 2 nulled

    with pytest.raises(ValueError):
        asof_join(left, right, on=["user_id"], ts_col="ts", direction="nearest")


def test_asof_plan_is_single_window_pass(spark, frames):
    """The operator must compile to union + window — never a range join
    (BroadcastNestedLoopJoin / CartesianProduct), which is the quadratic
    trap at scale."""
    left, right = frames
    plan = (
        asof_join(left, right, on=["user_id"], ts_col="ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_inner_and_left(spark):
    """Bucketed range join vs a brute-force reference, across bucket
    widths (correctness must not depend on bucket_seconds)."""
    import datetime as dt

    from shacl_validator_spark.operators.temporal import range_join

    T0 = dt.datetime(2024, 1, 1)

    def at(minutes):
        return T0 + dt.timedelta(minutes=minutes)

    points = [(i, at(m)) for i, m in enumerate([0, 30, 61, 95, 200, 1500])]
    intervals = [
        (100, at(0), at(60)),      # covers p0, p1, p61? 61>60 no
        (101, at(45), at(100)),    # covers p2(61), p3(95), p1(30)? no: 30<45
        (102, at(90), at(90)),     # degenerate single-instant, matches none
        (103, at(1400), at(2000)), # long interval spanning many buckets
    ]
    p_df = spark.createDataFrame(points, ["pid", "ts"])
    i_df = spark.createDataFrame(intervals, ["iid", "s", "e"])

    want = {
        (p, i)
        for p, pt in points
        for i, s, e in intervals
        if s <= pt <= e
    }
    for width in (60, 3600, 86400):
        got = {
            (r["pid"], r["iid"])
            for r in range_join(p_df, i_df, "ts", "s", "e", bucket_seconds=width).collect()
        }
        assert got == want, width

    left = range_join(
        p_df, i_df, "ts", "s", "e", bucket_seconds=3600, how="left", point_id="pid"
    ).collect()
    pairs = {(r["pid"], r["iid"]) for r in left}
    assert {pr for pr in pairs if pr[1] is not None} == want
    matched_pids = {p for p, _ in want}
    assert {p for p, i in pairs if i is None} == {p for p, _ in points} - matched_pids
    import pytest

    with pytest.raises(ValueError):
        range_join(p_df, i_df, "ts", "s", "e", how="left")
    with pytest.raises(ValueError):
        range_join(p_df, i_df, "ts", "s", "e", how="full")


def test_interval_join_exactly_once(spark):
    """Overlap join vs brute force; pairs sharing MANY buckets must still
    appear exactly once (the max-start-bucket trick)."""
    import datetime as dt

    from shacl_validator_spark.operators.temporal import interval_join

    T0 = dt.datetime(2024, 1, 1)

    def at(m):
        return T0 + dt.timedelta(minutes=m)

    lefts = [
        (1, at(0), at(600)),     # 10h — spans many 1h buckets
        (2, at(30), at(40)),
        (3, at(700), at(710)),
        (4, at(100), at(100)),   # instant
    ]
    rights = [
        (10, at(5), at(595)),    # overlaps 1 in ~10 shared buckets, 2, 4
        (11, at(39), at(45)),    # overlaps 1, 2 (at minute 39-40)
        (12, at(650), at(705)),  # overlaps 3 only
        (13, at(800), at(900)),  # overlaps none
    ]
    l_df = spark.createDataFrame(lefts, ["lid", "ls", "le"])
    r_df = spark.createDataFrame(rights, ["rid", "rs", "re"])
    want = {
        (li, ri)
        for li, ls, le in lefts
        for ri, rs, re in rights
        if ls <= re and rs <= le
    }
    for width in (60, 3600, 86400):
        rows = interval_join(
            l_df, r_df, ("ls", "le"), ("rs", "re"), bucket_seconds=width
        ).collect()
        got = [(r["lid"], r["rid"]) for r in rows]
        assert sorted(got) == sorted(want), width  # exactly once, no dups


def test_range_join_shared_columns_and_guards(spark):
    """Shared column names must be an explicit error (silent NULL clobber
    was the failure mode), and interval_prefix must disambiguate — both
    inner and left paths."""
    import datetime as dt

    import pytest
    from shacl_validator_spark.operators.temporal import interval_join, range_join

    T0 = dt.datetime(2024, 1, 1)

    def at(m):
        return T0 + dt.timedelta(minutes=m)

    # both sides carry a 'source' column
    p_df = spark.createDataFrame(
        [(0, at(30), "web"), (1, at(500), "app")], ["pid", "ts", "source"]
    )
    i_df = spark.createDataFrame(
        [(100, at(0), at(60), "ops")], ["iid", "s", "e", "source"]
    )
    with pytest.raises(ValueError, match="share columns"):
        range_join(p_df, i_df, "ts", "s", "e")
    rows = range_join(
        p_df, i_df, "ts", "s", "e", how="left", point_id="pid",
        interval_prefix="iv_",
    ).collect()
    by_pid = {r["pid"]: r for r in rows}
    assert by_pid[0]["source"] == "web" and by_pid[0]["iv_source"] == "ops"
    # the unmatched point keeps ITS OWN source; interval columns are NULL
    assert by_pid[1]["source"] == "app" and by_pid[1]["iv_iid"] is None

    with pytest.raises(ValueError, match="share columns"):
        interval_join(
            p_df.select("pid", F.col("ts").alias("a"), F.col("ts").alias("b"), "source"),
            i_df, ("a", "b"), ("s", "e"),
        )
    ov = interval_join(
        p_df.select("pid", F.col("ts").alias("a"), F.col("ts").alias("b"), "source"),
        i_df, ("a", "b"), ("s", "e"), right_prefix="r_",
    ).collect()
    assert {(r["pid"], r["r_iid"]) for r in ov} == {(0, 100)}
    assert all(r["source"] in ("web", "app") and r["r_source"] == "ops" for r in ov)

    with pytest.raises(ValueError, match="bucket_seconds"):
        range_join(p_df, i_df, "ts", "s", "e", bucket_seconds=0, interval_prefix="iv_")
    with pytest.raises(ValueError, match="bucket_seconds"):
        interval_join(
            p_df.select("pid", F.col("ts").alias("a"), F.col("ts").alias("b")),
            i_df, ("a", "b"), ("s", "e"), bucket_seconds=-1,
        )


def test_asof_null_timestamps(spark):
    """NULL timestamps follow the DuckDB ASOF contract: a null-ts right
    row is never a match; a null-ts left row gets an all-NULL non-match
    (both directions)."""
    left = spark.createDataFrame(
        [(1, _ts(3), "early"), (1, None, "null-ts"), (1, _ts(20), "late")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, None, "phantom"), (1, _ts(10), "r10")],
        "user_id long, ts timestamp, val string",
    )
    back = {r["tag"]: r for r in asof_join(left, right, ["user_id"]).collect()}
    assert back["early"]["asof_val"] is None      # no phantom carry
    assert back["null-ts"]["asof_val"] is None
    assert back["late"]["asof_val"] == "r10"
    fwd = {
        r["tag"]: r
        for r in asof_join(left, right, ["user_id"], direction="forward").collect()
    }
    assert fwd["early"]["asof_val"] == "r10"
    assert fwd["null-ts"]["asof_val"] is None     # NULLS-LAST would mismatch
    assert fwd["late"]["asof_val"] is None
