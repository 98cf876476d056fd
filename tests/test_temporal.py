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
