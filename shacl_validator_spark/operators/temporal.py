"""Temporal join operators.

``asof_join`` is the classic operator Spark's DataFrame API lacks: for
every left row, attach the latest right row at-or-before its timestamp
(direction="backward"; "forward" = earliest at-or-after).  Event
pipelines need it constantly — last model checkpoint before an event,
most recent profile snapshot for a click, sensor reading in effect at a
reading.

Spark-first design: the naive formulation is a range join
(``r.ts <= l.ts`` non-equi condition), which Spark executes as a
broadcast nested loop or a sort-merge with per-key quadratic scan — both
collapse when one user has millions of events.  Instead we UNION the two
sides, tag them, and run ONE window pass per key ordered by
(ts, side-tag): a last-non-null carry-forward hands every left row the
most recent right payload.  Cost: one shuffle on the key, linear scan per
partition — the same shape as sessionization, and skew behaves like any
window (a hot key concentrates but never goes quadratic).

DuckDB implements ``ASOF JOIN`` natively, which this operator uses as its
correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    right_prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row plus the temporally closest right
    row per key (NULLs when none exists).

    - ``on``: equality key columns (present in both sides).
    - ``right_cols``: right payload columns to attach (default: everything
      but ``on`` + ``ts_col``); attached as ``{right_prefix}{name}``, plus
      ``{right_prefix}{ts_col}`` for the matched timestamp.
    - ``direction``: "backward" (right.ts <= left.ts, latest wins — the
      DuckDB/pandas default) or "forward" (right.ts >= left.ts, earliest
      wins).  Both inclusive.
    - ``tolerance_seconds``: when set, matches farther than this are
      nulled out (pandas ``merge_asof`` tolerance semantics).

    Tie semantics: among right rows sharing the winning timestamp the one
    last in (ts, input-order) wins — pass a deterministic right-side sort
    column inside ``right_cols`` and pre-sort, or dedup the right side,
    if byte-stable payloads matter; the matched TIMESTAMP is always
    deterministic.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    right_cols = (
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c not in set(on) | {ts_col}]
    )
    # NULL-timestamp semantics (the DuckDB ASOF oracle's): a right row with
    # ts NULL can never be a match — dropped up front (NULLS FIRST under
    # the ascending sort would otherwise carry it into every unmatched left
    # row); a left row with ts NULL gets an all-NULL non-match — enforced
    # by nulling the carried match at the end (NULLS LAST under the
    # descending forward sort would otherwise hand it a real match).
    right = right.filter(F.col(ts_col).isNotNull())
    payload = F.struct(
        F.col(ts_col).alias("_ts"), *[F.col(c) for c in right_cols]
    )
    left_payload_t = left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
    right_u = right.select(
        *on,
        F.col(ts_col).alias("_t"),
        payload.alias("_rv"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left_payload_t).alias("_lv"),
    )
    left_u = left.select(
        *on,
        F.col(ts_col).alias("_t"),
        F.lit(None).cast(right_u.schema["_rv"].dataType).alias("_rv"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_lv"),
    )
    # backward: ascending ts, right rows (side 0) sort before left rows at
    # equal ts so the match is INCLUSIVE; forward: descending ts, same tag
    # order gives inclusive >=
    order = [F.col("_t").asc(), F.col("_side").asc()] if direction == "backward" else [
        F.col("_t").desc(),
        F.col("_side").asc(),
    ]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        left_u.unionByName(right_u)
        .withColumn("_match", F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    matched = matched.withColumn(
        "_match", F.when(F.col("_t").isNotNull(), F.col("_match"))
    )
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("_t").cast("double") - F.col("_match._ts").cast("double")
        )
        matched = matched.withColumn(
            "_match", F.when(gap <= tolerance_seconds, F.col("_match"))
        )
    out = matched.select(
        *[F.col(f"_lv.{c}").alias(c) for c in left.columns],
        F.col("_match._ts").alias(f"{right_prefix}{ts_col}"),
        *[F.col(f"_match.{c}").alias(f"{right_prefix}{c}") for c in right_cols],
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
    point_id: str | None = None,
    interval_prefix: str = "",
) -> DataFrame:
    """Point-in-interval join — the OTHER join type Spark lacks natively:
    every point row paired with every interval row whose
    ``[start_col, end_col]`` (inclusive both ends) contains
    ``point_col``.  Maintenance windows over events, price validity
    ranges over trades, campaign windows over clicks.

    Spark-first design: the naive ``ON p BETWEEN s AND e`` non-equi
    condition plans as BroadcastNestedLoopJoin — quadratic and
    broadcast-bound.  Instead both sides are mapped onto fixed
    ``bucket_seconds`` time buckets: a point lands in exactly ONE bucket,
    an interval explodes to the buckets it covers, and the join becomes a
    bucket-keyed EQUI-join + a residual between-filter.  Each qualifying
    (point, interval) pair meets in exactly one bucket — the point's — so
    no post-join dedup is needed.

    ``how="left"`` keeps unmatched points with NULL interval columns (an
    anti-join of the matched ``point_id`` set back onto ``points``;
    requires ``point_id``, a unique point key).

    Scale notes (100 TB): shuffle is on the bucket id — pick
    ``bucket_seconds`` near the MEDIAN interval length so a typical
    interval explodes to ~2 buckets (the explode factor is
    ``len/bucket + 1``); a pathological year-long interval at hour
    buckets explodes to ~9k rows, which is still dimension-sized — cap
    upstream if intervals are adversarial.  Hot buckets (event spikes)
    behave like any equi-join skew: AQE skew-join splits them.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how}")
    if how == "left" and point_id is None:
        raise ValueError("how='left' needs point_id (a unique point key)")
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be positive, got {bucket_seconds}")
    shared = set(points.columns) & set(intervals.columns)
    if interval_prefix:
        intervals = intervals.select(
            *[F.col(c).alias(f"{interval_prefix}{c}") for c in intervals.columns]
        )
        start_col = f"{interval_prefix}{start_col}"
        end_col = f"{interval_prefix}{end_col}"
    elif shared:
        raise ValueError(
            f"points and intervals share columns {sorted(shared)}; pass "
            "interval_prefix to disambiguate the interval side"
        )
    p_bucket = F.floor(F.unix_timestamp(F.col(point_col)) / bucket_seconds)
    i_buckets = F.sequence(
        F.floor(F.unix_timestamp(F.col(start_col)) / bucket_seconds),
        F.floor(F.unix_timestamp(F.col(end_col)) / bucket_seconds),
    )
    p = points.withColumn("_rb", p_bucket)
    i = intervals.withColumn("_rb", F.explode(i_buckets))
    matched = p.join(i, "_rb").filter(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col))
    ).drop("_rb")
    if how == "inner":
        return matched
    # left: points whose id never matched get one NULL-extended row
    dtypes = dict(intervals.dtypes)
    unmatched = points.join(
        matched.select(point_id).distinct(), point_id, "left_anti"
    )
    for c in intervals.columns:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(dtypes[c]))
    return matched.unionByName(unmatched)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_range: tuple[str, str],
    right_range: tuple[str, str],
    bucket_seconds: int = 3600,
    right_prefix: str = "",
) -> DataFrame:
    """Interval-overlap join: every (left, right) pair whose closed ranges
    ``[l_start, l_end]`` and ``[r_start, r_end]`` overlap — session
    overlap, concurrent-incident correlation, ad-window × outage-window
    attribution.

    Spark-first design, one step past ``range_join``: BOTH sides explode
    onto fixed time buckets, but an overlapping pair would meet in every
    shared bucket — so the join keeps a pair only in the bucket of
    ``max(l_start, r_start)``.  When two intervals overlap, the later
    start lies inside both ranges, hence that bucket is covered by both
    sides and the pair survives in EXACTLY ONE bucket: equi-join +
    residual filter, no dedup, no nested loop.

    Scale notes (100 TB): shuffle is bucket-keyed; explode factor per row
    is ``len/bucket + 1`` (pick ``bucket_seconds`` near the median
    interval length); skewed buckets split under AQE like any equi-join.
    """
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be positive, got {bucket_seconds}")
    ls, le = left_range
    rs, re_ = right_range
    shared = set(left.columns) & set(right.columns)
    if right_prefix:
        right = right.select(
            *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
        )
        rs, re_ = f"{right_prefix}{rs}", f"{right_prefix}{re_}"
    elif shared:
        raise ValueError(
            f"left and right share columns {sorted(shared)}; pass "
            "right_prefix to disambiguate the right side"
        )

    def buckets(s: str, e: str):
        return F.sequence(
            F.floor(F.unix_timestamp(F.col(s)) / bucket_seconds),
            F.floor(F.unix_timestamp(F.col(e)) / bucket_seconds),
        )

    l = left.withColumn("_ib", F.explode(buckets(ls, le)))
    r = right.withColumn("_ib", F.explode(buckets(rs, re_)))
    later_start = F.greatest(F.col(ls), F.col(rs))
    return (
        l.join(r, "_ib")
        .filter(
            (F.col(ls) <= F.col(re_))
            & (F.col(rs) <= F.col(le))
            & (
                F.col("_ib")
                == F.floor(F.unix_timestamp(later_start) / bucket_seconds)
            )
        )
        .drop("_ib")
    )
