"""Streaming report analytics: watermarked windowed aggregations and a
custom stateful operator.

The reference itself is strictly batch (SURVEY.md §2.9), so these are the
streaming skins of its analytics: A2's severity summary as a tumbling-window
aggregate with late-data handling, and a per-focus-node session operator via
``applyInPandasWithState`` (the custom-stateful surface the DataFrame API
cannot express declaratively).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_severity_counts(
    results_stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """A2 (severity summary) over a result stream: tumbling windows with a
    watermark so late rows beyond ``watermark`` are dropped and window state
    is bounded — the standard scale guard for unbounded streams."""
    return (
        results_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("resultSeverity"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "resultSeverity",
            "n",
        )
    )


_SESSION_SCHEMA = T.StructType(
    [
        T.StructField("focusNode", T.StringType(), False),
        T.StructField("n_results", T.LongType(), False),
        T.StructField("first_ts", T.TimestampType(), True),
        T.StructField("last_ts", T.TimestampType(), True),
        T.StructField("closed", T.BooleanType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("first_ts", T.TimestampType(), True),
        T.StructField("last_ts", T.TimestampType(), True),
    ]
)


def focus_sessions(
    results_stream: DataFrame,
    timeout_ms: int = 60_000,
    ts_col: str = "ts",
) -> DataFrame:
    """Custom stateful operator: per-focus-node violation sessions via
    ``applyInPandasWithState`` — accumulates result counts per focus node
    and emits a closed session row when the processing-time timeout fires.

    This is the pattern for streaming state the built-in operators cannot
    express (running per-key accumulators with custom close semantics);
    state is partitioned by focusNode, so it scales like any keyed shuffle.
    """

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (focus,) = key
        if state.hasTimedOut:
            n, first_ts, last_ts = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "focusNode": focus,
                        "n_results": n,
                        "first_ts": first_ts,
                        "last_ts": last_ts,
                        "closed": True,
                    }
                ]
            )
            return
        n, first_ts, last_ts = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            ts = pd.to_datetime(pdf[ts_col])
            first_ts = ts.min() if first_ts is None else min(first_ts, ts.min())
            last_ts = ts.max() if last_ts is None else max(last_ts, ts.max())
        state.update((n, first_ts, last_ts))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            [
                {
                    "focusNode": focus,
                    "n_results": n,
                    "first_ts": first_ts,
                    "last_ts": last_ts,
                    "closed": False,
                }
            ]
        )

    return results_stream.groupBy("focusNode").applyInPandasWithState(
        fn,
        outputStructType=_SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
