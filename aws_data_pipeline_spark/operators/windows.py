"""Window-function operators (SURVEY.md §2.5: top-k per group, running
aggregates, lag/lead deltas, sessionization)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Per-group top-k via row_number — the scalable replacement for global sorts.

    Always pass a total order (tie-break on a unique key) so results are
    deterministic and re-runnable.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def running_sum(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    value_col: str,
    out_col: str = "running_total",
    scale: str = "decimal(30,2)",
) -> DataFrame:
    """Cumulative sum over an unbounded-preceding frame, decimal-exact so the
    prefix sums are order-of-evaluation independent."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        out_col, F.sum(F.col(value_col).cast(scale)).over(w).cast("double")
    )


def lag_delta_days(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    ts_col: str,
    out_col: str = "days_since_prev",
) -> DataFrame:
    """Days elapsed since the previous row in the partition (null for first)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(
        out_col, F.datediff(F.col(ts_col), F.lag(F.col(ts_col)).over(w))
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
    tiebreak: str | None = None,
) -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the gap to
    the previous event exceeds ``gap_seconds``; session id is the running
    count of session starts per key. Two window passes over one shuffle on
    ``key`` — the batch twin of Structured Streaming's session_window.

    Pass ``tiebreak`` (a unique key, e.g. event_id) to make the window order
    total: with timestamp ties and no tie-break, ``lag`` pairs rows
    nondeterministically and session boundaries can flip between runs.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # gap in FRACTIONAL seconds (timestamp -> double keeps microseconds):
    # unix_timestamp truncates to whole seconds, which mis-decides
    # boundaries by up to ~1s on sub-second data and diverges from both
    # the streaming session_window twin and the DuckDB oracle's epoch()
    is_new = (
        prev_ts.isNull()
        | (
            F.col(ts_col).cast("double") - prev_ts.cast("double")
            > gap_seconds
        )
    ).cast("long")
    return df.withColumn("__new", is_new).withColumn(
        session_col, F.sum("__new").over(wrun)
    ).drop("__new")
