"""Window-function library (SURVEY.md §2.5, W1–W24).

The heart of the reference is per-ticker ordered-by-time rolling computation
(`etl/time_series_feature_builder.py`, `etl/regime_detector.py`). Here every
feature is a ``Window.partitionBy(keys).orderBy(ts)`` expression:

- one shuffle per distinct partitioning, shared by every feature built on it
  (Catalyst collapses same-window expressions into a single Window physical
  node — check with ``.explain``);
- at 100 TB the partition key (ticker / user) is the natural shard: millions
  of groups, each small, so the sort inside each is cheap and skew-free.

All helpers take and return DataFrames/Columns; nothing leaves the JVM.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def by_key_ordered(keys: Sequence[str], order: str | Column = "ts") -> WindowSpec:
    return Window.partitionBy(*keys).orderBy(order)


def rolling(keys: Sequence[str], order: str | Column, k: int) -> WindowSpec:
    """Trailing k-row frame (pandas ``rolling(k)`` with min_periods=1) —
    reference `etl/time_series_feature_builder.py:111-115`."""
    return Window.partitionBy(*keys).orderBy(order).rowsBetween(-(k - 1), 0)


def cumulative(keys: Sequence[str], order: str | Column) -> WindowSpec:
    return (
        Window.partitionBy(*keys)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )


def with_lag_features(
    df: DataFrame,
    value: str,
    keys: Sequence[str],
    order: str,
    lags: Sequence[int] = (1, 5, 10, 20),
) -> DataFrame:
    """W1/W2: lag levels + lag returns `close/lag(close,k)-1` —
    reference `etl/time_series_feature_builder.py:106-119`."""
    w = by_key_ordered(keys, order)
    for k in lags:
        df = df.withColumn(f"{value}_lag_{k}", F.lag(value, k).over(w))
        df = df.withColumn(
            f"{value}_ret_{k}", F.col(value) / F.col(f"{value}_lag_{k}") - 1
        )
    return df


def with_rolling_stats(
    df: DataFrame,
    value: str,
    keys: Sequence[str],
    order: str,
    windows: Sequence[int] = (5, 10, 20, 60),
) -> DataFrame:
    """W3: rolling mean/std per window size, min_periods=1 semantics."""
    for k in windows:
        w = rolling(keys, order, k)
        df = df.withColumn(f"{value}_mean_{k}", F.avg(value).over(w))
        df = df.withColumn(f"{value}_std_{k}", F.stddev_samp(value).over(w))
    return df


def downside_vol(ret: Column, w: WindowSpec) -> Column:
    """W4: std of negative-only returns — `etl/time_series_feature_builder.py:151-152`."""
    return F.stddev_samp(F.when(ret < 0, ret)).over(w)


def drawdown(value: Column, w_cum: WindowSpec) -> Column:
    """W5/W14: value / running-max − 1 — `etl/portfolio_math.py:135-138`."""
    return value / F.max(value).over(w_cum) - 1


def ewma(value: Column, w_rows: WindowSpec, alpha: float, k: int) -> Column:
    """W11: truncated closed-form EWMA — sum_i α(1−α)^i · lag_i over the last
    ``k`` rows, normalized by the matching weight sum (pandas ``ewm(adjust=True)``
    truncated). Native-SQL alternative to a per-group pandas UDF; exact EWMA
    lives in forecast/ewma.py. Reference `forcester_ts/forecaster.py:334-335`.
    """
    terms = [
        F.lag(value, i).over(w_rows) * F.lit((1 - alpha) ** i) for i in range(k)
    ]
    num = sum(
        (F.when(t.isNotNull(), t).otherwise(F.lit(0.0)) for t in terms),
        start=F.lit(0.0),
    )
    den = sum(
        (
            F.when(t.isNotNull(), F.lit((1 - alpha) ** i)).otherwise(F.lit(0.0))
            for i, t in enumerate(terms)
        ),
        start=F.lit(0.0),
    )
    return num / den


def gap_run_length(
    df: DataFrame, flag: Column, keys: Sequence[str], order: str
) -> DataFrame:
    """W9: run-length encoding of a boolean flag per key — cumsum of
    change-points ids the run, then a count per run. Reference
    `etl/time_series_feature_builder.py:122-129` (missing-gap runs).

    Output adds ``run_id`` (per-key dense id) and ``run_len``.
    """
    w = by_key_ordered(keys, order)
    changed = (
        flag.cast("int") != F.lag(flag.cast("int"), 1, -1).over(w)
    ).cast("int")
    df = df.withColumn("_flag", flag.cast("int")).withColumn(
        "run_id", F.sum(changed).over(cumulative(keys, order))
    )
    w_run = Window.partitionBy(*keys, "run_id")
    return df.withColumn("run_len", F.count(F.lit(1)).over(w_run))


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the event is more
    than ``gap_seconds`` after the previous one for the same key. Batch
    equivalent of Structured Streaming ``session_window`` (§2.9); the
    reference's closest analog is the gap run-length (W9).
    """
    from portofolio_maximizer_spark.functions.scalars import epoch_seconds

    w = by_key_ordered(keys, ts)
    prev = F.lag(ts, 1).over(w)
    new_session = (
        prev.isNull()
        | (epoch_seconds(F.col(ts)) - epoch_seconds(prev) > gap_seconds)
    ).cast("int")
    return df.withColumn(
        "session_id", F.sum(new_session).over(cumulative(keys, ts))
    )


def cross_sectional_rank(value: Column, ts_key: str) -> Column:
    """W15: percent-rank across keys within each timestamp —
    `etl/time_series_feature_builder.py:159-166`."""
    return F.percent_rank().over(Window.partitionBy(ts_key).orderBy(value))


def cross_sectional_zscore(value: Column, ts_key: str) -> Column:
    """W16: z-score within each timestamp — `:168-177`."""
    w = Window.partitionBy(ts_key)
    return (value - F.avg(value).over(w)) / F.stddev_samp(value).over(w)


def forward_return(value: Column, w: WindowSpec, n: int) -> Column:
    """W24: N-step forward return for label generation —
    `scripts/run_etl_pipeline.py:441-480`."""
    return F.lead(value, n).over(w) / value - 1


def _order_exprs(order_cols: Sequence) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_cols]


def scalable_prefix_sums(
    df: DataFrame,
    order_cols: Sequence,
    value_cols: dict[str, Column | str],
    num_partitions: int = 32,
    with_totals: bool = False,
):
    """Globally-ordered running sums WITHOUT a single-partition window.

    ``SUM(x) OVER (ORDER BY ...)`` funnels the whole table through one
    task — fine at sf0.1, fatal at 100 TB. This is the classic two-pass
    prefix sum instead, for any number of integral value columns in ONE
    repartition:

    1. range-repartition on the order keys (partition i holds a contiguous
       key range, ranges ascend with partition id — the contract
       ``repartitionByRange`` provides and ``sortWithinPartitions`` relies
       on), pinned with ``localCheckpoint`` so the partition assignment is
       computed once;
    2. per-partition local cumulative sums (parallel windows, no global
       sort);
    3. per-partition totals — a ``num_partitions``-row aggregate collected
       to the driver (the same driver-side step ``zipWithIndex`` uses) and
       broadcast back as exclusive prefix offsets.

    ``offset(pid) + local_cum`` equals the global running sum exactly for
    integral values regardless of where the range boundaries fall. Ties
    across partition boundaries are impossible when ``order_cols`` ends in
    a unique tiebreaker (every caller here orders by a key suffix that is
    unique). ``order_cols`` entries may be Columns (e.g. ``desc()``) —
    ``repartitionByRange`` honors the sort direction.

    ``value_cols`` maps output column name → input column/expression
    (inclusive running sum). With ``with_totals`` also returns the grand
    totals dict {out_col: total} computed from the already-collected
    per-partition sums (no extra action).

    NULL handling: NULL values count as 0 in the running sum (the value
    expressions are coalesced to 0 up front, so an all-NULL partition
    contributes a 0 offset instead of crashing the driver fold). This
    diverges from ``SUM() OVER`` — which stays NULL until the first
    non-null — only on frames that contain NULL values; every caller
    here feeds non-null counts/amounts.
    """
    oexp = _order_exprs(order_cols)
    proj = df.select(
        "*", *[
            F.coalesce(
                (F.col(v) if isinstance(v, str) else v), F.lit(0)
            ).alias(f"_v_{out}")
            for out, v in value_cols.items()
        ]
    )
    part = (
        proj.repartitionByRange(num_partitions, *oexp)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    vnames = [f"_v_{out}" for out in value_cols]
    totals = (
        part.groupBy("_pid")
        .agg(*[F.sum(v).alias(v) for v in vnames])
        .collect()
    )
    offsets: dict[int, list[int]] = {}
    acc = [0] * len(vnames)
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = list(acc)
        for i, v in enumerate(vnames):
            acc[i] += row[v]
    spark = df.sparkSession
    off_schema = ", ".join(
        ["_pid int"] + [f"_off_{out} long" for out in value_cols]
    )
    off_df = spark.createDataFrame(
        [(pid, *offs) for pid, offs in offsets.items()], off_schema
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*oexp)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out_df = part.join(F.broadcast(off_df), "_pid")
    for out in value_cols:
        out_df = out_df.withColumn(
            out, F.col(f"_off_{out}") + F.sum(f"_v_{out}").over(w_local)
        )
    out_df = out_df.drop(
        "_pid", *[f"_off_{o}" for o in value_cols], *vnames
    )
    if with_totals:
        return out_df, dict(zip(value_cols, acc))
    return out_df


def scalable_running_sum(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "running_sum",
    num_partitions: int = 32,
) -> DataFrame:
    """Single-column convenience wrapper over ``scalable_prefix_sums``."""
    return scalable_prefix_sums(
        df, order_cols, {out_col: value_col}, num_partitions
    )


def scalable_row_number(
    df: DataFrame,
    order_cols: Sequence,
    out_col: str = "rn",
    num_partitions: int = 32,
    with_total: bool = False,
):
    """Globally-ordered ``row_number`` without a single-partition window —
    an inclusive two-pass prefix sum of ones. With ``with_total`` also
    returns the total row count (free: the last driver-side offset)."""
    res = scalable_prefix_sums(
        df,
        order_cols,
        {out_col: F.lit(1).cast("long")},
        num_partitions,
        with_totals=with_total,
    )
    if with_total:
        out_df, totals = res
        return out_df, totals[out_col]
    return res


def closed_form_ntile(rk_col, total: int, n: int):
    """SQL-standard ``NTILE(n)`` bucket (1-based) from a global 1-based
    row-number column and the driver-known total: the first ``total % n``
    buckets hold ``total // n + 1`` rows. Pairs with
    ``scalable_row_number`` so no single-partition window is ever
    needed for a global NTILE — both engines share this definition, so
    oracle NTILEs match exactly."""
    q, r = divmod(total, n)
    rn0 = rk_col - 1
    return (
        F.when(rn0 < r * (q + 1), F.floor(rn0 / (q + 1)) + 1)
        .otherwise(
            F.lit(r)
            + F.floor((rn0 - r * (q + 1)) / F.greatest(F.lit(q), F.lit(1)))
            + 1
        )
        .cast("int")
    )


def scalable_lag(
    df: DataFrame,
    order_cols: Sequence,
    value_col: str,
    out_col: str,
    num_partitions: int = 32,
) -> DataFrame:
    """Globally-ordered ``LAG(value) OVER (ORDER BY ...)`` without a
    single-partition window — the two-pass partition-boundary exchange:

    1. range-repartition on the order keys + ``localCheckpoint`` (one
       partition = one contiguous key range, ascending with pid);
    2. collect each partition's LAST value in order (a ``num_partitions``-
       row ``max_by`` aggregate over a struct wrapper, so a NULL last
       value is carried as NULL rather than skipped) and carry it across
       empty partitions on the driver so pid *i* knows the value
       preceding its first row;
    3. local per-partition lag; ONLY the first row of each partition
       (``row_number() == 1``) takes the carried boundary value — a
       mid-partition row whose true predecessor value is NULL keeps
       NULL, exactly like ``LAG``.

    Exact for any value type, including NULL values; the global first
    row stays NULL. Requires ``order_cols`` to end in a unique
    tiebreaker (total order)."""
    if not all(isinstance(c, str) for c in order_cols):
        raise ValueError("scalable_lag requires plain ascending order cols")
    oexp = _order_exprs(order_cols)
    part = (
        df.repartitionByRange(num_partitions, *oexp)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    order_plain = list(order_cols)
    last_rows = (
        part.groupBy("_pid")
        .agg(
            F.max_by(
                F.struct(F.col(value_col).alias("v")),
                F.struct(*order_plain),
            ).alias("_last")
        )
        .collect()
    )
    prev: dict[int, object] = {}
    carried = None
    for row in sorted(last_rows, key=lambda r: r["_pid"]):
        prev[row["_pid"]] = carried
        carried = row["_last"]["v"] if row["_last"] is not None else None
    spark = df.sparkSession
    vtype = dict(part.dtypes)[value_col]
    off_df = spark.createDataFrame(
        [(pid, pv) for pid, pv in prev.items()],
        f"_pid int, _prev {vtype}",
    )
    w_local = Window.partitionBy("_pid").orderBy(*oexp)
    return (
        part.join(F.broadcast(off_df), "_pid", "left")
        .withColumn(
            out_col,
            F.when(
                F.row_number().over(w_local) == 1, F.col("_prev")
            ).otherwise(F.lag(value_col).over(w_local)),
        )
        .drop("_pid", "_prev")
    )
