"""S-layer: atomic sink, keyed upsert, content-hashed checkpoints,
retention, format adapters, seeded synthetic bars (SURVEY §2.1 + §5
statistical validation of the synthetic generator)."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from portofolio_maximizer_spark.sources import io as IO
from portofolio_maximizer_spark.sources.synthetic import synthetic_bars


@pytest.fixture()
def small_df(spark):
    return spark.createDataFrame(
        [(t, d, float(v)) for t, d, v in [
            ("AAPL", "2024-01-01", 100.0),
            ("AAPL", "2024-01-02", 101.0),
            ("MSFT", "2024-01-01", 300.0),
        ]],
        "ticker string, date string, close double",
    )


def test_upsert_new_rows_win(spark, small_df, tmp_path):
    path = str(tmp_path / "bars")
    IO.write_parquet(small_df, path)
    update = spark.createDataFrame(
        [("AAPL", "2024-01-02", 999.0), ("GOOG", "2024-01-01", 150.0)],
        "ticker string, date string, close double",
    )
    out = IO.upsert_parquet(spark, path, update, keys=["ticker", "date"])
    rows = {(r.ticker, r.date): r.close for r in out.collect()}
    assert rows[("AAPL", "2024-01-02")] == 999.0  # updated
    assert rows[("AAPL", "2024-01-01")] == 100.0  # untouched
    assert rows[("GOOG", "2024-01-01")] == 150.0  # inserted
    assert len(rows) == 4


def test_checkpoint_fingerprint_and_retention(spark, small_df, tmp_path):
    root = str(tmp_path / "ckpt")
    m1 = IO.checkpoint_stage(small_df, root, "clean", run_id="r1")
    m2 = IO.checkpoint_stage(small_df, root, "clean", run_id="r2")
    # same content → same fingerprint, regardless of run
    assert m1["fingerprint"] == m2["fingerprint"]
    # fingerprint is partition-layout independent
    assert IO.content_fingerprint(small_df.repartition(7)) == m1["fingerprint"]
    # different content → different fingerprint
    assert (
        IO.content_fingerprint(small_df.filter(F.col("ticker") == "AAPL"))
        != m1["fingerprint"]
    )
    df, meta = IO.latest_checkpoint(spark, root, "clean")
    assert meta["run_id"] == "r2"
    assert df.count() == 3
    IO.checkpoint_stage(small_df, root, "clean", run_id="r3")
    doomed = IO.cleanup_checkpoints(root, "clean", keep_n=1)
    assert doomed == ["r1", "r2"]
    assert os.listdir(os.path.join(root, "clean")) == ["r3"]


def test_csv_json_roundtrip(spark, small_df, tmp_path):
    schema = "ticker string, date string, close double"
    IO.write_csv(small_df, str(tmp_path / "c"))
    IO.write_json(small_df, str(tmp_path / "j"))
    c = IO.read_csv(spark, str(tmp_path / "c"), schema)
    j = IO.read_json(spark, str(tmp_path / "j"), schema)
    want = sorted(map(tuple, small_df.collect()))
    assert sorted(map(tuple, c.collect())) == want
    assert sorted(map(tuple, j.collect())) == want


def test_synthetic_bars_statistics(spark):
    """SURVEY §5: distributional checks on the seeded generator — GBM log
    returns must match (μ−σ²/2, σ) and bars must be OHLC-consistent."""
    mu, sigma = 0.0002, 0.02
    bars = synthetic_bars(spark, ["A", "B", "C"], 2000, seed=7,
                          mu=mu, sigma=sigma)
    stats = (
        bars.withColumn(
            "lr",
            F.log(
                F.col("close")
                / F.lag("close").over(
                    Window.partitionBy("ticker").orderBy("bar_id")
                )
            ),
        )
        .agg(F.avg("lr").alias("m"), F.stddev_samp("lr").alias("s"))
        .collect()[0]
    )
    drift = mu - 0.5 * sigma * sigma
    assert math.isclose(stats.m, drift, abs_tol=3 * sigma / math.sqrt(6000))
    assert math.isclose(stats.s, sigma, rel_tol=0.05)
    bad = bars.filter(
        (F.col("high") < F.col("low"))
        | (F.col("high") < F.col("close"))
        | (F.col("low") > F.col("close"))
        | (F.col("close") <= 0)
    ).count()
    assert bad == 0


def test_synthetic_bars_deterministic(spark):
    a = synthetic_bars(spark, ["A"], 50, seed=1).collect()
    b = synthetic_bars(spark, ["A"], 50, seed=1).collect()
    c = synthetic_bars(spark, ["A"], 50, seed=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def _partition_files(path):
    """Map partition dir -> {filename: sha256} for every data file."""
    import hashlib

    out = {}
    for d in sorted(os.listdir(path)):
        full = os.path.join(path, d)
        if not os.path.isdir(full) or "=" not in d:
            continue
        files = {}
        for f in sorted(os.listdir(full)):
            if f.endswith(".parquet"):
                with open(os.path.join(full, f), "rb") as fh:
                    files[f] = hashlib.sha256(fh.read()).hexdigest()
        out[d] = files
    return out


def test_partitioned_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    path = str(tmp_path / "bars_part")
    base = spark.createDataFrame(
        [
            ("AAPL", "2024-01", "2024-01-05", 100.0),
            ("AAPL", "2024-02", "2024-02-05", 110.0),
            ("MSFT", "2024-01", "2024-01-05", 300.0),
            ("MSFT", "2024-03", "2024-03-05", 310.0),
        ],
        "ticker string, month string, date string, close double",
    )
    IO.upsert_parquet_partitioned(
        spark, path, base, keys=["ticker", "date"], partition_col="month"
    )
    before = _partition_files(path)
    assert set(before) == {"month=2024-01", "month=2024-02", "month=2024-03"}

    update = spark.createDataFrame(
        [
            ("AAPL", "2024-02", "2024-02-05", 999.0),   # update in 2024-02
            ("GOOG", "2024-02", "2024-02-06", 150.0),   # insert in 2024-02
        ],
        "ticker string, month string, date string, close double",
    )
    out = IO.upsert_parquet_partitioned(
        spark, path, update, keys=["ticker", "date"], partition_col="month"
    )
    after = _partition_files(path)

    # untouched partitions byte-identical (same files, same content)
    assert after["month=2024-01"] == before["month=2024-01"]
    assert after["month=2024-03"] == before["month=2024-03"]
    # touched partition rewritten
    assert after["month=2024-02"] != before["month=2024-02"]

    rows = {(r.ticker, r.date): r.close for r in out.collect()}
    assert rows[("AAPL", "2024-02-05")] == 999.0   # newest wins
    assert rows[("GOOG", "2024-02-06")] == 150.0   # inserted
    assert rows[("AAPL", "2024-01-05")] == 100.0   # untouched partition intact
    assert rows[("MSFT", "2024-03-05")] == 310.0
    assert len(rows) == 5


def test_partitioned_upsert_missing_partition_col_raises(spark, tmp_path):
    df = spark.createDataFrame([("A", 1.0)], "ticker string, close double")
    with pytest.raises(ValueError):
        IO.upsert_parquet_partitioned(
            spark, str(tmp_path / "x"), df, keys=["ticker"], partition_col="month"
        )


def test_failover_union_priority_semantics(spark):
    """Reference data_source_manager fallback mode: lowest priority
    number present wins per key; secondary serves only keys the primary
    misses."""
    from portofolio_maximizer_spark.sources.failover import (
        failover_health,
        failover_union,
    )

    a = spark.createDataFrame(
        [("AAPL", "2024-01-01", 100.0), ("MSFT", "2024-01-01", 300.0)],
        "ticker string, date string, close double",
    )
    b = spark.createDataFrame(
        [
            ("AAPL", "2024-01-01", 999.0),   # shadowed by primary
            ("GOOG", "2024-01-01", 150.0),   # only in secondary -> failover
        ],
        "ticker string, date string, close double",
    )
    out = failover_union(
        [("alpha", 0, a), ("beta", 1, b)], keys=["ticker", "date"]
    ).toPandas()
    rows = {(r.ticker): (r.close, r._source) for _, r in out.iterrows()}
    assert rows["AAPL"] == (100.0, "alpha")   # primary wins on collision
    assert rows["MSFT"] == (300.0, "alpha")
    assert rows["GOOG"] == (150.0, "beta")    # failover fills the gap
    health = failover_health(
        failover_union([("alpha", 0, a), ("beta", 1, b)], keys=["ticker", "date"])
    ).toPandas()
    served = dict(zip(health._source, health.n_keys_served))
    assert served == {"alpha": 2, "beta": 1}


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2.0)
    df.repartition(40).write.parquet(path)   # fragment: 40 small files
    from portofolio_maximizer_spark.sources import io as IO

    stats = IO.compact_parquet(spark, path, target_file_mb=128)
    assert stats["files_before"] == 40
    assert stats["files_after"] == 1          # tiny table -> one file
    out = spark.read.parquet(path)
    assert out.count() == 10_000
    assert out.agg(F.sum("v")).collect()[0][0] == float(10_000 * 9_999)


def test_table_file_stats_reads_footers(spark, tmp_path):
    path = str(tmp_path / "stats")
    df = spark.range(0, 1000).withColumn("v", F.col("id").cast("double"))
    df.orderBy("id").coalesce(2).write.parquet(path)
    from portofolio_maximizer_spark.sources import io as IO

    st = IO.table_file_stats(path, columns=["id"])
    assert sum(e["rows"] for e in st) == 1000
    mins = [e["columns"]["id"]["min"] for e in st if "id" in e["columns"]]
    maxs = [e["columns"]["id"]["max"] for e in st if "id" in e["columns"]]
    assert min(mins) == 0 and max(maxs) == 999


def test_orc_roundtrip_and_pushdown(spark, small_df, tmp_path):
    import sys

    sys.path.insert(0, "tools")
    from planaudit import plan_text

    path = str(tmp_path / "orc")
    IO.write_orc(small_df, path)
    back = IO.read_orc(spark, path)
    assert sorted(back.collect()) == sorted(small_df.collect())
    first_col = small_df.columns[0]
    plan = plan_text(back.filter(F.col(first_col).isNotNull()))
    assert "PushedFilters: [IsNotNull(" in plan


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    import sys

    sys.path.insert(0, "tools")
    from planaudit import plan_text

    path = str(tmp_path / "by_month")
    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 12).cast("int").alias("month"),
        (F.col("id") * 3 % 97).alias("v"),
    )
    df.write.mode("overwrite").partitionBy("month").parquet(path)
    read = spark.read.parquet(path).filter(F.col("month") == 3)
    plan = plan_text(read)
    # the partition predicate must become a PartitionFilters entry (metadata
    # pruning — no data files outside month=3 are ever opened)
    assert "PartitionFilters: [" in plan and "month" in plan.split("PartitionFilters:")[1].splitlines()[0]
    assert read.count() == df.filter(F.col("month") == 3).count()


def test_microstructure_matches_reference_formulas(spark):
    """The column-algebra microstructure model must reproduce the
    reference's closed-form book state (etl/synthetic_data/
    microstructure.py:7-42 defaults) for known (mid, vol, shock)."""
    from pyspark.sql import functions as F

    from portofolio_maximizer_spark.sources.synthetic import (
        microstructure_columns,
    )

    df = spark.createDataFrame(
        [(100.0, 0.02, 1.5), (50.0, 0.10, -2.0), (10.0, 0.0001, 0.0)],
        "mid double, iv double, shock double",
    )
    m = microstructure_columns(
        F.col("mid"), F.col("iv"), F.col("shock"), F.lit(1), F.col("mid")
    )
    rows = df.select(
        "mid", "iv", "shock",
        m["spread"].alias("spread"),
        m["slippage"].alias("slippage"),
        m["depth"].alias("depth"),
        m["txn_cost_bps"].alias("txn"),
        m["impact_bps"].alias("impact"),
    ).collect()
    for r in rows:
        spread = r.mid * 5.0 / 1e4 * (1 + 20 * r.iv)
        slip = r.mid * 3.0 / 1e4 * (1 + 10 * abs(r.shock) + 0.1)
        depth = max(1_000_000.0 * (1 - 15 * r.iv), 50_000.0)
        assert abs(r.spread - spread) < 1e-9
        assert abs(r.slippage - slip) < 1e-9
        assert abs(r.depth - depth) < 1e-6
        assert abs(r.txn - (spread + slip) / r.mid * 1e4) < 1e-9
        assert abs(r.impact - max(0.0, slip / max(depth, 1.0)) * 1e4) < 1e-9


def test_synthetic_bars_emit_microstructure_columns(spark):
    from portofolio_maximizer_spark.sources.synthetic import synthetic_bars

    bars = synthetic_bars(spark, ["AAA"], 20)
    cols = set(bars.columns)
    assert {
        "spread", "slippage", "depth_notional", "order_imbalance",
        "txn_cost_bps", "impact_bps",
    } <= cols
    pdf = bars.toPandas()
    assert (pdf.spread > 0).all()
    assert (pdf.depth_notional >= 50_000.0).all()
    # spread widens with the bar's own shock-driven vol: correlation > 0
    iv_proxy = (pdf.close / pdf.open - 1).abs()
    assert pdf.spread.corr(pdf.close * (1 + iv_proxy)) > 0
