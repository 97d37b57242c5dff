"""Python DataSource provider adapter (S1/S2): partition fan-out,
determinism, and bit-compat (to float ulp) with the native generator."""

from __future__ import annotations

from pyspark.sql import functions as F

from portofolio_maximizer_spark.sources import pydatasource, synthetic


def _read(spark, tickers="AAA,BBB,CCC", n_bars=40, seed=42):
    pydatasource.register(spark)
    return (
        spark.read.format("synthetic_bars")
        .option("tickers", tickers)
        .option("n_bars", n_bars)
        .option("seed", seed)
        .load()
    )


def test_partition_per_ticker(spark):
    df = _read(spark)
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 120
    per = {r["ticker"]: r["n"] for r in df.groupBy("ticker").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {"AAA": 40, "BBB": 40, "CCC": 40}


def test_deterministic_across_reads(spark):
    a = sorted(map(tuple, _read(spark).collect()))
    b = sorted(map(tuple, _read(spark).collect()))
    assert a == b


def test_matches_native_generator(spark):
    ds = _read(spark, n_bars=30)
    native = synthetic.synthetic_bars(spark, ["AAA", "BBB", "CCC"], 30)
    j = ds.alias("p").join(native.alias("n"), ["ticker", "bar_id"])
    assert j.count() == 90
    bad = j.filter(
        (F.abs(F.col("p.close") - F.col("n.close")) > 2e-6)
        | (F.abs(F.col("p.high") - F.col("n.high")) > 2e-6)
        | (F.abs(F.col("p.low") - F.col("n.low")) > 2e-6)
        | (F.col("p.volume") != F.col("n.volume"))
        | (
            F.unix_seconds(F.col("p.ts")) != F.unix_seconds(F.col("n.ts"))
        )
    ).count()
    assert bad == 0
