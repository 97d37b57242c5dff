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


def _drain(spark, sink, ckpt, n_bars, tickers="AAA,BBB,CCC", batch_bars=32):
    q = (
        spark.readStream.format("synthetic_bars")
        .option("tickers", tickers)
        .option("n_bars", n_bars)
        .option("seed", 42)
        .option("batch_bars", batch_bars)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    if q.exception():
        raise q.exception()


def test_stream_incremental_tail_lands_delta_only(spark, tmp_path):
    """Two availableNow drains through one checkpoint: the restart after
    the provider grows its tail lands exactly the unseen suffix — no
    duplicates, no gaps (S12 through the streaming Python DataSource)."""
    sink, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    _drain(spark, sink, ckpt, n_bars=50)
    first = spark.read.parquet(sink)
    assert first.count() == 150
    assert first.agg(F.max("bar_id")).first()[0] == 49
    _drain(spark, sink, ckpt, n_bars=80)
    both = spark.read.parquet(sink)
    assert both.count() == 240  # 3 tickers x 80 bars, delta appended once
    assert both.select("ticker", "bar_id").distinct().count() == 240


def test_stream_drain_bit_compatible_with_batch(spark, tmp_path):
    """The streamed rows are the batch reader's rows exactly (same
    deterministic generator → offset replay is exactly-once by
    construction)."""
    sink, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    _drain(spark, sink, ckpt, n_bars=60)
    streamed = spark.read.parquet(sink)
    batch = _read(spark, n_bars=60)
    cols = batch.columns
    assert streamed.select(cols).exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed.select(cols)).count() == 0


def test_stream_partitions_chunk_per_ticker():
    """partitions(start, end) fans out one task per (ticker, <=chunk)
    window and replays any window deterministically."""
    from portofolio_maximizer_spark.sources.pydatasource import (
        SyntheticBarsStreamReader,
    )

    r = SyntheticBarsStreamReader(
        {"tickers": "AAA,BBB", "n_bars": "100", "batch_bars": "40", "seed": "42"}
    )
    assert r.initialOffset() == {"bar": 0}
    assert r.latestOffset() == {"bar": 100}
    parts = r.partitions({"bar": 0}, {"bar": 100})
    assert len(parts) == 6  # 2 tickers x ceil(100/40)
    spans = sorted((p.ticker, p.start, p.end) for p in parts)
    assert spans == [
        ("AAA", 0, 40), ("AAA", 40, 80), ("AAA", 80, 100),
        ("BBB", 0, 40), ("BBB", 40, 80), ("BBB", 80, 100),
    ]
    window = [row for p in parts if p.ticker == "AAA" and p.start == 40
              for row in r.read(p)]
    assert [row[1] for row in window] == list(range(40, 80))
    replay = [row for p in r.partitions({"bar": 40}, {"bar": 80})
              if p.ticker == "AAA" for row in r.read(p)]
    assert replay == window


# ---------------------------------------------------------------------------
# Retry / backoff / failover algebra over the injectable transport
# (round-10 directive #5 — reference etl/yfinance_extractor.py:54-121,
# etl/data_source_manager.py:369-437, previously the only §2 logic with
# zero test coverage)
# ---------------------------------------------------------------------------


def _plant(n_bars=8):
    return pydatasource.SyntheticTransport(n_bars, 42, 100.0, 0.0002, 0.02)


def test_backoff_schedule_matches_reference():
    """delay before retry k = min(base * 2^k, cap) — the reference's
    exact decorator arithmetic (base 2.0, cap 30.0, 3 retries)."""
    assert pydatasource.backoff_schedule(3, 2.0, 30.0) == [2.0, 4.0]
    assert pydatasource.backoff_schedule(6, 2.0, 30.0) == [
        2.0, 4.0, 8.0, 16.0, 30.0
    ]
    assert pydatasource.backoff_schedule(1, 2.0, 30.0) == []


def test_retry_recovers_within_budget_and_sleeps_schedule():
    slept = []
    t = pydatasource.FlakyTransport(_plant(), fail_times=2)
    rows = pydatasource.fetch_with_retry(
        t, "AAA", max_retries=3, base_delay=2.0, sleep=slept.append
    )
    assert len(rows) == 8
    assert slept == [2.0, 4.0]
    # and the recovered rows are bit-identical to a failure-free fetch
    assert rows == _plant().fetch("AAA")


def test_retry_exhaustion_raises_transient():
    import pytest

    slept = []
    t = pydatasource.FlakyTransport(_plant(), fail_times=3)
    with pytest.raises(pydatasource.TransientFetchError):
        pydatasource.fetch_with_retry(
            t, "AAA", max_retries=3, base_delay=2.0, sleep=slept.append
        )
    assert slept == [2.0, 4.0]  # last attempt's failure propagates


def test_unrecoverable_skips_without_retry():
    slept = []
    t = pydatasource.FlakyTransport(
        _plant(), fail_times=99,
        error=pydatasource.UnrecoverableTickerError,
    )
    rows = pydatasource.fetch_with_retry(
        t, "GONE", max_retries=3, base_delay=2.0, sleep=slept.append
    )
    assert rows == []
    assert slept == []  # delisted: retrying cannot help
    assert t._calls["GONE"] == 1


def test_failover_order_and_winner_tag():
    slept = []
    down = pydatasource.FlakyTransport(_plant(), fail_times=99)
    up = _plant()
    name, rows = pydatasource.fetch_with_failover(
        [("yahoo", 1, down), ("alpha_vantage", 2, up)],
        "AAA", base_delay=2.0, sleep=slept.append,
    )
    assert name == "alpha_vantage"
    assert rows == up.fetch("AAA")
    assert slept == [2.0, 4.0]  # primary exhausted its schedule first
    # empty (not erroring) providers also fall through
    class Empty:
        def fetch(self, ticker):
            return []

    name2, rows2 = pydatasource.fetch_with_failover(
        [("empty", 1, Empty()), ("alpha_vantage", 2, _plant())], "AAA",
        sleep=slept.append,
    )
    assert name2 == "alpha_vantage" and len(rows2) == 8
    # all providers down → (None, []), caller's decision
    assert pydatasource.fetch_with_failover(
        [("a", 1, pydatasource.FlakyTransport(_plant(), 99))], "AAA",
        base_delay=0.0,
    ) == (None, [])


def test_retry_is_transparent_through_spark_read(spark):
    """End-to-end: a Spark read whose executor-side fetches fail twice
    per ticker before serving must land the SAME frame as a
    failure-free read — the retry loop runs inside the DataSource."""
    pydatasource.register(spark)
    base = _read(spark).orderBy("ticker", "bar_id").collect()
    flaky = (
        spark.read.format("synthetic_bars")
        .option("tickers", "AAA,BBB,CCC")
        .option("n_bars", 40)
        .option("seed", 42)
        .option("transient_failures", 2)
        .load()
        .orderBy("ticker", "bar_id")
        .collect()
    )
    assert flaky == base


# ---------------------------------------------------------------------------
# S5W — the Python DataSource WRITE half (manifest-commit JSONL sink)
# ---------------------------------------------------------------------------


def test_manifest_sink_commit_roundtrip(spark, tmp_path):
    """A successful write publishes a manifest listing every part with
    exact row counts, and reading back only manifest-listed parts
    reproduces the frame."""
    import json
    import os

    pydatasource.register_sink(spark)
    df = _read(spark).select("ticker", "bar_id", "close")
    path = str(tmp_path / "sink")
    (
        df.write.format("manifest_jsonl")
        .option("path", path)
        .mode("append")
        .save()
    )
    with open(os.path.join(path, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["total_rows"] == df.count() == 120
    assert sum(p["rows"] for p in manifest["parts"]) == 120
    # every listed part exists; no orphan data files beyond the manifest
    files = {f for f in os.listdir(path) if f.endswith(".jsonl")}
    assert files == {p["file"] for p in manifest["parts"]}
    back = pydatasource.read_manifest_jsonl(spark, path)
    got = sorted(
        (r["ticker"], r["bar_id"]) for r in back.collect()
    )
    want = sorted((r["ticker"], r["bar_id"]) for r in df.collect())
    assert got == want


def test_manifest_sink_abort_leaves_no_visible_state(spark, tmp_path):
    """An injected mid-job task failure must abort the write: no
    manifest is published and the successful tasks' landed parts are
    swept — the sink reads as if the write never happened."""
    import os

    import pytest

    pydatasource.register_sink(spark)
    df = _read(spark).select("ticker", "bar_id", "close")
    path = str(tmp_path / "sink_abort")
    with pytest.raises(Exception):
        (
            df.write.format("manifest_jsonl")
            .option("path", path)
            .option("fail_partition", 1)
            .mode("append")
            .save()
        )
    assert not os.path.exists(os.path.join(path, "_MANIFEST.json"))
    leftover = [
        f for f in os.listdir(path) if f.endswith(".jsonl")
    ] if os.path.exists(path) else []
    assert leftover == []
    assert pydatasource.read_manifest_jsonl(spark, path) is None


def test_manifest_sink_rewrite_sweeps_superseded_parts(spark, tmp_path):
    """Snapshot semantics across REPEATED successful writes: the second
    commit's manifest lists only its own parts, and the first write's
    parts are swept at commit time (round-10 ADVICE: abort-side sweep
    only ran on failure, so re-writes leaked orphans forever)."""
    import json
    import os

    pydatasource.register_sink(spark)
    df = _read(spark).select("ticker", "bar_id", "close")
    path = str(tmp_path / "sink_rewrite")
    for _ in range(2):
        (
            df.write.format("manifest_jsonl")
            .option("path", path)
            .mode("append")
            .save()
        )
    with open(os.path.join(path, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    on_disk = {f for f in os.listdir(path) if f.endswith(".jsonl")}
    # exactly the second snapshot's parts — no orphans from write #1
    assert on_disk == {p["file"] for p in manifest["parts"]}
    back = pydatasource.read_manifest_jsonl(spark, path)
    assert back.count() == df.count() == 120


def test_manifest_sink_file_uri_scheme(spark, tmp_path):
    """The sink resolves scheme URIs through the same filesystem API the
    bare-path case uses (the cluster-portability seam): a file:// URI
    writes, commits, sweeps, and reads back identically."""
    import os

    pydatasource.register_sink(spark)
    df = _read(spark).select("ticker", "bar_id", "close")
    local = str(tmp_path / "sink_uri")
    uri = "file://" + local
    (
        df.write.format("manifest_jsonl")
        .option("path", uri)
        .mode("append")
        .save()
    )
    assert os.path.exists(os.path.join(local, "_MANIFEST.json"))
    back = pydatasource.read_manifest_jsonl(spark, uri)
    assert back.count() == 120


def test_retry_rejects_zero_attempts():
    """max_retries < 1 would return [] without ever touching the
    transport — indistinguishable from an unrecoverable-ticker empty
    result — so it is rejected loudly (round-10 ADVICE)."""
    import pytest

    t = pydatasource.SyntheticTransport(5, 7, 100.0, 0.0, 0.1)
    with pytest.raises(ValueError, match="max_retries"):
        pydatasource.fetch_with_retry(t, "AAA", max_retries=0)
    with pytest.raises(ValueError, match="max_retries"):
        pydatasource.fetch_with_retry(t, "AAA", max_retries=-3)


# ---------------------------------------------------------------------------
# T10 — the STREAMING half of the manifest sink (per-epoch commit protocol)
# ---------------------------------------------------------------------------


def _mk_part(base, name, rows):
    import json
    import os

    os.makedirs(base, exist_ok=True)
    with open(os.path.join(base, name), "w") as f:
        for r in range(rows):
            f.write(json.dumps({"r": r}) + "\n")


def _msgs(names_rows):
    return [pydatasource._PartCommit(n, r) for n, r in names_rows]


def test_stream_sink_commit_accumulates_epochs(tmp_path):
    """Each epoch's commit publishes its batch manifest and the union
    manifest readers trust; prior epochs stay visible."""
    import json
    import os

    base = str(tmp_path / "s")
    w = pydatasource.ManifestJsonlStreamWriter({"path": base})
    _mk_part(base, "part-a.jsonl", 3)
    w.commit(_msgs([("part-a.jsonl", 3)]), batchId=0)
    _mk_part(base, "part-b.jsonl", 2)
    w.commit(_msgs([("part-b.jsonl", 2)]), batchId=1)
    man = json.load(open(os.path.join(base, "_MANIFEST.json")))
    assert {p["file"] for p in man["parts"]} == {
        "part-a.jsonl", "part-b.jsonl"
    }
    assert man["total_rows"] == 5
    assert os.path.exists(os.path.join(base, "_BATCH_0.json"))
    assert os.path.exists(os.path.join(base, "_BATCH_1.json"))


def test_stream_sink_replayed_epoch_is_exactly_once(tmp_path):
    """A restarted stream RE-RUNS its last epoch with fresh part names:
    the re-commit must REPLACE the epoch's manifest and sweep the
    superseded attempt's parts — a reader can never see rows from two
    attempts of one epoch (the exactly-once contract)."""
    import json
    import os

    base = str(tmp_path / "s")
    w = pydatasource.ManifestJsonlStreamWriter({"path": base})
    _mk_part(base, "part-e0.jsonl", 3)
    w.commit(_msgs([("part-e0.jsonl", 3)]), batchId=0)
    _mk_part(base, "part-e1-try1.jsonl", 4)
    w.commit(_msgs([("part-e1-try1.jsonl", 4)]), batchId=1)
    # replay of epoch 1 after a simulated restart: new attempt, new part
    _mk_part(base, "part-e1-try2.jsonl", 4)
    w.commit(_msgs([("part-e1-try2.jsonl", 4)]), batchId=1)
    man = json.load(open(os.path.join(base, "_MANIFEST.json")))
    assert {p["file"] for p in man["parts"]} == {
        "part-e0.jsonl", "part-e1-try2.jsonl"
    }
    assert man["total_rows"] == 7
    # the superseded attempt's bytes are GONE, not just unlisted
    assert not os.path.exists(os.path.join(base, "part-e1-try1.jsonl"))


def test_stream_sink_abort_keeps_prior_epochs(tmp_path):
    """abort sweeps only parts no published batch manifest lists: the
    failed epoch vanishes, every committed epoch stays readable."""
    import json
    import os

    base = str(tmp_path / "s")
    w = pydatasource.ManifestJsonlStreamWriter({"path": base})
    _mk_part(base, "part-ok.jsonl", 5)
    w.commit(_msgs([("part-ok.jsonl", 5)]), batchId=0)
    _mk_part(base, "part-doomed.jsonl", 9)  # epoch 1 task output, no commit
    w.abort(_msgs([("part-doomed.jsonl", 9)]), batchId=1)
    assert not os.path.exists(os.path.join(base, "part-doomed.jsonl"))
    man = json.load(open(os.path.join(base, "_MANIFEST.json")))
    assert {p["file"] for p in man["parts"]} == {"part-ok.jsonl"}


def test_stream_sink_end_to_end_roundtrip(spark, tmp_path):
    """writeStream.format('manifest_jsonl') through the engine: the
    drained sink read back via the manifest reproduces the frame."""
    src = str(tmp_path / "src")
    df = _read(spark).select("ticker", "bar_id", "close")
    df.write.mode("overwrite").parquet(src)
    pydatasource.register_sink(spark)
    q = (
        spark.readStream.schema(df.schema)
        .parquet(src)
        .writeStream.format("manifest_jsonl")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = pydatasource.read_manifest_jsonl(spark, str(tmp_path / "sink"))
    got = sorted((r["ticker"], r["bar_id"]) for r in back.collect())
    want = sorted((r["ticker"], r["bar_id"]) for r in df.collect())
    assert got == want


def test_stream_sink_as_of_batch_time_travel(spark, tmp_path):
    """The per-epoch manifests double as a snapshot log: as_of_batch=N
    reconstructs exactly the dataset visible after epoch N committed —
    including seeing THROUGH a later epoch's replay (the replayed
    epoch's snapshot is its final attempt)."""
    base = str(tmp_path / "s")
    w = pydatasource.ManifestJsonlStreamWriter({"path": base})
    _mk_part(base, "p0.jsonl", 2)
    w.commit(_msgs([("p0.jsonl", 2)]), batchId=0)
    _mk_part(base, "p1.jsonl", 3)
    w.commit(_msgs([("p1.jsonl", 3)]), batchId=1)
    _mk_part(base, "p2.jsonl", 4)
    w.commit(_msgs([("p2.jsonl", 4)]), batchId=2)
    assert pydatasource.read_manifest_jsonl(spark, base).count() == 9
    assert (
        pydatasource.read_manifest_jsonl(spark, base, as_of_batch=0).count()
        == 2
    )
    assert (
        pydatasource.read_manifest_jsonl(spark, base, as_of_batch=1).count()
        == 5
    )
    # a replay of epoch 1 replaces its snapshot everywhere, as-of included
    _mk_part(base, "p1b.jsonl", 3)
    w.commit(_msgs([("p1b.jsonl", 3)]), batchId=1)
    back = pydatasource.read_manifest_jsonl(spark, base, as_of_batch=1)
    assert back.count() == 5
    assert pydatasource.read_manifest_jsonl(spark, base, as_of_batch=-1) is None


def test_stream_sink_survives_stale_active_child_session(spark, tmp_path):
    """Root-cause regression for the battery-only DATA_SOURCE_NOT_FOUND:
    lookupDataSource at stream start resolves Python sources through the
    JVM thread-local ACTIVE session, whose registry is cloned at session
    creation — a child minted BEFORE registration and left active by an
    earlier query's action shadows the root's registry. Registration now
    pins the root active; this test sets the stale child active first
    and the start must still succeed."""
    child = spark.newSession()  # stale clone: lacks the registration
    spark._jvm.org.apache.spark.sql.classic.SparkSession.setActiveSession(
        child._jsparkSession
    )
    try:
        src = str(tmp_path / "src")
        df = _read(spark).select("ticker", "bar_id")
        df.write.mode("overwrite").parquet(src)
        pydatasource.register_sink(spark)
        q = (
            spark.readStream.schema(df.schema)
            .parquet(src)
            .writeStream.format("manifest_jsonl")
            .option("path", str(tmp_path / "sink"))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        back = pydatasource.read_manifest_jsonl(spark, str(tmp_path / "sink"))
        assert back.count() == 120
    finally:
        spark._jvm.org.apache.spark.sql.classic.SparkSession.setActiveSession(
            spark._jsparkSession
        )
