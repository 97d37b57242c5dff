"""Silent-empty streaming guards (r8 scalecheck found the first of these
by accident: a symlinked DIRECTORY drains an empty stream with no error).

File-source streams fail SILENTLY in several ways — the drain completes,
the result is just empty. These tests pin each known class:

- directory-shaped events tables must stream DIRECTLY (symlink staging a
  directory yields zero rows);
- a TIMESTAMP_NTZ / legacy-nanos ts encoding must be normalized before
  watermarking (an NTZ watermark never advances against LTZ data — the
  r4 regression);
- drains of planted inputs must be NON-empty where the plant guarantees
  rows (zero-row drain = broken wiring, not an empty day).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from portofolio_maximizer_spark.streaming import stream as st


def _mk_sf_dir_with_directory_events(spark, sf_dir, tmp_path) -> str:
    """A replica data root whose events table is a DIRECTORY of part
    files — the layout every Spark-written dataset (and scalecheck
    replica) has."""
    root = str(tmp_path / "sfdir")
    os.makedirs(root, exist_ok=True)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ev.limit(2000).repartition(4).write.mode("overwrite").parquet(
        os.path.join(root, "events.parquet")
    )
    return root


def test_directory_events_stream_directly_not_via_symlink(
    spark, sf_dir, tmp_path
):
    root = _mk_sf_dir_with_directory_events(spark, sf_dir, tmp_path)
    src = os.path.join(root, "events.parquet")
    assert st._stream_dir(root) == src, (
        "a directory-shaped events table must be streamed directly — "
        "symlink staging a DIRECTORY yields a silently empty stream"
    )
    # and the drain actually lands rows
    child = st.drain_session(spark)
    out = st.run_to_memory(
        st.events_stream(child, root).select("user_id", "ts", "value"),
        "guard_dir_drain",
    )
    assert out.count() > 0


def test_symlinked_directory_is_the_hazard_the_guard_prevents(
    spark, sf_dir, tmp_path
):
    """Demonstrate the failure class itself: the same directory-shaped
    table accessed THROUGH a symlink drains zero rows without any error.
    If Spark ever starts following directory symlinks (this assert
    failing), _stream_dir's direct-path special case can be dropped."""
    root = _mk_sf_dir_with_directory_events(spark, sf_dir, tmp_path)
    src = os.path.join(root, "events.parquet")
    staged = str(tmp_path / "staged")
    os.makedirs(staged, exist_ok=True)
    os.symlink(src, os.path.join(staged, "events.parquet"))
    schema = spark.read.parquet(src).schema
    child = st.drain_session(spark)
    raw = child.readStream.schema(schema).parquet(staged)
    out = st.run_to_memory(
        raw.select("user_id", "value"), "guard_symlink_drain"
    )
    assert out.count() == 0


def test_ntz_and_nanos_ts_encodings_normalize_and_watermark(
    spark, sf_dir, tmp_path
):
    """The r4 regression class: a ts column landed as TIMESTAMP_NTZ (or
    legacy int64 nanos) must be normalized to TIMESTAMP_LTZ before the
    watermark, or windowed aggregation starves and drains empty."""
    root = str(tmp_path / "sfntz")
    os.makedirs(root, exist_ok=True)
    ev = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .limit(1000)
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    )
    ev.write.mode("overwrite").parquet(os.path.join(root, "events.parquet"))
    child = st.drain_session(spark)
    s = st.events_stream(child, root)
    assert dict(s.dtypes)["ts"] == "timestamp", dict(s.dtypes)
    rolled = st.tumbling_value_rollup(s)
    out = st.run_to_memory(rolled, "guard_ntz_drain")
    assert out.count() > 0, "NTZ-encoded ts must still produce windows"


@pytest.mark.parametrize(
    "qname",
    [
        "streaming_session_rollup",
        "streaming_vol_alerts",
        "streaming_enriched_rollup",
        "streaming_upsert_landed",
        "streaming_view_purchase_join",
        "streaming_dedup_census",
    ],
)
def test_family_drains_are_nonempty(spark, sf_dir, qname):
    """Every streaming-family query's plant guarantees rows at sf0.001;
    an empty result is broken wiring (silent-empty stream), never data."""
    import __spark_entry__ as entry

    assert entry.queries()[qname](spark, sf_dir).count() > 0
