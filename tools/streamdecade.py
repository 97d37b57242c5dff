"""Streaming state-store decade evidence (round-11 directive #5).

The batch decade tables (tools/scalecheck.py) cover scan/join/window
shapes; this tool measures the STREAMING state story across the same
decade: the dedup drain (dropDuplicates state = one entry per
(user_id, event_id) — 100k rows at sf0.1, 1M at tiled sf1) and the
session-window drain, each at BOTH scale points on BOTH state-store
providers, recording from the engine's own progress events:

- state_rows_peak          — how much state the operator actually held
- trigger_ms               — summed micro-batch wall
- state_mem_peak_bytes     — stateOperators.memoryUsedBytes: for the
  HDFS-backed provider this is the state resident in EXECUTOR HEAP
  (the scale ceiling); for RocksDB it is the provider's bounded
  block-cache/memtable accounting
- rocksdb_mem_peak_bytes / rocksdb_sst_peak_bytes — RocksDB's total
  memory vs the bytes it pushed to local DISK (the part the HDFS
  provider is forced to keep on heap)

The claim under test: HDFS-provider heap grows ~linearly with state
rows, while the RocksDB provider's memory stays bounded as state moves
to SST files on disk. Results are pasted into BENCH_NOTES.md
("Round-12 streaming decade").

Usage: python tools/streamdecade.py   (builds the sf1 tiling if absent)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scalecheck import DST, SRC, build_sf1  # noqa: E402


def drain_metrics(spark, sf_dir: str, provider: str, which: str) -> dict:
    from pyspark.sql import functions as F

    from portofolio_maximizer_spark import streaming as ST
    from portofolio_maximizer_spark.streaming.stream import (
        DRAIN_PROGRESS,
        drain_session,
        run_to_memory,
    )

    child = drain_session(
        spark, state_provider="rocksdb" if provider == "rocksdb" else None
    )
    schema = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).schema
    stream = child.readStream.schema(schema).parquet(
        ST.stream._stream_dir(sf_dir)
    )
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    if which == "dedup":
        op = ST.dedupe_within_watermark(stream)
    else:
        op = ST.session_rollup(stream)
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    name = f"decade_{which}_{provider}_{tag}"
    t0 = time.time()
    out = run_to_memory(op, name)
    n = out.count()
    wall = round(time.time() - t0, 2)
    rec = dict(DRAIN_PROGRESS.get((name, None), {}))
    rec.update(
        {
            "rows_out": n,
            "wall_s": wall,
            "provider": provider,
            "sf_dir": os.path.basename(sf_dir.rstrip("/")),
            "op": which,
        }
    )
    rec.pop("seq", None)
    return rec


def main() -> None:
    from portofolio_maximizer_spark.session import get_spark

    spark = get_spark("streamdecade")
    spark.sparkContext.setLogLevel("OFF")
    if not os.path.exists(os.path.join(DST, "_BUILD_DONE")):
        t0 = time.time()
        build_sf1(spark)
        print(f"built {DST} in {time.time() - t0:.1f}s", file=sys.stderr)
    rows = []
    for sf_dir in (SRC, DST):
        for provider in ("hdfs", "rocksdb"):
            for which in ("dedup", "sessions"):
                rows.append(drain_metrics(spark, sf_dir, provider, which))
                print(json.dumps(rows[-1]), file=sys.stderr)
    print(json.dumps({"stream_decade": rows}))


if __name__ == "__main__":
    main()
