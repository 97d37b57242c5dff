"""Source/sink layer (SURVEY.md §2.1): atomic parquet sink, keyed upsert,
content-hashed checkpoints, retention cleanup, format adapters.

Reference mapping:
- S5 atomic parquet sink      `etl/data_storage.py:55-120` (temp→rename)
  → Spark's job-commit protocol IS the atomic rename; a partial write
  never becomes visible.
- S7 keyed upsert             `etl/database_manager.py:1603-1687`
  (row-wise INSERT honoring UNIQUE(ticker,date,source))
  → union + deterministic keep-newest dropDuplicates, rewritten by key.
- S11 checkpointing           `etl/checkpoint_manager.py:107-252`
  (pickle + SHA-256 content hash, latest-pointer lookup)
  → parquet stage dumps + ORDER-INSENSITIVE content fingerprint
  (sum of per-row xxhash64 — computable distributed, no sort).
- S10 retention cleanup       `etl/data_storage.py:150-176`
  → drop checkpoint generations beyond keep_n.
- S2-adapters                 csv/json read/write with schema.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S5: atomic parquet sink — Spark's commit protocol only renames the
    job output into place on success (the reference hand-rolls temp→rename
    for the same guarantee)."""
    df.write.mode(mode).parquet(path)


def upsert_parquet(
    spark: SparkSession,
    path: str,
    new_df: DataFrame,
    keys: list[str],
    version_col: str = "_ingest_version",
) -> DataFrame:
    """S7: keyed upsert — new rows win over existing rows on key
    collision, deterministically (row_number over version desc, never
    arbitrary dropDuplicates pick). Full-key rewrite here; on a Delta
    deployment this is MERGE, same semantics."""
    new_tagged = new_df.withColumn(version_col, F.lit(1))
    if os.path.exists(path):
        old = spark.read.parquet(path).withColumn(version_col, F.lit(0))
        unioned = old.unionByName(new_tagged)
    else:
        unioned = new_tagged
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
    resolved = (
        unioned.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", version_col)
    )
    # materialize before overwriting the path being read
    resolved_cached = resolved.localCheckpoint(eager=True)
    write_parquet(resolved_cached, path)
    return spark.read.parquet(path)


def upsert_parquet_partitioned(
    spark: SparkSession,
    path: str,
    new_df: DataFrame,
    keys: list[str],
    partition_col: str,
    version_col: str = "_ingest_version",
) -> DataFrame:
    """S7 at scale: partition-pruned keyed upsert (the reference honors
    ``UNIQUE(ticker,date,source)`` incrementally,
    `etl/database_manager.py:1603-1687`; at 100 TB a full-table rewrite
    per upsert is a scale-killer, so only partitions containing touched
    keys are rewritten).

    Mechanics: collect the incoming batch's distinct partition values (a
    driver-side list of partition KEYS, not data — bounded by the number
    of touched partitions), read ONLY those partitions back (partition
    pruning pushes the IN-filter to directory listing), resolve
    newest-wins per key, and write with dynamic partition overwrite —
    Spark replaces exactly the partition directories present in the
    written frame, leaving every untouched partition's files
    byte-identical on disk."""
    part_field = [f for f in new_df.schema.fields if f.name == partition_col]
    if not part_field:
        raise ValueError(f"partition column {partition_col!r} not in new_df")
    if not os.path.exists(path):
        new_df.write.partitionBy(partition_col).parquet(path)
        return spark.read.parquet(path)

    touched = [r[0] for r in new_df.select(partition_col).distinct().collect()]
    old = (
        spark.read.parquet(path)
        .filter(F.col(partition_col).isin(touched))
        .withColumn(version_col, F.lit(0))
    )
    unioned = old.unionByName(new_df.withColumn(version_col, F.lit(1)))
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
    resolved = (
        unioned.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", version_col)
    )
    # materialize the touched partitions before overwriting paths being read
    resolved_cached = resolved.localCheckpoint(eager=True)
    (
        resolved_cached.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )
    return spark.read.parquet(path)


def content_fingerprint(df: DataFrame) -> str:
    """S11: order-insensitive content hash — per-row xxhash64 over every
    column (null-tagged), summed as unsigned. Distributed-friendly: no
    sort, no collect of data, stable across partitioning/layout."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("<null>")) for c in df.columns]
    row_hash = F.xxhash64(*cols).cast("decimal(38,0)")
    total = df.agg(
        F.sum(row_hash).alias("h"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    return f"{total['n']}:{int(total['h'] or 0):x}"


def checkpoint_stage(
    df: DataFrame, root: str, stage: str, run_id: str | None = None
) -> dict:
    """S11: persist a stage output with sidecar metadata (content hash,
    row count, schema, timestamp); returns the metadata dict."""
    run_id = run_id or time.strftime("%Y%m%dT%H%M%S")
    path = os.path.join(root, stage, run_id)
    write_parquet(df, path)
    meta = {
        "stage": stage,
        "run_id": run_id,
        "path": path,
        "fingerprint": content_fingerprint(df),
        "schema": df.schema.json(),
        "created_at": time.time(),
    }
    with open(os.path.join(path, "_checkpoint.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def latest_checkpoint(
    spark: SparkSession, root: str, stage: str
) -> tuple[DataFrame, dict] | None:
    """S11: latest-pointer lookup — newest run_id wins (lexicographic,
    run ids are sortable timestamps)."""
    stage_dir = os.path.join(root, stage)
    if not os.path.isdir(stage_dir):
        return None
    runs = sorted(os.listdir(stage_dir))
    if not runs:
        return None
    path = os.path.join(stage_dir, runs[-1])
    with open(os.path.join(path, "_checkpoint.json")) as fh:
        meta = json.load(fh)
    return spark.read.parquet(path), meta


def cleanup_checkpoints(root: str, stage: str, keep_n: int = 3) -> list[str]:
    """S10: retention — drop all but the newest ``keep_n`` generations."""
    stage_dir = os.path.join(root, stage)
    if not os.path.isdir(stage_dir):
        return []
    runs = sorted(os.listdir(stage_dir))
    doomed = runs[:-keep_n] if keep_n > 0 else runs
    for r in doomed:
        shutil.rmtree(os.path.join(stage_dir, r))
    return doomed


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Schema is mandatory (inference double-scans and guesses types —
    never acceptable on a 100 TB ingest)."""
    return spark.read.schema(schema).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (S5 alternate format) — columnar like parquet, with the
    same predicate-pushdown/statistics story; interchange format for
    Hive-lineage warehouses."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC carries its schema; pushdown/pruning verified in tests."""
    return spark.read.orc(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    partition_col: str | None = None,
) -> dict:
    """S10-adjacent maintenance: rewrite a table into ~target-sized files.

    Streaming upserts and micro-batch sinks accrete small files; at scale
    the file count (not the byte count) throttles scans (one task +
    footer fetch per file). Coalesce count = ceil(bytes / target), floor
    1. Returns before/after file counts. Partitioned tables compact
    per-partition via dynamic overwrite (layout preserved)."""
    import math

    def _data_files(p: str) -> list[str]:
        out = []
        for root, _dirs, files in os.walk(p):
            out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
        return out

    before = _data_files(path)
    total_bytes = sum(os.path.getsize(f) for f in before)
    df = spark.read.parquet(path).localCheckpoint(eager=True)
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    if partition_col:
        (
            df.repartition(n_files, partition_col)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(path)
        )
    else:
        df.coalesce(n_files).write.mode("overwrite").parquet(path)
    after = _data_files(path)
    return {
        "bytes": total_bytes,
        "files_before": len(before),
        "files_after": len(after),
    }


def table_file_stats(path: str, columns: list[str] | None = None):
    """Scan-planning observability: per-file row counts and column
    min/max straight from parquet footers (no data read) — what a file-
    skipping audit inspects to verify clustering actually prunes.
    Returns a list of dicts (driver-side; one entry per file — file
    COUNT is the thing being audited, so this is small by definition
    when the table is healthy)."""
    import pyarrow.parquet as pq

    out = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            fp = os.path.join(root, f)
            meta = pq.ParquetFile(fp).metadata
            entry = {"file": fp, "rows": meta.num_rows, "columns": {}}
            for rg in range(meta.num_row_groups):
                g = meta.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if columns and name not in columns:
                        continue
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        continue
                    cur = entry["columns"].get(name)
                    mn, mx = st.min, st.max
                    if cur is None:
                        entry["columns"][name] = {"min": mn, "max": mx}
                    else:
                        cur["min"] = min(cur["min"], mn)
                        cur["max"] = max(cur["max"], mx)
            out.append(entry)
    return out
