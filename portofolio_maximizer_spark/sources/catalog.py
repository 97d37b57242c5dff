"""Table catalog over the driver-generated parquet testdata.

Mirrors the reference's storage surface (parquet + relational store,
`/root/reference/etl/data_storage.py:122-148` multi-file scan and
`/root/reference/etl/database_manager.py` table registry) as plain
``spark.read.parquet`` scans: predicate pushdown, column pruning and
partition pruning come from Catalyst for free, where the reference loads
whole files into pandas and filters after the fact.

At 100 TB these tables would be directory-partitioned (e.g. lineitem by
``l_shipdate`` month, events by date) — the loader takes any directory and
Spark's partition discovery handles both layouts; nothing here assumes a
single file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at every realistic scale factor.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame.

    ``events.parquet`` carries TIMESTAMP(NANOS) which Spark's parquet reader
    rejects by default; read nanos as long and convert to a microsecond
    timestamp (truncation — same as DuckDB's ns→µs conversion).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for ``spark.sql`` use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
