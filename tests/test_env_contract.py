"""Environment contract: the dtypes the pack assumes about the testdata.

Round 3 lost 4 queries and 5 streaming tests to a silent testdata
regeneration (events.ts TIMESTAMP(NANOS) → plain micros/TIMESTAMP_NTZ).
This file turns the next such shift into one failing 0.1-second test with
an explicit message, instead of a scatter of downstream analysis errors.

Checks both layers:
- the RAW parquet footer (what the driver regenerated), via pyarrow — no
  Spark session needed, so it runs first and fast;
- the NORMALIZED catalog surface (what every operator consumes), via
  sources/catalog.load_table.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from portofolio_maximizer_spark.sources.catalog import TABLES, load_table

SF = "/root/testdata/sf0.001"


def test_testdata_files_exist():
    for t in TABLES:
        assert os.path.exists(os.path.join(SF, f"{t}.parquet")), t


def test_events_ts_is_a_supported_encoding():
    """events.ts must be one of the encodings load_table can normalize."""
    schema = pq.read_schema(os.path.join(SF, "events.parquet"))
    ts = schema.field("ts").type
    assert str(ts) in {
        "timestamp[ns]",
        "timestamp[us]",
        "timestamp[us, tz=UTC]",
        "timestamp[ms]",
        "int64",
    }, f"unrecognized events.ts parquet encoding: {ts} — extend catalog.load_table"


def test_embeddings_vector_is_float_list():
    schema = pq.read_schema(os.path.join(SF, "embeddings.parquet"))
    emb = schema.field("embedding").type
    assert str(emb) in {"list<element: float>", "list<item: float>"}, str(emb)


@pytest.mark.parametrize(
    "table,expected",
    [
        # The normalized dtypes every operator in the pack relies on.
        ("events", {"event_id": "bigint", "ts": "timestamp", "user_id": "bigint",
                    "event_type": "string", "value": "double", "props": "string"}),
        ("documents", {"doc_id": "bigint", "text": "string", "lang": "string",
                       "source": "string", "n_chars": "bigint"}),
        ("embeddings", {"vec_id": "bigint", "embedding": "array<float>",
                        "label": "int"}),
        ("lineitem", {"l_orderkey": "bigint", "l_quantity": "double",
                      "l_extendedprice": "double", "l_discount": "double",
                      "l_shipdate": "timestamp"}),
        ("orders", {"o_orderkey": "bigint", "o_totalprice": "double",
                    "o_orderdate": "timestamp"}),
    ],
)
def test_catalog_normalized_dtypes(spark, table, expected):
    got = dict(load_table(spark, SF, table).dtypes)
    for col, dtype in expected.items():
        assert got.get(col) == dtype, (
            f"{table}.{col}: expected {dtype}, got {got.get(col)} — "
            "testdata encoding shifted; fix sources/catalog.load_table"
        )


def test_events_ts_supports_epoch_arithmetic(spark):
    """The exact operation that broke in r3: epoch math on events.ts."""
    from pyspark.sql import functions as F

    ev = load_table(spark, SF, "events")
    row = ev.select(
        F.col("ts").cast("double").alias("sec"),
        F.unix_millis("ts").alias("ms"),
    ).first()
    assert row.sec > 0 and row.ms > 0
