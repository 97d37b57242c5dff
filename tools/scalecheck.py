"""Empirical scaling spot-check: one measured decade of scale-up.

The plan audit argues 100x structurally; this tool makes the claim
falsifiable at one decade: it tiles the sf0.1 testdata 10x into a local
sf1 directory (key-offset replication, so KEY CARDINALITY scales while
per-key series length and referential integrity are preserved — the
cluster-growth model the engine is designed for), then times a
shape-diverse query set at both SFs and prints t(sf1)/t(sf0.1).

Linear work with fixed parallelism should show a ratio near 10 for
scan-bound queries and below 10 for floor-dominated ones (streaming
drains, fixed-size model grids); a super-linear outlier is a scaling
bug to explain or fix. Results go into BENCH_NOTES.md by hand.

Tiling rules (honesty notes):
- fact keys (event/user/order/cust/doc/vec ids) offset by replica *
  (max_key + 1) consistently across tables, so joins stay valid and
  per-key row counts are UNCHANGED — 10x keys, not 10x-hot keys;
- document text gets a per-replica suffix token and n_chars is
  recomputed, so exact-dup structure is preserved (each replica is a
  distinct text) without creating cross-replica exact duplicates;
  near-dup-family queries are deliberately NOT in the timed set (the
  replicas ARE near-duplicates of each other — that would measure a
  data-character change, not scale);
- dims (region/nation/part/supplier) are copied once — they are
  bounded reference data at any sf.

Usage: python tools/scalecheck.py [--rebuild]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scalecheck",
    "sf1",
)
REPLICAS = 10

#: shape-diverse timed set: scan+agg, join+topk, window families, the
#: two-pass rank primitives, the legs-ladder reports, a streaming drain,
#: the per-key applyInPandas sim, the salted rollup, and the skew census
QUERIES = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "user_return_metrics",
    "rolling_quantile_tail",
    "hourly_bars_atr",
    "customer_spend_deciles",
    "corpus_vocab_coverage",
    "unlinked_close_repair_plan",
    "zombie_open_retirement",
    "streaming_session_rollup",
    "llm_signal_backtest",
    "skew_salted_rollup",
    "partition_skew_census",
]


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST, exist_ok=True)
    reps = spark.range(REPLICAS).select(F.col("id").alias("_rep"))

    def tile(table: str, offsets: dict[str, int], extra=None):
        df = spark.read.parquet(os.path.join(SRC, f"{table}.parquet"))
        # the honesty notes are enforced, not assumed: a regenerated
        # testdata with larger key ranges would make replicas overlap
        # (hot keys + broken referential integrity) silently
        maxes = df.agg(
            *[F.max(c).alias(c) for c in offsets]
        ).first()
        for col, width in offsets.items():
            assert maxes[col] < width, (
                f"{table}.{col} max {maxes[col]} >= tile width {width}; "
                "regenerated testdata — update the offsets"
            )
        out = df.crossJoin(reps)
        for col, width in offsets.items():
            out = out.withColumn(
                col, F.col(col) + F.col("_rep") * F.lit(width)
            )
        if extra is not None:
            out = extra(out)
        (
            out.drop("_rep")
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(DST, f"{table}.parquet"))
        )

    def copy(table: str):
        shutil.copy(
            os.path.join(SRC, f"{table}.parquet"),
            os.path.join(DST, f"{table}.parquet"),
        )

    # key widths = max_key + 1 at sf0.1 (see module docstring)
    tile("events", {"event_id": 100_000, "user_id": 1_500})
    tile("orders", {"o_orderkey": 150_000, "o_custkey": 15_000})
    tile("lineitem", {"l_orderkey": 150_000})
    tile("customer", {"c_custkey": 15_000})

    def retext(out):
        return out.withColumn(
            "text",
            F.concat(
                F.col("text"), F.lit(" zqrep"), F.col("_rep").cast("string")
            ),
        ).withColumn("n_chars", F.length("text"))

    tile("documents", {"doc_id": 5_000}, extra=retext)
    tile("embeddings", {"vec_id": 2_000})
    for t in ("region", "nation", "part", "supplier"):
        copy(t)
    # done-marker LAST: an interrupted build must trigger a full rebuild,
    # not run queries against a partial/inconsistent replica
    open(os.path.join(DST, "_BUILD_DONE"), "w").write("ok")


def main() -> None:
    from portofolio_maximizer_spark.session import get_spark

    spark = get_spark("scalecheck")
    spark.sparkContext.setLogLevel("OFF")
    if "--rebuild" in sys.argv or not os.path.exists(
        os.path.join(DST, "_BUILD_DONE")
    ):
        t0 = time.time()
        build_sf1(spark)
        print(f"built {DST} in {time.time() - t0:.1f}s", file=sys.stderr)

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # warmup (JVM/codegen) outside the timed set, plus one count() of
    # every table at BOTH SFs so parquet footers/page cache are warm on
    # both sides — otherwise the sf0.1 pass absorbs all first-touch
    # costs and ratios read artificially low
    qs["q1_pricing_summary"](spark, SRC).count()
    for base in (SRC, DST):
        for f in sorted(os.listdir(base)):
            if f.endswith(".parquet"):
                spark.read.parquet(os.path.join(base, f)).count()

    rows = []
    for name in QUERIES:
        t0 = time.time()
        qs[name](spark, SRC).count()
        t_small = time.time() - t0
        t0 = time.time()
        qs[name](spark, DST).count()
        t_big = time.time() - t0
        rows.append(
            {
                "query": name,
                "t_sf0.1": round(t_small, 2),
                "t_sf1": round(t_big, 2),
                "ratio": round(t_big / max(t_small, 1e-9), 2),
            }
        )
        print(json.dumps(rows[-1]), file=sys.stderr)
    print(json.dumps({"scalecheck": rows, "replicas": REPLICAS}))


if __name__ == "__main__":
    main()
