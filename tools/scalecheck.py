"""Empirical scaling spot-check: measured decades of scale-up, with
shuffle-byte evidence.

The plan audit argues 100x structurally; this tool makes the claim
falsifiable: it tiles the sf0.1 testdata 10x into a local sf1 directory
(key-offset replication, so KEY CARDINALITY scales while per-key series
length and referential integrity are preserved — the cluster-growth
model the engine is designed for), then times a shape-diverse query set
at both SFs and prints t(sf1)/t(sf0.1). ``--decade2`` tiles a SECOND
decade (sf10 ≈ 60M lineitem rows) and times the cheapest shape-diverse
subset across sf1 → sf10, so the extrapolation rests on two measured
decades, not one.

Every timed run also records per-query SHUFFLE READ/WRITE BYTES and
spill (Spark UI REST stage metrics, scoped by job group): wall ratios
alone can hide a shuffle that grows super-linearly while the wall stays
flat behind idle cores — bytes make the 100x extrapolation bankable.
Linear work should show bytes scaling ~linearly with the data and wall
ratios at or below the data ratio for floor-dominated queries; a
super-linear BYTE outlier is a scaling bug even when the wall looks fine.

Tiling rules (honesty notes):
- fact keys (event/user/order/cust/doc/vec ids) offset by replica *
  (max_key + 1) consistently across tables, so joins stay valid and
  per-key row counts are UNCHANGED — 10x keys, not 10x-hot keys;
- document text: every TOKEN gets a per-replica prefix (a bijective
  token renaming applied uniformly within each replica). Within a
  replica, every token/shingle/gram relation — and therefore the
  exact-dup, near-dup, and substring-dup structure — is EXACTLY the
  original corpus's; across replicas the token sets are disjoint, so
  dup DENSITY is preserved at 10x volume (each replica contributes the
  original corpus's dup pairs; totals scale linearly). This is the
  honest scale model for dedup: 10x more corpus with the same
  duplication rate — the round-10 suffix-token tiling instead made
  every replica a near-duplicate of its siblings, which is why the
  dedup family could not be timed before (a 10-doc cross-replica
  clique per original doc is a DATA-CHARACTER change: candidate pairs
  grow 45x when the data grows 10x);
- embeddings: per-replica deterministic SIGN FLIP (element i negated
  when xxhash64(i, replica) is odd). A shared sign pattern is an
  isometry — every within-replica dot product, norm, and cosine is
  bit-preserved — while cross-replica cosines of identical source
  vectors become sign-randomized sums that land far below the
  semantic-dup tau, so semantic-dup density is preserved at 10x
  volume (same argument as the token renaming);
- dims (region/nation/part/supplier) are copied once — they are
  bounded reference data at any sf.

Usage: python tools/scalecheck.py [--rebuild] [--decade2]
Results go into BENCH_NOTES.md by hand.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scalecheck"
)
DST = os.path.join(_ROOT, "sf1")
DST2 = os.path.join(_ROOT, "sf10")
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
    # round-10 mechanism additions: the AQE runtime skew split (the
    # split must keep triggering as the hot partition grows 10x) and
    # the mergeable-rollup refresh (map-side-combining sub-aggregates)
    "aqe_skew_join_rollup",
    "incremental_rollup_merge",
    # round-11 (round-10 directive #4): the heavy dedup/ANN paths —
    # timeable now that the tiling preserves dup DENSITY (see honesty
    # notes): the gram-hash shuffle (linear, no pairwise stage), the
    # MinHash/LSH band shuffle with candidate verification, and the
    # cluster-confined semantic pairwise stage
    "substring_dedup_spans",
    "minhash_lsh_neardups",
    "semantic_dedup_keeplist",
    # round-12 mechanism additions: the injected runtime Bloom filter
    # (pre-shuffle fact pruning must keep shuffle bytes ~dim-selective
    # as the fact side grows 10x), the SHJ selection (threshold derived
    # from the dim's own estimate, so the algebra re-derives at sf1),
    # the WindowGroupLimit pushdown (shuffle carries <= k rows per key
    # per map task at any volume), the KMV sketch pipeline (everything
    # after the one distinct-(source,hash) shuffle is S*K-bounded), and
    # the T13 TWS drain (ListState/MapState on RocksDB: bounded per-key
    # state while input grows 10x; drain metrics via DRAIN_PROGRESS)
    "runtime_bloom_join_rollup",
    "shuffled_hash_join_rollup",
    "window_group_limit_topn",
    "vocab_theta_sketch_pairs",
    "streaming_topk_leaderboard_census",
]

#: decade-2 subset: the cheapest SHAPE-DIVERSE queries (scan+agg,
#: join+topk, per-key windows, two-pass rank, salted two-phase agg) that
#: touch only the tiled fact tables and use no staged model artifacts
QUERIES2 = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "user_return_metrics",
    "rolling_quantile_tail",
    "hourly_bars_atr",
    "customer_spend_deciles",
    "skew_salted_rollup",
    # round-11 (round-10 directive #6): the round-10 mechanisms at the
    # second decade. Both read only events. At sf1/sf10 the R162
    # replication factor is 1 (nrep = ceil(100k/n)), so the hot key is
    # the ORGANIC 2/3 of events — 6.7M rows at sf10, a true 100x of the
    # sf0.1 hot partition; the flat-peak claim is re-demonstrated where
    # it matters
    "aqe_skew_join_rollup",
    "incremental_rollup_merge",
]
#: tables the decade-2 set reads (documents/embeddings are skipped at
#: sf10 — none of QUERIES2 touch them, and the near-dup caveat above
#: would apply anyway)
TILE2_TABLES = ("events", "orders", "lineitem", "customer")

# key widths = max_key + 1 at sf0.1 (enforced, not assumed — see tile())
KEY_WIDTHS = {
    "events": {"event_id": 100_000, "user_id": 1_500},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000},
    "customer": {"c_custkey": 15_000},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}


def build_tiled(
    spark,
    src: str,
    dst: str,
    replicas: int,
    tables: tuple[str, ...],
    out_partitions: int = 32,
) -> None:
    from pyspark.sql import functions as F

    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst, exist_ok=True)
    reps = spark.range(replicas).select(F.col("id").alias("_rep"))

    def tile(table: str, offsets: dict[str, int], extra=None):
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        # the honesty notes are enforced, not assumed: a regenerated
        # testdata with larger key ranges would make replicas overlap
        # (hot keys + broken referential integrity) silently
        maxes = df.agg(*[F.max(c).alias(c) for c in offsets]).first()
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
            .repartition(out_partitions)
            .write.mode("overwrite")
            .parquet(os.path.join(dst, f"{table}.parquet"))
        )

    def retext(out):
        # bijective per-replica token renaming: prefix every token with
        # q<rep>z. Uniform within a replica → all token/shingle/gram
        # structure (exact/near/substring dup relations) is EXACTLY the
        # original corpus's; disjoint across replicas → dup density
        # preserved at 10x volume (see module honesty notes)
        prefix = F.concat(
            F.lit("q"), F.col("_rep").cast("string"), F.lit("z")
        )
        return out.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda t: F.when(
                        t == "", t
                    ).otherwise(F.concat(prefix, t)),
                ),
                " ",
            ),
        ).withColumn("n_chars", F.length("text"))

    def reembed(out):
        # per-replica deterministic sign flip: an isometry within each
        # replica (dot products/norms/cosines bit-preserved), cross-
        # replica cosines sign-randomized (see module honesty notes)
        return out.withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, i: F.when(
                    F.pmod(F.xxhash64(i, F.col("_rep")), F.lit(2)) == 0, x
                ).otherwise(-x),
            ),
        )

    extras = {"documents": retext, "embeddings": reembed}
    for t in tables:
        tile(t, KEY_WIDTHS[t], extra=extras.get(t))
    for t in ("region", "nation", "part", "supplier"):
        shutil.copy(
            os.path.join(src, f"{t}.parquet"),
            os.path.join(dst, f"{t}.parquet"),
        )
    # done-marker LAST: an interrupted build must trigger a full rebuild,
    # not run queries against a partial/inconsistent replica
    open(os.path.join(dst, "_BUILD_DONE"), "w").write("ok")


def build_sf1(spark) -> None:
    build_tiled(
        spark,
        SRC,
        DST,
        REPLICAS,
        ("events", "orders", "lineitem", "customer", "documents", "embeddings"),
    )


def _stage_metrics(spark, stage_ids: set[int]) -> dict:
    """Sum shuffle read/write and spill bytes over the given stages via
    the JVM AppStatusStore (the Python statusTracker does not expose
    byte metrics, and the session runs with the UI/REST disabled).
    Skipped stages (reused exchanges) return an empty seq — fine, their
    bytes were paid by the stage that produced the exchange.

    Also records the MAX single-task peak execution memory across the
    query's stages (task-summary max quantile): a flat-bytes query whose
    per-task peak memory grows with SF is still a 100x hazard (e.g. a
    broadcast or accumulator growing with the data) that byte totals
    alone would miss."""
    time.sleep(0.5)  # status-listener bus is async; let task events land
    store = spark.sparkContext._jsc.sc().statusStore()
    # Scala default args surface as $default$N accessors through py4j
    defaults = [
        getattr(store, f"stageData$default${i}")() for i in (2, 3, 4, 5)
    ]
    gw = spark.sparkContext._gateway
    qmax = gw.new_array(gw.jvm.double, 1)
    qmax[0] = 1.0  # the 1.0 quantile of per-task metrics == max task
    tot = {"shuffle_read_mb": 0.0, "shuffle_write_mb": 0.0, "spill_mb": 0.0}
    peak_task = 0.0
    for sid in sorted(stage_ids):
        try:
            seq = store.stageData(sid, *defaults)
            for i in range(seq.size()):
                att = seq.apply(i)
                tot["shuffle_read_mb"] += (att.shuffleReadBytes() or 0) / 1e6
                tot["shuffle_write_mb"] += (att.shuffleWriteBytes() or 0) / 1e6
                tot["spill_mb"] += (
                    (att.memoryBytesSpilled() or 0)
                    + (att.diskBytesSpilled() or 0)
                ) / 1e6
                try:
                    opt = store.taskSummary(sid, att.attemptId(), qmax)
                    if opt.isDefined():
                        peak_task = max(
                            peak_task,
                            (opt.get().peakExecutionMemory().apply(0) or 0)
                            / 1e6,
                        )
                except Exception:  # noqa: BLE001 — task data evicted
                    pass
        except Exception:  # noqa: BLE001 — stage evicted from the store
            continue
    out = {k: round(v, 2) for k, v in tot.items()}
    out["peak_task_mem_mb"] = round(peak_task, 2)
    return out


def _timed(spark, fn, name: str, sf_dir: str, label: str) -> dict:
    """Run one query under its own job group; return wall + byte metrics.

    Streaming attribution: Structured Streaming micro-batches run under
    the engine's own job group, invisible to the group-scoped stage
    metrics below — so any drain that lands during this query's window
    is attributed from the engine's OWN progress events instead
    (`streaming.stream.DRAIN_PROGRESS`: input rows, batch count, peak
    state rows, trigger wall), filtered to this sf_dir's cache key."""
    from portofolio_maximizer_spark.streaming.stream import DRAIN_PROGRESS

    sc = spark.sparkContext
    group = f"scalecheck:{name}:{label}"
    # snapshot VALUES, not just keys: a drain that re-runs (memo
    # invalidation) overwrites its slot and must still be attributed.
    # Each record carries a monotonic `seq` stamp, so a re-drain that
    # reproduces byte-identical metrics still compares unequal here.
    drains_before = dict(DRAIN_PROGRESS)
    sc.setJobGroup(group, name)
    t0 = time.time()
    fn(spark, sf_dir).count()
    wall = time.time() - t0
    sc.setLocalProperty("spark.jobGroup.id", None)
    tracker = sc.statusTracker()
    stage_ids: set[int] = set()
    for jid in tracker.getJobIdsForGroup(group) or []:
        info = tracker.getJobInfo(jid)
        if info is not None:
            stage_ids.update(info.stageIds)
    res = {"t": round(wall, 2), **_stage_metrics(spark, stage_ids)}
    # exact-key match (cache_key IS the sf_dir for every drain caller):
    # substring matching would cross-attribute .../sf1 vs .../sf10
    drains = {
        k[0]: v
        for k, v in DRAIN_PROGRESS.items()
        if drains_before.get(k) != v and str(k[1]) == sf_dir
    }
    if drains:
        res["stream_drains"] = drains
    return res


def run_decade(spark, qs, names, small: str, big: str, label: str) -> list[dict]:
    rows = []
    for name in names:
        a = _timed(spark, qs[name], name, small, f"{label}-small")
        b = _timed(spark, qs[name], name, big, f"{label}-big")
        row = {
            "query": name,
            f"t_{label}_small": a["t"],
            f"t_{label}_big": b["t"],
            "ratio": round(b["t"] / max(a["t"], 1e-9), 2),
            "shuffle_rw_mb_small": [
                a["shuffle_read_mb"], a["shuffle_write_mb"]
            ],
            "shuffle_rw_mb_big": [
                b["shuffle_read_mb"], b["shuffle_write_mb"]
            ],
            "spill_mb_big": b["spill_mb"],
            "peak_task_mem_mb_small": a["peak_task_mem_mb"],
            "peak_task_mem_mb_big": b["peak_task_mem_mb"],
        }
        if "stream_drains" in a or "stream_drains" in b:
            row["stream_drains_small"] = a.get("stream_drains", {})
            row["stream_drains_big"] = b.get("stream_drains", {})
        rows.append(row)
        print(json.dumps(rows[-1]), file=sys.stderr)
    return rows


def main() -> None:
    from portofolio_maximizer_spark.session import get_spark

    spark = get_spark("scalecheck")
    spark.sparkContext.setLogLevel("OFF")
    decade2 = "--decade2" in sys.argv
    if "--rebuild" in sys.argv or not os.path.exists(
        os.path.join(DST, "_BUILD_DONE")
    ):
        t0 = time.time()
        build_sf1(spark)
        print(f"built {DST} in {time.time() - t0:.1f}s", file=sys.stderr)
    if decade2 and (
        "--rebuild" in sys.argv
        or not os.path.exists(os.path.join(DST2, "_BUILD_DONE"))
    ):
        t0 = time.time()
        build_tiled(spark, SRC, DST2, 100, TILE2_TABLES, out_partitions=64)
        print(f"built {DST2} in {time.time() - t0:.1f}s", file=sys.stderr)

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # warmup (JVM/codegen) outside the timed set, plus one count() of
    # every table at ALL SFs so parquet footers/page cache are warm on
    # every side — otherwise the small pass absorbs all first-touch
    # costs and ratios read artificially low
    qs["q1_pricing_summary"](spark, SRC).count()
    for base in (SRC, DST) + ((DST2,) if decade2 else ()):
        for f in sorted(os.listdir(base)):
            if f.endswith(".parquet"):
                spark.read.parquet(os.path.join(base, f)).count()

    out = {"replicas": REPLICAS}
    out["scalecheck"] = run_decade(spark, qs, QUERIES, SRC, DST, "d1")
    if decade2:
        out["scalecheck_decade2"] = run_decade(
            spark, qs, QUERIES2, DST, DST2, "d2"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
