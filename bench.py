"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced with a cheap count() action (no driver-side collect of
result data beyond the aggregate). A warmup run of the flagship query
amortizes JVM/codegen startup out of the per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from portofolio_maximizer_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    load_start = os.getloadavg()
    spark = get_spark("bench")
    # OFF, not ERROR: Spark 4 structured logging writes JSON error lines to
    # stdout, which would corrupt this script's one-JSON-line contract.
    spark.sparkContext.setLogLevel("OFF")

    queries = entrymod.queries()
    # warmup: flagship query once to pay JVM/codegen startup
    queries["q1_pricing_summary"](spark, sf_dir).count()

    # The streaming drains run in a dedicated EARLY slot: after 300+
    # queries in one JVM their numbers inflate ~2x from session
    # aging/contention, not query cost (round-6 verdict, What's wrong
    # #3). Early placement keeps their timings attributable; per-query
    # pack positions are recorded so future deltas stay interpretable.
    ordered = sorted(
        queries.items(),
        key=lambda kv: (0 if kv[0].startswith("streaming_") else 1,),
    )

    def run_pass() -> tuple[dict[str, float], float]:
        t: dict[str, float] = {}
        t_all = time.time()
        for name, fn in ordered:
            t0 = time.time()
            try:
                fn(spark, sf_dir).count()
                t[name] = round(time.time() - t0, 3)
            except Exception:  # noqa: BLE001
                t[name] = -1.0
        return t, round(time.time() - t_all, 3)

    timings, total = run_pass()
    # optional warm second pass (stage caches hot, codegen compiled):
    # SPARK_GRAFT_WARM_PASS=1 — off by default to keep the driver's
    # per-round bench single-pass
    warm: dict[str, float] | None = None
    warm_total = None
    if os.environ.get("SPARK_GRAFT_WARM_PASS"):
        warm, warm_total = run_pass()

    # The driver captures only the tail of stdout (~4000 chars) and parses
    # the JSON line from it. Keep the line compact: total + the 20 slowest
    # queries at 2dp stays well under 2500 chars; the full per-query map
    # goes to a sidecar file next to this script.
    # self-describing profile (round-7 verdict What's wrong #3): which
    # staged artifacts were warm (hit) vs fit in-run (miss), and the
    # host's ambient load — so cross-round wall comparisons can separate
    # cold/warm staging and co-tenant noise mechanically.
    from portofolio_maximizer_spark.plans.queries import STAGE_EVENTS

    n_hit = sum(1 for v in STAGE_EVENTS.values() if v == "hit")
    n_miss = sum(1 for v in STAGE_EVENTS.values() if v == "miss")
    full = {
        "metric": "query_pack_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "pack_position": {name: i for i, (name, _) in enumerate(ordered)},
        "sf": sf,
        "n_queries": len(timings),
        "n_errors": sum(1 for v in timings.values() if v < 0),
        "stage_hits": n_hit,
        "stage_misses": n_miss,
        "stage_events": dict(sorted(STAGE_EVENTS.items())),
        "load_avg_start": list(load_start),
        "load_avg_end": list(os.getloadavg()),
    }
    if warm is not None:
        full["warm_value"] = warm_total
        full["warm_queries"] = warm
    # per-drain StreamingQueryProgress evidence (input rows, batches,
    # peak state rows, trigger wall): the streaming family's work runs
    # under the engine's own job group, so this registry — not stage
    # metrics — is the honest attribution of what the drains processed
    from portofolio_maximizer_spark.streaming.stream import DRAIN_PROGRESS

    # registry keys are (name, cache_key); a None cache_key must not
    # crash the sort and a same-name second key must not silently
    # overwrite the first — disambiguate with the cache key on collision
    drains: dict[str, dict] = {}
    for k, v in sorted(
        DRAIN_PROGRESS.items(), key=lambda kv: (kv[0][0], str(kv[0][1]))
    ):
        drains[k[0] if k[0] not in drains else f"{k[0]}|{k[1]}"] = v
    full["stream_drains"] = drains
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")
    with open(sidecar, "w") as f:
        json.dump(full, f, indent=1)

    top = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:20])
    line = json.dumps(
        {
            "metric": "query_pack_wall_seconds",
            "value": total,
            "unit": "sec",
            "queries": {k: round(v, 2) for k, v in top.items()},
            "sf": sf,
            "n_queries": len(timings),
            "n_errors": full["n_errors"],
            "stage": f"{n_hit}h/{n_miss}m",
            "load1": round(load_start[0], 1),
            "full": "BENCH_FULL.json",
            **({"warm_value": warm_total} if warm is not None else {}),
        },
        separators=(",", ":"),
    )
    print(line)


if __name__ == "__main__":
    main()
