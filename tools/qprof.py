"""Per-query profiler for the optimization rounds.

For each named query (default: all), measures separately:

- ``build_s``  — wall for calling the query function (DataFrame DAG
  construction: py4j expression traffic, any driver-side staging probes);
- ``exec_s``   — wall for the timed action. Default mirrors bench.py's
  ``count()``; ``--noop`` uses the guide §1.4 noop sink (computes every
  column, no output cost) for isolation work.

Optionally dumps ``explain("formatted")`` per query to a directory
(``--explain-dir plans/r12 --suffix _before``).

Usage:
  python tools/qprof.py [--sf-dir D] [--noop] [--repeat N]
                        [--explain-dir DIR --suffix S] [query ...]

Prints one JSON line per query plus a sorted summary to stderr; writes
the full map to ``QPROF.json`` (cwd).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from portofolio_maximizer_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--explain-dir")
    ap.add_argument("--suffix", default="")
    ap.add_argument("--out", default="QPROF.json")
    args = ap.parse_args()

    spark = get_spark("qprof")
    spark.sparkContext.setLogLevel("OFF")
    qs = entrymod.queries()
    names = args.queries or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # warmup (pay JVM/codegen startup outside the timings)
    qs["q1_pricing_summary"](spark, args.sf_dir).count()

    out: dict[str, dict] = {}
    for name in names:
        best: dict | None = None
        for _ in range(max(1, args.repeat)):
            spark.sparkContext.setJobDescription(f"qprof:{name}")
            t0 = time.time()
            df = qs[name](spark, args.sf_dir)
            t1 = time.time()
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            t2 = time.time()
            rec = {
                "build_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
        out[name] = best
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: best}), flush=True)
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = qs[name](spark, args.sf_dir)
            p = os.path.join(args.explain_dir, f"{name}{args.suffix}.txt")
            with open(p, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    tot_b = sum(v["build_s"] for v in out.values())
    tot_e = sum(v["exec_s"] for v in out.values())
    print(f"# n={len(out)} build={tot_b:.1f}s exec={tot_e:.1f}s", file=sys.stderr)
    for name, v in sorted(out.items(), key=lambda kv: -kv[1]["total_s"])[:30]:
        print(f"#  {v['total_s']:8.2f} (b {v['build_s']:6.2f} / x {v['exec_s']:6.2f})  {name}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
