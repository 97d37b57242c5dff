"""CLI driver — the operational surface a user of the reference's
``scripts/run_etl_pipeline.py`` / ``scripts/run_auto_trader.py`` would
switch to (SURVEY §3 entry points, re-expressed as query invocations).

    python -m portofolio_maximizer_spark list [pattern]
    python -m portofolio_maximizer_spark run <query> [--sf-dir D] [--show N]
                                          [--explain] [--out PATH]
    python -m portofolio_maximizer_spark bench [--sf-dir D]
    python -m portofolio_maximizer_spark audit [query ...]

``run --out`` writes the result as parquet (atomic overwrite), which is how
a scheduled pipeline stage would materialize any query here as a table.
"""

from __future__ import annotations

import argparse
import fnmatch
import os
import runpy
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="portofolio_maximizer_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("pattern", nargs="?", default="*")

    p_run = sub.add_parser("run", help="run one query")
    p_run.add_argument("query")
    p_run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_run.add_argument("--show", type=int, default=20)
    p_run.add_argument("--explain", action="store_true")
    p_run.add_argument("--out", default=None, help="write result parquet here")

    p_bench = sub.add_parser("bench", help="run the bench harness")
    p_bench.add_argument("--sf-dir", default=None)

    p_audit = sub.add_parser("audit", help="physical-plan audit")
    p_audit.add_argument("names", nargs="*")
    p_audit.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    p_pipe = sub.add_parser("pipeline", help="run a config-driven pipeline")
    p_pipe.add_argument("--config", required=True)
    p_pipe.add_argument("--run-id", default=None)

    args = ap.parse_args(argv)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)

    if args.cmd == "bench":
        if args.sf_dir:
            os.environ["SPARK_GRAFT_SF_DIR"] = args.sf_dir
        runpy.run_path(os.path.join(repo_root, "bench.py"), run_name="__main__")
        return 0

    if args.cmd == "audit":
        sys.argv = ["planaudit.py", args.sf_dir, *args.names]
        runpy.run_path(
            os.path.join(repo_root, "tools", "planaudit.py"), run_name="__main__"
        )
        return 0

    if args.cmd == "pipeline":
        from portofolio_maximizer_spark.pipeline import run_pipeline_file
        from portofolio_maximizer_spark.session import get_spark

        spark = get_spark("pipeline")
        spark.sparkContext.setLogLevel("WARN")
        for meta in run_pipeline_file(spark, args.config, run_id=args.run_id):
            print(f"{meta['stage']}\t{meta['query']}\t{meta['fingerprint']}\t{meta['path']}")
        return 0

    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    if args.cmd == "list":
        oracles = entrymod.oracle_sql()
        for name in queries:
            if fnmatch.fnmatch(name, args.pattern):
                kind = "oracle" if name in oracles else "rows-only"
                print(f"{name}\t{kind}\t{queries[name].__module__}")
        return 0

    if args.query not in queries:
        print(f"unknown query {args.query!r}; try `list`", file=sys.stderr)
        return 2
    from portofolio_maximizer_spark.session import get_spark

    spark = get_spark(f"run-{args.query}")
    spark.sparkContext.setLogLevel("WARN")
    df = queries[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    if args.out:
        from portofolio_maximizer_spark.sources.io import write_parquet

        write_parquet(df, args.out)
        print(f"wrote {df.count()} rows to {args.out}")
    else:
        df.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
