"""Physical-plan audit — the scale-readiness gate.

Captures ``explain("formatted")`` for every registered query and flags the
anti-patterns that break at 100 TB even when sf0.1 results are correct:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` anywhere (all-pairs);
  CARTESIAN is the only HARD failure. BNLJ is flagged soft because it is
  the *correct* plan when one side is a broadcast scalar/tiny aggregate
  (``crossJoin(broadcast(agg))`` — bootstrap CI, mixing-rate, threshold
  scalars all plan this way) and a bug only when both sides scale with
  the data — the reviewer decides from the side cardinalities;
- parquet scans with empty ``PushedFilters`` under a query that filters;
- ``ReadSchema`` wider than ~12 columns (no column pruning);
- more than a soft cap of ``Exchange`` nodes (shuffle storms).

Usage:  python tools/planaudit.py [sf_dir] [query ...]
Prints one line per query: flags or "clean", then a summary. Exit 1 if any
hard flag (cartesian) fires. The pytest twin (tests/test_plans.py) pins the
plan properties of the headline queries so regressions fail CI.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(plan: str) -> list[str]:
    flags: list[str] = []
    if "CartesianProduct" in plan:
        flags.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in plan:
        flags.append("NESTED_LOOP_JOIN")
    # formatted mode prints each node twice (tree + details); count the
    # numbered detail entries only
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    if n_exchange > 12:
        flags.append(f"EXCHANGES={n_exchange}")
    wide = [
        m.group(1)
        for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan)
        if m.group(1).count(",") + 1 > 12
    ]
    if wide:
        flags.append(f"WIDE_SCAN={wide[0].count(',') + 1}cols")
    return flags


def main() -> None:
    from portofolio_maximizer_spark.session import get_spark

    import __spark_entry__ as entrymod

    argv = sys.argv[1:]
    sf_dir = argv[0] if argv and os.path.isdir(argv[0]) else "/root/testdata/sf0.01"
    names = [a for a in argv if not os.path.isdir(a)]
    spark = get_spark("planaudit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    if names:
        queries = {n: queries[n] for n in names}
    hard = 0
    for name, fn in queries.items():
        try:
            flags = audit(plan_text(fn(spark, sf_dir)))
        except Exception as exc:  # noqa: BLE001
            print(f"ERR   {name}: {exc}")
            hard += 1
            continue
        if any(f == "CARTESIAN" for f in flags):
            hard += 1
        print(f"{'FLAG' if flags else 'ok  '}  {name}: {', '.join(flags) or 'clean'}")
    print(f"\n{len(queries)} plans audited, {hard} hard failures")
    sys.exit(1 if hard else 0)


if __name__ == "__main__":
    main()
