"""Physical-plan audit — the scale-readiness gate.

Captures ``explain("formatted")`` for every registered query and flags the
anti-patterns that break at 100 TB even when sf0.1 results are correct:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` anywhere (all-pairs);
  CARTESIAN is a HARD failure. BNLJ is the *correct* plan when one side
  is a broadcast scalar/tiny aggregate (``crossJoin(broadcast(agg))`` —
  bootstrap CI, mixing-rate, threshold scalars all plan this way) and a
  bug only when both sides scale with the data. Since round 8 the tool
  adjudicates this itself: a physical BNLJ whose optimized-plan cross
  joins ALL carry a BOUNDED side (scalar aggregate / constant-keyed
  aggregate / Limit / constant id-range filter — the same whitelist the
  broadcast rule uses) is the documented scalar-attach pattern and does
  not flag; it flags soft only when some cross join has NO bounded side
  (or the BNLJ came from a conditioned non-equi join, which the logical
  scan cannot classify);
- ``FORCED_BROADCAST`` (HARD): a hand-written ``F.broadcast()`` hint whose
  build side scans an sf-scaling base table (lineitem/orders/customer/
  supplier/part/events/documents/embeddings) without anything that bounds
  its cardinality. At sf0.1 such a hint is free speed; at 100 TB it OOMs
  the build side — it is exactly the decision AQE must stay free to make.
  Detected from the optimized logical plan, where hints survive as
  ``leftHint=/rightHint=(strategy=broadcast)``; cost-based broadcasts
  chosen by Catalyst at small sf carry no hint marker and do not flag.
  A hinted side is considered bounded (allowed) when its subtree shrinks
  through a scalar/constant-keyed ``Aggregate``, a ``Limit``, or a constant
  id-range filter (``vec_id < 5``-style fixed query sets). An Aggregate or
  Deduplicate keyed on a HIGH-CARDINALITY entity id (doc_id, user_id, …)
  emits one row per entity and still scales with sf, so it does NOT exempt
  the hint — it downgrades it to a soft ``FORCED_BROADCAST_KEYED_AGG`` for
  reviewer judgment. ``localCheckpoint``-truncated lineage (``LogicalRDD``)
  is matched by its column list against the same sf-scaling markers, so
  checkpointed big data cannot hide a forced broadcast;
- ``SINGLE_PARTITION_WINDOW`` (HARD): a ``Window`` with an empty partition
  spec over a subtree that scans an sf-scaling table — Spark funnels the
  whole frame through ONE task. Bounded subtrees (Limit / scalar aggregate /
  constant-keyed aggregate / constant id-range filter) are exempt, the same
  whitelist the broadcast rule uses; a subtree whose only shrink is a
  high-cardinality keyed aggregate flags soft
  (``SINGLE_PARTITION_WINDOW_KEYED``) for reviewer judgment;
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


def optimized_plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("extended")
    txt = buf.getvalue()
    m = re.search(r"== Optimized Logical Plan ==\n(.*?)\n== Physical Plan ==", txt, re.S)
    return m.group(1) if m else ""


# Tables whose row counts scale with the data (vs the constant-cardinality
# region/nation and in-memory rule/param tables), identified in Relation
# lines by a marker column unique to each table.
_SF_SCALING_MARKERS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

# constant id-range predicate => fixed-size query set regardless of sf
_ID_BOUND_RE = re.compile(r"Filter [^\n]*\w*id#\d+L? (?:<=?|=) \d+")
# a Range leaf qualifies as a literal dimension only below this many rows:
# parameter grids / salt replicas / calendar enumerations sit orders of
# magnitude under it, a data-sized spark.range far above
_RANGE_CAP = 100_000
# Grouping keys with CONSTANT cardinality regardless of sf — the only keys
# whose Aggregate/Deduplicate bounds its subtree. Everything else (unknown
# keys included: chunk hashes, grams, component ids all scale with the
# corpus) is treated as scaling and surfaces as the soft KEYED_AGG flag —
# the safe default is "scales until proven constant", not the reverse.
_CONST_CARD_COLS = {
    "source",
    "lang",
    "event_type",
    "event_type_clean",
    "l_returnflag",
    "l_linestatus",
    # class labels: cardinality fixed by the embeddings TABLE SCHEMA
    # (10 classes — a dataset-spec fact like l_returnflag, not an
    # engine-minted name); cmp_label is its derived comparison copy
    "label",
    "cmp_label",
    # quality-rule identifiers: cardinality fixed by the rule set
    "first_fail",
    "rule_id",
    # the NB classifier's hashed bag-of-words bucket: cardinality fixed
    # by the modulo constant in its definition (pmod(md5(tok), 64) —
    # 64 buckets at any sf), named uniquely so the bound is auditable
    "hash_bucket64",
    # vector-dimension index: 64 dims by schema; unique marker name
    # (round-10 directive #6 — was the generic 'dim')
    "vec_dim64",
    # Bloom-filter bit-array coordinates: seed ∈ [0, k), position =
    # hash % m — cardinality capped at k·m by CONSTRUCTION, never by
    # data volume (that cap is the whole point of the structure)
    "bloom_seed",
    "bloom_pos",
    # IVF inverted-list index + its per-list centroid vector: one row
    # per list, nlist-bounded by construction (the centroid TABLE is
    # tiny at any sf; the vec-grain ASSIGNMENTS carry vec_id and stay
    # recognized as scaling). Unique marker names (were 'list_id'/'ce')
    "ivf_list_id",
    "centroid_vec",
    # the CV splitter's distinct-calendar-date key: cardinality bounded
    # by the time SPAN (days of history), not the row count. Unique
    # marker name (was the generic 'dt')
    "cal_date",
    "r_name",
    "n_name",
    # Round-10 directive #6 + round-11 ADVICE sweep: every
    # formerly-whitelisted generic name ('model', 'arm', 'bucket',
    # 'side', 'stage', 'regime', 'fold', 'split', 'action', 'verdict',
    # 'reason', 'dt', 'dim', 'ce', 'list_id') is REMOVED — measured
    # per-entry by removal: no audited plan's boundedness depends on
    # them (the ones that did were renamed to the collision-proof
    # markers above), so a coincidental corpus column with one of those
    # names can no longer self-qualify as bounded. The round-10 sweep
    # missed 'stage'/'regime'/'fold'/'split'/'action' (the comment
    # claimed removal while the entries survived — round-10 ADVICE);
    # this round actually removed them and re-measured the full audit.
}
# Reference-dimension schema columns: region (5 rows) and nation (25 rows)
# are constant-size at any sf, so leaves made ONLY of their columns are
# bounded by table identity.
_BOUNDED_DIM_COLS = {
    "r_regionkey",
    "r_comment",
    "n_nationkey",
    "n_regionkey",
    "n_comment",
}

# grouped Aggregate prints TWO lists (`Aggregate [keys], [outputs]`);
# scalar prints one (`Aggregate [outputs]`) — or, fully column-pruned,
# none at all (bare `Aggregate`). Deduplicate's single list IS its keys.
_AGG_KEYS_RE = re.compile(r"\b(Aggregate|Deduplicate)(?: \[([^\]]*)\])?(, \[)?")


def _node_col(line: str) -> int:
    return len(re.match(r"^[ :+\-]*", line).group(0))


def _scan_tables(subtree: str) -> set[str]:
    # LogicalRDD included: localCheckpoint truncates lineage to LogicalRDD
    # but keeps the column list, so checkpointed sf-scaling data is still
    # recognized by its marker columns (it would otherwise be a
    # FORCED_BROADCAST blind spot).
    tables: set[str] = set()
    for m in re.finditer(r"(?:Relation|LogicalRDD) \[([^\]]*)\]", subtree):
        cols = {re.sub(r"#\d+L?$", "", c.strip()) for c in m.group(1).split(",")}
        for table, marker in _SF_SCALING_MARKERS.items():
            if marker in cols:
                tables.add(table)
    return tables


def _bounded(side: str) -> tuple[bool, bool]:
    """(bounded, keyed_agg_only): whether anything in the hinted subtree
    bounds its cardinality independent of sf.

    Bounding: a scalar aggregate or one grouped purely on allowlisted
    constant-cardinality columns, a Limit, or a constant id-range filter.
    An Aggregate/Deduplicate keyed on anything else (entity ids, chunk
    hashes, grams, component labels — or any UNKNOWN key) emits one row
    per key value, which scales with sf, so it does not bound; if it is
    the only shrink node present, the hint is reported as a soft
    KEYED_AGG flag rather than silently allowed."""
    if re.search(r"\b(GlobalLimit|LocalLimit)\b", side) or _ID_BOUND_RE.search(side):
        return True, False
    # a rank-limit pushdown partitioned on constant-cardinality keys
    # (top-k per use_case/model/...) emits at most limit x |keys| rows
    for m in re.finditer(r"WindowGroupLimit \[([^\]]*)\]", side):
        keys = {
            re.sub(r"#\d+L?$", "", c.strip())
            for c in m.group(1).split(",")
            if c.strip()
        }
        if keys and keys <= _CONST_CARD_COLS:
            return True, False
    # a side with NO sf-scaling leaf anywhere is a literal dimension —
    # Range bin/replica enumerations, LocalRelation lookup rows,
    # region/nation reference tables. Range leaves only qualify when the
    # PRINTED end value is under a constant cap (a data-sized
    # spark.range(n_rows) must not auto-qualify just for being a Range).
    # Relation AND LogicalRDD leaves (checkpoint-truncated lineage,
    # staged-artifact reads) only qualify when every column is
    # constant-cardinality BY NAME (e.g. the Bloom bit set's
    # (bloom_seed, bloom_pos) — k·m-capped by construction, or
    # region/nation's schema columns); an unrecognized frame stays
    # unbounded (safe default) — a corpus-scale staged artifact without
    # marker columns must NOT auto-qualify just because _scan_tables
    # does not recognize it.
    leaves = re.findall(
        r"\b(?:Relation|LogicalRDD|Range \(|LocalRelation|OneRowRelation)",
        side,
    )
    if leaves and not _scan_tables(side):
        leaf_ok = True
        for m in re.finditer(r"\bRange \((-?\d+), (-?\d+)", side):
            if abs(int(m.group(2)) - int(m.group(1))) > _RANGE_CAP:
                leaf_ok = False
        for m in re.finditer(
            r"(?:Relation|LogicalRDD) \[([^\]]*)\]", side
        ):
            cols = {
                re.sub(r"#\d+L?$", "", c.strip())
                for c in m.group(1).split(",")
                if c.strip()
            }
            if not cols <= (_CONST_CARD_COLS | _BOUNDED_DIM_COLS):
                leaf_ok = False
        if leaf_ok:
            return True, False
    keyed_only = False
    for m in _AGG_KEYS_RE.finditer(side):
        if m.group(1) == "Aggregate" and not m.group(3):
            return True, False  # scalar aggregate (single list = outputs)
        keys = {
            re.sub(r"#\d+L?$", "", c.strip())
            for c in (m.group(2) or "").split(",")
            if c.strip()
        }
        if not keys or keys <= _CONST_CARD_COLS:
            return True, False  # empty or constant-cardinality grouping
        keyed_only = True
    return False, keyed_only


def _top_level_brackets(s: str) -> list[str]:
    """Split the argument tail of a logical-plan node into its top-level
    ``[...]`` groups (bracket-depth aware — expressions inside may nest)."""
    groups: list[str] = []
    depth = 0
    start = -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start >= 0:
                groups.append(s[start + 1 : i])
                start = -1
    return groups


def single_partition_window_flags(opt_plan: str) -> list[str]:
    """Flag ``Window`` nodes with an EMPTY partition spec whose subtree
    scans an sf-scaling table — Spark moves the entire frame to ONE task
    (``WindowExec: No Partition Defined``), the classic 100 TB killer.

    A logical Window prints ``Window [exprs], [partSpec], [ordSpec]``
    with EMPTY specs omitted, so the unpartitioned form is either one
    top-level bracket group (``Window.partitionBy()`` global aggregates)
    or two where the trailing group is an ORDER spec (``ASC``/``DESC``
    markers); two groups whose tail is a plain column list are
    partition-only windows (grouped stats) and do not flag. Same
    bounded-cardinality whitelist as the broadcast rule: a subtree that
    shrinks through a Limit / scalar aggregate / constant-keyed
    aggregate / constant id-range filter is bounded (no flag); one whose
    only shrink is a HIGH-cardinality keyed aggregate (vocab ranks,
    entity grains) is a soft ``SINGLE_PARTITION_WINDOW_KEYED`` for
    reviewer judgment; anything else is HARD."""
    flags: list[str] = []
    lines = opt_plan.splitlines()
    for i, ln in enumerate(lines):
        m = re.search(r"\bWindow (\[.*)$", ln)
        if not m:
            continue
        groups = _top_level_brackets(m.group(1))
        ordered_tail = bool(
            groups and re.search(r"\b(ASC|DESC)\b", groups[-1])
        )
        unpartitioned = len(groups) == 1 or (
            len(groups) == 2 and ordered_tail
        )
        if not unpartitioned:
            continue
        p = _node_col(ln)
        sub: list[str] = []
        j = i + 1
        while j < len(lines) and _node_col(lines[j]) > p:
            sub.append(lines[j])
            j += 1
        subtree = "\n".join(sub)
        tables = _scan_tables(subtree)
        if not tables:
            continue
        bounded, keyed_only = _bounded(subtree)
        if bounded:
            continue
        kind = (
            "SINGLE_PARTITION_WINDOW_KEYED"
            if keyed_only
            else "SINGLE_PARTITION_WINDOW"
        )
        flags.append(f"{kind}[{','.join(sorted(tables))}]")
    return sorted(set(flags))


def forced_broadcast_flags(opt_plan: str) -> list[str]:
    """Flag hand-written broadcast hints on unbounded sf-scaling scans.
    FORCED_BROADCAST is HARD; FORCED_BROADCAST_KEYED_AGG (the build side
    shrinks only through a high-cardinality grouped aggregate, which still
    scales with sf) is soft — the reviewer judges the key's cardinality."""
    flags: list[str] = []
    lines = opt_plan.splitlines()
    for i, ln in enumerate(lines):
        if "Hint=(strategy=broadcast" not in ln:
            continue
        p = _node_col(ln)
        sub: list[str] = []
        j = i + 1
        while j < len(lines) and _node_col(lines[j]) > p:
            sub.append(lines[j])
            j += 1
        child_starts = [k for k, l in enumerate(sub) if _node_col(l) == p + 3]
        sides: list[str] = []
        if "leftHint=(strategy=broadcast" in ln and child_starts:
            end = child_starts[1] if len(child_starts) > 1 else len(sub)
            sides.append("\n".join(sub[child_starts[0] : end]))
        if "rightHint=(strategy=broadcast" in ln and len(child_starts) > 1:
            sides.append("\n".join(sub[child_starts[1] :]))
        for side in sides:
            tables = _scan_tables(side)
            if not tables:
                continue
            bounded, keyed_only = _bounded(side)
            if bounded:
                continue
            kind = "FORCED_BROADCAST_KEYED_AGG" if keyed_only else "FORCED_BROADCAST"
            flags.append(f"{kind}[{','.join(sorted(tables))}]")
    return flags


def _attr_ids(s: str) -> set[str]:
    """All attribute ids (#NNN) appearing in a plan fragment."""
    return set(re.findall(r"#(\d+)", s))


def _is_equi_conjunct(
    conj: str,
    left_ids: set[str] | None = None,
    right_ids: set[str] | None = None,
) -> bool:
    """True when a conjunct is a single attribute-to-attribute equality
    (cast/normalize wrappers allowed — Spark hash-joins those), i.e. the
    join has hash keys and will NOT plan as BNLJ. Negations, OR groups
    and inequalities are not equi. When the join children's attribute-id
    sets are supplied, the equality must SPAN them: ``a.x = a.y`` (both
    sides from one child) gives Spark no hash keys and must not
    adjudicate the join as hash-joinable."""
    c = _strip_outer_parens(conj)
    if c.startswith("NOT "):
        return False
    depth = 0
    eq_pos = []
    i = 0
    while i < len(c):
        ch = c[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and c.startswith(" = ", i):
            eq_pos.append(i)
        i += 1
    if len(eq_pos) != 1:
        return False
    left, right = c[: eq_pos[0]], c[eq_pos[0] + 3 :]
    if re.search(r" OR | AND ", left) or re.search(r" OR | AND ", right):
        return False
    lids, rids = _attr_ids(left), _attr_ids(right)
    if not lids or not rids:
        return False
    if left_ids is not None and right_ids is not None:
        return bool(
            (lids & left_ids and rids & right_ids)
            or (lids & right_ids and rids & left_ids)
        )
    return True


def _flatten_conjuncts(cond: str) -> list[str]:
    """Recursively flatten nested depth-0 AND groups:
    '((A AND B)) AND C' -> [A, B, C]."""
    out: list[str] = []
    for part in _top_level_conjuncts(cond):
        sp = _strip_outer_parens(part)
        subs = _top_level_conjuncts(sp)
        if len(subs) > 1:
            out.extend(_flatten_conjuncts(sp))
        else:
            out.append(sp)
    return out


def _strip_outer_parens(s: str) -> str:
    """Remove balanced wrapping parens: '((A) AND (B))' -> '(A) AND (B)'."""
    s = s.strip()
    while s.startswith("(") and s.endswith(")"):
        depth = 0
        for i, ch in enumerate(s):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i < len(s) - 1:
                    return s  # first paren closes early: no outer wrap
        s = s[1:-1].strip()
    return s


def _top_level_conjuncts(cond: str) -> list[str]:
    """Split a join condition on depth-0 ' AND ' (outer wrap stripped —
    Spark prints '((A) AND (B))', which would otherwise never split)."""
    cond = _strip_outer_parens(cond)
    parts: list[str] = []
    depth = 0
    start = 0
    i = 0
    while i < len(cond):
        ch = cond[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and cond.startswith(" AND ", i):
            parts.append(cond[start:i])
            start = i + 5
            i += 5
            continue
        i += 1
    parts.append(cond[start:])
    return parts


def nested_loop_flags(phys_plan: str, opt_plan: str) -> list[str]:
    """Adjudicate BroadcastNestedLoopJoin against the optimized plan.

    BNLJ-prone joins are cross joins plus conditioned joins with no
    top-level pure attribute-equality conjunct (an OR of equalities, a
    pure range predicate — Spark has no hash keys for those). The BNLJ
    is the documented scalar/dim-attach pattern — no flag — when every
    prone join carries a BOUNDED side (same whitelist as the broadcast
    rule). It flags soft when some prone join has no bounded side, or
    when no prone join can be found at all for a physical BNLJ
    (attribution failed — conservative)."""
    if "BroadcastNestedLoopJoin" not in phys_plan:
        return []
    lines = opt_plan.splitlines()
    prone = 0
    bounded_prone = 0
    for i, ln in enumerate(lines):
        m = re.search(r"\bJoin (\w+)(?:, (.*))?$", ln.strip())
        if not m:
            continue
        jtype, tail = m.group(1), m.group(2) or ""
        cond = re.sub(r",? ?(?:left|right)Hint=.*$", "", tail)
        p = _node_col(ln)
        sub: list[str] = []
        j = i + 1
        while j < len(lines) and _node_col(lines[j]) > p:
            sub.append(lines[j])
            j += 1
        starts = [k for k, l in enumerate(sub) if _node_col(l) == p + 3]
        sides = [
            "\n".join(sub[a:b])
            for a, b in zip(starts, starts[1:] + [len(sub)])
        ]
        if jtype != "Cross":
            if not cond:
                continue  # condition-less non-cross: analyzer artifact
            # the equality must span BOTH children: a same-side a.x = a.y
            # gives Spark no hash keys (resolve ids against the subtrees)
            lids = _attr_ids(sides[0]) if len(sides) == 2 else None
            rids = _attr_ids(sides[1]) if len(sides) == 2 else None
            if any(
                _is_equi_conjunct(c, lids, rids)
                for c in _flatten_conjuncts(cond)
            ):
                continue  # hash-joinable: not the BNLJ
        prone += 1
        if sides and any(_bounded(side)[0] for side in sides):
            bounded_prone += 1
    if prone and prone == bounded_prone:
        return []
    return ["NESTED_LOOP_JOIN"]


def audit(plan: str) -> list[str]:
    flags: list[str] = []
    if "CartesianProduct" in plan:
        flags.append("CARTESIAN")
    # formatted mode prints each node twice (tree + details); count the
    # numbered detail entries only
    n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
    if n_exchange > 12:
        flags.append(f"EXCHANGES={n_exchange}")
    # WIDE_SCAN applies to sf-scaling TABLE scans (no column pruning on a
    # fact table is a 100 TB hazard). Scans of oracle_stage artifacts are
    # model-cardinality verification outputs read back whole by design —
    # split the formatted plan into per-scan detail blocks so the
    # Location line can exempt them.
    bounds = [m.start() for m in re.finditer(r"^\(\d+\) ", plan, re.M)] + [len(plan)]
    scan_blocks = [
        plan[a:b]
        for a, b in zip(bounds, bounds[1:])
        if plan[a:].startswith(tuple(f"({d}" for d in "0123456789"))
        and re.match(r"\(\d+\) Scan parquet", plan[a:b])
    ]
    for block in scan_blocks:
        m = re.search(r"ReadSchema: struct<([^>]*)>", block)
        if not m or "oracle_stage" in block:
            continue
        ncols = m.group(1).count(",") + 1
        if ncols > 12:
            flags.append(f"WIDE_SCAN={ncols}cols")
            break
    return flags


#: The PINNED soft-flag inventory (round-10 directive: documented-only
#: prose is not a gate — a new query adding an unexplained soft flag must
#: fail LOUDLY). Maps query name → flag KIND (EXCHANGES counts are
#: structural but can shift ±1 with sf-dependent broadcast decisions, so
#: the kind is pinned, not the count). Each value is the FULL sorted
#: "+"-joined KIND-SET the query's plan emits — not just the first flag —
#: so a pinned query gaining an additional soft flag of another kind
#: drifts loudly (round-11 ADVICE #3). A full-registry audit whose
#: soft-flagged set differs from this pin exits 1; changing the set
#: requires editing BOTH this dict and the mirror inventory in
#: tests/test_planaudit_pin.py (which carries the per-query
#: justifications) — the two are asserted equal by pytest.
EXPECTED_SOFT_FLAGS: dict[str, str] = {
    # 10 bounded-composition EXCHANGES reports: multi-facet report folds
    # whose every exchange is over a bounded (dim/rule/scenario) key —
    # adjudicated individually in BENCH_NOTES.md, carried since round 9.
    # Optimization round 12 REMOVED five long-pinned entries by actually
    # removing the exchanges the pin documented: run_execution_summary
    # (B4.2 top-k materialization), attribution_multiway_table (B4.1
    # shared-helper materialization), and dedup_savings_curve /
    # llm_system_health_report / nav_rebalance_plan (B6.1 shared-frame
    # composition: the sub-query frames they re-planned inline are now
    # built once per session and materialized at the first consumer's
    # action).
    # Optimization round 13 removed six MORE by removing the exchanges
    # (plan restructures, see OPTIMIZATION_r13.md): barbell_pnl_
    # evaluation (arm/delta unions -> explode + pivot), dashboard_
    # snapshot (day-grain partials), classifier_label_accumulation
    # (census explode), ticker_universe_summary / token_budget_epoch_
    # plan (bounded-frame checkpoints), capital_readiness_check (R3+R6
    # one-pass fold).
    "unlinked_close_repair_plan": "EXCHANGES",
    "order_learner_health_check": "EXCHANGES",
    # round-13 restructures left these two with a NESTED_LOOP_JOIN flag
    # instead: their scalar crossJoin chains now attach 1-row aggregates
    # that are localCheckpoint-pinned, and the checkpoint (a LogicalRDD)
    # hides the Aggregate-boundedness proof the auditor's BNLJ exemption
    # looks for — the frames are single-row by construction (global
    # aggregates), so the joins stay 1xN broadcast attaches at any scale
    "split_drift_psi": "NESTED_LOOP_JOIN",
    "platt_contract_audit": "NESTED_LOOP_JOIN",
    # the ONE declared O(N²): L6's exact-cosine correctness baseline,
    # which refuses corpora >200k vectors and names L2/L28/L7 as the
    # scale paths in its docstring
    "embedding_cosine_neardups": "NESTED_LOOP_JOIN",
}


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
    soft_seen: dict[str, str] = {}
    for name, fn in queries.items():
        try:
            df = fn(spark, sf_dir)
            phys = plan_text(df)
            flags = audit(phys)
            opt = optimized_plan_text(df)
            flags += nested_loop_flags(phys, opt)
            flags += forced_broadcast_flags(opt)
            flags += single_partition_window_flags(opt)
        except Exception as exc:  # noqa: BLE001
            print(f"ERR   {name}: {exc}")
            hard += 1
            continue
        if any(
            f == "CARTESIAN"
            or f.startswith("FORCED_BROADCAST[")
            or f.startswith("SINGLE_PARTITION_WINDOW[")
            for f in flags
        ):
            hard += 1
        if flags:
            # pin the FULL kind-set, not flags[0]: a query that keeps
            # its pinned first flag but gains a second flag of another
            # kind must fail the drift gate loudly (round-11 ADVICE)
            soft_seen[name] = "+".join(
                sorted({f.split("=")[0].split("[")[0] for f in flags})
            )
        print(f"{'FLAG' if flags else 'ok  '}  {name}: {', '.join(flags) or 'clean'}")
    drift = 0
    if not names:  # the pin is defined over the FULL registry only
        for q in sorted(set(soft_seen) - set(EXPECTED_SOFT_FLAGS)):
            print(f"DRIFT unpinned soft flag: {q}: {soft_seen[q]}")
            drift += 1
        for q in sorted(set(EXPECTED_SOFT_FLAGS) - set(soft_seen)):
            print(f"DRIFT pinned flag no longer observed: {q}: "
                  f"{EXPECTED_SOFT_FLAGS[q]}")
            drift += 1
        for q in sorted(set(soft_seen) & set(EXPECTED_SOFT_FLAGS)):
            if soft_seen[q] != EXPECTED_SOFT_FLAGS[q]:
                print(f"DRIFT flag kind changed: {q}: "
                      f"{EXPECTED_SOFT_FLAGS[q]} -> {soft_seen[q]}")
                drift += 1
    print(
        f"\n{len(queries)} plans audited, {hard} hard failures, "
        f"{len(soft_seen)} soft flags ({drift} drift vs pin)"
    )
    sys.exit(1 if hard or drift else 0)


if __name__ == "__main__":
    main()
