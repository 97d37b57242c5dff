"""Skew mitigation + co-located join machinery (charter: "broadcast()
for small dims, repartition()/bucketing for co-located joins, salting for
skew, AQE for runtime re-plan").

AQE's skew-join splitting handles sort-merge joins automatically; the two
helpers here cover the cases AQE cannot:

- ``salted_aggregate`` — a hot GROUP BY key that funnels into one reducer.
  Two-phase: partial aggregation on (key, salt) spreads the hot key over
  ``n_salts`` reducers, the final pass combines the partials. Correct for
  any algebra expressible as (partial, merge) — sum/count/min/max here.
- ``salted_join`` — a skewed fact key joined to a dimension: the dim side
  is replicated ``n_salts`` times (explode — dimension rows are small by
  definition), the fact side gets a DETERMINISTIC hash salt, and the join
  key becomes (key, salt): the hot key's rows land on n_salts reducers.

Reference context: the pandas engine never shuffles so it has no skew
problem; these are the 100 TB-design pieces SURVEY §7.1 step 10 calls
partition-first design.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: Sequence[str], n_salts: int) -> Column:
    """Deterministic per-row salt in [0, n_salts): hash of the full row
    key-set — NOT rand(), so retries/replays land identically."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    salt_by: Sequence[str],
    n_salts: int = 16,
    value: Column | str = "value",
) -> DataFrame:
    """Two-phase skew-safe aggregation producing per-key
    sum(value)/count/min/max — the partial pass groups on (keys, salt),
    the final pass merges partials on keys alone. ``value`` may be any
    column expression; pass a DECIMAL cast when the two-phase sum must
    be bit-identical to a one-phase sum (float partials drift a ulp
    under reassociation)."""
    vcol = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn("_salt", _salt(salt_by, n_salts))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(vcol).alias("_s"),
        F.count(F.lit(1)).alias("_c"),
        F.min(vcol).alias("_mn"),
        F.max(vcol).alias("_mx"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("_s").alias("sum_value"),
        F.sum("_c").alias("n"),
        F.min("_mn").alias("min_value"),
        F.max("_mx").alias("max_value"),
    )


# joins whose result is row-for-row equal to the plain join under dim
# replication: every fact row meets exactly ONE replica of its dim match
# (the one sharing its salt), and unmatched FACT rows surface once.
_SALTED_JOIN_HOWS = frozenset(
    {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
     "semi", "left_anti", "leftanti", "anti"}
)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_by: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: dim replicated per salt, fact salted by a
    deterministic row hash; result equals ``fact.join(dim, key, how)``
    for ``how`` in {inner, left, left_semi, left_anti} (and aliases).

    Right/full outer are REJECTED: an unmatched dim row exists in all
    ``n_salts`` replicas, so the replicated join would surface it once
    per replica where the plain join yields it once — a silent
    duplication, not a skew optimization. (A dim-preserving skew join
    would need to collapse unmatched replicas afterwards, at which point
    the unskewed ``dim.join(broadcast-or-plain fact)`` is the better
    plan — dim sides are small by definition here.)"""
    if how not in _SALTED_JOIN_HOWS:
        raise ValueError(
            f"salted_join: how={how!r} is not replica-safe — unmatched dim "
            f"rows would appear n_salts={n_salts} times (once per replica). "
            "Use one of: inner, left, left_semi, left_anti."
        )
    dim_rep = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    fact_salted = fact.withColumn("_salt", _salt(salt_by, n_salts))
    return fact_salted.join(dim_rep, [key, "_salt"], how).drop("_salt")
