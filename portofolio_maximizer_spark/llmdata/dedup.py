"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Charter extension (SURVEY.md §7.1 step 10). Design for 100 TB:

- **exact**: one groupBy on a content hash — the only full-data shuffle,
  and it shuffles 16-byte keys, not documents.
- **MinHash+LSH**: signatures are computed in ONE aggregation pass (16
  mins per group, map-side partials — no 16× row fan-out), candidate pairs
  come from equi-joins on banded signatures (shuffle on 4-byte band keys).
  The quadratic all-pairs comparison never happens; only LSH candidates
  get exact verification.
- **SimHash**: per-token hex-digit MSB votes, one aggregation; bucketing by
  the 16-bit signature is an equi-join.
- md5 is used for every hash so the DuckDB differential oracle can replay
  the exact same draws (Spark's xxhash64/murmur are not portable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import tokens

N_MINHASH = 16
BAND_SIZE = 4  # 4 bands of 4 → catches pairs from J ≳ 0.5

# Universal-hash family over a 32-bit md5 fingerprint: mh_s = (a_s·x + b_s) mod P.
# ONE md5 per shingle instead of 16 (md5 dominates minhash cost at scale);
# the affine mixes are integer ops. P = 2^31−1 keeps a·x < 2^62 (no overflow).
MERSENNE_P = 2_147_483_647


def _hash_params(n: int = N_MINHASH) -> list[tuple[int, int]]:
    import hashlib

    def h(key: str) -> int:
        return int(hashlib.md5(key.encode()).hexdigest()[:8], 16)

    return [
        ((h(f"a|{s}") % (MERSENNE_P - 1)) + 1, h(f"b|{s}") % MERSENNE_P)
        for s in range(n)
    ]


HASH_PARAMS = _hash_params()


def shingles(text: Column, n: int = 2) -> Column:
    """Distinct word n-gram set.

    Built by zipping n shifted slices of the token array rather than
    indexing with ``transform(sequence, element_at)`` — per-index
    element_at re-walks the array and falls out of whole-stage codegen
    (~8× slower on the documents corpus); slice+zip_with stays
    vectorized."""
    toks = tokens(text)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))  # number of n-grams
    gram = F.slice(toks, 1, m)
    for k in range(1, n):
        gram = F.zip_with(
            gram, F.slice(toks, k + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.array_distinct(gram)


def exact_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: group by content md5, keep groups of ≥2."""
    h = df.select("doc_id", F.md5(F.col(text_col)).alias("content_hash"))
    return (
        h.groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def minhash_signatures(df: DataFrame, text_col: str = "text", n_gram: int = 2) -> DataFrame:
    """MinHash signature per doc: one 32-bit md5 fingerprint per distinct
    shingle, then 16 universal-hash minima — a single groupBy pass, no row
    fan-out, one md5 per shingle (not 16).

    Input is repartitioned by doc_id first: the shingle explode + md5 is
    the CPU-heavy stage, and a corpus landing in few files (one, in the
    testdata) would otherwise run it on as many cores as files. The
    repartition also pre-shuffles on the groupBy key, so the signature
    aggregation that follows is shuffle-free."""
    spread = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )
    sh = spread.select(
        "doc_id", F.explode(shingles(F.col(text_col), n_gram)).alias("shingle")
    )
    x = (
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 8), 16, 10).cast("long")
        % MERSENNE_P
    )
    fp = sh.select("doc_id", x.alias("x"))
    aggs = [
        F.min((F.lit(a) * F.col("x") + F.lit(b)) % MERSENNE_P).alias(f"mh{s}")
        for s, (a, b) in enumerate(HASH_PARAMS)
    ]
    return fp.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(sig: DataFrame) -> DataFrame:
    """Band the signature (4 bands × 4 rows) and equi-join on band hashes.

    Returns distinct (d1, d2) candidate pairs with the estimated Jaccard
    (fraction of the 16 minhashes that agree).
    """
    n_bands = N_MINHASH // BAND_SIZE
    band_cols = [
        F.md5(
            F.concat_ws("|", *[F.col(f"mh{b * BAND_SIZE + r}") for r in range(BAND_SIZE)])
        ).alias(f"band{b}")
        for b in range(n_bands)
    ]
    banded = sig.select("doc_id", *band_cols, *[f"mh{s}" for s in range(N_MINHASH)])
    stack_expr = ", ".join(f"{b}, band{b}" for b in range(n_bands))
    long = banded.select(
        "doc_id", F.expr(f"stack({n_bands}, {stack_expr}) as (band_id, band_hash)")
    )
    a = long.alias("a")
    b = long.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    sa = sig.alias("sa")
    sb = sig.alias("sb")
    matches = sum(
        (F.col(f"sa.mh{s}") == F.col(f"sb.mh{s}")).cast("int") for s in range(N_MINHASH)
    )
    # candidate pairs ≪ corpus: broadcast them so signatures never shuffle
    return (
        F.broadcast(pairs)
        .join(sa, pairs.d1 == F.col("sa.doc_id"))
        .join(sb, pairs.d2 == F.col("sb.doc_id"))
        .select("d1", "d2", (matches / F.lit(float(N_MINHASH))).alias("est_jaccard"))
    )


def exact_jaccard(
    df: DataFrame, pairs: DataFrame, text_col: str = "text", n_gram: int = 2
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs only (LSH output),
    via an intersection join on shingles — never all-pairs.

    Only documents that appear in a candidate pair are shingled at all
    (left-semi pushdown): candidates ≪ corpus after banding, so the
    verify stage's explode touches a vanishing fraction of a 100 TB
    corpus instead of re-shingling everything."""
    cand_ids = (
        pairs.select(F.col("d1").alias("doc_id"))
        .unionByName(pairs.select(F.col("d2").alias("doc_id")))
        .distinct()
    )
    docs = df.join(F.broadcast(cand_ids), "doc_id", "left_semi")
    sh = docs.select(
        "doc_id", F.explode(shingles(F.col(text_col), n_gram)).alias("shingle")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))
    a = sh.alias("ja")
    b = sh.alias("jb")
    inter = (
        F.broadcast(pairs)
        .join(a, pairs.d1 == F.col("ja.doc_id"))
        .join(
            b,
            (pairs.d2 == F.col("jb.doc_id"))
            & (F.col("ja.shingle") == F.col("jb.shingle")),
        )
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        pairs.join(inter, ["d1", "d2"], "left")
        .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("set_size", "size1"), "d1")
        .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("set_size", "size2"), "d2")
    )
    n_inter = F.coalesce(F.col("n_inter"), F.lit(0))
    return out.select(
        "d1",
        "d2",
        "est_jaccard",
        (n_inter / (F.col("size1") + F.col("size2") - n_inter)).alias("jaccard"),
    )


def simhash16(text: Column) -> Column:
    """16-bit SimHash over the distinct token set.

    Bit i votes +1/−1 by the MSB of hex digit i of each token's md5; the
    per-document signature sums votes and takes signs. Pure column algebra
    (aggregate over the token array) — portable to the oracle because the
    hex digits of md5 agree everywhere.

    Each token is hashed ONCE (`transform` to its md5 hex) and the 16
    bit-votes ride ONE ``aggregate`` fold whose accumulator is a 16-element
    int array (``zip_with`` adds each digest's ±1 vote vector) — a single
    pass over the array and a 16× smaller expression tree than the earlier
    one-aggregate-per-bit form, which showed up as pure codegen/analysis
    cost at bench time. Values are bit-identical to the per-bit form (same
    digests, same votes, same signs).
    """
    hashes = F.transform(F.array_distinct(tokens(text)), lambda t: F.md5(t))

    def step(acc, h):
        votes = F.transform(
            F.sequence(F.lit(1), F.lit(16)),
            lambda i: F.when(
                F.substring(h, i, F.lit(1)).isin(*"89abcdef"), F.lit(1)
            ).otherwise(F.lit(-1)),
        )
        return F.zip_with(acc, votes, lambda a, v: a + v)

    votes = F.aggregate(hashes, F.array_repeat(F.lit(0), 16), step)
    weights = F.array(*[F.lit(2**i) for i in range(16)])
    sig = F.aggregate(
        F.zip_with(
            votes, weights, lambda v, w: F.when(v > 0, w).otherwise(F.lit(0))
        ),
        F.lit(0),
        lambda a, x: a + x,
    )
    return sig.alias("simhash")


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components over an undirected edge list ``(d1, d2)`` —
    the clustering stage that turns pairwise near-dup hits into dedup
    groups (keep one doc per component), mirroring the reference's
    duplicate-group resolution (`etl/data_validator.py` duplicate
    handling) at corpus scale.

    Iterative min-label propagation: every node starts labeled with its
    own id; each round a node adopts the minimum label among itself and
    its neighbors. Converges in O(component diameter) rounds — near-dup
    components are clique-ish (diameter 2-3 in practice), so a handful of
    joins. Each round is one shuffle on node id; ``localCheckpoint`` cuts
    lineage so the loop's plan does not snowball. For adversarial
    long-chain graphs the alternating large-star/small-star variant
    (O(log n) rounds) drops in without changing the interface.

    Returns ``(node, component)`` with ``component`` = min node id
    reachable — deterministic, so oracle-replayable via a recursive CTE.
    """
    sym = edges.select(
        F.col("d1").alias("src"), F.col("d2").alias("dst")
    ).unionByName(edges.select(F.col("d2").alias("src"), F.col("d1").alias("dst")))
    sym = sym.distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        # carry a per-row "changed" flag through the update instead of
        # re-joining new labels against old ones afterwards: the old
        # component is already on the row, so convergence detection is a
        # filter over the checkpointed frame (one join + one cheap scan
        # per round instead of two joins + a shuffled count — round-12
        # optimization; labels/values identical)
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
                (
                    F.coalesce("nbr_component", F.col("component"))
                    < F.col("component")
                ).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("changed").count()
        labels = new_labels.drop("changed")
        if changed == 0:
            break
    return labels.select("node", "component")
