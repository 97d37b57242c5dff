"""Similarity search over embedding columns (`array<float>`).

Charter extension (SURVEY.md §7.1 step 10):

- **brute-force cosine top-k** — the exactness baseline. The query set is
  broadcast; each partition of the corpus computes dot products locally
  (zip_with + aggregate, JVM-side, no shuffle of the corpus), and top-k per
  query is a TakeOrdered-style window. At 100 TB the corpus never moves.
- **hyperplane-LSH bucketed search** — the scale path: 8 deterministic
  md5-derived hyperplanes hash every vector to a 8-bit bucket; search only
  joins matching buckets (equi-join on a 1-byte key). Recall is tunable by
  planes/tables; the plumbing (bucket column, equi-join, per-bucket top-k)
  is what a real IVF/HNSW swap-in would reuse.

Hyperplane weights are *Python-computed* md5 values embedded as literals,
so Spark and the DuckDB oracle use byte-identical planes.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_PLANES = 8
DIM = 64


def _hash_unit(key: str) -> float:
    """Python twin of functions.scalars.hash_unit_interval (md5 hex6 → [0,1))."""
    return int(hashlib.md5(key.encode()).hexdigest()[:6], 16) / float(16**6)


def hyperplanes(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[float]]:
    """Deterministic hyperplane weights: w[p][d] = hash_unit(f"{p}|{d}") − 0.5."""
    return [
        [_hash_unit(f"{p}|{d}") - 0.5 for d in range(dim)] for p in range(n_planes)
    ]


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — same accumulation order as the
    oracle's index-ordered sum."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_bucket(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach the LSH bucket id (8-bit int from hyperplane signs)."""
    v = as_double(F.col(vec_col))
    planes = hyperplanes()
    bucket = F.lit(0)
    for p, w in enumerate(planes):
        proj = dot(v, F.array(*[F.lit(x) for x in w]))
        bucket = bucket + F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
    return df.withColumn("bucket", bucket)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus, per-query window."""
    q = queries.select(
        F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qe")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("de"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            (dot(F.col("qe"), F.col("de")) / (norm(F.col("qe")) * norm(F.col("de")))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "vec_id", "cosine", "rnk")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Bucketed ANN: only same-bucket candidates are scored (equi-join on
    the bucket id — the shuffle key is 1 byte, corpus vectors stay put
    under AQE broadcast of the tiny query side)."""
    qb = with_bucket(queries, vec_col).select(
        F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qe"), "bucket"
    )
    cb = with_bucket(corpus, vec_col).select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("de"), "bucket"
    )
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            "bucket",
            (dot(F.col("qe"), F.col("de")) / (norm(F.col("qe")) * norm(F.col("de")))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "vec_id", "bucket", "cosine", "rnk")
    )


def dot_pandas():
    """Arrow-vectorized dot product for HOT all-pairs paths.

    `F.aggregate` folds element-by-element in the Catalyst interpreter —
    fine for one projection per row, ~100× too slow for N²-pair scans.
    This pandas UDF stacks each Arrow batch into an (n, dim) ndarray and
    does one einsum per batch. Left-fold vs pairwise summation of 64
    doubles agree far beyond the 6-decimal hash convention."""
    import numpy as np
    import pandas as pd  # noqa: F401  (resolved by the hint eval below)
    from pyspark.sql.functions import pandas_udf

    def _dot(a, b):
        am = np.stack(a.to_numpy())
        bm = np.stack(b.to_numpy())
        return pd.Series(np.einsum("ij,ij->i", am, bm))

    # explicit (non-string) annotations: the module uses
    # `from __future__ import annotations`, which pandas_udf's hint
    # inspection cannot evaluate for locally-imported names
    _dot.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return pandas_udf(_dot, "double")


def blocked_cosine_pairs(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block: int = 256,
    threshold: float = 0.5,
    max_rows: int | None = 200_000,
) -> DataFrame:
    """All-pairs cosine ≥ threshold via BLOCKED Gram matrices.

    Vectors are tiled into ``block``-sized tiles; every tile pair
    (b1 ≤ b2) becomes one ``applyInPandas`` task that runs a single
    numpy matmul between its two tiles and emits only the above-threshold
    (v1 < v2) pairs. Communication is O(N·#tiles) vector transfers and
    compute is dense BLAS — versus shipping both vectors for every one of
    the N²/2 pairs (the naive join), a ~block× traffic reduction. This is
    the exactness baseline; hyperplane-LSH (`lsh_topk`) is the scale path.

    GUARD: this is the declared O(N²) CORRECTNESS baseline, never a
    production path — pointed at a corpus-scale table it would silently
    become a cross-join of Gram blocks. It therefore refuses inputs
    above ``max_rows`` (one count() action up front; set ``None`` only
    in tests that deliberately exercise the baseline at scale)."""
    if max_rows is not None:
        n_vecs = emb.count()
        if n_vecs > max_rows:
            raise ValueError(
                f"blocked_cosine_pairs is the O(N^2) correctness baseline "
                f"and refuses {n_vecs:,} vectors (max_rows={max_rows:,}). "
                "Use the scale paths instead: MinHash-LSH "
                "(minhash_lsh_neardups, L2), centroid semantic dedup "
                "(semantic_dedup_keeplist, L28), or bucketed ANN "
                "(embedding_lsh_ann / embedding_ivf_ann / "
                "embedding_pq_ann, L7)."
            )
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("v1", LongType()),
            StructField("v2", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )
    tagged = emb.select(
        F.col(id_col).alias("vid"),
        as_double(F.col(vec_col)).alias("v"),
        (F.col(id_col) / block).cast("long").alias("blk"),
    )
    blocks = tagged.select("blk").distinct()
    bp = (
        blocks.alias("x")
        .join(blocks.alias("y"), F.col("x.blk") <= F.col("y.blk"))
        .select(F.col("x.blk").alias("b1"), F.col("y.blk").alias("b2"))
    )
    left = bp.join(tagged, bp.b1 == tagged.blk).select(
        "b1", "b2", F.col("vid").alias("lid"), F.col("v").alias("lv")
    )
    right = bp.join(tagged, bp.b2 == tagged.blk).select(
        "b1", "b2", F.col("vid").alias("rid"), F.col("v").alias("rv")
    )
    both = left.unionByName(
        right.select(
            "b1", "b2", F.col("rid").alias("lid"), F.col("rv").alias("lv")
        ).withColumn("side", F.lit("r")),
        allowMissingColumns=True,
    ).withColumn("side", F.coalesce("side", F.lit("l")))

    def gram(pdf: pd.DataFrame) -> pd.DataFrame:
        lefts = pdf[pdf.side == "l"]
        rights = pdf[pdf.side == "r"]
        if lefts.empty or rights.empty:
            return pd.DataFrame(columns=["v1", "v2", "cosine"])
        li = lefts.lid.to_numpy()
        ri = rights.lid.to_numpy()
        lm = np.stack(lefts.lv.to_numpy())
        rm = np.stack(rights.lv.to_numpy())
        ln = np.linalg.norm(lm, axis=1)
        rn = np.linalg.norm(rm, axis=1)
        g = (lm @ rm.T) / np.outer(ln, rn)
        ii, jj = np.nonzero((g >= threshold) & (li[:, None] < ri[None, :]))
        return pd.DataFrame(
            {"v1": li[ii], "v2": ri[jj], "cosine": g[ii, jj]}
        )

    return both.groupBy("b1", "b2").applyInPandas(gram, out_schema)


def fit_coarse_quantizer(
    vectors: DataFrame, n_lists: int, seed: int, vec_col: str = "de"
):
    """Seeded MLlib KMeans coarse quantizer shared by the IVF index and
    SemDeDup: returns (model, centroid DataFrame with the staging schema
    ``ivf_list_id int, centroid_vec array<double>``). One definition so quantizer
    params / centroid schema cannot drift between consumers."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = vectors.withColumn("features", array_to_vector(vec_col))
    model = KMeans(k=n_lists, seed=seed, maxIter=20).fit(
        feats.select("features")
    )
    cents = [
        (i, [float(x) for x in v]) for i, v in enumerate(model.clusterCenters())
    ]
    cent_df = vectors.sparkSession.createDataFrame(
        cents, "ivf_list_id int, centroid_vec array<double>"
    )
    return model, feats, cent_df


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    on_centroids=None,
) -> DataFrame:
    """IVF (inverted-file) ANN — the charter's other scale path beside
    hyperplane LSH: a seeded MLlib KMeans coarse quantizer partitions the
    corpus into ``n_lists`` inverted lists; each query probes only its
    ``n_probe`` nearest centroids, so the scored candidate set is
    ~n_probe/n_lists of the corpus.

    100 TB shape: centroids are a driver-side array (n_lists × dim — KBs),
    probes broadcast with the queries; the corpus is scored in place via
    an equi-join on ivf_list_id and never shuffles. Training samples the
    corpus once; at real scale the quantizer trains on a sample and the
    model is a broadcast artifact, exactly like the reference's offline
    policy artifacts."""
    assigned, cent_df = ivf_build_index(corpus, n_lists, seed, vec_col, id_col)
    if on_centroids is not None:
        # staged-verification hook: lets a caller persist the fitted
        # quantizer so an external oracle can replay assignment + probing
        on_centroids(cent_df)
    return ivf_probe(assigned, cent_df, queries, k, n_probe, vec_col, id_col)


def ivf_build_index(
    corpus: DataFrame,
    n_lists: int = 16,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """The OFFLINE half of IVF: fit the coarse quantizer and assign every
    corpus vector to its inverted list. Returns (assigned, centroids) —
    both are persistable artifacts (the production shape: the index is
    built once and probed many times; `embedding_ivf_ann` stages both
    through the stage cache so repeat queries skip the KMeans fit and
    the assignment pass entirely)."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("de")
    )
    model, with_feats, cent_df = fit_coarse_quantizer(c, n_lists, seed)
    assigned = model.transform(with_feats).select(
        "vec_id", "de", F.col("prediction").cast("int").alias("ivf_list_id")
    )
    return assigned, cent_df


def ivf_query_probes(
    cent_df: DataFrame,
    queries: DataFrame,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe selection shared by `ivf_probe` and `ivfadc_topk`: each
    query's ``n_probe`` nearest centroids by cosine, (csim desc,
    ivf_list_id) tie-break. Returns (qid, qe, ivf_list_id)."""
    q = queries.select(
        F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qe")
    )
    qc = q.crossJoin(F.broadcast(cent_df)).select(
        "qid",
        "qe",
        "ivf_list_id",
        (dot(F.col("qe"), F.col("centroid_vec")) / (norm(F.col("qe")) * norm(F.col("centroid_vec"))))
        .alias("csim"),
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("csim"), F.asc("ivf_list_id"))
    return (
        qc.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= n_probe)
        .select("qid", "qe", "ivf_list_id")
    )


def ivf_probe(
    assigned: DataFrame,
    cent_df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The ONLINE half of IVF: select each query's ``n_probe`` nearest
    centroids by cosine, score only those lists' members, keep top-k."""
    probes = ivf_query_probes(cent_df, queries, n_probe, vec_col, id_col)
    scored = (
        assigned.join(F.broadcast(probes), "ivf_list_id")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            "ivf_list_id",
            (dot(F.col("qe"), F.col("de")) / (norm(F.col("qe")) * norm(F.col("de"))))
            .alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "vec_id", "ivf_list_id", "cosine", "rnk")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — codebook-compressed ANN
# ---------------------------------------------------------------------------

def _sq_dist(a: Column, b: Column) -> Column:
    """Squared Euclidean distance between two equal-length arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _lloyd_kmeans(
    x, k: int, seed: int, iters: int = 20
):
    """Deterministic numpy k-means (k-means++ init from a seeded rng,
    Lloyd iterations, empty clusters reseeded to the farthest point) —
    the PQ codebook trainer. PQ codebooks train on a bounded SAMPLE by
    recipe (Jégou et al. §V), so the fit is a driver-side array job: no
    per-fit Spark job overhead, bitwise-reproducible across runs."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n = len(x)
    # k-means++ seeding
    cents = [x[int(rng.integers(n))]]
    for _ in range(1, k):
        d2 = np.min(
            [((x - c) ** 2).sum(axis=1) for c in cents], axis=0
        )
        tot = float(d2.sum())
        if tot <= 0:
            cents.append(x[int(rng.integers(n))])
            continue
        cents.append(x[int(np.searchsorted(np.cumsum(d2 / tot), rng.random()))])
    C = np.array(cents)
    for _ in range(iters):
        d2 = ((x[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for j in range(k):
            m = a == j
            if m.any():
                C[j] = x[m].mean(axis=0)
            else:
                C[j] = x[int(d2.min(axis=1).argmax())]
    return C


def pq_build_index(
    corpus: DataFrame,
    n_blocks: int = 4,
    n_codes: int = 16,
    dim: int = 64,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_sample: int = 65536,
) -> tuple[DataFrame, DataFrame]:
    """The OFFLINE half of product quantization: per block, fit a seeded
    KMeans codebook over the block's subvectors, then encode every
    corpus vector as ``n_blocks`` one-byte codes (nearest codebook entry
    per block, Euclidean, (d2, code) tie-break).

    Returns (codes, codebooks): codes is the COMPRESSED index — one row
    per (vec_id, blk) with a small-int code, n_blocks·log2(n_codes) bits
    per vector instead of dim·64 — and codebooks is the
    n_blocks × n_codes × (dim/n_blocks) table (KBs, broadcastable
    forever). The classic memory-bound ANN scale path (Jégou et al.,
    IEEE TPAMI 2011): at 100 TB the float vectors stay in cold storage
    and search runs entirely on the codes."""
    import numpy as np

    sub_dim = dim // n_blocks
    c = corpus.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("de")
    ).localCheckpoint(eager=True)
    spark = corpus.sparkSession
    # deterministic bounded training sample (smallest ids — a distributed
    # top-k, never a full collect): PQ codebooks train on a sample by
    # recipe, so the driver-side Lloyd fit is O(sample · k) regardless of
    # corpus size
    sample = np.array(
        [
            r["de"]
            for r in c.orderBy("vec_id").limit(train_sample).collect()
        ]
    )
    rows = []
    for m in range(n_blocks):
        block = sample[:, m * sub_dim : (m + 1) * sub_dim]
        C = _lloyd_kmeans(block, n_codes, seed + m)
        rows.extend(
            (m, j, [float(v) for v in C[j]]) for j in range(n_codes)
        )
    codebooks = spark.createDataFrame(
        rows, "blk int, code int, centroid_vec array<double>"
    ).localCheckpoint(eager=True)
    blocks = spark.createDataFrame([(m,) for m in range(n_blocks)], "blk int")
    subs = c.crossJoin(F.broadcast(blocks)).select(
        "vec_id",
        "blk",
        F.slice(
            F.col("de"), F.col("blk") * sub_dim + 1, F.lit(sub_dim)
        ).alias("sub"),
    )
    codes = (
        subs.join(F.broadcast(codebooks), "blk")
        .select(
            "vec_id",
            "blk",
            "code",
            _sq_dist(F.col("sub"), F.col("centroid_vec")).alias("d2"),
        )
        .groupBy("vec_id", "blk")
        .agg(
            F.min_by("code", F.struct("d2", "code")).alias("code")
        )
    )
    return codes, codebooks


def pq_adc_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_blocks: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The ONLINE half: asymmetric distance computation. Each query
    builds its per-(block, code) partial-distance table against the
    broadcast codebooks (queries × n_blocks × n_codes rows — tiny), then
    one equi-join on (blk, code) + a (qid, vec_id) sum scores every
    compressed vector WITHOUT touching a single corpus float. Top-k by
    approximate squared distance, (d2, vec_id) tie-break."""
    sub_dim = dim // n_blocks
    q = queries.select(
        F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qe")
    )
    dtab = q.crossJoin(F.broadcast(codebooks)).select(
        "qid",
        "blk",
        "code",
        _sq_dist(
            F.slice(F.col("qe"), F.col("blk") * sub_dim + 1, F.lit(sub_dim)),
            F.col("centroid_vec"),
        ).alias("pd2"),
    )
    # per-block partial distances pivot into FIXED-ORDER addition: a
    # plain SUM over the 4 joined rows would merge partials in
    # partition order, and last-ulp float differences near ties make
    # ranks run-to-run nondeterministic
    blk_sums = [
        F.sum(F.when(F.col("blk") == m, F.col("pd2"))).alias(f"pd_{m}")
        for m in range(n_blocks)
    ]
    adc = F.col("pd_0")
    for m in range(1, n_blocks):
        adc = adc + F.col(f"pd_{m}")
    scored = (
        codes.join(F.broadcast(dtab), ["blk", "code"])
        .groupBy("qid", "vec_id")
        .agg(*blk_sums, F.count(F.lit(1)).alias("nb"))
        .filter((F.col("nb") == n_blocks) & (F.col("vec_id") != F.col("qid")))
        .select("qid", "vec_id", adc.alias("adc_d2"))
    )
    w = Window.partitionBy("qid").orderBy(F.asc("adc_d2"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "vec_id", "adc_d2", "rnk")
    )


def pq_rerank_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 128,
    n_blocks: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The full production PQ pipeline: ADC over the compressed index
    selects a ``shortlist`` per query (never touching corpus floats),
    then ONLY the shortlist members' raw vectors are read back for an
    exact Euclidean rerank → top-k. The float reads drop from |corpus|
    to queries × shortlist — the standard IVF-ADC+rerank recall fix
    (quantization distortion caps ADC-only recall on isotropic data)."""
    sl = pq_adc_topk(
        codes, codebooks, queries, shortlist, n_blocks, dim, vec_col, id_col
    ).select("qid", "vec_id", F.col("rnk").alias("adc_rank"))
    q = queries.select(
        F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qe")
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("de")
    )
    exact = (
        sl.join(c, "vec_id")
        .join(F.broadcast(q), "qid")
        .select(
            "qid",
            "vec_id",
            "adc_rank",
            _sq_dist(F.col("qe"), F.col("de")).alias("d2"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.asc("d2"), F.asc("vec_id"))
    return (
        exact.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "vec_id", "d2", "adc_rank", "rnk")
    )


def ivfadc_candidates(
    assigned: DataFrame,
    cent_df: DataFrame,
    queries: DataFrame,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The IVFADC candidate set: the IVF router's probed lists' members
    (vec_id != qid) per query — (qid, vec_id, ivf_list_id). Shared by
    `ivfadc_topk` and the scan-cost frontier so the two can never
    disagree about what was scanned."""
    probes = ivf_query_probes(cent_df, queries, n_probe, vec_col, id_col)
    return (
        assigned.join(
            F.broadcast(probes.select("qid", "ivf_list_id")), "ivf_list_id"
        )
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", "ivf_list_id")
    )


def ivfadc_topk(
    assigned: DataFrame,
    cent_df: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    shortlist: int = 64,
    n_blocks: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVFADC — the FAISS-style serving index (Jégou et al. 2011 §IV):
    the IVF coarse quantizer routes each query to its ``n_probe``
    nearest lists, ONLY those lists' PQ codes are ADC-scored against
    the query's broadcast distance tables, and only the ADC
    ``shortlist`` members' raw floats are read back for the exact-L2
    rerank → top-k. The composition of the two staged indexes this
    repo already serves separately: L7's router scored exact vectors
    for whole lists; L45's ADC scanned the whole corpus' codes — here
    float reads drop to queries × shortlist AND code reads drop to the
    probed fraction, which is the production memory/IO point.

    All arithmetic matches the parents so their oracles compose: probe
    selection = cosine with (csim desc, list) tie-break (`ivf_probe`),
    ADC = fixed-order per-block partial sums with (adc_d2, vec_id)
    tie-break (`pq_adc_topk`), rerank = exact squared Euclidean with
    (d2, vec_id) tie-break (`pq_rerank_topk`).

    100 TB shape: centroids + codebooks + per-query tables broadcast
    (KBs); the candidate join is codes ⋈ broadcast(candidates) — the
    compressed index never shuffles; raw floats are touched only for
    the shortlist."""
    sub_dim = dim // n_blocks
    cand = ivfadc_candidates(
        assigned, cent_df, queries, n_probe, vec_col, id_col
    )
    q = queries.select(
        F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qe")
    )
    dtab = q.crossJoin(F.broadcast(codebooks)).select(
        "qid",
        "blk",
        "code",
        _sq_dist(
            F.slice(F.col("qe"), F.col("blk") * sub_dim + 1, F.lit(sub_dim)),
            F.col("centroid_vec"),
        ).alias("pd2"),
    )
    blk_sums = [
        F.sum(F.when(F.col("blk") == m, F.col("pd2"))).alias(f"pd_{m}")
        for m in range(n_blocks)
    ]
    adc = F.col("pd_0")
    for m in range(1, n_blocks):
        adc = adc + F.col(f"pd_{m}")
    scored = (
        codes.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(dtab), ["qid", "blk", "code"])
        .groupBy("qid", "vec_id", "ivf_list_id")
        .agg(*blk_sums, F.count(F.lit(1)).alias("nb"))
        .filter(F.col("nb") == n_blocks)
        .select("qid", "vec_id", "ivf_list_id", adc.alias("adc_d2"))
    )
    ws = Window.partitionBy("qid").orderBy(F.asc("adc_d2"), F.asc("vec_id"))
    sl = (
        scored.withColumn("adc_rank", F.row_number().over(ws))
        .filter(F.col("adc_rank") <= shortlist)
        .select("qid", "vec_id", "ivf_list_id", "adc_rank")
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("de")
    )
    exact = (
        c.join(F.broadcast(sl), "vec_id")
        .join(F.broadcast(q), "qid")
        .select(
            "qid",
            "vec_id",
            "ivf_list_id",
            "adc_rank",
            _sq_dist(F.col("qe"), F.col("de")).alias("d2"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.asc("d2"), F.asc("vec_id"))
    return (
        exact.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "vec_id", "ivf_list_id", "d2", "adc_rank", "rnk")
    )
