"""portofolio_maximizer_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference single-node pandas/SQLite stack (`mrbestnaija/portofolio_maximizer`),
re-expressed Spark-first: declarative DataFrame/SQL plans optimized by
Catalyst, Arrow-backed pandas UDFs only where relational algebra genuinely
cannot express the semantics (model fitting, path-dependent simulation),
and Structured Streaming for the live-quote surface.

Layout
------
- ``session``    : SparkSession factory tuned for local testing and for scale.
- ``sources``    : table catalog + parquet IO (atomic writes, checkpoints).
- ``operators``  : relational operator layer (validation, joins, windows,
                   aggregations, set ops, top-k) — the correctness surface.
- ``functions``  : scalar/statistical helper expressions (returns, drawdown,
                   omega, moments-based skew/kurtosis, portable hashing).
- ``plans``      : named end-to-end queries with DuckDB oracle SQL.
- ``streaming``  : Structured Streaming ingestion, windows, alerts.
- ``llmdata``    : LLM-data-pipeline operators (dedup, similarity search,
                   text analysis, multimodal column plumbing).
- ``forecast``   : grouped-UDF model-fit harness (AR/EWMA/SSA on numpy).
"""

__version__ = "0.1.0"
