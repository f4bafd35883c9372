"""SQL-first access to the engine — temp views + SQL scalar functions.

The reference exposes no query language (SURVEY §3: direct method calls
only). On Spark the DataFrame and SQL APIs compile to the same Catalyst
plans, so exposing the records table and the cosine kernel to SQL costs
nothing and makes every operator reachable from ``spark.sql(...)``:

    db.create_views(prefix="gsed")
    register_sql_functions(spark)
    spark.sql('''
        SELECT id, cosine_sim(embedding, (SELECT embedding FROM gsed_records
                                          WHERE id = '7')) AS score
        FROM gsed_records ORDER BY score DESC LIMIT 5
    ''')

``cosine_sim`` is a Spark 4 SQL scalar function (CREATE TEMPORARY
FUNCTION ... RETURN <expr>) — it inlines into the calling plan as native
expressions, identical to functions.kernels.cosine_similarity: zero Python,
zero UDF dispatch.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# The (dot, denom) pair is let-bound through a one-element transform:
# repeating the norm aggregates in the WHEN and ELSE branches would fold
# each O(d) aggregate twice per row (no CSE across conditional branches).
_COSINE_SQL = """
CREATE OR REPLACE TEMPORARY FUNCTION cosine_sim(x ARRAY<DOUBLE>, y ARRAY<DOUBLE>)
RETURNS DOUBLE
RETURN element_at(transform(
  array(named_struct(
    'dot', aggregate(zip_with(x, y, (a, b) -> a * b), 0.0D, (a, v) -> a + v),
    'den', sqrt(aggregate(x, 0.0D, (a, v) -> a + v * v))
         * sqrt(aggregate(y, 0.0D, (a, v) -> a + v * v)))),
  s -> CASE WHEN s.den = 0.0D THEN 0.0D ELSE s.dot / s.den END), 1)
"""

_DOT_SQL = """
CREATE OR REPLACE TEMPORARY FUNCTION dot_product(x ARRAY<DOUBLE>, y ARRAY<DOUBLE>)
RETURNS DOUBLE
RETURN aggregate(zip_with(x, y, (a, b) -> a * b), 0.0D, (a, v) -> a + v)
"""

# The max-abs is let-bound: referencing it inside the per-element lambda
# would rescan the whole array for every output element — O(d^2).
_QUANTIZE_SQL = """
CREATE OR REPLACE TEMPORARY FUNCTION quantize_int8(x ARRAY<DOUBLE>)
RETURNS ARRAY<DOUBLE>
RETURN element_at(transform(
  array(array_max(transform(x, v -> abs(v)))),
  m -> CASE WHEN m = 0.0D THEN x
            ELSE transform(x, v -> CAST(round(v * 127.0D / m) AS DOUBLE)) END), 1)
"""

_JACCARD_SQL = """
CREATE OR REPLACE TEMPORARY FUNCTION jaccard_sim(x ARRAY<STRING>, y ARRAY<STRING>)
RETURNS DOUBLE
RETURN CASE
  WHEN size(array_union(x, y)) = 0 THEN 0.0D
  ELSE CAST(size(array_intersect(x, y)) AS DOUBLE) / size(array_union(x, y))
END
"""


def register_sql_functions(spark: SparkSession) -> None:
    """Register the vector/set kernels as SQL scalar functions (native
    expression inlining — parity with functions.kernels and
    operators.ann.scalar_quantize / operators.dedup jaccard, including
    zero-norm → 0.0 and empty-union → 0.0)."""
    spark.sql(_COSINE_SQL)
    spark.sql(_DOT_SQL)
    spark.sql(_QUANTIZE_SQL)
    spark.sql(_JACCARD_SQL)


def create_views(db, prefix: str = "gsed") -> None:
    """Expose a SparkEmbeddingDatabase to SQL: ``{prefix}_records`` (all
    collections; filter collection_id — partition pruning on a partitioned
    table) and ``{prefix}_collections`` (the catalog)."""
    db.records_df().createOrReplaceTempView(f"{prefix}_records")
    db.collections_df().createOrReplaceTempView(f"{prefix}_collections")
