"""SQL surface: views + SQL scalar kernels match the DataFrame API."""

import pytest
from pyspark.sql import functions as F

from go_simple_embedding_database_spark import sql as gsql
from go_simple_embedding_database_spark.database import SparkEmbeddingDatabase
from go_simple_embedding_database_spark.functions.kernels import cosine_similarity


@pytest.fixture(scope="module")
def db(spark, documents):
    db = SparkEmbeddingDatabase(spark)
    db.add_collection("c", "mock-hash-64")
    docs = documents.filter(F.col("doc_id") < 50).selectExpr(
        "cast(doc_id as string) id", "text blob")
    db.add_records("c", db.make_records(docs, "mock-hash-64"))
    gsql.create_views(db)
    gsql.register_sql_functions(spark)
    return db


def test_sql_kernel_matches_dataframe_kernel(spark, db, embeddings):
    emb = embeddings.limit(50)
    emb.createOrReplaceTempView("emb_test")
    via_sql = spark.sql("""
        SELECT a.vec_id ia, b.vec_id ib,
               cosine_sim(CAST(a.embedding AS ARRAY<DOUBLE>),
                          CAST(b.embedding AS ARRAY<DOUBLE>)) AS s
        FROM emb_test a JOIN emb_test b ON a.vec_id < b.vec_id
    """).collect()
    a, b = emb.alias("a"), emb.alias("b")
    via_df = {(r.ia, r.ib): r.s for r in
              a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
                  F.col("a.vec_id").alias("ia"), F.col("b.vec_id").alias("ib"),
                  cosine_similarity(F.col("a.embedding"), F.col("b.embedding")).alias("s"),
              ).collect()}
    for r in via_sql:
        assert r.s == pytest.approx(via_df[(r.ia, r.ib)], rel=1e-12)


def test_sql_zero_norm_returns_zero(spark, db):
    row = spark.sql(
        "SELECT cosine_sim(ARRAY(0.0D, 0.0D), ARRAY(1.0D, 2.0D)) AS s").collect()[0]
    assert row.s == 0.0


def test_sql_topk_over_view(spark, db):
    """Full SQL top-k against the records view — stored blob ranks first."""
    # SQL UDFs are not allowed directly inside Sort (Spark 4 limitation):
    # project the score, then order by the column.
    top = spark.sql("""
        SELECT id FROM (
            SELECT id, cosine_sim(embedding,
                (SELECT embedding FROM gsed_records WHERE id = '7')) AS score
            FROM gsed_records)
        ORDER BY score DESC, id LIMIT 3
    """).collect()
    assert top[0].id == "7"


def test_sql_catalog_view(spark, db):
    rows = spark.sql("SELECT * FROM gsed_collections").collect()
    assert [(r.collection_id, r.embedder_id) for r in rows] == [("c", "mock-hash-64")]


def test_sql_quantize_matches_column_op(spark, db):
    from go_simple_embedding_database_spark.operators.ann import quantize_vector_py
    row = spark.sql(
        "SELECT quantize_int8(array(0.5D, -1.0D, 0.25D)) AS q, "
        "quantize_int8(array(0.0D, 0.0D)) AS z").collect()[0]
    assert row.q == quantize_vector_py([0.5, -1.0, 0.25]) == [64.0, -127.0, 32.0]
    assert row.z == [0.0, 0.0]


def test_sql_jaccard(spark, db):
    row = spark.sql(
        "SELECT jaccard_sim(array('a','b','c'), array('b','c','d')) AS j, "
        "jaccard_sim(array(), array()) AS e").collect()[0]
    assert row.j == 0.5
    assert row.e == 0.0


def test_variant_json_path_equivalent(spark, sf_dir):
    """Spark 4 VARIANT twin of the string-JSON extraction path: parse the
    events props ONCE into a variant column and extract with
    try_variant_get — same values as get_json_object, with the binary
    variant encoding replacing a re-parse per extraction (the at-scale
    win for multi-field extraction from the same payload)."""
    from pyspark.sql import functions as F

    from go_simple_embedding_database_spark.sources.tables import load_table
    # Deterministic subset: an unordered limit may materialize different
    # rows per action once the source has multiple splits.
    ev = load_table(spark, sf_dir, "events").orderBy("event_id").limit(200)
    a = ev.select("event_id",
                  F.get_json_object("props", "$.k").cast("long").alias("k"))
    b = (ev.select("event_id", F.parse_json("props").alias("v"))
         .select("event_id",
                 F.try_variant_get("v", "$.k", "long").alias("k")))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
