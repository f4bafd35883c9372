"""Text-analysis functions: semantics + DuckDB-twin exactness."""

import duckdb
import pytest
from pyspark.sql import functions as F

from go_simple_embedding_database_spark.functions import text as tx


def test_language_id_basics(spark):
    df = spark.createDataFrame([
        ("the cat and the dog is in it",),      # en
        ("der hund ist nicht das problem und",), # de
        ("el perro y la casa de que en un",),    # es
        ("le chat et les maisons dans une pour",),# fr
        ("xyzzy qwerty plugh",),                 # no stopwords anywhere
    ], "text string")
    out = [r.lang for r in df.select(tx.language_id(F.col("text")).alias("lang")).collect()]
    assert out == ["en", "de", "es", "fr", "und"]


def test_language_id_detects_unsegmented_chinese(spark):
    """Chinese has no word separators, so zh stopword hits are counted as
    character occurrences — token-boundary matching would never fire and
    every Chinese document would come back 'und'. The DuckDB twin must
    agree on the same counts."""
    zh = "我是中国人这是不对的我有和人说过"
    df = spark.createDataFrame([(zh,), ("the cat and the dog",)], "text string")
    out = [r.lang for r in df.select(tx.language_id(F.col("text")).alias("lang")).collect()]
    assert out == ["zh", "en"]
    got_duck = duckdb.sql(
        f"SELECT {tx.language_id_sql('t')} FROM (SELECT '{zh}' AS t)"
    ).fetchone()[0]
    assert got_duck == "zh"


def test_stopword_hits_regex_equals_token_equality(spark):
    """The regexp_count formulation must count exactly the whitespace-split
    tokens equal to a stopword: punctuation-attached words don't count,
    adjacent stopwords each count, multiplicity counts."""
    cases = [
        ("the the the", 3),          # adjacency: consumed \s can't starve
        ("the, cat the.", 0),        # 'the,' / 'the.' are not tokens 'the'
        ("  the\tand\nof  ", 3),     # any whitespace kind, leading/trailing
        ("other therefore bathe", 0),# substrings never match full tokens
        ("THE AND", 2),              # lower() applied first
        ("", 0),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "text string")
    out = [r.n for r in df.select(
        tx.stopword_hits(F.col("text"), "en").alias("n")).collect()]
    assert out == [n for _, n in cases]


def test_token_count(spark):
    df = spark.createDataFrame([("ab 12 c! d,e",)], "text string")
    # tokens: ab, 12, c, !, d, ',', e
    assert df.select(tx.token_count(F.col("text")).alias("n")).collect()[0].n == 7


def test_word_count_handles_multispace(spark):
    df = spark.createDataFrame([("a  b   c",), ("",)], "text string")
    out = [r.n for r in df.select(tx.word_count(F.col("text")).alias("n")).collect()]
    assert out == [3, 0]


def test_quality_score_orders_text(spark):
    good = "the quick brown fox jumps over the lazy dog and it is fine"
    bad = "000 111 222 333 !!! ??? ,,, 999 888 777"
    df = spark.createDataFrame([(good,), (bad,)], "text string")
    rows = df.select("text", tx.quality_score(F.col("text")).alias("q")).collect()
    scores = {r.text: r.q for r in rows}
    assert scores[good] > scores[bad]


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    out = [sorted(r.s) for r in df.select(tx.shingles(F.col("text"), 3).alias("s")).collect()]
    assert out[0] == ["a b c", "b c d"]
    assert out[1] == ["a b"]  # shorter than n → the full word sequence


def test_fingerprint_stable_and_discriminative(spark):
    df = spark.createDataFrame([("the quick brown fox jumps",),
                                ("the quick brown fox jumps",),
                                ("an entirely different sentence here",)], "text string")
    fps = [r.fp for r in df.select(tx.doc_fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_chunk_text(spark):
    df = spark.createDataFrame([("abcdefghij",), ("ab",), ("",)], "text string")
    out = [r.c for r in df.select(tx.chunk_text(F.col("text"), 4).alias("c")).collect()]
    assert out[0] == ["abcd", "efgh", "ij"]
    assert out[1] == ["ab"]
    assert out[2] == [""]          # empty text -> one empty chunk
    # round-trip: chunks reassemble the document
    joined = df.select(F.concat_ws("", tx.chunk_text(F.col("text"), 4)).alias("j"),
                       "text").collect()
    assert all(r.j == r.text for r in joined)


@pytest.mark.parametrize("fn,sql_fn", [
    (tx.language_id, tx.language_id_sql),
    (tx.token_count, tx.token_count_sql),
    (tx.word_count, tx.word_count_sql),
    (tx.doc_fingerprint, tx.doc_fingerprint_sql),
])
def test_duckdb_twins_match(spark, documents, sf_dir, fn, sql_fn):
    """Every *_sql builder must reproduce the Spark value on real data."""
    got_spark = {
        r.doc_id: r.v
        for r in documents.select("doc_id", fn(F.col("text")).alias("v")).collect()
    }
    con = duckdb.connect()
    got_duck = dict(con.sql(
        f"SELECT doc_id, {sql_fn('text')} AS v FROM '{sf_dir}/documents.parquet'"
    ).fetchall())
    assert got_spark == got_duck


def test_quality_sql_twin_matches(spark, documents, sf_dir):
    feats = tx.quality_sql("text")
    got_spark = {
        r.doc_id: round(r.q, 6)
        for r in documents.select(
            "doc_id", tx.quality_score(F.col("text")).alias("q")).collect()
    }
    con = duckdb.connect()
    got_duck = {
        k: round(v, 6) for k, v in con.sql(
            f"SELECT doc_id, {feats['quality_score']} AS q FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    }
    assert got_spark == got_duck
