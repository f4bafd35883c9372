"""Record.String parity — golden strings from the reference's own test
(/root/reference/records/records_test.go:59-85)."""

from pyspark.sql import functions as F

from go_simple_embedding_database_spark.functions.formatting import (
    record_str,
    record_str_column,
)

GOLDEN_SHORT = (
    "Embedding{Embedding: [1.00], EmbedderId: mock-short-embed, "
    "Blob: short, Id: test}"
)
LONG_BLOB = (
    "hey there, this is a long test string. it needs to be over 100 "
    "characters long for the ellipses to kick in"
)
GOLDEN_LONG = (
    "Embedding{Embedding: [1.00, 2.00, 3.00, 4.00, 5.00,  ...], "
    "EmbedderId: mock-long-embed, Blob: hey there, this is a long test "
    "string. it needs to be over 100 characters long for the ellipses to "
    "k..., Id: test}"
)


def test_record_str_golden_short():
    assert record_str("short", [1.0], "mock-short-embed", "test") == GOLDEN_SHORT


def test_record_str_golden_long():
    assert record_str(LONG_BLOB, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
                      "mock-long-embed", "test") == GOLDEN_LONG


def test_record_str_exactly_five_no_ellipsis():
    out = record_str("b", [1.0, 2.0, 3.0, 4.0, 5.0], "e", "i")
    assert "[1.00, 2.00, 3.00, 4.00, 5.00]" in out
    assert "..." not in out


def test_record_str_column_matches_python(spark):
    rows = [
        ("short", [1.0], "mock-short-embed", "test"),
        (LONG_BLOB, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0], "mock-long-embed", "test"),
        ("", [], "e", "i"),
        # exactly 100 chars: no ellipsis; -0.004 formats "-0.00" (sign kept).
        # NOT testing exact binary halves (0.125): Java HALF_UP differs from
        # Go/Python HALF_EVEN there, and real (hash-derived) data never hits
        # an exactly-representable half.
        ("x" * 100, [0.1251, -0.004], "e", "i"),
        ("x" * 101, [0.0] * 5, "e", "i"),
    ]
    df = spark.createDataFrame(
        rows, "blob string, embedding array<double>, embedder_id string, id string")
    got = [r.s for r in df.select(record_str_column(
        F.col("blob"), F.col("embedding"), F.col("embedder_id"), F.col("id")
    ).alias("s")).collect()]
    want = [record_str(*r) for r in rows]
    assert got == want
