"""The malformed-EMBEDDING degenerate class (round-10 audit, the
embedding-surface analogue of the degenerate-document class closed this
round): NaN / ±Inf / NULL-element vectors through the kernel and
moments twins.

Found by the same audit protocol that closed the document class —
probe every twin pair on the degenerate inputs — and handled by the
same playbook: the divergences are PINNED here exactly as they behave
today, the gate corpora are asserted clean (so nothing can reach the
official gate), and the uniform fix is scheduled for round 11, when
every embedding-surface query (topk_cosine, cosine_kernel_pairs,
batch_topk, crud_query, ann_*, embedding_covariance,
embedding_centroids, dedup_cosine, semantic_dedup) rotates into the
gate window together — the whole family is r09-official class-A, so
the fix rides the rotation at zero window cost (the shingles-fix
arithmetic problem does not exist here).

Scheduled r11 convention (documented in SURVEY §8.9): extend the
well-formed-vector predicate (operators/pca.quantized_embeddings and
its SQL twin) to require FINITE elements, and decide one NaN ranking
convention for the cosine surface; until then:

- Spark cosine(NaN-vec, q) = NaN while DuckDB's
  ``list_cosine_similarity`` returns **-1.0** for NaN/Inf inputs — a
  VALUE divergence, and semantically the worst corner: Spark's
  ORDER BY DESC treats NaN as greater than every number, so a NaN
  embedding would WIN a Spark top-k while ranking LAST in the oracle.
- One NULL-element row poisons EVERY DuckDB query projecting
  ``list_cosine_similarity`` over the table — the function raises on
  NULL elements and DuckDB evaluates the projection for rows the
  filter would discard (the winnow-oracle decorrelation lesson, in
  error form).
- Quantization of a NaN/Inf coordinate CRASHES both engines (Spark 4
  ANSI ``CAST_OVERFLOW``, DuckDB ``Conversion Error``) — crash-parity
  today, but the pca module docstring's own standard ("a moments pass
  that crashes on one malformed row is useless at 100 TB") makes this
  the bug the r11 finite-filter exists to fix.
"""

import glob
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from go_simple_embedding_database_spark.functions.kernels import (
    cosine_similarity)
from go_simple_embedding_database_spark.operators import pca

_NAN = float("nan")
_INF = float("inf")


def test_gate_embeddings_contain_no_nonfinite_or_null_elements():
    """The guard that makes every pin below LATENT: all gate corpora
    hold only finite, fully-populated vectors (glob asserted non-empty
    — the blank-doc-guard lesson, ADVICE r09)."""
    con = duckdb.connect()
    sfs = sorted(glob.glob("/root/testdata/sf*"))
    assert sfs, "testdata dirs missing — the guard would be vacuous"
    for sf in sfs:
        n = con.sql(
            f"SELECT count(*) FROM '{sf}/embeddings.parquet' "
            "WHERE embedding IS NULL "
            "OR len(list_filter(embedding, x -> x IS NULL)) > 0 "
            "OR len(list_filter(embedding, "
            "x -> isnan(CAST(x AS DOUBLE)) OR NOT "
            "isfinite(CAST(x AS DOUBLE)))) > 0"
        ).fetchone()[0]
        assert n == 0, (sf, n)


def test_pinned_nan_cosine_value_divergence(spark):
    """Spark kernel → NaN; DuckDB list_cosine_similarity → -1.0.
    Pinned as-is until the r11 finite-filter convention lands."""
    df = spark.createDataFrame(
        [("nan", [_NAN, 1.0]), ("inf", [_INF, 1.0]),
         ("clean", [1.0, 2.0])], "k string, e array<double>")
    q = [1.0, 0.0]
    got = {r.k: r.c for r in df.select(
        "k", cosine_similarity(F.col("e"),
                               F.array(*[F.lit(x) for x in q])).alias("c")
    ).collect()}
    assert math.isnan(got["nan"]) and math.isnan(got["inf"])
    assert got["clean"] == pytest.approx(1.0 / math.sqrt(5))
    con = duckdb.connect()
    # NB: the python client binds float('nan') as NULL inside lists, so
    # the degenerate values must be SQL literals
    for lit in ("['nan'::DOUBLE, 1.0]", "['inf'::DOUBLE, 1.0]"):
        d = con.sql(
            f"SELECT list_cosine_similarity({lit}, [1.0, 0.0]::DOUBLE[])"
        ).fetchone()[0]
        assert d == -1.0, (lit, d)  # the pinned oracle-side value


def test_pinned_null_element_poisons_whole_duckdb_cosine_query():
    """One NULL-element row errors EVERY list_cosine_similarity query
    over the table, including rows a filter would discard — the
    decorrelation-eager-eval pattern, in error form."""
    con = duckdb.connect()
    con.execute("CREATE TABLE e(k VARCHAR, v DOUBLE[])")
    con.execute("INSERT INTO e VALUES ('good', [1.0, 2.0]), "
                "('bad', [NULL, 1.0])")
    with pytest.raises(duckdb.InvalidInputException,
                       match="can not contain NULL"):
        con.sql("SELECT list_cosine_similarity(v, [1.0, 0.0]::DOUBLE[]) "
                "FROM e WHERE k = 'good'").fetchone()


def test_pinned_nan_quantization_crashes_both_engines(spark):
    """quantized_embeddings admits NaN/Inf through its well-formed
    filter today and the ANSI cast then throws — in BOTH engines
    (crash-parity). The r11 fix extends the filter to finite elements;
    this pin flips to an exclusion assertion then."""
    df = spark.createDataFrame(
        [(1, [_NAN, 1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="CAST_OVERFLOW|cannot be cast"):
        pca.quantized_embeddings(df, "embedding", 2).collect()
    con = duckdb.connect()
    pred, q = pca.quantized_sql("embedding", 2)
    with pytest.raises(duckdb.ConversionException):
        con.sql(
            f"SELECT {q} FROM (SELECT ['nan'::DOUBLE, 1.0] AS embedding) "
            f"WHERE {pred}").fetchone()
