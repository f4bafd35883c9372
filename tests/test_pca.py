"""Distributed embedding moments / covariance / PCA (operators/pca.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from go_simple_embedding_database_spark.operators import pca

_D = 5


def _mat(seed=7, n=40):
    rng = np.random.RandomState(seed)
    return rng.uniform(-1.0, 1.0, size=(n, _D))


def _df(spark, x):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(x)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _quant(x):
    # float32 storage round-trip first — what the engines actually read
    return np.round(np.asarray(x, dtype=np.float32).astype(np.float64)
                    * pca.EMB_SCALE)


def test_moments_match_numpy_exactly(spark):
    x = _mat()
    xq = _quant(x).astype(np.int64)
    m = {(r.dim_i, r.dim_j): r.v
         for r in pca.embedding_moments(_df(spark, x), dim=_D).collect()}
    assert m[(-1, -1)] == x.shape[0]
    g = xq.T @ xq
    s = xq.sum(axis=0)
    for i in range(_D):
        assert m[(i, -1)] == s[i]
        for j in range(i, _D):
            assert m[(i, j)] == g[i, j]


def test_covariance_matches_numpy(spark):
    x = _mat(seed=11)
    xq = _quant(x)
    ref = np.cov(xq.T, ddof=1) / pca.EMB_SCALE ** 2
    got = {(r.dim_i, r.dim_j): r.cov
           for r in pca.covariance_long(_df(spark, x), dim=_D).collect()}
    assert len(got) == _D * (_D + 1) // 2
    for (i, j), v in got.items():
        assert abs(v - ref[i, j]) < 1e-6, (i, j, v, ref[i, j])


def test_malformed_rows_excluded_from_moments(spark):
    """NULL vector / wrong width / NULL element rows must not crash the
    GEMM and must not skew n — the 100 TB malformed-row contract."""
    x = _mat(seed=3, n=10)
    clean = pca.embedding_moments(_df(spark, x), dim=_D).collect()
    rows = ([(i, [float(v) for v in row]) for i, row in enumerate(x)]
            + [(100, None), (101, [1.0] * (_D + 1)),
               (102, [1.0, None, 1.0, 1.0, 1.0]), (103, [])])
    dirty_df = spark.createDataFrame(rows,
                                     "vec_id long, embedding array<float>")
    dirty = pca.embedding_moments(dirty_df, dim=_D).collect()
    key = lambda rs: sorted((r.dim_i, r.dim_j, r.v) for r in rs)
    assert key(clean) == key(dirty)


def test_moments_invariant_under_repartition(spark):
    x = _mat(seed=5)
    df = _df(spark, x)
    key = lambda df_: sorted((r.dim_i, r.dim_j, r.v) for r in
                             pca.embedding_moments(df_, dim=_D).collect())
    assert key(df) == key(df.repartition(9))


def test_pca_components_match_numpy_eigh(spark):
    x = _mat(seed=13, n=60)
    vals, vecs, n = pca.pca_components(_df(spark, x), dim=_D, k=3)
    assert n == 60 and vals.shape == (3,) and vecs.shape == (3, _D)
    xq = _quant(x)
    ref = np.cov(xq.T, ddof=1) / pca.EMB_SCALE ** 2
    rvals = np.sort(np.linalg.eigvalsh(ref))[::-1][:3]
    assert np.allclose(vals, rvals, rtol=1e-9)
    # components are orthonormal rows with non-negative leading coord
    assert np.allclose(vecs @ vecs.T, np.eye(3), atol=1e-9)
    for row in vecs:
        nz = np.flatnonzero(np.abs(row) > 1e-12)
        assert row[nz[0]] >= 0


def test_pca_project_is_the_literal_dot_product(spark):
    x = _mat(seed=17, n=20)
    df = _df(spark, x)
    _, vecs, _ = pca.pca_components(df, dim=_D, k=2)
    out = {r.vec_id: r.pca
           for r in pca.pca_project(df, vecs).select("vec_id", "pca")
           .collect()}
    xf32 = np.asarray(x, dtype=np.float32).astype(np.float64)
    ref = xf32 @ vecs.T
    for i in range(x.shape[0]):
        assert np.allclose(out[i], ref[i], atol=1e-9)


def test_pca_project_plan_has_no_shuffle_and_no_python(spark):
    from go_simple_embedding_database_spark.plans.explain_utils import (
        formatted_plan)
    x = _mat(n=8)
    df = _df(spark, x)
    _, vecs, _ = pca.pca_components(df, dim=_D, k=2)
    plan = formatted_plan(pca.pca_project(df, vecs))
    assert "Exchange" not in plan
    # no Python evaluation nodes on the data path ("Python" alone would
    # false-positive on createDataFrame's applySchemaToPythonRDD source)
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in plan


def test_covariance_runs_one_gemm_scan_not_four(spark):
    """covariance_long derives gram/sums/n from ONE moments relation;
    without materialization Catalyst planned FOUR independent GEMM
    scans of the corpus (caught in the static plan during round 8). The
    checkpointed moments must appear as scans of an ExistingRDD, with
    zero MapInPandas left in the final plan."""
    from go_simple_embedding_database_spark.plans.explain_utils import (
        formatted_plan)
    x = _mat(seed=29, n=30)
    plan = formatted_plan(pca.covariance_long(_df(spark, x), dim=_D))
    assert plan.count("MapInPandas") == 0, plan
    assert "Scan ExistingRDD" in plan


def test_empty_and_tiny_inputs(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert pca.covariance_long(empty, dim=_D).count() == 0
    vals, vecs, n = pca.pca_components(empty, dim=_D)
    assert n == 0 and vals.size == 0
    one = _df(spark, _mat(n=1))
    # n=1: covariance undefined (n-1 = 0) — pca refuses, moments fine
    _, _, n1 = pca.pca_components(one, dim=_D)
    assert n1 == 1


def test_covariance_plan_bounded_exchange(spark):
    """The moments shuffle must be O(partitions·d²), not O(N·d²): with
    N rows across P partitions the single real exchange moves at most
    P·(d(d+3)/2 + 1) partial rows — engine-measured, not asserted from
    the plan text."""
    from go_simple_embedding_database_spark.plans.exchange_metrics import (
        exchange_metrics)
    x = _mat(seed=23, n=400)
    df = _df(spark, x)
    p = df.rdd.getNumPartitions()
    m = exchange_metrics(pca.embedding_moments(df, dim=_D))
    bound = p * (_D * (_D + 3) // 2 + 1)
    assert m["max_exchange_records"] <= bound, (m, p)
    assert m["shuffle_records_total"] < 400, m  # never O(N·d²)


def test_signed_zero_covariance_is_bitwise_equal_across_engines(
        spark, tmp_path):
    """Round-8 official-gate regression (the gate's only-ever red row):
    a tiny NEGATIVE covariance that rounds to zero — DuckDB's round(,6)
    keeps IEEE −0.0 while Spark's F.round canonicalizes to +0.0;
    numerically equal, byte-hash different. Both twins now append
    `+ 0.0` after the round (−0.0 + 0.0 = +0.0, all other values
    unchanged), so EVERY exported value must be bitwise equal.

    Planted fixture: quantized vectors [1,0],[0,1],[0,0] give the (0,1)
    cell cov_num = n·ΣXY − ΣX·ΣY = 3·0 − 1 = −1 → cov = −1/6/1e8 ≈
    −1.7e−9, squarely on the knife edge."""
    import math
    import struct

    import duckdb

    rows = [(0, [1e-4, 0.0]), (1, [0.0, 1e-4]), (2, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "knife.parquet")
    df.write.parquet(path)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW emb AS SELECT * FROM '{path}/*.parquet'")

    # The fixture must actually exercise the knife edge: DuckDB's raw
    # round (no normalization) yields a NEGATIVE zero for the (0,1)
    # cell — otherwise this test would pass vacuously.
    raw = con.sql(
        "SELECT round(CAST(-1 AS DOUBLE) / 6.0 / 1e8, 6)").fetchone()[0]
    assert raw == 0.0 and math.copysign(1.0, raw) == -1.0

    got = {(r.dim_i, r.dim_j): r
           for r in pca.covariance_long(
               spark.read.parquet(path), dim=2).collect()}
    ora = {(r[0], r[1]): r
           for r in con.sql(pca.covariance_long_sql("emb", dim=2)).fetchall()}
    assert set(got) == set(ora) == {(0, 0), (0, 1), (1, 1)}
    assert got[(0, 1)].cov_num == ora[(0, 1)][3] == -1
    for key, srow in got.items():
        for sv, dv in zip((srow.n_vecs, srow.cov_num, srow.cov),
                          ora[key][2:]):
            assert struct.pack("<d", float(sv)) == struct.pack(
                "<d", float(dv)), (key, sv, dv)
    # and the knife-edge cell itself lands on POSITIVE zero on BOTH
    assert got[(0, 1)].cov == 0.0
    assert math.copysign(1.0, got[(0, 1)].cov) == 1.0
    assert math.copysign(1.0, ora[(0, 1)][4]) == 1.0


def test_pca_whiten_identity_covariance_and_numpy_parity(spark):
    """Whitened output must equal (X − μ) @ Wᵀ with W = Λ^{-1/2}·V (numpy
    parity, atol 1e-9), and its sample covariance must be ≈ identity —
    the whole point of whitening."""
    x = _mat(seed=41, n=200)
    vals, vecs, n = pca.pca_components(_df(spark, x), dim=_D)
    mu = _quant(x).mean(axis=0) / pca.EMB_SCALE
    out = pca.pca_whiten(_df(spark, x), vecs, vals, mean=mu)
    got = np.array([r.white for r in out.orderBy("vec_id").collect()])
    # the transform applies to the RAW float32-stored embeddings (the
    # 1e-4 quantization is the COVARIANCE machinery's contract, not the
    # projection's), so the numpy reference uses the storage round-trip
    x32 = np.asarray(x, dtype=np.float32).astype(np.float64)
    w = vecs / np.sqrt(vals)[:, None]
    want = (x32 - mu) @ w.T
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-9)
    # identity covariance up to the quantization error the eigenbasis
    # carries (W is exact for the QUANTIZED corpus; inputs are raw)
    cov = np.cov(got.T, ddof=1)
    assert np.allclose(cov, np.eye(got.shape[1]), atol=5e-4)


def test_pca_whiten_drops_dead_directions(spark):
    """A constant feature has eigenvalue ~0; whitening must DROP the
    dead direction (output width shrinks), never divide by √0."""
    rng = np.random.RandomState(5)
    x = rng.uniform(-1, 1, size=(60, _D))
    x[:, 2] = 0.25  # constant → one zero eigenvalue
    vals, vecs, n = pca.pca_components(_df(spark, x), dim=_D)
    assert (vals > 1e-9).sum() == _D - 1
    mu = _quant(x).mean(axis=0) / pca.EMB_SCALE
    out = pca.pca_whiten(_df(spark, x), vecs, vals, mean=mu)
    widths = {len(r.white) for r in out.collect()}
    assert widths == {_D - 1}
    got = np.array([r.white for r in out.orderBy("vec_id").collect()])
    assert np.all(np.isfinite(got))


def test_pca_whiten_raises_on_fully_degenerate_spectrum(spark):
    """ADVICE r09: when EVERY eigenvalue is <= eps (constant corpus),
    whitening must fail loudly, not emit zero-width array<null> columns
    into downstream distance arithmetic."""
    import pytest
    x = np.full((10, _D), 0.5)  # constant corpus → all-zero spectrum
    vals, vecs, n = pca.pca_components(_df(spark, x), dim=_D)
    with pytest.raises(ValueError, match="degenerate"):
        pca.pca_whiten(_df(spark, x), vecs, vals)


def test_pca_whiten_plan_has_no_shuffle_and_no_python(spark):
    """Like pca_project: the whitening matrix folds into literal codegen
    expressions — zero exchanges, zero Python nodes on the data path."""
    from go_simple_embedding_database_spark.plans.explain_utils import (
        formatted_plan)
    x = _mat(seed=13, n=30)
    vals, vecs, n = pca.pca_components(_df(spark, x), dim=_D)
    plan = formatted_plan(pca.pca_whiten(_df(spark, x), vecs, vals))
    for node in ("Exchange", "ArrowEvalPython", "BatchEvalPython",
                 "MapInPandas"):
        assert node not in plan, (node, plan)


def test_effective_rank_spectrum_properties():
    """erank(uniform spectrum) = d; erank(one-hot) = 1; zero/negative
    eigenvalues are ignored; matches the exp-entropy formula."""
    assert pca.effective_rank([2.0] * 7) == pytest.approx(7.0)
    assert pca.effective_rank([5.0, 0.0, 0.0]) == pytest.approx(1.0)
    assert pca.effective_rank([]) == 0.0
    assert pca.effective_rank([0.0, -1e-15]) == 0.0
    spec = np.array([4.0, 2.0, 1.0])
    p = spec / spec.sum()
    want = float(np.exp(-(p * np.log(p)).sum()))
    assert pca.effective_rank(spec) == pytest.approx(want)
    # whitened spectrum is uniform by construction → erank == kept dims
    assert pca.effective_rank([1.0] * 4) == pytest.approx(4.0)


def test_merge_moments_equals_full_recompute_exactly(spark):
    """The additivity payoff of exact integer sufficient statistics:
    per-slice moments merged == one-pass moments over the union,
    BIT-EXACTLY (bigint sums — no float drift), and the covariance
    derived from the running moments equals the scan-based covariance
    including the rounded double (same IEEE sequence on identical
    ints)."""
    import struct

    x = _mat(seed=17, n=90)
    full = _df(spark, x)
    slices = [_df(spark, x[:20]), _df(spark, x[20:55]), _df(spark, x[55:])]
    merged = pca.merge_moments(
        *[pca.embedding_moments(s, dim=_D) for s in slices])
    want = {(r.dim_i, r.dim_j): r.v
            for r in pca.embedding_moments(full, dim=_D).collect()}
    got = {(r.dim_i, r.dim_j): r.v for r in merged.collect()}
    assert got == want  # exact bigint equality, every cell
    cov_full = {(r.dim_i, r.dim_j): r
                for r in pca.covariance_long(full, dim=_D).collect()}
    cov_inc = {(r.dim_i, r.dim_j): r
               for r in pca.covariance_from_moments(merged).collect()}
    assert set(cov_inc) == set(cov_full)
    for k, a in cov_inc.items():
        b = cov_full[k]
        assert (a.n_vecs, a.cov_num) == (b.n_vecs, b.cov_num)
        assert struct.pack("<d", a.cov) == struct.pack("<d", b.cov), k


def test_merge_moments_incremental_ingest_loop(spark):
    """The 100 TB usage shape: a running moments total updated batch by
    batch (merge of exactly two relations per step), never rescanning
    history — the final running total equals the full recompute."""
    x = _mat(seed=23, n=60)
    running = pca.embedding_moments(_df(spark, x[:15]), dim=_D)
    for lo, hi in ((15, 30), (30, 42), (42, 60)):
        batch = pca.embedding_moments(_df(spark, x[lo:hi]), dim=_D)
        running = pca.merge_moments(running, batch)
    want = {(r.dim_i, r.dim_j): r.v
            for r in pca.embedding_moments(_df(spark, x), dim=_D).collect()}
    got = {(r.dim_i, r.dim_j): r.v for r in running.collect()}
    assert got == want
    assert got[(-1, -1)] == 60


def test_merge_moments_requires_input():
    with pytest.raises(ValueError):
        pca.merge_moments()
