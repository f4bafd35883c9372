"""Distributed embedding second moments → covariance → PCA.

The 100 TB embedding-hygiene pass: before ANN indexing / SemDeDup /
whitening, a pipeline needs the corpus covariance spectrum (how many
effective dimensions do the embeddings use? is one feature dominating
distance?). The scalable shape is the classic two-step:

1. **Distributed sufficient statistics** (:func:`embedding_moments`) —
   ONE pass computes n, Σx (d-vector) and the Gram matrix ΣxxT (d×d)
   via per-Arrow-batch int64 GEMM inside ``mapInPandas``: each batch
   emits d(d+1)/2 + d + 1 tiny rows, so the shuffle that follows is
   O(partitions·d²) — independent of the number of embeddings. The
   naive Catalyst alternative (double posexplode + self-join on the
   row id) shuffles N·d² rows; at d=64 that is 4096× the data volume.
   Elements are quantized to exact integer units of 1e-4 IN CATALYST
   (``F.round`` — half-up in both engines; numpy's half-to-even never
   touches the data), so every partial and every merged moment is an
   EXACT integer: Spark's nondeterministic partition/agg order cannot
   move a float sum, and the DuckDB twin (a plain unnest self-join over
   the same quantized ints) agrees bit-for-bit.
2. **Driver-side eigendecomposition** (:func:`pca_components`) — the
   moments relation is d(d+3)/2 + 1 rows (2145 at d=64) regardless of
   corpus size; collecting it is the correct driver/cluster split
   (same as k-means centroids, operators/clustering.py).

Overflow ledger (bigint partials): |x_int| ≤ S·max|x| (S=1e4, unit-ish
embeddings ⇒ ~1e5); a 1e6-row partition's Gram entry ≤ 1e16; the final
covariance numerator n·ΣXY − ΣX·ΣY ≤ ~1e18 at n ≈ 3e7. Past that, flip
the aggregate to ``decimal(38,0)`` (both engines exact to 38 digits) —
the constant is a named knob, not a silent wrap; DuckDB raises on
bigint overflow, so the oracle is also the canary.

Rows whose embedding is NULL, has NULL elements, or has the wrong
width are EXCLUDED from the moments (and from n) — mirrored in the
oracle; a moments pass that crashes on one malformed row is useless at
100 TB, and one that silently zero-fills skews every covariance.

No counterpart in the reference (SURVEY.md §2 extensions): the 544-LoC
surface stores embeddings but has no statistics over them.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMB_SCALE = 10_000  # quantization: exact integer units of 1e-4

_MOMENTS_SCHEMA = "dim_i int, dim_j int, v long"


def quantized_embeddings(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """(…, _q: array<long>) keeping only well-formed vectors: non-NULL,
    exactly ``dim`` wide, no NULL elements. Quantization happens here,
    in Catalyst, with ``F.round`` (half-up — matches DuckDB's
    round-half-away on the non-negative .5 boundaries and on every
    non-boundary value), NOT in numpy (half-to-even)."""
    c = F.col(vec_col)
    ok = (c.isNotNull() & (F.size(c) == dim)
          & ~F.exists(c, lambda x: x.isNull()))
    q = F.transform(c, lambda x: F.round(x.cast("double") * EMB_SCALE, 0)
                    .cast("long"))
    return df.filter(ok).withColumn("_q", q)


def quantized_sql(vec_col: str, dim: int) -> tuple[str, str]:
    """(predicate, quantized-list expression) — DuckDB twin of
    :func:`quantized_embeddings`."""
    pred = (f"{vec_col} IS NOT NULL AND len({vec_col}) = {dim} "
            f"AND len(list_filter({vec_col}, x -> x IS NULL)) = 0")
    q = (f"list_transform({vec_col}, x -> CAST(round(CAST(x AS DOUBLE) "
         f"* {EMB_SCALE}, 0) AS BIGINT))")
    return pred, q


def embedding_moments(df: DataFrame, vec_col: str = "embedding",
                      dim: int = 64) -> DataFrame:
    """Long-format exact integer moments over quantized embeddings:
    (dim_i, dim_j, v) where (i, j, ΣXiXj) for i ≤ j is the Gram upper
    triangle, (i, −1, ΣXi) the feature sums and (−1, −1, n) the count.
    One scan; per-batch int64 GEMM; O(partitions·d²) shuffle rows."""
    quant = quantized_embeddings(df, vec_col, dim).select("_q")

    def gemm(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd
        n = 0
        s = np.zeros(dim, dtype=np.int64)
        g = np.zeros((dim, dim), dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array(pdf["_q"].tolist(), dtype=np.int64)
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        if n == 0:
            return
        iu, ju = np.triu_indices(dim)
        yield pd.DataFrame({
            "dim_i": np.concatenate([iu, np.arange(dim), [-1]]),
            "dim_j": np.concatenate([ju, np.full(dim, -1), [-1]]),
            "v": np.concatenate([g[iu, ju], s, [n]]),
        })

    partials = quant.mapInPandas(gemm, schema=_MOMENTS_SCHEMA)
    return (partials.groupBy("dim_i", "dim_j")
            .agg(F.sum("v").alias("v")))


def covariance_long(df: DataFrame, vec_col: str = "embedding",
                    dim: int = 64) -> DataFrame:
    """Sample covariance in ORIGINAL units, long upper-triangle format:
    (dim_i, dim_j, n_vecs, cov_num, cov) with cov_num the EXACT bigint
    numerator n·ΣXiXj − ΣXi·ΣXj (scaled units) and
    cov = round(cov_num / (n(n−1)) / EMB_SCALE², 6). Exact ints carry
    the cross-engine contract; the double division is a fixed sequence
    of IEEE ops on identical inputs. Delegates the derivation to
    :func:`covariance_from_moments` (one implementation serves the
    scan-based and the incremental/merged-moments paths)."""
    return covariance_from_moments(embedding_moments(df, vec_col, dim))


def covariance_long_sql(table: str, vec_col: str = "embedding",
                        dim: int = 64) -> str:
    """DuckDB twin of :func:`covariance_long` — same quantization, same
    exact integer numerator, same division/rounding sequence."""
    pred, q = quantized_sql(vec_col, dim)
    return f"""
WITH _q AS (
  SELECT row_number() OVER () AS _rid, {q} AS _e
  FROM {table} WHERE {pred}
), _x AS (
  SELECT _rid, CAST(generate_subscripts(_e, 1) - 1 AS INT) AS _d,
         unnest(_e) AS _v
  FROM _q
), _g AS (
  SELECT a._d AS dim_i, b._d AS dim_j,
         CAST(sum(a._v * b._v) AS BIGINT) AS _sxy
  FROM _x a JOIN _x b ON a._rid = b._rid AND a._d <= b._d
  GROUP BY 1, 2
), _s AS (
  SELECT _d, CAST(sum(_v) AS BIGINT) AS _sv FROM _x GROUP BY _d
), _n AS (
  SELECT CAST(count(*) AS BIGINT) AS _n FROM _q
)
SELECT g.dim_i, g.dim_j, t._n AS n_vecs,
       t._n * g._sxy - sa._sv * sb._sv AS cov_num,
       -- + 0.0 normalizes signed zero (DuckDB round keeps -0.0 on tiny
       -- negative covariances; Spark's F.round twin emits +0.0)
       round(CAST(t._n * g._sxy - sa._sv * sb._sv AS DOUBLE)
             / CAST(t._n * (t._n - 1) AS DOUBLE)
             / {float(EMB_SCALE) ** 2}, 6) + 0.0 AS cov
FROM _g g JOIN _s sa ON g.dim_i = sa._d JOIN _s sb ON g.dim_j = sb._d, _n t
"""


def pca_components(df: DataFrame, vec_col: str = "embedding",
                   dim: int = 64, k: int | None = None):
    """Driver-side eigendecomposition of the distributed covariance:
    returns (eigenvalues desc, components [k×d] numpy, n). The collect
    is d(d+3)/2 + 1 rows — corpus-size-independent, the same
    driver/cluster split as k-means centroids. Eigenvector SIGN is not
    deterministic across LAPACK builds, so components are normalized to
    a non-negative first significant coordinate."""
    import numpy as np
    rows = embedding_moments(df, vec_col, dim).collect()
    n = 0
    s = np.zeros(dim, dtype=np.float64)
    g = np.zeros((dim, dim), dtype=np.float64)
    for r in rows:
        if r.dim_i == -1:
            n = int(r.v)
        elif r.dim_j == -1:
            s[r.dim_i] = float(r.v)
        else:
            g[r.dim_i, r.dim_j] = g[r.dim_j, r.dim_i] = float(r.v)
    if n < 2:
        return np.zeros(0), np.zeros((0, dim)), n
    cov = (g - np.outer(s, s) / n) / (n - 1) / float(EMB_SCALE) ** 2
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order].T
    for i in range(vecs.shape[0]):
        nz = np.flatnonzero(np.abs(vecs[i]) > 1e-12)
        if nz.size and vecs[i, nz[0]] < 0:
            vecs[i] = -vecs[i]
    if k is not None:
        vals, vecs = vals[:k], vecs[:k]
    return vals, vecs, n


def pca_project(df: DataFrame, components, vec_col: str = "embedding",
                out_col: str = "pca") -> DataFrame:
    """Project each embedding onto the (k×d) components — pure Catalyst:
    the components are a LITERAL k×d matrix folded into a codegen'd
    dot-product expression (d multiplies per output coordinate), no
    Python on the data path, no shuffle at all."""
    comps = [[float(x) for x in row] for row in components]
    c = F.col(vec_col)
    outs = [
        F.aggregate(
            F.zip_with(c, F.array(*[F.lit(w) for w in row]),
                       lambda a, b: a.cast("double") * b),
            F.lit(0.0), lambda acc, x: acc + x)
        for row in comps
    ]
    return df.withColumn(out_col, F.array(*outs))


def pca_whiten(df: DataFrame, components, eigenvalues,
               vec_col: str = "embedding", out_col: str = "white",
               mean=None, eps: float = 1e-9) -> DataFrame:
    """PCA-whitening transform — the standard embedding-hygiene step
    before cosine-distance work (SemDeDup §3, retrieval literature):
    project onto the eigenbasis, divide each coordinate by √λᵢ so the
    transformed corpus has identity covariance and no dimension
    dominates distance. Like :func:`pca_project` this is pure Catalyst:
    mean vector and √λ-scaled components fold into ONE literal k×d
    matrix + k offsets at plan-build time (whitened coordinate i =
    Σⱼ Wᵢⱼ·xⱼ − Wᵢ·μ, both terms codegen'd), so the data path has zero
    Python, zero shuffles, and survives any corpus size trivially.

    ``components``/``eigenvalues`` come from :func:`pca_components`;
    pass ``mean`` (length-d, ORIGINAL units) to center — the default
    derives nothing and treats input as centered, because deriving μ
    here would hide a second corpus scan inside a "projection".
    Eigenvalues ≤ ``eps`` (numerically dead directions) are DROPPED
    rather than divided by ~0 and exploded into noise; the output width
    is the number of retained directions. A FULLY degenerate spectrum
    (no eigenvalue above ``eps`` — a constant corpus, or garbage
    eigenvalues) raises instead of silently emitting zero-width arrays
    into downstream distance arithmetic (ADVICE r09)."""
    import numpy as np
    vals = np.asarray(eigenvalues, dtype=np.float64)
    comps = np.asarray(components, dtype=np.float64)
    keep = vals > eps
    if not keep.any():
        raise ValueError(
            f"pca_whiten: no eigenvalue above eps={eps} — the spectrum "
            "is fully degenerate (constant corpus?); whitening would "
            "produce zero-width vectors")
    w = comps[keep] / np.sqrt(vals[keep])[:, None]   # (k', d)
    offs = (w @ np.asarray(mean, dtype=np.float64)
            if mean is not None else np.zeros(w.shape[0]))
    c = F.col(vec_col)
    outs = [
        F.aggregate(
            F.zip_with(c, F.array(*[F.lit(float(x)) for x in row]),
                       lambda a, b: a.cast("double") * b),
            F.lit(0.0), lambda acc, x: acc + x) - F.lit(float(off))
        for row, off in zip(w, offs)
    ]
    return df.withColumn(out_col, F.array(*outs))


def effective_rank(eigenvalues, eps: float = 1e-12) -> float:
    """Effective rank (Roy & Vetterli 2007): exp of the Shannon entropy
    of the normalized eigenvalue spectrum — 'how many dimensions do the
    embeddings actually use'. The corpus-health number the covariance
    pass exists to produce: erank ≈ d means the space is fully used;
    erank ≪ d means a few directions dominate every cosine and the
    corpus wants whitening before ANN/SemDeDup. Driver-side arithmetic
    over the d eigenvalues — corpus-size-independent by construction."""
    import numpy as np
    vals = np.asarray(eigenvalues, dtype=np.float64)
    vals = vals[vals > eps]
    if vals.size == 0:
        return 0.0
    p = vals / vals.sum()
    return float(np.exp(-(p * np.log(p)).sum()))


def moments_int64_row_bound(max_abs: float = 1.0) -> int:
    """Guaranteed-safe corpus row count for int64 moments accumulation
    (ADVICE r09: the 'bit-exact at 100 TB' claim needs its bound stated,
    not implied). A quantized coordinate is |x| ≤ EMB_SCALE·max_abs, so
    one row contributes ≤ (EMB_SCALE·max_abs)² to a Gram cell; int64
    holds 2⁶³−1, giving ≈ 9.2e10 rows for coordinates bounded by 1.0
    (unit-NORM d=64 embeddings have |e| ≤ 1, typically ~d^{-1/2}, so the
    practical ceiling is ~d× higher). The bound is per-CELL and
    independent of dim. Two distinct hazards share it:

    * the accumulated Gram cells themselves (``embedding_moments`` /
      :func:`merge_moments` / ``streaming_moments`` running totals) —
      bounded by n·(EMB_SCALE·max_abs)²;
    * the derived covariance NUMERATOR n·ΣXiXj − ΣXi·ΣXj in
      :func:`covariance_from_moments`, whose terms scale with n² —
      it overflows FIRST, around n ≈ sqrt(2⁶³/(EMB_SCALE·max_abs)²)
      ≈ 3e5·(typical cancellation slack; see the module Overflow
      ledger — centered data cancels most of it, and the DuckDB twin
      raises on bigint overflow, so the oracle is the live canary).

    Past the bound, flip the accumulators to ``decimal(38,0)`` (both
    engines exact to 38 digits) — a schema knob, not a redesign; the
    additivity proof is type-independent."""
    return int((2 ** 63 - 1) // int((EMB_SCALE * max_abs) ** 2))


def merge_moments(*moments: DataFrame) -> DataFrame:
    """Merge moments relations from disjoint corpus slices into the
    moments of their union — the payoff of carrying EXACT integer
    sufficient statistics: n, Σx and ΣxxT are all additive, so the
    merge is a union + groupBy-sum of tiny d(d+3)/2+1-row relations and
    is EXACTLY equal (bigint arithmetic, no float drift) to a full
    recompute over the combined corpus. At 100 TB this is the
    incremental path: compute :func:`embedding_moments` per ingest
    batch, merge, and re-derive covariance/PCA from the running moments
    without ever rescanning history. Inputs must cover DISJOINT rows
    (double-counting is the caller's contract, same as any additive
    sketch) and share one quantization scale. The bit-exactness claim
    holds up to :func:`moments_int64_row_bound` total rows (≈ 9.2e10
    for unit-bounded coordinates) — beyond that, non-ANSI Spark sum
    wraps silently; see the bound helper for the decimal(38,0)
    escape."""
    if not moments:
        raise ValueError("merge_moments needs at least one moments relation")
    out = moments[0]
    for m in moments[1:]:
        out = out.unionByName(m)
    return out.groupBy("dim_i", "dim_j").agg(F.sum("v").alias("v"))


def covariance_from_moments(moments: DataFrame) -> DataFrame:
    """Covariance in the :func:`covariance_long` output shape, derived
    from an EXISTING moments relation (e.g. a :func:`merge_moments`
    running total) instead of a corpus scan — the read side of the
    incremental path, and since round 9 the single implementation
    :func:`covariance_long` delegates to. Same exact-bigint numerator
    n·ΣXiXj − ΣXi·ΣXj; the derived double appends `+ 0.0` after the
    round — IEEE signed-zero normalization (−0.0 + 0.0 = +0.0, every
    other value unchanged): a tiny negative covariance rounds to zero
    with DuckDB's round keeping the sign where Spark's F.round emits
    +0.0 (the round-8 official gate's only failure, two cells at
    sf0.01); mirrored in covariance_long_sql. The moments relation
    feeds FOUR consumers (gram, si, sj, n) — without the lazy
    localCheckpoint Catalyst replays the (possibly corpus-scanning)
    derivation per consumer (the round-8 4×-GEMM-scan finding); the
    relation is d(d+3)/2 + 1 tiny rows, so pin it once and let the
    blocks self-release when the result is dropped."""
    m = moments.localCheckpoint(eager=False)
    gram = (m.filter((F.col("dim_i") >= 0) & (F.col("dim_j") >= 0))
            .select("dim_i", "dim_j", F.col("v").alias("_sxy")))
    sums = (m.filter((F.col("dim_i") >= 0) & (F.col("dim_j") == -1))
            .select(F.col("dim_i").alias("_d"), F.col("v").alias("_s")))
    n = (m.filter((F.col("dim_i") == -1) & (F.col("dim_j") == -1))
         .select(F.col("v").alias("_n")))
    si = sums.select(F.col("_d").alias("dim_i"), F.col("_s").alias("_si"))
    sj = sums.select(F.col("_d").alias("dim_j"), F.col("_s").alias("_sj"))
    num = F.col("_n") * F.col("_sxy") - F.col("_si") * F.col("_sj")
    denom = (F.col("_n") * (F.col("_n") - 1)).cast("double")
    cov = F.round(F.col("cov_num").cast("double") / denom
                  / float(EMB_SCALE) ** 2, 6) + F.lit(0.0)
    return (gram.join(F.broadcast(si), "dim_i")
            .join(F.broadcast(sj), "dim_j")
            .crossJoin(F.broadcast(n))
            .withColumn("cov_num", num)
            .select("dim_i", "dim_j", F.col("_n").alias("n_vecs"),
                    "cov_num", cov.alias("cov")))
