"""Top-k similarity operators.

The reference's one real dataflow operator: brute-force cosine scan + full
sort + tie-aware k-selection (/root/reference/collection/collection.go:64-151).
Spark-first physical strategy:

- **single query** → ``orderBy(desc).limit(k)``: Catalyst plans
  ``TakeOrderedAndProject`` — a size-k heap per partition, then a k-way
  driver merge. O(N) work, O(partitions·k) merge, NO global sort and NO
  shuffle of all rows. This scales linearly with executors; the reference
  does an O(N log N) single-threaded sort (collection.go:98-103).
- **batch of queries** → broadcast the (small) query set, one scan of the
  big table computes every (query, record) score, ``row_number()`` window
  partitioned by query keeps k each. One pass over the data regardless of
  the number of queries — the scan cost is amortized across the batch.
- **all-pairs similarity join** → same shape with both sides potentially
  large; the LSH/IVF variants in ``operators.ann`` cut the candidate set
  at scale.

Tie semantics: ``limit``/``row_number`` keep an arbitrary subset of rows
tied at the k-th score — exactly k rows out, matching the reference's
Go-map-order tie fill (collection.go:105-135). Pass ``tie_break`` columns
for deterministic results (used by the DuckDB-oracle tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from go_simple_embedding_database_spark.functions.kernels import (
    cosine_pairs_kernel, cosine_scores_kernel)




def bucketed_topk(scored: DataFrame, group_col: str, order: list[Column],
                  k: int, bucket_key: str,
                  buckets: int | None = None) -> DataFrame:
    """Exact per-group top-k as a TWO-stage bucketed window — THE shared
    primitive under ``batch_topk``, ``similarity_join`` and the ANN batch
    probe. Stage 1 partitions by (group, bucket) so one group's candidate
    rows never funnel through a single task (a plain
    ``partitionBy(group)`` window is the canonical straggler/OOM at the
    100 TB design point — AQE cannot split a window partition); stage 2
    re-ranks the surviving ``buckets × k`` rows per group. Global top-k ⊆
    union of per-bucket top-k, and callers pass a TOTAL ``order``
    (score desc + unique tie-break asc), so the result is identical to
    the single-window formulation.

    ``bucket_key`` is a unique-ish column hashed (crc32) into the stage-1
    bucket — deterministic, so reruns bucket identically."""
    nb = buckets or scored.sparkSession.sparkContext.defaultParallelism
    w1 = Window.partitionBy(group_col, "_b").orderBy(*order)
    w2 = Window.partitionBy(group_col).orderBy(*order)
    return (
        scored.withColumn("_b", F.crc32(F.col(bucket_key).cast("string")) % nb)
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k).drop("_rn", "_b")
        .withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def topk_by_similarity(
    records: DataFrame,
    qvec: list[float],
    k: int,
    vec_col: str = "embedding",
    score_col: str = "score",
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Exactly-k nearest rows to ``qvec`` by cosine similarity.

    Small-collection short-circuit (collection.go:75-82) is free: ``limit``
    on fewer than k rows returns them all, no error, no similarity needed
    by the optimizer to satisfy the contract (scores still projected for
    the returned rows).
    """
    # Arrow-vectorized bit-exact kernel (see functions/kernels.py):
    # the HOF expression evaluates interpreted (~15 µs/row at dim=64);
    # the closure form ships ONLY the record vector across the boundary.
    scored = records.withColumn(
        score_col, cosine_scores_kernel(F.col(vec_col), qvec)
    )
    order = [F.desc(score_col)] + [F.asc(c) for c in (tie_break or [])]
    return scored.orderBy(*order).limit(k)


def batch_topk(
    records: DataFrame,
    queries: DataFrame,
    k: int,
    records_vec: str = "embedding",
    queries_vec: str = "query_embedding",
    query_id: str = "query_id",
    score_col: str = "score",
    tie_break: list[str] | None = None,
    records_id: str | None = None,
    buckets: int | None = None,
    attach_payload: bool = True,
) -> DataFrame:
    """Top-k per query for a whole DataFrame of queries in ONE scan.

    The query side is broadcast (queries are small by construction — they
    are the working set of a request batch); the big records table is
    scanned once. The per-query selection is a TWO-stage window: stage 1
    partitions by (query, bucket) so every query's candidates spread over
    ``buckets`` tasks (a single ``partitionBy(query_id)`` window would
    funnel ALL N scored rows of a query through one task — an OOM/straggler
    at the 100 TB design point; AQE cannot split a window partition);
    stage 2 re-ranks the surviving ``buckets × k`` rows per query — tiny.
    Global top-k ⊆ union of per-bucket top-k, so the result is identical.
    ``row_number`` (not ``rank``) reproduces exactly-k-with-arbitrary-ties.

    With ``records_id`` (a unique record key) the shuffle carries only
    (query_id, id, score, tie columns) — the record payload (embedding
    included) is re-attached afterwards by broadcasting the k×|queries|
    winners against the records table: the wide columns are never
    shuffled at all. Pass it at scale; the default path shuffles whole
    scored rows, acceptable when the payload is narrow.

    ``attach_payload=False`` (only meaningful with ``records_id``) skips
    that re-attach join and returns the slim winners
    (query_id, records_id, score, tie columns) directly — for callers
    that only consume ids/scores (recall evaluation), the payload join
    is a whole extra corpus scan Catalyst cannot prune away (an inner
    join is not removable even when its columns go unused).
    """
    joined = records.crossJoin(F.broadcast(queries))
    # Arrow-vectorized bit-exact kernel — the scored pair stream is the
    # hot loop of every batch similarity scan (functions/kernels.py).
    scored = joined.withColumn(
        score_col, cosine_pairs_kernel(F.col(records_vec), F.col(queries_vec))
    )
    order = [F.desc(score_col)] + [F.asc(c) for c in (tie_break or [])]
    nb = buckets or records.sparkSession.sparkContext.defaultParallelism
    w1 = Window.partitionBy(query_id, "_b").orderBy(*order)
    w2 = Window.partitionBy(query_id).orderBy(*order)

    if records_id is None:
        pre = (scored.withColumn("_b", F.spark_partition_id() % nb)
               .withColumn("_rn", F.row_number().over(w1))
               .filter(F.col("_rn") <= k).drop("_rn", "_b"))
        return (pre.withColumn("_rn", F.row_number().over(w2))
                .filter(F.col("_rn") <= k)
                .drop("_rn", queries_vec))

    slim_cols = list(dict.fromkeys(
        [query_id, records_id, score_col] + (tie_break or [])))
    slim = scored.select(*slim_cols)
    winners = bucketed_topk(slim, query_id, order, k, records_id, nb)
    if not attach_payload:
        return winners
    out = records.join(
        F.broadcast(winners.select(*dict.fromkeys([records_id, query_id, score_col]))),
        records_id)
    qattrs = queries.drop(queries_vec)
    if len(qattrs.columns) > 1:
        out = out.join(F.broadcast(qattrs), query_id)
    return out


def similarity_join(
    left: DataFrame,
    right: DataFrame,
    k: int | None = None,
    threshold: float | None = None,
    left_vec: str = "embedding",
    right_vec: str = "embedding",
    left_id: str = "id",
    right_id: str = "id",
    score_col: str = "score",
    broadcast_side: str = "left",
    buckets: int | None = None,
) -> DataFrame:
    """All-pairs cosine join: for each left row, its matches on the right.

    - ``threshold`` keeps pairs with score >= threshold (near-duplicate
      detection shape);
    - ``k`` keeps the top-k right rows per left row (k-NN join shape);
    - both → threshold first, then top-k.

    Exact O(|L|·|R|) — correct at any scale but quadratic; this is the
    correctness oracle. The scale path is ``operators.ann`` (LSH bucketing
    / IVF cells) which feeds candidate pairs into the same scoring.

    Broadcast orientation: the k-NN join shape is "few queries (left) ×
    huge corpus (right)", so the DEFAULT broadcasts the LEFT side — the
    corpus is scanned in place, never shuffled and never collected to the
    driver (a broadcast of the big side is the 100 TB OOM). Broadcasting
    the right side is opt-in (``broadcast_side="right"``) for the mirrored
    case of a small reference set; ``broadcast_side=None`` leaves the
    planner free (local tests of the pure semantics).

    The per-left top-k is the same TWO-stage bucketed window as
    ``batch_topk``: stage 1 partitions by (left_id, bucket) so one query's
    candidates never funnel through a single task, stage 2 re-ranks the
    surviving buckets × k rows. Global top-k ⊆ union of per-bucket top-k,
    and the (score desc, right_id asc) order is total, so the result is
    identical to the single-window formulation.
    """
    if broadcast_side not in ("left", "right", None):
        raise ValueError(
            f"broadcast_side must be 'left', 'right' or None, got {broadcast_side!r}")
    lv, rv = F.col("_l." + left_vec), F.col("_r." + right_vec)
    if broadcast_side == "left":
        pairs = right.alias("_r").crossJoin(F.broadcast(left.alias("_l")))
    elif broadcast_side == "right":
        pairs = left.alias("_l").crossJoin(F.broadcast(right.alias("_r")))
    else:
        pairs = left.alias("_l").crossJoin(right.alias("_r"))
    scored = pairs.select(
        F.col("_l." + left_id).alias("left_id"),
        F.col("_r." + right_id).alias("right_id"),
        cosine_pairs_kernel(lv, rv).alias(score_col),
    )
    if threshold is not None:
        scored = scored.filter(F.col(score_col) >= threshold)
    if k is not None:
        scored = bucketed_topk(
            scored, "left_id", [F.desc(score_col), F.asc("right_id")], k,
            "right_id", buckets)
    return scored
