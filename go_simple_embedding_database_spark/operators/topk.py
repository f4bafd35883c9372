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


def _batch_scorer_mode() -> str:
    """batch_topk scoring-form dispatch (round 11, guide §8 "move heavy
    bytes once"): the ``pair`` form materializes the broadcast cross
    join, so every record VECTOR crosses the scoring stage M times (once
    per query) — at the production batch shape (M=100) that is 100× the
    bytes the decision needs. ``record`` scores via mapInPandas over the
    records alone with the collected query batch riding the closure:
    each record vector is read ONCE and scored against all M queries
    vectorized — bit-identical scores (the same strict left-fold op
    sequence; pinned by tests/test_topk.py), ~M× less scoring-stage
    input.

    Default is ``record`` — unlike the cosine/text/kmeans kernel
    dispatches, this one wins at BOTH measured shapes, so no crossover
    split is needed: the gate shape (M=3, 20k rows, alternating
    in-process A/B on the declared query) measured pair 0.82 s vs
    record 0.66 s median, and the production shape (100×, M=100,
    SCALE.json batch_scorer_ab) measured pair-HOF 91.0 s / pair-Arrow
    11.4 s / record 2.68 s. ``SPARK_GRAFT_BATCH_SCORER=pair`` restores
    the broadcast-cross-join form (comparison/fallback)."""
    import os
    return os.environ.get("SPARK_GRAFT_BATCH_SCORER", "record").lower()


def _record_form_scores(records, queries, records_vec: str,
                        queries_vec: str, query_id: str, records_id: str,
                        score_col: str, tie_cols: list[str]):
    """(query_id, records_id, score, *tie_cols) for EVERY (record, query)
    pair — the slim scored relation of batch_topk's record form. Each
    record row enters the Python worker once; scores against the M
    closure queries are computed with the EXACT per-pair op sequence of
    ``cosine_similarity`` (strict left fold per dim, vectorized across
    rows AND queries; den-before-dot on length mismatch; zero-norm → 0.0;
    NULL vector → NULL; NULL element → NaN per the kernel contract —
    Arrow renders it NaN before the fold, exactly like the pair twins)."""
    import numpy as np
    import pandas as pd

    from go_simple_embedding_database_spark.functions.kernels import (
        _fold_norm_block, _stack_f64)

    q_rows = queries.select(query_id, queries_vec).collect()
    qids = [r[0] for r in q_rows]
    qvecs = [None if r[1] is None else
             np.asarray([float(v) for v in r[1]], dtype=np.float64)
             for r in q_rows]
    qnorm = [None if q is None else _fold_norm_block(q.reshape(1, -1))[0]
             for q in qvecs]
    m = len(qids)
    in_cols = list(dict.fromkeys([records_id, records_vec] + tie_cols))
    keep_cols = [c for c in in_cols if c != records_vec]

    def score_batches(batches):
        for pdf in batches:
            n = len(pdf)
            xv = pdf[records_vec].to_numpy()
            vals = np.zeros((n, m), dtype=np.float64)
            mask = np.zeros((n, m), dtype=bool)
            groups: dict[int, list[int]] = {}
            null_rows: list[int] = []
            for i in range(n):
                if xv[i] is None:
                    null_rows.append(i)
                else:
                    groups.setdefault(len(xv[i]), []).append(i)
            if null_rows:
                mask[np.asarray(null_rows), :] = True
            for dx, idxs in groups.items():
                ii = np.asarray(idxs)
                X = _stack_f64([xv[i] for i in idxs])
                # record-side norms: one fold per record, bit-identical
                # to the per-pair fold (deterministic op sequence)
                nxs = _fold_norm_block(X)
                for j, q in enumerate(qvecs):
                    if q is None:
                        mask[ii, j] = True
                    elif len(q) != dx:
                        # den-before-dot mismatch rule (kernels module)
                        den = nxs * qnorm[j]
                        zero = den == 0.0
                        vals[ii[zero], j] = 0.0
                        mask[ii[~zero], j] = True
                    else:
                        dot = np.zeros(len(ii))
                        for d in range(dx):
                            dot = dot + X[:, d] * q[d]
                        den = nxs * qnorm[j]
                        with np.errstate(divide="ignore",
                                         invalid="ignore"):
                            vals[ii, j] = np.where(den == 0.0, 0.0,
                                                   dot / den)
            rep = np.repeat(np.arange(n), m)
            out = pdf[keep_cols].iloc[rep].reset_index(drop=True)
            out[query_id] = pd.Series(qids * n, dtype=object) \
                if not isinstance(qids[0] if qids else 0, (int, float)) \
                else np.tile(np.asarray(qids), n)
            # FloatingArray(values, mask): stored NaN stays NaN, only
            # masked entries are SQL NULL (the kernels-module rule)
            out[score_col] = pd.Series(
                pd.arrays.FloatingArray(vals.reshape(-1), mask.reshape(-1)))
            yield out[[query_id, *keep_cols, score_col]]

    qf = queries.schema[query_id]
    fields = [f"`{query_id}` {qf.dataType.simpleString()}"]
    for c in keep_cols:
        fields.append(
            f"`{c}` {records.schema[c].dataType.simpleString()}")
    fields.append(f"`{score_col}` double")
    return (records.select(*in_cols)
            .mapInPandas(score_batches, ", ".join(fields)))




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

    The query side rides with every task either way (queries are small
    by construction — the working set of a request batch): in the
    default ``record`` scoring form (round 11, see ``_batch_scorer_mode``)
    the collected query batch travels in the mapInPandas closure and
    each record VECTOR enters the scoring stage exactly once for all M
    queries; in the ``pair`` form (env fallback, and the shape used when
    ``records_id`` is absent or a tie column lives on the query side)
    the queries are broadcast and the cross join materializes M pair
    rows per record. The big records table is scanned once in both. The per-query selection is a TWO-stage window: stage 1
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
    order = [F.desc(score_col)] + [F.asc(c) for c in (tie_break or [])]
    nb = buckets or records.sparkSession.sparkContext.defaultParallelism

    if records_id is None:
        joined = records.crossJoin(F.broadcast(queries))
        # Arrow-vectorized bit-exact kernel — the scored pair stream is
        # the hot loop of every batch similarity scan (functions/kernels).
        scored = joined.withColumn(
            score_col,
            cosine_pairs_kernel(F.col(records_vec), F.col(queries_vec)))
        w1 = Window.partitionBy(query_id, "_b").orderBy(*order)
        w2 = Window.partitionBy(query_id).orderBy(*order)
        pre = (scored.withColumn("_b", F.spark_partition_id() % nb)
               .withColumn("_rn", F.row_number().over(w1))
               .filter(F.col("_rn") <= k).drop("_rn", "_b"))
        return (pre.withColumn("_rn", F.row_number().over(w2))
                .filter(F.col("_rn") <= k)
                .drop("_rn", queries_vec))

    tie_cols = [c for c in (tie_break or [])]
    if (_batch_scorer_mode() == "record"
            and all(c in records.columns for c in tie_cols)):
        # Record form (§8): each record vector enters the scoring stage
        # ONCE for all M queries instead of M times as pair rows.
        slim = _record_form_scores(records, queries, records_vec,
                                   queries_vec, query_id, records_id,
                                   score_col, tie_cols)
    else:
        joined = records.crossJoin(F.broadcast(queries))
        scored = joined.withColumn(
            score_col,
            cosine_pairs_kernel(F.col(records_vec), F.col(queries_vec)))
        slim_cols = list(dict.fromkeys(
            [query_id, records_id, score_col] + tie_cols))
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
