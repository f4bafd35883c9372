"""Bounded-memory heavy hitters — distributed Misra-Gries + exact recount.

The naive frequent-tokens query (explode → groupBy token → filter) shuffles
the ENTIRE vocabulary: at 100 TB that is billions of distinct n-grams
moving through one aggregation for an answer that only wants the few
thousand heavy items. The mergeable-summaries result (Agarwal et al.,
"Mergeable Summaries", PODS'12) gives the scalable shape:

1. per-partition Misra-Gries sketch (capacity k counters, decrement on
   overflow) — one pass, O(k) memory, no shuffle;
2. merge the per-partition sketches by summing per-item counts (the
   summed lower bounds keep the MG guarantee: any item with global
   frequency > N/(k+1) SURVIVES in the merged candidate set — no false
   negatives above that threshold);
3. exact recount of the candidates only: broadcast the candidate set,
   map-side filter the token stream, aggregate — the shuffle carries
   candidate tokens only, never the vocabulary.

Because step 3 recounts exactly and the threshold is kept above the MG
guarantee line, the output is EXACTLY the set of items with count >=
threshold — deterministic, engine-independent, and therefore fully
DuckDB-oracle-checkable (the oracle is the naive full-vocabulary
groupBy/HAVING the sketch path avoids).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partial_sketches(tokens: DataFrame, token_col: str,
                         capacity: int) -> DataFrame:
    """Per-partition Misra-Gries: (token, partial count lower bound)."""

    def sketch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        # Vectorized MG: exact counts per Arrow batch (value_counts),
        # MERGED into the running summary with the classic merge step —
        # sum counts, then trim back to capacity by subtracting the
        # (capacity+1)-th largest count from everything and dropping
        # non-positives (Agarwal et al. §3: the merge preserves the
        # count-lower-bound and the > N/(k+1) survival guarantee). This
        # is ~100x the per-token-loop throughput: the scan cost is one
        # value_counts per batch plus an O(k log k) trim.
        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            # non-null only: value_counts drops nulls, and N must count
            # exactly what the counters can see
            n_rows += int(pdf[token_col].notna().sum())
            for tok, cnt in pdf[token_col].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(cnt)
            if len(counters) > capacity:
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {t: c - cut for t, c in counters.items()
                            if c > cut}
        # Sentinel row (NULL token) carries the partition's EXACT row
        # count — the global total then comes from the sketch pass
        # itself instead of a separate full scan of the token stream.
        yield pd.DataFrame({token_col: list(counters.keys()) + [None],
                            "partial": list(counters.values()) + [n_rows]})

    return tokens.mapInPandas(sketch, f"{token_col} string, partial long")


def frequent_items(tokens: DataFrame, token_col: str = "token",
                   capacity: int = 200,
                   threshold_frac: float = 0.001) -> DataFrame:
    """Exact counts of every token whose frequency is at least
    ``threshold`` = floor(N * threshold_frac) + 1 (N = total tokens),
    found without a full-vocabulary shuffle.

    Soundness requirement (checked): threshold_frac must be >= 1/(k+1) or
    items between the two lines could be missed by the sketch. The
    candidate relation is at most partitions × capacity rows — broadcast-
    sized by construction at any corpus scale.

    Returns (token_col, n_occurrences), exact.
    """
    if threshold_frac < 1.0 / (capacity + 1):
        raise ValueError(
            f"threshold_frac {threshold_frac} below the Misra-Gries "
            f"guarantee 1/(capacity+1) = {1.0 / (capacity + 1):.6f}: "
            f"items above the threshold could be missed; raise capacity")
    # NULL tokens are out of contract (the sentinel row uses NULL, and a
    # null "token" is never a heavy hitter) — dropped here AND in the SQL
    # twin so both paths count the same N.
    tokens = tokens.filter(F.col(token_col).isNotNull())
    # One scan builds the sketches AND the exact total (sentinel rows);
    # materialized so candidates and n_total don't re-run the token scan.
    # Lazy localCheckpoint, not persist: this is per-call scratch (not a
    # reusable index), and a pinned cache entry per call would accumulate
    # in repeated-caller sessions — checkpoint blocks free themselves with
    # the reference (same reasoning as dedup.probe_band_index).
    partials = _mg_partial_sketches(tokens, token_col, capacity) \
        .localCheckpoint(eager=False)
    candidates = (partials.filter(F.col(token_col).isNotNull())
                  .groupBy(token_col)
                  .agg(F.sum("partial").alias("_lb")).select(token_col))
    n_total = (partials.filter(F.col(token_col).isNull())
               .agg(F.sum("partial").alias("_n")))
    # Exact recount of candidates only: broadcast semi-join filters the
    # stream map-side; the aggregation shuffles candidate tokens only.
    recount = (tokens.join(F.broadcast(candidates), token_col, "left_semi")
               .groupBy(token_col)
               .agg(F.count("*").alias("n_occurrences")))
    return (recount.crossJoin(F.broadcast(n_total))
            .filter(F.col("n_occurrences")
                    >= F.floor(F.col("_n") * threshold_frac) + 1)
            .select(token_col, "n_occurrences"))


def frequent_items_sql(tokens_subquery: str, token_col: str = "token",
                       threshold_frac: float = 0.001) -> str:
    """DuckDB twin — the NAIVE full-vocabulary aggregation the sketch
    path is equivalent to (and exists to avoid). ``tokens_subquery``
    must produce one row per token occurrence with column ``token_col``."""
    return f"""
WITH toks AS (
  SELECT * FROM ({tokens_subquery}) _t0 WHERE {token_col} IS NOT NULL),
n AS (SELECT count(*) AS _n FROM toks)
SELECT {token_col}, count(*) AS n_occurrences
FROM toks CROSS JOIN n
GROUP BY {token_col}, _n
HAVING count(*) >= floor(_n * {threshold_frac}) + 1
"""
