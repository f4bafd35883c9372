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


# -- Bloom-filter semi-join pruning --------------------------------------------
#
# The 100 TB join-pruning pattern (Bloom, CACM'70; the runtime-filter idea
# in every warehouse engine): when a selective dimension predicate keeps
# the fact⋈dim output small but the fact side would still shuffle in full,
# build a constant-size Bloom bitset over the dim keys (one tiny
# aggregation), broadcast it, and filter the fact SCAN before the join's
# exchange. False positives ride through to the exact join (which removes
# them); false negatives are impossible, so the final result is EXACTLY
# the plain join's — the bloom is semantically transparent and the DuckDB
# oracle is the unpruned join itself. Everything below is pure Catalyst
# expression (xxhash64 / bit ops / higher-order functions): no UDF, no
# driver-side bitset, and the bitset aggregation is map-side combinable.

def _canonical_key(col, dtype):
    """Canonicalize a key column before hashing: xxhash64 is TYPE-sensitive
    (int 5 and bigint 5 hash differently), so a build/probe type mismatch
    an equi-join would happily coerce becomes a silent FALSE NEGATIVE —
    the one failure the Bloom contract forbids (ADVICE r07). Integral
    widths all widen to long (a no-op for long, exact for the rest);
    every other type passes through and :func:`bloom_prune` enforces
    build/probe equality instead."""
    from pyspark.sql import types as T
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType)):
        return col.cast("long")
    return col


def _hash_family(dtype) -> str:
    """The equivalence class :func:`bloom_prune` compares: every integral
    width hashes identically after canonicalization; all other types
    must match exactly (int-vs-double or string-vs-long pairs that SQL
    coercion would equate hash differently — refuse instead of silently
    dropping matches)."""
    from pyspark.sql import types as T
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType,
                          T.LongType)):
        return "long"
    return dtype.simpleString()


def bloom_build(keys: DataFrame, key_col: str, num_bits: int = 1 << 14,
                num_hashes: int = 5) -> DataFrame:
    """Aggregate ``keys`` into a 1-row Bloom bitset: ``bits`` is an
    array<long> of ``num_bits``/64 words. Positions are
    ``pmod(xxhash64(key, i), num_bits)`` for hash index i — deterministic,
    engine-native, and identical in :func:`bloom_might_contain`.

    Shape at scale: explode to k positions/key, map-side bit_or into
    <= num_bits/64 word rows, then one single-row assembly — the shuffle
    carries at most the word count (256 rows for the 16 Ki-bit default),
    never the key set. Size the filter like any Bloom: fp ≈
    (1 - e^(-k·n/m))^k; the 16 Ki-bit/5-hash default holds fp < 1% to
    n ≈ 1.5k keys — callers with bigger key sets pass a bigger
    ``num_bits`` (the cost is linear and the probe side is unchanged)."""
    if num_bits % 64:
        raise ValueError(f"num_bits must be a multiple of 64: {num_bits}")
    words = num_bits // 64
    key = _canonical_key(F.col(key_col), keys.schema[key_col].dataType)
    positions = F.explode(F.array(*[
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)])).alias("_pos")
    sparse = (keys.where(F.col(key_col).isNotNull()).select(positions)
              .select((F.col("_pos") / 64).cast("int").alias("_w"),
                      F.call_function(
                          "shiftleft", F.lit(1).cast("long"),
                          F.pmod(F.col("_pos"), F.lit(64)).cast("int"))
                      .alias("_b"))
              .groupBy("_w").agg(F.bit_or("_b").alias("_bits")))
    return (sparse
            .agg(F.map_from_entries(
                F.collect_list(F.struct("_w", "_bits"))).alias("_m"))
            .select(F.transform(
                F.sequence(F.lit(0), F.lit(words - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("_m"), i.cast("int")),
                    F.lit(0).cast("long"))).alias("bits")))


def bloom_might_contain(key, bits, num_bits: int = 1 << 14,
                        num_hashes: int = 5, key_type=None):
    """Membership probe against a :func:`bloom_build` bitset — a pure
    Catalyst boolean (k word lookups + bit tests, whole-stage-codegen
    friendly). Must be called with the same num_bits/num_hashes the
    bitset was built with, and — because xxhash64 is type-sensitive —
    with a key of the same hash family the bitset was built from: pass
    ``key_type`` (the probe column's DataType) to apply the same
    integral-widening canonicalization :func:`bloom_build` applies, or
    pre-cast the key yourself (:func:`bloom_prune` does this from the
    schemas and is the safe entry point). NULL keys probe to NULL (SQL
    semantics), which a filter treats as drop — matching the exact join
    NULL keys can never match anyway."""
    if key_type is not None:
        key = _canonical_key(key, key_type)
    cond = None
    for i in range(num_hashes):
        pos = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
        word = F.element_at(bits, (pos / 64).cast("int") + 1)
        hit = word.bitwiseAND(
            F.call_function("shiftleft", F.lit(1).cast("long"),
                            F.pmod(pos, F.lit(64)).cast("int"))) != 0
        cond = hit if cond is None else cond & hit
    return cond


def bloom_prune(fact: DataFrame, keys: DataFrame, fact_key: str,
                dim_key: str | None = None, num_bits: int = 1 << 14,
                num_hashes: int = 5) -> DataFrame:
    """Filter ``fact`` down to rows whose ``fact_key`` MIGHT be in
    ``keys`` (false positives possible, false negatives impossible).
    The bitset rides in as a broadcast 1-row build side — the only
    nested-loop join on the surface with a provably 1-row build — and
    the probe predicate sits directly on the fact scan, BEFORE any
    exchange the caller's subsequent exact join adds. Follow with the
    exact join for exact semantics.

    Type guard (ADVICE r07): build and probe keys are canonicalized to
    the same hash family (every integral width widens to long) before
    hashing; key types an equi-join would coerce but that hash
    differently after canonicalization (int vs double, string vs long)
    raise instead of silently dropping matching fact rows."""
    fact_type = fact.schema[fact_key].dataType
    dim_type = keys.schema[dim_key or fact_key].dataType
    if _hash_family(fact_type) != _hash_family(dim_type):
        raise ValueError(
            f"bloom_prune key types hash differently: fact {fact_key} is "
            f"{fact_type.simpleString()}, dim {dim_key or fact_key} is "
            f"{dim_type.simpleString()} — matching rows would be silently "
            f"dropped (false negatives). Cast both keys to one type first.")
    bloom = bloom_build(keys, dim_key or fact_key, num_bits, num_hashes)
    return (fact.crossJoin(F.broadcast(bloom))
            .filter(bloom_might_contain(F.col(fact_key), F.col("bits"),
                                        num_bits, num_hashes,
                                        key_type=fact_type))
            .drop("bits"))
