"""N-gram language-model training and perplexity scoring.

The classic pretraining-corpus quality filter (CCNet / Wenzek et al.
2020 use a KenLM 5-gram; Brown et al. 2020 filter by a classifier):
train a small LM on a trusted reference corpus (Wikipedia), score every
candidate document, keep the low-perplexity tail. This module is the
engine-native version at interpolated-bigram strength — not a KenLM
replacement for modeling quality, but the exact pipeline shape, with
the reference-vs-candidate corpus separation that matters
(``unigram_quality`` in operators/retrieval.py scores a corpus against
ITSELF; perplexity filtering scores it against a reference).

Model:  P(w_i | w_{i-1}) = λ · P_bi(w_i | w_{i-1}) + (1−λ) · P_uni(w_i)
with add-one (Laplace) smoothed unigrams over the reference vocabulary
plus one OOV bucket, and maximum-likelihood bigrams (the unigram
interpolation term already smooths unseen bigrams, Jelinek-Mercer
style). Document score: mean token log-prob; perplexity = exp(−mean).
The first token of a document has no context and is scored by the
unigram term alone.

Spark-first physical strategy:

- TRAIN: one tokenize pass; unigram counts are a hash aggregate of the
  token stream; bigram counts aggregate the per-document adjacent-pair
  stream built ARRAY-LEVEL (``transform`` over index ``sequence`` —
  pure Catalyst, no posexplode+window, so no (doc, pos) shuffle and no
  per-document sort anywhere in the plan).
- SCORE: explode candidate (prev, word) pairs, LEFT-join bigram and
  unigram count relations on their keys (broadcast when the model is
  small, shuffle hash join at vocabulary scale — caller's choice, same
  knob as unigram_quality), one per-document aggregate. Shuffles carry
  (doc_id, token keys, counts) — never document text.

The model is two count relations + three scalars, all exact integers:
persistable as parquet, mergeable across corpus shards by summing
counts (the mergeable-summaries property the sketch operators also
lean on).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_simple_embedding_database_spark.functions.text import lower_x, words

__all__ = ["BigramLM", "train_bigram_lm", "score_perplexity"]


class BigramLM(NamedTuple):
    """Trained model: unigram counts (token, n_uni), bigram counts
    (prev, token, n_bi), total token count, vocabulary size (distinct
    reference tokens, OOV bucket NOT included — the smoothing adds it)."""
    unigrams: DataFrame
    bigrams: DataFrame
    n_tokens: int
    vocab_size: int


def _doc_tokens(docs: DataFrame, text_col: str):
    return words(lower_x(F.col(text_col)))


def train_bigram_lm(docs: DataFrame, text_col: str = "text") -> BigramLM:
    """Count relations for the interpolated bigram LM. Two scans of the
    token arrays (unigram agg + bigram agg), two hash aggregates; the
    two driver-side scalars come from one tiny count job each."""
    toks = docs.select(_doc_tokens(docs, text_col).alias("_ws"))
    uni = (toks.select(F.explode("_ws").alias("token"))
           .groupBy("token").agg(F.count("*").alias("n_uni")))
    # Adjacent pairs, array-level: element i pairs with i+1. Documents
    # with < 2 tokens contribute no bigrams (sequence(0, -1|-2) would be
    # descending — filtered before the transform).
    pairs = (toks.filter(F.size("_ws") >= 2)
             .select(F.explode(F.transform(
                 F.sequence(F.lit(0), F.size("_ws") - 2),
                 lambda i: F.struct(
                     F.element_at("_ws", i + 1).alias("prev"),
                     F.element_at("_ws", i + 2).alias("token")),
             )).alias("_p"))
             .select("_p.prev", "_p.token"))
    bi = pairs.groupBy("prev", "token").agg(F.count("*").alias("n_bi"))
    totals = uni.agg(F.sum("n_uni").alias("n"),
                     F.count("*").alias("v")).collect()[0]
    return BigramLM(unigrams=uni, bigrams=bi,
                    n_tokens=int(totals["n"] or 0),
                    vocab_size=int(totals["v"] or 0))


def score_perplexity(docs: DataFrame, lm: BigramLM,
                     text_col: str = "text", id_col: str = "doc_id",
                     interpolation: float = 0.7,
                     broadcast_model: bool = True) -> DataFrame:
    """Per-document perplexity under ``lm``.

    Returns (id_col, n_tokens, avg_logprob, perplexity); documents with
    zero tokens get NULL scores (there is nothing to evaluate — a
    filterable sentinel, unlike a fake 0.0 that would sort as "best").

    ``broadcast_model``: broadcast the two count relations into the
    scoring joins (right for reference models — Wikipedia-scale vocab is
    tens of MB); ``False`` falls back to shuffle hash joins keyed on the
    token columns for models beyond executor memory.

    An untrained/empty model (``n_tokens == 0``) raises ValueError: every
    token would be OOV and the ranking pure noise — refusing is kinder
    than silently ordering a corpus by token count.
    """
    if not 0.0 < interpolation < 1.0:
        raise ValueError(f"interpolation must be in (0, 1), got {interpolation}")
    if lm.n_tokens == 0:
        raise ValueError("cannot score against an empty language model")
    lam = float(interpolation)
    hint = F.broadcast if broadcast_model else (lambda df: df)

    # (doc, pos, prev, token): pos 0 has a NULL prev (unigram-only term).
    ws = _doc_tokens(docs, text_col)
    toked = docs.select(F.col(id_col), ws.alias("_ws"))
    grams = (toked.filter(F.size("_ws") >= 1)
             .select(id_col, F.explode(F.transform(
                 F.sequence(F.lit(0), F.size("_ws") - 1),
                 lambda i: F.struct(
                     F.when(i > 0, F.element_at("_ws", i)).alias("prev"),
                     F.element_at("_ws", i + 1).alias("token")),
             )).alias("_g"))
             .select(id_col, "_g.prev", "_g.token"))

    uni = hint(lm.unigrams)
    bi = hint(lm.bigrams)
    ctx = hint(lm.unigrams.select(F.col("token").alias("prev"),
                                  F.col("n_uni").alias("n_ctx")))
    scored = (grams
              .join(uni, "token", "left")
              .join(ctx, "prev", "left")
              .join(bi, ["prev", "token"], "left"))
    # Add-one smoothed unigram over V+1 outcomes (the +1 is the OOV
    # bucket, so unseen tokens get mass without zeroing the product).
    p_uni = ((F.coalesce(F.col("n_uni"), F.lit(0)) + 1.0)
             / F.lit(float(lm.n_tokens + lm.vocab_size + 1)))
    # ML bigram where the context was seen; the unigram interpolation
    # term covers unseen (context, token) pairs.
    p_bi = (F.coalesce(F.col("n_bi"), F.lit(0)).cast("double")
            / F.col("n_ctx").cast("double"))
    p = F.when(F.col("prev").isNull() | F.col("n_ctx").isNull(), p_uni) \
         .otherwise(F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni)
    per_doc = (scored.withColumn("_lp", F.log(p))
               .groupBy(id_col)
               .agg(F.count("*").alias("n_tokens"),
                    F.avg("_lp").alias("avg_logprob")))
    return (docs.select(id_col).join(per_doc, id_col, "left")
            .select(id_col,
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                    F.round("avg_logprob", 6).alias("avg_logprob"),
                    F.round(F.exp(-F.col("avg_logprob")), 6)
                    .alias("perplexity")))
