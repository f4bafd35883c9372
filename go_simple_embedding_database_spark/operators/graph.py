"""Iterative graph analytics: PageRank in exact fixed-point arithmetic.

Reference scope: the reference has no graph operators; this extends the
engine the same way connected components (operators/dedup.py) does —
dedup clustering walks the similarity graph, PageRank ranks entities in
a relationship graph (supplier importance from order flows, document
authority from a citation/link table, user influence from interactions).

Spark-first physical strategy (the Pregel shape):

- edges are computed once and MATERIALIZED (self-releasing lazy
  localCheckpoint); every superstep is join(ranks, edges, on=src) ->
  groupBy(dst).sum — shuffles carry (node, rank) longs only;
- out-degrees are folded into the edge relation up front so the loop
  joins one relation, not two;
- the rank relation stays (node bigint, rank bigint): two longs per
  node, so broadcast-joined into the supersteps while the node set is
  broadcast-sized (the edge relation is then never shuffled or sorted),
  falling back to hash-partitioning on the node key at 100 TB node
  counts — see ``pagerank``'s ``broadcast_ranks``.

Exact cross-engine determinism — the same discipline as
operators/clustering.py, but here even the ITERATION stays in integers:
ranks are fixed-point bigints (``init`` micro-units), a node's
contribution is ``rank div outdeg`` (integer floor division — positive
operands, so Spark's ``div`` and DuckDB's ``//`` agree), and the update
is ``(damping_num * sum) div damping_den + base``. Integer sums are
order-independent, so the result is bit-identical on any engine and any
partitioning — no rounding conventions needed at all. (Floating-point
PageRank would make cross-engine hashes diverge: aggregation order is
nondeterministic and float addition is not associative.)

Sink nodes (no out-edges) simply leak their mass — the standard
simplification; ranks remain a deterministic relative ordering, which is
what the operator is for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "pagerank_cte_sql"]


# Node-count ceiling for broadcasting the rank relation into the
# supersteps: 5M nodes x 16 bytes = 80 MB of broadcast state, the upper
# end of what a per-superstep broadcast should pin on every executor.
_BROADCAST_NODES_MAX = 5_000_000


def pagerank(edges: DataFrame, n_iter: int = 5,
             src: str = "src", dst: str = "dst",
             init: int = 1_000_000,
             damping_num: int = 85, damping_den: int = 100,
             broadcast_ranks: bool | None = None) -> DataFrame:
    """Fixed-point PageRank over a directed edge list; returns
    (node, rank) with rank in integer ``init`` micro-units.

    rank_0(v)   = init
    rank_i+1(v) = (damping_num * sum_{u->v} (rank_i(u) div outdeg(u)))
                  div damping_den  +  base
    with base = (damping_den - damping_num) * init div damping_den.

    ``n_iter`` is a small constant; the plan is n_iter chained
    join+aggregate rounds.

    Join strategy is SIZE-ADAPTIVE, the same hybrid discipline as
    ``dedup.connected_components``: the rank relation is 2 longs per
    node, so when the node set is broadcast-sized (``broadcast_ranks``,
    default: node count <= 5M, decided by one count job) every superstep
    joins the big edge relation WITHOUT shuffling or sorting it — the
    only per-round shuffle is the (node, contribution) aggregate. The
    broadcast path does route the rank relation through the driver each
    round (that is what a Spark broadcast is — <= ~80 MB at the
    ceiling); above the ceiling it falls back to the shuffle-both-sides
    plan whose state is hash-partitioned on the node key and never
    touches the driver — the 100 TB shape (billions of nodes cannot
    broadcast). Measured at sf0.1 (1.17M edges, 16k nodes): 5
    supersteps drop from ~4.0 s of chained sort-merge joins to ~1.3 s.

    Fault-tolerance note (applies to every lazy-localCheckpoint
    materialization in this repo): checkpoint blocks are executor-local
    and unreplicated, so on a real cluster an executor loss mid-job
    fails the query instead of recomputing from lineage the way
    persist() would. The trade is deliberate — self-releasing storage
    and truncated plans for the common case; rerun-on-loss (these are
    batch jobs) or a durable materialized table (sources/materialize.py)
    where loss is expensive.
    """
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    base = (damping_den - damping_num) * init // damping_den
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    deg = e.groupBy("_src").agg(F.count("*").alias("_deg"))
    # One relation for the loop: (src, dst, src outdegree), materialized —
    # every superstep re-reads it; without the materialization each round
    # re-runs the edge build AND the degree aggregation. Lazy
    # localCheckpoint, not persist(): blocks are released by the
    # ContextCleaner when the returned ranks DataFrame (whose lineage
    # holds the only references) is garbage-collected, so running many
    # graphs in one session accumulates no pinned storage.
    ed = e.join(deg, "_src").localCheckpoint(eager=False)
    # nodes is referenced by EVERY superstep's zero-seed union (and
    # transitively by each previous round's rank relation), so
    # unmaterialized it would be re-distinct-ed O(n_iter) times. Same
    # self-releasing contract.
    # Derived from ED, not from the raw projection: the inner join with
    # deg on _src preserves every edge row (every src has a degree), so
    # the node sets are identical — but ed reads the checkpoint, while
    # the raw projection would re-run the caller's whole edge-build
    # subtree (often a fact-fact join) a second time.
    nodes = (ed.select(F.col("_src").alias("node"))
             .union(ed.select(F.col("_dst").alias("node")))
             .distinct().localCheckpoint(eager=False))
    if broadcast_ranks is None:
        # one count job (it also materializes the nodes checkpoint the
        # loop reads anyway) decides the join strategy at runtime
        broadcast_ranks = nodes.count() <= _BROADCAST_NODES_MAX
    hint = F.broadcast if broadcast_ranks else (lambda df: df)
    ranks = nodes.withColumn("rank", F.lit(init).cast("long"))
    # Zero-contribution seed: one (node, 0) row per node, unioned into
    # each round's aggregate input. This replaces the previous
    # ``nodes LEFT JOIN contribs`` + ``coalesce(_s, 0)`` with a plain
    # union feeding the SAME hash aggregate — bigint sum over the union
    # is exactly coalesce(sum, 0) per node, so results stay bit-identical
    # (pinned by tests), while each superstep drops one join and (on the
    # broadcast path) one per-round driver-roundtrip broadcast exchange:
    # plan per round goes [BHJ + Exchange + BroadcastExchange + BHJ] ->
    # [BHJ + Union + Exchange]. Guide §2.4 (remove shuffles/joins
    # outright); measured ~4.0 -> ~3.3 s warm for the 5-superstep loop at
    # sf0.1, and on the 100 TB no-broadcast path the removed join was a
    # second full shuffle of the node relation per round.
    zero = nodes.select("node", F.lit(0).cast("long").alias("_c"))
    for _ in range(n_iter):
        contribs = (ed.join(hint(ranks.withColumnRenamed("node", "_src")),
                            "_src")
                    .select(F.col("_dst").alias("node"),
                            F.expr("rank div _deg").alias("_c")))
        ranks = (contribs.unionByName(zero)
                 .groupBy("node").agg(F.sum("_c").alias("_s"))
                 .select("node",
                         (F.expr(f"({damping_num} * _s) "
                                 f"div {damping_den}")
                          + F.lit(base)).cast("long").alias("rank")))
    return ranks


def pagerank_cte_sql(edges_cte: str, n_iter: int = 5,
                     init: int = 1_000_000,
                     damping_num: int = 85, damping_den: int = 100) -> str:
    """DuckDB CTE prefix computing the identical fixed-point PageRank.

    ``edges_cte`` must be the NAME of an in-scope CTE/view with columns
    (src, dst). Emits CTEs ``_deg``, ``_nodes``, ``_r0`` .. ``_r{n_iter}``;
    the final ranks are ``SELECT node, rank FROM _r{n_iter}``. Unrolled
    (n_iter is a small constant) — the oracle path for sf<=0.1; the Spark
    loop is the scale path."""
    base = (damping_den - damping_num) * init // damping_den
    parts = [f"""_deg AS (
  SELECT src AS _src, count(*) AS _deg FROM {edges_cte} GROUP BY src)""",
             f"""_nodes AS (
  SELECT src AS node FROM {edges_cte}
  UNION
  SELECT dst FROM {edges_cte})""",
             f"""_r0 AS (
  SELECT node, CAST({init} AS BIGINT) AS rank FROM _nodes)"""]
    for i in range(n_iter):
        parts.append(f"""_r{i + 1} AS (
  SELECT n.node,
         CAST({damping_num} * coalesce(c._s, 0) // {damping_den}
              + {base} AS BIGINT) AS rank
  FROM _nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r.rank // d._deg) AS _s
    FROM {edges_cte} e
    JOIN _r{i} r ON r.node = e.src
    JOIN _deg d ON d._src = e.src
    GROUP BY e.dst) c ON c.node = n.node)""")
    return ",\n".join(parts)
