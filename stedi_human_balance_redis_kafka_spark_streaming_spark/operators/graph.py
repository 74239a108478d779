"""Iterative graph analytics: fixed-iteration, integer-exact PageRank.

The third graph engine next to min-label propagation and star
contraction (operators/curation.py): where those compute *membership*
(connected components), PageRank computes *centrality* — the standard
authority score for ranking entities in a link/interaction graph
(domain authority in web-crawl curation, canonical-representative
scoring in dedup graphs, hub detection in transaction graphs).

Everything is exact integer arithmetic (ranks in 1e12 units, damping as
a /100 rational, `div` truncation) so a SQL oracle can unroll the same
rounds and match bit-for-bit — the same determinism policy as the
k-means and BPE trainers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_QUANT = 1_000_000_000_000  # 1e12 — rank units


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Every node must appear as a source at least once (no dangling
    nodes) — symmetrize the edge list first for undirected graphs,
    which guarantees this.  The precondition is VALIDATED (one cheap
    anti-join, raises ``ValueError``), not assumed.  Ranks start at
    1e12 and update as

        r'(v) = (100-d)% · 1e12  +  d% · Σ_{u→v} (r(u) div deg(u))

    entirely in integer arithmetic: per-node messages are ``div``
    truncations, the inbox sum widens to decimal(38,0) (a mega-hub can
    collect a large share of total mass, which overflows int64 past
    ~9·10⁶ average-mass nodes), and the damped result truncates back to
    an int64 ≤ total mass.  Deterministic and partition-order-invariant,
    hence exactly SQL-mirrorable with unrolled rounds.

    Output: (node, rank_e12) — Σ rank_e12 ≈ n·1e12 (truncation leaks
    ≤ 1 unit per node per round).

    Scale shape: per round, ONE join shuffle keyed by ``src`` (edges ⨝
    ranks; the degree table rides the same key) and one partial-
    aggregable sum keyed by ``dst`` — linear in |edges| with no
    all-pairs anywhere; ``localCheckpoint`` truncates lineage so the
    plan stays O(1) deep across rounds.  Skewed hubs: the inbox sum is
    partial-aggregable, so a hot destination combines map-side.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in [0, 100]")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg")).persist()
    deg.count()  # materialize both caches before the rounds read them
    # Enforce the documented precondition instead of trusting it: a
    # dst-only node would silently vanish from the output (nodes come
    # from deg) and the mass sent to it would be discarded by the
    # left join below — wrong ranks with no error.  The check is one
    # anti-join of distinct dst keys against the (node-bounded, cached)
    # degree table, short-circuited by LIMIT 1.
    dangling = (
        e.select(F.col("dst").alias("src"))
        .distinct()
        .join(deg, "src", "left_anti")
        .limit(1)
        .count()
    )
    if dangling:
        e.unpersist()
        deg.unpersist()
        raise ValueError(
            "pagerank: edge list has destination-only (dangling) nodes; "
            "every node must appear as a source — symmetrize the edge "
            "list or add self-loops for sinks"
        )
    base = (RANK_QUANT * (100 - damping_pct)) // 100
    nodes = deg.select(F.col("src").alias("node"))
    ranks = nodes.withColumn("rank_e12", F.lit(RANK_QUANT).cast("long"))
    for _ in range(iters):
        inbox = (
            e.join(deg, "src")
            .join(ranks, F.col("src") == F.col("node"))
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_e12 div deg").alias("msg"),
            )
            .groupBy("node")
            .agg(F.sum(F.col("msg").cast("decimal(38,0)")).alias("m"))
        )
        ranks = (
            nodes.join(inbox, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * coalesce(m, cast(0 as "
                        f"decimal(38,0)))) div 100"
                    )
                )
                .cast("long")
                .alias("rank_e12"),
            )
            .localCheckpoint(eager=False)
        )
    # Materialize the final round before dropping the inputs it reads.
    ranks.count()
    e.unpersist()
    deg.unpersist()
    return ranks
