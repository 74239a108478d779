"""Similarity search over embedding columns (SURVEY.md §2.6).

Two paths:

* ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
  set against every vector.  O(n·q); the right answer below ~10⁵ rows and
  the correctness baseline for everything else.  No shuffle of the big
  side: queries broadcast, cosine is a map stage, and only the window
  rank shuffles q·n small rows on query_id.
* ``ivf_topk`` — IVF-style approximate search: assign every vector to its
  nearest centroid (one broadcast pass), probe the ``nprobe`` nearest
  centroids per query, exact-rank only within those buckets.  Scan cost
  drops by ~|centroids|/nprobe; this is the 100 TB path (centroid
  assignment is embarrassingly parallel, candidate sets are pruned before
  the expensive ranking).

Hot-path arithmetic: vectors are FLATTENED to scalar columns before any
O(n·q) / O(n·|centroids|) stage (functions.vectors.flatten/flat_dot) —
codegen'd flat-double arithmetic skips the per-element array bounds/null
checks array indexing pays per scored pair, and interpreted higher-order
folds are ~100× slower still.  Norms are precomputed once per vector.

Determinism: all ranking uses (rounded cosine DESC, vec_id ASC) so ties
break identically in Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import embedding_dim, flat_dot, flatten, norm_unrolled


def _flat(emb: DataFrame, id_col: str, prefix: str, dim: int) -> DataFrame:
    """(id, nrm, prefix0..prefix{dim-1}) from an embedding table."""
    v = F.col("embedding").cast("array<double>")
    return emb.select(
        F.col(id_col),
        norm_unrolled(v, dim).alias("nrm"),
        *flatten(v, prefix, dim),
    )


def queries_by_modulus(emb: DataFrame, modulus: int) -> DataFrame:
    """Deterministic query-vector selection: vec_id % modulus == 0."""
    return (
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .filter(F.col("vec_id") % modulus == 0)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    )


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Exact cosine top-k of ``emb`` rows for each query vector.

    ``queries``: (query_id, qv) — small; broadcast.  Self-matches
    (query_id == vec_id) are excluded.  Output: (query_id, vec_id,
    cos_sim, rank), rank 1..k.
    """
    dim = embedding_dim(emb)
    # Re-split the scored side: a single-file source yields one input
    # split and the O(n·q) scoring stage would run on a single core.
    par = emb.sparkSession.sparkContext.defaultParallelism
    e = _flat(emb, "vec_id", "d", dim).repartition(par)
    q = queries.select(
        "query_id",
        norm_unrolled(F.col("qv"), dim).alias("qnrm"),
        *flatten(F.col("qv"), "q", dim),
    )
    cos = F.round(flat_dot("d", "q", dim) / (F.col("nrm") * F.col("qnrm")), round_digits)
    scored = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id", "vec_id", cos.alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def assign_nearest_centroid(
    e: DataFrame, cents: DataFrame, dim: int, round_digits: int = 6
) -> DataFrame:
    """Map every vector to its nearest centroid.

    ``e``: flattened corpus (vec_id, nrm, d0..).  ``cents``: flattened
    centroids (cid, cnrm, c0..) — bounded by construction; broadcast.
    Returns ``e``'s columns plus ``cid``.

    Partial-aggregable max_by: the broadcast crossJoin scores map-side,
    and the per-partition partial aggregate collapses the n×|centroids|
    scored rows back to n BEFORE the exchange (vec_ids are unique, so
    each group is fully reduced in its own partition).  A window
    formulation would shuffle the full n×|centroids| scored table on
    vec_id — a |centroids|× larger exchange.  Ordering struct
    (cos_c, -cid) == (cos DESC, cid ASC) for deterministic ties.
    """
    carry = [c for c in e.columns if c != "vec_id"]
    cos_c = F.round(
        flat_dot("d", "c", dim) / (F.col("nrm") * F.col("cnrm")), round_digits
    )
    return (
        e.crossJoin(F.broadcast(cents))
        .select("vec_id", *carry, "cid", cos_c.alias("cos_c"))
        .groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct("cid", *carry),
                F.struct(F.col("cos_c"), (-F.col("cid")).alias("neg_cid")),
            ).alias("best")
        )
        .select("vec_id", *[F.col(f"best.{c}").alias(c) for c in ["cid", *carry]])
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    centroid_modulus: int = 50,
    nprobe: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """IVF-bucketed approximate top-k.

    Centroids are the vectors with vec_id % centroid_modulus == 0 —
    deterministic so the oracle can replicate them (a production system
    would k-means these; the index structure and query path are
    identical).  Each vector is assigned to its nearest centroid; each
    query probes its ``nprobe`` nearest centroids and ranks exactly
    within those buckets.  Output: (query_id, vec_id, cos_sim, rank).
    """
    dim = embedding_dim(emb)
    e = _flat(emb, "vec_id", "d", dim)
    cents = e.filter(F.col("vec_id") % centroid_modulus == 0).select(
        F.col("vec_id").alias("cid"),
        F.col("nrm").alias("cnrm"),
        *[F.col(f"d{i}").alias(f"c{i}") for i in range(dim)],
    )

    assigned = assign_nearest_centroid(e, cents, dim, round_digits)

    q = queries.select(
        "query_id",
        norm_unrolled(F.col("qv"), dim).alias("qnrm"),
        *flatten(F.col("qv"), "q", dim),
    )
    cos_probe = F.round(
        flat_dot("q", "c", dim) / (F.col("qnrm") * F.col("cnrm")), round_digits
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("cos_c"), F.asc("cid"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "qnrm",
            *[f"q{i}" for i in range(dim)],
            "cid",
            cos_probe.alias("cos_c"),
        )
        .withColumn("prank", F.row_number().over(w_probe))
        .filter(F.col("prank") <= nprobe)
        .drop("cos_c", "prank")
    )

    cos_sim = F.round(
        flat_dot("d", "q", dim) / (F.col("nrm") * F.col("qnrm")), round_digits
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        assigned.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cos_sim.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= k)
    )
