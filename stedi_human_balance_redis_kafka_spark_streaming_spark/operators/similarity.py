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

Determinism: all ranking uses (rounded cosine DESC, vec_id ASC) so ties
break identically in Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine


def _as_double(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
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
    e = _as_double(emb)
    cos = F.round(cosine(F.col("v"), F.col("qv")), round_digits)
    scored = (
        e.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cos.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def queries_by_modulus(emb: DataFrame, modulus: int) -> DataFrame:
    """Deterministic query-vector selection: vec_id % modulus == 0."""
    return _as_double(emb).filter(F.col("vec_id") % modulus == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
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
    e = _as_double(emb)
    cents = e.filter(F.col("vec_id") % centroid_modulus == 0).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )

    cos_vc = F.round(cosine(F.col("v"), F.col("cv")), round_digits)
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_c"), F.asc("cid")
    )
    assigned = (
        e.crossJoin(F.broadcast(cents))
        .select("vec_id", "v", "cid", cos_vc.alias("cos_c"))
        .withColumn("arank", F.row_number().over(w_assign))
        .filter(F.col("arank") == 1)
        .select("vec_id", "v", "cid")
    )

    cos_qc = F.round(cosine(F.col("qv"), F.col("cv")), round_digits)
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("cos_c"), F.asc("cid")
    )
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .select("query_id", "qv", "cid", cos_qc.alias("cos_c"))
        .withColumn("prank", F.row_number().over(w_probe))
        .filter(F.col("prank") <= nprobe)
        .select("query_id", "qv", "cid")
    )

    cos = F.round(cosine(F.col("v"), F.col("qv")), round_digits)
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        assigned.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= k)
    )
