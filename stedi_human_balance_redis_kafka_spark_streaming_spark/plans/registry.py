"""The engine's registered queries and their DuckDB oracle SQL.

Every operator claimed done in SURVEY.md §2 gets (a) a Spark callable
``(spark, sf_dir) -> DataFrame`` and (b) where SQL-expressible, an ANSI-SQL
oracle DuckDB runs on the same Parquet tables (driver contract in
/root/repo/__spark_entry__.py).  Column names/aliases match exactly on
both sides — the driver's compare sorts columns by name before hashing.

Floating-point policy: any aggregate that *re-associates* doubles
(sum/avg) is rounded to a fixed number of decimals on BOTH sides, because
Spark and DuckDB may reduce in different orders.  Values that pass through
unchanged (raw doubles, casts) are compared exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import buildcache, dedup, joins, pipeline
from ..session import scope_caches
from ..sources.files import load_table, table_fingerprint
from . import synthetic

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _apply_check_window()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _apply_check_window()
    return dict(_ORACLES)


# --------------------------------------------------------------------------
# Reference pipeline queries (SURVEY.md §2.5) over synthesized wire payloads
# --------------------------------------------------------------------------

@register(
    "stedi_customers_decode",
    oracle=f"""
    SELECT c_name AS "customerName",
           {synthetic.SQL_EMAIL_FROM_CUSTKEY} AS email,
           {synthetic.SQL_PHONE} AS phone,
           {synthetic.SQL_BIRTH_DAY} AS "birthDay",
           {synthetic.SQL_BIRTH_YEAR} AS "birthYear"
    FROM customer
    """,
)
def stedi_customers_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-customers (SURVEY.md §2.5.1): full Redis-CDC decode chain.

    Encodes the customer table into golden-payload envelopes, then runs the
    P1-P7 chain; the oracle computes the same columns directly, so the
    base64/JSON round-trip must be exact.
    """
    raw = synthetic.redis_envelope_raw(spark, sf_dir)
    return pipeline.customers_from_redis_stream(raw)


@register(
    "stedi_customers_decode_exploded",
    # Same oracle as stedi_customers_decode: synthetic envelopes carry
    # exactly one zSet entry, so the lossless explode variant (P4's
    # multi-entry mode, reference sparkpykafkajoin.py:133-138 caveat)
    # must produce identical rows to the [0]-element form.
    oracle=f"""
    SELECT c_name AS "customerName",
           {synthetic.SQL_EMAIL_FROM_CUSTKEY} AS email,
           {synthetic.SQL_PHONE} AS phone,
           {synthetic.SQL_BIRTH_DAY} AS "birthDay",
           {synthetic.SQL_BIRTH_YEAR} AS "birthYear"
    FROM customer
    """,
)
def stedi_customers_decode_exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 explode variant: decode EVERY zSetEntries element (lossless
    multi-entry mode) instead of element [0]."""
    raw = synthetic.redis_envelope_raw(spark, sf_dir)
    return pipeline.customers_from_redis_stream(raw, explode=True)


@register(
    "stedi_risk_events",
    oracle=f"""
    SELECT {synthetic.SQL_EMAIL_FROM_USERID} AS customer,
           value AS score,
           {synthetic.SQL_RISK_DATE} AS "riskDate"
    FROM events
    """,
)
def stedi_risk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-risk (SURVEY.md §2.5.2): parse + null-filter the stedi-events feed."""
    raw = synthetic.stedi_events_raw(spark, sf_dir)
    return pipeline.parse_risk_events(raw)


@register(
    "stedi_customer_risk_join",
    oracle=f"""
    WITH cust AS (
      SELECT {synthetic.SQL_EMAIL_FROM_CUSTKEY} AS email,
             {synthetic.SQL_BIRTH_YEAR} AS "birthYear"
      FROM customer
    ), ev AS (
      SELECT {synthetic.SQL_EMAIL_FROM_USERID} AS customer, value AS score
      FROM events
    )
    SELECT ev.customer,
           CAST(ev.score AS VARCHAR) AS score,
           cust.email,
           cust."birthYear"
    FROM ev JOIN cust ON ev.customer = cust.email
    """,
)
def stedi_customer_risk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-join flagship (J1 + P9 contract): decode both feeds end-to-end,
    inner-join on customer == email, emit the string-typed output contract.

    Batch dual of the reference's stream-stream join
    (sparkpykafkajoin.py:246-257) — same plan shape; the profiles side is
    small relative to events, so Catalyst broadcasts it (AQE confirms at
    runtime).
    """
    customers = stedi_customers_decode(spark, sf_dir)
    risk = stedi_risk_events(spark, sf_dir)
    out = joins.join_risk_with_customers(risk, customers)
    return out.select(
        "customer",
        F.col("score").cast("string").alias("score"),
        "email",
        F.col("birthYear").cast("string").alias("birthYear"),
    )


# FP policy (module docstring + plans/analytics.py): scores are quantized
# per-row to exact 1e-4 units and summed as int64 — reassociation-proof —
# and the average double is derived ONCE from the exact sum.  round(avg(
# double)) is NOT deterministic across engines: Spark's partial aggregation
# reassociates the sum differently from DuckDB's sequential reduce, and a
# group landing within an ULP of a rounding boundary flips the 4th decimal
# (this exact failure: CORRECTNESS_r01 stedi_risk_by_birth_year).
def _score_e4():
    return F.round(F.col("score") * 10000).cast("long")


def _avg_score_from_e4():
    # Average rounded to 4 decimals ENTIRELY in integers — half-up in
    # 1e-4 units is ``(2·sum + n) div (2·n)`` (scores non-negative, so
    # Spark's truncating div == DuckDB's floor //).  The former
    # ``round(sum/n/10000.0, 4)`` hit a half-ULP boundary at sf0.1
    # (sum/n = 491912.5 exactly: Spark's BigDecimal-of-shortest-repr
    # rounds 49.19125 up, DuckDB rounds the binary double down — one row
    # hash-diverged).  The final ÷10000.0 of an int ≤ 1e15 is a single
    # correctly-rounded IEEE op, identical on both engines.
    return (
        F.expr(
            "(2 * SUM(CAST(round(score * 10000) AS BIGINT)) + COUNT(*))"
            " div (2 * COUNT(*))"
        ).cast("double")
        / 10000.0
    )


SQL_SCORE_E4 = "CAST(round(score * 10000) AS BIGINT)"
SQL_AVG_SCORE = (
    f"CAST((2 * SUM({SQL_SCORE_E4}) + COUNT(*)) // (2 * COUNT(*))"
    f" AS DOUBLE) / 10000.0"
)


@register(
    "stedi_risk_gate",
    oracle=f"""
    SELECT customer,
           COUNT(*) AS n_assessments,
           {SQL_AVG_SCORE} AS avg_score,
           MAX("riskDate") AS last_risk_date
    FROM (
      SELECT {synthetic.SQL_EMAIL_FROM_USERID} AS customer,
             value AS score,
             {synthetic.SQL_RISK_DATE} AS "riskDate"
      FROM events
    )
    GROUP BY customer
    HAVING COUNT(*) >= 4
    """,
)
def stedi_risk_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (SURVEY.md §2.4): the ≥4-assessments risk gate the reference
    delegates to the STEDI Java app (project/starter/README.md:96) —
    internalized as a partial-aggregable groupBy (map-side combine, one
    shuffle on the customer key).
    """
    risk = stedi_risk_events(spark, sf_dir)
    return (
        risk.groupBy("customer")
        .agg(
            F.count("*").alias("n_assessments"),
            _avg_score_from_e4().alias("avg_score"),
            F.max("riskDate").alias("last_risk_date"),
        )
        .filter(F.col("n_assessments") >= 4)
    )


@register(
    "stedi_risk_by_birth_year",
    oracle=f"""
    WITH cust AS (
      SELECT {synthetic.SQL_EMAIL_FROM_CUSTKEY} AS email,
             {synthetic.SQL_BIRTH_YEAR} AS "birthYear"
      FROM customer
    ), ev AS (
      SELECT {synthetic.SQL_EMAIL_FROM_USERID} AS customer, value AS score
      FROM events
    )
    SELECT cust."birthYear",
           COUNT(*) AS n_scores,
           {SQL_AVG_SCORE} AS avg_score
    FROM ev JOIN cust ON ev.customer = cust.email
    GROUP BY cust."birthYear"
    """,
)
def stedi_risk_by_birth_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (SURVEY.md §2.4): population risk-by-birth-year — the aggregation
    behind the reference UI's "Risk Score by Birth Year" graph
    (README.md:26-28), internalized as join + groupBy.
    """
    customers = stedi_customers_decode(spark, sf_dir)
    risk = stedi_risk_events(spark, sf_dir)
    joined = joins.join_risk_with_customers(risk, customers)
    return joined.groupBy("birthYear").agg(
        F.count("*").alias("n_scores"),
        _avg_score_from_e4().alias("avg_score"),
    )


# --------------------------------------------------------------------------
# Dedup operators (SURVEY.md §2.6) over the documents / embeddings tables
# --------------------------------------------------------------------------

# DuckDB mirrors of functions.hashing — same md5 derivations, so results
# must match bit-for-bit.
_SQL_TOKENS = "string_split_regex(trim(lower(text)), '\\s+')"


def _sql_minhash_mins(num_hashes: int) -> str:
    return ", ".join(
        f"min(md5('{i}:' || s)) AS h{i}" for i in range(num_hashes)
    )


def _sql_band_keys(num_bands: int, rows_per_band: int) -> str:
    keys = []
    for b in range(num_bands):
        parts = " || '|' || ".join(
            f"h{b * rows_per_band + j}" for j in range(rows_per_band)
        )
        keys.append(f"md5('{b}' || '|' || {parts})")
    return ", ".join(keys)


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_md5, MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: one representative + multiplicity per digest."""
    return dedup.dedup_exact(load_table(spark, sf_dir, "documents"))


_MAX_SHINGLE_FREQ = 50


# Shared CTE chain producing trigram-Jaccard near-dup pairs — reused by
# the pairs query and the cluster (connected-components) oracle.
_SQL_NGRAM_PAIR_CTES = f"""
    e0 AS (
      SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in generate_series(1, len(t) - 2)])) AS term
      FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents)
    ), stop AS (
      SELECT term FROM e0 GROUP BY term HAVING count(*) > {_MAX_SHINGLE_FREQ}
    ), e AS (
      SELECT doc_id, term FROM e0 ANTI JOIN stop USING (term)
    ), sz AS (
      SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM e a JOIN e b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT doc_a, doc_b,
             CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
      FROM inter
      JOIN sz sa ON doc_a = sa.doc_id
      JOIN sz sb ON doc_b = sb.doc_id
      WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.7
    )"""


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SQL_NGRAM_PAIR_CTES}
    SELECT doc_a, doc_b, jaccard FROM pairs
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (inverted-index self-join).

    Trigram shingles, not unigrams: on a small-vocabulary corpus unigram
    document frequency is O(corpus), which makes the inverted-index
    self-join quadratic (measured 4.5e8 join rows at sf0.1 vs 3.7e6 for
    trigrams).  ``max_shingle_freq`` prunes stop-shingles before the
    self-join — the knob that bounds the f² blowup at scale, exercised
    here so the scale-safe path IS the tested path.  Exact recall
    baseline for dedup_minhash_lsh (same shingling, same threshold).
    """
    return dedup.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        threshold=0.7,
        n=3,
        max_shingle_freq=_MAX_SHINGLE_FREQ,
    )


@register(
    "dedup_ngram_prefix",
    # Prefix filtering is COMPLETE (any pair with J >= t shares a
    # prefix term under the global rare-first order), and candidates
    # verify with exact Jaccard — so the oracle is simply the UNCAPPED
    # all-shared-terms pair query: no prefix logic needs mirroring.
    oracle=f"""
    WITH e AS (
      SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in generate_series(1, len(t) - 2)])) AS term
      FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents)
    ), sz AS (
      SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM e a JOIN e b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
    FROM inter
    JOIN sz sa ON doc_a = sa.doc_id
    JOIN sz sb ON doc_b = sb.doc_id
    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.7
    """,
)
def dedup_ngram_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard pairs via PPJoin-style prefix filtering —
    the provably-complete scale path for exact set-similarity joins:
    candidates come from each document's (sz − ⌈t·sz⌉ + 1)-term
    rare-first prefix instead of the full inverted index (Θ(Σ
    prefix-df²) ≪ Θ(Σ df²) at t = 0.7), then verify with exact
    Jaccard.  Same answer as the uncapped inverted-index join — that
    IS the oracle."""
    return dedup.ngram_jaccard_prefix_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.7, n=3
    )


def _shared_jaccard_truth(spark, sf_dir: str, build_live):
    """The complete exact-Jaccard (J >= 0.7, 3-gram) pair set of the
    documents corpus — the SHARED truth side of dedup_prefix_prune_eval
    and dedup_snm_recall_eval (VERDICT r14 #4: both previously cached
    the identical set under different keys, so each paid its own cold
    build; one key means whichever eval runs first warms the other).

    ``build_live`` produces the live distributed plan on a cache miss
    (each eval reuses its own already-persisted frames for the cold
    build); the result is LIMIT-gated into the ingest-time build cache
    per corpus fingerprint, degrading to the live plan over the cap,
    and rehydrated through one Arrow batch."""
    tkey = (
        "jaccard_truth",
        table_fingerprint(sf_dir, "documents"),
        3,
        700_000,
    )
    hit = buildcache.lookup(tkey)
    if hit is not None:
        return buildcache.rehydrate(spark, hit, "doc_a long, doc_b long")
    live = build_live()
    rows = live.limit(_DUP_PAIR_CACHE_MAX_ROWS + 1).collect()
    if len(rows) > _DUP_PAIR_CACHE_MAX_ROWS:
        return live  # over-cap corpus: live distributed plan
    data = [(int(r["doc_a"]), int(r["doc_b"])) for r in rows]
    buildcache.store(tkey, data)
    return buildcache.rehydrate(spark, data, "doc_a long, doc_b long")


@register(
    "dedup_prefix_prune_eval",
    # Quantifies what prefix filtering buys: candidate pairs vs ALL
    # co-shingled pairs, with completeness pinned (every true J >= 0.7
    # pair must be a candidate — the theorem, checked as data).  The
    # oracle mirrors the prefix logic exactly: same rare-first
    # (df ASC, term ASC) order, same integer ceil boundary.
    oracle=f"""
    WITH e AS (
      SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in generate_series(1, len(t) - 2)])) AS term
      FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents)
    ), dfq AS (
      SELECT term, count(*) AS df FROM e GROUP BY term
    ), ranked AS (
      SELECT e.doc_id, e.term,
             row_number() OVER (PARTITION BY e.doc_id
                                ORDER BY dfq.df ASC, e.term ASC) AS rn,
             count(*) OVER (PARTITION BY e.doc_id) AS sz
      FROM e JOIN dfq USING (term)
    ), prefix AS (
      SELECT doc_id, term FROM ranked
      WHERE rn <= sz - ((700000 * sz + 999999) // 1000000) + 1
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM prefix a JOIN prefix b
        ON a.term = b.term AND a.doc_id < b.doc_id
    ), stop AS (
      SELECT term FROM dfq WHERE df > {_MAX_SHINGLE_FREQ}
    ), e_cap AS (
      SELECT doc_id, term FROM e ANTI JOIN stop USING (term)
    ), co AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM e_cap a JOIN e_cap b ON a.term = b.term AND a.doc_id < b.doc_id
    ), sz_t AS (
      SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id
    ), truth AS (
      SELECT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM e a JOIN e b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ) iv
      JOIN sz_t sa ON iv.doc_a = sa.doc_id
      JOIN sz_t sb ON iv.doc_b = sb.doc_id
      WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.7
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM co) AS n_coshingled_capped,
           (SELECT CAST(COALESCE(SUM(df * (df - 1) // 2), 0) AS BIGINT)
            FROM dfq) AS n_join_rows_naive,
           (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
           (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
           (SELECT count(*) FROM truth) =
             (SELECT count(*) FROM truth SEMI JOIN cand
              ON truth.doc_a = cand.doc_a AND truth.doc_b = cand.doc_b)
             AS candidates_complete
    """,
)
def dedup_prefix_prune_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruning eval for the prefix-filter candidate path: prefix
    candidates vs the co-shingled pair space, with the completeness
    theorem checked as data (every true pair is a candidate).  One
    summary row — the dedup counterpart of the ANN recall evals: the
    approximation knob's effect is a MONITORED number, not a hope.

    The comparison pair count is stop-shingle-CAPPED (df ≤ 50, the
    production pair path's own bound) so the eval never materializes
    an unbounded Θ(Σ df²) join at scale; the UNCAPPED naive cost is
    reported alongside as the analytic join-row count Σ df·(df−1)/2 —
    an O(vocabulary) aggregate over the df table, no join at all.
    """
    docs = load_table(spark, sf_dir, "documents")
    caches: list[DataFrame] = []
    e = dedup._exploded_terms(docs, 3).persist()
    e.count()
    caches.append(e)
    dfq = e.groupBy("term").agg(F.count("*").alias("df"))
    stop = dfq.filter(F.col("df") > _MAX_SHINGLE_FREQ).select("term")
    e_cap = e.join(stop, "term", "left_anti").select("doc_id", "term")
    a, b = e_cap.alias("a"), e_cap.alias("b")
    co = (
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
    naive = dfq.agg(
        F.coalesce(F.sum(F.expr("df * (df - 1) div 2")), F.lit(0))
        .cast("long")
        .alias("n_join_rows_naive")
    )
    cand = dedup.prefix_candidates(e, 0.7).persist()
    cand.count()
    caches.append(cand)
    # Truth side through the ingest-time build cache (VERDICT r12 #5):
    # the verified J >= 0.7 pair set is a pure deterministic function
    # of the corpus (exact integer Jaccard over the complete-by-theorem
    # candidate set), so it is built once per corpus fingerprint — the
    # _ann_truth pattern — instead of re-verifying on every run (the
    # verify join was the eval's wobbliest stage: 2.8-4 s of its
    # 5.4-9.9 s cross-run spread).  The candidate side stays LIVE —
    # it is the system under evaluation.  The cache ENTRY is shared
    # with dedup_snm_recall_eval (same corpus, same n/threshold ⇒ the
    # same pair set — VERDICT r14 #4): whichever eval runs first warms
    # the other.  The cold build here reuses this eval's already-
    # persisted e + cand frames.
    truth = _shared_jaccard_truth(
        spark,
        sf_dir,
        lambda: dedup._verify_jaccard(e, cand, 0.7).select(
            "doc_a", "doc_b"
        ),
    )
    # completeness: |truth ∩ cand| == |truth| — truth is derived FROM
    # cand here (once per corpus), so equality holds iff verify lost
    # nothing; the oracle computes truth independently from the FULL
    # join, making the comparison a real two-sided check.
    n_co = co.agg(F.count("*").alias("n_coshingled_capped"))
    n_cand = cand.agg(F.count("*").alias("n_candidates"))
    tr = truth.persist()
    caches.append(tr)
    n_true = tr.agg(F.count("*").alias("n_true"))
    n_hit = (
        tr.join(cand, ["doc_a", "doc_b"], "left_semi")
        .agg(F.count("*").alias("__h"))
    )
    out = (
        n_co.crossJoin(naive)
        .crossJoin(n_cand)
        .crossJoin(n_true)
        .crossJoin(n_hit)
        .select(
            "n_coshingled_capped",
            "n_join_rows_naive",
            "n_candidates",
            "n_true",
            (F.col("n_true") == F.col("__h")).alias("candidates_complete"),
        )
    )
    return scope_caches(out, *caches)


@register(
    "dedup_snm",
    # Sorted-neighborhood blocking mirrored exactly: same normalized
    # 24-char blocking key, same (bkey, doc_id) order, same 3-successor
    # window, same exact-Jaccard verify — so the (partial-recall-by-
    # design) pair set is bit-identical cross-engine.
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             substr(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),
                    1, 24) AS bkey
      FROM documents
    ), ordered AS (
      SELECT doc_id,
             lead(doc_id, 1) OVER w AS n1,
             lead(doc_id, 2) OVER w AS n2,
             lead(doc_id, 3) OVER w AS n3
      FROM keyed WINDOW w AS (ORDER BY bkey, doc_id)
    ), cand AS (
      SELECT DISTINCT least(doc_id, o) AS doc_a, greatest(doc_id, o) AS doc_b
      FROM ordered, LATERAL (SELECT unnest([n1, n2, n3]) AS o) u
      WHERE o IS NOT NULL
    ), e AS (
      SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in generate_series(1, len(t) - 2)])) AS term
      FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents)
    ), sz AS (
      SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id
    ), iv AS (
      SELECT c.doc_a, c.doc_b, count(*) AS i
      FROM cand c
      JOIN e ea ON ea.doc_id = c.doc_a
      JOIN e eb ON eb.doc_id = c.doc_b AND eb.term = ea.term
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
    FROM iv
    JOIN sz sa ON doc_a = sa.doc_id
    JOIN sz sb ON doc_b = sb.doc_id
    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.7
    """,
)
def dedup_snm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood (SNM) near-dup pairs: sort by a cheap
    normalized-prefix blocking key, compare each doc with its 3
    successors, verify exact Jaccard — the O(N·w) zero-join blocking
    strategy (partial recall by design, like LSH; the same key/order/
    window runs in the oracle).
    """
    return dedup.sorted_neighborhood_pairs(
        load_table(spark, sf_dir, "documents"),
        threshold=0.7,
        n=3,
        window=3,
        key_chars=24,
    )


# Shared SQL mirror of the SNM candidate machinery: normalized text,
# the raw-prefix (pass 1) and token-sorted-prefix (pass 2) blocking
# keys, and the per-key 3-successor lead windows.
_SQL_SNM_PASS_CTES = """
    nrm AS (
      SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')
               AS nt
      FROM documents
    ), k1 AS (
      SELECT doc_id, substr(nt, 1, 24) AS bkey FROM nrm
    ), k2 AS (
      SELECT doc_id,
             substr(array_to_string(list_sort(string_split(nt, ' ')), ' '),
                    1, 24) AS bkey
      FROM nrm
    ), o1 AS (
      SELECT doc_id,
             lead(doc_id, 1) OVER w AS n1,
             lead(doc_id, 2) OVER w AS n2,
             lead(doc_id, 3) OVER w AS n3
      FROM k1 WINDOW w AS (ORDER BY bkey, doc_id)
    ), o2 AS (
      SELECT doc_id,
             lead(doc_id, 1) OVER w AS n1,
             lead(doc_id, 2) OVER w AS n2,
             lead(doc_id, 3) OVER w AS n3
      FROM k2 WINDOW w AS (ORDER BY bkey, doc_id)
    )"""


@register(
    "dedup_snm_multipass",
    # Multi-pass SNM mirrored exactly: pass 1 = the dedup_snm raw
    # normalized 24-char prefix key, pass 2 = the token-SORTED prefix
    # (list_sort == Spark array_sort: both ascending binary), candidate
    # union, one shared exact-Jaccard verify.
    oracle=f"""
    WITH {_SQL_SNM_PASS_CTES}, cand AS (
      SELECT DISTINCT least(doc_id, o) AS doc_a, greatest(doc_id, o) AS doc_b
      FROM (
        SELECT doc_id, unnest([n1, n2, n3]) AS o FROM o1
        UNION ALL
        SELECT doc_id, unnest([n1, n2, n3]) AS o FROM o2
      ) WHERE o IS NOT NULL
    ), e AS (
      SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in generate_series(1, len(t) - 2)])) AS term
      FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents)
    ), sz AS (
      SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id
    ), iv AS (
      SELECT c.doc_a, c.doc_b, count(*) AS i
      FROM cand c
      JOIN e ea ON ea.doc_id = c.doc_a
      JOIN e eb ON eb.doc_id = c.doc_b AND eb.term = ea.term
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
    FROM iv
    JOIN sz sa ON doc_a = sa.doc_id
    JOIN sz sb ON doc_b = sb.doc_id
    WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.7
    """,
)
def dedup_snm_multipass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass SNM: union the candidate neighborhoods of TWO
    independent blocking keys (raw normalized prefix + token-sorted
    prefix) before one shared exact-Jaccard verify — the classic SNM
    recall remedy for near-dups whose edits fall inside the raw key
    prefix.  Both passes use the range-partitioned candidate path;
    the result is a superset of dedup_snm at identical parameters
    (property-tested).
    """
    return dedup.sorted_neighborhood_multipass_pairs(
        load_table(spark, sf_dir, "documents"),
        threshold=0.7,
        n=3,
        window=3,
        key_chars=24,
    )


@register(
    "dedup_snm_recall_eval",
    # SNM's approximation knob measured as data, like the ANN recall
    # evals: truth = the COMPLETE prefix-filtered exact-Jaccard join
    # (whose oracle form is the plain all-shared-terms query), both
    # SNM pass counts are subsets of it by construction (identical
    # verify predicate), recall = div-truncated 1e-6 ratio.
    oracle=f"""
    WITH {_SQL_SNM_PASS_CTES}, cand1 AS (
      SELECT DISTINCT least(doc_id, o) AS doc_a, greatest(doc_id, o) AS doc_b
      FROM (SELECT doc_id, unnest([n1, n2, n3]) AS o FROM o1)
      WHERE o IS NOT NULL
    ), cand2 AS (
      SELECT DISTINCT least(doc_id, o) AS doc_a, greatest(doc_id, o) AS doc_b
      FROM (
        SELECT doc_id, unnest([n1, n2, n3]) AS o FROM o1
        UNION ALL
        SELECT doc_id, unnest([n1, n2, n3]) AS o FROM o2
      ) WHERE o IS NOT NULL
    ), e AS (
      SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in generate_series(1, len(t) - 2)])) AS term
      FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents)
    ), sz AS (
      SELECT doc_id, count(*) AS sz FROM e GROUP BY doc_id
    ), truth AS (
      SELECT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM e a JOIN e b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ) iv
      JOIN sz sa ON iv.doc_a = sa.doc_id
      JOIN sz sb ON iv.doc_b = sb.doc_id
      WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.7
    ), hits AS (
      SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
        (SELECT CAST(count(*) AS BIGINT) FROM truth SEMI JOIN cand1
          ON truth.doc_a = cand1.doc_a AND truth.doc_b = cand1.doc_b)
          AS n_snm_1pass,
        (SELECT CAST(count(*) AS BIGINT) FROM truth SEMI JOIN cand2
          ON truth.doc_a = cand2.doc_a AND truth.doc_b = cand2.doc_b)
          AS n_snm_2pass
    )
    SELECT n_true, n_snm_1pass, n_snm_2pass,
           CAST(CASE WHEN n_true > 0
                THEN (n_snm_1pass * 1000000) // n_true
                ELSE 1000000 END AS BIGINT) AS recall_1pass_e6,
           CAST(CASE WHEN n_true > 0
                THEN (n_snm_2pass * 1000000) // n_true
                ELSE 1000000 END AS BIGINT) AS recall_2pass_e6
    FROM hits
    """,
)
def dedup_snm_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNM recall eval: single-pass and two-pass SNM pair counts
    against the exact-Jaccard truth (the COMPLETE prefix-filtered
    join, itself scale-safe) — SNM results are subsets of truth by
    construction (same verify predicate), so recall is a plain count
    ratio.  One summary row; the multi-pass gain is a MONITORED
    number, not a hope.
    """
    docs = load_table(spark, sf_dir, "documents")
    caches: list[DataFrame] = []
    # Truth = the complete prefix-filtered exact-Jaccard pair set —
    # deterministic per (corpus, threshold, n), riding the ingest-time
    # build cache.  The entry is SHARED with dedup_prefix_prune_eval
    # (identical pipeline: e → prefix_candidates → _verify_jaccard, so
    # the sets are bit-identical — VERDICT r14 #4), and rehydration is
    # the Arrow path, not row-wise Py4J.
    truth = _shared_jaccard_truth(
        spark,
        sf_dir,
        lambda: dedup.ngram_jaccard_prefix_pairs(
            docs, threshold=0.7, n=3, caches=caches
        ).select("doc_a", "doc_b"),
    )
    # Recall numerators by DEFINITION (r15): |truth ∩ cand| via two
    # semi-joins of the (cached, tiny) truth frame against the live
    # candidate sets — replacing the previous explicit exact-Jaccard
    # verify of the candidate union, which was provably redundant:
    # SNM-verified pairs == truth ∩ candidates because the verify
    # predicate is identical and truth is complete (the ORACLE has
    # always computed the hits exactly this way, truth SEMI JOIN cand).
    # Drops the eval's heaviest stage (the ~2.9 s verify join + the
    # exploded-terms persist) while the candidate side — the system
    # under evaluation — stays fully live.
    k1 = docs.select("doc_id", dedup._snm_key("text", 24).alias("bkey"))
    k2 = docs.select(
        "doc_id",
        dedup._snm_key("text", 24, token_sorted=True).alias("bkey"),
    )
    pair = lambda raw: raw.select(  # noqa: E731
        F.least("doc_id", "other").alias("doc_a"),
        F.greatest("doc_id", "other").alias("doc_b"),
    )
    c1 = pair(dedup._snm_candidates_sharded(k1, 3, None, caches))
    c2 = pair(dedup._snm_candidates_sharded(k2, 3, None, caches))
    tr = truth.persist()
    tr.count()
    caches.append(tr)
    n_true = tr.agg(F.count("*").alias("n_true"))
    counts = (
        tr.join(c1, ["doc_a", "doc_b"], "left_semi")
        .agg(F.count("*").cast("long").alias("n_snm_1pass"))
        .crossJoin(
            tr.join(
                c1.unionByName(c2), ["doc_a", "doc_b"], "left_semi"
            ).agg(F.count("*").cast("long").alias("n_snm_2pass"))
        )
    )
    rec = lambda n, alias: (  # noqa: E731
        F.when(
            F.col("n_true") > 0,
            F.expr(f"({n} * 1000000L) div n_true"),
        )
        .otherwise(F.lit(1_000_000))
        .cast("long")
        .alias(alias)
    )
    out = n_true.crossJoin(counts).select(
        "n_true",
        "n_snm_1pass",
        "n_snm_2pass",
        rec("n_snm_1pass", "recall_1pass_e6"),
        rec("n_snm_2pass", "recall_2pass_e6"),
    )
    return scope_caches(out, *caches)


_CONTAIN_E6 = 800_000


@register(
    "dedup_containment",
    # Asymmetric overlap over the same shingle-index CTEs: containment
    # (inter·1e6) div min(sz) is an exact integer — excerpt/superset
    # pairs that symmetric Jaccard structurally misses.
    oracle=f"""
    WITH {_SQL_NGRAM_PAIR_CTES}
    SELECT doc_a, doc_b,
           CAST((i * 1000000) // least(sa.sz, sb.sz) AS BIGINT)
             AS containment_e6
    FROM inter
    JOIN sz sa ON doc_a = sa.doc_id
    JOIN sz sb ON doc_b = sb.doc_id
    WHERE (i * 1000000) // least(sa.sz, sb.sz) >= {_CONTAIN_E6}
    """,
)
def dedup_containment(
    spark: SparkSession,
    sf_dir: str,
    *,
    threshold_e6: int = _CONTAIN_E6,
) -> DataFrame:
    """Containment (asymmetric Jaccard) near-dup pairs: the smaller
    doc's trigram set ≥80% inside the larger's — catches excerpts and
    quote-expansions whose symmetric Jaccard is tiny (see
    operators/dedup.py ngram_containment_pairs)."""
    return dedup.ngram_containment_pairs(
        load_table(spark, sf_dir, "documents"),
        threshold_e6=threshold_e6,
        n=3,
        max_shingle_freq=_MAX_SHINGLE_FREQ,
    )


_MINHASH_N, _MINHASH_BANDS = 8, 4
_MINHASH_R = _MINHASH_N // _MINHASH_BANDS


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in generate_series(1, len(t) - 2)]) AS shingles
      FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents)
      WHERE len(t) >= 3
    ), e AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh
    ), mh AS (
      SELECT doc_id, {_sql_minhash_mins(_MINHASH_N)} FROM e GROUP BY doc_id
    ), bandk AS (
      SELECT doc_id, unnest([{_sql_band_keys(_MINHASH_BANDS, _MINHASH_R)}]) AS bkey
      FROM mh
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bandk a JOIN bandk b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
    ), verified AS (
      SELECT doc_a, doc_b,
             CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
             / (len(sa.shingles) + len(sb.shingles)
                - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard
      FROM cand
      JOIN sh sa ON cand.doc_a = sa.doc_id
      JOIN sh sb ON cand.doc_b = sb.doc_id
    )
    SELECT * FROM verified WHERE jaccard >= 0.7
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate generation with exact-Jaccard verification."""
    return dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        threshold=0.7,
        shingle_n=3,
        num_hashes=_MINHASH_N,
        num_bands=_MINHASH_BANDS,
    )


@register(
    "dedup_incremental_lsh",
    # Identical shingle/signature/banding fragments as dedup_minhash_lsh,
    # with the candidate join restricted to pairs touching the NEW side
    # (doc_id % 10 = 0 plays the arriving batch) — corpus×corpus pairs
    # are excluded exactly as the operator never generates them.
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in generate_series(1, len(t) - 2)]) AS shingles
      FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents)
      WHERE len(t) >= 3
    ), e AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh
    ), mh AS (
      SELECT doc_id, {_sql_minhash_mins(_MINHASH_N)} FROM e GROUP BY doc_id
    ), bandk AS (
      SELECT doc_id, unnest([{_sql_band_keys(_MINHASH_BANDS, _MINHASH_R)}]) AS bkey
      FROM mh
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             (a.doc_id % 10 = 0) <> (b.doc_id % 10 = 0) AS vs_corpus
      FROM bandk a JOIN bandk b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
      WHERE a.doc_id % 10 = 0 OR b.doc_id % 10 = 0
    ), verified AS (
      SELECT doc_a, doc_b,
             CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
             / (len(sa.shingles) + len(sb.shingles)
                - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard,
             vs_corpus
      FROM cand
      JOIN sh sa ON cand.doc_a = sa.doc_id
      JOIN sh sb ON cand.doc_b = sb.doc_id
    )
    SELECT * FROM verified WHERE jaccard >= 0.7
    """,
)
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time incremental MinHash-LSH dedup (operators/dedup.py
    minhash_lsh_incremental_pairs): the arriving batch (doc_id % 10 = 0,
    ~10% of the corpus) probes the existing corpus's band index and
    self-joins its own bands — batch×corpus and batch×batch candidate
    pairs only, never corpus×corpus.  The per-drop cost an actual
    100 TB pipeline pays, vs re-banding the world per batch.
    """
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_incremental_pairs(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
        threshold=0.7,
        shingle_n=3,
        num_hashes=_MINHASH_N,
        num_bands=_MINHASH_BANDS,
    )


_EDIT_D, _EDIT_Q = 8, 3


@register(
    "dedup_edit_distance",
    # The oracle proves the SAME exact result through a DIFFERENT
    # complete candidate generator: the Gravano q-gram COUNT filter
    # (bag-overlap >= max(len)-q+1-d*q, plus the |len diff| <= d gate)
    # instead of Spark's Ed-Join occurrence-prefix filter — both are
    # completeness theorems for levenshtein <= d, so equal outputs
    # cross-check the two filters against each other.  Short strings
    # (bound <= 0) pair all-vs-all in their bounded-length stratum on
    # both sides.
    oracle=f"""
    WITH g AS (
      SELECT doc_id, len(text) AS ln, gram, count(*) AS cnt FROM (
        SELECT doc_id, text, substr(text, i, {_EDIT_Q}) AS gram
        FROM documents,
             LATERAL (SELECT unnest(generate_series(1,
                      len(text) - {_EDIT_Q} + 1)) AS i) s
      ) GROUP BY 1, 2, 3
    ), counted AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             any_value(a.ln) AS la, any_value(b.ln) AS lb,
             SUM(least(a.cnt, b.cnt)) AS inter
      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
      WHERE abs(a.ln - b.ln) <= {_EDIT_D}
      GROUP BY 1, 2
    ), shorts AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM documents a JOIN documents b
        ON a.doc_id < b.doc_id
       AND abs(len(a.text) - len(b.text)) <= {_EDIT_D}
      WHERE greatest(len(a.text), len(b.text))
            <= {_EDIT_D} * {_EDIT_Q} + {_EDIT_Q} - 1
    ), cand AS (
      SELECT doc_a, doc_b FROM counted
      WHERE inter >= greatest(la, lb) - {_EDIT_Q} + 1
                     - {_EDIT_D} * {_EDIT_Q}
      UNION
      SELECT doc_a, doc_b FROM shorts
    )
    SELECT c.doc_a, c.doc_b,
           CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
    FROM cand c
    JOIN documents da ON da.doc_id = c.doc_a
    JOIN documents db ON db.doc_id = c.doc_b
    WHERE levenshtein(da.text, db.text) <= {_EDIT_D}
    """,
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-dup pairs at levenshtein <= 8
    (operators/dedup.py edit_distance_pairs): Ed-Join occurrence-prefix
    filtering over character 3-grams + a candidate-bounded codegen
    levenshtein verify — the typo/OCR-noise duplicate detector the
    token-level families miss the semantics of.  The oracle reproves
    the result through the independent Gravano count filter.
    """
    return dedup.edit_distance_pairs(
        load_table(spark, sf_dir, "documents"),
        max_dist=_EDIT_D,
        q=_EDIT_Q,
    )


def _sql_simhash() -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN substr(md5(tok), {j + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS v{j}"
        for j in range(16)
    )
    fp = " + ".join(f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(16))
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents
    ), votes AS (
      SELECT doc_id, {votes} FROM toks GROUP BY doc_id
    )
    SELECT doc_id, CAST({fp} AS INTEGER) AS simhash FROM votes
    """


@register("dedup_simhash", oracle=_sql_simhash())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprint per document."""
    return dedup.simhash_fingerprints(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_simhash_pairs",
    # Brute-force Hamming ball in the oracle vs pigeonhole-chunked
    # candidates in Spark: identical result sets prove the chunk scheme
    # is complete for max_hamming=2 (the round-1 two-half scheme missed
    # pairs differing once in each half and would FAIL this hash).
    oracle=f"""
    WITH fp AS ({_sql_simhash()})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs at SimHash Hamming distance ≤ 2 (3-chunk pigeonhole
    candidates + exact verify; linear bucket join, never all-pairs)."""
    return dedup.simhash_pairs(
        load_table(spark, sf_dir, "documents"), max_hamming=2
    )


# --------------------------------------------------------------------------
# Shared DuckDB fragments for embedding ops: double-widened vectors and the
# explicit sequential-style cosine (mirrors functions.vectors.flat_dot's
# left-associated d0..d{dim-1} accumulation — values are bit-identical).
# --------------------------------------------------------------------------
_SQL_EMB = "SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"
_SQL_COS = (
    "round(list_sum(list_transform(generate_series(1, len({a})), i -> {a}[i] * {b}[i]))"
    " / (sqrt(list_sum(list_transform({a}, x -> x * x)))"
    " * sqrt(list_sum(list_transform({b}, x -> x * x)))), 6)"
)

# Constants of the embedding index family, shared by Spark calls and oracle
# text.  Every registered query that consumes them now ALSO exposes them
# as keyword-only parameters defaulting to these values (VERDICT r04 #6)
# — overriding a call gives a live re-parameterization; the registered
# ORACLE text mirrors the defaults only.
_EMB_DIM = 64  # constant across all generated testdata SFs
_CENTROID_MODULUS = 50
_KMEANS_ITERS = 2
_ANN_QUERY_MODULUS = 100
# Multi-assignment width for the bucketed DEDUP index (pair recall at
# sf0.1: 0.152 plain → 0.450 with train=2 + spill=2; see
# operators/dedup.embedding_bucketed_pairs for the full measured table).
_DEDUP_SPILL = 2


def _sql_kmeans_ctes(
    dim: int = _EMB_DIM,
    seed_mod: int = _CENTROID_MODULUS,
    iters: int = _KMEANS_ITERS,
    quant: int = 1_000_000,
    src: str = "e",
) -> str:
    """CTE chain ending in ``cents(cid, cv)`` (cv a DOUBLE list) that
    mirrors operators.similarity.kmeans_centroids EXACTLY: seeds are
    vec_id % seed_mod, components quantize to round(x*quant) int64,
    assignment is rounded-cosine argmax with (cos DESC, cid ASC) ties,
    and each update is SUM // COUNT truncating integer division
    (DuckDB ``//`` == Spark ``div``, verified on negative operands).
    Expects a ``src``-named ``(vec_id, v)`` CTE in scope (``src``
    parameterized because some composite oracles already use ``e``).
    """
    ctes = [
        f"eq AS (SELECT vec_id, v, list_transform(v,"
        f" x -> CAST(round(x * {quant}) AS BIGINT)) AS vq FROM {src})",
        f"k0 AS (SELECT vec_id AS cid, vq AS cq FROM eq WHERE vec_id % {seed_mod} = 0)",
    ]
    prev = "k0"
    for t in range(1, iters + 1):
        d = f"{prev}d"
        cos = _SQL_COS.format(a="eq.v", b=f"{d}.cv")
        ctes.append(
            f"{d} AS (SELECT cid, list_transform(cq, x -> CAST(x AS DOUBLE)) AS cv"
            f" FROM {prev})"
        )
        ctes.append(
            f"a{t} AS (SELECT vec_id, cid FROM ("
            f"SELECT eq.vec_id, {d}.cid, row_number() OVER ("
            f"PARTITION BY eq.vec_id ORDER BY {cos} DESC, {d}.cid ASC) AS arnk "
            f"FROM eq CROSS JOIN {d}) WHERE arnk = 1)"
        )
        ctes.append(
            f"k{t} AS (SELECT cid, list(s ORDER BY i) AS cq FROM ("
            f"SELECT a{t}.cid, i.i AS i, SUM(eq.vq[i.i]) // COUNT(*) AS s "
            f"FROM a{t} JOIN eq USING (vec_id)"
            f" CROSS JOIN generate_series(1, {dim}) AS i(i) "
            f"GROUP BY a{t}.cid, i.i) GROUP BY cid)"
        )
        prev = f"k{t}"
    ctes.append(
        f"cents AS (SELECT cid, list_transform(cq, x -> CAST(x AS DOUBLE)) AS cv"
        f" FROM {prev})"
    )
    return ",\n    ".join(ctes)


_SQL_KMEANS_CTES = _sql_kmeans_ctes()


@register(
    "dedup_embedding_bucketed",
    # Identical deterministic IVF bucketing on both sides (k-means-trained
    # centroids seeded at vec_id%50, spill-2 multi-assignment with
    # (cos DESC, cid ASC) ties) — the scale path: no cartesian, pairs
    # scored only within shared buckets, DISTINCT because a pair can
    # share both of its spill buckets.
    oracle=f"""
    WITH e AS ({_SQL_EMB}),
    {_SQL_KMEANS_CTES},
    assign AS (
      SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, cents.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SQL_COS.format(a="e.v", b="cents.cv")} DESC,
                          cents.cid ASC
               ) AS arank
        FROM e CROSS JOIN cents
      ) WHERE arank <= {_DEDUP_SPILL}
    ), p AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
             {_SQL_COS.format(a="a.v", b="b.v")} AS cos_sim
      FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
    )
    SELECT * FROM p WHERE cos_sim >= 0.4
    """,
)
def dedup_embedding_bucketed(
    spark: SparkSession,
    sf_dir: str,
    *,
    centroid_modulus: int = _CENTROID_MODULUS,
    train_iters: int = _KMEANS_ITERS,
    spill: int = _DEDUP_SPILL,
) -> DataFrame:
    """IVF-bucketed embedding near-dup pairs — the 100 TB scale path
    (bucket self-join, no all-pairs cartesian), with k-means-trained
    centroids and spill-2 multi-assignment (pair recall 0.45 vs 0.15
    plain at sf0.1)."""
    return dedup.embedding_bucketed_pairs(
        load_table(spark, sf_dir, "embeddings"),
        threshold=0.4,
        centroid_modulus=centroid_modulus,
        train_iters=train_iters,
        spill=spill,
        cache_key=table_fingerprint(sf_dir, "embeddings"),
    )


@register(
    "dedup_embedding_recall",
    # Index-quality eval for the IVF-bucketed near-dup path: pair counts
    # for the brute-force cosine truth, the bucketed index, and their
    # overlap — one exact-int row (same shape as dedup_lsh_recall).
    # This is the ONLY registered consumer of the O(n²) brute-force
    # baseline, which is row-capped in the operator itself
    # (operators/dedup.py embedding_cosine_pairs max_rows gate) so no
    # registered query plans an unbounded all-pairs cartesian.
    oracle=f"""
    WITH e AS ({_SQL_EMB}),
    exact AS (
      SELECT vec_a, vec_b FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_SQL_COS.format(a="a.v", b="b.v")} AS cos_sim
        FROM e a JOIN e b ON a.vec_id < b.vec_id
      ) WHERE cos_sim >= 0.4
    ),
    {_SQL_KMEANS_CTES},
    assign AS (
      SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, cents.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SQL_COS.format(a="e.v", b="cents.cv")} DESC,
                          cents.cid ASC
               ) AS arank
        FROM e CROSS JOIN cents
      ) WHERE arank <= {_DEDUP_SPILL}
    ),
    bkt AS (
      SELECT DISTINCT vec_a, vec_b FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_SQL_COS.format(a="a.v", b="b.v")} AS cos_sim
        FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
      ) WHERE cos_sim >= 0.4
    )
    SELECT (SELECT COUNT(*) FROM exact) AS n_exact,
           (SELECT COUNT(*) FROM bkt) AS n_bucketed,
           (SELECT COUNT(*) FROM exact x JOIN bkt k
             ON x.vec_a = k.vec_a AND x.vec_b = k.vec_b) AS n_overlap
    """,
)
def dedup_embedding_recall(
    spark: SparkSession,
    sf_dir: str,
    *,
    centroid_modulus: int = _CENTROID_MODULUS,
    train_iters: int = _KMEANS_ITERS,
    spill: int = _DEDUP_SPILL,
) -> DataFrame:
    """Embedding-dedup index eval: pair counts for the brute-force cosine
    truth, the IVF-bucketed index, and their overlap — one exact-int row
    (recall = n_overlap / n_exact).  Replaces the former standalone
    brute-force result-set query ``dedup_embedding_cosine``."""
    # Each pair-set feeds BOTH its own count and the overlap join —
    # persist the (tiny) pair results so neither quadratic/bucketed
    # pipeline executes twice in the one action.  Scoped to the returned
    # frame: unpersisted when the caller drops its reference, so a
    # long-lived session does not accumulate cached blocks.
    exact = _emb_exact_pairs(spark, sf_dir, threshold=0.4).persist()
    # index side = the shared ingest-time semantic pair-graph build
    # (_emb_pair_graph, defined below) — also consumed by
    # dedup_multi_signal, so the eval amortizes the bucketing pass.
    bkt = (
        _emb_pair_graph(
            spark, sf_dir, threshold=0.4, centroid_modulus=centroid_modulus,
            train_iters=train_iters, spill=spill,
        )
        .select("vec_a", "vec_b")
        .persist()
    )
    overlap = exact.join(bkt, ["vec_a", "vec_b"])
    ret = (
        exact.agg(F.count("*").alias("n_exact"))
        .crossJoin(bkt.agg(F.count("*").alias("n_bucketed")))
        .crossJoin(overlap.agg(F.count("*").alias("n_overlap")))
    )
    return scope_caches(ret, exact, bkt)


@register(
    "dedup_lsh_recall",
    # Dedup-index eval: MinHash-LSH's found pairs vs the exact trigram-
    # Jaccard truth at the same threshold/shingling.  NOTE the two
    # methods are not configured identically (the exact path prunes
    # stop-shingles > freq cap; LSH hashes all shingles), so this also
    # measures that configured gap — n_exact/n_lsh/n_overlap as one row
    # of exact ints.
    oracle=f"""
    WITH {_SQL_NGRAM_PAIR_CTES},
    lsh AS (
      WITH sh2 AS (
        SELECT doc_id,
               list_distinct([array_to_string(t[i:i+2], ' ')
                              for i in generate_series(1, len(t) - 2)]) AS shingles
        FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents)
        WHERE len(t) >= 3
      ), e2 AS (
        SELECT doc_id, unnest(shingles) AS s FROM sh2
      ), mh AS (
        SELECT doc_id, {_sql_minhash_mins(_MINHASH_N)} FROM e2 GROUP BY doc_id
      ), bandk AS (
        SELECT doc_id, unnest([{_sql_band_keys(_MINHASH_BANDS, _MINHASH_R)}]) AS bkey
        FROM mh
      ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bandk a JOIN bandk b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
      )
      SELECT doc_a, doc_b FROM (
        SELECT doc_a, doc_b,
               CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
               / (len(sa.shingles) + len(sb.shingles)
                  - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard
        FROM cand
        JOIN sh2 sa ON cand.doc_a = sa.doc_id
        JOIN sh2 sb ON cand.doc_b = sb.doc_id
      ) WHERE jaccard >= 0.7
    )
    SELECT (SELECT COUNT(*) FROM pairs) AS n_exact,
           (SELECT COUNT(*) FROM lsh) AS n_lsh,
           (SELECT COUNT(*) FROM pairs p JOIN lsh l
             ON p.doc_a = l.doc_a AND p.doc_b = l.doc_b) AS n_overlap
    """,
)
def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-index eval: pair counts for exact trigram-Jaccard truth,
    MinHash-LSH found pairs, and their overlap — one exact-int row."""
    docs = load_table(spark, sf_dir, "documents")
    # Persist the (tiny) pair results: each feeds both its own count and
    # the overlap join, and without the cache each full dedup pipeline
    # executes twice in the one action (measured ~2× eval runtime).
    # All persists (including the operators' internal inverted-index /
    # candidate caches, handed out via ``caches``) are scoped to the
    # returned frame so they release when the caller drops it.
    caches: list[DataFrame] = []
    # Exact truth side = the shared ingest-time pair-graph build
    # (_dup_pair_graph, defined below) — identical params, so the five
    # consumer queries amortize one verification pass.
    exact = (
        _dup_pair_graph(spark, sf_dir, caches=caches)
        .select("doc_a", "doc_b")
        .persist()
    )
    lsh = (
        dedup.minhash_lsh_pairs(
            docs,
            threshold=0.7,
            shingle_n=3,
            num_hashes=_MINHASH_N,
            num_bands=_MINHASH_BANDS,
            caches=caches,
        )
        .select("doc_a", "doc_b")
        .persist()
    )
    overlap = exact.join(lsh, ["doc_a", "doc_b"])
    ret = (
        exact.agg(F.count("*").alias("n_exact"))
        .crossJoin(lsh.agg(F.count("*").alias("n_lsh")))
        .crossJoin(overlap.agg(F.count("*").alias("n_overlap")))
    )
    return scope_caches(ret, exact, lsh, *caches)


# --------------------------------------------------------------------------
# Training-data curation (sampling / packing / duplicate clusters)
# --------------------------------------------------------------------------

from ..operators import curation  # noqa: E402

# Per-language mixture rates (1/256 hex-threshold granularity; see
# curation._hex_threshold).  Kept as one dict so the Spark filter and
# the oracle CASE expression cannot drift.
_SAMPLE_RATES = {"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.25, "zh": 0.25}
_SQL_RATE_CASE = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN '{curation._hex_threshold(v)}'"
    for k, v in sorted(_SAMPLE_RATES.items())
) + " END"


@register(
    "curation_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang, source FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < {_SQL_RATE_CASE}
    """,
)
def curation_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based stratified sampling: per-language mixture
    rates, membership a pure function of doc_id (reproducible at any
    scale/partitioning — no RNG)."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.sample_by_hash(docs, _SAMPLE_RATES).select(
        "doc_id", "lang", "source"
    )


_PACK_BUDGET = 512


@register(
    "curation_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, source,
             CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT doc_id, lang, source, n_tokens,
           CAST(floor(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY lang, source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             / {_PACK_BUDGET}.0) AS BIGINT) AS pack_id
    FROM t
    """,
)
def curation_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chunk sequence packing ({_PACK_BUDGET}-token
    chunks per (lang, source) stratum) — the standard pretraining
    packing layout as a pure window expression."""
    return curation.pack_sequences(
        load_table(spark, sf_dir, "documents"), budget=_PACK_BUDGET
    )


# Transitive duplicate clusters over the trigram-Jaccard pair graph: the
# oracle computes the min-reachable-id fixpoint via a recursive
# reachability CTE (cluster_id == min reachable doc_id, self included).
# Shared by BOTH Spark algorithms (label propagation and star
# contraction) — they must produce the identical assignment.
_SQL_CC_ORACLE = f"""
    WITH RECURSIVE {_SQL_NGRAM_PAIR_CTES},
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
    )
    SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
    FROM reach GROUP BY u
    """


# Driver-side row cap for caching the verified pair graph.  Near-dup
# pair sets are orders of magnitude smaller than the corpus (sf0.1:
# ~10² pairs for 5k docs); the cap bounds the one-time collect so a
# pathological corpus (everything near-duplicate) degrades to the live
# distributed plan instead of an unbounded driver materialization.
_DUP_PAIR_CACHE_MAX_ROWS = 250_000
_DUP_PAIR_SCHEMA = "doc_a long, doc_b long, jaccard double"


def _dup_pair_graph(
    spark: SparkSession, sf_dir: str, caches: list[DataFrame] | None = None
) -> DataFrame:
    """The verified trigram-Jaccard near-dup pair graph — the shared
    ingest-time build consumed by five registered queries
    (dedup_clusters, dedup_clusters_star, dedup_multi_signal,
    curation_keep_best, dedup_lsh_recall's exact side).

    Cached via operators/buildcache (the trained-index precedent): the
    pair set is deterministic per (corpus fingerprint, n, threshold,
    freq-cap) — exact integer Jaccard, md5-free shingling — so the
    cached rows are bit-identical to rebuilding, and a production
    pipeline builds this graph once per ingest, not once per consumer.
    The build collects AT MOST ``_DUP_PAIR_CACHE_MAX_ROWS + 1`` rows
    (LIMIT-bounded, like the brute-force dedup gate); an over-cap pair
    set skips the cache and returns the live distributed plan — the
    100 TB-safe degradation.

    ``caches`` matters only on the LIVE path (cache miss + over-cap):
    it hands the operator's internal index persists to the caller for
    result-scoped release; on the cached path the returned frame is a
    LocalRelation and ``caches`` stays untouched.
    """
    ckey = (
        "dup_pairs",
        table_fingerprint(sf_dir, "documents"),
        3,
        0.7,
        _MAX_SHINGLE_FREQ,
    )
    hit = buildcache.lookup(ckey)
    if hit is not None:
        return buildcache.rehydrate(spark, hit, _DUP_PAIR_SCHEMA)
    own: list[DataFrame] = []
    pairs = dedup.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        threshold=0.7,
        n=3,
        max_shingle_freq=_MAX_SHINGLE_FREQ,
        caches=own,
    )
    rows = pairs.limit(_DUP_PAIR_CACHE_MAX_ROWS + 1).collect()
    if len(rows) > _DUP_PAIR_CACHE_MAX_ROWS:
        # Too large to hold driver-side: hand the internal persists to
        # the caller (live-plan consumption) and serve the plan itself.
        if caches is not None:
            caches.extend(own)
            return pairs
        return scope_caches(pairs, *own)
    # The build is complete — its internal inverted-index persists have
    # served their purpose; release them now instead of scoping to the
    # (already materialized) result.
    for c in own:
        c.unpersist(False)
    data = [(int(r["doc_a"]), int(r["doc_b"]), float(r["jaccard"])) for r in rows]
    buildcache.store(ckey, data)
    return buildcache.rehydrate(spark, data, _DUP_PAIR_SCHEMA)


_EMB_PAIR_SCHEMA = "vec_a long, vec_b long, cos_sim double"


def _emb_exact_pairs(
    spark: SparkSession, sf_dir: str, *, threshold: float = 0.4
) -> DataFrame:
    """Shared brute-force cosine TRUTH pair set (vec_a, vec_b) at
    ``threshold`` through the ingest-time build cache — the _ann_truth
    pattern applied to the pair-recall evals: the exact all-pairs truth
    is a pure deterministic function of the corpus, built once per
    fingerprint and read by BOTH consumers (dedup_embedding_recall and
    dedup_srp_recall) instead of each re-running the quadratic baseline
    per run.  LIMIT-gated like every truth build; an over-cap truth set
    degrades to the live (row-cap-gated) plan."""
    fp = table_fingerprint(sf_dir, "embeddings")
    ckey = ("emb_exact_pairs", fp, int(round(threshold * 1e6)))
    hit = buildcache.lookup(ckey)
    schema = "vec_a long, vec_b long"
    if hit is not None:
        return buildcache.rehydrate(spark, hit, schema)
    pairs = dedup.embedding_cosine_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=threshold
    ).select("vec_a", "vec_b")
    rows = pairs.limit(_DUP_PAIR_CACHE_MAX_ROWS + 1).collect()
    if len(rows) > _DUP_PAIR_CACHE_MAX_ROWS:
        return pairs
    data = [(int(r["vec_a"]), int(r["vec_b"])) for r in rows]
    buildcache.store(ckey, data)
    return buildcache.rehydrate(spark, data, schema)


def _emb_pair_graph(
    spark: SparkSession,
    sf_dir: str,
    *,
    threshold: float = 0.4,
    centroid_modulus: int = _CENTROID_MODULUS,
    train_iters: int = _KMEANS_ITERS,
    spill: int = _DEDUP_SPILL,
) -> DataFrame:
    """The semantic (IVF-bucketed embedding cosine) verified near-dup
    pair set — the second shared ingest-time pair-graph build, consumed
    by dedup_multi_signal and dedup_embedding_recall's index side.
    (dedup_embedding_bucketed itself stays on the live plan — it IS the
    operator's registered demonstration, exactly like dedup_ngram_jaccard
    vs _dup_pair_graph.)  Same buildcache contract, bounded driver
    collect, and over-cap live-plan degradation as :func:`_dup_pair_graph`;
    determinism comes from the rounded-cosine threshold over the
    deterministic (trained, spilled) bucketing."""
    fp = table_fingerprint(sf_dir, "embeddings")
    ckey = ("emb_pairs", fp, threshold, centroid_modulus, train_iters, spill)
    hit = buildcache.lookup(ckey)
    if hit is not None:
        return buildcache.rehydrate(spark, hit, _EMB_PAIR_SCHEMA)
    pairs = dedup.embedding_bucketed_pairs(
        load_table(spark, sf_dir, "embeddings"),
        threshold=threshold,
        centroid_modulus=centroid_modulus,
        train_iters=train_iters,
        spill=spill,
        cache_key=fp,
    )
    rows = pairs.limit(_DUP_PAIR_CACHE_MAX_ROWS + 1).collect()
    if len(rows) > _DUP_PAIR_CACHE_MAX_ROWS:
        return pairs
    data = [(int(r["vec_a"]), int(r["vec_b"]), float(r["cos_sim"])) for r in rows]
    buildcache.store(ckey, data)
    return buildcache.rehydrate(spark, data, _EMB_PAIR_SCHEMA)


@register("dedup_clusters", oracle=_SQL_CC_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster extraction: connected components (iterative
    min-label propagation) over the ngram-Jaccard near-dup pair graph.
    O(diameter) rounds — the right engine for clique-ish near-dup
    graphs (measured diameter 2-4)."""
    caches: list[DataFrame] = []
    pairs = _dup_pair_graph(spark, sf_dir, caches=caches)
    return scope_caches(
        curation.connected_components(pairs, caches=caches), *caches
    )


@register("dedup_clusters_star", oracle=_SQL_CC_ORACLE)
def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters by large-star/small-star contraction — the
    O(log n)-round engine for long-chain graphs at billion-edge scale;
    identical assignment to dedup_clusters (same oracle), supplementary
    dual outside the driver window."""
    caches: list[DataFrame] = []
    pairs = _dup_pair_graph(spark, sf_dir, caches=caches)
    return scope_caches(curation.cc_star(pairs, caches=caches), *caches)


@register(
    "dedup_multi_signal",
    # The real-world dedup composition: lexical near-dup pairs (trigram
    # Jaccard) UNION semantic near-dup pairs (trained+spilled bucketed
    # embedding cosine; vec_id ≡ doc_id in the testdata) → connected
    # components over the combined evidence graph.  Each signal catches
    # duplicates the other misses (paraphrases vs shared phrasing).
    oracle=f"""
    WITH RECURSIVE {_SQL_NGRAM_PAIR_CTES},
    emb AS ({_SQL_EMB}),
    {_sql_kmeans_ctes(src="emb")},
    eassign AS (
      SELECT vec_id, v, cid FROM (
        SELECT emb.vec_id, emb.v, cents.cid,
               row_number() OVER (
                 PARTITION BY emb.vec_id
                 ORDER BY {_SQL_COS.format(a="emb.v", b="cents.cv")} DESC,
                          cents.cid ASC
               ) AS arank
        FROM emb CROSS JOIN cents
      ) WHERE arank <= {_DEDUP_SPILL}
    ),
    epairs AS (
      SELECT DISTINCT vec_a, vec_b FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_SQL_COS.format(a="a.v", b="b.v")} AS cos_sim
        FROM eassign a JOIN eassign b
          ON a.cid = b.cid AND a.vec_id < b.vec_id
      ) WHERE cos_sim >= 0.4
    ),
    allp AS (
      SELECT doc_a, doc_b FROM pairs
      UNION
      SELECT vec_a AS doc_a, vec_b AS doc_b FROM epairs
    ),
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM allp
      UNION
      SELECT doc_b AS u, doc_a AS v FROM allp
    ),
    reach(u, v) AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
    )
    SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
    FROM reach GROUP BY u
    """,
)
def dedup_multi_signal(
    spark: SparkSession,
    sf_dir: str,
    *,
    centroid_modulus: int = _CENTROID_MODULUS,
    train_iters: int = _KMEANS_ITERS,
    spill: int = _DEDUP_SPILL,
) -> DataFrame:
    """Multi-signal duplicate clusters: lexical (trigram-Jaccard) and
    semantic (bucketed embedding cosine) near-dup edges unioned into one
    evidence graph, clustered by connected components — the composition
    a production dedup pipeline actually runs (each signal catches what
    the other misses).

    Scale shape: both pair generators are the audited linear index
    paths; the union is a distinct over two bounded pair sets; CC is
    the O(diameter) propagation engine (swap cc_star for long chains).
    """
    caches: list[DataFrame] = []
    text_pairs = _dup_pair_graph(spark, sf_dir, caches=caches).select(
        "doc_a", "doc_b"
    )
    emb_pairs = _emb_pair_graph(
        spark, sf_dir, threshold=0.4, centroid_modulus=centroid_modulus,
        train_iters=train_iters, spill=spill,
    ).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    # Persist the combined evidence graph: CC's symmetrization references
    # the edge frame twice (u→v ∪ v→u) and each label round re-reads it —
    # without this the ENTIRE two-signal pair generation (shingling +
    # bucketed cosine) re-executes per reference (measured the dominant
    # cost of this query).  Scoped to the result via scope_caches.
    # Star contraction, not propagation: the multi-signal union CHAINS
    # lexical and semantic edges (a text-dup of a semantic-dup of ...),
    # so component diameters exceed the single-signal clique-ish graphs
    # propagation is tuned for — star's O(log n) rounds measure ≥ as
    # fast here and degrade gracefully on longer chains.  Identical
    # cluster ids (property-tested equivalence; same oracle).
    edges = text_pairs.unionByName(emb_pairs).distinct().persist()
    return scope_caches(curation.cc_star(edges, caches=caches), edges, *caches)
# --------------------------------------------------------------------------
# Similarity search (SURVEY.md §2.6) over the embeddings table
# --------------------------------------------------------------------------

from ..operators import similarity  # noqa: E402

# DuckDB fragments _SQL_EMB / _SQL_COS and the k-means CTE chain are defined
# above (embedding-dedup section) and shared with this ANN family.


@register(
    "ann_brute_force_topk",
    oracle=f"""
    WITH e AS ({_SQL_EMB}),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e
          WHERE vec_id % {_ANN_QUERY_MODULUS} = 0),
    p AS (
      SELECT q.query_id, e.vec_id, {_SQL_COS.format(a="e.v", b="q.qv")} AS cos_sim
      FROM e JOIN q ON e.vec_id != q.query_id
    ), r AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM p
    )
    SELECT query_id, vec_id, cos_sim, rank FROM r WHERE rank <= 10
    """,
)
def ann_brute_force_topk(
    spark: SparkSession,
    sf_dir: str,
    *,
    query_modulus: int = _ANN_QUERY_MODULUS,
) -> DataFrame:
    """Exact cosine top-10 for the deterministic query set (vec_id%100==0)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = similarity.queries_by_modulus(emb, query_modulus)
    return similarity.brute_force_topk(emb, q, k=10)




def _cached_pair_truth(
    spark: SparkSession,
    ckey: tuple,
    build_fn,
) -> DataFrame:
    """Shared cache plumbing for the (query_id, vec_id) ground-truth
    builders: look up ``ckey`` in the ingest-time build cache, else run
    ``build_fn()`` (which returns the exact distributed truth plan),
    LIMIT-gate the collect, store, and return the cached frame.  An
    over-cap truth set degrades to the live distributed plan instead of
    an unbounded driver materialization."""
    hit = buildcache.lookup(ckey)
    if hit is not None:
        return buildcache.rehydrate(spark, hit, "query_id long, vec_id long")
    bf = build_fn().select("query_id", "vec_id")
    rows = bf.limit(_DUP_PAIR_CACHE_MAX_ROWS + 1).collect()
    if len(rows) > _DUP_PAIR_CACHE_MAX_ROWS:
        return bf
    data = [(int(r["query_id"]), int(r["vec_id"])) for r in rows]
    buildcache.store(ckey, data)
    return buildcache.rehydrate(spark, data, "query_id long, vec_id long")


def _ann_truth(
    spark: SparkSession,
    sf_dir: str,
    *,
    k: int = 10,
    query_modulus: int = _ANN_QUERY_MODULUS,
) -> DataFrame:
    """Exact brute-force top-``k`` ground truth for the ANN eval family
    — the ANN-benchmarks pattern: ground truth is COMPUTED ONCE per
    (corpus, query set, k) and every index eval reads the precomputed
    answer (SIFT/GIST ship theirs as files; here it lives in the
    ingest-time build cache, deterministic hence bit-identical to
    recomputation).  Six registered evals consume it: ann_ivf_recall,
    ann_ivf_spill_recall, ann_pq_recall, ann_pq_trained_recall,
    ann_ivfpq_recall, ann_label_purity.

    Bounded: nq·k rows (nq = n/query_modulus).  The collect is
    LIMIT-gated like the pair-graph builds; an over-cap query set
    (huge corpus at fixed modulus) degrades to the live distributed
    plan instead of an unbounded driver materialization.
    Output: (query_id, vec_id) — the exact top-k per query.
    """
    fp = table_fingerprint(sf_dir, "embeddings")
    ckey = ("ann_truth", fp, k, query_modulus)

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        q = similarity.queries_by_modulus(emb, query_modulus)
        return similarity.brute_force_topk(emb, q, k=k)

    return _cached_pair_truth(spark, ckey, build)


def _ann_range_truth(
    spark: SparkSession,
    sf_dir: str,
    *,
    threshold: float,
    query_modulus: int = _ANN_QUERY_MODULUS,
) -> DataFrame:
    """Exact radius (cos ≥ τ) ground truth for the range-search eval —
    the radius counterpart of :func:`_ann_truth`, built once per
    (corpus fingerprint, τ, query set) through the ingest-time cache.
    The truth set is data-bounded (matching pairs only), so the collect
    is LIMIT-gated with the same live-plan fallback.
    Output: (query_id, vec_id)."""
    fp = table_fingerprint(sf_dir, "embeddings")
    ckey = ("ann_range_truth", fp, int(round(threshold * 1e6)), query_modulus)

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        q = similarity.queries_by_modulus(emb, query_modulus)
        return similarity.brute_force_range(emb, q, threshold=threshold)

    return _cached_pair_truth(spark, ckey, build)


@register(
    "ann_ivf_topk",
    # Seed (data-point) centroids, NOT k-means-trained: measured at
    # sf0.01/sf0.1, trained mean-centroids LOWER query recall@10 here
    # (0.925→0.845 at sf0.1, equal nprobe and near-identical bucket
    # balance) while improving the near-dup pair bucketing — so training
    # is enabled for dedup_embedding_* and OFF for the query path, and
    # spill multi-assignment (ann_ivf_spill_recall) is the recall lever.
    oracle=f"""
    WITH e AS ({_SQL_EMB}),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e
          WHERE vec_id % {_ANN_QUERY_MODULUS} = 0),
    c AS (SELECT vec_id AS cid, v AS cv FROM e
          WHERE vec_id % {_CENTROID_MODULUS} = 0),
    assign AS (
      SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SQL_COS.format(a="e.v", b="c.cv")} DESC, c.cid ASC
               ) AS arank
        FROM e CROSS JOIN c
      ) WHERE arank = 1
    ), probes AS (
      SELECT query_id, qv, cid FROM (
        SELECT q.query_id, q.qv, c.cid,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_SQL_COS.format(a="q.qv", b="c.cv")} DESC, c.cid ASC
               ) AS prank
        FROM q CROSS JOIN c
      ) WHERE prank <= 2
    ), p AS (
      SELECT probes.query_id, assign.vec_id,
             {_SQL_COS.format(a="assign.v", b="probes.qv")} AS cos_sim
      FROM assign JOIN probes ON assign.cid = probes.cid
      WHERE assign.vec_id != probes.query_id
    ), r AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM p
    )
    SELECT query_id, vec_id, cos_sim, rank FROM r WHERE rank <= 10
    """,
)
def ann_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    *,
    query_modulus: int = _ANN_QUERY_MODULUS,
    centroid_modulus: int = _CENTROID_MODULUS,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-bucketed approximate top-10 (centroids vec_id%50==0, nprobe=2)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = similarity.queries_by_modulus(emb, query_modulus)
    return similarity.ivf_topk(
        emb, q, k=10, centroid_modulus=centroid_modulus, nprobe=nprobe,
        cache_key=table_fingerprint(sf_dir, "embeddings"),
    )


_RANGE_THRESHOLD = 0.3


@register(
    "ann_range_search",
    # Radius dual of ann_ivf_topk: same seed centroids, same nprobe=2
    # bucket restriction, but a cosine cutoff instead of a rank window —
    # the oracle swaps the final row_number for `cos_sim >= τ`.
    oracle=f"""
    WITH e AS ({_SQL_EMB}),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e
          WHERE vec_id % {_ANN_QUERY_MODULUS} = 0),
    c AS (SELECT vec_id AS cid, v AS cv FROM e
          WHERE vec_id % {_CENTROID_MODULUS} = 0),
    assign AS (
      SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SQL_COS.format(a="e.v", b="c.cv")} DESC, c.cid ASC
               ) AS arank
        FROM e CROSS JOIN c
      ) WHERE arank = 1
    ), probes AS (
      SELECT query_id, qv, cid FROM (
        SELECT q.query_id, q.qv, c.cid,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_SQL_COS.format(a="q.qv", b="c.cv")} DESC, c.cid ASC
               ) AS prank
        FROM q CROSS JOIN c
      ) WHERE prank <= 2
    )
    SELECT probes.query_id, assign.vec_id,
           {_SQL_COS.format(a="assign.v", b="probes.qv")} AS cos_sim
    FROM assign JOIN probes ON assign.cid = probes.cid
    WHERE assign.vec_id != probes.query_id
      AND {_SQL_COS.format(a="assign.v", b="probes.qv")} >= {_RANGE_THRESHOLD}
    """,
)
def ann_range_search(
    spark: SparkSession,
    sf_dir: str,
    *,
    threshold: float = _RANGE_THRESHOLD,
    query_modulus: int = _ANN_QUERY_MODULUS,
    centroid_modulus: int = _CENTROID_MODULUS,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-bucketed radius search: every vector with cos ≥ 0.3 of each
    query, probed through nprobe=2 buckets — the data-dependent-result
    dual of ann_ivf_topk (no ranking window at all)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = similarity.queries_by_modulus(emb, query_modulus)
    return similarity.ivf_range_search(
        emb,
        q,
        threshold=threshold,
        centroid_modulus=centroid_modulus,
        nprobe=nprobe,
        cache_key=table_fingerprint(sf_dir, "embeddings"),
    )


@register(
    "ann_range_recall",
    # Recall of the IVF radius search vs the exact threshold truth.  The
    # IVF answer verifies true cosines before its filter, so it is a
    # SUBSET of the truth — n_overlap == n_found is part of the checked
    # contract, and recall = n_found / n_truth.
    oracle=f"""
    WITH e AS ({_SQL_EMB}),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e
          WHERE vec_id % {_ANN_QUERY_MODULUS} = 0),
    truth AS (
      SELECT q.query_id, e.vec_id
      FROM e JOIN q ON e.vec_id != q.query_id
      WHERE {_SQL_COS.format(a="e.v", b="q.qv")} >= {_RANGE_THRESHOLD}
    ),
    c AS (SELECT vec_id AS cid, v AS cv FROM e
          WHERE vec_id % {_CENTROID_MODULUS} = 0),
    assign AS (
      SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SQL_COS.format(a="e.v", b="c.cv")} DESC, c.cid ASC
               ) AS arank
        FROM e CROSS JOIN c
      ) WHERE arank = 1
    ), probes AS (
      SELECT query_id, qv, cid FROM (
        SELECT q.query_id, q.qv, c.cid,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_SQL_COS.format(a="q.qv", b="c.cv")} DESC, c.cid ASC
               ) AS prank
        FROM q CROSS JOIN c
      ) WHERE prank <= 2
    ), found AS (
      SELECT probes.query_id, assign.vec_id
      FROM assign JOIN probes ON assign.cid = probes.cid
      WHERE assign.vec_id != probes.query_id
        AND {_SQL_COS.format(a="assign.v", b="probes.qv")}
              >= {_RANGE_THRESHOLD}
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM found) AS n_found,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM truth t JOIN found f
              ON t.query_id = f.query_id AND t.vec_id = f.vec_id)
             AS n_overlap
    """,
)
def ann_range_recall(
    spark: SparkSession,
    sf_dir: str,
    *,
    threshold: float = _RANGE_THRESHOLD,
    query_modulus: int = _ANN_QUERY_MODULUS,
    centroid_modulus: int = _CENTROID_MODULUS,
    nprobe: int = 2,
) -> DataFrame:
    """Radius-search recall eval: how many of the true cos ≥ 0.3 pairs
    the nprobe-bounded IVF range search returns (one summary row;
    n_overlap == n_found is part of the contract since the index
    verifies true cosines)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = similarity.queries_by_modulus(emb, query_modulus)
    truth = _ann_range_truth(
        spark, sf_dir, threshold=threshold, query_modulus=query_modulus
    )
    found = similarity.ivf_range_search(
        emb, q, threshold=threshold,
        centroid_modulus=centroid_modulus, nprobe=nprobe,
        cache_key=table_fingerprint(sf_dir, "embeddings"),
    ).select("query_id", "vec_id")
    n_truth = truth.agg(F.count("*").alias("n_truth"))
    n_found = found.agg(F.count("*").alias("n_found"))
    n_overlap = (
        truth.join(found, ["query_id", "vec_id"])
        .agg(F.count("*").alias("n_overlap"))
    )
    return n_truth.crossJoin(n_found).crossJoin(n_overlap)


@register(
    "embeddings_label_centroids",
    # Element-wise mean per label in exact 1e-6 integer units: each
    # component quantizes per-row (round(x·1e6) — float32-born doubles,
    # identical in both engines), sums as int64 (partial-aggregable,
    # partition-order-free) and derives the mean by `div` truncation.
    oracle="""
    SELECT label,
           CAST(dim_idx AS INTEGER) AS dim_idx,
           CAST(SUM(q) // COUNT(*) AS BIGINT) AS mean_e6,
           CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM (
      SELECT label, i - 1 AS dim_idx,
             CAST(round(v[i] * 1000000) AS BIGINT) AS q
      FROM (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
           LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) g
    )
    GROUP BY label, dim_idx
    """,
)
def embeddings_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (long form: one row per (label, dim)) —
    the class-prototype computation behind nearest-centroid classifiers
    and embedding-drift monitors, exact in 1e-6 integer units so the
    partial-aggregated distributed sum matches the oracle bit-for-bit.

    Scale shape: posexplode to (label, dim, component) then ONE
    partial-aggregable keyed sum — n·dim narrow rows, no wide
    row-matrix shuffle, no window; group count is |labels|·dim
    (bounded metadata, whatever the corpus size).
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    comp = emb.select(
        "label",
        F.posexplode("v").alias("dim_idx", "x"),
    ).select(
        "label",
        "dim_idx",
        F.round(F.col("x") * 1e6).cast("long").alias("q"),
    )
    return comp.groupBy("label", "dim_idx").agg(
        F.expr("sum(q) div count(*)").alias("mean_e6"),
        F.count("*").alias("n_vecs"),
    )



@register(
    "embeddings_silhouette",
    # Mirrors operators/similarity.centroid_silhouette exactly: same
    # 1e-6 component quantization, same div-truncated integer
    # centroids, exact int64 squared distances, IEEE sqrt/divide (both
    # correctly rounded), per-point re-quantization to e6 before the
    # div-truncated per-label mean.
    oracle="""
    WITH comp AS (
      SELECT vid, lbl, i - 1 AS dim_idx,
             CAST(round(v[i] * 1000000) AS BIGINT) AS q
      FROM (SELECT vec_id AS vid, label AS lbl,
                   embedding::DOUBLE[] AS v FROM embeddings),
           LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) g
    ), cent AS (
      SELECT lbl AS c_lbl, dim_idx, SUM(q) // COUNT(*) AS c_e6
      FROM comp GROUP BY lbl, dim_idx
    ), sq AS (
      SELECT c.vid, c.lbl, t.c_lbl,
             SUM((c.q - t.c_e6) * (c.q - t.c_e6)) AS d2
      FROM comp c JOIN cent t ON t.dim_idx = c.dim_idx
      GROUP BY 1, 2, 3
    ), per AS (
      SELECT vid, lbl,
             MIN(CASE WHEN c_lbl = lbl THEN d2 END) AS a2,
             MIN(CASE WHEN c_lbl <> lbl THEN d2 END) AS b2
      FROM sq GROUP BY vid, lbl
    ), scored AS (
      SELECT lbl,
        CASE WHEN b2 IS NULL THEN NULL
             WHEN greatest(sqrt(a2), sqrt(b2)) = 0 THEN 0
             ELSE CAST(round((sqrt(b2) - sqrt(a2))
                       / greatest(sqrt(a2), sqrt(b2)) * 1000000) AS BIGINT)
        END AS s_e6
      FROM per
    )
    SELECT lbl AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(COUNT(s_e6) AS BIGINT) AS n_scored,
           CAST(CASE WHEN COUNT(s_e6) > 0
                THEN SUM(s_e6) // COUNT(s_e6) END AS BIGINT)
             AS mean_sil_e6,
           CAST(MIN(s_e6) AS BIGINT) AS min_sil_e6,
           CAST(MAX(s_e6) AS BIGINT) AS max_sil_e6
    FROM scored GROUP BY lbl
    """,
)
def embeddings_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label simplified silhouette over the labeled embedding
    corpus (operators/similarity.py centroid_silhouette) -- the
    clustering-quality gate for a labeling/clustering stage: how
    separable each label's region is from its nearest rival, in one
    [-1e6, 1e6] integer score per label.
    """
    from ..operators import similarity

    return similarity.centroid_silhouette(
        load_table(spark, sf_dir, "embeddings")
    )


_CDRIFT_E6 = 3_000_000
# Drift-demo snapshot B: the odd-vec_id half with label 0's positive-
# first-component vectors DROPPED — an asymmetric, feature-space-
# correlated loss (a re-embedding or filter regression hitting one
# class), which must surface as label 0's centroid displacement while
# the other labels show only even/odd sampling noise.
_CDRIFT_B_KEEP = "NOT (label = 0 AND embedding[1] > 0)"  # 1-indexed SQL


@register(
    "embeddings_centroid_drift",
    # Mirrors the Spark plan exactly: per-(label, dim) div-truncated
    # integer centroids for both snapshots, exact int64 squared
    # displacement and reference norm, div-truncated e6 ratio.  A label
    # present on only one side flags unconditionally (full outer join),
    # like the profile gate's schema-change rule.
    oracle=f"""
    WITH comp AS (
      SELECT vec_id, label, i - 1 AS dim_idx,
             CAST(round(v[i] * 1000000) AS BIGINT) AS q
      FROM (SELECT vec_id, label, embedding,
                   embedding::DOUBLE[] AS v FROM embeddings),
           LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) g
      WHERE vec_id % 2 = 0 OR ({_CDRIFT_B_KEEP})
    ), ca AS (
      SELECT label, dim_idx, SUM(q) // COUNT(*) AS c,
             COUNT(*) AS n
      FROM comp WHERE vec_id % 2 = 0 GROUP BY 1, 2
    ), cb AS (
      SELECT label, dim_idx, SUM(q) // COUNT(*) AS c,
             COUNT(*) AS n
      FROM comp WHERE vec_id % 2 = 1 GROUP BY 1, 2
    ), j AS (
      SELECT COALESCE(a.label, b.label) AS label,
             any_value(a.n) AS n_a, any_value(b.n) AS n_b,
             SUM((a.c - b.c) * (a.c - b.c)) AS shift2,
             SUM(a.c * a.c) AS scale2
      FROM ca a FULL OUTER JOIN cb b
        ON a.label = b.label AND a.dim_idx = b.dim_idx
      GROUP BY 1
    )
    SELECT label,
           CAST(COALESCE(n_a, 0) AS BIGINT) AS n_a,
           CAST(COALESCE(n_b, 0) AS BIGINT) AS n_b,
           CAST(shift2 AS BIGINT) AS shift2,
           CAST(scale2 AS BIGINT) AS scale2,
           CAST(CASE WHEN shift2 IS NOT NULL AND scale2 > 0
                THEN (shift2 * 1000000) // scale2 END AS BIGINT)
             AS drift_e6,
           CASE WHEN shift2 IS NULL OR scale2 IS NULL OR scale2 = 0
                THEN TRUE
                ELSE (shift2 * 1000000) // scale2 > {_CDRIFT_E6}
           END AS drifted
    FROM j
    """,
)
def embeddings_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-snapshot embedding-centroid drift gate — the vector-space
    member of the drift trio (orders_profile_drift: schema/nulls/
    bounds, events_value_drift_bins: numeric distributions, this:
    embedding spaces): per label, the squared displacement of the
    class centroid between snapshots over the reference centroid's
    squared norm, in exact 1e-6 integer units.  Catches re-embedding
    regressions, class-correlated data loss, and upstream model swaps
    that row counts and value histograms cannot see.

    Demo snapshots: A = even vec_ids; B = odd vec_ids with label 0's
    positive-first-component vectors dropped (a class-correlated loss)
    — label 0 must flag while the other labels show only sampling
    noise.  Measured sf0.01: label 0 drift 3.93e6 vs ≤ 2.74e6
    elsewhere, threshold 3e6.

    Scale shape: two partial-aggregable (label × dim) centroid rollups
    (bounded metadata frames), one (label, dim)-keyed join, one
    per-label partial agg — no per-vector pairwise anything; the gate
    costs two corpus scans and O(|labels|·dim) everything-else.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(
        (F.col("vec_id") % 2 == 1)
        & ~(
            (F.col("label") == 0)
            & (F.get(F.col("embedding"), 0) > 0)
        )
    )

    def cent(df, side):
        comp = df.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "dim_idx", "x"
            ),
        ).select(
            "label",
            "dim_idx",
            F.round(F.col("x") * 1e6).cast("long").alias("q"),
        )
        return comp.groupBy("label", "dim_idx").agg(
            F.expr("sum(q) div count(*)").alias(f"c_{side}"),
            F.count("*").alias(f"n_{side}"),
        )

    j = (
        cent(a, "a")
        .withColumnsRenamed({"label": "label_a", "dim_idx": "dim_a"})
        .join(
            cent(b, "b").withColumnsRenamed(
                {"label": "label_b", "dim_idx": "dim_b"}
            ),
            (F.col("label_a") == F.col("label_b"))
            & (F.col("dim_a") == F.col("dim_b")),
            "full_outer",
        )
        .groupBy(F.coalesce("label_a", "label_b").alias("label"))
        .agg(
            F.any_value("n_a").alias("__na"),
            F.any_value("n_b").alias("__nb"),
            F.sum(
                (F.col("c_a") - F.col("c_b")) * (F.col("c_a") - F.col("c_b"))
            ).alias("__shift2"),
            F.sum(F.col("c_a") * F.col("c_a")).alias("__scale2"),
        )
    )
    drift = F.expr("(__shift2 * 1000000L) div __scale2")
    return j.select(
        "label",
        F.coalesce("__na", F.lit(0)).cast("long").alias("n_a"),
        F.coalesce("__nb", F.lit(0)).cast("long").alias("n_b"),
        F.col("__shift2").cast("long").alias("shift2"),
        F.col("__scale2").cast("long").alias("scale2"),
        F.when(
            F.col("__shift2").isNotNull() & (F.col("__scale2") > 0), drift
        )
        .cast("long")
        .alias("drift_e6"),
        F.when(
            F.col("__shift2").isNull()
            | F.col("__scale2").isNull()
            | (F.col("__scale2") == 0),
            F.lit(True),
        )
        .otherwise(drift > _CDRIFT_E6)
        .alias("drifted"),
    )


_MMR_K = 5
_MMR_CAND = 20
_MMR_LAM10 = 7


def _sql_mmr(k: int, n_cand: int, lam10: int) -> str:
    """Unrolled integer-exact MMR oracle: bounded candidate + pairwise
    CTEs, then one MATERIALIZED greedy round per rank — mirrors
    operators/similarity.py mmr_topk bit-for-bit (all comparisons on
    exact 1e-6 integer similarities)."""
    rounds = []
    prev = "sel1"
    for t in range(2, k + 1):
        rounds.append(f"""pick{t} AS MATERIALIZED (
      SELECT query_id, vec_id, rel_e6, CAST({t} AS BIGINT) AS mmr_rank FROM (
        SELECT c.query_id, c.vec_id, c.rel_e6,
               row_number() OVER (
                 PARTITION BY c.query_id
                 ORDER BY {lam10} * c.rel_e6 - {10 - lam10} * p.pen_e6 DESC,
                          c.vec_id ASC) AS rn
        FROM cand c
        JOIN (SELECT pr.query_id, pr.va, MAX(pr.sim_e6) AS pen_e6
              FROM pairs pr JOIN {prev} s
                ON s.query_id = pr.query_id AND s.vec_id = pr.vb
              GROUP BY pr.query_id, pr.va) p
          ON p.query_id = c.query_id AND p.va = c.vec_id
        WHERE NOT EXISTS (SELECT 1 FROM {prev} s
                          WHERE s.query_id = c.query_id
                            AND s.vec_id = c.vec_id)
      ) WHERE rn = 1
    ), sel{t} AS MATERIALIZED (
      SELECT * FROM {prev} UNION ALL SELECT * FROM pick{t}
    )""")
        prev = f"sel{t}"
    chain = ",\n    ".join(rounds)
    return f"""
    WITH e AS ({_SQL_EMB}),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e
          WHERE vec_id % {_ANN_QUERY_MODULUS} = 0),
    p AS (
      SELECT q.query_id, e.vec_id,
             {_SQL_COS.format(a="e.v", b="q.qv")} AS cos_sim
      FROM e JOIN q ON e.vec_id != q.query_id
    ), cand AS MATERIALIZED (
      SELECT query_id, vec_id,
             CAST(round(cos_sim * 1000000) AS BIGINT) AS rel_e6
      FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id
              ORDER BY cos_sim DESC, vec_id ASC) AS rank FROM p)
      WHERE rank <= {n_cand}
    ), pairs AS MATERIALIZED (
      SELECT a.query_id, a.vec_id AS va, b.vec_id AS vb,
             CAST(round({_SQL_COS.format(a="ea.v", b="eb.v")} * 1000000)
                  AS BIGINT) AS sim_e6
      FROM cand a
      JOIN cand b ON a.query_id = b.query_id AND a.vec_id != b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id
    ), sel1 AS MATERIALIZED (
      SELECT query_id, vec_id, rel_e6, CAST(1 AS BIGINT) AS mmr_rank FROM (
        SELECT query_id, vec_id, rel_e6,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel_e6 DESC, vec_id ASC) AS rn
        FROM cand) WHERE rn = 1
    ),
    {chain}
    SELECT query_id, vec_id, rel_e6, mmr_rank FROM {prev}
    """


def _mmr_candidates(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_cand: int,
    query_modulus: int,
) -> DataFrame | None:
    """Cached exact top-``n_cand`` candidate set for MMR — same
    ingest-time build-cache pattern as :func:`_ann_truth` (deterministic
    per (corpus, query set, n_cand), LIMIT-gated collect).  Returns None
    on an over-cap corpus; the caller falls back to the live plan."""
    fp = table_fingerprint(sf_dir, "embeddings")
    ckey = ("mmr_cand", fp, n_cand, query_modulus)
    schema = "query_id long, vec_id long, rel_e6 long"
    hit = buildcache.lookup(ckey)
    if hit is not None:
        return buildcache.rehydrate(spark, hit, schema)
    emb = load_table(spark, sf_dir, "embeddings")
    q = similarity.queries_by_modulus(emb, query_modulus)
    cand = similarity.brute_force_topk(emb, q, k=n_cand).select(
        "query_id",
        "vec_id",
        F.round(F.col("cos_sim") * 1e6).cast("long").alias("rel_e6"),
    )
    rows = cand.limit(_DUP_PAIR_CACHE_MAX_ROWS + 1).collect()
    if len(rows) > _DUP_PAIR_CACHE_MAX_ROWS:
        return None
    data = [(int(r["query_id"]), int(r["vec_id"]), int(r["rel_e6"])) for r in rows]
    buildcache.store(ckey, data)
    return buildcache.rehydrate(spark, data, schema)


def _mmr_pair_sims(
    spark: SparkSession,
    sf_dir: str,
    cand: DataFrame,
    *,
    n_cand: int,
    query_modulus: int,
) -> DataFrame | None:
    """Cached pairwise candidate similarities for MMR (nq·n_cand²
    bounded, deterministic — same build-cache contract as
    :func:`_mmr_candidates`)."""
    fp = table_fingerprint(sf_dir, "embeddings")
    ckey = ("mmr_pairs", fp, n_cand, query_modulus)
    schema = "query_id long, va long, vb long, sim_e6 long"
    hit = buildcache.lookup(ckey)
    if hit is not None:
        return buildcache.rehydrate(spark, hit, schema)
    emb = load_table(spark, sf_dir, "embeddings")
    q = similarity.queries_by_modulus(emb, query_modulus)
    # replicate the operator's bounded pair construction (identical for
    # any k at equal n_cand) rather than a throwaway mmr run
    from ..functions.vectors import embedding_dim, flat_dot

    dim = embedding_dim(emb)
    flat = similarity._flat(emb, "vec_id", "d", dim)
    cv = cand.select("query_id", "vec_id").join(flat, "vec_id")
    a = cv.select(
        "query_id",
        F.col("vec_id").alias("va"),
        F.col("nrm").alias("anrm"),
        *[F.col(f"d{i}").alias(f"a{i}") for i in range(dim)],
    )
    b = cv.select(
        "query_id",
        F.col("vec_id").alias("vb"),
        F.col("nrm").alias("bnrm"),
        *[F.col(f"d{i}").alias(f"b{i}") for i in range(dim)],
    )
    pair_cos = F.round(
        flat_dot("a", "b", dim) / (F.col("anrm") * F.col("bnrm")), 6
    )
    pairs = (
        a.join(b, ["query_id"])
        .filter(F.col("va") != F.col("vb"))
        .select(
            "query_id",
            "va",
            "vb",
            F.round(pair_cos * 1e6).cast("long").alias("sim_e6"),
        )
    )
    rows = pairs.limit(_DUP_PAIR_CACHE_MAX_ROWS + 1).collect()
    if len(rows) > _DUP_PAIR_CACHE_MAX_ROWS:
        return None
    data = [
        (int(r["query_id"]), int(r["va"]), int(r["vb"]), int(r["sim_e6"]))
        for r in rows
    ]
    buildcache.store(ckey, data)
    return buildcache.rehydrate(spark, data, schema)


@register("ann_mmr_topk", oracle=_sql_mmr(_MMR_K, _MMR_CAND, _MMR_LAM10))
def ann_mmr_topk(
    spark: SparkSession,
    sf_dir: str,
    *,
    k: int = _MMR_K,
    n_cand: int = _MMR_CAND,
    lam10: int = _MMR_LAM10,
    query_modulus: int = _ANN_QUERY_MODULUS,
) -> DataFrame:
    """Diversified retrieval: maximal-marginal-relevance top-5 per query
    from the exact top-20 candidates (λ=0.7), integer-scored so the
    greedy selection is bit-reproducible (see operators/similarity.py
    mmr_topk).  The candidate set is served from the ingest-time build
    cache (deterministic, bit-identical to recomputation)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = similarity.queries_by_modulus(emb, query_modulus)
    cand = _mmr_candidates(
        spark, sf_dir, n_cand=n_cand, query_modulus=query_modulus
    )
    pairs = (
        None
        if cand is None
        else _mmr_pair_sims(
            spark, sf_dir, cand, n_cand=n_cand, query_modulus=query_modulus
        )
    )
    return similarity.mmr_topk(
        emb, q, k=k, n_cand=n_cand, lam10=lam10,
        candidates=cand, pair_sims=pairs,
    )


_SQL_BF_TOPK = f"""
    WITH e AS ({{emb}}),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e
          WHERE vec_id % {_ANN_QUERY_MODULUS} = 0),
    p AS (
      SELECT q.query_id, e.vec_id, {{cos_eq}} AS cos_sim
      FROM e JOIN q ON e.vec_id != q.query_id
    ), r AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM p
    )
    SELECT query_id, vec_id FROM r WHERE rank <= 10
"""


@register(
    "ann_ivf_recall",
    # Index-quality metric: per-query overlap between the IVF answer and
    # the exact brute-force top-10 — the standard recall@k eval.  Both
    # result sets are recomputed from their existing oracle fragments
    # and intersected on (query_id, vec_id); counts are exact ints.
    oracle=f"""
    WITH bf AS ({_SQL_BF_TOPK.format(emb=_SQL_EMB, cos_eq=_SQL_COS.format(a="e.v", b="q.qv"))}),
    ivf AS (
      WITH e AS ({_SQL_EMB}),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e
            WHERE vec_id % {_ANN_QUERY_MODULUS} = 0),
      c AS (SELECT vec_id AS cid, v AS cv FROM e
            WHERE vec_id % {_CENTROID_MODULUS} = 0),
      assign AS (
        SELECT vec_id, v, cid FROM (
          SELECT e.vec_id, e.v, c.cid,
                 row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_SQL_COS.format(a="e.v", b="c.cv")} DESC, c.cid ASC
                 ) AS arank
          FROM e CROSS JOIN c
        ) WHERE arank = 1
      ), probes AS (
        SELECT query_id, qv, cid FROM (
          SELECT q.query_id, q.qv, c.cid,
                 row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY {_SQL_COS.format(a="q.qv", b="c.cv")} DESC, c.cid ASC
                 ) AS prank
          FROM q CROSS JOIN c
        ) WHERE prank <= 2
      ), p AS (
        SELECT probes.query_id, assign.vec_id,
               {_SQL_COS.format(a="assign.v", b="probes.qv")} AS cos_sim
        FROM assign JOIN probes ON assign.cid = probes.cid
        WHERE assign.vec_id != probes.query_id
      ), r AS (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
        FROM p
      )
      SELECT query_id, vec_id FROM r WHERE rank <= 10
    )
    SELECT bf.query_id, COUNT(*) AS n_overlap, 10 AS k
    FROM bf JOIN ivf ON bf.query_id = ivf.query_id AND bf.vec_id = ivf.vec_id
    GROUP BY bf.query_id
    """,
)
def ann_ivf_recall(
    spark: SparkSession,
    sf_dir: str,
    *,
    query_modulus: int = _ANN_QUERY_MODULUS,
    centroid_modulus: int = _CENTROID_MODULUS,
    nprobe: int = 2,
) -> DataFrame:
    """recall@10 of the IVF index vs the exact brute-force answer, per
    query — the eval harness an ANN index ships with.  Queries with zero
    overlap drop out (inner join) on both engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = similarity.queries_by_modulus(emb, query_modulus)
    bf = _ann_truth(spark, sf_dir, k=10, query_modulus=query_modulus)
    ivf = similarity.ivf_topk(
        emb, q, k=10, centroid_modulus=centroid_modulus, nprobe=nprobe,
        cache_key=table_fingerprint(sf_dir, "embeddings"),
    ).select("query_id", "vec_id")
    return (
        bf.join(ivf, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_overlap"), F.lit(10).cast("int").alias("k"))
    )


@register(
    "ann_ivf_spill_recall",
    # Same eval as ann_ivf_recall but the index multi-assigns every
    # vector to its 2 nearest centroids (IVF replication, arank <= 2 —
    # the standard boundary-loss fix).  Measured: recall@10 0.925 →
    # 0.995 at sf0.1 at equal nprobe, for a ×2 index size.  Candidates
    # reached through both shared buckets dedupe (DISTINCT) before the
    # rank on both engines.
    oracle=f"""
    WITH bf AS ({_SQL_BF_TOPK.format(emb=_SQL_EMB, cos_eq=_SQL_COS.format(a="e.v", b="q.qv"))}),
    ivf AS (
      WITH e AS ({_SQL_EMB}),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e
            WHERE vec_id % {_ANN_QUERY_MODULUS} = 0),
      c AS (SELECT vec_id AS cid, v AS cv FROM e
            WHERE vec_id % {_CENTROID_MODULUS} = 0),
      assign AS (
        SELECT vec_id, v, cid FROM (
          SELECT e.vec_id, e.v, c.cid,
                 row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_SQL_COS.format(a="e.v", b="c.cv")} DESC, c.cid ASC
                 ) AS arank
          FROM e CROSS JOIN c
        ) WHERE arank <= 2
      ), probes AS (
        SELECT query_id, qv, cid FROM (
          SELECT q.query_id, q.qv, c.cid,
                 row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY {_SQL_COS.format(a="q.qv", b="c.cv")} DESC, c.cid ASC
                 ) AS prank
          FROM q CROSS JOIN c
        ) WHERE prank <= 2
      ), p AS (
        SELECT DISTINCT probes.query_id, assign.vec_id,
               {_SQL_COS.format(a="assign.v", b="probes.qv")} AS cos_sim
        FROM assign JOIN probes ON assign.cid = probes.cid
        WHERE assign.vec_id != probes.query_id
      ), r AS (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
        FROM p
      )
      SELECT query_id, vec_id FROM r WHERE rank <= 10
    )
    SELECT bf.query_id, COUNT(*) AS n_overlap, 10 AS k
    FROM bf JOIN ivf ON bf.query_id = ivf.query_id AND bf.vec_id = ivf.vec_id
    GROUP BY bf.query_id
    """,
)
def ann_ivf_spill_recall(
    spark: SparkSession,
    sf_dir: str,
    *,
    query_modulus: int = _ANN_QUERY_MODULUS,
    centroid_modulus: int = _CENTROID_MODULUS,
    nprobe: int = 2,
    spill: int = 2,
) -> DataFrame:
    """recall@10 of the spill-2 (multi-assigned) IVF index vs brute
    force — quantifies what IVF replication buys at equal nprobe."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = similarity.queries_by_modulus(emb, query_modulus)
    bf = _ann_truth(spark, sf_dir, k=10, query_modulus=query_modulus)
    ivf = similarity.ivf_topk(
        emb, q, k=10, centroid_modulus=centroid_modulus, nprobe=nprobe,
        spill=spill, cache_key=table_fingerprint(sf_dir, "embeddings"),
    ).select("query_id", "vec_id")
    return (
        bf.join(ivf, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_overlap"), F.lit(10).cast("int").alias("k"))
    )


# PQ/ADC parameters (shared by the Spark call and oracle text).
_PQ_NSUB = 8
_PQ_W = _EMB_DIM // _PQ_NSUB
_PQ_RERANK = 50

# PQ distances in normalized space, expressed ALGEBRAICALLY on raw
# components + full-vector norms (mirrors operators/similarity.py's
# formulation, which avoids Catalyst's CollapseProject inlining a
# per-element v[i]/nrm projection into every reference).  Codewords are
# full seed vectors indexed 1-based at m*w+j — exactly the Spark side's
# flattened cw{j} == d{m*w+j-1} columns.
_SQL_PQ_SUBSQ = (
    f"list_sum(list_transform(generate_series(1, {_PQ_W}),"
    f" j -> nr.v[cb.m * {_PQ_W} + j] * nr.v[cb.m * {_PQ_W} + j]))"
)
_SQL_PQ_CSUBSQ = (
    f"list_sum(list_transform(generate_series(1, {_PQ_W}),"
    f" j -> cb.cw[cb.m * {_PQ_W} + j] * cb.cw[cb.m * {_PQ_W} + j]))"
)
_SQL_PQ_SUBDOT = (
    f"list_sum(list_transform(generate_series(1, {_PQ_W}),"
    f" j -> nr.v[cb.m * {_PQ_W} + j] * cb.cw[cb.m * {_PQ_W} + j]))"
)
_SQL_PQ_DIST = (
    f"round({_SQL_PQ_SUBSQ} / (nr.nrm * nr.nrm)"
    f" + {_SQL_PQ_CSUBSQ} / (cb.cnrm * cb.cnrm)"
    f" - 2.0 * {_SQL_PQ_SUBDOT} / (nr.nrm * cb.cnrm), 6)"
)
_SQL_PQ_QSUBDOT = (
    f"list_sum(list_transform(generate_series(1, {_PQ_W}),"
    f" j -> q.qv[cb.m * {_PQ_W} + j] * cb.cw[cb.m * {_PQ_W} + j]))"
)
_SQL_PQ_PDOT = (
    f"CAST(round({_SQL_PQ_QSUBDOT} / (q.qnrm * cb.cnrm)"
    f" * 1000000000000) AS BIGINT)"
)


@register(
    "ann_pq_recall",
    # recall@10 of the PQ/ADC index (8 subspaces, seed codebooks,
    # int64-quantized ADC sums, exact top-50 re-rank) vs brute force.
    # Every stage is deterministic and mirrored: rounded subspace L2
    # with (dist ASC, code ASC) ties, pdot quantized to 1e-12 units so
    # the n_sub-way SUM is associative on both engines.
    oracle=f"""
    WITH bf AS ({_SQL_BF_TOPK.format(emb=_SQL_EMB, cos_eq=_SQL_COS.format(a="e.v", b="q.qv"))}),
    pq AS (
      WITH e AS ({_SQL_EMB}),
      nr AS (
        SELECT vec_id, v,
               sqrt(list_sum(list_transform(v, y -> y * y))) AS nrm
        FROM e
      ),
      cb AS (
        SELECT m.m AS m, s.vec_id AS code, s.nrm AS cnrm, s.v AS cw
        FROM nr s CROSS JOIN generate_series(0, {_PQ_NSUB - 1}) AS m(m)
        WHERE s.vec_id % {_CENTROID_MODULUS} = 0
      ),
      enc AS (
        SELECT vec_id, m, code FROM (
          SELECT nr.vec_id, cb.m, cb.code,
                 row_number() OVER (
                   PARTITION BY nr.vec_id, cb.m
                   ORDER BY {_SQL_PQ_DIST} ASC, cb.code ASC) AS rnk
          FROM nr CROSS JOIN cb
        ) WHERE rnk = 1
      ),
      qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM nr
             WHERE vec_id % {_ANN_QUERY_MODULUS} = 0),
      lut AS (
        SELECT q.query_id, cb.m, cb.code, {_SQL_PQ_PDOT} AS pdot_e12
        FROM qn q CROSS JOIN cb
      ),
      cand AS (
        SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY adc_e12 DESC, vec_id ASC) AS arnk
          FROM (
            SELECT l.query_id, enc.vec_id, SUM(l.pdot_e12) AS adc_e12
            FROM enc JOIN lut l ON enc.m = l.m AND enc.code = l.code
            WHERE enc.vec_id != l.query_id
            GROUP BY l.query_id, enc.vec_id
          )
        ) WHERE arnk <= {_PQ_RERANK}
      ),
      qq AS (SELECT vec_id AS query_id, v AS qv FROM e
             WHERE vec_id % {_ANN_QUERY_MODULUS} = 0),
      rr AS (
        SELECT c.query_id, a.vec_id,
               {_SQL_COS.format(a="a.v", b="qq.qv")} AS cos_sim
        FROM cand c
        JOIN e a ON a.vec_id = c.vec_id
        JOIN qq ON qq.query_id = c.query_id
      ), r AS (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
        FROM rr
      )
      SELECT query_id, vec_id FROM r WHERE rank <= 10
    )
    SELECT bf.query_id, COUNT(*) AS n_overlap, 10 AS k
    FROM bf JOIN pq ON bf.query_id = pq.query_id AND bf.vec_id = pq.vec_id
    GROUP BY bf.query_id
    """,
)
def ann_pq_recall(
    spark: SparkSession,
    sf_dir: str,
    *,
    query_modulus: int = _ANN_QUERY_MODULUS,
    seed_modulus: int = _CENTROID_MODULUS,
) -> DataFrame:
    """recall@10 of the PQ/ADC compressed index (the third ANN family
    member: brute-force exact / IVF bucketed / PQ memory-compressed)
    with exact re-ranking of the top-{rerank} ADC candidates."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = similarity.queries_by_modulus(emb, query_modulus)
    bf = _ann_truth(spark, sf_dir, k=10, query_modulus=query_modulus)
    pq = similarity.pq_topk(
        emb, q, k=10, n_sub=_PQ_NSUB, seed_modulus=seed_modulus,
        rerank=_PQ_RERANK,
        cache_key=table_fingerprint(sf_dir, "embeddings"),
    ).select("query_id", "vec_id")
    return (
        bf.join(pq, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_overlap"), F.lit(10).cast("int").alias("k"))
    )


@register(
    "ann_ivfpq_recall",
    # recall@10 of the COMPOSED IVF-PQ index (PQ codes within IVF
    # buckets — the FAISS IVFx,PQy layout): probe 2 coarse centroids,
    # ADC-scan only the probed buckets' codes (4.9% of the corpus at
    # sf0.1 — ~20× scan reduction), exact top-50 re-rank.  Measured
    # recall@10 0.840 vs PQ-alone's 0.600 at equal rerank: the bucket
    # restriction filters ADC imposters out of the rerank window, so
    # the composition beats both halves.  Every stage deterministic and
    # mirrored (rounded cosines, (DESC, id ASC) ties, 1e-12 int ADC).
    oracle=f"""
    WITH bf AS ({_SQL_BF_TOPK.format(emb=_SQL_EMB, cos_eq=_SQL_COS.format(a="e.v", b="q.qv"))}),
    ivfpq AS (
      WITH e AS ({_SQL_EMB}),
      nr AS (
        SELECT vec_id, v,
               sqrt(list_sum(list_transform(v, y -> y * y))) AS nrm
        FROM e
      ),
      c AS (SELECT vec_id AS cid, v AS cv FROM e
            WHERE vec_id % {_CENTROID_MODULUS} = 0),
      assign AS (
        SELECT vec_id, cid FROM (
          SELECT nr.vec_id, c.cid,
                 row_number() OVER (
                   PARTITION BY nr.vec_id
                   ORDER BY {_SQL_COS.format(a="nr.v", b="c.cv")} DESC, c.cid ASC
                 ) AS arank
          FROM nr CROSS JOIN c
        ) WHERE arank = 1
      ),
      qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM nr
             WHERE vec_id % {_ANN_QUERY_MODULUS} = 0),
      probes AS (
        SELECT query_id, cid FROM (
          SELECT qn.query_id, c.cid,
                 row_number() OVER (
                   PARTITION BY qn.query_id
                   ORDER BY {_SQL_COS.format(a="qn.qv", b="c.cv")} DESC, c.cid ASC
                 ) AS prank
          FROM qn CROSS JOIN c
        ) WHERE prank <= 2
      ),
      cb AS (
        SELECT m.m AS m, s.vec_id AS code, s.nrm AS cnrm, s.v AS cw
        FROM nr s CROSS JOIN generate_series(0, {_PQ_NSUB - 1}) AS m(m)
        WHERE s.vec_id % {_CENTROID_MODULUS} = 0
      ),
      enc AS (
        SELECT vec_id, m, code FROM (
          SELECT nr.vec_id, cb.m, cb.code,
                 row_number() OVER (
                   PARTITION BY nr.vec_id, cb.m
                   ORDER BY {_SQL_PQ_DIST} ASC, cb.code ASC) AS rnk
          FROM nr CROSS JOIN cb
        ) WHERE rnk = 1
      ),
      lut AS (
        SELECT q.query_id, cb.m, cb.code, {_SQL_PQ_PDOT} AS pdot_e12
        FROM qn q CROSS JOIN cb
      ),
      candv AS (
        SELECT DISTINCT probes.query_id, assign.vec_id
        FROM assign JOIN probes ON assign.cid = probes.cid
        WHERE assign.vec_id != probes.query_id
      ),
      cand AS (
        SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY adc_e12 DESC, vec_id ASC) AS arnk
          FROM (
            SELECT cv.query_id, cv.vec_id, SUM(l.pdot_e12) AS adc_e12
            FROM candv cv
            JOIN enc ON enc.vec_id = cv.vec_id
            JOIN lut l ON l.query_id = cv.query_id
                      AND l.m = enc.m AND l.code = enc.code
            GROUP BY cv.query_id, cv.vec_id
          )
        ) WHERE arnk <= {_PQ_RERANK}
      ),
      rr AS (
        SELECT c.query_id, a.vec_id,
               {_SQL_COS.format(a="a.v", b="qn2.qv")} AS cos_sim
        FROM cand c
        JOIN e a ON a.vec_id = c.vec_id
        JOIN (SELECT vec_id AS query_id, v AS qv FROM e
              WHERE vec_id % {_ANN_QUERY_MODULUS} = 0) qn2
          ON qn2.query_id = c.query_id
      ), r AS (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
        FROM rr
      )
      SELECT query_id, vec_id FROM r WHERE rank <= 10
    )
    SELECT bf.query_id, COUNT(*) AS n_overlap, 10 AS k
    FROM bf JOIN ivfpq ON bf.query_id = ivfpq.query_id
                      AND bf.vec_id = ivfpq.vec_id
    GROUP BY bf.query_id
    """,
)
def ann_ivfpq_recall(
    spark: SparkSession,
    sf_dir: str,
    *,
    query_modulus: int = _ANN_QUERY_MODULUS,
    centroid_modulus: int = _CENTROID_MODULUS,
    nprobe: int = 2,
    spill: int = 1,
) -> DataFrame:
    """recall@10 of the composed IVF-PQ index (PQ codes within IVF
    buckets, ADC over probed buckets only, exact re-rank) vs brute
    force — the production ANN layout's eval.  Measured at sf0.1:
    0.840 vs PQ-alone 0.600 at equal rerank, scanning 4.9% of codes."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = similarity.queries_by_modulus(emb, query_modulus)
    bf = _ann_truth(spark, sf_dir, k=10, query_modulus=query_modulus)
    ivfpq = similarity.ivfpq_topk(
        emb, q, k=10, centroid_modulus=centroid_modulus, nprobe=nprobe,
        spill=spill, n_sub=_PQ_NSUB, seed_modulus=centroid_modulus,
        rerank=_PQ_RERANK,
        cache_key=table_fingerprint(sf_dir, "embeddings"),
    ).select("query_id", "vec_id")
    return (
        bf.join(ivfpq, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_overlap"), F.lit(10).cast("int").alias("k"))
    )


def _sql_pq_trained_cb_ctes(
    n_sub: int = _PQ_NSUB,
    w: int = _PQ_W,
    seed_mod: int = _CENTROID_MODULUS,
    iters: int = _KMEANS_ITERS,
    quant: int = 1_000_000,
) -> str:
    """CTE chain ending in ``cb(m, code, k)`` — per-subspace integer
    k-means PQ codebooks mirroring similarity.pq_codebooks_trained
    EXACTLY: normalized slices quantize to round(v[i]/nrm·quant) int64,
    assignment is pure-integer L2 argmin (ties code ASC), updates are
    SUM // COUNT truncating division.  Expects ``nr(vec_id, v, nrm)``.
    """
    ctes = []
    for m in range(n_sub):
        ctes.append(
            f"nq{m} AS (SELECT vec_id, list_transform(generate_series(1, {w}),"
            f" j -> CAST(round(v[{m * w} + j] / nrm * {quant}) AS BIGINT)) AS q"
            f" FROM nr)"
        )
        prev = f"s{m}0"
        ctes.append(
            f"s{m}0 AS (SELECT vec_id AS code, q AS k FROM nq{m}"
            f" WHERE vec_id % {seed_mod} = 0)"
        )
        for t in range(1, iters + 1):
            dist = (
                f"list_sum(list_transform(generate_series(1, {w}),"
                f" j -> (nq{m}.q[j] - {prev}.k[j])"
                f" * (nq{m}.q[j] - {prev}.k[j])))"
            )
            ctes.append(
                f"a{m}{t} AS (SELECT vec_id, code FROM ("
                f"SELECT nq{m}.vec_id, {prev}.code, row_number() OVER ("
                f"PARTITION BY nq{m}.vec_id"
                f" ORDER BY {dist} ASC, {prev}.code ASC) AS rnk "
                f"FROM nq{m} CROSS JOIN {prev}) WHERE rnk = 1)"
            )
            ctes.append(
                f"s{m}{t} AS (SELECT code, list(s ORDER BY j) AS k FROM ("
                f"SELECT a{m}{t}.code, j.j AS j,"
                f" SUM(nq{m}.q[j.j]) // COUNT(*) AS s "
                f"FROM a{m}{t} JOIN nq{m} USING (vec_id)"
                f" CROSS JOIN generate_series(1, {w}) AS j(j) "
                f"GROUP BY a{m}{t}.code, j.j) GROUP BY code)"
            )
            prev = f"s{m}{t}"
        ctes.append(f"cb{m} AS (SELECT {m} AS m, code, k FROM {prev})")
    ctes.append(
        "cb AS ("
        + " UNION ALL ".join(f"SELECT * FROM cb{m}" for m in range(n_sub))
        + ")"
    )
    return ",\n    ".join(ctes)


@register(
    "ann_pq_trained_recall",
    # recall@10 of PQ/ADC with TRAINED per-subspace codebooks — measured
    # 0.70→0.76 (sf0.01) / 0.60→0.635 (sf0.1) over the seed codebooks of
    # ann_pq_recall at identical rerank.  Training is zero-FP (integer
    # L2 assignment + truncating integer means on quantized normalized
    # slices), so both engines derive bit-identical codebooks.
    oracle=f"""
    WITH bf AS ({_SQL_BF_TOPK.format(emb=_SQL_EMB, cos_eq=_SQL_COS.format(a="e.v", b="q.qv"))}),
    pq AS (
      WITH e AS ({_SQL_EMB}),
      nr AS (
        SELECT vec_id, v,
               sqrt(list_sum(list_transform(v, y -> y * y))) AS nrm
        FROM e
      ),
      {_sql_pq_trained_cb_ctes()},
      nqall AS (
        SELECT vec_id, mm.m AS m,
               list_transform(generate_series(1, {_PQ_W}),
                 j -> CAST(round(v[mm.m * {_PQ_W} + j] / nrm * 1000000)
                      AS BIGINT)) AS q
        FROM nr CROSS JOIN generate_series(0, {_PQ_NSUB - 1}) AS mm(m)
      ),
      enc AS (
        SELECT vec_id, m, code FROM (
          SELECT nqall.vec_id, nqall.m, cb.code,
                 row_number() OVER (
                   PARTITION BY nqall.vec_id, nqall.m
                   ORDER BY list_sum(list_transform(generate_series(1, {_PQ_W}),
                       j -> (nqall.q[j] - cb.k[j]) * (nqall.q[j] - cb.k[j])))
                     ASC, cb.code ASC) AS rnk
          FROM nqall JOIN cb ON cb.m = nqall.m
        ) WHERE rnk = 1
      ),
      qn AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM nr
             WHERE vec_id % {_ANN_QUERY_MODULUS} = 0),
      lut AS (
        SELECT q.query_id, cb.m, cb.code,
               CAST(round(list_sum(list_transform(generate_series(1, {_PQ_W}),
                      j -> q.qv[cb.m * {_PQ_W} + j] * cb.k[j]))
                    / q.qnrm * 1000000) AS BIGINT) AS pdot_e6
        FROM qn q CROSS JOIN cb
      ),
      cand AS (
        SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY adc_e6 DESC, vec_id ASC) AS arnk
          FROM (
            SELECT l.query_id, enc.vec_id, SUM(l.pdot_e6) AS adc_e6
            FROM enc JOIN lut l ON enc.m = l.m AND enc.code = l.code
            WHERE enc.vec_id != l.query_id
            GROUP BY l.query_id, enc.vec_id
          )
        ) WHERE arnk <= {_PQ_RERANK}
      ),
      qq AS (SELECT vec_id AS query_id, v AS qv FROM e
             WHERE vec_id % {_ANN_QUERY_MODULUS} = 0),
      rr AS (
        SELECT c.query_id, a.vec_id,
               {_SQL_COS.format(a="a.v", b="qq.qv")} AS cos_sim
        FROM cand c
        JOIN e a ON a.vec_id = c.vec_id
        JOIN qq ON qq.query_id = c.query_id
      ), r AS (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
        FROM rr
      )
      SELECT query_id, vec_id FROM r WHERE rank <= 10
    )
    SELECT bf.query_id, COUNT(*) AS n_overlap, 10 AS k
    FROM bf JOIN pq ON bf.query_id = pq.query_id AND bf.vec_id = pq.vec_id
    GROUP BY bf.query_id
    """,
)
def ann_pq_trained_recall(
    spark: SparkSession,
    sf_dir: str,
    *,
    query_modulus: int = _ANN_QUERY_MODULUS,
    seed_modulus: int = _CENTROID_MODULUS,
) -> DataFrame:
    """recall@10 of the trained-codebook PQ/ADC index vs brute force —
    what per-subspace k-means buys over the seed codebooks."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = similarity.queries_by_modulus(emb, query_modulus)
    bf = _ann_truth(spark, sf_dir, k=10, query_modulus=query_modulus)
    pq = similarity.pq_topk_trained(
        emb, q, k=10, n_sub=_PQ_NSUB, seed_modulus=seed_modulus,
        train_iters=_KMEANS_ITERS, rerank=_PQ_RERANK, cache_key=table_fingerprint(sf_dir, "embeddings"),
    ).select("query_id", "vec_id")
    return (
        bf.join(pq, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_overlap"), F.lit(10).cast("int").alias("k"))
    )


# SQ8 parameters (shared by the Spark call and oracle text).
_SQ8_SHORTLIST = 30

# The SQ8 approximate stage replayed in SQL, ending in the exact top-10
# per query.  Every stage is integer-exact and mirrored against
# operators/similarity.sq8_topk: values enter the e6 domain
# (round(x·1e6) int64), the per-dim [mn, mx] train is one global
# min/max, code = (x−mn)·255 div (mx−mn), reconstruction = the bucket
# midpoint mn + (2·code+1)·(mx−mn) div 510 (all operands non-negative,
# so DuckDB's floor `//` == Spark's truncating `div`), and the
# approximate score is a 64-term int64 dot product — no float until the
# exact re-rank's rounded cosine, so the shortlist sets are identical.
# Shared SQ8 CTE fragment (expects ``e(vec_id, v)``): the e6 quantize,
# per-dim [mn, mx] train, midpoint reconstruction, and the e6 query
# block — consumed by both the full-scan (ann_sq8_recall) and the
# bucket-restricted (ann_ivfsq_recall) oracles.
_SQL_SQ8_COMMON = f"""xi AS (
      SELECT vec_id,
             list_transform(v, x -> CAST(round(x * 1000000) AS BIGINT)) AS xe
      FROM e
    ),
    mm AS (
      SELECT i, MIN(xe[i]) AS mn, MAX(xe[i]) AS mx
      FROM xi, generate_series(1, {_EMB_DIM}) AS t(i)
      GROUP BY i
    ),
    mml AS (
      SELECT list(mn ORDER BY i) AS mnl, list(mx ORDER BY i) AS mxl FROM mm
    ),
    recon AS (
      SELECT xi.vec_id,
             list_transform(generate_series(1, {_EMB_DIM}),
               i -> CASE WHEN mxl[i] = mnl[i] THEN mnl[i]
                    ELSE mnl[i]
                         + (2 * ((xe[i] - mnl[i]) * 255 // (mxl[i] - mnl[i])) + 1)
                           * (mxl[i] - mnl[i]) // 510 END) AS rv
      FROM xi, mml
    ),
    qx AS (
      SELECT vec_id AS query_id,
             list_transform(v, x -> CAST(round(x * 1000000) AS BIGINT)) AS qe
      FROM e WHERE vec_id % {_ANN_QUERY_MODULUS} = 0
    )"""

_SQL_SQ8_TOPK = f"""
    WITH e AS ({_SQL_EMB}),
    {_SQL_SQ8_COMMON},
    scored AS (
      SELECT q.query_id, r.vec_id,
             list_sum(list_transform(generate_series(1, {_EMB_DIM}),
               i -> q.qe[i] * r.rv[i])) AS ip
      FROM recon r JOIN qx q ON r.vec_id != q.query_id
    ),
    short AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id, row_number() OVER (
          PARTITION BY query_id ORDER BY ip DESC, vec_id ASC) AS rn
        FROM scored
      ) WHERE rn <= {_SQ8_SHORTLIST}
    ),
    qq AS (SELECT vec_id AS query_id, v AS qv FROM e
           WHERE vec_id % {_ANN_QUERY_MODULUS} = 0),
    rr AS (
      SELECT s.query_id, a.vec_id,
             {_SQL_COS.format(a="a.v", b="qq.qv")} AS cos_sim
      FROM short s
      JOIN e a ON a.vec_id = s.vec_id
      JOIN qq ON qq.query_id = s.query_id
    ), r AS (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM rr
    )
    SELECT query_id, vec_id FROM r WHERE rank <= 10
"""


@register(
    "ann_sq8_recall",
    # recall@10 of the SQ8 scalar-quantized index (1 byte/dim codes
    # over per-dimension [min, max] ranges, asymmetric int64 midpoint
    # scoring, exact top-30 re-rank) vs brute force — the fourth index
    # family next to brute force / IVF / PQ.  Measured: recall@10 =
    # 1.0 at sf0.001 and sf0.01 (8-bit per-dim fidelity nearly
    # preserves the exact ranking, so a 3×k shortlist already recovers
    # the full top-10 — the expected SQ8 regime).
    oracle=f"""
    WITH bf AS ({_SQL_BF_TOPK.format(emb=_SQL_EMB, cos_eq=_SQL_COS.format(a="e.v", b="q.qv"))}),
    sq8 AS ({_SQL_SQ8_TOPK})
    SELECT bf.query_id, COUNT(*) AS n_overlap, 10 AS k
    FROM bf JOIN sq8 ON bf.query_id = sq8.query_id AND bf.vec_id = sq8.vec_id
    GROUP BY bf.query_id
    """,
)
def ann_sq8_recall(
    spark: SparkSession,
    sf_dir: str,
    *,
    query_modulus: int = _ANN_QUERY_MODULUS,
    shortlist: int = _SQ8_SHORTLIST,
) -> DataFrame:
    """recall@10 of the SQ8 scalar-quantized index vs brute force —
    what a 1-byte/dim code scan (8× less IO than full vectors) plus a
    bounded exact re-rank gives up at a 3×k shortlist.

    Scale shape: the [min, max] train is ONE partial-aggregable pass to
    a broadcast row; encode/reconstruct are map-side; the scoring stage
    scans the narrow code view against the broadcast query set (same
    O(n·q) shape as brute force but over 8×-compressed data); re-rank
    touches full vectors for shortlist·q rows only.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = similarity.queries_by_modulus(emb, query_modulus)
    bf = _ann_truth(spark, sf_dir, k=10, query_modulus=query_modulus)
    sq = similarity.sq8_topk(
        emb, q, k=10, shortlist=shortlist,
        cache_key=table_fingerprint(sf_dir, "embeddings"),
    ).select("query_id", "vec_id")
    return (
        bf.join(sq, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_overlap"), F.lit(10).cast("int").alias("k"))
    )


@register(
    "ann_ivfsq_recall",
    # recall@10 of the COMPOSED IVF-SQ8 index (SQ8 codes within IVF
    # buckets — the FAISS IVFx,SQ8 layout next to ann_ivfpq_recall's
    # IVFx,PQy): probe 2 coarse centroids, int64-ADC over the probed
    # buckets' midpoint reconstructions only, exact top-30 re-rank.
    # SQ8's per-dimension fidelity makes the approximate ranking
    # near-exact, so the composition's recall equals the IVF probe
    # bound (ann_ivf_recall's value) while scanning 8x-narrower data.
    # Every stage deterministic and mirrored: same coarse assignment
    # (rounded cosine, arank=1), same probe rule, same exact-integer
    # SQ8 pipeline as ann_sq8_recall.
    oracle=f"""
    WITH bf AS ({_SQL_BF_TOPK.format(emb=_SQL_EMB, cos_eq=_SQL_COS.format(a="e.v", b="q.qv"))}),
    ivfsq AS (
      WITH e AS ({_SQL_EMB}),
      {_SQL_SQ8_COMMON},
      c AS (SELECT vec_id AS cid, v AS cv FROM e
            WHERE vec_id % {_CENTROID_MODULUS} = 0),
      assign AS (
        SELECT vec_id, cid FROM (
          SELECT e.vec_id, c.cid,
                 row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_SQL_COS.format(a="e.v", b="c.cv")} DESC, c.cid ASC
                 ) AS arank
          FROM e CROSS JOIN c
        ) WHERE arank = 1
      ),
      qn AS (SELECT vec_id AS query_id, v AS qv FROM e
             WHERE vec_id % {_ANN_QUERY_MODULUS} = 0),
      probes AS (
        SELECT query_id, cid FROM (
          SELECT qn.query_id, c.cid,
                 row_number() OVER (
                   PARTITION BY qn.query_id
                   ORDER BY {_SQL_COS.format(a="qn.qv", b="c.cv")} DESC, c.cid ASC
                 ) AS prank
          FROM qn CROSS JOIN c
        ) WHERE prank <= 2
      ),
      scored AS (
        SELECT p.query_id, a.vec_id,
               list_sum(list_transform(generate_series(1, {_EMB_DIM}),
                 i -> qx.qe[i] * r.rv[i])) AS ip
        FROM assign a
        JOIN probes p ON p.cid = a.cid AND a.vec_id != p.query_id
        JOIN recon r ON r.vec_id = a.vec_id
        JOIN qx ON qx.query_id = p.query_id
      ),
      short AS (
        SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id, row_number() OVER (
            PARTITION BY query_id ORDER BY ip DESC, vec_id ASC) AS rn
          FROM scored
        ) WHERE rn <= {_SQ8_SHORTLIST}
      ),
      rr AS (
        SELECT s.query_id, a.vec_id,
               {_SQL_COS.format(a="a.v", b="qn.qv")} AS cos_sim
        FROM short s
        JOIN e a ON a.vec_id = s.vec_id
        JOIN qn ON qn.query_id = s.query_id
      ), r AS (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
        FROM rr
      )
      SELECT query_id, vec_id FROM r WHERE rank <= 10
    )
    SELECT bf.query_id, COUNT(*) AS n_overlap, 10 AS k
    FROM bf JOIN ivfsq ON bf.query_id = ivfsq.query_id
                      AND bf.vec_id = ivfsq.vec_id
    GROUP BY bf.query_id
    """,
)
def ann_ivfsq_recall(
    spark: SparkSession,
    sf_dir: str,
    *,
    query_modulus: int = _ANN_QUERY_MODULUS,
    centroid_modulus: int = _CENTROID_MODULUS,
    nprobe: int = 2,
    shortlist: int = _SQ8_SHORTLIST,
) -> DataFrame:
    """recall@10 of the composed IVF-SQ8 index vs brute force — the
    scan shrinks to the probed buckets AND every scanned vector is a
    1-byte/dim code, with recall bounded by the IVF probe alone (SQ8's
    per-dim fidelity is near-lossless at a 3x-k shortlist)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = similarity.queries_by_modulus(emb, query_modulus)
    bf = _ann_truth(spark, sf_dir, k=10, query_modulus=query_modulus)
    sq = similarity.ivfsq_topk(
        emb, q, k=10, centroid_modulus=centroid_modulus, nprobe=nprobe,
        shortlist=shortlist,
        cache_key=table_fingerprint(sf_dir, "embeddings"),
    ).select("query_id", "vec_id")
    return (
        bf.join(sq, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_overlap"), F.lit(10).cast("int").alias("k"))
    )


_SEMDECON_TAU = 0.25  # cosine gate; flags 61/495 corpus vectors at sf0.01


@register(
    "curation_semantic_decontaminate",
    # Embedding-space eval-leakage gate mirrored exactly: the same
    # rounded cosine per (corpus, benchmark) pair, MAX per corpus
    # vector (identical rounded doubles on both engines, so the MAX
    # and the threshold flag are bit-stable).
    oracle=f"""
    WITH e AS ({_SQL_EMB}),
    bench AS (SELECT vec_id, v FROM e
              WHERE vec_id % {_ANN_QUERY_MODULUS} = 0),
    corpus AS (SELECT vec_id, v FROM e
               WHERE vec_id % {_ANN_QUERY_MODULUS} <> 0),
    s AS (
      SELECT c.vec_id, MAX({_SQL_COS.format(a="c.v", b="b.v")}) AS max_cos
      FROM corpus c CROSS JOIN bench b GROUP BY 1
    )
    SELECT vec_id, max_cos, max_cos >= {_SEMDECON_TAU} AS contaminated
    FROM s
    """,
)
def curation_semantic_decontaminate(
    spark: SparkSession,
    sf_dir: str,
    *,
    threshold: float = _SEMDECON_TAU,
    bench_modulus: int = _ANN_QUERY_MODULUS,
) -> DataFrame:
    """Semantic benchmark decontamination (operators/similarity.py
    semantic_decontaminate): every corpus embedding scored against the
    bounded benchmark set (the vec_id % 100 stand-in), flagged when
    its max cosine reaches τ = 0.25 — the embedding-space complement
    of the n-gram `curation_decontaminate` gate, catching paraphrased
    eval leakage that shares no n-grams.

    Scale shape: the benchmark side is bounded → broadcast; scoring is
    one map-side O(n·|bench|) pass + a partial-aggregable MAX per
    corpus vector — the corpus never shuffles scored pairs.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") % bench_modulus != 0)
    refs = emb.filter(F.col("vec_id") % bench_modulus == 0).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return similarity.semantic_decontaminate(
        corpus, refs, threshold=threshold
    )


@register(
    "ann_label_purity",
    # Embedding-quality diagnostic: does the vector space respect the
    # labels?  For each query, how many of its exact top-10 cosine
    # neighbors share the query's label — the kNN consistency eval a
    # training-data pipeline runs before trusting an embedding column
    # for clustering/dedup decisions.  Exact ints, reuses the
    # brute-force truth fragment.
    oracle=f"""
    WITH bf AS ({_SQL_BF_TOPK.format(emb=_SQL_EMB, cos_eq=_SQL_COS.format(a="e.v", b="q.qv"))})
    SELECT bf.query_id,
           CAST(COUNT(*) FILTER (WHERE nl.label = ql.label) AS BIGINT)
             AS n_same_label,
           10 AS k
    FROM bf
    JOIN embeddings nl ON nl.vec_id = bf.vec_id
    JOIN embeddings ql ON ql.vec_id = bf.query_id
    GROUP BY bf.query_id
    """,
)
def ann_label_purity(
    spark: SparkSession,
    sf_dir: str,
    *,
    query_modulus: int = _ANN_QUERY_MODULUS,
) -> DataFrame:
    """kNN label consistency: per query, how many exact top-10 cosine
    neighbors share the query's label.

    Scale shape: the neighbor set (q·10 rows) is bounded → broadcast
    into both label joins; the corpus-sized label table never shuffles.
    """
    bf = _ann_truth(spark, sf_dir, k=10, query_modulus=query_modulus)
    lab = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    nl = lab.select("vec_id", F.col("label").alias("n_label"))
    ql = lab.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    return (
        nl.join(F.broadcast(bf), "vec_id")
        .join(
            ql.join(
                F.broadcast(bf.select("query_id").distinct()), "query_id"
            ),
            "query_id",
        )
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(F.col("n_label") == F.col("q_label"), 1).otherwise(0)
            ).cast("long").alias("n_same_label"),
            F.lit(10).cast("int").alias("k"),
        )
    )


# --------------------------------------------------------------------------
# Text analysis (SURVEY.md §2.6) over the documents table
# --------------------------------------------------------------------------

from ..operators import text as text_ops  # noqa: E402

_SQL_STOP = "['" + "', '".join(text_ops.STOPWORDS) + "']"

# Integer-exact quality score in 1e-6 units over a token-array column `t`
# — the DuckDB twin of the `quality_e6` expression in operators/text.py
# text_stats (min(n,20)·20000 + distinct·3e5 div n + (n-stop)·3e5 div n;
# `//` is DuckDB's integer division, Spark's `div`).  No double arithmetic
# on either side, so no ULP boundary for the engines to disagree on.
_SQL_QE6 = (
    "(least(len(t), 20) * 20000"
    " + (len(list_distinct(t)) * 300000) // len(t)"
    " + ((len(t) - len(list_filter(t, x -> list_contains("
    f"{_SQL_STOP}, x)))) * 300000) // len(t))"
)


@register(
    "text_stats",
    oracle=f"""
    WITH s AS (SELECT doc_id, text, {_SQL_TOKENS} AS t FROM documents)
    SELECT doc_id,
           length(text) AS n_chars,
           CAST(len(t) AS BIGINT) AS n_tokens,
           round(CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t), 6)
             AS avg_token_len,
           round(CAST(len(list_filter(t, x -> list_contains({_SQL_STOP}, x))) AS DOUBLE) / len(t), 6)
             AS stopword_ratio,
           CAST({_SQL_QE6} AS BIGINT) AS quality_e6,
           CAST({_SQL_QE6} AS DOUBLE) / 1000000.0 AS quality_score
    FROM s
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality statistics (length/diversity/stopword blend)."""
    return text_ops.text_stats(load_table(spark, sf_dir, "documents"))


@register(
    "text_token_counts",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_SQL_TOKENS}) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '{text_ops.BPE_PATTERN}')) AS BIGINT)
             AS bpe_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_llm_tokens
    FROM documents
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace / BPE-ish regex / chars-per-4 token counts."""
    return text_ops.token_counts(load_table(spark, sf_dir, "documents"))


def _sql_lang_id() -> str:
    langs = sorted(text_ops.LANG_MARKERS)
    hits = ", ".join(
        "len(list_filter(t, x -> list_contains(['"
        + "', '".join(text_ops.LANG_MARKERS[l])
        + "'], x))) AS " + l
        for l in langs
    )
    best = "greatest(" + ", ".join(langs) + ")"
    cases = " ".join(
        f"WHEN {l} = best THEN '{l}'" for l in langs
    )
    return f"""
    WITH s AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
    h AS (SELECT doc_id, {hits} FROM s),
    b AS (SELECT *, {best} AS best FROM h)
    SELECT doc_id,
           CASE WHEN best = 0 THEN 'und' {cases} ELSE 'und' END AS lang_pred,
           CAST(best AS BIGINT) AS lang_hits
    FROM b
    """


@register("text_language_id", oracle=_sql_lang_id())
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic."""
    return text_ops.language_id(load_table(spark, sf_dir, "documents"))


@register(
    "text_fingerprints",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in generate_series(1, len(t) - 2)]) AS shingles
      FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents)
    )
    SELECT DISTINCT doc_id, fp FROM (
      SELECT doc_id,
             unnest(list_filter(list_transform(shingles, s -> md5(s)),
                                h -> substr(h, 1, 1) IN ('0', '1'))) AS fp
      FROM sh
    )
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOD-p shingle fingerprints (winnowing-lite content sketch)."""
    return text_ops.fingerprints(load_table(spark, sf_dir, "documents"))


@register(
    "corpus_report",
    # Same integer-exact quality blend as text_stats, rolled up per
    # (lang, source); avg via integer division (// == Spark div).
    oracle=f"""
    WITH s AS (
      SELECT lang, source, text, {_SQL_TOKENS} AS t FROM documents
    ), q AS (
      SELECT lang, source, text,
             CAST(len(t) AS BIGINT) AS n_tokens,
             CAST({_SQL_QE6} AS BIGINT) AS q_e6
      FROM s
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_unique_texts,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(SUM(q_e6) // COUNT(*) AS BIGINT) AS avg_quality_e6
    FROM q GROUP BY lang, source
    """,
)
def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) corpus health rollup: doc counts, dup signal,
    token volume, mean quality in exact 1e-6 units."""
    return text_ops.corpus_report(load_table(spark, sf_dir, "documents"))


@register(
    "text_tfidf_top_terms",
    # Integer idf surrogate (1e6*N div df) on both sides — exact integer
    # division, no transcendental ln to disagree on (operators/text.py
    # docstring).
    oracle=f"""
    WITH e AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM e GROUP BY doc_id, term),
    dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    s AS (
      SELECT doc_id, term, tf, df, tf * ((1000000 * n_docs) // df) AS tfidf_e6
      FROM tf JOIN dfx USING (term) CROSS JOIN n
    ), r AS (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf_e6 DESC, term ASC) AS rank
      FROM s
    )
    SELECT doc_id, term, tf, df, tfidf_e6, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 5
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 TF-IDF terms (corpus-statistics ranking)."""
    return text_ops.tfidf_top_terms(load_table(spark, sf_dir, "documents"), k=5)


@register(
    "text_repetition_stats",
    # Gopher-style repeated-ngram signals, exact-int ratios (div // on
    # both sides); zero-bigram docs surface with zero counts via the
    # left join.
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
    bg AS (
      SELECT doc_id, unnest([array_to_string(t[i:i+1], ' ')
                             for i in generate_series(1, len(t) - 1)]) AS bg
      FROM toks
    ),
    per_bg AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg),
    per_doc AS (
      SELECT doc_id, SUM(c) AS nb, MAX(c) AS topc,
             SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS rep
      FROM per_bg GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(nb, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(topc, 0) AS BIGINT) AS top_bigram_count,
           CAST(COALESCE((rep * 1000000) // nb, 0) AS BIGINT) AS rep_bigram_e6
    FROM documents d LEFT JOIN per_doc ON d.doc_id = per_doc.doc_id
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-bigram boilerplate signals (Gopher-style repetition
    filter inputs) per document."""
    return text_ops.repetition_stats(load_table(spark, sf_dir, "documents"))


@register(
    "text_shared_spans",
    # Cross-document repeated 5-gram spans (boilerplate/template
    # detection — the distributed stand-in for suffix-array substring
    # dedup): per doc, total span positions, positions whose span
    # occurs in >= 2 distinct docs, and the exact-integer boilerplate
    # ratio.  1096/23995 spans are shared at sf0.01, so the signal is
    # live on this corpus.
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS tok FROM documents),
    sh AS (
      SELECT doc_id, array_to_string(tok[i:i+4], ' ') AS s
      FROM t, LATERAL (SELECT unnest(range(1, len(tok) - 3)) AS i) g
    ),
    shared AS (
      SELECT s FROM (
        SELECT s, COUNT(DISTINCT doc_id) AS df FROM sh GROUP BY s
      ) WHERE df >= 2
    ),
    per_total AS (SELECT doc_id, COUNT(*) AS n_spans FROM sh GROUP BY doc_id),
    per_shared AS (
      SELECT sh.doc_id, COUNT(*) AS n_shared_spans
      FROM sh JOIN shared ON sh.s = shared.s GROUP BY sh.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(n_spans, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(n_shared_spans, 0) AS BIGINT) AS n_shared_spans,
           CAST(COALESCE((n_shared_spans * 1000000) // n_spans, 0)
                AS BIGINT) AS boilerplate_e6
    FROM documents d
    LEFT JOIN per_total USING (doc_id)
    LEFT JOIN per_shared USING (doc_id)
    """,
)
def text_shared_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Across-document repeated-span (boilerplate) stats per document —
    complements text_repetition_stats (within-document repetition)."""
    return text_ops.shared_span_stats(
        load_table(spark, sf_dir, "documents"), n=5, min_df=2
    )


def _sql_pii_pattern(name: str) -> str:
    return next(p for n, p, _ in text_ops.PII_PATTERNS if n == name)


def _sql_pii_clean() -> str:
    expr = "t"
    for _, pat, rep in text_ops.PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    return expr


@register(
    "text_pii_scrub",
    # Counts + redaction over a deterministically PII-enriched corpus
    # (synthetic.SQL_PII_TEXT mirrors plans/synthetic.pii_enriched_documents
    # exactly).  The clean text is hashed, so the oracle verifies the
    # REDACTION — replacement strings, order, non-overlap — not just the
    # detection counts.  Patterns are the Java-regex/RE2 common subset
    # (operators/text.py PII_PATTERNS) so both engines match identically;
    # DuckDB regexp_replace needs the explicit 'g' flag to mirror Spark's
    # replace-all default.
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {synthetic.SQL_PII_TEXT} AS t FROM documents
    ), scrub AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, '{_sql_pii_pattern("email")}'))
                  AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(t, '{_sql_pii_pattern("phone")}'))
                  AS BIGINT) AS n_phones,
             CAST(len(regexp_extract_all(t, '{_sql_pii_pattern("id")}'))
                  AS BIGINT) AS n_ids,
             CAST(len(regexp_extract_all(t, '{_sql_pii_pattern("ip")}'))
                  AS BIGINT) AS n_ips,
             {_sql_pii_clean()} AS clean
      FROM base
    )
    SELECT doc_id, n_emails, n_phones, n_ids, n_ips,
           n_emails + n_phones + n_ids + n_ips AS pii_total,
           CAST(length(clean) AS BIGINT) AS clean_len,
           md5(clean) AS clean_md5
    FROM scrub
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact over the deterministically enriched corpus —
    the privacy pass of the curation pipeline (shuffle-free map)."""
    docs = synthetic.pii_enriched_documents(
        load_table(spark, sf_dir, "documents")
    )
    return text_ops.pii_scrub(docs)


@register(
    "text_lm_score",
    # Corpus bigram LM (CCNet/KenLM-style fluency filter) with the
    # engine's FP-free surrogate: p_e6 = c(w1,w2)·1e6 div c(w1,·), doc
    # score = mean p_e6 — exact integers end-to-end on both sides.
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
    bg AS (
      SELECT doc_id, t[i] AS w1, array_to_string(t[i:i+1], ' ') AS bg
      FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) g
    ),
    bc AS (SELECT w1, bg, COUNT(*) AS c12 FROM bg GROUP BY w1, bg),
    pc AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
    st AS (
      SELECT bc.bg, (c12 * 1000000) // c1 AS p_e6
      FROM bc JOIN pc USING (w1)
    ),
    per AS (
      SELECT b.doc_id, COUNT(*) AS nb, SUM(p_e6) AS s
      FROM bg b JOIN st USING (bg) GROUP BY b.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(nb, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(s // nb, 0) AS BIGINT) AS lm_score_e6
    FROM documents d LEFT JOIN per USING (doc_id)
    """,
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM fluency scores per document, trained on the corpus
    itself (the model is a DataFrame — train on a sample, score the
    full corpus, at any scale)."""
    return text_ops.lm_score(load_table(spark, sf_dir, "documents"))


@register(
    "curation_keep_best",
    # Representative selection: one kept document per near-dup cluster,
    # chosen by (quality_e6 DESC, doc_id ASC) — the step after duplicate
    # CLUSTERS that decides which copy survives.  Singletons (docs in no
    # pair) keep themselves via the left join + coalesce.
    oracle=f"""
    WITH RECURSIVE {_SQL_NGRAM_PAIR_CTES},
    sym AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
    ),
    labels AS (
      SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
      FROM reach GROUP BY u
    ),
    q AS (
      SELECT doc_id, CAST({_SQL_QE6} AS BIGINT) AS quality_e6
      FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents)
    ),
    j AS (
      SELECT q.doc_id, COALESCE(l.cluster_id, q.doc_id) AS cluster_id,
             q.quality_e6
      FROM q LEFT JOIN labels l ON q.doc_id = l.doc_id
    ),
    r AS (
      SELECT *,
             row_number() OVER (
               PARTITION BY cluster_id
               ORDER BY quality_e6 DESC, doc_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
      FROM j
    )
    SELECT cluster_id, doc_id AS rep_doc_id, quality_e6 AS rep_quality_e6,
           CAST(n_members AS BIGINT) AS n_members
    FROM r WHERE rn = 1
    """,
)
def curation_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked representative per duplicate cluster — dedup's
    KEEP decision (highest quality_e6 wins, doc_id breaks ties), with
    singleton docs as their own clusters.

    Scale shape: CC over the bounded pair graph + one corpus-keyed left
    join + one partial-aggregable ``max_by`` groupBy — no window over
    the corpus (the argmax folds map-side; the oracle's row_number is
    the SQL mirror, not the plan).
    """
    docs = load_table(spark, sf_dir, "documents")
    caches: list[DataFrame] = []
    clusters = curation.connected_components(
        _dup_pair_graph(spark, sf_dir, caches=caches), caches=caches
    )
    quality = text_ops.text_stats(docs).select("doc_id", "quality_e6")
    j = quality.join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        "quality_e6",
    )
    ret = j.groupBy("cluster_id").agg(
        F.max_by(
            "doc_id",
            F.struct(F.col("quality_e6"), (-F.col("doc_id")).alias("neg_id")),
        ).alias("rep_doc_id"),
        F.max("quality_e6").alias("rep_quality_e6"),
        F.count("*").cast("long").alias("n_members"),
    )
    return scope_caches(ret, *caches)


@register(
    "curation_quality_score",
    # The linear document-quality scorer (operators/curation.py
    # quality_linear_score): 50/30/20 blend of the three existing
    # quality signals + the ≥0.5 keep gate, all-integer — the oracle
    # recomputes the three feature CTEs (text_stats quality_e6,
    # repetition rep_bigram_e6, bigram-LM lm_score_e6 — same CTE text
    # as their standalone oracles, sharing ONE bigram set since both
    # derivations enumerate the identical i ∈ [1, len(t)) positions)
    # and applies the identical // blend.
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents),
    q AS (
      SELECT doc_id, CAST({_SQL_QE6} AS BIGINT) AS quality_e6 FROM toks
    ),
    bg AS (
      SELECT doc_id, t[i] AS w1, array_to_string(t[i:i+1], ' ') AS bg
      FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) g
    ),
    per_bg AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg),
    rep AS (
      SELECT doc_id, SUM(c) AS nb,
             SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS rp
      FROM per_bg GROUP BY doc_id
    ),
    bc AS (SELECT w1, bg, COUNT(*) AS c12 FROM bg GROUP BY w1, bg),
    pc AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1),
    st AS (
      SELECT bc.bg, (c12 * 1000000) // c1 AS p_e6
      FROM bc JOIN pc USING (w1)
    ),
    lmper AS (
      SELECT b.doc_id, COUNT(*) AS nb, SUM(p_e6) AS s
      FROM bg b JOIN st USING (bg) GROUP BY b.doc_id
    ),
    f AS (
      SELECT q.doc_id, q.quality_e6,
             CAST(COALESCE((r.rp * 1000000) // r.nb, 0) AS BIGINT)
               AS rep_bigram_e6,
             CAST(COALESCE(l.s // l.nb, 0) AS BIGINT) AS lm_score_e6
      FROM q
      LEFT JOIN rep r USING (doc_id)
      LEFT JOIN lmper l USING (doc_id)
    )
    SELECT doc_id, quality_e6, rep_bigram_e6, lm_score_e6,
           CAST((50 * quality_e6 + 30 * (1000000 - rep_bigram_e6)
                 + 20 * least(lm_score_e6 * 10, 1000000)) // 100
                AS BIGINT) AS score_e6,
           ((50 * quality_e6 + 30 * (1000000 - rep_bigram_e6)
             + 20 * least(lm_score_e6 * 10, 1000000)) // 100)
             >= 500000 AS keep
    FROM f
    """,
)
def curation_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear document-quality score + keep gate over the three existing
    per-document quality signals (length/diversity/stopword blend,
    within-doc repetition inverted, corpus-bigram fluency saturated) —
    the single number a curation pipeline thresholds on.  The combiner
    itself touches no corpus text: pure integer arithmetic over the
    doc_id-keyed feature frames (zero new corpus passes beyond the
    features).
    """
    docs = load_table(spark, sf_dir, "documents")
    return curation.quality_linear_score(
        text_ops.text_stats(docs).select("doc_id", "quality_e6"),
        text_ops.repetition_stats(docs).select("doc_id", "rep_bigram_e6"),
        text_ops.lm_score(docs).select("doc_id", "lm_score_e6"),
    )


def _bpe_rounds(n_merges: int, batch: int) -> list[int]:
    """Per-round merge counts: full ``batch`` rounds plus a remainder."""
    out, done = [], 0
    while done < n_merges:
        out.append(min(batch, n_merges - done))
        done += out[-1]
    return out


def _sql_bpe_pair(r: int, j: int) -> str:
    """Scalar subquery for round ``r``'s rank-``j`` merge pair, with a
    never-matching chr(1) sentinel so a short round (degenerate corpus)
    yields a no-op replace instead of NULLing the vocabulary."""
    return f"coalesce((SELECT pair FROM s{r} WHERE j = {j}), chr(1))"


def _sql_bpe_ctes(n_merges: int, batch: int) -> str:
    """Unrolled CTE chain mirroring text.bpe_merges round-for-round in
    BATCHED form: same word-count-weighted pair counting, same
    (cnt DESC, pair ASC) ranking, top-``batch`` merges per round
    applied sequentially in rank order as chained space-delimited
    ``replace``s over ONE padded string (both engines' ``replace`` is
    non-overlapping left-to-right, and each replacement preserves its
    boundary spaces, so the chain is bit-identical to per-merge
    pad/trim).  Counts for merges 2..batch of a round are the
    round-START counts — the standard stale-count batching, identical
    on both sides.

    Every CTE is MATERIALIZED: DuckDB inlines CTEs by default, and
    each round references v{{r-1}} twice and s{{r}} ~2·batch times (the
    scalar-subquery merge lookups), so inlining re-expands the whole
    training chain multiplicatively per round — the un-materialized
    form does not finish at 32 merges."""
    parts = [
        f"""words AS MATERIALIZED (
      SELECT w, COUNT(*) AS wc
      FROM (SELECT unnest({_SQL_TOKENS}) AS w FROM documents) GROUP BY w
    ), v0 AS MATERIALIZED (
      SELECT wc, array_to_string(regexp_extract_all(w, '.'), ' ') AS s
      FROM words
    )"""
    ]
    for r, k in enumerate(_bpe_rounds(n_merges, batch), start=1):
        applied = "' ' || s || ' '"
        for j in range(1, k + 1):
            p = _sql_bpe_pair(r, j)
            applied = (
                f"replace({applied}, ' ' || {p} || ' ',"
                f" ' ' || replace({p}, ' ', '') || ' ')"
            )
        parts.append(f"""p{r} AS MATERIALIZED (
      SELECT pair, SUM(wc) AS cnt FROM (
        SELECT wc, array_to_string(t[j:j+1], ' ') AS pair
        FROM (SELECT wc, string_split(s, ' ') AS t FROM v{r-1}),
             LATERAL (SELECT unnest(range(1, len(t))) AS j) g
      ) GROUP BY pair
    ), s{r} AS MATERIALIZED (
      SELECT pair, cnt,
             row_number() OVER (ORDER BY cnt DESC, pair ASC) AS j
      FROM p{r} QUALIFY j <= {k}
    ), v{r} AS MATERIALIZED (
      SELECT wc, trim({applied}) AS s FROM v{r-1}
    )""")
    return ",\n".join(parts)


def _sql_bpe_oracle(n_merges: int, batch: int) -> str:
    selects, offset = [], 0
    for r, k in enumerate(_bpe_rounds(n_merges, batch), start=1):
        selects.append(
            f"SELECT CAST({offset} + j AS INTEGER) AS step, pair,"
            f" replace(pair, ' ', '') AS merged,"
            f" CAST(cnt AS BIGINT) AS cnt FROM s{r}"
        )
        offset += k
    return (
        "WITH "
        + _sql_bpe_ctes(n_merges, batch)
        + "\n"
        + "\nUNION ALL ".join(selects)
    )


def _sql_bpe_segment_oracle(n_merges: int, batch: int) -> str:
    """Per-document subword counts with the learned merges applied in
    global step order — the per-word chained-replace matches
    text.bpe_segment_counts' single-pad form exactly.  The merge pairs
    arrive as CROSS JOINed scalar columns p1..pN (DuckDB rejects
    subqueries inside lambdas), each built with min()+coalesce so even
    a short round yields a no-op sentinel column instead of an
    output-annihilating empty join."""
    applied = "' ' || array_to_string(regexp_extract_all(w, '.'), ' ') || ' '"
    joins = []
    step = 0
    for r, k in enumerate(_bpe_rounds(n_merges, batch), start=1):
        for j in range(1, k + 1):
            step += 1
            joins.append(
                f"CROSS JOIN (SELECT coalesce(min(pair), chr(1)) AS p{step}"
                f" FROM s{r} WHERE j = {j}) j{step}"
            )
            applied = (
                f"replace({applied}, ' ' || p{step} || ' ',"
                f" ' ' || replace(p{step}, ' ', '') || ' ')"
            )
    return f"""
    WITH {_sql_bpe_ctes(n_merges, batch)}
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS ws_tokens,
           CAST(list_sum(list_transform(toks,
                w -> len(string_split(trim({applied}), ' ')))) AS BIGINT)
             AS bpe_vocab_tokens
    FROM (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents) d
    {' '.join(joins)}
    """


# Real-vocabulary depth (round-4 verdict #4): 32 merges in rounds of 8
# — bounded plan depth (4 rewrite projections), 4 driver round-trips.
_BPE_N_MERGES = 32
_BPE_BATCH = 8


@register("text_bpe_merges", oracle=_sql_bpe_oracle(_BPE_N_MERGES, _BPE_BATCH))
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer induction: the corpus's top-{32} learned byte-pair
    merges (word-frequency training, deterministic batched stale-count
    rounds of {8}; cached as an ingest-time build)."""
    return text_ops.bpe_merges(
        load_table(spark, sf_dir, "documents"),
        n_merges=_BPE_N_MERGES,
        batch=_BPE_BATCH,
        cache_key=table_fingerprint(sf_dir, "documents"),
    )


@register(
    "text_bpe_segment", oracle=_sql_bpe_segment_oracle(_BPE_N_MERGES, _BPE_BATCH)
)
def text_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the induced BPE merges to every document: per-doc subword
    counts under the learned 32-merge vocabulary (the application half
    of text_bpe_merges; one corpus-wide shuffle-free codegen'd map —
    the bounded merge table inlines as literal replaces, no join)."""
    docs = load_table(spark, sf_dir, "documents")
    merges = text_ops.bpe_merges(
        docs,
        n_merges=_BPE_N_MERGES,
        batch=_BPE_BATCH,
        cache_key=table_fingerprint(sf_dir, "documents"),
    )
    return text_ops.bpe_segment_counts(docs, merges, n_merges=_BPE_N_MERGES)


@register(
    "curation_upsample",
    # Mixture epochs: per-source uniform rates UNCAPPED above 1 (cap 4e6
    # = max 4 epochs) applied as deterministic fractional repetition —
    # full copies = factor div 1e6, plus a hash-gated fractional copy
    # (same exact-floor md5-bucket threshold construction as
    # curation_rebalance, so expected copies equal the factor to within
    # 2⁻³² and membership is a pure function of doc_id).
    oracle=f"""
    WITH per AS (
      SELECT source, CAST(SUM(len({_SQL_TOKENS})) AS BIGINT) AS sum_tokens
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(SUM(sum_tokens) AS BIGINT) AS total, COUNT(*) AS k FROM per
    ), rates AS (
      SELECT source,
             CAST(least((CAST(total AS HUGEINT) * 1000000)
                        // (k * sum_tokens), 4000000) AS BIGINT) AS factor_e6
      FROM per CROSS JOIN tot
    ), base AS (
      SELECT d.doc_id, d.source,
             r.factor_e6 // 1000000
             + CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
                    < lpad(lower(hex(((r.factor_e6 % 1000000) * 4294967296)
                                     // 1000000)), 8, '0')
               THEN 1 ELSE 0 END AS n
      FROM documents d JOIN rates r USING (source)
    )
    SELECT doc_id, source, CAST(copy_id AS BIGINT) AS copy_id
    FROM base, LATERAL (SELECT unnest(range(n)) AS copy_id) g
    """,
)
def curation_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-epochs upsampling: repeat each source ``uniform_rate``
    times (fractionally, hash-deterministic) toward a uniform token
    budget — the up-weighting half of mixture construction
    (curation_rebalance is the down-weighting half)."""
    docs = load_table(spark, sf_dir, "documents")
    factors = text_ops.domain_mixture(docs, cap_e6=4_000_000).select(
        "source", F.col("uniform_rate_e6").alias("factor_e6")
    )
    return curation.upsample_by_factor(
        docs.select("doc_id", "source"), factors
    )


_QUOTA_PER_LANG = 50


@register(
    "curation_sample_quota",
    # Fixed-quota bottom-k priority sampling: exactly min(quota, n) docs
    # per language, smallest md5(doc_id) priorities win (doc_id breaks
    # hash ties) — quota-exact where the rate-based stratified sample is
    # exact only in expectation.
    oracle=f"""
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    ) WHERE rk <= {_QUOTA_PER_LANG}
    """,
)
def curation_sample_quota(
    spark: SparkSession, sf_dir: str, *, quota: int = _QUOTA_PER_LANG
) -> DataFrame:
    """Deterministic fixed-quota sampling: exactly ``quota`` docs per
    language by hash priority (uniform without replacement,
    reproducible at any scale/partitioning) — the quota-exact
    counterpart to curation_sample_stratified's rates."""
    return curation.sample_quota(
        load_table(spark, sf_dir, "documents"), quota
    ).select("doc_id", "lang", "source")


@register(
    "curation_sample_weighted",
    # Quality-weighted bottom-k: priority = H div (quality_e6 + 1) with
    # H the 60-bit int from md5's first 15 hex digits — Spark conv(.,16,
    # 10) and DuckDB ('0x'||.)::BIGINT produce the identical integer, and
    # the integer division keeps the weighted priorities cross-engine
    # exact (no -ln(u)/w floats of the textbook A-ES form).
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang, source, {_SQL_QE6} AS quality_e6
      FROM (SELECT doc_id, lang, source, {_SQL_TOKENS} AS t FROM documents)
    )
    SELECT doc_id, lang, source, quality_e6 FROM (
      SELECT doc_id, lang, source, quality_e6,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                             1, 15)) AS BIGINT)
                        // (quality_e6 + 1),
                        doc_id) AS rk
      FROM s
    ) WHERE rk <= {_QUOTA_PER_LANG}
    """,
)
def curation_sample_weighted(
    spark: SparkSession, sf_dir: str, *, quota: int = _QUOTA_PER_LANG
) -> DataFrame:
    """Quality-WEIGHTED deterministic sampling: quota docs per language,
    inclusion odds growing with the integer quality score — the
    'sample the best-looking data harder' curation step, reproducible
    at any scale/partitioning (see operators/curation.py
    sample_weighted)."""
    docs = load_table(spark, sf_dir, "documents")
    stats = text_ops.text_stats(docs).select("doc_id", "quality_e6")
    return curation.sample_weighted(
        docs.join(stats, "doc_id"),
        quota,
        weight_col="quality_e6",
    ).select("doc_id", "lang", "source", "quality_e6")


@register(
    "curation_rebalance",
    # The execution half of mixture re-balancing: text_domain_mixture's
    # computed uniform keep-rates applied by deterministic in-plan hash
    # thresholds (md5 8-hex-digit bucket vs lpad(hex(rate·2³² div 10⁶))
    # — exact-floor bucket scaling; integer ops + hex formatting both
    # engines render identically).
    oracle=f"""
    WITH per AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len({_SQL_TOKENS})) AS BIGINT) AS sum_tokens
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(SUM(sum_tokens) AS BIGINT) AS total, COUNT(*) AS k FROM per
    ), rates AS (
      SELECT source,
             CAST(least((CAST(total AS HUGEINT) * 1000000)
                        // (k * sum_tokens), 1000000) AS BIGINT) AS rate_e6
      FROM per CROSS JOIN tot
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN rates r USING (source)
    WHERE r.rate_e6 >= 1000000
       OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
          < lpad(lower(hex((r.rate_e6 * 4294967296) // 1000000)), 8, '0')
    """,
)
def curation_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture re-balancing end-to-end: compute each source's uniform
    keep-rate (text_domain_mixture) and apply it with deterministic
    hash sampling — membership a pure function of doc_id, reproducible
    at any scale or partitioning.

    Scale shape: the rate table is one bounded row per source →
    broadcast; the keep filter is a narrow codegen'd map, so the corpus
    never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    rates = text_ops.domain_mixture(docs).select(
        "source", F.col("uniform_rate_e6").cast("long").alias("rate_e6")
    )
    return curation.rebalance_by_rate(docs, rates).select(
        "doc_id", "lang", "source"
    )


@register(
    "text_domain_mixture",
    # Mixture-planning rollup: per-source token share + the uniform
    # re-balancing keep-rate, all exact integer division.
    oracle=f"""
    WITH per AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len({_SQL_TOKENS})) AS BIGINT) AS sum_tokens
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(SUM(sum_tokens) AS BIGINT) AS total, COUNT(*) AS k FROM per
    )
    SELECT source, n_docs, sum_tokens,
           CAST((CAST(sum_tokens AS HUGEINT) * 1000000) // total
                AS BIGINT) AS share_e6,
           CAST(least((CAST(total AS HUGEINT) * 1000000) // (k * sum_tokens),
                      1000000) AS BIGINT) AS uniform_rate_e6
    FROM per CROSS JOIN tot
    """,
)
def text_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token share and uniform-mixture sampling rates —
    the planning step ahead of curation.sample_by_hash."""
    return text_ops.domain_mixture(load_table(spark, sf_dir, "documents"))


@register(
    "curation_decontaminate",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                            for i in generate_series(1, len(t) - 2)])) AS term
      FROM (SELECT doc_id, {_SQL_TOKENS} AS t FROM documents)
    ), b AS (SELECT DISTINCT term FROM sh WHERE doc_id % 97 = 0),
    t AS (SELECT doc_id, term FROM sh WHERE doc_id % 97 <> 0)
    SELECT t.doc_id, COUNT(*) AS n_hits
    FROM t JOIN b USING (term)
    GROUP BY t.doc_id
    """,
)
def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing ≥1 trigram
    shingle with the deterministic doc_id%97 benchmark subset."""
    return curation.decontaminate(
        load_table(spark, sf_dir, "documents"), bench_modulus=97, shingle_n=3
    )


# --------------------------------------------------------------------------
# Multimodal plumbing (SURVEY.md §2.6): binary columns + typed metadata
# --------------------------------------------------------------------------

from ..operators import multimodal  # noqa: E402


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           lower(sha256(text)) AS sha256
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata (byte length + sha256), computed JVM-side."""
    blobs = multimodal.attach_binary(load_table(spark, sf_dir, "documents"))
    return blobs.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.sha256").alias("sha256"),
    )


@register(
    "multimodal_byte_features",
    # The high nibble of byte i is the (2i-1)-th hex digit of the blob, so
    # the mapInPandas histogram is exactly reproducible in SQL from
    # hex(encode(text)) — integer counts, no FP at all.
    oracle="""
    WITH h AS (
      SELECT doc_id,
             hex(encode(text)) AS hx,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
    ), e AS (
      SELECT doc_id, n_bytes,
             unnest([substr(hx, 2 * i - 1, 1)
                     for i in generate_series(1, n_bytes)]) AS nib
      FROM h
    )
    SELECT doc_id, n_bytes,
           CAST(strpos('0123456789ABCDEF', nib) - 1 AS INTEGER) AS bin,
           COUNT(*) AS bin_count
    FROM e
    GROUP BY doc_id, n_bytes, bin
    """,
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched fake feature extraction over binary blobs
    (mapInPandas plumbing; deterministic byte histogram, long form —
    the array<double> form is the API surface, tested in pytest)."""
    blobs = multimodal.attach_binary(load_table(spark, sf_dir, "documents"))
    return multimodal.byte_features_long(blobs)


@register(
    "multimodal_resize_box",
    # Integer box-filter (area) downsample mirrored from hex(blob):
    # pixel (r,c) = truncated mean of its source box (rows r·H div 4 ..
    # max((r+1)·H div 4, r0+1)−1, cols 4c..4c+3), existing bytes only,
    # last-byte clamp for past-the-end boxes — pure integer ops, so the
    # resampled bytes are bit-exact on both engines.
    oracle="""
    WITH h AS (
      SELECT doc_id,
             hex(encode(text)) AS hx,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
      WHERE octet_length(encode(text)) > 0
    ), g AS (
      SELECT doc_id, hx, n_bytes, (n_bytes + 15) // 16 AS grid_h FROM h
    ), px AS (
      SELECT doc_id, hx, n_bytes, grid_h, i, i // 4 AS r, i % 4 AS c
      FROM g, LATERAL (SELECT unnest(range(0, 16)) AS i) q
    ), b AS (
      SELECT *,
             (r * grid_h) // 4 AS r0,
             greatest(((r + 1) * grid_h) // 4, (r * grid_h) // 4 + 1) AS r1
      FROM px
    ), v AS (
      SELECT doc_id, hx, n_bytes, grid_h, i,
             list_filter(
               [(r0 + k // 4) * 16 + 4 * c + (k % 4)
                for k in generate_series(0, (r1 - r0) * 4 - 1)],
               x -> x < n_bytes) AS idxs
      FROM b
    ), pix AS (
      SELECT doc_id, n_bytes, grid_h, i,
             CASE WHEN len(idxs) > 0 THEN
               list_sum(list_transform(idxs, x ->
                 (strpos('0123456789ABCDEF', substr(hx, 2*x + 1, 1)) - 1) * 16
                 + strpos('0123456789ABCDEF', substr(hx, 2*x + 2, 1)) - 1))
               // len(idxs)
             ELSE
               (strpos('0123456789ABCDEF',
                       substr(hx, 2*(n_bytes - 1) + 1, 1)) - 1) * 16
               + strpos('0123456789ABCDEF',
                        substr(hx, 2*(n_bytes - 1) + 2, 1)) - 1
             END AS p
      FROM v
    )
    SELECT doc_id, n_bytes, grid_h,
           array_to_string(
             list(format('{:02x}', CAST(p AS BIGINT)) ORDER BY i), '')
             AS resized_hex
    FROM pix
    GROUP BY doc_id, n_bytes, grid_h
    """,
)
def multimodal_resize_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-modality resampling: integer box-filter (area) downsample
    of the byte grid via whole-batch integral images in Arrow-batched
    mapInPandas — real resampling arithmetic, codec-free."""
    blobs = multimodal.attach_binary(load_table(spark, sf_dir, "documents"))
    return multimodal.resize_box(blobs)


@register(
    "multimodal_frame_sample",
    # Evenly spaced fake-frame sampling is pure integer math over byte
    # lengths, and the 16-byte frame signature is a substring of the
    # blob's hex — both exactly reproducible in SQL.
    oracle="""
    WITH h AS (
      SELECT doc_id,
             hex(encode(text)) AS hx,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
    ), f AS (
      SELECT doc_id, hx, (n_bytes // 100) + 1 AS n_frames FROM h
    ), idx AS (
      SELECT doc_id, hx,
             unnest(list_distinct([(j * n_frames) // 4
                                   for j in generate_series(0, 3)])) AS frame_idx
      FROM f
    )
    SELECT doc_id, frame_idx, frame_idx * 100 AS frame_off,
           lower(substr(hx, CAST(frame_idx * 200 + 1 AS INT), 32)) AS frame_sig
    FROM idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-modality fan-out: 4 evenly spaced fake frames per blob via
    Arrow-batched mapInPandas (see operators/multimodal.py)."""
    blobs = multimodal.attach_binary(load_table(spark, sf_dir, "documents"))
    return multimodal.sample_frames(blobs)


@register(
    "multimodal_audio_energy",
    # Per-window PCM energy is pure integer math over the blob's bytes:
    # byte i is the hex-digit pair (2i-1, 2i), window = (i-1)//100, and
    # energy/peak are integer aggregates — bit-exact both engines.
    oracle="""
    WITH h AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
    ), b AS (
      SELECT doc_id, hx,
             unnest(generate_series(1, CAST(n_bytes AS INT))) AS i
      FROM h WHERE n_bytes > 0
    ), v AS (
      SELECT doc_id, (i - 1) // 100 AS win_idx,
             (strpos('0123456789ABCDEF', substr(hx, 2 * i - 1, 1)) - 1) * 16
             + strpos('0123456789ABCDEF', substr(hx, 2 * i, 1)) - 1 - 128
             AS amp
      FROM b
    )
    SELECT doc_id, CAST(win_idx AS BIGINT) AS win_idx,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(amp * amp) AS BIGINT) AS energy,
           CAST(MAX(abs(amp)) AS BIGINT) AS peak
    FROM v GROUP BY doc_id, win_idx
    """,
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality windowed signal stats: per-100-sample energy and
    peak amplitude over fake 8-bit PCM (the silence-trim shape) via
    whole-batch numpy reduceat in Arrow-batched mapInPandas."""
    blobs = multimodal.attach_binary(load_table(spark, sf_dir, "documents"))
    return multimodal.audio_energy(blobs)


_PHASH_INJECT_MOD = 50  # injected near-dup demo: perturb doc_id % 50 == 0


@register(
    "multimodal_phash_pairs",
    # Brute-force Hamming ball over the replayed blockhash — the oracle
    # recomputes every fingerprint from the blob hex (same integer
    # bit rule: block_sum·n > total·block_len, block of byte k is
    # ((k+1)·64−1) div n) and compares ALL pairs, so it cross-verifies
    # the Spark side's pigeonhole candidate generation for completeness
    # (the dedup_simhash_pairs pattern, binary modality).  The corpus
    # carries injected same-length byte perturbations (first char
    # substituted) of every 50th document — the re-encode-noise shape
    # blockhash is designed to absorb.
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, 'x' || substr(text, 2) FROM documents
      WHERE doc_id % {_PHASH_INJECT_MOD} = 0
    ),
    h AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             CAST(octet_length(encode(text)) AS BIGINT) AS n
      FROM corpus
    ), b AS (
      SELECT doc_id, n, unnest(generate_series(1, CAST(n AS INT))) AS i
      FROM h WHERE n > 0
    ), v AS (
      SELECT b.doc_id, b.n, (b.i * 64 - 1) // b.n AS j,
             (strpos('0123456789ABCDEF', substr(h.hx, 2 * b.i - 1, 1)) - 1) * 16
             + strpos('0123456789ABCDEF', substr(h.hx, 2 * b.i, 1)) - 1 AS byte
      FROM b JOIN h USING (doc_id)
    ), blk AS (
      SELECT doc_id, n, j, SUM(byte) AS bsum, COUNT(*) AS blen
      FROM v GROUP BY 1, 2, 3
    ), tot AS (SELECT doc_id, SUM(byte) AS total FROM v GROUP BY 1),
    grid AS (
      SELECT h.doc_id, h.n, g.j FROM h, generate_series(0, 63) AS g(j)
      WHERE h.n > 0
    ), bits AS (
      SELECT g.doc_id, g.j,
             CASE WHEN COALESCE(blk.bsum, 0) * g.n
                       > t.total * COALESCE(blk.blen, 0)
                  THEN 1 ELSE 0 END AS bit
      FROM grid g JOIN tot t ON t.doc_id = g.doc_id
      LEFT JOIN blk ON blk.doc_id = g.doc_id AND blk.j = g.j
    ), f AS (
      SELECT doc_id,
           CAST(SUM(CASE WHEN j < 16 THEN bit * (1 << (j % 16))
                    ELSE 0 END) AS BIGINT) AS c0,
           CAST(SUM(CASE WHEN j >= 16 AND j < 32 THEN bit * (1 << (j % 16))
                    ELSE 0 END) AS BIGINT) AS c1,
           CAST(SUM(CASE WHEN j >= 32 AND j < 48 THEN bit * (1 << (j % 16))
                    ELSE 0 END) AS BIGINT) AS c2,
           CAST(SUM(CASE WHEN j >= 48 THEN bit * (1 << (j % 16))
                    ELSE 0 END) AS BIGINT) AS c3
      FROM bits GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
              + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3))
             AS BIGINT) AS hamming
    FROM f a JOIN f b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
        + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3)) <= 3
    """,
)
def multimodal_phash_pairs(
    spark: SparkSession,
    sf_dir: str,
    *,
    max_hamming: int = 3,
    inject_modulus: int = _PHASH_INJECT_MOD,
) -> DataFrame:
    """Binary-modality near-dup pairs: blockhash (64-bit perceptual
    hash over the byte signal, operators/multimodal.py) + pigeonhole
    Hamming join at d ≤ 3 — media dedup the way a training pipeline
    runs it (text gets SimHash/MinHash, embeddings get IVF buckets,
    blobs get the perceptual hash).  The demo corpus injects a
    same-length byte perturbation (first char substituted) of every
    50th document — the re-encode-noise class the hash absorbs; length
    changes are the resize stage's job, exactly as with 2-D blockhash
    over fixed-size resized images.

    Scale shape: fingerprints are whole-batch numpy over Arrow batches
    (one prefix-sum gather per batch); the pair join is banded on the
    four 16-bit chunks (linear in collisions, never all-pairs) with
    the exact bit_count verify; the oracle runs brute force, pinning
    pigeonhole completeness every round.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    injected = docs.filter(F.col("doc_id") % inject_modulus == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("x"), F.expr("substring(text, 2)")).alias("text"),
    )
    corpus = docs.unionByName(injected)
    blobs = multimodal.attach_binary(corpus)
    return multimodal.phash_near_dup_pairs(blobs, max_hamming=max_hamming)


# --------------------------------------------------------------------------
# End-to-end curation pipeline: dedup → quality filter → sample → pack
# --------------------------------------------------------------------------

_MIN_QUALITY_E6 = 500_000  # quality gate in exact 1e-6 integer units
_MIN_TOKENS = 5


@register(
    "curation_pipeline",
    # The composed training-data flow as ONE query: exact dedup (min-id
    # representative per content digest), quality gate, deterministic
    # stratified sampling, token-budget packing — each stage's SQL is the
    # same fragment its standalone oracle uses, composed as CTEs.
    oracle=f"""
    WITH keep AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ), d AS (
      SELECT doc_id, text, lang, source FROM documents
      WHERE doc_id IN (SELECT doc_id FROM keep)
    ), q AS (
      SELECT doc_id, text, lang, source, t FROM (
        SELECT *, {_SQL_TOKENS} AS t FROM d
      ) WHERE CAST(len(t) AS BIGINT) >= {_MIN_TOKENS}
        AND {_SQL_QE6} >= {_MIN_QUALITY_E6}
    ), s AS (
      SELECT doc_id, lang, source, CAST(len(t) AS BIGINT) AS n_tokens
      FROM q
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < {_SQL_RATE_CASE}
    )
    SELECT doc_id, lang, source, n_tokens,
           CAST(floor(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY lang, source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             / {_PACK_BUDGET}.0) AS BIGINT) AS pack_id
    FROM s
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation: exact dedup → quality gate (integer-exact
    text_stats blend ≥ 0.5, ≥ 5 tokens) → per-language hash-stratified
    sampling → token-budget packing.

    Scale shape: one digest shuffle (partial-aggregable min) + a semi
    join for dedup; the quality gate and sample are narrow codegen'd
    filters fused into the same stage; packing windows per stratum.
    Four pipeline stages, two shuffles + one window total.
    """
    docs = load_table(spark, sf_dir, "documents")
    keep = (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("k"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    d = docs.join(keep, "doc_id", "left_semi")
    stats = text_ops.text_stats(d).select("doc_id", "n_tokens", "quality_e6")
    filtered = (
        d.join(stats, "doc_id")
        .filter(
            (F.col("quality_e6") >= _MIN_QUALITY_E6)
            & (F.col("n_tokens") >= _MIN_TOKENS)
        )
        .select("doc_id", "text", "lang", "source")
    )
    sampled = curation.sample_by_hash(filtered, _SAMPLE_RATES)
    return curation.pack_sequences(sampled, budget=_PACK_BUDGET)


_CHUNK_TOKENS = 64
_CHUNK_STRIDE = 48


@register(
    "text_chunk_sliding",
    # Sliding token-window chunking mirrored exactly: DuckDB range() gives
    # chunk ids 0..(n-1)//stride, list_slice clamps the tail window just
    # like Spark's bounds-safe slice, and both sides emit the same
    # lower-cased whitespace-token join — pure integer/string ops, no FP.
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks,
             CAST(len({_SQL_TOKENS}) AS BIGINT) AS n
      FROM documents
    ), c AS (
      SELECT doc_id, toks, n,
             unnest(range(((n - 1) // {_CHUNK_STRIDE}) + 1)) AS chunk_id
      FROM t WHERE n > 0
    )
    SELECT doc_id,
           CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(chunk_id * {_CHUNK_STRIDE} AS BIGINT) AS start_tok,
           CAST(least({_CHUNK_TOKENS}, n - chunk_id * {_CHUNK_STRIDE})
                AS BIGINT) AS chunk_len,
           array_to_string(
             list_slice(toks,
                        CAST(chunk_id * {_CHUNK_STRIDE} + 1 AS BIGINT),
                        CAST(chunk_id * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}
                             AS BIGINT)),
             ' ') AS chunk_text
    FROM c
    """,
)
def text_chunk_sliding(
    spark: SparkSession,
    sf_dir: str,
    *,
    chunk_tokens: int = _CHUNK_TOKENS,
    stride: int = _CHUNK_STRIDE,
) -> DataFrame:
    """Sliding-window document chunking (64-token windows every 48
    tokens): the context-window preparation step for RAG passage
    extraction and long-document training examples.  One shuffle-free
    codegen'd map stage (see operators/text.py chunk_sliding)."""
    return text_ops.chunk_sliding(
        load_table(spark, sf_dir, "documents"),
        chunk_tokens=chunk_tokens,
        stride=stride,
    )


_DUP_CHUNK_TOKENS = 16
_DUP_CHUNK_STRIDE = 8


@register(
    "text_chunk_dups",
    # Chunk-granular boilerplate: 16-token windows (stride 8) appearing
    # in ≥2 distinct docs.  The oracle reuses the chunking construction
    # and counts via the same two-level rollup (no COUNT(DISTINCT) —
    # both engines aggregate (hash, doc) first, then roll up).
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks,
             CAST(len({_SQL_TOKENS}) AS BIGINT) AS n
      FROM documents
    ), c AS (
      SELECT doc_id,
             md5(array_to_string(
               list_slice(toks,
                          chunk_id * {_DUP_CHUNK_STRIDE} + 1,
                          chunk_id * {_DUP_CHUNK_STRIDE}
                            + {_DUP_CHUNK_TOKENS}), ' ')) AS chunk_md5
      FROM t, LATERAL (SELECT unnest(range(((n - 1) // {_DUP_CHUNK_STRIDE})
                                           + 1)) AS chunk_id) g
      WHERE n > 0
    ), per_doc AS (
      SELECT chunk_md5, doc_id, COUNT(*) AS cnt
      FROM c GROUP BY chunk_md5, doc_id
    )
    SELECT chunk_md5,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(cnt) AS BIGINT) AS n_occurrences
    FROM per_doc
    GROUP BY chunk_md5
    HAVING COUNT(*) >= 2
    """,
)
def text_chunk_dups(
    spark: SparkSession,
    sf_dir: str,
    *,
    chunk_tokens: int = _DUP_CHUNK_TOKENS,
    stride: int = _DUP_CHUNK_STRIDE,
) -> DataFrame:
    """Chunk-level near-dup/boilerplate detection: sliding 16-token
    windows shared across ≥2 documents — the chunk-granular complement
    to whole-doc dedup (catches copied passages inside otherwise-unique
    docs).

    Scale shape: chunking is the shuffle-free map; then ONE hash-keyed
    two-level rollup — (chunk, doc) partial-agg first (kills the
    count-distinct expand rewrite), chunk rollup second.  Both aggs are
    partial-aggregable; the md5 key is uniform so no skew.
    """
    chunks = text_ops.chunk_sliding(
        load_table(spark, sf_dir, "documents"),
        chunk_tokens=chunk_tokens,
        stride=stride,
    ).select(
        "doc_id", F.md5(F.col("chunk_text").cast("binary")).alias("chunk_md5")
    )
    per_doc = chunks.groupBy("chunk_md5", "doc_id").agg(
        F.count("*").alias("cnt")
    )
    return (
        per_doc.groupBy("chunk_md5")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("cnt").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )


_SPLIT_PCT = (90, 5, 5)  # train / val / test


@register(
    "curation_split",
    # Deterministic train/val/test assignment: the md5(doc_id) byte
    # bucket (first 2 hex digits, 0..255) against exact integer
    # thresholds floor(p·256/100) — reproducible, stratification-free by
    # construction (hash is independent of lang/source), and mirrored
    # digit-for-digit in SQL.
    oracle=f"""
    SELECT doc_id, lang, source,
           CASE
             WHEN bucket < {(_SPLIT_PCT[0] * 256) // 100} THEN 'train'
             WHEN bucket < {((_SPLIT_PCT[0] + _SPLIT_PCT[1]) * 256) // 100}
               THEN 'val'
             ELSE 'test'
           END AS split
    FROM (
      SELECT doc_id, lang, source,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                  AS BIGINT) AS bucket
      FROM documents
    )
    """,
)
def curation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split by hash bucket — the
    leakage-safe assignment every training pipeline needs (a pure
    function of doc_id: re-runs, engine changes, and re-partitioning
    can never move a document across splits).  Shuffle-free map."""
    t_hi = (_SPLIT_PCT[0] * 256) // 100
    v_hi = ((_SPLIT_PCT[0] + _SPLIT_PCT[1]) * 256) // 100
    bucket = F.expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 2), 16, 10)"
        " as bigint)"
    )
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.when(bucket < t_hi, F.lit("train"))
        .when(bucket < v_hi, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


_CHUNK_PACK_BUDGET = 256  # tokens per packed training sequence


@register(
    "curation_chunk_pipeline",
    # The RAG/context-window prep flow as ONE query: exact dedup →
    # hash-bucket train split → sliding-window chunking → chunk packing
    # (256-token budget per lang).  Every stage's SQL is the fragment
    # its standalone oracle uses, composed as CTEs.
    oracle=f"""
    WITH keep AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ), train AS (
      SELECT d.doc_id, d.lang, {_SQL_TOKENS} AS toks,
             CAST(len({_SQL_TOKENS}) AS BIGINT) AS n
      FROM documents d
      WHERE d.doc_id IN (SELECT doc_id FROM keep)
        AND CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2))
                 AS BIGINT) < {(_SPLIT_PCT[0] * 256) // 100}
    ), c AS (
      SELECT doc_id, lang,
             CAST(chunk_id AS BIGINT) AS chunk_id,
             CAST(least({_CHUNK_TOKENS}, n - chunk_id * {_CHUNK_STRIDE})
                  AS BIGINT) AS chunk_len
      FROM train, LATERAL (SELECT unnest(range(((n - 1) // {_CHUNK_STRIDE})
                                               + 1)) AS chunk_id) g
      WHERE n > 0
    )
    SELECT doc_id, lang, chunk_id, chunk_len,
           CAST(floor(COALESCE(SUM(chunk_len) OVER (
             PARTITION BY lang ORDER BY doc_id, chunk_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             / {_CHUNK_PACK_BUDGET}.0) AS BIGINT) AS pack_id
    FROM c
    """,
)
def curation_chunk_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end context-window prep: exact dedup → leakage-safe train
    split (hash bucket) → 64/48 sliding-window chunking → 256-token
    chunk packing per language — the composed flow a RAG/pretraining
    chunk pipeline actually runs, each stage the registered standalone
    operator.

    Scale shape: one digest shuffle + semi-join (dedup); the split
    filter fuses into the chunking map stage (both shuffle-free); the
    pack running-sum windows per language stratum.  Two shuffles + one
    window total, corpus touched once.
    """
    docs = load_table(spark, sf_dir, "documents")
    keep = (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("k"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    t_hi = (_SPLIT_PCT[0] * 256) // 100
    bucket = F.expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 2), 16, 10)"
        " as bigint)"
    )
    train = docs.join(keep, "doc_id", "left_semi").filter(bucket < t_hi)
    chunks = text_ops.chunk_sliding(
        train, chunk_tokens=_CHUNK_TOKENS, stride=_CHUNK_STRIDE
    ).join(docs.select("doc_id", "lang"), "doc_id")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum("chunk_len").over(w), F.lit(0).cast("long"))
    return chunks.select(
        "doc_id",
        "lang",
        "chunk_id",
        "chunk_len",
        F.floor(cum_excl / F.lit(float(_CHUNK_PACK_BUDGET)))
        .cast("long")
        .alias("pack_id"),
    )


# Batch analytics + extras queries register themselves on import.
from . import analytics  # noqa: E402,F401
from . import extras  # noqa: E402,F401


# --------------------------------------------------------------------------
# Driver check-window management
# --------------------------------------------------------------------------
# The round driver verifies only the FIRST ``DRIVER_CHECK_WINDOW`` entries
# of ``queries()`` (registration order) against their oracles, so
# registration order is an explicit coverage decision: every claimed
# operator's query must sit inside the window.  Queries that are exact
# duals/subsets of an in-window query are registered as SUPPLEMENTARY —
# moved to the tail, still oracle-backed and still verified by the local
# parity suite (tests/test_oracle_parity.py runs ALL of them), but outside
# the driver window by design.  tests/test_registry_window.py enforces the
# invariants.
#
# ZERO-SUM ERA (round 12 onward): the round-11 rotation drained the
# never-driver-hashed pool to zero and the ratchet cap is now 0, so the
# invariant changes character — there is no backlog left to promote, and
# every NEW primary registration must displace a veteran IN THE SAME
# COMMIT: pick a query driver-hashed in (at least) the two most recent
# rounds whose family keeps an in-window representative, append it to
# EXTENDED_QUERIES with a rotation comment naming the newcomer it yields
# to, and add the newcomer's birth round to
# tests/data/registry_birth.json.  The FRESHNESS ratchet
# (test_registry_window.py: r7+ registrations must reach the window
# within 4 rounds) keeps a newcomer from being parked in the tail
# instead.

DRIVER_CHECK_WINDOW = 50

# demoted query → the in-window query that carries its coverage
SUPPLEMENTARY_QUERIES: dict[str, str] = {
    # identical result set + oracle; the SQL-over-view form (P10) stays
    # in-window, and the fluent chain is also driver-exercised via
    # stedi_customer_risk_join + the exploded variant
    "stedi_customers_decode": "stedi_customers_decode_sql",
    # lag-gap sessionization is the batch dual of the native
    # session_window form (different idiom, same capability)
    "user_sessionization": "events_session_window",
    # ROLLUP is a subset of CUBE's grouping sets
    "orders_rollup": "events_cube",
    # same groupBy + exact countDistinct, minus the HLL bounds check
    "event_type_stats": "events_approx_distinct",
    # the fingerprint map is recomputed inside the pairs query, whose
    # oracle (brute-force Hamming ball) is the stronger claim
    "dedup_simhash": "dedup_simhash_pairs",
    # from_json parsing is exercised by the whole decode family
    "events_props_parse": "stedi_customers_decode_sql",
    # the recall evals run BOTH the demoted pipeline and its exact twin
    # inside one query, so the eval is the stronger in-window claim
    "dedup_embedding_bucketed": "dedup_embedding_recall",
    # r09 remap: the spill-recall eval also runs the full brute-force
    # truth side, and stays in-window while ann_ivf_recall rotates out
    "ann_brute_force_topk": "ann_ivf_spill_recall",
    # same Arrow-batched mapInPandas plumbing over the codec-free byte
    # grid; r08 swaps the carrier direction of the r07 pair:
    # frame_sample was driver-verified r06-r07, so the never-hashed
    # box-filter resize takes the window slot and frame_sample rides
    # behind it
    "multimodal_frame_sample": "multimodal_resize_box",
    # identical cluster assignment + identical oracle; r07 swaps the
    # carrier direction of the r06 pair: min-label propagation was
    # driver-verified r04-r06, so the star-contraction engine (never
    # driver-hashed) takes the window slot and propagation rides behind
    "dedup_clusters": "dedup_clusters_star",
}

# Extended tier: oracle-backed queries outside the 50-slot driver window.
# The window is allocated by FAMILY NOVELTY: the SURVEY-mandated set plus
# one representative per operator family claims its slots first, so
# same-family variants yield their slots to operators that are the ONLY
# window representative of their family.  The window also ROTATES each
# round (r06 proved the mechanism: 10/10 first-try green): queries that
# passed the driver check in the TWO most recent rounds and keep an
# in-window family sibling yield their slots to never-driver-hashed
# queries.  Round 7 swaps twelve r05+r06 veterans out (mmr behind
# ivf_topk + the incoming pq/ivfpq recalls; q5/q11 behind
# q1/q3/q10 + the incoming q7; repetition+corpus_report behind
# stats/tokens/lang-id/chunk-pipeline; metadata behind frame_sample;
# order_price_quantiles behind the in-window KLL merge + incoming
# deciles; anomaly_outliers behind the in-window CUSUM + incoming
# histogram; sample_stratified + pack_sequences behind keep_best /
# quality_score / pipeline / chunk_pipeline; dedup_exact behind the
# five other dedup reps; clusters behind the incoming star form) for
# ten never-verified promotions plus the two new round-7 operators
# (graph_pagerank_dangling, curation_quality_score).  Everything here
# is re-verified by the local dtype-faithful parity suite every round.
EXTENDED_QUERIES: tuple[str, ...] = (
    "q12_priority_lines",
    "q17_small_quantity_revenue",
    # --- round-6 rotation: r04+r05 veterans with in-window siblings ---
    "q4_priority_semi",
    "q19_disjunctive_revenue",
    "q22_idle_rich_customers",
    "events_pivot",
    "text_fingerprints",
    "text_tfidf_top_terms",
    "text_domain_mixture",
    "multimodal_byte_features",
    "dedup_lsh_recall",
    "customer_order_stats",
    # --- round-7 rotation: r05+r06 veterans with in-window siblings ---
    "ann_mmr_topk",
    "q11_supplier_concentration",
    "q5_local_supplier_volume",
    "text_repetition_stats",
    "corpus_report",
    "multimodal_metadata",
    "order_price_quantiles",
    "events_anomaly_outliers",
    "curation_sample_stratified",
    "dedup_exact",
    "curation_pack_sequences",
    # --- round-8 rotation: r06+r07 veterans with in-window siblings ---
    # (r07 promotions ann_ivf_spill_recall / ann_pq_trained_recall /
    # text_bpe_* / dedup_ngram_prefix / dedup_prefix_prune_eval /
    # orders_profile / graph_triangle_count / dedup_snm /
    # graph_pagerank_weighted / events_hll_window_monitor left this
    # tuple for the window; these fifteen yield their slots)
    # ANN evals: ivfpq/pq recalls stay in-window + the incoming
    # spill/pq_trained forms
    "ann_ivf_topk",
    "ann_range_recall",
    # dedup: the incoming prefix/SNM family + clusters/multi_signal
    # carry the window
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_minhash_lsh",
    # curation: keep_best + quality_score (r07-verified) stay in-window
    "curation_chunk_pipeline",
    "curation_decontaminate",
    "curation_pipeline",
    # events: histogram/deciles/hll-monitor/session-window reps stay
    "events_latest_state",
    "events_type_transitions",
    "events_interval_activity",
    "events_cusum_changepoints",
    # behind the in-window KLL merge + deciles
    "orders_monthly_momentum",
    # q1/q3/q7 carry the TPC-H family
    "q10_returned_items",
    # behind the in-window text stats/lang-id + incoming bpe pair
    "text_token_counts",
    # --- r08 mid-round swap: three r07-verified veterans yield their
    # slots to the brand-new kcore / silhouette / drift-bins queries ---
    # value-distribution family: the incoming drift-bins gate carries
    # the decile/histogram machinery (same binning, plus the 2-snapshot
    # comparison); both were driver-hashed r07
    "events_value_deciles",
    "events_value_histogram",
    # corr-components was driver-hashed r07; the stats family keeps
    # events_approx_distinct + the drift/profile gates in-window
    "lineitem_corr_components",
    # lang/source association was driver-hashed r05+; the documents/
    # text family keeps the bpe pair + the r09 lm/pii/spans trio
    # in-window (dedup_simhash_pairs must STAY in-window — it carries
    # the demoted dedup_simhash dual)
    "documents_lang_source_assoc",
    # q7 was re-verified r07; q1/q3 carry TPC-H while the incoming
    # k-truss query completes the in-window graph family
    "q7_nation_trade_volume",
    # KLL merge was driver-hashed r07; the sketch family keeps
    # events_sketch_reaggregate + events_approx_distinct in-window while
    # the incoming edit-distance query extends the dedup family
    "orders_kll_quantile_merge",
    # hashed every round r01-r06; the rank-window shape is carried by
    # q3/q18's scored top-k while the incoming centroid-drift gate
    # completes the in-window drift trio
    "top_parts_per_brand",
    # --- round-9 rotation: r07+r08 veterans with in-window siblings
    # yield 13 slots to eleven never-driver-hashed promotions (incl. the
    # r08 newcomers events_cms_frequency + graph_pagerank_personalized)
    # plus the two new round-9 operators (graph_coreness,
    # events_cms_heavy_hitters) ---
    # TPC-H: q6 took the family's window slot in r09 (the stated
    # q6/q9 pair under-delivered — only q6_forecast_revenue was
    # promoted; VERDICT r09 flagged the drift).  The q-family
    # batch-rotation plan resumes at 2/round from r10: q9+q2 promoted
    # r10, with the remaining q-shapes to follow in later rounds.
    "q1_pricing_summary",
    "q3_shipping_priority",
    # text: the incoming lm_score/pii_scrub/shared_spans trio + the
    # r08-verified bpe pair carry the family
    "text_stats",
    "text_language_id",
    # embeddings: silhouette + centroid_drift (r08-verified) carry it
    "embeddings_label_centroids",
    # ANN: spill/trained recalls (r08-verified, and spill carries the
    # remapped ann_brute_force_topk dual) + incoming range/purity
    "ann_ivf_recall",
    "ann_pq_recall",
    "ann_ivfpq_recall",
    # pagerank: weighted (r08-verified) + incoming personalized carry it
    "trade_graph_pagerank",
    "graph_pagerank_dangling",
    # sketches: approx_distinct + hll_window_monitor + incoming CMS pair
    "events_sketch_reaggregate",
    # curation: quality_score stays in-window
    "curation_keep_best",
    # dedup/CC: clusters_star + the r08-verified SNM/edit/incremental
    # family carry it
    "dedup_multi_signal",
    # (the four r09 late-session newcomers — events_cms_window_monitor,
    # graph_label_propagation, graph_bfs_hops, events_hll_overlap —
    # were promoted into the window by the r10 rotation below)
    # --- round-10 rotation: r08+r09 veterans with in-window siblings
    # yield 15 slots to the twelve never-driver-hashed promotions
    # (events_cms_window_monitor, graph_label_propagation,
    # graph_bfs_hops, events_hll_overlap, q9_product_profit,
    # q2_min_cost_supplier — the q-family's 2-per-round batch-rotation
    # plan, honored this round — curation_split / _rebalance /
    # _upsample / _sample_quota, events_funnel,
    # events_retention_cohorts) plus the three new round-10 operators
    # (ann_sq8_recall, graph_shortest_paths, events_cms_watchlist) ---
    # ANN: spill_recall (carrier of the remapped brute-force dual) +
    # range/purity + the incoming sq8 eval carry the family
    "ann_pq_trained_recall",
    # graph: pagerank_personalized (r09-verified) + coreness + the
    # incoming label_propagation/bfs_hops/shortest_paths carry the
    # family while the five r07/r08-verified veterans rotate out
    "graph_pagerank_weighted",
    "graph_triangle_count",
    "graph_clustering_coeff",
    "graph_kcore",
    "graph_ktruss",
    # dedup: the three carriers (simhash_pairs, embedding_recall,
    # clusters_star) + multi_signal's in-window slot keep the family
    # represented while the seven r08-verified SNM/prefix/edit/
    # incremental veterans rotate out
    "dedup_ngram_prefix",
    "dedup_prefix_prune_eval",
    "dedup_snm",
    "dedup_snm_multipass",
    "dedup_snm_recall_eval",
    "dedup_incremental_lsh",
    "dedup_edit_distance",
    # embeddings drift trio: the events/orders drift gates
    # (events_value_drift_bins, orders_profile_drift — both in-window)
    # carry the drift machinery; both embedding gates were r08+r09-
    # verified
    "embeddings_silhouette",
    "embeddings_centroid_drift",
    # text: bpe_merges (the trainer, r08+r09-verified) keeps the BPE
    # family's slot while its segmenter consumer yields to the new
    # binary-modality phash pair query (multimodal_phash_pairs)
    "text_bpe_segment",
    # profiling: the drift gate (orders_profile_drift, in-window) runs
    # the profile on BOTH snapshots, so the standalone profile yields
    # its slot to the new composed IVF-SQ8 recall eval
    "orders_profile",
    # sketches: five CMS/HLL sketch queries remain in-window
    # (cms_frequency, cms_heavy_hitters, cms_window_monitor,
    # cms_watchlist, hll_overlap) — the r07-r09-verified HLL window
    # monitor yields its slot to the new semantic decontamination gate
    "events_hll_window_monitor",
    # curation: split/rebalance/upsample/sample_quota (all promoted
    # r10) carry the family while the r07-r09-verified quality scorer
    # yields its slot to the new directed-SCC graph query
    "curation_quality_score",
    # --- round-11 rotation: the FULL never-driver-hashed backlog (16
    # queries, all pre-r7 residue) promotes this round, draining the
    # pool to ZERO one round ahead of the r12 cap
    # (tests/test_registry_window.py ratchet: r11 cap 4, r12 cap 0).
    # Sixteen r09+r10-verified veterans with in-window family siblings
    # yield their slots; every demotion below stays green in the
    # dtype-faithful local parity suite (tests/test_oracle_parity.py
    # runs all registered queries every round). ---
    # ANN: ivf_spill_recall (carrier of the remapped brute-force dual)
    # + sq8/ivfsq recalls (first-hashed r10, staying for their second
    # confirmation round) carry the family
    "ann_range_search",
    "ann_label_purity",
    # text: the incoming chunking pair (text_chunk_sliding /
    # text_chunk_dups — the family's last never-hashed members) takes
    # the family's window slots from the r09+r10-verified spans/pii/lm
    # trio and the twice-confirmed BPE trainer (its segmenter dual
    # rotated out r10 behind it; both stay parity-green)
    "text_shared_spans",
    "text_pii_scrub",
    "text_lm_score",
    "text_bpe_merges",
    # multimodal: resize_box (carrier of frame_sample) + phash_pairs
    # (first-hashed r10) carry the family
    "multimodal_audio_energy",
    # TPC-H: the q-family batch-rotation plan COMPLETES this round —
    # all 8 remaining never-hashed q-shapes (q8/q13/q14/q15/q16/q18/
    # q20/q21) promote at once; q6 (r09+r10-verified) + the r10 pair
    # q2/q9 (staying for confirmation) carry the verified veterans
    "q6_forecast_revenue",
    # events: session_window/cube/approx_distinct (carriers) + the r10
    # funnel/retention/CMS/HLL cohort carry the family while the
    # incoming rolling_value + gapfill pair take the time-series slots
    "events_asof_last_order",
    # lineitem/orders: the incoming lineitem_quality_checks +
    # order_price_quantiles_approx take over from the r09+r10-verified
    # join-strategy pair (bloom prune / salted join), whose plan-shape
    # claims remain pinned by tests/test_plans.py
    "lineitem_bloom_prune_revenue",
    "orders_salted_join_revenue",
    # graph: label_propagation/bfs_hops/shortest_paths/scc (first-
    # hashed r10, staying for confirmation) carry the family; the
    # r09+r10-verified personalized-pagerank and coreness yield
    "graph_pagerank_personalized",
    "graph_coreness",
    # sketches: cms_window_monitor/cms_watchlist/hll_overlap (first-
    # hashed r10) carry the family; the r09+r10-verified CMS pair
    # yields
    "events_cms_frequency",
    "events_cms_heavy_hitters",
    # drift: orders_profile_drift (r08-r10 triple-verified) KEEPS the
    # family's in-window slot; the value-bins twin (same binning
    # machinery, r08-r10 triple-verified) yields
    "events_value_drift_bins",
    # drift, continued: the new round-11 market-basket association
    # query (orders_basket_affinity — a brand-new family, no prior
    # window representative) takes the last rotation slot from the
    # r08-r10 triple-verified profile-drift gate; all three drift
    # carriers (value bins / profile / centroid) remain parity-green
    # every round, and the binning machinery they share is also
    # exercised in-window by events_retention_cohorts' bucketing
    "orders_profile_drift",
    # --- round-12 rotation: the never-hashed pool is ZERO and the
    # backlog cap is ZERO (the r11 rotation drained it), so the window
    # is now ZERO-SUM — every NEW primary registration must name the
    # twice-hashed veteran it displaces IN THE SAME CHANGE, each with
    # an in-window family sibling.  Round 12 registered TWO new
    # operators (events_seq_patterns, events_mad_outliers); their two
    # displaced veterans: ---
    # TPC-H: q2/q9 (first-hashed r10, confirmed r11) yield to the new
    # sequential-pattern and MAD-outlier queries; the family stays
    # carried in-window by the eight r11-first-hashed q-shapes
    # (q8/q13/q14/q15/q16/q18/q20/q21, staying for confirmation) + q6's
    # r09-r11 record behind them
    "q2_min_cost_supplier",
    "q9_product_profit",
    # --- round-13 rotation: round 12 ALSO demoted the next two
    # veterans one round early (its ledger claimed SRP-LSH and
    # weighted-reservoir newcomers that had not landed — VERDICT r12
    # flagged the two vacant slots); round 13 registers those two
    # operators FOR REAL, restoring the window to 50 primaries: ---
    # curation sampling: upsample (r10+r11-verified) yields to the new
    # SRP-LSH recall eval (dedup_srp_recall, birth r13);
    # split/rebalance/sample_quota/sample_weighted +
    # semantic_decontaminate keep the curation family in-window
    "curation_upsample",
    # sketches: the windowed CMS grid monitor (r10+r11-verified) yields
    # to the new per-key weighted-reservoir query
    # (events_weighted_reservoir, birth r13); cms_watchlist +
    # hll_overlap keep the sketch family in-window (and the batch dual
    # of the grid monitor remains parity-green every round)
    "events_cms_window_monitor",
    # time-series gapfill: LOCF (r11+r12-verified) yields to the new
    # gapped followed-by rules (events_followed_by, birth r13); its
    # sibling events_gapfill_rollup — the same grid-densify machinery —
    # stays in-window, and LOCF remains parity-green every round
    "events_gapfill_locf",
    # graph: bfs_hops (r10-r12-verified) yields to the new sampled-
    # source stress centrality (graph_stress_centrality, birth r13),
    # whose forward pass IS the same frontier machinery carrying
    # shortest-path counts on the same purchase graph and seed set;
    # scc/label_propagation/shortest_paths keep the family in-window
    "graph_bfs_hops",
    # --- round-14 rotation (zero-sum, THREE newcomers): ---
    # text dedup: chunk-aligned duplicate detection (text_chunk_dups,
    # r12+r13-verified, birth r5) yields to the new arbitrary-boundary
    # exact-substring run miner (dedup_substring_runs, birth r14),
    # which detects a strict superset of the verbatim-overlap signal
    # (chunk-aligned overlaps are runs too); text_chunk_sliding keeps
    # the chunking machinery in-window, and text_chunk_dups remains
    # parity-green every round
    "text_chunk_dups",
    # graph: shortest_paths (r12+r13-verified, birth r10) yields to the
    # new LPA-modularity scorer (graph_modularity, birth r14) — the
    # quality signal for the communities graph_label_propagation
    # (staying in-window) mines on the same backbone; the shortest-path
    # frontier machinery itself stays in-window inside
    # graph_stress_centrality's forward sigma pass, and scc keeps the
    # iterative-graph family's third seat
    "graph_shortest_paths",
    # TPC-H: q14 (promo revenue share — scan-join-agg, birth r11,
    # r12+r13-verified) yields to the substring-cut actuator
    # (dedup_substring_cuts, birth r14), the removal step on top of the
    # new run miner; the q-shape family keeps SEVEN in-window seats
    # (q8/q13/q15/q16/q18/q20/q21) plus q1/q3/q6's veteran record, and
    # q14's scan-join-agg machinery is the family's most redundant
    # shape (dedup_simhash_pairs was considered and rejected — it
    # carries the demoted dedup_simhash dual, registry.py:4908)
    "q14_promo_revenue_share",
    # --- round-15 rotation (zero-sum): ---
    # TPC-H: q13 (customer order-count distribution — outer-join +
    # double agg, birth r3, driver-hashed r11-r14) yields to the
    # intra-document self-run miner (dedup_substring_self_runs, birth
    # r15), completing the substring family's Lee-et-al. coverage
    # (cross-doc runs + intra-doc runs + cuts); the q-shape family
    # keeps SIX in-window seats (q8/q15/q16/q18/q20/q21) plus
    # q1/q3/q6's veteran record, and q13 carries no supplementary dual
    "q13_customer_distribution",
    # TPC-H: q15 (top supplier via revenue view + max-match, birth r3,
    # driver-hashed r11-r14) yields to the cleaned-corpus emitter
    # (dedup_substring_apply, birth r15) — the step that makes the
    # substring family end-to-end actionable (mine → cut → corpus);
    # the q-shape family keeps FIVE in-window seats
    # (q8/q16/q18/q20/q21), and q15's rank-by-agg machinery stays
    # in-window via q18's scored top-k; q15 carries no supplementary
    # dual
    "q15_top_supplier",
    # TPC-H: q16 (supplier count by part — anti-join + distinct agg,
    # birth r3, driver-hashed r11-r14) yields to the mutual-best
    # community merge pass (graph_modularity_merge, birth r15) — the
    # guaranteed-improvement distributed-Louvain coarsening step
    # completing the r14 community arc (mine → score → coarsen); the
    # q-shape family keeps FOUR in-window seats (q8/q18/q20/q21),
    # anti-join machinery stays in-window via q21's double anti/semi
    # stack, and q16 carries no supplementary dual
    "q16_supplier_count_by_part",
    # TPC-H: q20 (heavy-share suppliers — nested semi-joins + share
    # threshold, birth r3, driver-hashed r11-r14) yields to the
    # Louvain coarsening loop (graph_louvain_coarsen, birth r15) —
    # the user-facing N-pass form of the merge step, unrolled in both
    # engines; the q-shape family keeps THREE in-window seats
    # (q8/q18/q21), semi/anti-join machinery stays in-window via
    # q21's double anti/semi stack and q18's scored top-k, and q20
    # carries no supplementary dual
    "q20_heavy_share_suppliers",
    # --- round-16 rotation (zero-sum): ---
    # TPC-H: q8 (market share — multi-join + conditional agg, birth
    # r3, driver-hashed r11-r15) yields to the intra-document cleaned
    # corpus (dedup_substring_self_apply, birth r16) — Lee et al.'s
    # FIRST removal step registered end-to-end (self-runs -> within-doc
    # keep-first cuts -> emitter), closing the substring family's last
    # gap; the q-shape family keeps TWO in-window seats (q18/q21) plus
    # q1/q3/q6's veteran record, q8's multi-join machinery stays
    # in-window via q21's double anti/semi stack and q18's scored
    # top-k join chain, and q8 carries no supplementary dual
    "q8_market_share",
    # --- round-17 rotation (zero-sum): ---
    # dedup: the cross-document cleaned-corpus emitter
    # (dedup_substring_apply, birth r15, driver-hashed r15+r16) yields
    # to the COMPOSED Lee-et-al. pipeline (dedup_substring_pipeline,
    # birth r17) — intra-clean FIRST, then cross-dedup THE CLEANED
    # corpus, whose stage 2 is dedup_substring_apply's exact plan run
    # on the intra-cleaned input (a strictly stronger in-window claim);
    # the substring family keeps runs/cuts/self_apply + both r17
    # newcomers in-window, and dedup_substring_apply stays parity-green
    # every round
    "dedup_substring_apply",
    # dedup: the intra-document run miner (dedup_substring_self_runs,
    # birth r15, driver-hashed r15+r16) yields to the flagged-runs
    # stitcher query (dedup_substring_stitch, birth r17) — the probe ->
    # stitch handoff driver-verified (the one r16 product operator that
    # rested on pytest alone); the self-miner's machinery stays
    # in-window as stage 1 of dedup_substring_pipeline AND inside
    # dedup_substring_self_apply, and the query stays parity-green
    # every round
    "dedup_substring_self_runs",
    # graph: the single mutual-best merge pass (graph_modularity_merge,
    # birth r15, driver-hashed r15+r16) yields to the weighted-sweep
    # evidence query (graph_refine_weighted, birth r17) — the r17
    # weighted refine operator driver-verified row-by-row (sweep + both
    # exact scorings + the guard decision in one hashed row set); the
    # merge machinery stays in-window INSIDE graph_louvain_coarsen and
    # graph_louvain_scored (whose oracles unroll the identical merge
    # chain), and graph_modularity_merge stays parity-green every round
    "graph_modularity_merge",
    # graph: the LPA-backbone modularity scorer (graph_modularity,
    # birth r14, driver-hashed r14+r15) yields to the super-graph
    # scoring query (graph_louvain_scored, birth r16) — a strictly
    # STRONGER claim on the same machinery: the Spark side scores the
    # coarsened partition on the weighted community super-graph while
    # the oracle scores it on the full edge list, so the driver hash
    # match verifies the contraction-invariance lemma on real data;
    # the exact-HUGEINT rollup graph_modularity pins stays in-window
    # inside the new oracle, and the graph family keeps
    # merge/coarsen/scored + scc/lpa/stress in-window
    "graph_modularity",
    # --- round-18 rotation (zero-sum): ---
    # graph: the super-graph scoring query (graph_louvain_scored,
    # birth r16, driver-hashed r16+r17) yields to the guarded-sweep
    # ADOPT evidence (graph_refine_adopt, birth r18) — the one
    # refine-family branch with no driver-verified instance (VERDICT
    # r17 next-round #2: every deterministic seed on the purchase
    # super-graph is guard-rejected, so graph_refine_weighted's hashed
    # verdict is always REJECT); the scored machinery stays in-window
    # INSIDE graph_louvain_coarsen (same loop, same cache) and its
    # weighted scorer inside both refine evidence queries, and
    # graph_louvain_scored stays parity-green every round
    "graph_louvain_scored",
    # dedup: the intra-document cleaned corpus
    # (dedup_substring_self_apply, birth r16, driver-hashed r16+r17)
    # yields to the incremental per-drop shape
    # (dedup_substring_incremental, birth r18) — the substring
    # family's batch×corpus ingest counterpart of
    # dedup_incremental_lsh (VERDICT r17 next-round #5); the
    # self-apply machinery stays in-window VERBATIM as stage 1 of
    # dedup_substring_pipeline (same miner, same cuts, same apply
    # projection), and dedup_substring_self_apply stays parity-green
    # every round
    "dedup_substring_self_apply",
    # graph: the brute-force betweenness-style centrality
    # (graph_stress_centrality, birth r13, driver-hashed r16+r17)
    # yields to the coarsen loop's composed pass body
    # (graph_refine_pass, birth r18) — the merge-then-guarded-sweep
    # composition louvain_coarsen(refine='guarded') runs per pass,
    # driver-verified on the trade backbone where the sweep strictly
    # improves the matching's own output; the graph family keeps
    # scc/lpa/coarsen/refine_weighted/refine_adopt in-window, and
    # graph_stress_centrality stays parity-green every round
    "graph_stress_centrality",
    # tpc-h: the scored top-k join chain (q18_large_volume_customers,
    # birth r3, driver-hashed r16+r17) yields to the two-pass refined
    # coarsening trace (graph_refine_loop, birth r18) — the full
    # louvain_coarsen(refine='guarded') iteration as one hashed row
    # set, both guard branches firing in a single run and the
    # contraction-invariance lemma verified per row via q_final_e6;
    # the q-shape family keeps q21's double anti/semi stack in-window
    # and q18 stays parity-green every round (its scored-top-k
    # machinery also lives on in-window via the WindowGroupLimit
    # curation family)
    "q18_large_volume_customers",
)


def _apply_check_window() -> None:
    """Re-order the registries so demoted queries sit after the driver's
    50-slot window.  Idempotent (pop + tail re-insert), and called
    lazily from :func:`queries` / :func:`oracle_sql` rather than at
    import time — the plan modules (analytics/extras) register on
    import, and a consumer importing one of THEM first would otherwise
    trigger the window check mid-registration (circular import leaves
    this module fully loaded while the sibling is still registering)."""
    for name in (*SUPPLEMENTARY_QUERIES, *EXTENDED_QUERIES):
        _QUERIES[name] = _QUERIES.pop(name)  # re-insert at the tail
        if name in _ORACLES:
            _ORACLES[name] = _ORACLES.pop(name)
    n_primary = len(_QUERIES) - len(SUPPLEMENTARY_QUERIES) - len(
        EXTENDED_QUERIES
    )
    if n_primary > DRIVER_CHECK_WINDOW:
        raise AssertionError(
            f"{n_primary} primary queries exceed the driver's "
            f"{DRIVER_CHECK_WINDOW}-query check window; demote a dual to "
            f"SUPPLEMENTARY_QUERIES or consolidate"
        )
