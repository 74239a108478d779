"""Cache-lifecycle tests: persisted intermediates must not outlive their query.

Round-3 VERDICT flagged that the recall-eval queries (and the dedup
operators' inverted-index caches) persist() without unpersist(), so a
long-lived session accumulates blocks until the ContextCleaner happens to
reclaim them.  session.scope_caches ties each persist to the lifetime of
the frame the caller actually holds; these tests assert the blocks are
gone from the block manager once the result is dropped.
"""

from __future__ import annotations

import gc
import time

from stedi_human_balance_redis_kafka_spark_streaming_spark.operators import dedup
from stedi_human_balance_redis_kafka_spark_streaming_spark.plans import registry
from stedi_human_balance_redis_kafka_spark_streaming_spark.sources.files import load_table


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _assert_drains_to(spark, baseline: int) -> None:
    # unpersist(blocking=False) removes the RDD from the persistentRdds
    # map synchronously; poll briefly anyway to absorb finalizer timing.
    # localCheckpoint RDDs (CC label rounds) are reclaimed by the
    # ContextCleaner only after a JVM GC surfaces their weak refs — the
    # same mechanism session.py's periodicGC interval relies on — so the
    # poll nudges the JVM collector too.
    for _ in range(50):
        if _persistent_rdd_count(spark) <= baseline:
            return
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.2)
    assert _persistent_rdd_count(spark) <= baseline


def test_operator_self_scope_releases_caches(spark, sf_dir):
    spark.catalog.clearCache()
    baseline = _persistent_rdd_count(spark)
    docs = load_table(spark, sf_dir, "documents")
    result = dedup.minhash_lsh_pairs(docs, threshold=0.7, shingle_n=3)
    assert _persistent_rdd_count(spark) > baseline  # index + candidates live
    result.count()
    del result
    _assert_drains_to(spark, baseline)


def test_recall_query_releases_all_caches(spark, sf_dir):
    spark.catalog.clearCache()
    baseline = _persistent_rdd_count(spark)
    result = registry.queries()["dedup_lsh_recall"](spark, sf_dir)
    rows = result.collect()
    assert len(rows) == 1
    assert _persistent_rdd_count(spark) > baseline
    del result
    _assert_drains_to(spark, baseline)


def test_caches_survive_until_action(spark, sf_dir):
    # The scope must NOT evict eagerly: while the caller holds the result,
    # the operators' eagerly-materialized caches stay hot for the action.
    spark.catalog.clearCache()
    baseline = _persistent_rdd_count(spark)
    docs = load_table(spark, sf_dir, "documents")
    caches: list = []
    pairs = dedup.ngram_jaccard_pairs(
        docs, threshold=0.7, n=3, max_shingle_freq=64, caches=caches
    )
    assert len(caches) == 1
    n_live = _persistent_rdd_count(spark)
    assert n_live > baseline
    gc.collect()
    assert _persistent_rdd_count(spark) == n_live  # nothing released early
    pairs.count()
    for c in caches:
        c.unpersist(False)
    _assert_drains_to(spark, baseline)


def test_multi_signal_caches_live_through_execution_then_release(spark, sf_dir):
    """dedup_multi_signal threads the pair-generators' index caches out
    via the caches= seam and scopes them (plus the persisted evidence
    graph) to ITS result — the round-4 fix for the finalizer firing on
    the immediately-dropped inner frame and unpersisting the index
    before execution."""
    spark.catalog.clearCache()
    baseline = _persistent_rdd_count(spark)
    result = registry.queries()["dedup_multi_signal"](spark, sf_dir)
    # caches must still be registered while the caller holds the result
    assert _persistent_rdd_count(spark) > baseline
    rows = result.collect()
    assert rows
    assert _persistent_rdd_count(spark) > baseline
    del result
    _assert_drains_to(spark, baseline)


def test_srp_pairs_self_scope_releases_caches(spark, sf_dir):
    """ADVICE r13 #2 regression pin: srp_lsh_pairs with caches=None
    (property tests, plan audits, direct use) must release its two
    persisted frames (flattened verify frame + signature frame) once
    the caller drops the result."""
    from stedi_human_balance_redis_kafka_spark_streaming_spark.sources.files import (
        load_table,
    )

    spark.catalog.clearCache()
    baseline = _persistent_rdd_count(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    result = dedup.srp_lsh_pairs(emb, threshold=0.4)
    result.count()
    assert _persistent_rdd_count(spark) > baseline
    del result
    _assert_drains_to(spark, baseline)


def test_followed_by_self_scope_releases_caches(spark):
    """ADVICE r13 #2 regression pin, associations side: the persisted
    (seq, item) first/last frame scopes to the returned rules frame
    when caches=None."""
    from stedi_human_balance_redis_kafka_spark_streaming_spark.operators import (
        associations,
    )

    spark.catalog.clearCache()
    baseline = _persistent_rdd_count(spark)
    ev = spark.createDataFrame(
        [(f"s{i % 3}", "ab"[i % 2], i, i) for i in range(12)],
        "sid string, item string, ts long, eid long",
    )
    result = associations.followed_by_pairs(
        ev, min_support=1, seq_col="sid", item_col="item",
        order_cols=("ts", "eid"),
    )
    result.count()
    del result
    _assert_drains_to(spark, baseline)


def test_substring_runs_self_scope_releases_caches(spark, sf_dir):
    """substring_run_pairs persists the gram frame once for its four
    consumers; caches=None callers must not leak it."""
    from stedi_human_balance_redis_kafka_spark_streaming_spark.sources.files import (
        load_table,
    )

    spark.catalog.clearCache()
    baseline = _persistent_rdd_count(spark)
    docs = load_table(spark, sf_dir, "documents")
    result = dedup.substring_run_pairs(docs)
    result.count()
    assert _persistent_rdd_count(spark) > baseline
    del result
    _assert_drains_to(spark, baseline)


def test_modularity_query_releases_all_caches(spark, sf_dir):
    """graph_modularity threads LPA's checkpoint handle + two persists
    through caches/scope_caches; everything drains once the scored
    frame is dropped."""
    spark.catalog.clearCache()
    baseline = _persistent_rdd_count(spark)
    result = registry.queries()["graph_modularity"](spark, sf_dir)
    rows = result.collect()
    assert len(rows) >= 1
    del result
    _assert_drains_to(spark, baseline)
