"""Environment-invariance audits: results must not depend on the
session timezone or the physical shuffle layout.

These enforce two standing claims:

* ``sources/files.load_table`` anchors ``events.ts`` as-if-UTC with
  pure NTZ arithmetic, so epoch math is identical under ANY driver
  session timezone (a plain NTZ→TIMESTAMP cast would shift it).
* Integer-quantized/total-ordered operators (k-means centroids, hash
  sampling, ADC sums, rank tie-breaks) are partition-order-independent.

The perturbed configs are runtime-settable SQL confs, applied to the
shared session and restored afterwards — queries must give the SAME
rows either way.
"""

from __future__ import annotations

import contextlib

import pytest

from stedi_human_balance_redis_kafka_spark_streaming_spark.plans import registry

ORACLE_SF = "/root/testdata/sf0.01"

# Representative set: timestamp epoch math, money aggregation, hash
# sampling over a computed rate, trained+spilled index, ADC ranking.
QUERIES = [
    "events_rolling_value",
    "events_session_window",
    "events_asof_last_order",   # NTZ↔instant as-of mix + string render
    "events_interval_activity", # range-join time cells from mixed dtypes
    "stedi_risk_events",        # riskDate string render in the payload
    "q1_pricing_summary",
    "curation_rebalance",
    "dedup_embedding_bucketed",
    "ann_pq_recall",
    "events_funnel",            # epoch-micros funnel hops under tz change
    "events_gapfill_locf",      # dense-axis window carry on epoch buckets
    "curation_upsample",        # hash-gated fractional copies
    "text_bpe_merges",          # weighted argmax rounds + string rewrites
    "lineitem_bloom_prune_revenue",  # bloom build/probe position math
    "events_anomaly_outliers",  # decimal(38,0) z-gate across partitionings
    "trade_graph_pagerank",     # iterative integer rounds, lineage-checkpointed
    "curation_sample_weighted", # weighted hash priorities + rank tie-breaks
    "events_cusum_changepoints",  # ts-ordered prefix windows under tz change
    "ann_mmr_topk",             # integer greedy selection, cached builds
    "curation_chunk_pipeline",  # hash split + window carry composition
    "orders_monthly_momentum",  # NTZ month render must not shift months
    "graph_pagerank_dangling",  # sink-mass share must be partition-invariant
    "curation_quality_score",   # integer blend across partitionings
    "graph_pagerank_weighted",  # decimal-widened weight shares
    "dedup_ngram_prefix",       # prefix boundary + rank ties across parts
    "graph_triangle_count",     # orientation ties across partitionings
    "orders_basket_affinity",   # exact pair counts + integer div metrics
    "graph_scc",                # trim/pivot/coloring labels across parts
]


@contextlib.contextmanager
def _perturbed(spark, tz="America/New_York", parts="7"):
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.session.timeZone", tz)
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


@pytest.mark.parametrize("name", QUERIES)
def test_results_invariant_to_timezone_and_partitions(spark, name):
    fn = registry.queries()[name]
    base = sorted(map(tuple, fn(spark, ORACLE_SF).collect()))
    with _perturbed(spark):
        perturbed = sorted(map(tuple, fn(spark, ORACLE_SF).collect()))
    assert perturbed == base


# East-of-UTC is the direction that shifts a midnight-NTZ 1st-of-month
# into the PREVIOUS month if it is wrongly routed through an
# instant-style convert_timezone render — exercise it explicitly for
# the calendar-keyed queries (America/New_York only covers the west
# direction).
EAST_TZ_QUERIES = [
    "orders_monthly_momentum",
    "events_asof_last_order",
    "stedi_risk_events",
]


@pytest.mark.parametrize("name", EAST_TZ_QUERIES)
def test_results_invariant_under_east_of_utc_zone(spark, name):
    fn = registry.queries()[name]
    base = sorted(map(tuple, fn(spark, ORACLE_SF).collect()))
    with _perturbed(spark, tz="Asia/Tokyo"):
        perturbed = sorted(map(tuple, fn(spark, ORACLE_SF).collect()))
    assert perturbed == base


@contextlib.contextmanager
def _foreign_session_confs(spark):
    """A driver session the engine does not control: ANSI off, AQE off."""
    old = {
        k: spark.conf.get(k)
        for k in ("spark.sql.ansi.enabled", "spark.sql.adaptive.enabled")
    }
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


# Engine behavior must not depend on ANSI mode (no silent-null vs throw
# divergence on any exercised path) or on AQE being there to fix plans.
CONF_QUERIES = [
    "stedi_customer_risk_join",  # decode chain: try_to_binary/F.get paths
    "dedup_embedding_recall",    # gated baseline + trained/spilled index
    "q8_market_share",           # decimal-widened integer shares
    "events_interval_activity",  # bucketed range join (AQE-skew claimed)
]


@pytest.mark.parametrize("name", CONF_QUERIES)
def test_results_invariant_to_ansi_and_aqe(spark, name):
    fn = registry.queries()[name]
    base = sorted(map(tuple, fn(spark, ORACLE_SF).collect()))
    with _foreign_session_confs(spark):
        foreign = sorted(map(tuple, fn(spark, ORACLE_SF).collect()))
    assert foreign == base
