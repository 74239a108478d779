"""Ingest-time index-build cache (shared by trained k-means centroids,
PQ codebooks, and the verified near-dup pair graph).

Index TRAINING / pair-graph VERIFICATION is an ingest-time build step,
not a per-query cost: a production system builds these artifacts once
when the corpus is (re)ingested and every query reads the built result.
Every build routed through here is fully deterministic (integer k-means,
fixed iters/seeds, exact-integer Jaccard), so cached rows are
bit-identical to rebuilding — correctness is unaffected, only the
redundant rebuild is skipped.  Entries are plain Python rows (kilobytes
— NOT Spark blocks), keyed by an explicit caller-provided corpus key
(which should embed a data fingerprint — ``sources.files.
table_fingerprint`` — so a regenerated corpus at the same path can
never be served a stale artifact) plus every build parameter.

The cache is LRU-bounded (``MAX_ENTRIES``): a long-lived session
training over many corpora evicts its oldest builds instead of growing
without bound.  ``invalidate()`` clears it explicitly (tests, corpus
rewrites within one process when a fingerprint is not practical).
"""

from __future__ import annotations

from collections import OrderedDict

MAX_ENTRIES = 32

INDEX_BUILD_CACHE: "OrderedDict[tuple, list[tuple]]" = OrderedDict()


def lookup(key: tuple) -> list[tuple] | None:
    """Return the cached rows for ``key`` (refreshing its LRU position),
    or None on a miss."""
    rows = INDEX_BUILD_CACHE.get(key)
    if rows is not None:
        INDEX_BUILD_CACHE.move_to_end(key)
    return rows


def store(key: tuple, rows: list[tuple]) -> None:
    """Insert ``rows`` under ``key``, evicting least-recently-used
    entries beyond ``MAX_ENTRIES``."""
    INDEX_BUILD_CACHE[key] = rows
    INDEX_BUILD_CACHE.move_to_end(key)
    while len(INDEX_BUILD_CACHE) > MAX_ENTRIES:
        INDEX_BUILD_CACHE.popitem(last=False)


def invalidate(prefix: str | None = None) -> int:
    """Drop every entry (or only those whose corpus key — element [1] of
    the tuple — equals ``prefix``).  Returns the number evicted."""
    if prefix is None:
        n = len(INDEX_BUILD_CACHE)
        INDEX_BUILD_CACHE.clear()
        return n
    victims = [k for k in INDEX_BUILD_CACHE if len(k) > 1 and k[1] == prefix]
    for k in victims:
        del INDEX_BUILD_CACHE[k]
    return len(victims)
