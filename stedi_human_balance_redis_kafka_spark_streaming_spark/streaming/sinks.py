"""Streaming sinks beyond Kafka/console: Redis via foreachBatch, memory test sink.

The reference delegates Redis writes to the external STEDI app; the north
star internalizes a Redis **sink**.  ``foreachBatch`` gives exactly-once
per micro-batch (idempotent on replay when the write is keyed), and the
redis client is import-gated — absent in this container, the sink raises
a clear error at *start* time, not at import.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def _write_partition_to_redis(
    rows, host: str, port: int, key_col: str, value_col: str, client_factory=None
):
    if client_factory is None:
        import redis  # gated: not bundled in this container

        client = redis.Redis(host=host, port=port)
    else:
        client = client_factory(host, port)
    pipe = client.pipeline(transaction=False)
    for row in rows:
        pipe.set(row[key_col], row[value_col])
    pipe.execute()


def redis_set_sink(
    df: DataFrame,
    *,
    key_col: str = "key",
    value_col: str = "value",
    host: str = "localhost",
    port: int = 6379,
    checkpoint_location: str,
    client_factory=None,
) -> StreamingQuery:
    """Write (key, value) rows to Redis as SETs, one pipeline per partition.

    Executor-side connections (inside foreachPartition), never a driver
    collect — the batch streams partition-parallel into Redis.

    ``client_factory`` (picklable ``(host, port) -> client``) substitutes
    the redis-py constructor — the seam that lets the full executor-side
    write path run under test without a server (and the hook for auth /
    cluster-mode clients in production).
    """
    if client_factory is None:
        try:
            import redis  # noqa: F401
        except ImportError as e:  # pragma: no cover - depends on environment
            raise ImportError(
                "redis-py is not installed in this environment; "
                "redis_set_sink requires it at runtime"
            ) from e

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        batch.foreachPartition(
            lambda rows: _write_partition_to_redis(
                rows, host, port, key_col, value_col, client_factory
            )
        )

    return (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_location)
        .outputMode("append")
        .start()
    )


def foreach_batch_sink(
    df: DataFrame,
    handler: Callable[[DataFrame, int], None],
    *,
    output_mode: str = "append",
) -> StreamingQuery:
    """Generic foreachBatch sink (the extension point redis_set_sink uses);
    also the test harness for sink plumbing without external services."""
    return df.writeStream.foreachBatch(handler).outputMode(output_mode).start()
