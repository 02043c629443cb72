"""Feature-store (Redis-style) streaming sink.

The reference materializes features to Redis as a destination
(proto/kaskada/kaskada/v1alpha/destinations.proto:10-16, wired through
the materialize flow). The Spark rendering is a ``foreachBatch``
callable that reduces each micro-batch to the LATEST value per entity
(max_by over the event order — a distributed hash agg, not a driver
loop) and writes key/value pairs from the executors via
``foreachPartition`` — one client connection per partition, never a
driver-side bottleneck.

The sandbox has no Redis server or client library, so the default
client factory is import-gated with a clear error; tests inject a
file-backed fake with the same ``set`` contract. Swapping in
``lambda: redis.Redis(host=...)`` is the only production change.

Idempotency: writes are plain SET of the latest value keyed by entity —
re-running a batch after a crash rewrites the same keys with the same
values, so replay is naturally exactly-once for feature lookups.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _default_client_factory():
    try:
        import redis  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "FeatureStoreSink needs a client: pip install redis and pass "
            "client_factory=lambda: redis.Redis(host=..., port=...), or "
            "inject any object with .set(key, value)"
        ) from e
    return redis.Redis()


class FeatureStoreSink:
    """``foreachBatch`` callable writing latest-per-entity feature rows.

    Parameters
    ----------
    key_col: entity column; the store key is ``prefix + str(key)``.
    value_cols: feature columns serialized as a JSON object per key.
    order_cols: event-order columns for "latest" (default the universal
        ``(_time, _subsort)``); rows lacking them fall back to arbitrary
        last-wins within the batch.
    client_factory: zero-arg callable returning an object with
        ``set(key: str, value: str)`` — one instance per partition.
    """

    def __init__(
        self,
        key_col: str,
        value_cols: Sequence[str],
        prefix: str = "kaskada:",
        order_cols: Sequence[str] = ("_time", "_subsort"),
        client_factory: Callable | None = None,
    ):
        self.key_col = key_col
        self.value_cols = list(value_cols)
        self.prefix = prefix
        self.order_cols = list(order_cols)
        self.client_factory = client_factory or _default_client_factory

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        have_order = all(c in df.columns for c in self.order_cols)
        val_struct = F.struct(*[F.col(c) for c in self.value_cols])
        if have_order:
            order = F.struct(*[F.col(c) for c in self.order_cols])
            latest = df.groupBy(self.key_col).agg(
                F.max_by(val_struct, order).alias("__v")
            )
        else:
            latest = df.groupBy(self.key_col).agg(F.last(val_struct).alias("__v"))
        prefix, key_col, value_cols = self.prefix, self.key_col, self.value_cols
        factory = self.client_factory

        def write_partition(rows) -> None:
            client = factory()
            for r in rows:
                payload = {c: r["__v"][c] for c in value_cols}
                client.set(prefix + str(r[key_col]), json.dumps(payload, default=str))

        latest.foreachPartition(write_partition)
