"""Refreshable dimension cache — freshness vs. re-read cost, managed.

The reference re-reads its JDBC city dimension EVERY micro-batch
(reference ``bexley_spark_stream_msk_es.py:254-285`` called from the
stream loop) — correct but wasteful; this engine's enrichment caches
the dim once — cheap but eventually stale.  ``RefreshableDim`` is the
production middle path: serve the cached dimension until a TTL
expires, then atomically re-load, re-persist, and drop the old copy.

Inside ``foreachBatch`` the getter runs driver-side per epoch, so the
re-read amortizes to (batch_interval / ttl) of the reference's cost
while bounding staleness to the TTL — the knob the reference lacked.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class RefreshableDim:
    """TTL-cached dimension.

    ``loader``: builds the dim (JDBC read, parquet scan, ...).
    ``ttl_seconds``: maximum staleness; ``<= 0`` reloads every call
    (the reference's behavior, for comparison/tests).
    """

    loader: Callable[[SparkSession], DataFrame]
    ttl_seconds: float = 300.0
    n_loads: int = field(default=0, init=False)
    _df: DataFrame | None = field(default=None, init=False, repr=False)
    _loaded_at: float = field(default=0.0, init=False, repr=False)

    def get(self, spark: SparkSession) -> DataFrame:
        now = time.monotonic()
        if self._df is None or now - self._loaded_at > self.ttl_seconds:
            old = self._df
            fresh = self.loader(spark).persist()
            fresh.count()  # materialize before swapping so readers never stall
            self._df = fresh
            self._loaded_at = now
            self.n_loads += 1
            if old is not None:
                old.unpersist()
        return self._df

    def invalidate(self) -> None:
        """Force the next ``get`` to reload (e.g. after an upstream
        dim publish completes)."""
        self._loaded_at = float("-inf")
