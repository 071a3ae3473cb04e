"""Declarative pipeline composition.

The reference wires its stages imperatively in ``main()`` (reference
``bexley_spark_stream_msk_es.py:132-181``) — a linear DAG
``kafka → parse → curate → join(dim) → sink`` with a try/except +
``sys.exit(1)`` wrapper around every stage (its fail-fast policy, I6).

``Pipeline`` captures the same shape declaratively: a source, an
ordered list of named ``DataFrame -> DataFrame`` transforms, and a
sink.  Because transforms are pure functions, the same pipeline runs
in batch mode (tests/oracles) and streaming mode (prod) — the
testability the reference's design comment asks for (``:374-377``).

Stage boundaries are logged; failures are logged with the stage name
and re-raised (fail-fast without swallowing the trace — an engine,
unlike a job, must not ``sys.exit`` from library code).
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

logger = logging.getLogger("spark_streaming_kafka2elasticsearch_spark")

Transform = Callable[[DataFrame], DataFrame]


@dataclass
class Pipeline:
    """Linear source → transforms → sink DAG."""

    source: Any  # object with load(spark) and/or load_stream(spark)
    transforms: list[tuple[str, Transform]] = field(default_factory=list)

    def then(self, name: str, fn: Transform) -> "Pipeline":
        self.transforms.append((name, fn))
        return self

    def _apply(self, df: DataFrame) -> DataFrame:
        for name, fn in self.transforms:
            try:
                df = fn(df)
                logger.info("stage %s: ok", name)
            except Exception:
                logger.exception("stage %s: failed", name)
                raise
        return df

    def build(self, spark: SparkSession) -> DataFrame:
        """Batch plan (lazy — nothing executes until an action)."""
        return self._apply(self.source.load(spark))

    def build_stream(self, spark: SparkSession, **source_kwargs: Any) -> DataFrame:
        """Streaming plan; start it with a sink from ``streaming.sinks``."""
        return self._apply(self.source.load_stream(spark, **source_kwargs))
