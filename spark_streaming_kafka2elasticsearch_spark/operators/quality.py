"""Data-quality expectations — the admission gate of a data pipeline.

A training-data or warehouse load wants cheap, declarative checks
(null ratios, key uniqueness, referential integrity, range bounds)
evaluated BEFORE data is published, with a machine-readable report.
This module expresses each check as Catalyst aggregates so an entire
rule set costs one pass over the table (conditional-count aggregates
fuse into a single partial-agg stage — no per-rule scans), plus one
key-distinct and one anti-join when those rule kinds are present.

At 100 TB that shape matters: N rules must not mean N scans, FK
orphan checks must not shuffle the fact table when the dimension key
set broadcasts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_ratio_report(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(column, n_rows, n_null, null_ratio) per requested column —
    one aggregate pass for the whole set, then a constant-size
    unpivot driver-side (rule count, not data, bounds the stack)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"_null_{c}"))
    row = df.agg(*aggs)
    stacked = None
    for c in cols:
        part = row.select(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"_null_{c}").alias("n_null"),
        )
        stacked = part if stacked is None else stacked.unionByName(part)
    return stacked.select(
        "column",
        "n_rows",
        "n_null",
        F.when(F.col("n_rows") == 0, F.lit(0.0))
        .otherwise(F.col("n_null").cast("double") / F.col("n_rows"))
        .alias("null_ratio"),
    )


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Key tuples appearing more than once, with multiplicity —
    empty result ⇔ the key is unique.  One shuffle on the key."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def fk_orphans(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
) -> DataFrame:
    """Fact rows whose key has no dimension match (referential-
    integrity violations).  Anti join against the DISTINCT dim key
    set — keys-only build side so it broadcasts whenever the
    dimension's key cardinality allows, leaving the fact unshuffled."""
    keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    return fact.join(keys, fact_key, "left_anti")


def with_observed_quality(
    df: DataFrame, name: str, cols: Sequence[str]
) -> tuple[DataFrame, "object"]:
    """Piggyback the null/row-count quality metrics on whatever action
    the caller already runs (``df.observe`` + ``Observation``) —
    the zero-extra-pass alternative to :func:`null_ratio_report`.

    ``null_ratio_report`` spends a dedicated aggregate job, which is
    right for a standalone admission gate; but when the table is about
    to be WRITTEN anyway, observed metrics ride the write's own scan
    for free — at 100 TB the difference is literally one full pass of
    the corpus.  Returns ``(observed_df, observation)``: run exactly
    one action on ``observed_df``, then read ``observation.get`` —
    a dict with ``n_rows`` and ``n_null_<col>`` per requested column.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        metrics.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"n_null_{c}"))
    return df.observe(obs, *metrics), obs
