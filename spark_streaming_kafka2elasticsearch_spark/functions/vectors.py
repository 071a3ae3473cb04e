"""Vector math over ``array<float>`` embedding columns — pure Catalyst.

``F.zip_with`` + ``F.aggregate`` keep the arithmetic JVM-side: a dot
product over a 64-dim embedding is ~64 fused multiply-adds inside
codegen, no Python round-trip, no UDF.  All accumulation is in DOUBLE
(embeddings are float32 on disk; we up-cast once) and is a sequential
left-fold, so results are deterministic and reproducible across
partitionings — required for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in double precision."""
    a, b = _as_col(a), _as_col(b)
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    """‖a‖₂ in double precision."""
    a = _as_col(a)
    sq = F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) = a·b / (‖a‖‖b‖); null-safe on zero vectors."""
    a, b = _as_col(a), _as_col(b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(None)).otherwise(dot_product(a, b) / denom)
