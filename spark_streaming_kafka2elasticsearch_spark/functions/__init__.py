"""Column-expression library.

Pure ``Column -> Column`` builders shared by operators and queries.
Everything here is built-in Catalyst expressions (JVM-side, codegen'd)
— no Python UDFs — so these compose into WholeStageCodegen and cost
the same as hand-written SQL at any scale.
"""

from spark_streaming_kafka2elasticsearch_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)
from spark_streaming_kafka2elasticsearch_spark.functions.text import (
    alpha_ratio,
    punct_count,
    token_count,
    tokens,
)

__all__ = [
    "alpha_ratio",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "punct_count",
    "token_count",
    "tokens",
]
