"""Text-analysis expressions — tokenization, ratios, counts.

Built-in string/regexp Catalyst functions only; these are the scalar
layer under the document-pipeline operators (dedup, quality scoring,
language ID).  Token semantics are pinned to a single definition —
split on runs of whitespace, drop empties — so Spark results and
ANSI-SQL oracles agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str) -> Column:
    """Whitespace tokens with empties removed (array<string>)."""
    t = _as_col(text)
    return F.filter(F.split(t, r"\s+"), lambda x: x != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def punct_count(text: Column | str) -> Column:
    """Number of ASCII punctuation characters ``.,;:!?``."""
    t = _as_col(text)
    return F.length(t) - F.length(F.regexp_replace(t, r"[.,;:!?]", ""))


def alpha_ratio(text: Column | str) -> Column:
    """Fraction of characters that are ASCII letters (0 for empty)."""
    t = _as_col(text)
    total = F.length(t)
    alpha = total - F.length(F.regexp_replace(t, r"[A-Za-z]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(
        alpha.cast("double") / total.cast("double")
    )
