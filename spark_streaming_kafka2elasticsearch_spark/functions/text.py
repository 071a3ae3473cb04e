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


def md5_hash64(c: Column | str) -> Column:
    """Cross-engine 64-bit hash: the first 16 hex chars of md5,
    read big-endian as a SIGNED 64-bit integer (Java ``<<`` wrap).

    ``xxhash64`` never leaves the JVM, so anything built on it is
    un-oracle-able; md5 agrees bit-for-bit across Spark / DuckDB /
    Postgres, which makes fingerprints built on this hash (SimHash)
    value-checkable by the driver's DuckDB gate.  Hash quality is
    equivalent for sketching (both uniform on 64 bits); md5 costs more
    cycles per token than xxhash64, but the explode+aggregate around it
    dominates either way.  DuckDB twin::

        CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT)  -- hi 32
        CAST(concat('0x', substr(md5(tok), 9, 8)) AS BIGINT)  -- lo 32
        -- bit j of the hash = (lo >> j) & 1  for j < 32,
        --                     (hi >> (j-32)) & 1 otherwise.
    """
    hx = F.md5(_as_col(c))
    hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


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
