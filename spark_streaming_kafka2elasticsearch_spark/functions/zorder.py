"""Z-order (Morton) clustering keys — multi-dimensional data layout.

Sorting a table by a Z-order key interleaving two dimensions makes
BOTH dimensions' min/max ranges narrow within every file/row-group, so
parquet footer stats prune scans for predicates on either dimension
(or both).  A plain sort gives that property to its leading column
only.  This is the standard lakehouse clustering trick (Delta/Iceberg
``OPTIMIZE ZORDER BY``) expressed with nothing but built-in bit
expressions — codegen'd, zero UDF.

Usage at scale: ``df.repartitionByRange(N, zorder_key(...))`` +
``sortWithinPartitions`` before the write; the key is layout-only and
never stored unless asked.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` of two integer columns:
    result bit 2i = bit i of ``a``, bit 2i+1 = bit i of ``b``.  Inputs
    are masked to ``bits`` first, so callers quantize (bucket, clamp,
    or rank) wider domains down to ``bits`` beforehand — for layout
    purposes coarse quantization is exactly right."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31] (two lanes must fit a long)")
    mask = (1 << bits) - 1
    av = (F.col(a) if isinstance(a, str) else a).cast("long").bitwiseAND(F.lit(mask))
    bv = (F.col(b) if isinstance(b, str) else b).cast("long").bitwiseAND(F.lit(mask))
    k = F.lit(0).cast("long")
    for i in range(bits):
        k = k.bitwiseOR(
            F.shiftleft(F.shiftright(av, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(bv, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return k


def zorder_key_oracle_sql(a: str, b: str, bits: int = 16) -> str:
    """ANSI/DuckDB twin of :func:`zorder_key` — the same interleave
    spelled as a shift/mask sum, generated mechanically so the two
    implementations cannot drift."""
    mask = (1 << bits) - 1
    # Every term fully parenthesized: DuckDB gives | and << EQUAL
    # precedence (left-assoc), so a bare `x << 0 | y << 1` chains the
    # shifts and overflows.
    terms = []
    for i in range(bits):
        terms.append(f"(((({a} & {mask}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({b} & {mask}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"
