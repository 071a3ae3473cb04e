"""Deduplication operators — exact and near-duplicate.

The training-data-pipeline extension family: at 100 TB, dedup is the
dominant corpus-curation cost, and the scale story differs per flavor:

* **exact** — a hash-groupBy: one shuffle on the text hash (not the
  text!), map-side partial aggregation, linear.
* **fingerprint** — same, after whitespace/case canonicalization.
* **MinHash + LSH banding** — signatures are a narrow map (k hashes ×
  shingles per doc, all in codegen); banding turns O(n²) pair search
  into a groupBy on (band, band-hash) — candidate pairs only where a
  band collides; a final exact-Jaccard verify prunes false positives.
  The shuffle volume is |docs|×|bands| small fixed-width rows.
* **blocked n-gram Jaccard** — exact Jaccard within user-supplied
  blocking keys; the block join is a shuffle on the block key.

Everything is built-in Catalyst (higher-order array functions +
xxhash64); no UDFs, no driver-side loops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_streaming_kafka2elasticsearch_spark.functions.text import tokens

# ---------------------------------------------------------------------------
# exact / fingerprint dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(
    df: DataFrame, key_cols: Sequence[str], id_col: str
) -> DataFrame:
    """One row per distinct key: canonical (min) id + duplicate count.
    The group-by key should be a hash for wide text columns — see the
    query layer — so the shuffle moves 16 bytes, not documents."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("canonical_" + id_col),
        F.count(F.lit(1)).alias("n_dupes"),
    )


def exact_dedup(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Keep one arbitrary row per key (Spark's native dropDuplicates)."""
    return df.dropDuplicates(list(key_cols))


# ---------------------------------------------------------------------------
# shingles + MinHash
# ---------------------------------------------------------------------------


def shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct k-token shingles (array<string>), space-joined.

    ``slice`` + ``concat_ws`` over a ``sequence`` — pure codegen.  Docs
    shorter than k tokens yield their full token join as one shingle so
    no document silently disappears from dedup.
    """
    t = F.col(text) if isinstance(text, str) else text
    toks = tokens(t)
    n = F.size(toks)
    k_lit = F.lit(k)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - k_lit + 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.array_distinct(F.filter(grams, lambda g: g != ""))


def minhash_signature(shingle_col: Column | str, num_hashes: int = 64) -> Column:
    """MinHash signature (array<bigint>, length ``num_hashes``).

    Hash family: ``xxhash64(shingle, seed=i)`` for i in 0..n-1 — Spark's
    xxhash64 takes the seed as a literal, giving n independent 64-bit
    hash functions with zero Python involvement.  Empty shingle sets
    get MaxLong sentinels (no collisions with real docs).
    """
    s = F.col(shingle_col) if isinstance(shingle_col, str) else shingle_col
    max_long = F.lit(9223372036854775807)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.coalesce(
            F.array_min(F.transform(s, lambda sh: F.xxhash64(sh, i))), max_long
        ),
    )


def minhash_lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k_shingle: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding, verified with exact
    shingle Jaccard.  Output: (id_a, id_b, jaccard) with id_a < id_b.

    Plan shape (the 100 TB story):
      1. narrow map: shingles → signature (no shuffle);
      2. explode to |docs|×|bands| rows of (band_id, band_hash, id) —
         fixed-width, tiny;
      3. shuffle groupBy (band_id, band_hash): docs sharing a band
         bucket become candidates — self-join avoided by collecting
         bucket members and emitting intra-bucket pairs;
      4. distinct pairs, then one hash join back to fetch shingle sets
         and compute exact Jaccard (ints → double, deterministic).
    """
    rows_per_band = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("_id"), shingles(text_col, k_shingle).alias("_shingles")
    ).withColumn("_sig", minhash_signature("_shingles", num_hashes))

    banded = base.select(
        "_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("_id", "band.band_id", "band.band_hash")

    buckets = banded.groupBy("band_id", "band_hash").agg(
        F.array_sort(F.collect_set("_id")).alias("members")
    ).filter(F.size("members") > 1)

    pairs = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("members"),
                        lambda a, i: F.transform(
                            F.slice(
                                F.col("members"), i + 2, F.size(F.col("members"))
                            ),
                            lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )

    sh = base.select("_id", "_shingles")
    with_sets = (
        pairs.join(sh.withColumnsRenamed({"_id": "id_a", "_shingles": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"_id": "id_b", "_shingles": "sh_b"}), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return with_sets.select(
        "id_a",
        "id_b",
        (inter.cast("double") / union.cast("double")).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# blocked exact n-gram Jaccard (oracle-expressible flavor)
# ---------------------------------------------------------------------------


def blocked_ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: Sequence[str],
    text_col: str = "text",
    k_shingle: int = 3,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """All intra-block pairs with exact k-gram Jaccard ≥ threshold.

    Blocking bounds the quadratic: the self-join shuffles on the block
    key, so pair count is Σ block² not n².  Use when a cheap natural
    block exists (domain, language, length bucket); use LSH otherwise.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        *[F.col(c) for c in block_cols],
        shingles(text_col, k_shingle).alias("_shingles"),
    )
    a = base.select(
        *[F.col(c).alias(f"{c}") for c in block_cols],
        F.col("_id").alias("id_a"),
        F.col("_shingles").alias("sh_a"),
    )
    b = base.select(
        *[F.col(c).alias(f"_r_{c}") for c in block_cols],
        F.col("_id").alias("id_b"),
        F.col("_shingles").alias("sh_b"),
    )
    cond = F.col("id_a") < F.col("id_b")
    for c in block_cols:
        cond = (F.col(c) == F.col(f"_r_{c}")) & cond
    joined = a.join(b, cond)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        joined.select(
            "id_a",
            "id_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        ).filter(F.col("jaccard") >= min_jaccard)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(text_col: Column | str, bits: int = 64) -> Column:
    """64-bit SimHash over whitespace tokens — per-bit majority vote of
    token hashes, folded entirely inside Catalyst aggregate/zip_with
    (no explode: one pass over the token array per document).

    Bit positions are Python-loop-unrolled into literal shift amounts
    (``shiftright`` requires a literal count); 64 fused expressions is
    well within codegen limits.
    """
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokens(t)
    zero = F.array_repeat(F.lit(0), bits)

    def tok_bits(tok: Column) -> Column:
        h = F.xxhash64(tok)
        return F.array(
            *[
                F.shiftright(h, j).bitwiseAND(F.lit(1)).cast("int") * 2 - 1
                for j in range(bits)
            ]
        )

    votes = F.aggregate(
        toks,
        zero,
        lambda acc, tok: F.zip_with(acc, tok_bits(tok), lambda a, v: a + v),
    )
    sig = F.lit(0).cast("long")
    for j in range(bits):
        # 1<<63 wraps to Long.MIN_VALUE — the sign bit, intentionally.
        bit_j = (1 << j) if j < 63 else -(1 << 63)
        sig = sig.bitwiseOR(
            F.when(F.element_at(votes, j + 1) > 0, F.lit(bit_j)).otherwise(F.lit(0))
        )
    return sig
