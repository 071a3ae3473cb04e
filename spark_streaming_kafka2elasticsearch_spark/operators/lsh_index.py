"""At-rest MinHash-LSH dedup index with Δ-bounded maintenance.

The batch near-dup operators (operators/dedup.minhash_lsh_candidate_pairs)
recompute shingles + 64 hash functions for the WHOLE corpus every run —
correct, but at 100 TB the text-side signature job is the dominant cost
and it is the part that never changes for already-indexed documents.
This module gives the dedup family the same at-rest lifecycle the ANN
serving rungs got (operators/similarity: IVF/PQ/BQ/graph build +
append/refresh/delete): signatures and band keys are computed ONCE per
document, laid down in a partitioned parquet layout, and every later
operation touches only its delta.

Layout under ``path/``::

    _lsh_meta.json        params (k_shingle, num_hashes, bands,
                          hash_family, max_bucket_size, n_parts) +
                          corpus fingerprint — serving with a stale
                          fingerprint raises (the VectorIndex contract)
    signatures/part=H/    (doc_id, mh_0..mh_{n-1}) — one row per doc
    bands/part=H/         (doc_id, band_id, band_hash) — bands rows/doc

``part = pmod(xxhash64(doc_id), n_parts)`` — an id-hash partitioning,
NOT batch-of-arrival:

* **append** is a blind ``mode("append")`` write of the delta's rows
  into existing part directories — no read-modify-write, no rewrite of
  old files (new parquet files land beside old ones);
* **delete** computes the touched parts FROM THE IDS ALONE (the same
  xxhash64 is evaluated on the deletion set — no index scan), rewrites
  only those partitions via dynamic partition overwrite, and rmtree's
  any partition the rewrite emptied (the stale-file trap:
  ivf_persisted_delete's surgery).  Touched work is
  ``min(|Δ|, n_parts)/n_parts`` of the index, never the index.

``n_parts`` defaults to 16 for the local test scale; a 100 TB corpus
sets it in the thousands so each part directory stays executor-sized.
The band table is the COMPACT index — |docs|·bands fixed-width rows
(~100× smaller than the text) — so the pair/probe derivations below
scan it whole while the text is only ever touched for candidate
documents.

Maintenance is EXACT, not approximate: signature and band rows are
per-document deterministic (no trajectory, unlike NN-Descent), so the
union of per-delta computations is bit-equal to a full recompute, and
every derivation over the maintained table equals the rebuild — which
is exactly what the registered queries' DuckDB oracles check
(queries/datapipe.py) and the pytest pins assert
(tests/test_lsh_index.py).

Engine-original module: the reference streaming job
(bexley_spark_stream_msk_es.py) has no dedup surface; this extends the
SURVEY §2 training-data-pipeline families.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_kafka2elasticsearch_spark.operators.dedup import (
    minhash_signatures_wide,
    shingle_relation,
)

_LSH_META = "_lsh_meta.json"
_SIG_DIR = "signatures"
_BAND_DIR = "bands"


def _read_meta(path: str) -> dict:
    with open(os.path.join(path, _LSH_META)) as fh:
        return json.load(fh)


def _write_meta(path: str, meta: dict) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _LSH_META), "w") as fh:
        json.dump(meta, fh)


def _part_col(id_col: str, n_parts: int):
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_parts)).alias("part")


def _band_relation(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(_id, band_id, band_hash) from a wide signature relation.

    ``band_hash`` is xxhash64 over the band's signature slice — a
    fixed-width key for slice EQUALITY (an external oracle reproduces
    buckets by grouping on the slice values; operators/dedup.py:318
    doctrine), so the per-shingle hash family never constrains it."""
    rows_per_band = num_hashes // bands
    # One parse for the whole band array (the Column-API struct build
    # costs ~10 py4j round-trips per band; operators/dedup.py:362
    # doctrine) — identical struct/xxhash64 trees.
    band_sql = ", ".join(
        "struct({b} AS band_id, xxhash64({cols}) AS band_hash)".format(
            b=b,
            cols=", ".join(
                f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    return sig.selectExpr(
        "_id", f"explode(array({band_sql})) AS band"
    ).select("_id", "band.band_id", "band.band_hash")


def _sig_and_bands(
    docs: DataFrame, meta: dict, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Signature + band relations for ``docs`` under ``meta``'s params,
    both carrying (doc_id, part) for the layout write.  Returns
    ``(staged, sig_out, bands_out)``: ``staged`` is the persisted
    signature boundary — it feeds two consumers (the signature write
    and the band derivation), and the CALLER unpersists it after both
    writes land (no leaked block-manager state, the r6 advisory)."""
    sig = minhash_signatures_wide(
        docs,
        id_col,
        text_col,
        k_shingle=meta["k_shingle"],
        num_hashes=meta["num_hashes"],
        hash_family=meta["hash_family"],
    ).persist()
    n_parts = meta["n_parts"]
    sig_out = sig.select(
        F.col("_id").alias("doc_id"),
        *[F.col(f"mh_{i}") for i in range(meta["num_hashes"])],
    ).withColumn("part", _part_col("doc_id", n_parts))
    bands_out = (
        _band_relation(sig, meta["num_hashes"], meta["bands"])
        .select(
            F.col("_id").alias("doc_id"), "band_id", "band_hash"
        )
        .withColumn("part", _part_col("doc_id", n_parts))
    )
    return sig, sig_out, bands_out


def minhash_lsh_persist(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    hash_family: str = "md5",
    max_bucket_size: int = 256,
    n_parts: int = 16,
    fingerprint: str | None = None,
) -> None:
    """Build the at-rest LSH index for ``docs`` (full overwrite).

    One text-side pass: explode + ``num_hashes`` codegen'd hash
    columns + min-agg (minhash_signatures_wide's plan), then the band
    derivation reuses the persisted signature boundary — the shingle
    job runs exactly once.  Defaults mirror the registered
    minhash_near_dup_pairs query (64 hashes × 16 bands, md5
    Kirsch–Mitzenmacher family) so the whole lifecycle stays
    DuckDB-oracle-checkable end to end."""
    meta = {
        "k_shingle": k_shingle,
        "num_hashes": num_hashes,
        "bands": bands,
        "hash_family": hash_family,
        "max_bucket_size": max_bucket_size,
        "n_parts": n_parts,
        "fingerprint": fingerprint,
    }
    staged, sig_out, bands_out = _sig_and_bands(docs, meta, id_col, text_col)
    sig_out.write.mode("overwrite").partitionBy("part").parquet(
        os.path.join(path, _SIG_DIR)
    )
    bands_out.write.mode("overwrite").partitionBy("part").parquet(
        os.path.join(path, _BAND_DIR)
    )
    staged.unpersist()
    _write_meta(path, meta)


def minhash_lsh_append(
    path: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    new_fingerprint: str | None = None,
) -> int:
    """Fold ``new_docs`` into the at-rest index — the daily-increment
    primitive.  Returns the number of documents actually appended.

    Already-indexed ids are dropped by a FIRST-SEEN anti-join against
    the signature table's id column (a redelivered batch is a no-op —
    the knn_graph_append dedup doctrine), so replaying an append can
    never double a document's band rows and corrupt the census.  The
    text-side signature job runs over the SURVIVING DELTA ONLY; the
    write is a blind parquet append into the id-hash part directories
    (no old file is read or rewritten).  Appended rows are bit-equal
    to what a full rebuild would compute for those ids — signatures
    are per-document deterministic — so maintained index ≡ rebuilt
    index, the property the registered append query's oracle pins."""
    spark = new_docs.sparkSession
    meta = _read_meta(path)
    sig_dir = os.path.join(path, _SIG_DIR)
    existing = spark.read.parquet(sig_dir).select(
        F.col("doc_id").alias(id_col)
    )
    delta = new_docs.join(existing, id_col, "left_anti").localCheckpoint(
        eager=True
    )
    n = delta.count()
    if n:
        staged, sig_out, bands_out = _sig_and_bands(
            delta, meta, id_col, text_col
        )
        sig_out.write.mode("append").partitionBy("part").parquet(sig_dir)
        bands_out.write.mode("append").partitionBy("part").parquet(
            os.path.join(path, _BAND_DIR)
        )
        staged.unpersist()
    if new_fingerprint is not None:
        meta["fingerprint"] = new_fingerprint
        _write_meta(path, meta)
    return n


def minhash_lsh_delete(
    spark: SparkSession,
    path: str,
    doc_ids: DataFrame,
    new_fingerprint: str | None = None,
) -> list[int]:
    """Erase ``doc_ids`` (single column of ids) from the at-rest index
    — the GDPR primitive.  Returns the sorted list of part partitions
    that were touched.

    The touched parts are computed from the DELETION IDS alone (the
    same ``pmod(xxhash64(id), n_parts)`` the writer used — no index
    scan), so the read is partition-pruned to ``min(|Δ|, n_parts)``
    directories; each is rewritten without the deleted rows via
    dynamic partition overwrite, and a partition the rewrite EMPTIED
    is rmtree'd explicitly (dynamic overwrite writes nothing for an
    absent partition, so its stale files would keep serving ghosts —
    the ivf_persisted_delete trap).  Unknown ids are harmless: their
    part is rewritten without change.  Post-delete derivations equal
    a rebuild over the survivors — band rows are independent per
    document, so removing a doc's rows is exactly what the rebuild
    never computes."""
    from spark_streaming_kafka2elasticsearch_spark.sources.writer import (
        overwrite_partitions,
    )

    meta = _read_meta(path)
    n_parts = meta["n_parts"]
    id_col = doc_ids.columns[0]
    dele = (
        doc_ids.select(F.col(id_col).alias("doc_id"))
        .dropDuplicates(["doc_id"])
        .withColumn("part", _part_col("doc_id", n_parts))
        .localCheckpoint(eager=True)
    )
    touched = sorted(
        int(r["part"]) for r in dele.select("part").distinct().collect()
    )
    if not touched:
        return []
    for sub in (_SIG_DIR, _BAND_DIR):
        subdir = os.path.join(path, sub)
        scoped = spark.read.parquet(subdir).filter(
            F.col("part").isin(touched)
        )
        remaining = scoped.join(
            dele.select("doc_id"), "doc_id", "left_anti"
        ).localCheckpoint(eager=True)
        if not remaining.isEmpty():
            overwrite_partitions(remaining, subdir, ["part"])
        kept = {
            int(r["part"])
            for r in remaining.select("part").distinct().collect()
        }
        for p in set(touched) - kept:
            shutil.rmtree(
                os.path.join(subdir, f"part={p}"), ignore_errors=True
            )
    if new_fingerprint is not None:
        meta["fingerprint"] = new_fingerprint
        _write_meta(path, meta)
    return touched


def _check_fingerprint(meta: dict, expected: str | None) -> None:
    if expected is not None and meta.get("fingerprint") != expected:
        raise ValueError(
            "stale LSH index: expected fingerprint "
            f"{expected!r}, found {meta.get('fingerprint')!r}"
        )


def minhash_lsh_pairs(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard: float = 0.0,
    expected_fingerprint: str | None = None,
) -> DataFrame:
    """Near-dup pairs ``(id_a, id_b, jaccard)`` derived from the
    MAINTAINED band table — the reporting leg of the index lifecycle.

    Scan shape: the census (2..max_bucket_size partial-agg gate),
    bucket member lists, and pair expansion all run over the compact
    at-rest band table — |docs|·bands fixed-width rows, no text; the
    text in ``docs`` is touched only for CANDIDATE documents (semi-join
    before the shingle explode) to compute the exact-Jaccard verify,
    pair-restricted exactly as operators/dedup.minhash_lsh_candidate_
    pairs steps 3–5 (same census gate, same expansion, same verify
    algebra — bit-equal output when the band table matches a fresh
    banding, which the maintenance contract guarantees)."""
    meta = _read_meta(path)
    _check_fingerprint(meta, expected_fingerprint)
    banded = (
        spark.read.parquet(os.path.join(path, _BAND_DIR))
        .select(F.col("doc_id").alias("_id"), "band_id", "band_hash")
        .persist()
    )
    return _pairs_over_banded(
        banded, docs, meta, id_col, text_col, min_jaccard
    )


def minhash_lsh_pairs_with_delta(
    spark: SparkSession,
    path: str,
    docs: DataFrame,
    delta_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard: float = 0.0,
    expected_fingerprint: str | None = None,
) -> DataFrame:
    """FUNCTIONAL append + derive: near-dup pairs over the at-rest
    band table UNIONED with ``delta_docs``'s freshly computed bands —
    what the corpus looks like after :func:`minhash_lsh_append` lands,
    without mutating the layout (the knn_graph_append_serve doctrine:
    the repeatable timed path of the registered append query, while
    the disk-mutating append is pytest-pinned separately).

    The text-side signature job runs over the DELTA ONLY — that is the
    whole point of the index: at 100 TB the already-indexed corpus
    contributes |docs|·bands fixed-width rows read from parquet, and
    only the daily increment pays shingling + hashing.  ``docs`` (the
    post-append corpus, text side) is touched only for candidate
    documents in the pair-restricted exact verify."""
    meta = _read_meta(path)
    _check_fingerprint(meta, expected_fingerprint)
    at_rest = spark.read.parquet(os.path.join(path, _BAND_DIR)).select(
        F.col("doc_id").alias("_id"), "band_id", "band_hash"
    )
    dsig = minhash_signatures_wide(
        delta_docs,
        id_col,
        text_col,
        k_shingle=meta["k_shingle"],
        num_hashes=meta["num_hashes"],
        hash_family=meta["hash_family"],
    )
    dbands = _band_relation(dsig, meta["num_hashes"], meta["bands"])
    banded = at_rest.unionByName(dbands).persist()
    return _pairs_over_banded(
        banded, docs, meta, id_col, text_col, min_jaccard
    )


def _pairs_over_banded(
    banded: DataFrame,
    docs: DataFrame,
    meta: dict,
    id_col: str,
    text_col: str,
    min_jaccard: float,
) -> DataFrame:
    """Census gate + bucket pair expansion + pair-restricted exact
    Jaccard over a ``(_id, band_id, band_hash)`` relation — steps 3–5
    of operators/dedup.minhash_lsh_candidate_pairs, shared by the
    at-rest and functional-append derivations.  ``banded`` arrives
    persisted (two consumers: census and member join); released here
    with the other staged boundaries once the final is checkpointed."""
    ok_buckets = (
        banded.groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).alias("_m"))
        .filter(
            (F.col("_m") > 1) & (F.col("_m") <= meta["max_bucket_size"])
        )
        .select("band_id", "band_hash")
    )
    buckets = (
        banded.join(ok_buckets, ["band_id", "band_hash"])
        .groupBy("band_id", "band_hash")
        .agg(F.array_sort(F.collect_set("_id")).alias("members"))
        .filter(F.size("members") > 1)
    )
    pairs = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("members"),
                        lambda a, i: F.transform(
                            F.slice(
                                F.col("members"),
                                i + 2,
                                F.size(F.col("members")),
                            ),
                            lambda b: F.struct(
                                a.alias("id_a"), b.alias("id_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
        .persist()
    )
    cand_ids = pairs.select(
        F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias(id_col)
    ).distinct()
    docs_c = docs.join(cand_ids, id_col, "left_semi")
    relc = shingle_relation(
        docs_c, id_col, text_col, meta["k_shingle"]
    ).persist()
    sizes = relc.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz"))
    a_sh = pairs.join(
        relc.select(F.col("_id").alias("id_a"), "_sh"), "id_a"
    )
    inter = (
        a_sh.join(
            relc.select(F.col("_id").alias("id_b"), "_sh"),
            ["id_b", "_sh"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    sz_a = sizes.select(
        F.col("_id").alias("id_a"), F.col("_sz").alias("_sz_a")
    )
    sz_b = sizes.select(
        F.col("_id").alias("id_b"), F.col("_sz").alias("_sz_b")
    )
    result = (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("_inter").cast("double")
                / (
                    F.col("_sz_a") + F.col("_sz_b") - F.col("_inter")
                ).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
    final = result.localCheckpoint(eager=True)
    for staged in (banded, pairs, relc):
        staged.unpersist()
    return final


def minhash_lsh_probe(
    spark: SparkSession,
    path: str,
    query_docs: DataFrame,
    corpus_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard: float = 0.0,
    expected_fingerprint: str | None = None,
) -> DataFrame:
    """Serve-time near-dup lookup ``(query_id, match_id, jaccard)``:
    incoming documents (NOT index members) probed against the at-rest
    index — what an ingest gate runs per batch at 100 TB.

    Per-query work is Δ-bounded: signatures + bands are computed for
    the QUERY batch only (the corpus side comes from the at-rest band
    table), the census gate is evaluated over INDEX members only —
    a hot boilerplate bucket is skipped before any member list
    materializes, and a probe landing in it reports no match there,
    matching the gate semantics of the batch operator — and the exact
    verify joins query shingles against MATCHED members' shingles
    only.  ``corpus_docs`` supplies the matched members' text (at
    rest this is the document store lookup; only candidate-match rows
    are read thanks to the semi-join below)."""
    meta = _read_meta(path)
    _check_fingerprint(meta, expected_fingerprint)
    qsig = minhash_signatures_wide(
        query_docs,
        id_col,
        text_col,
        k_shingle=meta["k_shingle"],
        num_hashes=meta["num_hashes"],
        hash_family=meta["hash_family"],
    )
    qbands = _band_relation(qsig, meta["num_hashes"], meta["bands"]).select(
        F.col("_id").alias("query_id"), "band_id", "band_hash"
    )
    banded = (
        spark.read.parquet(os.path.join(path, _BAND_DIR))
        .select(F.col("doc_id").alias("match_id"), "band_id", "band_hash")
        .persist()
    )
    ok_buckets = (
        banded.groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).alias("_m"))
        .filter(F.col("_m") <= meta["max_bucket_size"])
        .select("band_id", "band_hash")
    )
    cand = (
        qbands.join(ok_buckets, ["band_id", "band_hash"])
        .join(banded, ["band_id", "band_hash"])
        .filter(F.col("query_id") != F.col("match_id"))
        .select("query_id", "match_id")
        .distinct()
        .persist()
    )
    qrel = shingle_relation(
        query_docs.join(
            cand.select(F.col("query_id").alias(id_col)).distinct(),
            id_col,
            "left_semi",
        ),
        id_col,
        text_col,
        meta["k_shingle"],
    ).persist()
    mrel = shingle_relation(
        corpus_docs.join(
            cand.select(F.col("match_id").alias(id_col)).distinct(),
            id_col,
            "left_semi",
        ),
        id_col,
        text_col,
        meta["k_shingle"],
    ).persist()
    q_sz = qrel.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz_q"))
    m_sz = mrel.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz_m"))
    inter = (
        cand.join(
            qrel.select(F.col("_id").alias("query_id"), "_sh"), "query_id"
        )
        .join(
            mrel.select(F.col("_id").alias("match_id"), "_sh"),
            ["match_id", "_sh"],
        )
        .groupBy("query_id", "match_id")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    result = (
        inter.join(
            q_sz.select(F.col("_id").alias("query_id"), "_sz_q"), "query_id"
        )
        .join(
            m_sz.select(F.col("_id").alias("match_id"), "_sz_m"), "match_id"
        )
        .select(
            "query_id",
            "match_id",
            (
                F.col("_inter").cast("double")
                / (
                    F.col("_sz_q") + F.col("_sz_m") - F.col("_inter")
                ).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
    final = result.localCheckpoint(eager=True)
    for staged in (banded, cand, qrel, mrel):
        staged.unpersist()
    return final
