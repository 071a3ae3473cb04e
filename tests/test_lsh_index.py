"""At-rest MinHash-LSH index lifecycle (operators/lsh_index): the
dedup family's maintenance matrix — persist + append + delete + pair
derivation + serve-time probe — pinned against the batch operator's
output (maintained index ≡ full recompute, exact by construction)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_streaming_kafka2elasticsearch_spark.operators.dedup import (
    minhash_lsh_candidate_pairs,
    minhash_signatures_wide,
)
from spark_streaming_kafka2elasticsearch_spark.operators.lsh_index import (
    minhash_lsh_append,
    minhash_lsh_delete,
    minhash_lsh_pairs,
    minhash_lsh_persist,
    minhash_lsh_probe,
)

SF_DIR = "/root/testdata/sf0.001"

# Small local params: 8 parts keeps partition surgery observable, the
# md5 family keeps everything cross-checkable, and xxhash64 is also
# exercised (the production default) in the append test.
PARAMS = dict(k_shingle=3, num_hashes=64, bands=16, hash_family="md5")


def _docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
    )


def _pairset(df):
    return {
        (r.id_a, r.id_b, round(r.jaccard, 12)) for r in df.collect()
    }


def _batch_pairs(docs, min_jaccard):
    return (
        minhash_lsh_candidate_pairs(
            docs, id_col="doc_id", text_col="text", **PARAMS
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def test_lsh_persist_append_equals_rebuild(spark, tmp_path):
    """Index built on half the corpus, delta appended: derived pairs
    are bit-equal to the one-shot batch operator over the full corpus
    — the maintained-index ≡ rebuild contract.  A replayed append is
    a no-op (first-seen anti-join), and the blind append only ADDS
    parquet files (no old file rewritten)."""
    docs = _docs(spark)
    old = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "idx")
    minhash_lsh_persist(
        old, path, n_parts=8, fingerprint="fp0", **PARAMS
    )
    sig_dir = os.path.join(path, "signatures")
    files_before = {
        os.path.join(dp, f)
        for dp, _, fs in os.walk(sig_dir)
        for f in fs
        if f.endswith(".parquet")
    }
    assert minhash_lsh_append(path, delta, new_fingerprint="fp1") > 0
    files_after = {
        os.path.join(dp, f)
        for dp, _, fs in os.walk(sig_dir)
        for f in fs
        if f.endswith(".parquet")
    }
    assert files_before <= files_after and len(files_after) > len(
        files_before
    )
    got = minhash_lsh_pairs(
        spark, path, docs, min_jaccard=0.1, expected_fingerprint="fp1"
    )
    want = _batch_pairs(docs, 0.1)
    assert _pairset(got) == _pairset(want) and got.count() > 0
    # replayed delta: anti-join drops every id, index unchanged
    assert minhash_lsh_append(path, delta) == 0
    again = minhash_lsh_pairs(spark, path, docs, min_jaccard=0.1)
    assert _pairset(again) == _pairset(want)


def test_lsh_delete_surgery_equals_rebuild(spark, tmp_path):
    """Partition-pruned delete: pairs after erasure equal the batch
    operator over the SURVIVORS; only the parts holding deleted ids
    are touched; a part whose every row is deleted has its directory
    removed (the emptied-partition stale-file trap); the stale
    fingerprint guard fires for readers pinned to the old corpus."""
    docs = _docs(spark)
    path = str(tmp_path / "idx")
    minhash_lsh_persist(
        docs, path, n_parts=8, fingerprint="fp0", **PARAMS
    )
    # erase every doc whose part is 3 (empties that partition) plus a
    # few ids from other parts (partial rewrites)
    with_part = docs.select(
        "doc_id", F.pmod(F.xxhash64("doc_id"), F.lit(8)).alias("part")
    )
    doomed = with_part.filter(
        (F.col("part") == 3) | (F.col("doc_id") % 97 == 5)
    ).select("doc_id")
    touched = minhash_lsh_delete(
        spark, path, doomed, new_fingerprint="fp1"
    )
    want_touched = sorted(
        int(r.part)
        for r in with_part.join(doomed, "doc_id", "left_semi")
        .select("part")
        .distinct()
        .collect()
    )
    assert touched == want_touched and 3 in touched
    assert not os.path.isdir(os.path.join(path, "signatures", "part=3"))
    assert not os.path.isdir(os.path.join(path, "bands", "part=3"))
    survivors = docs.join(doomed, "doc_id", "left_anti")
    got = minhash_lsh_pairs(
        spark, path, survivors, min_jaccard=0.1, expected_fingerprint="fp1"
    )
    want = _batch_pairs(survivors, 0.1)
    assert _pairset(got) == _pairset(want) and got.count() > 0
    doomed_ids = {r.doc_id for r in doomed.collect()}
    assert not {r.id_a for r in got.collect()} & doomed_ids
    with pytest.raises(ValueError, match="stale"):
        minhash_lsh_pairs(spark, path, survivors, expected_fingerprint="fp0")


def test_lsh_probe_matches_direct_computation(spark, tmp_path):
    """Serve-time probe of held-out documents against the index: the
    result equals a direct re-derivation (query bands joined to the
    index's census-gated buckets, exact Jaccard on candidates) built
    independently in this test from the signature operator."""
    docs = _docs(spark)
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    queries = docs.filter(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "idx")
    minhash_lsh_persist(
        corpus, path, n_parts=8, fingerprint="fp0", **PARAMS
    )
    got = minhash_lsh_probe(
        spark, path, queries, corpus, min_jaccard=0.1,
        expected_fingerprint="fp0",
    )

    # Independent expectation: bands from the signature operator on
    # BOTH sides, census over the corpus side only, candidate join,
    # exact shingle Jaccard via the dedup helpers.
    from spark_streaming_kafka2elasticsearch_spark.operators.dedup import (
        shingle_relation,
    )

    def bands_of(df):
        sig = minhash_signatures_wide(
            df, "doc_id", "text",
            k_shingle=PARAMS["k_shingle"],
            num_hashes=PARAMS["num_hashes"],
            hash_family=PARAMS["hash_family"],
        )
        structs = [
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    *[F.col(f"mh_{b * 4 + r}") for r in range(4)]
                ).alias("band_hash"),
            )
            for b in range(PARAMS["bands"])
        ]
        return sig.select(
            "_id", F.explode(F.array(*structs)).alias("band")
        ).select("_id", "band.band_id", "band.band_hash")

    ib = bands_of(corpus).persist()
    qb = bands_of(queries)
    ok = (
        ib.groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") <= 256)
        .select("band_id", "band_hash")
    )
    cand = (
        qb.withColumnRenamed("_id", "query_id")
        .join(ok, ["band_id", "band_hash"])
        .join(
            ib.withColumnRenamed("_id", "match_id"),
            ["band_id", "band_hash"],
        )
        .select("query_id", "match_id")
        .distinct()
    )
    qrel = shingle_relation(queries, "doc_id", "text", 3)
    mrel = shingle_relation(corpus, "doc_id", "text", 3)
    qsz = qrel.groupBy("_id").agg(F.count(F.lit(1)).alias("nq"))
    msz = mrel.groupBy("_id").agg(F.count(F.lit(1)).alias("nm"))
    inter = (
        cand.join(
            qrel.select(F.col("_id").alias("query_id"), "_sh"), "query_id"
        )
        .join(
            mrel.select(F.col("_id").alias("match_id"), "_sh"),
            ["match_id", "_sh"],
        )
        .groupBy("query_id", "match_id")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    want = (
        inter.join(qsz.select(F.col("_id").alias("query_id"), "nq"), "query_id")
        .join(msz.select(F.col("_id").alias("match_id"), "nm"), "match_id")
        .select(
            "query_id",
            "match_id",
            (
                F.col("i").cast("double")
                / (F.col("nq") + F.col("nm") - F.col("i")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.1)
    )
    got_set = {
        (r.query_id, r.match_id, round(r.jaccard, 12)) for r in got.collect()
    }
    want_set = {
        (r.query_id, r.match_id, round(r.jaccard, 12))
        for r in want.collect()
    }
    ib.unpersist()
    assert got_set == want_set and got_set


def test_lsh_functional_append_equals_disk_append(spark, tmp_path):
    """minhash_lsh_pairs_with_delta (the registered append query's
    repeatable timed path) equals the disk-mutating append + derive:
    union of at-rest bands with in-flight delta bands is the same
    relation the append writes."""
    docs = _docs(spark)
    old = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "idx")
    minhash_lsh_persist(old, path, n_parts=8, fingerprint="fp0", **PARAMS)
    from spark_streaming_kafka2elasticsearch_spark.operators.lsh_index import (
        minhash_lsh_pairs_with_delta,
    )

    functional = minhash_lsh_pairs_with_delta(
        spark, path, docs, delta, min_jaccard=0.1,
        expected_fingerprint="fp0",
    )
    minhash_lsh_append(path, delta)
    mutated = minhash_lsh_pairs(spark, path, docs, min_jaccard=0.1)
    assert _pairset(functional) == _pairset(mutated)
    assert functional.count() > 0
