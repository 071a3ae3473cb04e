"""Data-selection & mixing queries (round 8): DSIR importance
weights, semantic decontamination, hard-negative mining, temperature
sampling.  Value parity with DuckDB is owned by the oracle gate
(tools/check_oracle.py); these tests pin SEMANTICS on hand-built
inputs and invariants the oracle equality alone would not explain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_streaming_kafka2elasticsearch_spark.operators.similarity import (
    brute_force_topk,
)
from spark_streaming_kafka2elasticsearch_spark.operators.text import (
    dsir_logratio_scores,
)
from spark_streaming_kafka2elasticsearch_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


def test_dsir_prefers_target_like_documents(spark):
    # Target domain talks about cats; raw doc 10 is cat-like, raw doc
    # 11 is dog-like.  DSIR must rank the cat-like raw doc higher.
    rows = [
        (0, "cat meow purr cat meow", "t"),
        (1, "cat purr whiskers cat", "t"),
        (2, "meow cat purr purr", "t"),
        (10, "cat meow purr whiskers", "r"),
        (11, "dog bark woof growl", "r"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, side string")
    out = dsir_logratio_scores(
        df, F.col("side") == "t", id_col="doc_id"
    ).collect()
    scores = {r["doc_id"]: r["dsir_logratio"] for r in out}
    # Only raw-side docs are scored.
    assert set(scores) == {10, 11}
    assert scores[10] > scores[11]
    # Unigrams + bigrams, counted with multiplicity: 4 tokens → 4 + 3.
    n_feats = {r["doc_id"]: r["n_feats"] for r in out}
    assert n_feats[10] == 7 and n_feats[11] == 7


def test_dsir_single_token_doc_has_no_bigrams(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta", "t"), (1, "solo", "r")],
        "doc_id long, text string, side string",
    )
    out = dsir_logratio_scores(df, F.col("side") == "t", id_col="doc_id")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["n_feats"] == 1  # unigram only


def test_hard_negative_mining_labels_and_ranks(spark):
    res = all_queries()["hard_negative_mining"](spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    by_q: dict[int, list] = {}
    for r in res:
        assert labels[r["query_id"]] != r["neighbor_label"]
        assert labels[r["neighbor_id"]] == r["neighbor_label"]
        by_q.setdefault(r["query_id"], []).append(r["neg_rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) == 5


def test_hard_negative_planted_cross_label_copy_wins(spark):
    # Query 0 (label 0).  Vector 1 is a near-copy with a DIFFERENT
    # label → must be the rank-1 negative.  Vector 2 is an even closer
    # copy with the SAME label → must not appear at all.
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.99, 0.1, 0.0], 1),
        (2, [0.999, 0.01, 0.0], 0),
        (3, [0.0, 1.0, 0.0], 1),
        (4, [0.0, 0.0, 1.0], 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
        F.col("label").alias("qlabel"),
    )
    out = brute_force_topk(
        emb, q, k=3,
        corpus_label="label", query_label="qlabel", exclude_same_label=True,
    ).collect()
    got = [(r["neighbor_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got[0] == (1, 1)
    assert all(nid != 2 for nid, _ in got)
    assert {r["neighbor_label"] for r in out} <= {1, 2}


def test_brute_force_topk_same_label_requires_label_cols(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    q = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    with pytest.raises(ValueError, match="exclude_same_label"):
        brute_force_topk(emb, q, exclude_same_label=True)


def test_semantic_decontamination_flags_exactly_planted_sources(spark):
    res = all_queries()["semantic_decontamination"](spark, SF_DIR).collect()
    assert len(res) > 0
    for r in res:
        if r["vec_id"] % 10 == 0 and r["vec_id"] < 500:
            # id < 500: the benchmark suite is pinned to a fixed id
            # range (eval sets don't grow with the corpus).
            # The benchmark copy of this very vector sits at cos≈0.9998.
            assert r["is_contaminated"] and r["n_eval_hits"] >= 1
            assert r["matched_eval_id"] == r["vec_id"]
        else:
            assert not r["is_contaminated"] and r["n_eval_hits"] == 0
            assert r["matched_eval_id"] is None


def test_source_temperature_mix_flattens_shares(spark):
    rows = all_queries()["source_temperature_mix"](spark, SF_DIR).collect()
    assert len(rows) >= 2
    total_tokens = sum(r["n_tokens"] for r in rows)
    assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        raw_share = r["n_tokens"] / total_tokens
        # sqrt-flattening: below-average sources are up-sampled,
        # above-average down-sampled (factor crosses 1 monotonically).
        if r["temp_share"] > raw_share:
            assert r["upsample_factor"] >= 1.0
        else:
            assert r["upsample_factor"] <= 1.0 + 1e-9
    biggest = max(rows, key=lambda r: r["n_tokens"])
    smallest = min(rows, key=lambda r: r["n_tokens"])
    if biggest["n_tokens"] != smallest["n_tokens"]:
        assert biggest["upsample_factor"] < 1.0 < smallest["upsample_factor"]


def test_dsir_budget_selection_is_greedy_prefix(spark):
    qs = all_queries()
    sel = {r["doc_id"]: r for r in qs["dsir_budget_selection"](spark, SF_DIR).collect()}
    total = sum(r["n_tokens"] for r in sel.values())
    assert 0 < total <= 20_000
    # The selected set must be EXACTLY the maximal (score DESC, doc_id)
    # prefix whose inclusive token cumsum fits the budget — the naive
    # global greedy the two-phase selector claims to equal.
    scored = qs["dsir_importance_weights"](spark, SF_DIR).collect()
    # Token counts must match the query's token_count semantics
    # (whitespace split with EMPTIES FILTERED) or the replayed greedy
    # can cross the budget at a different document.
    toks = {
        r["doc_id"]: r["n_tokens"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(
            "doc_id",
            F.size(
                F.filter(F.split("text", r"\s+"), lambda x: x != "")
            ).alias("n_tokens"),
        )
        .collect()
    }
    order = sorted(scored, key=lambda r: (-r["dsir_logratio"], r["doc_id"]))
    cum, expect = 0, set()
    for r in order:
        cum += toks[r["doc_id"]]
        if cum > 20_000:
            break
        expect.add(r["doc_id"])
    assert set(sel) == expect


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np

    rows = all_queries()["embedding_covariance"](spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    X = np.array([[float(x) for x in r["embedding"]] for r in emb], dtype=np.float64)
    n, d = X.shape
    ref = np.cov(X, rowvar=False, bias=True)  # population covariance
    assert len(rows) == d * (d + 1) // 2
    for r in rows:
        assert r["i"] <= r["j"] and r["n_vectors"] == n
        assert abs(r["cov"] - ref[r["i"] - 1, r["j"] - 1]) < 5e-6
        if r["i"] == r["j"]:
            assert r["cov"] >= 0.0


def test_embedding_pc_power_iteration_replays_exact_algorithm(spark):
    import numpy as np

    rows = all_queries()["embedding_pc_power_iteration"](spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    X = np.array([[float(x) for x in r["embedding"]] for r in emb], dtype=np.float64)
    # Replay the EXACT fixed-round algorithm: 6-dp covariance cells,
    # 4 matvec+normalize rounds from e1.
    Cr = np.round(np.cov(X, rowvar=False, bias=True), 6)
    v = np.zeros(Cr.shape[0])
    v[0] = 1.0
    for _ in range(4):
        y = Cr @ v
        n = float(np.linalg.norm(y))
        v = y / n
    got = {r["dim"]: r["pc1_component"] for r in rows}
    assert len(got) == Cr.shape[0]
    for d, comp in got.items():
        assert abs(comp - v[d - 1]) < 5e-5
    est = rows[0]["eigenvalue_est"]
    assert all(abs(r["eigenvalue_est"] - est) < 1e-12 for r in rows)
    assert abs(est - n) < 5e-5
    # Unit norm at the emitted precision.
    assert abs(sum(c * c for c in got.values()) - 1.0) < 1e-3


def test_embedding_abtt_postprocess_removes_top_component(spark):
    import numpy as np

    rows = all_queries()["embedding_abtt_postprocess"](spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    X = np.array([[float(x) for x in r["embedding"]] for r in emb], dtype=np.float64)
    ids = [r["vec_id"] for r in emb]
    # Replay the exact fit: 6-dp covariance, 4 power rounds, 6-dp v/mu.
    Cr = np.round(np.cov(X, rowvar=False, bias=True), 6)
    v = np.zeros(Cr.shape[0]); v[0] = 1.0
    for _ in range(4):
        y = Cr @ v
        v = y / np.linalg.norm(y)
    v = np.round(v, 6) + 0.0
    mu = np.round(X.mean(axis=0), 6) + 0.0
    got = {r["vec_id"]: r for r in rows}
    assert set(got) == set(ids)
    for vid, xrow in zip(ids, X):
        c = xrow - mu
        pr = float(v @ c)
        corr = c - v * pr
        r = got[vid]
        assert abs(r["pc1_projection"] - pr) < 5e-5
        emitted = [float(t) for t in r["abtt_csv"].split(",")]
        assert np.max(np.abs(np.array(emitted) - corr)) < 5e-5
        # The corrected vector has (numerically) no energy left along v.
        assert abs(float(v @ np.array(emitted))) < 1e-3
