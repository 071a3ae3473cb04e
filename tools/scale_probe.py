"""Scale probe for the heavy dedup/similarity tail (VERDICT r2 item 6).

The census caps (max_bucket_size), df-caps (max_doc_freq), and
broadcast-side designs claim SUB-QUADRATIC growth in corpus size.
This harness measures it: the sf0.1 corpus is scaled 3x and 10x by
replication that changes CONTENT, not workload character —

* documents: replica r deterministically SHUFFLES each doc's token
  sequence (sort by hash(doc_id, position, r)), so a replica keeps its
  source's token multiset but destroys adjacency → almost no shared
  3-gram shingles, replicas are NOT near-dups of their source or of
  each other, and the corpus-wide dup-rate stays ~constant while
  |docs| grows (naive x10 copy would instead create 10-cliques of
  exact dups everywhere — a different, dedup-degenerate workload;
  mere token ROTATION fails too: it preserves adjacency, so replicas
  share ~98% of shingles — measured before switching to the shuffle);
* embeddings: replica r rolls each vector's components by r → same
  norm, decorrelated direction.

Each probe query then runs at 1x / 3x / 10x with the noop sink and the
growth exponent alpha = log(t10/t1)/log(10) is reported; alpha ~ 1 is
linear, alpha >= 2 would mean a quadratic shape survived the caps.

Usage: python tools/scale_probe.py [--rebuild]
Writes SCALE_PROBE.json at the repo root; scaled parquet lives under
tmp_scale/ (gitignored, derived data only).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

# local[32] runs driver+executors in ONE JVM whose heap defaults to
# 1g — far too small for the 10x corpus.  Must be set before the
# gateway launches; builder.config() is too late for driver memory.
os.environ.setdefault(
    "PYSPARK_SUBMIT_ARGS", "--driver-memory 48g pyspark-shell"
)

BASE = "/root/testdata/sf0.1"
OUT = "/root/repo/tmp_scale"
FACTORS = [3, 10]

#: The heavy dedup/similarity tail (plus the two broadcast-side text
#: ops whose linearity is part of the 100 TB story).
PROBE_QUERIES = [
    "ngram_jaccard_pairs",
    "minhash_near_dup_pairs",
    "simhash_near_dup_pairs",
    "near_dup_clusters",
    "near_dup_clusters_star",
    "embedding_near_dup_srp",
    "ann_cosine_topk",
    "decontaminate_train_docs",
    "document_repetition_ratios",
    "deduped_corpus",
    "hashed_bow_embeddings",
    "ann_cosine_topk_pandas",
]


def build_scaled(factor: int, outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW base_docs AS SELECT * FROM read_parquet('{BASE}/documents.parquet')")
    con.execute(f"CREATE VIEW base_emb AS SELECT * FROM read_parquet('{BASE}/embeddings.parquet')")
    # documents: replica r rotates tokens by r (mod doc length).
    con.execute(
        f"""
COPY (
  SELECT doc_id, text, lang, source, n_chars FROM base_docs
  UNION ALL
  SELECT d.doc_id + r.r * 10000000 AS doc_id,
         array_to_string(
           list_transform(
             list_sort(list_transform(
               generate_series(1, len(toks)),
               i -> {{k: hash(d.doc_id, i, r.r), t: toks[i]}})),
             s -> s.t),
           ' ') AS text,
         d.lang, d.source, d.n_chars
  FROM (SELECT *, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
        FROM base_docs) d
  CROSS JOIN (SELECT unnest(generate_series(1, {factor - 1})) AS r) r
) TO '{outdir}/documents.parquet' (FORMAT PARQUET)
"""
    )
    # embeddings: replica r rolls components by r.
    con.execute(
        f"""
COPY (
  SELECT vec_id, embedding, label FROM base_emb
  UNION ALL
  SELECT e.vec_id + r.r * 10000000 AS vec_id,
         CAST(list_concat(embedding[r.r + 1 :], embedding[1 : r.r]) AS FLOAT[]) AS embedding,
         e.label
  FROM base_emb e
  CROSS JOIN (SELECT unnest(generate_series(1, {factor - 1})) AS r) r
) TO '{outdir}/embeddings.parquet' (FORMAT PARQUET)
"""
    )
    con.close()


def main() -> None:
    rebuild = "--rebuild" in sys.argv
    dirs = {1: BASE}
    for f in FACTORS:
        d = os.path.join(OUT, f"x{f}")
        if rebuild or not os.path.exists(os.path.join(d, "documents.parquet")):
            print(f"building {f}x corpus at {d} ...", file=sys.stderr)
            build_scaled(f, d)
        dirs[f] = d

    from spark_streaming_kafka2elasticsearch_spark.queries import all_queries
    from spark_streaming_kafka2elasticsearch_spark.session import build_session

    qs = all_queries()
    spark = build_session(master="local[32]", app_name="scale_probe")
    spark.range(1_000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    # Untimed codegen warm-up: run every probe query once at 1x first.
    # janino compilation is paid per plan SHAPE per session (~3-5s for
    # the wide dedup plans) and would otherwise inflate exactly the x1
    # measurements the growth exponent divides by (measured: x1 >
    # x3 wall-clock on three queries before this pass existed).
    for q in PROBE_QUERIES:
        try:
            qs[q](spark, BASE).write.format("noop").mode("overwrite").save()
        except Exception:  # noqa: BLE001
            pass
        spark.catalog.clearCache()
    print("warm-up pass done", file=sys.stderr)

    def flush(results: dict) -> None:
        with open("/root/repo/SCALE_PROBE.json", "w") as f:
            json.dump(
                {
                    "base_rows": {"documents": 5000, "embeddings": 2000},
                    "factors": [1] + FACTORS,
                    "queries": results,
                },
                f,
                indent=1,
            )

    results: dict[str, dict[str, float]] = {q: {} for q in PROBE_QUERIES}
    for factor, sf_dir in dirs.items():
        for q in PROBE_QUERIES:
            t0 = time.time()
            try:
                qs[q](spark, sf_dir).write.format("noop").mode("overwrite").save()
                results[q][f"x{factor}"] = round(time.time() - t0, 2)
            except Exception as exc:  # noqa: BLE001 — record, keep probing
                results[q][f"x{factor}"] = -1.0
                print(f"x{factor} {q} FAILED: {exc}", file=sys.stderr)
            spark.catalog.clearCache()
            print(f"x{factor} {q}: {results[q][f'x{factor}']}s", file=sys.stderr)
            flush(results)

    for q, r in results.items():
        if r.get("x1", -1) > 0 and r.get("x10", -1) > 0:
            # growth exponent 1x→10x; alpha=1 linear, 2 quadratic
            r["alpha"] = round(
                math.log(max(r["x10"], 0.01) / max(r["x1"], 0.01)) / math.log(10), 2
            )
    flush(results)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
