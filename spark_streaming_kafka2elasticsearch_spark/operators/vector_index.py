"""``VectorIndex`` — the one front door to the ANN serving family.

The engine's vector-search surface grew operator by operator (persisted
IVF, append maintenance, compaction, IVFADC/PQ/SQ8 quantized serving,
refine, filtered, range, diversified).  Each is an independently
oracle-checked function in :mod:`operators.similarity`; this facade
binds them to ONE index directory so the lifecycle reads the way an
operator of a 100 TB corpus thinks about it::

    idx = VectorIndex(path, fingerprint=data_fingerprint(src))
    idx.build(corpus, centroids)            # one corpus scan, at rest
    idx.append(delta)                       # daily increment
    idx.compact()                           # bound small files
    idx.search(queries, k=10, n_probe=2)    # pruned top-k
    idx.range_search(queries, threshold=.3) # all above tau
    idx.filtered_search(queries, "lang = 'en'", k=10)
    idx.diverse_search(queries, k=10, per_cell=3)

Everything delegates verbatim to the tested operators — the facade
adds NO new dataflow (a pytest pins method-for-method equality with
the direct calls), only the binding of path + quantizer + fingerprint
that every call otherwise repeats.  After ``build``, the quantizer is
AT REST with the index (operators/artifacts), so a fresh session can
construct ``VectorIndex(path)`` and serve immediately: ``centroids``
are loaded from the artifact, never retrained.

Scale notes live on the delegated operators; the one facade-level
contract is that ALL serving methods read the same cell-partitioned
layout, so build-once-serve-many holds across every access path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from spark_streaming_kafka2elasticsearch_spark.operators import similarity as _sim


class VectorIndex:
    """A persisted, cell-partitioned vector index bound to one
    directory.  ``fingerprint`` (optional) stamps builds and guards
    loads — see :mod:`operators.artifacts`."""

    def __init__(
        self,
        path: str,
        fingerprint: str | None = None,
        corpus_id: str = "vec_id",
        corpus_vec: str = "embedding",
        query_id: str = "query_id",
        query_vec: str = "query_embedding",
    ) -> None:
        self.path = path
        self.fingerprint = fingerprint
        self._cols = dict(
            corpus_id=corpus_id,
            corpus_vec=corpus_vec,
            query_id=query_id,
            query_vec=query_vec,
        )
        self._centroids: DataFrame | None = None

    # -- lifecycle ---------------------------------------------------------

    def build(self, corpus: DataFrame, centroids: DataFrame) -> "VectorIndex":
        """Assign + lay down the cell-partitioned layout and persist
        the quantizer at rest (one corpus scan)."""
        _sim.ivf_persisted_topk(
            corpus,
            corpus.limit(0).select(
                corpus[self._cols["corpus_id"]].alias(self._cols["query_id"]),
                corpus[self._cols["corpus_vec"]].alias(self._cols["query_vec"]),
            ),
            centroids,
            self.path,
            k=1,
            corpus_id=self._cols["corpus_id"],
            corpus_vec=self._cols["corpus_vec"],
            query_id=self._cols["query_id"],
            query_vec=self._cols["query_vec"],
            rebuild=True,
            fingerprint=self.fingerprint,
        )
        self._centroids = centroids
        return self

    def append(self, delta: DataFrame, batch_id: int | None = None) -> None:
        """Incremental maintenance: assign the delta with the SAME
        at-rest quantizer and append (``batch_id`` selects the
        replay-idempotent two-level layout)."""
        _sim.ivf_persisted_append(
            delta,
            self._centroid_df(delta),
            self.path,
            corpus_id=self._cols["corpus_id"],
            corpus_vec=self._cols["corpus_vec"],
            batch_id=batch_id,
        )

    def compact(
        self, max_files_per_cell: int = 4, target_files_per_cell: int = 1
    ) -> list:
        """Rewrite oversized cell directories (dynamic partition
        overwrite); serving is hash-equal before and after."""
        from spark_streaming_kafka2elasticsearch_spark.sources.writer import (
            compact_partitions,
        )

        spark = (self._centroids or self._load_centroids_df()).sparkSession
        return compact_partitions(
            spark,
            self.path,
            "cell",
            max_files_per_partition=max_files_per_cell,
            target_files_per_partition=target_files_per_cell,
        )

    # -- serving -----------------------------------------------------------

    def search(
        self, corpus: DataFrame, queries: DataFrame, k: int = 10, n_probe: int = 1
    ) -> DataFrame:
        """Pruned top-k from the at-rest layout (multi-probe dial)."""
        return _sim.ivf_persisted_topk(
            corpus,
            queries,
            self._centroids,
            self.path,
            k=k,
            n_probe=n_probe,
            rebuild=False,
            fingerprint=self.fingerprint,
            **self._cols,
        )

    def range_search(
        self,
        corpus: DataFrame,
        queries: DataFrame,
        threshold: float,
        n_probe: int = 2,
    ) -> DataFrame:
        """All neighbors with cosine ≥ threshold within probed cells."""
        return _sim.ivf_range_search(
            corpus,
            queries,
            self._centroids,
            self.path,
            threshold=threshold,
            n_probe=n_probe,
            rebuild=False,
            fingerprint=self.fingerprint,
            **self._cols,
        )

    def filtered_search(
        self,
        corpus: DataFrame,
        queries: DataFrame,
        predicate: Column | str,
        k: int = 10,
        n_probe: int = 2,
        attrs: list[str] | None = None,
    ) -> DataFrame:
        """Pre-filtered top-k (metadata predicate pushed into the
        pruned scan).  The layout must have been built via
        :func:`operators.similarity.ivf_filtered_topk`'s build leg (or
        this method's ``rebuild`` path) so the ``attrs`` columns are
        at rest; plain :meth:`build` layouts carry no attrs."""
        return _sim.ivf_filtered_topk(
            corpus,
            queries,
            self._centroids,
            self.path,
            predicate,
            k=k,
            n_probe=n_probe,
            attrs=attrs,
            rebuild=False,
            fingerprint=self.fingerprint,
            **self._cols,
        )

    def diverse_search(
        self,
        corpus: DataFrame,
        queries: DataFrame,
        k: int = 10,
        per_cell: int = 3,
        n_probe: int = 4,
    ) -> DataFrame:
        """Quota-diversified top-k (≤ per_cell answers per cell)."""
        return _sim.ivf_diverse_topk(
            corpus,
            queries,
            self._centroids,
            self.path,
            k=k,
            per_cell=per_cell,
            n_probe=n_probe,
            rebuild=False,
            fingerprint=self.fingerprint,
            **self._cols,
        )

    # -- internals ---------------------------------------------------------

    def _centroid_df(self, like: DataFrame) -> DataFrame:
        """The centroid table: the one given at build time, else the
        at-rest artifact (fresh session)."""
        if self._centroids is not None:
            return self._centroids
        return self._load_centroids_df(like.sparkSession)

    def _load_centroids_df(self, spark=None):
        from pyspark.sql import SparkSession

        from spark_streaming_kafka2elasticsearch_spark.operators.artifacts import (
            load_centroids,
        )

        spark = spark or SparkSession.getActiveSession()
        crows = load_centroids(self.path, expected_fingerprint=self.fingerprint)
        if crows is None:
            raise ValueError(
                f"no (or stale) centroid artifact under {self.path}/_quantizer"
            )
        df = spark.createDataFrame(
            [(int(c), [float(x) for x in v]) for c, v in crows],
            "centroid_id long, centroid_vec array<double>",
        )
        self._centroids = df
        return df
