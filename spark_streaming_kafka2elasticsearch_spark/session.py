"""SparkSession factory.

Generalizes the reference's ``init_spark`` (reference
``bexley_spark_stream_msk_es.py:56-63``) and its conf touches
(S3A filesystem + credentials + fast upload, ``:118-124``; the
commented static ``spark.sql.shuffle.partitions=10000`` at ``:123``).

Design decisions for 100 TB scale:

* **AQE on by default** instead of a hand-tuned static shuffle
  partition count — runtime coalescing + skew-join splitting adapt to
  the actual data volume per stage, which a constant cannot.
* **UTC session timezone** so event-time semantics are deterministic
  across driver/executor hosts.
* **Arrow enabled** so any pandas-UDF slow path is batched, never
  row-at-a-time.
* Shuffle partition default is sized for the local test harness; on a
  real cluster AQE's ``coalescePartitions`` makes the initial number
  mostly irrelevant (start high, coalesce down).
"""

from __future__ import annotations

import os
from collections.abc import Mapping

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "spark-streaming-kafka2elasticsearch-spark"

#: Native thread pools inside each PYTHON WORKER are pinned to one
#: thread (guide §5 — CPU discipline at the Python boundary).  Spark's
#: parallelism unit is the task: local[32] already runs 32 concurrent
#: Python workers, so a numpy/OpenBLAS (or libjpeg/ffmpeg-style
#: decoder) pool of t threads per worker oversubscribes the box 32·t
#: ways.  Measured on the r14 driver host: the full bench was FASTER
#: at 8 cores (338.9 s) than at 32 (394.2 s), with the Arrow-kernel /
#: pandas-UDF / media-decode queries inverted hardest
#: (knn_graph_delete_serve scaling 0.25, multimodal decodes
#: 0.29–0.33, weighted_avg_price_pandas 0.30).  Pinning is the
#: standard one-process-per-core discipline; values are overridable
#: by exporting the variable before session build (setdefault only).
_WORKER_THREAD_ENV: dict[str, str] = {
    "OMP_NUM_THREADS": "1",
    "OPENBLAS_NUM_THREADS": "1",
    "MKL_NUM_THREADS": "1",
    "NUMEXPR_NUM_THREADS": "1",
    "VECLIB_MAXIMUM_THREADS": "1",
}

#: Conf applied to every session this engine builds.  Each is a public
#: Spark knob; values chosen for "let Catalyst/AQE decide at runtime".
BASE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Streaming state: RocksDB survives large keyed state (the modern
    # upgrade over the reference's default HDFSBackedStateStore).
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    "spark.sql.shuffle.partitions": "32",
    # Whole-stage-codegen class cache: the default 100 entries thrashes
    # on a 100+-query workload (each query compiles several stages), so
    # every repeated run pays janino again — measured 8.7s cold vs 2.8s
    # warm on the SRP near-dup plan.  2000 classes is a few hundred MB
    # of metaspace at most; read once at first codegen, so it must be
    # set at session build, not later.
    "spark.sql.codegen.cache.maxEntries": "2000",
    "spark.ui.enabled": "false",
}

#: S3A conf mirroring the reference's cloud deployment surface
#: (``bexley_spark_stream_msk_es.py:118-124``).  Opt-in — tests never
#: touch object storage.
S3A_CONF: dict[str, str] = {
    "spark.hadoop.fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
    "spark.hadoop.fs.s3a.aws.credentials.provider": (
        "com.amazonaws.auth.DefaultAWSCredentialsProviderChain"
    ),
    "spark.hadoop.fs.s3a.fast.upload": "true",
}


def build_session(
    master: str | None = None,
    app_name: str = DEFAULT_APP_NAME,
    extra_conf: Mapping[str, str] | None = None,
    enable_s3a: bool = False,
) -> SparkSession:
    """Build (or get) a SparkSession with the engine's defaults.

    ``master`` resolution order: explicit arg → ``$SPARK_GRAFT_MASTER``
    → ``local[N]`` with N from ``$SPARK_GRAFT_CPUS`` (default ``*``).
    An existing active session is reused (``getOrCreate`` semantics),
    matching how the reference holds one session for the whole job.
    """
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"

    # Two delivery paths for the worker thread pins, because each
    # covers a case the other misses: (1) os.environ before the JVM
    # launches — forked pyspark.daemon workers inherit the gateway
    # JVM's environment (covers local mode, where spark.executorEnv
    # reaches workers through the same executorEnvs map only at
    # PythonFunction creation); (2) spark.executorEnv.* — the
    # documented executor-process env for cluster deployments.  Both
    # are setdefault-style: an operator who exports their own value
    # wins.
    for var, val in _WORKER_THREAD_ENV.items():
        os.environ.setdefault(var, val)

    builder = SparkSession.builder.master(master).appName(app_name)
    conf: dict[str, str] = dict(BASE_CONF)
    for var in _WORKER_THREAD_ENV:
        conf.setdefault(f"spark.executorEnv.{var}", os.environ[var])
    if enable_s3a:
        conf.update(S3A_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for key, value in conf.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def release_cached_state(spark) -> int:
    """Release EVERYTHING the session holds in the block manager:
    SQL-cached relations (``catalog.clearCache``) AND persistent RDDs —
    which includes ``localCheckpoint`` blocks that ``clearCache`` does
    NOT touch (they are RDD-level persists, invisible to the SQL cache
    manager, and otherwise linger until the driver garbage-collects
    the last reference).  Returns the number of RDDs unpersisted.

    Why this exists: the iterative operators (connected components,
    PageRank, k-core, BFS) truncate lineage with eager
    ``localCheckpoint`` — correct per query, but in a long-lived
    session running hundreds of queries (bench, the oracle gate, a
    query service) the orphaned checkpoint blocks accumulate into GC
    pressure that was measured DOUBLING the heavy graph queries by the
    third bench pass.  Callers must only invoke this BETWEEN
    independent queries: unpersisting a checkpointed RDD makes it
    unrecomputable (its lineage was truncated), so any still-live
    DataFrame built on one dies with it.
    """
    spark.catalog.clearCache()
    # py4j surfaces the JavaSparkContext's Map<Integer, JavaRDD> as a
    # Python mapping; snapshot the values before unpersisting mutates it.
    rdds = list(spark.sparkContext._jsc.getPersistentRDDs().values())
    for rdd in rdds:
        rdd.unpersist(False)
    return len(rdds)
