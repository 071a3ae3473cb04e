"""Golden-output tests for the parse→curate→join path (SURVEY.md §5).

The fixture corpus exercises every edge the reference's design implies
(FIXTURES.md F1): malformed JSON → null struct, empty/null basket vs
explode/explode_outer, unmatched join key → null city, both fulfilment
branches, data_key derivation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_streaming_kafka2elasticsearch_spark.operators.curate import (
    cast_value_to_string,
    curate_orders,
    deterministic_sample,
    explode_basket,
    parse_json_events,
    products_sold,
)
from spark_streaming_kafka2elasticsearch_spark.operators.joins import enrich_stream_static

GOOD_ROW = (
    '{"order_id": 1001, "order_total": 250.0, "ship_to_city_id": 7, "freight": 9.99,'
    ' "customer_id": 42, "ship_method": "Express", "order_number": "BEX-23-00017",'
    ' "discount_applied": 10.0, "order_date": "2023-11-17 10:15:30",'
    ' "order_basket": [{"order_qty": 2, "product_id": 501, "is_discounted": true},'
    ' {"order_qty": 1, "product_id": 502, "is_discounted": false}]}'
)
MERCHANT_ROW = (  # char 6 of order_number == '4' → fulfilment "Merchant"
    '{"order_id": 1002, "order_total": 100.0, "ship_to_city_id": 99, "freight": 1.0,'
    ' "customer_id": 7, "ship_method": "Ground", "order_number": "BEX-24-00018",'
    ' "discount_applied": 0.0, "order_date": "2023-11-18 09:00:00",'
    ' "order_basket": []}'
)
MALFORMED_ROW = '{"order_id": oops not json'


@pytest.fixture(scope="module")
def raw_df(spark):
    return spark.createDataFrame(
        [(GOOD_ROW,), (MERCHANT_ROW,), (MALFORMED_ROW,)], ["value"]
    )


@pytest.fixture(scope="module")
def parsed_df(spark, raw_df):
    return parse_json_events(raw_df)


def test_malformed_json_yields_null_row(parsed_df):
    # PERMISSIVE from_json: the bad record parses to an all-null row.
    rows = parsed_df.collect()
    assert len(rows) == 3
    null_rows = [r for r in rows if r["order_id"] is None]
    assert len(null_rows) == 1


def test_drop_malformed(spark, raw_df):
    assert parse_json_events(raw_df, drop_malformed=True).count() == 2


def test_parse_schema_and_values(parsed_df):
    good = parsed_df.filter(F.col("order_id") == 1001).collect()[0]
    assert good["order_total"] == 250.0
    assert good["order_basket"][0]["product_id"] == 501
    assert good["order_basket"][0]["is_discounted"] is True


def test_curate_derivations(parsed_df):
    curated = curate_orders(parsed_df.filter(F.col("order_id").isNotNull()))
    by_num = {r["order_number"]: r for r in curated.collect()}
    good = by_num["BEX-23-00017"]
    assert good["discounted_total"] == 250.0 - (10.0 / 100.0) * 250.0
    assert good["data_key"] == "BEX-23-00017-2023-11-17"
    assert good["fufilment_type"] == "Bexley"  # char 6 (1-based) == '3'
    merch = by_num["BEX-24-00018"]
    assert merch["fufilment_type"] == "Merchant"  # char 6 == '4'
    assert merch["discounted_total"] == 100.0


def test_explode_inner_drops_empty_basket(parsed_df):
    ok = parsed_df.filter(F.col("order_id").isNotNull())
    exploded = explode_basket(ok)
    assert exploded.count() == 2  # only the two line items of order 1001
    assert set(exploded.columns) >= {"order_qty", "product_id", "is_discounted"}


def test_explode_outer_keeps_empty_basket(parsed_df):
    ok = parsed_df.filter(F.col("order_id").isNotNull())
    exploded = explode_basket(ok, outer=True)
    assert exploded.count() == 3  # 2 line items + 1 null-padded row
    assert exploded.filter(F.col("product_id").isNull()).count() == 1


def test_products_sold_projection(parsed_df):
    ok = parsed_df.filter(F.col("order_id").isNotNull())
    view = products_sold(explode_basket(ok))
    assert view.columns == ["customer_id", "order_number", "product_id", "order_qty"]


def test_left_join_null_for_unmatched_city(spark, parsed_df):
    dim = spark.createDataFrame([(7, "London")], ["city_id", "city"])
    curated = curate_orders(parsed_df.filter(F.col("order_id").isNotNull()))
    joined = enrich_stream_static(curated, dim, "ship_to_city_id", "city_id")
    rows = {r["order_number"]: r for r in joined.collect()}
    assert rows["BEX-23-00017"]["city"] == "London"
    assert rows["BEX-24-00018"]["city"] is None  # city 99 unmatched
    assert "city_id" not in joined.columns  # dim key dropped (reference :426)


def test_deterministic_sample_is_stable(spark):
    df = spark.range(1000).withColumnRenamed("id", "k")
    a = sorted(r["k"] for r in deterministic_sample(df, 10, "k").collect())
    b = sorted(r["k"] for r in deterministic_sample(df.repartition(7), 10, "k").collect())
    assert a == b and 0 < len(a) < 1000


def test_cast_value_to_string(spark):
    df = spark.createDataFrame([(bytearray(b'{"a":1}'),)], "value binary")
    out = cast_value_to_string(df)
    assert out.collect()[0]["value"] == '{"a":1}'
    assert dict(out.dtypes)["value"] == "string"


def test_parse_with_dead_letter_routes_bad_rows(spark):
    """Dead-letter contract: clean rows flatten into the good stream;
    unparseable payloads land in quarantine with the RAW payload
    preserved byte-for-byte (replayability) and nothing is dropped."""
    import json as _json

    from spark_streaming_kafka2elasticsearch_spark.operators.curate import (
        parse_with_dead_letter,
    )

    ok = _json.dumps({"order_id": 1, "order_number": "A-1", "order_total": 5.0})
    garbage = "this is not json at all {{{"
    df = spark.createDataFrame([(ok,), (garbage,)], ["value"])
    good, bad = parse_with_dead_letter(df)
    assert [r["order_number"] for r in good.collect()] == ["A-1"]
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert bad_rows[0]["raw_payload"] == garbage
    assert bad_rows[0]["error_kind"] in ("unparseable", "schema_mismatch")
    assert good.count() + bad.count() == df.count()  # lossless split
