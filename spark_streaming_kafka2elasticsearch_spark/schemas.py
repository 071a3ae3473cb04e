"""Declared schemas — schema-on-read is a first-class engine concept.

The reference hand-declares a 10-field order-event ``StructType``
(reference ``bexley_spark_stream_msk_es.py:303-322``) and applies it
with ``from_json`` (``:325``), relying on PERMISSIVE mode to null out
malformed records.  We keep that exact schema (it is the parity
contract for the curated pipeline) and add the Kafka envelope schema
the reference leaves implicit (``:292``, headers included via
``includeHeaders=true`` at ``:206``).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: The order event carried in the Kafka message value (JSON).
#: Field-for-field parity with the reference's ``stream_schema``
#: (``bexley_spark_stream_msk_es.py:303-322``): note ``ship_method`` is
#: deliberately a string (comment "change ship method to String", ``:301``)
#: and ``order_date`` stays a string at parse time (``:312``), cast to
#: timestamp only in the windowing path (``:446``).
ORDER_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.IntegerType(), True),
        T.StructField("order_total", T.DoubleType(), True),
        T.StructField("ship_to_city_id", T.IntegerType(), True),
        T.StructField("freight", T.DoubleType(), True),
        T.StructField("customer_id", T.IntegerType(), True),
        T.StructField("ship_method", T.StringType(), True),
        T.StructField("order_number", T.StringType(), True),
        T.StructField("discount_applied", T.DoubleType(), True),
        T.StructField("order_date", T.StringType(), True),
        T.StructField(
            "order_basket",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("order_qty", T.IntegerType(), True),
                        T.StructField("product_id", T.IntegerType(), True),
                        T.StructField("is_discounted", T.BooleanType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

#: Kafka source envelope (what ``readStream.format("kafka")`` yields);
#: implicit in the reference (printed at ``bexley_spark_stream_msk_es.py:292``).
KAFKA_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType(), True),
                        T.StructField("value", T.BinaryType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

#: Shipping-destinations dimension (reference's MySQL view
#: ``SELECT city_id, city FROM vw_uk_cities``,
#: ``bexley_spark_stream_msk_es.py:91``).
CITIES_DIM_SCHEMA = T.StructType(
    [
        T.StructField("city_id", T.IntegerType(), True),
        T.StructField("city", T.StringType(), True),
    ]
)
