from spark_streaming_kafka2elasticsearch_spark.plans.pipeline import Pipeline

__all__ = ["Pipeline"]
