from kafka_cdc_elasticsearch_pipeline_spark.ksql.translate import KsqlEngine

__all__ = ["KsqlEngine"]
