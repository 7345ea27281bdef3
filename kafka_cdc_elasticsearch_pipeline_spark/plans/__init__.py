from kafka_cdc_elasticsearch_pipeline_spark.plans.pipeline import (  # noqa: F401
    ratings_pipeline,
)
