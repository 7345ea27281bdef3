from kafka_cdc_elasticsearch_pipeline_spark.functions.scalar import (  # noqa: F401
    cast_int,
    cast_string,
    lcase,
    str_concat,
    timestamp_to_string,
)
