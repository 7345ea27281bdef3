from kafka_cdc_elasticsearch_pipeline_spark.operators.relational import (  # noqa: F401
    enrich_stream_table,
    point_lookup,
    rekey,
    split_streams,
    topk,
)
from kafka_cdc_elasticsearch_pipeline_spark.operators.table import (  # noqa: F401
    latest_per_key,
)
from kafka_cdc_elasticsearch_pipeline_spark.operators.windows import (  # noqa: F401
    tumbling_agg,
)
