"""Runtime compatibility shims (optional-dependency gap fillers)."""

from kafka_cdc_elasticsearch_pipeline_spark.compat.protobuf_shim import (
    ensure_protobuf,
    protobuf_available,
)

__all__ = ["ensure_protobuf", "protobuf_available"]
