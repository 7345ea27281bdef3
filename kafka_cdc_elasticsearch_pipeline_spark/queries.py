"""Aggregated query registry: importing this module registers every
query family (core parity, streaming twins, scale extensions) into
``registry.QUERIES``.
"""

from __future__ import annotations

from kafka_cdc_elasticsearch_pipeline_spark.registry import QUERIES, QuerySpec, query  # noqa: F401

# Import for side effect: each module registers its queries.
import kafka_cdc_elasticsearch_pipeline_spark.queries_core  # noqa: F401, E402

try:  # registered incrementally; keep the core importable regardless
    import kafka_cdc_elasticsearch_pipeline_spark.streaming.queries_streaming  # noqa: F401, E402
except ImportError:
    pass
try:
    import kafka_cdc_elasticsearch_pipeline_spark.extensions.queries_ext  # noqa: F401, E402
except ImportError:
    pass
