"""Aggregated query registry: importing this module registers every
query family (core parity, streaming twins, scale extensions) into
``registry.QUERIES``.
"""

from __future__ import annotations

from kafka_cdc_elasticsearch_pipeline_spark.registry import QUERIES, QuerySpec, query  # noqa: F401

# Import for side effect: each module registers its queries. These are
# deliberately NOT wrapped in try/except: a family that fails to import
# must fail the whole registry loudly, never silently shrink the
# correctness gate (round-1 lesson — a swallowed ImportError would have
# hidden 27 queries from the driver with no signal at all).
import kafka_cdc_elasticsearch_pipeline_spark.queries_core  # noqa: F401, E402
import kafka_cdc_elasticsearch_pipeline_spark.queries_ksql  # noqa: F401, E402
import kafka_cdc_elasticsearch_pipeline_spark.queries_tpch  # noqa: F401, E402
import kafka_cdc_elasticsearch_pipeline_spark.streaming.queries_streaming  # noqa: F401, E402
import kafka_cdc_elasticsearch_pipeline_spark.extensions.queries_ext  # noqa: F401, E402
