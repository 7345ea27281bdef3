from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: the ES-role serving face — the modules a serving fix touches.
#: ``pytest -m serving`` is the per-fix fast lane (~1/4 of the full
#: suite); the full run stays the pre-commit gate.
_SERVING_MODULES = {
    "test_search_serve",
    "test_search_rest",
    "test_search_index",
    "test_kibana_reference_objects",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "serving: ES-role serving face (search_serve/search_rest/"
        "search_index + the Kibana translation) — run with "
        "'pytest -m serving' as the per-fix fast lane",
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SERVING_MODULES:
            item.add_marker(pytest.mark.serving)


@pytest.fixture(scope="session")
def spark():
    from kafka_cdc_elasticsearch_pipeline_spark.session import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
