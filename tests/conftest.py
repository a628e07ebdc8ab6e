from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from web_scraper_v1_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="web_scraper_v1_spark_tests",
        cores=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")),
        shuffle_partitions=8,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """Tiny deterministic corpus (FIXTURES.md scale 'tiny')."""
    from web_scraper_v1_spark.sources.corpus import materialize_corpus

    out = str(tmp_path_factory.mktemp("corpus_tiny"))
    materialize_corpus(out, n_pages=1000, n_seeds=60, n_hosts=10)
    return out
