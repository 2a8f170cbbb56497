import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exome_qc_library_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="tests", parallelism=int(os.environ.get("TEST_CPUS", "8")))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages(spark):
    from exome_qc_library_spark.synth import synthesize_pages

    df = synthesize_pages(spark, n_docs=300, seed=42)
    df.cache().count()
    return df
