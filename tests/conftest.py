import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from mre.io import get_spark
    s = get_spark(app="mre-tests", master="local[2]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """pages.parquet + golden.parquet for N=120 docs (all families, dups,
    truncation, medium size class)."""
    from mre.fixtures import write_fixture_parquet
    d = tmp_path_factory.mktemp("fixtures")
    write_fixture_parquet(str(d), n=120)
    return str(d)
