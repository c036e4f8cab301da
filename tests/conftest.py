import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from progquery_spark.session import get_spark

    s = get_spark("pytest", master="local[2]", shuffle_partitions=4)
    yield s
    s.stop()
