import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


@pytest.fixture(scope="session")
def spark():
    from vector2dggs_spark.session import get_spark

    s = get_spark(cores=4, app="tests")
    yield s
    s.stop()
