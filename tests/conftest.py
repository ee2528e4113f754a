import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from blacklab_spark.session import get_spark

    sp = get_spark("blacklab-tests", cores=4, shuffle_partitions=8)
    yield sp


@pytest.fixture(scope="session")
def tmp_root(tmp_path_factory):
    p = tmp_path_factory.mktemp("indexes")
    yield str(p)
    shutil.rmtree(str(p), ignore_errors=True)
