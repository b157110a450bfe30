from __future__ import annotations

import shutil
import tempfile

import pytest

from graphrag_kb_server_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def tmp_out():
    d = tempfile.mkdtemp(prefix="kgspark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
