import shutil
import tempfile

import pytest

from embulk_input_mixpanel_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def tmp_table_dir():
    d = tempfile.mkdtemp(prefix="laketbl-")
    yield d
    shutil.rmtree(d, ignore_errors=True)
