from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from activedata_etl_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", parallelism=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(autouse=True)
def _jx_test_limit():
    """The engine ships the reference's DEFAULT_LIMIT=10 (jx_base/query.py:29)
    for queries with no limit clause.  Most tests here assert on full result
    sets without spelling a limit every time, so raise the default for the
    suite; tests that verify the shipped default (test_jx.py::
    test_default_limit_reference_parity) restore the real value themselves."""
    from activedata_etl_spark.plans import jx

    old = jx.DEFAULT_LIMIT
    jx.DEFAULT_LIMIT = 10_000
    yield
    jx.DEFAULT_LIMIT = old
