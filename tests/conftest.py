import sys

import pytest

sys.path.insert(0, "/root/repo")

from ipydataclean_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def sf01_dir():
    """The sf0.01 sibling of the default fixture dir (some non-vacuity
    assertions need a corpus big enough for legs to overlap). Skips if
    the sibling layout is absent rather than hard-coding this machine's
    path into tests (advice r08)."""
    import os.path

    p = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01")
    if not os.path.isdir(p):
        pytest.skip(f"sf0.01 fixture dir not present at {p}")
    return p
