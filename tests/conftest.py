from __future__ import annotations

import os
import sys

# Protobuf shim (tests/_pyshim): bridges the system-vendored pure-Python
# google.protobuf into this container so the transformWithStateInPandas
# test can run. Must happen BEFORE the JVM launches: PYTHONPATH
# propagates to the PySpark executor workers, whose interpreter startup
# imports the shim's sitecustomize (the in-process patch below covers
# this already-started driver interpreter). No-op where protobuf is
# installed for real, and the TWS test stays importorskip-gated where
# neither exists.
_PYSHIM = os.path.join(os.path.dirname(__file__), "_pyshim")
try:
    import google.protobuf  # noqa: F401
except ImportError:
    sys.path.insert(0, _PYSHIM)
    os.environ["PYTHONPATH"] = os.pathsep.join(
        [_PYSHIM] + ([os.environ["PYTHONPATH"]] if os.environ.get("PYTHONPATH") else [])
    )
    import sitecustomize  # noqa: F401  (applies the version-check relaxation)

import pytest

from flink_ms_spark.session import get_spark

SF_SMOKE = os.environ.get("SPARK_GRAFT_SF_SMOKE", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("flink-ms-spark-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
