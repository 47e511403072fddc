from __future__ import annotations

import os

import pytest

SF_SMALL = os.environ.get("XNGIN_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("XNGIN_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from xngin_spark.session import get_spark

    s = get_spark("xngin_spark_tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL


@pytest.fixture(scope="session")
def oracle_con():
    from xngin_spark.oracle import duckdb_connect

    con = duckdb_connect(SF_SMALL)
    yield con
    con.close()


@pytest.fixture(autouse=True)
def _drain_operator_caches():
    """Free operator-internal persists and returned-plan checkpoints
    after every test: a full suite runs 1000+ queries through one JVM,
    and graph-operator checkpoints (track_checkpoint) have no GC owner
    until released. Safe here — no plan outlives its test."""
    yield
    from xngin_spark.operators.dedup import (
        release_checkpoints,
        release_persisted,
    )

    release_persisted()
    release_checkpoints()
