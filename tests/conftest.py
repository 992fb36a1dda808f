from __future__ import annotations

import duckdb
import pytest

from nano_vectordb_rs_spark.session import get_spark
from nano_vectordb_rs_spark.sources.tables import TABLES

import os

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("nano-vectordb-rs-spark-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    # out-of-core: a full-surface sf0.01 sweep shares the process with a
    # long-lived local[32] JVM; without a spill dir one big oracle (e.g.
    # ann_recall's exact-KNN CTE) can lose the malloc race and abort the
    # whole session (observed r11: bad allocation at 256 KiB)
    con.execute("SET temp_directory='/tmp/nvdb_duck_spill'")
    con.execute("SET memory_limit='24GB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
