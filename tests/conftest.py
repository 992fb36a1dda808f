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
    # cap = min(24GB, ~60% of MemAvailable) so the limit stays below real
    # memory under JVM co-residency on smaller hosts (a cap above physical
    # RAM still OOM-kills); NVDB_DUCK_MEM overrides (r12, ADVICE)
    mem = os.environ.get("NVDB_DUCK_MEM")
    if mem is None:
        try:
            with open("/proc/meminfo") as fh:
                avail_kb = next(
                    int(line.split()[1])
                    for line in fh
                    if line.startswith("MemAvailable:")
                )
            mem = f"{min(24, max(1, int(avail_kb * 0.6 / 1e6)))}GB"
        except (OSError, StopIteration):
            mem = "24GB"
    con.execute(f"SET memory_limit='{mem}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
