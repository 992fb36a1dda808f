"""Fixture-property tripwire for tpch_q2's synthetic partsupp
(r14, ADVICE r13).

`_synthetic_partsupp` generates ps_suppkey = (p_partkey + i*17) %
|supplier|; the no-duplicate-(part,supplier)-pairs property holds iff the
four offsets {0, 17, 34, 51} stay DISTINCT modulo the actual supplier
count. That used to be asserted only in a docstring — a future fixture SF
whose supplier count divides an offset difference (any multiple of 17,
e.g. 34 or 51 suppliers) would silently collapse pairs: parity would
still hold (both engines build the identical degenerate table) but the
q2 shape would quietly degrade. Pin it against the REAL fixture files,
plus the cost-domain invariant the integer-tenths parity design relies
on. No Spark session needed — DuckDB reads the parquet directly.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from nano_vectordb_rs_spark.operators.relational3 import (
    Q2_SUPPLIERS_PER_PART,
)

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=os.path.basename)
def test_q2_offsets_distinct_mod_supplier_count(sf_dir):
    path = os.path.join(sf_dir, "supplier.parquet")
    if not os.path.exists(path):
        pytest.skip(f"no supplier table in {sf_dir}")
    n = duckdb.sql(f"SELECT count(*) FROM '{path}'").fetchone()[0]
    assert n > 0
    offsets = [(i * 17) % n for i in range(Q2_SUPPLIERS_PER_PART)]
    assert len(set(offsets)) == Q2_SUPPLIERS_PER_PART, (
        f"{sf_dir}: offsets {offsets} collide mod |supplier|={n} — the "
        "synthetic partsupp would emit duplicate (part, supplier) pairs; "
        "change the offset stride in _synthetic_partsupp"
    )


def test_q2_cost_tenths_domain_is_exact_in_double():
    # every generated cost is an integer in [1000, 9999] tenths; x/10.0
    # for that whole domain is one IEEE divide — identical on Spark and
    # DuckDB — and round-trips through float64 without collisions
    seen = {t / 10.0 for t in range(1000, 10000)}
    assert len(seen) == 9000
