"""Oracle-differential gate mirror.

Runs every ``__spark_entry__.queries()`` entry on sf0.001 and compares it to
its ``oracle_sql()`` DuckDB result the same way the driver does: row count,
column names, and an order-insensitive value hash with columns sorted by
name. This is the strongest local predictor of CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime
import hashlib
import math

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_canon(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


QUERY_KEYS = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_KEYS)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    sdf = q(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    if name not in oracles:
        assert len(spark_rows) >= 0  # rows-only check, like the driver
        return

    res = duck.execute(oracles[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    h_s = _hash_rows(spark_cols, spark_rows)
    h_d = _hash_rows(duck_cols, duck_rows)
    if h_s != h_d:
        s_sorted = sorted(map(str, spark_rows))[:5]
        d_sorted = sorted(map(str, duck_rows))[:5]
        raise AssertionError(
            f"{name}: value hash mismatch\nspark: {s_sorted}\nduck : {d_sorted}"
        )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["vec_id", "label", "score"]


def test_distinct_sketch_within_tolerance(spark, duck):
    """events_distinct_sketch has no value oracle (HLL impls differ across
    engines); pin the estimate to within 5% of the exact cardinality."""
    from nano_vectordb_rs_spark.operators.events import events_distinct_sketch

    approx = {
        r["event_type"]: r["approx_users"]
        for r in events_distinct_sketch(spark, SF_DIR).collect()
    }
    exact = dict(
        duck.execute(
            "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(1, 0.05 * n), (et, approx[et], n)


def test_percentile_approx_rank_error(spark, duck):
    """events_value_percentiles_approx has no value oracle (GK sketch);
    assert each estimate's rank in the exact distribution is within 1% of
    the target percentile (accuracy=10000 guarantees 1/10000; 1% is slack
    for the per-partition merge)."""
    from nano_vectordb_rs_spark.operators.events import events_value_percentiles_approx

    rows = events_value_percentiles_approx(spark, SF_DIR).collect()
    for r in rows:
        vals = [
            v[0]
            for v in duck.execute(
                "SELECT value FROM events WHERE event_type = ? ORDER BY value",
                [r["event_type"]],
            ).fetchall()
        ]
        n = len(vals)
        for pct, est in ((0.5, r["p50"]), (0.9, r["p90"]), (0.99, r["p99"])):
            rank = sum(1 for v in vals if v <= est) / n
            assert abs(rank - pct) <= 0.01 + 1.0 / n, (r["event_type"], pct, est, rank)
