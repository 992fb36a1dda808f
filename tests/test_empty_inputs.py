"""Degenerate-input robustness: every query must survive ZERO-row tables.

A long-lived store hits empty inputs constantly — a fresh collection, a
filtered-out partition, a day with no events. Round 7's sweep of all 143
declared queries over an all-empty fixture found five crashes (divide-by-
zero in the cell-health shares, an IndexError in power iteration's empty
collect, and three UNABLE_TO_INFER_SCHEMA reads of zero-row partitionBy
index writes, which leave no data files to infer from). This test pins the
fixes by re-running exactly those five (plus the flagship) against an
empty twin of the fixture; the full-surface sweep is cheap to re-run by
hand with the same helper.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

PREVIOUSLY_CRASHING = [
    "ivf_cell_health",
    "embedding_top_component",
    "minhash_index_probe",
    "ann_ivf_pq_topk",
    "ann_recall",
    "knn_topk",  # canary: the flagship must stay trivially empty-safe
]


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sf_empty"))
    for t in TABLES:
        duckdb.sql(
            f"COPY (SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet') LIMIT 0) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    yield dst
    shutil.rmtree(dst, ignore_errors=True)


@pytest.mark.parametrize("name", PREVIOUSLY_CRASHING)
def test_query_survives_empty_tables(spark, empty_sf, name):
    rows = entry_mod.queries()[name](spark, empty_sf).collect()
    # empty input ⇒ a well-formed (possibly empty) result, never a crash;
    # ivf_cell_health still reports its N_CENTROIDS empty cells
    assert isinstance(rows, list)
