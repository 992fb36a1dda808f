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


# --- NULL-heavy twin: latent null-handling divergences -----------------------
#
# Round 7's second sweep replayed the full 143-query parity comparison over a
# twin fixture with nulls injected into every nullable column (events.value
# 1-in-3, events.props 1-in-4, documents.lang 1-in-7, documents.source
# 1-in-11, embeddings.label 1-in-5). 140/143 already agreed; three latent
# divergences were found and fixed:
#   * events_props_scrub — DuckDB concat('0x', NULL) = '0x' crashed the
#     oracle's checksum cast (|| propagates NULL; Spark side already did);
#   * label_centroids — the pandas UDAF crashed int(NaN) on the NULL-label
#     group (a real group in both engines' GROUP BY);
#   * label_centroids_mergeable — the oracle's cent⋈ns equi-join dropped
#     the NULL-label group (NULL = NULL is never true; IS NOT DISTINCT FROM).
# This test re-runs exactly those three through the full oracle comparison
# on the null twin.

NULL_SENSITIVE = ["events_props_scrub", "label_centroids", "label_centroids_mergeable"]


@pytest.fixture(scope="module")
def nulls_sf(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sf_nulls"))
    plain = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]
    for t in plain:
        duckdb.sql(
            f"COPY (SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    duckdb.sql(f"""COPY (
      SELECT event_id, ts, user_id, event_type,
             CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS value,
             CASE WHEN event_id % 4 = 1 THEN NULL ELSE props END AS props
      FROM read_parquet('{SF_DIR}/events.parquet'))
      TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    duckdb.sql(f"""COPY (
      SELECT doc_id, text,
             CASE WHEN doc_id % 7 = 2 THEN NULL ELSE lang END AS lang,
             CASE WHEN doc_id % 11 = 3 THEN NULL ELSE source END AS source,
             n_chars
      FROM read_parquet('{SF_DIR}/documents.parquet'))
      TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    duckdb.sql(f"""COPY (
      SELECT vec_id, embedding,
             CASE WHEN vec_id % 5 = 4 THEN NULL ELSE label END AS label
      FROM read_parquet('{SF_DIR}/embeddings.parquet'))
      TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")
    yield dst
    shutil.rmtree(dst, ignore_errors=True)


@pytest.mark.parametrize("name", NULL_SENSITIVE)
def test_query_matches_oracle_under_nulls(spark, nulls_sf, name):
    from tests.test_oracle_parity import _hash_frame

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{nulls_sf}/{t}.parquet')"
        )
    spdf = entry_mod.queries()[name](spark, nulls_sf).toPandas()
    ddf = con.execute(entry_mod.oracle_sql()[name]).df()
    assert sorted(spdf.columns) == sorted(ddf.columns)
    assert len(spdf) == len(ddf), f"{name}: row count {len(spdf)} vs {len(ddf)}"
    assert _hash_frame(spdf) == _hash_frame(ddf), f"{name}: value hash mismatch"


# --- one-row twin: fewer rows than buckets/grouping sets ----------------------
#
# The third sweep ran full parity over single-row tables. Two divergences,
# both fixed: customer_balance_quartiles_approx emitted only the occupied
# quartile while the oracle generates all four structurally (the Spark side
# now left-joins the literal 1..4 frame, empty buckets count 0); and Spark
# grouping sets emit NOTHING on empty input where ANSI/DuckDB emit the
# 0-count grand total (region_rollup's join was empty at one row per table)
# — the rollup/cube oracles now carry `HAVING count(*) > 0`, a no-op on any
# non-empty input.

ONE_ROW_SENSITIVE = [
    "customer_balance_quartiles_approx",
    "region_rollup",
    "sales_rollup",
    "parts_cube",
]


@pytest.fixture(scope="module")
def one_row_sf(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sf_one"))
    for t in TABLES:
        duckdb.sql(
            f"COPY (SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet') LIMIT 1) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    yield dst
    shutil.rmtree(dst, ignore_errors=True)


@pytest.mark.parametrize("name", ONE_ROW_SENSITIVE)
def test_query_matches_oracle_on_one_row_tables(spark, one_row_sf, name):
    from tests.test_oracle_parity import _hash_frame

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{one_row_sf}/{t}.parquet')"
        )
    spdf = entry_mod.queries()[name](spark, one_row_sf).toPandas()
    ddf = con.execute(entry_mod.oracle_sql()[name]).df()
    assert len(spdf) == len(ddf), f"{name}: row count {len(spdf)} vs {len(ddf)}"
    assert _hash_frame(spdf) == _hash_frame(ddf), f"{name}: value hash mismatch"
