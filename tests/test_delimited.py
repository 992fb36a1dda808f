"""CSV/TSV collection source: roundtrip fidelity + quarantine semantics."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nano_vectordb_rs_spark.sources.delimited import (
    read_csv_collection,
    write_csv_collection,
)
from nano_vectordb_rs_spark.sources.tables import load_table
from tests.conftest import SF_DIR

META = T.StructType([T.StructField("label", T.StringType(), True)])


def _fixture_frame(spark):
    return load_table(spark, SF_DIR, "embeddings").select(
        F.col("vec_id").cast("string").alias("__id__"),
        F.col("embedding").alias("vector"),
        F.col("label").cast("string").alias("label"),
    )


def test_csv_roundtrip_is_lossless(spark, tmp_path):
    src = _fixture_frame(spark)
    path = str(tmp_path / "col_csv")
    write_csv_collection(src, path)
    clean, quarantine = read_csv_collection(spark, path, 64, META)
    assert quarantine.count() == 0
    assert clean.count() == src.count()
    # float32 -> decimal string -> float32 must be exact (shortest repr
    # roundtrips); compare the full content checksum both ways
    chk = lambda df: df.select(
        F.sum(
            F.aggregate(
                F.transform(
                    "vector", lambda x: (x.cast("double") * 1e9).cast("bigint")
                ),
                F.lit(0).cast("bigint"),
                lambda a, x: a + x,
            ).cast("decimal(38,0)")
        ).cast("bigint")
    ).collect()[0][0]
    assert chk(clean) == chk(src)
    # metadata survives
    assert (
        clean.agg(F.countDistinct("label").alias("n")).collect()[0]["n"]
        == src.agg(F.countDistinct("label").alias("n")).collect()[0]["n"]
    )


def test_csv_quarantine_catches_bad_rows(spark, tmp_path):
    d = tmp_path / "dirty"
    d.mkdir()
    good_vec = ";".join(["0.5"] * 4)
    (d / "part.csv").write_text(
        "__id__,vector,label\n"
        f"a,{good_vec},x\n"  # clean
        "b,0.5;0.5;0.5,x\n"  # wrong dimension (3 of 4)
        "c,0.5;oops;0.5;0.5,x\n"  # non-numeric element
        "d,0.5;Infinity;0.5;0.5,x\n"  # infinite element (try_cast accepts!)
        "e,0.5;-Infinity;0.5;0.5,x\n"
        "f,0.5;NaN;0.5;0.5,x\n"
        f",{good_vec},x\n"  # missing id
    )
    clean, quarantine = read_csv_collection(spark, str(d), 4, META)
    assert clean.count() == 1
    assert clean.collect()[0]["__id__"] == "a"
    reasons = {
        r["reject_reason"] for r in quarantine.select("reject_reason").collect()
    }
    assert reasons == {"wrong_dimension", "bad_vector_element", "missing_field"}


def test_csv_source_cache_is_releasable(spark, tmp_path):
    src = _fixture_frame(spark).limit(5)
    path = str(tmp_path / "col_cache")
    write_csv_collection(src, path)
    clean, quarantine = read_csv_collection(spark, path, 64, META)
    clean.count()
    assert clean.source_cache.storageLevel.useMemory  # split shares one scan
    assert quarantine.source_cache is clean.source_cache
    clean.source_cache.unpersist(blocking=True)
    assert not clean.source_cache.storageLevel.useMemory


def test_tsv_delimiter_variant(spark, tmp_path):
    src = _fixture_frame(spark).limit(20)
    path = str(tmp_path / "col_tsv")
    write_csv_collection(src, path, delimiter="\t")
    clean, quarantine = read_csv_collection(spark, path, 64, META, delimiter="\t")
    assert quarantine.count() == 0 and clean.count() == 20
