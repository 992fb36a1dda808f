"""ORC collection roundtrip + binaryFile media ingestion."""

from __future__ import annotations

from pyspark.sql import functions as F

from nano_vectordb_rs_spark.sources.media_dir import read_media_dir
from nano_vectordb_rs_spark.sources.orc import (
    read_orc_collection,
    write_orc_collection,
)
from nano_vectordb_rs_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _fixture_frame(spark):
    return load_table(spark, SF_DIR, "embeddings").select(
        F.col("vec_id").cast("string").alias("__id__"),
        F.col("embedding").alias("vector"),
        F.col("label").cast("string").alias("label"),
    )


def test_orc_roundtrip_is_lossless(spark, tmp_path):
    src = _fixture_frame(spark)
    path = str(tmp_path / "col_orc")
    write_orc_collection(src, path)
    back = read_orc_collection(spark, path, 64)
    assert back.count() == src.count()
    # full-content checksum survives the roundtrip bit-exactly
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
    assert chk(back) == chk(src)


def test_orc_dim_guard_drops_mismatched_rows(spark, tmp_path):
    src = _fixture_frame(spark).limit(10)
    bad = src.limit(2).withColumn("vector", F.slice("vector", 1, 32))
    path = str(tmp_path / "col_orc_dirty")
    write_orc_collection(src.unionByName(bad), path)
    assert read_orc_collection(spark, path, 64).count() == 10


def test_media_dir_ingest(spark, tmp_path):
    d = tmp_path / "media"
    (d / "sub").mkdir(parents=True)
    (d / "a.jpg").write_bytes(b"\xff\xd8fakejpeg")
    (d / "sub" / "b.wav").write_bytes(b"RIFFfakewav")
    (d / "c.bin").write_bytes(b"opaque")
    (d / "dup_of_a.jpg").write_bytes(b"\xff\xd8fakejpeg")  # same content
    df = read_media_dir(spark, str(d))
    rows = {r["src_path"].split("/")[-1]: r for r in df.collect()}
    assert rows["a.jpg"]["media_type"] == "image"
    assert rows["b.wav"]["media_type"] == "audio"
    assert rows["c.bin"]["media_type"] == "other"
    assert rows["a.jpg"]["n_bytes"] == 10
    assert bytes(rows["a.jpg"]["content"]) == b"\xff\xd8fakejpeg"
    # content-addressed id: identical bytes => identical media_id
    assert rows["a.jpg"]["media_id"] == rows["dup_of_a.jpg"]["media_id"]
    # glob pushes selection into the file listing
    assert read_media_dir(spark, str(d), glob="*.jpg").count() == 2
