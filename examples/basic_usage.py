"""Basic usage: create a collection, upsert, query, persist, delete.

The PySpark mirror of the reference's examples/basic_usage.rs — same three
3-dimensional vectors with a color metadata field, same query vector, same
top-2 ask, and the same (updated_ids, inserted_ids) upsert report.

Run:  python examples/basic_usage.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from nano_vectordb_rs_spark import VectorCollection, get_spark  # noqa: E402


def main(spark=None, path: str | None = None) -> list:
    spark = spark or get_spark("basic-usage-example")
    path = path or tempfile.mkdtemp() + "/collection"

    # Initialize database with 3-dimensional vectors (reference: NanoVectorDB::new)
    db = VectorCollection.open(spark, 3, path)

    # Sample data with metadata (reference samples, examples/basic_usage.rs:19-34)
    batch = spark.createDataFrame(
        [
            ("vec1", [1.02, 2.0, 3.0], "red"),
            ("vec2", [-4.0, 5.0, 6.0], "blue"),
            ("vec3", [7.0, 8.0, -9.0], "green"),
        ],
        "`__id__` string, vector array<float>, color string",
    )

    report = db.upsert(batch)
    print(f"updated:  {report['updated']}")
    print(f"inserted: {report['inserted']}")

    # Persist to disk (Parquet dataset + JSON sidecar instead of JSON+base64)
    db.save()

    # Query similar vectors — closest to vec1, like the reference
    results = db.query([0.1, 0.2, 0.3], top_k=2)
    rows = results.collect()
    for r in rows:
        print(f"{r['__id__']}: color={r['color']} score={r['__metrics__']:.4f}")

    # Delete and confirm via len() (reference: db.delete + len)
    db.delete(["vec1"])
    print(f"after delete: len={len(db)}")
    return rows


if __name__ == "__main__":
    main()
