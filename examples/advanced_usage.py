"""Advanced usage: bulk-load a Parquet embedding dataset, search with a
threshold and a metadata predicate, and run a batched multi-query search.

The PySpark mirror of the reference's examples/advanced_usage.rs, which
downloads a Wikipedia embedding Parquet from HuggingFace and upserts 1000
rows. This container is offline, so the driver-provided embeddings fixture
plays the dataset role; the flow — Parquet → collection → top-5 query with
``better_than=0.5`` (examples/advanced_usage.rs:155) — is the same. The
batched query at the end is the scale-out step the reference cannot do:
N query vectors sharing ONE corpus scan.

Run:  python examples/advanced_usage.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from nano_vectordb_rs_spark import VectorCollection, get_spark  # noqa: E402


def main(spark=None, sf_dir: str = "/root/testdata/sf0.001", limit: int = 1000) -> list:
    spark = spark or get_spark("advanced-usage-example")

    # Load dataset (reference pulls a HF parquet; we read the fixture)
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .limit(limit)
        .select(
            F.col("vec_id").cast("string").alias("__id__"),
            F.col("embedding").alias("vector"),
            "label",
        )
    )
    dim = len(emb.first()["vector"])
    print(f"loaded {emb.count()} samples, dim={dim}")

    db = VectorCollection.open(spark, dim, tempfile.mkdtemp() + "/wiki")
    report = db.upsert(emb)
    print(f"inserted {len(report['inserted'])} vectors")

    # Use a stored sample as the query, like the reference (its row 999)
    query_vector = [float(x) for x in emb.collect()[-1]["vector"]]

    # Top-5 with a score threshold (reference: db.query(&q, 5, Some(0.5), None))
    results = db.query(query_vector, top_k=5, better_than=0.5).collect()
    for r in results:
        print(f"{r['__id__']}: label={r['label']} score={r['__metrics__']:.4f}")

    # Metadata-predicate search — the reference's DataFilter closure, as a
    # Catalyst-optimizable predicate instead of an opaque callback
    filtered = db.query(query_vector, top_k=3, where="label = 3").collect()
    print(f"label=3 hits: {[r['__id__'] for r in filtered]}")

    # Batched search: every vector in a query block gets its own top-3 from a
    # single corpus scan (no reference counterpart — N calls = N scans there)
    queries = emb.limit(5)
    batched = db.query_batch(queries, top_k=3)
    print(f"batched result rows: {batched.count()} (5 queries x top-3)")
    return results


if __name__ == "__main__":
    main(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
