"""nano_vectordb_rs_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of VectorInstitute/nano-vectordb-rs.

NOT a port: the reference (/root/reference/src/lib.rs, ~360 LoC Rust) is a
single-process brute-force cosine-similarity store; this package re-expresses
the same semantics as Spark DataFrame plans that Catalyst/Tungsten can
optimize and scale to a multi-executor cluster, and extends them with the
LLM-data-pipeline operators a 100 TB training-data pipeline needs
(dedup, similarity join, text analysis, streaming events).

Layout
------
- ``collection``  : VectorCollection — the reference-parity user API
                    (open/upsert/query/get/delete/save, SURVEY.md §2.1 O1-O11)
- ``functions``   : vector + text scalar expressions (Catalyst higher-order
                    functions; no Python UDFs in the hot path)
- ``operators``   : declared query pipelines (knn, crud, relational, events,
                    dedup, textops, similarity/ANN, multimodal)
- ``sources``     : parquet table loaders + the reference's JSON+base64
                    format importer (SURVEY.md O15)
- ``streaming``   : Structured Streaming surface over the events table
- ``plans``       : plan-inspection helpers (explain/pushdown assertions)
"""

from nano_vectordb_rs_spark.collection import VectorCollection
from nano_vectordb_rs_spark.session import get_spark

__all__ = ["VectorCollection", "get_spark"]
__version__ = "0.1.0"
