"""Declared query operators.

Every public operator here is a function ``(spark, sf_dir) -> DataFrame``
with a sibling ``*_SQL`` DuckDB oracle string (or generator), registered in
``__spark_entry__.py``.  Modules:

- ``knn``        : the reference's flagship cosine top-k pipeline + variants
- ``crud``       : get/delete/upsert/count/normalize (reference O2,O4,O5,O9-O12)
- ``relational`` : TPC-H-shaped analytics over the star schema
- ``events``     : time windows, sessionization, per-user windows, JSON props
- ``dedup``      : exact / MinHash-LSH / SimHash / Jaccard / embedding near-dup
- ``textops``    : token stats, language-ID, quality scoring, fingerprints
- ``similarity`` : ANN paths (IVF cells, random-hyperplane LSH) + knn join
- ``multimodal`` : binary-column plumbing with stubbed decoders
"""
