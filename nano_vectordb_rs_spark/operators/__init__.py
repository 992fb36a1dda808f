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

FAULT-TOLERANCE NOTE on ``localCheckpoint(eager=False)`` (ADVICE r15):
several operators checkpoint a shared subtree so it is derived once
instead of per consumer (guide §2.4). ``localCheckpoint`` stores the
materialized partitions on executors WITHOUT replication and truncates
lineage — on a cluster with executor loss (spot kills, dynamic
allocation), a lost partition is NOT recomputed and the job fails and
retries from the start. The trade is deliberate here: every checkpointed
frame is either bounded (pair lists, vocabulary aggregates, ≤#sources²
rows — recompute-trivial on retry) or saves multiple corpus passes that
dominate a rare retry. Deployments with aggressive preemption should
swap these to ``persist(StorageLevel.DISK_ONLY)`` (recomputable lineage,
slightly slower) or a reliable ``checkpoint()`` into the cluster FS; the
choice is mechanical — the frames are the same.
"""
