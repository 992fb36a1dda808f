"""Lifecycle demo: the store-management surface beyond the reference.

The reference's persistence story is one destructive ``save()``
(src/lib.rs:289-293). This walkthrough shows the operational surface a
long-lived 100 TB store needs on top of it, end to end on one collection:

  1. versioned snapshots (``save_snapshot`` — immutable, atomically
     published),
  2. time travel (``open_snapshot`` — reopen any version after later
     mutations),
  3. a row-level change feed between versions (``diff_snapshots``) and
     its CDC-replay consumer (``changes`` ships the delta WITH payload;
     ``apply_changes`` replays it onto a replica at v1 to reconstruct v2
     without moving the table),
  4. predicate deletion (``delete_where`` — the GDPR-purge shape, no
     driver-side id list),
  5. retention (``delete_snapshot`` — refuses the version backing the
     live handle),
  6. small-file compaction (``compact``),
  7. the retention sweep (``expire_snapshots(keep_last=N)`` — the
     Iceberg-expire/VACUUM shape, oldest-first),
  8. crash-dropping GC (``vacuum()`` — reclaims stranded staging/aside
     dirs, orphan snapshot versions and half-written manifests; never
     touches live state).

Run:  python examples/lifecycle_demo.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from nano_vectordb_rs_spark import VectorCollection, get_spark  # noqa: E402


def main(spark=None, path: str | None = None) -> dict:
    spark = spark or get_spark("lifecycle-demo")
    path = path or tempfile.mkdtemp() + "/collection"

    db = VectorCollection.open(spark, 3, path)
    db.upsert(
        spark.createDataFrame(
            [
                ("doc1", [1.0, 0.0, 0.0], "en", "keep"),
                ("doc2", [0.0, 1.0, 0.0], "en", "purge"),
                ("doc3", [0.0, 0.0, 1.0], "de", "keep"),
            ],
            "`__id__` string, vector array<float>, lang string, status string",
        )
    )

    # 1. snapshot the ingested state — v1 is immutable from here on
    v1 = db.save_snapshot()
    print(f"snapshot v{v1} taken; versions = {db.snapshots()}")

    # 4. predicate purge (no id list collected) + an edit + an insert
    db.delete_where(F.col("status") == "purge")
    db.upsert(
        spark.createDataFrame(
            [
                ("doc3", [0.0, 0.5, 0.5], "de", "edited"),
                ("doc4", [0.5, 0.5, 0.0], "fr", "keep"),
            ],
            "`__id__` string, vector array<float>, lang string, status string",
        )
    )
    v2 = db.save_snapshot()

    # 2. time travel: v1 still holds the purged row, untouched
    as_of_v1 = VectorCollection.open_snapshot(spark, 3, path, v1)
    print(f"v{v1} ids:", sorted(r["__id__"] for r in as_of_v1.df.collect()))

    # 3. the change feed between the two versions
    changes = {
        r["__id__"]: r["change"] for r in db.diff_snapshots(v1, v2).collect()
    }
    print("diff v1->v2:", dict(sorted(changes.items())))

    # 3b. CDC replay: ship ONLY the delta to a replica sitting at v1 and
    # reconstruct v2 exactly (the Delta-CDF / Debezium consumer shape)
    replica = VectorCollection.open_snapshot(spark, 3, path, v1)
    replica.apply_changes(db.changes(v1, v2))
    print(
        "replayed replica ids:",
        sorted(r["__id__"] for r in replica.df.collect()),
    )

    # 5. retention: v1 reclaimable, v2 (backing the live handle) refused
    db.delete_snapshot(v1)
    try:
        db.delete_snapshot(v2)
    except ValueError as exc:
        print("retention guard:", exc)

    # 6. compaction: rewrite the accreted micro-batch files into one
    n_files = db.compact(target_rows_per_file=1_000_000)
    print(f"compacted to {n_files} file(s); rows = {len(db)}")

    # 7. retention SWEEP: take a few more snapshots, keep only the newest
    # two (the Iceberg expireSnapshots / VACUUM shape — oldest-first, so a
    # crash mid-sweep leaves a contiguous recent tail)
    for _ in range(3):
        db.save_snapshot()
    dropped = db.expire_snapshots(keep_last=2)
    print(f"expired {dropped}; versions = {db.snapshots()}")

    # 8. GC: fabricate a crash dropping of each kind, then sweep them —
    # the live store and both remaining snapshots are untouched
    import os

    root = db.path + ".snapshots"
    os.makedirs(db.path + ".staging", exist_ok=True)
    os.makedirs(os.path.join(root, "v99"), exist_ok=True)
    removed = db.vacuum()
    print(f"vacuumed {removed}; versions = {db.snapshots()}; rows = {len(db)}")
    return changes


if __name__ == "__main__":
    main()
