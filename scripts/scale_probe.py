#!/usr/bin/env python
"""Empirical scaling-exponent probe for the scale-critical operators.

The 100-TB argument in README.md rests on structural claims: banded LSH and
cell-blocking keep pair spaces subquadratic, top-k never global-sorts,
packing is a prefix sum. This script MEASURES those claims: it materializes
1x / 2x / 4x copies of the sf tables (self-union with key remapping — same
distribution, same dup density per copy), times each probe query at every
multiple, and fits the log-log slope. A slope near 1.0 is linear scaling; a
near-dup operator drifting toward 2.0 would be the quadratic blow-up the
blocking exists to prevent.

Usage:  python scripts/scale_probe.py [sf_dir] [multiples...]
        (defaults: /root/testdata/sf0.1  1 2 4)
Output: one JSON line {query: {"times": {mult: sec}, "slope": s}}.

Caveat: local[32] wall-clock at small absolute sizes includes fixed
per-stage scheduling overhead, which UNDERSTATES slopes; a slope clearly
below ~1.3 is safe evidence of subquadratic behavior, and the probe prints
the raw times so drift is visible either way.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from nano_vectordb_rs_spark.session import get_spark  # noqa: E402
from nano_vectordb_rs_spark.operators import (  # noqa: E402
    dedup,
    knn,
    lifecycle,
    pipeline,
    relational3,
    similarity,
    textops,
)
from nano_vectordb_rs_spark.streaming import collection_stream  # noqa: E402

BASE_SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
MULTS = [int(m) for m in sys.argv[2:]] or [1, 2, 4]
WORK = os.environ.get("SCALE_PROBE_DIR", "/tmp/nvdb_scale_probe")

# (query name, callable, tables it reads) — only the scale-critical shapes
PROBES = [
    ("exact_dedup_docs", dedup.exact_dedup_docs, ("documents",)),
    ("minhash_near_dup_docs", dedup.minhash_near_dup_docs, ("documents",)),
    ("ngram_jaccard_pairs", dedup.ngram_jaccard_pairs, ("documents",)),
    ("contamination_check", dedup.contamination_check, ("documents",)),
    ("dup_clusters", dedup.dup_clusters, ("documents",)),
    ("near_dup_embeddings", similarity.near_dup_embeddings, ("embeddings",)),
    ("crossmodal_dup_check", similarity.crossmodal_dup_check, ("embeddings", "documents")),
    ("ann_ivf_topk", similarity.ann_ivf_topk, ("embeddings",)),
    ("knn_topk", knn.knn_topk, ("embeddings",)),
    ("kmeans_embeddings", pipeline.kmeans_embeddings, ("embeddings",)),
    ("pack_sequences", pipeline.pack_sequences, ("documents",)),
    # r05 additions: keeper-selection dedup (one fingerprint shuffle) and
    # collocation lift (two token-keyed count shuffles + vocab joins)
    ("dedup_keep_best", dedup.dedup_keep_best, ("documents",)),
    ("phrase_collocations", textops.phrase_collocations, ("documents",)),
    # r05 late additions: PQ encode+ADC (scan-local) and power-iteration PCA
    ("ann_pq_topk", similarity.ann_pq_topk, ("embeddings",)),
    ("embedding_top_component", pipeline.embedding_top_component, ("embeddings",)),
    # r06 additions: materialized-codes PQ probe (code-column scan; the
    # warm pass builds the codes, so the timed slope is the probe path the
    # 100-TB claim is about) and stride-window exact-substring
    # decontamination (window equi-join — the shape that would go
    # quadratic without the candidate-driven join)
    ("ann_pq_codes_topk", similarity.ann_pq_codes_topk, ("embeddings",)),
    ("exact_substring_contamination", dedup.exact_substring_contamination, ("documents",)),
    # r07 additions: the combined IVF-PQ partitioned-index probe (directory
    # pruning x packed codes — the warm pass builds the index, the timed
    # slope is the probe) and the sampled LSH recall audit (constant
    # RECALL_BLOCK ⇒ slope ~0 expected: the audit cost must NOT grow with
    # the corpus, that is the whole point of auditing a fixed block)
    ("ann_ivf_pq_topk", similarity.ann_ivf_pq_topk, ("embeddings",)),
    ("dedup_pair_recall", dedup.dedup_pair_recall, ("documents",)),
    # r07 late additions: the incremental band-index probe (the warm pass
    # materializes the corpus index; the timed slope is the new-batch probe
    # + candidate-driven verify — the daily-ingest path whose cost must
    # track the BATCH, not the corpus) and the sequential dedup funnel
    # (three chained dedup stages over checkpointed shingles)
    ("minhash_index_probe", dedup.minhash_index_probe, ("documents",)),
    ("dedup_funnel_report", dedup.dedup_funnel_report, ("documents",)),
    # r08 addition: the two-scan ANALYZE profile (exact multi-distinct via
    # one hash-aggregated Expand) — the probe measures that the Expand's
    # cost stays linear in rows, the premise of the documented HLL swap
    ("table_profile", pipeline.table_profile, ("lineitem",)),
    # r09 additions (VERDICT r08 task 7): the four r08-born lifecycle/dedup
    # ops with real data-dependent cost. compact_roundtrip_stats = full
    # rewrite into ceil(n/target) files (linear in bytes written);
    # snapshot_diff_report = two snapshot writes + ONE full-outer id join
    # (the diff's unavoidable shuffle — the slope that must stay linear);
    # snapshot_retention_report = five snapshot writes + an O(versions)
    # manifest sweep; minhash_index_merge_stats = corpus band-index merge
    # write-back, whose oracle side is an independent full rebuild — cost
    # tracks corpus size linearly, never pairs.
    ("compact_roundtrip_stats", lifecycle.compact_roundtrip_stats, ("embeddings",)),
    ("snapshot_diff_report", lifecycle.snapshot_diff_report, ("embeddings",)),
    ("snapshot_retention_report", lifecycle.snapshot_retention_report, ("embeddings",)),
    ("minhash_index_merge_stats", dedup.minhash_index_merge_stats, ("documents",)),
    # r09-born late addition: CDC replay — two snapshot writes + the
    # full-outer change-feed join + the apply's anti join + union + the
    # full-row verification join; every stage id-keyed, so the slope must
    # stay linear (a replay that re-shuffled per change type or verified
    # pairwise would show here)
    ("cdc_apply_report", lifecycle.cdc_apply_report, ("embeddings",)),
    # streaming twin: checkpointed foreachBatch drain of the three change
    # waves — fixed trigger/checkpoint overhead plus the same id-keyed
    # joins per micro-batch; must stay linear like its batch twin
    ("streaming_cdc_apply", collection_stream.streaming_cdc_apply, ("embeddings",)),
    # r10 additions (VERDICT r09 task 4): the two r09-born queries without
    # probe rows. pii_scrub_report = scan-local projection (concat + two
    # regexp_replace + md5) into one source-keyed map-side-combined agg —
    # expected ~linear-or-below (regex cost per row is constant);
    # vacuum_report = save + snapshot + staged crash droppings + the GC
    # sweep, whose manifest work is O(dirs) not O(rows) — the save/snapshot
    # writes are the only row-linear stages, so the slope must stay well
    # under 1 (a vacuum that scanned data files would show here)
    ("pii_scrub_report", textops.pii_scrub_report, ("documents",)),
    ("vacuum_report", lifecycle.vacuum_report, ("embeddings",)),
    # r11 additions (VERDICT r10 task 4): the last two top-5-cost gate
    # queries without probe rows. streaming_collection_upsert = three
    # availableNow foreachBatch drains + per-batch upsert/save — trigger
    # and checkpoint overhead is fixed, the upsert merge + save write are
    # the only row-linear stages, so expect ≈ flat-to-sub-linear;
    # snapshot_time_travel = multi-save lifecycle (two snapshots, a
    # delete_where, reopen) whose manifest work is O(versions) — the
    # snapshot writes are the data term, expect well under 1.
    ("streaming_collection_upsert", collection_stream.streaming_collection_upsert, ("embeddings",)),
    ("snapshot_time_travel", lifecycle.snapshot_time_travel, ("embeddings",)),
    # r13 addition: q2 over the synthetic partsupp. The data term is the
    # partsupp derivation (4 rows per part — part is the scaled table) and
    # the partkey window shuffle; supplier/nation/region stay base-size by
    # design, matching the 100-TB shape (facts grow, dims don't). Expect
    # ≈ linear-or-below; a slope drifting up would mean the window or the
    # broadcast region join stopped scaling with parts alone.
    ("tpch_q2_min_cost_supplier", relational3.tpch_q2_min_cost_supplier, ("part",)),
]

ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def materialize(spark: SparkSession, mult: int) -> str:
    """mult self-union copies of every table with remapped keys.

    Keys are offset per copy, AND the content is perturbed per copy so the
    copies are not near-duplicates of each other — otherwise every doc/vector
    would have mult-1 identical twins and TRUE pair count would grow
    quadratically with mult, polluting the engine-scaling measurement:
      - documents: every token gets a copy-specific suffix — token counts,
        lengths and within-copy duplicate structure are preserved exactly,
        while cross-copy shingle/token Jaccard drops to 0;
      - embeddings: each copy multiplies the vector by a deterministic ±1
        sign mask — cosine within a copy is invariant (both sides flip),
        while cross-copy cosine of identical vectors becomes a random-sign
        sum ~ 0, far below the near-dup threshold.
    Result: per-copy duplicate density is the BASE corpus density, so true
    pairs grow linearly with mult (the production shape — a 2x corpus has
    ~2x the dups, not 4x the cross-pairs).
    """
    # v2: cache key versions the SCALED-TABLE SET (r08 added lineitem) — an
    # early-return on a pre-change x{mult} dir would silently probe the
    # unscaled base table for any table added later. Bump the suffix
    # whenever scaled_keys changes; stale unversioned dirs are swept.
    # generic stale sweep: remove every x{mult}* materialization except the
    # current version, so future scaled_keys bumps stay self-maintaining
    out = os.path.join(WORK, f"x{mult}.v3")
    if os.path.isdir(WORK):
        for entry in os.listdir(WORK):
            full = os.path.join(WORK, entry)
            if (
                (entry == f"x{mult}" or entry.startswith(f"x{mult}."))
                and full != out
                and os.path.isdir(full)
            ):
                shutil.rmtree(full)
    if os.path.isdir(out):
        return out
    os.makedirs(out, exist_ok=True)
    # tables the probes scale, with their offset key; lineitem (r08,
    # table_profile) gets the key offset but no content perturbation — the
    # profile has no similarity semantics, the cost driver is row count
    # r13 added part (tpch_q2's synthetic-partsupp data term); no content
    # perturbation — q2 has no similarity semantics, the cost driver is
    # row count (cache suffix bumped v2 -> v3 for the set change)
    scaled_keys = {
        "documents": "doc_id",
        "embeddings": "vec_id",
        "lineitem": "l_orderkey",
        "part": "p_partkey",
    }
    for table in ALL_TABLES:
        src = os.path.join(BASE_SF, f"{table}.parquet")
        df = spark.read.parquet(src)
        key = scaled_keys.get(table)
        if mult > 1 and key:
            dim = (
                len(df.select("embedding").first()[0])
                if table == "embeddings"
                else 0
            )
            parts = []
            for k in range(mult):
                part = df.withColumn(
                    key,
                    (F.col(key) + F.lit(k) * F.lit(100_000_000)).cast(
                        df.schema[key].dataType.simpleString()
                    ),
                )
                if k > 0 and table == "documents":
                    part = part.withColumn(
                        "text",
                        F.array_join(
                            F.transform(
                                F.split(F.col("text"), " "),
                                lambda t: F.concat(t, F.lit(f"~c{k}")),
                            ),
                            " ",
                        ),
                    )
                elif k > 0 and table == "embeddings":
                    # deterministic ±1 mask per (copy, dim)
                    mask = [
                        1.0 if (hash((k, d)) & 1) == 0 else -1.0
                        for d in range(dim)
                    ]
                    part = part.withColumn(
                        "embedding",
                        F.zip_with(
                            F.col("embedding"),
                            F.array(*[F.lit(m) for m in mask]),
                            lambda x, m: (x * m).cast("float"),
                        ),
                    )
                parts.append(part)
            union = parts[0]
            for p in parts[1:]:
                union = union.unionByName(p)
            union.write.mode("overwrite").parquet(os.path.join(out, f"{table}.parquet"))
        else:
            # non-scaled tables: symlink-equivalent copy via parquet passthrough
            df.write.mode("overwrite").parquet(os.path.join(out, f"{table}.parquet"))
    return out


def main() -> None:
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    dirs = {m: materialize(spark, m) for m in MULTS}

    # SCALE_PROBE_ONLY=a,b,c restricts the sweep — used for the deep (8x)
    # tier, where re-running all 30 probes would cost hours for no new
    # information (the scan-local/manifest-bound probes are already pinned
    # sub-linear at 1-4x; only the pair-space shapes have a quadratic
    # failure mode worth chasing to higher multiples).
    only = {
        s for s in os.environ.get("SCALE_PROBE_ONLY", "").split(",") if s
    }
    probes = [p for p in PROBES if not only or p[0] in only]

    report: dict = {}
    for name, fn, _tables in probes:
        times: dict[int, float] = {}
        for m in MULTS:
            fn(spark, dirs[m]).collect()  # warm plan + parquet footers
            best = math.inf
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, dirs[m]).collect()
                best = min(best, time.perf_counter() - t0)
            times[m] = round(best, 3)
        lo, hi = min(MULTS), max(MULTS)
        slope = (
            (math.log(times[hi]) - math.log(times[lo])) / (math.log(hi) - math.log(lo))
            if times[lo] > 0
            else float("nan")
        )
        report[name] = {"times": {str(m): t for m, t in times.items()}, "slope": round(slope, 2)}
        print(f"[scale-probe] {name}: {report[name]}", file=sys.stderr)

    print(json.dumps({"metric": "scale_probe_slopes", "base_sf": BASE_SF, "mults": MULTS, "probes": report}))
    spark.stop()


if __name__ == "__main__":
    main()
