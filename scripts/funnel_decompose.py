#!/usr/bin/env python
"""Decompose dedup_funnel_report's 8x scale growth (VERDICT r10 task 6).

The 8x deep tier measured the funnel at slope 0.63 (2.16 s -> 7.99 s,
1x -> 8x) — the steepest probe in the tier. This script attributes that
growth to its two candidate mechanisms, both observable from the funnel's
own intermediate counts:

  (a) CANDIDATE-PAIR GROWTH — the banded-LSH bucket join emitting more
      pairs (if cross-copy collisions crept in, pairs would grow
      super-linearly with the multiple);
  (b) VERIFY-JOIN COST — the shingle-level intersection join over a
      linearly-growing candidate set (row volume ~ pairs x shingles/doc).

It materializes the same x{mult}.v2 dirs as scripts/scale_probe.py (reusing
them if present), replays the funnel's stage-3 pipeline, and prints per
multiple: stage-2 survivor count, distinct shingle rows, LSH candidate
pairs, verified (Jaccard >= threshold) pairs, removed ids, and the wall
time of (i) everything through the candidate join and (ii) the verify join
alone. One JSON line; the adjudicating sentence goes to PARITY.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from nano_vectordb_rs_spark.session import get_spark  # noqa: E402
from nano_vectordb_rs_spark.operators.dedup import (  # noqa: E402
    JACCARD_MIN,
    N_BANDS,
    N_HASHES,
    _SPARK_SHINGLES,
)
from nano_vectordb_rs_spark.sources.tables import load_table  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import scale_probe  # noqa: E402  — reuse materialize() and WORK dir

MULTS = [int(m) for m in sys.argv[1:]] or [1, 8]


def funnel_counts(spark, sf_dir: str) -> dict:
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    w1, w2 = Window.partitionBy("h1"), Window.partitionBy("h2")
    flags = (
        docs.select("doc_id", F.md5("text").alias("h1"), F.md5(norm).alias("h2"))
        .withColumn("keep1", F.col("doc_id") == F.min("doc_id").over(w1))
        .withColumn(
            "keep2",
            F.col("keep1")
            & (
                F.col("doc_id")
                == F.min(F.when(F.col("keep1"), F.col("doc_id"))).over(w2)
            ),
        )
        .localCheckpoint()
    )
    surv2 = docs.join(flags.filter("keep2").select("doc_id"), "doc_id", "left_semi")

    t0 = time.perf_counter()
    sh = (
        surv2.select("doc_id", F.split("text", " ").alias("w"))
        .select("doc_id", F.explode(F.expr(_SPARK_SHINGLES)).alias("shingle"))
        .distinct()
        .localCheckpoint()
    )
    n_shingle_rows = sh.count()
    sigs = sh.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        *[
            F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("shingle")))).alias(f"h{j}")
            for j in range(N_HASHES)
        ],
    )
    bands = sigs.select(
        "doc_id",
        "n_shingles",
        F.posexplode(
            F.array(
                *[
                    F.md5(F.concat_ws("|", f"h{2 * b}", f"h{2 * b + 1}"))
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band", "key"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            F.col("a.n_shingles").alias("n1"),
            F.col("b.n_shingles").alias("n2"),
        )
        .distinct()
        .localCheckpoint()  # split timing: candidate stage vs verify stage
    )
    n_cand = cand.count()
    t_cand = time.perf_counter() - t0

    t0 = time.perf_counter()
    s1, s2 = sh.alias("s1"), sh.alias("s2")
    inter = (
        cand.join(s1, F.col("doc1") == F.col("s1.doc_id"))
        .join(
            s2,
            (F.col("doc2") == F.col("s2.doc_id"))
            & (F.col("s1.shingle") == F.col("s2.shingle")),
        )
        .groupBy("doc1", "doc2", "n1", "n2")
        .agg(F.count("*").alias("n_inter"))
        .localCheckpoint()
    )
    n_verified = inter.filter(
        F.col("n_inter") / (F.col("n1") + F.col("n2") - F.col("n_inter"))
        >= JACCARD_MIN
    ).count()
    t_verify = time.perf_counter() - t0

    return {
        "n_docs": docs.count(),
        "n_surv2": surv2.count(),
        "n_shingle_rows": n_shingle_rows,
        "n_candidate_pairs": n_cand,
        "n_verified_pairs": n_verified,
        "t_through_candidates_sec": round(t_cand, 2),
        "t_verify_join_sec": round(t_verify, 2),
    }


def main() -> None:
    spark = get_spark("funnel-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for m in MULTS:
        d = scale_probe.materialize(spark, m)
        funnel_counts(spark, d)  # warm: plan + parquet footers + JIT
        out[str(m)] = funnel_counts(spark, d)
        print(f"[funnel-decompose] x{m}: {out[str(m)]}", file=sys.stderr)
    print(json.dumps({"metric": "funnel_decomposition", "mults": out}))
    spark.stop()


if __name__ == "__main__":
    main()
