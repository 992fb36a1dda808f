#!/usr/bin/env python
"""Vector-kernel dimension-scaling probe: normalize + dot-product vs dim.

SCALE_PROBE covers row-count scaling and SKEW_PROBE the hot-key axis; this
probe measures the third axis the vector engine's cost model asserts but
never measured: per-row work must be LINEAR in the embedding dimension for
both hot kernels —

  - the ingest normalize (MLlib Normalizer path, fastknn.normalize_ml —
    the same kernel collection.upsert and the insert micro time), and
  - the query-side dot product (functions/vector.py aggregate(zip_with)
    HOF fold — the kernel under every KNN query), and
  - (r12, VERDICT r11 task 7) the Arrow/BLAS top-k kernel
    (fastknn.topk_over — the numpy flagship twin the bench times as
    knn_topk_numpy/micro_query: Arrow batches -> one BLAS matvec per
    batch -> per-batch top-k pre-reduction).

Protocol mirrors the insert micro (row count fixed at N_ROWS, dims swept
256→4096 = 16x), per-dim best-of-N with the same 3x-min storm discard as
bench.micro_timed, and a log-log slope fit between the endpoint dims.
A slope near 1.0 = linear in dim; >1 would expose a hidden quadratic
(e.g. an accidental per-element array copy); <1 means fixed per-row
overhead still dominates at 4096. Output: one JSON line (DIM_PROBE.json).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nano_vectordb_rs_spark.session import get_spark  # noqa: E402
from nano_vectordb_rs_spark.operators.fastknn import (  # noqa: E402
    normalize_ml,
    topk_over,
)
from nano_vectordb_rs_spark.functions.vector import (  # noqa: E402
    array_lit,
    as_double_array,
    dot_expr,
)

N_ROWS = int(os.environ.get("DIM_PROBE_ROWS", 100_000))
DIMS = [256, 512, 1024, 2048, 4096]
RUNS = int(os.environ.get("DIM_PROBE_RUNS", 4))
WORK = os.environ.get("DIM_PROBE_DIR", "/tmp/nvdb_dim_probe")


def best_of(fn) -> tuple[float, list[float], list[float]]:
    """bench.micro_timed's discard protocol, standalone (no stats dict)."""
    kept: list[float] = []
    discarded: list[float] = []
    attempts = 0
    while len(kept) < RUNS and attempts < 3 * RUNS:
        attempts += 1
        t0 = time.perf_counter()
        fn()
        t = round(time.perf_counter() - t0, 4)
        if kept and t > 3 * min(kept):
            discarded.append(t)
            time.sleep(10)
            continue
        if t > 0 and any(x > 3 * t for x in kept):
            discarded += [x for x in kept if x > 3 * t]
            kept = [x for x in kept if x <= 3 * t]
        kept.append(t)
    return min(kept), kept, discarded


def main() -> None:
    spark = get_spark("dim-probe")
    spark.sparkContext.setLogLevel("ERROR")
    n_cores = spark.sparkContext.defaultParallelism
    report: dict = {}
    for dim in DIMS:
        path = f"{WORK}/raw_d{dim}"
        if not os.path.isdir(path):
            (
                spark.range(N_ROWS)
                .select(
                    F.col("id").cast("string").alias("__id__"),
                    F.expr(
                        f"transform(sequence(0, {dim - 1}), j -> "
                        f"CAST(pmod(hash(id * {dim} + j), 1000) / 1000.0 "
                        f"- 0.5 AS FLOAT))"
                    ).alias("vector"),
                )
                .write.mode("overwrite")
                .parquet(path)
            )
        raw = spark.read.parquet(path).repartition(n_cores).persist()
        elem1 = F.sum(F.expr("element_at(vector, 1)"))
        raw.agg(elem1).collect()  # materialize the cache
        q = [((h % 1000) / 1000.0 - 0.5) for h in range(dim)]

        # build a FRESH lineage per timed run (see memory: re-collecting
        # one DataFrame reuses its shuffle map outputs — skipped stages —
        # and times only the final agg; first probe version measured a
        # 10x-too-fast "normalize" exactly that way)
        def run_normalize():
            normalize_ml(raw).agg(elem1).collect()

        def run_dot():
            raw.select(
                F.sum(
                    F.expr(dot_expr(as_double_array("vector"), array_lit(q)))
                ).alias("s")
            ).collect()

        def run_topk_arrow():
            # the bench's numpy flagship twin: Arrow-batched BLAS scoring
            # with per-batch top-k pre-reduction (assume_normalized skips
            # the query-side renorm, matching the micro_query protocol)
            topk_over(raw, q, k=10, assume_normalized=True).collect()

        rec: dict = {}
        for label, fn in (
            ("normalize", run_normalize),
            ("dot", run_dot),
            ("topk_arrow", run_topk_arrow),
        ):
            fn()  # warm JIT/code cache
            best, kept, disc = best_of(fn)
            rec[label] = {"best": best, "runs": kept, "discarded": disc}
        report[str(dim)] = rec
        raw.unpersist()
        print(f"[dim-probe] d={dim}: {rec}", file=sys.stderr)
    lo, hi = str(DIMS[0]), str(DIMS[-1])
    slopes = {
        k: round(
            math.log(report[hi][k]["best"] / report[lo][k]["best"])
            / math.log(DIMS[-1] / DIMS[0]),
            2,
        )
        for k in ("normalize", "dot", "topk_arrow")
    }
    print(
        json.dumps(
            {
                "metric": "dim_probe",
                "n_rows": N_ROWS,
                "dims": DIMS,
                "slopes": slopes,
                "probes": report,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
