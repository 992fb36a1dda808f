#!/usr/bin/env python
"""Skew-scaling probe: salted vs naive fact⋈dim join under a growing hot key.

SCALE_PROBE.json evidences VOLUME scaling; this probe evidences SKEW
scaling — the other axis the 100-TB argument rests on (README "Partitioning
& shuffle": salting for skew). It measures the exact pattern
`skew_salted_join` (operators/advanced.py) implements, at a size where the
mitigation is honestly needed:

  - fact: N_FACT synthetic rows (event_id, user_id, value);
  - dim:  N_USERS user rows — DELIBERATELY too big to broadcast (the
    salted pattern is the documented fallback for exactly that regime;
    with a broadcastable dim, skew is moot because nothing shuffles);
  - skew: a fraction p of fact rows is rewritten to ONE hot user_id,
    p ∈ {0.0, 0.25, 0.5} (p=0.5 ⇒ half the fact lands on one join key).

Per (p, formulation) it reports best-of-2 wall time of the same
count+sum aggregate over the join, plus the hottest join-key's row count
(the reducer-imbalance driver), and asserts both formulations agree on the
aggregate — the salted join must be a pure physical rewrite.

Both formulations run under the engine's SHIPPED config (AQE on, 32
shuffle partitions, default broadcast threshold) — no rigging: if AQE's
runtime skew split absorbs part of the naive penalty, the numbers show
that too. Output: one JSON line, committed as SKEW_PROBE.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nano_vectordb_rs_spark.session import get_spark  # noqa: E402
from nano_vectordb_rs_spark.operators.advanced import N_SALTS  # noqa: E402

N_FACT = int(os.environ.get("SKEW_PROBE_FACT", 4_000_000))
N_USERS = int(os.environ.get("SKEW_PROBE_USERS", 2_000_000))
SKEWS = [0.0, 0.25, 0.5]
WORK = os.environ.get("SKEW_PROBE_DIR", "/tmp/nvdb_skew_probe")
DEC = "decimal(28,10)"


def materialize(spark) -> None:
    if os.path.isdir(f"{WORK}/dim.parquet"):
        return
    shutil.rmtree(WORK, ignore_errors=True)
    (
        spark.range(N_USERS)
        .select(
            F.col("id").alias("user_id"),
            F.pmod(F.hash("id"), F.lit(1000)).alias("segment"),
            (F.pmod(F.hash("id", F.lit(1)), F.lit(10_000)) / 100.0).alias(
                "user_score"
            ),
        )
        .write.mode("overwrite")
        .parquet(f"{WORK}/dim.parquet")
    )
    for p in SKEWS:
        hot_cut = int(p * 1000)
        (
            spark.range(N_FACT)
            .select(
                F.col("id").alias("event_id"),
                # rows whose uniform bucket < 1000p all hit user 0 (hot);
                # the rest spread uniformly over the full user range
                F.when(
                    F.pmod(F.hash("id", F.lit(2)), F.lit(1000)) < hot_cut,
                    F.lit(0),
                )
                .otherwise(F.pmod(F.hash("id", F.lit(3)), F.lit(N_USERS)))
                .alias("user_id"),
                (F.pmod(F.hash("id", F.lit(4)), F.lit(1_000)) / 10.0).alias(
                    "value"
                ),
            )
            .write.mode("overwrite")
            .parquet(f"{WORK}/fact_p{p}.parquet")
        )


def agg(joined):
    return joined.groupBy("segment").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast(DEC)).alias("v"),
        F.sum(F.col("user_score").cast(DEC)).alias("s"),
    )


def run(spark, p: float) -> dict:
    # each call builds a FRESH lineage: re-collecting one DataFrame object
    # reuses its shuffle map outputs (skipped stages) and times only the
    # final stage — the first probe version did exactly that and measured
    # 0.07 s "joins"; fresh reads force the shuffles to actually run
    def naive():
        fact = spark.read.parquet(f"{WORK}/fact_p{p}.parquet")
        dim = spark.read.parquet(f"{WORK}/dim.parquet")
        return agg(fact.join(dim, "user_id"))

    def salted():
        fact = spark.read.parquet(f"{WORK}/fact_p{p}.parquet")
        dim = spark.read.parquet(f"{WORK}/dim.parquet")
        sf = fact.withColumn(
            "salt", F.pmod(F.col("event_id"), F.lit(N_SALTS)).cast("int")
        )
        sd = dim.withColumn(
            "salt", F.explode(F.expr(f"sequence(0, {N_SALTS - 1})"))
        )
        return agg(sf.join(sd, ["user_id", "salt"]))

    # physical-rewrite check: identical aggregates (checksum over segments)
    chk = lambda df: df.agg(  # noqa: E731
        F.sum("n").cast("long").alias("n"),
        F.sum(F.col("v").cast("double")).alias("v"),
    ).collect()[0]
    cn, cs = chk(naive()), chk(salted())
    assert cn["n"] == cs["n"] and abs(cn["v"] - cs["v"]) < 1e-6 * max(
        1.0, abs(cn["v"])
    ), f"salted != naive at p={p}: {cn} vs {cs}"

    out: dict = {
        "hot_key_rows": spark.read.parquet(f"{WORK}/fact_p{p}.parquet")
        .filter("user_id = 0")
        .count(),
        "fact_rows": N_FACT,
    }
    for label, build in (("naive", naive), ("salted", salted)):
        build().collect()  # warm: plan cache, parquet footers, JIT
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            build().collect()
            times.append(time.perf_counter() - t0)
        out[f"{label}_sec"] = round(min(times), 3)
    return out


def plan_facts(spark) -> dict:
    """Deterministic plan evidence at the worst skew: which join strategy
    the naive formulation gets, and whether AQE's runtime skew-split fires
    (it should NOT at this probe size — the hot partition's shuffle bytes
    sit far under the default 256 MB skewedPartitionThresholdInBytes, so
    the hottest reducer really does serialize the hot key's rows)."""
    fact = spark.read.parquet(f"{WORK}/fact_p0.5.parquet")
    dim = spark.read.parquet(f"{WORK}/dim.parquet")
    j = fact.join(dim, "user_id").groupBy("segment").agg(
        F.count("*").alias("n")
    )
    j.collect()  # execute so AQE finalizes the adaptive plan
    plan = j._jdf.queryExecution().executedPlan().toString()
    return {
        "naive_join_node": (
            "SortMergeJoin"
            if "SortMergeJoin" in plan
            else "BroadcastHashJoin"
            if "BroadcastHashJoin" in plan
            else "other"
        ),
        "aqe_skew_split_markers": plan.count("isSkew=true"),
    }


def main() -> None:
    spark = get_spark("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    materialize(spark)
    dim_bytes = sum(
        f.stat().st_size
        for f in os.scandir(f"{WORK}/dim.parquet")
        if f.is_file()
    )
    report = {str(p): run(spark, p) for p in SKEWS}
    print(
        json.dumps(
            {
                "metric": "skew_probe",
                "n_fact": N_FACT,
                "n_users": N_USERS,
                "n_salts": N_SALTS,
                "dim_parquet_mb": round(dim_bytes / 1e6, 1),
                "config": "shipped defaults (AQE on, 32 shuffle partitions)",
                "plan_facts_p0.5": plan_facts(spark),
                "skews": report,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
