"""End-to-end training-data preparation pipeline, composed from the
engine's own operators — the workflow a user runs to turn a raw document
corpus into packed LLM pre-training contexts:

  raw documents
    → exact dedup          (keep min doc_id per content hash)
    → near-dup resolution  (MinHash+LSH clusters; keep one doc per cluster)
    → quality filter       (token-count floor — the cheap first gate)
    → decontamination      (drop train docs sharing a verbatim 49+-char
                            run with the held-out test split)
    → train split          (stable md5-bucket 80/10/10 assignment)
    → cleaned corpus       (written back as a documents table)
    → pack_sequences       (two-phase prefix-sum context packing)
    → corpus_budget_report (what's left, per language)
    → train_shard_manifest (deterministic md5-mod-N export shards)
    → vocab_coverage_report (top-K vocabulary coverage curve)

Composition pattern: every stage is declarative DataFrame algebra; the
cleaned corpus is written as `<out>/documents.parquet`, which makes the
ENTIRE declared operator surface (pack_sequences, corpus_budget_report,
token_counts, ...) immediately re-runnable against the cleaned data — the
operators are corpus-directory-generic, not fixture-bound.

At 100 TB every stage keeps the scale shapes the operator docstrings
argue: content-hash dedup is one shuffle; near-dup clusters come from the
banded-LSH candidate engine (never all-pairs); the split is a scan-local
projection; packing is a two-phase prefix sum with no global sort.

Run:  python examples/pipeline_demo.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from nano_vectordb_rs_spark.session import get_spark  # noqa: E402
from nano_vectordb_rs_spark.sources.tables import load_table  # noqa: E402
from nano_vectordb_rs_spark.operators import dedup, pipeline, textops  # noqa: E402

MIN_TOKENS = 5  # quality floor: drop fragments


def main(spark=None, sf_dir: str = "/root/testdata/sf0.001", out_dir: str | None = None) -> dict:
    spark = spark or get_spark("pipeline-demo")
    out_dir = out_dir or tempfile.mkdtemp(prefix="nvdb_pipeline_")

    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. exact dedup — keep the canonical (min) doc_id per distinct text
    keep_exact = docs.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    docs = docs.join(F.broadcast(keep_exact.select("doc_id")), "doc_id", "left_semi")

    # 2. near-dup resolution — connected components over MinHash+LSH pairs;
    #    each cluster keeps exactly its canonical doc (cluster_id == min id),
    #    so transitive near-dup chains collapse to one survivor
    clusters = dedup.dup_clusters(spark, sf_dir)
    drop_near = (
        clusters.select(
            F.explode(F.split("members", "\\|")).alias("doc_id"), "cluster_id"
        )
        .filter(F.col("doc_id").cast("long") != F.col("cluster_id"))
        .select(F.col("doc_id").cast("long").alias("doc_id"))
    )
    docs = docs.join(F.broadcast(drop_near), "doc_id", "left_anti")

    # 3. quality floor — cheapest gate last-before-split: token count
    docs = docs.filter(F.size(F.split("text", " ")) >= MIN_TOKENS)

    # 3b. benchmark decontamination — drop every train doc flagged by the
    #     exact-substring check (verbatim 49+-char run shared with the
    #     held-out test split); the shingle-overlap variant
    #     (dedup.contamination_check) composes the same way
    contaminated = dedup.exact_substring_contamination(spark, sf_dir).select(
        F.col("train_doc").alias("doc_id")
    )
    docs = docs.join(F.broadcast(contaminated), "doc_id", "left_anti")

    # 4. stable split assignment (same md5-bucket rule as
    #    docs_split_assignment) — keep the train shard
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    train = docs.filter(bucket < textops.SPLIT_TRAIN_PCT)

    # 5. materialize the cleaned corpus as a documents table — every
    #    declared operator now runs against it unchanged
    train.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    # 6-9. downstream, straight from the declared surface: context packing,
    #    per-language budget, the shard-export manifest a trainer consumes,
    #    and the tokenizer vocab-coverage curve — all corpus-dir-generic
    packed = pipeline.pack_sequences(spark, out_dir)
    budget = textops.corpus_budget_report(spark, out_dir)
    shards = pipeline.train_shard_manifest(spark, out_dir)
    coverage = pipeline.vocab_coverage_report(spark, out_dir)

    n_train = spark.read.parquet(f"{out_dir}/documents.parquet").count()
    n_contexts = packed.count()
    report = {
        "n_raw": n_raw,
        "n_train_clean": n_train,
        "n_contexts": n_contexts,
        "budget_rows": budget.collect(),
        "n_shards": shards.count(),
        "coverage_rows": coverage.collect(),
        "out_dir": out_dir,
    }
    print(
        f"pipeline: {n_raw} raw docs -> {n_train} clean train docs -> "
        f"{n_contexts} packed contexts ({out_dir})"
    )
    return report


if __name__ == "__main__":
    main(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
