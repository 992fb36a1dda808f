"""Python UDTF surface (PySpark 4): a table function for shingle expansion.

SURVEY.md §2.3 notes the reference's only UDF hook is a row-predicate
closure (src/lib.rs:112) and that our surface covers UDF (Column exprs +
pandas_udf), UDAF (applyInPandas, similarity.label_centroids) and UDTF.
This module is the UDTF instance: one input row → N shingle rows.

The PRODUCTION path for shingling is the built-in explode/transform
expression in operators/dedup.py (JVM-side, codegen'd); this UDTF exists
for the API surface and for predicates a SQL lambda can't express. A test
pins its output to the built-in path so the two can never drift.

Usage:
    spark.udtf.register("shingles", ShinglesUDTF)
    spark.sql("SELECT s.* FROM documents, LATERAL shingles(doc_id, text, 3) s")
"""

from __future__ import annotations

try:
    from pyspark.sql.functions import udtf
except ImportError:  # pragma: no cover - pre-4.0 fallback marker
    udtf = None


if udtf is not None:

    @udtf(returnType="doc_id bigint, pos int, shingle string")
    class ShinglesUDTF:
        """word-n-gram shingles of a text column, with position."""

        def eval(self, doc_id: int, text: str, n: int = 3):
            if text is None:
                return
            words = text.split(" ")
            for i in range(len(words) - n + 1):
                yield doc_id, i, " ".join(words[i : i + n])

else:  # pragma: no cover
    ShinglesUDTF = None
