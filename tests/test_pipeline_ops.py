"""Invariant tests for the pipeline-prep operators (operators/pipeline.py),
independent of the DuckDB value oracles in test_oracle_parity.py: these pin
the *semantics* (conservation laws, error bounds, ordering contracts) that a
hash equality can't explain on its own.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from nano_vectordb_rs_spark.operators.pipeline import (
    CTX_TOKENS,
    SAMPLE_DEFAULT,
    SAMPLE_RATES,
    bigram_stats,
    embedding_quantize_stats,
    pack_sequences,
    stratified_sample_docs,
)
from nano_vectordb_rs_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_pack_conserves_tokens_and_fills_chunks(spark):
    chunks = pack_sequences(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    total_tokens = docs.select(F.sum(F.size(F.split("text", " ")))).first()[0]

    # conservation: every token lands in exactly one chunk
    assert sum(r["n_tokens"] for r in chunks) == total_tokens
    # chunk ids are dense 0..n-1 (concat-and-chunk leaves no holes)
    assert [r["chunk_id"] for r in chunks] == list(range(len(chunks)))
    # every chunk except the last is exactly full
    for r in chunks[:-1]:
        assert r["n_tokens"] == CTX_TOKENS, r
    assert 0 < chunks[-1]["n_tokens"] <= CTX_TOKENS
    # a chunk has at most one straddler (the doc cut by its left boundary)
    # and chunk 0 has none
    assert chunks[0]["n_straddlers"] == 0
    for r in chunks[1:]:
        assert r["n_straddlers"] in (0, 1), r
        assert r["n_straddlers"] <= r["n_docs"]


def test_stratified_sample_rates_within_binomial_slack(spark):
    rows = {r["lang"]: r for r in stratified_sample_docs(spark, SF_DIR).collect()}
    assert set(rows) == set(SAMPLE_RATES)  # fixture has exactly these langs
    for lang, r in rows.items():
        target = SAMPLE_RATES.get(lang, SAMPLE_DEFAULT) / 1000
        n = r["n_total"]
        # md5 buckets are uniform; 4 sigma of binomial slack
        slack = 4 * (target * (1 - target) / n) ** 0.5
        assert abs(r["realized_rate"] - target) <= slack + 1 / n, (lang, r, target)
        assert 0 < r["n_kept"] < n


def test_quantize_error_bounded_by_half_step(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    # per-vector bound: |err| <= 0.5/scale = max|x|/254; global bound uses
    # the corpus-wide max component
    gmax = emb.select(
        F.max(F.expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"))
    ).first()[0]
    stats = embedding_quantize_stats(spark, SF_DIR).collect()
    assert len(stats) == 10
    bound = gmax / 254 + 1e-12
    for r in stats:
        assert 0 < r["max_abs_err"] <= bound, (r, bound)
        assert 0 < r["avg_mse"] <= bound**2, r


def test_bigram_ranks_are_contract_ordered(spark):
    rows = bigram_stats(spark, SF_DIR).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert len(by_lang) == 5
    for lang, rs in by_lang.items():
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert a["n_occurrences"] > b["n_occurrences"] or (
                a["n_occurrences"] == b["n_occurrences"] and a["bigram"] < b["bigram"]
            ), (lang, a, b)
        for r in rs:
            assert 0 < r["n_docs"] <= r["n_occurrences"]
            assert " " in r["bigram"]


def test_mixture_temperature_weights_invariants(spark):
    """Temperature sampling at T=2: shares are a distribution, and the
    boost is monotone-inverse in corpus share (sqrt flattens — rare
    languages get boost > 1, dominant ones < 1 relative to each other)."""
    from nano_vectordb_rs_spark.operators.textops import (
        mixture_temperature_weights,
    )

    rows = mixture_temperature_weights(spark, SF_DIR).collect()
    assert len(rows) >= 2
    assert abs(sum(r.sample_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.tokens_per_million for r in rows) - 1_000_000) <= len(rows)
    by_share = sorted(rows, key=lambda r: r.corpus_share)
    boosts = [r.boost for r in by_share]
    assert boosts == sorted(boosts, reverse=True)  # rarer ⇒ bigger boost
    for r in rows:
        assert r.sample_share > 0


def test_tokenizer_fertility_consistent_with_token_counts(spark):
    """Fertility's corpus-wide subword total must equal token_counts' (same
    regex, different grouping) and every ratio must be positive."""
    from nano_vectordb_rs_spark.operators.textops import (
        token_counts,
        tokenizer_fertility,
    )

    fert = tokenizer_fertility(spark, SF_DIR).collect()
    by_source = token_counts(spark, SF_DIR).collect()
    assert sum(r.n_subwords for r in fert) == sum(r.n_subwords for r in by_source)
    for r in fert:
        assert r.chars_per_subword > 0
        assert r.fertility >= 1.0  # a word is ≥ 1 subword chunk


def test_dedup_pair_recall_bounds(spark):
    """The sampled audit must be non-degenerate on the fixture (true pairs
    exist in the block) and internally consistent: hits bounded by both
    sides, ratios in [0, 1]."""
    from nano_vectordb_rs_spark.operators.dedup import dedup_pair_recall

    [r] = dedup_pair_recall(spark, SF_DIR).collect()
    assert r.n_exact > 0, "fixture block lost its true near-dup pairs"
    assert r.n_hits <= min(r.n_exact, r.n_candidates)
    assert 0.0 <= r.recall <= 1.0
    assert 0.0 <= r.efficiency <= 1.0


def test_dedup_funnel_stages_chain(spark):
    """Funnel consistency: stage N's n_out is stage N+1's n_in, removals
    are non-negative, and the sequential totals agree with the standalone
    exact-dedup query's removable count."""
    from nano_vectordb_rs_spark.operators.dedup import (
        dedup_funnel_report,
        exact_dedup_docs,
    )

    rows = {r.stage: r for r in dedup_funnel_report(spark, SF_DIR).collect()}
    assert set(rows) == {"1_exact", "2_normalized", "3_neardup"}
    assert rows["1_exact"].n_out == rows["2_normalized"].n_in
    assert rows["2_normalized"].n_out == rows["3_neardup"].n_in
    for r in rows.values():
        assert r.n_removed >= 0 and r.n_in - r.n_removed == r.n_out
    exact_removable = sum(
        r.n_dropped for r in exact_dedup_docs(spark, SF_DIR).collect()
    )
    assert rows["1_exact"].n_removed == exact_removable
