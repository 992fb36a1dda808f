"""Text scalar building blocks, emitted for both dialects.

Portability rules that make text operators hash-match across Spark and the
DuckDB oracle:
- hashing is ``md5`` of UTF-8 strings — identical lowercase hex in both
  engines (Spark's murmur ``hash()`` and DuckDB's ``hash()`` differ, so they
  are never used for oracle-checked results);
- "min-hash" minimums are taken over md5 hex *strings* — lexicographic order
  on fixed-width lowercase hex equals numeric order, so no int conversion is
  needed;
- occurrence counts use the length-difference-after-replace trick
  (``(len(t) - len(replace(t, m, ''))) / len(m)``) — pure integer arithmetic
  available in both engines;
- token splitting is on a single space (the fixture corpus is
  space-separated lowercase words).
"""

from __future__ import annotations

# Stopword set used for quality scoring / language signals (the fixture
# vocabulary is synthetic English-ish; see FIXTURES.md).
STOPWORDS = ("the", "a")

# Marker n-grams for the language-ID heuristic: (lang, marker substrings).
# A real pipeline would use character-trigram profiles per language; the
# fixture text shares one vocabulary across langs, so this heuristic is an
# honest (deterministic) classifier with honest (poor) accuracy — the
# operator contract is the pipeline shape, not fixture-specific accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("sch", "der", "ein"),
    "en": ("the", "ing", "tion"),
    "es": ("cion", "los", "ado"),
    "fr": ("les", "eau", "oux"),
    "zh": ("zh", "xi", "qu"),
}


def occurrences(text_expr: str, marker: str) -> str:
    """Occurrence count of ``marker`` in ``text_expr`` — portable SQL."""
    m = marker.replace("'", "''")
    return (
        f"CAST((length({text_expr}) - length(replace({text_expr}, '{m}', ''))) "
        f"/ {len(marker)} AS BIGINT)"
    )


def lang_score(text_expr: str, lang: str) -> str:
    terms = [occurrences(text_expr, m) for m in LANG_MARKERS[lang]]
    return "(" + " + ".join(terms) + ")"


def predicted_lang_case() -> str:
    """Argmax over per-language score COLUMNS (named ``score_<lang>``,
    computed in an inner projection) with deterministic lexicographic
    tie-break: the lexicographically-first language wins ties."""
    langs = sorted(LANG_MARKERS)
    branches = []
    for lang in langs:
        conds = []
        for o in langs:
            if o == lang:
                continue
            op = ">" if o < lang else ">="  # beat earlier langs strictly
            conds.append(f"score_{lang} {op} score_{o}")
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(branches) + f" ELSE '{langs[0]}' END"
