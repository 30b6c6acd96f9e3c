"""Text-analysis column expressions (training-data pipeline operators).

All of these are pure ``pyspark.sql.functions`` column builders — JVM-side,
whole-stage-codegen, no UDFs — and each has a line-for-line ANSI-SQL
equivalent used by the DuckDB oracle (``__spark_entry__.oracle_sql``):
occurrence counts via the length/replace trick, token counts via regex
split, fingerprints via md5 prefix → bigint.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny language-marker lexicons (public stopword staples)
LANG_MARKERS = {
    "en": (" the ", " and ", " of "),
    "de": (" der ", " und ", " die "),
    "es": (" el ", " los ", " las "),
    "fr": (" le ", " les ", " des "),
    "nl": (" de ", " het ", " een "),
}


def occurrence_count(text: Column, token: str) -> Column:
    """# of occurrences of ``token`` via (len - len(replace))/len(token)."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(token), F.lit("")))
    ) / F.lit(len(token))


def token_count(text: Column) -> Column:
    """Whitespace token count (regex split — BPE-ish splitting would swap
    the pattern here)."""
    return F.size(F.split(F.trim(text), r"\s+"))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_ratio(text: Column) -> Column:
    """Fraction of punctuation characters."""
    return (
        F.length(text) - F.length(F.regexp_replace(text, r"[.,;:!?'\"()-]", ""))
    ) / F.length(text)


def mean_token_len(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"\s+", "")) / token_count(text)


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-count score per language; langid = argmax."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return {
        lang: sum(
            (occurrence_count(padded, m) for m in markers), F.lit(0.0)
        ).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Heuristic language id: language with the highest marker count
    ('und' when nothing matches). Deterministic tie-break by lang order."""
    scores = lang_scores(text)
    best = F.lit("und")
    best_score = F.lit(0.0)
    for lang in sorted(LANG_MARKERS):
        s = scores[lang]
        better = s > best_score
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_score = F.when(better, s).otherwise(best_score)
    return best


def quality_score(text: Column) -> Column:
    """Document quality heuristic in [0,1]: length band + punctuation
    sanity + mean token length band (C4-style filters, re-expressed as one
    arithmetic expression)."""
    n = F.length(text)
    length_ok = F.when((n >= 100) & (n <= 20000), 1.0).otherwise(0.5)
    punct = punct_ratio(text)
    punct_ok = F.when(punct <= 0.2, 1.0).otherwise(0.5)
    mtl = mean_token_len(text)
    mtl_ok = F.when((mtl >= 2.0) & (mtl <= 12.0), 1.0).otherwise(0.5)
    return (length_ok + punct_ok + mtl_ok) / F.lit(3.0)


def fingerprint64(text: Column) -> Column:
    """Deterministic 60-bit document fingerprint: md5 prefix → bigint
    (portable to any SQL engine; the rolling-hash variant lives in
    operators/dedup.py as a kernel)."""
    return F.conv(F.substring(F.md5(text), 1, 15), 16, 10).cast("long")
