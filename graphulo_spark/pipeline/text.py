"""Text analysis: token counting, quality scoring, language ID, fingerprinting.

Everything is JVM-side column expressions (regex + list ops) — the hot path
never enters Python. Heuristics are deliberately simple and *portable* so the
DuckDB oracle can run the identical logic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WS = r"\s+"

# tiny stopword profiles for the language-ID heuristic
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "que"],
    "es": ["el", "la", "los", "que", "es", "una", "para", "del"],
}


def token_count(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """[id, n_tokens]: whitespace tokenization (BPE-ish regex variant:
    ``token_count_bpeish``)."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.trim(F.col(text_col)), WS)).alias("n_tokens"),
    )


# GPT-2-style pre-tokenizer split, minus its trailing-whitespace lookahead so
# the SAME pattern runs under Java regex (Spark) and RE2 (DuckDB oracle):
# letter runs | digit runs | one non-alnum mark per match.
BPEISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_bpeish(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """[id, n_pieces]: BPE-style pre-tokenization count — what a training
    budgeter uses when whitespace counts are too coarse ("don't" = 3 pieces,
    "2026-08" = 3). Counts pre-tokens, not merges: a vocab-free upper bound
    on BPE pieces; the true merged count is one broadcast vocab join away
    and does not change the plan shape (still a single JVM regex pass per
    row, no Python)."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.regexp_count(F.col(text_col), F.lit(BPEISH)).alias("n_pieces"),
    )


def _punct_count(c: Column) -> Column:
    return F.length(F.regexp_replace(c, r"[^\.\,\;\:\!\?]", ""))


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """[id, n_chars, n_tokens, punct_ratio, stopword_ratio, mean_token_len, quality]
    — length/punctuation/stopword heuristics a pretraining filter would use."""
    text = F.col(text_col)
    toks = F.split(F.trim(text), WS)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    stop = set(LANG_PROFILES["en"])
    stop_hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*stop)))
    punct_ratio = _punct_count(text) / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1))
    mean_tok = n_chars / F.greatest(n_tokens, F.lit(1))
    quality = (
        F.when(n_tokens < 5, 0.0)
        .when(mean_tok > 12, 0.2)
        .otherwise(
            F.least(F.lit(1.0), F.lit(0.4) + stop_ratio * 2 + F.least(punct_ratio * 5, F.lit(0.2)))
        )
    )
    return docs.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(mean_tok, 6).alias("mean_token_len"),
        F.round(quality, 6).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """[id, lang_pred, lang_score]: argmax of per-language stopword hit counts
    (n-gram-free heuristic; ties → 'und' unknown)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), WS)
    scores = []
    for lang, words in LANG_PROFILES.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    arr = F.array(*scores)
    best = F.array_max(arr)
    total = F.aggregate(arr, F.lit(0), lambda acc, s: acc + s["hits"])
    pred = F.when(best["hits"] == 0, F.lit("und")).otherwise(best["lang"])
    score = F.when(total == 0, 0.0).otherwise(best["hits"] / total)
    return docs.select(
        F.col(id_col).alias("id"),
        pred.alias("lang_pred"),
        F.round(score, 6).alias("lang_score"),
    )


def doc_fingerprint(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", n: int = 5, k: int = 4
) -> DataFrame:
    """[id, fingerprint]: winnowing-lite — the k smallest md5 hashes of word
    n-gram shingles, concatenated. Robust to small edits; portable SQL."""
    toks = F.split(F.trim(F.col(text_col)), WS)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    hashes = F.transform(idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))))
    fp = F.concat_ws("|", F.slice(F.array_sort(hashes), 1, k))
    return docs.select(F.col(id_col).alias("id"), fp.alias("fingerprint"))
