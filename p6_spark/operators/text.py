"""Text-analysis operators for training-data pipelines: tokenization,
quality scoring, language-ID heuristic, document fingerprinting.

All pure Column expressions (JVM-side, codegen'd): at 100 TB these run
embarrassingly parallel over the scan with zero shuffles and zero Python.
Hash primitives are md5-based so any engine (and the DuckDB oracle)
reproduces them bit-for-bit — no reliance on engine-private hash().
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FINGERPRINT_MOD = 1_000_000_007

# deliberately small demo stopword lists (mechanism, not linguistics)
STOPWORDS = {
    "en": ("the", "a", "value", "table", "row"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "la", "los", "que"),
    "zh": ("de", "shi", "bu"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization, empty tokens removed."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


# GPT-2-style pretokenizer, restricted to constructs Java regex and RE2
# interpret identically (letter runs, digit runs, symbol runs, each with
# an optional leading space) so the count is engine-portable.
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+"


def bpe_ish_tokens(col: Column) -> Column:
    """BPE-pretokenizer-style segmentation — the token-count proxy an
    LLM data pipeline uses when the real tokenizer is too expensive for
    a profiling pass. Pure regexp: stays in codegen."""
    return F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(col: Column) -> Column:
    return F.size(bpe_ish_tokens(col))


def md5_int(col: Column) -> Column:
    """First 8 hex digits of md5 as a bigint — the engine-portable hash
    primitive used by minhash/simhash/fingerprints (DuckDB:
    ('0x' || substr(md5(x),1,8))::bigint)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def quality_columns(text: Column) -> dict[str, Column]:
    """Quality heuristics: length, token stats, punctuation/digit ratios,
    stopword ratio — the standard cheap filters before expensive dedup."""
    toks = tokens(text)
    n_tok = F.size(toks)
    n_char = F.length(text)
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()-]", ""))
    n_digit = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return {
        "n_chars": n_char.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "avg_token_len": F.when(n_tok > 0, F.round((n_char - (n_tok - 1)) / n_tok, 4)).otherwise(
            F.lit(0.0)
        ),
        "punct_ratio": F.round(n_punct / F.greatest(n_char, F.lit(1)), 6),
        "digit_ratio": F.round(n_digit / F.greatest(n_char, F.lit(1)), 6),
        "stopword_ratio": F.round(n_stop / F.greatest(n_tok, F.lit(1)), 6),
    }


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts over the distinct token set."""
    toks = F.array_distinct(F.transform(tokens(text), F.lower))
    out = {}
    for lang, words in STOPWORDS.items():
        lst = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.array_intersect(toks, lst))
    return out


def lang_id(text: Column) -> Column:
    """Argmax language by stopword hits, fixed priority order on ties
    (en > de > fr > es > zh) — deterministic, oracle-reproducible."""
    s = lang_scores(text)
    order = ["en", "de", "fr", "es", "zh"]
    expr = F.lit("unknown")
    # build reversed CASE: earlier langs win ties via >= later ones
    for lang in reversed(order):
        later = [o for o in order if order.index(o) > order.index(lang)]
        cond = s[lang] > 0
        for o in later:
            cond = cond & (s[lang] >= s[o])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column) -> Column:
    """Order-sensitive rolling document fingerprint: left fold of
    (acc * 31 + md5_int(token)) mod p over the token sequence
    (polynomial rolling hash). Integer arithmetic — bit-exact everywhere."""
    hashes = F.transform(tokens(text), lambda t: md5_int(t))
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % FINGERPRINT_MOD,
    )
