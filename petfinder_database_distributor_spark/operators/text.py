"""Text-analysis operators for LLM-data pipelines (north star layer,
BASELINE.json): tokenization, quality scoring, language-ID heuristic,
fingerprinting. All native Column expressions — codegen'd, no Python UDFs,
narrow (no shuffle) so they pipeline inside the scan at any scale.

Portable-hash discipline: ``md5int`` (first 15 hex digits of md5 → int64)
is computable identically in Spark (``conv(substr(md5(x),1,15),16,10)``)
and DuckDB (``('0x'||substr(md5(x),1,15))::BIGINT``), which lets every
hash-based operator (minhash, simhash, fingerprints) be oracle-checked
value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small multilingual stopword profiles for the n-gram/stopword language-ID
# heuristic. Deterministic and engine-portable (plain substring counts).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "zh": ("的", "是", "了"),
}

MERSENNE_P = 2147483647  # 2^31 - 1, modulus for the minhash family


def portable_lower(c: Column) -> Column:
    """``lower()`` that agrees across engines on multilingual text.

    The JVM implements full Unicode SpecialCasing — lower('İ') is
    'i'+U+0307 and a capital Σ takes the context-dependent final-sigma
    form — while DuckDB applies the simple per-codepoint map ('i', 'σ').
    Pre-substituting exactly those two divergent classes to their simple
    lowercase BEFORE lower() makes both engines produce identical bytes;
    every other lowercase mapping already agrees (probed: ß/ẞ, Ĳ,
    ligatures, Ⱥ). The oracle fragments apply the same substitution."""
    return F.lower(F.translate(c, "İΣ", "iσ"))


def tokens(c: Column) -> Column:
    """Whitespace tokenization (lowercased, empties dropped).

    NULL text ≡ empty document (→ ``[]``), matching the oracle fragment's
    ``coalesce(text, '')``. Without the coalesce, NULL propagates into a
    NULL array — and the engines then DISAGREE downstream (e.g. Spark's
    ``concat_ws`` treats a NULL array as '' while DuckDB's
    ``array_to_string`` yields NULL → md5(NULL) = NULL), which the
    null-robustness sweep caught across the text family. Lowercasing is
    :func:`portable_lower` (cross-engine Unicode casing contract)."""
    return F.filter(
        F.split(portable_lower(F.trim(F.coalesce(c, F.lit("")))), r"\s+"),
        lambda x: x != "",
    )


def distinct_tokens(c: Column) -> Column:
    return F.array_distinct(tokens(c))


def token_count(c: Column) -> Column:
    return F.size(tokens(c))


def bpe_ish_token_count(c: Column) -> Column:
    """Sub-word-ish token count: word chunks of ≤4 chars — a cheap, portable
    proxy for BPE token counting (ceil(len/4) summed over words)."""
    return F.aggregate(
        tokens(c), F.lit(0), lambda acc, w: acc + F.ceil(F.length(w) / 4).cast("int")
    )


def md5int(c: Column) -> Column:
    """Portable 60-bit integer hash (see module docstring)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


# The DuckDB-side twin of md5int() — oracle SQL templates substitute {x}.
# Keep the recipe (md5, 15 hex chars = 60 bits) in lockstep with md5int
# above; every oracle module imports THIS constant rather than restating it.
MD5INT_SQL = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


def punct_ratio(c: Column) -> Column:
    """Fraction of characters that are punctuation."""
    stripped = F.regexp_replace(c, r"[.,!?;:'\"()\[\]{}-]", "")
    return F.when(F.length(c) > 0, (F.length(c) - F.length(stripped)) / F.length(c)).otherwise(
        F.lit(0.0)
    )


DEFAULT_STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "is")


def stopword_ratio_from_tokens(
    toks: Column, stopwords: tuple[str, ...] = DEFAULT_STOPWORDS
) -> Column:
    sw = F.filter(toks, lambda t: t.isin(*stopwords))
    return F.when(F.size(toks) > 0, F.size(sw) / F.size(toks)).otherwise(F.lit(0.0))


def stopword_ratio(c: Column, stopwords: tuple[str, ...] = DEFAULT_STOPWORDS) -> Column:
    return stopword_ratio_from_tokens(tokens(c), stopwords)


def mean_word_length_from_tokens(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def mean_word_length(c: Column) -> Column:
    return mean_word_length_from_tokens(tokens(c))


def quality_score_from_tokens(
    c: Column, toks: Column, punct: Column | None = None
) -> Column:
    """Composite document-quality heuristic in [0,1]: rewards mid-length
    docs, low punctuation density, presence of stopwords (fluent text), and
    plausible word lengths — the standard cheap pre-filter before expensive
    LLM-pipeline stages. Takes the token array (and optionally a
    precomputed punct ratio) separately so plans can materialize the
    expensive subexpressions once (interpreted HOFs get no CSE)."""
    n = F.size(toks)
    length_score = F.least(n / F.lit(50.0), F.lit(1.0))
    punct_score = 1 - F.least((punct_ratio(c) if punct is None else punct) * 5, F.lit(1.0))
    sw_score = F.least(stopword_ratio_from_tokens(toks) * 4, F.lit(1.0))
    mwl = mean_word_length_from_tokens(toks)
    wl_score = F.when((mwl >= 3) & (mwl <= 8), F.lit(1.0)).otherwise(F.lit(0.5))
    return (length_score + punct_score + sw_score + wl_score) / 4


def quality_score(c: Column) -> Column:
    return quality_score_from_tokens(c, tokens(c))


def lang_id_from_tokens(toks: Column) -> Column:
    """Stopword-profile language ID over a (pre-materialized) token array:
    picks the language whose profile words occur most often as tokens; ties
    broken by language code order; 'und' when nothing matches.

    Argmax is ONE ``array_max`` over (score, rank) structs — a when-chain
    formulation duplicates every interpreted-HOF score expression 2^k times
    (no CSE outside codegen), which made this operator dominate the bench.
    Rank is descending in code order so struct-max tie-break picks the
    earliest language code, matching the oracle's CASE order."""
    profiles = sorted(LANG_PROFILES.items())
    n = len(profiles)

    def counter(words: tuple[str, ...]) -> Column:
        # single-parameter lambda: a 2-arg form would bind (element, index)
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    winner = F.array_max(
        F.array(
            *[
                F.struct(
                    counter(words).alias("s"), F.lit(n - i).alias("r")
                )
                for i, (_, words) in enumerate(profiles)
            ]
        )
    )
    pick = F.lit("und")
    for i, (lang, _) in enumerate(profiles):
        pick = F.when(winner["r"] == n - i, F.lit(lang)).otherwise(pick)
    return F.when(winner["s"] == 0, F.lit("und")).otherwise(pick)


def lang_id(c: Column) -> Column:
    """Single-column convenience form of :func:`lang_id_from_tokens`.

    Prefer the two-stage form in plans (materialize ``tokens(c)`` in its own
    projection, referenced >1 time so CollapseProject keeps it) — inline,
    the tokenization is re-evaluated once per language profile."""
    return lang_id_from_tokens(tokens(c))


def bag_of_words_fingerprint(c: Column) -> Column:
    """Content fingerprint invariant to word order & repetition: md5 of the
    sorted distinct token list. The cheap exact-dedup key for text."""
    return F.md5(F.concat_ws(" ", F.array_sort(distinct_tokens(c))))


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles.

    Built as n-1 shifted ``zip_with`` passes (``shingle[i] = toks[i] + ' '
    + toks[i+1] + ...``): each pass is one sequential array traversal.
    ``concat`` null-propagates where the shifted slice runs out, and the
    trailing partial shingles are filtered as nulls. ~5× faster than the
    per-index ``transform``+``element_at`` formulation, whose interpreted
    higher-order-function evaluation dominated the dedup family's runtime."""
    out = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0)))
        out = F.zip_with(out, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(F.filter(out, lambda x: x.isNotNull()))
