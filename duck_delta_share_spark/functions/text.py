"""Text-analysis column functions for the LLM-data-pipeline surface
(SURVEY.md §2C): tokenization, shingling, quality scoring, language-ID
heuristics, fingerprinting. All pure Catalyst expressions (no UDFs) so
they vectorize inside codegen and scale linearly with the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny multilingual stopword marker sets for the n-gram/stopword language-ID
# heuristic. Deliberately deterministic + expressible in ANSI SQL so the
# DuckDB oracle can mirror the logic.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "es": ("el", "los", "que"),
    "fr": ("le", "les", "des"),
}


def tokenize(text: Column | str) -> Column:
    """Whitespace tokenization → array<string>."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-ish regex tokenization: words, numbers, or single punctuation —
    a rough proxy for subword token counting without a tokenizer library."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), 0)


def token_count(text: Column | str) -> Column:
    return F.size(tokenize(text))


def distinct_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokenize(text)))


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """n-gram word shingles as strings; empty array when fewer than n
    tokens. Used by MinHash / Jaccard dedup.

    Construction: n shifted O(len) slices folded pairwise with
    ``zip_with``/``concat_ws`` — NOT a slice per position. Higher-order
    functions are interpreted (no codegen), so the old
    ``transform(sequence(1, len-n+1), i -> slice(tokens, i, n))`` paid
    one interpreted slice call per START position (O(len·n) dispatches);
    the zip_with chain pays n-1 array traversals total — measured 4.3×
    faster on the sf0.1 bigram pipeline with bit-identical output
    (concat_ws skips NULLs identically in both shapes)."""
    m = F.size(tokens) - (n - 1)  # number of shingle starts
    acc = F.slice(tokens, 1, m)
    for j in range(2, n + 1):
        acc = F.zip_with(
            acc,
            F.slice(tokens, j, m),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(F.size(tokens) >= n, acc).otherwise(
        F.array().cast("array<string>")
    )


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the whitespace-normalized,
    lower-cased text. (A content-defined rolling hash would go here for
    fuzzy chunk fingerprints; md5-of-normalized is the exact-dup key.)"""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.trim(F.lower(c)), " +", " "))


def rolling_fingerprints(text: Column | str, k: int = 8) -> Column:
    """Rolling document fingerprints: the md5 of every character ``k``-gram
    (Rabin-Karp-style sliding window, hash swapped for md5 so the DuckDB
    oracle can mirror it exactly). Returns array<string>; callers reduce it
    (min = winnowing-style representative, distinct count = content
    richness). Pure Catalyst `transform` over `sequence` — no UDF, vectorizes
    in codegen, and the per-row cost is O(len) independent of partitioning.
    """
    c = F.col(text) if isinstance(text, str) else text
    starts = F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1)))
    return F.transform(starts, lambda i: F.md5(F.substring(c, i, k)))


def quality_score(text: Column | str) -> Column:
    """Heuristic quality score in [0,1]: mix of distinct-token ratio and a
    length sweet-spot. Single-division/multiply double ops → deterministic
    and mirrorable in the oracle SQL."""
    toks = tokenize(text)
    n = F.size(toks).cast("double")
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n
    length_factor = F.least(n / F.lit(50.0), F.lit(1.0))
    return F.round(distinct_ratio * F.lit(0.7) + length_factor * F.lit(0.3), 6)


def language_id(text: Column | str) -> Column:
    """Stopword-marker language-ID heuristic: first language whose marker
    words appear in the text; 'und' (undetermined) otherwise."""
    c = F.col(text) if isinstance(text, str) else text
    padded = F.concat(F.lit(" "), c, F.lit(" "))
    expr: Column = F.lit("und")
    # Build the CASE chain in reverse so 'en' is checked first.
    for lang, markers in reversed(list(_LANG_MARKERS.items())):
        cond = None
        for m in markers:
            hit = padded.contains(f" {m} ")
            cond = hit if cond is None else (cond | hit)
        expr = F.when(cond, lang).otherwise(expr)
    return expr


# ---------------------------------------------------------------------------
# PII redaction (training-data hygiene)
# ---------------------------------------------------------------------------

# Ordered (pattern, replacement) pairs in the COMMON regex subset of Java
# (Spark) and RE2 (DuckDB): no lookaround, no backreferences — so the
# DuckDB oracle can apply the byte-identical patterns. Order matters:
# emails first (their local parts contain digits/dots), IPs before
# phone-ish digit runs, SSN-shaped ids before phones.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    (r"\+?[0-9]{1,2}[ -]\(?[0-9]{3}\)?[ -][0-9]{3}[ -][0-9]{4}", "<PHONE>"),
)


def pii_redact(text: Column | str) -> Column:
    """Replace emails / IPv4s / SSN-shaped ids / phone-shaped numbers with
    typed placeholder tokens. Pure chained ``regexp_replace`` — codegen,
    no UDF, linear in the scan."""
    c = F.col(text) if isinstance(text, str) else text
    for pattern, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, repl)
    return c


def pii_counts(text: Column | str) -> list[Column]:
    """Per-category match counts (aliased n_email/n_ip/n_ssn/n_phone), each
    counted on the text with all EARLIER categories already redacted —
    identical to what :func:`pii_redact` removes, so counts and redaction
    can never disagree."""
    c = F.col(text) if isinstance(text, str) else text
    out = []
    for pattern, repl in PII_PATTERNS:
        name = "n_" + repl.strip("<>").lower()
        out.append(F.regexp_count(c, F.lit(pattern)).alias(name))
        c = F.regexp_replace(c, pattern, repl)
    return out


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality filters)
# ---------------------------------------------------------------------------


def bigrams(tokens: Column) -> Column:
    """Adjacent-token bigrams as strings (empty below 2 tokens)."""
    return word_shingles(tokens, 2)


def dup_token_fraction(text: Column | str) -> Column:
    """1 - distinct/total tokens: the crudest repetition signal."""
    return F.lit(1.0) - distinct_token_count(text) / token_count(text)


def char_entropy_signals(
    df: "DataFrame", text_col: str = "text", id_col: str = "doc_id"
) -> "DataFrame":
    """Character-distribution quality signals per document: Shannon
    entropy (nats) and the Simpson concentration index of the char
    histogram. Low entropy / high Simpson flags keyboard-mash, repeated
    padding, and template boilerplate that length heuristics miss.

    Determinism discipline: the entropy sum Σ k·ln(k) is accumulated as
    PER-TERM e6-scaled integers (exact long sums, order-independent across
    partitions), and Simpson's Σk² is pure integer math — only single
    correctly-rounded IEEE ops touch floats, so both signals sit under a
    DuckDB oracle hash. One explode + two hash aggregations; no text
    leaves executors.
    """
    chars = df.filter(F.length(text_col) > 0).select(
        F.col(id_col), F.explode(F.split(text_col, "")).alias("__ch")
    )
    counts = chars.groupBy(id_col, "__ch").agg(F.count(F.lit(1)).alias("__k"))
    kd = F.col("__k").cast("double")
    return counts.groupBy(id_col).agg(
        F.sum("__k").alias("n_chars"),
        F.count(F.lit(1)).alias("distinct_chars"),
        F.sum(
            F.floor(kd * F.log(kd) * F.lit(1e6) + F.lit(0.5)).cast("long")
        ).alias("__s_e6"),
        F.sum(F.col("__k") * F.col("__k")).alias("__s2"),
    ).select(
        id_col,
        "n_chars",
        "distinct_chars",
        F.floor(
            (
                F.log(F.col("n_chars").cast("double"))
                - (F.col("__s_e6").cast("double") / F.lit(1e6)) / F.col("n_chars")
            )
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("entropy_e6"),
        F.floor(
            F.col("__s2").cast("double")
            * F.lit(1e6)
            / (F.col("n_chars").cast("double") * F.col("n_chars"))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("simpson_e6"),
    )
