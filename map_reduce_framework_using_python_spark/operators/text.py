"""Text analysis operators: tokenization stats, quality features,
heuristic language-ID.

North-star extension. The reference's canonical job — word count through
streaming mapper/reducer (``Worker/worker_v1.py:109`` dev comment) — is
the ancestor of all of these; here they are pure JVM expression algebra
(split / higher-order array functions), zero Python per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and")

#: Tiny per-language stopword profiles for the n-gram/stopword-overlap
#: language-ID heuristic. (The synthetic corpus is an English word soup,
#: so the interesting property is determinism, not linguistic accuracy.)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "value", "table", "row"),
    "es": ("el", "la", "de", "y", "en", "que"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "de", "et", "est"),
    "zh": ("的", "是", "了", "在"),
    "it": ("il", "la", "di", "e", "che", "non"),
    "pt": ("o", "a", "de", "e", "que", "não"),
    "nl": ("de", "het", "een", "en", "van"),
    "ru": ("и", "в", "не", "на", "что"),
    "ja": ("の", "に", "は", "を", "た"),
    "ko": ("이", "의", "가", "은", "는"),
    "ar": ("في", "من", "على", "أن"),
    "hi": ("है", "के", "में", "की"),
    "tr": ("bir", "ve", "bu", "için"),
    "pl": ("i", "w", "nie", "na", "się"),
}


def tokens(text_col: str = "text"):
    """Bare single-space tokenizer — DELIBERATELY simpler than the
    DSIR/paragraph lane's ``split(trim(text), ' +')`` (+ empty-token
    filter): these quality/stat features are defined over the raw
    whitespace structure and their DuckDB oracles
    (``string_split(text, ' ')``) encode exactly this. Consequence,
    shared by both engines: runs of spaces or empty text yield
    empty-string tokens (n_tokens counts them). Do NOT "fix" one side
    without the other three oracle twins (ns_token_stats,
    ns_quality_scores, ns_language_id); for normalized token counts use
    the DSIR tokenizer."""
    return F.split(F.col(text_col), " ")


def word_bigrams(ws, sep: str = "\x01"):
    """Adjacent-word bigrams of a token-array column via the SAFE
    zip_with/slice idiom — the ONE copy (r7 review: three divergent
    constructions existed, and the sequence/element_at variant crashed
    on single-token documents because sequence(1, 0) descends).
    ``slice(ws, 1, n-1)`` zipped with ``slice(ws, 2, n-1)`` is empty
    for n ≤ 1, so token-poor docs yield no bigrams instead of an
    ANSI element_at error. Callers choose the separator their oracle
    encodes (DSIR/repetition use '\\x01'; rarity uses ' ')."""
    # greatest(n-1, 0): n=0 (an EMPTY token array, e.g. the DSIR
    # tokenizer on whitespace-only text) would pass slice a length of
    # -1 and throw — the n<=1 safety claim must cover n=0 (r7 review).
    m = F.greatest(F.size(ws) - 1, F.lit(0))
    return F.zip_with(
        F.slice(ws, F.lit(1), m),
        F.slice(ws, F.lit(2), m),
        lambda x, y: F.concat(x, F.lit(sep), y),
    )


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token counts (whitespace tokenizer)."""
    toks = tokens(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.length(text_col).alias("n_chars_measured"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: token count, mean token length,
    stopword ratio, distinct-token ratio."""
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace(F.col(text_col), " ", "")) / n_tokens, 4
        ).alias("avg_token_len"),
        F.round(n_stop / n_tokens, 4).alias("stopword_ratio"),
        F.round(F.size(F.array_distinct(toks)) / n_tokens, 4).alias("distinct_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-overlap language-ID: score = |tokens ∩ profile| per
    language; winner = (max score, then lexicographically last language —
    a deterministic tie-break via struct max)."""
    toks = F.array_distinct(tokens(text_col))
    scored = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
                ).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(LANG_PROFILES.items())
        ]
    )
    best = F.array_max(scored)
    return df.select(
        F.col(id_col),
        best["lang"].alias("predicted_lang"),
        best["score"].alias("best_score"),
    )


# ---------------------------------------------------------------- PII

#: Sequential redaction rules: (name, pattern, replacement). ORDER
#: MATTERS — each category is counted and replaced on the text as left
#: by the previous rules (an SSN must be consumed by the SSN rule, not
#: the broader phone rule), and the per-category counts reflect that
#: same sequence. Patterns stick to the regex subset with identical
#: semantics in Java (Spark) and RE2 (DuckDB): literal classes, bounded
#: quantifiers, ASCII \d and \b.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # optional country-code prefix (r7 review: the old mandatory prefix
    # let bare NANP numbers like 555-123-4567 through the compliance
    # pass); SSN's 3-2-4 shape is consumed by the prior rule, and
    # IPv4's dotted shape never matches the dashed groups.
    # \+?\b...: the match start is boundary-anchored (RE2-safe — no
    # lookbehind), so the suffix of a longer digit run can no longer be
    # consumed as a "phone" leaving stray digits behind (r7 review:
    # 'card 5555-123-4567' redacted to 'card 5<PHONE>'); the optional
    # '+' sits before the boundary so '+1 ...' still redacts whole.
    ("phone", r"\+?\b(?:\d{1,3}[ -])?\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub PII from ``text_col``: emails, SSNs, phone numbers, and
    IPv4 addresses are replaced by ``<EMAIL>``/``<SSN>``/``<PHONE>``/
    ``<IP>`` tokens, applied in :data:`PII_RULES` order. Adds one
    ``n_<category>`` count column per rule (occurrences at that stage)
    and a ``redacted`` column with the scrubbed text.

    The mandatory compliance pass of any crawl→training-data pipeline.
    Pure JVM regexp expressions — one narrow projection, no shuffle, no
    Python in the row path; Catalyst pipelines the four rewrites into a
    single codegen stage.
    """
    cur = F.col(text_col)
    cols = list(df.columns)
    out = df
    for name, pat, repl in PII_RULES:
        out = out.withColumn(f"n_{name}", F.regexp_count(cur, F.lit(pat)))
        cur = F.regexp_replace(cur, pat, repl)
    return out.select(
        *cols, *[f"n_{name}" for name, _, _ in PII_RULES], cur.alias("redacted")
    )
