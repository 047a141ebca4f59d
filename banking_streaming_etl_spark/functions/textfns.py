"""Text-analysis expressions (training-data-pipeline operators).

Tokenization, word-shingles, quality metrics, fingerprints, and a
language-ID heuristic — all as JVM-side built-in expressions (split /
transform / filter / aggregate lambdas), with DuckDB SQL twins. No Python
UDFs: at 100 TB these run inside whole-stage codegen over the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- tokens / shingles -------------------------------------------------------


def tokens(text: str = "text") -> Column:
    """Whitespace tokens (single-space separator — the corpus contract)."""
    return F.split(F.col(text), " ")


TOKENS_SQL = "string_split(text, ' ')"


def word_shingles(tok_col: str = "toks", n: int = 3) -> Column:
    """n-word shingles via transform over an index sequence — identical
    strings to the DuckDB twin. Documents with fewer than n tokens yield an
    empty array (F.sequence(1, 0) would DESCEND and index out of range;
    the DuckDB twin's range() is empty there, so the guard also keeps the
    engines in lock-step)."""
    shingles = F.transform(
        F.sequence(F.lit(1), F.size(F.col(tok_col)) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col(tok_col), i + k) for k in range(n)]
        ),
    )
    return F.when(F.size(F.col(tok_col)) >= n, shingles).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles_sql(tok_expr: str = "toks", n: int = 3) -> str:
    joined = " || ' ' || ".join(f"{tok_expr}[i+{k}]" if k else f"{tok_expr}[i]" for k in range(n))
    return f"list_transform(range(1, len({tok_expr}) - {n - 2}), i -> {joined})"


# --- quality metrics ---------------------------------------------------------

PUNCT_CHARS = ".,!?;:"
STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is")


def n_tokens(tok_col: Column) -> Column:
    return F.size(tok_col)


def punct_ratio(text: str = "text") -> Column:
    """Fraction of characters that are punctuation (length-diff trick —
    regexp-free so both engines agree exactly)."""
    stripped = F.translate(F.col(text), PUNCT_CHARS, "")
    return (
        (F.length(F.col(text)) - F.length(stripped)).cast("double")
        / F.length(F.col(text)).cast("double")
    )


PUNCT_RATIO_SQL = (
    f"CAST(LENGTH(text) - LENGTH(translate(text, '{PUNCT_CHARS}', '')) AS DOUBLE)"
    " / CAST(LENGTH(text) AS DOUBLE)"
)


def stopword_ratio(tok_col: Column) -> Column:
    hits = F.size(
        F.filter(tok_col, lambda t: t.isin(*STOPWORDS_EN))
    )
    return hits.cast("double") / F.size(tok_col).cast("double")


def stopword_ratio_sql(tok_expr: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    return (
        f"CAST(len(list_filter({tok_expr}, t -> t IN ({lst}))) AS DOUBLE)"
        f" / CAST(len({tok_expr}) AS DOUBLE)"
    )


# --- language-ID heuristic ---------------------------------------------------

#: tiny per-language function-word lexicons; the heuristic is the operator
#: (stopword-hit argmax with a fixed tie order), not a production model.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "is", "a"),
    "es": ("el", "la", "de", "que", "y", "los", "un"),
    "de": ("der", "die", "und", "das", "ist", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "un", "est"),
}
LANG_ORDER = tuple(LANG_LEXICONS)  # deterministic tie-break order


def lang_hits(tok_col: Column, lang: str) -> Column:
    return F.size(F.filter(tok_col, lambda t: t.isin(*LANG_LEXICONS[lang])))


def lang_id(tok_col: Column) -> Column:
    """argmax over lexicon hit counts; ties resolve to the earliest lang in
    LANG_ORDER via a strict > chain; zero hits -> 'unknown'."""
    hits = {lang: lang_hits(tok_col, lang) for lang in LANG_ORDER}
    best = None
    for lang in LANG_ORDER:
        cond = hits[lang] > F.lit(0)
        for other in LANG_ORDER:
            if other == lang:
                continue
            strict = LANG_ORDER.index(other) < LANG_ORDER.index(lang)
            cond = cond & (
                (hits[lang] > hits[other])
                if strict
                else (hits[lang] >= hits[other])
            )
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    return best.otherwise("unknown")


def lang_id_sql(tok_expr: str) -> str:
    def hits(lang: str) -> str:
        lst = ", ".join(f"'{w}'" for w in LANG_LEXICONS[lang])
        return f"len(list_filter({tok_expr}, t -> t IN ({lst})))"

    branches = []
    for lang in LANG_ORDER:
        conds = [f"{hits(lang)} > 0"]
        for other in LANG_ORDER:
            if other == lang:
                continue
            op = ">" if LANG_ORDER.index(other) < LANG_ORDER.index(lang) else ">="
            conds.append(f"{hits(lang)} {op} {hits(other)}")
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(branches) + " ELSE 'unknown' END"


# --- fingerprints ------------------------------------------------------------


def md5_fingerprint(text: str = "text") -> Column:
    """Exact-content fingerprint; identical hex strings in both engines."""
    return F.md5(F.col(text))


MD5_SQL = "md5(text)"


# --- PII scrubbing -------------------------------------------------------------

#: ASCII-only patterns chosen for exact Java-regex/RE2 parity (verified in
#: tests and by the DuckDB oracle): emails, dashed/spaced phone numbers,
#: dotted-quad IPs. Order matters — emails first so user@10.0.0.1-style
#: text is redacted as an email, not an IP.
PII_PATTERNS = (
    ("<EMAIL>", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("<PHONE>", r"\+?[0-9]{2,3}[- ][0-9]{4,5}[- ][0-9]{4}"),
    ("<IP>", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
)


def scrub_pii(text: str = "text") -> Column:
    """Redact emails/phones/IPs with typed placeholder tokens — the
    pre-training scrub pass. Chained JVM regexp_replace, narrow map."""
    out = F.col(text)
    for token, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def scrub_pii_sql(expr: str) -> str:
    out = expr
    for token, pat in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out


def pii_counts(text: str = "text") -> list[Column]:
    """Per-kind redaction counts (the audit columns a scrub job logs)."""
    return [
        F.regexp_count(F.col(text), F.lit(pat)).alias(
            f"n_{token.strip('<>').lower()}"
        )
        for token, pat in PII_PATTERNS
    ]


def pii_counts_sql(expr: str) -> str:
    return ",\n       ".join(
        f"len(regexp_extract_all({expr}, '{pat}')) AS n_{token.strip('<>').lower()}"
        for token, pat in PII_PATTERNS
    )
