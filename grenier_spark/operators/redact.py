"""PII redaction: the anonymization pass of a training-data pipeline.

Emails, IPv4 addresses and phone-shaped numbers are replaced by typed
placeholders (``<EMAIL>``, ``<IP>``, ``<PHONE>``) in a fixed chain of
``regexp_replace`` calls — pure JVM scan-stage expressions, zero shuffle,
zero Python, so the pass fuses into whatever scan already reads the text
(the same posture as the quality/textstats filters).

Cross-engine contract: the patterns below are written in the common
dialect of Java regex (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, ``\\b`` word boundaries, no backreferences or
lookaround (RE2 has neither) — and both engines use leftmost match with
greedy quantifiers here, so redacted output and per-category counts are
BYTE-IDENTICAL across engines (gate query ``pii_redaction`` hashes the
redacted text). Chain order matters (an email would otherwise leave its
digits to the phone pattern): EMAIL -> IP -> PHONE on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Patterns valid and semantically identical in Java regex AND RE2.
# (\b is supported by both; {m,n} greedy; no lookaround/backrefs.)
PII_PATTERNS: "list[tuple[str, str, str]]" = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[- .]\d{3}[- .]\d{4}\b", "<PHONE>"),
]


def redact_text(text_col: "Column | str") -> Column:
    """The redacted text Column: the fixed EMAIL -> IP -> PHONE
    ``regexp_replace`` chain (each replaces ALL occurrences)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def redact_pii(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-doc redaction report: the redacted text plus per-category hit
    counts (counted on the ORIGINAL text, before the chain rewrites it).

    Returns (id, n_email, n_ip, n_phone, redacted) — narrow scan-stage
    plan; filter on the counts to route dirty docs, or select ``redacted``
    as the cleaned corpus column.
    """
    counts = [F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
              .alias(f"n_{name}") for name, pat, _ in PII_PATTERNS]
    return df.select(F.col(id_col), *counts,
                     redact_text(text_col).alias("redacted"))


def redact_pii_sql(table_sql: str, text_col: str = "text",
                   id_col: str = "doc_id",
                   hash_output: bool = False) -> str:
    """DuckDB twin of :func:`redact_pii` (RE2 'g' flag = replace-all, same
    chain order). ``hash_output=True`` emits md5(redacted) instead of the
    text — the compact way to gate byte-identity of the rewrite."""
    redacted = text_col
    for _, pat, repl in PII_PATTERNS:
        redacted = (f"regexp_replace({redacted}, '{pat}', "
                    f"'{repl}', 'g')")
    counts = ", ".join(
        f"len(regexp_extract_all({text_col}, '{pat}'))::BIGINT AS n_{name}"
        for name, pat, _ in PII_PATTERNS)
    out = (f"md5({redacted}) AS redacted_md5" if hash_output
           else f"{redacted} AS redacted")
    return f"SELECT {id_col}, {counts}, {out} FROM ({table_sql})"
