"""PII detection / redaction kernels — the training-data hygiene tier.

A 100 TB pretraining pipeline scrubs personally identifiable
information before anything else sees the text. Same design as
:mod:`satya_spark.functions.text`: every kernel is a pure ``Column``
builder (JVM ``rlike`` / ``regexp_replace``, whole-stage codegen, no
Python in the data plane) with a DuckDB-SQL twin for the differential
oracle.

Patterns are deliberately written in the Java-regex ∩ RE2 dialect
(no lookaround, no backreferences) so the Spark plan and the DuckDB
oracle execute literally the same regexes. Detection is independent
per category; redaction applies the categories in declaration order
(email first so an address's digit runs can't be half-eaten by the
numeric patterns).

Reference scope note: the reference validates emails/URLs as
constraint kernels (src/satya/__init__.py special types); free-text
PII scanning is an extension in the spirit of its regex tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# category -> (pattern, replacement token); declaration order IS the
# redaction order
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ssn": (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    "phone": (r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
    "ipv4": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IPV4>"),
}


def pii_flag(col: Column, kind: str) -> Column:
    """True when the text contains PII of the given category
    (null text → null, like every value kernel)."""
    return col.rlike(PII_PATTERNS[kind][0])


def pii_flag_sql(name: str, kind: str) -> str:
    return f"regexp_matches({name}, '{PII_PATTERNS[kind][0]}')"


def pii_count_types(col: Column) -> Column:
    """How many distinct PII categories the text contains (0..n)."""
    out = F.lit(0)
    for kind in PII_PATTERNS:
        out = out + pii_flag(col, kind).cast("int")
    return out


def pii_count_types_sql(name: str) -> str:
    return " + ".join(
        f"CAST({pii_flag_sql(name, k)} AS INT)" for k in PII_PATTERNS
    )


def redact(col: Column, kinds: tuple[str, ...] | None = None) -> Column:
    """Replace every PII span with its category token, categories
    applied in declaration order."""
    out = col
    for kind in kinds or tuple(PII_PATTERNS):
        pat, token = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pat, token)
    return out


def redact_sql(name: str, kinds: tuple[str, ...] | None = None) -> str:
    out = name
    for kind in kinds or tuple(PII_PATTERNS):
        pat, token = PII_PATTERNS[kind]
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out


def with_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Annotate with per-category flags, the distinct-category count,
    and the redacted text — one projection, all JVM-side."""
    col = F.col(text_col)
    out = df
    for kind in PII_PATTERNS:
        out = out.withColumn(f"pii_{kind}", pii_flag(col, kind))
    return out.withColumn("pii_types", pii_count_types(col)).withColumn(
        "text_redacted", redact(col)
    )


__all__ = [
    "PII_PATTERNS",
    "pii_flag",
    "pii_flag_sql",
    "pii_count_types",
    "pii_count_types_sql",
    "redact",
    "redact_sql",
    "with_pii",
]
