"""Scalar cleaning/normalization functions — the reference's F1-F14 surface
(SURVEY.md §2.8), re-expressed as Catalyst Column expressions so they run
JVM-side inside whole-stage codegen (never per-row Python).

Each function cites its reference implementation for parity checking.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def clean_currency(col: Column | str) -> Column:
    """'$1,234.56' -> 1234.56; unparseable/null -> 0.0.

    Reference: pandas `str.replace(r'[\\$,]','') + to_numeric(errors='coerce')
    + fillna(0)` — /root/reference/src/transform/pandas_ops.py:45-67."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.trim(F.regexp_replace(c, r"[\$,]", ""))
    return F.coalesce(stripped.try_cast("double"), F.lit(0.0))


def normalize_header(col: Column | str) -> Column:
    """Family-config header canonicalization: lowercase, drop ' - ', fix
    'x(' -> 'x (', collapse spaces, strip '(both working)' and trailing
    '0 children/child'.

    Reference: /root/reference/src/transform/normalizers.py:5-33."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.lower(c)
    out = F.regexp_replace(out, r"\s*-\s*", " ")
    out = F.regexp_replace(out, r"(\w)\(", r"$1 (")
    out = F.regexp_replace(out, r"\(both working\)", "")
    out = F.regexp_replace(out, r"\b0\s+child(ren)?\b", "")
    out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return out


def normalize_category_key(col: Column | str) -> Column:
    """Category text -> canonical key: lower + non-word runs -> single space.

    Reference: /root/reference/src/transform/normalizers.py:50-59."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"[^\w]+", " "))


def slugify(col: Column | str) -> Column:
    """Fallback slug on unknown category: spaces -> underscores.

    Reference: /root/reference/src/transform/normalizers.py:72."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(normalize_category_key(c), r"\s", "_")


def zfill(col: Column | str, width: int) -> Column:
    """Zero-pad to width (reference str.zfill at pandas_ops.py:38 etc.)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lpad(c.cast("string"), width, "0")


def parse_updated_date(col: Column | str) -> Column:
    """Extract + parse 'Month D, YYYY' from free text.

    Reference: regex + strptime('%B %d, %Y'),
    /root/reference/src/extract/wage_scraper.py:22-25,48-58."""
    c = F.col(col) if isinstance(col, str) else col
    extracted = F.regexp_extract(c, r"([A-Z][a-z]+ \d{1,2}, \d{4})", 1)
    return F.to_date(F.when(extracted != "", extracted), "MMMM d, yyyy")


def truncate_reason(col: Column | str, n: int = 1000) -> Column:
    """Reference truncates rejection reasons to 1000 chars (staging.py:140)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, n)


def json_payload(*cols: str) -> Column:
    """Row -> JSON string incl. nulls (reference json.dumps, staging.py:139)."""
    return F.to_json(F.struct(*[F.col(c) for c in cols]), {"ignoreNullFields": "false"})
