"""PHI redaction (SURVEY.md §2.9) — release-critical.

Re-expresses ``redact_phi`` and its helpers (reference
genie/database_to_staging.py:109-233) as pure ``when/otherwise`` column
expressions: one narrow projection, no UDFs, safe to run over the full
patient table in a single codegen stage.

Rules (values are strings because the columns carry sentinels):
  * interval columns (AGE_AT_SEQ_REPORT, INT_CONTACT, INT_DOD): value
    > 32485 days (89 y) or already ``>``-prefixed → ``">32485"`` and the
    patient's BIRTH_YEAR → ``"cannotReleaseHIPAA"``; value < 6570 days
    (18 y) or ``<``-prefixed → ``"<6570"`` and BIRTH_YEAR → ``"withheld"``.
  * YEAR_CONTACT / YEAR_DEATH − BIRTH_YEAR > 89 → redact birth year.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DAYS_89Y = 32485
DAYS_18Y = 6570


def _num(col: str) -> Column:
    # try_cast: sentinel strings ("Unknown", ">32485") → null, never an
    # ANSI cast error (Spark 4 default).
    return F.col(col).try_cast("double")


def _is_over(col: str) -> Column:
    c = F.col(col)
    return c.startswith(">") | (_num(col) > DAYS_89Y)


def _is_under(col: str) -> Column:
    c = F.col(col)
    return c.startswith("<") | (_num(col) < DAYS_18Y)


def redact_interval_col(col: str) -> Column:
    """``_to_redact_interval`` (genie/database_to_staging.py:126-160)."""
    return (
        F.when(_is_over(col), F.lit(f">{DAYS_89Y}"))
        .when(_is_under(col), F.lit(f"<{DAYS_18Y}"))
        .otherwise(F.col(col))
    )


def redact_phi(
    df: DataFrame,
    interval_cols: tuple[str, ...] = ("AGE_AT_SEQ_REPORT", "INT_CONTACT", "INT_DOD"),
    birth_year_col: str = "BIRTH_YEAR",
    year_cols: tuple[str, ...] = ("YEAR_CONTACT", "YEAR_DEATH"),
) -> DataFrame:
    """Full redaction pass (genie/database_to_staging.py:109-233)."""
    present_intervals = [c for c in interval_cols if c in df.columns]
    over = None
    under = None
    for c in present_intervals:
        o, u = _is_over(c), _is_under(c)
        over = o if over is None else (over | o)
        under = u if under is None else (under | u)
    out = df
    # year difference rule (``_to_redact_difference``, lines 191-233)
    year_over = None
    if birth_year_col in df.columns:
        for y in year_cols:
            if y in df.columns:
                d = _num(y) - _num(birth_year_col)
                cond = d.isNotNull() & (d > 89)
                year_over = cond if year_over is None else (year_over | cond)
    for c in present_intervals:
        out = out.withColumn(c, redact_interval_col(c))
    if birth_year_col in df.columns:
        by = F.col(birth_year_col)
        expr = by
        if under is not None:
            expr = F.when(F.coalesce(under, F.lit(False)), F.lit("withheld")).otherwise(expr)
        if year_over is not None:
            expr = F.when(F.coalesce(year_over, F.lit(False)), F.lit("cannotReleaseHIPAA")).otherwise(expr)
        if over is not None:
            expr = F.when(F.coalesce(over, F.lit(False)), F.lit("cannotReleaseHIPAA")).otherwise(expr)
        # a birth year itself carrying >/< is always redacted (lines 162-189)
        expr = F.when(by.startswith(">") | by.startswith("<"), F.lit("cannotReleaseHIPAA")).otherwise(expr)
        out = out.withColumn(birth_year_col, expr)
    return out
