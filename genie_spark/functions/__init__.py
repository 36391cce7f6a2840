from genie_spark.functions.scalars import (
    to_number_or_null,
    is_integer_string,
    genie_id_ok,
    standardize_for_compare,
    strip_chr_prefix,
    parse_month_year,
)
from genie_spark.functions.redact import redact_phi

__all__ = [
    "to_number_or_null",
    "is_integer_string",
    "genie_id_ok",
    "standardize_for_compare",
    "strip_chr_prefix",
    "parse_month_year",
    "redact_phi",
]
