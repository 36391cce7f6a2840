"""Semi-structured JSON column accessors (the ``events.props`` class
of column: free-form JSON properties riding a typed fact table — the
reference keeps comparable semi-structured payloads as JSON-in-text
columns too, e.g. the assay-information YAML blobs it parses into
typed fields, genie/assay.py).

Spark mapping: ``get_json_object`` / ``from_json`` are JVM-side
expressions inside whole-stage codegen — JSON path extraction is a
per-row narrow map, no UDF, no exchange.  Numeric casts go through
``try_cast`` (Spark 4 ANSI ``cast`` THROWS on malformed input; a
malformed property must yield NULL, not kill a 100 TB scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def json_str(col: str | Column, field: str) -> Column:
    """Extract ``$.field`` as a string (NULL on missing/malformed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{field}")


def json_long(col: str | Column, field: str) -> Column:
    """Extract ``$.field`` as a long — ``try_cast`` so malformed or
    non-numeric values become NULL instead of an ANSI runtime error."""
    return json_str(col, field).try_cast("long")


def parse_props(
    df: DataFrame,
    col: str = "props",
    fields: dict[str, str] | None = None,
) -> DataFrame:
    """Parse a JSON column into typed top-level columns via ONE
    ``from_json`` (single parse per row, then struct field reads —
    cheaper than N ``get_json_object`` calls when extracting several
    fields).  ``fields`` maps field name → Spark type DDL string,
    default ``{"k": "long"}`` for the testdata's events.props shape.
    Unparseable rows yield NULLs (from_json's PERMISSIVE default)."""
    fields = fields or {"k": "long"}
    schema = T.StructType(
        [
            T.StructField(name, T._parse_datatype_string(ddl), True)
            for name, ddl in fields.items()
        ]
    )
    parsed = F.from_json(F.col(col), schema)
    return df.withColumns(
        {name: parsed.getField(name) for name in fields}
    )
