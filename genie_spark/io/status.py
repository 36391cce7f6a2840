"""Validation-status and error-tracker tables.

The reference keeps two Synapse tables per center
(genie/input_to_database.py:54-113 ``check_existing_file_status``,
479-644 ``validatefile``/``email_duplication_error``): per-file
validation status rows keyed by (name, md5) so an unchanged re-upload
skips revalidation, and an error tracker holding the report text of
invalid files.  Duplicate filenames within one upload batch are
rejected outright.

Here both live as small parquet tables in the warehouse
(``validation_status`` / ``error_tracker``), one row per (center,
name).  They are dim-sized — one row per uploaded file — so the
read-modify-write update is cheap and the md5 is computed driver-side
over the upload file, exactly where the reference reads the Synapse
entity md5.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

STATUS_TABLE = "validation_status"
ERROR_TABLE = "error_tracker"

STATUS_SCHEMA = (
    "center string, name string, md5 string, status string, path string"
)
ERROR_SCHEMA = "center string, name string, errors string"


def file_md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def duplicate_basenames(paths: list[str]) -> list[str]:
    """Filenames appearing more than once in one upload batch — the
    reference rejects these before validation
    (input_to_database.py:595-644)."""
    names = [os.path.basename(p) for p in paths]
    return sorted({n for n in names if names.count(n) > 1})


def _read(spark: SparkSession, warehouse: str, table: str) -> DataFrame | None:
    try:
        return spark.read.parquet(os.path.join(warehouse, table))
    except Exception:
        return None


def prior_status(
    spark: SparkSession, warehouse: str, center: str, name: str, md5: str
) -> str | None:
    """The stored status when (name, md5) is unchanged — meaning
    revalidation can be skipped (check_existing_file_status: a changed
    md5 or name forces ``to_validate``)."""
    df = _read(spark, warehouse, STATUS_TABLE)
    if df is None:
        return None
    rows = (
        df.where(
            (df.center == center) & (df.name == name) & (df.md5 == md5)
        )
        .select("status")
        .collect()
    )
    return rows[0]["status"] if rows else None


def record_status(
    spark: SparkSession,
    warehouse: str,
    center: str,
    name: str,
    md5: str,
    status: str,
    path: str,
    errors: str = "",
) -> None:
    """Upsert the (center, name) status row and mirror the error text
    into the error tracker (cleared when the file turns valid)."""
    new = spark.createDataFrame(
        [(center, name, md5, status, path)], STATUS_SCHEMA
    )
    _upsert_small(spark, warehouse, STATUS_TABLE, new, center, name)
    err = spark.createDataFrame(
        [(center, name, errors)] if errors else [], ERROR_SCHEMA
    )
    _upsert_small(spark, warehouse, ERROR_TABLE, err, center, name)


def invalid_reason_texts(
    error_tracker: DataFrame, centers: list[str] | None = None
) -> dict[str, str]:
    """Per-center validation-error report text (reference
    genie/write_invalid_reasons.py:49-90): each invalid file renders
    as ``\\t{name}:\\n\\n{errors}\\n\\n`` with the ``|`` separators
    restored to newlines; a center with no invalid files gets
    ``"No errors!"``.  The tracker is dim-sized (one row per invalid
    file) so the collect is bounded."""
    rows = error_tracker.orderBy("center", "name").collect()
    by_center: dict[str, str] = {}
    for r in rows:
        text = f"\t{r['name']}:\n\n{(r['errors'] or '').replace('|', chr(10))}\n\n"
        by_center[r["center"]] = by_center.get(r["center"], "") + text
    for c in centers or []:
        by_center.setdefault(c, "No errors!")
    return by_center


def write_invalid_reasons(
    spark: SparkSession,
    warehouse: str,
    out_dir: str,
    centers: list[str] | None = None,
) -> list[str]:
    """Write ``{center}_validation_errors.txt`` per center from the
    error tracker (reference genie/write_invalid_reasons.py:14-45,
    minus the Synapse upload).  Returns the written paths."""
    tracker = _read(spark, warehouse, ERROR_TABLE)
    if tracker is None:
        texts = {c: "No errors!" for c in centers or []}
    else:
        texts = invalid_reason_texts(tracker, centers)
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for center, text in sorted(texts.items()):
        path = os.path.join(out_dir, f"{center}_validation_errors.txt")
        with open(path, "w") as f:
            f.write(text)
        written.append(path)
    return written


def _upsert_small(
    spark: SparkSession,
    warehouse: str,
    table: str,
    new: DataFrame,
    center: str,
    name: str,
) -> None:
    target = os.path.join(warehouse, table)
    existing = _read(spark, warehouse, table)
    if existing is not None:
        keep = existing.where(
            ~((existing.center == center) & (existing.name == name))
        )
        out = keep.unionByName(new)
    else:
        out = new
    staging = target + ".staging"
    out.write.mode("overwrite").parquet(staging)
    shutil.rmtree(target, ignore_errors=True)
    shutil.move(staging, target)
