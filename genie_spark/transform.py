"""Per-format processing transforms (SURVEY.md §7.1 layer 4).

Pure ``DataFrame -> DataFrame`` functions mirroring the reference's
``process_steps``: clinical code→label remapping, BED gene-symbol
remapping against the gene-position table, and BED exon/intron/
intergenic feature classification.  All set-at-a-time: the reference's
per-row ``apply`` loops (genie_registry/bed.py:557,693;
genie_registry/clinical.py:417-459) become joins and column
expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from genie_spark.operators.intervals import (
    max_overlap_remap,
    overlap_semi_join,
)

# Code→label maps from the reference's clinical remap
# (genie_registry/clinical.py:321-382: SEX / PRIMARY_RACE / ETHNICITY /
# SAMPLE_TYPE map through center-agnostic code tables).
DEFAULT_CLINICAL_MAPPINGS: dict[str, dict[str, str]] = {
    "SEX": {"1": "Male", "2": "Female", "99": "Unknown"},
    "PRIMARY_RACE": {
        "1": "White", "2": "Black", "3": "Asian", "4": "Native American",
        "99": "Unknown",
    },
    "ETHNICITY": {
        "1": "Non-Spanish/non-Hispanic", "2": "Spanish/Hispanic",
        "99": "Unknown",
    },
}


def remap_clinical_values(
    df: DataFrame,
    mappings: dict[str, dict[str, str]] | None = None,
    keep_unmapped: bool = True,
) -> DataFrame:
    """Value remap per column via literal maps (J9,
    genie_registry/clinical.py:321-382 ``remap_clinical_values``).

    A ``create_map`` literal ships with the plan — no join, no shuffle;
    unmapped codes pass through (or null with ``keep_unmapped=False``).
    """
    mappings = DEFAULT_CLINICAL_MAPPINGS if mappings is None else mappings
    out = df
    for col, m in mappings.items():
        if col not in out.columns:
            continue
        lit_map = F.create_map(
            *[F.lit(x) for kv in m.items() for x in kv]
        )
        mapped = lit_map[F.col(col).cast("string")]
        out = out.withColumn(
            col, F.coalesce(mapped, F.col(col) if keep_unmapped else F.lit(None))
        )
    return out


def update_clinical_values(df: DataFrame) -> DataFrame:
    """Per-row clinical normalization (reference ``update_clinical``,
    genie_registry/clinical.py:417-462 — a pandas ``apply`` per row
    there) as one set of column expressions:

    * every string column trimmed (455-458);
    * BIRTH_YEAR / AGE_AT_SEQ_REPORT / YEAR_CONTACT / YEAR_DEATH
      canonicalized to integer rendering when integral ("1950.0" →
      "1950"), sentinels pass through (checkInt branches);
    * SEQ_ASSAY_ID: underscores → dashes, uppercased (433-437);
    * SEQ_DATE: title-cased, and SEQ_YEAR extracted from the
      "Mon-YYYY" form (null for the "Release" sentinel) (439-445).
    """
    out = df
    for c, t in out.dtypes:
        if t == "string":
            out = out.withColumn(c, F.trim(F.col(c)))
    for c in ("BIRTH_YEAR", "AGE_AT_SEQ_REPORT", "YEAR_CONTACT", "YEAR_DEATH"):
        if c in out.columns:
            d = F.col(c).try_cast("double")
            out = out.withColumn(
                c,
                F.when(
                    d.isNotNull() & (d == F.floor(d)),
                    F.floor(d).cast("bigint").cast("string"),
                ).otherwise(F.col(c)),
            )
    if "SEQ_ASSAY_ID" in out.columns:
        out = out.withColumn(
            "SEQ_ASSAY_ID", F.upper(F.translate(F.col("SEQ_ASSAY_ID"), "_", "-"))
        )
    if "SEQ_DATE" in out.columns:
        out = out.withColumn("SEQ_DATE", F.initcap(F.col("SEQ_DATE"))).withColumn(
            "SEQ_YEAR",
            F.when(
                F.col("SEQ_DATE") != "Release",
                F.split(F.col("SEQ_DATE"), "-").getItem(1).try_cast("int"),
            ),
        )
    return out


def remap_bed_symbols(
    bed: DataFrame,
    gene_positions: DataFrame,
    boundary: float = 0.9,
) -> DataFrame:
    """BED symbol remap against the gene-position table (J6, the
    reference's per-row ``remap_symbols`` genie_registry/bed.py:250-393).

    Keeps the original symbol as ``ID`` (the reference renames the raw
    column to ID before remapping — bed.py:527-545) and sets
    ``Hugo_Symbol`` to the max-overlap gene when the overlap ratio
    clears ``boundary`` unambiguously, else null.

    ``gene_positions`` columns: hugo_symbol, chromosome, start_position,
    end_position.
    """
    remapped = max_overlap_remap(
        bed.withColumnRenamed("Hugo_Symbol", "ID"),
        gene_positions.select(
            F.col("hugo_symbol").alias("__g_sym"),
            F.col("chromosome").alias("Chromosome"),
            F.col("start_position").alias("__g_start"),
            F.col("end_position").alias("__g_end"),
        ),
        on=["Chromosome"],
        seg_start="Start_Position",
        seg_end="End_Position",
        gene_start="__g_start",
        gene_end="__g_end",
        gene_symbol="__g_sym",
        min_ratio=boundary,
        seg_id="ID",
    )
    return remapped.withColumnRenamed("remapped_symbol", "Hugo_Symbol")


def classify_feature_type(
    bed: DataFrame,
    exons: DataFrame,
    genes: DataFrame,
    on: list[str] = ("Chromosome",),
    start: str = "Start_Position",
    end: str = "End_Position",
) -> DataFrame:
    """Exon/intron/intergenic classification (J5, the reference's
    bedtools intersect + sort|uniq + diff pipeline,
    genie_registry/bed.py:131-247) as two binned semi joins + a
    when-chain.

    A bed region is ``exon`` if it overlaps any exon interval,
    ``intron`` if it only overlaps a gene interval, else
    ``intergenic``.  ``exons``/``genes`` need the same ``on`` keys plus
    start/end columns named like the bed's.
    """
    from genie_spark.functions.ids import with_stable_uid

    on = list(on)
    uid = "__bed_uid"
    # Content-derived uid (deterministic under retries); duplicate bed
    # rows share one uid, so the mark sets are distinct-ed and the
    # join-back gives every duplicate the same classification.
    b = with_stable_uid(bed, uid)
    in_exon = (
        overlap_semi_join(
            b, exons.select(*on, start, end), on, start, end, start, end
        ).select(uid).distinct().withColumn("__x", F.lit(True))
    )
    in_gene = (
        overlap_semi_join(
            b, genes.select(*on, start, end), on, start, end, start, end
        ).select(uid).distinct().withColumn("__g", F.lit(True))
    )
    return (
        b.join(in_exon, uid, "left")
        .join(in_gene, uid, "left")
        .withColumn(
            "Feature_Type",
            F.when(F.col("__x"), "exon")
            .when(F.col("__g"), "intron")
            .otherwise("intergenic"),
        )
        .drop(uid, "__x", "__g")
    )
