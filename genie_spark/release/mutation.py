"""Mutation (maf/vcf) processing workflow.

Spark re-expression of the reference's mutation pipeline
(genie/process_mutation.py:180-256 ``process_mutation_workflow``):

1. gather the center's valid maf/vcf uploads,
2. normalize maf column headers + float formatting
   (``move_and_configure_maf``, process_mutation.py:143-176),
3. annotate through Genome Nexus (``annotate_mutation``,
   process_mutation.py:388-419 — an **external subprocess** in the
   reference; here a pluggable boundary with a deterministic stub),
4. format (``format_maf``, process_mutation.py:436-457),
5. split into full + narrow maf and write both
   (``split_and_store_maf``, process_mutation.py:460-501),
6. concatenate + store the annotation error report and QC-check it
   against the table's FAILED rows
   (process_mutation.py:312-362).

Everything except the annotator itself is real distributed Spark; the
annotator is the documented stub boundary (the Genome Nexus jar is not
in this container).
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Canonical maf column spellings (reference MAF_COL_MAPPING values,
# genie/process_mutation.py:22-91).  Upload headers arrive uppercased;
# the mapping is derived as {upper(c): c} instead of a literal dict.
CANONICAL_MAF_COLS = [
    "Hugo_Symbol", "Entrez_Gene_Id", "Center", "NCBI_Build", "Chromosome",
    "Start_Position", "End_Position", "Strand", "Variant_Classification",
    "Variant_Type", "Reference_Allele", "Tumor_Seq_Allele1",
    "Tumor_Seq_Allele2", "dbSNP_RS", "dbSNP_Val_Status",
    "Tumor_Sample_Barcode", "Matched_Norm_Sample_Barcode",
    "Match_Norm_Seq_Allele1", "Match_Norm_Seq_Allele2",
    "Tumor_Validation_Allele1", "Tumor_Validation_Allele2",
    "Match_Norm_Validation_Allele1", "Match_Norm_Validation_Allele2",
    "Verification_Status", "Validation_Status", "Mutation_Status",
    "Sequencing_Phase", "Sequence_Source", "Validation_Method", "Score",
    "BAM_File", "Sequencer", "t_ref_count", "t_alt_count", "n_ref_count",
    "n_alt_count", "t_depth", "n_depth", "Allele", "Amino_acids",
    "CDS_position", "Codons", "Consequence", "Existing_variation",
    "Exon_Number", "Feature", "Feature_type", "Gene", "HGVSc", "HGVSp",
    "HGVSp_Short", "Hotspot", "PolyPhen", "Protein_position", "RefSeq",
    "Transcript_ID", "all_effects", "cDNA_position",
]

_HEADER_REMAP = {c.upper(): c for c in CANONICAL_MAF_COLS}

# Narrow maf projection (reference split_and_store_maf takes the
# Synapse narrow-maf table schema minus ``inBED``,
# genie/process_mutation.py:478-483).
NARROW_MAF_COLS = [
    "Hugo_Symbol", "Entrez_Gene_Id", "Center", "NCBI_Build", "Chromosome",
    "Start_Position", "End_Position", "Strand", "Variant_Classification",
    "Variant_Type", "Reference_Allele", "Tumor_Seq_Allele1",
    "Tumor_Seq_Allele2", "Tumor_Sample_Barcode", "Mutation_Status",
    "Validation_Status", "t_ref_count", "t_alt_count", "n_ref_count",
    "n_alt_count", "t_depth", "n_depth", "HGVSc", "HGVSp", "HGVSp_Short",
    "Protein_position", "Codons", "Exon_Number", "Consequence",
    "Annotation_Status",
]


def configure_maf_columns(df: DataFrame) -> DataFrame:
    """Header normalization for an uploaded maf
    (``move_and_configure_maf`` genie/process_mutation.py:143-166):
    uppercase headers are remapped to their canonical spelling; the
    reference's ``.0``-strip happens at write time here
    (io.writers.strip_float_formatting, the S13 sink) and its
    dtype-sniff/string-coercion is moot under schema-on-read — our TSV
    scan reads strings."""
    return df.select(
        *[F.col(c).alias(_HEADER_REMAP.get(c.upper(), c)) for c in df.columns]
    )


def vcf_to_maf_minimal(df: DataFrame, sample_id: str | None = None) -> DataFrame:
    """Minimal vcf→maf projection for annotation input.

    In the reference the vcf2maf conversion lives inside the external
    annotation suite (annotation_suite_wrapper.sh); this is the
    deterministic core of it: CHROM/POS/REF/ALT → maf coordinate
    columns, end = start + len(ref) − 1, Tumor_Sample_Barcode from the
    genotype-column name (vcf sample column, genie_registry/vcf.py:176-273)
    or the supplied ``sample_id``."""
    chrom = "#CHROM" if "#CHROM" in df.columns else "CHROM"
    fixed = {"#CHROM", "CHROM", "POS", "ID", "REF", "ALT", "QUAL",
             "FILTER", "INFO", "FORMAT"}
    samples = [c for c in df.columns if c not in fixed]
    barcode = sample_id or (samples[0] if samples else None)
    if barcode is None:
        raise ValueError("vcf has no sample column and no sample_id given")
    pos = F.col("POS").try_cast("long")
    return df.select(
        F.regexp_replace(F.col(chrom), "^chr", "").alias("Chromosome"),
        pos.alias("Start_Position"),
        (pos + F.length("REF") - F.lit(1)).alias("End_Position"),
        F.col("REF").alias("Reference_Allele"),
        # multi-allelic ALT keeps the first allele, like vcf2maf's
        # primary-allele pick
        F.split(F.col("ALT"), ",").getItem(0).alias("Tumor_Seq_Allele2"),
        F.lit(barcode).alias("Tumor_Sample_Barcode"),
    )


AnnotatorFn = Callable[[DataFrame], DataFrame]


def stub_annotator(df: DataFrame) -> DataFrame:
    """DETERMINISTIC STUB for the Genome Nexus annotation step
    (reference annotate_mutation, genie/process_mutation.py:388-419,
    which shells out to annotation_suite_wrapper.sh — not available in
    this container).

    The stub adds the two columns the downstream pipeline depends on:
    ``Annotation_Status`` (FAILED iff the variant has no usable genomic
    coordinates — the same class of row Genome Nexus rejects) and
    ``genomic_location_explanation`` for failed rows.  A real
    deployment swaps this for a partition-level subprocess or REST
    client behind the same ``AnnotatorFn`` signature."""
    pos = F.col("Start_Position").try_cast("long")
    bad = (
        pos.isNull()
        | F.col("Chromosome").isNull()
        | (F.col("Chromosome") == "")
        | F.col("Reference_Allele").isNull()
    )
    return df.withColumn(
        "Annotation_Status", F.when(bad, F.lit("FAILED")).otherwise(F.lit("SUCCESS"))
    ).withColumn(
        "genomic_location_explanation",
        F.when(bad, F.lit("invalid genomic location")).otherwise(F.lit(None).cast("string")),
    )


def lookup_annotator(annotations: DataFrame) -> AnnotatorFn:
    """Reference-implementation annotator behind the ``AnnotatorFn``
    boundary: a broadcast lookup-table join standing in for the Genome
    Nexus REST round-trip (reference annotate_mutation,
    genie/process_mutation.py:388-419).

    ``annotations`` is a dim-sized table keyed by the variant
    coordinate tuple (Chromosome, Start_Position, Reference_Allele,
    Tumor_Seq_Allele2) whose remaining columns are the annotation
    payload (e.g. Hugo_Symbol, HGVSp_Short, Consequence).  Rows that
    miss usable coordinates OR find no match in the table come back
    ``Annotation_Status = FAILED`` with a ``genomic_location_explanation``
    — the same failure classes Genome Nexus reports, feeding the same
    downstream error-report QC (process_mutation.py:312-362).

    100 TB posture: the annotation table is broadcast (it is a
    reference dim, not data-sized), so the maf side never shuffles.
    """
    key = ["Chromosome", "Start_Position", "Reference_Allele", "Tumor_Seq_Allele2"]
    payload = [c for c in annotations.columns if c not in key]

    def annotate(df: DataFrame) -> DataFrame:
        pos = F.col("Start_Position").try_cast("long")
        bad_coords = (
            pos.isNull()
            | F.col("Chromosome").isNull()
            | (F.col("Chromosome") == "")
            | F.col("Reference_Allele").isNull()
        )
        # normalize the join key dtypes (uploads arrive as strings);
        # payload columns are prefixed so a left join never collides
        # with same-named maf columns — on a hit the annotation wins
        ann = annotations
        for c in key:
            ann = ann.withColumn(c, F.col(c).cast("string"))
        # one annotation per variant key: a duplicate-keyed lookup table
        # would otherwise fan out maf rows through the left join
        ann = ann.dropDuplicates(key)
        ann = ann.select(
            *key, *[F.col(c).alias(f"__ann_{c}") for c in payload]
        ).withColumn("__hit", F.lit(True))
        probe = df
        for c in key:
            probe = probe.withColumn(c, F.col(c).cast("string"))
        joined = probe.join(F.broadcast(ann), on=key, how="left")
        matched = F.col("__hit").isNotNull()
        out = joined
        for c in payload:
            merged = (
                F.coalesce(F.col(f"__ann_{c}"), F.col(c))
                if c in df.columns
                else F.col(f"__ann_{c}")
            )
            out = out.withColumn(c, merged).drop(f"__ann_{c}")
        out = out.withColumn(
            "Annotation_Status",
            F.when(bad_coords | ~matched, F.lit("FAILED")).otherwise(F.lit("SUCCESS")),
        ).withColumn(
            "genomic_location_explanation",
            F.when(bad_coords, F.lit("invalid genomic location"))
            .when(~matched, F.lit("variant not found by annotator"))
            .otherwise(F.lit(None).cast("string")),
        )
        return out.drop("__hit")

    return annotate


def format_maf(df: DataFrame, center: str) -> DataFrame:
    """Post-annotation formatting (reference format_maf,
    genie/process_mutation.py:436-457): stamp Center, normalize
    Tumor_Sample_Barcode to the GENIE-{center}- prefix (checkGenieId,
    genie/process_functions.py:307-322), null out
    Sequence_Source/Sequencer, blank Unknown Validation_Status."""
    tsb = F.col("Tumor_Sample_Barcode").cast("string")
    fixed_tsb = (
        F.when(tsb.startswith(f"{center}-"), F.concat(F.lit("GENIE-"), tsb))
        .when(~tsb.startswith(f"GENIE-{center}-"),
              F.concat_ws("-", F.lit("GENIE"), F.lit(center), tsb))
        .otherwise(tsb)
    )
    out = df.withColumn("Center", F.lit(center)).withColumn(
        "Tumor_Sample_Barcode", fixed_tsb
    )
    for c in ("Sequence_Source", "Sequencer"):
        out = out.withColumn(c, F.lit(None).cast("string"))
    if "Validation_Status" in out.columns:
        out = out.withColumn(
            "Validation_Status",
            F.when(
                F.col("Validation_Status").isin("Unknown", "unknown"), F.lit("")
            ).otherwise(F.col("Validation_Status")),
        )
    return out


def narrow_maf(df: DataFrame, cols: Sequence[str] = NARROW_MAF_COLS) -> DataFrame:
    """Narrow projection of the annotated maf — the reference's
    narrow-maf table upload (process_mutation.py:478-496) minus
    ``inBED`` (computed later by the bed interval join)."""
    keep = [c for c in cols if c in df.columns]
    return df.select(*keep)


def annotation_error_report(df: DataFrame, center: str) -> DataFrame:
    """Failed-annotation report (concat_annotation_error_reports,
    genie/process_mutation.py:312-333): FAILED rows stamped with the
    center."""
    return df.where(F.col("Annotation_Status") == "FAILED").withColumn(
        "Center", F.lit(center)
    )


def check_annotation_counts(maf: DataFrame, error_report: DataFrame) -> dict:
    """QC: the error report must cover exactly the maf's FAILED rows
    (check_annotation_error_reports, genie/process_mutation.py:336-362).
    One Spark job: both sides are tagged, unioned, and counted in a
    single aggregate."""
    tagged = (
        maf.where(F.col("Annotation_Status") == "FAILED")
        .select(F.lit(1).alias("is_maf"))
        .unionAll(error_report.select(F.lit(0).alias("is_maf")))
    )
    row = tagged.agg(
        F.coalesce(F.sum("is_maf"), F.lit(0)).alias("maf_failed"),
        F.coalesce(F.sum(F.lit(1) - F.col("is_maf")), F.lit(0)).alias("report_rows"),
    ).first()
    return {
        "maf_failed": row["maf_failed"],
        "report_rows": row["report_rows"],
        "match": row["maf_failed"] == row["report_rows"],
    }


def process_mutation_workflow(
    spark: SparkSession,
    center: str,
    maf_paths: Sequence[str] = (),
    vcf_paths: Sequence[str] = (),
    out_dir: str | None = None,
    annotator: AnnotatorFn = stub_annotator,
) -> DataFrame:
    """End-to-end center mutation processing
    (process_mutation_workflow, genie/process_mutation.py:180-256).

    Reads every valid maf/vcf upload, normalizes, unions them by column
    name (missing columns null-filled — the reference's annotator
    merges heterogeneous inputs the same way), annotates, formats, and
    (when ``out_dir`` is given) writes the full maf, the narrow maf and
    the error report as TSVs.  Returns the full annotated maf."""
    from genie_spark.io.readers import read_maf, read_vcf
    from genie_spark.io.writers import write_tsv

    parts: list[DataFrame] = []
    for p in maf_paths:
        parts.append(configure_maf_columns(read_maf(spark, p)))
    for p in vcf_paths:
        parts.append(vcf_to_maf_minimal(read_vcf(spark, p)))
    if not parts:
        raise ValueError("no mutation files")
    merged = parts[0]
    for other in parts[1:]:
        merged = merged.unionByName(other, allowMissingColumns=True)

    annotated = format_maf(annotator(merged), center)
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        write_tsv(
            annotated,
            os.path.join(out_dir, f"data_mutations_extended_{center}.txt"),
        )
        write_tsv(
            narrow_maf(annotated),
            os.path.join(out_dir, f"data_mutations_extended_{center}_MAF_narrow.txt"),
        )
        write_tsv(
            annotation_error_report(annotated, center),
            os.path.join(out_dir, "failed_annotations_error_report.txt"),
        )
    return annotated
