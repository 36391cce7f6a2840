"""Mutation-processing workflow tests (reference
genie/process_mutation.py:143-501)."""

from __future__ import annotations

import os

from genie_spark.release.mutation import (
    check_annotation_counts,
    configure_maf_columns,
    format_maf,
    narrow_maf,
    process_mutation_workflow,
    stub_annotator,
    vcf_to_maf_minimal,
)

CENTER = "SAGE"

MAF_TEXT = (
    "HUGO_SYMBOL\tCHROMOSOME\tSTART_POSITION\tEND_POSITION\t"
    "REFERENCE_ALLELE\tTUMOR_SEQ_ALLELE2\tTUMOR_SAMPLE_BARCODE\t"
    "VALIDATION_STATUS\tT_REF_COUNT\n"
    "TP53\t17\t7578406\t7578406\tC\tT\tSAGE-1-1\tUnknown\t100\n"
    "KRAS\t12\t\t\tG\tA\tGENIE-SAGE-2-1\tValid\t50\n"
)

VCF_TEXT = (
    "##fileformat=VCFv4.2\n"
    "##source=test\n"
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tGENIE-SAGE-3-1\n"
    "chr7\t140453136\t.\tAC\tT,G\t.\tPASS\t.\tGT\t0/1\n"
)


def _write(tmp_path, name, text):
    p = os.path.join(tmp_path, name)
    with open(p, "w") as f:
        f.write(text)
    return p


def test_configure_and_format_maf(spark, tmp_path):
    maf = _write(str(tmp_path), "data_mutations_extended_SAGE.txt", MAF_TEXT)
    from genie_spark.io.readers import read_maf

    df = configure_maf_columns(read_maf(spark, maf))
    # uppercase upload headers remapped to canonical spellings
    assert "Hugo_Symbol" in df.columns and "t_ref_count" in df.columns

    out = format_maf(stub_annotator(df), CENTER)
    rows = {r["Tumor_Sample_Barcode"]: r for r in out.collect()}
    # checkGenieId semantics: center-prefixed gets GENIE- prepended,
    # already-correct ids pass through
    assert "GENIE-SAGE-1-1" in rows and "GENIE-SAGE-2-1" in rows
    assert rows["GENIE-SAGE-1-1"]["Validation_Status"] == ""  # Unknown → blank
    assert rows["GENIE-SAGE-1-1"]["Sequencer"] is None
    assert rows["GENIE-SAGE-1-1"]["Center"] == CENTER
    # row with null Start_Position fails the (stub) annotation
    assert rows["GENIE-SAGE-2-1"]["Annotation_Status"] == "FAILED"
    assert rows["GENIE-SAGE-1-1"]["Annotation_Status"] == "SUCCESS"


def test_vcf_to_maf_minimal(spark, tmp_path):
    vcf = _write(str(tmp_path), "GENIE-SAGE-3-1.vcf", VCF_TEXT)
    from genie_spark.io.readers import read_vcf

    row = vcf_to_maf_minimal(read_vcf(spark, vcf)).collect()[0]
    assert row["Chromosome"] == "7"  # chr prefix stripped
    assert row["Start_Position"] == 140453136
    assert row["End_Position"] == 140453137  # len(REF)=2
    assert row["Tumor_Seq_Allele2"] == "T"  # first ALT allele
    assert row["Tumor_Sample_Barcode"] == "GENIE-SAGE-3-1"


def test_workflow_writes_full_narrow_and_errors(spark, tmp_path):
    maf = _write(str(tmp_path), "upload.maf", MAF_TEXT)
    vcf = _write(str(tmp_path), "GENIE-SAGE-3-1.vcf", VCF_TEXT)
    out_dir = str(tmp_path / "staging")

    full = process_mutation_workflow(
        spark, CENTER, maf_paths=[maf], vcf_paths=[vcf], out_dir=out_dir
    )
    assert full.count() == 3  # 2 maf rows + 1 vcf row

    files = set(os.listdir(out_dir))
    assert f"data_mutations_extended_{CENTER}.txt" in files
    assert f"data_mutations_extended_{CENTER}_MAF_narrow.txt" in files
    assert "failed_annotations_error_report.txt" in files

    narrow = narrow_maf(full)
    assert "Annotation_Status" in narrow.columns
    assert "genomic_location_explanation" not in narrow.columns

    from genie_spark.release.mutation import annotation_error_report

    report = annotation_error_report(full, CENTER)
    qc = check_annotation_counts(full, report)
    assert qc == {"maf_failed": 1, "report_rows": 1, "match": True}


def test_lookup_annotator_e2e(spark, tmp_path):
    """Non-identity annotator behind the AnnotatorFn boundary: a
    broadcast lookup table annotates matched variants, unmatched or
    coordinate-less variants come back FAILED, and the narrow/full
    split + error report flow through unchanged (reference
    genie/process_mutation.py:312-362 error-report QC)."""
    from genie_spark.release.mutation import (
        annotation_error_report,
        lookup_annotator,
    )

    maf = _write(str(tmp_path), "upload.maf", MAF_TEXT)
    lookup = spark.createDataFrame(
        [("17", "7578406", "C", "T", "p.R175H", "missense_variant")],
        "Chromosome string, Start_Position string, Reference_Allele string, "
        "Tumor_Seq_Allele2 string, HGVSp_Short string, Consequence string",
    )
    full = process_mutation_workflow(
        spark, CENTER, maf_paths=[maf],
        out_dir=str(tmp_path / "staging"),
        annotator=lookup_annotator(lookup),
    )
    rows = {r["Tumor_Sample_Barcode"]: r for r in full.collect()}
    hit = rows["GENIE-SAGE-1-1"]
    assert hit["Annotation_Status"] == "SUCCESS"
    assert hit["HGVSp_Short"] == "p.R175H"
    assert hit["Consequence"] == "missense_variant"
    # the KRAS row has a null Start_Position → invalid location
    miss = rows["GENIE-SAGE-2-1"]
    assert miss["Annotation_Status"] == "FAILED"
    assert miss["genomic_location_explanation"] == "invalid genomic location"
    assert miss["HGVSp_Short"] is None

    report = annotation_error_report(full, CENTER)
    qc = check_annotation_counts(full, report)
    assert qc["match"] and qc["maf_failed"] == 1

    # a duplicate-keyed lookup table must not fan out maf rows
    dup_lookup = lookup.unionAll(
        lookup.withColumn("HGVSp_Short", lookup.HGVSp_Short)
    )
    full_dup = process_mutation_workflow(
        spark, CENTER, maf_paths=[maf],
        annotator=lookup_annotator(dup_lookup),
    )
    assert full_dup.count() == full.count()

    # a coordinate-complete variant absent from the table also FAILs
    full2 = process_mutation_workflow(
        spark, CENTER, maf_paths=[maf],
        annotator=lookup_annotator(lookup.limit(0)),
    )
    assert (
        full2.where(
            full2.genomic_location_explanation
            == "variant not found by annotator"
        ).count()
        == 1
    )
