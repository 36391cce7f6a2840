"""Per-format processing transform tests (reference process_steps
semantics: clinical remap clinical.py:321-382, bed symbol remap
bed.py:250-393, feature classification bed.py:131-247)."""

from __future__ import annotations

from genie_spark.transform import (
    classify_feature_type,
    remap_bed_symbols,
    remap_clinical_values,
)


def test_remap_clinical_values(spark):
    df = spark.createDataFrame(
        [("P1", "1", "99"), ("P2", "2", "7")],
        ["PATIENT_ID", "SEX", "ETHNICITY"],
    )
    got = {r["PATIENT_ID"]: (r["SEX"], r["ETHNICITY"])
           for r in remap_clinical_values(df).collect()}
    assert got["P1"] == ("Male", "Unknown")
    # unmapped code passes through by default
    assert got["P2"] == ("Female", "7")


def test_remap_bed_symbols(spark):
    bed = spark.createDataFrame(
        [
            # fully inside TP53 → remap
            ("1", 105, 195, "OLDNAME"),
            # overlaps nothing → null symbol
            ("1", 5000, 5100, "NOWHERE"),
        ],
        ["Chromosome", "Start_Position", "End_Position", "Hugo_Symbol"],
    )
    genes = spark.createDataFrame(
        [("TP53", "1", 100, 200), ("EGFR", "1", 300, 400)],
        ["hugo_symbol", "chromosome", "start_position", "end_position"],
    )
    got = {r["ID"]: r["Hugo_Symbol"] for r in remap_bed_symbols(bed, genes).collect()}
    assert got == {"OLDNAME": "TP53", "NOWHERE": None}


def test_classify_feature_type(spark):
    bed = spark.createDataFrame(
        [
            ("1", 100, 120),   # overlaps exon
            ("1", 150, 180),   # inside gene, outside exon → intron
            ("1", 5000, 5100), # intergenic
            ("1", 95, 101),    # clips exon start → exon (any overlap)
        ],
        ["Chromosome", "Start_Position", "End_Position"],
    )
    exons = spark.createDataFrame(
        [("1", 100, 130)], ["Chromosome", "Start_Position", "End_Position"]
    )
    genes = spark.createDataFrame(
        [("1", 100, 400)], ["Chromosome", "Start_Position", "End_Position"]
    )
    got = {
        (r["Start_Position"], r["End_Position"]): r["Feature_Type"]
        for r in classify_feature_type(bed, exons, genes).collect()
    }
    assert got == {
        (100, 120): "exon",
        (150, 180): "intron",
        (5000, 5100): "intergenic",
        (95, 101): "exon",
    }


def test_update_clinical_values(spark):
    from genie_spark.transform import update_clinical_values

    df = spark.createDataFrame(
        [
            ("GENIE-SAGE-1", " 1950.0 ", "sage_panel_1", "jan-2017", "Unknown"),
            ("GENIE-SAGE-2", ">89", "SAGE-P2", "Release", "20000"),
        ],
        ["PATIENT_ID", "BIRTH_YEAR", "SEQ_ASSAY_ID", "SEQ_DATE", "INT_CONTACT"],
    )
    rows = {r["PATIENT_ID"]: r for r in update_clinical_values(df).collect()}
    r1 = rows["GENIE-SAGE-1"]
    assert r1["BIRTH_YEAR"] == "1950"          # trimmed + float-canonical
    assert r1["SEQ_ASSAY_ID"] == "SAGE-PANEL-1"  # _ → -, uppercased
    assert r1["SEQ_DATE"] == "Jan-2017"
    assert r1["SEQ_YEAR"] == 2017
    r2 = rows["GENIE-SAGE-2"]
    assert r2["BIRTH_YEAR"] == ">89"           # sentinel untouched
    assert r2["SEQ_YEAR"] is None              # Release sentinel
