"""Explicit StructTypes + domains per Genie file format.

The reference infers dtypes with pandas and enforces shape via
validators (SURVEY.md §1.3); Spark-first we fix schema-on-read and keep
the sentinel-bearing clinical columns as strings (they mix integers
with markers like "Unknown" and ">32485" —
genie_registry/clinical.py:940-962).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# domains (reference citations inline)
# ---------------------------------------------------------------------------

# genie/validate.py:22
VALID_CHROMOSOMES = [str(i) for i in range(1, 23)] + ["X", "Y", "MT"]

# genie_registry/cna.py:211-227
CNA_VALUES = [-2.0, -1.5, -1.0, -0.5, 0.0, 0.5, 1.0, 1.5, 2.0]

# genie_registry/structural_variant.py:176-275
SV_REGIONS = [
    "5_prime_UTR", "3_prime_UTR", "promoter", "exon", "intron", "intergenic",
]
NCBI_BUILDS = ["GRCh37", "GRCh38"]
BREAKPOINT_TYPES = ["PRECISE", "IMPRECISE"]
CONNECTION_TYPES = ["3to5", "5to3", "5to5", "3to3"]
SUPPORT_VALUES = ["Yes", "No", "Unknown"]

# genie_registry/clinical.py:1225-1234
SAMPLE_CLASSES = ["Tumor", "cfDNA"]

# genie/database_to_staging.py:109-233 + clinical sentinels
INT_SENTINELS = [">32485", "<6570", "Unknown", "Not Collected", "Not Released"]
INT_SENTINELS_DOD = INT_SENTINELS + ["Not Applicable"]
YEAR_SENTINELS = ["Unknown", "Not Collected", "Not Released", ">89", "<18"]
YEAR_SENTINELS_DEATH = YEAR_SENTINELS + ["Not Applicable"]
DEAD_VALUES = ["True", "False", "Unknown", "Not Collected", "Not Released"]

# code→label maps (reference fetches these from Synapse tables,
# genie_registry/clinical.py:321-382; frozen here as the public GENIE
# data dictionary values)
SEX_CODES = {1: "Male", 2: "Female", 99: "Unknown"}
RACE_CODES = {1: "White", 2: "Black", 3: "Asian", 4: "Other", 99: "Unknown"}
ETHNICITY_CODES = {1: "Non-Spanish/non-Hispanic", 2: "Spanish/Hispanic", 99: "Unknown"}
SAMPLE_TYPE_CODES = {1: "Primary", 2: "Metastasis", 3: "Local Recurrence", 8: "cfDNA", 99: "Unknown"}

# ---------------------------------------------------------------------------
# schemas
# ---------------------------------------------------------------------------


def _s(name: str, dtype=T.StringType()) -> T.StructField:
    return T.StructField(name, dtype, True)


CLINICAL_SAMPLE_SCHEMA = T.StructType(
    [
        _s("SAMPLE_ID"),
        _s("PATIENT_ID"),
        _s("AGE_AT_SEQ_REPORT"),     # int-or-sentinel → string
        _s("ONCOTREE_CODE"),
        _s("SAMPLE_TYPE"),
        _s("SEQ_ASSAY_ID"),
        _s("SAMPLE_CLASS"),
    ]
)

CLINICAL_PATIENT_SCHEMA = T.StructType(
    [
        _s("PATIENT_ID"),
        _s("SEX"),
        _s("PRIMARY_RACE"),
        _s("SECONDARY_RACE"),
        _s("TERTIARY_RACE"),
        _s("ETHNICITY"),
        _s("BIRTH_YEAR"),
        _s("YEAR_CONTACT"),
        _s("YEAR_DEATH"),
        _s("INT_CONTACT"),
        _s("INT_DOD"),
        _s("DEAD"),
        _s("CENTER"),
    ]
)

# required headers genie_registry/maf.py:229-236; release columns add
# annotation fields (genie/database_to_staging.py:38-103)
MAF_REQUIRED = [
    "CHROMOSOME",
    "START_POSITION",
    "REFERENCE_ALLELE",
    "TUMOR_SAMPLE_BARCODE",
    "T_ALT_COUNT",
    "TUMOR_SEQ_ALLELE2",
]
MAF_SCHEMA = T.StructType(
    [
        _s("CHROMOSOME"),
        _s("START_POSITION"),
        _s("END_POSITION"),
        _s("REFERENCE_ALLELE"),
        _s("TUMOR_SEQ_ALLELE1"),
        _s("TUMOR_SEQ_ALLELE2"),
        _s("TUMOR_SAMPLE_BARCODE"),
        _s("T_DEPTH"),
        _s("T_REF_COUNT"),
        _s("T_ALT_COUNT"),
        _s("N_DEPTH"),
        _s("N_REF_COUNT"),
        _s("N_ALT_COUNT"),
    ]
)
# columns where the literal string "NA" is data, not null
# (genie_registry/maf.py:513-551)
MAF_ALLELE_COLS = ["REFERENCE_ALLELE", "TUMOR_SEQ_ALLELE1", "TUMOR_SEQ_ALLELE2"]
MAF_NA_STRINGS = ["NA", "nan", "NaN", ""]

VCF_REQUIRED = ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO"]

BED_SCHEMA = T.StructType(
    [
        _s("Chromosome"),
        T.StructField("Start_Position", T.LongType(), True),
        T.StructField("End_Position", T.LongType(), True),
        _s("Hugo_Symbol"),
        _s("includeInPanel"),
        _s("clinicalReported"),
    ]
)

SEG_SCHEMA = T.StructType(
    [
        _s("ID"),
        _s("CHROM"),
        T.StructField("LOC.START", T.LongType(), True),
        T.StructField("LOC.END", T.LongType(), True),
        T.StructField("NUM.MARK", T.LongType(), True),
        T.StructField("SEG.MEAN", T.DoubleType(), True),
    ]
)
SEG_REQUIRED = ["ID", "CHROM", "LOC.START", "LOC.END", "NUM.MARK", "SEG.MEAN"]

SV_REQUIRED = ["SAMPLE_ID", "SV_STATUS"]
SV_INT_COLS = [
    "SITE1_ENTREZ_GENE_ID", "SITE2_ENTREZ_GENE_ID", "SITE1_REGION_NUMBER",
    "SITE2_REGION_NUMBER", "SITE1_POSITION", "SITE2_POSITION",
    "TUMOR_SPLIT_READ_COUNT", "TUMOR_PAIRED_END_READ_COUNT", "SV_LENGTH",
    "NORMAL_READ_COUNT", "TUMOR_READ_COUNT", "NORMAL_VARIANT_COUNT",
    "TUMOR_VARIANT_COUNT",
]

# long-form CNA (wide gene×sample matrix is a write-time pivot —
# SURVEY.md §1.1)
CNA_LONG_SCHEMA = T.StructType(
    [
        _s("Hugo_Symbol"),
        _s("SAMPLE_ID"),
        T.StructField("value", T.DoubleType(), True),
    ]
)

ASSAY_REQUIRED = ["SEQ_ASSAY_ID"]
# GDC-derived enum domains (genie_registry/assay.py:131-427)
ASSAY_LIBRARY_SELECTION = ["Hybrid Selection", "PCR", "Affinity Enrichment", "Poly-T Enrichment", "Random"]
ASSAY_LIBRARY_STRATEGY = ["Targeted Sequencing", "WXS"]
ASSAY_PLATFORMS = ["Illumina", "SOLID", "LS454", "Ion Torrent", "Complete Genomics", "PacBio", "Other"]
