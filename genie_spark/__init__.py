"""genie_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the Sage-Bionetworks/Genie pipeline.

The reference (/root/reference, AACR Project GENIE `aacrgenie`) is a
pandas/R batch ETL pipeline: validate center uploads, process/normalize
into central tables, and publish filtered consortium releases.  This
package re-expresses every dataflow operator in that pipeline as an
idiomatic Spark DataFrame transformation (see SURVEY.md §2 for the
operator-by-operator map), plus the large-scale training-data operators
(dedup, similarity search, text analysis) a 100 TB deployment needs.

Layout:
    session     SparkSession builder tuned for the workload
    schemas     StructType per Genie file format
    io          readers (TSV/MAF/VCF/BED/CNA/SEG/SV/assay) and writers
    functions   scalar helpers (sentinel-aware casts, GENIE ids, PHI redaction)
    operators   joins / filters / aggregations / windows / upsert / intervals
    rules       declarative validation-rule engine + per-format rule sets
    release     release filter DAG (MAFinBED, mutation-in-cis, germline, ...)
    analytics   dashboards, dedup, similarity search, text analysis
    streaming   incremental ingestion via Structured Streaming
"""

__version__ = "0.1.0"
