"""Large-scale training-data analytics: deduplication, similarity
search, text analysis, multimodal plumbing.

These extend the Genie-parity engine with the operations a 100 TB
training-data pipeline needs (not present in the reference, which is a
genomics ETL).  Everything is built from JVM-side column expressions —
no row-at-a-time Python — so whole-stage codegen applies.
"""
