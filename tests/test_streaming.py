"""Structured Streaming ingestion test: two availableNow passes over a
center drop dir — new files upsert, checkpoint skips processed files."""

from __future__ import annotations

from pyspark.sql import types as T

from genie_spark.streaming.ingest import run_ingest_once

SCHEMA = T.StructType(
    [
        T.StructField("SAMPLE_ID", T.StringType()),
        T.StructField("PATIENT_ID", T.StringType()),
        T.StructField("AGE", T.StringType()),
    ]
)


def test_streaming_ingest_upsert(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    target = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")

    (drop / "upload1.tsv").write_text(
        "SAMPLE_ID\tPATIENT_ID\tAGE\nS1\tP1\t100\nS2\tP1\t200\n"
    )
    run_ingest_once(spark, str(drop), target, ckpt, SCHEMA, keys=["SAMPLE_ID"])
    got = {r["SAMPLE_ID"]: r["AGE"] for r in spark.read.parquet(target).collect()}
    assert got == {"S1": "100", "S2": "200"}

    # second drop: updates S2, adds S3; upload1 already processed
    (drop / "upload2.tsv").write_text(
        "SAMPLE_ID\tPATIENT_ID\tAGE\nS2\tP1\t250\nS3\tP2\t300\n"
    )
    run_ingest_once(spark, str(drop), target, ckpt, SCHEMA, keys=["SAMPLE_ID"])
    got = {r["SAMPLE_ID"]: r["AGE"] for r in spark.read.parquet(target).collect()}
    assert got == {"S1": "100", "S2": "250", "S3": "300"}
