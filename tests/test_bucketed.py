"""Bucketed-table co-location: the join on the bucket key must plan
without an Exchange (the 100 TB repeated-join strategy)."""

from __future__ import annotations

import pytest

from genie_spark.io.bucketed import colocated_join, physical_plan, write_bucketed


@pytest.fixture
def bucket_db(spark, tmp_path):
    db = "bucket_test_db"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path}/wh'")
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucket_db):
    clinical = spark.range(0, 1000).selectExpr(
        "concat('GENIE-SAGE-', id) AS SAMPLE_ID", "id % 7 AS ONCOTREE"
    )
    maf = spark.range(0, 5000).selectExpr(
        "concat('GENIE-SAGE-', id % 1000) AS SAMPLE_ID", "id AS variant"
    )
    write_bucketed(clinical, f"{bucket_db}.clinical_b", "SAMPLE_ID", 8)
    write_bucketed(maf, f"{bucket_db}.maf_b", "SAMPLE_ID", 8)

    # broadcast would bypass the shuffle question entirely — force SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(
            spark, f"{bucket_db}.maf_b", f"{bucket_db}.clinical_b", "SAMPLE_ID"
        )
        plan = physical_plan(joined)
        assert "Exchange" not in plan, plan

        # sanity: the same join over raw (unbucketed) frames DOES shuffle
        raw = maf.join(clinical, "SAMPLE_ID")
        assert "Exchange" in physical_plan(raw)

        # and it still computes the right thing
        assert joined.count() == 5000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_band_store_join_store_side_exchange_free(spark, bucket_db):
    """The incremental-dedup candidate join against a bucketBy(bsig)
    band store must not shuffle the store: the only Exchange in the
    plan is the (batch-sized) new side."""
    from pyspark.sql import functions as F

    from genie_spark.analytics.dedup import (
        band_keys,
        bucketed_band_candidates,
        minhash_docinfo,
        write_band_store,
    )

    docs = spark.createDataFrame(
        [(i, f"stored document number {i} shares a long common tail of text")
         for i in range(50)],
        ["doc_id", "text"],
    )
    info = minhash_docinfo(docs)
    write_band_store(info, f"{bucket_db}.sig_bands", n_buckets=8)

    batch = spark.createDataFrame(
        [(100, "stored document number 7 shares a long common tail of text")],
        ["doc_id", "text"],
    )
    new_bands = band_keys(minhash_docinfo(batch))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cand = bucketed_band_candidates(spark, f"{bucket_db}.sig_bands", new_bands)
        plan = physical_plan(cand)
        # structural pin: exactly ONE Exchange keyed on bsig — the
        # batch side's; a store-side shuffle would make it two (the
        # store scan must feed the join straight from its buckets)
        assert plan.count("Exchange hashpartitioning(bsig") == 1, plan
        # and the planted near-dup is found
        assert cand.count() >= 1
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
