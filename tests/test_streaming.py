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


def test_windowed_counts_watermark(spark, tmp_path):
    from pyspark.sql import types as T

    from genie_spark.streaming.windows import windowed_counts

    src = tmp_path / "events"
    src.mkdir()
    (src / "e1.csv").write_text(
        "ts,event_type\n"
        "2026-01-01 10:05:00,click\n"
        "2026-01-01 10:20:00,click\n"
        "2026-01-01 10:40:00,view\n"
        "2026-01-01 11:10:00,click\n"
    )
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("event_type", T.StringType())]
    )
    stream = (
        spark.readStream.schema(schema).option("header", "true").csv(str(src))
    )
    agg = windowed_counts(stream, "ts", ["event_type"], window="1 hour")
    out = str(tmp_path / "out")

    def run_once():
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    # append mode emits only windows the watermark has closed; run a
    # second batch with a later event to close the 10:00 window
    (src / "e2.csv").write_text("ts,event_type\n2026-01-01 12:30:00,view\n")
    run_once()
    rows = {
        (r["window_start"].hour, r["event_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    assert rows[(10, "click")] == 2
    assert rows[(10, "view")] == 1
    assert rows[(11, "click")] == 1


def test_sessionize_state(spark, tmp_path):
    from pyspark.sql import types as T

    from genie_spark.streaming.windows import sessionize

    src = tmp_path / "sess"
    src.mkdir()
    # user A: two sessions separated by >30 min; user B: one session
    (src / "s1.csv").write_text(
        "user_id,ts\n"
        "A,2026-01-01 09:00:00\n"
        "A,2026-01-01 09:10:00\n"
        "A,2026-01-01 11:00:00\n"
        "B,2026-01-01 09:00:00\n"
    )
    schema = T.StructType(
        [T.StructField("user_id", T.StringType()), T.StructField("ts", T.TimestampType())]
    )
    stream = spark.readStream.schema(schema).option("header", "true").csv(str(src))
    sess = sessionize(stream, key_col="user_id", ts_col="ts", gap_seconds=1800)
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from sessions").collect()
    # only A's first session has closed (gap before 11:00 event)
    assert len(rows) == 1
    r = rows[0]
    assert r["key"] == "A" and r["n_events"] == 2
    assert r["session_end"] - r["session_start"] == 600


def test_dedup_stream_within_watermark(spark, tmp_path):
    from pyspark.sql import types as T

    from genie_spark.streaming.windows import dedup_stream

    src = tmp_path / "uploads"
    src.mkdir()
    # same sample re-uploaded twice inside the watermark window
    (src / "u1.csv").write_text(
        "ts,sample_id\n"
        "2026-01-01 10:00:00,GENIE-SAGE-1-1\n"
        "2026-01-01 10:01:00,GENIE-SAGE-1-1\n"
        "2026-01-01 10:02:00,GENIE-SAGE-2-1\n"
    )
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("sample_id", T.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).option("header", "true").csv(str(src))
    deduped = dedup_stream(stream, ["sample_id"], "ts", watermark="10 minutes")
    out = str(tmp_path / "out")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ids = sorted(r["sample_id"] for r in spark.read.parquet(out).collect())
    assert ids == ["GENIE-SAGE-1-1", "GENIE-SAGE-2-1"]


def test_near_dup_stream_against_store(spark, tmp_path):
    """Two micro-batches through the signature store: batch2's
    near-dups against batch1 are found WITHOUT re-reading batch1's
    text (the store holds signatures only), and the store absorbs
    each batch."""
    from pyspark.sql import types as T

    from genie_spark.streaming.windows import near_dup_stream

    base = "the quick brown fox jumps over the lazy dog and runs far away today "
    src = tmp_path / "docs_in"
    src.mkdir()
    store = str(tmp_path / "sigstore")
    pairs_out = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )

    def run_batch(name, rows):
        import json as _json

        with open(src / name, "w") as f:
            for did, text in rows:
                f.write(_json.dumps({"doc_id": did, "text": text}) + "\n")
        stream = spark.readStream.schema(schema).json(str(src))
        q = near_dup_stream(stream, store, pairs_out, ckpt)
        q.awaitTermination()

    run_batch("b1.json", [(1, base * 3), (2, base * 3), (3, "x y z " * 30)])
    run_batch("b2.json", [(10, base * 3 + " tail"), (11, "totally new words here " * 10)])

    store_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(store).select("doc_id").collect()
    )
    assert store_ids == [1, 2, 3, 10, 11]
    # store schema carries signatures, never text
    assert "text" not in spark.read.parquet(store).columns
    pairs = {
        (r["a"], r["b"]) for r in spark.read.parquet(pairs_out).collect()
    }
    assert (1, 2) in pairs          # batch1-internal dup
    assert (1, 10) in pairs and (2, 10) in pairs  # cross-batch near-dups
    assert not any(11 in p for p in pairs)


def test_sketch_stream_rolling_distinct(spark, tmp_path):
    """Two micro-batches of overlapping values: the merged store
    estimate equals the distinct UNION (exact under k), computed from
    k-long shards without re-reading batch 1's rows."""
    from pyspark.sql import types as T

    from genie_spark.analytics.sketches import kmv_merge
    from genie_spark.streaming.windows import sketch_stream

    src = tmp_path / "sk_in"
    src.mkdir()
    store = str(tmp_path / "sk_store")
    ckpt = str(tmp_path / "sk_ckpt")
    schema = T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )

    def run_batch(name, rows):
        import json as _json

        with open(src / name, "w") as f:
            for s, t in rows:
                f.write(_json.dumps({"source": s, "text": t}) + "\n")
        stream = spark.readStream.schema(schema).json(str(src))
        q = sketch_stream(stream, store, ckpt, k=64)
        q.awaitTermination()

    run_batch("b1.json", [("s", f"v{i}") for i in range(30)])
    run_batch("b2.json", [("s", f"v{i}") for i in range(20, 50)])  # 10 overlap

    shards = spark.read.parquet(store)
    assert shards.count() == 2                      # one sketch row per batch
    merged = kmv_merge(shards.drop("batch"), k=64).collect()[0]
    assert merged["n_seen"] == 50                   # distinct union, not 60
    assert merged["est_distinct"] == 50.0


def test_bloom_stream_store_matches_batch_build(spark, tmp_path):
    """Two micro-batches of benchmark docs: the union-distinct of the
    streamed Bloom store equals bloom_build over the concatenated
    batches (the mergeability property), and bloom_decontaminate
    against the store flags the overlapping corpus doc."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from genie_spark.analytics.corpus import bloom_build, bloom_decontaminate
    from genie_spark.streaming.windows import bloom_stream

    src = tmp_path / "bl_in"
    src.mkdir()
    store = str(tmp_path / "bl_store")
    ckpt = str(tmp_path / "bl_ckpt")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    b1 = [(1, " ".join(words))]
    b2 = [(2, " ".join(reversed(words)))]

    def run_batch(name, rows):
        import json as _json

        with open(src / name, "w") as f:
            for d, t in rows:
                f.write(_json.dumps({"doc_id": d, "text": t}) + "\n")
        stream = spark.readStream.schema(schema).json(str(src))
        q = bloom_stream(stream, store, ckpt, n=8, m_bits=1 << 16, k_hashes=3)
        q.awaitTermination()

    run_batch("b1.json", b1)
    run_batch("b2.json", b2)

    streamed = spark.read.parquet(store).select("pos").distinct()
    bench = spark.createDataFrame(b1 + b2, ["doc_id", "text"])
    direct = bloom_build(bench, n=8, m_bits=1 << 16, k_hashes=3)
    assert streamed.exceptAll(direct).count() == 0
    assert direct.exceptAll(streamed).count() == 0

    corpus = spark.createDataFrame(
        [(10, " ".join(words)), (11, "totally different words " * 4)],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in bloom_decontaminate(
            corpus, streamed, n=8, m_bits=1 << 16, k_hashes=3
        ).collect()
    }
    assert out[10]["is_flagged"] and out[10]["n_flagged"] == out[10]["n_ngrams"]
    assert not out[11]["is_flagged"]


def test_bloom_compact_preserves_positions(spark, tmp_path):
    """Compacting a multi-shard Bloom store into the reserved
    batch=-1 shard must preserve the exact distinct position set
    (reads before == after), shrink the shard count to one, and stay
    idempotent — and decontamination against the compacted store is
    unchanged (VERDICT r6 item 8)."""
    import os

    from genie_spark.analytics.corpus import bloom_build, bloom_decontaminate
    from genie_spark.streaming.windows import bloom_compact

    store = str(tmp_path / "bl_store")
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    batches = [
        [(1, " ".join(words))],
        [(2, " ".join(reversed(words)))],
        [(3, " ".join(words[3:] + words[:3]))],
    ]
    for bid, rows in enumerate(batches):
        bench = spark.createDataFrame(rows, ["doc_id", "text"])
        bloom_build(bench, n=8, m_bits=1 << 16, k_hashes=3).write.mode(
            "overwrite"
        ).parquet(f"{store}/batch={bid}")

    before = {
        r["pos"] for r in spark.read.parquet(store).select("pos").distinct().collect()
    }
    report = bloom_compact(spark, store)
    assert report["shards_before"] == 3
    after = {r["pos"] for r in spark.read.parquet(store).select("pos").collect()}
    assert after == before
    assert report["rows_after"] == len(after)
    shards = [e for e in os.listdir(store) if e.startswith("batch=")]
    assert shards == ["batch=-1"]
    # idempotent: compacting a compacted store is a no-op rewrite
    again = bloom_compact(spark, store)
    assert again["rows_after"] == len(after)
    assert {
        r["pos"] for r in spark.read.parquet(store).select("pos").collect()
    } == before

    # decontamination through the compacted store: identical verdicts
    corpus = spark.createDataFrame(
        [(10, " ".join(words)), (11, "totally different words " * 4)],
        ["doc_id", "text"],
    )
    merged = spark.read.parquet(store).select("pos")
    out = {
        r["doc_id"]: r
        for r in bloom_decontaminate(
            corpus, merged, n=8, m_bits=1 << 16, k_hashes=3
        ).collect()
    }
    assert out[10]["is_flagged"]
    assert not out[11]["is_flagged"]


def test_compact_store_aborts_on_concurrent_shard_write(spark, tmp_path):
    """A shard appearing between the compaction's store read and its
    whole-dir swap means a stream is still writing — the swap would
    silently delete that shard (ADVICE r7).  _compact_store must
    re-list just before the swap, raise, and leave the store's shard
    set untouched."""
    import os

    import pytest as _pytest

    from genie_spark.streaming.windows import _compact_store

    store = str(tmp_path / "cm_store")
    for bid in (0, 1):
        spark.createDataFrame(
            [(0, bid, 5)], "row int, bucket int, cnt long"
        ).write.mode("overwrite").parquet(f"{store}/batch={bid}")

    from pyspark.sql import functions as F

    def sneaky_merge(df):
        # a "still-running stream" lands a new shard mid-compaction
        spark.createDataFrame(
            [(0, 7, 1)], "row int, bucket int, cnt long"
        ).write.mode("overwrite").parquet(f"{store}/batch=2")
        return df.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))

    with _pytest.raises(RuntimeError, match="shard set changed"):
        _compact_store(spark, store, sneaky_merge)
    shards = sorted(e for e in os.listdir(store) if e.startswith("batch="))
    assert shards == ["batch=0", "batch=1", "batch=2"]
    # the store still reads whole and a clean retry compacts all three
    report = _compact_store(
        spark,
        store,
        lambda df: df.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt")),
    )
    assert report["shards_before"] == 3
    assert sorted(
        e for e in os.listdir(store) if e.startswith("batch=")
    ) == ["batch=-1"]


def test_count_min_stream_store_matches_batch_sketch(spark, tmp_path):
    """Two micro-batches: summing the streamed Count-Min store per
    (row, bucket) equals count_min_sketch over the concatenated
    batches (the associative merge law), lookups against the merged
    store honor the overestimate bound, and count_min_compact folds
    the shards into the bounded batch=-1 artifact."""
    import json as _json
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from genie_spark.analytics.sketches import (
        count_min_lookup,
        count_min_sketch,
    )
    from genie_spark.analytics.text import tokens
    from genie_spark.streaming.windows import count_min_compact, count_min_stream

    src = tmp_path / "cm_in"
    src.mkdir()
    store = str(tmp_path / "cm_store")
    ckpt = str(tmp_path / "cm_ckpt")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    b1 = [(1, "alpha beta alpha gamma"), (2, "beta beta delta")]
    b2 = [(3, "alpha epsilon epsilon zeta")]

    def run_batch(name, rows):
        with open(src / name, "w") as f:
            for d, t in rows:
                f.write(_json.dumps({"doc_id": d, "text": t}) + "\n")
        stream = spark.readStream.schema(schema).json(str(src))
        q = count_min_stream(stream, store, ckpt, width=256, depth=3)
        q.awaitTermination()

    run_batch("b1.json", b1)
    run_batch("b2.json", b2)

    streamed = (
        spark.read.parquet(store)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    all_docs = spark.createDataFrame(b1 + b2, ["doc_id", "text"])
    occ = all_docs.select(F.explode(tokens("text")).alias("value"))
    direct = count_min_sketch(occ, "value", width=256, depth=3)
    assert sorted(tuple(r) for r in streamed.collect()) == sorted(
        tuple(r) for r in direct.collect()
    )

    probes = spark.createDataFrame(
        [("alpha",), ("beta",), ("never",)], ["value"]
    )
    est = {
        r["value"]: r["est_count"]
        for r in count_min_lookup(
            streamed, probes, "value", width=256, depth=3
        ).collect()
    }
    assert est["alpha"] >= 3 and est["beta"] >= 3
    assert est["never"] >= 0

    report = count_min_compact(spark, store)
    assert report["shards_before"] == 2
    shards = [e for e in os.listdir(store) if e.startswith("batch=")]
    assert shards == ["batch=-1"]
    compacted = spark.read.parquet(store).select("row", "bucket", "cnt")
    assert sorted(tuple(r) for r in compacted.collect()) == sorted(
        tuple(r) for r in direct.collect()
    )


def test_stream_stream_join_time_bound(spark, tmp_path):
    """Watermarked stream-stream join: validation results pair with
    upload events for the same (center, fname) only within the delay
    bound; a result outside the bound never matches; left_outer emits
    the unmatched upload with null result once the watermark closes."""
    from pyspark.sql import types as T

    from genie_spark.streaming.windows import stream_stream_join

    up_dir, res_dir = tmp_path / "up", tmp_path / "res"
    up_dir.mkdir(), res_dir.mkdir()
    (up_dir / "u1.csv").write_text(
        "center,fname,uts\n"
        "SAGE,clin.txt,2026-01-01 10:00:00\n"
        "GOLD,maf.txt,2026-01-01 10:00:00\n"
        "SAGE,cna.txt,2026-01-01 10:02:00\n"
    )
    (res_dir / "r1.csv").write_text(
        "center,fname,rts,status\n"
        "SAGE,clin.txt,2026-01-01 10:05:00,VALID\n"      # within 10 min
        "GOLD,maf.txt,2026-01-01 11:30:00,VALID\n"       # outside bound
        "SAGE,other.txt,2026-01-01 10:01:00,INVALID\n"   # key mismatch
    )
    up_schema = T.StructType(
        [
            T.StructField("center", T.StringType()),
            T.StructField("fname", T.StringType()),
            T.StructField("uts", T.TimestampType()),
        ]
    )
    res_schema = T.StructType(
        [
            T.StructField("center", T.StringType()),
            T.StructField("fname", T.StringType()),
            T.StructField("rts", T.TimestampType()),
            T.StructField("status", T.StringType()),
        ]
    )

    def run(how, out_name, ckpt_name):
        ups = spark.readStream.schema(up_schema).option("header", "true").csv(
            str(up_dir)
        )
        res = spark.readStream.schema(res_schema).option("header", "true").csv(
            str(res_dir)
        )
        j = stream_stream_join(
            ups, res, on=["center", "fname"], left_ts="uts", right_ts="rts",
            max_delay_seconds=600, watermark="5 minutes", how=how,
        )
        out = str(tmp_path / out_name)
        q = (
            j.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / ckpt_name))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return out

    out = run("inner", "inner_out", "inner_ckpt")
    rows = {
        (r["center"], r["fname"], r["r_status"])
        for r in spark.read.parquet(out).collect()
    }
    assert rows == {("SAGE", "clin.txt", "VALID")}

    # left_outer: late rows advance the watermark past the unmatched
    # uploads' windows, then a second pass emits them with null status
    out2 = run("left_outer", "outer_out", "outer_ckpt")
    (up_dir / "u2.csv").write_text("center,fname,uts\nX,late.txt,2026-01-01 13:00:00\n")
    (res_dir / "r2.csv").write_text(
        "center,fname,rts,status\nX,late.txt,2026-01-01 13:00:01,VALID\n"
    )
    run("left_outer", "outer_out", "outer_ckpt")
    got = {
        (r["center"], r["fname"], r["r_status"])
        for r in spark.read.parquet(out2).collect()
    }
    assert ("SAGE", "clin.txt", "VALID") in got
    assert ("GOLD", "maf.txt", None) in got       # matched nothing in bound
    assert ("SAGE", "cna.txt", None) in got


def test_stream_stream_join_guards_and_keyless(spark, tmp_path):
    """Robustness guards (code-review r7): negative/fractional delay,
    prefix collisions, and an empty `on` list all raise up front with
    clear messages (Spark itself rejects keyless stream-stream joins,
    and the pre-fix code built a silently-null predicate instead)."""
    import pytest as pt
    from pyspark.sql import types as T

    from genie_spark.streaming.windows import stream_stream_join

    schema_l = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("uts", T.TimestampType()),
        ]
    )
    schema_r = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("rts", T.TimestampType()),
            T.StructField("status", T.StringType()),
        ]
    )
    l_dir, r_dir = tmp_path / "l", tmp_path / "r"
    l_dir.mkdir(), r_dir.mkdir()
    (l_dir / "a.csv").write_text(
        "k,uts\nA,2026-01-01 10:00:00\nB,2026-01-01 12:00:00\n"
    )
    (r_dir / "a.csv").write_text(
        "k,rts,status\nZ,2026-01-01 10:03:00,VALID\n"
    )
    ls = spark.readStream.schema(schema_l).option("header", "true").csv(str(l_dir))
    rs = spark.readStream.schema(schema_r).option("header", "true").csv(str(r_dir))

    with pt.raises(ValueError, match="non-negative int"):
        stream_stream_join(ls, rs, on=["k"], left_ts="uts", right_ts="rts",
                           max_delay_seconds=-600)
    with pt.raises(ValueError, match="non-negative int"):
        stream_stream_join(ls, rs, on=["k"], left_ts="uts", right_ts="rts",
                           max_delay_seconds=0.5)

    # collision: left already carries the prefixed name
    ls_bad = ls.withColumn("r_status", ls["k"])
    with pt.raises(ValueError, match="collide"):
        stream_stream_join(ls_bad, rs, on=["k"], left_ts="uts", right_ts="rts")

    # keyless: Spark cannot execute a stream-stream join without an
    # equality predicate — raise the clear wrapper error, never the
    # silently-null predicate the pre-fix code built
    with pt.raises(ValueError, match="at least one equi-key"):
        stream_stream_join(ls, rs, on=[], left_ts="uts", right_ts="rts")


def test_hll_stream_store_matches_batch_sketch(spark, tmp_path):
    """Two micro-batches: max-merging the streamed HLL store per
    (group, reg) equals hll_sketch over the concatenated batches (the
    idempotent merge law), the estimate from the merged store matches
    the batch estimate exactly, and hll_compact folds the shards into
    the bounded batch=-1 artifact."""
    import os

    from pyspark.sql import functions as F

    from genie_spark.analytics.sketches import hll_estimate, hll_sketch
    from genie_spark.analytics.text import tokens
    from genie_spark.streaming.windows import hll_compact, hll_stream

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    store = str(tmp_path / "hll_store")
    ckpt = str(tmp_path / "ckpt")
    (in_dir / "b1.csv").write_text(
        "source,text\nwiki,alpha beta gamma delta\nweb,one two three\n"
    )
    q = hll_stream(
        spark.readStream.schema("source string, text string")
        .option("header", "true").csv(str(in_dir)),
        store, ckpt,
    )
    q.awaitTermination()
    (in_dir / "b2.csv").write_text(
        "source,text\nwiki,gamma delta epsilon zeta\nweb,three four\n"
    )
    q = hll_stream(
        spark.readStream.schema("source string, text string")
        .option("header", "true").csv(str(in_dir)),
        store, ckpt,
    )
    q.awaitTermination()

    merged = (
        spark.read.parquet(store)
        .groupBy("source", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    batch_docs = spark.createDataFrame(
        [
            ("wiki", "alpha beta gamma delta"),
            ("web", "one two three"),
            ("wiki", "gamma delta epsilon zeta"),
            ("web", "three four"),
        ],
        "source string, text string",
    )
    occ = batch_docs.select("source", F.explode(tokens("text")).alias("value"))
    batch_sk = hll_sketch(occ, "source", "value")
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in batch_sk.collect()
    }
    est_stream = {
        r["source"]: r["est_distinct"]
        for r in hll_estimate(merged, "source").collect()
    }
    est_batch = {
        r["source"]: r["est_distinct"]
        for r in hll_estimate(batch_sk, "source").collect()
    }
    assert est_stream == est_batch

    report = hll_compact(spark, store)
    assert report["shards_before"] == 2
    shards = [e for e in os.listdir(store) if e.startswith("batch=")]
    assert shards == ["batch=-1"]
    compacted = (
        spark.read.parquet(store)
        .groupBy("source", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    assert {tuple(r) for r in compacted.collect()} == {
        tuple(r) for r in batch_sk.collect()
    }


def test_compact_store_aborts_on_shard_rewrite(spark, tmp_path):
    """An IN-PLACE rewrite of an existing batch=<id> shard (a
    replaying stream rewrites its own directory — no name change)
    must also abort the compaction: the listing includes per-shard
    content mtimes (code-review r8)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from genie_spark.streaming.windows import _compact_store

    store = str(tmp_path / "cm_store")
    for bid in (0, 1):
        spark.createDataFrame(
            [(0, bid, 5)], "row int, bucket int, cnt long"
        ).write.mode("overwrite").parquet(f"{store}/batch={bid}")

    def rewriting_merge(df):
        # materialize BEFORE the rewrite so the staging write doesn't
        # re-scan the store (a rewrite mid-scan fails the read outright
        # — also an abort, but this test pins the mtime detection)
        rows = (
            df.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt")).collect()
        )
        # replay: batch 1 rewritten in place, same name
        spark.createDataFrame(
            [(0, 1, 99)], "row int, bucket int, cnt long"
        ).write.mode("overwrite").parquet(f"{store}/batch=1")
        return spark.createDataFrame(rows, "row int, bucket int, cnt long")

    with _pytest.raises(RuntimeError, match="rewritten"):
        _compact_store(spark, store, rewriting_merge)
    # the replay's shard survived untouched
    assert {
        r["cnt"] for r in spark.read.parquet(f"{store}/batch=1").collect()
    } == {99}


def test_near_dup_stream_durable_txnlog_store(spark, tmp_path):
    """Durable variant: the txnlog store absorbs each batch with
    bucket-scoped commits; a re-delivered IDENTICAL doc is a no-op
    (no duplicate store row, no duplicate pairs), and a re-delivered
    CHANGED doc replaces its signature and is re-compared — the
    contract the plain parquet-dir variant cannot give."""
    from pyspark.sql import types as T

    from genie_spark.analytics.signature_store import read_docinfo_store
    from genie_spark.streaming.windows import near_dup_stream_durable

    base = "the quick brown fox jumps over the lazy dog and runs far away today "
    src = tmp_path / "docs_in"
    src.mkdir()
    store = str(tmp_path / "sigstore")
    pairs_out = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )

    def run_batch(name, rows):
        import json as _json

        with open(src / name, "w") as f:
            for did, text in rows:
                f.write(_json.dumps({"doc_id": did, "text": text}) + "\n")
        stream = spark.readStream.schema(schema).json(str(src))
        q = near_dup_stream_durable(stream, store, pairs_out, ckpt)
        q.awaitTermination()

    run_batch("b1.json", [(1, base * 3), (2, base * 3), (3, "x y z " * 30)])
    # batch 2: one new near-dup, one re-delivered IDENTICAL doc (2),
    # one re-delivered CHANGED doc (3 — now a near-dup of 1)
    run_batch(
        "b2.json",
        [(10, base * 3 + " tail"), (2, base * 3), (3, base * 3 + " changed")],
    )

    info = read_docinfo_store(spark, store)
    assert sorted(r["doc_id"] for r in info.collect()) == [1, 2, 3, 10]
    assert info.count() == 4  # one row per id — changed doc REPLACED
    pairs = {
        (r["a"], r["b"]) for r in spark.read.parquet(pairs_out).collect()
    }
    assert (1, 2) in pairs            # batch1-internal dup
    assert (1, 10) in pairs           # cross-batch near-dup
    assert (1, 3) in pairs            # CHANGED doc re-compared
    # the re-delivered identical doc 2 creates no second (1, 2) row:
    # pairs dirs are per-batch; total (1,2) occurrences must be 1
    from pyspark.sql import functions as SF

    n_12 = (
        spark.read.parquet(pairs_out)
        .where((SF.col("a") == 1) & (SF.col("b") == 2))
        .count()
    )
    assert n_12 == 1


def test_winnow_stream_durable_store(spark, tmp_path):
    """Durable MOSS streaming: batches upsert the winnow store; pairs
    report new↔new and new↔store with batch-equal n_shared; identical
    re-delivery is a no-op; a changed doc replaces and re-compares."""
    from pyspark.sql import functions as SF
    from pyspark.sql import types as T

    from genie_spark.analytics.dedup import winnow_dup_pairs
    from genie_spark.analytics.signature_store import read_winnow_store
    from genie_spark.streaming.windows import winnow_stream_durable

    base = "the quick brown fox jumps over the lazy dog and runs far away today "
    src = tmp_path / "docs_in"
    src.mkdir()
    store = str(tmp_path / "winstore")
    pairs_out = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )

    def run_batch(name, rows):
        import json as _json

        with open(src / name, "w") as f:
            for did, text in rows:
                f.write(_json.dumps({"doc_id": did, "text": text}) + "\n")
        stream = spark.readStream.schema(schema).json(str(src))
        q = winnow_stream_durable(stream, store, pairs_out, ckpt, min_shared=2)
        q.awaitTermination()

    run_batch("b1.json", [(1, base * 3), (2, base * 3), (3, "x y z " * 30)])
    run_batch(
        "b2.json",
        [(10, base * 3 + " tail words"), (2, base * 3)],
    )

    info = read_winnow_store(spark, store)
    assert sorted(r["doc_id"] for r in info.collect()) == [1, 2, 3, 10]
    pairs = spark.read.parquet(pairs_out)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (1, 2) in got          # batch1-internal
    assert (1, 10) in got and (2, 10) in got  # cross-batch
    # identical re-delivery of doc 2 adds no second (1, 2) row
    assert pairs.where((SF.col("a") == 1) & (SF.col("b") == 2)).count() == 1
    # n_shared parity with the batch operator over the final corpus
    final = spark.createDataFrame(
        [(1, base * 3), (2, base * 3), (3, "x y z " * 30),
         (10, base * 3 + " tail words")],
        ["doc_id", "text"],
    )
    want = {
        (r["a"], r["b"]): r["n_shared"]
        for r in winnow_dup_pairs(final, min_shared=2).collect()
    }
    got_shared = {(r["a"], r["b"]): r["n_shared"] for r in pairs.collect()}
    for key, n in got_shared.items():
        assert want.get(key) == n, (key, n, want.get(key))


def test_domain_cap_stream_caps_across_batches(spark, tmp_path):
    """X65: the per-domain counter persists across micro-batches —
    earlier batches consume the cap first (arrival order), within a
    batch the (md5(id), id) tie rule orders admission, and a full
    domain admits nothing further; admit_rank is dense per domain."""
    import hashlib
    import os

    from pyspark.sql import types as T

    from genie_spark.streaming.windows import domain_cap_stream

    src = tmp_path / "docs"
    src.mkdir()
    # batch 1: HOT has 3 docs (cap 4 → all admitted), cold has 1
    (src / "b1.csv").write_text(
        "source,doc_id\nHOT,1\nHOT,2\nHOT,3\ncold,100\n"
    )
    # batch 2: HOT has 3 more (only 1 seat left), cold has 1
    (src / "b2.csv").write_text(
        "source,doc_id\nHOT,4\nHOT,5\nHOT,6\ncold,101\n"
    )
    os.utime(src / "b1.csv", (1000000000, 1000000000))
    os.utime(src / "b2.csv", (1000000100, 1000000100))
    schema = T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("doc_id", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("header", "true")
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    capped = domain_cap_stream(stream, max_per_group=4)
    q = (
        capped.writeStream.format("memory")
        .queryName("capped")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from capped").collect()
    hot = sorted(
        (r["admit_rank"], r["doc_id"]) for r in rows if r["source"] == "HOT"
    )
    cold = sorted(
        (r["admit_rank"], r["doc_id"]) for r in rows if r["source"] == "cold"
    )
    # HOT: all of batch 1 (ranks 1-3 in md5 order), ONE from batch 2
    assert len(hot) == 4 and [rk for rk, _ in hot] == [1, 2, 3, 4]
    assert {d for _, d in hot[:3]} == {1, 2, 3}
    b1_order = sorted(
        [1, 2, 3],
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest()[:8], i),
    )
    assert [d for _, d in hot[:3]] == b1_order
    b2_first = sorted(
        [4, 5, 6],
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest()[:8], i),
    )[0]
    assert hot[3][1] == b2_first
    # cold never hits the cap
    assert [d for _, d in cold] == [100, 101]


def test_token_budget_stream_whole_doc_admission(spark, tmp_path):
    """X68: cumulative token budgets persist across micro-batches,
    documents are admitted whole (the straddling doc overshoots, the
    batch operator's greedy-prefix rule) and a doc arriving AFTER the
    straddle never back-fills; unlisted groups use default_budget
    (0 = drop)."""
    import os

    from pyspark.sql import types as T

    from genie_spark.streaming.windows import token_budget_stream

    src = tmp_path / "docs"
    src.mkdir()
    # en budget 95: b1 has 60 + 30 (tokens-before 0 and 60 both < 95 →
    # both admitted, used 90); b2's md5 order is doc 4 (a87…) BEFORE
    # doc 3 (ecc…): doc 4 straddles (90 < 95 → admitted WHOLE, used
    # 100 — overshoot < one doc), doc 3 arrives after saturation
    (src / "b1.csv").write_text(
        "source,doc_id,n_tokens\nen,1,60\nen,2,30\nxx,50,5\n"
    )
    (src / "b2.csv").write_text(
        "source,doc_id,n_tokens\nen,3,50\nen,4,10\n"
    )
    os.utime(src / "b1.csv", (1000000000, 1000000000))
    os.utime(src / "b2.csv", (1000000100, 1000000100))
    schema = T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("header", "true")
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    out = token_budget_stream(stream, {"en": 95})
    q = (
        out.writeStream.format("memory")
        .queryName("tb")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from tb order by tokens_admitted").collect()
    got = [(r["doc_id"], r["n_tokens"], r["tokens_admitted"]) for r in rows]
    # batch1: docs 1 + 2 admitted → used 90; batch2: doc 4 (md5-first)
    # STRADDLES (90 < 95 → whole, used 100), doc 3 after saturation →
    # dropped — prefix rule, no back-fill
    assert {d for d, _, _ in got} == {1, 2, 4}
    assert got[-1] == (4, 10, 100)
    assert all(r["source"] == "en" for r in rows)  # xx dropped (default 0)


def test_token_budget_stream_single_batch_matches_batch_select(
    spark, tmp_path
):
    """X68 ≡ X36: a corpus delivered in ONE micro-batch admits the
    IDENTICAL (doc_id, group, n_tokens) set the batch
    ``token_budget_select`` keeps — same (md5-60bit(id), id) order,
    same straddle-inclusive greedy-prefix rule."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from genie_spark.analytics.corpus import token_budget_select
    from genie_spark.analytics.text import tokens
    from genie_spark.streaming.windows import token_budget_stream

    docs = [
        (i, "en" if i % 3 else "de", "w " * (5 + (i * 7) % 23))
        for i in range(1, 41)
    ]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    budgets = {"en": 120, "de": 60}
    batch_kept = {
        (r["doc_id"], r["lang"], r["n_tokens"])
        for r in token_budget_select(df, budgets, group_col="lang").collect()
    }
    # feed the stream every doc with the SAME token counts the batch
    # operator derives (F.size(tokens(text)))
    feed = df.select(
        F.col("lang").alias("source"),
        "doc_id",
        F.size(tokens("text")).cast("long").alias("n_tokens"),
    ).collect()
    src = tmp_path / "docs"
    src.mkdir()
    lines = ["source,doc_id,n_tokens"] + [
        f"{r['source']},{r['doc_id']},{r['n_tokens']}" for r in feed
    ]
    (src / "all.csv").write_text("\n".join(lines) + "\n")
    os.utime(src / "all.csv", (1000000000, 1000000000))
    schema = T.StructType(
        [
            T.StructField("source", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("header", "true")
        .csv(str(src))
    )
    out = token_budget_stream(stream, budgets)
    q = (
        out.writeStream.format("memory")
        .queryName("tb_parity")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_kept = {
        (r["doc_id"], r["source"], r["n_tokens"])
        for r in spark.sql("select * from tb_parity").collect()
    }
    assert stream_kept == batch_kept
    assert stream_kept  # non-degenerate: something was admitted


def test_quantile_sketch_stream_store_and_compact(spark, tmp_path):
    """X70 streaming: per-batch shards land write-only; the store
    answers the rolling quantile question IDENTICALLY to batch-
    sketching everything ingested so far; compaction reduces to one
    batch=-1 artifact that is bit-identical to the batch-built sketch
    (merge law end-to-end through the journaled swap)."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from genie_spark.analytics.sketches import (
        quantile_level_sketch,
        quantile_sketch_estimates,
    )
    from genie_spark.streaming.windows import (
        quantile_sketch_compact,
        quantile_sketch_stream,
        quantile_store_estimates,
    )

    src = tmp_path / "vals"
    src.mkdir()
    rows = [(i, (i * 37) % 9973) for i in range(1, 1501)]
    for b in range(3):
        chunk = rows[b * 500:(b + 1) * 500]
        (src / f"b{b}.csv").write_text(
            "doc_id,n_chars\n" + "\n".join(f"{i},{v}" for i, v in chunk) + "\n"
        )
        os.utime(src / f"b{b}.csv", (1000000000 + b * 100,) * 2)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("header", "true")
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    store = str(tmp_path / "store")
    q = quantile_sketch_stream(
        stream, store, str(tmp_path / "ckpt"), k_max=64
    )
    q.awaitTermination()
    shards = {p for p in os.listdir(store) if p.startswith("batch=")}
    assert len(shards) == 3
    whole = spark.createDataFrame(rows, "doc_id long, n_chars long")
    batch_sk = quantile_level_sketch(whole, "n_chars", "doc_id", k_max=64)
    want_rows = {(r["v"], r["h60"]) for r in batch_sk.collect()}
    want_est = sorted(
        tuple(r) for r in quantile_sketch_estimates(batch_sk).collect()
    )
    got_est = sorted(
        tuple(r) for r in quantile_store_estimates(spark, store, k_max=64).collect()
    )
    assert got_est == want_est
    stats = quantile_sketch_compact(spark, store, k_max=64)
    assert stats["shards_before"] == 3
    compacted = spark.read.parquet(store)
    assert {r["batch"] for r in compacted.select("batch").distinct().collect()} == {-1}
    assert {(r["v"], r["h60"]) for r in compacted.collect()} == want_rows
    # estimates unchanged after compaction
    got2 = sorted(
        tuple(r) for r in quantile_store_estimates(spark, store, k_max=64).collect()
    )
    assert got2 == want_est


def test_grouped_quantile_store_and_rolling_ccnet_thresholds(
    spark, tmp_path
):
    """X75 streaming: grouped shards merge per the per-group set-
    algebra law (store == batch-built grouped sketch, survivors AND
    levels), compaction preserves it, and ccnet_stream_thresholds
    answers the rolling per-group terciles the batch estimator gives."""
    import os

    from pyspark.sql import types as T

    from genie_spark.analytics.sketches import (
        quantile_level_sketch_by,
        quantile_sketch_estimates_by,
    )
    from genie_spark.streaming.windows import (
        ccnet_stream_thresholds,
        quantile_sketch_compact_by,
        quantile_sketch_stream_by,
    )

    rows = [
        (i, ["en", "de", "fr"][i % 3], (i * 37) % 9973)
        for i in range(1, 1201)
    ]
    src = tmp_path / "vals_by"
    src.mkdir()
    for b in range(3):
        chunk = rows[b * 400:(b + 1) * 400]
        (src / f"b{b}.csv").write_text(
            "doc_id,lang,n_chars\n"
            + "\n".join(f"{i},{g},{v}" for i, g, v in chunk)
            + "\n"
        )
        os.utime(src / f"b{b}.csv", (1000000000 + b * 100,) * 2)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("header", "true")
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    store = str(tmp_path / "store_by")
    q = quantile_sketch_stream_by(
        stream, store, str(tmp_path / "ckpt_by"), k_max=64
    )
    q.awaitTermination()
    whole = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long"
    )
    batch_sk = quantile_level_sketch_by(
        whole, "lang", "n_chars", "doc_id", k_max=64
    )
    want = {
        (r["g"], r["v"], r["h60"], r["level"], r["n_items"])
        for r in batch_sk.collect()
    }
    want_thr = {
        tuple(r)
        for r in quantile_sketch_estimates_by(batch_sk, (333, 667))
        .groupBy("g")
        .pivot("phi_milli", [333, 667])
        .min("est_value")
        .collect()
    }
    got_thr = {
        tuple(r) for r in ccnet_stream_thresholds(
            spark, store, k_max=64, qs_milli=(333, 667)
        ).collect()
    }
    assert got_thr == want_thr and len(got_thr) == 3
    stats = quantile_sketch_compact_by(spark, store, k_max=64)
    assert stats["shards_before"] == 3
    compacted = spark.read.parquet(store)
    got = {
        (r["g"], r["v"], r["h60"], r["level"], r["n_items"])
        for r in compacted.collect()
    }
    assert got == want
    # thresholds unchanged after compaction
    got_thr2 = {
        tuple(r) for r in ccnet_stream_thresholds(
            spark, store, k_max=64, qs_milli=(333, 667)
        ).collect()
    }
    assert got_thr2 == want_thr


def test_moments_stream_store_and_compact(spark, tmp_path):
    """X77 streaming: per-batch moments shards merge to EXACTLY the
    batch-built artifact (component-sum law), compaction preserves it."""
    import os

    from pyspark.sql import types as T

    from genie_spark.analytics.sketches import moments_sketch
    from genie_spark.streaming.windows import moments_compact, moments_stream

    rows = [(i, ["en", "de"][i % 2], (i * 13) % 500) for i in range(1, 601)]
    src = tmp_path / "mvals"
    src.mkdir()
    for b in range(3):
        chunk = rows[b * 200:(b + 1) * 200]
        (src / f"b{b}.csv").write_text(
            "doc_id,lang,n_chars\n"
            + "\n".join(f"{i},{g},{v}" for i, g, v in chunk) + "\n"
        )
        os.utime(src / f"b{b}.csv", (1000000000 + b * 100,) * 2)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("header", "true")
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    store = str(tmp_path / "mstore")
    q = moments_stream(stream, store, str(tmp_path / "mckpt"))
    q.awaitTermination()
    whole = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    want = {tuple(r) for r in moments_sketch(whole, "lang", "n_chars").collect()}
    stats = moments_compact(spark, store)
    assert stats["shards_before"] == 3
    got = {
        (r["g"], r["n"], r["s1"], r["s2"], r["min_v"], r["max_v"])
        for r in spark.read.parquet(store)
        .select("g", "n", "s1", "s2", "min_v", "max_v")
        .collect()
    }
    assert got == want


def test_components_stream_store_split_parity(spark, tmp_path):
    """X82 streaming components: the store's merged component map is
    bit-identical to batch connected_components over every ingested
    pair — including components STRADDLING batches — compaction
    preserves it, and leakage_safe_split(components=store) equals the
    batch split."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from genie_spark.analytics.corpus import leakage_safe_split
    from genie_spark.analytics.dedup import connected_components
    from genie_spark.streaming.windows import (
        components_compact,
        components_from_store,
        components_stream,
    )

    # chains 0-1-2-3, 10-11-12, 20-21; edges split so every chain
    # straddles at least two batches
    all_pairs = [(0, 1), (2, 3), (10, 11), (1, 2), (11, 12), (20, 21)]
    batches = [all_pairs[:2], all_pairs[2:4], all_pairs[4:]]
    src = tmp_path / "pairs"
    src.mkdir()
    for i, chunk in enumerate(batches):
        (src / f"b{i}.csv").write_text(
            "a,b\n" + "\n".join(f"{a},{b}" for a, b in chunk) + "\n"
        )
        os.utime(src / f"b{i}.csv", (1000000000 + i * 100,) * 2)
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.LongType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("header", "true")
        .option("maxFilesPerTrigger", 1)
        .csv(str(src))
    )
    store = str(tmp_path / "cstore")
    q = components_stream(stream, store, str(tmp_path / "cckpt"))
    q.awaitTermination()

    whole = spark.createDataFrame(all_pairs, "a long, b long")
    want = {tuple(r) for r in connected_components(whole).collect()}
    got = {tuple(r) for r in components_from_store(spark, store).collect()}
    assert got == want
    # the straddle actually happened: 0..3 is ONE component
    assert {(n, 0) for n in range(4)} <= want
    stats = components_compact(spark, store)
    assert stats["shards_before"] == 3
    assert {
        tuple(r) for r in components_from_store(spark, store).collect()
    } == want
    # split parity: store-driven split == batch pair-driven split
    docs = spark.range(30).select(F.col("id").alias("doc_id"))
    batch_split = {
        tuple(r) for r in leakage_safe_split(docs, whole).collect()
    }
    store_split = {
        tuple(r)
        for r in leakage_safe_split(
            docs, components=components_from_store(spark, store)
        ).collect()
    }
    assert store_split == batch_split
    # guard: both or neither input is an error
    import pytest

    with pytest.raises(ValueError, match="exactly one"):
        leakage_safe_split(docs)
    with pytest.raises(ValueError, match="exactly one"):
        leakage_safe_split(docs, whole, components=whole)
